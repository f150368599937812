"""Dataloader-prep operators (stages/packing.py): packing invariants the
SQL oracle can't express, and global-rank exactness incl. skewed keys."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import packing


def _lens(n, seed=7, hi=900):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "n_tokens": rng.integers(10, hi, n).astype("int64")})


def test_pack_invariants(ray_session):
    df = _lens(800)
    ds = ray.data.from_pandas(df).repartition(5)
    out = packing.pack_sequences(ds, id_col="doc_id", len_col="n_tokens",
                                 budget=2048).to_pandas()
    assert len(out) == 800 and out["doc_id"].nunique() == 800
    g = out.groupby("pack_id")
    assert (g["n_tokens"].sum() <= 2048).all()
    for _, p in g:
        p = p.sort_values("pack_pos")
        assert p["pack_pos"].tolist() == list(range(len(p)))
        # offsets are the running sum of the preceding lens
        assert p["pack_offset"].tolist() == \
            [0] + p["n_tokens"].cumsum().tolist()[:-1]


def test_pack_deterministic_across_partitionings(ray_session):
    df = _lens(500, seed=3)
    a = packing.pack_sequences(ray.data.from_pandas(df).repartition(2),
                               id_col="doc_id", len_col="n_tokens",
                               budget=1024).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = packing.pack_sequences(ray.data.from_pandas(df).repartition(13),
                               id_col="doc_id", len_col="n_tokens",
                               budget=1024).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_oversize_doc_gets_own_pack(ray_session):
    df = pd.DataFrame({"doc_id": np.int64([1, 2, 3]),
                       "n_tokens": np.int64([100, 5000, 100])})
    out = packing.pack_sequences(
        ray.data.from_pandas(df), id_col="doc_id", len_col="n_tokens",
        budget=1024).to_pandas().sort_values("doc_id")
    # the giant is alone in its pack, and nothing was dropped
    giant_pack = out.loc[out["doc_id"] == 2, "pack_id"].iloc[0]
    assert (out["pack_id"] == giant_pack).sum() == 1
    assert len(out) == 3


def test_pack_rejects_bad_budget(ray_session):
    ds = ray.data.from_pandas(_lens(5))
    with pytest.raises(ValueError, match="budget"):
        packing.pack_sequences(ds, id_col="doc_id", len_col="n_tokens",
                               budget=0)


def test_global_rank_matches_argsort_with_skew(ray_session):
    rng = np.random.default_rng(11)
    # heavy skew: half the rows share one key value
    by = np.where(rng.random(600) < 0.5, 7,
                  rng.integers(0, 10_000, 600)).astype("int64")
    df = pd.DataFrame({"k": by, "id": np.arange(600, dtype=np.int64)})
    out = packing.global_rank(
        ray.data.from_pandas(df).repartition(4), by="k", tiebreak="id",
        out="r", buckets=64).to_pandas().sort_values("r")
    exp = df.sort_values(["k", "id"]).reset_index(drop=True)
    assert out["id"].tolist() == exp["id"].tolist()
    assert out["r"].tolist() == list(range(600))


def test_token_shard_assign_exact_prefix_sum():
    import numpy as np
    import pandas as pd
    import ray
    from recursive_pdf_extraction_and_rag_ray.stages import packing

    rng = np.random.RandomState(2)
    df = pd.DataFrame({"doc_id": np.arange(500, dtype="int64"),
                       "n_tok": rng.randint(1, 400, size=500)
                       .astype("int64")})
    out = packing.token_shard_assign(
        ray.data.from_pandas(df).repartition(7), id_col="doc_id",
        tok_col="n_tok", budget=1000).to_pandas()
    # single-machine reference: cumsum in (knuth32(id), id) order
    h = (df["doc_id"].to_numpy() * 2654435761) % (1 << 32)
    ref = df.assign(_h=h).sort_values(["_h", "doc_id"])
    before = np.cumsum(ref["n_tok"].to_numpy()) - ref["n_tok"].to_numpy()
    ref = ref.assign(shard=(before // 1000)).sort_values("doc_id")
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(got["shard"].to_numpy(),
                          ref["shard"].to_numpy())
    # shard token totals hit the budget (except the last)
    tot = got.groupby("shard")["n_tok"].sum()
    assert (tot.iloc[:-1] >= 1000 - 400).all()


def test_write_training_shards_roundtrip(tmp_path):
    import numpy as np
    import pandas as pd
    import ray
    import pyarrow.dataset as pads
    from recursive_pdf_extraction_and_rag_ray.stages import packing

    docs = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"),
                         "text": [f"doc {i} body" for i in range(60)]})
    lens = pd.DataFrame({"doc_id": docs["doc_id"],
                         "n_tok": np.full(60, 50, dtype="int64")})
    assign = packing.token_shard_assign(
        ray.data.from_pandas(lens), id_col="doc_id", tok_col="n_tok",
        budget=500)
    out = str(tmp_path / "shards")
    man = packing.write_training_shards(
        ray.data.from_pandas(docs), assign, out_dir=out)
    # 60 docs x 50 tok / 500 budget = 6 shards of 10 docs
    assert list(man["n_docs"]) == [10] * 6
    assert list(man["n_tokens"]) == [500] * 6
    back = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    assert len(back) == 60
    assert set(back["doc_id"]) == set(range(60))
    import os
    assert os.path.exists(os.path.join(out, "_manifest.parquet"))
