"""Near-dup family: pinned goldens at sf0.001 (these ops have no SQL
oracle, so the absolute outputs are pinned from a verified run — the run
was cross-checked pair-for-pair against the pre-optimization
implementation), plus exactness of the tiled all-pairs path under a hot
blocking key."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

import __ray_entry__ as entrymod
from recursive_pdf_extraction_and_rag_ray.stages.neardup import (
    MAX_BUCKET_WIDTH,
    hamming64,
    minhash_signature,
    simhash64,
)
from recursive_pdf_extraction_and_rag_ray.stages.similarity import (
    cosine_neardup_pairs,
)
from recursive_pdf_extraction_and_rag_ray.stages.skewtools import (
    _explode_tiles,
    _tile_sub_block,
)

SF_DIR = "/root/testdata/sf0.001"

GOLDEN = {
    # regenerated 2026-08-17: shingle hash switched crc32 -> vectorized
    # polynomial codepoint fold so the DuckDB oracle (SQL_MINHASH_PAIRS)
    # can recompute the exact shingle set; minhash_pairs now ALSO has a
    # full SQL oracle, the golden is belt+braces
    "minhash_pairs": (28, "ada598bbde31dbea", ["doc_a", "doc_b", "jaccard_est"]),
    # regenerated 2026-08-17: token hash switched blake2b -> md5-big-endian
    # so the DuckDB oracle (SQL_SIMHASH_PAIRS) can recompute signatures;
    # simhash_pairs now ALSO has a full SQL oracle, the golden is belt+braces
    "simhash_pairs": (1892, "995f39322b03ad35", ["doc_a", "doc_b", "hamming"]),
    "jaccard_pairs": (2, "8ee0d932a2e30f4b", ["doc_a", "doc_b", "jaccard"]),
    "lsh_ann": (5, "1c4012ae582174a2", ["vec_id", "cos_sim"]),
    "ivf_ann": (9, "877f63c973f4e234", ["vec_id", "cos_sim"]),
    "cosine_neardup_lsh": (49, "7a228134e46fddb4", ["id_a", "id_b", "cos_sim"]),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_neardup_golden(name):
    n_rows, digest, cols = GOLDEN[name]
    r = entrymod.queries()[name](SF_DIR)
    df = r.to_pandas() if hasattr(r, "to_pandas") else r
    df = df[cols].sort_values(cols).reset_index(drop=True)
    assert len(df) == n_rows, name
    h = hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]
    assert h == digest, name


def test_signature_kernels_deterministic():
    sig = minhash_signature("the quick brown fox jumps over the lazy dog")
    assert sig.shape == (64,) and sig.dtype == np.uint64
    assert np.array_equal(
        sig, minhash_signature("the  quick brown fox jumps over the lazy dog"))
    a = simhash64("alpha beta gamma delta epsilon")
    b = simhash64("alpha beta gamma delta zeta")
    assert 0 < hamming64(a, b) < 30  # near texts land near in hamming space
    assert simhash64("") == 0


def test_tiled_pairs_exact_under_hot_key(ray_session):
    """One blocking key with 250 > MAX_BUCKET_WIDTH members: the tiled path
    must emit EXACTLY the brute-force pair set (no dropped hot key) while
    no tile task ever holds more than 2*width rows."""
    rng = np.random.RandomState(3)
    n, dim, width = 250, 8, 50
    vecs = rng.normal(size=(n, dim))
    df = pd.DataFrame({
        "label": ["hot"] * n,
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs),
    })
    ds = ray.data.from_pandas(df)
    out = cosine_neardup_pairs(ds, threshold=0.8, max_width=width) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    ai, bi = np.where(np.triu(sims, k=1) >= 0.8)
    expect = pd.DataFrame({"id_a": ai.astype("int64"),
                           "id_b": bi.astype("int64"),
                           "cos_sim": np.round(sims[ai, bi], 6)}) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(expect) > 0  # the fixture must actually exercise pairs
    pd.testing.assert_frame_equal(out, expect)

    # every tile holds at most 2*width rows -> no O(k^2) single task
    tiles = _explode_tiles(df.drop(columns=["embedding"]),
                           ray.put(({"hot": (-(-n // width), 0)},
                                    -(-n // width))),
                           id_col="vec_id", block_col="label")
    widths = tiles.groupby(["label", "_ti", "_tj"]).size()
    # sub-blocks are hash-assigned, so ~2*width per cross tile with modest
    # imbalance — the point is it's NEVER the 250-row whole block
    assert widths.max() <= 3 * width
    # tiling partitions the pair space: each unordered pair in exactly 1 tile
    b = _tile_sub_block(np.arange(n, dtype=np.int64), -(-n // width))
    n_tiles = -(-n // width)
    assert len(widths) == n_tiles * (n_tiles + 1) // 2
    assert set(b) == set(range(n_tiles))


def test_max_bucket_width_constant_sane():
    assert 50 <= MAX_BUCKET_WIDTH <= 1000


@pytest.mark.parametrize("n,w", [(1, 50), (2, 50), (49, 50), (50, 50),
                                 (51, 50), (250, 50), (400, 97)])
def test_tiling_partitions_pair_space_exactly(n, w, ray_session):
    """Every unordered pair of a block appears in EXACTLY one tile, on the
    correct sides — the invariant that makes tiled pair scans exact."""
    df = pd.DataFrame({"block": ["b"] * n,
                       "doc_id": np.arange(n, dtype=np.int64)})
    n_tiles = max(1, -(-n // w))
    tiles = _explode_tiles(df, ray.put(({"b": (n_tiles, 0)}, n_tiles)),
                           id_col="doc_id", block_col="block")
    seen = {}
    for (_, ti, tj), g in tiles.groupby(["block", "_ti", "_tj"]):
        left = g.loc[g["_side"] == 0, "doc_id"].to_numpy()
        right = g.loc[g["_side"] == 1, "doc_id"].to_numpy()
        if ti == tj:
            assert len(right) == 0
            for i in range(len(left)):
                for j in range(i + 1, len(left)):
                    p = (min(left[i], left[j]), max(left[i], left[j]))
                    seen[p] = seen.get(p, 0) + 1
        else:
            assert len(left) and len(right)
            for a in left:
                for b in right:
                    p = (min(a, b), max(a, b))
                    seen[p] = seen.get(p, 0) + 1
    assert all(v == 1 for v in seen.values())
    assert len(seen) == n * (n - 1) // 2


def test_cluster_pairs_keep_first():
    from recursive_pdf_extraction_and_rag_ray.stages.neardup import (
        cluster_pairs_keep_first,
    )
    pairs = pd.DataFrame({"doc_a": [1, 2, 5, 10], "doc_b": [2, 3, 6, 1]})
    losers = cluster_pairs_keep_first(pairs)
    assert losers == {2: 1, 3: 1, 10: 1, 6: 5}
    assert cluster_pairs_keep_first(pd.DataFrame({"doc_a": [], "doc_b": []})) == {}


def test_neardup_dedup_drops_known_dups(ray_session):
    """The documents table has exact duplicate texts (dedup_exact finds
    them); fuzzy dedup at 0.5 must drop at least those losers and keep
    every cluster minimum."""
    from recursive_pdf_extraction_and_rag_ray.stages.neardup import (
        minhash_lsh_pairs,
        neardup_dedup_keep_first,
    )
    ds = lambda: ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                       columns=["doc_id", "text"])
    from recursive_pdf_extraction_and_rag_ray.stages.neardup import (
        cluster_pairs_keep_first,
    )
    kept = set(neardup_dedup_keep_first(ds(), threshold=0.5)
               .to_pandas()["doc_id"])
    pairs = minhash_lsh_pairs(ds(), 0.5).to_pandas()
    losers = cluster_pairs_keep_first(pairs)
    n_docs = ds().count()
    assert len(pairs) > 0 and len(kept) == n_docs - len(losers)
    # no near-dup pair survives whole; every cluster winner survives
    for _, r in pairs.iterrows():
        a, b = int(r["doc_a"]), int(r["doc_b"])
        assert not (a in kept and b in kept)
    assert all(w in kept for w in set(losers.values()))


def test_ivf_ann_recall_and_determinism(ray_session):
    """IVF with nprobe=n_centroids must EQUAL brute force (probing every
    cell is exact); default nprobe recalls most of the exact top-k."""
    import pyarrow.parquet as pq

    from recursive_pdf_extraction_and_rag_ray.stages.similarity import (
        ivf_ann,
        knn_bruteforce,
    )
    sf = SF_DIR
    q = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    qvec = np.asarray(q.column("embedding").to_pylist()[0], dtype=np.float64)
    mk = lambda: ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                       columns=["vec_id", "embedding"])
    exact = knn_bruteforce(mk(), qvec, k=10, exclude_ids=[0]).to_pandas()
    full = ivf_ann(mk(), qvec, k=11, nprobe=16, n_centroids=16).to_pandas()
    full = full[full["vec_id"] != 0].head(10).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        full[["vec_id", "cos_sim"]],
        exact[["vec_id", "cos_sim"]].reset_index(drop=True))
    approx = ivf_ann(mk(), qvec, k=10).to_pandas()
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"]))
    assert recall >= 5  # default nprobe=4/16 keeps most of the top-10
    approx2 = ivf_ann(mk(), qvec, k=10).to_pandas()
    pd.testing.assert_frame_equal(approx, approx2)  # deterministic
