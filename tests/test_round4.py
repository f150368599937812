"""Round-4 additions: persisted incremental-dedup state (zero-scan old
side), double-hashed bloom probes, index-served BM25 parity, doclen-carrying
posting shards, and the second concrete embedder backend."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import dedup, embed
from recursive_pdf_extraction_and_rag_ray.stages import retrieval_text as rt


def _docs(texts, start_id=0):
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(start_id, start_id + len(texts), dtype="int64"),
        "text": texts}))


# --- incremental dedup: persisted state ---------------------------------------

def test_incremental_from_state_matches_one_shot(tmp_path):
    old = _docs(["a", "b", "c", "dup"], start_id=0)
    new = _docs(["dup", "x", "b", "y"], start_id=100)
    want = sorted(dedup.incremental_dedup_bloom(new, old)
                  .to_pandas()["doc_id"])
    assert want == [101, 103]  # 'dup' and 'b' already exist

    state = str(tmp_path / "state")
    dedup.build_incremental_state(old, state)
    got = sorted(dedup.incremental_dedup_from_state(new, state)
                 .to_pandas()["doc_id"])
    assert got == want


def test_incremental_state_is_reusable_and_committed(tmp_path):
    import os
    old = _docs(["p", "q"], start_id=0)
    state = str(tmp_path / "state")
    dedup.build_incremental_state(old, state)
    assert os.path.exists(os.path.join(state, "_SUCCESS"))
    assert os.path.exists(os.path.join(state, "bloom.npz"))
    # two runs against the same committed state, old corpus never passed
    for _ in range(2):
        new = _docs(["p", "z"], start_id=50)
        got = sorted(dedup.incremental_dedup_from_state(new, state)
                     .to_pandas()["doc_id"])
        assert got == [51]
    # uncommitted state dir refuses to load
    with pytest.raises(FileNotFoundError):
        dedup.load_incremental_state(str(tmp_path / "nope"))


def test_bloom_positions_double_hash_spreads_every_probe():
    # regression: the old 16-bit-window scheme pinned probe j=3 into the
    # first 2^16 slots of a 2^23 bitmap; double hashing must spread every
    # probe over the full range
    import hashlib
    fps = [hashlib.md5(str(i).encode()).hexdigest() for i in range(2000)]
    pos = dedup._bloom_positions(fps, dedup.BLOOM_BITS, 4)
    for j in range(4):
        assert pos[:, j].max() > dedup.BLOOM_BITS // 2
        assert pos[:, j].min() < dedup.BLOOM_BITS // 2
    # deterministic across calls
    pos2 = dedup._bloom_positions(fps, dedup.BLOOM_BITS, 4)
    assert (pos == pos2).all()


# --- BM25 from the inverted index ---------------------------------------------

TEXTS = (["alpha beta beta gamma", "beta gamma", "alpha alpha alpha",
          "delta epsilon", "gamma gamma gamma gamma beta alpha", ""]
         + [f"filler{i} beta" for i in range(40)])


def test_inverted_index_with_doclen_format():
    out = rt.inverted_index(_docs(["b a a", "a c"]),
                            with_doclen=True).to_pandas()
    out = out.set_index("token")
    assert out.loc["a", "postings"] == "0:2:3,1:1:2"
    assert out.loc["b", "postings"] == "0:1:3"
    assert out.loc["c", "postings"] == "1:1:2"


def test_bm25_from_index_matches_scan_scorer():
    ds = _docs(TEXTS)
    terms = ["alpha", "beta"]
    scan = rt.bm25_topk(ds, terms, k=10)
    idx = rt.inverted_index(ds, with_doclen=True, shard_size=8)
    served = rt.bm25_topk_from_index(idx, terms, n_docs=len(TEXTS), k=10)
    pd.testing.assert_frame_equal(scan.reset_index(drop=True),
                                  served.reset_index(drop=True))


def test_index_sum_dl_counts_every_token():
    ds = _docs(["a b c", "", "a a"])
    idx = rt.inverted_index(ds, with_doclen=True)
    assert rt.index_sum_dl(idx) == 5


def test_bm25_single_pass_stats_match_explicit_stats():
    ds = _docs(TEXTS)
    terms = ["alpha", "beta", "zz"]
    st = rt._corpus_stats(ds, terms, text_col="text")
    with_stats = rt.bm25_topk(ds, terms, k=5, stats=st)
    without = rt.bm25_topk(ds, terms, k=5)
    pd.testing.assert_frame_equal(with_stats.reset_index(drop=True),
                                  without.reset_index(drop=True))


# --- second embedder backend ---------------------------------------------------

def test_random_projection_embedder_semantics():
    e = embed.RandomProjectionEmbedder(dim=32)
    v = e.embed(["the quick brown fox", "fox brown quick the",
                 "completely different words here", ""])
    # unit norm (except the empty doc, which stays zero)
    norms = np.linalg.norm(v, axis=1)
    assert norms[:3] == pytest.approx(1.0, abs=1e-5)
    assert norms[3] == 0.0
    # bag-of-words: token-permuted text maps to the SAME vector
    # (distinct from HashEmbedder, which separates them)
    assert np.allclose(v[0], v[1])
    assert not np.allclose(v[0], v[2])
    h = embed.HashEmbedder(dim=32).embed(["the quick brown fox",
                                          "fox brown quick the"])
    assert not np.allclose(h[0], h[1])
    # deterministic across actors (fresh instance = fresh 'model load')
    v2 = embed.RandomProjectionEmbedder(dim=32).embed(
        ["the quick brown fox"])
    assert np.allclose(v[0], v2[0])


def test_index_bucket_dictencode_matches_scalar():
    # the index stage hashes only UNIQUE group keys (dictionary-encode
    # + gather); every row must still get exactly group_key_bucket(key)
    import pyarrow as pa
    import pyarrow.compute as pc
    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        group_key_bucket)

    keys = [f"host{i % 7}.example/p{i % 3}" for i in range(500)] + ["", "x"]
    col = pa.chunked_array([pa.array(keys[:300]), pa.array(keys[300:])])
    d = pc.dictionary_encode(col).combine_chunks()
    uniq = np.asarray([group_key_bucket(k)
                       for k in d.dictionary.to_pylist()], dtype=np.int32)
    got = uniq[d.indices.to_numpy()]
    want = np.asarray([group_key_bucket(k) for k in keys], dtype=np.int32)
    assert (got == want).all()


def test_assembly_builds_both_embedders():
    from recursive_pdf_extraction_and_rag_ray.pipelines.assembly import build_pipeline
    ds = ray.data.from_pandas(pd.DataFrame({
        "text": ["hello world", "ray data"]}))
    for stage in ("embed.hash", "embed.rp"):
        run = build_pipeline([{"stage": stage}])
        out = run(ds).to_pandas()
        assert len(out) == 2
        assert len(out["embedding"].iloc[0]) == 64
    types = {stage: build_pipeline([{"stage": stage}])(ds)
             .to_pandas()["embedding_type"].iloc[0]
             for stage in ("embed.hash", "embed.rp")}
    assert types["embed.hash"] != types["embed.rp"]
