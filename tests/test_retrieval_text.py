"""Keyword-retrieval family: posting-shard splitting, BM25 scoring vs a
straightforward in-memory reference, conjunctive search, RRF fusion."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import retrieval_text as rt


def _docs_ds(texts):
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype="int64"), "text": texts}))


def test_inverted_index_shards_split_and_cover():
    # 2500 docs all containing 'tok' -> ceil(2500/1024) = 3 shards whose
    # postings reassemble to exactly the 2500 ascending doc ids
    n = 2500
    ds = _docs_ds(["tok common" if i % 2 else "tok" for i in range(n)])
    out = rt.inverted_index(ds, shard_size=1024).to_pandas()
    tok = out[out.token == "tok"].sort_values("shard")
    assert list(tok["shard"]) == [0, 1, 2]
    assert set(tok["df"]) == {n}
    ids = []
    for p in tok["postings"]:
        ids.extend(int(e.split(":")[0]) for e in p.split(","))
    assert ids == list(range(n))
    sizes = [len(p.split(",")) for p in tok["postings"]]
    assert sizes == [1024, 1024, 452]
    common = out[out.token == "common"]
    assert int(common["df"].iloc[0]) == n // 2


def test_inverted_index_tf_and_order():
    ds = _docs_ds(["b a a", "a c", "c c c"])
    out = rt.inverted_index(ds).to_pandas().set_index("token")
    assert out.loc["a", "postings"] == "0:2,1:1"
    assert int(out.loc["a", "df"]) == 2
    assert out.loc["c", "postings"] == "1:1,2:3"
    assert out.loc["b", "postings"] == "0:1"


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    toks = [t.lower().split() for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df = {t: sum(1 for d in toks if t in d) for t in terms}
    scores = {}
    for i, d in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * len(d) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    return scores


def test_bm25_matches_reference_scoring():
    texts = ["alpha beta beta gamma", "beta gamma", "alpha alpha alpha",
             "delta epsilon", "gamma gamma gamma gamma beta alpha"]
    terms = ["alpha", "beta"]
    want = _bm25_reference(texts, terms)
    got = rt.bm25_topk(_docs_ds(texts), terms, k=10)
    got_map = dict(zip(got["doc_id"], got["score"]))
    assert got_map == want
    # ranked by score desc then id
    order = sorted(want, key=lambda i: (-want[i], i))
    assert list(got["doc_id"]) == order


def test_bm25_partial_topk_prunes_but_stays_global():
    # many batches: per-batch top-k must not lose the global winners
    texts = ["filler"] * 400 + ["target target target"] + ["filler"] * 400
    ds = _docs_ds(texts)
    got = rt.bm25_topk(ds, ["target"], k=3)
    assert list(got["doc_id"]) == [400]


def test_boolean_and_search():
    texts = ["x y z", "x y", "y z x w", "z"]
    got = rt.boolean_and_search(_docs_ds(texts), ["x", "z"]).to_pandas()
    assert sorted(got["doc_id"]) == [0, 2]


def test_rrf_fuse_hand_checked():
    a = pd.DataFrame({"doc_id": [1, 2, 3]})
    b = pd.DataFrame({"doc_id": [3, 4]})
    out = rt.rrf_fuse([a, b], id_col="doc_id", k=10, rrf_k=60)
    want = {1: 1 / 61, 2: 1 / 62, 3: 1 / 63 + 1 / 61, 4: 1 / 62}
    got = dict(zip(out["doc_id"], out["rrf_score"]))
    assert got == {k: round(v, 6) for k, v in want.items()}
    # 3 fused to the top, then 1 (1/61); 2 vs 4 tie broken by id
    assert list(out["doc_id"]) == [3, 1, 2, 4]


def test_corpus_stats_partials_sum_exactly():
    texts = ["a b c", "", "a a", "b"]
    st = rt._corpus_stats(_docs_ds(texts), ["a", "b", "zz"],
                          text_col="text")
    assert st["n_docs"] == 4
    assert st["avgdl"] == pytest.approx(6 / 4)
    assert st["df"] == {"a": 2, "b": 2, "zz": 0}
