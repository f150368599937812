"""Quota mixture sampling (exactness + batch-partial associativity)
and bigram PMI vs a hand-computed reference."""

import math

import numpy as np
import pandas as pd
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import corpusfilters as cf
from recursive_pdf_extraction_and_rag_ray.stages import sampling


def test_sample_quota_exact_counts_and_determinism():
    df = pd.DataFrame({"doc_id": np.arange(100, dtype="int64"),
                       "source": ["a", "b", "c", "d"] * 25})
    quotas = {"a": 5, "b": 3, "d": 30}   # d quota > group size (25)
    # split into many single-row blocks to stress the partial+final path
    ds = ray.data.from_pandas([df.iloc[[i]] for i in range(len(df))])
    out = sampling.sample_quota(ds, key_col="doc_id", group_col="source",
                                quotas=quotas).to_pandas()
    counts = out["source"].value_counts().to_dict()
    assert counts == {"d": 25, "a": 5, "b": 3}   # c absent, d capped
    # deterministic: same rows from a single-block run
    ds1 = ray.data.from_pandas(df)
    out1 = sampling.sample_quota(ds1, key_col="doc_id", group_col="source",
                                 quotas=quotas).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out1["doc_id"])
    # and the selected set is the hash-order prefix per group
    h = (df["doc_id"] * sampling.KNUTH) % (1 << 32)
    want_a = df[df.source == "a"].assign(h=h).nsmallest(5, "h")["doc_id"]
    assert sorted(out[out.source == "a"]["doc_id"]) == sorted(want_a)


def test_bigram_pmi_hand_checked():
    # 'x y' always adjacent -> strong collocation; 'x z' never adjacent
    texts = ["x y q", "x y r", "x y s", "x y t", "x y u"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    out = cf.bigram_pmi(ds, min_count=5, k=5)
    assert list(out["bigram"]) == ["x y"]
    t = 15.0      # 15 tokens
    bt = 10.0     # 10 bigrams
    want = round(math.log((5 / bt) / ((5 / t) * (5 / t))), 6)
    assert out["pmi"].iloc[0] == want
    assert out["n"].iloc[0] == 5


def test_bigram_pmi_no_cross_doc_bigrams():
    # last token of doc0 + first token of doc1 must NOT form a bigram
    texts = ["a b", "b a"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    out = cf.bigram_pmi(ds, min_count=1, k=10)
    assert set(out["bigram"]) == {"a b", "b a"}
    assert all(out["n"] == 1)
