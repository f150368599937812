"""BPE training/encoding (stages/bpe.py): parity with a single-machine
reference, determinism under partitioning, compression sanity."""

import numpy as np
import pandas as pd
import ray

from recursive_pdf_extraction_and_rag_ray.stages import bpe

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker brown foxes jumped over lazy dogs",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "jackdaws love my big sphinx of quartz quickly",
] * 6


def _rows():
    return [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]


def _reference_wordcounts(texts):
    from collections import Counter
    c = Counter()
    for t in texts:
        c.update(bpe.WORD_RE.findall(t.lower()))
    df = pd.DataFrame({"word": list(c.keys()),
                       "n": pd.Series(list(c.values()), dtype="int64")})
    return df.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)


def test_wordcounts_match_reference():
    ds = ray.data.from_items(_rows()).repartition(5)
    got = bpe.bpe_wordcounts(ds)
    ref = _reference_wordcounts(CORPUS)
    pd.testing.assert_frame_equal(got, ref)


def test_merge_sequence_deterministic_and_partition_invariant():
    seqs = []
    for nparts in (2, 9):
        ds = ray.data.from_items(_rows()).repartition(nparts)
        wc = bpe.bpe_wordcounts(ds)
        seqs.append(bpe.bpe_train(wc, n_merges=50))
    assert seqs[0] == seqs[1]
    assert len(seqs[0]) > 10
    # first merges pick up high-frequency pairs ('th', 'e</w>'-ish)
    assert all(isinstance(m, tuple) and len(m) == 2 for m in seqs[0])


def test_encode_matches_reference_and_compresses():
    ds = ray.data.from_items(_rows()).repartition(4)
    wc = bpe.bpe_wordcounts(ds)
    merges = bpe.bpe_train(wc, n_merges=60)
    got = bpe.bpe_token_counts(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for _, row in got.iterrows():
        words = bpe.WORD_RE.findall(CORPUS[row["doc_id"]].lower())
        ref = sum(bpe._encode_word(w, ranks) for w in words)
        assert row["n_bpe_tokens"] == ref
        # more merges can only shrink or keep the count vs char-level
        chars = sum(len(w) + 1 for w in words)
        assert row["n_bpe_tokens"] <= chars
    # with 60 merges on this tiny vocab, compression must be real
    base = got["n_bpe_tokens"].sum()
    none = bpe.bpe_token_counts(ds, []).to_pandas()["n_bpe_tokens"].sum()
    assert base < none


def test_zero_merges_is_char_plus_end():
    ds = ray.data.from_items([{"doc_id": 0, "text": "ab ab"}])
    got = bpe.bpe_token_counts(ds, []).to_pandas()
    # each 'ab' -> ['a','b','</w>'] = 3 tokens
    assert int(got["n_bpe_tokens"][0]) == 6


def test_train_stops_when_no_pair_repeats():
    wc = pd.DataFrame({"word": ["a"], "n": pd.Series([1], dtype="int64")})
    merges = bpe.bpe_train(wc, n_merges=10)
    assert merges == []  # ('a', END) occurs once -> below min count 2


def test_query_registered():
    import os
    sf_dir = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from recursive_pdf_extraction_and_rag_ray.pipelines import queries as qmod
    r = qmod.queries()["bpe_tokens"](sf_dir).to_pandas()
    assert list(r.columns) == ["doc_id", "n_bpe_tokens"]
    assert (r["n_bpe_tokens"] > 0).all()
