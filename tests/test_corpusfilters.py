"""Corpus-curation operators (stages/corpusfilters.py) and the general
inner join (stages/joins.py): the substance the sf DuckDB oracles can't
reach — planted PII, planted benchmark overlap, repetition extremes,
split proportions, join duplicate-key semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import corpusfilters as cf
from recursive_pdf_extraction_and_rag_ray.stages import joins


def _ds(texts):
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(2)


def test_repetition_extremes(ray_session):
    out = cf.repetition_stats(_ds([
        "aa aa aa aa",              # one word repeated: dup 3/4, top word 100%
        "a b c d",                  # all distinct
        "x y x y x y",             # top bigram dominated
    ])).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "dup_word_ppm"] == 750000
    assert out.loc[0, "top_word_char_ppm"] == 1000000
    assert out.loc[1, "dup_word_ppm"] == 0
    # "x y" occurs 3x of 5 bigrams (x y, y x, x y, y x, x y) -> 9/15 chars
    assert out.loc[2, "top_bigram_char_ppm"] == 600000


def test_repetition_drops_zero_word_docs(ray_session):
    out = cf.repetition_stats(_ds(["", "   ", "one"])).to_pandas()
    assert out["doc_id"].tolist() == [2]
    assert out.loc[0, "top_bigram_char_ppm"] == 0  # single-word doc


def test_pii_redaction_planted(ray_session):
    out = cf.pii_redact(_ds([
        "contact bob.smith+x@mail.example.org now",
        "call 555-123-4567 or 555.987.6543",
        "host 192.168.0.1 and 10.0.0.255",
        "clean text",
    ])).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_email"] == 1
    assert out.loc[0, "text_redacted"] == "contact <EMAIL> now"
    assert out.loc[1, "n_phone"] == 2
    assert out.loc[1, "text_redacted"] == "call <PHONE> or <PHONE>"
    assert out.loc[2, "n_ip"] == 2
    assert out.loc[2, "text_redacted"] == "host <IP> and <IP>"
    assert out.loc[3, "text_redacted"] == "clean text"


def test_c4_flags(ray_session):
    long_ok = " ".join(["word"] * 60)
    out = cf.c4_quality(_ds([
        long_ok, "{ code }", "Lorem Ipsum dolor", "a " * 60,
    ])).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert bool(out.loc[0, "min_words_ok"]) and bool(out.loc[0, "word_len_ok"])
    assert bool(out.loc[1, "has_curly"])
    assert bool(out.loc[2, "has_lorem"])
    # 60 one-char words: mean len 100 (e2) -> fails the [300,1000] band
    assert out.loc[3, "mean_word_len_e2"] == 100
    assert not bool(out.loc[3, "word_len_ok"])


def test_split_assign_deterministic_and_disjoint(ray_session):
    n = 2000
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64)})).repartition(4)
    a = cf.split_assign(ds).to_pandas().sort_values("doc_id")
    b = cf.split_assign(ds).to_pandas().sort_values("doc_id")
    assert a["split"].tolist() == b["split"].tolist()  # run-invariant
    frac = a["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15
    parts = cf.split_datasets(ds)
    sizes = {k: v.count() for k, v in parts.items()}
    assert sum(sizes.values()) == n          # exact partition of the corpus
    assert sizes["train"] == (a["split"] == "train").sum()


def test_contamination_planted_overlap(ray_session):
    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    overlap8 = "XX alpha beta gamma delta epsilon zeta eta theta YY"
    permuted = "theta eta zeta epsilon delta gamma beta alpha iota kappa"
    out = cf.mark_contamination(_ds([
        bench,        # exact copy -> contaminated
        overlap8,     # shares one 8-gram -> contaminated
        permuted,     # same words, different order -> clean
        "totally unrelated words here and more of them padding out",
    ]), [bench]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, True, False, False]
    assert out.loc[1, "n_hits"] == 1
    assert out.loc[0, "n_hits"] == out.loc[0, "n_shingles"]


def test_unigram_nll_matches_hand_computation(ray_session):
    import math
    ds = _ds(["a a b", "b c"])
    vocab = cf.unigram_counts(ds)
    assert sorted(zip(vocab["w"], vocab["n"])) == [("a", 2), ("b", 2),
                                                   ("c", 1)]
    out = cf.unigram_logprob(ds, vocab).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pa_, pb, pc_ = 2 / 5, 2 / 5, 1 / 5
    exp0 = -(math.log(pa_) * 2 + math.log(pb)) / 3
    exp1 = -(math.log(pb) + math.log(pc_)) / 2
    assert out.loc[0, "nll"] == pytest.approx(exp0, abs=1e-6)
    assert out.loc[1, "nll"] == pytest.approx(exp1, abs=1e-6)
    # rare-word doc scores higher (less fluent under the corpus model)
    assert out.loc[1, "nll"] > out.loc[0, "nll"]


def test_inner_join_duplicates_and_dtypes(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({
        "k": np.int64([1, 2, 2, 3, 4]),
        "lv": ["a", "b", "c", "d", "e"],
        "ts": pd.to_datetime(["2024-01-01"] * 5),
    })).repartition(3)
    r = ray.data.from_pandas(pd.DataFrame({
        "k": np.int64([2, 3, 3, 9]),
        "rv": np.int64([20, 30, 31, 90]),
    })).repartition(2)
    out = joins.inner_join(l, r, on="k").to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    # 2 left rows x 1 right (k=2) + 1 left x 2 right (k=3) = 4 rows
    assert list(zip(out["k"], out["lv"], out["rv"])) == [
        (2, "b", 20), (2, "c", 20), (3, "d", 30), (3, "d", 31)]
    assert out["ts"].dtype == "datetime64[ns]"
    assert out["rv"].dtype == np.int64


def test_inner_join_rejects_column_clash(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": np.int64([1]), "v": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": np.int64([1]), "v": [2]}))
    with pytest.raises(ValueError, match="overlapping"):
        joins.inner_join(l, r, on="k")


def test_boilerplate_scrub_semantics(ray_session):
    from recursive_pdf_extraction_and_rag_ray.stages import boilerplate as bp
    ds = _ds([
        "unique one\nCOOKIE BANNER\nbody A",
        "COOKIE BANNER\nCOOKIE BANNER\nbody B",   # within-doc repeat: df counts once
        "COOKIE BANNER",                          # nothing survives -> ''
        "body D\nunique two",
    ])
    hot = bp.frequent_lines(ds, min_df=3)
    assert hot["line"].tolist() == ["COOKIE BANNER"]
    assert hot["n"].tolist() == [3]  # 3 distinct docs, not 4 occurrences
    out = bp.remove_boilerplate_lines(ds, min_df=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        "unique one\nbody A", "body B", "", "body D\nunique two"]
    assert out["n_removed"].tolist() == [1, 2, 1, 0]


def test_boilerplate_distributed_matches_driver(ray_session):
    from recursive_pdf_extraction_and_rag_ray.stages import boilerplate as bp
    texts = [f"doc {i}\nfooter {i % 3}\ntail {i % 2}" for i in range(40)]
    ds = _ds(texts).repartition(5)
    a = bp.remove_boilerplate_lines(ds, min_df=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = bp.remove_boilerplate_lines(ds, min_df=10, distributed=True) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # footer 0/1/2 each in >=13 docs, tail 0/1 in 20 -> all dropped
    assert a["text"].tolist() == [f"doc {i}" for i in range(40)]
