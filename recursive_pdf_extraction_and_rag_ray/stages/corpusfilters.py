"""Training-corpus quality operators over a documents-style table:
repetition statistics (Gopher-style, Rae et al. 2021, arXiv:2112.11446
§A1.1), C4-style heuristic quality flags (Raffel et al. 2020,
arXiv:1910.10683 §2.2), PII redaction, deterministic train/val/test
split, and benchmark-contamination marking (n-gram overlap vs a held-out
evaluation set, as in GPT-3 appx. C / PaLM §8).

These are the filters a 100-TB webtext pipeline runs between extraction
and tokenization. The reference repo filters only on effective character
count (/root/reference/src/services/RAG/convert_to_embeddings.py:120-138
need_ocr gate); this module is the corpus-curation superset, built the
same Ray-Data-first way: every operator is a stateless vectorized
``map_batches`` kernel (embarrassingly parallel, no shuffle) except
contamination, whose benchmark shingle set is built once and broadcast
via ``ray.put`` — never re-shipped per batch.

Semantics are deliberately SQL-expressible (word = ``\\S+`` run, ppm
ratios as ``floor(x + 0.5)`` integers, ties broken by count-desc then
value-asc) so the DuckDB oracle checks them exactly — see
SQL_GOPHER_REPETITION / SQL_C4_QUALITY / SQL_PII_REDACT / SQL_TRAIN_SPLIT
in pipelines/queries.py.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Gopher-style repetition statistics
# ---------------------------------------------------------------------------


def _ppm(num: pd.Series, den: pd.Series) -> pd.Series:
    """Integer parts-per-million via floor(x + 0.5) — matches the SQL
    oracle exactly (numpy round() is half-even, DuckDB half-away; dyadic
    ratios DO land on .5)."""
    return np.floor(num * 1_000_000.0 / den + 0.5).astype("int64")


def repetition_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc word-repetition profile (the single-line-webtext analog of
    Gopher's duplicate-line / top-n-gram fractions):

    - ``dup_word_ppm``     — fraction of word occurrences that repeat an
      earlier occurrence: (n_words - n_distinct) / n_words.
    - ``top_word_char_ppm``  — chars covered by all occurrences of the
      most frequent word / total word chars (tie: lexicographically
      smallest word).
    - ``top_bigram_char_ppm`` — same for adjacent-word bigrams (joined
      with one space), denominated by total bigram chars; 0 for
      single-word docs.

    Zero-word docs emit no row (parity with the oracle's unnest join).
    Fully vectorized: one explode + three pandas hash aggregates per
    batch, no per-row Python."""
    text = batch["text"].fillna("")
    words = text.str.findall(r"\S+")
    ex = words.explode().dropna()
    if len(ex) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_words": pd.Series([], dtype="int64"),
                             "dup_word_ppm": pd.Series([], dtype="int64"),
                             "top_word_char_ppm": pd.Series([], dtype="int64"),
                             "top_bigram_char_ppm": pd.Series([], dtype="int64")})
    tok = pd.DataFrame({"doc_id": batch["doc_id"].reindex(ex.index),
                        "w": ex.to_numpy()})

    wc = tok.groupby(["doc_id", "w"], sort=False).size().reset_index(name="n")
    wc["chars"] = wc["w"].str.len() * wc["n"]
    agg = wc.groupby("doc_id").agg(
        n_words=("n", "sum"), n_distinct=("n", "size"),
        tot_chars=("chars", "sum"))
    topw = wc.sort_values(["doc_id", "n", "w"],
                          ascending=[True, False, True],
                          kind="mergesort").groupby("doc_id").head(1) \
        .set_index("doc_id")["chars"]

    tok["w2"] = tok.groupby("doc_id", sort=False)["w"].shift(-1)
    bg = tok.dropna(subset=["w2"]).copy()
    if len(bg):
        bg["b"] = bg["w"] + " " + bg["w2"]
        bc = bg.groupby(["doc_id", "b"], sort=False).size() \
            .reset_index(name="n")
        bc["chars"] = bc["b"].str.len() * bc["n"]
        btot = bc.groupby("doc_id")["chars"].sum()
        topb = bc.sort_values(["doc_id", "n", "b"],
                              ascending=[True, False, True],
                              kind="mergesort").groupby("doc_id").head(1) \
            .set_index("doc_id")["chars"]
    else:
        btot = pd.Series(dtype="int64")
        topb = pd.Series(dtype="int64")

    out = agg.reset_index()
    out["dup_word_ppm"] = _ppm(out["n_words"] - out["n_distinct"],
                               out["n_words"])
    out["top_word_char_ppm"] = _ppm(
        out["doc_id"].map(topw), out["tot_chars"])
    bnum = out["doc_id"].map(topb)
    bden = out["doc_id"].map(btot)
    has_bg = bden.notna()
    tb = pd.Series(np.zeros(len(out), dtype="int64"), index=out.index)
    tb[has_bg] = _ppm(bnum[has_bg], bden[has_bg])
    out["top_bigram_char_ppm"] = tb.astype("int64")
    return out[["doc_id", "n_words", "dup_word_ppm", "top_word_char_ppm",
                "top_bigram_char_ppm"]].astype(
        {"doc_id": "int64", "n_words": "int64"})


def repetition_stats(ds):
    return ds.map_batches(repetition_stats_batch, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4-style heuristic quality flags
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 50            # C4 drops pages with < 3 sentences; word analog
C4_WORD_LEN_LO_E2 = 300      # mean word length in [3, 10] (Gopher §A1.1)
C4_WORD_LEN_HI_E2 = 1000


def c4_quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality flags a la C4 / Gopher over single-line webtext:
    word count, mean word length (1e-2 units), curly-brace marker (C4
    drops code-like pages containing '{'), 'lorem ipsum' marker, and the
    derived keep-flags. All vectorized pandas str kernels."""
    text = batch["text"].fillna("")
    n_words = text.str.count(r"\S+").astype("int64")
    word_chars = text.str.count(r"\S").astype("int64")
    denom = n_words.replace(0, 1)
    mean_e2 = np.floor(word_chars * 100.0 / denom + 0.5).astype("int64")
    mean_e2[n_words == 0] = 0
    lower = text.str.lower()
    has_curly = text.str.contains("{", regex=False)
    has_lorem = lower.str.contains("lorem ipsum", regex=False)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_words": n_words,
        "mean_word_len_e2": mean_e2,
        "has_curly": has_curly,
        "has_lorem": has_lorem,
        "min_words_ok": n_words >= C4_MIN_WORDS,
        "word_len_ok": (mean_e2 >= C4_WORD_LEN_LO_E2)
        & (mean_e2 <= C4_WORD_LEN_HI_E2),
    })


def c4_quality(ds):
    return ds.map_batches(c4_quality_batch, batch_format="pandas")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# [0-9] (not \d) and explicit classes keep Python re and DuckDB RE2 in
# exact agreement; applied in this order on both sides
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]
_PII_COMPILED = [(name, re.compile(pat), rep) for name, pat, rep in PII_PATTERNS]


def pii_redact_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Count and mask emails / phone numbers / IPv4 addresses. Patterns
    are compiled once at module import (no per-batch setup); counting and
    substitution are pandas str kernels over the whole batch. Applied
    sequentially (email, phone, ip) so the SQL oracle's nested
    regexp_replace reproduces the exact output text."""
    text = batch["text"].fillna("")
    out = {"doc_id": batch["doc_id"]}
    red = text
    for name, rx, rep in _PII_COMPILED:
        out[f"n_{name}"] = red.str.count(rx).astype("int64")
        red = red.str.replace(rx, rep, regex=True)
    out["text_redacted"] = red
    return pd.DataFrame(out)


def pii_redact(ds):
    return ds.map_batches(pii_redact_batch, batch_format="pandas")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

KNUTH = 2654435761  # same multiplicative hash as stages/sampling.py


def split_assign_batch(batch: pd.DataFrame, *, key_col: str = "doc_id",
                       train_pct: int = 80, val_pct: int = 10) -> pd.DataFrame:
    """Assign each row to train/val/test by key hash — reproducible
    across runs, partitionings and engines (same rule as
    stages/sampling.py: seeded-RNG splits depend on run order; hashing a
    stable key does not). bin = (key * KNUTH) mod 2^32 mod 100."""
    h = (batch[key_col].to_numpy().astype("int64") * KNUTH) % (1 << 32) % 100
    split = np.where(h < train_pct, "train",
                     np.where(h < train_pct + val_pct, "val", "test"))
    return pd.DataFrame({key_col: batch[key_col],
                         "split": pd.Series(split, dtype="object")})


def split_assign(ds, *, key_col: str = "doc_id", train_pct: int = 80,
                 val_pct: int = 10):
    import functools
    return ds.map_batches(
        functools.partial(split_assign_batch, key_col=key_col,
                          train_pct=train_pct, val_pct=val_pct),
        batch_format="pandas")


def split_datasets(ds, *, key_col: str = "doc_id", train_pct: int = 80,
                   val_pct: int = 10):
    """Three filtered views of ``ds`` (lazy; each re-reads its rows —
    write each to its own partition directory for a materialized split)."""
    def keep(name):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            h = (df[key_col].to_numpy().astype("int64") * KNUTH) \
                % (1 << 32) % 100
            s = np.where(h < train_pct, "train",
                         np.where(h < train_pct + val_pct, "val", "test"))
            return df[s == name].reset_index(drop=True)
        return f
    return {name: ds.map_batches(keep(name), batch_format="pandas")
            for name in ("train", "val", "test")}


# ---------------------------------------------------------------------------
# Unigram language-model scoring
# ---------------------------------------------------------------------------

def unigram_counts(ds, *, text_col: str = "text") -> pd.DataFrame:
    """Corpus unigram vocabulary with counts: per-batch value_counts
    partials (one row per distinct word per batch) combined on the
    driver. Bounded by VOCABULARY size, not corpus size — natural-language
    vocabularies plateau in the millions, fine on one machine; for an
    unbounded token space route the partials through the same
    hash-partitioned reduce as stages/sketch.py heavy hitters."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[text_col].fillna("").str.findall(r"\S+") \
            .explode().dropna().value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(dtype="int64")})

    parts = pd.concat(
        list(ds.select_columns([text_col])
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    return parts.groupby("w", as_index=False)["n"].sum()


def unigram_logprob(ds, vocab: pd.DataFrame, *,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean negative log-likelihood under the corpus
    unigram model: nll = mean over in-vocab words of -ln(count/total),
    rounded to 6 dp (both float parity margin and the oracle's
    comparison grain). High nll = rare-word-heavy documents; the
    classic cheap fluency/quality signal (e.g. CCNet's LM filter,
    Wenzek et al. 2020, uses a real LM — this is its unigram floor).

    ``vocab`` (from :func:`unigram_counts`) ships inside the task
    closure as a plain dict — for vocabularies too large for closures,
    ``ray.put`` the dict and fetch in an actor-pool __init__ like
    MarkContamination. Zero-word (or all-OOV) docs emit no row."""
    total = float(vocab["n"].sum())
    logp = dict(zip(vocab["w"], -np.log(vocab["n"].to_numpy() / total)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.findall(r"\S+").explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "nll": pd.Series([], dtype="float64")})
        t = pd.DataFrame({id_col: df[id_col].reindex(ex.index),
                          "lp": ex.map(logp)})
        t = t.dropna(subset=["lp"])
        out = t.groupby(id_col, as_index=False)["lp"].mean()
        return pd.DataFrame({id_col: out[id_col].astype("int64"),
                             "nll": out["lp"].round(6).astype("float64")})

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# Benchmark contamination (n-gram overlap)
# ---------------------------------------------------------------------------

CONTAM_NGRAM = 8          # 8-word shingles, the GPT-3/PaLM decontam range
_WORD_HASH_BASE = np.uint64(1099511628211)   # FNV-ish odd multiplier


def _ngrams_from_word_hashes(wh: np.ndarray, n: int) -> np.ndarray:
    """Distinct polynomial combines of n consecutive word hashes
    (order-sensitive, so permuted text does not collide)."""
    m = len(wh) - n + 1
    if m <= 0:
        return np.zeros(0, dtype=np.uint64)
    acc = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        acc = acc * _WORD_HASH_BASE + wh[k:k + m]
    return np.unique(acc)


def _batch_word_hashes(texts: pd.Series):
    """One vectorized hash pass for a whole batch: explode every
    lowercased token, hash them all with pandas' C siphash
    (deterministic fixed key — stable across processes and runs), and
    return (flat uint64 hashes, per-doc offsets). No per-word Python."""
    words = texts.str.lower().str.findall(r"\S+")
    counts = words.str.len().fillna(0).astype("int64").to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)])
    flat = words.explode().dropna()
    if len(flat) == 0:
        return np.zeros(0, dtype=np.uint64), offsets
    hashes = pd.util.hash_array(flat.to_numpy(dtype=object))
    return hashes.astype(np.uint64), offsets


def word_ngram_shingles(text: str, n: int = CONTAM_NGRAM) -> np.ndarray:
    """Distinct n-word shingle hashes of one text (single-doc wrapper
    over the batch kernel; used to build benchmark sets)."""
    wh, _ = _batch_word_hashes(pd.Series([text]))
    return _ngrams_from_word_hashes(wh, n)


def build_benchmark_shingles(texts: Sequence[str],
                             n: int = CONTAM_NGRAM) -> np.ndarray:
    """Sorted distinct shingle hashes of a benchmark/eval set. Benchmark
    suites are small by construction (thousands of documents, not
    corpora) — built on the driver and broadcast once via ``ray.put``.
    For a benchmark too large for one machine, shard it and union the
    per-shard arrays; the probe below is unchanged."""
    parts = [word_ngram_shingles(t, n) for t in texts]
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


class MarkContamination:
    """Actor-pool stage: flag documents sharing any ``n``-word shingle
    with the broadcast benchmark set. The sorted shingle array is fetched
    from the object store ONCE per actor (zero-copy numpy view) in
    __init__; each doc probes via binary search (searchsorted), so cost
    is shingles x log(benchmark) with no Python-level set ops."""

    def __init__(self, shingles_ref, n: int = CONTAM_NGRAM,
                 min_hits: int = 1):
        import ray
        self.bench = ray.get(shingles_ref)
        self.n = n
        self.min_hits = min_hits

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        hashes, offsets = _batch_word_hashes(texts)
        n_sh = np.zeros(len(texts), dtype=np.int64)
        n_hit = np.zeros(len(texts), dtype=np.int64)
        for i in range(len(texts)):
            sh = _ngrams_from_word_hashes(
                hashes[offsets[i]:offsets[i + 1]], self.n)
            n_sh[i] = len(sh)
            if len(sh) and len(self.bench):
                pos = np.searchsorted(self.bench, sh)
                pos[pos >= len(self.bench)] = len(self.bench) - 1
                n_hit[i] = int((self.bench[pos] == sh).sum())
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_shingles": n_sh,
            "n_hits": n_hit,
            "contaminated": n_hit >= self.min_hits,
        })


def mark_contamination(ds, benchmark_texts: Sequence[str], *,
                       n: int = CONTAM_NGRAM, min_hits: int = 1,
                       concurrency: Optional[int] = None):
    import ray
    ref = ray.put(build_benchmark_shingles(benchmark_texts, n))
    # autoscaling pool floor 1: a full-width pool can deadlock the read
    # stage on a saturated cluster (see memory: actor-pool pitfall)
    return ds.map_batches(
        MarkContamination, batch_format="pandas",
        concurrency=concurrency or (1, 8),
        fn_constructor_kwargs={"shingles_ref": ref, "n": n,
                               "min_hits": min_hits})


# --- shared-span inventory (exact substring-dedup lite) ----------------------
# Deduplicating repeated SPANS (not whole documents) is the Lee et al.
# "Deduplicating Training Data Makes Language Models Better" setting; the
# full suffix-array construction is replaced here by its bounded practical
# core: an exact inventory of every word n-gram that appears in 2+ distinct
# documents, with occurrence counts — the candidate span set a dedup or
# boilerplate pass consumes.

SPAN_NGRAM = 5


def _gram_rows(df: pd.DataFrame, *, id_col: str, text_col: str,
               n: int) -> pd.DataFrame:
    """(doc_id, gram) rows for one batch, fully vectorized: one explode,
    then n-1 shifted string concats with a same-doc run mask — no
    per-row Python loop."""
    toks = df[text_col].fillna("").str.lower().str.split()
    ex = toks.explode()
    ex = ex[ex.notna()]
    if not len(ex):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "gram": pd.Series([], dtype="object")})
    ids = df[id_col].to_numpy()[
        df.index.get_indexer(ex.index.to_numpy())]
    d = pd.DataFrame({id_col: ids, "tok": ex.to_numpy()})
    gram = d["tok"].copy()
    same = np.ones(len(d), dtype=bool)
    doc = d[id_col]
    for s in range(1, n):
        same &= (doc.shift(-s) == doc).to_numpy()
        gram = gram + " " + d["tok"].shift(-s)
    return pd.DataFrame({id_col: d[id_col], "gram": gram})[same]


def duplicate_ngrams(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     n: int = SPAN_NGRAM, min_docs: int = 2,
                     reduce_partitions: int = 64):
    """Every word ``n``-gram appearing in >= ``min_docs`` distinct
    documents, with the distinct-doc and total-occurrence counts.

    Scale shape: per-batch (gram, doc, occurrences) partials are FINAL
    (a doc never spans batches), pre-aggregated before the single
    coarse gram-hash shuffle; the per-partition reduce is one
    vectorized groupby. Output is bounded by the shared-gram inventory,
    which real corpora keep far below the gram stream (and the
    ``min_docs`` filter drops the singleton long tail before it ever
    reaches the driver or a sink).

    Partitioning assumption (same as inverted_index): the hottest
    gram's per-doc rows fit one reduce task. A gram present in most
    documents concentrates n_docs rows in one partition; at 1e9+ docs
    add a count pre-pass that caps or salts grams above a document
    -frequency ceiling before the shuffle."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = _gram_rows(df, id_col=id_col, text_col=text_col, n=n)
        out = g.groupby(["gram", id_col], as_index=False, sort=False) \
            .size().rename(columns={"size": "n_occ"})
        h = pd.util.hash_array(out["gram"].to_numpy())
        out["_pk"] = (h % reduce_partitions).astype("int64")
        return out.astype({"n_occ": "int64"})

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("gram", as_index=False, sort=False) \
            .agg(n_docs=(id_col, "size"), n_occ=("n_occ", "sum"))
        agg = agg[agg["n_docs"] >= min_docs]
        return agg.astype({"n_docs": "int64", "n_occ": "int64"})

    parts = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pandas")
    return parts.groupby("_pk").map_groups(
        lambda g: reduce_partition(g.drop(columns=["_pk"])),
        batch_format="pandas")


def ngram_novelty(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  n: int = SPAN_NGRAM, min_docs: int = 2,
                  gram_partitions: int = 64,
                  doc_partitions: int = 32):
    """Per-document novelty: the fraction of a doc's word ``n``-gram
    occurrences NOT shared with >= ``min_docs`` - 1 other documents —
    the per-doc aggregate of the ``duplicate_ngrams`` span inventory, a
    standard near-duplicate / boilerplate quality signal (docs made of
    corpus-repeated spans score ~0, fresh text ~1). Docs with fewer
    than ``n`` words have no grams and score 1.0.

    Scale shape: per-doc gram totals are batch-local (no shuffle);
    shared-occurrence counts ride the same single coarse gram-hash
    shuffle as duplicate_ngrams, re-emitted as slim per-doc partials;
    one final coarse doc-hash groupby folds (total, shared) into the
    novelty score. Nothing gram-shaped reaches the driver."""

    def totals(df: pd.DataFrame) -> pd.DataFrame:
        g = _gram_rows(df, id_col=id_col, text_col=text_col, n=n)
        cnt = g.groupby(id_col, sort=False).size()
        ids = df[id_col].to_numpy().astype("int64")
        tot = np.zeros(len(df), dtype="int64")
        if len(cnt):
            pos = {v: i for i, v in enumerate(ids)}
            tot[[pos[i] for i in cnt.index]] = cnt.to_numpy()
        return pd.DataFrame({
            id_col: ids, "_tot": tot,
            "_sh": np.zeros(len(df), dtype="int64"),
            "_dk": ((ids.astype("uint64") * np.uint64(2654435761))
                    % np.uint64(doc_partitions)).astype("int64")})

    def gram_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = _gram_rows(df, id_col=id_col, text_col=text_col, n=n)
        out = g.groupby(["gram", id_col], as_index=False, sort=False) \
            .size().rename(columns={"size": "n_occ"})
        h = pd.util.hash_array(out["gram"].to_numpy())
        out["_pk"] = (h % gram_partitions).astype("int64")
        return out.astype({"n_occ": "int64"})

    def shared_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("gram", sort=False)[id_col].transform("size")
        g = g[nd.to_numpy() >= min_docs]
        agg = g.groupby(id_col, as_index=False, sort=False)["n_occ"] \
            .sum()
        ids = agg[id_col].to_numpy().astype("int64")
        return pd.DataFrame({
            id_col: ids,
            "_tot": np.zeros(len(agg), dtype="int64"),
            "_sh": agg["n_occ"].to_numpy().astype("int64"),
            "_dk": ((ids.astype("uint64") * np.uint64(2654435761))
                    % np.uint64(doc_partitions)).astype("int64")})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(id_col, as_index=False, sort=False) \
            .agg(n_grams=("_tot", "sum"), n_shared=("_sh", "sum"))
        tot = agg["n_grams"].to_numpy(dtype="float64")
        sh = agg["n_shared"].to_numpy(dtype="float64")
        nov = np.round(
            1.0 - np.where(tot > 0, sh / np.where(tot > 0, tot, 1.0),
                           0.0), 6)
        return pd.DataFrame({
            id_col: agg[id_col].astype("int64"),
            "n_grams": agg["n_grams"].astype("int64"),
            "n_shared": agg["n_shared"].astype("int64"),
            "novelty": nov})

    total_rows = ds.select_columns([id_col, text_col]).map_batches(
        totals, batch_format="pandas")
    shared_rows = ds.select_columns([id_col, text_col]) \
        .map_batches(gram_partial, batch_format="pandas") \
        .groupby("_pk").map_groups(
            lambda g: shared_per_doc(g.drop(columns=["_pk"])),
            batch_format="pandas")
    return total_rows.union(shared_rows).groupby("_dk").map_groups(
        lambda g: fold(g.drop(columns=["_dk"])), batch_format="pandas")


def threshold_sweep(scores, *, score_col: str = "score",
                    weight_col: str | None = None,
                    thresholds=None):
    """Filter-calibration sweep: for every candidate threshold t, the
    kept-document count (score > t) and kept weight sum — the curve a
    curation pipeline reads to pick its quality cutoff (how much data
    survives at each operating point) without re-running the filter per
    candidate.

    ONE streaming pass: each batch compares its scores against the
    whole threshold grid via a broadcasted matrix (rows x |grid| bools)
    and emits |grid| partial rows; a |grid|-row groupby-sum finishes.
    Returns a Dataset of (threshold, n_keep[, w_keep])."""
    import ray.data  # noqa: F401  (engine dependency)

    if thresholds is None:
        thresholds = [round(0.1 * i, 1) for i in range(1, 10)]
    # np.unique, not sorted(): a duplicated caller threshold would emit
    # duplicate grid rows per batch that the groupby-Sum merges, doubling
    # that threshold's counts
    grid = np.unique(np.asarray(list(thresholds), dtype="float64"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(dtype="float64")
        keep = s[:, None] > grid[None, :]
        out = pd.DataFrame({
            "threshold": grid,
            "n_keep": keep.sum(axis=0).astype("int64")})
        if weight_col is not None:
            # integer weights stay int64 end-to-end (exact, combine-order
            # free); float weights round at the end like other float aggs
            w = df[weight_col].to_numpy()
            if np.issubdtype(w.dtype, np.integer):
                out["w_keep"] = keep.T.astype("int64") @ w.astype("int64")
            else:
                out["w_keep"] = keep.T @ w.astype("float64")
        return out

    from ray.data.aggregate import Sum

    aggs = [Sum("n_keep", alias_name="n_keep")]
    if weight_col is not None:
        aggs.append(Sum("w_keep", alias_name="w_keep"))
    out = scores.map_batches(partial, batch_format="pandas") \
        .groupby("threshold").aggregate(*aggs)

    def fix_types(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_keep"] = df["n_keep"].astype("int64")
        if weight_col is not None:
            if np.issubdtype(df["w_keep"].dtype, np.integer):
                df["w_keep"] = df["w_keep"].astype("int64")
            else:
                df["w_keep"] = np.round(df["w_keep"], 6)
        return df

    return out.map_batches(fix_types, batch_format="pandas")


# --- collocation mining (PMI) ------------------------------------------------

PMI_MIN_COUNT = 5


def bigram_pmi(ds, *, text_col: str = "text", min_count: int = PMI_MIN_COUNT,
               k: int = 20, distributed: bool = False) -> pd.DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information: pmi = ln((c_ab/B) / ((c_a/T) * (c_b/T))) over corpus
    unigram/bigram counts — the classic collocation-extraction
    statistic, useful for tokenizer/vocab curation over a training
    corpus.

    Scale shape: unigram and bigram counts are per-batch value-count
    partials combined through stages/sketch.py:_combine_value_counts
    (driver combine bounded by vocabulary x batches; pass
    ``distributed=True`` for the hash-partitioned reduce when the
    bigram vocabulary is corpus-scale). The PMI arithmetic happens once
    on the combined count tables, with the exact float expression
    mirrored in the SQL oracle (pure mult/div/ln of doubles — bitwise
    reproducible)."""
    from . import sketch

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        blob = " ".join(df[text_col].fillna("")).lower()
        toks = np.asarray(blob.split(), dtype=object)
        if not len(toks):
            return pd.DataFrame({"w": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        vals, counts = np.unique(toks, return_counts=True)
        return pd.DataFrame({"w": vals, "n": counts.astype("int64")})

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.split()
        ex = toks.explode()
        ex = ex[ex.notna()]
        if len(ex) < 2:
            return pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        d = pd.DataFrame({"doc": df.index.get_indexer(ex.index.to_numpy()),
                          "tok": ex.to_numpy()})
        nxt = d["tok"].shift(-1)
        same = (d["doc"].shift(-1) == d["doc"]).to_numpy()
        bi = (d["tok"] + " " + nxt)[same]
        if not len(bi):
            return pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        vals, counts = np.unique(bi.to_numpy(), return_counts=True)
        return pd.DataFrame({"bigram": vals, "n": counts.astype("int64")})

    sel = ds.select_columns([text_col])
    uni = sketch._combine_value_counts(
        sel.map_batches(uni_partial, batch_format="pandas"), "w",
        distributed)
    bi = sketch._combine_value_counts(
        sel.map_batches(bi_partial, batch_format="pandas"), "bigram",
        distributed)
    if not len(bi):
        return pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "pmi": pd.Series([], dtype="float64")})
    t = float(uni["n"].sum())
    b_tot = float(bi["n"].sum())
    ucnt = dict(zip(uni["w"], uni["n"].astype(float)))
    bi = bi[bi["n"] >= min_count].copy()
    parts = bi["bigram"].str.split(" ", n=1, expand=True)
    ca = parts[0].map(ucnt).to_numpy(dtype="float64")
    cb = parts[1].map(ucnt).to_numpy(dtype="float64")
    cab = bi["n"].to_numpy(dtype="float64")
    bi["pmi"] = np.round(np.log((cab / b_tot) / ((ca / t) * (cb / t))), 6)
    out = bi.sort_values(["pmi", "bigram"], ascending=[False, True],
                         kind="mergesort").head(k)
    return out.reset_index(drop=True).astype({"n": "int64"})
