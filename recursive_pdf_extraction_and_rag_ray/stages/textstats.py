"""Text-analysis stages over a documents-style table: language-ID heuristic,
quality scoring, token counting, fingerprinting.

Reference analogs: crude language detect + readability proxy
(/root/reference/src/utils/metadata_extractor.py:203-222), token counter
(/root/reference/src/services/RAG/convert_to_embeddings.py:106-118), md5
whole-file fingerprint (/root/reference/src/utils/Remove Duplicates/
remove_duplicates.py:7-16).

All batch fns are vectorized pandas string kernels. Their semantics are
deliberately SQL-expressible so the DuckDB oracle can check them exactly
(see __ray_entry__.oracle_sql): token split == Python ``str.split()``,
substring counts == non-overlapping left-to-right ``str.count``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# whole-token stopword probes, counted on " "-padded text; >= 3 hits => en
# (reference rule: >= 3 common English words, metadata_extractor.py:214-217)
EN_STOPWORDS = ["the", "and", "of", "to", "in"]
EN_MIN_HITS = 3


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    text = batch["text"].fillna("")
    n_tokens = text.str.split().str.len().fillna(0).astype("int64")
    n_chars = text.str.len().astype("int64")
    approx = np.maximum(1, n_chars // 4).astype("int64")  # tiktoken fallback
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "n_tokens_approx": approx,  # reference max(1, len//4) fallback
    })


def lang_id_batch(batch: pd.DataFrame) -> pd.DataFrame:
    text = batch["text"].fillna("")
    padded = " " + text + " "
    hits = None
    for w in EN_STOPWORDS:
        c = padded.str.count(f" {w} ").astype("int64")
        hits = c if hits is None else hits + c
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "en_hits": hits,
        "is_en": (hits >= EN_MIN_HITS),
    })


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    text = batch["text"].fillna("")
    n_chars = text.str.len().astype("int64")
    n_words = text.str.split().str.len().fillna(0).astype("int64")
    n_periods = text.str.count("\\.").astype("int64")
    n_spaces = text.str.count(" ").astype("int64")
    denom = n_chars.replace(0, 1)
    # integer parts-per-million via floor(x + 0.5): round() would diverge
    # from the SQL oracle on exact .5 boundaries (numpy rounds half-even,
    # DuckDB half-away; dyadic ratios like odd/128 DO land exactly on .5)
    ppm = np.floor(n_spaces * 1_000_000.0 / denom + 0.5).astype("int64")
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_chars": n_chars,
        "n_words": n_words,
        "n_periods": n_periods,
        "space_ppm": ppm,
    })


# ordered first-match-wins doc-type table (reference
# /root/reference/src/utils/metadata_extractor.py:78-87; iteration order of
# the dict is the precedence)
DOC_TYPE_PATTERNS = [
    (r"\b(?:lecture|notes?)\b", "lecture"),
    (r"\b(?:assignment|homework|hw)\b", "assignment"),
    (r"\b(?:exam|test|quiz|midterm|final)\b", "exam"),
    (r"\b(?:textbook|book|manual)\b", "textbook"),
    (r"\b(?:syllabus|outline)\b", "syllabus"),
    (r"\b(?:lab|laboratory|practical)\b", "lab"),
    (r"\b(?:project|report)\b", "project"),
    (r"\bpq\b", "exam"),
]


def doc_type_series(text: pd.Series) -> pd.Series:
    """Vectorized first-match-wins classification over lowercased text
    (reference metadata_extractor.py:203-209: first matching pattern sets
    document_type and breaks)."""
    tl = text.fillna("").str.lower()
    out = pd.Series([""] * len(tl), dtype="object", index=tl.index)
    unset = out == ""
    for pat, label in DOC_TYPE_PATTERNS:
        if not unset.any():
            break
        m = tl.str.contains(pat, regex=True)
        out[unset & m] = label
        unset = out == ""
    return out


def doc_type_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"doc_id": batch["doc_id"],
                         "doc_type": doc_type_series(batch["text"])})


COMPLETENESS_COMPONENTS = 6


def completeness_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Weighted presence score -> 0-100 (reference
    metadata_extractor.py:251-268 _calculate_quality: equal-weight presence
    of identity/facet/content components over the available fields). The
    documents-table analog scores: content present, lang facet, source
    facet, doc-type classified, substantial body (>=100 words), language
    identified — score/max*100, half-up to an integer percent."""
    text = batch["text"].fillna("")
    n_chars = text.str.len()
    n_words = text.str.split().str.len().fillna(0)
    padded = " " + text + " "
    hits = None
    for w in EN_STOPWORDS:
        c = padded.str.count(f" {w} ").astype("int64")
        hits = c if hits is None else hits + c
    dt = doc_type_series(batch["text"])
    score = ((n_chars > 0).astype("int64")
             + (batch["lang"].fillna("") != "").astype("int64")
             + (batch["source"].fillna("") != "").astype("int64")
             + (dt != "").astype("int64")
             + (n_words >= 100).astype("int64")
             + (hits >= EN_MIN_HITS).astype("int64"))
    pct = np.floor(score * 100.0 / COMPLETENESS_COMPONENTS + 0.5).astype("int64")
    return pd.DataFrame({"doc_id": batch["doc_id"],
                         "completeness_pct": pct})


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    fp = batch["text"].fillna("").map(
        lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
    return pd.DataFrame({"doc_id": batch["doc_id"], "fp": fp})


class TokenCounter:
    """Actor-pool token counter (SURVEY A8/M15): tries tiktoken's
    cl100k_base first, falls back to ``max(1, len//4)`` — exactly the
    reference's two-tier counter (/root/reference/src/services/RAG/
    convert_to_embeddings.py:106-118). The encoder (when present) is built
    ONCE per actor in __init__; this sandbox has no tiktoken, so the
    fallback path is the tested one and the import is probed, never
    required."""

    def __init__(self, encoding: str = "cl100k_base"):
        self.enc = None
        try:
            import tiktoken
            self.enc = tiktoken.get_encoding(encoding)
        except Exception:
            self.enc = None

    def count(self, text: str) -> int:
        if self.enc is not None:
            return len(self.enc.encode(text))
        return max(1, len(text) // 4)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        if self.enc is not None:
            n = text.map(self.count).astype("int64")
        else:
            n = np.maximum(1, text.str.len() // 4).astype("int64")
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_tokens_model": n})


def rolling_fingerprint(text: str, window: int = 16, mod: int = 1 << 61) -> int:
    """Polynomial rolling hash over the char stream; document fingerprint =
    min window hash (a winnowing-style signature, public technique from
    Schleimer et al., SIGMOD 2003). Not SQL-expressible; checked rows-only."""
    if len(text) < window:
        data = text.encode("utf-8")
        return int.from_bytes(hashlib.sha1(data).digest()[:8], "little") % mod
    base = 257
    h = 0
    pw = pow(base, window - 1, mod)
    best = None
    for i, ch in enumerate(text):
        c = ord(ch) & 0xFFFF
        if i < window:
            h = (h * base + c) % mod
            if i == window - 1:
                best = h
        else:
            out = ord(text[i - window]) & 0xFFFF
            h = ((h - out * pw) * base + c) % mod
            if h < best:
                best = h
    return best


def rolling_fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "rfp": batch["text"].fillna("").map(rolling_fingerprint).astype("int64"),
    })


def char_entropy_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-document character-level Shannon entropy (nats) — a
    compression-ratio-style quality signal: machine-generated or
    repetitive text scores low, natural text high. Codepoints are
    extracted vectorized via a utf-32 reinterpretation (no per-char
    Python), counted with np.unique; empty docs score 0."""
    texts = batch["text"].fillna("")
    ents = np.zeros(len(texts), dtype="float64")
    for i, t in enumerate(texts):
        if not t:
            continue
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        _, cnt = np.unique(cp, return_counts=True)
        p = cnt / float(len(cp))
        ents[i] = -(p * np.log(p)).sum()
    return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                         "entropy": np.round(ents, 6)})
