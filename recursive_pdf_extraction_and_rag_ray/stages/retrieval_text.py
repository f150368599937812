"""Keyword-retrieval operators: sharded inverted index, BM25 top-k,
conjunctive boolean search, and reciprocal-rank-fusion hybrid retrieval.

The reference's retrieval is vector-only (Chroma cosine top-k,
``src/rag/question_rag.py:130-194``); a production RAG corpus at 100 TB
adds the standard keyword complement — a distributed inverted index and
BM25 scoring — and fuses the two rankings (RRF).  These operators build
that complement Ray-Data-first:

- tokenization is ONE pandas C-level pass per batch (lower + split +
  explode), identical to the DuckDB oracle's
  ``regexp_split_to_array(lower(text),'\\s+')`` + empty-filter semantics
  (the parity contract pinned by SQL_TOKEN_COUNT);
- the index build ships slim ``(token, doc_id, tf)`` rows — tf is FINAL
  after one batch pass because a document never spans batches — through
  a single coarse-keyed shuffle (``hash(token) % reduce_partitions``),
  then assembles posting lists vectorized per partition.  Posting lists
  are SHARDED at ``shard_size`` entries: a Zipf-head token ("the") at
  corpus scale becomes many bounded rows instead of one multi-GB value,
  and shards are the unit of parallel query-time scoring;
- BM25 needs only corpus-global scalars (N, avg doclen, df per query
  term): a per-batch partial row + tiny driver sum — the corpus itself
  never leaves the workers.  Scoring is a second streaming pass with the
  idf table captured in the stage closure (a few floats), per-batch
  partial top-k, then a global sort+limit over <= batches x k rows.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
import ray
import ray.data

# coarse shuffle width for the index reduce: tokens are hash-spread over
# this many partitions so per-task group state stays bounded and the
# map_groups overhead amortizes over many tokens per task (the same
# pattern as sessionize / sketch reduces).
INDEX_REDUCE_PARTITIONS = 64

# posting-list shard width: bounds any single output row (and any single
# query-time scoring task) regardless of token skew.
INDEX_SHARD_SIZE = 1024


def _token_doc_tf(df: pd.DataFrame, *, id_col: str,
                  text_col: str) -> pd.DataFrame:
    """(token, doc_id, tf) rows for one batch — final, not partial,
    because each document lives in exactly one batch row. Vectorized:
    one split + one explode + one groupby, no per-row Python."""
    toks = df[text_col].fillna("").str.lower().str.split()
    ids = df[id_col].to_numpy()
    ex = toks.explode()
    ex = ex[ex.notna()]
    if not len(ex):
        return pd.DataFrame({"token": pd.Series([], dtype="object"),
                             id_col: pd.Series([], dtype="int64"),
                             "tf": pd.Series([], dtype="int64")})
    out = pd.DataFrame({"token": ex.to_numpy(),
                        id_col: ids[ex.index.to_numpy()]})
    return out.groupby(["token", id_col], as_index=False, sort=False) \
        .size().rename(columns={"size": "tf"}).astype({"tf": "int64"})


def inverted_index(docs: "ray.data.Dataset", *, id_col: str = "doc_id",
                   text_col: str = "text",
                   shard_size: int = INDEX_SHARD_SIZE,
                   reduce_partitions: int = INDEX_REDUCE_PARTITIONS,
                   ) -> "ray.data.Dataset":
    """Distributed inverted index: one row per (token, posting shard)
    with ``df`` (total docs containing the token), ``shard`` (0-based,
    by ascending doc_id) and ``postings`` ('id:tf,id:tf,...' ascending
    by doc_id). Exactly one all-to-all exchange (the coarse token-hash
    shuffle); everything else is embarrassingly parallel.

    Partitioning assumption: the hottest token's (token, doc_id, tf)
    rows fit one reduce task — sharding bounds every OUTPUT row at
    ``shard_size`` entries, but assembly still sees the whole token in
    one partition. At 1e9+ docs, run a df-count pre-pass and drop (or
    route separately) stopword-class tokens above a df cap before the
    shuffle — their posting lists are retrieval-useless anyway."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = _token_doc_tf(df, id_col=id_col, text_col=text_col)
        h = pd.util.hash_array(out["token"].to_numpy())
        out["_pk"] = (h % reduce_partitions).astype("int64")
        return out

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        # shard index within each token run, vectorized
        rn = g.groupby("token", sort=False).cumcount().to_numpy()
        g = g.assign(
            shard=(rn // shard_size).astype("int64"),
            _df=g.groupby("token", sort=False)[id_col]
                 .transform("size").astype("int64"),
            _pair=g[id_col].astype(str) + ":" + g["tf"].astype(str))
        out = g.groupby(["token", "shard"], as_index=False, sort=False) \
            .agg(df=("_df", "first"), postings=("_pair", ",".join))
        return out[["token", "shard", "df", "postings"]]

    parts = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas")
    return parts.groupby("_pk").map_groups(
        lambda g: assemble(g.drop(columns=["_pk"])), batch_format="pandas")


def _corpus_stats(docs: "ray.data.Dataset", terms: Sequence[str], *,
                  text_col: str) -> Dict:
    """N, total doclen, and per-term document frequency in ONE streaming
    pass: each batch emits a single partial row; the driver sums
    n_batches rows (bounded by block count, not data size)."""
    terms = list(terms)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.split()
        dl = toks.str.len().to_numpy(dtype="int64")
        row = {"n_docs": np.int64(len(df)), "sum_dl": dl.sum()}
        ex = toks.explode()
        ex = ex[ex.isin(terms)]
        # a doc counts once per term it contains
        uniq = pd.DataFrame({"row": ex.index,
                             "tok": ex.to_numpy()}).drop_duplicates()
        cnt = uniq.groupby("tok").size()
        for i, t in enumerate(terms):
            row[f"df_{i}"] = np.int64(cnt.get(t, 0))
        return pd.DataFrame([row])

    parts = pd.concat(
        list(docs.select_columns([text_col])
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    tot = parts.sum()
    n = int(tot["n_docs"])
    return {"n_docs": n,
            "avgdl": float(tot["sum_dl"]) / n if n else 0.0,
            "df": {t: int(tot[f"df_{i}"]) for i, t in enumerate(terms)}}


def _term_tf_matrix(df: pd.DataFrame, terms: List[str],
                    text_col: str) -> tuple:
    """(tf ndarray [n_rows x n_terms], doclen ndarray) for one batch."""
    toks = df[text_col].fillna("").str.lower().str.split()
    dl = toks.str.len().to_numpy(dtype="float64")
    tf = np.zeros((len(df), len(terms)), dtype="float64")
    ex = toks.explode()
    ex = ex[ex.isin(terms)]
    if len(ex):
        pos = {t: j for j, t in enumerate(terms)}
        counts = ex.groupby([ex.index, ex.to_numpy()]).size()
        rows = counts.index.get_level_values(0).to_numpy()
        cols = np.asarray([pos[t] for t in
                           counts.index.get_level_values(1)])
        # row labels -> positional indices (batch index is a RangeIndex
        # from Ray, but normalize defensively)
        lab2pos = {lab: i for i, lab in enumerate(df.index)}
        rpos = np.asarray([lab2pos[r] for r in rows])
        tf[rpos, cols] = counts.to_numpy(dtype="float64")
    return tf, dl


def bm25_topk(docs: "ray.data.Dataset", terms: Sequence[str], *,
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              stats: Dict | None = None) -> pd.DataFrame:
    """Okapi BM25 top-k over the corpus for a bag-of-words query.
    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (Robertson/Lucene form).
    Scores are float64 and rounded to 6 dp for rank stability (ties
    broken by ascending id) — the same parity discipline as the cosine
    operators. Two streaming passes: stats (tiny partials), then score
    with per-batch partial top-k."""
    terms = list(terms)
    st = stats or _corpus_stats(docs, terms, text_col=text_col)
    n, avgdl = st["n_docs"], st["avgdl"]
    idf = np.asarray([math.log((n - st["df"][t] + 0.5)
                               / (st["df"][t] + 0.5) + 1.0)
                      for t in terms], dtype="float64")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _term_tf_matrix(df, terms, text_col)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(tf > 0.0, idf[None, :] * tf * (k1 + 1.0) / denom,
                         0.0).sum(axis=1)
        out = pd.DataFrame({id_col: df[id_col].to_numpy(),
                            "score": np.round(s, 6)})
        out = out[out["score"] > 0.0]
        # per-batch partial top-k bounds the final sort input
        return out.sort_values(["score", id_col],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    part = docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")
    top = part.sort(["score", id_col], descending=[True, False]).limit(k)
    return top.to_pandas().astype({id_col: "int64", "score": "float64"})


def boolean_and_search(docs: "ray.data.Dataset", terms: Sequence[str], *,
                       id_col: str = "doc_id", text_col: str = "text",
                       ) -> "ray.data.Dataset":
    """Conjunctive keyword search: ids of documents containing EVERY
    query term (whitespace-token equality, not substring). Pure
    streaming filter — no shuffle at all."""
    terms = list(terms)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        tf, _ = _term_tf_matrix(df, terms, text_col)
        keep = (tf > 0.0).all(axis=1)
        return pd.DataFrame({id_col: df[id_col].to_numpy()[keep]})

    return docs.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pandas")


def rrf_fuse(rankings: List[pd.DataFrame], *, id_col: str,
             k: int = 10, rrf_k: int = 60) -> pd.DataFrame:
    """Reciprocal-rank fusion over already-ranked candidate frames (each
    ordered best-first, one row per candidate): fused(doc) =
    sum over lists containing doc of 1/(rrf_k + rank). Driver-side by
    design — inputs are top-``depth`` lists, never corpus-sized."""
    acc: Dict[int, float] = {}
    for frame in rankings:
        for rank, doc in enumerate(frame[id_col].to_numpy(), start=1):
            acc[int(doc)] = acc.get(int(doc), 0.0) + 1.0 / (rrf_k + rank)
    out = pd.DataFrame({id_col: list(acc.keys()),
                        "rrf_score": np.round(list(acc.values()), 6)})
    return out.sort_values(["rrf_score", id_col],
                           ascending=[False, True],
                           kind="mergesort").head(k).reset_index(drop=True)
