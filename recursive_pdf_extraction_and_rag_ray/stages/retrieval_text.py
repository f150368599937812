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


def _token_doc_tf(df: pd.DataFrame, *, id_col: str, text_col: str,
                  include_dl: bool = False) -> pd.DataFrame:
    """(token, doc_id, tf[, dl]) rows for one batch — final, not partial,
    because each document lives in exactly one batch row. Vectorized:
    one split + one explode + one groupby, no per-row Python. ``dl`` is
    the doc's total token count (constant per doc), carried when the
    index must be BM25-servable without a doclen join."""
    toks = df[text_col].fillna("").str.lower().str.split()
    ids = df[id_col].to_numpy()
    ex = toks.explode()
    ex = ex[ex.notna()]
    if not len(ex):
        cols = {"token": pd.Series([], dtype="object"),
                id_col: pd.Series([], dtype="int64"),
                "tf": pd.Series([], dtype="int64")}
        if include_dl:
            cols["dl"] = pd.Series([], dtype="int64")
        return pd.DataFrame(cols)
    out = pd.DataFrame({"token": ex.to_numpy(),
                        id_col: ids[ex.index.to_numpy()]})
    if include_dl:
        dl = toks.str.len().to_numpy()
        out["dl"] = dl[ex.index.to_numpy()]
        agg = out.groupby(["token", id_col], as_index=False, sort=False) \
            .agg(tf=(id_col, "size"), dl=("dl", "first"))
        return agg.astype({"tf": "int64", "dl": "int64"})[
            ["token", id_col, "tf", "dl"]]
    return out.groupby(["token", id_col], as_index=False, sort=False) \
        .size().rename(columns={"size": "tf"}).astype({"tf": "int64"})


def inverted_index(docs: "ray.data.Dataset", *, id_col: str = "doc_id",
                   text_col: str = "text",
                   shard_size: int = INDEX_SHARD_SIZE,
                   reduce_partitions: int = INDEX_REDUCE_PARTITIONS,
                   with_doclen: bool = False,
                   ) -> "ray.data.Dataset":
    """Distributed inverted index: one row per (token, posting shard)
    with ``df`` (total docs containing the token), ``shard`` (0-based,
    by ascending doc_id) and ``postings`` ('id:tf,id:tf,...' ascending
    by doc_id). Exactly one all-to-all exchange (the coarse token-hash
    shuffle); everything else is embarrassingly parallel.

    ``with_doclen=True`` emits 'id:tf:dl' entries instead (dl = the
    doc's total token count): the index then carries everything BM25
    needs per posting, so ``bm25_topk_from_index`` can score queries
    with ZERO corpus scans and no doclen join.

    Partitioning assumption: the hottest token's (token, doc_id, tf)
    rows fit one reduce task — sharding bounds every OUTPUT row at
    ``shard_size`` entries, but assembly still sees the whole token in
    one partition. At 1e9+ docs, run a df-count pre-pass and drop (or
    route separately) stopword-class tokens above a df cap before the
    shuffle — their posting lists are retrieval-useless anyway."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = _token_doc_tf(df, id_col=id_col, text_col=text_col,
                            include_dl=with_doclen)
        h = pd.util.hash_array(out["token"].to_numpy())
        out["_pk"] = (h % reduce_partitions).astype("int64")
        return out

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        # shard index within each token run, vectorized
        rn = g.groupby("token", sort=False).cumcount().to_numpy()
        pair = g[id_col].astype(str) + ":" + g["tf"].astype(str)
        if with_doclen:
            pair = pair + ":" + g["dl"].astype(str)
        g = g.assign(
            shard=(rn // shard_size).astype("int64"),
            _df=g.groupby("token", sort=False)[id_col]
                 .transform("size").astype("int64"),
            _pair=pair)
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
    operators.

    ONE corpus scan (the tokenize pass is the dominant cost, so it must
    not run twice): each batch tokenizes once and emits a SLIM frame —
    one stats partial row (n_docs, sum_dl, df per term) plus one
    candidate row (id, dl, per-term tf) per doc matching >= 1 term.
    The materialized slim table is then scored with the global
    idf/avgdl: candidates only, never the corpus, and summation stays
    in fixed term order (deterministic floats). Pass ``stats`` (from
    ``_corpus_stats``) to pin precomputed globals instead. For a
    REPEATED-query serving path score from a persisted index via
    ``bm25_topk_from_index`` — zero corpus scans per query."""
    terms = list(terms)
    m = len(terms)
    tf_cols = [f"_tf{j}" for j in range(m)]

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _term_tf_matrix(df, terms, text_col)
        hit = (tf > 0.0).any(axis=1)
        # the stats row is flagged by an explicit boolean marker column,
        # NOT an in-band id value — a corpus may legitimately contain any
        # int64 doc_id (the id below is a filler, never consulted)
        out = pd.DataFrame({
            id_col: np.concatenate(
                [[np.int64(-1)], df[id_col].to_numpy()[hit]]),
            "_is_stats": np.concatenate(
                [[True], np.zeros(int(hit.sum()), dtype=bool)]),
            "_dl": np.concatenate([[dl.sum()], dl[hit]]),
            "_n": np.concatenate(
                [[np.float64(len(df))], np.zeros(int(hit.sum()))]),
        })
        for j in range(m):
            # stats row carries the term's df; candidate rows its tf
            out[tf_cols[j]] = np.concatenate(
                [[np.float64((tf[:, j] > 0.0).sum())], tf[hit, j]])
        return out

    slim_ds = docs.select_columns([id_col, text_col]).map_batches(
        slim, batch_format="pandas").materialize()

    if stats is not None:
        n, avgdl = stats["n_docs"], stats["avgdl"]
        df_map = stats["df"]
    else:
        st = slim_ds.map_batches(
            lambda df: df[df["_is_stats"]], batch_format="pandas") \
            .to_pandas()
        n = int(st["_n"].sum())
        avgdl = float(st["_dl"].sum()) / n if n else 0.0
        df_map = {t: int(st[tf_cols[j]].sum())
                  for j, t in enumerate(terms)}
    idf = np.asarray([math.log((n - df_map[t] + 0.5)
                               / (df_map[t] + 0.5) + 1.0)
                      for t in terms], dtype="float64")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["_is_stats"]]
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        tf = df[tf_cols].to_numpy(dtype="float64")
        dl = df["_dl"].to_numpy(dtype="float64")
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

    part = slim_ds.map_batches(score, batch_format="pandas")
    top = part.sort(["score", id_col], descending=[True, False]).limit(k)
    return top.to_pandas().astype({id_col: "int64", "score": "float64"})


def index_sum_dl(index: "ray.data.Dataset") -> int:
    """Total corpus token count from a ``with_doclen=True`` index: each
    posting entry contributes its tf, so sum(tf over all entries) =
    sum(doclen over all docs). One slim index pass, tiny partials."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["postings"].str.split(",").explode()
        tf = ex.str.split(":").str[1].astype("int64")
        return pd.DataFrame({"s": [np.int64(tf.sum())]})

    tot = 0
    for b in index.select_columns(["postings"]) \
            .map_batches(partial, batch_format="pandas") \
            .iter_batches(batch_format="pandas", batch_size=65536):
        tot += int(b["s"].sum())
    return tot


def bm25_topk_from_index(index: "ray.data.Dataset",
                         terms: Sequence[str], *, n_docs: int,
                         sum_dl: int | None = None, k: int = 10,
                         k1: float = 1.2, b: float = 0.75,
                         id_col: str = "doc_id",
                         reduce_partitions: int = 16) -> pd.DataFrame:
    """BM25 top-k scored ENTIRELY from a persisted ``with_doclen=True``
    inverted index — the serving path: the corpus is scanned zero times
    per query. df comes free from the shard rows, dl from the posting
    entries, ``n_docs`` from corpus metadata (a count the index build
    persists) and ``sum_dl`` from the build-time stats row (derived here
    with one slim index pass when not supplied).

    Shape: filter shards to the query terms (slim scan of the index,
    which is far smaller than the corpus), parse postings vectorized,
    emit (id, term-ordinal, contribution) rows, then ONE coarse
    hash-partitioned reduce sums each doc's contributions in fixed term
    order (deterministic floats, same summation order as the scan-based
    scorer) with per-partition partial top-k before the global cut."""
    terms = list(terms)
    if sum_dl is None:
        sum_dl = index_sum_dl(index)
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0
    term_ord = {t: j for j, t in enumerate(terms)}

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["token"].isin(term_ord)]
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "_j": pd.Series([], dtype="int64"),
            "_s": pd.Series([], dtype="float64"),
            "_pk": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        dfreq = df["df"].to_numpy(dtype="float64")
        idf = np.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        t = df.reset_index(drop=True)
        ex = t["postings"].str.split(",").explode()
        if not len(ex):
            return empty
        sp = ex.str.split(":", expand=True)
        ids = sp[0].astype("int64").to_numpy()
        tf = sp[1].astype("float64").to_numpy()
        dl = sp[2].astype("float64").to_numpy()
        src = ex.index.to_numpy()
        idf_e = idf[src]
        j = t["token"].map(term_ord).to_numpy()[src]
        s = idf_e * tf * (k1 + 1.0) \
            / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pd.DataFrame({
            id_col: ids, "_j": j.astype("int64"), "_s": s,
            "_pk": ((ids.astype("uint64") * np.uint64(2654435761))
                    % np.uint64(reduce_partitions)).astype("int64")})

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        # ascending term-ordinal within each doc => the float summation
        # order matches the scan scorer's fixed term order exactly
        g = g.sort_values([id_col, "_j"], kind="mergesort")
        tot = g.groupby(id_col, sort=False)["_s"].sum()
        out = pd.DataFrame({id_col: tot.index.to_numpy().astype("int64"),
                            "score": np.round(tot.to_numpy(), 6)})
        out = out[out["score"] > 0.0]
        return out.sort_values(["score", id_col],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    rows = index.map_batches(contrib, batch_format="pandas")
    part = rows.groupby("_pk").map_groups(
        lambda g: reduce(g.drop(columns=["_pk"])), batch_format="pandas")
    top = part.sort(["score", id_col], descending=[True, False]).limit(k)
    return top.to_pandas().astype({id_col: "int64", "score": "float64"})


def tfidf_keywords(docs: "ray.data.Dataset", *, top: int = 3,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_docs: int | None = None,
                   token_partitions: int = INDEX_REDUCE_PARTITIONS,
                   doc_partitions: int = 32) -> "ray.data.Dataset":
    """Top-``top`` keywords per document by tf-idf
    (score = round(tf * ln(N/df), 6), ties broken by ascending token) —
    the classic keyword-extraction / weak-labeling primitive.

    Scale shape — two coarse shuffles, nothing driver-sized: the
    (token, doc, tf) rows are final after one batch pass (same kernel
    as the index build); df per token is computed inside the SAME
    token-hash partitioning the index build uses (no global
    distinct-word table anywhere — df is attached to each token-doc row
    in its own partition and the vocabulary is never collected); the
    scored rows then re-partition by doc hash for a vectorized per-doc
    top-``top`` cut. N comes from metadata (``docs.count()``)."""
    if n_docs is None:
        n_docs = docs.count()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = _token_doc_tf(df, id_col=id_col, text_col=text_col)
        h = pd.util.hash_array(out["token"].to_numpy())
        out["_pk"] = (h % token_partitions).astype("int64")
        return out

    def score_partition(g: pd.DataFrame) -> pd.DataFrame:
        # df per token within its home partition (every row of a token
        # lives here), then score every (token, doc) row vectorized
        dfreq = g.groupby("token", sort=False)[id_col] \
            .transform("size").to_numpy(dtype="float64")
        score = np.round(
            g["tf"].to_numpy(dtype="float64")
            * np.log(float(n_docs) / dfreq), 6)
        ids = g[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids, "token": g["token"].to_numpy(), "score": score,
            "_dk": ((ids.astype("uint64") * np.uint64(2654435761))
                    % np.uint64(doc_partitions)).astype("int64")})

    def topk_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "score", "token"], kind="mergesort",
                          ascending=[True, False, True])
        g = g.groupby(id_col, sort=False).head(top)
        return g[[id_col, "token", "score"]].astype({id_col: "int64"})

    rows = docs.select_columns([id_col, text_col]) \
        .map_batches(explode, batch_format="pandas")
    scored = rows.groupby("_pk").map_groups(
        lambda g: score_partition(g.drop(columns=["_pk"])),
        batch_format="pandas")
    return scored.groupby("_dk").map_groups(
        lambda g: topk_per_doc(g.drop(columns=["_dk"])),
        batch_format="pandas")


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
