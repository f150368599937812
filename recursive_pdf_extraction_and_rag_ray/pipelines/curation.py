"""End-to-end training-corpus curation pipeline: the LLM-data workflow
the operator families exist for, composed as ONE streaming Ray Data
pipeline —

    read -> fused quality signals (language-ID, token count, char
    entropy, md5 fingerprint; one batch pass) -> threshold filter ->
    exact dedup keep-first -> per-domain quota mixture -> curated rows

Every stage is deterministic, so the WHOLE pipeline has a single DuckDB
oracle (pipelines/queries.py:SQL_CURATION) checking the exact surviving
row set — filters and signals mirror the per-operator parity contracts
(SQL_LANG_ID / SQL_TOKEN_COUNT / SQL_CHAR_ENTROPY / SQL_DEDUP_EXACT /
SQL_MIXTURE_SAMPLE).

Scale shape: the signal+filter pass is embarrassingly parallel and
prunes the corpus BEFORE any shuffle; dedup and quota are the only two
exchanges, both over already-filtered slim rows (no text column crosses
the wire — the fingerprint stands in for it). The reference has no
curation pipeline at all; this is the composition target for the
training-data operator family (SURVEY.md section 7.35).
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np
import pandas as pd
import ray
import ray.data

from ..stages import sampling
from ..stages.temporal import TEMPORAL_COARSE_GROUPS, _knuth_pkey
from ..stages.textstats import EN_MIN_HITS, EN_STOPWORDS

CURATE_ENTROPY_MIN = 2.8
CURATE_TOKENS_MIN = 30


def _signals_and_filter(df: pd.DataFrame, *, entropy_min: float,
                        tokens_min: int) -> pd.DataFrame:
    """One fused vectorized pass: every signal computed on the raw
    batch, threshold filter applied immediately so only surviving SLIM
    rows (no text) leave the task."""
    text = df["text"].fillna("")
    n_tokens = text.str.split().str.len().fillna(0).astype("int64")
    padded = " " + text + " "
    hits = None
    for w in EN_STOPWORDS:
        c = padded.str.count(f" {w} ").astype("int64")
        hits = c if hits is None else hits + c
    ents = np.zeros(len(text), dtype="float64")
    for i, t in enumerate(text):
        if not t:
            continue
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        _, cnt = np.unique(cp, return_counts=True)
        p = cnt / float(len(cp))
        ents[i] = -(p * np.log(p)).sum()
    ents = np.round(ents, 6)
    keep = ((ents >= entropy_min) & (n_tokens >= tokens_min)
            & (hits >= EN_MIN_HITS)).to_numpy()
    fp = text[keep].map(
        lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy()[keep],
        "source": df["source"].to_numpy()[keep],
        "n_tokens": n_tokens.to_numpy()[keep],
        "entropy": ents[keep],
        "fp": fp.to_numpy()})


def _keep_first_by_fp(ds: "ray.data.Dataset",
                      coarse: int = TEMPORAL_COARSE_GROUPS,
                      ) -> "ray.data.Dataset":
    """Exact dedup keep-first (min doc_id per fingerprint): associative
    per-batch partial, then one coarse fp-hash shuffle with a
    vectorized per-partition reduce — keys only, never text."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fp", "doc_id"], kind="mergesort") \
            .drop_duplicates(subset=["fp"], keep="first").copy()
        h = pd.util.hash_array(df["fp"].to_numpy())
        df["_pkey"] = _knuth_pkey(h.view("int64"), coarse)
        return df

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["fp", "doc_id"], kind="mergesort") \
            .drop_duplicates(subset=["fp"], keep="first") \
            .drop(columns=["_pkey"])

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("_pkey").map_groups(reduce_partition,
                                     batch_format="pandas")


def _fuzzy_leg(docs: "ray.data.Dataset", deduped: "ray.data.Dataset", *,
               threshold: float,
               distributed: bool = False) -> "ray.data.Dataset":
    """Optional near-dup leg between exact dedup and the quota mixture:
    MinHash+LSH keep-first (stages/neardup.py) over the text of the
    FILTERED+EXACT-DEDUPED survivors only — pairs involving rows already
    dropped must not steal cluster wins (a filtered-out doc with a
    smaller id would otherwise eliminate a kept near-duplicate), so the
    subset is taken before signatures are computed.

    Default path broadcasts the slim kept-id array (ray.put once, read
    zero-copy per batch) to carve the text subset and again to apply the
    survivor set; ``distributed=True`` swaps both for hash joins with
    the empty-block guard (materialize + row-bounded repartition — the
    groupby/map_groups lineage of ``deduped`` emits schema-less empty
    blocks when partitions outnumber rows, the round-4 failure class)."""
    import functools

    from ..stages.neardup import (JOIN_MERGE_ROWS, _default_join_partitions,
                                  merge_small_blocks,
                                  neardup_dedup_keep_first)

    deduped = deduped.materialize()
    n_kept = deduped.count()
    if n_kept == 0:
        return deduped
    text_cols = docs.select_columns(["doc_id", "text"])
    if distributed:
        np_parts = _default_join_partitions()
        slim_parts = max(1, min(np_parts, n_kept // JOIN_MERGE_ROWS + 1))
        # deduped is itself a join side below — merge away its own
        # schema-less empty map_groups blocks too
        deduped = deduped.repartition(slim_parts).materialize()
        kept_ids = deduped.select_columns(["doc_id"])
        subset = text_cols.join(kept_ids, join_type="inner",
                                num_partitions=np_parts, on=("doc_id",))
        survivors, _ = merge_small_blocks(
            neardup_dedup_keep_first(subset, threshold, distributed=True),
            np_parts)
        return deduped.join(survivors, join_type="inner",
                            num_partitions=slim_parts, on=("doc_id",))

    def _in_ids(df: pd.DataFrame, ref) -> pd.DataFrame:
        ids = ray.get(ref)
        return df.loc[np.isin(df["doc_id"].to_numpy().astype(np.int64),
                              ids)]

    kept_arr = np.sort(deduped.select_columns(["doc_id"]).to_pandas()
                       ["doc_id"].to_numpy().astype(np.int64))
    kept_ref = ray.put(kept_arr)
    subset = text_cols.map_batches(
        functools.partial(_in_ids, ref=kept_ref), batch_format="pandas")
    surv_arr = np.sort(
        neardup_dedup_keep_first(subset, threshold).to_pandas()
        ["doc_id"].to_numpy().astype(np.int64))
    surv_ref = ray.put(surv_arr)
    return deduped.map_batches(
        functools.partial(_in_ids, ref=surv_ref), batch_format="pandas")


def curate(docs: "ray.data.Dataset", *, quotas: Dict[str, int],
           entropy_min: float = CURATE_ENTROPY_MIN,
           tokens_min: int = CURATE_TOKENS_MIN,
           fuzzy_threshold: float | None = None,
           fuzzy_distributed: bool = False) -> "ray.data.Dataset":
    """Full curation pass over a documents table. Returns the curated
    slim rows (doc_id, source, n_tokens, entropy). With
    ``fuzzy_threshold`` set, a MinHash near-dup keep-first leg runs
    between exact dedup and the quota mixture (exact+fuzzy dedup in one
    pipeline; ``fuzzy_distributed`` selects the join-based scale twin)."""
    import functools

    sig = docs.map_batches(
        functools.partial(_signals_and_filter, entropy_min=entropy_min,
                          tokens_min=tokens_min),
        batch_format="pandas")
    deduped = _keep_first_by_fp(sig)
    if fuzzy_threshold is not None:
        deduped = _fuzzy_leg(docs, deduped, threshold=fuzzy_threshold,
                             distributed=fuzzy_distributed)
    mixed = sampling.sample_quota(deduped, key_col="doc_id",
                                  group_col="source", quotas=quotas)
    return mixed.select_columns(["doc_id", "source", "n_tokens", "entropy"])
