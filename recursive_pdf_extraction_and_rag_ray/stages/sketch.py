"""Exact distributed frequency / quantile operators over bounded-
cardinality value spaces: heavy hitters (top-k frequent tokens) and
exact quantiles via value histograms.

The reference computes nothing statistical over its corpus; these are
the corpus-profiling steps a training-data pipeline runs before filter
tuning (token frequency tables for stopword/boilerplate lists, length
percentiles for truncation thresholds — cf. the quality-filter
methodology of Gopher/C4-style corpus papers).

Both operators share one shape: per-batch vectorized ``value_counts``
partials (each task emits one row per DISTINCT value in its batch —
never the raw rows), then a combine that is bounded by the VALUE-SPACE
cardinality, not the row count. The default combine is a single
vectorized pass on the driver (same rationale as neardup._hot_buckets:
Ray's per-group aggregate machinery costs ~0.25 ms/group, which loses
to one pandas groupby below ~1e7 distinct values). ``distributed=True``
hash-partitions the partials by value (coarse key) and reduces inside
tasks instead — identical totals, no driver-sized state; use it when
the distinct-value space outgrows one machine (e.g. raw web-scale
vocabularies before any normalization).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import ray
import ray.data

SKETCH_REDUCE_PARTITIONS = 64


def _token_count_partials(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """One row per distinct token in the batch. The batch's texts are
    joined and split ONCE (a single C-level pass), not per row."""
    blob = " ".join(df[text_col].fillna("")).lower()
    toks = np.asarray(blob.split(), dtype=object)
    if not len(toks):
        return pd.DataFrame({"token": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    vals, counts = np.unique(toks, return_counts=True)
    return pd.DataFrame({"token": vals, "n": counts.astype("int64")})


def _combine_value_counts(parts: "ray.data.Dataset", value_col: str,
                          distributed: bool) -> pd.DataFrame:
    """Sum partial (value, n) rows to exact totals. Driver path: one
    vectorized concat+groupby, bounded by |distinct| x n_batches rows.
    Distributed path: coarse hash partition on the value, reduce per
    partition in tasks, then collect the (already-final) totals."""
    if distributed:
        def with_pk(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            h = pd.util.hash_array(df[value_col].to_numpy())
            df["_pk"] = (h % SKETCH_REDUCE_PARTITIONS).astype("int64")
            return df

        def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
            return df.drop(columns=["_pk"]) \
                .groupby(value_col, as_index=False)["n"].sum()

        parts = parts.map_batches(with_pk, batch_format="pandas") \
            .groupby("_pk").map_groups(reduce_partition,
                                       batch_format="pandas")
        frames = list(parts.iter_batches(batch_format="pandas",
                                         batch_size=65536))
        if not frames:
            return pd.DataFrame({value_col: [], "n": []})
        return pd.concat(frames, ignore_index=True)

    frames = list(parts.iter_batches(batch_format="pandas",
                                     batch_size=65536))
    if not frames:
        return pd.DataFrame({value_col: [], "n": []})
    return pd.concat(frames, ignore_index=True) \
        .groupby(value_col, as_index=False)["n"].sum()


def heavy_hitters_tokens(docs: "ray.data.Dataset", *, k: int = 20,
                         text_col: str = "text",
                         distributed: bool = False) -> pd.DataFrame:
    """Exact top-k most frequent whitespace tokens (lowercased) across
    the corpus, ties broken by token ascending. Exactness note: unlike
    Misra-Gries/count-min sketches this keeps true counts — affordable
    because the combine is bounded by vocabulary size, which normalized
    text keeps in the millions even at corpus scale.

    In the distributed path the top-k can additionally be taken PER
    partition before the collect (each value lives in exactly one
    partition after the reduce, so the global top-k is a subset of the
    union of per-partition top-ks) — the collect then carries
    partitions*k rows instead of the vocabulary. Kept as one final
    nlargest here since the totals frame is already small."""
    parts = docs.select_columns([text_col]).map_batches(
        lambda df: _token_count_partials(df, text_col),
        batch_format="pandas")
    tot = _combine_value_counts(parts, "token", distributed)
    if not len(tot):
        return pd.DataFrame({"token": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    out = tot.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True).astype({"n": "int64"})


def exact_quantiles_grouped(ds: "ray.data.Dataset", *, group_col: str,
                            col: str, ps: Sequence[float],
                            distributed: bool = False) -> pd.DataFrame:
    """Per-group exact discrete quantiles (``quantile_disc`` semantics:
    value at 1-based sorted rank ceil(p*n) within the group), same
    value-histogram shape as :func:`exact_quantiles` but keyed: each
    batch ships one (group, value, n) row per distinct pair, the
    combine is bounded by sum of per-group value cardinalities, and the
    final rank walk is one vectorized pass over the sorted histogram.
    Returns columns (group_col, p, {col})."""
    def partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, col]).size().reset_index(name="n")
        return g.astype({col: "int64", "n": "int64"})

    parts = ds.select_columns([group_col, col]).map_batches(
        partials, batch_format="pandas")
    if distributed:
        def with_pk(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            h = pd.util.hash_array(df[group_col].to_numpy())
            df["_pk"] = (h % SKETCH_REDUCE_PARTITIONS).astype("int64")
            return df

        def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
            return df.drop(columns=["_pk"]).groupby(
                [group_col, col], as_index=False)["n"].sum()

        hist = pd.concat(
            list(parts.map_batches(with_pk, batch_format="pandas")
                 .groupby("_pk").map_groups(reduce_partition,
                                            batch_format="pandas")
                 .iter_batches(batch_format="pandas", batch_size=65536)),
            ignore_index=True)
    else:
        frames = list(parts.iter_batches(batch_format="pandas",
                                         batch_size=65536))
        hist = pd.concat(frames, ignore_index=True).groupby(
            [group_col, col], as_index=False)["n"].sum()

    hist = hist.sort_values([group_col, col],
                            kind="mergesort").reset_index(drop=True)
    out = []
    for gname, h in hist.groupby(group_col, sort=True):
        cum = h["n"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = h[col].to_numpy()
        for p in ps:
            rank = max(1, int(np.ceil(p * n)))
            out.append((gname, float(p),
                        int(vals[int(np.searchsorted(cum, rank,
                                                     side="left"))])))
    return pd.DataFrame(out, columns=[group_col, "p", col]).astype(
        {"p": "float64", col: "int64"})


def exact_quantiles(ds: "ray.data.Dataset", col: str,
                    ps: Sequence[float], *,
                    distributed: bool = False) -> pd.DataFrame:
    """Exact discrete quantiles of an integer column: the value at sorted
    rank ceil(p*n) (1-based) — DuckDB ``quantile_disc`` semantics — via a
    distributed value histogram: per-batch value_counts partials, exact
    totals, then a cumulative walk over the (tiny) sorted histogram.
    The raw column never leaves the tasks; only one row per distinct
    value per batch does. Returns columns (p, {col})."""
    parts = ds.select_columns([col]).map_batches(
        lambda df: df[col].value_counts().rename_axis(col)
        .reset_index(name="n").astype({col: "int64", "n": "int64"}),
        batch_format="pandas")
    hist = _combine_value_counts(parts, col, distributed) \
        .sort_values(col, kind="mergesort").reset_index(drop=True)
    if not len(hist):
        return pd.DataFrame({"p": pd.Series([], dtype="float64"),
                             col: pd.Series([], dtype="int64")})
    cum = hist["n"].cumsum().to_numpy()
    n = int(cum[-1])
    vals: List[int] = []
    for p in ps:
        rank = max(1, int(np.ceil(p * n)))
        vals.append(int(hist[col].iloc[int(np.searchsorted(
            cum, rank, side="left"))]))
    return pd.DataFrame({"p": np.asarray(ps, dtype=np.float64),
                         col: pd.Series(vals, dtype="int64")})
