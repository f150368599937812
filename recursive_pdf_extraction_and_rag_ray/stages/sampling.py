"""Deterministic (hash-based) row sampling — uniform and stratified.

Training-data pipelines subsample to a target mix (per-language,
per-source, per-event-type quotas); doing it with a seeded RNG makes
the output depend on partitioning and run order. Hashing a stable key
instead gives a sample that is reproducible across runs, partitionings
and engines — the same rule is expressible in SQL, so the sample is
oracle-checkable.

Rule: keep a row iff ``(key * 2654435761) % 2^32 % 10000 < rate_e4``
(Knuth multiplicative hash; rate in 1e-4 units). Assumes ``key <
2^32`` so the product stays exact in int64 on both the numpy and SQL
sides — for wider id spaces fold the key first (``key % 2^32``).
Embarrassingly parallel: pure per-batch filter, no shuffle, no state.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

KNUTH = 2654435761


def _keep_mask(keys: np.ndarray, rate_e4: np.ndarray) -> np.ndarray:
    h = (keys.astype("int64") * KNUTH) % (1 << 32) % 10000
    return h < rate_e4


def sample_uniform(ds, *, key_col: str, rate: float):
    """Keep ~rate of rows, chosen by key hash (deterministic)."""
    rate_e4 = int(round(rate * 10000))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        m = _keep_mask(df[key_col].to_numpy(), np.int64(rate_e4))
        return df[m].reset_index(drop=True)

    return ds.map_batches(f, batch_format="pandas")


def sample_stratified(ds, *, key_col: str, group_col: str,
                      rates: Dict[str, float], default_rate: float = 0.0):
    """Per-group sampling rates (e.g. per event type / language /
    source). ``rates`` is a small dict shipped inside the task closure
    (it serializes with the function — no per-batch fetch); groups
    absent from it fall back to ``default_rate``."""
    rate_e4 = {g: int(round(r * 10000)) for g, r in rates.items()}
    dflt = int(round(default_rate * 10000))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        r = df[group_col].map(rate_e4).fillna(dflt).to_numpy(dtype="int64")
        m = _keep_mask(df[key_col].to_numpy(), r)
        return df[m].reset_index(drop=True)

    return ds.map_batches(f, batch_format="pandas")


def sample_quota(ds, *, key_col: str, group_col: str,
                 quotas: Dict[str, int]):
    """Exact per-group QUOTAS (domain-mixture resampling): from each
    group take exactly ``quotas[g]`` rows (fewer only if the group is
    smaller), chosen in deterministic pseudo-random order — ascending
    ``(knuth_hash(key), key)`` — so the selected set is reproducible
    and SQL-checkable (``row_number() OVER (PARTITION BY g ORDER BY
    hash) <= quota``). This is the data-mixing primitive for hitting a
    target domain distribution, where rate-based sampling
    (sample_stratified) can only hit it in expectation.

    Scale shape: per-BATCH partial top-quota per group first — the
    selection is a per-group min-k over the hash, which is associative
    — so the single groupby shuffle carries <= quota x batches rows per
    group, never the corpus. Groups are domains/languages (tens to
    thousands): far below the coarse-partition count, and each final
    group is quota-bounded."""
    def select(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[group_col].isin(quotas)].copy()
        df["_h"] = (df[key_col].to_numpy().astype("int64")
                    * KNUTH) % (1 << 32)
        df = df.sort_values(["_h", key_col], kind="mergesort")
        q = df[group_col].map(quotas).to_numpy(dtype="int64")
        keep = df.groupby(group_col, sort=False).cumcount().to_numpy() < q
        return df[keep]

    parts = ds.map_batches(select, batch_format="pandas")
    return parts.groupby(group_col).map_groups(
        select, batch_format="pandas").drop_columns(["_h"])


def sample_weighted(ds, *, key_col: str, weight_col: str, k: int):
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row scores u^(1/w) with u a
    hash-derived uniform in (0,1); the k largest scores win, giving
    inclusion probability proportional to weight — but reproducible
    across runs/partitionings and SQL-checkable, unlike RNG reservoirs.
    Ranking uses the monotone transform es_score = ln(u)/w (rounded 6dp,
    ties by key). Per-batch partial top-k, then a tiny global
    sort+limit — the distributed-reservoir shape with no driver state.
    Rows with weight <= 0 are excluded (both here and in the oracle)."""
    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[weight_col] > 0].copy()
        h = (df[key_col].to_numpy().astype("int64") * KNUTH) % (1 << 32)
        u = (h.astype("float64") + 1.0) / 4294967297.0
        df["es_score"] = np.round(np.log(u) / df[weight_col].to_numpy(
            dtype="float64"), 6)
        return df.sort_values(["es_score", key_col],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    part = ds.map_batches(score, batch_format="pandas")
    return part.sort(["es_score", key_col],
                     descending=[True, False]).limit(k)
