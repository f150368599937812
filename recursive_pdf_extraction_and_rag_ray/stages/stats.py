"""Second-moment grouped statistics (mean / sample stddev / Pearson
correlation) as numerically-stable MERGEABLE partials.

Naive distributed variance (sum x, sum x^2, subtract) cancels
catastrophically once sum(x^2) outgrows float64's 15-16 significant
digits — exactly what happens summing 1e9 squared prices. This module
instead ships Chan/Welford partials: each batch reduces per group to
(n, mean, M2[, mean_y, M2_y, C_xy]) with numpy's stable kernels, and
partials merge pairwise with the exact parallel update

    n = na + nb;  d = mb - ma
    mean = ma + d * nb / n
    M2   = M2a + M2b + d^2 * na * nb / n        (co-moment analogous)

(Chan, Golub, LeVeque 1983 — public method). The shuffle moves only
one slim row per (group, batch); the merge runs in ``map_groups`` over
those few rows, sorted first so the float result is order-canonical
and run-invariant.

Reference parity note: the reference's only statistics are billing sum
counters (src/services/RAG/billing.py); grouped dispersion/correlation
is part of the corpus-profiling layer (quality-signal calibration,
length/score distributions) a 100 TB curation pipeline needs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

import ray


def _batch_partials(df: pd.DataFrame, key_col: str, x_col: str,
                    y_col: Optional[str]) -> pd.DataFrame:
    cols = {"n": pd.Series([], dtype="int64"),
            "mean_x": pd.Series([], dtype="float64"),
            "m2_x": pd.Series([], dtype="float64")}
    if y_col:
        cols.update({"mean_y": pd.Series([], dtype="float64"),
                     "m2_y": pd.Series([], dtype="float64"),
                     "c_xy": pd.Series([], dtype="float64")})
    if not len(df):
        return pd.DataFrame({key_col: pd.Series([], dtype="object"), **cols})

    def stats(g: pd.DataFrame) -> pd.Series:
        x = g[x_col].to_numpy(dtype=np.float64)
        mx = float(x.mean())
        out = {"n": len(x), "mean_x": mx,
               "m2_x": float(((x - mx) ** 2).sum())}
        if y_col:
            y = g[y_col].to_numpy(dtype=np.float64)
            my = float(y.mean())
            out.update({"mean_y": my, "m2_y": float(((y - my) ** 2).sum()),
                        "c_xy": float(((x - mx) * (y - my)).sum())})
        return pd.Series(out)

    out = df.groupby(key_col, sort=True).apply(stats).reset_index()
    out["n"] = out["n"].astype("int64")
    return out


def _merge_two(a: dict, b: dict, with_y: bool) -> dict:
    na, nb = a["n"], b["n"]
    n = na + nb
    dx = b["mean_x"] - a["mean_x"]
    out = {"n": n,
           "mean_x": a["mean_x"] + dx * nb / n,
           "m2_x": a["m2_x"] + b["m2_x"] + dx * dx * na * nb / n}
    if with_y:
        dy = b["mean_y"] - a["mean_y"]
        out["mean_y"] = a["mean_y"] + dy * nb / n
        out["m2_y"] = a["m2_y"] + b["m2_y"] + dy * dy * na * nb / n
        out["c_xy"] = a["c_xy"] + b["c_xy"] + dx * dy * na * nb / n
    return out


def grouped_moments(ds: "ray.data.Dataset", *, key_col: str, x_col: str,
                    y_col: Optional[str] = None,
                    round_dp: int = 6) -> "ray.data.Dataset":
    """Per-group (key, n, mean_x, std_x[, corr_xy]) — std is the sample
    standard deviation (None when n < 2), corr the Pearson coefficient
    (None when either variance is 0), both matching DuckDB's
    stddev_samp / corr to ``round_dp`` decimals."""
    with_y = y_col is not None

    partials = ds.map_batches(
        lambda df: _batch_partials(df, key_col, x_col, y_col),
        batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # canonical merge order => run-invariant float results; the key
        # must cover EVERY partial column (y side included when present):
        # two partials tying on the x stats but differing in
        # (mean_y, m2_y, c_xy) would otherwise merge in shuffle order
        sort_key = ["n", "mean_x", "m2_x"]
        if with_y:
            sort_key += ["mean_y", "m2_y", "c_xy"]
        group = group.sort_values(sort_key,
                                  kind="mergesort").reset_index(drop=True)
        acc = group.iloc[0].to_dict()
        for i in range(1, len(group)):
            acc = _merge_two(acc, group.iloc[i].to_dict(), with_y)
        n = int(acc["n"])
        row = {key_col: group[key_col].iloc[0], "n": n,
               "mean_x": round(acc["mean_x"], round_dp),
               "std_x": (round(float(np.sqrt(acc["m2_x"] / (n - 1))),
                               round_dp) if n > 1 else None)}
        if with_y:
            denom = float(np.sqrt(acc["m2_x"] * acc["m2_y"]))
            row["corr_xy"] = (round(acc["c_xy"] / denom, round_dp)
                              if denom > 0 else None)
        out = pd.DataFrame([row])
        out["n"] = out["n"].astype("int64")
        return out

    return partials.groupby(key_col).map_groups(merge,
                                                batch_format="pandas")
