"""Dataset profiling / summary-statistics operators: per-column stats,
fixed-width histograms, and small pivot tables.

The operational complement to the quality filters — before curating a
100-TB corpus you profile it. All three follow the same scale shape:
one vectorized per-batch partial (bounded rows out per batch: one per
column / bin / cell), a tiny keyed combine, and a driver-sized result.
No full-table shuffle anywhere; the only data crossing the wire is the
partial rows.

Semantics are SQL-expressible (counts, min/max, floor-binning) so the
DuckDB oracle checks them exactly — SQL_PROFILE_ORDERS /
SQL_VALUE_HISTOGRAM / SQL_EVENTS_PIVOT in pipelines/queries.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# per-column profile
# ---------------------------------------------------------------------------

def profile_columns(ds, *, int_cols: Sequence[str] = (),
                    str_cols: Sequence[str] = (),
                    ts_cols: Sequence[str] = ()) -> pd.DataFrame:
    """Per-column (n_rows, n_null, min_value, max_value) over arbitrarily
    large input: each batch emits ONE partial row per column (typed
    minima/maxima), a pandas combine folds them, and min/max render as
    strings last (ints via str(), timestamps via epoch microseconds) so
    heterogeneous columns share one result schema without losing typed
    comparison. Returns columns (column, n_rows, n_null, min_value,
    max_value) sorted by column name."""
    int_cols, str_cols, ts_cols = (list(int_cols), list(str_cols),
                                   list(ts_cols))
    all_cols = int_cols + str_cols + ts_cols

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in all_cols:
            s = df[c]
            nn = int(s.isna().sum())
            valid = s.dropna()
            if c in int_cols:
                mi = int(valid.min()) if len(valid) else None
                ma = int(valid.max()) if len(valid) else None
                rows.append((c, len(s), nn, mi, ma, None, None))
            elif c in ts_cols:
                # typed epoch-us minima (int64) — string render at the end
                v = valid.astype("datetime64[us]").astype("int64")
                mi = int(v.min()) if len(v) else None
                ma = int(v.max()) if len(v) else None
                rows.append((c, len(s), nn, mi, ma, None, None))
            else:
                mi = str(valid.min()) if len(valid) else None
                ma = str(valid.max()) if len(valid) else None
                rows.append((c, len(s), nn, None, None, mi, ma))
        return pd.DataFrame(rows, columns=[
            "column", "n", "n_null", "min_i", "max_i", "min_s", "max_s"])

    parts = pd.concat(
        list(ds.select_columns(all_cols)
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    agg = parts.groupby("column").agg(
        n_rows=("n", "sum"), n_null=("n_null", "sum"),
        min_i=("min_i", "min"), max_i=("max_i", "max"),
        min_s=("min_s", "min"), max_s=("max_s", "max")).reset_index()

    def render(row, lo: bool) -> str:
        i = row["min_i" if lo else "max_i"]
        s = row["min_s" if lo else "max_s"]
        if pd.notna(i):
            return str(int(i))
        return s if s is not None else ""

    agg["min_value"] = agg.apply(lambda r: render(r, True), axis=1)
    agg["max_value"] = agg.apply(lambda r: render(r, False), axis=1)
    out = agg[["column", "n_rows", "n_null", "min_value", "max_value"]]
    return out.sort_values("column").reset_index(drop=True).astype(
        {"n_rows": "int64", "n_null": "int64"})


# ---------------------------------------------------------------------------
# fixed-width histogram
# ---------------------------------------------------------------------------

def histogram_fixed(ds, *, col: str, lo: int, width: int,
                    nbins: int) -> pd.DataFrame:
    """Fixed-width integer histogram: bin = clip(floor((v - lo) / width),
    0, nbins-1); values below ``lo`` clamp into bin 0, values beyond the
    last edge into the last bin. Per-batch bincount partials (nbins ints
    per batch), summed in one small combine. Returns every bin 0..nbins-1
    (zero-filled) with its inclusive range columns."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        b = np.clip((v - lo) // width, 0, nbins - 1).astype("int64")
        return pd.DataFrame({"bin": np.arange(nbins, dtype="int64"),
                             "n": np.bincount(b, minlength=nbins)
                            .astype("int64")})

    parts = pd.concat(
        list(ds.select_columns([col])
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    out = parts.groupby("bin", as_index=False)["n"].sum() \
        .sort_values("bin").reset_index(drop=True)
    out["bin_lo"] = lo + out["bin"] * width
    out["bin_hi"] = out["bin_lo"] + width - 1
    return out[["bin", "bin_lo", "bin_hi", "n"]].astype("int64")


# ---------------------------------------------------------------------------
# pivot counts (small result matrix)
# ---------------------------------------------------------------------------

def pivot_counts(ds, *, row_key: str, col_key: str,
                 col_values: Optional[Sequence[str]] = None) -> pd.DataFrame:
    """Contingency table: one column per ``col_key`` value, one row per
    ``row_key`` value, cells = row counts. The distributed part is a
    per-batch (row, col) crosstab partial — bounded by the CELL count,
    not the row count; the pivot itself happens on the driver over the
    combined cells (a pivot result that doesn't fit a driver isn't a
    pivot you can look at). ``col_values`` fixes the output columns (and
    their order); absent values render as zero columns. Missing
    combinations are 0."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([row_key, col_key], sort=False).size() \
            .reset_index(name="n")
        return g.astype({"n": "int64"})

    parts = pd.concat(
        list(ds.select_columns([row_key, col_key])
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    cells = parts.groupby([row_key, col_key], as_index=False)["n"].sum()
    wide = cells.pivot(index=row_key, columns=col_key, values="n") \
        .fillna(0).astype("int64")
    cols = list(col_values) if col_values is not None \
        else sorted(wide.columns)
    for c in cols:
        if c not in wide.columns:
            wide[c] = 0
    out = wide[cols].reset_index().sort_values(row_key) \
        .reset_index(drop=True)
    out.columns.name = None
    return out
