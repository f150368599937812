"""Per-key ordered window functions (lag / row_number / running sum)
over event streams — SQL ``LAG(x) OVER w``, ``ROW_NUMBER() OVER w``,
``SUM(x) OVER w`` with ``w = (PARTITION BY key ORDER BY ts, tiebreak)``.

The reference has no windowed computation (its closest shape is the
sequential page loop in src/services/RAG/convert_to_embeddings.py);
these are the standard event-feature transforms (previous-action value,
per-entity sequence number, running totals) a log-derived training set
needs.

Ray-Data shape: same coarse-key discipline as stages/temporal.py — one
``hash(key) % coarse`` shuffle, then ONE vectorized pandas kernel per
partition (groupby().shift/cumsum/cumcount — C loops over the whole
partition, never per key). Partitioning assumption: a coarse partition
fits a task; raise ``coarse`` on big clusters. ``value_col`` must be
integral (1e-4 units for money) so running sums are exact.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd

from .temporal import TEMPORAL_COARSE_GROUPS, _knuth_pkey


def window_lag_rank_cumsum(events, *, key: str, ts: str,
                           order_tiebreak: str, value_col: str,
                           out_lag: str = "prev_value",
                           out_rn: str = "rn",
                           out_cumsum: str = "running_sum",
                           coarse: int = TEMPORAL_COARSE_GROUPS,
                           pre_blocks: Optional[int] = None):
    """Attach, per row: the key's previous ``value_col`` (NaN for the
    key's first row — SQL LAG's NULL), the 1-based row number, and the
    inclusive running sum, all ordered by (``ts``, ``order_tiebreak``)
    within the key. Output columns: [key, order_tiebreak, out_lag,
    out_rn, out_cumsum]; ``out_lag`` is float64 (NaN carrier), the
    others exact int64."""
    keep: List[str] = [key, ts, order_tiebreak, value_col]

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = _knuth_pkey(df[key].to_numpy(), coarse)
        return df

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak], kind="mergesort")
        grp = g.groupby(key, sort=False)[value_col]
        return pd.DataFrame({
            key: g[key].to_numpy(),
            order_tiebreak: g[order_tiebreak].to_numpy(),
            out_lag: grp.shift(1).to_numpy(dtype="float64"),
            out_rn: (grp.cumcount() + 1).to_numpy(dtype="int64"),
            out_cumsum: grp.cumsum().to_numpy(dtype="int64"),
        })

    tagged = events.select_columns(keep).map_batches(
        add_pkey, batch_format="pandas")
    if pre_blocks:
        tagged = tagged.repartition(pre_blocks)
    return tagged.groupby("_pkey").map_groups(win, batch_format="pandas")
