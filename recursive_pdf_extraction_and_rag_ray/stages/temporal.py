"""Temporal / interval operator family: keyed as-of join, broadcast range
(interval) join, and per-key rolling-window aggregates.

The reference has no temporal operators at all (its closest artifact is
the per-run billing timestamp in src/services/RAG/billing.py); these are
the standard event-stream shapes a training-data pipeline meets as soon
as logs/metadata carry time (attach the feature row in force at event
time; band a value into overlapping ranges; trailing-window stats).

Ray-Data shapes (all three reuse the repo's coarse-key discipline —
see pipelines/queries.py:q_events_sessionize for the rationale):

- **as-of join**: both sides are shuffled ONCE by hash(key) mod
  ``coarse`` (a pair of map_batches + one groupby — no per-key groups,
  no driver state), then each coarse partition runs one vectorized
  ``pd.merge_asof`` over its sorted rows. Linear per partition;
  partitioning assumption: one coarse partition's rows fit a task
  (raise ``coarse`` on big clusters; salt a pathologically hot key by
  splitting its LEFT rows — as-of is left-row-independent).
- **range join**: the interval table is the SMALL side (bands, SLAs,
  calendars) — ship it once via ``ray.put`` and probe per batch with a
  vectorized lo/hi mask; never a shuffle. Partitioning assumption:
  intervals fit one object (thousands, not millions).
- **rolling window**: same coarse shuffle, then per-partition
  ``groupby(key).rolling`` — one pandas kernel per partition, not per
  key.

Money/value columns are carried as integer 1e-4 units (the repo-wide
float-sum parity rule, see q_agg_rollup) so rolling/band sums are exact
and association-order independent.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import ray
import ray.data

TEMPORAL_COARSE_GROUPS = 256

# Ray's sort-based groupby pays a per-(block x partition) machinery cost
# that dwarfs the compare work when the input arrives as many tiny blocks
# (measured at sf0.1: 128 x ~2k-row blocks -> 5.8 s of an 8.6 s join;
# coalescing to 32 blocks first -> 2.8 s total). ``pre_blocks`` coalesces
# the tagged union before the shuffle; size it so blocks carry >= ~100k
# rows but never drop below the cluster's parallelism — at real scale the
# natural read blocks are already large and this stays None.
TEMPORAL_PRE_BLOCKS_DOC = 32


def _knuth_pkey(keys: np.ndarray, coarse: int) -> np.ndarray:
    return (keys.astype("int64") * 2654435761 % (1 << 32)) % coarse


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              key: str, left_ts: str, right_ts: str,
              left_cols: List[str], right_cols: List[str],
              int_cols: Optional[List[str]] = None,
              coarse: int = TEMPORAL_COARSE_GROUPS,
              pre_blocks: Optional[int] = None) -> "ray.data.Dataset":
    """For every left row, attach the single right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``key`` (inner semantics:
    left rows with no earlier right row are dropped) — DuckDB's
    ``ASOF JOIN`` / pandas ``merge_asof(direction='backward')``.

    Ties on (key, right_ts) are resolved deterministically BEFORE the
    join: the right side is reduced to one row per (key, ts), keeping the
    row with the greatest first ``right_cols`` value (callers put a
    unique id column first) — mirroring an arg_max oracle. This also
    shrinks the shuffled right side to at most one row per key-timestamp.

    Both sides cross the wire exactly once, tagged with a side marker and
    unified into one dataset (Ray groupby takes one input); each coarse
    partition then runs a single vectorized merge_asof. Payload columns
    ride the unified schema as float64 (the other side's slots are NaN —
    one concrete dtype, no per-block schema drift); columns listed in
    ``int_cols`` are cast back to int64 on output (exact below 2^53).
    Output columns: [key, '_ts'] + left_cols + right_cols.
    """
    int_back = [c for c in (int_cols or []) if c in left_cols + right_cols]

    def tag(df: pd.DataFrame, ts_col: str, own: List[str],
            other: List[str], side: int) -> pd.DataFrame:
        out = pd.DataFrame({
            key: df[key].to_numpy().astype("int64"),
            "_ts": pd.to_datetime(df[ts_col]).astype("datetime64[ns]"),
        })
        for c in own:
            out[c] = df[c].to_numpy().astype("float64")
        for c in other:
            out[c] = np.nan
        out["_side"] = np.int8(side)
        out["_pkey"] = _knuth_pkey(out[key].to_numpy(), coarse)
        return out[[key, "_ts"] + left_cols + right_cols
                   + ["_side", "_pkey"]]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic tie-kill: keep max first-right-col per (key, ts).
        # Per-batch here (cheap shrink); finished per partition below.
        df = df.sort_values([key, right_ts, right_cols[0]]) \
            .groupby([key, right_ts], as_index=False, sort=False).last()
        return tag(df, right_ts, right_cols, left_cols, 1)

    both = left.map_batches(lambda df: tag(df, left_ts, left_cols,
                                           right_cols, 0),
                            batch_format="pandas") \
        .union(right.map_batches(tag_right, batch_format="pandas"))
    if pre_blocks:
        both = both.repartition(pre_blocks)

    out_cols = [key, "_ts"] + left_cols + right_cols

    def finish_dtypes(m: pd.DataFrame) -> pd.DataFrame:
        for c in int_back:
            m[c] = m[c].astype("int64")
        return m

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0]
        r = g[g["_side"] == 1]
        if not len(l) or not len(r):
            empty = pd.DataFrame({key: pd.Series([], dtype="int64"),
                                  "_ts": pd.Series([],
                                                   dtype="datetime64[ns]"),
                                  **{c: pd.Series([], dtype="float64")
                                     for c in left_cols + right_cols}})
            return finish_dtypes(empty)[out_cols]
        # cross-batch duplicates of the same (key, ts) collapse here
        r = r.sort_values([key, "_ts", right_cols[0]], kind="mergesort") \
            .groupby([key, "_ts"], as_index=False, sort=False).last()
        m = pd.merge_asof(
            l[[key, "_ts"] + left_cols].sort_values("_ts",
                                                    kind="mergesort"),
            r[[key, "_ts"] + right_cols].sort_values("_ts",
                                                     kind="mergesort"),
            on="_ts", by=key, direction="backward")
        m = m.dropna(subset=[right_cols[0]]).reset_index(drop=True)
        return finish_dtypes(m)[out_cols]

    return both.groupby("_pkey").map_groups(merge_partition,
                                            batch_format="pandas")


def range_join_broadcast(ds: "ray.data.Dataset", *, value_col: str,
                         lo: np.ndarray, hi: np.ndarray,
                         band_ids: Optional[np.ndarray] = None):
    """Non-equi (interval) join of a big table against a SMALL interval
    table: row matches band b iff lo[b] <= value < hi[b]; intervals may
    OVERLAP (a row can match several bands — the part a bucketing
    projection can't express). Returns (original columns + ``band``),
    one output row per (row, matching band).

    The interval table is broadcast once (``ray.put``) and probed per
    batch with one vectorized comparison against the batch's value
    vector — no shuffle, no driver loop. For interval tables too big to
    broadcast, sort the breakpoints and probe with searchsorted per
    batch (same operator, log-time probe); a shuffle join is never
    needed unless intervals outnumber rows.
    """
    ids = band_ids if band_ids is not None \
        else np.arange(len(lo), dtype=np.int64)
    ref = ray.put((np.asarray(lo, dtype=np.float64),
                   np.asarray(hi, dtype=np.float64),
                   np.asarray(ids, dtype=np.int64)))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        blo, bhi, bid = ray.get(ref)
        v = df[value_col].to_numpy(dtype=np.float64)
        m = (v[:, None] >= blo[None, :]) & (v[:, None] < bhi[None, :])
        ri, bi = np.nonzero(m)
        out = df.iloc[ri].reset_index(drop=True)
        out["band"] = bid[bi]
        return out

    return ds.map_batches(probe, batch_format="pandas")


def rolling_window(events: "ray.data.Dataset", *, key: str, ts: str,
                   order_tiebreak: str, value_col: str, window: int,
                   out_sum: str = "roll_sum", out_n: str = "roll_n",
                   coarse: int = TEMPORAL_COARSE_GROUPS,
                   pre_blocks: Optional[int] = None):
    """Per-key trailing-window aggregate: for each row (ordered by
    ``ts``, then ``order_tiebreak``) the sum and count of ``value_col``
    over the last ``window`` rows of the same key including the current
    one — SQL ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``.

    ``value_col`` must already be integral (convert floats to 1e-4 units
    first) so window sums are exact. One coarse shuffle, then a single
    ``groupby(key).rolling`` pandas kernel per partition.
    """
    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = _knuth_pkey(df[key].to_numpy(), coarse)
        return df

    keep = [c for c in [key, ts, order_tiebreak, value_col] if c]

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak], kind="mergesort")
        r = g.groupby(key, sort=False)[value_col] \
            .rolling(window, min_periods=1)
        # rolling returns float64; values are ints < 2^53 so the cast
        # back is exact
        g = g.assign(**{
            out_sum: r.sum().reset_index(level=0, drop=True)
            .astype("int64"),
            out_n: r.count().reset_index(level=0, drop=True)
            .astype("int64"),
        })
        return g[keep + [out_sum, out_n]]

    tagged = events.select_columns(keep).map_batches(
        add_pkey, batch_format="pandas")
    if pre_blocks:
        tagged = tagged.repartition(pre_blocks)
    return tagged.groupby("_pkey").map_groups(roll, batch_format="pandas")


def keep_latest(events: "ray.data.Dataset", *, key: str, ts: str,
                order_tiebreak: str, carry: List[str],
                coarse: int = TEMPORAL_COARSE_GROUPS,
                pre_blocks: Optional[int] = None) -> "ray.data.Dataset":
    """Per-key argmax snapshot: the single newest row for each key
    (latest ``ts``, ties broken by highest ``order_tiebreak``) — the
    keep-latest-crawl-per-url dedup a Common-Crawl corpus needs across
    snapshots (SQL: row_number() OVER (PARTITION BY key ORDER BY ts
    DESC, tiebreak DESC) = 1).

    Scale shape: a per-BATCH partial keep-latest first (each batch
    contributes at most one row per key it saw), so the coarse-key
    shuffle carries <= keys x batches rows, never the event stream; the
    final per-partition reduce is one vectorized sort +
    drop_duplicates. A key's rows never need co-location before the
    partial because argmax is associative."""
    cols = [key, ts, order_tiebreak] + [
        c for c in carry if c not in (key, ts, order_tiebreak)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts, order_tiebreak], kind="mergesort")
        out = df.drop_duplicates(subset=[key], keep="last").copy()
        out["_pkey"] = _knuth_pkey(out[key].to_numpy(), coarse)
        return out

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak], kind="mergesort")
        return g.drop_duplicates(subset=[key], keep="last")[cols]

    tagged = events.select_columns(cols).map_batches(
        partial, batch_format="pandas")
    if pre_blocks:
        tagged = tagged.repartition(pre_blocks)
    return tagged.groupby("_pkey").map_groups(reduce_partition,
                                              batch_format="pandas")


def funnel_counts(events: "ray.data.Dataset", *, key: str, ts: str,
                  type_col: str, stages: List[str],
                  coarse: int = TEMPORAL_COARSE_GROUPS,
                  pre_blocks: Optional[int] = None):
    """Ordered-funnel analysis: how many keys (users) completed each
    stage prefix IN ORDER — stage i counts a user iff some stage-i
    event happens at a STRICTLY later ts than their earliest qualifying
    stage-(i-1) event. The classic product-analytics query; also the
    ordered-event-pattern shape (sequences of states per entity) a
    behavioural training-data filter needs.

    One coarse key shuffle co-locates each user's events; per
    partition the funnel is computed with vectorized
    groupby-min/map/filter passes (one per stage, no per-user Python);
    each partition emits ``len(stages)`` partial counts and the final
    sum is over partitions x stages rows. Returns a pandas frame
    (stage, n_users) in funnel order."""
    import pandas as pd

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = _knuth_pkey(df[key].to_numpy(), coarse)
        return df

    def funnel_partition(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        reached = None          # Series: user -> ts of reaching prev stage
        for st in stages:
            rows = g[g[type_col] == st]
            if reached is not None:
                prev = rows[key].map(reached)
                # NaT/NaN comparison is False -> users who never reached
                # the previous stage drop out here
                rows = rows[rows[ts].to_numpy() > prev.to_numpy()]
            reached = rows.groupby(key)[ts].min()
            counts.append(len(reached))
        return pd.DataFrame({"stage": stages, "n_users": counts})

    tagged = events.select_columns([key, ts, type_col]).map_batches(
        add_pkey, batch_format="pandas")
    if pre_blocks:
        tagged = tagged.repartition(pre_blocks)
    parts = tagged.groupby("_pkey").map_groups(
        lambda g: funnel_partition(g), batch_format="pandas").to_pandas()
    tot = parts.groupby("stage", sort=False)["n_users"].sum()
    return pd.DataFrame({
        "stage": stages,
        "n_users": [int(tot.get(s, 0)) for s in stages]})


def hopping_window_agg(events: "ray.data.Dataset", *, ts: str = "ts",
                       value: str = "value", size_s: int = 1800,
                       hop_s: int = 900) -> "ray.data.Dataset":
    """Overlapping (hopping) time-window aggregate: count + value sum per
    window of ``size_s`` seconds advancing every ``hop_s`` — the
    overlapping complement of the tumbling ``events_hourly`` bucket.

    An event at epoch t belongs to exactly size_s/hop_s windows (starts
    floor(t/hop)*hop - i*hop for i in 0..size/hop-1), so each batch
    REPLICATES rows size/hop times and immediately pre-aggregates per
    window key; only (win_start, n, sum) partials — bounded by windows
    present in the batch, not events — cross the one groupby shuffle.
    ``size_s`` must be a multiple of ``hop_s``."""
    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    fanout = size_s // hop_s

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "win_start": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "val_sum": pd.Series([], dtype="float64")})
        epoch = df[ts].astype("datetime64[ns]").astype("int64") \
            // 1_000_000_000
        base = (epoch // hop_s) * hop_s
        wins = np.concatenate([base - i * hop_s for i in range(fanout)])
        vals = np.tile(df[value].to_numpy(dtype=np.float64), fanout)
        g = pd.DataFrame({"win_start": wins, "v": vals}).groupby(
            "win_start", sort=True)
        out = g.size().rename("n").reset_index()
        out["val_sum"] = g["v"].sum().to_numpy()
        out["win_start"] = out["win_start"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    from ray.data.aggregate import Sum

    agg = events.select_columns([ts, value]).map_batches(
        partial, batch_format="pandas").groupby("win_start").aggregate(
        Sum("n", alias_name="n_events"),
        Sum("val_sum", alias_name="sum_value"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_events"] = df["n_events"].astype("int64")
        df["sum_value"] = df["sum_value"].round(4)
        return df[["win_start", "n_events", "sum_value"]]

    return agg.map_batches(finish, batch_format="pandas")


def ewma_by_key(events: "ray.data.Dataset", *, key: str, ts: str,
                order_tiebreak: str, value_col: str, decay: float,
                out: str = "ewma", round_dp: int = 6,
                coarse: int = TEMPORAL_COARSE_GROUPS):
    """Final exponentially-decayed value per key:
    ``ewma = sum(value_i * decay^(steps_after_i))`` over the key's
    events in (ts, tiebreak) order — recency-weighted activity, the
    time-decay feature engines compute for ranking/abuse/engagement.

    Exactly the SQL window
    ``sum(value * pow(decay, row_number() OVER (... ORDER BY ts DESC)
    - 1))``. One coarse hash shuffle on the key; per partition the
    whole computation is one vectorized sort + cumcount + power + keyed
    sum (decay^k underflows to 0.0 gracefully for long histories)."""
    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = _knuth_pkey(df[key].to_numpy(), coarse)
        return df

    keep = [key, ts, order_tiebreak, value_col]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, order_tiebreak],
                          ascending=[True, False, False],
                          kind="mergesort")
        rn = g.groupby(key, sort=False).cumcount().to_numpy()
        term = g[value_col].to_numpy(dtype=np.float64) \
            * np.power(decay, rn)
        res = pd.DataFrame({key: g[key].to_numpy(), "_t": term}) \
            .groupby(key, sort=True, as_index=False)["_t"].sum()
        return pd.DataFrame({key: res[key].astype("int64"),
                             out: res["_t"].round(round_dp)})

    return events.select_columns(keep) \
        .map_batches(add_pkey, batch_format="pandas") \
        .groupby("_pkey").map_groups(fold, batch_format="pandas")
