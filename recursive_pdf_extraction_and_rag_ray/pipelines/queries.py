"""Driver-facing query registry: every operator/pipeline from SURVEY.md
section 2 (plus the training-data operator family) as a callable over an
``sf_dir`` of driver parquet tables, with the matching DuckDB oracle SQL
where the operator is SQL-expressible.

Parity rules (the driver hash-compares values after sorting columns by
name and rows by value):
- every computed column is named identically here and in the SQL;
- float aggregates are rounded identically on both sides;
- cosine similarities computed in float64 on both sides (SQL casts the
  float32 list to DOUBLE[] — verified to match numpy to < 1e-16);
- sorts carry an explicit integer tiebreak on both sides.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.textproc import chunk_records, sha256_text
from ..stages import neardup, similarity, textstats
from ..stages.extract import ExtractPages
from ..sources.pages_gen import pages_from_documents_batch


def _t(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# --- relational capability analogs (SURVEY.md 2.5-2.7) -----------------------

def q_agg_rollup(sf_dir):
    """Partial+final grouped aggregation (billing-totals analog, SURVEY G1;
    TPC-H Q1 shape). Filter applied at scan time, revenue vectorized."""
    ds = _t(sf_dir, "lineitem", columns=[
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.less_equal(
            t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        # exact integer 1e-4-currency units: float sums are association-order
        # dependent across partial aggregates, so money is summed as int64
        rev = pc.cast(pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0))), pa.int64())
        qty = pc.cast(t["l_quantity"], pa.int64())
        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_pandas(),
                           "l_linestatus": t["l_linestatus"].to_pandas(),
                           "qty_int": qty.to_pandas(),
                           "revenue_e4": rev.to_pandas()})
        # batch-local combine: <= |flags|x|statuses| rows leave each task,
        # so the (slow multi-key) shuffle sorts hundreds of partial rows,
        # not the table; int64 sums keep the final result order-exact
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False,
                       as_index=False)
        out = g.agg(sum_qty=("qty_int", "sum"),
                    sum_revenue_e4=("revenue_e4", "sum"),
                    n_rows=("qty_int", "size"))
        return out.astype({"sum_qty": "int64", "sum_revenue_e4": "int64",
                           "n_rows": "int64"})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("sum_revenue_e4", alias_name="sum_revenue_e4"),
                   Sum("n_rows", alias_name="n_rows"))
    return out


SQL_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS sum_revenue_e4,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_project(sf_dir):
    """Metadata-filter lookup (SURVEY J3: Chroma where-filter analog) with
    column pruning at the read."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "source", "lang", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["lang"], "en"),
                                   pc.greater_equal(t["n_chars"], 200))),
        batch_format="pyarrow").select_columns(["doc_id", "source", "n_chars"])


SQL_FILTER_PROJECT = """
SELECT doc_id, source, n_chars FROM documents
WHERE lang = 'en' AND n_chars >= 200
"""


def q_topk_orders(sf_dir):
    """Global top-k (SURVEY J4: merge-sort by distance analog):
    sort + limit with explicit tiebreak."""
    ds = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(10)


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_topk_per_group(sf_dir):
    """Per-group top-k (SURVEY J4 per-collection knn analog), scale-safe
    shape: per-BATCH partial top-2 per key (so a 5-value key never
    becomes 5 corpus-sized single-task groups), then a tiny driver-side
    final merge over <= 2 x keys x batches rows."""
    ds = _t(sf_dir, "orders", columns=["o_orderpriority", "o_orderkey",
                                       "o_totalprice"])

    def partial_top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]) \
            .groupby("o_orderpriority", sort=False).head(2)

    parts = ds.map_batches(partial_top2, batch_format="pandas")
    final = pd.concat(
        list(parts.iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    return final.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]) \
        .groupby("o_orderpriority", sort=False).head(2) \
        .reset_index(drop=True)[["o_orderpriority", "o_orderkey",
                                 "o_totalprice"]]


SQL_TOPK_PER_GROUP = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) <= 2
"""


def q_broadcast_join_agg(sf_dir):
    """Small-side broadcast join (SURVEY J6; ray.put-once idiom) + grouped
    aggregate: orders joined to customer segment without a shuffle join."""
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    seg_ref = ray.put(dict(zip(cust.column("c_custkey").to_pylist(),
                               cust.column("c_mktsegment").to_pylist())))

    class AttachSegment:
        def __init__(self, ref):
            self.seg = ray.get(ref)  # read once per actor, zero re-ship

        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized probe: Series.map runs the dict lookups in one
            # pandas pass (a per-row Python loop here IS the stage at 1e9
            # rows — the broadcast is init-once, the probe must be too)
            segs = pd.Series(t["o_custkey"].to_numpy(zero_copy_only=False)) \
                .map(self.seg).fillna("").to_numpy()
            cents = pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64())
            return t.append_column("c_mktsegment", pa.array(segs, pa.string())) \
                    .append_column("total_cents", cents)

    ds = _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    return ds.map_batches(AttachSegment, batch_format="pyarrow",
                          fn_constructor_kwargs={"ref": seg_ref},
                          concurrency=(1, 4)) \
        .groupby("c_mktsegment") \
        .aggregate(Count(alias_name="n_orders"),
                   Sum("total_cents", alias_name="sum_total_cents"))


SQL_BROADCAST_JOIN_AGG = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_hash_join_agg(sf_dir):
    """Distributed hash join (lineitem x orders on orderkey) + grouped
    aggregate — the shuffle-join path for when neither side broadcasts
    (complements q_broadcast_join_agg)."""
    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice",
                                         "l_discount"])

    def to_cents(t: pa.Table) -> pa.Table:
        rev = pc.cast(pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(10000.0))), pa.int64())
        return t.append_column("revenue_e4", rev).drop_columns(
            ["l_extendedprice", "l_discount"])

    li = li.map_batches(to_cents, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    return joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_items"),
        Sum("revenue_e4", alias_name="sum_revenue_e4"))


SQL_HASH_JOIN_AGG = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS sum_revenue_e4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


SESSION_GAP_MIN = 30


SESSIONIZE_COARSE_GROUPS = 256


def q_events_sessionize(sf_dir):
    """Windowed/streaming analog: per-user sessionization (gap > 30 min
    starts a new session) — an operator family the reference lacks
    entirely (SURVEY.md 2.10). Users are shuffled by a COARSE key
    (hash(user) mod 256) and iterated inside the task with one vectorized
    sort + groupby over the whole coarse group: Ray's map_groups pays
    ~0.3 ms of machinery per group, so grouping millions of users
    directly would burn it per user; 256 groups pays it 256 times."""
    ds = _t(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = (df["user_id"].to_numpy().astype("int64")
                       * 2654435761 % (1 << 32)) % SESSIONIZE_COARSE_GROUPS
        return df

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        sid = (new_user | gap).groupby(g["user_id"]).cumsum().astype("int64")
        out = g.assign(session_id=sid).groupby(
            ["user_id", "session_id"], sort=False).agg(
            n_events=("event_id", "size"),
            session_start_s=("ts", "min"),
            session_end_s=("ts", "max")).reset_index()
        # integer epoch seconds: pandas ns vs duckdb us timestamps can
        # stringify/hash differently in the driver's value compare
        for c in ("session_start_s", "session_end_s"):
            out[c] = out[c].astype("datetime64[ns]").astype("int64") \
                // 1_000_000_000
        return out[["user_id", "session_id", "n_events",
                    "session_start_s", "session_end_s"]]

    return ds.map_batches(add_pkey, batch_format="pandas") \
        .groupby("_pkey").map_groups(sessions, batch_format="pandas")


SQL_EVENTS_SESSIONIZE = f"""
SELECT user_id, session_id, count(*) AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end_s
FROM (
  SELECT user_id, ts,
         -- windowed sum comes back HUGEINT -> pandas float64; the engine
         -- emits int64, and the driver's value hash distinguishes 1.0 vs 1
         CAST(1 + sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_id
  FROM (
    SELECT user_id, event_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     > INTERVAL '{SESSION_GAP_MIN} minutes'
                THEN 1 ELSE 0 END AS new_sess
    FROM events)
)
GROUP BY user_id, session_id
"""


def q_distinct_event_types(sf_dir):
    """Set op: distinct values (SURVEY 2.8). Scale-safe shape: per-batch
    vectorized ``unique`` partials (each task ships only its distinct
    values), then a tiny driver merge over <= |distinct| x n_batches rows
    — the driver never sees more than the distinct set per batch. Bounded
    by the column's cardinality, not the row count (an enum here; for a
    high-cardinality column route the partials through a hash-partitioned
    groupby instead of the driver merge)."""
    parts = _t(sf_dir, "events", columns=["event_type"]).map_batches(
        lambda t: pa.table({"event_type": pc.unique(t["event_type"])}),
        batch_format="pyarrow")
    vals = set()
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=65536):
        vals.update(b.column("event_type").to_pylist())
    return pa.table({"event_type": pa.array(sorted(vals), pa.string())})


SQL_DISTINCT_EVENT_TYPES = "SELECT DISTINCT event_type FROM events"


# --- temporal / interval / sketch family (stages/temporal.py, sketch.py) -----

def q_asof_join(sf_dir):
    """Keyed as-of join: each event picks the customer's most recent
    order at event time (stages/temporal.py — one coarse shuffle, one
    vectorized merge_asof per partition). Right-side (custkey, date)
    ties are pre-reduced to max-orderkey so engine and oracle pick the
    same row."""
    from ..stages import temporal

    events = _t(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _t(sf_dir, "orders", columns=[
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(lambda df: df.rename(columns={"o_custkey": "user_id"}),
                     batch_format="pandas")
    joined = temporal.asof_join(
        events, orders, key="user_id", left_ts="ts",
        right_ts="o_orderdate", left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
        int_cols=["event_id", "o_orderkey"],
        pre_blocks=temporal.TEMPORAL_PRE_BLOCKS_DOC)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts_s": df["_ts"].astype("datetime64[ns]").astype("int64")
            // 1_000_000_000,
            "asof_orderkey": df["o_orderkey"].astype("int64"),
            "asof_totalprice": df["o_totalprice"].astype("float64"),
        })

    return joined.map_batches(finish, batch_format="pandas")


SQL_ASOF_JOIN = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS asof_orderkey,
         arg_max(o_totalprice, o_orderkey) AS asof_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
       r.asof_orderkey, r.asof_totalprice
FROM events e ASOF JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


# overlapping price bands: band b covers [b*25k, b*25k + 50k) — every
# order >= 25k matches exactly two bands, which is what distinguishes a
# range join from a bucketing projection
PRICE_BAND_STEP = 25000.0
PRICE_BAND_WIDTH = 50000.0
PRICE_BANDS = 21


def q_range_join_bands(sf_dir):
    """Broadcast interval join + grouped rollup: orders against
    overlapping price bands (stages/temporal.py:range_join_broadcast —
    interval table shipped once via ray.put, probed vectorized per
    batch), then per-band count and exact integer-1e-4 revenue."""
    from ..stages import temporal

    lo = np.arange(PRICE_BANDS, dtype=np.float64) * PRICE_BAND_STEP
    ds = _t(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    joined = temporal.range_join_broadcast(
        ds, value_col="o_totalprice", lo=lo, hi=lo + PRICE_BAND_WIDTH)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(price_e4=np.round(
            df["o_totalprice"].to_numpy() * 10000.0).astype("int64"))
        g = df.groupby("band", as_index=False).agg(
            n_orders=("o_orderkey", "size"), sum_price_e4=("price_e4", "sum"))
        return g.astype({"band": "int64", "n_orders": "int64",
                         "sum_price_e4": "int64"})

    return joined.map_batches(partial, batch_format="pandas") \
        .groupby("band").aggregate(Sum("n_orders", alias_name="n_orders"),
                                   Sum("sum_price_e4",
                                       alias_name="sum_price_e4"))


SQL_RANGE_JOIN_BANDS = f"""
SELECT b.band, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 10000) AS BIGINT)) AS BIGINT)
         AS sum_price_e4
FROM orders o
JOIN (SELECT unnest(generate_series(0, {PRICE_BANDS - 1})) AS band) b
  ON o.o_totalprice >= b.band * {PRICE_BAND_STEP}
 AND o.o_totalprice <  b.band * {PRICE_BAND_STEP} + {PRICE_BAND_WIDTH}
GROUP BY b.band
"""


ROLL_WINDOW = 4  # current row + 3 preceding


def q_rolling_user_value(sf_dir):
    """Per-user trailing-window aggregate (SQL ROWS BETWEEN 3 PRECEDING
    AND CURRENT ROW): rolling event-value sum and row count, value
    carried as exact integer 1e-4 units (stages/temporal.py:
    rolling_window — coarse shuffle + one pandas rolling kernel per
    partition)."""
    from ..stages import temporal

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_e4(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_e4"] = np.round(
            df["value"].to_numpy() * 10000.0).astype("int64")
        return df.drop(columns=["value"])

    roll = temporal.rolling_window(
        ds.map_batches(to_e4, batch_format="pandas"),
        key="user_id", ts="ts", order_tiebreak="event_id",
        value_col="value_e4", window=ROLL_WINDOW,
        out_sum="roll_sum_e4", out_n="roll_n",
        pre_blocks=temporal.TEMPORAL_PRE_BLOCKS_DOC)
    return roll.select_columns(["event_id", "user_id", "roll_sum_e4",
                                "roll_n"])


SQL_ROLLING_USER_VALUE = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) OVER w AS BIGINT)
         AS roll_sum_e4,
       CAST(count(*) OVER w AS BIGINT) AS roll_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
"""


def q_top_tokens(sf_dir):
    """Exact corpus heavy hitters: top-20 most frequent lowercased
    whitespace tokens, ties broken by token (stages/sketch.py —
    per-batch value_counts partials, vocabulary-bounded combine)."""
    from ..stages import sketch

    return sketch.heavy_hitters_tokens(
        _t(sf_dir, "documents", columns=["text"]), k=20)


SQL_TOP_TOKENS = r"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


QUANTILE_PS = [0.25, 0.5, 0.75, 0.9, 0.99]


def q_nchars_quantiles(sf_dir):
    """Exact distributed quantiles of doc length via a value histogram
    (stages/sketch.py:exact_quantiles — quantile_disc semantics: value
    at 1-based sorted rank ceil(p*n))."""
    from ..stages import sketch

    return sketch.exact_quantiles(
        _t(sf_dir, "documents", columns=["n_chars"]), "n_chars",
        QUANTILE_PS)


SQL_NCHARS_QUANTILES = f"""
WITH q AS (SELECT quantile_disc(n_chars, {QUANTILE_PS}) AS v
           FROM documents)
SELECT CAST(unnest({QUANTILE_PS}) AS DOUBLE) AS p, unnest(v) AS n_chars
FROM q
"""


def q_events_window(sf_dir):
    """Per-user ordered window functions over the event stream
    (stages/window.py): previous event value (LAG), 1-based sequence
    number (ROW_NUMBER), inclusive running value total (SUM OVER) —
    value carried as exact integer 1e-4 units."""
    from ..stages import temporal, window

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_e4(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_e4"] = np.round(
            df["value"].to_numpy() * 10000.0).astype("int64")
        return df.drop(columns=["value"])

    return window.window_lag_rank_cumsum(
        ds.map_batches(to_e4, batch_format="pandas"),
        key="user_id", ts="ts", order_tiebreak="event_id",
        value_col="value_e4", out_lag="prev_value_e4", out_rn="rn",
        out_cumsum="running_sum_e4",
        pre_blocks=temporal.TEMPORAL_PRE_BLOCKS_DOC)


SQL_EVENTS_WINDOW = """
SELECT user_id, event_id,
       CAST(lag(CAST(round(value * 10000) AS BIGINT)) OVER w
            AS DOUBLE) AS prev_value_e4,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_sum_e4
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_value_quantiles_by_type(sf_dir):
    """Per-event-type exact discrete quantiles of the value column in
    1e-4 units (stages/sketch.py:exact_quantiles_grouped — keyed value
    histogram, combine bounded by per-group cardinality)."""
    from ..stages import sketch

    ds = _t(sf_dir, "events", columns=["event_type", "value"])

    def to_e4(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "value_e4": np.round(
                df["value"].to_numpy() * 10000.0).astype("int64"),
        })

    return sketch.exact_quantiles_grouped(
        ds.map_batches(to_e4, batch_format="pandas"),
        group_col="event_type", col="value_e4", ps=QUANTILE_PS)


SQL_VALUE_QUANTILES_BY_TYPE = f"""
WITH q AS (
  SELECT event_type,
         quantile_disc(CAST(round(value * 10000) AS BIGINT),
                       {QUANTILE_PS}) AS v
  FROM events GROUP BY event_type)
SELECT event_type, CAST(unnest({QUANTILE_PS}) AS DOUBLE) AS p,
       unnest(v) AS value_e4
FROM q
"""


def q_anti_join_customers(sf_dir):
    """Customers with no event activity, counted per nation
    (stages/joins.py:anti_join — right side shrunk to per-batch
    distinct keys, one hash(key) shuffle, vectorized isin probe per
    partition; SQL NOT EXISTS)."""
    from ..stages import joins, temporal

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    events = _t(sf_dir, "events", columns=["user_id"]) \
        .map_batches(lambda df: df.rename(columns={"user_id": "c_custkey"}),
                     batch_format="pandas")
    no_orders = joins.anti_join(
        cust, events, on="c_custkey",
        pre_blocks=temporal.TEMPORAL_PRE_BLOCKS_DOC)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_nationkey", as_index=False).agg(
            n_customers=("c_custkey", "size"))
        return g.astype({"c_nationkey": "int64", "n_customers": "int64"})

    return no_orders.map_batches(partial, batch_format="pandas") \
        .groupby("c_nationkey") \
        .aggregate(Sum("n_customers", alias_name="n_customers"))


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
GROUP BY 1
"""


SAMPLE_RATES = {"click": 0.05, "view": 0.02, "purchase": 1.0,
                "signup": 0.5, "error": 0.25}


def q_stratified_sample(sf_dir):
    """Deterministic per-event-type subsample (stages/sampling.py):
    keep iff (event_id * 2654435761) % 2^32 % 10000 < rate_e4 — the
    hash rule is engine-independent, so the exact sampled row set is
    SQL-checkable (unlike seeded-RNG sampling)."""
    from ..stages import sampling

    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    return sampling.sample_stratified(
        ds, key_col="event_id", group_col="event_type",
        rates=SAMPLE_RATES)


SQL_STRATIFIED_SAMPLE = f"""
WITH r(event_type, rate_e4) AS (VALUES
  ('click', 500), ('view', 200), ('purchase', 10000),
  ('signup', 5000), ('error', 2500))
SELECT e.event_id, e.user_id, e.event_type
FROM events e JOIN r USING (event_type)
WHERE (e.event_id * 2654435761) % 4294967296 % 10000 < r.rate_e4
"""


def q_status_counts(sf_dir):
    """Status-counter rollup (SURVEY G2: progress ledger counters)."""
    return _t(sf_dir, "orders", columns=["o_orderstatus"]) \
        .groupby("o_orderstatus").aggregate(Count(alias_name="n_orders"))


SQL_STATUS_COUNTS = """
SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY o_orderstatus
"""


def q_events_by_user(sf_dir):
    ds = _t(sf_dir, "events", columns=["user_id", "value"])
    df = ds.groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Max("value", alias_name="max_value")).to_pandas()
    df["sum_value"] = df["sum_value"].round(4)
    df["max_value"] = df["max_value"].round(6)
    return df


SQL_EVENTS_BY_USER = """
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY user_id
"""


def q_events_hourly(sf_dir):
    """Time-bucketed rollup (the windowed-aggregate shape over the event
    stream; vectorized timestamp kernel)."""
    ds = _t(sf_dir, "events", columns=["ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hour": df["ts"].dt.hour.astype("int64"),
                             "value": df["value"]})

    out = ds.map_batches(bucket, batch_format="pandas") \
        .groupby("hour").aggregate(Count(alias_name="n_events"),
                                   Sum("value", alias_name="sum_value"))
    df = out.to_pandas()
    df["sum_value"] = df["sum_value"].round(4)
    return df


SQL_EVENTS_HOURLY = """
SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour, count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1
"""


# --- training-data operator family ------------------------------------------

def q_dedup_exact(sf_dir):
    """Exact dedup keep-first (SURVEY J1/2.8: seen-files index analog):
    hash-partition on the fingerprint, min doc_id wins."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    fp = ds.map_batches(textstats.fingerprint_batch, batch_format="pandas")
    return fp.groupby("fp").aggregate(Min("doc_id", alias_name="doc_id"),
                                      Count(alias_name="n_copies"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_fingerprint(sf_dir):
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textstats.fingerprint_batch, batch_format="pandas")


SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS fp FROM documents"


def q_token_count(sf_dir):
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textstats.token_count_batch, batch_format="pandas")


# token split == Python str.split(): split on runs of whitespace, ignore
# leading/trailing. list_filter drops the empty strings regexp_split emits at
# boundaries (trim() strips only spaces, so '\nhello\n' would otherwise
# over-count by 2 — RE2 \s and Python both cover ASCII whitespace here).
SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\s+'),
                       x -> x <> '')) AS n_tokens,
       length(text) AS n_chars,
       greatest(1, length(text) // 4) AS n_tokens_approx
FROM documents
"""


def q_lang_id(sf_dir):
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textstats.lang_id_batch, batch_format="pandas")


SQL_LANG_ID = """
SELECT doc_id, en_hits, en_hits >= 3 AS is_en FROM (
  SELECT doc_id,
         (length(p) - length(replace(p, ' the ', ''))) // 5
       + (length(p) - length(replace(p, ' and ', ''))) // 5
       + (length(p) - length(replace(p, ' of ', ''))) // 4
       + (length(p) - length(replace(p, ' to ', ''))) // 4
       + (length(p) - length(replace(p, ' in ', ''))) // 4 AS en_hits
  FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)
)
"""


def q_quality(sf_dir):
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textstats.quality_score_batch, batch_format="pandas")


SQL_QUALITY = """
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(regexp_split_to_array(text, '\\s+'),
                       x -> x <> '')) AS n_words,
       length(text) - length(replace(text, '.', '')) AS n_periods,
       CAST(floor((length(text) - length(replace(text, ' ', '')))
                  * 1000000.0 / greatest(length(text), 1) + 0.5)
            AS BIGINT) AS space_ppm
FROM documents
"""


def q_doc_type(sf_dir):
    """First-match-wins doc-type classification (SURVEY M11; reference
    metadata_extractor.py:78-87,203-209)."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textstats.doc_type_batch, batch_format="pandas")


# CASE order == the engine's ordered pattern table (first match wins)
SQL_DOC_TYPE = r"""
SELECT doc_id, CASE
  WHEN regexp_matches(lower(text), '\b(lecture|notes?)\b') THEN 'lecture'
  WHEN regexp_matches(lower(text), '\b(assignment|homework|hw)\b') THEN 'assignment'
  WHEN regexp_matches(lower(text), '\b(exam|test|quiz|midterm|final)\b') THEN 'exam'
  WHEN regexp_matches(lower(text), '\b(textbook|book|manual)\b') THEN 'textbook'
  WHEN regexp_matches(lower(text), '\b(syllabus|outline)\b') THEN 'syllabus'
  WHEN regexp_matches(lower(text), '\b(lab|laboratory|practical)\b') THEN 'lab'
  WHEN regexp_matches(lower(text), '\b(project|report)\b') THEN 'project'
  WHEN regexp_matches(lower(text), '\bpq\b') THEN 'exam'
  ELSE '' END AS doc_type
FROM documents
"""


def q_completeness(sf_dir):
    """Weighted presence completeness score 0-100 (SURVEY M13; reference
    metadata_extractor.py:251-268)."""
    ds = _t(sf_dir, "documents",
            columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(textstats.completeness_batch, batch_format="pandas")


SQL_COMPLETENESS = r"""
SELECT doc_id, CAST(floor((
      (CASE WHEN length(text) > 0 THEN 1 ELSE 0 END)
    + (CASE WHEN coalesce(lang, '') <> '' THEN 1 ELSE 0 END)
    + (CASE WHEN coalesce(source, '') <> '' THEN 1 ELSE 0 END)
    + (CASE WHEN dt <> '' THEN 1 ELSE 0 END)
    + (CASE WHEN n_words >= 100 THEN 1 ELSE 0 END)
    + (CASE WHEN en_hits >= 3 THEN 1 ELSE 0 END)
  ) * 100.0 / 6 + 0.5) AS BIGINT) AS completeness_pct
FROM (
  SELECT doc_id, text, lang, source,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n_words,
         (length(p) - length(replace(p, ' the ', ''))) // 5
       + (length(p) - length(replace(p, ' and ', ''))) // 5
       + (length(p) - length(replace(p, ' of ', ''))) // 4
       + (length(p) - length(replace(p, ' to ', ''))) // 4
       + (length(p) - length(replace(p, ' in ', ''))) // 4 AS en_hits,
         CASE
           WHEN regexp_matches(lower(text), '\b(lecture|notes?)\b') THEN 'lecture'
           WHEN regexp_matches(lower(text), '\b(assignment|homework|hw)\b') THEN 'assignment'
           WHEN regexp_matches(lower(text), '\b(exam|test|quiz|midterm|final)\b') THEN 'exam'
           WHEN regexp_matches(lower(text), '\b(textbook|book|manual)\b') THEN 'textbook'
           WHEN regexp_matches(lower(text), '\b(syllabus|outline)\b') THEN 'syllabus'
           WHEN regexp_matches(lower(text), '\b(lab|laboratory|practical)\b') THEN 'lab'
           WHEN regexp_matches(lower(text), '\b(project|report)\b') THEN 'project'
           WHEN regexp_matches(lower(text), '\bpq\b') THEN 'exam'
           ELSE '' END AS dt
  FROM (SELECT doc_id, text, lang, source,
               ' ' || text || ' ' AS p FROM documents)
)
"""


FILTERED_KNN_LABEL = 3


def q_filtered_knn(sf_dir):
    """Composed metadata-filter + vector top-k with explicit tiebreak —
    the reference's filtered retrieval (question_rag.py:130-194: Chroma
    ``where={...}`` metadata filter, then accumulate-to-limit) as ONE
    pipeline: filter pushes down BEFORE any similarity work, so the knn
    only scores the surviving rows."""
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    qvec = np.asarray(q.column("embedding").to_pylist()[0], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", columns=["label", "vec_id", "embedding"])
    filtered = ds.map_batches(
        lambda t: t.filter(pc.and_(
            pc.equal(t["label"], FILTERED_KNN_LABEL),
            pc.not_equal(t["vec_id"], 0))),
        batch_format="pyarrow").select_columns(["vec_id", "embedding"])
    out = similarity.knn_bruteforce(filtered, qvec, k=5)
    return out.to_pandas()[["vec_id", "cos_sim"]]


SQL_FILTERED_KNN = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cos_sim
FROM embeddings e, q
WHERE e.label = {FILTERED_KNN_LABEL} AND e.vec_id <> 0
ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) DESC,
         e.vec_id
LIMIT 5
"""


def q_knn_bruteforce(sf_dir):
    """Exact cosine top-10 for the vec_id=0 query vector (SURVEY J4)."""
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    qvec = np.asarray(q.column("embedding").to_pylist()[0], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = similarity.knn_bruteforce(ds, qvec, k=10, exclude_ids=[0])
    return out.to_pandas()[["vec_id", "cos_sim"]]


SQL_KNN_BRUTEFORCE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) DESC,
         e.vec_id
LIMIT 10
"""


def q_percent_rank(sf_dir):
    """Per-user percent_rank of purchase values — the rank-normalization
    window (ties share the min rank; (rank-1)/(n-1), 0 for singleton
    partitions). Type filter pushed into the parquet read; one coarse
    user-hash shuffle, vectorized grouped rank per partition."""
    import pyarrow.dataset as pads

    from ..stages.temporal import TEMPORAL_COARSE_GROUPS, _knuth_pkey

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "value", "event_type"],
        filter=(pads.field("event_type") == "purchase"))

    def add_pkey(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "user_id", "value"]].copy()
        out["_pkey"] = _knuth_pkey(out["user_id"].to_numpy(),
                                   TEMPORAL_COARSE_GROUPS)
        return out

    def prank(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id", sort=False)["value"]
        r = grp.rank(method="min").to_numpy()
        n = grp.transform("size").to_numpy()
        pr = np.where(n > 1, (r - 1) / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "pr": np.round(pr, 6)})

    return ds.map_batches(add_pkey, batch_format="pandas") \
        .groupby("_pkey").map_groups(prank, batch_format="pandas")


SQL_PERCENT_RANK = """
SELECT event_id, user_id,
       round(percent_rank() OVER (PARTITION BY user_id ORDER BY value),
             6) AS pr
FROM events WHERE event_type = 'purchase'
"""


KNN_MULTI_NQ = 5


def q_knn_multi(sf_dir):
    """Batched multi-query exact KNN: 5 query vectors share ONE corpus
    scan (a single (batch x dim) @ (dim x 5) matmul per batch against
    the broadcast query matrix), per-qid top-5 merge
    (stages/similarity.py:knn_bruteforce multi-query path — the
    retrieval-serving shape where queries arrive in batches)."""
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", KNN_MULTI_NQ)])
    rows = sorted(q.to_pylist(), key=lambda r: r["vec_id"])
    qmat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = similarity.knn_bruteforce(
        ds, qmat, k=5, exclude_ids=list(range(KNN_MULTI_NQ)))
    df = out.to_pandas()[["qid", "vec_id", "cos_sim"]]
    df["qid"] = df["qid"].astype("int64")
    return df.sort_values(["qid", "cos_sim", "vec_id"],
                          ascending=[True, False, True]) \
        .reset_index(drop=True)


SQL_KNN_MULTI = f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < {KNN_MULTI_NQ}),
scored AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6)
           AS cos_sim
  FROM embeddings e, q
  WHERE e.vec_id >= {KNN_MULTI_NQ}),
ranked AS (
  SELECT qid, vec_id, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored)
SELECT qid, vec_id, cos_sim FROM ranked WHERE rn <= 5
"""


def q_cosine_neardup(sf_dir):
    """Embedding-cosine near-dup pairs within a label block."""
    ds = _t(sf_dir, "embeddings", columns=["label", "vec_id", "embedding"])
    return similarity.cosine_neardup_pairs(ds, threshold=0.3)


SQL_COSINE_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= 0.3
"""


# --- near-dup / ANN family (oracle-checked where SQL-expressible) ------------

def q_minhash_pairs(sf_dir):
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup.minhash_lsh_pairs(ds, threshold=0.5)


def q_simhash_pairs(sf_dir):
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup.simhash_pairs(ds, max_hamming=3)


# Self-contained DuckDB reproduction of the WHOLE simhash pipeline:
# signature (md5-first-8-bytes token hash, majority bit), 4x16-bit block
# buckets (bucket = blk*2^16 + blockval, exactly stages/neardup.py
# _simhash_buckets), the 2..MAX_BUCKET_WIDTH hot-width cap, and the
# hamming <= 3 pair filter. Because hamming <= 3 over 4 blocks guarantees
# a shared block, a green hash-match here also PROVES candidate recall.
SQL_SIMHASH_PAIRS = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))) AS t
  FROM documents
),
sigp AS (
  SELECT doc_id,
         bit_or(CASE WHEN 2 * cnt > n
                     THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)
                     ELSE CAST(0 AS UBIGINT) END) AS sig
  FROM (
    SELECT doc_id, b.bit AS bit,
           sum(CAST((CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT)
                     >> CAST(b.bit AS INTEGER)) & 1 AS BIGINT)) AS cnt,
           count(*) AS n
    FROM toks, (SELECT unnest(generate_series(0, 63)) AS bit) b
    GROUP BY doc_id, b.bit
  )
  GROUP BY doc_id
),
sigs AS (
  SELECT d.doc_id, coalesce(s.sig, CAST(0 AS UBIGINT)) AS sig
  FROM documents d LEFT JOIN sigp s USING (doc_id)
),
blocks AS (
  SELECT doc_id,
         CAST(b.blk * 65536
              + CAST((sig >> CAST(16 * b.blk AS INTEGER)) & 65535 AS BIGINT)
              AS BIGINT) AS bucket
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS blk) b
),
hot AS (
  SELECT bucket FROM blocks GROUP BY bucket
  HAVING count(*) BETWEEN 2 AND {neardup.MAX_BUCKET_WIDTH}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN hot h ON a.bucket = h.bucket
  JOIN blocks b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
FROM cand c
JOIN sigs sa ON sa.doc_id = c.doc_a
JOIN sigs sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.sig, sb.sig)) <= {neardup.SIMHASH_MAX_HAMMING}
"""


# Self-contained DuckDB reproduction of the WHOLE minhash pipeline —
# possible because char_shingles is a polynomial codepoint hash DuckDB can
# recompute exactly in HUGEINT (wrap-mod-2^64 at the polynomial, then the
# permutation (a*x+b) mod 2^64 mod (2^61-1), then the FNV band fold of
# stages/neardup.py:_band_buckets with its >>11 53-bit truncation, the
# 2..MAX_BUCKET_WIDTH hot cap, and the signature-agreement estimate).
# A green hash-match PROVES candidate generation AND the estimate, not
# just the final pair list. Perm constants are embedded from the same
# _PERM_A/_PERM_B arrays the engine uses.
_SQL_M64 = "18446744073709551616"  # 2^64 (HUGEINT wrap modulus)


def _sql_perm_rows() -> str:
    a, b = neardup._PERM_A, neardup._PERM_B
    return ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(len(a)))


def _sql_band_fold() -> str:
    """Nested SQL expression for the FNV band fold over vs[1..LSH_ROWS]:
    h = fnv_offset ^ ((band+1)*golden mod 2^64); h = (h ^ v)*prime mod 2^64
    per row. XOR runs in UBIGINT (no overflow), multiplies in HUGEINT."""
    h = (f"xor(CAST({0xCBF29CE484222325} AS UBIGINT), "
         f"CAST(((band + 1) * CAST({0x9E3779B97F4A7C15} AS HUGEINT)) "
         f"% {_SQL_M64} AS UBIGINT))")
    for k in range(1, neardup.LSH_ROWS + 1):
        h = (f"CAST((CAST(xor({h}, vs[{k}]) AS HUGEINT) "
             f"* {0x100000001B3}) % {_SQL_M64} AS UBIGINT)")
    return h


def _sql_minhash_ctes(threshold: float,
                      source_table: str = "documents") -> str:
    """The shared CTE chain (doc_id, text) -> minhash candidate pairs
    (doc_a, doc_b, jaccard_est) at ``threshold``; composed into
    SQL_MINHASH_PAIRS, SQL_NEARDUP_DEDUP and (over the curation-kept
    subset via ``source_table``) SQL_CURATION_FUZZY."""
    return rf"""norm AS (
  SELECT doc_id,
         CASE WHEN length(s) < 5 THEN s || repeat(' ', 5 - length(s))
              ELSE s END AS s
  FROM (SELECT doc_id,
               lower(array_to_string(list_filter(
                 regexp_split_to_array(text, '\s+'), x -> x <> ''), ' ')) AS s
        FROM {source_table})
),
cps AS (
  SELECT doc_id, i, ord(c) AS c FROM (
    SELECT doc_id,
           unnest(generate_series(1, length(s))) AS i,
           unnest(str_split(s, '')) AS c
    FROM norm)
),
shing AS (
  SELECT DISTINCT doc_id,
    CAST((((((CAST(c0 AS HUGEINT) * {neardup.SHINGLE_BASE} + c1)
           * {neardup.SHINGLE_BASE} + c2) * {neardup.SHINGLE_BASE} + c3)
           * {neardup.SHINGLE_BASE} + c4) % {_SQL_M64}) AS UBIGINT) AS h
  FROM (
    SELECT doc_id, c AS c0,
           lead(c, 1) OVER w AS c1, lead(c, 2) OVER w AS c2,
           lead(c, 3) OVER w AS c3, lead(c, 4) OVER w AS c4
    FROM cps WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  ) WHERE c4 IS NOT NULL
),
perms(pid, a, b) AS (VALUES {_sql_perm_rows()}),
sig AS (
  SELECT doc_id, pid,
         min(CAST(((CAST(a AS HUGEINT) * h + b) % {_SQL_M64})
                  % {(1 << 61) - 1} AS UBIGINT)) AS v
  FROM shing, perms
  GROUP BY doc_id, pid
),
bandv AS (
  SELECT doc_id, pid // {neardup.LSH_ROWS} AS band,
         list(v ORDER BY pid) AS vs
  FROM sig GROUP BY doc_id, pid // {neardup.LSH_ROWS}
),
buckets AS (
  SELECT doc_id, CAST({_sql_band_fold()} // 2048 AS BIGINT) AS bucket
  FROM bandv
),
hot AS (
  SELECT bucket FROM buckets GROUP BY bucket
  HAVING count(*) BETWEEN 2 AND {neardup.MAX_BUCKET_WIDTH}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN hot h ON a.bucket = h.bucket
  JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
),
mh_pairs AS (
  SELECT doc_a, doc_b, round(est, 6) AS jaccard_est FROM (
    SELECT c.doc_a, c.doc_b,
           avg(CASE WHEN sa.v = sb.v THEN 1.0 ELSE 0.0 END) AS est
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.pid = sa.pid
    GROUP BY c.doc_a, c.doc_b
  ) WHERE est >= {threshold}
)"""


SQL_MINHASH_PAIRS = (
    "WITH " + _sql_minhash_ctes(0.5)
    + "\nSELECT doc_a, doc_b, jaccard_est FROM mh_pairs")


# Fuzzy-dedup oracle: the minhash pair CTEs above, then connected
# components via a recursive reachability CTE (every edge node reaches
# itself through any length-2 cycle, so min(anc) over the reachable set IS
# the cluster minimum) and keep-first survivors — the SQL twin of
# cluster_pairs_keep_first / components_losers_ds.
SQL_NEARDUP_DEDUP = (
    "WITH RECURSIVE " + _sql_minhash_ctes(0.5) + rf""",
edges AS (
  SELECT doc_a AS node, doc_b AS nbr FROM mh_pairs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM mh_pairs
),
reach(node, anc) AS (
  SELECT node, nbr FROM edges
  UNION
  SELECT r.node, e.nbr FROM reach r JOIN edges e ON r.anc = e.node
),
losers AS (
  SELECT node FROM reach GROUP BY node HAVING min(anc) < node
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM losers)""")


def q_jaccard_pairs(sf_dir):
    ds = _t(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return neardup.ngram_jaccard_pairs(ds, block_col="source", n=3,
                                       threshold=0.2)


# exact word-3-gram Jaccard is SQL-expressible with DuckDB list kernels;
# the <3-token edge case mirrors word_ngrams (single joined gram)
SQL_JACCARD_PAIRS = r"""
WITH grams AS (
  SELECT doc_id, source,
         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(
                     generate_series(1, len(t) - 2),
                     i -> array_to_string(t[i:i+2], ' '))) END AS g
  FROM (SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '') AS t
        FROM documents)
)
SELECT doc_a, doc_b, round(sim, 6) AS jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CASE WHEN len(a.g) = 0 AND len(b.g) = 0 THEN 1.0
              WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0
              ELSE len(list_intersect(a.g, b.g)) * 1.0
                   / len(list_distinct(a.g || b.g)) END AS sim
  FROM grams a JOIN grams b
    ON a.source = b.source AND a.doc_id < b.doc_id
)
WHERE sim >= 0.2
"""


def q_chunk_documents_words(sf_dir):
    """Alternative word-based chunker (SURVEY M8, reference
    rag_py.py:182-200) behind the same row-local flat-map shape as
    chunk_documents. SQL-checked since round 5: SQL_CHUNK_DOCUMENTS_WORDS
    replays the word-budget accumulation / 50-word overlap spill /
    min-word filter as a recursive CTE and pins chunk-text sha256
    parity. Text amplified 9x on both sides (a ~50-word doc never spills
    the 300-word budget) so the fixture exercises 1152 chunks across 362
    multi-chunk docs."""
    from ..functions.textproc import chunk_text_words

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def to_chunks(t: pa.Table) -> pa.Table:
        ids, idxs, n_words, n_chars, shas = [], [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            amp = ((text or "") + "\n\n") * 9
            for k, ch in enumerate(chunk_text_words(amp)):
                ids.append(doc_id)
                idxs.append(k)
                n_words.append(len(ch.split()))
                n_chars.append(len(ch))
                shas.append(sha256_text(ch))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_index": pa.array(idxs, pa.int32()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "chunk_sha256": pa.array(shas, pa.string()),
        })

    return ds.map_batches(to_chunks, batch_format="pyarrow")


def q_doc_metadata(sf_dir):
    """Doc metadata (SURVEY M10): title/page-count analog over the three
    payload routes; rows-only (payload parsing is not SQL-expressible)."""
    from ..stages.docmeta import doc_metadata_batch

    ds = _t(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(pages_from_documents_batch, batch_format="pyarrow")
    return pages.map_batches(doc_metadata_batch, batch_format="pyarrow")


def q_lsh_ann(sf_dir):
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    qvec = np.asarray(q.column("embedding").to_pylist()[0], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # multiprobe=2 probes 1+bits+C(bits,2) buckets — still ~1% of the
    # space at 12 bits, recall 10/10 at sf0.01 vs 1/10 single-probe
    return similarity.lsh_ann(ds, qvec, k=10,
                              multiprobe=2).to_pandas()[["vec_id", "cos_sim"]]


def q_neardup_dedup(sf_dir):
    """End-to-end fuzzy dedup: minhash pairs -> connected components ->
    keep cluster-minimum doc_id (the fuzzy analog of dedup_exact's
    keep-first policy; oracle = SQL_NEARDUP_DEDUP's recursive CTE)."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup.neardup_dedup_keep_first(ds, threshold=0.5)


def q_ivf_ann(sf_dir):
    """IVF approximate nearest neighbors: spherical-kmeans cells + nprobe
    search (the inverted-file scale path). SQL-checked: with the training
    sample pinned to the first ORACLE_VEC_SAMPLE ids, the seeded init is
    data-independent and the fixed-iteration quantizer + probe + exact
    re-rank unroll into SQL_IVF_ANN (see _sql_ivf_ann)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    _assert_dense_prefix(src)
    q = pq.read_table(src, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    qvec = np.asarray(q.column("embedding").to_pylist()[0], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = similarity.ivf_ann(
        ds, qvec, k=10, sample=ORACLE_VEC_SAMPLE, source_path=src)
    df = out.to_pandas()[["vec_id", "cos_sim"]]
    return df[df["vec_id"] != 0].reset_index(drop=True)


def q_kmeans_clusters(sf_dir):
    """Full-corpus distributed Lloyd k-means over the embeddings table
    (stages/clustering.py:kmeans_fit — sample-init + per-batch partial
    sums through a bounded-fan-in tree combine), then per-cluster
    membership stats. SQL-checked: tol=0 fixes the iteration count, the
    pinned sample makes the seeded init data-independent, and the whole
    run unrolls into SQL_KMEANS_CLUSTERS (see _sql_kmeans_clusters);
    pure-numpy parity, partitioning invariance and the non-increasing
    objective stay pinned in tests/test_clustering.py."""
    from ..stages import clustering

    _assert_dense_prefix(os.path.join(sf_dir, "embeddings.parquet"))
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    fit = clustering.kmeans_fit(
        ds, n_clusters=8, iters=8, tol=0.0, sample=ORACLE_VEC_SAMPLE,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))
    return clustering.kmeans_cluster_stats(
        ds, fit.centroids).sort("cluster")


def q_pq_ann(sf_dir):
    """Product-quantization ADC top-k (stages/pq.py — per-subspace
    codebooks from the bounded deterministic sample, distributed uint8
    encode, broadcast LUT + partial top-k). SQL-checked: with the sample
    pinned, each subspace's fixed-iteration Euclidean Lloyd unrolls like
    the spherical chains, and encode + ADC are joins over the final
    codebooks (SQL_PQ_ANN); codeword-grid exactness and clustered
    recall >= 0.7 stay pinned in tests/test_pq.py."""
    from ..stages import pq as pqmod

    src = os.path.join(sf_dir, "embeddings.parquet")
    _assert_dense_prefix(src)
    q = pq.read_table(src, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    qvec = np.asarray(q.column("embedding").to_pylist()[0], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = pqmod.pq_ann(ds, qvec, k=10, source_path=src, exclude_ids=[0],
                       sample=ORACLE_VEC_SAMPLE)
    return out.to_pandas()[["vec_id", "adc_dist"]]


def q_cosine_neardup_lsh(sf_dir):
    """Embedding near-dup blocked by hyperplane-LSH bucket instead of a
    metadata label (the unlabeled-corpus path; rows-only)."""
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return similarity.cosine_neardup_pairs_lsh(ds, threshold=0.3, bits=6)


def q_chunk_documents(sf_dir):
    """Reference chunker over the documents table (chunk/merge/overlap/
    dedupe, SURVEY M5-M7 + §2.8). SQL-checked since round 5: the oracle
    (SQL_CHUNK_DOCUMENTS) reconstructs split/greedy-merge/overlap/dedupe
    as a recursive CTE and compares per-chunk sha256 of the chunk TEXT —
    full value parity for the chunk contents. The sha1-derived chunk ids
    stay pinned by the byte-identity goldens in tests/test_textproc.py
    (DuckDB has no sha1). Each doc's text is amplified 9x with paragraph
    breaks — identically on both sides — so the sf0.01 fixture actually
    exercises multi-chunk merges, overlap prefixes and duplicate chunks
    (1126 chunks / 159 dups / 373 multi-chunk docs) instead of one
    trivial chunk per doc."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def to_chunks(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            recs = chunk_records(str(doc_id), ((text or "") + "\n\n") * 9)
            for r in recs:
                rows.append({"doc_id": doc_id, "chunk_index": r["chunk_index"],
                             "total_chunks": r["total_chunks_in_doc"],
                             "chunk_sha256": sha256_text(r["text"]),
                             "n_chars": r["n_chars"],
                             "is_duplicate": r["is_duplicate"]})
        schema = pa.schema([("doc_id", pa.int64()), ("chunk_index", pa.int32()),
                            ("total_chunks", pa.int64()),
                            ("chunk_sha256", pa.string()),
                            ("n_chars", pa.int64()),
                            ("is_duplicate", pa.bool_())])
        return pa.Table.from_pylist(rows, schema=schema) if rows \
            else schema.empty_table()

    return ds.map_batches(to_chunks, batch_format="pyarrow")


def q_extract_pages(sf_dir):
    """Flagship extraction over pages synthesized from the documents table
    (deterministic, row-local). Byte-identity is enforced by pytest against
    the oracle; the driver records a rows-only check here."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(pages_from_documents_batch, batch_format="pyarrow")
    docs = pages.map_batches(ExtractPages, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 8))
    return docs.select_columns(["url", "method", "text_sha256", "n_chars"])


def q_media_features(sf_dir):
    """Multimodal plumbing as a driver-visible pipeline: a deterministic
    binary media column synthesized from doc_ids, decoded by the
    image-features actor pool (small batch_size — binary rows are wide).
    The decode kernel is the documented deterministic stand-in (no PIL in
    this environment); the Ray-side schema/actor/batch plumbing is real."""
    from ..stages.multimodal import DecodeImageFeatures, make_fake_image

    ds = _t(sf_dir, "documents", columns=["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(
                [make_fake_image(i, 32 + (i % 7) * 8, 24 + (i % 5) * 8)
                 for i in ids], pa.large_binary()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    out = media.map_batches(DecodeImageFeatures, batch_format="pyarrow",
                            batch_size=32, concurrency=(1, 4))
    return out.select_columns(["media_id", "width", "height",
                               "mean_intensity"])


def q_json_repair(sf_dir):
    """LLM-output JSON handling (the last SURVEY 2.9 scalar; reference
    gemini_service.py:283-443 fallback chain) as a pipeline: a
    deterministic noisy-JSON payload per doc (clean / fenced / truncated /
    garbage by doc_id mod 4) -> fence-strip + balanced-extract +
    truncation-repair parse -> (status, n_keys). SQL oracle: the general
    repair chain is not SQL-expressible, but ON THIS PAYLOAD FAMILY it
    reduces exactly — clean/fenced parse direct, garbage fails, and the
    truncated class's repair is replayed in SQL (rebuild the same half
    payload, close an odd open quote, close an opened-unclosed '[', close
    the '{', then json_valid/json_keys give status and key count); the
    general chain's absolute outputs stay pinned by unit tests."""
    from ..functions.jsonrepair import parse_json_batch

    ds = _t(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def to_payload(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for did, src, nc in zip(df["doc_id"], df["source"], df["n_chars"]):
            base = (f'{{"doc_id": {did}, "source": "{src}", '
                    f'"n": {nc}, "tags": ["a", "b"]}}')
            m = did % 4
            if m == 0:
                payloads.append(base)
            elif m == 1:
                payloads.append("```json\n" + base + "\n```")
            elif m == 2:
                payloads.append("model says: " + base[:len(base) // 2])
            else:
                payloads.append("no json here at all")
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "payload": payloads})

    return ds.map_batches(to_payload, batch_format="pandas") \
        .map_batches(parse_json_batch, batch_format="pandas")


SQL_JSON_REPAIR = """
WITH base AS (
  SELECT doc_id,
         '{"doc_id": ' || doc_id || ', "source": "' || source ||
         '", "n": ' || n_chars || ', "tags": ["a", "b"]}' AS b,
         doc_id % 4 AS m
  FROM documents),
core AS (SELECT doc_id, m, left(b, length(b) // 2) AS c FROM base),
fx AS (SELECT doc_id, m,
         c || (CASE WHEN (length(c) - length(replace(c, '"', ''))) % 2 = 1
                    THEN '"' ELSE '' END)
           || (CASE WHEN strpos(c, '[') > 0 AND strpos(c, ']') = 0
                    THEN ']' ELSE '' END)
           || '}' AS fixed
       FROM core)
SELECT doc_id,
       CASE WHEN m IN (0, 1) THEN 'direct'
            WHEN m = 3 THEN 'failed'
            WHEN json_valid(fixed) THEN 'repaired' ELSE 'failed'
       END AS status,
       CAST(CASE WHEN m IN (0, 1) THEN 4
                 WHEN m = 3 THEN -1
                 WHEN json_valid(fixed) THEN len(json_keys(fixed))
                 ELSE -1 END AS BIGINT) AS n_keys
FROM fx
"""


def q_rolling_fingerprint(sf_dir):
    """Winnowing-style document fingerprint: min polynomial rolling hash
    over 16-char windows (stages/textstats.py:rolling_fingerprint).
    SQL oracle: each window hash is a pure function of its 16-char
    substring, so the scan unrolls to 16 ord() terms with precomputed
    257^j mod 2^61 literals, MIN'd per doc. Covers the polynomial path
    (every testdata doc is >= 16 chars — the short-doc sha1 fallback has
    no DuckDB sha1 and stays pinned by unit tests)."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textstats.rolling_fingerprint_batch,
                          batch_format="pandas")


_RFP_MOD = 1 << 61
SQL_ROLLING_FINGERPRINT = f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - 14)) AS i
  FROM documents),
h AS (SELECT doc_id, ({" + ".join(
    f"CAST(ord(substr(text, i + {j}, 1)) % 65536 AS HUGEINT) "
    f"* {pow(257, 15 - j, _RFP_MOD)}" for j in range(16))}) % {_RFP_MOD}
        AS wh
      FROM pos)
SELECT doc_id, CAST(MIN(wh) AS BIGINT) AS rfp FROM h GROUP BY doc_id
"""


# --- profiling / summary statistics (stages/profile.py) -----------------------

def q_profile_orders(sf_dir):
    """Per-column dataset profile (stages/profile.py:profile_columns —
    one partial row per column per batch, tiny combine; min/max rendered
    as strings so heterogeneous columns share a schema)."""
    from ..stages import profile
    return profile.profile_columns(
        _t(sf_dir, "orders"),
        int_cols=["o_orderkey", "o_custkey"],
        str_cols=["o_orderstatus", "o_orderpriority"])


def _profile_leg(col, kind):
    cast = "CAST({} AS VARCHAR)" if kind == "i" else "{}"
    return (f"SELECT '{col}' AS \"column\", CAST(count(*) AS BIGINT) AS "
            f"n_rows, CAST(count(*) - count({col}) AS BIGINT) AS n_null, "
            f"{cast.format(f'min({col})')} AS min_value, "
            f"{cast.format(f'max({col})')} AS max_value FROM orders")


SQL_PROFILE_ORDERS = " UNION ALL ".join([
    _profile_leg("o_orderkey", "i"), _profile_leg("o_custkey", "i"),
    _profile_leg("o_orderstatus", "s"), _profile_leg("o_orderpriority", "s"),
])


HIST_LO, HIST_WIDTH, HIST_NBINS = 0, 2000, 8


def q_value_histogram(sf_dir):
    """Fixed-width histogram of the event value in 1e-4 units
    (stages/profile.py:histogram_fixed — bincount partials, one small
    sum; under/overflow clamps to the edge bins)."""
    from ..stages import profile

    ds = _t(sf_dir, "events", columns=["value"])

    def to_e4(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"value_e4": np.round(
            df["value"].to_numpy() * 10000.0).astype("int64")})

    return profile.histogram_fixed(
        ds.map_batches(to_e4, batch_format="pandas"),
        col="value_e4", lo=HIST_LO, width=HIST_WIDTH, nbins=HIST_NBINS)


SQL_VALUE_HISTOGRAM = f"""
WITH v AS (
  SELECT LEAST(GREATEST(CAST(floor(
           (CAST(round(value * 10000) AS BIGINT) - {HIST_LO}) * 1.0
           / {HIST_WIDTH}) AS BIGINT), 0), {HIST_NBINS - 1}) AS bin
  FROM events),
bins AS (SELECT unnest(range(0, {HIST_NBINS})) AS bin)
SELECT bins.bin,
       CAST({HIST_LO} + bins.bin * {HIST_WIDTH} AS BIGINT) AS bin_lo,
       CAST({HIST_LO} + (bins.bin + 1) * {HIST_WIDTH} - 1 AS BIGINT) AS bin_hi,
       CAST(coalesce(n, 0) AS BIGINT) AS n
FROM bins LEFT JOIN (SELECT bin, count(*) AS n FROM v GROUP BY bin) c
USING (bin)
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir):
    """Hour x event-type contingency table
    (stages/profile.py:pivot_counts — per-batch crosstab partials
    bounded by cell count; driver-side pivot of the 24x5 result)."""
    from ..stages import profile

    ds = _t(sf_dir, "events", columns=["ts", "event_type"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hour": df["ts"].dt.hour.astype("int64"),
                             "event_type": df["event_type"]})

    return profile.pivot_counts(
        ds.map_batches(add_hour, batch_format="pandas"),
        row_key="hour", col_key="event_type", col_values=EVENT_TYPES)


SQL_EVENTS_PIVOT = """
SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
         AS click,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS error,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
         AS signup,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
         AS "view"
FROM events GROUP BY 1
"""


def q_customer_activity(sf_dir):
    """Fused distributed LEFT join + aggregate
    (stages/joins.py:left_join_sum): every customer with their event
    count, 0 for the inactive — unmatched left rows survive, which the
    inner path cannot express. Per-batch count partials feed the single
    shuffle directly; the unfused aggregate-then-left_join plan paid
    two extra barriers (21s -> single digits at sf0.1)."""
    from ..stages import joins

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    per_batch = _t(sf_dir, "events", columns=["user_id"]) \
        .map_batches(lambda df: df.groupby("user_id", as_index=False)
                     .agg(n_events=("user_id", "size"))
                     .rename(columns={"user_id": "c_custkey"}),
                     batch_format="pandas")
    return joins.left_join_sum(cust, per_batch, on="c_custkey",
                               val="n_events")


SQL_CUSTOMER_ACTIVITY = """
SELECT c_custkey, c_nationkey,
       CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events
FROM customer LEFT JOIN (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
ON c_custkey = e.user_id
"""


# --- mergeable approximate sketches (stages/sketch.py) ------------------------

def q_cms_event_counts(sf_dir):
    """Count-Min sketch estimates for the event-type counts
    (stages/sketch.py:cms_build — fixed-size grids summed across tasks,
    no groupby). SQL oracle: exact counts — at width 16384 the 5-value
    key space takes no collisions in any depth row, so the min-over-rows
    estimate EQUALS the exact count and the driver hash-match proves it;
    the one-sided error bound on adversarial cardinalities is pinned in
    tests/test_sketches.py."""
    from ..stages import sketch

    ds = _t(sf_dir, "events", columns=["event_type"])
    cms = sketch.cms_build(ds, col="event_type")
    types = pd.Series(EVENT_TYPES, dtype="object")
    return pd.DataFrame({
        "event_type": types,
        "n_est": sketch.cms_query(cms, types).astype("int64")})


SQL_CMS_EVENT_COUNTS = """
WITH t(event_type) AS (VALUES
  ('click'), ('error'), ('purchase'), ('signup'), ('view'))
SELECT t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n_est
FROM t LEFT JOIN (SELECT event_type, count(*) AS n
                  FROM events GROUP BY event_type) c USING (event_type)
"""


def q_hll_distinct_users(sf_dir):
    """HyperLogLog distinct-user estimate (stages/sketch.py:hll_build —
    2^12 registers merged by elementwise max; double-counting safe).
    SQL oracle: the sketch is fully deterministic — splitmix64 is
    replayed in HUGEINT, register ranks via an exact bit-length CASE,
    and the estimator's exact-integer register sum (see hll_estimate)
    makes the float value order-free, so the driver hash-match checks
    the ESTIMATE itself; the error bound stays pinned in
    tests/test_sketches.py."""
    from ..stages import sketch

    ds = _t(sf_dir, "events", columns=["user_id"])
    est = sketch.hll_estimate(sketch.hll_build(ds, col="user_id"))
    return pd.DataFrame({"n_users_est": pd.Series([round(est)],
                                                  dtype="int64")})


def _hll_sql(*, key: str, val: str, table: str, out: str) -> str:
    """DuckDB replay of hll_build/hll_by_key + hll_estimate: splitmix64
    over HUGEINT (the uint64 multiply split into 32-bit halves mod
    2^64), register index / rank exactly as stages/sketch.py computes
    them (rank = 65 - bit_length((h<<p)|ones(p))), and the estimator's
    EXACT integer register sum (absent registers contribute 2^64).
    Assumes non-negative integer ids (matches _hash_values' identity
    cast). The alpha*m^2*2^64 numerator is inlined as a Python repr so
    both sides perform ONE identical float division."""
    import math  # noqa: F401  (documentation parity with hll_estimate)

    P, M = 12, 1 << 64
    m = 1 << P
    seed = 0x9E3779B97F4A7C15
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    num = repr((0.7213 / (1 + 1.079 / m)) * m * m * 2.0 ** 64)
    kk = f"{key}, " if key else ""
    grp = f"GROUP BY {key}" if key else ""
    ord_ = f"ORDER BY {key}" if key else ""

    def mult(c: int) -> str:
        return (f"(((x % 4294967296) * {c} + "
                f"(((x // 4294967296) * {c}) % 4294967296) * 4294967296)"
                f" % {M})")

    bl = "CASE " + " ".join(
        f"WHEN rest >= CAST('{1 << (b - 1)}' AS HUGEINT) THEN {b}"
        for b in range(64, P - 1, -1)) + " END"
    return f"""
WITH h0 AS (SELECT {kk}CAST({val} AS HUGEINT) AS v FROM {table}),
h1 AS (SELECT {kk}((v + {seed}) % {M}) AS x FROM h0),
h2 AS (SELECT {kk}xor(x, x // {1 << 30}) AS x FROM h1),
h3 AS (SELECT {kk}{mult(c1)} AS x FROM h2),
h4 AS (SELECT {kk}xor(x, x // {1 << 27}) AS x FROM h3),
h5 AS (SELECT {kk}{mult(c2)} AS x FROM h4),
h6 AS (SELECT {kk}xor(x, x // {1 << 31}) AS x FROM h5),
pr AS (SELECT {kk}x // {1 << (64 - P)} AS reg,
              (x % {1 << (64 - P)}) * {1 << P} + {(1 << P) - 1} AS rest
       FROM h6),
regs AS (SELECT {kk}reg, MAX(65 - ({bl})) AS r
         FROM pr GROUP BY {kk}reg),
agg AS (SELECT {kk}SUM(CAST(pow(2.0, 64 - r) AS HUGEINT))
               + ({m} - COUNT(*)) * CAST(pow(2.0, 64) AS HUGEINT) AS s,
               {m} - COUNT(*) AS zeros
        FROM regs {grp}),
est AS (SELECT {kk}zeros, {num} / CAST(s AS DOUBLE) AS e FROM agg)
SELECT {kk}CAST(round(CASE WHEN e <= {2.5 * m} AND zeros > 0
                           THEN {float(m)} * ln({float(m)} / zeros)
                           ELSE e END) AS BIGINT) AS {out}
FROM est {ord_}
"""


SQL_HLL_DISTINCT_USERS = _hll_sql(key="", val="user_id", table="events",
                                  out="n_users_est")
SQL_HLL_USERS_BY_TYPE = _hll_sql(key="event_type", val="user_id",
                                 table="events", out="n_distinct_est")


def q_tdigest_value_quantiles(sf_dir):
    """t-digest quantile estimates over events.value
    (stages/sketch.py:tdigest_build — one streaming pass, mergeable
    centroid partials; the continuous-column complement of the exact
    value-histogram quantiles). Rows-only: estimates are approximate
    and partitioning-dependent; the O(q(1-q)/delta) rank-error bound
    is pinned in tests/test_sketches.py."""
    from ..stages import sketch

    ds = _t(sf_dir, "events", columns=["value"])
    dig = sketch.tdigest_build(ds, "value")
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    return pd.DataFrame({"q": qs,
                         "value_est": sketch.tdigest_quantile(dig, qs)})


def q_semantic_dedup(sf_dir):
    """SemDeDup survivors over the embeddings table
    (stages/semdedup.py:semantic_dedup_keep_first — k-means blocks from
    a bounded deterministic sample, tiled within-cluster cosine pairs,
    keep-first components). SQL-checked: the pinned-sample quantizer
    unrolls like ivf_ann's, the pair graph is a within-cluster self-join
    and the components replay as the SQL_NEARDUP_DEDUP recursive CTE
    (SQL_SEMANTIC_DEDUP); planted-duplicate recall and
    driver/distributed parity stay pinned in tests/test_semdedup.py."""
    from ..stages import semdedup

    _assert_dense_prefix(os.path.join(sf_dir, "embeddings.parquet"))
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup.semantic_dedup_keep_first(
        ds, threshold=0.3, sample=ORACLE_VEC_SAMPLE,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))


# --- dataloader prep (stages/packing.py) --------------------------------------

def q_shuffle_rank(sf_dir):
    """Deterministic global training-order shuffle: dense rank over
    (knuth_hash(doc_id), doc_id) — an exact reproducible permutation of
    the corpus computed distributed (stages/packing.py:global_rank:
    bounded histogram pass -> offsets in closure -> per-bucket local
    rank; no global sort materialization)."""
    from ..stages import packing

    ds = _t(sf_dir, "documents", columns=["doc_id"])

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = (df["doc_id"].to_numpy().astype("int64")
                   * 2654435761) % (1 << 32)
        return df

    return packing.global_rank(
        ds.map_batches(add_h, batch_format="pandas"),
        by="h", tiebreak="doc_id", out="shuffle_pos")


SQL_SHUFFLE_RANK = """
SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h,
       CAST(row_number() OVER (
         ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) - 1
       AS BIGINT) AS shuffle_pos
FROM documents
"""


PACK_BUDGET = 2048


def q_pack_documents(sf_dir):
    """Sequence packing for a trainer: greedy first-fit of documents
    (len = reference max(1, n_chars//4) token heuristic) into
    PACK_BUDGET-token packs, deterministic within hash partitions
    (stages/packing.py:pack_sequences). SQL oracle: the greedy
    reset-scan is a pure function of the (id, len) set, so a recursive
    CTE walks each hash partition in id order (depth = max partition
    size, all partitions stepped in parallel); invariants additionally
    pinned in tests/test_packing.py."""
    from ..stages import packing

    ds = _t(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def to_len(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": np.maximum(
                1, df["n_chars"].to_numpy() // 4).astype("int64")})

    return packing.pack_sequences(
        ds.map_batches(to_len, batch_format="pandas"),
        id_col="doc_id", len_col="n_tokens", budget=PACK_BUDGET)


# exact replay of stages/packing.py:pack_sequences: knuth32 hash ->
# 256 partitions, ascending-id greedy fill with reset-on-overflow
# (carried as (pack, pos, off) after-state through a recursive CTE — all
# partitions step in parallel, depth = max rows per partition), lens
# capped at the budget, pack_id = partition * 2^32 + local sequence.
SQL_PACK_DOCUMENTS = f"""
WITH RECURSIVE r AS (
  SELECT doc_id,
         CAST(greatest(1, n_chars // 4) AS BIGINT) AS n_tokens,
         CAST(least(greatest(1, n_chars // 4), {PACK_BUDGET})
              AS BIGINT) AS len,
         CAST(((doc_id * 2654435761) % 4294967296) % 256 AS BIGINT) AS pk,
         row_number() OVER (
           PARTITION BY ((doc_id * 2654435761) % 4294967296) % 256
           ORDER BY doc_id) AS rn
  FROM documents),
walk AS (
  SELECT pk, rn, doc_id, n_tokens, len,
         CAST(0 AS BIGINT) AS pack, CAST(0 AS BIGINT) AS pos,
         CAST(0 AS BIGINT) AS off,
         len AS off_after, CAST(1 AS BIGINT) AS pos_after
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.pk, r.rn, r.doc_id, r.n_tokens, r.len,
         CASE WHEN w.off_after + r.len > {PACK_BUDGET}
              THEN w.pack + 1 ELSE w.pack END,
         CASE WHEN w.off_after + r.len > {PACK_BUDGET}
              THEN 0 ELSE w.pos_after END,
         CASE WHEN w.off_after + r.len > {PACK_BUDGET}
              THEN 0 ELSE w.off_after END,
         CASE WHEN w.off_after + r.len > {PACK_BUDGET}
              THEN r.len ELSE w.off_after + r.len END,
         CASE WHEN w.off_after + r.len > {PACK_BUDGET}
              THEN 1 ELSE w.pos_after + 1 END
  FROM walk w JOIN r ON r.pk = w.pk AND r.rn = w.rn + 1)
SELECT doc_id, n_tokens,
       CAST(pk * 4294967296 + pack AS BIGINT) AS pack_id,
       pos AS pack_pos, off AS pack_offset
FROM walk
"""


# --- training-corpus curation (stages/corpusfilters.py) ----------------------

def q_gopher_repetition(sf_dir):
    """Word-repetition profile per document (Gopher-style duplicate /
    top-n-gram fractions; stages/corpusfilters.py:repetition_stats —
    one explode + hash aggregates per batch, no shuffle)."""
    from ..stages import corpusfilters
    return corpusfilters.repetition_stats(
        _t(sf_dir, "documents", columns=["doc_id", "text"]))


SQL_GOPHER_REPETITION = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
tok AS (
  SELECT doc_id, unnest(ws) AS wd, generate_subscripts(ws, 1) AS pos FROM w),
wc AS (
  SELECT doc_id, wd, count(*) AS n, len(wd) * count(*) AS chars
  FROM tok GROUP BY doc_id, wd),
agg AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(chars) AS BIGINT) AS tot_chars
  FROM wc GROUP BY doc_id),
topw AS (
  SELECT doc_id, chars FROM (
    SELECT doc_id, chars,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, wd ASC) AS rn
    FROM wc) WHERE rn = 1),
bg AS (
  SELECT a.doc_id, a.wd || ' ' || b.wd AS bgr
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
bc AS (
  SELECT doc_id, bgr, count(*) AS n, len(bgr) * count(*) AS chars
  FROM bg GROUP BY doc_id, bgr),
bagg AS (
  SELECT doc_id, CAST(sum(chars) AS BIGINT) AS btot FROM bc GROUP BY doc_id),
topb AS (
  SELECT doc_id, chars FROM (
    SELECT doc_id, chars,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, bgr ASC) AS rn
    FROM bc) WHERE rn = 1)
SELECT agg.doc_id, agg.n_words,
       CAST(floor((agg.n_words - agg.n_distinct) * 1000000.0
                  / agg.n_words + 0.5) AS BIGINT) AS dup_word_ppm,
       CAST(floor(topw.chars * 1000000.0 / agg.tot_chars + 0.5)
            AS BIGINT) AS top_word_char_ppm,
       CAST(coalesce(floor(topb.chars * 1000000.0 / bagg.btot + 0.5), 0)
            AS BIGINT) AS top_bigram_char_ppm
FROM agg JOIN topw USING (doc_id)
LEFT JOIN bagg USING (doc_id) LEFT JOIN topb USING (doc_id)
"""


def q_c4_quality(sf_dir):
    """C4/Gopher heuristic quality flags per document
    (stages/corpusfilters.py:c4_quality; vectorized str kernels)."""
    from ..stages import corpusfilters
    return corpusfilters.c4_quality(
        _t(sf_dir, "documents", columns=["doc_id", "text"]))


SQL_C4_QUALITY = r"""
WITH b AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '\S')) AS BIGINT) AS word_chars,
         contains(text, '{') AS has_curly,
         contains(lower(text), 'lorem ipsum') AS has_lorem
  FROM documents)
SELECT doc_id, n_words,
       CASE WHEN n_words = 0 THEN 0
            ELSE CAST(floor(word_chars * 100.0 / n_words + 0.5) AS BIGINT)
       END AS mean_word_len_e2,
       has_curly, has_lorem,
       n_words >= 50 AS min_words_ok,
       CASE WHEN n_words = 0 THEN FALSE
            ELSE CAST(floor(word_chars * 100.0 / n_words + 0.5) AS BIGINT)
                 BETWEEN 300 AND 1000 END AS word_len_ok
FROM b
"""


def q_pii_redact(sf_dir):
    """PII counting + masking (stages/corpusfilters.py:pii_redact).
    Patterns use explicit ASCII classes so Python re and DuckDB RE2
    produce byte-identical redacted text; applied email -> phone -> ip
    on both sides. (The synthetic corpus contains no PII, so this
    checks the no-op path exactly; planted-PII substance is pinned in
    tests/test_corpusfilters.py.)"""
    from ..stages import corpusfilters
    return corpusfilters.pii_redact(
        _t(sf_dir, "documents", columns=["doc_id", "text"]))


SQL_PII_REDACT = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
       '[A-Za-z0-9_.+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_email,
  CAST(len(regexp_extract_all(regexp_replace(text,
       '[A-Za-z0-9_.+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text,
       '[A-Za-z0-9_.+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g'),
       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
    AS n_ip,
  regexp_replace(regexp_replace(regexp_replace(text,
       '[A-Za-z0-9_.+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g'),
       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
    AS text_redacted
FROM documents
"""


def q_train_split(sf_dir):
    """Deterministic train/val/test assignment by doc_id hash
    (stages/corpusfilters.py:split_assign; same Knuth rule as the
    sampling family — reproducible across engines and partitionings)."""
    from ..stages import corpusfilters
    return corpusfilters.split_assign(
        _t(sf_dir, "documents", columns=["doc_id"]))


SQL_TRAIN_SPLIT = """
SELECT doc_id,
       CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
            WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_orders_enriched(sf_dir):
    """General distributed equi inner join returning both sides' columns
    (stages/joins.py:inner_join — one hash(key) shuffle, per-partition
    vectorized merge, no broadcast): orders enriched with customer name
    and segment; money as exact integer cents."""
    from ..stages import joins, temporal

    orders = _t(sf_dir, "orders",
                columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["o_totalprice_c"] = np.round(
            df["o_totalprice"].to_numpy() * 100.0).astype("int64")
        return df.drop(columns=["o_totalprice"])

    cust = _t(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_mktsegment"]) \
        .map_batches(lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
                     batch_format="pandas")
    return joins.inner_join(
        orders.map_batches(to_cents, batch_format="pandas"), cust,
        on="o_custkey", pre_blocks=temporal.TEMPORAL_PRE_BLOCKS_DOC)


SQL_ORDERS_ENRICHED = """
SELECT o_orderkey, o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_c,
       c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_unigram_nll(sf_dir):
    """Mean negative log-likelihood per doc under the corpus unigram
    model (stages/corpusfilters.py:unigram_logprob — vocab built from
    bounded value_counts partials, shipped once; score pass is one
    explode + dict map + group mean per batch)."""
    from ..stages import corpusfilters

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = corpusfilters.unigram_counts(docs)
    return corpusfilters.unigram_logprob(docs, vocab)


SQL_UNIGRAM_NLL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
  FROM documents),
v AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM v)
SELECT tok.doc_id, round(avg(-ln(v.n / tot.t)), 6) AS nll
FROM tok JOIN v USING (w) CROSS JOIN tot
GROUP BY tok.doc_id
"""


def q_contamination(sf_dir):
    """Benchmark-contamination marking: documents sharing an 8-word
    shingle with a held-out set (here: every 97th doc stands in for the
    benchmark — exact dups and heavy-overlap docs get flagged too).
    Shingle set built once, broadcast via ray.put, probed by binary
    search per doc (stages/corpusfilters.py:mark_contamination).
    SQL oracle: the engine counts DISTINCT shingles via 64-bit hashes;
    the SQL counts the distinct 8-gram STRINGS — equal unless two
    different grams of one doc collide in 64 bits, which the driver
    hash-match then proves did not happen."""
    from ..stages import corpusfilters

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda df: df[df["doc_id"] % 97 == 0].reset_index(drop=True),
        batch_format="pandas").to_pandas()
    return corpusfilters.mark_contamination(docs, list(bench["text"]))


# same tokenization contract as token_count (lower + \s+ split + empty
# filter); grams are distinct per doc; benchmark = docs with id % 97 == 0
SQL_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
  FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
  WHERE len(t) >= 8),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hits AS (SELECT d.doc_id, count(*) AS n_hits
         FROM grams d JOIN bench b USING (g) GROUP BY d.doc_id),
nsh AS (SELECT doc_id, count(*) AS n_shingles FROM grams GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(n.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) >= 1 AS contaminated
FROM toks t
LEFT JOIN nsh n USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""


def q_boilerplate_scrub(sf_dir):
    """Corpus-frequency boilerplate removal
    (stages/boilerplate.py:remove_boilerplate_lines): lines appearing
    in >= 5 distinct documents are dropped, documents reassembled in
    order. The testdata documents are single distinct lines, so both
    sides first plant deterministic footers — a shared nav line per
    doc_id%7 class (boilerplate, removed) and a unique share line per
    doc (content, kept); every-third doc has no nav line."""
    from ..stages.boilerplate import remove_boilerplate_lines

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        t = df["text"].fillna("").to_numpy(dtype=object)
        share = np.array([f"share-{i}" for i in d], dtype=object)
        nav = np.array([f"nav-{i % 7}" for i in d], dtype=object)
        text = np.where(d % 3 == 0, t + "\n" + share,
                        t + "\n" + nav + "\n" + share)
        return pd.DataFrame({"doc_id": d, "text": text})

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(plant, batch_format="pandas")
    return remove_boilerplate_lines(docs, min_df=5)


SQL_BOILERPLATE_SCRUB = """
WITH d AS (
  SELECT doc_id,
         text || chr(10) ||
         CASE WHEN doc_id % 3 = 0 THEN ''
              ELSE 'nav-' || CAST(doc_id % 7 AS VARCHAR) || chr(10) END ||
         'share-' || CAST(doc_id AS VARCHAR) AS text
  FROM documents),
split AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
lines AS (SELECT doc_id, unnest(ls) AS line,
                 unnest(generate_series(1, len(ls))) AS pos
          FROM split),
freq AS (SELECT line, count(DISTINCT doc_id) AS df
         FROM lines GROUP BY line),
kept AS (SELECT l.doc_id, l.line, l.pos
         FROM lines l JOIN freq f USING(line) WHERE f.df < 5),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id)
SELECT s.doc_id, coalesce(a.text, '') AS text,
       CAST(len(s.ls) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM split s LEFT JOIN agg a USING(doc_id)
"""


# --- keyword retrieval / hybrid RAG family (stages/retrieval_text.py) -------
# The reference retrieves by vector only (question_rag.py:130-194, Chroma
# cosine top-k); these add the standard keyword complement (inverted index,
# BM25) and RRF fusion of the two rankings — each with a full DuckDB oracle.

BM25_TERMS = ["hash", "vector", "dup"]
BM25_TERMS_SQL = "['hash', 'vector', 'dup']"
RRF_DEPTH = 50
RRF_K = 60


def q_inverted_index(sf_dir):
    """Sharded distributed inverted index over the corpus: one row per
    (token, 1024-entry posting shard) with total df and 'id:tf,...'
    postings ascending by doc_id. One coarse token-hash shuffle."""
    from ..stages import retrieval_text

    return retrieval_text.inverted_index(
        _t(sf_dir, "documents", columns=["doc_id", "text"]))


SQL_INVERTED_INDEX = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY token, doc_id),
num AS (
  SELECT token, doc_id, tf,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) - 1 AS rn,
         count(*) OVER (PARTITION BY token) AS df
  FROM tf)
SELECT token, CAST(rn // 1024 AS BIGINT) AS shard, CAST(df AS BIGINT) AS df,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM num GROUP BY token, shard, df
"""


def q_bm25_topk(sf_dir):
    """Okapi BM25 top-10 for a bag-of-words query: tiny stats pass
    (N/avgdl/df partials), then a streaming scoring pass with per-batch
    partial top-k. Scores float64, rounded 6 dp, ties by doc_id."""
    from ..stages import retrieval_text

    return retrieval_text.bm25_topk(
        _t(sf_dir, "documents", columns=["doc_id", "text"]),
        BM25_TERMS, k=10)


# the arithmetic below mirrors stages/retrieval_text.py:bm25_topk term by
# term (same literal order, float64 throughout) so the 6-dp rounded scores
# hash-match: idf = ln((N-df+0.5)/(df+0.5)+1), one summand per matching
# term, denominator k1*(1-b+b*dl/avgdl) with k1=1.2, b=0.75.
SQL_BM25_TOPK = r"""
WITH tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
stats AS (
  SELECT count(*) AS n,
         CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl
  FROM tokd),
terms AS (SELECT unnest(__TERMS__) AS term),
tf AS (
  SELECT d.doc_id, t.term,
         len(list_filter(d.toks, x -> x = t.term)) AS tf,
         len(d.toks) AS dl
  FROM tokd d CROSS JOIN terms t),
dft AS (
  SELECT term, count(*) FILTER (WHERE tf > 0) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)))
           AS score
  FROM tf JOIN dft d USING (term) CROSS JOIN stats s
  WHERE tf.tf > 0
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT 10
""".replace("__TERMS__", BM25_TERMS_SQL)


def q_boolean_search(sf_dir):
    """Conjunctive keyword search: documents containing EVERY query term
    (token equality, not substring) — pure streaming filter."""
    from ..stages import retrieval_text

    return retrieval_text.boolean_and_search(
        _t(sf_dir, "documents", columns=["doc_id", "text"]), BM25_TERMS)


SQL_BOOLEAN_SEARCH = r"""
SELECT doc_id FROM documents
WHERE len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                      x -> x = 'hash')) > 0
  AND len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                      x -> x = 'vector')) > 0
  AND len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                      x -> x = 'dup')) > 0
"""


def q_rrf_hybrid(sf_dir):
    """Hybrid retrieval: BM25 keyword ranking fused with cosine vector
    ranking by reciprocal-rank fusion, score = sum 1/(60 + rank) over
    the two depth-50 lists. Each leg is the distributed operator; the
    fusion itself is driver-side over 2 x 50 candidate rows."""
    from ..stages import retrieval_text

    bm = retrieval_text.bm25_topk(
        _t(sf_dir, "documents", columns=["doc_id", "text"]),
        BM25_TERMS, k=RRF_DEPTH)
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    qvec = np.asarray(q.column("embedding").to_pylist()[0], dtype=np.float64)
    kn = similarity.knn_bruteforce(
        _t(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        qvec, k=RRF_DEPTH, exclude_ids=[0]).to_pandas()
    kn = kn.sort_values(["cos_sim", "vec_id"], ascending=[False, True],
                        kind="mergesort").rename(columns={"vec_id": "doc_id"})
    return retrieval_text.rrf_fuse([bm, kn], id_col="doc_id", k=10,
                                   rrf_k=RRF_K)


SQL_RRF_HYBRID = r"""
WITH tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
stats AS (
  SELECT count(*) AS n,
         CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl
  FROM tokd),
terms AS (SELECT unnest(__TERMS__) AS term),
tf AS (
  SELECT d.doc_id, t.term,
         len(list_filter(d.toks, x -> x = t.term)) AS tf,
         len(d.toks) AS dl
  FROM tokd d CROSS JOIN terms t),
dft AS (
  SELECT term, count(*) FILTER (WHERE tf > 0) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl)))
           AS score
  FROM tf JOIN dft d USING (term) CROSS JOIN stats s
  WHERE tf.tf > 0
  GROUP BY tf.doc_id),
bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS r
  FROM scored
  QUALIFY r <= 50),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
kn AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                 q.qe), 6) DESC,
                    e.vec_id) AS r
  FROM embeddings e, q
  WHERE e.vec_id <> 0
  QUALIFY r <= 50),
fused AS (
  SELECT doc_id, sum(1.0 / (60 + r)) AS s
  FROM (SELECT * FROM bm UNION ALL SELECT * FROM kn)
  GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS rrf_score
FROM fused
ORDER BY round(s, 6) DESC, doc_id
LIMIT 10
""".replace("__TERMS__", BM25_TERMS_SQL)


def q_bm25_from_index(sf_dir):
    """BM25 top-10 scored from the PERSISTED index (the serving path
    the batch scorer is not): build the with_doclen inverted index
    once, then score the query entirely from posting shards — df from
    the shard rows, dl from the 'id:tf:dl' entries, N from parquet
    metadata; the corpus text is never touched at scoring time
    (stages/retrieval_text.py:bm25_topk_from_index). Same oracle as
    bm25_topk: identical ranking either way."""
    from ..stages import retrieval_text

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    idx = retrieval_text.inverted_index(docs, with_doclen=True)
    n_docs = _t(sf_dir, "documents", columns=["doc_id"]).count()
    return retrieval_text.bm25_topk_from_index(
        idx, BM25_TERMS, n_docs=n_docs, k=10)


MODEL_W = {"bias": -3.0, "ln_len": 0.45, "space": 2.0, "digit": -4.0}


def q_tfidf_keywords(sf_dir):
    """Top-3 tf-idf keywords per document
    (stages/retrieval_text.py:tfidf_keywords): token rows final after
    one batch pass, df computed INSIDE the token-hash partition (no
    global vocabulary anywhere), then one doc-hash repartition for the
    vectorized per-doc cut. score = round(tf * ln(N/df), 6), ties by
    ascending token."""
    from ..stages import retrieval_text

    return retrieval_text.tfidf_keywords(
        _t(sf_dir, "documents", columns=["doc_id", "text"]), top=3)


SQL_TFIDF_KEYWORDS = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY token, doc_id),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS score
      FROM tf JOIN dfq d USING (token) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rn
      FROM s)
SELECT doc_id, token, score FROM r WHERE rn <= 3
"""


def q_threshold_sweep(sf_dir):
    """Filter-calibration sweep (stages/corpusfilters.py:
    threshold_sweep): for each candidate quality cutoff, the surviving
    doc count and char mass — computed for the WHOLE grid in one
    streaming pass (per-batch score-vs-grid bool matrix, |grid|-row
    partials). Scoring reuses the model_score logistic; the comparison
    uses the RAW float64 sigmoid on both sides (1-ulp boundary risk
    instead of rounding-tie risk)."""
    from ..stages import corpusfilters

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    w = MODEL_W

    def score(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n = text.str.len().to_numpy(dtype=np.float64)
        digits = text.str.count(r"[0-9]").to_numpy(dtype=np.float64)
        spaces = text.str.count(" ").to_numpy(dtype=np.float64)
        denom = np.where(n > 0, n, 1.0)
        z = (w["bias"] + w["ln_len"] * np.log1p(n)
             + w["space"] * (spaces / denom)
             + w["digit"] * (digits / denom))
        return pd.DataFrame({
            "score": 1.0 / (1.0 + np.exp(-z)),
            "n_chars": n.astype("int64")})

    return corpusfilters.threshold_sweep(
        ds.map_batches(score, batch_format="pandas"),
        score_col="score", weight_col="n_chars")


SQL_THRESHOLD_SWEEP = f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(text) - length(replace(text, ' ', ''))
              AS DOUBLE) AS spaces,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
              AS DOUBLE) AS digits
  FROM documents),
s AS (
  SELECT doc_id,
         1.0 / (1.0 + exp(-({MODEL_W['bias']}
           + {MODEL_W['ln_len']} * ln(1 + n)
           + {MODEL_W['space']} * (spaces / greatest(n, 1))
           + {MODEL_W['digit']} * (digits / greatest(n, 1))))) AS score,
         CAST(n AS BIGINT) AS n_chars
  FROM f),
grid AS (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5,
                        0.6, 0.7, 0.8, 0.9]) AS threshold)
SELECT g.threshold,
       CAST(count(*) FILTER (WHERE s.score > g.threshold)
            AS BIGINT) AS n_keep,
       CAST(coalesce(sum(s.n_chars)
                     FILTER (WHERE s.score > g.threshold), 0)
            AS BIGINT) AS w_keep
FROM grid g CROSS JOIN s
GROUP BY g.threshold
"""


def q_ngram_novelty(sf_dir):
    """Per-document 5-gram novelty
    (stages/corpusfilters.py:ngram_novelty): fraction of the doc's gram
    occurrences not shared with another document — the per-doc rollup
    of the duplicate_ngrams span inventory; same single gram-hash
    shuffle plus one doc-hash fold."""
    from ..stages import corpusfilters

    return corpusfilters.ngram_novelty(
        _t(sf_dir, "documents", columns=["doc_id", "text"]))


SQL_NGRAM_NOVELTY = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 5),
tot AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g),
sh AS (SELECT gr.doc_id, count(*) AS n_shared
       FROM grams gr JOIN gd USING (g)
       WHERE gd.nd >= 2 GROUP BY gr.doc_id)
SELECT d.doc_id,
       CAST(coalesce(t.n, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
       round(1.0 - CASE WHEN coalesce(t.n, 0) = 0 THEN 0.0
                        ELSE CAST(coalesce(s.n_shared, 0) AS DOUBLE)
                             / t.n END, 6) AS novelty
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN sh s USING (doc_id)
"""


# --- distributed-twin entries -------------------------------------------------
# The scale paths (hash-join dup marking, distributed near-dup reduces,
# distributed components) are forced locally in
# tests/test_distributed_paths.py; these registry entries give each twin the
# same hard driver signal as the default path.

def _docs_as_url_sha(sf_dir):
    """documents -> (url, text_sha256) in the flagship's key shape: a
    deterministic zero-padded url (so string-min == id-min order) and
    the md5 text fingerprint."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        fp = textstats.fingerprint_batch(df)["fp"]
        url = "u" + df["doc_id"].astype("int64").astype(str).str.zfill(8)
        return pd.DataFrame({"url": url.to_numpy(),
                             "text_sha256": fp.to_numpy()})

    # materialized: both consumers (winner aggregate + mark pass) would
    # otherwise re-execute the per-row md5 lineage; the slim key table
    # (url + 32-hex) is a fraction of the text bytes and spillable
    return ds.map_batches(conv, batch_format="pandas").materialize()


def q_dedup_mark_join(sf_dir):
    """Dup-marking via the DISTRIBUTED twin of the flagship's broadcast
    probe: winner table from one key-only aggregate, then a
    hash-partitioned left-outer join attaches duplicate_of
    (stages/dedup.py:winners_dataset_from_docs + mark_duplicates_join
    — the dup-saturated-corpus path where the winner map is too big to
    ray.put)."""
    from ..stages import dedup as dedup_mod

    docs = _docs_as_url_sha(sf_dir)
    winners = dedup_mod.winners_dataset_from_docs(docs)
    return dedup_mod.mark_duplicates_join(docs, winners,
                                          num_partitions=16) \
        .select_columns(["url", "duplicate_of"])


def q_dedup_mark_broadcast(sf_dir):
    """Dup-marking via the flagship's BROADCAST path: dup-group winner
    map ray.put once, probed per batch with an Arrow-native hash lookup
    (stages/dedup.py:compute_dup_winners + MarkDuplicatesFromBroadcast)
    — same oracle as the join twin, proving the two paths agree."""
    from ..stages import dedup as dedup_mod

    docs = _docs_as_url_sha(sf_dir)
    ref = ray.put(dedup_mod.compute_dup_winners(docs))
    return docs.map_batches(
        dedup_mod.MarkDuplicatesFromBroadcast,
        fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=(1, 4)).select_columns(["url", "duplicate_of"])


SQL_DEDUP_MARK = """
WITH d AS (
  SELECT 'u' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         md5(text) AS fp
  FROM documents),
w AS (SELECT fp, min(url) AS winner FROM d GROUP BY fp)
SELECT d.url,
       CASE WHEN w.winner = d.url THEN '' ELSE w.winner END AS duplicate_of
FROM d JOIN w USING (fp)
"""


def q_minhash_pairs_dist(sf_dir):
    """minhash_pairs through the distributed=True path (hot buckets as a
    hash-partitioned reduce + semi-join, no driver bucket combine) —
    same SQL oracle as the default path."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup.minhash_lsh_pairs(ds, threshold=0.5, distributed=True)


def q_simhash_pairs_dist(sf_dir):
    """simhash_pairs through the distributed=True path — same SQL
    oracle as the default path."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup.simhash_pairs(ds, max_hamming=3, distributed=True)


def q_neardup_dedup_dist(sf_dir):
    """Fuzzy dedup keep-first through the distributed=True path
    (pairs stay a Dataset; components via min-label propagation instead
    of the driver union-find) — same recursive-CTE oracle."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup.neardup_dedup_keep_first(ds, threshold=0.5,
                                            distributed=True)


def q_semantic_dedup_dist(sf_dir):
    """SemDeDup survivors through the distributed=True components path
    (stages/semdedup.py). SQL-checked against the same SQL_SEMANTIC_DEDUP
    oracle as semantic_dedup (the two paths are parity-pinned in
    tests/test_semdedup.py, and both now face the DuckDB replay)."""
    from ..stages import semdedup

    _assert_dense_prefix(os.path.join(sf_dir, "embeddings.parquet"))
    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup.semantic_dedup_keep_first(
        ds, threshold=0.3, distributed=True, sample=ORACLE_VEC_SAMPLE,
        source_path=os.path.join(sf_dir, "embeddings.parquet"))


# --- snapshot / incremental-corpus operators ---------------------------------

def q_latest_event_per_user(sf_dir):
    """Keep-latest-snapshot dedup (the latest-crawl-per-url shape):
    newest event per user, per-batch argmax partials so the shuffle
    carries <= keys x batches rows (stages/temporal.py:keep_latest)."""
    from ..stages import temporal

    return temporal.keep_latest(
        _t(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                      "event_type", "value"]),
        key="user_id", ts="ts", order_tiebreak="event_id",
        carry=["event_type", "value"],
        pre_blocks=temporal.TEMPORAL_PRE_BLOCKS_DOC)


SQL_LATEST_EVENT_PER_USER = """
SELECT user_id, ts, event_id, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


def q_duplicate_ngrams(sf_dir):
    """Shared-span inventory (substring-dedup lite, Lee et al. setting):
    every 5-word gram in >= 2 distinct docs with doc/occurrence counts
    (stages/corpusfilters.py:duplicate_ngrams)."""
    from ..stages import corpusfilters

    return corpusfilters.duplicate_ngrams(
        _t(sf_dir, "documents", columns=["doc_id", "text"]))


SQL_DUPLICATE_NGRAMS = r"""
WITH tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS gram
  FROM tokd, unnest(range(1, len(toks) - 3)) AS t(i)
  WHERE len(toks) >= 5)
SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM grams GROUP BY gram
HAVING count(DISTINCT doc_id) >= 2
"""

INCR_DEDUP_CUT = 250


def q_incremental_dedup(sf_dir):
    """Bloom-filtered incremental dedup against a PERSISTED old-side
    state: new shard (doc_id >= 250) vs the existing corpus
    (doc_id < 250). The old corpus is fingerprinted ONCE into a
    maintained state dir (slim fp parquet + packed bloom bitmap,
    stages/dedup.py:build_incremental_state, keyed by source
    path+mtime so a data change rebuilds); every run after that reads
    ONLY the new-side text plus the state — bloom-negative rows pass
    with zero shuffle, bloom-positive candidates pay the exact
    anti-join against the persisted fp table, so the survivor set is
    exact (stages/dedup.py:incremental_dedup_from_state)."""
    import hashlib
    import shutil

    import pyarrow.dataset as pads

    from ..stages import dedup as dedup_mod

    # old/new split pushed into the parquet read: row-group statistics
    # skip the other side's data instead of scanning the text column
    # twice and filtering after the fact
    path = os.path.join(sf_dir, "documents.parquet")
    new = ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        filter=(pads.field("doc_id") >= INCR_DEDUP_CUT))

    key = hashlib.md5(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}:"
        f"{INCR_DEDUP_CUT}:v2".encode()).hexdigest()[:16]
    state = os.path.join("/tmp/recursive_pdf_extraction_and_rag_ray_state", f"incr_{key}")
    if not os.path.exists(os.path.join(state, "_SUCCESS")):
        old = ray.data.read_parquet(
            path, columns=["doc_id", "text"],
            filter=(pads.field("doc_id") < INCR_DEDUP_CUT))
        # build into a private dir, commit with one atomic rename so
        # concurrent builders can't interleave parquet fragments
        tmp = f"{state}.tmp.{os.getpid()}"
        dedup_mod.build_incremental_state(old, tmp)
        os.makedirs(os.path.dirname(state), exist_ok=True)
        try:
            os.rename(tmp, state)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # another builder won
    return dedup_mod.incremental_dedup_from_state(new, state)


SQL_INCREMENTAL_DEDUP = f"""
SELECT n.doc_id FROM documents n
WHERE n.doc_id >= {INCR_DEDUP_CUT} AND NOT EXISTS (
  SELECT 1 FROM documents o
  WHERE o.doc_id < {INCR_DEDUP_CUT} AND md5(o.text) = md5(n.text))
"""


MIX_QUOTAS = {"src0": 12, "src1": 8, "src2": 4, "src3": 2, "src4": 1}


def q_mixture_sample(sf_dir):
    """Domain-mixture resampling: EXACT per-source quotas selected in
    deterministic hash order (stages/sampling.py:sample_quota) — the
    data-mixing primitive for hitting a target domain distribution
    exactly, where rate-based sampling only hits it in expectation."""
    from ..stages import sampling

    return sampling.sample_quota(
        _t(sf_dir, "documents", columns=["doc_id", "source"]),
        key_col="doc_id", group_col="source", quotas=MIX_QUOTAS)


SQL_MIXTURE_SAMPLE = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents),
q(source, quota) AS (VALUES
  ('src0', 12), ('src1', 8), ('src2', 4), ('src3', 2), ('src4', 1))
SELECT r.doc_id, r.source FROM ranked r JOIN q USING (source)
WHERE r.rn <= q.quota
"""


def q_bigram_pmi(sf_dir):
    """Top-20 adjacent-bigram collocations by PMI with min count 5
    (stages/corpusfilters.py:bigram_pmi): value-count partials, tiny
    combined tables, pure mult/div/ln float64 mirrored in the SQL."""
    from ..stages import corpusfilters

    return corpusfilters.bigram_pmi(
        _t(sf_dir, "documents", columns=["text"]))


SQL_BIGRAM_PMI = r"""
WITH tokd AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
uni AS (SELECT unnest(toks) AS w FROM tokd),
ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM uni),
big AS (SELECT toks[i] AS a, toks[i+1] AS b
        FROM tokd, unnest(range(1, len(toks))) AS r(i)
        WHERE len(toks) >= 2),
bcnt AS (SELECT a, b, count(*) AS cab FROM big GROUP BY a, b),
btot AS (SELECT CAST(count(*) AS DOUBLE) AS bt FROM big)
SELECT a || ' ' || b AS bigram, CAST(cab AS BIGINT) AS n,
       round(ln((CAST(cab AS DOUBLE) / bt) /
                ((CAST(ua.c AS DOUBLE) / t)
                 * (CAST(ub.c AS DOUBLE) / t))), 6) AS pmi
FROM bcnt JOIN ucnt ua ON bcnt.a = ua.w JOIN ucnt ub ON bcnt.b = ub.w
CROSS JOIN tot CROSS JOIN btot
WHERE cab >= 5
ORDER BY pmi DESC, bigram
LIMIT 20
"""


FUNNEL_STAGES = ["view", "click", "purchase"]


def q_funnel(sf_dir):
    """Ordered funnel over the event stream: users completing
    view -> click -> purchase strictly in ts order, one count per
    stage prefix (stages/temporal.py:funnel_counts)."""
    from ..stages import temporal

    return temporal.funnel_counts(
        _t(sf_dir, "events", columns=["user_id", "ts", "event_type"]),
        key="user_id", ts="ts", type_col="event_type",
        stages=FUNNEL_STAGES,
        pre_blocks=temporal.TEMPORAL_PRE_BLOCKS_DOC)


SQL_FUNNEL = """
WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(e.ts) AS ts2
       FROM events e JOIN t1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > t1.ts1
       GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(e.ts) AS ts3
       FROM events e JOIN t2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
       GROUP BY e.user_id)
SELECT 'view' AS stage,
       CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_users
UNION ALL SELECT 'click', CAST((SELECT count(*) FROM t2) AS BIGINT)
UNION ALL SELECT 'purchase', CAST((SELECT count(*) FROM t3) AS BIGINT)
"""


def q_weighted_sample(sf_dir):
    """Deterministic weighted sampling (Efraimidis-Spirakis with
    hash-derived uniforms): top-20 documents by u^(1/n_chars)
    (stages/sampling.py:sample_weighted)."""
    from ..stages import sampling

    return sampling.sample_weighted(
        _t(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        key_col="doc_id", weight_col="n_chars", k=20)


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars,
       round(ln(((doc_id * 2654435761) % 4294967296 + 1.0)
                / 4294967297.0) / n_chars, 6) AS es_score
FROM documents
WHERE n_chars > 0
ORDER BY es_score DESC, doc_id
LIMIT 20
"""


def q_char_entropy(sf_dir):
    """Character-entropy quality signal per document
    (stages/textstats.py:char_entropy_batch) — pure streaming map."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(textstats.char_entropy_batch,
                          batch_format="pandas")


SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM documents WHERE length(text) > 0),
cnt AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k
        FROM chars GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(k) AS n FROM cnt GROUP BY doc_id)
SELECT t.doc_id, round(-sum((k / n) * ln(k / n)), 6) AS entropy
FROM cnt JOIN tot t USING (doc_id) GROUP BY t.doc_id
UNION ALL
SELECT doc_id, 0.0 AS entropy FROM documents WHERE length(text) = 0
"""


def q_events_rollup(sf_dir):
    """GROUPING-SETS rollup over (event_type, hour): per-cell, per-type
    and grand-total counts/sums in one result. ONE distributed groupby
    at the finest grain; the coarser levels are folded from that tiny
    aggregate (types x 24 rows) — never a second pass over the events.
    Subtotal markers: event_type='ALL', hour=-1. Value summed as exact
    1e-4 integers so every level agrees bit-for-bit."""
    ds = _t(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame({
            "event_type": df["event_type"],
            "hour": df["ts"].dt.hour.astype("int64"),
            "v": np.round(df["value"].to_numpy() * 10000.0).astype("int64")})
        # batch-local combine: <= types x 24 partial rows per task reach
        # the multi-key shuffle instead of every event row
        g = base.groupby(["event_type", "hour"], sort=False, as_index=False)
        out = g.agg(n=("v", "size"), v=("v", "sum"))
        return out.astype({"n": "int64", "v": "int64"})

    fine = ds.map_batches(prep, batch_format="pandas") \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n_events"),
                   Sum("v", alias_name="sum_value_e4")).to_pandas()
    by_type = fine.groupby("event_type", as_index=False)[
        ["n_events", "sum_value_e4"]].sum()
    by_type["hour"] = np.int64(-1)
    total = pd.DataFrame({
        "event_type": ["ALL"], "hour": np.int64(-1),
        "n_events": [fine["n_events"].sum()],
        "sum_value_e4": [fine["sum_value_e4"].sum()]})
    out = pd.concat([fine, by_type, total], ignore_index=True)
    return out[["event_type", "hour", "n_events", "sum_value_e4"]].astype(
        {"hour": "int64", "n_events": "int64", "sum_value_e4": "int64"})


SQL_EVENTS_ROLLUP = """
WITH base AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour,
         CAST(round(value * 10000) AS BIGINT) AS v
  FROM events)
SELECT coalesce(event_type, 'ALL') AS event_type,
       CAST(coalesce(hour, -1) AS BIGINT) AS hour,
       count(*) AS n_events,
       CAST(sum(v) AS BIGINT) AS sum_value_e4
FROM base
GROUP BY GROUPING SETS ((event_type, hour), (event_type), ())
"""


def q_stats_by_flag(sf_dir):
    """Grouped second-moment statistics over lineitem
    (stages/stats.py:grouped_moments — Chan/Welford mergeable partials,
    canonical merge order): per returnflag count, mean and sample
    stddev of quantity, Pearson corr(quantity, extendedprice)."""
    from ..stages import stats

    ds = _t(sf_dir, "lineitem",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = stats.grouped_moments(ds, key_col="l_returnflag",
                                x_col="l_quantity",
                                y_col="l_extendedprice")
    # one row per group survives the shuffle; finish driver-side
    df = out.to_pandas().rename(columns={"mean_x": "mean_qty",
                                         "std_x": "std_qty",
                                         "corr_xy": "corr_qty_price"})
    return df.sort_values("l_returnflag").reset_index(drop=True)


SQL_STATS_BY_FLAG = """
SELECT l_returnflag, count(*) AS n,
       round(avg(l_quantity), 6) AS mean_qty,
       round(stddev_samp(l_quantity), 6) AS std_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY 1
"""


def q_events_hopping(sf_dir):
    """Overlapping 30-min windows hopping every 15 min
    (stages/temporal.py:hopping_window_agg — per-batch replicate +
    pre-aggregate, one slim groupby shuffle); the overlapping
    complement of the tumbling events_hourly bucket."""
    from ..stages.temporal import hopping_window_agg

    ds = _t(sf_dir, "events", columns=["ts", "value"])
    return hopping_window_agg(ds, size_s=1800, hop_s=900).sort("win_start")


SQL_EVENTS_HOPPING = """
SELECT win_start, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM (
  SELECT CAST(floor(epoch(ts) / 900) * 900 - 900 * i AS BIGINT)
           AS win_start,
         value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
)
GROUP BY 1
"""


def q_distinct_users_by_type(sf_dir):
    """Exact count(distinct user_id) per event_type
    (stages/sketch.py:distinct_count_by_key — pair-hash partitioned
    dedup, no hot-key single task; the exact complement of the HLL
    estimate)."""
    from ..stages.sketch import distinct_count_by_key

    ds = _t(sf_dir, "events", columns=["event_type", "user_id"])
    return distinct_count_by_key(
        ds, key_col="event_type", val_col="user_id",
        out="n_users").sort("event_type")


SQL_DISTINCT_USERS_BY_TYPE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


OUTLIER_Z = 3.0


def q_value_outliers(sf_dir):
    """Per-group z-score outlier detection — the two-pass profile-then-
    filter shape: grouped moments (stages/stats.py — Chan-mergeable,
    stable) reduce to a tiny per-type (mean, std) table broadcast into
    a single streaming filter pass. Both sides threshold with the SAME
    6-dp-rounded stats so the boundary is bit-identical."""
    from ..stages import stats

    ds = _t(sf_dir, "events", columns=["event_id", "event_type", "value"])
    mom = stats.grouped_moments(ds, key_col="event_type",
                                x_col="value").to_pandas()
    mean = dict(zip(mom["event_type"], mom["mean_x"]))
    std = dict(zip(mom["event_type"], mom["std_x"]))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].map(mean).to_numpy(dtype=np.float64)
        s = df["event_type"].map(std).to_numpy(dtype=np.float64)
        z = np.abs(df["value"].to_numpy(dtype=np.float64) - m) / s
        out = df.loc[z > OUTLIER_Z,
                     ["event_id", "event_type", "value"]].copy()
        out["event_id"] = out["event_id"].astype("int64")
        return out

    return ds.map_batches(keep, batch_format="pandas")


SQL_VALUE_OUTLIERS = f"""
WITH s AS (SELECT event_type, round(avg(value), 6) AS m,
                  round(stddev_samp(value), 6) AS sd
           FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value
FROM events e JOIN s USING (event_type)
WHERE abs(e.value - s.m) / s.sd > {OUTLIER_Z}
"""


EWMA_DECAY = 0.9


def q_ewma_user_value(sf_dir):
    """Recency-weighted per-user value (stages/temporal.py:ewma_by_key
    — one coarse hash shuffle, vectorized sort + cumcount + power per
    partition): ewma = sum(value * decay^steps_after), the time-decay
    feature shape."""
    from ..stages.temporal import ewma_by_key

    ds = _t(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                       "value"])
    return ewma_by_key(ds, key="user_id", ts="ts",
                       order_tiebreak="event_id", value_col="value",
                       decay=EWMA_DECAY).sort("user_id")


SQL_EWMA_USER_VALUE = f"""
SELECT user_id, round(sum(value * pow({EWMA_DECAY}, rn)), 6) AS ewma
FROM (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) - 1
               AS rn
      FROM events)
GROUP BY user_id
"""


def q_hll_users_by_type(sf_dir):
    """Per-key HyperLogLog distinct estimate
    (stages/sketch.py:hll_by_key — batch-premaxed (key, register, rank)
    rows, associative max merge; fixed shuffle volume regardless of
    value cardinality, the web-scale complement of the exact
    distinct_users_by_type). SQL oracle: _hll_sql replays the sketch
    per key — the exact-integer estimator (hll_estimate) makes even
    the float estimate hash-matchable; error bound and exact-merge
    invariance stay pinned in tests/test_sketches.py."""
    from ..stages.sketch import hll_by_key

    ds = _t(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_by_key(ds, key_col="event_type",
                      val_col="user_id").sort("event_type")


ADAPTIVE_LO_P = 0.1
ADAPTIVE_HI_P = 0.9


def q_adaptive_filter(sf_dir):
    """Data-derived threshold filtering — the curation pattern where
    cutoffs come from the corpus itself, not constants: compute the
    exact p10/p90 length quantiles distributed
    (stages/sketch.py:exact_quantiles — value-histogram partials, raw
    column never leaves the tasks), then stream the corpus once more
    keeping only the middle band (drops truncation stubs and
    boilerplate monsters)."""
    from ..stages import sketch

    qs = sketch.exact_quantiles(
        _t(sf_dir, "documents", columns=["n_chars"]), "n_chars",
        [ADAPTIVE_LO_P, ADAPTIVE_HI_P])
    lo = int(qs["n_chars"].iloc[0])
    hi = int(qs["n_chars"].iloc[1])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["n_chars"] >= lo) & (df["n_chars"] <= hi)
        return df.loc[m, ["doc_id", "n_chars"]].astype(
            {"doc_id": "int64", "n_chars": "int64"})

    return _t(sf_dir, "documents", columns=["doc_id", "n_chars"]) \
        .map_batches(keep, batch_format="pandas")


SQL_ADAPTIVE_FILTER = f"""
WITH q AS (SELECT quantile_disc(n_chars, {ADAPTIVE_LO_P}) AS lo,
                  quantile_disc(n_chars, {ADAPTIVE_HI_P}) AS hi
           FROM documents)
SELECT doc_id, n_chars FROM documents, q
WHERE n_chars >= q.lo AND n_chars <= q.hi
"""


def q_model_score(sf_dir):
    """Batch model inference as a Ray stage: a fixed logistic quality
    model (engineered features -> sigmoid) scored vectorized per batch
    — the deterministic stand-in for classifier-based quality filtering
    (fastText/logreg scoring in published curation pipelines); swapping
    in learned weights changes nothing structurally. Scores rounded to
    6 dp (same float-parity contract as the BM25 oracle)."""
    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    w = MODEL_W

    def score(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n = text.str.len().to_numpy(dtype=np.float64)
        digits = text.str.count(r"[0-9]").to_numpy(dtype=np.float64)
        spaces = text.str.count(" ").to_numpy(dtype=np.float64)
        denom = np.where(n > 0, n, 1.0)
        z = (w["bias"] + w["ln_len"] * np.log1p(n)
             + w["space"] * (spaces / denom)
             + w["digit"] * (digits / denom))
        s = 1.0 / (1.0 + np.exp(-z))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "score": np.round(s, 6),
            "keep": s > 0.5})

    return ds.map_batches(score, batch_format="pandas")


SQL_MODEL_SCORE = f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(text) - length(replace(text, ' ', ''))
              AS DOUBLE) AS spaces,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
              AS DOUBLE) AS digits
  FROM documents),
z AS (
  SELECT doc_id,
         {MODEL_W['bias']} + {MODEL_W['ln_len']} * ln(1 + n)
           + {MODEL_W['space']} * (spaces / greatest(n, 1))
           + {MODEL_W['digit']} * (digits / greatest(n, 1)) AS z
  FROM f)
SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
       (1.0 / (1.0 + exp(-z))) > 0.5 AS keep
FROM z
"""


def q_bpe_tokens(sf_dir):
    """Train a BPE tokenizer on the corpus and count per-doc subword
    tokens (stages/bpe.py — ONE distributed wordcount, merge learning
    over the bounded vocab on the driver, broadcast-rank encode with a
    per-actor unique-word cache). Rows-only: greedy iterative merge
    learning isn't SQL-expressible; single-machine-reference parity,
    determinism and compression-monotonicity are pinned in
    tests/test_bpe.py."""
    from ..stages import bpe

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    wc = bpe.bpe_wordcounts(ds, max_words=4096)
    merges = bpe.bpe_train(wc, n_merges=200)
    return bpe.bpe_token_counts(ds, merges).sort("doc_id")


TRAIN_SHARD_BUDGET = 4096


def q_train_shards(sf_dir):
    """Token-budget training-shard assignment
    (stages/packing.py:token_shard_assign — exact distributed
    prefix-sum over the deterministic (knuth32(id), id) shuffle order;
    every shard holds ~budget tokens regardless of document lengths).
    Token counts use the reference's len//4 fallback counter
    (src/services/Gemini/gemini_service.py token estimate)."""
    from ..stages import packing

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].fillna("").str.len().to_numpy()
             .astype("int64") + 3) // 4
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_tok": np.maximum(1, n)})

    lens = ds.map_batches(toks, batch_format="pandas")
    return packing.token_shard_assign(
        lens, id_col="doc_id", tok_col="n_tok",
        budget=TRAIN_SHARD_BUDGET).sort("doc_id")


SQL_TRAIN_SHARDS = f"""
WITH t AS (
  SELECT doc_id,
         (doc_id * 2654435761) % 4294967296 AS h,
         CAST(greatest(1, (length(text) + 3) // 4) AS BIGINT) AS n_tok
  FROM documents)
SELECT doc_id, n_tok,
       CAST((sum(n_tok) OVER (ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
            // {TRAIN_SHARD_BUDGET} AS BIGINT) AS shard
FROM t
"""


SNAPSHOT_DROP_BELOW = 50      # old ids below this are absent from "new"
SNAPSHOT_EDIT_MOD = 7         # new text edited when doc_id % this == 0
SNAPSHOT_ADD_BELOW = 25       # ids < this re-added shifted by +10000


def q_snapshot_diff(sf_dir):
    """Corpus-version diff (stages/dedup.py:snapshot_diff — slim
    fingerprint rows, one coarse hash partition, vectorized outer merge
    per partition): old = documents; new = a deterministic edit
    (drop ids < 50, append ' v2' to text when id % 7 == 0, re-add
    ids < 25 shifted +10000). Each id classifies as
    added/removed/changed/unchanged — FULL OUTER JOIN semantics."""
    from ..stages import dedup as dedup_mod

    old = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def make_new(df: pd.DataFrame) -> pd.DataFrame:
        kept = df[df["doc_id"] >= SNAPSHOT_DROP_BELOW].copy()
        edit = (kept["doc_id"] % SNAPSHOT_EDIT_MOD == 0)
        kept.loc[edit, "text"] = kept.loc[edit, "text"] + " v2"
        readd = df[df["doc_id"] < SNAPSHOT_ADD_BELOW].copy()
        readd["doc_id"] = readd["doc_id"] + 10000
        return pd.concat([kept, readd], ignore_index=True)

    new = _t(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(make_new, batch_format="pandas")
    return dedup_mod.snapshot_diff(old, new).sort("doc_id")


SQL_SNAPSHOT_DIFF = f"""
WITH new AS (
  SELECT doc_id,
         CASE WHEN doc_id % {SNAPSHOT_EDIT_MOD} = 0 THEN text || ' v2'
              ELSE text END AS text
  FROM documents WHERE doc_id >= {SNAPSHOT_DROP_BELOW}
  UNION ALL
  SELECT doc_id + 10000, text FROM documents
  WHERE doc_id < {SNAPSHOT_ADD_BELOW})
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text = n.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM documents o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""


def q_props_rollup(sf_dir):
    """JSON property extraction + rollup: parse the events.props JSON
    column (vectorized regex on the single-key payload shape — the
    engine's balanced-JSON extractor handles the general nested case,
    functions/textproc.py:extract_balanced_json) and aggregate the 'k'
    property per event_type."""
    ds = _t(sf_dir, "events", columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False) \
            .astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "k": k}) \
            .groupby("event_type", sort=False, as_index=False) \
            .agg(n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max"))
        return g.astype({"n": "int64", "sum_k": "int64", "max_k": "int64"})

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_k", alias_name="sum_k"),
                   Max("max_k", alias_name="max_k"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"n": "int64", "sum_k": "int64",
                          "max_k": "int64"})

    return out.map_batches(finish, batch_format="pandas")


SQL_PROPS_ROLLUP = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS max_k
FROM events GROUP BY 1
"""


CURATION_QUOTAS = {f"src{i}": 5 for i in range(20)}
_CURATION_QUOTA_VALUES = ", ".join(
    f"('src{i}', 5)" for i in range(20))


def q_curation(sf_dir):
    """End-to-end curation flagship (pipelines/curation.py): fused
    quality signals -> threshold filter -> exact dedup keep-first ->
    per-domain quota mixture, ONE streaming pipeline with a single
    whole-pipeline DuckDB oracle over the exact surviving row set."""
    from . import curation

    return curation.curate(
        _t(sf_dir, "documents", columns=["doc_id", "source", "text"]),
        quotas=CURATION_QUOTAS)


# pad..kept CTE chain shared by SQL_CURATION and SQL_CURATION_FUZZY
_SQL_CURATION_KEPT_CTES = r"""pad AS (
  SELECT doc_id, source, text, ' ' || text || ' ' AS p
  FROM documents),
csig AS (
  SELECT doc_id, source, text,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n_tokens,
         (length(p) - length(replace(p, ' the ', ''))) // 5
       + (length(p) - length(replace(p, ' and ', ''))) // 5
       + (length(p) - length(replace(p, ' of ', ''))) // 4
       + (length(p) - length(replace(p, ' to ', ''))) // 4
       + (length(p) - length(replace(p, ' in ', ''))) // 4 AS en_hits
  FROM pad),
chars AS (SELECT doc_id, unnest(string_split(text, '')) AS c
          FROM documents WHERE length(text) > 0),
ccnt AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k
         FROM chars GROUP BY doc_id, c),
ctot AS (SELECT doc_id, sum(k) AS n FROM ccnt GROUP BY doc_id),
ent AS (SELECT t.doc_id, round(-sum((k / n) * ln(k / n)), 6) AS entropy
        FROM ccnt JOIN ctot t USING (doc_id) GROUP BY t.doc_id),
filt AS (
  SELECT s.doc_id, s.source, s.n_tokens, e.entropy, md5(s.text) AS fp
  FROM csig s JOIN ent e USING (doc_id)
  WHERE e.entropy >= 2.8 AND s.n_tokens >= 30 AND s.en_hits >= 3),
dedup AS (SELECT *, row_number() OVER (PARTITION BY fp
                                       ORDER BY doc_id) AS rn FROM filt),
kept AS (SELECT doc_id, source, n_tokens, entropy FROM dedup WHERE rn = 1)"""

SQL_CURATION = ("WITH " + _SQL_CURATION_KEPT_CTES + r""",
q(source, quota) AS (VALUES __QUOTAS__),
ranked AS (
  SELECT k.*, row_number() OVER (PARTITION BY source
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS qrn
  FROM kept k)
SELECT r.doc_id, r.source, r.n_tokens, r.entropy
FROM ranked r JOIN q USING (source) WHERE r.qrn <= q.quota
""").replace("__QUOTAS__", _CURATION_QUOTA_VALUES)

# exact+fuzzy curation: the same pad..kept chain, then MinHash near-dup
# keep-first OVER THE KEPT SUBSET ONLY (pairs with filtered-out docs must
# not steal cluster wins), then the per-domain quota mixture
SQL_CURATION_FUZZY = (
    "WITH RECURSIVE " + _SQL_CURATION_KEPT_CTES + r""",
fdocs AS (SELECT k.doc_id, d.text FROM kept k
          JOIN documents d USING (doc_id)),
""" + _sql_minhash_ctes(0.5, source_table="fdocs") + r""",
edges AS (
  SELECT doc_a AS node, doc_b AS nbr FROM mh_pairs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM mh_pairs
),
reach(node, anc) AS (
  SELECT node, nbr FROM edges
  UNION
  SELECT r.node, e.nbr FROM reach r JOIN edges e ON r.anc = e.node
),
losers AS (
  SELECT node FROM reach GROUP BY node HAVING min(anc) < node
),
surv AS (SELECT * FROM kept
         WHERE doc_id NOT IN (SELECT node FROM losers)),
q(source, quota) AS (VALUES __QUOTAS__),
ranked AS (
  SELECT s.*, row_number() OVER (PARTITION BY source
    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS qrn
  FROM surv s)
SELECT r.doc_id, r.source, r.n_tokens, r.entropy
FROM ranked r JOIN q USING (source) WHERE r.qrn <= q.quota
""").replace("__QUOTAS__", _CURATION_QUOTA_VALUES)


# word-budget chunker (reference rag_py.py:182-200) as a recursive CTE:
# one step per (blank-filtered) paragraph carrying the buffer string;
# spill emits trim(buffer) and seeds the next buffer with the last-50-word
# overlap; the final buffer lands after the loop; chunks under 20 words
# are dropped and indices assigned post-filter — exactly the Python
# semantics including the leading-"\n\n" first-paragraph quirk (the
# buffer enters through the fits-branch concat) and whole-emission of an
# oversized single paragraph.
_SQL_WS_SET = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"

SQL_CHUNK_DOCUMENTS_WORDS = rf"""
WITH RECURSIVE docs_p AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             regexp_split_to_array(
               regexp_replace(
                 trim(repeat(text || chr(10) || chr(10), 9), {_SQL_WS_SET}),
                 '\n?-+ PAGE BREAK -+\n?', chr(10) || chr(10), 'g'),
               '\n\s*\n'),
             p -> p),
           p -> trim(p, {_SQL_WS_SET}) <> '') AS paras
  FROM documents
),
step AS (
  SELECT doc_id, paras, 0::BIGINT AS i, ''::VARCHAR AS cur,
         NULL::VARCHAR AS emit
  FROM docs_p WHERE len(paras) > 0
  UNION ALL
  SELECT doc_id, paras, i + 1,
    CASE WHEN len(list_filter(regexp_split_to_array(cur, '\s+'),
                              x -> x <> ''))
            + len(list_filter(regexp_split_to_array(paras[i + 1], '\s+'),
                              x -> x <> '')) <= 300
           THEN cur || chr(10) || chr(10) || paras[i + 1]
         WHEN cur <> ''
           THEN (SELECT array_to_string(
                   w[greatest(1, len(w) - 49):len(w)], ' ')
                 FROM (SELECT list_filter(
                         regexp_split_to_array(cur, '\s+'),
                         x -> x <> '') AS w))
                || chr(10) || chr(10) || paras[i + 1]
         ELSE paras[i + 1] END,
    CASE WHEN len(list_filter(regexp_split_to_array(cur, '\s+'),
                              x -> x <> ''))
            + len(list_filter(regexp_split_to_array(paras[i + 1], '\s+'),
                              x -> x <> '')) > 300
              AND cur <> ''
           THEN trim(cur, {_SQL_WS_SET}) ELSE NULL END
  FROM step WHERE i < len(paras)
),
emitted AS (
  SELECT doc_id, i AS ord, emit AS chunk FROM step WHERE emit IS NOT NULL
  UNION ALL
  SELECT doc_id, len(paras) + 1, trim(cur, {_SQL_WS_SET})
  FROM step WHERE i = len(paras) AND trim(cur, {_SQL_WS_SET}) <> ''
),
kept AS (
  SELECT doc_id, ord, chunk
  FROM emitted
  WHERE len(list_filter(regexp_split_to_array(chunk, '\s+'),
                        x -> x <> '')) >= 20
)
SELECT doc_id,
       (row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1)::INT
         AS chunk_index,
       len(list_filter(regexp_split_to_array(chunk, '\s+'),
                       x -> x <> ''))::BIGINT AS n_words,
       length(chunk)::BIGINT AS n_chars,
       sha256(chunk) AS chunk_sha256
FROM kept
"""


def q_curation_fuzzy(sf_dir):
    """Exact+fuzzy curation (VERDICT r4 item 8): the curation pipeline
    with the MinHash near-dup keep-first leg enabled between exact dedup
    and the quota mixture — one whole-pipeline oracle covering quality
    filter, exact dedup, fuzzy dedup and mixture together."""
    from . import curation

    return curation.curate(
        _t(sf_dir, "documents", columns=["doc_id", "source", "text"]),
        quotas=CURATION_QUOTAS, fuzzy_threshold=0.5)


def _lsh_bucket_sql_expr(bits: int, col: str = "embedding") -> str:
    """SQL expression computing the hyperplane-LSH bucket EXACTLY as
    stages/similarity.lsh_bucket_of does: bit j set iff embedding·plane_j
    > 0. The seeded plane matrix (similarity._plane_matrix, seed 42) is
    deterministic, so its float64 values are inlined as SQL literals —
    the whole probe becomes DuckDB-checkable. Dim is pinned to the
    testdata embeddings schema (64); both sides compute dots in float64,
    so a sign flip would need |dot| at summation-order noise (~1e-13
    relative), vanishingly unlikely for random embeddings."""
    from ..stages.similarity import _plane_matrix

    planes = _plane_matrix(64, bits, 42)
    terms = []
    for j in range(bits):
        lits = ",".join(repr(float(v)) for v in planes[j])
        terms.append(
            f"(CASE WHEN list_inner_product({col}::DOUBLE[], [{lits}]) > 0.0"
            f" THEN {1 << j} ELSE 0 END)")
    return "(" + "\n + ".join(terms) + ")::BIGINT"


SQL_LSH_ANN = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         {_lsh_bucket_sql_expr(12)} AS bucket
  FROM embeddings
),
q AS (SELECT bucket AS qb, e AS qe FROM b WHERE vec_id = 0)
SELECT b.vec_id,
       round(list_cosine_similarity(b.e, q.qe), 6) AS cos_sim
FROM b, q
WHERE bit_count(xor(b.bucket, q.qb)) <= 2
ORDER BY round(list_cosine_similarity(b.e, q.qe), 6) DESC, b.vec_id
LIMIT 10
"""

SQL_COSINE_NEARDUP_LSH = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         {_lsh_bucket_sql_expr(6)} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       round(list_cosine_similarity(a.e, c.e), 6) AS cos_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE list_cosine_similarity(a.e, c.e) >= 0.3
"""

# --- spherical k-means replayed in SQL (ivf_ann / kmeans_clusters) ---
# Lloyd's with a FIXED iteration count is deterministic given the init,
# and the init (similarity.ivf_train_centroids) is rng.choice(seed 42)
# over the id-ordered `vec_id < sample` rows: with sample pinned to
# ORACLE_VEC_SAMPLE the chosen row indices are data-INDEPENDENT (ids are
# dense from 0 in every testdata sf dir — _assert_dense_prefix fails the
# pinned queries loud if that ever breaks), so —
# like the LSH hyperplanes above — they inline as SQL literals and the
# whole algorithm unrolls as one CTE chain per iteration: argmax-cosine
# assignment (ties -> lowest centroid id, numpy argmax order), per-
# cluster elementwise mean via zipped unnest, renormalize, empty
# clusters keep their previous centroid. Every CTE is MATERIALIZED:
# iteration t references t-1 twice, and DuckDB's default inlining makes
# the chain exponential. Both sides compute in float64; an assignment
# flip would need two centroid similarities within summation-order
# noise (~1e-13), vanishingly unlikely for random embeddings (verified
# exact-equal at sf0.001 and sf0.01).
ORACLE_VEC_SAMPLE = 500  # pinned id cutoff => 500 training rows at any sf
_VEC_DIM = 64            # testdata embeddings schema


def _init_centroid_ids(n_sample: int, k: int, seed: int = 42) -> list:
    """The init rows ivf_train_centroids picks: X is sorted by vec_id and
    ids are dense, so sample-row index == vec_id."""
    rng = np.random.RandomState(seed)
    return [int(i) for i in rng.choice(n_sample, size=k, replace=False)]


def _assert_dense_prefix(src: str, n: int = None) -> None:
    """Oracle-contract guard for the pinned-sample queries: the SQL side
    inlines rng.choice ROW INDICES as vec_id literals, which is only
    sound when the ids below the cutoff are dense from 0 (sample-row
    index == vec_id). The engine itself stays permissive (any id space
    works for rng.choice over len(X)); this fails loud at the query
    boundary instead of surfacing as a confusing hash mismatch. One
    pushed-down single-column read — microseconds at any sf."""
    n = n or ORACLE_VEC_SAMPLE
    t = pq.read_table(src, columns=["vec_id"],
                      filters=[("vec_id", "<", n)])
    ids = sorted(t.column("vec_id").to_pylist())
    if ids != list(range(len(ids))):
        raise ValueError(
            f"vec_ids below {n} in {src} are not dense from 0 "
            f"({len(ids)} rows, max {ids[-1] if ids else None}); the "
            "inlined-init SQL oracles require a gap-free id prefix")


_SQL_UNIT = ("list_transform({lst}, v -> v / "
             "(CASE WHEN {nrm} = 0 THEN 1.0 ELSE {nrm} END))")


def _kmeans_chain_sql(src_cte: str, iters: int, prefix: str, *,
                      init_ids=None, init_from: str = None,
                      metric: str = "cos", dim: int = None) -> str:
    """CTE chain c{prefix}0..c{prefix}{iters} of Lloyd rounds over
    ``src_cte`` rows (vec_id, e). Init either from inlined vec_id
    literals (``init_ids``) or from another chain's output CTE.
    ``metric='cos'`` is spherical (argmax dot, renormalized means —
    similarity.ivf_train_centroids / clustering.kmeans_fit);
    ``metric='l2'`` is plain Euclidean (argmin ||x-c||^2, raw means —
    pq._lloyd_np). Both break assignment ties toward the lowest
    centroid id, numpy arg{max,min} order."""
    if metric == "cos":
        order = "list_inner_product(s.e, c.v) DESC, c.cid"
    else:
        order = ("(list_inner_product(c.v, c.v)"
                 " - 2 * list_inner_product(s.e, c.v)) ASC, c.cid")
    if init_from is not None:
        parts = [f"\nc{prefix}0 AS MATERIALIZED "
                 f"(SELECT cid, v FROM {init_from})"]
    else:
        vals = ", ".join(f"({c}, {v})" for c, v in enumerate(init_ids))
        parts = [f"""
c{prefix}0 AS MATERIALIZED (
  SELECT i.cid, s.e AS v
  FROM (VALUES {vals}) AS i(cid, vid)
  JOIN {src_cte} s ON s.vec_id = i.vid)"""]
    new_v = (_SQL_UNIT.format(lst='r.raw', nrm='r.nrm')
             if metric == "cos" else "r.raw")
    for t in range(1, iters + 1):
        p, prev = f"{prefix}{t}", f"c{prefix}{t - 1}"
        parts.append(f"""
a{p} AS MATERIALIZED (
  SELECT vec_id, e, cl FROM (
    SELECT s.vec_id, s.e, c.cid AS cl,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY {order}) AS rn
    FROM {src_cte} s, {prev} c) z WHERE rn = 1),
m{p} AS MATERIALIZED (
  SELECT cl, pos, avg(val) AS mv
  FROM (SELECT cl, unnest(e) AS val,
               unnest(range(1, {(dim or _VEC_DIM) + 1})) AS pos
        FROM a{p}) u
  GROUP BY cl, pos),
r{p} AS MATERIALIZED (
  SELECT cl AS cid, raw, sqrt(list_inner_product(raw, raw)) AS nrm
  FROM (SELECT cl, list(mv ORDER BY pos) AS raw FROM m{p} GROUP BY cl) g),
c{prefix}{t} AS MATERIALIZED (
  SELECT p.cid,
         CASE WHEN r.raw IS NULL THEN p.v
              ELSE {new_v} END AS v
  FROM {prev} p LEFT JOIN r{p} r USING (cid))""")
    return ",".join(parts)


_SQL_VEC_BASE = f"""
xa AS MATERIALIZED (
  SELECT vec_id, {_SQL_UNIT.format(lst='embedding::DOUBLE[]', nrm='nrm')} AS e
  FROM (SELECT vec_id, embedding,
               sqrt(list_inner_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS nrm
        FROM embeddings) z),
xs AS MATERIALIZED (SELECT vec_id, e FROM xa
                    WHERE vec_id < {ORACLE_VEC_SAMPLE})"""


def _sql_ivf_ann(k_cent: int = 16, iters: int = 5, nprobe: int = 4,
                 k: int = 10) -> str:
    """stages/similarity.ivf_ann replayed: sample k-means quantizer,
    query's nprobe nearest cells, exact cosine among cell members, top-k
    by 6dp-rounded sim (id tiebreak), query row dropped AFTER the limit
    (q_ivf_ann semantics -> k-1 rows when vec 0 lands in the probe set).
    """
    chain = _kmeans_chain_sql(
        "xs", iters, "i",
        init_ids=_init_centroid_ids(ORACLE_VEC_SAMPLE, k_cent))
    return f"""
WITH {_SQL_VEC_BASE},{chain},
qv AS MATERIALIZED (SELECT e FROM xa WHERE vec_id = 0),
probe AS MATERIALIZED (
  SELECT cid FROM (
    SELECT c.cid, row_number() OVER (
      ORDER BY list_inner_product(q.e, c.v) DESC, c.cid) AS rn
    FROM ci{iters} c, qv q) z WHERE rn <= {nprobe}),
cand AS MATERIALIZED (
  SELECT vec_id, e FROM (
    SELECT x.vec_id, x.e, c.cid,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY list_inner_product(x.e, c.v) DESC, c.cid) AS rn
    FROM xa x, ci{iters} c) z
  WHERE rn = 1 AND cid IN (SELECT cid FROM probe)),
top AS MATERIALIZED (
  SELECT cand.vec_id,
         round(list_inner_product(cand.e, q.e), 6) AS cos_sim
  FROM cand, qv q
  ORDER BY cos_sim DESC, cand.vec_id
  LIMIT {k})
SELECT vec_id, cos_sim FROM top WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id
"""


def _sql_kmeans_clusters(k_cent: int = 8, init_iters: int = 5,
                         fit_iters: int = 8) -> str:
    """stages/clustering.kmeans_fit(tol=0) + kmeans_cluster_stats
    replayed: the 5-round sample quantizer init chain, then fit_iters
    full-corpus Lloyd rounds, then per-cluster (n_members, mean best
    sim). Only observed clusters are emitted — same as the engine's
    groupby."""
    init = _kmeans_chain_sql(
        "xs", init_iters, "s",
        init_ids=_init_centroid_ids(ORACLE_VEC_SAMPLE, k_cent))
    fit = _kmeans_chain_sql("xa", fit_iters, "f",
                            init_from=f"cs{init_iters}")
    return f"""
WITH {_SQL_VEC_BASE},{init},{fit},
fin AS MATERIALIZED (
  SELECT vec_id, cl, best FROM (
    SELECT x.vec_id, c.cid AS cl,
           list_inner_product(x.e, c.v) AS best,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY list_inner_product(x.e, c.v) DESC, c.cid) AS rn
    FROM xa x, cf{fit_iters} c) z WHERE rn = 1)
SELECT cl::BIGINT AS cluster, count(*)::BIGINT AS n_members,
       round(sum(best) / count(*), 6) AS mean_sim
FROM fin GROUP BY cl ORDER BY cl
"""


SQL_IVF_ANN = _sql_ivf_ann()
SQL_KMEANS_CLUSTERS = _sql_kmeans_clusters()


def _sql_semantic_dedup(k_cent: int = 16, iters: int = 5,
                        threshold: float = 0.3) -> str:
    """stages/semdedup.semantic_dedup_keep_first replayed: the pinned-
    sample quantizer chain, argmax-cosine cluster assignment, the
    within-cluster cosine>=threshold pair self-join (raw-float compare,
    same as the engine), then the SQL_NEARDUP_DEDUP recursive-components
    keep-first. One oracle serves both the driver-side union-find path
    and the distributed label-propagation path — they are parity-pinned.
    """
    chain = _kmeans_chain_sql(
        "xs", iters, "d",
        init_ids=_init_centroid_ids(ORACLE_VEC_SAMPLE, k_cent))
    return f"""
WITH RECURSIVE {_SQL_VEC_BASE},{chain},
asg AS MATERIALIZED (
  SELECT vec_id, e, cl FROM (
    SELECT x.vec_id, x.e, c.cid AS cl,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY list_inner_product(x.e, c.v) DESC, c.cid) AS rn
    FROM xa x, cd{iters} c) z WHERE rn = 1),
prs AS MATERIALIZED (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE list_inner_product(a.e, b.e) >= {threshold}),
edges AS (
  SELECT doc_a AS node, doc_b AS nbr FROM prs
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM prs),
reach(node, anc) AS (
  SELECT node, nbr FROM edges
  UNION
  SELECT r.node, e.nbr FROM reach r JOIN edges e ON r.anc = e.node),
losers AS (
  SELECT node FROM reach GROUP BY node HAVING min(anc) < node)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT node FROM losers)
ORDER BY vec_id
"""


SQL_SEMANTIC_DEDUP = _sql_semantic_dedup()


def _sql_pq_ann(m: int = 8, ksub: int = 16, iters: int = 10,
                k: int = 10) -> str:
    """stages/pq.pq_ann replayed: per-subspace Euclidean Lloyd codebooks
    (seed 42+j per subspace, pinned sample -> inlined init row ids),
    per-row nearest-codeword encode, ADC distance = sum over subspaces
    of ||codeword - query_subvector||^2, top-k by 6dp-rounded distance
    with the query row excluded BEFORE the limit (pq_ann exclude_ids
    semantics). Subvectors are 1-based inclusive list slices of the
    L2-normalized full vector."""
    dsub = _VEC_DIM // m
    parts, unions = [], []
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        chain = _kmeans_chain_sql(
            f"xsub{j}", iters, f"q{j}",
            init_ids=_init_centroid_ids(ORACLE_VEC_SAMPLE, ksub,
                                        seed=42 + j),
            metric="l2", dim=dsub)
        parts.append(f"""
xsub{j} AS MATERIALIZED (
  SELECT vec_id, e[{lo}:{hi}] AS e FROM xs),{chain},
xf{j} AS MATERIALIZED (
  SELECT vec_id, e[{lo}:{hi}] AS e FROM xa),
qs{j} AS MATERIALIZED (SELECT e FROM xf{j} WHERE vec_id = 0),
lut{j} AS MATERIALIZED (
  SELECT c.cid,
         list_inner_product(c.v, c.v) - 2 * list_inner_product(q.e, c.v)
         + list_inner_product(q.e, q.e) AS d
  FROM cq{j}{iters} c, qs{j} q),
enc{j} AS MATERIALIZED (
  SELECT vec_id, cl AS cid FROM (
    SELECT x.vec_id, c.cid AS cl,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY (list_inner_product(c.v, c.v)
                       - 2 * list_inner_product(x.e, c.v)) ASC,
                      c.cid) AS rn
    FROM xf{j} x, cq{j}{iters} c) z WHERE rn = 1)""")
        unions.append(
            f"SELECT e.vec_id, l.d FROM enc{j} e JOIN lut{j} l USING (cid)")
    body = "\n  UNION ALL\n  ".join(unions)
    return f"""
WITH {_SQL_VEC_BASE},{",".join(parts)},
dists AS MATERIALIZED (
  SELECT vec_id, sum(d) AS dist FROM (
  {body}) u GROUP BY vec_id)
SELECT vec_id, round(dist, 6) AS adc_dist FROM dists
WHERE vec_id <> 0
ORDER BY round(dist, 6), vec_id
LIMIT {k}
"""


SQL_PQ_ANN = _sql_pq_ann()

# The reference chunker (split on blank lines -> greedy buffer merge ->
# 80-char overlap prefix -> intra-doc first-occurrence dedupe,
# functions/textproc.py:45-92+178-192, reference chunking.py:6-61)
# reconstructed as a recursive CTE: one step per paragraph carrying
# (buffer, chunk counter), emitted buffers + the final buffer = base
# chunks, lag() applies the overlap prefix, a per-(doc, text)
# row_number marks duplicates. Chunk text parity is pinned via sha256
# (DuckDB has no sha1; the sha1-derived ids are golden-pinned in
# tests/test_textproc.py). Text amplified 9x on BOTH sides so
# merge/overlap/dup branches are actually exercised at sf0.01.
SQL_CHUNK_DOCUMENTS = r"""
WITH RECURSIVE docs_p AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             regexp_split_to_array(
               regexp_replace(repeat(text || chr(10) || chr(10), 9),
                              '\r\n?', chr(10), 'g'),
               '\n\s*\n'),
             p -> trim(p, ' ' || chr(9) || chr(10) || chr(13) || chr(12)
                            || chr(11))),
           p -> p <> '') AS paras
  FROM documents
),
step AS (
  SELECT doc_id, paras, 0::BIGINT AS i, ''::VARCHAR AS buf,
         0::BIGINT AS cidx, NULL::VARCHAR AS emit
  FROM docs_p WHERE len(paras) > 0
  UNION ALL
  SELECT doc_id, paras, i + 1,
    CASE WHEN buf = '' THEN paras[i + 1]
         WHEN length(buf) < 200
              OR length(buf) + 2 + length(paras[i + 1]) <= 1600
           THEN buf || chr(10) || chr(10) || paras[i + 1]
         ELSE paras[i + 1] END,
    CASE WHEN buf <> '' AND length(buf) >= 200
              AND length(buf) + 2 + length(paras[i + 1]) > 1600
           THEN cidx + 1 ELSE cidx END,
    CASE WHEN buf <> '' AND length(buf) >= 200
              AND length(buf) + 2 + length(paras[i + 1]) > 1600
           THEN buf ELSE NULL END
  FROM step WHERE i < len(paras)
),
base AS (
  SELECT doc_id, cidx - 1 AS chunk_idx, emit AS chunk
  FROM step WHERE emit IS NOT NULL
  UNION ALL
  SELECT doc_id, cidx, buf FROM step WHERE i = len(paras) AND buf <> ''
),
with_overlap AS (
  SELECT doc_id, chunk_idx,
         CASE WHEN prev IS NULL THEN chunk
              ELSE (CASE WHEN strpos(right(prev, 80), ' ') >= 2
                         THEN substr(right(prev, 80),
                                     strpos(right(prev, 80), ' ') + 1)
                         ELSE right(prev, 80) END) || ' ' || chunk END
           AS chunk
  FROM (SELECT doc_id, chunk_idx, chunk,
               lag(chunk) OVER (PARTITION BY doc_id
                                ORDER BY chunk_idx) AS prev
        FROM base)
)
SELECT doc_id, chunk_idx::INT AS chunk_index,
       (max(chunk_idx) OVER (PARTITION BY doc_id) + 1)::BIGINT
         AS total_chunks,
       sha256(chunk) AS chunk_sha256,
       length(chunk)::BIGINT AS n_chars,
       row_number() OVER (PARTITION BY doc_id, chunk
                          ORDER BY chunk_idx) > 1 AS is_duplicate
FROM with_overlap
"""


def queries() -> Dict[str, Callable]:
    """Registry in verification-priority order — a driver that checks a
    PREFIX of this dict hits the least-recently-verified entries first:
    (1) round-5 fixes and newly-SQL-checked entries (the r4 hard failure
    neardup_dedup_dist, the three rows-only->oracle promotions, the
    operators whose code changed this round), (2) queries last
    driver-checked in round 4, (3) round 2, (4) the round-3-green set."""
    names = [
        # (1) round-5 fixed / newly-oracled / code-touched this round
        "neardup_dedup_dist", "lsh_ann", "cosine_neardup_lsh",
        "chunk_documents", "chunk_documents_words", "curation_fuzzy",
        "hll_distinct_users", "hll_users_by_type", "json_repair",
        "rolling_fingerprint", "ivf_ann", "kmeans_clusters",
        "semantic_dedup", "semantic_dedup_dist", "pq_ann", "bm25_topk",
        "threshold_sweep", "dedup_mark_join", "dedup_mark_broadcast",
        "dedup_exact",
        # (2) last driver-checked in round 4
        "rrf_hybrid", "boolean_search", "inverted_index",
        "incremental_dedup", "duplicate_ngrams", "latest_event_per_user",
        "percent_rank", "knn_multi", "value_outliers", "mixture_sample",
        "weighted_sample", "bigram_pmi", "funnel", "char_entropy",
        "events_rollup", "curation",
        "bm25_from_index",
        "minhash_pairs_dist", "simhash_pairs_dist",
        "contamination", "pack_documents",
        "cms_event_counts", "tfidf_keywords",
        "ngram_novelty",
        # (3) last driver-checked in round 2/4
        "fingerprint", "token_count", "lang_id", "quality",
        "doc_type", "completeness", "filtered_knn", "knn_bruteforce",
        "cosine_neardup", "minhash_pairs", "simhash_pairs",
        "jaccard_pairs", "neardup_dedup",
        "doc_metadata", "media_features", "extract_pages",
        # (4) driver-green in round 3
        "agg_rollup", "filter_project", "topk_orders", "topk_per_group",
        "broadcast_join_agg", "hash_join_agg", "events_sessionize",
        "distinct_event_types", "status_counts", "events_by_user",
        "events_hourly", "asof_join", "range_join_bands",
        "rolling_user_value", "top_tokens", "nchars_quantiles",
        "events_window", "value_quantiles_by_type", "anti_join_customers",
        "stratified_sample", "profile_orders", "value_histogram",
        "events_pivot", "customer_activity", "gopher_repetition",
        "c4_quality", "pii_redact", "train_split", "orders_enriched",
        "unigram_nll", "boilerplate_scrub", "shuffle_rank",
        "tdigest_value_quantiles",
        "stats_by_flag", "events_hopping",
        "distinct_users_by_type", "snapshot_diff", "props_rollup",
        "train_shards", "bpe_tokens", "adaptive_filter", "model_score",
        "ewma_user_value",
    ]
    g = globals()
    return {n: g[f"q_{n}"] for n in names}


def oracle_sql() -> Dict[str, str]:
    return {
        "agg_rollup": SQL_AGG_ROLLUP,
        "filter_project": SQL_FILTER_PROJECT,
        "topk_orders": SQL_TOPK_ORDERS,
        "topk_per_group": SQL_TOPK_PER_GROUP,
        "broadcast_join_agg": SQL_BROADCAST_JOIN_AGG,
        "hash_join_agg": SQL_HASH_JOIN_AGG,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "distinct_event_types": SQL_DISTINCT_EVENT_TYPES,
        "status_counts": SQL_STATUS_COUNTS,
        "events_by_user": SQL_EVENTS_BY_USER,
        "events_hourly": SQL_EVENTS_HOURLY,
        "asof_join": SQL_ASOF_JOIN,
        "range_join_bands": SQL_RANGE_JOIN_BANDS,
        "rolling_user_value": SQL_ROLLING_USER_VALUE,
        "top_tokens": SQL_TOP_TOKENS,
        "nchars_quantiles": SQL_NCHARS_QUANTILES,
        "events_window": SQL_EVENTS_WINDOW,
        "value_quantiles_by_type": SQL_VALUE_QUANTILES_BY_TYPE,
        "anti_join_customers": SQL_ANTI_JOIN_CUSTOMERS,
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "profile_orders": SQL_PROFILE_ORDERS,
        "value_histogram": SQL_VALUE_HISTOGRAM,
        "events_pivot": SQL_EVENTS_PIVOT,
        "customer_activity": SQL_CUSTOMER_ACTIVITY,
        "gopher_repetition": SQL_GOPHER_REPETITION,
        "c4_quality": SQL_C4_QUALITY,
        "pii_redact": SQL_PII_REDACT,
        "train_split": SQL_TRAIN_SPLIT,
        "orders_enriched": SQL_ORDERS_ENRICHED,
        "unigram_nll": SQL_UNIGRAM_NLL,
        "boilerplate_scrub": SQL_BOILERPLATE_SCRUB,
        "shuffle_rank": SQL_SHUFFLE_RANK,
        "pack_documents": SQL_PACK_DOCUMENTS,
        "contamination": SQL_CONTAMINATION,
        "cms_event_counts": SQL_CMS_EVENT_COUNTS,
        "inverted_index": SQL_INVERTED_INDEX,
        "bm25_topk": SQL_BM25_TOPK,
        "bm25_from_index": SQL_BM25_TOPK,
        "tfidf_keywords": SQL_TFIDF_KEYWORDS,
        "threshold_sweep": SQL_THRESHOLD_SWEEP,
        "ngram_novelty": SQL_NGRAM_NOVELTY,
        "dedup_mark_join": SQL_DEDUP_MARK,
        "dedup_mark_broadcast": SQL_DEDUP_MARK,
        "minhash_pairs_dist": SQL_MINHASH_PAIRS,
        "simhash_pairs_dist": SQL_SIMHASH_PAIRS,
        "neardup_dedup_dist": SQL_NEARDUP_DEDUP,
        # semantic_dedup_dist: iterative k-means, rows-only like
        # semantic_dedup (distributed/driver parity in test_semdedup.py)
        "boolean_search": SQL_BOOLEAN_SEARCH,
        "rrf_hybrid": SQL_RRF_HYBRID,
        "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
        "duplicate_ngrams": SQL_DUPLICATE_NGRAMS,
        "incremental_dedup": SQL_INCREMENTAL_DEDUP,
        "mixture_sample": SQL_MIXTURE_SAMPLE,
        "bigram_pmi": SQL_BIGRAM_PMI,
        "funnel": SQL_FUNNEL,
        "weighted_sample": SQL_WEIGHTED_SAMPLE,
        "char_entropy": SQL_CHAR_ENTROPY,
        "events_rollup": SQL_EVENTS_ROLLUP,
        "stats_by_flag": SQL_STATS_BY_FLAG,
        "events_hopping": SQL_EVENTS_HOPPING,
        "distinct_users_by_type": SQL_DISTINCT_USERS_BY_TYPE,
        "snapshot_diff": SQL_SNAPSHOT_DIFF,
        "props_rollup": SQL_PROPS_ROLLUP,
        "train_shards": SQL_TRAIN_SHARDS,
        "adaptive_filter": SQL_ADAPTIVE_FILTER,
        "model_score": SQL_MODEL_SCORE,
        "ewma_user_value": SQL_EWMA_USER_VALUE,
        "value_outliers": SQL_VALUE_OUTLIERS,
        "knn_multi": SQL_KNN_MULTI,
        "percent_rank": SQL_PERCENT_RANK,
        "curation": SQL_CURATION,
        "dedup_exact": SQL_DEDUP_EXACT,
        "fingerprint": SQL_FINGERPRINT,
        "token_count": SQL_TOKEN_COUNT,
        "lang_id": SQL_LANG_ID,
        "quality": SQL_QUALITY,
        "doc_type": SQL_DOC_TYPE,
        "completeness": SQL_COMPLETENESS,
        "filtered_knn": SQL_FILTERED_KNN,
        "knn_bruteforce": SQL_KNN_BRUTEFORCE,
        "cosine_neardup": SQL_COSINE_NEARDUP,
        "jaccard_pairs": SQL_JACCARD_PAIRS,
        "simhash_pairs": SQL_SIMHASH_PAIRS,
        "minhash_pairs": SQL_MINHASH_PAIRS,
        "neardup_dedup": SQL_NEARDUP_DEDUP,
        "lsh_ann": SQL_LSH_ANN,
        "cosine_neardup_lsh": SQL_COSINE_NEARDUP_LSH,
        "chunk_documents": SQL_CHUNK_DOCUMENTS,
        "chunk_documents_words": SQL_CHUNK_DOCUMENTS_WORDS,
        "curation_fuzzy": SQL_CURATION_FUZZY,
        "hll_distinct_users": SQL_HLL_DISTINCT_USERS,
        "hll_users_by_type": SQL_HLL_USERS_BY_TYPE,
        "json_repair": SQL_JSON_REPAIR,
        "rolling_fingerprint": SQL_ROLLING_FINGERPRINT,
        "ivf_ann": SQL_IVF_ANN,
        "kmeans_clusters": SQL_KMEANS_CLUSTERS,
        "semantic_dedup": SQL_SEMANTIC_DEDUP,
        "semantic_dedup_dist": SQL_SEMANTIC_DEDUP,
        "pq_ann": SQL_PQ_ANN,
        # doc_metadata/media_features/extract_pages: non-SQL-expressible
        # -> rows-only checks (goldens pinned in tests/test_textproc.py
        # and tests/test_multimodal.py instead)
    }
