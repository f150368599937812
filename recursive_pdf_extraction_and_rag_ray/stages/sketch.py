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


# ---------------------------------------------------------------------------
# mergeable approximate sketches: Count-Min and HyperLogLog
# ---------------------------------------------------------------------------
# The exact operators above are bounded by distinct-value cardinality;
# these two are bounded by a FIXED sketch size regardless of cardinality
# — the shape that still works when the value space itself is web-scale.
# Both partials merge with one elementwise op (sum / max), so the whole
# reduction is a handful of numpy folds over task outputs: no groupby,
# no shuffle, no driver-sized state. (Cormode & Muthukrishnan 2005;
# Flajolet et al. 2007 — public constructions.)

CMS_DEPTH = 4
CMS_WIDTH = 16384
HLL_P = 12                     # 2^12 registers, ~1.6% standard error
_SKETCH_SEEDS = np.uint64([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                           0x165667B19E3779F9, 0x27D4EB2F165667C5])


def _mix64(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    """splitmix64-style avalanche over a uint64 array (vectorized)."""
    x = (x + seed).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x = x * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hash_values(s: pd.Series) -> np.ndarray:
    """uint64 hash of any column: pandas' C siphash for objects,
    identity-mix for ints (stable across processes, like
    corpusfilters._batch_word_hashes)."""
    v = s.to_numpy()
    if v.dtype.kind in "iu":
        return v.astype(np.uint64)
    return pd.util.hash_array(v.astype(object)).astype(np.uint64)


def cms_build(ds: "ray.data.Dataset", *, col: str,
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> np.ndarray:
    """Count-Min sketch of a column: each batch scatter-adds its value
    counts into a (depth, width) int64 grid; grids SUM into the corpus
    sketch (associative, order-free). Fixed memory, any cardinality."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_values(df[col])
        grid = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            idx = (_mix64(h, _SKETCH_SEEDS[d]) % np.uint64(width)) \
                .astype(np.int64)
            np.add.at(grid[d], idx, 1)
        return pd.DataFrame({"sketch": [grid.tobytes()]})

    grids = [np.frombuffer(b, dtype=np.int64).reshape(depth, width)
             for t in ds.select_columns([col])
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)
             for b in t["sketch"]]
    if not grids:
        return np.zeros((depth, width), dtype=np.int64)
    return np.sum(grids, axis=0)


def cms_query(sketch: np.ndarray, values: pd.Series) -> np.ndarray:
    """Point-estimate counts: min over rows of the sketch cells. Never
    underestimates the true count; overestimate bounded by eps*N with
    eps = e/width at confidence 1 - e^-depth."""
    depth, width = sketch.shape
    h = _hash_values(values)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = (_mix64(h, _SKETCH_SEEDS[d]) % np.uint64(width)) \
            .astype(np.int64)
        est = np.minimum(est, sketch[d][idx])
    return est


def hll_build(ds: "ray.data.Dataset", *, col: str,
              p: int = HLL_P) -> np.ndarray:
    """HyperLogLog registers for a column: per-batch register arrays
    MERGE by elementwise max (associative, idempotent — double-counting
    safe, which also makes the sketch resumable for free)."""
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _mix64(_hash_values(df[col]), _SKETCH_SEEDS[0])
        reg_idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        # rank = leading zeros of the remaining bits + 1, via bit length
        lz = np.zeros(len(h), dtype=np.int64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, reg_idx, (lz + 1).astype(np.int8))
        return pd.DataFrame({"sketch": [regs.tobytes()]})

    regs = np.zeros(m, dtype=np.int8)
    for t in ds.select_columns([col]) \
            .map_batches(partial, batch_format="pandas") \
            .iter_batches(batch_format="pandas", batch_size=65536):
        for b in t["sketch"]:
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.int8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet et al. 2007 estimator with the standard small-range
    (linear counting) correction.

    The register sum is computed as the EXACT integer
    ``S = sum(2^(64-r))`` (every term and the sum are exact Python
    ints), so the estimate ``alpha*m^2*2^64 / S`` is a pure order-free
    function of the register multiset: bit-identical across partial
    merge orders AND reproducible by the DuckDB oracle, which mirrors
    the same integer sum in HUGEINT (pipelines/queries.py:_hll_sql).
    A float accumulation here would make the value depend on summation
    order — unverifiable, and subtly nondeterministic under re-merge."""
    import math

    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    vals, cnts = np.unique(regs.astype(np.int64), return_counts=True)
    s = sum(int(c) << max(0, 64 - int(v)) for v, c in zip(vals, cnts))
    est = alpha * m * m * 18446744073709551616.0 / float(s)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return float(est)


# --- t-digest: mergeable quantile sketch -------------------------------------
#
# The exact quantile operators above are bounded by the VALUE-SPACE
# cardinality; over a continuous column (latencies, scores, byte sizes)
# at 100 TB that bound is gone. The t-digest (Dunning & Ertl 2019,
# arXiv:1902.04023 — public method) is the one-pass mergeable answer:
# each task compresses its batch to <= ~delta weighted centroids sized
# by the k1 scale function (tiny centroids at the tails, so extreme
# quantiles stay sharp), and partials merge associatively into one
# digest of <= delta centroids. Rank error is O(q(1-q)/delta).

TDIGEST_DELTA = 200


def _k1_qbins(delta: int) -> np.ndarray:
    """Monotone q-space bin edges from the k1 scale function
    k(q) = (delta/2pi) asin(2q-1): fine at the tails, coarse in the
    middle. Edges cover [0, 1] inclusive."""
    i = np.arange(delta + 1, dtype=np.float64)
    return 0.5 * (1.0 + np.sin(np.pi * (i / delta - 0.5)))


def _batch_centroids(vals: np.ndarray, delta: int) -> pd.DataFrame:
    """Compress one batch to <= delta (mean, weight) centroids with one
    sort + one vectorized reduceat — no Python loop over rows."""
    v = np.sort(vals[~np.isnan(vals)], kind="mergesort")
    n = len(v)
    if n == 0:
        return pd.DataFrame({"mean": pd.Series([], dtype="float64"),
                             "weight": pd.Series([], dtype="float64")})
    edges = np.unique(np.clip(np.round(_k1_qbins(delta) * n), 0,
                              n).astype(np.int64))
    starts = edges[:-1]
    counts = np.diff(edges).astype(np.float64)
    sums = np.add.reduceat(v, starts)
    return pd.DataFrame({"mean": sums / counts, "weight": counts})


def _tdigest_compress(means: np.ndarray, weights: np.ndarray,
                      delta: int) -> pd.DataFrame:
    """Merge sorted-by-mean centroids while each merged centroid's
    k1-size stays <= 1 — the standard t-digest merge pass. Sequential,
    but only over centroids (<= n_partials x delta rows), never raw
    data."""
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    scale = delta / (2.0 * np.pi)

    def k(q: float) -> float:
        return scale * np.arcsin(2.0 * min(max(q, 0.0), 1.0) - 1.0)

    out_m: List[float] = []
    out_w: List[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    for m, w in zip(means[1:], weights[1:]):
        if k((w_before + cur_w + w) / total) - k(w_before / total) <= 1.0:
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return pd.DataFrame({"mean": np.float64(out_m),
                         "weight": np.float64(out_w)})


def tdigest_build(ds: "ray.data.Dataset", col: str, *,
                  delta: int = TDIGEST_DELTA,
                  distributed: bool = False) -> pd.DataFrame:
    """One streaming pass -> a (mean, weight) digest of <= ~delta rows.
    Per-batch compression is vectorized; the combine is over centroid
    rows only (n_batches x delta, ~KBs per TB of input). Driver path:
    one merge pass. ``distributed=True``: pre-merge per coarse hash
    partition in tasks first (tree reduce), then the tiny final pass —
    for when even the centroid partials outgrow one machine. The two
    paths differ bit-for-bit (approximate merging is order-dependent)
    but satisfy the same rank-error bound (test-pinned)."""
    parts = ds.select_columns([col]).map_batches(
        lambda df: _batch_centroids(df[col].to_numpy(np.float64), delta),
        batch_format="pandas")
    if distributed:
        def with_pk(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            h = pd.util.hash_array(df["mean"].to_numpy())
            df["_pk"] = (h % SKETCH_REDUCE_PARTITIONS).astype("int64")
            return df

        parts = parts.map_batches(with_pk, batch_format="pandas") \
            .groupby("_pk").map_groups(
                lambda df: _tdigest_compress(
                    df["mean"].to_numpy(), df["weight"].to_numpy(), delta),
                batch_format="pandas")
    frames = [f for f in parts.iter_batches(batch_format="pandas",
                                            batch_size=65536) if len(f)]
    if not frames:
        return pd.DataFrame({"mean": pd.Series([], dtype="float64"),
                             "weight": pd.Series([], dtype="float64")})
    allc = pd.concat(frames, ignore_index=True)
    return _tdigest_compress(allc["mean"].to_numpy(),
                             allc["weight"].to_numpy(), delta)


def tdigest_quantile(digest: pd.DataFrame,
                     qs: Sequence[float]) -> np.ndarray:
    """Estimate quantiles from a digest by interpolating the cumulative
    centroid weights at centroid midpoints (standard t-digest read)."""
    if not len(digest):
        return np.full(len(qs), np.nan)
    m = digest["mean"].to_numpy(np.float64)
    w = digest["weight"].to_numpy(np.float64)
    total = w.sum()
    cum = np.cumsum(w) - w / 2.0
    return np.interp(np.asarray(qs, dtype=np.float64) * total, cum, m)


def distinct_count_by_key(ds: "ray.data.Dataset", *, key_col: str,
                          val_col: str, out: str = "n_distinct",
                          buckets: int = 256) -> "ray.data.Dataset":
    """EXACT count(distinct val) per key — the deterministic complement
    of the HLL estimate. Per-batch pair dedup shrinks the stream first,
    then pairs shuffle by a coarse PAIR-hash bucket (a hot key's
    distinct values spread across ~``buckets`` tasks, never one hot
    group; a (key, val) pair always lands in one bucket, so the
    per-bucket vectorized dedup+count is exact), and per-bucket per-key
    counts sum in a final slim groupby. Single-int-key shuffles only:
    Ray's multi-column sort shuffle is ~10x slower than the same rows
    under one int64 key (measured 21 s vs 2 s on 600k rows)."""
    import pandas.util as pdu

    salt = np.int64(-7046029254386353131)  # odd 64-bit mixing constant

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[[key_col, val_col]].drop_duplicates()
        h = (pdu.hash_pandas_object(pairs[key_col], index=False)
             .to_numpy().astype("int64")
             ^ (pairs[val_col].to_numpy().astype("int64") * salt))
        pairs = pairs.copy()
        pairs["bucket"] = (h % buckets).astype("int64")
        return pairs

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g[[key_col, val_col]].drop_duplicates()
        r = u.groupby(key_col, sort=True).size().rename("n").reset_index()
        r["n"] = r["n"].astype("int64")
        return r

    per_bucket = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(bucket_counts, batch_format="pandas")

    agg = per_bucket.groupby(key_col).aggregate(
        ray.data.aggregate.Sum("n", alias_name=out))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out] = df[out].astype("int64")
        return df[[key_col, out]]

    return agg.map_batches(finish, batch_format="pandas")


def hll_by_key(ds: "ray.data.Dataset", *, key_col: str, val_col: str,
               p: int = HLL_P,
               out: str = "n_distinct_est") -> "ray.data.Dataset":
    """HyperLogLog distinct-count PER KEY — the fixed-size complement of
    ``distinct_count_by_key``: the exact operator shuffles one row per
    distinct (key, val) pair, which at web scale is the corpus; this
    one shuffles at most ``keys x 2^p`` slim (key, register, rank)
    rows per batch REGARDLESS of value cardinality, pre-maxed
    batch-locally. Register merge is an elementwise max (associative,
    idempotent — double-counting safe), so the per-key reduce is one
    vectorized groupby-max; +/-1.6% standard error at p=12 (pinned in
    tests)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                                 "reg": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64")})
        h = _mix64(_hash_values(df[val_col]), _SKETCH_SEEDS[0])
        reg_idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        lz = np.zeros(len(h), dtype=np.int64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        g = pd.DataFrame({key_col: df[key_col].to_numpy(),
                          "reg": reg_idx, "rank": lz + 1}) \
            .groupby([key_col, "reg"], sort=False, as_index=False)["rank"] \
            .max()
        return g.astype({"reg": "int64", "rank": "int64"})

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        m = 1 << p
        regs = np.zeros(m, dtype=np.int8)
        mx = g.groupby("reg")["rank"].max()
        regs[mx.index.to_numpy()] = np.minimum(mx.to_numpy(), 127) \
            .astype(np.int8)
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             out: pd.Series([round(hll_estimate(regs))],
                                            dtype="int64")})

    return ds.select_columns([key_col, val_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby(key_col).map_groups(estimate, batch_format="pandas")
