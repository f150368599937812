"""Sequence packing and deterministic global ordering — the two ops
between a curated corpus and a training dataloader.

- :func:`pack_sequences` — assign documents to fixed-token-budget packs
  (the "sequence packing" step of LLM pretraining dataloaders: concat
  short documents up to the context length to avoid pad waste). Greedy
  first-fit in stable id order WITHIN a hash partition, so the
  assignment is deterministic given the id set — independent of block
  layout, run order, and engine — while staying fully distributed (one
  hash shuffle, packs never cross partitions).
- :func:`global_rank` — exact dense global rank by an int64 key (SQL
  ``row_number() OVER (ORDER BY key, tiebreak) - 1``), the building
  block for a deterministic training-order shuffle: rank by
  ``hash(doc_id)`` and you have a reproducible global permutation
  without ever materializing the corpus in one place. Two passes:
  a bounded per-bucket histogram (monotone value bucketing, offsets via
  one small cumsum broadcast in the closure), then per-bucket local
  sort + offset. Equal keys land in the same bucket by construction.

Neither exists in the reference (its unit of work is one PDF); both are
required the moment extracted text feeds a trainer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

PACK_PARTITIONS = 256          # packs never span a partition
RANK_BUCKETS = 4096            # pass-1 histogram width


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def _knuth32(keys: np.ndarray) -> np.ndarray:
    return (keys.astype("int64") * 2654435761) % (1 << 32)


def pack_sequences(ds, *, id_col: str, len_col: str, budget: int,
                   partitions: int = PACK_PARTITIONS):
    """Greedy first-fit packing in ascending ``id_col`` order within each
    of ``partitions`` hash partitions. Returns one row per input row:
    (id_col, len_col, pack_id, pack_pos, pack_offset) where ``pack_id``
    is globally unique (partition * 2^32 + local sequence), ``pack_pos``
    is the doc's index within its pack and ``pack_offset`` the token
    offset where it starts. Docs with len > budget get a pack of their
    own (flagged by pack_pos == 0 and len > budget — the caller decides
    truncate vs skip; packing never drops rows).

    Greedy-in-id-order (not first-fit-decreasing) is deliberate: the
    output is a pure function of the (id, len) SET, so reruns and
    different block layouts produce byte-identical packs. Waste vs FFD
    is a few percent at realistic budget/len ratios."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def add_pk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, len_col]].copy()
        df["_pk"] = (_knuth32(df[id_col].to_numpy())
                     % partitions).astype("int64")
        return df

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        lens = np.minimum(g[len_col].to_numpy().astype("int64"), budget)
        # vectorized greedy fill: cumulative sum with reset on overflow
        # has a sequential dependency, but it's numpy-at-C-speed via a
        # running loop over the PARTITION (bounded rows), not the corpus
        pack = np.zeros(len(g), dtype="int64")
        pos = np.zeros(len(g), dtype="int64")
        off = np.zeros(len(g), dtype="int64")
        cur_pack, cur_pos, cur_off = 0, 0, 0
        for i in range(len(g)):
            if cur_off + lens[i] > budget and cur_pos > 0:
                cur_pack += 1
                cur_pos = 0
                cur_off = 0
            pack[i], pos[i], off[i] = cur_pack, cur_pos, cur_off
            cur_pos += 1
            cur_off += lens[i]
        pk = int(g["_pk"].iloc[0])
        return pd.DataFrame({
            id_col: g[id_col].astype("int64"),
            len_col: g[len_col].astype("int64"),
            "pack_id": (pk << 32) + pack,
            "pack_pos": pos,
            "pack_offset": off,
        })

    return ds.map_batches(add_pk, batch_format="pandas") \
        .groupby("_pk").map_groups(pack_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact global rank
# ---------------------------------------------------------------------------

def global_rank(ds, *, by: str, tiebreak: str, out: str = "rank",
                buckets: int = RANK_BUCKETS,
                lo: Optional[int] = None, hi: Optional[int] = None):
    """Dense 0-based global rank over (``by``, ``tiebreak``) — exactly
    SQL ``row_number() OVER (ORDER BY by, tiebreak) - 1``. Keeps all
    input columns.

    Pass 1 computes a ``buckets``-wide histogram of ``by`` (per-batch
    bincount partials; bucket edges from [lo, hi], fetched with one
    min/max aggregate when not supplied) whose cumsum gives every
    bucket's global starting offset — a ``buckets``-sized array shipped
    in the task closure. Pass 2 hash-shuffles rows once by bucket and
    ranks each bucket locally (sort + arange + offset). Monotone
    bucketing keeps equal keys in one bucket, so local order + global
    offset is exact.

    Skew note: buckets are value-ranges, not hash ranges — a heavily
    repeated key concentrates its rows in one bucket/task. The intended
    use (rank by a well-mixed hash for deterministic training-order
    shuffles) is uniform by construction; for skewed keys widen
    ``buckets`` or pre-salt upstream."""
    if lo is None or hi is None:
        from ray.data.aggregate import Max, Min
        mm = ds.aggregate(Min(by), Max(by))
        lo = int(mm[f"min({by})"]) if lo is None else lo
        hi = int(mm[f"max({by})"]) if hi is None else hi
    span = max(1, hi - lo + 1)

    def bucket_of(v: np.ndarray) -> np.ndarray:
        # monotone, clamped: equal values -> equal bucket
        b = ((v.astype("float64") - lo) * buckets / span).astype("int64")
        return np.clip(b, 0, buckets - 1)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = bucket_of(df[by].to_numpy())
        return pd.DataFrame({
            "b": np.arange(buckets, dtype="int64"),
            "n": np.bincount(b, minlength=buckets).astype("int64")})

    parts = pd.concat(
        list(ds.select_columns([by])
             .map_batches(hist_partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    counts = parts.groupby("b")["n"].sum().reindex(
        range(buckets), fill_value=0).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = bucket_of(df[by].to_numpy())
        return df

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, tiebreak], kind="mergesort") \
            .reset_index(drop=True)
        base = int(offsets[int(g["_rb"].iloc[0])])
        g[out] = base + np.arange(len(g), dtype="int64")
        return g.drop(columns=["_rb"])

    return ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_rb").map_groups(rank_bucket, batch_format="pandas")


def token_shard_assign(ds, *, id_col: str, tok_col: str, budget: int,
                       buckets: int = RANK_BUCKETS):
    """Assign every row to a fixed-token-budget training shard:
    ``shard = floor(running_token_total_before_row / budget)`` where the
    running total walks the corpus in deterministic shuffled order
    (knuth32(id), id) — exactly the SQL window
    ``(sum(tok) OVER (ORDER BY h, id) - tok) // budget``. The
    dataloader-export step: shard boundaries land on token counts, not
    row counts, so every output shard trains the same number of tokens.

    Same two-pass exact-prefix shape as ``global_rank``, with token
    SUMS instead of row counts: pass 1 reduces each monotone hash-range
    bucket to its token subtotal (per-batch bincount-weighted partials;
    a ``buckets``-sized array of offsets ships in the closure), pass 2
    shuffles once by bucket and cumsums locally + offset. The hash
    order is uniform by construction, so buckets are balanced."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    span = 1 << 32

    def bucket_of(h: np.ndarray) -> np.ndarray:
        return (h * buckets) // span

    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _knuth32(df[id_col].to_numpy())
        b = bucket_of(h)
        tok = df[tok_col].to_numpy().astype("int64")
        return pd.DataFrame({
            "b": np.arange(buckets, dtype="int64"),
            "t": np.bincount(b, weights=tok,
                             minlength=buckets).astype("int64")})

    parts = pd.concat(
        list(ds.select_columns([id_col, tok_col])
             .map_batches(sum_partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=65536)),
        ignore_index=True)
    sums = parts.groupby("b")["t"].sum().reindex(
        range(buckets), fill_value=0).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, tok_col]].copy()
        h = _knuth32(out[id_col].to_numpy())
        out["_h"] = h
        out["_sb"] = bucket_of(h)
        return out

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col], kind="mergesort") \
            .reset_index(drop=True)
        tok = g[tok_col].to_numpy().astype("int64")
        base = int(offsets[int(g["_sb"].iloc[0])])
        before = base + np.cumsum(tok) - tok
        return pd.DataFrame({
            id_col: g[id_col].astype("int64"),
            tok_col: tok,
            "shard": (before // budget).astype("int64")})

    return ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_sb").map_groups(assign, batch_format="pandas")


def write_training_shards(docs, assignment, *, out_dir: str,
                          id_col: str = "doc_id",
                          tok_col: str = "n_tok") -> "pd.DataFrame":
    """Join shard assignments back onto full rows and write one
    hive-partitioned parquet directory per shard (resumable layout: a
    re-run overwrites whole shard directories, never one giant file).
    Returns the manifest (shard, n_docs, n_tokens) as a small frame —
    persisted beside the shards as ``_manifest.parquet``."""
    import os

    from .joins import inner_join

    joined = inner_join(docs, assignment, on=id_col)
    joined.write_parquet(out_dir, partition_cols=["shard"],
                         compression="zstd")
    from ray.data.aggregate import Count, Sum

    man = assignment.groupby("shard").aggregate(
        Count(alias_name="n_docs"), Sum(tok_col, alias_name="n_tokens")) \
        .to_pandas().sort_values("shard").reset_index(drop=True)
    man.to_parquet(os.path.join(out_dir, "_manifest.parquet"))
    return man
