"""Near-duplicate detection family over a documents-style table
(doc_id, text): MinHash+LSH, SimHash, n-gram Jaccard. Embedding-cosine
near-dup lives in stages/similarity.py.

The reference only does exact dedup (seen-files sha256 index,
/root/reference/src/services/RAG/convert_to_embeddings.py:559-566); these
are the standard published scale-path algorithms a training-data pipeline
needs (MinHash/LSH per Broder 1997; SimHash per Charikar 2002 with the
block-permutation candidate trick of Manku et al. WWW 2007; winnowing per
Schleimer et al. 2003).

Ray-Data shape (minhash and simhash share the skeleton):

    map_batches(signature rows)          # vectorized, 1x sig bytes per doc
      -> materialize()                   # tiny reduced table (see scale note)
      -> map_batches(slim band rows -> partial bucket counts)  # no sigs,
      -> driver: hot buckets = {2 <= count <= MAX_BUCKET_WIDTH}, ray.put
      -> map_batches(sig table -> (bucket, doc_id, sig) for hot buckets)
      -> groupby(bucket).map_groups(vectorized pairwise)   # few real groups
      -> groupby(pair).aggregate          # a pair can surface from 2+ bands

Two things this buys at 100 TB: candidate discovery moves 16-byte partial
count rows instead of 16 copies of a 512-byte signature per doc, and the
per-group python overhead of map_groups is paid only for buckets that
actually hold >= 2 docs (overwhelmingly buckets are singletons — at bench
scale the old shape ran 80k groups of 1 doing nothing but empty-frame
churn).

Scale notes: the signature table is ~0.5% of corpus bytes (520 B/doc); on
a multi-node run persist it to Parquet instead of materialize() and read
it for both passes. The hot-bucket set is a broadcast — fine while
near-dup candidates are a small fraction of docs; for a dup-saturated
corpus pass ``distributed=True``, which swaps the driver combine + ray.put
broadcast for a hash-partitioned reduce (``_hot_buckets_ds``) + semi-join
(``_hot_candidates_semijoin``) and the pair dedup for a partitioned
reduce — same pairs (tests force both paths and compare), no driver-sized
state anywhere.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import ray
import ray.data

# --- shingling / minhash -----------------------------------------------------

MINHASH_PERMS = 64
LSH_BANDS = 16          # 16 bands x 4 rows
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(k: int = MINHASH_PERMS, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


SHINGLE_BASE = 1000003  # polynomial base over unicode codepoints


def char_shingles(text: str, n: int = 5) -> np.ndarray:
    """Distinct polynomial codepoint hashes of the n-char shingles of the
    whitespace-normalized lowercased text: h = fold(h*B + codepoint),
    wrapping mod 2^64 at each step.

    The fold (vs the earlier crc32) buys two things: it VECTORIZES — one
    utf-32 decode + n shifted multiply-adds over the whole string, no
    per-shingle python loop — and the DuckDB oracle can recompute the
    EXACT shingle set with HUGEINT modular arithmetic
    (SQL_MINHASH_PAIRS in pipelines/queries.py), making the whole minhash
    pipeline independently checkable end-to-end like simhash."""
    s = " ".join(text.split()).lower()
    if len(s) < n:
        s = s + " " * (n - len(s))
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    m = len(s) - n + 1
    h = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        h = h * np.uint64(SHINGLE_BASE) + cps[k:k + m]
    return np.unique(h)


def minhash_signature(text: str) -> np.ndarray:
    x = char_shingles(text)
    if len(x) == 0:
        return np.zeros(MINHASH_PERMS, dtype=np.uint64)
    # h_i(x) = ((a_i * x + b_i) wrapped mod 2^64) mod p — NOT exact
    # universal hashing (a_i can reach 2^61 and x 2^32, so the uint64
    # product wraps before the Mersenne mod). Deterministic and
    # well-mixed in practice; Jaccard estimates remain approximately
    # unbiased. min over shingles per permutation.
    prod = (x[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % _MERSENNE
    return prod.min(axis=1).astype(np.uint64)


def minhash_jaccard_est(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


# buckets wider than this are skipped: a bucket holding hundreds of docs
# carries no near-dup signal (its key is a degenerate/common pattern) and
# its O(k^2) pair scan runs in ONE task — the classic LSH hot-bucket skew.
# Standard practice is a width cap (cf. dense-bucket dropping in production
# LSH dedup systems); at 100TB pair generation inside a bucket must be
# bounded or a single degenerate key serializes the stage. Enforced at the
# hot-set stage, so over-wide buckets' rows are never even shipped.
MAX_BUCKET_WIDTH = 200


def _minhash_sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
    """doc -> one row (doc_id, sig: 512 raw bytes)."""
    sigs = [minhash_signature(t).tobytes() for t in batch["text"].fillna("")]
    return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64").to_numpy(),
                         "sig": sigs})


def _sig_matrix(sig_col: List[bytes]) -> np.ndarray:
    if not len(sig_col):
        return np.empty((0, MINHASH_PERMS), dtype=np.uint64)
    return np.frombuffer(b"".join(sig_col),
                         dtype=np.uint64).reshape(-1, MINHASH_PERMS)


def _band_buckets(mat: np.ndarray) -> np.ndarray:
    """(n, PERMS) signature matrix -> (n, BANDS) int64 bucket keys.
    FNV-style vectorized mix of the band index + the band's rows; equal
    band-slices => equal key, collisions across distinct slices ~2^-63
    (they only ever ADD a candidate, later filtered by the estimate).
    Keys are truncated to 53 bits (emitted int64): Ray's groupby aggregate
    round-trips key columns through float64 (measured: 719/720 64-bit hot
    buckets silently rounded away), and 2^53 is the float64-exact integer
    ceiling. 53-bit collisions still only ADD candidates."""
    n = mat.shape[0]
    out = np.empty((n, LSH_BANDS), dtype=np.int64)
    fnv = np.uint64(0x100000001B3)
    for band in range(LSH_BANDS):
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        h ^= np.uint64((band + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        rows = mat[:, band * LSH_ROWS:(band + 1) * LSH_ROWS]
        for r in range(LSH_ROWS):
            h = (h ^ rows[:, r]) * fnv
        out[:, band] = (h >> np.uint64(11)).astype(np.int64)
    return out


def _minhash_band_rows_slim(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, sig) -> LSH_BANDS slim rows (bucket, doc_id) — no sig."""
    mat = _sig_matrix(batch["sig"].tolist())
    bk = _band_buckets(mat)
    return pd.DataFrame({
        "bucket": bk.reshape(-1),
        "doc_id": np.repeat(batch["doc_id"].to_numpy(), LSH_BANDS),
    })


def _hot_minhash_rows(batch: pd.DataFrame, hot_ref) -> pd.DataFrame:
    """(doc_id, sig) -> (bucket, doc_id, sig) rows ONLY for buckets in the
    broadcast hot set (sig bytes shipped once per hot band membership, not
    16x per doc). ``hot_ref`` is a ray.put sorted int64 array — ray.get
    inside the batch fn is a zero-copy read of the local object store, so
    a plain task (no actor-pool spin-up cost) still never re-ships it."""
    hot = ray.get(hot_ref)
    mat = _sig_matrix(batch["sig"].tolist())
    bk = _band_buckets(mat)
    mask = np.isin(bk, hot)
    di, bi = np.nonzero(mask)
    sigs = batch["sig"].to_numpy()
    return pd.DataFrame({
        "bucket": bk[di, bi],
        "doc_id": batch["doc_id"].to_numpy()[di],
        "sig": [sigs[i] for i in di],
    })


_EMPTY_MINHASH_PAIRS = pd.DataFrame({
    "doc_a": pd.Series([], dtype="int64"),
    "doc_b": pd.Series([], dtype="int64"),
    "jaccard_est": pd.Series([], dtype="float64"),
})


def _pairs_from_bucket(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Vectorized all-pairs estimate within one (already hot-filtered,
    width-capped) bucket. The shared empty frame keeps empty and non-empty
    outputs dtype-identical (no float64/int64 schema-mismatch blocks)."""
    g = group.drop_duplicates("doc_id")
    if len(g) < 2 or len(g) > MAX_BUCKET_WIDTH:
        return _EMPTY_MINHASH_PAIRS
    g = g.sort_values("doc_id")
    ids = g["doc_id"].to_numpy().astype("int64")
    mat = _sig_matrix(g["sig"].tolist())
    est = (mat[:, None, :] == mat[None, :, :]).mean(axis=2)
    ai, bi = np.nonzero(np.triu(est, k=1) >= threshold)
    if not len(ai):
        return _EMPTY_MINHASH_PAIRS
    return pd.DataFrame({"doc_a": ids[ai], "doc_b": ids[bi],
                         "jaccard_est": np.round(est[ai, bi], 6)})


def _bucket_count_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial bucket counts (vectorized value_counts)."""
    vc = batch["bucket"].value_counts()
    return pd.DataFrame({"bucket": vc.index.to_numpy().astype("int64"),
                         "n": vc.to_numpy().astype("int64")})


def _hot_buckets(bands_slim: "ray.data.Dataset",
                 max_width: int = MAX_BUCKET_WIDTH) -> set:
    """Buckets with 2..max_width members, via per-batch partial counts
    combined vectorized on the driver.

    Why not groupby("bucket").aggregate(Count): Ray 2.49's sort-based
    aggregate pays ~0.25 ms of per-group machinery, and band buckets are
    nearly all singletons — 79k distinct keys measured 19.6 s vs <0.5 s
    for this shape. Driver combine carries one row per distinct bucket per
    batch; fine to ~1e8 distinct buckets per run. Beyond that, hash-
    partition the band rows (DataContext.shuffle_strategy=HASH_SHUFFLE +
    repartition on bucket) and run the same value_counts per partition —
    same math, no driver bottleneck."""
    parts = bands_slim.map_batches(_bucket_count_partials,
                                   batch_format="pandas")
    frames = [b for b in parts.iter_batches(batch_format="pandas",
                                            batch_size=65536)]
    if not frames:
        return set()
    tot = pd.concat(frames, ignore_index=True).groupby("bucket")["n"].sum()
    sel = tot[(tot >= 2) & (tot <= max_width)]
    return set(int(x) for x in sel.index.to_numpy())


# coarse hash-partition width for the DISTRIBUTED combines below. Few
# enough groups that Ray's ~0.3 ms/group map_groups machinery is noise,
# many enough that one partition's rows fit a task at any corpus size
# (raise on large clusters so a partition stays ~millions of rows).
REDUCE_PARTITIONS = 64


def _hot_buckets_ds(bands_slim: "ray.data.Dataset",
                    max_width: int = MAX_BUCKET_WIDTH) -> "ray.data.Dataset":
    """DISTRIBUTED variant of ``_hot_buckets`` — the hash-partitioned
    reduce its docstring promises: the same per-batch value_counts
    partials, combined per hash partition (coarse key = bucket mod
    REDUCE_PARTITIONS) inside tasks instead of on the driver. Returns a
    Dataset of hot ``bucket`` rows for a semi-join; nothing bucket-shaped
    ever lands on the driver, so there is no ~1e8-distinct-bucket cap."""
    parts = bands_slim.map_batches(_bucket_count_partials,
                                   batch_format="pandas")

    def with_pk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pk"] = df["bucket"].to_numpy() % REDUCE_PARTITIONS
        return df

    def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("bucket", as_index=False)["n"].sum()
        sel = tot[(tot["n"] >= 2) & (tot["n"] <= max_width)]
        return pd.DataFrame({"bucket": sel["bucket"].astype("int64")})

    return parts.map_batches(with_pk, batch_format="pandas") \
        .groupby("_pk").map_groups(reduce_partition, batch_format="pandas")


def _default_join_partitions() -> int:
    """Hash-join partition count sized to the cluster: each partition is
    backed by a shuffle aggregator actor, so dozens of partitions on a
    small node just pay actor spin-up (measured: 2x32 partitions on 8
    CPUs stalls for minutes; 2-4 partitions run in seconds). Scale with
    CPUs, bounded by REDUCE_PARTITIONS."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(REDUCE_PARTITIONS, cpus // 2))


JOIN_MERGE_ROWS = 65536


def merge_small_blocks(ds: "ray.data.Dataset",
                       cap: int) -> "tuple[ray.data.Dataset, int]":
    """Guard for joining against a groupby/map_batches lineage: that
    lineage emits schema-LESS empty blocks when partitions outnumber
    rows, and the per-partition Arrow join then dies with 'no match for
    key field ... on right side' (the round-4 neardup_dedup_dist failure
    class, first fixed for mark_duplicates_join in 4bafa21).
    Materializes, counts, and — when non-empty — repartitions to at most
    ``cap`` partitions of ~JOIN_MERGE_ROWS rows, merging the empties
    away. Returns (ds, n_rows); the caller short-circuits n_rows == 0
    with its own site-specific empty result."""
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        return ds, 0
    return ds.repartition(max(1, min(cap, n // JOIN_MERGE_ROWS + 1))), n


def _hot_candidates_semijoin(sigs: "ray.data.Dataset",
                             bands: "ray.data.Dataset",
                             hot_ds: "ray.data.Dataset",
                             num_partitions: int) -> "ray.data.Dataset":
    """DISTRIBUTED replacement for the ray.put hot-set broadcast: a hash
    semi-join of slim band rows against the hot-bucket table, then a
    doc_id join to attach each hot member's signature (shipped once per
    hot membership, same volume as the broadcast path's candidate rows).
    This is the dup-saturated-corpus shape the module docstring names —
    no driver set, no single-object broadcast.

    The hot table is materialized first and its schema-less empty blocks
    merged away (the round-4 empty-block join hazard: its groupby/filter
    lineage emits them whenever partitions outnumber hot buckets —
    guaranteed for a corpus with few or no duplicates). Zero hot buckets
    short-circuits to an empty candidate table with the joined schema."""
    hot_ds, n_hot = merge_small_blocks(hot_ds, num_partitions)
    if n_hot == 0:
        # zero candidates -> zero groups: the downstream coarse-key /
        # per-bucket machinery only touches (doc_id, bucket), and the
        # per-bucket pair fn is never invoked on an empty group set
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "bucket": pd.Series([], dtype="int64")}))
    members = bands.join(hot_ds, join_type="inner",
                         num_partitions=num_partitions, on=("bucket",))
    return members.join(sigs, join_type="inner",
                        num_partitions=num_partitions, on=("doc_id",))


# hot buckets are grouped by a COARSE key (bucket mod this) for the pair
# scan: Ray's map_groups costs ~0.3 ms of machinery per group, so grouping
# 11k hot buckets directly burns seconds doing nothing; with a coarse key
# the shuffle makes ~4k groups and the real per-bucket iteration happens
# inside the task as a pandas groupby (exact same pairs — a coarse group
# holds whole buckets). Sizing: per-task work is ~(hot_rows / COARSE)
# rows; raise this on large clusters so one coarse group stays ~thousands
# of rows.
PAIR_COARSE_GROUPS = 4096


def _with_coarse_key(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["_pkey"] = df["bucket"].to_numpy() % PAIR_COARSE_GROUPS
    return df


def _per_bucket_pairs(df: pd.DataFrame, bucket_fn, empty) -> pd.DataFrame:
    outs = [bucket_fn(g) for _, g in df.groupby("bucket", sort=False)]
    outs = [o for o in outs if len(o)]
    return pd.concat(outs, ignore_index=True) if outs else empty


def _combine_pairs(pairs: "ray.data.Dataset", value_col: str,
                   take_min: bool, empty: pd.DataFrame,
                   distributed: bool = False) -> "ray.data.Dataset":
    """Dedupe (doc_a, doc_b) pairs that surfaced from several bands/blocks:
    per-batch vectorized partial reduction, then a final combine.

    Default path: one vectorized driver combine — groupby().aggregate()
    here would pay ~0.25 ms/group of machinery on what are overwhelmingly
    singleton pair-groups (measured 6+ s on 26k pairs), and the surviving
    pair set is bounded by the capped buckets, so it fits one machine at
    sandbox scale.

    ``distributed=True`` is the dup-saturated-corpus path: the same
    partials are hash-partitioned on a coarse (doc_a, doc_b) key and
    reduced per partition in tasks — identical pair set (a pair's partial
    rows always share the coarse key), no driver combine, output left
    unsorted (callers that need order sort the small result)."""
    how = "min" if take_min else "max"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty
        return getattr(df.groupby(["doc_a", "doc_b"], as_index=False)
                       [value_col], how)()

    red = pairs.map_batches(partial, batch_format="pandas")
    if distributed:
        def with_pk(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            a = df["doc_a"].to_numpy().astype(np.uint64)
            b = df["doc_b"].to_numpy().astype(np.uint64)
            df["_pk"] = ((a * np.uint64(2654435761) + b)
                         % np.uint64(1 << 32)).astype("int64") \
                % REDUCE_PARTITIONS
            return df

        def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
            return getattr(
                df.drop(columns=["_pk"])
                .groupby(["doc_a", "doc_b"], as_index=False)[value_col], how)()

        return red.map_batches(with_pk, batch_format="pandas") \
            .groupby("_pk").map_groups(reduce_partition, batch_format="pandas")

    frames = list(red.iter_batches(batch_format="pandas", batch_size=65536))
    if not frames:
        return ray.data.from_pandas(empty)
    out = getattr(pd.concat(frames, ignore_index=True)
                  .groupby(["doc_a", "doc_b"], as_index=False)[value_col], how)()
    return ray.data.from_pandas(out.sort_values(["doc_a", "doc_b"])
                                .reset_index(drop=True))


def minhash_lsh_pairs(docs: "ray.data.Dataset", threshold: float = 0.8, *,
                      distributed: bool = False,
                      num_partitions: int = 0) -> "ray.data.Dataset":
    """documents -> unique candidate near-dup pairs (doc_a < doc_b) with
    minhash-estimated Jaccard >= threshold.

    ``distributed=False`` (default): hot buckets combined on the driver
    and broadcast via ray.put — fastest at sandbox scale, documented cap
    ~1e8 distinct buckets. ``distributed=True``: hot buckets become a
    hash-partitioned reduce + semi-join (``_hot_buckets_ds`` /
    ``_hot_candidates_semijoin``) and pair dedup a partitioned reduce —
    identical pair set, no driver-sized state anywhere; use past the cap
    or on dup-saturated corpora."""
    import functools

    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _minhash_sig_rows, batch_format="pandas").materialize()
    bands = sigs.map_batches(_minhash_band_rows_slim, batch_format="pandas")
    if distributed:
        hot_ds = _hot_buckets_ds(bands)
        # join width sized to the KNOWN band-row volume (sigs is
        # materialized, count is metadata): every hash-join partition is
        # an aggregator actor whose spin-up dominates small inputs — one
        # partition per 256k slim band rows, never more than the cluster
        # default (measured: 16->2 partitions cut the dist twin ~3x at
        # bench scale; at 1e9 docs the cap re-engages)
        band_rows = sigs.count() * LSH_BANDS
        np_parts = num_partitions or max(
            2, min(_default_join_partitions(), band_rows // 262144 + 1))
        cand = _hot_candidates_semijoin(sigs, bands, hot_ds, np_parts)
    else:
        hot = _hot_buckets(bands)
        if not hot:
            return ray.data.from_pandas(_EMPTY_MINHASH_PAIRS)
        hot_ref = ray.put(np.sort(np.fromiter(hot, dtype=np.int64,
                                              count=len(hot))))
        cand = sigs.map_batches(
            functools.partial(_hot_minhash_rows, hot_ref=hot_ref),
            batch_format="pandas")
    pairs = cand.map_batches(_with_coarse_key, batch_format="pandas") \
        .groupby("_pkey").map_groups(
            functools.partial(_per_bucket_pairs,
                              bucket_fn=lambda g: _pairs_from_bucket(
                                  g, threshold),
                              empty=_EMPTY_MINHASH_PAIRS),
            batch_format="pandas")
    return _combine_pairs(pairs, "jaccard_est", take_min=False,
                          empty=_EMPTY_MINHASH_PAIRS, distributed=distributed)


# --- simhash -----------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4      # 4 x 16-bit blocks; near-dups share >= 1 block
SIMHASH_MAX_HAMMING = 3


def simhash64(text: str) -> int:
    """64-bit simhash over the doc's unique lowercased tokens; one
    unpackbits + one column-sum instead of a per-token bit loop.

    Token hash = first 8 bytes of md5, big-endian: chosen so the DuckDB
    oracle (SQL_SIMHASH_PAIRS in pipelines/queries.py) can recompute the
    EXACT signature — ``CAST('0x' || substr(md5(t),1,16) AS UBIGINT)`` —
    making the whole pipeline (signature -> block buckets -> width cap ->
    hamming filter) independently checkable end-to-end."""
    import hashlib

    toks = set(text.lower().split())
    if not toks:
        return 0
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
         for t in toks), dtype=np.uint64, count=len(toks))
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    cnt = bits.sum(axis=0, dtype=np.int64)
    # bit i set iff sum(2*b-1) > 0 <=> 2*cnt > n_tokens
    sig_bits = (2 * cnt > len(toks)).astype(np.uint8)
    return int(np.packbits(sig_bits, bitorder="little").view(np.uint64)[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _simhash_sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
    sigs = np.fromiter((simhash64(t) for t in batch["text"].fillna("")),
                       dtype=np.uint64, count=len(batch))
    return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64").to_numpy(),
                         "sig": sigs})


def _simhash_buckets(sigs: np.ndarray) -> np.ndarray:
    """(n,) uint64 -> (n, BLOCKS) int64 bucket keys blk*2^16 + block value."""
    out = np.empty((len(sigs), SIMHASH_BLOCKS), dtype=np.int64)
    for blk in range(SIMHASH_BLOCKS):
        out[:, blk] = ((sigs >> np.uint64(16 * blk)) &
                       np.uint64(0xFFFF)).astype(np.int64) + (blk << 16)
    return out


def _simhash_band_rows_slim(batch: pd.DataFrame) -> pd.DataFrame:
    sigs = batch["sig"].to_numpy().astype(np.uint64)
    bk = _simhash_buckets(sigs)
    return pd.DataFrame({
        "bucket": bk.reshape(-1),
        "doc_id": np.repeat(batch["doc_id"].to_numpy(), SIMHASH_BLOCKS),
    })


def _hot_simhash_rows(batch: pd.DataFrame, hot_ref) -> pd.DataFrame:
    """See _hot_minhash_rows for the broadcast idiom."""
    hot = ray.get(hot_ref)
    sigs = batch["sig"].to_numpy().astype(np.uint64)
    bk = _simhash_buckets(sigs)
    mask = np.isin(bk, hot)
    di, bi = np.nonzero(mask)
    return pd.DataFrame({
        "bucket": bk[di, bi],
        "doc_id": batch["doc_id"].to_numpy()[di],
        "sig": sigs[di],
    })


_EMPTY_SIMHASH_PAIRS = pd.DataFrame({
    "doc_a": pd.Series([], dtype="int64"),
    "doc_b": pd.Series([], dtype="int64"),
    "hamming": pd.Series([], dtype="int64"),
})


def _simhash_pairs(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    g = group.drop_duplicates("doc_id")
    if len(g) < 2 or len(g) > MAX_BUCKET_WIDTH:
        return _EMPTY_SIMHASH_PAIRS
    g = g.sort_values("doc_id")
    ids = g["doc_id"].to_numpy().astype("int64")
    sigs = g["sig"].to_numpy().astype(np.uint64)
    # vectorized pairwise hamming: bit matrix (k, 64), d = b(1-b)' + (1-b)b'
    bits = np.unpackbits(sigs.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little").astype(np.int64)
    inv = 1 - bits
    d = bits @ inv.T + inv @ bits.T
    ai, bi = np.nonzero(np.triu(d <= max_hamming, k=1))
    if not len(ai):
        return _EMPTY_SIMHASH_PAIRS
    return pd.DataFrame({"doc_a": ids[ai], "doc_b": ids[bi],
                         "hamming": d[ai, bi].astype("int64")})


def simhash_pairs(docs: "ray.data.Dataset",
                  max_hamming: int = SIMHASH_MAX_HAMMING, *,
                  distributed: bool = False,
                  num_partitions: int = 0) -> "ray.data.Dataset":
    """See ``minhash_lsh_pairs`` for the distributed-vs-broadcast trade;
    the two pipelines share the hot-bucket machinery."""
    import functools

    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _simhash_sig_rows, batch_format="pandas").materialize()
    bands = sigs.map_batches(_simhash_band_rows_slim, batch_format="pandas")
    if distributed:
        hot_ds = _hot_buckets_ds(bands)
        # join width sized to the known band-row volume (see
        # minhash_lsh_pairs — same aggregator-spin-up economics)
        band_rows = sigs.count() * SIMHASH_BLOCKS
        np_parts = num_partitions or max(
            2, min(_default_join_partitions(), band_rows // 262144 + 1))
        cand = _hot_candidates_semijoin(sigs, bands, hot_ds, np_parts)
    else:
        hot = _hot_buckets(bands)
        if not hot:
            return ray.data.from_pandas(_EMPTY_SIMHASH_PAIRS)
        hot_ref = ray.put(np.sort(np.fromiter(hot, dtype=np.int64,
                                              count=len(hot))))
        cand = sigs.map_batches(
            functools.partial(_hot_simhash_rows, hot_ref=hot_ref),
            batch_format="pandas")
    pairs = cand.map_batches(_with_coarse_key, batch_format="pandas") \
        .groupby("_pkey").map_groups(
            functools.partial(_per_bucket_pairs,
                              bucket_fn=lambda g: _simhash_pairs(
                                  g, max_hamming),
                              empty=_EMPTY_SIMHASH_PAIRS),
            batch_format="pandas")
    return _combine_pairs(pairs, "hamming", take_min=True,
                          empty=_EMPTY_SIMHASH_PAIRS, distributed=distributed)


# --- near-dup dedup: pairs -> clusters -> keep-first -------------------------

def cluster_pairs_keep_first(pairs: pd.DataFrame) -> Dict[int, int]:
    """Union-find over near-dup pairs -> {loser_doc_id: winner_doc_id}
    where the winner is the cluster's minimum id (keep-first, matching the
    exact-dedup policy J1). Driver-side: the pair list is tiny relative
    to the corpus (bounded by the capped LSH buckets). At dup-saturated
    scale replace with iterative distributed label propagation (min-id
    exchange along edges until fixpoint — same result)."""
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent) if find(x) != x}


def components_losers_ds(pairs: "ray.data.Dataset", *,
                         num_partitions: int = 0,
                         max_iters: int = 50) -> "ray.data.Dataset":
    """DISTRIBUTED connected components over near-dup pairs by min-id
    label propagation — the scale path ``cluster_pairs_keep_first``'s
    docstring names, now real: iterate a keyed min-exchange (join labels
    to edges, take the min over neighbors, union with current labels)
    until fixpoint. Same clusters as union-find; converges in
    O(cluster diameter) rounds (near-dup clusters are dense, typically
    2-3). Returns LOSER rows (doc_id, winner) — docs whose cluster
    minimum is another doc. Nothing graph-shaped lands on the driver;
    the per-round convergence check is a single Sum aggregate (labels
    are monotone non-increasing, so an unchanged sum IS the fixpoint)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    np_parts = num_partitions or _default_join_partitions()

    # the per-iteration batch fns below are zero-copy Arrow (column
    # concat / rename / element-wise min) — they run every propagation
    # round over the whole edge/label stream, so a pandas conversion
    # here would copy the hot loop's entire working set each round
    def both_dirs(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("doc_a"), pa.int64())
        b = pc.cast(t.column("doc_b"), pa.int64())
        # explicit type: a zero-chunk column (empty-with-schema block)
        # would otherwise raise ArrowInvalid from chunked_array([])
        return pa.table({
            "node": pa.chunked_array(a.chunks + b.chunks, type=pa.int64()),
            "nbr": pa.chunked_array(b.chunks + a.chunks, type=pa.int64()),
        })

    edges = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        both_dirs, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "winner": pd.Series([], dtype="int64")}))
    # every round pays per-partition shuffle-actor spin-up, so size the
    # join width to the (materialized, already-counted) edge list: one
    # partition per 64k directed edges, never more than the cluster
    # default — a tiny pair graph converges in seconds instead of paying
    # dozens of idle aggregator actors per round
    np_parts = max(2, min(np_parts, (n_edges + 65535) // 65536 + 1))

    def clip_label(t: pa.Table) -> pa.Table:
        node = pc.cast(t.column("node"), pa.int64())
        return pa.table({
            "node": node,
            "label": pc.min_element_wise(
                node, pc.cast(t.column("label"), pa.int64())),
        })

    # round 0 for free: label = min(node, min over direct neighbors)
    labels = edges.groupby("node") \
        .aggregate(Min("nbr", alias_name="label")) \
        .map_batches(clip_label, batch_format="pyarrow").materialize()
    # same failure class as merge_small_blocks guards (schema-less empty
    # hash-aggregate blocks vs the per-partition Arrow join); computed
    # inline here because the loop re-applies the SAME lbl_parts after
    # every groupby round
    n_nodes = labels.count()
    lbl_parts = max(1, min(np_parts, n_nodes // JOIN_MERGE_ROWS + 1))
    labels = labels.repartition(lbl_parts).materialize()
    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]

    for _ in range(max_iters):
        nbr_labels = labels.map_batches(
            lambda t: pa.table({"nbr": t.column("node"),
                                "nbr_label": t.column("label")}),
            batch_format="pyarrow")
        msgs = edges.join(nbr_labels, join_type="inner",
                          num_partitions=np_parts, on=("nbr",)) \
            .map_batches(
                lambda t: pa.table({
                    "node": pc.cast(t.column("node"), pa.int64()),
                    "label": pc.cast(t.column("nbr_label"), pa.int64())}),
                batch_format="pyarrow")
        labels = labels.union(msgs).groupby("node") \
            .aggregate(Min("label", alias_name="label")) \
            .repartition(lbl_parts).materialize()
        cur_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"components_losers_ds did not converge in {max_iters} rounds "
            "(pathologically long chain clusters — raise max_iters)")

    def losers_only(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.not_equal(t.column("label"), t.column("node")))
        return pa.table({"doc_id": keep.column("node"),
                         "winner": keep.column("label")})

    return labels.map_batches(losers_only, batch_format="pyarrow")


def neardup_dedup_keep_first(docs: "ray.data.Dataset",
                             threshold: float = 0.8, *,
                             distributed: bool = False,
                             num_partitions: int = 0) -> "ray.data.Dataset":
    """End-to-end fuzzy dedup: MinHash+LSH candidate pairs -> connected
    components -> drop every doc whose cluster has a smaller id. Returns
    the surviving (doc_id) set as a Dataset.

    Default path: driver union-find over the (tiny, bucket-capped) pair
    list; the loser set is broadcast via ray.put and read zero-copy per
    batch — document text never moves beyond the signature pass.
    ``distributed=True``: pairs stay a Dataset end-to-end — components
    via ``components_losers_ds`` min-label propagation, survivors via an
    anti-join (left-outer + null filter). Identical survivor set
    (test-pinned); use when the pair list outgrows one machine.

    The loser table is materialized before the anti-join and its blocks
    merged with a row-bounded repartition: its label-propagation lineage
    (hash-aggregates + pandas map_batches) emits schema-LESS empty blocks
    when partitions outnumber loser rows, which break the per-partition
    Arrow join ('no match for key field doc_id on right side' — the
    driver-gate failure at num_cpus=32 in round 4). Zero losers
    short-circuits to a pass-through. Same guard as
    ``dedup.mark_duplicates_join`` (commit 4bafa21)."""
    import functools

    pairs_ds = minhash_lsh_pairs(docs, threshold, distributed=distributed,
                                 num_partitions=num_partitions)
    if distributed:
        losers_ds, n_losers = merge_small_blocks(
            components_losers_ds(pairs_ds, num_partitions=num_partitions),
            num_partitions or _default_join_partitions())
        if n_losers == 0:
            return docs.select_columns(["doc_id"])

        def survivors(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["winner"].isna()
            return pd.DataFrame(
                {"doc_id": df.loc[keep, "doc_id"].astype("int64")})

        return docs.select_columns(["doc_id"]).join(
            losers_ds, join_type="left_outer",
            num_partitions=num_partitions or _default_join_partitions(),
            on=("doc_id",)) \
            .map_batches(survivors, batch_format="pandas")

    pairs = pairs_ds.to_pandas()
    losers = cluster_pairs_keep_first(pairs)
    loser_arr = np.sort(np.fromiter(losers.keys(), dtype=np.int64,
                                    count=len(losers)))
    ref = ray.put(loser_arr)

    def keep(batch: pd.DataFrame, loser_ref) -> pd.DataFrame:
        drop = ray.get(loser_ref)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"doc_id": ids[~np.isin(ids, drop)]})

    return docs.select_columns(["doc_id"]).map_batches(
        functools.partial(keep, loser_ref=ref), batch_format="pandas")


# --- exact n-gram jaccard ----------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def _jaccard_tile_pairs(group: pd.DataFrame, n: int,
                        threshold: float) -> pd.DataFrame:
    """Pairwise Jaccard within one tile (see skewtools.tiled_pair_groups):
    rows carry _side 0/1; diagonal tiles (_ti == _tj) pair i<j, cross
    tiles pair only across sides. Exact — tiling partitions the pair
    space. The diagonal test uses the tile coordinates carried in every
    group row, NOT len(right)==0: a cross tile whose side-1 sub-block
    happens to be empty must emit nothing, not re-emit the diagonal."""
    a_out, b_out, sim_out = [], [], []
    left = group[group["_side"] == 0]
    right = group[group["_side"] == 1]
    if len(group) and int(group["_ti"].iloc[0]) == int(group["_tj"].iloc[0]):
        g = left.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        grams = [word_ngrams(t, n) for t in g["text"].fillna("")]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                s = jaccard(grams[i], grams[j])
                if s >= threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    sim_out.append(round(s, 6))
    else:
        lids = left["doc_id"].to_numpy()
        rids = right["doc_id"].to_numpy()
        lg = [word_ngrams(t, n) for t in left["text"].fillna("")]
        rg = [word_ngrams(t, n) for t in right["text"].fillna("")]
        for i in range(len(lids)):
            for j in range(len(rids)):
                s = jaccard(lg[i], rg[j])
                if s >= threshold:
                    a, b = int(lids[i]), int(rids[j])
                    if a > b:
                        a, b = b, a
                    a_out.append(a)
                    b_out.append(b)
                    sim_out.append(round(s, 6))
    return pd.DataFrame({
        "doc_a": pd.Series(a_out, dtype="int64"),
        "doc_b": pd.Series(b_out, dtype="int64"),
        "jaccard": pd.Series(sim_out, dtype="float64"),
    })


def ngram_jaccard_pairs(docs: "ray.data.Dataset", *, block_col: str = "source",
                        n: int = 3, threshold: float = 0.5,
                        max_width: int = MAX_BUCKET_WIDTH) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard >= threshold for pairs sharing a blocking
    key. Blocks wider than ``max_width`` are TILED (skewtools
    .tiled_pair_groups): members split into ceil(k/w) sub-blocks, every
    sub-block pair becomes its own group, so no single task ever runs more
    than an O(w^2) scan — exact output, bounded skew."""
    from ..stages.skewtools import tiled_pair_groups

    slim = docs.select_columns([block_col, "doc_id", "text"])
    return tiled_pair_groups(
        slim, block_col=block_col, id_col="doc_id",
        pair_fn=lambda g: _jaccard_tile_pairs(g, n, threshold),
        max_width=max_width)
