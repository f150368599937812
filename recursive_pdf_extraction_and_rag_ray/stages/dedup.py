"""Corpus-level deduplication stages.

Exact dedup here (round 1); near-dup family (MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine) lives in ``stages/neardup.py``.

Reference analog: the seen-files index — sha256-prefix of the file, first
path wins, later identical files marked duplicates
(/root/reference/src/services/RAG/convert_to_embeddings.py:531-534,559-566).
The reference does this serially through a mutable JSON dict; the Ray-native
expression is ONE hash shuffle: ``groupby(text_sha256).map_groups`` with a
deterministic total order inside each group (lexicographically-smallest url
wins — os.walk order does not exist in a distributed run, so the winner
rule must be data-derived; SURVEY.md section 7.4 item 2).

Scale note (100 TB): the shuffle moves full doc text once. When that is too
hot, the scale path is: project to (url, text_sha256), groupby on the
16-byte key, emit (url, duplicate_of) pairs, then hash-join back — same
semantics, shuffle carries keys only. ``mark_exact_duplicates_lean``
implements that shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

if True:  # ray is an engine dependency; guard keeps module importable for docs
    import ray.data


def _mark_group(group: pa.Table) -> pa.Table:
    urls = group.column("url")
    winner = pc.min_max(urls)["min"].as_py()
    dup = pa.array(
        ["" if u == winner else winner for u in urls.to_pylist()], pa.string())
    return group.append_column("duplicate_of", dup)


def mark_exact_duplicates(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """docs_extracted (non-empty rows) -> same rows + ``duplicate_of``
    (empty string for the kept winner). One all-to-all on ``text_sha256``."""
    return docs.groupby("text_sha256").map_groups(
        _mark_group, batch_format="pyarrow")


def mark_exact_duplicates_lean(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Key-only variant: returns a small (url, duplicate_of) Dataset; the
    caller joins it back (broadcast if small, hash join at scale)."""
    pairs = docs.select_columns(["url", "text_sha256"])
    return pairs.groupby("text_sha256").map_groups(
        _mark_group, batch_format="pyarrow").select_columns(
        ["url", "duplicate_of"])


def keep_first_exact(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Hard dedup: only the winning row of each exact-duplicate group
    survives (the ``groupby(doc_hash)`` keep-first of SURVEY.md section 2.8)."""
    marked = mark_exact_duplicates(docs)
    return marked.map_batches(
        lambda t: t.filter(pc.equal(t["duplicate_of"], "")),
        batch_format="pyarrow")


def compute_dup_winners(docs: "ray.data.Dataset") -> dict:
    """Fast path used by the flagship pipeline: vectorized hash aggregate
    instead of per-group Python (59k tiny map_groups groups cost ~100x more
    than one Min/Count aggregate). Shuffles only (url, text_sha256).

    Returns {text_sha256: winner_url} for DUPLICATE groups only (count > 1)
    — typically a small fraction of the corpus, cheap to broadcast with
    ``ray.put``. At scales where even the dup-group map is too big to
    broadcast, use ``mark_exact_duplicates_lean`` + a hash join instead
    (same semantics, all-distributed)."""
    from ray.data.aggregate import Count, Min

    agg = docs.select_columns(["url", "text_sha256"]) \
        .groupby("text_sha256") \
        .aggregate(Min("url", alias_name="winner"), Count(alias_name="n"))
    dup_rows = agg.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow")
    winners = {}
    for b in dup_rows.iter_batches(batch_format="pyarrow"):
        winners.update(zip(b.column("text_sha256").to_pylist(),
                           b.column("winner").to_pylist()))
    return winners


def winners_dataset_from_partials(partial_files,
                                  ) -> "ray.data.Dataset":
    """Per-shard ``_dedup`` partials -> distributed (text_sha256, winner)
    table of DUPLICATE groups only, via a hash-partitioned groupby — the
    scale path ``load_dup_winners``'s docstring names, now real: nothing
    key-shaped ever lands on the driver, so there is no ~1e8-doc cap."""
    from ray.data.aggregate import Min, Sum

    parts = ray.data.read_parquet(partial_files)
    agg = parts.groupby("text_sha256").aggregate(
        Min("url_min", alias_name="winner"), Sum("n", alias_name="n_sum"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n_sum"], 1))
        .select(["text_sha256", "winner"]),
        batch_format="pyarrow")


def winners_dataset_from_docs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Fallback when no partials exist: same winner table computed from the
    docs key columns with one distributed (url, text_sha256) aggregate."""
    from ray.data.aggregate import Count, Min

    agg = docs.select_columns(["url", "text_sha256"]) \
        .groupby("text_sha256") \
        .aggregate(Min("url", alias_name="winner"), Count(alias_name="n_sum"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n_sum"], 1))
        .select(["text_sha256", "winner"]),
        batch_format="pyarrow")


def mark_duplicates_join(docs: "ray.data.Dataset",
                         winners: "ray.data.Dataset",
                         num_partitions: int) -> "ray.data.Dataset":
    """Hash-join replacement for ``MarkDuplicatesFromBroadcast`` — the
    dup-saturated-corpus path where the winner map is too big to ray.put:
    left-outer join on the 16-byte key, then a vectorized Arrow kernel
    derives ``duplicate_of`` ('' for non-dups and for the winning row
    itself). Output rows/columns identical to the broadcast path.

    The winner table is materialized first (slim by construction: dup
    GROUPS only) — both to avoid re-executing its lineage and because
    its empty blocks must be merged away before the join: the upstream
    hash-aggregate emits schema-LESS empty pandas blocks for partitions
    that received no dup groups, and those break the per-partition Arrow
    join ('no match for key field ... on right side'). A zero-winner
    table short-circuits to a constant '' column; otherwise a slim
    repartition (bounded by rows, never more blocks than
    ``num_partitions``) leaves only schema-carrying blocks."""
    winners = winners.materialize()
    n_win = winners.count()
    if n_win == 0:
        return docs.map_batches(
            lambda t: t.append_column(
                "duplicate_of",
                pa.array([""] * t.num_rows, pa.string())),
            batch_format="pyarrow")
    winners = winners.repartition(
        min(num_partitions, max(1, n_win // 65536 + 1)))
    joined = docs.join(winners, join_type="left_outer",
                       num_partitions=num_partitions, on=("text_sha256",))

    def attach(t: pa.Table) -> pa.Table:
        w = t.column("winner")
        # null-url semantics (pinned, shared with the broadcast twin): a
        # null url can never win Min("url") (Arrow Min skips nulls), so a
        # null-url row in a dup group IS a duplicate of the group winner
        # — equal(null, winner) folds to False, not True
        keep = pc.or_kleene(
            pc.is_null(w),
            pc.fill_null(pc.equal(w, t.column("url")), False))
        dup = pc.if_else(keep,
                         pa.scalar("", pa.string()), pc.cast(w, pa.string()))
        return t.drop_columns(["winner"]).append_column(
            "duplicate_of", pc.cast(dup, pa.string()))

    return joined.map_batches(attach, batch_format="pyarrow")


class MarkDuplicatesFromBroadcast:
    """map_batches actor: attach ``duplicate_of`` from the broadcast
    dup-winner map (read once per actor via ray.get, zero re-ship)."""

    def __init__(self, winners_ref):
        import ray as _ray
        self.winners = _ray.get(winners_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        # Arrow-native hash probe: index_in against the winner key array
        # is one vectorized hash lookup per batch, no Python-object hop
        # (to_pylist) and no pandas conversion — the batch stays zero-copy
        # Arrow end to end (at 1e9 rows the object conversion IS the stage).
        if not hasattr(self, "_keys"):
            self._keys = pa.array(list(self.winners.keys()), pa.string())
            self._vals = pa.array(list(self.winners.values()), pa.string())
        idx = pc.index_in(t.column("text_sha256"), value_set=self._keys)
        w = pc.take(self._vals, idx)  # null where key not in winner map
        # null-url rows in a dup group are duplicates of the winner (a
        # null url cannot be the Min("url") winner) — same pinned
        # semantics as mark_duplicates_join's attach
        keep = pc.or_kleene(
            pc.is_null(w),
            pc.fill_null(pc.equal(w, t.column("url")), False))
        dup = pc.if_else(keep, pa.scalar("", pa.string()), w)
        return t.append_column("duplicate_of",
                               pc.cast(dup, pa.string()))


# --- bloom-filtered incremental dedup ----------------------------------------
# Dedup a NEW shard/snapshot against an EXISTING corpus without shuffling
# the existing corpus per run: build a fixed-size Bloom filter over the old
# fingerprints once (mergeable per-batch partials, like the HLL/CMS sketches
# in stages/sketch.py), broadcast it, and let every new-side batch drop the
# definitely-unseen rows locally. Only the bloom-positive CANDIDATES — a
# sliver of the new data — pay the exact anti-join, so the result is exact
# (bloom false positives are re-verified, never trusted).

BLOOM_BITS = 1 << 23       # 1 MiB bitmap: ~2.1% fp at 1e6 entries, k=4
BLOOM_HASHES = 4


def _bloom_positions(fp_hex, bits: int, k: int):
    """k bit positions per md5-hex fingerprint via classic double hashing
    pos_j = (h1 + j*h2) mod bits, with h1/h2 the two independent 64-bit
    halves of the md5 (h2 forced odd so every probe stride is co-prime
    with the power-of-two ``bits`` and covers the whole bitmap) —
    deterministic across processes (no PYTHONHASHSEED dependence).
    fp ~= (1 - e^(-k*n/bits))^k: ~2.1% at n=1e6 / bits=2^23 / k=4."""
    import numpy as np
    h1 = np.asarray([int(f[:16], 16) for f in fp_hex], dtype=np.uint64)
    h2 = np.asarray([int(f[16:32], 16) | 1 for f in fp_hex],
                    dtype=np.uint64)
    pos = np.empty((len(h1), k), dtype=np.int64)
    for j in range(k):
        pos[:, j] = ((h1 + np.uint64(j) * h2)
                     % np.uint64(bits)).astype(np.int64)
    return pos


def bloom_from_docs(docs: "ray.data.Dataset", *, bits: int = BLOOM_BITS,
                    k: int = BLOOM_HASHES) -> "np.ndarray":
    """Bloom bitmap over md5(text) of every row. Each batch emits its
    SET BIT POSITIONS (slim, <= rows x k int64s) rather than a full
    bitmap; the driver unions positions into one fixed-size bitmap —
    a mergeable-sketch combine, bounded by ``bits`` not corpus size."""
    import pandas as pd

    from .textstats import fingerprint_batch

    fps = docs.map_batches(
        lambda df: pd.DataFrame({"fp": fingerprint_batch(df)["fp"]}),
        batch_format="pandas")
    return bloom_from_fps(fps, bits=bits, k=k)


def bloom_from_fps(fps: "ray.data.Dataset", *, bits: int = BLOOM_BITS,
                   k: int = BLOOM_HASHES) -> "np.ndarray":
    """Bloom bitmap from an already-fingerprinted (fp,) dataset — the
    persisted-state build path, where the corpus text is never touched."""
    import numpy as np
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = _bloom_positions(df["fp"].to_numpy(), bits, k).ravel()
        return pd.DataFrame({"pos": np.unique(pos)})

    bitmap = np.zeros(bits, dtype=bool)
    for b in fps.map_batches(partial, batch_format="pandas") \
            .iter_batches(batch_format="pandas", batch_size=65536):
        bitmap[b["pos"].to_numpy()] = True
    return bitmap


def build_incremental_state(old_docs: "ray.data.Dataset", state_dir: str, *,
                            bits: int = BLOOM_BITS,
                            k: int = BLOOM_HASHES) -> str:
    """One-time (per corpus version) build of the incremental-dedup
    state — the maintained table that makes the OLD side zero-scan per
    incremental run:

    - ``<state_dir>/fp/``      partitioned parquet of old fingerprints
      (32-hex md5 per doc; slim, ~40 B/doc — resumable, hive-style)
    - ``<state_dir>/bloom.npz`` packed bloom bitmap + (bits, k, n_old)
    - ``<state_dir>/_SUCCESS``  commit marker (readers must check it)

    The old corpus TEXT is scanned exactly once, here; the bloom is then
    derived from the persisted slim fp table, and every later
    ``incremental_dedup_from_state`` run reads only the new side plus
    this state. Rebuild (or append a delta partition) when the old
    corpus version changes."""
    import os

    import numpy as np
    import pandas as pd

    from .textstats import fingerprint_batch

    fp_dir = os.path.join(state_dir, "fp")
    old_docs.map_batches(
        lambda df: pd.DataFrame({"fp": fingerprint_batch(df)["fp"]}),
        batch_format="pandas").write_parquet(fp_dir)
    fps = ray.data.read_parquet(fp_dir)
    n_old = fps.count()
    bitmap = bloom_from_fps(fps, bits=bits, k=k)
    np.savez(os.path.join(state_dir, "bloom.npz"),
             bitmap=np.packbits(bitmap), bits=np.int64(bits),
             k=np.int64(k), n_old=np.int64(n_old))
    with open(os.path.join(state_dir, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    return state_dir


def load_incremental_state(state_dir: str):
    """(bitmap bool ndarray, bits, k, n_old, fp_dataset) from a committed
    ``build_incremental_state`` directory."""
    import os

    import numpy as np

    if not os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        raise FileNotFoundError(
            f"incremental-dedup state not committed: {state_dir}")
    z = np.load(os.path.join(state_dir, "bloom.npz"))
    bits, k = int(z["bits"]), int(z["k"])
    bitmap = np.unpackbits(z["bitmap"]).astype(bool)[:bits]
    fps = ray.data.read_parquet(os.path.join(state_dir, "fp"))
    return bitmap, bits, k, int(z["n_old"]), fps


BCAST_OLD_KEYS_MAX = 2_000_000


def _incremental_dedup_core(new_docs: "ray.data.Dataset",
                            old_fp: "ray.data.Dataset",
                            bitmap, *, id_col: str, bits: int, k: int,
                            n_old: int,
                            broadcast_old_keys) -> "ray.data.Dataset":
    """Shared verify skeleton: bloom-probe every new row (one
    fingerprint pass), pass bloom-negatives with zero shuffle, and
    anti-join only the bloom-positive candidates against the old
    fingerprint table — exact output, bloom never trusted."""
    import pandas as pd
    import ray

    from . import joins
    from .textstats import fingerprint_batch

    bloom_ref = ray.put(bitmap)

    class BloomProbe:
        """Actor-pool probe: bitmap fetched once per actor, not per
        batch. Emits (id, fp, cand) — cand=False rows are PROVEN new
        (bloom has no false negatives), so ONE fingerprint+probe pass
        feeds both branches."""

        def __init__(self, ref):
            self.bitmap = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            fp = fingerprint_batch(df)["fp"]
            pos = _bloom_positions(fp.to_numpy(), bits, k)
            return pd.DataFrame({id_col: df[id_col].to_numpy(),
                                 "fp": fp.to_numpy(),
                                 "cand": self.bitmap[pos].all(axis=1)})

    # Two consumers (sure-new filter, candidate anti-join) would re-run
    # the fingerprint+probe lineage twice; materialize the SLIM probe
    # table once instead — (id, 32-char fp, bool) per new row, a small
    # fraction of the text bytes it replaces, and spillable.
    probed = new_docs.select_columns([id_col, "text"]).map_batches(
        BloomProbe, fn_constructor_args=(bloom_ref,),
        batch_format="pandas", concurrency=(1, 8)).materialize()
    sure_new = probed.map_batches(
        lambda df: df[~df["cand"]][[id_col]], batch_format="pandas")
    candidates = probed.map_batches(
        lambda df: df[df["cand"]][[id_col, "fp"]], batch_format="pandas")
    if broadcast_old_keys is None:
        broadcast_old_keys = n_old <= BCAST_OLD_KEYS_MAX
    if broadcast_old_keys:
        verified = joins.anti_join(candidates, old_fp, on="fp",
                                   broadcast=True).select_columns([id_col])
    else:
        # candidates are a bloom-filtered sliver: coalesce their many
        # tiny blocks and use a moderate partition count — the 256-way
        # default pays pure shuffle machinery on near-empty groups
        verified = joins.anti_join(candidates, old_fp, on="fp",
                                   coarse=64, pre_blocks=16) \
            .select_columns([id_col])
    return sure_new.union(verified)


def incremental_dedup_bloom(new_docs: "ray.data.Dataset",
                            old_docs: "ray.data.Dataset", *,
                            id_col: str = "doc_id",
                            bits: int = BLOOM_BITS,
                            k: int = BLOOM_HASHES,
                            broadcast_old_keys=None) -> "ray.data.Dataset":
    """ids of ``new_docs`` whose text does NOT already exist in
    ``old_docs`` (exact, not probabilistic): bloom-negative rows pass
    locally with zero shuffle; bloom-positive candidates are verified
    by an exact anti-join on the fingerprint. The verify leg picks its
    shape by old-side size (``broadcast_old_keys=None`` decides from a
    count): small old corpus -> broadcast the old key set and probe
    candidates locally; corpus-scale old -> hash-partitioned
    distributed anti-join.

    One-shot form: the old corpus TEXT is fingerprinted here, once (the
    fp table feeds both the bloom build and the verify leg). For
    repeated incremental runs, ``build_incremental_state`` +
    ``incremental_dedup_from_state`` is the maintained-table shape —
    old side touched ZERO times per run."""
    import pandas as pd

    from .textstats import fingerprint_batch

    # fingerprint the old side ONCE; the slim (fp,) table is materialized
    # and reused by both the bloom build and the candidate anti-join —
    # the old text column is read exactly one time.
    old_fp = old_docs.map_batches(
        lambda df: pd.DataFrame({"fp": fingerprint_batch(df)["fp"]}),
        batch_format="pandas").materialize()
    bitmap = bloom_from_fps(old_fp, bits=bits, k=k)
    return _incremental_dedup_core(
        new_docs, old_fp, bitmap, id_col=id_col, bits=bits, k=k,
        n_old=old_fp.count(), broadcast_old_keys=broadcast_old_keys)


def incremental_dedup_from_state(new_docs: "ray.data.Dataset",
                                 state_dir: str, *,
                                 id_col: str = "doc_id",
                                 broadcast_old_keys=None,
                                 ) -> "ray.data.Dataset":
    """Incremental dedup against a PERSISTED old-side state
    (``build_incremental_state``): per run this reads only the new-side
    text plus the committed bloom bitmap and slim fp parquet — the old
    corpus itself is scanned zero times."""
    bitmap, bits, k, n_old, old_fp = load_incremental_state(state_dir)
    return _incremental_dedup_core(
        new_docs, old_fp, bitmap, id_col=id_col, bits=bits, k=k,
        n_old=n_old, broadcast_old_keys=broadcast_old_keys)


def snapshot_diff(old_docs: "ray.data.Dataset",
                  new_docs: "ray.data.Dataset", *,
                  id_col: str = "doc_id",
                  coarse: int = 256) -> "ray.data.Dataset":
    """Corpus-version diff: (id, status) with status in
    {'added','removed','changed','unchanged'} — SQL FULL OUTER JOIN
    comparing content hashes, the audit step between two snapshots of
    an incrementally-maintained corpus (what changed since the last
    crawl / extraction run?).

    Only slim (id, 32-hex fp, side) rows cross the wire — texts are
    fingerprinted batch-locally first. Both sides tag and
    hash-partition ONCE by ``hash(id) % coarse`` (the joins.py scheme);
    a vectorized outer merge per partition classifies every id. No
    driver state, no broadcast."""
    import numpy as np
    import pandas as pd

    from .textstats import fingerprint_batch
    from .joins import _knuth_pkey

    def slim(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            fp = fingerprint_batch(df)
            ids = df[id_col].to_numpy().astype("int64")
            return pd.DataFrame({
                id_col: ids, "fp": fp["fp"].to_numpy(),
                "_side": np.full(len(df), side, dtype=np.int8),
                "_pkey": _knuth_pkey(ids, coarse)})
        return f

    both = old_docs.select_columns([id_col, "text"]) \
        .map_batches(slim(0), batch_format="pandas") \
        .union(new_docs.select_columns([id_col, "text"])
               .map_batches(slim(1), batch_format="pandas"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["_side"] == 0, [id_col, "fp"]]
        n = g.loc[g["_side"] == 1, [id_col, "fp"]]
        m = o.merge(n, on=id_col, how="outer", sort=False,
                    suffixes=("_old", "_new"))
        old_fp = m["fp_old"]
        new_fp = m["fp_new"]
        status = np.where(
            old_fp.isna(), "added",
            np.where(new_fp.isna(), "removed",
                     np.where(old_fp == new_fp, "unchanged", "changed")))
        return pd.DataFrame({id_col: m[id_col].astype("int64"),
                             "status": status})

    return both.groupby("_pkey").map_groups(classify,
                                            batch_format="pandas")
