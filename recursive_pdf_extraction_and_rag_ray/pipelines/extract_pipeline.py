"""The flagship pipeline: pages parquet shards -> extracted docs -> corpus
dedup -> chunks -> embeddings -> grouped index shards, with per-shard
lineage commits and exact resume.

Ray-Data-first shape (vs the reference's per-file ProcessPoolExecutor loop,
/root/reference/src/services/RAG/convert_to_embeddings.py:602-748):

    read_parquet(pending shards, include_paths=True)
      -> map_batches(ExtractPages, concurrency=actors)   # stateful pool
      -> write_parquet(docs/, partition_cols=["shard"])  # stage commit
      [commit pass: one pruned read-back builds lineage checksums AND
       per-shard exact-dedup partials (_dedup/<shard>.parquet)]
    read_parquet(docs/ of PENDING shards only, pruned columns)
      -> map_batches(MarkDuplicatesFromBroadcast)         # winner map from
      -> map_batches(chunk_docs_batch)                    #   combined partials
      -> map_batches(HashEmbedder, concurrency=actors)    # stateful pool
      -> write_parquet(chunks/, partition_cols=["shard"]) # stage commit
    read_parquet(chunks/, covering columns, coalesced blocks)
      -> write_parquet(index/, partition_cols=["gk_bucket"])  # hash(key)%32

Resume: a shard with a ``completed`` lineage row for (stage,
parser_version) is pruned from the read task list — its bytes are never
re-read (the distributed analog of the size+mtime fast-skip,
convert_to_embeddings.py:550-557). Stale partial output of uncommitted
shards is deleted before reprocessing, so kill+rerun == one clean run.

Scale notes (100 TB): every stage is a streaming map over Arrow blocks —
there is NO corpus-wide shuffle: global exact dedup flows through tiny
associative per-shard partials (unique doc hash -> min url, count), so the
only all-to-all ever moved is the hash/url key space, never document text.
Output is partitioned per input shard so a 256-node run resumes at shard
granularity; intermediates are zstd-compressed (text-heavy tables shrink
~2-4x, trading parallel CPU for shared-disk bytes).
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .. import PARSER_VERSION
from ..stages.chunk import chunk_docs_batch
from ..stages.embed import HashEmbedder
from ..stages.extract import ExtractPages
from ..state.lineage import append_lineage, completed_shards
from ..state.metrics import append_metrics

STAGE_EXTRACT = "extract"
STAGE_CHUNKS = "chunks_embedded"


def _default_concurrency() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def _pool(concurrency) -> tuple:
    """Actor-pool sizing: autoscale (n//2, n) — a fixed pool of size ==
    cluster CPUs deadlocks the pipeline (actors hold every CPU, ReadParquet
    tasks can't schedule), but a floor of 1 makes the pool ramp from a
    single actor and wastes the first seconds of every stage (measured
    ~10% of extract wall at 16 CPUs). Half the target keeps reads/writes
    schedulable while skipping most of the ramp."""
    if isinstance(concurrency, tuple):
        return concurrency
    n = max(1, int(concurrency))
    return (max(1, n // 2), n)


def list_shards(input_dir_or_paths) -> List[str]:
    if isinstance(input_dir_or_paths, (list, tuple)):
        return sorted(input_dir_or_paths)
    return sorted(glob.glob(os.path.join(input_dir_or_paths, "*.parquet")))


def _shard_stem(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _clean_partitions(table_dir: str, shards: Sequence[str]) -> None:
    """Remove uncommitted partial partition dirs before reprocessing."""
    for s in shards:
        part_dir = os.path.join(table_dir, f"shard={s}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)


def _checksum_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial: (shard, n_rows, key_sum[, n_tokens]). Combined
    driver-side — tiny tables only cross to the driver. sha1-per-key is
    inherent; the grouping/summing is vectorized (uint64 sums wrap mod
    2^64). When the batch carries ``n_chars`` the token partial
    (reference len//4 heuristic, convert_to_embeddings.py:106-118) rides
    along for free — no extra read of chunk text for billing.

    The hashed key must be UNIQUE PER ROW corpus-wide: the commit-tap's
    content-digest file naming (``_spill_partials``) relies on two
    DIFFERENT blocks never producing byte-identical partials, and chunk
    rows repeat ``url`` across a document — so chunk batches key on
    (url, chunk_index), which is unique by construction, instead of the
    bare url (doc batches' urls are already unique)."""
    import hashlib
    import struct

    import numpy as np
    import pandas as pd

    urls = batch.column("url").to_pylist()
    if "chunk_index" in batch.column_names:
        keys = [f"{u}#{i}" for u, i in
                zip(urls, batch.column("chunk_index").to_pylist())]
    else:
        keys = urls
    ks = np.fromiter(
        (struct.unpack("<Q", hashlib.sha1(k.encode()).digest()[:8])[0]
         for k in keys), dtype=np.uint64, count=len(keys))
    toks = (np.maximum(1, batch.column("n_chars").to_numpy() // 4)
            if "n_chars" in batch.column_names
            else np.zeros(len(keys), dtype=np.int64))
    df = pd.DataFrame({"shard": batch.column("shard").to_pylist(), "_k": ks,
                       "_t": toks})
    agg = df.groupby("shard", as_index=False).agg(
        n_rows=("_k", "size"),
        key_sum=("_k", lambda s: np.add.reduce(s.to_numpy(dtype=np.uint64))),
        n_tokens=("_t", "sum"))
    return pa.table({
        "shard": pa.array(agg["shard"].tolist(), pa.string()),
        "n_rows": pa.array(agg["n_rows"].astype("int64"), pa.int64()),
        "key_sum": pa.array(agg["key_sum"].to_numpy().astype(np.uint64),
                            pa.uint64()),
        "n_tokens": pa.array(agg["n_tokens"].astype("int64"), pa.int64()),
    })


DEDUP_DIRNAME = "_dedup"


def _extract_commit_partials(df) -> "pa.Table":
    """Per-batch commit partials for the extract stage, computed IN THE
    TASKS so the driver never iterates document rows. Two row kinds in one
    table (associative — combine across batches/shards/sessions):
      kind='cs': per-shard checksum partial (n docs, wrapped sha1-url sum)
      kind='dd': per-(shard, text_sha256) dedup partial (min url, count)
    """
    import hashlib
    import struct

    import numpy as np
    import pandas as pd

    ks = df["url"].map(lambda u: struct.unpack(
        "<Q", hashlib.sha1(u.encode()).digest()[:8])[0]).to_numpy(
        dtype=np.uint64)

    def _wrap_sum(s):
        return np.add.reduce(s.to_numpy(dtype=np.uint64))  # wraps mod 2^64

    cs = df.assign(_k=ks).groupby("shard", as_index=False).agg(
        n=("url", "size"), key_sum=("_k", _wrap_sum))
    dd = df.loc[df["method"] != "empty"].groupby(
        ["shard", "text_sha256"], as_index=False).agg(
        url_min=("url", "min"), n=("url", "size"))
    out = pd.DataFrame({
        "shard": pd.concat([cs["shard"], dd["shard"]], ignore_index=True),
        "h": pd.concat([pd.Series([""] * len(cs), dtype="object"),
                        dd["text_sha256"]], ignore_index=True),
        "url_min": pd.concat([pd.Series([""] * len(cs), dtype="object"),
                              dd["url_min"]], ignore_index=True),
        "n": pd.concat([cs["n"], dd["n"]], ignore_index=True).astype("int64"),
        "key_sum": pd.concat(
            [cs["key_sum"],
             pd.Series(np.zeros(len(dd), dtype=np.uint64))],
            ignore_index=True).astype("uint64"),
        "kind": ["cs"] * len(cs) + ["dd"] * len(dd),
    })
    return out


COMMIT_TAP_DIRNAME = "_commit_tap"


def _spill_partials(parts: pa.Table, tmp_dir: str) -> None:
    """Spill one tiny parquet of associative commit-partial rows from
    inside the write pipeline. IDEMPOTENT under task retries: the file
    name is a digest of the partial CONTENT, so a retried task that
    recomputes the same block overwrites its own file instead of
    double-counting the checksum (the property the old read-back pass
    got for free). Content naming is only sound because two DIFFERENT
    blocks can never produce byte-identical partials: every hashed key
    is unique per row corpus-wide (see ``_checksum_partials``), so
    distinct blocks sum disjoint key sets. The temp file carries a
    per-writer unique suffix so a retry racing its original never
    interleaves writes into one path; ``os.replace`` keeps the final
    promote atomic (identical content, last writer wins)."""
    import hashlib
    import uuid

    import pyarrow.parquet as pq

    if parts.num_rows == 0:
        return
    os.makedirs(tmp_dir, exist_ok=True)
    digest = hashlib.sha1(
        parts.to_pandas().to_csv(index=False).encode()).hexdigest()
    path = os.path.join(tmp_dir, f"{digest}.parquet")
    tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    pq.write_table(parts, tmp)
    os.replace(tmp, path)


def _tap_extract_commit(batch: pa.Table, tmp_dir: str) -> pa.Table:
    """Pass-through stage ahead of the docs write: computes the SAME
    associative commit partials the read-back pass derived from the
    written files (rows are byte-identical either side of write_parquet)
    and spills them as kilobyte side files — so the commit pass costs a
    read of tiny partials instead of a second scan of the whole written
    corpus (a fixed ~2-4 s floor that capped scaling efficiency)."""
    df = batch.select(["url", "text_sha256", "method", "shard"]).to_pandas()
    parts = _extract_commit_partials(df)
    _spill_partials(pa.Table.from_pandas(parts, preserve_index=False),
                    tmp_dir)
    return batch


def _tap_chunks_commit(batch: pa.Table, tmp_dir: str) -> pa.Table:
    """Chunks-stage twin of ``_tap_extract_commit``: spills the lineage
    checksum + token partials from the in-flight embedded batches."""
    cols = [c for c in ("url", "chunk_index", "n_chars", "shard")
            if c in batch.column_names]
    _spill_partials(_checksum_partials(batch.select(cols)), tmp_dir)
    return batch


def _read_tap_partials(tmp_dir: str) -> "ray.data.Dataset | None":
    files = sorted(glob.glob(os.path.join(tmp_dir, "*.parquet")))
    return ray.data.read_parquet(files) if files else None


def _write_dedup_partials(out_dir: str, shard: str, table: pa.Table) -> None:
    import pyarrow.parquet as pq
    d = os.path.join(out_dir, DEDUP_DIRNAME)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"{shard}.parquet.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(d, f"{shard}.parquet"))


def load_dup_winners(out_dir: str) -> Dict[str, str]:
    """Combine all shards' dedup partials -> {text_sha256: winner_url} for
    groups with total count > 1 (the only entries the broadcast needs).
    The combine runs on Arrow's multithreaded hash aggregate, not a python
    row loop; only the surviving dup-group winners become python objects.

    Scale note: the partial files are tiny relative to the corpus (one row
    per unique doc hash per shard, two short columns). Driver-side combine
    is fine to ~1e8 docs per run; beyond that ``run_rag_stage`` switches
    (dedup_mode='auto'/'join') to stages.dedup.winners_dataset_from_partials
    + mark_duplicates_join — a distributed groupby over the same partials
    and a hash join instead of this combine + broadcast."""
    import pyarrow.parquet as pq
    d = os.path.join(out_dir, DEDUP_DIRNAME)
    if not os.path.isdir(d):
        return {}
    tables = [pq.read_table(os.path.join(d, f))
              for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return {}
    allp = pa.concat_tables(tables)
    agg = allp.group_by(["text_sha256"]).aggregate(
        [("url_min", "min"), ("n", "sum")])
    dup = agg.filter(pc.greater(agg["n_sum"], 1))
    return dict(zip(dup.column("text_sha256").to_pylist(),
                    dup.column("url_min_min").to_pylist()))


def _combine_checksums(ds: "ray.data.Dataset") -> Dict[str, dict]:
    return _combine_checksum_partials(ds.map_batches(
        _checksum_partials, batch_format="pyarrow"))


def _combine_checksum_partials(partials: "ray.data.Dataset") -> Dict[str, dict]:
    acc: Dict[str, List[int]] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for s, n, ksum, ntok in zip(b.column("shard").to_pylist(),
                                    b.column("n_rows").to_pylist(),
                                    b.column("key_sum").to_pylist(),
                                    b.column("n_tokens").to_pylist()):
            e = acc.setdefault(s, [0, 0, 0])
            e[0] += n
            e[1] = (e[1] + ksum) & 0xFFFFFFFFFFFFFFFF
            e[2] += ntok
    return {s: {"n_rows": v[0], "checksum": f"{v[1]:016x}",
                "n_tokens": v[2]}
            for s, v in acc.items()}


def _commit(out_dir: str, stage: str, shard_paths: Dict[str, str],
            sums: Dict[str, dict]) -> None:
    rows = []
    for shard, src in sorted(shard_paths.items()):
        info = sums.get(shard, {"n_rows": 0, "checksum": "0" * 16})
        rows.append({
            "shard": shard, "row_start": 0, "row_end": info["n_rows"],
            "stage": stage, "parser_version": PARSER_VERSION,
            "checksum": info["checksum"], "status": "completed",
            "n_rows": info["n_rows"], "n_errors": 0,
        })
    append_lineage(out_dir, rows)


# above this many written doc rows (from parquet footers) the commit pass
# combines per shard in tasks instead of on the driver
EXTRACT_COMMIT_DRIVER_MAX_ROWS = 50_000_000


def _commit_partials_distributed(parts: "ray.data.Dataset",
                                 out_dir: str) -> Dict[str, dict]:
    """DISTRIBUTED commit combine — the hash-partitioned reduce the driver
    combine's comment promises: partial rows shuffle once on ``shard``,
    each group's task combines its shard's checksum + dedup partials and
    writes ``_dedup/<shard>.parquet`` ITSELF; the driver receives exactly
    one summary row per shard (bounded by shard count, never by docs)."""
    import numpy as np
    import pandas as pd

    def reduce_shard(df) -> pd.DataFrame:
        shard = df["shard"].iloc[0]
        cs = df[df["kind"] == "cs"]
        dd = df[df["kind"] == "dd"].groupby("h", as_index=False).agg(
            url_min=("url_min", "min"), n=("n", "sum"))
        _write_dedup_partials(out_dir, shard, pa.table({
            "text_sha256": pa.array(dd["h"], pa.string()),
            "url_min": pa.array(dd["url_min"], pa.string()),
            "n": pa.array(dd["n"].astype("int64"), pa.int64()),
        }))
        ks = np.add.reduce(cs["key_sum"].to_numpy(dtype=np.uint64)) \
            if len(cs) else np.uint64(0)
        return pd.DataFrame({
            "shard": [shard],
            "n_rows": [int(cs["n"].sum())],
            "checksum": [f"{int(ks):016x}"],
        })

    summary = parts.groupby("shard").map_groups(
        reduce_shard, batch_format="pandas").to_pandas()
    return {r["shard"]: {"n_rows": int(r["n_rows"]),
                         "checksum": r["checksum"]}
            for _, r in summary.iterrows()}


SEGMENTS_DIRNAME = "_segments"


def run_extract_stage(input_dir_or_paths, out_dir: str, *,
                      concurrency: Optional[int] = None,
                      batch_size: int = 64,
                      resume: bool = True,
                      commit_mode: str = "auto",
                      commit_source: str = "tap",
                      giant_split: bool = True) -> Dict[str, int]:
    """pages shards -> out_dir/docs (partitioned by shard) + lineage.

    ``giant_split`` (default on) routes giant layout payloads through the
    skew-safe segment path (stages.skewtools.ExtractPagesSegmentsRouter):
    the pages input is read ONCE; oversized payloads explode into bounded
    page-range segments parsed across the pool and spilled as parsed
    text, reassembled per url by one tiny keyed exchange after the main
    write — byte-identical output (conformance-tested), and no
    multi-hundred-page doc ever pins one actor for the whole parse.

    ``commit_mode``: 'driver' combines the commit partials with one Arrow
    C++ hash aggregate on the driver (fastest, fine to ~5e7 doc rows per
    run); 'distributed' shuffles the partials once on ``shard`` and each
    task commits its own shard (no driver-sized state); 'auto' picks from
    the written parquet footers.

    ``commit_source``: 'tap' (default) computes the commit partials
    INSIDE the write pipeline (pass-through ``_tap_extract_commit``
    spilling idempotent kilobyte side files) — no second scan of the
    written corpus; 'readback' re-reads the written shards' key columns
    (the pre-round-5 behavior, kept as the independent verification path
    — byte-identical lineage, pinned by test)."""
    from ..stages.skewtools import (
        DEFAULT_MAX_PAGES,
        GIANT_PAYLOAD_HINT,
        ExtractPagesSegmentsRouter,
        explode_giants_batch,
        reassemble_spilled_segments,
    )

    if commit_source not in ("tap", "readback"):
        raise ValueError(f"commit_source must be 'tap' or 'readback', "
                         f"got {commit_source!r}")
    shards = list_shards(input_dir_or_paths)
    docs_dir = os.path.join(out_dir, "docs")
    done = completed_shards(out_dir, STAGE_EXTRACT, PARSER_VERSION) if resume else set()
    pending = [p for p in shards if _shard_stem(p) not in done]
    if not pending:
        return {"shards_total": len(shards), "shards_run": 0}

    pending_stems = [_shard_stem(p) for p in pending]
    _clean_partitions(docs_dir, pending_stems)
    seg_dir = os.path.join(out_dir, SEGMENTS_DIRNAME)
    shutil.rmtree(seg_dir, ignore_errors=True)  # transient spill, mid-run only

    import functools

    conc = concurrency or _default_concurrency()
    tap_dir = os.path.join(out_dir, COMMIT_TAP_DIRNAME)
    shutil.rmtree(tap_dir, ignore_errors=True)  # stale partials: crashed run
    ds = ray.data.read_parquet(pending, include_paths=True)
    if giant_split:
        exploded = ds.map_batches(
            lambda t: explode_giants_batch(
                t, max_pages=DEFAULT_MAX_PAGES,
                size_hint=GIANT_PAYLOAD_HINT, keep=("path",)),
            batch_format="pyarrow")
        docs = exploded.map_batches(
            ExtractPagesSegmentsRouter, batch_format="pyarrow",
            batch_size=batch_size, concurrency=_pool(conc), num_cpus=1,
            fn_constructor_kwargs={"side_dir": seg_dir})
    else:
        docs = ds.map_batches(
            ExtractPages, batch_format="pyarrow", batch_size=batch_size,
            concurrency=_pool(conc), num_cpus=1)
    tap = functools.partial(_tap_extract_commit, tmp_dir=tap_dir)
    if commit_source == "tap":
        # batch_size=None: whole zero-copy blocks, one side file per block
        docs = docs.map_batches(tap, batch_format="pyarrow",
                                batch_size=None)
    docs.write_parquet(docs_dir, partition_cols=["shard"],
                      compression="zstd")
    if giant_split and glob.glob(os.path.join(seg_dir, "*.parquet")):
        reassembled = reassemble_spilled_segments(seg_dir)
        if commit_source == "tap":
            reassembled = reassembled.map_batches(
                tap, batch_format="pyarrow", batch_size=None)
        reassembled.write_parquet(
            docs_dir, partition_cols=["shard"], compression="zstd")
        shutil.rmtree(seg_dir, ignore_errors=True)

    # the commit pass builds BOTH the lineage checksums and the per-shard
    # dedup-winner partials (so the rag stage never re-scans the corpus
    # for global dedup). commit_source='tap': the partials were already
    # spilled from inside the write pipeline above — read the kilobyte
    # side files. 'readback': one pass over the written shards (3 short
    # columns). Either way the per-row work (sha1, grouping) ran in
    # tasks; the driver only combines associative partials — vectorized,
    # never a python loop over document rows. Driver partial volume is
    # ~1 dedup row per doc; fine to ~1e8 docs per run — beyond that,
    # commit_mode='distributed' hash-partitions the same partial stream
    # and writes _dedup shards from the reduce tasks.
    import numpy as np

    files = _partition_files(docs_dir, pending_stems)
    if commit_source == "tap":
        parts = _read_tap_partials(tap_dir)
        if parts is None:
            import pandas as pd
            parts = ray.data.from_pandas(_extract_commit_partials(
                pd.DataFrame(
                    columns=["url", "text_sha256", "method", "shard"])))
    else:
        written = ray.data.read_parquet(
            files, columns=["url", "text_sha256", "method"],
            include_paths=True,
        ).map_batches(_attach_shard_from_path, batch_format="pyarrow")
        parts = written.map_batches(_extract_commit_partials,
                                    batch_format="pandas")
    use_dist = commit_mode == "distributed" or (
        commit_mode == "auto"
        and _parquet_total_rows(files) > EXTRACT_COMMIT_DRIVER_MAX_ROWS)
    if use_dist:
        sums = _commit_partials_distributed(parts, out_dir)
    else:
        # driver combine runs on Arrow's multithreaded C++ hash aggregate —
        # pandas object-key groupby on the same partials measured 7s vs <1s
        tables = list(parts.iter_batches(batch_format="pyarrow",
                                         batch_size=65536))
        sums = {}
        dd_by_shard: Dict[str, pa.Table] = {}
        if tables:
            allp = pa.concat_tables(tables)
            cs = allp.filter(pc.equal(allp["kind"], "cs"))
            for s in set(cs.column("shard").to_pylist()):
                g = cs.filter(pc.equal(cs["shard"], s))
                ks = np.add.reduce(
                    g.column("key_sum").to_numpy().astype(np.uint64))
                sums[s] = {"n_rows": int(pc.sum(g.column("n")).as_py() or 0),
                           "checksum": f"{int(ks):016x}"}
            dd = allp.filter(pc.equal(allp["kind"], "dd")).group_by(
                ["shard", "h"]).aggregate([("url_min", "min"), ("n", "sum")])
            for s in set(dd.column("shard").to_pylist()):
                dd_by_shard[s] = dd.filter(pc.equal(dd["shard"], s))
        for s in pending_stems:
            g = dd_by_shard.get(s)
            _write_dedup_partials(out_dir, s, pa.table({
                "text_sha256": g.column("h") if g is not None
                else pa.array([], pa.string()),
                "url_min": g.column("url_min_min") if g is not None
                else pa.array([], pa.string()),
                "n": pc.cast(g.column("n_sum"), pa.int64()) if g is not None
                else pa.array([], pa.int64()),
            }))
    for s in pending_stems:
        if use_dist and s not in sums:
            # shard produced zero rows: task-side commit never saw it —
            # write its empty dedup partial here (idempotent)
            _write_dedup_partials(out_dir, s, pa.table({
                "text_sha256": pa.array([], pa.string()),
                "url_min": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }))
        sums.setdefault(s, {"n_rows": 0, "checksum": "0" * 16})
    _commit(out_dir, STAGE_EXTRACT,
            {s: s for s in pending_stems}, sums)
    shutil.rmtree(tap_dir, ignore_errors=True)
    return {"shards_total": len(shards), "shards_run": len(pending)}


def _parquet_total_rows(files: Sequence[str]) -> int:
    """Row count across parquet files from FOOTERS only (no data read)."""
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _partition_files(table_dir: str, shards: Sequence[str]) -> List[str]:
    files: List[str] = []
    for s in shards:
        files.extend(sorted(glob.glob(
            os.path.join(table_dir, f"shard={s}", "*.parquet"))))
    return files


def _attach_shard_from_path(batch: pa.Table) -> pa.Table:
    paths = batch.column("path").to_pylist()
    shards = [p.split("shard=")[-1].split("/")[0] for p in paths]
    return batch.drop_columns(["path"]).append_column(
        "shard", pa.array(shards, pa.string()))


def _non_empty(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.not_equal(batch.column("method"), "empty"))


# above this many dedup-partial rows (~one per unique doc per shard) the
# winner map stops being broadcastable and the rag stage switches to the
# distributed hash-join path automatically
DEDUP_BROADCAST_MAX_ROWS = 20_000_000


def _dedup_partial_rows(out_dir: str) -> int:
    """Total rows across the _dedup partials, from parquet FOOTERS only —
    the auto-gate reads no data to decide broadcast vs join."""
    import pyarrow.parquet as pq
    d = os.path.join(out_dir, DEDUP_DIRNAME)
    if not os.path.isdir(d):
        return 0
    return sum(pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
               for f in os.listdir(d) if f.endswith(".parquet"))


def run_rag_stage(out_dir: str, *, concurrency: Optional[int] = None,
                  embed_batch: int = 512, resume: bool = True,
                  embedder_cls=HashEmbedder,
                  dedup_mode: str = "auto",
                  commit_source: str = "tap") -> Dict[str, int]:
    """out_dir/docs -> dedup-mark -> chunk -> embed -> out_dir/chunks.

    Dedup winners are computed over the FULL corpus from the per-shard
    partials the extract stage committed. ``dedup_mode``:
      'broadcast' — combine partials on the driver (Arrow C++ hash agg),
        ray.put the winner map, probe per batch. Fastest while the
        DUPLICATE-group map fits one machine.
      'join' — distributed groupby over the partials + left-outer hash
        join of docs against the winner table (stages.dedup
        .mark_duplicates_join). No driver-sized state; the dup-saturated
        100x path. Identical output.
      'auto' (default) — 'join' iff the partials exceed
        DEDUP_BROADCAST_MAX_ROWS (decided from parquet footers only).
    Chunk/embed then read ONLY the pending shards' files."""
    from ..stages.dedup import (
        MarkDuplicatesFromBroadcast,
        compute_dup_winners,
        mark_duplicates_join,
        winners_dataset_from_docs,
        winners_dataset_from_partials,
    )

    if commit_source not in ("tap", "readback"):
        raise ValueError(f"commit_source must be 'tap' or 'readback', "
                         f"got {commit_source!r}")
    docs_dir = os.path.join(out_dir, "docs")
    chunks_dir = os.path.join(out_dir, "chunks")
    if not os.path.isdir(docs_dir):
        return {"shards_total": 0, "shards_run": 0}
    all_shards = sorted(
        d.split("=", 1)[1] for d in os.listdir(docs_dir)
        if d.startswith("shard="))
    done = completed_shards(out_dir, STAGE_CHUNKS, PARSER_VERSION) if resume else set()
    pending = [s for s in all_shards if s not in done]
    if not pending:
        return {"shards_total": len(all_shards), "shards_run": 0}
    _clean_partitions(chunks_dir, pending)

    conc = concurrency or _default_concurrency()
    use_join = dedup_mode == "join" or (
        dedup_mode == "auto"
        and _dedup_partial_rows(out_dir) > DEDUP_BROADCAST_MAX_ROWS)

    # heavy columns: read only the pending shards' files
    docs = ray.data.read_parquet(
        _partition_files(docs_dir, pending), include_paths=True,
        columns=["url", "text_extracted", "text_sha256", "method", "lang",
                 "host", "group_key"],
    ).map_batches(_attach_shard_from_path, batch_format="pyarrow")
    nonempty = docs.map_batches(_non_empty, batch_format="pyarrow")

    if use_join:
        # distributed winner table + hash join — no driver-sized state
        d = os.path.join(out_dir, DEDUP_DIRNAME)
        part_files = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith(".parquet")) if os.path.isdir(d) else []
        if part_files:
            winners_ds = winners_dataset_from_partials(part_files)
        else:
            winners_ds = winners_dataset_from_docs(
                ray.data.read_parquet(
                    docs_dir, columns=["url", "text_sha256", "method"]
                ).map_batches(_non_empty, batch_format="pyarrow"))
        todo = mark_duplicates_join(nonempty, winners_ds,
                                    num_partitions=max(2, conc // 2))
    else:
        # global dedup winners: combined from the per-shard partials the
        # extract stage committed (no corpus re-scan; falls back to a full
        # scan only if partials are missing, e.g. docs written by an older
        # version)
        winners = load_dup_winners(out_dir)
        if not winners and not os.path.isdir(
                os.path.join(out_dir, DEDUP_DIRNAME)):
            key_cols = ray.data.read_parquet(
                docs_dir, columns=["url", "text_sha256", "method"])
            winners = compute_dup_winners(
                key_cols.map_batches(_non_empty, batch_format="pyarrow"))
        winners_ref = ray.put(winners)
        todo = nonempty.map_batches(
            MarkDuplicatesFromBroadcast, batch_format="pyarrow",
            fn_constructor_kwargs={"winners_ref": winners_ref},
            concurrency=_pool(conc))
    chunks = todo.map_batches(chunk_docs_batch, batch_format="pyarrow")
    embedded = chunks.map_batches(
        embedder_cls, batch_format="pyarrow", batch_size=embed_batch,
        concurrency=_pool(conc), num_cpus=1)
    tap_dir = os.path.join(out_dir, COMMIT_TAP_DIRNAME + "_chunks")
    if commit_source == "tap":
        # lineage/billing partials spilled from inside the write pipeline
        # (n_chars rides along, no extra text read; see _tap_extract_commit
        # for the idempotence story) — the written corpus is never
        # re-scanned just to commit
        import functools
        shutil.rmtree(tap_dir, ignore_errors=True)
        embedded = embedded.map_batches(
            functools.partial(_tap_chunks_commit, tmp_dir=tap_dir),
            batch_format="pyarrow", batch_size=None)
    embedded.write_parquet(chunks_dir, partition_cols=["shard"],
                           compression="zstd")

    if commit_source == "tap":
        parts = _read_tap_partials(tap_dir)
        sums = _combine_checksum_partials(parts) if parts is not None else {}
    else:
        # n_chars rides along so the billing partial needs no extra text
        # read; chunk_index joins url in the per-row checksum key (see
        # _checksum_partials) so the readback twin stays byte-identical
        # to the tap
        written = ray.data.read_parquet(
            _partition_files(chunks_dir, pending),
            columns=["url", "chunk_index", "n_chars"], include_paths=True,
        ).map_batches(_attach_shard_from_path, batch_format="pyarrow")
        sums = _combine_checksums(written)
    # shards can legitimately produce zero chunks (all-empty docs)
    for s in pending:
        sums.setdefault(s, {"n_rows": 0, "checksum": "0" * 16,
                            "n_tokens": 0})
    _commit(out_dir, STAGE_CHUNKS, {s: s for s in pending}, sums)
    # durable billing ledger beside _lineage (reference billing.py:34-51
    # semantics): content-keyed filenames make the write idempotent, so
    # totals accumulate exactly once per shard across resumes
    append_metrics(out_dir, [
        {"stage": STAGE_CHUNKS, "key": s,
         "n_rows": sums[s]["n_rows"],
         "n_tokens": sums[s].get("n_tokens", 0),
         "n_errors": 0, "wall_s": 0.0}
        for s in pending])
    shutil.rmtree(tap_dir, ignore_errors=True)
    return {"shards_total": len(all_shards), "shards_run": len(pending)}


INDEX_BUCKETS = 32


def group_key_bucket(key: str, buckets: int = INDEX_BUCKETS) -> int:
    """Stable bucket for an index group_key (fnv-1a over utf-8, mod)."""
    h = 0xCBF29CE484222325
    for b in key.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % buckets


def run_index_stage(out_dir: str, concurrency: Optional[int] = None,
                    num_blocks: Optional[int] = None,
                    layout: str = "bucketed") -> str:
    """chunks -> index shards partitioned by gk_bucket = hash(group_key)
    mod INDEX_BUCKETS (the index-build groupby of SURVEY.md section 7.3;
    Chroma-collection analog). ``group_key`` stays as a column, so a
    keyed lookup prunes to one bucket directory then filters — standard
    bucketed layout.

    Why bucketed + capped write tasks: every hive write task emits one
    file per distinct partition value it holds, so partitioning directly
    on group_key cost tasks x 200 files (measured: a flat ~7 s of pure
    file creation that did not shrink with CPUs — a scaling-bench floor).
    tasks x 32 buckets bounds the fan-out independent of key
    cardinality.

    ``layout``: 'bucketed' (default) writes straight from the read
    tasks — up to tasks x INDEX_BUCKETS files, zero shuffle; right on
    one node. 'exchange' inserts a keyed hash exchange
    (groupby(gk_bucket).map_groups identity) so each bucket lands
    whole in ONE task — exactly one file per bucket, the layout a
    multi-node cluster wants (readers fetch one object per bucket; the
    shuffle cost amortizes across nodes). Identical ROWS either way —
    parity-pinned in tests/test_pipeline_identity.py; only the file
    layout differs. Locally the exchange's aggregator actors measured
    ~90 s of flat overhead at bench scale, hence not the default."""
    chunks_dir = os.path.join(out_dir, "chunks")
    index_dir = os.path.join(out_dir, "index")
    if not os.path.isdir(chunks_dir):
        return index_dir
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    conc = concurrency or _default_concurrency()

    def add_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.filter(pc.equal(t["is_duplicate"], False)).drop_columns(
            ["is_duplicate"])
        # group keys repeat heavily (host-derived): dictionary-encode
        # (one C hash pass) and run the per-byte Python FNV only over
        # the UNIQUE keys, then gather — same buckets as the scalar
        # function, ~rows/uniques x cheaper than hashing every row
        d = pc.dictionary_encode(t.column("group_key")).combine_chunks()
        uniq = np.asarray(
            [group_key_bucket(k) for k in d.dictionary.to_pylist()],
            dtype=np.int32)
        if len(uniq) == 0:
            buckets = pa.array(np.empty(0, dtype=np.int32), pa.int32())
        else:
            buckets = pa.array(uniq[d.indices.to_numpy()], pa.int32())
        return t.append_column("gk_bucket", buckets)

    # covering index: id + metadata + vector only — chunk text stays in the
    # chunks table and is fetched by id (3x fewer bytes than carrying text).
    # override_num_blocks coalesces write tasks AT THE READ (streaming, no
    # repartition barrier — a barrier measured 17s of materialization).
    # block count scales WITH concurrency (a fixed cap of 16 pinned the
    # stage to 16 tasks on any >8-CPU cluster); file fan-out stays bounded
    # at num_blocks x INDEX_BUCKETS, so more tasks cost files linearly —
    # override via ``num_blocks`` when the target filesystem prefers fewer
    ds = ray.data.read_parquet(
        chunks_dir,
        columns=["id", "url", "chunk_index", "host", "lang", "group_key",
                 "n_chars", "is_duplicate", "embedding", "embedding_type"],
        override_num_blocks=num_blocks or max(16, conc))
    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    if layout == "exchange":
        ds = ds.groupby("gk_bucket").map_groups(
            lambda t: t, batch_format="pyarrow")
    elif layout != "bucketed":
        raise ValueError(f"unknown index layout {layout!r} "
                         "(expected 'bucketed' or 'exchange')")
    ds.write_parquet(index_dir, partition_cols=["gk_bucket"],
                     compression="zstd")
    return index_dir


def run_pipeline(input_dir_or_paths, out_dir: str, *,
                 concurrency: Optional[int] = None,
                 resume: bool = True, build_index: bool = True,
                 dedup_mode: str = "auto") -> Dict[str, int]:
    stats = run_extract_stage(input_dir_or_paths, out_dir,
                              concurrency=concurrency, resume=resume)
    stats.update({f"rag_{k}": v for k, v in run_rag_stage(
        out_dir, concurrency=concurrency, resume=resume,
        dedup_mode=dedup_mode).items()})
    if build_index:
        run_index_stage(out_dir, concurrency=concurrency)
    return stats
