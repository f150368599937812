"""Per-partition lineage: the commit log that makes runs resumable.

One row per (input shard, stage, parser_version) written AFTER the shard's
output is fully on disk — the atomic write-then-commit that replaces the
reference's atomic JSON progress writes (/root/reference/src/services/RAG/
progress_store.py:10-51) and its size+mtime fast-skip predicate
(progress_store.py:54-61). A shard with no lineage row is (re)processed;
its stale partial output directory is removed first, so a crashed run
resumes to a byte-identical result.

The checksum is order-independent (uint64 wrap-sum of a per-row key hash)
so it is stable under any block/task ordering.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Dict, Iterable, List, Optional, Set

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import LINEAGE

LINEAGE_DIRNAME = "_lineage"


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, LINEAGE_DIRNAME)


def load_lineage(out_dir: str) -> Optional[pa.Table]:
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return None
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def completed_shards(out_dir: str, stage: str, parser_version: str) -> Set[str]:
    t = load_lineage(out_dir)
    if t is None:
        return set()
    rows = t.to_pylist()
    return {
        r["shard"] for r in rows
        if r["stage"] == stage and r["status"] == "completed"
        and r["parser_version"] == parser_version
    }


def append_lineage(out_dir: str, rows: List[dict]) -> str:
    """Write one lineage parquet file; filename is a pure function of its
    content (stage + shard set), so a rerun overwrites rather than
    duplicates — idempotent commit."""
    if not rows:
        return ""
    d = lineage_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    key = hashlib.sha1(
        "|".join(sorted(f"{r['stage']}:{r['shard']}" for r in rows)).encode()
    ).hexdigest()[:16]
    path = os.path.join(d, f"lineage-{key}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=LINEAGE), tmp)
    os.replace(tmp, path)  # atomic commit (progress_store.py:10-31 analog)
    return path


def row_key_hash_u64(keys: Iterable[str]) -> int:
    """Order-independent uint64 wrap-sum of sha1-derived row keys."""
    acc = 0
    for k in keys:
        acc = (acc + struct.unpack(
            "<Q", hashlib.sha1(k.encode("utf-8")).digest()[:8])[0]) & 0xFFFFFFFFFFFFFFFF
    return acc


def shard_checksums(table: pa.Table, shard_col: str = "shard",
                    key_col: str = "url") -> Dict[str, dict]:
    """{shard: {n_rows, checksum}} computed driver-side from a (small)
    projected table of (shard, key)."""
    shards = table.column(shard_col).to_pylist()
    keys = table.column(key_col).to_pylist()
    acc: Dict[str, dict] = {}
    for s, k in zip(shards, keys):
        ent = acc.setdefault(s, {"n_rows": 0, "sum": 0})
        ent["n_rows"] += 1
        ent["sum"] = (ent["sum"] + struct.unpack(
            "<Q", hashlib.sha1(k.encode("utf-8")).digest()[:8])[0]) & 0xFFFFFFFFFFFFFFFF
    return {
        s: {"n_rows": v["n_rows"], "checksum": f"{v['sum']:016x}"}
        for s, v in acc.items()
    }
