"""Export sinks: parquet is the native output everywhere; JSONL/CSV match
the reference's export formats (per-file JSONL writer
/root/reference/src/services/RAG/convert_to_embeddings.py:376-426; Chroma
-> JSONL/CSV dump /root/reference/src/services/RAG/inspect_chroma.py:194-252).
"""

from __future__ import annotations

from typing import List, Optional

import ray.data


def export_jsonl(ds: "ray.data.Dataset", path: str,
                 drop_embeddings: bool = False) -> str:
    """Chunk records -> JSONL directory (one file per block). Embeddings
    optionally dropped, like inspect_chroma's --no-embeddings export."""
    if drop_embeddings and ds.schema() and "embedding" in ds.schema().names:
        ds = ds.drop_columns(["embedding"])
    ds.write_json(path)
    return path


CSV_COLUMNS = ["id", "url", "chunk_index", "total_chunks_in_doc",
               "chunk_hash", "doc_hash", "host", "lang", "group_key",
               "n_chars"]


def export_csv(ds: "ray.data.Dataset", path: str,
               columns: Optional[List[str]] = None) -> str:
    """Fixed scalar column set (CSV can't carry vectors/structs; the
    reference's CSV export pins a fixed column list the same way)."""
    cols = columns or [c for c in CSV_COLUMNS
                       if ds.schema() and c in ds.schema().names]
    ds.select_columns(cols).write_csv(path)
    return path


def compact_parquet(in_dir: str, out_dir: str, *,
                    target_rows_per_file: int = 1_000_000,
                    compression: str = "zstd") -> dict:
    """Small-file compaction — the maintenance pass every incremental
    pipeline eventually needs: a directory that accumulated thousands
    of tiny parquet files (per-shard commits, spilled segments,
    streaming appends) is rewritten as ceil(rows/target) right-sized
    files. Streaming read -> repartition -> write; row-count verified
    before the result is reported, so a failed compaction never looks
    complete. The input directory is left untouched (caller swaps
    directories atomically — same pattern as the lineage commits)."""
    import math
    import os

    import ray.data

    ds = ray.data.read_parquet(in_dir)
    n = ds.count()
    files_in = sum(len(fs) for _, _, fs in os.walk(in_dir))
    blocks = max(1, math.ceil(n / target_rows_per_file))
    os.makedirs(out_dir, exist_ok=True)
    ds.repartition(blocks).write_parquet(out_dir,
                                         compression=compression)
    check = ray.data.read_parquet(out_dir).count()
    if check != n:
        raise RuntimeError(
            f"compaction row-count mismatch: {n} in, {check} out")
    files_out = sum(len(fs) for _, _, fs in os.walk(out_dir))
    return {"rows": n, "files_in": files_in, "files_out": files_out}
