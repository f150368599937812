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
