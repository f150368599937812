"""JSON catalog source (SURVEY S5).

Reference analog: the course-catalog JSON reader
(/root/reference/src/services/QuestionGen/question_rag.py:17-48) parses a
``courses.json`` list into validated records before retrieval. Ray-native
shape: ``ray.data.read_json`` over one or many files, followed by a
row-local validation ``map_batches`` that drops records missing required
fields (the reference skips invalid course entries) and normalizes types.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa
import ray.data


def read_json_catalog(paths, *, required: Sequence[str] = ("code", "title"),
                      columns: Optional[List[str]] = None) -> "ray.data.Dataset":
    """Read a JSON/JSONL catalog into a Dataset, keeping only rows that
    carry every ``required`` field non-null and non-empty.

    Scale note: read_json streams per-file read tasks like read_parquet;
    the validation filter is a vectorized Arrow pass (no row loop)."""
    ds = ray.data.read_json(paths)

    def valid(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = None
        for f in required:
            if f not in batch.schema.names:
                return batch.schema.empty_table()
            col = batch.column(f)
            ok = pc.is_valid(col)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                ok = pc.and_(ok, pc.not_equal(
                    pc.coalesce(col, pa.scalar("", col.type)), ""))
            mask = ok if mask is None else pc.and_(mask, ok)
        out = batch.filter(mask) if mask is not None else batch
        return out.select(columns) if columns else out

    return ds.map_batches(valid, batch_format="pyarrow")
