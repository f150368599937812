"""Declared Arrow schemas for every table crossing a stage boundary.

The reference keeps schemas implicit in dict literals
(/root/reference/src/services/RAG/convert_to_embeddings.py:392-426,
README.md:147-191); here they are first-class and validated at stage
boundaries."""

from __future__ import annotations

import pyarrow as pa

EMBED_DIM = 64  # deterministic local hash-embedder dim (BGE-M3 analog is 1024)

PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

DOCS_EXTRACTED = pa.schema([
    ("url", pa.string()),
    ("text_extracted", pa.large_string()),
    ("text_sha256", pa.string()),
    ("spans", pa.list_(pa.struct([
        ("block_id", pa.int32()),
        ("start", pa.int64()),
        ("end", pa.int64()),
    ]))),
    ("method", pa.string()),
    ("n_blocks", pa.int32()),
    ("n_chars", pa.int64()),
    ("lang", pa.string()),
    ("host", pa.string()),
    ("group_key", pa.string()),
    ("doc_hash", pa.string()),
])

CHUNKS = pa.schema([
    ("id", pa.string()),
    ("url", pa.string()),
    ("chunk_index", pa.int32()),
    ("total_chunks_in_doc", pa.int32()),
    ("text", pa.large_string()),
    ("chunk_hash", pa.string()),
    ("doc_hash", pa.string()),
    ("is_duplicate", pa.bool_()),
    ("duplicate_of_index", pa.int32()),
    ("duplicate_of_hash", pa.string()),
    ("host", pa.string()),
    ("lang", pa.string()),
    ("group_key", pa.string()),
    ("n_chars", pa.int64()),
])

CHUNKS_EMBEDDED = CHUNKS.append(pa.field("embedding", pa.list_(pa.float32(), EMBED_DIM))) \
                        .append(pa.field("embedding_type", pa.string()))

LINEAGE = pa.schema([
    ("shard", pa.string()),
    ("row_start", pa.int64()),
    ("row_end", pa.int64()),
    ("stage", pa.string()),
    ("parser_version", pa.string()),
    ("checksum", pa.string()),
    ("status", pa.string()),
    ("n_rows", pa.int64()),
    ("n_errors", pa.int64()),
])

METRICS = pa.schema([
    ("stage", pa.string()),
    ("key", pa.string()),
    ("n_rows", pa.int64()),
    ("n_tokens", pa.int64()),
    ("n_errors", pa.int64()),
    ("wall_s", pa.float64()),
])


def validate(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Cheap boundary check: required names present with compatible types
    (cast used for width-only differences, e.g. string vs large_string)."""
    missing = set(schema.names) - set(table.column_names)
    if missing:
        raise ValueError(f"{where}: missing columns {sorted(missing)}")
    return table
