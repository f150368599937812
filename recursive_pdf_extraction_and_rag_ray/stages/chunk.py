"""Chunking stage: docs_extracted -> chunks (a flat-map: one doc row fans
out to N chunk rows). Stateless — plain tasks, no actor pool needed.

Row-local by construction (reference semantics: chunk/merge/overlap/dedupe
all operate within one document, /root/reference/src/services/RAG/
chunking.py:6-61), so this stage shuffles nothing.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from ..functions.textproc import chunk_records


def chunk_docs_batch(batch: pa.Table) -> pa.Table:
    """docs_extracted batch -> chunks batch. Skips method=='empty' docs
    (reference skip reason ``empty_text``, convert_to_embeddings.py:357-358)
    and docs marked as corpus-level duplicates (``duplicate_of`` non-empty),
    mirroring the seen-files skip (convert_to_embeddings.py:559-566)."""
    has_dup_col = "duplicate_of" in batch.column_names
    has_shard = "shard" in batch.column_names
    urls = batch.column("url").to_pylist()
    texts = batch.column("text_extracted").to_pylist()
    langs = batch.column("lang").to_pylist()
    hosts = batch.column("host").to_pylist()
    gkeys = batch.column("group_key").to_pylist()
    methods = batch.column("method").to_pylist()
    dups = batch.column("duplicate_of").to_pylist() if has_dup_col else [""] * len(urls)
    shards = batch.column("shard").to_pylist() if has_shard else [""] * len(urls)

    rows: List[dict] = []
    for url, text, lang, host, gk, method, dup, shard in zip(
            urls, texts, langs, hosts, gkeys, methods, dups, shards):
        if method == "empty" or (dup or "") != "":
            continue
        recs = chunk_records(url, text, lang=lang, group_key=gk, host=host)
        if has_shard:
            for r in recs:
                r["shard"] = shard
        rows.extend(recs)

    schema_fields = [
        ("id", pa.string()), ("url", pa.string()),
        ("chunk_index", pa.int32()), ("total_chunks_in_doc", pa.int32()),
        ("text", pa.large_string()), ("chunk_hash", pa.string()),
        ("doc_hash", pa.string()), ("is_duplicate", pa.bool_()),
        ("duplicate_of_index", pa.int32()), ("duplicate_of_hash", pa.string()),
        ("host", pa.string()), ("lang", pa.string()),
        ("group_key", pa.string()), ("n_chars", pa.int64()),
    ]
    if has_shard:
        schema_fields.append(("shard", pa.string()))
    schema = pa.schema(schema_fields)
    if not rows:
        return schema.empty_table()
    return pa.Table.from_pylist(rows, schema=schema)
