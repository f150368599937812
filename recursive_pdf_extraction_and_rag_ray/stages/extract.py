"""Extraction stage: pages -> docs_extracted.

The per-batch callable is a CLASS so it runs as a Ray actor pool
(``map_batches(ExtractPages, concurrency=..., batch_size=...)``): parser
state (compiled regexes; in a real deployment lxml/model handles) is built
once per actor in ``__init__`` — the Ray-native analog of the reference's
per-process OCR singletons and pool warm-up
(/root/reference/src/services/RAG/convert_to_embeddings.py:331-339,576-584).

Semantics per row are exactly ``functions.extract_doc.extract_document``
(the byte-identity contract). Batches are Arrow in / Arrow out; the per-row
Python loop is inherent (document parsing is per-document work — this is
the useful compute the pipeline exists to do), everything around it is
columnar.

A ``shard`` column (input file stem, from ``read_parquet(include_paths=
True)``) is carried through for partitioned/resumable output and lineage.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow as pa

from .. import PARSER_VERSION
from ..functions.extract_doc import extract_document
from ..functions.textproc import sha256_text
from ..functions.urlmeta import parse_url_meta

SPANS_TYPE = pa.list_(pa.struct([
    ("block_id", pa.int32()), ("start", pa.int64()), ("end", pa.int64()),
]))


def shard_from_path(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


class ExtractPages:
    """pages batch (pyarrow) -> docs_extracted batch (pyarrow)."""

    parser_version = PARSER_VERSION

    def __init__(self, policy: str = "fallback", force_parse: bool = False,
                 keep_path_as_shard: bool = True):
        self.policy = policy
        self.force_parse = force_parse
        self.keep_path_as_shard = keep_path_as_shard

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        paths: Optional[List[str]] = (
            batch.column("path").to_pylist()
            if (self.keep_path_as_shard and "path" in batch.column_names) else None
        )

        n = len(urls)
        text_x: List[str] = [""] * n
        digest: List[str] = [""] * n
        spans_col: List[list] = [[]] * n
        method: List[str] = [""] * n
        n_blocks: List[int] = [0] * n
        n_chars: List[int] = [0] * n
        hosts: List[str] = [""] * n
        gkeys: List[str] = [""] * n
        dhash: List[str] = [""] * n

        for i in range(n):
            tx, m, spans = extract_document(
                texts[i] or "", htmls[i] or b"",
                force_parse=self.force_parse, policy=self.policy,
            )
            meta = parse_url_meta(urls[i])
            text_x[i] = tx
            digest[i] = sha256_text(tx)
            spans_col[i] = [
                {"block_id": b, "start": s, "end": e} for b, s, e in spans
            ]
            method[i] = m
            n_blocks[i] = len(spans)
            n_chars[i] = len(tx)
            hosts[i] = meta["host"]
            gkeys[i] = meta["group_key"]
            dhash[i] = digest[i]  # doc-level exact-dedup key

        cols = {
            "url": pa.array(urls, pa.string()),
            "text_extracted": pa.array(text_x, pa.large_string()),
            "text_sha256": pa.array(digest, pa.string()),
            "spans": pa.array(spans_col, SPANS_TYPE),
            "method": pa.array(method, pa.string()),
            "n_blocks": pa.array(n_blocks, pa.int32()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "group_key": pa.array(gkeys, pa.string()),
            "doc_hash": pa.array(dhash, pa.string()),
        }
        if paths is not None:
            cols["shard"] = pa.array([shard_from_path(p) for p in paths], pa.string())
        return pa.table(cols)
