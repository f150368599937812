"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship extraction pipeline over pages synthesized
  deterministically from /root/testdata/sf0.001/documents.parquet
  (input_hint shape: url, warc_ts, html, text, lang) -> chunks Dataset.
- ``queries()``: one entry per implemented operator/pipeline
  (SURVEY.md section 2 + the training-data operator family).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query,
  column names matched exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from recursive_pdf_extraction_and_rag_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> synthetic
    pages -> extract -> chunk -> embed; returns the chunks Dataset."""
    import ray.data

    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
        pages_from_documents_batch,
    )
    from recursive_pdf_extraction_and_rag_ray.stages.chunk import chunk_docs_batch
    from recursive_pdf_extraction_and_rag_ray.stages.embed import HashEmbedder
    from recursive_pdf_extraction_and_rag_ray.stages.extract import ExtractPages

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"])
    pages = docs.map_batches(pages_from_documents_batch, batch_format="pyarrow")
    extracted = pages.map_batches(ExtractPages, batch_format="pyarrow",
                                  batch_size=64, concurrency=(1, 8))
    chunks = extracted.map_batches(chunk_docs_batch, batch_format="pyarrow")
    return chunks.map_batches(HashEmbedder, batch_format="pyarrow",
                              batch_size=96, concurrency=(1, 4))


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
