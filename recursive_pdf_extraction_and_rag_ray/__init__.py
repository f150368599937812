"""Ray-Data-native main-content extraction + RAG indexing engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo (awun8191/Recursive-PDF-EXTRACTION-AND-RAG, studied read-only
at /root/reference), re-expressed Ray-Data-first:

- input: Parquet shards of Common-Crawl-style pages
  ``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
- extraction: ``map_batches`` over zero-copy Arrow batches; stateful parser
  actor pools; HTML boilerplate strip + layout parse with deterministic,
  byte-identical output per url (reference semantics: effective-char
  acceptance ``ocr_engine.py:229-234``, page-break normalization
  ``main.py:169``)
- downstream: chunk -> dedup -> embed -> groupby index build
  (reference: ``convert_to_embeddings.py:341-430``)
- state: per-partition lineage + exact resume (reference analog:
  ``progress_store.py``)

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

PARSER_VERSION = "rpx-1"
