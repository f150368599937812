"""Golden pin of the extraction/chunking semantics (SURVEY.md section 5
item 3). The oracle and the engine share the semantics functions, so a
shared bug would pass the byte-identity tests silently — this committed
golden pins the ABSOLUTE values from a known-good run. Any change here is
a semantic break: bump PARSER_VERSION and regenerate deliberately."""

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from recursive_pdf_extraction_and_rag_ray.oracle import (
    oracle_chunks,
    oracle_corpus_dedup,
    oracle_extract,
)
from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import synthesize_corpus

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden_semantics.json")))


def test_semantics_match_committed_golden(tmp_path):
    g = GOLDEN["generator"]
    paths = synthesize_corpus(str(tmp_path), n_docs=g["n_docs"],
                              n_shards=g["n_shards"], seed=g["seed"])
    pages = pa.concat_tables([pq.read_table(p) for p in paths])
    assert pages.num_rows == GOLDEN["n_pages"]

    docs = oracle_extract(pages)
    methods = {m: sum(1 for x in docs if x["method"] == m)
               for m in ("direct", "parsed", "empty")}
    assert methods == GOLDEN["methods"]

    for url, digest in GOLDEN["doc_digests"].items():
        got = next(x for x in docs if x["url"] == url)
        assert got["text_sha256"] == digest, url

    all_digest = hashlib.sha256("".join(
        x["text_sha256"] for x in sorted(docs, key=lambda y: y["url"])
    ).encode()).hexdigest()
    assert all_digest == GOLDEN["all_docs_digest"]

    dup = oracle_corpus_dedup(docs)
    assert sum(1 for v in dup.values() if v) == GOLDEN["n_dup_docs"]

    surviving = [x for x in docs if x["method"] != "empty" and dup[x["url"]] == ""]
    chunks = oracle_chunks(surviving)
    assert len(chunks) == GOLDEN["n_chunks"]
    assert sum(1 for c in chunks if c["is_duplicate"]) == GOLDEN["n_dup_chunks"]
    ids_digest = hashlib.sha256("".join(
        sorted(c["id"] for c in chunks)).encode()).hexdigest()
    assert ids_digest == GOLDEN["chunk_ids_sha256"]
