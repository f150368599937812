"""Pure-Python oracle: reference semantics applied row-at-a-time, single
process, no Ray. The pytest suite compares the Ray pipeline's output against
this byte-for-byte (extracted text digests per url, chunk ids, dup maps) —
the conformance strategy SURVEY.md section 5 calls for, standing in for the
reference's golden runtime artifacts
(/root/reference/src/services/RAG/OUTPUT_DATA/)."""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

from ..functions.extract_doc import extract_document
from ..functions.textproc import chunk_records, sha256_text
from ..functions.urlmeta import parse_url_meta


def oracle_extract(pages: pa.Table) -> List[dict]:
    """pages table -> docs_extracted rows (plain dicts, input order)."""
    out: List[dict] = []
    for row in pages.to_pylist():
        text_x, method, spans = extract_document(row["text"] or "", row["html"] or b"")
        meta = parse_url_meta(row["url"])
        out.append({
            "url": row["url"],
            "text_extracted": text_x,
            "text_sha256": sha256_text(text_x),
            "spans": [{"block_id": b, "start": s, "end": e} for b, s, e in spans],
            "method": method,
            "n_blocks": len(spans),
            "n_chars": len(text_x),
            "lang": row["lang"],
            "host": meta["host"],
            "group_key": meta["group_key"],
        })
    return out


def oracle_chunks(docs: List[dict]) -> List[dict]:
    """docs_extracted rows -> chunk rows (reference id/dup semantics via the
    shared functions; skips method=='empty' rows like
    convert_to_embeddings.py:357-358 skips empty_text)."""
    out: List[dict] = []
    for d in docs:
        if d["method"] == "empty":
            continue
        out.extend(chunk_records(d["url"], d["text_extracted"], lang=d["lang"],
                                 group_key=d["group_key"], host=d["host"]))
    return out


def oracle_corpus_dedup(docs: List[dict]) -> Dict[str, str]:
    """Exact whole-corpus dedup, keep-first: winner per text digest is the
    lexicographically-smallest url (deterministic total order; reference
    seen-files index semantics, convert_to_embeddings.py:559-566).
    Returns {url: duplicate_of_url_or_empty} for non-empty docs."""
    winner: Dict[str, str] = {}
    for d in sorted(docs, key=lambda d: d["url"]):
        if d["method"] == "empty":
            continue
        winner.setdefault(d["text_sha256"], d["url"])
    return {
        d["url"]: ("" if winner[d["text_sha256"]] == d["url"] else winner[d["text_sha256"]])
        for d in docs if d["method"] != "empty"
    }
