"""Per-document metadata stage (SURVEY M10): title / page-count analog of
the reference's fitz doc.metadata extraction
(/root/reference/src/utils/metadata_extractor.py:135-145), re-expressed
over the pages table's three payload routes:

- layout payload -> parsed page count, page dims, first-body-line title;
- HTML payload   -> <title> tag, page_count 1;
- direct text    -> first text line as title, page_count = 1 + number of
  PAGE BREAK markers (the reference's page-join marker, main.py:163).

Stateless row-local batch fn — compose with map_batches(batch_format=
"pyarrow").
"""

from __future__ import annotations

import re
from typing import Dict

import pyarrow as pa

from ..functions.layout import is_layout_payload, layout_metadata
from ..functions.textproc import _PAGE_BREAK_RE

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.IGNORECASE | re.DOTALL)


def _meta_for(text: str, html: bytes) -> Dict:
    payload = html or b""
    if is_layout_payload(payload) and not (text or "").strip():
        return layout_metadata(payload)
    if (text or "").strip():
        stripped = text.strip()
        return {
            "page_count": 1 + len(_PAGE_BREAK_RE.findall(text)),
            "title": stripped.split("\n", 1)[0][:200],
            "n_lines": text.count("\n") + 1,
            "page_width": 0, "page_height": 0,
        }
    m = _TITLE_RE.search(payload)
    title = m.group(1).decode("utf-8", errors="replace").strip() if m else ""
    return {"page_count": 1 if payload else 0, "title": title[:200],
            "n_lines": 0, "page_width": 0, "page_height": 0}


def doc_metadata_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    htmls = batch.column("html").to_pylist()
    metas = [_meta_for(t or "", h or b"") for t, h in zip(texts, htmls)]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "title": pa.array([m["title"] for m in metas], pa.string()),
        "page_count": pa.array([m["page_count"] for m in metas], pa.int32()),
        "n_lines": pa.array([m["n_lines"] for m in metas], pa.int64()),
        "page_width": pa.array([m["page_width"] for m in metas], pa.int32()),
        "page_height": pa.array([m["page_height"] for m in metas], pa.int32()),
    })
