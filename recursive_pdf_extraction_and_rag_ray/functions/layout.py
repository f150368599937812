"""Layout-payload parser: the PDF-layout analog of the extraction path.

The corpus generator emits, for a fraction of rows, a page-oriented binary
payload (magic ``%RPX-LAYOUT 1``) that stands in for a parsed PDF text dump:
positioned lines on fixed-size pages, with running headers/footers and 1-2
column layouts. This module turns it back into reading-order main text:

- **header/footer removal**: a line whose normalized text repeats in the
  top/bottom 8% band on >= half the pages (min 2) is dropped everywhere
  (the classic repeated-furniture heuristic of PDF text extraction);
- **column detection**: lines with ``x >= page_width/2`` form column 1 when
  both halves are populated on that page; reading order is column-major;
- **line ordering**: within a column, sort by the coarse grid
  ``(round(y/16), round(x/16))`` — the same ordering rule as the
  reference's OCR line sort (/root/reference/src/services/RAG/
  ocr_engine.py:196, convert_to_embeddings.py:276);
- pages joined with "\\n" exactly like the reference joins OCR'd pages
  (ocr_engine.py:258).

Payload grammar (utf-8 text):
    %RPX-LAYOUT 1\\n
    PAGE <width> <height>\\n
    <x> <y> <text>\\n        (repeated)
    PAGE <width> <height>\\n  ... next page
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

LAYOUT_MAGIC = b"%RPX-LAYOUT 1"
_DIGITS_RE = re.compile(r"\d+")


def _furniture_key(text: str) -> str:
    """Normalized census key: whitespace collapsed, digit runs -> '#' so
    page numbers ('- 1 -', '- 2 -', ...) count as the same furniture."""
    return _DIGITS_RE.sub("#", " ".join(text.split()))
BAND_FRACTION = 0.08
REPEAT_MIN_PAGES = 2
REPEAT_FRACTION = 0.5


def is_layout_payload(payload: bytes) -> bool:
    return payload.startswith(LAYOUT_MAGIC)


def _parse_pages(payload: bytes) -> List[Tuple[int, int, List[Tuple[int, int, str]]]]:
    pages: List[Tuple[int, int, List[Tuple[int, int, str]]]] = []
    lines = payload.decode("utf-8", errors="replace").split("\n")
    cur: List[Tuple[int, int, str]] = []
    w = h = 0
    for ln in lines[1:]:  # skip magic
        if not ln:
            continue
        if ln.startswith("PAGE "):
            if w:
                pages.append((w, h, cur))
            _, ws, hs = ln.split(" ", 2)
            w, h, cur = int(ws), int(hs), []
        else:
            xs, ys, text = ln.split(" ", 2)
            cur.append((int(xs), int(ys), text))
    if w:
        pages.append((w, h, cur))
    return pages


def layout_metadata(payload: bytes) -> Dict:
    """Doc-level metadata from a layout payload — the analog of the
    reference's fitz doc.metadata extraction (title/dates/page_count,
    /root/reference/src/utils/metadata_extractor.py:135-145). The payload
    carries no embedded dates, so the fields are: page count, page
    dimensions, total positioned lines, and the title = first body line
    after furniture removal."""
    pages = _parse_pages(payload)
    if not pages:
        return {"page_count": 0, "title": "", "n_lines": 0,
                "page_width": 0, "page_height": 0}
    text, _ = extract_layout(payload)
    return {
        "page_count": len(pages),
        "title": text.split("\n", 1)[0] if text else "",
        "n_lines": sum(len(lines) for _, _, lines in pages),
        "page_width": pages[0][0],
        "page_height": pages[0][1],
    }


def extract_layout(payload: bytes) -> Tuple[str, List[Tuple[int, int, int]]]:
    """payload -> (text, spans); one span per page, offsets into text."""
    pages = _parse_pages(payload)
    n_pages = len(pages)
    if n_pages == 0:
        return "", []

    # pass 1: furniture census over top/bottom bands
    band_counts: Dict[str, int] = {}
    for w, h, lines in pages:
        top, bot = h * BAND_FRACTION, h * (1 - BAND_FRACTION)
        seen_on_page = set()
        for x, y, text in lines:
            if y <= top or y >= bot:
                key = _furniture_key(text)
                if key and key not in seen_on_page:
                    seen_on_page.add(key)
                    band_counts[key] = band_counts.get(key, 0) + 1
    threshold = max(REPEAT_MIN_PAGES, int(n_pages * REPEAT_FRACTION + 0.9999))
    furniture = {t for t, c in band_counts.items() if c >= threshold}

    # pass 2: per-page column split + coarse-grid ordering
    page_texts: List[str] = []
    for w, h, lines in pages:
        top, bot = h * BAND_FRACTION, h * (1 - BAND_FRACTION)
        body = [
            (x, y, text) for x, y, text in lines
            if not ((y <= top or y >= bot) and _furniture_key(text) in furniture)
        ]
        mid = w / 2
        has_left = any(x < mid for x, _, _ in body)
        has_right = any(x >= mid for x, _, _ in body)
        two_cols = has_left and has_right
        ordered = sorted(
            body,
            key=lambda it: (
                1 if (two_cols and it[0] >= mid) else 0,  # column-major
                round(it[1] / 16),                        # coarse row grid
                round(it[0] / 16),                        # coarse col grid
            ),
        )
        page_texts.append("\n".join(text for _, _, text in ordered))

    full = "\n".join(page_texts)
    spans: List[Tuple[int, int, int]] = []
    pos = 0
    for i, pt in enumerate(page_texts):
        if i:
            pos += 1  # the "\n" page joiner
        spans.append((i, pos, pos + len(pt)))
        pos += len(pt)
    return full, spans
