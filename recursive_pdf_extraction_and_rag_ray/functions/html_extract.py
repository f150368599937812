"""Main-content extraction from HTML: boilerplate stripping via
text-density / link-density heuristics (in the spirit of the public
boilerplate-detection literature — Kohlschuetter et al. "Boilerplate
Detection using Shallow Text Features", WSDM 2010 — and of
trafilatura/readability), implemented on the stdlib ``html.parser`` so the
exact same pure-Python code runs in the oracle and inside Ray actors.

This replaces the reference's OCR branch (the "no usable text layer" path,
/root/reference/src/services/RAG/ocr_engine.py:237-266) for web payloads:
deterministic block extraction instead of model OCR. Output is the
byte-identity contract — do not change constants without bumping
``PARSER_VERSION``.

Algorithm (fully deterministic):
1. Parse the byte payload as utf-8 HTML (errors="replace").
2. Ignore everything inside ``script/style/noscript/template/svg/iframe``.
3. Flush a text *block* at every block-level tag boundary; block text is
   whitespace-collapsed (``" ".join(raw.split())``).
4. A block is boilerplate and dropped when ANY of:
   - it sits inside ``nav/header/footer/aside/form/button/select`` ;
   - its link density (chars inside <a> / total chars) > 0.33 ;
   - it is shorter than 25 chars and not a heading (h1-h6 with >= 8 chars).
5. Kept blocks joined with "\\n\\n"; spans record each block's offsets.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple

IGNORE_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "iframe"})
BOILER_CTX_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "button", "select"})
BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "li", "ul", "ol", "table", "tr",
    "td", "th", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
    "body", "br", "hr", "figcaption", "dd", "dt",
})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 25
MIN_HEADING_CHARS = 8


class _Block:
    __slots__ = ("parts", "link_chars", "boiler_ctx", "tag")

    def __init__(self, tag: str, boiler_ctx: bool):
        self.parts: List[str] = []
        self.link_chars = 0
        self.boiler_ctx = boiler_ctx
        self.tag = tag

    def text(self) -> str:
        return " ".join("".join(self.parts).split())


class _ContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[_Block] = []
        self._cur: Optional[_Block] = None
        self._ignore_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._cur_tag = "body"

    # -- block lifecycle --
    def _flush(self) -> None:
        if self._cur is not None:
            self.blocks.append(self._cur)
            self._cur = None

    def _ensure(self) -> _Block:
        if self._cur is None:
            self._cur = _Block(self._cur_tag, self._boiler_depth > 0)
        return self._cur

    # -- HTMLParser hooks --
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in IGNORE_TAGS:
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag in BOILER_CTX_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            self._cur_tag = tag

    def handle_endtag(self, tag: str) -> None:
        if tag in IGNORE_TAGS:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if self._ignore_depth:
            return
        if tag in BOILER_CTX_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._ignore_depth or not data:
            return
        blk = self._ensure()
        blk.parts.append(data)
        if self._link_depth:
            blk.link_chars += len(data)


def _keep(block: _Block, text: str) -> bool:
    if block.boiler_ctx:
        return False
    n = len(text)
    if n == 0:
        return False
    raw_len = len("".join(block.parts))
    link_density = block.link_chars / raw_len if raw_len else 0.0
    if link_density > MAX_LINK_DENSITY:
        return False
    if block.tag in HEADING_TAGS:
        return n >= MIN_HEADING_CHARS
    return n >= MIN_BLOCK_CHARS


def extract_html(payload: bytes) -> Tuple[str, List[Tuple[int, int, int]]]:
    """payload -> (main_text, spans). spans = [(block_id, start, end)] with
    offsets into main_text; blocks joined by "\\n\\n"."""
    parser = _ContentParser()
    parser.feed(payload.decode("utf-8", errors="replace"))
    parser.close()
    parser._flush()

    kept: List[str] = []
    for blk in parser.blocks:
        text = blk.text()
        if _keep(blk, text):
            kept.append(text)

    spans: List[Tuple[int, int, int]] = []
    pos = 0
    for i, text in enumerate(kept):
        if i:
            pos += 2  # the "\n\n" joiner
        spans.append((i, pos, pos + len(text)))
        pos += len(text)
    return "\n\n".join(kept), spans
