"""Per-document extraction routing: the analog of the reference's
``extract_text`` orchestrator (/root/reference/src/services/RAG/
ocr_engine.py:207-266) over web payloads.

Routes (policy "fallback", the reference default):
1. **direct** — the row's ``text`` column has a usable text layer:
   ``effective_chars(normalize_text(text)) >= 50`` (accept threshold of
   ocr_engine.py:229-234). Output = ``normalize_text(text)``.
2. **parsed** — otherwise parse the binary ``html`` payload: layout payload
   (magic-sniffed) -> ``extract_layout``; else HTML -> ``extract_html``
   (the OCR-branch analog, ocr_engine.py:237-266). The same ``eff >= 50``
   accept gate applies to the parsed output (ocr_engine.py:259-266).
3. **empty** — nothing usable: empty text, method "empty" (skip reason
   ``empty_text``, convert_to_embeddings.py:357-358).

``force_parse`` mirrors ``--force-ocr`` (always take the parse path);
``policy="skip"`` mirrors ``--ocr-on-missing skip`` (never parse, emit
empty); ``policy="error"`` raises on a missing text layer.
"""

from __future__ import annotations

from typing import List, Tuple

from .html_extract import extract_html
from .layout import extract_layout, is_layout_payload
from .textproc import MIN_EFFECTIVE_CHARS, effective_chars, normalize_text

METHOD_DIRECT = "direct"
METHOD_PARSED = "parsed"
METHOD_EMPTY = "empty"


class MissingTextLayerError(ValueError):
    pass


def extract_document(
    text: str,
    html: bytes,
    *,
    force_parse: bool = False,
    policy: str = "fallback",
) -> Tuple[str, str, List[Tuple[int, int, int]]]:
    """-> (text_extracted, method, spans). Deterministic; byte-identity
    contract shared by oracle and engine."""
    if not force_parse and policy != "skip" and text:
        direct = normalize_text(text)
        if effective_chars(direct) >= MIN_EFFECTIVE_CHARS:
            spans = [(0, 0, len(direct))] if direct else []
            return direct, METHOD_DIRECT, spans

    if policy == "error" and not force_parse:
        raise MissingTextLayerError("no usable text layer and policy=error")
    if policy == "skip" and not force_parse:
        return "", METHOD_EMPTY, []

    if html:
        if is_layout_payload(html):
            parsed, spans = extract_layout(html)
        else:
            parsed, spans = extract_html(html)
        if effective_chars(parsed) >= MIN_EFFECTIVE_CHARS:
            return parsed, METHOD_PARSED, spans

    return "", METHOD_EMPTY, []
