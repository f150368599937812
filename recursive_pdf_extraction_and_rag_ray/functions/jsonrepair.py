"""Balanced-JSON extraction / truncation repair for LLM output handling —
the last §2.9 scalar-library member.

Reference semantics (/root/reference/src/services/Gemini/
gemini_service.py:283-443), re-implemented from scratch with the same
fallback chain:

1. strip whitespace, drop a leading ```json fence and a trailing ```
   fence, strip again (gemini_service.py:284-289);
2. direct ``json.loads`` (``:291-293``);
3. else extract the FIRST balanced JSON object/array with a string- and
   escape-aware depth scan and parse that (``:297-341``);
4. else minimal truncation repair: from the first ``[``/``{``, track an
   opener stack (ignoring mismatched closers), close an open string with
   ``"`` and close the remaining stack in reverse, then parse
   (``:345-392``);
5. else give up and surface the raw text (``:388-392``  ->
   status ``failed`` here).

Everything is per-string scalar work (inherently sequential scans);
``parse_json_batch`` is the row-local ``map_batches`` wrapper.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Tuple

import pandas as pd

STATUS_DIRECT = "direct"
STATUS_BALANCED = "balanced"
STATUS_REPAIRED = "repaired"
STATUS_FAILED = "failed"


def strip_code_fences(s: str) -> str:
    s = (s or "").strip()
    if s.startswith("```json"):
        s = s[7:]
    if s.endswith("```"):
        s = s[:-3]
    return s.strip()


def extract_balanced_json(s: str) -> Optional[str]:
    """First balanced ``{...}``/``[...]`` substring, honoring strings and
    escapes; None when no opener or never balanced."""
    start = None
    opener = closer = ""
    for i, ch in enumerate(s):
        if ch in "{[":
            start, opener = i, ch
            closer = "}" if ch == "{" else "]"
            break
    if start is None:
        return None
    depth = 0
    in_string = escaped = False
    for j in range(start, len(s)):
        ch = s[j]
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
            continue
        if ch == '"':
            in_string = True
        elif ch == opener:
            depth += 1
        elif ch == closer:
            depth -= 1
            if depth == 0:
                return s[start:j + 1]
    return None


def repair_truncated_json(s: str) -> Optional[str]:
    """Close an unterminated string and any unclosed brackets/braces (in
    reverse opening order) from the first opener onward; mismatched
    closers are ignored exactly like the reference."""
    start = None
    for i, ch in enumerate(s):
        if ch in "[{":
            start = i
            break
    if start is None:
        return None
    in_string = escaped = False
    stack: list = []
    for ch in s[start:]:
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
            continue
        if ch == '"':
            in_string = True
        elif ch in "[{":
            stack.append(ch)
        elif ch in "]}":
            if stack:
                opener = stack[-1]
                if (opener == "[" and ch == "]") or \
                        (opener == "{" and ch == "}"):
                    stack.pop()
    repaired = s[start:]
    if in_string:
        repaired += '"'
    for opener in reversed(stack):
        repaired += "]" if opener == "[" else "}"
    return repaired


def loads_relaxed(text: str) -> Tuple[Any, str]:
    """-> (parsed_or_None, status) through the full fallback chain."""
    cleaned = strip_code_fences(text)
    try:
        return json.loads(cleaned), STATUS_DIRECT
    except json.JSONDecodeError:
        pass
    candidate = extract_balanced_json(cleaned)
    if candidate is not None:
        try:
            return json.loads(candidate), STATUS_BALANCED
        except json.JSONDecodeError:
            pass
    repaired = repair_truncated_json(cleaned)
    if repaired is not None:
        try:
            return json.loads(repaired), STATUS_REPAIRED
        except json.JSONDecodeError:
            pass
    return None, STATUS_FAILED


def parse_json_batch(df: pd.DataFrame,
                     text_col: str = "payload") -> pd.DataFrame:
    """Row-local map_batches wrapper: (id-ish cols, payload) ->
    (same cols, status, n_keys). n_keys = top-level dict keys / list
    length, -1 on failure."""
    statuses, n_keys = [], []
    for t in df[text_col]:
        obj, status = loads_relaxed(t or "")
        statuses.append(status)
        if isinstance(obj, dict):
            n_keys.append(len(obj))
        elif isinstance(obj, list):
            n_keys.append(len(obj))
        else:
            n_keys.append(-1)
    out = df.drop(columns=[text_col]).copy()
    out["status"] = pd.Series(statuses, dtype="object")
    out["n_keys"] = pd.Series(n_keys, dtype="int64")
    return out
