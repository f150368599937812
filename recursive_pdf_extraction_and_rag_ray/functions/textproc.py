"""Text normalization, paragraph chunking, intra-doc dedup, id derivation.

This module IS the byte-identity contract: the semantics below reproduce the
reference implementation exactly (cited per function against
/root/reference). Both the pure-Python oracle and the Ray ``map_batches``
stages call these functions, and the pytest suite pins goldens from them, so
any change here is a semantic version bump (see ``PARSER_VERSION``).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Tuple

# --- normalization -----------------------------------------------------------

_CRLF_RE = re.compile(r"\r\n?")
# page-break marker stripper; semantics of reference main.py:169
_PAGE_BREAK_RE = re.compile(r"\n?-+ PAGE BREAK -+\n?")
_PARA_SPLIT_RE = re.compile(r"\n\s*\n")


def normalize_text(text: str) -> str:
    """CRLF -> LF (reference chunking.py:8) and page-break markers -> blank
    line (reference main.py:169). Applied once on the direct path."""
    return _PAGE_BREAK_RE.sub("\n\n", _CRLF_RE.sub("\n", text))


def effective_chars(text: str) -> int:
    """Whitespace-stripped length; the accept threshold is ``eff >= 50``
    (reference ocr_engine.py:229-234)."""
    return len("".join(text.split()))


MIN_EFFECTIVE_CHARS = 50

# --- chunking (reference chunking.py:6-42) -----------------------------------

CHUNK_MIN_CHARS = 200
CHUNK_MAX_CHARS = 1600
CHUNK_OVERLAP = 80


def split_paragraphs(text: str) -> List[str]:
    """Split on blank lines after CRLF normalization; whole stripped text if
    no paragraph boundary exists (reference chunking.py:6-10)."""
    text = _CRLF_RE.sub("\n", text)
    paras = [p.strip() for p in _PARA_SPLIT_RE.split(text) if p.strip()]
    if paras:
        return paras
    stripped = text.strip()
    return [stripped] if stripped else []


def merge_paragraphs(paras: List[str], min_chars: int = CHUNK_MIN_CHARS,
                     max_chars: int = CHUNK_MAX_CHARS) -> List[str]:
    """Greedy buffer merge: keep appending while the buffer is still short of
    ``min_chars`` or the joined size stays within ``max_chars`` (reference
    chunking.py:13-26; the ``+2`` accounts for the "\\n\\n" joiner)."""
    merged: List[str] = []
    buf = ""
    for para in paras:
        if not buf:
            buf = para
        elif len(buf) < min_chars or (len(buf) + 2 + len(para) <= max_chars):
            buf = buf + "\n\n" + para
        else:
            merged.append(buf)
            buf = para
    if buf:
        merged.append(buf)
    return merged


def chunk_text(text: str, min_chars: int = CHUNK_MIN_CHARS,
               max_chars: int = CHUNK_MAX_CHARS,
               overlap: int = CHUNK_OVERLAP) -> List[str]:
    """Paragraph merge + overlap prefixing (reference chunking.py:29-42):
    prepend the last ``overlap`` chars of the previous base chunk, trimmed
    forward past the first space, joined with a single space."""
    base = merge_paragraphs(split_paragraphs(text), min_chars, max_chars)
    if overlap <= 0 or len(base) <= 1:
        return base
    out = [base[0]]
    for i in range(1, len(base)):
        tail = base[i - 1][-overlap:]
        first_space = tail.find(" ")
        if first_space > 0:
            tail = tail[first_space + 1:]
        out.append(tail + " " + base[i])
    return out


# --- word-based alternative chunker (reference rag_py.py:182-200) ------------

WORD_CHUNK_MAX_WORDS = 300
WORD_CHUNK_OVERLAP_WORDS = 50
WORD_CHUNK_MIN_WORDS = 20


def chunk_text_words(text: str, max_words: int = WORD_CHUNK_MAX_WORDS,
                     overlap_words: int = WORD_CHUNK_OVERLAP_WORDS,
                     min_words: int = WORD_CHUNK_MIN_WORDS) -> List[str]:
    """The reference's second chunking mode, reproduced exactly (reference
    /root/reference/src/utils/course_outline/rag_py.py:182-200
    intelligent_chunking): paragraph accumulation while <= max_words,
    word-overlap prefix on spill, chunks under min_words dropped. Note the
    reference quirks kept on purpose: the first paragraph enters through
    the "fits" branch so the buffer starts "\\n\\n"+para (stripped only on
    emit), and an oversized single paragraph is emitted whole."""
    if not text.strip():
        return []
    cleaned = _PAGE_BREAK_RE.sub("\n\n", text.strip())
    paragraphs = _PARA_SPLIT_RE.split(cleaned)
    chunks: List[str] = []
    current = ""
    for para in paragraphs:
        if not para.strip():
            continue
        if len(current.split()) + len(para.split()) <= max_words:
            current += "\n\n" + para
        elif current:
            chunks.append(current.strip())
            overlap = " ".join(current.split()[-overlap_words:])
            current = overlap + "\n\n" + para
        else:
            current = para
    if current:
        chunks.append(current.strip())
    return [c for c in chunks if len(c.split()) >= min_words]


# --- log snapshot (reference log_utils.py:36-42) -----------------------------

def log_snapshot(text: str, limit: int = 240) -> str:
    """Collapse whitespace and truncate for one-line logging (reference
    /root/reference/src/services/RAG/log_utils.py:36-42)."""
    snap = " ".join((text or "").split())
    return snap[:limit] + ("..." if len(snap) > limit else "")


# --- hashing / ids -----------------------------------------------------------

def sha1_text(s: str) -> str:
    """Reference chunking.py:45-47."""
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def sha256_text(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def md5_text(s: str) -> str:
    """Whole-document fingerprint analog of the reference's md5 file hash
    (src/utils/Remove Duplicates/remove_duplicates.py:7-16)."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def doc_hash(text: str) -> str:
    """``doc_hash = sha1_text(text)`` (reference convert_to_embeddings.py:383)."""
    return sha1_text(text)


def chunk_id(doc_h: str, idx: int, chunk_h: str) -> str:
    """Unique-chunk id (reference convert_to_embeddings.py:391)."""
    return sha1_text(f"{doc_h}:{idx}:{chunk_h}")


def dup_chunk_id(doc_h: str, idx: int, orig_h: str) -> str:
    """Duplicate-chunk id with ``:dup`` suffix keyed by the ORIGINAL chunk's
    hash (reference convert_to_embeddings.py:413)."""
    return sha1_text(f"{doc_h}:{idx}:{orig_h}:dup")


# --- intra-doc dedup (reference chunking.py:50-61) ---------------------------

def dedupe_chunks(chunks: List[str]) -> Tuple[List[str], Dict[int, Tuple[int, str]]]:
    """First occurrence kept. ``dup[pre_dedup_index] = (index_into_KEPT_list,
    original_hash)`` — note the original index refers to the kept list, not
    the pre-dedup list (reference chunking.py:56-59)."""
    seen: Dict[str, int] = {}
    kept: List[str] = []
    dups: Dict[int, Tuple[int, str]] = {}
    for i, c in enumerate(chunks):
        h = sha1_text(c)
        if h in seen:
            dups[i] = (seen[h], h)
        else:
            seen[h] = len(kept)
            kept.append(c)
    return kept, dups


# --- full per-document chunk-record derivation -------------------------------

def chunk_records(url: str, text: str, lang: str = "",
                  group_key: str = "", host: str = "") -> List[dict]:
    """Flatten one extracted document into chunk rows with exact reference
    ids/dup-map semantics (reference convert_to_embeddings.py:384-426).
    Returns [] when the text strips to empty (skip reason ``empty_text``,
    reference convert_to_embeddings.py:357-358) or no chunks survive."""
    if not text.strip():
        return []
    chunks_all = chunk_text(text)
    kept, dups = dedupe_chunks(chunks_all)
    if not kept:
        return []
    d_hash = doc_hash(text)
    total = len(chunks_all)
    records: List[dict] = []
    for idx, ch in enumerate(chunks_all):
        if idx in dups:
            continue
        c_hash = sha1_text(ch)
        records.append({
            "id": chunk_id(d_hash, idx, c_hash),
            "url": url,
            "chunk_index": idx,
            "total_chunks_in_doc": total,
            "text": ch,
            "chunk_hash": c_hash,
            "doc_hash": d_hash,
            "is_duplicate": False,
            "duplicate_of_index": None,
            "duplicate_of_hash": None,
            "host": host,
            "lang": lang,
            "group_key": group_key,
            "n_chars": len(ch),
        })
    for idx, (orig_kept_idx, orig_h) in dups.items():
        ch = chunks_all[idx]
        records.append({
            "id": dup_chunk_id(d_hash, idx, orig_h),
            "url": url,
            "chunk_index": idx,
            "total_chunks_in_doc": total,
            "text": ch,
            "chunk_hash": sha1_text(ch),
            "doc_hash": d_hash,
            "is_duplicate": True,
            "duplicate_of_index": orig_kept_idx,
            "duplicate_of_hash": orig_h,
            "host": host,
            "lang": lang,
            "group_key": group_key,
            "n_chars": len(ch),
        })
    return records
