"""Unit tests of the byte-identity contract (reference semantics cited in
functions/textproc.py)."""

import hashlib

from recursive_pdf_extraction_and_rag_ray.functions.textproc import (
    chunk_records,
    chunk_text,
    dedupe_chunks,
    effective_chars,
    merge_paragraphs,
    normalize_text,
    sha1_text,
    split_paragraphs,
)


def test_normalize_crlf_and_page_break():
    # reference chunking.py:8 + main.py:169
    s = "a\r\nb\r\r\n\r\n--- PAGE BREAK ---\r\n\r\nc"
    out = normalize_text(s)
    assert "\r" not in out
    assert "PAGE BREAK" not in out


def test_effective_chars():
    # reference ocr_engine.py:229: len("".join(full.split()))
    assert effective_chars("  a b\t\nc  ") == 3
    assert effective_chars("") == 0


def test_split_paragraphs_fallback_whole_text():
    assert split_paragraphs("no blank lines here") == ["no blank lines here"]
    assert split_paragraphs("   ") == []
    assert split_paragraphs("p1\n\n  \n\np2") == ["p1", "p2"]


def test_merge_respects_min_and_max():
    # reference chunking.py:19: merge while len(buf)<min or fits in max
    paras = ["x" * 150, "y" * 100, "z" * 1500]
    out = merge_paragraphs(paras, 200, 1600)
    # 150 < min -> merged with next (252); 252+2+1500 > 1600 -> flush
    assert out == ["x" * 150 + "\n\n" + "y" * 100, "z" * 1500]


def test_overlap_prefix_rule():
    # reference chunking.py:34-40: 80-char tail, trim past first space, " " join
    a = "word " * 400   # 2000 chars -> own chunk
    b = "second " * 300
    chunks = chunk_text(a + "\n\n" + b)
    assert len(chunks) == 2
    tail = chunks[0][-80:]
    sp = tail.find(" ")
    expected_prefix = tail[sp + 1:] if sp > 0 else tail
    assert chunks[1].startswith(expected_prefix + " ")


def test_dedupe_dup_index_points_into_kept_list():
    # reference chunking.py:56-58: seen[h] = len(keep) BEFORE append
    chunks = ["A", "B", "A", "C", "B"]
    kept, dups = dedupe_chunks(chunks)
    assert kept == ["A", "B", "C"]
    assert dups[2] == (0, sha1_text("A"))
    assert dups[4] == (1, sha1_text("B"))


def test_chunk_record_ids_match_reference_derivation():
    # reference convert_to_embeddings.py:383,391,413
    text = ("alpha " * 500).strip() + "\n\n" + ("beta " * 500).strip()
    recs = chunk_records("https://h/x", text)
    d_hash = hashlib.sha1(text.encode()).hexdigest()
    for r in recs:
        if not r["is_duplicate"]:
            expect = hashlib.sha1(
                f"{d_hash}:{r['chunk_index']}:{r['chunk_hash']}".encode()
            ).hexdigest()
        else:
            expect = hashlib.sha1(
                f"{d_hash}:{r['chunk_index']}:{r['duplicate_of_hash']}:dup".encode()
            ).hexdigest()
        assert r["id"] == expect
        assert r["doc_hash"] == d_hash


def test_alternating_long_paras_produce_intra_doc_dups():
    a = "aaaa " * 400
    b = "bbbb " * 400
    text = "\n\n".join([a, b, a, b, a, b]).strip()
    recs = chunk_records("https://h/dup", text)
    assert any(r["is_duplicate"] for r in recs)
    # duplicate ids are distinct from their originals'
    ids = [r["id"] for r in recs]
    assert len(ids) == len(set(ids))


def test_empty_text_yields_no_records():
    assert chunk_records("https://h/e", "   ") == []
