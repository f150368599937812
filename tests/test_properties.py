"""Property tests (SURVEY.md section 5 item 4) for the chunking semantics."""

from hypothesis import given, settings
from hypothesis import strategies as st

from recursive_pdf_extraction_and_rag_ray.functions.textproc import (
    chunk_text,
    dedupe_chunks,
    merge_paragraphs,
    sha1_text,
    split_paragraphs,
)

words = st.lists(st.text(alphabet="abcdefgh ", min_size=1, max_size=12),
                 min_size=0, max_size=30)
texts = st.text(alphabet="abc defg\nh.\r", max_size=800)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_split_paragraphs_content_preserved(text):
    paras = split_paragraphs(text)
    assert all(p == p.strip() and p for p in paras)
    # every paragraph's non-whitespace content appears in the source, in order
    src = "".join(text.split())
    joined = "".join("".join(p.split()) for p in paras)
    assert joined == src


@settings(max_examples=200, deadline=None)
@given(texts)
def test_merge_preserves_paragraphs_exactly(text):
    paras = split_paragraphs(text)
    merged = merge_paragraphs(paras, 200, 1600)
    # splitting the merged chunks on the joiner reproduces the paragraph list
    reparsed = []
    for m in merged:
        reparsed.extend(m.split("\n\n"))
    assert reparsed == paras or (not paras and not reparsed)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_overlap_chunks_end_with_base_chunks(text):
    base = merge_paragraphs(split_paragraphs(text), 200, 1600)
    chunks = chunk_text(text)
    assert len(chunks) == len(base)
    for c, b in zip(chunks, base):
        assert c.endswith(b)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "alpha beta"]),
                max_size=20))
def test_dedupe_keep_first_invariants(chunks):
    kept, dups = dedupe_chunks(chunks)
    # kept preserves first-occurrence order, no duplicates
    assert len(set(kept)) == len(kept)
    seen = []
    for c in chunks:
        if c not in seen:
            seen.append(c)
    assert kept == seen
    # every dup maps to the kept index of an identical chunk
    for i, (kept_idx, h) in dups.items():
        assert kept[kept_idx] == chunks[i]
        assert h == sha1_text(chunks[i])
    assert len(kept) + len(dups) == len(chunks)
