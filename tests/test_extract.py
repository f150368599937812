"""Extractor unit tests: HTML boilerplate strip + layout parse + routing."""

from recursive_pdf_extraction_and_rag_ray.functions.extract_doc import (
    METHOD_DIRECT,
    METHOD_EMPTY,
    METHOD_PARSED,
    extract_document,
)
from recursive_pdf_extraction_and_rag_ray.functions.html_extract import extract_html
from recursive_pdf_extraction_and_rag_ray.functions.layout import (
    extract_layout,
    is_layout_payload,
)

MAIN_PARA = ("The quick brown fox jumps over the lazy dog and keeps running "
             "through the long meadow until sunset falls over the hills.")

HTML = f"""<html><head><title>T</title><script>var x=1;</script></head><body>
<header><nav><a href="/">home</a> <a href="/a">about</a></nav></header>
<aside><ul><li><a href="/1">related one</a></li><li><a href="/2">related two</a></li></ul></aside>
<article><h1>A Proper Headline</h1><p>{MAIN_PARA}</p><p>{MAIN_PARA} Again and again.</p></article>
<footer><p>copyright 2024 example inc <a href="/t">terms</a> <a href="/p">privacy</a></p></footer>
</body></html>""".encode()


def test_html_keeps_main_drops_boilerplate():
    text, spans = extract_html(HTML)
    assert MAIN_PARA in text
    assert "A Proper Headline" in text
    assert "home" not in text
    assert "related one" not in text
    assert "copyright" not in text
    assert "var x=1" not in text
    # spans cover the text exactly, in order
    assert spans[0][1] == 0 and spans[-1][2] == len(text)
    for (b1, s1, e1), (b2, s2, e2) in zip(spans, spans[1:]):
        assert s2 == e1 + 2


def test_html_link_density_drops_link_farms():
    farm = b"<html><body><div>" + b" ".join(
        b'<a href="/%d">link text %d</a>' % (i, i) for i in range(30)
    ) + b"</div></body></html>"
    text, _ = extract_html(farm)
    assert text == ""


LAYOUT = "\n".join(
    ["%RPX-LAYOUT 1"]
    + sum((
        [f"PAGE 612 792",
         "72 30 CONFIDENTIAL DRAFT",        # header furniture (every page)
         f"72 100 left col line one p{p}",
         f"72 116 left col line two p{p}",
         f"320 100 right col line one p{p}",
         f"320 116 right col line two p{p}",
         f"280 770 - {p} -"]
        for p in range(1, 4)), [])
).encode()


def test_layout_magic_and_furniture_removal():
    assert is_layout_payload(LAYOUT)
    text, spans = extract_layout(LAYOUT)
    assert "CONFIDENTIAL DRAFT" not in text
    assert "- 1 -" not in text
    assert len(spans) == 3  # one span per page


def test_layout_column_major_order():
    text, _ = extract_layout(LAYOUT)
    page1 = text.split("\n\n")[0] if "\n\n" in text else text
    lines = text.split("\n")
    # both left lines of page 1 precede both right lines of page 1
    i_l2 = lines.index("left col line two p1")
    i_r1 = lines.index("right col line one p1")
    assert i_l2 < i_r1


def test_routing_direct_vs_parsed_vs_empty():
    long_text = MAIN_PARA * 3
    t, m, _ = extract_document(long_text, HTML)
    assert m == METHOD_DIRECT and t == long_text
    t, m, _ = extract_document("", HTML)
    assert m == METHOD_PARSED and MAIN_PARA in t
    t, m, _ = extract_document("short", b"<html><body><p>tiny</p></body></html>")
    assert m == METHOD_EMPTY and t == ""
    # force_parse mirrors --force-ocr (ocr_engine.py:214)
    t, m, _ = extract_document(long_text, HTML, force_parse=True)
    assert m == METHOD_PARSED


def test_near_empty_direct_text_falls_through_to_parse():
    # eff < 50 on the text layer -> parse path (ocr_engine.py:229-235)
    t, m, _ = extract_document("a b c", HTML)
    assert m == METHOD_PARSED
