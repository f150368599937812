"""Round-2 operator additions: word chunker (M8), doc-type (M11),
completeness (M13), doc metadata (M10), key manager (A5), tiktoken-path
token counter (M15), JSON catalog source (S5), log snapshot (M17), and
the config-assembled Stage pipeline (SURVEY 2.11)."""

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from recursive_pdf_extraction_and_rag_ray.functions.textproc import (
    chunk_text_words,
    log_snapshot,
)
from recursive_pdf_extraction_and_rag_ray.stages.textstats import (
    TokenCounter,
    completeness_batch,
    doc_type_series,
)
from recursive_pdf_extraction_and_rag_ray.state.keymanager import (
    AllKeysExhausted,
    KeyManager,
    RateLimit,
)


# --- word chunker: inline oracle is the reference code verbatim --------------

def _reference_intelligent_chunking(text, max_chunk_size_words=300,
                                    overlap_words=50):
    """Literal transcription of rag_py.py:182-200 for oracle comparison."""
    if not text.strip():
        return []
    cleaned = re.sub(r"\n?-+ PAGE BREAK -+\n?", "\n\n", text.strip())
    paragraphs = re.split(r"\n\s*\n", cleaned)
    chunks, current_chunk = [], ""
    for para in paragraphs:
        if not para.strip():
            continue
        if len(current_chunk.split()) + len(para.split()) <= max_chunk_size_words:
            current_chunk += "\n\n" + para
        elif current_chunk:
            chunks.append(current_chunk.strip())
            overlap = " ".join(current_chunk.split()[-overlap_words:])
            current_chunk = overlap + "\n\n" + para
        else:
            current_chunk = para
    if current_chunk:
        chunks.append(current_chunk.strip())
    return [c for c in chunks if len(c.split()) >= 20]


@pytest.mark.parametrize("text", [
    "",
    "short.",
    " ".join(f"w{i}" for i in range(25)),
    "\n\n".join(" ".join(f"t{j}_{i}" for i in range(120)) for j in range(7)),
    ("para one " * 40 + "\n\n--- PAGE BREAK ---\n\n" + "para two " * 200
     + "\n\n" + "tail words here " * 30),
    "\r\n".join("word " * 60 for _ in range(4)),
    " ".join(f"big{i}" for i in range(500)),  # single oversize paragraph
])
def test_word_chunker_matches_reference_semantics(text):
    assert chunk_text_words(text) == _reference_intelligent_chunking(text)


def test_word_chunker_bounds():
    text = "\n\n".join(" ".join(f"t{j}_{i}" for i in range(120))
                       for j in range(7))
    chunks = chunk_text_words(text)
    assert len(chunks) >= 2
    for c in chunks:
        assert len(c.split()) >= 20
    # overlap: chunk i+1 begins with the 50-word tail of chunk i's words
    for a, b in zip(chunks, chunks[1:]):
        tail = " ".join(a.split()[-50:])
        assert b.startswith(tail.split()[0])


# --- doc type / completeness -------------------------------------------------

def test_doc_type_first_match_wins():
    s = pd.Series([
        "lecture about the final exam",   # lecture pattern checked first
        "homework due",                   # assignment
        "just a plain report",            # project (report)
        "pq",                             # exam via pq
        "nothing relevant",               # ''
        "BOOK of things",                 # textbook, case-insensitive
    ])
    assert doc_type_series(s).tolist() == [
        "lecture", "assignment", "project", "exam", "", "textbook"]


def test_completeness_components():
    batch = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["the cat and the dog of the house went to sleep in peace "
                 + "word " * 100 + "lecture notes",
                 ""],
        "lang": ["en", ""],
        "source": ["src1", ""],
    })
    out = completeness_batch(batch)
    # row 1: all six components present -> 100
    assert out["completeness_pct"].tolist()[0] == 100
    # row 2: nothing present -> 0
    assert out["completeness_pct"].tolist()[1] == 0
    assert str(out["completeness_pct"].dtype) == "int64"


def test_textstats_sql_parity_on_boundary_whitespace():
    """ADVICE round 1: '\\nhello world\\n' must count 2 tokens in BOTH the
    kernel and the DuckDB oracle (trim() strips only spaces)."""
    import duckdb

    import __ray_entry__ as entrymod
    from recursive_pdf_extraction_and_rag_ray.stages.textstats import (
        quality_score_batch,
        token_count_batch,
    )

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["\nhello world\n", "\n\n", " x\ty ", "plain text"],
    })
    con = duckdb.connect()
    con.register("documents", df)
    sql_tok = con.sql(entrymod.oracle_sql()["token_count"]).df()
    eng_tok = token_count_batch(df)
    pd.testing.assert_frame_equal(
        eng_tok.sort_values("doc_id").reset_index(drop=True),
        sql_tok[eng_tok.columns].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)
    sql_q = con.sql(entrymod.oracle_sql()["quality"]).df()
    eng_q = quality_score_batch(df)
    pd.testing.assert_frame_equal(
        eng_q.sort_values("doc_id").reset_index(drop=True),
        sql_q[eng_q.columns].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)


# --- key manager -------------------------------------------------------------

LIMITS = {"embedding": RateLimit(per_minute=2, per_day=4, tokens_per_day=100),
          "flash": RateLimit(per_minute=10, per_day=250)}


def test_keymanager_rpm_window_and_rotation():
    t = [0.0]
    km = KeyManager(["k1", "k2"], LIMITS, clock=lambda: t[0])
    assert km.get_key("embedding") == "k1"
    km.update_usage("k1", "embedding", 10)
    km.update_usage("k1", "embedding", 10)
    # k1 hit rpm=2 -> rotates to k2
    assert km.get_key("embedding") == "k2"
    # after 60s the window clears and k1 is available again
    t[0] = 61.0
    km.current = 0
    assert km.get_key("embedding") == "k1"


def test_keymanager_rpd_and_token_gates():
    t = [0.0]
    km = KeyManager(["k1"], LIMITS, clock=lambda: t[0])
    for i in range(4):
        t[0] += 61  # keep rpm clear; rpd accumulates
        assert km.get_key("embedding") == "k1"
        km.update_usage("k1", "embedding", 1)
    t[0] += 61
    with pytest.raises(AllKeysExhausted):
        km.get_key("embedding")  # rpd=4 == per_day
    # per-model isolation: flash still fine
    assert km.get_key("flash") == "k1"
    km.reset_daily()
    assert km.get_key("embedding") == "k1"


def test_keymanager_token_budget():
    t = [0.0]
    km = KeyManager(["k1", "k2"], LIMITS, clock=lambda: t[0])
    km.update_usage("k1", "embedding", 100)  # hits tokens_per_day
    t[0] = 61.0
    assert km.get_key("embedding") == "k2"


# --- tiktoken-path token counter --------------------------------------------

def test_token_counter_fallback():
    tc = TokenCounter()
    batch = pd.DataFrame({"doc_id": [1, 2], "text": ["abcd" * 10, ""]})
    out = tc(batch)
    if tc.enc is None:  # sandbox: no tiktoken -> reference len//4 fallback
        assert out["n_tokens_model"].tolist() == [10, 1]
    else:
        assert (out["n_tokens_model"] > 0).all()


# --- log snapshot ------------------------------------------------------------

def test_log_snapshot():
    assert log_snapshot("a\n  b\t c") == "a b c"
    long = "x" * 500
    snap = log_snapshot(long)
    assert snap == "x" * 240 + "..."
    assert log_snapshot("") == ""


# --- JSON catalog source + assembly (need the Ray session) -------------------

def test_json_catalog_reader(tmp_path, ray_session):
    from recursive_pdf_extraction_and_rag_ray.sources.json_catalog import (
        read_json_catalog,
    )
    rows = [{"code": "ABC-101", "title": "Intro", "units": 3},
            {"code": "", "title": "NoCode", "units": 1},
            {"code": "XYZ-202", "title": None, "units": 2},
            {"code": "DEF-303", "title": "Kept", "units": 4}]
    p = tmp_path / "catalog.json"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = read_json_catalog(str(p)).to_pandas()
    assert sorted(out["code"]) == ["ABC-101", "DEF-303"]


def test_assembly_config_pipeline_matches_direct(ray_session):
    import ray.data

    from recursive_pdf_extraction_and_rag_ray.pipelines.assembly import (
        build_pipeline,
        registered_stages,
    )
    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
        pages_from_documents_batch,
    )
    from recursive_pdf_extraction_and_rag_ray.stages.chunk import chunk_docs_batch
    from recursive_pdf_extraction_and_rag_ray.stages.embed import HashEmbedder
    from recursive_pdf_extraction_and_rag_ray.stages.extract import ExtractPages

    assert "extract" in registered_stages()
    docs = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                         "text": ["alpha beta gamma delta"] * 30,
                         "lang": ["en"] * 30})
    mk = lambda: ray.data.from_pandas(docs).map_batches(
        pages_from_documents_batch, batch_format="pyarrow")

    pipe = build_pipeline([
        {"stage": "extract", "concurrency": 2, "batch_size": 16},
        {"stage": "chunk"},
        {"stage": "embed.hash", "batch_size": 32, "concurrency": 2},
    ])
    got = pipe(mk()).to_pandas()

    direct = mk().map_batches(ExtractPages, batch_format="pyarrow",
                              batch_size=16, concurrency=(1, 2)) \
        .map_batches(chunk_docs_batch, batch_format="pyarrow") \
        .map_batches(HashEmbedder, batch_format="pyarrow", batch_size=32,
                     concurrency=(1, 2)).to_pandas()
    key = ["id"]
    got = got.sort_values(key).reset_index(drop=True)
    direct = direct.sort_values(key).reset_index(drop=True)
    assert got["id"].tolist() == direct["id"].tolist()
    assert len(got) > 0


def test_assembly_unknown_stage_fails_at_build():
    from recursive_pdf_extraction_and_rag_ray.pipelines.assembly import (
        build_pipeline,
    )
    with pytest.raises(KeyError):
        build_pipeline([{"stage": "no-such-stage"}])


def test_doc_metadata_routes(ray_session):
    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
        _render_layout_det,
        render_html,
    )
    from recursive_pdf_extraction_and_rag_ray.stages.docmeta import (
        doc_metadata_batch,
    )
    import random
    rng = random.Random(1)
    paras = ["alpha beta " * 30] * 90
    layout = _render_layout_det(paras, two_col=False)
    html = render_html("My Title Here", ["one para"], rng)
    batch = pa.table({
        "url": pa.array(["u1", "u2", "u3"], pa.string()),
        "text": pa.array(["", "", "line one\nrest\n--- PAGE BREAK ---\nmore"],
                         pa.string()),
        "html": pa.array([layout, html, b""], pa.large_binary()),
    })
    out = doc_metadata_batch(batch).to_pandas().set_index("url")
    assert out.loc["u1", "page_count"] > 1
    assert out.loc["u1", "page_width"] == 612
    assert out.loc["u2", "title"] == "My Title Here"
    assert out.loc["u3", "page_count"] == 2  # one PAGE BREAK marker
    assert out.loc["u3", "title"] == "line one"
