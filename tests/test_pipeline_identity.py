"""Byte-identity of the Ray pipeline vs the pure-Python oracle (FIXTURES.md
section 4, items 1-3): per-url extracted-text digests, chunk ids/dup fields,
corpus dedup winners — all exact."""

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from recursive_pdf_extraction_and_rag_ray.oracle import (
    oracle_chunks,
    oracle_corpus_dedup,
    oracle_extract,
)
from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipeline_out(tiny_corpus, tmp_path_factory):
    pages_dir, paths = tiny_corpus
    out = str(tmp_path_factory.mktemp("out"))
    run_pipeline(pages_dir, out, concurrency=3)
    return pages_dir, paths, out


def _oracle_docs(paths):
    import pyarrow as pa
    pages = pa.concat_tables([pq.read_table(p) for p in paths])
    return oracle_extract(pages)


def test_extracted_text_digests_match_oracle(pipeline_out):
    pages_dir, paths, out = pipeline_out
    oracle = {d["url"]: d for d in _oracle_docs(paths)}
    engine = pads.dataset(f"{out}/docs", partitioning="hive").to_table()
    rows = engine.select(["url", "text_sha256", "text_extracted", "method"]).to_pylist()
    assert len(rows) == len(oracle)
    for r in rows:
        o = oracle[r["url"]]
        assert r["method"] == o["method"], r["url"]
        assert r["text_extracted"] == o["text_extracted"], r["url"]  # byte-identical
        assert r["text_sha256"] == o["text_sha256"], r["url"]


def test_spans_match_oracle(pipeline_out):
    _, paths, out = pipeline_out
    oracle = {d["url"]: d for d in _oracle_docs(paths)}
    engine = pads.dataset(f"{out}/docs", partitioning="hive").to_table()
    for r in engine.select(["url", "spans"]).to_pylist():
        assert r["spans"] == oracle[r["url"]]["spans"], r["url"]


def test_chunk_ids_and_dup_fields_match_oracle(pipeline_out):
    _, paths, out = pipeline_out
    docs = _oracle_docs(paths)
    dup_map = oracle_corpus_dedup(docs)
    surviving = [d for d in docs if d["method"] != "empty" and dup_map[d["url"]] == ""]
    expected = {}
    for r in oracle_chunks(surviving):
        expected[r["id"]] = r
    engine = pads.dataset(f"{out}/chunks", partitioning="hive").to_table()
    got = engine.to_pylist()
    assert len(got) == len(expected)
    for r in got:
        e = expected[r["id"]]
        for field in ("url", "chunk_index", "total_chunks_in_doc", "text",
                      "chunk_hash", "doc_hash", "is_duplicate",
                      "duplicate_of_index", "duplicate_of_hash", "group_key"):
            assert r[field] == e[field], (r["id"], field)


def test_corpus_dedup_is_keep_first_by_url(pipeline_out):
    _, paths, out = pipeline_out
    docs = _oracle_docs(paths)
    dup_map = oracle_corpus_dedup(docs)
    dup_urls = {u for u, w in dup_map.items() if w != ""}
    assert dup_urls, "fixture must contain exact duplicates"
    engine = pads.dataset(f"{out}/chunks", partitioning="hive").to_table()
    chunk_urls = set(engine.column("url").to_pylist())
    assert not (chunk_urls & dup_urls)


def test_embeddings_deterministic_and_normalized(pipeline_out):
    import numpy as np

    from recursive_pdf_extraction_and_rag_ray.stages.embed import hash_embed_texts
    _, _, out = pipeline_out
    engine = pads.dataset(f"{out}/chunks", partitioning="hive").to_table()
    sample = engine.slice(0, 5).to_pylist()
    for r in sample:
        vec = np.asarray(r["embedding"], dtype=np.float32)
        assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-3
        expect = hash_embed_texts([r["text"]])[0]
        assert np.allclose(vec, expect)


def test_index_layouts_identical_rows(ray_session, tmp_path):
    """layout='exchange' (keyed hash exchange, one file per bucket) must
    hold exactly the rows of layout='bucketed' — only the file layout
    differs (and every exchange bucket dir holds a single data file)."""
    import glob
    import os

    import pandas as pd
    import pyarrow.dataset as pads

    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        run_extract_stage,
        run_index_stage,
        run_rag_stage,
    )
    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
        synthesize_corpus,
    )

    root = str(tmp_path / "layouts")
    synthesize_corpus(f"{root}/pages", n_docs=150, n_shards=3)
    run_extract_stage(f"{root}/pages", f"{root}/out", concurrency=3)
    run_rag_stage(f"{root}/out", concurrency=3)
    outs = {}
    for layout in ("bucketed", "exchange"):
        idx = run_index_stage(f"{root}/out", concurrency=3, layout=layout)
        df = pads.dataset(idx, partitioning="hive").to_table().to_pandas()
        df["gk_bucket"] = df["gk_bucket"].astype(int)
        df["embedding"] = df["embedding"].map(tuple)
        outs[layout] = df[sorted(df.columns)].sort_values("id") \
            .reset_index(drop=True)
        if layout == "exchange":
            for d in glob.glob(os.path.join(idx, "gk_bucket=*")):
                assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    pd.testing.assert_frame_equal(outs["bucketed"], outs["exchange"])
