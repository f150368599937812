"""Resume exactness (FIXTURES.md section 4 item 4): interrupted run + rerun
produces byte-identical output, and committed shards are not re-executed."""

import glob
import os
import shutil

import pyarrow.dataset as pads
import pytest

from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
    run_extract_stage,
    run_pipeline,
)
from recursive_pdf_extraction_and_rag_ray.state.lineage import (
    completed_shards,
    load_lineage,
)
from recursive_pdf_extraction_and_rag_ray import PARSER_VERSION


def _chunk_ids(out):
    t = pads.dataset(f"{out}/chunks", partitioning="hive").to_table()
    return sorted(t.column("id").to_pylist())


def _docs_digests(out):
    t = pads.dataset(f"{out}/docs", partitioning="hive").to_table()
    return sorted(zip(t.column("url").to_pylist(),
                      t.column("text_sha256").to_pylist()))


@pytest.fixture(scope="module")
def clean_run(tiny_corpus, tmp_path_factory):
    pages_dir, paths = tiny_corpus
    out = str(tmp_path_factory.mktemp("clean"))
    run_pipeline(pages_dir, out, concurrency=3, build_index=False)
    return pages_dir, paths, out


def test_partial_then_resume_equals_clean_run(clean_run, tmp_path_factory):
    pages_dir, paths, clean_out = clean_run
    out = str(tmp_path_factory.mktemp("resumed"))
    # simulate a crashed first run: extract only a prefix of the shards
    run_extract_stage(paths[:3], out, concurrency=3)
    assert len(completed_shards(out, "extract", PARSER_VERSION)) == 3
    # second run sees the full input; must re-read only the remaining shards
    run_pipeline(pages_dir, out, concurrency=3, build_index=False)
    assert _docs_digests(out) == _docs_digests(clean_out)
    assert _chunk_ids(out) == _chunk_ids(clean_out)


def test_completed_shards_not_reexecuted(clean_run):
    pages_dir, paths, out = clean_run
    docs_files = sorted(glob.glob(f"{out}/docs/shard=*/*.parquet"))
    mtimes_before = {p: os.path.getmtime(p) for p in docs_files}
    stats = run_pipeline(pages_dir, out, concurrency=3, build_index=False)
    assert stats["shards_run"] == 0
    assert stats["rag_shards_run"] == 0
    mtimes_after = {p: os.path.getmtime(p) for p in docs_files}
    assert mtimes_before == mtimes_after  # bytes untouched, not rewritten


def test_lineage_rows_carry_checksums(clean_run):
    _, paths, out = clean_run
    t = load_lineage(out)
    rows = t.to_pylist()
    stages = {r["stage"] for r in rows}
    assert stages == {"extract", "chunks_embedded"}
    for r in rows:
        assert r["status"] == "completed"
        assert r["parser_version"] == PARSER_VERSION
        assert len(r["checksum"]) == 16
        if r["stage"] == "extract":
            assert r["n_rows"] > 0


def test_parser_version_bump_invalidates(clean_run, tmp_path_factory, monkeypatch):
    """A lineage row committed by a different parser version must not
    fast-skip the shard (semantic-version guard)."""
    _, paths, out = clean_run
    assert completed_shards(out, "extract", "other-version") == set()


def test_skew_giant_docs_complete_and_bounded(clean_run):
    """FIXTURES item 5: giant docs flow through without serializing the
    stage; per-shard outputs exist for every input shard."""
    _, paths, out = clean_run
    t = pads.dataset(f"{out}/docs", partitioning="hive").to_table()
    n_chars = t.column("n_chars").to_pylist()
    assert max(n_chars) > 50 * sorted(n_chars)[len(n_chars) // 2]  # skew present
    shards = set(t.column("shard").to_pylist())
    assert len(shards) == len(paths)


def test_metrics_accumulate_exactly_once_per_shard(ray_session, tmp_path):
    """The persisted _metrics ledger (reference billing.py semantics) must
    accumulate exactly once per shard: a no-op resume changes nothing, a
    new shard appends only itself, and totals match the chunks table."""
    import glob
    import os
    import shutil

    import pyarrow.dataset as pads

    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        run_pipeline,
    )
    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
        synthesize_corpus,
    )
    from recursive_pdf_extraction_and_rag_ray.state.metrics import (
        load_metrics,
        metrics_totals,
    )

    root = str(tmp_path / "m")
    synthesize_corpus(f"{root}/pages", n_docs=200, n_shards=4)
    # hold one shard back to simulate a later arrival
    held = sorted(glob.glob(f"{root}/pages/*.parquet"))[-1]
    os.makedirs(f"{root}/held")
    shutil.move(held, f"{root}/held/{os.path.basename(held)}")

    run_pipeline(f"{root}/pages", f"{root}/out", concurrency=3,
                 build_index=False)
    t1 = metrics_totals(f"{root}/out")
    assert t1["shards"] == 3 and t1["n_rows"] > 0 and t1["n_tokens"] > 0

    # no-op resume: ledger byte-stable
    run_pipeline(f"{root}/pages", f"{root}/out", concurrency=3,
                 build_index=False)
    assert metrics_totals(f"{root}/out") == t1

    # the held shard arrives: exactly one new row set appended
    shutil.move(f"{root}/held/{os.path.basename(held)}", held)
    run_pipeline(f"{root}/pages", f"{root}/out", concurrency=3,
                 build_index=False)
    t3 = metrics_totals(f"{root}/out")
    assert t3["shards"] == 4
    assert t3["n_rows"] > t1["n_rows"]
    # ledger n_rows == actual chunk rows; n_tokens == sum(max(1, n//4))
    chunks = pads.dataset(f"{root}/out/chunks", partitioning="hive") \
        .to_table(columns=["n_chars"]).to_pandas()
    assert t3["n_rows"] == len(chunks)
    assert t3["n_tokens"] == int(
        chunks["n_chars"].floordiv(4).clip(lower=1).sum())
    per_shard = load_metrics(f"{root}/out").to_pandas()
    assert per_shard["key"].is_unique
