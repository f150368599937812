"""Export sinks, billing/metrics rollup, and index retrieval ops."""

import glob
import json
import os

import numpy as np
import pyarrow.dataset as pads
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import run_pipeline
from recursive_pdf_extraction_and_rag_ray.pipelines.retrieval import (
    filter_index,
    query_index,
)
from recursive_pdf_extraction_and_rag_ray.sources.sinks import export_csv, export_jsonl
from recursive_pdf_extraction_and_rag_ray.state.metrics import (
    billing_rollup,
    billing_totals,
)


@pytest.fixture(scope="module")
def built(tiny_corpus, tmp_path_factory):
    pages_dir, _ = tiny_corpus
    out = str(tmp_path_factory.mktemp("built"))
    run_pipeline(pages_dir, out, concurrency=3, build_index=True)
    return out


def test_export_jsonl_roundtrip(built, tmp_path):
    ds = ray.data.read_parquet(f"{built}/chunks")
    path = str(tmp_path / "jsonl")
    export_jsonl(ds, path, drop_embeddings=True)
    files = glob.glob(f"{path}/*.json")
    assert files
    rec = json.loads(open(files[0]).readline())
    assert "id" in rec and "text" in rec and "embedding" not in rec


def test_export_csv_fixed_columns(built, tmp_path):
    ds = ray.data.read_parquet(f"{built}/chunks")
    path = str(tmp_path / "csv")
    export_csv(ds, path)
    files = glob.glob(f"{path}/*.csv")
    assert files
    header = [c.strip('"') for c in open(files[0]).readline().strip().split(",")]
    assert "id" in header and "embedding" not in header


def test_billing_rollup_matches_totals(built):
    ds = ray.data.read_parquet(f"{built}/chunks")
    per_group = billing_rollup(ds).to_pandas()
    totals = billing_totals(ds)
    assert totals["n_chunks"] == ds.count()
    assert totals["n_tokens"] == int(per_group["n_tokens"].sum())
    assert totals["cost_usd"] == pytest.approx(
        totals["n_tokens"] * 0.012 / 1e6)
    # reference token heuristic: max(1, len//4)
    row = ds.take(1)[0]
    assert max(1, len(row["text"]) // 4) >= 1


def test_filter_index_by_metadata(built):
    hit = filter_index(f"{built}/index", lang="en", limit=20).to_pandas()
    assert len(hit) > 0
    assert (hit["lang"] == "en").all()


def test_filter_index_partition_pruning(built):
    # bucketed layout: dirs are gk_bucket=<n>; keys live as a column
    dirs = [d for d in os.listdir(f"{built}/index")
            if d.startswith("gk_bucket=")]
    assert dirs, "index must be bucket-partitioned"
    key = ray.data.read_parquet(f"{built}/index").take(1)[0]["group_key"]
    one = filter_index(f"{built}/index", group_keys=[key]).to_pandas()
    assert len(one) > 0
    assert (one["group_key"] == key).all()


def test_filtered_query_index_composed(built):
    from recursive_pdf_extraction_and_rag_ray.pipelines.retrieval import (
        filtered_query_index,
    )
    top = filtered_query_index(f"{built}/index", "merge sort table scan",
                               k=5, lang="en").to_pandas()
    assert 0 < len(top) <= 5
    # every hit must satisfy the metadata filter (join back by id)
    ds = ray.data.read_parquet(f"{built}/index").to_pandas()
    langs = ds.set_index("id").loc[top["id"], "lang"]
    assert (langs == "en").all()
    # composed result == filter-then-knn done by hand
    sims = top["cos_sim"].to_numpy()
    assert (np.diff(sims) <= 1e-12).all()


def test_query_index_topk(built):
    top = query_index(f"{built}/index", "merge sort table scan", k=5).to_pandas()
    assert len(top) == 5
    sims = top["cos_sim"].to_numpy()
    assert (np.diff(sims) <= 1e-12).all()  # descending
    # self-retrieval sanity: querying an indexed chunk's own text returns it
    ds = ray.data.read_parquet(f"{built}/chunks")
    some = ds.take(1)[0]
    hit = query_index(f"{built}/index", some["text"], k=1).to_pandas()
    assert hit["cos_sim"].iloc[0] > 0.999999
    assert hit["id"].iloc[0] == some["id"]


def test_compact_parquet_merges_small_files(tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    from recursive_pdf_extraction_and_rag_ray.sources.sinks import compact_parquet

    src = tmp_path / "many"
    src.mkdir()
    for i in range(12):
        pq.write_table(
            __import__("pyarrow").table(
                {"a": np.arange(i * 10, i * 10 + 10, dtype="int64")}),
            str(src / f"f{i}.parquet"))
    out = tmp_path / "compact"
    rep = compact_parquet(str(src), str(out), target_rows_per_file=60)
    assert rep["rows"] == 120
    assert rep["files_in"] == 12
    assert rep["files_out"] <= 4
    back = ray.data.read_parquet(str(out)).to_pandas()
    assert sorted(back["a"]) == list(range(120))
