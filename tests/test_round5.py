"""Round-5 regression pins: null-url dedup semantics shared by both
dup-mark twins, threshold_sweep duplicate-threshold dedup, and bm25_topk
with ids that collide with the old in-band stats sentinel."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import dedup
from recursive_pdf_extraction_and_rag_ray.stages.corpusfilters import (
    threshold_sweep,
)
from recursive_pdf_extraction_and_rag_ray.stages.retrieval_text import (
    bm25_topk,
)


def _null_url_docs():
    # group 'AA' has a null-url row alongside the winner; group 'BB' is a
    # singleton with a null url (no winner -> kept); group 'CC' is ALL
    # nulls (dup group whose Min(url) is null -> every row kept)
    return pa.table({
        "url": pa.array(["a1", None, "b-only", None, None, None],
                        pa.string()),
        "text_sha256": pa.array(["AA", "AA", "BB", "CC", "CC", "AA"],
                                pa.string()),
    })


EXPECT_DUP_OF = {
    # (url, sha) -> duplicate_of
    ("a1", "AA"): "",      # the winner itself
    (None, "AA"): "a1",    # null url in a dup group = duplicate of winner
    ("b-only", "BB"): "",  # singleton
    (None, "CC"): "",      # all-null group: winner is null -> all kept
}


def _check(df: pd.DataFrame):
    assert len(df) == 6
    for _, r in df.iterrows():
        url = None if pd.isna(r["url"]) else r["url"]
        assert r["duplicate_of"] == EXPECT_DUP_OF[(url, r["text_sha256"])], \
            (url, r["text_sha256"], r["duplicate_of"])


def test_null_url_semantics_broadcast(ray_session):
    """A null-url row in a dup group is marked duplicate_of the group
    winner (a null url can never win Min('url')); null-only groups and
    singletons stay unmarked. Pinned for the broadcast twin."""
    winners = {"AA": "a1"}  # 'CC' has a null winner -> not in the map
    ref = ray.put(winners)
    out = ray.data.from_arrow(_null_url_docs()).map_batches(
        dedup.MarkDuplicatesFromBroadcast, batch_format="pyarrow",
        fn_constructor_kwargs={"winners_ref": ref},
        concurrency=1).to_pandas()
    _check(out)


def test_null_url_semantics_join(ray_session):
    """Same fixture through the hash-join twin — byte-identical marks."""
    docs = ray.data.from_arrow(_null_url_docs())
    winners = dedup.winners_dataset_from_docs(docs)
    out = dedup.mark_duplicates_join(docs, winners, num_partitions=4) \
        .to_pandas()
    # the all-null 'CC' group yields a null Min(url) winner; the join twin
    # must treat it exactly like the broadcast twin (rows kept)
    _check(out)


def test_threshold_sweep_duplicate_thresholds(ray_session):
    """A duplicated threshold value must not double that grid row's
    counts (np.unique, not sorted())."""
    scores = ray.data.from_pandas(pd.DataFrame(
        {"score": [0.1, 0.4, 0.6, 0.9]}))
    out = threshold_sweep(scores, thresholds=[0.5, 0.5, 0.2]) \
        .to_pandas().sort_values("threshold").reset_index(drop=True)
    assert list(out["threshold"]) == [0.2, 0.5]
    assert list(out["n_keep"]) == [3, 2]


def test_bm25_negative_doc_id(ray_session):
    """doc_id == -1 is a legitimate corpus id, not the stats sentinel:
    it must be scored and rankable like any other doc."""
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [-1, 7, 9],
        "text": ["quick brown fox", "quick quick brown", "nothing here"]}))
    top = bm25_topk(docs, ["quick", "fox"], k=3)
    assert -1 in set(top["doc_id"])
    assert 9 not in set(top["doc_id"])
    # -1 is the only doc matching both terms -> ranks first
    assert int(top.iloc[0]["doc_id"]) == -1


def test_chunk_checksum_partials_distinguish_same_url_blocks():
    """The commit tap names side files by partial-content digest, so two
    DIFFERENT blocks must never produce byte-identical partials. Chunk
    rows repeat url across a doc — two full batches inside one long
    uniform doc would collide on a bare-url key_sum; keying on
    (url, chunk_index) makes every row key unique."""
    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        _checksum_partials,
    )

    def block(idx0):
        return pa.table({
            "url": ["u"] * 4,
            "chunk_index": list(range(idx0, idx0 + 4)),
            "n_chars": [100] * 4,
            "shard": ["s0"] * 4,
        })

    a = _checksum_partials(block(0)).to_pandas()
    b = _checksum_partials(block(4)).to_pandas()
    assert a["n_rows"].tolist() == b["n_rows"].tolist() == [4]
    assert a["key_sum"].tolist() != b["key_sum"].tolist()


def test_commit_source_validated(tmp_path):
    """A typo'd commit_source must raise, not silently pick readback."""
    import pytest as _pytest

    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        run_extract_stage,
        run_rag_stage,
    )
    with _pytest.raises(ValueError, match="commit_source"):
        run_extract_stage(str(tmp_path), str(tmp_path / "out"),
                          commit_source="taps")
    with _pytest.raises(ValueError, match="commit_source"):
        run_rag_stage(str(tmp_path / "out"), commit_source="Tap")
