"""Curation pipeline composition: planted duplicates and filter
interactions that the synthetic corpus doesn't exercise."""

import numpy as np
import pandas as pd
import ray.data

from recursive_pdf_extraction_and_rag_ray.pipelines import curation


GOOD = ("the data and the value of the work to be done in the stream "
        "with many varied words appearing here so entropy stays high "
        "and the token count clears the bar for keeping documents")


def _docs(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["doc_id", "source", "text"]).astype(
        {"doc_id": "int64"}))


def test_curate_dedups_and_filters():
    rows = [
        (0, "a", GOOD),
        (1, "a", GOOD),              # exact dup -> dropped, 0 kept
        (2, "a", "short text"),      # too few tokens
        (3, "b", GOOD + " extra"),   # distinct survivor
        (4, "b", "x " * 60),         # 60 tokens but entropy ~0 + no stopwords
    ]
    out = curation.curate(_docs(rows), quotas={"a": 5, "b": 5},
                          entropy_min=2.0).to_pandas()
    assert sorted(out["doc_id"]) == [0, 3]
    assert set(out.columns) == {"doc_id", "source", "n_tokens", "entropy"}


def test_curate_quota_caps_per_source():
    rows = [(i, "a", GOOD + f" variant {i} " + "word%d " % (i % 5))
            for i in range(20)]
    out = curation.curate(_docs(rows), quotas={"a": 3},
                          entropy_min=2.0).to_pandas()
    assert len(out) == 3
    assert (out["source"] == "a").all()


def test_curate_dedup_winner_is_min_doc_id():
    # duplicates across many blocks: winner must be the MIN doc_id
    rows = [(i, "a", GOOD) for i in range(50)]
    ds = ray.data.from_pandas([
        pd.DataFrame([r], columns=["doc_id", "source", "text"]).astype(
            {"doc_id": "int64"}) for r in rows])
    out = curation.curate(ds, quotas={"a": 10},
                          entropy_min=2.0).to_pandas()
    assert list(out["doc_id"]) == [0]


def test_curate_fuzzy_drops_neardups_and_twins_agree():
    """The fuzzy leg drops near-duplicates (high-Jaccard, not byte-equal)
    that survive exact dedup, keeps the cluster-minimum doc, and the
    broadcast and join-based (distributed) twins return the same rows."""
    near = GOOD + " trailing tweak"
    rows = [
        (0, "a", GOOD),
        (1, "a", near),              # near-dup of 0 -> fuzzy-dropped
        (2, "b", "completely different body in this record about other "
                 "topics with plenty of the varied and unusual words to "
                 "clear the entropy bar and the token count threshold in "
                 "the quality filter of the curation stage for keeps"),
    ]
    outs = {}
    for dist in (False, True):
        out = curation.curate(_docs(rows), quotas={"a": 5, "b": 5},
                              entropy_min=2.0, fuzzy_threshold=0.5,
                              fuzzy_distributed=dist).to_pandas()
        outs[dist] = out.sort_values("doc_id").reset_index(drop=True)
        assert sorted(out["doc_id"]) == [0, 2], dist
    pd.testing.assert_frame_equal(outs[False], outs[True])

    # without the fuzzy leg the near-dup survives (pins that the drop
    # above is the fuzzy leg's doing, not the quality filter)
    base = curation.curate(_docs(rows), quotas={"a": 5, "b": 5},
                           entropy_min=2.0).to_pandas()
    assert sorted(base["doc_id"]) == [0, 1, 2]
