"""Funnel ordering semantics and deterministic weighted sampling."""

import math

import numpy as np
import pandas as pd
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import sampling, temporal


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    return ray.data.from_pandas(df)


def test_funnel_strict_ordering():
    ev = _events([
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),  # full
        (2, 10, "click"), (2, 20, "view"),        # click BEFORE view
        (3, 10, "view"), (3, 10, "click"),        # same-ts click: strict >
        (4, 10, "view"), (4, 20, "click"),        # no purchase
        (5, 5, "purchase"),                       # purchase only
    ])
    out = temporal.funnel_counts(
        ev, key="user_id", ts="ts", type_col="event_type",
        stages=["view", "click", "purchase"])
    got = dict(zip(out["stage"], out["n_users"]))
    assert got == {"view": 4, "click": 2, "purchase": 1}
    assert list(out["stage"]) == ["view", "click", "purchase"]


def test_funnel_later_click_recovers_same_ts_tie():
    # user 3 pattern plus a LATER click: the later click qualifies
    ev = _events([(3, 10, "view"), (3, 10, "click"), (3, 15, "click"),
                  (3, 16, "purchase")])
    out = temporal.funnel_counts(
        ev, key="user_id", ts="ts", type_col="event_type",
        stages=["view", "click", "purchase"])
    got = dict(zip(out["stage"], out["n_users"]))
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_weighted_sample_matches_local_reference():
    n = 500
    ids = np.arange(n, dtype="int64")
    w = (ids % 7 + 1).astype("int64") * 10
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "w": w}))
    out = sampling.sample_weighted(ds, key_col="doc_id", weight_col="w",
                                   k=15).to_pandas()
    h = (ids * sampling.KNUTH) % (1 << 32)
    u = (h.astype("float64") + 1.0) / 4294967297.0
    score = np.round(np.log(u) / w, 6)
    ref = pd.DataFrame({"doc_id": ids, "s": score}) \
        .sort_values(["s", "doc_id"], ascending=[False, True]).head(15)
    assert list(out["doc_id"]) == list(ref["doc_id"])
    assert list(out["es_score"]) == list(ref["s"])


def test_weighted_sample_excludes_nonpositive_weights():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(5, dtype="int64"),
         "w": np.array([0, -3, 10, 10, 10], dtype="int64")}))
    out = sampling.sample_weighted(ds, key_col="doc_id", weight_col="w",
                                   k=10).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3, 4]
