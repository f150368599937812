"""Grouped moments (stages/stats.py), hopping windows, exact distinct
per key: numerical stability, fanout exactness, partitioning
invariance. Oracle parity runs via test_queries.py's auto-parametrized
DuckDB gate (stats_by_flag / events_hopping / distinct_users_by_type)."""

import numpy as np
import pandas as pd
import ray

from recursive_pdf_extraction_and_rag_ray.stages import stats
from recursive_pdf_extraction_and_rag_ray.stages.sketch import (
    distinct_count_by_key)
from recursive_pdf_extraction_and_rag_ray.stages.temporal import (
    hopping_window_agg)


def _moments_df(n=4000, seed=5):
    rng = np.random.RandomState(seed)
    # large offset: the naive sum-of-squares formula loses ~all precision
    # here; the Chan-merge path must not
    x = 1e8 + rng.normal(scale=3.0, size=n)
    y = 2.0 * x + rng.normal(scale=1.0, size=n)
    key = np.array(["a", "b"])[rng.randint(0, 2, size=n)]
    return pd.DataFrame({"k": key, "x": x, "y": y})


def test_moments_match_numpy_at_large_offset():
    df = _moments_df()
    ds = ray.data.from_pandas(df).repartition(9)
    out = stats.grouped_moments(ds, key_col="k", x_col="x",
                                y_col="y").to_pandas()
    out = out.set_index("k").sort_index()
    for k, g in df.groupby("k"):
        assert out.loc[k, "n"] == len(g)
        assert abs(out.loc[k, "mean_x"] - g["x"].mean()) < 1e-4
        assert abs(out.loc[k, "std_x"] - g["x"].std(ddof=1)) < 1e-6
        ref_corr = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(out.loc[k, "corr_xy"] - ref_corr) < 1e-6


def test_moments_partitioning_invariant():
    df = _moments_df(n=1500, seed=9)
    outs = []
    for nparts in (1, 11):
        ds = ray.data.from_pandas(df).repartition(nparts)
        outs.append(stats.grouped_moments(
            ds, key_col="k", x_col="x", y_col="y").to_pandas()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_moments_single_row_group():
    df = pd.DataFrame({"k": ["solo", "a", "a"], "x": [5.0, 1.0, 3.0]})
    out = stats.grouped_moments(ray.data.from_pandas(df), key_col="k",
                                x_col="x").to_pandas().set_index("k")
    assert out.loc["solo", "n"] == 1
    assert pd.isna(out.loc["solo", "std_x"])  # n<2 -> undefined
    assert out.loc["a", "std_x"] == round(np.std([1.0, 3.0], ddof=1), 6)


def test_hopping_every_event_in_exactly_size_over_hop_windows():
    ts = pd.to_datetime([1000, 1700, 2500, 86000], unit="s")
    df = pd.DataFrame({"ts": ts, "value": [1.0, 2.0, 3.0, 4.0]})
    out = hopping_window_agg(ray.data.from_pandas(df), size_s=1800,
                             hop_s=900).to_pandas()
    assert out["n_events"].sum() == 2 * len(df)
    # event at t=1000 (bucket 900) -> windows 900 and 0
    w = out.set_index("win_start")
    assert w.loc[900, "n_events"] >= 1 and w.loc[0, "n_events"] >= 1
    # window sums count each member's value once per window
    assert abs(out["sum_value"].sum() - 2 * df["value"].sum()) < 1e-9


def test_hopping_rejects_non_multiple():
    df = pd.DataFrame({"ts": pd.to_datetime([0], unit="s"),
                       "value": [1.0]})
    import pytest
    with pytest.raises(ValueError):
        hopping_window_agg(ray.data.from_pandas(df), size_s=1000,
                           hop_s=900)


def test_distinct_count_dedups_across_batches():
    # the same (key, val) pair planted in every partition must count once
    rows = [{"k": "hot", "v": i % 3} for i in range(300)]
    rows += [{"k": "cold", "v": i} for i in range(7)]
    ds = ray.data.from_items(rows).repartition(10)
    out = distinct_count_by_key(ds, key_col="k", val_col="v",
                                out="n_distinct").to_pandas()
    got = dict(zip(out["k"], out["n_distinct"]))
    assert got == {"hot": 3, "cold": 7}
