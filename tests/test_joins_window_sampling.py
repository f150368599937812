"""Semi/anti join (stages/joins.py), window functions (stages/window.py)
and deterministic sampling (stages/sampling.py): the paths the DuckDB
oracle queries don't reach — semi direction, mixed-dtype passthrough,
distributed grouped-quantile combine, uniform sampling rate."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import joins, sampling, sketch, window


def _left():
    return pd.DataFrame({
        "k": np.arange(10, dtype=np.int64),
        "name": [f"u{i}" for i in range(10)],
        "score": np.float64([1.5] * 10),
        "joined": pd.to_datetime(["2024-01-01"] * 10),
        "flag": np.array([i % 2 == 0 for i in range(10)]),
    })


def _right():
    # keys 0,2,4,6,8 present (with duplicates to exercise the shrink)
    return pd.DataFrame({"k": np.int64([0, 0, 2, 4, 4, 6, 8, 8])})


def test_semi_and_anti_partition_left_exactly(ray_session):
    l = ray.data.from_pandas(_left()).repartition(4)
    r = ray.data.from_pandas(_right()).repartition(3)
    semi = joins.semi_join(l, r, on="k").to_pandas().sort_values("k")
    anti = joins.anti_join(l, r, on="k").to_pandas().sort_values("k")
    assert semi["k"].tolist() == [0, 2, 4, 6, 8]
    assert anti["k"].tolist() == [1, 3, 5, 7, 9]
    # passthrough must preserve every column and dtype of the left
    expect = _left()
    for out in (semi, anti):
        assert list(out.columns) == list(expect.columns)
        for c in expect.columns:
            assert out[c].dtype == expect[c].dtype, c
    assert semi["name"].tolist() == ["u0", "u2", "u4", "u6", "u8"]


def test_anti_join_empty_right_keeps_all(ray_session):
    l = ray.data.from_pandas(_left()).repartition(2)
    r = ray.data.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
    assert joins.anti_join(l, r, on="k").count() == 10
    assert joins.semi_join(l, r, on="k").count() == 0


@pytest.mark.parametrize("distributed", [False, True])
def test_grouped_quantiles_match_pandas(ray_session, distributed):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 500),
                       "v": rng.integers(0, 100, 500).astype("int64")})
    out = sketch.exact_quantiles_grouped(
        ray.data.from_pandas(df).repartition(6), group_col="g", col="v",
        ps=[0.5, 0.9], distributed=distributed)
    for (g, p), sub in out.groupby(["g", "p"]):
        vals = np.sort(df.loc[df["g"] == g, "v"].to_numpy())
        rank = max(1, int(np.ceil(p * len(vals))))
        assert sub["v"].iloc[0] == vals[rank - 1], (g, p)


def test_window_lag_rank_cumsum_against_pandas(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 7, 200).astype("int64"),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10000, 200), unit="s"),
        "i": np.arange(200, dtype=np.int64),
        "v": rng.integers(0, 50, 200).astype("int64"),
    })
    out = window.window_lag_rank_cumsum(
        ray.data.from_pandas(df).repartition(5), key="k", ts="ts",
        order_tiebreak="i", value_col="v").to_pandas() \
        .sort_values("i").reset_index(drop=True)
    oracle = df.sort_values(["k", "ts", "i"]).copy()
    grp = oracle.groupby("k")["v"]
    oracle["prev_value"] = grp.shift(1)
    oracle["rn"] = grp.cumcount() + 1
    oracle["running_sum"] = grp.cumsum()
    oracle = oracle.sort_values("i").reset_index(drop=True)
    assert out["rn"].tolist() == oracle["rn"].tolist()
    assert out["running_sum"].tolist() == oracle["running_sum"].tolist()
    a, b = out["prev_value"].to_numpy(), oracle["prev_value"].to_numpy()
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


def test_sample_uniform_is_deterministic_and_rate_shaped(ray_session):
    df = pd.DataFrame({"id": np.arange(20000, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(8)
    a = sampling.sample_uniform(ds, key_col="id", rate=0.1).to_pandas()
    b = sampling.sample_uniform(ds, key_col="id", rate=0.1).to_pandas()
    assert sorted(a["id"]) == sorted(b["id"])          # run-invariant
    assert abs(len(a) / 20000 - 0.1) < 0.01            # rate honored
    # subset property: a lower rate selects a subset of a higher rate
    c = sampling.sample_uniform(ds, key_col="id", rate=0.05).to_pandas()
    assert set(c["id"]).issubset(set(a["id"]))


def test_left_join_sum_fused_semantics(ray_session):
    """left_join_sum = LEFT JOIN + SUM in one shuffle: zero-fill for
    unmatched left keys, duplicate right keys sum, right keys with no
    left row are dropped (join is left-directed)."""
    l = ray.data.from_pandas(_left()).repartition(4)
    r = ray.data.from_pandas(pd.DataFrame({
        "k": np.int64([0, 0, 2, 4, 4, 4, 99]),      # 99: no left row
        "n": np.int64([1, 2, 5, 1, 1, 1, 7]),
    })).repartition(3)
    out = joins.left_join_sum(l, r, on="k", val="n") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == list(range(10))
    assert out["n"].tolist() == [3, 0, 5, 0, 3, 0, 0, 0, 0, 0]
    expect = _left()
    for c in expect.columns:
        assert out[c].dtype == expect[c].dtype, c
    assert out["n"].dtype == np.dtype("int64")


def test_grouped_sum_by_key_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": rng.integers(0, 40, 500).astype("int64"),
                       "v": rng.integers(0, 9, 500).astype("int64")})
    out = joins.grouped_sum_by_key(
        ray.data.from_pandas(df).repartition(8), key="k", val="v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.groupby("k", as_index=False)["v"].sum()
    pd.testing.assert_frame_equal(out, exp)
