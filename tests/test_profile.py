"""Profiling operators (stages/profile.py) and the left-join mode
(stages/joins.py): nulls in the profile, histogram edge clamping, pivot
zero-fill with fixed columns, left-join miss semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import joins, profile


def test_profile_columns_with_nulls(ray_session):
    df = pd.DataFrame({
        "i": pd.Series([3, 1, None, 7], dtype="float64"),  # nullable int-ish
        "s": ["b", None, "a", "c"],
        "t": pd.to_datetime(["2024-01-02", "2024-01-01", None, "2024-01-03"]),
    })
    # int profile path expects integer-valued input; use a clean int col too
    df["k"] = np.int64([10, 20, 30, 40])
    out = profile.profile_columns(
        ray.data.from_pandas(df).repartition(2),
        int_cols=["k"], str_cols=["s"], ts_cols=["t"])
    out = out.set_index("column")
    assert out.loc["k", "min_value"] == "10"
    assert out.loc["k", "max_value"] == "40"
    assert out.loc["k", "n_null"] == 0
    assert out.loc["s", "n_null"] == 1
    assert out.loc["s", "min_value"] == "a"
    assert out.loc["t", "n_null"] == 1
    # epoch-us of 2024-01-01T00:00:00
    assert out.loc["t", "min_value"] == str(
        int(pd.Timestamp("2024-01-01").value // 1000))
    assert (out["n_rows"] == 4).all()


def test_histogram_clamps_edges(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "v": np.int64([-5, 0, 9, 10, 19, 99, 100, 1000])})).repartition(3)
    out = profile.histogram_fixed(ds, col="v", lo=0, width=10, nbins=3)
    assert out["bin"].tolist() == [0, 1, 2]
    assert out["n"].tolist() == [3, 2, 3]   # -5,0,9 | 10,19 | 99,100,1000
    assert out["bin_lo"].tolist() == [0, 10, 20]
    assert out["bin_hi"].tolist() == [9, 19, 29]
    assert out["n"].sum() == 8              # nothing dropped


def test_pivot_counts_zero_fill_and_fixed_cols(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "r": ["x", "x", "y"], "c": ["a", "b", "a"]})).repartition(2)
    out = profile.pivot_counts(ds, row_key="r", col_key="c",
                               col_values=["a", "b", "never"])
    assert list(out.columns) == ["r", "a", "b", "never"]
    assert out.set_index("r").loc["y"].tolist() == [1, 0, 0]
    assert out["never"].sum() == 0


def test_left_join_keeps_misses_uniform_dtype(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({
        "k": np.int64([1, 2, 3]), "lv": ["a", "b", "c"]})).repartition(3)
    r = ray.data.from_pandas(pd.DataFrame({
        "k": np.int64([2]), "rv": np.int64([20])})).repartition(1)
    out = joins.left_join(l, r, on="k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert len(out) == 3
    # float64 in every partition, including those with matches only
    assert out["rv"].dtype == np.float64
    assert np.isnan(out.loc[0, "rv"]) and out.loc[1, "rv"] == 20.0


def test_equi_join_rejects_bad_how(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": np.int64([1])}))
    with pytest.raises(ValueError, match="how"):
        joins.equi_join(l, l, on="k", how="outer")
