"""Temporal/interval operators (stages/temporal.py) and exact
frequency/quantile operators (stages/sketch.py): the paths the DuckDB
oracle queries don't reach — distributed combine parity, overlapping
band semantics, as-of tie handling across batch boundaries, rolling
window against a brute-force pandas oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import sketch, temporal


def _events(n=400, users=17, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype("int64"),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 3600 * 24 * 30, n), unit="s"),
        "value_e4": rng.integers(-500, 5000, n).astype("int64"),
    })


def test_rolling_window_matches_pandas_oracle(ray_session):
    df = _events()
    out = temporal.rolling_window(
        ray.data.from_pandas(df).repartition(8),
        key="user_id", ts="ts", order_tiebreak="event_id",
        value_col="value_e4", window=4).to_pandas()

    oracle = df.sort_values(["user_id", "ts", "event_id"]).copy()
    g = oracle.groupby("user_id")["value_e4"].rolling(4, min_periods=1)
    oracle["roll_sum"] = g.sum().reset_index(level=0, drop=True).astype("int64")
    oracle["roll_n"] = g.count().reset_index(level=0, drop=True).astype("int64")

    key = ["event_id"]
    out = out.sort_values(key).reset_index(drop=True)
    oracle = oracle.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["event_id", "roll_sum", "roll_n"]],
        oracle[["event_id", "roll_sum", "roll_n"]])


def test_asof_join_ties_and_batch_boundaries(ray_session):
    # two right rows share (key, ts): the greater id must win, even when
    # the duplicates land in different input batches (1-row blocks).
    left = pd.DataFrame({
        "k": np.int64([1, 1, 2]),
        "lts": pd.to_datetime(["2024-01-10", "2024-01-01", "2024-01-10"]),
        "lv": np.float64([10.0, 20.0, 30.0]),
    })
    right = pd.DataFrame({
        "k": np.int64([1, 1, 1, 2]),
        "rts": pd.to_datetime(
            ["2024-01-05", "2024-01-05", "2024-01-08", "2024-02-01"]),
        "rid": np.float64([100.0, 200.0, 50.0, 7.0]),
    })
    out = temporal.asof_join(
        ray.data.from_pandas(left).repartition(3),
        ray.data.from_pandas(right).repartition(4),
        key="k", left_ts="lts", right_ts="rts",
        left_cols=["lv"], right_cols=["rid"],
        int_cols=["rid"]).to_pandas().sort_values("lv")
    # k=1 @ Jan10 -> rts Jan08 rid 50; k=1 @ Jan01 -> no earlier right
    # row (dropped); k=2 @ Jan10 -> Feb01 is later (dropped).
    assert out["lv"].tolist() == [10.0]
    assert out["rid"].tolist() == [50]

    # same (k, ts) tie where the tied rows ARE the match: max rid wins
    left2 = left.iloc[:1].assign(lts=pd.to_datetime(["2024-01-06"]))
    out2 = temporal.asof_join(
        ray.data.from_pandas(left2),
        ray.data.from_pandas(right).repartition(4),
        key="k", left_ts="lts", right_ts="rts",
        left_cols=["lv"], right_cols=["rid"],
        int_cols=["rid"]).to_pandas()
    assert out2["rid"].tolist() == [200]


def test_range_join_overlap_multiplicity(ray_session):
    # bands [0,50) [25,75) [50,100): 30 hits 2 bands, 10 hits 1, 110 none
    df = pd.DataFrame({"id": np.int64([1, 2, 3]),
                       "v": np.float64([30.0, 10.0, 110.0])})
    out = temporal.range_join_broadcast(
        ray.data.from_pandas(df), value_col="v",
        lo=np.float64([0, 25, 50]), hi=np.float64([50, 75, 100])
    ).to_pandas().sort_values(["id", "band"]).reset_index(drop=True)
    assert out[["id", "band"]].values.tolist() == [[1, 0], [1, 1], [2, 0]]


@pytest.mark.parametrize("distributed", [False, True])
def test_heavy_hitters_exact_counts(ray_session, distributed):
    docs = pd.DataFrame({"text": [
        "a b b c C", "b a", None, "  ", "d d d d a"]})
    out = sketch.heavy_hitters_tokens(
        ray.data.from_pandas(docs).repartition(4), k=3,
        distributed=distributed)
    # counts: a=3 b=3 c=2(lowercased) d=4 -> top3 = d4, a3, b3 (tie a<b)
    assert out["token"].tolist() == ["d", "a", "b"]
    assert out["n"].tolist() == [4, 3, 3]


@pytest.mark.parametrize("distributed", [False, True])
def test_exact_quantiles_disc_semantics(ray_session, distributed):
    vals = np.arange(1, 11, dtype=np.int64)  # 1..10
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(5)
    out = sketch.exact_quantiles(ds, "x", [0.25, 0.5, 0.99, 1.0],
                                 distributed=distributed)
    # quantile_disc: sorted[ceil(p*n)-1] -> 3, 5, 10, 10
    assert out["x"].tolist() == [3, 5, 10, 10]


def test_sketch_distributed_matches_driver_combine(ray_session):
    rng = np.random.default_rng(3)
    docs = pd.DataFrame({"text": [
        " ".join(rng.choice(["w%d" % i for i in range(50)], 30))
        for _ in range(200)]})
    ds = ray.data.from_pandas(docs).repartition(8)
    a = sketch.heavy_hitters_tokens(ds, k=25, distributed=False)
    b = sketch.heavy_hitters_tokens(ds, k=25, distributed=True)
    pd.testing.assert_frame_equal(a, b)


def test_ewma_matches_single_machine_reference():
    import numpy as np
    import pandas as pd
    import ray
    from recursive_pdf_extraction_and_rag_ray.stages.temporal import ewma_by_key

    rng = np.random.RandomState(6)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 40, size=n).astype("int64"),
        "ts": pd.to_datetime(rng.randint(0, 10_000, size=n), unit="s"),
        "event_id": np.arange(n, dtype="int64"),
        "value": rng.uniform(0, 10, size=n)})
    got = ewma_by_key(ray.data.from_pandas(df).repartition(8),
                      key="user_id", ts="ts", order_tiebreak="event_id",
                      value_col="value", decay=0.8).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ref_rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], ascending=False)
        rn = np.arange(len(g))
        ref_rows.append((uid, round(float(
            (g["value"].to_numpy() * 0.8 ** rn).sum()), 6)))
    ref = pd.DataFrame(ref_rows, columns=["user_id", "ewma"])
    pd.testing.assert_frame_equal(got, ref, atol=1e-6, rtol=0,
                                  check_exact=False)


def test_ewma_decay_zero_keeps_latest_value():
    import pandas as pd
    import ray
    from recursive_pdf_extraction_and_rag_ray.stages.temporal import ewma_by_key

    df = pd.DataFrame({"user_id": [1, 1, 1],
                       "ts": pd.to_datetime([1, 2, 3], unit="s"),
                       "event_id": [0, 1, 2],
                       "value": [5.0, 7.0, 9.0]})
    got = ewma_by_key(ray.data.from_pandas(df), key="user_id", ts="ts",
                      order_tiebreak="event_id", value_col="value",
                      decay=0.0).to_pandas()
    # 0^0 = 1 for the most recent event, 0 for everything older
    assert float(got["ewma"][0]) == 9.0
