"""Mergeable approximate sketches (stages/sketch.py): Count-Min's
one-sided error bound under adversarial cardinality, HyperLogLog's
relative-error bound and merge idempotence."""

import numpy as np
import pandas as pd
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import sketch


def _zipf_ds(n=200_000, seed=5):
    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.5, n)
    vals = vals[vals < 100_000].astype("int64")
    return vals, ray.data.from_pandas(
        pd.DataFrame({"v": vals})).repartition(8)


def test_cms_never_underestimates_and_bounded_over(ray_session):
    vals, ds = _zipf_ds()
    cms = sketch.cms_build(ds, col="v")
    true = pd.Series(vals).value_counts().head(50)
    est = sketch.cms_query(cms, pd.Series(true.index.to_numpy()))
    assert (est >= true.to_numpy()).all()          # one-sided guarantee
    # eps = e/width; overestimate < eps * N with overwhelming probability
    eps_n = np.e / sketch.CMS_WIDTH * len(vals)
    assert (est - true.to_numpy()).max() <= eps_n


def test_cms_grids_sum_associatively(ray_session):
    vals, ds = _zipf_ds(50_000, seed=9)
    whole = sketch.cms_build(ds, col="v")
    half1 = sketch.cms_build(ray.data.from_pandas(
        pd.DataFrame({"v": vals[: len(vals) // 2]})), col="v")
    half2 = sketch.cms_build(ray.data.from_pandas(
        pd.DataFrame({"v": vals[len(vals) // 2:]})), col="v")
    assert (whole == half1 + half2).all()          # mergeable by +


def test_hll_error_bound_and_idempotent_merge(ray_session):
    vals, ds = _zipf_ds()
    regs = sketch.hll_build(ds, col="v")
    est = sketch.hll_estimate(regs)
    true = pd.Series(vals).nunique()
    assert abs(est - true) / true < 0.05           # ~3 sigma at p=12
    # max-merge is idempotent: unioning a sketch with itself changes nothing
    assert sketch.hll_estimate(np.maximum(regs, regs)) == est


def test_hll_small_range_linear_counting(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"v": np.arange(100, dtype=np.int64)}))
    est = sketch.hll_estimate(sketch.hll_build(ds, col="v"))
    assert abs(est - 100) / 100 < 0.05


def test_sketches_hash_strings_too(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"v": [f"tok{i % 37}" for i in range(5000)]}))
    cms = sketch.cms_build(ds, col="v")
    est = sketch.cms_query(cms, pd.Series(["tok0"], dtype="object"))
    assert est[0] >= 5000 // 37
    hll = sketch.hll_estimate(sketch.hll_build(ds, col="v"))
    assert abs(hll - 37) / 37 < 0.10


def _rank_error(vals: np.ndarray, estimates: np.ndarray,
                qs: np.ndarray) -> np.ndarray:
    """|empirical rank of estimate - q| per target quantile."""
    s = np.sort(vals)
    ranks = np.searchsorted(s, estimates, side="left") / len(s)
    return np.abs(ranks - qs)


def test_tdigest_rank_error_bound(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.lognormal(0.0, 2.0, 120_000)        # heavy right tail
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(10)
    dig = sketch.tdigest_build(ds, "v")
    assert len(dig) <= 2 * sketch.TDIGEST_DELTA
    qs = np.array([0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999])
    est = sketch.tdigest_quantile(dig, qs)
    err = _rank_error(vals, est, qs)
    assert err.max() < 0.01                        # mid-range bound
    # k1 scale keeps the tails an order sharper than the middle bound
    assert err[[0, 1, -2, -1]].max() < 0.002


def test_tdigest_distributed_same_bound(ray_session):
    rng = np.random.default_rng(12)
    vals = rng.normal(100.0, 15.0, 60_000)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(9)
    qs = np.array([0.01, 0.5, 0.99])
    for distributed in (False, True):
        dig = sketch.tdigest_build(ds, "v", distributed=distributed)
        err = _rank_error(vals, sketch.tdigest_quantile(dig, qs), qs)
        assert err.max() < 0.01, f"distributed={distributed}"


def test_tdigest_handles_nan_and_empty(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"v": [np.nan, np.nan]}))
    dig = sketch.tdigest_build(ds, "v")
    assert len(dig) == 0
    assert np.isnan(sketch.tdigest_quantile(dig, [0.5])).all()


def test_hll_by_key_error_bound_and_merge_invariance():
    import numpy as np
    import pandas as pd
    import ray
    from recursive_pdf_extraction_and_rag_ray.stages.sketch import hll_by_key

    rng = np.random.RandomState(4)
    rows = pd.DataFrame({
        "k": np.array(["a", "b", "c"])[rng.randint(0, 3, size=30000)],
        "v": rng.randint(0, 5000, size=30000)})
    truth = rows.groupby("k")["v"].nunique()
    outs = []
    for nparts in (3, 17):
        ds = ray.data.from_pandas(rows).repartition(nparts)
        est = hll_by_key(ds, key_col="k", val_col="v").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        outs.append(est)
        for _, r in est.iterrows():
            err = abs(r["n_distinct_est"] - truth[r["k"]]) / truth[r["k"]]
            assert err < 0.06, (r["k"], r["n_distinct_est"], truth[r["k"]])
    # register max is associative + idempotent: identical estimates
    # under any partitioning
    pd.testing.assert_frame_equal(outs[0], outs[1])
