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
