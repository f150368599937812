"""Distributed Lloyd k-means (stages/clustering.py): parity with a
pure-numpy reference, partitioning invariance, convergence, edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray

from recursive_pdf_extraction_and_rag_ray.stages import clustering
from recursive_pdf_extraction_and_rag_ray.stages.similarity import _normalize


def _toy(n=240, dim=8, k_true=4, seed=7):
    rng = np.random.RandomState(seed)
    cents = _normalize(rng.normal(size=(k_true, dim)))
    rows = []
    for i in range(n):
        c = i % k_true
        v = cents[c] + 0.05 * rng.normal(size=dim)
        rows.append({"vec_id": i, "embedding": v.astype(np.float64)})
    return rows


def _numpy_lloyd(X, init, iters, tol, spherical=True):
    """Reference single-machine Lloyd with identical update rules."""
    cents = init.copy()
    hist = []
    for _ in range(iters):
        if spherical:
            Xn = _normalize(X)
            sims = Xn @ cents.T
            assign = np.argmax(sims, axis=1)
            hist.append(float(len(X) - sims[np.arange(len(X)),
                                            assign].sum()))
            src = Xn
        else:
            d = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)
            assign = np.argmin(d, axis=1)
            hist.append(float(d[np.arange(len(X)), assign].sum()
                              + (X * X).sum()))
            src = X
        new = cents.copy()
        for c in range(len(cents)):
            m = src[assign == c]
            if len(m):
                new[c] = m.mean(axis=0)
        if spherical:
            new = _normalize(new)
        shift = float(np.max(np.linalg.norm(new - cents, axis=1)))
        cents = new
        if shift < tol:
            break
    return cents, hist


@pytest.fixture(scope="module")
def toy_rows():
    return _toy()


def test_matches_numpy_reference(toy_rows):
    ds = ray.data.from_items(toy_rows).repartition(5)
    init = _normalize(np.stack(
        [np.asarray(r["embedding"]) for r in toy_rows[:4]]))
    fit = clustering.kmeans_fit(ds, n_clusters=4, iters=6, tol=1e-9,
                                init_centroids=init)
    X = np.stack([np.asarray(r["embedding"]) for r in toy_rows])
    ref_cents, ref_hist = _numpy_lloyd(X, init, iters=6, tol=1e-9)
    assert np.allclose(fit.centroids, ref_cents, atol=1e-9)
    assert len(fit.inertia_history) == len(ref_hist)
    assert np.allclose(fit.inertia_history, ref_hist, atol=1e-7)


def test_euclidean_matches_numpy_reference(toy_rows):
    ds = ray.data.from_items(toy_rows).repartition(3)
    init = np.stack([np.asarray(r["embedding"]) for r in toy_rows[:4]])
    fit = clustering.kmeans_fit(ds, n_clusters=4, iters=5, tol=1e-9,
                                init_centroids=init, spherical=False)
    X = np.stack([np.asarray(r["embedding"]) for r in toy_rows])
    ref_cents, _ = _numpy_lloyd(X, init, iters=5, tol=1e-9,
                                spherical=False)
    assert np.allclose(fit.centroids, ref_cents, atol=1e-9)


def test_partitioning_invariance(toy_rows):
    init = _normalize(np.stack(
        [np.asarray(r["embedding"]) for r in toy_rows[:4]]))
    fits = []
    for nparts in (2, 9):
        ds = ray.data.from_items(toy_rows).repartition(nparts)
        fits.append(clustering.kmeans_fit(
            ds, n_clusters=4, iters=6, init_centroids=init, fanin=4))
    assert np.allclose(fits[0].centroids, fits[1].centroids, atol=1e-8)
    assert np.array_equal(fits[0].counts, fits[1].counts)


def test_objective_non_increasing(toy_rows):
    ds = ray.data.from_items(toy_rows)
    init = _normalize(np.stack(
        [np.asarray(r["embedding"]) for r in toy_rows[:4]]))
    fit = clustering.kmeans_fit(ds, n_clusters=4, iters=8, tol=0.0,
                                init_centroids=init)
    h = fit.inertia_history
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))


def test_empty_cluster_keeps_centroid():
    # two distinct points, k=4: two clusters stay empty and must keep
    # their init centroid (count 0), not NaN out
    rows = [{"vec_id": 0, "embedding": np.array([1.0, 0.0])},
            {"vec_id": 1, "embedding": np.array([0.0, 1.0])}]
    init = _normalize(np.array([[1.0, 0.1], [0.1, 1.0],
                                [-1.0, 0.0], [0.0, -1.0]]))
    fit = clustering.kmeans_fit(ray.data.from_items(rows), n_clusters=4,
                                iters=3, init_centroids=init)
    assert fit.counts.sum() == 2
    empty = fit.counts == 0
    assert empty.sum() == 2
    assert np.allclose(fit.centroids[empty], init[empty])


def test_early_stop_on_tol(toy_rows):
    ds = ray.data.from_items(toy_rows)
    init = _normalize(np.stack(
        [np.asarray(r["embedding"]) for r in toy_rows[:4]]))
    fit = clustering.kmeans_fit(ds, n_clusters=4, iters=50, tol=1e-3,
                                init_centroids=init)
    assert fit.n_iter < 50


def test_cluster_stats_accounts_every_row(toy_rows):
    ds = ray.data.from_items(toy_rows).repartition(4)
    init = _normalize(np.stack(
        [np.asarray(r["embedding"]) for r in toy_rows[:4]]))
    fit = clustering.kmeans_fit(ds, n_clusters=4, iters=4,
                                init_centroids=init)
    stats = clustering.kmeans_cluster_stats(
        ds, fit.centroids).sort("cluster").to_pandas()
    assert int(stats["n_members"].sum()) == len(toy_rows)
    assert (stats["mean_sim"] <= 1.0 + 1e-9).all()
    # stats counts agree with the final fit-iteration counts
    by_cluster = dict(zip(stats["cluster"], stats["n_members"]))
    for c, n in enumerate(fit.counts):
        assert by_cluster.get(c, 0) == n


def test_query_registered_and_deterministic():
    import os
    sf_dir = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from recursive_pdf_extraction_and_rag_ray.pipelines import queries as qmod
    fn = qmod.queries()["kmeans_clusters"]
    a = fn(sf_dir)
    a = a.to_pandas() if not isinstance(a, pd.DataFrame) else a
    b = fn(sf_dir)
    b = b.to_pandas() if not isinstance(b, pd.DataFrame) else b
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert list(a.columns) == ["cluster", "n_members", "mean_sim"]
    assert a["n_members"].sum() > 0
