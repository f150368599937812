"""Distributed Lloyd's k-means over the FULL embedding corpus.

``similarity.ivf_train_centroids`` trains a coarse quantizer on a
bounded driver-side sample — the standard IVF recipe, and fine for
blocking. This module is the full-corpus refinement next to it: every
row votes in every iteration, so centroids track the true cluster
means instead of the sample's. Used to sharpen the quantizer behind
``ivf_ann`` / SemDeDup blocking (both accept ``centroids=``), and as a
first-class corpus-clustering operator (cluster-balanced curation,
topic bucketing) in its own right.

Scale shape (nothing corpus-sized ever reaches the driver):
- the working set is projected to the vector column only and
  materialized ONCE into the (spillable) object store, so the T Lloyd
  iterations re-read cached blocks instead of re-scanning parquet T
  times — the standard iterative-algorithm trade (Spark ``cache()``
  for ML loops); pass ``cache=False`` to keep the pure streaming scan;
- per iteration, centroids are broadcast once via ``ray.put`` and each
  ``map_batches`` task reduces its batch to ONE slim partial row
  (k x dim scatter-added sums + k counts + scalar inertia);
- partial rows go through a bounded-fan-in tree combine
  (``repartition(fanin)`` + per-block sum) so the driver receives at
  most ``fanin`` rows of k x dim floats, independent of corpus size —
  the accumulator is centroid-sized by construction;
- iteration stops early when the max centroid shift drops below
  ``tol``; Lloyd guarantees the objective is non-increasing.

Reference parity note: the reference has no clustering (its dedup is
an exact content-hash map, src/services/RAG/convert_to_embeddings.py);
this is part of the embedding-space curation layer a 100 TB pipeline
adds (SemDeDup, Abbas et al. 2023, arXiv:2303.09540 trains k-means the
same way).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd

import ray

from .similarity import (IVF_TRAIN_SAMPLE, _as_matrix, _normalize,
                         ivf_train_centroids)

KMEANS_FANIN = 32


@dataclass
class KMeansResult:
    centroids: np.ndarray            # (k, dim) float64
    counts: np.ndarray               # (k,) int64 members at the last step
    n_iter: int
    inertia: float                   # final objective
    inertia_history: List[float] = field(default_factory=list)
    spherical: bool = True


def _partial_stats(df: pd.DataFrame, cents: np.ndarray, vec_col: str,
                   spherical: bool) -> pd.DataFrame:
    """One slim row per batch: flattened per-centroid vector sums,
    per-centroid counts, scalar inertia contribution."""
    k, dim = cents.shape
    if not len(df):
        return pd.DataFrame({
            "sums": [np.zeros(k * dim, dtype=np.float64)],
            "counts": [np.zeros(k, dtype=np.int64)],
            "inertia": pd.Series([0.0], dtype="float64"),
        })
    m = _as_matrix(df[vec_col])
    if spherical:
        mn = _normalize(m)
        sims = mn @ cents.T                       # (n, k) cosine
        assign = np.argmax(sims, axis=1)
        # spherical objective: sum(1 - cos to assigned centroid)
        inertia = float(len(m) - sims[np.arange(len(m)), assign].sum())
        src = mn
    else:
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c drops ||x||^2
        d = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)
        assign = np.argmin(d, axis=1)
        inertia = float(d[np.arange(len(m)), assign].sum()
                        + (m * m).sum())
        src = m
    sums = np.zeros((k, dim), dtype=np.float64)
    np.add.at(sums, assign, src)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return pd.DataFrame({"sums": [sums.ravel()], "counts": [counts],
                         "inertia": pd.Series([inertia], dtype="float64")})


def _sum_partials(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    sums = np.sum(np.stack([np.asarray(v, dtype=np.float64)
                            for v in df["sums"]]), axis=0)
    counts = np.sum(np.stack([np.asarray(v, dtype=np.int64)
                              for v in df["counts"]]), axis=0)
    return pd.DataFrame({"sums": [sums], "counts": [counts],
                         "inertia": pd.Series([float(df["inertia"].sum())],
                                              dtype="float64")})


def kmeans_fit(ds: "ray.data.Dataset", *, n_clusters: int = 16,
               iters: int = 10, tol: float = 1e-6, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding",
               spherical: bool = True, sample: int = IVF_TRAIN_SAMPLE,
               source_path: Optional[str] = None,
               init_centroids: Optional[np.ndarray] = None,
               fanin: int = KMEANS_FANIN,
               cache: bool = True) -> KMeansResult:
    """Full-corpus Lloyd refinement. Init comes from the bounded
    deterministic sample quantizer (``ivf_train_centroids``) unless
    ``init_centroids`` is given, so results are run- and
    partitioning-invariant up to float-summation order (asserted to
    1e-8 in tests/test_clustering.py)."""
    if init_centroids is not None:
        cents = np.ascontiguousarray(np.asarray(init_centroids,
                                                dtype=np.float64))
        if spherical:
            cents = _normalize(cents)
    else:
        cents = ivf_train_centroids(ds, n_centroids=n_clusters,
                                    sample=sample, seed=seed,
                                    id_col=id_col, vec_col=vec_col,
                                    source_path=source_path)
        if not spherical:
            cents = np.ascontiguousarray(cents)
    k, dim = cents.shape

    work = ds.select_columns([vec_col])
    small = False
    if cache:
        work = work.materialize()
        # one partial row per block, each k x dim x 8 B (~4 KB at k=8,
        # d=64): taking them straight to the driver is cheaper than a
        # per-iteration tree-combine shuffle until block counts reach
        # the thousands, so the combine leg only engages beyond that
        small = work.num_blocks() <= max(fanin, 4096)

    history: List[float] = []
    counts = np.zeros(k, dtype=np.int64)
    n_iter = 0
    for it in range(iters):
        cref = ray.put(cents)

        def partial(df: pd.DataFrame, _cref=cref) -> pd.DataFrame:
            return _partial_stats(df, ray.get(_cref), vec_col, spherical)

        parts = work.map_batches(partial, batch_format="pandas")
        if small:
            rows = parts.take_all()
        else:
            rows = (parts.repartition(fanin)
                    .map_batches(_sum_partials, batch_format="pandas",
                                 batch_size=None)
                    .take_all())
        agg = _sum_partials(pd.DataFrame(rows))
        sums = np.asarray(agg["sums"][0]).reshape(k, dim)
        counts = np.asarray(agg["counts"][0], dtype=np.int64)
        history.append(float(agg["inertia"][0]))
        n_iter = it + 1

        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        if spherical:
            new = _normalize(new)
        shift = float(np.max(np.linalg.norm(new - cents, axis=1)))
        cents = new
        if shift < tol:
            break

    return KMeansResult(centroids=cents, counts=counts, n_iter=n_iter,
                        inertia=history[-1] if history else 0.0,
                        inertia_history=history, spherical=spherical)


def kmeans_cluster_stats(ds: "ray.data.Dataset", centroids: np.ndarray, *,
                         vec_col: str = "embedding",
                         spherical: bool = True) -> "ray.data.Dataset":
    """Per-cluster (cluster, n_members, mean_sim) — assignment is one
    matmul per batch against the broadcast centroid matrix, partials
    are <= k rows per batch, and the only shuffle is a k-row groupby."""
    cents = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    if spherical:
        cents = _normalize(cents)
    cref = ray.put(cents)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        if not len(df):
            return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "sim_sum": pd.Series([], dtype="float64")})
        m = _normalize(_as_matrix(df[vec_col]))
        sims = m @ c.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(m)), assign]
        g = pd.DataFrame({"cluster": assign, "best": best}).groupby(
            "cluster", sort=True)
        out = g.size().rename("n").reset_index()
        out["sim_sum"] = g["best"].sum().to_numpy()
        out["cluster"] = out["cluster"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    from ray.data.aggregate import Sum

    agg = (ds.select_columns([vec_col])
           .map_batches(partial, batch_format="pandas")
           .groupby("cluster")
           .aggregate(Sum("n", alias_name="n_members"),
                      Sum("sim_sum", alias_name="sim_sum")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_members"] = df["n_members"].astype("int64")
        df["mean_sim"] = (df["sim_sum"] / df["n_members"]).round(6)
        return df[["cluster", "n_members", "mean_sim"]]

    return agg.map_batches(finish, batch_format="pandas")
