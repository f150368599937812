"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540 — public method): k-means-cluster the embedding
space with a bounded-sample coarse quantizer, find within-cluster
cosine-similar pairs, and keep only the minimum id per duplicate
component. Removes "semantic duplicates" that exact/minhash dedup
misses (paraphrases, templated rewrites).

Reference parity note: the reference dedups only by exact content
hash (src/services/RAG/convert_to_embeddings.py seen-files map); this
is the embedding-space generalization a 100 TB curation pipeline
layers on top.

Scale shape (no stage is O(corpus^2), nothing big lands on the driver):
- centroids train on a bounded DETERMINISTIC sample
  (similarity.ivf_train_centroids — parquet predicate pushdown when
  ``source_path`` is given) and are broadcast once via ``ray.put``;
- assignment is one vectorized matmul per batch, row-local, no shuffle;
- pair discovery reuses the tiled bounded-width within-block scan
  (skewtools.tiled_pair_groups via similarity.cosine_neardup_pairs):
  a hot cluster is split into <= max_width sub-blocks, never one
  O(k^2) task;
- components/losers reuse the dedup machinery's two paths — driver
  union-find over the (tiny, capped) pair list by default,
  ``distributed=True`` for the min-label-propagation + anti-join path
  when the pair list outgrows one machine.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import pandas as pd

import ray

from .similarity import (IVF_CENTROIDS, IVF_TRAIN_SAMPLE, _as_matrix,
                         _normalize, cosine_neardup_pairs,
                         ivf_train_centroids)
from .neardup import (cluster_pairs_keep_first, components_losers_ds,
                      merge_small_blocks, _default_join_partitions)

CLUSTER_COL = "sem_cluster"


def assign_clusters(ds: "ray.data.Dataset", centroids: np.ndarray, *,
                    vec_col: str = "embedding",
                    out_col: str = CLUSTER_COL) -> "ray.data.Dataset":
    """Append the nearest-centroid (max cosine) index as ``out_col``.
    Centroids are ``ray.put`` once and read zero-copy per batch; the
    assignment is a single (batch x dim) @ (dim x k) matmul."""
    cref = ray.put(_normalize(np.ascontiguousarray(
        np.asarray(centroids, dtype=np.float64))))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        if not len(batch):
            out[out_col] = pd.Series([], dtype="int64")
            return out
        cents = ray.get(cref)
        m = _normalize(_as_matrix(batch[vec_col]))
        out[out_col] = np.argmax(m @ cents.T, axis=1).astype("int64")
        return out

    return ds.map_batches(assign, batch_format="pandas")


def semantic_neardup_pairs(ds: "ray.data.Dataset", *,
                           threshold: float = 0.95,
                           n_clusters: int = IVF_CENTROIDS,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           source_path: Optional[str] = None,
                           max_width: int = 200,
                           sample: int = IVF_TRAIN_SAMPLE,
                           refine_iters: int = 0) -> "ray.data.Dataset":
    """(doc_a, doc_b, cos_sim) pairs with cosine >= threshold that share
    a k-means cluster (doc_a < doc_b). Approximation is the published
    SemDeDup trade: a cross-cluster near-dup pair is missed; raise
    recall by lowering ``n_clusters``at quadratic-in-cluster-width cost.

    ``refine_iters > 0`` upgrades the sample-trained quantizer with that
    many FULL-CORPUS Lloyd iterations (stages/clustering.py:kmeans_fit)
    — tighter clusters move fewer true near-dup pairs across cluster
    boundaries, trading one extra corpus pass per iteration for
    recall."""
    cents = ivf_train_centroids(ds, n_centroids=n_clusters, id_col=id_col,
                                vec_col=vec_col, sample=sample,
                                source_path=source_path)
    if refine_iters > 0:
        from .clustering import kmeans_fit
        cents = kmeans_fit(ds, n_clusters=n_clusters, iters=refine_iters,
                           id_col=id_col, vec_col=vec_col,
                           init_centroids=cents).centroids
    blocked = assign_clusters(ds.select_columns([id_col, vec_col]), cents,
                              vec_col=vec_col)
    pairs = cosine_neardup_pairs(blocked, block_col=CLUSTER_COL,
                                 threshold=threshold, id_col=id_col,
                                 vec_col=vec_col, max_width=max_width)
    # component machinery speaks (doc_a, doc_b)
    return pairs.map_batches(
        lambda df: df.rename(columns={"id_a": "doc_a", "id_b": "doc_b"}),
        batch_format="pandas")


def semantic_dedup_keep_first(ds: "ray.data.Dataset", *,
                              threshold: float = 0.95,
                              n_clusters: int = IVF_CENTROIDS,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              source_path: Optional[str] = None,
                              distributed: bool = False,
                              num_partitions: int = 0,
                              max_width: int = 200,
                              sample: int = IVF_TRAIN_SAMPLE,
                              refine_iters: int = 0) -> "ray.data.Dataset":
    """Survivor ids after semantic dedup: for every connected component
    of the within-cluster cosine>=threshold pair graph, keep the minimum
    id (keep-first, same policy as exact dedup J1). Returns a Dataset of
    (id_col,)."""
    pairs_ds = semantic_neardup_pairs(
        ds, threshold=threshold, n_clusters=n_clusters, id_col=id_col,
        vec_col=vec_col, source_path=source_path, max_width=max_width,
        sample=sample, refine_iters=refine_iters)

    if distributed:
        # empty-block join guard (neardup.merge_small_blocks) before the
        # anti-join, same as neardup_dedup_keep_first
        losers_ds, n_losers = merge_small_blocks(
            components_losers_ds(pairs_ds, num_partitions=num_partitions),
            num_partitions or _default_join_partitions())
        if n_losers == 0:
            return ds.select_columns([id_col])

        def survivors(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["winner"].isna()
            return pd.DataFrame(
                {id_col: df.loc[keep, "doc_id"].astype("int64")})

        return ds.select_columns([id_col]).map_batches(
            lambda df: df.rename(columns={id_col: "doc_id"}),
            batch_format="pandas") \
            .join(losers_ds, join_type="left_outer",
                  num_partitions=num_partitions or
                  _default_join_partitions(),
                  on=("doc_id",)) \
            .map_batches(survivors, batch_format="pandas")

    losers = cluster_pairs_keep_first(pairs_ds.to_pandas())
    loser_arr = np.sort(np.fromiter(losers.keys(), dtype=np.int64,
                                    count=len(losers)))
    ref = ray.put(loser_arr)

    def keep(batch: pd.DataFrame, loser_ref) -> pd.DataFrame:
        drop = ray.get(loser_ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pd.DataFrame({id_col: ids[~np.isin(ids, drop)]})

    return ds.select_columns([id_col]).map_batches(
        functools.partial(keep, loser_ref=ref), batch_format="pandas")
