"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k. The query matrix is broadcast ONCE
  via ``ray.put`` and read zero-copy inside every ``map_batches`` task (never
  re-shipped per batch); each batch computes a numpy matmul partial top-k,
  the global top-k is a small ``sort().limit()``. Reference analog: the
  per-collection knn + global merge-sort top-k
  (/root/reference/src/utils/course_outline/rag_py.py:266-291).
- ``lsh_ann``: the scale path — seeded random-hyperplane LSH buckets
  (Charikar 2002); exact cosine only within the query's bucket. Trades
  recall for touching 1/2^bits of the data.
- ``cosine_neardup_pairs``: embedding-cosine near-duplicate pairs within a
  blocking key (label), the embedding member of the dedup family.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

LSH_PLANES = 12


def _as_matrix(col) -> np.ndarray:
    arr = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
    return arr


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BatchTopK:
    """Per-batch partial top-k against a broadcast query matrix."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str,
                 exclude_ids):
        self.q = _normalize(np.atleast_2d(np.asarray(ray.get(query_ref),
                                                     dtype=np.float64)))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude = set(exclude_ids or [])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        m = _normalize(_as_matrix(batch[self.vec_col]))
        sims = m @ self.q.T  # (n, n_queries); single query -> (n, 1)
        out = {"qid": [], self.id_col: [], "cos_sim": []}
        for qi in range(sims.shape[1]):
            # partial selection uses the SAME ordering as the global
            # sort().limit() and the SQL oracle: 6-dp-rounded sim desc, id
            # asc — selecting on raw sims could cut a row that wins a
            # rounded tie on the smaller id
            s = np.round(sims[:, qi], 6)
            order = np.lexsort((ids, -s))[: self.k + len(self.exclude)]
            for i in order:
                ident = ids[i].item() if hasattr(ids[i], "item") else ids[i]
                if ident in self.exclude:
                    continue
                out["qid"].append(qi)
                out[self.id_col].append(ident)
                out["cos_sim"].append(round(float(s[i]), 6))
        return pd.DataFrame(out)


def knn_bruteforce(ds: "ray.data.Dataset", query: np.ndarray, k: int = 10,
                   *, id_col: str = "vec_id", vec_col: str = "embedding",
                   exclude_ids=None) -> "ray.data.Dataset":
    """Exact cosine top-k of ``query`` (1 or more vectors) over ``ds``.
    Multi-query batches share the one corpus scan (one matmul per batch
    against the whole broadcast query matrix); the merge is per-qid —
    a global ``limit(k)`` would hand every slot to qid 0."""
    qarr = np.atleast_2d(np.asarray(query, dtype=np.float64))
    query_ref = ray.put(qarr)
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        _BatchTopK, batch_format="pandas",
        fn_constructor_kwargs=dict(query_ref=query_ref, k=k, id_col=id_col,
                                   vec_col=vec_col, exclude_ids=exclude_ids),
        concurrency=(1, 8), batch_size=4096)
    if qarr.shape[0] == 1:
        return partials.sort(["qid", "cos_sim", id_col],
                             descending=[False, True, False]).limit(k)

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", id_col], ascending=[False, True],
                          kind="mergesort")
        return g.head(k).reset_index(drop=True)

    # partials are <= k rows per (batch, qid): the per-qid merge moves
    # kilobytes, map_groups over n_queries groups is the cheap exact path
    return partials.groupby("qid").map_groups(head_k,
                                              batch_format="pandas")


import functools


@functools.lru_cache(maxsize=32)
def _plane_matrix(dim: int, bits: int = LSH_PLANES, seed: int = 42) -> np.ndarray:
    """Seeded hyperplane matrix, computed ONCE per process per (dim, bits,
    seed) — callers probe it from inside per-batch functions, and state
    setup must not re-run per batch. Treat the returned array as
    read-only (it is shared across calls)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(bits, dim))
    planes.setflags(write=False)
    return planes


def lsh_bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (vecs @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return signs.astype(np.int64) @ weights


def lsh_ann(ds: "ray.data.Dataset", query: np.ndarray, k: int = 10, *,
            id_col: str = "vec_id", vec_col: str = "embedding",
            bits: int = LSH_PLANES, seed: int = 42,
            multiprobe: int = 1,
            dim: Optional[int] = None) -> "ray.data.Dataset":
    """Approximate top-k: filter to the query's hyperplane-LSH bucket, then
    exact cosine within it. Deterministic given the seed.

    ``multiprobe`` widens recall the standard way (multi-probe LSH, Lv et
    al. VLDB 2007): probe every bucket within hamming distance
    ``multiprobe`` of the query's bucket — each flipped bit is a
    hyperplane the query sits near, so neighbors cross it often.
    multiprobe=1 probes 1+bits buckets and still touches only
    ~(1+bits)/2^bits of the data."""
    q = np.asarray(query, dtype=np.float64).reshape(1, -1)
    planes = _plane_matrix(dim or q.shape[1], bits, seed)
    q_bucket = int(lsh_bucket_of(q, planes)[0])
    probe = {q_bucket}
    frontier = {q_bucket}
    for _ in range(max(0, multiprobe)):
        frontier = {b ^ (1 << i) for b in frontier for i in range(bits)}
        probe |= frontier
    probe_arr = np.sort(np.fromiter(probe, dtype=np.int64, count=len(probe)))

    def _in_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[vec_col])
        keep = np.isin(lsh_bucket_of(m, planes), probe_arr)
        return batch.loc[keep]

    candidates = ds.select_columns([id_col, vec_col]).map_batches(
        _in_bucket, batch_format="pandas")
    return knn_bruteforce(candidates, q, k, id_col=id_col, vec_col=vec_col)


IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_TRAIN_SAMPLE = 2048


def ivf_train_centroids(ds: "ray.data.Dataset", *,
                        n_centroids: int = IVF_CENTROIDS,
                        iters: int = 5, sample: int = IVF_TRAIN_SAMPLE,
                        seed: int = 42, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        source_path: Optional[str] = None) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a bounded,
    DETERMINISTIC sample (the rows with id < ``sample`` — stable across
    runs and partitionings, unlike take() order). Training is driver-side
    numpy on <= sample rows, the standard IVF recipe: the corpus never
    reaches the driver, only the tiny sample does.

    When ``source_path`` points at the parquet source, the ``id < sample``
    predicate is pushed into the read (row-group statistics skip ~all
    groups), so training reads a handful of row groups instead of scanning
    every embedding byte; the Dataset path is the fallback for non-parquet
    inputs. Same rows either way => identical centroids."""
    import pyarrow.compute as pc

    if source_path is not None:
        import pyarrow.parquet as pq
        lim = pq.read_table(source_path, columns=[id_col, vec_col],
                            filters=[(id_col, "<", sample)]).to_pylist()
    else:
        lim = ds.select_columns([id_col, vec_col]).map_batches(
            lambda t: t.filter(pc.less(t[id_col], sample)),
            batch_format="pyarrow").take_all()
    # take_all block order varies with read parallelism; sorting by id
    # makes the training set (and so the centroids) run-invariant
    lim.sort(key=lambda r: r[id_col])
    if not lim:
        raise ValueError(
            f"ivf_train_centroids found no rows with {id_col} < {sample}; "
            "the deterministic sampler assumes the id space starts near 0 "
            "— pass a larger `sample` or remap ids")
    X = _normalize(np.asarray([np.asarray(r[vec_col], dtype=np.float64)
                               for r in lim]))
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)),
                         replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cents.T, axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_ann(ds: "ray.data.Dataset", query: np.ndarray, k: int = 10, *,
            nprobe: int = IVF_NPROBE, n_centroids: int = IVF_CENTROIDS,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42, centroids: Optional[np.ndarray] = None,
            sample: int = IVF_TRAIN_SAMPLE,
            source_path: Optional[str] = None) -> "ray.data.Dataset":
    """IVF approximate top-k — the inverted-file scale path next to
    ``lsh_ann``: assign rows to their nearest spherical-kmeans centroid
    inside ``map_batches`` (centroid matrix broadcast once via ray.put,
    read zero-copy per batch), keep only rows in the query's ``nprobe``
    nearest cells, exact cosine among those. Touches ~nprobe/n_centroids
    of the data; recall grows with nprobe."""
    cents = centroids if centroids is not None else ivf_train_centroids(
        ds, n_centroids=n_centroids, seed=seed, id_col=id_col,
        vec_col=vec_col, sample=sample, source_path=source_path)
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    probe_set = np.sort(np.argsort(-(q @ cents.T)[0], kind="stable")[:nprobe])
    cents_ref = ray.put(cents)

    def _in_cells(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        assign = np.argmax(m @ c.T, axis=1)
        return batch.loc[np.isin(assign, probe_set)]

    candidates = ds.select_columns([id_col, vec_col]).map_batches(
        _in_cells, batch_format="pandas")
    return knn_bruteforce(candidates, q[0], k, id_col=id_col, vec_col=vec_col)


def cosine_neardup_pairs_lsh(ds: "ray.data.Dataset", *,
                             threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             bits: int = 8, seed: int = 42,
                             max_width: int = 200,
                             dim: Optional[int] = None) -> "ray.data.Dataset":
    """Embedding near-dup for UNLABELED corpora: the blocking key is the
    hyperplane-LSH bucket (computed row-locally) instead of a metadata
    label — vectors with cosine >= threshold usually share the bucket at
    small ``bits``. Same tiled exact pair scan within blocks.
    Approximation note (documented trade): a pair split across buckets is
    missed; lower ``bits`` or union over several plane seeds to raise
    recall at quadratic-in-block-width cost."""
    from ..stages.skewtools import tiled_pair_groups

    def _bucketed(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col, vec_col]].copy()
        if not len(batch):
            out["lsh_block"] = pd.Series([], dtype="int64")
            return out
        m = _as_matrix(batch[vec_col])
        planes = _plane_matrix(dim or m.shape[1], bits, seed)
        out["lsh_block"] = lsh_bucket_of(m, planes)
        return out

    blocked = ds.select_columns([id_col, vec_col]).map_batches(
        _bucketed, batch_format="pandas")
    return tiled_pair_groups(
        blocked, block_col="lsh_block", id_col=id_col,
        pair_fn=lambda g: _cosine_tile_pairs(g, threshold, id_col, vec_col),
        max_width=max_width)


_EMPTY_COSINE_PAIRS = pd.DataFrame({
    "id_a": pd.Series([], dtype="int64"),
    "id_b": pd.Series([], dtype="int64"),
    "cos_sim": pd.Series([], dtype="float64"),
})


def _cosine_tile_pairs(g: pd.DataFrame, threshold: float, id_col: str,
                       vec_col: str) -> pd.DataFrame:
    """Vectorized pairwise cosine within one tile (skewtools
    .tiled_pair_groups contract: _ti == _tj => diagonal tile, i<j pairs;
    _ti < _tj => cross pairs only). Exact — tiles partition the pair
    space, so output matches the untiled per-block matmul. Diagonal is
    decided from the tile coordinates carried in every row, not from an
    empty side-1 (a hash-imbalanced cross tile can legitimately have an
    empty side and must emit nothing)."""
    left = g[g["_side"] == 0].sort_values(id_col)
    right = g[g["_side"] == 1].sort_values(id_col)
    if len(g) and int(g["_ti"].iloc[0]) == int(g["_tj"].iloc[0]):
        if len(left) < 2:
            return _EMPTY_COSINE_PAIRS
        ids = left[id_col].to_numpy().astype("int64")
        m = _normalize(_as_matrix(left[vec_col]))
        sims = m @ m.T
        ai, bi = np.where(np.triu(sims, k=1) >= threshold)
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi],
                             "cos_sim": np.round(sims[ai, bi], 6)})
    if len(left) == 0 or len(right) == 0:
        return _EMPTY_COSINE_PAIRS
    lids = left[id_col].to_numpy().astype("int64")
    rids = right[id_col].to_numpy().astype("int64")
    sims = _normalize(_as_matrix(left[vec_col])) @ \
        _normalize(_as_matrix(right[vec_col])).T
    ai, bi = np.where(sims >= threshold)
    if not len(ai):
        return _EMPTY_COSINE_PAIRS
    a, b = lids[ai], rids[bi]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pd.DataFrame({"id_a": lo, "id_b": hi,
                         "cos_sim": np.round(sims[ai, bi], 6)})


def cosine_neardup_pairs(ds: "ray.data.Dataset", *, block_col: str = "label",
                         threshold: float = 0.95, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_width: int = 200) -> "ray.data.Dataset":
    """Embedding near-dup pairs (cos >= threshold) within a blocking key.
    At scale the block comes from LSH buckets; blocking bounds the O(n^2),
    and blocks wider than ``max_width`` are tiled into bounded sub-block
    pair tasks (exact output — one hot label can no longer serialize the
    stage in a single O(k^2) matmul)."""
    from ..stages.skewtools import tiled_pair_groups

    slim = ds.select_columns([block_col, id_col, vec_col])
    return tiled_pair_groups(
        slim, block_col=block_col, id_col=id_col,
        pair_fn=lambda g: _cosine_tile_pairs(g, threshold, id_col, vec_col),
        max_width=max_width)
