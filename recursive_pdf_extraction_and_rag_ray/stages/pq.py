"""Product quantization (PQ) — the memory-scale leg of the ANN family
(Jegou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI — public method).

``lsh_ann`` and ``ivf_ann`` cut the *rows touched*; PQ cuts the *bytes
per row*: a dim-d float32 vector (256 B at d=64) becomes ``m`` uint8
codes (8 B), so a 100 TB embedding corpus's code table fits in the
object store and a scan of it is ~32x less I/O. Pipeline:

- ``pq_train``: per-subspace k-means codebooks trained driver-side on
  the SAME bounded deterministic sample as IVF (rows with id <
  ``sample``; parquet predicate pushdown via ``source_path``). The
  corpus never reaches the driver, only the sample.
- ``pq_encode``: distributed — codebooks broadcast once (``ray.put``),
  each batch argmins every subvector against its codebook in one
  einsum-free matmul per subspace and emits uint8 code lists. Row-local,
  no shuffle; the natural persisted artifact next to the raw vectors.
- ``pq_ann``: asymmetric distance computation (ADC) — the query is NOT
  quantized; a (m x ksub) lookup table of exact query-subvector ->
  codeword squared distances is built on the driver and broadcast, each
  batch's approximate distance is m uint8-indexed LUT gathers + a sum,
  partial top-k per batch, tiny global sort+limit (same merge shape as
  ``knn_bruteforce``).

Vectors are L2-normalized before encoding, so ADC L2 order equals
cosine order (||a-b||^2 = 2 - 2cos on the unit sphere) and results are
comparable with the rest of the similarity family.

Reference parity note: the reference queries a Chroma HNSW index
(src/utils/course_outline/rag_py.py); PQ is the published
compressed-domain alternative a 100 TB corpus needs when raw vectors
outgrow worker memory.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import pandas as pd

import ray

from .similarity import IVF_TRAIN_SAMPLE, _as_matrix, _normalize

PQ_M = 8           # subspaces
PQ_KSUB = 16       # codewords per subspace (uint8 budget allows <= 256)


def _lloyd_np(X: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain Euclidean Lloyd on the (tiny) training sample."""
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        d = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)
        assign = np.argmin(d, axis=1)
        for c in range(len(cents)):
            m = X[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def pq_train(ds: "ray.data.Dataset", *, m: int = PQ_M, ksub: int = PQ_KSUB,
             iters: int = 10, sample: int = IVF_TRAIN_SAMPLE,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding",
             source_path: Optional[str] = None) -> np.ndarray:
    """(m, ksub, dsub) codebooks from the bounded deterministic sample
    (rows with id < ``sample``; the predicate is pushed into the parquet
    read when ``source_path`` is given, same recipe as
    ``ivf_train_centroids`` — which returns centroids, not raw rows, so
    the bounded read is repeated here rather than reused)."""
    import pyarrow.compute as pc

    if source_path is not None:
        import pyarrow.parquet as pq_
        lim = pq_.read_table(source_path, columns=[id_col, vec_col],
                             filters=[(id_col, "<", sample)]).to_pylist()
    else:
        lim = ds.select_columns([id_col, vec_col]).map_batches(
            lambda t: t.filter(pc.less(t[id_col], sample)),
            batch_format="pyarrow").take_all()
    lim.sort(key=lambda r: r[id_col])
    if not lim:
        raise ValueError(
            f"pq_train found no rows with {id_col} < {sample}; the "
            "deterministic sampler assumes the id space starts near 0")
    X = _normalize(np.asarray([np.asarray(r[vec_col], dtype=np.float64)
                               for r in lim]))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = np.ascontiguousarray(X[:, j * dsub:(j + 1) * dsub])
        cents = _lloyd_np(sub, ksub, iters, seed + j)
        if len(cents) < ksub:  # fewer sample rows than codewords
            pad = np.repeat(cents[:1], ksub - len(cents), axis=0)
            cents = np.vstack([cents, pad])
        books[j] = cents
    return books


def _encode_batch(df: pd.DataFrame, book_ref, id_col: str,
                  vec_col: str) -> pd.DataFrame:
    books = ray.get(book_ref)
    m, ksub, dsub = books.shape
    if not len(df):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "pq_code": pd.Series([], dtype="object")})
    X = _normalize(_as_matrix(df[vec_col]))
    codes = np.empty((len(X), m), dtype=np.uint8)
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        d = -2.0 * (sub @ books[j].T) + (books[j] * books[j]).sum(axis=1)
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return pd.DataFrame({id_col: df[id_col].to_numpy().astype("int64"),
                         "pq_code": list(codes)})


def pq_encode(ds: "ray.data.Dataset", codebooks: np.ndarray, *,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> "ray.data.Dataset":
    """(id, pq_code uint8[m]) — codebooks ray.put once, one matmul per
    subspace per batch, row-local."""
    ref = ray.put(np.ascontiguousarray(codebooks, dtype=np.float64))
    return ds.select_columns([id_col, vec_col]).map_batches(
        functools.partial(_encode_batch, book_ref=ref, id_col=id_col,
                          vec_col=vec_col),
        batch_format="pandas")


class _AdcTopK:
    """Per-batch partial top-k over PQ codes against a broadcast ADC LUT."""

    def __init__(self, lut_ref, k: int, id_col: str, exclude_ids):
        self.lut = ray.get(lut_ref)          # (m, ksub) float64
        self.k = k
        self.id_col = id_col
        self.exclude = np.asarray(sorted(exclude_ids or []), dtype=np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({self.id_col: pd.Series([], dtype="int64"),
                                 "adc_dist": pd.Series([], dtype="float64")})
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        codes = np.stack([np.asarray(c, dtype=np.uint8)
                          for c in batch["pq_code"]])
        m = codes.shape[1]
        dist = self.lut[np.arange(m), codes].sum(axis=1)
        keep = ~np.isin(ids, self.exclude)
        ids, dist = ids[keep], dist[keep]
        # same selection order as the global sort: 6-dp dist asc, id asc
        key = np.lexsort((ids, np.round(dist, 6)))[:self.k]
        return pd.DataFrame({self.id_col: ids[key],
                             "adc_dist": np.round(dist[key], 6)})


def pq_ann(ds: "ray.data.Dataset", query: np.ndarray, k: int = 10, *,
           codebooks: Optional[np.ndarray] = None, m: int = PQ_M,
           ksub: int = PQ_KSUB, id_col: str = "vec_id",
           vec_col: str = "embedding", seed: int = 42,
           sample: int = IVF_TRAIN_SAMPLE,
           source_path: Optional[str] = None,
           exclude_ids=None) -> "ray.data.Dataset":
    """Approximate top-k by ADC over PQ codes. ``codebooks`` from a prior
    ``pq_train`` skips retraining (the production shape: train once,
    encode once, query many)."""
    books = codebooks if codebooks is not None else pq_train(
        ds, m=m, ksub=ksub, seed=seed, id_col=id_col, vec_col=vec_col,
        sample=sample, source_path=source_path)
    mm, ksub_, dsub = books.shape
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    lut = np.empty((mm, ksub_), dtype=np.float64)
    for j in range(mm):
        diff = books[j] - q[j * dsub:(j + 1) * dsub]
        lut[j] = (diff * diff).sum(axis=1)
    lref = ray.put(lut)

    codes = pq_encode(ds, books, id_col=id_col, vec_col=vec_col)
    partials = codes.map_batches(
        _AdcTopK(lref, k, id_col, exclude_ids), batch_format="pandas")
    return partials.sort(["adc_dist", id_col]).limit(k)
