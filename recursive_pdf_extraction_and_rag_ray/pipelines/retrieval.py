"""Retrieval over the built index: metadata filter + vector top-k.

Reference analogs: Chroma metadata-filter lookup
(/root/reference/src/services/QuestionGen/question_rag.py:130-194) and
per-collection knn + global merge-sort top-k
(/root/reference/src/utils/course_outline/rag_py.py:266-291).

The index is the hive-partitioned parquet written by ``run_index_stage``
(bucketed: one directory per ``gk_bucket = hash(group_key) % 32``, with
``group_key`` kept as a column). Partition pruning happens at the read: a
keyed lookup computes the key's bucket, reads only that directory, then
filters the exact key — 1/32 of the index touched instead of all of it,
with file fan-out bounded independent of key cardinality.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.embed import hash_embed_texts
from ..stages.similarity import knn_bruteforce


def read_index(index_dir: str,
               group_keys: Optional[List[str]] = None) -> "ray.data.Dataset":
    """Read index shards; group_keys prunes to their bucket dirs at the
    source, then filters the exact keys."""
    if group_keys:
        from ..pipelines.extract_pipeline import group_key_bucket
        import glob
        buckets = sorted({group_key_bucket(g) for g in group_keys})
        files: List[str] = []
        for b in buckets:
            files.extend(sorted(glob.glob(
                f"{index_dir}/gk_bucket={b}/*.parquet")))
        ds = ray.data.read_parquet(files)
        keys = set(group_keys)
        return ds.map_batches(
            lambda t: t.filter(pc.is_in(t["group_key"],
                                        value_set=pa.array(sorted(keys)))),
            batch_format="pyarrow")
    return ray.data.read_parquet(index_dir)


def filter_index(index_dir: str, *, lang: Optional[str] = None,
                 host: Optional[str] = None,
                 group_keys: Optional[List[str]] = None,
                 limit: Optional[int] = None) -> "ray.data.Dataset":
    """Metadata-filter lookup (question_rag.py:130-194 analog)."""
    ds = read_index(index_dir, group_keys)

    def pred(t):
        mask = None
        for col, val in (("lang", lang), ("host", host)):
            if val is not None:
                m = pc.equal(t[col], val)
                mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask) if mask is not None else t

    ds = ds.map_batches(pred, batch_format="pyarrow")
    return ds.limit(limit) if limit else ds


def filtered_query_index(index_dir: str, query_text: str, k: int = 5, *,
                         lang: Optional[str] = None,
                         host: Optional[str] = None,
                         group_keys: Optional[List[str]] = None) \
        -> "ray.data.Dataset":
    """The reference's combined retrieval (question_rag.py:130-194: a
    metadata ``where`` filter THEN accumulate-to-limit similarity) as one
    composed plan: partition-pruned read -> vectorized metadata filter ->
    brute-force cosine top-k with id tiebreak. The filter runs before any
    similarity work, so only surviving rows are scored."""
    qvec = hash_embed_texts([query_text])[0].astype(np.float64)
    ds = filter_index(index_dir, lang=lang, host=host, group_keys=group_keys)
    return knn_bruteforce(ds, qvec, k, id_col="id", vec_col="embedding")


def query_index(index_dir: str, query_text: str, k: int = 5, *,
                group_keys: Optional[List[str]] = None) -> "ray.data.Dataset":
    """Vector top-k over the index: embed the query with the same embedder
    that built the index, brute-force cosine, global top-k
    (rag_py.py:266-291 analog, one Dataset plan instead of a per-collection
    loop + Python merge-sort)."""
    qvec = hash_embed_texts([query_text])[0].astype(np.float64)
    ds = read_index(index_dir, group_keys)
    return knn_bruteforce(ds, qvec, k, id_col="id", vec_col="embedding")
