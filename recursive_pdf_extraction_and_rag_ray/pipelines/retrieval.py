"""Retrieval over the built index: metadata filter + vector top-k.

Reference analogs: Chroma metadata-filter lookup
(/root/reference/src/services/QuestionGen/question_rag.py:130-194) and
per-collection knn + global merge-sort top-k
(/root/reference/src/utils/course_outline/rag_py.py:266-291).

The index is the hive-partitioned parquet written by ``run_index_stage``
(one directory per group_key). Partition pruning happens at the read:
filtering on group_key never touches other groups' files.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow.compute as pc
import ray.data

from ..stages.embed import hash_embed_texts
from ..stages.similarity import knn_bruteforce


def read_index(index_dir: str,
               group_keys: Optional[List[str]] = None) -> "ray.data.Dataset":
    """Read index shards; group_keys prunes partitions at the source."""
    if group_keys:
        paths = [f"{index_dir}/group_key={g}" for g in group_keys]
        import glob
        files: List[str] = []
        for p in paths:
            files.extend(sorted(glob.glob(f"{p}/*.parquet")))
        return ray.data.read_parquet(files)
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


def query_index(index_dir: str, query_text: str, k: int = 5, *,
                group_keys: Optional[List[str]] = None) -> "ray.data.Dataset":
    """Vector top-k over the index: embed the query with the same embedder
    that built the index, brute-force cosine, global top-k
    (rag_py.py:266-291 analog, one Dataset plan instead of a per-collection
    loop + Python merge-sort)."""
    qvec = hash_embed_texts([query_text])[0].astype(np.float64)
    ds = read_index(index_dir, group_keys)
    return knn_bruteforce(ds, qvec, k, id_col="id", vec_col="embedding")
