"""SemDeDup composition (stages/semdedup.py): planted paraphrase
duplicates are dropped keep-first, cluster assignment is the argmax
cosine, and the distributed component path yields the identical
survivor set."""

import numpy as np
import pandas as pd
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import semdedup


def _corpus(n=300, dim=32, n_dups=10, seed=7):
    """Random unit vectors; ids 100..100+n_dups-1 are near-copies of
    ids 0..n_dups-1 (cos > 0.99); every other pair is far below any
    dedup threshold (random 32-d cosines concentrate near 0)."""
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    for i in range(n_dups):
        m[100 + i] = m[i] + rng.normal(scale=0.01, size=dim)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in m],
    })).repartition(4)


def test_assign_clusters_is_argmax_cosine(ray_session):
    ds = _corpus(50, n_dups=0)
    cents = np.eye(4, 32)
    out = semdedup.assign_clusters(ds, cents).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in out["embedding"]])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    expect = np.argmax(m @ cents.T, axis=1)
    assert (out["sem_cluster"].to_numpy() == expect).all()


def test_semantic_dedup_drops_planted_copies(ray_session):
    ds = _corpus()
    pairs = semdedup.semantic_neardup_pairs(ds, threshold=0.95) \
        .to_pandas().sort_values("doc_a").reset_index(drop=True)
    assert pairs["doc_a"].tolist() == list(range(10))
    assert pairs["doc_b"].tolist() == [100 + i for i in range(10)]
    surv = semdedup.semantic_dedup_keep_first(ds, threshold=0.95) \
        .to_pandas()["vec_id"].sort_values().tolist()
    assert surv == [i for i in range(300) if not 100 <= i < 110]


def test_semantic_dedup_distributed_matches_driver(ray_session):
    ds = _corpus(seed=8)
    a = semdedup.semantic_dedup_keep_first(ds, threshold=0.95) \
        .to_pandas()["vec_id"].sort_values().tolist()
    b = semdedup.semantic_dedup_keep_first(ds, threshold=0.95,
                                           distributed=True) \
        .to_pandas()["vec_id"].sort_values().tolist()
    assert a == b and len(a) == 290


def test_refined_centroids_keep_planted_dup_recall():
    import numpy as np
    import ray
    from recursive_pdf_extraction_and_rag_ray.stages import semdedup
    from recursive_pdf_extraction_and_rag_ray.stages.similarity import _normalize

    rng = np.random.RandomState(12)
    base = _normalize(rng.normal(size=(6, 16)))
    rows = []
    for i in range(120):
        v = base[i % 6] + 0.01 * rng.normal(size=16)
        rows.append({"vec_id": i, "embedding": v})
    # planted near-dup: 500 is a paraphrase of 0
    rows.append({"vec_id": 500,
                 "embedding": np.asarray(rows[0]["embedding"]) + 1e-4})
    ds = ray.data.from_items(rows)
    plain = semdedup.semantic_dedup_keep_first(
        ds, threshold=0.98, n_clusters=6, max_width=50).to_pandas()
    refined = semdedup.semantic_dedup_keep_first(
        ds, threshold=0.98, n_clusters=6, max_width=50,
        refine_iters=3).to_pandas()
    # the planted duplicate loses to id 0 in BOTH paths
    assert 500 not in set(plain["vec_id"])
    assert 500 not in set(refined["vec_id"])
    assert 0 in set(refined["vec_id"])
    # refinement never yields MORE survivors than sample-only centroids
    # on this fixture (tighter clusters find >= the same pairs)
    assert len(refined) <= len(plain)


def test_semantic_dedup_dist_partitions_exceed_losers(ray_session):
    """Same empty-block join hazard as neardup_dedup_dist (round-4 bug
    class): force partitions ≫ loser rows through the distributed
    anti-join and pin parity; and a dup-free corpus short-circuits to a
    full pass-through."""
    ds = _corpus(n=150, n_dups=2, seed=5)
    a = semdedup.semantic_dedup_keep_first(ds, threshold=0.95) \
        .to_pandas()["vec_id"].sort_values().tolist()
    b = semdedup.semantic_dedup_keep_first(
        ds, threshold=0.95, distributed=True, num_partitions=12) \
        .to_pandas()["vec_id"].sort_values().tolist()
    assert a == b and len(a) == 148  # the 2 planted copies dropped

    clean = _corpus(n=30, n_dups=0, seed=6)
    surv = semdedup.semantic_dedup_keep_first(
        clean, threshold=0.95, distributed=True, num_partitions=12) \
        .to_pandas()["vec_id"].sort_values().tolist()
    assert surv == list(range(30))
