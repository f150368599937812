"""Product quantization (stages/pq.py): exactness when vectors equal
codewords, recall on clustered data, encode invariance, code layout."""

import numpy as np
import pandas as pd
import pytest
import ray

from recursive_pdf_extraction_and_rag_ray.stages import pq, similarity
from recursive_pdf_extraction_and_rag_ray.stages.similarity import _normalize


def _clustered(n=300, dim=16, k_true=5, noise=0.02, seed=3):
    rng = np.random.RandomState(seed)
    cents = _normalize(rng.normal(size=(k_true, dim)))
    rows = []
    for i in range(n):
        v = cents[i % k_true] + noise * rng.normal(size=dim)
        rows.append({"vec_id": i, "embedding": v.astype(np.float64)})
    return rows


def test_codebook_shape_and_determinism():
    rows = _clustered()
    ds = ray.data.from_items(rows)
    b1 = pq.pq_train(ds, m=4, ksub=8, sample=300)
    b2 = pq.pq_train(ds.repartition(7), m=4, ksub=8, sample=300)
    assert b1.shape == (4, 8, 4)
    assert np.array_equal(b1, b2)  # sample is id-deterministic


def test_encode_partitioning_invariant():
    rows = _clustered()
    books = pq.pq_train(ray.data.from_items(rows), m=4, ksub=8, sample=300)
    outs = []
    for nparts in (2, 8):
        ds = ray.data.from_items(rows).repartition(nparts)
        df = pq.pq_encode(ds, books).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        outs.append(df)
    assert list(outs[0]["vec_id"]) == list(outs[1]["vec_id"])
    for a, b in zip(outs[0]["pq_code"], outs[1]["pq_code"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.asarray(a).dtype == np.uint8
        assert len(a) == 4


def test_adc_exact_when_vectors_are_codewords():
    # corpus rows drawn exactly from the codeword grid -> quantization
    # error is zero and ADC top-k == exact L2 (== cosine) top-k
    rng = np.random.RandomState(11)
    grid = _normalize(rng.normal(size=(8, 8)))  # 8 unit vectors, dim 8
    rows = [{"vec_id": i, "embedding": grid[i % 8]} for i in range(64)]
    ds = ray.data.from_items(rows)
    books = pq.pq_train(ds, m=2, ksub=8, sample=64)
    qvec = grid[0]
    got = pq.pq_ann(ds, qvec, k=8, codebooks=books,
                    exclude_ids=[0]).to_pandas()
    exact = similarity.knn_bruteforce(ds, qvec, 8,
                                      exclude_ids=[0]).to_pandas()
    assert set(got["vec_id"]) == set(exact["vec_id"])


def test_recall_on_clustered_corpus():
    rows = _clustered(n=400, dim=16, k_true=5)
    ds = ray.data.from_items(rows).repartition(4)
    qvec = np.asarray(rows[0]["embedding"])
    # fine codebooks (m=8, ksub=128) make quantization error small vs the
    # 0.02 intra-cluster noise, so fine-grained order survives ADC
    books = pq.pq_train(ds, m=8, ksub=128, sample=400)
    approx = pq.pq_ann(ds, qvec, k=10, codebooks=books,
                       exclude_ids=[0]).to_pandas()
    exact = similarity.knn_bruteforce(ds, qvec, 10,
                                      exclude_ids=[0]).to_pandas()
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.8
    # and with 5 well-separated clusters, ADC must keep the true cluster:
    # every approx hit shares cluster 0's residue class (i % 5 == 0)
    assert (approx["vec_id"] % 5 == 0).all()


def test_train_raises_on_empty_sample():
    rows = [{"vec_id": 10_000, "embedding": np.ones(8)}]
    with pytest.raises(ValueError, match="no rows"):
        pq.pq_train(ray.data.from_items(rows), m=2, ksub=4, sample=16)


def test_query_registered():
    import os
    sf_dir = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from recursive_pdf_extraction_and_rag_ray.pipelines import queries as qmod
    fn = qmod.queries()["pq_ann"]
    a = fn(sf_dir)
    a = a.to_pandas() if not isinstance(a, pd.DataFrame) else a
    assert list(a.columns) == ["vec_id", "adc_dist"]
    assert len(a) == 10
    assert 0 not in set(a["vec_id"])
