"""keep_latest argmax, duplicate_ngrams inventory, bloom incremental
dedup — including a forced-false-positive bloom proving the exact
verification path."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.stages import corpusfilters as cf
from recursive_pdf_extraction_and_rag_ray.stages import dedup, temporal


def test_keep_latest_argmax_with_ties():
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([10, 30, 30, 5, 7, 1], unit="s"),
        "tb": [1, 2, 3, 9, 8, 0],
        "v": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]})
    # many tiny blocks exercise the per-batch partial + final reduce
    ds = ray.data.from_pandas([df.iloc[[i]] for i in range(len(df))])
    out = temporal.keep_latest(ds, key="k", ts="ts", order_tiebreak="tb",
                               carry=["v"]).to_pandas()
    got = out.sort_values("k").reset_index(drop=True)
    # k=1: ts tie at 30 -> highest tb (3) wins; k=2: ts=7 wins over tb
    assert list(got["k"]) == [1, 2, 3]
    assert list(got["tb"]) == [3, 8, 0]
    assert list(got["v"]) == [30.0, 50.0, 60.0]


def test_duplicate_ngrams_counts():
    texts = ["a b c d e f",          # grams: 'a b c d e', 'b c d e f'
             "x a b c d e y",        # contains 'a b c d e'
             "a b c d e",            # contains 'a b c d e'
             "short one"]            # no 5-gram
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(4, dtype="int64"), "text": texts}))
    out = cf.duplicate_ngrams(ds).to_pandas()
    assert set(out["gram"]) == {"a b c d e"}
    row = out.iloc[0]
    assert row["n_docs"] == 3 and row["n_occ"] == 3


def test_duplicate_ngrams_intra_doc_occurrences():
    # the same gram twice in ONE doc counts 2 occurrences but 1 doc —
    # and needs a second doc to enter the inventory
    texts = ["p q r s t u p q r s t", "p q r s t"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(2, dtype="int64"), "text": texts}))
    out = cf.duplicate_ngrams(ds).to_pandas().set_index("gram")
    assert out.loc["p q r s t", "n_docs"] == 2
    assert out.loc["p q r s t", "n_occ"] == 3


def _docs(texts, start=0):
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(start, start + len(texts), dtype="int64"),
         "text": texts}))


def test_incremental_dedup_exact_result():
    old = _docs(["alpha", "beta", "gamma"])
    new = _docs(["beta", "delta", "alpha", "epsilon"], start=10)
    out = dedup.incremental_dedup_bloom(new, old).to_pandas()
    assert sorted(out["doc_id"]) == [11, 13]


def test_incremental_dedup_tiny_bloom_false_positives_verified():
    # bits=8 forces massive bloom false positives; the exact anti-join
    # must still produce the exact survivor set
    old = _docs([f"old-{i}" for i in range(50)])
    new = _docs([f"new-{i}" for i in range(50)] + ["old-7", "old-33"],
                start=100)
    out = dedup.incremental_dedup_bloom(new, old, bits=8, k=2).to_pandas()
    assert sorted(out["doc_id"]) == list(range(100, 150))
    # same survivors through the forced DISTRIBUTED verify leg
    out2 = dedup.incremental_dedup_bloom(
        new, old, bits=8, k=2, broadcast_old_keys=False).to_pandas()
    assert sorted(out2["doc_id"]) == list(range(100, 150))


def test_bloom_no_false_negatives():
    docs = _docs([f"t{i}" for i in range(200)])
    bm = dedup.bloom_from_docs(docs, bits=1 << 12, k=4)
    from recursive_pdf_extraction_and_rag_ray.stages.textstats import (
        fingerprint_batch,
    )
    fp = fingerprint_batch(pd.DataFrame(
        {"doc_id": np.arange(200), "text": [f"t{i}" for i in range(200)]}))
    pos = dedup._bloom_positions(fp["fp"].to_numpy(), 1 << 12, 4)
    assert bm[pos].all()


def test_anti_join_string_key():
    left = ray.data.from_pandas(pd.DataFrame(
        {"k": ["aa", "bb", "cc", "dd"], "v": [1, 2, 3, 4]}))
    right = ray.data.from_pandas(pd.DataFrame({"k": ["bb", "dd", "zz"]}))
    from recursive_pdf_extraction_and_rag_ray.stages import joins
    anti = joins.anti_join(left, right, on="k").to_pandas()
    assert sorted(anti["k"]) == ["aa", "cc"]
    semi = joins.semi_join(left, right, on="k").to_pandas()
    assert sorted(semi["k"]) == ["bb", "dd"]


def test_snapshot_diff_classifies_all_four_statuses():
    import numpy as np
    import pandas as pd
    import ray
    from recursive_pdf_extraction_and_rag_ray.stages.dedup import snapshot_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["a", "b", "c", "d"]})
    new = pd.DataFrame({"doc_id": [2, 3, 4, 9],
                        "text": ["b", "c CHANGED", "d", "new"]})
    out = snapshot_diff(ray.data.from_pandas(old).repartition(2),
                        ray.data.from_pandas(new).repartition(3)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 9: "added"}
    assert len(out) == 5
