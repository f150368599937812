"""Skew-safe extraction: exploding giant layout docs into bounded segments
and reassembling per url must be byte-identical to the whole-doc parse
(under the documented uniform-furniture assumption)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from recursive_pdf_extraction_and_rag_ray.functions.extract_doc import extract_document
from recursive_pdf_extraction_and_rag_ray.functions.layout import is_layout_payload
from recursive_pdf_extraction_and_rag_ray.stages.skewtools import (
    extract_with_giant_split,
    split_layout_payload,
)


@pytest.fixture(scope="module")
def pages_table(tiny_corpus):
    _, paths = tiny_corpus
    return pa.concat_tables([pq.read_table(p) for p in paths])


def test_split_preserves_pages_and_balances(pages_table):
    giants = [h for h in pages_table.column("html").to_pylist()
              if h and is_layout_payload(h) and h.count(b"PAGE 612") > 50]
    assert giants, "corpus must contain giant layout docs"
    for payload in giants:
        segs = split_layout_payload(payload, 50)
        assert len(segs) > 1
        total = sum(s.count(b"\nPAGE ") + s.count(b"PAGE 612 792\n") > 0 and
                    s.count(b"PAGE 612") for s in segs)
        assert total == payload.count(b"PAGE 612")
        assert min(s.count(b"PAGE 612") for s in segs) >= 2


def test_exploded_extraction_matches_whole_doc(pages_table):
    expected = {}
    for row in pages_table.to_pylist():
        tx, method, _ = extract_document(row["text"] or "", row["html"] or b"")
        expected[row["url"]] = (tx, method)

    ds = ray.data.from_arrow(pages_table)
    out = extract_with_giant_split(ds, max_pages=50, concurrency=(1, 3))
    got = out.to_pandas()
    assert len(got) == len(expected)
    for _, r in got.iterrows():
        exp_text, exp_method = expected[r["url"]]
        assert r["text_extracted"] == exp_text, r["url"]   # byte-identical
        assert r["method"] == exp_method, r["url"]


def test_sparse_segment_contributes_to_reassembly():
    """ADVICE round 1: the eff>=50 accept gate is a WHOLE-document rule. A
    giant doc's sparse segment (<50 effective chars on its own) must still
    contribute its lines to the reassembled text, byte-identical to the
    whole-doc parse."""
    def mk(pages_lines):
        out = ["%RPX-LAYOUT 1"]
        for pno, lines in enumerate(pages_lines):
            out.append("PAGE 612 792")
            out.append("72 30 CONFIDENTIAL DRAFT")
            for k, ln in enumerate(lines):
                out.append(f"72 {100 + k * 16} {ln}")
            out.append(f"280 770 - {pno + 1} -")
        return "\n".join(out).encode()

    rich = [f"alpha bravo charlie delta echo {i}" for i in range(20)]
    payload = mk([rich] * 4 + [["tiny"], ["dot"]])
    whole, method, _ = extract_document("", payload)
    assert method == "parsed" and "tiny" in whole and "dot" in whole

    table = pa.table({
        "url": pa.array(["u"], pa.string()),
        "text": pa.array([""], pa.string()),
        "html": pa.array([payload], pa.large_binary()),
        "lang": pa.array(["en"], pa.string()),
    })
    out = extract_with_giant_split(ray.data.from_arrow(table),
                                   max_pages=2).to_pandas()
    assert out.loc[0, "text_extracted"] == whole  # byte-identical
    assert out.loc[0, "method"] == "parsed"


def test_giants_actually_fan_out(pages_table):
    from recursive_pdf_extraction_and_rag_ray.stages.skewtools import (
        explode_giants_batch,
    )
    segs = explode_giants_batch(pages_table, max_pages=50)
    n_segs = segs.column("n_segs").to_pylist()
    assert max(n_segs) > 1                 # giants split
    assert min(n_segs) == 1                # normal docs untouched


def test_flagship_giant_split_identical(ray_session, tmp_path):
    """The flagship extract stage with giant routing ON (default) must
    write byte-identical docs — text, spans, hashes, counts — to the
    whole-doc path, with the transient spill dir cleaned up."""
    import os

    import pandas as pd
    import pyarrow.dataset as pads

    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        run_extract_stage,
    )
    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
        synthesize_corpus,
    )

    outs = {}
    for gs in (False, True):
        root = str(tmp_path / f"gs_{gs}")
        synthesize_corpus(f"{root}/pages", n_docs=300, n_shards=3)
        run_extract_stage(f"{root}/pages", f"{root}/out", concurrency=3,
                          giant_split=gs)
        df = pads.dataset(f"{root}/out/docs", partitioning="hive") \
            .to_table().to_pandas()
        df["spans"] = df["spans"].map(lambda s: str(list(s)))
        outs[gs] = df.astype({"shard": str})[sorted(df.columns)] \
            .sort_values("url").reset_index(drop=True)
        assert not os.path.isdir(f"{root}/out/_segments")
    assert (outs[True]["n_blocks"] > 50).any()  # a giant actually split
    pd.testing.assert_frame_equal(outs[False], outs[True])
