"""Char-entropy signal and grouping-sets rollup consistency."""

import math

import numpy as np
import pandas as pd

from recursive_pdf_extraction_and_rag_ray.stages.textstats import (
    char_entropy_batch,
)


def test_char_entropy_hand_values():
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": ["aaaa", "ab", "", "aab"]})
    out = char_entropy_batch(df)
    assert out["entropy"].iloc[0] == 0.0           # single symbol
    assert out["entropy"].iloc[1] == round(math.log(2), 6)
    assert out["entropy"].iloc[2] == 0.0           # empty
    p = np.array([2 / 3, 1 / 3])
    assert out["entropy"].iloc[3] == round(float(-(p * np.log(p)).sum()), 6)


def test_char_entropy_unicode_codepoints():
    # utf-32 reinterpretation must count CODEPOINTS, not bytes
    df = pd.DataFrame({"doc_id": [0], "text": ["éé"]})
    out = char_entropy_batch(df)
    assert out["entropy"].iloc[0] == 0.0  # one distinct codepoint


def test_events_rollup_levels_consistent(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from recursive_pdf_extraction_and_rag_ray.pipelines.queries import (
        q_events_rollup,
    )
    df = pd.DataFrame({
        "ts": pd.to_datetime([3600, 3601, 7200, 7200, 10], unit="s"),
        "event_type": ["a", "a", "a", "b", "b"],
        "value": [1.5, 2.5, 3.0, 4.0, 0.25]})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(df), sf / "events.parquet")
    out = q_events_rollup(str(sf))
    total = out[(out.event_type == "ALL")]
    assert int(total["n_events"].iloc[0]) == 5
    assert int(total["sum_value_e4"].iloc[0]) == 112500
    at = out[(out.event_type == "a") & (out.hour == -1)]
    assert int(at["n_events"].iloc[0]) == 3
    cell = out[(out.event_type == "a") & (out.hour == 1)]
    assert int(cell["n_events"].iloc[0]) == 2
    # every level sums to the same grand total
    fine = out[(out.hour != -1)]
    assert fine["n_events"].sum() == 5
    subt = out[(out.hour == -1) & (out.event_type != "ALL")]
    assert subt["sum_value_e4"].sum() == 112500
