"""JSON balanced-extract / truncation-repair (reference
gemini_service.py:283-443 fallback chain), pinned case by case."""

import pandas as pd
import pytest

from recursive_pdf_extraction_and_rag_ray.functions.jsonrepair import (
    extract_balanced_json,
    loads_relaxed,
    parse_json_batch,
    repair_truncated_json,
    strip_code_fences,
)


def test_fence_stripping():
    assert strip_code_fences('```json\n{"a": 1}\n```') == '{"a": 1}'
    assert strip_code_fences('  {"a": 1}  ') == '{"a": 1}'
    assert strip_code_fences("```json{}```") == "{}"


def test_direct_parse():
    obj, status = loads_relaxed('{"a": 1, "b": [2, 3]}')
    assert status == "direct" and obj == {"a": 1, "b": [2, 3]}
    obj, status = loads_relaxed('```json\n[1, 2]\n```')
    assert status == "direct" and obj == [1, 2]


def test_balanced_extraction():
    s = 'Sure! Here is the JSON: {"q": "what?", "n": 2} hope that helps'
    assert extract_balanced_json(s) == '{"q": "what?", "n": 2}'
    obj, status = loads_relaxed(s)
    assert status == "balanced" and obj == {"q": "what?", "n": 2}
    # braces inside strings must not affect depth
    s2 = 'x {"t": "a } b {", "u": 1} y'
    obj, _ = loads_relaxed(s2)
    assert obj == {"t": "a } b {", "u": 1}
    # escaped quote inside string
    s3 = 'pre {"t": "say \\" ok", "n": 5} post'
    obj, _ = loads_relaxed(s3)
    assert obj == {"t": 'say " ok', "n": 5}


def test_truncation_repair():
    # cut mid-list: close bracket + brace
    obj, status = loads_relaxed('{"a": [1, 2')
    assert status == "repaired" and obj == {"a": [1, 2]}
    # cut mid-string: close quote + brace
    obj, status = loads_relaxed('{"a": "hel')
    assert status == "repaired" and obj == {"a": "hel"}
    assert repair_truncated_json("no opener") is None
    # the reference ignores a mismatched closer and appends ']}' — the
    # result '{"a": [1 }]}' still fails json.loads; chain ends failed
    assert loads_relaxed('{"a": [1 }')[1] == "failed"


def test_no_json_at_all():
    obj, status = loads_relaxed("completely plain text")
    assert obj is None and status == "failed"
    assert loads_relaxed("")[1] == "failed"


def test_parse_json_batch_vector():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "payload": ['{"a": 1}', '```json\n[1,2,3]\n```',
                    'noise {"k": "v"} noise', "nothing"],
    })
    out = parse_json_batch(df)
    assert list(out["status"]) == ["direct", "direct", "balanced", "failed"]
    assert list(out["n_keys"]) == [1, 3, 1, -1]
    assert "payload" not in out.columns


@pytest.mark.parametrize("mod,expect", [
    (0, "direct"), (1, "direct"), (3, "failed")])
def test_query_statuses(ray_session, mod, expect):
    import __ray_entry__ as entrymod

    df = entrymod.queries()["json_repair"]("/root/testdata/sf0.001")
    df = df.to_pandas() if hasattr(df, "to_pandas") else df
    sub = df[df["doc_id"] % 4 == mod]
    assert len(sub) > 0 and (sub["status"] == expect).all()
