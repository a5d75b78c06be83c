"""Reference-shaped API facade tests."""

import pytest

from jsonschema_rs_spark.api import ValidationError, validate, validator_for
from jsonschema_rs_spark.sources.spans import SPAN_TABLE_SCHEMA


def _df(spark, rows):
    return spark.createDataFrame(rows, SPAN_TABLE_SCHEMA)


SPEC = {"properties": {"spans": {"items": {"properties": {
    "kind": {"enum": ["text", "image"]}}}}}}


def test_validate_raises_with_message(spark):
    bad = _df(spark, [{"doc_id": "d1", "spans": [
        {"kind": "zzz", "text": None, "media_ref": None, "offset": 0}],
        "part_key": 0}])
    with pytest.raises(ValidationError, match="violates enum"):
        validate(SPEC, bad)


def test_validate_passes_silently(spark):
    ok = _df(spark, [{"doc_id": "d1", "spans": [
        {"kind": "text", "text": "x", "media_ref": None, "offset": 0}],
        "part_key": 0}])
    validate(SPEC, ok)  # no raise


def test_validator_surfaces(spark):
    df = _df(spark, [
        {"doc_id": "d1", "spans": [
            {"kind": "zzz", "text": None, "media_ref": None, "offset": 0}],
         "part_key": 0},
        {"doc_id": "d2", "spans": [
            {"kind": "text", "text": "x", "media_ref": None, "offset": 0}],
         "part_key": 1},
    ])
    v = validator_for(SPEC, df.schema)
    verdicts = {r["doc_id"]: r["valid"] for r in v.is_valid(df).collect()}
    assert verdicts == {"d1": False, "d2": True}
    errs = v.iter_errors(df).collect()
    assert len(errs) == 1 and errs[0]["doc_id"] == "d1"
    assert "message" in errs[0].asDict()
    roll = {r["part_key"]: r["pass"] for r in
            v.apply_basic(df, "part_key").collect()}
    assert roll == {0: False, 1: True}
