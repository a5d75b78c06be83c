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
    with pytest.raises(ValidationError, match=r"is not one of"):
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


def test_reference_style_messages(spark):
    """iter_errors formats per-kind messages with the expected keyword value
    (reference jsonschema-py/src/lib.rs:223-261 phrasing)."""
    from jsonschema_rs_spark.api import validator_for

    bad = _df(spark, [{"doc_id": "zz", "spans": [
        {"kind": "zzz", "text": "ab", "media_ref": None, "offset": -3}],
        "part_key": 0}])
    spec = {
        "required": ["doc_id"],
        "properties": {
            "doc_id": {"minLength": 4},
            "spans": {"items": {"properties": {
                "kind": {"enum": ["text", "image"]},
                "text": {"minLength": 3},
                "offset": {"minimum": 0, "multipleOf": 8},
            }}},
        },
    }
    v = validator_for(spec, bad.schema)
    msgs = {r["constraint_id"]: r["message"]
            for r in v.iter_errors(bad).collect()}
    assert msgs["doc_id/minLength"] == '"zz" is shorter than 4 characters'
    assert msgs["spans/items/kind/enum"] == (
        'zzz is not one of ["text","image"] at span 0')
    assert msgs["spans/items/text/minLength"] == (
        '"ab" is shorter than 3 characters at span 0')
    assert msgs["spans/items/offset/minimum"] == (
        "-3 is less than the minimum of 0 at span 0")
    assert msgs["spans/items/offset/multipleOf"] == (
        "-3 is not a multiple of 8 at span 0")


def test_required_message_is_static(spark):
    from jsonschema_rs_spark.api import validator_for

    from pyspark.sql.types import StringType, StructField, StructType

    sch = StructType([StructField("doc_id", StringType(), True),
                      StructField("name", StringType(), True)])
    bad = spark.createDataFrame([("d1", None)], sch)
    v = validator_for({"required": ["name"]}, bad.schema)
    rows = v.iter_errors(bad).collect()
    assert rows[0]["message"] == '"name" is a required property'


def test_draft_namespaces(spark):
    """Per-draft shortcut namespaces (reference lib.rs:595-760
    jsonschema::draft4::{new,is_valid,options}) pin the dialect."""
    from jsonschema_rs_spark.api import draft4, draft7

    df = spark.createDataFrame([("d1", 1.0)], "doc_id string, ratio double")
    schema = {"properties": {"ratio": {"type": "integer"}}}
    # draft 4: 1.0 is NOT an integer; draft 7: it is
    got4 = draft4.is_valid(schema, df).collect()[0]["valid"]
    got7 = draft7.is_valid(schema, df).collect()[0]["valid"]
    assert got4 is False and got7 is True, (got4, got7)
    assert draft4.options().draft == 4
    v = draft7.new(schema, df.schema)
    assert v.is_valid(df).collect()[0]["valid"] is True
