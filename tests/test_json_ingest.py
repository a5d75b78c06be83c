"""Arbitrary-JSON ingestion (round 5): the variant lowering in
``json_ingest`` — the analogue of the reference accepting ANY parsed JSON
value (``validator.rs:29-33``) instead of a pre-typed table."""

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler import EngineOptions
from jsonschema_rs_spark.json_ingest import (JsonIngestUnsupported,
                                             json_valid_column,
                                             validate_json_strings)


def _valids(spark, schema, instances, draft=None):
    df = spark.createDataFrame(
        [(i, json.dumps(v)) for i, v in enumerate(instances)],
        "i int, js string")
    col = json_valid_column(F.col("js"), schema, EngineOptions(draft=draft))
    rows = df.select("i", col.alias("ok")).collect()
    return [bool(r["ok"]) for r in sorted(rows, key=lambda r: r["i"])]


def test_json_null_vs_absent_vs_wrong_type(spark):
    """The three-way distinction a typed table cannot make: JSON null is
    PRESENT (satisfies required, fails type:number), absent is neither."""
    schema = {"properties": {"a": {"type": "number"}}, "required": ["a"]}
    got = _valids(spark, schema, [{"a": 1.5}, {"a": None}, {}, {"a": "x"}])
    assert got == [True, False, False, False]


def test_json_heterogeneous_array(spark):
    schema = {"items": {"type": ["integer", "string"]}}
    got = _valids(spark, schema, [[1, "a", 2], [1, True], [1.5], []])
    assert got == [True, False, False, True]


def test_json_bigint_exact(spark):
    """Integers beyond 2^53 compare exactly (variant keeps the decimal)."""
    schema = {"maximum": 2 ** 54 - 1}
    got = _valids(spark, schema, [2 ** 54, 2 ** 54 - 1, 10])
    assert got == [False, True, True]


def test_json_draft4_integer_literal_form(spark):
    """Draft 4: 1.0 is NOT an integer (is_i64/is_u64,
    legacy/type_draft_4.rs:113-114); modern drafts accept it."""
    schema = {"type": "integer"}
    insts = [1, 1.0, 1.5, 2 ** 63 + 10]  # last: u64-range literal
    assert _valids(spark, schema, insts, draft=4) == \
        [True, False, False, True]
    assert _valids(spark, schema, insts, draft=7) == \
        [True, True, False, True]


def test_json_uniqueitems_json_equality(spark):
    """1 == 1.0, true != 1, object key order irrelevant — JSON equality,
    not Spark-type equality."""
    schema = {"uniqueItems": True}
    got = _valids(spark, schema, [
        [1, 1.0], [True, 1], [{"a": 1, "b": 2}, {"b": 2, "a": 1}],
        [[1], [1.0]], ["a|b", "a,b"],
    ])
    assert got == [False, True, False, False, True]


def test_json_structural_ref(spark):
    """$ref into schema structure (not just $defs) — the typed suite
    harness's R5 exclusion, native here."""
    schema = {
        "properties": {"a": {"minimum": 3},
                       "b": {"$ref": "#/properties/a"}},
    }
    got = _valids(spark, schema, [{"b": 5}, {"b": 1}])
    assert got == [True, False]


def test_json_violations_rows(spark):
    df = spark.createDataFrame(
        [("d1", '{"name": "ab", "n": 1.5}'),
         ("d2", '{"name": "x"}'),
         ("d3", 'not json at all'),
         ("d4", '{"name": "ok!", "n": 7}')],
        "doc_id string, js string")
    schema = {
        "properties": {"name": {"type": "string", "minLength": 2},
                       "n": {"type": "integer"}},
        "required": ["n"],
    }
    out = validate_json_strings(df, "js", schema)
    got = {(r["doc_id"], r["constraint_id"]): r["observed"]
           for r in out.collect()}
    assert got == {
        ("d1", "n/type"): "1.5",
        ("d2", "name/minLength"): "x",
        ("d2", "required/n"): "missing",
        ("d3", "json/parse"): "not json at all",
    }, got


def test_json_verdicts_mode(spark):
    df = spark.createDataFrame(
        [("a", '{"v": 1}'), ("b", '{"v": "s"}'), ("c", "{broken")],
        "doc_id string, js string")
    out = validate_json_strings(
        df, "js", {"properties": {"v": {"type": "integer"}}},
        mode="verdicts")
    got = {r["doc_id"]: r["valid"] for r in out.collect()}
    assert got == {"a": True, "b": False, "c": False}


def test_json_unsupported_raises_at_compile(spark):
    # pattern that compiles in Python re but not java.util.regex: the
    # typed engine would stage a Python fallback; the variant path cannot
    with pytest.raises(JsonIngestUnsupported, match="pattern"):
        json_valid_column(F.lit("{}"), {"pattern": r"(?P<x>a)(?P=x)"})


def test_json_unevaluated_runtime_annotations(spark):
    """unevaluated* on the variant path: full RUNTIME annotation algebra
    (claims from applied-and-valid sources only), per 2020-12."""
    got = _valids(spark, {
        "anyOf": [{"required": ["a"], "properties": {"a": {"minimum": 0}}},
                  {"required": ["b"]}],
        "unevaluatedProperties": False,
    }, [{"a": 1}, {"a": -1}, {"b": 2}, {"c": 3}], draft=2020)
    # {"b": 2}: required produces NO annotation — only properties/
    # patternProperties/additionalProperties claim — so b stays
    # unevaluated and the doc is invalid
    assert got == [True, False, False, False]
    got = _valids(spark, {
        "if": {"minItems": 2}, "then": {"prefixItems": [True, True]},
        "unevaluatedItems": False,
    }, [[1, 2], [1, 2, 3], [], [1]], draft=2020)
    assert got == [True, False, True, False]
    # contains claims matched items; failing prefix claim drops (round 5)
    got = _valids(spark, {
        "contains": {"type": "string"},
        "unevaluatedItems": {"type": "integer"},
    }, [["s", 1], ["s", 1.5]], draft=2020)
    assert got == [True, False]
    got = _valids(spark, {"prefixItems": [{"type": "integer"}],
                          "unevaluatedItems": False},
                  [[1], ["x"]], draft=2020)
    assert got == [True, False]


def test_json_content_draft7(spark):
    got = _valids(spark, {"contentEncoding": "base64"},
                  ["aGVsbG8=", "not*b64!"], draft=7)
    assert got == [True, False]
    # 2019+: annotation only
    got = _valids(spark, {"contentEncoding": "base64"},
                  ["not*b64!"], draft=2019)
    assert got == [True]


def test_json_nested_combinators(spark):
    schema = {
        "properties": {"spans": {
            "type": "array",
            "items": {"anyOf": [
                {"properties": {"kind": {"const": "text"},
                                "text": {"type": "string", "minLength": 1}},
                 "required": ["text"]},
                {"properties": {"kind": {"const": "image"},
                                "media_ref": {"type": "string"}},
                 "required": ["media_ref"]},
            ]},
        }},
    }
    got = _valids(spark, schema, [
        {"spans": [{"kind": "text", "text": "hi"},
                   {"kind": "image", "media_ref": "m1"}]},
        {"spans": [{"kind": "text"}]},           # neither branch
        {"spans": []},
        {},
    ])
    assert got == [True, False, True, True]


def test_json_multiple_of_decimal_exact(spark):
    """Variant path multipleOf: exact decimal remainder straight from the
    literal (no double round-trip for <=6-scale literals)."""
    got = _valids(spark, {"multipleOf": 0.0001},
                  [0.0075, 0.00751, 123456.7891, 123456.78915])
    assert got == [True, False, True, False]
    got = _valids(spark, {"multipleOf": 2}, [4, 4.0, 5, 2 ** 60 + 2,
                                             2 ** 60 + 1])
    assert got == [True, True, False, True, False]


def test_json_null_document_violation_row(spark):
    """SQL-NULL documents must agree across modes (round 6, ADVICE low):
    verdicts says invalid, so violations must emit a json/parse row (with
    NULL observed — there is no text) instead of zero rows."""
    df = spark.createDataFrame(
        [("d1", '{"v": 1}'), ("d2", None)], "doc_id string, js string")
    schema = {"properties": {"v": {"type": "integer"}}}
    out = validate_json_strings(df, "js", schema)
    got = {(r["doc_id"], r["constraint_id"]): r["observed"]
           for r in out.collect()}
    assert got == {("d2", "json/parse"): None}, got
    verd = validate_json_strings(df, "js", schema, mode="verdicts")
    vgot = {r["doc_id"]: r["valid"] for r in verd.collect()}
    assert vgot == {"d1": True, "d2": False}


def test_json_uniqueitems_bigint_exact(spark):
    """uniqueItems canon (round 6, ADVICE low): integer-tagged values
    beyond 2^53 must stay distinct (exact decimal rendering), while
    1 == 1.0 equality is preserved through the shared integral form."""
    schema = {"uniqueItems": True}
    got = _valids(spark, schema, [
        [9007199254740992, 9007199254740993],   # distinct big ints: valid
        [9007199254740992, 9007199254740992],   # duplicate: invalid
        [1, 1.0],                               # JSON-equal: invalid
        [1, 2.0],                               # distinct: valid
        [1.5, 1.5],                             # duplicate fraction
    ])
    assert got == [True, False, False, True, False]
