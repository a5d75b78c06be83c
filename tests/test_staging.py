"""Regression tests for python-backed leaf staging (round-2 fixes).

The staging context makes python-backed leaves (UDF formats, Python-re
pattern fallbacks) resolve to Arrow adapter columns inside HOF plans, so
branch gates (if/then), tuple index gates, and element-scope combinators
compose identically on the HOF and exploded paths.  These tests pin the
three failure modes found in round 1:

1. if/then gating was DROPPED by the staged-UDF bypass (wrong verdicts);
2. element-scope combinators over UDF leaves crashed with
   ``LAMBDA_FUNCTION_WITH_PYTHON_UDF`` at analysis time;
3. Java-valid/Python-invalid ECMA patterns (named groups, ``\\p{L}``) were
   misrouted into a crashing Python fallback.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler import compile_spec
from jsonschema_rs_spark.plans.validate import validation_frame, verdicts, violations
from jsonschema_rs_spark.sources.spans import SPAN_TABLE_SCHEMA
from jsonschema_rs_spark.spec import SpecError


def _span(kind="text", text="hello world", media_ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _df(spark, docs):
    rows = [{"doc_id": f"d{i}", "spans": spans, "part_key": 0}
            for i, spans in enumerate(docs)]
    return spark.createDataFrame(rows, SPAN_TABLE_SCHEMA)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


IF_THEN_UDF = {"properties": {"spans": {"items": {
    "if": {"properties": {"text": {"minLength": 10}}},
    "then": {"properties": {"text": {"format": "ipv6"}}},
}}}}


def test_if_then_gate_respected_on_staged_udf_path(spark):
    """ADVICE round-1 high: the staged-UDF path must re-apply branch gates.

    A doc whose if-condition is false must be valid on EVERY plan."""
    df = _df(spark, [
        [_span(text="short")],                       # if false -> valid
        [_span(text="definitely-not-an-ipv6-addr")],  # then applies -> invalid
        [_span(text="2001:db8::1234:5678:abcd")],     # then applies, ipv6 ok
    ])
    compiled = compile_spec(IF_THEN_UDF, df.schema)

    both = {r["doc_id"]: r["valid"]
            for r in validation_frame(df, compiled, mode="both").collect()}
    fast = {r["doc_id"]: r["valid"]
            for r in validation_frame(df, compiled, mode="verdicts").collect()}
    expl = {r["doc_id"]: r["valid"]
            for r in verdicts(df, compiled, strategy="exploded").collect()}
    viol_ids = {r["doc_id"] for r in violations(df, compiled).collect()}

    expect = {"d0": True, "d1": False, "d2": True}
    assert both == expect
    assert fast == expect
    assert expl == expect
    assert viol_ids == {"d1"}


def test_element_combinator_with_udf_leaf_works_everywhere(spark):
    """anyOf over a UDF format INSIDE the element: the leaf resolves via the
    staging context in HOF plans (no LAMBDA_FUNCTION_WITH_PYTHON_UDF)."""
    spec = {"properties": {"spans": {"items": {"anyOf": [
        {"properties": {"text": {"format": "ipv6"}}},
        {"properties": {"kind": {"const": "text"}}},
    ]}}}}
    df = _df(spark, [
        [_span(kind="text", text="plain words")],        # branch 2 -> valid
        [_span(kind="image", text="plain words")],       # neither -> invalid
        [_span(kind="image", text="2001:db8::1")],       # branch 1 -> valid
    ])
    compiled = compile_spec(spec, df.schema)
    vf = validation_frame(df, compiled, mode="both")
    plan = _physical(vf)
    assert "ArrowEvalPython" in plan, plan
    both = {r["doc_id"]: r["valid"] for r in vf.collect()}
    expl = {r["doc_id"]: r["valid"]
            for r in verdicts(df, compiled, strategy="exploded").collect()}
    expect = {"d0": True, "d1": False, "d2": True}
    assert both == expect
    assert expl == expect


def test_doc_combinator_over_array_with_udf_rejected_at_compile(spark):
    """Cross-scope: anyOf at DOC scope wrapping the whole span array with a
    UDF leaf has no staged evaluation site -> clear SpecError, not a Spark
    AnalysisException at analysis time."""
    spec = {"anyOf": [{"properties": {"spans": {"items": {
        "properties": {"text": {"format": "ipv6"}}}}}}]}
    with pytest.raises(SpecError, match="python-backed"):
        compile_spec(spec, SPAN_TABLE_SCHEMA)


def test_contains_with_udf_rejected_at_compile(spark):
    spec = {"properties": {"spans": {"contains": {
        "properties": {"text": {"format": "ipv6"}}}}}}
    with pytest.raises(SpecError, match="contains"):
        compile_spec(spec, SPAN_TABLE_SCHEMA)


@pytest.mark.parametrize("pattern,ok,bad", [
    ("(?<word>doc)-", "doc-1", "x-1"),      # named group: Java yes, Python no
    ("^\\p{L}+$", "docs", "docs1"),         # unicode property: Java only
])
def test_java_only_patterns_route_to_rlike(spark, pattern, ok, bad):
    df = spark.createDataFrame([(ok,), (bad,)], "doc_id string")
    compiled = compile_spec({"properties": {"doc_id": {"pattern": pattern}}},
                            df.schema)
    vf = validation_frame(df, compiled, id_cols=("doc_id",), mode="verdicts")
    assert "Python" not in _physical(vf)
    got = {r["doc_id"]: r["valid"] for r in vf.collect()}
    assert got == {ok: True, bad: False}


def test_pattern_invalid_in_both_dialects_rejected_at_compile(spark):
    with pytest.raises(SpecError, match="neither"):
        compile_spec({"properties": {"doc_id": {"pattern": "(?<"}}},
                     SPAN_TABLE_SCHEMA)


def test_basic_output_locations(spark):
    """keyword_location is a FULL JSON Pointer (with 'properties'/'items'
    segments, combinator indices) and instance_path points at the failing
    instance including the span index — reference output.rs:104-200."""
    from jsonschema_rs_spark.plans.validate import basic_output

    spec = {"properties": {"spans": {
        "minItems": 3,
        "items": {
            "required": ["kind"],
            "allOf": [{"properties": {"offset": {"minimum": 0}}}],
        },
    }}}
    df = _df(spark, [
        [_span(kind=None, offset=-8), _span(offset=16)],
    ])
    compiled = compile_spec(spec, df.schema)
    rows = {r["constraint_id"]: r for r in basic_output(df, compiled).collect()}

    req = rows["spans/items/required/kind"]
    assert req["keyword_location"] == "/properties/spans/items/required"
    assert req["instance_path"] == "/spans/0"
    assert req["kind"] == "Required"

    mi = rows["spans/items/allOf/0/offset/minimum"]
    assert mi["keyword_location"] == (
        "/properties/spans/items/allOf/0/properties/offset/minimum")
    assert mi["instance_path"] == "/spans/0/offset"
    assert mi["kind"] == "Minimum"

    mn = rows["spans/minItems"]
    assert mn["keyword_location"] == "/properties/spans/minItems"
    assert mn["instance_path"] == "/spans"
    assert mn["kind"] == "MinItems"
    assert mn["valid"] is False and mn["span_index"] is None


def test_property_names_skip_absent_members(spark):
    """propertyNames applies only to PRESENT members (absent ≡ NULL)."""
    df = spark.createDataFrame(
        [("a", (1, None)), ("b", (1, 2))],
        "doc_id string, obj struct<good:int, `bad name`:int>")
    spec = {"properties": {"obj": {"propertyNames": {"pattern": "^[a-z]+$"}}}}
    compiled = compile_spec(spec, df.schema)
    got = {r["doc_id"]: r for r in
           validation_frame(df, compiled, mode="both").collect()}
    assert got["a"]["valid"] is True
    assert got["b"]["valid"] is False
    assert got["b"]["violations"][0]["observed"] == "bad name"
