"""Draft dialect selection (reference ``options.rs:58-82`` dispatch,
``keywords/mod.rs:177-391`` per-draft keyword tables).

The engine hardwired one merged dialect in round 1; VERDICT #4 asked for an
``EngineOptions.draft`` with ``$schema`` sniffing controlling (a) draft-4
boolean vs numeric exclusive bounds, (b) tuple ``items`` vs ``prefixItems``,
and (c) the format-assertion default (annotation-only in 2019-09/2020-12).
"""

import pytest

from jsonschema_rs_spark.compiler import EngineOptions, compile_spec
from jsonschema_rs_spark.plans.validate import validation_frame
from jsonschema_rs_spark.sources.spans import SPAN_TABLE_SCHEMA
from jsonschema_rs_spark.spec import SpecError

DRAFT7 = "http://json-schema.org/draft-07/schema#"
DRAFT2020 = "https://json-schema.org/draft/2020-12/schema"


def _verdict(spark, schema, text):
    df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    c = compile_spec(schema, df.schema)
    return validation_frame(df, c, mode="verdicts").collect()[0]["valid"]


def test_format_asserts_under_draft7_annotates_under_2020(spark):
    """Same schema, same data, draft-correct DIFFERING verdicts."""
    body = {"properties": {"text": {"format": "ipv4"}}}
    assert _verdict(spark, {"$schema": DRAFT7, **body}, "999.1.1.1") is False
    assert _verdict(spark, {"$schema": DRAFT2020, **body}, "999.1.1.1") is True
    # explicit opt-in re-enables assertion under 2020-12
    df_schema = SPAN_TABLE_SCHEMA
    c = compile_spec({"$schema": DRAFT2020, "properties": {"doc_id": {
        "format": "uuid"}}}, df_schema,
        EngineOptions(validate_formats=True))
    assert any("format" in x.constraint_id for x in c.constraints)


def test_draft4_boolean_exclusive_bounds():
    # draft 4: boolean flag flips minimum strict — compiles
    c = compile_spec(
        {"properties": {"spans": {"items": {"properties": {"offset": {
            "minimum": 0, "exclusiveMinimum": True}}}}}},
        SPAN_TABLE_SCHEMA, EngineOptions(draft=4))
    assert any("minimum" in x.constraint_id for x in c.constraints)
    # draft 2020 rejects the boolean form
    with pytest.raises(SpecError, match="draft-4"):
        compile_spec(
            {"properties": {"spans": {"items": {"properties": {"offset": {
                "minimum": 0, "exclusiveMinimum": True}}}}}},
            SPAN_TABLE_SCHEMA, EngineOptions(draft=2020))
    # draft 4 rejects the numeric form
    with pytest.raises(SpecError, match="draft-6"):
        compile_spec(
            {"properties": {"spans": {"items": {"properties": {"offset": {
                "exclusiveMinimum": 0}}}}}},
            SPAN_TABLE_SCHEMA, EngineOptions(draft=4))


def test_tuple_items_vs_prefix_items_per_draft():
    tuple_items = {"properties": {"spans": {"items": [
        {"properties": {"kind": {"const": "text"}}}]}}}
    prefix = {"properties": {"spans": {"prefixItems": [
        {"properties": {"kind": {"const": "text"}}}]}}}
    # draft 7 takes array items, rejects prefixItems
    assert compile_spec(tuple_items, SPAN_TABLE_SCHEMA,
                        EngineOptions(draft=7)).constraints
    with pytest.raises(SpecError, match="2020-12"):
        compile_spec(prefix, SPAN_TABLE_SCHEMA, EngineOptions(draft=7))
    # draft 2020 takes prefixItems, rejects array items
    assert compile_spec(prefix, SPAN_TABLE_SCHEMA,
                        EngineOptions(draft=2020)).constraints
    with pytest.raises(SpecError, match="prefixItems"):
        compile_spec(tuple_items, SPAN_TABLE_SCHEMA, EngineOptions(draft=2020))


def test_unknown_dialect_uri_rejected():
    with pytest.raises(SpecError, match="dialect"):
        compile_spec({"$schema": "https://example.com/my-schema"},
                     SPAN_TABLE_SCHEMA)


def test_content_support_removal_toggles():
    """without_content_*_support analogues (reference options.rs:152-258):
    False removes the builtin check entirely — the keyword annotates."""
    spec = {"properties": {"doc_id": {
        "contentEncoding": "base64",
        "contentMediaType": "application/json"}}}
    on = compile_spec(spec, SPAN_TABLE_SCHEMA)
    assert any("contentEncoding" in c.constraint_id for c in on.constraints)
    assert any("contentMediaType" in c.constraint_id for c in on.constraints)
    off = compile_spec(spec, SPAN_TABLE_SCHEMA, EngineOptions(
        content_encoding_support=False, content_media_type_support=False))
    assert not any("content" in c.constraint_id for c in off.constraints)
    # per-name removal (the reference's actual signature:
    # without_content_encoding_support("base64"))
    part = compile_spec(spec, SPAN_TABLE_SCHEMA, EngineOptions(
        content_encoding_support={"base64"}))
    assert not any("contentEncoding" in c.constraint_id
                   for c in part.constraints)
    assert any("contentMediaType" in c.constraint_id
               for c in part.constraints)


def test_no_schema_key_keeps_merged_dialect():
    """Backwards compatible: no $schema -> merged dialect, formats assert."""
    c = compile_spec({"properties": {"doc_id": {"format": "uuid"}}},
                     SPAN_TABLE_SCHEMA)
    assert any("format" in x.constraint_id for x in c.constraints)
