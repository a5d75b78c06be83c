"""Meta-schema self-validation tests (reference compiler.rs:246-282: every
schema is validated against its draft's meta-schema before compiling)."""

import pytest

from jsonschema_rs_spark.compiler import EngineOptions, compile_spec
from jsonschema_rs_spark.metaschema import validate_against_metaschema
from jsonschema_rs_spark.sources.spans import SPAN_TABLE_SCHEMA
from jsonschema_rs_spark.spec import SpecError


@pytest.mark.parametrize("bad,frag", [
    ({"type": "strng"}, "/type"),                       # typo'd type name
    ({"type": ["string", "string"]}, "/type"),          # duplicate union
    ({"enum": "a"}, "/enum"),                           # enum not an array
    ({"minLength": -1}, "/minLength"),
    ({"minLength": 1.5}, "/minLength"),
    ({"multipleOf": 0}, "/multipleOf"),                 # must be > 0
    ({"pattern": "["}, "/pattern"),                     # invalid regex
    ({"required": ["a", 1]}, "/required/1"),
    ({"required": ["a", "a"]}, "/required"),            # duplicates
    ({"allOf": []}, "/allOf"),
    ({"anyOf": [{"type": "string"}, 3]}, "/anyOf/1"),
    ({"properties": ["x"]}, "/properties"),
    ({"properties": {"x": 5}}, "/properties/x"),
    ({"maximum": "10"}, "/maximum"),
    ({"uniqueItems": "yes"}, "/uniqueItems"),
    ({"dependentRequired": {"a": "b"}}, "/dependentRequired/a"),
    ({"patternProperties": {"[": {}}}, "/patternProperties"),  # bad key regex
])
def test_metaschema_rejects_with_pointer(bad, frag):
    with pytest.raises(SpecError) as ei:
        validate_against_metaschema(bad, None)
    assert frag in str(ei.value), str(ei.value)


@pytest.mark.parametrize("ok", [
    True, False, {},
    {"type": ["string", "null"], "minLength": 1},
    {"enum": [1, "a", None]},
    {"properties": {"format": {"type": "string"}}},      # keyword-named prop
    {"items": [{"type": "string"}], "additionalItems": False},   # draft<=7
    {"dependencies": {"a": ["b"], "c": {"required": ["d"]}}},
    {"x-custom": {"whatever": [1, 2]}},                  # unknown = annotation
    {"$defs": {"n": {"$anchor": "node", "type": "object"}}},
])
def test_metaschema_accepts(ok):
    validate_against_metaschema(ok, None)


def test_draft_gated_forms():
    # boolean exclusive bound: ok in 4 and merged, rejected in 2020
    validate_against_metaschema({"exclusiveMinimum": True}, 4)
    validate_against_metaschema({"exclusiveMinimum": True}, None)
    with pytest.raises(SpecError, match="draft-4"):
        validate_against_metaschema({"exclusiveMinimum": True}, 2020)
    # numeric exclusive bound: rejected in 4
    with pytest.raises(SpecError, match="draft-6"):
        validate_against_metaschema({"exclusiveMinimum": 0}, 4)
    # array items: ok through 2019, rejected in 2020 (moved to prefixItems)
    validate_against_metaschema({"items": [{}]}, 7)
    validate_against_metaschema({"items": [{}]}, 2019)
    with pytest.raises(SpecError, match="prefixItems"):
        validate_against_metaschema({"items": [{}]}, 2020)
    # draft-4 required/enum must be non-empty
    with pytest.raises(SpecError):
        validate_against_metaschema({"required": []}, 4)
    validate_against_metaschema({"required": []}, 7)


def test_compile_spec_runs_metaschema_gate():
    # nested malformation the old hand-rolled subset missed: a bad 'enum'
    # shape deep under a combinator is rejected at compile time with pointer
    bad = {"properties": {"spans": {"items": {"anyOf": [
        {"properties": {"kind": {"enum": "text"}}}]}}}}
    with pytest.raises(SpecError, match="enum"):
        compile_spec(bad, SPAN_TABLE_SCHEMA)
    with pytest.raises(SpecError, match="meta-schema"):
        compile_spec({"properties": {"doc_id": {"pattern": "["}}},
                     SPAN_TABLE_SCHEMA)


def test_flagship_and_drafted_specs_pass_gate():
    from jsonschema_rs_spark.flagship import FLAGSHIP_SPEC
    compile_spec(FLAGSHIP_SPEC, SPAN_TABLE_SCHEMA)
    compile_spec({"$schema": "http://json-schema.org/draft-07/schema#",
                  "properties": {"doc_id": {"minLength": 1}}},
                 SPAN_TABLE_SCHEMA)
    compile_spec({"$schema": "https://json-schema.org/draft/2020-12/schema",
                  "properties": {"spans": {"prefixItems": [
                      {"properties": {"kind": {"const": "text"}}}]}}},
                 SPAN_TABLE_SCHEMA, EngineOptions())


def test_integer_valued_floats_accepted():
    # draft 6+: 1.0 IS an integer (code-review r3 finding #1)
    validate_against_metaschema({"minLength": 1.0, "maxItems": 2.0}, None)
    validate_against_metaschema({"minLength": 1.0}, 2020)
    with pytest.raises(SpecError):
        validate_against_metaschema({"minLength": 1.5}, None)
    compile_spec({"properties": {"doc_id": {"minLength": 1.0}}},
                 SPAN_TABLE_SCHEMA)
