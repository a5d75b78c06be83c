"""Spec-fuzz robustness (round 5) — the compile-front-end analogue of the
reference's fuzz targets (``fuzz/fuzz_targets/validation.rs``: arbitrary
bytes must never panic).  Here: arbitrary malformed / deep / cyclic spec
dicts must either compile cleanly or raise ``SpecError`` (never a raw
Python/Py4J/analysis exception), and a spec that COMPILES must never blow
up at action time."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jsonschema_rs_spark.compiler import compile_spec
from jsonschema_rs_spark.spec import SpecError

KEYWORDS = [
    "type", "enum", "const", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "format", "properties", "required", "patternProperties",
    "additionalProperties", "propertyNames", "minProperties",
    "maxProperties", "dependencies", "dependentRequired",
    "dependentSchemas", "items", "prefixItems", "additionalItems",
    "contains", "minContains", "maxContains", "minItems", "maxItems",
    "uniqueItems", "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
    "$ref", "$defs", "definitions", "$id", "$schema", "$anchor",
    "unevaluatedProperties", "unevaluatedItems", "contentEncoding",
    "contentMediaType", "$recursiveRef", "$dynamicRef", "$dynamicAnchor",
]
FIELDS = ["doc_id", "spans", "kind", "text", "media_ref", "offset",
          "part_key", "zz_unknown"]
REF_TARGETS = ["#", "#/", "#/$defs/a", "#/$defs/missing", "#/properties",
               "#/properties/spans/items", "#anchor", "#a b",
               "urn:x", "https://e.com/x#/y", "x.json", "", "#/enum/0"]
TYPE_NAMES = ["string", "integer", "number", "boolean", "null", "object",
              "array", "bogus", 7]

_scalar = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(10 ** 40), max_value=10 ** 40),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=8),
    st.sampled_from(["^a(", "[z-a]", "(?P<x>a)(?P=x)", ".*", "-?\\d+"]),
    st.sampled_from(REF_TARGETS),
    st.sampled_from(TYPE_NAMES),
)


def _schemas(depth: int):
    if depth <= 0:
        return _scalar
    sub = st.deferred(lambda: _schemas(depth - 1))
    key = st.one_of(st.sampled_from(KEYWORDS), st.sampled_from(FIELDS),
                    st.text(max_size=5))
    return st.one_of(
        _scalar,
        st.booleans(),
        st.lists(sub, max_size=3),
        st.dictionaries(key, sub, max_size=4),
    )


SPEC = st.one_of(
    _schemas(3),
    # guaranteed-cyclic / self-referential shapes
    st.just({"$defs": {"a": {"$ref": "#/$defs/a"}}, "$ref": "#/$defs/a"}),
    st.just({"$defs": {"a": {"$ref": "#/$defs/b"},
                       "b": {"$ref": "#/$defs/a"}},
             "properties": {"doc_id": {"$ref": "#/$defs/a"}}}),
    st.just({"$dynamicRef": "#x", "$defs": {"a": {"$dynamicAnchor": "x"}}}),
)


@pytest.fixture(scope="module")
def fuzz_df(spark):
    df = spark.createDataFrame(
        [("d1", [("text", "hello", None, 0)], 1)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, part_key int")
    df.cache().count()
    return df


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(spec=SPEC)
def test_fuzz_compile_specerror_only(fuzz_df, spec):
    """Compile either succeeds or raises SpecError — nothing else."""
    try:
        compile_spec(spec, fuzz_df.schema)
    except SpecError:
        return
    # compiled fine: that's also acceptable — action-time safety is
    # asserted (on a bounded sample) in test_fuzz_compiled_plans_run


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(spec=SPEC)
def test_fuzz_compiled_plans_run(fuzz_df, spec):
    """A spec that compiles must evaluate without action-time errors."""
    from jsonschema_rs_spark.plans.validate import valid_column
    from pyspark.sql import functions as F

    try:
        compiled = compile_spec(spec, fuzz_df.schema)
    except SpecError:
        return
    root = F.struct(*[F.col(c).alias(c) for c in fuzz_df.columns])
    rows = fuzz_df.select(valid_column(compiled, root).alias("v")).collect()
    assert len(rows) == 1 and rows[0]["v"] in (True, False, None)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(spec=SPEC)
def test_fuzz_json_path_specerror_only(spec):
    """The variant-JSON lowering has the same no-raw-escape contract
    (JsonIngestUnsupported is its documented fallback signal)."""
    from pyspark.sql import functions as F

    from jsonschema_rs_spark.json_ingest import (JsonIngestUnsupported,
                                                 json_valid_column)

    try:
        json_valid_column(F.lit('{"doc_id": "x"}'), spec)
    except (SpecError, JsonIngestUnsupported):
        return
