"""Keyword fixture replay (SURVEY.md §5 / FIXTURES.md §3-4).

Each fixture case asserts, like the reference suite harness
(``crates/jsonschema/tests/suite.rs:44-115``) that all engine surfaces
agree: the verdict fast path, the violation rows, AND the pure-Python
oracle — at two parallelism levels (repartition 1 vs 8; the bench covers
real local[8]/local[32] process-level scaling).
"""

import glob
import json
import os

import pytest

from jsonschema_rs_spark.compiler import compile_spec
from jsonschema_rs_spark.plans.validate import validation_frame, violations
from jsonschema_rs_spark.sources.spans import SPAN_TABLE_SCHEMA

from .py_oracle import validate_doc

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def _cases():
    out = []
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.json"))):
        with open(path) as f:
            for case in json.load(f):
                out.append(pytest.param(
                    case, id=f"{os.path.basename(path)}::{case['description']}"))
    return out


@pytest.mark.parametrize("case", _cases())
@pytest.mark.parametrize("n_parts", [1, 8])
def test_fixture_case(spark, case, n_parts):
    rows = [t["data"] for t in case["tests"]]
    for r in rows:
        r.setdefault("part_key", 0)
    # optional per-case table shape (DDL string); default: the span table
    tbl = case.get("columns", SPAN_TABLE_SCHEMA)
    df = spark.createDataFrame(rows, tbl).repartition(n_parts)
    compiled = compile_spec(case["schema"], df.schema)

    vf = validation_frame(df, compiled, mode="both")
    got = {r["doc_id"]: r for r in vf.collect()}

    for t in case["tests"]:
        doc_id = t["data"]["doc_id"]
        row = got[doc_id]
        assert row["valid"] == t["valid"], (
            f"{t['description']}: verdict {row['valid']} != {t['valid']}; "
            f"violations={row['violations']}"
        )
        expected = {
            (v["doc_id"], v["constraint_id"], v["span_index"], v["observed"])
            for v in t.get("violations", [])
        }
        actual = {
            (doc_id, v["constraint_id"], v["span_index"], v["observed"])
            for v in row["violations"]
        }
        if t.get("violations") is not None:
            assert actual == expected, t["description"]

        # pure-Python oracle agreement (verdict; row-level where emitted 1:1)
        py_valid, _ = validate_doc(case["schema"], t["data"])
        assert py_valid == t["valid"], f"py-oracle disagrees: {t['description']}"


def test_span_sequence_preserved(spark):
    """FIXTURES.md §6: the engine never reorders/mutates span sequences."""
    from jsonschema_rs_spark.sources.spans import synth_spans
    from pyspark.sql import functions as F

    df = synth_spans(spark, 200).cache()
    compiled = compile_spec(
        {"properties": {"spans": {"items": {"properties": {
            "offset": {"minimum": 0}}}}}},
        df.schema,
    )
    out = validation_frame(df, compiled, keep_cols=("spans",), mode="both")
    joined = df.alias("a").join(out.alias("b"), "doc_id").filter(
        ~(F.col("a.spans").eqNullSafe(F.col("b.spans")))
    )
    assert joined.count() == 0
    df.unpersist()
