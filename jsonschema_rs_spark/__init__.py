"""jsonschema_rs_spark — a PySpark-native schema + constraint validation engine.

A from-scratch, Spark-first re-expression of the capabilities of
``Stranger6667/jsonschema-rs`` (reference: ``crates/jsonschema/src/validator.rs``,
``compiler.rs``): a declarative constraint spec (JSON-Schema keyword subset plus
dataset-level constraints) is compiled ONCE on the driver into
``pyspark.sql.Column`` expression trees and Arrow-vectorized pandas-UDF batch
predicates, then evaluated set-at-a-time over typed DataFrames — never one
document at a time, never per-row Python.

Three execution modes mirror the reference's dual ``is_valid``/``validate``/
``apply`` paths (reference ``validator.rs:28-89``):

- ``verdicts``    — boolean per doc, no violation objects allocated
                    (analogue of ``is_valid``; pure whole-stage-codegen plan).
- ``violations``  — one row per violated constraint
                    ``(doc_id, constraint_id, span_index, observed)``
                    (analogue of ``validate``/``iter_errors``).
- ``rollup``      — per-partition pass/fail + counters
                    (analogue of ``apply().basic()`` aggregation).

Round 5 adds the ARBITRARY-JSON path (``json_ingest``): raw JSON-string
columns validate through Spark 4's VARIANT type without a pre-typed table
— the analogue of the reference accepting any parsed JSON value
(``validator.rs:29-33``).
"""

from jsonschema_rs_spark.spec import (SpecError, resolve_refs,
                                      strip_internal_markers)
from jsonschema_rs_spark.compiler import (
    CompiledConstraint,
    CompiledSpec,
    EngineOptions,
    compile_spec,
)
from jsonschema_rs_spark.plans.validate import (
    basic_output,
    validation_frame,
    verdicts,
    violations,
    partition_rollup,
)
from jsonschema_rs_spark.retriever import fetch_resources
from jsonschema_rs_spark.json_ingest import (
    JsonIngestUnsupported,
    json_valid_column,
    validate_json_strings,
)

__all__ = [
    "SpecError",
    "resolve_refs",
    "strip_internal_markers",
    "CompiledConstraint",
    "CompiledSpec",
    "EngineOptions",
    "compile_spec",
    "basic_output",
    "validation_frame",
    "verdicts",
    "violations",
    "partition_rollup",
    "fetch_resources",
    "JsonIngestUnsupported",
    "json_valid_column",
    "validate_json_strings",
]

__version__ = "0.1.0"
