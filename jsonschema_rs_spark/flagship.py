"""The flagship constraint suite over the interleaved span table.

This is the "full constraint suite" of BASELINE.json's metric: every
row/span keyword family exercised in one compiled spec, evaluated in one
pass.  Matches the derivation rules in ``sources/spans.py`` so the planted
violations (enum kind, short text, negative / non-multiple offset) are the
exact expected output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jsonschema_rs_spark.compiler import CompiledSpec, compile_spec
from jsonschema_rs_spark.plans.validate import violations, partition_rollup
from jsonschema_rs_spark.sources.spans import derive_spans

FLAGSHIP_SPEC = {
    "$id": "interleaved-document",
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "doc_id": {
            "type": "string",
            "minLength": 5,
            "pattern": "^doc-[0-9]{12}$",
        },
        "spans": {
            "type": "array",
            "minItems": 1,
            "maxItems": 4096,
            "items": {
                "type": "object",
                "required": ["kind", "offset"],
                "properties": {
                    "kind": {"enum": ["text", "image", "audio"]},
                    "text": {"type": "string", "minLength": 4, "maxLength": 4096},
                    "media_ref": {"type": "string", "pattern": "^media://[0-9]+$"},
                    "offset": {"type": "integer", "minimum": 0, "multipleOf": 8},
                },
                "if": {"properties": {"kind": {"const": "text"}}},
                "then": {"required": ["text"]},
                "else": {"required": ["media_ref"]},
            },
        },
    },
}


def compile_flagship(table_schema) -> CompiledSpec:
    return compile_spec(FLAGSHIP_SPEC, table_schema)


def flagship_violations(spark: SparkSession, sf_dir: str,
                        replicate: int = 1) -> DataFrame:
    df = derive_spans(spark, sf_dir, replicate=replicate)
    compiled = compile_flagship(df.schema)
    return violations(df, compiled)


def flagship_rollup(spark: SparkSession, sf_dir: str,
                    replicate: int = 1) -> DataFrame:
    df = derive_spans(spark, sf_dir, replicate=replicate)
    compiled = compile_flagship(df.schema)
    return partition_rollup(df, compiled, "part_key")
