"""Structured-Streaming validation.

The same compiled spec drives a streaming plan unchanged — the validation
projection is stateless per row, so it composes with ``readStream`` and any
sink.  Dataset-level constraints that need state (e.g. rolling verdict
counts per window) use watermarked windowed aggregation.

Reference analogue: none — jsonschema-rs validates in-memory values one at
a time; continuous validation of an arriving document stream is the
streaming generalization of the same spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler import CompiledSpec
from jsonschema_rs_spark.plans.validate import validation_frame


def stream_spans(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream of span-table parquet (one file per micro-batch
    in tests; any streaming source with the same schema works)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def stream_violations(stream: DataFrame, compiled: CompiledSpec,
                      id_cols=("doc_id",)) -> DataFrame:
    """Per-record violation rows as a streaming DataFrame (append mode)."""
    vf = validation_frame(stream, compiled, id_cols=id_cols, mode="both")
    return vf.select(*id_cols, F.col("valid"), F.explode_outer("violations").alias("v")).select(
        *id_cols,
        "valid",
        F.col("v.constraint_id").alias("constraint_id"),
        F.col("v.span_index").alias("span_index"),
        F.col("v.observed").alias("observed"),
    )


def windowed_verdict_counts(
    stream: DataFrame,
    compiled: CompiledSpec,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed pass/fail counts — the streaming rollup.

    Late rows beyond the watermark are dropped deterministically; state is
    bounded by (watermark / window) keys."""
    vf = validation_frame(
        stream.withWatermark(ts_col, watermark),
        compiled,
        id_cols=("doc_id", ts_col),
        mode="verdicts",
    )
    return (
        vf.groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("valid").cast("long")).alias("valid_docs"),
        )
        .withColumn("pass_rate", F.col("valid_docs") / F.col("docs"))
    )
