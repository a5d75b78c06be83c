"""Structured-streaming validation: the same compiled spec over a file
stream produces the same violation rows as the batch plan."""

import os

from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler import compile_spec
from jsonschema_rs_spark.flagship import FLAGSHIP_SPEC
from jsonschema_rs_spark.plans.validate import violations
from jsonschema_rs_spark.sources.spans import derive_spans
from jsonschema_rs_spark.streaming.validate_stream import (
    stream_spans,
    stream_violations,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    df = derive_spans(spark, SF).filter(F.col("part_key") < 4)
    # two files → two micro-batches
    df.filter(F.col("part_key") < 2).write.parquet(f"{src}/f1.parquet")
    df.filter(F.col("part_key") >= 2).write.parquet(f"{src}/f2.parquet")

    compiled = compile_spec(FLAGSHIP_SPEC, df.schema)
    stream = stream_spans(spark, f"{src}/*", df.schema)
    assert stream.isStreaming
    out = stream_violations(stream, compiled)

    q = (
        out.writeStream.format("memory")
        .queryName("viols")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        tuple(r)
        for r in spark.sql(
            "select doc_id, constraint_id, span_index, observed from viols "
            "where constraint_id is not null"
        ).collect()
    }
    batch = {tuple(r) for r in violations(df, compiled).collect()}
    assert streamed == batch
