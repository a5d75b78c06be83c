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


def test_windowed_chi2_drift_flags_shifted_window(spark, tmp_path):
    """Streaming drift monitor: χ² vs a spec reference distribution in ONE
    windowed agg (no chained stateful aggs); the drifted window flags."""
    import datetime as dt

    from jsonschema_rs_spark.streaming.validate_stream import (
        windowed_chi2_drift,
    )

    src = str(tmp_path / "drift_src")
    base = dt.datetime(2024, 1, 1)
    rows_ok = [("a" if i % 2 else "b", base + dt.timedelta(seconds=i))
               for i in range(200)]
    rows_drift = [("a", base + dt.timedelta(minutes=5, seconds=i))
                  for i in range(200)]  # all-'a' window vs 50/50 reference
    spark.createDataFrame(rows_ok + rows_drift, "kind string, ts timestamp") \
        .write.parquet(f"{src}/f1.parquet")

    stream = (spark.readStream
              .schema("kind string, ts timestamp")
              .parquet(f"{src}/*"))
    out = windowed_chi2_drift(stream, "kind", "ts",
                              ref_dist={"a": 0.5, "b": 0.5},
                              window="1 minute", threshold=27.0)
    q = (out.writeStream.format("memory").queryName("drift")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = {r["window"]["start"].minute: r
           for r in spark.sql("select * from drift").collect()}
    flagged = [m for m, r in res.items() if r["drifted"]]
    assert 5 in flagged or 6 in flagged  # the planted all-'a' windows
    ok_windows = [m for m in res if m < 4]
    assert all(not res[m]["drifted"] for m in ok_windows)
    assert all(r["n_other"] == 0 for r in res.values())


def test_stream_referential_integrity(spark, tmp_path):
    """Stream-static anti-join flags dangling media_refs per micro-batch,
    with no accumulating join state (static side broadcast each batch)."""
    from jsonschema_rs_spark.sources.spans import flat_spans
    from jsonschema_rs_spark.streaming.validate_stream import (
        stream_referential_violations,
    )

    src = str(tmp_path / "src")
    flat = flat_spans(spark, SF).filter(F.col("media_ref").isNotNull())
    flat.limit(500).write.mode("overwrite").parquet(src)
    # catalog: every ref except the ones ending in '7' (planted dangling)
    catalog = (spark.read.parquet(src)
               .select(F.col("media_ref").alias("media_id")).distinct()
               .filter(~F.col("media_id").endswith("7")))
    stream = stream_spans(spark, src, spark.read.parquet(src).schema)
    out = stream_referential_violations(
        stream, catalog, "media_ref", "media_id",
        id_cols=("doc_id", "span_index"))
    q = (out.writeStream.format("memory").queryName("ref_viol")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = spark.sql("select * from ref_viol").collect()
    finally:
        q.stop()
    want = {(r["doc_id"], r["span_index"]) for r in
            spark.read.parquet(src)
            .filter(F.col("media_ref").endswith("7"))
            .select("doc_id", "span_index").collect()}
    assert {(r["doc_id"], r["span_index"]) for r in got} == want
    assert all(r["dangling_ref"].endswith("7") for r in got)


def test_windowed_psi_drift_flags_shifted_window(spark, tmp_path):
    """Two micro-batch windows: one matching the reference shares, one with
    mass collapsed into half the support -> only the second drifts."""
    import datetime as dt
    from jsonschema_rs_spark.streaming.validate_stream import (
        windowed_psi_drift,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(2000):
        rows.append((t0, float(i % 100) + 0.5))                 # uniform
        rows.append((t0 + dt.timedelta(minutes=5),
                     float(i % 50) + 0.5))                      # shifted
    src = str(tmp_path / "psi_src")
    spark.createDataFrame(rows, "ts timestamp, v double").write.mode(
        "overwrite").parquet(src)
    stream = (spark.readStream.schema("ts timestamp, v double")
              .parquet(src))
    out = windowed_psi_drift(stream, "v", "ts", [0.1] * 10, (0.0, 100.0),
                             window="1 minute", watermark="1 minute")
    # complete mode: append only emits a window once the watermark passes
    # its end, which a finite test feed never reaches for the last window
    q = (out.writeStream.format("memory").queryName("psi_win")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {r["window"].start.minute: r["drifted"]
               for r in spark.sql("select * from psi_win").collect()}
    finally:
        q.stop()
    assert got.get(0) is False and got.get(5) is True, got
