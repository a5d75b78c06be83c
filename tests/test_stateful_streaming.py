"""Stateful streaming dedup: state must persist across micro-batches."""

from pyspark.sql import functions as F

from jsonschema_rs_spark.streaming.stateful import stream_dedup

SF = "/root/testdata/sf0.001"


def test_stream_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    base = d.filter(F.col("doc_id") < 40)
    # batch 1: docs 0..39 ; batch 2: docs 20..59 (20..39 are re-sends with
    # new ids => same fingerprint, must be suppressed by state)
    base.write.parquet(f"{src}/b1.parquet")
    d.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 60)).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    ).write.parquet(f"{src}/b2.parquet")

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = stream_dedup(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("select doc_id from dedup").collect()
    ids = sorted(r["doc_id"] for r in rows)
    # one row per distinct fingerprint: 0..59 distinct texts
    assert len(ids) == 60
    # every re-sent text (20..39) kept its FIRST id, not the +10000 resend
    resent_kept = [i for i in ids if 10_020 <= i < 10_040]
    assert resent_kept == []
    assert [i for i in ids if i >= 10_000] == list(range(10_040, 10_060))
