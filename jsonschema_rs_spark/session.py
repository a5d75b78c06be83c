"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` single-JVM; the configs below are the ones
that matter identically on a 1000-executor cluster:

- AQE on (runtime re-plan, partition coalescing, skew-join splitting) —
  the north rule requires explicit skew handling; AQE skew-join plus the
  salting helpers in ``operators/dataset.py`` cover it.
- Arrow enabled for every pandas-UDF crossing.
- ``files.maxPartitionBytes`` sized so a scan task's batch fits executor
  memory with room for the fused constraint projection.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _parse_bytes(s: str) -> int:
    """'128m' / '1g' / '134217728' -> bytes (SparkConf size grammar)."""
    s = str(s).strip().lower()
    for suf, mul in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                     ("t", 1 << 40), ("b", 1)):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mul)
    return int(s)


def est_scan_splits(df) -> int:
    """Estimated scan-split count from the optimizer's size statistics.

    Round 6: the previous probe — ``df.rdd.getNumPartitions()`` — forces
    full physical planning plus a DataFrame->RDD conversion on the driver
    (measured ~0.7s per call here, and it was paid once per query build).
    The file-index byte size divided by ``files.maxPartitionBytes`` is the
    same quantity Spark's own split packing computes, from metadata the
    session has already cached.  Unknown/absurd statistics read as
    "already wide" so no surprise shuffle is ever added at scale."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
    except Exception:
        return 1 << 20
    if size <= 0 or size >= (1 << 62):
        return 1 << 20
    mpb = _parse_bytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes",
                                 "134217728"))
    return max(1, size // max(mpb, 1))


def get_spark(app: str = "jsonschema_rs_spark", cores: int | str = "*",
              shuffle_partitions: int | None = None) -> SparkSession:
    cores_s = str(cores)
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores_s}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce small shuffles by DATA SIZE, not parallelism: the
        # verdict/rollup aggregations shuffle O(docs+violations) narrow
        # rows — splitting a few MB across 32 reducers is pure task-launch
        # latency.  Large shuffles still split on
        # advisoryPartitionSizeInBytes, so 100-TB-scale stages keep full
        # parallelism (round 5).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(shuffle_partitions))
    return builder.getOrCreate()
