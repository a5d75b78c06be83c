"""Checkpoint manifest + resumable validation runs.

North-rule requirement: a killed job re-validates only unfinished
partitions.  Design:

- The run manifest is a directory of per-partition JSON files (atomic
  rename per partition — object-store friendly, no coordination):
  ``{manifest_dir}/part={K}.json`` with partition id, row/violation
  counters, pass flag, input lineage (snapshot id / source fingerprint),
  and optional mergeable sketch state (base64 HLL binaries from
  ``hll_sketch_agg``) so global cardinality resumes by ``hll_union_agg``
  over saved state instead of rescanning finished partitions.
- ``resume_filter`` prunes finished partitions with a PARTITION-PRUNABLE
  predicate (``~part_col.isin(done)``) — on an Iceberg/parquet table
  partitioned by ``part_col`` the skip happens at the metadata level and
  finished data is never read.
- Violations for each partition are written under
  ``{out_dir}/part={K}/`` BEFORE its manifest entry commits, so a crash
  between them re-does (idempotent overwrite) rather than loses work.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import asdict, dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PartitionEntry:
    part_key: int
    docs: int
    valid_docs: int
    violation_rows: int
    passed: bool
    lineage: str
    sketches_b64: dict | None = None
    status: str = "done"


def _entry_path(manifest_dir: str, part_key) -> str:
    return os.path.join(manifest_dir, f"part={part_key}.json")


def write_entry(manifest_dir: str, entry: PartitionEntry) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    path = _entry_path(manifest_dir, entry.part_key)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(entry), f)
    os.replace(tmp, path)  # atomic commit of the partition


def finished_partitions(manifest_dir: str) -> dict[int, PartitionEntry]:
    out: dict[int, PartitionEntry] = {}
    if not os.path.isdir(manifest_dir):
        return out
    for name in os.listdir(manifest_dir):
        if not (name.startswith("part=") and name.endswith(".json")):
            continue
        with open(os.path.join(manifest_dir, name)) as f:
            d = json.load(f)
        if d.get("status") == "done":
            e = PartitionEntry(**d)
            out[e.part_key] = e
    return out


def resume_filter(df: DataFrame, part_col: str, manifest_dir: str) -> DataFrame:
    """Prune finished partitions (partition-prunable predicate).

    NULL-safe: ``~isin(done)`` evaluates to NULL for a NULL partition key,
    which a plain filter silently drops — rows with no partition key would
    skip validation on every resume without ever appearing in the manifest.
    They are explicitly retained (they can never be marked done)."""
    done = sorted(k for k in finished_partitions(manifest_dir)
                  if k is not None)
    if not done:
        return df
    return df.filter(~F.col(part_col).isin(done) | F.col(part_col).isNull())


def run_resumable_validation(
    df: DataFrame,
    compiled,
    part_col: str,
    manifest_dir: str,
    out_dir: str,
    id_cols: Sequence[str] = ("doc_id",),
    lineage: str = "",
    sketch_cols: Sequence[str] = (),
) -> dict[int, PartitionEntry]:
    """Validate partition-by-partition with per-partition commit.

    Partition granularity is the CHECKPOINT unit, not the parallelism unit:
    within one part_key Spark still fans out across all cores/executors.
    Driver-side loop cost is O(#logical partitions), which is small by
    design (the manifest is per Iceberg partition, not per task).
    """
    from jsonschema_rs_spark.plans.validate import violations

    done = finished_partitions(manifest_dir)
    parts = [
        r[0]
        for r in df.select(part_col).distinct().collect()
        if r[0] not in done
    ]
    if any(pk is None for pk in parts):
        raise ValueError(
            f"NULL {part_col!r} partition keys found: a NULL key cannot be "
            "tracked in the resume manifest — repair or bucket them first "
            "(e.g. coalesce(part_col, -1))"
        )
    spark = df.sparkSession
    for pk in sorted(parts):
        # partition-prunable predicate: on an Iceberg/parquet table
        # partitioned by part_col this reads ONLY partition pk
        pdf = df.filter(F.col(part_col) == pk)
        out_path = os.path.join(out_dir, f"part={pk}")
        # scan 1 (the heavy one): the codegen violations plan -> parquet
        viol = violations(pdf, compiled, id_cols=id_cols)
        viol.write.mode("overwrite").parquet(out_path)
        # scan 2 (narrow: id + sketch columns only): doc count + mergeable
        # HLL state in ONE agg; the violation counters come from the just-
        # written (violations-sized) parquet instead of a third full scan.
        aggs = [F.count(F.lit(1)).alias("_docs")]
        aggs += [F.hll_sketch_agg(F.col(c)).alias(c) for c in sketch_cols]
        srow = pdf.agg(*aggs).collect()[0]
        docs = srow["_docs"]
        sketches = None
        if sketch_cols:
            sketches = {
                c: base64.b64encode(bytes(srow[c])).decode()
                for c in sketch_cols
            }
        vrow = (
            spark.read.parquet(out_path)
            .agg(
                F.count(F.lit(1)).alias("vr"),
                F.count_distinct(*[F.col(c) for c in id_cols]).alias("bad"),
            )
            .collect()[0]
        )
        entry = PartitionEntry(
            part_key=pk,
            docs=docs,
            valid_docs=docs - (vrow["bad"] or 0),
            violation_rows=vrow["vr"] or 0,
            passed=(vrow["bad"] or 0) == 0,
            lineage=lineage,
            sketches_b64=sketches,
        )
        write_entry(manifest_dir, entry)
        done[pk] = entry
    return done


def merged_cardinality(spark: SparkSession, manifest_dir: str,
                       sketch_col: str) -> int:
    """Global distinct estimate from the saved per-partition HLL state —
    resume-safe: no rescan of finished partitions."""
    entries = finished_partitions(manifest_dir)
    blobs = [
        (base64.b64decode(e.sketches_b64[sketch_col]),)
        for e in entries.values()
        if e.sketches_b64 and sketch_col in e.sketches_b64
    ]
    if not blobs:
        return 0
    df = spark.createDataFrame(blobs, f"{sketch_col} binary")
    return df.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias("d")
    ).collect()[0]["d"]
