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
    """Prune finished partitions (partition-prunable predicate)."""
    done = sorted(finished_partitions(manifest_dir))
    if not done:
        return df
    return df.filter(~F.col(part_col).isin(done))


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
    from jsonschema_rs_spark.plans.validate import partition_rollup, violations

    done = finished_partitions(manifest_dir)
    parts = [
        r[0]
        for r in df.select(part_col).distinct().collect()
        if r[0] not in done
    ]
    for pk in sorted(parts):
        # partition-prunable predicate: on an Iceberg/parquet table
        # partitioned by part_col this reads ONLY partition pk
        pdf = df.filter(F.col(part_col) == pk)
        viol = violations(pdf, compiled, id_cols=id_cols)
        viol.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"part={pk}")
        )
        roll = partition_rollup(pdf, compiled, part_col,
                                id_cols=id_cols).collect()
        stats = (
            roll[0]
            if roll
            else {"docs": 0, "valid_docs": 0, "violation_rows": 0}
        )
        sketches = None
        if sketch_cols:
            srow = pdf.agg(
                *[F.hll_sketch_agg(F.col(c)).alias(c) for c in sketch_cols]
            ).collect()[0]
            sketches = {
                c: base64.b64encode(bytes(srow[c])).decode()
                for c in sketch_cols
            }
        entry = PartitionEntry(
            part_key=pk,
            docs=stats["docs"],
            valid_docs=stats["valid_docs"] or 0,
            violation_rows=stats["violation_rows"] or 0,
            passed=(stats["valid_docs"] or 0) == stats["docs"],
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
