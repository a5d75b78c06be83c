"""Resumability (north rule): kill after K partitions, resume, assert only
unfinished partitions are revalidated and the final outputs are identical."""

import os

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark import checkpoint as CP
from jsonschema_rs_spark.compiler import compile_spec
from jsonschema_rs_spark.flagship import FLAGSHIP_SPEC
from jsonschema_rs_spark.sources.spans import derive_spans

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "manifest"), str(tmp_path / "out")


def _read_all_violations(spark, out_dir):
    return spark.read.parquet(f"{out_dir}/part=*")


def test_resume_revalidates_only_unfinished(spark, dirs, tmp_path):
    manifest_dir, out_dir = dirs
    df = derive_spans(spark, SF).filter(F.col("part_key") < 6).cache()
    compiled = compile_spec(FLAGSHIP_SPEC, df.schema)

    # first run "killed" after 3 partitions
    class Killed(Exception):
        pass

    orig_write = CP.write_entry
    count = {"n": 0}

    def killing_write(mdir, entry):
        if count["n"] >= 3:
            raise Killed()
        orig_write(mdir, entry)
        count["n"] += 1

    CP.write_entry = killing_write
    try:
        with pytest.raises(Killed):
            CP.run_resumable_validation(
                df, compiled, "part_key", manifest_dir, out_dir,
                lineage="run1", sketch_cols=("doc_id",))
    finally:
        CP.write_entry = orig_write

    done_after_kill = CP.finished_partitions(manifest_dir)
    assert len(done_after_kill) == 3

    # resume: prune finished partitions at the source
    pruned = CP.resume_filter(df, "part_key", manifest_dir)
    remaining = {r[0] for r in pruned.select("part_key").distinct().collect()}
    assert remaining == {3, 4, 5} - set()  # whatever wasn't committed
    assert not (remaining & set(done_after_kill))

    done = CP.run_resumable_validation(
        df, compiled, "part_key", manifest_dir, out_dir,
        lineage="run2", sketch_cols=("doc_id",))
    assert len(done) == 6
    # partitions finished before the kill kept their original lineage —
    # proof they were not re-run
    lineages = {pk: e.lineage for pk, e in done.items()}
    assert sorted(lineages.values()).count("run1") == 3
    assert sorted(lineages.values()).count("run2") == 3

    # final outputs identical to a clean single run
    resumed = _read_all_violations(spark, out_dir)
    clean_manifest, clean_out = str(tmp_path / "m2"), str(tmp_path / "o2")
    CP.run_resumable_validation(
        df, compiled, "part_key", clean_manifest, clean_out, lineage="clean")
    clean = _read_all_violations(spark, clean_out)
    assert sorted(map(tuple, resumed.collect())) == sorted(
        map(tuple, clean.collect()))

    # mergeable sketch state survives resume: union of saved HLLs ≈ exact
    est = CP.merged_cardinality(spark, manifest_dir, "doc_id")
    exact = df.select(F.countDistinct("doc_id")).collect()[0][0]
    assert abs(est - exact) / exact <= 0.05
    df.unpersist()


def test_resume_filter_keeps_null_partition_keys(spark, dirs):
    """ADVICE round-1: ~isin(done) is NULL for NULL keys and a plain filter
    silently DROPS them on resume — never-validated rows would be skipped
    forever.  NULL-keyed rows must survive the prune."""
    manifest_dir, _ = dirs
    CP.write_entry(manifest_dir, CP.PartitionEntry(
        part_key=0, docs=1, valid_docs=1, violation_rows=0, passed=True,
        lineage="x"))
    df = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", None)], "doc_id string, part_key int")
    kept = {r["doc_id"] for r in
            CP.resume_filter(df, "part_key", manifest_dir).collect()}
    assert kept == {"b", "c"}


def test_resumable_run_rejects_null_partition_keys(spark, dirs):
    manifest_dir, out_dir = dirs
    df = spark.createDataFrame(
        [("a", None)], "doc_id string, part_key int")
    compiled = compile_spec({"properties": {"doc_id": {"minLength": 1}}},
                            df.schema)
    with pytest.raises(ValueError, match="NULL"):
        CP.run_resumable_validation(df, compiled, "part_key", manifest_dir,
                                    out_dir)
