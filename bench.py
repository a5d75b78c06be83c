"""Benchmark: documents validated/sec under the full constraint suite.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:
{"metric": ..., "value": seconds, "unit": "sec", "queries": {...}, "sf": ...}

The input is the deterministic span derivation amplified by
$SPARK_GRAFT_REPLICATE (default 20) so the flagship measurement covers
~100k docs / ~10M spans; throughputs (docs/sec, spans/sec) are included
alongside per-query wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0

    from pyspark.sql import functions as F

    from jsonschema_rs_spark.session import get_spark
    from jsonschema_rs_spark.compiler import compile_spec
    from jsonschema_rs_spark.flagship import FLAGSHIP_SPEC
    from jsonschema_rs_spark.plans.validate import (
        partition_rollup,
        validation_frame,
        violations,
    )
    from jsonschema_rs_spark.sources.spans import derive_spans
    import __spark_entry__ as E

    spark = get_spark(app="bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    df = derive_spans(spark, sf_dir, replicate=replicate)
    # materialize the amplified input once so timings measure the ENGINE,
    # not the synthetic generator; 2 files per core so the scan parallelizes
    # fully (one ~100 MB parquet would give 32 cores only 2 splits)
    df.repartition(cpus * 2).write.mode("overwrite").parquet(
        "/tmp/bench_spans.parquet")
    df = spark.read.parquet("/tmp/bench_spans.parquet")
    n_docs = df.count()
    n_spans = df.select(F.sum(F.size("spans"))).collect()[0][0]
    compiled = compile_spec(FLAGSHIP_SPEC, df.schema)

    timings: dict[str, float] = {}

    def _force(frame) -> None:
        # noop sink: forces FULL evaluation of every column (a bare count()
        # lets Catalyst prune computed columns and measures nothing)
        frame.write.format("noop").mode("overwrite").save()

    def timed(name: str, fn, repeat: int = 1) -> None:
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # warm the JVM/codegen once on a small slice
    _force(validation_frame(df.limit(1000), compiled, mode="both"))

    # plans are built ONCE outside the timed region — driver-side expression
    # construction is a per-job compile cost (the same plan validates all
    # 100 TB on a real cluster); timings measure per-byte execution
    from jsonschema_rs_spark.plans.validate import verdicts as _verdicts

    verdicts_df = _verdicts(df, compiled)  # default: single-scan exploded agg
    verdicts_hof_df = validation_frame(df, compiled, mode="verdicts")
    verdicts_pf_df = _verdicts(df, compiled, strategy="prefilter")
    violations_df = violations(df, compiled)
    rollup_df = partition_rollup(df, compiled, "part_key")

    # HEADLINE PAIR — measured INTERLEAVED (round 5): the shared host shows
    # 3-10x co-tenant swings, and sequential min-of-3 blocks let a noisy
    # window inflate exactly one of the two plans (BENCH_r04 recorded a
    # 2.29x verdict/violations ratio that a controlled A/B attributed to
    # load).  Alternating rounds hit both plans with the same conditions;
    # all samples land in the record so the distribution is auditable.
    # verdicts_fast_path IS the 'exploded' strategy since round 3 (the
    # default flipped per BENCH_r02: exploded 1.06s vs prefilter 6.03s).
    rounds = int(os.environ.get("SPARK_GRAFT_HEADLINE_ROUNDS", "11"))
    samples: dict[str, list[float]] = {"verdicts_fast_path": [],
                                       "violations_full": []}

    def _one(frame) -> float:
        t0 = time.perf_counter()
        _force(frame)
        return time.perf_counter() - t0

    # full warm pass for the headline pair (cold codegen + page-cache fill
    # would otherwise burn an entire round)
    _one(violations_df)
    _one(verdicts_df)
    for r in range(rounds):
        pair = [("violations_full", violations_df),
                ("verdicts_fast_path", verdicts_df)]
        if r % 2:
            pair.reverse()  # alternate order: neither always pays first
        for name, frame in pair:
            samples[name].append(round(_one(frame), 3))
    for name, ss in samples.items():
        timings[name] = min(ss)
    # verdict/violations ratio: the PAIRED estimator.  Co-tenant load is
    # round-correlated (the two plans run back-to-back inside a round), so
    # the per-round ratio cancels it; the median of per-round ratios is
    # robust where min(verdict)/min(violations) compares two DIFFERENT
    # load windows and can report an arbitrary number under a volatile
    # host (each round's pair shares its window; the mins usually don't).
    per_round = sorted(
        v / f for v, f in zip(samples["verdicts_fast_path"],
                              samples["violations_full"]))
    paired_ratio = per_round[len(per_round) // 2] if len(per_round) % 2 \
        else (per_round[len(per_round) // 2 - 1]
              + per_round[len(per_round) // 2]) / 2
    timed("verdicts_hof", lambda: _force(verdicts_hof_df), repeat=2)
    timed("verdicts_prefilter", lambda: _force(verdicts_pf_df), repeat=2)
    timed("partition_rollup", lambda: rollup_df.collect(), repeat=2)

    # representative entry queries at the raw sf (no amplification);
    # plan build included here (it is part of each query's cost).
    # best-of-3: this shared host shows 3-10x co-tenant wall-time swings
    # (BENCH_r02's unexplained entry regressions were best-of-2 artifacts)
    for name in ("ds_chi2_drift", "ds_ref_integrity", "txt_stats",
                 "dedup_minhash_lsh", "dedup_simhash", "sim_topk",
                 "kw_unique_items", "apply_basic", "ds_psi_drift",
                 "dedup_components"):
        fn = E.queries()[name]
        timed(name, lambda _f=fn: _force(_f(spark, sf_dir)), repeat=3)

    flagship_sec = timings["violations_full"]
    out = {
        "metric": "flagship full-suite violations wall time "
                  f"({n_docs} docs, {n_spans} spans)",
        "value": flagship_sec,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs": n_docs,
        "spans": int(n_spans),
        "docs_per_sec": round(n_docs / flagship_sec, 1),
        "spans_per_sec": round(n_spans / flagship_sec, 1),
        "docs_per_sec_verdict_only": round(
            n_docs / timings["verdicts_fast_path"], 1),
        "verdict_violations_ratio": round(
            timings["verdicts_fast_path"] / timings["violations_full"], 2),
        # paired per-round median — auxiliary load-robust estimator (see
        # the comment at the measurement site): under co-tenant load the
        # two mins can come from different load windows; the paired
        # median shows the back-to-back steady-state relation
        "verdict_violations_ratio_paired": round(paired_ratio, 2),
        "headline_samples": samples,
        "cpus": cpus,
        "replicate": replicate,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
