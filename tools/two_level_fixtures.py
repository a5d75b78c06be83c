"""Replay every keyword fixture at two parallelism levels in FRESH JVMs
(north star: identical violation rows per partition at both N and 4N
cluster sizes).

Usage:
  python tools/two_level_fixtures.py          # compare local[2] vs local[8]
  python tools/two_level_fixtures.py --run N OUT.json   # child
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

FIXTURE_DIR = "/root/repo/fixtures"


def child(cores: int, out_path: str) -> None:
    from jsonschema_rs_spark.session import get_spark
    from jsonschema_rs_spark.compiler import compile_spec
    from jsonschema_rs_spark.plans.validate import validation_frame
    from jsonschema_rs_spark.sources.spans import SPAN_TABLE_SCHEMA

    spark = get_spark(app=f"fixtures-{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.json"))):
        with open(path) as f:
            cases = json.load(f)
        for case in cases:
            rows = [dict(t["data"]) for t in case["tests"]]
            for r in rows:
                r.setdefault("part_key", 0)
            tbl = case.get("columns", SPAN_TABLE_SCHEMA)
            df = spark.createDataFrame(rows, tbl).repartition(cores)
            compiled = compile_spec(case["schema"], df.schema)
            vf = validation_frame(df, compiled, keep_cols=("part_key",),
                                  mode="both")
            out = []
            for row in vf.collect():
                for v in row["violations"]:
                    out.append([row["part_key"], row["doc_id"],
                                v["constraint_id"], v["span_index"],
                                v["observed"]])
                out.append([row["part_key"], row["doc_id"], "__valid__",
                            None, str(row["valid"])])
            key = f"{os.path.basename(path)}::{case['description']}"
            results[key] = sorted(out, key=lambda t: [str(x) for x in t])
    with open(out_path, "w") as f:
        json.dump(results, f, sort_keys=True)
    spark.stop()


def main() -> int:
    if len(sys.argv) > 3 and sys.argv[1] == "--run":
        child(int(sys.argv[2]), sys.argv[3])
        return 0
    outs = {}
    for cores in (2, 8):
        path = f"/tmp/fixture_rows_{cores}.json"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cores),
             path],
            capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:])
            return 1
        with open(path) as f:
            outs[cores] = json.load(f)
    if outs[2] == outs[8]:
        n_cases = len(outs[2])
        n_rows = sum(len(v) for v in outs[2].values())
        print(f"IDENTICAL: {n_cases} fixture cases, {n_rows} "
              "verdict/violation rows at local[2] and local[8]")
        return 0
    diff = {k for k in outs[2] if outs[2].get(k) != outs[8].get(k)}
    print("MISMATCH in:", sorted(diff))
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
