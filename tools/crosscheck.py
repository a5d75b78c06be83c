"""Driver-style correctness gate: run every ``queries()`` entry on Spark and
its ``oracle_sql()`` in DuckDB at a given sf_dir, compare row sets.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 7)
    if hasattr(v, "item"):
        v = v.item()
        if isinstance(v, float):
            return round(v, 7)
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as E
    from jsonschema_rs_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            failures.append(name)
            continue
        s_set, s_order = rowset(scols, srows)
        d_set, d_order = rowset(dcols, drows)
        if s_order != d_order:
            print(f"FAIL {name}: column mismatch spark={s_order} duck={d_order}")
            failures.append(name)
            continue
        if s_set == d_set:
            print(f"PASS {name}: {len(s_set)} rows")
        else:
            sonly = [r for r in s_set if r not in set(d_set)][:3]
            donly = [r for r in d_set if r not in set(s_set)][:3]
            print(f"FAIL {name}: rows spark={len(s_set)} duck={len(d_set)}")
            print(f"  spark-only: {sonly}")
            print(f"  duck-only:  {donly}")
            failures.append(name)
    print("\n==", "ALL PASS" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
