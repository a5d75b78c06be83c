"""Declarative dataset-level constraint section — one spec drives everything.

The north rule's spec carries BOTH row/span keywords (compiled by
``compiler.compile_spec``) and dataset-level constraints.  This module gives
the dataset side the same declarative shape, under the ``x-dataset`` key
(an ``x-`` extension keyword, so the row compiler treats it as an
annotation, exactly like the reference treats unknown keywords —
``compiler.rs:413-416``):

    {
      "properties": {...row/span keywords...},
      "x-dataset": {
        "columns": {                      # over the flattened span table
          "text":   {"max_null_rate": 0.8},
          "offset": {"min": 0, "max": 2147483647},
          "kind":   {"max_distinct": 8, "min_distinct": 2}
        },
        "unique": ["doc_id"],
        "referential": {
          "media_ref": {"catalog": "media_catalog", "key": "media_ref"}
        },
        "drift": {
          "chi2": {"column": "kind", "threshold": 27.0},
          "ks":   {"column": "offset", "threshold": 0.15, "bins": 64}
        }
      }
    }

``validate_dataset`` lowers the section onto the operator layer and emits a
single violation frame ``(scope, scope_key, constraint_id, observed)`` —
the dataset-side analogue of the row-level violation rows.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators import dataset as DS
from jsonschema_rs_spark.spec import SpecError

_OUT_COLS = ("scope", "scope_key", "constraint_id", "observed")


def _frame(df: DataFrame, scope: str, key_col, cid, observed) -> DataFrame:
    return df.select(
        F.lit(scope).alias("scope"),
        key_col.cast("string").alias("scope_key"),
        (F.lit(cid) if isinstance(cid, str) else cid).alias("constraint_id"),
        observed.cast("string").alias("observed"),
    )


def validate_dataset(
    flat: DataFrame,
    spec: dict[str, Any],
    part_col: str,
    catalogs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate an ``x-dataset`` section over the flattened span table.

    ``flat`` is one row per span (doc_id, part_key, span_index, kind, text,
    media_ref, offset) — the natural grain for column/distribution
    constraints.  Catalogs resolve referential targets by name.

    Emitted scopes: ``partition`` (stats + drift), ``key`` (uniqueness),
    ``ref`` (referential integrity).
    """
    ds = spec.get("x-dataset", spec if "columns" in spec or "unique" in spec
                  else {})
    catalogs = catalogs or {}
    frames: list[DataFrame] = []

    # ---- per-partition column stats (ONE fused agg) ----------------------
    cols = ds.get("columns", {})
    if cols:
        constraints = []
        for name, bounds in cols.items():
            constraints.append(DS.ColumnStatsConstraint(
                column=name,
                max_null_rate=bounds.get("max_null_rate"),
                min_value=bounds.get("min"),
                max_value=bounds.get("max"),
                max_distinct=bounds.get("max_distinct"),
                min_distinct=bounds.get("min_distinct"),
            ))
        v = DS.column_stats_verdicts(flat, constraints, part_col)
        frames.append(_frame(v, "partition", F.col(part_col),
                             F.col("constraint_id"), F.col("observed")))

    # ---- uniqueness -------------------------------------------------------
    for key in ds.get("unique", []):
        dup = DS.uniqueness_violations(flat, [key])
        frames.append(_frame(dup, "key", F.col(key),
                             f"dataset/unique/{key}", F.col("n_dups")))

    # ---- referential integrity -------------------------------------------
    for ref_col, target in ds.get("referential", {}).items():
        cat_name = target["catalog"]
        if cat_name not in catalogs:
            raise SpecError(
                f"referential constraint on {ref_col!r} needs catalog "
                f"{cat_name!r} (have: {sorted(catalogs)})")
        dangling = DS.referential_violations(
            flat, ref_col, catalogs[cat_name], target.get("key", ref_col))
        frames.append(_frame(dangling, "ref", F.col("media_ref"),
                             f"dataset/referential/{ref_col}",
                             F.col("n_refs")))

    # ---- distribution drift ------------------------------------------------
    drift = ds.get("drift", {})
    if "chi2" in drift:
        d = drift["chi2"]
        out = DS.chi_square_drift(flat, d["column"], part_col,
                                  threshold=d.get("threshold", 27.0))
        frames.append(_frame(out.filter(F.col("drifted")), "partition",
                             F.col(part_col),
                             f"dataset/drift_chi2/{d['column']}",
                             F.round("chi2", 4)))
    if "ks" in drift:
        d = drift["ks"]
        out = DS.ks_drift(flat, d["column"], part_col,
                          n_bins=d.get("bins", 64),
                          threshold=d.get("threshold", 0.15))
        frames.append(_frame(out.filter(F.col("drifted")), "partition",
                             F.col(part_col),
                             f"dataset/drift_ks/{d['column']}",
                             F.round("ks_stat", 4)))

    if not frames:
        raise SpecError("x-dataset section is empty")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
