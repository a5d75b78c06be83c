"""Validation plan assembly — one scan, one fused projection, zero shuffles.

Physical design (the 100-TB argument):

- ALL constraints fuse into a single ``select`` over a single scan — the
  plan-level analogue of the reference's fused keyword variants and the
  shared-scan batching idea (LMFAO).  Catalyst prunes the scan to exactly the
  columns the constraints touch.
- Span (element) constraints evaluate inside array higher-order functions
  (``transform``/``filter``/``forall``) — per-doc regrouping is implicit in
  the array value, so there is **no explode → groupBy(doc_id) shuffle**.
  A single narrow ``explode`` materializes violation rows only at the very
  end, only for violating (constraint, element) pairs.
- The verdict-only mode builds pure boolean expressions and never constructs
  violation structs — the analogue of the reference's allocation-free
  ``is_valid`` path (``validator.rs:28-89``); ``observed`` strings are only
  computed under ``F.when(violated, ...)`` (analogue of the reference's lazy
  error paths, ``paths.rs:24-58``).
- Everything is whole-stage-codegen-able Column algebra; pandas UDFs appear
  only for the few formats/patterns that need Python, batched via Arrow.

Scaling: a plan with no wide dependency scales linearly in partition count;
the only requirement is sane input split sizing
(``spark.sql.files.maxPartitionBytes``), which the session helper sets.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

from jsonschema_rs_spark.compiler import CompiledSpec

VIOLATION_STRUCT = StructType(
    [
        StructField("constraint_id", StringType()),
        StructField("span_index", IntegerType()),
        StructField("observed", StringType()),
    ]
)
_EMPTY_VIOLS = "array<struct<constraint_id:string,span_index:int,observed:string>>"


def _root(df: DataFrame) -> Column:
    # Catalyst's SimplifyExtractValueOps collapses GetStructField(CreateStruct)
    # so this costs nothing at runtime.
    return F.struct(*[F.col(c).alias(c) for c in df.columns])


def _viol_struct(cid: str, span_index: Column, observed: Column) -> Column:
    return F.struct(
        F.lit(cid).alias("constraint_id"),
        span_index.cast("int").alias("span_index"),
        observed.cast("string").alias("observed"),
    )


def violations_column(compiled: CompiledSpec, root: Column) -> Column:
    """Array<violation> column for one document."""
    parts: list[Column] = []

    # doc-scope constraints: violation struct only materializes when violated
    for c in compiled.constraints:
        if c.scope != "doc":
            continue
        ok = F.coalesce(c.pred(root), F.lit(True))
        parts.append(
            F.when(
                ~ok,
                F.array(_viol_struct(c.constraint_id,
                                     F.lit(None).cast("int"),
                                     c.observed(root))),
            ).otherwise(F.expr("array()").cast(_EMPTY_VIOLS))
        )

    # element-scope constraints, fused per array: ONE transform evaluates
    # every element constraint per element (single traversal of the array)
    by_array: dict[tuple, list] = {}
    for c in compiled.constraints:
        if c.scope == "element":
            by_array.setdefault(c.array_key, []).append(c)
    def _per_elem_fn(group):
        def per_elem(x: Column, i: Column) -> Column:
            cells = [
                F.when(
                    ~F.coalesce(c.pred(x, i), F.lit(True)),
                    _viol_struct(c.constraint_id, i, c.observed(x, i)),
                )
                for c in group
            ]
            return F.filter(F.array(*cells), lambda v: v.isNotNull())

        return per_elem

    for key, group in by_array.items():
        arr = group[0].array(root)
        parts.append(
            F.coalesce(F.flatten(F.transform(arr, _per_elem_fn(tuple(group)))),
                       F.expr("array()").cast(_EMPTY_VIOLS))
        )

    if not parts:
        return F.expr("array()").cast(_EMPTY_VIOLS)
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def valid_column(compiled: CompiledSpec, root: Column) -> Column:
    """Boolean verdict without violation allocation (is_valid fast path)."""
    ok = F.lit(True)
    for c in compiled.constraints:
        if c.scope != "doc":
            continue
        ok = ok & F.coalesce(c.pred(root), F.lit(True))
    by_array: dict[tuple, list] = {}
    for c in compiled.constraints:
        if c.scope == "element":
            by_array.setdefault(c.array_key, []).append(c)
    def _elem_ok_fn(group):
        def elem_ok(x: Column, i: Column) -> Column:
            e = F.lit(True)
            for c in group:
                e = e & F.coalesce(c.pred(x, i), F.lit(True))
            return e

        return elem_ok

    for key, group in by_array.items():
        arr = group[0].array(root)
        ok = ok & F.coalesce(
            F.forall(F.transform(arr, _elem_ok_fn(tuple(group))), lambda b: b),
            F.lit(True),
        )
    return ok


def validation_frame(
    df: DataFrame,
    compiled: CompiledSpec,
    id_cols: Sequence[str] = ("doc_id",),
    keep_cols: Sequence[str] = (),
    mode: str = "both",
) -> DataFrame:
    """``(id_cols..., keep_cols..., [valid], [violations])`` in one projection."""
    root = _root(df)
    cols = [F.col(c) for c in (*id_cols, *keep_cols)]
    if mode == "verdicts":
        cols.append(valid_column(compiled, root).alias("valid"))
    elif mode == "violations":
        cols.append(violations_column(compiled, root).alias("violations"))
    elif mode == "both":
        v = violations_column(compiled, root)
        cols.append(v.alias("violations"))
        cols.append((F.size(v) == 0).alias("valid"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.select(*cols)


def verdicts(df: DataFrame, compiled: CompiledSpec,
             id_cols: Sequence[str] = ("doc_id",)) -> DataFrame:
    return validation_frame(df, compiled, id_cols, mode="verdicts")


def violations(df: DataFrame, compiled: CompiledSpec,
               id_cols: Sequence[str] = ("doc_id",)) -> DataFrame:
    """Violation rows ``(id_cols..., constraint_id, span_index, observed)``.

    The explode is narrow (no shuffle) and emits rows only for actual
    violations — valid documents contribute nothing.
    """
    vf = validation_frame(df, compiled, id_cols, mode="violations")
    v = F.explode(F.col("violations")).alias("v")
    return vf.select(*[F.col(c) for c in id_cols], v).select(
        *[F.col(c) for c in id_cols],
        F.col("v.constraint_id").alias("constraint_id"),
        F.col("v.span_index").alias("span_index"),
        F.col("v.observed").alias("observed"),
    )


def partition_rollup(
    df: DataFrame,
    compiled: CompiledSpec,
    part_col: str,
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-partition pass/fail + counters (analogue of ``apply().basic()``
    rollup).  The single shuffle here is the partition-key agg, which AQE
    coalesces; per-doc work is still shuffle-free."""
    vf = validation_frame(df, compiled, id_cols, keep_cols=(part_col,),
                          mode="both")
    return (
        vf.groupBy(part_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("valid").cast("long")).alias("valid_docs"),
            F.sum(F.size("violations").cast("long")).alias("violation_rows"),
        )
        .withColumn("pass", F.col("valid_docs") == F.col("docs"))
    )
