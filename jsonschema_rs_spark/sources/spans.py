"""Interleaved text+media span-table sources.

Two sources of the north-rule input shape
``(doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>)``:

1. ``derive_spans`` — a DETERMINISTIC, SQL-expressible derivation from the
   driver-provided ``documents.parquet``.  The same arithmetic is emitted as
   a DuckDB CTE (``SPANS_CTE_SQL``) so every span-level constraint query has
   a full value-level oracle at any scale factor.  Violations are planted by
   construction (see the ``m``-residue rules below).

2. ``synth_spans`` — the seeded generator from FIXTURES.md §1: richer
   interleaving, Zipf-skewed kinds, a hot partition, planted violation sets
   computable in closed form.  Used by pytest and bench.

Derivation rules (shared by both engines; j is the 1-based span position):

    m          = (raw_doc_id * 31 + j) % 101
    kind       = 'video' if m % 13 == 0       -- planted enum violation
                 'image' if m % 7  == 0
                 'audio' if m % 11 == 0
                 else 'text'
    text       = word_j if kind = 'text' else NULL
    media_ref  = 'media://' || (raw_doc_id*97 + j*13) % 4096  if kind<>'text'
    offset     = -j if m = 17                 -- planted minimum violation
                 else (j-1)*8
    doc_id     = 'doc-' || lpad(raw_doc_id, 12, '0')
    part_key   = raw_doc_id % 32
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

SPAN_TABLE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT)),
        StructField("part_key", IntegerType()),
    ]
)


def _span_field_exprs(raw: Column, j: Column, w: Column) -> dict[str, Column]:
    """The shared span-derivation arithmetic (docstring rules) as Columns.

    Used by BOTH the array-building ``derive_spans`` (inside the transform
    lambda, where ``j``/``w`` are lambda variables) and the flattened
    ``flat_spans`` (where they are exploded columns) so the two sources can
    never drift."""
    m = (raw * 31 + j) % 101
    kind = (
        F.when(m % 13 == 0, F.lit("video"))
        .when(m % 7 == 0, F.lit("image"))
        .when(m % 11 == 0, F.lit("audio"))
        .otherwise(F.lit("text"))
    )
    return {
        "kind": kind,
        "text": F.when(kind == "text", w),
        "media_ref": F.when(
            kind != "text",
            F.concat(F.lit("media://"),
                     ((raw * 97 + j * 13) % 4096).cast("string")),
        ),
        "offset": F.when(m == 17, -j).otherwise((j - 1) * 8).cast("int"),
    }


def _split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet spread across cores when it arrives under-split.

    The single-file (single-row-group) sandbox parquet yields 1-2 scan
    splits, starving every core; real 100-TB inputs arrive pre-split and
    skip the shuffle."""
    from jsonschema_rs_spark.session import est_scan_splits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    # stats-based split estimate (round 6): df.rdd.getNumPartitions()
    # forced physical planning + RDD conversion (~0.7s driver stall) on
    # EVERY span-source build
    if est_scan_splits(docs) < par // 2:
        docs = docs.repartition(par)
    return docs


def derive_spans(spark: SparkSession, sf_dir: str,
                 replicate: int = 1) -> DataFrame:
    """Span table derived from ``{sf_dir}/documents.parquet``.

    ``replicate > 1`` amplifies volume deterministically for benchmarking:
    each source doc is cloned with shifted ids (doc_id stays unique).
    """
    docs = _split_docs(spark, sf_dir)
    if replicate > 1:
        docs = docs.crossJoin(
            spark.range(replicate).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
            "text",
        )
    # keep the raw id under a private name so the lambda below can't capture
    # the formatted output alias by accident
    docs = docs.select(F.col("doc_id").alias("_raw"), "text")
    raw = F.col("_raw")
    words = F.split(F.col("text"), " ")

    def span(w: Column, i: Column) -> Column:
        fields = _span_field_exprs(raw, i + F.lit(1), w)
        return F.struct(*[c.alias(n) for n, c in fields.items()])

    return docs.select(
        F.format_string("doc-%012d", raw).alias("doc_id"),
        F.transform(words, span).alias("spans"),
        (raw % 32).cast("int").alias("part_key"),
    )


# The same derivation as a DuckDB CTE over the pre-registered ``documents``
# view, flattened to one row per span (position ``span_index`` is 0-based to
# match the engine's violation rows).
SPANS_CTE_SQL = """
WITH _d AS (
    SELECT doc_id AS raw_id, string_split(text, ' ') AS ws FROM documents
),
_s AS (
    SELECT raw_id, ws[u.i] AS w, u.i AS j,
           (raw_id * 31 + u.i) % 101 AS m
    FROM _d, unnest(range(1, len(ws) + 1)) AS u(i)
),
spans AS (
    SELECT
        'doc-' || lpad(CAST(raw_id AS VARCHAR), 12, '0') AS doc_id,
        CAST(raw_id % 32 AS INTEGER) AS part_key,
        CAST(j - 1 AS INTEGER) AS span_index,
        CASE WHEN m % 13 = 0 THEN 'video'
             WHEN m % 7  = 0 THEN 'image'
             WHEN m % 11 = 0 THEN 'audio'
             ELSE 'text' END AS kind,
        CASE WHEN m % 13 <> 0 AND m % 7 <> 0 AND m % 11 <> 0
             THEN w ELSE NULL END AS text,
        CASE WHEN m % 13 = 0 OR m % 7 = 0 OR m % 11 = 0
             THEN 'media://' || CAST((raw_id * 97 + j * 13) % 4096 AS VARCHAR)
             ELSE NULL END AS media_ref,
        CASE WHEN m = 17 THEN CAST(-j AS INTEGER)
             ELSE CAST((j - 1) * 8 AS INTEGER) END AS "offset"
    FROM _s
)
"""


def flat_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived table flattened to one row per span (mirror of the oracle
    CTE's ``spans``), for queries whose natural shape is per-span.

    Explodes the WORD LIST and derives span fields as plain projections over
    the exploded rows (round 6): array higher-order functions are
    CodegenFallback in Spark, so building the struct array with ``transform``
    only to flatten it again paid an interpreted per-element lambda for
    every span.  Same rows (``_span_field_exprs`` is shared with
    ``derive_spans``), full whole-stage codegen."""
    docs = _split_docs(spark, sf_dir)
    raw = F.col("_raw")
    ex = docs.select(
        F.col("doc_id").alias("_raw"),
        F.posexplode(F.split(F.col("text"), " ")).alias("_i", "_w"),
    )
    fields = _span_field_exprs(raw, F.col("_i") + F.lit(1), F.col("_w"))
    return ex.select(
        F.format_string("doc-%012d", raw).alias("doc_id"),
        (raw % 32).cast("int").alias("part_key"),
        F.col("_i").cast("int").alias("span_index"),
        *[c.alias(n) for n, c in fields.items()],
    )


# --------------------------------------------------------------------------
# synthetic generator (FIXTURES.md §1) — pytest/bench input
# --------------------------------------------------------------------------

_KINDS = ["text", "image", "audio", "video", "table"]
_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega näive 文字 пример"
).split()


def synth_rows(n_docs: int, seed: int = 42, n_parts: int = 16):
    """Pure-Python deterministic rows with planted violations.

    Returns (rows, expected) where ``expected`` maps violation class →
    set of (doc_id, span_index) computable in closed form.
    """
    import random

    rng = random.Random(seed)
    rows = []
    expected = {
        "enum_kind": set(),
        "neg_offset": set(),
        "empty_spans": set(),
        "dup_doc_id": set(),
        "null_kind": set(),
    }
    for i in range(n_docs):
        doc_id = f"doc-{i:012d}"
        # hot partition: ~10x mass on part 0
        part = 0 if rng.random() < 0.25 else rng.randrange(n_parts)
        n_spans = rng.randrange(0, 33)
        if n_spans == 0:
            expected["empty_spans"].add((doc_id, None))
        spans = []
        offset = 0
        for j in range(n_spans):
            # Zipf-ish skew over kinds
            r = rng.random()
            kind = _KINDS[0] if r < 0.6 else _KINDS[
                1 + min(int((r - 0.6) / 0.4 * 4), 3)]
            text = None
            media_ref = None
            if kind == "text":
                text = " ".join(
                    rng.choice(_WORDS) for _ in range(rng.randrange(1, 9)))
            else:
                media_ref = f"media://{rng.randrange(4096)}"
            off = offset
            if rng.random() < 0.01:
                off = -1 - j
                expected["neg_offset"].add((doc_id, j))
            if rng.random() < 0.005:
                kind = "hologram"  # outside enum
                expected["enum_kind"].add((doc_id, j))
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref,
                 "offset": off})
            offset += len(text or "") + 1
        rows.append({"doc_id": doc_id, "spans": spans, "part_key": part})
        if rng.random() < 0.001:
            rows.append({"doc_id": doc_id, "spans": spans, "part_key": part})
            expected["dup_doc_id"].add((doc_id, None))
    return rows, expected


def synth_spans(spark: SparkSession, n_docs: int, seed: int = 42,
                n_parts: int = 16) -> DataFrame:
    rows, _ = synth_rows(n_docs, seed, n_parts)
    return spark.createDataFrame(rows, SPAN_TABLE_SCHEMA)
