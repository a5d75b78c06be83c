"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``cosine_topk``       — brute-force exact top-k: broadcast the (small)
                          query set against the corpus, dot products via
                          ``F.zip_with`` + ``F.aggregate`` (JVM-side, no
                          Python), per-query top-k via window rank over the
                          scored frame.  Exact baseline; O(Q × N).
- ``lsh_ann_topk``      — random-hyperplane LSH: sign-bit signatures bucket
                          the corpus; queries only score candidates sharing
                          a band bucket.  The scale path: the corpus-side
                          shuffle key is the bucket, queries broadcast.
- ``near_duplicates_cosine`` — embedding near-dup pairs within LSH buckets
                          (the embedding-space analogue of minhash dedup).

Hyperplanes are generated on the driver from a fixed seed (numpy
RandomState) and injected as literals, so runs are deterministic and
restart-stable.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, vec_id, rank, cos)``.

    The query side is broadcast (ANN queries are a dimension table); the
    corpus is scanned once; ranking shuffles only (query_id, vec_id, cos)
    triples.  Deterministic tie-break on vec_id.

    Norms are HOISTED below the join (round 6): ``norm`` folds the vector
    with an interpreted HOF, so computing it inside the per-pair cosine
    paid it Q times per corpus row (and per band-candidate in the ANN
    paths).  Each side computes its own norm once; the join cannot inline
    projections across itself, so the hoist survives optimization.  The
    per-pair expression is the same dot / (norm_a * norm_b) tree reading
    the factors through attributes — bit-identical results."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).select("vec_id", "v", norm(F.col("v")).alias("_nv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).select("query_id", "qv", norm(F.col("qv")).alias("_nq"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (dot(F.col("v"), F.col("qv"))
         / (F.col("_nv") * F.col("_nq"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).tolist()


def data_hyperplanes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ids: Sequence[int] = tuple(range(10, 26)),
) -> list[list[float]]:
    """Hyperplanes taken from corpus vectors at fixed ids.

    A data-dependent LSH variant whose planes are reproducible from the
    table alone — which makes the whole signature → band-bucket → rerank
    pipeline expressible in plain SQL for value-level oracle checks.  For
    zero-centered embeddings, corpus directions are as locality-sensitive
    as random gaussians (they ARE draws from the data distribution)."""
    rows = {
        r["id"]: r["v"]
        for r in corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).filter(F.col(id_col).isin(*list(ids))).collect()
    }
    return [[float(x) for x in rows[i]] for i in ids]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit p = 1 iff <vec, plane_p> >= 0."""
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0
        ).cast("int")
        for plane in planes
    ]
    return F.concat(*[b.cast("string") for b in bits])


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    seed: int = 7,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH band bucket.

    Corpus → (band, bucket, id, vec); queries → same buckets, broadcast;
    join on (band, bucket) prunes the candidate set, then exact cosine +
    rank.  Recall is tunable via n_planes/bands (tested vs cosine_topk).
    Pass ``planes`` explicitly (e.g. ``data_hyperplanes``) to skip the
    driver-side dim probe and keep the pipeline SQL-reproducible."""
    if planes is None:
        if dim is None:
            dim = len(corpus.select(vec_col).first()[0])
        planes = _hyperplanes(dim, n_planes, seed)
    n_planes = len(planes)
    per_band = n_planes // bands

    def buckets(df: DataFrame, idc: str) -> DataFrame:
        sig = lsh_signature(F.col(vec_col), planes)
        out = df.withColumn("_sig", sig)
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.substring(F.col("_sig"), b * per_band + 1, per_band).alias(
                    "bucket"
                ),
            )
            for b in range(bands)
        ]
        return out.select(
            F.col(idc),
            F.col(vec_col),
            F.explode(F.array(*band_structs)).alias("bb"),
        ).select(
            idc,
            vec_col,
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )

    cb = buckets(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)), "vec_id"
    )
    qb = buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col)),
        "query_id",
    ).withColumnRenamed(vec_col, "qv")
    # Score each band-join candidate row MAP-SIDE, then dedupe band
    # duplicates with a combinable agg on (query_id, vec_id): the shuffle
    # carries narrow (ids, cos) rows only.  The previous `.distinct()` over
    # rows including v/qv shipped every duplicate's full embedding through
    # the exchange — at 100 TB of embeddings that dominates the job.  A
    # pair's cos is deterministic across bands, so max() == the value; the
    # ≤`bands`-fold re-scoring stays in codegen and never touches the wire.
    # hoist _as_double + norm below the join (round 6): interpreted HOF
    # folds run once per row per side instead of once per band candidate;
    # same dot/(norm*norm) tree per pair, read through attributes
    cb = cb.select(
        "vec_id", "band", "bucket",
        _as_double(F.col(vec_col)).alias("_v"),
    ).select("vec_id", "band", "bucket", "_v", norm(F.col("_v")).alias("_nv"))
    qb = qb.select(
        "query_id", "band", "bucket", _as_double(F.col("qv")).alias("_qv"),
    ).select("query_id", "band", "bucket", "_qv",
             norm(F.col("_qv")).alias("_nq"))
    scored = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .select(
            "query_id",
            "vec_id",
            (dot(F.col("_v"), F.col("_qv"))
             / (F.col("_nv") * F.col("_nq"))).alias("cos"),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _centroids(corpus: DataFrame, id_col: str, vec_col: str,
               n_centroids: int) -> list[tuple[int, list[float]]]:
    """Deterministic baseline centroid set: the n lowest-id corpus vectors.

    SQL-expressible by construction, so the IVF pipeline built on it has a
    full DuckDB value-level oracle.  ``kmeans_centroids`` below is the
    quality quantizer for production use (same literal-injection shape)."""
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(n_centroids)
        .collect()
    )
    return [(i, [float(x) for x in r["v"]]) for i, r in enumerate(rows)]


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 7,
    sample_n: int = 4096,
    iters: int = 10,
) -> list[tuple[int, list[float]]]:
    """Sampled Lloyd's k-means quantizer, deterministic and restart-stable.

    A fixed-seed corpus sample (one narrow scan, bounded driver memory) is
    refined with ``iters`` Lloyd steps in numpy on the driver; centroids
    come back as plain literals, exactly like ``_centroids``, so
    ``ivf_ann_topk(..., centroids=...)`` is unchanged.  At 100 TB this is
    the right split: quantizer quality needs only a sample, while bucket
    ASSIGNMENT (the full-corpus pass) stays distributed.  Pick
    ``k ≈ sqrt(N)`` for balanced bucket sizes."""
    frac_rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id").cast("string"), F.lit(seed)))
        .limit(sample_n)
        .collect()
    )
    X = np.array([[float(x) for x in r["v"]] for r in frac_rows])
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        # assign to nearest centroid by max dot (cosine-style IVF)
        assign = np.argmax(X @ cents.T, axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [(i, [float(x) for x in c]) for i, c in enumerate(cents)]


def _nearest_centroid_cols(vec: Column, cents) -> Column:
    """Array of (negative dot product, centroid_id) structs — JVM-side.

    The DISTANCE is the FIRST struct field: Spark orders structs
    field-by-field, so array_min/array_sort rank by ndot (nearest first)
    with cid as the deterministic tie-break.  (Round-1 had cid first, which
    silently degenerated every assignment to bucket 0.)"""
    return F.array(
        *[
            F.struct(
                (-dot(_as_double(vec),
                      F.array(*[F.lit(x) for x in cv]))).alias("ndot"),
                F.lit(cid).alias("cid"),
            )
            for cid, cv in cents
        ]
    )


def ivf_assign(df: DataFrame, vec_col: str, cents) -> DataFrame:
    """Add ``bucket`` = argmax dot-product centroid (coarse quantizer)."""
    dists = _nearest_centroid_cols(F.col(vec_col), cents)
    best = F.array_min(dists)  # min ndot = max dot; cid tie-break
    return df.withColumn("bucket", best.getField("cid"))


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid (one
    narrow pass), queries probe their ``nprobe`` nearest buckets; exact
    cosine only within probed buckets.

    Scale shape: the corpus-side cost is one scan + small shuffle on the
    bucket key; query fan-out is nprobe buckets; centroids are driver
    literals (broadcast implicitly in the expression).  Pass
    ``centroids=kmeans_centroids(...)`` for the quality quantizer (size it
    ~sqrt(N)); the default lowest-id baseline is SQL-reproducible for the
    value-level oracle."""
    cents = centroids or _centroids(corpus, id_col, vec_col, n_centroids)
    cb = ivf_assign(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)), vec_col,
        cents,
    )
    # queries: explode nprobe nearest buckets
    qd = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.slice(
            F.array_sort(_nearest_centroid_cols(F.col(vec_col), cents)),
            1,
            nprobe,
        ).alias("_probes"),
    )
    qb = qd.select(
        "query_id", "qv",
        F.explode(F.col("_probes").getField("cid")).alias("bucket"),
    )
    # hoisted _as_double + norm per side (round 6) — see lsh_ann_topk
    cb = cb.select(
        "vec_id", "bucket", _as_double(F.col(vec_col)).alias("_v"),
    ).select("vec_id", "bucket", "_v", norm(F.col("_v")).alias("_nv"))
    qb = qb.select(
        "query_id", "bucket", _as_double(F.col("qv")).alias("_qv"),
    ).select("query_id", "bucket", "_qv", norm(F.col("_qv")).alias("_nq"))
    cand = cb.join(F.broadcast(qb), "bucket").select(
        "query_id", "vec_id",
        (dot(F.col("_v"), F.col("_qv"))
         / (F.col("_nv") * F.col("_nq"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


def near_duplicates_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    seed: int = 7,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (cos ≥ threshold) found within LSH buckets.

    Pass ``planes`` (e.g. ``data_hyperplanes``) to skip the driver-side dim
    probe and keep the pipeline SQL-reproducible for oracle checks."""
    if planes is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = _hyperplanes(dim, n_planes, seed)
    n_planes = len(planes)
    per_band = n_planes // bands
    sig = lsh_signature(F.col(vec_col), planes)
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "_sig", sig if vec_col == "v" else lsh_signature(F.col("v"), planes)
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring(F.col("_sig"), b * per_band + 1, per_band).alias("bucket"),
        )
        for b in range(bands)
    ]
    # _as_double + norm computed ONCE per id BEFORE the band explode
    # (round 6): the interpreted HOF folds would otherwise re-run per band
    # row and per join candidate; same per-pair expression tree via
    # attributes, bit-identical cos
    base = base.select(
        "id", _as_double(F.col("v")).alias("_vd"), "_sig"
    ).select("id", "_vd", norm(F.col("_vd")).alias("_nv"), "_sig")
    buckets = base.select(
        "id", "_vd", "_nv", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "_vd", "_nv", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    # Score inside the bucket join and THRESHOLD before the dedup shuffle:
    # only narrow (id_a, id_b, cos) rows that already pass the threshold
    # cross the exchange, and band duplicates collapse in a map-side
    # combinable agg.  (Previously `.distinct()` shuffled full va/vb
    # vectors per band duplicate.)  cos is deterministic per pair across
    # bands, so max() == the value.
    return (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot(F.col("a._vd"), F.col("b._vd"))
             / (F.col("a._nv") * F.col("b._nv"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .groupBy("id_a", "id_b")
        .agg(F.max("cos").alias("cos"))
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
