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
    triples.  Deterministic tie-break on vec_id."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine(F.col("v"), F.col("qv")).alias("cos"),
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
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH band bucket.

    Corpus → (band, bucket, id, vec); queries → same buckets, broadcast;
    join on (band, bucket) prunes the candidate set, then exact cosine +
    rank.  Recall is tunable via n_planes/bands (tested vs cosine_topk)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
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
    cand = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .select("query_id", "vec_id", F.col(vec_col).alias("v"), "qv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine(_as_double(F.col("v")), _as_double(F.col("qv"))).alias("cos"),
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
    """Deterministic centroid set: the n lowest-id corpus vectors.

    A k-means refinement would slot in here unchanged (centroids are just
    driver-side literals); deterministic seeding keeps runs reproducible
    and restart-stable, which matters more for a validation pipeline."""
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(n_centroids)
        .collect()
    )
    return [(i, [float(x) for x in r["v"]]) for i, r in enumerate(rows)]


def _nearest_centroid_cols(vec: Column, cents) -> Column:
    """Array of (centroid_id, negative dot product) distances — JVM-side."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                (-dot(_as_double(vec),
                      F.array(*[F.lit(x) for x in cv]))).alias("ndot"),
            )
            for cid, cv in cents
        ]
    )


def ivf_assign(df: DataFrame, vec_col: str, cents) -> DataFrame:
    """Add ``bucket`` = argmax dot-product centroid (coarse quantizer)."""
    dists = _nearest_centroid_cols(F.col(vec_col), cents)
    best = F.array_min(dists)  # struct ordering: min ndot = max dot
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
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid (one
    narrow pass), queries probe their ``nprobe`` nearest buckets; exact
    cosine only within probed buckets.

    Scale shape: the corpus-side cost is one scan + small shuffle on the
    bucket key; query fan-out is nprobe buckets; centroids are driver
    literals (broadcast implicitly in the expression)."""
    cents = _centroids(corpus, id_col, vec_col, n_centroids)
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
    cand = cb.join(F.broadcast(qb), "bucket").select(
        "query_id", "vec_id",
        cosine(_as_double(F.col(vec_col)), _as_double(F.col("qv"))).alias("cos"),
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
) -> DataFrame:
    """Embedding near-dup pairs (cos ≥ threshold) found within LSH buckets."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
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
    buckets = base.select(
        "id", "v", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    pairs = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .distinct()
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            cosine(_as_double(F.col("va")), _as_double(F.col("vb"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
