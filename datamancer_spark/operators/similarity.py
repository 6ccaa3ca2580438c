"""Approximate/exact nearest-neighbor search over embedding columns.

Beyond-reference surface (BASELINE.json north star). Two tiers:

1. ``knn_bruteforce`` — exact top-k by cosine: broadcast the (small) query
   set against the corpus; per-partition partial top-k via the
   TakeOrdered-style window, merged by one final shuffle on query id.
   Correct at any scale where |queries| is broadcastable; cost is one
   full corpus scan per batch of queries — the right baseline.

2. ``knn_lsh`` — random-hyperplane LSH (sign-bit buckets): restricts the
   scan to colliding buckets. Hyperplanes are derived deterministically
   from md5 (portable, seedable) — no stored model object, so the same
   code runs identically on every executor and in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import prnd

from ..functions.vector import cosine


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    Output: (query_id, neighbor_id, cos, rank). The query side is
    broadcast — the corpus never shuffles; ranking windows partition by
    query id so the sort is per-query top-k, not global."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", prnd(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bits(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Sign-bit LSH bucket id from ``num_planes`` deterministic random
    hyperplanes. Plane p's component j = portable md5-derived value in
    [-1, 1): centered uniform — standard for sign-random-projection.
    Everything is a Catalyst expression evaluated corpus-side."""
    dim_col = F.size(F.col(vec_col))

    def plane_component(p: int):
        # component_j = (md5(seed,p,j) first 8 hex as int) / 2^31 - 1.0
        return lambda j: (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.lit(seed), F.lit(p), j.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**31))
            - F.lit(1.0)
        )

    bits = []
    for p in range(num_planes):
        comp = plane_component(p)
        dotp = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(F.sequence(F.lit(0), dim_col - 1), comp),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dotp >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.withColumn(out, bucket.cast("long"))


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket. Recall tunes with ``num_planes`` (fewer planes → bigger
    buckets → higher recall, more compute). The bucket join shuffles on a
    single long key — the 100 TB plan shape; multi-probe (flipping one
    bit) is the standard recall upgrade, staged as follow-up."""
    cb = hyperplane_bits(corpus, vec_col, num_planes, seed).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "bucket",
    )
    qb = hyperplane_bits(queries, vec_col, num_planes, seed).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", prnd(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
