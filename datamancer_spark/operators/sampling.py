"""Deterministic dataset splitting + histogram utilities.

``hash_split`` assigns rows to named splits by portable md5 hash of a key
— the reproducible train/test split every data pipeline needs: stable
across runs, engines, partitionings, and cluster sizes (unlike
``rand()``-based splits, which depend on partition layout). Oracle-
replicable because the hash is the same md5-prefix construction used by
the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash32


def split_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): hash32(key) % buckets.
    DuckDB twin: CAST('0x'||substr(md5(key),1,8) AS BIGINT) % buckets."""
    return hash32(key.cast("string")) % F.lit(buckets)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    out: str = "split",
) -> DataFrame:
    """Attach a split label ('train'/'test'/...) per row, by cumulative
    fraction thresholds over the stable bucket. Fractions must sum to 1."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = split_bucket(F.col(key_col), 1_000_000)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        threshold = int(round(acc * 1_000_000))
        cond = bucket < threshold
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # numeric edge: everything lands below the final threshold, but keep a
    # fallback to the last split name for bucket == buckets-1 rounding
    last = list(fractions)[-1]
    return df.withColumn(out, expr.otherwise(F.lit(last)))


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    buckets: int = 20,
) -> DataFrame:
    """Equi-width histogram via width_bucket — one partial-aggregated
    shuffle, engine-portable semantics (bucket 0 = below lo,
    buckets+1 = at/above hi)."""
    return (
        df.select(
            F.width_bucket(F.col(col), F.lit(lo), F.lit(hi), F.lit(buckets)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
