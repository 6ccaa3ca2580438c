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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its stable
    bucket falls under the stratum's fraction — the reproducible
    ``sampleBy`` (same key always in/out, engine-portable, no RNG)."""
    bucket = split_bucket(F.col(key_col), 1_000_000)
    thr = F.lit(int(round(default_fraction * 1_000_000)))
    expr = thr
    for stratum, frac in fractions.items():
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * 1_000_000)))
        ).otherwise(expr)
    return df.filter(bucket < expr)


def winsorize(
    df: DataFrame,
    col: str,
    keys: list[str] | None = None,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out: str | None = None,
) -> DataFrame:
    """Clip ``col`` to its [lo_q, hi_q] quantiles (per group when ``keys``
    given) — the standard outlier-taming step before training-statistics.
    Keyed: exact percentiles via a window aggregate (one shuffle on the
    keys). Keyless: percentiles via a global agg broadcast back with a
    1-row cross join — a keyless window would collapse the whole dataset
    onto one reducer."""
    from pyspark.sql import Window

    if keys:
        w = Window.partitionBy(*keys)
        lo = F.percentile(F.col(col), F.lit(lo_q)).over(w)
        hi = F.percentile(F.col(col), F.lit(hi_q)).over(w)
        return df.withColumn(out or col, F.least(F.greatest(F.col(col), lo), hi))
    bounds = df.agg(
        F.percentile(F.col(col), F.lit(lo_q)).alias("_lo"),
        F.percentile(F.col(col), F.lit(hi_q)).alias("_hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out or col,
            F.least(F.greatest(F.col(col), F.col("_lo")), F.col("_hi")),
        )
        .drop("_lo", "_hi")
    )


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
