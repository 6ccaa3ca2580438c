"""Column-statistics operators: pairwise correlation and describe-style
summaries in LONG format (one row per column/pair), the inspection
sweeps run before feature selection or schema review.

Scale shape: each is ONE ungrouped aggregate over the scan — every
statistic partial-aggregates map-side (corr/stddev decompose into
sum/sum-of-squares/cross-product partials), so the reducer sees one
partial row per task regardless of corpus size. The long-format pivot
happens on the single aggregated row, driver-free."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import prnd


def corr_matrix(df: DataFrame, cols: list[str], digits: int = 4) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` as (col_a, col_b, corr)
    for a < b — computed in ONE pass (one agg with C(n,2) corr
    expressions, all sharing the scan), then exploded to long format
    from the single result row. Rounded to ``digits`` so the value is
    engine-portable under float accumulation-order differences."""
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    wide = df.agg(
        *[
            prnd(F.corr(a, b), digits).alias(f"_c_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"_c_{i}").alias("corr"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return wide.select(F.explode(structs).alias("r")).select("r.*")


def describe_columns(
    df: DataFrame, cols: list[str], digits: int = 4
) -> DataFrame:
    """describe()-style numeric summary in long format: one row per
    column with (column, n, n_null, mean, std, min, max). One ungrouped
    aggregate; stddev is the sample standard deviation (n-1), matching
    DuckDB's stddev_samp."""
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(c).cast("long").alias(f"_n_{i}"),
            F.count(F.when(F.col(c).isNull(), 1)).cast("long").alias(f"_nn_{i}"),
            prnd(F.avg(c), digits).alias(f"_mean_{i}"),
            prnd(F.stddev_samp(c), digits).alias(f"_std_{i}"),
            prnd(F.min(c).cast("double"), digits).alias(f"_min_{i}"),
            prnd(F.max(c).cast("double"), digits).alias(f"_max_{i}"),
        ]
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n_{i}").alias("n"),
                F.col(f"_nn_{i}").alias("n_null"),
                F.col(f"_mean_{i}").alias("mean"),
                F.col(f"_std_{i}").alias("std"),
                F.col(f"_min_{i}").alias("min"),
                F.col(f"_max_{i}").alias("max"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(structs).alias("r")).select("r.*")


def grouped_linfit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group simple OLS fit of y on x: (groups..., n, slope,
    intercept, r2) — the trend sweep run per segment/cohort before
    anything heavier. One partial-aggregated groupBy computing the five
    OLS sums; rows where either side is NULL are excluded (matching
    SQL regr_* semantics). Groups with zero x-variance report NULL
    slope/intercept/r2 rather than dividing by zero."""
    both = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    agg = both.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x_col).alias("_sx"),
        F.sum(y_col).alias("_sy"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("_sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("_sxx"),
        F.sum(F.col(y_col) * F.col(y_col)).alias("_syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.when(varx != 0, cov / varx)
    intercept = F.when(
        varx != 0, (F.col("_sy") - slope * F.col("_sx")) / n
    )
    r2 = F.when((varx != 0) & (vary != 0), (cov * cov) / (varx * vary))
    return agg.select(
        *group_cols,
        "n",
        prnd(slope, digits).alias("slope"),
        prnd(intercept, digits).alias("intercept"),
        prnd(r2, digits).alias("r2"),
    )
