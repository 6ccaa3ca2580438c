"""Event-analytics operators: cohort retention and funnel conversion.

Beyond-reference surface: the two standard product-analytics rollups
over an event log, expressed fully relationally (agg + join + agg — no
windows over the raw event stream, no Python), so they hold at
100 TB: every shuffle is keyed by user_id or the tiny rollup keys.

Timestamp arithmetic uses day-level ``datediff`` on the DATE cast of
both ends (identical semantics in DuckDB via CAST(ts AS DATE)), so the
operators are differential-oracle stable for TIMESTAMP and
TIMESTAMP_NTZ inputs alike.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    unit_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their FIRST event's
    period (``unit_days``-day cohorts anchored at each user's first
    date), counted for every later period they remain active →
    (cohort_start, period_offset, n_users).

    Plan: one agg per user (first event date — the only corpus-sized
    shuffle, keyed by user), joined back onto the events (user-keyed
    equi-join; at TPC ratios the per-user frame broadcasts), then one
    small agg on the (cohort, offset) pair. The offset is
    floor(days-since-first / unit_days) — per-user anchoring, so no
    calendar-week boundary semantics to diverge across engines."""
    first = df.groupBy(user_col).agg(
        F.min(F.to_date(F.col(ts_col))).alias("_first_date")
    )
    j = df.join(first, user_col)
    offset = F.floor(
        F.datediff(F.to_date(F.col(ts_col)), F.col("_first_date"))
        / F.lit(unit_days)
    ).cast("long")
    return (
        j.select(
            F.col(user_col),
            F.col("_first_date").alias("cohort_start"),
            offset.alias("period_offset"),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: how many users performed step 1, then
    step 2 strictly after their first step-1 event, then step 3 strictly
    after that, ... → one row (step, step_idx, n_users) per step.

    Classic sequential-min semantics: a user converts step k at the
    EARLIEST step-k event that follows their step-(k-1) conversion
    time. Plan: one user-keyed agg per step over the type-filtered
    event stream (filter pushed to the scan), each joined to the
    previous step's per-user conversion frame — k user-keyed shuffles
    for a k-step funnel, then a tiny union of counts."""
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    prev: DataFrame | None = None
    counts = []
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_ts")
        )
        if prev is not None:
            ev = ev.join(prev, user_col).filter(F.col("_ts") > F.col("_conv"))
        conv = ev.groupBy(user_col).agg(F.min("_ts").alias("_conv"))
        counts.append(
            conv.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit(step).alias("step"),
                F.lit(i + 1).cast("long").alias("step_idx"),
                "n_users",
            )
        )
        prev = conv
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
