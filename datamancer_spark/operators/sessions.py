"""Batch sessionization — gap-based session assignment over event logs.

The classic two-window composition (no UDF, fully SQL-portable):
1. per key, ordered by time: ``new_session = (ts - lag(ts)) > gap``
2. running sum of the flag → dense per-key session index

Both windows share the same (partition, order) spec, so Catalyst plans a
single shuffle + sort; at 100 TB this is one exchange on the session key
(user), which is the lower bound for any per-user computation. The
streaming twin is ``streaming.session_agg`` (Spark session_window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap_seconds: int = 1800,
    out: str = "session_idx",
) -> DataFrame:
    """Attach a dense 0-based session index per key group."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_seconds),
        1,
    ).otherwise(0)
    running = Window.partitionBy(*keys).orderBy(F.col(ts_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out, F.sum(new_session).over(running) - 1)


def session_stats(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: bounds, event count, optional value sum."""
    s = sessionize(df, ts_col, keys, gap_seconds)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("total_value"))
    return s.groupBy(*keys, "session_idx").agg(*aggs)
