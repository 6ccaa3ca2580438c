"""Time-series grid operators: fixed-grid resampling with
forward-fill, and event-time RANGE-frame trailing windows.

Beyond-reference surface (the reference has no time-grid tooling; any
telemetry/metrics pipeline needs both). Spark-first shapes:

- ``resample_ffill``: per key, one agg for the grid bounds, the grid
  generated executor-side with ``sequence``+``explode`` (never a
  driver loop), a left join of per-bucket last values, then one
  ``last(ignorenulls)`` window — two key-partitioned shuffles total,
  and grid size is bounded per key, so the plan survives arbitrarily
  many keys.
- ``trailing_window``: Spark's native RANGE frame over epoch seconds —
  a single window sort per key, no self-join (the naive "join events
  within the interval" form is quadratic per key).

Timestamp handling: both operators accept TIMESTAMP and TIMESTAMP_NTZ
(the driver's parquet is NTZ); epoch seconds come from
``timestamp_diff`` against a type-matched epoch literal, which is
timezone-independent — ``unix_timestamp`` is not NTZ-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _epoch_seconds(df: DataFrame, ts_col: str) -> F.Column:
    """Seconds since 1970-01-01 00:00:00 for TIMESTAMP or TIMESTAMP_NTZ,
    timezone-independent (wall-clock arithmetic)."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
    else:
        epoch = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    return F.timestamp_diff("SECOND", epoch, F.col(ts_col))


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    every: str = "1 hour",
    agg: str = "last",
) -> DataFrame:
    """Resample ``value_col`` onto a fixed per-key time grid, carrying
    the last observation forward across empty buckets.

    Per key: buckets span ``date_trunc`` of the key's min..max event
    time at ``every`` spacing (``every`` must be a unit date_trunc
    understands: '1 hour', '1 day', ...). Within-bucket reduction is
    ``agg`` ('last' by event order = last-observation semantics, or
    'mean'/'max'/'min'/'sum'). Output: keys + ``bucket`` +
    ``{value_col}`` (forward-filled; leading buckets before the first
    observation are NULL only if the first bucket is empty, which
    cannot happen since bounds come from observed events).
    """
    unit = every.split()[-1].rstrip("s")  # '1 hour' -> 'hour'
    step = F.expr(f"interval {every}")
    bucketed = df.withColumn("_b", F.date_trunc(unit, F.col(ts_col)))
    if agg == "last":
        # deterministic "last in bucket": max event time wins; ties on
        # equal timestamps resolved by max value (stable cross-engine)
        per_bucket = (
            bucketed.groupBy(*keys, "_b")
            .agg(F.max(F.struct(F.col(ts_col), F.col(value_col))).alias("_s"))
            .select(*keys, "_b", F.col(f"_s.{value_col}").alias("_v"))
        )
    else:
        fn = {"mean": F.avg, "max": F.max, "min": F.min, "sum": F.sum}[agg]
        per_bucket = bucketed.groupBy(*keys, "_b").agg(
            fn(value_col).alias("_v")
        )
    bounds = bucketed.groupBy(*keys).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket"),
    )
    joined = grid.join(
        per_bucket.withColumnRenamed("_b", "bucket"), [*keys, "bucket"], "left"
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "bucket",
        F.last("_v", ignorenulls=True).over(w).alias(value_col),
    )


def trailing_window(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    window_seconds: int = 3600,
    exact_cents: bool = False,
) -> DataFrame:
    """Event-time trailing aggregate: for every event, the sum and count
    of ``value_col`` over the key's events in the preceding
    ``window_seconds`` (inclusive of the current row and its timestamp
    peers — RANGE frame semantics).

    One window sort per key over epoch seconds; no self-join.
    ``exact_cents`` sums integer cents (bit-stable across engines and
    evaluation orders — sliding-sum implementations differ in addend
    order between engines)."""
    sec = _epoch_seconds(df, ts_col).alias("_sec")
    base = df.select(*df.columns, sec)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_sec")
        .rangeBetween(-(window_seconds - 1), 0)
    )
    if exact_cents:
        cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
        trail_sum = F.sum(cents).over(w) / F.lit(100.0)
    else:
        trail_sum = F.sum(value_col).over(w)
    # a row without an event time has no trailing window: its stats are
    # NULL (the RANGE frame would otherwise count it against itself)
    has_ts = F.col(ts_col).isNotNull()
    return base.select(
        *df.columns,
        F.when(has_ts, trail_sum).alias("trailing_sum"),
        F.when(has_ts, F.count(F.lit(1)).over(w).cast("long")).alias(
            "trailing_n"
        ),
    ).drop("_sec")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 3600,
    closed: str = "both",
) -> DataFrame:
    """Point-in-interval join: each ``left`` row pairs with every
    ``right`` interval [start_col, end_col] that contains its
    ``left_ts`` (optionally also matching on equi-``keys``).

    Scale shape — the naive form is a non-equi theta join, which Spark
    can only execute as a broadcast-nested-loop / cartesian (quadratic,
    a 100 TB killer). Instead both sides are mapped onto coarse time
    bins of ``bucket_seconds``: a point has exactly one bin, an interval
    explodes into the bins it covers (bounded: choose bucket_seconds ≈
    typical interval length), and the join becomes an EQUI-join on
    (keys…, bin) followed by the exact containment filter. Each
    (point, interval) match is produced exactly once — the point's
    single bin appears once in the interval's bin list — so no distinct
    pass is needed.

    ``closed``: which bounds contain — 'both' ([start, end]), 'left'
    ([start, end)), 'right' ((start, end]), 'neither' ((start, end)).

    Columns from both sides are kept (prefix clashes are the caller's
    responsibility, as with any join)."""
    try:
        lo_strict, hi_strict = {
            "both": (False, False),
            "left": (False, True),
            "right": (True, False),
            "neither": (True, True),
        }[closed]
    except KeyError:
        raise ValueError(f"interval_join: bad closed={closed!r}")
    keys = keys or []
    lsec = _epoch_seconds(left, left_ts)
    l = left.withColumn("_bin", F.floor(lsec / bucket_seconds))
    s0 = _epoch_seconds(right, start_col)
    s1 = _epoch_seconds(right, end_col)
    # degenerate intervals (end < start) match nothing; drop them before
    # binning — F.sequence would otherwise count DOWN and emit bins the
    # containment filter then has to discard
    right = right.filter(F.col(end_col) >= F.col(start_col))
    r = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(s0 / bucket_seconds), F.floor(s1 / bucket_seconds)
            )
        ),
    )
    lo = (
        F.col(left_ts) > F.col(start_col)
        if lo_strict
        else F.col(left_ts) >= F.col(start_col)
    )
    hi = (
        F.col(left_ts) < F.col(end_col)
        if hi_strict
        else F.col(left_ts) <= F.col(end_col)
    )
    return (
        l.join(r, [*keys, "_bin"])
        .filter(lo & hi)
        .drop("_bin")
    )
