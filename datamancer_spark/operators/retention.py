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

from ..functions.rounding import prnd


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
    time.

    Single-pass plan (r4 rewrite — was one scan + user-keyed agg +
    join PER STEP, 11 exchanges / 6 scans for 3 steps): ONE scan
    filtered to the funnel types, ONE user-keyed shuffle collecting
    each user's sorted (ts, type) events, then a per-user
    ``F.aggregate`` fold over the sorted array computes all k
    conversion times at once — the fold state is a k-slot timestamp
    array where slot j is assigned the first event of step j strictly
    after slot j-1. Exchange count is constant in k, and the per-user
    state is bounded by that user's funnel-type event count.

    The fold is tie-safe: an event at exactly the previous step's
    conversion instant fails the strict ``>`` regardless of its
    position among equal-timestamp neighbours, so sort_array's
    (ts, type) tie order cannot change the result. Repeated step names
    (view→view re-engagement funnels) work because each slot matches
    on its own step name, not a per-event step index."""
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    k = len(steps)
    ts_type = df.schema[ts_col].dataType
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(F.col(type_col).isin(list(set(steps)))).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("t")
        ).alias("e"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list("e")).alias("evs")
    )
    init = F.array(*[F.lit(None).cast(ts_type) for _ in range(k)])

    def fold(acc, e):
        # evaluate every slot against the OLD acc: slot j fires when the
        # event matches step j, the slot is empty, and (j == 0 or the
        # event is strictly after slot j-1's conversion)
        return F.transform(
            acc,
            lambda c, j: F.when(
                (F.get(steps_arr, j) == e["t"])
                & c.isNull()
                & ((j == F.lit(0)) | (e["ts"] > F.get(acc, j - 1))),
                e["ts"],
            ).otherwise(c),
        )

    conv = per_user.select(F.aggregate("evs", init, fold).alias("conv"))
    row = conv.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.get("conv", i).isNotNull(), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"_n{i}")
            for i in range(k)
        ]
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("step"),
                        F.lit(i + 1).cast("long").alias("step_idx"),
                        F.col(f"_n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.*")


def event_transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order event transition matrix (the Markov view of user
    journeys): for each user's time-ordered event stream, count every
    consecutive (from_type -> to_type) step and its share of all
    transitions leaving ``from_type``. The standard product-analytics
    rollup behind flow/sankey views.

    Plan: ONE user-keyed window (lead over (ts, id) — the id tiebreak
    makes simultaneous events deterministic) then a partial-aggregated
    (from, to) count; the per-from totals come from a second tiny
    aggregation over the #types² matrix, broadcast back. The corpus
    shuffles once, on the user key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    steps = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        prnd(F.col("n") / F.col("_tot"), 6).alias("share"),
    )


def interarrival_stats(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival gap distribution per event type: for each event,
    the seconds since the same user's PREVIOUS event (any type); rolled
    up per arriving type as count plus exact p50/p90 — the engagement-
    cadence summary behind session-timeout and alerting-threshold
    choices. Gaps are exact fractional seconds (microsecond diff /
    1e6): whole-second date_diff semantics differ between engines on
    sub-second components (floor vs boundary crossing).

    Plan: one user-keyed window (lag over (ts, id)) — the corpus
    shuffles once on the user key — then a per-type percentile
    aggregate (array-argument percentile: one value buffer per group,
    like quantiles_by_group). Gap arithmetic uses timestamp_diff, the
    NTZ-robust primitive."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gaps = (
        df.select(
            F.col(user_col),
            F.col(type_col),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("_prev", F.lag(ts_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            F.col(type_col),
            (
                F.timestamp_diff("MICROSECOND", F.col("_prev"), F.col(ts_col))
                .cast("long")
                / 1_000_000.0
            ).alias("_gap_s"),
        )
    )
    ps = F.percentile(F.col("_gap_s"), F.array(F.lit(0.5), F.lit(0.9)))
    return (
        gaps.groupBy(type_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            ps.alias("_ps"),
        )
        .select(
            type_col,
            "n_gaps",
            prnd(F.col("_ps")[0], 4).alias("p50_gap_s"),
            prnd(F.col("_ps")[1], 4).alias("p90_gap_s"),
        )
    )


def ab_test_report(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    salt: str = "exp1",
    arms: int = 2,
) -> DataFrame:
    """Experiment-analysis rollup over an event stream with
    deterministic hash assignment: each user lands in one of ``arms``
    via md5(salt || user) — the assignment a real experiment framework
    would persist, reproduced engine-portably — and converts if they
    have >= 1 ``convert_type`` event. Output per arm: users,
    converters, conversion rate, and the two-proportion z statistic vs
    arm 0 (NULL for arm 0 itself); |z| >= 1.96 is the usual 95% bar.

    Plan: one user-level aggregation (the only corpus-sized shuffle,
    partial-aggregated), then a per-arm rollup and a broadcast join of
    arm 0's rate back for the z computation. No collects."""
    from ..functions.rounding import prnd as _prnd
    from .dedup import hash32

    per_user = (
        df.select(
            F.col(user_col),
            (F.col(type_col) == convert_type).cast("int").alias("_c"),
        )
        .groupBy(user_col)
        .agg(F.max("_c").alias("_converted"))
        .withColumn(
            "arm",
            (hash32(F.concat(F.lit(salt), F.col(user_col).cast("string"))) % arms)
            .cast("int"),
        )
    )
    arms_df = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("users"),
        F.sum("_converted").cast("long").alias("converters"),
    )
    base = arms_df.filter(F.col("arm") == 0).select(
        F.col("users").alias("_n0"), F.col("converters").alias("_c0")
    )
    j = arms_df.crossJoin(F.broadcast(base))
    p = F.col("converters") / F.col("users")
    p0 = F.col("_c0") / F.col("_n0")
    pool = (F.col("converters") + F.col("_c0")) / (F.col("users") + F.col("_n0"))
    se = F.sqrt(
        pool * (1 - pool) * (1 / F.col("users") + 1 / F.col("_n0"))
    )
    z = F.when(F.col("arm") != 0, (p - p0) / se)
    return j.select(
        "arm",
        "users",
        "converters",
        _prnd(p, 6).alias("conv_rate"),
        _prnd(z, 4).alias("z_vs_control"),
    )
