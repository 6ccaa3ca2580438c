"""Event analytics (operators/retention.py): cohort retention and
ordered funnels — crafted inputs pin the strictly-after funnel rule and
per-user cohort anchoring the flat synthetic log can't distinguish."""

from __future__ import annotations

from datetime import datetime

from datamancer_spark.operators.retention import cohort_retention, funnel_steps


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h), u, t) for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


class TestFunnel:
    def test_strictly_after_ordering(self, spark):
        rows = [
            # user 1: view -> click -> purchase (full conversion)
            (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
            # user 2: click BEFORE first view -> click does not count
            (2, 1, 2, "click"), (2, 2, 2, "view"),
            # user 3: view then purchase, no click -> stops at step 1
            (3, 1, 3, "view"), (3, 2, 3, "purchase"),
            # user 4: never views -> not in funnel at all
            (4, 1, 4, "purchase"),
        ]
        out = {
            r["step"]: (r["step_idx"], r["n_users"])
            for r in funnel_steps(_ev(spark, rows), ["view", "click", "purchase"]).collect()
        }
        assert out["view"] == (1, 3)
        assert out["click"] == (2, 1)
        assert out["purchase"] == (3, 1)

    def test_equal_timestamp_not_after(self, spark):
        # click at the SAME instant as the view is not strictly after
        rows = [(1, 1, 1, "view"), (1, 1, 1, "click")]
        out = {r["step"]: r["n_users"]
               for r in funnel_steps(_ev(spark, rows), ["view", "click"]).collect()}
        assert out == {"view": 1, "click": 0}


class TestCohortRetention:
    def test_per_user_anchoring(self, spark):
        rows = [
            # user 1 starts Jan 1; active again day 8 (offset 1)
            (1, 1, 1, "view"), (8, 1, 1, "view"),
            # user 2 starts Jan 2; active day 2 only (offset 0)
            (2, 1, 2, "view"),
            # user 3 starts Jan 1; active days 1 and 20 (offsets 0, 2)
            (1, 5, 3, "view"), (20, 1, 3, "view"),
        ]
        out = {
            (str(r["cohort_start"]), r["period_offset"]): r["n_users"]
            for r in cohort_retention(_ev(spark, rows)).collect()
        }
        assert out[("2024-01-01", 0)] == 2   # users 1 and 3 at offset 0
        assert out[("2024-01-01", 1)] == 1   # user 1 back in period 1
        assert out[("2024-01-01", 2)] == 1   # user 3 back in period 2
        assert out[("2024-01-02", 0)] == 1   # user 2's own cohort


class TestFunnelSinglePass:
    def test_repeated_step_names(self, spark):
        # re-engagement funnel: second view strictly after the first
        rows = [
            (1, 1, 1, "view"), (1, 2, 1, "view"),        # user 1: converts both
            (2, 1, 2, "view"),                            # user 2: one view only
            (3, 1, 3, "view"), (3, 1, 3, "view"),         # user 3: same instant -> no 2nd
        ]
        out = {r["step_idx"]: r["n_users"]
               for r in funnel_steps(_ev(spark, rows), ["view", "view"]).collect()}
        assert out == {1: 3, 2: 1}

    def test_zero_user_steps_still_emit_rows(self, spark):
        rows = [(1, 1, 1, "view")]
        out = {r["step"]: r["n_users"]
               for r in funnel_steps(_ev(spark, rows), ["view", "click"]).collect()}
        assert out == {"view": 1, "click": 0}

    def test_single_corpus_shuffle(self, spark):
        # the r4 rewrite contract: exchange count constant in k (was 11
        # for 3 steps), and ONE scan of the event input
        rows = [(1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase")]
        plan = funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"]
        )._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
        assert n_exchanges <= 4, f"expected <=4 exchanges, got {n_exchanges}"


from pyspark.sql import functions as F


class TestEventTransitions:
    def test_hand_computed_matrix(self, spark):
        from datamancer_spark.operators.retention import event_transition_matrix

        rows = [
            (1, "u1", "view", "2024-01-01 00:00:00"),
            (2, "u1", "click", "2024-01-01 00:01:00"),
            (3, "u1", "view", "2024-01-01 00:02:00"),
            (4, "u2", "view", "2024-01-01 00:00:00"),
            (5, "u2", "click", "2024-01-01 00:01:00"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {(r["from_type"], r["to_type"]): r
               for r in event_transition_matrix(df, user_col="user_id").collect()}
        # u1: view->click, click->view; u2: view->click
        assert out[("view", "click")]["n"] == 2
        assert out[("view", "click")]["share"] == 1.0
        assert out[("click", "view")]["n"] == 1
        assert len(out) == 2

    def test_simultaneous_events_tiebreak_by_id(self, spark):
        from datamancer_spark.operators.retention import event_transition_matrix

        rows = [
            (1, "u", "a", "2024-01-01 00:00:00"),
            (2, "u", "b", "2024-01-01 00:00:00"),  # same ts: id orders it
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = event_transition_matrix(df).collect()
        assert len(out) == 1
        assert (out[0]["from_type"], out[0]["to_type"]) == ("a", "b")


class TestInterarrival:
    def test_hand_computed_gaps(self, spark):
        from datamancer_spark.operators.retention import interarrival_stats

        rows = [
            (1, "u1", "view", "2024-01-01 00:00:00"),
            (2, "u1", "click", "2024-01-01 00:00:10"),   # gap 10
            (3, "u1", "click", "2024-01-01 00:00:40"),   # gap 30
            (4, "u2", "view", "2024-01-01 00:00:00"),    # first event: no gap
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["event_type"]: r for r in interarrival_stats(df).collect()}
        assert "view" not in out  # views were never preceded
        assert out["click"]["n_gaps"] == 2
        assert out["click"]["p50_gap_s"] == 20.0  # interpolated between 10, 30


class TestAbReport:
    def test_deterministic_split_and_z(self, spark):
        from datamancer_spark.operators.retention import ab_test_report

        rows = []
        for u in range(200):
            rows.append((u * 10, f"u{u}", "view", "2024-01-01 00:00:00"))
            if u % 3 == 0:
                rows.append((u * 10 + 1, f"u{u}", "purchase", "2024-01-01 00:01:00"))
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["arm"]: r for r in ab_test_report(df).collect()}
        assert set(out) == {0, 1}
        assert out[0]["z_vs_control"] is None
        assert out[1]["z_vs_control"] is not None
        assert out[0]["users"] + out[1]["users"] == 200
        # hash split is deterministic: rerun gives identical rows
        again = {r["arm"]: r for r in ab_test_report(df).collect()}
        assert {k: tuple(v) for k, v in out.items()} == {
            k: tuple(v) for k, v in again.items()
        }

    def test_z_matches_hand_computed_formula(self, spark):
        """The reported z equals the two-proportion pooled z recomputed
        from the reported arm counts (floor-rounded to 4 like prnd)."""
        import math

        from datamancer_spark.operators.retention import ab_test_report

        rows = []
        for u in range(300):
            rows.append((u * 10, f"u{u}", "view", "2024-01-01 00:00:00"))
            if u % 4 == 0:
                rows.append((u * 10 + 1, f"u{u}", "purchase", "2024-01-01 00:01:00"))
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["arm"]: r for r in ab_test_report(df).collect()}
        n0, c0 = out[0]["users"], out[0]["converters"]
        n1, c1 = out[1]["users"], out[1]["converters"]
        pool = (c0 + c1) / (n0 + n1)
        z = (c1 / n1 - c0 / n0) / math.sqrt(
            pool * (1 - pool) * (1 / n1 + 1 / n0)
        )
        assert out[1]["z_vs_control"] == math.floor(z * 1e4 + 0.5) / 1e4
