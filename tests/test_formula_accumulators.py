"""Spark-first twins of the reference's full ``formula:`` macro suite —
custom accumulators, prefaces, and stateful loops
(``/root/reference/src/datamancer/formulaExp.nim:790-841``, tests
``/root/reference/tests/testsFormula.nim:374-520``).

The reference compiles a ``formula:`` block into a fused loop with
user-declared accumulator variables (``var res = 0; res += `B```).
Spark has no mutable per-row loop, and doesn't need one: every
accumulator pattern in the reference suite maps to a declarative
expression that Catalyst parallelizes — ``sum``/``product`` aggregates
for ``+=``/``*=`` reductions, window functions for stateful row
formulas, and lag+conditional-sum for the "integrated time-on"
reduction. For accumulators genuinely outside SQL semantics,
``DamFrame.apply_by_group`` (Arrow-batched pandas) is the escape hatch —
demonstrated last, computing the same time-on integral imperatively.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datamancer_spark.frame import to_df


class TestVectorFormulas:
    def test_simple_fkvector(self, spark):
        # testsFormula.nim:381 — "B5" ~ idx("B") * 5
        d = to_df({"B": [1, 2]}, spark).mutate(B5=F.col("B") * 5)
        assert [r["B5"] for r in d.arrange("B").collect()] == [5, 10]

    def test_preface_applied_proc(self, spark):
        # testsFormula.nim:430 — preface maps B through foo (×2.0), then ×5
        d = to_df({"B": [1, 2]}, spark).mutate(
            B5=(F.col("B").cast("double") * 2.0) * 5
        )
        assert [r["B5"] for r in d.arrange("B").collect()] == [10.0, 20.0]

    def test_stateful_vector_formula(self, spark):
        # testsFormula.nim:477 — var count = 0; first row yields 0, later
        # rows B*10. The loop variable is row position: a window
        # row_number over the explicit order replaces the mutable count.
        d = to_df({"B": [1, 2]}, spark)
        w = Window.orderBy("B")
        out = d.mutate(
            B10=F.when(F.row_number().over(w) == 1, 0).otherwise(
                F.col("B") * 10
            )
        )
        assert [r["B10"] for r in out.arrange("B").collect()] == [0, 20]


class TestScalarAccumulators:
    def test_fkscalar_mean(self, spark):
        # testsFormula.nim:391 — "Bmean" << mean(`B`)
        d = to_df({"B": [1, 2]}, spark).summarize(Bmean=F.mean("B"))
        assert d.collect()[0]["Bmean"] == 1.5

    def test_custom_reduction_plus_eq(self, spark):
        # testsFormula.nim:451 — var res = 0; "Bsum" << (res += `B`)
        d = to_df({"B": [1, 2]}, spark).summarize(
            Bsum=F.sum("B").cast("long")
        )
        assert d.collect()[0]["Bsum"] == 3

    def test_custom_reduction_times_eq(self, spark):
        # testsFormula.nim:464 — var res = 1; "Bprod" << (res *= `B`)
        # `*=` has no ANSI-SQL aggregate; Spark's product() is the
        # direct twin, and the F.aggregate fold shows the general
        # accumulator form (explicit init + merge, any associative op)
        d = to_df({"B": [1, 2]}, spark)
        via_product = d.summarize(Bprod=F.product("B").cast("long"))
        assert via_product.collect()[0]["Bprod"] == 2
        via_fold = d.summarize(vals=F.collect_list("B")).mutate(
            Bprod=F.aggregate(
                "vals", F.lit(1).cast("long"), lambda acc, x: acc * x
            )
        )
        assert via_fold.collect()[0]["Bprod"] == 2

    def test_integrated_time_on(self, spark):
        # testsFormula.nim:497 — the suite's headline: integrate "time
        # on" (Time - lag(Time)) over rows where B > 1.0, accumulator
        # seeded from a lag preface. Window lag + conditional sum.
        d = to_df(
            {"B": [0.0, 0.5, 1.5, 2.5], "Time": [10.0, 20.0, 30.0, 40.0]},
            spark,
        )
        w = Window.orderBy("Time")
        out = (
            d.mutate(lag_t=F.lag("Time").over(w))
            .summarize(
                sumTime=F.sum(
                    F.when(
                        F.col("B") > 1.0, F.col("Time") - F.col("lag_t")
                    ).otherwise(0.0)
                )
            )
        )
        assert out.collect()[0]["sumTime"] == 20.0


class TestEscapeHatch:
    def test_apply_by_group_accumulator(self, spark):
        # The general accumulator escape hatch for semantics with no SQL
        # form: the same time-on integral written imperatively over an
        # Arrow batch (per group), matching the declarative result.
        d = to_df(
            {
                "g": [1, 1, 1, 1, 2, 2],
                "B": [0.0, 0.5, 1.5, 2.5, 1.5, 0.5],
                "Time": [10.0, 20.0, 30.0, 40.0, 5.0, 9.0],
            },
            spark,
        )

        def time_on(pdf):
            import pandas as pd

            pdf = pdf.sort_values("Time")
            res = 0.0
            prev = None
            for _, row in pdf.iterrows():
                if prev is not None and row["B"] > 1.0:
                    res += row["Time"] - prev
                prev = row["Time"]
            return pd.DataFrame({"g": [pdf["g"].iloc[0]], "sumTime": [res]})

        out = {
            r["g"]: r["sumTime"]
            for r in d.group_by("g")
            .apply_by_group(time_on, "g long, sumTime double")
            .collect()
        }
        assert out == {1: 20.0, 2: 0.0}
