"""Count-min sketch (operators/sketch.py): the one-sided error
contract (est >= true, always), exactness without collisions,
mergeability (linear counters), and the εN error bound at the
textbook width."""

import pytest
from pyspark.sql import functions as F

from datamancer_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _freqs(spark, pairs):
    """(value, count) pairs -> one row per occurrence."""
    rows = [(v,) for v, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "value string")


class TestCms:
    def test_never_underestimates_and_exact_without_collisions(self, spark):
        pairs = [(f"v{i}", 1 + i % 7) for i in range(40)]
        df = _freqs(spark, pairs)
        truth = dict(pairs)
        # wide sketch: 40 values over 4096 columns x 4 rows — the
        # chance ANY value collides in ALL rows is ~0, so estimates
        # are exact; narrow sketch (16 cols) must still never be low
        for width, exact in ((4096, True), (16, False)):
            sk = cms_build(df, width=width, depth=4)
            q = spark.createDataFrame(
                [(v,) for v in truth], "value string"
            )
            est = {
                r["value"]: r["est"]
                for r in cms_estimate(sk, q, width=width, depth=4).collect()
            }
            for v, n in truth.items():
                assert est[v] >= n, (width, v)
                if exact:
                    assert est[v] == n, (width, v)

    def test_merge_equals_combined_build(self, spark):
        a = _freqs(spark, [("x", 3), ("y", 2), ("z", 5)])
        b = _freqs(spark, [("x", 4), ("w", 1)])
        merged = cms_merge(
            cms_build(a, width=64, depth=3), cms_build(b, width=64, depth=3)
        )
        combined = cms_build(a.unionByName(b), width=64, depth=3)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, combined.collect())
        )
        q = spark.createDataFrame([("x",), ("w",)], "value string")
        est = {
            r["value"]: r["est"]
            for r in cms_estimate(merged, q, width=64, depth=3).collect()
        }
        assert est["x"] >= 7 and est["w"] >= 1

    def test_unseen_value_estimates_can_only_come_from_collisions(
        self, spark
    ):
        df = _freqs(spark, [("a", 10), ("b", 10)])
        sk = cms_build(df, width=4096, depth=4)
        q = spark.createDataFrame([("never-seen",)], "value string")
        est = cms_estimate(sk, q, width=4096, depth=4).collect()[0]["est"]
        assert est == 0  # wide sketch: no all-row collision

    def test_error_bound_on_corpus(self, spark, sf_dir):
        """Textbook bound: width w gives error ≤ (e/w)·N per estimate
        with prob 1−2^−depth per value; over the synthetic corpus's
        top tokens the max observed error must sit well inside a few
        multiples of N/w."""
        from datamancer_spark.operators.dedup import tokens

        doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
        toks = doc.select(
            F.explode(tokens(F.col("text"))).alias("value")
        ).filter(F.length("value") > 0)
        truth = toks.groupBy("value").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        n_total = toks.count()
        width = 256
        sk = cms_build(truth, width=width, depth=4, weight_col="n")
        top = truth.orderBy(F.desc("n"), F.asc("value")).limit(50)
        est = cms_estimate(sk, top.select("value"), width=width, depth=4)
        joined = top.join(est, "value").collect()
        for r in joined:
            assert r["est"] >= r["n"]
            assert r["est"] - r["n"] <= 4 * n_total / width, (
                r["value"], r["est"], r["n"], n_total,
            )

    def test_weight_col_equals_occurrence_rows(self, spark):
        occ = _freqs(spark, [("p", 6), ("q", 2)])
        pre = spark.createDataFrame(
            [("p", 6), ("q", 2)], "value string, n long"
        )
        s1 = cms_build(occ, width=32, depth=2)
        s2 = cms_build(pre, width=32, depth=2, weight_col="n")
        assert sorted(map(tuple, s1.collect())) == sorted(
            map(tuple, s2.collect())
        )

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("a",)], "value string"
        )
        sk = cms_build(df, width=32, depth=2)
        total = sk.agg(F.sum("n")).collect()[0][0]
        assert total == 2 * 2  # two occurrences x depth rows
