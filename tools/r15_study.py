"""Round-15 measurements (appended to BASELINE.md / SCALING.md by hand):

1. Isolated best-of-3 records for the r15 catalog additions (fresh
   session, unpersist + GC between runs, sf0.1 — the r6/r7/r13/r14
   protocol): rank-sketch gates, persisted-index probe, late-drop
   replay, salted distinct, Avro round trip.

2. 1x/4x/16x scaling rows over constant-density synthesized inputs
   (ids offset per copy, tools/r13_study.py's method) for the batch
   seams: rank-sketch build+quantiles, index build+probe, salted
   distinct-count, Avro write+read. The two new STREAMING gates scale
   with their batch twins by construction (the sketch stream is the
   same stateless predicate measured in the rank-sketch seam; the
   late-drop source is the events table split three ways), so they get
   records, not seams.

Usage: python tools/r15_study.py [records|scaling]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

RECORD_QUERIES = [
    "quantile_sketch_merge",
    "dedup_index_probe",
    "streaming_late_drop",
    "quantile_drift_langs",
    "skew_distinct_salted",
    "avro_roundtrip_agg",
    "streaming_quantile_replay",
    "bucketed_join_agg",
    "quantile_weighted_tokens",
]


def _cleanup(spark) -> None:
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()
    except Exception as e:  # noqa: BLE001
        print(f"cleanup failed: {e!r}", file=sys.stderr)


def records() -> None:
    import __spark_entry__ as entrymod
    from datamancer_spark import get_spark

    spark = get_spark(app_name="r15-bestof")
    qs = entrymod.queries()
    qs["q6_revenue_delta"](spark, SF_DIR).count()  # untimed warmup
    print(f"# isolated best-of-3, {SF_DIR}")
    for name in RECORD_QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 2))
            _cleanup(spark)
        print(f"{name}: runs={runs} best={min(runs)}")


def scaling() -> None:
    from datamancer_spark import get_spark, load_tables
    from datamancer_spark.frame import DamFrame
    from datamancer_spark.io import read_avro, write_avro
    from datamancer_spark.operators.dedup import (
        build_minhash_index,
        fuzzy_dedup_against_index,
    )
    from datamancer_spark.operators.sketch import (
        rank_sketch_build,
        rank_sketch_merge,
        rank_sketch_quantiles,
    )
    from datamancer_spark.operators.skew import salted_distinct_count

    spark = get_spark(app_name="r15-scaling")
    li = load_tables(spark, SF_DIR, ["lineitem"])["lineitem"].df
    doc = load_tables(spark, SF_DIR, ["documents"])["documents"].df
    ev = load_tables(spark, SF_DIR, ["events"])["events"].df
    ord_ = load_tables(spark, SF_DIR, ["orders"])["orders"].df
    n_li = li.count()
    n_docs = doc.count()
    n_ev = ev.count()
    print(f"# scaling 1x/4x/16x, lineitem base n={n_li} ({SF_DIR})")

    def row(tag: str, fn) -> None:
        for copies in (1, 4, 16):
            t0 = time.time()
            out_rows = fn(copies)
            dt = round(time.time() - t0, 2)
            print(f"{tag} {copies}x: {dt}s rows={out_rows}")
            _cleanup(spark)

    def _scaled(df, key, n, copies):
        c = spark.range(copies).withColumnRenamed("id", "copy")
        return (
            df.crossJoin(c)
            .withColumn(key, F.col(key) + F.col("copy") * (n * 10))
            .drop("copy")
        )

    def rank_sketch_seam(copies: int) -> int:
        big = _scaled(li, "l_orderkey", n_li, copies)
        a = rank_sketch_build(
            big.filter(F.col("l_orderkey") % 2 == 0),
            "l_extendedprice",
            ["l_orderkey", "l_linenumber"],
            5,
        )
        b = rank_sketch_build(
            big.filter(F.col("l_orderkey") % 2 == 1),
            "l_extendedprice",
            ["l_orderkey", "l_linenumber"],
            6,
        )
        return rank_sketch_quantiles(
            rank_sketch_merge(a, b), [0.25, 0.5, 0.75, 0.9, 0.99]
        ).count()

    def index_probe_seam(copies: int) -> int:
        big = _scaled(doc, "doc_id", n_docs, copies)
        hist_snap = big.filter(F.col("doc_id") % 2 == 0)
        new = big.filter(F.col("doc_id") % 2 == 1)
        idx = build_minhash_index(hist_snap)
        return fuzzy_dedup_against_index(new, idx).count()

    def salted_distinct_seam(copies: int) -> int:
        big = _scaled(ev, "event_id", n_ev, copies)
        return salted_distinct_count(
            big, ["event_type"], "user_id", 32
        ).count()

    def avro_seam(copies: int) -> int:
        big = _scaled(
            ord_.select(
                F.col("o_orderkey").cast("long").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("double").alias("price"),
            ),
            "k",
            150000,
            copies,
        ).filter(F.col("k") % 5 == 0)
        d = f"/root/repo/spark-warehouse/_r15_avro_seam_{copies}"
        write_avro(DamFrame(big), d)
        n = (
            read_avro(spark, d, schema="k long, status string, price double")
            .df.count()
        )
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        return n

    row("rank_sketch_merge_quantiles(seam)", rank_sketch_seam)
    row("minhash_index_probe(seam)", index_probe_seam)
    row("salted_distinct(seam)", salted_distinct_seam)
    row("avro_write_read(seam)", avro_seam)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "records"
    {"records": records, "scaling": scaling}[mode]()
