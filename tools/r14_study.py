"""Round-14 measurements (appended to BASELINE.md / SCALING.md by hand):

1. Isolated best-of-3 records for the r14 catalog additions (fresh
   session, unpersist + GC between runs, sf0.1 — same protocol as the
   r6/r7/r13 records tables): the integrity tier, k-core, mojibake,
   histogram, JSONL gate, streaming session replay.

2. 1x/4x/16x scaling rows for the new seams over constant-density
   synthesized inputs (ids offset per copy), matching
   tools/r13_study.py's method: k-core peel, shard manifest, snapshot
   diff, mojibake screen, histogram build+merge.

Usage: python tools/r14_study.py [records|scaling]
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
    "kcore_crawl_links",
    "corpus_manifest_shards",
    "snapshot_diff_docs",
    "mojibake_screen",
    "hist_merge_snapshots",
    "jsonl_roundtrip_agg",
    "streaming_session_replay",
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

    spark = get_spark(app_name="r14-bestof")
    qs = entrymod.queries()
    # codec/Arrow warmup, untimed (bench.py's protocol)
    qs["q6_revenue_delta"](spark, SF_DIR).count()
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


def _scaled_docs(spark, doc, n_docs: int, copies: int):
    """documents at copies x n_docs with offset ids and salted text
    (constant density; copies are near- but not exact duplicates)."""
    copies_df = spark.range(copies).withColumnRenamed("id", "copy")
    return (
        doc.crossJoin(copies_df)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * n_docs)
        .withColumn(
            "text",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(
                F.concat(
                    F.col("text"),
                    F.lit(" copyword"),
                    F.col("copy").cast("string"),
                )
            ),
        )
        .drop("copy")
    )


def scaling() -> None:
    import __spark_entry__ as entrymod
    from datamancer_spark import get_spark, load_tables
    from datamancer_spark.operators.components import k_core
    from datamancer_spark.operators.fixtures import (
        synth_blob_frame,
        warc_link_blob,
    )
    from datamancer_spark.operators.manifest import (
        shard_manifest,
        snapshot_diff,
    )
    from datamancer_spark.operators.scrub import (
        fix_mojibake,
        mojibake_hits,
    )
    from datamancer_spark.operators.sketch import (
        hist_build,
        hist_cdf,
        hist_merge,
    )
    from datamancer_spark.operators.warc import extract_links

    spark = get_spark(app_name="r14-scaling")
    doc = load_tables(spark, SF_DIR, ["documents"])["documents"].df
    ev = load_tables(spark, SF_DIR, ["events"])["events"].df
    n_docs = doc.count()
    n_ev = ev.count()
    print(f"# scaling 1x/4x/16x over n_docs={n_docs} base ({SF_DIR})")

    def row(tag: str, fn) -> None:
        for copies in (1, 4, 16):
            t0 = time.time()
            out_rows = fn(copies)
            dt = round(time.time() - t0, 2)
            print(f"{tag} {copies}x: {dt}s rows={out_rows}")
            _cleanup(spark)

    def kcore_seam(copies: int) -> int:
        ids = spark.range(n_docs * copies).select(
            F.col("id").cast("long").alias("doc_id")
        )
        blobs = synth_blob_frame(ids, warc_link_blob)
        edges = extract_links(blobs).select(
            F.col("src_url").alias("src"), F.col("dst_url").alias("dst")
        )
        return k_core(edges, k=3, rounds=3).count()

    def manifest_seam(copies: int) -> int:
        big = _scaled_docs(spark, doc, n_docs, copies)
        return shard_manifest(
            big, "doc_id", ["text", "lang", "source"], n_shards=32
        ).count()

    def snapshot_seam(copies: int) -> int:
        big = _scaled_docs(spark, doc, n_docs, copies)
        old = big.filter(F.col("doc_id") % 7 != 0)
        new = big.filter(F.col("doc_id") % 5 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.col("text"), F.lit(" v2")),
            ).otherwise(F.col("text")),
        )
        return snapshot_diff(
            old, new, "doc_id", ["text", "lang", "source"]
        ).count()

    def mojibake_seam(copies: int) -> int:
        big = _scaled_docs(spark, doc, n_docs, copies)
        injected = big.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 9 == 0,
                F.concat(
                    F.col("text"), F.lit(entrymod._mojibake_snippet())
                ),
            ).otherwise(F.col("text")),
        )
        return (
            injected.select(
                "lang",
                mojibake_hits(F.col("text")).alias("_h"),
                mojibake_hits(fix_mojibake(F.col("text"))).alias("_r"),
            )
            .groupBy("lang")
            .agg(F.sum("_h"), F.sum("_r"))
            .count()
        )

    def hist_seam(copies: int) -> int:
        copies_df = spark.range(copies).withColumnRenamed("id", "copy")
        big = ev.crossJoin(copies_df).withColumn(
            "event_id", F.col("event_id") + F.col("copy") * n_ev
        )
        a = hist_build(
            big.filter(F.col("event_id") % 2 == 0), "value", 0.0, 500.0, 50
        )
        b = hist_build(
            big.filter(F.col("event_id") % 2 == 1), "value", 0.0, 500.0, 50
        )
        return hist_cdf(hist_merge(a, b)).count()

    row("kcore_crawl(seam)", kcore_seam)
    row("shard_manifest(seam)", manifest_seam)
    row("snapshot_diff(seam)", snapshot_seam)
    row("mojibake_screen(seam)", mojibake_seam)
    row("hist_build_merge(seam)", hist_seam)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "records"
    if what == "records":
        records()
    elif what == "scaling":
        scaling()
    else:
        raise SystemExit(f"unknown mode {what!r}")
