"""Round-12 scaling studies (appended to SCALING.md by hand):

1. Containment join with a corpus-wide HOT SHINGLE present (VERDICT
   r11 #1 done-criterion): constant-density 1x/4x/16x corpora, every
   doc carrying the same boilerplate footer (shingle df = |corpus|).
   Measures guarded (max_doc_freq=50) vs unguarded wall + emitted
   pair rows — the unguarded posting self-join's pair volume must
   grow ~quadratically while the guarded stays ~linear.

2. PageRank early stop (VERDICT r11 #8): fixed-10 vs tol-converged
   rounds/wall on the synthetic 2-out-edge graph.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from datamancer_spark import get_spark, load_tables

FOOTER = " shared legal footer all rights reserved worldwide"


def _const_density_docs(spark, copies: int):
    doc = load_tables(spark, "/root/testdata/sf0.01", ["documents"])[
        "documents"
    ].df
    n = doc.count()
    copies_df = spark.range(copies).withColumnRenamed("id", "copy")
    iso = F.concat_ws(
        " ",
        F.transform(
            F.split(F.coalesce(F.col("text"), F.lit("")), " "),
            lambda w: F.concat(w, F.lit("x"), F.col("copy").cast("string")),
        ),
    )
    big = (
        doc.crossJoin(copies_df)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * n)
        .withColumn(
            "text",
            F.when(F.col("copy") == 0, F.coalesce(F.col("text"), F.lit("")))
            .otherwise(iso),
        )
        .drop("copy")
    )
    # the HOT SHINGLE: identical footer on EVERY doc across all copies
    return big.withColumn("text", F.concat(F.col("text"), F.lit(FOOTER)))


def containment_study() -> None:
    from datamancer_spark.operators.dedup import ngram_containment_pairs

    spark = get_spark()
    print("| corpus | variant | wall (s) | pair rows |")
    print("|---|---|---|---|")
    for copies, tag in ((1, "1x"), (4, "4x"), (16, "16x")):
        docs = _const_density_docs(spark, copies)
        docs.write.mode("overwrite").parquet("/tmp/r12_contain.parquet")
        frame = spark.read.parquet("/tmp/r12_contain.parquet")
        for variant, cap in (("unguarded", None), ("max_doc_freq=50", 50)):
            t0 = time.time()
            n = ngram_containment_pairs(
                frame, shingle_n=3, threshold=0.2, max_doc_freq=cap
            ).count()
            print(
                f"| {tag} | {variant} | {time.time() - t0:.2f} | {n} |",
                flush=True,
            )


def selection_study() -> None:
    """DSIR / PII-redact / registrable-domain-cap growth at 1x/4x/16x
    of sf0.1 documents (constant-density vocabulary isomorphism, no hot
    footer — these operators are not pair-forming, the question is
    whether the explode/shuffle/window stages stay ~linear)."""
    from datamancer_spark.operators.quality import (
        dsir_importance_weights,
        dsir_resample,
    )
    from datamancer_spark.operators.sampling import cap_per_key
    from datamancer_spark.operators.scrub import (
        redact_pii,
        registrable_domain,
    )

    spark = get_spark()
    doc0 = load_tables(spark, "/root/testdata/sf0.1", ["documents"])[
        "documents"
    ].df
    n = doc0.count()
    print("| corpus | operator | wall (s) | rows |")
    print("|---|---|---|---|")
    for copies, tag in ((1, "1x"), (4, "4x"), (16, "16x")):
        copies_df = spark.range(copies).withColumnRenamed("id", "copy")
        iso = F.concat_ws(
            " ",
            F.transform(
                F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                lambda w: F.concat(
                    w, F.lit("x"), F.col("copy").cast("string")
                ),
            ),
        )
        big = (
            doc0.crossJoin(copies_df)
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * n)
            .withColumn(
                "text",
                F.when(
                    F.col("copy") == 0,
                    F.coalesce(F.col("text"), F.lit("")),
                ).otherwise(iso),
            )
            .drop("copy")
        )
        big.write.mode("overwrite").parquet("/tmp/r12_sel.parquet")
        frame = spark.read.parquet("/tmp/r12_sel.parquet")

        t0 = time.time()
        w = dsir_importance_weights(
            frame.withColumn("_tgt", F.col("lang") == "en"),
            target_col="_tgt",
            n_buckets=256,
        )
        rows = dsir_resample(w, k=100).count()
        print(f"| {tag} | dsir_select (k=100) | {time.time() - t0:.2f} | {rows} |", flush=True)

        t0 = time.time()
        rows = (
            redact_pii(frame.select("doc_id", "text"), text_col="text")
            .agg(F.sum("n_email") + F.sum("n_phone"))
            .collect()[0][0]
        )
        print(f"| {tag} | pii_redact (Σ spans) | {time.time() - t0:.2f} | {rows} |", flush=True)

        t0 = time.time()
        i = F.col("doc_id")
        hosts = frame.select(
            "doc_id",
            F.concat(
                F.lit("sub"),
                (i % 17).cast("string"),
                F.lit(".dom"),
                (i % 1000).cast("string"),
                F.lit(".co.uk"),
            ).alias("host"),
        ).withColumn("reg_dom", registrable_domain(F.col("host")))
        rows = cap_per_key(hosts, "reg_dom", 15, "doc_id").count()
        print(f"| {tag} | domain_cap (15/dom) | {time.time() - t0:.2f} | {rows} |", flush=True)


def late_ops_study() -> None:
    """PCA / epoch-shard-plan / fetch-schedule growth at 1x/4x/16x of
    sf0.1 (constant-density copies; embeddings get id offsets + a tiny
    first-component nudge so copies are near- but not exact dups)."""
    from datamancer_spark.operators.quality import epoch_shuffle_plan
    from datamancer_spark.operators.robots import politeness_schedule
    from datamancer_spark.operators.similarity import pca_power_scores

    spark = get_spark()
    doc0 = load_tables(spark, "/root/testdata/sf0.1", ["documents"])[
        "documents"
    ].df
    emb0 = load_tables(spark, "/root/testdata/sf0.1", ["embeddings"])[
        "embeddings"
    ].df
    nd = doc0.count()
    ne = emb0.count()
    print("| corpus | operator | wall (s) | rows |")
    print("|---|---|---|---|")
    for copies, tag in ((1, "1x"), (4, "4x"), (16, "16x")):
        copies_df = spark.range(copies).withColumnRenamed("id", "copy")
        big_emb = (
            emb0.crossJoin(copies_df)
            .withColumn("vec_id", F.col("vec_id") + F.col("copy") * ne)
            .withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x
                        + F.when(
                            i == 0, F.col("copy") * F.lit(0.01)
                        ).otherwise(0.0)
                    ).cast("float"),
                ),
            )
            .drop("copy")
        )
        big_emb.write.mode("overwrite").parquet("/tmp/r12_late_emb.parquet")
        eframe = spark.read.parquet("/tmp/r12_late_emb.parquet")
        big_doc = (
            doc0.crossJoin(copies_df)
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * nd)
            .drop("copy")
        )
        big_doc.write.mode("overwrite").parquet("/tmp/r12_late_doc.parquet")
        dframe = spark.read.parquet("/tmp/r12_late_doc.parquet")

        t0 = time.time()
        rows = pca_power_scores(eframe, iters=4).count()
        print(f"| {tag} | pca_power (4 iters) | {time.time() - t0:.2f} | {rows} |", flush=True)

        t0 = time.time()
        rows = epoch_shuffle_plan(
            dframe, "lang", {"zh": 2.5, "fr": 1.25, "de": 0.0},
            n_shards=8,
        ).count()
        print(f"| {tag} | epoch_shuffle_plan | {time.time() - t0:.2f} | {rows} |", flush=True)

        t0 = time.time()
        i = F.col("doc_id")
        frontier = dframe.select(
            F.concat(F.lit("s"), (i % 997).cast("string"), F.lit(".example")).alias("host"),
            F.concat(F.lit("http://s"), (i % 997).cast("string"), F.lit(".example/p/"), i.cast("string")).alias("url"),
        )
        delays = spark.range(997).select(
            F.concat(F.lit("s"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
            (F.col("id") % 5 + 1).cast("double").alias("crawl_delay"),
        )
        rows = politeness_schedule(frontier, delays).count()
        print(f"| {tag} | politeness_schedule | {time.time() - t0:.2f} | {rows} |", flush=True)


def bucketing_study() -> None:
    """Co-located (bucketed) join vs plain shuffle join at 1x/4x/16x of
    sf0.1 lineitem ⋈ orders on orderkey, broadcast disabled (to measure
    the shuffle path bucketing replaces — at real scale neither side
    broadcasts). Reports the one-time bucketed WRITE cost too: bucketing
    pays its sort once at ingest and every subsequent join on the key is
    exchange-free, which is the repeated-100TB-join economics."""
    import shutil
    import tempfile

    from datamancer_spark import DamFrame
    from datamancer_spark.io import write_parquet
    from datamancer_spark.plans import executed_plan

    spark = get_spark()
    li0 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    o0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    nkey = o0.agg(F.max("o_orderkey")).collect()[0][0] + 1
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    tmp = tempfile.mkdtemp(prefix="bkt_")
    print("| corpus | variant | join wall (s) | exchanges | write (s) |")
    print("|---|---|---|---|---|")
    try:
        for copies, tag in ((1, "1x"), (4, "4x"), (16, "16x")):
            cdf = spark.range(copies).withColumnRenamed("id", "copy")
            li = (
                li0.crossJoin(cdf)
                .withColumn(
                    "l_orderkey",
                    F.col("l_orderkey") + F.col("copy") * nkey,
                )
                .drop("copy")
            )
            o = (
                o0.crossJoin(cdf)
                .withColumn(
                    "o_orderkey",
                    F.col("o_orderkey") + F.col("copy") * nkey,
                )
                .drop("copy")
            )
            li.write.mode("overwrite").parquet(f"{tmp}/{tag}_li")
            o.write.mode("overwrite").parquet(f"{tmp}/{tag}_o")

            pl = spark.read.parquet(f"{tmp}/{tag}_li")
            po = spark.read.parquet(f"{tmp}/{tag}_o")
            j = po.join(pl, po.o_orderkey == pl.l_orderkey)
            t0 = time.time()
            j.groupBy().agg(F.count(F.lit(1))).collect()
            wall = time.time() - t0
            ex = executed_plan(j).count("Exchange")
            print(f"| {tag} | plain parquet | {wall:.2f} | {ex} | — |", flush=True)

            t0 = time.time()
            write_parquet(
                DamFrame(pl), f"{tmp}/{tag}_bl",
                bucket_by=(16, ["l_orderkey"]), table_name=f"st_li_{tag}",
            )
            write_parquet(
                DamFrame(po), f"{tmp}/{tag}_bo",
                bucket_by=(16, ["o_orderkey"]), table_name=f"st_o_{tag}",
            )
            wwall = time.time() - t0
            bl = spark.table(f"st_li_{tag}")
            bo = spark.table(f"st_o_{tag}")
            jb = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
            t0 = time.time()
            jb.groupBy().agg(F.count(F.lit(1))).collect()
            wall = time.time() - t0
            ex = executed_plan(jb).count("Exchange")
            print(f"| {tag} | bucketed (16) | {wall:.2f} | {ex} | {wwall:.2f} |", flush=True)
            spark.sql(f"DROP TABLE IF EXISTS st_li_{tag}")
            spark.sql(f"DROP TABLE IF EXISTS st_o_{tag}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        shutil.rmtree(tmp, ignore_errors=True)


def pagerank_study() -> None:
    from datamancer_spark.operators.components import pagerank

    spark = get_spark()
    print("| nodes | form | rounds | wall (s) |")
    print("|---|---|---|---|")
    for n in (5_000, 80_000):
        # ring + 100-hub concentration: the bijective ring alone has a
        # UNIFORM stationary distribution (in-degree 2 everywhere), so
        # tol=0 would fire trivially after round 1 — the hub edges make
        # ranks genuinely non-uniform so convergence takes real rounds
        edges = spark.range(n).select(
            F.col("id").alias("src"), ((F.col("id") * 7 + 1) % n).alias("dst")
        ).unionByName(
            spark.range(n).select(
                F.col("id").alias("src"),
                (F.col("id") % 100).alias("dst"),
            )
        )
        t0 = time.time()
        pagerank(edges, iters=30).count()
        print(f"| {n} | fixed-30 | 30 | {time.time() - t0:.2f} |", flush=True)
        # power iteration error decays ~damping^k (0.85^k), so a 1e-6
        # target needs ~85 rounds — tol expresses the ACTUAL precision
        # need instead of a worst-case cap
        t0 = time.time()
        _, rounds = pagerank(
            edges, iters=30, tol=1e-4, return_rounds=True
        )
        print(
            f"| {n} | tol=1e-4, cap 30 | {rounds} "
            f"| {time.time() - t0:.2f} |",
            flush=True,
        )


if __name__ == "__main__":
    import sys

    if "pagerank" in sys.argv:
        pagerank_study()
    elif "selection" in sys.argv:
        selection_study()
    elif "late" in sys.argv:
        late_ops_study()
    elif "bucketing" in sys.argv:
        bucketing_study()
    else:
        containment_study()
