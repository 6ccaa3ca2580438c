"""Empirical scaling study → SCALING.md.

Synthesizes 4× and 16× copies of the sf0.1 documents/events corpora
(ids offset per copy, text salted so near-dup structure stays realistic
rather than exploding LSH buckets with exact clones) and measures how
the scale-critical operators grow. The point: verify the measured
growth matches the plan-shape prediction (≈linear for hash/agg/LSH
pipelines) before anyone trusts these operators at 1000×.

Usage: python tools/scale_check.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(spark, base_dir: str, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from datamancer_spark import load_tables

    tables = load_tables(spark, base_dir, ["documents", "events"])
    doc = tables["documents"].df
    n_docs = doc.count()
    copies_df = spark.range(copies).withColumnRenamed("id", "copy")
    big_docs = (
        doc.crossJoin(copies_df)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * n_docs)
        # salt ~each copy's text so copies are near-dups, not exact clones
        .withColumn(
            "text",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" copyword"), F.col("copy").cast("string"))
            ),
        )
        .drop("copy")
    )
    big_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    ev = tables["events"].df  # ts already normalized to µs timestamps
    n_ev = ev.count()
    big_ev = (
        ev.crossJoin(copies_df)
        .withColumn("event_id", F.col("event_id") + F.col("copy") * n_ev)
        .withColumn("user_id", F.col("user_id") + F.col("copy") * 1000)
        .drop("copy")
    )
    big_ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    emb = load_tables(spark, base_dir, ["embeddings"])["embeddings"].df
    n_emb = emb.count()
    big_emb = (
        emb.crossJoin(copies_df)
        .withColumn("vec_id", F.col("vec_id") + F.col("copy") * n_emb)
        # tiny per-copy scale jitter: copies stay near-dups (cosine is
        # scale-invariant for pure scaling, so also nudge one component)
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x + F.when(i == 0, F.col("copy") * F.lit(0.01)).otherwise(0.0)
                ).cast("float"),
            ),
        )
        .drop("copy")
    )
    big_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def synth_constant_density(spark, base_dir: str, out_dir: str, copies: int) -> None:
    """16× corpus with the SAME duplicate density as 1× (VERDICT r3 #3).

    The default ``synth`` makes every copy a near-dup of the base doc, so
    duplicate density RISES with scale (every doc gains copies-1 near
    neighbours) and candidate-pair operators legitimately grow
    super-linearly. Here each copy applies a VOCABULARY ISOMORPHISM —
    every word gets a copy-specific suffix. Within a copy, shingle sets
    and token histograms are bijective images of the base corpus's, so
    every within-copy similarity (Jaccard exactly; SimHash overlap
    structure) is preserved; across copies, vocabularies are disjoint,
    so cross-copy similarity is zero. The 16x corpus is therefore 16
    independent blocks with exactly base duplicate density, and pair
    counts must grow ~linearly (asserted in the output table). Growth
    beyond ~linear in this mode indicts a STAGE, not the data.

    (First attempt inserted one SHARED salt token per copy every 3rd
    word — that pulled previously-dissimilar docs together and simhash
    pair counts grew 70x at 16x: the salt must not correlate across
    docs, which the isomorphism guarantees.)"""
    from pyspark.sql import functions as F

    from datamancer_spark import load_tables

    doc = load_tables(spark, base_dir, ["documents"])["documents"].df
    n_docs = doc.count()
    copies_df = spark.range(copies).withColumnRenamed("id", "copy")
    salted = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("x"), F.col("copy").cast("string")),
        ),
    )
    big = (
        doc.crossJoin(copies_df)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * n_docs)
        .withColumn(
            "text",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(salted),
        )
        .drop("copy")
    )
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def density_study() -> None:
    """Constant-duplicate-density scaling rows → appended to SCALING.md."""
    from pyspark.sql import functions as F  # noqa: F401

    from datamancer_spark import get_spark, load_tables
    from datamancer_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    spark = get_spark(app_name="scale-density")
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_cd_")
    dirs = {1: base}
    for c in (4, 16):
        out = f"{tmp}/x{c}"
        synth_constant_density(spark, base, out, c)
        dirs[c] = out

    def run(tag, fn):
        times, rows = {}, {}
        for c, d in dirs.items():
            doc = load_tables(spark, d, ["documents"])["documents"].df
            t0 = time.time()
            n = fn(doc).count()
            times[c] = round(time.time() - t0, 2)
            rows[c] = n
        return tag, times, rows

    results = [
        run("exact_dedup", lambda doc: exact_dedup(doc)),
        run("minhash_lsh_pairs", lambda doc: minhash_lsh_pairs(doc)),
        run("simhash_pairs", lambda doc: simhash_pairs(doc, max_hamming=3)),
    ]

    lines = [
        "",
        "## Constant-duplicate-density variant (VERDICT r3 #3)",
        "",
        "Same 4x/16x volume growth, but each copy applies a per-copy",
        "VOCABULARY ISOMORPHISM (every word suffixed with the copy id):",
        "within-copy similarity structure is exactly the base corpus's,",
        "cross-copy similarity is zero — duplicate DENSITY is constant",
        "while volume grows. Pair counts (shown) must grow ~linearly;",
        "wall-clock growth beyond ~linear then indicts a stage, not",
        "candidate volume.",
        "",
        "| operator | 1x (s) | 4x (s) | 16x (s) | 16x/1x | pairs 1x | pairs 16x |",
        "|---|---|---|---|---|---|---|",
    ]
    for tag, times, rows in results:
        ratio = round(times[16] / times[1], 1) if times[1] else float("nan")
        lines.append(
            f"| {tag} | {times[1]} | {times[4]} | {times[16]} | {ratio}x "
            f"| {rows[1]} | {rows[16]} |"
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended constant-density section to SCALING.md")
    for tag, times, rows in results:
        print(tag, times, rows)


def main() -> None:
    from datamancer_spark import get_spark
    from datamancer_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from datamancer_spark.operators.sessions import session_stats
    from datamancer_spark.functions.text import quality_score
    from pyspark.sql import functions as F

    spark = get_spark(app_name="scale-check")
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_")

    dirs = {1: base}
    for c in (4, 16):
        out = f"{tmp}/x{c}"
        synth(spark, base, out, c)
        dirs[c] = out

    from datamancer_spark import load_tables

    def run(tag, fn):
        times = {}
        for c, d in dirs.items():
            t = load_tables(spark, d, ["documents", "events", "embeddings"])
            doc, ev, emb = t["documents"].df, t["events"].df, t["embeddings"].df
            t0 = time.time()
            fn(doc, ev, emb).write.format("noop").mode("overwrite").save()
            times[c] = round(time.time() - t0, 2)
        return tag, times

    from datamancer_spark.operators.dedup import embedding_dedup_bucketed
    from datamancer_spark.operators.quality import (
        budget_select as _budget_select,
        line_dedup_global as _line_dedup,
        token_topk as _token_topk,
    )
    from datamancer_spark.operators.retention import (
        cohort_retention as _cohort_retention,
    )

    results = [
        run("exact_dedup", lambda doc, ev, emb: exact_dedup(doc)),
        run("minhash_lsh_pairs", lambda doc, ev, emb: minhash_lsh_pairs(doc)),
        run("simhash_pairs", lambda doc, ev, emb: simhash_pairs(doc, max_hamming=3)),
        run(
            "text_quality",
            lambda doc, ev, emb: doc.repartition(32).select(
                "doc_id", quality_score(F.col("text")).alias("q")
            ),
        ),
        run(
            "sessionize",
            lambda doc, ev, emb: session_stats(ev, "ts", ["user_id"], 1800, "value"),
        ),
        run(
            "embedding_dedup_bucketed",
            lambda doc, ev, emb: embedding_dedup_bucketed(
                emb, threshold=0.9, num_planes=8, multiprobe=1
            ),
        ),
        run("token_topk", lambda doc, ev, emb: _token_topk(doc, k=10)),
        run(
            "budget_select",
            lambda doc, ev, emb: _budget_select(
                doc, 20_000, "n_chars", group_col="lang"
            ),
        ),
        run("line_dedup_global", lambda doc, ev, emb: _line_dedup(doc)),
        run(
            "cohort_retention",
            lambda doc, ev, emb: _cohort_retention(ev, unit_days=7),
        ),
    ]

    lines = [
        "# SCALING — measured operator growth (synthesized 4x/16x of sf0.1)",
        "",
        "Copies are near-duplicates (salted text, offset ids), so dedup",
        "candidate structure stays realistic. Ideal hash/agg/LSH pipelines",
        "grow ~linearly in input size; a super-linear jump flags a stage",
        "that would not survive 1000x. Times include fixed Spark overhead",
        "(~0.3-0.5 s/job), so small inputs overstate the exponent floor.",
        "",
        "| operator | 1x (s) | 4x (s) | 16x (s) | 16x/1x ratio |",
        "|---|---|---|---|---|",
    ]
    for tag, times in results:
        ratio = round(times[16] / times[1], 1) if times[1] else float("nan")
        lines.append(
            f"| {tag} | {times[1]} | {times[4]} | {times[16]} | {ratio}x |"
        )
    lines += [
        "",
        "Interpretation: a ratio ≤ ~16 at 16x data is at-or-below linear",
        "(fixed overheads amortize); candidate-pair operators may exceed it",
        "if duplicate density rises with corpus size (it does here by",
        "construction — every doc gains 15 near-copies).",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING.md")
    for tag, times in results:
        print(tag, times)


def r4_study() -> None:
    """Round-4 operator scaling rows → appended to SCALING.md.

    Documents use the constant-density vocabulary isomorphism (so the
    fuzzy cross-snapshot dedup's candidate volume grows linearly by
    construction); events use id-offset copies (distinct users per
    copy, so interval-join fan-out per user is constant)."""
    from pyspark.sql import functions as F

    from datamancer_spark import get_spark, load_tables
    from datamancer_spark.operators.dedup import fuzzy_dedup_against
    from datamancer_spark.operators.quality import (
        bigram_logprob_score,
        chunk_documents,
    )
    from datamancer_spark.operators.sampling import weighted_sample
    from datamancer_spark.operators.timeseries import interval_join

    spark = get_spark(app_name="scale-r4")
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_r4_")
    dirs = {1: base}
    copies_of = {}
    for c in (4, 16):
        out = f"{tmp}/x{c}"
        synth_constant_density(spark, base, out, c)
        # events: id-offset copies, users disjoint per copy
        ev = load_tables(spark, base, ["events"])["events"].df
        n_ev = ev.count()
        copies_df = spark.range(c).withColumnRenamed("id", "copy")
        big_ev = (
            ev.crossJoin(copies_df)
            .withColumn("event_id", F.col("event_id") + F.col("copy") * n_ev)
            .withColumn("user_id", F.col("user_id") + F.col("copy") * 1000)
            .drop("copy")
        )
        big_ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
        dirs[c] = out
        copies_of[c] = c

    SEEN = ("src0", "src1", "src2", "src3", "src4")

    def run(tag, fn, needs=("documents",)):
        times = {}
        for c, d in dirs.items():
            t = load_tables(spark, d, list(needs))
            t0 = time.time()
            out = fn(*[t[n].df for n in needs])
            out.write.format("noop").mode("overwrite").save()
            times[c] = round(time.time() - t0, 2)
        return tag, times

    def _fuzzy(doc):
        seen = doc.filter(F.col("source").isin(*SEEN))
        new = doc.filter(~F.col("source").isin(*SEEN))
        return fuzzy_dedup_against(new, seen)

    def _ijoin(ev):
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"), "user_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("interval 1 hour")).alias("e"))
        v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
        return interval_join(v, p, "ts", "s", "e", keys=["user_id"],
                             closed="right").groupBy("pid").count()

    results = [
        run("fuzzy_dedup_against", _fuzzy),
        run("chunk_documents", lambda d: chunk_documents(d, chunk_tokens=32, stride=24)),
        run("weighted_sample", lambda d: weighted_sample(d, "n_chars", 20, ["lang"])),
        run("bigram_logprob_score", lambda d: bigram_logprob_score(d)),
        run("interval_join", _ijoin, needs=("events",)),
    ]

    lines = [
        "",
        "## Round-4 operators (constant-density docs / disjoint-user events)",
        "",
        "| operator | 1x (s) | 4x (s) | 16x (s) | 16x/1x |",
        "|---|---|---|---|---|",
    ]
    for tag, times in results:
        ratio = round(times[16] / times[1], 1) if times[1] else float("nan")
        lines.append(
            f"| {tag} | {times[1]} | {times[4]} | {times[16]} | {ratio}x |"
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended round-4 section to SCALING.md")
    for tag, times in results:
        print(tag, times)


def emb_study() -> None:
    """Text-embedding tier scaling rows → appended to SCALING.md
    (constant-density docs, same synth as the r4 study)."""
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    from datamancer_spark import get_spark, load_tables
    from datamancer_spark.operators.similarity import (
        hashed_embedding,
        plane_matrix,
        semantic_dedup,
    )

    spark = get_spark(app_name="scale-emb")
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_emb_")
    dirs = {1: base}
    for c in (4, 16):
        out = f"{tmp}/x{c}"
        synth_constant_density(spark, base, out, c)
        dirs[c] = out

    def run(tag, fn):
        times = {}
        for c, d in dirs.items():
            doc = load_tables(spark, d, ["documents"])["documents"].df
            t0 = time.time()
            fn(doc, c).write.format("noop").mode("overwrite").save()
            times[c] = round(time.time() - t0, 2)
        return tag, times

    # semantic dedup's per-cluster kernel is O(m²) in cluster size, so
    # num_centroids MUST scale with the corpus (√n rule) — holding it
    # fixed at 16x data makes clusters 16x bigger and kernels 256x
    # heavier (measured: the fixed-8-centroid variant blew a 10-minute
    # budget at 16x). Scaling centroids with volume is the documented
    # deployment knob; this study scales them 8 → 16 → 32.
    def _sem(d, c):
        from datamancer_spark.session import materialize

        cb = np.asarray(plane_matrix(8 * {1: 1, 4: 2, 16: 4}[c], 64, seed=7))
        # pin the derived embedding frame: semantic_dedup consumes its
        # corpus twice (assignment + anti join)
        return semantic_dedup(materialize(hashed_embedding(d, dim=64)), cb,
                              threshold=0.95, id_col="doc_id")

    results = [
        run("hashed_embedding", lambda d, c: hashed_embedding(d, dim=64)),
        run("semantic_dedup_text", _sem),
    ]
    lines = [
        "",
        "## Text-embedding tier (constant-density docs)",
        "",
        "| operator | 1x (s) | 4x (s) | 16x (s) | 16x/1x |",
        "|---|---|---|---|---|",
    ]
    for tag, times in results:
        ratio = round(times[16] / times[1], 1) if times[1] else float("nan")
        lines.append(
            f"| {tag} | {times[1]} | {times[4]} | {times[16]} | {ratio}x |"
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended text-embedding section to SCALING.md")
    for tag, times in results:
        print(tag, times)


def hot_band_study() -> None:
    """Hot-band LSH stress rows -> appended to SCALING.md.

    Synthesizes the LSH worst case on top of the constant-density 16x
    corpus: a boilerplate family of FAM_M documents sharing ~95% of
    their shingles (distinct signatures, so the distinct-sig
    decomposition can NOT collapse them) whose band buckets all land
    hot. Measures minhash_lsh_pairs (a) uncapped - AQE skew-split keeps
    tasks balanced but the m^2/2 family pairs are irreducible output -
    and (b) with max_band_freq, which prunes the hot buckets before the
    self-join. Also records whether AQE actually engaged its skew reads
    on the uncapped run."""
    from pyspark.sql import functions as F

    from datamancer_spark import get_spark, load_tables
    from datamancer_spark.operators.dedup import minhash_lsh_pairs

    spark = get_spark(app_name="scale-hotband")
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_hotband_")
    big = f"{tmp}/x16"
    synth_constant_density(spark, base, big, 16)

    doc = load_tables(spark, big, ["documents"])["documents"].df
    n = doc.count()
    FAM_M = 1500
    boiler = " ".join(f"boilerword{i}" for i in range(120))
    fam = (
        spark.range(FAM_M)
        .select(
            (F.col("id") + n + 1).alias("doc_id"),
            F.concat(
                F.lit(boiler + " "),
                F.lit("tail"), F.col("id").cast("string"),
                F.lit(" extra"), (F.col("id") * 7 % 1000).cast("string"),
            ).alias("text"),
        )
    )
    stress = doc.select("doc_id", "text").unionByName(fam)
    stress.write.mode("overwrite").parquet(f"{tmp}/stress.parquet")
    stress = spark.read.parquet(f"{tmp}/stress.parquet")

    rows = []
    for tag, kw in (("uncapped", {}), ("max_band_freq=200", {"max_band_freq": 200})):
        t0 = time.time()
        pairs = minhash_lsh_pairs(stress, **kw)
        n_pairs = pairs.count()
        dt = round(time.time() - t0, 2)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        skew = "skewed=true" in plan or "isSkew=true" in plan.lower()
        rows.append((tag, dt, n_pairs, skew))
        print(tag, dt, n_pairs, "aqe_skew_engaged:", skew)

    lines = [
        "",
        "## Hot-band LSH stress (16x constant-density + 1500-doc boilerplate family)",
        "",
        "A family of m distinct signatures sharing band buckets produces",
        "m^2/2 candidate pairs from those buckets - real LSH semantics, not",
        "a plan defect. AQE's skew split balances the tasks; `max_band_freq`",
        "prunes the hot buckets (LOSSY recall knob) when the output itself",
        "is the problem.",
        "",
        "| variant | wall (s) | candidate pairs | AQE skew reads engaged |",
        "|---|---|---|---|",
    ]
    for tag, dt, n_pairs, skew in rows:
        lines.append(f"| {tag} | {dt} | {n_pairs} | {skew} |")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended hot-band section to SCALING.md")



def span_study() -> None:
    """duplicate_span_stats scaling rows -> appended to SCALING.md
    (constant-density synth, like the r4/emb studies)."""
    from datamancer_spark import get_spark, load_tables
    from datamancer_spark.operators.quality import duplicate_span_stats

    spark = get_spark(app_name="scale-span")
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="scale_span_")
    dirs = {1: base}
    for c in (4, 16):
        out = f"{tmp}/x{c}"
        synth_constant_density(spark, base, out, c)
        dirs[c] = out

    times = {}
    for c, d in dirs.items():
        doc = load_tables(spark, d, ["documents"])["documents"].df
        t0 = time.time()
        duplicate_span_stats(doc, window=6).write.format("noop").mode(
            "overwrite"
        ).save()
        times[c] = round(time.time() - t0, 2)
        print(f"x{c}: {times[c]}s")

    ratio = round(times[16] / times[1], 1)
    lines = [
        "",
        "## Duplicate-span detection (constant-density docs)",
        "",
        "| operator | 1x (s) | 4x (s) | 16x (s) | 16x/1x |",
        "|---|---|---|---|---|",
        f"| duplicate_span_stats(window=6) | {times[1]} | {times[4]} | {times[16]} | {ratio}x |",
        "",
        "Single pass over the exploded window-hash stream (per-(hash,doc)",
        "partial agg + count window keyed by hash); growth tracks corpus",
        "token volume, the linear cost class shared with the shingle paths.",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended duplicate-span section to SCALING.md")



def dhash_study() -> None:
    """Banded Hamming-LSH engine growth (r6) -> appended to SCALING.md.

    Synthetic 64-bit signatures with CONSTANT near-dup density: N ids in
    groups of ~6 (base hash per id//6 is unique, masks cycle id%6 with
    Hamming |i-j| between members), so qualifying pairs grow linearly
    with N while candidate structure stays fixed — any superlinear wall
    growth indicts a stage of hamming_band_pairs itself."""
    from pyspark.sql import functions as F

    from datamancer_spark import get_spark
    from datamancer_spark.operators.dedup import (
        hamming_band_pairs,
        portable_hash,
    )
    from datamancer_spark.session import materialize

    spark = get_spark(app_name="scale-dhash")
    masks = [0, 8, 131080, 8590065672, 562958543486984, 2306405967757180936]
    base_n = 100_000
    times, pairs = {}, {}
    for c in (1, 4, 16):
        n = base_n * c
        ids = spark.range(n)
        base = portable_hash((F.col("id") / 6).cast("long").cast("string"), seed=23)
        mask = F.element_at(
            F.array(*[F.lit(m) for m in masks]), (F.col("id") % 6 + 1).cast("int")
        )
        sigs = materialize(ids.select(
            F.col("id").alias("doc_id"), base.bitwiseXOR(mask).alias("dhash")
        ))
        t0 = time.time()
        p = hamming_band_pairs(sigs, "dhash", "doc_id", max_hamming=3).count()
        times[c] = round(time.time() - t0, 2)
        pairs[c] = p
        print(f"x{c} (n={n}): {times[c]}s, {p} pairs")
    ratio = round(times[16] / times[1], 1)
    lines = [
        "",
        "## Banded Hamming-LSH pair engine (r6: hamming_band_pairs)",
        "",
        "Synthetic 64-bit signatures, constant near-dup density (groups",
        "of 6, member Hamming = |i-j|, max_hamming=3 accepts 12 of the 15",
        "in-group pairs): qualifying pairs must grow ~linearly in N and",
        "wall growth beyond ~linear indicts the engine, not the data.",
        "",
        "| N sigs | wall (s) | pairs |",
        "|---|---|---|",
    ] + [
        f"| {base_n * c:,} | {times[c]} | {pairs[c]:,} |" for c in (1, 4, 16)
    ] + [
        "",
        f"16x/1x wall ratio: {ratio}x (distinct-signature band join +",
        "pre-distinct Hamming filter; shared by simhash_pairs,",
        "image_dhash_pairs, audio_dhash_pairs).",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended dhash section to SCALING.md")



def bands_study() -> None:
    """bands=8 (max_hamming<=7) vs bands=4 (max_hamming<=3) cost on the
    SAME signature set (r7, VERDICT r6 #6) -> appended to SCALING.md.

    8-bit blocks have only 256 values, so candidate volume grows
    ~N^2*bands/blockvals: the wide-tolerance mode buys Hamming 4-7
    recall at a steep candidate multiple that must be MEASURED, not
    assumed. Groups of 8 nested-mask members (Hamming |i-j|, up to 7)
    so bands=8/mh=7 accepts all 28 in-group pairs, bands=4/mh=3 only
    the 22 with |i-j|<=3."""
    import time

    from pyspark.sql import functions as F

    from datamancer_spark import get_spark
    from datamancer_spark.operators.dedup import (
        hamming_band_pairs,
        portable_hash,
    )
    from datamancer_spark.session import materialize

    spark = get_spark(app_name="scale-bands")
    # nested masks: member k differs from member j by |k-j| bits
    masks = [0, 8, 131080, 8590065672, 562958543486984,
             2306405967757180936, 2306405967757181000,
             2306405967757181001]
    rows = []
    for n in (50_000, 100_000):
        ids = spark.range(n)
        base = portable_hash(
            (F.col("id") / 8).cast("long").cast("string"), seed=23
        )
        mask = F.element_at(
            F.array(*[F.lit(m) for m in masks]),
            (F.col("id") % 8 + 1).cast("int"),
        )
        sigs = materialize(ids.select(
            F.col("id").alias("doc_id"), base.bitwiseXOR(mask).alias("dhash")
        ))
        for bands, mh in ((4, 3), (8, 7)):
            width = 64 // bands
            # candidate volume: sum over (blk,val) buckets of C(m,2)
            # over DISTINCT sigs — what the band join generates before
            # the Hamming filter
            ds = sigs.select("dhash").distinct()
            cand = (
                ds.select(
                    F.explode(F.array(*[
                        F.struct(
                            F.lit(i).alias("blk"),
                            F.shiftrightunsigned(F.col("dhash"), i * width)
                            .bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
                        )
                        for i in range(bands)
                    ])).alias("b")
                )
                .groupBy("b.blk", "b.val").agg(F.count(F.lit(1)).alias("m"))
                .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("c"))
                .collect()[0]["c"]
            )
            t0 = time.time()
            p = hamming_band_pairs(
                sigs, "dhash", "doc_id", max_hamming=mh, bands=bands
            ).count()
            wall = round(time.time() - t0, 2)
            print(f"n={n} bands={bands} mh={mh}: {wall}s, "
                  f"{p} pairs, {int(cand)} candidates")
            rows.append((n, bands, mh, wall, p, int(cand)))
    lines = [
        "",
        "## Wide-tolerance Hamming bands (r7: bands=8, max_hamming<=7)",
        "",
        "Same nested-mask signature sets (groups of 8, member Hamming",
        "|i-j| up to 7). bands=8 unlocks Hamming 4-7 recall but 8-bit",
        "blocks have only 256 values, so BANDED CANDIDATE VOLUME is the",
        "cost: it grows ~N^2*8/256 for bands=8 vs ~N^2*4/65536 for",
        "bands=4 — a ~512x multiple that dominates past ~10^5 distinct",
        "signatures. Measured (candidates = sum over buckets of C(m,2)",
        "on distinct sigs, what the band join emits pre-filter):",
        "",
        "| N sigs | bands | max_h | wall (s) | pairs | candidates |",
        "|---|---|---|---|---|---|",
    ]
    for (n, bands, mh, wall, p, cand) in rows:
        lines.append(f"| {n:,} | {bands} | {mh} | {wall} | {p:,} | {cand:,} |")
    lines += [
        "",
        "Posture: bands=8 is the right tool for media screens on",
        "BOUNDED signature sets (a partition, a dedup bucket, a",
        "stream-static index probe) where Hamming 5-8 tolerance matters;",
        "for full-corpus joins past ~10^5 distinct signatures stay on",
        "bands=4 (or intersect two rotated bands=4 passes) — the",
        "candidate quadratic, not the filter, is the bottleneck.",
        "",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALING.md"), "a") as f:
        f.write("\n".join(lines))



if __name__ == "__main__":
    if "--density" in sys.argv:
        density_study()
    elif "--r4" in sys.argv:
        r4_study()
    elif "--emb" in sys.argv:
        emb_study()
    elif "--hotband" in sys.argv:
        hot_band_study()
    elif "--span" in sys.argv:
        span_study()
    elif "--dhash" in sys.argv:
        dhash_study()
    elif "--bands" in sys.argv:
        bands_study()
    else:
        main()
