"""Model-based quality scoring — the fastText-style hashed linear
classifier step of LLM data curation (CCNet/RefinedWeb-style "score
every document with a small model, keep the confident side").

Beyond-reference surface. Spark-first shape: the model is a hashed
bag-of-words linear classifier, so scoring is a PURE PROJECTION — one
``F.aggregate`` fold over the token array per document computes
``sigmoid(mean_t w[h(t) mod D] + b)`` with zero shuffles, zero UDFs,
zero model objects on executors. Two weight sources:

- ``weights=None`` — deterministic pseudo-weights derived per bucket
  from md5 (the engine-portable stand-in used by the differential
  oracle; DuckDB computes the identical expression). This exercises the
  full scoring plan shape without shipping a real model.
- ``weights=dict`` — a trained model's ``{bucket: weight}`` map,
  inlined as a literal array lookup (D ≤ ~64k inlines fine; a real
  256k-bucket fastText model would broadcast-join a weights table
  instead — same plan shape, one broadcast).

At 100 TB both variants are embarrassingly parallel scans next to the
parquet read; the filter (``keep``) pushes into the same stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import prnd
from .dedup import hash32, tokens


def _pseudo_weight(bucket: Column, seed: int) -> Column:
    """Deterministic weight in [-1, 1] for a hash bucket: the md5-derived
    integer in [0, 20000] recentred — portable to any engine with md5
    (DuckDB twin: (CAST('0x'||substr(md5('w'||seed||'_'||bucket),1,8)
    AS BIGINT) % 20001 - 10000) / 10000.0)."""
    h = hash32(F.concat(F.lit(f"w{seed}_"), bucket.cast("string")))
    return (h % 20001 - 10000) / F.lit(10000.0)


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    seed: int = 7,
    bias: float = 0.0,
    threshold: float = 0.5,
    weights: dict[int, float] | None = None,
    out_prefix: str = "",
) -> DataFrame:
    """Score each document with a hashed bag-of-words linear model.

    Output adds ``{p}score`` (sigmoid of the mean bucket weight + bias,
    rounded to 6 dp for cross-engine stability) and ``{p}keep``
    (score ≥ threshold). Empty documents score ``sigmoid(bias)``.
    """
    p = out_prefix
    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    bucket = lambda t: hash32(t) % dim  # noqa: E731
    if weights is None:
        wsum = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc + _pseudo_weight(bucket(t), seed),
        )
    else:
        # literal array lookup: w[bucket] — element_at is 1-based
        warr = F.array(
            *[F.lit(float(weights.get(i, 0.0))) for i in range(dim)]
        )
        wsum = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc + F.element_at(warr, (bucket(t) + 1).cast("int")),
        )
    mean_w = wsum / F.greatest(F.size(toks), F.lit(1)).cast("double")
    logit = mean_w + F.lit(float(bias))
    score = prnd(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return df.withColumn(f"{p}score", score).withColumn(
        f"{p}keep", F.col(f"{p}score") >= F.lit(float(threshold))
    )


def calibration_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Score-calibration table: bucket a [0,1] classifier score into
    ``buckets`` equal-width bins and report, per bin, the row count,
    mean score, and observed positive rate of ``label_col`` (boolean or
    0/1) — the standard reliability-diagram input for deciding a keep
    threshold (well-calibrated ⇒ mean score ≈ positive rate per bin).

    One partial-aggregated shuffle over at most ``buckets``+2 groups
    (width_bucket edge bins 0 and buckets+1 catch out-of-range scores).
    Output: (bucket, n, mean_score, positive_rate)."""
    lab = F.col(label_col).cast("int").cast("double")
    return (
        df.select(
            F.width_bucket(
                F.col(score_col), F.lit(0.0), F.lit(1.0), F.lit(buckets)
            ).alias("bucket"),
            F.col(score_col).alias("_s"),
            lab.alias("_y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            prnd(F.avg("_s"), 6).alias("mean_score"),
            prnd(F.avg("_y"), 6).alias("positive_rate"),
        )
    )


def train_hashed_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    max_iter: int = 30,
    reg_param: float = 0.0,
    sample_rows: int = 100_000,
    seed: int = 7,
) -> tuple[dict[int, float], float]:
    """Train the hashed bag-of-words quality classifier IN Spark and
    return ``(weights, bias)`` ready for ``hashed_linear_score`` — the
    full CCNet-style loop: weak labels (a lang flag, a source flag, a
    benchmark-overlap bit) → logistic regression → zero-shuffle corpus
    scoring with the trained model.

    Features are term frequencies over the SAME md5 buckets the scorer
    folds over (``hash32(token) % dim``, counts normalized by document
    token count), so the trained logit ``Σ_b w_b·tf_b + b0`` equals the
    scorer's mean-per-token weight + bias EXACTLY — weights transfer
    with no re-featurization.

    Training runs on a bounded sample (``sample_rows``, like the IVF
    codebook: models need thousands of examples, not the corpus); the
    bucket ids are computed JVM-side, and only the sampled (buckets,
    label) rows cross into Python to become ml SparseVectors. Scoring
    the full corpus afterwards stays a pure projection."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    # A bare .limit(sample_rows) is a partition-order PREFIX — on a
    # source- or time-sorted corpus the training set could be a single
    # domain/class. Order by a seeded md5 of the doc id instead: a
    # deterministic uniform shuffle, and orderBy+limit compiles to
    # TakeOrderedAndProject (bounded per-partition heaps, no global
    # sort shuffle).
    prepped = (
        df.select(
            F.transform(toks, lambda t: (hash32(t) % dim).cast("int")).alias(
                "_buckets"
            ),
            F.col(label_col).cast("int").cast("double").alias("_label"),
            F.md5(
                F.concat(F.lit(str(seed)), F.col(id_col).cast("string"))
            ).alias("_shuf"),
        )
        .filter(F.col("_label").isNotNull())
        .orderBy("_shuf")
        .limit(sample_rows)
        .drop("_shuf")
    )

    def to_vec(row):
        from collections import Counter

        c = Counter(row["_buckets"])
        n = max(1, sum(c.values()))
        idx = sorted(c)
        return (
            Vectors.sparse(dim, idx, [c[i] / n for i in idx]),
            float(row["_label"]),
        )

    spark = df.sparkSession
    train = spark.createDataFrame(
        prepped.rdd.map(to_vec), ["features", "label"]
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(train)
    w = model.coefficients
    weights = {int(i): float(w[int(i)]) for i in w.indices} if hasattr(
        w, "indices"
    ) else {i: float(v) for i, v in enumerate(w) if v != 0.0}
    return weights, float(model.intercept)
