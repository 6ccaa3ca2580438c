"""TF-IDF / BM25 term scoring — relational formulation.

Beyond-reference (SURVEY §2.12): term-relevance scoring for text
pipelines. Everything is explode → groupBy → join (Catalyst-native,
partial aggregation everywhere); the idf table is tiny (vocabulary-
sized) and broadcasts into the scoring join.

Definitions (standard smooth variants, replicated exactly in the DuckDB
oracle):
    tf(t, d)  = count of t in d
    df(t)     = number of docs containing t
    idf(t)    = ln((N + 1) / (df + 1)) + 1
    tfidf     = tf · idf
    bm25(t,d) = idf_bm25 · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    idf_bm25  = ln(1 + (N − df + 0.5)/(df + 0.5))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import prnd
from ..session import materialize
from .dedup import spread_partitions, tokens


def term_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf) — lowercased whitespace terms."""
    return (
        spread_partitions(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_freq(tc: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return tc.groupBy("term").agg(F.count_distinct(id_col).alias("df"))


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """(id, term, tf, tfidf) — optionally only each doc's top_k terms
    (deterministic tie-break on term)."""
    tc = term_counts(df, text_col, id_col)
    n_docs = df.count()  # one count job; at scale pass a known N upstream
    idf = doc_freq(tc, id_col).withColumn(
        "idf", F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    )
    scored = tc.join(F.broadcast(idf), "term").select(
        F.col(id_col),
        "term",
        "tf",
        prnd(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    if top_k is None:
        return scored
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .drop("rk")
    )


def bm25(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, term, bm25) — Okapi BM25 per term/doc. The term-count table
    (the expensive tokenize+shuffle stage) is materialized once via
    localCheckpoint: it feeds the avgdl job, the doc-length join, and the
    doc-frequency aggregation — uncached it would execute three times."""
    tc = materialize(term_counts(df, text_col, id_col))
    n_docs = df.count()
    dl = tc.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    if avgdl is None:  # empty corpus → empty result via the joins below
        avgdl = 1.0
    idf = doc_freq(tc, id_col).withColumn(
        "idf",
        F.log(
            1.0
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
    )
    return (
        tc.join(dl, id_col)
        .join(F.broadcast(idf), "term")
        .select(
            F.col(id_col),
            "term",
            prnd(
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (1 - b + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
                ),
                6,
            ).alias("bm25"),
        )
    )
