"""Count-min sketch: mergeable frequency estimation in one pass.

The sketch family member the corpus tier was missing (HLL-style
distinct counting rides Spark's native ``approx_count_distinct``;
CMS answers the OTHER streaming question — "roughly how often does
THIS value occur?" — in fixed memory). A CMS is a ``depth × width``
counter matrix: each value increments one counter per row (an
independent hash per row); a point estimate is the MIN over rows,
which always over-counts (collisions only add), with error ≤ εN at
width ≈ e/ε with probability 1−(1/2)^depth.

Spark-first shape: the corpus reduces to DISTINCT-value counts first
(one corpus-sized shuffle — the aggregation every frequency question
pays anyway), then each distinct value explodes into ``depth``
(row, col, n) contributions and a vocabulary-sized groupBy sums the
counters — the sketch is a tiny DataFrame (≤ depth·width rows), so it
broadcasts, persists as parquet, and MERGES with plain union+sum
(counter matrices are linear). Hashes are the repo's portable
md5-derived convention, so a DuckDB twin replicates the sketch — and
the estimates — bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash, spread_partitions


def _cms_col(value: Column, row: int, width: int) -> Column:
    """Counter column for ``value`` in sketch row ``row``: the portable
    60-bit md5 hash under seed ``cms{row}``, mod width. DuckDB twin:
    CAST('0x' || substr(md5('cms{row}' || v), 1, 15) AS BIGINT) % w."""
    return portable_hash(value, seed=f"cms{row}") % width


def cms_build(
    df: DataFrame,
    value_col: str = "value",
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, col, n) with one entry per OCCUPIED
    counter (absent counter == 0). ``weight_col``: optional
    pre-aggregated multiplicities (skip when ``df`` is one row per
    occurrence). NULL values are excluded — a NULL has no frequency
    identity (count it upstream if you need the null rate)."""
    vals = spread_partitions(df).filter(F.col(value_col).isNotNull())
    if weight_col is None:
        counts = vals.groupBy(value_col).agg(
            F.count(F.lit(1)).cast("long").alias("_n")
        )
    else:
        counts = vals.groupBy(value_col).agg(
            F.sum(weight_col).cast("long").alias("_n")
        )
    entries = counts.select(
        F.posexplode(
            F.array(
                *[
                    _cms_col(F.col(value_col), r, width)
                    for r in range(depth)
                ]
            )
        ).alias("row", "col"),
        F.col("_n"),
    )
    return entries.groupBy("row", "col").agg(
        F.sum("_n").cast("long").alias("n")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (width, depth): counter
    matrices are linear, so union + sum. The distributed-ingest shape:
    each partition/day/shard builds its own sketch, merges roll up."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str = "value",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for every value in ``queries``: min over the
    depth rows of the matching counters — always ≥ the true count
    (collisions only ADD), the CMS one-sided error contract. The
    sketch side is ≤ depth·width rows, so the join broadcasts; a
    counter row missing from the sketch means 0 (only possible for
    values never inserted). Output: (value, est: long)."""
    probes = queries.select(
        F.col(value_col),
        F.posexplode(
            F.array(
                *[
                    _cms_col(F.col(value_col), r, width)
                    for r in range(depth)
                ]
            )
        ).alias("row", "col"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )
