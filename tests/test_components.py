"""Connected components + canonical dedup."""

import pytest
from pyspark.sql import functions as F


def test_components_chain_and_islands(spark):
    from datamancer_spark.operators.components import connected_components

    # chain 1-2-3-4 (diameter 3, needs multiple rounds), pair 10-11, 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], ["id_a", "id_b"]
    )
    comp = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == 20


def test_components_long_chain_converges(spark):
    from datamancer_spark.operators.components import connected_components

    n = 30
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_dedup_keep_canonical(spark):
    from datamancer_spark.operators.components import dedup_keep_canonical

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"])
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    # {0,1,2} -> keep 0; {4,5} -> keep 4; 3 untouched
    assert kept == [0, 3, 4]


def test_full_near_dup_pipeline(spark):
    """minhash_dedup_verified → components → canonical keep, end to end."""
    from datamancer_spark.operators.components import dedup_keep_canonical
    from datamancer_spark.operators.dedup import minhash_dedup_verified

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),
        (3, "completely different content about spark engines"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_dedup_verified(docs, threshold=0.4)
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert 0 in kept and 3 in kept and 1 not in kept
