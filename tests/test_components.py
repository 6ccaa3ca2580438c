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


class TestPageRank:
    def test_hand_solved_fixed_points(self, spark):
        """r11 PageRank: 30 iterations converge to the analytically
        solved fixed points. Star+loop (1,2,3 -> 0, 0 -> 1): leaves
        keep (1-d)/4; dangling chain (0 -> 1): r1 = 0.6491228…
        (solve r0 = .075 + .425 r1; r1 = .075 + .85 r0 + .425 r1)."""
        from datamancer_spark.operators.components import pagerank

        edges = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long"
        )
        got = {r["node"]: r["rank"] for r in pagerank(edges, iters=40).collect()}
        assert abs(got[2] - 0.0375) < 1e-9
        assert abs(got[3] - 0.0375) < 1e-9
        assert abs(sum(got.values()) - 1.0) < 1e-9
        assert got[0] > got[1] > got[2]

        dang = spark.createDataFrame([(0, 1)], "src long, dst long")
        got2 = {r["node"]: r["rank"] for r in pagerank(dang, iters=60).collect()}
        assert abs(got2[1] - 0.13875 / 0.21375) < 1e-6
        assert abs(sum(got2.values()) - 1.0) < 1e-9

    def test_rank_sums_to_one_every_iteration(self, spark):
        from datamancer_spark.operators.components import pagerank

        edges = spark.createDataFrame(
            [(i, (i * 3 + 1) % 20) for i in range(20)]
            + [(i, (i * 7 + 2) % 20) for i in range(0, 20, 2)],
            "src long, dst long",
        )
        for it in (1, 3, 7):
            total = sum(
                r["rank"] for r in pagerank(edges, iters=it).collect()
            )
            assert abs(total - 1.0) < 1e-9, (it, total)

    def test_per_iteration_rounding_is_stable(self, spark):
        """round_decimals=6 gives identical ranks across partition
        layouts (the differential-gate convention)."""
        from datamancer_spark.operators.components import pagerank

        rows = [(i, (i * 5 + 3) % 50) for i in range(50)]
        a = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
        b = spark.createDataFrame(rows, "src long, dst long").repartition(16)
        ra = sorted(map(tuple, pagerank(a, iters=8, round_decimals=6).collect()))
        rb = sorted(map(tuple, pagerank(b, iters=8, round_decimals=6).collect()))
        assert ra == rb


def test_pagerank_null_edges_dropped(spark):
    from datamancer_spark.operators.components import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, None), (None, 1)],
        "src long, dst long",
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert set(got) == {0, 1}
    assert abs(sum(got.values()) - 1.0) < 1e-9


class TestHits:
    def test_hub_and_authority_separation(self, spark):
        """Classic structure: node 0 points at {1,2,3}, node 4 points
        at 1 — 0 is the best hub (it finds every authority), 1 the
        best authority (endorsed by both hubs); pure hubs have zero
        authority and vice versa."""
        from datamancer_spark.operators.components import hits

        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3), (4, 1)], "src long, dst long"
        )
        got = {r["node"]: (r["hub"], r["auth"])
               for r in hits(edges, iters=20).collect()}
        assert got[0][0] > got[4][0] > 0          # hub ordering
        assert got[0][1] == 0.0 and got[4][1] == 0.0
        assert got[1][1] > got[2][1] == got[3][1] > 0
        assert got[1][0] == got[2][0] == got[3][0] == 0.0
        # sum-normalized: each side sums to 1
        assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-9
        assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-9

    def test_rounding_layout_stable_and_nulls_dropped(self, spark):
        from datamancer_spark.operators.components import hits

        rows = [(i, (i * 3 + 1) % 30) for i in range(30)] + [(0, None)]
        a = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
        b = spark.createDataFrame(rows, "src long, dst long").repartition(8)
        ra = sorted(map(tuple, hits(a, iters=5, round_decimals=6).collect()))
        rb = sorted(map(tuple, hits(b, iters=5, round_decimals=6).collect()))
        assert ra == rb
        assert all(r[0] is not None for r in ra)


def test_rounding_guard_rejects_degenerate_resolution(spark):
    """r11 ADVICE witness: per-iteration rounding at a resolution where
    1/n itself rounds to 0 must raise loudly, not degenerate (PageRank
    to the teleport term, HITS to NaN via a zero-sum division)."""
    import pytest

    from datamancer_spark.operators.components import (
        _check_rounding_resolution,
        hits,
        pagerank,
    )

    # direct guard arithmetic: 1/n < 0.5e-rd is the degenerate line
    _check_rounding_resolution(2_000_000, None)  # None is always fine
    _check_rounding_resolution(1_999_999, 6)  # 1/n just above 0.5e-6
    with pytest.raises(ValueError, match="round_decimals"):
        _check_rounding_resolution(2_000_001, 6)

    # end-to-end: a 3-node graph at round_decimals=0 rounds 1/3 -> 0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="round_decimals"):
        pagerank(edges, iters=2, round_decimals=0)
    with pytest.raises(ValueError, match="round_decimals"):
        hits(edges, iters=2, round_decimals=0)


def test_pagerank_early_stop_matches_fixed_at_convergence(spark):
    """r12 early-stop tier (VERDICT r11 #8): with per-iteration
    rounding the power method reaches an exact rounded fixed point;
    tol=0 must stop there, in strictly fewer rounds than the cap, with
    ranks IDENTICAL to the fixed-count form (further iterations change
    nothing at the fixed point)."""
    from datamancer_spark.operators.components import pagerank

    # ring + chords: converges quickly under 1e-6 rounding
    n = 20
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)]
        + [(i, (i * 7 + 3) % n) for i in range(n)],
        "src long, dst long",
    )
    fixed = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, iters=60, round_decimals=6
        ).collect()
    }
    early, rounds = pagerank(
        edges, iters=60, round_decimals=6, tol=0.0, return_rounds=True
    )
    got = {r["node"]: r["rank"] for r in early.collect()}
    assert got == fixed
    assert rounds < 60, "early stop never fired"
    # the scaling story: a conservative fixed cap wastes (60 - rounds)
    # full edge-join rounds after convergence
    assert rounds <= 30


def test_hits_early_stop_matches_fixed_at_convergence(spark):
    """r12: same early-stop contract as pagerank, on the hub vector."""
    from datamancer_spark.operators.components import hits

    n = 20
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)]
        + [(i, i % 4) for i in range(n)],
        "src long, dst long",
    )
    fixed = {
        (r["node"]): (r["hub"], r["auth"])
        for r in hits(edges, iters=40, round_decimals=6).collect()
    }
    early, rounds = hits(
        edges, iters=40, round_decimals=6, tol=0.0, return_rounds=True
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in early.collect()}
    assert got == fixed
    assert rounds < 40, "early stop never fired"
