"""Driver-contract shape guards: the correctness driver checks only the
FIRST 50 entries of queries() in dict order, so ordering is load-bearing;
and every query must have a DuckDB oracle twin with aligned columns."""

import __spark_entry__ as e

NORTH_STAR = [
    "sessionize_events",
    "pipeline_clean_corpus",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_verified",
    "dedup_embedding_bucketed",
    "knn_brute",
    "knn_ivf",
    "embedding_stats",
    "token_topk_lang",
    "budget_select_langs",
    "length_filter_langs",
    "dup_cluster_histogram",
    "mixture_resample_langs",
    "pack_sequences_bins",
    "train_test_split",
]


def test_north_star_inside_driver_window():
    window = list(e.queries().keys())[:50]
    missing = [q for q in NORTH_STAR if q not in window]
    assert not missing, f"north-star queries outside the 50-entry window: {missing}"


def test_every_query_has_an_oracle():
    q = set(e.queries().keys())
    o = set(e.oracle_sql().keys())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
    assert q <= o, f"queries without oracles: {sorted(q - o)}"


def test_oracle_sql_is_expanded():
    # prnd() placeholders must be expanded to engine-portable floor form
    for name, sql in e.oracle_sql().items():
        assert "prnd(" not in sql, f"{name}: unexpanded prnd()"


def test_no_risky_duckdb_output_types():
    """No oracle may output HUGEINT/DECIMAL/U*INT columns: pandas-path
    fetching coerces them to float64/object, so a driver that fetches via
    pandas hashes 5.0 where Spark emits 5 (the sessionize_events
    rounds-1..3 hash_match=false root cause). DuckDB-only — fast."""
    import os

    import duckdb

    from tests.oracle_harness import TABLES, risky_oracle_types

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = {}
    for name, sql in e.oracle_sql().items():
        flagged = risky_oracle_types(con, sql)
        if flagged:
            bad[name] = flagged
    assert not bad, f"oracles with pandas-coerced output types: {bad}"
