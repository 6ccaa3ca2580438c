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
