"""Local replica of the driver's DuckDB differential-oracle gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` twin exists, the same query on DuckDB over the identical
parquet — then compares row count, column names, and an order-insensitive
multiset of stringified values. Usage:

    python tests/oracle_harness.py              # all queries @ sf0.01
    python tests/oracle_harness.py q1_pricing_summary dedup_minhash
    SF_DIR=/root/testdata/sf0.001 python tests/oracle_harness.py
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_value(v):
    """Engine-portable value canonicalization for hashing."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return _norm_value(f)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _row_multiset(rows, col_order):
    return Counter(
        "|".join(_norm_value(row[i]) for i in col_order) for row in rows
    )


# DuckDB types that pandas-path fetching (fetchdf) silently coerces to
# float64/object — the driver's hasher then sees 5.0 where Spark emits 5.
# A windowed/plain sum(INTEGER) yields HUGEINT; this was the 3-round
# sessionize_events hash_match=false root cause. Oracles must CAST these.
RISKY_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


def risky_oracle_types(con, query):
    """Return [(col, type)] oracle output columns whose DuckDB type does
    not survive a pandas fetch bit-identically."""
    rel = con.sql(query)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(str(t).startswith(r) for r in RISKY_DUCK_TYPES)
    ]


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    issues = []
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in duck_cols):
        issues.append(f"schema: spark={s_cols} duck={duck_cols}")
        return False, issues, len(s_rows), len(duck_rows)
    if len(s_rows) != len(duck_rows):
        issues.append(f"rowcount: spark={len(s_rows)} duck={len(duck_rows)}")
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    ms, md = _row_multiset(s_rows, s_order), _row_multiset(duck_rows, d_order)
    if ms != md:
        only_s = list((ms - md).items())[:3]
        only_d = list((md - ms).items())[:3]
        issues.append(f"values: only-spark={only_s} only-duck={only_d}")
    return not issues, issues, len(s_rows), len(duck_rows)


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    want = set(sys.argv[1:])

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from datamancer_spark import get_spark

    spark = get_spark(app_name="oracle-harness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    passed = failed = weak = 0
    for name, fn in qs.items():
        if want and name not in want:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                risky = risky_oracle_types(con, oracles[name])
                cur = con.execute(oracles[name])
                duck_cols = [d[0] for d in cur.description]
                duck_rows = cur.fetchall()
                ok, issues, ns, nd = compare(name, sdf, duck_rows, duck_cols)
                if risky:
                    ok = False
                    issues.append(f"risky duckdb output types (pandas-coerced): {risky}")
                dt = time.time() - t0
                if ok:
                    passed += 1
                    print(f"  PASS  {name:24s} rows={ns:<7d} {dt:5.1f}s")
                else:
                    failed += 1
                    print(f"  FAIL  {name:24s} rows={ns}/{nd} {dt:5.1f}s")
                    for i in issues:
                        print(f"        {i}")
            else:
                n = sdf.count()
                dt = time.time() - t0
                weak += 1
                print(f"  weak  {name:24s} rows={n:<7d} {dt:5.1f}s (no oracle)")
        except Exception as e:
            failed += 1
            print(f"  ERR   {name:24s} {type(e).__name__}: {str(e)[:200]}")
    print(f"\n{passed} pass, {failed} fail, {weak} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
