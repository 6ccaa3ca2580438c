"""Round-16 OPTIMIZATION tooling (optimization round 2).

Subcommands:
  plans <tag> <query...>   — write .explain("formatted") for each query to
                             plans/r16/<query>_<tag>.txt (tag: before|after)
  time <query...>          — isolated best-of-3 wall (fresh warmed session,
                             noop sink, unpersist+GC between runs; the
                             r6/r7/r13/r14 protocol). Always times the
                             control query (dedup_jaccard) first so the
                             window's inflation factor is on record.
  cold <query> [n]         — FRESH-session first-touch profile: run the
                             query n times (default 3) in a new session
                             with only the generic warmup (no family
                             warmup), printing each run separately. This
                             is the instrument for the codegen-first-touch
                             disease (VERDICT r15 #1: dedup_fuzzy_incremental
                             50.1s run-1 vs 6.1s run-3).
  coldoff <query> [n]      — like cold, but with whole-stage codegen
                             DISABLED (spark.sql.codegen.wholeStage=false)
                             to attribute run-1 cost to codegen compile vs
                             other first-touch work.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r16",
)
CONTROL = "dedup_jaccard"  # untouched since r11; quiet baseline 1.61s sf0.1


def _cleanup(spark) -> None:
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()
    except Exception as e:  # noqa: BLE001
        print(f"cleanup failed: {e!r}", file=sys.stderr)


def _session(extra_conf: dict | None = None):
    import __spark_entry__ as entrymod
    from datamancer_spark import get_spark

    spark = get_spark(app_name="r16-opt", extra_conf=extra_conf or {})
    qs = entrymod.queries()
    # untimed warmup: JVM, parquet footers, Arrow worker pool
    try:
        qs["q6_revenue_delta"](spark, SF_DIR).count()
        spark.range(64).repartition(8).mapInPandas(
            lambda it: (pdf for pdf in it), "id long"
        ).count()
    except Exception as e:  # noqa: BLE001
        print(f"warmup failed: {e!r}", file=sys.stderr)
    return spark, qs


def plans(tag: str, names: list[str]) -> None:
    spark, qs = _session()
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(txt)
        ex = txt.count("Exchange")
        sc = txt.count("Scan parquet")
        print(f"{name}: wrote {out} ({ex} Exchange / {sc} 'Scan parquet')")
        _cleanup(spark)


def _run_once(spark, qs, name) -> float:
    t0 = time.time()
    qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def time_queries(names: list[str]) -> None:
    spark, qs = _session()
    # run the control twice and report the WARM reading: the first
    # dedup-family query in a fresh session pays ~3-4s of JVM JIT
    # warm-up (r16 cold/coldoff attribution), which would mask the
    # host-noise signal the control exists to measure
    ctl = [_run_once(spark, qs, CONTROL) for _ in range(2)]
    _cleanup(spark)
    print(f"control {CONTROL}: {ctl[1]} warm (runs {ctl}; quiet baseline 1.61)")
    for name in names:
        runs = []
        for _ in range(3):
            runs.append(_run_once(spark, qs, name))
            _cleanup(spark)
        print(f"{name}: best {min(runs)}  runs {runs}")


def cold(name: str, n: int = 3, codegen: bool = True) -> None:
    conf = {} if codegen else {"spark.sql.codegen.wholeStage": "false"}
    spark, qs = _session(conf)
    runs = []
    for _ in range(n):
        runs.append(_run_once(spark, qs, name))
        _cleanup(spark)
    tag = "codegen=on" if codegen else "codegen=OFF"
    print(f"{name} [{tag}]: runs {runs}")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "plans":
        plans(sys.argv[2], sys.argv[3:])
    elif cmd == "time":
        time_queries(sys.argv[2:])
    elif cmd == "cold":
        cold(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "coldoff":
        cold(
            sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
            codegen=False,
        )
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
