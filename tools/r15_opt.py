"""Round-15 OPTIMIZATION tooling.

Subcommands:
  plans <tag> <query...>   — write .explain("formatted") for each query to
                             plans/r15/<query>_<tag>.txt (tag: before|after)
  time <query...>          — isolated best-of-3 wall (fresh warmed session,
                             noop sink, unpersist+GC between runs; the
                             r6/r7/r13/r14 protocol)

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
    "r15",
)


def _cleanup(spark) -> None:
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()
    except Exception as e:  # noqa: BLE001
        print(f"cleanup failed: {e!r}", file=sys.stderr)


def _session():
    import __spark_entry__ as entrymod
    from datamancer_spark import get_spark

    spark = get_spark(app_name="r15-opt")
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
        print(f"{name}: wrote {out} ({ex} Exchange)")
        _cleanup(spark)


def time_queries(names: list[str]) -> None:
    spark, qs = _session()
    for name in names:
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 2))
            _cleanup(spark)
        print(f"{name}: best {min(runs)}  runs {runs}")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "plans":
        plans(sys.argv[2], sys.argv[3:])
    elif cmd == "time":
        time_queries(sys.argv[2:])
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
