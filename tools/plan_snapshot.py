"""Snapshot `.explain("formatted")` for named registry queries into
plans/r11/<query>_<tag>.txt, and time build vs execute.

Usage:
    python tools/plan_snapshot.py TAG [sf_dir] q150_... q152_... ...
    python tools/plan_snapshot.py TAG [sf_dir] --top N   # N slowest per BENCH_DETAIL.json

TAG is usually "before" or "after".  For each query it also prints
  t_build  (python fn call -> DataFrame, includes analysis)
  t_exec   (noop write wall time, warm second run)
so plan-construction fixed costs are separated from execution.  The
session mirrors bench.py's configuration exactly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if not args:
        print(__doc__)
        return 2
    tag = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names: list[str] = []
    if args[:1] == ["--top"]:
        n = int(args[1])
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_DETAIL.json")
        ) as f:
            detail = json.load(f)
        names = [
            k for k, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ]
    else:
        names = args

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ctdc-plan-snapshot")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "true"
        )  # GC-reclaim per-call checkpoint files during long runs
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11",
    )
    os.makedirs(outdir, exist_ok=True)

    # one tiny warm-up so JVM/codegen compile noise stays out of t_exec
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        spark.sparkContext.setJobDescription(f"snapshot:{name}")
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
        except Exception as ex:  # noqa: BLE001 — one bad query must not
            print(f"ERROR {name}: {ex!r}"[:300])  # kill the whole sweep
            continue
        t_build = time.time() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        # first exec warms file-listing + codegen for this plan; the
        # second is the steady-state number comparable to bench min-of-3
        try:
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t_exec_cold = time.time() - t0
            df2 = qs[name](spark, sf_dir)
            t0 = time.time()
            df2.write.mode("overwrite").format("noop").save()
            t_exec = time.time() - t0
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name} (exec): {ex!r}"[:300])
            continue
        n_exchange = plan.count("Exchange")
        rows.append((name, t_build, t_exec_cold, t_exec, n_exchange))
        print(
            f"{name:45s} build={t_build:6.2f}s exec_cold={t_exec_cold:6.2f}s "
            f"exec_warm={t_exec:6.2f}s exchanges={n_exchange}"
        )
    print("\nsummary (sorted by exec_warm+build):")
    for name, tb, tc, te, ne in sorted(rows, key=lambda r: -(r[1] + r[3])):
        print(f"{name:45s} build={tb:6.2f} exec_warm={te:6.2f} exch={ne}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
