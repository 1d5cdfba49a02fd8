"""Time a SUBSET of the declared queries with bench.py's methodology
(one sf0.001 warm pass, then N interleaved timed passes at the target
SF, noop sink, min-per-query estimator) without paying for the other
~380 registry entries.  For optimization-round A/B work only — the
official numbers stay bench.py's.

Usage: python tools/time_subset.py q84_stateful_running_totals q100_... \
         [--repeats 3] [--sf /root/testdata/sf0.1] [--no-warm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    repeats = 3
    sf_dir = "/root/testdata/sf0.1"
    warm = True
    names: list[str] = []
    it = iter(range(len(argv)))
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--repeats":
            repeats = int(argv[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = argv[i + 1]; i += 2
        elif a == "--no-warm":
            warm = False; i += 1
        else:
            names.append(a); i += 1

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ctdc-time-subset")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "true"
        )  # GC-reclaim per-call checkpoint files during long runs
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if warm:
        for n in names:
            try:
                qs[n](spark, "/root/testdata/sf0.001").write.mode(
                    "overwrite"
                ).format("noop").save()
            except Exception:
                pass

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for n in names:
            spark.sparkContext.setJobDescription(n)
            t0 = time.time()
            qs[n](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples[n].append(round(time.time() - t0, 3))
    out = {
        n: {"min": min(ts), "all": ts} for n, ts in samples.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
