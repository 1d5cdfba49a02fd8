"""Per-round timing of connected_components_star on q152/q101-shaped
input: which part of each alternation costs what at sf0.1.

Diagnostic only (optimization round 1): copies the operator loop with
timers around (plan build, checkpoint job, signature job).

Usage: python tools/profile_cc.py [sf_dir] [q101|q152]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "q152"

    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession, Window

    from compile_time_data_contracts_spark.catalog import load_table
    from compile_time_data_contracts_spark.operators.dedup import (
        _ensure_checkpoint_dir,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ctdc-profile-cc")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    if which == "q101":
        edges_src = (
            ev.withColumn("__prev", F.lag("event_id").over(w))
            .filter(F.col("__prev").isNotNull())
            .select(F.col("__prev").alias("doc_a"),
                    F.col("event_id").alias("doc_b"))
        )
    else:
        # q152 shape: same lag-window edge pipeline (the incremental CC
        # gate's first batch) — close enough for round profiling
        edges_src = (
            ev.withColumn("__prev", F.lag("event_id").over(w))
            .filter(F.col("__prev").isNotNull())
            .select(F.col("__prev").alias("doc_a"),
                    F.col("event_id").alias("doc_b"))
        )

    a_col, b_col = "doc_a", "doc_b"
    sc = spark.sparkContext
    _ensure_checkpoint_dir(sc)

    t_total0 = time.time()
    cached = edges_src.select(F.col(a_col), F.col(b_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t0 = time.time()
    all_nodes = (
        cached.select(F.col(a_col).alias("node"))
        .union(cached.select(F.col(b_col).alias("node")))
        .distinct()
        .checkpoint(eager=True)
    )
    print(f"all_nodes checkpoint: {time.time()-t0:6.2f}s")
    t0 = time.time()
    edges = (
        cached.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .checkpoint(eager=True)
    )
    print(f"edges checkpoint:     {time.time()-t0:6.2f}s")
    cached.unpersist()

    def _signature(e):
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    t0 = time.time()
    sig = _signature(edges)
    print(f"sig0 ({sig[0]} edges): {time.time()-t0:6.2f}s")

    for it in range(30):
        t_round0 = time.time()
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .distinct()
        )
        t_build = time.time() - t_round0
        t0 = time.time()
        edges = small.checkpoint(eager=True)
        t_ckpt = time.time() - t0
        t0 = time.time()
        new_sig = _signature(edges)
        t_sig = time.time() - t0
        print(
            f"round {it}: build={t_build:5.2f}s ckpt={t_ckpt:5.2f}s "
            f"sig={t_sig:5.2f}s n_edges={new_sig[0]}"
        )
        if new_sig == sig:
            break
        sig = new_sig
    print(f"TOTAL: {time.time()-t_total0:6.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
