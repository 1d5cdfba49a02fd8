"""A/B the window-min star-contraction round body vs the groupBy+join
body on the q101 edge shape, asserting identical fixed points.

Usage: python tools/profile_cc2.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

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
        .appName("ctdc-profile-cc2")
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
    sc = spark.sparkContext
    _ensure_checkpoint_dir(sc)

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    pairs = (
        ev.withColumn("__prev", F.lag("event_id").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.col("__prev").alias("doc_a"),
                F.col("event_id").alias("doc_b"))
    )
    cached = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    edges0 = (
        cached.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .checkpoint(eager=True)
    )
    cached.unpersist()

    def _signature(e):
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def run(kind: str):
        edges = edges0
        sig = _signature(edges)
        t0 = time.time()
        for it in range(30):
            sym = edges.union(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            if kind == "join":
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
            else:
                wu = Window.partitionBy("u")
                lm = F.least(F.col("u"), F.min("v").over(wu))
                large = (
                    sym.withColumn("m", lm)
                    .filter(F.col("v") > F.col("u"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                )
                l2 = large.withColumn("m", F.min("v").over(wu))
                small = (
                    l2.filter(F.col("v") != F.col("m"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                    .union(l2.select("u", F.col("m").alias("v")))
                    .distinct()
                )
            edges = small.checkpoint(eager=True)
            new_sig = _signature(edges)
            if new_sig == sig:
                break
            sig = new_sig
        print(f"{kind}: {time.time()-t0:6.2f}s rounds={it+1} edges={sig[0]}")
        return edges

    e_join = run("join")
    e_win = run("window")
    diff = e_join.exceptAll(e_win).count() + e_win.exceptAll(e_join).count()
    print(f"fixed-point diff rows: {diff}")
    # run again in reverse order to control for session warm-up
    run("window")
    run("join")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
