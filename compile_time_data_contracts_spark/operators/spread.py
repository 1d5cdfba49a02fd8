"""Scale-adaptive scan spreading for CPU-heavy map stages.

The problem (spark_optimization_guide §2.5, "input skew: one huge
unsplittable file"): parquet splits cannot cross row-group boundaries,
so a table written as a single row group scans as ONE task no matter
how many cores the session has.  Every fixture table at bench scale is
single-row-group, which serializes any expensive pre-shuffle map work
(per-row digests, shingle explosion, percentile partial-aggregation
state, Arrow/Python batch scoring) onto one core while the other 31
idle.

The fix is the guide's own remedy — "repartition immediately after the
read" — made SCALE-ADAPTIVE instead of constant: spread only when the
plan's current partition count is BELOW the session's default
parallelism.  At production scale a 100 TB input already scans with
thousands of row groups/splits, the predicate is false, and no shuffle
is ever added; the round-robin exchange only appears exactly when most
of the machine would otherwise sit idle, and then it moves only the
narrow projection the caller is about to process.

``cosine_pairs_exact_blas`` has carried this pattern since round 7
(operators/similarity.py) — this module just gives it one shared,
documented home.

Correctness scope: round-robin repartition changes row-to-partition
placement and arrival order, so call sites must be order-insensitive —
per-row deterministic expressions feeding commutative aggregation
(min/max/sum/count/collect-to-set), joins, or set ops.  Every adopter
in this package is of that shape; window/rank pipelines (which force
their own hash partitioning anyway) do not use it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_for_compute"]


def spread_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism IF its
    plan currently has fewer partitions — a no-op on any input that
    already scans wide (the 100 TB case), a round-robin fan-out of the
    (narrow, caller-projected) rows when a single-row-group fixture or
    an upstream ``coalesce``/``limit`` would serialize the downstream
    map work onto one core.

    The partition probe compiles the physical plan (no job runs); that
    one-time driver cost is micro against the map work this exists to
    parallelize.  Keep the input projected to the columns the heavy
    stage needs before calling (guide §2.3: project before the
    exchange).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        # a plan that cannot be compiled to an RDD here will fail at
        # action time anyway; never let the probe mask that error path
        return df
    if current >= target:
        return df
    return df.repartition(target)
