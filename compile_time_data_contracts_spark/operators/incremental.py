"""Incremental aggregate maintenance: algebraic state, merged not
recomputed.

At 100 TB the difference between "refresh the rollup" meaning *re-scan
the corpus* and meaning *aggregate the new batch and merge* is the
whole game.  Count/sum/min/max are algebraic: partial states merge by
(sum, sum, min, max), and derived measures (avg = sum/count) finalize
from the merged state.  So a materialized rollup is maintained by

    state' = merge(state, aggregate_state(delta))

touching only delta-sized input plus the state table (keys-sized, not
corpus-sized) — the same partial/final split Spark's own HashAggregate
performs inside one query, lifted across *queries* via a persisted
state table.

Median is NOT algebraic; distinct-count is handled the way 100 TB
rollups handle it — as an HLL SKETCH column in the state (``hlls``
spec): fixed-size bytes per key, merged by union, estimated at
finalize.  Exactness becomes a contract (est within tolerance of
exact, gate-checked by q214) instead of a recompute.

The merge itself is a union + re-aggregate — deliberately, instead of
a full-outer join: Spark plans it as one hash aggregation with
map-side partial combine, there is no null-fighting on join misses,
and merging n states is the same single shuffle as merging two.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "aggregate_state",
    "versioned_state_merger",
    "merge_aggregate_states",
    "finalize_state",
]


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    hlls: Sequence[str] = (),
    bors: Sequence[str] = (),
) -> DataFrame:
    """Per-key algebraic aggregate state: row count plus sum/min/max of
    the named measure columns, plus an HLL sketch (fixed-size bytes,
    DataSketches) per ``hlls`` column for mergeable distinct counts.
    The output is keys-sized and mergeable with any other state over
    the same spec via :func:`merge_aggregate_states`."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sums]
    # per-column NON-NULL counts ride with every sum: finalize's
    # avg_<c> must divide by the rows that actually contributed to
    # sum_<c> — dividing by the total row count n silently understates
    # the average of any nullable measure (sum skips nulls, n doesn't)
    aggs += [F.count(c).cast("bigint").alias(f"cnt_{c}") for c in sums]
    aggs += [F.min(c).alias(f"min_{c}") for c in mins]
    aggs += [F.max(c).alias(f"max_{c}") for c in maxs]
    aggs += [F.hll_sketch_agg(c).alias(f"hll_{c}") for c in hlls]
    # bit_or is algebraic exactly like sum/min/max: the merged mask of
    # two partial masks is their bit_or — the bitmap-audience state
    # (q317/q331) rides the same machinery
    aggs += [F.expr(f"bit_or({c})").alias(f"bor_{c}") for c in bors]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    hlls: Sequence[str] = (),
    bors: Sequence[str] = (),
) -> DataFrame:
    """Merge any number of aggregate states over the same spec:
    counts and sums add, mins min, maxs max.  Keys present in only one
    state pass through (the union contributes a single partial row).

    One shuffle total regardless of how many states are merged, with
    map-side partial combine (audited: partial+final HashAggregate in
    ``tools/plan_audit.py``).  Equivalent to re-aggregating the
    concatenated inputs — which is the correctness oracle for q206."""
    if not states:
        raise ValueError("need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    aggs = [F.sum("n").cast("bigint").alias("n")]
    aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sums]
    aggs += [
        F.sum(f"cnt_{c}").cast("bigint").alias(f"cnt_{c}") for c in sums
    ]
    aggs += [F.min(f"min_{c}").alias(f"min_{c}") for c in mins]
    aggs += [F.max(f"max_{c}").alias(f"max_{c}") for c in maxs]
    aggs += [F.hll_union_agg(f"hll_{c}").alias(f"hll_{c}") for c in hlls]
    aggs += [F.expr(f"bit_or(bor_{c})").alias(f"bor_{c}") for c in bors]
    return u.groupBy(*keys).agg(*aggs)


def finalize_state(
    state: DataFrame,
    avgs: Sequence[str] = (),
    distinct_estimates: Sequence[str] = (),
) -> DataFrame:
    """Derive non-algebraic measures from a merged state:
    ``avg_<c> = sum_<c> / cnt_<c>`` (the per-column non-null count the
    state carries — dividing by the total row count would understate
    nullable measures, diverging from AVG) and ``est_distinct_<c>``
    (HLL estimate) for each requested column.  Finalization is a
    projection — no shuffle — so it can run on every refresh."""
    out = state
    for c in avgs:
        out = out.withColumn(
            f"avg_{c}", F.col(f"sum_{c}") / F.col(f"cnt_{c}")
        )
    for c in distinct_estimates:
        out = out.withColumn(
            f"est_distinct_{c}", F.hll_sketch_estimate(f"hll_{c}")
        )
    return out


def versioned_state_merger(
    state_base: str,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    hlls: Sequence[str] = (),
    bors: Sequence[str] = (),
):
    """``foreachBatch`` handler maintaining a VERSIONED aggregate-state
    table: epoch e writes ``{state_base}/v{e}`` = merge(v{e-1},
    aggregate_state(batch)).  This is streaming materialized-view
    maintenance with exactly-once semantics by construction — a
    redelivered epoch (crash between sink write and checkpoint commit)
    rewrites ITS OWN version from the same inputs, so downstream reads
    of any committed version are unaffected; an append-style state sink
    would double-count the replayed batch.

    Per epoch the work is O(batch) + O(|keys|): one partial-combined
    aggregation of the micro-batch and one union-re-aggregate against
    the previous keys-sized state — history is never re-scanned, which
    is the point at 100 TB of accumulated input.

    A missing predecessor version for epoch > 0 raises instead of
    silently restarting the rollup from empty (broken state lineage
    must fail loudly).  Local-filesystem existence check; on HDFS/S3
    substitute the FileSystem API."""
    import os

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        e = int(epoch_id)
        parts = [
            aggregate_state(
                batch_df, keys, sums=sums, mins=mins, maxs=maxs,
                hlls=hlls, bors=bors,
            )
        ]
        if e > 0:
            prev = f"{state_base}/v{e - 1}"
            if not os.path.exists(os.path.join(prev, "_SUCCESS")):
                raise ValueError(
                    f"state lineage broken: {prev} missing for epoch {e}"
                )
            parts.append(spark.read.parquet(prev))
        merge_aggregate_states(
            parts, keys, sums=sums, mins=mins, maxs=maxs, hlls=hlls,
            bors=bors,
        ).write.mode("overwrite").parquet(f"{state_base}/v{e}")

    return handle
