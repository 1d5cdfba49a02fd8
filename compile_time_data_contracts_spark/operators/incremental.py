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

Median/distinct-count are NOT algebraic; for those keep the sketch
variants (HLL rollup q130, CMS q160) whose merge is union.

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
    "merge_aggregate_states",
    "finalize_state",
]


def _state_cols(sums: Sequence[str], mins: Sequence[str], maxs: Sequence[str]):
    return (
        ["n"]
        + [f"sum_{c}" for c in sums]
        + [f"min_{c}" for c in mins]
        + [f"max_{c}" for c in maxs]
    )


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Per-key algebraic aggregate state: row count plus sum/min/max of
    the named measure columns.  The output is keys-sized and mergeable
    with any other state over the same spec via
    :func:`merge_aggregate_states`."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sums]
    aggs += [F.min(c).alias(f"min_{c}") for c in mins]
    aggs += [F.max(c).alias(f"max_{c}") for c in maxs]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
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
    aggs += [F.min(f"min_{c}").alias(f"min_{c}") for c in mins]
    aggs += [F.max(f"max_{c}").alias(f"max_{c}") for c in maxs]
    return u.groupBy(*keys).agg(*aggs)


def finalize_state(
    state: DataFrame,
    avgs: Sequence[str] = (),
) -> DataFrame:
    """Derive non-algebraic measures from a merged state:
    ``avg_<c> = sum_<c> / n`` for each requested column.  Finalization
    is a projection — no shuffle — so it can run on every refresh."""
    out = state
    for c in avgs:
        out = out.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n"))
    return out
