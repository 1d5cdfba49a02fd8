"""Top-k per group (Q29) — window row_number + filter.

Spark compiles this to a single hash shuffle on the group key followed
by a per-partition sort.  A hot group key still lands entirely in one
task — AQE's skew optimization splits JOIN partitions, not window
partitions (row_number over a split group would be wrong) — but the
rank<=k filter plans as WindowGroupLimit, which pre-prunes each MAP-side
partition to its local top-k before the shuffle, so the skewed task
receives at most k rows per upstream partition rather than the whole
group.  For global top-k use orderBy().limit(k), which Spark executes
as TakeOrderedAndProject (per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["topk_per_group"]


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
