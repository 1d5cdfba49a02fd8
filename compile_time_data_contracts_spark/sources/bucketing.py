"""Bucketed tables: shuffle-free co-located joins for repeated join keys.

At 100 TB the same fact-to-fact join key (orderkey, custkey, doc_id) is
joined over and over; bucketing pays the shuffle ONCE at write time —
rows are hash-partitioned into a fixed bucket count on disk — and every
subsequent equi-join or aggregation on the bucket key runs with zero
Exchange on that side (SortMergeJoin reads co-located buckets directly).

Spark's bucketing rides the session catalog (`saveAsTable`), so these
helpers wrap the write/read pair; `tests/test_bucketing.py` asserts the
join plan contains no Exchange over the bucketed sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols`` into ``buckets``
    files per partition (and optionally sorted within buckets, which
    upgrades the co-located join's sort step to a merge of pre-sorted
    runs)."""
    writer = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With
    matching bucket specs Catalyst plans a SortMergeJoin whose children
    read bucket files directly — no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
