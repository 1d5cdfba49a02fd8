"""Structured Streaming event-time operators (Q41-Q44 streaming forms).

The engine's streaming surface is idiomatic Structured Streaming:
``readStream`` with an explicit contract schema (file sources must never
infer), event-time windows via ``F.window``/``F.session_window``,
``withWatermark`` for bounded state + late-data drop, and
``dropDuplicatesWithinWatermark`` for stateful dedup.

Batch/stream equivalence: a complete-mode run over a static file feed
must equal the batch aggregation — tests/test_streaming.py asserts this,
plus true append-mode late-row dropping with a two-batch feed.
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import EventsRaw
from ..contracts.schema import spark_schema

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "run_stream_to_memory",
]


def events_stream(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the events table with the contract schema
    pinned explicitly (streaming sources cannot infer).  The path must be
    a directory; use ``glob`` to select specific files inside it.  The
    on-disk TIMESTAMP(NANOS) ts reads as long and converts via integer
    division, as in the batch loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(spark_schema(EventsRaw)).format("parquet")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory).withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    )


def tumbling_counts(
    stream: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window counts: the canonical streaming agg.
    State for a window is dropped once the watermark passes its end; rows
    later than the watermark are dropped in append mode."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
        )
    )


def sliding_counts(
    stream: DataFrame,
    watermark: str = "1 hour",
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
        )
    )


def session_counts(
    stream: DataFrame, watermark: str = "1 hour", gap: str = "30 minutes"
) -> DataFrame:
    """Session windows require a watermark in streaming mode."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Stateful streaming dedup with bounded state
    (dropDuplicatesWithinWatermark)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "ctdc_q44_sink",
) -> DataFrame:
    """Run the watermarked tumbling agg over the static events feed to
    completion (availableNow trigger, complete mode) and return the final
    result table.  Complete mode emits full state, so the result equals
    the batch aggregation regardless of file->batch slicing."""
    stream = events_stream(spark, sf_dir, glob="events.parquet")
    agg = tumbling_counts(stream)
    query = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(query_name)
