"""Structured Streaming tests: batch/stream equivalence, late-data drop
under a watermark, stateful dedup.

The feed is a temp directory of parquet files with controlled
modification times so the file source's batch order is deterministic
(`maxFilesPerTrigger=1` + mtime ordering).
"""

from __future__ import annotations

import datetime
import os
import shutil
import time
from typing import Optional

import pytest
from pyspark.sql import functions as F

from compile_time_data_contracts_spark.streaming.windows import (
    dedup_within_watermark,
    events_stream,
    run_stream_to_memory,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_equals_batch_tumbling(spark):
    """Complete-mode availableNow run over the static events feed must
    equal the batch aggregation exactly."""
    from compile_time_data_contracts_spark.catalog import load_table

    result = run_stream_to_memory(spark, SF_DIR, query_name="t_eq_batch")
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
        )
    )
    got = {(r.window_start, r.n) for r in result.collect()}
    want = {(r.window_start, r.n) for r in batch.collect()}
    assert got == want and len(got) > 0


def _write_feed(spark, base, batches):
    """Write one parquet file per batch with increasing mtimes so the
    file stream processes them in order (library write_ordered_feed)."""
    from compile_time_data_contracts_spark.streaming.windows import (
        write_ordered_feed,
    )

    write_ordered_feed(
        [
            spark.createDataFrame(
                rows, "event_id long, user_id long, ts timestamp, value double"
            )
            for rows in batches
        ],
        base,
    )


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append mode with a 1-hour watermark: a row arriving in batch 2
    that is older than (max_ts_seen - 1h) must be dropped; a late-but-
    within-watermark row must still be counted."""
    from pyspark.sql import types as T
    import datetime as dt

    base = str(tmp_path / "feed")
    ts = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    _write_feed(
        spark,
        base,
        [
            # batch 0: events up to 12:00 -> watermark 11:00 after commit
            [(1, 1, ts(9, 30), 1.0), (2, 1, ts(12, 0), 1.0)],
            # batch 1: keep-alive — the late-row FILTER uses the
            # watermark lagging one batch behind the reported value, so
            # the 11:00 watermark only becomes effective in batch 2
            [(6, 1, ts(12, 30), 1.0)],
            # batch 2: 09:45's window end (10:00) < effective watermark
            # (11:00) -> DROPPED; 11:30 is within watermark -> counted
            [(3, 1, ts(9, 45), 1.0), (4, 1, ts(11, 30), 1.0)],
            # batch 3: push the watermark past 13:00 so the 11:00 and
            # 12:00 windows close and emit in append mode
            [(5, 1, ts(15, 0), 1.0)],
        ],
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(base)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.ws, r.n) for r in spark.table("t_late_drop").collect()}
    # 09:00 window: only event 1 (event 3 dropped as late)
    assert ("09:00", 1) in got
    # 11:30 arrived late but within watermark -> counted
    assert ("11:00", 1) in got
    # 12:00 window holds events 2 and 6
    assert ("12:00", 2) in got


def test_dedup_within_watermark(spark, tmp_path):
    import datetime as dt

    base = str(tmp_path / "dedup_feed")
    ts = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    _write_feed(
        spark,
        base,
        [
            [(1, 1, ts(10), 1.0), (1, 1, ts(10, 5), 1.0)],  # dup in-batch
            [(1, 1, ts(10, 10), 1.0), (2, 1, ts(10, 20), 1.0)],  # dup cross-batch
        ],
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(base)
    )
    out = dedup_within_watermark(stream, ["event_id"], watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = [r.event_id for r in spark.table("t_dedup_wm").collect()]
    assert sorted(ids) == [1, 2]


def test_events_stream_schema_pinned(spark):
    """Streaming reads must use the contract schema, never inference."""
    s = events_stream(spark, SF_DIR, glob="events.parquet")
    assert s.isStreaming
    assert dict(
        (f.name, f.dataType.simpleString()) for f in s.schema.fields
    )["ts"] == "timestamp"
    agg = tumbling_counts(s)
    assert "window_start" in agg.columns


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    the last 'update'-mode emission per user equals the batch totals."""
    import datetime as dt

    from compile_time_data_contracts_spark.streaming.stateful import (
        running_user_totals,
    )

    base = str(tmp_path / "state_feed")
    ts = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    _write_feed(
        spark,
        base,
        [
            [(1, 1, ts(10), 2.0), (2, 2, ts(10, 5), 3.0)],
            [(3, 1, ts(11), 5.0)],  # user 1 again -> state carries over
        ],
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(base)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_stateful").collect()
    # last emission per user (memory sink appends every update)
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.total_value)
    assert final[1] == (2, 7.0)  # two events, 2.0 + 5.0, across batches
    assert final[2] == (1, 3.0)


def test_stream_stream_interval_join(spark, tmp_path):
    """Each click joins purchases by the same user within the preceding
    hour; a purchase outside the interval must not match."""
    import datetime as dt

    from pyspark.sql import types as T

    from compile_time_data_contracts_spark.streaming.joins import (
        interval_join,
    )

    ts = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    _write_feed(spark, clicks_dir, [
        [(1, 1, ts(12, 0), 1.0), (2, 2, ts(12, 30), 1.0)],
    ])
    _write_feed(spark, buys_dir, [
        [(10, 1, ts(11, 40), 5.0),   # within 1h before click 1 -> match
         (11, 2, ts(9, 0), 7.0)],    # 3.5h before click 2 -> no match
    ])
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    clicks = spark.readStream.schema(schema).parquet(clicks_dir)
    buys = (
        spark.readStream.schema(schema).parquet(buys_dir)
        .withColumnRenamed("event_id", "buy_id")
        .withColumnRenamed("value", "buy_value")
    )
    joined = interval_join(
        clicks, buys, on="user_id", upper="1 hour"
    ).select("l.event_id", "r.buy_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.event_id, r.buy_id) for r in spark.table("t_ssjoin").collect()}
    assert got == {(1, 10)}


def test_contract_pinned_streaming_sink(spark, tmp_path):
    """foreachBatch sink pins every micro-batch: the green stream lands,
    a drifted stream fails the query with the schema mismatch."""
    from dataclasses import dataclass

    from pyspark.sql import types as T

    from compile_time_data_contracts_spark import (
        SchemaMismatchError,
        SchemaPolicy,
        Sink,
    )
    from compile_time_data_contracts_spark.contracts.shape import contract
    from compile_time_data_contracts_spark.streaming.joins import (
        write_stream_with_contract,
    )

    @contract
    @dataclass
    class Event:
        event_id: int
        user_id: int
        ts: datetime.datetime
        value: Optional[float] = None

    ts = lambda h: datetime.datetime(2024, 1, 1, h)
    feed = str(tmp_path / "pin_feed")
    _write_feed(spark, feed, [[(1, 1, ts(10), 1.0), (2, 2, ts(11), 2.0)]])
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = spark.readStream.schema(schema).parquet(feed)
    out = str(tmp_path / "pinned_out")
    q = write_stream_with_contract(
        stream,
        Sink(Event, out),
        SchemaPolicy.EXACT,
        checkpoint=str(tmp_path / "ckpt1"),
        query_name="t_pin_green",
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 2

    # drifted stream: an extra column trips the per-batch pin
    drifted = stream.withColumn("surprise", F.lit("x"))
    q2 = write_stream_with_contract(
        drifted,
        Sink(Event, str(tmp_path / "pinned_out2")),
        SchemaPolicy.EXACT,
        checkpoint=str(tmp_path / "ckpt2"),
        query_name="t_pin_red",
    )
    with pytest.raises(Exception) as exc:
        q2.awaitTermination()
    assert "surprise" in str(exc.value) or "SchemaMismatch" in str(exc.value)


def test_transform_with_state_gated_on_protobuf(spark):
    """The transformWithState path needs protobuf (its Python
    state-server protocol).  When absent the operator must refuse with
    a clear error instead of crashing the streaming runner; when
    present the gate must match the batch GROUP BY."""
    import pytest

    from compile_time_data_contracts_spark.streaming.stateful import (
        running_user_totals_tws,
        tws_available,
        tws_totals_gate,
    )

    if not tws_available():
        import tempfile

        feed = tempfile.mkdtemp(prefix="ctdc-tws-guard-")
        spark.createDataFrame(
            [(1, 1.0)], "user_id long, value double"
        ).write.mode("overwrite").parquet(feed)
        stream = spark.readStream.schema(
            "user_id long, value double"
        ).parquet(feed)
        with pytest.raises(RuntimeError, match="protobuf"):
            running_user_totals_tws(stream)
        return
    out = tws_totals_gate(spark, "/root/testdata/sf0.001")
    from compile_time_data_contracts_spark.catalog import load_table
    from pyspark.sql import functions as F

    expect = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value_r"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_idempotent_sink_redelivery_is_a_noop(spark, tmp_path):
    """Re-invoking the batch writer with the same (rows, batch_id) must
    leave the table row-identical; with CHANGED rows it must REPLACE the
    batch partition (overwrite semantics), never append."""
    from compile_time_data_contracts_spark.streaming.joins import (
        idempotent_batch_writer,
    )

    out = str(tmp_path / "sink")
    w = idempotent_batch_writer(out)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    w(b0, 0)
    w(b1, 1)
    rows = sorted(map(tuple, spark.read.parquet(out).drop("__batch_id").collect()))
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    # same batch redelivered -> no duplicates
    w(b0, 0)
    assert sorted(
        map(tuple, spark.read.parquet(out).drop("__batch_id").collect())
    ) == rows
    # changed batch 0 -> replaced, batch 1 untouched
    w(spark.createDataFrame([(9, "z")], "id long, v string"), 0)
    assert sorted(
        map(tuple, spark.read.parquet(out).drop("__batch_id").collect())
    ) == [(3, "c"), (9, "z")]
