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
from contextlib import contextmanager

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
    "run_gate_to_memory",
    "gate_state_partitions",
    "write_ordered_feed",
    "write_ordered_feed_parallel",
    "write_sliced_feed",
    "late_drop_counts",
    "stream_dedup_gate",
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
    ts layout is footer-probed like the batch loader
    (catalog.events_ts_is_legacy_nanos): legacy TIMESTAMP(NANOS) files
    read as long and convert via integer division; micros files read
    directly under the semantic Events schema."""
    from ..catalog import Events, events_ts_is_legacy_nanos

    probe_path = f"{directory}/{glob}" if glob else directory
    legacy = events_ts_is_legacy_nanos(spark, probe_path)
    schema = spark_schema(EventsRaw if legacy else Events)
    reader = spark.readStream.schema(schema).format("parquet")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(directory)
    if legacy:
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return stream


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
    table, _ = run_gate_to_memory(agg, query_name, "complete")
    return table


@contextmanager
def gate_state_partitions(spark, n: int = 8):
    """Scoped ``spark.sql.shuffle.partitions`` override for starting a
    BOUNDED-replay streaming gate: state partition count freezes at
    query start, and a KB-sized replay paying the session's 32
    state-store inits/commits per trigger per stateful operator is pure
    fixed cost (measured 24 s → 5.5 s on q199).  Restores the session
    value on exit; semantics unchanged — production streams size this
    to state volume.

    SINGLE-THREADED by design: the override mutates the session-global
    ``spark.sql.shuffle.partitions`` for the whole start→awaitTermination
    span, so any query PLANNED concurrently in the same SparkSession
    would inherit it (or restore a stale saved value on nested use).
    The bench and gate suites run strictly sequentially; if gates ever
    run concurrently, scope the setting via a cloned session
    (``spark.newSession()``) per gate instead."""
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def run_gate_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "append",
    state_partitions: int = 8,
):
    """Shared tail of every streaming gate: drop a stale same-name temp
    view, run ``df`` to a memory sink under an availableNow trigger,
    await completion, and return (result table, terminated query) —
    the query so gates that read ``lastProgress`` (q167) share the same
    path.  One owner for what seven call sites used to copy and drift
    on.

    ``state_partitions``: streaming STATE partition count is frozen at
    query start from ``spark.sql.shuffle.partitions``; a gate replaying
    a bounded feed with the session's 32 pays 32 state-store
    inits/commits per trigger per stateful operator for KB-sized state
    — measured 24 s → 5.5 s on the q199 outer-join replay at sf0.1 by
    right-sizing to 8.  The override is scoped to the query start and
    RESTORED before returning (batch reads of the sink table use the
    session value); it changes no semantics, only state parallelism.
    Production streams size this to state volume — gate replays are
    bounded by construction.  Pass 0 to keep the session setting."""
    spark = df.sparkSession
    if query_name in [t.name for t in spark.catalog.listTables()]:
        spark.catalog.dropTempView(query_name)
    with gate_state_partitions(
        spark, state_partitions
        if state_partitions
        else int(spark.conf.get("spark.sql.shuffle.partitions"))
    ):
        q = (
            df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(query_name), q


def write_ordered_feed_parallel(
    dfs: list[DataFrame], base: str
) -> int:
    """Ordered replay feed WITHOUT the single-writer funnel: each batch
    DataFrame is written at its natural parallelism, then every batch is
    PADDED with empty (schema-only) parquet files to the same file count
    N, with batch i's mtimes all older than batch i+1's.  A file stream
    with ``maxFilesPerTrigger=<returned N>`` therefore consumes EXACTLY
    one batch per trigger: the source takes the N oldest unprocessed
    files, and with every batch exactly N files the trigger boundaries
    align with batch boundaries STRUCTURALLY — not by hoping batch
    sizes happen to divide evenly.  (Without padding, a feed like
    [1-file batch, 32-file batch, sentinel] under max=32 would straddle:
    trigger 1 takes batch 0's file plus 31 of batch 1, the watermark
    advances on the partial batch, and batch 1's last file's rows can
    be dropped as late — corrupting the exactly-once accounting the
    gates assert.)  Empty parquet padding is read as 0 rows and cannot
    move a watermark.

    :func:`write_ordered_feed`'s ``coalesce(1)`` funnels the whole feed
    materialization through ONE task — measured 11 s for the q199 feeds
    at sf0.1 on local[32] vs ~2 s at natural parallelism — and at 100 TB
    a single-writer feed build is simply impossible; batch ORDER is the
    semantic (watermarks advance between micro-batches), not
    one-file-per-batch.

    Returns N (files per padded batch) — pass as ``maxFilesPerTrigger``.

    The whole feed is STAGED in a pid-suffixed sibling directory and
    swapped into ``base`` only when complete: a concurrent process
    reading a shared feed root never observes a half-built feed (the
    delete→rename swap is the only window, microseconds vs the
    seconds-long data write that used to happen in place after an
    up-front rmtree).
    """
    import os
    import shutil

    build = f"{base}.build-{os.getpid()}"
    shutil.rmtree(build, ignore_errors=True)
    os.makedirs(build)
    stage_dirs: list[str] = []
    for i, df in enumerate(dfs):
        tmp = os.path.join(build, f"_stage{i}")
        # natural parallelism, deliberately WITHOUT a spread/repartition:
        # a slice of a single-row-group fixture scans as one task either
        # way (the shuffle a spread adds parallelizes nothing upstream of
        # itself and was A/B-measured a net loss — q84 4.3 s -> 7.7 s
        # warm min-of-3 at sf0.1, 32 tiny files + padding copies per
        # batch), while a production-scale input already scans wide and
        # writes wide here with zero added exchanges
        df.write.mode("overwrite").parquet(tmp)
        stage_dirs.append(tmp)
    return _finalize_feed(build, stage_dirs, dfs[0].limit(0), base)


def _finalize_feed(
    build: str, stage_dirs: list[str], pad_template, base: str
) -> int:
    """Shared feed-assembly tail: pad every staged batch directory to
    the same file count N with empty schema-only parquet files, stamp
    ascending mtimes (batch i strictly older than batch i+1), and swap
    the completed build into ``base`` atomically.  Returns N (pass as
    ``maxFilesPerTrigger``)."""
    import os
    import shutil
    import time

    t0 = time.time() - 1000
    staged = [
        sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        if os.path.isdir(d)
        else []
        for d in stage_dirs
    ]
    n_files = max(1, max(len(p) for p in staged))
    # one empty schema-only parquet file as the padding template
    pad_tmp = os.path.join(build, "_stage_pad")
    pad_template.coalesce(1).write.mode("overwrite").parquet(pad_tmp)
    pad_src = os.path.join(
        pad_tmp,
        next(f for f in os.listdir(pad_tmp) if f.endswith(".parquet")),
    )
    # within-batch mtime step sized so even huge batches stay inside
    # the 10 s inter-batch window (within-batch order is irrelevant —
    # one batch IS one trigger — but deterministic listing is nice)
    step = min(0.001, 9.0 / n_files)
    for i, parts in enumerate(staged):
        for j in range(n_files):
            dst = os.path.join(build, f"batch{i}_{j:07d}.parquet")
            if j < len(parts):
                shutil.move(os.path.join(stage_dirs[i], parts[j]), dst)
            else:
                shutil.copyfile(pad_src, dst)
            os.utime(dst, (t0 + i * 10 + j * step,) * 2)
        shutil.rmtree(stage_dirs[i], ignore_errors=True)
    # drop every staging leftover (the pad template, the sliced form's
    # partitioned parent with its _SUCCESS marker) before the swap; the
    # file stream would ignore _-prefixed entries anyway, but the feed
    # dir should hold exactly the replay files
    for leftover in os.listdir(build):
        p = os.path.join(build, leftover)
        if leftover.startswith("_stage") and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)
    os.rename(build, base)
    return n_files


def write_sliced_feed(
    df: DataFrame,
    batch_no,
    n_batches: int,
    base: str,
    payload_cols: list[str] | None = None,
) -> int:
    """One-pass variant of :func:`write_ordered_feed_parallel` for feeds
    whose batches are SLICES of one frame: ``batch_no`` (an integer
    Column over ``df``'s columns, 0..n_batches-1) assigns each row its
    replay batch, and a single ``partitionBy`` write materializes every
    slice in ONE job — the list form re-scans the source once per slice
    (3 scan+write jobs for the mod-3 gate feeds; guide §1.2: one
    unavoidable pass, not one per batch).  Padding, mtime ordering and
    the atomic swap are identical (shared ``_finalize_feed`` tail), so
    one batch == one trigger structurally, exactly as before.

    ``payload_cols`` restricts the written columns (default: all of
    ``df``'s) — callers that pre-derive the batch number with an
    ``explode`` (a row replayed into several batches) exclude the
    helper column this way.  The partition column itself never appears
    in the data files, so the on-disk schema equals the list form's.
    """
    import os
    import shutil

    cols = payload_cols if payload_cols is not None else df.columns
    build = f"{base}.build-{os.getpid()}"
    shutil.rmtree(build, ignore_errors=True)
    os.makedirs(build)
    stage = os.path.join(build, "_stage")
    (
        df.select(*cols, batch_no.cast("int").alias("__batch"))
        .write.mode("overwrite")
        .partitionBy("__batch")
        .parquet(stage)
    )
    stage_dirs = [
        os.path.join(stage, f"__batch={i}") for i in range(n_batches)
    ]
    return _finalize_feed(
        build, stage_dirs, df.select(*cols).limit(0), base
    )


def persistent_event_slices_feed(
    spark: SparkSession, sf_dir: str, n_slices: int = 3
) -> tuple[str, int]:
    """The shared ordered replay feed five exactly-once gates use: the
    events table sliced into ``n_slices`` batches by
    ``pmod(event_id, n_slices)``, persisted at a path keyed on
    ``sf_dir`` behind a content fingerprint (row count + max event_id +
    max ts + sum(event_id) as a content proxy, so a REGENERATED events
    table with identical shape is caught, not silently replayed as
    stale slices; meta written LAST so a half-built feed is never
    reused) and written at natural parallelism via
    :func:`write_ordered_feed_parallel`.

    The feed is a deterministic function of the source table, so
    rebuilding it per gate call was five redundant data-sized writes
    per bench pass — the same build-once argument as the q199 feeds
    and the ANN indexes.  Replay state/checkpoint/output dirs stay
    per-call fresh at every call site: only the immutable INPUT feed
    is shared.  Returns (feed_path, maxFilesPerTrigger).
    """
    import hashlib
    import json
    import os
    import tempfile

    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.count("*").alias("n"),
        F.max("event_id").alias("mx"),
        F.max("ts").alias("mts"),
        F.sum("event_id").alias("id_sum"),
    ).first()
    want = {
        "n": int(row["n"]), "mx": int(row["mx"]),
        "mts": str(row["mts"]), "id_sum": int(row["id_sum"]),
        # version 3: feed written by the one-pass sliced writer (same
        # batches, same padding contract; bumped so the r10 feed is
        # regenerated once through the new code path)
        "n_slices": n_slices, "version": 3,
    }
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    root = os.path.join(
        tempfile.gettempdir(), f"ctdc-evslices-{tag}-{n_slices}"
    )
    feed = os.path.join(root, "feed")
    meta_path = os.path.join(root, "meta.json")
    try:
        with open(meta_path) as fh:
            have = json.load(fh)
    except (OSError, ValueError):
        have = None
    if have is None or {k: have.get(k) for k in want} != want:
        os.makedirs(root, exist_ok=True)
        # one-pass sliced write (r11): one partitioned job instead of
        # n_slices scan+write jobs on every (re)build
        mft = write_sliced_feed(
            ev, F.pmod(F.col("event_id"), F.lit(n_slices)), n_slices, feed
        )
        with open(meta_path, "w") as fh:
            json.dump({**want, "mft": mft}, fh)
    else:
        mft = have["mft"]
    return feed, mft


def write_ordered_feed(dfs: list[DataFrame], base: str) -> None:
    """Materialize one parquet file per batch with ascending mtimes so a
    ``maxFilesPerTrigger=1`` file stream replays them in a deterministic
    order (the file source lists by modification time)."""
    import os
    import shutil
    import time

    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    t0 = time.time() - 1000
    for i, df in enumerate(dfs):
        tmp = os.path.join(base, f"_stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(base, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))


def late_drop_counts(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "ctdc_q78_sink",
    watermark: str = "1 hour",
) -> DataFrame:
    """Append-mode watermark semantics as a gate-checkable query: the
    events table is replayed as an ordered 3-batch feed with late rows
    injected last, and only Spark's own watermark machinery decides what
    is dropped and what is emitted.

    Deterministic feed derived from the data alone:
      batch 0  — non-late rows (event_id % 100 != 0) minus the keep-alive
                 slice; always contains the non-late max timestamp, so
                 the watermark is pinned to max(nonlate) - delay,
      batch 1  — keep-alive slice (event_id % 100 == 1, ts strictly below
                 the non-late max): advances the batch counter WITHOUT
                 moving the watermark, covering Spark's one-batch lag
                 between reporting a watermark and filtering with it,
      batch 2  — late rows (event_id % 100 == 0).

    Append mode then (a) drops late rows whose window is older than the
    watermark and (b) only emits windows the final watermark has closed.
    The DuckDB oracle recomputes both effects from the same split, so
    this is a value-level check of the late-drop semantics, not a
    complete-mode batch equivalence.
    """
    import tempfile

    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    mod = F.pmod(F.col("event_id"), F.lit(100))
    nonlate = ev.filter(mod != 0)
    max_ts = nonlate.agg(F.max("ts")).first()[0]  # scalar, feed setup only
    keepalive_pred = (mod == 1) & (F.col("ts") < F.lit(max_ts))

    base = tempfile.mkdtemp(prefix="ctdc-latefeed-")
    # one-pass sliced feed (r11): the same three batches — non-late,
    # keepalive, late — written by ONE partitioned job instead of three
    # full event-table scan+write jobs; padding keeps one batch == one
    # trigger structurally exactly as before
    # a NULL keepalive predicate (null ts) yields a NULL batch number,
    # which lands outside the three staged batch dirs — exactly the
    # old filter/~filter pair's both-sides-drop behavior
    batch_no = (
        F.when(mod == 0, F.lit(2))
        .when(keepalive_pred, F.lit(1))
        .when(~keepalive_pred, F.lit(0))
    )
    mft = write_sliced_feed(ev, batch_no, 3, base)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", str(mft))
        .parquet(base)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
        )
    )
    table, _ = run_gate_to_memory(agg, query_name, "append")
    return table


def stream_dedup_gate(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "ctdc_q100_sink",
    watermark: str = "1 hour",
) -> DataFrame:
    """dropDuplicatesWithinWatermark as a gate-checkable query: the
    events table streams in batch 0, then batch 1 re-emits exact copies
    of every event_id % 10 == 0 row — an at-least-once upstream replayed
    into the exactly-once dedup stage.

    Every re-emission is dropped by Spark's own machinery, one of two
    ways: a copy at/above the watermark finds its original still in the
    dedup state (state is evicted only once the watermark passes the
    event time), and a copy below the watermark is dropped as late input
    before the state lookup.  Either way the emitted rows are exactly
    the distinct originals, so the batch GROUP BY over the raw table is
    a value-level oracle — while a broken dedup (or unbounded-state
    variant silently dropping nothing) double-counts every replayed row
    and hash-mismatches.
    """
    import tempfile

    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    base = tempfile.mkdtemp(prefix="ctdc-dupfeed-")
    # one-pass sliced feed (r11): every row lands in batch 0, and the
    # event_id % 10 == 0 rows are replayed AGAIN in batch 1 via an
    # in-plan explode — ONE scan+write job where the list form paid a
    # full pass per batch; padding keeps one batch == one trigger
    expanded = ev.withColumn(
        "__b",
        F.explode(
            F.when(
                F.pmod(F.col("event_id"), F.lit(10)) == 0,
                F.array(F.lit(0), F.lit(1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    mft = write_sliced_feed(
        expanded, F.col("__b"), 2, base, payload_cols=ev.columns
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", str(mft))
        .parquet(base)
    )
    deduped = dedup_within_watermark(stream, ["event_id"], watermark)
    table, _ = run_gate_to_memory(deduped, query_name, "append")
    return (
        table
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value_r"),
        )
    )
