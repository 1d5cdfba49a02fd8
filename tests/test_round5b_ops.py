"""Round-5 Spark-4 surface additions: EWMA window operator, state-store
batch reader, pipe-syntax / collation parity.

The gate queries (q194-q198) value-check against DuckDB; these tests pin
the operator-level edge cases the fixture can't reach: EWMA head-of-series
normalization and hand-computed weights, parameter validation, state-store
snapshot == batch aggregation on a controlled frame, and case-variant
merging under UTF8_LCASE.
"""

from __future__ import annotations

import math

import pytest

from compile_time_data_contracts_spark.operators.timeseries import (
    ewma_trailing,
)


def _series_df(spark, values):
    rows = [(1, i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k long, t long, v double")


def _expected_trailing_ewma(values, alpha=0.1, window=8):
    d = 1.0 - alpha
    out = []
    for t in range(len(values)):
        frame = values[max(0, t - window + 1): t + 1]
        num = sum(x * d ** (len(frame) - 1 - i) for i, x in enumerate(frame))
        den = (1.0 - d ** len(frame)) / alpha
        out.append(round(num / den, 4))
    return out


def test_ewma_matches_hand_computation(spark):
    values = [10.0, 20.0, 5.0, 0.0, 40.0, 15.0, 25.0, 30.0, 1.0, 2.0]
    df = ewma_trailing(
        _series_df(spark, values), "k", ["t"], "v", alpha=0.1, window=8
    )
    got = [r.ewma for r in df.orderBy("t").collect()]
    want = _expected_trailing_ewma(values)
    assert all(math.isclose(g, w, abs_tol=1e-9) for g, w in zip(got, want))
    assert len(got) == len(want)


def test_ewma_head_normalizes_over_existing_rows(spark):
    # the very first row's EWMA is the row itself: num = x, den = 1
    df = ewma_trailing(_series_df(spark, [7.5, 0.0]), "k", ["t"], "v")
    first = df.orderBy("t").collect()[0]
    assert first.ewma == 7.5


def test_ewma_window_one_is_identity(spark):
    values = [3.0, 1.0, 4.0]
    df = ewma_trailing(_series_df(spark, values), "k", ["t"], "v", window=1)
    got = [r.ewma for r in df.orderBy("t").collect()]
    assert got == values


def test_ewma_parameter_validation(spark):
    df = _series_df(spark, [1.0])
    with pytest.raises(ValueError, match="alpha"):
        ewma_trailing(df, "k", ["t"], "v", alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma_trailing(df, "k", ["t"], "v", alpha=1.0)
    with pytest.raises(ValueError, match="window"):
        ewma_trailing(df, "k", ["t"], "v", window=0)


def test_ewma_keys_are_independent(spark):
    rows = [(1, 0, 10.0), (1, 1, 20.0), (2, 0, 100.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {
        (r.k, r.t): r.ewma
        for r in ewma_trailing(df, "k", ["t"], "v").collect()
    }
    # key 2's single row must not see key 1's history
    assert got[(2, 0)] == 100.0
    assert got[(1, 0)] == 10.0


def test_state_store_snapshot_equals_batch_groupby(spark, sf_dir):
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.catalog import load_table
    from compile_time_data_contracts_spark.streaming.stateful import (
        state_store_snapshot_totals,
    )

    snap = {
        r.user_id: (r.n_events, r.total_value_r)
        for r in state_store_snapshot_totals(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert snap.keys() == batch.keys()
    for k in batch:
        assert snap[k][0] == batch[k][0]
        assert math.isclose(snap[k][1], batch[k][1], abs_tol=0.02)


def test_collated_group_merges_case_variants(spark):
    df = spark.createDataFrame(
        [("Apple",), ("apple",), ("APPLE",), ("pear",)], "s string"
    )
    df.createOrReplaceTempView("t_collate_fruit")
    rows = spark.sql(
        """SELECT min(lower(s)) AS k, count(*) AS n
           FROM t_collate_fruit GROUP BY collate(s, 'UTF8_LCASE')"""
    ).collect()
    got = {r.k: r.n for r in rows}
    assert got == {"apple": 3, "pear": 1}


def test_pipe_syntax_matches_classic_form(spark, sf_dir):
    from compile_time_data_contracts_spark.queries import queries

    piped = queries()["q194_pipe_syntax"](spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "t_pipe_li"
    )
    classic = spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  CAST(count(*) AS BIGINT) AS n,
                  round(sum(l_quantity), 2) AS sum_qty,
                  round(sum(l_extendedprice * (1 - l_discount)), 2)
                    AS sum_disc_price
           FROM t_pipe_li
           WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           GROUP BY l_returnflag, l_linestatus"""
    )
    assert sorted(map(tuple, piped.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, classic.select(*piped.columns).collect()),
        key=lambda t: t[:2],
    )


def test_dynamic_session_boundary_equal_merges(spark):
    """An event at EXACTLY prev_ts + gap merges into the running session
    (Spark's merge step is inclusive); one second past it starts a new
    session.  Pins the strict-inequality break rule the q200 oracle
    mirrors."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:10:00", "a"),       # == end of prev: merges
        (1, "2024-01-01 00:20:00", "purchase"),  # extends 30 min
        (1, "2024-01-01 00:50:00", "a"),       # == purchase end: merges
        (1, "2024-01-01 01:00:01", "a"),       # 1 s past end: breaks
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    out = (
        df.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count("*").alias("n"))
        .orderBy("sw.start")
        .collect()
    )
    assert [(str(r["sw"].start), r["n"]) for r in out] == [
        ("2024-01-01 00:00:00", 4),
        ("2024-01-01 01:00:01", 1),
    ]


def test_outer_join_gate_emits_unmatched_and_no_sentinels(spark, sf_dir):
    from compile_time_data_contracts_spark.streaming.joins import (
        outer_interval_join_gate,
    )

    rows = outer_interval_join_gate(spark, sf_dir).collect()
    # the raw sink still holds everything the join EMITTED: the only
    # rows the gate's user_id >= 0 filter may remove are the sentinels,
    # so emitted real-user rows must equal the aggregated totals
    raw = spark.table("ctdc_q199_sink")
    from pyspark.sql import functions as F

    emitted_real = raw.filter(F.col("user_id") >= 0).count()
    assert emitted_real == sum(r.n_rows for r in rows)
    # the purchase subset is sparse: unmatched left rows must exist,
    # and at least one user must have a matched pair (n_unmatched <
    # n_rows per-user would assume EVERY cohort user has a purchase,
    # which the fixture does not guarantee)
    assert sum(r.n_unmatched for r in rows) > 0
    assert sum(r.n_rows for r in rows) > sum(r.n_unmatched for r in rows)
