"""Bucketed-table tests: the co-located join must plan without Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from compile_time_data_contracts_spark.sources.bucketing import (
    bucketed_join_ready,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # tables land in the session's default warehouse dir; DROP TABLE at
    # teardown removes the files (warehouse.dir is a static conf and
    # cannot be redirected on a live session)
    orders = spark.createDataFrame(
        [(i, i % 100, float(i)) for i in range(1000)],
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )
    items = spark.createDataFrame(
        [(i % 500, i, float(i % 7)) for i in range(2000)],
        ["l_orderkey", "l_linenumber", "l_quantity"],
    )
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 4)
    write_bucketed(
        items.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_items_b",
        ["o_orderkey"],
        4,
    )
    yield "t_orders_b", "t_items_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the sort-merge path: at real scale neither fact side fits a
    # broadcast; co-located bucket reads are the point of the test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join_ready(spark, lt, rt, ["o_orderkey"])
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join_ready(spark, lt, rt, ["o_orderkey"])
    # every item with o_orderkey < 1000 matches exactly one order
    assert joined.count() == 2000
    plain = (
        spark.table(lt)
        .join(spark.table(rt), "o_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .first()
        .s
    )
    assert joined.agg(F.sum("l_quantity").alias("s")).first().s == plain


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also skips the shuffle."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("o_orderkey").agg(F.count("*").alias("n"))
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
