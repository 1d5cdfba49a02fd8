"""Expression combinator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.functions.exprs import let


def test_let_binds_value_once_semantically(spark):
    df = spark.createDataFrame([(3,), (4,)], ["x"])
    out = df.select(
        let(F.col("x") * 2, lambda v: v * v + v).alias("y")
    ).collect()
    assert [r.y for r in out] == [6 * 6 + 6, 8 * 8 + 8]


def test_let_inside_higher_order_function(spark):
    """The let-bound value is usable inside a nested lambda body — the
    CollapseProject re-evaluation case it exists for."""
    df = spark.createDataFrame([([1, 2, 3],)], ["xs"])
    out = df.select(
        let(
            F.aggregate(
                F.col("xs"), F.lit(0).cast("long"), lambda a, b: a + b
            ),
            lambda total: F.transform(
                F.col("xs"), lambda x: x * total
            ),
        ).alias("scaled")
    ).first()
    assert out.scaled == [6, 12, 18]
