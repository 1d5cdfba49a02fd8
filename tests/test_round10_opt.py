"""Round-10 optimization-round tests.

Covers the operator internals this round changed:
  * ``grouped_global_rank`` — the decomposed global rank that replaces
    unpartitioned (single-task) rank/ntile windows in q299/q343 — must
    agree with the window forms row-for-row, including on duplicated
    full keys (the fixture has genuinely repeated lineitem rows), and
    the closed-form ntile bucketing must match ``F.ntile`` exactly for
    every (n, remainder) shape.
  * the materialize-per-call discipline: checkpointed frames inside
    query bodies must re-execute on every invocation (no cross-call
    cache), which is covered by re-running a query twice and asserting
    equal results — the oracle harness covers value equality; here we
    pin the rank operator's semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _toy(spark, rows):
    return spark.createDataFrame(rows, "s bigint, a bigint, b int, lab int")


ROWS = [
    # (s, a, b, lab) — includes full-key duplicates (s=5,a=1,b=1) and
    # value-group ties broken by (a, b)
    (5, 1, 1, 1),
    (5, 1, 1, 0),
    (5, 2, 1, 1),
    (3, 9, 2, 0),
    (3, 9, 1, 1),
    (7, 0, 0, 0),
    (7, 0, 1, 1),
    (1, 4, 4, 0),
]


class TestGroupedGlobalRank:
    def test_matches_rank_window_with_duplicates(self, spark):
        from compile_time_data_contracts_spark.operators.stats import (
            grouped_global_rank,
        )

        df = _toy(spark, ROWS)
        w = Window.orderBy("s", "a", "b")
        want = {
            tuple(r[:3]): r[3]
            for r in df.select(
                "s", "a", "b", (F.rank().over(w) - 1).alias("r")
            ).collect()
        }
        got = grouped_global_rank(
            df, "s", ["a", "b"], out_col="r", ties="min"
        )
        for r in got.collect():
            assert r["r"] == want[(r["s"], r["a"], r["b"])]

    def test_row_number_ties_are_a_permutation(self, spark):
        from compile_time_data_contracts_spark.operators.stats import (
            grouped_global_rank,
        )

        df = _toy(spark, ROWS)
        got = sorted(
            r["r"]
            for r in grouped_global_rank(
                df, "s", ["a", "b"], out_col="r"
            ).collect()
        )
        # row_number semantics: positions are exactly 0..n-1
        assert got == list(range(len(ROWS)))

    def test_descending_matches_window(self, spark):
        from compile_time_data_contracts_spark.operators.stats import (
            grouped_global_rank,
        )

        df = _toy(spark, ROWS).filter("NOT (s = 5 AND a = 1 AND b = 1)")
        w = Window.orderBy(F.col("s").desc(), "a", "b")
        want = {
            tuple(r[:3]): r[3]
            for r in df.select(
                "s", "a", "b", (F.row_number().over(w) - 1).alias("r")
            ).collect()
        }
        got = grouped_global_rank(
            df, "s", ["a", "b"], out_col="r", descending=True
        )
        for r in got.collect():
            assert r["r"] == want[(r["s"], r["a"], r["b"])]

    def test_bad_ties_rejected(self, spark):
        from compile_time_data_contracts_spark.operators.stats import (
            grouped_global_rank,
        )

        with pytest.raises(ValueError, match="ties"):
            grouped_global_rank(
                _toy(spark, ROWS), "s", ["a"], ties="dense"
            ).collect()

    def test_null_value_key_raises_not_drops(self, spark):
        # the old unpartitioned window ranked null keys; the
        # decomposition cannot replicate null ordering, so it must
        # FAIL LOUDLY instead of silently dropping the rows
        from pyspark.errors.exceptions.captured import (
            SparkRuntimeException,
        )

        from compile_time_data_contracts_spark.operators.stats import (
            grouped_global_rank,
        )

        df = spark.createDataFrame(
            [(1, 1, 1, 0), (None, 2, 1, 0)],
            "s bigint, a bigint, b int, lab int",
        )
        with pytest.raises(SparkRuntimeException, match="contains NULLs"):
            grouped_global_rank(df, "s", ["a", "b"], out_col="r").collect()

    def test_out_col_suffix_avoids_collisions(self, spark):
        # an input frame already carrying __rn/__off must survive
        from compile_time_data_contracts_spark.operators.stats import (
            grouped_global_rank,
        )
        from pyspark.sql import functions as F

        df = _toy(spark, ROWS).withColumn("__rn", F.lit(7)).withColumn(
            "__off", F.lit(9)
        )
        out = grouped_global_rank(df, "s", ["a", "b"], out_col="r")
        rows = out.collect()
        assert all(r["__rn"] == 7 and r["__off"] == 9 for r in rows)
        assert sorted(r["r"] for r in rows) == list(range(len(ROWS)))


class TestClosedFormNtile:
    @pytest.mark.parametrize("n", [1, 3, 9, 10, 11, 25, 37])
    def test_matches_window_ntile(self, spark, n):
        # the exact expression q299 uses, against F.ntile(10) on a
        # unique total order — every (n DIV 10, n % 10) shape
        rows = [(i % 7, i, 1) for i in range(n)]
        df = spark.createDataFrame(rows, "s bigint, a bigint, b int")
        w = Window.orderBy(F.col("s").desc(), "a", "b")
        want = {
            (r["s"], r["a"]): r["d"]
            for r in df.select(
                "s", "a", F.ntile(10).over(w).alias("d")
            ).collect()
        }
        from compile_time_data_contracts_spark.operators.stats import (
            grouped_global_rank,
        )

        nn = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
        ranked = (
            grouped_global_rank(
                df, "s", ["a", "b"], out_col="__r0", descending=True
            )
            .crossJoin(F.broadcast(nn))
            .withColumn("__q", F.expr("__n DIV 10"))
            .withColumn("__r", F.expr("__n % 10"))
        )
        decile = (
            F.when(
                F.col("__r0") < F.col("__r") * (F.col("__q") + 1),
                F.expr("__r0 DIV (__q + 1)") + 1,
            )
            .otherwise(
                F.col("__r") + F.expr("(__r0 - __r * (__q + 1)) DIV __q") + 1
            )
            .cast("int")
        )
        got = ranked.select("s", "a", decile.alias("d")).collect()
        for r in got:
            assert r["d"] == want[(r["s"], r["a"])], (n, r)
