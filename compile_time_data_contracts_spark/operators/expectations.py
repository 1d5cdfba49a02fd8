"""Value-level data expectations: the runtime counterpart of the schema
contracts (contracts/ proves SHAPE before data moves; these prove the
DATA itself on the way through).

Each expectation compiles to plain aggregates/anti-joins, so a whole
suite evaluates in one or two passes with map-side combine — at 100 TB
the cost is scan cost, and the scan can be the one the pipeline already
makes.  The report is one row per rule: (rule, column, metric, bound,
passed), so a gate is `report.filter(~passed).count() == 0`.
"""

from __future__ import annotations

import dataclasses
import typing

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Expect",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "row_count_between",
    "evaluate_expectations",
    "ref_integrity_report",
]


@dataclasses.dataclass(frozen=True)
class Expect:
    """One declarative rule: ``metric`` is an aggregate Column producing
    the observed value; ``passed`` is a boolean expression over it."""

    rule: str
    column: str
    metric: "F.Column"
    bound: str
    check: typing.Callable[["F.Column"], "F.Column"]


def not_null(col: str, max_null_frac: float = 0.0) -> Expect:
    """Null fraction of ``col`` must not exceed ``max_null_frac``."""
    m = (
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("double")
        / F.count(F.lit(1))
    )
    return Expect(
        "not_null", col, m, f"<= {max_null_frac}",
        lambda v: v <= max_null_frac,
    )


def unique(col: str) -> Expect:
    """``col`` must be unique: distinct count equals row count."""
    m = (F.count(F.lit(1)) - F.countDistinct(F.col(col))).cast("double")
    return Expect("unique", col, m, "== 0", lambda v: v == 0)


def in_range(col: str, lo: float, hi: float) -> Expect:
    """Every non-null value of ``col`` within [lo, hi]."""
    m = F.sum(
        F.when(~F.col(col).between(lo, hi), 1).otherwise(0)
    ).cast("double")
    return Expect(
        "in_range", col, m, f"0 outside [{lo}, {hi}]", lambda v: v == 0
    )


def accepted_values(col: str, values: list) -> Expect:
    """Every non-null value of ``col`` drawn from ``values``."""
    m = F.sum(
        F.when(
            F.col(col).isNotNull() & ~F.col(col).isin(values), 1
        ).otherwise(0)
    ).cast("double")
    return Expect(
        "accepted_values", col, m, "0 outside set", lambda v: v == 0
    )


def row_count_between(lo: int, hi: int) -> Expect:
    """Table row count within [lo, hi] (freshness / completeness gate)."""
    m = F.count(F.lit(1)).cast("double")
    return Expect(
        "row_count_between", "*", m, f"[{lo}, {hi}]",
        lambda v: (v >= lo) & (v <= hi),
    )


def evaluate_expectations(
    df: DataFrame, expectations: list[Expect]
) -> DataFrame:
    """Evaluate a rule suite in ONE aggregate pass over ``df`` (every
    metric is an aggregate column of the same `agg`, so Spark computes
    them together with map-side combine — rule count adds columns, not
    scans), then explode the single metrics row into the per-rule
    report (rule, column, metric, bound, passed)."""
    metrics = df.agg(
        *[e.metric.alias(f"__m{i}") for i, e in enumerate(expectations)]
    )
    reports = [
        F.struct(
            F.lit(e.rule).alias("rule"),
            F.lit(e.column).alias("column"),
            F.round(F.col(f"__m{i}"), 6).alias("metric"),
            F.lit(e.bound).alias("bound"),
            e.check(F.col(f"__m{i}")).alias("passed"),
        )
        for i, e in enumerate(expectations)
    ]
    return metrics.select(
        F.explode(F.array(*reports)).alias("r")
    ).select("r.rule", "r.column", "r.metric", "r.bound", "r.passed")


def ref_integrity_report(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
) -> DataFrame:
    """Referential integrity as a left-anti join: count of child rows
    whose ``fk`` has no match in ``parent.pk``.  The anti-join
    broadcasts when the parent is dimension-sized and shuffles on the
    key otherwise — never more than one pass over the child.  Output
    shape matches `evaluate_expectations` so the reports union."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("double").alias("__m")
    ).select(
        F.lit("ref_integrity").alias("rule"),
        F.lit(fk).alias("column"),
        F.round(F.col("__m"), 6).alias("metric"),
        F.lit("0 orphans").alias("bound"),
        (F.col("__m") == 0).alias("passed"),
    )
