"""Pareto frontier (skyline) extraction — dominance filtering.

The reference has no analytic surface beyond its transform hole
(SparkCore.scala:404-415); skyline is part of the EXT pipeline
surface: picking the non-dominated (cost, quality) operating points —
e.g. dedup-threshold vs recall sweeps (q106/q193) or model-size vs
perplexity grids — is exactly a 2-D Pareto query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Distinct (min_col, max_col) pairs on the Pareto frontier —
    minimize ``min_col``, maximize ``max_col``; a pair survives iff no
    other pair is <= on the min axis AND >= on the max axis with at
    least one strict.

    Two-phase plan, NO self-join (the naive dominance anti-join is
    O(n²) — a scale killer):

      1. reduce — ``groupBy(min_col).max(max_col)``: within equal
         min-values only the largest max survives; a partial-combined
         shuffle agg that collapses the corpus to |distinct min_col|
         rows.
      2. scan — one ordered pass: a reduced pair is dominated iff the
         running max of ``max_col`` over STRICTLY smaller min-values
         reaches it.  After the reduce every ``min_col`` value is
         unique, so ``rowsBetween(unboundedPreceding, -1)`` ordered by
         the min axis IS the strictly-smaller set — exact for any
         numeric axis, fractional included (a ``rangeBetween(…, -1)``
         frame would mean "value <= current - 1" and silently skip
         neighbours less than 1 apart).

    The phase-2 window is deliberately unpartitioned: it runs over the
    REDUCED set, which is at most |distinct min_col| rows — for priced
    / sized / scored axes that is grid-bounded, orders of magnitude
    below the corpus.  If the min axis is near-unique at 100 TB,
    pre-bucket it (floor to a grid) in phase 1 and refine the surviving
    buckets exactly; the frontier of the bucket maxima is a superset
    filter with the same dominance rule.

    Ties on the frontier are impossible by construction, so the result
    is deterministic with no tie-break column.
    """
    reduced = (
        df.select(min_col, max_col)
        .groupBy(min_col)
        .agg(F.max(max_col).alias(max_col))
    )
    w_prev = (
        Window.orderBy(F.col(min_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_best = F.max(F.col(max_col)).over(w_prev)
    return (
        reduced.withColumn("__dom", F.coalesce(
            prev_best >= F.col(max_col), F.lit(False)
        ))
        .filter(~F.col("__dom"))
        .drop("__dom")
    )
