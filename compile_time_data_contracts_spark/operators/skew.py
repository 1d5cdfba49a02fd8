"""Skew-mitigation operators: salted joins and two-phase distinct aggs.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles moderate
skew in sort-merge joins automatically; these operators cover the cases
it cannot: a single join key too hot for any one task, and
count-distinct over a skewed group key (where the single final
aggregation task for the hot key receives every distinct value).

Results are identical to the unsalted forms — the salt only changes the
physical distribution — which the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_count_distinct"]


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the left side has hot keys: the skewed side gets a
    per-row salt in [0, salt), the small side is replicated ``salt``
    times, and the join key becomes (keys..., salt) — a hot key's rows
    spread over ``salt`` tasks instead of one.

    Cost: the small side shuffles/broadcasts ``salt``× larger — use for
    dimension-sized right sides.  The salt is xxhash64 of
    monotonically_increasing_id — hashing decorrelates the salt from any
    periodic row pattern (a bare ``id % salt`` starves half the salt
    values when the hot key occupies e.g. every other row); join RESULTS
    are salt-independent, so determinism of output is unaffected.
    Supported ``how``: inner / left (right-side semantics would need the
    salt on the other side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast(
            "int"
        ),
    )
    replicated_r = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return salted_l.join(replicated_r, on + ["__salt"], how).drop("__salt")


def two_phase_count_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT value) GROUP BY key for skewed keys: first a
    partial-agg-friendly distinct on (key, value) — the hot key's values
    spread across tasks by value hash — then a plain count per key.  Two
    small shuffles instead of one task swallowing every distinct value of
    the hot key."""
    return (
        df.select(group_col, value_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.count("*").cast("bigint").alias(out_col))
    )
