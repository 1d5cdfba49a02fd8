"""Multi-dimensional write layout: z-order (Morton) clustering.

A parquet sink sorted on ONE key prunes row groups only for filters on
that key; filters on a second dimension scan everything.  Interleaving
the bits of two keys into a Morton code and range-partitioning +
sorting the write on it bounds EVERY file's extent in BOTH dimensions,
so min/max row-group statistics prune for either predicate — the
standard lakehouse layout trick (Delta/Iceberg `ZORDER BY`), built here
from plain Spark primitives:

  * the code is a chain of shiftright/bitwiseAND/shiftleft ORs —
    whole-stage codegen, no UDF;
  * `repartitionByRange` on the code makes files contiguous z-ranges;
  * `sortWithinPartitions` orders rows inside each file so row-group
    stats are tight too.

At 100 TB the same three lines govern the layout; only `n_files`
changes (target ~1 GB files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "write_zordered"]


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code interleaving the low ``bits`` bits of two non-negative
    integer columns: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1.  Pure codegen bit arithmetic (2·bits shift/and/or terms);
    callers must pre-scale values into [0, 2^bits)."""
    z: Column | None = None
    for i in range(bits):
        ta = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        tb = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        term = ta.bitwiseOR(tb)
        z = term if z is None else z.bitwiseOR(term)
    return z


def zorder_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical Morton code as portable SQL (DuckDB/ANSI bit ops) —
    generated from the same loop so engine and oracle cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b_expr} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-order of two columns:
    contiguous z-ranges per file (range partition) and sorted rows
    inside each (tight row-group min/max for BOTH dimensions)."""
    z = zorder_value(F.col(col_a), F.col(col_b), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
