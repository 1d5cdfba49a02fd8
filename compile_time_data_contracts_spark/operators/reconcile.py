"""Snapshot reconciliation: classify every key across two table
versions as added / removed / changed / unchanged.

The pipeline-ops counterpart of the schema contracts: the contracts
prove two table versions share a SHAPE; `snapshot_diff` reports how the
DATA moved between them (the audit step after a MERGE, a backfill, or a
re-run — "did this rewrite touch only what it should have?").

Scale design (100 TB snapshots):

* Each side is reduced to ``(key..., fingerprint)`` — one xxhash64 over
  the canonicalized compare columns — BEFORE the join, so the shuffle
  carries ~16 bytes of payload per row instead of the full row width.
  Fingerprinting is a map-only projection (whole-stage codegen, no
  Python).
* The classification join is a single full-outer hash join on the key;
  with both snapshots bucketed by key (see `merge.snapshot_write`) it
  is a zero-exchange sort-merge join.
* ``changed`` detection compares the two 8-byte fingerprints, not N
  columns — column count does not affect the shuffled volume.
* xxhash64 collisions (p ≈ n²/2⁶⁵) would misreport a changed row as
  unchanged; for forensic certainty run the returned ``changed`` subset
  through a full-column comparison (it is usually tiny).

No reference counterpart: the reference checks schemas only (its data
plane is the opaque `transformAs` hole, SparkCore.scala:404-415); this
operator is part of the engine's pipeline-operations surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["row_fingerprint", "snapshot_diff", "diff_summary", "table_fingerprint"]


def row_fingerprint(cols: list[str]) -> F.Column:
    """One 64-bit fingerprint over the canonicalized compare columns.

    NULL and the string "NULL" must not collide, so every column is cast
    to string and null-tagged before hashing; the column list is sorted
    so logically-equal schemas with different column order fingerprint
    identically.
    """
    tagged = [
        F.coalesce(F.concat(F.lit("v:"), F.col(c).cast("string")), F.lit("\0"))
        for c in sorted(cols)
    ]
    return F.xxhash64(*tagged)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff of two snapshot versions.

    Returns ``keys... , status`` with status in
    ``{'added','removed','changed','unchanged'}``.  Keys must be unique
    per side (the usual snapshot invariant; enforce upstream with the
    `expectations.unique` rule when in doubt).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    o = old.select(*keys, row_fingerprint(compare_cols).alias("__fp_old"))
    n = new.select(*keys, row_fingerprint(compare_cols).alias("__fp_new"))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))


def diff_summary(diff: DataFrame, key: str) -> DataFrame:
    """Roll a per-key diff up to one row per status: count + a
    content checksum (sum of keys) so two reconciliations agreeing on
    counts but not membership still disagree on the summary."""
    return diff.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(key).cast("bigint")).cast("bigint").alias("key_sum"),
    )


def table_fingerprint(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """ONE-row, order-independent content fingerprint of a table over
    ``cols`` — the replication/migration integrity check: two engines
    (or two snapshots, or a table before/after a rewrite that must be
    content-neutral, q136's byte-identity cousin at the LOGICAL level)
    agree on the fingerprint iff they hold the same multiset of rows,
    without either side sorting or shipping the data.

    Per row: 60 bits of sha256 over the null-tagged, canonically
    separated column rendering (sha256, not xxhash64, so ANY engine
    reproduces it — xxhash64 seeds are Spark-specific).  Rows combine
    by XOR (order-independent, but blind to duplicate-pair swaps) AND
    by a modular sum of the low 20 bits (catches what XOR cancels);
    with the row count that gives three independent invariants.  The
    20-bit term bounds the sum at n·2²⁰ — exact in int64 to ~8×10¹²
    rows (the 1e8-row scale probe caught the 40-bit version
    overflowing ANSI long addition; a wider residue needs a modular
    aggregate Spark doesn't ship).  Both combiners are
    partial-aggregated: the shuffle carries 3 numbers per partition
    at any scale.  Output: (n_rows, fp_xor, fp_sum_mod).
    """
    tagged = [
        F.coalesce(
            F.concat(F.lit("v:"), F.col(c).cast("string")),
            F.lit("@NULL@"),
        )
        for c in cols
    ]
    h = F.conv(
        F.substring(F.sha2(F.concat_ws("|", *tagged), 256), 1, 15),
        16,
        10,
    ).cast("bigint")
    return df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("bit_xor(__h)").cast("bigint").alias("fp_xor"),
        F.sum(F.col("__h") % F.lit(1 << 20)).cast("bigint").alias(
            "fp_sum_mod"
        ),
    )
