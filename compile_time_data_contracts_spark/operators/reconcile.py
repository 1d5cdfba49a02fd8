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

__all__ = ["row_fingerprint", "snapshot_diff", "diff_summary"]


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
