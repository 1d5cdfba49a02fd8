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

__all__ = ["row_fingerprint", "snapshot_diff", "diff_summary", "table_fingerprint", "golden_record", "scd2_validity_audit"]


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


def golden_record(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Survivorship / golden-record merge — the step AFTER entity
    resolution (q150/q215 produce clusters; something must still pick
    the record): per cluster, the survivor id is the most recent row
    (ts desc, id asc tiebreak — deterministic under ts ties), and
    each value column takes its FIRST NON-NULL in that recency order
    — field-level survivorship, so a newer row with a missing phone
    doesn't erase the older row's phone (the MDM rule the naive
    "keep latest row" gets wrong).

    ONE per-cluster ordered window computes the survivor flag and
    every field's first-non-null in a single pass (first(...,
    ignorenulls) over the full frame) — no self-join, no per-field
    re-aggregation; then one filter keeps the rn=1 row per cluster.
    Output: (cluster_col, survivor_id, n_members, value_cols…).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).desc(), F.col(id_col).asc()]
    w = Window.partitionBy(cluster_col).orderBy(*order)
    wall = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sel = [
        F.col(cluster_col),
        F.row_number().over(w).alias("__rn"),
        F.col(id_col).alias("survivor_id"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_members"),
    ]
    for c in value_cols:
        sel.append(
            F.first(F.col(c), ignorenulls=True).over(wall).alias(c)
        )
    return (
        df.select(*sel).filter(F.col("__rn") == 1).drop("__rn")
    )


def scd2_validity_audit(
    df: DataFrame,
    key_col: str,
    from_col: str,
    to_col: str,
) -> DataFrame:
    """Validity-window audit for an SCD2 dimension — the quality gate
    q134/q180 outputs should pass before anyone runs point-in-time
    joins against them: per key ordered by ``from_col``, counts of
    OVERLAP rows (next version starts while this one is still valid
    — a point-in-time join returns two truths; an OPEN version with a
    NULL end followed by any later version is the worst case of this,
    not a clean row), GAP rows (next version starts after this one
    ends — history silently missing), and MULTI-CURRENT keys (more
    than one NULL ``to_col`` — two open versions).  One per-key
    lead() window, then one per-key partial-combined rollup feeding
    one global 1-row aggregate — the source is scanned ONCE; output
    is a fixed 3-row report (violation, n) with zero counts PRESENT
    (a clean audit proves it ran — the q188/q201 no-silent-anything
    discipline).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(from_col).asc(), F.col(to_col).asc_nulls_last()
    )
    nxt = F.lead(F.col(from_col)).over(w)
    # an open version (NULL end) extends to infinity: ANY later
    # version overlaps it — requiring a non-null end here would pass
    # exactly the two-truths defect the audit exists to catch
    flags = df.select(
        F.col(key_col),
        F.when(
            nxt.isNotNull()
            & (F.col(to_col).isNull() | (nxt < F.col(to_col))),
            1,
        )
        .otherwise(0)
        .alias("__overlap"),
        F.when(
            nxt.isNotNull()
            & F.col(to_col).isNotNull()
            & (nxt > F.col(to_col)),
            1,
        )
        .otherwise(0)
        .alias("__gap"),
        F.col(to_col).isNull().cast("int").alias("__open"),
    )
    per_key = flags.groupBy(key_col).agg(
        F.sum("__overlap").alias("__ov"),
        F.sum("__gap").alias("__gp"),
        F.sum("__open").alias("__opens"),
    )
    agg = per_key.agg(
        F.sum("__ov").cast("bigint").alias("__n_overlap"),
        F.sum("__gp").cast("bigint").alias("__n_gap"),
        F.sum((F.col("__opens") > 1).cast("long"))
        .cast("bigint")
        .alias("__n_multi"),
    )
    return agg.selectExpr(
        "stack(3, 'overlap', __n_overlap, 'gap', __n_gap, "
        "'multi_current', __n_multi) AS (violation, n)"
    )
