"""K-minimum-values (KMV) distinct sketches with set-operation support.

The HLL contract (q130) and Count-Min contract (q160) cover distinct
counting and frequency; what neither can do is estimate the size of a
set INTERSECTION — HLL union is native but HLL intersection via
inclusion-exclusion explodes in error when the overlap is small.  The
KMV sketch (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD 2007) keeps the k smallest values of
a uniform hash of the set's members:

  * distinct estimate of one set:  (k-1) * M / h_k   (h_k = k-th min,
    M = hash space size),
  * union sketch = the k smallest of the merged sketches (mergeable,
    so per-partition partials combine exactly like any top-k),
  * intersection estimate = rho * U_est, where rho is the fraction of
    the union sketch's k values that appear in BOTH input sketches.

Everything here is engine-reproducible by construction: the hash is
the leading 52 bits of md5 (52 so the value is exactly representable
in an IEEE double — the one division producing the estimate is then
bit-identical in any engine), ties are impossible short of a 52-bit
collision, and every intermediate is an integer.  ANSI-SQL oracles can
(and do — q287) replay the whole estimator verbatim.

Scale shape: hashing is a zero-shuffle projection; the per-set top-k
runs as a rank-filter window (WindowGroupLimit prunes per partition,
so only ~k rows per set per partition ever reach the shuffle); sketch
merge and the estimator touch 2k-row frames.  At 100 TB the cost is
the scan; the sketches themselves are KB-sized and storable for later
incremental merges (reference contract-pin pattern:
/root/reference/src/main/scala/ctdc/SparkCore.scala:355-360).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 52
HASH_SPACE = float(2**HASH_BITS)  # exact in double


def kmv_hash(col, salt: str = "kmv-v1"):
    """52-bit uniform hash of a column: leading 13 hex chars of
    md5(value || '|' || salt).  52 bits keeps the value exactly
    representable in a double, so downstream ratio arithmetic is
    engine-exact; collision odds at n = 10^9 are ~1e-4 per sketch."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", col.cast("string"), F.lit(salt))),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")


def kmv_sketch(
    df: DataFrame,
    set_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "kmv-v1",
) -> DataFrame:
    """Per-set KMV sketch: the k smallest distinct 52-bit hashes of
    ``key_col`` within each ``set_col`` group, as rows
    (set_col, rn, h) with rn = 1..k ascending.  The rank filter plans
    as WindowGroupLimit, so each partition forwards at most k rows per
    set to the single per-set sort."""
    if k < 16:
        raise ValueError(f"k must be >= 16 for usable error bounds, got {k}")
    hashed = (
        df.select(
            F.col(set_col).alias("set_id"),
            kmv_hash(F.col(key_col), salt).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("set_id").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_union_intersection(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int,
) -> DataFrame:
    """Union + intersection estimates from two KMV sketches (each the
    (set_id, rn, h) shape of :func:`kmv_sketch`, any set_id).  Returns
    one row: est_union_r, est_intersection_r (both rounded to 4 dp),
    k_used (min(k, |merged distinct|)).  When the merged sketch holds
    fewer than k values the sketches are exhaustive and the "estimate"
    degrades gracefully to the EXACT union/intersection counts (the
    standard KMV small-set rule).

    The merged sketch is at most 2k rows, so every stage after the
    inputs is constant-sized regardless of data volume."""
    a = sketch_a.select(F.col("h").alias("ha")).distinct()
    b = sketch_b.select(F.col("h").alias("hb")).distinct()
    merged = (
        a.select(F.col("ha").alias("h"))
        .union(b.select(F.col("hb").alias("h")))
        .distinct()
    )
    w = Window.orderBy("h")
    topk = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    marked = (
        topk.join(a, topk["h"] == a["ha"], "left")
        .join(b, topk["h"] == b["hb"], "left")
        .select(
            "h",
            "rn",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull())
            .cast("int")
            .alias("in_both"),
        )
    )
    u_est = (F.col("k_used") - 1) * F.lit(HASH_SPACE) / F.col("hk")
    exhaustive = F.col("k_used") < F.lit(k)
    return marked.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("hk"),
        F.sum("in_both").alias("c_both"),
    ).select(
        F.col("k_used").cast("bigint").alias("k_used"),
        F.round(
            F.when(exhaustive, F.col("k_used").cast("double")).otherwise(
                u_est
            ),
            4,
        ).alias("est_union_r"),
        F.round(
            F.when(exhaustive, F.col("c_both").cast("double")).otherwise(
                F.col("c_both") * u_est / F.col("k_used")
            ),
            4,
        ).alias("est_intersection_r"),
    )
