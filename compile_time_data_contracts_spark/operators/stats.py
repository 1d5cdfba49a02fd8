"""Dataset profiling: histograms + per-column summaries.

The ANALYZE-TABLE shape every pipeline needs before deciding join
strategies, bucket counts, and skew mitigations.  Everything is one or
two map-side-combined aggregate passes — profile cost is scan cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "equi_width_histogram",
    "column_profile",
    "psi_drift",
    "count_min_frequencies",
    "ks_statistic",
    "roc_auc",
]


def equi_width_histogram(
    df: DataFrame, col: str, nbuckets: int = 10
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bucket, lo, hi, n).

    Two aggregate passes — global (min, max) as a 1-row broadcast, then
    the bucket assignment as a codegen expression feeding one map-side-
    combined count: the shuffle carries ``nbuckets`` rows per partition
    regardless of table size.  The top edge is closed (x = max lands in
    the last bucket); nulls are dropped.  All arithmetic is plain IEEE
    double division/floor, so an external engine reproduces the exact
    bucket boundaries.
    """
    mm = df.agg(
        F.min(F.col(col).cast("double")).alias("__mn"),
        F.max(F.col(col).cast("double")).alias("__mx"),
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(nbuckets))
    # a constant column (min == max) would make width 0 and the division
    # null/NaN; every value belongs in bucket 0 in that case
    bucket = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(col).cast("double") - F.col("__mn")) / width),
            F.lit(nbuckets - 1),
        )
    ).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .crossJoin(F.broadcast(mm))
        .select(
            bucket.alias("bucket"),
            (F.col("__mn") + bucket * width).alias("lo"),
            (F.col("__mn") + (bucket + 1) * width).alias("hi"),
        )
        .groupBy("bucket", "lo", "hi")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass profile: a row per column with null count, exact
    distinct count, and min/max rendered as strings (type-erased so
    heterogeneous columns share one result schema).  Spark rewrites the
    multi-column count-distinct with expand + partial aggregation; for
    very wide profiles run per-column and union."""
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long"))
            .cast("bigint")
            .alias(f"__nnull_{c}"),
            F.countDistinct(c).cast("bigint").alias(f"__ndv_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    # stack (not a union of projections): a union would let Catalyst
    # inline the aggregate into every branch — N column-pruned scans —
    # while stack keeps ONE consumer of the single-row wide result, so
    # the whole profile is one scan + one expand-based aggregate
    stack_args = ", ".join(
        f"'{c}', `__nnull_{c}`, `__ndv_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_str, max_str)"
        )
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    nbuckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two versions of a numeric
    column — DISTRIBUTION-level drift detection, the companion to
    row-level `reconcile.snapshot_diff`: a backfill can leave every key
    'changed' while the distribution is fine, or keys untouched while a
    unit change shifts the whole distribution.

    Bin edges are equal-width over the OLD (baseline) min/max — a 1-row
    broadcast, deterministic in any engine (no approximate quantiles,
    which would desync engines); new-side values outside the baseline
    range clamp into the edge buckets.  Each side then pays one
    map-side-combined count; the shuffle carries ``nbuckets`` rows.
    Empty buckets are floored at ``eps`` before the log ratio (the
    standard PSI guard).  Output: one row per bucket with both
    proportions, the bucket's PSI contribution, and the TOTAL repeated
    on every row (window over the nbuckets-row result).  Rule of thumb:
    PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 major drift.
    """
    from pyspark.sql import Window

    mm = old.agg(
        F.min(F.col(col).cast("double")).alias("__mn"),
        F.max(F.col(col).cast("double")).alias("__mx"),
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(nbuckets))

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        bucket = F.when(
            F.col("__mx") == F.col("__mn"), F.lit(0)
        ).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.floor(
                        (F.col(col).cast("double") - F.col("__mn")) / width
                    ),
                    F.lit(nbuckets - 1),
                ),
            )
        ).cast("int")
        return (
            df.filter(F.col(col).isNotNull())
            .crossJoin(F.broadcast(mm))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias(name))
        )

    o = side_counts(old, "__n_old")
    n = side_counts(new, "__n_new")
    tot = Window.partitionBy()
    joined = (
        o.join(n, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("__n_old", F.lit(0)).alias("__n_old"),
            F.coalesce("__n_new", F.lit(0)).alias("__n_new"),
        )
        .select(
            "bucket",
            F.greatest(
                F.col("__n_old") / F.sum("__n_old").over(tot), F.lit(eps)
            ).alias("__p_old"),
            F.greatest(
                F.col("__n_new") / F.sum("__n_new").over(tot), F.lit(eps)
            ).alias("__p_new"),
        )
    )
    contrib = (F.col("__p_new") - F.col("__p_old")) * F.log(
        F.col("__p_new") / F.col("__p_old")
    )
    return joined.select(
        "bucket",
        F.round("__p_old", 6).alias("p_old_r"),
        F.round("__p_new", 6).alias("p_new_r"),
        F.round(contrib, 6).alias("psi_contrib_r"),
        F.round(F.sum(contrib).over(Window.partitionBy()), 6).alias(
            "psi_total_r"
        ),
    )


def count_min_frequencies(
    df: DataFrame,
    col: str,
    keys: list[str],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> list[tuple[str, int, int]]:
    """Point-queryable frequency estimates from ONE mergeable Count-Min
    sketch built distributed (`count_min_sketch` aggregate — JVM-side,
    map-side partial merge; the shuffle carries depth*width counters, not
    rows).  The binary sketch is decoded on the driver with Spark's own
    ``org.apache.spark.util.sketch.CountMinSketch`` (same murmur hashing
    as the SQL aggregate, so estimates are exactly reproducible for a
    fixed seed) and probed for each requested key.

    Returns [(key, estimate, total_count)].  CMS guarantees
    estimate >= true_count always, and estimate <= true_count + eps*N
    with probability ``confidence`` per query — the q160 gate asserts
    that contract against exact GROUP BY counts.

    At 100 TB: the sketch is a few MB regardless of row count; per-key
    frequency questions (heavy-hitter gating, stopword discovery,
    contamination canaries) become O(1) lookups instead of a second
    full-corpus GROUP BY.  Unlike the exact count it composes across
    days/shards by sketch merge (`count_min_sketch` over stored sketch
    bytes is not exposed as a SQL merge, but ``CountMinSketch.mergeInPlace``
    on the driver is, and sketches are tiny).
    """
    spark = df.sparkSession
    row = df.selectExpr(
        f"count_min_sketch({col}, {eps}d, {confidence}d, {seed}) AS s",
        "count(*) AS n",
    ).collect()[0]
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytes(row.s))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    return [(k, int(cms.estimateCount(k)), int(row.n)) for k in keys]


def ks_statistic(
    df: DataFrame, col: str, group_col: str, a: str, b: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the ``col``
    distributions of groups ``a`` and ``b``: max over observed values of
    |ECDF_a(x) - ECDF_b(x)|.  The exact nonparametric companion to
    `psi_drift` (which is binned): KS catches any distributional change,
    PSI localizes it to buckets.

    Computed as one GROUP BY over distinct values (map-side combined —
    the window below runs over |distinct values| rows, not |rows|)
    followed by cumulative counts and a global max.  The unpartitioned
    ORDER BY window is the honest cost: an exact ECDF needs a total
    order.  At 100 TB run it on the distinct-value table (usually tiny
    for measures) or pre-bin to a fixed grid first — the binned ECDF
    bounds the exact KS within one bin's mass, and the window input
    becomes nbins rows.
    """
    from pyspark.sql import Window

    s = df.filter(F.col(group_col).isin(a, b)).select(
        F.col(col).alias("__v"),
        F.when(F.col(group_col) == a, 1).otherwise(0).alias("__g"),
    )
    c = s.groupBy("__v").agg(
        F.sum("__g").alias("__d1"),
        F.sum(F.lit(1) - F.col("__g")).alias("__d2"),
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = c.select(
        F.sum("__d1").over(w).alias("__c1"),
        F.sum("__d2").over(w).alias("__c2"),
        F.sum("__d1").over(tot).alias("__n1"),
        F.sum("__d2").over(tot).alias("__n2"),
    )
    gap = F.abs(
        F.col("__c1").cast("double") / F.col("__n1")
        - F.col("__c2").cast("double") / F.col("__n2")
    )
    return cum.agg(
        F.max("__n1").cast("bigint").alias("n1"),
        F.max("__n2").cast("bigint").alias("n2"),
        F.round(F.max(gap), 6).alias("ks_stat"),
    )


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT ROC-AUC (= the Mann-Whitney U statistic, midrank tie
    handling) per group — the ranking-quality metric for every learned
    scorer in the pipeline (q168's model filter, q141's BM25, q179's
    quality model): AUC = P(score(pos) > score(neg)) +
    ½·P(score(pos) = score(neg)).

    Scale shape — never a global sort of the raw rows:

      1. ``groupBy(score)`` collapses the corpus to the DISTINCT-SCORE
         histogram with per-score positive/negative counts — one
         partial-combined shuffle agg (the ks_statistic pattern).
         Window input is |distinct scores| rows per group, not |rows|.
      2. one ordered pass over the histogram accumulates negatives
         strictly below each score; the doubled numerator
         ``num2 = Σ_s p_s·(2·neg_below(s) + n_s)`` stays INTEGER
         (ties contribute exactly half), so the statistic is
         engine-exact up to the final division.

    For continuous scores whose distinct count approaches |rows|,
    quantize first (e.g. ``F.round(score, 6)``) — the binned AUC is
    within one bin's probability mass of the exact one, the same
    trade documented on :func:`ks_statistic`.

    ``label_col`` must be 0/1 integers.  Returns one row per group:
    (group_cols..., n_pos, n_neg, auc_r) with auc_r = round(auc, 6);
    groups with no positives or no negatives return NULL auc_r (AUC is
    undefined there) rather than failing.
    """
    from pyspark.sql import Window

    gb = list(group_cols or [])
    lab = F.col(label_col).cast("long")
    hist = df.groupBy(*gb, F.col(score_col).alias("__s")).agg(
        F.sum(lab).alias("__p"),
        F.sum(F.lit(1) - lab).alias("__n"),
    )
    w = (
        Window.partitionBy(*gb)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    neg_below = F.coalesce(F.sum("__n").over(w), F.lit(0))
    per_s = hist.withColumn(
        "__num2", F.col("__p") * (2 * neg_below + F.col("__n"))
    )
    agg = per_s.groupBy(*gb).agg(
        F.sum("__p").cast("bigint").alias("n_pos"),
        F.sum("__n").cast("bigint").alias("n_neg"),
        F.sum("__num2").cast("bigint").alias("__num2"),
    )
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        *gb,
        "n_pos",
        "n_neg",
        F.when(
            defined,
            F.round(
                F.col("__num2")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc_r"),
    )
