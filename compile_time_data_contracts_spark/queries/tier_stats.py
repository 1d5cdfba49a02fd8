"""Statistical and evaluation analytics (split of tier_stats_ts,
round 9): regression/robust-stats/rank-stats families, survival and
shrinkage estimators, calibration/lift/AUC readouts, stumps and
feature gain, apportionment and composition analyses.

Same playbook as the round-8 splits: registration order within the
former tier is preserved per family, all tier modules share the
`_shared` registry, and `queries()` / `oracle_sql()` stay the single
assembly points.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401
from ..operators.stats import gini_best_split, mann_whitney_u

@q(
    "q225_association_rules",
    """WITH it AS (
         SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       n AS (SELECT count(DISTINCT o) AS norders FROM it),
       sup AS (SELECT p, count(*) AS s FROM it GROUP BY p),
       freq AS (SELECT p FROM sup WHERE s >= 2),
       fit AS (SELECT it.o, it.p FROM it JOIN freq ON it.p = freq.p),
       pairs AS (
         SELECT a.p AS part_a, b.p AS part_b, count(*) AS support
         FROM fit a JOIN fit b ON a.o = b.o AND a.p < b.p
         GROUP BY a.p, b.p HAVING count(*) >= 2)
       SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
              round(CAST(support AS DOUBLE) / sa.s, 6) AS confidence,
              round(CAST(support * norders AS DOUBLE) / (sa.s * sb.s), 6)
                AS lift
       FROM pairs
       JOIN sup sa ON sa.p = part_a
       JOIN sup sb ON sb.p = part_b
       CROSS JOIN n""",
)
def q225(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association rules (A-priori shape): support /
    confidence / lift for part pairs co-ordered at least twice.  The
    scale lever is the A-PRIORI PRUNE: items below min-support are
    semi-joined OUT before the pair join (pair support <= item
    support, so the prune is lossless), and the pair join is an
    order-keyed equi-join whose per-order fan-out is C(items,2) —
    bounded by basket size (13 max here), never a cross join.
    Supports are integers and lift/confidence are ratios of exact
    integers, so round(., 6) matches bit-for-bit.  Co-occurrence
    mining is the same posting-join shape as q150's entity resolution
    and q203's boilerplate postings — here emitting the rules
    themselves."""
    it = (
        load_table(spark, sf, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    # it feeds sup, the basket count, and (via fit) BOTH sides of the
    # pair self-join; sup feeds the a-priori prune and both rule joins —
    # un-materialized, the lineitem scan+distinct tower re-derives per
    # reference (~5x).  Checkpoint each once (item-table-sized writes).
    from ..operators.materialize import pin as _pin
    it = it.transform(_pin)
    sup = it.groupBy("p").agg(F.count(F.lit(1)).alias("s")).checkpoint(
        eager=True
    )
    freq = sup.filter(F.col("s") >= 2).select("p")
    fit = it.join(freq, "p", "left_semi")
    a, b = fit.alias("a"), fit.alias("b")
    pairs = (
        a.join(
            b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
        )
        .groupBy(
            F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    n = it.agg(F.countDistinct("o").alias("norders"))
    return (
        pairs.join(
            sup.select(F.col("p").alias("part_a"), F.col("s").alias("sa")),
            "part_a",
        )
        .join(
            sup.select(F.col("p").alias("part_b"), F.col("s").alias("sb")),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("bigint").alias("support"),
            F.round(
                F.col("support").cast("double") / F.col("sa"), 6
            ).alias("confidence"),
            F.round(
                (F.col("support") * F.col("norders")).cast("double")
                / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
    )



_Q227_ORACLE = """
  WITH m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x1) AS BIGINT) AS s1,
           CAST(sum(x2) AS BIGINT) AS s2,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x1 * x1) AS BIGINT) AS s11,
           CAST(sum(x1 * x2) AS BIGINT) AS s12,
           CAST(sum(x2 * x2) AS BIGINT) AS s22,
           CAST(sum(x1 * y) AS BIGINT) AS s1y,
           CAST(sum(x2 * y) AS BIGINT) AS s2y
    FROM (
      SELECT CAST(floor(CAST(l_quantity AS DOUBLE)) AS BIGINT) AS x1,
             CAST(floor(CAST(l_discount AS DOUBLE) * 100) AS BIGINT) AS x2,
             CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
               AS y
      FROM lineitem)),
  d AS (
    SELECT n, s1, s2, sy, s11, s12, s22, s1y, s2y,
           CAST(n AS DOUBLE) AS fn, CAST(s1 AS DOUBLE) AS f1,
           CAST(s2 AS DOUBLE) AS f2, CAST(sy AS DOUBLE) AS fy,
           CAST(s11 AS DOUBLE) AS f11, CAST(s12 AS DOUBLE) AS f12,
           CAST(s22 AS DOUBLE) AS f22, CAST(s1y AS DOUBLE) AS f1y,
           CAST(s2y AS DOUBLE) AS f2y
    FROM m),
  k AS (
    SELECT n,
           fn * (f11 * f22 - f12 * f12)
             - f1 * (f1 * f22 - f12 * f2)
             + f2 * (f1 * f12 - f11 * f2) AS det,
           fy * (f11 * f22 - f12 * f12)
             - f1 * (f1y * f22 - f12 * f2y)
             + f2 * (f1y * f12 - f11 * f2y) AS d0,
           fn * (f1y * f22 - f12 * f2y)
             - fy * (f1 * f22 - f12 * f2)
             + f2 * (f1 * f2y - f1y * f2) AS d1,
           fn * (f11 * f2y - f1y * f12)
             - f1 * (f1 * f2y - f1y * f2)
             + fy * (f1 * f12 - f11 * f2) AS d2
    FROM d)
  SELECT n, round(d0 / det, 6) AS intercept_cents,
         round(d1 / det, 6) AS beta_qty_cents,
         round(d2 / det, 6) AS beta_disc_cents
  FROM k"""


@q("q227_ols_normal_equations", _Q227_ORACLE)
def q227(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed multiple linear regression by NORMAL EQUATIONS:
    y = extended price (cents) on [1, quantity, discount (cents)],
    solved in closed form from ONE partial-combined, groupBy-less
    moment aggregate (n + 3 first moments + 5 second moments) — the
    multi-feature extension of q163's regr_slope and q218's
    single-pass covariance.  At 100 TB the fit costs exactly the scan:
    the shuffle carries nine numbers per partition, the 3x3 Cramer
    solve happens IN-PLAN on the 1-row aggregate (no driver math, no
    Python), and the result stays lazy end to end.

    Engine-exactness: inputs are floored to integer quantities/cents,
    so the BIGINT moment sums are exact on both engines (largest,
    Σ x1·y <= 50 · 1e7 · 6e6 rows ~ 3e15 at sf1, inside BIGINT); the
    Cramer determinants are then computed in DOUBLE with the SAME
    expression tree on both engines — identical integer operands
    through identical IEEE operations give identical doubles, and
    round(., 6) pins the comparison.  For p features this generalizes
    to the p²/2-moment Gram aggregate + a driver-side k-sized solve
    (p ~ tens), never a per-row Python stage."""
    li = load_table(spark, sf, "lineitem").select(
        F.floor(F.col("l_quantity").cast("double"))
        .cast("bigint")
        .alias("x1"),
        F.floor(F.col("l_discount").cast("double") * 100)
        .cast("bigint")
        .alias("x2"),
        F.floor(F.col("l_extendedprice").cast("double") * 100)
        .cast("bigint")
        .alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    d = m.select(
        "n",
        *[
            F.col(c).cast("double").alias("f" + c[1:])
            for c in ("s1", "s2", "sy", "s11", "s12", "s22",
                      "s1y", "s2y")
        ],
        F.col("n").cast("double").alias("fn"),
    )
    c = F.col
    det = (
        c("fn") * (c("f11") * c("f22") - c("f12") * c("f12"))
        - c("f1") * (c("f1") * c("f22") - c("f12") * c("f2"))
        + c("f2") * (c("f1") * c("f12") - c("f11") * c("f2"))
    )
    d0 = (
        c("fy") * (c("f11") * c("f22") - c("f12") * c("f12"))
        - c("f1") * (c("f1y") * c("f22") - c("f12") * c("f2y"))
        + c("f2") * (c("f1y") * c("f12") - c("f11") * c("f2y"))
    )
    d1 = (
        c("fn") * (c("f1y") * c("f22") - c("f12") * c("f2y"))
        - c("fy") * (c("f1") * c("f22") - c("f12") * c("f2"))
        + c("f2") * (c("f1") * c("f2y") - c("f1y") * c("f2"))
    )
    d2 = (
        c("fn") * (c("f11") * c("f2y") - c("f1y") * c("f12"))
        - c("f1") * (c("f1") * c("f2y") - c("f1y") * c("f2"))
        + c("fy") * (c("f1") * c("f12") - c("f11") * c("f2"))
    )
    return d.select(
        "n",
        F.round(d0 / det, 6).alias("intercept_cents"),
        F.round(d1 / det, 6).alias("beta_qty_cents"),
        F.round(d2 / det, 6).alias("beta_disc_cents"),
    )



_Q228_ORACLE = """
  WITH x AS (
    SELECT l_returnflag AS flag,
           CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
             AS cents,
           CAST(floor(CAST(l_quantity AS DOUBLE)) AS BIGINT) AS w
    FROM lineitem),
  c AS (
    SELECT flag, cents, w,
           sum(w) OVER (PARTITION BY flag ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cw,
           sum(w) OVER (PARTITION BY flag) AS tw
    FROM x)
  SELECT flag, CAST(min(tw) AS BIGINT) AS total_weight,
         CAST(min(cents) AS BIGINT) AS weighted_median_cents
  FROM c WHERE cw * 2 >= tw GROUP BY flag"""


@q("q228_weighted_median", _Q228_ORACLE)
def q228(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group WEIGHTED median (lower median): smallest price whose
    cumulative quantity-weight reaches half the group's total — the
    robust location estimate for weight-skewed corpora (median
    document quality weighted by token count is the canonical 100 TB
    use).  RANK-BASED like q221: integer cents values and integer
    weights mean every comparison is exact on both engines — no
    quantile interpolation exists to diverge (Spark's
    percentile/approx_percentile and DuckDB's quantile_cont would).

    One sort-based window per group computes the running weight AND
    the group total on the SAME exchange+sort (the q221 shape), then a
    partial-combined groupBy takes min(value) over qualifying rows —
    two shuffles total, no join, no Python.  Determinism under ties:
    orderings differing within equal values permute cumulative sums
    only INSIDE a tie run; the qualifying condition is monotone and
    run-boundary sums are order-invariant, so the chosen value —
    min over qualifiers — is unique regardless of tie order."""
    x = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice").cast("double") * 100)
        .cast("bigint")
        .alias("cents"),
        F.floor(F.col("l_quantity").cast("double"))
        .cast("bigint")
        .alias("w"),
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("flag")
    c = x.select(
        "flag",
        "cents",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    return (
        c.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("tw").cast("bigint").alias("total_weight"),
            F.min("cents").cast("bigint").alias("weighted_median_cents"),
        )
    )



_Q232_ORACLE = """
  WITH x AS (
    SELECT p_partkey,
           CAST(floor(CAST(p_retailprice AS DOUBLE) * 100) AS BIGINT)
             AS cents
    FROM part),
  b AS (
    SELECT cents,
           ntile(4) OVER (ORDER BY cents, p_partkey) AS bin
    FROM x)
  SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
         CAST(min(cents) AS BIGINT) AS lo_cents,
         CAST(max(cents) AS BIGINT) AS hi_cents
  FROM b GROUP BY bin"""


@q("q232_equidepth_binning", _Q232_ORACLE)
def q232(spark: SparkSession, sf: str) -> DataFrame:
    """EQUI-DEPTH feature binning (quantile discretization for model
    features): ntile(4) over retail price assigns each part to one of
    four equal-population buckets; the output is the bucket spec
    (count + [lo, hi] boundaries) a trainer ships with the model.
    Rank-based like q221/q228 — ntile splits by ROW COUNT with an
    identical definition on both engines, so there is no quantile
    interpolation to diverge; ties are pinned by the compound
    (cents, p_partkey) sort key, making bucket ASSIGNMENTS (not just
    counts) engine- and run-deterministic.

    Shape: one global sort-window + one partial-combined groupBy.
    The unpartitioned ntile window is the honest cost of globally
    consistent bin EDGES; at 100 TB production swaps the exact pass
    for approx_percentile edges (q96) or runs this per shard — but
    the spec table this emits is 4 rows either way."""
    x = load_table(spark, sf, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice").cast("double") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.orderBy("cents", "p_partkey")
    return (
        x.select("cents", F.ntile(4).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
        )
        .select(F.col("bin").cast("int").alias("bin"), "n",
                "lo_cents", "hi_cents")
    )



_Q241_ORACLE = """
  WITH mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS mxd FROM orders),
  s AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           lead(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS nxt
    FROM orders),
  subj AS (
    SELECT c_mktsegment,
           CASE WHEN nxt IS NULL
                THEN date_diff('day', d, (SELECT mxd FROM mx))
                ELSE date_diff('day', d, nxt) END AS dur,
           CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
    FROM s JOIN customer ON o_custkey = c_custkey),
  hist AS (
    SELECT c_mktsegment, dur AS t,
           sum(ev) AS d, sum(1 - ev) AS c
    FROM subj GROUP BY 1, 2),
  ar AS (
    SELECT c_mktsegment, t, d,
           sum(d + c) OVER (PARTITION BY c_mktsegment)
           - coalesce(sum(d + c) OVER (
               PARTITION BY c_mktsegment ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS n
    FROM hist),
  km AS (
    SELECT c_mktsegment, t, d, n,
           CASE WHEN max(CASE WHEN d > 0 AND d = n THEN 1 ELSE 0 END)
                     OVER (PARTITION BY c_mktsegment ORDER BY t
                           ROWS UNBOUNDED PRECEDING) = 1
                THEN 0.0
                ELSE exp(sum(CASE WHEN d > 0 AND d < n
                             THEN ln(1.0 - d / CAST(n AS DOUBLE))
                             ELSE 0.0 END) OVER (
                  PARTITION BY c_mktsegment ORDER BY t
                  ROWS UNBOUNDED PRECEDING)) END AS surv
    FROM ar)
  SELECT c_mktsegment, CAST(t AS BIGINT) AS t,
         CAST(n AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d_events,
         round(surv, 6) AS surv_r
  FROM km WHERE d > 0"""


@q("q241_kaplan_meier", _Q241_ORACLE)
def q241(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival of customer inter-order gaps per market
    segment (`stats.kaplan_meier`): subjects are consecutive-order gaps
    (event) plus each customer's final open gap censored at the global
    max order date — the churn/retention estimator that handles
    censoring correctly where q153's cohort retention counts raw
    presence.  Subjects collapse to the per-duration histogram in one
    partial-combined aggregate; every window after runs over |distinct
    durations| per segment, never |orders|.  n_risk/d_events are exact
    integers; only the survival product is floating (exp∘Σln, rounded
    to 6 dp on both sides)."""
    from ..operators.stats import kaplan_meier

    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    mx = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("__mxd")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    s = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("__d"),
        F.lead(F.col("o_orderdate").cast("date")).over(w).alias("__nxt"),
    )
    subj = (
        s.crossJoin(F.broadcast(mx))
        .join(customer, s.o_custkey == customer.c_custkey)
        .select(
            "c_mktsegment",
            F.when(
                F.col("__nxt").isNull(),
                F.datediff(F.col("__mxd"), F.col("__d")),
            )
            .otherwise(F.datediff(F.col("__nxt"), F.col("__d")))
            .alias("dur"),
            F.when(F.col("__nxt").isNull(), 0).otherwise(1).alias("ev"),
        )
    )
    return kaplan_meier(subj, "dur", "ev", group_cols=["c_mktsegment"])



_Q242_ORACLE = """
  WITH per AS (
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS k
    FROM lineitem GROUP BY 1),
  pr AS (
    SELECT avg(k / CAST(n AS DOUBLE)) AS m,
           var_pop(k / CAST(n AS DOUBLE)) AS v
    FROM per),
  pr2 AS (
    SELECT m,
           greatest(m * (1.0 - m) / greatest(v, 1e-9) - 1.0, 0.0) AS s
    FROM pr)
  SELECT l_partkey, n, k,
         round(k / CAST(n AS DOUBLE), 6) AS rate_r,
         round((k + m * s) / (n + s), 6) AS shrunk_r
  FROM per CROSS JOIN pr2"""


@q("q242_eb_rate_shrinkage", _Q242_ORACLE)
def q242(spark: SparkSession, sf: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-part return rates
    (`stats.eb_rate_shrinkage`): method-of-moments prior over the raw
    per-key rates, then shrunk = (k+α)/(n+α+β) — the fix for "100 %
    return rate, n=1" artifacts before any per-key rate is thresholded
    or ranked (the q168 model-filter / q181 calibration companion for
    COUNTED outcomes).  Two partial-combined aggregate passes and one
    1-row broadcast prior — cost is the scan plus a |keys|-row shuffle
    at any scale, no iteration, no driver math."""
    from ..operators.stats import eb_rate_shrinkage

    li = load_table(spark, sf, "lineitem")
    return eb_rate_shrinkage(
        li.withColumn(
            "__ret", (F.col("l_returnflag") == "R").cast("int")
        ),
        ["l_partkey"],
        "__ret",
    )



_Q243_ORACLE = """
  WITH base AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS kk,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS v
    FROM orders),
  ex AS (
    SELECT kk, v, g
    FROM base CROSS JOIN
         (SELECT unnest(generate_series(0, 24)) AS g) r),
  dig AS (
    SELECT v, g,
           md5(kk || '|' || CAST(g AS VARCHAR) || '|' || 'boot-v1')
             AS d
    FROM ex),
  lanes AS (
    SELECT v, g, lane, substring(d, 1 + 4 * lane, 4) AS h
    FROM dig CROSS JOIN
         (SELECT unnest(generate_series(0, 7)) AS lane) l),
  wtab AS (
    SELECT v, g * 8 + lane AS b,
           CASE
             WHEN h < '5e2d' THEN 0
             WHEN h < 'bc5a' THEN 1
             WHEN h < 'eb71' THEN 2
             WHEN h < 'fb23' THEN 3
             WHEN h < 'ff10' THEN 4
             ELSE 5 END AS w
    FROM lanes),
  reps AS (
    SELECT b, CAST(sum(w * v) AS BIGINT) AS swx,
           CAST(sum(w) AS BIGINT) AS sw
    FROM wtab GROUP BY b),
  ranked AS (
    SELECT CAST(swx AS DOUBLE) / sw / 100 AS m,
           row_number() OVER (
             ORDER BY CAST(swx AS DOUBLE) / sw / 100 ASC, b ASC) AS rn
    FROM reps),
  full_m AS (
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(v) AS DOUBLE) / count(*) / 100 AS fm
    FROM base),
  ci AS (
    SELECT min(CASE WHEN rn = 5 THEN m END) AS lo,
           min(CASE WHEN rn = 195 THEN m END) AS hi
    FROM ranked)
  SELECT n_rows, CAST(200 AS BIGINT) AS n_boot,
         round(fm, 4) AS mean_r,
         round(lo, 4) AS ci_lo_r, round(hi, 4) AS ci_hi_r
  FROM full_m CROSS JOIN ci"""


@q("q243_poisson_bootstrap_ci", _Q243_ORACLE)
def q243(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson-bootstrap 95 % CI for mean order value
    (`stats.poisson_bootstrap_mean_ci`, 200 replicates): each row draws
    a DETERMINISTIC Poisson(1) weight per replicate from md5(key|b|salt)
    — the q209/q223 hash-determinism contract replacing RNG state — so
    the resample distributes as a map-side expression (never a global
    per-replicate sample) and any engine replays the exact replicate
    means.  Values fixed-pointed to cents make every replicate's
    (Σwx, Σw) an exact integer pair; the shuffle carries 200 rows per
    partition regardless of table size, and the CI is an order
    statistic over the 200-row replicate table."""
    from ..operators.stats import poisson_bootstrap_mean_ci

    orders = load_table(spark, sf, "orders")
    return poisson_bootstrap_mean_ci(
        orders, "o_totalprice", "o_orderkey", n_boot=200
    )



_Q246_ORACLE = """
  WITH s AS (
    SELECT l_returnflag,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
    FROM lineitem),
  ranked AS (
    SELECT l_returnflag, v,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY v ASC) AS rn,
           count(*) OVER (PARTITION BY l_returnflag) AS n
    FROM s),
  bounds AS (
    SELECT l_returnflag,
           min(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS INT))
                    THEN v END) AS lo,
           min(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS INT))
                    THEN v END) AS hi
    FROM ranked GROUP BY l_returnflag),
  clamped AS (
    SELECT s.l_returnflag, v,
           least(greatest(v, lo), hi) AS cv, lo, hi
    FROM s JOIN bounds ON s.l_returnflag = bounds.l_returnflag)
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         round(min(lo) / 100.0, 2) AS lo_r,
         round(min(hi) / 100.0, 2) AS hi_r,
         round(CAST(sum(v) AS DOUBLE) / count(*) / 100, 4) AS mean_r,
         round(CAST(sum(cv) AS DOUBLE) / count(*) / 100, 4)
           AS winsorized_mean_r
  FROM clamped GROUP BY l_returnflag"""


@q("q246_winsorized_stats", _Q246_ORACLE)
def q246(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized mean of extended price per return flag
    (`stats.winsorized_group_stats`, nearest-rank p05/p95 clamp): the
    outlier-robust mean that keeps n constant — q183/q221's robust
    family for money columns, where one fat-fingered 100× entry owns
    the plain mean.  Nearest-rank percentiles are INTEGER rank
    arithmetic on cents (engine-exact where interpolated quantiles
    diverge across engines); one per-group ordered window + a
    |groups|-row broadcast join + one partial-combined clamped sum —
    never a global sort."""
    from ..operators.stats import winsorized_group_stats

    li = load_table(spark, sf, "lineitem")
    return winsorized_group_stats(
        li, "l_extendedprice", ["l_returnflag"]
    )



_Q252_ORACLE = """
  WITH s AS (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS v
    FROM orders),
  ranked AS (
    SELECT o_orderpriority, v,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY v ASC) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM s)
  SELECT o_orderpriority,
         CAST(max(n) AS BIGINT) AS n,
         round(min(CASE WHEN rn = greatest(1,
                 CAST(ceil(0.5 * n) AS INT)) THEN v END) / 100.0, 2)
           AS p50_r,
         round(min(CASE WHEN rn = greatest(1,
                 CAST(ceil(0.9 * n) AS INT)) THEN v END) / 100.0, 2)
           AS p90_r,
         round(min(CASE WHEN rn = greatest(1,
                 CAST(ceil(0.99 * n) AS INT)) THEN v END) / 100.0, 2)
           AS p99_r
  FROM ranked GROUP BY o_orderpriority"""


@q("q252_percentile_bands", _Q252_ORACLE)
def q252(spark: SparkSession, sf: str) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 of order value per priority
    (`stats.percentile_bands`) — the published-SLO percentile report
    computed exactly (rank = ceil(q·n) on cents) where q96's
    approx_percentile trades determinism for speed: two engines or
    two runs never disagree on a published number.  One per-group
    ordered window + ONE conditional aggregate for all bands; the
    honest cost is the per-group sort (pre-bin to a histogram at
    100 TB, the ks_statistic trade)."""
    from ..operators.stats import percentile_bands

    orders = load_table(spark, sf, "orders")
    return percentile_bands(
        orders, "o_totalprice", ["o_orderpriority"]
    )



_Q254_ORACLE = """
  WITH folded AS (
    SELECT o_orderpriority,
           CAST((('0x' || substring(
               md5(CAST(o_orderkey AS VARCHAR) || '|' || 'kfold-v1'),
               1, 8))::BIGINT % 5) AS INT) AS fold,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS v
    FROM orders),
  cells AS (
    SELECT o_orderpriority, fold,
           CAST(count(*) AS BIGINT) AS n, sum(v) AS s
    FROM folded GROUP BY 1, 2),
  w AS (
    SELECT o_orderpriority, fold, n,
           sum(n) OVER (PARTITION BY o_orderpriority) - n AS loo_n,
           sum(s) OVER (PARTITION BY o_orderpriority) - s AS loo_s
    FROM cells)
  SELECT o_orderpriority, fold, n AS n_in_fold,
         CASE WHEN loo_n > 0
              THEN round(CAST(loo_s AS DOUBLE) / loo_n / 100, 4)
              END AS encoded_r
  FROM w"""


@q("q254_target_encoding_loo", _Q254_ORACLE)
def q254(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-free leave-fold-out target encoding of order priority
    by mean order value (`sampling.target_encode_loo`, 5 md5 folds):
    each row's feature excludes its own fold's labels — the naive
    per-key mean leaks every row's own label into its feature and
    inflates validation scores (the q166 leakage-safe-split
    discipline, feature-level).  NO per-fold corpus re-aggregation:
    one partial-combined (key, fold) cell pass + window sums over the
    |keys|·k cell table; cents fixed-pointing keeps every encoded
    value a ratio of exact integers."""
    from ..operators.sampling import target_encode_loo

    orders = load_table(spark, sf, "orders")
    return target_encode_loo(
        orders,
        ["o_orderpriority"],
        "o_totalprice",
        "o_orderkey",
        k=5,
    )



_Q256_ORACLE = """
  WITH s0 AS (
    SELECT l_partkey,
           sum(CAST(floor(l_quantity) AS BIGINT)) AS q,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS r
    FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
  s1 AS (
    SELECT l_partkey,
           sum(CAST(floor(l_quantity) AS BIGINT)) AS q,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS r
    FROM lineitem WHERE year(l_shipdate) = 1998 GROUP BY 1),
  j AS (
    SELECT s0.q AS q0x, s1.q AS q1x, s0.r AS r0x, s1.r AS r1x
    FROM s0 FULL OUTER JOIN s1 ON s0.l_partkey = s1.l_partkey),
  e AS (
    SELECT CASE WHEN q0x IS NOT NULL AND q1x IS NOT NULL THEN 'both'
                WHEN q1x IS NOT NULL THEN 'new' ELSE 'lost' END
             AS status,
           coalesce(q0x, 0) AS q0, coalesce(q1x, 0) AS q1,
           coalesce(r0x, 0) / 100.0 AS r0,
           coalesce(r1x, 0) / 100.0 AS r1
    FROM j),
  f AS (
    SELECT status, q0, q1, r0, r1,
           CASE WHEN status = 'both' AND q0 > 0 AND q1 > 0
                THEN (q1 - q0) * (r0 / q0)
                WHEN status = 'both' THEN r1 - r0
                WHEN status = 'new' THEN r1 ELSE -r0 END AS vol,
           CASE WHEN status = 'both' AND q0 > 0 AND q1 > 0
                THEN (r1 / q1 - r0 / q0) * q0 ELSE 0.0 END AS pr,
           CASE WHEN status = 'both' AND q0 > 0 AND q1 > 0
                THEN (q1 - q0) * (r1 / q1 - r0 / q0)
                ELSE 0.0 END AS cr
    FROM e)
  SELECT status, CAST(count(*) AS BIGINT) AS n_keys,
         round(sum(r0), 2) AS rev0_r, round(sum(r1), 2) AS rev1_r,
         round(sum(vol), 2) AS volume_eff_r,
         round(sum(pr), 2) AS price_eff_r,
         round(sum(cr), 2) AS cross_eff_r
  FROM f GROUP BY status"""


@q("q256_price_volume_mix", _Q256_ORACLE)
def q256(spark: SparkSession, sf: str) -> DataFrame:
    """Price-volume-mix decomposition of the 1997→1998 revenue delta
    per part, rolled up by status (`stats.price_volume_mix`): the
    FP&A "WHY did revenue move" answer — volume effect (q·Δ at old
    price), price effect (Δu at old volume), cross term, and
    new/lost-part buckets carrying their full revenue — where a plain
    GROUP BY delta can hide +5 % volume against −7 % price.  One
    partial-combined aggregate per period + one full-outer equi-join
    of |keys| rows; Q/R exact integers, effects the identical IEEE
    tree, rounded at the report edge only."""
    from ..operators.stats import price_volume_mix

    li = load_table(spark, sf, "lineitem")
    pvm = price_volume_mix(
        li.filter(F.year("l_shipdate") == 1997),
        li.filter(F.year("l_shipdate") == 1998),
        ["l_partkey"],
        "l_quantity",
        "l_extendedprice",
    )
    return pvm.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.round(F.sum("r0"), 2).alias("rev0_r"),
        F.round(F.sum("r1"), 2).alias("rev1_r"),
        F.round(F.sum("volume_eff"), 2).alias("volume_eff_r"),
        F.round(F.sum("price_eff"), 2).alias("price_eff_r"),
        F.round(F.sum("cross_eff"), 2).alias("cross_eff_r"),
    )



_Q257_ORACLE = """
  WITH scored AS (
    SELECT l_returnflag AS label,
           CASE WHEN floor(l_quantity) <= 17 THEN 'N'
                WHEN floor(l_quantity) <= 34 THEN 'A'
                ELSE 'R' END AS pred
    FROM lineitem),
  cont AS (
    SELECT label AS l, pred AS p, count(*) AS c
    FROM scored GROUP BY 1, 2),
  classes AS (
    SELECT l AS class FROM cont UNION SELECT p FROM cont),
  rows_m AS (SELECT l AS class, sum(c) AS rs FROM cont GROUP BY 1),
  cols_m AS (SELECT p AS class, sum(c) AS cs FROM cont GROUP BY 1),
  diag AS (SELECT l AS class, c AS tp FROM cont WHERE l = p),
  m AS (
    SELECT cl.class,
           CAST(coalesce(rs, 0) AS BIGINT) AS support,
           CAST(coalesce(tp, 0) AS BIGINT) AS tp,
           CAST(coalesce(cs, 0) - coalesce(tp, 0) AS BIGINT) AS fp,
           CAST(coalesce(rs, 0) - coalesce(tp, 0) AS BIGINT) AS fn
    FROM classes cl
    LEFT JOIN rows_m USING (class)
    LEFT JOIN cols_m USING (class)
    LEFT JOIN diag USING (class))
  SELECT class, support, tp, fp, fn,
         CASE WHEN tp + fp > 0
              THEN round(tp / CAST(tp + fp AS DOUBLE), 6)
              END AS precision_r,
         CASE WHEN tp + fn > 0
              THEN round(tp / CAST(tp + fn AS DOUBLE), 6)
              END AS recall_r,
         CASE WHEN tp + fp > 0 AND tp + fn > 0
                   AND (tp / CAST(tp + fp AS DOUBLE)
                        + tp / CAST(tp + fn AS DOUBLE)) > 0
              THEN round(2.0 * (tp / CAST(tp + fp AS DOUBLE))
                             * (tp / CAST(tp + fn AS DOUBLE))
                         / (tp / CAST(tp + fp AS DOUBLE)
                            + tp / CAST(tp + fn AS DOUBLE)), 6)
              END AS f1_r
  FROM m"""


@q("q257_classification_report", _Q257_ORACLE)
def q257(spark: SparkSession, sf: str) -> DataFrame:
    """Per-class precision/recall/F1 of a rule-based return-flag
    classifier (`stats.classification_report`) — the multi-class eval
    view completing q238's AUC (threshold-free ranking) and q234's
    kappa (chance-corrected agreement): WHICH class does the
    classifier fail on, with never-predicted / never-labeled classes
    surfaced as NULL precision/recall rather than dropped rows or
    divide errors.  One partial-combined pass to the confusion
    matrix; everything after operates on |classes|-row margins."""
    from ..operators.stats import classification_report

    li = load_table(spark, sf, "lineitem")
    qf = F.floor(F.col("l_quantity"))
    scored = li.select(
        F.col("l_returnflag").alias("label"),
        F.when(qf <= 17, "N").when(qf <= 34, "A").otherwise("R")
        .alias("pred"),
    )
    return classification_report(scored, "label", "pred")



_Q269_ORACLE = """
  WITH scored AS (
    SELECT CAST((('0x' || substring(
             md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)
                 || '|' || 'cv-v1'), 1, 8))::BIGINT % 5) AS INT)
             AS fold,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab,
           round(l_quantity + l_discount * 10, 2) AS s
    FROM lineitem),
  hist AS (
    SELECT fold, s, sum(lab) AS p, sum(1 - lab) AS n
    FROM scored GROUP BY 1, 2),
  w AS (
    SELECT fold, s, p, n,
           coalesce(sum(n) OVER (
             PARTITION BY fold ORDER BY s ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS nb
    FROM hist),
  a AS (
    SELECT fold,
           CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(n) AS BIGINT) AS n_neg,
           CAST(sum(p * (2 * nb + n)) AS BIGINT) AS num2
    FROM w GROUP BY fold)
  SELECT fold, n_pos, n_neg,
         CASE WHEN n_pos > 0 AND n_neg > 0
              THEN round(num2 / (2.0 * n_pos * n_neg), 6)
              END AS auc_r
  FROM a"""


@q("q269_cross_validated_auc", _Q269_ORACLE)
def q269(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-validated ROC-AUC: the q238 exact Mann-Whitney AUC of a
    rule scorer for return flags, evaluated PER md5 FOLD (q223's
    determinism contract) in one shot — `roc_auc(group_cols=['fold'])`
    — the eval loop every learned filter needs (is the AUC stable
    across folds, or did one lucky slice carry it?).  Folds are a
    zero-shuffle projection; the per-fold AUC reuses the
    histogram-collapse shape, windows over |folds|·|distinct scores|
    rows.  Composition, not new machinery: kfold_assign ∘ roc_auc."""
    from ..operators.sampling import kfold_assign
    from ..operators.stats import roc_auc

    li = load_table(spark, sf, "lineitem")
    scored = kfold_assign(
        li.withColumn(
            "__k",
            (
                F.col("l_orderkey") * 10 + F.col("l_linenumber")
            ).cast("string"),
        ),
        "__k",
        k=5,
        salt="cv-v1",
    ).select(
        "fold",
        (F.col("l_returnflag") == "R").cast("int").alias("lab"),
        F.round(
            F.col("l_quantity") + F.col("l_discount") * 10, 2
        ).alias("s"),
    )
    return roc_auc(scored, "lab", "s", group_cols=["fold"])



_Q272_ORACLE = """
  WITH mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS mxd FROM orders),
  per AS (
    SELECT o_custkey,
           CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS last_d,
           CAST(count(*) AS BIGINT) AS frequency,
           sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1),
  e AS (
    SELECT o_custkey,
           date_diff('day', last_d, (SELECT mxd FROM mx))
             AS recency_days,
           frequency, cents
    FROM per),
  t AS (
    SELECT o_custkey, recency_days, frequency, cents,
           (6 - ntile(5) OVER (ORDER BY recency_days ASC,
                               o_custkey ASC)) AS r_score,
           ntile(5) OVER (ORDER BY frequency ASC, o_custkey ASC)
             AS f_score,
           ntile(5) OVER (ORDER BY cents ASC, o_custkey ASC)
             AS m_score
    FROM e)
  SELECT o_custkey,
         CAST(recency_days AS INT) AS recency_days,
         frequency,
         round(cents / 100.0, 2) AS monetary_r,
         CAST(r_score AS INT) AS r_score,
         CAST(f_score AS INT) AS f_score,
         CAST(m_score AS INT) AS m_score,
         CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
           || CAST(m_score AS VARCHAR) AS segment
  FROM t"""


@q("q272_rfm_scores", _Q272_ORACLE)
def q272(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation (`stats.rfm_scores`, quintiles):
    recency (days since last order, anchor = corpus max date —
    broadcast, never now()), frequency, fixed-point monetary, each
    ntile-bucketed WITH the key as tiebreak (plain ntile on a tied
    column is partitioning-dependent — the determinism bug every
    naive RFM ships), recency reversed so recent = 5.  One
    partial-combined aggregate to |customers| rows + three windows
    over that table."""
    from ..operators.stats import rfm_scores

    orders = load_table(spark, sf, "orders")
    return rfm_scores(
        orders, "o_custkey", "o_orderdate", "o_totalprice"
    )



_Q273_ORACLE = """
  WITH per AS (
    SELECT l_partkey,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem GROUP BY 1),
  ranked AS (
    SELECT l_partkey, cents,
           sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
           sum(cents) OVER () AS tot
    FROM per),
  classed AS (
    SELECT l_partkey, cents,
           CASE WHEN cum / CAST(tot AS DOUBLE) <= 0.8 THEN 'A'
                WHEN cum / CAST(tot AS DOUBLE) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked)
  SELECT abc_class,
         CAST(count(*) AS BIGINT) AS n_parts,
         round(sum(cents) / 100.0, 2) AS revenue_r
  FROM classed GROUP BY abc_class"""


@q("q273_abc_analysis", _Q273_ORACLE)
def q273(spark: SparkSession, sf: str) -> DataFrame:
    """ABC / Pareto revenue classification: parts ranked by revenue,
    classed A/B/C at 80 %/95 % cumulative share — the inventory-
    management cousin of the Pareto skyline (q222): WHERE does the
    revenue concentrate, as a published three-row report.  One
    partial-combined aggregate to |parts| rows; the ordered
    cumulative window runs over that table (tiebreak by key so class
    boundaries are engine-deterministic); shares are ratios of exact
    integer cents."""
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("cents")
    )
    wcum = Window.orderBy(
        F.col("cents").desc(), F.col("l_partkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    share = F.sum("cents").over(wcum) / F.sum("cents").over(wall).cast(
        "double"
    )
    classed = per.select(
        "cents",
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("cents") / 100.0, 2).alias("revenue_r"),
    )



_Q279_ORACLE = """
  WITH rev AS (
    SELECT n.n_name, r.r_name,
           sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2)
  SELECT n_name, r_name,
         round(cents / 100.0, 2) AS rev_r,
         round(cents / CAST(sum(cents) OVER (PARTITION BY r_name)
                            AS DOUBLE), 6) AS share_of_region_r,
         round(sum(cents) OVER (PARTITION BY r_name)
               / CAST(sum(cents) OVER () AS DOUBLE), 6)
           AS region_share_of_total_r
  FROM rev"""


@q("q279_percent_of_parent", _Q279_ORACLE)
def q279(spark: SparkSession, sf: str) -> DataFrame:
    """Percent-of-parent hierarchy shares: each nation's revenue as a
    share of its region, and each region's share of the total — the
    BI drill-down metric a plain ROLLUP (q20) doesn't give (rollup
    emits parent totals; percent-of-parent needs the child/parent
    RATIO on every child row, i.e. windows over the |nations|-row
    rollup, never a second scan).  Dimension joins broadcast; shares
    are ratios of exact integer cents."""
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    rev = (
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        )
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    wr = Window.partitionBy("r_name")
    wall = Window.partitionBy()
    return rev.select(
        "n_name",
        "r_name",
        F.round(F.col("cents") / 100.0, 2).alias("rev_r"),
        F.round(
            F.col("cents") / F.sum("cents").over(wr).cast("double"), 6
        ).alias("share_of_region_r"),
        F.round(
            F.sum("cents").over(wr)
            / F.sum("cents").over(wall).cast("double"),
            6,
        ).alias("region_share_of_total_r"),
    )



_Q289_ORACLE = """
  WITH conv AS (
    SELECT user_id AS cu, ts AS ct, event_id AS cid
    FROM events WHERE event_type = 'purchase'),
  touch AS (
    SELECT user_id AS tu, ts AS tt, event_id AS tid,
           event_type AS channel
    FROM events WHERE event_type <> 'purchase'),
  paired AS (
    SELECT c.cu, c.cid, t.tt, t.tid, t.channel
    FROM conv c LEFT JOIN touch t
      ON c.cu = t.tu AND t.tt < c.ct
     AND t.tt >= c.ct - INTERVAL 7 DAY),
  scored AS (
    SELECT coalesce(channel, '(direct)') AS channel,
           row_number() OVER (PARTITION BY cu, cid
                              ORDER BY tt, tid) AS rf,
           row_number() OVER (PARTITION BY cu, cid
                              ORDER BY tt DESC, tid DESC) AS rl,
           count(tid) OVER (PARTITION BY cu, cid) AS n
    FROM paired)
  SELECT channel,
         CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS first_touch,
         CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS last_touch,
         CAST(sum(CAST(floor(1000000 / CAST(greatest(n, 1) AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS linear_micro
  FROM scored GROUP BY channel"""


@q("q289_multitouch_attribution", _Q289_ORACLE)
def q289(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-touch marketing attribution (`operators/timeseries.py:
    multitouch_attribution`): every purchase is a conversion; the
    user's non-purchase events in the 7 days strictly before it are
    its touches; channels are credited under first-touch, last-touch,
    and linear simultaneously (linear integerized to floor(1e6/n)
    micro-credits so no float summation order can flip the hash).
    Conversions with an empty window credit '(direct)'.  The
    touch-conversion pairing is a USER-keyed equi-join with a range
    predicate — work is per-user quadratic only, never global; at
    100 TB heavy users are an AQE skew case, not a rewrite.  The
    funnel conversion ops (q239/q263) answer "did they convert";
    this answers the complementary "which channel gets the credit"."""
    from ..operators.timeseries import multitouch_attribution

    ev = load_table(spark, sf, "events")
    return multitouch_attribution(
        ev,
        "user_id",
        "ts",
        "event_id",
        "event_type",
        conversion_channel="purchase",
        lookback_days=7,
    )



_Q299_ORACLE = """
  WITH scored AS (
    SELECT round(l_quantity + l_discount * 10, 2) AS s,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab,
           l_orderkey, l_linenumber
    FROM lineitem),
  d AS (
    SELECT lab,
           ntile(10) OVER (ORDER BY s DESC, l_orderkey, l_linenumber)
             AS decile
    FROM scored),
  per AS (
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(lab) AS BIGINT) AS pos
    FROM d GROUP BY decile),
  cum AS (
    SELECT decile, n, pos,
           sum(n) OVER (ORDER BY decile) AS cum_n,
           sum(pos) OVER (ORDER BY decile) AS cum_pos,
           sum(n) OVER () AS tot_n,
           sum(pos) OVER () AS tot_pos
    FROM per)
  SELECT decile, n, pos,
         CAST(cum_pos AS BIGINT) AS cum_pos,
         round(cum_pos / CAST(tot_pos AS DOUBLE), 6) AS capture_r,
         round((cum_pos / CAST(cum_n AS DOUBLE))
               / (tot_pos / CAST(tot_n AS DOUBLE)), 6) AS lift_r
  FROM cum"""


@q("q299_decile_lift", _Q299_ORACLE)
def q299(spark: SparkSession, sf: str) -> DataFrame:
    """Decile lift/gains table for the q269 rule scorer: rows ranked
    by score descending into ntile(10) buckets (deterministic
    orderkey/linenumber tiebreak), then per decile the positive
    count, cumulative capture rate, and lift over base rate — the
    model-eval artifact between q238's scalar AUC (threshold-free but
    opaque) and q181's calibration deciles (reliability, not
    targeting value): "mail the top 2 deciles" decisions read this
    table.  Ratios of exact integer counts rounded at 6 dp; the
    global ntile is one total-order sort — the same cost class as
    q28/q93, acceptable because the output contract is a global
    ranking (per-group variants ride q272's window shape)."""
    li = load_table(spark, sf, "lineitem")
    scored = li.select(
        F.round(F.col("l_quantity") + F.col("l_discount") * 10, 2).alias(
            "s"
        ),
        (F.col("l_returnflag") == "R").cast("int").alias("lab"),
        "l_orderkey",
        "l_linenumber",
    )
    # ntile over an unpartitioned window is a single-task sort of all
    # of lineitem.  The order key (s desc, orderkey, linenumber) is a
    # total order with ~10² distinct leading values, so the global rank
    # decomposes into a parallel per-value window + broadcast offsets
    # (`grouped_global_rank`), and ntile's exact bucketing (first
    # n mod b buckets get one extra row) is a closed-form expression of
    # the 0-based rank and the broadcast total — integers identical to
    # the window form.
    from ..operators.stats import grouped_global_rank

    nn = scored.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    ranked = (
        grouped_global_rank(
            scored,
            "s",
            ["l_orderkey", "l_linenumber"],
            out_col="__r0",
            descending=True,
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
            F.col("__r")
            + F.expr("(__r0 - __r * (__q + 1)) DIV __q")
            + 1,
        )
        .cast("int")
    )
    d = ranked.select("lab", decile.alias("decile"))
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("pos"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = per.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wall).alias("tot_n"),
        F.sum("pos").over(wall).alias("tot_pos"),
    )
    return cum.select(
        "decile",
        "n",
        "pos",
        F.col("cum_pos").cast("bigint").alias("cum_pos"),
        F.round(
            F.col("cum_pos") / F.col("tot_pos").cast("double"), 6
        ).alias("capture_r"),
        F.round(
            (F.col("cum_pos") / F.col("cum_n").cast("double"))
            / (F.col("tot_pos") / F.col("tot_n").cast("double")),
            6,
        ).alias("lift_r"),
    )



_Q300_ORACLE = """
  SELECT l_returnflag, l_linestatus,
         round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_r,
         round(quantile_cont(l_extendedprice, 0.50), 4) AS p50_r,
         round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_r,
         round(quantile_cont(l_extendedprice, 0.90), 4) AS p90_r,
         round(quantile_cont(l_extendedprice, 0.75)
               - quantile_cont(l_extendedprice, 0.25), 4) AS iqr_r
  FROM lineitem GROUP BY 1, 2"""


@q("q300_percentile_cont_spread", _Q300_ORACLE)
def q300(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT interpolated percentiles per group (`percentile()`, the
    ANSI percentile_cont semantics: linear interpolation at rank
    (n-1)p): p25/p50/p75/p90 and the IQR of extended price by
    (returnflag, linestatus) — the exact twin of q96's
    approx_percentile and the spread companion to q131's
    median/mode.  Both engines implement the identical (n-1)p
    interpolation over a per-group sort, so values hash-match to the
    bit (verified raw-equal before rounding at gate scale); one
    shuffle on the 6-group key, percentile state is per-group
    sorted-values — at 100 TB you reach for q96's sketch unless the
    contract demands exactness, which is precisely the trade the
    q96/q300 pair documents."""
    from ..operators.spread import spread_for_compute

    li = load_table(spark, sf, "lineitem")
    # exact-percentile partial state (per-group value buffers) builds in
    # the scan stage; spread the 3-column projection first (guide §2.5 —
    # no-op on wide scans; percentile merge is order-insensitive)
    li = spread_for_compute(
        li.select("l_returnflag", "l_linestatus", "l_extendedprice")
    )
    pc = lambda p: F.expr(f"percentile(l_extendedprice, {p})")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(pc(0.25), 4).alias("p25_r"),
        F.round(pc(0.50), 4).alias("p50_r"),
        F.round(pc(0.75), 4).alias("p75_r"),
        F.round(pc(0.90), 4).alias("p90_r"),
        F.round(pc(0.75) - pc(0.25), 4).alias("iqr_r"),
    )



_Q307_ORACLE = """
  WITH trials AS (
    SELECT user_id % 2 AS arm, ts, event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
    FROM events
    WHERE event_type IN ('purchase', 'view')),
  walked AS (
    SELECT arm,
           row_number() OVER (PARTITION BY arm
                              ORDER BY ts, event_id) AS n,
           sum(CASE WHEN s = 1 THEN 200671 ELSE -200671 END)
             OVER (PARTITION BY arm ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS llr
    FROM trials),
  crossing AS (
    SELECT arm,
           min(CASE WHEN llr >= 2890372 OR llr <= -2251292
                    THEN n END) AS n_decide
    FROM walked GROUP BY arm),
  final AS (
    SELECT w.arm,
           CAST(max(w.n) AS BIGINT) AS n_total,
           CAST(c.n_decide AS BIGINT) AS n_decide,
           CAST(min(CASE WHEN w.n = c.n_decide THEN w.llr END)
                AS BIGINT) AS llr_at_decision
    FROM walked w JOIN crossing c ON w.arm = c.arm
    GROUP BY w.arm, c.n_decide)
  SELECT arm, n_total, n_decide, llr_at_decision,
         CASE WHEN n_decide IS NULL THEN 'continue'
              WHEN llr_at_decision >= 2890372 THEN 'accept_h1'
              ELSE 'accept_h0' END AS decision
  FROM final"""


@q("q307_sprt_decision", _Q307_ORACLE)
def q307(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential probability ratio test (Wald 1945) per experiment
    arm: walk the (ts, event_id)-ordered purchase-vs-view Bernoulli
    stream accumulating the log-likelihood ratio for H1 p=0.55 vs
    H0 p=0.45 and report WHERE the test first crosses the
    alpha=0.05/beta=0.10 Wald bounds — the "stop the experiment
    early" primitive the fixed-horizon q253 z-test cannot give
    (peeking at a z-test inflates alpha; SPRT's bounds price peeking
    in).  All increments and bounds are Python-precomputed micro
    integers (the q290 no-libm rule), so the cumulative walk,
    crossing index, and verdict replay exactly in ANSI SQL.  One
    arm-partitioned sort carries both the row-number and the running
    sum; the crossing pick is a conditional min over the same
    partition."""
    ev = load_table(spark, sf, "events")
    trials = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    )
    wo = Window.partitionBy("arm").orderBy("ts", "event_id")
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    inc = F.when(F.col("s") == 1, F.lit(200671)).otherwise(
        F.lit(-200671)
    )
    walked = trials.select(
        "arm",
        F.row_number().over(wo).alias("n"),
        F.sum(inc).over(wcum).alias("llr"),
    )
    crossed = F.when(
        (F.col("llr") >= 2890372) | (F.col("llr") <= -2251292),
        F.col("n"),
    )
    final = walked.groupBy("arm").agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.min(crossed).cast("bigint").alias("n_decide"),
    )
    at_dec = walked.select(
        "arm", F.col("n").alias("nd"), F.col("llr").alias("llr_d")
    )
    out = final.join(
        at_dec,
        (final["arm"] == at_dec["arm"])
        & (final["n_decide"] == at_dec["nd"]),
        "left",
    ).select(
        final["arm"],
        "n_total",
        "n_decide",
        F.col("llr_d").cast("bigint").alias("llr_at_decision"),
        F.when(F.col("n_decide").isNull(), "continue")
        .when(F.col("llr_d") >= 2890372, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )
    return out


# =========================================================================
# Round-7 batch B: sweep-line, folds, merge algebra, spatial, ML splits,
# rank statistics, calendar islands (Q308-Q316; q313 lives in tier_llm)
# =========================================================================


_Q312_ORACLE = """
  WITH base AS (
    SELECT l_linestatus AS grp,
           CAST(floor(l_extendedprice) AS BIGINT) AS f,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
    FROM lineitem),
  cand AS (
    SELECT grp, f, count(*) AS cnt, sum(pos) AS p
    FROM base GROUP BY grp, f),
  tot AS (
    SELECT grp, CAST(sum(cnt) AS BIGINT) AS n,
           CAST(sum(p) AS BIGINT) AS np
    FROM cand GROUP BY grp),
  walked AS (
    SELECT grp, f,
           CAST(sum(cnt) OVER w AS BIGINT) AS nl,
           CAST(sum(p) OVER w AS BIGINT) AS pl
    FROM cand
    WINDOW w AS (PARTITION BY grp ORDER BY f
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
  scored AS (
    SELECT w.grp, w.f, w.nl, w.pl,
           t.n - w.nl AS nr, t.np - w.pl AS pr, t.n AS n,
           (CAST(w.pl AS DOUBLE) * w.pl
             + CAST(w.nl - w.pl AS DOUBLE) * (w.nl - w.pl)) / w.nl
           + (CAST(t.np - w.pl AS DOUBLE) * (t.np - w.pl)
             + CAST((t.n - w.nl) - (t.np - w.pl) AS DOUBLE)
               * ((t.n - w.nl) - (t.np - w.pl))) / (t.n - w.nl)
             AS purity
    FROM walked w JOIN tot t ON w.grp = t.grp
    WHERE w.nl < t.n),
  best AS (
    SELECT grp, f, nl, pl, nr, pr, n, purity,
           row_number() OVER (PARTITION BY grp
                              ORDER BY purity DESC, f ASC) AS rn
    FROM scored)
  SELECT grp, CAST(f AS BIGINT) AS best_threshold,
         nl AS n_left, pl AS pos_left,
         CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
         round((n - purity) / n, 6) AS weighted_gini_r
  FROM best WHERE rn = 1"""


@q("q312_decision_stump", _Q312_ORACLE)
def q312(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed decision-stump training: per l_linestatus group,
    find the price threshold minimizing weighted Gini impurity for
    predicting returns.  The classical single-machine sort-and-scan
    becomes one groupBy (histogram per candidate value) + one
    group-partitioned cumulative window + an argmax — O(n log n) with
    the shuffle carrying one row per DISTINCT feature value, not per
    row.  Purity is rational arithmetic over exact integer cumulative
    counts (squares lifted to DOUBLE before multiply so 100 TB-scale
    counts can't overflow BIGINT), so the argmax is deterministic and
    oracle-replayable; ties break toward the smallest threshold.  This
    is the per-feature inner loop of distributed tree boosting."""
    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.col("l_linestatus").alias("grp"),
        F.floor("l_extendedprice").cast("bigint").alias("f"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    return gini_best_split(base, "grp", "f", "pos")



_Q314_ORACLE = """
  WITH rev AS (
    SELECT s.s_nationkey AS nk,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey),
  bal AS (
    SELECT s_nationkey AS nk,
           CAST(sum(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_c,
           CAST(count(*) AS BIGINT) AS ns
    FROM supplier GROUP BY s_nationkey),
  met AS (
    SELECT r.nk, r.rev_c, CAST(b.bal_c AS DOUBLE) / b.ns AS avgbal
    FROM rev r JOIN bal b ON r.nk = b.nk),
  ranked AS (
    SELECT nk, rev_c, avgbal,
           (CAST(rank() OVER (ORDER BY rev_c) AS DOUBLE) * 2
             + count(*) OVER (PARTITION BY rev_c) - 1) / 2 AS rx,
           (CAST(rank() OVER (ORDER BY avgbal) AS DOUBLE) * 2
             + count(*) OVER (PARTITION BY avgbal) - 1) / 2 AS ry
    FROM met),
  pear AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           sum(rx) AS sx, sum(ry) AS sy, sum(rx * rx) AS sxx,
           sum(ry * ry) AS syy, sum(rx * ry) AS sxy
    FROM ranked),
  kend AS (
    SELECT sum(CASE WHEN (a.rev_c - b.rev_c) * (a.avgbal - b.avgbal) > 0
                    THEN 1 ELSE 0 END) AS nc,
           sum(CASE WHEN (a.rev_c - b.rev_c) * (a.avgbal - b.avgbal) < 0
                    THEN 1 ELSE 0 END) AS nd,
           sum(CASE WHEN a.rev_c = b.rev_c THEN 1 ELSE 0 END) AS tx,
           sum(CASE WHEN a.avgbal = b.avgbal THEN 1 ELSE 0 END) AS ty
    FROM ranked a JOIN ranked b ON a.nk < b.nk)
  SELECT p.n,
         round((p.n * p.sxy - p.sx * p.sy)
               / sqrt((p.n * p.sxx - p.sx * p.sx)
                      * (p.n * p.syy - p.sy * p.sy)), 6)
           AS spearman_rho_r,
         round((CAST(k.nc AS DOUBLE) - k.nd)
               / sqrt((CAST(p.n AS DOUBLE) * (p.n - 1) / 2 - k.tx)
                      * (CAST(p.n AS DOUBLE) * (p.n - 1) / 2 - k.ty)), 6)
           AS kendall_taub_r
  FROM pear p CROSS JOIN kend k"""


@q("q314_rank_correlation", _Q314_ORACLE)
def q314(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rho and Kendall tau-b between two per-nation metrics
    (supplier revenue vs mean account balance).  The data-sized work is
    two partial-aggregated rollups to a |nations|-sized table; ranks
    use the average-rank tie convention (rank*2 + tiecount - 1)/2, rho
    is Pearson over those ranks from exact half-integer sums, and
    tau-b's concordant/discordant sweep is a self-join on the TINY
    aggregate (25x25), never on fact rows.  sqrt is IEEE-exact on
    identical inputs, so both coefficients replay bit-identically in
    the oracle — the complement to q267's rolling Pearson for
    monotone-but-nonlinear association."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier")
    rev = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("rev_c")
        )
    )
    bal = sup.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.sum(F.floor(F.col("s_acctbal") * 100).cast("bigint"))
        .cast("bigint")
        .alias("bal_c"),
        F.count("*").cast("bigint").alias("ns"),
    )
    # met is 25 rows (one per nation) but costs the lineitem⋈supplier
    # rollup to build, and it feeds THREE consumers (the rank window
    # plus both sides of tau-b's pair join) — un-pinned, the rollup ran
    # once per consumer (30 exchanges in the r11 before-plan).  A
    # nation-count-sized checkpoint runs it once per call (the
    # _pin_topk discipline: tiny frame, expensive pass — a win at any
    # scale).
    from ..operators.materialize import pin

    met = pin(
        rev.join(bal, "nk").select(
            "nk",
            "rev_c",
            (F.col("bal_c").cast("double") / F.col("ns")).alias("avgbal"),
        )
    )
    one = F.lit(1)
    wrx, wry = Window.orderBy("rev_c"), Window.orderBy("avgbal")
    ranked = met.select(
        "nk",
        "rev_c",
        "avgbal",
        (
            (
                F.rank().over(wrx).cast("double") * 2
                + F.count("*").over(Window.partitionBy("rev_c"))
                - one
            )
            / 2
        ).alias("rx"),
        (
            (
                F.rank().over(wry).cast("double") * 2
                + F.count("*").over(Window.partitionBy("avgbal"))
                - one
            )
            / 2
        ).alias("ry"),
    )
    pear = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    prod = (F.col("a.rev_c") - F.col("b.rev_c")) * (
        F.col("a.avgbal") - F.col("b.avgbal")
    )
    kend = (
        a.join(b, F.col("a.nk") < F.col("b.nk"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("nc"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("nd"),
            F.sum(
                F.when(F.col("a.rev_c") == F.col("b.rev_c"), 1).otherwise(
                    0
                )
            ).alias("tx"),
            F.sum(
                F.when(
                    F.col("a.avgbal") == F.col("b.avgbal"), 1
                ).otherwise(0)
            ).alias("ty"),
        )
    )
    n = F.col("n")
    half = n.cast("double") * (n - 1) / 2
    return pear.crossJoin(kend).select(
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho_r"),
        F.round(
            (F.col("nc").cast("double") - F.col("nd"))
            / F.sqrt((half - F.col("tx")) * (half - F.col("ty"))),
            6,
        ).alias("kendall_taub_r"),
    )



_Q316_ORACLE = """
  WITH base AS (
    SELECT user_id % 4 AS cohort,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
           CAST(floor(value * 100) AS BIGINT) AS v
    FROM events
    WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
  r AS (
    SELECT cohort, g1,
           (CAST(rank() OVER (PARTITION BY cohort ORDER BY v) AS DOUBLE)
             * 2 + count(*) OVER (PARTITION BY cohort, v) - 1) / 2 AS ar
    FROM base),
  agg AS (
    SELECT cohort,
           CAST(sum(g1) AS BIGINT) AS n1,
           CAST(sum(1 - g1) AS BIGINT) AS n2,
           sum(CASE WHEN g1 = 1 THEN ar ELSE 0 END) AS r1
    FROM r GROUP BY cohort),
  ties AS (
    SELECT cohort, sum(CAST(c AS DOUBLE) * c * c - c) AS tie_term
    FROM (SELECT cohort, v, count(*) AS c
          FROM base GROUP BY cohort, v)
    GROUP BY cohort)
  SELECT a.cohort, a.n1, a.n2,
         round(a.r1 - CAST(a.n1 AS DOUBLE) * (a.n1 + 1) / 2, 1) AS u1,
         round((a.r1 - CAST(a.n1 AS DOUBLE) * (a.n1 + 1) / 2
                 - CAST(a.n1 AS DOUBLE) * a.n2 / 2)
               / sqrt((CAST(a.n1 AS DOUBLE) * a.n2 / 12)
                      * ((a.n1 + a.n2 + 1)
                         - t.tie_term
                           / (CAST(a.n1 + a.n2 AS DOUBLE)
                              * (a.n1 + a.n2 - 1)))), 6) AS z_r
  FROM agg a JOIN ties t ON a.cohort = t.cohort"""


@q("q316_mann_whitney_u", _Q316_ORACLE)
def q316(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U rank-sum test per cohort: does purchase value
    stochastically dominate view value?  The nonparametric complement
    to q253's z-test (no normality assumption): average-tie ranks via
    one cohort-partitioned sort, U1 from the rank sum, and the normal
    approximation z with the exact tie-correction term Σ(t³-t).
    Values are fixed-pointed to cents so ranks, tie counts, and rank
    sums are exact (half-integer) arithmetic; the only inexact op is
    the final IEEE sqrt, identical on identical inputs.  One sort +
    two hash aggregates — O(n log n) per cohort, cohorts partition the
    sort at 100 TB."""
    ev = load_table(spark, sf, "events")
    base = ev.where(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 4).alias("cohort"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("g1"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    return mann_whitney_u(base, "cohort", "g1", "v")



_Q319_ORACLE = """
  WITH daily AS (
    SELECT event_type,
           CAST(epoch(CAST(ts AS DATE)) AS BIGINT) / 86400 AS d,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type, CAST(ts AS DATE)),
  pairs AS (
    SELECT a.event_type,
           (CAST(b.cnt AS DOUBLE) - a.cnt) / (b.d - a.d) AS slope
    FROM daily a
    JOIN daily b
      ON a.event_type = b.event_type
     AND b.d > a.d AND b.d - a.d <= 10),
  ols AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
           CAST(sum(d) AS BIGINT) AS sx, CAST(sum(cnt) AS BIGINT) AS sy,
           CAST(sum(d * d) AS BIGINT) AS sxx,
           CAST(sum(d * cnt) AS BIGINT) AS sxy
    FROM daily GROUP BY event_type)
  SELECT p.event_type,
         CAST(count(*) AS BIGINT) AS n_pairs,
         round(CAST(quantile_cont(p.slope, 0.5) AS DOUBLE), 6)
           AS theil_sen_slope_r,
         round((CAST(o.nd AS DOUBLE) * o.sxy - CAST(o.sx AS DOUBLE) * o.sy)
               / (CAST(o.nd AS DOUBLE) * o.sxx
                  - CAST(o.sx AS DOUBLE) * o.sx), 6) AS ols_slope_r
  FROM pairs p
  JOIN ols o ON p.event_type = o.event_type
  GROUP BY p.event_type, o.nd, o.sx, o.sy, o.sxx, o.sxy"""


@q("q319_theil_sen_trend", _Q319_ORACLE)
def q319(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-lag Theil-Sen robust trend per event type: the median
    of pairwise slopes between daily counts at lags 1..10 — the
    outlier-resistant alternative to the OLS slope (emitted alongside
    for contrast; one spiky day drags OLS but not the median).  Full
    Theil-Sen is O(n^2) pairs; capping the lag makes it O(n * k) while
    keeping the estimator consistent for trend, the same
    bounded-candidate move as q311's grid radius and q54's bands.
    Slopes are exact-integer differences divided once (deterministic
    doubles), and the median uses the same linear-interpolation
    definition in both engines; the data-sized work is one daily
    rollup — the pair join runs on |types| x |days| rows."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        (F.col("ts").cast("date")).alias("day"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    daily = daily.select(
        "event_type",
        F.unix_date(F.col("day")).cast("bigint").alias("d"),
        "cnt",
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") > F.col("a.d"))
        & (F.col("b.d") - F.col("a.d") <= 10),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.cnt").cast("double") - F.col("a.cnt"))
            / (F.col("b.d") - F.col("a.d"))
        ).alias("slope"),
    )
    ols = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("d").cast("bigint").alias("sx"),
        F.sum("cnt").cast("bigint").alias("sy"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sxx"),
        F.sum(F.col("d") * F.col("cnt")).cast("bigint").alias("sxy"),
    )
    med = pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias(
            "theil_sen_slope_r"
        ),
    )
    return med.join(ols, "event_type").select(
        "event_type",
        "n_pairs",
        "theil_sen_slope_r",
        F.round(
            (
                F.col("nd").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / (
                F.col("nd").cast("double") * F.col("sxx")
                - F.col("sx").cast("double") * F.col("sx")
            ),
            6,
        ).alias("ols_slope_r"),
    )



_Q320_ORACLE = """
  WITH c AS (
    SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS cnt
    FROM customer GROUP BY c_nationkey),
  t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
  sh AS (
    SELECT nk, cnt,
           (1000 * cnt) // t.total AS base,
           (1000 * cnt) % t.total AS rem
    FROM c CROSS JOIN t),
  lo AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS r FROM sh),
  rk AS (
    SELECT nk, cnt, base, rem,
           row_number() OVER (ORDER BY rem DESC, nk ASC) AS rn
    FROM sh)
  SELECT rk.nk AS nationkey, rk.cnt AS n_customers,
         CAST(rk.base + CASE WHEN rk.rn <= lo.r THEN 1 ELSE 0 END
              AS BIGINT) AS seats
  FROM rk CROSS JOIN lo"""


@q("q320_largest_remainder_apportionment", _Q320_ORACLE)
def q320(spark: SparkSession, sf: str) -> DataFrame:
    """Hamilton largest-remainder apportionment: distribute exactly
    1000 budget units across nations proportional to customer count
    with EXACT integer arithmetic — floor shares first, then the
    leftover units go to the largest fractional remainders (nk
    tiebreak).  The float-free formulation (integer quotient +
    remainder ranking) is what makes the allocation reproducible and
    auditable: the seats column sums to exactly 1000 by construction,
    with no round-half parity drift between engines.  The data-sized
    work is one partial-aggregated count; everything after runs on the
    |nations|-sized table — the shape of every quota/budget/sampling-
    allocation step in a mixture pipeline (q63/q139's float quotas
    made exact)."""
    cust = load_table(spark, sf, "customer")
    c = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    t = c.agg(F.sum("cnt").cast("bigint").alias("total"))
    sh = c.crossJoin(t).select(
        "nk",
        "cnt",
        F.expr("(1000 * cnt) DIV total").alias("base"),
        ((1000 * F.col("cnt")) % F.col("total")).alias("rem"),
    )
    lo = sh.agg(
        (F.lit(1000) - F.sum("base")).cast("bigint").alias("r")
    )
    rk = sh.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("nk").asc())
        ),
    )
    return rk.crossJoin(lo).select(
        F.col("nk").alias("nationkey"),
        F.col("cnt").alias("n_customers"),
        (
            F.col("base")
            + F.when(F.col("rn") <= F.col("r"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
    )


# Holt recursion in micro-integers, alpha=0.2, beta=0.3:
#   l' = (2*x + 8*(l + b)) div 10        (x already in micro)
#   b' = (3*(l' - l) + 7*b) div 10
# DIV (Spark) and // (DuckDB) both truncate toward zero, verified
# including negatives, so the integer recursion replays exactly.  The
# oracle replays it as a RECURSIVE CTE rather than list_reduce:
# DuckDB 1.0's list_reduce with a struct accumulator updates fields
# sequentially (later fields observe already-updated earlier ones),
# which silently corrupts any two-field recurrence.

_Q327_ORACLE = """
  WITH base AS (
    SELECT 'extendedprice' AS grp,
           CAST(floor(l_extendedprice) AS BIGINT) AS f,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
    FROM lineitem
    UNION ALL
    SELECT 'quantity', CAST(l_quantity AS BIGINT),
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'discount_pct', CAST(floor(l_discount * 100) AS BIGINT),
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
    FROM lineitem),
  cand AS (
    SELECT grp, f, count(*) AS cnt, sum(pos) AS p
    FROM base GROUP BY grp, f),
  tot AS (
    SELECT grp, CAST(sum(cnt) AS BIGINT) AS n,
           CAST(sum(p) AS BIGINT) AS np
    FROM cand GROUP BY grp),
  walked AS (
    SELECT grp, f,
           CAST(sum(cnt) OVER w AS BIGINT) AS nl,
           CAST(sum(p) OVER w AS BIGINT) AS pl
    FROM cand
    WINDOW w AS (PARTITION BY grp ORDER BY f
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
  scored AS (
    SELECT w.grp, w.f, w.nl, w.pl,
           t.n - w.nl AS nr, t.np - w.pl AS pr, t.n AS n,
           (CAST(w.pl AS DOUBLE) * w.pl
             + CAST(w.nl - w.pl AS DOUBLE) * (w.nl - w.pl)) / w.nl
           + (CAST(t.np - w.pl AS DOUBLE) * (t.np - w.pl)
             + CAST((t.n - w.nl) - (t.np - w.pl) AS DOUBLE)
               * ((t.n - w.nl) - (t.np - w.pl))) / (t.n - w.nl)
             AS purity
    FROM walked w JOIN tot t ON w.grp = t.grp
    WHERE w.nl < t.n),
  best AS (
    SELECT grp, f, nl, pl, nr, pr, n, purity,
           row_number() OVER (PARTITION BY grp
                              ORDER BY purity DESC, f ASC) AS rn
    FROM scored),
  stumps AS (
    SELECT grp AS feature, CAST(f AS BIGINT) AS best_threshold,
           round((n - purity) / n, 6) AS weighted_gini_r
    FROM best WHERE rn = 1)
  SELECT feature, best_threshold, weighted_gini_r,
         CAST(row_number() OVER (ORDER BY weighted_gini_r ASC,
                                 feature ASC) AS BIGINT) AS gain_rank
  FROM stumps"""


@q("q327_feature_gain_ranking", _Q327_ORACLE)
def q327(spark: SparkSession, sf: str) -> DataFrame:
    """Feature ranking by stump gain — the boosting 'which feature do
    I split on' outer loop over q312's inner loop: three candidate
    features (price, quantity, discount) each get their best Gini
    threshold from ONE shared `gini_best_split` call, because the
    operator's group column doubles as the FEATURE name when the
    input is a union of (feature, value, label) rows — per-feature
    histograms shuffle independently under the same partitioning,
    which is exactly how a distributed tree learner evaluates all
    features in one pass instead of one job per feature.  Final rank
    orders by impurity (lower = more separating), feature-name
    tiebreak."""
    li = load_table(spark, sf, "lineitem")
    pos = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    base = (
        li.select(
            F.lit("extendedprice").alias("grp"),
            F.floor("l_extendedprice").cast("bigint").alias("f"),
            pos.alias("pos"),
        )
        .unionAll(
            li.select(
                F.lit("quantity").alias("grp"),
                F.col("l_quantity").cast("bigint").alias("f"),
                pos.alias("pos"),
            )
        )
        .unionAll(
            li.select(
                F.lit("discount_pct").alias("grp"),
                F.floor(F.col("l_discount") * 100)
                .cast("bigint")
                .alias("f"),
                pos.alias("pos"),
            )
        )
    )
    stumps = gini_best_split(base, "grp", "f", "pos").select(
        F.col("grp").alias("feature"),
        "best_threshold",
        "weighted_gini_r",
    )
    return stumps.withColumn(
        "gain_rank",
        F.row_number()
        .over(
            Window.orderBy(
                F.col("weighted_gini_r").asc(), F.col("feature").asc()
            )
        )
        .cast("bigint"),
    )



_Q328_ORACLE = """
  WITH idx AS (
    SELECT user_id,
           CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                WHEN 'view' THEN 4 END AS i
    FROM events
    WHERE event_type IN
          ('click', 'error', 'purchase', 'signup', 'view')),
  m AS (
    SELECT user_id, bit_or(CAST(1 AS BIGINT) << CAST(i AS INT)) AS mask
    FROM idx GROUP BY user_id),
  hist AS (
    SELECT mask, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY mask),
  types AS (
    SELECT * FROM (VALUES ('click', 0), ('error', 1),
                          ('purchase', 2), ('signup', 3),
                          ('view', 4)) AS t(name, i)),
  pairs AS (
    SELECT a.name AS type_a, a.i AS ia, b.name AS type_b, b.i AS ib
    FROM types a JOIN types b ON a.i < b.i),
  ov AS (
    SELECT p.type_a, p.type_b,
           CAST(sum(CASE WHEN ((h.mask >> p.ia) & 1) = 1
                         THEN h.n ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN ((h.mask >> p.ib) & 1) = 1
                         THEN h.n ELSE 0 END) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN ((h.mask >> p.ia) & 1) = 1
                          AND ((h.mask >> p.ib) & 1) = 1
                         THEN h.n ELSE 0 END) AS BIGINT) AS n_both
    FROM pairs p CROSS JOIN hist h
    GROUP BY p.type_a, p.type_b)
  SELECT type_a, type_b, n_a, n_b, n_both,
         round(CAST(n_both AS DOUBLE) / (n_a + n_b - n_both), 6)
           AS jaccard_r
  FROM ov"""


@q("q328_audience_overlap_matrix", _Q328_ORACLE)
def q328(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise audience-overlap (Jaccard) matrix between the five
    event-type segments, computed WITHOUT touching events for any
    pair: each user collapses to a 5-bit segment mask (q317's bitmap
    algebra), the mask HISTOGRAM is at most 2^5 rows, and every one
    of the 10 pairwise intersections is a conditional sum over that
    histogram — audience-overlap questions against a 100 TB log
    become arithmetic on a 32-row table, which is why bitmap engines
    (Druid, Pinot, ClickHouse bitmaps) answer segment-overlap
    dashboards interactively.  Adding a segment costs one bit, not
    one scan."""
    ev = load_table(spark, sf, "events")
    i = (
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "view", 4)
    )
    idx = ev.where(
        F.col("event_type").isin(
            "click", "error", "purchase", "signup", "view"
        )
    ).select("user_id", i.alias("i"))
    m = idx.groupBy("user_id").agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)))"
        ).alias("mask")
    )
    hist = m.groupBy("mask").agg(
        F.count("*").cast("bigint").alias("n")
    )
    # VALUES -> LocalRelation: a createDataFrame here would make a
    # Python-backed RDD whose 2-sided cartesian schedules ~64 Python
    # runner tasks for 25 rows (measured ~10 s of pure overhead)
    types = spark.sql(
        """SELECT * FROM VALUES ('click', 0), ('error', 1),
           ('purchase', 2), ('signup', 3), ('view', 4) AS t(name, i)"""
    )
    a, b = types.alias("a"), types.alias("b")
    pairs = a.join(b, F.col("a.i") < F.col("b.i")).select(
        F.col("a.name").alias("type_a"),
        F.col("a.i").alias("ia"),
        F.col("b.name").alias("type_b"),
        F.col("b.i").alias("ib"),
    )
    ov = (
        pairs.crossJoin(hist)
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(mask, ia) & 1") == 1,
                       F.col("n")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_a"),
            F.sum(
                F.when(F.expr("shiftright(mask, ib) & 1") == 1,
                       F.col("n")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_b"),
            F.sum(
                F.when(
                    (F.expr("shiftright(mask, ia) & 1") == 1)
                    & (F.expr("shiftright(mask, ib) & 1") == 1),
                    F.col("n"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_both"),
        )
    )
    return ov.select(
        "type_a", "type_b", "n_a", "n_b", "n_both",
        F.round(
            F.col("n_both").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
            6,
        ).alias("jaccard_r"),
    )
