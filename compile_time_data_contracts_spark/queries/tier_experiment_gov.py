"""Experimentation, attribution, and governance analytics (q332-q373):
CUPED/SRM/ATE/QTE experiment readouts, Markov and multi-touch
attribution, drift and skew planners, bitemporal/temporal audits,
anonymity (t-closeness) publishing gates, and layout/encoding advisors.

Split from tier_core_sql (round 8, same playbook as the round-5 split of
the original single module): registration order within the tier is
preserved, and all tier modules share the `_shared` registry so
`queries()` / `oracle_sql()` stay the single assembly points.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401


_Q332_ORACLE = """
  WITH ev AS (
    SELECT user_id, epoch_us(ts) AS tus,
           CAST(floor(value * 100) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL),
  bounds AS (
    SELECT min(tus) AS lo, max(tus) AS hi FROM ev),
  per_user AS (
    SELECT e.user_id, e.user_id % 2 AS arm,
           CAST(sum(CASE WHEN e.tus < b.lo + (b.hi - b.lo) // 2
                         THEN e.v ELSE 0 END) AS BIGINT) AS pre_c,
           CAST(sum(CASE WHEN e.tus >= b.lo + (b.hi - b.lo) // 2
                         THEN e.v ELSE 0 END) AS BIGINT) AS post_c
    FROM ev e CROSS JOIN bounds b
    GROUP BY e.user_id, e.user_id % 2),
  pool AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pre_c) AS BIGINT) AS sx,
           CAST(sum(post_c) AS BIGINT) AS sy,
           CAST(sum(pre_c * pre_c) AS BIGINT) AS sxx,
           CAST(sum(pre_c * post_c) AS BIGINT) AS sxy
    FROM per_user),
  th AS (
    SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             AS theta,
           CAST(sx AS DOUBLE) / n AS grand_pre
    FROM pool),
  arm AS (
    SELECT arm, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pre_c) AS BIGINT) AS sx,
           CAST(sum(post_c) AS BIGINT) AS sy,
           CAST(sum(pre_c * pre_c) AS BIGINT) AS sxx,
           CAST(sum(post_c * post_c) AS BIGINT) AS syy,
           CAST(sum(pre_c * post_c) AS BIGINT) AS sxy
    FROM per_user GROUP BY arm),
  m AS (
    SELECT a.arm, a.n,
           CAST(a.sy AS DOUBLE) / a.n AS mean_post,
           CAST(a.sx AS DOUBLE) / a.n AS mean_pre,
           (CAST(a.syy AS DOUBLE) - CAST(a.sy AS DOUBLE) * a.sy / a.n)
             / a.n AS var_post,
           (CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE) * a.sx / a.n)
             / a.n AS var_pre,
           (CAST(a.sxy AS DOUBLE) - CAST(a.sx AS DOUBLE) * a.sy / a.n)
             / a.n AS cov_xy,
           t.theta, t.grand_pre
    FROM arm a CROSS JOIN th t)
  SELECT arm, n,
         round(mean_post / 100, 6) AS mean_post_r,
         round((mean_post - theta * (mean_pre - grand_pre)) / 100, 6)
           AS mean_cuped_r,
         round(var_post / 10000, 4) AS var_post_r,
         round((var_post - 2 * theta * cov_xy
                + theta * theta * var_pre) / 10000, 4) AS var_cuped_r,
         round(1 - (var_post - 2 * theta * cov_xy
                    + theta * theta * var_pre) / var_post, 6)
           AS var_reduction_r
  FROM m"""


@q("q332_cuped_adjustment", _Q332_ORACLE)
def q332(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. WSDM 2013): adjust each
    arm's post-period metric by theta * (pre-period covariate -
    grand mean), with theta = cov(pre, post)/var(pre) pooled — the
    standard trick that cuts experiment runtime by the pre/post
    correlation squared.  The adjusted VARIANCE is derived
    ALGEBRAICALLY (var_post - 2*theta*cov + theta^2*var_pre) from
    exact integer cents moments instead of materializing per-user
    adjusted doubles — both because it is one less pass and because
    a shuffled float sum would be order-nondeterministic and break
    the oracle hash; the pre/post split point derives from the
    data's own time envelope in integer microseconds.  Two
    partial-aggregated rollups (per-user, then per-arm) — the
    experimentation twin of q253's z-test and q307's SPRT."""
    ev = load_table(spark, sf, "events").where(
        F.col("value").isNotNull()
    ).select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    bounds = ev.agg(
        F.min("tus").alias("lo"), F.max("tus").alias("hi")
    )
    per_user = (
        ev.crossJoin(bounds)
        .groupBy("user_id", (F.col("user_id") % 2).alias("arm"))
        .agg(
            F.sum(
                F.when(
                    F.col("tus")
                    < F.col("lo") + F.expr("(hi - lo) DIV 2"),
                    F.col("v"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("pre_c"),
            F.sum(
                F.when(
                    F.col("tus")
                    >= F.col("lo") + F.expr("(hi - lo) DIV 2"),
                    F.col("v"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("post_c"),
        )
    )
    pool = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pre_c").cast("bigint").alias("sx"),
        F.sum("post_c").cast("bigint").alias("sy"),
        F.sum(F.col("pre_c") * F.col("pre_c"))
        .cast("bigint")
        .alias("sxx"),
        F.sum(F.col("pre_c") * F.col("post_c"))
        .cast("bigint")
        .alias("sxy"),
    )
    th = pool.select(
        (
            (F.col("n").cast("double") * F.col("sxy")
             - F.col("sx").cast("double") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("sxx")
               - F.col("sx").cast("double") * F.col("sx"))
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("grand_pre"),
    )
    arm = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pre_c").cast("bigint").alias("sx"),
        F.sum("post_c").cast("bigint").alias("sy"),
        F.sum(F.col("pre_c") * F.col("pre_c"))
        .cast("bigint")
        .alias("sxx"),
        F.sum(F.col("post_c") * F.col("post_c"))
        .cast("bigint")
        .alias("syy"),
        F.sum(F.col("pre_c") * F.col("post_c"))
        .cast("bigint")
        .alias("sxy"),
    )
    n = F.col("n")
    m = arm.crossJoin(th).select(
        "arm",
        "n",
        (F.col("sy").cast("double") / n).alias("mean_post"),
        (F.col("sx").cast("double") / n).alias("mean_pre"),
        (
            (F.col("syy").cast("double")
             - F.col("sy").cast("double") * F.col("sy") / n) / n
        ).alias("var_post"),
        (
            (F.col("sxx").cast("double")
             - F.col("sx").cast("double") * F.col("sx") / n) / n
        ).alias("var_pre"),
        (
            (F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy") / n) / n
        ).alias("cov_xy"),
        "theta",
        "grand_pre",
    )
    var_cuped = (
        F.col("var_post")
        - 2 * F.col("theta") * F.col("cov_xy")
        + F.col("theta") * F.col("theta") * F.col("var_pre")
    )
    return m.select(
        "arm",
        "n",
        F.round(F.col("mean_post") / 100, 6).alias("mean_post_r"),
        F.round(
            (
                F.col("mean_post")
                - F.col("theta")
                * (F.col("mean_pre") - F.col("grand_pre"))
            )
            / 100,
            6,
        ).alias("mean_cuped_r"),
        F.round(F.col("var_post") / 10000, 4).alias("var_post_r"),
        F.round(var_cuped / 10000, 4).alias("var_cuped_r"),
        F.round(1 - var_cuped / F.col("var_post"), 6).alias(
            "var_reduction_r"
        ),
    )


# chi-square critical value for df=1, alpha=0.05: 3.841459 -> micro
# literal precomputed in Python (the q290 no-libm rule)
_Q334_ORACLE = """
  WITH u AS (SELECT DISTINCT user_id FROM events),
  a AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n0,
           CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n1
    FROM u)
  SELECT n AS n_users, n0 AS n_arm0, n1 AS n_arm1,
         CAST((1000000 * ((2 * n0 - n) * (2 * n0 - n)
                          + (2 * n1 - n) * (2 * n1 - n)))
              // (2 * n) AS BIGINT) AS chi2_micro,
         ((1000000 * ((2 * n0 - n) * (2 * n0 - n)
                      + (2 * n1 - n) * (2 * n1 - n)))
          // (2 * n)) > 3841459 AS srm_flag
  FROM a"""


@q("q334_srm_check", _Q334_ORACLE)
def q334(spark: SparkSession, sf: str) -> DataFrame:
    """Sample-ratio-mismatch check — the first health gate every A/B
    readout must pass BEFORE q253/q307/q332 are even looked at (a
    biased assignment invalidates them all): chi-square of the
    50/50 arm split over ASSIGNED UNITS (distinct users, not
    events — event-weighted SRM checks mask user-level bugs), in
    exact integer micro-units via the (2o-n)^2/(2n) identity, with
    the df=1 critical value precomputed as a Python literal (the
    q290 no-libm rule).  One distinct + one conditional-sum pass."""
    ev = load_table(spark, sf, "events")
    u = ev.select("user_id").distinct()
    a = u.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    chi2 = F.expr(
        "(1000000 * ((2 * n0 - n) * (2 * n0 - n)"
        " + (2 * n1 - n) * (2 * n1 - n))) DIV (2 * n)"
    )
    return a.select(
        F.col("n").alias("n_users"),
        F.col("n0").alias("n_arm0"),
        F.col("n1").alias("n_arm1"),
        chi2.cast("bigint").alias("chi2_micro"),
        (chi2 > 3841459).alias("srm_flag"),
    )


# z for the 95% binomial CI on the median rank: 1.959964 -> used as
# the double literal 1.959964 in BOTH engines' identical expressions
_Q335_ORACLE = """
  WITH v AS (
    SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL),
  r AS (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type ORDER BY c)
             AS rn
    FROM v),
  nn AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM v GROUP BY event_type),
  ranks AS (
    SELECT event_type, n,
           (n + 1) // 2 AS med_rank,
           greatest(CAST(1 AS BIGINT),
             CAST(floor((n - 1.959964 * sqrt(n)) / 2) AS BIGINT))
             AS lo_rank,
           least(n,
             CAST(ceil((n + 1.959964 * sqrt(n)) / 2 + 1) AS BIGINT))
             AS hi_rank
    FROM nn)
  SELECT k.event_type, k.n,
         CAST(min(CASE WHEN r.rn = k.med_rank THEN r.c END)
              AS BIGINT) AS median_c,
         CAST(min(CASE WHEN r.rn = k.lo_rank THEN r.c END)
              AS BIGINT) AS ci_lo_c,
         CAST(min(CASE WHEN r.rn = k.hi_rank THEN r.c END)
              AS BIGINT) AS ci_hi_c
  FROM ranks k JOIN r ON r.event_type = k.event_type
  GROUP BY k.event_type, k.n"""


@q("q335_median_order_stat_ci", _Q335_ORACLE)
def q335(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median via
    ORDER STATISTICS (binomial rank bounds n/2 ± z√n/2): no
    bootstrap resampling (q243's 200 replicates), no normality
    assumption — just three rank lookups in one per-group sort.  The
    value at a rank is deterministic under ties regardless of tie
    order, ranks derive from n through one IEEE sqrt (exact on
    identical inputs), and the z constant is a Python-precomputed
    literal in both engines.  This is the cheap CI for monitoring
    dashboards at 100 TB: one sort per group, O(1) extra work over
    computing the median at all."""
    ev = load_table(spark, sf, "events")
    v = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    r = v.select(
        "event_type",
        "c",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("c"))
        .alias("rn"),
    )
    nn = v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    n = F.col("n")
    ranks = nn.select(
        "event_type",
        "n",
        F.expr("(n + 1) DIV 2").alias("med_rank"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor((n - 1.959964 * F.sqrt(n)) / 2).cast("bigint"),
        ).alias("lo_rank"),
        F.least(
            n,
            F.ceil((n + 1.959964 * F.sqrt(n)) / 2 + 1).cast("bigint"),
        ).alias("hi_rank"),
    )
    return (
        ranks.join(r, "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.min(
                F.when(F.col("rn") == F.col("med_rank"), F.col("c"))
            )
            .cast("bigint")
            .alias("median_c"),
            F.min(F.when(F.col("rn") == F.col("lo_rank"), F.col("c")))
            .cast("bigint")
            .alias("ci_lo_c"),
            F.min(F.when(F.col("rn") == F.col("hi_rank"), F.col("c")))
            .cast("bigint")
            .alias("ci_hi_c"),
        )
    )


_Q341_ORACLE = """
  WITH base AS (
    SELECT l_linestatus AS grp,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice * 100) AS BIGINT)
             * (CASE WHEN l_orderkey % 1009 = 0 THEN 100 ELSE 1 END)
             AS y,
           (l_orderkey % 1009 = 0) AS planted
    FROM lineitem),
  m1 AS (
    SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(CASE WHEN planted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_planted
    FROM base GROUP BY grp),
  ols AS (
    SELECT grp, n, n_planted,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             AS b,
           (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * sxy
              - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * sx) / n AS a
    FROM m1),
  res AS (
    SELECT b2.grp, b2.x, b2.y, o.b AS b_ols, o.a, o.n, o.n_planted,
           abs(b2.y - (o.a + o.b * b2.x)) AS ar
    FROM base b2 JOIN ols o ON b2.grp = o.grp),
  scale AS (
    SELECT grp, b_ols, n, n_planted,
           1.345 * sqrt(sum(ar * ar) / max(n)) AS k
    FROM res GROUP BY grp, b_ols, n, n_planted),
  wtd AS (
    SELECT r.grp, s.b_ols, s.n, s.n_planted,
           CASE WHEN r.ar <= s.k THEN 1000
                ELSE CAST(floor(1000 * s.k / r.ar) AS BIGINT) END AS w,
           r.x, r.y
    FROM res r JOIN scale s ON r.grp = s.grp),
  m2 AS (
    SELECT grp, b_ols, n, n_planted,
           CAST(sum(w) AS BIGINT) AS sw,
           CAST(sum(w * x) AS BIGINT) AS swx,
           CAST(sum(w * y) AS BIGINT) AS swy,
           CAST(sum(w * x * x) AS BIGINT) AS swxx,
           CAST(sum(w * x * y) AS BIGINT) AS swxy,
           CAST(sum(CASE WHEN w < 1000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_downweighted
    FROM wtd GROUP BY grp, b_ols, n, n_planted)
  SELECT grp, n, n_planted, n_downweighted,
         round(b_ols, 4) AS ols_slope_r,
         round((CAST(sw AS DOUBLE) * swxy
                - CAST(swx AS DOUBLE) * swy)
               / (CAST(sw AS DOUBLE) * swxx
                  - CAST(swx AS DOUBLE) * swx), 4) AS huber_slope_r
  FROM m2"""


@q("q341_huber_irls_regression", _Q341_ORACLE)
def q341(spark: SparkSession, sf: str) -> DataFrame:
    """Huber-robust regression as ONE IRLS reweighting step over the
    q227 OLS: plant 100x price outliers on a key cohort, fit OLS,
    downweight residuals beyond k = 1.345*RMSE with w =
    floor(1000*k/|r|) MILLI-INTEGER weights, and refit — the weighted
    moments are then EXACT integer sums (w, x, y all integers), so
    the distributed re-fit has no float-summation-order hazard; the
    only doubles are the per-row residual and the two final slope
    divisions, each a fixed IEEE expression.  The output shows the
    OLS slope dragged by the planted outliers and the Huber slope
    shrugging them off (n_downweighted ~ n_planted) — robust ML
    training as two aggregate passes, no solver."""
    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.col("l_linestatus").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("x"),
        (
            F.floor(F.col("l_extendedprice") * 100).cast("bigint")
            * F.when(F.col("l_orderkey") % 1009 == 0, 100).otherwise(1)
        ).alias("y"),
        (F.col("l_orderkey") % 1009 == 0).alias("planted"),
    )
    m1 = base.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.when(F.col("planted"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_planted"),
    )
    n, sx, sy, sxx, sxy = (
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy")
    )
    b_expr = (n.cast("double") * sxy - sx.cast("double") * sy) / (
        n.cast("double") * sxx - sx.cast("double") * sx
    )
    ols = m1.select(
        "grp", "n", "n_planted",
        b_expr.alias("b"),
        ((sy.cast("double") - b_expr * sx) / n).alias("a"),
    ).withColumnRenamed("b", "b_ols")
    res = base.join(ols, "grp").select(
        "grp", "x", "y", "b_ols", "n", "n_planted",
        F.abs(
            F.col("y") - (F.col("a") + F.col("b_ols") * F.col("x"))
        ).alias("ar"),
    )
    scale = res.groupBy("grp", "b_ols", "n", "n_planted").agg(
        (
            1.345
            * F.sqrt(F.sum(F.col("ar") * F.col("ar")) / F.max("n"))
        ).alias("k")
    )
    wtd = res.join(scale.select("grp", "k"), "grp").select(
        "grp", "b_ols", "n", "n_planted", "x", "y",
        F.when(F.col("ar") <= F.col("k"), F.lit(1000).cast("bigint"))
        .otherwise(
            F.floor(1000 * F.col("k") / F.col("ar")).cast("bigint")
        )
        .alias("w"),
    )
    m2 = wtd.groupBy("grp", "b_ols", "n", "n_planted").agg(
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w") * F.col("x")).cast("bigint").alias("swx"),
        F.sum(F.col("w") * F.col("y")).cast("bigint").alias("swy"),
        F.sum(F.col("w") * F.col("x") * F.col("x"))
        .cast("bigint")
        .alias("swxx"),
        F.sum(F.col("w") * F.col("x") * F.col("y"))
        .cast("bigint")
        .alias("swxy"),
        F.sum(F.when(F.col("w") < 1000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_downweighted"),
    )
    sw, swx, swy, swxx, swxy = (
        F.col("sw"), F.col("swx"), F.col("swy"), F.col("swxx"),
        F.col("swxy"),
    )
    return m2.select(
        "grp", "n", "n_planted", "n_downweighted",
        F.round(F.col("b_ols"), 4).alias("ols_slope_r"),
        F.round(
            (sw.cast("double") * swxy - swx.cast("double") * swy)
            / (sw.cast("double") * swxx - swx.cast("double") * swx),
            4,
        ).alias("huber_slope_r"),
    )


_Q342_ORACLE = """
  WITH base AS (
    SELECT CAST(floor(l_extendedprice) AS BIGINT) AS f,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab,
           (CAST(('0x' || substring(md5(
              CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)
              || '|sh-v1'), 1, 8)) AS BIGINT) % 4 = 0) AS in_sample
    FROM lineitem),
  cfg AS (SELECT unnest([10000, 20000, 30000, 40000,
                         50000, 60000, 70000, 80000]) AS t),
  r1 AS (
    SELECT c.t, CAST(1 AS BIGINT) AS round,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN b.f < c.t AND b.lab = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN b.f < c.t AND b.lab = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN b.f >= c.t AND b.lab = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS fn
    FROM base b CROSS JOIN cfg c
    WHERE b.in_sample GROUP BY c.t),
  r1s AS (
    SELECT t, round, n_eval,
           CAST((1000 * 2 * tp) // (2 * tp + fp + fn) AS BIGINT)
             AS f1_milli,
           row_number() OVER (
             ORDER BY (1000 * 2 * tp) // (2 * tp + fp + fn) DESC,
                      t ASC) AS rk
    FROM r1),
  keep1 AS (SELECT t FROM r1s WHERE rk <= 4),
  r2 AS (
    SELECT c.t, CAST(2 AS BIGINT) AS round,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN b.f < c.t AND b.lab = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN b.f < c.t AND b.lab = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN b.f >= c.t AND b.lab = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS fn
    FROM base b CROSS JOIN (SELECT t FROM keep1) c
    GROUP BY c.t),
  r2s AS (
    SELECT t, round, n_eval,
           CAST((1000 * 2 * tp) // (2 * tp + fp + fn) AS BIGINT)
             AS f1_milli,
           row_number() OVER (
             ORDER BY (1000 * 2 * tp) // (2 * tp + fp + fn) DESC,
                      t ASC) AS rk
    FROM r2)
  SELECT round, CAST(t AS BIGINT) AS threshold, n_eval, f1_milli,
         (rk <= CASE WHEN round = 1 THEN 4 ELSE 1 END) AS kept
  FROM (SELECT * FROM r1s UNION ALL SELECT * FROM r2s)"""


@q("q342_successive_halving", _Q342_ORACLE)
def q342(spark: SparkSession, sf: str) -> DataFrame:
    """Successive-halving hyperparameter tournament (Jamieson &
    Talwalkar 2016) run ENTIRELY inside the engine: 8 candidate
    price thresholds scored by integer-F1 on a deterministic
    md5-hash 25% sample (round 1), the top 4 re-scored on the FULL
    table (round 2), winner flagged — the budget shape that makes
    sweeps affordable at 100 TB (most configs die on 1/4 of the
    data; the full-data pass runs 4 models, not 8, and both rounds
    are ONE conditional-sum scan each via the config cross join, not
    one job per config).  F1 compared in exact milli-integers with
    threshold tiebreaks, so the tournament bracket replays
    identically anywhere."""
    li = load_table(spark, sf, "lineitem")
    key = (
        F.col("l_orderkey") * 10 + F.col("l_linenumber")
    ).cast("string")
    base = li.select(
        F.floor("l_extendedprice").cast("bigint").alias("f"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias(
            "lab"
        ),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(key, F.lit("|sh-v1")).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 4
            == 0
        ).alias("in_sample"),
    )
    cfg = spark.sql(
        "SELECT * FROM VALUES (10000), (20000), (30000), (40000),"
        " (50000), (60000), (70000), (80000) AS t(t)"
    )

    def score(rows, rnd):
        sc = (
            rows.crossJoin(F.broadcast(cfg))
            .groupBy("t")
            .agg(
                F.count("*").cast("bigint").alias("n_eval"),
                F.sum(
                    F.when(
                        (F.col("f") < F.col("t")) & (F.col("lab") == 1),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("tp"),
                F.sum(
                    F.when(
                        (F.col("f") < F.col("t")) & (F.col("lab") == 0),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("fp"),
                F.sum(
                    F.when(
                        (F.col("f") >= F.col("t"))
                        & (F.col("lab") == 1),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("fn"),
            )
        )
        f1 = F.expr("(1000 * 2 * tp) DIV (2 * tp + fp + fn)")
        return sc.select(
            "t",
            F.lit(rnd).cast("bigint").alias("round"),
            "n_eval",
            f1.cast("bigint").alias("f1_milli"),
            F.row_number()
            .over(Window.orderBy(f1.desc(), F.col("t").asc()))
            .alias("rk"),
        )

    r1s = score(base.where(F.col("in_sample")), 1)
    # round 2: full data, only surviving configs
    cfg2 = r1s.where(F.col("rk") <= 4).select("t")
    sc2 = (
        base.crossJoin(F.broadcast(cfg2))
        .groupBy("t")
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.sum(
                F.when(
                    (F.col("f") < F.col("t")) & (F.col("lab") == 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(
                    (F.col("f") < F.col("t")) & (F.col("lab") == 0), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when(
                    (F.col("f") >= F.col("t")) & (F.col("lab") == 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    f1 = F.expr("(1000 * 2 * tp) DIV (2 * tp + fp + fn)")
    r2s = sc2.select(
        "t",
        F.lit(2).cast("bigint").alias("round"),
        "n_eval",
        f1.cast("bigint").alias("f1_milli"),
        F.row_number()
        .over(Window.orderBy(f1.desc(), F.col("t").asc()))
        .alias("rk"),
    )
    u = r1s.unionAll(r2s)
    return u.select(
        "round",
        F.col("t").cast("bigint").alias("threshold"),
        "n_eval",
        "f1_milli",
        (
            F.col("rk")
            <= F.when(F.col("round") == 1, 4).otherwise(1)
        ).alias("kept"),
    )


_Q343_ORACLE = """
  WITH scored AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab,
           CAST(l_quantity * 100 AS BIGINT) + CAST(l_discount * 1000
             AS BIGINT) AS s,
           l_orderkey, l_linenumber
    FROM lineitem),
  pr AS (
    SELECT lab,
           CAST(rank() OVER (ORDER BY s, l_orderkey, l_linenumber)
                - 1 AS BIGINT) AS r0,
           CAST(count(*) OVER () - 1 AS BIGINT) AS d
    FROM scored),
  binned AS (
    SELECT CAST(least((10 * r0) // d, 9) AS BIGINT) AS bin,
           lab, r0, d
    FROM pr),
  b AS (
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(lab) AS BIGINT) AS pos,
           CAST(sum(r0) AS BIGINT) AS sr,
           CAST(max(d) AS BIGINT) AS d
    FROM binned GROUP BY bin),
  tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM b)
  SELECT b.bin, b.n,
         round(CAST(b.pos AS DOUBLE) / b.n, 6) AS acc_r,
         round(CAST(b.sr AS DOUBLE) / b.d / b.n, 6) AS conf_r,
         round(sum(CAST(b2.n AS DOUBLE)
                   * abs(CAST(b2.pos AS DOUBLE) / b2.n
                         - CAST(b2.sr AS DOUBLE) / b2.d / b2.n))
               / max(t.nt), 6) AS ece_r
  FROM b
  CROSS JOIN tot t
  CROSS JOIN b b2
  GROUP BY b.bin, b.n, b.pos, b.sr, b.d"""


@q("q343_expected_calibration_error", _Q343_ORACLE)
def q343(spark: SparkSession, sf: str) -> DataFrame:
    """Expected calibration error (ECE, Guo et al. 2017) of the q269
    rule scorer with its empirical percent-rank as the confidence:
    10 equal-width confidence bins, per-bin |accuracy - mean
    confidence| weighted by bin mass, plus the scalar ECE repeated
    per row for the gate — the one-number companion to q181's
    reliability deciles (q181 shows WHERE miscalibration lives, ECE
    prices it).  Confidence stays INTEGER until the very end: the
    bin is (10*(rank-1)) DIV (n-1), per-bin confidence mass is the
    exact BIGINT rank sum, and mean confidence divides once —
    no shuffled float summation anywhere, so the hash is
    order-proof.  Caveat honestly carried from q299: the global rank
    is one total-order sort, the same cost class as q28/q93."""
    li = load_table(spark, sf, "lineitem")
    scored = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias(
            "lab"
        ),
        (
            (F.col("l_quantity") * 100).cast("bigint")
            + (F.col("l_discount") * 1000).cast("bigint")
        ).alias("s"),
        "l_orderkey",
        "l_linenumber",
    )
    # the global rank previously ran as TWO unpartitioned windows (rank
    # + count), each a single-task sort/pass over all of lineitem.  The
    # sort key (s, orderkey, linenumber) is a total order whose leading
    # column has ~10² distinct quantized values, so the rank decomposes
    # into a parallel per-value window + a broadcast offset table
    # (`grouped_global_rank`); the denominator is a 1-row broadcast agg.
    # rank == row_number here (unique tiebreak), integers identical.
    from ..operators.stats import grouped_global_rank

    nn = scored.agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("d")
    )
    pr = (
        grouped_global_rank(
            scored,
            "s",
            ["l_orderkey", "l_linenumber"],
            out_col="r0",
            ties="min",  # the contract is rank(): duplicated fixture
            # rows must share the smallest position, as before
        )
        .crossJoin(F.broadcast(nn))
        .select("lab", "r0", "d")
    )
    binned = pr.select(
        F.least(F.expr("(10 * r0) DIV d"), F.lit(9))
        .cast("bigint")
        .alias("bin"),
        "lab",
        "r0",
        "d",
    )
    b = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("pos"),
        F.sum("r0").cast("bigint").alias("sr"),
        F.max("d").cast("bigint").alias("d"),
    )
    # b (10 rows) feeds tot, the b2 cross side, and the main side — each
    # un-materialized reference re-runs the single-task global-rank sort
    # over lineitem (3x the dominant cost).  A 10-row reliable
    # checkpoint runs the sort once per call.
    from ..operators.materialize import pin as _pin
    b = b.transform(_pin)
    tot = b.agg(F.sum("n").cast("bigint").alias("nt"))
    b2 = b.select(
        F.col("n").alias("n2"),
        F.col("pos").alias("pos2"),
        F.col("sr").alias("sr2"),
        F.col("d").alias("d2"),
    )
    return (
        b.crossJoin(tot)
        .crossJoin(b2)
        .groupBy("bin", "n", "pos", "sr", "d")
        .agg(
            F.round(
                F.sum(
                    F.col("n2").cast("double")
                    * F.abs(
                        F.col("pos2").cast("double") / F.col("n2")
                        - F.col("sr2").cast("double")
                        / F.col("d2")
                        / F.col("n2")
                    )
                )
                / F.max("nt"),
                6,
            ).alias("ece_r")
        )
        .select(
            "bin",
            "n",
            F.round(F.col("pos").cast("double") / F.col("n"), 6).alias(
                "acc_r"
            ),
            F.round(
                F.col("sr").cast("double") / F.col("d") / F.col("n"), 6
            ).alias("conf_r"),
            "ece_r",
        )
    )


_Q344_ORACLE = """
  WITH v AS (
    SELECT user_id % 2 AS arm,
           CAST(floor(value * 100) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL),
  r AS (
    SELECT arm, c,
           row_number() OVER (PARTITION BY arm ORDER BY c) AS rn
    FROM v),
  nn AS (SELECT arm, CAST(count(*) AS BIGINT) AS n
         FROM v GROUP BY arm),
  ps AS (SELECT unnest([25, 50, 75]) AS p),
  ranks AS (
    SELECT nn.arm, ps.p, (nn.n * ps.p + 99) // 100 AS qrank
    FROM nn CROSS JOIN ps),
  qs AS (
    SELECT k.p, k.arm,
           CAST(min(CASE WHEN r.rn = k.qrank THEN r.c END) AS BIGINT)
             AS qc
    FROM ranks k JOIN r ON r.arm = k.arm
    GROUP BY k.p, k.arm)
  SELECT CAST(a.p AS BIGINT) AS p,
         a.qc AS q_arm0_c, b.qc AS q_arm1_c,
         CAST(b.qc - a.qc AS BIGINT) AS qte_c
  FROM qs a JOIN qs b ON a.p = b.p AND a.arm = 0 AND b.arm = 1"""


@q("q344_quantile_treatment_effect", _Q344_ORACLE)
def q344(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile treatment effect: the p25/p50/p75 DIFFERENCE between
    experiment arms — mean effects (q253/q332) hide distributional
    shifts (a treatment that helps the median but crushes the tail
    has mean effect ~0); nearest-rank quantiles via ceil(n*p/100)
    over one arm-partitioned sort make the whole effect table exact
    integer cents, tie-proof, and one extra conditional-min over the
    same sort that q335's CI already paid for."""
    ev = load_table(spark, sf, "events")
    v = ev.where(F.col("value").isNotNull()).select(
        (F.col("user_id") % 2).alias("arm"),
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    r = v.select(
        "arm",
        "c",
        F.row_number()
        .over(Window.partitionBy("arm").orderBy("c"))
        .alias("rn"),
    )
    nn = v.groupBy("arm").agg(F.count("*").cast("bigint").alias("n"))
    ps = spark.sql("SELECT * FROM VALUES (25), (50), (75) AS p(p)")
    ranks = nn.crossJoin(F.broadcast(ps)).select(
        "arm", "p", F.expr("(n * p + 99) DIV 100").alias("qrank")
    )
    qs = (
        ranks.join(r, "arm")
        .groupBy("p", "arm")
        .agg(
            F.min(F.when(F.col("rn") == F.col("qrank"), F.col("c")))
            .cast("bigint")
            .alias("qc")
        )
    )
    a = qs.where(F.col("arm") == 0).select(
        "p", F.col("qc").alias("q_arm0_c")
    )
    b = qs.where(F.col("arm") == 1).select(
        "p", F.col("qc").alias("q_arm1_c")
    )
    return a.join(b, "p").select(
        F.col("p").cast("bigint").alias("p"),
        "q_arm0_c",
        "q_arm1_c",
        (F.col("q_arm1_c") - F.col("q_arm0_c"))
        .cast("bigint")
        .alias("qte_c"),
    )


# =========================================================================
# Post-stratified ATE + isotonic calibration (Q348-Q349)
# =========================================================================

_Q348_ORACLE = """
  WITH v AS (
    SELECT event_type AS stratum, CAST(user_id % 2 AS BIGINT) AS arm,
           CAST(floor(value * 100) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL),
  s AS (
    SELECT stratum,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
           CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS s0
    FROM v GROUP BY stratum),
  m AS (
    SELECT stratum, n, n1, n0,
           CAST((1000 * s1) // n1 AS BIGINT) AS m1_milli,
           CAST((1000 * s0) // n0 AS BIGINT) AS m0_milli
    FROM s WHERE n1 > 0 AND n0 > 0),
  tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(n * (m1_milli - m0_milli)) AS BIGINT) AS ate_num
          FROM m)
  SELECT m.stratum, m.n, m.n1, m.n0, m.m1_milli, m.m0_milli,
         CAST(m.m1_milli - m.m0_milli AS BIGINT) AS diff_milli,
         round(CAST(t.ate_num AS DOUBLE) / t.nt, 6) AS ate_ps_milli_r
  FROM m CROSS JOIN tot t"""


@q("q348_poststratified_ate", _Q348_ORACLE)
def q348(spark: SparkSession, sf: str) -> DataFrame:
    """Post-stratified average treatment effect: the per-event-type
    arm difference reweighted by stratum size — the design-based fix
    when arm assignment is fine but the metric mixes heterogeneous
    event types (a raw mean diff over-weights whichever type the
    treatment arm happens to emit more of; post-stratification
    removes that composition noise, Miratrix-Sekhon-Yu 2013).  All
    per-stratum means stay in integer milli-cents ((1000*sum) DIV n,
    positive operands so DIV == floor in both engines); only the
    final size-weighted average divides once, as one double over two
    engine-identical bigints rounded to 6dp.  Two partial-aggregated
    groupBys plus a 1-row broadcast — composition-proof at any scale."""
    ev = load_table(spark, sf, "events")
    v = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("stratum"),
        (F.col("user_id") % 2).cast("bigint").alias("arm"),
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    s = v.groupBy("stratum").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
    )
    m = s.where((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        "stratum",
        "n",
        "n1",
        "n0",
        F.expr("CAST((1000 * s1) DIV n1 AS BIGINT)").alias("m1_milli"),
        F.expr("CAST((1000 * s0) DIV n0 AS BIGINT)").alias("m0_milli"),
    )
    # the global normalizer is a wall window over the |strata|-row frame,
    # not a separate agg + re-join: one scan of events total
    wall = Window.partitionBy()
    return m.select(
        "stratum",
        "n",
        "n1",
        "n0",
        "m1_milli",
        "m0_milli",
        (F.col("m1_milli") - F.col("m0_milli")).cast("bigint").alias("diff_milli"),
        F.round(
            F.sum(F.col("n") * (F.col("m1_milli") - F.col("m0_milli")))
            .over(wall)
            .cast("double")
            / F.sum("n").over(wall),
            6,
        ).alias("ate_ps_milli_r"),
    )


_Q349_ORACLE = """
  WITH scored AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab,
           CAST(l_quantity * 100 AS BIGINT) + CAST(l_discount * 1000
             AS BIGINT) AS s
    FROM lineitem),
  b AS (
    SELECT CAST(least((s - 100) // 251, 19) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(lab) AS BIGINT) AS pos
    FROM scored GROUP BY 1),
  c AS (
    SELECT bin, n, pos,
           sum(n) OVER (ORDER BY bin) AS cn,
           sum(pos) OVER (ORDER BY bin) AS cpos
    FROM b),
  pooled AS (
    SELECT j.bin AS jb, k.bin AS kb,
           CAST(k.cpos - j.cpos + j.pos AS DOUBLE)
             / CAST(k.cn - j.cn + j.n AS DOUBLE) AS avgjk
    FROM c j JOIN c k ON j.bin <= k.bin),
  inner_min AS (
    SELECT p.jb, i.bin AS ib, min(p.avgjk) AS minv
    FROM pooled p JOIN c i ON p.jb <= i.bin AND p.kb >= i.bin
    GROUP BY p.jb, i.bin),
  iso AS (SELECT ib AS bin, max(minv) AS iso FROM inner_min GROUP BY ib)
  SELECT c.bin, c.n, c.pos,
         round(CAST(c.pos AS DOUBLE) / c.n, 6) AS raw_rate_r,
         round(iso.iso, 6) AS iso_rate_r
  FROM c JOIN iso ON c.bin = iso.bin"""


@q("q349_isotonic_calibration", _Q349_ORACLE)
def q349(spark: SparkSession, sf: str) -> DataFrame:
    """Isotonic calibration curve (PAV / Zadrozny-Elkan 2002) for the
    q343 pseudo-scorer: 20 equal-width score bins aggregated
    distributed (one partial-agg groupBy — THAT is the data-sized
    stage), then pool-adjacent-violators on the driver over the
    20-row result (:func:`operators.stats.isotonic_fit_bins`, exact
    integer pooling).  The DuckDB oracle cross-checks through the
    independent minimax characterization iso_i = max_{j<=i}
    min_{k>=i} mean(j..k) — two different algorithms, same monotone
    fit, so a pooling bug on either side cannot hash-match.  Raw and
    fitted rates are bigint/bigint double divisions rounded to 6dp."""
    from ..operators.stats import isotonic_fit_bins

    li = load_table(spark, sf, "lineitem")
    scored = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("lab"),
        (
            (F.col("l_quantity") * 100).cast("bigint")
            + (F.col("l_discount") * 1000).cast("bigint")
        ).alias("s"),
    )
    b = scored.groupBy(
        F.least(F.expr("(s - 100) DIV 251"), F.lit(19))
        .cast("bigint")
        .alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("pos"),
    )
    fit = isotonic_fit_bins(b)
    return fit.select(
        "bin",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n"), 6).alias("raw_rate_r"),
        F.round(F.col("iso_rate"), 6).alias("iso_rate_r"),
    )


# =========================================================================
# Heavy-hitter churn + delta-method ratio CI (Q350-Q351)
# =========================================================================


_Q351_ORACLE = """
  WITH u AS (
    SELECT CAST(user_id % 2 AS BIGINT) AS arm, user_id,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM events WHERE value IS NOT NULL GROUP BY arm, user_id),
  a AS (
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy,
           CAST(sum(x * y) AS BIGINT) AS sxy
    FROM u GROUP BY arm),
  d AS (
    SELECT arm, n, sx, sy,
           CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
           CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
           CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
    FROM a),
  e AS (
    SELECT arm, n, sx, sy,
           sxd / syd AS r,
           (sxxd - sxd * sxd / nd) / (nd - 1) AS vx,
           (syyd - syd * syd / nd) / (nd - 1) AS vy,
           (sxyd - sxd * syd / nd) / (nd - 1) AS cxy,
           nd, syd
    FROM d)
  SELECT arm, n AS n_users, sx AS x_sum, sy AS y_sum,
         round(r, 6) AS ratio_r,
         round(sqrt((vx - 2 * r * cxy + r * r * vy) / nd)
               / (syd / nd), 6) AS se_r,
         round(r - 1.96 * (sqrt((vx - 2 * r * cxy + r * r * vy) / nd)
               / (syd / nd)), 6) AS ci_lo_r,
         round(r + 1.96 * (sqrt((vx - 2 * r * cxy + r * r * vy) / nd)
               / (syd / nd)), 6) AS ci_hi_r
  FROM e"""


@q("q351_ratio_metric_delta_ci", _Q351_ORACLE)
def q351(spark: SparkSession, sf: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue
    per event) per experiment arm: naive per-event CIs are wrong
    because events within a user are correlated — the unit of
    randomization is the user, so variance comes from per-user
    (x, y) totals via var(x̄/ȳ) ≈ (vx − 2r·cxy + r²·vy)/(n·ȳ²)
    (Deng et al., KDD 2017's ratio-metric standard).  Per-user totals
    and the six moment sums stay in exact bigints (two cascaded
    partial-agg groupBys); the handful of double ops and the one
    IEEE-exact sqrt run on engine-identical integers, written as the
    SAME expression tree on both sides, then rounded to 6dp."""
    ev = load_table(spark, sf, "events")
    u = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).cast("bigint").alias("arm"), "user_id"
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x"),
            F.count("*").cast("bigint").alias("y"),
        )
    )
    a = u.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    e = a.selectExpr(
        "arm",
        "n",
        "sx",
        "sy",
        "CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r",
        "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS vx",
        "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS vy",
        "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS cxy",
        "CAST(n AS DOUBLE) AS nd",
        "CAST(sy AS DOUBLE) AS syd",
    )
    return e.selectExpr(
        "arm",
        "n AS n_users",
        "sx AS x_sum",
        "sy AS y_sum",
        "round(r, 6) AS ratio_r",
        "round(sqrt((vx - 2 * r * cxy + r * r * vy) / nd)"
        " / (syd / nd), 6) AS se_r",
        "round(r - 1.96 * (sqrt((vx - 2 * r * cxy + r * r * vy) / nd)"
        " / (syd / nd)), 6) AS ci_lo_r",
        "round(r + 1.96 * (sqrt((vx - 2 * r * cxy + r * r * vy) / nd)"
        " / (syd / nd)), 6) AS ci_hi_r",
    )


# =========================================================================
# Markov removal-effect attribution (Q354)
# =========================================================================

_Q354_CHANNELS = ["click", "error", "signup", "view"]


def _q354_oracle() -> str:
    """Unrolled 8-layer value-iteration tower (the q165 PageRank
    oracle pattern): v_{k+1}(removed, state) = p(state->CONV) +
    sum_j p(state->j) * v_k(removed, j) over surviving channels."""
    chans = ", ".join(f"'{c}'" for c in _Q354_CHANNELS)
    head = f"""
  WITH ordered AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS seq
    FROM events),
  ps AS (SELECT user_id, min(seq) AS ps FROM ordered
         WHERE event_type = 'purchase' GROUP BY user_id),
  tch AS (
    SELECT o.user_id, o.event_type AS ch, o.seq, p.ps
    FROM ordered o LEFT JOIN ps p ON o.user_id = p.user_id
    WHERE o.event_type <> 'purchase'
      AND (p.ps IS NULL OR o.seq < p.ps)),
  w AS (
    SELECT user_id, ch, ps,
           row_number() OVER (PARTITION BY user_id ORDER BY seq) AS t,
           lead(ch) OVER (PARTITION BY user_id ORDER BY seq) AS nxt
    FROM tch),
  raw AS (
    SELECT 'START' AS src, ch AS dst FROM w WHERE t = 1
    UNION ALL
    SELECT ch, nxt FROM w WHERE nxt IS NOT NULL
    UNION ALL
    SELECT ch, CASE WHEN ps IS NOT NULL THEN 'CONV' ELSE 'DROP' END
    FROM w WHERE nxt IS NULL
    UNION ALL
    SELECT 'START', 'CONV' FROM ps p
    WHERE NOT EXISTS (SELECT 1 FROM tch
                      WHERE tch.user_id = p.user_id)),
  cnts AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
           FROM raw GROUP BY src, dst),
  trans AS (
    SELECT src, dst,
           CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY src) AS p
    FROM cnts),
  rem AS (SELECT unnest([{chans}, '__none__']) AS r),
  sts AS (SELECT rem.r, s.s
          FROM rem CROSS JOIN
               (SELECT unnest(['START', {chans}]) AS s) s
          WHERE s.s <> rem.r),
  pconv AS (SELECT src, p FROM trans WHERE dst = 'CONV'),
  pch AS (SELECT src, dst, p FROM trans WHERE dst IN ({chans})),
  v1 AS (
    SELECT sts.r, sts.s, coalesce(pc.p, 0.0) AS v
    FROM sts LEFT JOIN pconv pc ON pc.src = sts.s)"""
    layers = []
    for k in range(1, 8):
        layers.append(f""",
  v{k + 1} AS (
    SELECT sts.r, sts.s,
           coalesce(pc.p, 0.0)
             + coalesce(sum(pch.p * pv.v), 0.0) AS v
    FROM sts
    LEFT JOIN pconv pc ON pc.src = sts.s
    LEFT JOIN pch ON pch.src = sts.s AND pch.dst <> sts.r
    LEFT JOIN v{k} pv ON pv.r = sts.r AND pv.s = pch.dst
    GROUP BY sts.r, sts.s, pc.p)""")
    tail = """,
  base AS (SELECT v FROM v8 WHERE r = '__none__' AND s = 'START')
  SELECT v8.r AS removed_channel,
         round(base.v, 6) AS base_conv_r,
         round(v8.v, 6) AS removed_conv_r,
         round((base.v - v8.v) / base.v, 6) AS removal_effect_r
  FROM v8 CROSS JOIN base
  WHERE v8.s = 'START' AND v8.r <> '__none__'"""
    return head + "".join(layers) + tail


@q("q354_markov_attribution", _q354_oracle())
def q354(spark: SparkSession, sf: str) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al., IJRM 2016):
    credit each marketing channel by how much the START->CONV
    probability DROPS when that channel is deleted from the journey
    chain — the data-driven answer to 'which touchpoint actually
    causes conversions' that last-touch (q289) structurally cannot
    give.  Journeys are per-user event sequences truncated at the
    first purchase; the DISTRIBUTED stage reduces 100 TB of events to
    a |states|^2-row transition-count table (two sort windows + one
    partial-agg groupBy — the only data-sized work); the absorbing-
    chain value iteration runs on the driver over those ~30 rows with
    a FIXED 8-step horizon so the number is an exact arithmetic
    artifact (:func:`operators.stats.markov_conversion_prob`), cross-
    checked by the DuckDB oracle's independently-evaluated 8-layer
    SQL tower."""
    from ..operators.stats import markov_conversion_prob

    ev = load_table(spark, sf, "events")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("seq"),
    )
    ps = (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("seq").alias("ps"))
    )
    tch = (
        ordered.join(ps, "user_id", "left")
        .where(
            (F.col("event_type") != "purchase")
            & (F.col("ps").isNull() | (F.col("seq") < F.col("ps")))
        )
        .select("user_id", F.col("event_type").alias("ch"), "seq", "ps")
    )
    uw = Window.partitionBy("user_id").orderBy("seq")
    from ..operators.materialize import pin as _pin
    # checkpoint, not persist: a persisted frame referenced by the
    # RETURNED plan survives the call and later invocations silently
    # reuse the cache (cross-run memoization); a reliable checkpoint
    # re-computes per call and still collapses the three union branches
    w = tch.select(
        "user_id",
        "ch",
        "ps",
        F.row_number().over(uw).alias("t"),
        F.lead("ch").over(uw).alias("nxt"),
    ).transform(_pin)
    raw = (
        w.where(F.col("t") == 1)
        .select(F.lit("START").alias("src"), F.col("ch").alias("dst"))
        .unionAll(
            w.where(F.col("nxt").isNotNull()).select(
                F.col("ch").alias("src"), F.col("nxt").alias("dst")
            )
        )
        .unionAll(
            w.where(F.col("nxt").isNull()).select(
                F.col("ch").alias("src"),
                F.when(F.col("ps").isNotNull(), "CONV")
                .otherwise("DROP")
                .alias("dst"),
            )
        )
        .unionAll(
            ps.join(
                tch.select("user_id").distinct(), "user_id", "left_anti"
            ).select(
                F.lit("START").alias("src"), F.lit("CONV").alias("dst")
            )
        )
    )
    cnts = [
        (r["src"], r["dst"], r["cnt"])
        for r in raw.groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .collect()
    ]
    base = markov_conversion_prob(cnts, _Q354_CHANNELS, n_iter=8)
    rows = []
    for ch in _Q354_CHANNELS:
        rem = markov_conversion_prob(cnts, _Q354_CHANNELS, n_iter=8, removed=ch)
        # base == 0 (no journey converts): the oracle's double division
        # by zero yields NULL in DuckDB, so emit NULL, not a crash
        eff = (base - rem) / base if base != 0.0 else None
        rows.append((ch, base, rem, eff))
    values = ", ".join(
        f"('{ch}', CAST('{b!r}' AS DOUBLE), CAST('{r!r}' AS DOUBLE),"
        + (
            f" CAST('{e!r}' AS DOUBLE))"
            if e is not None
            else " CAST(NULL AS DOUBLE))"
        )
        for ch, b, r, e in rows
    )
    return spark.sql(
        f"SELECT removed_channel, round(b, 6) AS base_conv_r,"
        f" round(rv, 6) AS removed_conv_r,"
        f" round(e, 6) AS removal_effect_r"
        f" FROM VALUES {values} AS t(removed_channel, b, rv, e)"
    )


_Q358_ORACLE = """
  WITH v AS (
    SELECT event_type AS stratum,
           CAST(floor(value * 100) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL),
  s AS (
    SELECT stratum,
           CAST(count(*) AS BIGINT) AS nn,
           CAST(sum(c) AS BIGINT) AS sx,
           CAST(sum(c * c) AS BIGINT) AS sxx
    FROM v GROUP BY stratum),
  d AS (
    SELECT stratum, nn,
           sqrt((CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                   / CAST(nn AS DOUBLE))
                / (CAST(nn AS DOUBLE) - 1)) AS sd
    FROM s),
  w AS (
    SELECT stratum, nn, sd,
           CAST(floor(1000 * sd) AS BIGINT) * nn AS wu
    FROM d),
  t AS (SELECT CAST(sum(wu) AS BIGINT) AS tw FROM w),
  sh AS (
    SELECT stratum, nn, sd, wu,
           (10000 * wu) // t.tw AS base,
           (10000 * wu) % t.tw AS rem
    FROM w CROSS JOIN t),
  lo AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS r FROM sh),
  rk AS (
    SELECT stratum, nn, sd, base, rem,
           row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rn
    FROM sh)
  SELECT rk.stratum, rk.nn AS n_pop,
         round(rk.sd, 4) AS sd_cents_r,
         CAST(rk.base + CASE WHEN rk.rn <= lo.r THEN 1 ELSE 0 END
              AS BIGINT) AS n_sampled
  FROM rk CROSS JOIN lo"""


@q("q358_neyman_allocation", _Q358_ORACLE)
def q358(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman-optimal sample allocation (Neyman 1934): split a
    10,000-row measurement budget across event-type strata
    proportionally to N_s * sd_s — the allocation that minimizes the
    stratified estimator's variance, vs the proportional split q63
    uses when variances are unknown (a stratum with 2x the spread
    deserves 2x the sample).  Per-stratum moments are ONE
    partial-agg scan in exact bigint cents; the sd is one identical
    IEEE sqrt; weights integerize as floor(1000*sd)*N_s so the q320
    largest-remainder apportionment runs on exact integers and the
    10,000 seats always add up exactly."""
    ev = load_table(spark, sf, "events")
    v = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("stratum"),
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    s = v.groupBy("stratum").agg(
        F.count("*").cast("bigint").alias("nn"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sxx"),
    )
    w = s.selectExpr(
        "stratum",
        "nn",
        "sqrt((CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE))"
        " / (CAST(nn AS DOUBLE) - 1)) AS sd",
    ).selectExpr(
        "stratum", "nn", "sd",
        "CAST(floor(1000 * sd) AS BIGINT) * nn AS wu",
    )
    wall = Window.partitionBy()
    sh = w.select(
        "stratum",
        "nn",
        "sd",
        F.expr("10000 * wu").alias("num"),
        F.sum("wu").over(wall).alias("tw"),
    ).selectExpr(
        "stratum", "nn", "sd",
        "num DIV tw AS base",
        "num % tw AS rem",
    )
    rk = sh.select(
        "stratum",
        "nn",
        "sd",
        "base",
        (F.lit(10000) - F.sum("base").over(wall)).cast("bigint").alias("r"),
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("stratum")))
        .alias("rn"),
    )
    return rk.select(
        "stratum",
        F.col("nn").alias("n_pop"),
        F.round("sd", 4).alias("sd_cents_r"),
        (
            F.col("base")
            + F.when(F.col("rn") <= F.col("r"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_sampled"),
    )


# =========================================================================
# Hill tail index + full merge sync + Simpson detector (Q359-Q361)
# =========================================================================

_Q359_ORACLE = """
  WITH c AS (
    SELECT CAST(o_totalprice * 100 AS BIGINT) AS c, o_orderkey
    FROM orders),
  r AS (
    SELECT c, row_number() OVER (ORDER BY c DESC, o_orderkey) AS rn
    FROM c),
  thr AS (SELECT CAST(c AS DOUBLE) AS x1 FROM r WHERE rn = 101),
  logs AS (
    SELECT sum(ln(CAST(r.c AS DOUBLE) / t.x1)) AS sl,
           CAST(count(*) AS BIGINT) AS k
    FROM r CROSS JOIN thr t WHERE r.rn <= 100)
  SELECT logs.k,
         CAST(t.x1 AS BIGINT) AS x_threshold_cents,
         round(logs.sl / logs.k, 6) AS hill_h_r,
         round(logs.k / logs.sl, 6) AS alpha_r
  FROM logs CROSS JOIN thr t"""


@q("q359_hill_tail_index", _Q359_ORACLE)
def q359(spark: SparkSession, sf: str) -> DataFrame:
    """Hill estimator of the heavy-tail exponent (Hill 1975) over the
    top-100 order values: alpha ~ 2 means variance barely exists and
    every mean-based metric (q253's z-test, q351's delta CI) needs
    winsorizing (q246) first; alpha > 4 means the CLT is safe.  The
    top-(k+1) order statistics come from one TakeOrdered-shaped rank
    window (WindowGroupLimit prunes before the full sort); the k log
    ratios against the (k+1)-th value and their sum are the only
    float ops — engine-matched ln over identical bigint-ratio doubles
    (the q235 entropy precedent), rounded to 6dp."""
    orders = load_table(spark, sf, "orders")
    c = orders.select(
        (F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        "o_orderkey",
    )
    # global top-(k+1) as an orderBy+limit so Spark plans
    # TakeOrderedAndProject (per-partition heap + driver merge) — an
    # unpartitioned rank window would sort the whole table into one
    # partition first; the rank re-derives over the 101-row result
    top = c.orderBy(F.desc("c"), "o_orderkey").limit(101)
    r = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "o_orderkey"))
        .alias("rn"),
    )
    thr = r.where(F.col("rn") == 101).select(
        F.col("c").cast("double").alias("x1")
    )
    logs = (
        r.where(F.col("rn") <= 100)
        .crossJoin(F.broadcast(thr))
        .agg(
            F.sum(F.log(F.col("c").cast("double") / F.col("x1"))).alias("sl"),
            F.count("*").cast("bigint").alias("k"),
        )
    )
    return logs.crossJoin(F.broadcast(thr)).selectExpr(
        "k",
        "CAST(x1 AS BIGINT) AS x_threshold_cents",
        "round(sl / k, 6) AS hill_h_r",
        "round(k / sl, 6) AS alpha_r",
    )


_Q361_ORACLE = """
  WITH v AS (
    SELECT event_type AS stratum, CAST(user_id % 2 AS BIGINT) AS arm,
           CAST(floor(value * 100) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL),
  s AS (
    SELECT stratum,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
           CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS s0
    FROM v GROUP BY stratum),
  m AS (
    SELECT stratum, n1, n0,
           CAST((1000 * s1) // n1 - (1000 * s0) // n0 AS BIGINT)
             AS diff_milli,
           sum(s1) OVER () AS g1, sum(n1) OVER () AS gn1,
           sum(s0) OVER () AS g0, sum(n0) OVER () AS gn0
    FROM s WHERE n1 > 0 AND n0 > 0)
  SELECT stratum, n1, n0, diff_milli,
         CAST((1000 * g1) // gn1 - (1000 * g0) // gn0 AS BIGINT)
           AS pooled_diff_milli,
         (CASE WHEN diff_milli > 0 THEN 1
               WHEN diff_milli < 0 THEN -1 ELSE 0 END)
         * (CASE WHEN (1000 * g1) // gn1 - (1000 * g0) // gn0 > 0 THEN 1
                 WHEN (1000 * g1) // gn1 - (1000 * g0) // gn0 < 0 THEN -1
                 ELSE 0 END) < 0 AS sign_reversed
  FROM m"""


@q("q361_simpson_paradox_detector", _Q361_ORACLE)
def q361(spark: SparkSession, sf: str) -> DataFrame:
    """Simpson's-paradox detector: per stratum, does the arm effect's
    SIGN disagree with the pooled (unstratified) effect?  A reversal
    means the pooled metric is composition-confounded and only the
    q348 post-stratified number can be trusted — this query is the
    tripwire that tells an experimentation pipeline WHICH readout to
    publish.  Everything stays in integer milli-cents ((1000*sum)
    DIV n, positive operands); pooled sums are wall windows over the
    strata frame, so events is scanned once."""
    ev = load_table(spark, sf, "events")
    v = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("stratum"),
        (F.col("user_id") % 2).cast("bigint").alias("arm"),
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    s = v.groupBy("stratum").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
    )
    wall = Window.partitionBy()
    m = s.where((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        "stratum",
        "n1",
        "n0",
        F.expr("CAST((1000 * s1) DIV n1 - (1000 * s0) DIV n0 AS BIGINT)").alias(
            "diff_milli"
        ),
        F.sum("s1").over(wall).alias("g1"),
        F.sum("n1").over(wall).alias("gn1"),
        F.sum("s0").over(wall).alias("g0"),
        F.sum("n0").over(wall).alias("gn0"),
    )
    return m.selectExpr(
        "stratum",
        "n1",
        "n0",
        "diff_milli",
        "CAST((1000 * g1) DIV gn1 - (1000 * g0) DIV gn0 AS BIGINT)"
        " AS pooled_diff_milli",
        "(CASE WHEN diff_milli > 0 THEN 1"
        "      WHEN diff_milli < 0 THEN -1 ELSE 0 END)"
        " * (CASE WHEN (1000 * g1) DIV gn1 - (1000 * g0) DIV gn0 > 0 THEN 1"
        "         WHEN (1000 * g1) DIV gn1 - (1000 * g0) DIV gn0 < 0 THEN -1"
        "         ELSE 0 END) < 0 AS sign_reversed",
    )


# =========================================================================
# Wilson interval + covariate balance + layout advisor (Q362-Q364)
# =========================================================================

_Q362_ORACLE = """
  WITH u AS (
    SELECT user_id,
           CAST(user_id % 2 AS BIGINT) AS arm,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS conv
    FROM events GROUP BY user_id),
  a AS (
    SELECT arm, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(conv) AS BIGINT) AS x
    FROM u GROUP BY arm),
  d AS (
    SELECT arm, n, x,
           CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           CAST(n AS DOUBLE) AS nd
    FROM a)
  SELECT arm, n AS n_users, x AS n_converted,
         round(p, 6) AS p_r,
         round((p + (1.96 * 1.96) / (2 * nd)
                - 1.96 * sqrt(p * (1 - p) / nd
                              + (1.96 * 1.96) / (4 * nd * nd)))
               / (1 + (1.96 * 1.96) / nd), 6) AS wilson_lo_r,
         round((p + (1.96 * 1.96) / (2 * nd)
                + 1.96 * sqrt(p * (1 - p) / nd
                              + (1.96 * 1.96) / (4 * nd * nd)))
               / (1 + (1.96 * 1.96) / nd), 6) AS wilson_hi_r
  FROM d"""


@q("q362_wilson_interval", _Q362_ORACLE)
def q362(spark: SparkSession, sf: str) -> DataFrame:
    """Wilson score interval (Wilson 1927) for per-arm user
    conversion: the proportion CI that stays inside [0,1] and keeps
    coverage at small n or extreme rates, where q253's Wald z
    interval collapses (Brown-Cai-DasGupta 2001's recommendation).
    One groupBy to user grain (conversion = ANY purchase), one
    partial-agg per arm, then the closed-form bounds as a single
    identical IEEE tree over two exact bigints."""
    ev = load_table(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    a = u.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("arm")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("x"),
    )
    return a.selectExpr(
        "arm",
        "n AS n_users",
        "x AS n_converted",
        "round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_r",
        "round((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)"
        " + (1.96 * 1.96) / (2 * CAST(n AS DOUBLE))"
        " - 1.96 * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)"
        "   * (1 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))"
        "   / CAST(n AS DOUBLE)"
        "   + (1.96 * 1.96) / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
        " / (1 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_lo_r",
        "round((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)"
        " + (1.96 * 1.96) / (2 * CAST(n AS DOUBLE))"
        " + 1.96 * sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)"
        "   * (1 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))"
        "   / CAST(n AS DOUBLE)"
        "   + (1.96 * 1.96) / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
        " / (1 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_hi_r",
    )


_Q363_ORACLE = """
  WITH u AS (
    SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
           CAST(count(*) AS BIGINT) AS y,
           CAST(sum(CAST(floor(coalesce(value, 0) * 100) AS BIGINT))
                AS BIGINT) AS x,
           CAST(count(DISTINCT event_type) AS BIGINT) AS t
    FROM events GROUP BY user_id),
  a AS (
    SELECT arm, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy,
           CAST(sum(t) AS BIGINT) AS st, CAST(sum(t * t) AS BIGINT) AS stt
    FROM u GROUP BY arm),
  m AS (
    SELECT arm,
           CAST(n AS DOUBLE) AS nd,
           CAST(sx AS DOUBLE) AS sx, CAST(sxx AS DOUBLE) AS sxx,
           CAST(sy AS DOUBLE) AS sy, CAST(syy AS DOUBLE) AS syy,
           CAST(st AS DOUBLE) AS st, CAST(stt AS DOUBLE) AS stt
    FROM a),
  c AS (
    SELECT 'value_cents' AS covariate, arm, sx / nd AS mean,
           (sxx - sx * sx / nd) / (nd - 1) AS var FROM m
    UNION ALL
    SELECT 'n_events', arm, sy / nd,
           (syy - sy * sy / nd) / (nd - 1) FROM m
    UNION ALL
    SELECT 'n_event_types', arm, st / nd,
           (stt - st * st / nd) / (nd - 1) FROM m)
  SELECT c1.covariate,
         round(c1.mean, 4) AS mean_arm1_r,
         round(c0.mean, 4) AS mean_arm0_r,
         CASE WHEN c1.var + c0.var = 0 THEN NULL
              ELSE round((c1.mean - c0.mean)
                         / sqrt((c1.var + c0.var) / 2), 6) END AS smd_r
  FROM c c1 JOIN c c0
    ON c1.covariate = c0.covariate AND c1.arm = 1 AND c0.arm = 0"""


@q("q363_covariate_balance_smd", _Q363_ORACLE)
def q363(spark: SparkSession, sf: str) -> DataFrame:
    """Covariate balance table — the standardized mean difference
    (Austin 2009; |SMD| < 0.1 = balanced) of three pre-treatment
    user covariates between arms: the FIRST page of any experiment
    readout, because an imbalanced covariate invalidates q253/q351
    before they run.  One groupBy to user grain, one 8-sum partial
    agg per arm, covariates unpivoted via a 3-way union of the same
    moment row — events is scanned once and the SMD tree is
    engine-identical."""
    ev = load_table(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("y"),
        F.sum(
            F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("x"),
        F.countDistinct("event_type").cast("bigint").alias("t"),
    )
    a = u.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("arm")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
    )
    from ..operators.materialize import pin as _pin
    # the 2-row moment frame feeds six consumers (3 unpivot branches
    # x 2 arm splits); checkpoint so events is scanned once per call
    # (a leaked persist would be silently reused by later calls)
    m = a.selectExpr(
        "arm",
        "CAST(n AS DOUBLE) AS nd",
        "CAST(sx AS DOUBLE) AS sx", "CAST(sxx AS DOUBLE) AS sxx",
        "CAST(sy AS DOUBLE) AS sy", "CAST(syy AS DOUBLE) AS syy",
        "CAST(st AS DOUBLE) AS st", "CAST(stt AS DOUBLE) AS stt",
    ).transform(_pin)
    c = (
        m.selectExpr(
            "'value_cents' AS covariate", "arm", "sx / nd AS mean",
            "(sxx - sx * sx / nd) / (nd - 1) AS var",
        )
        .unionAll(
            m.selectExpr(
                "'n_events'", "arm", "sy / nd",
                "(syy - sy * sy / nd) / (nd - 1)",
            )
        )
        .unionAll(
            m.selectExpr(
                "'n_event_types'", "arm", "st / nd",
                "(stt - st * st / nd) / (nd - 1)",
            )
        )
    )
    c1 = c.where(F.col("arm") == 1).select(
        "covariate", F.col("mean").alias("m1"), F.col("var").alias("v1")
    )
    c0 = c.where(F.col("arm") == 0).select(
        "covariate", F.col("mean").alias("m0"), F.col("var").alias("v0")
    )
    return c1.join(c0, "covariate").selectExpr(
        "covariate",
        "round(m1, 4) AS mean_arm1_r",
        "round(m0, 4) AS mean_arm0_r",
        "CASE WHEN v1 + v0 = 0 THEN NULL"
        " ELSE round((m1 - m0) / sqrt((v1 + v0) / 2), 6) END AS smd_r",
    )


# =========================================================================
# Bitemporal point-in-time + temporal split audit + t-closeness (Q366-Q368)
# =========================================================================


_Q370_ORACLE = """
  WITH d AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS v
    FROM orders GROUP BY 1),
  idx AS (
    SELECT v, row_number() OVER (ORDER BY day) AS i,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM d),
  m AS (
    SELECT CAST(sum(v) AS BIGINT) AS sv,
           CAST(count(*) AS BIGINT) AS n
    FROM idx),
  lags AS (SELECT unnest([1, 2, 3, 7, 14]) AS lag),
  pairs AS (
    SELECT l.lag,
           (a.v - CAST(m.sv AS DOUBLE) / m.n)
             * (b.v - CAST(m.sv AS DOUBLE) / m.n) AS xy
    FROM lags l
    JOIN idx a ON TRUE
    JOIN idx b ON b.i = a.i + l.lag
    CROSS JOIN m),
  denom AS (
    SELECT sum((v - CAST(m.sv AS DOUBLE) / m.n)
               * (v - CAST(m.sv AS DOUBLE) / m.n)) AS ss
    FROM idx CROSS JOIN m)
  SELECT CAST(p.lag AS BIGINT) AS lag,
         round(sum(p.xy) / max(d2.ss), 6) AS acf_r
  FROM pairs p CROSS JOIN denom d2
  GROUP BY p.lag"""


@q("q370_autocorrelation_function", _Q370_ORACLE)
def q370(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation function of the daily revenue series at lags
    1/2/3/7/14 — the diagnostic that PICKS the q329 seasonal period
    and the q321 smoothing constants instead of assuming them (a
    spike at lag 7 = weekly seasonality; slow decay = trend, difference
    first).  The data-sized stage is one day-grain integer rollup;
    the series frame (|days| rows) self-joins at each lag and shares
    one mean/denominator, so the whole ACF costs |days|x|lags| tiny
    rows.  Revenue stays integer cents until the final identical
    IEEE products."""

    orders = load_table(spark, sf, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    from ..operators.materialize import pin as _pin
    # checkpoint (not persist): per-call materialization, no cache leak
    idx = d.select(
        "v",
        F.row_number().over(Window.orderBy("day")).alias("i"),
    ).transform(_pin)
    m = idx.agg(
        F.sum("v").cast("bigint").alias("sv"),
        F.count("*").cast("bigint").alias("n"),
    )
    lags = spark.sql("SELECT * FROM VALUES (1),(2),(3),(7),(14) AS t(lag)")
    a = idx.select(F.col("i").alias("ia"), F.col("v").alias("va"))
    b = idx.select(F.col("i").alias("ib"), F.col("v").alias("vb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("ib") == F.col("ia") + F.col("lag"))
        .crossJoin(F.broadcast(m))
        .select(
            "lag",
            (
                (F.col("va") - F.col("sv").cast("double") / F.col("n"))
                * (F.col("vb") - F.col("sv").cast("double") / F.col("n"))
            ).alias("xy"),
        )
    )
    denom = (
        idx.crossJoin(F.broadcast(m))
        .agg(
            F.sum(
                (F.col("v") - F.col("sv").cast("double") / F.col("n"))
                * (F.col("v") - F.col("sv").cast("double") / F.col("n"))
            ).alias("ss")
        )
    )
    return (
        pairs.groupBy(F.col("lag").cast("bigint").alias("lag"))
        .agg(F.sum("xy").alias("sxy"))
        .crossJoin(F.broadcast(denom))
        .select("lag", F.round(F.col("sxy") / F.col("ss"), 6).alias("acf_r"))
    )


_Q373_ORACLE = """
  WITH per AS (
    SELECT o_custkey AS c,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS spend
    FROM orders GROUP BY o_custkey),
  r AS (
    SELECT spend,
           row_number() OVER (ORDER BY spend, c) AS rn,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM per),
  d AS (
    SELECT CAST(least((10 * (rn - 1)) // n, 9) AS BIGINT) AS decile,
           spend
    FROM r),
  agg AS (
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(spend) AS BIGINT) AS spend_cents
    FROM d GROUP BY decile),
  cum AS (
    SELECT decile, n_customers, spend_cents,
           sum(spend_cents) OVER (ORDER BY decile) AS cum_spend,
           sum(spend_cents) OVER () AS total_spend
    FROM agg)
  SELECT decile, n_customers, spend_cents,
         CAST((1000 * cum_spend) // total_spend AS BIGINT)
           AS cum_share_milli
  FROM cum"""


@q("q373_lorenz_curve", _Q373_ORACLE)
def q373(spark: SparkSession, sf: str) -> DataFrame:
    """Lorenz curve of customer spend by decile — the full
    concentration READOUT behind q184's single Gini number: decile 9
    holding 45% of revenue vs 25% is the difference between a
    business with whale risk and one without, and the curve is what
    capacity planning and anti-abuse actually consume.  Customer
    totals aggregate once (partial-agg), the decile cut is one rank
    window (nearest-rank, tie-broken on the key), and cumulative
    shares stay in exact integer milli."""
    orders = load_table(spark, sf, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend")
    )
    r = per.select(
        "spend",
        F.row_number().over(Window.orderBy("spend", "c")).alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    d = r.select(
        F.least(F.expr("(10 * (rn - 1)) DIV n"), F.lit(9))
        .cast("bigint")
        .alias("decile"),
        "spend",
    )
    agg = d.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("spend").cast("bigint").alias("spend_cents"),
    )
    return agg.select(
        "decile",
        "n_customers",
        "spend_cents",
        F.expr(
            "CAST((1000 * sum(spend_cents) OVER (ORDER BY decile))"
            " DIV (sum(spend_cents) OVER ()) AS BIGINT)"
        ).alias("cum_share_milli"),
    )
