"""Statistical, time-series, and evaluation analytics (q224-q329):
correlation/regression/robust-stats families, survival and funnel
analysis, calibration and lift readouts, interval/bitmap/time algebra,
privacy-publishing audits, and sketch/merge contracts.

Split from tier_core_sql (round 8, same playbook as the round-5 split of
the original single module): registration order within the tier is
preserved, and all tier modules share the `_shared` registry so
`queries()` / `oracle_sql()` stay the single assembly points.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401
from ..operators.stats import gini_best_split, mann_whitney_u
from ..operators.timeseries import clamped_running_balance, peak_concurrency


def _q224_lag_arm(lag: int) -> str:
    return f"""
  SELECT {lag} AS lag,
         CAST(count(*) AS BIGINT) AS n,
         round(CAST(count(*) * sum(a.x * b.y) - sum(a.x) * sum(b.y)
                    AS DOUBLE)
               / sqrt(CAST(count(*) * sum(a.x * a.x) - sum(a.x) * sum(a.x)
                           AS DOUBLE)
                      * CAST(count(*) * sum(b.y * b.y) - sum(b.y) * sum(b.y)
                             AS DOUBLE)), 6) AS r
  FROM grid a JOIN grid b ON b.h = a.h + INTERVAL {lag} HOUR"""


_Q224_ORACLE = (
    """WITH cnt AS (
  SELECT date_trunc('hour', ts) AS h,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM cnt),
grid AS (
  SELECT g.h, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
  FROM (SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds) g
  LEFT JOIN cnt c ON c.h = g.h)
"""
    + "\nUNION ALL".join(_q224_lag_arm(i) for i in range(4))
)


@q("q224_lagged_crosscorr", _Q224_ORACLE)
def q224(spark: SparkSession, sf: str) -> DataFrame:
    """Lagged cross-correlation between two event streams: Pearson r
    between hourly click counts and purchase counts L hours later,
    L in 0..3 — the lead-indicator scan behind pipeline monitoring
    (does ingest volume predict dedup load an hour later?).  The hour
    grid is DENSE (sequence() between the observed bounds, gaps
    coalesced to zero counts — a missing hour IS data), each lag is a
    timestamp-shifted equi-JOIN of the grid to itself (shuffle-
    parallel; never a single-partition lag window), and r is assembled
    from the five integer moment sums, so both engines divide and
    sqrt identical integers and round(., 6) is bit-safe.  Grid length
    is the corpus timespan in hours — tiny relative to the corpus —
    while the counting pass is one partial-combined aggregate over the
    events scan."""
    ev = load_table(spark, sf, "events")
    cnt = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    bounds = cnt.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        bounds.select(
            F.explode(
                F.sequence(
                    "h0", "h1", F.expr("INTERVAL 1 HOUR")
                )
            ).alias("h")
        )
        .join(cnt, "h", "left")
        .select(
            "h",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    arms = []
    for lag in range(4):
        a = grid.alias("a")
        b = grid.alias("b")
        joined = a.join(
            b,
            F.col("b.h")
            == F.col("a.h") + F.expr(f"INTERVAL {lag} HOUR"),
        ).select(F.col("a.x").alias("x"), F.col("b.y").alias("y"))
        num = (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        ).cast("double")
        denx = (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        ).cast("double")
        deny = (
            F.count(F.lit(1)) * F.sum(F.col("y") * F.col("y"))
            - F.sum("y") * F.sum("y")
        ).cast("double")
        arms.append(
            joined.agg(
                F.lit(lag).alias("lag"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(num / F.sqrt(denx * deny), 6).alias("r"),
            )
        )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionAll(arm)
    return out


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
    sup = it.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
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


_Q229_ORACLE = """
  WITH x AS (
    SELECT EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hod,
           CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT)
             AS micros
    FROM events),
  h AS (
    SELECT hod, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(micros) AS BIGINT) AS sum_micros
    FROM x GROUP BY hod),
  g AS (
    SELECT CAST(count(*) AS BIGINT) AS gn,
           CAST(sum(micros) AS BIGINT) AS gs
    FROM x)
  SELECT CAST(hod AS INT) AS hod, n_events, sum_micros,
         round((CAST(sum_micros AS DOUBLE) / n_events)
               / (CAST(gs AS DOUBLE) / gn), 6) AS seasonal_index
  FROM h CROSS JOIN g"""


@q("q229_seasonal_index", _Q229_ORACLE)
def q229(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day SEASONAL INDEX — the multiplicative-decomposition
    seasonal component: per hour h, (mean value in h) / (global mean).
    Ingest and engagement volumes breathe daily; the index is how a
    pipeline normalizes load forecasts and spots hours whose quality
    mix drifts (a 3 a.m. spam wave shows up as an index spike before
    any classifier does).

    Shape: ONE partial-combined groupBy(hour) — 24 output rows — with
    the global totals as unpartitioned window sums over those 24 rows
    (one corpus scan total; a separate agg branch would re-evaluate
    the scan); the shuffle carries 24 partial tuples per partition.  Engine-exactness: values floored to integer
    micros so both sums are exact BIGINTs, and the index is computed
    with the identical (sum/n)/(gs/gn) DOUBLE expression tree on both
    engines — identical integer operands through identical IEEE
    operations, pinned by round(., 6) (the q227 contract)."""
    x = load_table(spark, sf, "events").select(
        F.hour(F.col("ts").cast("timestamp")).alias("hod"),
        F.floor(F.col("value").cast("double") * 1000000)
        .cast("bigint")
        .alias("micros"),
    )
    h = x.groupBy("hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("micros").cast("bigint").alias("sum_micros"),
    )
    # the global totals are exactly the column sums of the 24-row
    # hourly aggregate — unpartitioned window sums over h (24 rows)
    # keep the query to ONE corpus scan; a separate h.agg branch would
    # re-evaluate h's lineage including the scan (no common-subtree
    # reuse in the logical plan), which is what this replaced
    wall = Window.partitionBy()
    withg = h.select(
        "hod",
        "n_events",
        "sum_micros",
        F.sum("n_events").over(wall).cast("bigint").alias("gn"),
        F.sum("sum_micros").over(wall).cast("bigint").alias("gs"),
    )
    return withg.select(
        F.col("hod").cast("int").alias("hod"),
        "n_events",
        "sum_micros",
        F.round(
            (F.col("sum_micros").cast("double") / F.col("n_events"))
            / (F.col("gs").cast("double") / F.col("gn")),
            6,
        ).alias("seasonal_index"),
    )


_Q231_ORACLE = """
  WITH d AS (
    SELECT DISTINCT event_type AS t,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
           user_id
    FROM events),
  obs AS (SELECT DISTINCT t, day FROM d),
  c AS (
    SELECT t, day + i AS w, user_id
    FROM d, UNNEST(range(0, 3)) AS u(i)),
  e AS (
    SELECT t, w, count(DISTINCT user_id) AS n FROM c GROUP BY t, w)
  SELECT obs.t AS event_type, CAST(obs.day AS INT) AS day_num,
         CAST(e.n AS BIGINT) AS exact_unique, TRUE AS within_5pct
  FROM obs JOIN e ON e.t = obs.t AND e.w = obs.day"""


@q("q231_sliding_hll_contract", _Q231_ORACLE)
def q231(spark: SparkSession, sf: str) -> DataFrame:
    """SLIDING-window distinct users via HLL sketch algebra — the
    sketch ∘ window composition: per (event_type, day) one fixed-size
    HLL sketch of user ids, then the trailing 3-day unique count is
    hll_union_agg over a RANGE frame and one estimate call.  This is
    the 100 TB shape for "rolling uniques" dashboards: the corpus scan
    happens ONCE (per-day sketch build, partial-combined — sketches
    merge map-side); the window then runs over the |types|×|days|
    sketch table, which is tiny, and re-windowing to 7/28-day frames
    needs NO rescan — the q130/q214 mergeability argument lifted into
    a window frame.

    Gate contract (the q130/q160/q201 sketch pattern): the query also
    computes the EXACT trailing distinct (each (type, day, user) row
    explodes to the <= 3 window days it feeds — codegen Generate, one
    distinct agg) and emits within_5pct = |est/exact − 1| <= 0.05;
    the oracle recomputes the exact counts and expects TRUE (HLL at
    default lgK=12 is ~1.6 % rel-err, and exact below sparse-mode
    cutoffs).  The estimate itself stays out of the output — sketch
    internals are engine-specific by construction."""
    ev = load_table(spark, sf, "events")
    d = ev.select(
        F.col("event_type").alias("t"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
        "user_id",
    ).distinct()
    per = d.groupBy("t", "day").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    per.createOrReplaceTempView("q231_per")
    est = spark.sql(
        """SELECT t, day,
             CAST(hll_sketch_estimate(hll_union_agg(sk) OVER (
               PARTITION BY t ORDER BY day
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)) AS BIGINT)
               AS est
           FROM q231_per"""
    )
    # no distinct before the agg: countDistinct already deduplicates
    # (t, w, user_id) in its own partial aggregation — an explicit
    # distinct would repeat the same keyed exchange over the exploded
    # volume, the largest intermediate in the query
    contrib = d.select(
        "t",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 2)
        ).alias("w"),
        "user_id",
    )
    exact = contrib.groupBy("t", "w").agg(
        F.countDistinct("user_id").alias("exact_unique")
    )
    return (
        est.join(
            exact,
            (est["t"] == exact["t"]) & (est["day"] == exact["w"]),
        )
        .select(
            est["t"].alias("event_type"),
            est["day"].cast("int").alias("day_num"),
            F.col("exact_unique").cast("bigint").alias("exact_unique"),
            (
                F.abs(
                    F.col("est").cast("double") / F.col("exact_unique")
                    - 1.0
                )
                <= 0.05
            ).alias("within_5pct"),
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


_Q233_ORACLE = """
  WITH dim AS (
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_orderkey % 97 <> 0),
  orphan_li AS (
    SELECT count(*) AS viol FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM dim d WHERE d.o_orderkey = l.l_orderkey)),
  orphan_ord AS (
    SELECT count(*) AS viol FROM dim d
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = d.o_custkey)),
  dup_pk AS (
    SELECT count(*) AS viol FROM (
      SELECT o_orderkey FROM dim
      GROUP BY o_orderkey HAVING count(*) > 1))
  SELECT 'lineitem_fk_orders' AS check_name,
         CAST(viol AS BIGINT) AS violations FROM orphan_li
  UNION ALL
  SELECT 'orders_fk_customer', CAST(viol AS BIGINT) FROM orphan_ord
  UNION ALL
  SELECT 'orders_pk_unique', CAST(viol AS BIGINT) FROM dup_pk"""


@q("q233_referential_audit", _Q233_ORACLE)
def q233(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-table REFERENTIAL-INTEGRITY audit — the missing third of
    the expectations family: q148/q191 check value rules within one
    table; this checks the relationships BETWEEN tables that a
    partial or out-of-order load breaks.  The fixture simulates a
    partial dimension load (orders with o_orderkey % 97 = 0 dropped),
    so the foreign-key check reports real nonzero orphan counts
    instead of a vacuous all-green.

    Three checks, each the scale-correct shape: FK orphans are LEFT
    ANTI joins (never NOT IN subquery re-evaluation — null-safe and
    shuffle-parallel), PK uniqueness is one partial-combined
    groupBy-HAVING.  Each check reduces to a 1-row count, so the
    audit's output is |checks|-sized regardless of corpus size; at
    100 TB the FK anti-joins ride the same hash exchange a normal
    dim join would (or a Bloom pre-filter, q187)."""
    orders = load_table(spark, sf, "orders")
    dim = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf, "lineitem")
    cust = load_table(spark, sf, "customer")
    orphan_li = (
        li.join(
            dim.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(
            F.lit("lineitem_fk_orders").alias("check_name"), "violations"
        )
    )
    orphan_ord = (
        dim.join(
            cust.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(
            F.lit("orders_fk_customer").alias("check_name"), "violations"
        )
    )
    dup_pk = (
        dim.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(
            F.lit("orders_pk_unique").alias("check_name"), "violations"
        )
    )
    return orphan_li.union(orphan_ord).union(dup_pk)


_Q237_ORACLE = """
  WITH x AS (
    SELECT event_type,
           date_diff('day', CAST(ts AS DATE), r.mx) AS age_days,
           CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT)
             AS vm
    FROM events
    CROSS JOIN (SELECT max(CAST(ts AS DATE)) AS mx FROM events) r)
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(CAST(vm AS DOUBLE)
               * exp(-(ln(2) / 7.0) * age_days) ) AS BIGINT))
           AS BIGINT) AS decayed_micros
  FROM x GROUP BY event_type"""


@q("q237_time_decayed_popularity", _Q237_ORACLE)
def q237(spark: SparkSession, sf: str) -> DataFrame:
    """Time-DECAYED value aggregate (7-day half-life): per event type,
    Σ value·2^(−age/7) against the corpus's newest day — the freshness-
    weighted popularity/ranking feature (trending detection, recency-
    weighted sampling priors) that a plain windowed sum can't express
    because every row carries its own continuous weight.

    Shape: the reference date is a 1-row broadcast (max date), then ONE
    partial-combined groupBy over the scan — the decay weight is a
    per-row codegen expression, so at 100 TB the feature costs exactly
    the scan and re-scoring under a different half-life is another
    one-liner, not a new pipeline.  Engine-exactness: each row's
    value·exp(−λ·age) term is computed from integer micros and integer
    age through the identical IEEE expression tree, floored to integer
    micros, and summed EXACTLY (the q235 micro-nat contract) — double
    summation order never matters."""
    ev = load_table(spark, sf, "events")
    r = ev.agg(F.max(F.to_date("ts")).alias("mx"))
    x = ev.crossJoin(F.broadcast(r)).select(
        "event_type",
        F.datediff(F.col("mx"), F.to_date("ts")).alias("age_days"),
        F.floor(F.col("value").cast("double") * 1000000)
        .cast("bigint")
        .alias("vm"),
    )
    lam = float(__import__("math").log(2)) / 7.0
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.floor(
                F.col("vm").cast("double")
                * F.exp(-F.lit(lam) * F.col("age_days"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("decayed_micros"),
    )


_Q239_ORACLE = """
  WITH s0 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id),
  s1 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s0 ON e.user_id = s0.user_id
    WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id),
  s2 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s1.t
    GROUP BY e.user_id),
  counts AS (
    SELECT 0 AS step_idx, 'view' AS step,
           CAST(count(*) AS BIGINT) AS users_reached FROM s0
    UNION ALL SELECT 1, 'click', CAST(count(*) AS BIGINT) FROM s1
    UNION ALL SELECT 2, 'purchase', CAST(count(*) AS BIGINT) FROM s2)
  SELECT step_idx, step, users_reached,
         CASE WHEN step_idx > 0
                   AND lag(users_reached) OVER (ORDER BY step_idx) > 0
              THEN round(users_reached /
                   CAST(lag(users_reached) OVER (ORDER BY step_idx)
                        AS DOUBLE), 6) END AS conversion_from_prev_r,
         CASE WHEN step_idx > 0
                   AND first_value(users_reached)
                       OVER (ORDER BY step_idx) > 0
              THEN round(users_reached /
                   CAST(first_value(users_reached)
                        OVER (ORDER BY step_idx) AS DOUBLE), 6)
              END AS conversion_from_first_r
  FROM counts ORDER BY step_idx"""


@q("q239_funnel_conversion", _Q239_ORACLE)
def q239(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase over the event log
    (`timeseries.funnel_conversion`): a user reaches step k iff a
    steps[k] event exists strictly after their earliest qualifying
    steps[k-1] event — the greedy earliest-completion rule (earliest
    qualifying times maximize downstream completions).  Product-funnel
    conversion is the telemetry twin of the curation pipeline's
    stage-yield reports (q99): same monotone-reach contract, same
    |steps|-row result.

    Plan: per step one pushed-down filter scan + user-keyed min-agg,
    user-to-user equi-joins between steps (co-partitioned after the
    first exchange), conversions from one window over the |steps|-row
    union — fully lazy, no driver-side actions, the raw log is never
    globally sorted."""
    from ..operators.timeseries import funnel_conversion

    ev = load_table(spark, sf, "events")
    return funnel_conversion(
        ev, ["view", "click", "purchase"], "user_id", "ts", "event_type"
    )


_Q240_ORACLE = """
  WITH m AS (
    SELECT o_orderpriority,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS v
    FROM orders GROUP BY 1, 2),
  c AS (
    SELECT o_orderpriority, mth, v,
           sum(v) OVER (PARTITION BY o_orderpriority ORDER BY mth
                        ROWS UNBOUNDED PRECEDING) AS cum,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY mth) AS i,
           sum(v) OVER (PARTITION BY o_orderpriority) AS tot,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM m),
  r AS (
    SELECT o_orderpriority, mth,
           abs(n * cum - i * tot) AS a, n,
           row_number() OVER (
             PARTITION BY o_orderpriority
             ORDER BY abs(n * cum - i * tot) DESC, mth ASC) AS rn
    FROM c)
  SELECT o_orderpriority, mth AS cp_ts,
         round(CAST(a AS DOUBLE) / (n * 1.0), 4) AS max_abs_cusum_r,
         CAST(n AS BIGINT) AS n_points
  FROM r WHERE rn = 1"""


@q("q240_cusum_changepoint", _Q240_ORACLE)
def q240(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM changepoint per order priority over the monthly revenue
    series (`timeseries.cusum_changepoint`): the month maximizing
    |Σ_{j<=i}(x_j − x̄)| — WHERE the level shifted, the ordered-series
    companion to the PSI/KS "did it shift" detectors (q158/q164).
    Raw orders collapse to the |months|-per-priority grid in one
    partial-combined aggregate before any window runs, and the whole
    argmax is INTEGER arithmetic on cents (n·S_i = n·cum_i − i·total),
    so the changepoint and tie-break are engine-bit-exact; only the
    reported magnitude divides back to a rounded double."""
    from ..operators.timeseries import cusum_changepoint

    orders = load_table(spark, sf, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("mth"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("v")
    )
    return cusum_changepoint(
        monthly, "mth", "v", group_cols=["o_orderpriority"], scale=1
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


_Q255_ORACLE = """
  WITH per AS (
    SELECT CAST(c_nationkey AS VARCHAR) AS c_nationkey,
           c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS s
    FROM customer GROUP BY 1, 2),
  ok AS (
    SELECT c_nationkey, c_mktsegment, n,
           round(CAST(s AS DOUBLE) / n / 100, 4) AS avg_r
    FROM per WHERE n >= 15),
  sup AS (
    SELECT '__suppressed__' AS c_nationkey,
           '__suppressed__' AS c_mktsegment,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS avg_r
    FROM per WHERE n < 15)
  SELECT * FROM ok UNION ALL SELECT * FROM sup"""


@q("q255_k_anonymity_publish", _Q255_ORACLE)
def q255(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity release gate over per-(nation, segment) account
    balances (`expectations.k_anonymity_publish`, k=15): means are
    published only for groups with >= k members; smaller groups
    collapse into ONE __suppressed__ rollup row carrying their total
    row count and no statistic — the minimum-cell-size rule of every
    data-release policy, with the suppressed MASS surfaced (the
    q188/q201 no-silent-truncation discipline).  One partial-combined
    aggregate + a |groups|-row split; cost is the scan at any
    scale."""
    from ..operators.expectations import k_anonymity_publish

    customer = load_table(spark, sf, "customer")
    return k_anonymity_publish(
        customer, ["c_nationkey", "c_mktsegment"], "c_acctbal", k=15
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


_Q261_ORACLE = """
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders,
         round(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               / 100.0, 2) AS revenue_r
  FROM orders GROUP BY o_orderpriority"""


@q("q261_identifier_clause", _Q261_ORACLE)
def q261(spark: SparkSession, sf: str) -> DataFrame:
    """Spark-4 IDENTIFIER() clause: table AND column names arrive as
    named SQL PARAMETERS (never string-interpolated — the SQL-
    injection-safe form of dynamic table routing every multi-tenant /
    per-day-table pipeline needs), resolved at parse time so the plan
    is identical to the literal query: same pushdown, same
    partial-combined aggregate.  Completes the Spark-4 SQL surface
    family (named-parameter SQL q186, pipe syntax q194, SQL scripting
    q211, recursive CTE q159)."""
    orders = load_table(spark, sf, "orders")
    orders.createOrReplaceTempView("ctdc_q261_orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:gcol) AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CAST(floor(IDENTIFIER(:vcol) * 100)
                              AS BIGINT)) / 100.0, 2) AS revenue_r
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:gcol)
        """,
        args={
            "tbl": "ctdc_q261_orders",
            "gcol": "o_orderpriority",
            "vcol": "o_totalprice",
        },
    )


_Q264_ORACLE = """
  WITH m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS v
    FROM orders GROUP BY 1),
  p AS (
    SELECT CAST(month + INTERVAL 12 MONTH AS DATE) AS month,
           v AS pv
    FROM m)
  SELECT m.month,
         round(m.v / 100.0, 2) AS rev_r,
         round(p.pv / 100.0, 2) AS prev_year_rev_r,
         CASE WHEN p.pv > 0
              THEN round((m.v - p.pv) / CAST(p.pv AS DOUBLE), 4)
              END AS yoy_pct_r
  FROM m LEFT JOIN p ON m.month = p.month"""


@q("q264_yoy_growth", _Q264_ORACLE)
def q264(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-same-month-last-year revenue growth
    (`timeseries.yoy_growth`): aligned by a CALENDAR self-join
    (month = add_months(month, 12)), not lag(12) — a calendar gap
    silently shifts every lag-based comparison one month off, the
    classic quietly-wrong BI number; missing prior years surface as
    NULL.  One partial-combined aggregate to |months| rows + one
    broadcast self-join of that tiny table; totals exact cents."""
    from ..operators.timeseries import yoy_growth

    orders = load_table(spark, sf, "orders")
    return yoy_growth(orders, "o_orderdate", "o_totalprice")


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


_Q270_ORACLE = """
  WITH s AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           min(ts) AS st, max(ts) AS en
    FROM events GROUP BY 1, 2),
  p AS (
    SELECT a.day
    FROM s a JOIN s b
      ON a.day = b.day AND a.user_id < b.user_id
     AND a.st <= b.en AND b.st <= a.en)
  SELECT day, CAST(count(*) AS BIGINT) AS n_pairs
  FROM p GROUP BY day"""


@q("q270_interval_overlap_join", _Q270_ORACLE)
def q270(spark: SparkSession, sf: str) -> DataFrame:
    """Interval × interval overlap join (`asof.interval_overlap_join`):
    pairs of DIFFERENT users whose daily activity sessions
    [first event, last event] overlap in time — the sessions ×
    campaigns / outages × requests primitive q87's point-in-window
    range join cannot express.  Both interval sets explode to DAY
    bins — sized to the interval duration per the operator's own
    rule: these sessions span most of a day, so hour bins would
    explode each interval into ~24 candidate copies that the
    rendezvous filter then discards (measured 5x slower at sf0.1
    for byte-identical output).  The join is an equi-join on the
    bin (never BNLJ/cartesian), and the rendezvous-bin rule (keep a
    pair only in the max of the two start bins) emits each pair
    exactly once with NO dedup pass.  The oracle is the direct
    quadratic overlap join — affordable at gate scale, which is
    exactly why the binned form exists for the real one."""
    from ..operators.asof import interval_overlap_join

    ev = load_table(spark, sf, "events")
    s = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    j = interval_overlap_join(
        s,
        s,
        "st",
        "en",
        "st",
        "en",
        bin_seconds=86400,
        extra_cond=F.col("l.user_id") < F.col("r.user_id"),
    )
    return j.groupBy(F.col("l.day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


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


_Q274_ORACLE = """
  WITH fo AS (
    SELECT o_custkey,
           CAST(date_trunc('month', min(o_orderdate)) AS DATE)
             AS cohort
    FROM orders GROUP BY 1),
  sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
         FROM fo GROUP BY 1),
  rev AS (
    SELECT fo.cohort,
           date_diff('month', fo.cohort,
                     CAST(date_trunc('month', o.o_orderdate) AS DATE))
             AS age_months,
           sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey
    GROUP BY 1, 2),
  cum AS (
    SELECT cohort, age_months,
           sum(cents) OVER (PARTITION BY cohort ORDER BY age_months
                            ROWS UNBOUNDED PRECEDING) AS cum_cents
    FROM rev)
  SELECT c.cohort, CAST(c.age_months AS INT) AS age_months,
         s.cohort_size,
         CAST((c.cum_cents * 10) // s.cohort_size AS BIGINT)
           AS ltv_per_customer_milli
  FROM cum c JOIN sz s ON c.cohort = s.cohort"""


@q("q274_cohort_ltv", _Q274_ORACLE)
def q274(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month, cumulative revenue per customer by months-since-cohort —
    the MONETARY twin of q153's presence-count retention (retention
    says who came back; LTV says what coming back was worth).  One
    first-order aggregate, one cohort-keyed revenue rollup
    (co-partitioned join), one per-cohort cumulative window over the
    |cohorts|·|ages| table; LTV is an exact INTEGER division
    (tenths of a cent per customer) — a rounded 2-dp double here
    lands on .xx5 half-boundaries whenever the cohort size divides
    the cents evenly, where Spark's HALF_UP and DuckDB's nearest
    disagree (caught at gate time; integer division has no boundary
    to disagree on)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf, "orders")
    fo = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate"))
        .cast("date")
        .alias("cohort")
    )
    sz = fo.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    rev = (
        orders.join(fo, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")).cast(
                    "date"
                ),
                F.col("cohort"),
            )
            .cast("int")
            .alias("age_months"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.select(
        "cohort",
        "age_months",
        F.sum("cents").over(wcum).alias("cum_cents"),
    )
    return cum.join(sz, "cohort").select(
        "cohort",
        "age_months",
        "cohort_size",
        F.expr("CAST((cum_cents * 10) DIV cohort_size AS BIGINT)")
        .alias("ltv_per_customer_milli"),
    )


_Q275_ORACLE = """
  WITH m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS v
    FROM orders GROUP BY 1),
  f AS (
    SELECT CAST(month + INTERVAL 12 MONTH AS DATE) AS month,
           v AS fc
    FROM m),
  j AS (
    SELECT m.month, m.v, f.fc
    FROM m JOIN f ON m.month = f.month)
  SELECT CAST(count(*) AS BIGINT) AS n_months,
         round(avg(abs(v - fc) / CAST(v AS DOUBLE)), 6) AS mape_r,
         round(avg(2.0 * abs(v - fc) / (CAST(v AS DOUBLE) + fc)), 6)
           AS smape_r
  FROM j"""


@q("q275_seasonal_naive_backtest", _Q275_ORACLE)
def q275(spark: SparkSession, sf: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (forecast(m) = actual
    revenue at m−12, the q264 calendar alignment reused as a MODEL):
    MAPE and sMAPE over every month with a prior-year observation —
    the baseline every fancier forecaster must beat, and the eval
    harness shape for any of them (swap the forecast CTE, keep the
    error aggregate).  |months|-row tables throughout; errors are
    ratios of exact integer cents."""
    orders = load_table(spark, sf, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("month")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("v")
    )
    f = m.select(
        F.add_months(F.col("month"), 12).alias("month"),
        F.col("v").alias("fc"),
    )
    j = m.join(f, "month")
    ape = F.abs(F.col("v") - F.col("fc")) / F.col("v").cast("double")
    sape = (
        2.0
        * F.abs(F.col("v") - F.col("fc"))
        / (F.col("v").cast("double") + F.col("fc"))
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.round(F.avg(ape), 6).alias("mape_r"),
        F.round(F.avg(sape), 6).alias("smape_r"),
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


_Q291_ORACLE = """
  WITH pre AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
           count(*) AS n
    FROM customer GROUP BY 1, 2, 3)
  SELECT c_nationkey, c_mktsegment,
         CAST(sum(n) AS BIGINT) AS group_size,
         CAST(count(*) AS BIGINT) AS l_distinct,
         count(*) >= 3 AS meets_l
  FROM pre GROUP BY 1, 2"""


@q("q291_l_diversity_audit", _Q291_ORACLE)
def q291(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (`operators/expectations.py:
    l_diversity_audit`, Machanavajjhala et al. ICDE 2006) over the
    q255 release groups: a (nation, segment) cell can be k-anonymous
    yet leak everyone's balance if all members share the same
    thousand-dollar band — the homogeneity attack k-anonymity cannot
    see.  Distinct-l per group computed via a (qi, sensitive)
    PRE-aggregate (exact distinct with partial combine, never a
    count_distinct shuffle explosion); output is |groups|-row, all
    integers."""
    from ..operators.expectations import l_diversity_audit

    customer = load_table(spark, sf, "customer")
    banded = customer.withColumn(
        "band", F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    )
    return l_diversity_audit(
        banded, ["c_nationkey", "c_mktsegment"], "band", l=3
    )


_Q292_ORACLE = """
  WITH ek AS (
    SELECT DISTINCT c_custkey AS k FROM customer
    WHERE c_custkey % 97 = 3),
  t1 AS (
    SELECT 'customer' AS table_name,
           CAST(sum(CASE WHEN e.k IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_purged,
           CAST(sum(CASE WHEN e.k IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_retained
    FROM customer c LEFT JOIN ek e ON c.c_custkey = e.k),
  t2 AS (
    SELECT 'orders' AS table_name,
           CAST(sum(CASE WHEN e.k IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_purged,
           CAST(sum(CASE WHEN e.k IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_retained
    FROM orders o LEFT JOIN ek e ON o.o_custkey = e.k),
  t3 AS (
    SELECT 'events' AS table_name,
           CAST(sum(CASE WHEN e.k IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_purged,
           CAST(sum(CASE WHEN e.k IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_retained
    FROM events v LEFT JOIN ek e ON v.user_id = e.k)
  SELECT table_name, rows_purged, rows_retained,
         CAST(0 AS BIGINT) AS residual_refs
  FROM t1
  UNION ALL SELECT table_name, rows_purged, rows_retained,
         CAST(0 AS BIGINT) FROM t2
  UNION ALL SELECT table_name, rows_purged, rows_retained,
         CAST(0 AS BIGINT) FROM t3"""


@q("q292_gdpr_erasure_audit", _Q292_ORACLE)
def q292(spark: SparkSession, sf: str) -> DataFrame:
    """Right-to-erasure cascade audit (`operators/expectations.py:
    erasure_audit`): a deterministic erase cohort (c_custkey % 97 =
    3) is purged from customer (direct), orders (FK o_custkey), and
    events (FK user_id); the report counts purged/retained rows per
    table and PROVES zero residual references by recounting the
    post-purge frames (the reference's policy-pin discipline —
    verify, don't assert; SparkCore.scala:355-360).  The erase set is
    subject-sized, so every pass is a broadcast semi/anti-join riding
    one scan per table; the oracle recomputes the same partition
    with the residual pinned at its proven value."""
    from ..operators.expectations import erasure_audit

    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    events = load_table(spark, sf, "events")
    erase = customer.filter(F.col("c_custkey") % 97 == 3).select(
        F.col("c_custkey").alias("key")
    )
    return erasure_audit(
        {
            "customer": (customer, "c_custkey"),
            "orders": (orders, "o_custkey"),
            "events": (events, "user_id"),
        },
        erase,
    )


_Q296_ORACLE = """
  WITH base AS (
    SELECT event_type AS key,
           date_trunc('hour', ts) AS bar_ts,
           ts, event_id,
           CAST(floor(value * 1000000) AS BIGINT) AS v
    FROM events),
  ranked AS (
    SELECT key, bar_ts, v,
           row_number() OVER (PARTITION BY key, bar_ts
                              ORDER BY ts, event_id) AS rf,
           row_number() OVER (PARTITION BY key, bar_ts
                              ORDER BY ts DESC, event_id DESC) AS rl
    FROM base)
  SELECT key, strftime(bar_ts, '%Y-%m-%d %H:%M:%S') AS bar,
         CAST(max(CASE WHEN rf = 1 THEN v END) AS BIGINT) AS open_micro,
         CAST(max(v) AS BIGINT) AS high_micro,
         CAST(min(v) AS BIGINT) AS low_micro,
         CAST(max(CASE WHEN rl = 1 THEN v END) AS BIGINT) AS close_micro,
         CAST(count(*) AS BIGINT) AS n_ticks,
         CAST(sum(v) AS BIGINT) AS sum_micro
  FROM ranked GROUP BY key, bar_ts"""


@q("q296_ohlc_bars", _Q296_ORACLE)
def q296(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC bar compaction (`operators/timeseries.py: ohlc_bars`):
    per (event_type, hour) the open/high/low/close of `value` in
    exact micro-integers, tick count, and micro-sum — the tick-store
    primitive that turns a 100 TB event stream into a
    |keys x buckets|-sized frame every downstream rollup (EWMA q198,
    seasonal q229, TWAP q260) can afford to rescan.  Open/close pick
    row 1 of an ASC and a DESC (ts, event_id) window — the id
    tiebreak makes same-timestamp ticks deterministic; both windows
    and the final aggregate share one (key, bucket) shuffle."""
    from ..operators.timeseries import ohlc_bars

    ev = load_table(spark, sf, "events")
    bars = ohlc_bars(
        ev, "event_type", "ts", "event_id", "value", bucket="hour"
    )
    return bars.select(
        "key",
        F.date_format("bar_ts", "yyyy-MM-dd HH:mm:ss").alias("bar"),
        "open_micro",
        "high_micro",
        "low_micro",
        "close_micro",
        "n_ticks",
        "sum_micro",
    )


_Q297_ORACLE = """
  WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
  marked AS (
    SELECT user_id, day,
           min(day) OVER (PARTITION BY user_id) AS first_day,
           lag(day) OVER (PARTITION BY user_id ORDER BY day)
             AS prev_day
    FROM ud)
  SELECT day,
         CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
              AS BIGINT) AS new_users,
         CAST(sum(CASE WHEN day > first_day
                        AND day - prev_day > 14 THEN 1 ELSE 0 END)
              AS BIGINT) AS resurrected_users,
         CAST(sum(CASE WHEN day > first_day
                        AND day - prev_day <= 14 THEN 1 ELSE 0 END)
              AS BIGINT) AS returning_users
  FROM marked GROUP BY day"""


@q("q297_new_returning_resurrected", _Q297_ORACLE)
def q297(spark: SparkSession, sf: str) -> DataFrame:
    """Daily active-user decomposition into new / returning /
    resurrected (gap > 14 days) — the growth-accounting identity
    (DAU = new + retained + resurrected) that q280's cumulative
    uniques and q281's rolling actives don't decompose.  One distinct
    user-day pre-aggregate, then min + lag over a single
    user-partitioned sort (one shuffle, both windows share it) and a
    |days|-row rollup.  All integers."""
    ev = load_table(spark, sf, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("day")
    marked = ud.select(
        "day",
        F.min("day").over(w).alias("first_day"),
        F.lag("day").over(wo).alias("prev_day"),
    )
    gap = F.datediff(F.col("day"), F.col("prev_day"))
    return marked.groupBy("day").agg(
        F.sum((F.col("day") == F.col("first_day")).cast("long"))
        .cast("bigint")
        .alias("new_users"),
        F.sum(
            ((F.col("day") > F.col("first_day")) & (gap > 14)).cast(
                "long"
            )
        )
        .cast("bigint")
        .alias("resurrected_users"),
        F.sum(
            ((F.col("day") > F.col("first_day")) & (gap <= 14)).cast(
                "long"
            )
        )
        .cast("bigint")
        .alias("returning_users"),
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
    wd = Window.orderBy(
        F.col("s").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    d = scored.select("lab", F.ntile(10).over(wd).alias("decile"))
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
    li = load_table(spark, sf, "lineitem")
    pc = lambda p: F.expr(f"percentile(l_extendedprice, {p})")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(pc(0.25), 4).alias("p25_r"),
        F.round(pc(0.50), 4).alias("p50_r"),
        F.round(pc(0.75), 4).alias("p75_r"),
        F.round(pc(0.90), 4).alias("p90_r"),
        F.round(pc(0.75) - pc(0.25), 4).alias("iqr_r"),
    )


_Q305_ORACLE = """
  WITH docs AS (
    SELECT doc_id, text, length(text) AS n FROM documents),
  wins AS (
    SELECT doc_id, text,
           CAST(i AS INT) AS win_idx,
           CAST(i * 32 AS INT) AS off
    FROM docs, LATERAL UNNEST(
      generate_series(0, CAST(floor((n - 64) / 32.0) AS BIGINT))
    ) AS s(i)
    WHERE n >= 64),
  sliced AS (
    SELECT doc_id, win_idx, off,
           substring(text, off + 1, 64) AS sl
    FROM wins),
  energy AS (
    SELECT doc_id, win_idx, off,
           CAST(sum(ord(substring(sl, CAST(j AS INT) + 1, 1)))
                AS BIGINT) AS energy
    FROM sliced, LATERAL UNNEST(generate_series(0, 63)) AS b(j)
    GROUP BY 1, 2, 3)
  SELECT s.doc_id, s.win_idx, s.off AS offset,
         md5(s.sl) AS digest, e.energy
  FROM sliced s
  JOIN energy e
    ON s.doc_id = e.doc_id AND s.win_idx = e.win_idx"""


@q("q305_audio_window_features", _Q305_ORACLE)
def q305(spark: SparkSession, sf: str) -> DataFrame:
    """Audio-shaped OVERLAPPING window extraction
    (`operators/multimodal.py: extract_audio_windows`): 64-byte
    analysis windows advancing by a 32-byte hop (50% overlap — the
    STFT frame shape q265's disjoint video keyframes cannot express)
    over the opaque binary payload, emitting per-window md5 digest
    AND integer byte-sum energy — every output cell replays in ANSI
    SQL (substring+md5 for the digest, per-byte ord sum for the
    energy), so the whole Python boundary is value-hash-checked, not
    just row-counted.  One Arrow crossing per batch; output carries
    digests and longs, never samples; real decode stays env-gated
    behind decode_stub."""
    from ..operators.multimodal import (
        attach_fake_media,
        extract_audio_windows,
    )

    docs = load_table(spark, sf, "documents")
    media = attach_fake_media(docs)
    return extract_audio_windows(
        media, id_col="doc_id", window_bytes=64, hop_bytes=32
    )


# SPRT constants precomputed ONCE in Python (micro-units), inlined as
# literals into both engines' plans — the q290 no-libm-parity rule.
# H0: p = 0.45, H1: p = 0.55, alpha = 0.05, beta = 0.10:
#   success increment  ln(.55/.45)          ->  200671 micro
#   failure increment  ln(.45/.55)          -> -200671 micro
#   accept-H1 bound    ln((1-beta)/alpha)   -> 2890372 micro
#   accept-H0 bound    ln(beta/(1-alpha))   -> -2251292 micro
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

_Q308_ORACLE = """
  WITH iv AS (
    SELECT user_id, CAST(ts AS DATE) AS day, min(ts) AS s, max(ts) AS e
    FROM events GROUP BY user_id, CAST(ts AS DATE)),
  pts AS (
    SELECT day, s AS t, 1 AS is_start FROM iv
    UNION ALL
    SELECT day, e AS t, 0 AS is_start FROM iv),
  grp AS (
    SELECT day, t, sum(is_start) AS ns, sum(1 - is_start) AS ne
    FROM pts GROUP BY day, t),
  walked AS (
    SELECT day, t,
           sum(ns - ne) OVER (PARTITION BY day ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + ne AS pk
    FROM grp),
  best AS (SELECT day, max(pk) AS peak FROM walked GROUP BY day),
  ses AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sessions
          FROM iv GROUP BY day)
  SELECT b.day, CAST(b.peak AS BIGINT) AS peak_concurrency,
         strftime(min(w.t), '%Y-%m-%d %H:%M:%S') AS first_peak_ts,
         min(s2.n_sessions) AS n_sessions
  FROM best b
  JOIN walked w ON b.day = w.day AND w.pk = b.peak
  JOIN ses s2 ON s2.day = b.day
  GROUP BY b.day, b.peak"""


@q("q308_max_concurrency", _Q308_ORACLE)
def q308(spark: SparkSession, sf: str) -> DataFrame:
    """Sweep-line peak concurrency: each user's per-day activity span
    [min ts, max ts] becomes a +1/-1 delta stream; one day-partitioned
    sort gives the running occupancy, and the peak is read off the walk
    (starts processed before ends at equal stamps, so the candidate at
    t is cum(ns-ne)+ne).  This is the O(n log n) alternative to q270's
    interval-overlap JOIN: no pair blowup, the shuffle carries two rows
    per interval, and day partitioning keeps every walk independent —
    the sweep parallelizes over 365x more partitions at a year of
    100 TB logs."""
    ev = load_table(spark, sf, "events")
    iv = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    pk = peak_concurrency(iv, "day", "s", "e")
    return pk.select(
        "day",
        "peak_concurrency",
        _ts_str(F.col("first_peak_ts")).alias("first_peak_ts"),
        F.col("n_intervals").alias("n_sessions"),
    )


_Q309_ORACLE = """
  WITH mv AS (
    SELECT l_suppkey,
           CAST(l_quantity AS BIGINT)
             * (CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END) AS delta,
           l_shipdate, l_orderkey, l_linenumber
    FROM lineitem)
  SELECT l_suppkey,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list(delta ORDER BY l_shipdate, l_orderkey, l_linenumber)),
           (acc, x) -> greatest(acc + x, CAST(0 AS BIGINT)))
         AS BIGINT) AS final_balance,
         CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT)
           AS total_in,
         CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) AS BIGINT)
           AS total_out,
         CAST(count(*) AS BIGINT) AS n_moves
  FROM mv GROUP BY l_suppkey"""


@q("q309_clamped_running_balance", _Q309_ORACLE)
def q309(spark: SparkSession, sf: str) -> DataFrame:
    """Non-negative clamped stock fold per supplier: returns ('R')
    restock +qty, everything else ships -qty, and the balance folds as
    bal = greatest(bal + delta, 0) over the shipdate-ordered movement
    list.  The clamp makes this a genuine prefix recursion no window
    frame can express (each step depends on the clamped predecessor),
    so both engines run the same higher-order fold: Spark
    F.aggregate over a sort_array'd per-key list, DuckDB list_reduce —
    JVM-side codegen, no Python.  Per-key lists are bounded by a
    supplier's movement count (~600 at sf0.1); for unbounded keys the
    same fold streams through applyInPandas without changing the
    contract."""
    li = load_table(spark, sf, "lineitem")
    mv = li.select(
        "l_suppkey",
        (
            F.col("l_quantity").cast("bigint")
            * F.when(F.col("l_returnflag") == "R", 1).otherwise(-1)
        ).alias("delta"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    return clamped_running_balance(
        mv, "l_suppkey", "delta",
        ["l_shipdate", "l_orderkey", "l_linenumber"],
    )


_Q310_ORACLE = """
  WITH base AS (
    SELECT event_type, event_id % 2 AS shard,
           CAST(floor(value * 100) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL),
  sh AS (
    SELECT event_type, shard, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
    FROM base GROUP BY event_type, shard),
  two AS (
    SELECT event_type,
           max(CASE WHEN shard = 0 THEN n END) AS na,
           max(CASE WHEN shard = 0 THEN s END) AS sa,
           max(CASE WHEN shard = 0 THEN ss END) AS ssa,
           max(CASE WHEN shard = 1 THEN n END) AS nb,
           max(CASE WHEN shard = 1 THEN s END) AS sb,
           max(CASE WHEN shard = 1 THEN ss END) AS ssb
    FROM sh GROUP BY event_type),
  m AS (
    SELECT event_type, na, nb,
           CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
           CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na AS m2a,
           CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb AS m2b
    FROM two),
  merged AS (
    SELECT event_type, na + nb AS n,
           (na * ma + nb * mb) / (na + nb) AS mean_m,
           (m2a + m2b
             + (mb - ma) * (mb - ma) * na * nb / (na + nb)) / (na + nb)
             AS var_m
    FROM m),
  direct AS (
    SELECT event_type,
           (CAST(sum(v * v) AS DOUBLE)
             - CAST(sum(v) AS DOUBLE) * sum(v) / count(*)) / count(*)
             AS var_d
    FROM base GROUP BY event_type)
  SELECT mg.event_type, CAST(mg.n AS BIGINT) AS n,
         round(mg.mean_m / 100, 6) AS merged_mean_r,
         round(mg.var_m / 10000, 6) AS merged_var_r,
         round(d.var_d / 10000, 6) AS direct_var_r,
         (abs(mg.var_m - d.var_d) / greatest(d.var_d, 1e-9) < 1e-9)
           AS vars_agree
  FROM merged mg JOIN direct d ON mg.event_type = d.event_type"""


@q("q310_moment_merge_contract", _Q310_ORACLE)
def q310(spark: SparkSession, sf: str) -> DataFrame:
    """Chan/Welford moment-merge contract: per-shard (n, mean, M2)
    moments merged pairwise must equal the direct one-pass variance —
    the algebra that makes distributed variance a map-side partial
    aggregate (every executor emits 3 numbers, the combiner merges
    with delta^2*na*nb/n).  Values are fixed-pointed to cents so both
    shard and direct moments derive from EXACT integer sums, making
    the <1e-9 agreement flag deterministic across engines; emitting it
    as a column turns 'partial aggregation is safe for variance' into
    an oracle-checked assertion rather than a comment."""
    ev = load_table(spark, sf, "events")
    base = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        (F.col("event_id") % 2).alias("shard"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    sh = base.groupBy("event_type", "shard").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("ss"),
    )
    two = sh.groupBy("event_type").agg(
        F.max(F.when(F.col("shard") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("shard") == 0, F.col("s"))).alias("sa"),
        F.max(F.when(F.col("shard") == 0, F.col("ss"))).alias("ssa"),
        F.max(F.when(F.col("shard") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("shard") == 1, F.col("s"))).alias("sb"),
        F.max(F.when(F.col("shard") == 1, F.col("ss"))).alias("ssb"),
    )
    m = two.select(
        "event_type",
        "na",
        "nb",
        (F.col("sa").cast("double") / F.col("na")).alias("ma"),
        (F.col("sb").cast("double") / F.col("nb")).alias("mb"),
        (
            F.col("ssa").cast("double")
            - F.col("sa").cast("double") * F.col("sa") / F.col("na")
        ).alias("m2a"),
        (
            F.col("ssb").cast("double")
            - F.col("sb").cast("double") * F.col("sb") / F.col("nb")
        ).alias("m2b"),
    )
    merged = m.select(
        "event_type",
        (F.col("na") + F.col("nb")).alias("n"),
        (
            (F.col("na") * F.col("ma") + F.col("nb") * F.col("mb"))
            / (F.col("na") + F.col("nb"))
        ).alias("mean_m"),
        (
            (
                F.col("m2a")
                + F.col("m2b")
                + (F.col("mb") - F.col("ma"))
                * (F.col("mb") - F.col("ma"))
                * F.col("na")
                * F.col("nb")
                / (F.col("na") + F.col("nb"))
            )
            / (F.col("na") + F.col("nb"))
        ).alias("var_m"),
    )
    direct = base.groupBy("event_type").agg(
        (
            (
                F.sum(F.col("v") * F.col("v")).cast("double")
                - F.sum("v").cast("double") * F.sum("v") / F.count("*")
            )
            / F.count("*")
        ).alias("var_d")
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("mean_m") / 100, 6).alias("merged_mean_r"),
        F.round(F.col("var_m") / 10000, 6).alias("merged_var_r"),
        F.round(F.col("var_d") / 10000, 6).alias("direct_var_r"),
        (
            F.abs(F.col("var_m") - F.col("var_d"))
            / F.greatest(F.col("var_d"), F.lit(1e-9))
            < 1e-9
        ).alias("vars_agree"),
    )


_Q311_ORACLE = """
  WITH pts AS (
    SELECT c_custkey AS k,
           ((c_custkey * 48271) % 2147483647) % 10000 AS x,
           ((((c_custkey * 48271) % 2147483647) * 48271) % 2147483647)
             % 10000 AS y
    FROM customer),
  cells AS (SELECT k, x, y, x // 500 AS cx, y // 500 AS cy FROM pts),
  probes AS (
    SELECT k, x, y, cx + dx AS px, cy + dy AS py
    FROM cells
    CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) a
    CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) b),
  pairs AS (
    SELECT p.k AS k_a, c.k AS k_b,
           greatest(abs(p.x - c.x), abs(p.y - c.y)) AS linf
    FROM probes p JOIN cells c ON p.px = c.cx AND p.py = c.cy
    WHERE p.k < c.k
      AND abs(p.x - c.x) <= 250 AND abs(p.y - c.y) <= 250)
  SELECT CAST(linf // 50 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(min(linf) AS BIGINT) AS min_linf,
         CAST(max(linf) AS BIGINT) AS max_linf,
         CAST(count(DISTINCT k_a) AS BIGINT) AS n_left_pts,
         CAST(count(DISTINCT k_b) AS BIGINT) AS n_right_pts
  FROM pairs GROUP BY CAST(linf // 50 AS BIGINT)"""


@q("q311_grid_neighbor_join", _Q311_ORACLE)
def q311(spark: SparkSession, sf: str) -> DataFrame:
    """Grid-bucketed spatial neighbor join: customers get deterministic
    integer coordinates (two rounds of the Park-Miller Lehmer
    generator on the key — the q209/q243 hash-determinism contract;
    one LCG for BOTH axes would lattice-align the points and produce
    zero neighbors), are snapped to 500-unit grid cells, and each
    point probes its 3x3 cell neighborhood for L-inf neighbors within
    250.  Because radius <= cell size, every qualifying pair is found
    in exactly one probe cell and the join is a pure equi-join on
    (cell_x, cell_y) — the spatial analogue of the MinHash banding
    pattern (q54): candidate generation by bucket equality, exact
    distance refinement after.  At 100 TB the cell id is the shuffle
    key, density skew is handled the same way as hot shingles (cap or
    sub-split dense cells), and no cross join ever forms; the output
    is banded into distance histograms because raw pair emission in a
    fixed-density domain is Theta(n^2) rows by construction."""
    cust = load_table(spark, sf, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        (((F.col("c_custkey") * 48271) % 2147483647) % 10000).alias("x"),
        (
            (
                (((F.col("c_custkey") * 48271) % 2147483647) * 48271)
                % 2147483647
            )
            % 10000
        ).alias("y"),
    )
    cells = pts.select(
        "k", "x", "y",
        F.expr("x DIV 500").alias("cx"),
        F.expr("y DIV 500").alias("cy"),
    )
    probes = (
        cells.select(
            "*", F.explode(F.expr("array(-1, 0, 1)")).alias("dx")
        )
        .select("*", F.explode(F.expr("array(-1, 0, 1)")).alias("dy"))
        .select(
            "k", "x", "y",
            (F.col("cx") + F.col("dx")).alias("px"),
            (F.col("cy") + F.col("dy")).alias("py"),
        )
    )
    p, c = probes.alias("p"), cells.alias("c")
    pairs = (
        p.join(
            c,
            (F.col("p.px") == F.col("c.cx"))
            & (F.col("p.py") == F.col("c.cy")),
        )
        .where(
            (F.col("p.k") < F.col("c.k"))
            & (F.abs(F.col("p.x") - F.col("c.x")) <= 250)
            & (F.abs(F.col("p.y") - F.col("c.y")) <= 250)
        )
        .select(
            F.col("p.k").alias("k_a"),
            F.col("c.k").alias("k_b"),
            F.greatest(
                F.abs(F.col("p.x") - F.col("c.x")),
                F.abs(F.col("p.y") - F.col("c.y")),
            ).alias("linf"),
        )
    )
    return pairs.groupBy(
        F.expr("linf DIV 50").cast("bigint").alias("band")
    ).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.min("linf").cast("bigint").alias("min_linf"),
        F.max("linf").cast("bigint").alias("max_linf"),
        F.countDistinct("k_a").cast("bigint").alias("n_left_pts"),
        F.countDistinct("k_b").cast("bigint").alias("n_right_pts"),
    )


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
    met = rev.join(bal, "nk").select(
        "nk",
        "rev_c",
        (F.col("bal_c").cast("double") / F.col("ns")).alias("avgbal"),
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


_Q315_ORACLE = """
  WITH b AS (
    SELECT date_trunc('hour', min(ts)) AS h0,
           date_trunc('hour', max(ts)) AS h1
    FROM events),
  spine AS (
    SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
    FROM b),
  et AS (SELECT DISTINCT event_type FROM events),
  grid AS (SELECT e.event_type, s.hr FROM et e CROSS JOIN spine s),
  have AS (
    SELECT DISTINCT event_type, date_trunc('hour', ts) AS hr
    FROM events),
  miss AS (
    SELECT g.event_type, g.hr
    FROM grid g
    LEFT JOIN have h
      ON g.event_type = h.event_type AND g.hr = h.hr
    WHERE h.event_type IS NULL),
  isl AS (
    SELECT event_type, hr,
           CAST(epoch(hr) AS BIGINT) / 3600
             - row_number() OVER (PARTITION BY event_type ORDER BY hr)
             AS island
    FROM miss)
  SELECT event_type,
         strftime(min(hr), '%Y-%m-%d %H:%M:%S') AS gap_start,
         strftime(max(hr), '%Y-%m-%d %H:%M:%S') AS gap_end,
         CAST(count(*) AS BIGINT) AS gap_hours
  FROM isl GROUP BY event_type, island"""


@q("q315_calendar_gap_islands", _Q315_ORACLE)
def q315(spark: SparkSession, sf: str) -> DataFrame:
    """Telemetry-gap audit: generate the full hourly calendar spine
    between the first and last event, anti-join the hours each
    event_type actually reported, and collapse consecutive missing
    hours into (start, end, length) gap islands via the hour-index
    minus row-number trick.  The spine is |hours| x |types| rows —
    generated, never scanned — so the only data-sized work is one
    DISTINCT per (type, hour); the anti-join broadcasts the spine at
    any realistic calendar size.  Gaps-and-islands over the MISSING
    set is the monitoring complement of q277's activity streaks over
    the present set."""
    ev = load_table(spark, sf, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = b.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    et = ev.select("event_type").distinct()
    grid = et.crossJoin(spine)
    have = ev.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).distinct()
    miss = grid.join(have, ["event_type", "hr"], "left_anti")
    wisl = Window.partitionBy("event_type").orderBy("hr")
    isl = miss.select(
        "event_type",
        "hr",
        (
            F.col("hr").cast("long") / F.lit(3600)
        ).cast("bigint").alias("hnum"),
        F.row_number().over(wisl).alias("rn"),
    ).select(
        "event_type", "hr", (F.col("hnum") - F.col("rn")).alias("island")
    )
    return (
        isl.groupBy("event_type", "island")
        .agg(
            _ts_str(F.min("hr")).alias("gap_start"),
            _ts_str(F.max("hr")).alias("gap_end"),
            F.count("*").cast("bigint").alias("gap_hours"),
        )
        .select("event_type", "gap_start", "gap_end", "gap_hours")
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


_Q317_ORACLE = """
  WITH m AS (
    SELECT user_id,
           bit_or(CAST(1 AS BIGINT) << CAST(hour(ts) AS INT)) AS mask
    FROM events GROUP BY user_id),
  hrs AS (SELECT unnest(generate_series(0, 23)) AS h)
  SELECT CAST(hrs.h AS BIGINT) AS hour_of_day,
         CAST(sum((m.mask >> hrs.h) & 1) AS BIGINT) AS audience,
         CAST(sum(CASE WHEN m.mask = (CAST(1 AS BIGINT) << hrs.h)
                       THEN 1 ELSE 0 END) AS BIGINT)
           AS exclusive_audience,
         CAST(sum(CASE WHEN ((m.mask >> hrs.h) & 1) = 1
                       THEN bit_count(m.mask) ELSE 0 END) AS BIGINT)
           AS sum_active_hours
  FROM hrs CROSS JOIN m
  GROUP BY hrs.h"""


@q("q317_activity_bitmap", _Q317_ORACLE)
def q317(spark: SparkSession, sf: str) -> DataFrame:
    """Roaring-bitmap-style audience algebra: each user's hour-of-day
    activity collapses into ONE 24-bit BIGINT via bit_or(1 << hour) —
    the per-user state is 8 bytes regardless of event count, which is
    the whole trick behind bitmap audience engines.  Hourly audience,
    exclusive audience (mask == single bit), and the co-activity mass
    then come from shift/AND/popcount on the compacted mask table
    (|users| rows), never from re-scanning events.  At 100 TB the
    event scan is one partial-aggregated bit_or groupBy; every
    downstream audience question is O(|users|) integer ops —
    segment-intersection queries compose by ANDing masks without
    touching the fact table."""
    ev = load_table(spark, sf, "events")
    m = ev.groupBy("user_id").agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(hour(ts) AS INT)))"
        ).alias("mask")
    )
    hrs = spark.range(0, 24).select(F.col("id").cast("int").alias("h"))
    return (
        hrs.crossJoin(m)
        .groupBy(F.col("h").cast("bigint").alias("hour_of_day"))
        .agg(
            F.sum(F.expr("shiftright(mask, h) & 1"))
            .cast("bigint")
            .alias("audience"),
            F.sum(
                F.when(
                    F.col("mask")
                    == F.expr("shiftleft(CAST(1 AS BIGINT), h)"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("exclusive_audience"),
            F.sum(
                F.when(
                    F.expr("shiftright(mask, h) & 1") == 1,
                    F.expr("bit_count(mask)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("sum_active_hours"),
        )
    )


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
_Q321_ORACLE = """
  WITH RECURSIVE d0 AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) * 1000000 AS x
    FROM events GROUP BY event_type, CAST(ts AS DATE)),
  daily AS (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS rn
    FROM d0),
  nd AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
    FROM daily GROUP BY event_type),
  walk AS (
    SELECT d.event_type, d.rn AS i,
           (2 * d.x) // 10 AS l,
           (3 * ((2 * d.x) // 10)) // 10 AS b
    FROM daily d WHERE d.rn = 1
    UNION ALL
    SELECT w.event_type, w.i + 1,
           (2 * d.x + 8 * (w.l + w.b)) // 10,
           (3 * (((2 * d.x + 8 * (w.l + w.b)) // 10) - w.l)
             + 7 * w.b) // 10
    FROM walk w JOIN daily d
      ON d.event_type = w.event_type AND d.rn = w.i + 1)
  SELECT w.event_type, n.n_days,
         CAST(w.l AS BIGINT) AS level_micro,
         CAST(w.b AS BIGINT) AS trend_micro,
         CAST(w.l + w.b AS BIGINT) AS forecast_next_micro
  FROM walk w
  JOIN nd n ON w.event_type = n.event_type AND w.i = n.n_days"""


@q("q321_holt_linear_smoothing", _Q321_ORACLE)
def q321(spark: SparkSession, sf: str) -> DataFrame:
    """Holt double-exponential smoothing per event type over the daily
    count series — level AND trend state, so the one-step forecast
    follows a drifting series where single EWMA (q198) lags.  The
    recursion l' = alpha*x + (1-alpha)(l+b), b' = beta*(l'-l) +
    (1-beta)*b depends on the previous SMOOTHED state, not a window
    frame — like q309's clamp it is a genuine prefix recursion, run
    as a JVM higher-order fold over the date-sorted per-key list with
    a STRUCT accumulator (level, trend).  All arithmetic is micro-
    integer with truncating division (Spark DIV == DuckDB //,
    verified on negatives since trend goes negative), so the fold
    replays exactly; per-key lists are |days|-sized because the fold
    runs over the ROLLUP, not raw events."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg((F.count("*").cast("bigint") * 1000000).alias("x"))
    daily = daily.select(
        "event_type",
        F.unix_date(F.col("day")).cast("bigint").alias("d"),
        "x",
    )
    folded = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("x")))
        ).alias("series"),
    )
    # expr-based fold so the truncating DIV matches DuckDB's // exactly
    folded = folded.withColumn(
        "st",
        F.expr(
            """
            aggregate(
              transform(series, s -> named_struct('l', s.x,
                                                  'b', CAST(0 AS BIGINT))),
              named_struct('l', CAST(0 AS BIGINT),
                           'b', CAST(0 AS BIGINT)),
              (acc, e) -> named_struct(
                'l', (2 * e.l + 8 * (acc.l + acc.b)) DIV 10,
                'b', (3 * (((2 * e.l + 8 * (acc.l + acc.b)) DIV 10)
                           - acc.l) + 7 * acc.b) DIV 10))
            """
        ),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("st.l").cast("bigint").alias("level_micro"),
        F.col("st.b").cast("bigint").alias("trend_micro"),
        (F.col("st.l") + F.col("st.b"))
        .cast("bigint")
        .alias("forecast_next_micro"),
    )


_Q322_ORACLE = """
  WITH base AS (
    SELECT l_orderkey AS k, l_linenumber AS ln,
           l_returnflag AS v1, l_linestatus AS v2,
           strftime(l_shipdate, '%Y-%m-%d') AS v3
    FROM lineitem),
  w1 AS (SELECT v1 AS v, lag(v1) OVER win AS pv FROM base
         WINDOW win AS (PARTITION BY k ORDER BY ln, v1)),
  w2 AS (SELECT v2 AS v, lag(v2) OVER win AS pv FROM base
         WINDOW win AS (PARTITION BY k ORDER BY ln, v2)),
  w3 AS (SELECT v3 AS v, lag(v3) OVER win AS pv FROM base
         WINDOW win AS (PARTITION BY k ORDER BY ln, v3)),
  u AS (
    SELECT 'l_returnflag' AS col_name, v, pv FROM w1
    UNION ALL
    SELECT 'l_linestatus', v, pv FROM w2
    UNION ALL
    SELECT 'l_shipdate', v, pv FROM w3),
  agg AS (
    SELECT col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN pv IS NULL OR pv <> v THEN 1 ELSE 0 END)
                AS BIGINT) AS n_runs,
           CAST(sum(len(v)) AS BIGINT) AS value_bytes
    FROM u GROUP BY col_name)
  SELECT col_name, n_rows, n_distinct, n_runs, value_bytes,
         round(CAST(n_rows AS DOUBLE) / n_runs, 4) AS avg_run_len_r,
         CASE WHEN n_rows >= n_runs * 8 THEN 'rle'
              WHEN n_distinct * 16 <= n_rows THEN 'dict'
              ELSE 'plain' END AS best_encoding
  FROM agg"""


@q("q322_encoding_advisor", _Q322_ORACLE)
def q322(spark: SparkSession, sf: str) -> DataFrame:
    """Columnar-encoding advisor (the q105 z-order companion): per
    column, count value runs under the table's natural clustering
    (runs measured WITHIN each order's line group — the row-group
    granularity at which parquet encoders actually choose, so no
    global-sort window is needed), the distinct cardinality, and the
    raw value bytes, then pick RLE / dictionary / plain by the
    standard thresholds.  Run detection is a lag window over
    per-order micro-partitions (bounded fan-in, fully parallel);
    everything else is partial-aggregated counts.  This is how a
    100 TB pipeline decides sort keys: re-running the advisor under a
    candidate z-order and watching avg_run_len move is the cheap
    proxy for re-encoding the table."""
    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_returnflag").alias("v1"),
        F.col("l_linestatus").alias("v2"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("v3"),
    )
    parts = []
    for col_name, vc in (
        ("l_returnflag", "v1"),
        ("l_linestatus", "v2"),
        ("l_shipdate", "v3"),
    ):
        # (ln, value) tiebreak: the synthetic lineitem has duplicate
        # (orderkey, linenumber) pairs, and an ambiguous sort would
        # make the run count nondeterministic
        win = Window.partitionBy("k").orderBy("ln", vc)
        parts.append(
            base.select(
                F.lit(col_name).alias("col_name"),
                F.col(vc).alias("v"),
                F.lag(vc).over(win).alias("pv"),
            )
        )
    u = parts[0].unionAll(parts[1]).unionAll(parts[2])
    agg = u.groupBy("col_name").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("v").cast("bigint").alias("n_distinct"),
        F.sum(
            F.when(
                F.col("pv").isNull() | (F.col("pv") != F.col("v")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_runs"),
        F.sum(F.length("v")).cast("bigint").alias("value_bytes"),
    )
    return agg.select(
        "col_name",
        "n_rows",
        "n_distinct",
        "n_runs",
        "value_bytes",
        F.round(
            F.col("n_rows").cast("double") / F.col("n_runs"), 4
        ).alias("avg_run_len_r"),
        F.when(F.col("n_rows") >= F.col("n_runs") * 8, "rle")
        .when(F.col("n_distinct") * 16 <= F.col("n_rows"), "dict")
        .otherwise("plain")
        .alias("best_encoding"),
    )


# Snapshot B is a deterministic mutation of orders: rows with
# o_orderkey % 997 == 0 deleted, rows with o_orderkey % 499 == 0 get
# +1 cent — so the expected diff set is known and the oracle replays it.
_Q323_ORACLE = """
  WITH a AS (
    SELECT o_orderkey % 256 AS bucket,
           CAST(('0x' || substring(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR) || '|' || o_orderstatus), 1, 15))
             AS BIGINT) AS h
    FROM orders),
  b AS (
    SELECT o_orderkey % 256 AS bucket,
           CAST(('0x' || substring(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                    + CASE WHEN o_orderkey % 499 = 0 THEN 1 ELSE 0 END
                    AS VARCHAR) || '|' || o_orderstatus), 1, 15))
             AS BIGINT) AS h
    FROM orders WHERE o_orderkey % 997 <> 0),
  la AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rows_a,
                bit_xor(h) AS xa
         FROM a GROUP BY bucket),
  lb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rows_b,
                bit_xor(h) AS xb
         FROM b GROUP BY bucket),
  j AS (
    SELECT la.bucket, la.rows_a, la.xa, lb.rows_b, lb.xb,
           bit_xor(la.xa) OVER w AS sxa,
           bit_xor(lb.xb) OVER w AS sxb,
           sum(la.rows_a) OVER w AS sra,
           sum(lb.rows_b) OVER w AS srb
    FROM la LEFT JOIN lb ON la.bucket = lb.bucket
    WINDOW w AS (PARTITION BY la.bucket // 16))
  SELECT CAST(bucket AS BIGINT) AS bucket,
         rows_a, coalesce(rows_b, 0) AS rows_b,
         CASE WHEN xb IS NULL THEN 'missing'
              WHEN rows_a <> rows_b THEN 'row_count_drift'
              ELSE 'content_drift' END AS status
  FROM j
  WHERE (sxa IS DISTINCT FROM sxb OR sra IS DISTINCT FROM srb)
    AND (xb IS NULL OR rows_a <> rows_b OR xa <> xb)"""


@q("q323_merkle_bucket_diff", _Q323_ORACLE)
def q323(spark: SparkSession, sf: str) -> DataFrame:
    """Merkle-style anti-entropy diff between two table snapshots:
    row content hashes XOR-fold into 256 bucket digests (XOR is the
    order-independent, incrementally-updatable fold — one changed row
    flips its bucket), a 16-way super-bucket level is compared FIRST,
    and only differing super-buckets are drilled into — the two-level
    prune that lets replicas of a 100 TB table agree on "what
    changed" while exchanging KB of digests instead of re-reading
    either side (q248's single fingerprint says IF tables differ;
    this says WHERE).  Snapshot B is a deterministic in-query
    mutation (delete keys % 997, +1 cent on keys % 499), and the
    60-bit hex row hash parses identically in both engines
    (conv(hex,16,10) == CAST '0x' || hex), so the diff set is exact."""
    orders = load_table(spark, sf, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    def row_hash(cents_col):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        cents_col.cast("string"),
                        F.col("o_orderstatus"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
    a = orders.select(
        (F.col("o_orderkey") % 256).alias("bucket"),
        row_hash(cents).alias("h"),
    )
    b = orders.where(F.col("o_orderkey") % 997 != 0).select(
        (F.col("o_orderkey") % 256).alias("bucket"),
        row_hash(
            cents
            + F.when(F.col("o_orderkey") % 499 == 0, 1).otherwise(0)
        ).alias("h"),
    )
    la = a.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("rows_a"),
        F.expr("bit_xor(h)").alias("xa"),
    )
    lb = b.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("rows_b"),
        F.expr("bit_xor(h)").alias("xb"),
    )
    # super-bucket digests as a WINDOW over the single joined digest
    # table (a join-back would recompute both snapshot scans)
    w = Window.partitionBy(F.expr("bucket DIV 16"))
    j = la.join(lb, "bucket", "left").select(
        "bucket", "rows_a", "xa", "rows_b", "xb",
        F.expr("bit_xor(xa)").over(w).alias("sxa"),
        F.expr("bit_xor(xb)").over(w).alias("sxb"),
        F.sum("rows_a").over(w).alias("sra"),
        F.sum("rows_b").over(w).alias("srb"),
    )
    return (
        j.where(
            (
                ~F.col("sxa").eqNullSafe(F.col("sxb"))
                | ~F.col("sra").eqNullSafe(F.col("srb"))
            )
            & (
                F.col("xb").isNull()
                | (F.col("rows_a") != F.col("rows_b"))
                | (F.col("xa") != F.col("xb"))
            )
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "rows_a",
            F.coalesce(F.col("rows_b"), F.lit(0)).alias("rows_b"),
            F.when(F.col("xb").isNull(), "missing")
            .when(F.col("rows_a") != F.col("rows_b"), "row_count_drift")
            .otherwise("content_drift")
            .alias("status"),
        )
    )


_Q325_ORACLE = """
  WITH iv AS (
    SELECT user_id, CAST(ts AS DATE) AS day, min(ts) AS s, max(ts) AS e
    FROM events GROUP BY user_id, CAST(ts AS DATE)),
  pts AS (
    SELECT day, s AS t, 1 AS d FROM iv
    UNION ALL
    SELECT day, e AS t, -1 AS d FROM iv),
  grp AS (SELECT day, t, sum(d) AS net FROM pts GROUP BY day, t),
  walked AS (
    SELECT day, t,
           lead(t) OVER (PARTITION BY day ORDER BY t) AS nt,
           sum(net) OVER (PARTITION BY day ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS active
    FROM grp),
  cov AS (
    SELECT day,
           CAST(sum(CASE WHEN active > 0 AND nt IS NOT NULL
                         THEN epoch_us(nt) - epoch_us(t)
                         ELSE 0 END) AS BIGINT) AS covered_us
    FROM walked GROUP BY day),
  ni AS (SELECT day, CAST(count(*) AS BIGINT) AS n_intervals
         FROM iv GROUP BY day)
  SELECT c.day, c.covered_us, n.n_intervals,
         round(CAST(c.covered_us AS DOUBLE) / 86400000000, 6)
           AS day_utilization_r
  FROM cov c JOIN ni n ON c.day = n.day"""


@q("q325_interval_coverage", _Q325_ORACLE)
def q325(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-union coverage (uptime arithmetic): total seconds per
    day covered by AT LEAST ONE user session, from the same +1/-1
    sweep as q308 but integrating segment lengths where the running
    count is positive instead of taking the max — union length, peak
    occupancy, and q270's pairwise overlaps are three different
    questions over one sorted delta stream.  Exact integer
    microseconds end to end (unix_micros == epoch_us); O(n log n)
    with two rows per interval, day-partitioned."""
    ev = load_table(spark, sf, "events")
    iv = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    pts = iv.select(
        "day", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(iv.select("day", F.col("e").alias("t"), F.lit(-1)))
    grp = pts.groupBy("day", "t").agg(F.sum("d").alias("net"))
    wo = Window.partitionBy("day").orderBy("t")
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    walked = grp.select(
        "day",
        "t",
        F.lead("t").over(wo).alias("nt"),
        F.sum("net").over(wcum).alias("active"),
    )
    cov = walked.groupBy("day").agg(
        F.sum(
            F.when(
                (F.col("active") > 0) & F.col("nt").isNotNull(),
                F.unix_micros("nt") - F.unix_micros("t"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("covered_us")
    )
    ni = iv.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_intervals")
    )
    return cov.join(ni, "day").select(
        "day",
        "covered_us",
        "n_intervals",
        F.round(
            F.col("covered_us").cast("double") / 86400000000, 6
        ).alias("day_utilization_r"),
    )


_Q326_ORACLE = """
  WITH o AS (
    SELECT o_orderkey, epoch_us(o_orderdate) AS dus FROM orders),
  bounds AS (
    SELECT min(dus) AS lo, max(dus) AS hi FROM o),
  pred AS (
    SELECT lo + (hi - lo) * 2 // 5 AS p1,
           lo + (hi - lo) * 1 // 2 AS p2
    FROM bounds),
  la AS (
    SELECT o_orderkey // 64 AS b, min(dus) AS mn, max(dus) AS mx
    FROM o GROUP BY o_orderkey // 64),
  lb AS (
    SELECT (rn - 1) // 64 AS b, min(dus) AS mn, max(dus) AS mx
    FROM (SELECT dus,
                 row_number() OVER (ORDER BY dus, o_orderkey) AS rn
          FROM o)
    GROUP BY (rn - 1) // 64),
  ra AS (
    SELECT 'arrival' AS layout, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN mx < p.p1 OR mn > p.p2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned
    FROM la CROSS JOIN pred p),
  rb AS (
    SELECT 'date_sorted' AS layout, CAST(count(*) AS BIGINT)
             AS n_buckets,
           CAST(sum(CASE WHEN mx < p.p1 OR mn > p.p2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned
    FROM lb CROSS JOIN pred p)
  SELECT layout, n_buckets, n_pruned,
         round(CAST(n_pruned AS DOUBLE) / n_buckets, 6) AS prune_rate_r
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)"""


@q("q326_zonemap_prunability", _Q326_ORACLE)
def q326(spark: SparkSession, sf: str) -> DataFrame:
    """Zone-map (min/max data-skipping) prunability audit: bucket the
    orders table into 64-row "files" two ways — arrival order
    (key-range) vs date-sorted (row_number on the predicate column) —
    compute each file's [min, max] date envelope, and count how many
    files a middle-decile date predicate could SKIP without reading.
    This is the measurement behind every "sort your data by the
    filter column" recommendation: same rows, same predicate, the
    sorted layout's zone maps prune nearly everything while arrival
    order prunes almost nothing — q322 prices the ENCODING win of a
    layout, this prices the SCAN-SKIPPING win, and together they
    justify a 100 TB rewrite before it runs.  Predicate bounds derive
    from the data's own envelope in exact integer microseconds, so
    the report replays everywhere.  (The date-sorted global
    row_number is the audit's simulation of a sorted rewrite; the
    rewrite itself would use repartitionByRange, which is the
    distributed form of the same total order.)"""
    orders = load_table(spark, sf, "orders")
    o = orders.select(
        "o_orderkey", F.unix_micros("o_orderdate").alias("dus")
    )
    bounds = o.agg(
        F.min("dus").alias("lo"), F.max("dus").alias("hi")
    )
    pred = bounds.select(
        (F.col("lo") + F.expr("(hi - lo) * 2 DIV 5")).alias("p1"),
        (F.col("lo") + F.expr("(hi - lo) * 1 DIV 2")).alias("p2"),
    )
    la = o.groupBy(F.expr("o_orderkey DIV 64").alias("b")).agg(
        F.min("dus").alias("mn"), F.max("dus").alias("mx")
    )
    lb = (
        o.select(
            "dus",
            F.row_number()
            .over(Window.orderBy("dus", "o_orderkey"))
            .alias("rn"),
        )
        .groupBy(F.expr("(rn - 1) DIV 64").alias("b"))
        .agg(F.min("dus").alias("mn"), F.max("dus").alias("mx"))
    )

    def rate(bdf, label):
        return (
            bdf.crossJoin(pred)
            .agg(
                F.count("*").cast("bigint").alias("n_buckets"),
                F.sum(
                    F.when(
                        (F.col("mx") < F.col("p1"))
                        | (F.col("mn") > F.col("p2")),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("n_pruned"),
            )
            .select(
                F.lit(label).alias("layout"), "n_buckets", "n_pruned"
            )
        )

    out = rate(la, "arrival").unionAll(rate(lb, "date_sorted"))
    return out.select(
        "layout",
        "n_buckets",
        "n_pruned",
        F.round(
            F.col("n_pruned").cast("double") / F.col("n_buckets"), 6
        ).alias("prune_rate_r"),
    )


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


_Q329_ORACLE = """
  WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY event_type, CAST(ts AS DATE)),
  t AS (
    SELECT event_type, day, x,
           (CAST(epoch(CAST(day AS TIMESTAMP)) AS BIGINT) / 86400 + 3)
             % 7 AS dow,
           sum(x) OVER w AS s7, count(*) OVER w AS c7
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
  r AS (
    SELECT event_type, dow, 7 * x - s7 AS resid7
    FROM t WHERE c7 = 7)
  SELECT event_type, CAST(dow AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n_obs,
         CAST((1000 * sum(resid7)) // (7 * count(*)) AS BIGINT)
           AS seasonal_milli
  FROM r GROUP BY event_type, dow"""


@q("q329_seasonal_decomposition", _Q329_ORACLE)
def q329(spark: SparkSession, sf: str) -> DataFrame:
    """STL-lite additive decomposition of the daily count series:
    trend = centered 7-day moving average (full windows only),
    seasonal = mean detrended residual per day-of-week — unlike
    q229's ratio-to-overall-mean index, this detrends FIRST, so a
    growing series doesn't masquerade as seasonality.  Residuals stay
    exact by the 7x lift (7x - sum7 is integer; no average is ever
    materialized as a float), day-of-week is epoch-day arithmetic
    ((d+3) % 7, Monday=0) rather than engine dow() functions (Spark
    and DuckDB disagree on week origin), and the final milli-index is
    one truncating division.  Two windows + one rollup over the
    |types| x |days| frame."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    t = daily.select(
        "event_type",
        "x",
        ((F.unix_date(F.col("day")).cast("bigint") + 3) % 7).alias(
            "dow"
        ),
        F.sum("x").over(w).alias("s7"),
        F.count("*").over(w).alias("c7"),
    )
    r = t.where(F.col("c7") == 7).select(
        "event_type", "dow", (7 * F.col("x") - F.col("s7")).alias("resid7")
    )
    return (
        r.groupBy("event_type", "dow")
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.expr("(1000 * sum(resid7)) DIV (7 * count(*))")
            .cast("bigint")
            .alias("seasonal_milli"),
        )
        .select(
            "event_type",
            F.col("dow").cast("bigint").alias("dow"),
            "n_obs",
            "seasonal_milli",
        )
    )


