"""Time-series, interval, and sequence analytics (split of
tier_stats_ts, round 9): lagged correlation, seasonality and
smoothing, funnels/cohorts/retention, OHLC and concurrency, interval
algebra, calendar gap/islands, activity bitmaps.

Same playbook as the round-8 splits: registration order within the
former tier is preserved per family, all tier modules share the
`_shared` registry, and `queries()` / `oracle_sql()` stay the single
assembly points.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401
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
    # the session-interval table feeds BOTH sides of the overlap
    # self-join — un-materialized, the events scan+aggregate runs twice
    # (plus once more per explode side).  One user-day-sized reliable
    # checkpoint runs it once per call.
    from ..operators.materialize import pin as _pin
    s = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
        .transform(_pin)
    )
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
