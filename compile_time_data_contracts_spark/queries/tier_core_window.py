"""Window, event-time, sessionization, and trend analytics split
from tier_core_sql (round 10, same playbook as the round-8/9
splits): ranking/frame windows, tumbling/sliding/session
event-time windows, as-of/resample alignment, sessionization,
funnels, cohort retention, trend/anomaly/EWMA sequences.
Registration keys and oracle SQL unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401


@q(
    "q24_ranking_window",
    """SELECT o_custkey, o_orderkey, rn, rk, drk FROM (
         SELECT o_custkey, o_orderkey,
                CAST(row_number() OVER w AS INT) AS rn,
                CAST(rank() OVER w AS INT) AS rk,
                CAST(dense_rank() OVER w AS INT) AS drk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ) WHERE rn <= 3""",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


@q(
    "q25_lag_lead",
    """SELECT o_orderkey,
              round(lag(o_totalprice) OVER w, 2) AS prev_price,
              round(lead(o_totalprice) OVER w, 2) AS next_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@q(
    "q26_row_frames",
    """SELECT o_orderkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
              round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS slide_avg
       FROM orders""",
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slide = base.rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(run), 2).alias("run_sum"),
        F.round(F.avg("o_totalprice").over(slide), 4).alias("slide_avg"),
    )


@q(
    "q27_range_frame",
    """SELECT event_id,
              round(sum(value) OVER (PARTITION BY user_id
                    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS hour_sum
       FROM events""",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").withColumn(
        "epoch_s", F.unix_timestamp("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 4).alias("hour_sum")
    )


@q(
    "q29_topk_per_group",
    """SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rn FROM (
         SELECT p_brand, p_partkey, p_retailprice,
                CAST(row_number() OVER (PARTITION BY p_brand
                     ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rn
         FROM part
       ) WHERE rn <= 5""",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part")
    top = topk_per_group(
        p, ["p_brand"], [F.desc("p_retailprice"), F.col("p_partkey")], k=5
    )
    return top.select(
        "p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "rn"
    )


@q(
    "q41_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type, count(*) AS n, round(sum(value), 4) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            _ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@q(
    "q42_sliding_window",
    """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n
       FROM (
         SELECT TIMESTAMP '1970-01-01'
                + to_seconds(CAST(floor(epoch(ts)/900)*900 - j*900 AS BIGINT)) AS ws
         FROM events, LATERAL UNNEST(generate_series(0, 3)) AS t(j)
       ) GROUP BY ws""",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour window sliding every 15 minutes: each event lands in 4
    windows; the oracle enumerates the 4 aligned starts per event."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(_ts_str(F.col("w.start")).alias("window_start"), "n")
    )


@q(
    "q43_session_window",
    """WITH marked AS (
         SELECT user_id, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL 30 MINUTE
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS is_new
         FROM events
       ), sessions AS (
         SELECT user_id, ts,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM marked
       )
       SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              count(*) AS n_events
       FROM sessions GROUP BY user_id, session_id""",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows (30-min gap) per user via the built-in
    session_window; the oracle is the classic gaps-and-islands SQL."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            _ts_str(F.col("sw.start")).alias("session_start"),
            "n_events",
        )
    )


@q(
    "q71_asof_tolerance",
    """SELECT l.event_id,
              CASE WHEN r.ts >= l.ts - INTERVAL 2 HOUR
                   THEN strftime(r.ts, '%Y-%m-%d %H:%M:%S') END AS asof_ts_str
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts >= r.ts""",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join with a max-age tolerance (pandas merge_asof semantics):
    the latest purchase within 2 hours before each click, else null."""
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        tolerance="2 hours",
    )
    return joined.select(
        "event_id", _ts_str(F.col("asof_ts")).alias("asof_ts_str")
    )


@q(
    "q74_resample_ffill",
    """WITH obs AS (
         SELECT user_id, ts, max(value) AS value
         FROM events WHERE user_id < 50 GROUP BY user_id, ts
       ), bounds AS (
         SELECT user_id,
                date_trunc('hour', min(ts)) AS lo,
                date_trunc('hour', max(ts)) AS hi
         FROM obs GROUP BY user_id
       ), grid AS (
         SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts
         FROM bounds
       )
       SELECT g.user_id,
              strftime(g.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
              round(o.value, 6) AS v_ffill
       FROM grid g
       ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.ts >= o.ts""",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly resample + forward-fill of event values per user (bounded
    to 50 users to keep the grid small at test SFs)."""
    from ..operators.timeseries import resample_ffill

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    out = resample_ffill(ev, "user_id", "ts", "value", "1 hour")
    return out.select(
        "user_id",
        _ts_str(F.col("ts")).alias("ts_str"),
        F.round("value_ffill", 6).alias("v_ffill"),
    )


@q(
    "q75_window_analytics",
    """SELECT o_orderkey,
              ntile(4) OVER w AS quartile,
              round(percent_rank() OVER w, 6) AS pct_rank,
              round(cume_dist() OVER w, 6) AS cdist,
              first_value(o_orderkey) OVER w AS first_key,
              last_value(o_orderkey)
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS last_key
       FROM orders
       WHERE o_custkey < 200
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-analytic window functions: ntile / percent_rank /
    cume_dist / first_value / last_value (last_value needs the full-
    partition frame — the default frame ends at CURRENT ROW)."""
    o = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@q(
    "q104_resample_interp",
    """WITH obs AS (
         SELECT user_id, ts, CAST(max(value) AS DOUBLE) AS v
         FROM events WHERE user_id < 50 GROUP BY user_id, ts
       ), bounds AS (
         SELECT user_id,
                date_trunc('hour', min(ts)) AS lo,
                date_trunc('hour', max(ts)) AS hi
         FROM obs GROUP BY user_id
       ), grid AS (
         SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts
         FROM bounds
       ), u AS (
         SELECT user_id, ts, NULL::DOUBLE AS v, 1 AS is_grid FROM grid
         UNION ALL
         SELECT user_id, ts, v, 0 AS is_grid FROM obs
       ), w AS (
         SELECT *,
           last_value(v IGNORE NULLS) OVER wp AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
             OVER wp AS pt,
           first_value(v IGNORE NULLS) OVER wn AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
             OVER wn AS nt
         FROM u
         WINDOW wp AS (PARTITION BY user_id ORDER BY ts, is_grid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                wn AS (PARTITION BY user_id ORDER BY ts, is_grid
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       )
       SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
              round(CASE
                      WHEN pt IS NULL OR (nt IS NULL AND pt <> ts) THEN NULL
                      WHEN pt = ts THEN pv
                      ELSE pv + (epoch(ts) - epoch(pt))
                                / (epoch(nt) - epoch(pt)) * (nv - pv)
                    END, 4) AS v_interp_r
       FROM w WHERE is_grid = 1""",
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation per user (bounded to
    50 users at test SFs): one grid+obs union, one window partitioning
    computes both brackets (prev/next value+ts), single shuffle — no
    self-join, no second as-of pass."""
    from ..operators.timeseries import resample_interp

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    out = resample_interp(ev, "user_id", "ts", "value", "1 hour")
    return out.select(
        "user_id",
        _ts_str(F.col("ts")).alias("ts_str"),
        F.round("value_interp", 4).alias("v_interp_r"),
    )


@q(
    "q108_asof_forward",
    """SELECT l.event_id, strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS next_ts_str,
              round(r.value, 6) AS next_value_r
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts <= r.ts""",
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of join (merge_asof direction='forward'): for each
    click, the EARLIEST purchase by the same user at or after it — the
    attribution/conversion-lookahead query.  Same single-shuffle
    union-marker plan as q15 with the frame and equal-ts side mirrored."""
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], direction="forward",
    )
    return joined.select(
        "event_id",
        _ts_str(F.col("asof_ts")).alias("next_ts_str"),
        F.round("asof_value", 6).alias("next_value_r"),
    )


@q(
    "q113_sessionize_ids",
    """WITH marked AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), numbered AS (
         SELECT user_id, ts,
                CAST(sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS INT) AS session_idx
         FROM marked
       )
       SELECT user_id, session_idx,
              CAST(count(*) AS BIGINT) AS n_events,
              round(epoch(max(ts)) - epoch(min(ts)), 2) AS duration_r
       FROM numbered GROUP BY user_id, session_idx""",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands sessionization with EXPLICIT session ids (the
    form downstream joins need, vs q43's session_window aggregate):
    a 30-min-gap marker via lag, island id via running sum — both
    windows AND the final per-session aggregate ride one user_id
    partitioning, so the whole thing is plan-audited to two exchanges."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("__new_s"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        F.sum("__new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("session_idx"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.max(F.col("ts").cast("double"))
            - F.min(F.col("ts").cast("double")),
            2,
        ).alias("duration_r"),
    )


@q(
    "q117_funnel_analysis",
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t_click
                  FROM events e JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click' AND e.ts > v.t_view
                    AND e.ts <= v.t_view + INTERVAL 24 HOUR
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t_purchase
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                    AND e.ts <= c.t_click + INTERVAL 24 HOUR
                  GROUP BY e.user_id),
            d AS (SELECT v.user_id,
                         CASE WHEN p.user_id IS NOT NULL THEN 3
                              WHEN c.user_id IS NOT NULL THEN 2
                              ELSE 1 END AS depth
                  FROM v LEFT JOIN c ON v.user_id = c.user_id
                         LEFT JOIN p ON v.user_id = p.user_id)
       SELECT depth, CAST(count(*) AS BIGINT) AS n_users
       FROM d GROUP BY depth""",
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per user, the click
    must follow the first view within 24 hours and the purchase must
    follow that first qualifying click within 24 hours (the conversion
    window keeps the funnel discriminating on a dense event stream).  Three stages of (filter -> per-user min) with the
    previous stage's (user, ts) joined back in — each stage's join key
    is user_id, so all three reuse one hash partitioning; no window
    sort, state is one timestamp per user per stage.  The batch shape of
    what applyInPandasWithState computes incrementally (q84)."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    day = F.expr("INTERVAL 24 HOURS")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    depth = (
        v.join(c.select("user_id", F.lit(1).alias("__c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("__p")), "user_id", "left")
        .select(
            F.when(F.col("__p").isNotNull(), 3)
            .when(F.col("__c").isNotNull(), 2)
            .otherwise(1)
            .alias("depth")
        )
    )
    return depth.groupBy("depth").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


@q(
    "q153_cohort_retention",
    """WITH first AS (
         SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
         FROM events GROUP BY user_id
       ), act AS (
         SELECT DISTINCT user_id, date_trunc('week', ts) AS act_wk
         FROM events
       ), sizes AS (
         SELECT cohort_wk, count(*) AS cohort_n FROM first GROUP BY cohort_wk
       ), j AS (
         SELECT f.cohort_wk,
                CAST(date_diff('day', f.cohort_wk, a.act_wk) / 7 AS INT)
                  AS week_offset,
                a.user_id
         FROM act a JOIN first f USING (user_id)
       )
       SELECT strftime(j.cohort_wk, '%Y-%m-%d') AS cohort_week,
              j.week_offset,
              CAST(count(*) AS BIGINT) AS n_active,
              round(count(*)::DOUBLE / any_value(s.cohort_n), 6)
                AS retention_r
       FROM j JOIN sizes s ON s.cohort_wk = j.cohort_wk
       GROUP BY j.cohort_wk, j.week_offset""",
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users cohorted by first-activity week, then
    per (cohort, week-offset) active-user counts and retention rate.
    Two map-side-combined aggregates (first-week per user; distinct
    user-weeks) joined on user_id; the cohort SIZE is recovered from
    the aggregated result itself (offset-0 actives == cohort size by
    definition, via a window over the tiny rollup) instead of a third
    events scan + join.  The canonical product-analytics rollup."""
    ev = load_table(spark, sf, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_wk")
    ).distinct()
    j = act.join(first, "user_id").select(
        "cohort_wk",
        (F.datediff(F.col("act_wk"), F.col("cohort_wk")) / 7)
        .cast("int")
        .alias("week_offset"),
    )
    agg = j.groupBy("cohort_wk", "week_offset").agg(
        F.count("*").cast("bigint").alias("n_active")
    )
    w = Window.partitionBy("cohort_wk").orderBy("week_offset")
    return agg.select(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        F.round(
            F.col("n_active") / F.first("n_active").over(w), 6
        ).alias("retention_r"),
    )


@q(
    "q163_regression_trend",
    """WITH mn AS (SELECT min(epoch(ts)) AS t0 FROM events),
       s AS (SELECT event_type, (epoch(ts) - mn.t0) / 86400.0 AS x,
                    value AS y FROM events, mn)
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n,
              round(regr_slope(y, x), 6) AS slope_r,
              round(regr_intercept(y, x), 6) AS intercept_r,
              round(corr(y, x) * corr(y, x), 6) AS r2_r
       FROM s GROUP BY event_type""",
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group least-squares trend with the NATIVE regression
    aggregates (`regr_slope` / `regr_intercept`, Spark 3.5+): daily
    drift of event value per event type, with r² from corr.  These are
    single-pass streaming aggregates (sum/sum-of-products moments) with
    full map-side partial combine — the shuffle carries one moment
    tuple per (partition, event_type), so a 100 TB trend scan costs
    exactly one pass and a |groups|-row shuffle.  x is centered on the
    global min timestamp (1-row broadcast) and scaled to days so the
    slope is a human-sized number that rounds stably across engines."""
    load_table(spark, sf, "events").createOrReplaceTempView("q163_events")
    return spark.sql(
        """WITH mn AS (SELECT min(unix_micros(CAST(ts AS TIMESTAMP)) / 1e6)
                         AS t0 FROM q163_events),
           s AS (SELECT event_type,
                        (unix_micros(CAST(ts AS TIMESTAMP)) / 1e6 - mn.t0)
                          / 86400.0 AS x,
                        value AS y FROM q163_events, mn)
           SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n,
                  round(regr_slope(y, x), 6) AS slope_r,
                  round(regr_intercept(y, x), 6) AS intercept_r,
                  round(corr(y, x) * corr(y, x), 6) AS r2_r
           FROM s GROUP BY event_type"""
    )


_Q169_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type, value,
         avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS mu,
         stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS sd,
         count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS nw
  FROM {events}
), z AS (
  SELECT event_type,
         CASE WHEN nw >= 5 AND sd > 1e-12
              THEN abs(value - mu) / sd END AS zscore
  FROM w
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN zscore > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies,
       round(max(zscore), 6) AS max_z_r
FROM z WHERE zscore IS NOT NULL GROUP BY event_type
"""


@q("q169_anomaly_zscore", _Q169_SQL.format(events="events"))
def q169(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-window z-score anomaly detection: each event scored
    against ITS OWN USER's previous <=20 values (exclusive frame, so
    the anomaly can't suppress itself; warm-up below 5 priors and
    zero-variance windows abstain rather than emit infinities).  One
    shuffle on user_id serves all three window aggregates — the frames
    share a (user, time) sort — then a map-combined rollup per event
    type.  This is the streaming-monitor shape run retrospectively;
    the q84/q167 state-store path is the online twin.  stddev_samp and
    the frame arithmetic are IEEE-identical across engines, so the
    oracle reproduces scores exactly."""
    load_table(spark, sf, "events").createOrReplaceTempView("q169_events")
    return spark.sql(_Q169_SQL.format(events="q169_events"))


_Q170_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
              OR CAST(ts AS TIMESTAMP)
                 - CAST(lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS TIMESTAMP)
                 > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM {events}
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM ordered
), trans AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS dst_type
  FROM sess
)
SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
FROM trans WHERE dst_type IS NOT NULL
GROUP BY src_type, dst_type
ORDER BY n DESC, src_type, dst_type LIMIT 10
"""


@q("q170_session_transitions", _Q170_SQL.format(events="events"))
def q170(spark: SparkSession, sf: str) -> DataFrame:
    """Session transition mining: 30-minute-gap sessionization (the
    q113 gaps-and-islands machinery) followed by within-session
    event-type bigrams, reporting the 10 most common transitions —
    the \"what do users do next\" funnel-discovery query.  The lag
    (session boundary), running session id, and lead (next event) all
    ride ONE (user, time)-sorted shuffle; the transition rollup is
    map-combined |types|^2 rows, and the global top-10 is a
    TakeOrdered, not a full sort.  Ties broken lexically so the limit
    is deterministic in any engine."""
    load_table(spark, sf, "events").createOrReplaceTempView("q170_events")
    return spark.sql(_Q170_SQL.format(events="q170_events"))


_Q198_ORACLE = """
WITH t AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events WHERE value IS NOT NULL
)
SELECT a.user_id, a.event_id,
       round(sum(b.value * pow(0.9, a.rn - b.rn))
             / sum(pow(0.9, a.rn - b.rn)), 4) AS ewma
FROM t a JOIN t b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
GROUP BY a.user_id, a.event_id
"""


@q("q198_ewma_trailing", _Q198_ORACLE)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-window EWMA per user over the events series
    (`operators/timeseries.py: ewma_trailing`): the time-decayed feature
    every telemetry/quality pipeline computes, expressed as ONE
    sort-based window on the user_id exchange — collect_list over an
    8-row frame, zip_with a descending lag sequence for the weights,
    closed-form geometric normalizer; all codegen, no join, no Python,
    state bounded by the frame.  The oracle computes the identical
    truncated-adjusted EWMA as a bounded rank self-join — quadratic in
    the window width, which is exactly why the window form is the scale
    path."""
    from ..operators.timeseries import ewma_trailing

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    return ewma_trailing(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.1, window=8
    ).select("user_id", "event_id", "ewma")
