"""Core relational/SQL surface: scans, joins, aggregates, windows, set ops,
subqueries, SQL functions, optimizer demos, Python-boundary UDFs, and the
flagship star join.

Split from the original single-module inventory (round 5); registration
order within a tier is preserved, and all modules share the `_shared`
registry so `queries()` / `oracle_sql()` stay the single assembly point.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401
from ..operators.stats import gini_best_split, mann_whitney_u
from ..operators.timeseries import clamped_running_balance, peak_concurrency


# =========================================================================
# Projection / filter / predicates (Q05-Q07)
# =========================================================================

@q(
    "q05_projection",
    """SELECT l_orderkey, l_linenumber,
              round(l_extendedprice * (1 - l_discount), 2) AS revenue
       FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@q(
    "q06_predicates",
    """SELECT count(*) AS n FROM orders
       WHERE o_orderstatus = 'O'
         AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
         AND o_orderpriority IN ('1-URGENT', '2-HIGH')
         AND (o_totalprice > 50000 OR o_orderpriority LIKE '1-%')
         AND o_custkey IS NOT NULL""",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderdate").between("1996-01-01", "1998-12-31")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ((F.col("o_totalprice") > 50000) | F.col("o_orderpriority").like("1-%"))
        & F.col("o_custkey").isNotNull()
    ).agg(F.count("*").alias("n"))


@q(
    "q07_case_when",
    """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                   WHEN c_acctbal < 3000 THEN 'low'
                   WHEN c_acctbal < 7000 THEN 'mid'
                   ELSE 'high' END AS band,
              count(*) AS n
       FROM customer GROUP BY band""",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return c.groupBy(band.alias("band")).agg(F.count("*").alias("n"))


# =========================================================================
# Joins (Q08-Q16)
# =========================================================================

@q(
    "q08_inner_join",
    """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM customer JOIN orders ON c_custkey = o_custkey""",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "inner").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@q(
    "q09_join5_revenue_by_nation",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM region
       JOIN nation   ON n_regionkey = r_regionkey
       JOIN customer ON c_nationkey = n_nationkey
       JOIN orders   ON o_custkey = c_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE r_name IN ('ASIA', 'EUROPE')
       GROUP BY n_name""",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    """5-way star join.  region/nation/customer are small dims: Spark's
    AQE broadcasts them automatically; the only real shuffle is
    orders⋈lineitem on orderkey."""
    r = load_table(spark, sf, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@q(
    "q10_outer_join",
    """SELECT count(*) AS n_rows,
              CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_no_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey""",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_no_orders"),
    )


@q(
    "q11_semi_join",
    """SELECT count(*) AS n FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("n")
    )


@q(
    "q12_anti_join",
    """SELECT count(*) AS n FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count("*").alias("n")
    )


@q(
    "q13_broadcast_join",
    """SELECT p_brand, count(*) AS n, round(avg(l_quantity), 4) AS avg_qty
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand""",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    """part is the small dimension: explicit F.broadcast removes the
    shuffle on the lineitem side entirely."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.round(F.avg("l_quantity"), 4).alias("avg_qty"))
    )


@q(
    "q14_theta_self_join",
    """SELECT count(*) AS n
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber""",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    """Equi + range self-join: Spark plans the equi part as the join key
    (one shuffle) with the range predicate as a post-join filter — NOT a
    cartesian product."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    a, b = li.alias("a"), li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).agg(F.count("*").alias("n"))


@q(
    "q15_asof_join",
    """SELECT l.event_id, strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts_str
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts >= r.ts""",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each click, the latest purchase by the same user at
    or before the click (union-marker + single window, see operators/asof)."""
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id", _ts_str(F.col("asof_ts")).alias("asof_ts_str")
    )


@q("q16_cross_join", "SELECT count(*) AS n FROM region CROSS JOIN nation")
def q16(spark: SparkSession, sf: str) -> DataFrame:
    r = load_table(spark, sf, "region")
    n = load_table(spark, sf, "nation")
    return r.crossJoin(n).agg(F.count("*").alias("n"))


# =========================================================================
# Aggregations (Q17-Q23)
# =========================================================================

@q(
    "q17_groupagg_tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_extendedprice), 4) AS avg_price,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@q(
    "q18_count_distinct",
    "SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n FROM orders",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("n"))


@q(
    "q19_approx_count_distinct",
    # the sketch value itself is engine-specific; what IS checkable is the
    # sketch's contract — within rsd of the exact count (SURVEY §2.2 Q19:
    # "checked vs exact within rsd, not hash-matched")
    """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
              TRUE AS within_rsd
       FROM orders""",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    agg = o.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("__approx"),
    )
    # 3*rsd tolerance: the estimator's error is approximately normal with
    # std = rsd, so 3 sigma bounds false-failures at ~0.3%
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("__approx") - F.col("n_exact"))
            <= 3 * 0.05 * F.col("n_exact")
        ).alias("within_rsd"),
    )


@q(
    "q20_rollup",
    """SELECT r_name, n_name, count(*) AS n
       FROM region JOIN nation ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)""",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    r = load_table(spark, sf, "region")
    n = load_table(spark, sf, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n"))
    )


@q(
    "q21_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@q(
    "q22_having",
    """SELECT c_nationkey, count(*) AS n_customers
       FROM customer GROUP BY c_nationkey HAVING count(*) > 3""",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") > 3)
    )


@q(
    "q23_stats",
    """SELECT round(min(l_quantity), 2) AS min_qty,
              round(max(l_quantity), 2) AS max_qty,
              round(stddev_samp(l_quantity), 6) AS std_qty,
              round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
              round(quantile_cont(l_quantity, 0.95), 6) AS p95_qty
       FROM lineitem""",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.stddev("l_quantity"), 6).alias("std_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.95)), 6).alias("p95_qty"),
    )


# =========================================================================
# Window functions (Q24-Q27)
# =========================================================================

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


# =========================================================================
# Sorts / limits / top-k (Q28-Q29)
# =========================================================================

@q(
    "q28_global_sort",
    """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
       FROM customer
       ORDER BY c_mktsegment ASC NULLS LAST, c_acctbal DESC NULLS LAST, c_custkey
       LIMIT 100""",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    return (
        c.select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy(
            F.asc_nulls_last("c_mktsegment"),
            F.desc_nulls_last("acctbal"),
            F.col("c_custkey"),
        )
        .limit(100)
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


# =========================================================================
# Set operations (Q30-Q31)
# =========================================================================

@q(
    "q30_union",
    """SELECT count(*) AS n_all, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct
       FROM (
         SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         UNION ALL
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       )""",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.unionAll(b).agg(
        F.count("*").alias("n_all"),
        F.countDistinct("c_custkey").alias("n_distinct"),
    )


@q(
    "q31_intersect_except",
    """SELECT
         (SELECT count(*) FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS n_intersect,
         (SELECT count(*) FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS n_except""",
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    n_i = open_.intersect(done).agg(F.count("*").alias("n_intersect"))
    n_e = open_.subtract(done).agg(F.count("*").alias("n_except"))
    return n_i.crossJoin(n_e)


# =========================================================================
# Scalar functions (Q32-Q38)
# =========================================================================

@q(
    "q32_string_funcs",
    """SELECT p_partkey,
              upper(p_name) AS up, lower(p_brand) AS lo,
              substring(p_name, 1, 8) AS sub,
              CAST(length(p_name) AS INT) AS len,
              trim(p_name) AS trimmed,
              lpad(p_brand, 12, '#') AS padded,
              concat_ws('-', p_brand, p_type) AS joined,
              regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
              regexp_replace(p_name, ' ', '_') AS underscored,
              string_split(p_name, ' ')[1] AS tok0
       FROM part ORDER BY p_partkey LIMIT 500""",
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("up"),
            F.lower("p_brand").alias("lo"),
            F.substring("p_name", 1, 8).alias("sub"),
            F.length("p_name").alias("len"),
            F.trim("p_name").alias("trimmed"),
            F.lpad("p_brand", 12, "#").alias("padded"),
            F.concat_ws("-", "p_brand", "p_type").alias("joined"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.regexp_replace("p_name", " ", "_").alias("underscored"),
            F.split(F.col("p_name"), " ")[0].alias("tok0"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@q(
    "q33_date_funcs",
    """SELECT o_orderkey,
              CAST(year(o_orderdate) AS INT) AS y,
              CAST(month(o_orderdate) AS INT) AS m,
              CAST(day(o_orderdate) AS INT) AS d,
              CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
              CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
              strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
              CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
       FROM orders ORDER BY o_orderkey LIMIT 500""",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
                "days_since"
            ),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@q(
    "q34_math_funcs",
    """SELECT l_orderkey, l_linenumber,
              round(l_extendedprice, 2) AS rounded,
              CAST(floor(l_extendedprice) AS BIGINT) AS floored,
              CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
              round(abs(l_discount - 0.05), 6) AS abs_disc,
              round(power(l_quantity, 2), 4) AS qty_sq,
              round(ln(l_extendedprice), 6) AS log_price,
              round(exp(l_discount), 6) AS exp_disc,
              round(sqrt(l_quantity), 6) AS sqrt_qty
       FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("rounded"),
            F.floor("l_extendedprice").alias("floored"),
            F.ceil("l_extendedprice").alias("ceiled"),
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
            F.round(F.log("l_extendedprice"), 6).alias("log_price"),
            F.round(F.exp("l_discount"), 6).alias("exp_disc"),
            F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


@q(
    "q35_array_funcs",
    """SELECT p_partkey,
              CAST(len(toks) AS INT) AS n_tokens,
              CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
              list_contains(toks, 'green') AS has_green,
              array_to_string(list_sort(toks), ',') AS sorted_toks,
              array_to_string(toks[1:2], ',') AS first_two
       FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
       ORDER BY p_partkey LIMIT 500""",
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").withColumn("toks", F.split("p_name", " "))
    return (
        p.select(
            "p_partkey",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_distinct"),
            F.array_contains("toks", "green").alias("has_green"),
            F.concat_ws(",", F.sort_array("toks")).alias("sorted_toks"),
            F.concat_ws(",", F.slice("toks", 1, 2)).alias("first_two"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@q(
    "q36_map_funcs",
    """SELECT p_partkey, p_brand AS brand_from_map, p_type AS type_from_map,
              CAST(2 AS INT) AS n_keys, 'brand,type' AS keys_str
       FROM part ORDER BY p_partkey LIMIT 500""",
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    """Builds a real map column Spark-side (map_from_arrays/map_keys/
    element_at); the oracle states the trivially-known expected values."""
    p = load_table(spark, sf, "part").withColumn(
        "attrs",
        F.map_from_arrays(
            F.array(F.lit("brand"), F.lit("type")),
            F.array(F.col("p_brand"), F.col("p_type")),
        ),
    )
    return (
        p.select(
            "p_partkey",
            F.element_at("attrs", "brand").alias("brand_from_map"),
            F.element_at("attrs", "type").alias("type_from_map"),
            F.size("attrs").alias("n_keys"),
            F.concat_ws(",", F.sort_array(F.map_keys("attrs"))).alias("keys_str"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@q(
    "q37_json_funcs",
    """SELECT event_id,
              json_extract_string(props, '$.k') AS k_str,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
              CAST(json_object('k', CAST(json_extract_string(props, '$.k') AS INT))
                   AS VARCHAR) AS k_json
       FROM events
       WHERE json_extract_string(props, '$.k') IS NOT NULL""",
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    k_int = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            k_int.alias("k_int"),
            F.to_json(F.struct(k_int.alias("k"))).alias("k_json"),
        )
        .filter(F.col("k_str").isNotNull())
    )


@q(
    "q38_conditional_funcs",
    """SELECT c_custkey,
              coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS segment,
              round(greatest(c_acctbal, 0.0), 2) AS pos_bal,
              round(least(c_acctbal, 1000.0), 2) AS capped_bal
       FROM customer""",
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(redacted)")
        ).alias("segment"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("pos_bal"),
        F.round(F.least("c_acctbal", F.lit(1000.0)), 2).alias("capped_bal"),
    )


# =========================================================================
# Subqueries (Q39-Q40)
# =========================================================================

@q(
    "q39_scalar_subquery",
    """SELECT count(*) AS n FROM orders
       WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""",
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    avg_df = o.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "q40_exists_subquery",
    """SELECT count(*) AS n FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 100000)""",
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS through spark.sql — Catalyst decorrelates to a
    semi join."""
    load_table(spark, sf, "customer").createOrReplaceTempView("ctdc_customer")
    load_table(spark, sf, "orders").createOrReplaceTempView("ctdc_orders")
    return spark.sql(
        """SELECT count(*) AS n FROM ctdc_customer
           WHERE EXISTS (SELECT 1 FROM ctdc_orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 100000)"""
    )


# =========================================================================
# Event-time windows (Q41-Q44)
# =========================================================================

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


# =========================================================================
# UDF / UDAF / UDTF surface (Q45-Q47)
# =========================================================================

@q(
    "q45_pandas_udf_zscore",
    """SELECT c_custkey,
              round((c_acctbal - avg(c_acctbal) OVER ()) /
                    stddev_samp(c_acctbal) OVER (), 6) AS z_udf,
              round((c_acctbal - avg(c_acctbal) OVER ()) /
                    stddev_samp(c_acctbal) OVER (), 6) AS z_builtin
       FROM customer""",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched pandas UDF z-score vs the equivalent built-in
    expression — both must agree with the oracle."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: PEP 563 string annotations (module-level future
    # import) are not resolvable by the pandas_udf signature inspector
    @pandas_udf("double")
    def zscore(x, m, s):
        return (x - m) / s

    c = load_table(spark, sf, "customer")
    stats = c.agg(
        F.avg("c_acctbal").alias("__m"), F.stddev("c_acctbal").alias("__s")
    )
    with_stats = c.crossJoin(F.broadcast(stats))
    return with_stats.select(
        "c_custkey",
        F.round(zscore(F.col("c_acctbal"), F.col("__m"), F.col("__s")), 6).alias(
            "z_udf"
        ),
        F.round((F.col("c_acctbal") - F.col("__m")) / F.col("__s"), 6).alias(
            "z_builtin"
        ),
    )


@q(
    "q46_apply_in_pandas_demean",
    """SELECT c_custkey,
              round(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey), 6)
                AS demeaned
       FROM customer""",
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas: per-nation demeaned account balance."""
    import pandas as pd

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "demeaned": (pdf["c_acctbal"] - pdf["c_acctbal"].mean()).round(6),
            }
        )

    c = load_table(spark, sf, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        demean, "c_custkey bigint, demeaned double"
    )


@q(
    "q47_udtf_explode_tokens",
    """SELECT doc_id, CAST(gs - 1 AS INT) AS pos, toks[gs] AS token
       FROM (SELECT doc_id, string_split(text, ' ') AS toks
             FROM documents WHERE doc_id < 50),
            LATERAL UNNEST(generate_series(1, len(toks))) AS t(gs)""",
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    )


@q(
    "q68_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(o_totalprice), 2) AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                               (o_orderstatus, o_orderpriority), ())""",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY Q21's third form beyond cube and
    rollup) via Spark SQL — each grouping set is a separate aggregation
    over one Expand of the input, one shuffle total."""
    o = load_table(spark, sf, "orders")
    o.createOrReplaceTempView("q68_orders")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n,
                  round(sum(o_totalprice), 2) AS total
           FROM q68_orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                   (o_orderstatus, o_orderpriority), ())"""
    )


@q(
    "q69_pivot",
    # the oracle uses conditional aggregation — engine-neutral and
    # column-name-stable, unlike PIVOT syntax differences
    """SELECT n_name,
              CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_orders,
              CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_orders,
              CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_orders
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name""",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: order-status counts per nation.  groupBy().pivot(values)
    with explicit values skips the extra distinct-scan job and compiles
    to the same single-shuffle conditional aggregation as the oracle."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "n_name",
            F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("f_orders"),
            F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("o_orders"),
            F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("p_orders"),
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
    "q76_stat_aggregates",
    """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
              round(covar_pop(l_quantity, l_extendedprice), 4) AS covp,
              round(covar_samp(l_quantity, l_extendedprice), 4) AS covs,
              round(var_pop(l_discount), 8) AS varp,
              round(var_samp(l_discount), 8) AS vars,
              round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
              round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept
       FROM lineitem""",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family: correlation, population/sample
    covariance and variance, linear-regression slope/intercept — all
    single-pass partial-aggregable moments."""
    li = load_table(spark, sf, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.agg(
        F.round(F.corr(q, p), 6).alias("corr_qp"),
        F.round(F.covar_pop(q, p), 4).alias("covp"),
        F.round(F.covar_samp(q, p), 4).alias("covs"),
        F.round(F.var_pop(d), 8).alias("varp"),
        F.round(F.var_samp(d), 8).alias("vars"),
        F.round(F.regr_slope(p, q), 4).alias("slope"),
        F.round(F.regr_intercept(p, q), 4).alias("icept"),
    )


@q(
    "q79_salted_skew_join",
    """SELECT p.p_brand AS brand,
              count(*) AS n,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       GROUP BY 1""",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    """Fact-to-dim join routed through the salted-join rewrite (hot left
    keys spread over 8 salt buckets, dim replicated 8x); the oracle is
    the plain unsalted SQL join — salting must be result-invisible."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, part, on=["p_partkey"], salt=8)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@q(
    "q80_two_phase_count_distinct",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_distinct
       FROM orders GROUP BY 1""",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) over a group key via the two-phase skew-safe form
    (distinct on (key, value) spreads a hot key's values by value hash,
    then a plain count); oracle = the direct COUNT(DISTINCT)."""
    from ..operators.skew import two_phase_count_distinct

    orders = load_table(spark, sf, "orders")
    return two_phase_count_distinct(orders, "o_orderpriority", "o_custkey")


@q(
    "q81_bucketed_join",
    """SELECT c.c_mktsegment AS segment,
              count(*) AS n_orders,
              round(sum(o.o_totalprice), 2) AS total
       FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
       GROUP BY 1""",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    """Customer-orders join through bucketed tables: both sides written
    hash-bucketed on custkey (shuffle paid once at write), the join reads
    co-located buckets (zero Exchange on either side when the sort-merge
    path is chosen — asserted in tools/plan_audit.py with broadcast off).
    Tables live in an explicit /tmp-located database so the gate never
    writes into the caller's cwd warehouse."""
    import hashlib
    import tempfile

    from ..sources.bucketing import bucketed_join_ready, write_bucketed

    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    db = "ctdc_bucket"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} "
        f"LOCATION '{tempfile.gettempdir()}/ctdc-bucket-warehouse'"
    )
    cust_t = f"{db}.customer_{tag}"
    ord_t = f"{db}.orders_{tag}"
    # the session catalog is in-memory: a table dir left by a previous
    # session is an orphan the catalog won't overwrite — drop both ways
    import shutil

    for t, leaf in ((cust_t, f"customer_{tag}"), (ord_t, f"orders_{tag}")):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            f"{tempfile.gettempdir()}/ctdc-bucket-warehouse/{leaf}",
            ignore_errors=True,
        )
    cust = load_table(spark, sf, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    orders = load_table(spark, sf, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    write_bucketed(cust, cust_t, ["custkey"], 8)
    write_bucketed(orders, ord_t, ["custkey"], 8)
    joined = bucketed_join_ready(spark, cust_t, ord_t, ["custkey"])
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@q(
    "q87_range_join_binned",
    """SELECT l.event_type, count(*) AS n_pairs
       FROM events l JOIN events r
         ON r.ts >= l.ts
        AND r.ts <= l.ts + INTERVAL 300 SECOND
        AND l.event_id <> r.event_id
       GROUP BY l.event_type""",
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    """Pure range join (NO equi-key): every event paired with events in
    the following 5 minutes.  A bare range predicate plans as
    BroadcastNestedLoopJoin — O(n²) compares; the binned rewrite joins
    on a time-bucket equi-key (plan-audited: no BNLJ) and filters the
    exact range, so work is pairs-within-bin-distance."""
    from ..operators.asof import range_join_binned

    ev = load_table(spark, sf, "events")
    joined = range_join_binned(
        ev,
        ev,
        "ts",
        "ts",
        0,
        300,
        extra_cond=F.col("l.event_id") != F.col("r.event_id"),
    )
    return joined.groupBy(
        F.col("l.event_type").alias("event_type")
    ).agg(F.count("*").alias("n_pairs"))


# =========================================================================
# Flagship
# =========================================================================

def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """5-way star join revenue by nation — exercises scans, broadcasts,
    shuffled join, aggregation."""
    return q09(spark, sf_dir)


@q(
    "q93_global_shuffle_order",
    """SELECT doc_id,
              CAST(row_number() OVER (
                ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
              ) AS BIGINT) AS pos
       FROM documents""",
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic epoch shuffle order with distributed rank: hash
    ranges are cut into contiguous buckets (bucket order = hash order),
    bucket counts prefix-sum on the tiny side, position = bucket offset
    + in-bucket row_number.  One data shuffle, no single-partition
    global sort; the oracle computes the same order with one."""
    from ..operators.sampling import global_shuffle_positions

    docs = load_table(spark, sf, "documents")
    return global_shuffle_positions(
        docs.select("doc_id"), "doc_id", buckets=64
    ).select("doc_id", "pos")


@q(
    "q96_approx_percentile",
    # like q19: the sketch value is engine-specific; checkable are the
    # exact percentiles (both engines interpolate linearly) and the
    # sketch's accuracy contract against them
    """SELECT round(quantile_cont(value, 0.5), 4) AS p50_r,
              round(quantile_cont(value, 0.9), 4) AS p90_r,
              round(quantile_cont(value, 0.99), 4) AS p99_r,
              TRUE AS within_tol
       FROM events""",
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate percentiles (KLL-style sketch, mergeable across
    partitions — the 100 TB path: one partial-aggregated pass, state is
    sketch-sized) checked against the exact interpolated percentiles,
    which both engines define identically.  within_tol asserts the
    sketch landed within 5% relative of exact at every probed quantile;
    the exact values hash-match the oracle."""
    ev = load_table(spark, sf, "events")
    agg = ev.agg(
        F.percentile("value", [0.5, 0.9, 0.99]).alias("__exact"),
        F.percentile_approx(
            "value", [0.5, 0.9, 0.99], accuracy=10000
        ).alias("__approx"),
    )
    ok = F.forall(
        F.zip_with(
            "__approx",
            "__exact",
            lambda a, e: F.abs(a - e) <= 0.05 * F.greatest(F.abs(e), F.lit(1e-9)),
        ),
        lambda x: x,
    )
    return agg.select(
        F.round(F.col("__exact")[0], 4).alias("p50_r"),
        F.round(F.col("__exact")[1], 4).alias("p90_r"),
        F.round(F.col("__exact")[2], 4).alias("p99_r"),
        ok.alias("within_tol"),
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


from ..sources.layout import zorder_sql as _zsql  # noqa: E402


@q(
    "q105_zorder_code",
    f"""SELECT event_id,
               {_zsql('(event_id % 65536)', 'user_id')} AS z
        FROM events""",
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    """Morton (z-order) codes for the two-dimensional write layout:
    the engine's codegen bit-interleave must agree bit-for-bit with the
    oracle's SQL form — both are generated from the same loop
    (sources/layout.py), so the layout operator's math is value-checked
    here and the file-level locality property in tests/test_layout.py."""
    from ..sources.layout import zorder_value

    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        zorder_value(
            F.pmod(F.col("event_id"), F.lit(65536)), F.col("user_id")
        ).alias("z"),
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
    "q110_histogram",
    """WITH mm AS (SELECT min(l_extendedprice) AS mn,
                          max(l_extendedprice) AS mx
                   FROM lineitem)
       SELECT CAST(least(floor((l_extendedprice - mn)
                               / ((mx - mn) / 10.0)), 9) AS INT) AS bucket,
              round(mn + CAST(least(floor((l_extendedprice - mn)
                               / ((mx - mn) / 10.0)), 9) AS INT)
                         * ((mx - mn) / 10.0), 4) AS lo_r,
              CAST(count(*) AS BIGINT) AS n
       FROM lineitem, mm
       WHERE l_extendedprice IS NOT NULL
       GROUP BY 1, 2""",
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice (the ANALYZE/profiling
    shape): global (min,max) as a 1-row broadcast, bucket assignment as
    a codegen expression, ONE map-side-combined count — the shuffle
    carries nbuckets rows per partition regardless of table size."""
    from ..operators.stats import equi_width_histogram

    li = load_table(spark, sf, "lineitem")
    h = equi_width_histogram(li, "l_extendedprice", 10)
    return h.select(
        "bucket", F.round("lo", 4).alias("lo_r"), "n"
    )


@q(
    "q111_column_profile",
    """SELECT 'l_quantity' AS column,
              CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_null,
              CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
              CAST(min(l_quantity) AS VARCHAR) AS min_str,
              CAST(max(l_quantity) AS VARCHAR) AS max_str
       FROM lineitem
       UNION ALL
       SELECT 'l_returnflag',
              CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT),
              CAST(count(DISTINCT l_returnflag) AS BIGINT),
              CAST(min(l_returnflag) AS VARCHAR),
              CAST(max(l_returnflag) AS VARCHAR)
       FROM lineitem
       UNION ALL
       SELECT 'l_shipdate',
              CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT),
              CAST(count(DISTINCT l_shipdate) AS BIGINT),
              CAST(min(l_shipdate) AS VARCHAR),
              CAST(max(l_shipdate) AS VARCHAR)
       FROM lineitem""",
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column table profile (nulls / exact NDV / min / max,
    type-erased to strings): ONE pass — Spark plans the multi-column
    count-distinct as expand + partial aggregation, so the scan is not
    repeated per column."""
    from ..operators.stats import column_profile

    li = load_table(spark, sf, "lineitem")
    return column_profile(
        li, ["l_quantity", "l_returnflag", "l_shipdate"]
    )


@q(
    "q112_dynamic_partition_pruning",
    # the weighted sum is summation-order-sensitive in double (a real
    # corpus value sat exactly on the 2dp rounding boundary), so both
    # engines accumulate in DECIMAL — exact, order-independent — and
    # round the identical result
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(round(sum(CAST(value * CASE event_type
                                    WHEN 'click' THEN 1.5
                                    WHEN 'purchase' THEN 2.0
                                  END AS DECIMAL(28, 8))), 2) AS DOUBLE)
                AS weighted_r
       FROM events WHERE event_type IN ('click', 'purchase')
       GROUP BY event_type""",
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out partitioned
    by event_type (hive directories, contract-pinned partitioned sink);
    joining it to a selectively-filtered weight dim makes Spark inject a
    runtime pruning subquery into the scan (PartitionFilters:
    dynamicpruningexpression — plan-audited), so only the joined types'
    directories are read.  At 100 TB this is the difference between
    scanning 2 partitions and scanning all of them."""
    import dataclasses
    import hashlib
    import os
    import tempfile

    from ..contracts.shape import contract
    from ..sources.io import Sink, write_df

    @contract
    @dataclasses.dataclass
    class EventsSlim:
        event_id: int
        user_id: int
        event_type: str
        value: float

    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    tag = hashlib.md5(f"{sf}|dpp".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/ctdc-dpp-{tag}"
    # reuse the partitioned copy only when its content fingerprint (row
    # count + max event_id — footer metadata + one pruned-column agg)
    # still matches the source: a regenerated sf dir must trigger a
    # rewrite, not silently serve the stale layout
    src_fp = ev.agg(
        F.count("*").alias("n"), F.max("event_id").alias("mx")
    ).first()
    stale = True
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        try:
            cp = (
                spark.read.parquet(path)
                .agg(F.count("*").alias("n"), F.max("event_id").alias("mx"))
                .first()
            )
            stale = (cp["n"], cp["mx"]) != (src_fp["n"], src_fp["mx"])
        except Exception:
            stale = True
    if stale:
        write_df(
            ev,
            Sink(EventsSlim, path, partition_by=("event_type",)),
            SchemaPolicy.EXACT,
        )
    part = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("click", 1.5), ("purchase", 2.0), ("view", 0.5)],
        "event_type string, w double",
    ).filter(F.col("w") >= 1.0)
    return (
        part.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(
                    (F.col("value") * F.col("w")).cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("weighted_r"),
        )
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
    "q114_unpivot_measures",
    """SELECT 'l_discount' AS measure, CAST(count(*) AS BIGINT) AS n,
              CAST(round(sum(CAST(l_discount AS DECIMAL(28, 6))), 2)
                    AS DOUBLE) AS sum_r
       FROM lineitem
       UNION ALL
       SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28, 6))), 2)
                    AS DOUBLE)
       FROM lineitem
       UNION ALL
       SELECT 'l_quantity', CAST(count(*) AS BIGINT),
              CAST(round(sum(CAST(l_quantity AS DECIMAL(28, 6))), 2)
                    AS DOUBLE)
       FROM lineitem""",
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns to (measure, value) rows in
    ONE scan — Spark plans it as a codegen Expand, so the relational
    surface covers both pivot (q69) and its inverse.  Decimal
    accumulation keeps the per-measure sums order-independent across
    engines."""
    li = load_table(spark, sf, "lineitem")
    melted = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="v",
    )
    return melted.groupBy("measure").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("v").cast("decimal(28,6)")), 2
        ).cast("double").alias("sum_r"),
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
    "q118_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
              CAST(count(*) AS BIGINT) AS n,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(28, 8))), 2)
                    AS DOUBLE) AS total_r
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup q20 / cube
    q21): per-status totals, per-priority totals, and the grand total in
    ONE scan — Spark plans an Expand over the set list, so the table is
    read once, not once per set.  grouping() flags disambiguate real
    NULL group values from the set placeholders."""
    orders = load_table(spark, sf, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2
            ).cast("double").alias("total_r"),
        )
    )


@q(
    "q122_grouped_agg_pandas_udf",
    """SELECT l_returnflag,
              round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
                AS wavg_price
       FROM lineitem GROUP BY l_returnflag""",
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (the third pandas-UDF flavor next to
    scalar q45 and grouped-map q46): a weighted average computed
    vectorized per group, Arrow-batched.  Honest scale caveat: unlike
    native aggregates, a pandas grouped agg has NO map-side partial
    combine — the plan is Exchange(all rows) -> Sort ->
    ArrowAggregatePython — so the full table crosses the shuffle.  Use
    it for semantics built-ins can't express; this weighted average is
    expressible natively (the oracle shows the rewrite) and exists here
    to pin the API surface."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@q(
    "q125_lateral_topn_per_nation",
    """SELECT n.n_name, c.c_name, round(c.c_acctbal, 2) AS acctbal_r
       FROM nation n,
            LATERAL (SELECT c_name, c_acctbal
                     FROM customer
                     WHERE c_nationkey = n.n_nationkey
                     ORDER BY c_acctbal DESC, c_name
                     LIMIT 2) c""",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 4 SQL): top-2 customers by
    balance per nation expressed as a per-row dependent subquery — the
    SQL-standard alternative to the window-rank form (q29).  Catalyst
    decorrelates it into a ranked join, so the declarative form costs
    the same as the hand-written window."""
    load_table(spark, sf, "nation").createOrReplaceTempView("v_nation")
    load_table(spark, sf, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """SELECT n.n_name, c.c_name, round(c.c_acctbal, 2) AS acctbal_r
           FROM v_nation n,
                LATERAL (SELECT c_name, c_acctbal
                         FROM v_customer
                         WHERE c_nationkey = n.n_nationkey
                         ORDER BY c_acctbal DESC, c_name
                         LIMIT 2) c"""
    )


@q(
    "q126_apply_in_arrow_demean",
    """SELECT event_id,
              round(value - avg(value) OVER (PARTITION BY event_type), 6)
                AS demeaned_r
       FROM events""",
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map over ARROW tables (applyInArrow — the zero-copy
    sibling of q46's applyInPandas): per-type demeaning computed with
    pyarrow compute kernels, no pandas object materialization.  Same
    per-group shuffle shape as any grouped map; the win is batch
    transfer staying columnar end to end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def demean(table: "pa.Table") -> "pa.Table":
        v = table.column("value")
        mean = pc.mean(v).as_py()
        return pa.table(
            {
                "event_id": table.column("event_id"),
                "demeaned_r": pc.round(
                    pc.subtract(v, pa.scalar(mean, pa.float64())), 6
                ),
            }
        )

    ev = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    return ev.groupBy("event_type").applyInArrow(
        demean, "event_id long, demeaned_r double"
    )


@q(
    "q128_null_safe_join",
    """WITH fact AS (SELECT nullif(event_type, 'error') AS k, value
                     FROM events),
            dim AS (SELECT DISTINCT nullif(event_type, 'error') AS k
                    FROM events)
       SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(count(f.k) AS BIGINT) AS n_nonnull
       FROM fact f JOIN dim d ON f.k IS NOT DISTINCT FROM d.k""",
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (<=>): NULL keys match each other instead
    of dropping — the semantics a plain equi-join silently loses.  Spark
    plans <=> as a hash join key like any other (no fallback to BNLJ),
    which the plan audit pins."""
    ev = load_table(spark, sf, "events")
    fact = ev.select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("k"), "value"
    )
    dim = fact.select("k").distinct()
    joined = fact.alias("f").join(
        dim.alias("d"), F.col("f.k").eqNullSafe(F.col("d.k"))
    )
    return joined.agg(
        F.count("*").cast("bigint").alias("n"),
        F.count("f.k").cast("bigint").alias("n_nonnull"),
    )


@q(
    "q129_variant_semistructured",
    """SELECT event_type,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
                   AS BIGINT) AS sum_k,
              CAST(max(CAST(json_extract_string(props, '$.k') AS INT))
                   AS INT) AS max_k,
              CAST(sum(CASE WHEN json_extract_string(props, '$.missing')
                            IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_missing
       FROM events GROUP BY event_type""",
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    """VARIANT semi-structured ingestion (Spark 4): props parses ONCE
    into the binary variant encoding and every field access is a cheap
    typed variant_get — the open-schema alternative to q03/q37's
    from_json, which needs the schema up front.  try_variant_get
    returns NULL for absent paths instead of failing, the
    late-schema-drift behavior a 100 TB ingest actually needs."""
    ev = load_table(spark, sf, "events")
    parsed = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.try_variant_get("v", "$.k", "int"))
        .cast("bigint")
        .alias("sum_k"),
        F.max(F.try_variant_get("v", "$.k", "int")).cast("int").alias("max_k"),
        F.sum(
            F.when(
                F.try_variant_get("v", "$.missing", "string").isNull(), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_missing"),
    )


@q(
    "q131_median_mode",
    """WITH m AS (
         SELECT l_returnflag,
                round(median(l_quantity), 4) AS median_qty,
                round(median(l_extendedprice), 4) AS median_price
         FROM lineitem GROUP BY l_returnflag),
       counts AS (
         SELECT l_returnflag, l_linenumber, count(*) AS c,
                row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY count(*) DESC, l_linenumber)
                  AS rn
         FROM lineitem GROUP BY l_returnflag, l_linenumber)
       SELECT m.l_returnflag, m.median_qty,
              CAST(counts.l_linenumber AS INT) AS mode_line,
              m.median_price
       FROM m JOIN counts ON m.l_returnflag = counts.l_returnflag
       WHERE counts.rn = 1""",
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    """Exact MEDIAN (Spark 4 built-in, not percentile_approx) plus a
    deterministic MODE.  Both engines ship a mode() aggregate but both
    break frequency ties ARBITRARILY, so the mode here is the explicit
    arg-max — count desc, value asc — identical on both sides
    (l_linenumber's domain is small ints, where ties are real)."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
        F.min(F.col("l_linenumber")).alias("__drop"),
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
    ).drop("__drop").join(
        li.groupBy("l_returnflag", "l_linenumber")
        .count()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("l_returnflag").orderBy(
                    F.desc("count"), F.asc("l_linenumber")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag", F.col("l_linenumber").cast("int").alias("mode_line")
        ),
        "l_returnflag",
    ).select("l_returnflag", "median_qty", "mode_line", "median_price")


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
    "q159_recursive_cte_closure",
    """WITH RECURSIVE walk(leaf, node, depth) AS (
         SELECT s_suppkey AS leaf, s_suppkey AS node, 0 AS depth
         FROM supplier
         UNION ALL
         SELECT leaf, CAST(floor(node / 2) AS BIGINT) AS node,
                depth + 1 AS depth
         FROM walk WHERE node > 1
       )
       SELECT leaf AS s_suppkey, CAST(max(depth) AS INT) AS depth,
              CAST(sum(node) AS BIGINT) AS path_sum,
              CAST(count(*) AS BIGINT) AS chain_len
       FROM walk GROUP BY leaf""",
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (Spark 4 `WITH RECURSIVE`): ancestor-chain closure
    over a derived hierarchy (parent(k) = floor(k/2), a binary tree
    rooted at 1) — per-leaf depth, path node-sum, and chain length.
    This is the SQL-standard spec for the iterative closures the engine
    elsewhere runs by hand (q73/q101/q152 label propagation): Spark
    executes it as iterated UNION ALL micro-plans, one join per level,
    terminating when the recursive leg is empty.  Rounds ∝ hierarchy
    DEPTH (log n here), and each round's shuffle carries only the still-
    walking frontier — the same O(depth) alternation bound as the
    hand-written CC loop, but optimizer-planned.  For 100 TB graphs with
    unknown/deep diameter the explicit large-star/small-star operator
    (q101) stays the scale path; recursive CTE is the right tool for
    bounded-depth hierarchies (org charts, BOM explosions, paths)."""
    for t in ("supplier",):
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(
        """WITH RECURSIVE walk(leaf, node, depth) AS (
             SELECT s_suppkey AS leaf, s_suppkey AS node, 0 AS depth
             FROM supplier
             UNION ALL
             SELECT leaf, CAST(floor(node / 2) AS BIGINT) AS node,
                    depth + 1 AS depth
             FROM walk WHERE node > 1
           )
           SELECT leaf AS s_suppkey, CAST(max(depth) AS INT) AS depth,
                  CAST(sum(node) AS BIGINT) AS path_sum,
                  CAST(count(*) AS BIGINT) AS chain_len
           FROM walk GROUP BY leaf"""
    )


@q(
    "q161_sql_scalar_udf",
    """SELECT doc_id,
              round(least(n_chars, 2000) / 2000.0 +
                    CASE WHEN text LIKE '%the%' THEN 0.1 ELSE 0.0 END,
                    6) AS score
       FROM documents""",
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    """SQL scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`): a
    reusable quality-score routine declared ONCE in the catalog and used
    like a builtin.  Unlike a Python UDF there is no serialization
    boundary at all — Catalyst inlines the body into the calling plan,
    so the scored scan stays inside WholeStageCodegen and every
    optimization (pushdown through it, constant folding, pruning)
    applies as if the expression were written inline.  This is the right
    home for org-wide curation formulas at 100 TB: one definition,
    zero runtime cost, no UDF-server fleet."""
    load_table(spark, sf, "documents").createOrReplaceTempView(
        "q161_documents"
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION q161_score(
             nc BIGINT, txt STRING) RETURNS DOUBLE
           RETURN round(least(nc, 2000) / 2000.0 +
             CASE WHEN txt LIKE '%the%' THEN 0.1 ELSE 0.0 END, 6)"""
    )
    return spark.sql(
        "SELECT doc_id, q161_score(n_chars, text) AS score "
        "FROM q161_documents"
    )


@q(
    "q162_sql_table_udf_chunks",
    """SELECT doc_id, CAST(gs AS INT) AS chunk_idx,
              substr(text, CAST(gs AS INT) * 40 + 1, 40) AS chunk
       FROM documents,
            LATERAL UNNEST(generate_series(
              0, CAST(ceil(length(text) / 40.0) AS INT) - 1)) t(gs)
       WHERE length(text) > 0""",
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    """SQL table-valued UDF (`CREATE FUNCTION ... RETURNS TABLE`)
    applied per-row via LATERAL: fixed-width document chunking as a
    declarative, catalog-registered routine — the SQL twin of the
    Python-UDTF chunker (q70/q83) with NO Python boundary.  Catalyst
    rewrites the lateral TVF call into an inlined correlated generate
    (sequence + explode), so chunk production is a generator inside the
    scan stage: rows-out scales with text length, the shuffle (none
    here) is untouched, and per-executor memory is one row's chunks.
    The chunk width is a routine parameter — callers retarget context
    windows without redeploying code."""
    load_table(spark, sf, "documents").createOrReplaceTempView(
        "q162_documents"
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION q162_chunks(
             txt STRING, sz INT)
           RETURNS TABLE(chunk_idx INT, chunk STRING)
           RETURN SELECT CAST(i AS INT) AS chunk_idx,
                         substr(txt, CAST(i AS INT) * sz + 1, sz) AS chunk
                  FROM (SELECT explode(sequence(
                          0,
                          greatest(
                            CAST(ceil(length(txt) / CAST(sz AS DOUBLE))
                                 AS INT) - 1, 0))) AS i)"""
    )
    # Spark's sequence(a, b) runs DESCENDING when b < a, so empty text
    # would emit chunk_idx [0, -1]; the greatest() clamp plus this
    # empty-text filter (mirrored in the oracle, whose generate_series
    # emits nothing for a negative stop) keeps both engines chunk-free
    # for zero-length documents.
    return spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.chunk
           FROM q162_documents d, LATERAL q162_chunks(d.text, 40) c
           WHERE length(d.text) > 0"""
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


_Q174_SQL = """
WITH a AS (SELECT o_orderpriority AS p FROM {orders}
           WHERE o_custkey % 2 = 0),
     b AS (SELECT o_orderpriority AS p FROM {orders}
           WHERE o_custkey % 2 = 1),
     ea AS (SELECT p FROM a EXCEPT ALL SELECT p FROM b),
     ia AS (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
SELECT 'except_all' AS op, p, CAST(count(*) AS BIGINT) AS n
FROM ea GROUP BY p
UNION ALL
SELECT 'intersect_all' AS op, p, CAST(count(*) AS BIGINT) AS n
FROM ia GROUP BY p
"""


@q("q174_multiset_set_ops", _Q174_SQL.format(orders="orders"))
def q174(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL —
    which q31's DISTINCT variants cannot express: per-value
    MULTIPLICITY survives, so the except side reports max(0, cnt_a -
    cnt_b) occurrences and the intersect side min(cnt_a, cnt_b).
    Catalyst rewrites both into aggregate + generate (count per key,
    then replicate) — no sort, no distinct pass, partial-combined like
    any GROUP BY — making bag reconciliation of two 100 TB extracts a
    pair of count aggregates rather than a row-by-row diff."""
    load_table(spark, sf, "orders").createOrReplaceTempView("q174_orders")
    return spark.sql(_Q174_SQL.format(orders="q174_orders"))


_Q175_SQL = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT)
         AS n_finished,
       round(sum(o.o_totalprice) FILTER (WHERE o.o_orderpriority
                                         LIKE '1-%'), 2) AS urgent_rev_r,
       round(avg(o.o_totalprice) FILTER (WHERE o.o_orderstatus = 'O'), 2)
         AS avg_open_r
FROM {orders} o
JOIN {customer} c ON c.c_custkey = o.o_custkey
JOIN {nation} n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@q(
    "q175_filtered_aggregates",
    _Q175_SQL.format(orders="orders", customer="customer", nation="nation"),
)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-standard FILTER (WHERE ...) conditional aggregation: four
    differently-predicated aggregates over ONE scan of the fact table —
    the declarative form of the CASE-WHEN pivot, and the shape every
    metrics rollup wants at 100 TB (adding a filtered metric adds a
    column, never a scan).  All four run inside one partial-combined
    HashAggregate; the two dimension joins broadcast."""
    load_table(spark, sf, "orders").createOrReplaceTempView("q175_orders")
    load_table(spark, sf, "customer").createOrReplaceTempView(
        "q175_customer"
    )
    load_table(spark, sf, "nation").createOrReplaceTempView("q175_nation")
    return spark.sql(
        _Q175_SQL.format(
            orders="q175_orders",
            customer="q175_customer",
            nation="q175_nation",
        )
    )


@q(
    "q176_iterator_pandas_udf",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INT)
                AS bpe_tokens
       FROM documents""",
)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    """ITERATOR-form pandas UDF (Iterator[pd.Series] ->
    Iterator[pd.Series]): the per-worker setup — here a compiled regex,
    in production a tokenizer or ONNX session — runs ONCE per task
    before the batch loop, amortized over every Arrow batch, instead of
    per-call like the scalar form.  This is THE pattern for model-
    assisted scoring at 100 TB: load weights once per executor task,
    stream batches through.  Matches q58's pure-SQL token count exactly
    (the oracle), so the Python boundary is value-checked, and the
    scalar-vs-iterator results are interchangeable — only the
    amortization differs."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    # typing.Iterator (module-global) so the PEP-563 string annotation
    # resolves when pyspark inspects the signature
    @pandas_udf("int")
    def tok_count(
        it: typing.Iterator[pd.Series],
    ) -> typing.Iterator[pd.Series]:
        pat = _re.compile(r"\w+|[^\w\s]")  # once per task, not per batch
        for s in it:
            yield s.map(lambda t: len(pat.findall(t)))

    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", tok_count("text").alias("bpe_tokens"))


@q(
    "q177_arrow_optimized_udf",
    """SELECT doc_id,
              upper(substr(source, 1, 2)) || CAST(length(source) % 10
                                                  AS VARCHAR) AS code
       FROM documents""",
)
def q177(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-OPTIMIZED scalar Python UDF (`udf(..., useArrow=True)`):
    same author-facing row-at-a-time signature as the legacy pickle
    UDF, but executed as ArrowEvalPython — columnar Arrow batches
    cross the boundary instead of per-row pickling (the plan audit
    pins ArrowEvalPython and forbids BatchEvalPython).  The pragmatic
    middle tier when logic doesn't vectorize but 100 TB can't afford
    pickle serialization; the oracle recomputes the same derivation in
    SQL, value-checking the boundary."""
    fn = F.udf(
        lambda s: (s[:2].upper() + str(len(s) % 10)) if s else None,
        "string",
        useArrow=True,
    )
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", fn(F.col("source")).alias("code"))


@q(
    "q178_polymorphic_udtf",
    """SELECT doc_id,
              substr(source, 1, 1) AS c0,
              substr(source, 2, 1) AS c1,
              substr(source, 3, 1) AS c2
       FROM documents""",
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (static `analyze()`, Spark 4): the
    output schema is computed at ANALYSIS time from the call's literal
    arguments — here n=3 produces columns c0..c2; a different call
    site gets a different arity with no code change.  This is the
    form that lets one UDTF serve schema-varying extraction (top-n
    fields, configurable feature fan-out) while staying fully typed in
    the plan — downstream pruning and codegen see concrete columns.
    Rows flow through the same Arrow UDTF machinery as q70; the
    oracle recomputes the fixed n=3 instance relationally."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadChars:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"c{i}", "string")
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            t = text or ""
            yield tuple(t[i] if i < len(t) else None for i in range(n))

    spark.udtf.register("q178_lead_chars", LeadChars)
    load_table(spark, sf, "documents").createOrReplaceTempView(
        "q178_documents"
    )
    return spark.sql(
        """SELECT d.doc_id, t.c0, t.c1, t.c2
           FROM q178_documents d, LATERAL q178_lead_chars(d.source, 3) t"""
    )


_Q182_SQL = """
WITH d AS (
  SELECT CAST(floor(o_totalprice
              / power(10, floor(log10(o_totalprice)))) AS INT) AS digit
  FROM {orders} WHERE o_totalprice >= 1
), c AS (
  SELECT digit, count(*) AS n FROM d GROUP BY digit
), t AS (SELECT sum(n) AS tot FROM c)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / t.tot, 6) AS observed_r,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_r,
       round(abs(CAST(n AS DOUBLE) / t.tot - log10(1.0 + 1.0 / digit)),
             6) AS abs_dev_r
FROM c, t
"""


@q("q182_benford_audit", _Q182_SQL.format(orders="orders"))
def q182(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-digit audit: observed leading-digit frequencies of
    order totals against the Benford expectation log10(1 + 1/d) — the
    classic forensic screen for fabricated or truncated financial
    columns, and a useful synthetic-data tell (TPC-H prices are
    uniform-ish, so deviations here are LARGE by design; organic
    multiplicative data hugs the curve).  The digit comes from pure
    log/power arithmetic (identical IEEE semantics in any engine — no
    string casts, which differ across dialects); cost is one
    map-combined 9-group count plus a 1-row total broadcast."""
    load_table(spark, sf, "orders").createOrReplaceTempView("q182_orders")
    return spark.sql(_Q182_SQL.format(orders="q182_orders"))


_Q183_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM {events}
  GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
  FROM {events} e JOIN med m ON m.event_type = e.event_type
), mad AS (
  SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(max(m.med), 4) AS median_r,
       round(max(m2.mad), 4) AS mad_r,
       CAST(sum(CASE WHEN d.ad > 3.0 * 1.4826 * m2.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d
JOIN med m ON m.event_type = d.event_type
JOIN mad m2 ON m2.event_type = d.event_type
GROUP BY d.event_type
"""


@q("q183_mad_outliers", _Q183_SQL.format(events="events"))
def q183(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: the
    breakdown-resistant companion to Q169's z-score (one extreme value
    drags a mean/stddev but not a median/MAD, so contaminated columns
    don't mask their own outliers).  Both medians are EXACT
    (`median()` on each engine — q131 already pins the interpolation
    parity); the 1.4826 factor scales MAD to sigma-equivalent under
    normality, making the 3-sigma-style cut comparable to Q169's.
    Cost shape: two grouped exact medians (each a per-group sort of
    that group only) + two broadcast joins of the |types|-row stat
    tables; at 100 TB swap `median` for `approx_percentile(0.5)` and
    the shape is one scan + two tiny broadcasts."""
    load_table(spark, sf, "events").createOrReplaceTempView("q183_events")
    return spark.sql(_Q183_SQL.format(events="q183_events"))


_Q185_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue
FROM {orders} GROUP BY ALL
"""


@q("q185_group_by_all", _Q185_SQL.format(orders="orders"))
def q185(spark: SparkSession, sf: str) -> DataFrame:
    """`GROUP BY ALL` (Spark 4 / modern-SQL sugar): the grouping key
    list is inferred from the non-aggregate select items, so adding a
    dimension to a metrics rollup is a one-place edit — the analyst
    ergonomics every warehouse dialect converged on.  Resolves at
    analysis time to the ordinary partial-combined hash aggregate
    (identical plan to the explicit form); money sums through DECIMAL
    for cross-engine cent-exactness."""
    load_table(spark, sf, "orders").createOrReplaceTempView("q185_orders")
    return spark.sql(_Q185_SQL.format(orders="q185_orders"))


@q(
    "q186_parameterized_sql",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
       FROM orders
       WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'O'
       GROUP BY o_orderpriority""",
)
def q186(spark: SparkSession, sf: str) -> DataFrame:
    """Named-parameter SQL (`spark.sql(query, args={...})`, Spark 3.4+):
    values bind as TYPED literals at parse time — no string
    interpolation, so no injection surface and no accidental type
    coercions; the bound plan is byte-identical to the inlined one, so
    pushdown sees the literal (PushedFilters carries the bound
    threshold).  The right template mechanism for the thousands of
    parameterized curation/reporting runs a 100 TB pipeline schedules
    daily."""
    load_table(spark, sf, "orders").createOrReplaceTempView("q186_orders")
    return spark.sql(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n "
        "FROM q186_orders "
        "WHERE o_totalprice >= :floor AND o_orderstatus = :status "
        "GROUP BY o_orderpriority",
        args={"floor": 150000.0, "status": "O"},
    )


_Q187_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(5,2))), 2)
            AS DOUBLE) AS revenue
FROM {lineitem} JOIN {orders} ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
GROUP BY l_returnflag
"""


@q(
    "q187_bloom_runtime_filter",
    _Q187_SQL.format(lineitem="lineitem", orders="orders"),
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (`InjectRuntimeFilter`,
    Spark 3.3+): a selective filter on the orders side builds a Bloom
    filter (`bloom_filter_agg` subquery) that is pushed into the
    lineitem scan as `might_contain(xxhash64(l_orderkey))` — rows that
    cannot join are dropped BEFORE the shuffle, which at 100 TB is the
    difference between shuffling the whole fact table and shuffling the
    ~few-% that survive.  The demo pins the scale posture explicitly:
    broadcast is disabled (at real scale the filtered orders side is
    past the broadcast threshold, which is precisely when the Bloom
    filter earns its keep) and the application-side size gate is
    dropped to zero so the sf0.01 fixture triggers the same plan a
    100 TB table would.

    Config hygiene: the optimizer confs are scoped — the physical plan
    is forced (QueryExecution's lazy phases pin it) while they're set,
    then every conf is restored, so the returned DataFrame stays lazy
    with the Bloom-filtered plan and the session is left untouched.
    """
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000.0)
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE reads its own threshold live at execution time (after the
        # finally block restores confs) — pin it too, or the executed
        # join can silently convert to broadcast behind the audited plan.
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    prior = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.expr(
                    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
                    " * CAST(1 - l_discount AS DECIMAL(5,2))), 2)"
                    " AS DOUBLE)"
                ).alias("revenue"),
            )
        )
        out._jdf.queryExecution().executedPlan()
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


# =========================================================================
# Round-5 Spark-4 SQL surface + time-series decay (Q194-Q198; q196 is in
# tier_streaming)
# =========================================================================

_Q194_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@q("q194_pipe_syntax", _Q194_ORACLE)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the |> operator chain — FROM |> WHERE
    |> EXTEND |> AGGREGATE … GROUP BY |> ORDER BY — each stage consuming
    the previous stage's output, in execution order instead of SELECT's
    inside-out order.  Purely parser-level sugar: the chain resolves to
    the identical analyzed plan as the nested form (same partial-agg
    hash aggregate, same pushdown — the WHERE reaches PushedFilters),
    so the scale posture is exactly q17's; the oracle is the classic
    spelling of the same query."""
    load_table(spark, sf, "lineitem").createOrReplaceTempView(
        "q194_lineitem"
    )
    return spark.sql(
        """
        FROM q194_lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                     round(sum(l_quantity), 2) AS sum_qty,
                     round(sum(disc_price), 2) AS sum_disc_price
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


_Q195_ORACLE = """
SELECT lower(o_orderpriority) AS priority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total
FROM orders GROUP BY 1
"""


@q("q195_collated_group", _Q195_ORACLE)
def q195(spark: SparkSession, sf: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 string collations): the group
    key is COLLATE(…, 'UTF8_LCASE'), so 'URGENT' / 'urgent' / 'Urgent'
    hash and compare as one group INSIDE the aggregate — no lower()
    normalization column, and any index/partition stats on the original
    column stay usable.  The fixture synthesizes deterministic
    case-mangled keys (upper/lower/initcap by o_orderkey mod 3); the
    oracle groups the clean column case-insensitively.  Output key is
    min(lower(key)): identical for every member of a UTF8_LCASE group,
    so the emission is deterministic even though the group retains an
    arbitrary representative."""
    load_table(spark, sf, "orders").createOrReplaceTempView("q195_orders")
    return spark.sql(
        """
        WITH mixed AS (
          SELECT CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
                      WHEN o_orderkey % 3 = 1 THEN lower(o_orderpriority)
                      ELSE initcap(lower(o_orderpriority)) END AS pr,
                 o_totalprice
          FROM q195_orders)
        SELECT min(lower(pr)) AS priority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS total
        FROM mixed GROUP BY collate(pr, 'UTF8_LCASE')
        """
    )


_Q197_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(count(*) AS BIGINT) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@q("q197_listagg", _Q197_ORACLE)
def q197(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered LISTAGG (Spark 4 / SQL:2016 `WITHIN GROUP (ORDER BY …)`):
    the denormalized-list rollup every report ends with, deterministic
    because the within-group order is total.  Scale note: the result row
    is O(group size) — LISTAGG is for bounded groups (here: nations per
    region); unbounded-group concatenation belongs in collect_list +
    downstream chunking, not a string column."""
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


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


@q(
    "q211_sql_scripting",
    """WITH tot AS (SELECT count(*) AS n FROM customer),
       grid AS (SELECT unnest(range(0, 25)) * 500.0 AS t),
       fr AS (SELECT g.t,
                (SELECT count(*) FROM customer
                 WHERE c_acctbal > g.t) AS n_above,
              tot.n
              FROM grid g, tot),
       sel AS (SELECT t, n_above FROM fr
               WHERE n_above * 1.0 / n <= 0.1
               ORDER BY t LIMIT 1)
       SELECT t AS threshold, CAST(n_above AS BIGINT) AS n_above
       FROM sel""",
)
def q211(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (BEGIN…END, DECLARE, WHILE): an iterative
    threshold search executed entirely inside the SQL engine — raise a
    balance cutoff in 500-unit steps until at most 10 % of customers
    sit above it, then report the threshold and the population above.
    Control flow lives in the script (no driver-side Python loop
    besides submitting it); each iteration is one partial-combined
    aggregate over the table.  The oracle replays the search as a
    DuckDB grid scan — first multiple of 500 meeting the exit
    condition — so the loop's exit semantics are cross-checked, not
    assumed.  Complements q186 (named-parameter SQL) and q194 (pipe
    syntax) on the Spark-4 SQL surface."""
    load_table(spark, sf, "customer").createOrReplaceTempView(
        "q211_customer"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE t DOUBLE DEFAULT 0.0;
          WHILE (SELECT count(*) FILTER (WHERE c_acctbal > t) * 1.0
                        / count(*)
                 FROM q211_customer) > 0.1 DO
            SET t = t + 500.0;
          END WHILE;
          SELECT t AS threshold,
                 (SELECT CAST(count(*) AS BIGINT)
                  FROM q211_customer
                  WHERE c_acctbal > t) AS n_above;
        END
        """
    )


@q(
    "q221_robust_group_stats",
    """WITH c AS (
         SELECT c_nationkey,
                CAST(floor(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT)
                  AS cents,
                c_custkey
         FROM customer),
       r AS (
         SELECT c_nationkey, cents,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY cents, c_custkey) AS rn,
                count(*) OVER (PARTITION BY c_nationkey) AS n
         FROM c),
       b AS (
         SELECT *, CAST(floor(n / 10.0) AS BIGINT) AS g,
                max(CASE WHEN rn = CAST(floor(n / 10.0) AS BIGINT) + 1
                         THEN cents END)
                  OVER (PARTITION BY c_nationkey) AS lo,
                max(CASE WHEN rn = n - CAST(floor(n / 10.0) AS BIGINT)
                         THEN cents END)
                  OVER (PARTITION BY c_nationkey) AS hi
         FROM r)
       SELECT c_nationkey,
              CAST(max(n) AS BIGINT) AS n,
              round(CAST(sum(CASE WHEN rn > g AND rn <= n - g
                                  THEN cents END) AS DOUBLE)
                    / (max(n) - 2 * max(g)), 6) AS trimmed_mean_cents,
              round(CAST(sum(least(greatest(cents, lo), hi)) AS DOUBLE)
                    / max(n), 6) AS winsorized_mean_cents,
              max(lo) AS lo_cents, max(hi) AS hi_cents
       FROM b GROUP BY c_nationkey""",
)
def q221(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-based robust group statistics: per-nation 10 %-trimmed mean
    and 10 %-winsorized mean of account balances.  RANK-based (drop /
    clamp exactly g = floor(n/10) rows per tail, ranks tie-broken by
    key) rather than quantile-based, so the statistic is exact integer
    arithmetic on floored cents — engine-identical with no quantile-
    interpolation divergence (Spark percentile vs DuckDB quantile_cont
    interpolate differently; ranks don't).  ONE sort-based window per
    group supplies rn / n / both clamp boundaries (the extra window
    aggs reuse the same exchange+sort), then one partial-combined
    groupBy finishes — two shuffles total, no join, no Python.
    Winsorization is the standard heavy-tail guard for quality-score
    aggregation at corpus scale where a single spam outlier can drag a
    domain's mean."""
    c = load_table(spark, sf, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal").cast("double") * 100)
        .cast("bigint")
        .alias("cents"),
        "c_custkey",
    )
    wp = Window.partitionBy("c_nationkey")
    r = c.select(
        "c_nationkey",
        "cents",
        F.row_number()
        .over(wp.orderBy("cents", "c_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    g = F.floor(F.col("n") / 10.0).cast("bigint")
    b = r.select(
        "c_nationkey",
        "cents",
        "rn",
        "n",
        g.alias("g"),
        F.max(F.when(F.col("rn") == g + 1, F.col("cents")))
        .over(wp)
        .alias("lo"),
        F.max(F.when(F.col("rn") == F.col("n") - g, F.col("cents")))
        .over(wp)
        .alias("hi"),
    )
    return b.groupBy("c_nationkey").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(
            F.sum(
                F.when(
                    (F.col("rn") > F.col("g"))
                    & (F.col("rn") <= F.col("n") - F.col("g")),
                    F.col("cents"),
                )
            ).cast("double")
            / (F.max("n") - 2 * F.max("g")),
            6,
        ).alias("trimmed_mean_cents"),
        F.round(
            F.sum(
                F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
            ).cast("double")
            / F.max("n"),
            6,
        ).alias("winsorized_mean_cents"),
        F.max("lo").alias("lo_cents"),
        F.max("hi").alias("hi_cents"),
    )


@q(
    "q222_pareto_skyline",
    """WITH p AS (
         SELECT DISTINCT
                CAST(floor(CAST(p_retailprice AS DOUBLE) * 100) AS BIGINT)
                  AS price_cents,
                CAST(p_size AS BIGINT) AS p_size
         FROM part)
       SELECT price_cents, p_size
       FROM p a
       WHERE NOT EXISTS (
         SELECT 1 FROM p b
         WHERE b.price_cents <= a.price_cents
           AND b.p_size >= a.p_size
           AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))""",
)
def q222(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto frontier (`operators/pareto.py: skyline_2d`): the
    non-dominated (minimize retail price, maximize size) part
    configurations.  The operator NEVER self-joins: a partial-combined
    groupBy collapses min-axis ties to their best max, then ONE
    ordered pass marks dominance with a strictly-preceding running max
    (rangeBetween ending at -1 on the price axis) — O(n log n) against
    the textbook O(n²) dominance anti-join, which is exactly what the
    ORACLE runs (NOT EXISTS over all pairs): the two independent
    algorithms agreeing IS the check.  The phase-2 window is
    unpartitioned by design but runs over the reduced |distinct price|
    set (grid-bounded), as the operator docstring's 100 TB note
    spells out.  Pareto sweeps (threshold-vs-recall, cost-vs-quality)
    are the standard way to pick pipeline operating points."""
    from ..operators.pareto import skyline_2d

    p = load_table(spark, sf, "part").select(
        F.floor(F.col("p_retailprice").cast("double") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    return skyline_2d(p, "price_cents", "p_size")


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
           CASE WHEN status = 'both' THEN (q1 - q0) * (r0 / q0)
                WHEN status = 'new' THEN r1 ELSE -r0 END AS vol,
           CASE WHEN status = 'both'
                THEN (r1 / q1 - r0 / q0) * q0 ELSE 0.0 END AS pr,
           CASE WHEN status = 'both'
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


_Q333_ORACLE = """
  WITH k AS (
    SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey),
  g AS (
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(max(n) AS BIGINT) AS max_rows
    FROM k),
  top AS (
    SELECT key, n,
           row_number() OVER (ORDER BY n DESC, key ASC) AS rn
    FROM k)
  SELECT t.key AS hot_key, t.n AS hot_rows,
         g.n_keys, g.total_rows,
         CAST((1000 * g.max_rows * g.n_keys) // g.total_rows AS BIGINT)
           AS skew_factor_milli,
         CAST((g.max_rows * g.n_keys + g.total_rows - 1)
              // g.total_rows AS BIGINT) AS recommended_salt
  FROM top t CROSS JOIN g WHERE t.rn <= 5"""


@q("q333_join_skew_planner", _Q333_ORACLE)
def q333(spark: SparkSession, sf: str) -> DataFrame:
    """Join-skew planner: per-key cardinality histogram of the
    orders-side join key, the top-5 heaviest keys, the skew factor
    (max/avg, milli-units, exact integer arithmetic), and the salt
    count a salted join (q79) would need — ceil(max/avg) splits the
    hottest key's partition back to average size.  This is the
    MEASUREMENT that decides between a plain shuffle join, AQE skew
    handling, and explicit salting BEFORE burning a 100 TB shuffle;
    one partial-aggregated count plus arithmetic on the |keys|-row
    histogram.  All integers — no float ratio can dither the
    recommendation across engines."""
    orders = load_table(spark, sf, "orders")
    k = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    g = k.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
    )
    top = k.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("n").desc(), F.col("key").asc())
        ),
    ).where(F.col("rn") <= 5)
    return top.crossJoin(g).select(
        F.col("key").alias("hot_key"),
        F.col("n").alias("hot_rows"),
        "n_keys",
        "total_rows",
        F.expr("(1000 * max_rows * n_keys) DIV total_rows")
        .cast("bigint")
        .alias("skew_factor_milli"),
        F.expr("(max_rows * n_keys + total_rows - 1) DIV total_rows")
        .cast("bigint")
        .alias("recommended_salt"),
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


_Q337_ORACLE = """
  WITH sh AS (
    SELECT c_custkey AS k,
           CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c,
           c_custkey % 8 AS shard
    FROM customer),
  loc AS (
    SELECT k, bal_c FROM (
      SELECT k, bal_c,
             row_number() OVER (PARTITION BY shard
                                ORDER BY bal_c DESC, k ASC) AS rn
      FROM sh) WHERE rn <= 10),
  merged AS (
    SELECT k, bal_c,
           row_number() OVER (ORDER BY bal_c DESC, k ASC) AS rnk
    FROM loc),
  direct AS (
    SELECT k, bal_c,
           row_number() OVER (ORDER BY bal_c DESC, k ASC) AS rnk
    FROM sh)
  SELECT m.rnk AS rnk, m.k AS key_merged, d.k AS key_direct,
         m.bal_c AS bal_merged_c, d.bal_c AS bal_direct_c,
         (m.k = d.k AND m.bal_c = d.bal_c) AS agree
  FROM merged m JOIN direct d ON m.rnk = d.rnk
  WHERE m.rnk <= 10"""


@q("q337_local_topk_merge_contract", _Q337_ORACLE)
def q337(spark: SparkSession, sf: str) -> DataFrame:
    """Local-top-k merge contract: the global top-10 of the UNION of
    per-shard top-10s must equal the direct global top-10 — the
    algebra (top-k of a union of top-ks IS the union's top-k, q303's
    KMV argument applied to ranking) that justifies every
    tree-aggregated distributed top-k: each of 1000 executors ships
    k rows, never its partition, and the coordinator merges 1000*k
    rows regardless of table size.  Spark's TakeOrderedAndProject
    does exactly this internally; the contract makes the safety
    property an oracle-checked row-for-row assertion (deterministic
    key tiebreaks, cents-integer balances) instead of trust."""
    cust = load_table(spark, sf, "customer")
    sh = cust.select(
        F.col("c_custkey").alias("k"),
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
        (F.col("c_custkey") % 8).alias("shard"),
    )
    wloc = Window.partitionBy("shard").orderBy(
        F.col("bal_c").desc(), F.col("k").asc()
    )
    loc = (
        sh.withColumn("rn", F.row_number().over(wloc))
        .where(F.col("rn") <= 10)
        .select("k", "bal_c")
    )
    wglob = Window.orderBy(F.col("bal_c").desc(), F.col("k").asc())
    merged = loc.select(
        "k", "bal_c", F.row_number().over(wglob).alias("rnk")
    )
    direct = sh.select(
        "k", "bal_c", F.row_number().over(wglob).alias("rnk")
    )
    m, d = merged.alias("m"), direct.alias("d")
    return (
        m.join(d, F.col("m.rnk") == F.col("d.rnk"))
        .where(F.col("m.rnk") <= 10)
        .select(
            F.col("m.rnk").alias("rnk"),
            F.col("m.k").alias("key_merged"),
            F.col("d.k").alias("key_direct"),
            F.col("m.bal_c").alias("bal_merged_c"),
            F.col("d.bal_c").alias("bal_direct_c"),
            (
                (F.col("m.k") == F.col("d.k"))
                & (F.col("m.bal_c") == F.col("d.bal_c"))
            ).alias("agree"),
        )
    )


_Q338_ORACLE = """
  WITH docs AS (
    SELECT doc_id, text, length(text) AS n FROM documents),
  dims AS (
    SELECT doc_id, text, n // 16 AS h FROM docs WHERE n // 16 >= 8),
  tiles AS (
    SELECT doc_id, text, CAST(r AS INT) AS tr, CAST(c AS INT) AS tc
    FROM dims,
         LATERAL UNNEST(generate_series(0, h // 8 - 1)) a(r),
         LATERAL UNNEST(generate_series(0, 1)) b(c)),
  tb AS (
    SELECT doc_id, tr, tc,
           string_agg(
             substring(text, (tr * 8 + j) * 16 + tc * 8 + 1, 8),
             '' ORDER BY j) AS bytes
    FROM tiles, LATERAL UNNEST(generate_series(0, 7)) s(j)
    GROUP BY doc_id, tr, tc),
  en AS (
    SELECT doc_id, tr, tc,
           CAST(sum(ord(substring(bytes, CAST(k AS INT) + 1, 1)))
                AS BIGINT) AS energy
    FROM tb, LATERAL UNNEST(generate_series(0, 63)) e(k)
    GROUP BY doc_id, tr, tc)
  SELECT t.doc_id, t.tr AS tile_row, t.tc AS tile_col,
         md5(t.bytes) AS digest, e.energy
  FROM tb t
  JOIN en e ON t.doc_id = e.doc_id AND t.tr = e.tr AND t.tc = e.tc"""


@q("q338_image_tile_digests", _Q338_ORACLE)
def q338(spark: SparkSession, sf: str) -> DataFrame:
    """2D image-TILE extraction (`operators/multimodal.py:
    extract_image_tiles`): the payload as a row-major 16-byte-wide
    image, cut into 8x8 patches — the ViT-patch batch shape
    completing the multimodal family (q265 strided 1D frames, q305
    overlapping 1D windows, this is the 2D grid).  Every Python-
    boundary output cell replays in ANSI SQL: the tile digest is md5
    of 8 concatenated row-slices (pure substring arithmetic) and the
    energy is the 64-byte ord sum — so the Arrow crossing is
    value-checked cell by cell, the same discipline q305
    established for audio.  Partial edge tiles drop deterministically
    on both sides."""
    from ..operators.multimodal import attach_fake_media, extract_image_tiles

    docs = load_table(spark, sf, "documents")
    media = attach_fake_media(docs)
    return extract_image_tiles(
        media, id_col="doc_id", width=16, tile_h=8, tile_w=8
    )


_Q339_ORACLE = """
  WITH a AS (
    SELECT o_orderkey AS k,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderstatus AS status
    FROM orders),
  b AS (
    SELECT o_orderkey AS k,
           CAST(floor(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 499 = 0 THEN 1 ELSE 0 END
             AS cents,
           CASE WHEN o_orderkey % 701 = 0 THEN 'X'
                ELSE o_orderstatus END AS status
    FROM orders WHERE o_orderkey % 997 <> 0),
  j AS (
    SELECT a.k, b.k AS kb,
           (a.cents <> b.cents) AS pc,
           (a.status <> b.status) AS sc
    FROM a LEFT JOIN b ON a.k = b.k),
  kinds AS (
    SELECT CASE WHEN kb IS NULL THEN 'deleted'
                WHEN pc AND sc THEN 'both'
                WHEN pc THEN 'price_only'
                WHEN sc THEN 'status_only' END AS change_kind
    FROM j)
  SELECT change_kind, CAST(count(*) AS BIGINT) AS n_rows
  FROM kinds WHERE change_kind IS NOT NULL
  GROUP BY change_kind"""


@q("q339_column_change_histogram", _Q339_ORACLE)
def q339(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic snapshot diff at COLUMN granularity: q323's Merkle
    layer says WHICH buckets changed; this classifies each changed
    row by WHAT changed (price only / status only / both / deleted)
    — the CDC analytics that turns "the table drifted" into "the
    repricing job touched 0.2%, and 30 rows also flipped status,
    which it never should".  Snapshot B is the q323 deterministic
    mutation plus a status flip on a third cohort, so the expected
    histogram is exactly derivable; one key-equi LEFT join, kind
    classification in codegen, |kinds|-row output."""
    orders = load_table(spark, sf, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    a = orders.select(
        F.col("o_orderkey").alias("k"),
        cents.alias("cents"),
        F.col("o_orderstatus").alias("status"),
    )
    b = orders.where(F.col("o_orderkey") % 997 != 0).select(
        F.col("o_orderkey").alias("k"),
        (
            cents
            + F.when(F.col("o_orderkey") % 499 == 0, 1).otherwise(0)
        ).alias("cents"),
        F.when(F.col("o_orderkey") % 701 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
    )
    aa, bb = a.alias("a"), b.alias("b")
    j = aa.join(bb, F.col("a.k") == F.col("b.k"), "left").select(
        F.col("b.k").alias("kb"),
        (F.col("a.cents") != F.col("b.cents")).alias("pc"),
        (F.col("a.status") != F.col("b.status")).alias("sc"),
    )
    kind = (
        F.when(F.col("kb").isNull(), "deleted")
        .when(F.col("pc") & F.col("sc"), "both")
        .when(F.col("pc"), "price_only")
        .when(F.col("sc"), "status_only")
    )
    return (
        j.select(kind.alias("change_kind"))
        .where(F.col("change_kind").isNotNull())
        .groupBy("change_kind")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
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
    w = Window.orderBy("s", "l_orderkey", "l_linenumber")
    pr = scored.select(
        "lab",
        (F.rank().over(w) - 1).cast("bigint").alias("r0"),
        (F.count("*").over(Window.partitionBy()) - 1)
        .cast("bigint")
        .alias("d"),
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


_Q345_ORACLE = """
  WITH keys AS (
    SELECT o_orderkey AS k,
           CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)
                                       || '|ring-v1'), 1, 12))
                AS BIGINT) % 1000000 AS kpos
    FROM orders),
  ring8 AS (
    SELECT CAST(('0x' || substring(md5('node' || CAST(n AS VARCHAR)
                || 'v' || CAST(v AS VARCHAR)), 1, 12))
                AS BIGINT) % 1000000 AS rpos,
           CAST(min(n) AS INT) AS node
    FROM (SELECT unnest(generate_series(0, 7)) AS n) a
    CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS v) b
    GROUP BY 1),
  ring9 AS (
    SELECT CAST(('0x' || substring(md5('node' || CAST(n AS VARCHAR)
                || 'v' || CAST(v AS VARCHAR)), 1, 12))
                AS BIGINT) % 1000000 AS rpos,
           CAST(min(n) AS INT) AS node
    FROM (SELECT unnest(generate_series(0, 8)) AS n) a
    CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS v) b
    GROUP BY 1),
  iv8 AS (
    SELECT lo, hi, node FROM (
      SELECT lag(rpos) OVER (ORDER BY rpos) AS lo, rpos AS hi, node
      FROM ring8) WHERE lo IS NOT NULL
    UNION ALL
    SELECT -1, min(rpos), min_by(node, rpos) FROM ring8
    UNION ALL
    SELECT max(rpos), 1000000, min_by(node, rpos) FROM ring8),
  iv9 AS (
    SELECT lo, hi, node FROM (
      SELECT lag(rpos) OVER (ORDER BY rpos) AS lo, rpos AS hi, node
      FROM ring9) WHERE lo IS NOT NULL
    UNION ALL
    SELECT -1, min(rpos), min_by(node, rpos) FROM ring9
    UNION ALL
    SELECT max(rpos), 1000000, min_by(node, rpos) FROM ring9),
  n8 AS (
    SELECT k.k, i.node AS node8
    FROM keys k JOIN iv8 i ON k.kpos > i.lo AND k.kpos <= i.hi),
  n9 AS (
    SELECT k.k, i.node AS node9
    FROM keys k JOIN iv9 i ON k.kpos > i.lo AND k.kpos <= i.hi)
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN n8.node8 <> n9.node9 THEN 1 ELSE 0 END)
              AS BIGINT) AS moved,
         CAST((1000 * sum(CASE WHEN n8.node8 <> n9.node9
                               THEN 1 ELSE 0 END)) // count(*)
              AS BIGINT) AS moved_milli,
         ((1000 * sum(CASE WHEN n8.node8 <> n9.node9
                           THEN 1 ELSE 0 END)) // count(*))
           BETWEEN 60 AND 180 AS minimal_movement
  FROM n8 JOIN n9 ON n8.k = n9.k"""


@q("q345_consistent_hash_rebalance", _Q345_ORACLE)
def q345(spark: SparkSession, sf: str) -> DataFrame:
    """Consistent-hashing rebalance contract (Karger et al. 1997):
    keys and 16 virtual nodes per server hash onto a 10^6 ring
    (md5-derived — the q209/q243 determinism contract), each key
    belongs to the next ring point clockwise, and adding a NINTH
    server must move only ~1/9 of the keys (checked as a milli-rate
    band 60..180) — the minimal-movement property that makes shard
    rebalancing at 100 TB a 11% copy instead of a full reshuffle,
    proved on the actual assignment rather than cited.  The ring
    converts to a DISJOINT INTERVAL COVER (lag window + two wrap
    segments, ring-position collisions deduped to the min node), so
    assignment is one broadcast interval join producing EXACTLY one
    row per key — no per-key aggregation ever materializes (the
    naive min-over-ring formulation pushed 43M rows through two
    groupBys and ran 10x slower)."""
    orders = load_table(spark, sf, "orders")

    def hexint(col):
        return F.conv(F.substring(F.md5(col.cast("binary")), 1, 12),
                      16, 10).cast("bigint")

    keys = orders.select(
        F.col("o_orderkey").alias("k"),
        (
            hexint(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit("|ring-v1"),
                )
            )
            % 1000000
        ).alias("kpos"),
    )

    def ring(n_nodes):
        nodes = spark.range(n_nodes).select(
            F.col("id").cast("int").alias("node")
        )
        vns = spark.range(16).select(F.col("id").cast("int").alias("vn"))
        return (
            nodes.crossJoin(vns)
            .select(
                "node",
                (
                    hexint(
                        F.concat(
                            F.lit("node"),
                            F.col("node").cast("string"),
                            F.lit("v"),
                            F.col("vn").cast("string"),
                        )
                    )
                    % 1000000
                ).alias("rpos"),
            )
            .groupBy("rpos")
            .agg(F.min("node").cast("int").alias("node"))
        )

    def intervals(ringdf):
        w = Window.orderBy("rpos")
        mid = (
            ringdf.select(
                F.lag("rpos").over(w).alias("lo"),
                F.col("rpos").alias("hi"),
                "node",
            )
            .where(F.col("lo").isNotNull())
        )
        wrap = ringdf.agg(
            F.min("rpos").alias("mn"),
            F.max("rpos").alias("mx"),
            F.expr("min_by(node, rpos)").alias("first_node"),
        )
        lo_seg = wrap.select(
            F.lit(-1).cast("bigint").alias("lo"),
            F.col("mn").alias("hi"),
            F.col("first_node").alias("node"),
        )
        hi_seg = wrap.select(
            F.col("mx").alias("lo"),
            F.lit(1000000).cast("bigint").alias("hi"),
            F.col("first_node").alias("node"),
        )
        return mid.unionByName(lo_seg).unionByName(hi_seg)

    def assign(ringdf, out):
        return keys.join(
            F.broadcast(intervals(ringdf)),
            (F.col("kpos") > F.col("lo"))
            & (F.col("kpos") <= F.col("hi")),
        ).select("k", F.col("node").alias(out))

    n8 = assign(ring(8), "node8")
    n9 = assign(ring(9), "node9")
    moved = F.sum(
        F.when(F.col("node8") != F.col("node9"), 1).otherwise(0)
    )
    rate = F.expr(
        "(1000 * sum(CASE WHEN node8 <> node9 THEN 1 ELSE 0 END))"
        " DIV count(*)"
    )
    return n8.join(n9, "k").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        moved.cast("bigint").alias("moved"),
        rate.cast("bigint").alias("moved_milli"),
        rate.between(60, 180).alias("minimal_movement"),
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

_Q350_ORACLE = """
  WITH s AS (
    SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
             AS m,
           o_custkey AS c,
           CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS v
    FROM orders GROUP BY 1, 2),
  r AS (
    SELECT m, c,
           CAST(row_number() OVER (PARTITION BY m ORDER BY v DESC, c)
                AS BIGINT) AS rk
    FROM s),
  t AS (SELECT m, c, rk FROM r WHERE rk <= 10),
  mn AS (SELECT min(m) AS m0 FROM t),
  j AS (
    SELECT cur.m, cur.c, cur.rk AS rk_cur, prev.rk AS rk_prev
    FROM t cur LEFT JOIN t prev
      ON prev.m = cur.m - 1 AND prev.c = cur.c
    CROSS JOIN mn WHERE cur.m > mn.m0)
  SELECT m,
         CAST(count(*) AS BIGINT) AS n_top,
         CAST(sum(CASE WHEN rk_prev IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN rk_prev IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_stay,
         CAST(sum(CASE WHEN rk_prev IS NOT NULL
                       THEN abs(rk_cur - rk_prev) ELSE 0 END)
              AS BIGINT) AS churn_abs
  FROM j GROUP BY m"""


@q("q350_heavy_hitter_churn", _Q350_ORACLE)
def q350(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-month churn of the top-10 customer leaderboard:
    how many of this month's heavy hitters are new entrants, how many
    held over, and the total rank movement among holders — the
    stability diagnostic that tells a curation pipeline whether its
    'hot sources' list (or an abuse team whether its heavy-user list)
    is a stable population or a revolving door.  Revenue stays in
    integer cents, ranks tie-break on the customer key, and the
    leaderboard self-join runs AFTER the per-month top-10 cut, so the
    join touches 10 rows per month regardless of data volume; the
    per-month cut itself is a rank window that WindowGroupLimit
    prunes before the full sort materializes."""
    orders = load_table(spark, sf, "orders")
    s = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("m"),
        F.col("o_custkey").alias("c"),
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    from pyspark import StorageLevel

    # t is ~10 rows/month but costs a full orders scan + agg + window to
    # build; it feeds three consumers (cur side, prev side, min-month) —
    # persist so the leaderboard is computed once
    t = (
        s.withColumn(
            "rk",
            F.row_number()
            .over(Window.partitionBy("m").orderBy(F.desc("v"), "c"))
            .cast("bigint"),
        )
        .where(F.col("rk") <= 10)
        .select("m", "c", "rk")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mn = t.agg(F.min("m").alias("m0"))
    prev = t.select(
        (F.col("m") + 1).alias("m"), "c", F.col("rk").alias("rk_prev")
    )
    j = (
        t.join(prev, ["m", "c"], "left")
        .crossJoin(F.broadcast(mn))
        .where(F.col("m") > F.col("m0"))
    )
    return j.groupBy("m").agg(
        F.count("*").cast("bigint").alias("n_top"),
        F.sum(F.when(F.col("rk_prev").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("rk_prev").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stay"),
        F.sum(
            F.when(
                F.col("rk_prev").isNotNull(),
                F.abs(F.col("rk") - F.col("rk_prev")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("churn_abs"),
    )


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
    from pyspark import StorageLevel

    w = tch.select(
        "user_id",
        "ch",
        "ps",
        F.row_number().over(uw).alias("t"),
        F.lead("ch").over(uw).alias("nxt"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
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


_Q360_ORACLE = """
  WITH nc AS (SELECT CAST(10 * count(*) AS BIGINT) AS off FROM customer),
  tgt AS (SELECT CAST(c_custkey AS BIGINT) AS k,
                 CAST(floor(c_acctbal * 100) AS BIGINT) AS bal
          FROM customer),
  src AS (
    SELECT CAST(c_custkey AS BIGINT) AS k,
           CAST(floor(c_acctbal * 100) AS BIGINT) + 1000 AS bal
    FROM customer WHERE c_custkey % 10 < 8
    UNION ALL
    SELECT CAST(c_custkey AS BIGINT) + nc.off,
           CAST(floor(c_acctbal * 100) AS BIGINT)
    FROM customer, nc WHERE c_custkey % 100 = 7),
  m AS (
    SELECT coalesce(s.k, t.k) AS k, t.bal AS tbal, s.bal AS sbal,
           CASE WHEN t.k IS NULL THEN 'insert'
                WHEN s.k IS NULL THEN 'delete'
                ELSE 'update' END AS action
    FROM tgt t FULL OUTER JOIN src s ON t.k = s.k)
  SELECT action,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN action = 'delete' THEN 0
                       ELSE sbal END) AS BIGINT) AS surviving_balance
  FROM m GROUP BY action"""


@q("q360_merge_full_sync", _Q360_ORACLE)
def q360(spark: SparkSession, sf: str) -> DataFrame:
    """Full snapshot synchronization — MERGE with all three branches
    including WHEN NOT MATCHED BY SOURCE THEN DELETE (the Spark 4 SQL
    surface q133's upsert stops short of): matched rows take the
    source balance, source-only rows insert, and target rows ABSENT
    from the source are deleted — the semantics a warehouse mirror of
    an operational table needs (upsert alone leaks tombstones
    forever).  Emulated engine-side as ONE full outer join on the
    key (the shape Delta/Iceberg execute underneath); the summary
    proves each branch fired and checksums the surviving balances in
    exact cents."""
    cust = load_table(spark, sf, "customer")
    n = cust.count()
    tgt = cust.select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("tbal"),
    )
    src = (
        cust.where(F.col("c_custkey") % 10 < 8)
        .select(
            F.col("c_custkey").cast("bigint").alias("k"),
            (F.floor(F.col("c_acctbal") * 100).cast("bigint") + 1000).alias("sbal"),
        )
        .unionAll(
            cust.where(F.col("c_custkey") % 100 == 7).select(
                (F.col("c_custkey").cast("bigint") + 10 * n).alias("k"),
                F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("sbal"),
            )
        )
    )
    m = tgt.join(src, "k", "full_outer").select(
        F.when(F.col("tbal").isNull(), "insert")
        .when(F.col("sbal").isNull(), "delete")
        .otherwise("update")
        .alias("action"),
        "sbal",
    )
    return m.groupBy("action").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("action") == "delete", 0).otherwise(F.col("sbal"))
        )
        .cast("bigint")
        .alias("surviving_balance"),
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
    from pyspark import StorageLevel

    # the 2-row moment frame feeds six consumers (3 unpivot branches
    # x 2 arm splits); persist so events is scanned once
    m = a.selectExpr(
        "arm",
        "CAST(n AS DOUBLE) AS nd",
        "CAST(sx AS DOUBLE) AS sx", "CAST(sxx AS DOUBLE) AS sxx",
        "CAST(sy AS DOUBLE) AS sy", "CAST(syy AS DOUBLE) AS syy",
        "CAST(st AS DOUBLE) AS st", "CAST(stt AS DOUBLE) AS stt",
    ).persist(StorageLevel.MEMORY_AND_DISK)
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


_Q364_ORACLE = """
  WITH per AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS bytes
    FROM documents GROUP BY lang),
  t AS (
    SELECT lang, n_docs, bytes,
           sum(bytes) OVER () AS total_bytes,
           count(*) OVER () AS n_parts
    FROM per)
  SELECT lang, n_docs, bytes,
         CAST((bytes + 262143) // 262144 AS BIGINT) AS n_files,
         CAST(bytes // ((bytes + 262143) // 262144) AS BIGINT)
           AS avg_file_bytes,
         bytes * n_parts > 2 * total_bytes AS skewed
  FROM t"""


@q("q364_partition_layout_advisor", _Q364_ORACLE)
def q364(spark: SparkSession, sf: str) -> DataFrame:
    """Partition layout advisor for a hive-partitioned sink (the q112
    pruning layout): per partition key, the byte mass, the file count
    a 256 KiB-target writer should emit ((bytes + t - 1) DIV t — the
    ceil that avoids both the small-file problem q144 compacts away
    and the one-giant-file problem that kills scan parallelism), the
    resulting average file size, and a 2x-over-mean skew flag — the
    key whose partition needs q79-style salting or sub-partitioning.
    One partial-agg scan + wall windows over the |keys|-row frame;
    all integer arithmetic."""
    docs = load_table(spark, sf, "documents")
    per = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bytes"),
    )
    wall = Window.partitionBy()
    t = per.select(
        "lang",
        "n_docs",
        "bytes",
        F.sum("bytes").over(wall).alias("total_bytes"),
        F.count("*").over(wall).alias("n_parts"),
    )
    return t.selectExpr(
        "lang",
        "n_docs",
        "bytes",
        "CAST((bytes + 262143) DIV 262144 AS BIGINT) AS n_files",
        "CAST(bytes DIV ((bytes + 262143) DIV 262144) AS BIGINT)"
        " AS avg_file_bytes",
        "bytes * n_parts > 2 * total_bytes AS skewed",
    )


# =========================================================================
# Bitemporal point-in-time + temporal split audit + t-closeness (Q366-Q368)
# =========================================================================

_Q366_ORACLE = """
  WITH v AS (
    SELECT o_custkey AS k,
           o_orderdate AS valid_from,
           o_orderdate + INTERVAL 10 DAY AS tx_from,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS bal,
           o_orderkey
    FROM orders),
  q AS (
    SELECT k, bal, valid_from, o_orderkey,
           row_number() OVER (
             PARTITION BY k
             ORDER BY valid_from DESC, o_orderkey DESC) AS rn
    FROM v
    WHERE valid_from <= TIMESTAMP '1998-06-01'
      AND tx_from <= TIMESTAMP '1998-06-05'),
  pit AS (SELECT k, bal, valid_from FROM q WHERE rn = 1)
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(bal) AS BIGINT) AS total_balance,
         CAST(min(valid_from) AS DATE) AS oldest_version,
         CAST(max(valid_from) AS DATE) AS newest_version
  FROM pit"""


@q("q366_bitemporal_point_in_time", _Q366_ORACLE)
def q366(spark: SparkSession, sf: str) -> DataFrame:
    """Bitemporal time travel — 'what did we BELIEVE on 1998-06-05
    about the state as of 1998-06-01': each order is a version with a
    VALID time (when it was true) and a TRANSACTION time (when the
    warehouse learned it, here valid+10d to model late-arriving
    records).  q180's SCD2 point-in-time answers only the first
    question; the second axis is what makes restatements auditable
    (Snodgrass 1999).  Both predicates push into the scan, the
    last-version-per-key cut is one rank window (WindowGroupLimit),
    and the audit rolls up to exact cents."""
    orders = load_table(spark, sf, "orders")
    v = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("valid_from"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10 DAY")).alias("tx_from"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("bal"),
        "o_orderkey",
    )
    q_ = (
        v.where(
            (F.col("valid_from") <= F.lit("1998-06-01").cast("timestamp"))
            & (F.col("tx_from") <= F.lit("1998-06-05").cast("timestamp"))
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("k").orderBy(
                    F.desc("valid_from"), F.desc("o_orderkey")
                )
            ),
        )
        .where(F.col("rn") == 1)
    )
    return q_.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("bal").cast("bigint").alias("total_balance"),
        F.min("valid_from").cast("date").alias("oldest_version"),
        F.max("valid_from").cast("date").alias("newest_version"),
    )


_Q367_ORACLE = """
  WITH e AS (
    SELECT user_id, event_type, ts,
           CAST(floor(coalesce(value, 0) * 100) AS BIGINT) AS c,
           ts < TIMESTAMP '2024-01-22' AS is_train
    FROM events),
  users AS (
    SELECT user_id,
           max(CASE WHEN is_train THEN 1 ELSE 0 END) AS in_train,
           max(CASE WHEN is_train THEN 0 ELSE 1 END) AS in_test
    FROM e GROUP BY user_id),
  types AS (
    SELECT event_type,
           max(CASE WHEN is_train THEN 1 ELSE 0 END) AS in_train,
           max(CASE WHEN is_train THEN 0 ELSE 1 END) AS in_test
    FROM e GROUP BY event_type),
  agg AS (
    SELECT CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
             AS n_test,
           CAST(sum(CASE WHEN is_train THEN c ELSE 0 END) AS BIGINT)
             AS c_train,
           CAST(sum(CASE WHEN is_train THEN 0 ELSE c END) AS BIGINT)
             AS c_test
    FROM e)
  SELECT a.n_train, a.n_test,
         (SELECT CAST(sum(CASE WHEN in_train = 1 AND in_test = 1
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM users) AS n_straddling_users,
         (SELECT CAST(sum(CASE WHEN in_train = 0 AND in_test = 1
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM types) AS n_cold_start_types,
         CAST((1000 * a.c_train) // a.n_train AS BIGINT)
           AS train_mean_milli,
         CAST((1000 * a.c_test) // a.n_test AS BIGINT)
           AS test_mean_milli
  FROM agg a"""


@q("q367_temporal_split_audit", _Q367_ORACLE)
def q367(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal train/test split audit: cut events at 2024-01-22 and
    report the three things that silently break offline evaluation —
    users present on BOTH sides (identity leakage: per-user features
    fit on train memorize test users), event types that appear ONLY
    in test (cold-start: the model never saw the category), and the
    value drift between periods (a shifted metric makes train-tuned
    thresholds stale).  The q166 cluster-split answers the embedding
    version of this; time-based splits need their own audit because
    the clock, not a hash, assigns rows.  ONE conditional-sum scan
    (the q173 discipline) + two tiny side rollups; means in integer
    milli-cents."""
    ev = load_table(spark, sf, "events")
    e = ev.select(
        "user_id",
        "event_type",
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100)
        .cast("bigint")
        .alias("c"),
        (F.col("ts") < F.lit("2024-01-22").cast("timestamp")).alias(
            "is_train"
        ),
    )
    users = e.groupBy("user_id").agg(
        F.max(F.when(F.col("is_train"), 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("is_train"), 0).otherwise(1)).alias("in_test"),
    )
    straddle = users.agg(
        F.sum(
            F.when((F.col("in_train") == 1) & (F.col("in_test") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_straddling_users")
    )
    types = e.groupBy("event_type").agg(
        F.max(F.when(F.col("is_train"), 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("is_train"), 0).otherwise(1)).alias("in_test"),
    )
    cold = types.agg(
        F.sum(
            F.when((F.col("in_train") == 0) & (F.col("in_test") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_cold_start_types")
    )
    agg = e.agg(
        F.sum(F.when(F.col("is_train"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("is_train"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_test"),
        F.sum(F.when(F.col("is_train"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("c_train"),
        F.sum(F.when(F.col("is_train"), 0).otherwise(F.col("c")))
        .cast("bigint")
        .alias("c_test"),
    )
    return (
        agg.crossJoin(F.broadcast(straddle))
        .crossJoin(F.broadcast(cold))
        .selectExpr(
            "n_train",
            "n_test",
            "n_straddling_users",
            "n_cold_start_types",
            "CAST((1000 * c_train) DIV n_train AS BIGINT)"
            " AS train_mean_milli",
            "CAST((1000 * c_test) DIV n_test AS BIGINT)"
            " AS test_mean_milli",
        )
    )


_Q368_ORACLE = """
  WITH r AS (
    SELECT c_nationkey % 5 AS qi_group,
           least(greatest(CAST(floor((c_acctbal + 1000.0) / 1100.0)
                AS BIGINT), 0), 9) AS band
    FROM customer),
  cell AS (
    SELECT qi_group, band, CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY qi_group, band),
  gl AS (SELECT band, CAST(sum(n) AS BIGINT) AS gn FROM cell
         GROUP BY band),
  gt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cell),
  grp AS (SELECT qi_group, CAST(sum(n) AS BIGINT) AS grp_n FROM cell
          GROUP BY qi_group),
  full_grid AS (
    SELECT g.qi_group, b.band, g.grp_n, b.gn, t.tot,
           coalesce(c.n, 0) AS n
    FROM grp g CROSS JOIN gl b CROSS JOIN gt t
    LEFT JOIN cell c ON c.qi_group = g.qi_group AND c.band = b.band),
  cums AS (
    SELECT qi_group, grp_n,
           sum(CAST(n AS DOUBLE) / grp_n
               - CAST(gn AS DOUBLE) / tot)
             OVER (PARTITION BY qi_group ORDER BY band) AS cdiff,
           CAST(count(*) OVER (PARTITION BY qi_group) AS BIGINT)
             AS n_bands
    FROM full_grid)
  SELECT qi_group, CAST(max(grp_n) AS BIGINT) AS n_members,
         round(sum(abs(cdiff)) / max(n_bands), 6) AS t_closeness_r,
         sum(abs(cdiff)) / max(n_bands) > 0.15 AS violates_t015
  FROM cums GROUP BY qi_group"""


@q("q368_t_closeness_audit", _Q368_ORACLE)
def q368(spark: SparkSession, sf: str) -> DataFrame:
    """t-closeness audit (Li-Li-Venkatasubramanian, ICDE 2007) — the
    third leg of the publication-privacy trio after q255 k-anonymity
    and q291 l-diversity: for each quasi-identifier group, the
    1-Wasserstein (EMD) distance between the group's sensitive-value
    distribution (account balance in 10 ordered bands) and the global
    one; a group whose distribution sits far from global leaks the
    sensitive attribute EVEN IF it is k-anonymous and l-diverse.  The
    EMD over ordered bands is the mean |cumulative difference| — one
    contingency groupBy, the dense group x band grid assembled from
    the tiny marginal frames, and a per-group cumulative window; the
    only floats are fractions of exact counts."""
    from pyspark import StorageLevel

    cust = load_table(spark, sf, "customer")
    r = cust.select(
        (F.col("c_nationkey") % 5).alias("qi_group"),
        F.expr(
            "least(greatest(CAST(floor((c_acctbal + 1000.0D) / 1100.0D)"
            " AS BIGINT), 0), 9)"
        ).alias("band"),
    )
    cell = (
        r.groupBy("qi_group", "band")
        .agg(F.count("*").cast("bigint").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    gl = cell.groupBy("band").agg(F.sum("n").cast("bigint").alias("gn"))
    gt = cell.agg(F.sum("n").cast("bigint").alias("tot"))
    grp = cell.groupBy("qi_group").agg(
        F.sum("n").cast("bigint").alias("grp_n")
    )
    full_grid = (
        grp.crossJoin(F.broadcast(gl))
        .crossJoin(F.broadcast(gt))
        .join(cell, ["qi_group", "band"], "left")
        .select(
            "qi_group",
            "band",
            "grp_n",
            "gn",
            "tot",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    wc = Window.partitionBy("qi_group").orderBy("band")
    wg = Window.partitionBy("qi_group")
    cums = full_grid.select(
        "qi_group",
        "grp_n",
        F.sum(
            F.col("n").cast("double") / F.col("grp_n")
            - F.col("gn").cast("double") / F.col("tot")
        )
        .over(wc)
        .alias("cdiff"),
        F.count("*").over(wg).cast("bigint").alias("n_bands"),
    )
    return cums.groupBy("qi_group").agg(
        F.max("grp_n").cast("bigint").alias("n_members"),
        F.round(F.sum(F.abs("cdiff")) / F.max("n_bands"), 6).alias(
            "t_closeness_r"
        ),
        (F.sum(F.abs("cdiff")) / F.max("n_bands") > 0.15).alias(
            "violates_t015"
        ),
    )


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
    from pyspark import StorageLevel

    orders = load_table(spark, sf, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    idx = d.select(
        "v",
        F.row_number().over(Window.orderBy("day")).alias("i"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
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
