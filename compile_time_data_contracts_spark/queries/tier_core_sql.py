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


