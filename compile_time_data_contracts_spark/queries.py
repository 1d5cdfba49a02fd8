"""The declared query inventory (SURVEY.md §2.2, Q01-Q52 + extensions).

Every entry is registered as (name -> spark_fn, name -> oracle_sql) where
the oracle is ANSI SQL runnable by DuckDB over the same parquet tables.
The driver hash-compares both sides at sf=0.01 (rows sorted, columns
sorted by name), so:

  * every computed column is aliased identically on both sides,
  * doubles are rounded (2 dp for money, 4-6 dp for ratios) on BOTH sides
    so double-summation-order ulp differences can't flip the hash,
  * timestamps are emitted as formatted strings or DATEs (parquet ns vs
    Spark us precision would otherwise desync the value hash),
  * BIGINT casts pin DuckDB's hugeint sums to Spark's long.

Queries with no oracle entry (approx sketches, LSH-recall paths, SimHash)
get the driver's weaker rows-only check by design.
"""

from __future__ import annotations

import typing
from collections.abc import Callable
from typing import Optional  # noqa: F401  (q52 contract annotation resolution)

import pandas as pd  # noqa: F401  (q122 pandas_udf annotation resolution)

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .contracts.policies import SchemaPolicy
# module-level so PEP 563 string annotations on function-local contract
# dataclasses (q52) resolve against module globals
from .contracts.types import int32  # noqa: F401
from .operators.asof import asof_join
from .operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_index_reuse_or_build,
    minhash_near_dup_pairs,
    near_dup_against,
    normalize_text,
    simhash,
    simhash_table,
)
from .operators.multimodal import attach_fake_media, extract_media_features
from .operators.similarity import (
    cosine_pairs,
    cosine_pairs_exact,
    cosine_pairs_exact_blas,
    cosine_pairs_lsh,
    topk_cosine,
)
from .operators.sampling import deterministic_sample, pack_sequences
from .operators.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    language_id,
    punct_ratio,
    redact_pii,
    stopword_ratio,
    token_count,
    token_diversity,
    winnow_fingerprint,
)
from .operators.topk import topk_per_group

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def q(name: str, oracle: typing.Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _ts_str(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# =========================================================================
# Scans / sources / sinks (Q01-Q04)
# =========================================================================

@q("q01_parquet_count", "SELECT count(*) AS n FROM lineitem")
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "lineitem").agg(F.count("*").alias("n"))


@q(
    "q02_csv_roundtrip",
    """SELECT count(*) AS n_rows, count(c_acctbal) AS n_acctbal
       FROM customer""",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    """Reference demo path (CtdcPoc.scala:114): CSV read with explicit
    contract schema, never inferred.  Round-trips customer through CSV."""
    from .catalog import Customer
    from .sources.io import Source, read_df

    path = "/tmp/ctdc_q02_customer_csv"
    load_table(spark, sf, "customer").write.mode("overwrite").option(
        "header", "true"
    ).csv(path)
    df = read_df(spark, Source(Customer, "csv", path, {"header": "true"}))
    return df.agg(
        F.count("*").alias("n_rows"), F.count("c_acctbal").alias("n_acctbal")
    )


@q(
    "q03_json_scan",
    """SELECT count(*) AS n,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
       FROM events""",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    parsed = ev.withColumn("k", F.from_json(F.col("props"), "k INT")["k"])
    return parsed.agg(
        F.count("*").alias("n"), F.sum("k").cast("bigint").alias("sum_k")
    )


@q("q04_parquet_sink_roundtrip", "SELECT r_regionkey, r_name FROM region")
def q04(spark: SparkSession, sf: str) -> DataFrame:
    """Contract-pinned parquet sink + re-read (R3, SparkCore.scala:355-360)."""
    from .catalog import Region
    from .sources.io import Sink, write_df

    df = load_table(spark, sf, "region")
    path = "/tmp/ctdc_q04_region_parquet"
    write_df(df, Sink(Region, path), SchemaPolicy.EXACT)
    return spark.read.parquet(path).select("r_regionkey", "r_name")


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


@q(
    "q44_watermark_stream",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
              count(*) AS n
       FROM events GROUP BY 1""",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    """True Structured Streaming: file source -> watermark -> tumbling
    window agg -> memory sink, run to completion with availableNow.
    Complete output mode makes the final state equal the batch answer, so
    the batch SQL oracle applies.  (Append-mode late-data drop semantics
    are exercised in tests/test_streaming.py with a two-batch feed.)"""
    from .streaming.windows import run_stream_to_memory

    return run_stream_to_memory(spark, sf)


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


# =========================================================================
# LLM-data-pipeline extensions (Q48+)
# =========================================================================

@q(
    "q48_exact_dedup",
    """SELECT count(*) AS n_docs,
              CAST(count(DISTINCT sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                   AS BIGINT) AS n_unique
       FROM documents""",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass form: count + distinct-hash count in one scan (the
    exact_dedup operator itself — dropDuplicates on the hash — is
    library API, exercised in tests)."""
    from .operators.dedup import normalize_text

    docs = load_table(spark, sf, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.sha2(normalize_text("text"), 256))
        .cast("bigint")
        .alias("n_unique"),
    )


# embeddings are float32 on disk; both engines must do the cosine in
# DOUBLE or the 4-dp rounding can disagree in the 7th decimal
_COSINE_PAIRS_ORACLE = """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim_r
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
"""


@q("q49_neardup_cosine_exact", _COSINE_PAIRS_ORACLE)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    """Exact audit path via the size-guarded dispatcher: BLAS-broadcast
    blocks when the matrix fits the broadcast bound, the fully-distributed
    no-collect pair join above it — no gate query unconditionally
    collects a data-sized table to the driver."""
    emb = load_table(spark, sf, "embeddings")
    pairs = cosine_pairs(emb, threshold=0.45)
    return pairs.select(
        "vec_a", "vec_b", F.round("sim", 4).alias("sim_r")
    )


@q(
    "q50_topk_vector_search",
    """SELECT b.vec_id,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim_r
       FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) a
       CROSS JOIN embeddings b
       ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id
       LIMIT 10""",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    top = topk_cosine(emb, query, k=10)
    return top.select("vec_id", F.round("sim", 4).alias("sim_r"))


@q(
    "q51_token_stats",
    """SELECT lang,
              count(*) AS n_docs,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              round(avg(n_chars), 4) AS avg_chars
       FROM documents GROUP BY lang""",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@q(
    "q52_multimodal_contract",
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
              source AS meta_source
       FROM documents""",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """Nested struct/map/array column built, contract-validated
    (exercises derivation + deep comparator on nested types), written to
    parquet, re-read, flattened."""
    from dataclasses import dataclass
    from typing import Optional

    from .contracts.shape import contract as contract_deco
    from .contracts.types import int32
    from .runtime.pins import assert_matches_contract
    from .contracts.schema import spark_schema

    @contract_deco
    @dataclass
    class DocEnvelope:
        doc_id: int
        # map_from_arrays marks values nullable -> valueContainsNull=True,
        # which the strict comparator checks; the contract must say so
        meta: dict[str, Optional[str]]
        tokens: list[str]
        n_tokens: int32

    docs = load_table(spark, sf, "documents")
    enveloped = docs.select(
        F.col("doc_id"),
        F.map_from_arrays(
            F.array(F.lit("lang"), F.lit("source")),
            F.array(F.col("lang"), F.col("source")),
        ).alias("meta"),
        F.split("text", " ").alias("tokens"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    # containsNull/valueContainsNull come back False from these builders,
    # matching the strict contract
    assert_matches_contract(
        enveloped.schema, spark_schema(DocEnvelope), SchemaPolicy.EXACT,
        context="q52 envelope",
    )
    path = "/tmp/ctdc_q52_envelope_parquet"
    enveloped.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.select(
        "doc_id",
        F.col("n_tokens"),
        F.element_at("meta", "source").alias("meta_source"),
    )


# co-occurrence form (shingle-join + per-doc set sizes) rather than an
# O(n²) list_intersect cross join — same answer for any threshold > 0,
# ~10× faster in the driver's correctness gate
_JACCARD_ORACLE = """
    WITH sh AS (
      SELECT DISTINCT doc_id,
             concat_ws('|', toks[gs], toks[gs+1], toks[gs+2]) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL UNNEST(generate_series(1, greatest(len(toks) - 2, 1))) t(gs)
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard_r
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
"""


@q("q53_ngram_jaccard_neardup", _JACCARD_ORACLE)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    """Exact all-pairs word-3-gram Jaccard — the correctness baseline for
    near-dup detection."""
    docs = load_table(spark, sf, "documents")
    pairs = jaccard_pairs(docs, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard_r")
    )


@q("q54_minhash_lsh_neardup", _JACCARD_ORACLE)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH banding + exact verification — the 100 TB path.  With
    32 hashes / 16 bands the candidate recall at Jaccard>=0.5 is >0.9999,
    so the verified output equals the exact all-pairs oracle."""
    docs = load_table(spark, sf, "documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard_r")
    )


@q("q55_simhash")  # 64-bit signature: not SQL-expressible, rows-only check
def q55(spark: SparkSession, sf: str) -> DataFrame:
    """Explode + one map-side-combined aggregate (simhash_table) — no
    interpreted HOF in the plan; bit-identical to the simhash()
    expression form (pinned by test_simhash_table_matches_expression)."""
    docs = load_table(spark, sf, "documents")
    return simhash_table(docs, "doc_id", "text")


@q("q56_cosine_lsh_pairs")  # recall<1 by construction: rows-only check
def q56(spark: SparkSession, sf: str) -> DataFrame:
    """Hyperplane-LSH bucketed cosine self-join — the ANN scale path; the
    exact-join audit is q49."""
    emb = load_table(spark, sf, "embeddings")
    pairs = cosine_pairs_lsh(
        emb, threshold=0.45, bits=None, tables=16, probes="auto", dim=64
    )
    return pairs.select("vec_a", "vec_b", F.round("sim", 4).alias("sim_r"))


@q(
    "q57_text_quality",
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
              round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                    / length(text)::DOUBLE, 6) AS punct_r,
              round(len(list_filter(string_split(lower(text), ' '),
                        t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
                    / len(string_split(text, ' ')), 6) AS stopword_r,
              round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                    / len(string_split(text, ' ')), 6) AS diversity
       FROM documents""",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_r"),
        F.round(stopword_ratio("text"), 6).alias("stopword_r"),
        F.round(token_diversity("text"), 6).alias("diversity"),
    )


@q(
    "q58_token_count",
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
              CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INT) AS bpe_tokens
       FROM documents""",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    )


@q(
    "q59_fingerprint",
    """SELECT doc_id,
              md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_md5
       FROM documents""",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    """Whole-document md5 fingerprint (oracle-checked); the winnowing
    rolling-hash variant rides along as a rows-only extra column in q60."""
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", fingerprint_md5("text").alias("fp_md5"))


@q("q60_winnow_fingerprint")  # xxhash64-based: rows-only check
def q60(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id", winnow_fingerprint("text", k=5).alias("fp_winnow")
    )


@q(
    "q61_language_id",
    # the heuristic is deterministic and SQL-expressible: per-language
    # stopword-hit ratio, argmax with ties broken by declared language
    # order (en,es,fr,de,zh), 'und' when all scores are zero
    """WITH t AS (
         SELECT doc_id,
                list_transform(regexp_split_to_array(text, '\\s+'),
                               x -> lower(x)) AS toks
         FROM documents
       ), s AS (
         SELECT doc_id,
           len(list_filter(toks, x -> x IN ('the','a','of','and','to')))::DOUBLE / greatest(len(toks), 1) AS s_en,
           len(list_filter(toks, x -> x IN ('el','la','de','que','y')))::DOUBLE / greatest(len(toks), 1) AS s_es,
           len(list_filter(toks, x -> x IN ('le','la','de','et','un')))::DOUBLE / greatest(len(toks), 1) AS s_fr,
           len(list_filter(toks, x -> x IN ('der','die','das','und','ein')))::DOUBLE / greatest(len(toks), 1) AS s_de,
           len(list_filter(toks, x -> x IN ('的','是','了','在','我')))::DOUBLE / greatest(len(toks), 1) AS s_zh
         FROM t
       )
       SELECT doc_id,
         CASE WHEN greatest(s_en,s_es,s_fr,s_de,s_zh) = 0 THEN 'und'
              WHEN s_en = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'en'
              WHEN s_es = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'es'
              WHEN s_fr = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'fr'
              WHEN s_de = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'de'
              ELSE 'zh' END AS lang_guess
       FROM s""",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import language_id_table

    docs = load_table(spark, sf, "documents")
    return language_id_table(docs)


@q(
    "q62_multimodal_features",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len
       FROM documents""",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    """Binary media column + Arrow-batched mapInPandas feature extraction
    (decode stubbed; plumbing real)."""
    docs = load_table(spark, sf, "documents")
    media = attach_fake_media(docs)
    feats = extract_media_features(media)
    return feats.select("doc_id", "byte_len")


@q(
    "q63_stratified_sample",
    """SELECT lang, count(*) AS n_kept
       FROM documents
       WHERE ((doc_id * 2654435761) % 4294967296) * 10000 / 4294967296
             < (CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END)
       GROUP BY lang""",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: multiplicative-hash bucket on
    doc_id, per-language keep rates (en 50%, others 20%).  No RNG state:
    a row's fate depends only on its key, so retries and repartitioning
    never change the sample — required for resumable 100 TB jobs."""
    docs = load_table(spark, sf, "documents")
    kept = deterministic_sample(
        docs, rate=0.2, key_col="doc_id", strata_col="lang",
        rates={"en": 0.5},
    )
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


@q(
    "q64_pii_redaction",
    """SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  text || ' contact user' || doc_id ||
                  '@example.com or +1 555-000-' || doc_id,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                '\\+?[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS clean
       FROM documents""",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub: email/phone spans replaced with typed placeholders.
    Patterns restricted to Java-regex/RE2-shared syntax so the oracle
    evaluates identically; pure codegen regexp_replace, one scan."""
    docs = load_table(spark, sf, "documents")
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-000-"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return with_pii.select("doc_id", redact_pii("text").alias("clean"))


@q(
    "q65_pack_sequences",
    """SELECT doc_id, lang,
              CAST(floor(
                (sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n_tok) / 2048.0
              ) AS INT) AS pack_id
       FROM (SELECT doc_id, lang,
                    len(string_split(text, ' ')) AS n_tok
             FROM documents)""",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for pretraining batches: contiguous token-budget
    fill (2048 tokens) per language shard.  Sharded window => parallel
    packing, one shuffle on the shard key."""
    docs = load_table(spark, sf, "documents")
    with_tok = docs.select(
        "doc_id", "lang", token_count("text").alias("n_tok")
    )
    return pack_sequences(
        with_tok, budget=2048, order_col="doc_id", tokens_col="n_tok",
        shard_col="lang",
    ).select("doc_id", "lang", "pack_id")


@q(
    "q66_top_tokens",
    """SELECT tok, CAST(count(*) AS BIGINT) AS n
       FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
             FROM documents)
       GROUP BY tok
       ORDER BY n DESC, tok
       LIMIT 20""",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus top-20 tokens: explode + count + TakeOrdered.  The shuffle
    carries one row per (partition, token) after partial aggregation;
    the final top-k is a per-partition heap merge, no global sort."""
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
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
    "q70_python_udtf",
    """SELECT doc_id, CAST(sent_id AS INT) AS sent_id, sentence
       FROM (SELECT doc_id,
                    generate_subscripts(sents, 1) AS sent_id,
                    unnest(list_transform(sents, s -> trim(s))) AS sentence
             FROM (SELECT doc_id,
                          string_split_regex(text, '\\.\\s+') AS sents
                   FROM documents WHERE doc_id < 30))
       WHERE length(sentence) > 0""",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    """A real Python UDTF (Spark 3.5+ @udtf, SURVEY Q47's optional form):
    sentence segmentation emitting (sent_id, sentence) rows per doc.
    UDTFs run row-at-a-time in Python — appropriate for the bounded
    30-doc demo; the arrays+posexplode form (q47) is the scale path."""
    from pyspark.sql.functions import udtf, lit

    @udtf(returnType="sent_id int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            import re

            for i, s in enumerate(re.split(r"\.\s+", text or "")):
                s = s.strip()
                if s:
                    yield i + 1, s

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 30)
    docs.createOrReplaceTempView("q70_docs")
    spark.udtf.register("q70_sentences", SentenceSplit)
    return spark.sql(
        """SELECT doc_id, s.sent_id, s.sentence
           FROM q70_docs,
                LATERAL q70_sentences(doc_id, text) AS s"""
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
    "q72_keep_best_dedup",
    """SELECT CAST(count(*) AS BIGINT) AS n_kept,
              CAST(sum(doc_id) AS BIGINT) AS id_sum
       FROM (
         SELECT arg_max(doc_id, n_chars) AS doc_id
         FROM documents
         GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       )""",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-best exact dedup: one winner per normalized-text group,
    chosen by max n_chars (tie-broken identically in both engines since
    duplicate groups here are singletons or share n_chars order)."""
    from .operators.dedup import keep_best_dedup

    docs = load_table(spark, sf, "documents")
    kept = keep_best_dedup(docs, score_col="n_chars", ascending=False)
    return kept.agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


@q(
    "q73_neardup_clusters",
    """WITH RECURSIVE pairs AS (
         SELECT doc_a, doc_b FROM (
           WITH sh AS (
             SELECT DISTINCT doc_id,
                    concat_ws('|', toks[gs], toks[gs+1], toks[gs+2]) AS shingle
             FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                  LATERAL UNNEST(generate_series(1, greatest(len(toks) - 2, 1))) t(gs)
           ), sizes AS (
             SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
           ), inter AS (
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id
           )
           SELECT doc_a, doc_b FROM inter
           JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
           WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
         )
       ), edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION SELECT doc_b, doc_a FROM pairs
       ), reach(src, dst) AS (
         SELECT src, dst FROM edges
         UNION
         SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       )
       SELECT src AS doc_id,
              least(src, min(dst)) AS cluster_id
       FROM reach GROUP BY src""",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clustering: MinHash-LSH pairs -> connected components
    (min-label propagation), the standard choose-one-per-cluster step.
    Oracle computes the same clusters via transitive closure over the
    exact-Jaccard pair graph (recursive CTE)."""
    from .operators.dedup import connected_components

    docs = load_table(spark, sf, "documents")
    # 64 hashes / 32 bands: candidate probability at J=0.5 is
    # 1-(1-0.25)^32 ≈ 0.9999 (vs 0.986 with 16 bands), so the clustered
    # graph equals the exact-Jaccard oracle graph with margin
    pairs = minhash_near_dup_pairs(
        docs, threshold=0.5, num_hashes=64, bands=32
    )
    return connected_components(pairs)


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
    from .operators.timeseries import resample_ffill

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
    "q77_repetition_signal",
    """WITH bg AS (
         SELECT doc_id, concat_ws('|', toks[gs], toks[gs+1]) AS bigram
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
              LATERAL UNNEST(generate_series(1, greatest(len(toks) - 1, 1))) t(gs)
       ), c AS (
         SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY doc_id, bigram
       )
       SELECT doc_id,
              round(max(n)::DOUBLE / sum(n), 6) AS top_bigram_frac
       FROM c GROUP BY doc_id""",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition quality signal (Gopher-style curation rule): fraction
    of a document's bigrams taken by its most frequent bigram —
    boilerplate and spam score high.  Codegen bigram explode (the n=2
    shingle path) + two partial-aggregable groupBys."""
    from .operators.dedup import shingle_rows

    docs = load_table(spark, sf, "documents")
    bg = shingle_rows(docs, n=2)
    counts = bg.groupBy("doc_id", "shingle").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        F.round(
            F.max("n").cast("double") / F.sum("n"), 6
        ).alias("top_bigram_frac")
    )


@q("q67_ivf_topk")  # nprobe < n_clusters: recall < 1 by construction
def q67(spark: SparkSession, sf: str) -> DataFrame:
    """IVF (cluster-then-probe) ANN top-k — q50's scale path: k-means
    centroids on a bounded driver sample, streamed assignment, only the
    nprobe nearest cells scanned via a partition-pruned scan of the
    persisted cluster-partitioned index (built once per sf dir and
    reused).  q50 (brute force) is the exact audit."""
    import hashlib
    import tempfile

    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    tag = hashlib.md5(f"{sf}|c32".encode()).hexdigest()[:12]
    idx = f"{tempfile.gettempdir()}/ctdc-ivf-{tag}"
    top = ivf_topk(
        emb, query, k=10, n_clusters=32, nprobe=8, index_path=idx
    )
    return top.select("vec_id", F.round("sim", 4).alias("sim_r"))


# =========================================================================
# Scale-hardening gate queries (Q78-Q81): append-mode watermark semantics,
# skew mitigation, bucketed co-located joins — each oracle-checked against
# the plain (unsalted/unbucketed/batch) SQL so the physical rewrite is
# proven result-identical.
# =========================================================================

@q(
    "q78_watermark_late_drop",
    """WITH nonlate AS (SELECT * FROM events WHERE event_id % 100 <> 0),
            late AS (SELECT * FROM events WHERE event_id % 100 = 0),
            wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM nonlate),
            fin AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
            kept AS (
              SELECT ts FROM nonlate
              UNION ALL
              SELECT l.ts FROM late l, wm
              WHERE date_trunc('hour', l.ts) + INTERVAL 1 HOUR > wm.w
            )
       SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
              count(*) AS n
       FROM kept, fin
       WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= fin.w
       GROUP BY 1""",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    """TRUE append-mode watermark late-drop (SURVEY §2.2 Q44's original
    description): a 3-batch ordered replay of events with late rows
    injected last; Spark's watermark machinery drops expired late rows
    and emits only closed windows, and the oracle recomputes both
    effects from the same deterministic split."""
    from .streaming.windows import late_drop_counts

    return late_drop_counts(spark, sf)


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
    from .operators.skew import salted_join

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
    from .operators.skew import two_phase_count_distinct

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

    from .sources.bucketing import bucketed_join_ready, write_bucketed

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
    "q82_batch_vector_retrieval",
    """SELECT query_id, vec_id, sim_r, rank FROM (
         SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
                round(list_cosine_similarity(q.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]), 4) AS sim_r,
                row_number() OVER (
                  PARTITION BY q.vec_id
                  ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]) DESC,
                           b.vec_id
                ) AS rank
         FROM (SELECT * FROM embeddings WHERE vec_id % 50 = 0) q
         CROSS JOIN embeddings b
       ) WHERE rank <= 5""",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    """Batch retrieval (training-pipeline shape): exact top-5 corpus
    neighbors for every query in a batch, one corpus pass, batch-local
    top-k per Arrow batch so the shuffle carries candidates only."""
    from .operators.similarity import topk_cosine_multi

    emb = load_table(spark, sf, "embeddings")
    qbatch = emb.filter(F.pmod(F.col("vec_id"), F.lit(50)) == 0)
    top = topk_cosine_multi(emb, qbatch, k=5)
    return top.select(
        "query_id", "vec_id", F.round("sim", 4).alias("sim_r"), "rank"
    )


@q(
    "q83_chunk_documents",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            c AS (SELECT doc_id,
                         CAST(j AS INT) AS chunk_id,
                         toks[1 + j*48 : j*48 + 64] AS piece
                  FROM t, LATERAL UNNEST(generate_series(
                           0,
                           CAST(greatest(ceil((len(toks) - 16) / 48.0), 1) AS BIGINT) - 1
                         )) AS s(j))
       SELECT doc_id, chunk_id,
              array_to_string(piece, ' ') AS chunk_text,
              CAST(len(piece) AS INT) AS chunk_token_count
       FROM c""",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping fixed-token document chunking (64-token windows,
    16-token overlap) — codegen posexplode + column-start slice, one
    scan, no shuffle."""
    from .operators.text import chunk_documents

    docs = load_table(spark, sf, "documents")
    return chunk_documents(docs, "doc_id", "text", 64, 16)


@q(
    "q84_stateful_running_totals",
    """SELECT user_id, count(*) AS n_events,
              round(sum(value), 2) AS total_value_r
       FROM events GROUP BY user_id""",
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary-stateful streaming (applyInPandasWithState): per-user
    (count, sum) state accumulated across a 3-batch ordered replay; the
    final per-user emission must equal the batch GROUP BY oracle — the
    state-store path is value-checked at the gate, not only in tests."""
    from .streaming.stateful import stateful_totals_gate

    return stateful_totals_gate(spark, sf)


@q(
    "q85_capped_per_group_sample",
    """SELECT event_type, count(*) AS n_kept,
              round(sum(value), 2) AS sum_value_r
       FROM (
         SELECT *, row_number() OVER (
                  PARTITION BY event_type
                  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                ) AS rk
         FROM events
       ) WHERE rk <= 100
       GROUP BY event_type""",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain cap (training-data mixture step): each event_type
    capped at 100 rows chosen by md5-of-key priority — deterministic,
    engine-portable (the oracle recomputes the identical sample), one
    shuffle.  Aggregated per group so the value hash checks membership."""
    from .operators.sampling import capped_per_group_sample

    ev = load_table(spark, sf, "events")
    kept = capped_per_group_sample(ev, "event_type", "event_id", 100)
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.round(F.sum("value"), 2).alias("sum_value_r"),
    )


@q(
    "q86_stream_interval_join",
    """SELECT l.user_id, count(*) AS n_pairs
       FROM (SELECT * FROM events WHERE user_id % 5 = 0) l
       JOIN (SELECT * FROM events WHERE user_id % 5 = 0) r
         ON l.user_id = r.user_id
        AND r.ts >= l.ts - INTERVAL 30 MINUTE
        AND r.ts <= l.ts
       GROUP BY l.user_id""",
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join (dual watermarks + state-bounding
    range condition) run to completion; per-user pair counts equal the
    batch interval join, which is the oracle."""
    from .streaming.joins import interval_join_gate

    return interval_join_gate(spark, sf)


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
    from .operators.asof import range_join_binned

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
    "q88_mixture_sampling",
    """WITH counts AS (
         SELECT lang, CAST(count(*) AS DOUBLE) AS cnt,
                CASE lang WHEN 'en' THEN 0.5
                          WHEN 'fr' THEN 0.3
                          WHEN 'zh' THEN 0.2 END AS w
         FROM documents WHERE lang IN ('en', 'fr', 'zh') GROUP BY lang),
       nt AS (SELECT min(cnt / w) AS n_total FROM counts),
       rates AS (SELECT lang, w * n_total / cnt AS rate FROM counts, nt)
       SELECT d.lang, count(*) AS n_kept
       FROM documents d JOIN rates r ON d.lang = r.lang
       WHERE ((d.doc_id * 2654435761) % 4294967296) * 10000 / 4294967296
             < r.rate * 10000
       GROUP BY d.lang""",
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    """Target-proportion data mixing (en 50% / fr 30% / zh 20%): the
    scarcest domain bounds the feasible total, per-domain keep rates are
    derived from observed counts, membership is the deterministic hash
    filter.  Two corpus passes + one broadcast of the |domains|-row rate
    table; no RNG, so the oracle recomputes the identical sample."""
    from .operators.sampling import mix_to_proportions

    docs = load_table(spark, sf, "documents")
    kept = mix_to_proportions(
        docs, "lang", "doc_id", {"en": 0.5, "fr": 0.3, "zh": 0.2}
    )
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


@q(
    "q89_contamination_check",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
            g AS (SELECT doc_id,
                         array_to_string(toks[1 + j : j + 3], '|') AS shingle
                  FROM t, LATERAL UNNEST(generate_series(
                           0, CAST(greatest(len(toks) - 3, 0) AS BIGINT)
                         )) AS s(j)),
            corp AS (SELECT doc_id, shingle FROM g WHERE doc_id % 97 <> 0),
            bench AS (SELECT DISTINCT doc_id AS bench_id, shingle
                      FROM g WHERE doc_id % 97 = 0)
       SELECT c.doc_id,
              CAST(count(DISTINCT c.shingle) AS BIGINT) AS n_shared_ngrams,
              CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
       FROM corp c JOIN bench b USING (shingle)
       GROUP BY c.doc_id""",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing any word
    3-gram with the held-out eval split (doc_id % 97 == 0).  Benchmark
    n-grams broadcast (eval sets are small); corpus side never shuffles
    for the join — only the per-doc count-distinct aggregates."""
    from .operators.dedup import contamination_check

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) != 0)
    return contamination_check(corpus, bench, "doc_id", "text", n=3)


@q(
    "q90_quantize_embeddings",
    """WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
            m AS (SELECT vec_id, e,
                         list_aggregate(list_transform(e, x -> abs(x)), 'max')
                           AS ma
                  FROM t),
            qv AS (SELECT vec_id, ma / 127.0 AS scale,
                          CASE WHEN ma = 0
                               THEN list_transform(e, x -> 0)
                               ELSE list_transform(e, x ->
                                      CAST(floor(x / (ma / 127.0)) AS INT))
                          END AS q
                   FROM m)
       SELECT vec_id,
              round(scale, 6) AS scale_r,
              CAST(list_sum(q) AS BIGINT) AS q_sum,
              CAST(list_aggregate(q, 'min') AS INT) AS q_min,
              CAST(list_aggregate(q, 'max') AS INT) AS q_max
       FROM qv""",
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 embedding quantization (4x compression for the
    serving/storage tier): per-vector scale = max|x|/127, codes =
    floor(x/scale).  Pure codegen column expressions, one scan, no
    shuffle; floor keeps the arithmetic engine-portable, so the oracle
    reproduces the exact codes."""
    from .operators.similarity import quantize_int8

    emb = load_table(spark, sf, "embeddings")
    qed = quantize_int8(emb)
    return qed.select(
        "vec_id",
        F.round("q_scale", 6).alias("scale_r"),
        F.aggregate(
            "q_embedding",
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("q_sum"),
        F.array_min("q_embedding").alias("q_min"),
        F.array_max("q_embedding").alias("q_max"),
    )


@q(
    "q91_vocabulary_coverage",
    """WITH counts AS (
         SELECT tok AS token, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
               FROM documents)
         GROUP BY tok),
       ranked AS (
         SELECT token, n,
                CAST(row_number() OVER (ORDER BY n DESC, token) AS INT)
                  AS rnk,
                round(sum(n) OVER (ORDER BY n DESC, token
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                      / sum(n) OVER (), 6) AS cum_share_r
         FROM counts)
       SELECT token, n, rnk, cum_share_r
       FROM ranked WHERE n >= 5 AND rnk <= 100""",
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary build for tokenizer training: frequency-ranked token
    types with cumulative corpus coverage.  The corpus-sized work is one
    explode + map-side-combined count; the global windows run over the
    token-TYPE table (vocabulary-sized), so the single-partition sort is
    safe by construction."""
    from .operators.text import vocabulary

    docs = load_table(spark, sf, "documents")
    vocab = vocabulary(docs, "text", min_count=5, top_n=100)
    return vocab.select(
        "token",
        "n",
        F.col("rank").alias("rnk"),
        F.round("cum_share", 6).alias("cum_share_r"),
    )


@q(
    "q92_orc_roundtrip",
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    """ORC source/sink round-trip under the same contract pin as parquet
    (R1/R3 generalize over DataSource formats): documents written as
    ORC, re-read with the explicit contract schema (never inferred),
    aggregated.  The oracle aggregates the original parquet — equality
    proves the round-trip is lossless."""
    from .catalog import Documents
    from .sources.io import Sink, Source, read_df, write_df

    docs = load_table(spark, sf, "documents")
    path = "/tmp/ctdc_q92_documents_orc"
    write_df(docs, Sink(Documents, path, format="orc"), SchemaPolicy.EXACT)
    back = read_df(spark, Source(Documents, "orc", path))
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


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
    from .operators.sampling import global_shuffle_positions

    docs = load_table(spark, sf, "documents")
    return global_shuffle_positions(
        docs.select("doc_id"), "doc_id", buckets=64
    ).select("doc_id", "pos")


@q(
    "q94_json_sink_roundtrip",
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    """JSON-lines sink + contract-pinned re-read (the interchange format
    for pipeline handoffs): same format-generic Source/Sink path as
    parquet/ORC, explicit schema on the re-read — no inference job ever
    runs.  Oracle aggregates the original parquet; equality proves the
    JSON round-trip is lossless for this contract."""
    from .catalog import Documents
    from .sources.io import Sink, Source, read_df, write_df

    docs = load_table(spark, sf, "documents")
    path = "/tmp/ctdc_q94_documents_json"
    write_df(docs, Sink(Documents, path, format="json"), SchemaPolicy.EXACT)
    back = read_df(spark, Source(Documents, "json", path))
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@q(
    "q95_csv_sink_roundtrip",
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    """CSV sink + contract-pinned re-read, completing the format matrix
    (CSV/JSON read since q02/q03; parquet/ORC/JSON/CSV write).  Reads
    are PERMISSIVE by design (malformed cells become nulls — faithful
    to the reference's schema-level-only pin), which the lossless
    aggregate equality implicitly re-checks here."""
    from .catalog import Documents
    from .sources.io import Sink, Source, read_df, write_df

    docs = load_table(spark, sf, "documents")
    path = "/tmp/ctdc_q95_documents_csv"
    write_df(
        docs,
        Sink(Documents, path, format="csv", options={"header": "true"}),
        SchemaPolicy.EXACT,
    )
    back = read_df(
        spark, Source(Documents, "csv", path, {"header": "true"})
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


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
    "q97_tfidf_keywords",
    """WITH tok AS (SELECT doc_id,
                           len(string_split(lower(text), ' ')) AS dlen,
                           unnest(string_split(lower(text), ' ')) AS token
                    FROM documents),
            tf AS (SELECT doc_id, dlen, token,
                          CAST(count(*) AS BIGINT) AS n_td
                   FROM tok GROUP BY doc_id, dlen, token),
            dft AS (SELECT token, CAST(count(*) AS BIGINT) AS dfreq
                    FROM tf GROUP BY token),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
            scored AS (SELECT doc_id, token,
                              (n_td / dlen) * ln((nd + 1) / (dfreq + 1))
                                AS score
                       FROM tf JOIN dft USING (token) CROSS JOIN n)
       SELECT doc_id, token, round(score, 4) AS score_r, rnk
       FROM (SELECT *, CAST(row_number() OVER (
                              PARTITION BY doc_id
                              ORDER BY score DESC, token
                            ) AS INT) AS rnk
             FROM scored)
       WHERE rnk <= 3""",
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords: two map-side-combined hash
    aggregations (term freq, doc freq — the second over the already
    (doc,term)-sized tf table), a 1-row broadcast of N, one per-doc
    top-k window.  No cartesian, all codegen."""
    from .operators.text import tfidf_keywords

    docs = load_table(spark, sf, "documents")
    kw = tfidf_keywords(docs, "doc_id", "text", k=3)
    return kw.select(
        "doc_id", "token", F.round("score", 4).alias("score_r"), "rnk"
    )


@q(
    "q98_bigram_lm",
    """WITH t AS (SELECT string_split(lower(text), ' ') AS toks
                  FROM documents),
            b AS (SELECT toks[j] AS w1, toks[j + 1] AS w2
                  FROM t, LATERAL UNNEST(generate_series(1, len(toks) - 1))
                       AS s(j)
                  WHERE len(toks) >= 2),
            c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
                  FROM b GROUP BY w1, w2)
       SELECT w1, w2 AS top_w2, n_pair, round(p, 6) AS p_r
       FROM (SELECT c.*,
                    n_pair / (sum(n_pair) OVER (PARTITION BY w1)) AS p,
                    row_number() OVER (
                      PARTITION BY w1 ORDER BY n_pair DESC, w2
                    ) AS rk
             FROM c)
       WHERE rk = 1""",
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram LM estimation: most likely successor + P(w2|w1) per token.
    Bigrams ride the codegen shingle path; argmax and conditional total
    share one window partitioning, so the bigram table shuffles once.
    Probabilities are exact-integer ratios — engine-portable."""
    from .operators.text import bigram_lm

    docs = load_table(spark, sf, "documents")
    lm = bigram_lm(docs, "text")
    return lm.select(
        "w1", "top_w2", "n_pair", F.round("p", 6).alias("p_r")
    )


@q(
    "q99_curation_pipeline",
    """WITH f AS (SELECT * FROM documents
                  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 80),
            l AS (SELECT *, lower(array_to_string(
                              string_split(text, ' ')[1:3], ' ')) AS lead
                  FROM f),
            d AS (SELECT * FROM (
                    SELECT *, row_number() OVER (
                               PARTITION BY lead ORDER BY doc_id
                             ) AS rk
                    FROM l) WHERE rk = 1),
            s AS (SELECT * FROM d
                  WHERE ((doc_id * 2654435761) % 4294967296) * 10000
                        / 4294967296 < 5000)
       SELECT lang, count(*) AS n_kept,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM s GROUP BY lang""",
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end curation pipeline, composed from the library: length
    gate -> deterministic lead-prefix dedup (keep_best: min doc_id per
    normalized 3-token lead, one min_by aggregate, no window sort) ->
    deterministic 50% hash sample -> per-language stats.  Every stage
    is reproducible (pure functions of the data), so the oracle
    recomputes the identical final corpus."""
    from .operators.dedup import keep_best_dedup
    from .operators.sampling import deterministic_sample
    from .operators.text import token_count

    docs = load_table(spark, sf, "documents")
    gated = docs.filter(token_count("text").between(20, 80))
    with_lead = gated.withColumn(
        "lead",
        F.lower(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3))),
    )
    deduped = keep_best_dedup(
        with_lead, col="lead", score_col="doc_id", ascending=True
    )
    sampled = deterministic_sample(deduped, rate=0.5, key_col="doc_id")
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@q(
    "q100_stream_dedup",
    """SELECT user_id, count(*) AS n_events,
              round(sum(value), 2) AS total_value_r
       FROM events GROUP BY user_id""",
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exactly-once dedup under replay: batch 1 re-emits exact
    copies of every event_id % 10 == 0 row; dropDuplicatesWithinWatermark
    (bounded state — entries evicted once the watermark passes their
    event time) must drop every replay, so the emitted rows equal the
    distinct originals and the batch GROUP BY is the oracle."""
    from .streaming.windows import stream_dedup_gate

    return stream_dedup_gate(spark, sf)


@q(
    "q101_components_deep_chain",
    """WITH nodes AS (
         SELECT event_id, user_id,
                count(*) OVER (PARTITION BY user_id) AS n_user
         FROM events)
       SELECT event_id AS doc_id,
              min(event_id) OVER (PARTITION BY user_id) AS cluster_id
       FROM nodes WHERE n_user >= 2""",
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components on a DEEP graph: each user's events chained
    consecutively (chain length = events/user, ~100 at sf0.01 — far
    past min-label propagation's round budget).  The large-star/
    small-star operator contracts every chain to its min in O(log n)
    alternations; the oracle knows each chain's component is simply the
    per-user min event_id."""
    from .operators.dedup import connected_components_star

    ev = load_table(spark, sf, "events").select("event_id", "user_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    edges = (
        ev.withColumn("__prev", F.lag("event_id").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(
            F.col("__prev").alias("doc_a"), F.col("event_id").alias("doc_b")
        )
    )
    return connected_components_star(edges)


@q(
    "q102_embedding_dim_stats",
    """WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
            d AS (SELECT CAST(j AS INT) AS dim, e[j + 1] AS x
                  FROM t, LATERAL UNNEST(generate_series(0, len(e) - 1))
                       AS s(j))
       SELECT dim,
              round(avg(x), 6) AS mean_r,
              round(stddev_pop(x), 6) AS std_r,
              round(min(x), 6) AS min_r,
              round(max(x), 6) AS max_r,
              CAST(count(*) AS BIGINT) AS n
       FROM d GROUP BY dim""",
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding feature-health table: per-dimension mean/std/min/max
    over the corpus.  posexplode (codegen Generate) + ONE map-side-
    combined aggregate — the shuffle carries |dims| partial-moment rows
    per partition regardless of corpus size."""
    from .operators.similarity import embedding_dim_stats

    emb = load_table(spark, sf, "embeddings")
    st = embedding_dim_stats(emb)
    return st.select(
        "dim",
        F.round("mean", 6).alias("mean_r"),
        F.round("std", 6).alias("std_r"),
        F.round("min", 6).alias("min_r"),
        F.round("max", 6).alias("max_r"),
        "n",
    )


@q(
    "q103_retrieval_with_docs",
    """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                  WHERE vec_id = 7),
            scored AS (SELECT b.vec_id,
                              list_cosine_similarity(
                                q.qe, b.embedding::DOUBLE[]) AS sim
                       FROM embeddings b, q)
       SELECT s.vec_id, round(s.sim, 4) AS sim_r, d.lang,
              substr(d.text, 1, 40) AS preview
       FROM scored s JOIN documents d ON s.vec_id = d.doc_id
       ORDER BY s.sim DESC, s.vec_id LIMIT 5""",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end retrieval (the RAG read path): top-5 nearest
    embeddings to the query vector, then hydrate each hit with its
    document metadata + snippet.  Top-k resolves FIRST (TakeOrdered
    heap over one corpus pass), so the hydration join touches k rows —
    the tiny side broadcasts, the documents table is probed once."""
    from .operators.similarity import topk_cosine

    emb = load_table(spark, sf, "embeddings")
    docs = load_table(spark, sf, "documents")
    qv = emb.filter(F.col("vec_id") == 7)
    top = topk_cosine(emb, qv, k=5)
    return (
        top.join(docs, top["vec_id"] == docs["doc_id"])
        .select(
            "vec_id",
            F.round("sim", 4).alias("sim_r"),
            "lang",
            F.substring("text", 1, 40).alias("preview"),
        )
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
    from .operators.timeseries import resample_interp

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    out = resample_interp(ev, "user_id", "ts", "value", "1 hour")
    return out.select(
        "user_id",
        _ts_str(F.col("ts")).alias("ts_str"),
        F.round("value_interp", 4).alias("v_interp_r"),
    )


from .sources.layout import zorder_sql as _zsql  # noqa: E402


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
    from .sources.layout import zorder_value

    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        zorder_value(
            F.pmod(F.col("event_id"), F.lit(65536)), F.col("user_id")
        ).alias("z"),
    )


@q(
    "q106_lsh_recall_contract",
    # same pattern as q19/q96: the LSH pair set is engine-specific, but
    # its accuracy CONTRACT vs the exact answer is oracle-checkable —
    # the exact pair count hash-matches, the booleans assert the bound
    """SELECT CAST(count(*) AS BIGINT) AS n_exact,
              TRUE AS recall_ok, TRUE AS precision_ok
       FROM (SELECT a.vec_id AS va, b.vec_id AS vb
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]) >= 0.45)""",
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    """LSH accuracy contract: the bucketed hyperplane-LSH pair set must
    reach recall >= 0.9 against the exact threshold self-join with
    precision 1 (verified candidates only).  Exact pair count is value-
    checked against brute force; the booleans gate the sketch — so the
    rows-only q56 path now has an oracle-checked companion."""
    from .operators.similarity import cosine_pairs, cosine_pairs_lsh

    emb = load_table(spark, sf, "embeddings")
    t = 0.45
    exact = cosine_pairs(emb, t).select(
        F.col("vec_a").alias("va"), F.col("vec_b").alias("vb")
    )
    lsh = cosine_pairs_lsh(emb, t).select(
        F.col("vec_a").alias("va"), F.col("vec_b").alias("vb")
    )
    hits = lsh.join(exact, ["va", "vb"], "inner")
    agg = (
        exact.agg(F.count("*").cast("bigint").alias("n_exact"))
        .crossJoin(F.broadcast(hits.agg(F.count("*").alias("__n_hit"))))
        .crossJoin(F.broadcast(lsh.agg(F.count("*").alias("__n_lsh"))))
    )
    return agg.select(
        "n_exact",
        (
            (F.col("__n_hit") >= 0.9 * F.col("n_exact"))
            | (F.col("n_exact") == 0)
        ).alias("recall_ok"),
        (F.col("__n_hit") == F.col("__n_lsh")).alias("precision_ok"),
    )


@q(
    "q107_ivf_recall_contract",
    """SELECT b.vec_id,
              round(list_cosine_similarity(
                (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 7),
                b.embedding::DOUBLE[]), 4) AS sim_r,
              TRUE AS ivf_overlap_ok
       FROM embeddings b
       ORDER BY list_cosine_similarity(
                (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 7),
                b.embedding::DOUBLE[]) DESC, b.vec_id
       LIMIT 10""",
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    """IVF accuracy contract: the exact top-10 (value-checked against
    brute force) annotated with whether the partition-pruned IVF search
    recovered >= 7 of them — the rows-only q67 path's oracle-checked
    companion."""
    import hashlib
    import tempfile

    from .operators.similarity import ivf_topk, topk_cosine

    emb = load_table(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 7)
    exact = topk_cosine(emb, query, k=10)
    tag = hashlib.md5(f"{sf}|c32".encode()).hexdigest()[:12]
    idx = f"{tempfile.gettempdir()}/ctdc-ivf-{tag}"
    approx = ivf_topk(
        emb, query, k=10, n_clusters=32, nprobe=8, index_path=idx
    ).select("vec_id")
    overlap = exact.join(approx, "vec_id", "semi").count()
    return exact.select(
        "vec_id",
        F.round("sim", 4).alias("sim_r"),
        F.lit(overlap >= 7).alias("ivf_overlap_ok"),
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
    "q109_upsample_mixture",
    """WITH f AS (SELECT *, CASE lang WHEN 'fr' THEN 2.5
                                      WHEN 'zh' THEN 1.25
                                      ELSE 1.0 END AS fac
                  FROM documents),
            c AS (SELECT *, CAST(floor(fac) AS INT)
                            + CASE WHEN ((doc_id * 2654435761) % 4294967296)
                                        * 10000 / 4294967296
                                        < (fac - floor(fac)) * 10000
                                   THEN 1 ELSE 0 END AS n_copies
                  FROM f)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM c, LATERAL UNNEST(generate_series(1, n_copies)) s(j)
       GROUP BY lang""",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic fractional upsampling (fr ×2.5, zh ×1.25): the
    mixture up-weighting step.  floor(f) whole copies per row plus a
    hash-selected fractional copy — reruns reproduce the identical
    expanded corpus, and the oracle recomputes it exactly."""
    from .operators.sampling import upsample_by_factor

    docs = load_table(spark, sf, "documents")
    up = upsample_by_factor(
        docs, "lang", "doc_id", {"fr": 2.5, "zh": 1.25}
    )
    return up.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
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
    from .operators.stats import equi_width_histogram

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
    from .operators.stats import column_profile

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

    from .contracts.shape import contract
    from .sources.io import Sink, write_df

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
    "q115_policy_evolution_roundtrip",
    """SELECT segment, CAST(count(*) AS BIGINT) AS n,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(28, 8))), 2)
                    AS DOUBLE) AS total_r
       FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                    substr(o_orderpriority, 1, 1) AS segment
             FROM orders)
       GROUP BY segment""",
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolution round-trip under the subset policies — the
    reference's own Backward/Forward scenario
    (SparkRuntimeSpec.scala:189-343) run end-to-end on real data:

      1. the producer frame carries an EXTRA column (``extra_flag``) and
         OMITS the consumer contract's defaulted field
         (``priority_note: str = "NONE"``) — the BACKWARD pin on the
         sink accepts both (extras allowed; absence allowed iff
         nullable or ctdc.hasDefault, SparkCore.scala:105-116),
      2. the written parquet is re-read self-describing and pinned
         FORWARD against a wider reader contract: every written column
         must exist in the reader's expectation
         (SparkCore.scala:118-127),
      3. the returned aggregate is oracle-checked on the data content,
         so the evolution dance provably loses no rows/values.
    """
    import dataclasses
    import hashlib
    import tempfile

    from .contracts.schema import spark_schema
    from .contracts.shape import contract
    from .runtime.pins import assert_matches_contract
    from .sources.io import Sink, write_df

    @contract
    @dataclasses.dataclass
    class OrderEvolved:  # consumer contract (v2): adds a defaulted field
        o_orderkey: int
        o_custkey: int
        o_totalprice: float
        segment: str
        extra_flag: int
        priority_note: str = "NONE"

    @contract
    @dataclasses.dataclass
    class OrderReader:  # forward reader: superset of every written column
        o_orderkey: int
        o_custkey: int
        o_totalprice: float
        segment: str
        extra_flag: int
        priority_note: typing.Optional[str]
        audit_tag: typing.Optional[str]

    orders = load_table(spark, sf, "orders")
    produced = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.substring("o_orderpriority", 1, 1).alias("segment"),
        F.lit(1).cast("long").alias("extra_flag"),
    )
    tag = hashlib.md5(f"{sf}|q115".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/ctdc-q115-{tag}"
    # Backward: priority_note (defaulted) absent from the produced frame
    write_df(produced, Sink(OrderEvolved, path), SchemaPolicy.BACKWARD)
    back = spark.read.parquet(path)
    # Forward: every column that reached storage exists in the reader
    assert_matches_contract(
        back.schema,
        spark_schema(OrderReader),
        SchemaPolicy.FORWARD,
        context=f"q115 forward read {path}",
    )
    return back.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2
        ).cast("double").alias("total_r"),
    )


@q(
    "q116_quality_percentile_gate",
    """WITH scored AS (
         SELECT doc_id, lang,
                round((CASE WHEN len(string_split(text, ' '))
                                 BETWEEN 20 AND 1000 THEN 1.0
                            WHEN len(string_split(text, ' ')) >= 5 THEN 0.5
                            ELSE 0.0 END
                       + len(list_distinct(string_split(text, ' ')))::DOUBLE
                         / len(string_split(text, ' '))) / 2.0
                      - (length(text) - length(regexp_replace(
                            text, '[^\\w\\s]', '', 'g')))
                        / length(text)::DOUBLE, 6) AS quality
         FROM documents),
       cut AS (SELECT quantile_cont(quality, 0.25) AS c FROM scored)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
              round(avg(quality), 4) AS avg_quality_r
       FROM scored, cut WHERE quality >= c
       GROUP BY lang""",
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    """Percentile-gated quality curation — keep documents above the
    corpus's 25th quality percentile.  The cutoff is ONE exact
    interpolated percentile over the scored corpus (a 1-row broadcast
    back onto the scan, no second shuffle); the score itself is the
    library's deterministic quality heuristic, so the oracle recomputes
    the identical kept set.  At 100 TB the cutoff aggregation is one
    map-side-combined pass and the gate is a codegen filter."""
    from .operators.text import quality_score

    docs = load_table(spark, sf, "documents")
    scored = docs.select("doc_id", "lang", quality_score("text").alias("quality"))
    cut = scored.agg(F.percentile("quality", F.lit(0.25)).alias("c"))
    return (
        scored.crossJoin(F.broadcast(cut))
        .filter(F.col("quality") >= F.col("c"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.round(F.avg("quality"), 4).alias("avg_quality_r"),
        )
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
    "q119_embedding_dedup_scrub",
    """WITH RECURSIVE pairs AS (
         SELECT a.vec_id AS va, b.vec_id AS vb
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) >= 0.45
       ), edges AS (
         SELECT va AS src, vb AS dst FROM pairs
         UNION SELECT vb, va FROM pairs
       ), reach(src, dst) AS (
         SELECT src, dst FROM edges
         UNION
         SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       ), clus AS (
         SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
         FROM reach GROUP BY src
       ), kept AS (
         SELECT e.vec_id, e.label
         FROM embeddings e LEFT JOIN clus c ON e.vec_id = c.vec_id
         WHERE c.vec_id IS NULL OR c.cluster_id = e.vec_id
       )
       SELECT label, CAST(count(*) AS BIGINT) AS n_kept
       FROM kept GROUP BY label""",
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end embedding near-dup SCRUB — the composite every
    training-data pipeline actually runs: exact cosine pairs (the
    size-guarded dispatcher; LSH is the drop-in above exact-feasible
    scale) -> connected components -> keep the min-id representative per
    cluster, singletons pass through untouched -> per-label survivor
    counts.  The oracle recomputes the identical scrub via an O(n²)
    cosine self-join + recursive transitive closure, so cluster
    formation AND representative choice are value-checked end to end."""
    from .operators.dedup import connected_components

    emb = load_table(spark, sf, "embeddings")
    pairs = cosine_pairs(emb, threshold=0.45)
    clus = connected_components(pairs, "vec_a", "vec_b")
    kept = (
        emb.join(
            clus.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
        )
        .filter(
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("vec_id"))
        )
    )
    return kept.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_kept")
    )


@q(
    "q120_text_source_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(length(text)) AS BIGINT) AS total_chars
       FROM documents""",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    """Raw-text source/sink round-trip — the ingestion format LLM
    corpora actually arrive in (one document per line).  Writes the
    corpus as .txt, re-reads with spark.read.text (no schema inference
    possible or needed: one string column), and proves the round-trip
    loses no lines or characters against the parquet original.  Text
    scans split by line across tasks, so ingestion parallelism is
    file-size-, not file-count-, bound."""
    import hashlib
    import tempfile

    docs = load_table(spark, sf, "documents")
    tag = hashlib.md5(f"{sf}|q120".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/ctdc-q120-{tag}"
    docs.select("text").write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    return lines.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
    )


@q(
    "q121_python_datasource",
    """SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN ((id * 2654435761) % 4294967296)
                                 < 2147483648 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_low
       FROM generate_series(0, 9999) t(id)""",
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    """Custom PYTHON DATA SOURCE (pyspark 4 DataSource API): a
    deterministic synthetic generator registered as a real format —
    ``spark.read.format("ctdc_synth")`` — with proper partition
    planning (each InputPartition generates its own id range, so the
    source parallelizes like any file source; no driver materialization).
    The oracle regenerates the identical rows from generate_series.
    This is the extension point for reading systems Spark has no
    built-in connector for."""
    from .sources.pysource import register_synth_source

    register_synth_source(spark)
    df = (
        spark.read.format("ctdc_synth")
        .option("n", "10000")
        .option("partitions", "8")
        .load()
    )
    return df.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("hash32") < 2147483648, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low"),
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
    "q123_python_stream_source",
    """SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(id) AS BIGINT) AS sum_id,
              CAST(sum(CASE WHEN ((id * 2654435761) % 4294967296)
                                 < 2147483648 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_low
       FROM generate_series(0, 4999) t(id)""",
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING over the custom Python data source: the same
    ``ctdc_synth`` format read via ``readStream`` with a
    SimpleDataSourceStreamReader — offset init, batch read, and the
    readBetweenOffsets replay contract that underwrites exactly-once.
    An availableNow run drains the configured range into a memory sink;
    the oracle regenerates the identical rows.  This is the template
    for streaming systems Spark ships no connector for (queues, change
    feeds)."""
    from .sources.pysource import register_synth_source

    register_synth_source(spark)
    stream = (
        spark.readStream.format("ctdc_synth")
        .option("n", "5000")
        .option("batch", "5000")
        .load()
    )
    agg = stream.groupBy().agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("id").cast("bigint").alias("sum_id"),
        F.sum(F.when(F.col("hash32") < 2147483648, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low"),
    )
    name = "ctdc_q123_sink"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


@q(
    "q124_stream_static_join",
    """SELECT strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
              CAST(count(*) AS BIGINT) AS n,
              CAST(round(sum(CAST(e.value *
                    (CASE e.event_type WHEN 'click' THEN 1.5
                                       WHEN 'purchase' THEN 3.0
                                       WHEN 'view' THEN 1.0
                                       ELSE 0.5 END) AS DECIMAL(28, 8))), 2)
                    AS DOUBLE) AS weighted_r
       FROM events e GROUP BY 1""",
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-STATIC enrichment join: the events stream joins a static
    dimension (per-type weights) inside the streaming query — the
    standard enrich-then-aggregate shape.  The dim is broadcast into
    every micro-batch (no stream state for the join; only the windowed
    agg keeps state), and a complete-mode availableNow replay must equal
    the batch aggregation exactly."""
    from .streaming.windows import events_stream

    weights = spark.createDataFrame(
        [("click", 1.5), ("purchase", 3.0), ("view", 1.0)],
        "event_type string, w double",
    )
    stream = events_stream(spark, sf, glob="events.parquet")
    enriched = stream.join(F.broadcast(weights), "event_type", "left").select(
        "ts",
        "value",
        F.coalesce(F.col("w"), F.lit(0.5)).alias("w"),
    )
    agg = (
        enriched.groupBy(F.window("ts", "1 day").alias("win"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(
                    (F.col("value") * F.col("w")).cast("decimal(28,8)")
                ),
                2,
            ).cast("double").alias("weighted_r"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd").alias("day"),
            "n",
            "weighted_r",
        )
    )
    name = "ctdc_q124_sink"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


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
    "q127_xml_source_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(length(text)) AS BIGINT) AS total_chars,
              CAST(sum(n_chars) AS BIGINT) AS total_n_chars
       FROM documents""",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    """XML source/sink round-trip (Spark 4 ships the XML format
    natively): documents write as <doc> rows and read back with an
    explicit schema — entity escaping in the writer must round-trip
    text content losslessly, proven by character-count conservation
    against the parquet original."""
    import hashlib
    import tempfile

    docs = load_table(spark, sf, "documents")
    tag = hashlib.md5(f"{sf}|q127".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/ctdc-q127-{tag}"
    docs.select("doc_id", "text", "n_chars").write.mode("overwrite").format(
        "xml"
    ).option("rootTag", "docs").option("rowTag", "doc").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, text string, n_chars long")
        .load(path)
    )
    return back.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum("n_chars").cast("bigint").alias("total_n_chars"),
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
    "q130_hll_merge_contract",
    """WITH per_type AS (
         SELECT event_type, count(DISTINCT user_id) AS exact_n
         FROM events GROUP BY event_type),
       total AS (SELECT count(DISTINCT user_id) AS exact_total FROM events)
       SELECT p.event_type, CAST(p.exact_n AS BIGINT) AS exact_n,
              CAST(t.exact_total AS BIGINT) AS exact_total,
              TRUE AS est_ok
       FROM per_type p, total t""",
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (DataSketches HLL): per-type
    sketches aggregate once, and the GLOBAL distinct estimate comes from
    hll_union_agg over the tiny sketch column — never re-scanning the
    fact table.  This is the pre-aggregation pattern 100 TB rollups
    live on: persist sketch bytes per grain, union upward on demand.
    The oracle pins exactness of the exact columns and the contract
    flag: every estimate (per type and merged) must land within 5% of
    the true distinct count (HLL lgK=12 carries ~1.6% standard error,
    so 5% is >3 sigma)."""
    ev = load_table(spark, sf, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").cast("bigint").alias("exact_n"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total")
    )
    total = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_total")
    )
    out = per_type.withColumn(
        "est_n", F.hll_sketch_estimate("sk")
    ).crossJoin(F.broadcast(merged)).crossJoin(F.broadcast(total))
    ok = (
        (F.abs(F.col("est_n") - F.col("exact_n"))
         <= 0.05 * F.col("exact_n"))
        & (F.abs(F.col("est_total") - F.col("exact_total"))
           <= 0.05 * F.col("exact_total"))
    )
    return out.select(
        "event_type",
        "exact_n",
        "exact_total",
        ok.alias("est_ok"),
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
    "q132_stream_session_window",
    """WITH marked AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), numbered AS (
         SELECT user_id, ts,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS s
         FROM marked
       )
       SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              CAST(count(*) AS BIGINT) AS n_events
       FROM numbered GROUP BY user_id, s""",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING session windows (merge-on-arrival session_window state,
    30-minute gap) replayed to completion over the static events feed —
    the streaming twin of batch q43/q113: a complete-mode availableNow
    run must produce exactly the sessions the batch gaps-and-islands
    computation derives.  Session-window state merges adjacent windows
    as events arrive; the watermark bounds it in production append
    mode."""
    from .streaming.windows import events_stream, session_counts

    stream = events_stream(spark, sf, glob="events.parquet")
    agg = session_counts(stream, watermark="1 hour", gap="30 minutes")
    name = "ctdc_q132_sink"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name).select(
        "user_id",
        "session_start",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@q(
    "q133_merge_upsert",
    """WITH updates AS (
         SELECT c_custkey, c_name, c_nationkey,
                round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey % 10 = 0
         UNION ALL
         SELECT 900000 + r_regionkey, 'new-' || r_name,
                r_regionkey, 0.0, 'NEW'
         FROM region),
       merged AS (
         SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
                coalesce(u.c_name, c.c_name) AS c_name,
                coalesce(u.c_nationkey, c.c_nationkey) AS c_nationkey,
                coalesce(u.c_acctbal, round(c.c_acctbal, 2)) AS c_acctbal,
                coalesce(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
         FROM customer c FULL OUTER JOIN updates u
           ON c.c_custkey = u.c_custkey)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN c_mktsegment = 'NEW' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_inserted,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal
       FROM merged""",
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE / upsert (SCD type-1) expressed Spark-first: without a
    transactional table format, the merge is a FULL OUTER JOIN on the
    key — matched rows take the update's values, unmatched-source rows
    insert, unmatched-target rows carry forward — then an atomic
    overwrite of the snapshot.  The join shuffles both sides by key
    once (at 100 TB: partition the snapshot by key-bucket and only
    rewrite buckets containing updates — the updates-side bucket list
    prunes the rest; q136 + ``operators.merge.merge_upsert`` implement
    exactly that and match this query's aggregate).  Updates here are
    derived deterministically from the data so the oracle replays the
    identical merge."""
    cust = load_table(spark, sf, "customer")
    region = load_table(spark, sf, "region")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        region.select(
            (F.lit(900000) + F.col("r_regionkey")).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("r_name")).alias("c_name"),
            F.col("r_regionkey").cast("long").alias("c_nationkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    u = updates.alias("u")
    c = cust.alias("c")
    merged = c.join(
        u, F.col("c.c_custkey") == F.col("u.c_custkey"), "full_outer"
    ).select(
        F.coalesce(F.col("u.c_custkey"), F.col("c.c_custkey")).alias(
            "c_custkey"
        ),
        F.coalesce(F.col("u.c_name"), F.col("c.c_name")).alias("c_name"),
        F.coalesce(F.col("u.c_nationkey"), F.col("c.c_nationkey")).alias(
            "c_nationkey"
        ),
        F.coalesce(
            F.col("u.c_acctbal"), F.round(F.col("c.c_acctbal"), 2)
        ).alias("c_acctbal"),
        F.coalesce(F.col("u.c_mktsegment"), F.col("c.c_mktsegment")).alias(
            "c_mktsegment"
        ),
    )
    return merged.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("c_mktsegment") == "NEW", 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
    )


@q(
    "q134_scd2_history",
    """WITH updates AS (
         SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
         FROM customer WHERE c_custkey % 10 = 0),
       expired AS (
         SELECT c.c_custkey, round(c.c_acctbal, 2) AS bal,
                0 AS valid_from, 1 AS valid_to
         FROM customer c JOIN updates u ON c.c_custkey = u.c_custkey),
       current_v AS (
         SELECT c.c_custkey,
                coalesce(u.new_bal, round(c.c_acctbal, 2)) AS bal,
                CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END
                  AS valid_from,
                CAST(NULL AS INT) AS valid_to
         FROM customer c LEFT JOIN updates u
           ON c.c_custkey = u.c_custkey),
       history AS (
         SELECT * FROM expired UNION ALL SELECT * FROM current_v)
       SELECT CAST(count(*) AS BIGINT) AS n_history,
              CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_current,
              CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_expired,
              CAST(round(sum(CASE WHEN valid_to IS NULL
                                  THEN CAST(bal AS DECIMAL(18, 2))
                                  ELSE CAST(0 AS DECIMAL(18, 2)) END), 2)
                   AS DOUBLE) AS current_bal
       FROM history""",
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    """SCD TYPE-2 history build (q133's type-1 sibling): an update batch
    EXPIRES the matched rows (valid_to set to the batch version) and
    appends the new versions as current (valid_to NULL); untouched rows
    stay current at their original version.  One left join + one union
    — at scale the history table is partitioned by valid_from so each
    batch appends one partition and expires in place only the buckets
    carrying updates.  The version columns are batch ordinals here;
    production uses the batch timestamp."""
    cust = load_table(spark, sf, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.round(F.col("bal") + 100.0, 2).alias("new_bal")
    )
    expired = cust.join(updates, "c_custkey").select(
        "c_custkey",
        "bal",
        F.lit(0).alias("valid_from"),
        F.lit(1).alias("valid_to"),
    )
    current = cust.join(updates, "c_custkey", "left").select(
        "c_custkey",
        F.coalesce(F.col("new_bal"), F.col("bal")).alias("bal"),
        F.when(F.col("new_bal").isNull(), 0).otherwise(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    history = expired.unionByName(current)
    return history.agg(
        F.count("*").cast("bigint").alias("n_history"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_current"),
        F.sum(F.when(F.col("valid_to").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_expired"),
        F.round(
            F.sum(
                F.when(
                    F.col("valid_to").isNull(),
                    F.col("bal").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("current_bal"),
    )


@q(
    "q135_incremental_neardup",
    """WITH sh AS (
      SELECT DISTINCT doc_id,
             concat_ws('|', toks[gs], toks[gs+1], toks[gs+2]) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL UNNEST(generate_series(1, greatest(len(toks) - 2, 1))) t(gs)
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle
       AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard_r
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5""",
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental cross-batch near-dup dedup: the corpus half (even doc
    ids) is indexed ONCE (persisted banded signatures + shingle sets +
    content fingerprint, reused across calls via the meta fingerprint),
    then the new batch (odd doc ids) is deduped AGAINST the index — only
    the batch is shingled; the corpus side is two parquet reads.  The
    oracle recomputes the same cross-set pairs from raw text, so a green
    hash proves the index path loses nothing vs a from-scratch run.
    Mirrors daily-crawl ingest at 100 TB: per-batch cost is one
    broadcast-join scan of the ids+longs band table, never a corpus
    re-shingle or corpus shuffle."""
    import hashlib
    import tempfile

    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    tag = hashlib.md5(f"{sf}|nd-even".encode()).hexdigest()[:12]
    idx = f"{tempfile.gettempdir()}/ctdc-ndidx-{tag}"
    minhash_index_reuse_or_build(corpus, idx)
    pairs = near_dup_against(spark, idx, batch, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard_r")
    )


@q(
    "q136_bucket_pruned_merge",
    """WITH updates AS (
         SELECT c_custkey, c_name, c_nationkey,
                round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey % 10 = 0
         UNION ALL
         SELECT 900000 + r_regionkey, 'new-' || r_name,
                r_regionkey, 0.0, 'NEW'
         FROM region),
       merged AS (
         SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
                coalesce(u.c_name, c.c_name) AS c_name,
                coalesce(u.c_nationkey, c.c_nationkey) AS c_nationkey,
                coalesce(u.c_acctbal, round(c.c_acctbal, 2)) AS c_acctbal,
                coalesce(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
         FROM customer c FULL OUTER JOIN updates u
           ON c.c_custkey = u.c_custkey)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN c_mktsegment = 'NEW' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_inserted,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal
       FROM merged""",
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    """The bucket-pruned MERGE q133's docstring promises, executed for
    real: the customer snapshot is written partitioned by
    pmod(xxhash64(key), 64), the SAME update batch as q133 is merged via
    ``merge_upsert`` — reading and rewriting ONLY the buckets carrying
    updated keys (PartitionFilters directory pruning + dynamic partition
    overwrite; untouched buckets stay byte-identical, asserted by test)
    — and the post-merge snapshot must aggregate identically to q133's
    full-outer rewrite, which is exactly what the oracle recomputes.
    A fresh snapshot per call keeps the query deterministic."""
    import tempfile

    from .operators.merge import merge_upsert, snapshot_read, snapshot_write

    cust = load_table(spark, sf, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    region = load_table(spark, sf, "region")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        region.select(
            (F.lit(900000) + F.col("r_regionkey")).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("r_name")).alias("c_name"),
            F.col("r_regionkey").cast("long").alias("c_nationkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    path = tempfile.mkdtemp(prefix="ctdc-merge-") + "/snap"
    snapshot_write(cust, path, "c_custkey", num_buckets=64)
    merge_upsert(spark, path, updates)
    merged = snapshot_read(spark, path)
    return merged.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("c_mktsegment") == "NEW", 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
    )


# =========================================================================
# Round-4 additions: Gopher quality rules, SemDeDup, token-budget mixture
# planning, observed scan metrics (Q137-Q140)
# =========================================================================

@q(
    "q137_gopher_quality",
    """WITH t AS (
         SELECT doc_id, text, string_split(text, ' ') AS words
         FROM documents
       ), s AS (
         SELECT doc_id,
                len(words) AS n_words,
                list_sum(list_transform(words, w -> len(w)))::DOUBLE
                  / len(words) AS mean_len,
                len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE
                  / len(words) AS symbol_r,
                len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                  / len(words) AS alpha_f,
                len(list_intersect(list_transform(words, w -> lower(w)),
                    ['the','be','to','of','and','that','have','with','a','in']))
                  AS stop_hits
         FROM t
       )
       SELECT doc_id,
              CAST(n_words AS INT) AS n_words,
              round(mean_len, 6) AS mean_word_len,
              round(symbol_r, 6) AS symbol_ratio,
              round(alpha_f, 6) AS alpha_frac,
              CAST(stop_hits AS INT) AS stop_hits,
              (n_words BETWEEN 20 AND 1000
               AND mean_len BETWEEN 3.0 AND 10.0
               AND symbol_r <= 0.1
               AND alpha_f >= 0.8
               AND stop_hits >= 2) AS gopher_keep
       FROM s""",
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher/MassiveText quality-rule battery (word-count band, mean
    word length band, symbol-to-word ratio, alphabetic-word fraction,
    distinct-stop-word floor) + the AND'd keep flag — the standard
    pretraining quality gate, all codegen built-ins in one scan."""
    from .operators.text import gopher_quality

    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", *gopher_quality("text"))


@q(
    "q138_semantic_dedup",
    """SELECT e1.vec_id
       FROM embeddings e1
       WHERE NOT EXISTS (
         SELECT 1 FROM embeddings e2
         WHERE e2.label = e1.label
           AND e2.vec_id < e1.vec_id
           AND list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]),
                                      CAST(e1.embedding AS DOUBLE[])) >= 0.35)""",
)
def q138(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup: within each cluster (the ``label``
    column stands in for the k-means centroid assignment), drop every
    vector with a lower-id neighbor at cosine >= 0.35; survivors only.
    One shuffle on the cluster key + per-cluster Arrow-batched BLAS —
    never all-pairs across clusters (operators/dedup.py:semantic_dedup).
    tau=0.35 sits >= 5e-5 from every actual pairwise cosine at all SFs,
    so the f64 boundary cannot flip between engines."""
    from .operators.dedup import semantic_dedup

    emb = load_table(spark, sf, "embeddings")
    return semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding",
        cluster_col="label", threshold=0.35,
    )


@q(
    "q139_token_budget_mixture",
    """WITH per_src AS (
         SELECT source,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                  AS tokens_available,
                1.0 / (1.0 + CAST(regexp_extract(source, '(\\d+)', 1) AS INT))
                  AS w_raw
         FROM documents
         GROUP BY source
       ), planned AS (
         SELECT source, tokens_available,
                w_raw / sum(w_raw) OVER () AS share,
                0.5 * sum(tokens_available) OVER () AS budget
         FROM per_src
       )
       SELECT source,
              tokens_available,
              round(share, 6) AS target_share,
              round(least(1.0, budget * share / tokens_available), 6)
                AS sample_rate,
              CAST(floor(least(1.0, budget * share / tokens_available)
                         * tokens_available) AS BIGINT) AS expected_tokens
       FROM planned""",
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget mixture planner: given a target mixture weight per
    source (here 1/(1+source index), normalized) and a total token
    budget (50% of the corpus), emit each source's sampling rate
    min(1, budget*share/available) and expected token yield — the
    planning step before `mix_to_proportions` executes the sample.  One
    map-side-combined aggregation (|sources| rows) + window normalization
    over the tiny aggregate — planning cost is independent of corpus
    size."""
    docs = load_table(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("bigint").alias("tokens_available"),
    ).withColumn(
        "w_raw",
        F.lit(1.0)
        / (F.lit(1.0) + F.regexp_extract("source", r"(\d+)", 1).cast("int")),
    )
    w = Window.partitionBy()
    planned = per_src.select(
        "source",
        "tokens_available",
        (F.col("w_raw") / F.sum("w_raw").over(w)).alias("share"),
        (F.lit(0.5) * F.sum("tokens_available").over(w)).alias("budget"),
    )
    rate = F.least(
        F.lit(1.0), F.col("budget") * F.col("share") / F.col("tokens_available")
    )
    return planned.select(
        "source",
        "tokens_available",
        F.round("share", 6).alias("target_share"),
        F.round(rate, 6).alias("sample_rate"),
        F.floor(rate * F.col("tokens_available"))
        .cast("bigint")
        .alias("expected_tokens"),
    )


@q(
    "q140_observe_scan_metrics",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(round(sum(CAST(l_quantity AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_qty,
              CAST(min(l_shipdate) AS DATE) AS min_ship,
              CAST(max(l_shipdate) AS DATE) AS max_ship
       FROM lineitem""",
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality metrics via ``df.observe``: the counters ride on a
    pass the pipeline is already making (here: a downstream row count),
    so at 100 TB the profile costs ZERO extra scans — unlike a separate
    aggregation job.  The observed metrics are collected driver-side
    (4 scalars) and returned as a 1-row DataFrame; the oracle recomputes
    the same aggregates relationally."""
    from pyspark.sql import Observation

    li = load_table(spark, sf, "lineitem")
    obs = Observation("scan_qc")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    # the action the pipeline was going to run anyway; metrics piggyback
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                float(round(m["total_qty"], 2)),
                m["min_ship"],
                m["max_ship"],
            )
        ],
        "n_rows bigint, total_qty double, min_ship date, max_ship date",
    )


@q(
    "q141_bm25_scores",
    """WITH base AS (
         SELECT doc_id, string_split(lower(text), ' ') AS toks,
                len(string_split(lower(text), ' ')) AS dl
         FROM documents
       ), stats AS (
         SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base
       ), hits AS (
         SELECT doc_id, dl, unnest(toks) AS term FROM base
       ), tf AS (
         SELECT doc_id, term, dl, count(*)::DOUBLE AS tf
         FROM hits
         WHERE term IN ('table', 'merge', 'window', 'spark')
         GROUP BY doc_id, term, dl
       ), dfreq AS (
         SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
       )
       SELECT tf.doc_id,
              round(sum(
                ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                * (tf.tf * 2.2)
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))
              ), 6) AS bm25
       FROM tf, dfreq, stats
       WHERE tf.term = dfreq.term
       GROUP BY tf.doc_id""",
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 scoring of the corpus against a bag-of-terms query
    (terms 'table merge window spark'): Lucene-variant idf, k1=1.2
    b=0.75 length normalization.  Corpus stats broadcast as one row,
    per-term document frequencies broadcast as |terms| rows, and the
    explode is filtered to query terms BEFORE any shuffle — non-matching
    documents never move (operators/text.py:bm25_scores)."""
    from .operators.text import bm25_scores

    docs = load_table(spark, sf, "documents")
    scored = bm25_scores(docs, ["table", "merge", "window", "spark"])
    return scored.select("doc_id", F.round("bm25", 6).alias("bm25"))


@q(
    "q142_hybrid_rrf_fusion",
    """WITH base AS (
         SELECT doc_id, string_split(lower(text), ' ') AS toks,
                len(string_split(lower(text), ' ')) AS dl
         FROM documents
       ), stats AS (
         SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base
       ), hits AS (
         SELECT doc_id, dl, unnest(toks) AS term FROM base
       ), tf AS (
         SELECT doc_id, term, dl, count(*)::DOUBLE AS tf
         FROM hits
         WHERE term IN ('table', 'merge', 'window', 'spark')
         GROUP BY doc_id, term, dl
       ), dfreq AS (
         SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
       ), bm AS (
         SELECT tf.doc_id,
                sum(ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))
                ) AS bm25
         FROM tf, dfreq, stats
         WHERE tf.term = dfreq.term
         GROUP BY tf.doc_id
       ), bm_rank AS (
         -- rank on the ROUNDED score: mathematically-tied docs (same
         -- tf/dl profile) must collapse to the id tiebreak in both
         -- engines, not to summation-order ulps
         SELECT doc_id,
                row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id) AS r
         FROM bm QUALIFY r <= 100
       ), qv AS (
         SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         WHERE vec_id = 0
       ), cos_rank AS (
         SELECT vec_id AS doc_id,
                row_number() OVER (
                  ORDER BY list_cosine_similarity(
                             CAST(e.embedding AS DOUBLE[]), qv.v) DESC,
                           vec_id) AS r
         FROM embeddings e, qv
         WHERE vec_id <> 0
         QUALIFY r <= 100
       )
       SELECT b.doc_id,
              CAST(b.r AS INT) AS bm25_rank,
              CAST(c.r AS INT) AS cosine_rank,
              round(1.0 / (60 + b.r) + 1.0 / (60 + c.r), 6) AS rrf
       FROM bm_rank b JOIN cos_rank c USING (doc_id)""",
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 top-100
    (q141's scorer) fused with the embedding-cosine top-100 for query
    vector vec_id=0 — rrf = 1/(60+r_lex) + 1/(60+r_vec) over ids in
    both lists.  Ranks are integers with deterministic id tiebreaks, so
    the fusion is exactly reproducible.  At 100 TB each list is
    TakeOrdered-k (per-partition heaps, k-row driver merge) — the
    fusion join touches 2k rows, never the corpus."""
    from .operators.similarity import cosine
    from .operators.text import bm25_scores

    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    bm = bm25_scores(docs, ["table", "merge", "window", "spark"]).select(
        "doc_id", F.round("bm25", 6).alias("bm25")
    )
    w_bm = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm_rank = (
        bm.withColumn("r", F.row_number().over(w_bm)).filter(F.col("r") <= 100)
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qv")
    )
    w_cos = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    cos_rank = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", cosine(F.col("embedding"), F.col("__qv")).alias("cos")
        )
        .withColumn("r", F.row_number().over(w_cos))
        .filter(F.col("r") <= 100)
    )
    return (
        bm_rank.select("doc_id", F.col("r").alias("bm25_rank"))
        .join(
            cos_rank.select(
                F.col("vec_id").alias("doc_id"), F.col("r").alias("cosine_rank")
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            F.col("bm25_rank").cast("int").alias("bm25_rank"),
            F.col("cosine_rank").cast("int").alias("cosine_rank"),
            F.round(
                1.0 / (60 + F.col("bm25_rank")) + 1.0 / (60 + F.col("cosine_rank")),
                6,
            ).alias("rrf"),
        )
    )


@q(
    "q143_ivf_append_contract",
    """SELECT b.vec_id,
              round(list_cosine_similarity(
                (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 7),
                b.embedding::DOUBLE[]), 4) AS sim_r,
              TRUE AS ivf_overlap_ok
       FROM embeddings b
       ORDER BY list_cosine_similarity(
                (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 7),
                b.embedding::DOUBLE[]) DESC, b.vec_id
       LIMIT 10""",
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-index accuracy contract (q107's sibling for
    `ivf_append`): the index is built on HALF the corpus (even ids) and
    the other half arrives as an appended batch — assignment against the
    frozen centroids, touched-partition-only file appends, no k-means
    refit.  The exact top-10 over the FULL corpus (value-checked by the
    oracle) is annotated with whether the partition-pruned search of the
    appended index recovers >= 7 of them — same floor as q107's
    build-once contract, so appending must not cost recall on a
    stationary distribution."""
    import shutil
    import tempfile

    from .operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_search,
        topk_cosine,
    )

    emb = load_table(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 7)
    exact = topk_cosine(emb, query, k=10)
    idx = tempfile.mkdtemp(prefix="ctdc-ivfappend-") + "/idx"
    shutil.rmtree(idx, ignore_errors=True)
    ivf_build(
        emb.filter(F.col("vec_id") % 2 == 0), idx, n_clusters=32,
        sample_size=10000, seed=42,
    )
    ivf_append(spark, idx, emb.filter(F.col("vec_id") % 2 == 1))
    approx = ivf_search(spark, idx, query, k=10, nprobe=8).select("vec_id")
    overlap = exact.join(approx, "vec_id", "semi").count()
    return exact.select(
        "vec_id",
        F.round("sim", 4).alias("sim_r"),
        F.lit(overlap >= 7).alias("ivf_overlap_ok"),
    )


@q(
    "q144_compaction",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal,
              CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
              TRUE AS compacted_ok
       FROM customer""",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction round-trip: customer is written as 40
    fragment files, `compact_parquet` bin-packs them (atomic directory
    swap; the table-maintenance pass every long-lived streaming-append
    table needs), and the compacted table must aggregate identically to
    the source (oracle recomputes over the original).  ``compacted_ok``
    pins the file-count contract: a single file afterwards, fewer than
    before."""
    import glob
    import tempfile

    from .sources.layout import compact_parquet

    cust = load_table(spark, sf, "customer")
    p = tempfile.mkdtemp(prefix="ctdc-compact-") + "/t"
    cust.repartition(40).write.parquet(p)
    n_before = len(glob.glob(p + "/*.parquet"))
    stats = compact_parquet(spark, p, target_file_bytes=1 << 30)
    n_after = len(glob.glob(p + "/*.parquet"))
    ok = n_before == 40 and n_after == 1 and stats["files_after"] == 1
    return spark.read.parquet(p).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
        F.countDistinct("c_nationkey").cast("bigint").alias("n_nations"),
        F.lit(bool(ok)).alias("compacted_ok"),
    )


@q(
    "q145_stream_idempotent_sink",
    """SELECT event_type,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(value), 4) AS total_value
       FROM events GROUP BY event_type""",
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-once streaming sink under redelivery: the events table
    replays as 3 ordered micro-batches into the batch-id-partitioned
    idempotent sink, then batch 0 is RE-DELIVERED (simulating a crash
    between the data write and the checkpoint commit — the window where
    a plain append sink duplicates).  Dynamic partition overwrite makes
    the redelivery replace its own partition, so the final table must
    aggregate exactly to the batch recompute the oracle runs.  With an
    append sink this query would double batch 0's counts and fail the
    hash gate."""
    import tempfile

    from .streaming.joins import idempotent_batch_writer, write_stream_idempotent
    from .streaming.windows import events_stream, write_ordered_feed

    ev = load_table(spark, sf, "events")
    base = tempfile.mkdtemp(prefix="ctdc-idem-")
    feed, out, ckpt = f"{base}/feed", f"{base}/out", f"{base}/ckpt"
    slices = [
        ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)
    ]
    write_ordered_feed(slices, feed)
    stream = events_stream(spark, feed, max_files_per_trigger=1)
    q = write_stream_idempotent(stream, out, ckpt)
    q.awaitTermination()
    # post-crash redelivery of batch 0: same rows, same batch id
    idempotent_batch_writer(out)(slices[0], 0)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@q(
    "q146_weighted_sample",
    """WITH s AS (SELECT avg(n_chars) AS mw FROM documents)
       SELECT doc_id, source
       FROM documents, s
       WHERE ((doc_id * 2654435761) % 4294967296) * 10000.0 / 4294967296
             < round(least(1.0, 0.3 * n_chars / mw) * 10000, 6)""",
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep probability
    proportional to n_chars (stand-in for a quality score), expected
    kept fraction 0.3, membership by the portable Knuth hash — the
    curation step that keeps more of the best data while staying
    exactly reproducible and resumable (operators/sampling.py:
    weighted_sample).  One mean broadcast + one filtered scan."""
    from .operators.sampling import weighted_sample

    docs = load_table(spark, sf, "documents")
    return weighted_sample(docs, "n_chars", "doc_id", 0.3).select(
        "doc_id", "source"
    )


@q(
    "q147_merge_schema_evolution",
    """WITH updates AS (
         SELECT c_custkey,
                CASE WHEN c_mktsegment = 'BUILDING' THEN 'gold'
                     ELSE 'std' END AS c_tier,
                round(c_acctbal + 50.0, 2) AS c_acctbal
         FROM customer WHERE c_custkey % 10 = 0),
       merged AS (
         SELECT c.c_custkey,
                coalesce(u.c_acctbal, round(c.c_acctbal, 2)) AS c_acctbal,
                u.c_tier
         FROM customer c LEFT JOIN updates u USING (c_custkey))
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(c_tier) AS BIGINT) AS n_with_tier,
              CAST(count(DISTINCT c_tier) AS BIGINT) AS n_tiers,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal,
              TRUE AS evolution_proven
       FROM merged""",
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE with schema evolution under a contract proof: the update
    batch carries a NEW nullable column (c_tier) absent from the v1
    snapshot.  Before any Spark action, `conforms(CustomerV1,
    CustomerV2, BACKWARD)` proves v1 data remains readable under the
    evolved contract (c_tier is Optional — reference Backward
    semantics, SparkCore.scala:105-116: absence allowed iff nullable or
    hasDefault), and the runtime pin re-checks the merged frame's live
    schema against v2.  Old rows surface c_tier = NULL; the oracle
    recomputes counts, tier cardinality, and balances.  The refusal
    branch (evolving by REMOVING a required field) is test-pinned in
    the conforms matrix."""
    import dataclasses

    from .catalog import Customer
    from .contracts.conforms import conforms
    from .contracts.shape import contract
    from .runtime.pins import assert_matches_contract

    @contract
    @dataclasses.dataclass
    class CustomerV2Agg:
        c_custkey: int
        c_acctbal: float
        c_tier: Optional[str]

    @contract
    @dataclasses.dataclass
    class CustomerV1Agg:
        c_custkey: int
        c_acctbal: float

    # construction-time evolution proof: v1 producers stay valid under v2
    conforms(CustomerV1Agg, CustomerV2Agg, SchemaPolicy.BACKWARD)

    cust = load_table(spark, sf, "customer")
    snapshot = cust.select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 50.0, 2).alias("c_acctbal"),
        F.when(F.col("c_mktsegment") == "BUILDING", "gold")
        .otherwise("std")
        .alias("c_tier"),
    )
    merged = (
        snapshot.alias("c")
        .join(updates.alias("u"), "c_custkey", "left")
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            F.coalesce(F.col("u.c_acctbal"), F.col("c.c_acctbal")).alias(
                "c_acctbal"
            ),
            F.col("u.c_tier").alias("c_tier"),
        )
    )
    # runtime pin: the merged frame's live schema is exactly v2
    assert_matches_contract(merged.schema, CustomerV2Agg, SchemaPolicy.EXACT)
    return merged.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("c_tier").cast("bigint").alias("n_with_tier"),
        F.countDistinct("c_tier").cast("bigint").alias("n_tiers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
        F.lit(True).alias("evolution_proven"),
    )


@q(
    "q148_data_expectations",
    """WITH m AS (
         SELECT count(*)::DOUBLE AS n,
                (count(*) - count(DISTINCT o_orderkey))::DOUBLE AS dup_keys,
                (sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END))::DOUBLE
                  / count(*) AS null_frac,
                sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                         THEN 1 ELSE 0 END)::DOUBLE AS oob,
                sum(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END)::DOUBLE AS bad_status
         FROM orders
       ), orphans AS (
         SELECT count(*)::DOUBLE AS m FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey)
       )
       SELECT * FROM (
         SELECT 'unique' AS rule, 'o_orderkey' AS "column",
                round(dup_keys, 6) AS metric, '== 0' AS bound,
                dup_keys = 0 AS passed FROM m
         UNION ALL
         SELECT 'not_null', 'o_totalprice', round(null_frac, 6), '<= 0.0',
                null_frac <= 0.0 FROM m
         UNION ALL
         SELECT 'in_range', 'o_totalprice', round(oob, 6),
                '0 outside [0.0, 1000000.0]', oob = 0 FROM m
         UNION ALL
         SELECT 'accepted_values', 'o_orderstatus', round(bad_status, 6),
                '0 outside set', bad_status = 0 FROM m
         UNION ALL
         SELECT 'row_count_between', '*', round(n, 6), '[1, 100000000]',
                n BETWEEN 1 AND 100000000 FROM m
         UNION ALL
         SELECT 'ref_integrity', 'o_custkey', round(orphans.m, 6),
                '0 orphans', orphans.m = 0 FROM orphans
       )""",
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    """Value-level data expectations — the runtime counterpart of the
    schema contracts (shape proven before data moves; these prove the
    DATA): key uniqueness, null fraction, value range, accepted set,
    row-count band, all in ONE aggregate pass (rules add columns, not
    scans), plus referential integrity orders->customer as a left-anti
    join (broadcast at dimension scale).  One report row per rule;
    a pipeline gates on `filter(~passed).count() == 0`."""
    from .operators.expectations import (
        accepted_values,
        evaluate_expectations,
        in_range,
        not_null,
        ref_integrity_report,
        row_count_between,
        unique,
    )

    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    suite = evaluate_expectations(
        orders,
        [
            unique("o_orderkey"),
            not_null("o_totalprice"),
            in_range("o_totalprice", 0.0, 1_000_000.0),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            row_count_between(1, 100_000_000),
        ],
    )
    ref = ref_integrity_report(orders, "o_custkey", cust, "c_custkey")
    return suite.unionByName(ref)


# =========================================================================
# Round-4 additions II: reconciliation, entity resolution, PQ-ANN,
# incremental components, cohort retention, weighted reservoir
# =========================================================================

@q(
    "q149_snapshot_diff",
    """WITH old AS (
         SELECT c_custkey, round(c_acctbal, 2) AS bal, c_mktsegment AS seg
         FROM customer
       ), new AS (
         SELECT c_custkey,
                CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 5.0, 2)
                     ELSE round(c_acctbal, 2) END AS bal,
                c_mktsegment AS seg
         FROM customer WHERE c_custkey % 97 <> 0
         UNION ALL
         SELECT c_custkey + 1000000, round(c_acctbal, 2), c_mktsegment
         FROM customer WHERE c_custkey % 50 = 0
       ), j AS (
         SELECT coalesce(o.c_custkey, n.c_custkey) AS k,
                CASE WHEN o.c_custkey IS NULL THEN 'added'
                     WHEN n.c_custkey IS NULL THEN 'removed'
                     WHEN o.bal = n.bal AND o.seg = n.seg THEN 'unchanged'
                     ELSE 'changed' END AS status
         FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
       )
       SELECT status, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(k) AS BIGINT) AS key_sum
       FROM j GROUP BY status""",
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot reconciliation: the audit step after a MERGE/backfill.
    A simulated v2 of the customer snapshot (some keys dropped, some
    balances bumped, some new keys appended) is diffed against v1 and
    every key classified added/removed/changed/unchanged.  Each side is
    reduced to (key, xxhash64 fingerprint) BEFORE the full-outer join,
    so at 100 TB the shuffle carries 16 bytes/row regardless of row
    width and 'changed' is one 8-byte compare, not N columns.  The
    oracle re-derives the statuses by comparing columns directly —
    agreeing with the fingerprint path unless xxhash64 collides."""
    from .operators.reconcile import diff_summary, snapshot_diff

    cust = load_table(spark, sf, "customer")
    old = cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    new = (
        cust.filter(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 10 == 0,
                F.round(F.col("c_acctbal") + 5.0, 2),
            )
            .otherwise(F.round("c_acctbal", 2))
            .alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 50 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.round("c_acctbal", 2).alias("bal"),
                F.col("c_mktsegment").alias("seg"),
            )
        )
    )
    d = snapshot_diff(old, new, ["c_custkey"], ["bal", "seg"])
    return diff_summary(d, "c_custkey")


@q(
    "q150_entity_resolution",
    """WITH RECURSIVE tok AS (
         SELECT p_partkey, p_brand, p_retailprice,
                list_distinct(list_concat(
                  string_split(p_name, ' '),
                  string_split(lower(p_type), ' '))) AS toks
         FROM part
       ), pairs AS (
         SELECT a.p_partkey AS doc_a, b.p_partkey AS doc_b
         FROM tok a JOIN tok b
           ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
               len(list_distinct(list_concat(a.toks, b.toks))) >= 0.6
       ), edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION SELECT doc_b, doc_a FROM pairs
       ), reach(src, dst) AS (
         SELECT src, dst FROM edges
         UNION
         SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       ), lab AS (
         SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         FROM reach GROUP BY src
       )
       SELECT l.cluster_id AS entity_id,
              CAST(count(*) AS BIGINT) AS n_members,
              round(max(p.p_retailprice) - min(p.p_retailprice), 2)
                AS price_spread_r
       FROM lab l JOIN part p ON p.p_partkey = l.doc_id
       GROUP BY l.cluster_id""",
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    """Entity resolution (record linkage): parts whose name+type token
    sets overlap at Jaccard >= 0.6 within a p_brand BLOCK are the same
    entity; matched pairs are clustered with connected components and
    each entity reports its size and price spread.  Candidates come
    from an INVERTED token index, not a block cross product: records
    explode to (brand, token) postings, an equi-join + partial-combined
    count yields |A∩B| per co-occurring pair, and Jaccard is
    i/(sa+sb-i) — only pairs sharing >= 1 token are ever materialized,
    each as one counted row instead of a per-pair array intersection
    (measured 4.6x faster than the block cross join at sf0.1, identical
    pairs).  Blocking remains the outer scale lever (the join key is
    (brand, token)); a hot block salts like any skewed join.  The
    hot-TOKEN df² exposure of this posting join is removed by q190's
    prefix-filtered variant (provably identical output, rarity-ordered
    prefixes prune the posting lists structurally) — that is the path
    for corpora with stop-token skew.  The oracle replays matching
    exactly and closes the transitive match graph with a recursive
    CTE."""
    from .operators.dedup import connected_components

    parts = load_table(spark, sf, "part")
    tok = parts.select(
        "p_partkey",
        "p_brand",
        F.array_distinct(
            F.concat(
                F.split(F.col("p_name"), " "),
                F.split(F.lower(F.col("p_type")), " "),
            )
        ).alias("toks"),
    )
    ex = tok.select(
        "p_partkey",
        "p_brand",
        F.size("toks").alias("sz"),
        F.explode("toks").alias("t"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.t") == F.col("b.t"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .groupBy(
            F.col("a.p_partkey").alias("doc_a"),
            F.col("b.p_partkey").alias("doc_b"),
            F.col("a.sz").alias("sa"),
            F.col("b.sz").alias("sb"),
        )
        .agg(F.count("*").alias("i"))
    )
    matched = inter.filter(
        F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")) >= 0.6
    ).select("doc_a", "doc_b")
    labels = connected_components(matched)
    return (
        labels.join(
            parts.select(
                F.col("p_partkey").alias("doc_id"), "p_retailprice"
            ),
            "doc_id",
        )
        .groupBy(F.col("cluster_id").alias("entity_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.round(
                F.max("p_retailprice") - F.min("p_retailprice"), 2
            ).alias("price_spread_r"),
        )
    )


@q(
    "q151_pq_recall_contract",
    """SELECT b.vec_id,
              round(list_cosine_similarity(
                (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 11),
                b.embedding::DOUBLE[]), 4) AS sim_r,
              TRUE AS pq_overlap_ok
       FROM embeddings b
       ORDER BY list_cosine_similarity(
                (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 11),
                b.embedding::DOUBLE[]) DESC, b.vec_id
       LIMIT 10""",
)
def q151(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization accuracy contract (same shape as the IVF
    contract q107): the exact top-10 for a query vector, annotated with
    whether the compressed-domain ADC search + exact re-rank recovered
    >= 7 of them.  PQ is the 100 TB memory lever: the corpus scans as
    m=8 one-byte codes per vector (32x smaller than float32), the
    query-side lookup table is ~1 KB of literals evaluated inside
    whole-stage codegen, and only the `rerank` best candidates ever
    touch their true vectors."""
    from .operators.similarity import pq_topk, topk_cosine

    emb = load_table(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 11)
    exact = topk_cosine(emb, query, k=10)
    approx = pq_topk(
        emb, query, k=10, m=8, ksub=16, rerank=100
    ).select("vec_id")
    overlap = exact.join(approx, "vec_id", "semi").count()
    return exact.select(
        "vec_id",
        F.round("sim", 4).alias("sim_r"),
        F.lit(overlap >= 7).alias("pq_overlap_ok"),
    )


@q(
    "q152_components_incremental",
    """WITH nodes AS (
         SELECT event_id, user_id,
                count(*) OVER (PARTITION BY user_id) AS n_user
         FROM events)
       SELECT event_id AS doc_id,
              min(event_id) OVER (PARTITION BY user_id) AS cluster_id
       FROM nodes WHERE n_user >= 2""",
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental connected components: yesterday's labels + today's
    edge batch, WITHOUT re-walking yesterday's graph.  The per-user
    event chains are split into two batches; batch 1 is clustered from
    scratch, then its (node, label) table re-enters as depth-1 star
    edges alongside batch 2's edges only.  The result must equal the
    full recompute — the oracle (per-user min event id) checks exactly
    that.  At 100 TB the saving is the point: the old corpus's pair
    machinery never reruns; daily work is proportional to the new
    batch's reach."""
    from .operators.dedup import (
        connected_components_incremental,
        connected_components_star,
    )

    ev = load_table(spark, sf, "events").select("event_id", "user_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    edges = (
        ev.withColumn("__prev", F.lag("event_id").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(
            F.col("__prev").alias("doc_a"), F.col("event_id").alias("doc_b")
        )
    )
    batch1 = edges.filter(F.col("doc_b") % 3 != 0)
    batch2 = edges.filter(F.col("doc_b") % 3 == 0)
    labels1 = connected_components_star(batch1)
    return connected_components_incremental(labels1, batch2)


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
    "q154_weighted_reservoir",
    """WITH t AS (
         SELECT lang, doc_id, n_chars,
                pow(((doc_id * 2654435761) % 4294967296 + 1)
                      / 4294967296.0,
                    1.0 / greatest(n_chars::DOUBLE, 1e-9)) AS k
         FROM documents
       ), r AS (
         SELECT lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY k DESC, doc_id) AS rn
         FROM t
       )
       SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
              CAST(n_chars AS BIGINT) AS n_chars
       FROM r WHERE rn <= 5""",
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-k weighted reservoir per group (Efraimidis-Sirakis
    A-ES): the 5 documents per language with the largest u^(1/w) keys,
    u deterministic from the Knuth hash — the fixed-budget-per-source
    sampling shape a mixture plan needs (vs q146's Bernoulli sampling,
    whose kept count varies).  One window top-k per group: partial
    TakeOrdered map-side, single shuffle on lang; the oracle replays
    the identical integer arithmetic and pow, so selection matches
    bit-for-bit."""
    from .operators.sampling import reservoir_per_group

    docs = load_table(spark, sf, "documents")
    return reservoir_per_group(docs, "lang", "n_chars", "doc_id", 5).select(
        "lang",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


@q(
    "q155_temperature_mixture",
    """WITH c AS (
         SELECT lang, count(*) AS n FROM documents GROUP BY lang
       ), z AS (
         SELECT sum(pow(n::DOUBLE, 0.5)) AS z, sum(n) AS N FROM c
       )
       SELECT c.lang, CAST(c.n AS BIGINT) AS n,
              round(pow(c.n::DOUBLE, 0.5) / z.z, 6) AS p_target,
              round(least(1.0,
                    pow(c.n::DOUBLE, 0.5) / z.z * z.N / c.n), 6)
                AS keep_rate
       FROM c, z""",
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual
    pretraining recipe: sample language l with p_l ∝ n_l^α, α=0.5 —
    head languages flattened, tail boosted).  One |languages|-row
    planning aggregate from one map-combined count — corpus-size-
    independent; the emitted keep_rate per language feeds the
    deterministic stratified sampler (q63's machinery) for the
    membership pass."""
    from .operators.sampling import temperature_mixture_rates

    docs = load_table(spark, sf, "documents")
    return temperature_mixture_rates(docs, "lang", alpha=0.5)


@q(
    "q156_duplicate_spans",
    """WITH pos AS (
         SELECT doc_id, len(toks) AS n_toks,
                CAST(gs - 1 AS BIGINT) AS pos,
                concat_ws(' ', toks[gs], toks[gs+1], toks[gs+2],
                          toks[gs+3], toks[gs+4], toks[gs+5],
                          toks[gs+6], toks[gs+7]) AS g
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
              LATERAL UNNEST(generate_series(1, len(toks) - 7)) t(gs)
         WHERE len(toks) >= 8
       ), shared AS (
         SELECT g FROM pos GROUP BY g
         HAVING count(DISTINCT doc_id) >= 2
       ), dup AS (
         SELECT p.doc_id, p.n_toks, p.pos
         FROM pos p JOIN shared s ON p.g = s.g
       ), isl AS (
         SELECT doc_id, n_toks, pos,
                CASE WHEN lag(pos) OVER w IS NULL
                          OR pos - lag(pos) OVER w > 8
                     THEN 1 ELSE 0 END AS ni
         FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       ), grp AS (
         SELECT doc_id, n_toks, pos,
                sum(ni) OVER (PARTITION BY doc_id ORDER BY pos)
                  AS island
         FROM isl
       ), spans AS (
         SELECT doc_id, any_value(n_toks) AS n_toks,
                max(pos) - min(pos) + 8 AS span_len
         FROM grp GROUP BY doc_id, island
       )
       SELECT CAST(doc_id AS BIGINT) AS doc_id,
              CAST(count(*) AS BIGINT) AS n_dup_spans,
              CAST(sum(span_len) AS BIGINT) AS dup_tokens,
              round(sum(span_len)::DOUBLE / any_value(n_toks), 6)
                AS dup_frac
       FROM spans GROUP BY doc_id""",
)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    """Exact duplicate-SPAN detection (token-level dedup, the public
    'Deduplicating Training Data' recipe re-expressed relationally):
    8-token windows whose exact text appears in >= 2 documents, merged
    into per-document spans (gaps-and-islands window), reported as
    span count / duplicated tokens / duplicated fraction.  The only
    corpus-wide shuffle moves (hash, doc, pos) longs — never text; a
    suffix array finds longer repeats but needs a global sort."""
    from .operators.text import duplicate_span_stats

    docs = load_table(spark, sf, "documents")
    return duplicate_span_stats(docs, ngram=8)


@q(
    "q157_containment_pairs",
    """WITH sh AS (
         SELECT DISTINCT doc_id,
                concat_ws('|', toks[gs], toks[gs+1], toks[gs+2]) AS s
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
              LATERAL UNNEST(generate_series(1, greatest(len(toks) - 2, 1)))
                t(gs)
       ), sizes AS (
         SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
       ), inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         FROM sh a JOIN sh b
           ON a.s = b.s AND a.doc_id <> b.doc_id
         GROUP BY a.doc_id, b.doc_id
       )
       SELECT CAST(doc_a AS BIGINT) AS doc_a,
              CAST(doc_b AS BIGINT) AS doc_b,
              round(i::DOUBLE / sz.sz, 6) AS containment
       FROM inter JOIN sizes sz ON sz.doc_id = doc_a
       WHERE round(i::DOUBLE / sz.sz, 6) >= 0.8""",
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment dedup: C(a,b) = |Sa∩Sb| / |Sa| >= 0.8
    finds documents mostly CONTAINED in another (quotes, excerpts,
    supersets) that symmetric Jaccard misses when sizes differ.  Same
    co-occurrence-join shape as exact Jaccard — shingle equi-join +
    partial-agg count, never a cartesian; directional, so pairs emit
    both ways.  The dedup policy downstream drops the contained side."""
    from .operators.dedup import containment_pairs

    docs = load_table(spark, sf, "documents")
    return containment_pairs(docs, n=3, threshold=0.8).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
        "containment",
    )


@q(
    "q158_psi_drift",
    """WITH mm AS (
         SELECT min(c_acctbal::DOUBLE) AS mn, max(c_acctbal::DOUBLE) AS mx
         FROM customer
       ), old_b AS (
         SELECT CASE WHEN mm.mx = mm.mn THEN 0
                ELSE CAST(greatest(0, least(
                       floor((c_acctbal::DOUBLE - mm.mn)
                             / ((mm.mx - mm.mn) / 10.0)), 9)) AS INT)
                END AS bucket,
                count(*) AS n_old
         FROM customer, mm GROUP BY 1
       ), newt AS (
         SELECT CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                     THEN c_acctbal + 20000.0 ELSE c_acctbal END AS v
         FROM customer
       ), new_b AS (
         SELECT CASE WHEN mm.mx = mm.mn THEN 0
                ELSE CAST(greatest(0, least(
                       floor((v::DOUBLE - mm.mn)
                             / ((mm.mx - mm.mn) / 10.0)), 9)) AS INT)
                END AS bucket,
                count(*) AS n_new
         FROM newt, mm GROUP BY 1
       ), j AS (
         SELECT coalesce(o.bucket, n.bucket) AS bucket,
                coalesce(o.n_old, 0) AS n_old,
                coalesce(n.n_new, 0) AS n_new
         FROM old_b o FULL OUTER JOIN new_b n ON o.bucket = n.bucket
       ), p AS (
         SELECT bucket,
                greatest(n_old * 1.0 / sum(n_old) OVER (), 1e-6) AS p_old,
                greatest(n_new * 1.0 / sum(n_new) OVER (), 1e-6) AS p_new
         FROM j
       )
       SELECT bucket,
              round(p_old, 6) AS p_old_r,
              round(p_new, 6) AS p_new_r,
              round((p_new - p_old) * ln(p_new / p_old), 6)
                AS psi_contrib_r,
              round(sum((p_new - p_old) * ln(p_new / p_old)) OVER (), 6)
                AS psi_total_r
       FROM p""",
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index drift detection: the DISTRIBUTION-
    level companion to q149's row-level snapshot diff — a simulated v2
    (two segments' balances shifted past the baseline range, clamping
    into the top bucket — a broken-unit-conversion shape) is binned
    against the v1 baseline's deterministic equal-width deciles and
    each bucket's PSI contribution plus the total is reported.  Bin
    edges come from one 1-row (min, max) broadcast — no approximate
    quantiles, which would desync engines; each side then pays one
    map-combined count and the shuffle carries 10 rows.  PSI > 0.25 =
    major drift (this scenario lands ~0.6)."""
    from .operators.stats import psi_drift

    cust = load_table(spark, sf, "customer")
    old = cust.select(F.col("c_acctbal").alias("bal"))
    new = cust.select(
        F.when(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"),
            F.col("c_acctbal") + 20000.0,
        )
        .otherwise(F.col("c_acctbal"))
        .alias("bal")
    )
    return psi_drift(old, new, "bal", nbuckets=10)


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
    "q160_cms_frequency_contract",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS exact_cnt,
              TRUE AS within_bound
       FROM events GROUP BY event_type""",
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min-sketch frequency contract: one mergeable CMS built by
    the JVM `count_min_sketch` aggregate (map-side partial merge — the
    shuffle carries depth x width counters, not rows), decoded on the
    driver with Spark's own sketch library, and point-probed for every
    event type.  The emitted `within_bound` asserts the CMS guarantee
    (estimate >= exact, and <= exact + eps*N) against the exact GROUP BY
    counts — the oracle predicts all-true, so a hashing mismatch between
    the SQL aggregate and the decoder, or a broken merge, flips the gate.
    At 100 TB the sketch is a few MB however many rows feed it, and
    per-key frequency questions become O(1) probes instead of a second
    full-corpus aggregate; sketches from different days/shards compose
    by `mergeInPlace`."""
    from .operators.stats import count_min_frequencies

    eps = 0.001
    events = load_table(spark, sf, "events")
    exact = events.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    )
    keys = [r.event_type for r in exact.select("event_type").collect()]
    est = count_min_frequencies(
        events, "event_type", keys, eps=eps, confidence=0.99, seed=42
    )
    import math

    bound = math.ceil(eps * (est[0][2] if est else 0))
    est_df = spark.createDataFrame(
        [(k, e) for (k, e, _n) in est], "event_type string, est bigint"
    )
    return exact.join(F.broadcast(est_df), "event_type").select(
        "event_type",
        "exact_cnt",
        (
            (F.col("est") >= F.col("exact_cnt"))
            & (F.col("est") <= F.col("exact_cnt") + F.lit(bound))
        ).alias("within_bound"),
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


@q(
    "q164_ks_drift",
    """WITH s AS (SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
           FROM events WHERE event_type IN ('click', 'purchase')),
       c AS (SELECT v, sum(g) AS d1, sum(1 - g) AS d2 FROM s GROUP BY v),
       cum AS (SELECT v,
               sum(d1) OVER (ORDER BY v) AS c1,
               sum(d2) OVER (ORDER BY v) AS c2,
               sum(d1) OVER () AS n1, sum(d2) OVER () AS n2
        FROM c)
       SELECT CAST(max(n1) AS BIGINT) AS n1,
              CAST(max(n2) AS BIGINT) AS n2,
              round(max(abs(CAST(c1 AS DOUBLE) / n1
                            - CAST(c2 AS DOUBLE) / n2)), 6) AS ks_stat
       FROM cum""",
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the value
    distributions of two event types — the EXACT nonparametric
    companion to q158's binned PSI.  The per-value GROUP BY collapses
    the window input to |distinct values| rows before the one total-
    order cumulative pass (the honest cost of an exact ECDF); at 100 TB
    pre-bin to a fixed grid and the same plan bounds KS within one
    bin's mass.  click vs purchase here differ mildly (~0.03); the
    q158 scenario pushed through this query reads ~0.5."""
    from .operators.stats import ks_statistic

    events = load_table(spark, sf, "events")
    return ks_statistic(events, "value", "event_type", "click", "purchase")


@q(
    "q165_pagerank",
    """WITH nc AS (SELECT count(*) AS n FROM customer),
       e AS (
         SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                CAST(1 + (o_orderkey % nc.n) AS BIGINT) AS dst
         FROM orders, nc
         UNION
         SELECT CAST(c_custkey AS BIGINT),
                CAST(1 + (c_custkey % nc.n) AS BIGINT)
         FROM customer, nc
       ),
       deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
       p0 AS (SELECT id, 1.0 / nc.n AS pr FROM nodes, nc),
       i1 AS (SELECT n.id, 0.15 / max(nc.n) + 0.85
                * coalesce(sum(q.pr / g.outdeg), 0) AS pr
              FROM nodes n CROSS JOIN nc
              LEFT JOIN e ON e.dst = n.id
              LEFT JOIN p0 q ON q.id = e.src
              LEFT JOIN deg g ON g.src = e.src
              GROUP BY n.id),
       i2 AS (SELECT n.id, 0.15 / max(nc.n) + 0.85
                * coalesce(sum(q.pr / g.outdeg), 0) AS pr
              FROM nodes n CROSS JOIN nc
              LEFT JOIN e ON e.dst = n.id
              LEFT JOIN i1 q ON q.id = e.src
              LEFT JOIN deg g ON g.src = e.src
              GROUP BY n.id),
       i3 AS (SELECT n.id, 0.15 / max(nc.n) + 0.85
                * coalesce(sum(q.pr / g.outdeg), 0) AS pr
              FROM nodes n CROSS JOIN nc
              LEFT JOIN e ON e.dst = n.id
              LEFT JOIN i2 q ON q.id = e.src
              LEFT JOIN deg g ON g.src = e.src
              GROUP BY n.id)
       SELECT id, round(pr * nc.n, 6) AS pr_norm FROM i3, nc""",
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-iteration PageRank over a deterministic link graph derived
    from orders (src = o_custkey, dst = 1 + (o_orderkey mod
    |customers|) so every destination is a real customer key in 1..n,
    plus a ring edge per customer so every node has outdeg >= 1 —
    together these make rank mass genuinely conserved without a
    dangling-redistribution term).
    The Spark side is the generic `operators.graph.pagerank` loop —
    one src-keyed join + one dst-keyed partial-combined sum per round,
    degrees attached to the edge list ONCE before the loop; the oracle
    is the same three rounds unrolled as a SQL join tower.  Scores are
    reported normalized (x N) and rounded so the two engines'
    summation orders agree.  Link-graph rank is the classic corpus-
    curation prior (rank-weighted sampling, spam demotion)."""
    from .operators.graph import pagerank

    customer = load_table(spark, sf, "customer")
    n = customer.count()
    orders = load_table(spark, sf, "orders")
    # dst = 1 + (key mod n) keeps every destination inside the customer
    # key range 1..n (a bare `mod n` emits node 0, which is NOT a
    # customer — its contributions would silently vanish and the
    # mass-conservation claim would be false for this graph).
    edges = (
        orders.select(
            F.col("o_custkey").cast("bigint").alias("src"),
            (F.lit(1) + (F.col("o_orderkey") % n)).cast("bigint").alias("dst"),
        )
        .distinct()
        .union(
            customer.select(
                F.col("c_custkey").cast("bigint"),
                (F.lit(1) + (F.col("c_custkey") % n)).cast("bigint"),
            )
        )
        .distinct()
    )
    nodes = customer.select(F.col("c_custkey").cast("bigint").alias("id"))
    pr = pagerank(nodes, edges, iters=3, damping=0.85)
    return pr.select("id", F.round(F.col("pr") * n, 6).alias("pr_norm"))


@q(
    "q166_leakage_safe_split",
    """WITH RECURSIVE pairs AS (
         SELECT doc_a, doc_b FROM (
           WITH sh AS (
             SELECT DISTINCT doc_id,
                    concat_ws('|', toks[gs], toks[gs+1], toks[gs+2])
                      AS shingle
             FROM (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
                  LATERAL UNNEST(generate_series(
                    1, greatest(len(toks) - 2, 1))) t(gs)
           ), sizes AS (
             SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
           ), inter AS (
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id
           )
           SELECT doc_a, doc_b FROM inter
           JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
           WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
         )
       ), edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION SELECT doc_b, doc_a FROM pairs
       ), reach(src, dst) AS (
         SELECT src, dst FROM edges
         UNION
         SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       ), cc AS (
         SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         FROM reach GROUP BY src
       ), allc AS (
         SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
         FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
       ), lab AS (
         SELECT doc_id, cluster_id,
           CASE WHEN floor(((cluster_id * 2654435761) % 4294967296)
                      * 10.0 / 4294967296) < 8 THEN 'train'
                WHEN floor(((cluster_id * 2654435761) % 4294967296)
                      * 10.0 / 4294967296) = 8 THEN 'val'
                ELSE 'test' END AS split,
           CASE WHEN floor(((doc_id * 2654435761) % 4294967296)
                      * 10.0 / 4294967296) < 8 THEN 'train'
                WHEN floor(((doc_id * 2654435761) % 4294967296)
                      * 10.0 / 4294967296) = 8 THEN 'val'
                ELSE 'test' END AS naive_split
         FROM allc
       ), leak AS (
         SELECT CAST(count(*) AS BIGINT) AS n FROM (
           SELECT cluster_id FROM lab GROUP BY cluster_id
           HAVING count(*) > 1 AND count(DISTINCT naive_split) > 1)
       )
       SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
              (SELECT n FROM leak) AS leaked_clusters_naive
       FROM lab GROUP BY split""",
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/val/test split: documents are split by a
    deterministic hash of their NEAR-DUP CLUSTER id (MinHash-LSH pairs
    -> connected components, q73's machinery; singletons are their own
    cluster), so near-copies of an eval document can never sit in
    train.  The report quantifies the hazard naive doc-id splitting
    would have caused: `leaked_clusters_naive` counts multi-document
    clusters that naive hashing scatters across splits (9 at sf0.01 —
    each one an eval-contamination incident).  Split assignment itself
    adds ZERO shuffle on top of the clustering (pure codegen hash of
    the label), and because the hash depends only on the cluster id,
    yesterday's held-out set stays held out as the corpus grows — the
    auditability property an RNG-based split lacks.  Oracle: exact-
    Jaccard closure (recursive CTE) + the same integer hash."""
    from .operators.dedup import connected_components
    from .operators.sampling import split_by_cluster

    docs = load_table(spark, sf, "documents")
    pairs = minhash_near_dup_pairs(
        docs, threshold=0.5, num_hashes=64, bands=32
    )
    labels = connected_components(pairs)
    allc = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    lab = split_by_cluster(allc)
    leak = (
        lab.groupBy("cluster_id")
        .agg(
            F.count("*").alias("sz"),
            F.countDistinct("naive_split").alias("ns"),
        )
        .filter("sz > 1 AND ns > 1")
        .count()
    )
    return (
        lab.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
        )
        .withColumn(
            "leaked_clusters_naive", F.lit(leak).cast("bigint")
        )
    )


@q(
    "q167_rocksdb_state_store",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS total_value_r,
              TRUE AS rocksdb_engaged
       FROM events GROUP BY event_type""",
)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming aggregation through the ROCKSDB state store provider —
    the scale path for keyed streaming state: the default provider
    holds state on the executor heap (bounded by memory), RocksDB
    spills to local disk with changelog checkpointing, scaling keyed
    state to billions of keys.  A 3-batch replay accumulates per-type
    totals across micro-batches; `rocksdb_engaged` is read back from
    the query's own state-operator metrics, so the gate fails if the
    provider conf silently didn't apply, and the totals must equal the
    batch GROUP BY (the oracle).  The provider conf is restored after
    the run — no session-wide side effect."""
    from .streaming.stateful import rocksdb_totals_gate

    return rocksdb_totals_gate(spark, sf)


@q(
    "q168_model_quality_filter",
    """WITH feats AS (
         SELECT doc_id, source,
           least(len(string_split(text, ' ')), 512) / 512.0 AS f_len,
           (length(text) - length(regexp_replace(text, '[^\\w\\s]', '',
                                                 'g')))
             / length(text)::DOUBLE AS f_punct,
           len(list_filter(string_split(lower(text), ' '),
               t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
             / len(string_split(text, ' ')) AS f_stop,
           len(list_distinct(string_split(text, ' ')))::DOUBLE
             / len(string_split(text, ' ')) AS f_div
         FROM documents),
       scored AS (
         SELECT doc_id, source,
           1.0 / (1.0 + exp(-(-2.0 + 2.5 * f_len - 4.0 * f_punct
                              + 6.0 * f_stop + 2.0 * f_div))) AS score
         FROM feats)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_kept,
              round(avg(score), 6) AS mean_score_r
       FROM scored GROUP BY source""",
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality filtering: a logistic classifier with FIXED
    (pre-trained, checked-in) weights over the q57 feature set — the
    fasttext-style quality-filter shape every pretraining pipeline runs,
    expressed entirely as codegen column arithmetic: features, dot
    product, and sigmoid are one Project over the scan, so scoring
    100 TB costs exactly the scan (no UDF server, no model runtime; a
    real linear/fasttext head with thousands of hashed-ngram weights
    becomes a broadcast map lookup in the same shape).  Reported
    per-source keep rates are the mixture-shift audit reviewers ask for
    before enabling a new filter.  Features are IEEE doubles in a fixed
    expression order, so the oracle reproduces scores exactly."""
    docs = load_table(spark, sf, "documents")
    feats = docs.select(
        "doc_id",
        "source",
        (F.least(token_count("text"), F.lit(512)) / F.lit(512.0)).alias(
            "f_len"
        ),
        punct_ratio("text").alias("f_punct"),
        stopword_ratio("text").alias("f_stop"),
        token_diversity("text").alias("f_div"),
    )
    z = (
        F.lit(-2.0)
        + F.lit(2.5) * F.col("f_len")
        - F.lit(4.0) * F.col("f_punct")
        + F.lit(6.0) * F.col("f_stop")
        + F.lit(2.0) * F.col("f_div")
    )
    scored = feats.select(
        "doc_id",
        "source",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("score") >= 0.5).cast("long"))
        .cast("bigint")
        .alias("n_kept"),
        F.round(F.avg("score"), 6).alias("mean_score_r"),
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


@q(
    "q171_vocab_id_assignment",
    """WITH toks AS (
         SELECT unnest(string_split(lower(text), ' ')) AS token
         FROM documents
       ), counts AS (
         SELECT token, count(*) AS n FROM toks
         WHERE token <> '' GROUP BY token
       )
       SELECT token, CAST(n AS BIGINT) AS n,
              CAST(row_number() OVER (ORDER BY n DESC, token) - 1
                   AS BIGINT) AS vocab_id
       FROM counts WHERE n >= 5""",
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    """Stable dense vocabulary-id assignment (the build-the-vocab step
    before dictionary-encoding a corpus): tokens above a min-count
    floor get ids 0..V-1 ordered by (frequency desc, token asc) — the
    tie-break makes ids a pure function of the corpus, so two engines
    (or two runs) assign identical ids, which is what lets token-id
    shards from different workers interoperate.  Cost shape: one
    explode + map-combined count collapses the corpus to |vocab| rows
    BEFORE the min-count filter and the one ordered window — the
    global sort runs over the filtered vocabulary (thousands of rows),
    never the corpus.  At 100 TB the count aggregate dominates and is
    one scan; ship the resulting id map as a broadcast dictionary."""
    load_table(spark, sf, "documents").createOrReplaceTempView(
        "q171_documents"
    )
    return spark.sql(
        """WITH toks AS (
             SELECT explode(split(lower(text), ' ')) AS token
             FROM q171_documents
           ), counts AS (
             SELECT token, count(*) AS n FROM toks
             WHERE token <> '' GROUP BY token
           )
           SELECT token, CAST(n AS BIGINT) AS n,
                  CAST(row_number() OVER (ORDER BY n DESC, token) - 1
                       AS BIGINT) AS vocab_id
           FROM counts WHERE n >= 5"""
    )


@q(
    "q172_mmr_diversified_retrieval",
    """SELECT CAST(10 AS BIGINT) AS k,
              CAST(10 AS BIGINT) AS from_fetchk,
              TRUE AS top1_kept,
              TRUE AS diversity_not_worse""",
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified retrieval contract: one
    distributed corpus pass fetches the 50 most relevant vectors
    (TakeOrdered, never a global sort), then the driver-side greedy
    rerank picks 10 balancing relevance against similarity-to-already-
    selected.  The gate asserts the MMR invariants the oracle can
    state without replaying the greedy loop: every selection comes
    from the fetched candidate set, the single most relevant vector is
    always kept (rank 0), and the selected set is no LESS diverse than
    the plain top-10 (max pairwise cosine does not increase).  The
    greedy loop itself is pinned by unit tests on planted
    duplicate-heavy candidates.  Like q106/q107, a contract oracle:
    the selection math is not SQL-expressible, the properties are."""
    import numpy as np

    from .operators.similarity import mmr_select

    emb = load_table(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    sel = mmr_select(emb, query, k=10, fetch_k=50, lam=0.5)
    top = topk_cosine(emb, query, k=50)
    top_ids = [r.vec_id for r in top.collect()]
    top10_ids = top_ids[:10]
    sel_rows = sel.collect()
    sel_ids = [r.vec_id for r in sel_rows]

    def max_pair_sim(ids: list) -> float:
        rows = (
            emb.filter(F.col("vec_id").isin(ids))
            .select("vec_id", "embedding")
            .collect()
        )
        X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ X.T
        np.fill_diagonal(S, -np.inf)
        return float(S.max())

    from_fetchk = sum(1 for i in sel_ids if i in set(top_ids))
    top1_kept = bool(sel_rows and sel_rows[0].rank == 0
                     and sel_ids[0] == top_ids[0])
    diversity_ok = max_pair_sim(sel_ids) <= max_pair_sim(top10_ids) + 1e-12
    return spark.createDataFrame(
        [(len(sel_ids), from_fetchk, top1_kept, diversity_ok)],
        "k bigint, from_fetchk bigint, top1_kept boolean, "
        "diversity_not_worse boolean",
    )


_Q173_SQL = """
WITH s AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS cohort
  FROM {events}
), o AS (
  SELECT event_type,
         CAST(sum(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS DOUBLE)
           AS n_a,
         CAST(sum(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS DOUBLE)
           AS n_b
  FROM s GROUP BY event_type
), t AS (
  SELECT CAST(sum(n_a) AS DOUBLE) AS ta, CAST(sum(n_b) AS DOUBLE) AS tb
  FROM o
), e AS (
  SELECT event_type, n_a, n_b,
         (n_a + n_b) * ta / (ta + tb) AS e_a,
         (n_a + n_b) * tb / (ta + tb) AS e_b
  FROM o, t
)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round((n_a - e_a) * (n_a - e_a) / e_a
             + (n_b - e_b) * (n_b - e_b) / e_b, 6) AS chi2_contrib_r,
       round(sum((n_a - e_a) * (n_a - e_a) / e_a
             + (n_b - e_b) * (n_b - e_b) / e_b) OVER (), 6)
         AS chi2_total_r,
       CAST(count(*) OVER () - 1 AS BIGINT) AS dof
FROM e
"""


@q("q173_chi_square_drift", _Q173_SQL.format(events="events"))
def q173(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square homogeneity test between two cohorts' event-type
    distributions — the CATEGORICAL drift companion to q158 (binned
    numeric PSI) and q164 (exact numeric KS): expected counts from the
    pooled marginals, per-category contribution plus the total and
    degrees of freedom repeated on every row (windows over the
    |categories|-row aggregate).  One map-combined count pass collapses
    the corpus to |categories| rows; everything after is arithmetic on
    that tiny frame, so a 100 TB drift check costs one scan.  The
    even/odd user split here is an A/A test — chi2 ~ dof signals the
    healthy no-drift baseline (12.3 on 4 dof at sf0.01)."""
    load_table(spark, sf, "events").createOrReplaceTempView("q173_events")
    return spark.sql(_Q173_SQL.format(events="q173_events"))


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


@q(
    "q179_lm_perplexity_filter",
    """WITH toks AS (
         SELECT doc_id, string_split(lower(text), ' ') AS ws
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 2
       ), bg AS (
         SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
         FROM toks, LATERAL UNNEST(generate_series(1, len(ws) - 1)) t(i)
       ), cb AS (
         SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
       ), cu AS (
         SELECT w1, sum(c12) AS c1 FROM cb GROUP BY w1
       ), p AS (
         SELECT cb.w1, cb.w2, cb.c12 * 1.0 / cu.c1 AS prob
         FROM cb JOIN cu ON cu.w1 = cb.w1
       ), scored AS (
         SELECT bg.doc_id, ln(p.prob) AS lp
         FROM bg JOIN p ON p.w1 = bg.w1 AND p.w2 = bg.w2
       )
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_bigrams,
              round(exp(-avg(lp)), 4) AS perplexity_r
       FROM scored GROUP BY doc_id""",
)
def q179(spark: SparkSession, sf: str) -> DataFrame:
    """Language-model perplexity scoring (the CCNet/KenLM quality
    recipe, re-expressed relationally on q98's bigram machinery): each
    document's bigrams are scored against the MLE bigram model and
    per-doc perplexity = exp(-mean log P(w2|w1)) reported — gibberish
    and boilerplate score high, fluent text low, and the downstream
    percentile gate (q116's machinery) drops the tail.  Here the model
    is trained on the scored corpus itself; production trains `p` on a
    clean reference corpus and broadcasts it (the model table is
    |bigram vocab|-sized, metadata next to a 100 TB corpus).  Cost
    shape: two map-combined counts build the model, one hash join
    scores (bigram stream never carries text, just token pairs), one
    partial-combined rollup per doc.  All probabilities are exact
    rationals evaluated in fixed order, so the oracle reproduces
    perplexities to the rounded digit."""
    load_table(spark, sf, "documents").createOrReplaceTempView(
        "q179_documents"
    )
    return spark.sql(
        """WITH toks AS (
             SELECT doc_id, split(lower(text), ' ') AS ws
             FROM q179_documents
             WHERE size(split(lower(text), ' ')) >= 2
           ), bg AS (
             SELECT doc_id, ws[i-1] AS w1, ws[i] AS w2
             FROM toks LATERAL VIEW explode(sequence(1, size(ws) - 1))
               t AS i
           ), cb AS (
             SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
           ), cu AS (
             SELECT w1, sum(c12) AS c1 FROM cb GROUP BY w1
           ), p AS (
             SELECT cb.w1, cb.w2, cb.c12 * 1.0 / cu.c1 AS prob
             FROM cb JOIN cu ON cu.w1 = cb.w1
           ), scored AS (
             SELECT bg.doc_id, ln(p.prob) AS lp
             FROM bg JOIN p ON p.w1 = bg.w1 AND p.w2 = bg.w2
           )
           SELECT doc_id,
                  CAST(count(*) AS BIGINT) AS n_bigrams,
                  round(exp(-avg(lp)), 4) AS perplexity_r
           FROM scored GROUP BY doc_id"""
    )


_Q180_SQL = """
WITH updates AS (
  SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
  FROM {customer} WHERE c_custkey % 10 = 0),
expired AS (
  SELECT c.c_custkey, round(c.c_acctbal, 2) AS bal,
         0 AS valid_from, 1 AS valid_to
  FROM {customer} c JOIN updates u ON c.c_custkey = u.c_custkey),
current_v AS (
  SELECT c.c_custkey, coalesce(u.new_bal, round(c.c_acctbal, 2)) AS bal,
         CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END AS valid_from,
         CAST(NULL AS INT) AS valid_to
  FROM {customer} c LEFT JOIN updates u ON c.c_custkey = u.c_custkey),
dim AS (SELECT * FROM expired UNION ALL SELECT * FROM current_v),
facts AS (SELECT o_orderkey, o_custkey, CAST(o_orderkey % 2 AS INT) AS t,
                 o_totalprice FROM {orders}),
pit AS (
  SELECT f.t, d.bal, f.o_totalprice
  FROM facts f JOIN dim d
    ON d.c_custkey = f.o_custkey
   AND f.t >= d.valid_from
   AND (d.valid_to IS NULL OR f.t < d.valid_to))
SELECT t, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue,
       CAST(round(sum(CAST(bal AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS bal_at_time
FROM pit GROUP BY t
"""


@q(
    "q180_scd2_point_in_time",
    _Q180_SQL.format(customer="customer", orders="orders"),
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history (the
    consumption side of q134's type-2 build): each fact joins the
    dimension VERSION valid at the fact's time — equi-join on the
    business key plus a validity-interval post-filter, so Catalyst
    executes a hash join on c_custkey, never a range scan, and
    versions-per-key (small) bounds the post-filter fan-in.  Every
    fact matches exactly one version by SCD2 construction (verified:
    per-epoch counts sum to |orders|); pre-update facts aggregate
    against pre-update balances, the defining property time-travel-
    free engines get wrong.  Money sums go through DECIMAL so both
    engines agree to the cent regardless of summation order."""
    load_table(spark, sf, "customer").createOrReplaceTempView(
        "q180_customer"
    )
    load_table(spark, sf, "orders").createOrReplaceTempView("q180_orders")
    return spark.sql(
        _Q180_SQL.format(customer="q180_customer", orders="q180_orders")
    )


@q(
    "q181_score_calibration",
    """WITH feats AS (
         SELECT doc_id,
           least(len(string_split(text, ' ')), 512) / 512.0 AS f_len,
           (length(text) - length(regexp_replace(text, '[^\\w\\s]', '',
                                                 'g')))
             / length(text)::DOUBLE AS f_punct,
           len(list_filter(string_split(lower(text), ' '),
               t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
             / len(string_split(text, ' ')) AS f_stop,
           len(list_distinct(string_split(text, ' ')))::DOUBLE
             / len(string_split(text, ' ')) AS f_div
         FROM documents),
       scored AS (
         SELECT doc_id, f_stop,
           1.0 / (1.0 + exp(-(-2.0 + 2.5 * f_len - 4.0 * f_punct
                              + 6.0 * f_stop + 2.0 * f_div))) AS score
         FROM feats),
       bucketed AS (
         SELECT ntile(10) OVER (ORDER BY score, doc_id) AS decile,
                score, f_stop
         FROM scored)
       SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
              round(avg(score), 6) AS mean_score_r,
              round(avg(CASE WHEN f_stop >= 0.12 THEN 1.0 ELSE 0.0 END),
                    6) AS frac_stopword_rich_r
       FROM bucketed GROUP BY decile""",
)
def q181(spark: SparkSession, sf: str) -> DataFrame:
    """Score-calibration table for the q168 quality model: documents
    ranked into score deciles (deterministic ntile — ties broken by
    doc_id) with per-decile mean score and the empirical rate of a
    proxy signal (stopword-rich text).  A well-behaved filter shows
    the proxy rate rising monotonically with the score decile; this
    is the reliability audit reviewers demand before gating a corpus
    on a model score.  ntile's single total-order window runs over
    (score, id) PAIRS — at 100 TB, rank against quantile cut points
    from `approx_percentile` instead (q116's machinery) and this
    becomes a map-only bucket assignment; the report itself is a
    |deciles|-row aggregate either way."""
    from .operators.text import (
        punct_ratio,
        stopword_ratio,
        token_count,
        token_diversity,
    )

    docs = load_table(spark, sf, "documents")
    feats = docs.select(
        "doc_id",
        (F.least(token_count("text"), F.lit(512)) / F.lit(512.0)).alias(
            "f_len"
        ),
        punct_ratio("text").alias("f_punct"),
        stopword_ratio("text").alias("f_stop"),
        token_diversity("text").alias("f_div"),
    )
    z = (
        F.lit(-2.0)
        + F.lit(2.5) * F.col("f_len")
        - F.lit(4.0) * F.col("f_punct")
        + F.lit(6.0) * F.col("f_stop")
        + F.lit(2.0) * F.col("f_div")
    )
    scored = feats.select(
        "doc_id",
        "f_stop",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
    )
    bucketed = scored.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("score", "doc_id"))
    )
    return bucketed.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("score"), 6).alias("mean_score_r"),
        F.round(
            F.avg((F.col("f_stop") >= 0.12).cast("double")), 6
        ).alias("frac_stopword_rich_r"),
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


@q(
    "q184_gini_concentration",
    """WITH s AS (
         SELECT source,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
         FROM documents GROUP BY source
       ), r AS (
         SELECT source, toks,
                row_number() OVER (ORDER BY toks, source) AS i,
                count(*) OVER () AS n,
                sum(toks) OVER () AS tot,
                sum(toks) OVER (ORDER BY toks, source) AS cum
         FROM s
       )
       SELECT source, toks,
              round(CAST(cum AS DOUBLE) / tot, 6) AS cum_share_r,
              round(2.0 * sum(CAST(i AS DOUBLE) * toks) OVER ()
                    / (CAST(n AS DOUBLE) * tot) - (n + 1.0) / n, 6)
                AS gini_r
       FROM r""",
)
def q184(spark: SparkSession, sf: str) -> DataFrame:
    """Gini concentration of the token budget across sources — the
    corpus-balance audit behind mixture planning (q139/q155): the
    Lorenz cumulative share per source plus the Gini coefficient
    repeated on every row (0 = perfectly balanced, 1 = one source owns
    the corpus; the synthetic tables land near 0.05).  One
    map-combined token count collapses the corpus to |sources| rows;
    every window after runs over that tiny aggregate, so the audit
    costs one scan at any corpus size.  Deterministic tie-break
    (tokens, source) keeps ranks — and therefore the Gini sum — exact
    across engines."""
    load_table(spark, sf, "documents").createOrReplaceTempView(
        "q184_documents"
    )
    return spark.sql(
        """WITH s AS (
             SELECT source,
                    CAST(sum(size(split(text, ' '))) AS BIGINT) AS toks
             FROM q184_documents GROUP BY source
           ), r AS (
             SELECT source, toks,
                    row_number() OVER (ORDER BY toks, source) AS i,
                    count(*) OVER () AS n,
                    sum(toks) OVER () AS tot,
                    sum(toks) OVER (ORDER BY toks, source) AS cum
             FROM s
           )
           SELECT source, toks,
                  round(CAST(cum AS DOUBLE) / tot, 6) AS cum_share_r,
                  round(2.0 * sum(CAST(i AS DOUBLE) * toks) OVER ()
                        / (CAST(n AS DOUBLE) * tot) - (n + 1.0) / n, 6)
                    AS gini_r
           FROM r"""
    )


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


# the exact all-pairs containment answer (q157's oracle): both q188's
# df-capped path and q189's banding-first composite must reproduce it
# bit-for-bit on the fixture — losslessness is the point of the gate
_CONTAINMENT_ORACLE = """
    WITH sh AS (
      SELECT DISTINCT doc_id,
             concat_ws('|', toks[gs], toks[gs+1], toks[gs+2]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
           LATERAL UNNEST(generate_series(1, greatest(len(toks) - 2, 1)))
             t(gs)
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b
        ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT CAST(doc_a AS BIGINT) AS doc_a,
           CAST(doc_b AS BIGINT) AS doc_b,
           round(i::DOUBLE / sz.sz, 6) AS containment
    FROM inter JOIN sizes sz ON sz.doc_id = doc_a
    WHERE round(i::DOUBLE / sz.sz, 6) >= 0.8
"""


@q("q188_capped_containment", _CONTAINMENT_ORACLE)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    """Containment dedup with the hot-shingle df-cap engaged
    (``max_df=5`` drops the fixture's ~30 most common shingles from
    candidate generation — the same shingles a 100 TB corpus would
    contribute as df=10⁶ boilerplate, where the uncapped co-occurrence
    join's O(Σ df²) is 10¹² rows for ONE stop-shingle).  Candidates
    come from the capped posting self-join (each surviving shingle
    contributes ≤ max_df² rows); every candidate is verified against
    the FULL shingle sets, so values are exact and the oracle is the
    plain uncapped all-pairs answer — the gate proves the cap is
    lossless here, not merely fast.  Dropped shingles are surfaced by
    ``hot_shingle_report`` + an INFO log, never silently."""
    from .operators.dedup import containment_pairs

    docs = load_table(spark, sf, "documents")
    return containment_pairs(docs, n=3, threshold=0.8, max_df=5).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
        "containment",
    )


@q("q189_banding_then_containment", _CONTAINMENT_ORACLE)
def q189(spark: SparkSession, sf: str) -> DataFrame:
    """The banding-first containment composite: MinHash-LSH candidate
    generation (O(colliding buckets), hot-shingle-immune — signatures
    are H mins, not posting lists) followed by exact containment
    scoring of the candidates' full shingle sets, both directions.
    Recall rides on the pair's Jaccard (C >= 0.8 on comparable sizes ⇒
    J >= 2/3 ⇒ collision w.p. > 0.9999 at r=2, b=16), so on this
    fixture — where every containment pair has J >= 0.88 — the output
    equals the exact all-pairs oracle; the extreme quote-inside-a-book
    asymmetry that banding cannot see is q188's df-capped exact path."""
    from .operators.dedup import banding_then_containment

    docs = load_table(spark, sf, "documents")
    return banding_then_containment(docs, n=3, threshold=0.8).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
        "containment",
    )


@q(
    "q190_prefix_filtered_entity_resolution",
    # the EXACT entity-resolution answer — q150's oracle verbatim: the
    # prefix-filtered candidate path must reproduce it bit-for-bit
    _ORACLES["q150_entity_resolution"],
)
def q190(spark: SparkSession, sf: str) -> DataFrame:
    """q150's entity resolution with PREFIX-FILTERED candidate
    generation (PPJoin/AllPairs, Bayardo et al. WWW'07): tokens are
    ranked by global rarity and only each record's first
    |X| - ceil(0.6·|X|) + 1 tokens are indexed — by pigeonhole any pair
    at Jaccard >= 0.6 shares a prefix token, so candidates are
    provably complete for ANY data (a df-cap is NOT: this fixture has
    matched pairs sharing only 2 tokens, so dropping a hot token could
    silently lose a match).  Hot tokens die structurally — rarity
    ordering pushes a stop-token to the end of every record, so its
    posting list (the df² term) only keeps records made almost
    entirely of stop-tokens.  Candidates are verified exactly on full
    token arrays; the oracle is q150's exact SQL, proving losslessness
    end-to-end through the same connected-components clustering."""
    from .operators.dedup import (
        connected_components,
        prefix_filtered_jaccard_pairs,
    )

    parts = load_table(spark, sf, "part")
    tok = parts.select(
        "p_partkey",
        "p_brand",
        F.array_distinct(
            F.concat(
                F.split(F.col("p_name"), " "),
                F.split(F.lower(F.col("p_type")), " "),
            )
        ).alias("toks"),
    )
    matched = prefix_filtered_jaccard_pairs(
        tok, "p_partkey", "toks", 0.6, block_col="p_brand"
    ).select("doc_a", "doc_b")
    labels = connected_components(matched)
    return (
        labels.join(
            parts.select(
                F.col("p_partkey").alias("doc_id"), "p_retailprice"
            ),
            "doc_id",
        )
        .groupBy(F.col("cluster_id").alias("entity_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.round(
                F.max("p_retailprice") - F.min("p_retailprice"), 2
            ).alias("price_spread_r"),
        )
    )


@q(
    "q191_expectations_quarantine",
    """WITH flags AS (
         SELECT c_custkey,
                (c_acctbal < 0.0 OR c_acctbal > 10000.0) AS f_range,
                (c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
                  ('AUTOMOBILE','BUILDING','HOUSEHOLD','MACHINERY'))
                  AS f_seg,
                (c_name IS NULL) AS f_null
         FROM customer)
       SELECT 'accepted_values:c_mktsegment' AS rule,
              CAST(count(*) FILTER (WHERE f_seg) AS BIGINT) AS n_rows
       FROM flags
       UNION ALL
       SELECT 'in_range:c_acctbal',
              CAST(count(*) FILTER (WHERE f_range) AS BIGINT) FROM flags
       UNION ALL
       SELECT 'not_null:c_name',
              CAST(count(*) FILTER (WHERE f_null) AS BIGINT) FROM flags
       UNION ALL
       SELECT '__clean__',
              CAST(count(*) FILTER (WHERE NOT f_range AND NOT f_seg
                                      AND NOT f_null) AS BIGINT)
       FROM flags""",
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    """Expectation-driven quarantine routing (`apply_expectations`):
    customers with negative/oversized balances or a market segment
    outside the accepted set are routed to a CONTRACT-PINNED reject
    sink (quarantine schema = source columns + failed_rules, enforced
    by write_df's policy pin — the reference's policy-aware sink
    pattern, SparkCore.scala:355-360) while clean rows flow on with the
    source schema intact.  The gate reads the quarantine PARQUET BACK
    (proving the eager write, not just the lazy split), explodes the
    per-row blame labels into per-rule reject counts, and appends the
    clean-partition count; the oracle recomputes the whole partition
    from the rule predicates.  One predicate evaluation per rule, two
    filters over one scan — at 100 TB routing costs the pass the
    pipeline already makes."""
    import dataclasses as _dc

    from .contracts.shape import contract as contract_deco
    from .contracts.types import int32
    from .operators.expectations import (
        accepted_values,
        apply_expectations,
        in_range,
        not_null,
    )
    from .sources.io import Sink

    @contract_deco
    @_dc.dataclass
    class QuarantinedCustomer:
        c_custkey: int
        c_name: str
        c_nationkey: int32
        c_acctbal: float
        c_mktsegment: str
        failed_rules: list[str]

    customer = load_table(spark, sf, "customer")
    rules = [
        not_null("c_name"),
        in_range("c_acctbal", 0.0, 10000.0),
        accepted_values(
            "c_mktsegment",
            ["AUTOMOBILE", "BUILDING", "HOUSEHOLD", "MACHINERY"],
        ),
    ]
    qpath = "/tmp/ctdc_q191_quarantine_parquet"
    clean, _quarantined = apply_expectations(
        customer, rules, quarantine_sink=Sink(QuarantinedCustomer, qpath)
    )
    back = spark.read.parquet(qpath)
    per_rule = (
        back.select(F.explode("failed_rules").alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )
    # rules with zero rejects still need a row (the oracle emits all)
    all_rules = spark.createDataFrame(
        [(f"{r.rule}:{r.column}",) for r in rules], "rule string"
    )
    per_rule = (
        all_rules.join(per_rule, "rule", "left")
        .select(
            "rule",
            F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
        )
    )
    clean_row = clean.agg(
        F.count("*").cast("bigint").alias("n_rows")
    ).select(F.lit("__clean__").alias("rule"), "n_rows")
    return per_rule.union(clean_row)
