"""Data-quality, privacy-publishing, and sketch-contract analytics
(split of tier_stats_ts, round 9): referential/erasure audits,
k-anonymity and l-diversity publishing, HLL/moment/merkle sketch
contracts, encoding and zonemap advisors.

Same playbook as the round-8 splits: registration order within the
former tier is preserved per family, all tier modules share the
`_shared` registry, and `queries()` / `oracle_sql()` stay the single
assembly points.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401

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
