"""Governance, layout, and table-operations analytics split from
tier_experiment_gov (round 10): skew/layout/encoding advisors,
merge/full-sync and bitemporal audits, t-closeness publishing
gates, multimodal digests, heavy-hitter churn, consistent-hash
rebalance.  Registration keys and oracle SQL unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401


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
    from ..operators.materialize import pin as _pin
    # t is ~10 rows/month but costs a full orders scan + agg + window to
    # build; it feeds three consumers (cur side, prev side, min-month) —
    # checkpoint so the leaderboard is computed once PER CALL (a leaked
    # persist would be silently reused by later invocations)
    t = (
        s.withColumn(
            "rk",
            F.row_number()
            .over(Window.partitionBy("m").orderBy(F.desc("v"), "c"))
            .cast("bigint"),
        )
        .where(F.col("rk") <= 10)
        .select("m", "c", "rk")
        .transform(_pin)
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

    cust = load_table(spark, sf, "customer")
    r = cust.select(
        (F.col("c_nationkey") % 5).alias("qi_group"),
        F.expr(
            "least(greatest(CAST(floor((c_acctbal + 1000.0D) / 1100.0D)"
            " AS BIGINT), 0), 9)"
        ).alias("band"),
    )
    from ..operators.materialize import pin as _pin
    # checkpoint (not persist): per-call materialization, no cache leak
    cell = (
        r.groupBy("qi_group", "band")
        .agg(F.count("*").cast("bigint").alias("n"))
        .transform(_pin)
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
