"""Round-6 batch D: BFS levels, deterministic random walks, OLS by
normal equations, weighted median, seasonal index."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.graph import (
    bfs_levels,
    deterministic_random_walks,
)


# ---------------------------------------------------------------- BFS
def _diamond_edges(spark):
    # 0-1, 0-2, 1-3, 2-3, 3-4, 5-6 (disconnected pair), directed as given
    rows = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 6)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_bfs_exact_hops(spark):
    e = _diamond_edges(spark)
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r.id: r.hop for r in bfs_levels(e, seeds, max_hops=3).collect()
    }
    # undirected (default): 0 at hop 0; 1,2 at hop 1; 3 at hop 2; 4 at 3
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_bfs_respects_hop_budget_and_direction(spark):
    e = _diamond_edges(spark)
    seeds = spark.createDataFrame([(4,)], "id long")
    directed = {
        r.id: r.hop
        for r in bfs_levels(
            e, seeds, max_hops=3, symmetric=False
        ).collect()
    }
    # node 4 has no out-edges in the directed graph
    assert directed == {4: 0}
    short = {
        r.id: r.hop for r in bfs_levels(e, seeds, max_hops=1).collect()
    }
    assert short == {4: 0, 3: 1}


def test_bfs_multi_source_min_distance(spark):
    e = _diamond_edges(spark)
    seeds = spark.createDataFrame([(0,), (4,)], "id long")
    got = {
        r.id: r.hop for r in bfs_levels(e, seeds, max_hops=2).collect()
    }
    # 3 is 2 hops from 0 but 1 hop from 4 — BFS takes the min
    assert got[3] == 1
    assert got[0] == 0 and got[4] == 0
    assert 5 not in got and 6 not in got  # disconnected


# -------------------------------------------------- deterministic walks
def _py_walk(edges, start, steps):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    path = [start]
    cur = start
    for t in range(1, steps + 1):
        nbrs = adj.get(cur)
        if not nbrs:
            break
        pick = min(
            nbrs,
            key=lambda d: (
                hashlib.md5(f"{cur}|{t}|{d}".encode()).hexdigest(),
                d,
            ),
        )
        path.append(pick)
        cur = pick
    return path


def test_walks_match_pure_python(spark):
    rows = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (3, 4), (4, 0)]
    e = spark.createDataFrame(rows, "src long, dst long")
    starts = spark.createDataFrame([(0,), (3,)], "id long")
    got = deterministic_random_walks(e, starts, steps=3).collect()
    by_walk = {}
    for r in got:
        by_walk.setdefault(r.walk, {})[r.step] = r.node
    for s in (0, 3):
        path = _py_walk(rows, s, 3)
        assert [by_walk[s][t] for t in sorted(by_walk[s])] == path


def test_walks_stop_at_sink(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    starts = spark.createDataFrame([(0,)], "id long")
    got = deterministic_random_walks(e, starts, steps=3).collect()
    # 0 -> 1, then 1 has no out-edges: walk has steps 0 and 1 only
    assert sorted((r.step, r.node) for r in got) == [(0, 0), (1, 1)]


# ------------------------------------------------------------- q227 OLS
def test_ols_matches_numpy(spark, sf_dir):
    import numpy as np

    from compile_time_data_contracts_spark.queries.tier_stats import (  # noqa: E501
        q227,
    )

    row = q227(spark, sf_dir).collect()[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    x1 = np.floor(li["l_quantity"].astype(float)).to_numpy()
    x2 = np.floor(li["l_discount"].astype(float) * 100).to_numpy()
    y = np.floor(li["l_extendedprice"].astype(float) * 100).to_numpy()
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(row.intercept_cents - beta[0]) < 1e-2
    assert abs(row.beta_qty_cents - beta[1]) < 1e-4
    assert abs(row.beta_disc_cents - beta[2]) < 1e-2
    assert row.n == len(li)


# ----------------------------------------------------- weighted median
def test_weighted_median_pure_python(spark):
    rows = [
        ("A", 100, 1),
        ("A", 200, 1),
        ("A", 300, 10),  # heavy weight drags the median up
        ("B", 50, 3),
        ("B", 60, 1),
    ]
    df = spark.createDataFrame(rows, "flag string, cents long, w long")
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("flag")
    got = {
        r.flag: r.med
        for r in df.select(
            "flag",
            "cents",
            F.sum("w").over(wcum).alias("cw"),
            F.sum("w").over(wtot).alias("tw"),
        )
        .filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("cents").alias("med"))
        .collect()
    }
    # A: weights 1,1,10 (total 12): first cum*2 >= 12 is cents=300
    # B: weights 3,1 (total 4): cents=50 reaches 6 >= 4
    assert got == {"A": 300, "B": 50}


# ------------------------------------------------------ seasonal index
def test_seasonal_index_weighted_mean_is_one(spark, sf_dir):
    from compile_time_data_contracts_spark.queries.tier_timeseries import (  # noqa: E501
        q229,
    )

    rows = q229(spark, sf_dir).collect()
    n = sum(r.n_events for r in rows)
    # Σ_h (n_h / n) * index_h == 1 exactly (the decomposition identity)
    acc = sum(r.n_events * r.seasonal_index for r in rows) / n
    assert abs(acc - 1.0) < 1e-4
    assert 0 <= min(r.hod for r in rows) and max(r.hod for r in rows) <= 23


# ------------------------------------------------- sliding HLL contract
def test_sliding_hll_exact_matches_brute_force(spark, sf_dir):
    from compile_time_data_contracts_spark.queries.tier_quality_audit import (  # noqa: E501
        q231,
    )

    rows = q231(spark, sf_dir).collect()
    assert rows and all(r.within_5pct for r in rows)
    # brute-force the exact trailing-3-day distinct for one (type, day)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.col("event_type").alias("t"),
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
            "user_id",
        )
        .collect()
    )
    probe = rows[0]
    want = len(
        {
            r.user_id
            for r in ev
            if r.t == probe.event_type
            and probe.day_num - 2 <= r.day <= probe.day_num
        }
    )
    assert probe.exact_unique == want


# ---------------------------------------------------- equi-depth bins
def test_equidepth_bins_are_balanced_and_ordered(spark, sf_dir):
    from compile_time_data_contracts_spark.queries.tier_stats import (  # noqa: E501
        q232,
    )

    rows = sorted(q232(spark, sf_dir).collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == [1, 2, 3, 4]
    # equal population within 1 (ntile's contract)
    ns = [r.n for r in rows]
    assert max(ns) - min(ns) <= 1
    # bins tile the value range in order (boundaries may touch on ties)
    for a, b in zip(rows, rows[1:]):
        assert a.hi_cents <= b.lo_cents


# ----------------------------------------------- referential audit
def test_referential_audit_counts(spark, sf_dir):
    from compile_time_data_contracts_spark.queries.tier_quality_audit import (  # noqa: E501
        q233,
    )

    got = {r.check_name: r.violations for r in q233(spark, sf_dir).collect()}
    # the simulated partial load drops orders with o_orderkey % 97 == 0;
    # their lineitems must be flagged as orphans, exactly
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = li.filter(F.col("l_orderkey") % 97 == 0).count()
    assert got["lineitem_fk_orders"] == want and want > 0
    assert got["orders_fk_customer"] == 0  # custkeys are intact
    assert got["orders_pk_unique"] == 0


# ---------------------------------------------------- agreement / info
def test_cohens_kappa_matches_pure_python(spark, sf_dir):
    from compile_time_data_contracts_spark.queries.tier_llm_eval import q234

    row = q234(spark, sf_dir).collect()[0]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("n_chars", "text")
        .collect()
    )
    pairs = [
        (1 if d.n_chars >= 300 else 0, 1 if len(d.text.split(" ")) >= 50 else 0)
        for d in docs
    ]
    n = len(pairs)
    n11 = sum(1 for a, b in pairs if a and b)
    n10 = sum(1 for a, b in pairs if a and not b)
    n01 = sum(1 for a, b in pairs if not a and b)
    n00 = n - n11 - n10 - n01
    po = (n11 + n00) / n
    pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * (
        (n10 + n00) / n
    )
    kappa = (po - pe) / (1 - pe)
    assert (row.n11, row.n10, row.n01, row.n00) == (n11, n10, n01, n00)
    assert abs(row.kappa - kappa) < 1e-6


def test_entropy_matches_pure_python(spark, sf_dir):
    import math
    from collections import Counter

    from compile_time_data_contracts_spark.queries.tier_llm_text import q235

    rows = {r.source: r for r in q235(spark, sf_dir).collect()}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    counts = Counter()
    for d in docs:
        if d.source == "src0":
            counts.update(d.text.split(" "))
    n = sum(counts.values())
    h = -sum((c / n) * math.log(c / n) for c in counts.values())
    got = rows["src0"]
    assert got.n == n and got.vocab == len(counts)
    # micro-nat flooring loses < vocab / (n * 1e6) nats
    assert abs(got.entropy_nats - h) < 1e-4


def test_js_divergence_bounds_and_python_parity(spark, sf_dir):
    import math
    from collections import Counter

    from compile_time_data_contracts_spark.queries.tier_llm_eval import q236

    row = q236(spark, sf_dir).collect()[0]
    assert 0.0 <= row.js_nats <= math.log(2) + 1e-9
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    ca, cb = Counter(), Counter()
    for d in docs:
        if d.source == "src0":
            ca.update(d.text.split(" "))
        elif d.source == "src1":
            cb.update(d.text.split(" "))
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for t in set(ca) | set(cb):
        p = ca.get(t, 0) / na
        q_ = cb.get(t, 0) / nb
        m = (p + q_) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q_ > 0:
            js += 0.5 * q_ * math.log(q_ / m)
    assert abs(row.js_nats - js) < 1e-4
    assert row.na == na and row.nb == nb


def test_time_decayed_popularity_matches_pure_python(spark, sf_dir):
    import math

    from compile_time_data_contracts_spark.queries.tier_timeseries import (  # noqa: E501
        q237,
    )

    rows = {r.event_type: r for r in q237(spark, sf_dir).collect()}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type", "CAST(ts AS DATE) AS d", "CAST(value AS DOUBLE) AS v"
        )
        .collect()
    )
    mx = max(r.d for r in ev)
    lam = math.log(2) / 7.0
    acc: dict = {}
    cnt: dict = {}
    for r in ev:
        age = (mx - r.d).days
        vm = math.floor(r.v * 1_000_000)
        acc[r.event_type] = acc.get(r.event_type, 0) + math.floor(
            vm * math.exp(-lam * age)
        )
        cnt[r.event_type] = cnt.get(r.event_type, 0) + 1
    for t, want in acc.items():
        assert rows[t].decayed_micros == want
        assert rows[t].n == cnt[t]
