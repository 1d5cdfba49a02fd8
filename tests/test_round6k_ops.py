"""Round-6 batch K: keyed pseudonymization, rolling correlation,
personalized PageRank."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.expectations import (
    pseudonymize,
)
from compile_time_data_contracts_spark.operators.graph import (
    pagerank,
    personalized_pagerank,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    rolling_correlation,
)


# ----------------------------------------------------- pseudonymize
def test_pseudonymize_deterministic_and_joinable(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, s string"
    )
    b = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 30.0)], "k long, v double"
    )
    pa = pseudonymize(a, ["k"], "s1")
    pb = pseudonymize(b, ["k"], "s1")
    joined = pa.join(pb, "k").groupBy("s").agg(
        F.sum("v").alias("tot")
    ).collect()
    got = {r["s"]: r["tot"] for r in joined}
    assert got == {"x": 30.0, "y": 30.0}  # joins survive the transform
    tok = pa.filter(F.col("s") == "x").collect()[0]["k"]
    exp = "anon_" + hashlib.md5(b"s1|1").hexdigest()[:16]
    assert tok == exp  # the documented md5 formula, replayable anywhere


def test_pseudonymize_salt_rotation_and_nulls(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    s1 = {r["k"] for r in pseudonymize(df, ["k"], "s1").collect()}
    s2 = {r["k"] for r in pseudonymize(df, ["k"], "s2").collect()}
    assert None in s1 and None in s2  # NULL stays NULL
    assert s1 != s2  # a rotated salt yields a disjoint token space


# ---------------------------------------------- rolling correlation
def _brute_corr(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return num / den


def test_rolling_correlation_matches_brute_force(spark):
    xs = [float(i % 13 + (i % 3) * 5) for i in range(60)]
    ys = [x * 2 + (i % 7) for i, x in enumerate(xs)]  # strongly coupled
    rows = [(i, x, y) for i, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, "t int, x double, y double")
    out = {r["t"]: r for r in rolling_correlation(
        df, "t", "x", "y", window_rows=30, min_rows=10
    ).collect()}
    # check a mid-series window against pure python (micros like the op)
    t = 45
    wx = [int(x * 1e6) for x in xs[t - 29 : t + 1]]
    wy = [int(y * 1e6) for y in ys[t - 29 : t + 1]]
    assert abs(out[t]["r_r"] - round(_brute_corr(wx, wy), 6)) < 1e-5
    assert out[t]["n_window"] == 30
    # cold start below min_rows -> NULL
    assert out[5]["r_r"] is None and out[5]["n_window"] == 6


def test_rolling_correlation_sign_flip_detected(spark):
    # first half y = x, second half y = -x: global corr ~ 0 but every
    # fully-inside rolling window sees |r| ~ 1
    rows = []
    for i in range(40):
        x = float(i % 10 + 1)
        y = x if i < 20 else -x
        rows.append((i, x, y))
    df = spark.createDataFrame(rows, "t int, x double, y double")
    out = {r["t"]: r["r_r"] for r in rolling_correlation(
        df, "t", "x", "y", window_rows=10, min_rows=10
    ).collect()}
    assert out[15] == 1.0  # inside first regime
    assert out[39] == -1.0  # inside second regime


def test_rolling_correlation_constant_series_null(spark):
    rows = [(i, 5.0, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "t int, x double, y double")
    out = rolling_correlation(
        df, "t", "x", "y", window_rows=10, min_rows=5
    ).collect()
    assert all(r["r_r"] is None for r in out)  # zero x-variance


# ------------------------------------------- personalized PageRank
def test_ppr_concentrates_near_seeds(spark):
    # star-ish chain: 0 -> 1 -> 2 -> 3, plus far cluster 10 -> 11
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11]], "id long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    pr = {r["id"]: r["pr"] for r in personalized_pagerank(
        nodes, e, seeds, iters=4
    ).collect()}
    # mass concentrates on the seed's component; the far cluster gets 0
    assert pr[10] == 0.0 and pr[11] == 0.0
    assert pr[0] > pr[2] > 0.0
    assert pr[1] > pr[3]  # closer to the seed along the chain


def test_ppr_uniform_seeds_match_global_pagerank(spark):
    # seeding EVERY node uniformly degenerates to global PageRank
    edges = [(0, 1), (1, 2), (2, 0), (2, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(3)], "id long")
    ppr = {r["id"]: r["pr"] for r in personalized_pagerank(
        nodes, e, nodes, iters=3
    ).collect()}
    gpr = {r["id"]: r["pr"] for r in pagerank(
        nodes, e, iters=3, n_nodes=3
    ).collect()}
    for i in range(3):
        assert abs(ppr[i] - gpr[i]) < 1e-12


def test_ppr_matches_pure_python_iteration(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(3)], "id long")
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {r["id"]: r["pr"] for r in personalized_pagerank(
        nodes, e, seeds, iters=3
    ).collect()}
    out_nbrs = {0: [1], 1: [0, 2], 2: [0]}
    tele = {0: 0.0, 1: 1.0, 2: 0.0}
    pr = dict(tele)
    base = 1.0 - 0.85  # the operator's exact float, not literal 0.15
    for _ in range(3):
        nxt = {i: base * tele[i] for i in range(3)}
        for s, nbrs in out_nbrs.items():
            for d in nbrs:
                nxt[d] += 0.85 * pr[s] / len(nbrs)
        pr = nxt
    for i in range(3):
        assert abs(got[i] - pr[i]) < 1e-12
