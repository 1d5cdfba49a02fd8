"""Round-6 batch F: CUSUM changepoint, Kaplan-Meier survival,
empirical-Bayes rate shrinkage, Poisson bootstrap CI, quantile
normalization — each checked against a pure-Python brute force."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.stats import (
    eb_rate_shrinkage,
    kaplan_meier,
    poisson_bootstrap_mean_ci,
    quantile_normalize,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    cusum_changepoint,
)


# ------------------------------------------------------------- CUSUM
def _brute_cusum(xs):
    n = len(xs)
    tot = sum(xs)
    best_a, best_i, cum = -1, -1, 0
    for i, x in enumerate(xs, start=1):
        cum += x
        a = abs(n * cum - i * tot)
        if a > best_a:
            best_a, best_i = a, i
    return best_i, best_a / n


def test_cusum_finds_planted_shift(spark):
    # level 10 for 20 ticks, then level 50: the changepoint is the
    # last tick of the low regime (max |cumsum deviation| at i=20)
    xs = [10.0] * 20 + [50.0] * 20
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "t int, v double")
    out = cusum_changepoint(df, "t", "v", scale=100).collect()[0]
    bi, ba = _brute_cusum([int(x * 100) for x in xs])
    assert out["cp_ts"] == bi - 1  # ticks are 0-based, i is 1-based
    assert out["n_points"] == 40
    assert abs(out["max_abs_cusum_r"] - ba / 100) < 1e-4


def test_cusum_grouped_and_tiebreak(spark):
    # group a: constant series -> every |S_i| = 0, tie -> earliest t
    # group b: single spike at t=5
    rows = [("a", t, 7.0) for t in range(10)]
    rows += [("b", t, 1.0 if t != 5 else 100.0) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = {
        r["g"]: r
        for r in cusum_changepoint(
            df, "t", "v", group_cols=["g"], scale=100
        ).collect()
    }
    assert out["a"]["cp_ts"] == 0 and out["a"]["max_abs_cusum_r"] == 0.0
    xs = [100 if t != 5 else 10000 for t in range(10)]
    bi, ba = _brute_cusum(xs)
    assert out["b"]["cp_ts"] == bi - 1
    assert abs(out["b"]["max_abs_cusum_r"] - ba / 100) < 1e-4


# ------------------------------------------------------ Kaplan-Meier
def _brute_km(subjects):
    """subjects: [(duration, event)] -> {t: (n_risk, d, surv)}."""
    times = sorted({d for d, e in subjects if e == 1})
    out, surv = {}, 1.0
    for t in times:
        n = sum(1 for d, _ in subjects if d >= t)
        d = sum(1 for dd, e in subjects if dd == t and e == 1)
        surv *= 1.0 - d / n
        out[t] = (n, d, surv)
    return out


def test_km_matches_brute_force_with_censoring(spark):
    subjects = [
        (2, 1), (3, 1), (3, 0), (5, 1), (5, 1), (7, 0), (8, 1),
        (8, 0), (11, 1), (12, 0),
    ]
    df = spark.createDataFrame(subjects, "dur int, ev int")
    got = {
        r["t"]: (r["n_risk"], r["d_events"], r["surv_r"])
        for r in kaplan_meier(df, "dur", "ev").collect()
    }
    exp = _brute_km(subjects)
    assert set(got) == set(exp)
    for t, (n, d, s) in exp.items():
        gn, gd, gs = got[t]
        assert (gn, gd) == (n, d)
        assert abs(gs - round(s, 6)) < 1e-6


def test_km_terminal_event_survival_zero_not_skipped(spark):
    # everyone at risk dies at the last time: survival must be exactly
    # 0.0 there, not a silently-skipped ln(0) leaving it positive
    subjects = [(1, 1), (4, 1), (4, 1)]
    df = spark.createDataFrame(subjects, "dur int, ev int")
    got = {r["t"]: r["surv_r"] for r in
           kaplan_meier(df, "dur", "ev").collect()}
    assert abs(got[1] - (1 - 1 / 3)) < 1e-6
    assert got[4] == 0.0


def test_km_grouped_curves_independent(spark):
    subjects = [("g1", 2, 1), ("g1", 4, 0), ("g2", 1, 1), ("g2", 1, 1)]
    df = spark.createDataFrame(subjects, "g string, dur int, ev int")
    got = kaplan_meier(df, "dur", "ev", group_cols=["g"]).collect()
    by_g = {(r["g"], r["t"]): r["surv_r"] for r in got}
    assert abs(by_g[("g1", 2)] - 0.5) < 1e-6
    assert by_g[("g2", 1)] == 0.0  # both die at t=1


# ------------------------------------------------- EB rate shrinkage
def test_eb_shrinkage_pulls_small_n_toward_prior(spark):
    # 20 keys with n=100 at ~30% plus one n=1 key at 100%: the n=1
    # key's shrunk rate must land far from 1.0 and near the prior mean
    rows = []
    for k in range(20):
        succ = 30 + (k % 3)  # rates .30/.31/.32
        rows += [(f"k{k}", 1)] * succ + [(f"k{k}", 0)] * (100 - succ)
    rows += [("tiny", 1)]
    df = spark.createDataFrame(rows, "key string, s int")
    out = {r["key"]: r for r in
           eb_rate_shrinkage(df, ["key"], "s").collect()}
    tiny = out["tiny"]
    assert tiny["rate_r"] == 1.0
    assert tiny["shrunk_r"] < 0.6  # pulled hard toward ~0.31
    big = out["k0"]
    assert abs(big["shrunk_r"] - big["rate_r"]) < 0.05


def test_eb_shrinkage_matches_pure_python(spark):
    rows = [("a", 1)] * 3 + [("a", 0)] * 7 + [("b", 1)] * 9 + [
        ("b", 0)
    ] * 1 + [("c", 1)] * 5 + [("c", 0)] * 5
    df = spark.createDataFrame(rows, "key string, s int")
    out = {r["key"]: r["shrunk_r"] for r in
           eb_rate_shrinkage(df, ["key"], "s").collect()}
    rates = {"a": 0.3, "b": 0.9, "c": 0.5}
    m = sum(rates.values()) / 3
    v = sum((r - m) ** 2 for r in rates.values()) / 3
    s = max(m * (1 - m) / max(v, 1e-9) - 1.0, 0.0)
    for k, (kk, nn) in {"a": (3, 10), "b": (9, 10), "c": (5, 10)}.items():
        exp = (kk + m * s) / (nn + s)
        assert abs(out[k] - round(exp, 6)) < 1e-6


# --------------------------------------------- Poisson bootstrap CI
def test_bootstrap_deterministic_and_sane(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = poisson_bootstrap_mean_ci(
        orders, "o_totalprice", "o_orderkey", n_boot=50
    ).collect()[0]
    b = poisson_bootstrap_mean_ci(
        orders, "o_totalprice", "o_orderkey", n_boot=50
    ).collect()[0]
    assert a == b  # hash-deterministic: identical reruns
    assert a["ci_lo_r"] <= a["mean_r"] <= a["ci_hi_r"]
    # CI width shrinks ~1/sqrt(n): sanity-bound it vs the value scale
    assert (a["ci_hi_r"] - a["ci_lo_r"]) < 0.2 * a["mean_r"]


def test_bootstrap_weights_replicate_means_center(spark):
    # constant column: every replicate mean equals the constant exactly
    df = spark.createDataFrame(
        [(i, 42.0) for i in range(500)], "id int, v double"
    )
    r = poisson_bootstrap_mean_ci(df, "v", "id", n_boot=40).collect()[0]
    assert r["mean_r"] == 42.0
    assert r["ci_lo_r"] == 42.0 and r["ci_hi_r"] == 42.0


# ---------------------------------------------- quantile normalize
def test_quantile_normalize_matches_pure_python(spark):
    rows = [("a", i, v) for i, v in enumerate([1, 5, 9, 13])]
    rows += [("b", 100 + i, v) for i, v in enumerate([100, 200, 300, 400])]
    df = spark.createDataFrame(rows, "g string, id int, v int")
    out = {r["id"]: r["normalized"] for r in
           quantile_normalize(df, "v", "g", "id").collect()}
    pooled = sorted([1, 5, 9, 13, 100, 200, 300, 400])
    n = len(pooled)
    for g, vals, ids in [
        ("a", [1, 5, 9, 13], [0, 1, 2, 3]),
        ("b", [100, 200, 300, 400], [100, 101, 102, 103]),
    ]:
        m = len(vals)
        for rank0, (v, i) in enumerate(zip(vals, ids)):
            p = rank0 / (m - 1)
            exp = pooled[math.floor(p * (n - 1))]
            assert out[i] == exp, (g, v)


def test_quantile_normalize_equalizes_groups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quantile_normalize(docs, "n_chars", "source", "doc_id")
    stats = (
        out.groupBy("source")
        .agg(
            F.expr("percentile(normalized, 0.5)").alias("med"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    meds = [r["med"] for r in stats]
    # after normalization every source's median sits near the pooled
    # median (rank granularity allows small slack)
    glob = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("m")
    ).collect()[0]["m"]
    for m in meds:
        assert abs(m - glob) < 0.25 * glob
