"""Round-7 batch B: sweep-line peak concurrency, clamped balance fold,
decision-stump Gini splits, Mann-Whitney U — each checked against a
pure-Python brute-force reference on randomized synthetic data."""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

from compile_time_data_contracts_spark.operators.stats import (
    gini_best_split,
    mann_whitney_u,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    clamped_running_balance,
    peak_concurrency,
)

T0 = datetime(2024, 3, 1)


# ------------------------------------------------ peak_concurrency
def _brute_peak(intervals):
    """O(n^2) reference: max over start points of live-interval count,
    plus the earliest time the peak is attained."""
    best, best_t = 0, None
    for s, _ in intervals:
        live = sum(1 for s2, e2 in intervals if s2 <= s <= e2)
        if live > best or (live == best and (best_t is None or s < best_t)):
            best, best_t = live, s
    return best, best_t


def test_peak_concurrency_matches_bruteforce(spark):
    rng = random.Random(71)
    rows = []
    per_key = {}
    for key in ("a", "b", "c"):
        ivs = []
        for _ in range(40):
            s = T0 + timedelta(minutes=rng.randrange(0, 500))
            e = s + timedelta(minutes=rng.randrange(0, 120))
            ivs.append((s, e))
            rows.append((key, s, e))
        per_key[key] = ivs
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    got = {
        r["k"]: (r["peak_concurrency"], r["first_peak_ts"], r["n_intervals"])
        for r in peak_concurrency(df, "k", "s", "e").collect()
    }
    for key, ivs in per_key.items():
        peak, first_t = _brute_peak(ivs)
        assert got[key][0] == peak, key
        assert got[key][1] == first_t, key
        assert got[key][2] == len(ivs)


def test_peak_concurrency_identical_stamps(spark):
    # all intervals share one timestamp: peak = n (starts before ends)
    t = T0
    rows = [("x", t, t)] * 5
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    out = peak_concurrency(df, "k", "s", "e").collect()[0]
    assert out["peak_concurrency"] == 5
    assert out["first_peak_ts"] == t


# ----------------------------------------- clamped_running_balance
def test_clamped_balance_matches_fold(spark):
    rng = random.Random(72)
    rows, per_key = [], {}
    for key in range(6):
        deltas = [rng.randrange(-30, 25) for _ in range(60)]
        per_key[key] = deltas
        for i, d in enumerate(deltas):
            rows.append((key, i, d))
    df = spark.createDataFrame(rows, "k long, seq long, delta long")
    got = {
        r["k"]: (r["final_balance"], r["total_in"], r["total_out"], r["n_moves"])
        for r in clamped_running_balance(df, "k", "delta", ["seq"]).collect()
    }
    for key, deltas in per_key.items():
        bal = 0
        for d in deltas:
            bal = max(bal + d, 0)
        assert got[key][0] == bal, key
        assert got[key][1] == sum(d for d in deltas if d > 0)
        assert got[key][2] == -sum(d for d in deltas if d < 0)
        assert got[key][3] == len(deltas)


def test_clamped_balance_clamp_actually_binds(spark):
    # -10 then +3: unclamped would be -7, clamped is 3
    df = spark.createDataFrame(
        [(1, 0, -10), (1, 1, 3)], "k long, seq long, delta long"
    )
    out = clamped_running_balance(df, "k", "delta", ["seq"]).collect()[0]
    assert out["final_balance"] == 3


# ------------------------------------------------- gini_best_split
def _brute_stump(pairs):
    """O(n^2) reference: try every distinct threshold, weighted Gini."""
    n = len(pairs)
    best = None
    for t in sorted({f for f, _ in pairs}):
        left = [(f, y) for f, y in pairs if f <= t]
        right = [(f, y) for f, y in pairs if f > t]
        if not right:
            continue
        cost = 0.0
        for side in (left, right):
            m = len(side)
            p = sum(y for _, y in side)
            gini = 1.0 - (p / m) ** 2 - ((m - p) / m) ** 2
            cost += m * gini
        key = (cost / n, t)
        if best is None or key < best:
            best = key
    return best  # (weighted_gini, threshold)


def test_gini_best_split_matches_bruteforce(spark):
    rng = random.Random(73)
    rows, groups = [], {}
    for grp in ("p", "q"):
        pairs = []
        for _ in range(200):
            f = rng.randrange(0, 25)
            # make label correlate with feature so the split is real
            y = 1 if rng.random() < (0.15 + 0.03 * f) else 0
            pairs.append((f, y))
            rows.append((grp, f, y))
        groups[grp] = pairs
    df = spark.createDataFrame(rows, "g string, f long, y int")
    got = {r["grp"]: r for r in gini_best_split(df, "g", "f", "y").collect()}
    for grp, pairs in groups.items():
        gini, thr = _brute_stump(pairs)
        assert got[grp]["best_threshold"] == thr, grp
        assert math.isclose(
            got[grp]["weighted_gini_r"], round(gini, 6), abs_tol=1e-6
        ), grp
        assert got[grp]["n_left"] == sum(1 for f, _ in pairs if f <= thr)
        assert got[grp]["pos_left"] == sum(y for f, y in pairs if f <= thr)


# -------------------------------------------------- mann_whitney_u
def _brute_mwu(sample1, sample2):
    """Direct pairwise U plus tie-corrected z."""
    u1 = 0.0
    for a in sample1:
        for b in sample2:
            if a > b:
                u1 += 1.0
            elif a == b:
                u1 += 0.5
    n1, n2 = len(sample1), len(sample2)
    n = n1 + n2
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(sample1 + sample2).values())
    mu = n1 * n2 / 2
    sigma = math.sqrt(
        (n1 * n2 / 12) * ((n + 1) - tie / (n * (n - 1)))
    )
    return u1, (u1 - mu) / sigma


def test_mann_whitney_matches_bruteforce(spark):
    rng = random.Random(74)
    rows, cohorts = [], {}
    for c in range(3):
        s1 = [rng.randrange(0, 40) for _ in range(80)]  # group 1 shifted up
        s1 = [v + 5 for v in s1]
        s2 = [rng.randrange(0, 40) for _ in range(90)]
        cohorts[c] = (s1, s2)
        rows += [(c, 1, v) for v in s1] + [(c, 0, v) for v in s2]
    df = spark.createDataFrame(rows, "c long, g int, v long")
    got = {r["cohort"]: r for r in mann_whitney_u(df, "c", "g", "v").collect()}
    for c, (s1, s2) in cohorts.items():
        u1, z = _brute_mwu(s1, s2)
        assert got[c]["n1"] == len(s1) and got[c]["n2"] == len(s2)
        assert math.isclose(got[c]["u1"], u1, abs_tol=0.11), c
        assert math.isclose(got[c]["z_r"], z, abs_tol=1e-5), c
        assert got[c]["z_r"] > 0  # planted shift detected


# ------------------------------------------- bit_or state (bors spec)
def test_bitor_state_merges_like_batch(spark):
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_states,
    )

    rng = random.Random(75)
    rows = [(rng.randrange(8), 1 << rng.randrange(24)) for _ in range(400)]
    df = spark.createDataFrame(rows, "k long, b long")
    halves = [
        df.where(F.col("b") % 2 == 0),
        df.where(F.col("b") % 2 != 0),
    ]
    merged = merge_aggregate_states(
        [aggregate_state(h, ["k"], bors=["b"]) for h in halves],
        ["k"],
        bors=["b"],
    )
    direct = aggregate_state(df, ["k"], bors=["b"])
    got = {r["k"]: (r["n"], r["bor_b"]) for r in merged.collect()}
    want = {r["k"]: (r["n"], r["bor_b"]) for r in direct.collect()}
    assert got == want
    # brute force
    import collections

    masks = collections.defaultdict(int)
    counts = collections.defaultdict(int)
    for k, b in rows:
        masks[k] |= b
        counts[k] += 1
    assert got == {k: (counts[k], masks[k]) for k in masks}
