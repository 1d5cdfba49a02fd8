"""Round-6 batch H: mutual information, inter-arrival burstiness,
exact percentile bands, two-proportion z-test, leave-fold-out target
encoding, k-anonymity publish."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime, timedelta

from compile_time_data_contracts_spark.operators.expectations import (
    k_anonymity_publish,
)
from compile_time_data_contracts_spark.operators.sampling import (
    target_encode_loo,
)
from compile_time_data_contracts_spark.operators.stats import (
    mutual_information,
    percentile_bands,
    two_proportion_ztest,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    interarrival_stats,
)


# ------------------------------------------------- mutual information
def _brute_mi(pairs):
    n = len(pairs)
    jc, xc, yc = Counter(pairs), Counter(), Counter()
    for x, y in pairs:
        xc[x] += 1
        yc[y] += 1
    mi = sum(
        (c / n) * math.log((c / n) / ((xc[x] / n) * (yc[y] / n)))
        for (x, y), c in jc.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in xc.values())
    hy = -sum((c / n) * math.log(c / n) for c in yc.values())
    return mi, hx, hy


def test_mi_matches_brute_force(spark):
    pairs = (
        [("a", "p")] * 30 + [("a", "q")] * 10
        + [("b", "p")] * 5 + [("b", "q")] * 55
    )
    df = spark.createDataFrame(pairs, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    mi, hx, hy = _brute_mi(pairs)
    assert r["n"] == 100
    assert abs(r["mi_r"] - round(mi, 6)) < 1e-6
    assert abs(r["nmi_r"] - round(mi / math.sqrt(hx * hy), 6)) < 1e-6


def test_mi_independent_is_zero_and_identity_is_entropy(spark):
    # perfectly independent: MI = 0
    ind = [(x, y) for x in "ab" for y in "pq" for _ in range(25)]
    r = mutual_information(
        spark.createDataFrame(ind, "x string, y string"), "x", "y"
    ).collect()[0]
    assert abs(r["mi_r"]) < 1e-9
    # y == x: MI = H(X), NMI = 1
    idn = [(x, x) for x in "abcd" for _ in range(10)]
    r2 = mutual_information(
        spark.createDataFrame(idn, "x string, y string"), "x", "y"
    ).collect()[0]
    assert abs(r2["mi_r"] - round(math.log(4), 6)) < 1e-6
    assert abs(r2["nmi_r"] - 1.0) < 1e-6


def test_mi_constant_column_nmi_null(spark):
    df = spark.createDataFrame(
        [("a", "p"), ("a", "q")], "x string, y string"
    )
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_r"] == 0.0 and r["nmi_r"] is None


# ---------------------------------------------------- inter-arrival
def test_interarrival_matches_brute_force(spark):
    base = datetime(2024, 1, 1)
    offs = [0, 10, 11, 12, 100, 101, 500]  # bursty seconds
    rows = [("k", base + timedelta(seconds=o), i)
            for i, o in enumerate(offs)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id int")
    r = interarrival_stats(df, "k", "ts", "id").collect()[0]
    gaps = [(b - a) * 1e6 for a, b in zip(offs, offs[1:])]
    mu = sum(gaps) / len(gaps)
    var = sum(g * g for g in gaps) / len(gaps) - mu * mu
    sig = math.sqrt(var)
    assert r["n_gaps"] == 6
    assert abs(r["mean_gap_s_r"] - round(mu / 1e6, 4)) < 1e-4
    assert abs(r["cv_r"] - round(sig / mu, 4)) < 1e-4
    assert abs(
        r["burstiness_r"] - round((sig - mu) / (sig + mu), 4)
    ) < 1e-4


def test_interarrival_regular_clock_and_single_event(spark):
    base = datetime(2024, 1, 1)
    rows = [("clock", base + timedelta(seconds=60 * i), i)
            for i in range(10)]
    rows += [("lonely", base, 99)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id int")
    out = {r["k"]: r for r in
           interarrival_stats(df, "k", "ts", "id").collect()}
    # regular clock: sigma = 0 -> burstiness exactly -1
    assert out["clock"]["cv_r"] == 0.0
    assert out["clock"]["burstiness_r"] == -1.0
    assert "lonely" not in out  # no gaps, no row


# ------------------------------------------------- percentile bands
def test_percentile_bands_match_brute_force(spark):
    vals = [float(v) for v in range(1, 201)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double"
    )
    r = percentile_bands(df, "v", ["g"]).collect()[0]
    s = sorted(int(v * 100) for v in vals)
    for name, q in [("p50_r", 0.5), ("p90_r", 0.9), ("p99_r", 0.99)]:
        exp = s[max(1, math.ceil(q * len(s))) - 1] / 100
        assert r[name] == round(exp, 2), name
    assert r["n"] == 200


# ------------------------------------------------------------ z-test
def test_ztest_matches_scipy_formula(spark):
    rows = [("A", 1)] * 60 + [("A", 0)] * 40
    rows += [("B", 1)] * 45 + [("B", 0)] * 55
    df = spark.createDataFrame(rows, "arm string, s int")
    r = two_proportion_ztest(df, "arm", "s", "A", "B").collect()[0]
    pa, pb, pool = 0.6, 0.45, 105 / 200
    se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    z = (pa - pb) / se
    assert (r["n_a"], r["k_a"], r["n_b"], r["k_b"]) == (100, 60, 100, 45)
    assert abs(r["z_r"] - round(z, 4)) < 1e-4
    assert r["significant_95"] == (abs(z) > 1.959963984540054)


def test_ztest_degenerate_pool_yields_null_not_error(spark):
    rows = [("A", 1)] * 10 + [("B", 1)] * 10  # everyone converts
    df = spark.createDataFrame(rows, "arm string, s int")
    r = two_proportion_ztest(df, "arm", "s", "A", "B").collect()[0]
    assert r["z_r"] is None and r["significant_95"] is None
    assert r["rate_a_r"] == 1.0 and r["rate_b_r"] == 1.0


# -------------------------------------------------- target encoding
def test_target_encode_loo_excludes_own_fold(spark):
    # one key, values 10..59; check each fold's encoding equals the
    # mean over the OTHER folds exactly
    rows = [(f"id{i}", "k", float(10 + i)) for i in range(50)]
    df = spark.createDataFrame(rows, "rid string, key string, v double")
    out = target_encode_loo(
        df, ["key"], "v", "rid", k=5
    ).collect()
    # recompute folds with the same md5 rule
    import hashlib

    def fold(rid):
        h = hashlib.md5(f"{rid}|kfold-v1".encode()).hexdigest()
        return int(h[:8], 16) % 5

    cells = {}
    for i in range(50):
        f, v = fold(f"id{i}"), int((10 + i) * 100)
        cells.setdefault(f, []).append(v)
    tot_s = sum(sum(v) for v in cells.values())
    tot_n = sum(len(v) for v in cells.values())
    for r in out:
        f = r["fold"]
        loo_s = tot_s - sum(cells[f])
        loo_n = tot_n - len(cells[f])
        assert r["n_in_fold"] == len(cells[f])
        assert abs(
            r["encoded_r"] - round(loo_s / loo_n / 100, 4)
        ) < 1e-4


def test_target_encode_loo_single_fold_key_is_null(spark):
    # a key whose rows all hash into one fold has no out-of-fold data
    df = spark.createDataFrame(
        [("same", "k1", 5.0)], "rid string, key string, v double"
    )
    out = target_encode_loo(df, ["key"], "v", "rid", k=5).collect()
    assert len(out) == 1 and out[0]["encoded_r"] is None


# -------------------------------------------------------- k-anonymity
def test_k_anonymity_suppresses_small_groups(spark):
    rows = [("big", float(i)) for i in range(20)]
    rows += [("tiny1", 100.0), ("tiny2", 200.0), ("tiny2", 300.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in
           k_anonymity_publish(df, ["g"], "v", k=5).collect()}
    assert set(out) == {"big", "__suppressed__"}
    assert out["big"]["n"] == 20
    assert abs(out["big"]["avg_r"] - 9.5) < 1e-4
    sup = out["__suppressed__"]
    assert sup["n"] == 3 and sup["avg_r"] is None


def test_k_anonymity_no_suppression_edge(spark):
    df = spark.createDataFrame(
        [("a", 1.0)] * 5, "g string, v double"
    )
    out = {r["g"]: r for r in
           k_anonymity_publish(df, ["g"], "v", k=5).collect()}
    assert out["a"]["n"] == 5  # n == k publishes
    assert out["__suppressed__"]["n"] == 0  # explicit zero mass row
