"""Round-6 batch I: price-volume-mix, classification report, prefix
z-score anomalies, time-weighted average."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from compile_time_data_contracts_spark.operators.stats import (
    classification_report,
    prefix_zscore_anomalies,
    price_volume_mix,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    time_weighted_average,
)


# --------------------------------------------------- price-volume-mix
def test_pvm_decomposition_reconciles_exactly(spark):
    # key A: qty 10->12 at unit 5->6; key B: lost; key C: new
    p0 = spark.createDataFrame(
        [("A", 10.0, 50.0), ("B", 4.0, 8.0)],
        "k string, q double, amt double",
    )
    p1 = spark.createDataFrame(
        [("A", 12.0, 72.0), ("C", 3.0, 30.0)],
        "k string, q double, amt double",
    )
    out = {r["k"]: r for r in
           price_volume_mix(p0, p1, ["k"], "q", "amt").collect()}
    a = out["A"]
    # volume = (12-10)*5 = 10; price = (6-5)*10 = 10; cross = 2*1 = 2
    assert a["status"] == "both"
    assert abs(a["volume_eff"] - 10.0) < 1e-9
    assert abs(a["price_eff"] - 10.0) < 1e-9
    assert abs(a["cross_eff"] - 2.0) < 1e-9
    # identity: effects sum exactly to the revenue delta
    assert abs(
        (a["volume_eff"] + a["price_eff"] + a["cross_eff"])
        - (a["r1"] - a["r0"])
    ) < 1e-9
    assert out["B"]["status"] == "lost"
    assert abs(out["B"]["volume_eff"] + 8.0) < 1e-9
    assert out["C"]["status"] == "new"
    assert abs(out["C"]["volume_eff"] - 30.0) < 1e-9
    # total identity across all keys
    tot = sum(
        r["volume_eff"] + r["price_eff"] + r["cross_eff"]
        for r in out.values()
    )
    assert abs(tot - ((72 + 30) - (50 + 8))) < 1e-9


# ---------------------------------------------- classification report
def test_classification_report_matches_sklearn_formulas(spark):
    pairs = (
        [("a", "a")] * 8 + [("a", "b")] * 2
        + [("b", "b")] * 5 + [("b", "a")] * 5
        + [("c", "a")] * 3  # class c never predicted correctly
    )
    df = spark.createDataFrame(pairs, "label string, pred string")
    out = {r["class"]: r for r in
           classification_report(df, "label", "pred").collect()}
    # class a: tp=8 fp=5+3=8 fn=2
    assert (out["a"]["tp"], out["a"]["fp"], out["a"]["fn"]) == (8, 8, 2)
    assert abs(out["a"]["precision_r"] - 0.5) < 1e-6
    assert abs(out["a"]["recall_r"] - 0.8) < 1e-6
    f1 = 2 * 0.5 * 0.8 / 1.3
    assert abs(out["a"]["f1_r"] - round(f1, 6)) < 1e-6
    # class c: never predicted -> precision NULL, recall 0
    assert out["c"]["precision_r"] is None
    assert out["c"]["recall_r"] == 0.0 and out["c"]["f1_r"] is None


def test_classification_report_pred_only_class(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("x", "ghost")], "label string, pred string"
    )
    out = {r["class"]: r for r in
           classification_report(df, "label", "pred").collect()}
    g = out["ghost"]  # predicted but never a true label
    assert g["support"] == 0 and g["tp"] == 0 and g["fp"] == 1
    assert g["recall_r"] is None and g["precision_r"] == 0.0


# --------------------------------------------------- prefix z-score
def test_prefix_zscore_flags_spike_not_history(spark):
    base = datetime(2024, 1, 1)
    rows = [("k", base + timedelta(seconds=i), i, 10.0 + (i % 3))
            for i in range(40)]
    rows.append(("k", base + timedelta(seconds=100), 100, 500.0))
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v double"
    )
    out = prefix_zscore_anomalies(
        df, "k", "ts", "id", "v", min_history=30, z_threshold=3.0
    ).collect()
    assert len(out) == 1 and out[0]["id"] == 100
    # brute force the z of the spike against the 40 prior points
    vs = [int((10.0 + (i % 3)) * 1e6) for i in range(40)]
    mu = sum(vs) / len(vs)
    sig = math.sqrt(sum(v * v for v in vs) / len(vs) - mu * mu)
    z = (500.0 * 1e6 - mu) / sig
    assert abs(out[0]["z_r"] - round(z, 4)) < 1e-3


def test_prefix_zscore_cold_start_never_flags(spark):
    base = datetime(2024, 1, 1)
    # an early extreme point with < min_history prior obs: not flagged
    rows = [("k", base + timedelta(seconds=i), i,
             10.0 if i != 5 else 9999.0) for i in range(20)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v double"
    )
    out = prefix_zscore_anomalies(
        df, "k", "ts", "id", "v", min_history=30
    ).collect()
    assert out == []


# ---------------------------------------------------------- TWAP
def test_twap_matches_hand_computation(spark):
    base = datetime(2024, 1, 1)
    # value 10 held 60s, value 20 held 30s, final obs unweighted
    rows = [
        ("g", base, 0, 10.0),
        ("g", base + timedelta(seconds=60), 1, 20.0),
        ("g", base + timedelta(seconds=90), 2, 999.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, ts timestamp, id long, v double"
    )
    r = time_weighted_average(df, ["g"], "ts", "id", "v").collect()[0]
    exp = (10.0 * 60000 + 20.0 * 30000) / 90000
    assert r["n_obs"] == 3 and r["held_ms"] == 90000
    assert abs(r["twap_r"] - round(exp, 4)) < 1e-4


def test_twap_burst_does_not_overweight(spark):
    base = datetime(2024, 1, 1)
    # ten readings of 100 in one quiet second, then one reading of 0
    # held for an hour: plain mean ~91, TWAP ~0.28
    rows = [("g", base + timedelta(milliseconds=100 * i), i, 100.0)
            for i in range(10)]
    rows.append(("g", base + timedelta(seconds=1), 10, 0.0))
    rows.append(("g", base + timedelta(seconds=3601), 11, 0.0))
    df = spark.createDataFrame(
        rows, "g string, ts timestamp, id long, v double"
    )
    r = time_weighted_average(df, ["g"], "ts", "id", "v").collect()[0]
    assert r["twap_r"] < 5.0  # the burst carried ~1s of 3601s


def test_twap_single_observation_null(spark):
    df = spark.createDataFrame(
        [("g", datetime(2024, 1, 1), 0, 5.0)],
        "g string, ts timestamp, id long, v double",
    )
    r = time_weighted_average(df, ["g"], "ts", "id", "v").collect()[0]
    assert r["twap_r"] is None and r["held_ms"] == 0
