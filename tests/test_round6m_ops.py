"""Round-6 batch M: RFM scoring (operator) + ABC / cohort-LTV /
seasonal-naive-backtest query shapes (brute-forced on small data)."""

from __future__ import annotations

from datetime import datetime, timedelta

from compile_time_data_contracts_spark.operators.stats import rfm_scores


def test_rfm_matches_hand_computation(spark):
    base = datetime(2024, 1, 1)
    rows = []
    # 5 customers: customer c has c orders of value 100*c, last order
    # at day 10*c -> recency/frequency/monetary all ranked by c
    for c in range(1, 6):
        for k in range(c):
            rows.append((c, base + timedelta(days=10 * c - k), 100.0 * c))
    df = spark.createDataFrame(rows, "cust long, ts timestamp, amt double")
    out = {r["cust"]: r for r in
           rfm_scores(df, "cust", "ts", "amt").collect()}
    # anchor = max date = day 50 (customer 5)
    assert out[5]["recency_days"] == 0
    assert out[1]["recency_days"] == 40
    assert out[3]["frequency"] == 3
    assert out[4]["monetary_r"] == 1600.0  # 4 orders x 400
    # with 5 customers and 5 tiles every score is a distinct quintile:
    # customer 5 is most recent, most frequent, highest spend -> 555
    assert out[5]["segment"] == "555"
    assert out[1]["segment"] == "111"
    # recency reversed: most recent gets the HIGHEST r_score
    assert out[5]["r_score"] == 5 and out[1]["r_score"] == 1


def test_rfm_tie_break_deterministic(spark):
    # all-equal customers: ntile with key tiebreak must yield the same
    # assignment on every run
    base = datetime(2024, 1, 1)
    rows = [(c, base, 10.0) for c in range(10)]
    df = spark.createDataFrame(rows, "cust long, ts timestamp, amt double")
    a = sorted((r["cust"], r["segment"]) for r in
               rfm_scores(df, "cust", "ts", "amt").collect())
    b = sorted((r["cust"], r["segment"]) for r in
               rfm_scores(df, "cust", "ts", "amt").collect())
    assert a == b
    # keys ordered ascending fill tiles in order: cust 0,1 -> tile 1...
    segs = dict(a)
    assert segs[0] == "511"  # recency ntile 1 -> reversed to 5
    assert segs[9] == "155"
