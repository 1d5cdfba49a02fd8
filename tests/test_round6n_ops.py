"""Round-6 batch N: golden-record survivorship, SCD2 validity audit,
gaps-and-islands."""

from __future__ import annotations

from datetime import datetime, timedelta

from compile_time_data_contracts_spark.operators.reconcile import (
    golden_record,
    scd2_validity_audit,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    gaps_islands,
)


# ---------------------------------------------------- golden record
def test_golden_record_field_level_survivorship(spark):
    base = datetime(2024, 1, 1)
    rows = [
        # cluster A: newest row (id 3) is missing phone; the older
        # row's phone must survive alongside the newest email
        ("A", 1, base, "old@x.com", "111"),
        ("A", 3, base + timedelta(days=2), "new@x.com", None),
        ("A", 2, base + timedelta(days=1), None, "222"),
        # cluster B: single member
        ("B", 9, base, None, "999"),
    ]
    df = spark.createDataFrame(
        rows, "cl string, id long, ts timestamp, email string, phone string"
    )
    out = {r["cl"]: r for r in golden_record(
        df, "cl", "id", "ts", ["email", "phone"]
    ).collect()}
    a = out["A"]
    assert a["survivor_id"] == 3 and a["n_members"] == 3
    assert a["email"] == "new@x.com"
    assert a["phone"] == "222"  # first non-null in recency order
    b = out["B"]
    assert b["survivor_id"] == 9 and b["email"] is None
    assert b["phone"] == "999"


def test_golden_record_ts_tie_breaks_by_id(spark):
    base = datetime(2024, 1, 1)
    rows = [("A", 5, base, "five"), ("A", 4, base, "four")]
    df = spark.createDataFrame(rows, "cl string, id long, ts timestamp, v string")
    r = golden_record(df, "cl", "id", "ts", ["v"]).collect()[0]
    assert r["survivor_id"] == 4 and r["v"] == "four"


# ------------------------------------------------------- SCD2 audit
def _scd(spark, rows):
    return spark.createDataFrame(
        rows, "k long, vf timestamp, vt timestamp"
    )


def test_scd2_audit_clean_dimension_all_zero(spark):
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, base + timedelta(days=10)),
        (1, base + timedelta(days=10), None),
        (2, base, None),
    ]
    out = {r["violation"]: r["n"] for r in
           scd2_validity_audit(_scd(spark, rows), "k", "vf", "vt").collect()}
    assert out == {"overlap": 0, "gap": 0, "multi_current": 0}


def test_scd2_audit_detects_each_defect(spark):
    base = datetime(2024, 1, 1)
    rows = [
        # key 1: overlap (second version starts before first ends)
        (1, base, base + timedelta(days=10)),
        (1, base + timedelta(days=5), None),
        # key 2: gap (second starts after first ends)
        (2, base, base + timedelta(days=3)),
        (2, base + timedelta(days=7), None),
        # key 3: two open versions
        (3, base, None),
        (3, base + timedelta(days=1), None),
    ]
    out = {r["violation"]: r["n"] for r in
           scd2_validity_audit(_scd(spark, rows), "k", "vf", "vt").collect()}
    # key 1's explicit overlap, PLUS key 3's first open version
    # followed by a later one (open-to-infinity overlaps anything)
    assert out["overlap"] == 2
    assert out["gap"] == 1
    assert out["multi_current"] == 1


# ----------------------------------------------------- gaps/islands
def test_gaps_islands_matches_brute_force(spark):
    seqs = [1, 2, 3, 7, 8, 12, 20, 21, 22, 23]
    df = spark.createDataFrame([("k", s) for s in seqs], "k string, s long")
    got = sorted(
        (r["island_start"], r["island_end"], r["length"])
        for r in gaps_islands(df, "k", "s").collect()
    )
    assert got == [(1, 3, 3), (7, 8, 2), (12, 12, 1), (20, 23, 4)]


def test_gaps_islands_dedups_and_isolates_keys(spark):
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 4)]
    df = spark.createDataFrame(rows, "k string, s long")
    got = sorted(
        (r["k"], r["island_start"], r["length"])
        for r in gaps_islands(df, "k", "s").collect()
    )
    # duplicate (a,1) collapses; keys never merge islands
    assert got == [("a", 1, 2), ("b", 2, 1), ("b", 4, 1)]


def test_scd2_audit_open_version_followed_by_later_is_overlap(spark):
    # an OPEN version (NULL valid_to) covers [from, infinity): any
    # later version overlaps it — requiring a non-null end would pass
    # exactly the two-truths defect the audit exists to catch
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, None),
        (1, base + timedelta(days=31), base + timedelta(days=59)),
    ]
    out = {r["violation"]: r["n"] for r in
           scd2_validity_audit(_scd(spark, rows), "k", "vf", "vt").collect()}
    assert out["overlap"] == 1
    assert out["multi_current"] == 0  # only one open version


def test_gaps_islands_null_seq_dropped(spark):
    rows = [("a", 1), ("a", 2), ("a", None)]
    df = spark.createDataFrame(rows, "k string, s long")
    got = sorted(
        (r["island_start"], r["length"])
        for r in gaps_islands(df, "k", "s").collect()
    )
    assert got == [(1, 2)]  # no phantom NULL island
