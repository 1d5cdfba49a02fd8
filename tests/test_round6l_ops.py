"""Round-6 batch L: interval overlap join, PII scan."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.asof import (
    interval_overlap_join,
)
from compile_time_data_contracts_spark.operators.text import pii_scan


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "id long, st timestamp, en timestamp"
    )


def test_overlap_join_matches_brute_force(spark):
    base = datetime(2024, 1, 1)

    def t(m):
        return base + timedelta(minutes=m)

    left = [(1, t(0), t(60)), (2, t(90), t(120)), (3, t(200), t(210))]
    right = [
        (10, t(30), t(45)),    # inside 1
        (11, t(55), t(95)),    # spans 1 and 2
        (12, t(130), t(150)),  # no overlap
        (13, t(205), t(300)),  # overlaps 3
    ]
    l = _iv(spark, left)
    r = _iv(spark, right)
    got = sorted(
        (row[0], row[1])
        for row in interval_overlap_join(
            l, r, "st", "en", "st", "en", bin_seconds=600
        ).select(F.col("l.id"), F.col("r.id")).collect()
    )
    brute = sorted(
        (li, ri)
        for (li, ls, le) in left
        for (ri, rs, re_) in right
        if ls <= re_ and rs <= le
    )
    assert got == brute
    assert got == [(1, 10), (1, 11), (2, 11), (3, 13)]


def test_overlap_join_multi_bin_pair_emitted_once(spark):
    base = datetime(2024, 1, 1)
    # both intervals span many bins; the rendezvous rule must emit
    # the pair exactly once, not once per shared bin
    l = _iv(spark, [(1, base, base + timedelta(hours=10))])
    r = _iv(spark, [(2, base + timedelta(hours=1),
                     base + timedelta(hours=9))])
    out = interval_overlap_join(
        l, r, "st", "en", "st", "en", bin_seconds=3600
    ).collect()
    assert len(out) == 1


def test_overlap_join_touching_endpoints_inclusive(spark):
    base = datetime(2024, 1, 1)
    l = _iv(spark, [(1, base, base + timedelta(minutes=10))])
    r = _iv(spark, [(2, base + timedelta(minutes=10),
                     base + timedelta(minutes=20))])
    out = interval_overlap_join(
        l, r, "st", "en", "st", "en", bin_seconds=600
    ).collect()
    assert len(out) == 1  # l.en == r.st counts as overlap


def test_pii_scan_counts_planted_patterns(spark):
    rows = [
        (1, "clean text", "none"),
        (2, "mail bob@example.com now", "none"),
        (3, "call +1 555-0100 200", "123-45-6789"),
        (4, "two bob@a.com and +44 20 7946 0958", "none"),
    ]
    df = spark.createDataFrame(rows, "id long, body string, notes string")
    out = {r["column"]: r for r in
           pii_scan(df, ["body", "notes"]).collect()}
    assert out["body"]["n_rows"] == 4
    assert out["body"]["n_email"] == 2
    assert out["body"]["n_phone"] == 2
    assert out["body"]["n_ssn"] == 0
    assert out["notes"]["n_ssn"] == 1
    assert out["notes"]["n_email"] == 0
