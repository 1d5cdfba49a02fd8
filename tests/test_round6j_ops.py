"""Round-6 batch J: exact stratified split, time-bounded funnel, YoY
growth, multimodal frame sampling."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.multimodal import (
    attach_fake_media,
    extract_frame_samples,
)
from compile_time_data_contracts_spark.operators.sampling import (
    split_exact_stratified,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    funnel_conversion,
    yoy_growth,
)


# ------------------------------------------------ stratified split
def test_split_exact_proportions_per_stratum(spark):
    rows = [(f"a{i}", "big", i) for i in range(100)]
    rows += [(f"b{i}", "small", 1000 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "name string, g string, id long")
    out = split_exact_stratified(df, ["g"], "id")
    counts = {
        (r["g"], r["split"]): r["n"]
        for r in out.groupBy("g", "split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts[("big", "train")] == 80
    assert counts[("big", "val")] == 10
    assert counts[("big", "test")] == 10
    # the 10-doc stratum still gets an exact 8/1/1 — the hash-modulo
    # split cannot guarantee this
    assert counts[("small", "train")] == 8
    assert counts[("small", "val")] == 1
    assert counts[("small", "test")] == 1


def test_split_deterministic_and_total(spark):
    rows = [(i % 3, i) for i in range(99)]
    df = spark.createDataFrame(rows, "g int, id long")
    a = sorted(
        (r["id"], r["split"])
        for r in split_exact_stratified(df, ["g"], "id").collect()
    )
    b = sorted(
        (r["id"], r["split"])
        for r in split_exact_stratified(df, ["g"], "id").collect()
    )
    assert a == b  # md5 ranking: run-stable
    assert len(a) == 99  # every row assigned exactly once


# --------------------------------------------- time-bounded funnel
def test_bounded_funnel_excludes_late_conversion(spark):
    base = datetime(2024, 1, 1)
    rows = [
        # user 1 clicks 10 min after view -> counted
        (1, base, "view"),
        (1, base + timedelta(minutes=10), "click"),
        # user 2 clicks 2 hours after view -> outside the 30-min bound
        (2, base, "view"),
        (2, base + timedelta(hours=2), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    bounded = {r["step"]: r["users_reached"] for r in funnel_conversion(
        df, ["view", "click"], max_gap_s=1800
    ).collect()}
    unbounded = {r["step"]: r["users_reached"] for r in funnel_conversion(
        df, ["view", "click"]
    ).collect()}
    assert bounded["view"] == 2 and bounded["click"] == 1
    assert unbounded["click"] == 2


def test_bounded_funnel_boundary_inclusive(spark):
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, "view"),
        (1, base + timedelta(seconds=1800), "click"),  # exactly at gap
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r["users_reached"] for r in funnel_conversion(
        df, ["view", "click"], max_gap_s=1800
    ).collect()}
    assert out["click"] == 1  # <= bound is inclusive


# ------------------------------------------------------------- YoY
def test_yoy_aligns_by_calendar_not_lag(spark):
    # 1997 months: Jan & Mar only. 1998: Jan, Feb, Mar.  lag(12) over
    # the ordered month list would compare 1998-Feb to 1997-Jan (wrong
    # by a month); the calendar join must yield NULL for 1998-Feb.
    rows = [
        (datetime(1997, 1, 15), 100.0),
        (datetime(1997, 3, 15), 300.0),
        (datetime(1998, 1, 15), 110.0),
        (datetime(1998, 2, 15), 999.0),
        (datetime(1998, 3, 15), 450.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {str(r["month"]): r for r in
           yoy_growth(df, "ts", "v").collect()}
    assert abs(out["1998-01-01"]["yoy_pct_r"] - 0.1) < 1e-4
    assert out["1998-02-01"]["yoy_pct_r"] is None  # no 1997-02
    assert abs(out["1998-03-01"]["yoy_pct_r"] - 0.5) < 1e-4
    assert out["1997-01-01"]["prev_year_rev_r"] is None


# --------------------------------------------------- frame sampling
def test_frame_samples_match_pure_python(spark):
    text = "".join(chr(97 + (i % 26)) for i in range(150))  # 150 B
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = sorted(
        (r["frame_idx"], r["offset"], r["frame_md5"])
        for r in extract_frame_samples(
            attach_fake_media(df), "doc_id", frame_bytes=32, stride=2
        ).collect()
    )
    payload = text.encode()
    exp = []
    n_frames = len(payload) // 32  # 4 whole frames; trailing 22 B dropped
    for fi in range(0, n_frames, 2):
        off = fi * 32
        exp.append(
            (fi, off, hashlib.md5(payload[off:off + 32]).hexdigest())
        )
    assert out == sorted(exp)
    assert len(out) == 2  # frames 0 and 2


def test_frame_samples_short_payload_empty(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    out = extract_frame_samples(
        attach_fake_media(df), "doc_id", frame_bytes=32, stride=1
    ).collect()
    assert out == []  # payload shorter than one frame


def test_split_float_accumulation_boundary_exact(spark):
    # 0.1+0.1+0.1 accumulated in floats is 0.30000000000000004, which
    # would push ceil(cum*10) from 3 to 4 and steal a row from the
    # residual split; exact-rational accumulation must give 1/1/1/7
    rows = [("g", i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, id long")
    out = split_exact_stratified(
        df, ["g"], "id",
        fractions={"a": 0.1, "b": 0.1, "c": 0.1, "d": 0.7},
    )
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 1, "b": 1, "c": 1, "d": 7}
