"""Round-6 batch E: exact ROC-AUC (Mann-Whitney midrank) and ordered
funnel conversion."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.stats import roc_auc
from compile_time_data_contracts_spark.operators.timeseries import (
    funnel_conversion,
)


def _brute_auc(pairs):
    """AUC = P(s_pos > s_neg) + 0.5 P(s_pos == s_neg), all pairs."""
    pos = [s for lab, s in pairs if lab == 1]
    neg = [s for lab, s in pairs if lab == 0]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


# ------------------------------------------------------------- roc_auc
def test_roc_auc_matches_all_pairs_brute_force(spark):
    rng = random.Random(11)
    # integer scores => heavy ties, exercising the midrank half-credit
    pairs = [(rng.randrange(2), rng.randrange(8)) for _ in range(300)]
    df = spark.createDataFrame(pairs, "label int, score int")
    got = roc_auc(df, "label", "score").collect()[0]
    want = _brute_auc(pairs)
    assert abs(got.auc_r - round(want, 6)) < 1e-9
    assert got.n_pos == sum(1 for l, _ in pairs if l == 1)
    assert got.n_neg == sum(1 for l, _ in pairs if l == 0)


def test_roc_auc_perfect_and_inverted_and_degenerate(spark):
    perfect = [(1, 10), (1, 9), (0, 2), (0, 1)]
    df = spark.createDataFrame(perfect, "label int, score int")
    assert roc_auc(df, "label", "score").collect()[0].auc_r == 1.0
    inverted = [(l ^ 1, s) for l, s in perfect]
    df = spark.createDataFrame(inverted, "label int, score int")
    assert roc_auc(df, "label", "score").collect()[0].auc_r == 0.0
    # single-class group: AUC undefined -> NULL, not an error
    df = spark.createDataFrame([(1, 5), (1, 6)], "label int, score int")
    r = roc_auc(df, "label", "score").collect()[0]
    assert r.auc_r is None and r.n_pos == 2 and r.n_neg == 0


def test_roc_auc_grouped_independent(spark):
    rng = random.Random(5)
    rows = [
        (g, rng.randrange(2), rng.randrange(5))
        for g in ("a", "b")
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, label int, score int")
    got = {r.g: r.auc_r for r in roc_auc(df, "label", "score", ["g"]).collect()}
    for g in ("a", "b"):
        want = _brute_auc([(l, s) for gg, l, s in rows if gg == g])
        assert abs(got[g] - round(want, 6)) < 1e-9


# ---------------------------------------------------------- funnel
def test_funnel_ordered_semantics(spark):
    # u1 completes in order; u2 clicks BEFORE viewing (click must not
    # count); u3 views only; u4 completes all three out of a noisy log
    rows = [
        (1, 10, "view"), (1, 20, "click"),
        (2, 30, "click"), (2, 40, "view"),
        (3, 50, "view"),
        (4, 1, "view"), (4, 2, "click"), (4, 3, "purchase"),
        (4, 0, "purchase"),  # purchase before the funnel starts: ignored
    ]
    ev = spark.createDataFrame(
        [(u, float(t), s) for u, t, s in rows],
        "user_id long, ts double, event_type string",
    )
    out = {
        r.step_idx: r
        for r in funnel_conversion(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert out[0].users_reached == 4
    assert out[1].users_reached == 2          # u1, u4 (u2 clicked early)
    assert out[2].users_reached == 1          # u4
    assert out[0].conversion_from_prev_r is None
    assert out[1].conversion_from_prev_r == 0.5
    assert out[2].conversion_from_prev_r == 0.5
    assert out[2].conversion_from_first_r == 0.25


def test_funnel_equal_timestamp_not_counted(spark):
    # strict 'after': a click at the exact view timestamp is not a
    # qualifying progression
    ev = spark.createDataFrame(
        [(1, 10.0, "view"), (1, 10.0, "click")],
        "user_id long, ts double, event_type string",
    )
    out = funnel_conversion(ev, ["view", "click"]).collect()
    assert out[0].users_reached == 1 and out[1].users_reached == 0


def test_funnel_rejects_single_step(spark):
    ev = spark.createDataFrame(
        [(1, 1.0, "view")], "user_id long, ts double, event_type string"
    )
    with pytest.raises(ValueError):
        funnel_conversion(ev, ["view"])
