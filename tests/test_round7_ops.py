"""Round-7 batch A: KMV sketches, RA link prediction, multi-touch
attribution, ranking metrics, l-diversity, erasure audit, modularity,
readability, OHLC bars."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.expectations import (
    erasure_audit,
    l_diversity_audit,
)
from compile_time_data_contracts_spark.operators.graph import (
    community_modularity,
    link_prediction_ra,
)
from compile_time_data_contracts_spark.operators.sketches import (
    kmv_sketch,
    kmv_union_intersection,
)
from compile_time_data_contracts_spark.operators.stats import (
    NDCG_DISCOUNT_MICRO,
    ranking_metrics,
)
from compile_time_data_contracts_spark.operators.text import (
    readability_scores,
)
from compile_time_data_contracts_spark.operators.timeseries import (
    multitouch_attribution,
    ohlc_bars,
)


# ------------------------------------------------------ KMV sketch
def test_kmv_small_sets_are_exact(spark):
    # fewer than k distinct keys per set -> the sketch is exhaustive
    # and estimates must equal the exact counts
    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(20, 70)]
    df = spark.createDataFrame(rows, "s string, k long")
    sk = kmv_sketch(df, "s", "k", k=128)
    est = kmv_union_intersection(
        sk.filter(F.col("set_id") == "a"),
        sk.filter(F.col("set_id") == "b"),
        k=128,
    ).collect()[0]
    assert est["est_union_r"] == 70.0  # |0..69|
    assert est["est_intersection_r"] == 20.0  # |20..39|


def test_kmv_estimator_within_bound(spark):
    # 4000-key sets with 50% overlap, k=256: the estimator path
    # (k_used == k) must land within the 4-sigma ~25% bound
    rows = [("a", i) for i in range(4000)] + [
        ("b", i) for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "s string, k long")
    sk = kmv_sketch(df, "s", "k", k=256)
    est = kmv_union_intersection(
        sk.filter(F.col("set_id") == "a"),
        sk.filter(F.col("set_id") == "b"),
        k=256,
    ).collect()[0]
    assert est["k_used"] == 256
    assert abs(est["est_union_r"] - 6000) / 6000 < 0.25
    assert abs(est["est_intersection_r"] - 2000) < 0.25 * 6000


def test_kmv_sketch_is_mergeable_topk(spark):
    # the sketch of a union equals the k smallest of the merged
    # sketches -- the property that makes KMV a mergeable partial
    rows_a = [("a", i) for i in range(500)]
    rows_b = [("b", i) for i in range(300, 800)]
    df = spark.createDataFrame(rows_a + rows_b, "s string, k long")
    both = spark.createDataFrame(
        [("u", i) for i in range(800)], "s string, k long"
    )
    k = 64
    sk = kmv_sketch(df, "s", "k", k=k)
    merged = set(
        r["h"]
        for r in sk.select("h").distinct().orderBy("h").limit(k).collect()
    )
    direct = set(
        r["h"] for r in kmv_sketch(both, "s", "k", k=k).select("h").collect()
    )
    assert merged == direct


# ------------------------------------------- RA link prediction
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_ra_scores_common_neighbors(spark):
    # path graph 1-3, 2-3: pair (1,2) shares neighbor 3 (deg 2)
    e = _edges(spark, [(1, 3), (2, 3)])
    out = link_prediction_ra(e, max_hub_degree=64, min_common=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["v"]) == (1, 2)
    assert r["cn"] == 1 and r["ra_micro"] == 500_000  # 1e6 / deg(3)=2


def test_ra_excludes_existing_edges_and_caps_hubs(spark):
    # star: hub 0 connects 1..9; every pair shares only the hub
    e = _edges(spark, [(0, i) for i in range(1, 10)])
    # hub degree 9 > cap 5 -> no carriers -> no predictions
    assert (
        link_prediction_ra(e, max_hub_degree=5, min_common=1).count() == 0
    )
    # cap admits the hub -> C(9,2) pairs, none adjacent
    out = link_prediction_ra(e, max_hub_degree=64, min_common=1)
    assert out.count() == 36
    # triangle edge (1,2) present -> that pair must be anti-joined out
    e2 = _edges(spark, [(0, i) for i in range(1, 10)] + [(1, 2)])
    got = {
        (r["u"], r["v"])
        for r in link_prediction_ra(
            e2, max_hub_degree=64, min_common=1
        ).collect()
    }
    assert (1, 2) not in got


# ------------------------------------------- multitouch attribution
def test_attribution_three_models(spark):
    t0 = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # user 1: click then view then purchase -> first=click,
        # last=view, linear 500k each
        (1, t0 - timedelta(hours=2), 1, "click"),
        (1, t0 - timedelta(hours=1), 2, "view"),
        (1, t0, 3, "purchase"),
        # user 2: conversion with no touches -> (direct)
        (2, t0, 4, "purchase"),
        # user 3: touch outside the 7-day window -> (direct)
        (3, t0 - timedelta(days=8), 5, "click"),
        (3, t0, 6, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, ch string"
    )
    out = {
        r["channel"]: r
        for r in multitouch_attribution(
            df, "user_id", "ts", "event_id", "ch", "purchase", 7
        ).collect()
    }
    assert out["click"]["first_touch"] == 1
    assert out["click"]["last_touch"] == 0
    assert out["click"]["linear_micro"] == 500_000
    assert out["view"]["last_touch"] == 1
    assert out["view"]["linear_micro"] == 500_000
    assert out["(direct)"]["first_touch"] == 2
    assert out["(direct)"]["linear_micro"] == 2_000_000


# ------------------------------------------------ ranking metrics
def test_ranking_metrics_perfect_and_worst(spark):
    rows = [
        # group p: both relevant docs ranked 1,2 of 3 -> ndcg 1.0
        ("p", 1, 1), ("p", 2, 1), ("p", 3, 0),
        # group w: single relevant doc at rank 3 -> dcg = disc[3]
        ("w", 1, 0), ("w", 2, 0), ("w", 3, 1),
        # group z: nothing relevant -> ndcg NULL, mrr 0
        ("z", 1, 0), ("z", 2, 0),
    ]
    df = spark.createDataFrame(rows, "g string, pos int, rel int")
    out = {
        r["grp"]: r
        for r in ranking_metrics(
            df, "g", [F.col("pos").asc()], "rel", k=10
        ).collect()
    }
    assert out["p"]["ndcg_r"] == 1.0
    assert out["p"]["mrr_micro"] == 1_000_000
    d3 = NDCG_DISCOUNT_MICRO[2]
    assert out["w"]["dcg_micro"] == d3
    assert out["w"]["mrr_micro"] == 333_333
    assert out["w"]["ndcg_r"] == round(d3 / NDCG_DISCOUNT_MICRO[0], 6)
    assert out["z"]["ndcg_r"] is None and out["z"]["mrr_micro"] == 0


def test_ndcg_discount_table_matches_log2(spark):
    for r, micro in enumerate(NDCG_DISCOUNT_MICRO, start=1):
        assert micro == int(1_000_000 / math.log2(r + 1))


# --------------------------------------------------- l-diversity
def test_l_diversity_flags_homogeneous_group(spark):
    rows = [
        ("g1", "x"), ("g1", "x"), ("g1", "x"),  # homogeneous, size 3
        ("g2", "a"), ("g2", "b"), ("g2", "c"),  # diverse
    ]
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {
        r["qi"]: r for r in l_diversity_audit(df, ["qi"], "s", l=3).collect()
    }
    assert out["g1"]["group_size"] == 3
    assert out["g1"]["l_distinct"] == 1 and not out["g1"]["meets_l"]
    assert out["g2"]["l_distinct"] == 3 and out["g2"]["meets_l"]


# --------------------------------------------------- erasure audit
def test_erasure_audit_counts_and_residual(spark):
    users = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "uid long, name string"
    )
    facts = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (3, 12.0)], "uid long, v double"
    )
    erase = spark.createDataFrame([(1,)], "key long")
    out = {
        r["table_name"]: r
        for r in erasure_audit(
            {"users": (users, "uid"), "facts": (facts, "uid")}, erase
        ).collect()
    }
    assert out["users"]["rows_purged"] == 1
    assert out["users"]["rows_retained"] == 2
    assert out["facts"]["rows_purged"] == 2
    assert out["facts"]["rows_retained"] == 1
    assert out["users"]["residual_refs"] == 0
    assert out["facts"]["residual_refs"] == 0


# ----------------------------------------------------- modularity
def test_modularity_two_cliques(spark):
    # two triangles joined by one bridge edge; perfect 2-community
    # labelling -> strong positive contributions
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    bridge = [(3, 4)]
    e = _edges(spark, tri1 + tri2 + bridge)
    labels = spark.createDataFrame(
        [(i, 0) for i in (1, 2, 3)] + [(i, 1) for i in (4, 5, 6)],
        "id long, label long",
    )
    out = {r["label"]: r for r in community_modularity(e, labels).collect()}
    # |sym| = 14; community 0: internal sym edges 6, degree sum 7
    assert out[0]["internal_edges"] == 6
    assert out[0]["degree_sum"] == 7
    assert out[0]["contribution_r"] == round(6 / 14 - (7 / 14) ** 2, 6)
    # total modularity for the perfect split is positive
    assert out[0]["contribution_r"] + out[1]["contribution_r"] > 0.3


# ---------------------------------------------------- readability
def test_readability_integer_formula(spark):
    df = spark.createDataFrame(
        [("the cat sat on a mat. it was flat!",)], "text string"
    )
    r = readability_scores(df, "text").collect()[0]
    assert r["sentences"] == 2
    assert r["words"] == 9
    # vowel groups: e,a,a,o,a,a,i,a,a  -> 9
    assert r["syllables"] == 9
    exp = 206835 - 1015 * (9 // 2) - (84600 * 9) // 9
    assert r["flesch_milli"] == exp


# ------------------------------------------------------ OHLC bars
def test_ohlc_bars_deterministic_open_close(spark):
    t0 = datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        ("k", t0, 2, 10.5),
        ("k", t0, 1, 10.0),  # same ts, smaller id -> the open
        ("k", t0 + timedelta(minutes=30), 3, 12.25),
        ("k", t0 + timedelta(minutes=59), 4, 9.75),  # the close
        ("k", t0 + timedelta(hours=1), 5, 11.0),  # next bar
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, id long, v double"
    )
    bars = {
        r["bar_ts"]: r
        for r in ohlc_bars(df, "key", "ts", "id", "v", "hour").collect()
    }
    b1 = bars[t0]
    assert b1["open_micro"] == 10_000_000
    assert b1["high_micro"] == 12_250_000
    assert b1["low_micro"] == 9_750_000
    assert b1["close_micro"] == 9_750_000
    assert b1["n_ticks"] == 4
    assert b1["sum_micro"] == 42_500_000
    assert bars[t0 + timedelta(hours=1)]["n_ticks"] == 1


# --------------------------------------------------- filter funnel
def test_filter_funnel_sequential_counts(spark):
    from compile_time_data_contracts_spark.operators.expectations import (
        filter_funnel,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(10)], "x long"
    )
    out = {
        r["stage"]: r
        for r in filter_funnel(
            df,
            [
                ("lt8", F.col("x") < 8),   # drops 2
                ("even", F.col("x") % 2 == 0),  # drops 4 of the 8
                ("ge4", F.col("x") >= 4),  # keeps 4,6 of 0,2,4,6
            ],
        ).collect()
    }
    assert out[1]["n_in"] == 10 and out[1]["n_out"] == 8
    assert out[2]["n_in"] == 8 and out[2]["n_out"] == 4
    assert out[3]["n_in"] == 4 and out[3]["n_out"] == 2
    assert out[3]["rule"] == "ge4"
    assert out[2]["n_dropped"] == 4


def test_filter_funnel_single_scan_plan(spark):
    # the funnel must not re-scan per rule: exactly one aggregate over
    # the input, stages unpivoted from the 1-row result
    from compile_time_data_contracts_spark.operators.expectations import (
        filter_funnel,
    )

    df = spark.range(100).select(F.col("id").alias("x"))
    plan = filter_funnel(
        df, [("a", F.col("x") > 1), ("b", F.col("x") > 2)]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 1


# ---------------------------------------------- sparse TF-IDF kNN
def test_sparse_knn_ranks_lexical_overlap(spark):
    from compile_time_data_contracts_spark.operators.similarity import (
        sparse_tfidf_knn,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d x y"),   # shares trigrams "a|b|c","b|c|d" with 1
            (3, "a b c q r s"),   # shares only "a|b|c" with 1 and 2
            (4, "z z z z z z"),   # shares nothing
        ],
        "doc_id long, text string",
    )
    out = sparse_tfidf_knn(docs, k=3)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    # doc 1's best neighbor is 2 (two shared trigrams beat one)
    assert rows[(1, 1)]["neighbor"] == 2
    assert rows[(1, 2)]["neighbor"] == 3
    # doc 4 has no neighbors at all
    assert not any(d == 4 for d, _ in rows)
    # symmetric: 2's best is 1
    assert rows[(2, 1)]["neighbor"] == 1
    assert 0 < rows[(1, 1)]["cos_r"] <= 1.0


def test_sparse_knn_max_df_caps_hot_terms(spark):
    from compile_time_data_contracts_spark.operators.similarity import (
        sparse_tfidf_knn,
    )

    # the shared trigram appears in ALL 4 docs; max_df=3 must cap it,
    # leaving no shared terms -> no pairs at all
    docs = spark.createDataFrame(
        [(i, f"a b c u{i} v{i} w{i}") for i in range(4)],
        "doc_id long, text string",
    )
    assert sparse_tfidf_knn(docs, k=3, max_df=3).count() == 0
    assert sparse_tfidf_knn(docs, k=3, max_df=4).count() > 0


def test_modularity_precomputed_edge_count_identical(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1)], "id long, label long"
    )
    base = sorted(
        map(tuple, community_modularity(e, labels).collect())
    )
    # |sym| = 8; passing it skips the build-time count job
    pre = sorted(
        map(
            tuple,
            community_modularity(e, labels, n_sym_edges=8).collect(),
        )
    )
    assert base == pre


def test_ohlc_struct_state_merge_is_algebraic(spark):
    # the q304 insight in miniature: struct min/max across two
    # partial states == the windowed open/close over the union
    from datetime import datetime, timedelta

    from compile_time_data_contracts_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_states,
    )

    t0 = datetime(2024, 5, 1, 9, 0, 0)
    rows1 = [("k", t0 + timedelta(minutes=5), 2, 11.0)]
    rows2 = [
        ("k", t0, 1, 10.0),                        # true open
        ("k", t0 + timedelta(minutes=50), 3, 9.0),  # true close
    ]
    schema = "key string, ts timestamp, id long, v double"

    def keyed(df):
        vm = F.floor(F.col("v") * 1_000_000).cast("bigint")
        tick = F.struct(
            F.col("ts").alias("t"), F.col("id").alias("i"), vm.alias("v")
        )
        return df.select("key", vm.alias("vm"), tick.alias("tick"))

    spec = dict(sums=["vm"], mins=["tick", "vm"], maxs=["tick", "vm"])
    s1 = aggregate_state(
        keyed(spark.createDataFrame(rows1, schema)), ["key"], **spec
    )
    s2 = aggregate_state(
        keyed(spark.createDataFrame(rows2, schema)), ["key"], **spec
    )
    m = merge_aggregate_states([s1, s2], ["key"], **spec).collect()[0]
    assert m["min_tick"]["v"] == 10_000_000  # open from batch 2
    assert m["max_tick"]["v"] == 9_000_000   # close from batch 2
    assert m["min_vm"] == 9_000_000 and m["max_vm"] == 11_000_000
    assert m["n"] == 3


# ----------------------------------------------- audio windows
def test_audio_windows_overlap_and_energy(spark):
    from compile_time_data_contracts_spark.operators.multimodal import (
        attach_fake_media,
        extract_audio_windows,
    )
    import hashlib

    text = "ab" * 50  # 100 bytes -> windows at 0, 32, 64 (96+64>100 stops)
    df = attach_fake_media(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    )
    rows = sorted(
        extract_audio_windows(
            df, window_bytes=64, hop_bytes=32
        ).collect(),
        key=lambda r: r["win_idx"],
    )
    assert [r["offset"] for r in rows] == [0, 32]
    raw = text.encode()
    for r in rows:
        sl = raw[r["offset"]: r["offset"] + 64]
        assert r["digest"] == hashlib.md5(sl).hexdigest()
        assert r["energy"] == sum(sl)


def test_audio_windows_decode_stub_gate(spark):
    from compile_time_data_contracts_spark.operators.multimodal import (
        attach_fake_media,
        extract_audio_windows,
    )
    import pytest as pt

    df = attach_fake_media(
        spark.createDataFrame([(1, "x" * 80)], "doc_id long, text string")
    )
    with pt.raises(Exception, match="NotImplementedError|librosa|decode"):
        extract_audio_windows(df, decode_stub=False).collect()
