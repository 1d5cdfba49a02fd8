"""Round-6 batch G: n-gram novelty, winsorized stats, bounded weighted
SSSP, order-independent table fingerprint, Heaps-law vocabulary
growth."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.graph import sssp_bounded
from compile_time_data_contracts_spark.operators.reconcile import (
    table_fingerprint,
)
from compile_time_data_contracts_spark.operators.stats import (
    winsorized_group_stats,
)
from compile_time_data_contracts_spark.operators.text import (
    ngram_novelty,
    vocabulary_growth,
)


# ---------------------------------------------------------- novelty
def test_ngram_novelty_extremes_and_partial(spark):
    ref = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # fully contained -> novelty 0
            (2, "x y z w v"),        # fully novel -> novelty 1
            (3, "a b c x y z"),      # mixed
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           ngram_novelty(docs, ref, "doc_id", "text", n=3).collect()}
    assert out[1]["novelty_r"] == 0.0
    assert out[2]["novelty_r"] == 1.0
    # doc 3 shingles: abc bcx cxy xyz -> only abc seen -> 3/4 novel
    assert out[3]["n_shingles"] == 4 and out[3]["n_seen"] == 1
    assert abs(out[3]["novelty_r"] - 0.75) < 1e-6


def test_ngram_novelty_short_doc_degenerate(spark):
    # doc shorter than n collapses to one whole-text shingle
    ref = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "q")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           ngram_novelty(docs, ref, "doc_id", "text", n=3).collect()}
    assert out[1]["n_shingles"] == 1 and out[1]["novelty_r"] == 0.0
    assert out[2]["n_shingles"] == 1 and out[2]["novelty_r"] == 1.0


# ------------------------------------------------------- winsorized
def _brute_winsor(vals, lo_q=0.05, hi_q=0.95):
    s = sorted(vals)
    n = len(s)
    lo = s[max(1, math.ceil(lo_q * n)) - 1]
    hi = s[max(1, math.ceil(hi_q * n)) - 1]
    cl = [min(max(v, lo), hi) for v in vals]
    return lo, hi, sum(vals) / n, sum(cl) / n


def test_winsorized_matches_brute_force(spark):
    # 99 ordinary values + one 100x outlier: hi_rank = ceil(.95*100) =
    # 95 sits below the outlier, so the clamp actually bites
    vals = [float(i % 20 + 1) for i in range(99)] + [2000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double"
    )
    r = winsorized_group_stats(df, "v", ["g"]).collect()[0]
    # work in cents like the operator
    lo, hi, mean, wmean = _brute_winsor([int(v * 100) for v in vals])
    assert r["lo_r"] == round(lo / 100, 2)
    assert r["hi_r"] == round(hi / 100, 2)
    assert abs(r["mean_r"] - round(mean / 100, 4)) < 1e-4
    assert abs(r["winsorized_mean_r"] - round(wmean / 100, 4)) < 1e-4
    # the outlier is clamped: winsorized mean well below the raw mean
    assert r["winsorized_mean_r"] < r["mean_r"] - 15


def test_winsorized_groups_independent(spark):
    rows = [("a", float(i)) for i in range(1, 101)]
    rows += [("b", 5.0)] * 20
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in
           winsorized_group_stats(df, "v", ["g"]).collect()}
    # constant group: clamp is identity
    assert out["b"]["mean_r"] == out["b"]["winsorized_mean_r"] == 5.0
    lo, hi, mean, wmean = _brute_winsor(
        [i * 100 for i in range(1, 101)]
    )
    assert out["a"]["lo_r"] == lo / 100 and out["a"]["hi_r"] == hi / 100


# ------------------------------------------------------------- SSSP
def _brute_sssp(edges, seeds, hops):
    dist = {s: 0 for s in seeds}
    for _ in range(hops):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_sssp_matches_brute_force(spark):
    edges = [
        (0, 1, 5), (0, 2, 1), (2, 1, 1), (1, 3, 1), (2, 3, 10),
        (3, 4, 2), (5, 6, 1),
    ]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in
           sssp_bounded(e, seeds, max_hops=3).collect()}
    exp = _brute_sssp(edges, [0], 3)
    assert got == exp
    # the 2-hop path 0->2->1 (cost 2) must beat the direct edge (5)
    assert got[1] == 2
    # within 3 hops the best route to 4 is 0->1->3->4 = 5+1+2; the
    # cheaper 0->2->1->3->4 = 5 needs a 4th hop and must NOT appear
    assert got[4] == 8
    got4 = {r["id"]: r["dist"] for r in
            sssp_bounded(e, seeds, max_hops=4).collect()}
    assert got4[4] == 5


def test_sssp_improves_with_hops_and_multisource(spark):
    edges = [(0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "id long")
    h1 = {r["id"]: r["dist"] for r in
          sssp_bounded(e, seeds, max_hops=1).collect()}
    h3 = {r["id"]: r["dist"] for r in
          sssp_bounded(e, seeds, max_hops=3).collect()}
    assert h1[1] == 10 and h3[1] == 3  # longer path, lower weight
    # multi-source: min over both seeds
    seeds2 = spark.createDataFrame([(0,), (3,)], "id long")
    m = {r["id"]: r["dist"] for r in
         sssp_bounded(e, seeds2, max_hops=1).collect()}
    assert m[1] == 1 and m[3] == 0


# ------------------------------------------------------ fingerprint
def test_table_fingerprint_order_independent_and_sensitive(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, s string"
    )
    b = spark.createDataFrame(
        [(3, "z"), (1, "x"), (2, "y")], "id long, s string"
    )
    fa = table_fingerprint(a, ["id", "s"]).collect()[0]
    fb = table_fingerprint(b, ["id", "s"]).collect()[0]
    assert fa == fb  # row order never matters
    c = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "Z")], "id long, s string"
    )
    fc = table_fingerprint(c, ["id", "s"]).collect()[0]
    assert (fc["fp_xor"], fc["fp_sum_mod"]) != (
        fa["fp_xor"], fa["fp_sum_mod"]
    )


def test_table_fingerprint_null_vs_literal_null(spark):
    a = spark.createDataFrame([(1, None)], "id long, s string")
    b = spark.createDataFrame([(1, "NULL")], "id long, s string")
    fa = table_fingerprint(a, ["id", "s"]).collect()[0]
    fb = table_fingerprint(b, ["id", "s"]).collect()[0]
    assert fa["fp_xor"] != fb["fp_xor"]


def test_table_fingerprint_catches_xor_cancelling_dup_swap(spark):
    # two copies of row A vs two copies of row B XOR to the same (0 ^
    # same pairs) only if A==B; the modular sum must differ when the
    # multiset changes while XOR cancels: {A, A} vs {B, B}
    a = spark.createDataFrame([(7, "p"), (7, "p")], "id long, s string")
    b = spark.createDataFrame([(9, "q"), (9, "q")], "id long, s string")
    fa = table_fingerprint(a, ["id", "s"]).collect()[0]
    fb = table_fingerprint(b, ["id", "s"]).collect()[0]
    assert fa["fp_xor"] == 0 and fb["fp_xor"] == 0  # XOR is blind here
    assert fa["fp_sum_mod"] != fb["fp_sum_mod"]  # the sum is not


# ------------------------------------------------- vocabulary growth
def test_vocabulary_growth_matches_brute_force(spark):
    docs = [
        (1, "a b c"),
        (2, "a b d"),
        (3, "e e e"),
        (4, "a f"),
        (5, "g h i j"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["pt"]: r for r in
           vocabulary_growth(df, "doc_id", "text", n_points=5).collect()}
    seen, ct, cv, curve = set(), 0, 0, {}
    for i, (_, t) in enumerate(docs, start=1):
        ws = t.split(" ")
        ct += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                cv += 1
        curve[i] = (ct, cv)
    for pt in range(1, 6):
        rank = math.ceil(pt * 5 / 5.0)  # == pt here
        assert out[pt]["cum_tokens"] == curve[rank][0]
        assert out[pt]["cum_vocab"] == curve[rank][1]
    assert out[1]["beta_r"] is None
    t1, v1 = curve[1]
    t5, v5 = curve[5]
    exp_beta = math.log(v5 / v1) / math.log(t5 / t1)
    assert abs(out[5]["beta_r"] - round(exp_beta, 4)) < 1e-4


def test_vocabulary_growth_monotone_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        vocabulary_growth(docs, "doc_id", "text").collect(),
        key=lambda r: r["pt"],
    )
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] >= a["cum_tokens"]
        assert b["cum_vocab"] >= a["cum_vocab"]
    # vocabulary grows sublinearly: beta in [0, 1) — the synthetic
    # corpus has a tiny fixed vocabulary, fully discovered by the
    # first decile, so beta can be exactly 0 here
    assert 0.0 <= rows[-1]["beta_r"] < 1.0
