"""Round-6 operators: FastSS edit-distance pairs, incremental rollup
merge, distributed BPE merge training."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.bpe import (
    bpe_merge_steps,
    word_frequencies,
)
from compile_time_data_contracts_spark.operators.fuzzy import (
    deletion_variants,
    edit_distance_pairs,
)
from compile_time_data_contracts_spark.operators.incremental import (
    aggregate_state,
    finalize_state,
    merge_aggregate_states,
)


# ---------------------------------------------------------------- fuzzy
def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


NAMES = [
    "alpha", "alphb", "alpa", "alphax", "beta", "betas", "bets",
    "gamma", "gamm", "gamma", "delta", "delt", "delte", "x", "y", "",
]


def test_edit_distance_pairs_matches_brute_force_k1(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NAMES)], "k long, s string"
    )
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in edit_distance_pairs(df, "k", "s", max_dist=1).collect()
    }
    want = {
        (i, j, _py_lev(a, b))
        for (i, a), (j, b) in itertools.combinations(
            enumerate(NAMES), 2
        )
        if _py_lev(a, b) <= 1
    }
    assert got == want


def test_edit_distance_pairs_matches_brute_force_k2(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NAMES)], "k long, s string"
    )
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in edit_distance_pairs(df, "k", "s", max_dist=2).collect()
    }
    want = {
        (i, j, _py_lev(a, b))
        for (i, a), (j, b) in itertools.combinations(
            enumerate(NAMES), 2
        )
        if _py_lev(a, b) <= 2
    }
    assert got == want


def test_deletion_variants_counts_and_empty_string(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], "k long, s string")
    rows = deletion_variants(df, "k", "s", radius=1).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["__k"], set()).add(r["__v"])
    # "abc": itself + 3 single deletions, all distinct
    assert by_key[1] == {"abc", "bc", "ac", "ab"}
    # "": only itself (no sequence(0,-1) descending surprise)
    assert by_key[2] == {""}


def test_edit_distance_pairs_rejects_zero(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "k", "s", max_dist=0)


# ---------------------------------------------------------- incremental
def test_merge_equals_recompute(spark):
    rows = [
        ("a", 1.0), ("a", 2.5), ("a", -3.0), ("b", 7.0), ("b", 0.0),
        ("c", 4.25),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    spec = dict(sums=["v"], mins=["v"], maxs=["v"])
    # split three ways, aggregate each, merge — must equal one pass
    parts = [
        df.filter(F.pmod(F.hash("v"), F.lit(3)) == i) for i in range(3)
    ]
    states = [aggregate_state(p, ["g"], **spec) for p in parts]
    merged = merge_aggregate_states(states, ["g"], **spec)
    full = aggregate_state(df, ["g"], **spec)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_disjoint_keys_pass_through(spark):
    spec = dict(sums=["v"], mins=["v"], maxs=["v"])
    a = aggregate_state(
        spark.createDataFrame([("a", 1.0)], "g string, v double"),
        ["g"], **spec,
    )
    b = aggregate_state(
        spark.createDataFrame([("b", 2.0)], "g string, v double"),
        ["g"], **spec,
    )
    m = {r.g: r for r in merge_aggregate_states([a, b], ["g"], **spec).collect()}
    assert m["a"].n == 1 and m["a"].sum_v == 1.0
    assert m["b"].n == 1 and m["b"].max_v == 2.0


def test_finalize_derives_avg(spark):
    spec = dict(sums=["v"])
    st = aggregate_state(
        spark.createDataFrame(
            [("a", 1.0), ("a", 3.0)], "g string, v double"
        ),
        ["g"], **spec,
    )
    out = finalize_state(st, avgs=["v"]).collect()[0]
    assert out.avg_v == 2.0


def test_merge_requires_state(spark):
    with pytest.raises(ValueError):
        merge_aggregate_states([], ["g"])


# ------------------------------------------------------------------ bpe
def test_bpe_canonical_fold_on_repeated_symbols(spark):
    # corpus of one word "aaaa" x5: step 1 must merge (a,a) with pair
    # freq 15 (3 adjacent pairs x 5) and the rewrite must yield
    # [aa, aa] (left-to-right non-rescanning), so step 2 merges
    # (aa, aa) with freq 5
    docs = spark.createDataFrame([("aaaa " * 5,)], "text string")
    merges, words = bpe_merge_steps(
        spark, word_frequencies(docs, "text"), 2
    )
    got = [(r.step, r.lhs, r.rhs, r.pair_freq) for r in merges.collect()]
    assert got == [(1, "a", "a", 15), (2, "aa", "aa", 5)]
    # after both merges the word is a single symbol again
    assert {tuple(r.syms) for r in words.collect()} == {("aaaa",)}
    words.unpersist()


def test_bpe_known_tiny_corpus(spark):
    # Sennrich's classic shape: "low" x5, "lower" x2 — most frequent
    # pair is (l,o) freq 7, then (lo,w) freq 7
    docs = spark.createDataFrame(
        [("low " * 5 + "lower " * 2,)], "text string"
    )
    merges, words = bpe_merge_steps(
        spark, word_frequencies(docs, "text"), 2
    )
    got = [(r.step, r.lhs, r.rhs, r.pair_freq) for r in merges.collect()]
    assert got == [(1, "l", "o", 7), (2, "lo", "w", 7)]
    final = {r.word: list(r.syms) for r in words.collect()}
    assert final["low"] == ["low"]
    assert final["lower"] == ["low", "e", "r"]
    words.unpersist()


def test_bpe_tie_break_is_lexicographic(spark):
    # "ab" and "cd" each x3: pairs (a,b) and (c,d) tie at 3 — the
    # deterministic tie-break must pick (a,b)
    docs = spark.createDataFrame([("ab cd " * 3,)], "text string")
    merges, words = bpe_merge_steps(
        spark, word_frequencies(docs, "text"), 1
    )
    r = merges.collect()[0]
    assert (r.lhs, r.rhs, r.pair_freq) == ("a", "b", 3)
    words.unpersist()


def test_bpe_stops_when_fully_merged(spark):
    # single word "ab" x2 fully merges in 1 step; asking for 5 merges
    # must return only the achievable ones
    docs = spark.createDataFrame([("ab ab",)], "text string")
    merges, words = bpe_merge_steps(
        spark, word_frequencies(docs, "text"), 5
    )
    assert merges.count() == 1
    words.unpersist()


# ------------------------------------------------------ negative sample
def test_negative_samples_deterministic_and_excluding(spark):
    from compile_time_data_contracts_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(60)],
        "doc_id long, lang string",
    )
    a = negative_samples(df, "doc_id", "lang", k=4)
    rows = a.collect()
    # 3 groups x 4 negatives
    assert len(rows) == 12
    # no sampled item belongs to its group
    group_of = {i: "g" + str(i % 3) for i in range(60)}
    for r in rows:
        assert group_of[r.doc_id] != r.lang
        assert 1 <= r.neg_rank <= 4
    # determinism: second run identical
    b = negative_samples(df, "doc_id", "lang", k=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b))
    # different salt draws a different sample
    c = negative_samples(df, "doc_id", "lang", k=4, salt="x").collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, c))


def test_bpe_tokenize_counts_consistent(spark):
    # after 1 merge of "ab ab cd": (a,b) merged => ab:1 token, cd:2
    from compile_time_data_contracts_spark.operators.bpe import (
        bpe_merge_steps,
        word_frequencies,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([("ab ab cd",)], "text string")
    _m, words = bpe_merge_steps(
        spark, word_frequencies(docs, "text"), 1
    )
    counts = {r.word: r.n for r in words.select(
        "word", F.size("syms").alias("n")).collect()}
    assert counts == {"ab": 1, "cd": 2}
    words.unpersist()


# ------------------------------------------------------------- cdc apply
def test_cdc_apply_delete_then_recreate(spark):
    from compile_time_data_contracts_spark.operators.merge import (
        cdc_apply,
    )

    rows = [
        # key 1: insert, update, delete -> absent
        (1, 1, "U", 10.0), (1, 2, "U", 11.0), (1, 3, "D", None),
        # key 2: insert, delete, RE-CREATE -> present with the new value
        (2, 1, "U", 20.0), (2, 2, "D", None), (2, 3, "U", 22.0),
        # key 3: single insert -> present
        (3, 1, "U", 30.0),
    ]
    ch = spark.createDataFrame(
        rows, "k long, seq long, op string, v double"
    )
    got = {
        r.k: r.v
        for r in cdc_apply(ch, ["k"], ["seq"], op_col="op").collect()
    }
    assert got == {2: 22.0, 3: 30.0}


def test_cdc_apply_tiebreak_is_total(spark):
    from compile_time_data_contracts_spark.operators.merge import (
        cdc_apply,
    )

    # same primary seq, distinct tiebreaker: the higher tiebreak wins
    ch = spark.createDataFrame(
        [(1, 5, 1, "U", 1.0), (1, 5, 2, "U", 2.0)],
        "k long, seq long, off long, op string, v double",
    )
    got = cdc_apply(ch, ["k"], ["seq", "off"], op_col="op").collect()
    assert len(got) == 1 and got[0].v == 2.0


# -------------------------------------------------- versioned state merge
def test_versioned_state_merger_redelivery_idempotent(spark, tmp_path):
    from compile_time_data_contracts_spark.operators.incremental import (
        versioned_state_merger,
    )

    base = str(tmp_path / "state")
    spec = dict(sums=["v"], mins=["v"], maxs=["v"])
    h = versioned_state_merger(base, ["g"], **spec)
    b0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    b1 = spark.createDataFrame([("a", 3.0)], "g string, v double")
    h(b0, 0)
    h(b1, 1)
    v1 = sorted(map(tuple, spark.read.parquet(f"{base}/v1").collect()))
    # redelivery of epoch 1 rewrites v1 identically (exactly-once)
    h(b1, 1)
    assert sorted(map(tuple, spark.read.parquet(f"{base}/v1").collect())) == v1
    got = {r.g: (r.n, r.sum_v) for r in spark.read.parquet(f"{base}/v1").collect()}
    assert got == {"a": (2, 4.0), "b": (1, 2.0)}


def test_versioned_state_merger_broken_lineage_raises(spark, tmp_path):
    import pytest as _pytest

    from compile_time_data_contracts_spark.operators.incremental import (
        versioned_state_merger,
    )

    h = versioned_state_merger(
        str(tmp_path / "state2"), ["g"], sums=["v"]
    )
    b = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with _pytest.raises(ValueError, match="lineage"):
        h(b, 3)  # epoch 3 with no v2 on disk


# ------------------------------------------------------------- triangles
def test_triangle_count_known_graphs(spark):
    from compile_time_data_contracts_spark.operators.graph import (
        triangle_count,
    )

    def tc(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        return r.n_edges, r.n_triangles

    # K4: 6 edges, 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert tc(k4) == (6, 4)
    # path: no triangles; star: no triangles
    assert tc([(0, 1), (1, 2), (2, 3)]) == (3, 0)
    assert tc([(0, i) for i in range(1, 6)]) == (5, 0)
    # duplicates / reversed / self-loops are cleaned
    messy = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2), (0, 2)]
    assert tc(messy) == (3, 1)


def test_triangle_count_matches_brute_force_random(spark):
    import itertools
    import random

    from compile_time_data_contracts_spark.operators.graph import (
        triangle_count,
    )

    rng = random.Random(20260814)
    n = 25
    edges = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < 0.3
    ]
    adj = {frozenset(e) for e in edges}
    want = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if {a, b} in adj and {b, c} in adj and {a, c} in adj
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = triangle_count(df).collect()[0].n_triangles
    assert got == want


def test_hll_state_roundtrip_and_merge(spark, tmp_path):
    # sketch column survives the parquet state round-trip and unions to
    # the true distinct count on small cardinalities (HLL exact regime)
    from compile_time_data_contracts_spark.operators.incremental import (
        aggregate_state,
        finalize_state,
        merge_aggregate_states,
    )

    a = spark.createDataFrame(
        [("g", i) for i in range(50)], "g string, u long"
    )
    b = spark.createDataFrame(
        [("g", i) for i in range(25, 75)], "g string, u long"
    )
    p = str(tmp_path / "hll")
    aggregate_state(a, ["g"], hlls=["u"]).write.parquet(p)
    st = spark.read.parquet(p)
    merged = merge_aggregate_states(
        [st, aggregate_state(b, ["g"], hlls=["u"])], ["g"], hlls=["u"]
    )
    r = finalize_state(merged, distinct_estimates=["u"]).collect()[0]
    assert r.n == 100
    # 75 distinct across both halves; HLL is exact at this cardinality
    assert abs(r.est_distinct_u - 75) <= 2


def test_triangle_count_large_ids_no_orderkey_alias(spark):
    # ids beyond 2^32 with MIXED degrees: a packed (deg*2^32+id) order
    # key would alias distinct nodes and corrupt the orientation; the
    # struct key must keep the count exact
    import itertools

    B = 1 << 33
    edges = (
        # K4 on big ids
        [(B + a, B + b) for a in range(4) for b in range(4) if a < b]
        # a small-id node tied into two big nodes (one extra triangle)
        + [(7, B + 0), (7, B + 1)]
    )
    from compile_time_data_contracts_spark.operators.graph import (
        triangle_count,
    )

    adj = {frozenset(e) for e in edges}
    nodes = sorted({x for e in edges for x in e})
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {a, b} in adj and {b, c} in adj and {a, c} in adj
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert r.n_triangles == want == 5


# ------------------------------- round-6 review-fix regressions
def test_cdc_apply_null_op_fails_fast(spark):
    from compile_time_data_contracts_spark.operators.merge import cdc_apply

    changes = spark.createDataFrame(
        [(1, 1, "U", 10), (1, 2, None, 11)],
        "k long, seq long, op string, v long",
    )
    with pytest.raises(Exception, match="NULL op"):
        cdc_apply(changes, ["k"], ["seq"]).collect()


def test_cdc_apply_null_op_on_losing_row_ok(spark):
    from compile_time_data_contracts_spark.operators.merge import cdc_apply

    # CASE WHEN evaluates lazily AFTER the top-1 filter: a NULL op on a
    # superseded change row must not trip the guard
    changes = spark.createDataFrame(
        [(1, 1, None, 10), (1, 2, "U", 11)],
        "k long, seq long, op string, v long",
    )
    rows = cdc_apply(changes, ["k"], ["seq"]).collect()
    assert [(r.k, r.v) for r in rows] == [(1, 11)]
