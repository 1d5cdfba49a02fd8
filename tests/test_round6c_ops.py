"""Round-6 batch C: distributed k-means, label propagation, k-core,
skyline, k-fold assignment, robust stats invariants."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.clustering import (
    kmeans_lloyd,
    micros_vector,
    nearest_centroid,
)
from compile_time_data_contracts_spark.operators.graph import (
    k_core,
    label_propagation,
)
from compile_time_data_contracts_spark.operators.pareto import skyline_2d
from compile_time_data_contracts_spark.operators.sampling import kfold_assign


# ------------------------------------------------------------ k-means
def _py_kmeans(vecs, k, iters):
    """Pure-Python mirror of the integer-micros Lloyd contract."""
    vm = [
        (i, [int(__import__("math").floor(x * 1_000_000)) for x in v])
        for i, v in vecs
    ]
    cents = [m for _, m in sorted(vm)[:k]]
    d = len(cents[0])
    for _ in range(iters):
        buckets = {c: [] for c in range(k)}
        for _, m in vm:
            dists = [
                (sum((a - b) * (a - b) for a, b in zip(m, c)), cid)
                for cid, c in enumerate(cents)
            ]
            buckets[min(dists)[1]].append(m)
        nxt = []
        for cid in range(k):
            rows = buckets[cid]
            if not rows:
                nxt.append(cents[cid])
                continue
            import math

            nxt.append(
                [
                    math.floor(sum(r[j] for r in rows) / len(rows))
                    for j in range(d)
                ]
            )
        cents = nxt
        sizes = {c: len(buckets[c]) for c in range(k)}
    return cents, sizes


def _toy_vectors():
    # 3 obvious blobs in 2-D plus a stray point
    pts = [
        (0, [0.0, 0.0]),
        (1, [0.01, -0.01]),
        (2, [1.0, 1.0]),
        (3, [0.99, 1.02]),
        (4, [-1.0, 1.0]),
        (5, [-0.98, 0.97]),
        (6, [0.5, 0.5]),
    ]
    return pts


def test_kmeans_matches_pure_python(spark):
    pts = _toy_vectors()
    df = spark.createDataFrame(
        [(i, v) for i, v in pts], "vec_id long, embedding array<double>"
    )
    got = kmeans_lloyd(df, k=3, iters=2).collect()
    cents, sizes = _py_kmeans(pts, k=3, iters=2)
    want = {
        (cid, dim): (cents[cid][dim], sizes[cid])
        for cid in range(3)
        for dim in range(2)
    }
    assert len(got) == 6
    for r in got:
        c, n = want[(r.cid, r.dim)]
        assert (r.c_micros, r.n) == (c, n), (r.cid, r.dim)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # two far blobs, k=3 seeded from the 3 smallest ids (all in blob
    # one) -> after the update, at least one centroid keeps n=0 rows
    # in some round; engineer it directly: a seed point so remote that
    # nothing assigns to it after round 1 moves the others
    pts = [
        (0, [0.0, 0.0]),
        (1, [100.0, 100.0]),
        (2, [0.1, 0.1]),
        (3, [0.11, 0.09]),
        (4, [0.12, 0.12]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = kmeans_lloyd(df, k=2, iters=2).collect()
    cents, sizes = _py_kmeans(pts, k=2, iters=2)
    for r in out:
        assert r.c_micros == cents[r.cid][r.dim]
        assert r.n == sizes[r.cid]


def test_kmeans_rejects_bad_params(spark):
    df = spark.createDataFrame(
        [(0, [0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=1, iters=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=5, iters=1)  # fewer vectors than k


def test_nearest_centroid_tie_breaks_to_smallest_cid(spark):
    df = spark.createDataFrame(
        [(0, [5.0, 5.0])], "vec_id long, embedding array<double>"
    )
    vm = df.select(micros_vector(F.col("embedding")).alias("m"))
    # two identical centroids -> cid 0 must win
    cents = [[5_000_000, 5_000_000], [5_000_000, 5_000_000]]
    got = vm.select(nearest_centroid(F.col("m"), cents).alias("c")).collect()
    assert got[0].c == 0


# ---------------------------------------------------- label propagation
def test_label_propagation_chain(spark):
    # path graph 1-2-3-4-5, seed node 1 with label 7: after 2 rounds
    # labels reach node 3; nodes 4, 5 stay unlabeled
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1, 7)], "id long, label long")
    got = {
        r.id: r.label
        for r in label_propagation(edges, seeds, iters=2).collect()
    }
    assert got == {1: 7, 2: 7, 3: 7}


def test_label_propagation_majority_and_tie_break(spark):
    # node 0 has neighbors: two with label 5, one with label 3 ->
    # majority 5; node 9 has one neighbor each of 3 and 5 -> tie ->
    # smaller label 3
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (9, 1), (9, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1, 3), (2, 5), (3, 5), (4, 5)], "id long, label long"
    )
    got = {
        r.id: r.label
        for r in label_propagation(edges, seeds, iters=1).collect()
    }
    assert got[0] == 5
    assert got[9] == 3


def test_label_propagation_seeds_are_clamped(spark):
    # seeded node surrounded by a different majority keeps its seed
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 2), (3, 2)], "id long, label long"
    )
    got = {
        r.id: r.label
        for r in label_propagation(edges, seeds, iters=3).collect()
    }
    assert got[0] == 1


# -------------------------------------------------------------- k-core
def test_k_core_peels_tail_and_keeps_clique(spark):
    # K4 clique (every degree 3) with a pendant chain hanging off it
    clique = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    chain = [(4, 5), (5, 6)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r.id: r.degree for r in k_core(edges, k=3, max_peels=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_converges_on_gate_fixture(spark, sf_dir):
    # the q220 contract: after 3 peels at k=15 the fixture's core is
    # STABLE (every surviving degree >= 15 proves a true 15-core)
    from compile_time_data_contracts_spark.queries import queries

    out = queries()["q220_k_core"](spark, sf_dir)
    mind = out.agg(F.min("degree")).collect()[0][0]
    assert mind is not None and mind >= 15


def test_k_core_empty_result_when_overdemanding(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert k_core(edges, k=5, max_peels=2).count() == 0


# ------------------------------------------------------------- skyline
def test_skyline_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    pts = [(rng.randrange(50), rng.randrange(50)) for _ in range(300)]
    df = spark.createDataFrame(pts, "c long, s long")
    got = {(r.c, r.s) for r in skyline_2d(df, "c", "s").collect()}
    distinct = set(pts)
    want = {
        (c, s)
        for c, s in distinct
        if not any(
            (c2 <= c and s2 >= s and (c2 < c or s2 > s))
            for c2, s2 in distinct
        )
    }
    assert got == want


def test_skyline_single_point_and_dominated_column(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 3), (2, 10), (2, 11)], "c long, s long"
    )
    got = {(r.c, r.s) for r in skyline_2d(df, "c", "s").collect()}
    # (1,10) survives; (2,11) beats every higher-s-at-higher-c
    assert got == {(1, 10), (2, 11)}


# -------------------------------------------------------------- k-fold
def test_kfold_balanced_and_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    f1 = kfold_assign(docs, "doc_id", k=5)
    sizes = {
        r.fold: r.n for r in f1.groupBy("fold").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    n = sum(sizes.values())
    assert set(sizes) == {0, 1, 2, 3, 4}
    for c in sizes.values():
        assert abs(c - n / 5) <= 0.15 * n / 5 + 5  # hash uniformity
    # stable across recomputation and independent of partitioning
    f2 = kfold_assign(docs.repartition(7), "doc_id", k=5)
    assert (
        f1.select("doc_id", "fold")
        .exceptAll(f2.select("doc_id", "fold"))
        .count()
        == 0
    )


def test_kfold_salt_changes_split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = kfold_assign(docs, "doc_id", k=5, salt="a").select("doc_id", "fold")
    b = kfold_assign(docs, "doc_id", k=5, salt="b").select("doc_id", "fold")
    moved = a.join(
        b.withColumnRenamed("fold", "fold_b"), "doc_id"
    ).filter(F.col("fold") != F.col("fold_b"))
    assert moved.count() > 0


def test_kfold_rejects_k1(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        kfold_assign(docs, "doc_id", k=1)


# -------------------------------------------- robust stats invariants
def test_trimmed_and_winsorized_bounded_by_extremes(spark, sf_dir):
    from compile_time_data_contracts_spark.queries import queries

    out = queries()["q221_robust_group_stats"](spark, sf_dir).collect()
    assert len(out) == 25
    for r in out:
        assert r.lo_cents <= r.trimmed_mean_cents <= r.hi_cents
        assert r.lo_cents <= r.winsorized_mean_cents <= r.hi_cents


# ------------------------------- round-6 review-fix regressions
def test_skyline_fractional_axis(spark):
    # rangeBetween(-1) regression: (2.0, 50) is dominated by (1.5, 100)
    # even though their min-axis gap is < 1
    df = spark.createDataFrame(
        [(1.5, 100.0), (2.0, 50.0), (2.25, 120.0)],
        "c double, s double",
    )
    got = {(r.c, r.s) for r in skyline_2d(df, "c", "s").collect()}
    assert got == {(1.5, 100.0), (2.25, 120.0)}


def test_label_propagation_isolated_seed_returned(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(5, 7), (1, 3)], "id long, label long")
    got = {
        (r.id, r.label)
        for r in label_propagation(edges, seeds, iters=2).collect()
    }
    # node 5 has no edges but is seeded: it must appear, clamped
    assert (5, 7) in got
    assert (1, 3) in got
