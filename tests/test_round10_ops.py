"""Round-10 tests: per-query metadata filters in batch ANN search —
the heterogeneous multi-tenant serving shape (one batch, many tenants,
each query confined to its own tenant's vectors).  Contracts pinned:

  * per-query parity with |queries| independent filtered
    `ivf_search(filters=...)` / `ivf_pq_topk(filters=...)` calls,
  * cross-label leakage: a query can NEVER surface another label's ids,
    even when both labels share the same probe cells,
  * both-axis directory pruning: the one batch scan carries cluster AND
    label partition filters built from (cluster, value) PAIRS,
  * validation: a filter column missing from the queries frame or from
    the index layout raises the explicit rebuild-with-meta_cols error.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.similarity import (
    ivf_build,
    ivf_pq_build_or_reuse,
    ivf_pq_search_batch,
    ivf_pq_topk,
    ivf_search,
    ivf_search_batch,
)


def _vec(direction, i, dim=4):
    # orthogonal groups with per-vector jitter: every cosine distinct
    base = [0.0] * dim
    base[direction] = 1.0
    base[dim - 1] = 0.001 * (i + 1)
    return base


@pytest.fixture(scope="module")
def tenant_index(spark, tmp_path_factory):
    """Vectors where LABELS CROSS CELLS: two orthogonal directions
    (→ two IVF cells) each containing both label 'a' and label 'b'
    rows, so label confinement cannot be a side effect of cluster
    confinement — the label axis must do real work."""
    rows = [
        (i, _vec(0, i), "a" if i % 2 == 0 else "b") for i in range(20)
    ] + [
        (100 + i, _vec(1, i), "a" if i % 2 == 0 else "b")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    idx = str(tmp_path_factory.mktemp("tivf") / "idx")
    ivf_build(df, idx, n_clusters=2, meta_cols=("label",))
    return df, idx


def _mixed_queries(df):
    # >=2 distinct labels in ONE batch, both directions represented
    return df.filter(F.col("vec_id").isin([0, 1, 100, 101]))


def test_per_query_filtered_batch_matches_single_path(
    spark, tenant_index
):
    df, idx = tenant_index
    queries = _mixed_queries(df)
    batch = ivf_search_batch(
        spark, idx, queries, k=5, nprobe=2, query_id_col="vec_id",
        query_filter_cols=("label",),
    )
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.sim, 9))
        for r in batch.collect()
    }
    for qid, lbl in [(0, "a"), (1, "b"), (100, "a"), (101, "b")]:
        single = ivf_search(
            spark, idx, df.filter(F.col("vec_id") == qid), k=5,
            nprobe=2, filters={"label": lbl},
        ).collect()
        assert len(single) == 5
        for rank, r in enumerate(single, 1):
            assert got[(qid, rank)] == (r.vec_id, round(r.sim, 9))


def test_no_cross_label_leakage(spark, tenant_index):
    """Every returned id must carry the query's OWN label — the two
    labels share every probe cell here, so any attribution slip leaks
    immediately."""
    df, idx = tenant_index
    queries = _mixed_queries(df)
    out = ivf_search_batch(
        spark, idx, queries, k=10, nprobe=2, query_id_col="vec_id",
        query_filter_cols=("label",),
    ).collect()
    assert out
    lbl_of = {r.vec_id: r.label for r in df.collect()}
    for r in out:
        assert lbl_of[r.vec_id] == lbl_of[r.query_id], (
            f"query {r.query_id} ({lbl_of[r.query_id]}) surfaced "
            f"{r.vec_id} ({lbl_of[r.vec_id]})"
        )


def test_pair_pruning_reaches_the_scan(spark, tenant_index):
    """ONE parquet scan whose PartitionFilters carry BOTH axes: the
    cluster predicate and the label predicate (per filter-value group),
    so the directory listing is pruned on (cluster, label) pairs."""
    df, idx = tenant_index
    queries = _mixed_queries(df)
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        plan = (
            ivf_search_batch(
                spark, idx, queries, k=3, nprobe=1,
                query_id_col="vec_id", query_filter_cols=("label",),
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert plan.count("Scan parquet") == 1
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cluster" in pf[0] and "label" in pf[0]


def test_filter_col_validation(spark, tenant_index):
    df, idx = tenant_index
    queries = _mixed_queries(df)
    with pytest.raises(ValueError, match="queries DataFrame"):
        ivf_search_batch(
            spark, idx, queries, query_id_col="vec_id",
            query_filter_cols=("tenant",),
        )
    with pytest.raises(ValueError, match="meta_cols"):
        ivf_search_batch(
            spark, idx,
            queries.withColumn("tenant", F.lit("x")),
            query_id_col="vec_id", query_filter_cols=("tenant",),
        )


def test_per_query_filtered_batch_ivfpq_matches_composite(
    spark, tmp_path
):
    """Compressed-domain twin: a mixed-label ivf_pq_search_batch must
    return each query's own ivf_pq_topk(filters=...) answer — ids AND
    exact re-ranked sims — and never another label's ids."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (
            i,
            (rng.normal(size=8) + 3.0 * np.eye(8)[i % 2]).tolist(),
            "a" if i % 3 == 0 else "b",
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    idx = str(tmp_path / "pqt")
    ivf_pq_build_or_reuse(
        df, idx, n_clusters=4, m=2, ksub=16, meta_cols=("label",)
    )
    queries = df.filter(F.col("vec_id").isin([0, 1, 6, 7]))
    batch = ivf_pq_search_batch(
        df, queries, k=3, n_clusters=4, nprobe=2, m=2, ksub=16,
        rerank=20, index_path=idx, meta_cols=("label",),
        query_id_col="vec_id", query_filter_cols=("label",),
    )
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.sim, 9))
        for r in batch.collect()
    }
    lbl_of = {r.vec_id: r.label for r in df.select("vec_id", "label").collect()}
    for (qid, _), (vid, _) in got.items():
        assert lbl_of[vid] == lbl_of[qid]
    for qid, lbl in [(0, "a"), (1, "b"), (6, "a"), (7, "b")]:
        single = ivf_pq_topk(
            df, df.filter(F.col("vec_id") == qid), k=3, n_clusters=4,
            nprobe=2, m=2, ksub=16, rerank=20, index_path=idx,
            meta_cols=("label",), filters={"label": lbl},
        ).collect()
        assert len(single) == 3
        for rank, r in enumerate(single, 1):
            assert got[(qid, rank)] == (r.vec_id, round(r.sim, 9))
