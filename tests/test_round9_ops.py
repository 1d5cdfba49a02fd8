"""Round-9 tests: batch IVF search (`ivf_search_batch`) — the
multi-query index-backed retrieval path.  Contracts pinned here:

  * per-query parity with |queries| independent `ivf_search` calls,
  * probe-mask confinement: the UNION scan never leaks another query's
    cells into a query's candidate set,
  * metadata filters prune candidates before scoring (and unknown
    filter columns raise the rebuild-with-meta_cols error),
  * the whole batch is served by ONE partition-pruned parquet scan.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.similarity import (
    ivf_build,
    ivf_build_or_reuse,
    ivf_search,
    ivf_search_batch,
)


def _vec(direction, i, dim=4):
    # orthogonal groups with per-vector jitter: every cosine is distinct
    # so exact/IVF heaps agree without tie-break ambiguity
    base = [0.0] * dim
    base[direction] = 1.0
    base[dim - 1] = 0.001 * (i + 1)
    return base


@pytest.fixture(scope="module")
def batch_index(spark, tmp_path_factory):
    """A (vectors, index_path) pair: two orthogonal 20-vector groups
    with labels, indexed at n_clusters=2 so each group lands in its own
    cell (k-means on orthogonal clouds separates them)."""
    rows = [(i, _vec(0, i), "a") for i in range(20)] + [
        (100 + i, _vec(1, i), "b") for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    idx = str(tmp_path_factory.mktemp("bivf") / "idx")
    ivf_build(df, idx, n_clusters=2, meta_cols=("label",))
    return df, idx


def test_batch_matches_per_query_search(spark, batch_index):
    df, idx = batch_index
    qids = [0, 3, 100, 107]
    queries = df.filter(F.col("vec_id").isin(qids))
    batch = ivf_search_batch(
        spark, idx, queries, k=5, nprobe=2, query_id_col="vec_id"
    )
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.sim, 9))
        for r in batch.collect()
    }
    for qid in qids:
        single = ivf_search(
            spark, idx, df.filter(F.col("vec_id") == qid), k=5, nprobe=2
        ).collect()
        assert len(single) == 5
        for rank, r in enumerate(single, 1):
            assert got[(qid, rank)] == (r.vec_id, round(r.sim, 9))


def test_union_scan_never_leaks_other_queries_cells(spark, batch_index):
    """nprobe=1 with one query per group: the union scan reads BOTH
    cells, but each query's candidates must come only from its OWN
    nearest cell — group-a ids for the e0 query, group-b ids for e1."""
    df, idx = batch_index
    queries = df.filter(F.col("vec_id").isin([0, 100]))
    out = ivf_search_batch(
        spark, idx, queries, k=10, nprobe=1, query_id_col="vec_id"
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    assert by_q[0] and all(v < 100 for v in by_q[0])
    assert by_q[100] and all(v >= 100 for v in by_q[100])


def test_batch_filters_prune_and_unknown_column_raises(
    spark, batch_index
):
    df, idx = batch_index
    queries = df.filter(F.col("vec_id").isin([0, 3]))
    out = ivf_search_batch(
        spark,
        idx,
        queries,
        k=50,
        nprobe=2,
        query_id_col="vec_id",
        filters={"label": "b"},
    ).collect()
    # every cell probed, but only label-b rows may score
    assert out and all(r.vec_id >= 100 for r in out)
    with pytest.raises(ValueError, match="meta_cols"):
        ivf_search_batch(
            spark, idx, queries, filters={"tenant": "x"}
        ).collect()


def test_batch_is_one_partition_pruned_scan(spark, batch_index):
    df, idx = batch_index
    queries = df.filter(F.col("vec_id").isin([0, 100]))
    plan = (
        ivf_search_batch(
            spark, idx, queries, k=3, nprobe=1, query_id_col="vec_id"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "PartitionFilters" in plan
    assert plan.count("MapInArrow") == 1


def test_batch_empty_queries_raises(spark, batch_index):
    df, idx = batch_index
    with pytest.raises(ValueError, match="empty"):
        ivf_search_batch(spark, idx, df.filter(F.lit(False)))


def test_build_or_reuse_shares_index_across_callers(
    spark, batch_index, tmp_path
):
    """ivf_build_or_reuse is the factored build-once core: a second
    call with matching content + layout must NOT rewrite the index."""
    import os

    df, _ = batch_index
    idx = str(tmp_path / "reuse")
    p1 = ivf_build_or_reuse(df, idx, n_clusters=2, meta_cols=("label",))
    state = {}
    for dirpath, _, files in os.walk(idx):
        for f in files:
            fp = os.path.join(dirpath, f)
            st = os.stat(fp)
            state[fp] = (st.st_size, st.st_mtime_ns)
    p2 = ivf_build_or_reuse(df, idx, n_clusters=2, meta_cols=("label",))
    assert p1 == p2 == idx
    for dirpath, _, files in os.walk(idx):
        for f in files:
            fp = os.path.join(dirpath, f)
            st = os.stat(fp)
            assert state[fp] == (st.st_size, st.st_mtime_ns), fp
    # layout change → rebuild (meta_cols mismatch is staleness)
    ivf_build_or_reuse(df, idx, n_clusters=2, meta_cols=())
    meta = spark.read.parquet(f"{idx}/meta").first()
    assert meta["meta_cols"] == ""


def test_filtered_ivfpq_layout_staleness_and_filters(spark, tmp_path):
    """meta_cols carried through the PQ composite: codes partition by
    (cluster, label), filtered search returns only matching-label rows,
    a meta_cols change rebuilds, and unknown filter columns raise."""
    import os

    from compile_time_data_contracts_spark.operators.similarity import (
        ivf_pq_topk,
    )

    rows = [(i, _vec(0, i, 16), "a") for i in range(30)] + [
        (100 + i, _vec(1, i, 16), "b") for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    idx = str(tmp_path / "fpq")
    query = df.filter(F.col("vec_id") == 0)
    out = ivf_pq_topk(
        df, query, k=5, n_clusters=2, nprobe=2, m=4, ksub=8,
        rerank=20, index_path=idx, meta_cols=("label",),
        filters={"label": "b"},
    ).collect()
    assert out and all(r.vec_id >= 100 for r in out)
    # codes directory layout has BOTH axes
    clusters = [
        d for d in os.listdir(f"{idx}/pq/codes") if d.startswith("cluster=")
    ]
    assert clusters
    labels = [
        d
        for d in os.listdir(f"{idx}/pq/codes/{clusters[0]}")
        if d.startswith("label=")
    ]
    assert labels, "codes not partitioned by the meta column"
    # pq meta records the layout
    pq_meta = spark.read.parquet(f"{idx}/pq/meta").first()
    assert pq_meta["meta_cols"] == "label"
    # unknown filter column raises the rebuild message
    with pytest.raises(ValueError, match="meta_cols"):
        ivf_pq_topk(
            df, query, k=5, n_clusters=2, nprobe=2, m=4, ksub=8,
            rerank=20, index_path=idx, meta_cols=("label",),
            filters={"tenant": "x"},
        ).collect()
    # meta_cols change is staleness: a layout-less request rebuilds
    ivf_pq_topk(
        df, query, k=5, n_clusters=2, nprobe=2, m=4, ksub=8,
        rerank=20, index_path=idx,
    ).collect()
    assert spark.read.parquet(f"{idx}/pq/meta").first()["meta_cols"] == ""


def test_parallel_feed_batches_never_straddle_triggers(spark, tmp_path):
    """The review-found hazard: a small batch followed by a bigger one
    under maxFilesPerTrigger=max would straddle a trigger boundary.
    Padding makes every batch exactly N files, so each micro-batch
    contains exactly one feed batch's rows — asserted via a per-batch
    marker column through a real file stream."""
    from compile_time_data_contracts_spark.streaming.windows import (
        write_ordered_feed_parallel,
    )

    base = str(tmp_path / "feed")
    b0 = spark.createDataFrame([(0, 0)], "v long, marker int")
    b1 = spark.range(0, 100).selectExpr(
        "id as v", "CAST(1 AS INT) as marker"
    ).repartition(4)
    b2 = spark.createDataFrame([(999, 2)], "v long, marker int")
    n = write_ordered_feed_parallel([b0, b1, b2], base)
    assert n >= 4
    import os

    files = [f for f in os.listdir(base) if f.endswith(".parquet")]
    assert len(files) == 3 * n  # every batch padded to N
    # full content intact
    assert spark.read.parquet(base).count() == 102

    seen = []

    def check(batch_df, batch_id):
        markers = sorted(
            r.marker
            for r in batch_df.select("marker").distinct().collect()
        )
        if markers:
            seen.append(markers)

    q = (
        spark.readStream.schema("v long, marker int")
        .option("maxFilesPerTrigger", str(n))
        .parquet(base)
        .writeStream.foreachBatch(check)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one feed batch per micro-batch, in order — never two markers mixed
    assert seen == [[0], [1], [2]]


def test_multi_topk_bounded_on_duplicate_heavy_corpus(spark):
    """All-identical vectors: every corpus row ties at the k-th value.
    The scorer must still emit a bounded candidate set and the final
    ranks must pick the smallest ids (global order sim desc, id asc)."""
    from compile_time_data_contracts_spark.operators.similarity import (
        topk_cosine_multi,
    )

    rows = [(i, [1.0, 0.0]) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 2)
    out = topk_cosine_multi(df, queries, k=3, query_id_col="vec_id")
    got = {
        (r.query_id, r.rank): r.vec_id for r in out.collect()
    }
    # exact: smallest ids win the tie for every query
    for qid in (0, 1):
        assert [got[(qid, r)] for r in (1, 2, 3)] == [0, 1, 2]


def test_batch_ivfpq_matches_per_query_composite(spark, tmp_path):
    """ivf_pq_search_batch must return, per query, exactly what the
    single-query ivf_pq_topk returns from the same persisted index —
    with nprobe < n_clusters, so the probe MASK is selective and the
    attribution path (each query confined to its own cells even though
    the union scan reads both) is actually exercised, not vacuously
    all-True."""
    from compile_time_data_contracts_spark.operators.similarity import (
        ivf_pq_search_batch,
        ivf_pq_topk,
    )

    rows = [(i, _vec(0, i, 16), "a") for i in range(30)] + [
        (100 + i, _vec(1, i, 16), "b") for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    idx = str(tmp_path / "bpq")
    qids = [0, 3, 100, 107]
    queries = df.filter(F.col("vec_id").isin(qids))
    batch = ivf_pq_search_batch(
        df, queries, k=5, n_clusters=2, nprobe=1, m=4, ksub=8,
        rerank=20, index_path=idx, query_id_col="vec_id",
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append(
            (r.rank, r.vec_id, round(r.sim, 9))
        )
    # probe-mask confinement: nprobe=1 over 2 orthogonal groups means
    # each query's results come ONLY from its own group's cell, even
    # though the union scan covers both cells
    for r in sum(([ (q, v) for _, v, _ in got[q]] for q in qids), []):
        qid, vid = r
        assert (vid < 100) == (qid < 100), (qid, vid)
    for qid in qids:
        single = ivf_pq_topk(
            df, df.filter(F.col("vec_id") == qid), k=5, n_clusters=2,
            nprobe=1, m=4, ksub=8, rerank=20, index_path=idx,
        ).collect()
        want = [
            (i + 1, r.vec_id, round(r.sim, 9))
            for i, r in enumerate(single)
        ]
        assert sorted(got[qid]) == want, qid
    # filtered batch over the compressed domain: only label-b survives
    fidx = str(tmp_path / "bpqf")
    out = ivf_pq_search_batch(
        df, queries, k=20, n_clusters=2, nprobe=2, m=4, ksub=8,
        rerank=40, index_path=fidx, meta_cols=("label",),
        filters={"label": "b"}, query_id_col="vec_id",
    ).collect()
    assert out and all(r.vec_id >= 100 for r in out)


def test_batch_search_sees_appended_vectors(spark, batch_index, tmp_path):
    """Build-once + append + batch search: ivf_search_batch over an
    index grown by ivf_append must return the appended vectors (the
    batch path reads the same partition layout the append wrote)."""
    from compile_time_data_contracts_spark.operators.similarity import (
        ivf_append,
    )

    df, _ = batch_index
    idx = str(tmp_path / "appb")
    ivf_build(df, idx, n_clusters=2, meta_cols=("label",))
    newbie = spark.createDataFrame(
        [(500, _vec(0, 999), "a")],
        "vec_id long, embedding array<float>, label string",
    )
    ivf_append(spark, idx, newbie)
    queries = df.filter(F.col("vec_id") == 0)
    out = ivf_search_batch(
        spark, idx, queries, k=50, nprobe=2, query_id_col="vec_id"
    ).collect()
    assert 500 in {r.vec_id for r in out}
