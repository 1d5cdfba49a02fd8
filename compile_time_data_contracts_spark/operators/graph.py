"""Iterative graph analytics on DataFrames: fixed-iteration PageRank.

Connected components (the dedup workhorse) live in ``operators.dedup``;
this module holds the value-propagation family, where each round is one
join + one aggregation rather than a label min.

The reference has no graph surface (its relational work all flows
through the opaque transform hole, SparkCore.scala:404-415); this is
part of the EXT large-scale-pipeline surface: link-graph scoring for
crawl/corpus curation (rank-weighted sampling, spam demotion) is a
standard pretraining-data step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    n_nodes: int | None = None,
    checkpoint_every: int = 8,
    dangling: str = "drop",
) -> DataFrame:
    """Fixed-iteration power-method PageRank.

    ``nodes``: one column ``id``; ``edges``: columns ``src``, ``dst``
    (directed, deduplicated).  Returns (id, pr) after ``iters`` rounds
    from the uniform start 1/N.

    ``n_nodes``: pass the (known) node count to keep construction fully
    lazy; left ``None``, one eager ``nodes.count()`` job runs at build
    time (a single columnar scan — fine interactively, but callers that
    already know N, e.g. from a fixture or a prior agg, should pass it).

    ``dangling`` — explicit policy for nodes with no out-edges:
      * ``"drop"`` (default): their mass vanishes each round (total
        mass shrinks).  This is the honest semantics of the plain
        contribution join and keeps the operator a pure SQL join tower
        (the q165 graph guarantees outdeg >= 1, so for it drop ==
        conserve and the unrolled-SQL oracle stays exact).
      * ``"redistribute"``: each round the dangling mass m (a 1-row
        aggregate over pr ⟕̸ deg, never collected) is spread uniformly —
        pr' = base + d*(contrib + m/N) — the textbook teleport fix;
        total mass is conserved for ANY graph.

    Execution shape per round (all JVM-side, no Python):
      1. edges ⋈ pr on ``src``       — shuffle keyed by src,
      2. contributions grouped by ``dst`` — map-side partial sum, then
         shuffle keyed by dst,
      3. left join back to ``nodes`` for the (1-d)/N base term so
         zero-in-degree nodes keep a row,
      4. (redistribute only) one 1-row dangling-mass aggregate
         cross-joined in — broadcast, no data-sized movement.

    Lineage: when ``iters > checkpoint_every``, the degree-annotated
    edge list is persisted for the loop and ``pr`` is cut with a
    RELIABLE checkpoint every ``checkpoint_every`` rounds and once at
    loop exit (same durability argument as ``connected_components``:
    localCheckpoint blocks die with executors) — a 20+ iteration run
    neither re-derives the edge join tower per round nor grows an
    O(iters)-deep plan.  At or below ``checkpoint_every`` rounds the
    result is fully lazy and plan-auditable, unchanged from before.

    At 100 TB: out-degrees are precomputed ONCE and joined onto the
    edge list before the loop, so each round moves only (dst, pr/deg)
    pairs; pre-partitioning both ``edges`` and ``pr`` by the join key
    (or bucketing the edge table on src) makes round joins
    exchange-free on the edge side — the edge list, the dominant
    volume, is then never reshuffled across rounds.  Rounds are a
    fixed small constant (rank stabilizes in tens of rounds; curation
    uses the ORDER of scores, which converges much earlier).
    """
    if dangling not in ("drop", "redistribute"):
        raise ValueError(
            f"dangling must be 'drop' or 'redistribute', got {dangling!r}"
        )
    if n_nodes is None:
        n_nodes = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("__outdeg"))
    # edge list with degree attached once, reused every round
    ew = edges.join(deg, "src")
    do_checkpoint = iters > checkpoint_every
    # dangling nodes (no out-edges) — the set is static across rounds
    dang = nodes.join(
        deg.select(F.col("src").alias("id")), "id", "left_anti"
    )
    if do_checkpoint:
        from pyspark import StorageLevel

        from .dedup import _ensure_checkpoint_dir

        _ensure_checkpoint_dir(nodes.sparkSession.sparkContext)
        ew = ew.persist(StorageLevel.MEMORY_AND_DISK)
        if dangling == "redistribute":
            # each round's 1-row mass aggregate would otherwise rebuild
            # deg + the anti-join from the raw edges EVERY round the
            # checkpoints materialize — cache the static set once
            dang = dang.persist(StorageLevel.MEMORY_AND_DISK)
    pr = nodes.select("id", F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    try:
        for it in range(iters):
            contrib = ew.join(pr, ew["src"] == pr["id"]).select(
                ew["dst"].alias("id"),
                (F.col("pr") / F.col("__outdeg")).alias("__c"),
            )
            summed = contrib.groupBy("id").agg(F.sum("__c").alias("__s"))
            if dangling == "redistribute":
                # 1-row frame: this round's dangling mass / N
                m = dang.join(pr, "id").agg(
                    F.coalesce(
                        F.sum("pr") / F.lit(float(n_nodes)), F.lit(0.0)
                    ).alias("__mshare")
                )
                pr = (
                    nodes.join(summed, "id", "left")
                    .crossJoin(F.broadcast(m))
                    .select(
                        "id",
                        (
                            F.lit(base)
                            + F.lit(damping)
                            * (
                                F.coalesce("__s", F.lit(0.0))
                                + F.col("__mshare")
                            )
                        ).alias("pr"),
                    )
                )
            else:
                pr = nodes.join(summed, "id", "left").select(
                    "id",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce("__s", F.lit(0.0))
                    ).alias("pr"),
                )
            if do_checkpoint and (
                (it + 1) % checkpoint_every == 0 or it == iters - 1
            ):
                pr = pr.checkpoint(eager=True)
    finally:
        if do_checkpoint:
            ew.unpersist()
            if dangling == "redistribute":
                dang.unpersist()
    return pr


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count via the degree-ordered "compact-forward"
    join (Latapy 2008; the MapReduce formulation is Suri & Vassilvitskii
    2011's MR Node Iterator++): canonicalize the undirected edge set,
    then orient every edge from the lower to the higher endpoint under
    the total order (degree, id).  Each triangle has exactly one vertex
    whose two incident edges both point OUT (the minimum under the
    order), so counting = (oriented wedge a→b, a→c with b ≺ c) ⋈
    (oriented edge b→c) — two plain equi-joins, each triangle counted
    exactly once.

    The orientation is the scale play: out-degree under the
    (degree, id) order is O(√m) on ANY graph (arboricity bound), so the
    wedge join emits O(m^1.5) rows worst-case instead of the Σ deg²
    a naive neighbor join pays — a celebrity node with 10⁷ followers
    contributes almost no wedges because nearly all its edges point IN.
    Both joins are shuffle equi-joins; wedge/triangle totals
    partial-aggregate.

    Returns one row: (n_edges, n_wedges, n_triangles) over the
    de-duplicated self-loop-free undirected graph; n_wedges counts
    ordered open wedges (the join's left side), so
    n_triangles ≤ n_wedges.
    """
    u, v = F.col(src), F.col(dst)
    canon = (
        edges.select(
            F.least(u, v).alias("a"), F.greatest(u, v).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # total-order key: (degree, id) as a STRUCT compared
    # lexicographically — NOT packed into one BIGINT, because packing
    # (deg * 2^32 + id) aliases distinct nodes whenever ids reach 2^32
    # (64-bit hashed ids are the norm at scale), breaking the total
    # order and silently mis-counting triangles
    key = F.struct(F.col("deg"), F.col("node")).alias("ok")
    okeys = deg.select("node", key)
    withk = (
        canon.join(okeys.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("ok", "ka")
        .join(
            okeys.withColumnRenamed("node", "b").withColumnRenamed(
                "ok", "kb"
            ),
            "b",
        )
    )
    oriented = withk.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a"))
        .otherwise(F.col("b"))
        .alias("s"),
        F.when(F.col("ka") < F.col("kb"), F.col("b"))
        .otherwise(F.col("a"))
        .alias("t"),
        F.greatest("ka", "kb").alias("kt"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.s") == F.col("e2.s"))
        & (F.col("e1.kt") < F.col("e2.kt")),
    ).select(F.col("e1.t").alias("wb"), F.col("e2.t").alias("wc"))
    closing = oriented.select(
        F.col("s").alias("wb"), F.col("t").alias("wc")
    )
    tri = wedges.join(closing, ["wb", "wc"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    stats = canon.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )
    wc = wedges.agg(F.count(F.lit(1)).cast("bigint").alias("n_wedges"))
    return stats.crossJoin(wc).crossJoin(tri)
