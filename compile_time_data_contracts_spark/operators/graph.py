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
) -> DataFrame:
    """Fixed-iteration power-method PageRank.

    ``nodes``: one column ``id``; ``edges``: columns ``src``, ``dst``
    (directed, deduplicated).  Returns (id, pr) after ``iters`` rounds
    from the uniform start 1/N.  Nodes with no out-edges contribute no
    mass (the caller decides dangling policy — the q165 edge derivation
    guarantees outdeg >= 1 so total mass is conserved and the oracle
    stays a pure unrolled SQL join tower).

    Execution shape per round (all JVM-side, no Python):
      1. edges ⋈ pr on ``src``       — shuffle keyed by src,
      2. contributions grouped by ``dst`` — map-side partial sum, then
         shuffle keyed by dst,
      3. left join back to ``nodes`` for the (1-d)/N base term so
         zero-in-degree nodes keep a row.

    At 100 TB: out-degrees are precomputed ONCE and joined onto the
    edge list before the loop, so each round moves only (dst, pr/deg)
    pairs; pre-partitioning both ``edges`` and ``pr`` by the join key
    (or bucketing the edge table on src) makes round joins
    exchange-free on the edge side — the edge list, the dominant
    volume, is then never reshuffled across rounds.  Rounds are a
    fixed small constant (rank stabilizes in tens of rounds; curation
    uses the ORDER of scores, which converges much earlier), and each
    round's lineage is cut by the loop variable being a fresh plan —
    for very large iteration counts checkpoint every ~10 rounds as the
    CC operator does.
    """
    n_nodes = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("__outdeg"))
    # edge list with degree attached once, reused every round
    ew = edges.join(deg, "src")
    pr = nodes.select("id", F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = ew.join(pr, ew["src"] == pr["id"]).select(
            ew["dst"].alias("id"),
            (F.col("pr") / F.col("__outdeg")).alias("__c"),
        )
        pr = (
            nodes.join(
                contrib.groupBy("id").agg(F.sum("__c").alias("__s")),
                "id",
                "left",
            ).select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("__s", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr
