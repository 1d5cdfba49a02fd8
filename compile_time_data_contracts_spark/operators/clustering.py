"""Distributed k-means (Lloyd iterations) on embedding columns.

The IVF family (``similarity.ivf_build`` / ``ivf_pq_topk``) trains its
centroids on a driver-side SAMPLE because k centroids are k-sized; this
module is the other half of the story: running the Lloyd update over
ALL vectors, distributed.  Each iteration is

  1. assignment — argmin over k centroids of the squared L2 distance,
     entirely JVM-side codegen (``zip_with`` difference, ``aggregate``
     fold, ``array_min`` over (dist, cid) structs — ties break to the
     smallest cid, deterministically), and
  2. update — ``posexplode`` to (cid, dim, value) and a
     partial-combined ``groupBy(cid, dim)`` sum/count: the shuffle
     carries one partial sum per (cid, dim) per partition, never
     vectors, so the step costs one scan regardless of corpus size.

Only k·d aggregated cells ever reach the driver per round (the same
k-sized driver work as IVF training — never the vectors themselves).

Engine-exact arithmetic: vector components are floored to integer
MICROS once up front, distances are integer sums, and updated
centroids are ``floor(sum / n)`` back in micros — every round is exact
integer arithmetic on both Spark and an ANSI-SQL oracle, so a fixed
iteration count yields bit-identical centroids everywhere (the same
quantization contract as the q216 distributed-centroid gate).  The
1e-6 grid is inherent to cross-engine comparison, not to the operator;
production callers can swap micros for raw doubles and accept
ulp-order nondeterminism from reduction order.

At 100 TB: the micros projection is computed once and persisted; each
round re-reads that cached projection (columnar, pruned to (id, m)),
the assignment is a map-only stage (centroids are a k×d literal — no
join, no shuffle), and the update is one partial-combined aggregation.
Rounds are a small fixed constant.  The reference has no clustering
surface (all relational work flows through the opaque transform hole,
SparkCore.scala:404-415); this is part of the EXT
large-scale-pipeline surface (corpus clustering for SemDeDup-style
pruning and topic-balanced mixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_lloyd", "micros_vector", "nearest_centroid"]

_MICROS = 1_000_000


def micros_vector(col: Column) -> Column:
    """array<float> -> array<bigint> of floored micros (exact on every
    engine: floor truncates toward -inf for negatives too, unlike the
    round-half-away double->int CAST DuckDB applies)."""
    return F.transform(
        col,
        lambda x: F.floor(x.cast("double") * _MICROS).cast("bigint"),
    )


def nearest_centroid(micros_col: Column, centroids: list[list[int]]) -> Column:
    """Argmin cluster id over integer-micros centroids, ties to the
    smallest cid.  One codegen expression: array_min over
    struct(dist, cid) orders by dist first, then cid."""
    candidates = []
    for cid, cvec in enumerate(centroids):
        carr = F.array(*[F.lit(int(v)).cast("bigint") for v in cvec])
        sq = F.zip_with(micros_col, carr, lambda a, b: (a - b) * (a - b))
        dist = F.aggregate(
            sq, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        )
        candidates.append(
            F.struct(
                dist.alias("dist"), F.lit(cid).cast("int").alias("cid")
            )
        )
    return F.array_min(F.array(*candidates))["cid"]


def kmeans_lloyd(
    vecs: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``iters`` Lloyd rounds from the deterministic seed "the k
    vectors with the smallest ids"; returns the LAZY final-round update
    as a long-form DataFrame (cid, dim, c_micros, n) — k·d rows, the
    post-update centroid in integer micros plus the size of the
    assignment that produced it.

    Rounds 1..iters-1 materialize k·d aggregated cells on the driver
    (the k-sized loop state); the final round — the expensive full
    assignment + aggregation pass — is returned unexecuted so callers
    compose it like any other plan.  Empty clusters keep their previous
    centroid (n = 0) via a left join onto the full (cid, dim) grid.
    """
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1, got k={k} iters={iters}")
    spark = vecs.sparkSession
    vm = vecs.select(
        F.col(id_col).alias("__id"),
        micros_vector(F.col(vec_col)).alias("m"),
    )
    if iters > 1:
        # re-read by every round: cache the pruned (id, micros) projection
        from pyspark import StorageLevel

        vm = vm.persist(StorageLevel.MEMORY_AND_DISK)

    seed_rows = (
        vm.orderBy("__id").limit(k).select("m").collect()
    )  # k rows — the k-sized seed, never the corpus
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} vectors to seed k={k} clusters")
    centroids = [list(r["m"]) for r in seed_rows]
    d = len(centroids[0])

    def _update(assigned: DataFrame) -> DataFrame:
        agg = (
            assigned.select("cid", F.posexplode("m").alias("dim", "v"))
            .groupBy("cid", "dim")
            .agg(
                F.sum("v").alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
        )
        # full (cid, dim) grid carrying the previous centroid so empty
        # clusters survive with n = 0 — a k·d literal frame
        grid = spark.createDataFrame(
            [
                (cid, dim, int(centroids[cid][dim]))
                for cid in range(k)
                for dim in range(d)
            ],
            "cid int, dim int, __prev bigint",
        )
        return grid.join(agg, ["cid", "dim"], "left").select(
            "cid",
            "dim",
            F.coalesce(
                F.floor(
                    F.col("__s").cast("double") / F.col("__n")
                ).cast("bigint"),
                F.col("__prev"),
            ).alias("c_micros"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n"),
        )

    for _ in range(iters - 1):
        assigned = vm.withColumn(
            "cid", nearest_centroid(F.col("m"), centroids)
        )
        rows = _update(assigned).collect()  # k·d cells only
        nxt = [[0] * d for _ in range(k)]
        for r in rows:
            nxt[r["cid"]][r["dim"]] = r["c_micros"]
        centroids = nxt

    final_assigned = vm.withColumn(
        "cid", nearest_centroid(F.col("m"), centroids)
    )
    return _update(final_assigned)
