"""Fuzzy string matching: edit-distance pair generation without O(n²).

The naive "levenshtein every pair" join is a cartesian product — dead at
any scale.  The scalable shape is FastSS-style *deletion-neighborhood
blocking* (Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries"): two strings within edit distance k always share at
least one member of their radius-k deletion neighborhoods (delete the
≤k differing positions from each side), so an equi-join on generated
variants produces a complete candidate set, and one levenshtein per
*candidate* (not per pair) verifies.

Cost model at 100 TB: each string of length L emits O(L^k) variants —
a ×(L+1) row blowup at k=1 — and the join is a plain hash/sort-merge
equi-join on the variant string.  Work is Σ_variant bucket², bounded by
the true near-match density plus hash collisions on short variants;
there is no all-pairs term anywhere.  Verification is one JVM
``levenshtein`` per distinct candidate pair.

This is the string twin of the MinHash-LSH banding join in
``operators/dedup.py``: generate collision keys, equi-join, verify
exactly — never enumerate the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "edit_distance_pairs"]

# deleting position i (0-based) from a non-empty string; guarded so a
# zero-length string maps to no variants instead of sequence(0,-1)'s
# DESCENDING two-element surprise
_DEL_EXPR = (
    "CASE WHEN length({v}) = 0 THEN array() "
    "ELSE transform(sequence(0, length({v}) - 1), "
    "i -> concat(substring({v}, 1, i), substring({v}, i + 2))) END"
)


def deletion_variants(
    df: DataFrame,
    key_col: str,
    str_col: str,
    radius: int = 1,
) -> DataFrame:
    """Radius-k deletion neighborhood: one row per (key, variant),
    where the variants of a string are itself plus every string
    reachable by deleting up to ``radius`` characters.  Variants are
    distinct per key (a string with repeated characters reaches the
    same deletion several ways; emitting it once keeps the downstream
    join from double-counting candidates).

    Row blowup is Σ_{j≤k} C(L, j) ≈ L^k per string — linear ×(L+1) at
    the default radius 1.  Keep ``radius`` ≤ 2 for realistic lengths.
    """
    base = df.select(
        F.col(key_col).alias("__k"), F.col(str_col).alias("__s")
    )
    vs = base.select("__k", "__s", F.col("__s").alias("__v"))
    frontier = vs
    for _ in range(radius):
        frontier = frontier.select(
            "__k",
            "__s",
            F.explode(F.expr(_DEL_EXPR.format(v="__v"))).alias("__v"),
        )
        vs = vs.unionByName(frontier)
    return vs.dropDuplicates(["__k", "__v"])


def edit_distance_pairs(
    df: DataFrame,
    key_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All unordered pairs of rows whose ``str_col`` values are within
    Levenshtein distance ``max_dist``, as
    ``(key_a, key_b, s_a, s_b, dist)`` with ``key_a < key_b``.

    Completeness: strings at distance d ≤ k share a radius-k deletion
    variant (delete the d edited positions from each side), so the
    variant equi-join misses nothing.  Precision: sharing a variant
    only bounds the distance by 2k, so every candidate is verified with
    one exact ``levenshtein`` — false candidates cost one string
    comparison, never a quadratic blowup.

    Three bounded shuffles: per-key variant distinct, the variant
    equi-join, and the candidate-pair distinct (a pair sharing several
    variants is verified once).  No cartesian product exists in the
    plan at any ``max_dist`` (audited in ``tools/plan_audit.py``).

    Contract: ``key_col`` must be unique (the pair distinct assumes a
    key determines its string); rows with a NULL ``str_col`` silently
    produce no pairs (NULL never equi-joins) — filter or impute
    upstream if NULL-vs-NULL should count as a match.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    from .materialize import pin as _pin
    # the variant table feeds BOTH sides of the equi-join; without
    # materialization the explode + per-key distinct tower runs twice.
    # One reliable checkpoint writes it once and both sides read it
    # back (the _capped_pair_scores discipline).
    vs = deletion_variants(df, key_col, str_col, radius=max_dist).checkpoint(
        eager=True
    )
    a, b = vs.alias("a"), vs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__v") == F.col("b.__v"))
            & (F.col("a.__k") < F.col("b.__k")),
        )
        .select(
            F.col("a.__k").alias("key_a"),
            F.col("b.__k").alias("key_b"),
            F.col("a.__s").alias("s_a"),
            F.col("b.__s").alias("s_b"),
        )
        # one verification per candidate pair, however many variants
        # it collided on (keys determine strings, so this is lossless)
        .dropDuplicates(["key_a", "key_b"])
    )
    return cand.withColumn(
        "dist", F.levenshtein("s_a", "s_b")
    ).filter(F.col("dist") <= max_dist)
