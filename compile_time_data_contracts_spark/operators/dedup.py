"""Deduplication operators for LLM training-data pipelines.

Four tiers, all expressed with built-in JVM functions (no Python UDFs in
any hot path):

  * exact:   sha2 over normalized text, hash-groupBy — one shuffle.
  * n-gram Jaccard: word-shingle sets + (at small n) pair join with
    array_intersect; the scale path is MinHash-LSH below.
  * MinHash-LSH: shingles -> H minhash values (xxhash64 per seed) ->
    b bands -> explode (band_id, band_hash) -> self-join on band buckets ->
    exact-Jaccard verification of candidates.  The band join touches only
    colliding buckets: at 100 TB this is the difference between O(n²)
    pairs and O(candidates).
  * SimHash: per-token 64-bit hash, bitwise majority vote -> one bigint
    signature; near-dups cluster by hamming distance on signature
    prefixes.

All hashes are Spark's deterministic xxhash64/sha2, so results are stable
across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "exact_dedup",
    "shingles",
    "jaccard_pairs",
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_near_dup_pairs",
    "simhash",
]


def normalize_text(col: str = "text") -> F.Column:
    """Canonical text form for exact dedup: trim, lowercase, collapse
    whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup(df: DataFrame, col: str = "text") -> DataFrame:
    """Keep one row per normalized-text hash (deterministic winner: lowest
    doc_id via min aggregation would need a key; we use dropDuplicates on
    the hash after adding it)."""
    hashed = df.withColumn("__h", F.sha2(normalize_text(col), 256))
    return hashed.dropDuplicates(["__h"]).drop("__h")


def shingles(col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array<string>, entirely with
    built-in higher-order functions (split -> transform over an index
    sequence -> slice -> concat_ws)."""
    toks = F.split(F.col(col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws("|", F.slice(toks, i + 1, n)),
        )
    )


def _jaccard(a: F.Column, b: F.Column) -> F.Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard self-join — O(n²), the correctness
    baseline.  Use minhash_near_dup_pairs for scale."""
    sh = df.select(F.col(id_col), shingles(text_col, n).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            _jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(
    sh_col: F.Column, num_hashes: int = 32
) -> F.Column:
    """H-wide MinHash signature: for seed h, min over shingles of
    xxhash64(shingle, h).  array<bigint> of length H, all JVM-side."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda h: F.array_min(
            F.transform(sh_col, lambda s: F.xxhash64(s, h))
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes // bands`` rows, hash each band, explode to
    (band_id, band_hash, id), self-join per bucket.

    With r=2, b=16 the candidate probability at Jaccard s is
    1-(1-s²)^16 — ≥0.99 for s ≥ 0.5 — while ~s=0.02 noise pairs almost
    never collide, so the join stays tiny.
    Returns distinct candidate (doc_a, doc_b) pairs with shingle arrays
    attached for verification.
    """
    rows = num_hashes // bands
    sh = df.select(F.col(id_col), shingles(text_col, n).alias("sh"))
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = sig.select(
        id_col,
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice(F.col("sig"), b * rows + 1, rows),
                        lambda x: x.cast("string"),
                    ))
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """MinHash-LSH candidates + exact-Jaccard verification: the scale path
    for near-dup detection.  Output schema matches jaccard_pairs."""
    cand = lsh_candidate_pairs(df, id_col, text_col, n, num_hashes, bands)
    return (
        cand.withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(col: str = "text", bits: int = 64) -> F.Column:
    """SimHash signature: per-token xxhash64, majority vote per bit,
    packed into one bigint.

    bit i of the signature = 1 iff sum over tokens of sign(bit i of
    xxhash64(token)) is positive.  Written as a SQL expression because the
    shift amount is a lambda variable (the Python shiftright wrapper only
    accepts int literals); the token hashes are bound once via a
    single-element aggregate so they are not recomputed per bit.
    """
    hashes = f"transform(split({col}, ' '), s -> xxhash64(s))"
    bit_vote = (
        "aggregate(hs, 0, (v, h) -> v + IF((shiftright(h, i) & 1) = 1, 1, -1))"
    )
    return F.expr(
        f"aggregate(transform(array(0), z -> {hashes}), cast(0 as long), "
        f"(acc, hs) -> aggregate(sequence(0, {bits - 1}), acc, "
        f"(a2, i) -> a2 + IF({bit_vote} > 0, shiftleft(cast(1 as long), i), "
        f"cast(0 as long))))"
    )
