"""Distributed BPE merge training (Sennrich et al. 2016) — corpus
once, vocabulary forever.

The scale insight that makes byte-pair-encoding trainable on a 100 TB
corpus: after ONE aggregation collapses the corpus to its distinct
words with frequencies, every merge iteration runs on the *vocabulary*
(10⁴–10⁷ rows regardless of corpus bytes).  The expensive corpus scan
happens exactly once (``word_frequencies``); the iterative part —
count adjacent symbol pairs weighted by word frequency, pick the
argmax, rewrite the symbol sequences — is vocabulary-sized per step.

Per step the driver transfers exactly ONE row (the winning pair); the
rewrite is a JVM ``aggregate`` fold over each word's symbol array
(left-to-right, non-rescanning — canonical BPE: after [a,a,a,a] merges
(a,a) the result is [aa,aa], because a freshly merged tail token no
longer equals the left symbol).  No Python executes per row anywhere.

Ties in the pair argmax break deterministically by (freq DESC, lhs,
rhs) so independently trained runs — and the DuckDB oracle's unrolled
SQL tower in q207 — agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "bpe_merge_steps"]


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The one corpus-sized pass: whitespace-tokenize, count distinct
    words.  Output columns ``(word, freq, syms)`` where ``syms`` is the
    initial character-level symbol sequence.  Partial aggregation
    applies (map-side combine on the word hash), so the shuffle carries
    per-partition distinct words, not the token stream."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("syms", F.split("word", ""))
    )


def _adjacent_pair_counts(words: DataFrame) -> DataFrame:
    """Σ_word freq over adjacent symbol pairs — vocabulary-sized input,
    explode factor = word length, partial-combined aggregation."""
    pairs = words.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) < 2 THEN "
                "array() "
                "ELSE arrays_zip(slice(syms, 1, size(syms) - 1), "
                "slice(syms, 2, size(syms) - 1)) END"
            )
        ).alias("p"),
    )
    return (
        pairs.select(
            F.col("p.0").alias("lhs"),
            F.col("p.1").alias("rhs"),
            "freq",
        )
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").cast("bigint").alias("pair_freq"))
    )


def _apply_merge(words: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Rewrite every symbol sequence with (lhs, rhs) → lhs||rhs merged
    left-to-right without rescanning: a fold whose accumulator is the
    rewritten prefix; merging replaces the tail token, and because the
    merged token ≠ lhs (rhs is non-empty) an immediately following rhs
    cannot re-merge — exactly single-pass BPE semantics."""
    fold = F.aggregate(
        F.slice(F.col("syms"), F.lit(2), F.size("syms") - F.lit(1)),
        F.slice(F.col("syms"), F.lit(1), F.lit(1)),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(lhs)) & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                F.array(F.lit(lhs + rhs)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return words.withColumn(
        "syms",
        F.when(F.size("syms") <= 1, F.col("syms")).otherwise(fold),
    )


def bpe_merge_steps(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int,
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_merges`` BPE merge iterations over a ``(word, freq,
    syms)`` vocabulary table.  Returns ``(merges, words)`` where
    ``merges`` has one row per step ``(step, lhs, rhs, pair_freq)`` and
    ``words`` carries the final symbol sequences (for tokenizer
    application downstream).

    Driver traffic is one row per step (the argmax pair) — k-sized by
    construction, like the centroid fetches in IVF training.  Each
    iteration's vocabulary is cached and the predecessor unpersisted so
    lineage stays one fold deep instead of n_merges folds."""
    merges: list[tuple[int, str, str, int]] = []
    words = words.cache()
    try:
        for step in range(1, n_merges + 1):
            top = (
                _adjacent_pair_counts(words)
                .orderBy(F.desc("pair_freq"), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if not top:  # vocabulary fully merged
                break
            lhs, rhs, pf = top[0].lhs, top[0].rhs, top[0].pair_freq
            merges.append((step, lhs, rhs, pf))
            nxt = _apply_merge(words, lhs, rhs).cache()
            nxt.count()  # materialize before dropping the predecessor
            words.unpersist()
            words = nxt
    except Exception:
        words.unpersist()
        raise
    merge_df = spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_freq bigint"
    )
    return merge_df, words
