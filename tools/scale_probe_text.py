"""Text-dedup scale probe: MinHash-LSH near-dup detection at >= 100k
documents (the sibling of tools/scale_probe.py for the text path).

The documents gate tables top out at ~5k rows, so the banded MinHash
pipeline (shingle explode -> 32-hash signatures -> 16-band bucket join
-> exact-Jaccard verify) never runs at representative corpus size in
any gate.  This probe:

  1. generates a seeded 100k-document corpus, fully distributed: each
     document is a deterministic word sequence drawn from a vocabulary,
     with 1,000 planted near-duplicate pairs (partner = source with 3
     of 60 tokens substituted; each substitution kills up to 3 trigram
     shingles, so shingle-Jaccard stays >= ~0.7, above the 0.5
     threshold — substituting 15% of tokens would amplify to J ~ 0.36
     and the pairs would CORRECTLY not be found) and everything else
     far below it,
  2. runs minhash_near_dup_pairs at threshold 0.5, measuring recall
     against the planted pairs and asserting precision via the exact
     verify (every emitted pair has true Jaccard >= 0.5 by
     construction),
  3. clusters the found pairs with connected_components and checks the
     planted pairs collapse to one representative each,
  4. merges a `text_n{total}` entry into SCALEBENCH.json (keyed by
     scale, so 100k and 1M runs coexist).

Usage: python tools/scale_probe_text.py [n_docs]   (default 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DEFAULT = 100_000
PLANTED = 1_000
SEED = 20260813
DOC_TOKENS = 60
VOCAB = 50_000


def generate(spark, path: str, n: int) -> None:
    import numpy as np
    import pandas as pd

    base = spark.range(0, n + PLANTED).toDF("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            texts = []
            for i in ids:
                src = i if i < n else i - n
                rng = np.random.default_rng(SEED + int(src))
                words = rng.integers(0, VOCAB, size=DOC_TOKENS)
                if i >= n:  # planted near-dup: substitute 3 tokens
                    nrng = np.random.default_rng(SEED * 2 + int(src))
                    pos = nrng.choice(DOC_TOKENS, size=3, replace=False)
                    words = words.copy()
                    words[pos] = nrng.integers(0, VOCAB, size=3)
                texts.append(" ".join(f"w{w}" for w in words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    base.mapInPandas(gen, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.dedup import (
        connected_components,
        minhash_near_dup_pairs,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ctdc-scale-probe-text")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {"n_docs": n + PLANTED, "threshold": 0.5}
    path = f"/tmp/ctdc-scale-probe-text-{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.perf_counter()
        generate(spark, path, n)
        results["generate_sec"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(path)

    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(docs, threshold=0.5).persist()
    n_pairs = pairs.count()
    results["minhash_sec"] = round(time.perf_counter() - t0, 2)
    results["pairs_found"] = n_pairs

    planted_hit = pairs.filter(
        (F.col("doc_b") - F.col("doc_a") == n) & (F.col("doc_a") < PLANTED)
    ).count()
    results["planted_recall"] = round(planted_hit / PLANTED, 4)
    # precision is structural (exact-Jaccard verify >= threshold), but
    # assert nothing OUTSIDE the planted construction was emitted — the
    # corpus is built so random pairs sit far below 0.5
    results["unplanted_pairs"] = n_pairs - planted_hit

    t0 = time.perf_counter()
    clusters = connected_components(pairs)
    n_clusters = clusters.filter(
        F.col("doc_id") == F.col("cluster_id")
    ).count()
    results["cc_sec"] = round(time.perf_counter() - t0, 2)
    results["clusters"] = n_clusters

    # leakage-safe split over the full corpus: every near-dup cluster
    # must land in exactly ONE split (q166's operator at probe scale),
    # and the naive doc-id split must visibly scatter planted clusters
    # (partner ids differ from sources by n, so their hashes are
    # independent)
    from compile_time_data_contracts_spark.operators.sampling import (
        split_by_cluster,
    )

    t0 = time.perf_counter()
    allc = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    lab = split_by_cluster(allc)
    agg = lab.groupBy("cluster_id").agg(
        F.count("*").alias("sz"),
        F.countDistinct("split").alias("n_safe"),
        F.countDistinct("naive_split").alias("n_naive"),
    )
    straddling_safe = agg.filter("n_safe > 1").count()
    leaked_naive = agg.filter("sz > 1 AND n_naive > 1").count()
    results["split_sec"] = round(time.perf_counter() - t0, 2)
    results["split_straddling_clusters"] = straddling_safe
    results["split_leaked_clusters_naive"] = leaked_naive

    ok = (
        results["planted_recall"] >= 0.95
        and results["unplanted_pairs"] == 0
        and n_clusters == planted_hit  # every pair collapses to one rep
        and straddling_safe == 0  # cluster-keyed split never leaks
        and leaked_naive > 0  # naive split demonstrably would
    )
    results["ok"] = ok

    # merge into SCALEBENCH.json next to the vector probe, keyed by scale
    from scalebench import merge_entry

    merge_entry(f"text_n{n + PLANTED}", results)
    print(json.dumps({"metric": "scale_probe_text", "results": results}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
