"""Scale probe: label-FILTERED IVF-PQ search (the q378 path) at 10^6
vectors — the compressed-domain twin of scale_probe_filtered_ivf, with
the same planted in-label/decoy families that distinguish in-candidate
filtering from post-filtering.

Reuses the scale_probe_filtered_ivf corpus AND its (cluster, label)
index directory: `ivf_pq_topk`'s layered staleness sees the existing
IVF layer (fingerprint + layout match) and adds only the PQ code/book
tables under it — the build-once convention across probes.

Contracts (all asserted, results recorded in SCALEBENCH.json):

  1. `filtered_recall` >= 0.9 and `exact_match`: the filtered
     composite recovers the 10 in-label plants (k=11: query + 10) and
     equals the exact label-filtered top-k.
  2. `post_filter_would_return` <= 2: the decoys (closer, wrong label)
     dominate the unfiltered top-k — a post-filter design would starve.
  3. Plan: the CODE scan's PartitionFilters carry BOTH axes (cluster
     INSET + label equality) — no cross-label codes are ever decoded —
     and so does the re-rank hydration scan.
  4. `code_dirs_probed` MEASURED: cluster ids parsed from the executed
     plan, surviving (cluster=c, label=0) CODE directories counted on
     disk; must be in (0, nprobe].

Usage: python tools/scale_probe_filtered_ivfpq.py [n] [dim]
Writes `filtered_ivfpq_n{total}` into SCALEBENCH.json.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe_filtered_ivf import (  # noqa: E402
    N_CLUSTERS,
    N_PLANTS,
    generate,
)
from scalebench import merge_entry  # noqa: E402

NPROBE = 16
M = 8
KSUB = 16
RERANK = 200


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.similarity import (
        ivf_pq_topk,
        topk_cosine,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ctdc-scale-probe-filtered-ivfpq")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.maxMetadataStringLength", "100000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    total = n + 2 * N_PLANTS
    results: dict = {
        "n": total,
        "dim": dim,
        "n_clusters": N_CLUSTERS,
        "nprobe": NPROBE,
        "m": M,
        "ksub": KSUB,
        "rerank": RERANK,
    }
    path = f"/tmp/ctdc-scale-probe-fivf-{n}x{dim}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.perf_counter()
        generate(spark, path, n, dim)
        results["generate_sec"] = round(time.perf_counter() - t0, 2)
    emb = spark.read.parquet(path)

    idx = f"/tmp/ctdc-scale-probe-fivf-idx-{n}x{dim}"
    query = emb.filter(F.col("vec_id") == n)  # in-label plant near v0

    # first call pays the PQ train/encode (the IVF layer is reused if
    # the filtered-IVF probe already built it); time it separately from
    # the steady-state search
    t0 = time.perf_counter()
    approx_df = ivf_pq_topk(
        emb, query, k=N_PLANTS + 1, n_clusters=N_CLUSTERS,
        nprobe=NPROBE, m=M, ksub=KSUB, rerank=RERANK, index_path=idx,
        meta_cols=("label",), filters={"label": 0},
    )
    approx_ids = {r.vec_id for r in approx_df.collect()}
    results["first_call_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    approx_df = ivf_pq_topk(
        emb, query, k=N_PLANTS + 1, n_clusters=N_CLUSTERS,
        nprobe=NPROBE, m=M, ksub=KSUB, rerank=RERANK, index_path=idx,
        meta_cols=("label",), filters={"label": 0},
    )
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    approx_ids = {r.vec_id for r in approx_df.collect()}
    results["filtered_search_sec"] = round(time.perf_counter() - t0, 2)

    planted = set(range(n, n + N_PLANTS))
    results["filtered_recall"] = round(
        len(approx_ids & planted) / N_PLANTS, 2
    )

    pfs = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    results["plan_scans_pruning_cluster"] = sum(
        1 for p in pfs if "cluster" in p
    )
    results["plan_scans_pruning_label"] = sum(
        1 for p in pfs if "label" in p
    )
    probed_ids = None
    for p in pfs:
        probed_ids = probed_ids or re.search(
            r"cluster#\d+ (?:INSET ([0-9, ]+)|IN \(([0-9, ]*)\))", p
        )
    probed_clusters = [
        int(x)
        for x in ((probed_ids.group(1) or probed_ids.group(2)).split(",")
                  if probed_ids else [])
        if x.strip()
    ]
    results["code_dirs_probed"] = sum(
        1
        for c in probed_clusters
        if os.path.isdir(f"{idx}/pq/codes/cluster={c}/label=0")
    )
    code_dirs = 0
    for cdir in os.listdir(f"{idx}/pq/codes"):
        if cdir.startswith("cluster="):
            code_dirs += sum(
                1
                for ldir in os.listdir(f"{idx}/pq/codes/{cdir}")
                if ldir.startswith("label=")
            )
    results["code_dirs_total"] = code_dirs

    # exact filtered ground truth + post-filter starvation
    t0 = time.perf_counter()
    exact_filtered = {
        r.vec_id
        for r in topk_cosine(
            emb.filter(F.col("label") == 0), query, k=N_PLANTS + 1
        ).collect()
    }
    results["exact_filtered_sec"] = round(time.perf_counter() - t0, 2)
    results["exact_match"] = approx_ids == exact_filtered

    unfiltered = topk_cosine(emb, query, k=N_PLANTS + 1)
    lbl = {
        r.vec_id: r.label
        for r in emb.filter(F.col("vec_id") >= n)
        .select("vec_id", "label")
        .collect()
    }
    post = [
        r.vec_id
        for r in unfiltered.collect()
        if lbl.get(r.vec_id, r.vec_id % 10) == 0
    ]
    results["post_filter_would_return"] = len(post)

    ok = (
        results["filtered_recall"] >= 0.9
        and results["exact_match"]
        and results["post_filter_would_return"] <= 2
        and results["plan_scans_pruning_cluster"] >= 2
        and results["plan_scans_pruning_label"] >= 2
        and 0 < results["code_dirs_probed"] <= NPROBE
    )
    results["ok"] = bool(ok)
    merge_entry(f"filtered_ivfpq_n{total}", results)
    print(results)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
