"""Per-call materialization helpers: reliable checkpoints and
observe()-fused convergence signatures.

One shared home for the ensure-dir + ``checkpoint(eager=True)`` pattern
that ~20 call sites used to inline (the round-10 self-review's deferred
refactor), plus the round-11 job-count optimization: iterative operators
that need a convergence signature of the frame they just materialized
used to pay a SEPARATE aggregation job per round (checkpoint action,
then a count/xor-hash action re-reading the checkpoint).
:func:`pin_with_signature` collects the (count, order-independent
xor-hash) signature from the SAME job via ``DataFrame.observe`` —
metrics accumulate on the driver while the checkpoint job computes each
partition, so every loop round is ONE action instead of two
(spark_optimization_guide §1.5/§5: the signature is metadata of work
already being done, not a second pass).

Why reliable checkpoints and never ``localCheckpoint``: local
checkpoint blocks live on executors and are not recomputable, so on a
real cluster one lost executor kills an iterative job — the repo's
documented durability stance since round 2.  Why checkpoint and not
persist for lineage control: persist materializes DATA but keeps the
LOGICAL plan, so Catalyst re-analysis grows superlinearly with loop
depth (measured in round 10's checkpoint-cadence A/B); checkpoint is
the only cut that also resets the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = [
    "ensure_checkpoint_dir",
    "pin",
    "pin_if_input_large",
    "pin_with_signature",
    "scan_input_bytes",
]


def ensure_checkpoint_dir(sc) -> None:
    """Auto-configure a checkpoint dir when unset, but make the scope of
    the fallback explicit: a driver-local temp dir gives RELIABLE
    checkpoint semantics only on ``local[*]`` masters.  On a real
    cluster executors cannot read the driver's /tmp, so the advertised
    executor-loss recoverability silently would not hold — warn so the
    operator points ``sc.setCheckpointDir`` at shared durable storage
    (HDFS/S3) instead."""
    if sc.getCheckpointDir() is not None:
        return
    import atexit
    import shutil
    import tempfile
    import warnings

    path = tempfile.mkdtemp(prefix="ctdc-checkpoint-")
    # checkpoint files are only auto-deleted while the app runs when
    # spark.cleaner.referenceTracking.cleanCheckpoints=true (bench.py
    # and the tools set it); the directory WE created is additionally
    # removed at process exit so repeated runs cannot grow /tmp
    # unboundedly.  A caller-configured dir is never touched.
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    if not sc.master.startswith("local"):
        warnings.warn(
            "no checkpoint dir configured; falling back to driver-local "
            f"{path} on non-local master {sc.master!r} — reliable-"
            "checkpoint recovery after executor loss will NOT hold. "
            "Call sc.setCheckpointDir(<shared durable storage>) first.",
            RuntimeWarning,
            stacklevel=3,
        )
    sc.setCheckpointDir(path)


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once with a RELIABLE eager checkpoint (the
    checkpoint dir auto-configured when unset) and return the
    lineage-cut frame.

    The per-call materialization discipline in one greppable place:
    the checkpointed frame is a per-call temporary keyed by nothing —
    every invocation of the calling operator still computes from
    parquet (no cross-run reuse); the checkpoint only stops Catalyst
    re-deriving a diamond-shaped subtree once per consumer."""
    ensure_checkpoint_dir(df.sparkSession.sparkContext)
    return df.checkpoint(eager=True)


def scan_input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes behind ``df``'s file scans, or None when it
    cannot be determined cheaply (non-file sources, remote filesystems
    this driver cannot stat).  Driver-side metadata only — no job runs.
    """
    import os

    try:
        total = 0
        for uri in df.inputFiles():
            path = uri.removeprefix("file:")
            if "://" in path:  # hdfs://, s3a://, ... — not stat-able here
                return None
            total += os.stat(path).st_size
        return total
    except Exception:
        return None


def pin_if_input_large(
    df: DataFrame,
    source_df: DataFrame,
    threshold_bytes: int = 64 << 20,
) -> DataFrame:
    """Cost-conditional :func:`pin` (round-11 verdict item 1): a
    checkpoint only pays when the pass it truncates is expensive, and
    that cost scales with the SOURCE scan, not with the pinned frame.
    Pin when ``source_df``'s scan input exceeds ``threshold_bytes`` —
    or when its size cannot be determined, because the safe default at
    unknown scale is to materialize once rather than re-derive an
    O(n²) subtree per consumer.  At fixture scale (sub-MB inputs) the
    checkpoint's write+read round-trip exceeds the saved recomputation
    (measured on q106: 5.15 s pinned vs 4.86 s unpinned min-of-5) and
    the pin is skipped."""
    size = scan_input_bytes(source_df)
    if size is not None and size < threshold_bytes:
        return df
    return pin(df)


def _signature_aggs(hash_cols: tuple[str, ...]) -> list:
    # bit_xor: order-independent, overflow-free (a sum of 64-bit hashes
    # overflows long under ANSI); callers feed row-distinct frames so
    # xor-cancellation of repeated rows cannot occur
    return [
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(*hash_cols)), F.lit(0)).alias("h"),
    ]


def pin_with_signature(
    df: DataFrame, *hash_cols: str
) -> tuple[DataFrame, tuple[int, int]]:
    """:func:`pin`, plus the (row count, order-independent xor-hash)
    convergence signature of exactly the rows materialized — collected
    from the SAME checkpoint job via ``DataFrame.observe`` instead of a
    second aggregation action re-reading the checkpoint.  Returns
    ``(checkpointed_frame, (n, h))``.

    The signature values are identical to the former two-action form
    (same count/xxhash64/bit_xor expressions over the same rows); only
    the job count changes (2 → 1 per loop round)."""
    ensure_checkpoint_dir(df.sparkSession.sparkContext)
    obs = Observation()
    observed = df.observe(obs, *_signature_aggs(hash_cols))
    ck = observed.checkpoint(eager=True)
    if ck is observed:  # pragma: no cover - plan-audit unpinned pass
        # tools/plan_audit.py patches DataFrame.checkpoint to identity
        # to audit the full pre-pin plan; no action ran, so obs.get
        # would block forever — compute the signature directly instead
        row = df.agg(*_signature_aggs(hash_cols)).first()
        return ck, (int(row["n"]), int(row["h"]))
    m = obs.get
    return ck, (int(m["n"]), int(m["h"]))
