"""Multi-dimensional write layout: z-order (Morton) clustering.

A parquet sink sorted on ONE key prunes row groups only for filters on
that key; filters on a second dimension scan everything.  Interleaving
the bits of two keys into a Morton code and range-partitioning +
sorting the write on it bounds EVERY file's extent in BOTH dimensions,
so min/max row-group statistics prune for either predicate — the
standard lakehouse layout trick (Delta/Iceberg `ZORDER BY`), built here
from plain Spark primitives:

  * the code is a chain of shiftright/bitwiseAND/shiftleft ORs —
    whole-stage codegen, no UDF;
  * `repartitionByRange` on the code makes files contiguous z-ranges;
  * `sortWithinPartitions` orders rows inside each file so row-group
    stats are tight too.

At 100 TB the same three lines govern the layout; only `n_files`
changes (target ~1 GB files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_value",
    "write_zordered",
    "compact_parquet",
    "write_tiny_parquet",
]


def write_tiny_parquet(spark, rows, schema: str, path: str) -> None:
    """One-file parquet write of a DRIVER-SIDE row list — the shape of
    every metadata table (content fingerprints, centroid tables, layout
    params, persisted baselines).

    NOT ``createDataFrame(rows).coalesce(1)``: parallelize slices the
    list into defaultParallelism pickled partitions, and coalesce(1)
    then deserializes ALL of them sequentially inside one task, paying
    one Python-worker round-trip per slice — measured ~5 s of pure
    scheduling per tiny write at local[32], which dominated every index
    build's wall clock (the 16-row centroid table cost 3x the full
    corpus assignment pass).  ``repartition(1)`` keeps the narrow
    stages parallel and funnels a few KB through one shuffle (~0.8 s);
    row semantics and the single output footer are identical."""
    spark.createDataFrame(rows, schema).repartition(1).write.mode(
        "overwrite"
    ).parquet(path)


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code interleaving the low ``bits`` bits of two non-negative
    integer columns: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1.  Pure codegen bit arithmetic (2·bits shift/and/or terms);
    callers must pre-scale values into [0, 2^bits)."""
    z: Column | None = None
    for i in range(bits):
        ta = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        tb = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        term = ta.bitwiseOR(tb)
        z = term if z is None else z.bitwiseOR(term)
    return z


def zorder_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical Morton code as portable SQL (DuckDB/ANSI bit ops) —
    generated from the same loop so engine and oracle cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b_expr} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-order of two columns:
    contiguous z-ranges per file (range partition) and sorted rows
    inside each (tight row-group min/max for BOTH dimensions)."""
    z = zorder_value(F.col(col_a), F.col(col_b), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    partitioned: bool = False,
) -> dict:
    """Small-file compaction of a parquet table (the OPTIMIZE /
    bin-packing maintenance pass every long-lived 100 TB table needs:
    streaming sinks and frequent small appends accumulate files whose
    per-file open/footer cost eventually dominates scans).

    Unpartitioned: the whole directory is rewritten into
    ceil(bytes/target) files.  Partitioned (hive layout, ANY nesting
    depth — every directory that directly holds parquet files is a
    compaction unit): each leaf partition is compacted INDEPENDENTLY
    and only when its file count exceeds what its byte size needs —
    already-compact partitions are not rewritten (byte-identical,
    test-asserted), so steady-state maintenance cost tracks the append
    rate, not the table size.  Rewrites go through a temp directory +
    two renames, so a reader never observes a PARTIAL mix of old and
    new files; there is, however, a brief window between the renames
    where the leaf path is absent (POSIX rename cannot exchange two
    directories) — a concurrent scan in that window fails fast with
    path-not-found and retries, it can never read half a layout.
    Concurrent WRITERS to the same leaf still need external
    coordination or a transactional table format, the usual
    non-transactional parquet caveat.  Data is preserved exactly
    (row-identical; test-asserted by checksum).

    Returns {"partitions_compacted": k, "files_before": a,
    "files_after": b}.
    """
    import math
    import os
    import shutil
    import uuid

    def _files(d: str) -> list[str]:
        return [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(".")
        ]

    def _compact_dir(d: str) -> tuple[int, int] | None:
        files = _files(d)
        size = sum(os.path.getsize(f) for f in files)
        need = max(1, math.ceil(size / target_file_bytes))
        if len(files) <= need:
            return None
        tmp = os.path.join(
            os.path.dirname(d.rstrip("/")),
            f".compact-{uuid.uuid4().hex[:8]}",
        )
        # repartition(need) — a full shuffle — rather than coalesce:
        # coalesce(1 of N) would also narrow the UPSTREAM read
        # parallelism to `need` tasks; repartition keeps the read wide
        # and only the write narrow
        spark.read.parquet(d).repartition(need).write.mode(
            "overwrite"
        ).parquet(tmp)
        old = os.path.join(
            os.path.dirname(d.rstrip("/")),
            f".old-{uuid.uuid4().hex[:8]}",
        )
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)
        return len(files), len(_files(d))

    stats = {"partitions_compacted": 0, "files_before": 0, "files_after": 0}
    if partitioned:
        # walk to the LEAF partition directories: with multi-column
        # partitionBy (a=1/b=2/...) the parquet files sit arbitrarily
        # deep, and compacting only the first level would silently
        # no-op (zero files found -> every partition 'already compact')
        dirs = [
            dirpath
            for dirpath, _, files in os.walk(path)
            if "=" in os.path.basename(dirpath)
            and any(
                f.endswith(".parquet") and not f.startswith(".")
                for f in files
            )
        ]
    else:
        dirs = [path]
    # per-leaf rewrites are INDEPENDENT Spark jobs; running them from a
    # thread pool lets the scheduler overlap them (each job is one
    # read-shuffle-write over one small directory — measured 256
    # sequential leaf jobs at ~0.2 s each turned a 50k-row append's
    # maintenance pass into a 50 s tail; 8 concurrent submitters cut
    # it ~6x).  The already-compact fast path (a pure listdir) is done
    # inline by the same workers.
    from concurrent.futures import ThreadPoolExecutor

    if len(dirs) > 1:
        with ThreadPoolExecutor(max_workers=min(8, len(dirs))) as pool:
            befores_afters = list(pool.map(_compact_dir, dirs))
    else:
        befores_afters = [_compact_dir(d) for d in dirs]
    for before_after in befores_afters:
        if before_after is not None:
            stats["partitions_compacted"] += 1
            stats["files_before"] += before_after[0]
            stats["files_after"] += before_after[1]
    return stats
