"""As-of join (Q15, SURVEY.md §2.2 [EXT]).

Spark has no ASOF JOIN; a naive implementation (equi-join on key + range
filter + row_number) materializes every (left, right) pair per key before
pruning — O(n·m) per key and a skew hazard at 100 TB.

This implementation is the scalable union-marker pattern:

  1. union left rows (payload nulled) and right rows (marker carries the
     right-side ordering timestamp),
  2. ONE shuffle: window partitioned by key, ordered by (ts, side),
  3. ``last(right_ts, ignorenulls=True)`` over unboundedPreceding..current
     gives each left row the most recent right row with ``right.ts <=
     left.ts``.

Cost: a single hash shuffle of |L|+|R| rows + a per-partition sort — the
same lower bound as a sort-merge join, with no pair blow-up and AQE-managed
skew.  At equal timestamps the right row sorts first (side=0), so it is
visible to a left row with the same ts, matching ASOF semantics
(DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` is the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_binned", "interval_overlap_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` and the same ``on`` key(s)
    (``direction="backward"``, the default), or the EARLIEST right row
    with ``right[right_ts] >= left[left_ts]`` (``direction="forward"``,
    pandas merge_asof direction='forward') — same single-shuffle
    union-marker plan either way, with the window frame and the
    equal-ts tie side mirrored.

    Returns the left DataFrame plus ``asof_<col>`` columns (null when no
    right row precedes/follows the left row).  The matched right ROW is
    picked as one unit (a struct), never per column: independent
    per-column ignorenulls picks would fill a genuinely-NULL right
    value through from an OLDER right row, emitting a combination of
    columns that never existed on the right side — and diverging from
    the DuckDB ``ASOF JOIN`` oracle, which takes the matched row's NULL
    as-is.  Rows tying on (key, ts) order by the value struct itself,
    so the pick is deterministic across runs and partitionings.

    With ``tolerance``, a match farther than ``tolerance`` from
    ``left_ts`` is nulled out — pandas merge_asof semantics — as a
    post-window filter, so the single-shuffle plan is unchanged.  For
    timestamp/date ordering columns pass an INTERVAL string
    (``'2 hours'``); for numeric ordering columns (epoch longs) pass a
    number in the column's own units.  ``on`` may be a single column or
    a list (pandas merge_asof ``by``); the window partitions on the
    full composite key — still one shuffle.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    backward = direction == "backward"
    value_cols = value_cols or []
    keys = [on] if isinstance(on, str) else list(on)
    l_cols = left.columns

    # the right-row bundle: ordering ts + every value column in ONE
    # struct, so the window pick is row-atomic
    r_struct_type = T.StructType(
        [T.StructField("__r_ts", right.schema[right_ts].dataType)]
        + [
            T.StructField(f"__r_{c}", right.schema[c].dataType)
            for c in value_cols
        ]
    )

    # equal-ts semantics: the right row must be visible to the left row's
    # frame — right sorts before left (backward, preceding frame) or
    # after left (forward, following frame)
    l_side, r_side = (1, 0) if backward else (0, 1)
    lm = left.select(
        *[F.col(k).alias(f"__key{i}") for i, k in enumerate(keys)],
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        *[F.col(c) for c in l_cols],
        # null marker typed as the bundle — the algorithm stays
        # type-agnostic (epoch longs, dates, timestamps all order fine)
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    rm = right.select(
        *[F.col(k).alias(f"__key{i}") for i, k in enumerate(keys)],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        F.struct(
            F.col(right_ts).alias("__r_ts"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        ).alias("__r"),
    )

    w = Window.partitionBy(
        *[f"__key{i}" for i in range(len(keys))]
    ).orderBy(F.col("__ts"), F.col("__side"), F.col("__r"))
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    picked = pick("__r", ignorenulls=True).over(w)
    filled = lm.unionByName(rm).select(
        *l_cols,
        F.col("__side"),
        F.col("__ts"),
        picked["__r_ts"].alias("asof_ts"),
        *[picked[f"__r_{c}"].alias(f"asof_{c}") for c in value_cols],
    )
    out = filled.filter(F.col("__side") == l_side)
    if tolerance is not None:
        ts_type = left.schema[left_ts].dataType
        if isinstance(
            ts_type, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            delta = F.expr(f"INTERVAL {tolerance}")
        else:
            # numeric ordering column: the tolerance is in the column's
            # own units (INTERVAL arithmetic on a bigint is an
            # AnalysisException, not type-agnosticism)
            try:
                delta = F.lit(float(tolerance))
            except (TypeError, ValueError):
                raise ValueError(
                    f"asof_join: ordering column {left_ts!r} is "
                    f"{ts_type.simpleString()}; tolerance must be a "
                    f"number in its units, got {tolerance!r}"
                ) from None
        if backward:
            in_window = F.col("asof_ts") >= (F.col("__ts") - delta)
        else:
            in_window = F.col("asof_ts") <= (F.col("__ts") + delta)
        out = out.select(
            *l_cols,
            F.col("__side"),
            F.when(in_window, F.col("asof_ts")).alias("asof_ts"),
            *[
                F.when(in_window, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    return out.drop("__side", "__ts")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    extra_cond: Column | None = None,
    bin_seconds: int | None = None,
) -> DataFrame:
    """Pure range join — match when ``right_ts - left_ts`` falls in
    ``[lower_seconds, upper_seconds]`` with NO equi-key — without the
    BroadcastNestedLoopJoin/cartesian plan Spark produces for a bare
    range predicate.

    Both sides bin their timestamps to ``bin_seconds``-wide buckets (the
    interval width by default); each left row explodes to the bins its
    match window overlaps (a small constant ≈ (upper-lower)/bin + 1), the
    join becomes an EQUI-join on the bin id (hash-partitionable, AQE- and
    skew-handling-eligible), and the exact range predicate filters the
    candidates.  Work is O(pairs within bin distance), not O(|L|·|R|).
    Returns the joined frame with both sides' columns under aliases
    ``l``/``r``; add ``extra_cond`` for additional predicates evaluated
    post-join.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    w = bin_seconds or max(upper_seconds - lower_seconds, 1)
    # bins from the exact fractional epoch (cast double), not
    # unix_timestamp, whose second-truncation can shift a boundary row
    # into the neighboring bin and silently drop the candidate
    l_epoch = F.col(f"l.{left_ts}").cast("double")
    lo_bin = F.floor((l_epoch + lower_seconds) / w).cast("long")
    hi_bin = F.floor((l_epoch + upper_seconds) / w).cast("long")
    lb = left.alias("l").withColumn(
        "__lbin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    rb = right.alias("r").withColumn(
        "__rbin",
        F.floor(F.col(f"r.{right_ts}").cast("double") / w).cast("long"),
    )
    # the exact predicate stays in timestamp arithmetic (no precision loss)
    cond = (
        (F.col("__lbin") == F.col("__rbin"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_seconds} SECONDS")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_seconds} SECONDS")
        )
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, cond, "inner").drop("__lbin", "__rbin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 3600,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (l.start <= r.end AND
    r.start <= l.end) without the BroadcastNestedLoopJoin a bare
    overlap predicate plans to — the sessions × campaigns / outages ×
    requests / shifts × incidents primitive that
    :func:`range_join_binned` (point-in-window) cannot express.

    Each interval explodes to the ``bin_seconds`` buckets it covers
    (≈ duration/bin + 1 — size bins to typical duration), the join is
    an EQUI-join on the bucket id, the exact overlap predicate filters
    candidates, and each surviving pair is kept ONLY in the FIRST
    bucket both intervals occupy (max of the two start-bins) — the
    rendezvous-bin trick, so multi-bin pairs emit exactly once with
    NO distinct/dedup pass.  Work is O(pairs within bin co-residence),
    hash-partitionable, AQE/skew-eligible.  Intervals longer than a
    few hundred bins should be split upstream (their explode factor
    IS their bin count — the documented trade).  Returns the joined
    frame with both sides aliased ``l``/``r``.
    """
    w = int(bin_seconds)
    ls = F.col(f"l.{l_start}").cast("double")
    le = F.col(f"l.{l_end}").cast("double")
    rs = F.col(f"r.{r_start}").cast("double")
    re_ = F.col(f"r.{r_end}").cast("double")
    lb = left.alias("l").withColumn(
        "__lbin",
        F.explode(
            F.sequence(
                F.floor(F.col(f"l.{l_start}").cast("double") / w),
                F.floor(F.col(f"l.{l_end}").cast("double") / w),
            )
        ),
    )
    rb = right.alias("r").withColumn(
        "__rbin",
        F.explode(
            F.sequence(
                F.floor(F.col(f"r.{r_start}").cast("double") / w),
                F.floor(F.col(f"r.{r_end}").cast("double") / w),
            )
        ),
    )
    overlap = (ls <= re_) & (rs <= le)
    rendezvous = F.col("__lbin") == F.greatest(
        F.floor(ls / w), F.floor(rs / w)
    )
    cond = (F.col("__lbin") == F.col("__rbin")) & overlap & rendezvous
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, cond).drop("__lbin", "__rbin")
