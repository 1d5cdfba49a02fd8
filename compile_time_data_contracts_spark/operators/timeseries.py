"""Time-series resampling: regular tick grids + forward-fill.

Gap filling is the hypertable-style operation LLM-pipeline telemetry and
event tables need: produce one row per (key, tick) on a regular grid,
carrying the most recent observation forward.  Built entirely from
codegen primitives — ``sequence`` + ``explode`` for the grid (no driver
loop, no Python) and the union-marker as-of join (one shuffle) for the
fill — so it scales like any aggregation.

Grid size is (span / step) rows per key: choose ``step`` so the grid is
O(observations), and bound the span upstream for keys with years of
history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_join

__all__ = [
    "resample_ffill",
    "resample_interp",
    "ewma_trailing",
    "funnel_conversion",
    "cusum_changepoint",
    "interarrival_stats",
    "time_weighted_average",
    "yoy_growth",
    "rolling_correlation",
    "gaps_islands",
    "peak_concurrency",
    "clamped_running_balance",
]


def ewma_trailing(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.1,
    window: int = 8,
    out_col: str = "ewma",
    decimals: int = 4,
) -> DataFrame:
    """Trailing-window exponentially weighted moving average per key:
    for each row, ewma = Σ_{j=0..m-1} (1-α)^j · x_{t-j} / Σ (1-α)^j over
    the last ``window`` observations (m = rows actually in the frame, so
    the head of each series normalizes over what exists — pandas
    ``ewm(adjust=True)`` semantics, truncated to a bounded frame).

    The truncation is the scale decision: the textbook recursive EWMA is
    a sequential scan per key (unbounded state, no partial aggregation),
    while the trailing form is ONE sort-based window over the key
    exchange — no join, no Python, state bounded by ``window`` rows.
    The dropped tail carries a (1-α)^window fraction of the infinite
    EWMA's weight mass — with (1-α)=0.9: 43 % at window=8, 3.4 % at
    window=32, <1 % at window=44 — so the default window=8 is a fast
    recency feature, NOT a close approximation of the recursive EWMA;
    widen ``window`` to tighten, cost stays linear in the frame.

    Implementation is entirely codegen expressions: ``collect_list``
    over the rows frame (``order_cols`` must make the order total —
    include a unique tiebreaker), ``zip_with`` against a descending
    ``sequence`` of lags for the weighted terms, ``aggregate`` for the
    numerator, and the closed-form geometric sum (1-(1-α)^m)/α for the
    denominator.  NULL values in ``value_col`` FAIL FAST at execution
    (``raise_error`` on the first null row): ``collect_list`` silently
    skips nulls, which would misalign the lag weights and produce
    plausible-looking wrong numbers — filter or impute upstream, then
    call this.

    Output: input key/order columns + ``out_col`` rounded to
    ``decimals``.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"ewma_trailing: alpha must be in (0,1), got {alpha}")
    if window < 1:
        raise ValueError(f"ewma_trailing: window must be >= 1, got {window}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    d = 1.0 - alpha
    # CASE WHEN branches evaluate lazily per row, so the error fires
    # only if a null actually flows through — no extra pass, no action
    checked = F.when(
        F.col(value_col).isNotNull(), F.col(value_col).cast("double")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"ewma_trailing: NULL in {value_col} — collect_list "
                "would silently drop it and misalign the lag weights; "
                "filter or impute nulls upstream"
            )
        )
    )
    lst = F.collect_list(checked).over(w)
    num = F.expr(
        f"aggregate(zip_with(__l, sequence(size(__l)-1, 0, -1),"
        f" (x, j) -> x * pow({d!r}, j)), 0D, (acc, v) -> acc + v)"
    )
    den = (1.0 - F.pow(F.lit(d), F.size(F.col("__l")))) / alpha
    return (
        df.select(key_col, *order_cols, lst.alias("__l"))
        .select(
            key_col,
            *order_cols,
            F.round(num / den, decimals).alias(out_col),
        )
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """One row per (key, tick) from each key's first to last observation
    (ticks aligned to ``trunc_unit``), with the latest observation at or
    before the tick forward-filled.  The FIRST tick of an unaligned
    series is null by construction: the grid starts at
    trunc(min_ts), which PRECEDES an observation at e.g. 10:30 with
    its 10:00 tick, and no observation exists at or before 10:00 —
    this is standard ffill head behavior (the oracle implements the
    same rule); callers wanting a fully-filled grid should truncate
    observation timestamps to the tick grid before resampling.

    Observations are pre-aggregated to one row per (key, ts) — max of
    ``value_col`` — so the as-of match is deterministic under duplicate
    timestamps.
    """
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("__hi"),
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )
    obs = df.groupBy(key_col, ts_col).agg(
        F.max(value_col).alias(value_col)
    )
    return asof_join(
        grid, obs, on=key_col, left_ts=ts_col, right_ts=ts_col,
        value_cols=[value_col],
    ).select(
        key_col,
        ts_col,
        F.col(f"asof_{value_col}").alias(f"{value_col}_ffill"),
    )


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Regular-grid resampling with LINEAR interpolation between the
    surrounding observations (vs :func:`resample_ffill`'s step-hold):
    tick value = prev + (t-t_prev)/(t_next-t_prev) × (next-prev);
    null outside [first obs, last obs] (no extrapolation).

    One union of grid + observation rows, then ONE window partitioning
    per key (ordered by (ts, grid-after-obs)) computes all four
    bracketing columns — prev/next value and timestamp — via
    last/first IGNORE NULLS over the preceding/following frames: a
    single shuffle and a single per-key sort, no self-join, no second
    as-of pass.  A tick coinciding with an observation sorts after it,
    so it brackets to that exact value.
    """
    obs = df.groupBy(key_col, ts_col).agg(
        F.max(value_col).cast("double").alias("__v")
    )
    bounds = obs.groupBy(key_col).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("__hi"),
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )
    u = grid.select(
        key_col,
        ts_col,
        F.lit(None).cast("double").alias("__v"),
        F.lit(1).alias("__is_grid"),
    ).unionByName(
        obs.select(
            key_col, ts_col, "__v", F.lit(0).alias("__is_grid")
        )
    )
    wprev = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__is_grid")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("__v").isNotNull(), F.col(ts_col))
    pv = F.last("__v", ignorenulls=True).over(wprev)
    pt = F.last(obs_ts, ignorenulls=True).over(wprev)
    nv = F.first("__v", ignorenulls=True).over(wnext)
    nt = F.first(obs_ts, ignorenulls=True).over(wnext)
    t = F.col(ts_col).cast("double")
    frac = (t - pt.cast("double")) / (nt.cast("double") - pt.cast("double"))
    interp = (
        F.when(pt.isNull() | (nt.isNull() & (pt != F.col(ts_col))), F.lit(None))
        .when(pt == F.col(ts_col), pv)
        .otherwise(pv + frac * (nv - pv))
    )
    return (
        u.withColumn(f"{value_col}_interp", interp)
        .filter(F.col("__is_grid") == 1)
        .select(key_col, ts_col, f"{value_col}_interp")
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    max_gap_s: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis (the product-analytics staple, e.g.
    view -> click -> purchase): a user reaches step k iff an
    occurrence of ``steps[k]`` exists STRICTLY AFTER the user's
    earliest qualifying occurrence of ``steps[k-1]`` — the greedy
    earliest-completion rule, which is the standard one (taking the
    earliest qualifying time at every step maximizes the set of users
    who can complete later steps).

    Plan shape, fully LAZY (no driver-side actions — an analytics
    operator must not run jobs at build time): per step, one
    step-filtered scan (predicate pushed to the source) feeding a
    user-keyed min-aggregation, joined user-to-user onto the previous
    step's reach times; each step's |users|-sized reach frame is also
    counted into a 1-row aggregate, and the |steps| count rows union
    into the result, where one window over that |steps|-row frame
    derives the conversion ratios.  After the first shuffle every join
    is co-partitioned on ``user_col``; nothing ever sorts the raw
    event log.  Step k's plan re-derives steps 0..k-1 (Spark does not
    dedupe shared subtrees) — |steps|²/2 cheap user-keyed joins total;
    for deep funnels persist intermediate reaches, for the usual 3-5
    steps the redundancy is noise next to the event scan.  At 100 TB
    partition-prune the scan by day first.

    ``max_gap_s`` bounds each hop: with it set, step k counts only
    within ``max_gap_s`` seconds of the user's step k-1 time — the
    attribution-window form ("click within 30 min of the view"),
    which changes semantics, not shape: the bound is one more pushed
    predicate on the same co-partitioned join.  Unbounded (None) is
    the q239 greedy-earliest contract unchanged.

    Returns |steps| rows: (step_idx, step, users_reached,
    conversion_from_prev_r, conversion_from_first_r) ordered by
    step_idx; conversions are NULL for the first step and for
    zero-reach predecessors.
    """
    if len(steps) < 2:
        raise ValueError("funnel_conversion: need at least 2 steps")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(step_col).alias("__step"),
    )

    def count_row(reach: DataFrame, idx: int) -> DataFrame:
        return reach.agg(
            F.lit(idx).alias("step_idx"),
            F.lit(steps[idx]).alias("step"),
            F.count(F.lit(1)).cast("bigint").alias("users_reached"),
        )

    # t[k] per user: earliest steps[k] event after that user's t[k-1]
    reached = (
        ev.filter(F.col("__step") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__t"))
    )
    levels = [count_row(reached, 0)]
    for i, s in enumerate(steps[1:], 1):
        reached = (
            ev.filter(F.col("__step") == s)
            .join(reached, "__u")
            .filter(
                (F.col("__ts") > F.col("__t"))
                if max_gap_s is None
                else (
                    (F.col("__ts") > F.col("__t"))
                    & (
                        F.unix_micros(F.col("__ts"))
                        <= F.unix_micros(F.col("__t"))
                        + F.lit(int(max_gap_s) * 1000000)
                    )
                )
            )
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
        )
        levels.append(count_row(reached, i))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    w = Window.orderBy("step_idx")
    wfirst = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("users_reached").over(w)
    first = F.first("users_reached").over(wfirst)
    ratio = lambda den: F.when(  # noqa: E731
        (F.col("step_idx") > 0) & (den > 0),
        F.round(F.col("users_reached") / den, 6),
    )
    return out.select(
        "step_idx",
        "step",
        "users_reached",
        ratio(prev).alias("conversion_from_prev_r"),
        ratio(first).alias("conversion_from_first_r"),
    ).orderBy("step_idx")


def cusum_changepoint(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    scale: int = 100,
) -> DataFrame:
    """Single most likely mean-shift changepoint per group by the CUSUM
    statistic: with S_i = Σ_{j<=i} (x_j − x̄), the changepoint is the
    time index maximizing |S_i| (ties → earliest time).  The offline
    twin of PSI/KS drift (q158/q164): those say "the distribution
    moved", CUSUM says WHEN the level moved in an ordered series.

    Input is one row per (group, tick) — pre-aggregate raw rows to the
    tick grid first, exactly like `resample_ffill` callers.  Shape: one
    group-partitioned ordered window over the |ticks|-per-group series
    (never the raw table) plus a per-group argmax — so the scan+pre-agg
    dominates at 100 TB and the window input stays bounded by the grid.

    Engine-exactness: ``value_col`` is fixed-pointed to integers via
    ``scale`` (cents for money), and the comparison statistic is kept
    as the INTEGER n·S_i = n·cum_i − i·total — no division, no doubles —
    so the argmax and tie-break are bit-exact in any engine; only the
    reported magnitude divides back to value units at the end.
    Returns one row per group: (group_cols…, cp_ts, max_abs_cusum_r,
    n_points).
    """
    gb = list(group_cols or [])
    v = F.floor(F.col(value_col).cast("double") * scale).cast("bigint")
    s = df.select(*gb, F.col(ts_col).alias("__t"), v.alias("__v"))
    wcum = (
        Window.partitionBy(*gb)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*gb)
    cur = s.select(
        *gb,
        "__t",
        F.sum("__v").over(wcum).alias("__cum"),
        F.row_number()
        .over(Window.partitionBy(*gb).orderBy("__t"))
        .alias("__i"),
        F.sum("__v").over(wall).alias("__tot"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    )
    # n·S_i as an exact integer; argmax by (|n·S_i| desc, t asc)
    ns = (F.col("__n") * F.col("__cum") - F.col("__i") * F.col("__tot"))
    ranked = cur.select(
        *gb,
        "__t",
        F.abs(ns).alias("__a"),
        "__n",
        F.row_number()
        .over(
            Window.partitionBy(*gb).orderBy(
                F.abs(ns).desc(), F.col("__t").asc()
            )
        )
        .alias("__rn"),
    ).filter(F.col("__rn") == 1)
    return ranked.select(
        *gb,
        F.col("__t").alias("cp_ts"),
        F.round(
            F.col("__a").cast("double")
            / (F.col("__n") * F.lit(float(scale))),
            4,
        ).alias("max_abs_cusum_r"),
        F.col("__n").cast("bigint").alias("n_points"),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Inter-arrival-time statistics per key: gap count, mean gap,
    coefficient of variation, and the burstiness index
    B = (σ−μ)/(σ+μ) ∈ [−1, 1] (Goh & Barabási 2008): B ≈ −1 for a
    regular clock, 0 for a Poisson process, → 1 for bursty arrivals —
    the telemetry signal that separates schedulers from humans from
    incidents, complementing WHEN-shaped detectors (q240 CUSUM) with
    HOW arrivals cluster.

    One per-key ordered window (lag) produces the gap stream in
    place; one partial-combined aggregate reduces it — two exchanges
    total, no self-join, never a global sort.  Gaps are exact integer
    MICROSECONDS (unix_micros ↔ ANSI epoch_us — second-truncation
    would desync engines on sub-second data); Σg stays an exact
    integer, while Σg² runs in doubles (micros² would overflow int64)
    with each g·g term exactly representable, so engines agree to
    summation-order ulps, absorbed by the 4 dp rounding (mean
    reported in seconds).  Keys with fewer than 2 events yield no row
    (no gaps exist).  σ is the population std of gaps.  Output:
    (key_col, n_gaps, mean_gap_s_r, cv_r, burstiness_r) — CV/B NULL
    when the mean or σ+μ is 0.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    t = F.unix_micros(F.col(ts_col))
    gaps = df.select(
        key_col,
        (t - F.lag(t).over(w)).alias("__g"),
    ).filter(F.col("__g").isNotNull())
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("__g").alias("__s"),
        F.sum(
            F.col("__g").cast("double") * F.col("__g").cast("double")
        ).alias("__s2"),
    )
    mu = F.col("__s").cast("double") / F.col("n_gaps")
    var = F.col("__s2") / F.col("n_gaps") - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return agg.select(
        key_col,
        "n_gaps",
        F.round(mu / 1000000.0, 4).alias("mean_gap_s_r"),
        F.when(mu > 0, F.round(sigma / mu, 4)).alias("cv_r"),
        F.when(
            (sigma + mu) > 0, F.round((sigma - mu) / (sigma + mu), 4)
        ).alias("burstiness_r"),
    )


def time_weighted_average(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    value_scale: int = 1000,
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled value per group
    (TWAP): each observation is weighted by its HOLDING TIME — the
    milliseconds until the group's next observation; the final
    observation carries no weight (nothing is held after it).  The
    correct aggregate for irregularly-sampled prices/gauges, where the
    plain mean over-counts bursts: ten readings in a quiet minute must
    not outweigh one reading that held for an hour.

    One per-group lead() window produces holding times in place; one
    partial-combined aggregate reduces — two exchanges, no self-join.
    Engine-exactness: values fixed-pointed by ``value_scale`` (milli
    units) and holding times as integer MILLISECONDS keep every
    value·dt term and both sums exact integers (term bound
    value_milli · span_ms < 2⁶³ — document your units; micros would
    overflow), so the TWAP is a ratio of exact integers.  Output:
    (group_cols…, n_obs, held_ms, twap_r 4 dp); groups with a single
    observation yield NULL twap (no holding interval exists).
    """
    w = Window.partitionBy(*group_cols).orderBy(ts_col, tiebreak_col)
    t = F.unix_micros(F.col(ts_col))
    vm = F.floor(
        F.col(value_col).cast("double") * value_scale
    ).cast("bigint")
    s = df.select(
        *group_cols,
        vm.alias("__v"),
        # floor, not cast: Spark's double->bigint cast truncates while
        # DuckDB's rounds — floor() agrees everywhere (diffs are >= 0)
        F.floor((F.lead(t).over(w) - t) / 1000).cast("bigint").alias(
            "__dt"
        ),
    )
    agg = s.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum("__dt").cast("bigint").alias("held_ms"),
        F.sum(F.col("__v") * F.col("__dt")).alias("__wv"),
    )
    return agg.select(
        *group_cols,
        "n_obs",
        F.coalesce("held_ms", F.lit(0)).cast("bigint").alias(
            "held_ms"
        ),
        F.when(
            F.col("held_ms") > 0,
            F.round(
                F.col("__wv").cast("double")
                / F.col("held_ms")
                / value_scale,
                4,
            ),
        ).alias("twap_r"),
    )


def yoy_growth(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Month-over-same-month-last-year growth: monthly totals joined
    to themselves on month = add_months(month, 12) — a JOIN, not
    lag(12), because a calendar gap (no sales in a month) silently
    shifts every lag-based comparison one month off; the join aligns
    by CALENDAR month and yields NULL where last year has no row —
    surfaced, not misaligned.  The BI time-intelligence primitive
    (period-over-period at any grain follows the same shape).

    One partial-combined aggregate to |months| rows + one self-join
    of that tiny table (broadcast at any realistic month count):
    cost is the scan.  Totals are exact cents; the growth ratio is
    one rounded division.  Output: (month, rev_r, prev_year_rev_r,
    yoy_pct_r) — yoy_pct NULL when last year is absent or zero.
    """
    m = df.groupBy(
        F.date_trunc("month", F.col(ts_col)).cast("date").alias(
            "month"
        )
    ).agg(
        F.sum(
            F.floor(F.col(value_col).cast("double") * scale).cast(
                "bigint"
            )
        ).alias("__v")
    )
    prev = m.select(
        F.add_months(F.col("month"), 12).alias("month"),
        F.col("__v").alias("__pv"),
    )
    j = m.join(F.broadcast(prev), "month", "left")
    return j.select(
        "month",
        F.round(F.col("__v") / F.lit(float(scale)), 2).alias("rev_r"),
        F.round(F.col("__pv") / F.lit(float(scale)), 2).alias(
            "prev_year_rev_r"
        ),
        F.when(
            F.col("__pv") > 0,
            F.round(
                (F.col("__v") - F.col("__pv"))
                / F.col("__pv").cast("double"),
                4,
            ),
        ).alias("yoy_pct_r"),
    )


def rolling_correlation(
    df: DataFrame,
    ts_col: str,
    x_col: str,
    y_col: str,
    window_rows: int = 30,
    min_rows: int = 10,
    scale: int = 1000000,
) -> DataFrame:
    """Rolling Pearson correlation between two aligned series — the
    time-LOCAL dependence view where q224's lagged cross-correlation
    is global: a relationship that flips sign mid-year averages to
    zero globally but screams in the rolling view (regime detection,
    metric-coupling drift).

    Input is one row per tick with both series' values (pivot
    upstream).  One ordered rows-frame window computes all five
    moment sums (n, Σx, Σy, Σx², Σy², Σxy) over the trailing
    ``window_rows`` ticks in a single pass — no self-join, no
    per-window re-aggregation; frame sums accumulate in the window's
    deterministic order.  Values are fixed-pointed so Σx/Σy are
    exact integers; the square/cross sums run in doubles of exact
    products.  r is NULL until ``min_rows`` ticks exist or when
    either variance is 0.  Output: (ts_col, n_window, r_r 6 dp).
    """
    xi = F.floor(F.col(x_col).cast("double") * scale).cast("bigint")
    yi = F.floor(F.col(y_col).cast("double") * scale).cast("bigint")
    w = Window.orderBy(ts_col).rowsBetween(-(window_rows - 1), 0)
    s = df.select(
        ts_col,
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum(xi).over(w).alias("__sx"),
        F.sum(yi).over(w).alias("__sy"),
        F.sum(xi.cast("double") * xi.cast("double")).over(w).alias(
            "__sxx"
        ),
        F.sum(yi.cast("double") * yi.cast("double")).over(w).alias(
            "__syy"
        ),
        F.sum(xi.cast("double") * yi.cast("double")).over(w).alias(
            "__sxy"
        ),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    # the integer sums must square as DOUBLES: sx*sx on bigints
    # overflows int64 the moment a window's sum passes 3e9
    num = n * F.col("__sxy") - sx * sy
    denx = n * F.col("__sxx") - sx * sx
    deny = n * F.col("__syy") - sy * sy
    r = F.when(
        (F.col("__n") >= min_rows) & (denx > 0) & (deny > 0),
        num / F.sqrt(denx * deny),
    )
    return s.select(
        ts_col,
        F.col("__n").cast("bigint").alias("n_window"),
        F.round(r, 6).alias("r_r"),
    )


def gaps_islands(
    df: DataFrame,
    key_col: str,
    seq_col: str,
) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE integers per key
    (activity streaks, contiguous id ranges, unbroken SLA days) via
    the classic seq − row_number() island key — consecutive values
    share it, any gap shifts it; one per-key ordered window + one
    partial-combined aggregate, no self-join, no recursion.

    Input is deduplicated internally (duplicate seq values would
    corrupt the row_number delta) and NULL seq values are dropped
    (a NULL would otherwise survive distinct() and emit a phantom
    length-1 island per key).  Output: one row per island:
    (key_col, island_start, island_end, length).
    """
    from pyspark.sql import Window

    s = (
        df.select(
            key_col, F.col(seq_col).cast("bigint").alias("__s")
        )
        .filter(F.col("__s").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("__s")
    isl = s.select(
        key_col,
        "__s",
        (F.col("__s") - F.row_number().over(w)).alias("__island"),
    )
    return isl.groupBy(key_col, "__island").agg(
        F.min("__s").cast("bigint").alias("island_start"),
        F.max("__s").cast("bigint").alias("island_end"),
        F.count(F.lit(1)).cast("bigint").alias("length"),
    ).drop("__island")


def multitouch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    channel_col: str,
    conversion_channel: str,
    lookback_days: int = 7,
) -> DataFrame:
    """Multi-touch marketing attribution: for every conversion event
    (rows whose ``channel_col`` equals ``conversion_channel``), find
    the user's touch events (all OTHER channels) in the
    ``lookback_days`` window strictly before the conversion, and
    credit channels under the three standard models at once:

      * first-touch — 1 credit to the earliest touch in the window,
      * last-touch  — 1 credit to the latest,
      * linear      — floor(1e6 / n) micro-credits to each of the n
        touches (integerized so engine float summation order can
        never flip a result; an ANSI oracle replays it exactly).

    Conversions with no touch in the window are credited to the
    ``(direct)`` pseudo-channel under all three models.

    Shape: the touch<->conversion pairing is a user-keyed equi-join
    with a time-range predicate — partitioned by user, so work is
    O(sum_u touches_u x conversions_u) and never global-quadratic;
    per-user volume is bounded by real user activity (heavy-hitter
    users are an AQE skew-join case, not a plan rewrite).  First/last
    selection is a (conversion)-partitioned window with the
    deterministic (ts, id) tiebreak; output is |channels|-sized.

    Returns (channel, first_touch, last_touch, linear_micro).
    """
    u, t, i, c = user_col, ts_col, id_col, channel_col
    conv = df.filter(F.col(c) == conversion_channel).select(
        F.col(u).alias("__cu"),
        F.col(t).alias("__ct"),
        F.col(i).alias("__cid"),
    )
    touch = df.filter(F.col(c) != conversion_channel).select(
        F.col(u).alias("__tu"),
        F.col(t).alias("__tt"),
        F.col(i).alias("__tid"),
        F.col(c).alias("channel"),
    )
    paired = conv.join(
        touch,
        (F.col("__cu") == F.col("__tu"))
        & (F.col("__tt") < F.col("__ct"))
        & (
            F.col("__tt")
            >= F.col("__ct") - F.expr(f"INTERVAL {lookback_days} DAYS")
        ),
        "left",
    )
    w = Window.partitionBy("__cu", "__cid").orderBy("__tt", "__tid")
    wd = Window.partitionBy("__cu", "__cid").orderBy(
        F.col("__tt").desc(), F.col("__tid").desc()
    )
    wn = Window.partitionBy("__cu", "__cid")
    scored = paired.select(
        F.coalesce(F.col("channel"), F.lit("(direct)")).alias("channel"),
        F.row_number().over(w).alias("__rf"),
        F.row_number().over(wd).alias("__rl"),
        F.count("__tid").over(wn).alias("__n"),
    )
    n_eff = F.greatest(F.col("__n"), F.lit(1))
    return scored.groupBy("channel").agg(
        F.sum((F.col("__rf") == 1).cast("long"))
        .cast("bigint")
        .alias("first_touch"),
        F.sum((F.col("__rl") == 1).cast("long"))
        .cast("bigint")
        .alias("last_touch"),
        F.sum((F.lit(1_000_000) / n_eff).cast("bigint"))
        .cast("bigint")
        .alias("linear_micro"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """OHLC (open-high-low-close) bars — the time-series compaction
    primitive for tick/metric streams: per (key, time bucket) emit
    the first value, max, min, last value, event count, and the
    micro-integer value sum (for VWAP-style downstream ratios).

    Open/close are selected by a (ts, id) ROW ORDER window — the id
    tiebreak makes same-timestamp ticks deterministic, which min_by/
    max_by with a bare timestamp would not be.  Values are summed as
    floor(value*1e6) BIGINTs so the bar is engine-exact.  Both
    windows and the final aggregate share the (key, bucket) hash
    partitioning — one shuffle total; bars are |keys x buckets|-sized
    (the 100x compaction that makes downstream rollups cheap at
    100 TB).  Returns (key, bar_ts, open/high/low/close *1e6 micro,
    n_ticks, sum_micro).
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    micro = F.floor(F.col(value_col) * 1_000_000).cast("bigint")
    base = df.select(
        F.col(key_col).alias("key"),
        b.alias("bar_ts"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        micro.alias("__v"),
    )
    w_asc = Window.partitionBy("key", "bar_ts").orderBy("__ts", "__id")
    w_desc = Window.partitionBy("key", "bar_ts").orderBy(
        F.col("__ts").desc(), F.col("__id").desc()
    )
    ranked = base.select(
        "key",
        "bar_ts",
        "__v",
        F.row_number().over(w_asc).alias("__rf"),
        F.row_number().over(w_desc).alias("__rl"),
    )
    return ranked.groupBy("key", "bar_ts").agg(
        F.max(F.when(F.col("__rf") == 1, F.col("__v")))
        .cast("bigint")
        .alias("open_micro"),
        F.max("__v").cast("bigint").alias("high_micro"),
        F.min("__v").cast("bigint").alias("low_micro"),
        F.max(F.when(F.col("__rl") == 1, F.col("__v")))
        .cast("bigint")
        .alias("close_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        F.sum("__v").cast("bigint").alias("sum_micro"),
    )


def peak_concurrency(
    intervals: DataFrame,
    partition_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line peak concurrency over an interval table: each
    interval contributes +1 at ``start_col`` and -1 at ``end_col``,
    one ``partition_col``-partitioned sort walks the occupancy, and
    the peak plus its first attainment time are read off the walk.
    Starts are processed before ends at equal stamps (an interval is
    live at its own endpoint), so the candidate occupancy at time t is
    cum(starts - ends through t) + ends_at_t.

    O(n log n) with two rows shuffled per interval — the scalable
    alternative to pairwise interval-overlap joins, whose candidate
    set is quadratic in the per-key interval count.  Returns
    (partition, peak_concurrency, first_peak_ts, n_intervals).
    """
    iv = intervals.select(
        F.col(partition_col).alias("part"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    )
    pts = iv.select(
        "part", F.col("s").alias("t"), F.lit(1).alias("is_start")
    ).unionAll(iv.select("part", F.col("e").alias("t"), F.lit(0)))
    grp = pts.groupBy("part", "t").agg(
        F.sum("is_start").alias("ns"),
        F.sum(F.lit(1) - F.col("is_start")).alias("ne"),
    )
    wcum = (
        Window.partitionBy("part")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = grp.select(
        "part",
        "t",
        (F.sum(F.col("ns") - F.col("ne")).over(wcum) + F.col("ne")).alias(
            "pk"
        ),
    )
    best = walked.groupBy("part").agg(F.max("pk").alias("peak"))
    n_iv = iv.groupBy("part").agg(
        F.count("*").cast("bigint").alias("n_intervals")
    )
    return (
        best.join(walked, "part")
        .where(F.col("pk") == F.col("peak"))
        .groupBy("part", "peak")
        .agg(F.min("t").alias("first_peak_ts"))
        .join(n_iv, "part")
        .select(
            F.col("part").alias(partition_col),
            F.col("peak").cast("bigint").alias("peak_concurrency"),
            "first_peak_ts",
            "n_intervals",
        )
    )


def clamped_running_balance(
    df: DataFrame,
    key_col: str,
    delta_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Non-negative clamped balance fold per key: balance starts at 0
    and each ordered movement applies bal = greatest(bal + delta, 0).
    The clamp makes this a genuine prefix recursion no window frame
    can express (every step depends on the clamped predecessor), so
    it runs as a JVM-side higher-order fold: sort_array'd
    collect_list per key, then ``F.aggregate`` — no Python boundary.

    Per-key lists are bounded by that key's movement count; for keys
    with unbounded history, pre-aggregate into coarser epochs or
    stream the same fold through applyInPandas — the contract (final
    clamped balance) is unchanged.  Returns (key, final_balance,
    total_in, total_out, n_moves).
    """
    # NULL deltas fail LOUDLY: greatest() skips nulls, so inside the
    # fold `greatest(acc + NULL, 0)` would silently RESET the balance
    # to 0 and total_in/out would treat the move as 0 — plausible wrong
    # numbers (the ewma_trailing convention: raise, never null-skip)
    checked_delta = F.when(
        F.col(delta_col).isNull(),
        F.raise_error(
            F.lit(
                "clamped_running_balance: NULL delta — drop or impute "
                "null movements explicitly before folding"
            )
        ).cast("bigint"),
    ).otherwise(F.col(delta_col))
    ordered_struct = F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
        checked_delta.alias("delta"),
    )
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.array_sort(F.collect_list(ordered_struct)).alias("moves"),
        F.sum(
            F.when(F.col(delta_col) > 0, F.col(delta_col)).otherwise(0)
        )
        .cast("bigint")
        .alias("total_in"),
        F.sum(
            F.when(F.col(delta_col) < 0, -F.col(delta_col)).otherwise(0)
        )
        .cast("bigint")
        .alias("total_out"),
        F.count("*").cast("bigint").alias("n_moves"),
    )
    return agg.select(
        F.col("key").alias(key_col),
        F.aggregate(
            "moves",
            F.lit(0).cast("bigint"),
            lambda acc, x: F.greatest(
                acc + x["delta"], F.lit(0).cast("bigint")
            ),
        )
        .cast("bigint")
        .alias("final_balance"),
        "total_in",
        "total_out",
        "n_moves",
    )
