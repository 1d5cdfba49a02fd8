"""Deterministic sampling + sequence packing for training-data pipelines.

Both operators are pure column expressions — no RNG state, no Python —
so results are identical across runs, partitionings, and engines (the
DuckDB oracle computes the same arithmetic), and a resumed 100 TB job
selects exactly the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "kfold_assign",
    "deterministic_sample",
    "pack_sequences",
    "capped_per_group_sample",
    "mix_to_proportions",
    "global_shuffle_positions",
    "upsample_by_factor",
    "weighted_sample",
    "reservoir_per_group",
    "temperature_mixture_rates",
    "split_by_cluster",
    "target_encode_loo",
    "split_exact_stratified",
]

# Knuth's multiplicative constant; exact in 64-bit SQL integer math
_KNUTH = 2654435761
_M32 = 4294967296


def _mix32(key: Column) -> Column:
    """(key * KNUTH) mod 2^32 as a long in [0, 2^32) for EVERY int64
    key.  The multiply runs in decimal(38,0): a plain int64 multiply
    silently wraps for keys > ~3.47e9 (Spark) or raises (DuckDB) — the
    exact cross-engine divergence these operators forbid — and pmod
    (not %) keeps negative keys in range instead of yielding a negative
    residue that every downstream `bucket < threshold` filter would
    wrongly pass.  For the non-negative, non-overflowing key range the
    value is bit-identical to the old int64 expression, so existing
    oracle SQL and artifacts are unchanged."""
    return F.pmod(
        key.cast("decimal(38,0)") * F.lit(_KNUTH), F.lit(_M32)
    ).cast("long")


def hash_bucket(key: Column, buckets: int = 10000) -> Column:
    """Deterministic, well-mixed bucket in [0, buckets) from ANY integer
    key: multiplicative hashing with exact mod-2^32 arithmetic (see
    :func:`_mix32` for the overflow/negative-key story).  Exactly
    reproducible in any engine; unlike rand(seed), independent of
    partitioning and row order."""
    return _mix32(key) * F.lit(buckets) / F.lit(_M32)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    strata_col: str | None = None,
    rates: dict[str, float] | None = None,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by hashed key;
    with ``strata_col``/``rates``, per-stratum rates (stratified
    sampling — e.g. downsample boilerplate languages, keep all rare
    ones).  A row's fate depends only on its key, so reruns, retries,
    and scale-out never change the sample."""
    bucket = hash_bucket(F.col(key_col), 10000)
    if strata_col is None or rates is None:
        return df.filter(bucket < F.lit(rate * 10000))
    expr = F.lit(rate * 10000)
    for stratum, r in rates.items():
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(r * 10000)
        ).otherwise(expr)
    return df.filter(bucket < expr)


def pack_sequences(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    pack_col: str = "pack_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to training context windows: in ``order_col``
    order, pack_id = floor(exclusive-running-token-sum / budget) —
    contiguous fill, deterministic, one window shuffle.

    This is streaming-order packing (each pack holds consecutive docs
    whose cumulative tokens span one budget), not bin-packing — the
    standard choice for pretraining batches where document order is
    already shuffled upstream.  A doc longer than ``budget`` occupies
    its own pack(s) boundary-aligned, like sequence splitting would.

    A global ordered window is a single-partition sort; at scale pass
    ``shard_col`` (any coarse key — date, source, hash_bucket) so each
    shard packs independently in parallel and pack ids are
    (shard, pack_id) pairs.
    """
    if shard_col is not None:
        w = Window.partitionBy(shard_col).orderBy(order_col)
    else:
        w = Window.orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_excl = F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)
    return df.withColumn(
        pack_col, F.floor(cum_excl / F.lit(budget)).cast("int")
    )


def mix_to_proportions(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Downsample domains so the kept rows match a target mixture (the
    "data mixing" step of a pretraining pipeline: e.g. 60% web, 30%
    code, 10% books).

    The largest feasible total is bounded by the scarcest domain:
    ``n_total = min_d(count_d / weight_d)``; each domain then keeps
    ``weight_d * n_total`` rows via the deterministic hash filter, so no
    domain is oversampled (without-replacement only) and the binding
    domain is kept whole.  Domains absent from ``weights`` are dropped.

    Two passes over the data — a count aggregation (map-side combined,
    output is |domains| rows) and the filtered scan — plus one broadcast
    join of the tiny per-domain rate table.  All arithmetic is exact
    64-bit integers and IEEE doubles in a fixed order, so the DuckDB
    oracle recomputes the identical sample membership.
    """
    w_rates = [
        (d, float(w)) for d, w in sorted(weights.items()) if w > 0
    ]
    spark = df.sparkSession
    wdf = spark.createDataFrame(w_rates, f"{domain_col} string, __w double")
    counts = (
        df.filter(F.col(domain_col).isin([d for d, _ in w_rates]))
        .groupBy(domain_col)
        .agg(F.count("*").alias("__cnt"))
        .join(F.broadcast(wdf), domain_col)
    )
    # scarcest domain binds the total; rate_d = weight_d * n_total / count_d
    n_total = counts.agg(
        F.min(F.col("__cnt") / F.col("__w")).alias("__n_total")
    )
    rates = counts.crossJoin(F.broadcast(n_total)).select(
        domain_col,
        (F.col("__w") * F.col("__n_total") / F.col("__cnt")).alias("__rate"),
    )
    bucket = hash_bucket(F.col(key_col), 10000)
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(bucket < F.col("__rate") * 10000)
        .drop("__rate")
    )


def global_shuffle_positions(
    df: DataFrame,
    key_col: str,
    pos_col: str = "pos",
    buckets: int = 1024,
) -> DataFrame:
    """Assign every row its 1-based position in a deterministic global
    shuffle order (multiplicative hash of the key, ties broken by key) —
    the "shuffle the corpus once per epoch, resumably" step of a
    training-data pipeline.

    A naive ``row_number() OVER (ORDER BY hash)`` is a single-partition
    global sort.  Instead this computes the classic distributed rank:
    the hash is cut into ``buckets`` contiguous ranges (the bucket id is
    ``hash * buckets / 2^32`` — monotone in the hash, so bucket order IS
    hash order), per-bucket counts are prefix-summed on the tiny
    |buckets|-row side, and each row's position is the bucket offset
    plus its ``row_number`` within the bucket.  The data shuffles once
    (on the bucket id); the window rides the same partitioning, so no
    second exchange, and every partition sorts only its own bucket.

    Identical output to the global sort — the oracle recomputes it with
    one — at 1/buckets of the per-task sort footprint.
    """
    h = _mix32(F.col(key_col))
    bucketed = df.withColumn("__h", h).withColumn(
        "__b", F.floor(F.col("__h") * buckets / F.lit(_M32))
    )
    offsets = (
        bucketed.groupBy("__b")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__offset",
            F.sum("__n").over(
                Window.orderBy("__b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("__b", F.coalesce("__offset", F.lit(0)).alias("__offset"))
    )
    w = Window.partitionBy("__b").orderBy("__h", key_col)
    return (
        bucketed.join(F.broadcast(offsets), "__b")
        .withColumn(
            pos_col, (F.col("__offset") + F.row_number().over(w)).cast("long")
        )
        .drop("__h", "__b", "__offset")
    )


def capped_per_group_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """Cap each group at ``cap`` rows, chosen uniformly and DETERMINISTICALLY
    — the per-domain/per-source cap step of a training-data mixture.

    Priority = md5 of the row key: a cryptographic hash of the key is a
    uniform permutation, so taking the cap-smallest priorities per group
    is a uniform without-replacement sample whose membership is a pure
    function of the data (reruns, retries, and repartitionings reproduce
    it exactly — and md5 exists in every engine, so the oracle can
    recompute the identical sample).  One hash shuffle on the group key;
    the per-group sort is bounded by group size, and groups under the
    cap pass through whole.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def upsample_by_factor(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    factors: dict[str, float],
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic fractional upsampling: each row of domain d is
    repeated floor(f_d) times plus one more for a hash-selected f_d -
    floor(f_d) fraction of keys — the mixture UP-weighting step (epochs
    over high-quality domains) dual to :func:`mix_to_proportions`'s
    down-weighting.  Factors below 1 degrade gracefully to
    deterministic sub-sampling (0 or 1 copies); unlisted domains keep
    factor 1.

    Pure codegen: a when-chain for the factor, the hash filter for the
    fractional copy, sequence+explode for the repetition — no RNG, no
    Python, no shuffle (the explode multiplies rows in place).  The
    ``copy_col`` index keeps repeated rows distinguishable downstream
    (e.g. for deterministic epoch shuffling of the expanded corpus).
    """
    fac: Column = F.lit(1.0)
    for d, f in sorted(factors.items()):
        fac = F.when(F.col(domain_col) == d, F.lit(float(f))).otherwise(fac)
    base = F.floor(fac).cast("int")
    extra = (
        hash_bucket(F.col(key_col), 10000) < (fac - F.floor(fac)) * 10000
    ).cast("int")
    copies = base + extra
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(seq))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    fraction: float,
) -> DataFrame:
    """Deterministic weight-proportional sampling: row i is kept with
    probability min(1, fraction * w_i / mean(w)) — expected kept
    fraction equals ``fraction`` while higher-weight rows (e.g. higher
    quality scores in a curation pipeline) are proportionally more
    likely to survive.  The "quality-weighted sampling" step between
    scoring and packing.

    Membership is the Knuth multiplicative hash of ``key_col`` (exactly
    reproducible in any 64-bit-integer engine, partitioning- and
    order-independent — same recipe as :func:`deterministic_sample`),
    so the sample is stable across runs and resumable.  Two passes:
    one map-side-combined mean aggregate broadcast back as a single
    row, then the filtered scan.  The per-row rate is rounded to 6 dp
    in BOTH engines so an ulp of double drift can never flip a
    membership decision at a bucket boundary.
    """
    stats = df.agg(F.avg(F.col(weight_col).cast("double")).alias("__mw"))
    bucket = hash_bucket(F.col(key_col), 10000)
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(fraction)) * F.col(weight_col) / F.col("__mw"),
        )
        * 10000,
        6,
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .filter(bucket < rate)
        .drop("__mw")
    )


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly-k weighted sample PER GROUP (Efraimidis-Sirakis A-ES,
    "Weighted random sampling with a reservoir", IPL 2006 — public
    literature): each row gets key u^(1/w) with u deterministic in
    (0, 1), and the k largest keys per group win.  Unlike
    :func:`weighted_sample` (Bernoulli — kept COUNT varies), this
    returns exactly min(k, group size) rows per group, the shape needed
    when a mixture plan demands a fixed budget per source/language.

    u comes from the Knuth multiplicative hash (exact 64-bit integer
    arithmetic, same recipe as :func:`hash_bucket`) mapped to
    (0, 1] — no RNG state, so the sample is identical across runs,
    partitionings, and engines; the DuckDB oracle replays the exact
    arithmetic.  Selection is one window top-k per group: partial
    TakeOrdered per partition, then one shuffle on the group key — no
    global sort.  Zero/negative weights are clamped to a tiny positive
    mass (they lose to any real weight but remain sample-able in
    all-zero groups).
    """
    u = (
        (F.col(key_col).cast("long") * F.lit(_KNUTH)) % F.lit(_M32)
        + F.lit(1)
    ) / F.lit(float(_M32))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-9))
    key = F.pow(u, F.lit(1.0) / w)
    win = Window.partitionBy(group_col).orderBy(
        F.desc("__res_key"), F.col(key_col)
    )
    return (
        df.withColumn("__res_key", key)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__res_key", "__rn")
    )


def temperature_mixture_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual
    pretraining recipe from the XLM-R / mT5 line of work — public
    literature): group g is sampled with probability p_g proportional to
    (n_g)^alpha, flattening the head and boosting the tail as alpha
    drops below 1.  Returns one row per group with its count, target
    probability, and the per-ROW keep rate that realizes the target at
    equal corpus size (rate_g = p_g * N_total / n_g, capped at 1 —
    upsampling beyond 1 is `upsample_by_factor`'s job).

    |groups|-row output from one map-side-combined count — the planning
    step is corpus-size-independent; feed the rates into
    `deterministic_sample(rates=...)` for the actual membership pass.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    # totals via a window over the |groups|-row count table — keeps the
    # corpus at ONE scan (an agg+crossJoin would re-evaluate the count
    # subtree and scan twice); the unpartitioned window only ever sees
    # |groups| rows, so the single-partition exchange is metadata-sized
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pw = F.pow(F.col("n").cast("double"), F.lit(alpha))
    z = F.sum(pw).over(w)
    big_n = F.sum("n").over(w)
    return counts.select(
        group_col,
        F.col("n").cast("bigint").alias("n"),
        F.round(pw / z, 6).alias("p_target"),
        F.round(
            F.least(F.lit(1.0), pw / z * big_n / F.col("n")), 6
        ).alias("keep_rate"),
    )


def split_by_cluster(
    doc_labels: DataFrame,
    key: str = "doc_id",
    cluster: str = "cluster_id",
    nbuckets: int = 10,
    train_buckets: int = 8,
    val_buckets: int = 1,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a
    deterministic hash of the (near-)duplicate CLUSTER id, not the
    document id, so every member of a duplicate cluster lands in the
    same split — near-copies of a validation document can never leak
    into train.  Emits both the safe label and the naive doc-id label
    so callers can quantify what naive splitting would have leaked.

    Input: (key, cluster) pairs covering every document (singletons map
    to themselves).  Pure codegen expressions on the Knuth hash — no
    extra shuffle beyond what produced the labels; reruns, retries, and
    corpus growth never move an existing cluster between splits (the
    hash depends only on the cluster id), which is what makes the
    split auditable at 100 TB: yesterday's held-out set is still held
    out tomorrow.
    """

    def bucket(col: Column) -> Column:
        # the shared overflow/negative-safe mix — a local re-derivation
        # once omitted the long cast, coercing STRING cluster ids to
        # double (NULL for non-numeric -> every row fell through to the
        # 'test' branch with zero training data and no error).  A
        # non-integral id now fails LOUDLY instead: a mix that returns
        # NULL for a non-NULL id means the cast ate the value
        mixed = _mix32(col)
        checked = F.when(
            col.isNotNull() & mixed.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("split_by_cluster: cluster id "),
                    col.cast("string"),
                    F.lit(" is not integral — hash string ids to a "
                          "bigint (e.g. xxhash64) before splitting"),
                )
            ).cast("long"),
        ).otherwise(mixed)
        return F.floor(
            checked * F.lit(float(nbuckets)) / F.lit(_M32)
        ).cast("int")

    def label(b: Column) -> Column:
        return (
            F.when(b < train_buckets, "train")
            .when(b < train_buckets + val_buckets, "val")
            .otherwise("test")
        )

    return doc_labels.select(
        key,
        cluster,
        label(bucket(F.col(cluster))).alias("split"),
        label(bucket(F.col(key))).alias("naive_split"),
    )


def negative_samples(
    items: DataFrame,
    item_col: str,
    group_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """For every distinct group value, ``k`` deterministic
    pseudo-random negative items (rows whose ``group_col`` differs),
    as ``(group, item, neg_rank)`` — the contrastive-training sampler
    (in-batch negatives' distributed cousin): each retrieval query /
    class label needs reproducible negatives drawn from the rest of
    the corpus.

    Determinism comes from ranking by ``md5(group || '|' || item ||
    salt)`` — a keyed hash both engines compute identically — so the
    sample is stable across runs, partitionings, and engines (no RNG
    state).  Change ``salt`` to draw a fresh sample.

    Scale shape: the distinct-group side is tiny and broadcast; the
    non-equi join fans each item out |groups|−1 times (bounded,
    deliberate — the same small-side pattern as a pivot); the rank
    filter is a ``row_number() <= k`` that Spark's WindowGroupLimit
    rewrites into a per-partition top-k heap BEFORE the group
    exchange, so the shuffle carries ≈ k·|groups| rows per partition,
    not the fanned-out corpus."""
    groups = items.select(
        F.col(group_col).alias("__g")
    ).distinct()
    cand = items.join(
        F.broadcast(groups), F.col(group_col) != F.col("__g")
    )
    w = Window.partitionBy("__g").orderBy(
        F.md5(
            F.concat_ws(
                "|",
                F.col("__g"),
                F.col(item_col).cast("string"),
                F.lit(salt),
            )
        ),
        item_col,
    )
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("__g").alias(group_col),
            F.col(item_col),
            "neg_rank",
        )
    )


def kfold_assign(
    df: DataFrame, key_col: str, k: int = 5, salt: str = "kfold-v1"
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: adds a
    ``fold`` column in [0, k) from the leading 32 bits of
    md5(key || '|' || salt) — a keyed cryptographic hash, so the
    assignment is engine-, partitioning-, and run-stable with no RNG
    state (the q209 determinism contract), any engine can reproduce
    it (``('0x' || substring(md5(...), 1, 8))::BIGINT % k`` in ANSI
    SQL), and fold sizes concentrate at n/k by the hash's uniformity.
    Pure projection — zero shuffle, zero Python; at 100 TB fold
    assignment costs nothing beyond the scan it rides on.  Changing
    ``salt`` yields an independent fold split (repeated CV) without
    re-shuffling data."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return df.withColumn("fold", (h32 % k).cast("int"))


def target_encode_loo(
    df: DataFrame,
    key_cols: list[str],
    target_col: str,
    fold_key_col: str,
    k: int = 5,
    salt: str = "kfold-v1",
    scale: int = 100,
) -> DataFrame:
    """Leakage-free (leave-fold-out) target encoding: the mean of
    ``target_col`` per key computed EXCLUDING each row's own fold —
    the standard high-cardinality categorical feature that, computed
    naively (plain per-key mean), leaks each row's own label into its
    feature and silently inflates validation scores.  Folds come from
    :func:`kfold_assign`'s md5 determinism contract, so the encoding
    is run-/engine-stable and any engine reproduces it.

    The distributed trick: NO per-fold re-aggregation of the corpus —
    one partial-combined pass builds the (key, fold) cell sums, and
    the leave-one-out mean is (key_total − cell) / (key_n − cell_n)
    via window sums over the |keys|·k-row cell table.  Fixed-point
    ``scale`` keeps every numerator/denominator an exact integer, so
    the encoded value is a ratio of exact integers (rounded 4 dp).
    Keys entirely inside one fold get NULL for that fold (no
    out-of-fold data exists — surfaced, not imputed).  Output:
    (key_cols…, fold, n_in_fold, encoded_r).
    """
    from pyspark.sql import Window

    vi = F.floor(F.col(target_col).cast("double") * scale).cast(
        "bigint"
    )
    folded = kfold_assign(df, fold_key_col, k=k, salt=salt)
    cells = folded.groupBy(*key_cols, "fold").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(vi).alias("__s"),
    )
    wk = Window.partitionBy(*key_cols)
    loo_n = F.sum("__n").over(wk) - F.col("__n")
    loo_s = F.sum("__s").over(wk) - F.col("__s")
    return cells.select(
        *key_cols,
        "fold",
        F.col("__n").cast("bigint").alias("n_in_fold"),
        F.when(
            loo_n > 0,
            F.round(loo_s.cast("double") / loo_n / scale, 4),
        ).alias("encoded_r"),
    )


def split_exact_stratified(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Train/val/test assignment with EXACT per-stratum proportions:
    rows are ranked within each stratum by md5(id|salt) — a
    deterministic pseudo-random order with no RNG state (the
    q209/q223 contract) — and assigned by POSITION against cumulative
    fraction thresholds (rank ≤ ceil(f₁·n) → first split, etc.), so
    every stratum's split sizes are exact to ±1 row, where the hash-
    modulo split (`kfold_assign`, q223) is only exact in expectation
    (a 50-doc language can land 13/2/35 by hash luck — fatal for a
    small eval slice).

    The cost of exactness is one per-stratum ordered window (rank by
    hash) — strata sort independently in parallel; the hash-modulo
    split stays the zero-shuffle choice when approximate proportions
    are fine.  Output: input columns + ``split``.
    """
    from pyspark.sql import Window

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    h = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(id_col))
    wall = Window.partitionBy(*strata_cols)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wall)
    expr = None
    # accumulate thresholds in exact rationals: float accumulation
    # makes 0.1+0.1+0.1 = 0.30000000000000004, shifting a ceil(cum*n)
    # boundary by one row vs an engine replaying ceil(0.3*n)
    from fractions import Fraction

    cum_frac = Fraction(0)
    names = list(fractions)
    for name in names[:-1]:
        cum_frac += Fraction(fractions[name]).limit_denominator(10**9)
        cum = float(cum_frac)
        cond = rn <= F.ceil(F.lit(cum) * n).cast("int")
        expr = F.when(cond, name) if expr is None else expr.when(
            cond, name
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)
