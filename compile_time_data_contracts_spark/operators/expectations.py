"""Value-level data expectations: the runtime counterpart of the schema
contracts (contracts/ proves SHAPE before data moves; these prove the
DATA itself on the way through).

Each expectation compiles to plain aggregates/anti-joins, so a whole
suite evaluates in one or two passes with map-side combine — at 100 TB
the cost is scan cost, and the scan can be the one the pipeline already
makes.  The report is one row per rule: (rule, column, metric, bound,
passed), so a gate is `report.filter(~passed).count() == 0`.
"""

from __future__ import annotations

import dataclasses
import typing

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Expect",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "row_count_between",
    "evaluate_expectations",
    "apply_expectations",
    "ref_integrity_report",
    "k_anonymity_publish",
    "pseudonymize",
]


@dataclasses.dataclass(frozen=True)
class Expect:
    """One declarative rule: ``metric`` is an aggregate Column producing
    the observed value; ``passed`` is a boolean expression over it.

    ``row_ok`` — for ROW-LEVEL rules, a boolean Column that is true for
    rows satisfying the rule; :func:`apply_expectations` uses it to
    route failing rows to quarantine.  Table-level rules (unique,
    row_count_between) have no per-row blame and leave it None."""

    rule: str
    column: str
    metric: "F.Column"
    bound: str
    check: typing.Callable[["F.Column"], "F.Column"]
    row_ok: typing.Optional["F.Column"] = None


def not_null(col: str, max_null_frac: float = 0.0) -> Expect:
    """Null fraction of ``col`` must not exceed ``max_null_frac``.

    Row routing (:func:`apply_expectations`) is strict: every null row
    is quarantined even when the AGGREGATE tolerance would pass —
    tolerance gates pipelines, routing cleans rows."""
    m = (
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("double")
        / F.count(F.lit(1))
    )
    return Expect(
        "not_null", col, m, f"<= {max_null_frac}",
        lambda v: v <= max_null_frac,
        row_ok=F.col(col).isNotNull(),
    )


def unique(col: str) -> Expect:
    """``col`` must be unique: distinct count equals row count.
    Table-level — no per-row blame (which duplicate is 'the bad one' is
    a dedup policy, see keep_best_dedup), so not routable."""
    m = (F.count(F.lit(1)) - F.countDistinct(F.col(col))).cast("double")
    return Expect("unique", col, m, "== 0", lambda v: v == 0)


def in_range(col: str, lo: float, hi: float) -> Expect:
    """Every non-null value of ``col`` within [lo, hi]."""
    m = F.sum(
        F.when(~F.col(col).between(lo, hi), 1).otherwise(0)
    ).cast("double")
    return Expect(
        "in_range", col, m, f"0 outside [{lo}, {hi}]", lambda v: v == 0,
        row_ok=F.col(col).isNull() | F.col(col).between(lo, hi),
    )


def accepted_values(col: str, values: list) -> Expect:
    """Every non-null value of ``col`` drawn from ``values``."""
    m = F.sum(
        F.when(
            F.col(col).isNotNull() & ~F.col(col).isin(values), 1
        ).otherwise(0)
    ).cast("double")
    return Expect(
        "accepted_values", col, m, "0 outside set", lambda v: v == 0,
        row_ok=F.col(col).isNull() | F.col(col).isin(values),
    )


def row_count_between(lo: int, hi: int) -> Expect:
    """Table row count within [lo, hi] (freshness / completeness gate).
    Table-level — not routable."""
    m = F.count(F.lit(1)).cast("double")
    return Expect(
        "row_count_between", "*", m, f"[{lo}, {hi}]",
        lambda v: (v >= lo) & (v <= hi),
    )


def evaluate_expectations(
    df: DataFrame, expectations: list[Expect]
) -> DataFrame:
    """Evaluate a rule suite in ONE aggregate pass over ``df`` (every
    metric is an aggregate column of the same `agg`, so Spark computes
    them together with map-side combine — rule count adds columns, not
    scans), then explode the single metrics row into the per-rule
    report (rule, column, metric, bound, passed)."""
    metrics = df.agg(
        *[e.metric.alias(f"__m{i}") for i, e in enumerate(expectations)]
    )
    reports = [
        F.struct(
            F.lit(e.rule).alias("rule"),
            F.lit(e.column).alias("column"),
            F.round(F.col(f"__m{i}"), 6).alias("metric"),
            F.lit(e.bound).alias("bound"),
            e.check(F.col(f"__m{i}")).alias("passed"),
        )
        for i, e in enumerate(expectations)
    ]
    return metrics.select(
        F.explode(F.array(*reports)).alias("r")
    ).select("r.rule", "r.column", "r.metric", "r.bound", "r.passed")


def apply_expectations(
    df: DataFrame,
    expectations: list[Expect],
    quarantine_sink=None,
    policy=None,
) -> tuple[DataFrame, DataFrame]:
    """Row-level expectation ROUTING: split ``df`` into (clean,
    quarantined) on the rules' per-row predicates, optionally writing
    the quarantined rows through a contract-pinned sink.

    Real pipelines don't just *report* rule failures
    (:func:`evaluate_expectations`) — they route failing rows to a
    quarantine table carrying WHY each row failed, so the clean
    partition flows on and the reject partition is re-driveable after
    a fix.  Every rule must be row-routable (``row_ok`` set);
    table-level rules (unique, row_count_between) raise — evaluate
    those with evaluate_expectations, they have no per-row blame.

    Returns ``(clean, quarantined)``: ``clean`` keeps ``df``'s exact
    schema; ``quarantined`` appends ``failed_rules`` —
    array<string> of '<rule>:<column>' labels, never empty, sorted for
    determinism.  Both derive from ONE predicate evaluation per rule
    inside the same projection (the split is two filters over the same
    scan; at 100 TB the router costs one pass, and a persisted input
    amortizes the two branches).

    ``quarantine_sink``: an optional :class:`..sources.io.Sink` whose
    contract describes the quarantine schema (source columns +
    failed_rules) — the write goes through ``write_df``'s policy pin
    (the reference's policy-aware sink pattern, SparkCore.scala:355-360),
    so a drifted quarantine table is rejected before any row lands.
    The write is EAGER (it is the point of the call); the returned
    frames stay lazy.
    """
    if not expectations:
        raise ValueError(
            "apply_expectations needs at least one rule — an empty "
            "suite would route nothing and quarantine nothing"
        )
    not_routable = [e for e in expectations if e.row_ok is None]
    if not_routable:
        raise ValueError(
            "apply_expectations needs row-routable rules; table-level "
            f"rules {[e.rule for e in not_routable]} have no per-row "
            "blame — gate them with evaluate_expectations instead"
        )
    # concat of per-rule 0/1-element arrays (not when(...).otherwise(null)
    # + filter): keeps the element type containsNull=false, so the
    # quarantine contract can declare list[str] under the strict nested
    # comparator
    from pyspark.sql.types import ArrayType, StringType

    # DDL "array<string>" would default containsNull=true — be explicit
    empty = F.array().cast(ArrayType(StringType(), False))
    labels = F.array_sort(
        F.concat(
            *[
                F.when(
                    ~e.row_ok, F.array(F.lit(f"{e.rule}:{e.column}"))
                ).otherwise(empty)
                for e in expectations
            ]
        )
    )
    flagged = df.withColumn("failed_rules", labels)
    clean = flagged.filter(F.size("failed_rules") == 0).drop(
        "failed_rules"
    )
    quarantined = flagged.filter(F.size("failed_rules") > 0)
    if quarantine_sink is not None:
        from ..contracts.policies import SchemaPolicy
        from ..sources.io import write_df

        write_df(
            quarantined,
            quarantine_sink,
            policy if policy is not None else SchemaPolicy.EXACT_UNORDERED_CI,
        )
    return clean, quarantined


def ref_integrity_report(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
) -> DataFrame:
    """Referential integrity as a left-anti join: count of child rows
    whose ``fk`` has no match in ``parent.pk``.  The anti-join
    broadcasts when the parent is dimension-sized and shuffles on the
    key otherwise — never more than one pass over the child.  Output
    shape matches `evaluate_expectations` so the reports union."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("double").alias("__m")
    ).select(
        F.lit("ref_integrity").alias("rule"),
        F.lit(fk).alias("column"),
        F.round(F.col("__m"), 6).alias("metric"),
        F.lit("0 orphans").alias("bound"),
        (F.col("__m") == 0).alias("passed"),
    )


def k_anonymity_publish(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 5,
    scale: int = 100,
) -> DataFrame:
    """k-anonymity gate for published aggregates: group means are
    released ONLY for groups with at least ``k`` members; smaller
    groups collapse into one ``__suppressed__`` rollup row carrying
    their group count and total row count but NO value statistic —
    the minimum-cell-size rule every data-release policy starts with
    (a mean over 2 rows plus knowledge of 1 discloses the other).

    One partial-combined aggregate per group, then a |groups|-row
    split — publish vs suppress — with the suppressed side
    re-aggregated to a single row: cost is the scan at any scale, and
    the suppressed MASS is surfaced (no silent truncation — the
    q188/q201 reporting discipline).  Output: (group_cols… as
    strings, n, avg_r) with avg_r NULL on the rollup row.
    """
    vi = F.floor(F.col(value_col).cast("double") * scale).cast(
        "bigint"
    )
    per = df.select(
        *[F.col(c).cast("string").alias(c) for c in group_cols],
        vi.alias("__v"),
    ).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__v").alias("__s"),
    )
    ok = per.filter(F.col("n") >= k).select(
        *group_cols,
        "n",
        F.round(F.col("__s").cast("double") / F.col("n") / scale, 4)
        .alias("avg_r"),
    )
    suppressed = per.filter(F.col("n") < k).agg(
        F.sum("n").cast("bigint").alias("n")
    ).select(
        *[F.lit("__suppressed__").alias(c) for c in group_cols],
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("avg_r"),
    )
    return ok.unionByName(suppressed)


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    prefix: str = "anon_",
    hex_chars: int = 16,
) -> DataFrame:
    """Deterministic keyed pseudonymization: each value in ``cols`` is
    replaced by ``prefix`` + the first ``hex_chars`` hex of
    md5(salt|value) — the privacy transform that PRESERVES REFERENTIAL
    INTEGRITY: the same key pseudonymizes identically in every table
    (joins, group-bys, and distinct counts survive), unlike q64's
    redaction (which destroys the value) or random tokenization (which
    needs a shared lookup table — a distributed-state liability this
    pure projection avoids).  NULLs stay NULL.

    Privacy contract honestly stated: this is PSEUDONYMIZATION, not
    anonymization — anyone holding the salt can replay the mapping
    (that is the point: the salt is the revocation/linkage secret),
    and small value domains are dictionary-attackable by design of any
    deterministic scheme; rotate the salt per release and pair with
    :func:`k_anonymity_publish` for published aggregates.  Zero
    shuffle, zero Python, costs the scan it rides on; 64 hash bits
    make collisions across 10^8 keys a ~3e-4 event (birthday bound) —
    raise ``hex_chars`` for larger key spaces.
    """
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.concat(
                    F.lit(prefix),
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.lit(salt), F.col(c).cast("string")
                            )
                        ),
                        1,
                        hex_chars,
                    ),
                ),
            ),
        )
    return out


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit — the companion check k-anonymity
    (:func:`k_anonymity_publish`) cannot make: a group can be
    k-anonymous yet leak its sensitive attribute completely if every
    member SHARES the value (the homogeneity attack, Machanavajjhala
    et al. ICDE 2006).  For each quasi-identifier group this reports
    group size, the number of DISTINCT sensitive values (distinct
    l-diversity), and whether the group meets the ``l`` threshold —
    release tooling then suppresses or generalizes the failing
    groups.

    One partial-combined two-level aggregate (exact distinct via
    (qi, sensitive) pre-group, so no count_distinct shuffle
    explosion); output is |groups|-row.  Returns
    (*quasi_cols, group_size, l_distinct, meets_l).
    """
    pre = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col)
    ).agg(F.count(F.lit(1)).alias("__n"))
    return (
        pre.groupBy(*quasi_cols)
        .agg(
            F.sum("__n").cast("bigint").alias("group_size"),
            F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        )
        .withColumn("meets_l", F.col("l_distinct") >= l)
    )


def erasure_audit(
    frames: dict[str, tuple[DataFrame, str]],
    erase_keys: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Right-to-erasure (GDPR Art. 17) cascade audit: given a set of
    subject keys to erase and a dict of ``table_name -> (frame,
    subject_key_col)``, report — per table — how many rows the purge
    removes, how many remain, and whether the post-purge frame still
    references any erased key (``residual_refs``, which is 0 by
    construction for an anti-join purge; the column exists so the
    audit PROVES it rather than asserts it, the reference's
    policy-pin discipline: SparkCore.scala:355-360).

    Each table costs one broadcast semi/anti-join pass (the erase set
    is subject-sized, i.e. tiny next to fact tables) + one
    conditional-sum scan; tables are unioned into one
    |tables|-row report.  The purge itself is the same anti-join the
    audit counts — run :func:`~..operators.merge` style rewrites per
    partition to materialize it.
    """
    keys = erase_keys.select(F.col(key_col).alias("__ek")).distinct()
    reports = []
    for name, (frame, col) in frames.items():
        marked = frame.join(
            F.broadcast(keys),
            frame[col] == keys["__ek"],
            "left",
        )
        purged = frame.join(
            F.broadcast(keys), frame[col] == keys["__ek"], "left_anti"
        )
        residual = purged.join(
            F.broadcast(keys), purged[col] == keys["__ek"], "left_semi"
        )
        reports.append(
            marked.agg(
                F.sum(F.col("__ek").isNotNull().cast("long"))
                .cast("bigint")
                .alias("rows_purged"),
                F.sum(F.col("__ek").isNull().cast("long"))
                .cast("bigint")
                .alias("rows_retained"),
            ).select(
                F.lit(name).alias("table_name"),
                "rows_purged",
                "rows_retained",
            ).crossJoin(
                residual.agg(
                    F.count(F.lit(1)).cast("bigint").alias("residual_refs")
                )
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def filter_funnel(
    df: DataFrame, rules: list[tuple[str, "F.Column"]]
) -> DataFrame:
    """Sequential filter-funnel report: how many rows survive each
    successive rule when rules apply in ORDER — the observability
    layer every curation pipeline needs before it trusts a combined
    keep-flag (q137's ANDed gopher_keep says 40% survived; the funnel
    says WHICH rule took the other 60%).

    One conditional-sum pass computes every cumulative-AND count in a
    single scan (no per-stage jobs, no re-reads); the |rules|-row
    report is then unpivoted from the 1-row aggregate, so the cost at
    100 TB is exactly one read of the input regardless of rule count.
    Returns (stage, rule, n_in, n_out, n_dropped) with stage 1-based
    and n_in of stage k = n_out of stage k-1.
    """
    if not rules:
        raise ValueError("filter_funnel needs at least one rule")
    cum = None
    aggs = [F.count(F.lit(1)).alias("__c0")]
    for i, (_, cond) in enumerate(rules, start=1):
        cum = cond if cum is None else (cum & cond)
        aggs.append(F.sum(cum.cast("long")).alias(f"__c{i}"))
    one = df.agg(*aggs)
    stages = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage"),
                F.lit(name).alias("rule"),
                F.col(f"__c{i - 1}").cast("bigint").alias("n_in"),
                F.col(f"__c{i}").cast("bigint").alias("n_out"),
                (F.col(f"__c{i - 1}") - F.col(f"__c{i}"))
                .cast("bigint")
                .alias("n_dropped"),
            )
            for i, (name, _) in enumerate(rules, start=1)
        ]
    )
    return one.select(F.explode(stages).alias("s")).select("s.*")
