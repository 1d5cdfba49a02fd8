"""Contract-pinned IO surface: typed source/sink round-trips across formats,
schema evolution, MERGE/SCD2, expectations + quarantine, snapshot diff,
compaction.

Split from the original single-module inventory (round 5); registration
order within a tier is preserved, and all modules share the `_shared`
registry so `queries()` / `oracle_sql()` stay the single assembly point.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401


# =========================================================================
# Scans / sources / sinks (Q01-Q04)
# =========================================================================

@q("q01_parquet_count", "SELECT count(*) AS n FROM lineitem")
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "lineitem").agg(F.count("*").alias("n"))


@q(
    "q02_csv_roundtrip",
    """SELECT count(*) AS n_rows, count(c_acctbal) AS n_acctbal
       FROM customer""",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    """Reference demo path (CtdcPoc.scala:114): CSV read with explicit
    contract schema, never inferred.  Round-trips customer through CSV."""
    from ..catalog import Customer
    from ..sources.io import Source, read_df

    path = "/tmp/ctdc_q02_customer_csv"
    load_table(spark, sf, "customer").write.mode("overwrite").option(
        "header", "true"
    ).csv(path)
    df = read_df(spark, Source(Customer, "csv", path, {"header": "true"}))
    return df.agg(
        F.count("*").alias("n_rows"), F.count("c_acctbal").alias("n_acctbal")
    )


@q(
    "q03_json_scan",
    """SELECT count(*) AS n,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
       FROM events""",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    parsed = ev.withColumn("k", F.from_json(F.col("props"), "k INT")["k"])
    return parsed.agg(
        F.count("*").alias("n"), F.sum("k").cast("bigint").alias("sum_k")
    )


@q("q04_parquet_sink_roundtrip", "SELECT r_regionkey, r_name FROM region")
def q04(spark: SparkSession, sf: str) -> DataFrame:
    """Contract-pinned parquet sink + re-read (R3, SparkCore.scala:355-360)."""
    from ..catalog import Region
    from ..sources.io import Sink, write_df

    df = load_table(spark, sf, "region")
    path = "/tmp/ctdc_q04_region_parquet"
    write_df(df, Sink(Region, path), SchemaPolicy.EXACT)
    return spark.read.parquet(path).select("r_regionkey", "r_name")


@q(
    "q52_multimodal_contract",
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
              source AS meta_source
       FROM documents""",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """Nested struct/map/array column built, contract-validated
    (exercises derivation + deep comparator on nested types), written to
    parquet, re-read, flattened."""
    from dataclasses import dataclass
    from typing import Optional

    from ..contracts.shape import contract as contract_deco
    from ..contracts.types import int32
    from ..runtime.pins import assert_matches_contract
    from ..contracts.schema import spark_schema

    @contract_deco
    @dataclass
    class DocEnvelope:
        doc_id: int
        # map_from_arrays marks values nullable -> valueContainsNull=True,
        # which the strict comparator checks; the contract must say so
        meta: dict[str, Optional[str]]
        tokens: list[str]
        n_tokens: int32

    docs = load_table(spark, sf, "documents")
    enveloped = docs.select(
        F.col("doc_id"),
        F.map_from_arrays(
            F.array(F.lit("lang"), F.lit("source")),
            F.array(F.col("lang"), F.col("source")),
        ).alias("meta"),
        F.split("text", " ").alias("tokens"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    # containsNull/valueContainsNull come back False from these builders,
    # matching the strict contract
    assert_matches_contract(
        enveloped.schema, spark_schema(DocEnvelope), SchemaPolicy.EXACT,
        context="q52 envelope",
    )
    path = "/tmp/ctdc_q52_envelope_parquet"
    enveloped.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.select(
        "doc_id",
        F.col("n_tokens"),
        F.element_at("meta", "source").alias("meta_source"),
    )


@q(
    "q92_orc_roundtrip",
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    """ORC source/sink round-trip under the same contract pin as parquet
    (R1/R3 generalize over DataSource formats): documents written as
    ORC, re-read with the explicit contract schema (never inferred),
    aggregated.  The oracle aggregates the original parquet — equality
    proves the round-trip is lossless."""
    from ..catalog import Documents
    from ..sources.io import Sink, Source, read_df, write_df

    docs = load_table(spark, sf, "documents")
    path = "/tmp/ctdc_q92_documents_orc"
    write_df(docs, Sink(Documents, path, format="orc"), SchemaPolicy.EXACT)
    back = read_df(spark, Source(Documents, "orc", path))
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@q(
    "q94_json_sink_roundtrip",
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    """JSON-lines sink + contract-pinned re-read (the interchange format
    for pipeline handoffs): same format-generic Source/Sink path as
    parquet/ORC, explicit schema on the re-read — no inference job ever
    runs.  Oracle aggregates the original parquet; equality proves the
    JSON round-trip is lossless for this contract."""
    from ..catalog import Documents
    from ..sources.io import Sink, Source, read_df, write_df

    docs = load_table(spark, sf, "documents")
    path = "/tmp/ctdc_q94_documents_json"
    write_df(docs, Sink(Documents, path, format="json"), SchemaPolicy.EXACT)
    back = read_df(spark, Source(Documents, "json", path))
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@q(
    "q95_csv_sink_roundtrip",
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    """CSV sink + contract-pinned re-read, completing the format matrix
    (CSV/JSON read since q02/q03; parquet/ORC/JSON/CSV write).  Reads
    are PERMISSIVE by design (malformed cells become nulls — faithful
    to the reference's schema-level-only pin), which the lossless
    aggregate equality implicitly re-checks here."""
    from ..catalog import Documents
    from ..sources.io import Sink, Source, read_df, write_df

    docs = load_table(spark, sf, "documents")
    path = "/tmp/ctdc_q95_documents_csv"
    write_df(
        docs,
        Sink(Documents, path, format="csv", options={"header": "true"}),
        SchemaPolicy.EXACT,
    )
    back = read_df(
        spark, Source(Documents, "csv", path, {"header": "true"})
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@q(
    "q115_policy_evolution_roundtrip",
    """SELECT segment, CAST(count(*) AS BIGINT) AS n,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(28, 8))), 2)
                    AS DOUBLE) AS total_r
       FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                    substr(o_orderpriority, 1, 1) AS segment
             FROM orders)
       GROUP BY segment""",
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolution round-trip under the subset policies — the
    reference's own Backward/Forward scenario
    (SparkRuntimeSpec.scala:189-343) run end-to-end on real data:

      1. the producer frame carries an EXTRA column (``extra_flag``) and
         OMITS the consumer contract's defaulted field
         (``priority_note: str = "NONE"``) — the BACKWARD pin on the
         sink accepts both (extras allowed; absence allowed iff
         nullable or ctdc.hasDefault, SparkCore.scala:105-116),
      2. the written parquet is re-read self-describing and pinned
         FORWARD against a wider reader contract: every written column
         must exist in the reader's expectation
         (SparkCore.scala:118-127),
      3. the returned aggregate is oracle-checked on the data content,
         so the evolution dance provably loses no rows/values.
    """
    import dataclasses
    import hashlib
    import tempfile

    from ..contracts.schema import spark_schema
    from ..contracts.shape import contract
    from ..runtime.pins import assert_matches_contract
    from ..sources.io import Sink, write_df

    @contract
    @dataclasses.dataclass
    class OrderEvolved:  # consumer contract (v2): adds a defaulted field
        o_orderkey: int
        o_custkey: int
        o_totalprice: float
        segment: str
        extra_flag: int
        priority_note: str = "NONE"

    @contract
    @dataclasses.dataclass
    class OrderReader:  # forward reader: superset of every written column
        o_orderkey: int
        o_custkey: int
        o_totalprice: float
        segment: str
        extra_flag: int
        priority_note: typing.Optional[str]
        audit_tag: typing.Optional[str]

    orders = load_table(spark, sf, "orders")
    produced = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.substring("o_orderpriority", 1, 1).alias("segment"),
        F.lit(1).cast("long").alias("extra_flag"),
    )
    tag = hashlib.md5(f"{sf}|q115".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/ctdc-q115-{tag}"
    # Backward: priority_note (defaulted) absent from the produced frame
    write_df(produced, Sink(OrderEvolved, path), SchemaPolicy.BACKWARD)
    back = spark.read.parquet(path)
    # Forward: every column that reached storage exists in the reader
    assert_matches_contract(
        back.schema,
        spark_schema(OrderReader),
        SchemaPolicy.FORWARD,
        context=f"q115 forward read {path}",
    )
    return back.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2
        ).cast("double").alias("total_r"),
    )


@q(
    "q120_text_source_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(length(text)) AS BIGINT) AS total_chars
       FROM documents""",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    """Raw-text source/sink round-trip — the ingestion format LLM
    corpora actually arrive in (one document per line).  Writes the
    corpus as .txt, re-reads with spark.read.text (no schema inference
    possible or needed: one string column), and proves the round-trip
    loses no lines or characters against the parquet original.  Text
    scans split by line across tasks, so ingestion parallelism is
    file-size-, not file-count-, bound."""
    import hashlib
    import tempfile

    docs = load_table(spark, sf, "documents")
    tag = hashlib.md5(f"{sf}|q120".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/ctdc-q120-{tag}"
    docs.select("text").write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    return lines.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
    )


@q(
    "q121_python_datasource",
    """SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN ((id * 2654435761) % 4294967296)
                                 < 2147483648 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_low
       FROM generate_series(0, 9999) t(id)""",
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    """Custom PYTHON DATA SOURCE (pyspark 4 DataSource API): a
    deterministic synthetic generator registered as a real format —
    ``spark.read.format("ctdc_synth")`` — with proper partition
    planning (each InputPartition generates its own id range, so the
    source parallelizes like any file source; no driver materialization).
    The oracle regenerates the identical rows from generate_series.
    This is the extension point for reading systems Spark has no
    built-in connector for."""
    from ..sources.pysource import register_synth_source

    register_synth_source(spark)
    df = (
        spark.read.format("ctdc_synth")
        .option("n", "10000")
        .option("partitions", "8")
        .load()
    )
    return df.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("hash32") < 2147483648, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low"),
    )


@q(
    "q127_xml_source_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(length(text)) AS BIGINT) AS total_chars,
              CAST(sum(n_chars) AS BIGINT) AS total_n_chars
       FROM documents""",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    """XML source/sink round-trip (Spark 4 ships the XML format
    natively): documents write as <doc> rows and read back with an
    explicit schema — entity escaping in the writer must round-trip
    text content losslessly, proven by character-count conservation
    against the parquet original."""
    import hashlib
    import tempfile

    docs = load_table(spark, sf, "documents")
    tag = hashlib.md5(f"{sf}|q127".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/ctdc-q127-{tag}"
    docs.select("doc_id", "text", "n_chars").write.mode("overwrite").format(
        "xml"
    ).option("rootTag", "docs").option("rowTag", "doc").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, text string, n_chars long")
        .load(path)
    )
    return back.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum("n_chars").cast("bigint").alias("total_n_chars"),
    )


@q(
    "q133_merge_upsert",
    """WITH updates AS (
         SELECT c_custkey, c_name, c_nationkey,
                round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey % 10 = 0
         UNION ALL
         SELECT 900000 + r_regionkey, 'new-' || r_name,
                r_regionkey, 0.0, 'NEW'
         FROM region),
       merged AS (
         SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
                coalesce(u.c_name, c.c_name) AS c_name,
                coalesce(u.c_nationkey, c.c_nationkey) AS c_nationkey,
                coalesce(u.c_acctbal, round(c.c_acctbal, 2)) AS c_acctbal,
                coalesce(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
         FROM customer c FULL OUTER JOIN updates u
           ON c.c_custkey = u.c_custkey)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN c_mktsegment = 'NEW' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_inserted,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal
       FROM merged""",
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE / upsert (SCD type-1) expressed Spark-first: without a
    transactional table format, the merge is a FULL OUTER JOIN on the
    key — matched rows take the update's values, unmatched-source rows
    insert, unmatched-target rows carry forward — then an atomic
    overwrite of the snapshot.  The join shuffles both sides by key
    once (at 100 TB: partition the snapshot by key-bucket and only
    rewrite buckets containing updates — the updates-side bucket list
    prunes the rest; q136 + ``operators.merge.merge_upsert`` implement
    exactly that and match this query's aggregate).  Updates here are
    derived deterministically from the data so the oracle replays the
    identical merge."""
    cust = load_table(spark, sf, "customer")
    region = load_table(spark, sf, "region")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        region.select(
            (F.lit(900000) + F.col("r_regionkey")).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("r_name")).alias("c_name"),
            F.col("r_regionkey").cast("long").alias("c_nationkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    u = updates.alias("u")
    c = cust.alias("c")
    merged = c.join(
        u, F.col("c.c_custkey") == F.col("u.c_custkey"), "full_outer"
    ).select(
        F.coalesce(F.col("u.c_custkey"), F.col("c.c_custkey")).alias(
            "c_custkey"
        ),
        F.coalesce(F.col("u.c_name"), F.col("c.c_name")).alias("c_name"),
        F.coalesce(F.col("u.c_nationkey"), F.col("c.c_nationkey")).alias(
            "c_nationkey"
        ),
        F.coalesce(
            F.col("u.c_acctbal"), F.round(F.col("c.c_acctbal"), 2)
        ).alias("c_acctbal"),
        F.coalesce(F.col("u.c_mktsegment"), F.col("c.c_mktsegment")).alias(
            "c_mktsegment"
        ),
    )
    return merged.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("c_mktsegment") == "NEW", 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
    )


@q(
    "q134_scd2_history",
    """WITH updates AS (
         SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
         FROM customer WHERE c_custkey % 10 = 0),
       expired AS (
         SELECT c.c_custkey, round(c.c_acctbal, 2) AS bal,
                0 AS valid_from, 1 AS valid_to
         FROM customer c JOIN updates u ON c.c_custkey = u.c_custkey),
       current_v AS (
         SELECT c.c_custkey,
                coalesce(u.new_bal, round(c.c_acctbal, 2)) AS bal,
                CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END
                  AS valid_from,
                CAST(NULL AS INT) AS valid_to
         FROM customer c LEFT JOIN updates u
           ON c.c_custkey = u.c_custkey),
       history AS (
         SELECT * FROM expired UNION ALL SELECT * FROM current_v)
       SELECT CAST(count(*) AS BIGINT) AS n_history,
              CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_current,
              CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_expired,
              CAST(round(sum(CASE WHEN valid_to IS NULL
                                  THEN CAST(bal AS DECIMAL(18, 2))
                                  ELSE CAST(0 AS DECIMAL(18, 2)) END), 2)
                   AS DOUBLE) AS current_bal
       FROM history""",
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    """SCD TYPE-2 history build (q133's type-1 sibling): an update batch
    EXPIRES the matched rows (valid_to set to the batch version) and
    appends the new versions as current (valid_to NULL); untouched rows
    stay current at their original version.  One left join + one union
    — at scale the history table is partitioned by valid_from so each
    batch appends one partition and expires in place only the buckets
    carrying updates.  The version columns are batch ordinals here;
    production uses the batch timestamp."""
    cust = load_table(spark, sf, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.round(F.col("bal") + 100.0, 2).alias("new_bal")
    )
    expired = cust.join(updates, "c_custkey").select(
        "c_custkey",
        "bal",
        F.lit(0).alias("valid_from"),
        F.lit(1).alias("valid_to"),
    )
    current = cust.join(updates, "c_custkey", "left").select(
        "c_custkey",
        F.coalesce(F.col("new_bal"), F.col("bal")).alias("bal"),
        F.when(F.col("new_bal").isNull(), 0).otherwise(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    history = expired.unionByName(current)
    return history.agg(
        F.count("*").cast("bigint").alias("n_history"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_current"),
        F.sum(F.when(F.col("valid_to").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_expired"),
        F.round(
            F.sum(
                F.when(
                    F.col("valid_to").isNull(),
                    F.col("bal").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("current_bal"),
    )


@q(
    "q136_bucket_pruned_merge",
    """WITH updates AS (
         SELECT c_custkey, c_name, c_nationkey,
                round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey % 10 = 0
         UNION ALL
         SELECT 900000 + r_regionkey, 'new-' || r_name,
                r_regionkey, 0.0, 'NEW'
         FROM region),
       merged AS (
         SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
                coalesce(u.c_name, c.c_name) AS c_name,
                coalesce(u.c_nationkey, c.c_nationkey) AS c_nationkey,
                coalesce(u.c_acctbal, round(c.c_acctbal, 2)) AS c_acctbal,
                coalesce(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
         FROM customer c FULL OUTER JOIN updates u
           ON c.c_custkey = u.c_custkey)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN c_mktsegment = 'NEW' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_inserted,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal
       FROM merged""",
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    """The bucket-pruned MERGE q133's docstring promises, executed for
    real: the customer snapshot is written partitioned by
    pmod(xxhash64(key), 64), the SAME update batch as q133 is merged via
    ``merge_upsert`` — reading and rewriting ONLY the buckets carrying
    updated keys (PartitionFilters directory pruning + dynamic partition
    overwrite; untouched buckets stay byte-identical, asserted by test)
    — and the post-merge snapshot must aggregate identically to q133's
    full-outer rewrite, which is exactly what the oracle recomputes.
    The snapshot persists behind a content fingerprint (the feed/index
    convention): the MERGE here is IDEMPOTENT — updates derive from the
    immutable customer table and apply replace-by-key, so the
    post-merge snapshot is a fixed point and re-merging on a reused
    snapshot reproduces the identical state.  The merge itself
    (bucket-pruned read + 2-of-64 directory rewrite) still executes on
    every call — reuse removes only the redundant fresh 64-bucket
    snapshot build; a changed source rebuilds.  meta.json is written
    only AFTER the first merge completes and records the post-merge row
    count; the reuse path re-verifies that count against the on-disk
    snapshot (parquet footers — cheap), so a crash mid-merge (dynamic
    partition overwrite is atomic per directory, not across the 2
    rewritten buckets) leaves either no meta or a count mismatch, and
    the next call rebuilds instead of silently merging onto a
    partially merged baseline."""
    import hashlib
    import json
    import os
    import tempfile

    from ..operators.merge import merge_upsert, snapshot_read, snapshot_write

    cust = load_table(spark, sf, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    region = load_table(spark, sf, "region")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        region.select(
            (F.lit(900000) + F.col("r_regionkey")).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("r_name")).alias("c_name"),
            F.col("r_regionkey").cast("long").alias("c_nationkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    fp_row = cust.agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal"),
        F.max("c_custkey").alias("mx"),
    ).first()
    want = {
        "n": int(fp_row["n"]), "bal": str(fp_row["bal"]),
        "mx": int(fp_row["mx"]), "version": 2,
    }
    tag = hashlib.md5(f"{sf}|merge64".encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ctdc-merge-{tag}")
    path = os.path.join(root, "snap")
    meta_path = os.path.join(root, "meta.json")
    try:
        with open(meta_path) as fh:
            have = json.load(fh)
    except (OSError, ValueError):
        have = None
    def _snapshot_count_matches() -> bool:
        # on-disk integrity: a crash between the two bucket rewrites of
        # a previous merge leaves a fingerprint-valid but partially
        # merged snapshot — the post-merge row count catches it.  A
        # missing/corrupt snapshot under a surviving meta.json (e.g. a
        # /tmp reaper deleted the older data files but kept the newer
        # meta) must read as NOT REUSABLE, not crash the gate
        from pyspark.errors import AnalysisException

        try:
            return snapshot_read(spark, path).count() == have.get(
                "merged_n"
            )
        except AnalysisException:
            return False

    reuse = (
        have is not None
        and {k: have.get(k) for k in want} == want
        and _snapshot_count_matches()
    )
    if not reuse:
        os.makedirs(root, exist_ok=True)
        snapshot_write(cust, path, "c_custkey", num_buckets=64)
    merge_upsert(spark, path, updates)
    merged = snapshot_read(spark, path)
    if not reuse:
        # meta written LAST — only a fully merged snapshot is reusable
        with open(meta_path, "w") as fh:
            json.dump({**want, "merged_n": merged.count()}, fh)
    return merged.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("c_mktsegment") == "NEW", 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
    )


@q(
    "q140_observe_scan_metrics",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(round(sum(CAST(l_quantity AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_qty,
              CAST(min(l_shipdate) AS DATE) AS min_ship,
              CAST(max(l_shipdate) AS DATE) AS max_ship
       FROM lineitem""",
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality metrics via ``df.observe``: the counters ride on a
    pass the pipeline is already making (here: a downstream row count),
    so at 100 TB the profile costs ZERO extra scans — unlike a separate
    aggregation job.  The observed metrics are collected driver-side
    (4 scalars) and returned as a 1-row DataFrame; the oracle recomputes
    the same aggregates relationally."""
    from pyspark.sql import Observation

    li = load_table(spark, sf, "lineitem")
    obs = Observation("scan_qc")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    # the action the pipeline was going to run anyway; metrics piggyback
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                float(round(m["total_qty"], 2)),
                m["min_ship"],
                m["max_ship"],
            )
        ],
        "n_rows bigint, total_qty double, min_ship date, max_ship date",
    )


@q(
    "q144_compaction",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal,
              CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
              TRUE AS compacted_ok
       FROM customer""",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction round-trip: customer is written as 40
    fragment files, `compact_parquet` bin-packs them (temp-dir rewrite +
    rename swap — never a partial mix of layouts, though concurrent
    readers can hit a brief path-absent window between the renames; the
    table-maintenance pass every long-lived streaming-append
    table needs), and the compacted table must aggregate identically to
    the source (oracle recomputes over the original).  ``compacted_ok``
    pins the file-count contract: a single file afterwards, fewer than
    before."""
    import glob
    import tempfile

    from ..sources.layout import compact_parquet

    cust = load_table(spark, sf, "customer")
    p = tempfile.mkdtemp(prefix="ctdc-compact-") + "/t"
    cust.repartition(40).write.parquet(p)
    n_before = len(glob.glob(p + "/*.parquet"))
    stats = compact_parquet(spark, p, target_file_bytes=1 << 30)
    n_after = len(glob.glob(p + "/*.parquet"))
    ok = n_before == 40 and n_after == 1 and stats["files_after"] == 1
    return spark.read.parquet(p).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
        F.countDistinct("c_nationkey").cast("bigint").alias("n_nations"),
        F.lit(bool(ok)).alias("compacted_ok"),
    )


@q(
    "q147_merge_schema_evolution",
    """WITH updates AS (
         SELECT c_custkey,
                CASE WHEN c_mktsegment = 'BUILDING' THEN 'gold'
                     ELSE 'std' END AS c_tier,
                round(c_acctbal + 50.0, 2) AS c_acctbal
         FROM customer WHERE c_custkey % 10 = 0),
       merged AS (
         SELECT c.c_custkey,
                coalesce(u.c_acctbal, round(c.c_acctbal, 2)) AS c_acctbal,
                u.c_tier
         FROM customer c LEFT JOIN updates u USING (c_custkey))
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(c_tier) AS BIGINT) AS n_with_tier,
              CAST(count(DISTINCT c_tier) AS BIGINT) AS n_tiers,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(18, 2))), 2)
                   AS DOUBLE) AS total_bal,
              TRUE AS evolution_proven
       FROM merged""",
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE with schema evolution under a contract proof: the update
    batch carries a NEW nullable column (c_tier) absent from the v1
    snapshot.  Before any Spark action, `conforms(CustomerV1,
    CustomerV2, BACKWARD)` proves v1 data remains readable under the
    evolved contract (c_tier is Optional — reference Backward
    semantics, SparkCore.scala:105-116: absence allowed iff nullable or
    hasDefault), and the runtime pin re-checks the merged frame's live
    schema against v2.  Old rows surface c_tier = NULL; the oracle
    recomputes counts, tier cardinality, and balances.  The refusal
    branch (evolving by REMOVING a required field) is test-pinned in
    the conforms matrix."""
    import dataclasses

    from ..catalog import Customer
    from ..contracts.conforms import conforms
    from ..contracts.shape import contract
    from ..runtime.pins import assert_matches_contract

    @contract
    @dataclasses.dataclass
    class CustomerV2Agg:
        c_custkey: int
        c_acctbal: float
        c_tier: Optional[str]

    @contract
    @dataclasses.dataclass
    class CustomerV1Agg:
        c_custkey: int
        c_acctbal: float

    # construction-time evolution proof: v1 producers stay valid under v2
    conforms(CustomerV1Agg, CustomerV2Agg, SchemaPolicy.BACKWARD)

    cust = load_table(spark, sf, "customer")
    snapshot = cust.select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 50.0, 2).alias("c_acctbal"),
        F.when(F.col("c_mktsegment") == "BUILDING", "gold")
        .otherwise("std")
        .alias("c_tier"),
    )
    merged = (
        snapshot.alias("c")
        .join(updates.alias("u"), "c_custkey", "left")
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            F.coalesce(F.col("u.c_acctbal"), F.col("c.c_acctbal")).alias(
                "c_acctbal"
            ),
            F.col("u.c_tier").alias("c_tier"),
        )
    )
    # runtime pin: the merged frame's live schema is exactly v2
    assert_matches_contract(merged.schema, CustomerV2Agg, SchemaPolicy.EXACT)
    return merged.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("c_tier").cast("bigint").alias("n_with_tier"),
        F.countDistinct("c_tier").cast("bigint").alias("n_tiers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
        F.lit(True).alias("evolution_proven"),
    )


@q(
    "q148_data_expectations",
    """WITH m AS (
         SELECT count(*)::DOUBLE AS n,
                (count(*) - count(DISTINCT o_orderkey))::DOUBLE AS dup_keys,
                (sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END))::DOUBLE
                  / count(*) AS null_frac,
                sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                         THEN 1 ELSE 0 END)::DOUBLE AS oob,
                sum(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END)::DOUBLE AS bad_status
         FROM orders
       ), orphans AS (
         SELECT count(*)::DOUBLE AS m FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey)
       )
       SELECT * FROM (
         SELECT 'unique' AS rule, 'o_orderkey' AS "column",
                round(dup_keys, 6) AS metric, '== 0' AS bound,
                dup_keys = 0 AS passed FROM m
         UNION ALL
         SELECT 'not_null', 'o_totalprice', round(null_frac, 6), '<= 0.0',
                null_frac <= 0.0 FROM m
         UNION ALL
         SELECT 'in_range', 'o_totalprice', round(oob, 6),
                '0 outside [0.0, 1000000.0]', oob = 0 FROM m
         UNION ALL
         SELECT 'accepted_values', 'o_orderstatus', round(bad_status, 6),
                '0 outside set', bad_status = 0 FROM m
         UNION ALL
         SELECT 'row_count_between', '*', round(n, 6), '[1, 100000000]',
                n BETWEEN 1 AND 100000000 FROM m
         UNION ALL
         SELECT 'ref_integrity', 'o_custkey', round(orphans.m, 6),
                '0 orphans', orphans.m = 0 FROM orphans
       )""",
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    """Value-level data expectations — the runtime counterpart of the
    schema contracts (shape proven before data moves; these prove the
    DATA): key uniqueness, null fraction, value range, accepted set,
    row-count band, all in ONE aggregate pass (rules add columns, not
    scans), plus referential integrity orders->customer as a left-anti
    join (broadcast at dimension scale).  One report row per rule;
    a pipeline gates on `filter(~passed).count() == 0`."""
    from ..operators.expectations import (
        accepted_values,
        evaluate_expectations,
        in_range,
        not_null,
        ref_integrity_report,
        row_count_between,
        unique,
    )

    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    suite = evaluate_expectations(
        orders,
        [
            unique("o_orderkey"),
            not_null("o_totalprice"),
            in_range("o_totalprice", 0.0, 1_000_000.0),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            row_count_between(1, 100_000_000),
        ],
    )
    ref = ref_integrity_report(orders, "o_custkey", cust, "c_custkey")
    return suite.unionByName(ref)


# =========================================================================
# Round-4 additions II: reconciliation, entity resolution, PQ-ANN,
# incremental components, cohort retention, weighted reservoir
# =========================================================================

@q(
    "q149_snapshot_diff",
    """WITH old AS (
         SELECT c_custkey, round(c_acctbal, 2) AS bal, c_mktsegment AS seg
         FROM customer
       ), new AS (
         SELECT c_custkey,
                CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 5.0, 2)
                     ELSE round(c_acctbal, 2) END AS bal,
                c_mktsegment AS seg
         FROM customer WHERE c_custkey % 97 <> 0
         UNION ALL
         SELECT c_custkey + 1000000, round(c_acctbal, 2), c_mktsegment
         FROM customer WHERE c_custkey % 50 = 0
       ), j AS (
         SELECT coalesce(o.c_custkey, n.c_custkey) AS k,
                CASE WHEN o.c_custkey IS NULL THEN 'added'
                     WHEN n.c_custkey IS NULL THEN 'removed'
                     WHEN o.bal = n.bal AND o.seg = n.seg THEN 'unchanged'
                     ELSE 'changed' END AS status
         FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
       )
       SELECT status, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(k) AS BIGINT) AS key_sum
       FROM j GROUP BY status""",
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot reconciliation: the audit step after a MERGE/backfill.
    A simulated v2 of the customer snapshot (some keys dropped, some
    balances bumped, some new keys appended) is diffed against v1 and
    every key classified added/removed/changed/unchanged.  Each side is
    reduced to (key, xxhash64 fingerprint) BEFORE the full-outer join,
    so at 100 TB the shuffle carries 16 bytes/row regardless of row
    width and 'changed' is one 8-byte compare, not N columns.  The
    oracle re-derives the statuses by comparing columns directly —
    agreeing with the fingerprint path unless xxhash64 collides."""
    from ..operators.reconcile import diff_summary, snapshot_diff

    cust = load_table(spark, sf, "customer")
    old = cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    new = (
        cust.filter(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 10 == 0,
                F.round(F.col("c_acctbal") + 5.0, 2),
            )
            .otherwise(F.round("c_acctbal", 2))
            .alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 50 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.round("c_acctbal", 2).alias("bal"),
                F.col("c_mktsegment").alias("seg"),
            )
        )
    )
    d = snapshot_diff(old, new, ["c_custkey"], ["bal", "seg"])
    return diff_summary(d, "c_custkey")


_Q180_SQL = """
WITH updates AS (
  SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
  FROM {customer} WHERE c_custkey % 10 = 0),
expired AS (
  SELECT c.c_custkey, round(c.c_acctbal, 2) AS bal,
         0 AS valid_from, 1 AS valid_to
  FROM {customer} c JOIN updates u ON c.c_custkey = u.c_custkey),
current_v AS (
  SELECT c.c_custkey, coalesce(u.new_bal, round(c.c_acctbal, 2)) AS bal,
         CASE WHEN u.c_custkey IS NULL THEN 0 ELSE 1 END AS valid_from,
         CAST(NULL AS INT) AS valid_to
  FROM {customer} c LEFT JOIN updates u ON c.c_custkey = u.c_custkey),
dim AS (SELECT * FROM expired UNION ALL SELECT * FROM current_v),
facts AS (SELECT o_orderkey, o_custkey, CAST(o_orderkey % 2 AS INT) AS t,
                 o_totalprice FROM {orders}),
pit AS (
  SELECT f.t, d.bal, f.o_totalprice
  FROM facts f JOIN dim d
    ON d.c_custkey = f.o_custkey
   AND f.t >= d.valid_from
   AND (d.valid_to IS NULL OR f.t < d.valid_to))
SELECT t, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue,
       CAST(round(sum(CAST(bal AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS bal_at_time
FROM pit GROUP BY t
"""


@q(
    "q180_scd2_point_in_time",
    _Q180_SQL.format(customer="customer", orders="orders"),
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history (the
    consumption side of q134's type-2 build): each fact joins the
    dimension VERSION valid at the fact's time — equi-join on the
    business key plus a validity-interval post-filter, so Catalyst
    executes a hash join on c_custkey, never a range scan, and
    versions-per-key (small) bounds the post-filter fan-in.  Every
    fact matches exactly one version by SCD2 construction (verified:
    per-epoch counts sum to |orders|); pre-update facts aggregate
    against pre-update balances, the defining property time-travel-
    free engines get wrong.  Money sums go through DECIMAL so both
    engines agree to the cent regardless of summation order."""
    load_table(spark, sf, "customer").createOrReplaceTempView(
        "q180_customer"
    )
    load_table(spark, sf, "orders").createOrReplaceTempView("q180_orders")
    return spark.sql(
        _Q180_SQL.format(customer="q180_customer", orders="q180_orders")
    )


@q(
    "q191_expectations_quarantine",
    """WITH flags AS (
         -- null-EXPLICIT predicates: in_range/accepted_values route
         -- NULL values as clean (row_ok semantics), so every flag must
         -- be a real boolean — a bare (c_acctbal < 0) is NULL for a
         -- NULL balance and would silently drop the row from BOTH the
         -- reject and the clean counts
         SELECT c_custkey,
                (c_acctbal IS NOT NULL AND
                 (c_acctbal < 0.0 OR c_acctbal > 10000.0)) AS f_range,
                (c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
                  ('AUTOMOBILE','BUILDING','HOUSEHOLD','MACHINERY'))
                  AS f_seg,
                (c_name IS NULL) AS f_null
         FROM customer)
       SELECT 'accepted_values:c_mktsegment' AS rule,
              CAST(count(*) FILTER (WHERE f_seg) AS BIGINT) AS n_rows
       FROM flags
       UNION ALL
       SELECT 'in_range:c_acctbal',
              CAST(count(*) FILTER (WHERE f_range) AS BIGINT) FROM flags
       UNION ALL
       SELECT 'not_null:c_name',
              CAST(count(*) FILTER (WHERE f_null) AS BIGINT) FROM flags
       UNION ALL
       SELECT '__clean__',
              CAST(count(*) FILTER (WHERE NOT COALESCE(f_range, FALSE)
                                      AND NOT COALESCE(f_seg, FALSE)
                                      AND NOT COALESCE(f_null, FALSE))
                   AS BIGINT)
       FROM flags""",
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    """Expectation-driven quarantine routing (`apply_expectations`):
    customers with negative/oversized balances or a market segment
    outside the accepted set are routed to a CONTRACT-PINNED reject
    sink (quarantine schema = source columns + failed_rules, enforced
    by write_df's policy pin — the reference's policy-aware sink
    pattern, SparkCore.scala:355-360) while clean rows flow on with the
    source schema intact.  The gate reads the quarantine PARQUET BACK
    (proving the eager write, not just the lazy split), explodes the
    per-row blame labels into per-rule reject counts, and appends the
    clean-partition count; the oracle recomputes the whole partition
    from the rule predicates.  One predicate evaluation per rule, two
    filters over one scan — at 100 TB routing costs the pass the
    pipeline already makes."""
    import dataclasses as _dc

    from ..contracts.shape import contract as contract_deco
    from ..contracts.types import int32
    from ..operators.expectations import (
        accepted_values,
        apply_expectations,
        in_range,
        not_null,
    )
    from ..sources.io import Sink

    @contract_deco
    @_dc.dataclass
    class QuarantinedCustomer:
        c_custkey: int
        c_name: str
        c_nationkey: int32
        c_acctbal: float
        c_mktsegment: str
        failed_rules: list[str]

    customer = load_table(spark, sf, "customer")
    rules = [
        not_null("c_name"),
        in_range("c_acctbal", 0.0, 10000.0),
        accepted_values(
            "c_mktsegment",
            ["AUTOMOBILE", "BUILDING", "HOUSEHOLD", "MACHINERY"],
        ),
    ]
    qpath = "/tmp/ctdc_q191_quarantine_parquet"
    clean, _quarantined = apply_expectations(
        customer, rules, quarantine_sink=Sink(QuarantinedCustomer, qpath)
    )
    back = spark.read.parquet(qpath)
    per_rule = (
        back.select(F.explode("failed_rules").alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )
    # rules with zero rejects still need a row (the oracle emits all)
    all_rules = spark.createDataFrame(
        [(f"{r.rule}:{r.column}",) for r in rules], "rule string"
    )
    per_rule = (
        all_rules.join(per_rule, "rule", "left")
        .select(
            "rule",
            F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
        )
    )
    clean_row = clean.agg(
        F.count("*").cast("bigint").alias("n_rows")
    ).select(F.lit("__clean__").alias("rule"), "n_rows")
    return per_rule.union(clean_row)


@q(
    "q206_incremental_rollup_merge",
    """WITH g AS (
         SELECT event_type,
                strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000
                     AS BIGINT) AS micros,
                min(value) AS min_value,
                max(value) AS max_value
         FROM events GROUP BY event_type, day)
       SELECT event_type, day, n,
              CAST(micros AS DOUBLE) / 1000000 AS sum_value,
              min_value, max_value,
              CAST((2 * micros + 100 * n) // (200 * n) AS DOUBLE)
                / 10000 AS avg_value
       FROM g""",
)
def q206(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-rollup maintenance
    (operators/incremental.py): the per-(event_type, day) rollup is
    refreshed by MERGING algebraic aggregate states, never by
    re-scanning history.  The base partition (event_id % 4 != 3) is
    aggregated once into a (n, sum, min, max) state table and
    PERSISTED to parquet; the arriving batch (event_id % 4 == 3) is
    aggregated alone and merged with the state read BACK from disk —
    counts/sums add, mins min, maxs max, avg derives at finalize.
    Work per refresh is O(batch) + O(|keys|); at 100 TB the corpus
    scan happens once ever, and the merge is one partial-combined
    hash aggregation (the same partial/final split Spark performs
    inside a query, lifted across queries via the state table).  The
    oracle recomputes the rollup from ALL events in one pass — merge
    ≡ recompute is exactly the algebraic-correctness claim."""
    import hashlib
    import tempfile

    from ..operators.incremental import (
        aggregate_state,
        merge_aggregate_states,
    )

    # sums route through DECIMAL so state-merge summation order can
    # never drift an ulp from the oracle's single-pass sum (the q180
    # money convention); min/max stay on the raw doubles (order-free)
    spec = dict(sums=["value_dec"], mins=["value"], maxs=["value"])
    keys = ["event_type", "day"]
    keyed = load_table(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        .alias("day"),
        "value",
        F.col("value").cast("decimal(18,6)").alias("value_dec"),
    )
    base = keyed.filter(F.col("event_id") % 4 != 3)
    batch = keyed.filter(F.col("event_id") % 4 == 3)
    tag = hashlib.md5(f"{sf}|rollup-v1".encode()).hexdigest()[:12]
    state_path = f"{tempfile.gettempdir()}/ctdc-rollup-state-{tag}"
    aggregate_state(base, keys, **spec).write.mode("overwrite").parquet(
        state_path
    )
    state = spark.read.parquet(state_path)
    merged = merge_aggregate_states(
        [state, aggregate_state(batch, keys, **spec)], keys, **spec
    )
    # every output digit is deterministic across engines: the decimal
    # sums are EXACTLY equal (so their double casts are bit-identical),
    # min/max are raw parquet doubles, and the derived avg is computed
    # with integer half-up arithmetic at 4 dp instead of rounding a
    # double quotient (Spark rounds the shortest decimal repr, DuckDB
    # the true binary value — they disagree at exact midpoints like
    # 307.03/8; values are non-negative so DIV == floor on both sides)
    return merged.select(
        "event_type",
        "day",
        "n",
        F.expr("CAST(sum_value_dec AS DOUBLE)").alias("sum_value"),
        "min_value",
        "max_value",
        F.expr(
            "CAST((2 * CAST(sum_value_dec * 1000000 AS BIGINT)"
            " + 100 * n) DIV (200 * n) AS DOUBLE) / 10000"
        ).alias("avg_value"),
    )


@q(
    "q210_cdc_apply",
    """WITH ch AS (
         SELECT user_id, ts, event_id, value,
                CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END
                  AS op
         FROM events),
       last AS (
         SELECT user_id, ts, value, op,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC)
                  AS rn
         FROM ch)
       SELECT user_id,
              value AS last_value,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
       FROM last WHERE rn = 1 AND op <> 'D'""",
)
def q210(spark: SparkSession, sf: str) -> DataFrame:
    """CDC change-stream application (`cdc_apply`,
    operators/merge.py): derive the current snapshot from a
    Debezium-style I/U/D log — per key, the LAST change by (ts,
    event_id) wins; keys whose last change is a delete are absent, and
    a delete followed by a later upsert re-creates the key with no
    replay.  Here the events table plays the change log (error ⇒
    delete, anything else ⇒ upsert of `value`).  ONE window over the
    user_id exchange; the row_number desc + rn=1 filter becomes a
    per-partition top-1 heap (WindowGroupLimit, audited) so the
    shuffle carries one candidate row per key per partition — at
    100 TB the cost is the key exchange, never a join against the
    previous snapshot.  Payload doubles pass through untouched
    (bit-identical to the oracle's)."""
    from ..operators.merge import cdc_apply

    ev = load_table(spark, sf, "events")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return cdc_apply(
        changes, ["user_id"], ["ts", "event_id"], op_col="op"
    ).select(
        "user_id",
        F.col("value").alias("last_value"),
        _ts_str(F.col("ts")).alias("last_ts"),
    )


@q(
    "q214_incremental_distinct_rollup",
    """SELECT event_type,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
              TRUE AS est_ok
       FROM events GROUP BY event_type""",
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct counts in the INCREMENTAL rollup (q206's missing
    measure): COUNT DISTINCT is not algebraic, so the state carries an
    HLL SKETCH column (`hlls` spec, DataSketches bytes) — fixed-size
    per key, persisted to parquet with the rest of the state, merged
    by `hll_union_agg` in the same single re-aggregate as the
    counts/sums.  Refresh stays O(batch)+O(|keys|); exactness becomes
    a CONTRACT: the estimate from the base+batch sketch merge must
    land within 5% of the true distinct count (lgK=12 carries ~1.6%
    standard error, so 5% is >3 sigma).  The oracle pins the exact
    columns and the contract flag — q130 proves sketch mergeability
    inside one query, this proves it across PERSISTED state
    refreshes."""
    import hashlib
    import tempfile

    from ..operators.incremental import (
        aggregate_state,
        finalize_state,
        merge_aggregate_states,
    )

    spec = dict(hlls=["user_id"])
    keys = ["event_type"]
    ev = load_table(spark, sf, "events")
    base = ev.filter(F.col("event_id") % 4 != 3)
    batch = ev.filter(F.col("event_id") % 4 == 3)
    tag = hashlib.md5(f"{sf}|hllrollup-v1".encode()).hexdigest()[:12]
    state_path = f"{tempfile.gettempdir()}/ctdc-hll-state-{tag}"
    aggregate_state(base, keys, **spec).write.mode(
        "overwrite"
    ).parquet(state_path)
    state = spark.read.parquet(state_path)
    merged = merge_aggregate_states(
        [state, aggregate_state(batch, keys, **spec)], keys, **spec
    )
    est = finalize_state(merged, distinct_estimates=["user_id"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    out = est.join(exact, "event_type")
    ok = (
        F.abs(F.col("est_distinct_user_id") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    )
    return out.select(
        "event_type", "n", "exact_users", ok.alias("est_ok")
    )


_Q248_ORACLE = """
  WITH h AS (
    SELECT (('0x' || substring(sha256(
              concat_ws('|',
                coalesce('v:' || CAST(c_custkey AS VARCHAR), '@NULL@'),
                coalesce('v:' || c_name, '@NULL@'),
                coalesce('v:' || CAST(c_nationkey AS VARCHAR),
                         '@NULL@'),
                coalesce('v:' || c_mktsegment, '@NULL@'))),
            1, 15))::BIGINT) AS hh
    FROM customer)
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(bit_xor(hh) AS BIGINT) AS fp_xor,
         CAST(sum(hh % 1048576) AS BIGINT) AS fp_sum_mod
  FROM h"""


@q("q248_table_fingerprint", _Q248_ORACLE)
def q248(spark: SparkSession, sf: str) -> DataFrame:
    """Order-independent content fingerprint of the customer table
    (`reconcile.table_fingerprint`) — the replication/migration
    integrity check: engines agree on (n_rows, XOR of 60-bit sha256
    row hashes, modular sum of their low 20 bits) iff they hold the
    same multiset of rows, with NO global sort and a shuffle of 3
    numbers per partition.  sha256 (not xxhash64) so the hash is
    engine-portable — this oracle IS the cross-engine replay; the
    20-bit modular term keeps the sum int64-exact to ~8e12 rows
    (probe-verified at 1e8).
    Columns are null-tagged and canonically separated, so NULL vs the
    string 'NULL' can't collide (row_fingerprint's convention).
    Doubles are excluded from the fingerprint column set by the
    caller: shortest-roundtrip float rendering is not a cross-engine
    contract."""
    from ..operators.reconcile import table_fingerprint

    customer = load_table(spark, sf, "customer")
    return table_fingerprint(
        customer, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    )


_Q266_ORACLE = """
  WITH c AS (
    SELECT 'anon_' || substring(
             md5('pseud-v1|' || CAST(c_custkey AS VARCHAR)), 1, 16)
             AS pk,
           c_mktsegment
    FROM customer),
  o AS (
    SELECT 'anon_' || substring(
             md5('pseud-v1|' || CAST(o_custkey AS VARCHAR)), 1, 16)
             AS pk,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders)
  SELECT c_mktsegment,
         CAST(count(DISTINCT c.pk) AS BIGINT) AS n_pseudonyms,
         CAST(count(o.pk) AS BIGINT) AS n_orders,
         round(sum(cents) / 100.0, 2) AS revenue_r
  FROM c LEFT JOIN o ON c.pk = o.pk
  GROUP BY c_mktsegment"""


@q("q266_pseudonymize_joinable", _Q266_ORACLE)
def q266(spark: SparkSession, sf: str) -> DataFrame:
    """Keyed pseudonymization that PRESERVES JOINS
    (`expectations.pseudonymize`): customer and order keys are
    independently replaced by md5(salt|value) tokens, and the revenue
    rollup still joins on the pseudonym — referential integrity
    survives the privacy transform (q64's redaction destroys it; a
    random-token table is distributed state this pure projection
    avoids).  Zero extra shuffle: the pseudonym is a per-row codegen
    expression, the join is the same equi-join it replaces.  The
    oracle replays the identical mapping — engine-portable by the
    q209 md5 contract."""
    from ..operators.expectations import pseudonymize

    customer = pseudonymize(
        load_table(spark, sf, "customer"), ["c_custkey"], "pseud-v1"
    )
    orders = pseudonymize(
        load_table(spark, sf, "orders"), ["o_custkey"], "pseud-v1"
    )
    j = customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left"
    )
    return j.groupBy("c_mktsegment").agg(
        F.countDistinct(customer["c_custkey"])
        .cast("bigint")
        .alias("n_pseudonyms"),
        F.count(orders["o_custkey"]).cast("bigint").alias("n_orders"),
        F.round(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            )
            / 100.0,
            2,
        ).alias("revenue_r"),
    )


_Q276_ORACLE = """
  WITH base AS (
    SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
           nullif(o_orderstatus, 'O') AS status2
    FROM orders),
  w AS (
    SELECT o_custkey,
           row_number() OVER pw AS rn,
           o_orderkey AS survivor_id,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
             AS n_members,
           first_value(o_orderpriority IGNORE NULLS) OVER pwf
             AS o_orderpriority,
           first_value(status2 IGNORE NULLS) OVER pwf AS status2
    FROM base
    WINDOW pw AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey ASC),
           pwf AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING))
  SELECT o_custkey, CAST(survivor_id AS BIGINT) AS survivor_id,
         n_members, o_orderpriority, status2
  FROM w WHERE rn = 1"""


@q("q276_golden_record", _Q276_ORACLE)
def q276(spark: SparkSession, sf: str) -> DataFrame:
    """Survivorship / golden-record merge per customer over their
    orders (`reconcile.golden_record`) — the step AFTER entity
    resolution (q150/q215 cluster; something must still pick the
    record): survivor = most recent row (id tiebreak), but each FIELD
    takes its first non-null in recency order — so the newest row's
    NULL (status2 is nulled for 'O' orders here, exercising the
    fallback) doesn't erase an older row's value, the MDM rule
    "keep latest row" gets wrong.  ONE per-cluster window pass
    computes the survivor flag and every field's first-non-null —
    no self-join, no per-field re-aggregation."""
    from ..operators.reconcile import golden_record

    orders = load_table(spark, sf, "orders")
    base = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status2"),
    )
    return golden_record(
        base,
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        ["o_orderpriority", "status2"],
    )


_Q278_ORACLE = """
  WITH v0 AS (
    SELECT o_custkey,
           CAST(o_orderdate AS TIMESTAMP)
             + to_microseconds((o_orderkey % 86400) * 1000000)
             AS valid_from,
           o_orderkey
    FROM orders),
  v1 AS (
    SELECT o_custkey, valid_from,
           row_number() OVER pw AS rn,
           count(*) OVER (PARTITION BY o_custkey) AS cnt,
           lead(valid_from) OVER pw AS nxt
    FROM v0
    WINDOW pw AS (PARTITION BY o_custkey ORDER BY valid_from)),
  scd AS (
    SELECT o_custkey AS k, valid_from,
           CASE WHEN o_custkey % 20 = 7 AND rn = cnt - 1 THEN NULL
                WHEN nxt IS NULL THEN NULL
                WHEN o_custkey % 10 = 0
                  THEN nxt - INTERVAL 1 DAY
                WHEN o_custkey % 10 = 5
                  THEN nxt + INTERVAL 1 DAY
                ELSE nxt END AS valid_to
    FROM v1),
  flags AS (
    SELECT k,
           CASE WHEN nxt2 IS NOT NULL
                     AND (valid_to IS NULL OR nxt2 < valid_to)
                THEN 1 ELSE 0 END AS ov,
           CASE WHEN nxt2 IS NOT NULL AND valid_to IS NOT NULL
                     AND nxt2 > valid_to THEN 1 ELSE 0 END AS gp,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS op
    FROM (SELECT k, valid_to,
                 lead(valid_from) OVER (
                   PARTITION BY k
                   ORDER BY valid_from ASC, valid_to ASC NULLS LAST)
                   AS nxt2
          FROM scd)),
  tot AS (
    SELECT CAST(sum(ov) AS BIGINT) AS n_ov,
           CAST(sum(gp) AS BIGINT) AS n_gp
    FROM flags),
  mc AS (
    SELECT CAST(sum(CASE WHEN opens > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mc
    FROM (SELECT k, sum(op) AS opens FROM flags GROUP BY k))
  SELECT 'overlap' AS violation, n_ov AS n FROM tot
  UNION ALL SELECT 'gap', n_gp FROM tot
  UNION ALL SELECT 'multi_current', n_mc FROM mc"""


@q("q278_scd2_validity_audit", _Q278_ORACLE)
def q278(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 validity-window audit (`reconcile.scd2_validity_audit`)
    over a dimension with deterministically PLANTED defects (gap
    customers, overlap customers, a multi-current stripe): counts of
    overlap rows (a point-in-time join returns two truths), gap rows
    (history silently missing), and multi-current keys (two open
    versions) — the quality gate q134/q180's outputs should pass
    before anyone point-in-time joins them.  One per-key lead window
    + one conditional aggregate; zero counts are PRESENT in the
    3-row report (a clean audit proves it ran)."""
    from pyspark.sql import Window

    from ..operators.reconcile import scd2_validity_audit

    orders = load_table(spark, sf, "orders")
    v0 = orders.select(
        "o_custkey",
        (
            F.col("o_orderdate").cast("timestamp")
            + F.expr(
                "make_interval(0, 0, 0, 0, 0, 0, "
                "o_orderkey % 86400)"
            )
        ).alias("valid_from"),
    )
    pw = Window.partitionBy("o_custkey").orderBy("valid_from")
    wall = Window.partitionBy("o_custkey")
    v1 = v0.select(
        "o_custkey",
        "valid_from",
        F.row_number().over(pw).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__cnt"),
        F.lead("valid_from").over(pw).alias("__nxt"),
    )
    scd = v1.select(
        F.col("o_custkey").alias("k"),
        "valid_from",
        F.when(
            (F.col("o_custkey") % 20 == 7)
            & (F.col("__rn") == F.col("__cnt") - 1),
            F.lit(None).cast("timestamp"),
        )
        .when(F.col("__nxt").isNull(), F.lit(None).cast("timestamp"))
        .when(
            F.col("o_custkey") % 10 == 0,
            F.col("__nxt") - F.expr("INTERVAL 1 DAY"),
        )
        .when(
            F.col("o_custkey") % 10 == 5,
            F.col("__nxt") + F.expr("INTERVAL 1 DAY"),
        )
        .otherwise(F.col("__nxt"))
        .alias("valid_to"),
    )
    return scd2_validity_audit(scd, "k", "valid_from", "valid_to")


# Every case in the battery is a semantics BOTH engines share; the one
# known divergence — CAST(3.99 AS INT) truncates in Spark but ROUNDS in
# DuckDB — is deliberately excluded and is exactly why the whole
# inventory fixes points with floor() before casting (the 'cast_via_floor'
# case pins the safe idiom instead).
_Q330_ORACLE = """
  SELECT 'count_empty' AS case_name,
         (SELECT CAST(count(*) AS VARCHAR) FROM (SELECT 1) WHERE 1=0)
           AS result
  UNION ALL SELECT 'sum_empty',
    (SELECT coalesce(CAST(sum(x) AS VARCHAR), 'NULL')
     FROM (SELECT 1 AS x) WHERE 1=0)
  UNION ALL SELECT 'avg_skips_nulls',
    (SELECT CAST(avg(x) AS VARCHAR)
     FROM (SELECT unnest([1, NULL, 3]) AS x))
  UNION ALL SELECT 'null_eq_null',
    coalesce(CAST((NULL = NULL) AS VARCHAR), 'NULL')
  UNION ALL SELECT 'null_safe_eq',
    CAST((NULL IS NOT DISTINCT FROM NULL) AS VARCHAR)
  UNION ALL SELECT 'concat_null', coalesce('a' || NULL, 'NULL')
  UNION ALL SELECT 'greatest_skips_null',
    coalesce(CAST(greatest(1, NULL) AS VARCHAR), 'NULL')
  UNION ALL SELECT 'substring_beyond',
    '[' || substring('abc', 10, 2) || ']'
  UNION ALL SELECT 'mod_negative', CAST(-7 % 2 AS VARCHAR)
  UNION ALL SELECT 'intdiv_negative', CAST(-7 // 2 AS VARCHAR)
  UNION ALL SELECT 'cast_via_floor',
    CAST(CAST(floor(3.99) AS INT) AS VARCHAR)
  UNION ALL SELECT 'round_half_pos',
    CAST(CAST(round(2.5) AS BIGINT) AS VARCHAR)
  UNION ALL SELECT 'round_half_neg',
    CAST(CAST(round(-2.5) AS BIGINT) AS VARCHAR)
  UNION ALL SELECT 'str_to_int_trimmed',
    CAST(TRY_CAST(' 42 ' AS INT) AS VARCHAR)
  UNION ALL SELECT 'slash_is_float_div', CAST(1/2 AS VARCHAR)
  UNION ALL SELECT 'month_end_add',
    CAST(CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE) AS VARCHAR)
  UNION ALL SELECT 'leap_day',
    CAST(CAST(DATE '2024-02-28' + INTERVAL 1 DAY AS DATE) AS VARCHAR)
  UNION ALL SELECT 'empty_string_not_null',
    CAST(('' IS NULL) AS VARCHAR)"""


@q("q330_sql_semantics_battery", _Q330_ORACLE)
def q330(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-engine SQL-semantics conformance battery — the contracts
    discipline applied to the QUERY DIALECT itself: 18 edge-case
    expressions (empty-set aggregates, NULL propagation vs NULL-safe
    equality, negative mod/div truncation, round-half behavior,
    calendar month-end/leap arithmetic, string/number coercions)
    each emitted as (case_name, result) and hash-compared against
    DuckDB.  Every row is a semantics both engines are PINNED to
    share; the one divergence found while building the inventory —
    CAST(3.99 AS INT) truncates in Spark but ROUNDS in DuckDB — is
    deliberately excluded, and the 'cast_via_floor' case pins the
    floor-then-cast idiom the whole inventory uses instead.  A
    regression here means an engine upgrade changed query MEANING,
    which no row-count smoke test would catch."""
    return spark.sql(
        """
  SELECT 'count_empty' AS case_name,
         (SELECT CAST(count(*) AS STRING) FROM (SELECT 1) WHERE 1=0)
           AS result
  UNION ALL SELECT 'sum_empty',
    (SELECT coalesce(CAST(sum(x) AS STRING), 'NULL')
     FROM (SELECT 1 AS x) WHERE 1=0)
  UNION ALL SELECT 'avg_skips_nulls',
    (SELECT CAST(avg(x) AS STRING)
     FROM (SELECT explode(array(1, NULL, 3)) AS x))
  UNION ALL SELECT 'null_eq_null',
    coalesce(CAST((NULL = NULL) AS STRING), 'NULL')
  UNION ALL SELECT 'null_safe_eq',
    CAST((NULL IS NOT DISTINCT FROM NULL) AS STRING)
  UNION ALL SELECT 'concat_null', coalesce(concat('a', NULL), 'NULL')
  UNION ALL SELECT 'greatest_skips_null',
    coalesce(CAST(greatest(1, NULL) AS STRING), 'NULL')
  UNION ALL SELECT 'substring_beyond',
    concat('[', substring('abc', 10, 2), ']')
  UNION ALL SELECT 'mod_negative', CAST(-7 % 2 AS STRING)
  UNION ALL SELECT 'intdiv_negative', CAST(-7 DIV 2 AS STRING)
  UNION ALL SELECT 'cast_via_floor',
    CAST(CAST(floor(3.99) AS INT) AS STRING)
  UNION ALL SELECT 'round_half_pos',
    CAST(CAST(round(2.5) AS BIGINT) AS STRING)
  UNION ALL SELECT 'round_half_neg',
    CAST(CAST(round(-2.5) AS BIGINT) AS STRING)
  UNION ALL SELECT 'str_to_int_trimmed',
    CAST(TRY_CAST(' 42 ' AS INT) AS STRING)
  UNION ALL SELECT 'slash_is_float_div', CAST(1/2 AS STRING)
  UNION ALL SELECT 'month_end_add',
    CAST(add_months(DATE '2024-01-31', 1) AS STRING)
  UNION ALL SELECT 'leap_day',
    CAST(date_add(DATE '2024-02-28', 1) AS STRING)
  UNION ALL SELECT 'empty_string_not_null',
    CAST(('' IS NULL) AS STRING)"""
    )
