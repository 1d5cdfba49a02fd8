"""End-to-end pipeline builder matrix.

Port of /root/reference/src/test/scala/ctdc/PipelineBuilderSpec.scala:
construction-time drift rejection (:57-77), illegal typestate transitions
(:79-99), green path CSV -> transform -> Parquet (:101-126), red path where
the runtime pin trips after construction passed (:128-151), Backward and
Forward no-transform paths (:153-221).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import pytest
from pyspark.sql import functions as F

from compile_time_data_contracts_spark import (
    ContractDriftError,
    PipelineBuilder,
    PipelineStateError,
    SchemaMismatchError,
    SchemaPolicy,
    Sink,
    Source,
    read_df,
)
from compile_time_data_contracts_spark.contracts.types import int32


@dataclass
class RawCustomer:
    id: int
    email: str
    age: Optional[int32] = None
    segment: str = ""


@dataclass
class Customer:
    id: int
    email: str
    age: Optional[int32] = None


@dataclass
class CustomerRegion:
    id: int
    email: str
    age: Optional[int32] = None
    region: str = "IN"


CSV_ROWS = "id,email,age,segment\n1,a@b.com,21,S\n2,b@c.com,,L\n3,c@d.com,30,M\n"


@pytest.fixture()
def csv_path(tmp_path):
    # FIXTURES.md A1 sample rows (PipelineBuilderSpec.scala:42-55)
    p = tmp_path / "customer.csv"
    p.write_text(CSV_ROWS)
    return str(p)


def test_green_path_csv_transform_parquet(spark, csv_path, tmp_path):
    # PipelineBuilderSpec.scala:101-126
    out = str(tmp_path / "out.parquet")
    pipeline = (
        PipelineBuilder("green")
        .add_source(Source(RawCustomer, "csv", csv_path, {"header": "true"}))
        .transform_as(Customer, "project", lambda df: df.select("id", "email", "age"))
        .add_sink(Sink(Customer, out), SchemaPolicy.EXACT_BY_POSITION)
        .build()
    )
    result = pipeline(spark)
    assert result.count() == 3
    assert result.columns == ["id", "email", "age"]
    back = spark.read.parquet(out)
    assert back.count() == 3
    # empty age parsed as null
    assert back.filter(F.col("age").isNull()).count() == 1


def test_construction_time_drift_rejection(spark, csv_path, tmp_path):
    # PipelineBuilderSpec.scala:57-77 — fails BEFORE any Spark action
    builder = (
        PipelineBuilder("drift")
        .add_source(Source(RawCustomer, "csv", csv_path, {"header": "true"}))
        .no_transform()
    )
    with pytest.raises(ContractDriftError) as exc:
        builder.add_sink(Sink(Customer, str(tmp_path / "x")), SchemaPolicy.EXACT)
    assert "Extra attributes" in str(exc.value)
    assert "segment" in str(exc.value)


def test_illegal_typestate_transitions(csv_path, tmp_path):
    # PipelineBuilderSpec.scala:79-99
    b = PipelineBuilder("states")
    with pytest.raises(PipelineStateError):
        b.no_transform()  # no source yet
    with pytest.raises(PipelineStateError):
        b.add_sink(Sink(Customer, str(tmp_path / "y")))
    with pytest.raises(PipelineStateError):
        b.build()
    b.add_source(Source(RawCustomer, "csv", csv_path, {"header": "true"}))
    with pytest.raises(PipelineStateError):
        b.add_source(Source(RawCustomer, "csv", csv_path, {"header": "true"}))


def test_red_path_runtime_pin_trips(spark, csv_path, tmp_path):
    # PipelineBuilderSpec.scala:128-151 — declared transform output lies
    # about the actual schema; construction passes, runtime pin trips
    pipeline = (
        PipelineBuilder("red")
        .add_source(Source(RawCustomer, "csv", csv_path, {"header": "true"}))
        .transform_as(
            Customer,
            "reorder-lie",
            lambda df: df.select("email", "id"),  # drops age, wrong set
        )
        .add_sink(Sink(Customer, str(tmp_path / "red")), SchemaPolicy.EXACT)
        .build()
    )
    with pytest.raises(SchemaMismatchError) as exc:
        pipeline(spark)
    assert "transform 'reorder-lie'" in str(exc.value)


def test_backward_no_transform(spark, csv_path, tmp_path):
    # PipelineBuilderSpec.scala:153-186 — producer extra `segment` and
    # missing defaulted `region` both allowed under Backward
    out = str(tmp_path / "bw.parquet")
    pipeline = (
        PipelineBuilder("backward")
        .add_source(Source(RawCustomer, "csv", csv_path, {"header": "true"}))
        .no_transform()
        .add_sink(Sink(CustomerRegion, out), SchemaPolicy.BACKWARD)
        .build()
    )
    assert pipeline(spark).count() == 3


def test_forward_no_transform(spark, csv_path, tmp_path):
    # PipelineBuilderSpec.scala:188-221 — producer subset (id, email)
    @dataclass
    class IdEmail:
        id: int
        email: str

    p = tmp_path / "subset.csv"
    p.write_text("id,email\n1,a@b.com\n2,b@c.com\n")
    out = str(tmp_path / "fw.parquet")
    pipeline = (
        PipelineBuilder("forward")
        .add_source(Source(IdEmail, "csv", str(p), {"header": "true"}))
        .no_transform()
        .add_sink(Sink(CustomerRegion, out), SchemaPolicy.FORWARD)
        .build()
    )
    assert pipeline(spark).count() == 2


def test_read_df_pins_source_schema(spark, tmp_path):
    # SparkCore.scala:346-352 — explicit schema + post-read pin
    p = tmp_path / "c.csv"
    p.write_text(CSV_ROWS)
    df = read_df(spark, Source(RawCustomer, "csv", str(p), {"header": "true"}))
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "string",
        "int",
        "string",
    ]


@pytest.mark.parametrize("fmt,options", [
    ("parquet", {}),
    ("orc", {}),
    ("json", {}),
    ("csv", {"header": "true"}),
])
def test_typed_io_roundtrip_all_formats(spark, csv_path, tmp_path, fmt, options):
    """read_df/write_df are format-generic (R1/R3: any Spark format with
    contract-derived schema on the scan, policy pin before the write)."""
    from compile_time_data_contracts_spark import write_df

    src = read_df(
        spark, Source(RawCustomer, "csv", csv_path, {"header": "true"})
    )
    out = str(tmp_path / f"round.{fmt}")
    write_df(
        src,
        Sink(RawCustomer, out, format=fmt, options=options),
        SchemaPolicy.EXACT,
    )
    back = read_df(spark, Source(RawCustomer, fmt, out, options))
    assert back.count() == 3
    assert sorted(r.id for r in back.select("id").collect()) == [1, 2, 3]
    # nullable age survives every format
    assert back.filter(F.col("age").isNull()).count() == 1


def test_partitioned_sink_prunes_partitions(spark, csv_path, tmp_path):
    """partition_by writes a hive layout; a filter on the partition
    column must appear as PartitionFilters on the scan (directory-level
    pruning, no file of other partitions opened)."""
    import os

    from compile_time_data_contracts_spark import write_df

    src = read_df(
        spark, Source(RawCustomer, "csv", csv_path, {"header": "true"})
    )
    out = str(tmp_path / "part_out")
    write_df(
        src,
        Sink(RawCustomer, out, partition_by=("segment",)),
        SchemaPolicy.EXACT,
    )
    assert sorted(
        d for d in os.listdir(out) if d.startswith("segment=")
    ) == ["segment=L", "segment=M", "segment=S"]
    back = spark.read.parquet(out).filter(F.col("segment") == "S")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(segment" in plan
    assert back.count() == 1


def test_partitioned_sink_rejects_unknown_column(spark, csv_path, tmp_path):
    from compile_time_data_contracts_spark import write_df

    src = read_df(
        spark, Source(RawCustomer, "csv", csv_path, {"header": "true"})
    )
    with pytest.raises(ValueError, match="partition columns"):
        write_df(
            src,
            Sink(RawCustomer, str(tmp_path / "bad"), partition_by=("nope",)),
            SchemaPolicy.EXACT,
        )
