"""Contract -> StructType derivation matrix.

Port of /root/reference/src/test/scala/ctdc/SparkSchemaSpec.scala:
nullability + containsNull/valueContainsNull (:27-48), strict collections
(:50-59), ctdc.hasDefault metadata (:61-69), unsupported-leaf rejection
(:71-114, covered in test_conforms).

(No PEP 563 future import — function-local contract classes need eagerly
evaluated annotations.)
"""

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import types as T

from compile_time_data_contracts_spark import contract, spark_schema, HAS_DEFAULT_KEY
from compile_time_data_contracts_spark.contracts.types import int32


@contract
@dataclass
class Payload:
    id: int
    tags: list[Optional[int32]]
    metrics: dict[str, Optional[int32]]
    notes: Optional[str] = None
    region: str = "IN"


def test_derivation_golden():
    # FIXTURES.md A4 golden
    s = spark_schema(Payload)
    assert s["id"].dataType == T.LongType()
    assert s["id"].nullable is False
    assert s["tags"].dataType == T.ArrayType(T.IntegerType(), containsNull=True)
    assert s["metrics"].dataType == T.MapType(
        T.StringType(), T.IntegerType(), valueContainsNull=True
    )
    assert s["notes"].dataType == T.StringType()
    assert s["notes"].nullable is True


def test_strict_collections():
    # SparkSchemaSpec.scala:50-59
    @contract
    @dataclass
    class Strict:
        tags: list[str]
        metrics: dict[str, int]

    s = spark_schema(Strict)
    assert s["tags"].dataType.containsNull is False
    assert s["metrics"].dataType.valueContainsNull is False


def test_has_default_metadata():
    # SparkSchemaSpec.scala:61-69 — metadata key ctdc.hasDefault
    s = spark_schema(Payload)
    assert s["id"].metadata[HAS_DEFAULT_KEY] is False
    assert s["notes"].metadata[HAS_DEFAULT_KEY] is True
    assert s["region"].metadata[HAS_DEFAULT_KEY] is True


def test_nested_struct_derivation():
    @contract
    @dataclass
    class Geo:
        lat: float
        lon: float

    @contract
    @dataclass
    class Address:
        street: str
        geo: Geo
        zip: Optional[int32] = None

    @contract
    @dataclass
    class Customer:
        id: int
        address: Address
        events: list[dict[str, str]] = field(default_factory=list)

    s = spark_schema(Customer)
    addr = s["address"].dataType
    assert isinstance(addr, T.StructType)
    assert addr["zip"].nullable is True
    assert isinstance(addr["geo"].dataType, T.StructType)
    ev = s["events"].dataType
    assert ev == T.ArrayType(
        T.MapType(T.StringType(), T.StringType(), valueContainsNull=False),
        containsNull=False,
    )


def test_metadata_survives_parquet_roundtrip(spark, tmp_path):
    # SparkCore.scala:285-290 — hasDefault metadata is first-class and
    # survives a Parquet write/read cycle
    df = spark.createDataFrame([], schema=spark_schema(Payload))
    path = str(tmp_path / "payload.parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema["region"].metadata.get(HAS_DEFAULT_KEY) is True
