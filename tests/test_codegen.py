"""Contract source generation: schema -> dataclass source -> schema
round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from compile_time_data_contracts_spark.contracts.codegen import (
    UnsupportedSchemaError,
    contract_source,
    load_contract,
)
from compile_time_data_contracts_spark.contracts.schema import spark_schema


def _strip_meta(s: T.StructType) -> T.StructType:
    def go(dt):
        if isinstance(dt, T.StructType):
            return T.StructType(
                [
                    T.StructField(f.name, go(f.dataType), f.nullable)
                    for f in dt.fields
                ]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(go(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(go(dt.keyType), go(dt.valueType), dt.valueContainsNull)
        return dt

    return go(s)


def _roundtrip(schema: T.StructType) -> T.StructType:
    src = contract_source(schema, "Gen")
    return spark_schema(load_contract(src, "Gen"))


def test_flat_roundtrip():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("rank", T.IntegerType(), True),
            T.StructField("flag", T.BooleanType(), False),
        ]
    )
    assert _strip_meta(_roundtrip(schema)) == schema


def test_nested_roundtrip():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "addr",
                T.StructType(
                    [
                        T.StructField("city", T.StringType(), False),
                        T.StructField("zip", T.IntegerType(), True),
                    ]
                ),
                False,
            ),
            T.StructField(
                "tags", T.ArrayType(T.StringType(), True), False
            ),
            T.StructField(
                "metrics",
                T.MapType(T.StringType(), T.IntegerType(), True),
                True,
            ),
        ]
    )
    assert _strip_meta(_roundtrip(schema)) == schema


def test_parquet_table_roundtrip(spark, sf_dir):
    """Generating a contract from a real table's schema reproduces it."""
    import os

    schema = spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet")
    ).schema
    got = _strip_meta(_roundtrip(schema))
    # parquet reads are nullable everywhere; compare full trees
    assert got == _strip_meta(schema)


def test_rejects_unsupported():
    with pytest.raises(UnsupportedSchemaError, match="outside the closed"):
        contract_source(
            T.StructType([T.StructField("b", T.BinaryType(), False)])
        )
    with pytest.raises(UnsupportedSchemaError, match="not atomic"):
        contract_source(
            T.StructType(
                [
                    T.StructField(
                        "m",
                        T.MapType(T.DateType(), T.StringType()),
                        False,
                    )
                ]
            )
        )
    with pytest.raises(UnsupportedSchemaError, match="identifier"):
        contract_source(
            T.StructType([T.StructField("bad name", T.StringType(), False)])
        )
