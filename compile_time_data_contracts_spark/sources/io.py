"""Typed sources/sinks and contract-pinned IO.

Python re-expression of `TypedSource`/`TypedSink`/`TypedIO`
(/root/reference/src/main/scala/ctdc/SparkCore.scala:24-29, 346-367):

  * sources are NEVER schema-inferred — every read passes the
    contract-derived explicit StructType (SparkCore.scala:349-350), which
    also skips Spark's costly CSV/JSON inference job,
  * the loaded DataFrame's schema is re-validated immediately after read
    (SparkCore.scala:351),
  * sinks policy-pin the frame before writing (SparkCore.scala:355-360).

All pins are driver-side metadata checks; the write itself is plain
``df.write`` so Catalyst/Tungsten own the data path.
"""

from __future__ import annotations

import dataclasses
import typing

from pyspark.sql import DataFrame, SparkSession

from ..contracts.policies import SchemaPolicy
from ..contracts.schema import spark_schema
from ..runtime.pins import assert_matches_contract

__all__ = ["Source", "Sink", "read_df", "write_df"]


@dataclasses.dataclass(frozen=True)
class Source:
    """TypedSource[C] (SparkCore.scala:24-26)."""

    contract: type
    format: str
    path: str
    options: typing.Mapping[str, str] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class Sink:
    """TypedSink[C] (SparkCore.scala:27-29); default mode Overwrite."""

    contract: type
    path: str
    mode: str = "overwrite"
    format: str = "parquet"
    options: typing.Mapping[str, str] = dataclasses.field(default_factory=dict)


def read_df(spark: SparkSession, source: Source) -> DataFrame:
    """`TypedIO.readDF` (SparkCore.scala:346-352): explicit contract schema
    on the scan + immediate default pin.  For self-describing formats
    (parquet/orc) the explicit schema still prunes columns at the scan."""
    schema = spark_schema(source.contract)
    df = (
        spark.read.format(source.format)
        .options(**dict(source.options))
        .schema(schema)
        .load(source.path)
    )
    assert_matches_contract(
        df.schema, schema, SchemaPolicy.EXACT_UNORDERED_CI, context=f"source {source.path}"
    )
    return df


def write_df(
    df: DataFrame, sink: Sink, policy: SchemaPolicy = SchemaPolicy.EXACT_UNORDERED_CI
) -> None:
    """`TypedIO.writeDF` (SparkCore.scala:355-360): policy pin, then write."""
    assert_matches_contract(
        df.schema, spark_schema(sink.contract), policy, context=f"sink {sink.path}"
    )
    (
        df.write.format(sink.format)
        .mode(sink.mode)
        .options(**dict(sink.options))
        .save(sink.path)
    )
