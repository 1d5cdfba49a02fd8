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
    """TypedSink[C] (SparkCore.scala:27-29); default mode Overwrite.

    ``partition_by`` produces a hive-layout directory tree
    (col=value/...), the standard 100 TB sink layout: readers filtering
    on the partition column prune entire directories before any file is
    opened (partition pruning shows as ``PartitionFilters`` in
    ``.explain``).  Partition columns must exist in the contract."""

    contract: type
    path: str
    mode: str = "overwrite"
    format: str = "parquet"
    options: typing.Mapping[str, str] = dataclasses.field(default_factory=dict)
    partition_by: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        # contract-membership is a CONSTRUCTION-time property (the
        # repo's refuse-early ethos): a Sink declaring a partition
        # column the contract lacks is wrong independent of any frame,
        # and under a lenient policy (FULL/BACKWARD) the first write's
        # df.columns check could otherwise mis-blame the frame
        if self.partition_by:
            names = set(spark_schema(self.contract).names)
            missing = set(self.partition_by) - names
            if missing:
                raise ValueError(
                    f"sink {self.path}: partition columns not in "
                    f"contract {self.contract.__name__}: {sorted(missing)}"
                )


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
    if sink.partition_by:
        # contract membership was validated at Sink construction; this
        # guards the FRAME (a lenient policy can admit a frame missing
        # a contract column the layout partitions on)
        missing = set(sink.partition_by) - set(df.columns)
        if missing:
            raise ValueError(
                f"sink {sink.path}: partition columns missing from the "
                f"frame being written: {sorted(missing)}"
            )
    writer = (
        df.write.format(sink.format)
        .mode(sink.mode)
        .options(**dict(sink.options))
    )
    if sink.partition_by:
        writer = writer.partitionBy(*sink.partition_by)
    writer.save(sink.path)
