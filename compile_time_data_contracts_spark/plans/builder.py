"""Typestate pipeline builder: source -> transform* -> sink.

Python re-expression of `PipelineBuilder`
(/root/reference/src/main/scala/ctdc/SparkCore.scala:370-444).  The
reference enforces state transitions with compile-time evidence
(`=:=`/`<:<`); Python enforces them eagerly at builder-call time with
``PipelineStateError`` — still strictly *before* ``build()`` returns and
before any Spark action, preserving the "fails before data moves" property.

``add_sink`` is the fuse (SparkCore.scala:423-432): it runs the
construction-time conformance proof (`conforms`) between the current
contract and the sink contract under the sink policy, raising
``ContractDriftError`` with the rendered diff on drift.  At execution time
the runtime pin re-checks the live schema.
"""

from __future__ import annotations

import dataclasses
import enum
import typing

from pyspark.sql import DataFrame, SparkSession

from ..contracts.conforms import conforms
from ..contracts.policies import SchemaPolicy
from ..contracts.schema import spark_schema
from ..runtime.pins import assert_matches_contract
from ..sources.io import Sink, Source, read_df, write_df

__all__ = ["PipelineBuilder", "PipelineStateError", "Pipeline"]


class PipelineStateError(RuntimeError):
    """Illegal typestate transition (the runtime analogue of the
    reference's missing `=:=` evidence, SparkCore.scala:397,404,423,434)."""


class _State(enum.Enum):
    EMPTY = "Empty"
    WITH_SOURCE = "WithSource"
    WITH_TRANSFORM = "WithTransform"
    COMPLETE = "Complete"


@dataclasses.dataclass(frozen=True)
class _SourceStep:
    source: Source


@dataclasses.dataclass(frozen=True)
class _TransformStep:
    description: str
    fn: typing.Callable[[DataFrame], DataFrame]
    out_contract: type


@dataclasses.dataclass(frozen=True)
class _SinkStep:
    sink: Sink
    policy: SchemaPolicy


@dataclasses.dataclass(frozen=True)
class Pipeline:
    """Built pipeline: a left fold over steps threading the DataFrame
    (SparkCore.scala:434-440)."""

    name: str
    steps: tuple[object, ...]

    def __call__(self, spark: SparkSession) -> DataFrame:
        df: typing.Optional[DataFrame] = None
        for step in self.steps:
            if isinstance(step, _SourceStep):
                df = read_df(spark, step.source)
            elif isinstance(step, _TransformStep):
                assert df is not None
                df = step.fn(df)
                # post-transform pin: default unordered-CI comparator
                # regardless of sink policy (SparkCore.scala:404-415)
                assert_matches_contract(
                    df.schema,
                    spark_schema(step.out_contract),
                    SchemaPolicy.EXACT_UNORDERED_CI,
                    context=f"transform '{step.description}'",
                )
            elif isinstance(step, _SinkStep):
                assert df is not None
                write_df(df, step.sink, step.policy)
        assert df is not None
        return df


class PipelineBuilder:
    """Fluent typestate builder (SparkCore.scala:395-444).

    Usage::

        Pipeline = (
            PipelineBuilder("normalize-customers")
            .add_source(Source(RawCustomer, "csv", path, {"header": "true"}))
            .transform_as(Customer, "project", lambda df: df.select(...))
            .add_sink(Sink(Customer, out_path), SchemaPolicy.EXACT_BY_POSITION)
            .build()
        )
        result = Pipeline(spark)
    """

    def __init__(self, name: str):
        self._name = name
        self._state = _State.EMPTY
        self._steps: list[object] = []
        self._contract: typing.Optional[type] = None

    def _require(self, *states: _State) -> None:
        if self._state not in states:
            raise PipelineStateError(
                f"pipeline '{self._name}': illegal transition from "
                f"{self._state.value} (expected one of "
                f"{[s.value for s in states]})"
            )

    def add_source(self, source: Source) -> "PipelineBuilder":
        self._require(_State.EMPTY)
        spark_schema(source.contract)  # eager derivation: unsupported leaves abort now
        self._steps.append(_SourceStep(source))
        self._state = _State.WITH_SOURCE
        self._contract = source.contract
        return self

    def transform_as(
        self,
        out_contract: type,
        description: str,
        fn: typing.Callable[[DataFrame], DataFrame],
    ) -> "PipelineBuilder":
        self._require(_State.WITH_SOURCE, _State.WITH_TRANSFORM)
        spark_schema(out_contract)
        self._steps.append(_TransformStep(description, fn, out_contract))
        self._state = _State.WITH_TRANSFORM
        self._contract = out_contract
        return self

    def no_transform(self) -> "PipelineBuilder":
        """Identity stage (SparkCore.scala:417-418)."""
        self._require(_State.WITH_SOURCE)
        assert self._contract is not None
        return self.transform_as(self._contract, "noTransform", lambda df: df)

    def add_sink(
        self,
        sink: Sink,
        policy: SchemaPolicy = SchemaPolicy.EXACT_UNORDERED_CI,
    ) -> "PipelineBuilder":
        """The fuse: construction-time conformance proof between the current
        contract and the sink contract under ``policy``
        (SparkCore.scala:423-432).  Raises ContractDriftError with the
        rendered path diff before any Spark action.

        Requires the WithTransform state, exactly like the reference's
        ``ev0: S <:< WithTransform`` evidence (SparkCore.scala:424): a
        source chains to a sink only through ``transform_as`` or the
        explicit ``no_transform`` identity — so Python pipelines stay
        1:1 portable to the reference typestate."""
        self._require(_State.WITH_TRANSFORM)
        assert self._contract is not None
        conforms(self._contract, sink.contract, policy)
        self._steps.append(_SinkStep(sink, policy))
        self._state = _State.COMPLETE
        return self

    def build(self) -> Pipeline:
        self._require(_State.COMPLETE)
        return Pipeline(self._name, tuple(self._steps))
