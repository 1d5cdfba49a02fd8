"""Runtime comparator matrix over hand-built StructTypes.

Port of /root/reference/src/test/scala/ctdc/SparkRuntimeSpec.scala.  The
comparators are pure functions over StructType metadata, so no SparkSession
is required (the reference uses empty DataFrames purely as schema carriers,
SparkRuntimeSpec.scala:26-27).
"""

from __future__ import annotations

from pyspark.sql import types as T

from compile_time_data_contracts_spark import (
    RuntimeSchemaComparator as C,
    SchemaPolicy,
    SchemaMismatchError,
    assert_matches_contract,
    compare_data_type,
)
from compile_time_data_contracts_spark.contracts.schema import HAS_DEFAULT_KEY

import pytest


def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name, dt, nullable=False, has_default=False):
    return T.StructField(name, dt, nullable, metadata={HAS_DEFAULT_KEY: has_default})


BASE = _s(_f("id", T.LongType()), _f("email", T.StringType()))


# --- nested optionality (SparkRuntimeSpec.scala:29-63) ---------------------

def test_nested_collection_optionality_rejected():
    strict = _s(_f("values", T.ArrayType(T.IntegerType(), containsNull=False)))
    opt = _s(_f("values", T.ArrayType(T.IntegerType(), containsNull=True)))
    assert not C.unordered(strict, opt)
    assert not C.by_position(strict, opt)

    strict_m = _s(_f("m", T.MapType(T.StringType(), T.IntegerType(), False)))
    opt_m = _s(_f("m", T.MapType(T.StringType(), T.IntegerType(), True)))
    assert not C.unordered(strict_m, opt_m)


def test_struct_field_nullability_ignored():
    # SparkCore.scala:132-147 — nullable never inspected
    a = _s(_f("id", T.LongType(), nullable=False))
    b = _s(_f("id", T.LongType(), nullable=True))
    assert C.unordered(a, b)
    assert compare_data_type(
        T.StructType([T.StructField("x", T.LongType(), True)]),
        T.StructType([T.StructField("x", T.LongType(), False)]),
    )


# --- duplicate names (SparkRuntimeSpec.scala:65-84) -------------------------

def test_ci_duplicates_fail_unordered():
    dup = _s(_f("Email", T.StringType()), _f("email", T.StringType()))
    assert not C.unordered(BASE, dup)
    assert not C.unordered(dup, BASE)
    with pytest.raises(SchemaMismatchError) as exc:
        assert_matches_contract(dup, BASE, SchemaPolicy.EXACT, context="test")
    assert "Duplicate field names" in str(exc.value)


# --- ordered / orderedCI / unorderedCI (SparkRuntimeSpec.scala:104-187) ----

def test_order_case_matrix():
    reordered = _s(_f("email", T.StringType()), _f("id", T.LongType()))
    upper = _s(_f("ID", T.LongType()), _f("EMAIL", T.StringType()))
    type_drift = _s(_f("ID", T.LongType()), _f("EMAIL", T.IntegerType()))

    assert C.unordered(BASE, reordered, case_insensitive=True)
    assert C.unordered(BASE, upper, case_insensitive=True)
    assert not C.unordered(BASE, upper, case_insensitive=False)
    assert not C.unordered(BASE, type_drift, case_insensitive=True)

    assert not C.ordered(BASE, reordered)
    assert C.ordered(BASE, upper, case_insensitive=True)
    assert not C.ordered(BASE, upper, case_insensitive=False)
    assert not C.ordered(BASE, type_drift, case_insensitive=True)

    assert C.by_position(BASE, upper)  # names ignored
    assert not C.by_position(BASE, reordered)  # types at position differ
    assert not C.by_position(BASE, type_drift)


# --- backward (SparkRuntimeSpec.scala:189-282) ------------------------------

def test_backward_extras_allowed():
    found = _s(
        _f("id", T.LongType()), _f("email", T.StringType()), _f("extra", T.StringType())
    )
    assert C.backward(BASE, found)


def test_backward_missing_nullable_or_default_allowed():
    exp = _s(
        _f("id", T.LongType()),
        _f("age", T.IntegerType(), nullable=True),
        _f("region", T.StringType(), nullable=False, has_default=True),
    )
    found = _s(_f("id", T.LongType()))
    assert C.backward(exp, found)


def test_backward_missing_required_rejected():
    exp = _s(_f("id", T.LongType()), _f("email", T.StringType()))
    found = _s(_f("id", T.LongType()))
    assert not C.backward(exp, found)


def test_backward_metadata_fallback():
    # SparkRuntimeSpec.scala:251-282 — without hasDefault metadata, only
    # nullability allows absence
    exp_no_meta = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("region", T.StringType(), False),
        ]
    )
    found = _s(_f("id", T.LongType()))
    assert not C.backward(exp_no_meta, found)


def test_backward_recursive_into_structs():
    inner_exp = T.StructType(
        [
            T.StructField("street", T.StringType(), False),
            T.StructField("zip", T.StringType(), True),
        ]
    )
    inner_found = T.StructType([T.StructField("street", T.StringType(), False)])
    exp = _s(_f("id", T.LongType()), T.StructField("addr", inner_exp, False))
    found = _s(_f("id", T.LongType()), T.StructField("addr", inner_found, False))
    assert C.backward(exp, found)


# --- forward (SparkRuntimeSpec.scala:284-343) -------------------------------

def test_forward_subset_allowed_extras_rejected():
    subset = _s(_f("id", T.LongType()))
    superset = _s(
        _f("id", T.LongType()), _f("email", T.StringType()), _f("x", T.StringType())
    )
    assert C.forward(BASE, subset)
    assert not C.forward(BASE, superset)


def test_forward_recursive():
    inner_exp = T.StructType(
        [
            T.StructField("street", T.StringType(), False),
            T.StructField("zip", T.StringType(), True),
        ]
    )
    inner_found = T.StructType([T.StructField("street", T.StringType(), False)])
    exp = _s(T.StructField("addr", inner_exp, False))
    found = _s(T.StructField("addr", inner_found, False))
    assert C.forward(exp, found)


# --- deep nesting (SparkRuntimeSpec.scala:345-417) ---------------------------

def _deep(code_type: T.DataType) -> T.StructType:
    payload = T.StructType([T.StructField("code", code_type, False)])
    item = T.StructType(
        [
            T.StructField(
                "payload",
                T.MapType(T.StringType(), payload, valueContainsNull=True),
                False,
            )
        ]
    )
    return _s(_f("items", T.ArrayType(item, containsNull=False)))


def test_deep_nested_accept_and_reject():
    assert C.unordered(_deep(T.IntegerType()), _deep(T.IntegerType()))
    assert not C.unordered(_deep(T.IntegerType()), _deep(T.StringType()))


# --- full + dispatch (SparkRuntimeSpec.scala:419-432) ------------------------

def test_full_always_matches():
    other = _s(_f("anything", T.BooleanType()))
    assert C.matches(BASE, other, SchemaPolicy.FULL)


def test_policy_dispatch():
    upper = _s(_f("ID", T.LongType()), _f("EMAIL", T.StringType()))
    assert C.matches(BASE, upper, SchemaPolicy.EXACT)
    assert not C.matches(BASE, upper, SchemaPolicy.EXACT_ORDERED)
    assert C.matches(BASE, upper, SchemaPolicy.EXACT_ORDERED_CI)
    assert C.matches(BASE, upper, SchemaPolicy.EXACT_BY_POSITION)
    assert not C.matches(BASE, upper, SchemaPolicy.BACKWARD)  # CS names
