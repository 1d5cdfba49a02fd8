"""Policy-aware runtime schema comparator over live ``StructType``s.

Python re-expression of `RuntimeSchemaComparator`
(/root/reference/src/main/scala/ctdc/SparkCore.scala:39-189).  Operates on
driver-side metadata only (``df.schema``) — never touches rows, so cost is
microseconds per pipeline boundary regardless of data scale.

Key semantics Spark's own comparators lack (ARTIFACT.md:29):
  * ``ArrayType.containsNull`` / ``MapType.valueContainsNull`` compared
    strictly (SparkCore.scala:137-144) while StructField.nullable is
    ignored (SparkCore.scala:132-147),
  * case-insensitive duplicate-name detection fails the unordered match
    (SparkCore.scala:60-78),
  * Backward subset: expected field may be absent iff nullable or
    ``ctdc.hasDefault`` metadata (SparkCore.scala:105-116),
  * Forward subset: every found field must exist in expected
    (SparkCore.scala:118-127).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import types as T

from ..contracts.policies import SchemaPolicy
from ..contracts.schema import HAS_DEFAULT_KEY

__all__ = ["compare_data_type", "duplicate_names", "RuntimeSchemaComparator"]


def compare_data_type(found: T.DataType, expected: T.DataType) -> bool:
    """Deep DataType comparer (SparkCore.scala:132-147): recurses
    Struct/Array/Map, requires containsNull/valueContainsNull equality,
    ignores StructField.nullable, leaf equality otherwise.

    Do NOT replace with ``found == expected`` — Spark's equality includes
    struct-field nullability and metadata.
    """
    if isinstance(found, T.StructType) and isinstance(expected, T.StructType):
        if len(found.fields) != len(expected.fields):
            return False
        return all(
            ff.name == ef.name and compare_data_type(ff.dataType, ef.dataType)
            for ff, ef in zip(found.fields, expected.fields)
        )
    if isinstance(found, T.ArrayType) and isinstance(expected, T.ArrayType):
        return found.containsNull == expected.containsNull and compare_data_type(
            found.elementType, expected.elementType
        )
    if isinstance(found, T.MapType) and isinstance(expected, T.MapType):
        return (
            found.valueContainsNull == expected.valueContainsNull
            and compare_data_type(found.keyType, expected.keyType)
            and compare_data_type(found.valueType, expected.valueType)
        )
    return found == expected


def duplicate_names(schema: T.StructType) -> list[list[str]]:
    """Case-insensitive duplicate field groups (SparkCore.scala:60-65)."""
    counts = Counter(f.name.lower() for f in schema.fields)
    dups = {n for n, c in counts.items() if c > 1}
    return [
        [f.name for f in schema.fields if f.name.lower() == d] for d in sorted(dups)
    ]


def _has_default(field: T.StructField) -> bool:
    meta = field.metadata or {}
    return bool(meta.get(HAS_DEFAULT_KEY, False))


class RuntimeSchemaComparator:
    """The six comparison strategies + policy dispatch
    (SparkCore.scala:150-189)."""

    @staticmethod
    def unordered(
        expected: T.StructType, found: T.StructType, case_insensitive: bool = True
    ) -> bool:
        """Unordered name equality; duplicate names on either side fail the
        match because unique-by-name indexing is impossible
        (SparkCore.scala:73-78, 93-103)."""
        if duplicate_names(expected) or duplicate_names(found):
            return False
        norm = (lambda s: s.lower()) if case_insensitive else (lambda s: s)
        exp_by = {norm(f.name): f for f in expected.fields}
        fnd_by = {norm(f.name): f for f in found.fields}
        if set(exp_by) != set(fnd_by):
            return False
        return all(
            compare_data_type(fnd_by[k].dataType, exp_by[k].dataType) for k in exp_by
        )

    @staticmethod
    def ordered(
        expected: T.StructType, found: T.StructType, case_insensitive: bool = False
    ) -> bool:
        """Length + per-position name (CS/CI) + type (SparkCore.scala:86-91)."""
        if len(expected.fields) != len(found.fields):
            return False
        norm = (lambda s: s.lower()) if case_insensitive else (lambda s: s)
        return all(
            norm(ef.name) == norm(ff.name)
            and compare_data_type(ff.dataType, ef.dataType)
            for ef, ff in zip(expected.fields, found.fields)
        )

    @staticmethod
    def by_position(expected: T.StructType, found: T.StructType) -> bool:
        """Length + per-position type only (SparkCore.scala:82-84)."""
        if len(expected.fields) != len(found.fields):
            return False
        return all(
            compare_data_type(ff.dataType, ef.dataType)
            for ef, ff in zip(expected.fields, found.fields)
        )

    @staticmethod
    def backward(expected: T.StructType, found: T.StructType) -> bool:
        """Every expected field is present with matching type OR its absence
        is allowed (nullable or ctdc.hasDefault); extras in found are fine;
        recursive into nested structs (SparkCore.scala:105-116)."""
        fnd_by = {f.name: f for f in found.fields}
        for ef in expected.fields:
            ff = fnd_by.get(ef.name)
            if ff is None:
                if ef.nullable or _has_default(ef):
                    continue
                return False
            if isinstance(ef.dataType, T.StructType) and isinstance(
                ff.dataType, T.StructType
            ):
                if not RuntimeSchemaComparator.backward(ef.dataType, ff.dataType):
                    return False
            elif not compare_data_type(ff.dataType, ef.dataType):
                return False
        return True

    @staticmethod
    def forward(expected: T.StructType, found: T.StructType) -> bool:
        """Every found field must exist in expected with matching type;
        recursive into nested structs (SparkCore.scala:118-127)."""
        exp_by = {f.name: f for f in expected.fields}
        for ff in found.fields:
            ef = exp_by.get(ff.name)
            if ef is None:
                return False
            if isinstance(ef.dataType, T.StructType) and isinstance(
                ff.dataType, T.StructType
            ):
                if not RuntimeSchemaComparator.forward(ef.dataType, ff.dataType):
                    return False
            elif not compare_data_type(ff.dataType, ef.dataType):
                return False
        return True

    # Policy -> comparator dispatch (SparkCore.scala:150-189)
    @staticmethod
    def matches(
        expected: T.StructType, found: T.StructType, policy: SchemaPolicy
    ) -> bool:
        C = RuntimeSchemaComparator
        if policy in (SchemaPolicy.EXACT, SchemaPolicy.EXACT_UNORDERED_CI):
            return C.unordered(expected, found, case_insensitive=True)
        if policy is SchemaPolicy.EXACT_ORDERED:
            return C.ordered(expected, found, case_insensitive=False)
        if policy is SchemaPolicy.EXACT_ORDERED_CI:
            return C.ordered(expected, found, case_insensitive=True)
        if policy is SchemaPolicy.EXACT_BY_POSITION:
            return C.by_position(expected, found)
        if policy is SchemaPolicy.BACKWARD:
            return C.backward(expected, found)
        if policy is SchemaPolicy.FORWARD:
            return C.forward(expected, found)
        if policy is SchemaPolicy.FULL:
            return True
        raise ValueError(f"unknown policy {policy!r}")
