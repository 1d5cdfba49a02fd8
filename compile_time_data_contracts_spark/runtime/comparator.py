"""Policy-aware runtime schema comparator over live ``StructType``s.

Python re-expression of `RuntimeSchemaComparator`
(/root/reference/src/main/scala/ctdc/SparkCore.scala:30-147).  Operates on
driver-side metadata only (``df.schema``) — never touches rows, so cost is
microseconds per pipeline boundary regardless of data scale.

The comparison *mode* (unordered / ordered / backward / forward /
by-position, each with its case sensitivity) is threaded through every
nesting level, exactly like the reference's ``StructMode`` passed from
``compareStruct`` into ``compareDataType`` and back
(SparkCore.scala:79-147): a nested struct inside an array or map is
compared under the active policy's semantics, not under a fixed
positional rule.

Key semantics Spark's own comparators lack (ARTIFACT.md:29):
  * ``ArrayType.containsNull`` / ``MapType.valueContainsNull`` compared
    strictly (SparkCore.scala:137-144) while StructField.nullable is
    ignored (SparkCore.scala:132-147),
  * duplicate field names on either side fail every by-name mode because
    unique-by-name indexing is impossible (``uniqueFieldsByName`` yields
    None, SparkCore.scala:72-78) — including Backward and Forward,
  * Backward subset: expected field may be absent iff nullable or
    ``ctdc.hasDefault`` metadata (SparkCore.scala:105-116),
  * Forward subset: every found field must exist in expected
    (SparkCore.scala:118-127).
"""

from __future__ import annotations

import dataclasses
from collections import Counter

from pyspark.sql import types as T

from ..contracts.policies import SchemaPolicy
from ..contracts.schema import HAS_DEFAULT_KEY

__all__ = [
    "StructMode",
    "compare_data_type",
    "duplicate_names",
    "RuntimeSchemaComparator",
]


@dataclasses.dataclass(frozen=True)
class StructMode:
    """Active struct-comparison mode (SparkCore.scala:31-36)."""

    kind: str  # "unordered" | "ordered" | "backward" | "forward" | "by_position"
    case_insensitive: bool = False

    def norm(self, name: str) -> str:
        return name.lower() if self.case_insensitive else name


# Default for bare compare_data_type calls: strict name+type positional
# comparison (the behavior the public helper always had).
_ORDERED_CS = StructMode("ordered", case_insensitive=False)

# Interned mode instances: comparator entry points run once per pipeline
# boundary but over every nesting level, so avoid re-allocating the
# frozen dataclass on each call.
_MODES = {
    (kind, ci): StructMode(kind, ci)
    for kind in ("unordered", "ordered", "backward", "forward", "by_position")
    for ci in (False, True)
}


def duplicate_names(
    schema: T.StructType, case_insensitive: bool = True
) -> list[list[str]]:
    """Duplicate field groups under the active name normalization
    (SparkCore.scala:59-65)."""
    norm = (lambda s: s.lower()) if case_insensitive else (lambda s: s)
    counts = Counter(norm(f.name) for f in schema.fields)
    dups = {n for n, c in counts.items() if c > 1}
    return [
        [f.name for f in schema.fields if norm(f.name) == d] for d in sorted(dups)
    ]


def _has_default(field: T.StructField) -> bool:
    meta = field.metadata or {}
    return bool(meta.get(HAS_DEFAULT_KEY, False))


def _missing_allowed(field: T.StructField) -> bool:
    return field.nullable or _has_default(field)


def _unique_fields_by_name(
    schema: T.StructType, mode: StructMode
) -> dict[str, T.StructField] | None:
    """Unique-by-name index, or None when duplicates make by-name matching
    ill-defined (SparkCore.scala:72-78).  Single pass: the duplicate check
    and the index are the same dict insert.

    The index is memoized on the StructType instance (per case mode),
    keyed to the current field count so an in-place ``schema.add(...)``
    invalidates it.  Pinned contract schemas are never mutated after
    construction, so the cache holds for the comparator's whole life;
    a field RENAME on a same-length schema is the one mutation this
    guard cannot see (don't mutate schemas you compare)."""
    attr = "_ctdc_nameidx_ci" if mode.case_insensitive else "_ctdc_nameidx_cs"
    fields = schema.fields
    cached = schema.__dict__.get(attr)
    if cached is not None and cached[0] == len(fields):
        return cached[1]
    out: dict[str, T.StructField] | None = {}
    ci = mode.case_insensitive
    for f in fields:
        key = f.name.lower() if ci else f.name
        if key in out:
            out = None
            break
        out[key] = f
    try:
        schema.__dict__[attr] = (len(fields), out)
    except (AttributeError, TypeError):  # exotic StructType without __dict__
        pass
    return out


def _subtree_dup_free(dt: T.DataType, ci: bool) -> bool:
    """True iff no struct anywhere in the subtree has duplicate field
    names under the active normalization.  A dup-free subtree compared
    against the SAME object is a match under every mode (same names,
    same order, same types), so identity + this flag short-circuits the
    whole recursion; a dup-carrying struct must still fail against
    itself (SparkCore.scala:72-78), which the flag preserves.  Memoized
    per StructType instance with the same field-count guard as the name
    index."""
    cls = dt.__class__
    if cls is T.StructType:
        attr = "_ctdc_dupfree_ci" if ci else "_ctdc_dupfree_cs"
        fields = dt.fields
        cached = dt.__dict__.get(attr)
        if cached is not None and cached[0] == len(fields):
            return cached[1]
        names = (
            {f.name.lower() for f in fields} if ci else {f.name for f in fields}
        )
        clean = len(names) == len(fields) and all(
            _subtree_dup_free(f.dataType, ci) for f in fields
        )
        try:
            dt.__dict__[attr] = (len(fields), clean)
        except (AttributeError, TypeError):
            pass
        return clean
    if cls is T.ArrayType:
        return _subtree_dup_free(dt.elementType, ci)
    if cls is T.MapType:
        return _subtree_dup_free(dt.keyType, ci) and _subtree_dup_free(
            dt.valueType, ci
        )
    return True


def compare_data_type(
    found: T.DataType, expected: T.DataType, mode: StructMode = _ORDERED_CS
) -> bool:
    """Deep DataType comparer (SparkCore.scala:132-147): recurses
    Struct/Array/Map carrying the active mode, requires
    containsNull/valueContainsNull equality, ignores StructField.nullable,
    leaf equality otherwise.

    Do NOT replace with ``found == expected`` — Spark's equality includes
    struct-field nullability and metadata.

    Hot path dispatches on the exact class (the only classes Spark's own
    schema machinery produces) with an identity short-circuit for leaf
    types; isinstance recursion is kept as the fallback so DataType
    subclasses still compare structurally.  NO identity short-circuit
    for containers: a struct with duplicate names must fail against
    itself under by-name modes (SparkCore.scala:72-78).
    """
    tf, te = found.__class__, expected.__class__
    if tf is te:
        if tf is T.StructType:
            if found is expected and _subtree_dup_free(
                found, mode.case_insensitive
            ):
                return True
            return _compare_struct(found, expected, mode)
        if tf is T.ArrayType:
            return (
                found.containsNull == expected.containsNull
                and compare_data_type(found.elementType, expected.elementType, mode)
            )
        if tf is T.MapType:
            return (
                found.valueContainsNull == expected.valueContainsNull
                and compare_data_type(found.keyType, expected.keyType, mode)
                and compare_data_type(found.valueType, expected.valueType, mode)
            )
        if found is expected or tf in _PARAMLESS_ATOMS:
            return True
        if tf is T.StringType:  # one 'collation' parameter
            return found.collation == expected.collation
        return found == expected
    return _compare_data_type_subclass(found, expected, mode)


# Atomic types with no constructor parameters: same class ⇒ equal, no
# __eq__ dunder needed.  Parameterized atoms (DecimalType precision/scale,
# Char/Varchar length, StringType collation, interval fields) are absent
# so they still compare by ==.
_PARAMLESS_ATOMS = frozenset(
    {
        T.NullType,
        T.BooleanType,
        T.ByteType,
        T.ShortType,
        T.IntegerType,
        T.LongType,
        T.FloatType,
        T.DoubleType,
        T.BinaryType,
        T.DateType,
        T.TimestampType,
        T.TimestampNTZType,
    }
)


def _compare_data_type_subclass(
    found: T.DataType, expected: T.DataType, mode: StructMode
) -> bool:
    """Original isinstance-based recursion — reached only when the two
    sides have different concrete classes (e.g. a DataType subclass)."""
    if isinstance(found, T.StructType) and isinstance(expected, T.StructType):
        return _compare_struct(found, expected, mode)
    if isinstance(found, T.ArrayType) and isinstance(expected, T.ArrayType):
        return found.containsNull == expected.containsNull and compare_data_type(
            found.elementType, expected.elementType, mode
        )
    if isinstance(found, T.MapType) and isinstance(expected, T.MapType):
        return (
            found.valueContainsNull == expected.valueContainsNull
            and compare_data_type(found.keyType, expected.keyType, mode)
            and compare_data_type(found.valueType, expected.valueType, mode)
        )
    return found == expected


def _compare_struct(
    found: T.StructType, expected: T.StructType, mode: StructMode
) -> bool:
    """Mode-dispatched struct comparison (SparkCore.scala:79-127).
    The unordered arm (EXACT, the default policy) is checked first and
    keeps its leaf handling inlined — this path runs once per field per
    pipeline boundary and the dunder/call overhead of delegating every
    leaf dominates the metadata comparison."""
    if found is expected and _subtree_dup_free(found, mode.case_insensitive):
        return True
    if mode.kind == "unordered":
        fnd_by = _unique_fields_by_name(found, mode)
        exp_by = _unique_fields_by_name(expected, mode)
        if fnd_by is None or exp_by is None:
            return False
        if fnd_by.keys() != exp_by.keys():  # dict views: C-level set equality
            return False
        ci = mode.case_insensitive
        for k, ef in exp_by.items():
            fd = fnd_by[k].dataType
            ed = ef.dataType
            if fd is ed:
                # identical object: equal unless a nested struct carries
                # duplicate names (cached flag)
                if _subtree_dup_free(fd, ci):
                    continue
            else:
                cf = fd.__class__
                if cf is ed.__class__:
                    if cf in _PARAMLESS_ATOMS:
                        continue
                    if cf is T.StringType:  # one 'collation' parameter
                        if fd.collation == ed.collation:
                            continue
                        return False
            if not compare_data_type(fd, ed, mode):
                return False
        return True

    if mode.kind == "by_position":
        if len(found.fields) != len(expected.fields):
            return False
        return all(
            compare_data_type(ff.dataType, ef.dataType, mode)
            for ff, ef in zip(found.fields, expected.fields)
        )

    if mode.kind == "ordered":
        if len(found.fields) != len(expected.fields):
            return False
        return all(
            mode.norm(ff.name) == mode.norm(ef.name)
            and compare_data_type(ff.dataType, ef.dataType, mode)
            for ff, ef in zip(found.fields, expected.fields)
        )

    fnd_by = _unique_fields_by_name(found, mode)
    exp_by = _unique_fields_by_name(expected, mode)
    if fnd_by is None or exp_by is None:
        return False

    if mode.kind == "backward":
        for key, ef in exp_by.items():
            ff = fnd_by.get(key)
            if ff is None:
                if not _missing_allowed(ef):
                    return False
            elif not compare_data_type(ff.dataType, ef.dataType, mode):
                return False
        return True

    if mode.kind == "forward":
        for key, ff in fnd_by.items():
            ef = exp_by.get(key)
            if ef is None or not compare_data_type(ff.dataType, ef.dataType, mode):
                return False
        return True

    raise ValueError(f"unknown struct mode {mode.kind!r}")


class RuntimeSchemaComparator:
    """The five comparison strategies + policy dispatch
    (SparkCore.scala:38-52, 150-189)."""

    @staticmethod
    def unordered(
        expected: T.StructType, found: T.StructType, case_insensitive: bool = True
    ) -> bool:
        """Unordered name equality; duplicate names on either side fail the
        match (SparkCore.scala:72-78, 93-103)."""
        return _compare_struct(
            found, expected, _MODES[("unordered", case_insensitive)]
        )

    @staticmethod
    def ordered(
        expected: T.StructType, found: T.StructType, case_insensitive: bool = False
    ) -> bool:
        """Length + per-position name (CS/CI) + type (SparkCore.scala:86-91)."""
        return _compare_struct(
            found, expected, _MODES[("ordered", case_insensitive)]
        )

    @staticmethod
    def by_position(expected: T.StructType, found: T.StructType) -> bool:
        """Length + per-position type only (SparkCore.scala:82-84)."""
        return _compare_struct(found, expected, _MODES[("by_position", False)])

    @staticmethod
    def backward(
        expected: T.StructType, found: T.StructType, case_insensitive: bool = False
    ) -> bool:
        """Every expected field is present with matching type OR its absence
        is allowed (nullable or ctdc.hasDefault); extras in found are fine;
        duplicates on either side fail; recursive in backward mode
        (SparkCore.scala:105-116)."""
        return _compare_struct(
            found, expected, _MODES[("backward", case_insensitive)]
        )

    @staticmethod
    def forward(
        expected: T.StructType, found: T.StructType, case_insensitive: bool = False
    ) -> bool:
        """Every found field must exist in expected with matching type;
        duplicates on either side fail; recursive in forward mode
        (SparkCore.scala:118-127)."""
        return _compare_struct(
            found, expected, _MODES[("forward", case_insensitive)]
        )

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
