"""Property-based tests for the conformance prover.

The reference's suite is an example matrix (SchemaConformsSpec.scala); these
properties cover the algebra the examples sample: reflexivity under every
policy, reorder (in)sensitivity, subset semantics of Backward/Forward, Full's
universal acceptance, field-optionality invariance (quirk 1) vs nested
collection-optionality strictness (quirk 2), all over randomized shape trees.
"""

from __future__ import annotations

import dataclasses

import pytest
from hypothesis import given, settings, strategies as st

from compile_time_data_contracts_spark.contracts.conforms import (
    ContractDriftError,
    conforms,
)
from compile_time_data_contracts_spark.contracts.policies import SchemaPolicy
from compile_time_data_contracts_spark.contracts.shape import (
    FieldShape,
    MapShape,
    PrimitiveShape,
    SequenceShape,
    StructShape,
)

PRIMS = ["String", "Int", "Long", "Double", "Boolean", "Date", "Timestamp"]
ATOMIC_KEYS = ["String", "Int", "Long"]


def shapes(depth: int = 2):
    prim = st.sampled_from(PRIMS).map(PrimitiveShape)
    if depth == 0:
        return prim
    inner = shapes(depth - 1)
    return st.one_of(
        prim,
        st.tuples(inner, st.booleans()).map(
            lambda t: SequenceShape(t[0], t[1])
        ),
        st.tuples(st.sampled_from(ATOMIC_KEYS), inner, st.booleans()).map(
            lambda t: MapShape(t[0], t[1], t[2])
        ),
        struct_shapes(depth - 1),
    )


def struct_shapes(depth: int = 2):
    names = st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda s: s.lower(),
    )
    return names.flatmap(
        lambda ns: st.tuples(
            *[
                st.tuples(shapes(depth), st.booleans(), st.booleans()).map(
                    lambda t, n=n: FieldShape(n, t[0], t[1], t[2])
                )
                for n in ns
            ]
        ).map(StructShape)
    )


ALL_POLICIES = list(SchemaPolicy)


@settings(max_examples=60, deadline=None)
@given(struct_shapes(), st.sampled_from(ALL_POLICIES))
def test_reflexivity(s, policy):
    """Every shape conforms to itself under every policy."""
    assert conforms(s, s, policy).ok


@settings(max_examples=60, deadline=None)
@given(struct_shapes())
def test_reorder_invariance_unordered_sensitivity_ordered(s):
    """Reversing field order never breaks unordered policies; ordered
    policies reject iff the name sequence actually changed."""
    rev = StructShape(tuple(reversed(s.fields)))
    assert conforms(rev, s, SchemaPolicy.EXACT, raise_on_drift=False).ok
    assert conforms(
        rev, s, SchemaPolicy.EXACT_UNORDERED_CI, raise_on_drift=False
    ).ok
    ordered_ok = conforms(
        rev, s, SchemaPolicy.EXACT_ORDERED, raise_on_drift=False
    ).ok
    assert ordered_ok == (
        [f.name for f in rev.fields] == [f.name for f in s.fields]
    )


@settings(max_examples=60, deadline=None)
@given(struct_shapes(), struct_shapes())
def test_full_accepts_anything(a, b):
    assert conforms(a, b, SchemaPolicy.FULL).ok


@settings(max_examples=60, deadline=None)
@given(struct_shapes())
def test_backward_allows_producer_extras(s):
    """A producer with extra fields backward-conforms to the original."""
    extra = StructShape(
        s.fields + (FieldShape("zzextra", PrimitiveShape("String")),)
    )
    assert conforms(extra, s, SchemaPolicy.BACKWARD).ok
    # ...but EXACT rejects the extra
    assert not conforms(extra, s, SchemaPolicy.EXACT, raise_on_drift=False).ok


@settings(max_examples=60, deadline=None)
@given(struct_shapes())
def test_backward_missing_required_field_drifts(s):
    """Dropping a required (non-optional, no-default) contract field from
    the producer breaks Backward; dropping an optional one does not."""
    required = StructShape(
        s.fields
        + (
            FieldShape(
                "zzreq", PrimitiveShape("Long"), has_default=False,
                is_optional=False,
            ),
        )
    )
    assert not conforms(
        s, required, SchemaPolicy.BACKWARD, raise_on_drift=False
    ).ok
    optional = StructShape(
        s.fields
        + (
            FieldShape(
                "zzopt", PrimitiveShape("Long"), has_default=False,
                is_optional=True,
            ),
        )
    )
    assert conforms(s, optional, SchemaPolicy.BACKWARD).ok


@settings(max_examples=60, deadline=None)
@given(struct_shapes())
def test_forward_is_subset_semantics(s):
    """A producer subset forward-conforms; a producer extra breaks it."""
    if len(s.fields) > 1:
        subset = StructShape(s.fields[:-1])
        assert conforms(subset, s, SchemaPolicy.FORWARD).ok
    extra = StructShape(
        s.fields + (FieldShape("zzextra", PrimitiveShape("String")),)
    )
    assert not conforms(
        extra, s, SchemaPolicy.FORWARD, raise_on_drift=False
    ).ok


@settings(max_examples=60, deadline=None)
@given(struct_shapes(), st.sampled_from(ALL_POLICIES))
def test_field_optionality_invariance(s, policy):
    """Quirk 1: Option[T] vs T at field level never affects conformance —
    is_optional/has_default are metadata, compared on the unwrapped shape."""
    flipped = StructShape(
        tuple(
            dataclasses.replace(
                f, is_optional=not f.is_optional, has_default=True
            )
            for f in s.fields
        )
    )
    assert conforms(flipped, s, policy).ok


@settings(max_examples=60, deadline=None)
@given(struct_shapes())
def test_nested_contains_null_is_strict(s):
    """Quirk 2: containsNull INSIDE a sequence participates in comparison
    under every exact policy."""
    seq_field = FieldShape("zzseq", SequenceShape(PrimitiveShape("Int"), False))
    seq_field_opt = FieldShape(
        "zzseq", SequenceShape(PrimitiveShape("Int"), True)
    )
    a = StructShape(s.fields + (seq_field,))
    b = StructShape(s.fields + (seq_field_opt,))
    for policy in (
        SchemaPolicy.EXACT,
        SchemaPolicy.EXACT_ORDERED,
        SchemaPolicy.EXACT_BY_POSITION,
        SchemaPolicy.BACKWARD,
        SchemaPolicy.FORWARD,
    ):
        report = conforms(a, b, policy, raise_on_drift=False)
        assert not report.ok, policy
        assert report.mismatch


@settings(max_examples=60, deadline=None)
@given(struct_shapes())
def test_rename_reports_missing_and_extra(s):
    """Renaming a field under EXACT yields exactly one missing and one
    extra drift, with the renderable paths."""
    renamed = StructShape(
        (dataclasses.replace(s.fields[0], name="zzrenamed"),) + s.fields[1:]
    )
    with pytest.raises(ContractDriftError) as exc:
        conforms(renamed, s, SchemaPolicy.EXACT)
    msg = str(exc.value)
    assert "Missing attributes" in msg
    assert "Extra attributes" in msg
    assert "zzrenamed" in msg
