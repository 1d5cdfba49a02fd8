"""Contract source generation — the migration path INTO the engine.

A user of the reference has Scala case classes; a user adopting this
engine usually has existing parquet/tables.  ``contract_source`` turns a
live ``StructType`` (e.g. ``spark.read.parquet(p).schema``) into the
Python dataclass-contract source for it, so the explicit-schema +
pin discipline can start from day one instead of after hand-transcribing
schemas.  Nested structs become nested @contract dataclasses; arrays and
maps carry their containsNull/valueContainsNull through Optional element
annotations; unsupported leaf types fail loudly (the contract type
system is deliberately closed, ContractsCore.scala:153-156).

The generated source round-trips: ``spark_schema(generated contract) ==
input schema`` up to field metadata — asserted in tests.
"""

from __future__ import annotations

import keyword
import re

from pyspark.sql import types as T

from .schema import _PRIM_TO_SPARK
from .shape import _ATOMIC_KEYS

__all__ = ["contract_source", "load_contract", "UnsupportedSchemaError"]


class UnsupportedSchemaError(TypeError):
    """The schema uses a type outside the closed contract leaf set."""


# annotation text per CANONICAL shape-name — the one table codegen owns;
# the Spark-type keys and the atomic-key set are DERIVED from the
# shape/schema layer's tables below, so a leaf added (or removed) there
# cannot silently diverge from what codegen accepts: a missing
# annotation fails this module's import, not a user's generation call
_ANN_BY_SHAPE_NAME = {
    "string": "str",
    "long": "int",
    "int": "int32",
    "short": "int16",
    "byte": "int8",
    "double": "float",
    "float": "float32",
    "boolean": "bool",
    "date": "datetime.date",
    "timestamp": "datetime.datetime",
    "timestamp_ntz": "timestamp_ntz",
    "decimal(38,18)": "decimal.Decimal",
}
_LEAVES = {
    dt: _ANN_BY_SHAPE_NAME[name] for name, dt in _PRIM_TO_SPARK.items()
}
_ATOMIC_KEY_TYPES = tuple(
    type(_PRIM_TO_SPARK[name]) for name in sorted(_ATOMIC_KEYS)
)

_SENTINELS = {"int32", "int16", "int8", "float32", "timestamp_ntz"}


def _ident(name: str) -> str:
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name) or keyword.iskeyword(
        name
    ):
        raise UnsupportedSchemaError(
            f"field name {name!r} is not a valid Python identifier; "
            "rename the column before generating a contract"
        )
    return name


def _annotation(
    dt: T.DataType, nullable_slot: bool, classes: list[tuple[str, list[str]]],
    used: set, prefix: str,
) -> str:
    if isinstance(dt, T.DecimalType):
        if (dt.precision, dt.scale) != (38, 18):
            raise UnsupportedSchemaError(
                f"decimal({dt.precision},{dt.scale}) is outside the contract "
                "set (only decimal(38,18) maps, reference "
                "DecimalType.SYSTEM_DEFAULT)"
            )
        used.add("decimal")
        inner = "decimal.Decimal"
    elif isinstance(dt, T.ArrayType):
        elem = _annotation(
            dt.elementType, dt.containsNull, classes, used, prefix
        )
        inner = f"list[{elem}]"
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, _ATOMIC_KEY_TYPES):
            raise UnsupportedSchemaError(
                f"map key type {dt.keyType.simpleString()} is not atomic"
            )
        key = _annotation(dt.keyType, False, classes, used, prefix)
        val = _annotation(
            dt.valueType, dt.valueContainsNull, classes, used, prefix
        )
        inner = f"dict[{key}, {val}]"
    elif isinstance(dt, T.StructType):
        name = f"{prefix}_{len(classes)}"
        _emit_class(dt, name, classes, used)
        inner = f'"{name}"'
    else:
        try:
            inner = _LEAVES[dt]
        except KeyError:
            raise UnsupportedSchemaError(
                f"type {dt.simpleString()} is outside the closed contract "
                "leaf set"
            ) from None
        if inner in _SENTINELS:
            used.add(inner)
        if inner.startswith("datetime."):
            used.add("datetime")
    if nullable_slot:
        used.add("Optional")
        return f"Optional[{inner}]"
    return inner


def _emit_class(
    schema: T.StructType, name: str, classes: list[tuple[str, list[str]]],
    used: set,
) -> None:
    # kw_only=True lets defaulted (nullable) fields keep their schema
    # position instead of being forced to the tail
    lines: list[str] = []
    for f in schema.fields:
        ann = _annotation(f.dataType, False, classes, used, name)
        if f.nullable:
            used.add("Optional")
            lines.append(f"    {_ident(f.name)}: Optional[{ann}] = None")
        else:
            lines.append(f"    {_ident(f.name)}: {ann}")
    classes.append((name, lines or ["    pass"]))


def load_contract(source: str, name: str, module_name: str = "ctdc_generated"):
    """Exec generated contract source inside a real registered module
    (``typing.get_type_hints`` resolves annotations through
    ``sys.modules[cls.__module__]``, so a bare ``exec(src, {})`` would
    fail on ``Optional``) and return the named contract class."""
    import sys
    import types as pytypes

    mod = pytypes.ModuleType(module_name)
    sys.modules[module_name] = mod
    exec(source, mod.__dict__)
    return getattr(mod, name)


def contract_source(schema: T.StructType, name: str = "GeneratedContract") -> str:
    """Return Python source declaring ``name`` as a @contract dataclass
    matching ``schema`` (nested structs become auxiliary classes emitted
    first).  Write it to a module file, or load it in-process with
    :func:`load_contract`; the result round-trips through
    ``spark_schema``."""
    classes: list[tuple[str, list[str]]] = []
    used: set = set()
    _emit_class(schema, name, classes, used)

    # postponed annotations FIRST: without this, a nullable column whose
    # name shadows an emitted annotation name (a column literally called
    # 'Optional', 'str', 'datetime', ...) binds that name to None in the
    # class namespace and the NEXT annotation's evaluation crashes with
    # "'NoneType' object is not subscriptable".  The in-process
    # load_contract path only survived by accident (exec inherits this
    # module's own __future__ flag); the documented write-to-a-file path
    # needs the import in the generated source itself.
    imports = [
        "from __future__ import annotations",
        "",
        "from dataclasses import dataclass",
        "",
    ]
    # stdlib imports go after the __future__ line (which MUST stay
    # first — inserting above it would be a SyntaxError in the
    # generated module)
    if "datetime" in used:
        imports.insert(2, "import datetime")
    if "decimal" in used:
        imports.insert(2, "import decimal")
    if "Optional" in used:
        imports.append("from typing import Optional")
    sentinels = sorted(used & _SENTINELS)
    imports.append(
        "from compile_time_data_contracts_spark.contracts.shape import contract"
    )
    if sentinels:
        imports.append(
            "from compile_time_data_contracts_spark.contracts.types import "
            + ", ".join(sentinels)
        )

    blocks = []
    for cls_name, body in classes:
        blocks.append(
            "@contract\n@dataclass(kw_only=True)\nclass " + cls_name + ":\n"
            + "\n".join(body)
        )
    return "\n".join(imports) + "\n\n\n" + "\n\n\n".join(blocks) + "\n"
