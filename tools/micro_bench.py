"""R29/R30 analogues: comparator ns/op + construction-time conforms()
overhead — the two benchmarks the reference actually ships
(/root/reference/src/main/scala/ctdc/bench/RuntimeSchemaBenchmark.scala:36-126
and /root/reference/benchmarks/run-benchmarks.sh:94-200), re-expressed for
the Python engine so BASELINE.md's table has a direct counterpart.

The benchmark schema mirrors RuntimeSchemaBenchmark.scala:24-34 (6-field
contract with nested struct / list-of-struct with optional tags / map with
optional values).  The "Spark built-in" comparator analogue is StructType
equality (PySpark exposes no equalsIgnoreCaseAndNullability).

Context (paper/sections/04-artifact-and-evaluation.tex:23): these checks
run once per sink WRITE, not per row — even a 100× slower Python
comparator is irrelevant to job runtime; this tool exists for parity with
the reference's evidence, not because the numbers gate anything.

Usage: python tools/micro_bench.py [ops_per_iter] (default 20000)
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass
from typing import Optional

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T

from compile_time_data_contracts_spark.contracts.schema import spark_schema
from compile_time_data_contracts_spark.contracts.shape import contract
from compile_time_data_contracts_spark.contracts.conforms import conforms
from compile_time_data_contracts_spark.contracts.policies import SchemaPolicy
from compile_time_data_contracts_spark.runtime.comparator import (
    RuntimeSchemaComparator,
)


# RuntimeSchemaBenchmark.scala:24-34
@contract
@dataclass
class Geo:
    lat: float
    lon: float


@contract
@dataclass
class Address:
    street: str
    city: str
    zip: Optional[int]
    geo: Geo


@contract
@dataclass
class Event:
    kind: str
    at: int
    tags: list[Optional[str]]
    attrs: dict[str, str]


@contract
@dataclass
class Contract:
    id: int
    email: str
    age: Optional[int]
    address: Address
    events: list[Event]
    metrics: dict[str, Optional[int]]


def rename_struct(s: T.StructType, prefix: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f"{prefix}{i}", f.dataType, f.nullable, f.metadata)
            for i, f in enumerate(s.fields)
        ]
    )


def run_case(name, fn, ops, warmup=3, iters=8):
    for _ in range(warmup):
        for _ in range(ops):
            fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter_ns()
        for _ in range(ops):
            fn()
        times.append((time.perf_counter_ns() - t0) / ops)
    avg = sum(times) / len(times)
    print(f"{name:45s} {avg:12.2f} ns/op")
    return avg


def main() -> None:
    ops = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    expected = spark_schema(Contract)
    renamed = rename_struct(expected, "col")
    results = {}

    # R29: runtime comparator ns/op (RuntimeSchemaBenchmark.scala:49-77)
    results["custom_exact_unordered_match"] = run_case(
        "custom_exact_unordered_match",
        lambda: RuntimeSchemaComparator.unordered(expected, expected),
        ops,
    )
    results["custom_exact_unordered_mismatch"] = run_case(
        "custom_exact_unordered_mismatch",
        lambda: RuntimeSchemaComparator.unordered(expected, renamed),
        ops,
    )
    results["custom_by_position_match"] = run_case(
        "custom_by_position_match",
        lambda: RuntimeSchemaComparator.by_position(expected, renamed),
        ops,
    )
    results["spark_structtype_eq"] = run_case(
        "spark_structtype_eq (built-in analogue)",
        lambda: expected == expected,
        ops,
    )

    # R30 analogue: construction-time conforms() over N contract pairs
    # (run-benchmarks.sh:94-200 times scalac witness summons; here the
    # proof runs at pipeline-construction time, so we time conforms())
    for n_pairs in (10, 25, 50):
        t0 = time.perf_counter()
        for _ in range(n_pairs):
            conforms(Contract, Contract, SchemaPolicy.EXACT)
            conforms(Contract, Contract, SchemaPolicy.BACKWARD)
        dt = time.perf_counter() - t0
        results[f"conforms_{n_pairs}_pairs_ms"] = dt * 1000
        print(f"{'conforms x' + str(n_pairs) + ' pairs':45s} {dt*1000:12.2f} ms total")

    print(json.dumps({"metric": "micro_bench", "results": results}))


if __name__ == "__main__":
    main()
