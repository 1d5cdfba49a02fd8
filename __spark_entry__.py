"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship 5-way star join at sf0.001.
queries()    — the full SURVEY.md §2.2 inventory (Q01+ plus LLM-pipeline
               extensions), each a (spark, sf_dir) -> DataFrame callable.
oracle_sql() — DuckDB-equivalent ANSI SQL per query; sketch/LSH/streaming
               entries intentionally omit the oracle (rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compile_time_data_contracts_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
