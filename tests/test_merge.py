"""Bucket-pruned MERGE: pruning, byte-identity of untouched buckets,
and equivalence with the full-outer-join rewrite (q133 semantics)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.merge import (
    BUCKET_COL,
    merge_upsert,
    snapshot_read,
    snapshot_write,
)


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [Row(k=i, v=f"v{i}", score=float(i)) for i in range(200)]
    )


def _files(path):
    return {
        p: (os.path.getmtime(p), os.path.getsize(p))
        for p in glob.glob(f"{path}/data/**/*.parquet", recursive=True)
    }


def test_merge_rewrites_only_touched_buckets(spark, base, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_write(base, path, "k", num_buckets=16)
    before = _files(path)
    updates = spark.createDataFrame(
        [Row(k=7, v="updated", score=99.0), Row(k=1000, v="insert", score=1.0)]
    )
    touched = merge_upsert(spark, path, updates)
    after = _files(path)
    # 2 keys -> at most 2 buckets read+written
    assert 1 <= len(touched) <= 2
    untouched = {
        p: s
        for p, s in before.items()
        if not any(f"{BUCKET_COL}={t}/" in p for t in touched)
    }
    assert untouched  # the snapshot has >2 buckets, so some are untouched
    for p, s in untouched.items():
        assert after[p] == s  # byte-identical: same mtime, same size
    # touched buckets were actually rewritten
    assert any(
        p not in before or after[p] != before[p]
        for p in after
        if any(f"{BUCKET_COL}={t}/" in p for t in touched)
    )


def test_merge_matches_full_outer_rewrite(spark, base, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_write(base, path, "k", num_buckets=8)
    updates = spark.createDataFrame(
        [Row(k=i, v="u", score=-1.0) for i in range(0, 50, 5)]
        + [Row(k=500 + i, v="new", score=0.5) for i in range(3)]
    )
    merge_upsert(spark, path, updates)
    got = snapshot_read(spark, path)
    u, c = updates.alias("u"), base.alias("c")
    ref = c.join(u, F.col("c.k") == F.col("u.k"), "full_outer").select(
        *[
            F.coalesce(F.col(f"u.{x}"), F.col(f"c.{x}")).alias(x)
            for x in base.columns
        ]
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_merge_is_idempotent(spark, base, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_write(base, path, "k", num_buckets=8)
    updates = spark.createDataFrame([Row(k=3, v="u3", score=0.0)])
    merge_upsert(spark, path, updates)
    once = sorted(map(tuple, snapshot_read(spark, path).collect()))
    merge_upsert(spark, path, updates)
    assert sorted(map(tuple, snapshot_read(spark, path).collect())) == once


def test_merge_empty_updates_touches_nothing(spark, base, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_write(base, path, "k", num_buckets=8)
    before = _files(path)
    touched = merge_upsert(spark, path, base.filter(F.lit(False)))
    assert touched == []
    assert _files(path) == before


def test_merge_validates_schema_and_key(spark, base, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_write(base, path, "k", num_buckets=4)
    with pytest.raises(ValueError, match="key column"):
        merge_upsert(spark, path, base.withColumnRenamed("k", "kk"))
    with pytest.raises(ValueError, match="schema"):
        merge_upsert(spark, path, base.withColumn("extra", F.lit(1)))


def test_snapshot_scan_is_partition_pruned(spark, base, tmp_path):
    """The touched-bucket filter must prune at the directory level
    (PartitionFilters on the bucket partition column), not post-scan."""
    path = str(tmp_path / "snap")
    snapshot_write(base, path, "k", num_buckets=16)
    sliced = spark.read.parquet(f"{path}/data").filter(
        F.col(BUCKET_COL).isin([1, 2, 3])
    )
    plan = sliced._sc._jvm.PythonSQLUtils.explainString(
        sliced._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*__bucket[^\]]*\]", plan)
    assert m, plan
