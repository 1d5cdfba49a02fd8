"""Round-6 advisor-fix regressions: the four latent hazards flagged in
round 5's ADVICE, each pinned by the exact scenario that used to be
data-luck.

1. q191's oracle was null-ambiguous: a NULL c_acctbal row is routed
   CLEAN by `apply_expectations` (row_ok treats NULL as passing) but a
   bare `(c_acctbal < 0 OR ...)` flag is NULL in SQL, silently dropping
   the row from both the reject and the clean counts.  The planted-null
   parity test runs the real gate query AND the registered oracle on a
   fixture that HAS nulls.
2. `ivf_pq_topk` keyed index staleness only on (row count, max id), so
   re-pointing different n_clusters/m/ksub at the same path silently
   searched the old geometry.  Now the params ride in pq/meta.
3. `_capped_pair_scores` unconditionally broadcast the hot-shingle
   list; a small max_df over a diverse corpus makes that list
   arbitrarily large.  Now it is counted and falls back to a shuffle
   anti-join, byte-identical results.
4. `ewma_trailing` silently mis-weighted when value_col had NULLs
   (collect_list drops them, misaligning lags).  Now it raise_errors at
   execution.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------- ewma


def test_ewma_null_value_fails_fast(spark):
    from compile_time_data_contracts_spark.operators.timeseries import (
        ewma_trailing,
    )

    rows = [(1, 0, 1.0), (1, 1, None), (1, 2, 3.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = ewma_trailing(df, "k", ["t"], "v")
    with pytest.raises(Exception, match="ewma_trailing: NULL"):
        out.collect()


def test_ewma_no_null_path_unchanged(spark):
    # the fail-fast branch must not perturb the clean path
    from compile_time_data_contracts_spark.operators.timeseries import (
        ewma_trailing,
    )

    df = spark.createDataFrame(
        [(1, 0, 7.5), (1, 1, 0.0)], "k long, t long, v double"
    )
    first = ewma_trailing(df, "k", ["t"], "v").orderBy("t").collect()[0]
    assert first.ewma == 7.5


# ------------------------------------------------- q191 null routing


def test_expectations_route_nulls_clean_for_range_and_set(spark):
    # row_ok semantics: NULL value passes in_range / accepted_values
    # (only not_null blames nulls) — pin it at the operator level
    from compile_time_data_contracts_spark.operators.expectations import (
        accepted_values,
        apply_expectations,
        in_range,
        not_null,
    )

    rows = [
        (1, "ok", 0, 5.0, "AUTOMOBILE"),      # clean
        (2, "null-bal", 0, None, "BUILDING"),  # clean: NULL passes range
        (3, "null-seg", 0, 5.0, None),         # clean: NULL passes set
        (4, None, 0, 5.0, "BUILDING"),         # quarantined: not_null
        (5, "bad-bal", 0, -3.0, "BUILDING"),   # quarantined: range
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    rules = [
        not_null("c_name"),
        in_range("c_acctbal", 0.0, 10000.0),
        accepted_values("c_mktsegment", ["AUTOMOBILE", "BUILDING"]),
    ]
    clean, quar = apply_expectations(df, rules)
    assert sorted(r.c_custkey for r in clean.collect()) == [1, 2, 3]
    assert sorted(r.c_custkey for r in quar.collect()) == [4, 5]


def test_q191_oracle_parity_with_planted_nulls(spark, tmp_path):
    # the ADVICE bug-class: run the REAL gate query and the REGISTERED
    # oracle SQL on a customer table that contains NULLs in every
    # rule column, and require exact agreement — the old oracle lost
    # the NULL-balance row from both buckets
    import duckdb

    import __spark_entry__ as entry

    rows = [
        (1, "alpha", 0, 100.0, "AUTOMOBILE"),
        (2, "beta", 1, None, "BUILDING"),       # NULL bal -> clean
        (3, "gamma", 2, 50.0, None),            # NULL seg -> clean
        (4, None, 3, 50.0, "MACHINERY"),        # NULL name -> reject
        (5, "delta", 4, -7.0, "HOUSEHOLD"),     # range reject
        (6, "eps", 5, 20000.0, "FURNITURE"),    # range + seg reject
        (7, None, 6, None, None),               # name reject only
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    sf = str(tmp_path)
    df.repartition(1).write.parquet(f"{sf}/customer.parquet")

    got = {
        (r.rule, r.n_rows)
        for r in entry.queries()["q191_expectations_quarantine"](
            spark, sf
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf}/customer.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1])
        for r in con.execute(
            entry.oracle_sql()["q191_expectations_quarantine"]
        ).fetchall()
    }
    assert got == want
    # and the counts themselves are what the routing semantics say:
    # 3 clean (1, 2, 3), not_null blames 4 and 7, range blames 5 and 6,
    # set blames 6
    assert ("__clean__", 3) in got
    assert ("not_null:c_name", 2) in got
    assert ("in_range:c_acctbal", 2) in got
    assert ("accepted_values:c_mktsegment", 1) in got


# --------------------------------------- capped-pair broadcast guard


def test_capped_pairs_shuffle_fallback_identical(spark, monkeypatch):
    from compile_time_data_contracts_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap here"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs():
        return {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.jaccard_pairs(
                df, threshold=0.3, max_df=3
            ).collect()
        }

    broadcast_path = pairs()
    # force every hot list over the threshold -> shuffle anti-join
    monkeypatch.setattr(dedup, "_HOT_BROADCAST_MAX", 0)
    assert pairs() == broadcast_path
    assert broadcast_path  # the fixture does produce qualifying pairs


# ------------------------------------------- ivf_pq param staleness


def test_ivf_pq_param_mismatch_rebuilds(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.similarity import (
        ivf_pq_topk,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = df.filter(F.col("vec_id") == 11)
    path = str(tmp_path / "ivfpq")

    r1 = ivf_pq_topk(
        df, query, k=3, n_clusters=4, nprobe=4, m=4, ksub=8,
        rerank=50, index_path=path,
    ).collect()
    meta1 = spark.read.parquet(f"{path}/pq/meta").first()
    assert (meta1.n_clusters, meta1.m, meta1.ksub) == (4, 4, 8)

    # same path, different geometry: the operator must REBUILD, not
    # silently serve the m=4/ksub=8 index with degraded recall
    r2 = ivf_pq_topk(
        df, query, k=3, n_clusters=4, nprobe=4, m=2, ksub=4,
        rerank=50, index_path=path,
    ).collect()
    meta2 = spark.read.parquet(f"{path}/pq/meta").first()
    assert (meta2.n_clusters, meta2.m, meta2.ksub) == (4, 2, 4)

    # exact re-rank: the query vector itself is top-1 both times
    assert r1[0].vec_id == 11 and r2[0].vec_id == 11


# --------------------------------------- boilerplate line removal


def test_remove_boilerplate_lines_drops_hot_keeps_order(spark):
    from compile_time_data_contracts_spark.operators.text import (
        remove_boilerplate_lines,
    )

    banner = "Accept cookies to continue"
    rows = [
        (1, f"intro one\n{banner}\nbody one"),
        (2, f"{banner}\nbody two\noutro two"),
        (3, f"body three\n{banner.upper()}"),   # case-insensitive hit
        (4, f"  {banner}  "),                   # whitespace-insensitive
        (5, "unique only\nsecond unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", max_doc_freq=2
        ).collect()
    }
    assert out[1].text == "intro one\nbody one"
    assert out[2].text == "body two\noutro two"
    assert out[3].text == "body three"
    # fully-boilerplate doc survives with empty text, counts intact
    assert out[4].text == "" and out[4].n_lines_dropped == 1
    assert out[5].text == "unique only\nsecond unique"
    assert out[5].n_lines_dropped == 0
    assert out[1].n_lines_kept == 2 and out[1].n_lines_dropped == 1


def test_remove_boilerplate_lines_blank_lines_never_hot(spark):
    from compile_time_data_contracts_spark.operators.text import (
        remove_boilerplate_lines,
    )

    # blank lines appear in every doc but must never count as
    # boilerplate — they are structure, not content
    rows = [(i, "alpha %d\n\nomega %d" % (i, i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate_lines(
        df, "doc_id", "text", max_doc_freq=1
    ).collect()
    assert all(r.n_lines_dropped == 0 for r in out)
    assert all(r.text.count("\n") == 2 for r in out)


def test_boilerplate_index_strips_corpus_hot_from_batch(spark, tmp_path):
    from compile_time_data_contracts_spark.operators.text import (
        boilerplate_index_build,
        remove_boilerplate_against,
    )

    banner = "subscribe to our newsletter"
    corpus = spark.createDataFrame(
        [(i, f"corpus body {i}\n{banner}") for i in range(5)],
        "doc_id long, text string",
    )
    # the batch alone carries the banner ONCE — below any threshold —
    # but it is corpus-hot, so the index strips it anyway
    batch = spark.createDataFrame(
        [(100, f"fresh content\n{banner}\nmore fresh")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bpidx")
    boilerplate_index_build(corpus, idx, max_doc_freq=3)
    out = remove_boilerplate_against(batch, idx).collect()[0]
    assert out.text == "fresh content\nmore fresh"
    assert out.n_lines_dropped == 1

    # different line semantics must be refused, not silently misapplied
    import pytest as _pt

    with _pt.raises(ValueError, match="sep"):
        remove_boilerplate_against(batch, idx, sep="|")


def test_remove_boilerplate_lines_metachar_separator(spark):
    from compile_time_data_contracts_spark.operators.text import (
        remove_boilerplate_lines,
    )

    # F.split's pattern is a Java regex: sep='|' (alternation) or '.'
    # (any-char) must be quoted, or every character becomes a "line"
    banner = "hot line"
    rows = [(i, f"body {i}|{banner}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", max_doc_freq=2, sep="|"
        ).collect()
    }
    for i in range(4):
        assert out[i].text == f"body {i}"
        assert out[i].n_lines_kept == 1
        assert out[i].n_lines_dropped == 1
