"""Round-5 regression tests.

Pins the ADVICE-r4 edge cases (Spark's DESCENDING ``sequence(a, b)``
when b < a — q162 empty-text chunking, q179 <=1-token documents — and
the q165 node-0 mass leak) plus the parameterized ``pagerank``
(explicit dangling policy, precomputed n_nodes, checkpoint-every-k for
long runs).
"""

from __future__ import annotations

import pytest


def _write_edge_documents(spark, path: str) -> None:
    """A documents table whose rows hit the descending-sequence traps:
    empty text, 1-token text, and ordinary multi-token docs."""
    rows = [
        (1, "", "en", "web", 0),
        (2, "solo", "en", "web", 4),
        (3, "two tokens here now", "en", "web", 19),
        (4, "x" * 95, "en", "web", 95),  # 2 full chunks + 15-char tail
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _oracle_rows(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB wants the part-file glob
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    return con.sql(sql).fetchall()


def test_q162_empty_text_emits_no_chunks_and_matches_oracle(spark, tmp_path):
    import __spark_entry__ as entrymod

    sf = str(tmp_path / "sf_edge")
    _write_edge_documents(spark, sf)
    got = entrymod.queries()["q162_sql_table_udf_chunks"](spark, sf)
    rows = {(r.doc_id, r.chunk_idx, r.chunk) for r in got.collect()}
    # empty doc 1 contributes NOTHING (descending sequence would have
    # emitted chunk_idx 0 and -1); doc 4 (95 chars / width 40) => 3 chunks
    assert not any(d == 1 for d, _, _ in rows)
    assert sorted(i for d, i, _ in rows if d == 4) == [0, 1, 2]
    oracle = {
        tuple(r)
        for r in _oracle_rows(
            entrymod.oracle_sql()["q162_sql_table_udf_chunks"], sf
        )
    }
    assert rows == oracle


def test_q179_short_docs_emit_no_bigrams_and_match_oracle(spark, tmp_path):
    import __spark_entry__ as entrymod

    sf = str(tmp_path / "sf_edge179")
    _write_edge_documents(spark, sf)
    got = entrymod.queries()["q179_lm_perplexity_filter"](spark, sf)
    rows = {(r.doc_id, r.n_bigrams, r.perplexity_r) for r in got.collect()}
    # docs 1 ('' -> ['']), 2 (one token), and 4 (one 95-char token) must
    # produce NO bigram rows; the descending sequence(1, 0) bug emitted
    # (w1, NULL)/(NULL, w2) pairs that skewed every doc sharing w1
    assert {d for d, _, _ in rows} == {3}
    oracle = {
        (r[0], r[1], float(r[2]))
        for r in _oracle_rows(
            entrymod.oracle_sql()["q179_lm_perplexity_filter"], sf
        )
    }
    assert {(d, n, float(p)) for d, n, p in rows} == oracle


# ------------------------------------------------ parameterized pagerank


def _ring_with_dangler(spark):
    # 0 -> 1 -> 2 -> 0 ring plus dangler 3 fed by 0 (3 has no out-edges)
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src long, dst long"
    )
    return nodes, edges


def test_pagerank_dangling_drop_loses_mass(spark):
    from compile_time_data_contracts_spark.operators.graph import pagerank

    nodes, edges = _ring_with_dangler(spark)
    pr = pagerank(nodes, edges, iters=5, dangling="drop")
    total = sum(r.pr for r in pr.collect())
    assert total < 0.999  # dangler's mass vanished — honest drop policy


def test_pagerank_dangling_redistribute_conserves_mass(spark):
    from compile_time_data_contracts_spark.operators.graph import pagerank

    nodes, edges = _ring_with_dangler(spark)
    pr = pagerank(nodes, edges, iters=5, dangling="redistribute")
    total = sum(r.pr for r in pr.collect())
    assert abs(total - 1.0) < 1e-12


def test_pagerank_redistribute_matches_numpy_teleport_model(spark):
    import numpy as np

    from compile_time_data_contracts_spark.operators.graph import pagerank

    nodes, edges = _ring_with_dangler(spark)
    got = {
        r.id: r.pr
        for r in pagerank(
            nodes, edges, iters=6, dangling="redistribute", n_nodes=4
        ).collect()
    }
    edges_py = [(0, 1), (1, 2), (2, 0), (0, 3)]
    M = np.zeros((4, 4))
    outdeg = {0: 2, 1: 1, 2: 1}
    for s, d in edges_py:
        M[d, s] = 1.0 / outdeg[s]
    v = np.full(4, 0.25)
    for _ in range(6):
        dangling_mass = v[3]  # node 3 has no out-edges
        v = 0.15 / 4 + 0.85 * (M @ v + dangling_mass / 4)
    for i in range(4):
        assert abs(got[i] - v[i]) < 1e-12


def test_pagerank_invalid_dangling_policy_raises(spark):
    from compile_time_data_contracts_spark.operators.graph import pagerank

    nodes, edges = _ring_with_dangler(spark)
    with pytest.raises(ValueError, match="dangling"):
        pagerank(nodes, edges, dangling="teleport-maybe")


def test_pagerank_checkpointed_long_run_matches_short_chain(spark):
    """20 iterations with checkpoint_every=5 (lineage cut 4x) must agree
    exactly with the same 20 rounds computed as one lazy chain — the
    checkpoint is a pure lineage operation."""
    from compile_time_data_contracts_spark.operators.graph import pagerank

    nodes, edges = _ring_with_dangler(spark)
    long_run = {
        r.id: r.pr
        for r in pagerank(
            nodes, edges, iters=20, checkpoint_every=5, n_nodes=4
        ).collect()
    }
    lazy = {
        r.id: r.pr
        for r in pagerank(
            nodes, edges, iters=20, checkpoint_every=99, n_nodes=4
        ).collect()
    }
    assert long_run == lazy


# ------------------------------------------ hot-shingle cap / prefix filter


def _boilerplate_corpus(spark):
    """8 docs: 0-1 near-identical (high containment both ways), 2 is a
    quote contained in 3, 4-7 unrelated but ALL SHARING one boilerplate
    trigram ("terms of service") — the hot shingle."""
    boiler = " terms of service"
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta" + boiler),
        (1, "alpha beta gamma delta epsilon zeta eta iota" + boiler),
        (2, "red green blue cyan magenta"),
        (3, "red green blue cyan magenta yellow black white pink gray"
            + boiler),
        (4, "one two three four five six" + boiler),
        (5, "seven eight nine ten eleven twelve" + boiler),
        (6, "aa bb cc dd ee ff" + boiler),
        (7, "gg hh ii jj kk ll" + boiler),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capped_jaccard_identical_to_exact(spark):
    from compile_time_data_contracts_spark.operators.dedup import (
        jaccard_pairs,
    )

    docs = _boilerplate_corpus(spark)
    exact = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in jaccard_pairs(docs, threshold=0.3).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in jaccard_pairs(docs, threshold=0.3, max_df=3).collect()
    }
    assert exact == capped
    assert any(a == 0 and b == 1 for a, b, _ in exact)  # the real pair


def test_capped_containment_identical_and_finds_quote(spark):
    from compile_time_data_contracts_spark.operators.dedup import (
        containment_pairs,
    )

    docs = _boilerplate_corpus(spark)
    exact = {
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs(docs, threshold=0.8, max_df=3).collect()
    }
    assert exact == capped
    assert any(a == 2 and b == 3 for a, b, _ in exact)  # quote-in-doc


def test_hot_shingle_report_finds_boilerplate_only(spark):
    from compile_time_data_contracts_spark.operators.dedup import (
        hot_shingle_report,
    )

    docs = _boilerplate_corpus(spark)
    hot = hot_shingle_report(docs, max_df=3).collect()
    assert [(r.shingle, r.df) for r in hot] == [("terms|of|service", 7)]


def test_banding_then_containment_matches_exact_on_comparable_sizes(spark):
    from compile_time_data_contracts_spark.operators.dedup import (
        banding_then_containment,
        containment_pairs,
    )

    # comparable-size near-dups only (banding's home turf)
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (2, "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b, r.containment)
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    banded = {
        (r.doc_a, r.doc_b, r.containment)
        for r in banding_then_containment(docs, threshold=0.8).collect()
    }
    assert banded == exact and len(exact) == 2  # both directions of (0,1)


def test_prefix_filtered_jaccard_identical_to_naive(spark):
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    # token-set records, one stop-token ("common") in every record,
    # with a block column; matched pair (10, 11) shares 3 of 4 tokens
    rows = [
        (10, "blk1", ["common", "aa", "bb", "cc"]),
        (11, "blk1", ["common", "aa", "bb", "dd"]),
        (12, "blk1", ["common", "xx", "yy", "zz"]),
        (13, "blk2", ["common", "aa", "bb", "cc"]),  # other block: no pair
        (14, "blk2", ["common", "pp", "qq", "rr"]),
    ]
    df = spark.createDataFrame(rows, "id long, blk string, toks array<string>")
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in prefix_filtered_jaccard_pairs(
            df, "id", "toks", 0.5, block_col="blk"
        ).collect()
    }
    # naive within-block all-pairs
    a, b = df.alias("a"), df.alias("b")
    naive = {
        (r.doc_a, r.doc_b, round(r.jaccard, 6))
        for r in a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            (
                F.size(F.array_intersect("a.toks", "b.toks")).cast("double")
                / F.size(F.array_union("a.toks", "b.toks"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == naive and (10, 11, 0.6) in got
    assert not any(a_ == 10 and b_ == 13 for a_, b_, _ in got)  # blocked


def test_prefix_filtered_jaccard_no_block(spark):
    from compile_time_data_contracts_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),
        (3, ["p", "q", "r", "s"]),
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 2))
        for r in prefix_filtered_jaccard_pairs(df, "id", "toks", 0.5).collect()
    }
    assert got == {(1, 2, 0.6)}


# --------------------------------------------------- expectations routing


def test_apply_expectations_routes_and_labels(spark, tmp_path):
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.expectations import (
        accepted_values,
        apply_expectations,
        in_range,
        not_null,
    )

    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (2, None, 5.0),        # fails not_null
            (3, "ok", -1.0),       # fails in_range
            (4, "bad-seg", -2.0),  # fails accepted_values AND in_range
        ],
        "id long, seg string, bal double",
    )
    rules = [
        not_null("seg"),
        in_range("bal", 0.0, 10.0),
        accepted_values("seg", ["ok"]),
    ]
    clean, quar = apply_expectations(df, rules)
    assert [r.id for r in clean.orderBy("id").collect()] == [1]
    got = {r.id: list(r.failed_rules) for r in quar.collect()}
    assert got == {
        2: ["not_null:seg"],
        3: ["in_range:bal"],
        4: ["accepted_values:seg", "in_range:bal"],  # sorted labels
    }
    # clean keeps the source schema exactly
    assert clean.columns == df.columns
    # quarantine label array is containsNull=false (strict nested pin)
    fr = dict(zip(quar.schema.names, quar.schema.fields))["failed_rules"]
    assert fr.dataType.containsNull is False


def test_apply_expectations_rejects_table_level_rules(spark):
    import pytest as _pytest

    from compile_time_data_contracts_spark.operators.expectations import (
        apply_expectations,
        unique,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError, match="unique"):
        apply_expectations(df, [unique("id")])


def test_apply_expectations_sink_pin_rejects_drift(spark, tmp_path):
    import dataclasses

    import pytest as _pytest

    from compile_time_data_contracts_spark.contracts.conforms import (
        ContractDriftError,
    )
    from compile_time_data_contracts_spark.contracts.shape import contract
    from compile_time_data_contracts_spark.operators.expectations import (
        apply_expectations,
        not_null,
    )
    from compile_time_data_contracts_spark.runtime.pins import (
        SchemaMismatchError,
    )
    from compile_time_data_contracts_spark.sources.io import Sink

    @contract
    @dataclasses.dataclass
    class WrongQuarantine:  # missing failed_rules entirely
        id: int
        seg: str

    df = spark.createDataFrame([(1, None)], "id long, seg string")
    with _pytest.raises((ContractDriftError, SchemaMismatchError)):
        apply_expectations(
            df,
            [not_null("seg")],
            quarantine_sink=Sink(WrongQuarantine, str(tmp_path / "q")),
        )


def test_chunked_containment_finds_quote_plain_banding_misses(spark):
    """The asymmetric blind spot, pinned: a 24-token quote inside a
    120-token book has J ~ 0.2 (invisible to whole-doc banding) but
    C ~ 1.0; chunked banding must find it, plain banding must not,
    and both must agree with the exact join elsewhere."""
    import random

    from compile_time_data_contracts_spark.operators.dedup import (
        banding_then_containment,
        chunked_containment_pairs,
        containment_pairs,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]
    quote = [vocab[i * 7 % 5000] for i in range(24)]
    book = (
        [rng.choice(vocab) for _ in range(50)]
        + quote
        + [rng.choice(vocab) for _ in range(46)]
    )
    rows = [
        (1, " ".join(quote)),
        (2, " ".join(book)),
        (3, " ".join(rng.choice(vocab) for _ in range(100))),
        (4, " ".join(rng.choice(vocab) for _ in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert exact == {(1, 2)}
    plain = {
        (r.doc_a, r.doc_b)
        for r in banding_then_containment(docs, threshold=0.8).collect()
    }
    assert plain == set()  # the documented whole-doc-banding blind spot
    chunked = {
        (r.doc_a, r.doc_b)
        for r in chunked_containment_pairs(
            docs, threshold=0.8, chunk_tokens=32
        ).collect()
    }
    assert chunked == exact


def test_minhash_table_compound_key_matches_single_key(spark):
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.dedup import (
        minhash_table,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z p q r")], "doc_id long, text string"
    )
    single = {
        r.doc_id: tuple(r[f"h{h}"] for h in range(8))
        for r in minhash_table(docs, "doc_id", "text", 3, 8).collect()
    }
    # constant second key component must not change the signatures
    two = {
        r.doc_id: tuple(r[f"h{h}"] for h in range(8))
        for r in minhash_table(
            docs.withColumn("part", F.lit(0)),
            ["doc_id", "part"],
            "text",
            3,
            8,
        ).collect()
    }
    assert single == two


def test_prefix_filter_integer_product_float_roundup(spark):
    """0.28 * 25 = 7.000000000000001 in IEEE doubles: a naive ceil()
    shortens the prefix by one and can silently drop a qualifying pair
    whose whole intersection is corpus-hot tokens.  Construct exactly
    that adversarial case and require the pair to survive."""
    from pyspark.sql import functions as F

    from compile_time_data_contracts_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    hot = [f"h{i}" for i in range(7)]  # shared by EVERY record -> df max
    rows = [
        # A: 25 tokens, the 7 hot tokens + 18 rare ones
        (1, hot + [f"a{i}" for i in range(18)]),
        # B: exactly the 7 hot tokens => J(A,B) = 7/25 = 0.28
        (2, hot),
        # background records that make the hot tokens the most frequent
        (3, hot + ["z1", "z2", "z3"]),
        (4, hot + ["y1", "y2", "y3"]),
        (5, hot + ["x1", "x2", "x3"]),
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filtered_jaccard_pairs(
            df, "id", "toks", 0.28
        ).collect()
    }
    # naive all-pairs at threshold 0.28
    a, b = df.alias("a"), df.alias("b")
    naive = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            (
                F.size(F.array_intersect("a.toks", "b.toks")).cast("double")
                / F.size(F.array_union("a.toks", "b.toks"))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.28)
        .collect()
    }
    assert (1, 2) in naive  # the adversarial pair really qualifies
    assert got == naive


def test_apply_expectations_empty_suite_raises(spark):
    import pytest as _pytest

    from compile_time_data_contracts_spark.operators.expectations import (
        apply_expectations,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError, match="at least one rule"):
        apply_expectations(df, [])


# --------------------------------------------------------- IVF-PQ composite


def test_ivf_pq_full_probe_full_rerank_equals_exact(spark, tmp_path):
    """With nprobe = n_clusters and rerank >= corpus the composite
    degrades to exact search — output must equal topk_cosine."""
    import numpy as np

    from compile_time_data_contracts_spark.operators.similarity import (
        ivf_pq_topk,
        topk_cosine,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = emb.filter("vec_id = 7")
    exact = [
        (r.vec_id, round(r.sim, 6))
        for r in topk_cosine(emb, query, k=10).collect()
    ]
    got = [
        (r.vec_id, round(r.sim, 6))
        for r in ivf_pq_topk(
            emb, query, k=10, n_clusters=4, nprobe=4, m=4, ksub=16,
            rerank=300, index_path=str(tmp_path / "ivfpq"),
        ).collect()
    ]
    assert got == exact


def test_ivf_pq_index_reuse_skips_rebuild(spark, tmp_path):
    import os

    import numpy as np

    from compile_time_data_contracts_spark.operators.similarity import (
        ivf_pq_topk,
    )

    rng = np.random.default_rng(12)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = emb.filter("vec_id = 3")
    path = str(tmp_path / "ivfpq2")
    first = {r.vec_id for r in ivf_pq_topk(
        emb, query, k=5, n_clusters=4, nprobe=4, m=4, rerank=200,
        index_path=path).collect()}
    stamp = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(f"{path}/pq/codes") for f in fs
    )
    second = {r.vec_id for r in ivf_pq_topk(
        emb, query, k=5, n_clusters=4, nprobe=4, m=4, rerank=200,
        index_path=path).collect()}
    stamp2 = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(f"{path}/pq/codes") for f in fs
    )
    assert first == second
    assert stamp2 == stamp  # code table untouched on the second search
