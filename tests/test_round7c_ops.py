"""Round-7 batch C: HITS bipartite authorities, PAV isotonic fit —
each checked against a pure-Python brute-force reference on randomized
synthetic data."""

from __future__ import annotations

import random
from fractions import Fraction

from pyspark.sql import functions as F

from compile_time_data_contracts_spark.operators.graph import hits_bipartite
from compile_time_data_contracts_spark.operators.stats import isotonic_fit_bins


# ------------------------------------------------ hits_bipartite
def _brute_hits(edges):
    edges = sorted(set(edges))
    a1 = {}
    for _, s in edges:
        a1[s] = a1.get(s, 0) + 1
    h1 = {}
    for c, s in edges:
        h1[c] = h1.get(c, 0) + a1[s]
    a2 = {}
    for c, s in edges:
        a2[s] = a2.get(s, 0) + h1[c]
    tot = sum(a2.values())
    return {s: (a1[s], (1_000_000 * v) // tot) for s, v in a2.items()}


def test_hits_bipartite_matches_bruteforce(spark):
    rng = random.Random(73)
    edges = [(rng.randrange(30), 100 + rng.randrange(12)) for _ in range(300)]
    df = spark.createDataFrame(edges, "hub long, auth long")
    got = {
        r["auth"]: (r["indeg"], r["auth_ppm"])
        for r in hits_bipartite(df).collect()
    }
    assert got == _brute_hits(edges)


def test_hits_bipartite_dedups_parallel_edges(spark):
    # the same (hub, auth) pair listed twice must count once
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10), (2, 11)], "hub long, auth long"
    )
    got = {r["auth"]: r["indeg"] for r in hits_bipartite(df).collect()}
    assert got == {10: 2, 11: 1}


# ------------------------------------------------ isotonic_fit_bins
def _brute_isotonic(bins):
    """Minimax characterization over exact rationals:
    iso_i = max_{j<=i} min_{k>=i} pooled_mean(j..k)."""
    bins = sorted(bins)
    out = {}
    idx = range(len(bins))
    for i in idx:
        best = None
        for j in idx:
            if j > i:
                break
            worst = None
            for k in idx:
                if k < i:
                    continue
                n = sum(bins[t][1] for t in range(j, k + 1))
                p = sum(bins[t][2] for t in range(j, k + 1))
                v = Fraction(p, n)
                if worst is None or v < worst:
                    worst = v
            if best is None or worst > best:
                best = worst
        out[bins[i][0]] = best
    return out


def test_isotonic_fit_matches_minimax(spark):
    rng = random.Random(74)
    for trial in range(5):
        bins = [
            (b, rng.randrange(1, 50), 0)
            for b in sorted(rng.sample(range(100), rng.randrange(3, 15)))
        ]
        bins = [(b, n, rng.randrange(0, n + 1)) for b, n, _ in bins]
        df = spark.createDataFrame(bins, "bin long, n long, pos long")
        got = {
            r["bin"]: r["iso_rate"] for r in isotonic_fit_bins(df).collect()
        }
        want = _brute_isotonic(bins)
        assert set(got) == set(want)
        for b in want:
            # PAV emits the pooled bigint/bigint double; the minimax
            # rational must round-trip to the identical double
            assert got[b] == want[b].numerator / want[b].denominator, (
                trial,
                b,
                bins,
            )
        # monotone non-decreasing in bin order
        seq = [got[b] for b, _, _ in bins]
        assert all(x <= y for x, y in zip(seq, seq[1:]))


def test_isotonic_fit_preserves_weighted_mass(spark):
    # sum_i n_i * iso_i == sum_i pos_i  (PAV conserves block means)
    bins = [(0, 10, 9), (1, 10, 2), (2, 10, 4), (3, 10, 10)]
    df = spark.createDataFrame(bins, "bin long, n long, pos long")
    rows = isotonic_fit_bins(df).collect()
    mass = sum(r["n"] * r["iso_rate"] for r in rows)
    assert abs(mass - sum(p for _, _, p in bins)) < 1e-9


# ------------------------------------------------ q351 delta-method CI
def test_q351_delta_ci_matches_numpy_reference(spark):
    """Independent recomputation: the gate oracle mirrors the same
    expression tree, so transcription errors could hash-match.  This
    recomputes the Deng-et-al delta-method CI with numpy's own
    mean/var/cov on the raw per-user totals at sf0.001."""
    import duckdb
    import math
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["arm"]: r
        for r in entrymod.queries()["q351_ratio_metric_delta_ci"](
            spark, sf
        ).collect()
    }
    per_user = duckdb.sql(
        f"""SELECT user_id % 2 AS arm,
               sum(CAST(floor(value * 100) AS BIGINT)) AS x,
               count(*) AS y
            FROM '{sf}/events.parquet' WHERE value IS NOT NULL
            GROUP BY arm, user_id"""
    ).fetchall()
    for arm in (0, 1):
        xs = np.array([float(x) for a, x, _ in per_user if a == arm])
        ys = np.array([float(y) for a, _, y in per_user if a == arm])
        n = len(xs)
        r = xs.sum() / ys.sum()
        vx = xs.var(ddof=1)
        vy = ys.var(ddof=1)
        cxy = np.cov(xs, ys, ddof=1)[0][1]
        se = math.sqrt((vx - 2 * r * cxy + r * r * vy) / n) / ys.mean()
        g = got[arm]
        assert g["n_users"] == n
        assert abs(g["ratio_r"] - r) < 1e-5
        assert abs(g["se_r"] - se) < 1e-5
        assert abs(g["ci_lo_r"] - (r - 1.96 * se)) < 1e-5
        assert abs(g["ci_hi_r"] - (r + 1.96 * se)) < 1e-5


# ------------------------------------------------ q352 assortativity
def test_q352_assortativity_matches_numpy_reference(spark):
    import duckdb
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    row = (
        entrymod.queries()["q352_degree_assortativity"](spark, sf)
        .collect()[0]
    )
    edges = duckdb.sql(
        f"""WITH nc AS (SELECT count(*) AS n
                        FROM '{sf}/customer.parquet'),
        e0 AS (
          SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                 CAST(1 + (o_orderkey % nc.n) AS BIGINT) AS dst
          FROM '{sf}/orders.parquet', nc
          UNION
          SELECT CAST(c_custkey AS BIGINT),
                 CAST(1 + (c_custkey % nc.n) AS BIGINT)
          FROM '{sf}/customer.parquet', nc)
        SELECT src, dst FROM e0 WHERE src <> dst"""
    ).fetchall()
    sym = set()
    for s, d in edges:
        sym.add((s, d))
        sym.add((d, s))
    deg: dict = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    dx = np.array([deg[s] for s, _ in sorted(sym)], dtype=float)
    dy = np.array([deg[d] for _, d in sorted(sym)], dtype=float)
    want = np.corrcoef(dx, dy)[0][1]
    assert row["n_nodes"] == len(deg)
    assert row["n_directed_edges"] == len(sym)
    assert abs(row["assortativity_r"] - want) < 1e-5


# ------------------------------------------------ markov attribution
def test_markov_conversion_prob_matches_matrix_power():
    """The hand-rolled value iteration must equal v = sum_{k=1..K}
    (T^(k-1) c) computed with numpy matrix algebra."""
    import numpy as np

    from compile_time_data_contracts_spark.operators.stats import (
        markov_conversion_prob,
    )

    channels = ["a", "b", "c"]
    trans = [
        ("START", "a", 50), ("START", "b", 30), ("START", "CONV", 5),
        ("START", "DROP", 15),
        ("a", "b", 20), ("a", "CONV", 10), ("a", "DROP", 20),
        ("a", "c", 10),
        ("b", "a", 5), ("b", "CONV", 25), ("b", "DROP", 20),
        ("c", "c", 2), ("c", "DROP", 8),
    ]
    for removed in [None, "a", "b", "c"]:
        got = markov_conversion_prob(trans, channels, n_iter=8,
                                     removed=removed)
        states = ["START"] + [ch for ch in channels if ch != removed]
        tot = {}
        for s, d, c in trans:
            tot[s] = tot.get(s, 0) + c
        p = {(s, d): c / tot[s] for s, d, c in trans}
        T = np.array(
            [[p.get((i, j), 0.0) if j != removed else 0.0
              for j in states] for i in states]
        )
        # START is never a transition TARGET in this chain
        T[:, 0] = 0.0
        cv = np.array([p.get((i, "CONV"), 0.0) for i in states])
        v = np.zeros(len(states))
        for _ in range(8):
            v = cv + T @ v
        assert abs(got - v[0]) < 1e-12, (removed, got, v[0])


def test_markov_removal_never_increases_conversion():
    from compile_time_data_contracts_spark.operators.stats import (
        markov_conversion_prob,
    )

    import random

    rng = random.Random(76)
    channels = ["a", "b", "c", "d"]
    states = ["START"] + channels
    trans = []
    for s in states:
        for d in channels + ["CONV", "DROP"]:
            if d != s:
                trans.append((s, d, rng.randrange(1, 40)))
    base = markov_conversion_prob(trans, channels, n_iter=8)
    for ch in channels:
        rem = markov_conversion_prob(trans, channels, n_iter=8, removed=ch)
        assert rem <= base + 1e-12


# ------------------------------------------------ q353 cramers v
def test_q353_cramers_v_matches_scipy_free_reference(spark):
    import duckdb
    import math
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    row = (
        entrymod.queries()["q353_cramers_v_association"](spark, sf)
        .collect()[0]
    )
    cells = duckdb.sql(
        f"""SELECT lang, source, count(*) FROM '{sf}/documents.parquet'
            GROUP BY 1, 2"""
    ).fetchall()
    rt, ct, n = {}, {}, 0
    for la, so, c in cells:
        rt[la] = rt.get(la, 0) + c
        ct[so] = ct.get(so, 0) + c
        n += c
    chi2 = sum(
        (c - rt[la] * ct[so] / n) ** 2 / (rt[la] * ct[so] / n)
        for la, so, c in cells
    )
    v = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
    assert row["n_docs"] == n
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(row["chi2_r"] - chi2) < 1e-2
    assert abs(row["v_r"] - v) < 1e-5


# ------------------------------------------------ q356 kneser-ney
def test_q356_kneser_ney_matches_bruteforce(spark, tmp_path):
    """Brute-force KN on a tiny synthetic corpus written as a parquet
    sf-dir, driven through the actual gate query."""
    import collections
    import __spark_entry__ as entrymod

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat ate the fish",
        "a dog ate a bone",
        "the end",
    ]
    sf = str(tmp_path / "sf_kn")
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["p_kn_r"])
        for r in entrymod.queries()["q356_kneser_ney_bigram"](
            spark, sf
        ).collect()
    }
    # brute force
    pair = collections.Counter()
    for t in texts:
        toks = t.lower().split(" ")
        for i in range(len(toks) - 1):
            pair[(toks[i], toks[i + 1])] += 1
    c1 = collections.Counter()
    fw = collections.Counter()
    bw = collections.Counter()
    for (w1, w2), n in pair.items():
        c1[w1] += n
        fw[w1] += 1
        bw[w2] += 1
    T = len(pair)
    top20 = sorted(c1, key=lambda w: (-c1[w], w))[:20]
    want = {}
    for w1 in top20:
        succ = sorted(
            [(w2, n) for (a, w2), n in pair.items() if a == w1],
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        for w2, n in succ:
            p = (max(n - 0.75, 0.0) / c1[w1]) + (
                0.75 * fw[w1] / c1[w1]
            ) * (bw[w2] / T)
            want[(w1, w2)] = (n, round(p, 6))
    assert got == want
    # discounted+recycled mass per context must still sum to 1
    for w1 in top20:
        mass = sum(
            (max(n - 0.75, 0.0) / c1[w1])
            + (0.75 * fw[w1] / c1[w1]) * (bw[w2] / T)
            for (a, w2), n in pair.items()
            if a == w1
        ) + (0.75 * fw[w1] / c1[w1]) * (
            sum(bw[w2] for w2 in bw
                if (w1, w2) not in pair) / T
        )
        assert abs(mass - 1.0) < 1e-9


# ------------------------------------------------ q358 neyman
def test_q358_neyman_allocation_sums_to_budget(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q358_neyman_allocation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["n_sampled"] for r in rows) == 10000
    # Neyman: allocation ordering must follow N_s * sd_s ordering
    w = sorted(rows, key=lambda r: r["n_pop"] * r["sd_cents_r"])
    a = [r["n_sampled"] for r in w]
    assert a == sorted(a)


# ------------------------------------------------ q357 containment
def test_q357_cross_source_matches_bruteforce(spark, tmp_path):
    import __spark_entry__ as entrymod

    docs = [
        (0, "alpha", "s1"), (1, "beta", "s1"), (2, "gamma", "s1"),
        (3, "alpha", "s2"), (4, "beta", "s2"), (5, "delta", "s2"),
        (6, "alpha", "s3"),
        (7, "alpha", "s1"),  # duplicate inside s1: distinct-hash set
    ]
    sf = str(tmp_path / "sf_xsrc")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        (r["src_a"], r["src_b"]): (r["n_shared"], r["containment_milli"])
        for r in entrymod.queries()["q357_cross_source_duplication"](
            spark, sf
        ).collect()
    }
    sets = {"s1": {"alpha", "beta", "gamma"},
            "s2": {"alpha", "beta", "delta"},
            "s3": {"alpha"}}
    want = {}
    for a in sets:
        for b in sets:
            if a != b:
                inter = len(sets[a] & sets[b])
                want[(a, b)] = (inter, (1000 * inter) // len(sets[a]))
    assert got == want


# ------------------------------------------------ q359 hill estimator
def test_q359_hill_matches_numpy_reference(spark):
    import duckdb
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    row = (
        entrymod.queries()["q359_hill_tail_index"](spark, sf).collect()[0]
    )
    vals = np.array(
        sorted(
            v[0]
            for v in duckdb.sql(
                f"SELECT CAST(o_totalprice * 100 AS BIGINT)"
                f" FROM '{sf}/orders.parquet'"
            ).fetchall()
        ),
        dtype=float,
    )[::-1]
    k = 100
    h = float(np.mean(np.log(vals[:k] / vals[k])))
    assert row["k"] == k
    assert row["x_threshold_cents"] == int(vals[k])
    assert abs(row["hill_h_r"] - h) < 1e-5
    assert abs(row["alpha_r"] - 1 / h) < 1e-4


# ------------------------------------------------ q360 merge sync
def test_q360_merge_full_sync_branch_counts(spark):
    import duckdb
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["action"]: (r["n_rows"], r["surviving_balance"])
        for r in entrymod.queries()["q360_merge_full_sync"](
            spark, sf
        ).collect()
    }
    rows = duckdb.sql(
        f"SELECT c_custkey, CAST(floor(c_acctbal * 100) AS BIGINT)"
        f" FROM '{sf}/customer.parquet'"
    ).fetchall()
    n = len(rows)
    tgt = {k: b for k, b in rows}
    src = {k: b + 1000 for k, b in rows if k % 10 < 8}
    src.update({k + 10 * n: b for k, b in rows if k % 100 == 7})
    want = {
        "update": [0, 0],
        "insert": [0, 0],
        "delete": [0, 0],
    }
    for k in set(tgt) | set(src):
        if k in tgt and k in src:
            want["update"][0] += 1
            want["update"][1] += src[k]
        elif k in src:
            want["insert"][0] += 1
            want["insert"][1] += src[k]
        else:
            want["delete"][0] += 1
    assert got == {a: tuple(v) for a, v in want.items()}


# ------------------------------------------------ q361 simpson
def test_q361_simpson_consistent_with_q348(spark):
    """The detector's per-stratum diffs must equal q348's, and the
    reversal flag must be exactly sign(diff)*sign(pooled) < 0."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    q348_rows = {
        r["stratum"]: r["diff_milli"]
        for r in entrymod.queries()["q348_poststratified_ate"](
            spark, sf
        ).collect()
    }
    for r in entrymod.queries()["q361_simpson_paradox_detector"](
        spark, sf
    ).collect():
        assert r["diff_milli"] == q348_rows[r["stratum"]]
        def sign(x):
            return (x > 0) - (x < 0)
        assert r["sign_reversed"] == (
            sign(r["diff_milli"]) * sign(r["pooled_diff_milli"]) < 0
        )


# ------------------------------------------------ q362 wilson
def test_q362_wilson_matches_closed_form(spark):
    import duckdb
    import math
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["arm"]: r
        for r in entrymod.queries()["q362_wilson_interval"](
            spark, sf
        ).collect()
    }
    per = duckdb.sql(
        f"""SELECT user_id % 2 AS arm,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            FROM '{sf}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    for arm in (0, 1):
        xs = [c for a, c in per if a == arm]
        n, x = len(xs), sum(xs)
        p = x / n
        z = 1.96
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        g = got[arm]
        assert (g["n_users"], g["n_converted"]) == (n, x)
        assert abs(g["wilson_lo_r"] - (center - half) / denom) < 1e-5
        assert abs(g["wilson_hi_r"] - (center + half) / denom) < 1e-5
        assert 0.0 <= g["wilson_lo_r"] <= g["p_r"] <= g["wilson_hi_r"] <= 1.0


# ------------------------------------------------ q363 smd
def test_q363_smd_matches_numpy_reference(spark):
    import duckdb
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["covariate"]: r
        for r in entrymod.queries()["q363_covariate_balance_smd"](
            spark, sf
        ).collect()
    }
    per = duckdb.sql(
        f"""SELECT user_id % 2 AS arm, count(*) AS y,
               sum(CAST(floor(coalesce(value, 0) * 100) AS BIGINT)) AS x,
               count(DISTINCT event_type) AS t
            FROM '{sf}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    cols = {"value_cents": 2, "n_events": 1, "n_event_types": 3}
    for cov, idx in cols.items():
        a1 = np.array([float(r[idx]) for r in per if r[0] == 1])
        a0 = np.array([float(r[idx]) for r in per if r[0] == 0])
        pooled = (a1.var(ddof=1) + a0.var(ddof=1)) / 2
        g = got[cov]
        assert abs(g["mean_arm1_r"] - a1.mean()) < 1e-3
        assert abs(g["mean_arm0_r"] - a0.mean()) < 1e-3
        if pooled == 0:
            assert g["smd_r"] is None
        else:
            smd = (a1.mean() - a0.mean()) / np.sqrt(pooled)
            assert abs(g["smd_r"] - smd) < 1e-5


# ------------------------------------------------ q364 layout advisor
def test_q364_layout_advisor_ceiling_math(spark):
    import duckdb
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: r
        for r in entrymod.queries()["q364_partition_layout_advisor"](
            spark, sf
        ).collect()
    }
    per = dict(
        duckdb.sql(
            f"SELECT lang, sum(n_chars) FROM '{sf}/documents.parquet'"
            f" GROUP BY lang"
        ).fetchall()
    )
    total = sum(per.values())
    for lang, b in per.items():
        g = got[lang]
        files = -(-b // 262144)
        assert g["bytes"] == b
        assert g["n_files"] == files
        assert g["avg_file_bytes"] == b // files
        # every file lands in (target/2, target] when bytes >= target
        if b >= 262144:
            assert 131072 < g["avg_file_bytes"] <= 262144
        assert g["skewed"] == (b * len(per) > 2 * total)


# ------------------------------------------------ q365 kish ess
def test_q365_ess_matches_numpy_reference(spark):
    import duckdb
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["source"]: r
        for r in entrymod.queries()["q365_effective_sample_size"](
            spark, sf
        ).collect()
    }
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()
    by_src: dict = {}
    for s, w in rows:
        by_src.setdefault(s, []).append(float(w))
    for s, ws in by_src.items():
        w = np.array(ws)
        ess = w.sum() ** 2 / (w * w).sum()
        deff = len(w) * (w * w).sum() / w.sum() ** 2
        g = got[s]
        assert g["n"] == len(w)
        assert abs(g["ess_r"] - ess) < 1e-2
        assert abs(g["deff_r"] - deff) < 1e-4
        # Kish bounds: 1 <= ESS <= n  <=>  deff >= 1
        assert 1.0 <= g["ess_r"] <= g["n"] + 1e-9
        assert g["deff_r"] >= 1.0 - 1e-9


# ------------------------------------------------ q368 t-closeness
def test_q368_t_closeness_matches_bruteforce(spark):
    import duckdb
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["qi_group"]: r
        for r in entrymod.queries()["q368_t_closeness_audit"](
            spark, sf
        ).collect()
    }
    rows = duckdb.sql(
        f"""SELECT c_nationkey % 5,
               least(greatest(CAST(floor((c_acctbal + 1000.0) / 1100.0)
                    AS BIGINT), 0), 9)
            FROM '{sf}/customer.parquet'"""
    ).fetchall()
    from collections import Counter

    cell = Counter(rows)
    bands = sorted({b for _, b in rows})
    glob = Counter(b for _, b in rows)
    tot = len(rows)
    for g in sorted({q for q, _ in rows}):
        gn = sum(c for (q, _), c in cell.items() if q == g)
        cum, acc = 0.0, 0.0
        for b in bands:
            acc += cell.get((g, b), 0) / gn - glob[b] / tot
            cum += abs(acc)
        emd = cum / len(bands)
        r = got[g]
        assert r["n_members"] == gn
        assert abs(r["t_closeness_r"] - emd) < 1e-5
        assert r["violates_t015"] == (emd > 0.15)
        assert 0.0 <= r["t_closeness_r"] <= 1.0


# ------------------------------------------------ q366 bitemporal
def test_q366_bitemporal_excludes_late_arriving_versions(spark, tmp_path):
    """A version valid before V but LEARNED after T must be invisible:
    the defining bitemporal property that q180's single-axis SCD2
    cannot express."""
    from datetime import datetime
    import __spark_entry__ as entrymod

    sf = str(tmp_path / "sf_bt")
    rows = [
        # key 1: v1 valid 1998-05-01 (tx 05-11, visible)
        (101, 1, "O", 100.00, datetime(1998, 5, 1)),
        # key 1: v2 valid 1998-05-30 (tx 06-09, AFTER tx cutoff 06-05
        # -> must be ignored even though valid_from <= 06-01)
        (102, 1, "O", 999.00, datetime(1998, 5, 30)),
        # key 2: valid after V -> ignored entirely
        (103, 2, "O", 500.00, datetime(1998, 7, 1)),
        # key 3: old + visible
        (104, 3, "O", 250.00, datetime(1997, 1, 1)),
    ]
    spark.createDataFrame(
        [(ok, ck, st, tp, od, 1, "c", 0.0, "x") for ok, ck, st, tp, od in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_shippriority int,"
        " o_clerk string, o_discount double, o_comment string",
    ).write.parquet(f"{sf}/orders.parquet")
    row = entrymod.queries()["q366_bitemporal_point_in_time"](
        spark, sf
    ).collect()[0]
    # keys 1 and 3 visible; key 1 resolves to v1 (100.00), NOT the
    # late-arriving v2 (999.00)
    assert row["n_keys"] == 2
    assert row["total_balance"] == 10000 + 25000


# ------------------------------------------------ q370 acf
def test_q370_acf_matches_numpy_reference(spark):
    import duckdb
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["lag"]: r["acf_r"]
        for r in entrymod.queries()["q370_autocorrelation_function"](
            spark, sf
        ).collect()
    }
    series = np.array(
        [
            float(v)
            for _, v in duckdb.sql(
                f"""SELECT CAST(o_orderdate AS DATE) AS d,
                       sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    FROM '{sf}/orders.parquet' GROUP BY 1 ORDER BY 1"""
            ).fetchall()
        ]
    )
    mu = series.mean()
    c = series - mu
    ss = float((c * c).sum())
    for lag in (1, 2, 3, 7, 14):
        want = float((c[:-lag] * c[lag:]).sum()) / ss
        assert abs(got[lag] - want) < 1e-5, (lag, got[lag], want)
    # lag-0 identity check via the denominator: all |acf| <= 1
    assert all(abs(v) <= 1.0 + 1e-9 for v in got.values())


# ------------------------------------------------ q371 pca
def test_q371_pca_rayleigh_brackets_spectrum(spark):
    """On the near-isotropic fixture the 8-step Krylov estimate must
    produce a unit loading vector whose Rayleigh quotient sits inside
    [lambda_min, lambda_max] and beats the average eigenvalue."""
    import duckdb
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    rows = entrymod.queries()["q371_pca_power_iteration"](
        spark, sf
    ).collect()
    loadings = np.array(
        [r["loading_r"] for r in sorted(rows, key=lambda r: r["dim"])]
    )
    eig = rows[0]["eigenvalue_micros2_r"]
    ve = rows[0]["var_explained_r"]
    m = np.array(
        [
            v[0]
            for v in duckdb.sql(
                f"""SELECT list_transform(embedding, v ->
                       CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
                    FROM '{sf}/embeddings.parquet'"""
            ).fetchall()
        ],
        dtype=float,
    )[:, :8]
    c = np.cov(m, rowvar=False, ddof=0)
    w, _ = np.linalg.eigh(c)
    assert abs(np.linalg.norm(loadings) - 1.0) < 1e-5
    assert w[0] - 1e-6 <= eig <= w[-1] + abs(w[-1]) * 1e-6
    assert eig > w.mean()  # better than a random direction
    assert abs(ve - eig / np.trace(c)) < 1e-4


def test_q371_pca_converges_on_planted_direction(spark, tmp_path):
    """With a planted dominant axis (sigma 10x the noise), 8 power
    steps must recover numpy's exact top eigenvector."""
    import numpy as np
    import __spark_entry__ as entrymod

    rng = np.random.RandomState(77)
    direction = rng.randn(8)
    direction /= np.linalg.norm(direction)
    n = 400
    data = (
        np.outer(rng.randn(n) * 10.0, direction) + rng.randn(n, 8) * 0.5
    )
    vecs = np.hstack([data, np.zeros((n, 56))]).astype("float32")
    sf = str(tmp_path / "sf_pca")
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")
    rows = entrymod.queries()["q371_pca_power_iteration"](
        spark, sf
    ).collect()
    loadings = np.array(
        [r["loading_r"] for r in sorted(rows, key=lambda r: r["dim"])]
    )
    m = np.floor(vecs[:, :8].astype(float) * 1_000_000)
    c = np.cov(m, rowvar=False, ddof=0)
    w, evs = np.linalg.eigh(c)
    cos = abs(float(loadings @ evs[:, -1]))
    assert cos > 0.999, cos
    assert abs(rows[0]["eigenvalue_micros2_r"] - w[-1]) < abs(w[-1]) * 1e-3


# ------------------------------------------------ q373 lorenz
def test_q373_lorenz_properties(spark):
    import __spark_entry__ as entrymod

    rows = sorted(
        entrymod.queries()["q373_lorenz_curve"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    shares = [r["cum_share_milli"] for r in rows]
    # monotone, ends at ~1000 (floor division loses < 1 milli)
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    assert shares[-1] in (999, 1000)
    # sorted-ascending deciles: each decile's mean spend must be
    # non-decreasing
    means = [r["spend_cents"] / r["n_customers"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(means, means[1:]))


# ------------------------------------------------ q372 zipf
def test_q372_zipf_matches_numpy_polyfit(spark):
    import duckdb
    import numpy as np
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    row = entrymod.queries()["q372_zipf_law_fit"](spark, sf).collect()[0]
    freqs = [
        f
        for (f,) in duckdb.sql(
            f"""WITH t AS (SELECT unnest(string_split(lower(text), ' '))
                              AS tok FROM '{sf}/documents.parquet')
                SELECT count(*) AS freq FROM t WHERE tok <> ''
                GROUP BY tok ORDER BY freq DESC LIMIT 1000"""
        ).fetchall()
    ]
    x = np.log(np.arange(1, len(freqs) + 1, dtype=float))
    y = np.log(np.array(freqs, dtype=float))
    slope, _ = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0][1]
    assert row["n_ranks_fit"] == len(freqs)
    assert abs(row["zipf_slope_r"] - slope) < 1e-4
    assert abs(row["r2_r"] - r * r) < 1e-4
    assert row["zipf_slope_r"] < 0  # frequency falls with rank


# ------------------------------------------------ q375 entropy bands
def test_q375_entropy_bands_match_bruteforce(spark):
    import duckdb
    import math
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["band"]: (r["n_users"], r["n_events"])
        for r in entrymod.queries()["q375_behavioral_entropy_bands"](
            spark, sf
        ).collect()
    }
    rows = duckdb.sql(
        f"""SELECT user_id, event_type, count(*)
            FROM '{sf}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per: dict = {}
    for uid, _, k in rows:
        per.setdefault(uid, []).append(k)
    want: dict = {}
    for uid, ks in per.items():
        n = sum(ks)
        ent = math.log(n) - sum(k * math.log(k) for k in ks) / n
        band = min(int(ent // 0.4), 4)
        nu, ne = want.get(band, (0, 0))
        want[band] = (nu + 1, ne + n)
    assert got == want
    # entropy is bounded by ln(#event types) = ln 5 ~ 1.609 -> band <= 4
    assert max(got) <= 4


def test_q374_two_hop_reach_bruteforce_small(spark, tmp_path):
    """Exact 2-hop reach on a tiny planted graph, including the
    hub-cap: the megahub must not act as a via node."""
    import __spark_entry__ as entrymod

    # build customer/orders parquet producing a known q165 link graph:
    # n customers, edge src=o_custkey -> dst=1+(o_orderkey % n)
    n = 200
    custs = [(i, f"c{i}", 0.0, i % 25) for i in range(1, n + 1)]
    spark.createDataFrame(
        custs, "c_custkey long, c_name string, c_acctbal double,"
        " c_nationkey long"
    ).write.parquet(f"{tmp_path}/sf_r/customer.parquet")
    # orders rows: (o_orderkey, o_custkey): seed 100 -> dst 1+(ok%n)
    orders = []
    ok = 0
    edges = set()
    import random

    rng = random.Random(78)
    for _ in range(600):
        ok += 1
        src = rng.randrange(1, n + 1)
        orders.append((ok, src, 1.0, None))
        edges.add((src, 1 + (ok % n)))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    ).write.parquet(f"{tmp_path}/sf_r/orders.parquet")
    row = entrymod.queries()["q374_two_hop_reach"](
        spark, str(tmp_path / "sf_r")
    ).collect()[0]
    # brute force with the same rules
    ring = {(c, 1 + (c % n)) for c in range(1, n + 1)}
    sym = set()
    for s, d in edges | ring:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    deg: dict = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    mid = {(s, d) for s, d in sym if deg[d] <= 64}
    seeds = sorted({s for s, _ in sym if s % 100 == 0})
    reaches = []
    for seed in seeds:
        out = {d for s, d in sym if s == seed}
        for _, via in {(s, d) for s, d in mid if s == seed}:
            out |= {d for s2, d in mid if s2 == via and d != seed}
        reaches.append(len(out))
    assert row["n_seeds"] == len(seeds)
    assert row["total_reach"] == sum(reaches)
    assert row["min_reach"] == min(reaches)
    assert row["max_reach"] == max(reaches)
