"""LLM-pipeline text + sampling family: quality scoring, language id,
tokenization / BPE, n-gram LMs, mixtures, packing, multimodal columns,
PII redaction, readability, phrase search."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _ORACLES, _QUERIES, _ts_str, q  # noqa: F401


@q(
    "q51_token_stats",
    """SELECT lang,
              count(*) AS n_docs,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              round(avg(n_chars), 4) AS avg_chars
       FROM documents GROUP BY lang""",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@q(
    "q57_text_quality",
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
              round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                    / length(text)::DOUBLE, 6) AS punct_r,
              round(len(list_filter(string_split(lower(text), ' '),
                        t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
                    / len(string_split(text, ' ')), 6) AS stopword_r,
              round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                    / len(string_split(text, ' ')), 6) AS diversity
       FROM documents""",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_r"),
        F.round(stopword_ratio("text"), 6).alias("stopword_r"),
        F.round(token_diversity("text"), 6).alias("diversity"),
    )


@q(
    "q58_token_count",
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
              CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INT) AS bpe_tokens
       FROM documents""",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    )


@q(
    "q61_language_id",
    # the heuristic is deterministic and SQL-expressible: per-language
    # stopword-hit ratio, argmax with ties broken by declared language
    # order (en,es,fr,de,zh), 'und' when all scores are zero
    """WITH t AS (
         SELECT doc_id,
                list_transform(regexp_split_to_array(text, '\\s+'),
                               x -> lower(x)) AS toks
         FROM documents
       ), s AS (
         SELECT doc_id,
           len(list_filter(toks, x -> x IN ('the','a','of','and','to')))::DOUBLE / greatest(len(toks), 1) AS s_en,
           len(list_filter(toks, x -> x IN ('el','la','de','que','y')))::DOUBLE / greatest(len(toks), 1) AS s_es,
           len(list_filter(toks, x -> x IN ('le','la','de','et','un')))::DOUBLE / greatest(len(toks), 1) AS s_fr,
           len(list_filter(toks, x -> x IN ('der','die','das','und','ein')))::DOUBLE / greatest(len(toks), 1) AS s_de,
           len(list_filter(toks, x -> x IN ('的','是','了','在','我')))::DOUBLE / greatest(len(toks), 1) AS s_zh
         FROM t
       )
       SELECT doc_id,
         CASE WHEN greatest(s_en,s_es,s_fr,s_de,s_zh) = 0 THEN 'und'
              WHEN s_en = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'en'
              WHEN s_es = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'es'
              WHEN s_fr = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'fr'
              WHEN s_de = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'de'
              ELSE 'zh' END AS lang_guess
       FROM s""",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.text import language_id_table

    docs = load_table(spark, sf, "documents")
    return language_id_table(docs)


@q(
    "q62_multimodal_features",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len
       FROM documents""",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    """Binary media column + Arrow-batched mapInPandas feature extraction
    (decode stubbed; plumbing real)."""
    docs = load_table(spark, sf, "documents")
    media = attach_fake_media(docs)
    feats = extract_media_features(media)
    return feats.select("doc_id", "byte_len")


@q(
    "q63_stratified_sample",
    """SELECT lang, count(*) AS n_kept
       FROM documents
       WHERE ((doc_id * 2654435761) % 4294967296) * 10000 / 4294967296
             < (CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END)
       GROUP BY lang""",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: multiplicative-hash bucket on
    doc_id, per-language keep rates (en 50%, others 20%).  No RNG state:
    a row's fate depends only on its key, so retries and repartitioning
    never change the sample — required for resumable 100 TB jobs."""
    docs = load_table(spark, sf, "documents")
    kept = deterministic_sample(
        docs, rate=0.2, key_col="doc_id", strata_col="lang",
        rates={"en": 0.5},
    )
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


@q(
    "q64_pii_redaction",
    """SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  text || ' contact user' || doc_id ||
                  '@example.com or +1 555-000-' || doc_id,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                '\\+?[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS clean
       FROM documents""",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub: email/phone spans replaced with typed placeholders.
    Patterns restricted to Java-regex/RE2-shared syntax so the oracle
    evaluates identically; pure codegen regexp_replace, one scan."""
    docs = load_table(spark, sf, "documents")
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-000-"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return with_pii.select("doc_id", redact_pii("text").alias("clean"))


@q(
    "q65_pack_sequences",
    """SELECT doc_id, lang,
              CAST(floor(
                (sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n_tok) / 2048.0
              ) AS INT) AS pack_id
       FROM (SELECT doc_id, lang,
                    len(string_split(text, ' ')) AS n_tok
             FROM documents)""",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for pretraining batches: contiguous token-budget
    fill (2048 tokens) per language shard.  Sharded window => parallel
    packing, one shuffle on the shard key."""
    docs = load_table(spark, sf, "documents")
    with_tok = docs.select(
        "doc_id", "lang", token_count("text").alias("n_tok")
    )
    return pack_sequences(
        with_tok, budget=2048, order_col="doc_id", tokens_col="n_tok",
        shard_col="lang",
    ).select("doc_id", "lang", "pack_id")


@q(
    "q66_top_tokens",
    """SELECT tok, CAST(count(*) AS BIGINT) AS n
       FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
             FROM documents)
       GROUP BY tok
       ORDER BY n DESC, tok
       LIMIT 20""",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus top-20 tokens: explode + count + TakeOrdered.  The shuffle
    carries one row per (partition, token) after partial aggregation;
    the final top-k is a per-partition heap merge, no global sort."""
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


@q(
    "q70_python_udtf",
    """SELECT doc_id, CAST(sent_id AS INT) AS sent_id, sentence
       FROM (SELECT doc_id,
                    generate_subscripts(sents, 1) AS sent_id,
                    unnest(list_transform(sents, s -> trim(s))) AS sentence
             FROM (SELECT doc_id,
                          string_split_regex(text, '\\.\\s+') AS sents
                   FROM documents WHERE doc_id < 30))
       WHERE length(sentence) > 0""",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    """A real Python UDTF (Spark 3.5+ @udtf, SURVEY Q47's optional form):
    sentence segmentation emitting (sent_id, sentence) rows per doc.
    UDTFs run row-at-a-time in Python — appropriate for the bounded
    30-doc demo; the arrays+posexplode form (q47) is the scale path."""
    from pyspark.sql.functions import udtf, lit

    @udtf(returnType="sent_id int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            import re

            for i, s in enumerate(re.split(r"\.\s+", text or "")):
                s = s.strip()
                if s:
                    yield i + 1, s

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 30)
    docs.createOrReplaceTempView("q70_docs")
    spark.udtf.register("q70_sentences", SentenceSplit)
    return spark.sql(
        """SELECT doc_id, s.sent_id, s.sentence
           FROM q70_docs,
                LATERAL q70_sentences(doc_id, text) AS s"""
    )


@q(
    "q77_repetition_signal",
    """WITH bg AS (
         SELECT doc_id, concat_ws('|', toks[gs], toks[gs+1]) AS bigram
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
              LATERAL UNNEST(generate_series(1, greatest(len(toks) - 1, 1))) t(gs)
       ), c AS (
         SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY doc_id, bigram
       )
       SELECT doc_id,
              round(max(n)::DOUBLE / sum(n), 6) AS top_bigram_frac
       FROM c GROUP BY doc_id""",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition quality signal (Gopher-style curation rule): fraction
    of a document's bigrams taken by its most frequent bigram —
    boilerplate and spam score high.  Codegen bigram explode (the n=2
    shingle path) + two partial-aggregable groupBys."""
    from ..operators.dedup import shingle_rows

    docs = load_table(spark, sf, "documents")
    bg = shingle_rows(docs, n=2)
    counts = bg.groupBy("doc_id", "shingle").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        F.round(
            F.max("n").cast("double") / F.sum("n"), 6
        ).alias("top_bigram_frac")
    )


@q(
    "q83_chunk_documents",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            c AS (SELECT doc_id,
                         CAST(j AS INT) AS chunk_id,
                         toks[1 + j*48 : j*48 + 64] AS piece
                  FROM t, LATERAL UNNEST(generate_series(
                           0,
                           CAST(greatest(ceil((len(toks) - 16) / 48.0), 1) AS BIGINT) - 1
                         )) AS s(j))
       SELECT doc_id, chunk_id,
              array_to_string(piece, ' ') AS chunk_text,
              CAST(len(piece) AS INT) AS chunk_token_count
       FROM c""",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping fixed-token document chunking (64-token windows,
    16-token overlap) — codegen posexplode + column-start slice, one
    scan, no shuffle."""
    from ..operators.text import chunk_documents

    docs = load_table(spark, sf, "documents")
    return chunk_documents(docs, "doc_id", "text", 64, 16)


@q(
    "q85_capped_per_group_sample",
    """SELECT event_type, count(*) AS n_kept,
              round(sum(value), 2) AS sum_value_r
       FROM (
         SELECT *, row_number() OVER (
                  PARTITION BY event_type
                  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                ) AS rk
         FROM events
       ) WHERE rk <= 100
       GROUP BY event_type""",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain cap (training-data mixture step): each event_type
    capped at 100 rows chosen by md5-of-key priority — deterministic,
    engine-portable (the oracle recomputes the identical sample), one
    shuffle.  Aggregated per group so the value hash checks membership."""
    from ..operators.sampling import capped_per_group_sample

    ev = load_table(spark, sf, "events")
    kept = capped_per_group_sample(ev, "event_type", "event_id", 100)
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.round(F.sum("value"), 2).alias("sum_value_r"),
    )


@q(
    "q88_mixture_sampling",
    """WITH counts AS (
         SELECT lang, CAST(count(*) AS DOUBLE) AS cnt,
                CASE lang WHEN 'en' THEN 0.5
                          WHEN 'fr' THEN 0.3
                          WHEN 'zh' THEN 0.2 END AS w
         FROM documents WHERE lang IN ('en', 'fr', 'zh') GROUP BY lang),
       nt AS (SELECT min(cnt / w) AS n_total FROM counts),
       rates AS (SELECT lang, w * n_total / cnt AS rate FROM counts, nt)
       SELECT d.lang, count(*) AS n_kept
       FROM documents d JOIN rates r ON d.lang = r.lang
       WHERE ((d.doc_id * 2654435761) % 4294967296) * 10000 / 4294967296
             < r.rate * 10000
       GROUP BY d.lang""",
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    """Target-proportion data mixing (en 50% / fr 30% / zh 20%): the
    scarcest domain bounds the feasible total, per-domain keep rates are
    derived from observed counts, membership is the deterministic hash
    filter.  Two corpus passes + one broadcast of the |domains|-row rate
    table; no RNG, so the oracle recomputes the identical sample."""
    from ..operators.sampling import mix_to_proportions

    docs = load_table(spark, sf, "documents")
    kept = mix_to_proportions(
        docs, "lang", "doc_id", {"en": 0.5, "fr": 0.3, "zh": 0.2}
    )
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


@q(
    "q91_vocabulary_coverage",
    """WITH counts AS (
         SELECT tok AS token, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
               FROM documents)
         GROUP BY tok),
       ranked AS (
         SELECT token, n,
                CAST(row_number() OVER (ORDER BY n DESC, token) AS INT)
                  AS rnk,
                round(sum(n) OVER (ORDER BY n DESC, token
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                      / sum(n) OVER (), 6) AS cum_share_r
         FROM counts)
       SELECT token, n, rnk, cum_share_r
       FROM ranked WHERE n >= 5 AND rnk <= 100""",
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary build for tokenizer training: frequency-ranked token
    types with cumulative corpus coverage.  The corpus-sized work is one
    explode + map-side-combined count; the global windows run over the
    token-TYPE table (vocabulary-sized), so the single-partition sort is
    safe by construction."""
    from ..operators.text import vocabulary

    docs = load_table(spark, sf, "documents")
    vocab = vocabulary(docs, "text", min_count=5, top_n=100)
    return vocab.select(
        "token",
        "n",
        F.col("rank").alias("rnk"),
        F.round("cum_share", 6).alias("cum_share_r"),
    )


@q(
    "q97_tfidf_keywords",
    """WITH tok AS (SELECT doc_id,
                           len(string_split(lower(text), ' ')) AS dlen,
                           unnest(string_split(lower(text), ' ')) AS token
                    FROM documents),
            tf AS (SELECT doc_id, dlen, token,
                          CAST(count(*) AS BIGINT) AS n_td
                   FROM tok GROUP BY doc_id, dlen, token),
            dft AS (SELECT token, CAST(count(*) AS BIGINT) AS dfreq
                    FROM tf GROUP BY token),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
            scored AS (SELECT doc_id, token,
                              (n_td / dlen) * ln((nd + 1) / (dfreq + 1))
                                AS score
                       FROM tf JOIN dft USING (token) CROSS JOIN n)
       SELECT doc_id, token, round(score, 4) AS score_r, rnk
       FROM (SELECT *, CAST(row_number() OVER (
                              PARTITION BY doc_id
                              ORDER BY score DESC, token
                            ) AS INT) AS rnk
             FROM scored)
       WHERE rnk <= 3""",
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords: two map-side-combined hash
    aggregations (term freq, doc freq — the second over the already
    (doc,term)-sized tf table), a 1-row broadcast of N, one per-doc
    top-k window.  No cartesian, all codegen."""
    from ..operators.text import tfidf_keywords

    docs = load_table(spark, sf, "documents")
    kw = tfidf_keywords(docs, "doc_id", "text", k=3)
    return kw.select(
        "doc_id", "token", F.round("score", 4).alias("score_r"), "rnk"
    )


@q(
    "q98_bigram_lm",
    """WITH t AS (SELECT string_split(lower(text), ' ') AS toks
                  FROM documents),
            b AS (SELECT toks[j] AS w1, toks[j + 1] AS w2
                  FROM t, LATERAL UNNEST(generate_series(1, len(toks) - 1))
                       AS s(j)
                  WHERE len(toks) >= 2),
            c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
                  FROM b GROUP BY w1, w2)
       SELECT w1, w2 AS top_w2, n_pair, round(p, 6) AS p_r
       FROM (SELECT c.*,
                    n_pair / (sum(n_pair) OVER (PARTITION BY w1)) AS p,
                    row_number() OVER (
                      PARTITION BY w1 ORDER BY n_pair DESC, w2
                    ) AS rk
             FROM c)
       WHERE rk = 1""",
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram LM estimation: most likely successor + P(w2|w1) per token.
    Bigrams ride the codegen shingle path; argmax and conditional total
    share one window partitioning, so the bigram table shuffles once.
    Probabilities are exact-integer ratios — engine-portable."""
    from ..operators.text import bigram_lm

    docs = load_table(spark, sf, "documents")
    lm = bigram_lm(docs, "text")
    return lm.select(
        "w1", "top_w2", "n_pair", F.round("p", 6).alias("p_r")
    )


@q(
    "q109_upsample_mixture",
    """WITH f AS (SELECT *, CASE lang WHEN 'fr' THEN 2.5
                                      WHEN 'zh' THEN 1.25
                                      ELSE 1.0 END AS fac
                  FROM documents),
            c AS (SELECT *, CAST(floor(fac) AS INT)
                            + CASE WHEN ((doc_id * 2654435761) % 4294967296)
                                        * 10000 / 4294967296
                                        < (fac - floor(fac)) * 10000
                                   THEN 1 ELSE 0 END AS n_copies
                  FROM f)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM c, LATERAL UNNEST(generate_series(1, n_copies)) s(j)
       GROUP BY lang""",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic fractional upsampling (fr ×2.5, zh ×1.25): the
    mixture up-weighting step.  floor(f) whole copies per row plus a
    hash-selected fractional copy — reruns reproduce the identical
    expanded corpus, and the oracle recomputes it exactly."""
    from ..operators.sampling import upsample_by_factor

    docs = load_table(spark, sf, "documents")
    up = upsample_by_factor(
        docs, "lang", "doc_id", {"fr": 2.5, "zh": 1.25}
    )
    return up.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )


@q(
    "q116_quality_percentile_gate",
    """WITH scored AS (
         SELECT doc_id, lang,
                round((CASE WHEN len(string_split(text, ' '))
                                 BETWEEN 20 AND 1000 THEN 1.0
                            WHEN len(string_split(text, ' ')) >= 5 THEN 0.5
                            ELSE 0.0 END
                       + len(list_distinct(string_split(text, ' ')))::DOUBLE
                         / len(string_split(text, ' '))) / 2.0
                      - (length(text) - length(regexp_replace(
                            text, '[^\\w\\s]', '', 'g')))
                        / length(text)::DOUBLE, 6) AS quality
         FROM documents),
       cut AS (SELECT quantile_cont(quality, 0.25) AS c FROM scored)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
              round(avg(quality), 4) AS avg_quality_r
       FROM scored, cut WHERE quality >= c
       GROUP BY lang""",
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    """Percentile-gated quality curation — keep documents above the
    corpus's 25th quality percentile.  The cutoff is ONE exact
    interpolated percentile over the scored corpus (a 1-row broadcast
    back onto the scan, no second shuffle); the score itself is the
    library's deterministic quality heuristic, so the oracle recomputes
    the identical kept set.  At 100 TB the cutoff aggregation is one
    map-side-combined pass and the gate is a codegen filter."""
    from ..operators.text import quality_score

    docs = load_table(spark, sf, "documents")
    scored = docs.select("doc_id", "lang", quality_score("text").alias("quality"))
    cut = scored.agg(F.percentile("quality", F.lit(0.25)).alias("c"))
    return (
        scored.crossJoin(F.broadcast(cut))
        .filter(F.col("quality") >= F.col("c"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.round(F.avg("quality"), 4).alias("avg_quality_r"),
        )
    )


# =========================================================================
# Round-4 additions: Gopher quality rules, SemDeDup, token-budget mixture
# planning, observed scan metrics (Q137-Q140)
# =========================================================================

@q(
    "q137_gopher_quality",
    """WITH t AS (
         SELECT doc_id, text, string_split(text, ' ') AS words
         FROM documents
       ), s AS (
         SELECT doc_id,
                len(words) AS n_words,
                list_sum(list_transform(words, w -> len(w)))::DOUBLE
                  / len(words) AS mean_len,
                len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE
                  / len(words) AS symbol_r,
                len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                  / len(words) AS alpha_f,
                len(list_intersect(list_transform(words, w -> lower(w)),
                    ['the','be','to','of','and','that','have','with','a','in']))
                  AS stop_hits
         FROM t
       )
       SELECT doc_id,
              CAST(n_words AS INT) AS n_words,
              round(mean_len, 6) AS mean_word_len,
              round(symbol_r, 6) AS symbol_ratio,
              round(alpha_f, 6) AS alpha_frac,
              CAST(stop_hits AS INT) AS stop_hits,
              (n_words BETWEEN 20 AND 1000
               AND mean_len BETWEEN 3.0 AND 10.0
               AND symbol_r <= 0.1
               AND alpha_f >= 0.8
               AND stop_hits >= 2) AS gopher_keep
       FROM s""",
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher/MassiveText quality-rule battery (word-count band, mean
    word length band, symbol-to-word ratio, alphabetic-word fraction,
    distinct-stop-word floor) + the AND'd keep flag — the standard
    pretraining quality gate, all codegen built-ins in one scan."""
    from ..operators.text import gopher_quality

    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", *gopher_quality("text"))


@q(
    "q139_token_budget_mixture",
    """WITH per_src AS (
         SELECT source,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                  AS tokens_available,
                1.0 / (1.0 + CAST(regexp_extract(source, '(\\d+)', 1) AS INT))
                  AS w_raw
         FROM documents
         GROUP BY source
       ), planned AS (
         SELECT source, tokens_available,
                w_raw / sum(w_raw) OVER () AS share,
                0.5 * sum(tokens_available) OVER () AS budget
         FROM per_src
       )
       SELECT source,
              tokens_available,
              round(share, 6) AS target_share,
              round(least(1.0, budget * share / tokens_available), 6)
                AS sample_rate,
              CAST(floor(least(1.0, budget * share / tokens_available)
                         * tokens_available) AS BIGINT) AS expected_tokens
       FROM planned""",
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget mixture planner: given a target mixture weight per
    source (here 1/(1+source index), normalized) and a total token
    budget (50% of the corpus), emit each source's sampling rate
    min(1, budget*share/available) and expected token yield — the
    planning step before `mix_to_proportions` executes the sample.  One
    map-side-combined aggregation (|sources| rows) + window normalization
    over the tiny aggregate — planning cost is independent of corpus
    size."""
    docs = load_table(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("bigint").alias("tokens_available"),
    ).withColumn(
        "w_raw",
        F.lit(1.0)
        / (F.lit(1.0) + F.regexp_extract("source", r"(\d+)", 1).cast("int")),
    )
    w = Window.partitionBy()
    planned = per_src.select(
        "source",
        "tokens_available",
        (F.col("w_raw") / F.sum("w_raw").over(w)).alias("share"),
        (F.lit(0.5) * F.sum("tokens_available").over(w)).alias("budget"),
    )
    rate = F.least(
        F.lit(1.0), F.col("budget") * F.col("share") / F.col("tokens_available")
    )
    return planned.select(
        "source",
        "tokens_available",
        F.round("share", 6).alias("target_share"),
        F.round(rate, 6).alias("sample_rate"),
        F.floor(rate * F.col("tokens_available"))
        .cast("bigint")
        .alias("expected_tokens"),
    )


@q(
    "q141_bm25_scores",
    """WITH base AS (
         SELECT doc_id, string_split(lower(text), ' ') AS toks,
                len(string_split(lower(text), ' ')) AS dl
         FROM documents
       ), stats AS (
         SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base
       ), hits AS (
         SELECT doc_id, dl, unnest(toks) AS term FROM base
       ), tf AS (
         SELECT doc_id, term, dl, count(*)::DOUBLE AS tf
         FROM hits
         WHERE term IN ('table', 'merge', 'window', 'spark')
         GROUP BY doc_id, term, dl
       ), dfreq AS (
         SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
       )
       SELECT tf.doc_id,
              round(sum(
                ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                * (tf.tf * 2.2)
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))
              ), 6) AS bm25
       FROM tf, dfreq, stats
       WHERE tf.term = dfreq.term
       GROUP BY tf.doc_id""",
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 scoring of the corpus against a bag-of-terms query
    (terms 'table merge window spark'): Lucene-variant idf, k1=1.2
    b=0.75 length normalization.  Corpus stats broadcast as one row,
    per-term document frequencies broadcast as |terms| rows, and the
    explode is filtered to query terms BEFORE any shuffle — non-matching
    documents never move (operators/text.py:bm25_scores)."""
    from ..operators.text import bm25_scores

    docs = load_table(spark, sf, "documents")
    scored = bm25_scores(docs, ["table", "merge", "window", "spark"])
    return scored.select("doc_id", F.round("bm25", 6).alias("bm25"))


@q(
    "q146_weighted_sample",
    """WITH s AS (SELECT avg(n_chars) AS mw FROM documents)
       SELECT doc_id, source
       FROM documents, s
       WHERE ((doc_id * 2654435761) % 4294967296) * 10000.0 / 4294967296
             < round(least(1.0, 0.3 * n_chars / mw) * 10000, 6)""",
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep probability
    proportional to n_chars (stand-in for a quality score), expected
    kept fraction 0.3, membership by the portable Knuth hash — the
    curation step that keeps more of the best data while staying
    exactly reproducible and resumable (operators/sampling.py:
    weighted_sample).  One mean broadcast + one filtered scan."""
    from ..operators.sampling import weighted_sample

    docs = load_table(spark, sf, "documents")
    return weighted_sample(docs, "n_chars", "doc_id", 0.3).select(
        "doc_id", "source"
    )


@q(
    "q154_weighted_reservoir",
    """WITH t AS (
         SELECT lang, doc_id, n_chars,
                pow(((doc_id * 2654435761) % 4294967296 + 1)
                      / 4294967296.0,
                    1.0 / greatest(n_chars::DOUBLE, 1e-9)) AS k
         FROM documents
       ), r AS (
         SELECT lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY k DESC, doc_id) AS rn
         FROM t
       )
       SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
              CAST(n_chars AS BIGINT) AS n_chars
       FROM r WHERE rn <= 5""",
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-k weighted reservoir per group (Efraimidis-Sirakis
    A-ES): the 5 documents per language with the largest u^(1/w) keys,
    u deterministic from the Knuth hash — the fixed-budget-per-source
    sampling shape a mixture plan needs (vs q146's Bernoulli sampling,
    whose kept count varies).  One window top-k per group: partial
    TakeOrdered map-side, single shuffle on lang; the oracle replays
    the identical integer arithmetic and pow, so selection matches
    bit-for-bit."""
    from ..operators.sampling import reservoir_per_group

    docs = load_table(spark, sf, "documents")
    return reservoir_per_group(docs, "lang", "n_chars", "doc_id", 5).select(
        "lang",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


@q(
    "q155_temperature_mixture",
    """WITH c AS (
         SELECT lang, count(*) AS n FROM documents GROUP BY lang
       ), z AS (
         SELECT sum(pow(n::DOUBLE, 0.5)) AS z, sum(n) AS N FROM c
       )
       SELECT c.lang, CAST(c.n AS BIGINT) AS n,
              round(pow(c.n::DOUBLE, 0.5) / z.z, 6) AS p_target,
              round(least(1.0,
                    pow(c.n::DOUBLE, 0.5) / z.z * z.N / c.n), 6)
                AS keep_rate
       FROM c, z""",
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual
    pretraining recipe: sample language l with p_l ∝ n_l^α, α=0.5 —
    head languages flattened, tail boosted).  One |languages|-row
    planning aggregate from one map-combined count — corpus-size-
    independent; the emitted keep_rate per language feeds the
    deterministic stratified sampler (q63's machinery) for the
    membership pass."""
    from ..operators.sampling import temperature_mixture_rates

    docs = load_table(spark, sf, "documents")
    return temperature_mixture_rates(docs, "lang", alpha=0.5)


@q(
    "q157_containment_pairs",
    """WITH sh AS (
         SELECT DISTINCT doc_id,
                concat_ws('|', toks[gs], toks[gs+1], toks[gs+2]) AS s
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
              LATERAL UNNEST(generate_series(1, greatest(len(toks) - 2, 1)))
                t(gs)
       ), sizes AS (
         SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
       ), inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         FROM sh a JOIN sh b
           ON a.s = b.s AND a.doc_id <> b.doc_id
         GROUP BY a.doc_id, b.doc_id
       )
       SELECT CAST(doc_a AS BIGINT) AS doc_a,
              CAST(doc_b AS BIGINT) AS doc_b,
              round(i::DOUBLE / sz.sz, 6) AS containment
       FROM inter JOIN sizes sz ON sz.doc_id = doc_a
       WHERE round(i::DOUBLE / sz.sz, 6) >= 0.8""",
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment dedup: C(a,b) = |Sa∩Sb| / |Sa| >= 0.8
    finds documents mostly CONTAINED in another (quotes, excerpts,
    supersets) that symmetric Jaccard misses when sizes differ.  Same
    co-occurrence-join shape as exact Jaccard — shingle equi-join +
    partial-agg count, never a cartesian; directional, so pairs emit
    both ways.  The dedup policy downstream drops the contained side."""
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf, "documents")
    return containment_pairs(docs, n=3, threshold=0.8).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
        "containment",
    )


@q(
    "q158_psi_drift",
    """WITH mm AS (
         SELECT min(c_acctbal::DOUBLE) AS mn, max(c_acctbal::DOUBLE) AS mx
         FROM customer
       ), old_b AS (
         SELECT CASE WHEN mm.mx = mm.mn THEN 0
                ELSE CAST(greatest(0, least(
                       floor((c_acctbal::DOUBLE - mm.mn)
                             / ((mm.mx - mm.mn) / 10.0)), 9)) AS INT)
                END AS bucket,
                count(*) AS n_old
         FROM customer, mm GROUP BY 1
       ), newt AS (
         SELECT CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                     THEN c_acctbal + 20000.0 ELSE c_acctbal END AS v
         FROM customer
       ), new_b AS (
         SELECT CASE WHEN mm.mx = mm.mn THEN 0
                ELSE CAST(greatest(0, least(
                       floor((v::DOUBLE - mm.mn)
                             / ((mm.mx - mm.mn) / 10.0)), 9)) AS INT)
                END AS bucket,
                count(*) AS n_new
         FROM newt, mm GROUP BY 1
       ), j AS (
         SELECT coalesce(o.bucket, n.bucket) AS bucket,
                coalesce(o.n_old, 0) AS n_old,
                coalesce(n.n_new, 0) AS n_new
         FROM old_b o FULL OUTER JOIN new_b n ON o.bucket = n.bucket
       ), p AS (
         SELECT bucket,
                greatest(n_old * 1.0 / sum(n_old) OVER (), 1e-6) AS p_old,
                greatest(n_new * 1.0 / sum(n_new) OVER (), 1e-6) AS p_new
         FROM j
       )
       SELECT bucket,
              round(p_old, 6) AS p_old_r,
              round(p_new, 6) AS p_new_r,
              round((p_new - p_old) * ln(p_new / p_old), 6)
                AS psi_contrib_r,
              round(sum((p_new - p_old) * ln(p_new / p_old)) OVER (), 6)
                AS psi_total_r
       FROM p""",
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index drift detection: the DISTRIBUTION-
    level companion to q149's row-level snapshot diff — a simulated v2
    (two segments' balances shifted past the baseline range, clamping
    into the top bucket — a broken-unit-conversion shape) is binned
    against the v1 baseline's deterministic equal-width deciles and
    each bucket's PSI contribution plus the total is reported.  Bin
    edges come from one 1-row (min, max) broadcast — no approximate
    quantiles, which would desync engines; each side then pays one
    map-combined count and the shuffle carries 10 rows.  PSI > 0.25 =
    major drift (this scenario lands ~0.6)."""
    from ..operators.stats import psi_drift

    cust = load_table(spark, sf, "customer")
    old = cust.select(F.col("c_acctbal").alias("bal"))
    new = cust.select(
        F.when(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"),
            F.col("c_acctbal") + 20000.0,
        )
        .otherwise(F.col("c_acctbal"))
        .alias("bal")
    )
    return psi_drift(old, new, "bal", nbuckets=10)


@q(
    "q205_fuzzy_name_pairs",
    """WITH names AS (SELECT c_custkey AS k, c_name AS s FROM customer),
       vars AS (
         SELECT k, s, s AS v FROM names
         UNION ALL
         SELECT k, s,
                left(s, CAST(i AS INT)) || substr(s, CAST(i AS INT) + 2)
                  AS v
         FROM names, UNNEST(range(0, length(s))) AS t(i)),
       dvars AS (SELECT DISTINCT k, s, v FROM vars),
       cand AS (
         SELECT DISTINCT a.k AS key_a, b.k AS key_b,
                a.s AS s_a, b.s AS s_b
         FROM dvars a JOIN dvars b ON a.v = b.v AND a.k < b.k)
       SELECT key_a, key_b,
              CAST(levenshtein(s_a, s_b) AS INT) AS dist
       FROM cand WHERE levenshtein(s_a, s_b) <= 1""",
)
def q205(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy matching without the cross product: all customer-name
    pairs within Levenshtein distance 1, found by FastSS
    deletion-neighborhood blocking (`edit_distance_pairs`,
    operators/fuzzy.py).  Each name emits its radius-1 deletion
    variants (a ×(len+1) linear blowup); an equi-join on the variant
    string yields a COMPLETE candidate set (strings at distance ≤ 1
    always share a variant), and one exact `levenshtein` per candidate
    verifies.  The plan contains no cartesian/BNL join at any scale
    (audited) — this is the string twin of the MinHash banding join:
    collide, equi-join, verify.  The oracle replays the identical
    neighborhood construction in SQL, so completeness is checked
    against DuckDB's own levenshtein, not assumed."""
    from ..operators.fuzzy import edit_distance_pairs

    cust = load_table(spark, sf, "customer")
    return edit_distance_pairs(
        cust, "c_custkey", "c_name", max_dist=1
    ).select("key_a", "key_b", F.col("dist").cast("int").alias("dist"))


def _bpe_tower_sql(n_steps: int) -> str:
    """DuckDB WITH-tower replicating ``bpe_merge_steps`` for
    ``n_steps`` merges: per step, pair counts (p{s}), the argmax pair
    (b{s}, tie-broken (freq DESC, lhs, rhs)), and the rewritten
    vocabulary (words{s}) via a list_reduce fold over a unit-separator
    string that mirrors the Spark ``aggregate`` fold exactly
    (left-to-right, non-rescanning).  Composable: q207 selects the
    b{s} rows, q208 tokenizes the corpus against words{n}."""
    fold = (
        "string_split(CASE WHEN len(syms) = 1 THEN syms[1] "
        "ELSE list_reduce(syms, (acc, x) -> CASE "
        "WHEN (acc = b.lhs OR "
        "right(acc, 1 + len(b.lhs)) = chr(31) || b.lhs) "
        "AND x = b.rhs "
        "THEN left(acc, len(acc) - len(b.lhs)) || b.lhs || b.rhs "
        "ELSE acc || chr(31) || x END) END, chr(31))"
    )
    parts = [
        "tok AS (SELECT unnest(string_split_regex(text, '\\s+')) AS w"
        " FROM documents)",
        "words0 AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,"
        " regexp_split_to_array(w, '') AS syms"
        " FROM tok WHERE w <> '' GROUP BY w)",
    ]
    for s in range(1, n_steps + 1):
        parts.append(
            f"p{s} AS (SELECT syms[CAST(i AS INT)] AS lhs,"
            f" syms[CAST(i AS INT) + 1] AS rhs,"
            f" CAST(sum(freq) AS BIGINT) AS pair_freq"
            f" FROM words{s - 1}, UNNEST(range(1, len(syms))) AS t(i)"
            f" GROUP BY 1, 2)"
        )
        parts.append(
            f"b{s} AS (SELECT lhs, rhs, pair_freq FROM p{s}"
            f" ORDER BY pair_freq DESC, lhs, rhs LIMIT 1)"
        )
        parts.append(
            f"words{s} AS (SELECT w, freq, {fold} AS syms"
            f" FROM words{s - 1}, b{s} b)"
        )
    return "WITH " + ",\n".join(parts)


@q(
    "q207_bpe_merge_training",
    _bpe_tower_sql(3)
    + """
       SELECT 1 AS step, * FROM b1
       UNION ALL SELECT 2, * FROM b2
       UNION ALL SELECT 3, * FROM b3""",
)
def q207(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed BPE merge training (Sennrich et al. 2016), three
    steps over the documents corpus (`bpe_merge_steps`,
    operators/bpe.py).  The corpus is scanned ONCE into a distinct-word
    frequency table (partial-combined groupBy — the shuffle carries the
    vocabulary, not the token stream); every merge iteration then
    counts adjacent symbol pairs weighted by word frequency, picks the
    argmax with a deterministic (freq DESC, lhs, rhs) tie-break, and
    rewrites symbol sequences with a JVM left-to-right non-rescanning
    fold — canonical single-pass BPE, one driver row per step.  The
    oracle unrolls the same three iterations as a DuckDB SQL tower
    (list_reduce fold over a unit-separator string), so pair counts,
    tie-breaks, AND the fold semantics on repeated-symbol runs are all
    cross-checked."""
    from ..operators.bpe import bpe_merge_steps, word_frequencies

    docs = load_table(spark, sf, "documents")
    merges, words = bpe_merge_steps(
        spark, word_frequencies(docs, "text"), 3
    )
    words.unpersist()
    return merges


@q(
    "q208_bpe_tokenize",
    _bpe_tower_sql(3)
    + """,
       tokc AS (
         SELECT w, CAST(len(syms) AS BIGINT) AS ntok FROM words3),
       docw AS (
         SELECT doc_id, source,
                unnest(string_split_regex(text, '\\s+')) AS w
         FROM documents)
       SELECT d.source,
              CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_words,
              CAST(sum(t.ntok) AS BIGINT) AS n_bpe_tokens
       FROM docw d JOIN tokc t ON d.w = t.w
       WHERE d.w <> ''
       GROUP BY d.source""",
)
def q208(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer APPLICATION at corpus scale — the other half of
    q207's training loop.  Tokenizing 100 TB with a trained vocabulary
    is NOT per-document re-merging: the per-word token count is a pure
    function of the word, so it lives in the vocabulary table (already
    rewritten by training).  The corpus pass is explode(words) +
    BROADCAST join against the vocab token counts + one
    partial-combined rollup — tokenization costs the scan, with zero
    per-row Python and zero re-folding.  The vocab side is
    localCheckpoint-materialized so the corpus join never re-runs the
    training lineage (cache-leak-free, the q54 contract).  Output:
    per-source document/word/BPE-token counts after 3 trained merges;
    the oracle extends the q207 tower with the identical corpus
    join."""
    from ..operators.bpe import bpe_merge_steps, word_frequencies

    docs = load_table(spark, sf, "documents")
    _merges, words = bpe_merge_steps(
        spark, word_frequencies(docs, "text"), 3
    )
    tokc = words.select(
        "word", F.size("syms").cast("long").alias("ntok")
    ).localCheckpoint(eager=True)
    words.unpersist()
    docw = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.col("text"), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        docw.join(F.broadcast(tokc), "word")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_words"),
            F.sum("ntok").cast("long").alias("n_bpe_tokens"),
        )
    )


_Q235_ORACLE = """
  WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS token
    FROM documents),
  c AS (
    SELECT source, token, CAST(count(*) AS BIGINT) AS c
    FROM tok GROUP BY source, token),
  t AS (
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CAST(floor(CAST(c AS DOUBLE)
                 * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
             AS BIGINT) AS s_micros
    FROM c GROUP BY source)
  SELECT source, n, vocab,
         round(ln(CAST(n AS DOUBLE))
               - (CAST(s_micros AS DOUBLE) / 1000000.0) / n,
               6) AS entropy_nats
  FROM t"""


@q("q235_source_token_entropy", _Q235_ORACLE)
def q235(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source Shannon entropy of the token distribution — the
    corpus-DIVERSITY metric behind mixture design: a source whose
    entropy collapses is template spam or a crawler trap (the
    aggregate sibling of q57's per-document diversity and q184's Gini
    concentration), and entropy-vs-size is the standard curve for
    deciding how hard to dedup a source.

    H = ln(N) - (Σ c·ln c)/N over per-(source, token) counts: one
    explode + one partial-combined (source, token) count + one
    partial-combined per-source rollup — two exchanges, both carrying
    counts, never the token stream.  Engine-exactness: the per-token
    terms c·ln(c) are deterministic doubles (integer operand through
    identical IEEE ops) but SUMMING millions of doubles is
    order-dependent — so each term is floored to integer MICRO-NATS
    first and the sum is an exact BIGINT (the q216 micros contract
    applied to a transcendental), removing summation order from the
    statistic entirely.  Residual caveat, stated honestly: JVM
    Math.log and libm ln are each <= 1 ulp but not guaranteed
    identical, so a term lying within ~c·1e-10 of an integer micro-nat
    boundary could floor differently — gate-verified identical at
    sf0.001/0.01/0.1; a production contract would widen to a +/-
    vocab-count tolerance on the micro-nat sum."""
    docs = load_table(spark, sf, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    c = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    t = c.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(
            F.floor(
                F.col("c").cast("double")
                * F.log(F.col("c").cast("double"))
                * 1000000
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("s_micros"),
    )
    return t.select(
        "source",
        "n",
        "vocab",
        F.round(
            F.log(F.col("n").cast("double"))
            - (F.col("s_micros").cast("double") / 1000000.0) / F.col("n"),
            6,
        ).alias("entropy_nats"),
    )


_Q245_ORACLE = """
  WITH tk AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
  sh AS (
    SELECT DISTINCT doc_id, source,
           array_to_string(t[i:least(i + 2, len(t))], '|') AS s
    FROM (SELECT doc_id, source, t,
                 unnest(generate_series(1, greatest(len(t) - 2, 1)))
                   AS i
          FROM tk)),
  ref AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
  d AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
  tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
          FROM d GROUP BY doc_id),
  seen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seen
           FROM d SEMI JOIN ref ON d.s = ref.s GROUP BY doc_id)
  SELECT t.doc_id, t.n_shingles,
         CAST(coalesce(seen.n_seen, 0) AS BIGINT) AS n_seen,
         round((t.n_shingles - coalesce(seen.n_seen, 0))
               / CAST(t.n_shingles AS DOUBLE), 6) AS novelty_r
  FROM tot t LEFT JOIN seen ON t.doc_id = seen.doc_id"""


@q("q245_ngram_novelty", _Q245_ORACLE)
def q245(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document 3-gram novelty of every non-src0 document against
    the src0 reference corpus (`text.ngram_novelty`): the fraction of
    the doc's distinct shingles absent from the reference — the
    corpus-acquisition signal between exact dedup (q48) and MinHash
    near-dup (q54): a batch can be 0 % duplicate yet 5 % novel.
    Posting-list discipline throughout: the reference collapses to its
    distinct shingle set once (build-and-persist at 100 TB, the
    q135/q204 index move), seen counts are a LEFT SEMI equi-join on
    the shingle — never all-pairs; counts exact, one rounded ratio."""
    from ..operators.text import ngram_novelty

    docs = load_table(spark, sf, "documents")
    return ngram_novelty(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=3,
    )


_Q249_ORACLE = """
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tk
    FROM documents),
  first_occ AS (SELECT tk, min(doc_id) AS fd FROM tok GROUP BY tk),
  newd AS (SELECT fd, count(*) AS n_new FROM first_occ GROUP BY fd),
  perdoc AS (
    SELECT d.doc_id,
           len(string_split(d.text, ' ')) AS nt,
           coalesce(n.n_new, 0) AS nn
    FROM documents d LEFT JOIN newd n ON d.doc_id = n.fd),
  cum AS (
    SELECT doc_id,
           sum(nt) OVER (ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum_tokens,
           sum(nn) OVER (ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum_vocab,
           row_number() OVER (ORDER BY doc_id) AS rn,
           count(*) OVER () AS nd
    FROM perdoc),
  sampled AS (
    SELECT pt, rn AS doc_rank, cum_tokens, cum_vocab
    FROM cum JOIN
         (SELECT unnest(generate_series(1, 10)) AS pt) p
      ON rn = CAST(ceil(pt * nd / 10.0) AS BIGINT)),
  anchored AS (
    SELECT pt, doc_rank, cum_tokens, cum_vocab,
           first_value(cum_tokens) OVER (ORDER BY pt) AS t1,
           first_value(cum_vocab) OVER (ORDER BY pt) AS v1
    FROM sampled)
  SELECT CAST(pt AS INT) AS pt, CAST(doc_rank AS BIGINT) AS doc_rank,
         CAST(cum_tokens AS BIGINT) AS cum_tokens,
         CAST(cum_vocab AS BIGINT) AS cum_vocab,
         CASE WHEN pt > 1 AND cum_tokens > t1 AND v1 > 0
              THEN round(ln(cum_vocab / CAST(v1 AS DOUBLE))
                         / ln(cum_tokens / CAST(t1 AS DOUBLE)), 4)
              END AS beta_r
  FROM anchored"""


@q("q249_vocabulary_growth", _Q249_ORACLE)
def q249(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps-law vocabulary growth over the document corpus
    (`text.vocabulary_growth`, 10 sample points): cumulative distinct
    tokens vs cumulative tokens, plus the implied growth exponent β —
    the corpus-acquisition planning curve (a flattening β says new
    data re-says the old; q245's novelty at corpus level).  The
    distributed trick: cumulative-distinct is NOT a running set —
    each token contributes at its FIRST document (one partial-combined
    min per token), so the curve is a plain cumulative sum over the
    |docs|-row table; tokens never cross the shuffle after the min.
    Counts exact; β is one rounded log-ratio per sample point."""
    from ..operators.text import vocabulary_growth

    docs = load_table(spark, sf, "documents")
    return vocabulary_growth(docs, "doc_id", "text", n_points=10)


_Q265_ORACLE = """
  WITH d AS (
    SELECT doc_id, text FROM documents
    WHERE length(text) = strlen(text)),
  fr AS (
    SELECT doc_id,
           CAST(fi AS INT) AS frame_idx,
           CAST(fi * 32 AS INT) AS "offset",
           md5(substring(text, CAST(fi * 32 + 1 AS INT), 32))
             AS frame_md5
    FROM (SELECT doc_id, text,
                 unnest(generate_series(
                   0,
                   CAST(floor(strlen(text) / 32) AS INT) - 1,
                   4)) AS fi
          FROM d))
  SELECT doc_id, frame_idx, "offset", frame_md5 FROM fr"""


@q("q265_multimodal_framesample", _Q265_ORACLE)
def q265(spark: SparkSession, sf: str) -> DataFrame:
    """Strided frame sampling over binary media payloads
    (`multimodal.extract_frame_samples`, 32-byte frames, stride 4):
    the video keyframe-extraction batch shape — Arrow-batched
    mapInPandas, one JVM→Python crossing per batch, 16-byte digests
    out (never the frames).  Unlike the q52/q62 checksum stub, the
    md5-of-slice digest is ENGINE-PORTABLE: the oracle replays every
    frame identity byte-exactly with substring+md5 (docs filtered to
    ASCII so char offsets == byte offsets on both sides), making
    this the only Python-boundary multimodal query with a full value
    hash check."""
    from ..operators.multimodal import (
        attach_fake_media,
        extract_frame_samples,
    )

    docs = load_table(spark, sf, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    return extract_frame_samples(
        attach_fake_media(docs), "doc_id", frame_bytes=32, stride=4
    )


_Q271_ORACLE = """
  WITH planted AS (
    SELECT CASE
             WHEN doc_id % 10 = 0 THEN text || ' reach me at user'
                  || CAST(doc_id AS VARCHAR) || '@example.com'
             WHEN doc_id % 10 = 5 THEN text || ' call +1 555-010-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE text END AS text2,
           CASE WHEN doc_id % 20 = 0
                THEN 'ssn ' || lpad(CAST(doc_id % 900 AS VARCHAR),
                                    3, '0')
                     || '-' || lpad(CAST(doc_id % 90 AS VARCHAR),
                                    2, '0')
                     || '-' || lpad(CAST(doc_id % 9000 AS VARCHAR),
                                    4, '0')
                ELSE 'none' END AS notes
    FROM documents),
  wide AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN regexp_matches(text2,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+') THEN 1 ELSE 0 END)
             AS BIGINT) AS em_t,
           CAST(sum(CASE WHEN regexp_matches(text2,
             '\\+?[0-9][0-9 -]{6,}[0-9]') THEN 1 ELSE 0 END)
             AS BIGINT) AS ph_t,
           CAST(sum(CASE WHEN regexp_matches(text2,
             '[0-9]{3}-[0-9]{2}-[0-9]{4}') THEN 1 ELSE 0 END)
             AS BIGINT) AS ss_t,
           CAST(sum(CASE WHEN regexp_matches(notes,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+') THEN 1 ELSE 0 END)
             AS BIGINT) AS em_n,
           CAST(sum(CASE WHEN regexp_matches(notes,
             '\\+?[0-9][0-9 -]{6,}[0-9]') THEN 1 ELSE 0 END)
             AS BIGINT) AS ph_n,
           CAST(sum(CASE WHEN regexp_matches(notes,
             '[0-9]{3}-[0-9]{2}-[0-9]{4}') THEN 1 ELSE 0 END)
             AS BIGINT) AS ss_n
    FROM planted)
  SELECT 'text2' AS "column", n AS n_rows, em_t AS n_email,
         ph_t AS n_phone, ss_t AS n_ssn FROM wide
  UNION ALL
  SELECT 'notes', n, em_n, ph_n, ss_n FROM wide"""


@q("q271_pii_scan", _Q271_ORACLE)
def q271(spark: SparkSession, sf: str) -> DataFrame:
    """Column-level PII detection battery (`text.pii_scan`) over a
    corpus with deterministically planted emails / phones / SSNs —
    the governance half of q64's redaction: a release review needs
    WHERE PII lives and at what rate per column BEFORE scrubbing.
    One scan, one wide conditional-sum aggregate stacked to a row per
    column (the q111 single-consumer trick — a union of projections
    would re-inline the aggregate into N scans); RE2-safe patterns so
    the oracle replays the exact counts."""
    from ..operators.text import pii_scan

    docs = load_table(spark, sf, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        F.when(
            did % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach me at user"),
                did.cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            did % 10 == 5,
            F.concat(
                F.col("text"),
                F.lit(" call +1 555-010-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text2"),
        F.when(
            did % 20 == 0,
            F.concat(
                F.lit("ssn "),
                F.lpad((did % 900).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 90).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad((did % 9000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.lit("none"))
        .alias("notes"),
    )
    return pii_scan(planted, ["text2", "notes"])


_Q284_ORACLE = """
  WITH per AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           sum(CAST(length(text) AS BIGINT)) AS chars,
           sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS wtok,
           sum(CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))
                    AS BIGINT)) AS btok
    FROM documents GROUP BY lang)
  SELECT lang, n_docs,
         round(chars / CAST(wtok AS DOUBLE), 4)
           AS chars_per_ws_token_r,
         round(chars / CAST(btok AS DOUBLE), 4)
           AS chars_per_bpe_token_r
  FROM per"""


@q("q284_tokenizer_fertility", _Q284_ORACLE)
def q284(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility per language: characters per whitespace
    token and per BPE-ish token — the tokenizer-evaluation staple (a
    language whose fertility is 2× the corpus mean pays 2× the
    context budget per character; the metric that decides vocabulary
    allocation before training).  One partial-combined aggregate
    pass; character and token counts are exact integers, fertility
    is one rounded ratio per language."""
    from ..operators.text import bpe_ish_token_count, token_count

    docs = load_table(spark, sf, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("text").cast("bigint")).alias("__chars"),
        F.sum(token_count("text").cast("bigint")).alias("__wtok"),
        F.sum(bpe_ish_token_count("text").cast("bigint")).alias(
            "__btok"
        ),
    )
    return per.select(
        "lang",
        "n_docs",
        F.round(
            F.col("__chars") / F.col("__wtok").cast("double"), 4
        ).alias("chars_per_ws_token_r"),
        F.round(
            F.col("__chars") / F.col("__btok").cast("double"), 4
        ).alias("chars_per_bpe_token_r"),
    )


_Q285_ORACLE = """
  WITH t AS (
    SELECT doc_id, lang,
           list_transform(regexp_split_to_array(text, '\\s+'),
                          x -> lower(x)) AS toks
    FROM documents),
  s AS (
    SELECT doc_id, lang,
      len(list_filter(toks, x -> x IN ('the','a','of','and','to')))::DOUBLE / greatest(len(toks), 1) AS s_en,
      len(list_filter(toks, x -> x IN ('el','la','de','que','y')))::DOUBLE / greatest(len(toks), 1) AS s_es,
      len(list_filter(toks, x -> x IN ('le','la','de','et','un')))::DOUBLE / greatest(len(toks), 1) AS s_fr,
      len(list_filter(toks, x -> x IN ('der','die','das','und','ein')))::DOUBLE / greatest(len(toks), 1) AS s_de,
      len(list_filter(toks, x -> x IN ('的','是','了','在','我')))::DOUBLE / greatest(len(toks), 1) AS s_zh
    FROM t),
  scored AS (
    SELECT lang AS l,
      CASE WHEN greatest(s_en,s_es,s_fr,s_de,s_zh) = 0 THEN 'und'
           WHEN s_en = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'en'
           WHEN s_es = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'es'
           WHEN s_fr = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'fr'
           WHEN s_de = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'de'
           ELSE 'zh' END AS p
    FROM s),
  cont AS (SELECT l, p, count(*) AS c FROM scored GROUP BY 1, 2),
  contrib AS (
    SELECT l AS class, c AS rc, 0 AS cc,
           CASE WHEN l = p THEN c ELSE 0 END AS tpc FROM cont
    UNION ALL
    SELECT p, 0, c, 0 FROM cont),
  m AS (
    SELECT class,
           CAST(sum(rc) AS BIGINT) AS support,
           CAST(sum(tpc) AS BIGINT) AS tp,
           CAST(sum(cc) - sum(tpc) AS BIGINT) AS fp,
           CAST(sum(rc) - sum(tpc) AS BIGINT) AS fn
    FROM contrib GROUP BY class)
  SELECT class, support, tp, fp, fn,
         CASE WHEN tp + fp > 0
              THEN round(tp / CAST(tp + fp AS DOUBLE), 6)
              END AS precision_r,
         CASE WHEN tp + fn > 0
              THEN round(tp / CAST(tp + fn AS DOUBLE), 6)
              END AS recall_r,
         CASE WHEN tp + fp > 0 AND tp + fn > 0
                   AND (tp / CAST(tp + fp AS DOUBLE)
                        + tp / CAST(tp + fn AS DOUBLE)) > 0
              THEN round(2.0 * (tp / CAST(tp + fp AS DOUBLE))
                             * (tp / CAST(tp + fn AS DOUBLE))
                         / (tp / CAST(tp + fp AS DOUBLE)
                            + tp / CAST(tp + fn AS DOUBLE)), 6)
              END AS f1_r
  FROM m"""


@q("q285_langid_quality_report", _Q285_ORACLE)
def q285(spark: SparkSession, sf: str) -> DataFrame:
    """Per-class quality report of the q61 language classifier
    against the labeled languages — q257's classification_report
    composed with q61's language_id_table: WHICH language does the
    stopword heuristic confuse, with never-predicted classes
    surfaced as NULL precision.  The eval every corpus-curation
    classifier needs before its output gates anything; the oracle
    replays the full heuristic + confusion-margin pipeline in SQL."""
    from ..operators.stats import classification_report
    from ..operators.text import language_id_table

    docs = load_table(spark, sf, "documents")
    # lang rides THROUGH the language aggregate as a carried group key
    # (functionally dependent on doc_id) — no second corpus scan, no
    # |docs|-row join to re-attach the label
    guessed = language_id_table(docs, carry_cols=["lang"])
    return classification_report(guessed, "lang", "lang_guess")


_Q295_ORACLE = """
  WITH per AS (
    SELECT source,
           len(regexp_split_to_array(text, '\\s+')) AS words,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
             AS sentences,
           len(regexp_extract_all(lower(text), '[aeiouy]+'))
             AS syllables
    FROM documents),
  sc AS (
    SELECT source, words, sentences, syllables,
           206835 - 1015 * (words // sentences)
                  - ((84600 * syllables) // words) AS flesch_milli
    FROM per)
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(flesch_milli) AS BIGINT) AS sum_flesch_milli,
         round(sum(flesch_milli) / CAST(count(*) AS DOUBLE), 4)
           AS avg_flesch_milli_r,
         CAST(sum(CASE WHEN flesch_milli < 30000 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hard
  FROM sc GROUP BY source"""


@q("q295_readability_profile", _Q295_ORACLE)
def q295(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source readability profile (`operators/text.py:
    readability_scores`): the integerized Flesch reading-ease signal
    (milli-units, integer division only — no cross-engine float
    hazard) aggregated by corpus source, with the count of
    hard-to-read documents (score < 30) a curation mix would
    down-weight.  Joins the q57/q137 quality-filter family with a
    READER-side signal the length/punct ratios don't capture.  Pure
    codegen arithmetic riding the scan + one |sources|-row
    aggregate."""
    from ..operators.text import readability_scores

    docs = load_table(spark, sf, "documents")
    sc = readability_scores(docs, "text")
    return sc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("flesch_milli").cast("bigint").alias("sum_flesch_milli"),
        F.round(
            F.sum("flesch_milli") / F.count(F.lit(1)).cast("double"), 4
        ).alias("avg_flesch_milli_r"),
        F.sum((F.col("flesch_milli") < 30000).cast("long"))
        .cast("bigint")
        .alias("n_hard"),
    )


_Q318_ORACLE = """
  WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS tk
    FROM documents),
  tf AS (
    SELECT source, tk, count(*) AS c
    FROM tok WHERE len(tk) > 0 GROUP BY source, tk),
  coc AS (
    SELECT source, c, count(*) AS nc FROM tf GROUP BY source, c)
  SELECT source,
         CAST(sum(c * nc) AS BIGINT) AS n_tokens,
         CAST(sum(nc) AS BIGINT) AS vocab,
         CAST(sum(CASE WHEN c = 1 THEN nc ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN c = 2 THEN nc ELSE 0 END) AS BIGINT) AS n2,
         round(CAST(sum(CASE WHEN c = 1 THEN nc ELSE 0 END) AS DOUBLE)
               / sum(c * nc), 6) AS unseen_mass_r,
         round(CAST(2 * sum(CASE WHEN c = 2 THEN nc ELSE 0 END) AS DOUBLE)
               / greatest(sum(CASE WHEN c = 1 THEN nc ELSE 0 END), 1), 6)
           AS gt_adjusted_c1_r
  FROM coc GROUP BY source"""


@q("q318_good_turing_mass", _Q318_ORACLE)
def q318(spark: SparkSession, sf: str) -> DataFrame:
    """Good-Turing unseen-probability mass per source: the fraction of
    the next sampled token expected to be UNSEEN is N1/N (singleton
    mass), and the Good-Turing adjusted count for singletons is
    2*N2/N1 — the corpus-coverage diagnostic that tells a pretraining
    pipeline which sources still have fat unseen tails (crawl more)
    versus saturated vocabularies (dedup harder).  Three cascaded
    partial-aggregated groupBys — (source, token) -> (source,
    count-of-counts) -> source — each stage strictly smaller, no
    window, no Python; the count-of-counts histogram is the entire
    sufficient statistic, so the shuffle after stage one carries
    |vocab| rows, then |distinct counts| rows."""
    docs = load_table(spark, sf, "documents")
    tf = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("tk")
        )
        .where(F.length("tk") > 0)
        .groupBy("source", "tk")
        .agg(F.count("*").alias("c"))
    )
    coc = tf.groupBy("source", "c").agg(F.count("*").alias("nc"))
    n1 = F.sum(F.when(F.col("c") == 1, F.col("nc")).otherwise(0))
    n2 = F.sum(F.when(F.col("c") == 2, F.col("nc")).otherwise(0))
    ntok = F.sum(F.col("c") * F.col("nc"))
    return coc.groupBy("source").agg(
        ntok.cast("bigint").alias("n_tokens"),
        F.sum("nc").cast("bigint").alias("vocab"),
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(n1.cast("double") / ntok, 6).alias("unseen_mass_r"),
        F.round(
            (2 * n2).cast("double") / F.greatest(n1, F.lit(1)), 6
        ).alias("gt_adjusted_c1_r"),
    )


_Q324_ORACLE = """
  WITH tok AS (
    SELECT doc_id, gs AS pos, toks[gs] AS tk
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents),
         LATERAL UNNEST(generate_series(1, len(toks))) t(gs)
    WHERE len(toks[gs]) > 0),
  big AS (
    SELECT a.tk AS t1, b.tk AS t2, count(*) AS c
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY a.tk, b.tk
    ORDER BY c DESC, t1 ASC, t2 ASC LIMIT 1)
  SELECT big.t1 AS phrase_w1, big.t2 AS phrase_w2,
         a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM tok a
  JOIN big ON a.tk = big.t1
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            AND b.tk = big.t2
  GROUP BY big.t1, big.t2, a.doc_id"""


@q("q324_phrase_search", _Q324_ORACLE)
def q324(spark: SparkSession, sf: str) -> DataFrame:
    """Positional phrase search, the inverted-index primitive the
    bag-of-words retrieval tier (BM25 q141, TF-IDF q302) cannot
    express: token postings carry POSITIONS (posexplode), and a
    phrase match is an equi-join of the two terms' postings on
    (doc_id, pos+1) — exactly how Lucene/ES execute quoted queries,
    as a relational join instead of a skip-list zipper.  The query
    first derives the corpus's most frequent bigram (deterministic
    count/lexical tiebreak — self-contained at any sf) and then
    phrase-searches it; the phrase row is a 1-row broadcast against
    the postings, so the search costs one positional equi-join keyed
    by doc — at 100 TB the postings are the shuffle, the phrase side
    is KB."""
    docs = load_table(spark, sf, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "tk"),
    ).where(F.length("tk") > 0).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tk"
    )
    a, b = tok.alias("a"), tok.alias("b")
    big = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(
            F.col("a.tk").alias("t1"), F.col("b.tk").alias("t2")
        )
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(1)
    )
    hit_a = tok.alias("ha")
    hit_b = tok.alias("hb")
    return (
        hit_a.join(
            F.broadcast(big), F.col("ha.tk") == F.col("t1")
        )
        .join(
            hit_b,
            (F.col("hb.doc_id") == F.col("ha.doc_id"))
            & (F.col("hb.pos") == F.col("ha.pos") + 1)
            & (F.col("hb.tk") == F.col("t2")),
        )
        .groupBy(
            F.col("t1").alias("phrase_w1"),
            F.col("t2").alias("phrase_w2"),
            F.col("ha.doc_id").alias("doc_id"),
        )
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
    )


_Q340_ORACLE = """
  WITH toks AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
    FROM documents),
  packed AS (
    SELECT lang,
           CAST(floor(
             (sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n_tok) / 2048.0
           ) AS INT) AS pack_id,
           n_tok
    FROM toks),
  per_pack AS (
    SELECT lang, pack_id, CAST(sum(n_tok) AS BIGINT) AS tok
    FROM packed GROUP BY lang, pack_id)
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_packs,
         CAST(sum(tok) AS BIGINT) AS total_tokens,
         CAST((1000 * sum(tok)) // (2048 * count(*)) AS BIGINT)
           AS avg_fill_milli,
         CAST(sum(CASE WHEN tok > 2048 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_straddle,
         CAST(sum(CASE WHEN 2 * tok < 2048 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_under_half
  FROM per_pack GROUP BY lang"""


@q("q340_pack_efficiency", _Q340_ORACLE)
def q340(spark: SparkSession, sf: str) -> DataFrame:
    """Packing-efficiency report over q65's sequence packer: per
    language shard, the pack count, mean fill ratio against the
    2048-token budget (milli-units, integer division), straddle
    packs (a document crossing the boundary overfills its pack — the
    greedy offset packer's known trade), and under-half-filled packs
    — the numbers that price pretraining batch waste: avg_fill 850
    means 15% of every training step is padding.  Reuses q65's exact
    pack-assignment formula so the report audits the SAME packing
    the pipeline ships; one lang-partitioned cumulative window + two
    rollups."""
    docs = load_table(spark, sf, "documents")
    with_tok = docs.select(
        "doc_id", "lang", token_count("text").alias("n_tok")
    )
    packed = pack_sequences(
        with_tok, budget=2048, order_col="doc_id", tokens_col="n_tok",
        shard_col="lang",
    ).select("lang", "pack_id", "n_tok")
    per_pack = packed.groupBy("lang", "pack_id").agg(
        F.sum("n_tok").cast("bigint").alias("tok")
    )
    return per_pack.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_packs"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
        F.expr("(1000 * sum(tok)) DIV (2048 * count(*))")
        .cast("bigint")
        .alias("avg_fill_milli"),
        F.sum(F.when(F.col("tok") > 2048, 1).otherwise(0))
        .cast("bigint")
        .alias("n_straddle"),
        F.sum(F.when(2 * F.col("tok") < 2048, 1).otherwise(0))
        .cast("bigint")
        .alias("n_under_half"),
    )


_Q356_ORACLE = """
  WITH t AS (SELECT string_split(lower(text), ' ') AS toks
             FROM documents),
  b AS (SELECT toks[j] AS w1, toks[j + 1] AS w2
        FROM t, LATERAL UNNEST(generate_series(1, len(toks) - 1)) AS s(j)
        WHERE len(toks) >= 2),
  c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        FROM b GROUP BY w1, w2),
  uni AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS c1,
                 CAST(count(*) AS BIGINT) AS n1plus_fw
          FROM c GROUP BY w1),
  cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1plus_bw
           FROM c GROUP BY w2),
  tt AS (SELECT CAST(count(*) AS BIGINT) AS T FROM c),
  topw AS (SELECT w1, c1, n1plus_fw FROM (
             SELECT w1, c1, n1plus_fw,
                    row_number() OVER (ORDER BY c1 DESC, w1) AS rw
             FROM uni) WHERE rw <= 20),
  cand AS (SELECT w1, w2, n_pair FROM (
             SELECT c.w1, c.w2, c.n_pair,
                    row_number() OVER (PARTITION BY c.w1
                                       ORDER BY c.n_pair DESC, c.w2)
                      AS rk
             FROM c JOIN topw USING (w1)) WHERE rk <= 3)
  SELECT cand.w1, cand.w2, cand.n_pair, topw.c1,
         cont.n1plus_bw,
         round((greatest(cand.n_pair - 0.75, 0.0) / topw.c1)
               + (0.75 * topw.n1plus_fw / topw.c1)
                 * (cont.n1plus_bw / CAST(tt.T AS DOUBLE)), 6)
           AS p_kn_r
  FROM cand
  JOIN topw ON cand.w1 = topw.w1
  JOIN cont ON cand.w2 = cont.w2
  CROSS JOIN tt"""


@q("q356_kneser_ney_bigram", _Q356_ORACLE)
def q356(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser-Ney 1995,
    Chen-Goodman 1999's winning smoother) for the corpus's 20 most
    frequent contexts x their top-3 continuations: absolute discount
    d = 0.75 off every seen pair, mass recycled through the
    CONTINUATION unigram (how many distinct contexts precede w2 —
    the reason 'Francisco' scores low despite raw frequency).  All
    four count tables (pair, context, forward-type, backward-type)
    are partial-aggregated integer groupBys off ONE shingle pass;
    the smoothing formula is a single identical IEEE tree over those
    integers on both engines.  n-gram LM scoring at 100 TB is these
    same four aggregates — nothing here is driver-sized except the
    top-20 display cut."""
    from ..operators.dedup import shingle_rows

    docs = load_table(spark, sf, "documents")
    lowered = docs.select(F.lower(F.col("text")).alias("__txt"))
    grams = shingle_rows(
        lowered.withColumn("__id", F.monotonically_increasing_id()),
        "__id",
        "__txt",
        n=2,
    )
    pairs = grams.filter(F.instr("shingle", "|") > 0).select(
        F.split_part(F.col("shingle"), F.lit("|"), F.lit(1)).alias("w1"),
        F.split_part(F.col("shingle"), F.lit("|"), F.lit(2)).alias("w2"),
    )
    from ..operators.materialize import pin as _pin
    # checkpoint (not persist): per-call materialization, no cache leak
    c = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .transform(_pin)
    )
    uni = c.groupBy("w1").agg(
        F.sum("n_pair").cast("bigint").alias("c1"),
        F.count("*").cast("bigint").alias("n1plus_fw"),
    )
    cont = c.groupBy("w2").agg(
        F.count("*").cast("bigint").alias("n1plus_bw")
    )
    tt = c.agg(F.count("*").cast("bigint").alias("T"))
    topw = (
        uni.withColumn(
            "rw", F.row_number().over(Window.orderBy(F.desc("c1"), "w1"))
        )
        .where(F.col("rw") <= 20)
        .select("w1", "c1", "n1plus_fw")
    )
    cand = (
        c.join(F.broadcast(topw.select("w1")), "w1")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(F.desc("n_pair"), "w2")
            ),
        )
        .where(F.col("rk") <= 3)
        .select("w1", "w2", "n_pair")
    )
    return (
        cand.join(F.broadcast(topw), "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .selectExpr(
            "w1",
            "w2",
            "n_pair",
            "c1",
            "n1plus_bw",
            "round((greatest(n_pair - 0.75, 0.0) / c1)"
            " + (0.75 * n1plus_fw / c1)"
            "   * (n1plus_bw / CAST(T AS DOUBLE)), 6) AS p_kn_r",
        )
    )


_Q372_ORACLE = """
  WITH t AS (
    SELECT unnest(string_split(lower(text), ' ')) AS tok
    FROM documents),
  f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
        FROM t WHERE tok <> '' GROUP BY tok),
  r AS (
    SELECT freq,
           row_number() OVER (ORDER BY freq DESC, tok) AS rank
    FROM f),
  top AS (
    SELECT ln(CAST(rank AS DOUBLE)) AS x,
           ln(CAST(freq AS DOUBLE)) AS y
    FROM r WHERE rank <= 1000),
  m AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM top)
  SELECT k AS n_ranks_fit,
         round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
           AS zipf_slope_r,
         round(((k * sxy - sx * sy) * (k * sxy - sx * sy))
               / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6)
           AS r2_r
  FROM m"""


@q("q372_zipf_law_fit", _Q372_ORACLE)
def q372(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit over the top-1000 token ranks: the log-log OLS
    slope of frequency vs rank (natural text sits near -1; a corpus
    that fits poorly — low R² — or slopes far from -1 is template
    spam or boilerplate, the corpus-level twin of q77's per-doc
    repetition signal).  One token count (partial-agg), a rank
    window cut to 1000 rows, and a 5-moment OLS over those 1000 log
    points; the only floats are ln() over exact integer counts (the
    q235/q359 precedent)."""
    docs = load_table(spark, sf, "documents")
    t = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    ).where(F.col("tok") != "")
    f = t.groupBy("tok").agg(F.count("*").cast("bigint").alias("freq"))
    r = f.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), "tok"))
        .alias("rank"),
    ).where(F.col("rank") <= 1000)
    top = r.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = top.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.selectExpr(
        "k AS n_ranks_fit",
        "round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)"
        " AS zipf_slope_r",
        "round(((k * sxy - sx * sy) * (k * sxy - sx * sy))"
        " / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS r2_r",
    )
