"""Text-analysis queries over the ``documents`` table (scale-out §8).

The oracle SQL mirrors each columnar expression exactly — same
normalization, same token split, same rounding — so the hash compare tests
implementation parity, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.textops import (
    LANG_STOPWORDS,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_token_count,
)
from land_registry_data_ingestion_spark.plans.registry import query
from land_registry_data_ingestion_spark.sources.parquet import load_tables

# Shared SQL fragments (DuckDB): normalized text and token list.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_NORM = f"string_split_regex({_NORM}, '\\s+')"
# whitespace-normalized token count (DuckDB trim, like Spark's, strips
# only spaces — raw split gave phantom edge tokens on tabs/newlines);
# mirrors functions/text.py::token_count, which skips the lowercase.
_WSNORM = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
_NTOK = (
    f"CAST(CASE WHEN {_WSNORM} = '' THEN 0"
    f" ELSE len(string_split_regex({_WSNORM}, '\\s+')) END AS BIGINT)"
)


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


_SW_HITS_EN = (
    f"len(list_filter({_TOKS_NORM}, t -> list_contains({_sw_list('en')}, t)))"
)


# BPE-ish pre-token chunks (mirrors functions/text.py::BPE_ISH — ASCII
# classes, no lookahead, so RE2 and Java regex agree byte-for-byte)
_NBPE = (
    "CAST(len(regexp_extract_all(text,"
    " ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT)"
)


@query(
    "text_token_count",
    sql=f"""
    SELECT doc_id, {_NTOK} AS n_tokens, {_NBPE} AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts per document in two units — whitespace words and
    BPE-style subword chunks — the truncation/cost accounting units of a
    training-data pipeline."""
    t = load_tables(spark, sf_dir)
    return with_token_count(t.documents).select(
        "doc_id", "n_tokens", "n_bpe_tokens"
    )


@query(
    "text_quality_score",
    sql=f"""
    WITH m AS (
        SELECT doc_id,
               {_NTOK} AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_measured,
               length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                 * 1.0 / length(text) AS p_ratio,
               {_SW_HITS_EN} * 1.0
                 / greatest({_NTOK}, 1) AS sw_ratio
        FROM documents
    )
    SELECT doc_id, n_tokens, n_chars_measured,
           ROUND(p_ratio, 6) AS punct_ratio,
           ROUND(sw_ratio, 6) AS stopword_ratio,
           ROUND(n_chars_measured * 1.0 / greatest(n_tokens, 1), 6) AS mean_word_len,
           ROUND(CASE
               WHEN n_tokens < 5 THEN 0.0
               WHEN p_ratio > 0.3 THEN 0.2
               ELSE least(1.0, 0.5 * least(n_tokens / 100.0, 1.0)
                               + 0.3 * (1.0 - p_ratio)
                               + 0.2 * least(sw_ratio * 5.0, 1.0))
           END, 6) AS quality_score
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features (length / punctuation / stopword density)
    + composite score — single map stage, no shuffle."""
    t = load_tables(spark, sf_dir)
    return with_quality_score(t.documents).select(
        "doc_id",
        "n_tokens",
        "n_chars_measured",
        "punct_ratio",
        "stopword_ratio",
        "mean_word_len",
        "quality_score",
    )


def _langid_hits_case() -> tuple[str, str]:
    hits = ",\n               ".join(
        f"len(list_filter({_TOKS_NORM}, t -> list_contains({_sw_list(lang)}, t))) AS h_{lang}"
        for lang in sorted(LANG_STOPWORDS)
    )
    langs = sorted(LANG_STOPWORDS)
    m = "greatest(" + ", ".join(f"h_{la}" for la in langs) + ")"
    case = "CASE WHEN " + m + " = 0 THEN 'und' "
    for la in langs[:-1]:
        case += f"WHEN h_{la} = {m} THEN '{la}' "
    case += f"ELSE '{langs[-1]}' END"
    return hits, case


@query(
    "text_curate_corpus",
    sql=f"""
    WITH q AS (
        SELECT doc_id,
               {_NTOK} AS n_tokens,
               length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                 * 1.0 / length(text) AS p_ratio,
               len(list_filter({_TOKS_NORM},
                   t -> list_contains({_sw_list('en')}, t))) * 1.0
                 / greatest({_NTOK}, 1) AS sw_ratio
        FROM documents
    ),
    scored AS (
        SELECT doc_id, n_tokens,
               ROUND(CASE
                   WHEN n_tokens < 5 THEN 0.0
                   WHEN p_ratio > 0.3 THEN 0.2
                   ELSE least(1.0, 0.5 * least(n_tokens / 100.0, 1.0)
                                   + 0.3 * (1.0 - p_ratio)
                                   + 0.2 * least(sw_ratio * 5.0, 1.0))
               END, 6) AS quality_score
        FROM q
    ),
    langs AS (
        SELECT doc_id, {_langid_hits_case()[1]} AS predicted_lang
        FROM (SELECT doc_id, {_langid_hits_case()[0]} FROM documents)
    ),
    canon AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM})
    )
    SELECT s.doc_id, s.n_tokens, s.quality_score, l.predicted_lang
    FROM scored s
    JOIN langs l USING (doc_id)
    JOIN canon c USING (doc_id)
    WHERE s.quality_score >= 0.5 AND s.n_tokens >= 5
    """,
)
def text_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation filter a training-data pipeline runs:
    exact-dedup keep-one ∧ quality_score ≥ 0.5 ∧ ≥5 tokens, annotated
    with predicted language. One dedup shuffle + pure map stages —
    the text column never moves after the fingerprint aggregate."""
    from land_registry_data_ingestion_spark.operators.dedup import exact_dedup

    t = load_tables(spark, sf_dir)
    docs = t.documents
    scored = with_language_id(with_quality_score(docs))
    kept = (
        scored.join(
            exact_dedup(docs, "doc_id").select("doc_id"), "doc_id", "left_semi"
        )
        .filter((F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 5))
    )
    return kept.select("doc_id", "n_tokens", "quality_score", "predicted_lang")


def _langid_sql() -> str:
    hits = ",\n               ".join(
        f"len(list_filter({_TOKS_NORM}, t -> list_contains({_sw_list(lang)}, t))) AS h_{lang}"
        for lang in sorted(LANG_STOPWORDS)
    )
    langs = sorted(LANG_STOPWORDS)
    m = "greatest(" + ", ".join(f"h_{la}" for la in langs) + ")"
    case = "CASE WHEN " + m + " = 0 THEN 'und' "
    for la in langs[:-1]:
        case += f"WHEN h_{la} = {m} THEN '{la}' "
    case += f"ELSE '{langs[-1]}' END"
    return f"""
    WITH s AS (
        SELECT doc_id, lang,
               {hits}
        FROM documents
    )
    SELECT lang, {case} AS predicted_lang, COUNT(*) AS n_docs
    FROM s GROUP BY 1, 2
    """


@query("text_language_id", sql=_langid_sql())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID, cross-tabbed against the labeled
    ``lang`` column (the labels are synthetic; the oracle checks heuristic
    parity, not label recovery)."""
    t = load_tables(spark, sf_dir)
    return (
        with_language_id(t.documents)
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "text_fingerprint",
    sql=f"""
    SELECT doc_id, md5({_NORM}) AS doc_fingerprint FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic normalized-content fingerprint per document."""
    t = load_tables(spark, sf_dir)
    return with_fingerprint(t.documents).select("doc_id", "doc_fingerprint")


# Deterministic PII enrichment: the synthetic corpus contains no PII, so
# both engines append the same synthetic email / phone to a subset of
# rows before redacting — the regexes then have real positives AND real
# negatives to prove themselves on.
_ENRICHED = """
    CASE WHEN doc_id % 3 = 0
         THEN text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
         ELSE text END
    || CASE WHEN doc_id % 5 = 0
            THEN ' tel +44 7' || lpad(CAST((doc_id % 100000000) * 7919 % 100000000 AS VARCHAR), 8, '0')
            ELSE '' END
"""
# (doc_id % 1e8) * 7919 % 1e8, NOT doc_id * 7919 % 1e8: congruence-
# identical for every id (truncated remainder preserves residue class
# and sign through the reduction), but the bare product overflows int64
# for hash-derived ids near ±2^63 — an ANSI runtime crash on both
# engines (keyedge adversarial tier, round 10). The reduced intermediate
# is bounded by 1e8 * 7919 ≈ 8e11.
_EMAIL_RE_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE_SQL = "\\+[0-9][0-9 ()-]{6,}[0-9]"


@query(
    "text_redact_pii",
    sql=f"""
    WITH enriched AS (SELECT doc_id, {_ENRICHED} AS text FROM documents),
    scrubbed AS (
        SELECT doc_id, text,
               regexp_replace(text, '{_EMAIL_RE_SQL}', '<EMAIL>', 'g') AS no_email
        FROM enriched
    )
    SELECT doc_id,
           regexp_replace(no_email, '{_PHONE_RE_SQL}', '<PHONE>', 'g') AS text_redacted,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE_SQL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(no_email, '{_PHONE_RE_SQL}')) AS BIGINT) AS n_phones
    FROM scrubbed
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, then phones) as two codegen'd JVM regex
    passes with per-row match counts — no UDF, no shuffle. Rows are first
    deterministically enriched with synthetic PII on a subset (see
    ``_ENRICHED``) so the oracle checks true positives and negatives."""
    from land_registry_data_ingestion_spark.operators.textops import redact_pii

    t = load_tables(spark, sf_dir)
    enriched = t.documents.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" contact u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.col("text")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" tel +44 7"),
                    F.lpad(
                        (F.col("doc_id") % 100000000 * 7919 % 100000000).cast("string"),
                        8,
                        "0",
                    ),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(enriched).select(
        "doc_id", "text_redacted", "n_emails", "n_phones"
    )


@query(
    "text_hash_split",
    sql="""
    SELECT doc_id,
           CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 100 AS BIGINT) AS bucket,
           CASE WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80
                THEN 'train'
                WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
                THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment by content-free key hash
    (md5-derived 60-bit int mod 100 → 80/10/10). Unlike ``df.sample``/
    ``randomSplit`` this is reproducible across engines, runs, partitions
    AND table growth: a document keeps its split forever, which is what
    incremental training-data pipelines need. Pure codegen'd map — no
    shuffle, no RNG state."""
    from land_registry_data_ingestion_spark.operators.dedup import _md5_hash64

    t = load_tables(spark, sf_dir)
    bucket = (_md5_hash64(F.col("doc_id").cast("string"), "split") % 100).alias(
        "bucket"
    )
    return t.documents.select("doc_id", bucket).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "text_vocabulary",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_NORM}) AS token
        FROM documents WHERE trim(text) <> ''
    )
    SELECT token,
           COUNT(*) AS term_freq,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM toks
    GROUP BY token
    ORDER BY term_freq DESC, token
    LIMIT 100
    """,
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by collection frequency with
    document frequency — the first step of any tokenizer/TF-IDF build.
    Explode → one partial-agg shuffle on token → ordered take; the
    top-k never globally sorts the full vocabulary."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.filter(F.trim("text") != "").select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
            )
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), "token")
        .limit(100)
    )


@query(
    "text_gopher_filters",
    sql=f"""
    WITH feats AS (
        SELECT doc_id,
               {_NTOK} AS n_tok,
               len(regexp_replace({_NORM}, '\\s', '', 'g')) AS n_word_chars,
               len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols,
               len(list_filter({_TOKS_NORM},
                   t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha_words
        FROM documents
    )
    SELECT doc_id,
           n_tok BETWEEN 10 AND 100000 AS rule_word_count,
           (n_word_chars / greatest(n_tok, 1)) BETWEEN 2.0 AND 10.0
               AS rule_mean_word_len,
           (n_symbols / greatest(n_tok, 1)) <= 0.1 AS rule_symbol_ratio,
           (n_alpha_words / greatest(n_tok, 1)) >= 0.7 AS rule_alpha_words,
           (n_tok BETWEEN 10 AND 100000)
               AND ((n_word_chars / greatest(n_tok, 1)) BETWEEN 2.0 AND 10.0)
               AND ((n_symbols / greatest(n_tok, 1)) <= 0.1)
               AND ((n_alpha_words / greatest(n_tok, 1)) >= 0.7)
               AS passes_gopher
    FROM feats
    """,
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule battery (word count, mean word length,
    symbol ratio, alphabetic-word fraction) as independent boolean flags
    plus their conjunction — one codegen'd map stage, zero shuffle."""
    from land_registry_data_ingestion_spark.operators.textops import (
        gopher_quality_flags,
    )

    t = load_tables(spark, sf_dir)
    return gopher_quality_flags(t.documents).select(
        "doc_id",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_alpha_words",
        "passes_gopher",
    )


@query(
    "text_repetition_filters",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_NORM} AS w FROM documents),
    g AS (
        SELECT doc_id, 2 AS k,
               unnest(list_transform(
                   generate_series(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1])) AS gram
        FROM toks WHERE len(w) >= 2
        UNION ALL
        SELECT doc_id, 3 AS k,
               unnest(list_transform(
                   generate_series(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM toks WHERE len(w) >= 3
    ),
    counts AS (
        SELECT doc_id, k, gram, count(*) AS c FROM g GROUP BY doc_id, k, gram
    ),
    per AS (
        SELECT doc_id, k, max(c) AS top,
               sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
               sum(c) AS tot
        FROM counts GROUP BY doc_id, k
    ),
    wide AS (
        SELECT doc_id,
               max(CASE WHEN k = 2
                   THEN ROUND(top * 1.0 / tot, 6) END) AS top_bigram_frac,
               max(CASE WHEN k = 3
                   THEN ROUND(dup * 1.0 / tot, 6) END) AS dup_trigram_frac
        FROM per GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(w.top_bigram_frac, 0.0) AS top_bigram_frac,
           COALESCE(w.dup_trigram_frac, 0.0) AS dup_trigram_frac,
           COALESCE(w.top_bigram_frac, 0.0) <= 0.18 AS pass_top_bigram,
           COALESCE(w.dup_trigram_frac, 0.0) <= 0.30 AS pass_dup_trigram,
           (COALESCE(w.top_bigram_frac, 0.0) <= 0.18
            AND COALESCE(w.dup_trigram_frac, 0.0) <= 0.30)
               AS pass_repetition
    FROM documents d LEFT JOIN wide w USING (doc_id)
    """,
)
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1): top word-2-gram
    occupancy ≤ 0.18 and duplicate word-3-gram occupancy ≤ 0.30 — the
    boilerplate/babble detectors that length/character rules
    (``text_gopher_filters``) cannot see. One exploded n-gram stream into
    codegen'd hash aggregates; see ``operators/textops.py::
    repetition_flags`` for the scale shape."""
    from land_registry_data_ingestion_spark.operators.textops import (
        repetition_flags,
    )

    t = load_tables(spark, sf_dir)
    return repetition_flags(t.documents)


# Priority-sampling parameters shared by the Spark plan and the oracle.
_PS_K = 200
_PS_SCALE = float(2**60)


@query(
    "text_weighted_sample",
    sql=f"""
    WITH pri AS (
        SELECT doc_id, n_chars,
               n_chars / ((CAST(('0x' || substr(
                   md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 15
               ))::BIGINT AS DOUBLE) + 1.0) / {_PS_SCALE!r}) AS priority
        FROM documents
    )
    SELECT doc_id, n_chars, ROUND(priority, 4) AS priority
    FROM pri ORDER BY priority DESC, doc_id LIMIT {_PS_K}
    """,
)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield–Lund–Thorup): each document gets priority ``w / u`` with
    ``w`` its length weight and ``u`` a deterministic md5-derived uniform
    in (0, 1]; the sample is the top-k priorities. Long documents are
    proportionally more likely to be kept, yet the choice is a pure
    function of ``doc_id`` — re-running on a grown corpus keeps the
    decisions for unchanged rows (unlike ``df.sample``, whose output
    depends on partitioning).

    Cross-engine exactness: ``u`` is built only from IEEE
    correctly-rounded steps (60-bit int → double cast, +1, division by a
    power of two), and ``w/u`` is one more correctly-rounded division, so
    both engines compute bit-identical priorities — the top-k cut and the
    (priority, doc_id) order match exactly, no epsilon anywhere.

    Scale shape: TakeOrdered — each task keeps its local top-k, only
    ``tasks × k`` (id, weight, priority) triples reach the merge; text
    never moves."""
    t = load_tables(spark, sf_dir)
    from land_registry_data_ingestion_spark.operators.dedup import _md5_hash64

    u = (
        _md5_hash64(F.col("doc_id").cast("string"), "ws").cast("double")
        + F.lit(1.0)
    ) / F.lit(_PS_SCALE)
    pri = t.documents.select(
        "doc_id", "n_chars", (F.col("n_chars") / u).alias("priority")
    )
    return (
        pri.orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(_PS_K)
        .select("doc_id", "n_chars", F.round("priority", 4).alias("priority"))
    )


@query(
    "text_edit_distance_pairs",
    sql="""
    WITH p AS (
        SELECT doc_id, lang, n_chars,
               substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 80) AS pfx,
               CAST(n_chars // 64 AS BIGINT) AS band
        FROM documents
    )
    SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           CAST(levenshtein(a.pfx, b.pfx) AS INTEGER) AS distance
    FROM p a JOIN p b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= 8
    """,
)
def text_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by Levenshtein edit distance ≤ 8 on the
    ASCII-projected 80-char prefix, blocked by (lang, length-band of 64
    chars) — the character-level complement to the token-level Jaccard
    and MinHash families (catches single-character edits that shift every
    shingle). Non-ASCII is stripped on both sides first because DuckDB's
    ``levenshtein`` counts bytes while Spark's counts characters; on the
    ASCII projection the two agree exactly.

    The blocking is what makes this survive scale: the self-join is an
    equi-join on (lang, band) — never all-pairs — and each row carries an
    80-char prefix, not the document. Within-block cost is quadratic by
    construction (same contract as the LSH band join); band width tunes
    the recall/cost trade like ``n_bands`` does there. The JVM-side
    ``levenshtein`` evaluates inside codegen — no Python in the loop."""
    t = load_tables(spark, sf_dir)
    p = t.documents.select(
        "doc_id",
        "lang",
        F.substring(
            F.regexp_replace(F.col("text"), "[^ -~]", ""), 1, 80
        ).alias("pfx"),
        F.floor(F.col("n_chars") / 64).cast("long").alias("band"),
    )
    a = p.select(
        F.col("lang").alias("lang"),
        F.col("band").alias("band"),
        F.col("doc_id").alias("doc_id_1"),
        F.col("pfx").alias("pfx_1"),
    )
    b = p.select(
        F.col("lang").alias("lang"),
        F.col("band").alias("band"),
        F.col("doc_id").alias("doc_id_2"),
        F.col("pfx").alias("pfx_2"),
    )
    return (
        a.join(b, ["lang", "band"])
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .select(
            "doc_id_1",
            "doc_id_2",
            F.levenshtein("pfx_1", "pfx_2").alias("distance"),
        )
        .filter(F.col("distance") <= 8)
    )


# Temperature-mixing parameters shared by the Spark plan and the oracle.
_MIX_T = 0.7
_MIX_SALT = "mix"


@query(
    "text_temperature_mixing",
    sql=f"""
    WITH mass AS (
        SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS m
        FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(m) AS tm FROM mass),
    pq AS (
        SELECT source, m / tm AS p, pow(m / tm, {_MIX_T!r}) AS q_raw
        FROM mass CROSS JOIN tot
    ),
    qn AS (SELECT SUM(q_raw) AS qs FROM pq),
    rates_raw AS (
        SELECT source, p, q_raw / qs AS q FROM pq CROSS JOIN qn
    ),
    c AS (SELECT MIN(p / q) AS c FROM rates_raw),
    rates AS (
        SELECT source, ROUND(c * q / p, 6) AS keep_rate
        FROM rates_raw CROSS JOIN c
    )
    SELECT d.doc_id, d.source, r.keep_rate
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE ('0x' || substr(
        md5('{_MIX_SALT}|' || CAST(d.doc_id AS VARCHAR)), 1, 15
    ))::BIGINT % 1000000 < r.keep_rate * 1000000
    """,
)
def text_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source re-balancing (the multilingual/domain
    mixing rule of mBERT/XLM-R and data-mixture work): target share of
    source s is p_s^T / Σ p^T with T=0.7 < 1, which up-samples small
    sources relative to their raw character mass. Rates are scaled so the
    most down-weighted source keeps rate 1.0 (pure filtering — no
    replication), rounded to 6 before the keep decision so both engines
    apply the exact same threshold; the keep itself is the deterministic
    md5-bucket rule (`hash % 1e6 < rate·1e6`), replayable and stable
    under corpus growth like `text_hash_split`/`text_stratified_sample`.

    Scale shape: one map-combined aggregate builds the per-source masses
    (|sources| rows), the rate algebra happens on that tiny frame, and
    the decision is a broadcast join + map-side filter — the corpus
    never shuffles."""
    t = load_tables(spark, sf_dir)
    from land_registry_data_ingestion_spark.operators.dedup import _md5_hash64
    from land_registry_data_ingestion_spark.util import barrier

    # barrier: the |sources|-row mass frame seeds a chain of scalar
    # aggregates (total, q-normalizer, rate floor) that each reference
    # it — unbarriered, every reference re-scans and re-aggregates the
    # CORPUS (audit read 9 cold scans for a query whose data flow needs
    # exactly 2: one to build the masses, one to apply the keep rule).
    mass = barrier(
        t.documents.groupBy("source").agg(
            F.sum("n_chars").cast("double").alias("m")
        )
    )
    tot = mass.agg(F.sum("m").alias("tm"))
    pq = mass.crossJoin(F.broadcast(tot)).select(
        "source",
        (F.col("m") / F.col("tm")).alias("p"),
        F.pow(F.col("m") / F.col("tm"), F.lit(_MIX_T)).alias("q_raw"),
    )
    qn = pq.agg(F.sum("q_raw").alias("qs"))
    rates_raw = pq.crossJoin(F.broadcast(qn)).select(
        "source", "p", (F.col("q_raw") / F.col("qs")).alias("q")
    )
    c = rates_raw.agg(F.min(F.col("p") / F.col("q")).alias("c"))
    rates = rates_raw.crossJoin(F.broadcast(c)).select(
        "source",
        F.round(F.col("c") * F.col("q") / F.col("p"), 6).alias("keep_rate"),
    )
    keep = (
        _md5_hash64(F.col("doc_id").cast("string"), _MIX_SALT) % 1_000_000
        < F.col("keep_rate") * 1_000_000
    )
    return (
        t.documents.join(F.broadcast(rates), "source")
        .filter(keep)
        .select("doc_id", "source", "keep_rate")
    )


_DUPSPAN_K = 8


@query(
    "text_dup_spans",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_NORM} AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(range(len(t) - {_DUPSPAN_K - 1})) AS pos,
             unnest(list_transform(range(len(t) - {_DUPSPAN_K - 1}),
                    i -> array_to_string(t[i+1:i+{_DUPSPAN_K}], ' '))) AS gk
      FROM toks
    ), dup AS (
      SELECT gk FROM grams GROUP BY gk HAVING count(*) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos FROM grams g
      WHERE g.gk IN (SELECT gk FROM dup)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {_DUPSPAN_K} THEN 0 ELSE 1 END AS brk
      FROM hits
    ), lab AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
      FROM isl
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {_DUPSPAN_K - 1} AS BIGINT) AS span_end,
           CAST(max(pos) + {_DUPSPAN_K} - min(pos) AS BIGINT) AS span_tokens
    FROM lab GROUP BY doc_id, isl_id
    """,
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. 2022): maximal token
    intervals covered by {k}-grams occurring >= 2 times corpus-wide —
    the substring-level dedup the document-level MinHash/SimHash family
    can't see (a boilerplate header shared by otherwise-distinct docs).

    Scale shape (operators/spans.py): one (id, pos, md5-gram) stream
    proportional to token count, one map-combined gram-count aggregate,
    one ids-only semi-join back, per-doc windows. No pair fan-out
    anywhere — hot grams cost one aggregate row, never candidate pairs,
    so no frequency cap is needed to stay linear at 100 TB.
    """
    from land_registry_data_ingestion_spark.operators.spans import duplicated_spans

    t = load_tables(spark, sf_dir)
    spans = duplicated_spans(t.documents, k=_DUPSPAN_K, min_count=2)
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    )


@query(
    "text_dup_span_trim",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_NORM} AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(range(len(t) - {_DUPSPAN_K - 1})) AS pos,
             unnest(list_transform(range(len(t) - {_DUPSPAN_K - 1}),
                    i -> array_to_string(t[i+1:i+{_DUPSPAN_K}], ' '))) AS gk
      FROM toks
    ), dup AS (
      SELECT gk FROM grams GROUP BY gk HAVING count(*) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos FROM grams g
      WHERE g.gk IN (SELECT gk FROM dup)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {_DUPSPAN_K} THEN 0 ELSE 1 END AS brk
      FROM hits
    ), lab AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
      FROM isl
    ), spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {_DUPSPAN_K - 1} AS e
      FROM lab GROUP BY doc_id, isl_id
    ), covered AS (
      SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans
    ), tokpos AS (
      SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS pos FROM toks
    ), kept AS (
      SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
      ANTI JOIN covered c ON tp.doc_id = c.doc_id AND tp.pos = c.pos
    ), rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def text_dup_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of exact-substring dedup: every document with
    its duplicated spans CUT OUT of the normalized token stream (Lee et
    al. 2022's corpus repair, not just detection). Fully-duplicated docs
    survive as empty strings — the caller's drop policy, not ours.

    Scale shape (operators/spans.py::trim_duplicated_spans): covered
    positions re-expand from merged spans (∝ duplicated tokens), the
    keep decision is an ids-only anti-join, and documents reassemble in
    one sorted-struct collect_list — no per-doc window, text crosses the
    shuffle once as (pos, tok) structs."""
    from land_registry_data_ingestion_spark.operators.spans import (
        trim_duplicated_spans,
    )

    t = load_tables(spark, sf_dir)
    out = trim_duplicated_spans(t.documents, k=_DUPSPAN_K, min_count=2)
    return out.select(
        "doc_id", "clean_text", F.col("n_kept").cast("long").alias("n_kept")
    )


_N_SHARDS = 8


@query(
    "text_curriculum_shards",
    sql=f"""
    WITH m AS (
        SELECT doc_id,
               {_NTOK} AS n_tokens,
               length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                 * 1.0 / length(text) AS p_ratio,
               {_SW_HITS_EN} * 1.0
                 / greatest({_NTOK}, 1) AS sw_ratio
        FROM documents
    ), q AS (
        SELECT doc_id,
               ROUND(CASE
                   WHEN n_tokens < 5 THEN 0.0
                   WHEN p_ratio > 0.3 THEN 0.2
                   ELSE least(1.0, 0.5 * least(n_tokens / 100.0, 1.0)
                                   + 0.3 * (1.0 - p_ratio)
                                   + 0.2 * least(sw_ratio * 5.0, 1.0))
               END, 6) AS quality_score
        FROM m
    ), ranked AS (
        SELECT doc_id, quality_score,
               rank() OVER (ORDER BY quality_score DESC, doc_id) AS r,
               count(*) OVER () AS n
        FROM q
    )
    SELECT doc_id, quality_score,
           CAST((r * {_N_SHARDS} + n - 1) // n AS BIGINT) AS shard
    FROM ranked
    """,
)
def text_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: rank the corpus by quality (best first,
    doc_id tiebreak on the ROUNDED score so both engines see identical
    ties) and cut it into {S} equal-population shards — the
    easy-to-hard schedule a curriculum trainer consumes shard by shard.

    Scale shape: the ranking is operators/rank.py::global_rank (range
    partition + offset table), NOT a single-task window; shard cuts are
    the integer-exact ceil(r·S/n) rule shared with the equi-depth
    histogram."""
    from land_registry_data_ingestion_spark.operators.rank import global_rank

    t = load_tables(spark, sf_dir)
    q = with_quality_score(t.documents).select(
        "doc_id", "quality_score", (-F.col("quality_score")).alias("_neg")
    )
    n = q.count()
    ranked = global_rank(q, ["_neg", "doc_id"], rank_col="_r")
    return ranked.select(
        "doc_id",
        "quality_score",
        F.expr(f"(_r * {_N_SHARDS} + {n} - 1) div {n}").alias("shard"),
    )


@query(
    "text_corpus_report",
    sql=f"""
    WITH m AS (
        SELECT doc_id, source, lang,
               {_NTOK} AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_m,
               md5({_NORM}) AS fp,
               length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                 * 1.0 / length(text) AS p_ratio,
               {_SW_HITS_EN} * 1.0
                 / greatest({_NTOK}, 1) AS sw_ratio
        FROM documents
    ), q AS (
        SELECT *, ROUND(CASE
                   WHEN n_tokens < 5 THEN 0.0
                   WHEN p_ratio > 0.3 THEN 0.2
                   ELSE least(1.0, 0.5 * least(n_tokens / 100.0, 1.0)
                                   + 0.3 * (1.0 - p_ratio)
                                   + 0.2 * least(sw_ratio * 5.0, 1.0))
               END, 6) AS qs
        FROM m
    )
    SELECT metric, ROUND(value, 6) AS value FROM (
        SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM q
        UNION ALL
        SELECT 'total_tokens', CAST(SUM(n_tokens) AS DOUBLE) FROM q
        UNION ALL
        SELECT 'total_chars', CAST(SUM(n_chars_m) AS DOUBLE) FROM q
        UNION ALL
        SELECT 'n_sources', CAST(COUNT(DISTINCT source) AS DOUBLE) FROM q
        UNION ALL
        SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS DOUBLE) FROM q
        UNION ALL
        SELECT 'exact_dup_doc_rate',
               1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) FROM q
        UNION ALL
        SELECT 'mean_quality', AVG(qs) FROM q
        UNION ALL
        SELECT 'short_doc_rate',
               CAST(COUNT(*) FILTER (WHERE n_tokens < 5) AS DOUBLE)
                 / COUNT(*) FROM q
    )
    """,
)
def text_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card in one statement: the corpus-level numbers a
    training-data release documents (size, source/language spread, exact
    duplication rate, quality profile) as (metric, value) rows.

    One wide per-doc projection (token counts, fingerprint, quality —
    all codegen'd) feeds a single multi-aggregate pass; the only
    distinct-shuffles are the md5 fingerprint and two low-cardinality
    columns. Composes the same fragments as `text_quality_score` /
    `text_fingerprint`, so the card is consistent with the per-doc
    queries by construction."""
    t = load_tables(spark, sf_dir)
    from land_registry_data_ingestion_spark.functions.text import fingerprint

    base = with_quality_score(t.documents).select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        "n_chars_measured",
        "quality_score",
        fingerprint(F.col("text")).alias("fp"),
    )
    agg = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.sum("n_chars_measured").cast("double").alias("total_chars"),
        F.count_distinct("source").cast("double").alias("n_sources"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        # try_divide, not `/`: COUNT(*) is 0 on an empty corpus, where
        # ANSI `/` raises DIVIDE_BY_ZERO while the DuckDB oracle's x/0
        # yields NULL — the declared contract is NULL rates on an empty
        # corpus (empty-tier adversarial gate, round 9)
        (
            F.lit(1.0)
            - F.try_divide(
                F.count_distinct("fp").cast("double"), F.count("*")
            )
        ).alias("exact_dup_doc_rate"),
        F.avg("quality_score").alias("mean_quality"),
        F.try_divide(
            F.sum(F.when(F.col("n_tokens") < 5, 1).otherwise(0)).cast(
                "double"
            ),
            F.count("*"),
        ).alias("short_doc_rate"),
    )
    metrics = [
        "n_docs",
        "total_tokens",
        "total_chars",
        "n_sources",
        "n_langs",
        "exact_dup_doc_rate",
        "mean_quality",
        "short_doc_rate",
    ]
    cells = ", ".join(f"'{name}', round({name}, 6)" for name in metrics)
    return agg.select(
        F.expr(f"stack({len(metrics)}, {cells}) AS (metric, value)")
    )
