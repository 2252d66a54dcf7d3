"""Corpus-curation queries over ``documents`` (scale-out §8): benchmark
decontamination, cross-document segment dedup, stratified sampling,
sequence packing, TF-IDF keyword extraction, and BM25 search.

Oracle parity notes: both engines tokenize the same normalized text, rank
on ROUNDED scores (ties broken by term / id), and emit BIGINT counts, so
the driver's value hash compares bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.corpus import (
    bm25_search,
    decontaminate,
    pack_sequences,
    segment_dedup,
    segment_dedup_token_counts,
    stratified_sample,
    tfidf_top_terms,
)
from land_registry_data_ingestion_spark.plans.registry import query
from land_registry_data_ingestion_spark.sources.parquet import load_tables

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split_regex({_NORM}, '\\s+')"
# whitespace-normalized count — mirrors functions/text.py::token_count
_WSNORM = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
_NTOK_RAW = (
    f"CAST(CASE WHEN {_WSNORM} = '' THEN 0"
    f" ELSE len(string_split_regex({_WSNORM}, '\\s+')) END AS BIGINT)"
)

# Word-3-gram shingles (mirrors functions/text.py::word_shingles).
_SHINGLES = f"""
    SELECT doc_id,
           CASE WHEN len(w) >= 3
                THEN list_distinct(list_transform(
                    generate_series(1, len(w) - 2),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                ELSE []::VARCHAR[] END AS shingles
    FROM (SELECT doc_id, {_TOKS} AS w FROM documents)
"""

# Every 17th document stands in for the held-out eval benchmark.
_BENCH_PRED = "doc_id % 17 = 0"


@query(
    "text_decontaminate",
    sql=f"""
    WITH sh AS ({_SHINGLES}),
    bench AS (
        SELECT DISTINCT unnest(shingles) AS shingle
        FROM sh WHERE {_BENCH_PRED}
    ),
    hits AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_shingles
        FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh) d
        JOIN bench USING (shingle)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_bench_shingles, 0) AS n_bench_shingles,
           COALESCE(h.n_bench_shingles, 0) > 0 AS is_contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-document count of distinct word
    3-gram shingles shared with the benchmark subset (doc_id % 17 = 0).
    Benchmark shingle set broadcast; corpus never shuffles for the probe.
    The benchmark is a row-local subset of the corpus, so its shingles
    derive from the same single shingling pass (``benchmark_pred``)."""
    t = load_tables(spark, sf_dir)
    return decontaminate(
        t.documents, None, k=3, benchmark_pred=F.col("doc_id") % 17 == 0
    )


@query(
    "text_segment_dedup",
    sql=f"""
    WITH segs AS (
        SELECT doc_id,
               CASE WHEN norm = '' THEN []::VARCHAR[]
                    ELSE list_transform(
                        generate_series(1, CAST(ceil(len(w) / 10.0) AS INT)),
                        i -> array_to_string(w[(i-1)*10+1 : i*10], ' '))
               END AS segments
        FROM (SELECT doc_id, {_NORM} AS norm, {_TOKS} AS w FROM documents)
    ),
    seg_rows AS (
        SELECT doc_id,
               unnest(generate_series(1, len(segments))) - 1 AS pos,
               unnest(segments) AS seg
        FROM segs
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY seg ORDER BY doc_id, pos
        ) AS rn
        FROM seg_rows
    )
    SELECT doc_id,
           COALESCE(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
                    '') AS clean_text,
           CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT)
               AS n_dropped_segments
    FROM ranked GROUP BY doc_id
    """,
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document segment dedup: every repeated 10-word
    segment survives only at its smallest (doc, position); documents are
    rebuilt from their surviving segments."""
    t = load_tables(spark, sf_dir)
    return segment_dedup(t.documents, seg_len=10)


_SAMPLE_BUCKET = (
    "('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    " % 1000"
)


@query(
    "text_stratified_sample",
    sql=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_SAMPLE_BUCKET} < CASE lang
        WHEN 'en' THEN 300 WHEN 'zh' THEN 800 ELSE 600 END
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for data mixing: downsample
    over-represented strata (en → 30%) and keep more of the rare ones
    (zh → 80%, default 60%) — decisions are a pure hash of the doc id, so
    replays and other engines select identical rows. Pure map, no
    shuffle."""
    t = load_tables(spark, sf_dir)
    sampled = stratified_sample(
        t.documents, {"en": 300, "zh": 800}, default_per_mille=600
    )
    return sampled.select("doc_id", "lang", "source")


@query(
    "text_pack_sequences",
    sql=f"""
    SELECT source, doc_id, n_tokens,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
    FROM (
        SELECT source, doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM (SELECT source, doc_id, {_NTOK_RAW} AS n_tokens FROM documents)
    )
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-then-chunk): per source shard, documents
    are laid end-to-end in doc_id order and cut every 512 tokens; each doc
    reports its training-sequence id and offset. One window per shard —
    embarrassingly parallel, text column never shuffles."""
    t = load_tables(spark, sf_dir)
    return pack_sequences(t.documents, budget=512)


@query(
    "text_tfidf_topterms",
    sql=f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               ROUND(tf.tf * ln(n.n_docs / df_t), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (keyword extraction). Per-term
    document frequencies and the corpus size are broadcast; the only big
    shuffles are the (doc, term) count and the per-doc ranking window."""
    t = load_tables(spark, sf_dir)
    return tfidf_top_terms(t.documents, top_k=3)


_BM25_TERMS = ["merge", "spark", "window"]


@query(
    "text_bm25_search",
    sql=f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        WHERE term IN ('merge', 'spark', 'window')
        GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               AVG({_NTOK_RAW}) AS avgdl
        FROM documents
    ),
    dl AS (SELECT doc_id, {_NTOK_RAW} AS dl FROM documents),
    scored AS (
        SELECT tf.doc_id,
               ROUND(SUM(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        JOIN dl ON tf.doc_id = dl.doc_id
        GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25, CAST(ROW_NUMBER() OVER (
        ORDER BY bm25 DESC, doc_id
    ) AS BIGINT) AS rank
    FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query bag {merge, spark, window} (k1=1.2,
    b=0.75, +1-smoothed idf). Non-query terms are dropped before any
    shuffle; corpus stats broadcast; top-n via per-partition heaps."""
    t = load_tables(spark, sf_dir)
    return bm25_search(t.documents, _BM25_TERMS, top_n=20)


@query(
    "text_pipeline_pack",
    sql=f"""
    WITH segs AS (
        SELECT doc_id,
               CASE WHEN norm = '' THEN []::VARCHAR[]
                    ELSE list_transform(
                        generate_series(1, CAST(ceil(len(w) / 10.0) AS INT)),
                        i -> array_to_string(w[(i-1)*10+1 : i*10], ' '))
               END AS segments
        FROM (SELECT doc_id, {_NORM} AS norm, {_TOKS} AS w FROM documents)
    ),
    seg_rows AS (
        SELECT doc_id,
               unnest(generate_series(1, len(segments))) - 1 AS pos,
               unnest(segments) AS seg
        FROM segs
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY seg ORDER BY doc_id, pos
        ) AS rn
        FROM seg_rows
    ),
    clean AS (
        SELECT doc_id,
               COALESCE(string_agg(seg, ' ' ORDER BY pos)
                        FILTER (WHERE rn = 1), '') AS clean_text
        FROM ranked GROUP BY doc_id
    ),
    kept AS (
        SELECT d.source, c.doc_id,
               CAST(CASE WHEN c.clean_text = '' THEN 0
                    ELSE len(string_split_regex(c.clean_text, '\\s+'))
               END AS BIGINT) AS n_tokens
        FROM clean c JOIN documents d ON c.doc_id = d.doc_id
        WHERE CASE WHEN c.clean_text = '' THEN 0
                   ELSE len(string_split_regex(c.clean_text, '\\s+')) END >= 20
          AND ('0x' || substr(md5('sample|' || CAST(c.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000 < CASE d.lang
              WHEN 'en' THEN 300 WHEN 'zh' THEN 800 ELSE 600 END
    )
    SELECT source, doc_id, n_tokens,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
    FROM (
        SELECT source, doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM kept
    )
    """,
)
def text_pipeline_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline, end to end in ONE declarative plan:
    cross-document segment dedup → minimum-length filter on the CLEANED
    text → deterministic stratified sampling → sequence packing per source
    shard.

    This is the flagship shape of the engine: four corpus passes fuse into
    a single DAG Catalyst optimizes as one query. The composition's
    downstream stages consume only LENGTHS (the ≥20 filter, the packing
    budget), so it rides the fused ``segment_dedup_token_counts`` path:
    the corpus is tokenized exactly ONCE, per-segment token counts are
    arithmetic off that tokenization, and the cleaned text string is never
    rebuilt — where the naive composition reassembled ``clean_text`` and
    re-tokenized it in both the filter and the packer (round 5; the
    round-4 span-family shared-barrier fix is the template). Text leaves
    the plan after the one segment-dedup window; everything later moves
    ids + counts. The stages are the same operators declared individually
    (``text_segment_dedup``, ``text_stratified_sample``,
    ``text_pack_sequences``), so their per-stage oracles triangulate this
    composition — and the oracle SQL still states the straightforward
    rebuild-then-retokenize semantics, pinning the fused plan to the
    unfused definition."""
    t = load_tables(spark, sf_dir)
    counts = segment_dedup_token_counts(t.documents, seg_len=10)
    joined = counts.join(
        t.documents.select("doc_id", "lang", "source"), "doc_id"
    )
    kept = joined.filter(F.col("n_tokens") >= 20)
    sampled = stratified_sample(
        kept, {"en": 300, "zh": 800}, default_per_mille=600
    )
    return pack_sequences(
        sampled, budget=512, part_col="source", n_col="n_tokens"
    )


@query(
    "text_lm_perplexity",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    counts AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(DISTINCT term) AS BIGINT) AS v
        FROM tok
    )
    SELECT doc_id,
           ROUND(AVG(-ln((c + 1.0) / (n_total + v))), 6) AS lm_nll,
           CAST(COUNT(*) AS BIGINT) AS n_scored_tokens
    FROM tok JOIN counts USING (term) CROSS JOIN stats
    GROUP BY doc_id
    """,
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (CCNet-style): corpus-trained add-1
    smoothed LM, per-document mean token negative log-likelihood. One
    tokenize pass feeds both the broadcast LM table and the per-doc
    mean."""
    from land_registry_data_ingestion_spark.operators.corpus import (
        lm_perplexity_score,
    )

    t = load_tables(spark, sf_dir)
    return lm_perplexity_score(t.documents)


@query(
    "text_dsir_weights",
    sql=f"""
    WITH tok AS (
        SELECT doc_id,
               ('0x' || substr(md5(term), 1, 8))::BIGINT % 256 AS bucket,
               COALESCE(lang = 'en', FALSE) AS is_target
        FROM (SELECT doc_id, lang, unnest({_TOKS}) AS term FROM documents
              WHERE {_NORM} != '')
    ),
    hist AS (
        SELECT bucket,
               SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t,
               SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS c_r
        FROM tok GROUP BY bucket
    ),
    totals AS (SELECT SUM(c_t) AS n_t, SUM(c_r) AS n_r FROM hist),
    ratio AS (
        SELECT bucket,
               ln((c_t + 1.0) / (n_t + 256)) - ln((c_r + 1.0) / (n_r + 256))
                   AS log_ratio
        FROM hist CROSS JOIN totals
    )
    SELECT doc_id,
           ROUND(SUM(log_ratio), 6) AS log_weight,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           BOOL_OR(is_target) AS is_target
    FROM tok JOIN ratio USING (bucket)
    GROUP BY doc_id
    """,
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights for tilting the raw corpus toward the
    English-language target slice: hashed-unigram (256-bucket) target/raw
    distributions, add-1 smoothed, per-doc summed log ratio. The bucket
    histogram is ≤2·256 rows broadcast back over one barriered
    (doc, bucket) explode — nothing corpus-sized moves twice."""
    from land_registry_data_ingestion_spark.operators.corpus import (
        dsir_importance_weights,
    )

    t = load_tables(spark, sf_dir)
    return dsir_importance_weights(
        t.documents, target_filter=F.col("lang") == "en"
    )


@query(
    "text_token_budget_sample",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, source,
               md5('budget|' || CAST(doc_id AS VARCHAR)) AS k,
               {_NTOK_RAW} AS n_tokens
        FROM documents
    ),
    b AS (
        SELECT source, CAST(floor(sum(n_tokens) / 2) AS BIGINT) AS budget
        FROM tok GROUP BY source
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY k
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_tokens
        FROM tok
    )
    SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens
    FROM c JOIN b USING (source)
    WHERE c.cum_tokens <= b.budget
    """,
)
def text_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: every source keeps a deterministic
    hash-ordered prefix of its documents worth at most half its token
    mass — the shape of a data-mixture rebalance (down-sample dominant
    sources to a token target, stable under corpus growth because the
    order key is a per-doc hash, not arrival order).

    The running total is NOT the single-task-per-group window DuckDB runs:
    it is the two-pass chunked prefix sum (``grouped_running_sum``) —
    per-(source, chunk) local cumsums in parallel, a tiny per-source
    offset table broadcast back — bit-equal on integer token counts, and
    the per-group scan stays parallel even when one source dominates a
    100 TB corpus."""
    from land_registry_data_ingestion_spark.functions.text import token_count
    from land_registry_data_ingestion_spark.operators.prefixsum import (
        grouped_running_sum,
        hex_prefix_chunks,
    )
    from land_registry_data_ingestion_spark.util import barrier, spread

    t = load_tables(spark, sf_dir)
    # barrier: three consumers read this frame (the per-source budget
    # aggregate, and grouped_running_sum's local-cumsum and chunk-offset
    # passes) — unbarriered, each re-scans the corpus and re-runs the
    # tokenizer + md5, i.e. THREE full tokenize passes for one query
    # (round 11; guide §1.2 "don't compute things you throw away"). The
    # materialized frame is (id, source, 32-hex key, count) — a few
    # dozen bytes per document, thousands of times smaller than the
    # text it replaces.
    tok = barrier(
        spread(t.documents).select(
            "doc_id",
            "source",
            F.md5(
                F.concat(F.lit("budget|"), F.col("doc_id").cast("string"))
            ).alias("k"),
            token_count(F.col("text")).alias("n_tokens"),
        )
    )
    budgets = tok.groupBy("source").agg(
        F.floor(F.sum("n_tokens") / 2).cast("long").alias("budget")
    )
    cum = grouped_running_sum(
        tok,
        group_cols=["source"],
        order_col="k",
        value_col="n_tokens",
        chunk_expr=hex_prefix_chunks(F.col("k"), 64),
        out_col="cum_tokens",
    )
    return (
        cum.join(F.broadcast(budgets), "source")
        .where(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )
