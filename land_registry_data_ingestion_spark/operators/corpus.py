"""Corpus-level curation operators for a training-data pipeline.

Beyond per-document scoring (textops.py) and near-dup mining (dedup.py),
a pretraining pipeline needs corpus-wide passes: benchmark
decontamination, cross-document segment dedup (the C4 "remove repeated
three-sentence spans" rule), deterministic stratified sampling for data
mixing, and sequence packing (concat-then-chunk) that turns documents
into fixed-budget training sequences.

Every operator here is expressed as declarative DataFrame ops — the 100 TB
shapes are one-or-two-shuffle plans with the text column pruned as early
as possible, and the small side (benchmark shingle set, per-term document
frequencies) broadcast so the corpus itself never moves for a lookup.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from land_registry_data_ingestion_spark.functions.text import (
    normalize_text,
    token_count,
    tokens,
    word_shingles,
)
from land_registry_data_ingestion_spark.util import barrier, spread


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    benchmark_pred: Column | None = None,
) -> DataFrame:
    """Benchmark decontamination: count, per corpus document, the distinct
    word ``k``-gram shingles it shares with the benchmark set.

    The shape that survives 100 TB: the benchmark side (eval suites are
    MB-scale) collapses to a DISTINCT shingle set and is **broadcast**, so
    the corpus text is shingled in place — map-side hash-join, no shuffle
    of the corpus — and the only shuffle is the per-document hit count
    (map-side combinable, two longs per row). Membership is tested on
    8-byte shingle HASHES (``word_shingle_hashes``, same function both
    sides), so the materialized corpus intermediate and the broadcast
    table carry longs, not gram text — ~10× smaller at k=3 and flat in k,
    where real pipelines run k=8..13. k is a parameter; the test corpus
    is tiny word-soup so the declared query uses k=3 for signal.

    Round 11 (guide §2.4): when the benchmark is a row-local subset of
    ``df`` (``benchmark_pred`` — a predicate over ``id_col``; pass
    ``benchmark=None`` then), its shingle set derives from the SAME
    barriered corpus shingling instead of a second tokenize pass +
    barrier; and the per-document count aggregates over an
    ``explode_outer`` of the corpus stream with a broadcast-left hit
    indicator, so every document (zero-shingle ones included) surfaces
    from ONE aggregate — the old shape counted only matching docs and
    paid a second corpus-keyed join to re-attach the zeros. Output is
    one row per distinct ``id_col`` (ids are unique by the operator's
    key contract). That grouping extends to NULL: all NULL-id rows
    collapse into ONE output row whose count covers their combined
    shingles (standard GROUP BY NULL semantics, and what the oracle SQL
    computes — the adversarial allnull tier pins it); pre-r11 the
    join-back shape emitted n=0 per NULL row instead. Inputs violating
    the unique-non-NULL key contract get GROUP BY semantics, not the
    old per-row echo.
    """
    from land_registry_data_ingestion_spark.functions.text import (
        word_shingle_hashes,
    )

    # barrier() before every explode of a HOF-built array: Generate
    # re-evaluates an inlined child expression per OUTPUT row (~#shingles
    # × the tokenizer) — measured 23 s vs 5 s at the 100k-doc probe.
    # spread() keeps the CPU-bound shingling off a single input split.
    doc_sh = barrier(
        spread(df).select(
            F.col(id_col),
            word_shingle_hashes(F.col(text_col), k).alias("shingles"),
        )
    )
    if benchmark_pred is not None:
        bench_base = doc_sh.filter(benchmark_pred).select("shingles")
    else:
        bench_base = barrier(
            spread(benchmark).select(
                word_shingle_hashes(F.col(text_col), k).alias("shingles")
            ),
            small=True,  # benchmark-scale by contract
        )
    bench_sh = (
        bench_base.select(F.explode("shingles").alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1).cast("long"))
    )
    marked = doc_sh.select(
        id_col, F.explode_outer("shingles").alias("shingle")
    ).join(F.broadcast(bench_sh), "shingle", "left")
    n = F.col("n_bench_shingles")
    return (
        marked.groupBy(id_col)
        .agg(
            F.coalesce(F.sum("_hit"), F.lit(0).cast("long")).alias(
                "n_bench_shingles"
            )
        )
        .select(F.col(id_col), n, (n > 0).alias("is_contaminated"))
    )


def _segments(text: Column, seg_len: int) -> Column:
    """Fixed-length word segments of the normalized text (the last one may
    be short). Built from slices of ONE tokenization — no per-segment
    re-split."""
    toks = tokens(normalize_text(text))
    n = F.size(toks)
    n_seg = F.ceil(n / F.lit(float(seg_len))).cast("int")
    return F.when(
        normalize_text(text) == "", F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_seg),
            lambda i: F.array_join(
                F.slice(toks, (i - 1) * seg_len + 1, seg_len), " "
            ),
        )
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_len: int = 10,
) -> DataFrame:
    """Cross-document segment dedup (C4-style): of every repeated
    ``seg_len``-word segment, keep exactly ONE occurrence corpus-wide —
    the one in the smallest (doc, position) — and rebuild each document
    from its surviving segments.

    Segment TEXT never crosses a shuffle (round 11, guide §8 "shuffle
    keys and metadata instead of payloads"): the canonical-occurrence
    window runs over the 8-byte ``xxhash64`` of each segment — the same
    equality-modulo-64-bit-collisions contract every gram-hash consumer
    (spans, decontaminate) already rides, and hash values never surface
    in results — so shuffle (1) carries (id, pos, hash) ints instead of
    (id, pos, string). The rebuild then reads the ORIGINAL barriered
    segment arrays: only the DROPPED (id, pos) decisions aggregate and
    join back (shuffle (2) ∝ duplicated occurrences, not all segments),
    and each document's clean text is an in-row positional filter +
    join over its own array. The previous shape shuffled every segment
    string through the window AND re-shuffled the keepers through a
    ``collect_list`` reassembly. A globally hot segment (boilerplate)
    still makes one heavy window partition; its size is bounded by the
    number of documents containing it, and AQE skew-split handles the
    straggler — the row_number needs a total order per segment so it
    cannot be salted without a second pass.
    """
    base = barrier(
        spread(df).select(
            F.col(id_col), _segments(F.col(text_col), seg_len).alias("segments")
        )
    )
    seg_rows = base.select(
        id_col, F.posexplode("segments").alias("pos", "seg")
    ).select(id_col, "pos", F.xxhash64("seg").alias("_h"))
    w = Window.partitionBy("_h").orderBy(id_col, "pos")
    dropped = (
        seg_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select(id_col, "pos")
    )
    cuts = dropped.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("_drop"),
        F.count(F.lit(1)).alias("_nd"),
    )
    # Inner-explode parity: documents with zero segments (empty or NULL
    # text) never entered the window and never surfaced — keep them out.
    joined = base.filter(F.size("segments") > 0).join(cuts, id_col, "left")
    segs = F.col("segments")
    kept = F.when(F.col("_drop").isNull(), segs).otherwise(
        F.filter(
            segs, lambda _s, i: ~F.array_contains(F.col("_drop"), i)
        )
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.coalesce(F.col("_nd"), F.lit(0).cast("long")).alias(
            "n_dropped_segments"
        ),
    )


def _segments_with_counts(text: Column, seg_len: int) -> Column:
    """``array<struct<seg,nt>>``: each fixed-length word segment PLUS its
    token count, derived arithmetically from ONE tokenization (segment i
    of n tokens holds ``least(seg_len, n-(i-1)*seg_len)`` tokens). The
    token array is let-bound (1-element ``transform``) so the per-segment
    slice references read one bound value — the fused-pipeline
    counterpart of :func:`_segments`, for consumers that need surviving
    TOKEN COUNTS without ever rebuilding a cleaned string."""
    norm = normalize_text(text)
    out_t = "array<struct<seg:string,nt:int>>"
    build = F.element_at(
        F.transform(
            F.array(tokens(norm)),
            lambda toks: F.transform(
                F.sequence(
                    F.lit(1),
                    F.ceil(F.size(toks) / F.lit(float(seg_len))).cast("int"),
                ),
                lambda i: F.struct(
                    F.array_join(
                        F.slice(toks, (i - 1) * seg_len + 1, seg_len), " "
                    ).alias("seg"),
                    F.least(
                        F.lit(seg_len), F.size(toks) - (i - 1) * seg_len
                    ).cast("int").alias("nt"),
                ),
            ),
        ),
        1,
    )
    return F.when(norm == "", F.array().cast(out_t)).otherwise(build)


def segment_dedup_token_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_len: int = 10,
) -> DataFrame:
    """Surviving-token counts of :func:`segment_dedup`, WITHOUT building
    ``clean_text``: (id, n_tokens) where ``n_tokens`` equals
    ``token_count(segment_dedup(df).clean_text)`` exactly (segments are
    whitespace-joined tokens, so the cleaned text's token count is the
    sum of kept segments' counts).

    This is the fused path for compositions whose downstream stages need
    only LENGTHS (min-length filters, packing budgets): the corpus is
    tokenized once and no stage ever re-tokenizes — where the
    string-building composition pays the segment reassembly plus one full
    re-tokenize per downstream length consumer.

    Round 11 (guide §2.3, the :func:`segment_dedup` key discipline):
    segment text never crosses a shuffle — the canonical-occurrence
    window rides the 8-byte ``xxhash64`` of the segment (the same
    equality-modulo-64-bit-collisions contract every gram-hash consumer
    rides), so the window shuffle carries (id, pos, hash, nt) ints,
    ~2.5× narrower than the (id, pos, seg-string, nt) rows the previous
    shape moved. The doc-keyed count then aggregates the ranked rows
    directly (map-side combined) — a dropped-positions-only join-back
    variant measured SLOWER at both bench tiers (the join outweighed the
    smaller aggregate input), so this keeps the aggregate-everything
    shape."""
    seg_rows = (
        barrier(
            spread(df).select(
                F.col(id_col),
                _segments_with_counts(F.col(text_col), seg_len).alias("_segs"),
            )
        )
        .select(id_col, F.posexplode("_segs").alias("pos", "_s"))
        .select(
            id_col,
            "pos",
            F.xxhash64("_s.seg").alias("_h"),
            F.col("_s.nt").alias("nt"),
        )
    )
    w = Window.partitionBy("_h").orderBy(id_col, "pos")
    ranked = seg_rows.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy(id_col).agg(
        F.sum(F.when(F.col("rn") == 1, F.col("nt")).otherwise(0))
        .cast("long")
        .alias("n_tokens")
    )


def stratified_sample(
    df: DataFrame,
    rates_per_mille: dict[str, int],
    default_per_mille: int,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic stratified sampling for data mixing: keep a row iff
    ``md5_hash(salt|id) % 1000 < rate[stratum]``.

    Unlike ``df.sample``/``rand()`` the decision is a pure function of the
    row id — re-runs, retries and multi-engine replays (the DuckDB oracle)
    select the SAME rows, and changing one stratum's rate does not
    reshuffle another's sample. Pure map stage: no shuffle, no state.
    """
    from land_registry_data_ingestion_spark.operators.dedup import _md5_hash64

    rate = None
    for stratum, r in sorted(rates_per_mille.items()):
        cond = F.col(strat_col) == stratum
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = (
        rate.otherwise(default_per_mille)
        if rate is not None
        else F.lit(default_per_mille)
    )
    bucket = _md5_hash64(F.col(id_col).cast("string"), salt) % 1000
    return df.filter(bucket < rate)


def pack_sequences(
    df: DataFrame,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_col: str | None = None,
) -> DataFrame:
    """Sequence packing, concat-then-chunk (GPT-style): within each shard
    (``part_col``), documents are laid end-to-end in ``order_col`` order
    and the token stream is cut every ``budget`` tokens; each document
    reports the training sequence its first token lands in and the offset
    within it.

    One window per shard — embarrassingly parallel across shards, which is
    exactly how packing runs at scale (a global order would serialize the
    corpus through one task). The running sum shuffles only
    (shard, order, n_tokens) — the text never moves.

    ``n_col``: a precomputed token-count column to use instead of
    tokenizing ``text_col`` — the fused-pipeline path (an upstream stage
    already knows each document's length; re-deriving it from text is a
    wasted corpus pass).
    """
    n = F.col(n_col).cast("long") if n_col else token_count(F.col(text_col))
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_n = df.select(F.col(part_col), F.col(id_col), n.alias("n_tokens"))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return with_n.select(
        part_col,
        id_col,
        "n_tokens",
        F.floor(start / budget).alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-``top_k`` TF-IDF terms per document (keyword extraction).

    tf = term count in the document; idf = ln(N / df_term) over the
    corpus. Shuffle ledger: one explode→agg keyed (doc, term); the per-term
    document frequencies and the corpus size are tiny aggregates
    **broadcast** back (the corpus-term frame never re-shuffles for the
    lookup); one window keyed on the document ranks its own terms.
    Ordering ties break on the rounded score then the term, so the top-k
    set is deterministic across engines.
    """
    # tf is consumed twice (scores + document frequencies) — barrier it so
    # the explode/aggregate pass runs once; spread() parallelizes the
    # tokenizer over single-split inputs.
    tf = barrier(
        spread(df)
        .select(
            F.col(id_col),
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def bm25_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """BM25 ranking of the corpus against a bag of query terms.

    Okapi BM25 with the +1 idf smoothing:
    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)``,
    ``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Round-11 shape — ONE corpus pass, zero corpus shuffles: per-document
    term frequencies for the (small, fixed) query bag and the document
    length are computed IN-ROW from a single let-bound tokenization (a
    1-element ``transform`` binds the token array, so the tokenizer runs
    once per row however many terms reference it), materialized behind a
    barrier as (id, dl, tf_0..tf_k) longs. The corpus-wide statistics
    (N, avgdl, per-term document frequencies) are then ONE tiny aggregate
    over that frame, broadcast back by closure into an in-row score — so
    the whole query is: map pass → k+2-long barrier → 1-row aggregate →
    in-row score → TakeOrderedAndProject. The previous shape tokenized
    the corpus THREE times (explode pass, avgdl pass, dl pass) and paid
    a (doc, term) shuffle plus three joins. Value parity: tf/df/dl/N are
    integer-exact ports (per-term count of normalized whitespace tokens,
    with repeats; blank text counts 0 tokens like ``token_count``), and
    the per-document score sums the same per-term contributions — in
    sorted-term order, one of the orders the old hash aggregate could
    use — before the same ROUND(..., 6).
    """
    ts = sorted(terms)
    packed = F.element_at(
        F.transform(
            F.array(tokens(normalize_text(F.col(text_col)))),
            lambda tk: F.struct(
                # token_count semantics: '' splits to [''] — blank text
                # is 0 tokens; NULL text stays NULL through the guard
                F.when(
                    (F.size(tk) == 1) & (F.element_at(tk, 1) == F.lit("")),
                    F.lit(0),
                )
                .otherwise(F.size(tk))
                .cast("long")
                .alias("dl"),
                *[
                    F.size(F.filter(tk, lambda x: x == F.lit(w)))
                    .cast("long")
                    .alias(f"tf{i}")
                    for i, w in enumerate(ts)
                ],
            ),
        ),
        1,
    )
    base = barrier(
        spread(df)
        .select(F.col(id_col), packed.alias("_p"))
        .select(F.col(id_col), "_p.*")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(ts))
        ],
    )
    contribs = []
    for i in range(len(ts)):
        df_t = F.col(f"df{i}")
        idf = F.log(
            (F.col("n_docs") - df_t + 0.5) / (df_t + 0.5) + 1.0
        )
        tf_c = F.col(f"tf{i}")
        contribs.append(
            F.when(
                tf_c > 0,
                idf
                * (tf_c * (k1 + 1.0))
                / (tf_c + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
            ).otherwise(F.lit(0.0))
        )
    any_hit = None
    for i in range(len(ts)):
        c = F.col(f"tf{i}") > 0
        any_hit = c if any_hit is None else (any_hit | c)
    score = reduce(lambda a, c: a + c, contribs)
    scored = (
        base.filter(any_hit)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.round(score, 6).alias("bm25"))
    )
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        scored.orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def lm_perplexity_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score: train a unigram LM on
    the corpus itself (add-1 smoothed), score each document by its mean
    token negative log-likelihood — gibberish and boilerplate-stuffed
    documents sit in the tail of the score distribution.

    ``nll = mean_t( -ln (c_t + 1) / (N + V) )`` over the document's
    tokens, where ``c_t`` is the corpus count of token ``t``, ``N`` total
    tokens, ``V`` vocabulary size.

    Shuffle ledger: an explode → (doc, term) stream feeds BOTH the LM
    counts (term-keyed agg, broadcast back — the per-term table is
    vocabulary-sized, thousands of times smaller than the corpus) and the
    per-doc mean (doc-keyed agg with map-side combine). The stream is
    deliberately NOT barriered (round 12): materializing one row per
    TOKEN costs more than tokenizing the corpus twice — interleaved A/B
    at both bench tiers read 1.02 → 0.63 s (headline) and 1.50 → 0.98 s
    (scale) for the recompute form, the same barrier-vs-recompute
    trade-off the MinHash core measured in round 11. A real deployment
    would train the LM on a reference corpus (wikipedia) and broadcast
    it the same way — the plan is identical, only the counts frame's
    source changes.
    """
    tok = spread(df).select(
        F.col(id_col),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    # counts is consumed twice (the broadcast LM table and the corpus
    # stats) — barrier it (vocabulary-sized, hence small=True) so the
    # term aggregate runs once. stats then derives from counts instead
    # of a third pass over the exploded token barrier (round 11):
    # n_total = Σ c (exact long arithmetic — the same count the direct
    # agg computed) and v = the row count of counts = count_distinct
    # (term), so both values are provably identical while the fat
    # (doc, term) materialization is read twice instead of three times.
    counts = barrier(
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("c")), small=True
    )
    stats = counts.agg(
        F.sum("c").alias("n_total"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = (
        tok.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "nll",
            -F.log((F.col("c") + 1.0) / (F.col("n_total") + F.col("v"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("nll"), 6).alias("lm_nll"),
        F.count(F.lit(1)).cast("long").alias("n_scored_tokens"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack et al.):
    ``score(d) = Σ_lists 1/(k + rank_list(d))``, absent-from-a-list
    contributing 0. The standard way to combine a lexical (BM25) and a
    semantic (embedding ANN) ranking without score calibration — ranks
    are comparable, raw scores are not.

    Scale shape: both inputs are top-n lists (already reduced by their
    producers), so the fusion is a full-outer join of two ~top_n-row
    frames plus one TakeOrderedAndProject — driver-scale work regardless
    of corpus size; the heavy lifting stays in the producers."""
    a = ranked_a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    fused = (
        a.join(b, id_col, "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_a")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_b")), F.lit(0.0)),
                6,
            ),
        )
        .select(id_col, "rank_a", "rank_b", "rrf")
    )
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        fused.orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(top_n)
        .withColumn("fused_rank", F.row_number().over(w).cast("long"))
    )


def dsir_importance_weights(
    df: DataFrame,
    target_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    documents are featurized as hashed token counts, a target and a raw
    unigram bucket distribution are estimated (add-1 smoothed), and each
    document scores ``log w(d) = Σ_t ln p_target(b(t)) − ln p_raw(b(t))``
    — sampling ∝ exp(log_weight) tilts the raw corpus toward the target
    domain. Bucket hash is md5-derived so any engine replays it.

    Shuffle ledger at 100 TB (round 11, guide §2.3/§2.4): ONE doc-level
    barrier holds (id, is_target, bucket array) — ``is_target`` is an
    expression over the same row, so the former token-stream ⋈ doc-table
    join (a broadcast here, a real shuffle at corpus scale) does not
    exist, and the materialization carries one row per DOCUMENT instead
    of one per token. The histogram pass explodes the array into the
    map-side-combined bucket×class aggregate — AT MOST ``2·n_buckets``
    rows cross — and the per-document score is computed IN-ROW against
    the broadcast (bucket → log-ratio) map, so the old doc-keyed
    score exchange is gone entirely: the corpus crosses zero shuffles.
    Nothing corpus-sized is ever broadcast or collected.

    Contract edges: documents whose text normalizes to '' (NULL, empty,
    whitespace-only) have NO tokens and therefore no weight — they are
    excluded, not scored off a phantom empty-string token. A document the
    target filter cannot classify (NULL, e.g. missing language tag) counts
    as RAW — the filter DEFINES the target slice; everything else is the
    raw distribution being tilted."""
    bucket_of = lambda term: (  # noqa: E731 — md5 bucket, engine-neutral
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    base = barrier(
        spread(df)
        .filter(normalize_text(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.coalesce(target_filter.cast("boolean"), F.lit(False)).alias(
                "is_target"
            ),
            F.transform(
                tokens(normalize_text(F.col(text_col))), bucket_of
            ).alias("_b"),
        )
    )
    hist = (
        base.select("is_target", F.explode("_b").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.col("is_target").cast("long")).alias("c_t"),
            F.sum((~F.col("is_target")).cast("long")).alias("c_r"),
        )
    )
    totals = hist.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    ratio = (
        hist.crossJoin(F.broadcast(totals))
        .withColumn(
            "log_ratio",
            F.log((F.col("c_t") + 1.0) / (F.col("n_t") + F.lit(n_buckets)))
            - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + F.lit(n_buckets))),
        )
        .select("bucket", "log_ratio")
    )
    # One-row (bucket → log_ratio) map: every bucket a document can
    # reference contributed counts to ``hist``, so the in-row lookup
    # never misses. Bounded by construction at n_buckets entries — the
    # same broadcast class as the old per-bucket ratio join, minus the
    # join and the groupBy(id) exchange that followed it.
    ratio_map = F.broadcast(
        ratio.groupBy().agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "log_ratio"))
            ).alias("_m")
        )
    )
    return base.crossJoin(ratio_map).select(
        F.col(id_col),
        F.round(
            F.aggregate(
                F.col("_b"),
                F.lit(0.0),
                lambda acc, b: acc + F.element_at(F.col("_m"), b),
            ),
            6,
        ).alias("log_weight"),
        F.size("_b").cast("long").alias("n_tokens"),
        F.col("is_target"),
    )
