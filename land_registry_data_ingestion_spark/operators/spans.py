"""Exact-substring duplicate-span detection (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

The reference engine has no substring-level dedup; this is the scale-out
k-gram approximation of its suffix-array construction: a token span of
length >= k is *duplicated* iff every k-gram it contains occurs at least
``min_count`` times corpus-wide. Detected start positions are merged into
maximal per-document intervals with a gaps-and-islands pass.

100 TB shape: work and shuffle are proportional to total token count —
one (doc_id, pos, gram-hash) stream, one hash aggregate over gram hashes
with map-side combine, one shuffle semi-join back (ids + 32-byte hashes
only; text never moves), then per-document windows whose partitions are
bounded by document length. There is NO pair fan-out anywhere: a
boilerplate gram shared by a million documents costs one aggregate row
and a semi-join probe, never a million² candidate pairs — which is why,
unlike MinHash-LSH banding, this needs no frequency cap to stay linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.functions.text import word_ngram_hashes
from land_registry_data_ingestion_spark.util import barrier, spread


def kgram_positions(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, gram_key) for every word k-gram occurrence.

    ``pos`` is the 0-based token index of the gram's first token in the
    normalized token stream; ``gram_key`` is the chained-xxhash64 gram
    hash (``word_ngram_hashes`` — one 8-byte combine per gram, no gram
    string is ever built; round 4 replaced the md5-of-joined-string key,
    which paid k-1 concats plus an md5 of ~k·word bytes per gram. Hash
    values never surface in results, so engine-replayability of the hash
    is not needed — only count/equality semantics, which match string
    equality modulo 64-bit collisions). The hash array is built once per
    doc behind a barrier — Generate would otherwise re-evaluate the
    slice-zip build per output row.
    """
    # Hash INSIDE the barriered projection: the materialized intermediate
    # is an array<bigint> (8 B/gram) instead of the gram strings
    # (~k·word B/gram) — the barrier write, not the downstream shuffle,
    # is this operator's largest I/O.
    grams = barrier(
        spread(df).select(
            F.col(id_col), word_ngram_hashes(F.col(text_col), k).alias("_gh")
        )
    )
    return grams.select(id_col, F.posexplode("_gh").alias("pos", "gram_key"))


def duplicated_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (id, span_start, span_end, span_tokens): inclusive 0-based
    token bounds of every maximal interval covered by k-grams occurring
    >= ``min_count`` times corpus-wide. Start positions p and p' merge
    while p' - p <= k (their [p, p+k) windows overlap or touch).
    """
    pos = kgram_positions(df, k=k, text_col=text_col, id_col=id_col)
    hits = _duplicated_hits(pos, min_count=min_count, id_col=id_col)
    return spans_from_hits(hits, id_col=id_col, k=k)


def _duplicated_hits(pos: DataFrame, min_count: int, id_col: str) -> DataFrame:
    """(id, pos) start positions of grams occurring >= min_count
    corpus-wide: one map-combined gram-count aggregate + an 8-byte-key
    semi-join back onto the position stream."""
    dup_keys = (
        pos.groupBy("gram_key")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("gram_key")
    )
    return pos.join(dup_keys, "gram_key", "left_semi").select(id_col, "pos")


def _span_arrays(hits: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated k-gram start positions into
    one array<struct<span_start, span_end>> per document.

    Round 11 (guide §2.4): ONE doc-keyed aggregate collects each
    document's sorted hit positions and the islands derive IN-ROW from
    the array — a sorted position opens an island iff its gap to the
    previous exceeds ``k`` and closes it iff the gap to the next does,
    the identical split rule the previous window ran (merge while
    ``pos - lag(pos) <= k``). That replaces the per-doc sort window +
    island aggregate (two passes over every hit row) with one
    collect_list aggregate, and hands consumers the per-doc interval
    array directly — the trim path previously re-shuffled the exploded
    span rows back into exactly this array.

    Round 12: the whole derivation lives INSIDE the aggregate's result
    expression (let-bound over the sorted array with a one-element
    ``transform``), so consumers only ever see the ``_spans``
    ATTRIBUTE. The previous shape computed it in a Project above the
    aggregate, which Catalyst inlined into every consumer expression:
    ``spans_from_hits``' explode re-ran the 3-pass island HOFs once in
    the inferred ``size > 0`` Filter and once more PER OUTPUT SPAN ROW
    (the Generate re-evaluation footgun), and the trim path ran them
    twice (``_cuts`` + ``_ncov``) — measured 23.7 s vs 2.4 s aggregate
    CPU for the identical islands at the bench scale tier."""

    def _spans_of(ps):
        n = F.size(ps)

        def _at(i):
            # 0-based F.get: neighbor probes at the ends yield NULL,
            # never an ANSI INVALID_ARRAY_INDEX (OR does not
            # short-circuit).
            return F.get(ps, i - 1)

        idx = F.sequence(F.lit(1), n)
        starts = F.filter(
            F.transform(
                idx,
                lambda i: F.when((i == 1) | (_at(i) - _at(i - 1) > k), _at(i)),
            ),
            lambda x: x.isNotNull(),
        )
        ends = F.filter(
            F.transform(
                idx,
                lambda i: F.when((i == n) | (_at(i + 1) - _at(i) > k), _at(i)),
            ),
            lambda x: x.isNotNull(),
        )
        return F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(
                s.alias("span_start"), (e + F.lit(k - 1)).alias("span_end")
            ),
        )

    spans = F.element_at(
        F.transform(
            F.array(F.array_sort(F.collect_list("pos"))), _spans_of
        ),
        1,
    )
    return hits.groupBy(id_col).agg(spans.alias("_spans"))


def spans_from_hits(hits: DataFrame, id_col: str, k: int) -> DataFrame:
    """Row-per-span view of :func:`_span_arrays` — identical rows to the
    old window form: maximal (span_start, span_end, span_tokens)
    intervals per document."""
    return (
        _span_arrays(hits, id_col, k)
        .select(id_col, F.explode("_spans").alias("_s"))
        .select(
            F.col(id_col),
            F.col("_s.span_start").alias("span_start"),
            F.col("_s.span_end").alias("span_end"),
            (F.col("_s.span_end") - F.col("_s.span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def trim_duplicated_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the dedup: cut every duplicated span out of the (normalized)
    token stream — Lee et al.'s "dedup by removing repeated substrings".

    Returns every input document as (id, clean_text, n_kept): surviving
    tokens re-joined in order; documents that are entirely duplicated
    text come back with ``clean_text = ''``.

    Shape: ONE shared barrier holds each document's token array AND its
    gram-hash array, produced by a single tokenize pass (the token array
    is let-bound into a struct so both fields derive from one
    evaluation) — the detection stream and the rebuild stream then read
    different fields of the same materialization instead of re-scanning
    and re-tokenizing the corpus. The rebuild (round 6) is IN-ROW: the
    merged spans aggregate to one small (start, end) interval list per
    document, join back to the token arrays, and each document's
    surviving text is an indexed ``filter`` over its own token array
    (token i survives iff no interval contains i — intervals per doc are
    few after the islands merge, so the membership test is a short
    in-row loop). Text therefore crosses exactly ONE shuffle (the
    interval join); the previous shape exploded every token into (pos,
    tok) rows, anti-joined on (id, pos), and re-assembled with a sorted
    ``collect_list`` — two full-text shuffles plus a per-token hash
    probe, which at the bench scale tier cost ~2× this form.
    """
    from land_registry_data_ingestion_spark.functions.text import (
        gram_hash_chain,
        normalize_text,
        tokens,
    )

    # NULL text normalizes/tokenizes to NULL; coalesce to an empty token
    # array so NULL-text documents come back as ('', 0) — matching the
    # DuckDB oracle, whose LEFT JOIN + coalesce yields ('', 0) for NULL.
    # (An empty STRING is one empty token, ('', 1): fully-trimmed
    # documents, not empty ones, are the shape NULL shares.)
    toks_expr = F.coalesce(
        tokens(normalize_text(F.col(text_col))),
        F.array().cast("array<string>"),
    )
    # Two nested 1-element transforms let-bind BOTH arrays: the outer
    # binds the token array, the inner binds the per-token hash array —
    # honoring gram_hash_chain's bound-value contract (its k slice
    # references would otherwise re-run the per-token hashing k+1 times
    # per row during barrier materialization).
    packed = F.element_at(
        F.transform(
            F.array(toks_expr),
            lambda t: F.element_at(
                F.transform(
                    F.array(F.transform(t, lambda x: F.xxhash64(x))),
                    lambda hs: F.struct(
                        t.alias("toks"),
                        gram_hash_chain(hs, k).alias("gh"),
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    base = barrier(spread(df).select(F.col(id_col), packed.alias("_p")))

    pos = base.select(
        id_col, F.posexplode("_p.gh").alias("pos", "gram_key")
    )
    hits = _duplicated_hits(pos, min_count=min_count, id_col=id_col)
    # _span_arrays hands the per-doc interval array directly (round 11):
    # the old path exploded the spans to rows and re-shuffled them back
    # into this exact array with a second doc-keyed collect_list.
    # Merged spans are disjoint (islands separated by a gap > k), so the
    # covered-token total is an in-row sum over the array.
    cuts = _span_arrays(hits, id_col=id_col, k=k).select(
        F.col(id_col),
        F.col("_spans").alias("_cuts"),
        F.aggregate(
            F.col("_spans"),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + (s["span_end"] - s["span_start"] + 1).cast("long"),
        ).alias("_ncov"),
    )
    joined = base.join(cuts, id_col, "left")
    toks = F.col("_p.toks")
    kept = F.when(F.col("_cuts").isNull(), toks).otherwise(
        F.filter(
            toks,
            lambda _tok, i: ~F.exists(
                F.col("_cuts"),
                lambda c: (i >= c["span_start"]) & (i <= c["span_end"]),
            ),
        )
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        (F.size(toks) - F.coalesce(F.col("_ncov"), F.lit(0)))
        .cast("long")
        .alias("n_kept"),
    )


def dup_span_stats(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-token totals — the trim/drop decision input
    (docs whose duplicated fraction exceeds a policy threshold get their
    spans cut or the whole doc dropped). One extra aggregate over
    ``duplicated_spans``; span count and covered-token sum per doc."""
    spans = duplicated_spans(
        df, k=k, min_count=min_count, text_col=text_col, id_col=id_col
    )
    return spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
        F.min("span_start").alias("first_dup_pos"),
    )
