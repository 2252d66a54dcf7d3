"""Planted-case tests for exact-substring duplicate-span detection
(operators/spans.py) — the declared query's DuckDB oracle covers the
bulk path; these pin the interval semantics."""

from __future__ import annotations

from pyspark.sql import Row

from land_registry_data_ingestion_spark.operators.spans import (
    dup_span_stats,
    duplicated_spans,
    trim_duplicated_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_substring_detected_both_docs(spark):
    shared = _words(10, "s")  # 10 shared tokens → 3 dup 8-grams each doc
    df = _docs(
        spark,
        [
            f"{_words(5, 'a')} {shared} {_words(5, 'b')}",
            f"{_words(7, 'c')} {shared} {_words(3, 'd')}",
        ],
    )
    out = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=8).collect()
    }
    # doc 0: shared tokens occupy positions 5..14; dup 8-grams start at
    # 5,6,7 → one merged span [5, 14]. doc 1: positions 7..16 → [7, 16].
    assert out == {(0, 5, 14, 10), (1, 7, 16, 10)}


def test_disjoint_spans_stay_separate(spark):
    a, b = _words(8, "x"), _words(8, "y")
    gap = _words(20, "g")  # > k unique tokens between the two repeats
    hap = _words(20, "h")
    df = _docs(spark, [f"{a} {gap} {b}", f"{a} {hap} {b}"])
    out = {
        (r.doc_id, r.span_start, r.span_end) for r in
        duplicated_spans(df, k=8).collect()
    }
    assert out == {(0, 0, 7), (0, 28, 35), (1, 0, 7), (1, 28, 35)}


def test_within_doc_repeat_counts(spark):
    rep = _words(8, "r")
    df = _docs(spark, [f"{rep} {_words(12, 'm')} {rep}"])
    out = {
        (r.span_start, r.span_end) for r in
        duplicated_spans(df, k=8).collect()
    }
    assert out == {(0, 7), (20, 27)}


def test_no_duplicates_no_rows(spark):
    df = _docs(spark, [_words(30, "p"), _words(30, "q"), "short text"])
    assert duplicated_spans(df, k=8).count() == 0


def test_stats_aggregates_spans(spark):
    a, b = _words(8, "x"), _words(9, "y")
    gap, hap = _words(20, "g"), _words(20, "h")
    df = _docs(spark, [f"{a} {gap} {b}", f"{a} {hap} {b}"])
    rows = {r.doc_id: r for r in dup_span_stats(df, k=8).collect()}
    assert rows[0].n_spans == 2
    assert rows[0].dup_tokens == 17
    assert rows[0].first_dup_pos == 0


def test_trim_cuts_only_covered_tokens(spark):
    shared = _words(10, "s")
    left0, right0 = _words(5, "a"), _words(5, "b")
    df = _docs(
        spark,
        [
            f"{left0} {shared} {right0}",
            f"{_words(7, 'c')} {shared} {_words(3, 'd')}",
        ],
    )
    rows = {r.doc_id: r for r in trim_duplicated_spans(df, k=8).collect()}
    assert rows[0].clean_text == f"{left0} {right0}"
    assert rows[0].n_kept == 10
    assert rows[1].n_kept == 10


def test_trim_fully_duplicated_doc_empty(spark):
    body = _words(12, "z")
    df = _docs(spark, [body, body, _words(30, "u")])
    rows = {r.doc_id: r for r in trim_duplicated_spans(df, k=8).collect()}
    assert rows[0].clean_text == "" and rows[0].n_kept == 0
    assert rows[1].clean_text == "" and rows[1].n_kept == 0
    assert rows[2].n_kept == 30


def test_trim_null_text_returns_empty_zero(spark):
    # NULL text must take the empty-document shape ('', 0), not
    # (NULL, -1) from size(NULL) — regression pin for the r7 coalesce.
    body = _words(12, "z")
    df = spark.createDataFrame(
        [Row(doc_id=0, text=body), Row(doc_id=1, text=body),
         Row(doc_id=2, text=None)],
        schema="doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in trim_duplicated_spans(df, k=8).collect()}
    assert rows[2].clean_text == "" and rows[2].n_kept == 0
    assert rows[0].n_kept == 0  # dup detection unaffected by the NULL row
