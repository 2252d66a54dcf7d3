"""Unit tests for the Gopher repetition rules (operators/textops.py)."""

from __future__ import annotations

from land_registry_data_ingestion_spark.operators.textops import (
    repetition_flags,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_flags_planted_babble(spark):
    docs = _frame(
        spark,
        [
            # 10 tokens, "spam spam" bigram dominates: 9 bigrams, all
            # "spam spam" → top_bigram_frac 1.0, dup_trigram_frac 1.0
            (1, "spam " * 10),
            # all-distinct tokens → no repeated grams
            (2, "a b c d e f g h"),
            # shorter than 2 tokens → 0.0 via the left join
            (3, "one"),
            (4, ""),
        ],
    )
    got = {r.doc_id: r for r in repetition_flags(docs).collect()}
    assert got[1].top_bigram_frac == 1.0 and got[1].dup_trigram_frac == 1.0
    assert not got[1].pass_repetition
    assert got[2].top_bigram_frac == round(1 / 7, 6)  # each bigram once
    assert got[2].dup_trigram_frac == 0.0 and got[2].pass_repetition
    assert got[3].top_bigram_frac == 0.0 and got[3].pass_repetition
    assert got[4].top_bigram_frac == 0.0 and got[4].pass_repetition


def test_repetition_flags_partial_repeat(spark):
    # "x y" appears twice among 5 bigrams → top 2/5; trigram "x y x"
    # appears twice among 4 trigrams → dup 2/4
    docs = _frame(spark, [(1, "x y x y x z")])
    r = repetition_flags(docs).collect()[0]
    assert r.top_bigram_frac == 0.4
    assert r.dup_trigram_frac == 0.5


def test_run_length_stats_direct(spark):
    """The in-row run-length scan equals a GROUP BY count over the same
    values — including empty, single, all-same and unsorted inputs."""
    from pyspark.sql import functions as F

    from land_registry_data_ingestion_spark.operators.textops import (
        _run_length_stats,
    )

    cases = [
        (1, []),
        (2, [7]),
        (3, [5, 5, 5, 5]),
        (4, [1, 2, 3, 4]),
        (5, [9, 1, 9, 2, 9, 1]),  # unsorted with two dup families
    ]
    df = spark.createDataFrame(cases, "id long, xs array<long>")
    got = {
        r.id: (r.s.top, r.s.dup)
        for r in df.select(
            "id", _run_length_stats(F.array_sort("xs")).alias("s")
        ).collect()
    }
    def expected(xs):
        from collections import Counter
        c = Counter(xs)
        top = max(c.values(), default=0)
        dup = sum(v for v in c.values() if v > 1)
        return (top, dup)
    for i, xs in cases:
        assert got[i] == expected(xs), (i, xs, got[i])


def test_word_shingle_hashes_match_string_shingles(spark):
    """Hash-shingle distinctness/equality mirrors string shingles: same
    per-doc count, and cross-doc overlap sizes match (no collisions at
    test scale, by construction of the chained xxhash64)."""
    from pyspark.sql import functions as F

    from land_registry_data_ingestion_spark.functions.text import (
        word_shingle_hashes,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown cat naps under the lazy dog"),
            (3, "one two"),  # shorter than k=3 -> empty
            (4, "  The  QUICK   brown fox jumps  "),  # normalization
        ],
        "doc_id long, text string",
    )
    both = docs.select(
        "doc_id",
        word_shingles(F.col("text"), 3).alias("s"),
        word_shingle_hashes(F.col("text"), 3).alias("h"),
    ).collect()
    by_id = {r.doc_id: r for r in both}
    for r in both:
        assert len(r.s) == len(r.h), r.doc_id
        assert len(set(r.h)) == len(r.h), r.doc_id  # distinct stays distinct
    # cross-doc: shared string shingles == shared hash shingles
    s1, s2 = set(by_id[1].s), set(by_id[2].s)
    h1, h2 = set(by_id[1].h), set(by_id[2].h)
    assert len(s1 & s2) == len(h1 & h2) > 0
    # normalization: doc 4's shingles are a subset of doc 1's, in hashes too
    assert set(by_id[4].h) <= h1
    assert by_id[3].h == []


def test_arrow_counts_match_expression_form(spark):
    """The round-6 integer-counts kernel must agree with the
    pure-expression form on every row — including NULL text,
    unicode-whitespace-bearing text (ASCII-only split semantics: NBSP
    and U+2028 are TOKEN CHARACTERS, not separators), empty strings,
    and heavy repetition. Fractions/flags are shared JVM expressions,
    so agreement on rows means bit-identical output."""
    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "spam " * 50),
        (4, "a b c d e f g h i j " * 3),
        (5, "one"),
        (6, "hello world hello world plain"),
        (7, "line sep line sep line sep"),
        (8, "Tab\there tab\there MIXED case mixed CASE"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = sorted(
        tuple(r) for r in repetition_flags(docs, use_arrow=True).collect()
    )
    expr = sorted(
        tuple(r) for r in repetition_flags(docs, use_arrow=False).collect()
    )
    assert arrow == expr


def test_arrow_expr_agree_on_final_sigma(spark):
    """Executable pin of the case-normalization note at
    textops.py::_repetition_counts_arrow: Python str.lower() and Spark
    lower() (Java toLowerCase) BOTH implement Unicode default case
    conversion including the context-sensitive final-sigma rule, so
    'ΣΑΣ' and pre-lowered 'σας' meet as equal tokens in BOTH forms and
    the repetition counts agree bit-for-bit. (The documented residual
    divergence class — a Turkish/Azeri/Lithuanian JVM default locale —
    is not constructible in-process: it would require restarting the
    JVM with -Duser.language=tr.) If either side's case algorithm ever
    changes, this flips and both kernels' docstrings must be revisited.
    """
    from land_registry_data_ingestion_spark.operators.textops import (
        repetition_flags,
    )

    docs = spark.createDataFrame(
        [(0, "ΣΑΣ σας ΣΑΣ σας ΣΑΣ σας"), (1, "ΣΑΣ ΣΑΣ ΣΑΣ mixed")],
        "doc_id long, text string",
    )
    arrow = sorted(
        tuple(r) for r in repetition_flags(docs, use_arrow=True).collect()
    )
    expr = sorted(
        tuple(r) for r in repetition_flags(docs, use_arrow=False).collect()
    )
    assert arrow == expr
    # and the rule actually fired: all tokens in doc 0 are one type
    assert arrow[0][1] > 0.8  # top_bigram_frac ~ 5/5
