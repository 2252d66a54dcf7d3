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
