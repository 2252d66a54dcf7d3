"""Pluggable language-ID model interface: a swapped model must flow
through the same plan shape (Arrow-batched map stage, same output
column) as the built-in heuristic."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.textops import (
    with_language_id,
)


def test_swapped_model_flows_through_same_plan(spark):
    # model defined locally: cloudpickle ships closures by VALUE, while a
    # tests-module function would pickle by reference and fail to import
    # on the python worker
    def _fake_model(texts: pd.Series) -> pd.Series:
        """Stand-in for fastText/CLD3: batch in, batch out."""
        return texts.str.contains("bonjour", case=False).map(
            {True: "fr", False: "xx"}
        )

    docs = spark.createDataFrame(
        [(1, "Bonjour le monde"), (2, "hello world"), (3, "the and is of")],
        ["doc_id", "text"],
    )
    out = with_language_id(docs, model=_fake_model)
    got = {r["doc_id"]: r["predicted_lang"] for r in out.collect()}
    assert got == {1: "fr", 2: "xx", 3: "xx"}
    # same column name + Arrow (not row-at-a-time Python) evaluation
    assert "predicted_lang" in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_default_model_still_expression_only(spark):
    docs = spark.createDataFrame([(1, "the and is of a in")], ["doc_id", "text"])
    out = with_language_id(docs)
    assert out.collect()[0]["predicted_lang"] == "en"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure JVM expressions


def test_model_gets_batches_not_rows(spark):
    calls: list[int] = []

    def counting_model(texts: pd.Series) -> pd.Series:
        calls.append(len(texts))
        return pd.Series(["und"] * len(texts))

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], ["doc_id", "text"]
    ).coalesce(1)
    assert with_language_id(docs, model=counting_model).count() == 100
    # batched transfer: far fewer invocations than rows (Arrow batches)
    # NOTE: calls is driver-side; with local[*] the udf runs in a python
    # worker, so assert via the result instead when that's flaky.
    out = with_language_id(docs, model=counting_model).collect()
    assert all(r["predicted_lang"] == "und" for r in out)


def test_edge_whitespace_and_empty_docs(spark):
    """Scraped corpora lead/trail with tabs and newlines and contain
    empty documents. Two regressions pinned here: (a) Spark's trim
    strips only ASCII spaces, so raw-split token counting produced
    phantom edge tokens ('\\thello\\n' counted 3, tab/newline-only text
    counted 2); (b) punct_ratio divided by length(text), so ONE empty
    document failed the whole quality query under ANSI mode with
    DIVIDE_BY_ZERO (DuckDB's double 0/0 is NULL, so NULL is also the
    oracle-aligned value)."""
    from pyspark.sql import Row

    from land_registry_data_ingestion_spark.operators.textops import (
        gopher_quality_flags,
        with_quality_score,
        with_token_count,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=""),
            Row(doc_id=2, text="   \t\n  "),
            Row(doc_id=3, text="\thello\n"),
            Row(doc_id=4, text="plain words here"),
            Row(doc_id=5, text=None),
        ]
    )
    counts = {r["doc_id"]: r["n_tokens"] for r in with_token_count(docs).collect()}
    assert counts == {1: 0, 2: 0, 3: 1, 4: 3, 5: None}

    quality = {
        r["doc_id"]: r["punct_ratio"] for r in with_quality_score(docs).collect()
    }
    assert quality[1] is None and quality[4] == 0.0

    flags = {
        r["doc_id"]: r["passes_gopher"]
        for r in gopher_quality_flags(docs).collect()
    }
    assert flags[1] is False  # empty doc fails rules, doesn't crash them
