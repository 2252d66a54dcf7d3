"""Empty-input contracts for the NON-SQL surface (the adversarial
gate's empty tier covers only SQL-oracled queries). Empty micro-batches
are the most common streaming edge at scale: every filter, partition,
and incremental batch eventually presents one. Probed clean in round 9
— pinned here so the behavior can't silently regress."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


def test_corpus_store_empty_batches(spark):
    """An empty FIRST batch must bootstrap the store (schema dirs,
    index) and an empty LATER batch must be a no-op — both with honest
    zero counters — rather than failing the stream's foreachBatch."""
    from land_registry_data_ingestion_spark.operators.corpus_store import (
        CorpusStore,
    )

    root = tempfile.mkdtemp(prefix="lrdi_empty_cs_")
    try:
        cs = CorpusStore(spark, root)
        empty = spark.createDataFrame([], "doc_id bigint, text string")
        stats0 = cs.ingest_batch(empty, batch_id=0)
        assert stats0["n_received"] == 0 and stats0["n_accepted"] == 0
        assert cs.corpus().count() == 0
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta")],
            "doc_id bigint, text string",
        )
        assert cs.ingest_batch(docs, batch_id=1)["n_accepted"] == 2
        stats2 = cs.ingest_batch(empty, batch_id=2)
        assert stats2["n_received"] == 0 and stats2["n_accepted"] == 0
        assert cs.corpus().count() == 2
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_span_store_empty_first_batch(spark):
    from land_registry_data_ingestion_spark.operators.span_store import (
        SpanStore,
    )

    root = tempfile.mkdtemp(prefix="lrdi_empty_ss_")
    try:
        ss = SpanStore(spark, root)
        empty = spark.createDataFrame([], "doc_id bigint, text string")
        out = ss.ingest_batch(empty, batch_id=0)
        assert out.count() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_cdc_merge_empty_sides(spark):
    """All three empty combinations: an empty update batch leaves state
    intact (and writes honest zero outcomes), an empty state accepts a
    first batch, and empty-empty stays empty."""
    from land_registry_data_ingestion_spark.operators.merge import (
        cdc_merge,
        init_state,
    )

    state = init_state(
        spark.createDataFrame([(1, 100.0)], "tuid bigint, price double")
    )
    empty_updates = spark.createDataFrame(
        [], "tuid bigint, price double, record_op string"
    )
    mr = cdc_merge(state, empty_updates, key_col="tuid", value_cols=["price"])
    assert mr.new_state.count() == 1
    assert mr.outcomes.count() == 0

    empty_state = init_state(
        spark.createDataFrame([], "tuid bigint, price double")
    )
    first = spark.createDataFrame(
        [(1, 100.0, "A")], "tuid bigint, price double, record_op string"
    )
    assert cdc_merge(
        empty_state, first, key_col="tuid", value_cols=["price"]
    ).new_state.count() == 1
    assert cdc_merge(
        empty_state, empty_updates, key_col="tuid", value_cols=["price"]
    ).new_state.count() == 0


def test_rank_binning_bpe_empty_and_identical(spark):
    """Empty inputs yield empty outputs; an all-identical value column
    (zero spread — every bucket boundary ties) still buckets/ranks/
    quantiles without crashing or dropping rows."""
    from land_registry_data_ingestion_spark.operators.binning import (
        grouped_exact_quantiles,
    )
    from land_registry_data_ingestion_spark.operators.bpe import train_bpe
    from land_registry_data_ingestion_spark.operators.rank import (
        equidepth_histogram,
        global_rank,
    )

    empty_vals = spark.createDataFrame([], "id bigint, v double")
    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert train_bpe(empty_docs, n_merges=5) == []
    assert global_rank(empty_vals, "v").count() == 0
    assert equidepth_histogram(empty_vals, "v", "id", n_buckets=4).count() == 0
    assert (
        grouped_exact_quantiles(
            empty_vals.withColumn("g", F.lit("x")), "g", "v", [0.5]
        ).count()
        == 0
    )

    same = spark.createDataFrame(
        [(i, 7.0) for i in range(20)], "id bigint, v double"
    )
    assert global_rank(same, "v").count() == 20
    assert equidepth_histogram(same, "v", "id", n_buckets=4).count() == 4
    qs = grouped_exact_quantiles(
        same.withColumn("g", F.lit("x")), "g", "v", [0.25, 0.5, 0.75]
    ).collect()
    assert len(qs) == 3


def test_asof_join_empty_sides(spark):
    from land_registry_data_ingestion_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 10.0)], "k bigint, tsv bigint, x double"
    ).select(
        "k",
        F.timestamp_micros((F.col("tsv") * 1000000).cast("long")).alias("ts"),
        "x",
    )
    empty_right = spark.createDataFrame([], "k bigint, ts timestamp, y double")
    assert asof_join(left, empty_right, on="k", ts_col="ts").count() == 0
    assert (
        asof_join(left.limit(0), empty_right, on="k", ts_col="ts").count() == 0
    )
