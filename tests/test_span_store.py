"""SpanStore: incremental substring dedup across crawl batches
(operators/span_store.py)."""

from __future__ import annotations

from pyspark.sql import Row

from land_registry_data_ingestion_spark.operators.span_store import SpanStore


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=d, text=t) for d, t in rows])


def test_cross_batch_duplicate_detected(spark, tmp_path):
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    passage = _words(10, "p")
    b0 = _df(spark, [(1, f"{_words(6, 'a')} {passage}")])
    b1 = _df(spark, [(2, f"{passage} {_words(9, 'b')}")])

    s0 = store.ingest_batch(b0, 0).collect()
    assert s0 == []  # clean batch: nothing duplicated yet

    s1 = {
        (r.doc_id, r.span_start, r.span_end)
        for r in store.ingest_batch(b1, 1).collect()
    }
    # doc 2's copy of the passage (positions 0..9) is flagged against
    # batch 0's index; batch 0's doc stays accepted (forward-only)
    assert s1 == {(2, 0, 9)}


def test_within_batch_duplicates_still_found(spark, tmp_path):
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    body = _words(12, "z")
    spans = store.ingest_batch(
        _df(spark, [(1, body), (2, body)]), 0
    ).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in spans} == {
        (1, 0, 11),
        (2, 0, 11),
    }


def test_replay_excludes_own_previous_attempt(spark, tmp_path):
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    doc = _df(spark, [(1, _words(15, "q"))])
    assert store.ingest_batch(doc, 0).collect() == []
    # replay of batch 0: its own previous index partition must not make
    # the document look like a duplicate of itself
    assert store.ingest_batch(doc, 0).collect() == []
    # and the index holds the batch's grams exactly once
    idx = store.index()
    assert idx.agg({"n": "max"}).collect()[0][0] == 1


def test_index_accumulates_counts(spark, tmp_path):
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8, min_count=3)
    body = _words(8, "m")
    store.ingest_batch(_df(spark, [(1, body)]), 0)
    s1 = store.ingest_batch(_df(spark, [(2, body)]), 1).collect()
    assert s1 == []  # total count 2 < min_count=3
    s2 = {
        (r.doc_id, r.span_start, r.span_end)
        for r in store.ingest_batch(_df(spark, [(3, body)]), 2).collect()
    }
    assert s2 == {(3, 0, 7)}  # third occurrence crosses the threshold


def test_streaming_span_dedup(spark, tmp_path):
    """File-stream batches through the SpanStore sink: a doc duplicating
    an earlier batch's passage is flagged on arrival."""
    from land_registry_data_ingestion_spark.streaming.span_stream import (
        run_span_dedup_stream,
    )

    passage = _words(10, "p")
    b0 = _df(spark, [(1, f"{_words(6, 'a')} {passage}")])
    b1 = _df(spark, [(2, f"{passage} {_words(9, 'b')}")])
    in_dir = tmp_path / "in"
    for df in (b0, b1):
        df.coalesce(1).write.mode("append").parquet(str(in_dir))

    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    seen: dict[int, set] = {}

    def on_spans(spans, batch_id):
        seen[batch_id] = {
            (r.doc_id, r.span_start, r.span_end) for r in spans.collect()
        }

    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = run_span_dedup_stream(
        stream, store, checkpoint_dir=str(tmp_path / "ckpt"), on_spans=on_spans
    )
    q.awaitTermination(120)

    assert len(seen) == 2
    all_spans = set().union(*seen.values())
    # whichever order the two files arrived, the SECOND occurrence of the
    # passage is flagged against the index built by the first
    assert all_spans in (
        {(2, 0, 9)},   # b0 then b1
        {(1, 6, 15)},  # b1 then b0
    )


def test_format_marker_stamped_and_checked(spark, tmp_path):
    """The gram_index carries its gram-key convention; a store with a
    different k (or a future hash change) must refuse the index instead
    of silently probing incompatible keys."""
    import pytest

    root = str(tmp_path / "ss")
    store = SpanStore(spark=spark, root=root, k=8)
    store.ingest_batch(_df(spark, [(1, _words(20))]), 0)
    assert (tmp_path / "ss" / "gram_index" / "_format").read_text().endswith(
        ";k=8"
    )
    mismatched = SpanStore(spark=spark, root=root, k=6)
    with pytest.raises(ValueError, match="gram-key format"):
        mismatched.index()
    with pytest.raises(ValueError, match="gram-key format"):
        mismatched.ingest_batch(_df(spark, [(2, _words(20))]), 1)
    # the matching store keeps working
    store.index().collect()


def test_legacy_unmarked_index_refused(spark, tmp_path):
    """batch= partitions with NO marker predate the current hash — keys
    may not be comparable, so fail with the rebuild instruction."""
    import os

    import pytest

    root = str(tmp_path / "ss")
    store = SpanStore(spark=spark, root=root, k=8)
    store.ingest_batch(_df(spark, [(1, _words(20))]), 0)
    os.remove(os.path.join(root, "gram_index", "_format"))
    with pytest.raises(ValueError, match="Rebuild the index"):
        store.index()
