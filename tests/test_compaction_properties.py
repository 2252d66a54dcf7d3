"""Randomized differential test for store compaction: a SpanStore fed a
random schedule of batches, REPLAYS, and compaction points must be
indistinguishable — same per-batch detected spans, same final index
contents — from a twin store that never compacts. Exercises the
invariants the unit tests pin individually (subsumption, in-flight
exclusion, idempotent retry) under composition."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from land_registry_data_ingestion_spark.operators.span_store import SpanStore


def _random_schedule(seed: int):
    """A batch schedule: each entry is (batch_tag, rows, replay?,
    compact_before?). Texts draw passages from a small shared pool so
    cross-batch duplicate spans actually occur."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(10)]
    passages = [
        [rng.choice(vocab) for _ in range(rng.randint(8, 14))]
        for _ in range(4)
    ]
    schedule = []
    doc_id = 0
    for b in range(rng.randint(8, 12)):
        rows = []
        for _ in range(rng.randint(1, 3)):
            body: list[str] = [
                f"b{b}u{doc_id}x{i}" for i in range(rng.randint(8, 12))
            ]
            if rng.random() < 0.55:
                pos = rng.randint(0, len(body))
                body[pos:pos] = rng.choice(passages)
            rows.append((doc_id, " ".join(body)))
            doc_id += 1
        schedule.append(
            {
                "tag": f"T-{b:04d}",
                "rows": rows,
                "replay": rng.random() < 0.3,
                "compact_before": rng.random() < 0.4,
            }
        )
    return schedule


def _spans(df) -> set[tuple]:
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in df.collect()
    }


def _index(store) -> dict:
    return {r.gram_key: r.n for r in store.index().collect()}


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_compacted_store_equals_uncompacted_twin(spark, tmp_path, seed):
    a = SpanStore(spark=spark, root=str(tmp_path / "a"), k=8)
    b = SpanStore(spark=spark, root=str(tmp_path / "b"), k=8)
    for step in _random_schedule(seed):
        df = spark.createDataFrame(
            [Row(doc_id=d, text=t) for d, t in step["rows"]]
        )
        if step["compact_before"]:
            # fold whatever is committed; the in-flight tag is excluded
            # exactly as the stream sink does
            a.compact(exclude_batch=step["tag"], min_partitions=2)
        if step["replay"]:
            # first (crashed) attempt: effects land, checkpoint doesn't
            a.ingest_batch(df, step["tag"])
            b.ingest_batch(df, step["tag"])
        got_a = _spans(a.ingest_batch(df, step["tag"]))
        got_b = _spans(b.ingest_batch(df, step["tag"]))
        assert got_a == got_b, f"spans diverged at {step['tag']}"
    assert _index(a) == _index(b)
