"""Structured Streaming tests: conflation + exactly-once-effect pipeline.

No Kafka broker in this container, so a file source drives the same code
path (the source is pluggable; semantics are identical).
"""

from __future__ import annotations

import json

from land_registry_data_ingestion_spark.streaming.conflate import (
    conflate_latest,
    run_conflated_stream,
)
from land_registry_data_ingestion_spark.streaming.stateful import (
    sha_decision_stream,
)


def test_conflate_latest_batch(spark):
    batch = spark.createDataFrame(
        [
            ("cron", "t1", 1, "a"),
            ("cron", "t1", 3, "c"),
            ("cron", "t1", 2, "b"),
            ("dl", "t1", 1, "x"),
        ],
        ["source", "key", "ts", "payload"],
    )
    got = {
        (r["source"], r["key"]): (r["ts"], r["payload"])
        for r in conflate_latest(batch, ["source", "key"], "ts").collect()
    }
    assert got == {("cron", "t1"): (3, "c"), ("dl", "t1"): (1, "x")}


def test_streaming_conflation_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink: list = []

    # two trigger notifications for the same key + one for another key
    rows = [
        {"notification_type": "cron", "key": "pp-complete", "ts": 1, "run": "r1"},
        {"notification_type": "cron", "key": "pp-complete", "ts": 5, "run": "r2"},
        {"notification_type": "cron", "key": "pp-monthly", "ts": 2, "run": "r3"},
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema(
            "notification_type string, key string, ts long, run string"
        )
        .json(str(src))
    )

    def effect(conflated, batch_id):
        sink.extend(
            (r["key"], r["ts"], r["run"]) for r in conflated.collect()
        )

    q = run_conflated_stream(
        stream, ["notification_type", "key"], "ts", effect, ckpt
    )
    q.awaitTermination(120)

    got = dict((k, (ts, run)) for k, ts, run in sink)
    # conflation kept only the LAST trigger per key
    assert got == {"pp-complete": (5, "r2"), "pp-monthly": (2, "r3")}

    # restart with no new data: checkpoint prevents re-effect (idempotence)
    sink.clear()
    q2 = run_conflated_stream(
        stream, ["notification_type", "key"], "ts", effect, ckpt
    )
    q2.awaitTermination(120)
    assert sink == []


def test_stateful_sha_dedup_across_restarts(spark, tmp_path):
    """applyInPandasWithState: the last-archived-hash state survives the
    checkpoint, so a restart sees a repeated sha as garbage_collect."""
    src = tmp_path / "files"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run(sink_table):
        stream = spark.readStream.schema(
            "source_key string, sha256 string, ts long"
        ).json(str(src))
        rows: list = []
        q = (
            sha_decision_stream(stream)
            .writeStream.foreachBatch(
                lambda batch, _bid: rows.extend(batch.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["source_key"], r["ts"]): r["decision"] for r in rows}

    rows1 = [
        {"source_key": "pp-complete", "sha256": "aaa", "ts": 1},
        {"source_key": "pp-complete", "sha256": "aaa", "ts": 2},  # dup
        {"source_key": "pp-complete", "sha256": "bbb", "ts": 3},  # changed
        {"source_key": "pp-monthly", "sha256": "aaa", "ts": 1},  # own state
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    got1 = run("dec1")
    assert got1 == {
        ("pp-complete", 1): "archive",
        ("pp-complete", 2): "garbage_collect",
        ("pp-complete", 3): "archive",
        ("pp-monthly", 1): "archive",
    }

    # second run, same checkpoint: 'bbb' repeats -> state remembered
    rows2 = [
        {"source_key": "pp-complete", "sha256": "bbb", "ts": 4},
        {"source_key": "pp-monthly", "sha256": "ccc", "ts": 5},
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
    got2 = run("dec2")
    assert got2 == {
        ("pp-complete", 4): "garbage_collect",
        ("pp-monthly", 5): "archive",
    }
