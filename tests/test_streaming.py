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
