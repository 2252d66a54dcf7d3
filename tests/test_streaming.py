"""Structured Streaming tests: conflation + exactly-once-effect pipeline.

No Kafka broker in this container, so a file source drives the same code
path (the source is pluggable; semantics are identical).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

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


def test_watermark_drops_late_events_across_batches(spark, tmp_path):
    """Event-time window agg with a 10-minute watermark: a row arriving
    after the watermark passed its window is dropped; windows finalize
    (append mode) only once the watermark clears their end."""
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("ts timestamp, k string")
            .json(str(src))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .count()
        )
        out: list = []
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _id: out.extend(b.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["w"]["start"].strftime("%H:%M"), r["count"]) for r in out
        }

    def write(name, *ts):
        (src / name).write_text(
            "\n".join(
                json.dumps({"ts": f"2024-01-01 {t}:00", "k": "x"}) for t in ts
            )
        )

    # batch 1: two rows in [10:00,11:00), one in [11:00,12:00)
    write("b1.json", "10:05", "10:15", "11:05")
    assert run() == set()  # watermark 10:55 — no window closed yet

    # batch 2: 12:30 advances the watermark to 12:20, which closes (and
    # finalizes) the 10:00 and 11:00 windows
    write("b2.json", "12:30")
    got2 = run()

    # batch 3: 10:20 is now LATE (its window end 11:00 <= watermark 12:20,
    # state already evicted) → dropped; 15:00 flushes the 12:00 window
    write("b3.json", "15:00", "10:20")
    got3 = run()

    emitted = got2 | got3
    assert ("10:00", 2) in emitted  # finalized WITHOUT the late 10:20 row
    assert ("10:00", 3) not in emitted
    assert ("11:00", 1) in emitted
    assert ("12:00", 1) in emitted


def test_streaming_session_window_merges_and_splits(spark, tmp_path):
    """Native session_window streaming agg (the streaming-native form of
    the batch gap-sessionization in evt_sessionize): events within the
    gap merge into one growing session, a quiet period splits sessions,
    and sessions finalize (append mode) only after the watermark clears
    their end — including merging a session ACROSS micro-batches."""
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("ts timestamp, user string")
            .json(str(src))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user")
            .agg(F.count("*").alias("n_events"))
        )
        out: list = []
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _id: out.extend(b.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (
                r["user"],
                r["s"]["start"].strftime("%H:%M"),
                r["s"]["end"].strftime("%H:%M"),
                r["n_events"],
            )
            for r in out
        }

    def write(name, *rows):
        (src / name).write_text(
            "\n".join(
                json.dumps({"ts": f"2024-01-01 {t}:00", "user": u})
                for t, u in rows
            )
        )

    # batch 1: two events 20 min apart → one open session for u1
    write("b1.json", ("10:00", "u1"), ("10:20", "u1"))
    assert run() == set()  # session still open, nothing finalized

    # batch 2: 10:40 EXTENDS the same session across batches (gap < 30);
    # 13:00 starts a new one and advances the watermark to 12:50, which
    # finalizes the first session as ONE merged row [10:00, 11:10)
    write("b2.json", ("10:40", "u1"), ("13:00", "u1"))
    got2 = run()
    assert got2 == {("u1", "10:00", "11:10", 3)}

    # batch 3: advance the watermark far enough to flush the 13:00 session
    write("b3.json", ("15:00", "u1"))
    got3 = run()
    assert ("u1", "13:00", "13:30", 1) in got3


def test_stream_interval_join_matches_batch_range_join(spark, tmp_path):
    """Stream-stream interval join (events within [anchor, anchor+30 min])
    across two micro-batch rounds, including a cross-batch match: an
    anchor from round 1 joins an event arriving in round 2. The batch
    ground truth is bucketed_range_join on the union of all inputs —
    the same semantics evt_range_join declares under the oracle."""
    from land_registry_data_ingestion_spark.operators.rangejoin import (
        bucketed_range_join,
    )
    from land_registry_data_ingestion_spark.streaming.interval_join import (
        stream_interval_join,
    )

    ev_src = tmp_path / "ev"
    an_src = tmp_path / "an"
    ev_src.mkdir(); an_src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    got: list = []

    def run():
        ev = spark.readStream.schema("ev_id long, ev_ts timestamp").json(
            str(ev_src)
        )
        an = spark.readStream.schema("an_id long, an_ts timestamp").json(
            str(an_src)
        )
        joined = stream_interval_join(
            ev, an, "ev_ts", "an_ts", span_s=1800, watermark_s=7200
        )
        q = (
            joined.select("ev_id", "an_id")
            .writeStream.foreachBatch(lambda b, _id: got.extend(b.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write(d, name, col_id, col_ts, *rows):
        (d / name).write_text(
            "\n".join(
                json.dumps({col_id: i, col_ts: f"2024-01-01 {t}:00"})
                for i, t in rows
            )
        )

    # round 1: anchor at 10:00; events at 10:10 (match) and 10:45 (miss)
    write(an_src, "a1.json", "an_id", "an_ts", (100, "10:00"))
    write(ev_src, "e1.json", "ev_id", "ev_ts", (1, "10:10"), (2, "10:45"))
    run()
    # round 2: event at 10:29 still matches round 1's buffered anchor
    # (cross-batch state); a new anchor at 10:40 catches event 2
    write(ev_src, "e2.json", "ev_id", "ev_ts", (3, "10:29"))
    write(an_src, "a2.json", "an_id", "an_ts", (101, "10:40"))
    run()

    stream_pairs = sorted((r.ev_id, r.an_id) for r in got)

    def batch_df(schema, d):
        return spark.read.schema(schema).json(str(d))

    ev_all = batch_df("ev_id long, ev_ts timestamp", ev_src)
    an_all = batch_df("an_id long, an_ts timestamp", an_src).select(
        "an_id",
        F.col("an_ts").alias("lo"),
        (F.col("an_ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    )
    batch_pairs = sorted(
        (r.ev_id, r.an_id)
        for r in bucketed_range_join(ev_all, an_all, "ev_ts", "lo", "hi", 1800)
        .select("ev_id", "an_id")
        .collect()
    )
    assert stream_pairs == batch_pairs
    assert (3, 100) in stream_pairs  # the cross-batch match
    assert (2, 101) in stream_pairs
    assert all(p[0] != 2 or p[1] != 100 for p in stream_pairs)
