"""Streaming corpus curation: cross-batch dedup (incl. restart from
checkpoint), Gopher-flag parity with the batch operator, per-batch
decontamination in the exactly-once sink."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.streaming.corpus_stream import (
    curate_stream,
    run_curation_sink,
)
from land_registry_data_ingestion_spark.util import release_caches

DOC_SCHEMA = "doc_id long, text string"

GOOD = " ".join(f"w{i}" for i in range(30))  # passes every Gopher rule
BENCH_TEXT = "a b c d e"  # its 3-gram shingles form the benchmark set


def _write_batch(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def _read_out(spark, out_dir):
    return spark.read.parquet(os.path.join(str(out_dir), "batch=*"))


def _run(spark, src, bench, out, ckpt):
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    q = run_curation_sink(
        curate_stream(stream), bench, str(out), str(ckpt)
    )
    q.awaitTermination(120)


def test_stream_dedup_flags_and_contamination(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    bench = spark.createDataFrame([(999, BENCH_TEXT)], ["doc_id", "text"])

    _write_batch(
        src,
        "b1.json",
        [
            {"doc_id": 1, "text": GOOD},
            {"doc_id": 2, "text": GOOD},  # intra-batch duplicate
            {"doc_id": 3, "text": f"{BENCH_TEXT} {GOOD}"},  # contaminated
            {"doc_id": 4, "text": "short"},  # fails gopher word count
        ],
    )
    _run(spark, src, bench, tmp_path / "out", tmp_path / "ckpt")

    got = {r["doc_id"]: r for r in _read_out(spark, tmp_path / "out").collect()}
    assert got[1]["is_first"] and not got[2]["is_first"]
    assert got[2]["doc_fingerprint"] == got[1]["doc_fingerprint"]
    assert got[3]["is_contaminated"] and got[3]["n_bench_shingles"] == 3
    assert not got[1]["is_contaminated"]
    assert got[1]["passes_gopher"] and got[3]["passes_gopher"]
    assert not got[4]["passes_gopher"]

    # parity with the batch rule battery on the same rows
    from land_registry_data_ingestion_spark.operators.textops import (
        gopher_quality_flags,
    )

    batch_docs = spark.createDataFrame(
        [(1, GOOD), (3, f"{BENCH_TEXT} {GOOD}"), (4, "short")],
        ["doc_id", "text"],
    )
    batch_flags = {
        r["doc_id"]: r["passes_gopher"]
        for r in gopher_quality_flags(batch_docs).collect()
    }
    for d in (1, 3, 4):
        assert got[d]["passes_gopher"] == batch_flags[d]


def test_stream_dedup_survives_restart(spark, tmp_path):
    """The fingerprint state lives in the checkpoint: a document
    re-arriving AFTER a restart must still be flagged as a duplicate."""
    src = tmp_path / "src"
    src.mkdir()
    bench = spark.createDataFrame([(999, BENCH_TEXT)], ["doc_id", "text"])
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    _write_batch(src, "b1.json", [{"doc_id": 10, "text": GOOD}])
    _run(spark, src, bench, out, ckpt)

    # restart (new query object, same checkpoint) with a re-crawl + a new doc
    other = GOOD + " extra tokens here"
    _write_batch(
        src,
        "b2.json",
        [{"doc_id": 11, "text": GOOD}, {"doc_id": 12, "text": other}],
    )
    _run(spark, src, bench, out, ckpt)

    got = {r["doc_id"]: r for r in _read_out(spark, tmp_path / "out").collect()}
    assert set(got) == {10, 11, 12}
    assert got[10]["is_first"]
    assert not got[11]["is_first"]  # duplicate across the restart
    assert got[12]["is_first"]


def test_recreated_checkpoint_does_not_clobber_prior_output(spark, tmp_path):
    """Batch ids restart at 0 when a checkpoint is lost; the sink's
    output dirs are stream-scoped, so the new lineage's batch 0 must NOT
    overwrite the original stream's batch 0 (silent data loss)."""
    import shutil

    src1 = tmp_path / "src1"
    src1.mkdir()
    bench = spark.createDataFrame([(999, BENCH_TEXT)], ["doc_id", "text"])
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    _write_batch(src1, "b1.json", [{"doc_id": 1, "text": GOOD}])
    _run(spark, src1, bench, out, ckpt)
    assert _read_out(spark, out).count() == 1

    # lose the checkpoint; a NEW lineage (fresh source dir, ids restart
    # at 0) writes different docs to the same out_dir
    shutil.rmtree(ckpt)
    src2 = tmp_path / "src2"
    src2.mkdir()
    _write_batch(src2, "b1.json", [{"doc_id": 2, "text": GOOD + " x"}])
    _run(spark, src2, bench, out, ckpt)

    got = sorted(r.doc_id for r in _read_out(spark, out).collect())
    assert got == [1, 2]  # doc 1 survived the new lineage's batch 0
