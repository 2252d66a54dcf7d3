"""Incremental corpus store: cross-batch dedup against the persistent
fingerprint index, replay idempotency, counter correctness."""

from __future__ import annotations

import pytest

from land_registry_data_ingestion_spark.operators.corpus_store import CorpusStore
from land_registry_data_ingestion_spark.util import release_caches

A = "alpha text one " * 5
B = "beta text two " * 5
C = "gamma text three " * 5


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cross_batch_dedup_and_counters(spark, tmp_path):
    store = CorpusStore(spark=spark, root=str(tmp_path / "store"))

    r1 = store.ingest_batch(_docs(spark, [(1, A), (2, A), (3, B)]), batch_id=1)
    assert r1 == {
        "batch_id": "1",
        "n_received": 3,
        "n_intra_batch_dups": 1,  # doc 2 duplicates doc 1 in-batch
        "n_known_dups": 0,
        "n_accepted": 2,
    }

    # batch 2: B re-crawled (known), C new
    r2 = store.ingest_batch(_docs(spark, [(10, B), (11, C)]), batch_id=2)
    assert r2["n_known_dups"] == 1 and r2["n_accepted"] == 1

    assert {r["doc_id"] for r in store.corpus().collect()} == {1, 3, 11}
    assert store.index().count() == 3


def test_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch (crash replay) must reproduce the same accepted
    set — its own previous attempt's index rows must not shadow it."""
    store = CorpusStore(spark=spark, root=str(tmp_path / "store"))
    store.ingest_batch(_docs(spark, [(1, A)]), batch_id=1)

    batch2 = _docs(spark, [(10, B), (11, A)])  # A already known from b1
    first = store.ingest_batch(batch2, batch_id=2)
    replay = store.ingest_batch(batch2, batch_id=2)
    assert first == replay
    assert replay["n_accepted"] == 1 and replay["n_known_dups"] == 1
    assert {r["doc_id"] for r in store.corpus().collect()} == {1, 10}


def _near_variant(text: str) -> str:
    toks = text.split()
    toks[-1] = "changed"
    return " ".join(toks)


def test_near_dup_mode_intra_and_cross_batch(spark, tmp_path):
    store = CorpusStore(spark=spark, root=str(tmp_path / "store"))
    base = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"zzz{i}" for i in range(30))

    # batch 1: base + a near-variant of it (intra near-dup) + distinct doc
    r1 = store.ingest_batch(
        _docs(spark, [(1, base), (2, _near_variant(base)), (3, other)]),
        batch_id=1,
        near_dup=True,
    )
    assert r1["n_near_dups_intra"] == 1 and r1["n_accepted"] == 2
    assert {r["doc_id"] for r in store.corpus().collect()} == {1, 3}

    # batch 2: another near-variant of base (cross-batch near-dup) + new doc
    toks = base.split()
    toks[0] = "swapped"
    r2 = store.ingest_batch(
        _docs(spark, [(10, " ".join(toks)), (11, "brand new words " * 8)]),
        batch_id=2,
        near_dup=True,
    )
    assert r2["n_near_dups_known"] == 1
    assert r2["n_near_dups_intra"] == 0 and r2["n_known_dups"] == 0
    assert r2["n_accepted"] == 1
    assert {r["doc_id"] for r in store.corpus().collect()} == {1, 3, 11}

    # replay of batch 2 reproduces itself (bands/index exclude own batch)
    assert store.ingest_batch(
        _docs(spark, [(10, " ".join(toks)), (11, "brand new words " * 8)]),
        batch_id=2,
        near_dup=True,
    ) == r2
