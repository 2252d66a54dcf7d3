"""Batch-partition compaction for the incremental stores
(operators/compaction.py): folding committed ``batch=`` partitions must
be invisible to every reader — same index contents, same probe results,
same replay semantics — while bounding the partition count a long-lived
store pays per probe."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row

from land_registry_data_ingestion_spark.operators.compaction import (
    compact,
    live_partitions,
)
from land_registry_data_ingestion_spark.operators.corpus_store import (
    CorpusStore,
)
from land_registry_data_ingestion_spark.operators.span_store import SpanStore


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=d, text=t) for d, t in rows])


def _index_counts(store):
    return {
        (r.gram_key, r.n) for r in store.index().collect()
    }


def test_span_store_compaction_preserves_index(spark, tmp_path):
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    for b in range(5):
        store.ingest_batch(
            _df(spark, [(b * 10, _words(12, f"b{b}"))]), b
        )
    before = _index_counts(store)
    name = store.compact(min_partitions=2)
    assert name is not None and name.startswith("batch=compact-")
    assert _index_counts(store) == before
    # all five per-batch partitions folded into one
    assert live_partitions(store._index_dir) == [name]


def test_span_store_detection_across_compaction(spark, tmp_path):
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    passage = _words(10, "p")
    store.ingest_batch(_df(spark, [(1, f"{_words(6, 'a')} {passage}")]), 0)
    store.ingest_batch(_df(spark, [(2, _words(12, "c"))]), 1)
    store.compact(min_partitions=2)
    # a later batch repeating batch 0's passage is still caught even
    # though batch 0's partition no longer exists by name
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in store.ingest_batch(
            _df(spark, [(3, f"{passage} {_words(9, 'd')}")]), 2
        ).collect()
    }
    assert spans == {(3, 0, 9)}


def test_compaction_excludes_inflight_batch(spark, tmp_path):
    """A replayable (in-flight) batch's partition must survive
    compaction so the replay can overwrite itself and probe without
    seeing its own previous attempt."""
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    body = _words(12, "z")
    for b in range(3):
        store.ingest_batch(_df(spark, [(b, _words(12, f"u{b}"))]), b)
    # batch 3 = first (crashed) attempt, then compact as the replay would
    store.ingest_batch(_df(spark, [(30, body)]), 3)
    store.compact(exclude_batch=3, min_partitions=2)
    live = live_partitions(store._index_dir)
    assert "batch=3" in live and len(live) == 2
    # replay of batch 3: its own prior counts are excluded, so the body
    # is NOT flagged against itself
    spans = store.ingest_batch(_df(spark, [(30, body)]), 3).collect()
    assert spans == []


def test_folded_dirs_survive_fold_and_never_double_count(spark, tmp_path):
    """After a fold, the compact partition AND every folded dir coexist
    on disk until a later compaction call gc's them — and with the
    round-8 AGE GATE, only once the fold is ``gc_grace_seconds`` old
    (the streaming sinks compact every micro-batch, so a call-count
    grace alone can be seconds). Readers must count each batch exactly
    once throughout (the _folded.json subsumption rule)."""
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    for b in range(3):
        store.ingest_batch(_df(spark, [(b, _words(12, f"u{b}"))]), b)
    before = _index_counts(store)

    src = os.path.join(store._index_dir, "batch=1")
    store.compact(min_partitions=2)
    # deferred deletion: the folded dir is still physically present...
    assert os.path.isdir(src)
    # ...but subsumed — readers still see the pre-compaction contents,
    # not batch 1 twice
    assert _index_counts(store) == before
    # the NEXT call does NOT reclaim it under the default grace — the
    # fold just landed, a pre-fold reader's plan could still be running
    store.compact(min_partitions=999)
    assert os.path.isdir(src)
    # with the grace elapsed (0 here), a later call reclaims the
    # leftovers even when it folds nothing itself
    store.compact(min_partitions=999, gc_grace_seconds=0.0)
    assert not os.path.isdir(src)
    assert _index_counts(store) == before


def test_gc_age_gate_and_subsumption_order(spark, tmp_path):
    """Two invariants of the round-8 gc: (1) a folded dir is reclaimed
    only once the fold that subsumed it is gc_grace_seconds old; (2) a
    compact dir that was itself folded later is never deleted while a
    dir its own _folded.json names still exists — deleting the subsumer
    first would un-subsume (and so double-count) the survivor for any
    reader listing during the window."""
    idx = str(tmp_path / "idx")

    def write(name, key):
        spark.createDataFrame([Row(gram_key=key, n=1)]).write.parquet(
            os.path.join(idx, name)
        )

    def mark_folded(name, folded, age_sec):
        fj = os.path.join(idx, name, "_folded.json")
        with open(fj, "w") as fh:
            json.dump(folded, fh)
        import time

        old = time.time() - age_sec
        os.utime(fj, (old, old))

    # chain: batch=0 folded into compact-a (RECENT fold), compact-a
    # folded into compact-b (old fold) — so compact-a is age-eligible
    # but still subsumes the on-disk batch=0, which is not.
    write("batch=0", 0)
    write("batch=compact-a", 0)
    write("batch=compact-b", 0)
    mark_folded("batch=compact-a", ["batch=0"], age_sec=0)
    mark_folded("batch=compact-b", ["batch=compact-a"], age_sec=3600)

    def read(paths):
        return spark.read.parquet(*paths)

    assert live_partitions(idx) == ["batch=compact-b"]
    compact(spark, idx, read, min_partitions=999, gc_grace_seconds=300.0)
    # neither deleted: batch=0 is too young, and compact-a must wait
    # for batch=0 even though compact-a itself is old enough
    assert os.path.isdir(os.path.join(idx, "batch=0"))
    assert os.path.isdir(os.path.join(idx, "batch=compact-a"))

    # age the inner fold too: one call now reclaims the whole chain
    # (batch=0 on the first fixpoint pass, compact-a on the second)
    mark_folded("batch=compact-a", ["batch=0"], age_sec=3600)
    compact(spark, idx, read, min_partitions=999, gc_grace_seconds=300.0)
    assert not os.path.isdir(os.path.join(idx, "batch=0"))
    assert not os.path.isdir(os.path.join(idx, "batch=compact-a"))
    assert live_partitions(idx) == ["batch=compact-b"]


def test_gc_reclaims_crashed_fold_tmp_dirs(spark, tmp_path):
    """A fold that crashed between the parquet write and the atomic
    rename leaves ``.tmp-compact-<tag>`` behind; once the live set moves
    on, that tag never recurs and round-7's gc never touched it — a
    permanent disk leak. The round-8 gc sweeps temp dirs older than the
    grace period (they are dot-prefixed, so no reader ever plans them);
    younger ones — possibly an in-flight fold — are left alone."""
    import time

    idx = str(tmp_path / "idx")
    for b in range(2):
        spark.createDataFrame([Row(gram_key=b, n=1)]).write.parquet(
            os.path.join(idx, f"batch={b}")
        )
    old_tmp = os.path.join(idx, ".tmp-compact-deadbeef0000")
    new_tmp = os.path.join(idx, ".tmp-compact-cafecafe0000")
    for d in (old_tmp, new_tmp):
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
            fh.write(b"x")
    stale = time.time() - 3600
    os.utime(old_tmp, (stale, stale))

    compact(
        spark,
        idx,
        read=lambda paths: spark.read.parquet(*paths),
        min_partitions=999,
        gc_grace_seconds=300.0,
    )
    assert not os.path.isdir(old_tmp)  # aged out: reclaimed
    assert os.path.isdir(new_tmp)  # young (maybe in-flight): kept
    assert live_partitions(idx) == ["batch=0", "batch=1"]


def test_reader_listing_taken_before_fold_stays_readable(spark, tmp_path):
    """The concurrent-reader interleaving the round-6 verdict asked to
    pin: list → fold → read. A reader that resolved its partition list
    BEFORE the fold completed must still be able to execute its plan
    (the folded dirs persist through the fold) and must read exactly the
    pre-fold contents — not crash on deleted paths, not double-count."""
    import glob

    idx = str(tmp_path / "idx")
    for b in range(4):
        spark.createDataFrame([Row(gram_key=b, n=1)]).write.parquet(
            os.path.join(idx, f"batch={b}")
        )

    # reader takes its listing snapshot (and even builds its lazy plan)
    pre_fold_names = live_partitions(idx)
    assert len(pre_fold_names) == 4
    pre_fold_df = spark.read.parquet(
        *(os.path.join(idx, d) for d in pre_fold_names)
    )

    # fold lands while the reader's plan is in flight
    name = compact(
        spark,
        idx,
        read=lambda paths: spark.read.parquet(*paths),
        min_partitions=2,
    )
    assert name is not None

    # the pre-fold plan still executes against intact dirs
    assert sorted(r.gram_key for r in pre_fold_df.collect()) == [0, 1, 2, 3]
    # a post-fold listing sees ONLY the compact partition even though
    # the subsumed dirs still physically exist
    assert live_partitions(idx) == [name]
    assert len(glob.glob(os.path.join(idx, "batch=*"))) == 5
    post_df = spark.read.parquet(
        *(os.path.join(idx, d) for d in live_partitions(idx))
    )
    assert sorted(r.gram_key for r in post_df.collect()) == [0, 1, 2, 3]


def test_compaction_below_threshold_is_noop(spark, tmp_path):
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    store.ingest_batch(_df(spark, [(1, _words(12))]), 0)
    assert store.compact(min_partitions=32) is None
    assert live_partitions(store._index_dir) == ["batch=0"]


def test_compaction_idempotent_retry(spark, tmp_path):
    """A crashed-and-retried compaction of the same fold set reuses the
    deterministic tag instead of stacking partitions."""
    spark.createDataFrame(
        [Row(gram_key=1, n=2)]
    ).write.parquet(str(tmp_path / "idx" / "batch=0"))
    spark.createDataFrame(
        [Row(gram_key=1, n=3)]
    ).write.parquet(str(tmp_path / "idx" / "batch=1"))

    def read(paths):
        return spark.read.parquet(*paths)

    d = str(tmp_path / "idx")
    n1 = compact(spark, d, read, min_partitions=2)
    # retry with the folded dirs resurrected (rename landed, delete not)
    fj = json.load(open(os.path.join(d, n1, "_folded.json")))
    assert sorted(fj) == ["batch=0", "batch=1"]
    n2 = compact(spark, d, read, min_partitions=1)
    # nothing new to fold (single live partition < min 1? no: 1 >= 1 —
    # refolding a lone compact partition is allowed and idempotent)
    assert live_partitions(d) == [n2]
    total = spark.read.parquet(os.path.join(d, n2)).groupBy().sum("n")
    assert total.collect()[0][0] == 5


def test_span_stream_restart_after_compaction(spark, tmp_path):
    """Stop the stream after several compactions, add new source files,
    restart from the SAME checkpoint + store: the stream identity keeps
    batch addressing consistent, pre-fold content is still detected, and
    nothing double-counts across the restart boundary."""
    import json as _json

    from land_registry_data_ingestion_spark.streaming.span_stream import (
        run_span_dedup_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    passage = _words(10, "p")

    def write_file(i, rows):
        p = src / f"b{i:02d}.json"
        p.write_text("\n".join(_json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    write_file(0, [{"doc_id": 1, "text": f"{_words(6, 'a')} {passage}"}])
    for b in range(1, 6):
        write_file(b, [{"doc_id": 10 + b, "text": _words(12, f"u{b}")}])

    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)

    def start(seen):
        def on_spans(spans, batch_id):
            seen[batch_id] = spans.collect()

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        return run_span_dedup_stream(
            stream,
            store,
            str(tmp_path / "ckpt"),
            on_spans=on_spans,
            compact_every=3,
        )

    seen1: dict[int, list] = {}
    q = start(seen1)
    q.awaitTermination(120)
    assert max(seen1) == 5

    write_file(6, [{"doc_id": 60, "text": _words(12, "v")}])
    write_file(7, [{"doc_id": 99, "text": f"{passage} {_words(9, 'z')}"}])
    seen2: dict[int, list] = {}
    q = start(seen2)
    q.awaitTermination(120)

    # the restarted stream continues batch numbering (6, 7) and still
    # detects the passage introduced before the first compaction
    assert sorted(seen2) == [6, 7]
    assert {
        (r.doc_id, r.span_start, r.span_end) for r in seen2[7]
    } == {(99, 0, 9)}
    # exactly one count per gram of the passage's first occurrence: the
    # passage region of doc 1 contributes n=1 grams (not 2+) — restart
    # and compaction never double-landed batch 0
    idx = {r.gram_key: r.n for r in store.index().collect()}
    assert sum(1 for n in idx.values() if n == 2) == 3  # k=8 over a
    # 10-token passage → 3 grams shared by doc 1 and doc 99 exactly
    assert all(n <= 2 for n in idx.values())


def test_corpus_store_compaction_preserves_dedup(spark, tmp_path):
    store = CorpusStore(spark=spark, root=str(tmp_path / "cs"))
    text = _words(30)
    for b in range(4):
        store.ingest_batch(
            _df(spark, [(b * 10, _words(30, f"b{b}")), (b * 10 + 1, text)]),
            b,
        )
    idx_before = {
        (r.doc_fingerprint, r.doc_id) for r in store.index().collect()
    }
    out = store.compact(min_partitions=2)
    assert out["index"] is not None
    assert {
        (r.doc_fingerprint, r.doc_id) for r in store.index().collect()
    } == idx_before
    # the shared `text` was accepted once (batch 0) and stays a known
    # dup after compaction
    res = store.ingest_batch(_df(spark, [(99, text)]), 9)
    assert res["n_accepted"] == 0 and res["n_known_dups"] == 1


def test_span_stream_auto_compaction_bounds_partitions(spark, tmp_path):
    """The streaming sink folds the index every ``compact_every`` live
    partitions; detection must keep seeing pre-fold batches and the
    partition count must stay bounded."""
    import json as _json

    from land_registry_data_ingestion_spark.streaming.span_stream import (
        run_span_dedup_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    passage = _words(10, "p")
    rows_by_batch = [
        [{"doc_id": 1, "text": f"{_words(6, 'a')} {passage}"}],
        *(
            [[{"doc_id": 10 + b, "text": _words(12, f"u{b}")}]]
            for b in range(8)
        ),
        [{"doc_id": 99, "text": f"{passage} {_words(9, 'z')}"}],
    ]
    for i, rows in enumerate(rows_by_batch):
        p = src / f"b{i:02d}.json"
        p.write_text("\n".join(_json.dumps(r) for r in rows))
        # the file source orders by modification time; files written in
        # one tight loop share a timestamp, so pin an ascending order
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    store = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=8)
    seen: dict[int, list] = {}

    def on_spans(spans, batch_id):
        seen[batch_id] = spans.collect()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = run_span_dedup_stream(
        stream,
        store,
        str(tmp_path / "ckpt"),
        on_spans=on_spans,
        compact_every=4,
    )
    q.awaitTermination(120)

    # batch 0's passage is still detected in the last batch even though
    # batch 0's partition was folded away several compactions ago
    last = max(seen)
    assert {(r.doc_id, r.span_start, r.span_end) for r in seen[last]} == {
        (99, 0, 9)
    }
    live = live_partitions(store._index_dir)
    assert len(live) <= 4 + 1  # at most compact_every-1 singles + 1 compact


def test_corpus_store_near_dup_bands_survive_compaction(spark, tmp_path):
    store = CorpusStore(spark=spark, root=str(tmp_path / "cs"))
    base = _words(40)
    for b in range(3):
        store.ingest_batch(
            _df(spark, [(b * 10, _words(40, f"x{b}"))]),
            b,
            near_dup=True,
            threshold=0.5,
        )
    store.ingest_batch(_df(spark, [(50, base)]), 3, near_dup=True)
    store.compact(min_partitions=2)
    # a near-duplicate of batch 3's doc still collides via the folded
    # band partitions
    near = base.replace("w39", "changed")
    res = store.ingest_batch(
        _df(spark, [(60, near)]), 4, near_dup=True, threshold=0.5
    )
    assert res["n_accepted"] == 0 and res["n_near_dups_known"] == 1


def test_reader_outliving_grace_retries_or_fails_actionably(spark, tmp_path):
    """The narrowed gc race, from the reader's side (round 9): a reader
    whose listing snapshot predates a fold holds the folded dirs' paths
    in its lazy plan; if gc reclaims them mid-execution the plan dies
    with a task-time FileNotFound. ``run_with_listing_retry`` must (a)
    recover exactly by re-listing — a fresh listing is post-fold
    consistent, same rows — and (b) when every rebuilt plan keeps dying,
    fail with a StaleListingError naming gc_grace_seconds instead of a
    raw executor stack. Unrelated failures must re-raise unchanged."""
    import shutil

    import pytest

    from land_registry_data_ingestion_spark.operators.compaction import (
        StaleListingError,
        run_with_listing_retry,
    )
    from land_registry_data_ingestion_spark.operators.corpus_store import (
        INDEX_SCHEMA,
    )

    index_dir = str(tmp_path / "idx")
    for b in range(3):
        spark.createDataFrame(
            [(f"fp{b}", b)], INDEX_SCHEMA
        ).write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={b}")
        )

    def build():
        names = live_partitions(index_dir)
        return spark.read.schema(INDEX_SCHEMA).parquet(
            *[os.path.join(index_dir, n) for n in names]
        )

    # A stale plan: listing snapshot taken BEFORE batch=2 vanishes
    # (standing in for a fold + gc that outran this reader's execution).
    stale = build()
    shutil.rmtree(os.path.join(index_dir, "batch=2"))
    with pytest.raises(Exception, match="not exist|FileNotFound|FILE_NOT"):
        stale.count()  # the unprotected reader crashes — the raw race

    calls = {"n": 0}

    def build_first_stale():
        calls["n"] += 1
        return stale if calls["n"] == 1 else build()

    # (a) recovery: attempt 1 executes the stale plan and dies on the
    # vanished dir; attempt 2 re-lists and reads the surviving rows.
    got = run_with_listing_retry(build_first_stale, lambda df: df.count())
    assert got == 2 and calls["n"] == 2

    # (b) exhaustion: every rebuilt plan still references a vanished dir
    # (simulates executions that always outlive the grace window) —
    # actionable error naming the config, chained to the real failure.
    with pytest.raises(StaleListingError, match="gc_grace_seconds") as ei:
        run_with_listing_retry(lambda: stale, lambda df: df.count())
    assert ei.value.__cause__ is not None

    # (c) foreign failures pass through untouched
    with pytest.raises(ValueError, match="boom"):
        run_with_listing_retry(
            build, lambda df: (_ for _ in ()).throw(ValueError("boom"))
        )


def test_store_level_reads_survive_midplan_vanish(spark, tmp_path):
    """Round-10 (r9 verdict #6): the gc-race recovery must be reachable
    from the STORES themselves — ``CorpusStore.index_with_retry`` /
    ``SpanStore.index_with_retry`` — so a caller gets it without
    importing compaction internals. A partition vanishing between the
    plan's listing and its execution (standing in for a concurrent
    fold + gc) must be survived by re-listing and re-running."""
    import shutil

    store = CorpusStore(spark, str(tmp_path / "cs"))
    for b in range(3):
        store.ingest_batch(
            _df(spark, [(b, f"unique text number {b} for batch")]), b
        )

    calls = {"n": 0}
    victim = os.path.join(store._index_dir, "batch=2")

    def action(df):
        calls["n"] += 1
        if calls["n"] == 1:
            # the plan listed batch=2 at build time; reclaim it before
            # execution — the unprotected reader would die task-time
            shutil.rmtree(victim)
        return df.count()

    assert store.index_with_retry(action) == 2
    assert calls["n"] == 2, "attempt 1 died on the vanished dir, attempt 2 re-listed"

    sstore = SpanStore(spark=spark, root=str(tmp_path / "ss"), k=4)
    for b in range(3):
        sstore.ingest_batch(
            _df(spark, [(b, _words(12, f"b{b}"))]), b
        )
    scalls = {"n": 0}
    svictim = os.path.join(sstore._index_dir, "batch=2")

    def saction(df):
        scalls["n"] += 1
        if scalls["n"] == 1:
            shutil.rmtree(svictim)
        return df.count()

    assert sstore.index_with_retry(saction) >= 0
    assert scalls["n"] == 2


def test_listing_retry_names_misconfigured_root(spark):
    """PATH_NOT_FOUND-style markers also fire on a path that never
    existed; with ``root`` passed, the terminal error must say
    "misconfigured path", not blame gc_grace_seconds for a dir that was
    never there (round-9 review)."""
    import pytest

    from land_registry_data_ingestion_spark.operators.compaction import (
        StaleListingError,
        run_with_listing_retry,
    )

    missing = "/tmp/lrdi_never_existed_store_xyz"

    def build():
        raise RuntimeError(f"[PATH_NOT_FOUND] Path does not exist: {missing}")

    with pytest.raises(FileNotFoundError, match="misconfigured path"):
        run_with_listing_retry(build, lambda df: df, root=missing)

    # without root the behavior is unchanged: StaleListingError names
    # the grace knob (the reader cannot tell the two cases apart)
    with pytest.raises(StaleListingError, match="gc_grace_seconds"):
        run_with_listing_retry(build, lambda df: df)
