"""Self-describing compaction for batch-addressed store partitions.

The incremental stores (`corpus_store.CorpusStore`, `span_store.SpanStore`)
keep one directory per accepted batch (``<index>/batch=<id>/``) so that a
replayed batch overwrites ITSELF — the exactly-once discipline shared
with the streaming sinks. The cost of that address scheme is partition
count: every probe re-lists and re-plans O(B) directories after B
batches, and a long-lived stream (the 100-micro-batch soak,
``scripts/soak_streams.py``) shows the per-batch wall time creeping up
with it. At 100 TB a store ingesting thousands of crawl batches would
spend more time planning tiny parquet reads than probing.

Compaction folds committed partitions into one, without breaking either
store invariant:

- **Replay safety.** A batch that may still be replayed (the one whose
  checkpoint commit hasn't landed — always the CURRENT batch, never an
  earlier one) must keep its own addressable partition, or a replay
  would probe against its previous attempt's rows folded into the base
  and then double-land them. Callers therefore pass ``exclude_batch``;
  the stream sinks compact at the top of each ``foreachBatch`` with the
  in-flight batch excluded, at which point every other partition is
  checkpoint-committed by construction.
- **Crash safety, without a manifest.** The compacted partition is
  written under a dot-prefixed temp name (invisible to the ``batch=``
  listing), a ``_folded.json`` naming every folded partition is placed
  inside it, and the directory is atomically renamed to
  ``batch=compact-<tag>``. Readers treat a partition named in any live
  ``_folded.json`` as subsumed, so one listing snapshot can never plan
  both the compact dir and a subsumed dir. Folded dirs are NOT deleted
  by the fold itself — a reader whose listing snapshot predates the
  rename still holds their paths, and Spark reads files lazily after
  planning — they are garbage-collected by a LATER compaction call,
  and only once the fold that subsumed them is at least
  ``gc_grace_seconds`` old (the streaming sinks call ``compact`` every
  micro-batch, so "next call" alone can be seconds away — an AGE gate,
  not a call-count gate, is what actually bounds the reader race; see
  the gc comment in :func:`compact` for what the bound does and does
  not guarantee). The tag is a digest of the folded set, so a
  crashed-and-retried compaction is idempotent.

The fold itself is store-specific (gram counts re-aggregate; fingerprint
and band rows just rewrite into fewer files), passed as ``transform``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame


class StaleListingError(RuntimeError):
    """A store read failed repeatedly because files vanished under its
    plan — a reader outlived compaction's gc grace window. Raised by
    :func:`run_with_listing_retry` once its re-list attempts are
    exhausted; the message names the knob (``gc_grace_seconds``)."""


# Task-time signatures of "a file the plan listed is gone" across the
# layers a vanished parquet dir surfaces through (JVM FileNotFound /
# Spark's error classes / Hadoop listing). Deliberately narrow: any
# other failure re-raises unchanged — retrying, say, a corrupt-footer
# error would just mask it.
_VANISHED_FILE_MARKERS = (
    "FileNotFoundException",
    "FILE_NOT_EXIST",
    "FILE_NOT_FOUND",
    "PATH_NOT_FOUND",
    "does not exist",
)


def _is_vanished_file_error(exc: BaseException) -> bool:
    seen: list[str] = []
    e: BaseException | None = exc
    while e is not None and len(seen) < 8:
        seen.append(str(e))
        e = e.__cause__ or e.__context__
    text = "\n".join(seen)
    return any(m in text for m in _VANISHED_FILE_MARKERS)


def run_with_listing_retry(
    build,
    action,
    attempts: int = 2,
    what: str = "store read",
    root: str | None = None,
):
    """Execute ``action(build())`` where ``build`` constructs a DataFrame
    from a FRESH partition listing (e.g. ``CorpusStore.index`` /
    ``SpanStore.index``) and ``action`` runs it.

    This is the documented reader-side answer to the gc race
    :func:`compact` narrows but cannot eliminate: a reader whose listing
    snapshot predates a fold holds the folded dirs' paths in its lazy
    plan, and if that plan is still executing ``gc_grace_seconds`` after
    the fold, the gc may reclaim the dirs underneath it — surfacing as a
    task-time FileNotFoundException. Because ``_folded.json`` appears in
    the same atomic rename as the compact dir, simply RE-LISTING yields
    a consistent post-fold view (the compact dir, never both), so the
    retry is semantically exact — the re-built plan reads the same rows.

    Only vanished-file failures are retried; everything else re-raises
    unchanged. After ``attempts`` failures raises
    :class:`StaleListingError` naming ``gc_grace_seconds`` — at that
    point single executions are outliving the grace window and the knob,
    not the retry count, is what needs raising.

    Caveat on the marker match: PATH_NOT_FOUND / "does not exist" also
    fire on a plain misconfigured path (a dir that never existed), which
    is indistinguishable from a reclaimed dir by the error text alone.
    Pass ``root`` (the store's root directory) so the terminal error can
    tell the two apart: a root that is itself missing is a
    configuration error, not a gc race (round-9 review)."""
    last: BaseException | None = None
    for _ in range(max(1, attempts)):
        try:
            return action(build())
        except Exception as e:
            if not _is_vanished_file_error(e):
                raise
            last = e
    if root is not None and not os.path.isdir(root):
        raise FileNotFoundError(
            f"{what}: store root does not exist: {root!r} — this is a "
            f"misconfigured path, not a compaction race; no amount of "
            f"gc_grace_seconds will help."
        ) from last
    raise StaleListingError(
        f"{what} failed {attempts}x with files vanishing under its plan: "
        f"each rebuilt plan outlived compaction's gc grace window. Raise "
        f"gc_grace_seconds on compact() (default 300 s) above your "
        f"longest reader, or pause compaction while ad-hoc readers run. "
        f"(If the store path might simply be wrong, verify it exists — "
        f"a never-existed path surfaces with these same error markers.)"
    ) from last


def live_partitions(index_dir: str, exclude_batch: int | str | None = None) -> list[str]:
    """Names of the partitions a reader should scan: every ``batch=*``
    dir that is not named in a live compact partition's ``_folded.json``
    and is not the excluded (possibly in-flight) batch."""
    if not os.path.isdir(index_dir):
        return []
    names = [
        d for d in sorted(os.listdir(index_dir)) if d.startswith("batch=")
    ]
    folded: set[str] = set()
    for d in names:
        fj = os.path.join(index_dir, d, "_folded.json")
        if os.path.isfile(fj):
            with open(fj) as fh:
                folded.update(json.load(fh))
    return [
        d
        for d in names
        if d not in folded and d != f"batch={exclude_batch}"
    ]


def _fold_times(index_dir: str) -> dict[str, float]:
    """Folded partition name -> mtime of the newest ``_folded.json``
    naming it — i.e. when the fold that subsumed it landed (the atomic
    rename carries the file's mtime). The gc's age gate reads this."""
    times: dict[str, float] = {}
    if not os.path.isdir(index_dir):
        return times
    for d in os.listdir(index_dir):
        if not d.startswith("batch="):
            continue
        fj = os.path.join(index_dir, d, "_folded.json")
        if not os.path.isfile(fj):
            continue
        mt = os.path.getmtime(fj)
        with open(fj) as fh:
            for name in json.load(fh):
                times[name] = max(times.get(name, 0.0), mt)
    return times


def compact(
    spark,
    index_dir: str,
    read: Callable[[list[str]], DataFrame],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    exclude_batch: int | str | None = None,
    min_partitions: int = 32,
    target_files: int | None = None,
    gc_grace_seconds: float = 300.0,
) -> str | None:
    """Fold the live partitions of ``index_dir`` into one
    ``batch=compact-<tag>`` partition. No-op (returns None) below
    ``min_partitions`` live partitions — the caller can invoke this
    every batch and pay the O(index) rewrite only 1/min_partitions of
    the time. ``read`` maps partition PATHS to a DataFrame (the store
    knows its schema); ``transform`` re-aggregates if the store's rows
    are additive. Returns the new partition name, or None.

    ``gc_grace_seconds``: a folded dir is physically deleted only once
    the fold that subsumed it is at least this old. The window it
    protects: a reader takes its listing snapshot just BEFORE the fold's
    rename, so its lazy plan holds the folded dirs' paths, and Spark
    reads the files only when the plan executes — deleting underneath
    it raises task-time FileNotFoundException. The age gate narrows
    that race to readers whose plan is still executing
    ``gc_grace_seconds`` after the fold; it does NOT eliminate it —
    there is no reader registry, so a sufficiently slow reader (one
    whose single plan outlives the grace period) can still crash. 300 s
    covers any realistic store probe by orders of magnitude; raise it
    for ad-hoc analytical readers, or set 0 to reclaim space eagerly
    when no concurrent readers exist (tests, offline rebuilds). Readers
    that may outlive the window have a documented recovery:
    :func:`run_with_listing_retry` re-lists and re-runs on a vanished
    file (exact — a fresh listing is always post-fold consistent) and
    fails with an actionable :class:`StaleListingError` naming this
    knob when retries are exhausted; the stores expose it directly as
    ``CorpusStore.index_with_retry`` / ``CorpusStore.bands_with_retry``
    / ``SpanStore.index_with_retry``, so callers never need this
    module's internals (round 10).
    Correctness is unaffected either way: a pre-rename snapshot plans
    exactly the folded dirs, a post-rename snapshot plans exactly the
    compact dir — never both, because the compact dir and its
    ``_folded.json`` appear in one atomic rename."""
    live = live_partitions(index_dir, exclude_batch)
    # gc: folded dirs (and dirs a previous crash left behind) are
    # invisible to readers but still occupy the listing — remove those
    # old enough that no reader planned against them recently. Deletion
    # never outruns subsumption: a compact dir that was itself folded
    # later is removed only AFTER everything its own ``_folded.json``
    # names is gone — deleting it first would un-subsume those dirs for
    # the duration of the gc pass (and, if the pass crashed mid-way,
    # until the next one), double-counting their rows against the
    # newer compact partition that carries them.
    all_names = {
        d for d in os.listdir(index_dir) if d.startswith("batch=")
    } if os.path.isdir(index_dir) else set()
    excluded = {f"batch={exclude_batch}"} if exclude_batch is not None else set()
    fold_times = _fold_times(index_dir)
    now = time.time()
    present = set(all_names)
    removable = all_names - set(live) - excluded
    progress = True
    while progress:
        progress = False
        for leftover in sorted(removable & present):
            # unknown fold time (no surviving _folded.json names it —
            # an anomaly) → treat as just-folded, never reclaim early
            if now - fold_times.get(leftover, now) < gc_grace_seconds:
                continue
            fj = os.path.join(index_dir, leftover, "_folded.json")
            if os.path.isfile(fj):
                with open(fj) as fh:
                    if any(n in present for n in json.load(fh)):
                        continue  # still subsuming something on disk
            shutil.rmtree(
                os.path.join(index_dir, leftover), ignore_errors=True
            )
            present.discard(leftover)
            progress = True
    # A fold that crashed between the parquet write and the atomic rename
    # leaves its dot-prefixed temp dir behind; if the live set has changed
    # since, its tag never recurs and nothing would ever reclaim it.
    # Temp dirs are invisible to readers (the ``batch=`` listing skips
    # them), so age alone gates the sweep — mtime moves while a write is
    # in progress, keeping an in-flight fold's temp out of reach.
    for stale in (
        d
        for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
        if d.startswith(".tmp-compact-")
    ):
        path = os.path.join(index_dir, stale)
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue
        if age >= gc_grace_seconds:
            shutil.rmtree(path, ignore_errors=True)
    if len(live) < min_partitions:
        return None

    tag = hashlib.sha256("\n".join(live).encode()).hexdigest()[:12]
    dest_name = f"batch=compact-{tag}"
    dest = os.path.join(index_dir, dest_name)
    if not os.path.isdir(dest):
        df = read([os.path.join(index_dir, d) for d in live])
        if transform is not None:
            df = transform(df)
        if target_files is None:
            target_files = max(
                2, spark.sparkContext.defaultParallelism // 4
            )
        tmp = os.path.join(index_dir, f".tmp-compact-{tag}")
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_folded.json"), "w") as fh:
            json.dump(live, fh)
        os.rename(tmp, dest)
    # Deletion of the folded dirs is DEFERRED to a later call's gc, and
    # only after ``gc_grace_seconds`` (they are invisible to any reader
    # that can see ``_folded.json``, so only the listing count pays for
    # them until then) — see the gc comment above for the exact
    # guarantee and its limit.
    return dest_name
