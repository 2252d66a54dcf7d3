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
  planning — they are garbage-collected at the START of the next
  compaction call (one-cycle grace period). The tag is a digest of the
  folded set, so a crashed-and-retried compaction is idempotent.

The fold itself is store-specific (gram counts re-aggregate; fingerprint
and band rows just rewrite into fewer files), passed as ``transform``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame


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


def compact(
    spark,
    index_dir: str,
    read: Callable[[list[str]], DataFrame],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    exclude_batch: int | str | None = None,
    min_partitions: int = 32,
    target_files: int | None = None,
) -> str | None:
    """Fold the live partitions of ``index_dir`` into one
    ``batch=compact-<tag>`` partition. No-op (returns None) below
    ``min_partitions`` live partitions — the caller can invoke this
    every batch and pay the O(index) rewrite only 1/min_partitions of
    the time. ``read`` maps partition PATHS to a DataFrame (the store
    knows its schema); ``transform`` re-aggregates if the store's rows
    are additive. Returns the new partition name, or None."""
    live = live_partitions(index_dir, exclude_batch)
    # gc: folded dirs a previous crash left behind are invisible to
    # readers but still occupy the listing — remove them first.
    all_names = {
        d for d in os.listdir(index_dir) if d.startswith("batch=")
    } if os.path.isdir(index_dir) else set()
    excluded = {f"batch={exclude_batch}"} if exclude_batch is not None else set()
    for leftover in all_names - set(live) - excluded:
        shutil.rmtree(os.path.join(index_dir, leftover), ignore_errors=True)
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
    # Deletion of the folded dirs is DEFERRED to the next call's gc
    # (they are invisible to any reader that can see ``_folded.json``,
    # so only the listing count pays for them). Deleting here would race
    # a concurrent reader that took its listing snapshot just BEFORE the
    # rename: that reader's plan holds the folded dirs' paths, and
    # Spark's lazy execution reads the files after planning — immediate
    # deletion turns that interleaving into task-time
    # FileNotFoundExceptions. With the one-cycle grace period such a
    # reader finishes against the intact pre-fold state; correctness is
    # two-sided either way (a pre-rename snapshot sees exactly the
    # folded dirs, a post-rename snapshot sees exactly the compact dir —
    # never both, because the compact dir and its ``_folded.json``
    # appear in one atomic rename).
    return dest_name
