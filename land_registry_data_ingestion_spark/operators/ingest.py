"""The ingestion pipeline (SURVEY §3.1) as a deterministic Spark DAG.

The reference runs this as six Kafka-connected microservices mutating a
shared file-log row (downloader → data-decision → archiver/GC → db-upload →
merge). Here the same stages are pure functions over two kinds of state:

- **snapshot state**: immutable parquet directory per accepted file,
  addressed by content hash (``state/run=<sha12>/``). "Current" is a
  pointer resolved from the file-log — pointer-flip is atomic, so there is
  no overwrite window (the reference's ``if_exists='replace'`` has one).
- **file_log**: an append-only parquet ledger, one row per pipeline run
  (the reference's mutable ``PP*DownloadFileLog`` rows become immutable
  events; "latest" is a ``max_by`` over run timestamps — SURVEY W3).

Stage semantics preserved from the reference:
- sha256 content hash decides archive vs garbage_collect: equal to the
  previous accepted hash → the whole pipeline short-circuits
  (``land_registry_pp_complete_data_decision.py:143-174``);
- re-running a run is idempotent: state dirs are content-addressed and the
  decision consults the ledger, so a replay cannot double-apply
  (the reference enforces this with write-once asserts, :562-570);
- monthly updates CDC-merge into the current snapshot and append the
  17-counter operation ledger (§3.2, A8).
"""

from __future__ import annotations

import datetime
import hashlib
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark.sql import Observation

from land_registry_data_ingestion_spark.operators.merge import (
    cdc_merge,
    init_state,
    merge_outcome_stats,
    validate_unique,
)
from land_registry_data_ingestion_spark.sources.csv import (
    read_price_paid_csv,
    read_price_paid_csv_with_rejects,
)

FILE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("source_path", T.StringType(), False),
        T.StructField("file_kind", T.StringType(), False),  # complete|monthly
        T.StructField("sha256", T.StringType(), False),
        T.StructField("decision", T.StringType(), False),  # archive|garbage_collect
        T.StructField("row_count", T.LongType(), True),
        T.StructField("state_location", T.StringType(), True),
        T.StructField("run_datetime", T.TimestampType(), False),
    ]
)


@dataclass
class IngestStore:
    """Filesystem layout: ``root/state/run=<sha12>/`` + ``root/file_log/``.

    State directories are written partitioned by ``data_year`` (derived
    from ``transaction_date`` at write time, SURVEY §4.1): year-ranged
    queries then prune partitions at the scan, and at 100 TB each yearly
    partition stays an independently-sized write unit. Set
    ``partition_cols=()`` to disable (tiny test fixtures)."""

    spark: SparkSession
    root: str
    partition_cols: tuple[str, ...] = ("data_year",)

    @property
    def file_log_path(self) -> str:
        return os.path.join(self.root, "file_log")

    def state_path(self, sha: str) -> str:
        return os.path.join(self.root, "state", f"run={sha[:12]}")

    # -- ledger ---------------------------------------------------------

    def file_log(self) -> DataFrame:
        # Only the missing-path case (first run) yields an empty ledger;
        # any other read failure (corrupt footer, permissions) must
        # propagate — swallowing it would silently flip last_accepted()
        # to None and re-ingest instead of failing the run.
        if not os.path.isdir(self.file_log_path):
            return self.spark.createDataFrame([], FILE_LOG_SCHEMA)
        return self.spark.read.schema(FILE_LOG_SCHEMA).parquet(self.file_log_path)

    def _append_log(self, row: dict) -> None:
        self.spark.createDataFrame([row], FILE_LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.file_log_path)

    def operation_log(self) -> DataFrame:
        """Per-run merge-outcome stats, deduplicated by (run_id, outcome).

        Merge effects are three non-atomic writes ordered state →
        operation_log → ledger. A crash between the last two leaves the
        run unrecorded in the ledger, so the replay re-runs the merge —
        state converges (the location is token-addressed and overwritten
        bit-identically) but the stats rows append a second time. The
        replayed rows are exact duplicates (same batch vs the same
        converged state), so read-side dedup restores exactly-once
        semantics without a distributed transaction."""
        path = os.path.join(self.root, "operation_log")
        if not os.path.isdir(path):
            schema = "record_op string, outcome string, n_rows bigint, run_id string"
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path).dropDuplicates(
            ["run_id", "record_op", "outcome"]
        )

    def compact_file_log(self) -> int:
        """Ledger maintenance: every run appends one tiny ``coalesce(1)``
        parquet file to ``file_log/``; at daily cadence that is 365 small
        files a year, all scanned by every ``last_accepted()`` call.
        Rewrites the ledger as a single file via staging-dir swap (write
        next to the live dir, two renames, remove the old) so a crash at
        any point leaves either the old or the new complete ledger on
        disk. Returns the number of ledger rows carried over.

        The reference has no analogue — its ledger is mutable DB rows —
        but at parquet-ledger cadence this is the same maintenance Delta/
        Iceberg call checkpoint/rewrite-manifests."""
        if not os.path.isdir(self.file_log_path):
            return 0
        tmp = self.file_log_path + ".compacting"
        old = self.file_log_path + ".old"
        for stale in (tmp, old):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        df = self.spark.read.schema(FILE_LOG_SCHEMA).parquet(self.file_log_path)
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n_rows")).coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        os.rename(self.file_log_path, old)
        os.rename(tmp, self.file_log_path)
        shutil.rmtree(old)
        return int(obs.get["n_rows"])

    def maybe_compact_file_log(self, max_files: int = 64) -> bool:
        """Compact when the ledger dir has fragmented past ``max_files``
        parquet parts — an O(listdir) probe, so callers can run it every
        cycle. Returns True when a compaction ran."""
        if not os.path.isdir(self.file_log_path):
            return False
        n = sum(
            1
            for f in os.listdir(self.file_log_path)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        if n <= max_files:
            return False
        self.compact_file_log()
        return True

    def last_accepted(self) -> dict | None:
        """Latest archive-decision row (W3: max_by over the ledger)."""
        rows = (
            self.file_log()
            .filter(F.col("decision") == "archive")
            .orderBy(F.desc("run_datetime"), F.desc("run_id"))
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def current_state(self) -> DataFrame:
        last = self.last_accepted()
        if last is None:
            raise FileNotFoundError("no accepted snapshot in the ledger yet")
        df = self.spark.read.parquet(last["state_location"])
        # partition columns are write-time derivations, not state
        return df.drop(*[c for c in self.partition_cols if c in df.columns])

    def read_state_at(self, location: str) -> DataFrame:
        """State rows at a state_location — including one written but not
        yet committed to the ledger (the snapshot gate probes it)."""
        return self.spark.read.parquet(location)

    def discard_state_at(self, location: str) -> None:
        """Best-effort removal of an UNCOMMITTED state write (the gate's
        failure path). Never call on a ledger-referenced location."""
        shutil.rmtree(location, ignore_errors=True)

    def write_state(self, state: DataFrame, location: str) -> int:
        """Overwrite a content-addressed state dir, partitioned for pruning;
        returns the written row count.

        ``data_year`` is (re)derived from ``transaction_date`` on every
        write — a CDC change that moves a row's transaction date moves the
        row to the right partition instead of stranding it. The row count
        comes from ``df.observe()`` metrics captured DURING the write —
        the earlier read-back ``count()`` was a second full scan of the
        state table per run, just for a ledger field."""
        cols = self.partition_cols
        if "data_year" in cols and "transaction_date" in state.columns:
            state = state.withColumn("data_year", F.year("transaction_date"))
        cols = tuple(c for c in cols if c in state.columns)
        obs = Observation()
        writer = state.observe(obs, F.count(F.lit(1)).alias("n_rows")).write.mode(
            "overwrite"
        )
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(location)
        n = int(obs.get["n_rows"] or 0)
        if n == 0 and cols:
            # A dynamic-partitioned write of ZERO rows emits no files at
            # all — not even a schema footer — leaving an unreadable
            # state dir. Re-write non-partitioned: Spark persists a
            # metadata-only file for an empty frame, so an accepted
            # empty snapshot stays a readable (zero-row) state.
            state.limit(0).write.mode("overwrite").parquet(location)
        return n

    # -- merge hooks (overridden by ManifestStore for incremental writes) --

    def current_for_merge(self, updates: DataFrame, key_col: str):
        """State to feed ``cdc_merge`` plus opaque carry-over info.

        The base store merges against the FULL current state and carries
        nothing; :class:`~..operators.state.ManifestStore` restricts to the
        partitions the batch can touch and carries the rest by reference."""
        return self.current_state(), None

    def write_merged(self, new_state: DataFrame, location: str, carry) -> int:
        """Persist a merged state; returns the total row count."""
        return self.write_state(new_state, location)


def sha256_of_file(path: str, chunk: int = 1 << 20) -> str:
    """F1: content hash of a staged file (driver-side, streamed — the file
    was just fetched by the driver; row-level hashing uses F.sha2)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def ingest_snapshot(
    store: IngestStore,
    csv_path: str,
    run_id: str,
    n_columns: int = 16,
    now: datetime.datetime | None = None,
    strict: bool = True,
) -> dict:
    """Full-snapshot ingestion: hash → dedup decision → load → ledger.

    Returns the appended file-log row (with ``decision``).
    """
    now = now or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    sha = sha256_of_file(csv_path)
    last = store.last_accepted()

    if last is not None and last["sha256"] == sha:
        row = {
            "run_id": run_id,
            "source_path": csv_path,
            "file_kind": "complete",
            "sha256": sha,
            "decision": "garbage_collect",
            "row_count": None,
            "state_location": None,
            "run_datetime": now,
        }
        store._append_log(row)
        return row

    # Single-parse load (round 4): the snapshot is the one input big
    # enough that a separate gate pass matters (at 100 TB a second CSV
    # parse is hours), so the gate invariants ride the STATE WRITE as
    # observed metrics and are validated BEFORE the ledger append — which
    # is the commit point: a violated invariant deletes the orphan state
    # dir and raises, and since readers resolve state through the ledger
    # pointer, the partial write was never visible. Monthly batches keep
    # the up-front ``_gate_batch`` (they are small; failing before any
    # work is the better trade there).
    key = "transaction_unique_id"
    df = read_price_paid_csv(store.spark, csv_path, n_columns=n_columns)
    gate_obs = Observation()
    gate_aggs = [
        F.sum(
            (F.col("price").isNull() | F.col("transaction_date").isNull())
            .cast("long")
        ).alias("n_bad")
    ]
    df = df.observe(gate_obs, *gate_aggs)
    state = init_state(df.drop("record_op"), batch_timestamp=F.lit(now))
    location = store.state_path(sha)
    row_count = store.write_state(state, location)

    # `or 0`: F.sum over a ZERO-ROW snapshot yields NULL — an empty file
    # is gate-clean (the reference accepts it too), not a TypeError.
    if strict and int(gate_obs.get["n_bad"] or 0):
        store.discard_state_at(location)
        # failure path only: re-parse for the quarantine sample
        _, rejects = read_price_paid_csv_with_rejects(
            store.spark, csv_path, n_columns=n_columns
        )
        bad = rejects.limit(5).collect()
        sample = ", ".join(
            f"{r['transaction_unique_id']}({r['reject_reason']})" for r in bad
        ) or "all-null after cast: grammar-broken or missing fields"
        raise ValueError(
            f"malformed values in {csv_path} (e.g. {sample}) — batch "
            f"rejected before any state was committed"
        )
    # Key uniqueness probes the WRITTEN parquet: one dictionary-encoded
    # column scan instead of a second CSV parse — the check the reference
    # enforces by `.one()` crashing mid-load. Two-tier: the happy path
    # distinct-counts 8-byte key HASHES (distinct hashes < rows implies a
    # possible duplicate OR a hash collision, never the reverse — a real
    # duplicate can't hide), and only that rare suspicion pays the exact
    # string-keyed confirm. At reference scale the hash pass shuffles
    # ~7× less than distinct-counting the 56-char keys directly.
    written = store.read_state_at(location)
    n_hashed = written.agg(
        F.count_distinct(F.xxhash64(F.col(key))).alias("n")
    ).collect()[0]["n"]
    if n_hashed < row_count:
        n_keys = written.agg(
            F.count_distinct(F.col(key)).alias("n")
        ).collect()[0]["n"]
        if n_keys < row_count:
            dups = validate_unique(written, key).limit(5).collect()
            store.discard_state_at(location)
            sample = ", ".join(str(r[key]) for r in dups)
            raise ValueError(
                f"duplicate {key} in snapshot file (e.g. {sample}) — "
                f"refusing to merge; the full-outer join would fan out"
            )

    row = {
        "run_id": run_id,
        "source_path": csv_path,
        "file_kind": "complete",
        "sha256": sha,
        "decision": "archive",
        "row_count": row_count,
        "state_location": location,
        "run_datetime": now,
    }
    store._append_log(row)
    return row


def _assert_unique(df: DataFrame, key_col: str, what: str) -> None:
    """Standalone uniqueness probe for frames of untrusted provenance
    (``validate_current=True``); batch files get the fused gate below."""
    dups = validate_unique(df, key_col).limit(5).collect()
    if dups:
        sample = ", ".join(str(r[key_col]) for r in dups)
        raise ValueError(
            f"duplicate {key_col} in {what} (e.g. {sample}) — "
            f"refusing to merge; the full-outer join would fan out"
        )


def _gate_batch(
    store: IngestStore, csv_path: str, n_columns: int, strict: bool, what: str
) -> DataFrame:
    """Read the staged file and enforce every batch invariant in ONE
    aggregate pass over one parse:

    - ``strict`` (default): no row's price/date failed its cast — the
      reference crashes on such rows (DB constraint); this engine refuses
      with samples instead of silently nulling values into state;
    - ≤1 row per business key — the invariant the reference enforces via
      ``.one()`` crashing; a duplicate would fan out the merge join.

    Both checks collapse into a single scan-wide aggregate (count /
    count_distinct / conditional counts — partial-aggregated, so the
    shuffle is one row per task, unlike the groupBy-on-key probe this
    replaces). The happy path therefore costs exactly two parses of the
    staged CSV per run: this gate and the state write. Sample rows for
    the error message are fetched by a targeted query only on the
    failure path."""
    key = "transaction_unique_id"
    df, rejects = read_price_paid_csv_with_rejects(
        store.spark, csv_path, n_columns=n_columns
    )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(key)).alias("n_keys"),
    ]
    if strict:
        aggs.append(
            F.sum(
                (F.col("price").isNull() | F.col("transaction_date").isNull())
                .cast("long")
            ).alias("n_bad")
        )
    g = df.agg(*aggs).collect()[0]
    if strict and g["n_bad"]:
        bad = rejects.limit(5).collect()  # failure path only
        sample = ", ".join(
            f"{r['transaction_unique_id']}({r['reject_reason']})" for r in bad
        ) or "all-null after cast: grammar-broken or missing fields"
        raise ValueError(
            f"malformed values in {csv_path} (e.g. {sample}) — batch "
            f"rejected before any state was written"
        )
    if g["n_keys"] < g["n_rows"]:
        dups = validate_unique(df, key).limit(5).collect()  # failure path only
        sample = ", ".join(str(r[key]) for r in dups)
        raise ValueError(
            f"duplicate {key} in {what} (e.g. {sample}) — "
            f"refusing to merge; the full-outer join would fan out"
        )
    return df


def ingest_monthly_update(
    store: IngestStore,
    csv_path: str,
    run_id: str,
    n_columns: int = 16,
    now: datetime.datetime | None = None,
    validate_current: bool = False,
    strict: bool = True,
) -> dict:
    """Incremental A/C/D ingestion: CDC-merge into the current snapshot,
    write a new content-addressed state, append ledger + outcome counters.

    Invariant gates (the reference crashes via ``.one()``; here the run
    fails with an actionable error BEFORE any state is written):

    - the update batch must have ≤1 row per key — probed every run (the
      batch is small, the probe is one aggregate over it);
    - the batch must contain only A/C/D ops — detected from the outcome
      counters (reference RuntimeError, database_updater.py:1011-1013);
    - the current state is unique *by induction*: validated when the
      snapshot was loaded (``ingest_snapshot``) and preserved by the
      merge (one output row per key). ``validate_current=True`` adds an
      explicit probe for state dirs of untrusted provenance — at 100 TB
      that is a full shuffle of the key column, which is why it is not
      the default.
    """
    now = now or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    sha = sha256_of_file(csv_path)
    last = store.last_accepted()
    if last is not None and last["sha256"] == sha:
        row = {
            "run_id": run_id,
            "source_path": csv_path,
            "file_kind": "monthly",
            "sha256": sha,
            "decision": "garbage_collect",
            "row_count": None,
            "state_location": None,
            "run_datetime": now,
        }
        store._append_log(row)
        return row

    updates = _gate_batch(
        store, csv_path, n_columns, strict, "monthly update batch"
    )
    return merge_update_frame(
        store,
        updates,
        run_id=run_id,
        now=now,
        source="monthly",
        token=sha,
        source_path=csv_path,
        validate_batch=False,  # _gate_batch above already probed the key
        validate_current=validate_current,
    )


def merge_update_frame(
    store: IngestStore,
    updates: DataFrame,
    run_id: str,
    key_col: str = "transaction_unique_id",
    op_col: str = "record_op",
    now: datetime.datetime | None = None,
    source: str = "stream",
    token: str | None = None,
    source_path: str | None = None,
    validate_batch: bool = True,
    validate_current: bool = False,
) -> dict:
    """CDC-merge an already-typed A/C/D update FRAME into the store — the
    frame-level core of :func:`ingest_monthly_update`, shared by the
    streaming sink (`streaming/cdc_sink.py`), where batches arrive as
    DataFrames with no file to sha.

    Exactly-once by ``run_id``: if the ledger already holds an accepted
    run with this id the call is a no-op returning that row — Structured
    Streaming replays the last micro-batch after a crash, and this is
    the idempotence check that turns at-least-once delivery into an
    exactly-once effect (one ≤ledger-sized lookup, no state touched).
    """
    now = now or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    prior = (
        store.file_log()
        .filter((F.col("run_id") == run_id) & (F.col("decision") == "archive"))
        .limit(1)
        .collect()
    )
    if prior:
        return prior[0].asDict()

    if validate_batch:
        _assert_unique(updates, key_col, f"{source} update batch {run_id}")
    current, carry = store.current_for_merge(updates, key_col)
    if validate_current:
        _assert_unique(current, key_col, "current state")
    value_cols = [
        c
        for c in current.columns
        if c
        not in (
            key_col,
            "created_datetime",
            "updated_datetime",
            "deleted_datetime",
            "is_deleted",
        )
    ]
    result = cdc_merge(
        current,
        updates,
        key_col=key_col,
        value_cols=value_cols,
        op_col=op_col,
        batch_timestamp=F.lit(now),
    )
    stats_rows = merge_outcome_stats(result.outcomes).collect()
    if any(r["outcome"] == "invalid_op" for r in stats_rows):
        bad = result.invalid_ops.limit(5).collect()
        sample = ", ".join(f"{r[key_col]}={r[op_col]!r}" for r in bad)
        raise ValueError(
            f"{source} batch {run_id} contains ops outside A/C/D "
            f"(e.g. {sample}) — batch rejected, state unchanged"
        )
    token = token or hashlib.sha256(run_id.encode()).hexdigest()
    location = store.state_path(token)
    row_count = store.write_merged(result.new_state, location, carry)
    store.spark.createDataFrame(
        stats_rows, merge_outcome_stats(result.outcomes).schema
    ).withColumn("run_id", F.lit(run_id)).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(store.root, "operation_log"))

    row = {
        "run_id": run_id,
        "source_path": source_path or f"{source}:{run_id}",
        "file_kind": "monthly",
        "sha256": token,
        "decision": "archive",
        "row_count": row_count,
        "state_location": location,
        "run_datetime": now,
    }
    store._append_log(row)
    store.maybe_compact_file_log()
    return row
