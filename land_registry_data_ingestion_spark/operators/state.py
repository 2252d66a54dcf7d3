"""Manifest-based incremental state store — the 100 TB path for S11 + CDC.

The plain :class:`~.ingest.IngestStore` rewrites the ENTIRE state
directory on every monthly merge. At the reference's 28.9M-row snapshot
that is ~83 s, almost all of it rewriting ``data_year`` partitions the
288k-row batch never touches; at 100 TB it is a full-table write per
small CDC batch. This store applies the table-format idea (Iceberg/Delta
snapshot reuse) with nothing but plain parquet plus one tiny file:

- each run writes ONLY the partitions its batch touches, under a
  content-addressed ``parts/run=<sha12>/data_year=YYYY/`` directory;
- a per-run **manifest** (parquet rows ``data_year, path, row_count``)
  maps every partition of that run's state to the run that last wrote
  it — unchanged partitions are carried by reference, never rewritten;
- "current" still resolves ledger → manifest → partition paths, and the
  manifest is written before the ledger row is appended, so the pointer
  flip stays atomic and replays stay idempotent (same guarantees as the
  base store, reference ``...data_decision.py:143-174`` semantics).

Touched partitions for an A/C/D batch are exactly:

- the years of the batch rows' ``transaction_date`` (insert target, and
  the year a changed row will land in), **union**
- the years currently holding any key in the batch (a C op can MOVE a
  row across years — the old year must drop it; a D op must rewrite the
  year that holds the doomed row).

Finding the second set is one column-pruned scan of
``(key, transaction_date)`` over the state with the (small) batch keys
broadcast — no shuffle of the state, no write. A per-partition key bloom
index is the next lever if even that scan hurts.

Merging only the touched partitions is sound because the CDC join is
keyed: a state row whose key is absent from the batch passes through
``cdc_merge`` unchanged, so restricting ``current`` to the partitions
above produces bit-identical merged rows AND identical outcome/ledger
counters to the full merge (parity-tested, including year-moving
changes, in ``tests/test_manifest_state.py``).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from land_registry_data_ingestion_spark.operators.ingest import IngestStore

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("data_year", T.IntegerType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("row_count", T.LongType(), False),
    ]
)

# Rows with NULL transaction_date get a concrete partition value so every
# state row lives in exactly one manifest entry.
NULL_YEAR = -1


def _year_col():
    return F.coalesce(F.year("transaction_date"), F.lit(NULL_YEAR))


@dataclass
class ManifestStore(IngestStore):
    """Drop-in replacement for ``IngestStore`` (same public surface, same
    ledger schema) whose monthly merge writes only touched partitions."""

    def state_path(self, sha: str) -> str:
        # The ledger's state_location points at the manifest, not a data dir.
        return os.path.join(self.root, "manifests", f"run={sha[:12]}")

    def _parts_dir(self, location: str) -> str:
        return os.path.join(self.root, "parts", os.path.basename(location))

    # -- manifest I/O ---------------------------------------------------

    def _manifest_entries(self, manifest_path: str) -> list[dict]:
        rows = (
            self.spark.read.schema(MANIFEST_SCHEMA)
            .parquet(manifest_path)
            .collect()
        )
        return sorted((r.asDict() for r in rows), key=lambda e: e["data_year"])

    def _write_manifest(self, manifest_path: str, entries: list[dict]) -> None:
        self.spark.createDataFrame(entries, MANIFEST_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(manifest_path)

    def _read_parts(self, paths: list[str]) -> DataFrame:
        # Leaf ``data_year=YYYY`` dirs: no partition-column inference, so
        # the frame carries exactly the state schema regardless of which
        # runs the paths belong to. mergeSchema: a column added by a later
        # merge exists only in partitions written since — carried-by-
        # reference older partitions must still surface it (as NULL), not
        # silently win the footer race.
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def _scan_part_counts(self, parts_dir: str) -> list[dict]:
        """Per-partition row counts of a freshly written parts dir — a
        zero-data-column aggregate, satisfied from parquet footers."""
        years = [
            d
            for d in os.listdir(parts_dir)
            if d.startswith("data_year=") and os.path.isdir(os.path.join(parts_dir, d))
        ]
        if not years:
            return []
        rows = (
            self.spark.read.parquet(parts_dir)
            .groupBy("data_year")
            .agg(F.count(F.lit(1)).alias("row_count"))
            .collect()
        )
        return [
            {
                "data_year": int(r["data_year"]),
                "path": os.path.join(parts_dir, f"data_year={int(r['data_year'])}"),
                "row_count": int(r["row_count"]),
            }
            for r in rows
        ]

    # -- state read/write ----------------------------------------------

    def current_state(self) -> DataFrame:
        last = self.last_accepted()
        if last is None:
            raise FileNotFoundError("no accepted snapshot in the ledger yet")
        entries = self._manifest_entries(last["state_location"])
        return self._read_parts([e["path"] for e in entries])

    def write_state(self, state: DataFrame, location: str) -> int:
        """Full write (snapshot load): every partition lands under this
        run's parts dir and the manifest references only this run."""
        parts_dir = self._parts_dir(location)
        state = state.withColumn("data_year", _year_col())
        obs = Observation()
        state.observe(obs, F.count(F.lit(1)).alias("n_rows")).write.mode(
            "overwrite"
        ).partitionBy("data_year").parquet(parts_dir)
        n = int(obs.get["n_rows"] or 0)
        if n == 0:
            # Zero rows → the partitioned write emitted no leaf dirs and
            # no schema footer. Persist one schema-only leaf (file schema
            # = state schema minus the partition column, like every other
            # leaf) so the manifest references a readable empty state.
            leaf = os.path.join(parts_dir, f"data_year={NULL_YEAR}")
            state.drop("data_year").limit(0).write.mode("overwrite").parquet(
                leaf
            )
            self._write_manifest(
                location,
                [{"data_year": NULL_YEAR, "path": leaf, "row_count": 0}],
            )
            return 0
        self._write_manifest(location, self._scan_part_counts(parts_dir))
        return n

    def read_state_at(self, location: str) -> DataFrame:
        entries = self._manifest_entries(location)
        return self._read_parts([e["path"] for e in entries])

    def discard_state_at(self, location: str) -> None:
        import shutil

        shutil.rmtree(self._parts_dir(location), ignore_errors=True)
        shutil.rmtree(location, ignore_errors=True)

    def current_for_merge(self, updates: DataFrame, key_col: str):
        last = self.last_accepted()
        if last is None:
            raise FileNotFoundError("no accepted snapshot in the ledger yet")
        entries = self._manifest_entries(last["state_location"])
        cur_all = self._read_parts([e["path"] for e in entries])

        upd_years = {
            r["y"]
            for r in updates.select(_year_col().alias("y")).distinct().collect()
        }
        keys = updates.select(key_col).distinct()
        old_years = {
            r["y"]
            for r in cur_all.join(F.broadcast(keys), key_col, "left_semi")
            .select(_year_col().alias("y"))
            .distinct()
            .collect()
        }
        touched = upd_years | old_years

        touched_entries = [e for e in entries if e["data_year"] in touched]
        carry = [e for e in entries if e["data_year"] not in touched]
        if touched_entries:
            current = self._read_parts([e["path"] for e in touched_entries])
        else:
            current = cur_all.filter(F.lit(False))
        return current, carry

    def write_merged(self, new_state: DataFrame, location: str, carry) -> int:
        parts_dir = self._parts_dir(location)
        new_state = new_state.withColumn("data_year", _year_col())
        obs = Observation()
        new_state.observe(obs, F.count(F.lit(1)).alias("n_rows")).write.mode(
            "overwrite"
        ).partitionBy("data_year").parquet(parts_dir)
        carry = list(carry or [])
        n = int(obs.get["n_rows"] or 0)
        if n == 0 and not carry:
            # Same degenerate shape as write_state's zero-row gate: an
            # empty merged state with nothing carried forward writes no
            # leaf dirs, and a manifest with zero entries would make
            # read_state_at call spark.read.parquet() with zero paths.
            # Reachable since empty snapshots became acceptable (empty
            # accepted state + a batch of all-invalid updates).
            leaf = os.path.join(parts_dir, f"data_year={NULL_YEAR}")
            new_state.drop("data_year").limit(0).write.mode(
                "overwrite"
            ).parquet(leaf)
            self._write_manifest(
                location,
                [{"data_year": NULL_YEAR, "path": leaf, "row_count": 0}],
            )
            return 0
        self._write_manifest(location, self._scan_part_counts(parts_dir) + carry)
        return n + sum(e["row_count"] for e in carry)

    # -- time travel ----------------------------------------------------

    def state_as_of(self, run_id: str) -> DataFrame:
        """Read the state exactly as accepted by ``run_id`` (snapshot
        isolation for free: manifests are immutable and partitions are
        content-addressed per run, so any un-vacuumed historical state is
        one manifest read away — the table-format time-travel idea).

        Complements ``operators/rewind.py`` (which reconstructs history
        from audit columns even under the rewrite store): this is an O(1)
        pointer lookup, that is an O(data) reconstruction."""
        rows = (
            self.file_log()
            .filter(
                (F.col("run_id") == run_id) & (F.col("decision") == "archive")
            )
            .limit(1)
            .collect()
        )
        if not rows:
            raise KeyError(f"no accepted run {run_id!r} in the ledger")
        entries = self._manifest_entries(rows[0]["state_location"])
        return self._read_parts([e["path"] for e in entries])

    # -- garbage collection --------------------------------------------

    def vacuum(self, keep_runs: int = 2) -> list[str]:
        """Delete partition dirs referenced by NO manifest of the latest
        ``keep_runs`` accepted runs. Manifests themselves are kept (tiny,
        and older ledger rows stay auditable); only their data partitions
        become unreadable once vacuumed — same contract as Delta/Iceberg
        ``VACUUM`` against time travel.

        This also garbage-collects ORPHANS: state written by a run that
        crashed between its state write and its ledger append (the
        commit point) belongs to no manifest and is swept here. Like
        Delta/Iceberg VACUUM, this assumes no ingest is in flight —
        a concurrent run's not-yet-committed parts look identical to
        orphans; the pipeline is single-writer by design (SURVEY §3.1's
        daily cycle)."""
        kept = (
            self.file_log()
            .filter(F.col("decision") == "archive")
            .orderBy(F.desc("run_datetime"), F.desc("run_id"))
            .limit(keep_runs)
            .collect()
        )
        live: set[str] = set()
        for row in kept:
            live |= {
                e["path"] for e in self._manifest_entries(row["state_location"])
            }
        parts_root = os.path.join(self.root, "parts")
        removed: list[str] = []
        if not os.path.isdir(parts_root):
            return removed
        for run in sorted(os.listdir(parts_root)):
            run_dir = os.path.join(parts_root, run)
            for part in sorted(os.listdir(run_dir)):
                p = os.path.join(run_dir, part)
                if part.startswith("data_year=") and p not in live:
                    shutil.rmtree(p)
                    removed.append(p)
            if not any(d.startswith("data_year=") for d in os.listdir(run_dir)):
                shutil.rmtree(run_dir)
        return removed
