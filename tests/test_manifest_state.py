"""ManifestStore tests: the incremental CDC write must be
indistinguishable from the full rewrite (rows, outcome counters, ledger
row counts) while physically touching ONLY the partitions the batch can
affect — unchanged ``data_year`` partitions are carried by reference to
the run that last wrote them."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.ingest import (
    IngestStore,
    ingest_monthly_update,
    ingest_snapshot,
)
from land_registry_data_ingestion_spark.operators.state import ManifestStore


def _line(tuid: str, price: int, date: str, op: str = "A") -> str:
    return (
        f'"{{{tuid}}}","{price}","{date} 00:00","SW1A {tuid[-2:]}","T","N","F",'
        f'"10","","STREET","","LONDON","DIST","COUNTY","A","{op}"'
    )


# years: 2015 (T0001, T0002), 2016 (T0003), 2017 (T0004)
SNAP = [
    _line("T0001", 100000, "2015-01-05"),
    _line("T0002", 200000, "2015-06-06"),
    _line("T0003", 300000, "2016-03-07"),
    _line("T0004", 400000, "2017-08-01"),
]
# change in 2015, delete in 2016, insert into new year 2018; 2017 untouched
MONTHLY = [
    _line("T0001", 150000, "2015-01-05", "C"),
    _line("T0003", 300000, "2016-03-07", "D"),
    _line("T0005", 500000, "2018-02-01", "A"),
]


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


def _part_years(parts_dir: str) -> list[str]:
    if not os.path.isdir(parts_dir):
        return []
    return sorted(d for d in os.listdir(parts_dir) if d.startswith("data_year="))


@pytest.fixture()
def stores(spark, tmp_path):
    return (
        IngestStore(spark=spark, root=str(tmp_path / "full")),
        ManifestStore(spark=spark, root=str(tmp_path / "mani")),
    )


def test_snapshot_parity_and_manifest(spark, stores, tmp_path):
    full, mani = stores
    snap = _write(tmp_path, "s.csv", SNAP)
    t0 = datetime.datetime(2024, 1, 1)
    row_f = ingest_snapshot(full, snap, "r1", now=t0)
    row_m = ingest_snapshot(mani, snap, "r1", now=t0)
    assert row_m["row_count"] == row_f["row_count"] == 4
    assert _rows(mani.current_state()) == _rows(full.current_state())
    entries = mani._manifest_entries(row_m["state_location"])
    assert [(e["data_year"], e["row_count"]) for e in entries] == [
        (2015, 2),
        (2016, 1),
        (2017, 1),
    ]


def test_merge_parity_and_partition_reuse(spark, stores, tmp_path):
    full, mani = stores
    snap = _write(tmp_path, "s.csv", SNAP)
    upd = _write(tmp_path, "m.csv", MONTHLY)
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 2, 1)
    snap_f = ingest_snapshot(full, snap, "r1", now=t0)
    snap_m = ingest_snapshot(mani, snap, "r1", now=t0)
    row_f = ingest_monthly_update(full, upd, "r2", now=t1)
    row_m = ingest_monthly_update(mani, upd, "r2", now=t1)

    # identical result rows and identical ledger row count
    assert _rows(mani.current_state()) == _rows(full.current_state())
    assert row_m["row_count"] == row_f["row_count"] == 5

    # identical outcome counters in the operation log
    for root in (full.root, mani.root):
        got = {
            r["outcome"]: r["n_rows"]
            for r in spark.read.parquet(os.path.join(root, "operation_log")).collect()
        }
        assert got == {"change_change": 1, "delete_delete": 1, "add_insert": 1}

    # the merge run physically wrote ONLY the touched years
    merge_parts = mani._parts_dir(row_m["state_location"])
    assert _part_years(merge_parts) == [
        "data_year=2015",
        "data_year=2016",
        "data_year=2018",
    ]
    # 2017 is carried by reference to the snapshot run's partition dir
    entries = {
        e["data_year"]: e for e in mani._manifest_entries(row_m["state_location"])
    }
    snap_parts = mani._parts_dir(snap_m["state_location"])
    assert entries[2017]["path"] == os.path.join(snap_parts, "data_year=2017")
    for y in (2015, 2016, 2018):
        assert entries[y]["path"].startswith(merge_parts)
    assert entries[2016]["row_count"] == 1  # soft-deleted row stays


def test_year_moving_change_rewrites_both_years(spark, stores, tmp_path):
    """A C op that moves transaction_date across years must drop the row
    from the old partition and land it in the new one — the old year is
    'touched' via the key scan even though no update row targets it."""
    full, mani = stores
    snap = _write(tmp_path, "s.csv", SNAP)
    move = _write(
        tmp_path, "mv.csv", [_line("T0004", 400000, "2019-08-01", "C")]
    )
    t0 = datetime.datetime(2024, 1, 1)
    for st in (full, mani):
        ingest_snapshot(st, snap, "r1", now=t0)
        ingest_monthly_update(st, move, "r2", now=datetime.datetime(2024, 2, 1))
    assert _rows(mani.current_state()) == _rows(full.current_state())

    row_m = mani.last_accepted()
    entries = {
        e["data_year"]: e for e in mani._manifest_entries(row_m["state_location"])
    }
    # 2017 emptied out entirely → no manifest entry; 2019 holds the row
    assert sorted(entries) == [2015, 2016, 2019]
    assert entries[2019]["row_count"] == 1
    # only the moved row's years were written by the merge run
    assert _part_years(mani._parts_dir(row_m["state_location"])) == [
        "data_year=2019"
    ]
    moved = mani.current_state().filter(
        F.col("transaction_unique_id") == "{T0004}"
    ).collect()
    assert [r["transaction_date"].year for r in moved] == [2019]


def test_vacuum_keeps_referenced_partitions(spark, stores, tmp_path):
    _, mani = stores
    snap = _write(tmp_path, "s.csv", SNAP)
    upd = _write(tmp_path, "m.csv", MONTHLY)
    snap_row = ingest_snapshot(mani, snap, "r1", now=datetime.datetime(2024, 1, 1))
    ingest_monthly_update(mani, upd, "r2", now=datetime.datetime(2024, 2, 1))

    before = _rows(mani.current_state())
    removed = mani.vacuum(keep_runs=1)
    # the snapshot's 2015/2016 partitions are superseded → removed;
    # its 2017 partition is still referenced by the merge manifest → kept
    snap_parts = mani._parts_dir(snap_row["state_location"])
    assert sorted(os.path.basename(p) for p in removed) == [
        "data_year=2015",
        "data_year=2016",
    ]
    assert all(p.startswith(snap_parts) for p in removed)
    assert _part_years(snap_parts) == ["data_year=2017"]
    assert _rows(mani.current_state()) == before

    # a second vacuum finds nothing left to delete
    assert mani.vacuum(keep_runs=1) == []


def test_insert_only_batch_reads_no_old_partitions(spark, stores, tmp_path):
    """A batch whose keys are all new and whose years are all new must
    not rewrite any existing partition."""
    _, mani = stores
    snap = _write(tmp_path, "s.csv", SNAP)
    ins = _write(
        tmp_path, "ins.csv", [_line("T0009", 900000, "2020-05-01", "A")]
    )
    snap_row = ingest_snapshot(mani, snap, "r1", now=datetime.datetime(2024, 1, 1))
    row = ingest_monthly_update(mani, ins, "r2", now=datetime.datetime(2024, 2, 1))
    assert row["row_count"] == 5
    assert _part_years(mani._parts_dir(row["state_location"])) == [
        "data_year=2020"
    ]
    entries = {
        e["data_year"]: e["path"]
        for e in mani._manifest_entries(row["state_location"])
    }
    snap_parts = mani._parts_dir(snap_row["state_location"])
    for y in (2015, 2016, 2017):
        assert entries[y].startswith(snap_parts)


def test_state_as_of_time_travel(spark, stores, tmp_path):
    """Any un-vacuumed accepted run is readable as-of: the snapshot run's
    state must be re-readable unchanged after a later merge."""
    _, mani = stores
    snap = _write(tmp_path, "s.csv", SNAP)
    upd = _write(tmp_path, "m.csv", MONTHLY)
    ingest_snapshot(mani, snap, "r1", now=datetime.datetime(2024, 1, 1))
    before = _rows(mani.current_state())
    ingest_monthly_update(mani, upd, "r2", now=datetime.datetime(2024, 2, 1))

    assert _rows(mani.state_as_of("r1")) == before
    assert _rows(mani.state_as_of("r2")) == _rows(mani.current_state())
    with pytest.raises(KeyError):
        mani.state_as_of("no-such-run")


def test_schema_evolution_across_carried_partitions(spark, tmp_path):
    """A column added by a later merge must surface (as NULL) on rows in
    carried-by-reference partitions written before it existed."""
    import datetime as _dt

    store = ManifestStore(spark=spark, root=str(tmp_path / "evo"))
    v1 = spark.createDataFrame(
        [
            ("K1", _dt.datetime(2015, 1, 5), 100),
            ("K2", _dt.datetime(2016, 3, 7), 200),
        ],
        "k string, transaction_date timestamp, price int",
    )
    loc1 = str(tmp_path / "evo" / "m1")
    assert store.write_state(v1, loc1) == 2

    entries = store._manifest_entries(loc1)
    carry = [e for e in entries if e["data_year"] == 2015]
    assert len(carry) == 1
    v2 = spark.createDataFrame(
        [("K2", _dt.datetime(2016, 3, 7), 250, "web")],
        "k string, transaction_date timestamp, price int, channel string",
    )
    loc2 = str(tmp_path / "evo" / "m2")
    assert store.write_merged(v2, loc2, carry) == 2

    out = store._read_parts(
        [e["path"] for e in store._manifest_entries(loc2)]
    )
    assert "channel" in out.columns
    rows = {r.k: r for r in out.collect()}
    assert rows["K1"].channel is None and rows["K1"].price == 100
    assert rows["K2"].channel == "web" and rows["K2"].price == 250


def test_empty_merge_into_empty_state_stays_readable(spark, tmp_path):
    """A merge producing an empty new_state with NO carry entries (empty
    accepted snapshot, then a batch whose only row is a D for a missing
    key in the NULL-year partition) must write the schema-only leaf like
    write_state's zero-row gate — an empty manifest would make every
    later read_state_at call spark.read.parquet() with zero paths."""
    from land_registry_data_ingestion_spark.operators.ingest import (
        merge_update_frame,
    )
    from land_registry_data_ingestion_spark.sources.csv import (
        read_price_paid_csv,
    )

    store = ManifestStore(spark=spark, root=str(tmp_path / "empty_merge"))
    empty = _write(tmp_path, "empty.csv", [])
    ingest_snapshot(store, empty, "r0", now=datetime.datetime(2024, 1, 1))
    assert store.current_state().count() == 0

    # D for a key that doesn't exist, with a NULL transaction_date: its
    # update year is the NULL_YEAR partition, so the empty state's one
    # schema-only entry counts as touched (carry = []) and the ignored
    # delete leaves new_state empty — the exact zero-leaf shape.
    upd = (
        read_price_paid_csv(
            spark, _write(tmp_path, "d.csv", [_line("T0009", 1, "2020-01-01", "D")])
        )
        .withColumn("transaction_date", F.lit(None).cast("timestamp"))
    )
    row = merge_update_frame(store, upd, run_id="r1")
    assert row["row_count"] == 0
    assert store.current_state().count() == 0  # readable, not a crash
    assert store.state_as_of("r1").count() == 0
