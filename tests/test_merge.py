"""Golden tests for the CDC merge decision matrix (SURVEY §3.2, §5.2).

Hand-built current-state + one A/C/D batch covering all 11 outcomes,
including undelete, change-then-delete, null-safe identity, and the
idempotence invariant (re-applying the same batch changes nothing).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from land_registry_data_ingestion_spark.operators.merge import (
    cdc_merge,
    merge_outcome_stats,
    validate_unique,
)

TS0 = datetime.datetime(2024, 1, 1)
TS1 = datetime.datetime(2024, 6, 1)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tuid", T.StringType(), False),
        T.StructField("price", T.LongType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("created_datetime", T.TimestampType(), True),
        T.StructField("updated_datetime", T.TimestampType(), True),
        T.StructField("deleted_datetime", T.TimestampType(), True),
        T.StructField("is_deleted", T.BooleanType(), False),
    ]
)

UPD_SCHEMA = T.StructType(
    [
        T.StructField("tuid", T.StringType(), False),
        T.StructField("price", T.LongType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("record_op", T.StringType(), False),
    ]
)


def _state(spark):
    rows = [
        # tuid, price, code, created, updated, deleted, is_deleted
        ("t01", 100, "X", TS0, None, None, False),  # A identical
        ("t02", 200, "X", TS0, None, None, False),  # A differing
        ("t03", 300, "X", TS0, None, TS0, True),  # A on deleted
        ("t04", 400, "X", TS0, None, None, False),  # C identical
        ("t05", 500, "X", TS0, None, TS0, True),  # C on deleted
        ("t06", 600, "X", TS0, None, None, False),  # C differing
        ("t09", 900, "X", TS0, None, None, False),  # D identical
        ("t10", 1000, "X", TS0, None, None, False),  # untouched
        ("t11", 1100, "X", TS0, None, None, False),  # D differing
        ("t12", 1200, "X", TS0, None, TS0, True),  # D on deleted
        ("t14", 1400, None, TS0, None, None, False),  # null-safe identical
    ]
    return spark.createDataFrame(rows, STATE_SCHEMA)


def _updates(spark):
    rows = [
        ("t01", 100, "X", "A"),  # add_ignore
        ("t02", 201, "X", "A"),  # add_change
        ("t03", 301, "X", "A"),  # add_undelete_change
        ("t07", 700, "X", "A"),  # add_insert
        ("t04", 400, "X", "C"),  # change_ignore
        ("t06", 601, "X", "C"),  # change_change
        ("t05", 501, "X", "C"),  # change_ignore_deleted
        ("t08", 800, "X", "C"),  # change_insert
        ("t09", 900, "X", "D"),  # delete_delete
        ("t11", 1101, "X", "D"),  # delete_change_delete
        ("t12", 1201, "X", "D"),  # delete_ignore_deleted
        ("t13", 1300, "X", "D"),  # delete_ignore_missing
        ("t14", 1400, None, "C"),  # change_ignore via null-safe equality
    ]
    return spark.createDataFrame(rows, UPD_SCHEMA)


EXPECTED_OUTCOMES = {
    "t01": "add_ignore",
    "t02": "add_change",
    "t03": "add_undelete_change",
    "t07": "add_insert",
    "t04": "change_ignore",
    "t06": "change_change",
    "t05": "change_ignore_deleted",
    "t08": "change_insert",
    "t09": "delete_delete",
    "t11": "delete_change_delete",
    "t12": "delete_ignore_deleted",
    "t13": "delete_ignore_missing",
    "t14": "change_ignore",
}


@pytest.fixture(scope="module")
def merged(spark):
    return cdc_merge(
        _state(spark),
        _updates(spark),
        key_col="tuid",
        value_cols=["price", "code"],
        batch_timestamp=F.lit(TS1),
    )


def test_all_outcomes(merged):
    got = {r["tuid"]: r["outcome"] for r in merged.outcomes.collect()}
    assert got == EXPECTED_OUTCOMES


def test_outcome_stats(merged):
    stats = {
        (r["record_op"], r["outcome"]): r["n_rows"]
        for r in merge_outcome_stats(merged.outcomes).collect()
    }
    assert stats[("A", "add_insert")] == 1
    assert stats[("C", "change_ignore")] == 2  # t04 + null-safe t14
    assert stats[("D", "delete_ignore_missing")] == 1
    assert sum(stats.values()) == len(EXPECTED_OUTCOMES)


def test_new_state_values(merged):
    state = {r["tuid"]: r.asDict() for r in merged.new_state.collect()}
    # inserted rows stamped created at batch time, live
    assert state["t07"]["created_datetime"] == TS1
    assert state["t07"]["is_deleted"] is False
    assert state["t08"]["price"] == 800
    # undelete: new values, cleared deleted_datetime, updated stamped
    assert state["t03"]["price"] == 301
    assert state["t03"]["is_deleted"] is False
    assert state["t03"]["deleted_datetime"] is None
    assert state["t03"]["updated_datetime"] == TS1
    # plain change
    assert state["t02"]["price"] == 201
    assert state["t02"]["updated_datetime"] == TS1
    assert state["t02"]["created_datetime"] == TS0
    # soft delete keeps values, stamps deleted
    assert state["t09"]["is_deleted"] is True
    assert state["t09"]["deleted_datetime"] == TS1
    assert state["t09"]["price"] == 900
    # change-then-delete takes the update values AND deletes
    assert state["t11"]["is_deleted"] is True
    assert state["t11"]["price"] == 1101
    assert state["t11"]["updated_datetime"] == TS1
    # ignores keep everything
    assert state["t01"]["updated_datetime"] is None
    assert state["t05"]["price"] == 500
    assert state["t05"]["is_deleted"] is True
    assert state["t12"]["price"] == 1200
    # untouched row untouched
    assert state["t10"]["price"] == 1000
    assert state["t10"]["is_deleted"] is False
    # D on missing key does NOT create a row
    assert "t13" not in state


def test_key_uniqueness_invariant(merged):
    assert validate_unique(merged.new_state, "tuid").count() == 0


def test_idempotent_reapply(spark, merged):
    """Re-applying the identical batch is a no-op: every outcome becomes an
    ignore and the state is unchanged (SURVEY §5.2 invariant)."""
    again = cdc_merge(
        merged.new_state,
        _updates(spark),
        key_col="tuid",
        value_cols=["price", "code"],
        batch_timestamp=F.lit(datetime.datetime(2024, 7, 1)),
    )
    outcomes = {r["tuid"]: r["outcome"] for r in again.outcomes.collect()}
    assert all("ignore" in o for o in outcomes.values()), outcomes
    before = {r["tuid"]: r.asDict() for r in merged.new_state.collect()}
    after = {r["tuid"]: r.asDict() for r in again.new_state.collect()}
    assert before == after


def test_duplicate_key_probe(spark):
    dups = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["tuid", "x"]
    )
    bad = validate_unique(dups, "tuid").collect()
    assert len(bad) == 1 and bad[0]["tuid"] == "a" and bad[0]["n_rows"] == 2


def test_invalid_op_existing_key_preserves_current_row(spark):
    """An unrecognized op against an existing key must leave the current
    row untouched (ignore semantics) and surface on invalid_ops."""
    cur = spark.createDataFrame(
        [("t01", 100, "X", TS0, None, None, False)], STATE_SCHEMA
    )
    upd = spark.createDataFrame([("t01", 999, "Z", "Q")], UPD_SCHEMA)
    res = cdc_merge(
        cur, upd, key_col="tuid", value_cols=["price", "code"],
        batch_timestamp=F.lit(TS1),
    )
    state = {r["tuid"]: r for r in res.new_state.collect()}
    assert state["t01"]["price"] == 100 and state["t01"]["code"] == "X"
    assert not state["t01"]["is_deleted"]
    invalid = res.invalid_ops.collect()
    assert [(r["tuid"], r["record_op"]) for r in invalid] == [("t01", "Q")]


def test_invalid_op_missing_key_inserts_no_phantom_row(spark):
    """An unrecognized op against a MISSING key must not materialize an
    all-NULL phantom row in the new state."""
    cur = spark.createDataFrame(
        [("t01", 100, "X", TS0, None, None, False)], STATE_SCHEMA
    )
    upd = spark.createDataFrame([("t99", 999, "Z", "Q")], UPD_SCHEMA)
    res = cdc_merge(
        cur, upd, key_col="tuid", value_cols=["price", "code"],
        batch_timestamp=F.lit(TS1),
    )
    assert [r["tuid"] for r in res.new_state.collect()] == ["t01"]
    assert res.invalid_ops.count() == 1


def test_merge_ledger_17_counters(spark):
    """merge_ledger reproduces the reference's operation-log row shape:
    17 counters, internally consistent (database_updater.py:48-84)."""
    from land_registry_data_ingestion_spark.operators.merge import merge_ledger

    res = cdc_merge(
        _state(spark), _updates(spark), key_col="tuid",
        value_cols=["price", "code"], batch_timestamp=F.lit(TS1),
    )
    row = merge_ledger(res.outcomes).collect()[0].asDict()
    assert len(row) == 17
    assert row["input_file_row_count"] == (
        row["input_file_row_count_insert"]
        + row["input_file_row_count_update"]
        + row["input_file_row_count_delete"]
    )
    assert row["operation_count_insert"] == (
        row["operation_count_insert_insert"] + row["operation_count_update_insert"]
    )
    applied = (
        row["operation_count_insert"]
        + row["operation_count_update"]
        + row["operation_count_delete"]
        + row["operation_count_ignored"]
    )
    assert applied == row["input_file_row_count"]


def test_incremental_rollup_matches_recompute_on_golden_matrix(spark):
    """IVM parity on the full 11-outcome matrix: applying the rollup
    delta to the pre-merge rollup equals recomputing from the merged
    state — per `code` group, live count and price sum."""
    from land_registry_data_ingestion_spark.operators.rollup import (
        apply_rollup_delta,
        rollup_from_state,
    )

    state, upd = _state(spark), _updates(spark)
    res = cdc_merge(
        state, upd, key_col="tuid", value_cols=["price", "code"],
        batch_timestamp=F.lit(TS1),
    )
    old_rollup = rollup_from_state(state, "code", "price")
    maintained = apply_rollup_delta(
        old_rollup, res.transitions, "code", "price"
    )
    recomputed = rollup_from_state(res.new_state, "code", "price")
    as_map = lambda df: {  # noqa: E731 — `code` may be NULL (t14)
        r[0]: (r[1], r[2]) for r in df.collect()
    }
    assert as_map(maintained) == as_map(recomputed)
    assert None in as_map(maintained)  # the NULL group is maintained too


def test_incremental_rollup_drops_emptied_and_creates_new_groups(spark):
    from land_registry_data_ingestion_spark.operators.rollup import (
        apply_rollup_delta,
        rollup_from_state,
    )

    state = spark.createDataFrame(
        [("k1", 10, "OLD", TS0, None, None, False)], STATE_SCHEMA
    )
    upd = spark.createDataFrame(
        [
            ("k1", 10, "OLD", "D"),     # empties group OLD
            ("k2", 20, "NEW", "A"),     # creates group NEW
        ],
        UPD_SCHEMA,
    )
    res = cdc_merge(
        state, upd, key_col="tuid", value_cols=["price", "code"],
        batch_timestamp=F.lit(TS1),
    )
    got = {
        r.code: (r.n_live, r.total)
        for r in apply_rollup_delta(
            rollup_from_state(state, "code", "price"),
            res.transitions,
            "code",
            "price",
        ).collect()
    }
    assert got == {"NEW": (1, 20.0)}


def test_null_keyed_rows_accounted_not_vanished(spark):
    """A NULL-keyed update can address no row (the reference's PK is NOT
    NULL — its per-row path fails the batch), but it must be ACCOUNTED:
    before the row-presence indicators, upd_exists tested the update's
    KEY, so a NULL-keyed update was misread as "no update side" — absent
    from outcomes, invalid_ops, and the ledger's input_file_row_count
    (silent batch-size loss), and only kept out of state by three-valued
    filter logic. A NULL-keyed row already IN state was worse: every
    merge silently dropped it."""
    from pyspark.sql import functions as F

    from land_registry_data_ingestion_spark.operators.ingest import init_state
    from land_registry_data_ingestion_spark.operators.merge import (
        cdc_merge,
        merge_ledger,
    )

    ts = F.lit("2024-01-01").cast("timestamp")
    cur = init_state(
        spark.createDataFrame([("a", 1), (None, 7)], "k string, v int"),
        batch_timestamp=ts,
    )
    upd = spark.createDataFrame(
        [("a", 10, "C"), (None, 99, "A")], "k string, v int, record_op string"
    )
    res = cdc_merge(cur, upd, "k", ["v"], batch_timestamp=ts)

    state = {r["k"]: r["v"] for r in res.new_state.collect()}
    assert state == {"a": 10, None: 7}  # untouched NULL-key state row survives

    outcomes = {
        (r["k"], r["record_op"]): r["outcome"] for r in res.outcomes.collect()
    }
    assert outcomes == {
        ("a", "C"): "change_change",
        (None, "A"): "invalid_key",
    }
    assert res.invalid_ops.count() == 1

    # the ledger counts every input row, including the invalid one
    row = merge_ledger(res.outcomes).collect()[0]
    assert row["input_file_row_count"] == 2
    assert row["input_file_row_count_insert"] == 1
    assert row["operation_count_insert"] == 0  # invalid_key performed nothing
    assert row["operation_count_update"] == 1

    # transitions stay keyed: no NULL group key leaks into IVM rollups
    assert [r["k"] for r in res.transitions.collect()] == ["a"]


def test_coderived_equals_join(spark):
    """Round-11 optimization pin: cdc_merge_coderived (join-free, one
    scan) produces frame-identical results to cdc_merge's full-outer
    join when both sides co-derive from one uniquely-keyed source —
    over the full golden outcome matrix, including an invalid op."""
    from land_registry_data_ingestion_spark.operators.merge import (
        cdc_merge_coderived,
    )

    # One source row per tuid; flags decide side membership, values are
    # arithmetic in the key so both paths derive identical sides.
    rows = []
    state = {r["tuid"]: r for r in _state(spark).collect()}
    upds = {r["tuid"]: r for r in _updates(spark).collect()}
    for tuid in sorted(set(state) | set(upds) | {"t99"}):
        s, u = state.get(tuid), upds.get(tuid)
        rows.append(
            (
                tuid,
                s is not None,
                s["price"] if s else None,
                s["code"] if s else None,
                s["is_deleted"] if s else None,
                s["deleted_datetime"] if s else None,
                (u is not None) or tuid == "t99",
                u["price"] if u else 9900,
                u["code"] if u else "Z",
                u["record_op"] if u else "X",  # t99: invalid op
            )
        )
    src = spark.createDataFrame(
        rows,
        "tuid string, in_cur boolean, c_price long, c_code string, "
        "c_del boolean, c_del_ts timestamp, in_upd boolean, "
        "u_price long, u_code string, u_op string",
    )
    got = cdc_merge_coderived(
        src,
        cur_filter=F.col("in_cur"),
        cur_select={
            "tuid": F.col("tuid"),
            "price": F.col("c_price"),
            "code": F.col("c_code"),
            "is_deleted": F.col("c_del"),
            "created_datetime": F.lit(TS0),
            "updated_datetime": F.lit(None).cast("timestamp"),
            "deleted_datetime": F.col("c_del_ts"),
        },
        upd_filter=F.col("in_upd"),
        upd_select={
            "tuid": F.col("tuid"),
            "price": F.col("u_price"),
            "code": F.col("u_code"),
            "record_op": F.col("u_op"),
        },
        key_col="tuid",
        value_cols=["price", "code"],
        batch_timestamp=F.lit(TS1),
    )
    cur_df = _state(spark)
    upd_df = _updates(spark).unionByName(
        spark.createDataFrame(
            [("t99", 9900, "Z", "X")], "tuid string, price long, code string, record_op string"
        )
    )
    want = cdc_merge(
        cur_df, upd_df, key_col="tuid", value_cols=["price", "code"],
        batch_timestamp=F.lit(TS1),
    )
    for name in ("new_state", "outcomes", "invalid_ops", "transitions"):
        g = getattr(got, name)
        w = getattr(want, name)
        assert g.schema == w.schema, name
        gs = sorted(map(tuple, g.collect()))
        ws = sorted(map(tuple, w.collect()))
        assert gs == ws, f"{name}: {gs} != {ws}"
    # the join-free plan really is join-free
    plan = got.new_state._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan
