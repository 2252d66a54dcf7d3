"""As-of join operator semantics (operators/asof.py).

DuckDB's native ASOF JOIN is the oracle for the declared query
(``evt_asof_join`` in test_oracle.py); these tests pin the semantic
corners the sf-data query can't reach: equal-timestamp tie handling,
strict vs inclusive, left vs inner, NULL right values, and the
single-shuffle plan shape.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.asof import asof_join


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "k", _ts(20)), (3, "z", _ts(5))],
        ["lid", "key", "ts"],
    )
    right = spark.createDataFrame(
        [("k", _ts(10), "r10"), ("k", _ts(15), "r15"), ("q", _ts(1), "rq")],
        ["key", "ts", "tag"],
    )
    return left, right


def test_inclusive_matches_equal_ts(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="key", ts_col="ts", inclusive=True)
    got = {r["lid"]: r["right_tag"] for r in out.collect()}
    # lid=1 at ts=10 sees the right row AT ts=10; lid=2 sees ts=15;
    # lid=3 has no right rows for its key -> dropped (inner)
    assert got == {1: "r10", 2: "r15"}


def test_strict_excludes_equal_ts(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="key", ts_col="ts", inclusive=False)
    got = {r["lid"]: r["right_tag"] for r in out.collect()}
    # lid=1 at ts=10 must NOT see the ts=10 right row, and nothing earlier exists
    assert got == {2: "r15"}


def test_left_keeps_unmatched(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="key", ts_col="ts", how="left")
    rows = {r["lid"]: (r["right_tag"], r["ts_right"]) for r in out.collect()}
    assert rows[3] == (None, None)
    assert len(rows) == 3


def test_null_right_values_carried_atomically(spark):
    """The nearest right row wins even where its value column is NULL —
    per-column ``last(ignorenulls)`` would wrongly resurrect the older
    row's value."""
    left = spark.createDataFrame([(1, "k", _ts(30))], ["lid", "key", "ts"])
    right = spark.createDataFrame(
        [("k", _ts(10), "old", 5.0), ("k", _ts(20), "new", None)],
        ["key", "ts", "tag", "val"],
    )
    row = asof_join(left, right, on="key", ts_col="ts").collect()[0]
    assert row["right_tag"] == "new"
    assert row["right_val"] is None


def test_null_right_ts_never_matches(spark):
    left = spark.createDataFrame([(1, "k", _ts(30))], ["lid", "key", "ts"])
    right = spark.createDataFrame(
        [("k", None, "ghost")], "key string, ts timestamp, tag string"
    )
    assert asof_join(left, right, on="key", ts_col="ts").count() == 0


def test_multi_key_and_value_rename(spark):
    left = spark.createDataFrame(
        [(1, "a", "x", _ts(9))], ["lid", "k1", "k2", "ts"]
    )
    right = spark.createDataFrame(
        [("a", "x", _ts(5), 1.5), ("a", "y", _ts(6), 9.9)],
        ["k1", "k2", "ts", "price"],
    )
    out = asof_join(
        left, right, on=["k1", "k2"], ts_col="ts", value_cols={"price": "p"}
    )
    row = out.collect()[0]
    assert row["p"] == 1.5 and row["ts_right"] == _ts(5)


def test_single_shuffle_no_join_node(spark, frames):
    """The whole as-of resolves through ONE hash exchange (the window's
    partitionBy) — no join operator, no range-join row explosion."""
    left, right = frames
    plan = (
        asof_join(left, right, on="key", ts_col="ts")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("Join", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan


def test_null_keys_never_match(spark):
    """SQL equi-key semantics (round-8 adversarial gate): a NULL key on
    either side matches nothing — the window's partitionBy would
    otherwise collect NULL-key rows of both sides into one matching
    group. Left NULL-key rows surface unmatched ('left') or drop
    ('inner'); right NULL-key rows are discarded."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, None, t0), (2, 7, t0)],
        "ev long, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, None, t0), (11, 7, t0)],
        "rid long, k int, ts timestamp",
    )
    inner = asof_join(
        left, right, on="k", ts_col="ts",
        value_cols={"rid": "rid"}, how="inner",
    ).collect()
    assert [(r.ev, r.rid) for r in inner] == [(2, 11)]
    outer = {
        r.ev: r.rid
        for r in asof_join(
            left, right, on="k", ts_col="ts",
            value_cols={"rid": "rid"}, how="left",
        ).collect()
    }
    assert outer == {1: None, 2: 11}
