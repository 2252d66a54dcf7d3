"""Unit tests for the bucketed range join and the distributed prefix sum.

Both operators claim bit-equality with their naive single-task forms —
these tests prove it on adversarial small frames (boundary timestamps,
uneven chunks, one dominant group), and gate the range join's plan
against nested-loop fallbacks.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.prefixsum import (
    grouped_running_sum,
    hex_prefix_chunks,
)
from land_registry_data_ingestion_spark.operators.rangejoin import (
    bucketed_range_join,
)


def _events(spark, n=200, seed=7):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=rng.randrange(0, 7 * 86400)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "ev_id long, ev_ts timestamp")


def _intervals(spark, n=40, seed=11):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        lo = base + dt.timedelta(seconds=rng.randrange(0, 7 * 86400))
        rows.append((i, lo, lo + dt.timedelta(seconds=rng.randrange(0, 4 * 3600))))
    return spark.createDataFrame(rows, "iv_id long, lo timestamp, hi timestamp")


def _naive(left, right):
    return left.join(
        right,
        (F.col("ev_ts") >= F.col("lo")) & (F.col("ev_ts") <= F.col("hi")),
    )


@pytest.mark.parametrize("bucket_s", [60, 3600, 86400])
def test_range_join_matches_naive_at_any_bucket_width(spark, bucket_s):
    left, right = _events(spark), _intervals(spark)
    got = sorted(
        bucketed_range_join(left, right, "ev_ts", "lo", "hi", bucket_s)
        .select("ev_id", "iv_id")
        .collect()
    )
    want = sorted(_naive(left, right).select("ev_id", "iv_id").collect())
    assert got == want and len(want) > 0


def test_range_join_bounds_inclusive_and_exactly_once(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # events exactly at lo, at hi, just outside either bound, and an
    # interval spanning multiple buckets (hi - lo >> bucket_s)
    left = spark.createDataFrame(
        [
            (1, t0),
            (2, t0 + dt.timedelta(seconds=7200)),
            (3, t0 - dt.timedelta(microseconds=1)),
            (4, t0 + dt.timedelta(seconds=7200, microseconds=1)),
        ],
        "ev_id long, ev_ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, t0, t0 + dt.timedelta(seconds=7200))],
        "iv_id long, lo timestamp, hi timestamp",
    )
    got = sorted(
        r.ev_id
        for r in bucketed_range_join(left, right, "ev_ts", "lo", "hi", 600)
        .select("ev_id")
        .collect()
    )
    assert got == [1, 2]  # inclusive bounds, no duplicates from explode


def test_range_join_rejects_overlapping_columns(spark):
    df = _events(spark)
    with pytest.raises(ValueError, match="disjoint"):
        bucketed_range_join(df, df, "ev_ts", "ev_ts", "ev_ts", 60)


def test_range_join_plan_is_equi_join(spark):
    plan = bucketed_range_join(
        _events(spark), _intervals(spark), "ev_ts", "lo", "hi", 3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouped_running_sum_matches_single_task_window(spark):
    rng = random.Random(3)
    rows = []
    for i in range(500):
        # one dominant group — the case the chunked plan exists for
        g = "big" if rng.random() < 0.8 else f"g{rng.randrange(4)}"
        rows.append((g, i, rng.randrange(1, 1000)))
    df = spark.createDataFrame(rows, "g string, doc_id long, v long").withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    )
    got = grouped_running_sum(
        df, ["g"], "k", "v", hex_prefix_chunks(F.col("k"), 64), "cum"
    )
    want = df.withColumn(
        "cum", F.sum("v").over(Window.partitionBy("g").orderBy("k"))
    )
    assert sorted(got.select("g", "doc_id", "cum").collect()) == sorted(
        want.select("g", "doc_id", "cum").collect()
    )


def test_grouped_running_sum_single_chunk_degenerates_gracefully(spark):
    df = spark.createDataFrame(
        [("a", i, 1) for i in range(10)], "g string, doc_id long, v long"
    ).withColumn("k", F.md5(F.col("doc_id").cast("string")))
    got = grouped_running_sum(
        df, ["g"], "k", "v", hex_prefix_chunks(F.col("k"), 1), "cum"
    )
    assert sorted(r.cum for r in got.collect()) == list(range(1, 11))


def test_grouped_running_sum_null_values_match_sql_semantics(spark):
    """NULL values must follow SQL running-sum semantics: the sum skips
    NULLs and is NULL only before the group's first non-NULL value.
    Regression pin — the exclusive offset was previously derived as
    inclusive-sum-minus-current, which went NULL for a chunk whose own
    total was NULL (erasing real prior sums), and rows whose local cumsum
    was still NULL dropped their chunk offset entirely."""
    rng = random.Random(21)
    rows = []
    for i in range(400):
        g = "big" if rng.random() < 0.7 else f"g{rng.randrange(3)}"
        # 40% NULLs ensures some chunks are entirely NULL and some groups
        # lead with NULLs — the two shapes the old plan got wrong
        v = None if rng.random() < 0.4 else rng.randrange(-50, 50)
        rows.append((g, i, v))
    df = spark.createDataFrame(rows, "g string, doc_id long, v long").withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    )
    got = grouped_running_sum(
        df, ["g"], "k", "v", hex_prefix_chunks(F.col("k"), 64), "cum"
    )
    want = df.withColumn(
        "cum", F.sum("v").over(Window.partitionBy("g").orderBy("k"))
    )
    assert sorted(got.select("g", "doc_id", "cum").collect()) == sorted(
        want.select("g", "doc_id", "cum").collect()
    )


def test_grouped_running_sum_all_null_group_stays_null(spark):
    df = spark.createDataFrame(
        [("a", i, None) for i in range(8)], "g string, doc_id long, v long"
    ).withColumn("k", F.md5(F.col("doc_id").cast("string")))
    got = grouped_running_sum(
        df, ["g"], "k", "v", hex_prefix_chunks(F.col("k"), 4), "cum"
    )
    assert [r.cum for r in got.collect()] == [None] * 8


def test_hex_prefix_chunks_monotone_and_bounded(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    ).withColumn("k", F.md5(F.col("doc_id").cast("string")))
    rows = df.select("k", hex_prefix_chunks(F.col("k"), 64).alias("c")).collect()
    assert all(0 <= r.c < 64 for r in rows)
    in_key_order = sorted(rows, key=lambda r: r.k)
    chunks = [r.c for r in in_key_order]
    assert chunks == sorted(chunks)  # monotone in the sort key
    with pytest.raises(ValueError, match="n_chunks"):
        hex_prefix_chunks(F.col("k"), 257)


# ---------------------------------------------------------------- properties

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.integers(min_value=0, max_value=100_000), min_size=1, max_size=40
    ),
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),
            st.integers(min_value=0, max_value=5_000),  # length 0 allowed
        ),
        min_size=1,
        max_size=15,
    ),
    bucket_s=st.sampled_from([1, 7, 360, 10_000]),
)
def test_range_join_property_matches_naive(spark, events, spans, bucket_s):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(events)],
        "ev_id long, ev_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=lo), base + dt.timedelta(seconds=lo + ln))
            for i, (lo, ln) in enumerate(spans)
        ],
        "iv_id long, lo timestamp, hi timestamp",
    )
    got = sorted(
        bucketed_range_join(left, right, "ev_ts", "lo", "hi", bucket_s)
        .select("ev_id", "iv_id")
        .collect()
    )
    want = sorted(
        (i, j)
        for i, s in enumerate(events)
        for j, (lo, ln) in enumerate(spans)
        if lo <= s <= lo + ln
    )
    assert [(r.ev_id, r.iv_id) for r in got] == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "dominant"]),
            st.one_of(
                st.none(),
                st.integers(min_value=-1_000_000, max_value=1_000_000),
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    n_chunks=st.sampled_from([1, 3, 64, 256]),
)
def test_prefix_sum_property_matches_serial(spark, rows, n_chunks):
    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(rows)],
        "g string, doc_id long, v long",
    ).withColumn("k", F.md5(F.col("doc_id").cast("string")))
    got = {
        r.doc_id: r.cum
        for r in grouped_running_sum(
            df, ["g"], "k", "v", hex_prefix_chunks(F.col("k"), n_chunks), "cum"
        ).collect()
    }
    # serial reference: per group, accumulate in md5-key order, skipping
    # NULLs; the running value is NULL until the first non-NULL (SQL)
    import hashlib

    by_group: dict[str, list[tuple[str, int, int | None]]] = {}
    for i, (g, v) in enumerate(rows):
        k = hashlib.md5(str(i).encode()).hexdigest()
        by_group.setdefault(g, []).append((k, i, v))
    want = {}
    for g, items in by_group.items():
        acc = None
        for _, i, v in sorted(items):
            if v is not None:
                acc = v if acc is None else acc + v
            want[i] = acc
    assert got == want
