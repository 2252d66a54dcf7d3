"""Unit tests for operators/topk.py and operators/graph.py: the salted
two-phase top-k must be lossless vs the single-window plan, and
degree-ordered triangle counting must match naive enumeration."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from land_registry_data_ingestion_spark.operators.graph import triangle_stats
from land_registry_data_ingestion_spark.operators.topk import topk_per_group


def _naive_topk(spark, rows, k):
    df = spark.createDataFrame(rows, ["grp", "id", "score"])
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("id"))
    return {
        (r["grp"], r["rnk"], r["id"], r["score"])
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    }


class TestTopkPerGroup:
    def test_matches_single_window_plan(self, spark):
        rng = random.Random(11)
        rows = [
            (f"g{rng.randrange(4)}", i, float(rng.randrange(50)))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, ["grp", "id", "score"])
        got = {
            (r["grp"], r["rnk"], r["id"], r["score"])
            for r in topk_per_group(
                df,
                group_cols=["grp"],
                order_cols=[F.desc("score"), F.asc("id")],
                k=5,
                salt_col="id",
                n_salts=8,
            ).collect()
        }
        assert got == _naive_topk(spark, rows, 5)

    def test_group_smaller_than_k(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
            ["grp", "id", "score"],
        )
        out = topk_per_group(
            df,
            group_cols=["grp"],
            order_cols=[F.desc("score"), F.asc("id")],
            k=10,
            salt_col="id",
            n_salts=4,
        ).collect()
        assert len(out) == 3  # every row survives, ranked
        assert {r["rnk"] for r in out if r["grp"] == "a"} == {1, 2}

    def test_rejects_bad_k(self, spark):
        df = spark.createDataFrame([("a", 1, 1.0)], ["grp", "id", "score"])
        with pytest.raises(ValueError):
            topk_per_group(
                df, ["grp"], [F.asc("id")], k=0, salt_col="id"
            )


def _naive_triangles(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n = 0
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            n += 1
    return n


class TestTriangleStats:
    def _run(self, spark, edges):
        df = spark.createDataFrame(
            [(min(u, v), max(u, v)) for u, v in edges], ["u", "v"]
        ).distinct()
        return triangle_stats(df).collect()[0]

    def test_planted_k4_plus_path(self, spark):
        # K4 has 4 triangles; the pendant path adds none.
        k4 = list(itertools.combinations([1, 2, 3, 4], 2))
        path = [(4, 5), (5, 6)]
        row = self._run(spark, k4 + path)
        assert row["n_triangles"] == 4
        assert row["n_nodes"] == 6
        assert row["n_edges"] == 8

    def test_skewed_star_has_no_triangles(self, spark):
        # A hub-and-spoke star: max degree n-1, zero triangles — the case
        # degree ordering exists for (no wedge forms at the hub).
        star = [(0, i) for i in range(1, 40)]
        row = self._run(spark, star)
        assert row["n_triangles"] == 0
        assert row["n_wedges"] == 39 * 38 // 2

    def test_random_graph_matches_naive(self, spark):
        rng = random.Random(7)
        edges = {
            tuple(sorted(rng.sample(range(30), 2))) for _ in range(150)
        }
        row = self._run(spark, list(edges))
        assert row["n_triangles"] == _naive_triangles(edges)
        assert row["n_edges"] == len(edges)


def test_degenerate_series_and_graphs_yield_null_not_error(spark):
    """ANSI mode (Spark 4 default) turns /0 into a query-killing error.
    Three analytics shapes hit it on degenerate-but-real inputs: a
    wedge-free graph (clustering = 3T/W with W = 0), a constant-value
    series (z = (x-mu)/sigma with sigma = 0), and a zero-variance
    Pearson leg. All three now yield NULL — what the DuckDB oracle's
    double /0 returns — instead of failing the whole query."""
    from pyspark.sql import functions as F

    from land_registry_data_ingestion_spark.operators.graph import (
        triangle_stats,
    )

    # two disjoint edges: no wedges, clustering undefined
    row = triangle_stats(
        spark.createDataFrame([(1, 2), (3, 4)], "u int, v int")
    ).collect()[0]
    assert row["n_wedges"] == 0 and row["clustering"] is None

    # constant series: sigma = 0 → z NULL → falls out of the filter
    ev = spark.createDataFrame(
        [(i, "const", 5.0) for i in range(5)],
        "event_id int, event_type string, value double",
    )
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev("value").alias("sigma")
    )
    z = F.try_divide(F.col("value") - F.col("mu"), F.col("sigma"))
    assert ev.join(F.broadcast(stats), "event_type").filter(F.abs(z) > 3).count() == 0
