"""Graph operators expressed as DataFrame joins.

Companion to the iterative shapes elsewhere in the package (connected
components in ``operators/dedup.py::near_dup_groups``, PageRank in
``plans/events_queries.py``): here the one-shot combinatorial primitive,
triangle counting, with the degree-ordered orientation that keeps it
feasible on skewed degree distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Count triangles in an undirected simple graph.

    ``edges`` must have columns ``u``, ``v`` with ``u < v`` and no
    duplicate rows (an undirected edge appears exactly once).

    Returns a single row: ``n_nodes``, ``n_edges``, ``n_wedges``,
    ``n_triangles``, ``clustering`` (global clustering coefficient
    ``3·triangles / wedges``, rounded to 6).

    Plan shape — the classic degree-ordered orientation: each edge is
    directed from its lower endpoint under the total order
    ``(degree, node_id)``, compared directly as a struct (no global rank
    window — a consistent total order is all the algorithm needs, and a
    rank would funnel the node set through one task). Every triangle then
    has exactly ONE node with two out-edges into it, so triangles =
    oriented wedges that close. Out-degree under this orientation is
    O(sqrt(|E|)) for ANY graph, so the wedge build is Σ outdeg² — bounded
    even when raw degrees are wildly skewed (a celebrity node with 10^6
    neighbours produces zero wedges at itself; its edges are counted at
    their low-degree ends). Three shuffles (degree agg, wedge self-join,
    closure semi-join), each carrying only ids + degrees.
    """
    from land_registry_data_ingestion_spark.util import barrier

    # The edge list feeds THREE consumers (degree agg, the orientation
    # join, the edge count) and is typically an expensive build upstream
    # (a per-order self-join + distinct); without a barrier each consumer
    # re-runs that build — measured as 44 exchanges / 20 scans in the
    # plan audit. Same for deg (node-scale, bounded — memory) with its
    # four consumers.
    edges = barrier(edges.select("u", "v"))
    deg = barrier(
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg")),
        small=True,
    )
    with_deg = (
        edges.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
        )
    )
    # Orient low→high under (deg, id); carry the high end's order key for
    # the wedge ordering below.
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(
            u_first, F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
        )
        .otherwise(F.struct(F.col("du").alias("d"), F.col("u").alias("n")))
        .alias("hi_key"),
    )
    from land_registry_data_ingestion_spark.util import barrier

    oriented = barrier(oriented)
    # Wedges at the common low node: unordered pairs of out-neighbours,
    # each pair emitted once by ordering on the endpoints' (deg, id) keys.
    a = oriented.select(
        F.col("lo").alias("w_lo"), F.col("hi").alias("b"), F.col("hi_key").alias("kb")
    )
    b = oriented.select(
        F.col("lo").alias("w_lo"), F.col("hi").alias("c"), F.col("hi_key").alias("kc")
    )
    wedges = a.join(b, "w_lo").filter(F.col("kb") < F.col("kc"))
    # Closure: the (b, c) edge, if present, is oriented b→c because
    # (deg_b, b) < (deg_c, c) — one semi-join probes exactly that form.
    closed = wedges.join(
        oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    n_tri = closed.agg(F.count("*").cast("long").alias("n_triangles"))
    n_wedge = deg.agg(
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("long")
        .alias("n_wedges")
    )
    counts = edges.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        F.broadcast(deg.agg(F.count("*").cast("long").alias("n_nodes")))
    )
    return (
        counts.crossJoin(F.broadcast(n_wedge))
        .crossJoin(F.broadcast(n_tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                # try_divide: a wedge-free graph (no node with 2+
                # neighbours) has n_wedges = 0 — clustering is
                # undefined (NULL), not a query-killing ANSI error
                F.try_divide(
                    F.lit(3.0) * F.col("n_triangles"), F.col("n_wedges")
                ),
                6,
            ).alias("clustering"),
        )
    )
