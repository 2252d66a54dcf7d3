"""Interval binning: pandas.cut as a broadcast range join (SURVEY Q2/F12).

The reference bins every transaction date into intervals between consecutive
publish dates (``Analysis/normalized_delay.ipynb`` cells 8-18,
``Analysis/main2.py:93-112``). Edges are a *small, sorted, data-derived*
series — the premise of ``pandas.cut`` — so the Spark-first plan is:

1. one tiny window pass turns the edge column into (lo, hi] intervals
   (``lead`` over the sorted distinct edges);
2. a **broadcast** non-equi join attaches each fact row to its interval.

Physical plan: BroadcastNestedLoopJoin — each fact partition scans the
in-memory edge list, no shuffle of the fact table at all. Cost is
O(rows × edges) comparisons; with the daily-publish cardinality the
reference has (≈10³ edges over a decade) this stays JVM-side and codegen'd.
If edges ever grew large, swap strategy to a sorted-array binary search
(collect edges → ``F.lit(array)``, bisect via ``aggregate``) or a union of
equi-joins on coarse time buckets; the operator's contract stays the same.

Rows outside every interval are dropped (inner join), matching pandas.cut's
NaN rows being filtered by the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def intervals_from_edges(
    edges: DataFrame, edge_col: str, lo_name: str = "bin_lo", hi_name: str = "bin_hi"
) -> DataFrame:
    """Distinct sorted edges → (lo, hi] interval rows (last edge closes)."""
    w = Window.orderBy(edge_col)
    return (
        edges.select(edge_col)
        .distinct()
        .select(
            F.col(edge_col).alias(lo_name),
            F.lead(edge_col).over(w).alias(hi_name),
        )
        .filter(F.col(hi_name).isNotNull())
    )


def bin_into_intervals(
    df: DataFrame,
    value_col: str | Column,
    edges: DataFrame,
    edge_col: str,
    lo_name: str = "bin_lo",
    hi_name: str = "bin_hi",
) -> DataFrame:
    """Attach (lo, hi] interval columns to every row of ``df`` whose
    ``value_col`` falls inside an interval; drop rows outside all bins."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    bins = intervals_from_edges(edges, edge_col, lo_name, hi_name)
    cond = (value > F.col(lo_name)) & (value <= F.col(hi_name))
    return df.join(F.broadcast(bins), cond, "inner")
