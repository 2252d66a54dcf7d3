"""Interval binning: pandas.cut as a broadcast range join (SURVEY Q2/F12).

The reference bins every transaction date into intervals between consecutive
publish dates (``Analysis/normalized_delay.ipynb`` cells 8-18,
``Analysis/main2.py:93-112``). Edges are a *small, sorted, data-derived*
series — the premise of ``pandas.cut`` — so the Spark-first plan is:

1. one tiny window pass turns the edge column into (lo, hi] intervals
   (``lead`` over the sorted distinct edges);
2. a **broadcast** non-equi join attaches each fact row to its interval.

Physical plan (round 11): the fact table is never nested-loop-joined —
a tiny BroadcastNestedLoopJoin bins only the DISTINCT values (both sides
bounded: ≈10³ edges × ≈10³ distinct dates), and the facts pick up their
bin through a broadcast hash join on the exact value. The fact table is
still never shuffled; per-row cost drops from an O(edges) predicate loop
to one hash probe. If the distinct-value premise ever broke (binning a
raw double), swap the map for a sorted-array binary search
(collect edges → ``F.lit(array)``, bisect via ``aggregate``) or a union
of equi-joins on coarse time buckets; the operator's contract stays the
same.

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
    ``value_col`` falls inside an interval; drop rows outside all bins.

    Two-phase form (round 11, guide §1.2 "the distributed algorithm"):
    the one-phase BroadcastNestedLoopJoin evaluated the range predicate
    against every interval FOR EVERY FACT ROW — O(rows × edges)
    comparisons (~90M at the sf0.1 headline, ~900M at the scale tier).
    The binned expression here is a timestamp whose distinct cardinality
    is calendar-bounded (≈2.5k distinct dates at every SF — the same
    premise that lets the edges broadcast), so the range probe only needs
    to run once per DISTINCT value: dedup the values (map-side-combined
    aggregate, tiny output), nested-loop those few thousand rows against
    the interval list, and attach the resulting (value → bin) map back to
    the facts with a broadcast HASH join — one codegen'd hash probe per
    fact row instead of an O(edges) loop. NULL/NaN values drop in both
    forms (the range predicate is never true; the equi-join key never
    matches), and every in-range value matches exactly one (lo, hi]
    interval, so the output is row-identical to the one-phase join.
    Premise to keep in mind for new callers: distinct(value) must stay
    broadcastable — true for anything date/enum-grained, NOT for raw
    doubles."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    bins = intervals_from_edges(edges, edge_col, lo_name, hi_name)
    vals = df.select(value.alias("_bin_v")).distinct()
    cond = (F.col("_bin_v") > F.col(lo_name)) & (F.col("_bin_v") <= F.col(hi_name))
    mapping = vals.join(F.broadcast(bins), cond, "inner")
    return df.join(F.broadcast(mapping), value == F.col("_bin_v"), "inner").drop(
        "_bin_v"
    )


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    out_col: str = "val",
) -> DataFrame:
    """Exact linearly-interpolated quantiles (type-7, the
    ``quantile_cont`` / numpy default) per group — distributed.

    Spark's built-in exact ``percentile`` aggregate buffers EVERY group
    value in one aggregation state, so a 100 TB group OOMs an executor.
    This form never holds more than a row at a time: one window sort per
    group ranks the values (distributed sort-shuffle — spills, splits,
    AQE-balances like any sort), a codegen'd filter keeps only the ≤ 2
    boundary rows per (group, prob), and a tiny final aggregate
    interpolates. Total shuffle: the sort of (group, value) pairs plus
    O(groups × probs) rows.

    Emits one row per (group, prob): ``group_cols…, pct, {out_col}``.
    """
    w = Window.partitionBy(*group_cols).orderBy("_v")
    wn = Window.partitionBy(*group_cols)
    ranked = (
        df.select(*group_cols, F.col(value_col).cast("double").alias("_v"))
        # aggregate semantics: quantile_cont / numpy quantile IGNORE
        # NULLs. Left in, they'd rank (NULLS FIRST) and shift every
        # quantile down — median of [1, 2, NULL] must be 1.5, not 1.0.
        # A group of only NULLs drops out entirely, matching SQL (the
        # aggregate returns NULL ≈ no row in this exploded layout).
        .filter(F.col("_v").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    # keep a row iff it is a floor/ceil boundary of ANY requested prob
    keep = None
    for p in probs:
        k = (F.col("_n") - 1) * F.lit(p)
        c = (F.col("_rn") == F.floor(k) + 1) | (F.col("_rn") == F.ceil(k) + 1)
        keep = c if keep is None else (keep | c)
    kept = ranked.filter(keep)
    # attribute each surviving row to the prob(s) it bounds, interpolate
    tagged = kept.select(
        *group_cols,
        "_v",
        "_rn",
        "_n",
        F.explode(F.array(*[F.lit(p) for p in probs])).alias("pct"),
    )
    k = (F.col("_n") - 1) * F.col("pct")
    lo, hi = F.floor(k) + 1, F.ceil(k) + 1
    frac = k - F.floor(k)
    return (
        tagged.filter((F.col("_rn") == lo) | (F.col("_rn") == hi))
        .groupBy(*group_cols, "pct")
        .agg(
            F.max(F.when(F.col("_rn") == lo, F.col("_v"))).alias("_lo_v"),
            F.max(F.when(F.col("_rn") == hi, F.col("_v"))).alias("_hi_v"),
            F.first(frac).alias("_frac"),
        )
        .select(
            *group_cols,
            "pct",
            (
                F.col("_lo_v")
                + F.col("_frac") * (F.col("_hi_v") - F.col("_lo_v"))
            ).alias(out_col),
        )
    )
