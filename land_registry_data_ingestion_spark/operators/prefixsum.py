"""Distributed grouped prefix sum (running total).

``SUM(x) OVER (PARTITION BY g ORDER BY k)`` executes each group's scan as
ONE task: every row of a group moves to a single partition and is summed
serially. Fine when groups are small; a scale-killer when one group holds
a large fraction of a 100 TB table (e.g. running token totals for the
dominant source in a training corpus).

This operator is the classic two-pass parallel prefix sum, expressed in
DataFrame ops only:

1. chunk each group by an order-consistent coarse key (monotone in the
   sort key, so chunk boundaries respect the global order);
2. local pass — windowed cumsum inside each (group, chunk): parallelism is
   groups × chunks, not groups;
3. offset pass — per-(group, chunk) totals (tiny: one row per chunk), a
   per-group cumsum over those totals (exclusive), broadcast back;
4. result = local cumsum + chunk offset. Bit-equal to the single-task
   window for exact (integer/decimal) values.

The reference's pandas pipelines get running totals for free on a single
node (e.g. ``cumsum`` in the analytics notebooks); this is the
distributed-correct equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CHUNK = "__psum_chunk"
_LOCAL = "__psum_local"
_OFFSET = "__psum_offset"


def hex_prefix_chunks(order_col: Column, n_chunks: int = 64) -> Column:
    """Order-consistent chunk id for a lowercase-hex sort key (md5 etc.):
    the first two hex chars give a uniform value in [0, 256); scaling to
    ``n_chunks`` (≤ 256) is monotone, so lexicographic key order implies
    non-decreasing chunk order — the property step 1 above requires."""
    if not 1 <= n_chunks <= 256:
        raise ValueError(f"n_chunks must be in [1, 256], got {n_chunks}")
    v = F.conv(F.substring(order_col, 1, 2), 16, 10).cast("int")
    return F.floor(v * n_chunks / 256).cast("int")


def grouped_running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    chunk_expr: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` over rows ordered
    by ``order_col`` within each group, computed with the two-pass chunked
    plan above. ``chunk_expr`` must be monotone non-decreasing in
    ``order_col`` (see ``hex_prefix_chunks``); ``order_col`` must be
    unique within a group for a deterministic result."""
    group_cols = list(group_cols)
    d = df.withColumn(_CHUNK, chunk_expr)

    w_local = Window.partitionBy(*group_cols, _CHUNK).orderBy(order_col)
    local = d.withColumn(_LOCAL, F.sum(value_col).over(w_local))

    # One row per (group, chunk): bounded by groups × n_chunks regardless
    # of data volume — safe to window per group and broadcast. The offset
    # is the EXCLUSIVE prior-chunk sum taken over a preceding-rows frame
    # (not inclusive-minus-current: with an all-NULL current chunk that
    # subtraction goes NULL and would erase a real prior sum).
    w_prior = (
        Window.partitionBy(*group_cols)
        .orderBy(_CHUNK)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        d.groupBy(*group_cols, _CHUNK)
        .agg(F.sum(value_col).alias("_chunk_sum"))
        .withColumn(_OFFSET, F.sum("_chunk_sum").over(w_prior))
        .drop("_chunk_sum")
    )

    joined = local.join(F.broadcast(offsets), on=[*group_cols, _CHUNK])
    # SQL running-sum NULL semantics: NULL only while no non-NULL value
    # has appeared yet in the group — a row whose local cumsum is still
    # NULL inherits prior chunks' offset alone, and vice versa.
    running = F.when(
        F.col(_LOCAL).isNull() & F.col(_OFFSET).isNull(), F.lit(None)
    ).otherwise(
        F.coalesce(F.col(_LOCAL), F.lit(0)) + F.coalesce(F.col(_OFFSET), F.lit(0))
    )
    return joined.withColumn(out_col, running).drop(_CHUNK, _LOCAL, _OFFSET)
