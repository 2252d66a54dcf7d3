"""Bucketed range (interval) join.

A non-equi time join — "left rows whose timestamp falls inside a right
interval" — has no hash key, so a naive formulation becomes a
BroadcastNestedLoopJoin (small right side) or an outright CartesianProduct
(large right side): O(|L|·|R|) comparisons, the classic 100 TB
scale-killer. The standard distributed fix (used by Spark's own
storage-partitioned range-join work and DuckDB/Trino IEJoin literature) is
to discretize time into fixed-width buckets:

- every LEFT row belongs to exactly ONE bucket: floor(ts / w);
- every RIGHT interval is exploded to the buckets it overlaps:
  floor(lo / w) .. floor(hi / w);
- equi-join on the bucket id (plain shuffled hash join, AQE-splittable),
  then re-check the exact predicate ``lo <= ts <= hi``.

Each true (row, interval) match is produced exactly once because the left
row has one bucket and the interval covers that bucket exactly once.
Shuffle volume is |L| + |R| · (span/w + 1); pick ``bucket_s`` near the
typical interval length so intervals explode to O(1) buckets. Skewed hot
buckets (many intervals over a popular time range) fall to AQE skew-join
splitting since the join is a plain equi-join.

Reference parity: the reference has no interval join (its analytics stay
on equi keys — e.g. LRD/sql_scripts analytics extraction); this operator is
part of the scale-out event surface (SURVEY.md §8) alongside the as-of
join in ``operators/asof.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "__range_bkt"


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner-join ``left`` rows to ``right`` intervals with
    ``lo <= ts <= hi`` (bounds inclusive), without a nested-loop join.

    Timestamps are compared at full precision; bucketing uses
    second-truncated epochs, which is sound because truncation and
    floor-division are monotone (a row inside an interval can never land
    outside the interval's bucket range). Column names must be disjoint
    between the two inputs (the join would otherwise be ambiguous).
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint; overlapping: {sorted(overlap)}"
        )

    lb = left.withColumn(
        _BKT, F.floor(F.col(left_ts_col).cast("long") / bucket_s)
    )
    rb = right.withColumn(
        _BKT,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("long") / bucket_s),
                F.floor(F.col(hi_col).cast("long") / bucket_s),
            )
        ),
    )
    joined = lb.join(rb, _BKT).where(
        (F.col(left_ts_col) >= F.col(lo_col))
        & (F.col(left_ts_col) <= F.col(hi_col))
    )
    return joined.drop(_BKT)
