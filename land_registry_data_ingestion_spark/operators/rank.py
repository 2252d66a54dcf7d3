"""Distributed global rank — the scale-safe replacement for an
unpartitioned ``Window.orderBy`` (which Spark executes as ONE task
holding the entire dataset).

Classic two-pass shape: range-partition on the order key (contiguous,
sorted partition ranges), count rows per partition (one tiny P-row
aggregate, collected driver-side like centroid sets), then add each
partition's exclusive prefix offset to a *partition-local* row_number.
Every pass is parallel; the only global structure is the P-row offset
table. Backs equi-depth histograms, exact percentile assignment, and
deterministic pagination.

The range-partitioned frame sits behind a barrier so the count pass and
the rank pass read the SAME materialization — RangePartitioner samples
its boundaries, and recomputing could legally re-sample.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.util import barrier


def _global_rank_with_total(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Rank plus the total row count — the count falls out of the per-
    partition size pass for free (sum of the collected P-row table), so
    callers that need n (equi-depth bucketing) don't re-scan the input."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    parts = barrier(
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
    ).withColumn("_pid", F.spark_partition_id())

    sizes = parts.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    acc = 0
    offsets = []
    for row in sorted(sizes, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_n"]
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")

    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    ranked = (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )
    return ranked, acc


def global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append 1-based ``rank_col`` = position in the total order given by
    ``order_cols`` (which must be a UNIQUE key tuple — ties across a
    range boundary would otherwise make ranks partition-dependent).
    """
    ranked, _ = _global_rank_with_total(df, order_cols, rank_col, num_partitions)
    return ranked


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Equi-depth histogram: bucket(r) = ceil(r·k/n) over the global rank
    r — integer arithmetic only, so a second engine replays the exact cut
    points (NTILE's remainder-distribution rule differs; the ceil formula
    is the engine-neutral contract).
    """
    ranked, n = _global_rank_with_total(
        df.select(value_col, tiebreak_col),
        [value_col, tiebreak_col],
        "rank",
        num_partitions,
    )
    bucket = F.expr(f"(rank * {n_buckets} + {n} - 1) div {n}")
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min(value_col), 2).alias("lo"),
            F.round(F.max(value_col), 2).alias("hi"),
        )
    )
