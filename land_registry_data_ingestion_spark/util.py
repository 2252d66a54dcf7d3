"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure a compute-heavy map stage can use every core.

    Small inputs often arrive as a single parquet file → one split → one
    task, serializing CPU-bound work (hashing, shingling, vector math).
    If the current partition count is below the cluster's default
    parallelism, repartition up to it; otherwise leave the plan untouched
    (at real scale inputs already have thousands of splits and an extra
    shuffle would be pure cost).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
