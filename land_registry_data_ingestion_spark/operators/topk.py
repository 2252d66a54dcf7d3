"""Top-k per group without the low-cardinality window funnel.

The naive plan for "top k rows per group" is one window over
``partitionBy(group)`` — which shuffles the ENTIRE table into |groups|
partitions. With few groups (the common case: status codes, priorities,
languages) that serializes a 100 TB scan through a handful of reducers.

``topk_per_group`` runs two phases:

1. a window over ``(group, salt)`` where salt is a deterministic hash of
   the row's tie-break key — the table spreads over ``groups × n_salts``
   partitions and each survivor set is at most ``k`` rows;
2. the same window over ``group`` alone on the surviving
   ``groups × n_salts × k`` rows — driver-scale by construction.

The result is provably identical to the single-window plan: every true
top-k row is in the top k of whichever salt partition it landed in, so
phase 1 never discards a winner. Reference parity: the reference's
"latest / best row per entity" scans (e.g. max-date selection in
LRD/land_registry_pp_monthly_update_database_updater.py) are the k=1
special case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_col: str,
    n_salts: int = 32,
    rank_name: str = "rnk",
) -> DataFrame:
    """Top ``k`` rows per group under ``order_cols`` (a total order —
    include a unique tie-break column, or ranks are nondeterministic).

    ``salt_col`` must name a column whose hash spreads rows uniformly
    (any high-cardinality key); the salt is derived with ``crc32`` so
    reruns are deterministic.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    salt = (F.crc32(F.col(salt_col).cast("string")) % n_salts).alias("_salt")
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    local = (
        df.withColumn("_salt", salt)
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_salt", "_r")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        local.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
    )
