"""Dataset reconciliation (SURVEY Q6/J1): DB-vs-file full-outer compare.

The reference merges the database extract against the raw file on *all*
value columns with ``indicator=True`` and splits the result into
left-only / right-only / both (``LRD/land_registry_database_verify.py:209-236``),
then optionally repairs the difference (:296-446).

Spark-first: a full-outer equi join on the value tuple — Catalyst plans an
SMJ over one shuffle of each side; at 100 TB both sides hash-partition on
the same composite key so the compare is fully parallel. For very wide
tuples, compare on a fingerprint (xxhash64 of the struct) first and only
join wide rows for the mismatches.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ReconcileResult:
    diff: DataFrame  # value columns + presence ∈ {left_only, right_only, both}
    counts: DataFrame  # presence → n_rows


def reconcile(
    left: DataFrame, right: DataFrame, on: list[str] | None = None
) -> ReconcileResult:
    """Full-outer compare of two datasets on ``on`` (default: all shared
    columns), tagging each row with its provenance."""
    cols = on if on is not None else [c for c in left.columns if c in right.columns]
    l = left.select(cols).withColumn("_in_left", F.lit(True))
    r = right.select(cols).withColumn("_in_right", F.lit(True))
    joined = l.join(r, cols, "full_outer")
    diff = joined.select(
        *cols,
        F.when(F.col("_in_left") & F.col("_in_right"), "both")
        .when(F.col("_in_left"), "left_only")
        .otherwise("right_only")
        .alias("presence"),
    )
    counts = diff.groupBy("presence").agg(F.count("*").alias("n_rows"))
    return ReconcileResult(diff=diff, counts=counts)
