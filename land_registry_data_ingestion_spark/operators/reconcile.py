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
from functools import reduce

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
    columns), tagging each row with its provenance.

    The join is NULL-SAFE (``eqNullSafe`` / IS NOT DISTINCT FROM): the
    reference's pandas merge treats NaN join keys as equal
    (database_verify.py:209-236), so two rows identical on every column
    except a shared NULL (nullable price/date in the price-paid schema)
    must report as ``both`` — a plain equi-join would misreport them as
    left_only + right_only. Null-safe equality still hash-partitions both
    sides on the key tuple (NULL hashes like any value), so the plan is
    the same one-shuffle-per-side SMJ."""
    cols = on if on is not None else [c for c in left.columns if c in right.columns]
    l = left.select(*cols).withColumn("_in_left", F.lit(True)).alias("l")
    r = right.select(*cols).withColumn("_in_right", F.lit(True)).alias("r")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in cols],
    )
    joined = l.join(r, cond, "full_outer")
    diff = joined.select(
        *[F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c) for c in cols],
        F.when(F.col("_in_left") & F.col("_in_right"), "both")
        .when(F.col("_in_left"), "left_only")
        .otherwise("right_only")
        .alias("presence"),
    )
    counts = diff.groupBy("presence").agg(F.count("*").alias("n_rows"))
    return ReconcileResult(diff=diff, counts=counts)


def repair_updates(
    truth: DataFrame, target: DataFrame, op_col: str = "record_op"
) -> DataFrame:
    """The repair half of the reference's verify
    (``database_verify.py:296-446``): rows present in the source-of-truth
    file but not byte-identical in the target become an op='A' update
    batch — feed it to ``cdc_merge`` for the same
    update-if-different / insert-if-missing convergence the reference
    runs row-by-row (it UPSERTS only; target-only rows are reported by
    :func:`reconcile` but never deleted).

    The anti-join is null-safe on every shared column, mirroring the
    reconcile's NaN-equal comparison."""
    from functools import reduce as _reduce

    cols = [c for c in truth.columns if c in target.columns]
    l = truth.select(*cols).alias("l")
    r = target.select(*cols).alias("r")
    cond = _reduce(
        lambda a, b: a & b,
        [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in cols],
    )
    return l.join(r, cond, "left_anti").withColumn(op_col, F.lit("A"))
