"""Z-order (Morton-curve) data layout for scan pruning.

Parquet scans prune at file/row-group granularity from min/max column
statistics. A table sorted by ONE column prunes perfectly on that column
and not at all on others; interleaving the bits of several columns
(the Z-order / Morton curve) gives every interleaved column locality, so
a predicate on ANY of them skips most files. This is the layout move
behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here as a plain operator
over plain parquet: at 100 TB the winning plan is often decided before
the query runs, by how the writer laid the data out.

Everything is deterministic Spark column arithmetic (shifts, masks, one
min/max aggregate) — no UDF, no sampling, reruns byte-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column linearly onto [0, 2^bits - 1] longs.

    Linear min/max scaling (not rank) keeps the key a pure per-row map —
    one broadcast bounds row instead of a full sort — at the price of
    weaker locality under heavy value skew; callers with pathological
    distributions should pre-transform (log, bucketize) the column.
    NULLs map to 0 (they sort together, which is what pruning wants)."""
    top = (1 << bits) - 1
    span = (hi.cast("double") - lo.cast("double"))
    frac = F.when(
        span > 0, (col.cast("double") - lo.cast("double")) / span
    ).otherwise(F.lit(0.0))
    scaled = F.least(
        F.lit(top).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(frac * top).cast("long")),
    )
    return F.coalesce(scaled, F.lit(0).cast("long"))


def interleave_bits(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave: bit j of column i lands at position
    ``j * n_cols + i`` of the key. Pure shift/or expression tree
    (``n_cols × bits`` terms), wholly inside codegen."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_name: str = "_zkey",
) -> DataFrame:
    """Append the Z-order key over ``cols``. One tiny min/max aggregate
    (broadcast back as a literal row) + a per-row bit map."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    scaled = [
        _scale_to_bits(
            F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits
        )
        for c in cols
    ]
    out = joined.withColumn(key_name, interleave_bits(scaled, bits))
    return out.drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int | None = None,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of ``cols``.

    ``repartitionByRange`` on the key gives each output file a contiguous
    key interval → tight per-file min/max envelopes on EVERY interleaved
    column; a later filtered scan on any of them prunes most files from
    the footer stats alone, before a row is read. The range exchange
    samples the key column (one extra pass over the key, not the rows'
    payload)."""
    n_files = n_files or df.sparkSession.sparkContext.defaultParallelism
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
