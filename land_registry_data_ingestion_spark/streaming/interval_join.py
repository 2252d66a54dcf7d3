"""Stream-stream interval (range) join — the streaming twin of
``operators/rangejoin.py::bucketed_range_join``.

Structured Streaming joins two unbounded sides by buffering each in
state, and it requires (a) an EQUALITY predicate to key that state (a
pure range condition is rejected: "Stream-stream join without equality
predicate is not supported") and (b) bounds that let it evict buffered
rows. The same bucket discretization that makes the batch range join
shuffle-sane provides both:

- every left row gets ONE bucket key floor(ts / w) — the state/equality
  key;
- every right anchor explodes to the ≤ span/w + 1 buckets its interval
  [ts, ts + span] covers;
- the exact interval condition re-checks inside the bucket, and a
  watermark on both sides lets the engine evict state once the other
  side's watermark passes — state is O(rate × (watermark + span)).

The batch form is the oracle-checked ground truth: ``evt_range_join``
declares the same "events within the 30 minutes after each purchase"
semantics, and ``tests/test_streaming.py`` proves batch/stream parity on
the same inputs, including a cross-micro-batch match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "__sij_bkt"


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts_col: str,
    right_ts_col: str,
    span_s: int,
    watermark_s: int = 3600,
    bucket_s: int | None = None,
) -> DataFrame:
    """Inner-join streaming ``left`` rows to streaming ``right`` anchors
    where ``left.ts`` falls in ``[right.ts, right.ts + span_s]`` (bounds
    inclusive, matching ``bucketed_range_join``). ``bucket_s`` defaults
    to ``span_s`` (each anchor explodes to ≤ 2 buckets). Column names
    must be disjoint."""
    if span_s < 0 or (bucket_s is not None and bucket_s <= 0):
        raise ValueError(f"bad span_s={span_s} / bucket_s={bucket_s}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint; overlapping: {sorted(overlap)}"
        )
    w = bucket_s or max(span_s, 1)

    lb = left.withWatermark(left_ts_col, f"{watermark_s} seconds").withColumn(
        _BKT, F.floor(F.col(left_ts_col).cast("long") / w)
    )
    hi = F.col(right_ts_col) + F.expr(f"INTERVAL {span_s} SECONDS")
    rb = right.withWatermark(
        right_ts_col, f"{watermark_s} seconds"
    ).withColumn(
        _BKT,
        F.explode(
            F.sequence(
                F.floor(F.col(right_ts_col).cast("long") / w),
                F.floor(hi.cast("long") / w),
            )
        ),
    )
    cond = (
        (lb[_BKT] == rb[_BKT])
        & (F.col(left_ts_col) >= F.col(right_ts_col))
        & (F.col(left_ts_col) <= hi)
    )
    return lb.join(rb, cond, "inner").drop(_BKT)
