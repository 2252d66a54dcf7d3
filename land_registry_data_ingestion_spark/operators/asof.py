"""As-of (point-in-time) join — an operator Spark lacks natively.

For every left row, attach the single most recent right row for the same
key whose timestamp is ≤ (inclusive) or < (strict) the left timestamp —
the classic "latest quote before each trade" / "last view before each
click" lookup. DuckDB and kdb+ expose this as ``ASOF JOIN``; Spark has no
built-in, and the naive encodings are catastrophic at scale:

- range join (``l.ts >= r.ts``) explodes to every *earlier* right row per
  left row before a per-key argmax prunes it — O(|L|·|R|) intermediate;
- per-key ``collect_list`` + UDF binary search moves whole key groups
  into Python.

Implementation here is the sort-merge shape: tag both inputs, union by
name, then one pass of ``last(value, ignorenulls=True)`` over a window
partitioned by key and ordered by (ts, side). Each right value is carried
forward until the next right row, so every left row reads the right row
that precedes it — exactly one shuffle of |L|+|R| rows on the join key
and one sort within partitions; no row ever multiplies.

Scale notes (100 TB): cost is the same single Exchange a plain equi-join
on the key would pay, plus an in-partition sort that spills gracefully.
The window is ``rowsBetween(unboundedPreceding, currentRow)`` with a
running ``last`` — Spark evaluates it in one forward scan with O(1)
state per key, not O(window) buffering. A pathologically hot key is the
same skew problem any keyed operator has; salt-by-time-range if one key
exceeds an executor's sort budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str,
    value_cols: dict[str, str] | None = None,
    inclusive: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Attach the latest-preceding right row to every left row.

    Parameters
    ----------
    on : key column(s) shared by both sides.
    ts_col : event-time column name, present on both sides.
    value_cols : right-side columns to carry over, ``{src: dst_alias}``.
        Defaults to every non-key, non-ts right column prefixed
        ``right_``. The matched right timestamp is always emitted as
        ``{ts_col}_right``.
    inclusive : if True a right row at exactly ``left.ts`` matches
        (``r.ts <= l.ts``, DuckDB ASOF default); if False only strictly
        earlier rows do.
    how : 'inner' drops left rows with no preceding right row (DuckDB
        ASOF JOIN); 'left' keeps them with NULL right columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = {
            f.name: f"right_{f.name}"
            for f in right.schema.fields
            if f.name not in keys and f.name != ts_col
        }
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    carried = {ts_col: f"{ts_col}_right", **value_cols}
    # Tag sides; at equal ts the right row must sort BEFORE the left row
    # for inclusive semantics (visible to the window) and AFTER it for
    # strict semantics (invisible: the frame ends at the current row).
    right_side, left_side = (0, 1) if inclusive else (1, 0)
    # All carried values travel in ONE struct: ``last(ignorenulls)`` then
    # picks whole right rows atomically. Per-column lasts would resurrect
    # an older right row's value wherever the nearest right row holds a
    # genuine NULL — a different (wrong) row semantics.
    payload = "__asof_payload"
    # A right row with no timestamp can never be "latest preceding";
    # dropping them also keeps NULLs-first ordering from planting a
    # payload ahead of every real row in the key group. A right row with
    # a NULL key can never match either — the ASOF contract is an
    # equi-join on the keys plus the time inequality, and SQL equality
    # never matches NULL (the window's partitionBy would otherwise
    # collect NULL-key rows of both sides into one matching group — the
    # opposite of DuckDB ASOF JOIN; adversarial-data round 8). Left
    # NULL-key rows need no filter: their partition holds no right rows
    # after this, so they surface unmatched (NULL under 'left', dropped
    # under 'inner') exactly like a SQL join.
    right_live = F.col(ts_col).isNotNull()
    for k in keys:
        right_live = right_live & F.col(k).isNotNull()
    r = right.filter(right_live).select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.lit(right_side).alias(_SIDE),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in carried.items()]
        ).alias(payload),
    )
    l_tagged = left.withColumn(_SIDE, F.lit(left_side))
    unioned = l_tagged.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col(payload), ignorenulls=True).over(w)
    is_left = F.col(_SIDE) == F.lit(left_side)
    out = (
        unioned.withColumn("__m", matched)
        .filter(is_left)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__m.{dst}").alias(dst) for dst in carried.values()],
        )
    )
    if how == "inner":
        out = out.filter(F.col(f"{ts_col}_right").isNotNull())
    return out
