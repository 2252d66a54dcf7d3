"""CDC merge: A/C/D change-file application as ONE full-outer join pass.

Reproduces the reference's 11-outcome decision matrix
(``LRD/land_registry_monthly_update_database_updater.py:141-341,960-1013``)
— but where the reference runs 3-4 point queries plus a commit *per row*
(``iterrows`` at :960), this operator is a single distributed join:

    current ⟗ updates ON business key  →  when/otherwise cascade  →  new state

Decision matrix (op × existing state → outcome):

    op A (add):     identical → ignore            (:159-164)
                    live, values differ → change  (:166-183)
                    deleted → undelete + change   (:185-200)
                    missing → insert              (:202-212)
    op C (change):  identical → ignore            (:225-230)
                    live, values differ → change  (:232-246)
                    deleted → ignore              (:248-252)
                    missing → insert              (:254-270)
    op D (delete):  identical → delete (soft)     (:293-300)
                    live, values differ → change then delete (:302-318)
                    deleted → ignore              (:320-324)
                    missing → ignore              (:326-336)

"identical" = every value column equal with null-safe semantics (the
reference fills string NAs with '' before comparing — :677,682-704).
Soft deletes: ``is_deleted`` flips, ``deleted_datetime`` stamps; undelete
clears them. Audit stamps mirror db_add_row/db_change_row/db_delete_row/
db_undelete_row (:729-824).

Invariants (enforced, reference crashes via ``.one()`` otherwise):
≤1 row per key in the current state, ≤1 update per key per batch —
``validate_unique`` surfaces violations instead of silently picking one.

Scale: one shuffle by key (SMJ or shuffled hash, AQE picks; broadcast if
the update batch is small, which monthly CDC files are). No per-row
round-trips, no driver loops. Output overwrites the state table
(stage-directory-then-swap for atomicity without a table format).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Outcome vocabulary (op_outcome), feeding the A8 statistics operator.
OUTCOMES = [
    "add_ignore",
    "add_change",
    "add_undelete_change",
    "add_insert",
    "change_ignore",
    "change_change",
    "change_ignore_deleted",
    "change_insert",
    "delete_delete",
    "delete_change_delete",
    "delete_ignore_deleted",
    "delete_ignore_missing",
]


@dataclass
class MergeResult:
    new_state: DataFrame  # post-merge current state (live + soft-deleted)
    outcomes: DataFrame  # one row per update: key, record_op, outcome
    invalid_ops: DataFrame  # updates whose op ∉ A/C/D (reference raises)
    # One row per update: key, old_live/old_<values>, new_live/new_<values>
    # — the before/after images the merge join already holds, exposed so
    # incremental view maintenance (operators/rollup.py) can update
    # aggregates in O(batch) without re-scanning state.
    transitions: DataFrame


def _all_values_equal(
    value_cols: list[str], cur_prefix: str = "cur.", upd_prefix: str = "upd."
) -> Column:
    """Null-safe conjunctive equality over every value column (P4)."""
    return reduce(
        lambda a, b: a & b,
        [
            F.col(f"{cur_prefix}{c}").eqNullSafe(F.col(f"{upd_prefix}{c}"))
            for c in value_cols
        ],
    )


def validate_unique(df: DataFrame, key_col: str) -> DataFrame:
    """Duplicate-key probe (A7): rows whose key appears more than once.

    The caller decides policy; the reference's ``.one()`` would crash.
    """
    return df.groupBy(key_col).agg(F.count("*").alias("n_rows")).filter(
        F.col("n_rows") > 1
    )


def cdc_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    value_cols: list[str],
    op_col: str = "record_op",
    batch_timestamp: Column | None = None,
) -> MergeResult:
    """Apply an A/C/D update batch to the current state in one join pass.

    ``current`` must carry audit columns ``is_deleted`` (bool),
    ``created_datetime``/``updated_datetime``/``deleted_datetime``
    (timestamps, nullable); use :func:`init_state` to bootstrap them.
    ``updates`` carries the key, the value columns and ``op_col`` ∈ A/C/D.
    """
    ts = batch_timestamp if batch_timestamp is not None else F.current_timestamp()

    # Row-presence INDICATORS, not key nullability: a NULL-keyed row on
    # either side never equality-matches, so after the full-outer join it
    # surfaces with its own columns populated but its key NULL — testing
    # the key would misread it as "side absent". That misread made a
    # NULL-keyed update row vanish from outcomes/invalid_ops/ledger
    # (silent batch-accounting loss) and dropped a NULL-keyed state row
    # from new_state on every merge via three-valued filter logic.
    cur = current.withColumn("_cur_present", F.lit(True)).alias("cur")
    upd = updates.withColumn("_upd_present", F.lit(True)).alias("upd")
    joined = cur.join(upd, F.col(f"cur.{key_col}") == F.col(f"upd.{key_col}"), "full_outer")
    return _merge_from_joined(joined, key_col, value_cols, op_col, ts)


def cdc_merge_coderived(
    source: DataFrame,
    cur_filter: Column,
    cur_select: dict[str, Column],
    upd_filter: Column,
    upd_select: dict[str, Column],
    key_col: str,
    value_cols: list[str],
    op_col: str = "record_op",
    batch_timestamp: Column | None = None,
) -> MergeResult:
    """Join-free :func:`cdc_merge` for the co-derived case (round 11,
    guide §2.4 "remove shuffles outright").

    When the current state and the update batch are both row-local
    projections of ONE source table whose join key is the source's own
    unique, non-null key — e.g. a snapshot and a change file derived from
    the same upstream extract — the full-outer join on that key matches
    every row only with itself, so the merge needs no join at all: each
    source row carries its own cur/upd sides. This builds the same
    ``cur``/``upd`` column spaces :func:`cdc_merge`'s join produces — as
    FLAT ``_cur_*``/``_upd_*`` columns gated on the side filter
    (``when(filter, expr)`` is NULL when the side is absent, exactly like
    outer-join nulls; a first struct-column form measured ~1.6× slower
    per row, the per-reference null-check + slot indirection of ~40
    GetStructField reads) — from a single scan with ZERO exchanges, and
    runs the identical decision cascade.

    CALLER CONTRACT (unverified here, this is what makes the rewrite
    equal to the join): the key expression in ``cur_select``/
    ``upd_select`` is the same source column, unique and non-null across
    ``source`` rows, and ``cur_filter``/``upd_filter`` are row-local
    predicates. Inputs that violate it (duplicate or NULL keys, keys that
    differ between the sides of one row) must use :func:`cdc_merge`.

    ``cur_select`` must provide the key, every value column and the
    audit columns (``is_deleted``, ``created_datetime``,
    ``updated_datetime``, ``deleted_datetime``); ``upd_select`` the key,
    value columns and ``op_col``.
    """
    from land_registry_data_ingestion_spark.util import spread

    ts = batch_timestamp if batch_timestamp is not None else F.current_timestamp()
    # spread: the join-free plan runs the decision cascade and the
    # aggregate partials ON the scan stage; a small replicated tier can
    # arrive as 1-2 splits, serializing that work. No-op once the input
    # has ≥ parallelism files (any real-scale table).
    source = spread(source)
    cur_cols = {**cur_select, "_cur_present": F.lit(True)}
    upd_cols = {**upd_select, "_upd_present": F.lit(True)}
    joined = source.filter(cur_filter | upd_filter).select(
        *[F.when(cur_filter, c).alias(f"_cur_{n}") for n, c in cur_cols.items()],
        *[F.when(upd_filter, c).alias(f"_upd_{n}") for n, c in upd_cols.items()],
    )
    return _merge_from_joined(
        joined,
        key_col,
        value_cols,
        op_col,
        ts,
        cur_prefix="_cur_",
        upd_prefix="_upd_",
    )


def _merge_from_joined(
    joined: DataFrame,
    key_col: str,
    value_cols: list[str],
    op_col: str,
    ts: Column,
    cur_prefix: str = "cur.",
    upd_prefix: str = "upd.",
) -> MergeResult:
    """Decision cascade + projections over the joined cur/upd row space —
    either a real full-outer join (alias-scoped "cur."/"upd." columns)
    or the co-derived flat form ("_cur_"/"_upd_" attributes)."""

    def cur(n: str) -> Column:
        return F.col(f"{cur_prefix}{n}")

    def upd(n: str) -> Column:
        return F.col(f"{upd_prefix}{n}")

    cur_exists = cur("_cur_present").isNotNull()
    upd_exists = upd("_upd_present").isNotNull()
    upd_keyed = upd_exists & upd(key_col).isNotNull()
    cur_deleted = cur_exists & cur("is_deleted")
    cur_live = cur_exists & ~cur("is_deleted")
    identical = cur_live & _all_values_equal(value_cols, cur_prefix, upd_prefix)
    op = upd(op_col)

    outcome = (
        F.when(~upd_exists, F.lit(None).cast("string"))  # untouched state row
        # a NULL key can address no row (the reference's PK is NOT NULL —
        # its per-row path would fail the batch); surfaced like invalid
        # ops so callers can reject the batch, counted in the ledger's
        # input_file_row_count only.
        .when(~upd_keyed, F.lit("invalid_key"))
        .when(
            op == "A",
            F.when(identical, "add_ignore")
            .when(cur_live, "add_change")
            .when(cur_deleted, "add_undelete_change")
            .otherwise("add_insert"),
        )
        .when(
            op == "C",
            F.when(identical, "change_ignore")
            .when(cur_live, "change_change")
            .when(cur_deleted, "change_ignore_deleted")
            .otherwise("change_insert"),
        )
        .when(
            op == "D",
            F.when(identical, "delete_delete")
            .when(cur_live, "delete_change_delete")
            .when(cur_deleted, "delete_ignore_deleted")
            .otherwise("delete_ignore_missing"),
        )
        .otherwise(F.lit("invalid_op"))
    )

    annotated = joined.withColumn("_outcome", outcome)

    takes_update_values = F.col("_outcome").isin(
        "add_change",
        "add_undelete_change",
        "add_insert",
        "change_change",
        "change_insert",
        "delete_change_delete",
    )
    becomes_deleted = F.col("_outcome").isin(
        "delete_delete", "delete_change_delete"
    ) | (F.col("_outcome").isNull() & F.coalesce(cur("is_deleted"), F.lit(False)))
    becomes_undeleted = F.col("_outcome") == "add_undelete_change"
    is_insert = F.col("_outcome").isin("add_insert", "change_insert")
    is_change = F.col("_outcome").isin(
        "add_change", "add_undelete_change", "change_change", "delete_change_delete"
    )

    key = F.coalesce(cur(key_col), upd(key_col)).alias(key_col)
    values = [
        F.when(takes_update_values, upd(c))
        .otherwise(cur(c))
        .alias(c)
        for c in value_cols
    ]
    audit = [
        F.when(is_insert, ts).otherwise(cur("created_datetime")).alias(
            "created_datetime"
        ),
        F.when(is_change, ts).otherwise(cur("updated_datetime")).alias(
            "updated_datetime"
        ),
        F.when(becomes_undeleted, F.lit(None).cast("timestamp"))
        .when(
            F.col("_outcome").isin("delete_delete", "delete_change_delete"), ts
        )
        .otherwise(cur("deleted_datetime"))
        .alias("deleted_datetime"),
        F.when(becomes_undeleted, F.lit(False))
        .when(becomes_deleted, F.lit(True))
        .otherwise(F.coalesce(cur("is_deleted"), F.lit(False)))
        .alias("is_deleted"),
    ]

    # Cases where the update side exists but nothing may be inserted: a
    # delete aimed at a missing key (reference :326-336 ignores it), an
    # unrecognized/null op against a missing key, and any NULL-keyed
    # update — without these exclusions the full-outer join would
    # materialize a phantom row with the update's key (or NULL) and
    # all-NULL values/audit. An invalid op against an EXISTING key keeps
    # the current row untouched (takes_update_values is false), mirroring
    # "ignore"; the rows themselves are surfaced on
    # ``MergeResult.invalid_ops`` so callers can fail the batch the way
    # the reference's RuntimeError does (database_updater.py:1011-1013).
    # Both predicates are wrapped null-safe (outcome is NULL on untouched
    # state rows; a bare comparison would three-valued-drop them).
    #
    # phantom is stated over the BASE flags, not over _outcome (round 11,
    # guide §1.2/§4.4-class duplication with native expressions): filter
    # pushdown substitutes a referenced alias into the pushed predicate,
    # so `_outcome == ...` inlined the whole 12-way cascade into the
    # filter — the optimizer's NOT/null rewrites then multiplied it to
    # ~17 cascade copies per row (measured: the filter alone cost more
    # than the rest of the query; optimized plan carried 88 CASE WHENs).
    # The flag form is provably the same rows: with `miss` = the cascade
    # reached its op-branch `otherwise` (identical/cur_live/cur_deleted
    # all not-TRUE),
    #   _outcome = 'delete_ignore_missing' ⟺ upd_keyed ∧ op='D' ∧ miss
    #   _outcome = 'invalid_key'           ⟺ upd_exists ∧ ¬upd_keyed
    #   _outcome = 'invalid_op'            ⟺ upd_keyed ∧ op ∉ {A,C,D}
    # (each arm null-safe so phantom is never NULL).
    miss = (
        ~F.coalesce(identical, F.lit(False))
        & ~F.coalesce(cur_live, F.lit(False))
        & ~F.coalesce(cur_deleted, F.lit(False))
    )
    phantom = upd_exists & (
        (upd_keyed & F.coalesce(op == "D", F.lit(False)) & miss)
        | (~upd_keyed & ~cur_exists)
        | (
            upd_keyed
            & ~F.coalesce(op.isin("A", "C", "D"), F.lit(False))
            & ~cur_exists
        )
    )
    new_state = annotated.filter(~phantom).select(key, *values, *audit)

    outcomes = annotated.filter(upd_exists).select(
        upd(key_col).alias(key_col),
        upd(op_col).alias(op_col),
        F.col("_outcome").alias("outcome"),
    )
    invalid_ops = outcomes.filter(
        F.col("outcome").isin("invalid_op", "invalid_key")
    )

    # Before/after images for IVM: same annotated probe, no extra join.
    # A touched row is live AFTER the merge iff it survives into
    # new_state and its final is_deleted is false (same expressions the
    # state projection uses).
    survives = ~phantom
    new_is_deleted = (
        F.when(becomes_undeleted, F.lit(False))
        .when(becomes_deleted, F.lit(True))
        .otherwise(F.coalesce(cur("is_deleted"), F.lit(False)))
    )
    # keyed only: a NULL-keyed update touches no state, so it has no
    # before/after image — and a NULL group key would pollute IVM rollups
    transitions = annotated.filter(upd_keyed).select(
        upd(key_col).alias(key_col),
        cur_live.alias("old_live"),
        *[cur(c).alias(f"old_{c}") for c in value_cols],
        (survives & ~new_is_deleted).alias("new_live"),
        *[
            F.when(takes_update_values, upd(c))
            .otherwise(cur(c))
            .alias(f"new_{c}")
            for c in value_cols
        ],
    )
    return MergeResult(
        new_state=new_state,
        outcomes=outcomes,
        invalid_ops=invalid_ops,
        transitions=transitions,
    )


def init_state(
    snapshot: DataFrame, batch_timestamp: Column | None = None
) -> DataFrame:
    """Bootstrap audit columns on a freshly loaded snapshot (S11 load)."""
    ts = batch_timestamp if batch_timestamp is not None else F.current_timestamp()
    return (
        snapshot.withColumn("created_datetime", ts)
        .withColumn("updated_datetime", F.lit(None).cast("timestamp"))
        .withColumn("deleted_datetime", F.lit(None).cast("timestamp"))
        .withColumn("is_deleted", F.lit(False))
    )


def merge_outcome_stats(outcomes: DataFrame, op_col: str = "record_op") -> DataFrame:
    """A8: per-(op, outcome) counts — the normalized form of the operation
    ledger (reference ``...database_updater.py:48-84,1059-1117``)."""
    return outcomes.groupBy(op_col, "outcome").agg(F.count("*").alias("n_rows"))


def merge_ledger(outcomes: DataFrame, op_col: str = "record_op") -> DataFrame:
    """A8 full parity: the reference's 17-counter operation-log row
    (``...database_updater.py:48-84`` defines the counters,
    ``:1059-1117`` assembles the row) as ONE conditional-sum aggregate
    over the outcomes frame — single pass, single output row.

    Counter mapping (reference column ← this engine's outcome labels):

    - ``input_file_row_count``            ← all updates
    - ``input_file_row_count_insert``     ← op = 'A'
    - ``input_file_row_count_update``     ← op = 'C'
    - ``input_file_row_count_delete``     ← op = 'D'
    - ``operation_count_insert``          ← add_insert + change_insert
    - ``operation_count_update``          ← add_change + change_change
                                            + add_undelete_change
    - ``operation_count_delete``          ← delete_delete + delete_change_delete
    - ``operation_count_ignored``         ← every *_ignore* outcome
    - ``operation_count_insert_insert``   ← add_insert
    - ``operation_count_insert_update``   ← add_change + add_undelete_change
    - ``operation_count_insert_ignore``   ← add_ignore (the reference's
      extra add_but_deleted_and_ignored leg is marked "[no longer in
      use]" there — adds to deleted keys take its *_changed* leg)
    - ``operation_count_update_update``   ← change_change
    - ``operation_count_update_insert``   ← change_insert
    - ``operation_count_update_ignore``   ← change_ignore + change_ignore_deleted
    - ``operation_count_delete_delete``   ← delete_delete
    - ``operation_count_delete_change_delete`` ← delete_change_delete
    - ``operation_count_delete_ignore``   ← delete_ignore_missing
                                            + delete_ignore_deleted

    ``invalid_op`` / ``invalid_key`` rows count in the
    ``input_file_row_count*`` totals only — no operation was performed
    (the reference fails the whole batch instead; callers get the same
    option via ``MergeResult.invalid_ops``).
    """
    o = F.col("outcome")

    def cnt(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    return outcomes.agg(
        F.count("*").cast("long").alias("input_file_row_count"),
        cnt(F.col(op_col) == "A", "input_file_row_count_insert"),
        cnt(F.col(op_col) == "C", "input_file_row_count_update"),
        cnt(F.col(op_col) == "D", "input_file_row_count_delete"),
        cnt(o.isin("add_insert", "change_insert"), "operation_count_insert"),
        cnt(
            o.isin("add_change", "change_change", "add_undelete_change"),
            "operation_count_update",
        ),
        cnt(o.isin("delete_delete", "delete_change_delete"), "operation_count_delete"),
        cnt(
            o.isin(
                "add_ignore",
                "change_ignore",
                "change_ignore_deleted",
                "delete_ignore_deleted",
                "delete_ignore_missing",
            ),
            "operation_count_ignored",
        ),
        cnt(o == "add_insert", "operation_count_insert_insert"),
        cnt(
            o.isin("add_change", "add_undelete_change"),
            "operation_count_insert_update",
        ),
        cnt(o == "add_ignore", "operation_count_insert_ignore"),
        cnt(o == "change_change", "operation_count_update_update"),
        cnt(o == "change_insert", "operation_count_update_insert"),
        cnt(
            o.isin("change_ignore", "change_ignore_deleted"),
            "operation_count_update_ignore",
        ),
        cnt(o == "delete_delete", "operation_count_delete_delete"),
        cnt(o == "delete_change_delete", "operation_count_delete_change_delete"),
        cnt(
            o.isin("delete_ignore_missing", "delete_ignore_deleted"),
            "operation_count_delete_ignore",
        ),
    )
