"""Q7 history-rewind invariants (SURVEY §5.2): rewinding the versioned
update history must reproduce (a) the original snapshot at version 0 and
(b) the CDC-merge result at the latest version — tying the rewind operator
to the merge operator's semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.merge import (
    cdc_merge,
    init_state,
)
from land_registry_data_ingestion_spark.operators.rewind import (
    number_versions,
    rewind_to_version,
)


def test_rewind_round_trip_with_merge(spark):
    snap_rows = [("k1", 100), ("k2", 200), ("k3", 300)]
    upd_rows = [("k1", 150, "C"), ("k2", 200, "D"), ("k5", 500, "A")]

    snapshot = spark.createDataFrame(snap_rows, ["tuid", "price"]).withColumn(
        "price", F.col("price").cast("long")
    )
    updates = spark.createDataFrame(
        upd_rows, ["tuid", "price", "record_op"]
    ).withColumn("price", F.col("price").cast("long"))

    # history = snapshot as month-0 'A' ops + the month-1 update file
    history = (
        snapshot.withColumn("record_op", F.lit("A"))
        .withColumn("month", F.lit(0))
        .unionByName(updates.withColumn("month", F.lit(1)))
    )
    versioned = number_versions(history, "tuid", ["month"], "version")
    # W1 sanity: per-key ordinals are dense from 0 in month order
    assert {
        (r["tuid"], r["month"], r["version"])
        for r in versioned.collect()
    } == {
        ("k1", 0, 0), ("k1", 1, 1), ("k2", 0, 0), ("k2", 1, 1),
        ("k3", 0, 0), ("k5", 1, 0),
    }

    def live_at(month: int) -> set[tuple]:
        # "as of month M": latest surviving row per key among months <= M
        # (the per-key version ordinal orders a key's history; the as-of
        # cut is on the shared month axis, like the reference's rewind)
        rows = (
            rewind_to_version(versioned, "tuid", "month", month)
            .filter(F.col("record_op") != "D")
            .select("tuid", "price")
            .collect()
        )
        return {(r["tuid"], r["price"]) for r in rows}

    # (a) version 0 reproduces the snapshot exactly
    assert live_at(0) == set(snap_rows)

    # (b) the latest version reproduces cdc_merge's live state
    state = init_state(
        snapshot, batch_timestamp=F.lit(datetime.datetime(2024, 1, 1))
    )
    merged = cdc_merge(
        state,
        updates,
        key_col="tuid",
        value_cols=["price"],
        batch_timestamp=F.lit(datetime.datetime(2024, 2, 1)),
    ).new_state
    merged_live = {
        (r["tuid"], r["price"])
        for r in merged.filter(~F.col("is_deleted"))
        .select("tuid", "price")
        .collect()
    }
    assert live_at(1) == merged_live == {("k1", 150), ("k3", 300), ("k5", 500)}
