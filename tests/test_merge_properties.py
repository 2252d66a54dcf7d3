"""Property-based CDC merge testing (SURVEY §5.2).

Hypothesis drives random op sequences through ``cdc_merge`` and through a
trivial single-threaded reference model of the decision matrix; the two
must agree on every key's (price, is_deleted) after every batch.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from land_registry_data_ingestion_spark.operators.merge import cdc_merge, init_state

KEYS = [f"k{i}" for i in range(8)]

op_strategy = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["A", "C", "D"]),
    st.integers(min_value=1, max_value=3),  # small value domain → collisions
)


def model_apply(model: dict, batch: list[tuple[str, str, int]]) -> None:
    """Single-threaded reference implementation of the decision matrix."""
    for key, op, price in batch:
        cur = model.get(key)  # (price, is_deleted) | None
        identical = cur is not None and not cur[1] and cur[0] == price
        live = cur is not None and not cur[1]
        deleted = cur is not None and cur[1]
        if op == "A":
            if identical:
                pass
            elif live or deleted:
                model[key] = (price, False)
            else:
                model[key] = (price, False)
        elif op == "C":
            if identical or deleted:
                pass
            elif live:
                model[key] = (price, False)
            else:
                model[key] = (price, False)
        else:  # D
            if identical:
                model[key] = (cur[0], True)
            elif live:
                model[key] = (price, True)
            # deleted / missing → ignore


UPD_SCHEMA = T.StructType(
    [
        T.StructField("tuid", T.StringType(), False),
        T.StructField("price", T.LongType(), True),
        T.StructField("record_op", T.StringType(), False),
    ]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(op_strategy, min_size=1, max_size=6, unique_by=lambda t: t[0]),
        min_size=1,
        max_size=4,
    )
)
def test_merge_agrees_with_model(spark, batches):
    snapshot = spark.createDataFrame(
        [("k0", 1), ("k1", 2)], ["tuid", "price"]
    ).withColumn("price", F.col("price").cast("long"))
    state = init_state(
        snapshot, batch_timestamp=F.lit(datetime.datetime(2024, 1, 1))
    )
    model = {"k0": (1, False), "k1": (2, False)}

    for i, batch in enumerate(batches):
        updates = spark.createDataFrame(
            [(k, p, op) for (k, op, p) in batch], UPD_SCHEMA
        )
        state = cdc_merge(
            state,
            updates,
            key_col="tuid",
            value_cols=["price"],
            batch_timestamp=F.lit(datetime.datetime(2024, 1, 2 + i)),
        ).new_state
        model_apply(model, batch)

    got = {
        r["tuid"]: (r["price"], r["is_deleted"]) for r in state.collect()
    }
    assert got == model
