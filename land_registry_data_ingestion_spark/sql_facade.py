"""Ad-hoc SQL session: every table (and optionally a state store's
current snapshot) registered as a temp view, so a user of the reference
— who today writes raw SQL / ORM queries against its Postgres state
(`LRD/main2.py`, notebook cells) — can point `spark.sql` at the same
names and run anything, with Catalyst planning the result.

This is deliberately thin: the engine's stance is that ad-hoc analysis
IS Spark SQL — no dialect layer, no query rewriting. What this adds is
the naming contract (the reference's table names resolve) and the state
handoff (the CDC state store surfaces as a queryable view alongside the
raw tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from land_registry_data_ingestion_spark.sources.parquet import (
    TABLE_NAMES,
    load_tables,
)


def register_views(
    spark: SparkSession,
    sf_dir: str,
    store=None,
    state_view: str = "price_paid_state",
) -> list[str]:
    """Register every sf-dir table as a temp view (same names the oracle
    harness and the reference use); if ``store`` is given, also expose
    its current accepted state as ``state_view`` (non-deleted rows, the
    reference's queryable table). Returns the registered names."""
    tables = load_tables(spark, sf_dir)
    names = []
    for name in TABLE_NAMES:
        tables.table(name).createOrReplaceTempView(name)
        names.append(name)
    if store is not None:
        from pyspark.sql import functions as F

        store.current_state().filter(~F.col("is_deleted")).createOrReplaceTempView(
            state_view
        )
        names.append(state_view)
    return names


def sql(spark: SparkSession, sf_dir: str, statement: str, store=None) -> DataFrame:
    """One-shot convenience: register views, run ``statement``."""
    register_views(spark, sf_dir, store=store)
    return spark.sql(statement)
