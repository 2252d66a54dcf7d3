"""Ad-hoc SQL surface (sql_facade.py): reference table names resolve,
arbitrary SQL runs, and the CDC state store is queryable by name."""

from __future__ import annotations

from land_registry_data_ingestion_spark import sql_facade
from tests.conftest import SF_CORRECTNESS


def test_tables_resolve_and_join(spark):
    out = sql_facade.sql(
        spark,
        SF_CORRECTNESS,
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """,
    )
    rows = out.collect()
    assert len(rows) == 3 and rows[0]["n"] >= rows[-1]["n"]


def test_state_store_registered_as_view(spark, tmp_path):
    from land_registry_data_ingestion_spark.operators.ingest import (
        ingest_snapshot,
    )
    from land_registry_data_ingestion_spark.operators.state import ManifestStore
    from tests.test_manifest_state import SNAP, _write

    store = ManifestStore(spark=spark, root=str(tmp_path / "s"))
    ingest_snapshot(store, _write(tmp_path, "snap.csv", SNAP), run_id="r0")
    names = sql_facade.register_views(spark, SF_CORRECTNESS, store=store)
    assert "price_paid_state" in names
    n = spark.sql("SELECT COUNT(*) AS n FROM price_paid_state").collect()[0]["n"]
    assert n == len(SNAP)
