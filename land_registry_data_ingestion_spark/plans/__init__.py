"""Declared query set: the engine's oracle-checked benchmark suite."""

from land_registry_data_ingestion_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
    query,
)

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql", "query"]
