"""Driver contract for the spark-graft builder (PySpark target).

The engine's declared query set lives in
``land_registry_data_ingestion_spark/plans/`` — one named, oracle-checked
query per operator from SURVEY.md §2 plus the scale-out extensions
(dedup / similarity / text analysis). This module just re-exports it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from land_registry_data_ingestion_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (publication-delay histogram, SURVEY Q1) at sf0.001."""
    from land_registry_data_ingestion_spark.plans.analytics import (
        q1_delay_histogram_days,
    )

    return q1_delay_histogram_days(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted → rows-only check)."""
    return _registry.oracle_sql()
