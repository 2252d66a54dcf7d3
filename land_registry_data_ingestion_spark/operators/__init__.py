"""Composed DataFrame operators (the engine's library surface)."""

from land_registry_data_ingestion_spark.operators.binning import bin_into_intervals
from land_registry_data_ingestion_spark.operators.merge import (
    MergeResult,
    cdc_merge,
    merge_outcome_stats,
)
from land_registry_data_ingestion_spark.operators.reconcile import reconcile
from land_registry_data_ingestion_spark.operators.rewind import (
    number_versions,
    rewind_to_version,
)

__all__ = [
    "bin_into_intervals",
    "cdc_merge",
    "MergeResult",
    "merge_outcome_stats",
    "reconcile",
    "number_versions",
    "rewind_to_version",
]
