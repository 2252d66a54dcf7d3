"""Sources and sinks: parquet tables, headerless CSV snapshots, binary files."""

from land_registry_data_ingestion_spark.sources.parquet import Tables, load_tables
from land_registry_data_ingestion_spark.sources.csv import (
    read_price_paid_csv,
    read_price_paid_text,
)

__all__ = ["Tables", "load_tables", "read_price_paid_csv", "read_price_paid_text"]
