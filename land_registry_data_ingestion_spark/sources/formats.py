"""Uniform multi-format table IO: parquet, ORC, JSON-lines, CSV.

The reference ingests CSV and serves SQL (SURVEY §2.1); the engine's
canonical store is parquet. This module rounds out the interchange
surface with the other two formats Spark ships built-in — ORC (the other
columnar: footer stats, predicate pushdown) and JSON-lines (the lowest
common denominator for event feeds) — behind one function pair, so a
pipeline stage can switch storage format by argument, not by code.

Schema discipline: text formats (json/csv) don't carry types, so reads
REQUIRE an explicit schema — inference is a full extra pass over the
data at 100 TB and non-deterministic under dirty rows. Columnar formats
embed their schema; passing one anyway pins column order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TEXT_FORMATS = {"json", "csv"}
_FORMATS = {"parquet", "orc"} | _TEXT_FORMATS


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` at ``path`` in ``fmt`` (overwrite). CSV written with
    a header so the file is self-describing for humans; types still come
    from the read-side schema."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (use one of {sorted(_FORMATS)})")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Read a table written by :func:`write_table`. Text formats demand
    ``schema``; FAILFAST mode turns silent corruption into a loud error
    (the same strictness discipline as the CSV ingest gate)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (use one of {sorted(_FORMATS)})")
    r = spark.read.format(fmt)
    if fmt in _TEXT_FORMATS:
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        r = r.schema(schema).option("mode", "FAILFAST")
        if fmt == "csv":
            r = r.option("header", "true")
    elif schema is not None:
        r = r.schema(schema)
    return r.load(path)
