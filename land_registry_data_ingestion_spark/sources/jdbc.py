"""JDBC source/sink (SURVEY S10).

The reference's analytics read Postgres via SQLAlchemy + pandas
(``Analysis/main.py:24-52``): a 4-column projection with an
``is_deleted = 'F'`` predicate, materialized through a single driver-side
cursor. Spark-first, the same scan is declared on the DataFrame and
Catalyst compiles it INTO the remote query — ``.explain`` shows
``PushedFilters`` and a pruned ``ReadSchema``, so the database ships only
the needed columns and rows — and a partitioned read
(``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``)
splits the scan into parallel range queries instead of one cursor.

At 100 TB the JDBC path is for DIMENSION-sized data (reference state,
lookup tables); fact-scale state lives in parquet. The reader therefore
defaults to a single partition and makes the parallel form explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Scan ``table`` over JDBC with projection/predicate pushed down.

    ``columns``/``predicate`` are expressed as DataFrame operations so
    Catalyst pushes them into the generated SQL (verified by
    ``tests/test_jdbc.py`` against the physical plan). With
    ``partition_column`` + bounds the scan issues ``num_partitions``
    parallel range queries (the 100 TB-cluster shape for big JDBC pulls).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads need num_partitions, lower_bound "
                "and upper_bound alongside partition_column"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    if predicate is not None:
        df = df.filter(predicate)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "errorifexists",
    options: dict[str, str] | None = None,
) -> None:
    """Write ``df`` to a JDBC table. Default mode mirrors the snapshot
    sink's error-if-exists discipline (S5); pass ``overwrite``/``append``
    explicitly for replace/append semantics."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def analysis_scan(
    spark: SparkSession, url: str, table: str = "price_paid_data"
) -> DataFrame:
    """The reference's analytics extraction (``Analysis/main.py:24-52``):
    audit timestamps + transaction_date for live rows only — here with
    both the projection and the ``is_deleted`` predicate pushed to the
    database instead of filtering a full pandas pull."""
    return read_jdbc(
        spark,
        url,
        table,
        columns=[
            "created_datetime",
            "updated_datetime",
            "deleted_datetime",
            "transaction_date",
        ],
        predicate="is_deleted = false",
    )
