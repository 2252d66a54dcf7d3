"""Parquet table catalog over a scale-factor directory.

The driver's synthetic tables (TESTDATA.md) stand in for the engine's
partitioned-Parquet state store. At 100 TB the same reader works unchanged:
``spark.read.parquet`` hands Catalyst a relation that supports predicate
pushdown, column pruning, and partition pruning for free — the scan only
materializes what downstream operators reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Tables:
    """Lazy handle to the parquet tables in one scale-factor directory."""

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        return self.table(name)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            # Pin UTC at read time: the engine's timestamp semantics (and
            # any ANSI-SQL oracle comparing against it) must not depend on
            # the host/session timezone of whoever built the SparkSession.
            try:
                self.spark.conf.set("spark.sql.session.timeZone", "UTC")
            except Exception:
                pass
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if name == "events":
                # events.ts is parquet TIMESTAMP(NANOS), which the Spark
                # vectorized reader rejects; read the physical INT64 and
                # truncate nanos → micros (Spark timestamp precision).
                # Set at read time so this works under any caller's session.
                try:
                    self.spark.conf.set(
                        "spark.sql.legacy.parquet.nanosAsLong", "true"
                    )
                except Exception:
                    pass
                df = self.spark.read.parquet(path)
                if dict(df.dtypes).get("ts") == "bigint":
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
                self._cache[name] = self._normalize_ntz(df)
            else:
                self._cache[name] = self._normalize_ntz(
                    self.spark.read.parquet(path)
                )
        return self._cache[name]

    @staticmethod
    def _normalize_ntz(df: DataFrame) -> DataFrame:
        # Parquet TIMESTAMP(isAdjustedToUTC=false) arrives as
        # TIMESTAMP_NTZ, which functions like unix_micros reject. With the
        # session timezone pinned UTC (above) the cast to the regular
        # timestamp type is value-preserving, and every query sees ONE
        # timestamp type regardless of how a given sf_dir was written.
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        for c in ntz:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df

    def register_views(self) -> None:
        """Register every table as a temp view for ``spark.sql`` access."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark=spark, sf_dir=sf_dir)
