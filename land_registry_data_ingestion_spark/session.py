"""SparkSession factory with scale-oriented defaults.

The engine targets large clusters (100 TB inputs, ~1000 executors); the same
settings degrade gracefully on ``local[N]`` where tests and the bench run.
Everything here is standard Apache Spark configuration — AQE for runtime
re-planning (skew joins, partition coalescing), UTC session time zone so
timestamp semantics match the ANSI-SQL oracle, Arrow for the few
Pandas-UDF-backed operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local harness; on a real cluster these come from spark-submit.
_DEFAULTS = {
    # Runtime adaptivity: coalesce post-shuffle partitions, split skewed
    # partitions, demote/promote join strategies with real statistics.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp semantics; matches DuckDB's naive timestamps.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas_udf / applyInPandas / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Small dims (region/nation/weights/bin-edges) should broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Sane shuffle width for local mode; cluster deployments override.
    "spark.sql.shuffle.partitions": "32",
    # Parquet scans: allow large-enough splits that small SFs read in few
    # tasks but 100 TB reads parallelize to ~128MB splits.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # JIT code cache: a long-lived session compiling ~100 whole-stage-
    # codegen'd queries outgrows the JVM's default 240 MB reserved code
    # cache; once full the compiler is disabled and generated stages run
    # INTERPRETED — measured as bimodal 5 s / 36 s runs of the same plan
    # with 8× the CPU time and no GC/IO signal. Reserve enough that the
    # full declared query set stays compiled (driver == executor in local
    # mode; cluster deployments set executor options too).
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
}


def get_spark(
    app_name: str = "land-registry-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so the
    driver harness and bench share one code path; in a cluster deployment
    the master comes from the environment and this argument is ignored.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
