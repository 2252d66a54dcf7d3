"""The reference's analytical suite (SURVEY §2.8 Q1-Q5) on the test tables.

The reference computes the *publication-delay distribution*: the lag between
a transaction's event time and the time it first appeared in a published
file, normalized by per-bin transaction volume and smoothed
(``LRD/Analysis/main.py:50-107``, ``Analysis/normalized_delay.ipynb``).

Mapping onto the driver's star schema: ``o_orderdate`` plays the event time
(transaction_date) and ``l_shipdate`` plays the publication time
(created_datetime); each lineitem is one published row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from land_registry_data_ingestion_spark.operators.binning import bin_into_intervals
from land_registry_data_ingestion_spark.plans.registry import query
from land_registry_data_ingestion_spark.sources.parquet import load_tables


def _delays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delay_days per published row (lineitem ⋈ orders on the key).

    Equi join on l_orderkey; at scale this is an SMJ/shuffled hash join on
    the natural key — or a broadcast if the orders side is filtered small.
    Only 2 columns survive the scan on each side (column pruning).
    """
    t = load_tables(spark, sf_dir)
    # to_date() is applied in the scan-side projections, BEFORE the join
    # (round 11, guide §2.3 "narrower types"): the join's build/shuffle
    # side then carries 4-byte dates instead of 8-byte timestamps, and
    # the delay filter — which Catalyst pushes into the join condition —
    # evaluates datediff on pre-cast dates instead of re-casting both
    # timestamps per probed row. datediff(to_date(x), to_date(y)) is the
    # same function composition either way, so delay_days is provably
    # unchanged.
    li = t.lineitem.select(
        "l_orderkey", F.to_date("l_shipdate").alias("_ship_d")
    )
    o = t.orders.select("o_orderkey", F.to_date("o_orderdate").alias("_ord_d"))
    # MERGE hint (round 11, guide §3.1 "pick the strategy deliberately"):
    # fact ⋈ fact on the natural key must never broadcast — both sides
    # grow with the corpus, and the compressed-parquet size estimate
    # sits under the broadcast threshold well past the point where the
    # driver-side single-threaded HashedRelation build dominates the
    # query (measured at the 6M-row tier: SMJ min 3.04 s vs broadcast
    # 3.98 s, and the 64 MB "estimate" materializes as a multi-hundred-
    # MB driver relation). Sort-merge is the honest both-sides-large
    # strategy at every tier; join strategy cannot change the rows.
    return li.hint("merge").join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "delay_days",
        F.datediff(F.col("_ship_d"), F.col("_ord_d")).cast("long"),
    )


_DELAY_DAYS_SQL = """
    SELECT date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
             AS delay_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@query(
    "q1_delay_histogram_days",
    sql=f"""
    SELECT delay_days, COUNT(*) AS n_rows
    FROM ({_DELAY_DAYS_SQL})
    WHERE delay_days >= 0 AND delay_days < 360
    GROUP BY delay_days
    """,
)
def q1_delay_histogram_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: raw delay histogram, daily bins, delay < 360 days
    (reference ``LRD/Analysis/main.py:50-107``)."""
    return (
        _delays(spark, sf_dir)
        .filter((F.col("delay_days") >= 0) & (F.col("delay_days") < 360))
        .groupBy("delay_days")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "q1_delay_histogram_weeks",
    sql=f"""
    SELECT CAST(FLOOR(delay_days / 7.0) AS BIGINT) AS delay_weeks,
           COUNT(*) AS n_rows
    FROM ({_DELAY_DAYS_SQL})
    WHERE delay_days >= 0 AND delay_days < 1000
    GROUP BY 1
    """,
)
def q1_delay_histogram_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 variant: weekly bins (integer floor division F4), delay < 1000."""
    return (
        _delays(spark, sf_dir)
        .filter((F.col("delay_days") >= 0) & (F.col("delay_days") < 1000))
        .withColumn("delay_weeks", F.floor(F.col("delay_days") / 7.0))
        .groupBy("delay_weeks")
        .agg(F.count("*").alias("n_rows"))
    )


# Q2: pandas.cut-style interval binning. Bin edges = an irregular, small,
# data-derived series (the reference uses the sorted distinct publish dates,
# Analysis/normalized_delay.ipynb cells 8-18). Edges are broadcast; see
# operators/binning.py for the scale discussion.
_EDGES_SQL = """
    SELECT DISTINCT o_orderdate AS edge FROM orders WHERE o_orderkey % 1000 = 0
"""

_BINNED_SQL = f"""
    SELECT l.l_orderkey, l.l_shipdate, b.bin_lo, b.bin_hi
    FROM lineitem l
    JOIN (
        SELECT edge AS bin_lo, LEAD(edge) OVER (ORDER BY edge) AS bin_hi
        FROM ({_EDGES_SQL})
    ) b
    ON l.l_shipdate > b.bin_lo AND l.l_shipdate <= b.bin_hi
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_orderkey") % 1000 == 0)
        .select(F.col("o_orderdate").alias("edge"))
        .distinct()
    )


def _binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return bin_into_intervals(
        t.lineitem.select("l_orderkey", "l_shipdate"),
        "l_shipdate",
        _edges(spark, sf_dir),
        "edge",
    )


@query(
    "q2_interval_binning",
    sql=f"""
    SELECT bin_lo, bin_hi, COUNT(*) AS n_rows
    FROM ({_BINNED_SQL})
    GROUP BY bin_lo, bin_hi
    """,
)
def q2_interval_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: bin publication timestamps into (lo, hi] intervals between
    consecutive data-derived edges; count per interval. Rows outside every
    interval drop (pandas.cut NaN semantics)."""
    return _binned(spark, sf_dir).groupBy("bin_lo", "bin_hi").agg(
        F.count("*").alias("n_rows")
    )


@query(
    "q3_inverse_volume_weights",
    sql=f"""
    SELECT bin_lo, COUNT(*) AS n_rows,
           ROUND(1.0 / COUNT(*), 9) AS weight
    FROM ({_BINNED_SQL})
    GROUP BY bin_lo
    """,
)
def q3_inverse_volume_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: inverse-volume weight per bin — weight = 1/count
    (normalized_delay.ipynb cell 22, SURVEY A6)."""
    return (
        _binned(spark, sf_dir)
        .groupBy("bin_lo")
        .agg(F.count("*").alias("n_rows"))
        .withColumn("weight", F.round(F.lit(1.0) / F.col("n_rows"), 9))
    )


_NORMALIZED_SQL = f"""
    WITH binned AS ({_BINNED_SQL}),
    per_bin_delay AS (
        SELECT bin_lo,
               date_diff('day', CAST(bin_lo AS DATE), CAST(l_shipdate AS DATE))
                 AS delay_days,
               COUNT(*) AS cnt
        FROM binned GROUP BY 1, 2
    ),
    weighted AS (
        SELECT delay_days, cnt,
               CAST(ROUND(1.0 / SUM(cnt) OVER (PARTITION BY bin_lo), 9)
                    AS DOUBLE) AS weight
        FROM per_bin_delay
    )
    SELECT delay_days,
           ROUND(SUM(cnt * weight), 6) AS weighted_n,
           CAST(SUM(cnt) AS BIGINT) AS n_rows
    FROM weighted GROUP BY delay_days
"""


@query("q4_normalized_delay", sql=_NORMALIZED_SQL)
def q4_normalized_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: volume-normalized delay distribution (normalized_delay.ipynb
    cells 28-30). One binning pass, then pre-aggregate to
    (bin_lo, delay_days) counts — map-side combine collapses the fact rows
    before any shuffle, and the per-bin totals/weights come from a window
    over that tiny aggregated frame instead of a second pass + join over
    the facts (the reference's join-then-sum per ROW is algebraically
    cnt × weight per GROUP)."""
    binned = _binned(spark, sf_dir)
    per_bin_delay = (
        binned.withColumn(
            "delay_days",
            F.datediff(F.to_date("l_shipdate"), F.to_date("bin_lo")).cast("long"),
        )
        .groupBy("bin_lo", "delay_days")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("bin_lo")
    weighted = per_bin_delay.withColumn(
        "weight", F.round(F.lit(1.0) / F.sum("cnt").over(w), 9)
    )
    return weighted.groupBy("delay_days").agg(
        F.round(F.sum(F.col("cnt") * F.col("weight")), 6).alias("weighted_n"),
        F.sum("cnt").alias("n_rows"),
    )


@query(
    "q5_smoothed_delay",
    sql=f"""
    SELECT delay_days,
           ROUND(AVG(weighted_n) OVER (
               ORDER BY delay_days ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
           ), 6) AS smoothed_weighted_n
    FROM ({_NORMALIZED_SQL})
    """,
)
def q5_smoothed_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: 7-row centered rolling mean over the delay axis (W2) —
    positional semantics over sorted rows, exactly the reference's
    ``rolling(window=7, center=True)`` (normalized_delay.ipynb cell 42)."""
    normalized = q4_normalized_delay(spark, sf_dir)
    # Unpartitioned window = one task, which is safe ONLY because the input
    # is the aggregated delay axis (~400 rows at any data scale — bounded by
    # the distinct delay values, not the row count). Do not reuse this window
    # shape over an unaggregated input.
    w = Window.orderBy("delay_days").rowsBetween(-3, 3)
    return normalized.select(
        "delay_days",
        F.round(F.avg("weighted_n").over(w), 6).alias("smoothed_weighted_n"),
    )
