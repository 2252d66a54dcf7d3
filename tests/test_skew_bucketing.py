"""Scale-strategy exhibits: salted joins under key skew, and bucketed
tables joining without a shuffle (co-located join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 10k rows, 90% on one hot key — the classic skew shape
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("HOT", 1), ("k5", 2), ("missing", 3)], ["k", "dim"]
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(spark, skewed, how):
    big, small = skewed
    plain = big.join(small, on=["k"], how=how)
    salted = salted_join(big, small, on=["k"], n_salts=8, how=how)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_spreads_hot_key(spark, skewed):
    big, small = skewed
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(8))
    n_buckets = (
        big.filter(F.col("k") == "HOT")
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets == 8  # the hot key really fans out over all salts


def test_salted_join_rejects_full_outer(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, on=["k"], how="full_outer")


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the exchange: the
    join reads co-located buckets directly (the 100 TB recurring-join
    pattern — pay the shuffle once at write time, never at read time)."""
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("fact_b")
    spark.range(1_000).select(
        F.col("id").alias("k"), F.lit("d").alias("d")
    ).write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("dim_b")

    joined = (
        spark.table("fact_b")
        .hint("merge")  # force SMJ so the exchange (or its absence) shows
        .join(spark.table("dim_b"), "k")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == 1_000
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
