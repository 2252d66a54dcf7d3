"""Runtime bloom-filter injection: the Catalyst feature that semi-joins
a compact filter of the selective (dim) side into the fact scan before
the shuffle — at 100 TB this is the difference between shuffling the
full fact table and shuffling the ~matching slice. The engine relies on
it being ON; this test pins that a selective dim join actually gets the
filter injected once the size thresholds reflect cluster reality (the
defaults assume a 10 GB+ application side, which local test data never
reaches — production confs keep the defaults)."""

from __future__ import annotations

import pytest

from tests.test_plans import explain_str


@pytest.fixture()
def rf_conf(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_join_injects_bloom_filter(rf_conf):
    spark = rf_conf
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    from pyspark.sql import functions as F

    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    joined = lineitem.join(dim, lineitem.l_orderkey == dim.o_orderkey).select(
        F.sum("l_quantity").alias("q")
    )
    plan = explain_str(joined, "simple").lower()
    assert "bloomfilter" in plan or "bloom_filter" in plan, plan[:2000]
    # and the result is unaffected by the filter
    assert joined.collect()[0]["q"] is not None
