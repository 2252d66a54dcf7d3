"""Tests for Z-order layout (operators/zorder.py) and multi-format IO
(sources/formats.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from land_registry_data_ingestion_spark.operators.zorder import (
    interleave_bits,
    with_zorder_key,
    write_zordered,
)
from land_registry_data_ingestion_spark.sources.formats import (
    read_table,
    write_table,
)


class TestInterleave:
    def test_known_bit_pattern(self, spark):
        # x=0b11, y=0b01, bits=2 → bit layout [y1 x1 y0 x0] = 0b0111 = 7
        df = spark.range(1).select(
            F.lit(3).cast("long").alias("x"), F.lit(1).cast("long").alias("y")
        )
        key = df.select(
            interleave_bits([F.col("x"), F.col("y")], bits=2).alias("k")
        ).collect()[0]["k"]
        assert key == 7

    def test_zero_and_max(self, spark):
        df = spark.range(1).select(
            F.lit(0).cast("long").alias("x"),
            F.lit((1 << 8) - 1).cast("long").alias("y"),
        )
        key = df.select(
            interleave_bits([F.col("x"), F.col("y")], bits=8).alias("k")
        ).collect()[0]["k"]
        # all y bits at odd positions
        assert key == sum(1 << (2 * j + 1) for j in range(8))

    def test_key_added_and_bounds_dropped(self, spark):
        df = spark.createDataFrame(
            [(i, float(i * 7 % 50)) for i in range(100)], ["a", "b"]
        )
        out = with_zorder_key(df, ["a", "b"], bits=8)
        assert set(out.columns) == {"a", "b", "_zkey"}
        assert out.count() == 100


def _files_covering(path: str, column: str, value) -> int:
    """Count parquet files whose footer min/max envelope contains value."""
    import pyarrow.parquet as pq

    n = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index(column)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        if lo <= value <= hi:
            n += 1
    return n


class TestZorderLayout:
    def test_both_columns_prune(self, spark, tmp_path):
        """On a 64×64 grid, the Z-ordered layout must give file-level
        pruning on BOTH columns; the single-column sort gives it on one
        and none on the other — the property Z-order exists for."""
        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            F.floor(F.col("id") / 64).cast("long").alias("y"),
        )
        zpath = str(tmp_path / "zorder")
        write_zordered(grid, zpath, ["x", "y"], n_files=16)
        spath = str(tmp_path / "sorted_x")
        (
            grid.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(spath)
        )
        z_x = _files_covering(zpath, "x", 17)
        z_y = _files_covering(zpath, "y", 17)
        s_x = _files_covering(spath, "x", 17)
        s_y = _files_covering(spath, "y", 17)
        assert z_x <= 8 and z_y <= 8  # both columns prune under Z-order
        assert s_x <= 2  # sort column prunes perfectly...
        assert s_y == 16  # ...the other column not at all
        # read-back equivalence: layout must not change the data
        assert spark.read.parquet(zpath).count() == 64 * 64

    def test_null_and_constant_columns(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(None, 5), (1, 5), (2, 5)], ["a", "b"]
        ).select(F.col("a").cast("long"), F.col("b").cast("long"))
        out = with_zorder_key(df, ["a", "b"], bits=4)
        assert out.count() == 3  # NULL→0, zero-span column → 0; no crash


_ORDERS_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderpriority", StringType()),
    ]
)


class TestFormats:
    @pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
    def test_round_trip(self, spark, tmp_path, fmt):
        src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority",
        )
        path = str(tmp_path / f"orders_{fmt}")
        write_table(src, path, fmt)
        back = read_table(spark, path, fmt, schema=_ORDERS_SCHEMA)
        a = src.agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("s")
        ).collect()[0]
        b = back.agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("s")
        ).collect()[0]
        assert (a["n"], a["s"]) == (b["n"], b["s"])
        top_a = src.orderBy("o_orderkey").limit(3).collect()
        top_b = back.orderBy("o_orderkey").limit(3).collect()
        assert [r.asDict() for r in top_a] == [r.asDict() for r in top_b]

    def test_text_read_requires_schema(self, spark, tmp_path):
        df = spark.range(3).select(F.col("id").alias("a"))
        path = str(tmp_path / "j")
        write_table(df, path, "json")
        with pytest.raises(ValueError):
            read_table(spark, path, "json")

    def test_rejects_unknown_format(self, spark, tmp_path):
        df = spark.range(1)
        with pytest.raises(ValueError):
            write_table(df, str(tmp_path / "x"), "avro-nope")
