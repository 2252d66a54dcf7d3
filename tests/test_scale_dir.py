"""The bench/probe scale-dir builder must preserve key-group structure:
replica ids live in disjoint stride slots, so replicating a table ×m
multiplies every key-group COUNT by exactly 1 (keys stay unique) and
every content-family SIZE by exactly m. Round 6 found the ×80+ tiers
silently overflowing a stride of 64 — colliding ids chained unrelated
duplicate families together and corrupted every key-grouped measurement
on the grown tiers (bench.py KEY_STRIDE)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import bench


@pytest.fixture()
def scale_dir(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    saved = bench.SCALE_SPEC
    bench.SCALE_SPEC = {"documents": ("doc_id", 3)}
    try:
        out, _, rows = bench.build_scale_dir(spark, "/root/testdata/sf0.001")
        yield out, rows
    finally:
        bench.SCALE_SPEC = saved


def test_replication_preserves_key_uniqueness(spark, scale_dir):
    out, rows = scale_dir
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scaled = spark.read.parquet(os.path.join(out, "documents.parquet"))
    n_base = base.count()
    assert rows["documents"] == 3 * n_base
    # keys stay unique: no replica slot may collide with a neighboring key
    assert scaled.select("doc_id").distinct().count() == 3 * n_base


def test_replication_scales_content_families_exactly(spark, scale_dir):
    out, _ = scale_dir
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scaled = spark.read.parquet(os.path.join(out, "documents.parquet"))
    base_fams = {
        r["text"]: r["n"]
        for r in base.groupBy("text").agg(F.count("*").alias("n")).collect()
    }
    scaled_fams = {
        r["text"]: r["n"]
        for r in scaled.groupBy("text").agg(F.count("*").alias("n")).collect()
    }
    assert scaled_fams == {t: 3 * n for t, n in base_fams.items()}


def test_overflowing_factor_refuses_to_build(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    saved = bench.SCALE_SPEC
    bench.SCALE_SPEC = {"documents": ("doc_id", bench.KEY_STRIDE + 1)}
    try:
        with pytest.raises(ValueError, match="exceeds"):
            bench.build_scale_dir(spark, "/root/testdata/sf0.001")
    finally:
        bench.SCALE_SPEC = saved
