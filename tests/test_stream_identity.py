"""stream_identity: token lifetime == checkpoint lifetime on both the
posix and the URI/Hadoop-FS path (streaming/identity.py)."""

from __future__ import annotations

import shutil

import pytest

from land_registry_data_ingestion_spark.streaming.identity import (
    stream_identity,
)


def test_posix_tag_stable_until_checkpoint_recreated(tmp_path):
    cp = str(tmp_path / "cp")
    tag = stream_identity(cp)
    assert len(tag) == 12
    assert stream_identity(cp) == tag  # restart reuses
    shutil.rmtree(cp)
    assert stream_identity(cp) != tag  # recreated lineage → fresh tag


def test_uri_checkpoint_goes_through_hadoop_fs(spark, tmp_path):
    """A schemed path must resolve the checkpoint's OWN filesystem: with
    file:, the token lands inside the real directory (not a literal
    'file:' dir on the driver), is reused on restart, and dies with the
    checkpoint."""
    local = tmp_path / "cp_uri"
    cp = f"file:{local}"
    tag = stream_identity(cp)
    assert (local / "_lrdi_stream_id").read_text().strip() == tag
    assert not (tmp_path / "file:").exists()
    assert stream_identity(cp) == tag
    shutil.rmtree(local)
    assert stream_identity(cp) != tag


def test_uri_without_active_session_fails_loudly(monkeypatch):
    """No silent driver-local fallback for URI checkpoints — that is the
    exact stale-tag / failover double-apply hazard."""
    from pyspark.sql import SparkSession

    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    with pytest.raises(RuntimeError, match="active SparkSession"):
        stream_identity("hdfs://nn/checkpoints/cdc")
