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


def test_posix_concurrent_mint_single_winner(tmp_path):
    """Two drivers starting concurrently (failover overlap) must agree on
    ONE tag: minting is O_EXCL first-writer-wins, losers re-read the
    winner's token instead of silently overwriting it."""
    import concurrent.futures

    cp = str(tmp_path / "cp_race")
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        tags = list(ex.map(lambda _: stream_identity(cp), range(8)))
    assert len(set(tags)) == 1
    assert (tmp_path / "cp_race" / "_lrdi_stream_id").read_text() == tags[0]


def test_posix_empty_token_is_corrupt_state_not_remint(tmp_path):
    """An existing-but-empty token (crash mid-mint) must surface as an
    error: silently minting a fresh tag over it forks the stream identity
    and double-applies any replayed in-flight batch."""
    cp = tmp_path / "cp_empty"
    cp.mkdir()
    (cp / "_lrdi_stream_id").write_text("")
    with pytest.raises(RuntimeError, match="empty"):
        stream_identity(str(cp))


def test_uri_empty_token_is_corrupt_state_not_remint(spark, tmp_path):
    """Same contract on the Hadoop-FS path."""
    cp = tmp_path / "cp_uri_empty"
    cp.mkdir()
    (cp / "_lrdi_stream_id").write_text("")
    with pytest.raises(RuntimeError, match="empty"):
        stream_identity(f"file:{cp}")


def test_uri_without_active_session_fails_loudly(monkeypatch):
    """No silent driver-local fallback for URI checkpoints — that is the
    exact stale-tag / failover double-apply hazard."""
    from pyspark.sql import SparkSession

    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    with pytest.raises(RuntimeError, match="active SparkSession"):
        stream_identity("hdfs://nn/checkpoints/cdc")
