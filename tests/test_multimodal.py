"""Multimodal plumbing tests: binary columns + Arrow-batched kernels."""

from __future__ import annotations

import pytest

from land_registry_data_ingestion_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_video_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=30)


def test_extract_features_schema_and_determinism(media):
    feats = extract_features(media, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    assert all(len(r["feature"]) == 8 for r in rows.values())
    assert all(len(r["content_sha256"]) == 64 for r in rows.values())
    # deterministic across runs
    again = {r["media_id"]: r for r in extract_features(media, dim=8).collect()}
    assert rows[0]["feature"] == again[0]["feature"]
    assert rows[0]["content_sha256"] == again[0]["content_sha256"]


def test_resize_images_only_touches_images(media):
    out = resize_images(media, 32, 32)
    assert out.schema == media.schema
    rows = out.collect()
    for r in rows:
        if r["media_type"] == "image":
            assert (r["meta_width"], r["meta_height"]) == (32, 32)
        else:
            assert r["meta_width"] is None or r["meta_width"] != 32


def test_sample_video_frames_cadence(media):
    frames = sample_video_frames(media, every_ms=500)
    per = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    videos = {r["media_id"]: r["meta_duration_ms"] for r in media.collect() if r["media_type"] == "video"}
    assert set(per) == set(videos)
    for mid, dur in videos.items():
        assert per[mid] == -(-dur // 500)  # ceil


def test_stub_gate_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media, decode_stub=False).collect()


def test_resize_images_real_codec_when_pil_present(spark):
    """Real decode→resize→re-encode path: green wherever PIL is
    installed, skipped in codec-less containers (this one)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from land_registry_data_ingestion_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    buf = io.BytesIO()
    PIL_Image.new("RGB", (8, 6), (200, 10, 10)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(0, "image", bytearray(buf.getvalue()), 8, 6, None, None)],
        MEDIA_SCHEMA,
    )
    out = resize_images(media, 4, 3, decode_stub=False).collect()[0]
    assert (out["meta_width"], out["meta_height"]) == (4, 3)
    with PIL_Image.open(io.BytesIO(bytes(out["content"]))) as im:
        assert im.size == (4, 3)


def test_resize_images_real_path_raises_without_pil(media):
    """Without PIL the real path must fail loudly at the codec point,
    not silently produce stub output."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — covered by the real-codec test")
    except ImportError:
        pass
    from land_registry_data_ingestion_spark.operators.multimodal import (
        resize_images,
    )

    with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
        resize_images(media, 4, 3, decode_stub=False).collect()


def test_metadata_stats_plan_prunes_blob_column(spark):
    """The declared mm_metadata_stats query carries the binary content
    column in its media frame; the optimized plan must never read it —
    the parquet ReadSchema keeps only the id/metadata columns."""
    from land_registry_data_ingestion_spark.plans.registry import (
        _load_all,
        REGISTRY,
    )

    _load_all()
    df = REGISTRY["mm_metadata_stats"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schemas = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    assert read_schemas, plan
    for line in read_schemas:
        assert "text" not in line, line


def test_extract_features_null_content_stays_null(spark):
    """A missing blob is not a zero-byte blob: NULL content must yield
    NULL n_bytes / sha / feature, not octet 0 and the empty-content
    fingerprint (round-8 adversarial gate; oracle parity is
    octet_length(encode(NULL)) = NULL, sha256(NULL) = NULL)."""
    from pyspark.sql import Row

    from land_registry_data_ingestion_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    media = spark.createDataFrame(
        [
            Row(
                media_id=1,
                media_type="image",
                content=bytearray(b"real"),
                meta_width=None,
                meta_height=None,
                meta_sample_rate=None,
                meta_duration_ms=None,
            ),
            Row(
                media_id=2,
                media_type="image",
                content=None,
                meta_width=None,
                meta_height=None,
                meta_sample_rate=None,
                meta_duration_ms=None,
            ),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_features(media, dim=4).collect()}
    assert rows[1]["n_bytes"] == 4 and rows[1]["content_sha256"] is not None
    assert rows[2]["n_bytes"] is None
    assert rows[2]["content_sha256"] is None
    assert rows[2]["feature"] is None


def test_media_queries_total_over_full_int64_id_range(spark, tmp_path):
    """Unit-level pin of the keyedge contract (round 10): the media-type
    dispatch and the redact PII enrichment must be TOTAL over the full
    int64 id range — hash-derived 64-bit ids make negatives and
    ±2^63-adjacent values ordinary inputs. Before the round-10 fixes,
    a negative doc_id drove the 1-based element_at to index 0
    (INVALID_INDEX_OF_ZERO) and doc_id * 7919 overflowed int64 under
    ANSI; the keyedge adversarial tier pins this end-to-end against the
    DuckDB oracle, this test pins it at the query-function level with
    no oracle in the loop."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from land_registry_data_ingestion_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    i64max = (1 << 63) - 1
    i64min = -(1 << 63)
    ids = [
        0, 1, 2, 3, -1, -2, -3,
        i64max, i64max - 1, i64max - 2,
        i64min + 1, i64min + 2, i64min + 3,
        7919, -7919, 100000000, -100000000,
    ]
    texts = [f"doc {i} body text with several tokens" for i in range(len(ids))]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["test"] * len(ids)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    papq.write_table(tbl, str(tmp_path / "documents.parquet"))

    _load_all()
    for name in (
        "mm_feature_extract",
        "mm_metadata_stats",
        "mm_frame_sample",
        "text_redact_pii",
    ):
        REGISTRY[name].fn(spark, str(tmp_path)).collect()  # must not raise

    # the media class is the POSITIVE residue of doc_id mod 3 (Python's
    # % is already non-negative for a positive modulus, so it is the
    # reference semantics here)
    classes = ["image", "audio", "video"]
    got = {
        r["media_id"]: r["media_type"]
        for r in REGISTRY["mm_feature_extract"]
        .fn(spark, str(tmp_path))
        .select("media_id", "media_type")
        .collect()
    }
    assert got == {i: classes[i % 3] for i in ids}

    # redact: every doc_id % 5 == 0 row gained exactly one phone and it
    # was redacted (n_phones counts the pre-redaction matches)
    phones = {
        r["doc_id"]: r["n_phones"]
        for r in REGISTRY["text_redact_pii"].fn(spark, str(tmp_path)).collect()
    }
    assert all(
        (n >= 1) == (i % 5 == 0) for i, n in phones.items()
    ), phones
