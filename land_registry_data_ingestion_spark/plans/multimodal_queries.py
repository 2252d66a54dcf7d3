"""Multimodal-plumbing query: hash-oracle coverage for the binary-column
path (scale-out §8, ``operators/multimodal.py``).

The container has no codecs and the testdata has no media table, so the
query synthesizes one deterministically from ``documents`` — each row's
text bytes become the opaque ``content`` blob, with a rotating
media_type — and runs the real Arrow-batched ``mapInPandas`` feature
kernel over it. The oracle recomputes byte length and SHA-256 in DuckDB,
so the whole JVM→Arrow→pandas→JVM round trip (schema, batching, binary
transport) is value-hash-checked, not just pytest-smoked. The ``feature``
vector itself (md5-seeded fake embedding) stays out of the declared
output: it is covered by ``tests/test_multimodal.py``, and its float
array would only re-test the same kernel path the sha column already
proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.multimodal import extract_features
from land_registry_data_ingestion_spark.plans.registry import query
from land_registry_data_ingestion_spark.sources.parquet import load_tables

# Positive residue ((x % 3) + 3) % 3, not bare x % 3: both engines'
# ``%`` keeps the dividend's sign, so a negative doc_id (hash-derived
# 64-bit ids make these ordinary — keyedge adversarial tier, round 10)
# yields residues -1/-2, which the CASE silently lumped into 'video'
# and, worse, drove Spark's 1-based element_at to index 0 (runtime
# INVALID_INDEX_OF_ZERO crash).
_MEDIA_TYPE = (
    "CASE ((doc_id % 3) + 3) % 3 "
    "WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@query(
    "mm_feature_extract",
    sql=f"""
    SELECT doc_id AS media_id,
           {_MEDIA_TYPE} AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction end-to-end: documents → synthetic
    media table (text bytes as ``content``) → ``extract_features``'s
    mapInPandas kernel → (n_bytes, sha256) per media row."""
    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("content"),
    )
    feats = extract_features(media, dim=4)
    return feats.select("media_id", "media_type", "n_bytes", "content_sha256")


@query(
    "mm_metadata_stats",
    sql=f"""
    SELECT {_MEDIA_TYPE} AS media_type,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           ROUND(avg(n_chars), 2) AS avg_bytes,
           CAST(max(n_chars) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only profiling of a multimodal table: per-type item count
    and byte-size stats from the TYPED METADATA columns, with the opaque
    ``content`` blob never read — the pattern that makes planning over a
    100 TB media lake cheap (a scan that dragged the blobs through memory
    to count them would be the bug). The media frame below carries the
    blob column; Catalyst's column pruning must drop it from the parquet
    ReadSchema, which `tests/test_multimodal.py::
    test_metadata_stats_plan_prunes_blob_column` asserts."""
    t = load_tables(spark, sf_dir)
    media = t.documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.col("n_chars").alias("n_bytes_meta"),
        F.col("text").cast("binary").alias("content"),
    )
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes_meta").alias("total_bytes"),
        F.round(F.avg("n_bytes_meta"), 2).alias("avg_bytes"),
        F.max("n_bytes_meta").alias("max_bytes"),
    )


@query(
    "mm_frame_sample",
    sql="""
    WITH v AS (
        SELECT doc_id AS media_id, text,
               (n_chars % 5000) + 500 AS dur
        FROM documents WHERE ((doc_id % 3) + 3) % 3 = 2
    ), f AS (
        SELECT media_id, text,
               unnest(range(CAST(ceil(dur / 1000.0) AS BIGINT))) AS i
        FROM v
    )
    SELECT media_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(i * 1000 AS BIGINT) AS frame_ts_ms,
           md5(text || '|' || CAST(i * 1000 AS VARCHAR)) AS frame_md5
    FROM f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling end-to-end: the 1→N generator form of
    ``mapInPandas`` (one video row explodes into ceil(duration/cadence)
    frame rows) under the hash oracle — the row-multiplying kernel shape
    `mm_feature_extract`'s 1→1 kernel doesn't cover. Synthetic videos
    from `documents` (text bytes as content, duration from n_chars); the
    stub frame is the md5 of (content | ts), which DuckDB replays
    byte-for-byte."""
    from land_registry_data_ingestion_spark.operators.multimodal import (
        sample_video_frames,
    )

    t = load_tables(spark, sf_dir)
    media = t.documents.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 2).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.col("text").cast("binary").alias("content"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_sample_rate"),
        ((F.col("n_chars") % 5000) + 500).cast("long").alias("meta_duration_ms"),
    )
    frames = sample_video_frames(media, every_ms=1000)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_ts_ms",
        F.col("frame").cast("string").alias("frame_md5"),
    )
