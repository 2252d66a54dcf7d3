"""Multimodal column operators: image/audio/video as opaque binary columns.

Design (the part that matters at 100 TB):

- media rides in ``binary`` columns next to typed metadata
  (``media_type``, ``width``, ``height``, ``sample_rate``, …) so Catalyst
  prunes it away unless a stage actually touches the bytes;
- decode / feature-extract / resize / frame-sample run as **Arrow-batched
  Pandas UDFs over mapInPandas** — bytes cross the JVM↔Python boundary
  once per batch, never per row;
- heavy stages are preceded by :func:`land_registry_data_ingestion_spark.
  util.spread` so a few giant files don't serialize the work.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode kernels are stubbed: ``decode_stub=True`` (default) produces a
deterministic fake decode so the plumbing — schema, batching, partitioning,
UDF signature — is real and tested end-to-end; with ``decode_stub=False``
the same operator raises ``NotImplementedError`` at the point a real codec
would be invoked, marking exactly what a deployment must supply.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from land_registry_data_ingestion_spark.util import spread

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_sample_rate", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_feature(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: bytes → R^dim."""
    out: list[float] = []
    seed = content or b""
    for i in range(dim):
        h = hashlib.md5(seed + i.to_bytes(4, "little")).digest()
        out.append(int.from_bytes(h[:4], "little") / 2**32 - 0.5)
    return out


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract each media row (Arrow-batched).

    Returns FEATURE_SCHEMA. The Pandas UDF shape (mapInPandas over
    column-pruned batches) is exactly what a real decoder uses; only the
    kernel inside is stubbed.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg/soundfile; "
                    "install codecs and pass a real kernel"
                )
            content = pdf["content"]
            # NULL content stays NULL end to end: a missing blob is not a
            # zero-byte blob — n_bytes 0 / sha256('') would fabricate the
            # empty-content fingerprint for rows that simply have no bytes
            # (a real decoder can't run on them either)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(
                        [len(b) if b is not None else None for b in content],
                        dtype="Int64",
                    ),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "feature": content.map(
                        lambda b: _fake_feature(b, dim) if b is not None else None
                    ),
                }
            )

    pruned = spread(media.select("media_id", "media_type", "content"))
    return pruned.mapInPandas(kernel, FEATURE_SCHEMA)


def _pil_image():
    """Optional real codec: PIL when installed, else None (the container
    this engine is developed in has no image libraries — the real path is
    exercised wherever PIL exists, see tests/test_multimodal.py)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize the image rows; non-image rows pass through untouched.

    Output schema == input schema (content replaced, meta updated).
    ``decode_stub=False`` uses a REAL decode→resize→re-encode (PNG) via
    PIL when importable on the executors; without PIL it raises
    ``NotImplementedError`` at the exact point a deployment must supply
    the codec. The Spark-side shape (pruned Arrow batches, pass-through
    of non-image rows, schema stability) is identical in both modes."""

    def _real_resize(b: bytes | None):
        import io

        Image = _pil_image()
        if Image is None:
            raise NotImplementedError("real image resize requires PIL")
        if not b:
            return b
        with Image.open(io.BytesIO(bytes(b))) as im:
            out = io.BytesIO()
            im.resize((width, height)).save(out, format="PNG")
            return out.getvalue()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["media_type"] == "image"
            if mask.any():
                if decode_stub:
                    # deterministic fake: re-hash content to the target size
                    pdf.loc[mask, "content"] = pdf.loc[mask, "content"].map(
                        lambda b: hashlib.sha256(b or b"").digest()
                        * (1 + width * height // 32)
                    )
                else:
                    pdf.loc[mask, "content"] = pdf.loc[mask, "content"].map(
                        _real_resize
                    )
                pdf.loc[mask, "meta_width"] = width
                pdf.loc[mask, "meta_height"] = height
            yield pdf

    return spread(media).mapInPandas(kernel, media.schema)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Explode each video row into frame rows at a fixed sampling cadence.

    One input row → ``duration/every_ms`` output rows; the UDF yields
    multiple rows per input (generator form of mapInPandas)."""
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            if len(vids) == 0:
                continue
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            # vectorized explode: frames-per-video from the metadata, then
            # index-repeat + concatenated aranges — no iterrows. Only the
            # per-FRAME stub hash stays a Python map, standing in for the
            # per-frame codec call a real ffmpeg kernel makes anyway.
            durations = vids["meta_duration_ms"].fillna(0).astype("int64")
            n_frames = np.ceil(durations / every_ms).clip(lower=0).astype("int64")
            rep = vids.loc[vids.index.repeat(n_frames)]
            idx = (
                np.concatenate([np.arange(k, dtype="int64") for k in n_frames])
                if len(n_frames)
                else np.array([], dtype="int64")
            )
            ts = idx * every_ms
            # Stub frame bytes = hex md5 of (content | ts): deterministic,
            # cheap, and replayable by any engine with a string md5 — the
            # declared query's oracle recomputes it in DuckDB.
            frames = [
                hashlib.md5((c or b"") + b"|" + str(int(t)).encode())
                .hexdigest()
                .encode("ascii")
                for c, t in zip(rep["content"], ts)
            ]
            yield pd.DataFrame(
                {
                    "media_id": rep["media_id"].to_numpy(),
                    "frame_idx": idx.astype("int32"),
                    "frame_ts_ms": ts,
                    "frame": frames,
                }
            )

    return spread(media).mapInPandas(kernel, out_schema)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no codecs in container)."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        content = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 7)
        rows.append(
            (
                i,
                mt,
                bytearray(content),
                64 + i if mt == "image" else None,
                48 + i if mt == "image" else None,
                16000 if mt == "audio" else None,
                (i + 1) * 750 if mt == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
