"""Multimodal column support: opaque binary payloads + typed metadata,
with decode / feature-extraction plumbing as Arrow-batched Pandas UDFs.

Design (SURVEY §2.3): image/audio/video ride through the engine as
``binary`` columns (or object-store URI pointers for very large blobs)
beside a typed metadata struct. All Spark-side plumbing — schema,
partition sizing, UDF signatures, batch shapes — is real and tested;
the codec itself is a clearly-marked stub because no image/audio
libraries exist in this container (``decode_image_batch`` raises
``NotImplementedError`` unless ``fake=True``, which derives
deterministic pseudo-features from the bytes).

At 100 TB: binary payloads dominate row width, so
``spark.sql.files.maxPartitionBytes`` governs batch memory, blobs
should be read via the ``binaryFile`` source (path, modificationTime,
length, content) or kept as URI pointers with on-demand fetch inside
``mapInPandas``, and feature extraction shuffles only the small
feature vectors, never the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

FEATURE_DIM = 8

_DECODE_SCHEMA = (
    "doc_id long, n_bytes int, content_hash string, "
    "width int, height int, features array<float>"
)


def decode_image_batch(buf: bytes, fake: bool = False) -> tuple[int, int, np.ndarray]:
    """Decode an image blob → (width, height, feature vector).

    STUB: real decoding needs an image library not present in this
    container. ``fake=True`` produces deterministic pseudo-features
    from the content hash so the distributed plumbing is testable
    end-to-end; the Arrow batch shape and signature are exactly what a
    real Pillow/libvips decoder would use.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library (Pillow/libvips); "
            "install one and replace this stub"
        )
    h = hashlib.sha256(buf).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = np.frombuffer(h[:4 * FEATURE_DIM], dtype=np.uint32).astype(np.float32)
    return width, height, feats / np.float32(2**32)


def attach_binary_payload(d: DataFrame) -> DataFrame:
    """Model a multimodal table: text bytes stand in for an image blob
    beside a typed metadata struct (mime/source/size)."""
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("source").alias("origin"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, decoded
    features out; blobs never shuffle (output carries only features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                w, h, feats = decode_image_batch(buf, fake=True)
                out.append(
                    (
                        int(doc_id),
                        len(buf),
                        hashlib.sha256(buf).hexdigest(),
                        w,
                        h,
                        feats.tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "content_hash",
                    "width",
                    "height",
                    "features",
                ],
            )

    return binary_df.mapInPandas(run, schema=_DECODE_SCHEMA)


@register(
    "mm_binary_meta",
    oracle="""
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       sha256(text) AS content_hash,
       'image/fake' AS mime
FROM documents
""",
    doc="Multimodal metadata path: byte length + content hash over the "
    "binary payload, computed JVM-side (sha2/octet_length on binary).",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("content_hash"),
        F.lit("image/fake").alias("mime"),
    )


@register(
    "mm_feature_extract",
    oracle=None,  # stubbed codec: determinism + plumbing asserted in pytest
    doc="Binary → features via Arrow-batched mapInPandas (stubbed "
    "deterministic codec); aggregates per-source feature norms.",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(d))
    return (
        feats.withColumn(
            "feat_norm",
            F.sqrt(
                F.aggregate(
                    F.transform(
                        "features", lambda x: x.cast("double") * x.cast("double")
                    ),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
            ),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_decoded"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
            F.round(F.sum("feat_norm"), 6).alias("sum_feat_norm"),
        )
    )


# ------------------------------------------------- resize / frame-sample

RESIZE_W, RESIZE_H = 224, 224
FRAME_STRIDE_MS = 1000  # sample one frame per second of fake video


def resize_image_batch(
    buf: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """Resize an image blob to (RESIZE_W, RESIZE_H).

    STUB: a real implementation is one Pillow call. ``fake=True``
    derives a deterministic output blob (content hash + target dims) so
    the pipeline shape — blob in, smaller blob out, metadata updated —
    is testable without a codec.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires an image library (Pillow/libvips); "
            "install one and replace this stub"
        )
    h = hashlib.sha256(buf + f"{width}x{height}".encode()).digest()
    return h * 4  # 128 deterministic bytes standing in for pixels


def mm_resize(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched resize: payload → resized payload + new meta.
    Output rows keep binary payloads, so at scale this writes straight
    back to object storage (partitioned by size class) rather than
    shuffling — the transform itself is embarrassingly parallel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                out.append(
                    (
                        int(doc_id),
                        resize_image_batch(buf, RESIZE_W, RESIZE_H, fake=True),
                        RESIZE_W,
                        RESIZE_H,
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "payload", "width", "height"]
            )

    return binary_df.mapInPandas(
        run, schema="doc_id long, payload binary, width int, height int"
    )


def sample_frames_batch(
    buf: bytes, duration_ms: int, stride_ms: int, fake: bool = False
) -> list[tuple[int, bytes]]:
    """Sample (timestamp_ms, frame_blob) pairs from a video blob.

    STUB: real frame extraction is an ffmpeg/PyAV call. ``fake=True``
    emits one deterministic pseudo-frame per ``stride_ms`` so the
    one-row-to-many-frames explosion — the part that matters for
    partitioning — is real.
    """
    if not fake:
        raise NotImplementedError(
            "frame sampling requires ffmpeg/PyAV; install one and replace this stub"
        )
    frames = []
    for ts in range(0, max(duration_ms, 1), stride_ms):
        frames.append((ts, hashlib.sha256(buf + ts.to_bytes(8, "big")).digest()))
    return frames


def sample_frames_df(binary_df: DataFrame) -> DataFrame:
    """Video → frames: one input row explodes to duration/stride rows.
    mapInPandas (not a UDTF) so each task streams its frames out in
    Arrow batches without materializing a whole video's frames in one
    list; at scale, repartition on doc_id AFTER sampling keeps frames
    of one video co-located for downstream per-video ops."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                for ts, frame in sample_frames_batch(
                    bytes(buf), int(dur), FRAME_STRIDE_MS, fake=True
                ):
                    rows.append((int(doc_id), ts, frame))
            yield pd.DataFrame(rows, columns=["doc_id", "ts_ms", "frame"])

    return binary_df.mapInPandas(
        run, schema="doc_id long, ts_ms long, frame binary"
    )


@register(
    "mm_resize_pipeline",
    oracle=None,  # stubbed codec: determinism + shape asserted in pytest
    doc=f"Image resize pipeline to {RESIZE_W}x{RESIZE_H} via Arrow-batched "
    "mapInPandas (stubbed codec); verifies payload-in/payload-out shape "
    "with per-source size accounting.",
)
def mm_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    resized = mm_resize(attach_binary_payload(d))
    return resized.groupBy("width", "height").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
    )


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS duration_ms,
       CAST(CEIL(GREATEST(LENGTH(text), 1) / 1000.0) AS BIGINT) AS n_frames
FROM documents
WHERE doc_id < 500
""",
    doc="Video frame sampling (1 frame/s, stubbed codec): per-video frame "
    "counts — the row-explosion accounting is SQL-checkable even though "
    "the frame blobs themselves are stub-generated (n_chars stands in "
    "for duration_ms).",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    # n_bytes of the utf-8 text stands in for video duration_ms
    vids = attach_binary_payload(d).withColumn(
        "duration_ms", F.col("meta.n_bytes").cast("long")
    )
    frames = sample_frames_df(vids)
    return (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .join(vids.select("doc_id", "duration_ms"), "doc_id")
        .select("doc_id", "duration_ms", "n_frames")
    )


def decode_audio_batch(
    buf: bytes, fake: bool = False, sr: int = 16_000
) -> tuple[int, np.ndarray]:
    """Decode an audio blob → (sample_rate, mono float32 PCM).

    STUB: real decoding needs an audio library (soundfile/librosa/
    ffmpeg) not present in this container. ``fake=True`` synthesizes a
    deterministic PCM buffer from the content hash — length and values
    derived from the bytes — so the distributed plumbing (Arrow batch
    shape, resample math, schema) is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library (soundfile/ffmpeg); "
            "install one and replace this stub"
        )
    h = hashlib.sha256(buf).digest()
    n = 1600 + int.from_bytes(h[:2], "big") % 14_400  # 0.1-1.0 s at 16 kHz
    rng = np.frombuffer(
        hashlib.sha256(buf + b"pcm").digest() * (n * 4 // 32 + 1), dtype=np.uint8
    )[: n]
    pcm = (rng.astype(np.float32) - 127.5) / 127.5
    return sr, pcm


@register(
    "mm_audio_resample",
    oracle=None,  # stubbed codec; plumbing equality-tested in pytest
    doc="Audio resample pipeline over binary payloads: decode (stubbed "
    "deterministic PCM) → decimate 16 kHz → 8 kHz → per-clip stats. "
    "mapInPandas processes whole Arrow batches; only (doc_id, counts, "
    "rms) leave the executor — the blobs and PCM never shuffle, the "
    "invariant that makes audio feature extraction viable at 100 TB.",
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    target_sr = 8_000

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                sr, pcm = decode_audio_batch(bytes(buf), fake=True)
                step = sr // target_sr
                res = pcm[::step]
                out.append(
                    (
                        int(doc_id),
                        len(pcm),
                        len(res),
                        float(np.sqrt(np.mean(res * res))),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_samples_in", "n_samples_out", "rms"]
            )

    binary_df = attach_binary_payload(
        load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    )
    return binary_df.select("doc_id", "payload").mapInPandas(
        resample,
        schema="doc_id long, n_samples_in long, n_samples_out long, rms double",
    )
