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
