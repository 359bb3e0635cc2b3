"""Multimodal column support: opaque binary payloads + typed metadata,
with REAL stdlib codecs (24-bit BMP via ``struct``, PCM WAV via
``wave``) and decode / feature-extraction / resize / resample plumbing
as Arrow-batched Pandas UDFs.

Design (SURVEY §2.3): image/audio/video ride through the engine as
``binary`` columns (or object-store URI pointers for very large blobs)
beside a typed metadata struct. The image and audio paths use genuine
codecs — ``decode_bmp``/``encode_bmp`` parse and emit real BMP files,
``decode_wav``/``encode_wav`` real RIFF/WAVE files — so decode, resize
(nearest-neighbor, the same arithmetic Pillow's NEAREST uses), and
resample (integer decimation) are all real computations, not stubs.
Video is real at the CONTAINER level for all three families: the BMV
fixture, standard ISO-BMFF/MP4 (full sample-table demux,
ops/isobmff.py), and Matroska/WebM (EBML cluster/SimpleBlock walk,
ops/ebml.py); only compressed-codec decode (h264/vp9) remains a
documented gate — it genuinely requires ffmpeg/PyAV, absent from
this container.

Blobs are synthesized from deterministic, SQL-expressible rules
(pixel = (doc_id*31 + x*7 + y*13) % 256; sample = ((doc_id*7919 +
i*104729) % 65536) - 32768) so every query here has an exact DuckDB
oracle: the oracle recomputes the expected features analytically while
Spark recovers them by round-tripping real binary files — any codec bug
breaks the hash match.

At 100 TB: binary payloads dominate row width, so
``spark.sql.files.maxPartitionBytes`` governs batch memory, blobs
should be read via the ``binaryFile`` source (path, modificationTime,
length, content) or kept as URI pointers with on-demand fetch inside
``mapInPandas``, and feature extraction shuffles only the small
feature vectors, never the blobs (every query below emits scalars /
fixed-size features only; payload columns never cross an exchange).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as PW
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .ebml import demux_webm, is_webm, mux_webm
from .isobmff import demux_mp4, is_mp4, mux_mp4

# ----------------------------------------------------------- BMP codec
#
# Real 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
# BI_RGB, bottom-up rows padded to 4 bytes). Grayscale images are
# stored as B=G=R triples. This is a genuine interchange format: the
# emitted bytes open in any image viewer, and the decoder accepts any
# 24-bpp uncompressed BMP regardless of producer.

_BMP_FILE_HDR = "<2sIHHI"  # magic, file size, res1, res2, data offset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # size,w,h,planes,bpp,comp,imgsize,ppm x/y,clr,imp


def bmp_row_size(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a real 24-bit BMP."""
    h, w = px.shape
    row_size = bmp_row_size(w)
    img_size = row_size * h
    hdr = struct.pack(_BMP_FILE_HDR, b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(_BMP_INFO_HDR, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - 3 * w)
    # rows are stored bottom-up per the BMP spec
    body = b"".join(
        np.repeat(px[y], 3).astype(np.uint8).tobytes() + pad
        for y in range(h - 1, -1, -1)
    )
    return hdr + info + body


def decode_bmp(buf: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into a (h, w) uint8 array
    (blue channel; for grayscale BMPs all channels are equal)."""
    magic, _file_size, _r1, _r2, offset = struct.unpack_from(_BMP_FILE_HDR, buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP file (missing 'BM' magic)")
    _sz, w, h, _planes, bpp, comp, *_ = struct.unpack_from(_BMP_INFO_HDR, buf, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    if h < 0:  # negative height = top-down row order
        h, top_down = -h, True
    else:
        top_down = False
    row_size = bmp_row_size(w)
    out = np.empty((h, w), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        row = np.frombuffer(buf, dtype=np.uint8, count=3 * w, offset=offset + i * row_size)
        out[y] = row[0::3]
    return out


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real nearest-neighbor resize: target (x, y) samples source
    (x*w//out_w, y*h//out_h) — the same index arithmetic PIL NEAREST
    uses (floor mapping)."""
    h, w = px.shape
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    return px[np.ix_(ys, xs)]


# ----------------------------------------------------------- WAV codec

AUDIO_SR = 16_000


def encode_wav(samples: np.ndarray, sr: int = AUDIO_SR) -> bytes:
    """Encode int16 mono PCM as a real RIFF/WAVE file (stdlib wave)."""
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE file → (sample_rate, int16 mono PCM)."""
    with wave.open(io.BytesIO(buf), "rb") as wf:
        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
            raise ValueError("only 16-bit mono PCM WAV supported")
        sr = wf.getframerate()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return sr, pcm


# ------------------------------------------- deterministic blob rules
#
# Fixture generators: executor-side synthesis of real binary files from
# rules a SQL oracle can recompute analytically. Mirrors the reference's
# binary-ingest surface (payload beside typed metadata) without needing
# image/audio assets in the container.

MAX_IMG_W, MAX_IMG_H = 16, 10  # 4 + id%13 ∈ [4,16], 4 + id%7 ∈ [4,10]
MAX_AUDIO_N = 1600  # 800 + (id*37)%800 ∈ [800,1599]


def synth_pixels(doc_id: int) -> np.ndarray:
    w = 4 + doc_id % 13
    h = 4 + doc_id % 7
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    return ((doc_id * 31 + x[None, :] * 7 + y[:, None] * 13) % 256).astype(np.uint8)


def synth_samples(doc_id: int) -> np.ndarray:
    n = 800 + (doc_id * 37) % 800
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 7919 + i * 104729) % 65536) - 32768).astype(np.int16)


def attach_binary_payload(d: DataFrame) -> DataFrame:
    """Model a multimodal table: text bytes stand in for an opaque blob
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


def attach_image_payload(d: DataFrame) -> DataFrame:
    """Synthesize a real BMP blob per doc (executor-side, mapInPandas);
    at scale this column would come from a binaryFile scan instead."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_bmp(synth_pixels(int(i))) for i in pdf["doc_id"]
                    ],
                }
            )

    return d.select("doc_id").mapInPandas(run, schema="doc_id long, payload binary")


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: real BMP decode per blob; blobs
    never shuffle (output carries only scalar features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                px = decode_bmp(buf).astype(np.int64)
                out.append(
                    (
                        int(doc_id),
                        px.shape[1],
                        px.shape[0],
                        len(buf),
                        hashlib.sha256(buf).hexdigest(),
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "w", "h", "n_bytes", "content_hash",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    return binary_df.mapInPandas(
        run,
        schema=(
            "doc_id long, w int, h int, n_bytes int, content_hash string, "
            "pixel_sum long, pixel_min int, pixel_max int"
        ),
    )


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
    oracle=f"""
WITH dims AS (
    SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
    FROM documents WHERE doc_id < 500
),
xs AS (SELECT UNNEST(range(0, {MAX_IMG_W})) AS x),
ys AS (SELECT UNNEST(range(0, {MAX_IMG_H})) AS y)
SELECT doc_id,
       CAST(w AS INTEGER) AS w,
       CAST(h AS INTEGER) AS h,
       CAST(54 + h * ((3 * w + 3) // 4 * 4) AS INTEGER) AS n_bytes,
       CAST(SUM((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS pixel_sum,
       CAST(MIN((doc_id * 31 + x * 7 + y * 13) % 256) AS INTEGER) AS pixel_min,
       CAST(MAX((doc_id * 31 + x * 7 + y * 13) % 256) AS INTEGER) AS pixel_max
FROM dims, xs, ys
WHERE x < w AND y < h
GROUP BY doc_id, w, h
""",
    doc="Binary image → features via Arrow-batched mapInPandas with a REAL "
    "BMP decoder (struct-parsed headers, bottom-up padded rows). The "
    "oracle recomputes width/height/file-size/pixel stats analytically "
    "from the synthesis rule; Spark recovers them by parsing the actual "
    "BMP bytes — a codec bug breaks the hash match. Mirrors the "
    "reference's binary-payload contract (SURVEY §2.3).",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return extract_features(attach_image_payload(d)).drop("content_hash")


# ------------------------------------------------- resize / frame-sample

RESIZE_W, RESIZE_H = 8, 8
FRAME_STRIDE_MS = 1000  # sample one frame per second of fake video


@register(
    "mm_resize_pipeline",
    oracle=f"""
WITH dims AS (
    SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
    FROM documents WHERE doc_id < 500
),
xs AS (SELECT UNNEST(range(0, {RESIZE_W})) AS x),
ys AS (SELECT UNNEST(range(0, {RESIZE_H})) AS y)
SELECT doc_id,
       CAST(w AS INTEGER) AS src_w,
       CAST(h AS INTEGER) AS src_h,
       CAST({RESIZE_W} AS INTEGER) AS out_w,
       CAST({RESIZE_H} AS INTEGER) AS out_h,
       CAST(54 + {RESIZE_H} * ((3 * {RESIZE_W} + 3) // 4 * 4) AS INTEGER)
           AS out_n_bytes,
       CAST(SUM((doc_id * 31 + ((x * w) // {RESIZE_W}) * 7
                 + ((y * h) // {RESIZE_H}) * 13) % 256) AS BIGINT)
           AS out_pixel_sum
FROM dims, xs, ys
GROUP BY doc_id, w, h
""",
    doc=f"Image resize pipeline to {RESIZE_W}x{RESIZE_H}: real BMP decode → "
    "real nearest-neighbor resample (floor index mapping, PIL-NEAREST "
    "arithmetic) → real BMP re-encode → decode-back verification. The "
    "oracle computes the expected resized pixel sum analytically from "
    "the NN mapping; Spark gets it by round-tripping actual bytes. "
    "Embarrassingly parallel — payloads never cross an exchange.",
)
def mm_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                src = decode_bmp(bytes(buf))
                resized = resize_nearest(src, RESIZE_W, RESIZE_H)
                blob = encode_bmp(resized)  # re-encode: the write path
                back = decode_bmp(blob).astype(np.int64)  # decode-back check
                out.append(
                    (
                        int(doc_id),
                        src.shape[1],
                        src.shape[0],
                        back.shape[1],
                        back.shape[0],
                        len(blob),
                        int(back.sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "src_w", "src_h", "out_w", "out_h",
                    "out_n_bytes", "out_pixel_sum",
                ],
            )

    return attach_image_payload(d).mapInPandas(
        run,
        schema=(
            "doc_id long, src_w int, src_h int, out_w int, out_h int, "
            "out_n_bytes int, out_pixel_sum long"
        ),
    )


# Minimal multi-frame video container with REAL frames: "BMV1" magic,
# uint32 frame count, uint32 per-frame duration (ms), then that many
# equal-size 24-bit BMP frames back to back. Every byte is genuinely
# decodable in-container (struct header parse + the BMP codec above);
# only EXTERNAL containers (mp4/webm/…) still gate on ffmpeg/PyAV.
_BMV_MAGIC = b"BMV1"
VIDEO_FRAME_MS = 250  # 4 fps source
VIDEO_FRAME_W = VIDEO_FRAME_H = 4


def synth_frame_pixels(doc_id: int, k: int) -> np.ndarray:
    """Deterministic frame-k pixel rule (analytically SQL-recomputable)."""
    x = np.arange(VIDEO_FRAME_W, dtype=np.int64)
    y = np.arange(VIDEO_FRAME_H, dtype=np.int64)
    return (
        (doc_id * 31 + k * 17 + x[None, :] * 7 + y[:, None] * 13) % 256
    ).astype(np.uint8)


def encode_bmv(doc_id: int, duration_ms: int) -> bytes:
    """Encode a real BMV blob: one BMP frame per VIDEO_FRAME_MS of
    duration (at least one)."""
    n_total = -(-max(int(duration_ms), 1) // VIDEO_FRAME_MS)
    frames = [
        encode_bmp(synth_frame_pixels(doc_id, k)) for k in range(n_total)
    ]
    return (
        _BMV_MAGIC
        + struct.pack("<II", n_total, VIDEO_FRAME_MS)
        + b"".join(frames)
    )


def _stride_sample(
    samples: list[tuple[int, bytes]], stride_ms: int
) -> list[tuple[int, bytes]]:
    """Keep the FIRST sample in each stride bucket (ts // stride_ms) —
    i.e. the first frame at-or-after each stride boundary. Exact-
    multiple matching (`ts % stride == 0`) only works when the frame
    interval divides the stride; a 33 ms (30 fps) mp4 sampled at
    1000 ms would silently return almost nothing. Demuxers emit
    samples in presentation order, which this relies on."""
    out: list[tuple[int, bytes]] = []
    # None sentinel, NOT -1: webm SimpleBlock timestamps are
    # cluster_ts + signed relative and can be negative, so a first
    # frame with ts in [-stride_ms, 0) legitimately lands in bucket -1
    # and must not be dropped.
    last_bucket: int | None = None
    for ts, payload in samples:
        bucket = ts // stride_ms
        if bucket != last_bucket:
            out.append((ts, payload))
            last_bucket = bucket
    return out


def sample_frames_batch(buf: bytes, stride_ms: int) -> list[tuple[int, bytes]]:
    """Sample (timestamp_ms, frame_blob) pairs from a video blob.

    REAL container handling on two paths: the BMV fixture (header
    parse + equal-size frame slicing) and standard ISO-BMFF/MP4 (full
    stsd/stts/stsz/stsc/stco sample-table walk, ops/isobmff.py —
    the same tables any mp4 demuxer reads). For mp4, frame PAYLOADS
    come out of the container for any codec; payloads are returnable
    as-is only when the sample entry is the BMP fixture codec — a
    compressed codec (h264/vp9/…) demuxes fine but raises at the
    decode step, since codec decode genuinely needs ffmpeg/PyAV,
    which this environment lacks."""
    if is_mp4(bytes(buf[:12])):
        fourcc, _ts, samples = demux_mp4(bytes(buf))
        if fourcc != b"bmpf":
            raise NotImplementedError(
                f"mp4 demux OK ({len(samples)} samples) but codec "
                f"{fourcc!r} needs ffmpeg/PyAV to decode; only the "
                "'bmpf' (BMP-in-mp4) fixture codec decodes in-environment"
            )
        return _stride_sample(samples, stride_ms)
    if is_webm(bytes(buf[:4])):
        codec, samples = demux_webm(bytes(buf))
        if codec != "V_BMPF":
            raise NotImplementedError(
                f"webm demux OK ({len(samples)} blocks) but codec "
                f"{codec} needs ffmpeg/PyAV to decode; only the "
                "V_BMPF (BMP-in-mkv) fixture codec decodes in-environment"
            )
        return _stride_sample(samples, stride_ms)
    if bytes(buf[:4]) != _BMV_MAGIC:
        raise NotImplementedError(
            "unrecognized video container (avi/mov-variants/…) — "
            "requires ffmpeg/PyAV; BMV, mp4, and webm demux "
            "in-environment"
        )
    n_total, frame_ms = struct.unpack_from("<II", buf, 4)
    body = buf[12:]
    fsize = len(body) // n_total
    frames = []
    for ts in range(0, n_total * frame_ms, stride_ms):
        k = ts // frame_ms
        frames.append((ts, bytes(body[k * fsize : (k + 1) * fsize])))
    return frames


def attach_video_payload(d: DataFrame) -> DataFrame:
    """Synthesize a real BMV blob per doc (executor-side); duration_ms
    models 10 ms of video per character of the doc's text."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "duration_ms": (pdf["n_chars"] * 10)
                    .clip(lower=1)
                    .astype("int64"),
                    "payload": [
                        encode_bmv(int(i), max(int(n) * 10, 1))
                        for i, n in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return d.select("doc_id", "n_chars").mapInPandas(
        run, schema="doc_id long, duration_ms long, payload binary"
    )


def sample_frames_df(binary_df: DataFrame) -> DataFrame:
    """Video → frames: one input row explodes to duration/stride rows.
    mapInPandas (not a UDTF) so each task streams its frames out in
    Arrow batches without materializing a whole video's frames in one
    list; at scale, repartition on doc_id AFTER sampling keeps frames
    of one video co-located for downstream per-video ops."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                for ts, frame in sample_frames_batch(
                    bytes(buf), FRAME_STRIDE_MS
                ):
                    rows.append((int(doc_id), ts, frame))
            yield pd.DataFrame(rows, columns=["doc_id", "ts_ms", "frame"])

    return binary_df.mapInPandas(
        run, schema="doc_id long, ts_ms long, frame binary"
    )


def _doc_video_duration(d: DataFrame) -> DataFrame:
    """duration_ms recomputed from the synthesis rule (10 ms per text
    char, min 1) directly off the documents scan. The duration join in
    the frame-sampling queries must NOT re-reference the mux
    mapInPandas stage: that subtree is referenced twice with no
    checkpoint, so every blob would be muxed twice per run (round-4
    advice). Scalars off the scan are free; the blob path runs once."""
    return d.select(
        "doc_id",
        F.greatest(F.col("n_chars").cast("long") * 10, F.lit(1).cast("long"))
        .alias("duration_ms"),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, GREATEST(n_chars * 10, 1) AS dur
    FROM documents WHERE doc_id < 500
),
samp AS (
    SELECT doc_id, dur,
           UNNEST(range(0, CAST(CEIL(dur / 1000.0) AS BIGINT))) AS i
    FROM docs
),
xs AS (SELECT UNNEST(range(0, {VIDEO_FRAME_W})) AS x),
ys AS (SELECT UNNEST(range(0, {VIDEO_FRAME_H})) AS y)
SELECT doc_id,
       CAST(MAX(dur) AS BIGINT) AS duration_ms,
       CAST(COUNT(DISTINCT i) AS BIGINT) AS n_frames,
       CAST(SUM((doc_id * 31 + (4 * i) * 17 + x * 7 + y * 13) % 256)
            AS BIGINT) AS frames_pixel_sum
FROM samp, xs, ys
GROUP BY doc_id
""",
    doc="Video frame sampling with a REAL codec end to end: a BMV blob "
    f"(real multi-frame container of {VIDEO_FRAME_W}x{VIDEO_FRAME_H} "
    "BMP frames at 4 fps, 10 ms per text char) is synthesized "
    "executor-side, frames are sampled at 1 frame/s by genuine header "
    "parse + frame slicing, and every sampled frame is BMP-decoded to "
    "a pixel sum. The oracle recomputes counts AND pixel sums "
    "analytically from the synthesis rule — a container or codec bug "
    "breaks the hash match. Frame blobs never shuffle; only (doc_id, "
    "ts, scalar sums) leave the sampling task.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    vids = attach_video_payload(d)
    frames = sample_frames_df(vids)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "px_sum": [
                        int(decode_bmp(bytes(b)).astype(np.int64).sum())
                        for b in pdf["frame"]
                    ],
                }
            )

    sums = frames.mapInPandas(decode, schema="doc_id long, px_sum long")
    return (
        sums.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("px_sum").alias("frames_pixel_sum"),
        )
        .join(_doc_video_duration(d), "doc_id")
        .select("doc_id", "duration_ms", "n_frames", "frames_pixel_sum")
    )


@register(
    "mm_audio_resample",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, 800 + (doc_id * 37) % 800 AS n
    FROM documents WHERE doc_id < 500
),
ii AS (SELECT UNNEST(range(0, {MAX_AUDIO_N})) AS i)
SELECT doc_id,
       CAST({AUDIO_SR} AS INTEGER) AS sr_in,
       CAST({AUDIO_SR // 2} AS INTEGER) AS sr_out,
       CAST(MAX(n) AS BIGINT) AS n_samples_in,
       CAST(COUNT(*) AS BIGINT) AS n_samples_out,
       CAST(SUM(ABS(((doc_id * 7919 + i * 104729) % 65536) - 32768)) AS BIGINT)
           AS sum_abs,
       CAST(MAX(ABS(((doc_id * 7919 + i * 104729) % 65536) - 32768)) AS INTEGER)
           AS peak
FROM docs, ii
WHERE i < n AND i % 2 = 0
GROUP BY doc_id
""",
    doc="Audio resample over binary payloads: synthesize a REAL RIFF/WAVE "
    "file per clip (stdlib wave), decode it genuinely (header-parsed "
    "sample rate + int16 PCM), decimate 16 kHz → 8 kHz, emit per-clip "
    "integer stats. The oracle recomputes the decimated-sample stats "
    "analytically; Spark recovers them from actual WAV bytes. Only "
    "(doc_id, counts, sums) leave the executor — blobs and PCM never "
    "shuffle, the invariant that makes audio feature extraction viable "
    "at 100 TB.",
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    target_sr = AUDIO_SR // 2

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id in pdf["doc_id"]:
                blob = encode_wav(synth_samples(int(doc_id)))  # real WAV bytes
                sr, pcm = decode_wav(blob)  # real header-parsed decode
                step = sr // target_sr
                res = pcm[::step].astype(np.int64)
                out.append(
                    (
                        int(doc_id),
                        sr,
                        sr // step,
                        len(pcm),
                        len(res),
                        int(np.abs(res).sum()),
                        int(np.abs(res).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "sr_in", "sr_out",
                    "n_samples_in", "n_samples_out", "sum_abs", "peak",
                ],
            )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return d.select("doc_id").mapInPandas(
        resample,
        schema=(
            "doc_id long, sr_in int, sr_out int, n_samples_in long, "
            "n_samples_out long, sum_abs long, peak int"
        ),
    )


# ------------------------------------------------------ perceptual dedup


@register(
    "mm_image_ahash",
    oracle=f"""
WITH dims AS (
    SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
    FROM documents WHERE doc_id < 500
),
xs AS (SELECT UNNEST(range(0, {RESIZE_W})) AS x),
ys AS (SELECT UNNEST(range(0, {RESIZE_H})) AS y),
px AS (
    SELECT doc_id, y, x,
           (doc_id * 31 + ((x * w) // {RESIZE_W}) * 7
            + ((y * h) // {RESIZE_H}) * 13) % 256 AS v
    FROM dims, xs, ys
),
tots AS (SELECT doc_id, SUM(v) AS total FROM px GROUP BY doc_id),
hashes AS (
    SELECT p.doc_id,
           string_agg(
               CASE WHEN p.v * {RESIZE_W * RESIZE_H} >= t.total
                    THEN '1' ELSE '0' END,
               '' ORDER BY p.y, p.x) AS ahash
    FROM px p JOIN tots t USING (doc_id)
    GROUP BY p.doc_id
)
SELECT doc_id, ahash,
       CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS cluster_n
FROM hashes
""",
    doc=f"Perceptual near-dup detection for images: real BMP decode → "
    f"{RESIZE_W}x{RESIZE_H} nearest-neighbor downsample → average-hash "
    "(each cell compared to the downsampled mean, integer-exact via "
    "v*64 >= total) → cluster sizes per hash. This is the standard "
    "aHash image-dedup pipeline for multimodal training data: decode "
    "and hash are embarrassingly parallel (mapInPandas, blobs never "
    "shuffle), and the only exchange is a groupBy on the 64-bit hash — "
    "the same single-hash-aggregate shape as dedup_exact, so it scales "
    "to 100 TB of frames. Oracle recomputes the hash analytically from "
    "the synthesis + NN-resize rules; a codec or resample bug breaks "
    "the match.",
)
def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp(bytes(buf))
                small = resize_nearest(px, RESIZE_W, RESIZE_H).astype(np.int64)
                bits = (small * small.size >= small.sum()).astype(np.uint8)
                out.append((int(doc_id), "".join("1" if b else "0" for b in bits.ravel())))
            yield pd.DataFrame(out, columns=["doc_id", "ahash"])

    hashes = attach_image_payload(d).mapInPandas(run, schema="doc_id long, ahash string")
    w = PW.partitionBy("ahash")
    return hashes.select(
        "doc_id", "ahash", F.count("*").over(w).cast("bigint").alias("cluster_n")
    )


# ------------------------------------------------- cross-modal scoring

CLIP_DIM = 64
CLIP_KEEP_THRESHOLD = 0.0


@register(
    "mm_clip_score_filter",
    oracle=f"""
WITH dims AS (
    SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
    FROM documents WHERE doc_id < 500
),
idx AS (SELECT UNNEST(range(0, {CLIP_DIM})) AS i),
pvec AS (
    SELECT doc_id,
           list(CASE WHEN i < w * h
                     THEN CAST((doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256
                          AS DOUBLE)
                     ELSE 0.0 END ORDER BY i) AS pv
    FROM dims, idx
    GROUP BY doc_id
)
SELECT p.doc_id,
       ROUND(list_cosine_similarity(p.pv, e.embedding::DOUBLE[]), 9)
           AS clip_score,
       ROUND(list_cosine_similarity(p.pv, e.embedding::DOUBLE[]), 9)
           >= {CLIP_KEEP_THRESHOLD} AS keep
FROM pvec p JOIN embeddings e ON e.vec_id = p.doc_id
""",
    doc="Cross-modal alignment scoring (the CLIP-score filter of "
    "LAION-style multimodal curation): each image's pixel vector "
    "(REAL BMP decode, row-major first 64 values, zero-padded) is "
    "cosine-scored against the document's text embedding and "
    "thresholded into a keep flag. Decode runs in mapInPandas (blobs "
    "never shuffle; output is a 64-float vector per doc), the cosine "
    "is the JVM codegen'd left-to-right double fold shared with the "
    "similarity ops, and the only exchange is the doc_id ⋈ vec_id "
    "equi-join. The oracle rebuilds the pixel vector analytically "
    "from the synthesis rule — a codec, ordering, or padding bug "
    "breaks the hash match.",
)
def mm_clip_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import cosine_col

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp(bytes(buf)).astype(np.float64).ravel()  # row-major
                v = np.zeros(CLIP_DIM)
                v[: min(CLIP_DIM, px.size)] = px[:CLIP_DIM]
                out.append((int(doc_id), v.tolist()))
            yield pd.DataFrame(out, columns=["doc_id", "pv"])

    pvec = attach_image_payload(d).mapInPandas(
        run, schema="doc_id long, pv array<double>"
    )
    e = load(spark, sf_dir, "embeddings")
    score = F.round(cosine_col(F.col("pv"), F.col("embedding")), 9)
    return (
        pvec.join(e, F.col("vec_id") == F.col("doc_id"))
        .select(
            "doc_id",
            score.alias("clip_score"),
            (score >= CLIP_KEEP_THRESHOLD).alias("keep"),
        )
    )


# ------------------------------------------------- video scene cuts

SCENE_CUT_THRESHOLD = 400  # sum-abs-diff over a 4x4 frame pair


@register(
    "mm_video_scene_cuts",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, GREATEST(n_chars * 10, 1) AS dur
    FROM documents WHERE doc_id < 500
),
frames AS (
    SELECT doc_id, CAST(CEIL(dur / {VIDEO_FRAME_MS}.0) AS BIGINT) AS nf
    FROM docs
),
ks AS (
    SELECT doc_id, UNNEST(range(0, nf - 1)) AS k
    FROM frames WHERE nf > 1
),
xs AS (SELECT UNNEST(range(0, {VIDEO_FRAME_W})) AS x),
ys AS (SELECT UNNEST(range(0, {VIDEO_FRAME_H})) AS y),
pair AS (
    SELECT doc_id, k,
           SUM(CASE WHEN (doc_id * 31 + k * 17 + x * 7 + y * 13) % 256 < 239
                    THEN 17 ELSE 239 END) AS motion
    FROM ks, xs, ys
    GROUP BY doc_id, k
),
agg AS (
    SELECT doc_id,
           COUNT(*) FILTER (WHERE motion > {SCENE_CUT_THRESHOLD}) AS n_cuts,
           SUM(motion) AS total_motion
    FROM pair GROUP BY doc_id
)
SELECT f.doc_id,
       f.nf AS n_frames,
       CAST(COALESCE(a.n_cuts, 0) AS BIGINT) AS n_cuts,
       CAST(COALESCE(a.total_motion, 0) AS BIGINT) AS total_motion
FROM frames f LEFT JOIN agg a ON a.doc_id = f.doc_id
""",
    doc="Video scene-cut detection — the shot-segmentation pass video "
    "training pipelines run before clip extraction: every consecutive "
    "frame pair of the real BMV container is BMP-decoded and scored "
    "by summed absolute pixel difference; pairs above the threshold "
    "are cuts. Entirely map-side (mapInPandas; blobs never shuffle — "
    "only per-doc scalars leave the task), embarrassingly parallel "
    "across videos. The oracle derives every pair's motion "
    "analytically from the frame-synthesis rule (per-pixel deltas are "
    "17 or 239 depending on mod-256 wraparound), so a decode or "
    "differencing bug breaks the hash match.",
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                if buf[:4] != _BMV_MAGIC:
                    raise ValueError("not a BMV container")
                n_total, _dur = struct.unpack_from("<II", buf, 4)
                off = 12
                frames = []
                for _ in range(n_total):
                    hdr = struct.unpack_from(_BMP_FILE_HDR, buf, off)
                    size = hdr[1]
                    frames.append(
                        decode_bmp(buf[off : off + size]).astype(np.int64)
                    )
                    off += size
                n_cuts, total = 0, 0
                for a, b in zip(frames, frames[1:]):
                    motion = int(np.abs(b - a).sum())
                    total += motion
                    if motion > SCENE_CUT_THRESHOLD:
                        n_cuts += 1
                out.append((int(doc_id), len(frames), n_cuts, total))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_frames", "n_cuts", "total_motion"]
            )

    return attach_video_payload(d).mapInPandas(
        run,
        schema="doc_id long, n_frames long, n_cuts long, total_motion long",
    )


# ------------------------------------------------------ mp4 container


def attach_mp4_payload(d: DataFrame) -> DataFrame:
    """Synthesize a real ISO-BMFF mp4 per doc (executor-side): the same
    BMP frames as the BMV fixture, muxed into a standard single-track
    mp4 (ops/isobmff.py) under the 'bmpf' sample-entry fourcc."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, durs = [], []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                dur = max(int(n) * 10, 1)
                n_total = -(-dur // VIDEO_FRAME_MS)
                frames = [
                    encode_bmp(synth_frame_pixels(int(i), k))
                    for k in range(n_total)
                ]
                payloads.append(
                    mux_mp4(
                        frames,
                        VIDEO_FRAME_MS,
                        b"bmpf",
                        VIDEO_FRAME_W,
                        VIDEO_FRAME_H,
                    )
                )
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "duration_ms": durs,
                    "payload": payloads,
                }
            )

    return d.select("doc_id", "n_chars").mapInPandas(
        run, schema="doc_id long, duration_ms long, payload binary"
    )


@register(
    "mm_mp4_demux",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, GREATEST(n_chars * 10, 1) AS dur
    FROM documents WHERE doc_id < 500
),
samp AS (
    SELECT doc_id, dur,
           UNNEST(range(0, CAST(CEIL(dur / 1000.0) AS BIGINT))) AS i
    FROM docs
),
xs AS (SELECT UNNEST(range(0, {VIDEO_FRAME_W})) AS x),
ys AS (SELECT UNNEST(range(0, {VIDEO_FRAME_H})) AS y)
SELECT doc_id,
       CAST(MAX(dur) AS BIGINT) AS duration_ms,
       CAST(COUNT(DISTINCT i) AS BIGINT) AS n_frames,
       CAST(SUM((doc_id * 31 + (4 * i) * 17 + x * 7 + y * 13) % 256)
            AS BIGINT) AS frames_pixel_sum
FROM samp, xs, ys
GROUP BY doc_id
""",
    doc="STANDARD-container video sampling end to end: a real ISO-BMFF "
    "mp4 (ftyp/moov/mdat with full stsd/stts/stsz/stsc/stco sample "
    "tables, muxed and demuxed by ops/isobmff.py — the identical box "
    "walk any mp4 reader performs, 64-bit co64 and multi-chunk stsc "
    "included) is synthesized per doc, frames are recovered at "
    "1 frame/s purely from the sample tables, BMP-decoded, and "
    "pixel-summed. Same analytic oracle as mm_frame_sample, so a "
    "mux/demux bug anywhere in the box layout breaks the hash match. "
    "This closes the external-container gap at the container level; "
    "compressed-codec payloads (h264/vp9) demux identically but "
    "raise at decode, where ffmpeg is genuinely required. Blobs never "
    "shuffle — only scalar sums leave the demux task.",
)
def mm_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    vids = attach_mp4_payload(d)
    frames = sample_frames_df(vids)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "px_sum": [
                        int(decode_bmp(bytes(b)).astype(np.int64).sum())
                        for b in pdf["frame"]
                    ],
                }
            )

    sums = frames.mapInPandas(decode, schema="doc_id long, px_sum long")
    return (
        sums.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("px_sum").alias("frames_pixel_sum"),
        )
        .join(_doc_video_duration(d), "doc_id")
        .select("doc_id", "duration_ms", "n_frames", "frames_pixel_sum")
    )


def attach_webm_payload(d: DataFrame) -> DataFrame:
    """Synthesize a real Matroska/WebM blob per doc: the same BMP
    frames, packed as SimpleBlocks across multi-block clusters
    (ops/ebml.py) under the V_BMPF codec id."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, durs = [], []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                dur = max(int(n) * 10, 1)
                n_total = -(-dur // VIDEO_FRAME_MS)
                frames = [
                    encode_bmp(synth_frame_pixels(int(i), k))
                    for k in range(n_total)
                ]
                payloads.append(mux_webm(frames, VIDEO_FRAME_MS, "V_BMPF"))
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "duration_ms": durs,
                    "payload": payloads,
                }
            )

    return d.select("doc_id", "n_chars").mapInPandas(
        run, schema="doc_id long, duration_ms long, payload binary"
    )


@register(
    "mm_webm_demux",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, GREATEST(n_chars * 10, 1) AS dur
    FROM documents WHERE doc_id < 500
),
samp AS (
    SELECT doc_id, dur,
           UNNEST(range(0, CAST(CEIL(dur / 1000.0) AS BIGINT))) AS i
    FROM docs
),
xs AS (SELECT UNNEST(range(0, {VIDEO_FRAME_W})) AS x),
ys AS (SELECT UNNEST(range(0, {VIDEO_FRAME_H})) AS y)
SELECT doc_id,
       CAST(MAX(dur) AS BIGINT) AS duration_ms,
       CAST(COUNT(DISTINCT i) AS BIGINT) AS n_frames,
       CAST(SUM((doc_id * 31 + (4 * i) * 17 + x * 7 + y * 13) % 256)
            AS BIGINT) AS frames_pixel_sum
FROM samp, xs, ys
GROUP BY doc_id
""",
    doc="Matroska/WebM container demux end to end: real EBML varint "
    "walk (Segment → Tracks/TrackEntry → Cluster → Timestamp + "
    "SimpleBlock with relative timestamps, multi-block clusters — "
    "ops/ebml.py, the walk any mkv reader performs), frames recovered "
    "at 1 frame/s, BMP-decoded, pixel-summed. Same analytic oracle as "
    "the mp4 and BMV paths, so all three container walks must agree "
    "bit-for-bit. Compressed codecs (V_VP9/V_AV1) demux identically "
    "but gate at decode where ffmpeg is genuinely required. Blobs "
    "never shuffle — only scalar sums leave the demux task.",
)
def mm_webm_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    vids = attach_webm_payload(d)
    frames = sample_frames_df(vids)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "px_sum": [
                        int(decode_bmp(bytes(b)).astype(np.int64).sum())
                        for b in pdf["frame"]
                    ],
                }
            )

    sums = frames.mapInPandas(decode, schema="doc_id long, px_sum long")
    return (
        sums.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("px_sum").alias("frames_pixel_sum"),
        )
        .join(_doc_video_duration(d), "doc_id")
        .select("doc_id", "duration_ms", "n_frames", "frames_pixel_sum")
    )


# ------------------------------------------------ voice activity (VAD)

VAD_FRAME = 160  # 10 ms at 16 kHz
# frame activity threshold = frame_len * E[|sample|] for samples
# uniform over int16: 160 * 16384
VAD_THRESHOLD = VAD_FRAME * 16384


@register(
    "mm_audio_vad",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, 800 + (doc_id * 37) % 800 AS n
    FROM documents WHERE doc_id < 500
),
ii AS (SELECT UNNEST(range(0, {MAX_AUDIO_N})) AS i),
fe AS (
    SELECT doc_id, i // {VAD_FRAME} AS f,
           SUM(ABS(((doc_id * 7919 + i * 104729) % 65536) - 32768)) AS energy
    FROM docs, ii
    WHERE i < (n // {VAD_FRAME}) * {VAD_FRAME}
    GROUP BY doc_id, i // {VAD_FRAME}
),
fl AS (
    SELECT doc_id, f,
           CASE WHEN energy >= {VAD_THRESHOLD} THEN 1 ELSE 0 END AS active
    FROM fe
),
isl AS (
    SELECT doc_id, f, active,
           f - ROW_NUMBER() OVER (PARTITION BY doc_id, active
                                  ORDER BY f) AS grp
    FROM fl
),
runs AS (
    SELECT doc_id, COUNT(*) AS run_len
    FROM isl WHERE active = 1
    GROUP BY doc_id, grp
)
SELECT fl.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(active) AS BIGINT) AS n_active,
       CAST(COALESCE(MAX(r.n_segments), 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(MAX(r.longest), 0) AS BIGINT) AS longest_run
FROM fl
LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n_segments, MAX(run_len) AS longest
    FROM runs GROUP BY doc_id
) r ON r.doc_id = fl.doc_id
GROUP BY fl.doc_id
""",
    doc="Voice-activity detection over real WAV payloads: synthesize a "
    "genuine RIFF/WAVE clip per doc, decode it (header-parsed), frame "
    "the PCM into 10 ms windows, flag frames whose absolute energy "
    "clears a fixed threshold, and emit per-clip segmentation stats "
    "(active frames, speech segments = runs of active frames, longest "
    "run). All emitted stats are exact integers; the oracle recomputes "
    "frame energies analytically and derives runs with the gaps-and-"
    "islands window. Arrow-batched mapInPandas; only O(1) integers per "
    "clip leave the executor — PCM never shuffles, so the detector "
    "scales to a 100 TB audio corpus exactly like mm_audio_resample.",
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for doc_id in pdf["doc_id"]:
                blob = encode_wav(synth_samples(int(doc_id)))
                _, pcm = decode_wav(blob)
                nf = len(pcm) // VAD_FRAME
                frames = (
                    np.abs(pcm[: nf * VAD_FRAME].astype(np.int64))
                    .reshape(nf, VAD_FRAME)
                    .sum(axis=1)
                )
                active = frames >= VAD_THRESHOLD
                # run-length encode the activity mask
                edges = np.diff(active.astype(np.int8), prepend=0)
                starts = int((edges == 1).sum())
                longest = 0
                run = 0
                for a in active:
                    run = run + 1 if a else 0
                    longest = max(longest, run)
                out.append(
                    (int(doc_id), nf, int(active.sum()), starts, longest)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_frames", "n_active", "n_segments",
                    "longest_run",
                ],
            )

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return d.select("doc_id").mapInPandas(
        vad,
        schema=(
            "doc_id long, n_frames long, n_active long, n_segments long, "
            "longest_run long"
        ),
    )


# --------------------------------------------------- video-level dedup


def attach_video_payload_by_content(d: DataFrame) -> DataFrame:
    """Video fixture with RE-UPLOADED DUPLICATES: the content seed is
    doc_id % 100, so every 100th doc carries a bit-identical video
    (same frames, same duration) under a different doc_id — the
    re-encode/re-upload situation video dedup exists for."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cids = (pdf["doc_id"] % 100).astype("int64")
            durs = (1000 + (cids % 7) * 500).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "duration_ms": durs,
                    "payload": [
                        encode_bmv(int(c), int(dur))
                        for c, dur in zip(cids, durs)
                    ],
                }
            )

    return d.select("doc_id").mapInPandas(
        run, schema="doc_id long, duration_ms long, payload binary"
    )


@register(
    "mm_video_dedup",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, doc_id % 100 AS cid,
           1000 + (doc_id % 100 % 7) * 500 AS dur
    FROM documents WHERE doc_id < 500
),
samp AS (
    SELECT doc_id, cid,
           UNNEST(range(0, CAST(CEIL(dur / CAST({VIDEO_FRAME_MS} AS DOUBLE))
                              AS BIGINT) * {VIDEO_FRAME_MS},
                   {FRAME_STRIDE_MS})) AS ts
    FROM docs
),
xs AS (SELECT UNNEST(range(0, {VIDEO_FRAME_W})) AS x),
ys AS (SELECT UNNEST(range(0, {VIDEO_FRAME_H})) AS y),
fsum AS (
    SELECT doc_id, cid, ts,
           SUM((cid * 31 + (ts // {VIDEO_FRAME_MS}) * 17 + x * 7 + y * 13)
               % 256) AS px
    FROM samp, xs, ys
    GROUP BY doc_id, cid, ts
),
sig AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(STRING_AGG(
               CAST(ts AS VARCHAR) || ':' || CAST(px AS VARCHAR), ','
               ORDER BY ts)), 1, 15) AS BIGINT) AS fingerprint
    FROM fsum GROUP BY doc_id
)
SELECT fingerprint,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM sig GROUP BY fingerprint
""",
    doc="Exact video-level dedup over REAL container payloads: each "
    "clip's sampled frames decode genuinely (BMV header parse + BMP "
    "pixel decode), per-frame integer pixel sums form an ordered "
    "(ts, sum) signature, and a 60-bit md5 of the signature keys one "
    "hash aggregate — the re-upload detector. The fixture plants "
    "bit-identical duplicates (content seed = doc_id % 100) so "
    "groups of 5 re-uploads collapse to one keeper. Blobs never "
    "shuffle: only doc_id + integers leave the decode stage, and the "
    "signature join key is 8 bytes, exactly like dedup_exact. The "
    "oracle recomputes frames analytically and mirrors the signature "
    "string byte for byte.",
)
def mm_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import md5_hash60

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    vids = attach_video_payload_by_content(d)
    frames = sample_frames_df(vids)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "ts_ms": pdf["ts_ms"].astype("int64"),
                    "px": [
                        int(decode_bmp(bytes(b)).astype(np.int64).sum())
                        for b in pdf["frame"]
                    ],
                }
            )

    sums = frames.mapInPandas(decode, schema="doc_id long, ts_ms long, px long")
    sig = (
        sums.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ts_ms", "px"))),
                    lambda s: F.concat_ws(
                        ":",
                        s["ts_ms"].cast("string"),
                        s["px"].cast("string"),
                    ),
                ),
                ",",
            ).alias("sig_str")
        )
        .select("doc_id", md5_hash60(F.col("sig_str")).alias("fingerprint"))
    )
    return sig.groupBy("fingerprint").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min("doc_id").cast("long").alias("keep_doc_id"),
    )


# ------------------------------------------------ image near-dup pairs

HAM_T = 3  # hamming threshold; 4 bands of 16 bits => pigeonhole-exact


def attach_image_payload_near_dup(d: DataFrame) -> DataFrame:
    """Image fixture with NEAR-duplicates: content seed cid = doc_id %
    100 (5 re-uploads per content at doc_id < 500) and a per-copy
    perturbation of ONE source pixel ((0,0) += copy index, mod 256) —
    the re-encode/brightness-tweak situation perceptual dedup exists
    for. Every copy shares the base image's dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                px = synth_pixels(i % 100).copy()
                px[0, 0] = (int(px[0, 0]) + i // 100) % 256
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    return d.select("doc_id").mapInPandas(
        run, schema="doc_id long, payload binary"
    )


@register(
    "mm_image_near_dup",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, doc_id % 100 AS cid, doc_id // 100 AS k,
         4 + (doc_id % 100) % 13 AS w, 4 + (doc_id % 100) % 7 AS h
  FROM documents WHERE doc_id < 500
),
xs AS (SELECT UNNEST(range(0, {RESIZE_W})) AS x),
ys AS (SELECT UNNEST(range(0, {RESIZE_H})) AS y),
px AS (
  SELECT doc_id, y, x,
         CASE WHEN (x * w) // {RESIZE_W} = 0 AND (y * h) // {RESIZE_H} = 0
              THEN (cid * 31 + k) % 256
              ELSE (cid * 31 + ((x * w) // {RESIZE_W}) * 7
                    + ((y * h) // {RESIZE_H}) * 13) % 256 END AS v
  FROM dims, xs, ys
),
tots AS (SELECT doc_id, SUM(v) AS total FROM px GROUP BY doc_id),
bits AS (
  SELECT p.doc_id, (p.y * {RESIZE_W} + p.x) // 16 AS b,
         CASE WHEN p.v * {RESIZE_W * RESIZE_H} >= t.total
              THEN (CAST(1 AS BIGINT)
                    << (15 - (p.y * {RESIZE_W} + p.x) % 16))
              ELSE 0 END AS wgt
  FROM px p JOIN tots t USING (doc_id)
),
bands AS (SELECT doc_id, b, SUM(wgt) AS bv FROM bits GROUP BY doc_id, b),
hb AS (
  SELECT doc_id,
         MAX(CASE WHEN b = 0 THEN bv END) AS b0,
         MAX(CASE WHEN b = 1 THEN bv END) AS b1,
         MAX(CASE WHEN b = 2 THEN bv END) AS b2,
         MAX(CASE WHEN b = 3 THEN bv END) AS b3
  FROM bands GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
          AS INTEGER) AS hamming
FROM hb a JOIN hb b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= {HAM_T}
""",
    doc="Perceptual image NEAR-dup pairs by banded aHash Hamming "
    "distance — the distance-tolerant upgrade of mm_image_ahash's "
    "exact-equal clustering: real BMP decode → 8x8 aHash packed into "
    f"four 16-bit band integers → candidate pairs via EQUI join on "
    f"(band index, band value) → verify Hamming <= {HAM_T} with "
    "bit_count(xor). The banding is pigeonhole-EXACT at this "
    f"threshold ({HAM_T} flipped bits cannot touch all 4 bands), so "
    "the engine's banded join provably equals the oracle's "
    "brute-force all-pairs spec — LSH with zero false negatives, "
    "verified construction-vs-spec. Blobs never shuffle (decode is "
    "mapInPandas); candidates shuffle on 16-bit band keys exactly "
    "like dedup_minhash_pairs' (band,hash) join, so the everywhere-"
    "pairs term is bounded by band-bucket occupancy at any scale.",
)
def mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp(bytes(buf))
                small = resize_nearest(px, RESIZE_W, RESIZE_H).astype(np.int64)
                bits = (small * small.size >= small.sum()).astype(np.uint8).ravel()
                bands = [
                    int("".join(map(str, bits[b * 16 : (b + 1) * 16])), 2)
                    for b in range(4)
                ]
                rows.append((int(doc_id), *bands))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    hashes = attach_image_payload_near_dup(d).mapInPandas(
        run, schema="doc_id long, b0 long, b1 long, b2 long, b3 long"
    )
    bcols = ["b0", "b1", "b2", "b3"]
    banded = hashes.select(
        "doc_id",
        *bcols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"), F.col(c).alias("bv")
                    )
                    for i, c in enumerate(bcols)
                ]
            )
        ).alias("band"),
    ).select("doc_id", *bcols, "band.bi", "band.bv")
    a, b = banded.alias("a"), banded.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.{c}").bitwiseXOR(F.col(f"b.{c}")))
        for c in bcols
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= HAM_T)
        .distinct()
    )
    return pairs
