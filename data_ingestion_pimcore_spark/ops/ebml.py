"""Minimal stdlib Matroska/WebM (EBML) muxer/demuxer — container level.

Companion to ops/isobmff.py: together they cover the two container
families real video corpora arrive in (mp4 + webm/mkv). The EBML walk
here is the standard one every Matroska reader performs — varint
element IDs, varint sizes, Segment → Tracks → TrackEntry (track
number, type, CodecID), then Cluster → Timestamp + SimpleBlock
(track varint, signed 16-bit relative timestamp, flags, payload).
Codec PAYLOADS come out of the container for any codec; decode beyond
the fixture codec is gated exactly like the mp4 path (ffmpeg/PyAV is
genuinely absent in this environment).

Reference parity note: the reference has no video surface (SURVEY
§2.2); this extends the beyond-reference multimodal inventory. Public
spec: RFC 8794 (EBML) + the Matroska element registry.
"""

from __future__ import annotations

import struct

# Matroska element IDs (as they appear on the wire, marker bit included)
_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_DOC_TYPE = 0x4282


def _enc_id(eid: int) -> bytes:
    out = []
    while eid:
        out.append(eid & 0xFF)
        eid >>= 8
    return bytes(reversed(out))


def _enc_size(n: int) -> bytes:
    """EBML varint size: length marker in the leading bits."""
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            v = n | (1 << (7 * width))
            return v.to_bytes(width, "big")
    raise ValueError("size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _uint(n: int) -> bytes:
    out = n.to_bytes((max(n.bit_length(), 1) + 7) // 8, "big")
    return out


def mux_webm(
    samples: list[bytes],
    frame_ms: int,
    codec_id: str = "V_BMPF",
    track_number: int = 1,
    cluster_len: int = 4,
) -> bytes:
    """Single video track; frames split across clusters of
    ``cluster_len`` blocks so the demuxer's cluster walk is real."""
    if not samples:
        raise ValueError("webm needs at least one sample")
    header = _elem(
        _EBML_HEADER,
        _elem(_DOC_TYPE, b"matroska"),
    )
    track = _elem(
        _TRACK_ENTRY,
        _elem(_TRACK_NUMBER, _uint(track_number))
        + _elem(_TRACK_TYPE, _uint(1))  # 1 = video
        + _elem(_CODEC_ID, codec_id.encode()),
    )
    tracks = _elem(_TRACKS, track)
    clusters = b""
    for c0 in range(0, len(samples), cluster_len):
        base_ts = c0 * frame_ms
        blocks = b""
        for k, payload in enumerate(samples[c0 : c0 + cluster_len]):
            rel = k * frame_ms  # relative to cluster timestamp
            blk = (
                _enc_size(track_number)  # track number as varint
                + struct.pack(">h", rel)
                + b"\x80"  # flags: keyframe
                + payload
            )
            blocks += _elem(_SIMPLE_BLOCK, blk)
        clusters += _elem(
            _CLUSTER, _elem(_TIMESTAMP, _uint(base_ts)) + blocks
        )
    return header + _elem(_SEGMENT, tracks + clusters)


def _read_id(buf: memoryview, off: int) -> tuple[int, int]:
    first = buf[off]
    for width in range(1, 5):
        if first & (0x80 >> (width - 1)):
            eid = int.from_bytes(bytes(buf[off : off + width]), "big")
            return eid, off + width
    raise ValueError(f"bad EBML id at {off}")


def _read_size(buf: memoryview, off: int) -> tuple[int, int]:
    first = buf[off]
    for width in range(1, 9):
        if first & (0x80 >> (width - 1)):
            raw = int.from_bytes(bytes(buf[off : off + width]), "big")
            return raw - (1 << (7 * width)), off + width
    raise ValueError(f"bad EBML size at {off}")


def _iter_elems(buf: memoryview, start: int, end: int):
    off = start
    while off < end:
        eid, off = _read_id(buf, off)
        size, off = _read_size(buf, off)
        yield eid, off, off + size
        off += size


def is_webm(buf: bytes) -> bool:
    return len(buf) >= 4 and buf[:4] == _enc_id(_EBML_HEADER)


def demux_webm(buf: bytes) -> tuple[str, list[tuple[int, bytes]]]:
    """Walk the first video track. Returns (CodecID,
    [(timestamp_ms, payload), ...]) in stream order."""
    mv = memoryview(buf)
    seg = None
    for eid, s, e in _iter_elems(mv, 0, len(buf)):
        if eid == _SEGMENT:
            seg = (s, e)
            break
    if seg is None:
        raise ValueError("no Segment element")

    # Pass 1: resolve the video track from the first Tracks element.
    # Matroska permits a Cluster before Tracks (live remuxes do this);
    # a single streaming pass would have no track number to filter on
    # yet and would silently mix audio/subtitle payloads into the
    # video frame list. Tracks is tiny, so the extra pass is free.
    codec = None
    video_track = None
    for eid, s, e in _iter_elems(mv, *seg):
        if eid != _TRACKS:
            continue
        for tid, ts_, te in _iter_elems(mv, s, e):
            if tid != _TRACK_ENTRY:
                continue
            num = typ = None
            cid = ""
            for fid, fs, fe in _iter_elems(mv, ts_, te):
                if fid == _TRACK_NUMBER:
                    num = int.from_bytes(bytes(mv[fs:fe]), "big")
                elif fid == _TRACK_TYPE:
                    typ = int.from_bytes(bytes(mv[fs:fe]), "big")
                elif fid == _CODEC_ID:
                    cid = bytes(mv[fs:fe]).decode()
            if typ == 1:
                video_track, codec = num, cid
                break
        break
    if video_track is None:
        raise ValueError("no video TrackEntry")

    # Pass 2: collect this track's SimpleBlocks in stream order.
    out: list[tuple[int, bytes]] = []
    for eid, s, e in _iter_elems(mv, *seg):
        if eid != _CLUSTER:
            continue
        cluster_ts = 0
        for cid_, cs, ce in _iter_elems(mv, s, e):
            if cid_ == _TIMESTAMP:
                cluster_ts = int.from_bytes(bytes(mv[cs:ce]), "big")
            elif cid_ == _SIMPLE_BLOCK:
                tnum, off = _read_size(mv, cs)
                rel = struct.unpack_from(">h", mv, off)[0]
                # off+2 = flags byte, payload follows
                if tnum == video_track:
                    out.append((cluster_ts + rel, bytes(mv[off + 3 : ce])))
    return codec, out
