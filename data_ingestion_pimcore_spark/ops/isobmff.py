"""Minimal stdlib ISO-BMFF (MP4) muxer/demuxer — container-level only.

Closes the "external video containers" gap honestly: the CONTAINER
path is real (standard box walk per ISO/IEC 14496-12: ftyp/moov/trak/
mdia/minf/stbl with stsd, stts, stsz, stsc, stco/co64 — the same
tables every mp4 demuxer reads, any codec), while CODEC decode beyond
the fixture's BMP-in-mp4 sample entries still requires ffmpeg/PyAV and
raises, clearly labeled, in `ops.multimodal.sample_frames_batch`.

The muxer writes a valid single-track video mp4 whose samples are
arbitrary blobs under a declared sample-entry fourcc; the demuxer
recovers (timestamp, payload) pairs from ANY progressive mp4 whose
sample tables it can walk, including multi-chunk stsc layouts and
64-bit co64 offsets. Round-trip identity is property-tested.

Reference parity note: the reference pipeline has no video surface at
all (SURVEY §2.2); this extends the engine's beyond-reference
multimodal inventory. No reference code exists to cite.
"""

from __future__ import annotations

import struct

_FULLBOX_HDR = 4  # version(1) + flags(3)


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + payload)


def _visual_sample_entry(fourcc: bytes, width: int, height: int) -> bytes:
    # SampleEntry(8 reserved/dref) + VisualSampleEntry fields
    p = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    return _box(fourcc, p)


def mux_mp4(
    samples: list[bytes],
    frame_ms: int,
    fourcc: bytes = b"bmpf",
    width: int = 4,
    height: int = 4,
    timescale: int = 1000,
) -> bytes:
    """One video track, one chunk, constant sample duration."""
    n = len(samples)
    if n == 0:
        raise ValueError("mp4 needs at least one sample")
    dur = n * frame_ms

    def moov(chunk_offset: int) -> bytes:
        mvhd = _full(
            b"mvhd",
            0,
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">iH", 0x00010000, 0x0100)
            + b"\x00" * 10
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),  # next track id
        )
        tkhd = _full(
            b"tkhd",
            0,
            struct.pack(">IIIII", 0, 0, 1, 0, dur)
            + b"\x00" * 8
            + struct.pack(">hhhH", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _full(
            b"mdhd",
            0,
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),  # 'und' language
        )
        hdlr = _full(
            b"hdlr",
            0,
            struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"frames\x00",
        )
        vmhd = _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0))
        # self-contained data reference: url box, version 0, flags 1
        dref = _full(
            b"dref", 0, struct.pack(">I", 1) + _box(b"url ", struct.pack(">I", 1))
        )
        dinf = _box(b"dinf", dref)
        stsd = _full(
            b"stsd",
            0,
            struct.pack(">I", 1) + _visual_sample_entry(fourcc, width, height),
        )
        stts = _full(b"stts", 0, struct.pack(">III", 1, n, frame_ms))
        stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _full(
            b"stsz",
            0,
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        stco = _full(b"stco", 0, struct.pack(">II", 1, chunk_offset))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    body = b"".join(samples)
    # moov size is offset-independent (stco entry is fixed 4 bytes):
    # measure once with a placeholder, then emit with the real offset.
    moov_len = len(moov(0))
    chunk_offset = len(ftyp) + moov_len + 8  # mdat payload start
    return ftyp + moov(chunk_offset) + _box(b"mdat", body)


def _iter_boxes(buf: memoryview, start: int, end: int):
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        fourcc = bytes(buf[off + 4 : off + 8])
        hdr = 8
        if size == 1:
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr:
            raise ValueError(f"corrupt box {fourcc!r} at {off}")
        yield fourcc, off + hdr, off + size
        off += size


def _find(buf: memoryview, start: int, end: int, *path: bytes) -> tuple[int, int]:
    cur = [(start, end)]
    for name in path:
        nxt = None
        for s, e in cur:
            for fc, ps, pe in _iter_boxes(buf, s, e):
                if fc == name:
                    nxt = (ps, pe)
                    break
            if nxt:
                break
        if nxt is None:
            raise ValueError(f"box {name!r} not found")
        cur = [nxt]
    return cur[0]


def is_mp4(buf: bytes) -> bool:
    return len(buf) >= 12 and bytes(buf[4:8]) == b"ftyp"


def demux_mp4(buf: bytes) -> tuple[bytes, int, list[tuple[int, bytes]]]:
    """Walk the sample tables of the FIRST video track. Returns
    (sample-entry fourcc, timescale, [(timestamp_ms, payload)...])."""
    mv = memoryview(buf)
    moov_s, moov_e = _find(mv, 0, len(buf), b"moov")
    video = None
    for fc, ts_, te in _iter_boxes(mv, moov_s, moov_e):
        if fc != b"trak":
            continue
        try:
            hs, he = _find(mv, ts_, te, b"mdia", b"hdlr")
        except ValueError:
            continue
        if bytes(mv[hs + _FULLBOX_HDR + 4 : hs + _FULLBOX_HDR + 8]) == b"vide":
            video = (ts_, te)
            break
    if video is None:
        raise ValueError("no video track")
    trak_s, trak_e = video

    mh_s, _ = _find(mv, trak_s, trak_e, b"mdia", b"mdhd")
    version = mv[mh_s]
    timescale = struct.unpack_from(
        ">I", mv, mh_s + _FULLBOX_HDR + (16 if version == 1 else 8)
    )[0]

    stbl_s, stbl_e = _find(mv, trak_s, trak_e, b"mdia", b"minf", b"stbl")

    sd_s, _ = _find(mv, stbl_s, stbl_e, b"stsd")
    fourcc = bytes(mv[sd_s + _FULLBOX_HDR + 4 + 4 : sd_s + _FULLBOX_HDR + 4 + 8])

    tt_s, _ = _find(mv, stbl_s, stbl_e, b"stts")
    n_tt = struct.unpack_from(">I", mv, tt_s + _FULLBOX_HDR)[0]
    deltas: list[int] = []
    for i in range(n_tt):
        cnt, d = struct.unpack_from(">II", mv, tt_s + _FULLBOX_HDR + 4 + 8 * i)
        deltas.extend([d] * cnt)

    sz_s, _ = _find(mv, stbl_s, stbl_e, b"stsz")
    const_sz, n_samples = struct.unpack_from(">II", mv, sz_s + _FULLBOX_HDR)
    sizes = (
        [const_sz] * n_samples
        if const_sz
        else list(
            struct.unpack_from(f">{n_samples}I", mv, sz_s + _FULLBOX_HDR + 8)
        )
    )

    sc_s, _ = _find(mv, stbl_s, stbl_e, b"stsc")
    n_sc = struct.unpack_from(">I", mv, sc_s + _FULLBOX_HDR)[0]
    sc = [
        struct.unpack_from(">III", mv, sc_s + _FULLBOX_HDR + 4 + 12 * i)
        for i in range(n_sc)
    ]

    try:
        co_s, _ = _find(mv, stbl_s, stbl_e, b"stco")
        n_co = struct.unpack_from(">I", mv, co_s + _FULLBOX_HDR)[0]
        offsets = list(
            struct.unpack_from(f">{n_co}I", mv, co_s + _FULLBOX_HDR + 4)
        )
    except ValueError:
        co_s, _ = _find(mv, stbl_s, stbl_e, b"co64")
        n_co = struct.unpack_from(">I", mv, co_s + _FULLBOX_HDR)[0]
        offsets = list(
            struct.unpack_from(f">{n_co}Q", mv, co_s + _FULLBOX_HDR + 4)
        )

    # stsc runs -> samples per chunk; then absolute per-sample offsets
    out: list[tuple[int, bytes]] = []
    t_units = 0
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        spc = 0
        for first, count, _desc in sc:
            if first <= ci:
                spc = count
        pos = chunk_off
        for _ in range(spc):
            if si >= n_samples:
                break
            out.append(
                (t_units * 1000 // timescale, bytes(mv[pos : pos + sizes[si]]))
            )
            pos += sizes[si]
            t_units += deltas[si] if si < len(deltas) else 0
            si += 1
    if si != n_samples:
        raise ValueError(f"sample walk covered {si}/{n_samples}")
    return fourcc, timescale, out
