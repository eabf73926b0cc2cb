"""From-scratch RIFF-AVI container codec for MJPEG video streams.

Public-spec implementation (Microsoft RIFF/AVI file format: RIFF
container + ``hdrl`` headers ``avih``/``strh``/``strf`` + ``movi`` data
chunks + ``idx1`` index; MJPEG = one baseline JPEG per ``00dc`` chunk).
Each frame is encoded/decoded by our own from-scratch T.81 codec
(functions/jpeg.py — itself validated against javax.imageio), so the
only new surface here is the container chunk layout.

Reference parity note: the reference engine treats video payloads as
opaque bytes moved through processors
(/root/reference/internal/message/part.go:8-11); this module is the
pluggable decode kernel the multimodal stage calls per batch
(functions/multimodal.py). No external media library is used.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    pass


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc + LE size + payload, padded to even size."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


# AVIF / AVISF flag constants from the public header (vfw.h)
_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def encode(frames: list[np.ndarray], fps: float = 8.0, quality: int = 90) -> bytes:
    """Encode frames ((H, W) gray or (H, W, 3) RGB uint8, all the same
    size) as an MJPEG AVI: one baseline JPEG per ``00dc`` chunk, with a
    spec-complete ``hdrl`` and an ``idx1`` keyframe index (every MJPEG
    frame is independently decodable, hence a keyframe)."""
    from benthos_spark.functions import jpeg as _jpeg

    if not frames:
        raise AviError("cannot encode an empty frame list")
    f0 = np.asarray(frames[0])
    h, w = f0.shape[:2]
    gray = f0.ndim == 2 or f0.shape[2] == 1
    jpegs = [_jpeg.encode(np.asarray(f, dtype=np.uint8), quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    # rate/scale: fps = dwRate / dwScale; use a 1000 denominator so
    # fractional rates (29.97) survive exactly enough for round-trip
    scale = 1000
    rate = int(round(float(fps) * scale))
    n = len(frames)
    us_per_frame = int(round(1_000_000 * scale / rate)) if rate else 0

    avih = struct.pack(
        "<14I",
        us_per_frame,          # dwMicroSecPerFrame
        max_size * rate // scale if scale else 0,  # dwMaxBytesPerSec (informational)
        0,                     # dwPaddingGranularity
        _AVIF_HASINDEX,        # dwFlags
        n,                     # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_size,              # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,            # dwReserved[4]
    )

    strh = (
        b"vids"                          # fccType
        + b"MJPG"                        # fccHandler
        + struct.pack(
            "<IHHIIIIIIIII",
            0,                           # dwFlags
            0, 0,                        # wPriority, wLanguage
            0,                           # dwInitialFrames
            scale,                       # dwScale
            rate,                        # dwRate
            0,                           # dwStart
            n,                           # dwLength (frames)
            max_size,                    # dwSuggestedBufferSize
            0xFFFFFFFF,                  # dwQuality (default)
            0,                           # dwSampleSize (0: varying)
            0,                           # rcFrame (left, top) packed below
        )
        + struct.pack("<HH", w, h)       # rcFrame right, bottom
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 8 if gray else 24, b"MJPG", w * h * (1 if gray else 3),
        0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_payload = bytearray()
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the start of the 'movi' fourcc
        offset = 4 + len(movi_payload)
        movi_payload += _chunk(b"00dc", j)
        idx += b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, offset, len(j))
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking even-padded
    RIFF chunks in buf[start:end]."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def decode(data: bytes) -> tuple[list[np.ndarray], float]:
    """Parse an MJPEG AVI → (frames as (H, W, C) uint8 arrays, fps).

    Walks the RIFF tree (tolerates unknown chunks), takes fps from the
    first ``vids`` stream header (dwRate/dwScale), and decodes every
    ``##dc``/``##db`` chunk in ``movi`` (including inside ``rec ``
    sub-lists) with our baseline-JPEG decoder."""
    from benthos_spark.functions import jpeg as _jpeg

    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF AVI stream")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    fps = 0.0
    frames: list[np.ndarray] = []

    def walk(start: int, stop: int) -> None:
        nonlocal fps
        for fourcc, p, size in _iter_chunks(data, start, stop):
            if fourcc == b"LIST":
                ltype = data[p : p + 4]
                if ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(p + 4, p + size)
            elif fourcc == b"strh" and size >= 48:
                if data[p : p + 4] == b"vids" and fps == 0.0:
                    (scale,) = struct.unpack_from("<I", data, p + 20)
                    (rate,) = struct.unpack_from("<I", data, p + 24)
                    if scale:
                        fps = rate / scale
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                payload = data[p : p + size]
                if payload[:2] == b"\xff\xd8":
                    frames.append(_jpeg.decode(payload))
                elif size:
                    raise AviError(
                        f"stream chunk {fourcc!r} is not MJPEG (no SOI marker)"
                    )

    walk(12, end)
    if not frames:
        raise AviError("no decodable MJPEG frames found")
    return frames, fps
