"""Pure-python PNG codec (RFC 2083 / W3C PNG spec).

Un-gates the `png` image container for the multimodal pipeline
(functions/multimodal.py decode_image/encode_image) — the sandbox has
no PIL/cv2, but PNG is zlib (stdlib) + per-scanline filters, both
public. Supports the shapes training-data images use: bit depth 8,
color types gray / gray+alpha / RGB / RGBA / palette, no interlace.

Validation: tests/test_multimodal.py round-trips pixels through the
JVM's javax.imageio (Spark is running anyway) — our decoder must read
ImageIO-written PNGs pixel-exactly and ImageIO must read ours.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    pass


def _chunks(b: bytes):
    if b[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos: pos + 4], "big")
        ctype = b[pos + 4: pos + 8]
        data = b[pos + 8: pos + 8 + ln]
        crc = int.from_bytes(b[pos + 8 + ln: pos + 12 + ln], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r} chunk")
        yield ctype, data
        pos += 12 + ln
        if ctype == b"IEND":
            return
    raise PngError("truncated PNG (no IEND)")


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode(b: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8 array (palette expanded to RGB)."""
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    for ctype, data in _chunks(bytes(b)):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8:
                raise PngError(f"bit depth {bit_depth} unsupported (8 only)")
            if color_type not in _CHANNELS:
                raise PngError(f"color type {color_type} unsupported")
            if interlace:
                raise PngError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise PngError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise PngError("IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos: pos + stride], dtype=np.uint8).astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                bb = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode(arr: np.ndarray, level: int = 6) -> bytes:
    """(H, W[, C]) uint8 → PNG (filter 0; gray/GA/RGB/RGBA by C)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise PngError(f"cannot encode {ch}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += arr[y].tobytes()
    idat = zlib.compress(bytes(raw), level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
