"""Pure-python GIF codec (GIF87a/89a): LZW, palettes, interlace, frames.

Un-gates the third major training-data image container (after PNG and
JPEG): the sandbox has no PIL/cv2, but GIF is public — logical screen
descriptor, color tables, variable-code-width LZW with clear/EOI codes,
the four-pass interlace, and the 89a graphic-control extension
(transparency + frame disposal). Animated GIFs double as the simplest
video container, so :func:`decode_frames` feeds the video
frame-sampling kernels.

Validation (tests/test_multimodal.py): decode of javax.imageio-written
GIFs is pixel-exact, and our encoded GIFs read back pixel-exact through
javax.imageio — both directions against the stock Java codec.

Reference parity note: the reference manipulates opaque payload bytes
only (no image ops); this backs the multimodal kernels our engine adds
on top (SURVEY.md LLM-pipeline operators).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# -- LZW ---------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW: variable width starting at min_code_size+1,
    clear code resets the table, codes grow to 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"corrupt LZW code {code}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            return out


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for px in pixels:
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= (1 << 12):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([px])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- container ---------------------------------------------------------------


def _read_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos: pos + n])
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def decode_frames(data: bytes) -> list[np.ndarray]:
    """All frames composited onto the logical screen per the 89a
    disposal model; each frame is (H, W, 4) uint8 RGBA."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF (bad signature)")
    sw, sh, flags, bg_idx, _par = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos: pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    if gct is not None and not (flags & 0x80 and bg_idx >= len(gct)):
        pass  # background starts transparent for composition purposes
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    prev_canvas = None
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _read_blocks(data, pos)
                gflags = blk[0]
                disposal = (gflags >> 2) & 0x7
                transparent = blk[3] if (gflags & 1) else None
            else:  # comment / app / plain text — skip sub-blocks
                _blk, pos = _read_blocks(data, pos)
            continue
        if b0 != 0x2C:
            raise GifError(f"unexpected block 0x{b0:02x}")
        # image descriptor
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos: pos + 9])
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(data[pos: pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise GifError("image without any color table")
        min_code = data[pos]
        pos += 1
        raw, pos = _read_blocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code, raw, w * h)[: w * h], dtype=np.uint8
        )
        if len(idx) < w * h:  # pad truncated frames
            idx = np.concatenate([idx, np.zeros(w * h - len(idx), dtype=np.uint8)])
        idx = idx.reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if disposal == 3:
            prev_canvas = canvas.copy()
        rgba = np.zeros((h, w, 4), dtype=np.uint8)
        safe = np.minimum(idx, len(lct) - 1)
        rgba[:, :, :3] = lct[safe]
        rgba[:, :, 3] = 255
        if transparent is not None:
            rgba[idx == transparent, 3] = 0
        region = canvas[top: top + h, left: left + w]
        mask = rgba[:, :, 3] == 255
        region[mask] = rgba[mask]
        frames.append(canvas.copy())
        # disposal AFTER the frame is displayed
        if disposal == 2:  # restore to background (transparent)
            canvas[top: top + h, left: left + w] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise GifError("no image data found")
    return frames


def decode(data: bytes) -> np.ndarray:
    """First frame as (H, W, 3) RGB (the multimodal kernel contract);
    transparent pixels come back black."""
    return decode_frames(data)[0][:, :, :3]


def encode(arr: np.ndarray, loop: bool = False) -> bytes:
    """(H, W, 3) uint8 → single-frame GIF89a. Images with more than 256
    distinct colors are rejected (GIF is palette-bound; quantization is
    a modeling choice we don't make silently)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise GifError(f"{len(palette)} colors exceed GIF's 256-entry palette")
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_size = 1 << depth
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, depth)
    out.append(min_code)
    lzw = _lzw_encode(min_code, inverse.astype(np.uint8).tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out += b"\x3b"
    return bytes(out)


def encode_frames(frames: list[np.ndarray], delay_cs: int = 10, loop: bool = True) -> bytes:
    """Frames ((H, W, 3) or (H, W) uint8, same size) → animated GIF89a:
    one shared global palette (union of all frames' colors, ≤256), a
    graphic-control extension per frame (disposal=none, `delay_cs`
    centiseconds), and an optional NETSCAPE2.0 infinite-loop block."""
    if not frames:
        raise GifError("cannot encode an empty frame list")
    norm = []
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.ndim == 2:
            f = np.stack([f] * 3, axis=-1)
        norm.append(f[:, :, :3])
    h, w = norm[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in norm):
        raise GifError("all frames must share one size")
    flat = np.concatenate([f.reshape(-1, 3) for f in norm])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise GifError(f"{len(palette)} colors exceed GIF's 256-entry palette")
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_size = 1 << depth
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    per_frame = w * h
    min_code = max(2, depth)
    for fi in range(len(norm)):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        idx = inverse[fi * per_frame : (fi + 1) * per_frame].astype(np.uint8)
        lzw = _lzw_encode(min_code, idx.tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
