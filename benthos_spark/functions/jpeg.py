"""Pure-python baseline JPEG decoder (ITU-T T.81 sequential DCT).

Un-gates the dominant training-data image container: the sandbox has no
PIL/cv2, but baseline JPEG is public — marker segments, canonical
Huffman entropy coding with byte stuffing and restart markers,
dequantization, zig-zag, an 8x8 IDCT, chroma upsampling and the
YCbCr→RGB transform. Supports what cameras and libjpeg emit by
default: 8-bit baseline (SOF0), grayscale or YCbCr with 4:4:4 / 4:2:2 /
4:2:0 sampling. Progressive (SOF2) and arithmetic coding are rejected
with a clear error.

JPEG is lossy and the IDCT is not bit-exact across implementations, so
validation (tests/test_multimodal.py) compares our decode of
javax.imageio-ENCODED images against ImageIO's own decode of the same
bytes under a small tolerance (max |Δ| per channel) — the standard way
conforming decoders are compared.
"""

from __future__ import annotations

import numpy as np


class JpegError(ValueError):
    pass


_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# IDCT basis: X = C^T @ coeff @ C with the orthonormal DCT-II matrix
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


class _Huff:
    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                k += 1
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at (and exposes) restart/terminating markers."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            self.cur = (self.cur << 8) & 0xFFFFFFFFFFFF
            self.nbits += 8
            return
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # feed zeros once a marker is hit
        self.cur = ((self.cur << 8) | b) & 0xFFFFFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def align_restart(self) -> None:
        """Consume a pending RSTn marker and realign to a byte."""
        self.cur = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.marker = None


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode(data: bytes) -> np.ndarray:
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _Huff] = {}
    ac_tables: dict[int, _Huff] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = int.from_bytes(data[pos: pos + 2], "big")
        seg = data[pos + 2: pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p: p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p: p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                table = np.zeros(64, dtype=np.int32)
                table[_ZIGZAG] = vals
                qt[tq] = table.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline (SOF0/1) JPEG is supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1: p + 17])
                n = sum(counts)
                symbols = seg[p + 17: p + 17 + n]
                (dc_tables if tc == 0 else ac_tables)[th] = _Huff(counts, symbols)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                comp["dc"] = dc_tables[tt >> 4]
                comp["ac"] = ac_tables[tt & 0xF]
                scan.append(comp)
            pos += seg_len
            return _decode_scan(
                data, pos, width, height, comps, qt, restart_interval
            )
        pos += seg_len
    raise JpegError("no scan data found")


def _decode_scan(data, pos, width, height, comps, qt, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeff = np.zeros(64, dtype=np.int32)
                        s = br.decode_huff(c["dc"])
                        diff = _extend(br.read_bits(s), s)
                        preds[ci] += diff
                        coeff[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(c["ac"])
                            if rs == 0:
                                break
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break
                            k += run
                            if k > 63:
                                raise JpegError("AC run overflow")
                            coeff[k] = _extend(br.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.int32)
                        block[_ZIGZAG] = coeff
                        px = _idct2(block.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0: y0 + 8, x0: x0 + 8] = px
    # upsample to full resolution and convert. 2x uses libjpeg's "fancy"
    # triangular kernel (what ImageIO/libjpeg apply), so conforming
    # decoders agree within rounding; other ratios use replication.
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry == 2 or rx == 2:
            plane = np.rint(np.clip(plane, 0, 255))
            if ry == 2:
                up = np.empty((plane.shape[0] * 2, plane.shape[1]))
                near = plane
                prev = np.vstack([plane[:1], plane[:-1]])
                nxt = np.vstack([plane[1:], plane[-1:]])
                up[0::2] = 3 * near + prev
                up[1::2] = 3 * near + nxt
                plane = up  # 1/4 scale carried into the horizontal pass
                vscale = 4
            else:
                vscale = 1
            if rx == 2:
                up = np.empty((plane.shape[0], plane.shape[1] * 2))
                near = plane
                prev = np.hstack([plane[:, :1], plane[:, :-1]])
                nxt = np.hstack([plane[:, 1:], plane[:, -1:]])
                if vscale == 4:  # h2v2: (3t + t_adj + 8) >> 4
                    up[:, 0::2] = (3 * near + prev + 8) / 16.0
                    up[:, 1::2] = (3 * near + nxt + 7) / 16.0
                else:  # h2v1: (3s + s_adj + 2) >> 2
                    up[:, 0::2] = (3 * near + prev + 2) / 4.0
                    up[:, 1::2] = (3 * near + nxt + 1) / 4.0
                plane = np.floor(up)
            elif vscale == 4:  # v2 only
                plane = np.floor((plane + 2) / 4.0)
        elif ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:height, :width])
    if len(comps) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
