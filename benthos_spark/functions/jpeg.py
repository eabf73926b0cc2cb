"""Pure-python JPEG decoder (ITU-T T.81): baseline AND progressive DCT.

Un-gates the dominant training-data image container: the sandbox has no
PIL/cv2, but JPEG is public — marker segments, canonical Huffman
entropy coding with byte stuffing and restart markers, dequantization,
zig-zag, an 8x8 IDCT, chroma upsampling and the YCbCr→RGB transform.
Supports what cameras, libjpeg, and the web emit: 8-bit baseline
(SOF0/1) and progressive (SOF2 — spectral selection, successive
approximation with DC/AC refinement scans and EOB runs, T.81 §G.1.2),
grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling. Hierarchical,
lossless, and arithmetic coding are rejected with a clear error.

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
    progressive = False
    coeffs: list[np.ndarray] | None = None  # per-comp (bh, bw, 64) zigzag

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline (SOF0/1) and progressive (SOF2) JPEG is supported")
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
                scan.append((comp, tt))
            if not progressive:
                for comp, tt in scan:
                    comp["dc"] = dc_tables[tt >> 4]
                    comp["ac"] = ac_tables[tt & 0xF]
                return _decode_scan(
                    data, pos + seg_len, width, height, comps, qt, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coeffs is None:
                coeffs = _alloc_coeffs(width, height, comps)
            pos = _decode_prog_scan(
                data, pos + seg_len, comps, scan, dc_tables, ac_tables,
                coeffs, width, height, ss, se, ahal >> 4, ahal & 0xF,
                restart_interval,
            )
            continue
        pos += seg_len
    if progressive and coeffs is not None:
        return _reconstruct_progressive(comps, coeffs, qt, width, height)
    raise JpegError("no scan data found")


def _comp_geometry(width: int, height: int, comps: list[dict]):
    """(hmax, vmax, mcux, mcuy, per-comp block dims): `bw`/`bh` are the
    component's own block counts (non-interleaved scans code exactly
    those, T.81 §A.2.2); allocation uses the MCU-padded `abw`/`abh`."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    geo = []
    for c in comps:
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        geo.append(
            {
                "bw": -(-cw // 8),
                "bh": -(-ch // 8),
                "abw": mcux * c["h"],
                "abh": mcuy * c["v"],
            }
        )
    return hmax, vmax, mcux, mcuy, geo


def _alloc_coeffs(width, height, comps) -> list[np.ndarray]:
    _, _, _, _, geo = _comp_geometry(width, height, comps)
    return [np.zeros((g["abh"], g["abw"], 64), dtype=np.int32) for g in geo]


def _decode_prog_scan(
    data, pos, comps, scan, dc_tables, ac_tables, coeffs,
    width, height, ss, se, ah, al, restart_interval,
):
    """One progressive scan (T.81 §G.1.2) into the coefficient buffers;
    returns the byte offset of the next marker."""
    hmax, vmax, mcux, mcuy, geo = _comp_geometry(width, height, comps)
    br = _BitReader(data, pos)
    count = 0

    if ss == 0:  # DC scan — interleaved (multi-comp) or single-comp
        if se != 0:
            raise JpegError("progressive DC scan with Se != 0")
        idxs = [comps.index(c) for c, _ in scan]
        tables = {
            comps.index(c): (dc_tables[tt >> 4] if ah == 0 else None) for c, tt in scan
        }
        preds = {i: 0 for i in idxs}

        def dc_block(ci, by, bx):
            block = coeffs[ci][by, bx]
            if ah == 0:
                s = br.decode_huff(tables[ci])
                preds[ci] += _extend(br.read_bits(s), s)
                block[0] = preds[ci] << al
            else:  # refinement: one correction bit
                block[0] |= br.read_bit() << al

        if len(scan) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and count % restart_interval == 0:
                        br.align_restart()
                        preds.update({i: 0 for i in idxs})
                    count += 1
                    for c, _tt in scan:
                        ci = comps.index(c)
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(ci, my * c["v"] + by, mx * c["h"] + bx)
        else:
            ci = idxs[0]
            g = geo[ci]
            for by in range(g["bh"]):
                for bx in range(g["bw"]):
                    if restart_interval and count and count % restart_interval == 0:
                        br.align_restart()
                        preds[ci] = 0
                    count += 1
                    dc_block(ci, by, bx)
    else:  # AC scan — always a single component (T.81 §G.1.1.1.1)
        if len(scan) != 1:
            raise JpegError("progressive AC scan must be non-interleaved")
        comp, tt = scan[0]
        ci = comps.index(comp)
        table = ac_tables[tt & 0xF]
        g = geo[ci]
        eobrun = 0
        for by in range(g["bh"]):
            for bx in range(g["bw"]):
                if restart_interval and count and count % restart_interval == 0:
                    br.align_restart()
                    eobrun = 0
                count += 1
                block = coeffs[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, block, table, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(br, block, table, ss, se, al, eobrun)

    # advance to the next non-restart marker
    if br.marker is not None and not (0xD0 <= br.marker <= 0xD7):
        return br.pos - 2
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return p


def _ac_first_block(br, block, table, ss, se, al, eobrun):
    """First AC scan for one block: runs/sizes like baseline plus EOB
    runs (EOBn symbols: s=0, r<15 → a run of 2^r + ext bits all-EOB
    blocks, counting this one)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise JpegError("AC run overflow")
            block[k] = _extend(br.read_bits(s), s) << al
            k += 1
    return eobrun


def _ac_refine_block(br, block, table, ss, se, al, eobrun):
    """AC refinement (T.81 §G.1.2.3): newly nonzero coefficients arrive
    as ±2^Al; every already-nonzero coefficient passed over appends one
    correction bit. EOB-run blocks still carry correction bits."""
    p1 = 1 << al

    def correct(k):
        if br.read_bit() and (block[k] & p1) == 0:
            block[k] += p1 if block[k] > 0 else -p1

    if eobrun > 0:
        for k in range(ss, se + 1):
            if block[k] != 0:
                correct(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(table)
        r, s = rs >> 4, rs & 0xF
        val = 0
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                r = 64  # sweep to Se appending correction bits only
            # r == 15: pass over 16 zero-history coefficients
        else:
            if s != 1:
                raise JpegError("bad AC refinement code")
            val = p1 if br.read_bit() else -p1
        while k <= se:
            if block[k] != 0:
                correct(k)
            else:
                if r == 0:
                    if val:
                        block[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return eobrun


def _reconstruct_progressive(comps, coeffs, qt, width, height):
    """Dequantize + IDCT every block (vectorized einsum over all blocks
    of a plane) and hand off to the shared upsample/color tail."""
    planes = []
    for c, cf in zip(comps, coeffs):
        bh, bw, _ = cf.shape
        nat = np.zeros((bh * bw, 64), dtype=np.float64)
        nat[:, _ZIGZAG] = cf.reshape(-1, 64)
        blocks = nat.reshape(bh, bw, 8, 8) * qt[c["tq"]]
        px = np.einsum("ab,yxbc,cd->yxad", _C.T, blocks, _C) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _assemble(comps, planes, width, height)


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
    return _assemble(comps, planes, width, height)


def _assemble(comps, planes, width, height):
    """Upsample to full resolution and convert. 2x uses libjpeg's "fancy"
    triangular kernel (what ImageIO/libjpeg apply), so conforming
    decoders agree within rounding; other ratios use replication."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
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


# ---------------------------------------------------------------------------
# encoder: baseline sequential (SOF0), 4:4:4 / grayscale, OPTIMIZED
# Huffman tables generated per image by the spec's own algorithm
# (T.81 Annex K.2 code-size computation + K.3 Adjust_BITS) — no
# memorized table constants; quantization = Annex K.1 example tables
# scaled with the public libjpeg quality curve.
# ---------------------------------------------------------------------------

_QT_LUMA_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QT_CHROMA_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _build_huffman_spec(freq: dict) -> tuple[list[int], list[int]]:
    """T.81 K.2 (code sizes via repeated merge of the two least-frequent
    chains, ties to the larger symbol) + K.3 Adjust_BITS (16-deep cap),
    with symbol 256 reserved so the all-ones code is never assigned.
    Returns (BITS[1..16] counts, HUFFVAL symbol list)."""
    freq = dict(freq)
    freq[256] = 1
    others = {s: -1 for s in freq}
    codesize = {s: 0 for s in freq}
    while True:
        nonzero = sorted(
            (s for s in freq if freq[s] > 0), key=lambda s: (freq[s], -s)
        )
        if len(nonzero) < 2:
            break
        v1, v2 = nonzero[0], nonzero[1]
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for s, cs in codesize.items():
        if cs:
            if cs > 32:
                raise JpegError("huffman code size overflow")
            bits[cs] += 1
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved all-ones code
    huffval = sorted(
        (s for s in codesize if codesize[s] and s != 256),
        key=lambda s: (codesize[s], s),
    )
    return bits[1:17], huffval


def _huff_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical (code, length) per symbol — the encoder mirror of
    ``_Huff``."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[huffval[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriterJ:
    """MSB-first bit emitter with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a padded plane → quantized NATURAL-order
    coefficients, (bh*bw, 8, 8), one vectorized einsum."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    shifted = blocks.astype(np.float64) - 128.0
    coeff = np.einsum("ij,bjk,lk->bil", _C, shifted, _C)
    q = np.round(coeff / qt[None, :, :]).astype(np.int32)
    return q


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _block_symbols(zz: np.ndarray, prev_dc: int):
    """One block's (dc_symbol, dc_extra), [(ac_symbol, extra, nbits)…],
    new prev_dc — baseline run/size coding with ZRL and EOB."""
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _size_cat(diff)
    dc_extra = diff if diff >= 0 else diff + (1 << s) - 1
    acs = []
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        sz = _size_cat(v)
        extra = v if v >= 0 else v + (1 << sz) - 1
        acs.append(((run << 4) | sz, extra, sz))
        run = 0
    if last_nz < 63:
        acs.append((0x00, 0, 0))  # EOB
    return (s, dc_extra), acs, dc


def encode(arr: np.ndarray, quality: int = 90) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JFIF JPEG bytes.
    4:4:4 (no subsampling), per-image optimized Huffman tables. Lossy by
    nature: validated by javax.imageio decoding our streams within
    conforming-decoder tolerance (tests/test_multimodal.py)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2 or arr.shape[2] == 1
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    h, w = arr.shape[:2]
    qt_l = _quality_scale(_QT_LUMA_BASE, quality)
    if gray:
        planes = [arr.astype(np.float64)]
        qts = [qt_l]
        comp_q = [0]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [qt_l, _quality_scale(_QT_CHROMA_BASE, quality), None]
        qts[2] = qts[1]
        comp_q = [0, 1, 1]
    # quantized zigzag coefficients per component
    comp_zz = []
    for p, qt in zip(planes, qts):
        qblocks = _fdct_quant(_pad8(np.clip(p, 0.0, 255.0)), qt)
        comp_zz.append(qblocks.reshape(-1, 64)[:, _ZIGZAG])
    n_blocks = comp_zz[0].shape[0]
    # pass 1: symbol statistics per table class (luma=0, chroma=1)
    dc_freq = [{}, {}]
    ac_freq = [{}, {}]
    comp_cls = [0] if gray else [0, 1, 1]
    prev = [0] * len(planes)
    for bi in range(n_blocks):
        for ci in range(len(planes)):
            (s, _), acs, prev[ci] = _block_symbols(comp_zz[ci][bi], prev[ci])
            cls = comp_cls[ci]
            dc_freq[cls][s] = dc_freq[cls].get(s, 0) + 1
            for sym, _x, _n in acs:
                ac_freq[cls][sym] = ac_freq[cls].get(sym, 0) + 1
    n_cls = 1 if gray else 2
    dc_tbl = [_build_huffman_spec(dc_freq[c]) for c in range(n_cls)]
    ac_tbl = [_build_huffman_spec(ac_freq[c]) for c in range(n_cls)]
    dc_codes = [_huff_codes(*t) for t in dc_tbl]
    ac_codes = [_huff_codes(*t) for t in ac_tbl]
    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts[: (1 if gray else 2)]):
        payload = bytes([tid]) + bytes(int(v) for v in qt.reshape(-1)[_ZIGZAG])
        out += b"\xff\xdb" + (len(payload) + 2).to_bytes(2, "big") + payload
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, comp_q[ci]])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for cls in range(n_cls):
        for tclass, (bits, vals) in ((0, dc_tbl[cls]), (1, ac_tbl[cls])):
            payload = bytes([(tclass << 4) | cls]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = comp_cls[ci]
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    # pass 2: entropy-coded data (4:4:4 MCU = one block per component)
    bw = _BitWriterJ()
    prev = [0] * len(planes)
    for bi in range(n_blocks):
        for ci in range(len(planes)):
            cls = comp_cls[ci]
            (s, dc_extra), acs, prev[ci] = _block_symbols(comp_zz[ci][bi], prev[ci])
            code, ln = dc_codes[cls][s]
            bw.write(code, ln)
            bw.write(dc_extra, s)
            for sym, extra, nbits in acs:
                code, ln = ac_codes[cls][sym]
                bw.write(code, ln)
                bw.write(extra, nbits)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
