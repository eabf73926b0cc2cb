"""Pure-python LZ4 frame format (the pierrec/lz4 frames the reference's
lz4 compress/decompress use, bloblang_encoding.go / processor_compress).

Public specs: the LZ4 block format (token = literal-len nibble +
match-len nibble, LE16 offset, 255-byte length extensions, end-of-block
literal rules) and the LZ4 frame format v1.6.3 (magic 0x184D2204, FLG/
BD descriptor with xxHash32 header checksum, LE32 block sizes with the
high bit marking uncompressed blocks, end mark, optional content
checksum). xxHash32 is implemented from its public spec and verified
against the reference vectors.

The compressor is a greedy hash matcher honoring the block-format end
constraints (last 5 bytes literal, no match within the final 12 bytes);
output is decode-compatible with any conforming reader rather than
byte-identical to a specific encoder.
"""

from __future__ import annotations

_MAGIC = 0x184D2204
_P1, _P2, _P3, _P4, _P5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393
_M32 = 0xFFFFFFFF


class Lz4Error(ValueError):
    pass


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (public spec; vectors: '' -> 0x02CC5D05)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[pos + 4 * i: pos + 4 * i + 4], "little")
                v = (v + lane * _P2) & _M32
                v = (_rotl(v, 13) * _P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        h = (h + int.from_bytes(data[pos: pos + 4], "little") * _P3) & _M32
        h = (_rotl(h, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P5) & _M32
        h = (_rotl(h, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# -- block format ------------------------------------------------------------


def block_compress(src: bytes) -> bytes:
    src = bytes(src)
    n = len(src)
    out = bytearray()

    def emit(lit: bytes, match_len: int = 0, offset: int = 0) -> None:
        ll, ml = len(lit), match_len - 4 if match_len else 0
        token = (min(ll, 15) << 4) | (min(ml, 15) if match_len else 0)
        out.append(token)
        if ll >= 15:
            rest = ll - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(lit)
        if match_len:
            out.extend(offset.to_bytes(2, "little"))
            if ml >= 15:
                rest = ml - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    if n == 0:
        return b""
    # matches may not start in the final 12 bytes; final 5 bytes literal
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    limit = n - 12
    while pos <= limit and pos + 4 <= n:
        key = src[pos: pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF and src[cand: cand + 4] == key:
            length = 4
            # a match must end >= 5 bytes before the block end
            max_len = n - 5 - pos
            while length < max_len and src[cand + length] == src[pos + length]:
                length += 1
            if length >= 4:
                emit(src[lit_start:pos], length, pos - cand)
                pos += length
                lit_start = pos
                continue
        pos += 1
    emit(src[lit_start:])  # trailing literals (token with ml=0)
    return bytes(out)


def block_decompress(src: bytes, max_size: int = 1 << 30) -> bytes:
    out = bytearray()
    pos, n = 0, len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        ll = token >> 4
        if ll == 15:
            while True:
                b = src[pos]
                pos += 1
                ll += b
                if b != 255:
                    break
        out += src[pos: pos + ll]
        pos += ll
        if pos >= n:
            break  # last sequence: literals only
        offset = int.from_bytes(src[pos: pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error("invalid match offset")
        ml = token & 0xF
        if ml == 15:
            while True:
                b = src[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(out) - offset
        for i in range(ml):
            out.append(out[start + i])
        if len(out) > max_size:
            raise Lz4Error("output exceeds max size")
    return bytes(out)


# -- frame format ------------------------------------------------------------

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress(data: bytes, block_max: int = 1 << 22) -> bytes:
    data = bytes(data)
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    flg = (1 << 6) | (1 << 5) | (1 << 2)  # v01, block-independent, content checksum
    bd_id = next(k for k, v in sorted(_BD_SIZES.items()) if v >= min(block_max, 1 << 22))
    bd = bd_id << 4
    out.append(flg)
    out.append(bd)
    out.append((xxh32(bytes([flg, bd])) >> 8) & 0xFF)
    size = _BD_SIZES[bd_id]
    for off in range(0, len(data), size) or ([0] if not data else []):
        chunk = data[off: off + size]
        comp = block_compress(chunk)
        if comp and len(comp) < len(chunk):
            out += len(comp).to_bytes(4, "little")
            out += comp
        else:
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            out += chunk
    out += (0).to_bytes(4, "little")  # end mark
    out += xxh32(data).to_bytes(4, "little")
    return bytes(out)


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    if int.from_bytes(data[:4], "little") != _MAGIC:
        raise Lz4Error("not an LZ4 frame (bad magic)")
    pos = 4
    flg = data[pos]
    bd = data[pos + 1]
    pos += 2
    if (flg >> 6) != 1:
        raise Lz4Error("unsupported LZ4 frame version")
    content_checksum = bool(flg & (1 << 2))
    block_checksum = bool(flg & (1 << 4))
    content_size = bool(flg & (1 << 3))
    hc = data[pos]
    pos += 1
    header = bytes([flg, bd]) + (data[6:14] if content_size else b"")
    if content_size:
        pos += 8
    if ((xxh32(data[4:pos - 1]) >> 8) & 0xFF) != hc:
        raise Lz4Error("LZ4 frame header checksum mismatch")
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise Lz4Error("truncated LZ4 frame")
        bsz = int.from_bytes(data[pos: pos + 4], "little")
        pos += 4
        if bsz == 0:
            break
        uncompressed = bool(bsz & 0x80000000)
        bsz &= 0x7FFFFFFF
        blk = data[pos: pos + bsz]
        pos += bsz
        if block_checksum:
            bc = int.from_bytes(data[pos: pos + 4], "little")
            pos += 4
            if xxh32(blk) != bc:
                raise Lz4Error("LZ4 block checksum mismatch")
        out += blk if uncompressed else block_decompress(blk)
    if content_checksum:
        cc = int.from_bytes(data[pos: pos + 4], "little")
        if xxh32(bytes(out)) != cc:
            raise Lz4Error("LZ4 content checksum mismatch")
    return bytes(out)
