"""Pure-python Snappy BLOCK format (the `snappy.Encode` the reference's
compress method uses, bloblang_encoding.go:191).

The format is public (google/snappy format_description.txt): a varint
uncompressed length followed by tagged elements —

- tag & 3 == 0: literal; length-1 in tag>>2 (60..63 mean 1..4 extra
  little-endian length bytes);
- tag & 3 == 1: copy, 1-byte offset: length = ((tag>>2)&7)+4,
  offset = ((tag>>5)<<8) | next byte;
- tag & 3 == 2: copy, 2-byte LE offset: length = (tag>>2)+1;
- tag & 3 == 3: copy, 4-byte LE offset (rare; emitted by no encoder we
  produce, accepted on decode).

The compressor is a greedy 4-byte-hash matcher (the reference
implementation's strategy); output need not be byte-identical to any
other encoder — only decode-compatible, which the roundtrip +
hand-crafted-stream tests pin down.
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_uvarint(b: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(b):
            raise SnappyError("truncated varint")
        byte = b[pos]
        pos += 1
        n |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise SnappyError("varint too long")


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += lit


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # long matches split into <=64-byte copies (2-byte-offset form)
    while length >= 68:
        out.append((59 << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= 60
    if length > 64:
        out.append((29 << 2) | 2)  # 30-byte copy leaves >=4
        out += offset.to_bytes(2, "little")
        length -= 30
    if 4 <= length <= 11 and offset < 2048:
        out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 1)
        out.append(offset & 0xFF)
    else:
        out.append(((length - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")


def compress(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray(_uvarint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    if n < 4:
        _emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    while pos + 4 <= n:
        key = data[pos: pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF and data[cand: cand + 4] == key:
            # extend the match
            length = 4
            while pos + length < n and data[cand + length] == data[pos + length]:
                length += 1
            if lit_start < pos:
                _emit_literal(out, data[lit_start:pos])
            _emit_copy(out, pos - cand, length)
            pos += length
            lit_start = pos
        else:
            pos += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


def decompress(b: bytes) -> bytes:
    b = bytes(b)
    total, pos = _read_uvarint(b, 0)
    out = bytearray()
    while pos < len(b):
        tag = b[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:
            n = tag >> 2
            if n >= 60:
                extra = n - 59
                n = int.from_bytes(b[pos: pos + extra], "little")
                pos += extra
            n += 1
            out += b[pos: pos + n]
            if pos + n > len(b):
                raise SnappyError("truncated literal")
            pos += n
            continue
        if kind == 1:
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | b[pos]
            pos += 1
        elif kind == 2:
            length = (tag >> 2) + 1
            offset = int.from_bytes(b[pos: pos + 2], "little")
            pos += 2
        else:
            length = (tag >> 2) + 1
            offset = int.from_bytes(b[pos: pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyError("invalid copy offset")
        # overlapping copies are byte-at-a-time by definition
        start = len(out) - offset
        for i in range(length):
            out.append(out[start + i])
    if len(out) != total:
        raise SnappyError(f"length mismatch: header {total}, decoded {len(out)}")
    return bytes(out)
