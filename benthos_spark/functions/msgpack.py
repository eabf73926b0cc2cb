"""MessagePack encode/decode — `parse_msgpack`/`format_msgpack`
(/root/reference/internal/impl/msgpack/bloblang.go:31,66) and the
`msgpack` processor (internal/impl/msgpack/processor.go:25).

No msgpack library ships in this sandbox, so this is a small, complete
pure-Python codec for the core type system (nil, bool, int, float64,
str, bin, array, map) — the subset Bloblang's object model produces.
The Spark surface is an Arrow-batched pandas UDF pair; per-row cost is
the Python loop inside one Arrow batch (same budget class as the audio
codecs — binary payload work is the sanctioned Python surface).
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# codec (msgpack spec: https://github.com/msgpack/msgpack/blob/master/spec.md)
# ---------------------------------------------------------------------------


def packb(obj: Any) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(o: Any, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(0x100 + o)
        elif 0 <= o <= 0xFF:
            out += bytes([0xCC, o])
        elif 0 <= o <= 0xFFFF:
            out += b"\xcd" + struct.pack(">H", o)
        elif 0 <= o <= 0xFFFFFFFF:
            out += b"\xce" + struct.pack(">I", o)
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + struct.pack(">Q", o)
        elif -0x80 <= o < 0:
            out += b"\xd0" + struct.pack(">b", o)
        elif -0x8000 <= o < 0:
            out += b"\xd1" + struct.pack(">h", o)
        elif -0x80000000 <= o < 0:
            out += b"\xd2" + struct.pack(">i", o)
        else:
            out += b"\xd3" + struct.pack(">q", o)
    elif isinstance(o, float):
        out += b"\xcb" + struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out += b"\xda" + struct.pack(">H", n)
        else:
            out += b"\xdb" + struct.pack(">I", n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out += bytes([0xC4, n])
        elif n <= 0xFFFF:
            out += b"\xc5" + struct.pack(">H", n)
        else:
            out += b"\xc6" + struct.pack(">I", n)
        out += bytes(o)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for v in o:
            _pack(v, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + struct.pack(">H", n)
        else:
            out += b"\xdf" + struct.pack(">I", n)
        for k, v in o.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"msgpack: unsupported type {type(o).__name__}")


def unpackb(b: bytes) -> Any:
    v, pos = _unpack(b, 0)
    if pos != len(b):
        raise ValueError(f"msgpack: {len(b) - pos} trailing bytes")
    return v


def _unpack(b: bytes, pos: int) -> tuple[Any, int]:
    t = b[pos]
    pos += 1
    if t <= 0x7F:
        return t, pos
    if t >= 0xE0:
        return t - 0x100, pos
    if 0x80 <= t <= 0x8F:
        return _unpack_map(b, pos, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _unpack_array(b, pos, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        return b[pos : pos + n].decode("utf-8"), pos + n
    if t == 0xC0:
        return None, pos
    if t == 0xC2:
        return False, pos
    if t == 0xC3:
        return True, pos
    if t in (0xC4, 0xC5, 0xC6):
        w = {0xC4: 1, 0xC5: 2, 0xC6: 4}[t]
        n = int.from_bytes(b[pos : pos + w], "big")
        pos += w
        return bytes(b[pos : pos + n]), pos + n
    if t == 0xCA:
        return struct.unpack(">f", b[pos : pos + 4])[0], pos + 4
    if t == 0xCB:
        return struct.unpack(">d", b[pos : pos + 8])[0], pos + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):
        w = 1 << (t - 0xCC)
        return int.from_bytes(b[pos : pos + w], "big"), pos + w
    if t in (0xD0, 0xD1, 0xD2, 0xD3):
        w = 1 << (t - 0xD0)
        return int.from_bytes(b[pos : pos + w], "big", signed=True), pos + w
    if t in (0xD9, 0xDA, 0xDB):
        w = {0xD9: 1, 0xDA: 2, 0xDB: 4}[t]
        n = int.from_bytes(b[pos : pos + w], "big")
        pos += w
        return b[pos : pos + n].decode("utf-8"), pos + n
    if t in (0xDC, 0xDD):
        w = 2 if t == 0xDC else 4
        n = int.from_bytes(b[pos : pos + w], "big")
        return _unpack_array(b, pos + w, n)
    if t in (0xDE, 0xDF):
        w = 2 if t == 0xDE else 4
        n = int.from_bytes(b[pos : pos + w], "big")
        return _unpack_map(b, pos + w, n)
    raise ValueError(f"msgpack: unsupported type byte 0x{t:02x}")


def _unpack_array(b: bytes, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, pos = _unpack(b, pos)
        out.append(v)
    return out, pos


def _unpack_map(b: bytes, pos: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _unpack(b, pos)
        v, pos = _unpack(b, pos)
        out[k] = v
    return out, pos


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def format_msgpack_from_json(col) -> Column:
    """JSON string column → msgpack binary (`format_msgpack`,
    msgpack/bloblang.go:66)."""
    import json

    @F.pandas_udf("binary")
    def fn(s: pd.Series) -> pd.Series:
        return s.map(lambda j: packb(json.loads(j)) if j is not None else None)

    return fn(col if isinstance(col, Column) else F.col(col))


def parse_msgpack_to_json(col) -> Column:
    """msgpack binary column → JSON string (`parse_msgpack`,
    msgpack/bloblang.go:31) — pair with ``from_json`` for a typed shape."""
    import json

    @F.pandas_udf("string")
    def fn(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: json.dumps(unpackb(bytes(b)), separators=(",", ":")) if b is not None else None
        )

    return fn(col if isinstance(col, Column) else F.col(col))
