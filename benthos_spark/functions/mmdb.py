"""From-scratch MaxMind DB (.mmdb) reader + minimal writer.

Backs the ``geoip_*`` Bloblang methods
(/root/reference/internal/impl/maxmind/bloblang_geoip.go:56-89) without
the geoip2 package. The MMDB file format is public (MaxMind DB spec
2.0): a binary search tree over IP bits, a 16-null-byte separator, a
typed data section, and a metadata map after the
``\\xAB\\xCD\\xEFMaxMind.com`` marker.

The reader implements the full type system (pointers, utf8, double,
bytes, u16/u32/u64/u128, int32, map, array, bool, float) and both
record sizes in use (24/28/32 bits). The writer emits just enough of
the format to build test fixtures (record_size 32, no data
deduplication) — round-tripping through it proves the reader against
files we didn't write by hand, and the reader is additionally pinned by
byte-layout unit tests. Lookups return the RAW record map (the data the
geoip2 wrapper structs are themselves decoded from)."""

from __future__ import annotations

import ipaddress
import struct
from functools import lru_cache

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"


class MmdbError(ValueError):
    pass


# ---------------------------------------------------------------------------
# data-section decoding
# ---------------------------------------------------------------------------


class _Decoder:
    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # absolute offset of the data section

    def decode(self, offset: int):
        """Decode the value at data-section-relative `offset`;
        returns (value, next_offset)."""
        buf = self.buf
        pos = self.base + offset
        ctrl = buf[pos]
        pos += 1
        dtype = ctrl >> 5
        size = ctrl & 0x1F
        if dtype == 1:  # pointer
            ss = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if ss == 0:
                ptr = (v << 8) | buf[pos]
                pos += 1
            elif ss == 1:
                ptr = ((v << 16) | (buf[pos] << 8) | buf[pos + 1]) + 2048
                pos += 2
            elif ss == 2:
                ptr = ((v << 24) | int.from_bytes(buf[pos: pos + 3], "big")) + 526336
                pos += 3
            else:
                ptr = int.from_bytes(buf[pos: pos + 4], "big")
                pos += 4
            val, _ = self.decode(ptr)
            return val, pos - self.base
        if dtype == 0:  # extended
            dtype = 7 + buf[pos]
            pos += 1
        if size == 29:
            size = 29 + buf[pos]
            pos += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[pos: pos + 2], "big")
            pos += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[pos: pos + 3], "big")
            pos += 3

        if dtype == 2:  # utf8
            return buf[pos: pos + size].decode("utf-8"), pos + size - self.base
        if dtype == 3:  # double
            return struct.unpack(">d", buf[pos: pos + 8])[0], pos + 8 - self.base
        if dtype == 4:  # bytes
            return bytes(buf[pos: pos + size]), pos + size - self.base
        if dtype in (5, 6, 9, 10):  # u16/u32/u64/u128
            return int.from_bytes(buf[pos: pos + size], "big"), pos + size - self.base
        if dtype == 8:  # int32
            return int.from_bytes(buf[pos: pos + size], "big", signed=True), pos + size - self.base
        if dtype == 7:  # map
            out = {}
            off = pos - self.base
            for _ in range(size):
                k, off = self.decode(off)
                v, off = self.decode(off)
                out[k] = v
            return out, off
        if dtype == 11:  # array
            out = []
            off = pos - self.base
            for _ in range(size):
                v, off = self.decode(off)
                out.append(v)
            return out, off
        if dtype == 14:  # boolean (size IS the value)
            return bool(size), pos - self.base
        if dtype == 15:  # float
            return struct.unpack(">f", buf[pos: pos + 4])[0], pos + 4 - self.base
        raise MmdbError(f"unsupported mmdb type {dtype}")


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class Reader:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        midx = self.buf.rfind(_METADATA_MARKER)
        if midx < 0:
            raise MmdbError("not an mmdb file (metadata marker missing)")
        meta_dec = _Decoder(self.buf, midx + len(_METADATA_MARKER))
        self.metadata, _ = meta_dec.decode(0)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        self.ip_version = int(self.metadata.get("ip_version", 6))
        self.tree_size = (2 * self.record_size // 8) * self.node_count
        self.data = _Decoder(self.buf, self.tree_size + 16)

    def _record(self, node: int, bit: int) -> int:
        rs = self.record_size
        base = node * (2 * rs // 8)
        if rs == 24:
            off = base + 3 * bit
            return int.from_bytes(self.buf[off: off + 3], "big")
        if rs == 28:
            if bit == 0:
                return ((self.buf[base + 3] >> 4) << 24) | int.from_bytes(
                    self.buf[base: base + 3], "big"
                )
            return ((self.buf[base + 3] & 0xF) << 24) | int.from_bytes(
                self.buf[base + 4: base + 7], "big"
            )
        if rs == 32:
            off = base + 4 * bit
            return int.from_bytes(self.buf[off: off + 4], "big")
        raise MmdbError(f"unsupported record size {self.record_size}")

    def lookup(self, ip: str):
        """The record for `ip`, or None when the DB has no entry."""
        addr = ipaddress.ip_address(ip)
        if addr.version == 4 and self.ip_version == 6:
            bits, nbits = int(addr), 128  # v4-in-v6: 96 leading zero bits
        elif addr.version == 6 and self.ip_version == 4:
            raise MmdbError("IPv6 address in an IPv4-only database")
        else:
            bits, nbits = int(addr), 32 if addr.version == 4 else 128
        node = 0
        for i in range(nbits - 1, -1, -1):
            node = self._record(node, (bits >> i) & 1)
            if node == self.node_count:
                return None
            if node > self.node_count:
                rec, _ = self.data.decode(node - self.node_count - 16)
                return rec
        raise MmdbError("walked off the search tree")


@lru_cache(maxsize=16)
def open_db(path: str) -> Reader:
    return Reader(path)


# ---------------------------------------------------------------------------
# minimal writer (test fixtures)
# ---------------------------------------------------------------------------


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        # booleans store the value IN the size bits (payload-free)
        return _enc_ext(14, 1 if v else 0, b"")
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _enc(2, len(b)) + b
    if isinstance(v, float):
        return _enc(3, 8) + struct.pack(">d", v)
    if isinstance(v, bytes):
        return _enc(4, len(v)) + v
    if isinstance(v, int):
        if v < 0:
            return _enc_ext(8, 4, v.to_bytes(4, "big", signed=True))
        if v < 1 << 16:
            b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
            return _enc(5, len(b)) + b
        if v < 1 << 32:
            b = v.to_bytes((v.bit_length() + 7) // 8, "big")
            return _enc(6, len(b)) + b
        b = v.to_bytes((v.bit_length() + 7) // 8, "big")
        return _enc_ext(9, len(b), b)
    if isinstance(v, dict):
        out = bytearray(_enc(7, len(v)))
        for k, val in v.items():
            out += _encode_value(str(k))
            out += _encode_value(val)
        return bytes(out)
    if isinstance(v, list):
        out = bytearray(_enc_ext(11, len(v), b""))
        for item in v:
            out += _encode_value(item)
        return bytes(out)
    raise MmdbError(f"cannot encode {type(v).__name__}")


def _enc(dtype: int, size: int) -> bytes:
    if size < 29:
        return bytes([(dtype << 5) | size])
    if size < 285:
        return bytes([(dtype << 5) | 29, size - 29])
    return bytes([(dtype << 5) | 30]) + (size - 285).to_bytes(2, "big")


def _enc_ext(ext_type: int, size: int, payload: bytes) -> bytes:
    head = _enc(0, size)
    return bytes([head[0], ext_type - 7]) + head[1:] + payload


def build_mmdb(
    networks: list[tuple[str, dict]],
    path: str,
    database_type: str = "Test-City",
    ip_version: int = 6,
) -> None:
    """Write a minimal valid mmdb: `networks` = [(cidr, record)]."""
    # 1. data section: records appended in order, offsets remembered
    data = bytearray(b"\x00" * 16)  # the separator belongs to the layout
    offsets = []
    for _, rec in networks:
        offsets.append(len(data) - 16)
        data += _encode_value(rec)

    # 2. binary trie over the network bits
    nodes: list[list] = [[None, None]]  # None = empty; int = child; ('d', i) = data

    def insert(cidr: str, data_i: int) -> None:
        net = ipaddress.ip_network(cidr, strict=True)
        bits = int(net.network_address)
        plen = net.prefixlen
        total = 32 if net.version == 4 else 128
        if net.version == 4 and ip_version == 6:
            plen += 96
            total = 128
        node = 0
        for i in range(plen):
            bit = (bits >> (total - 1 - i)) & 1
            if i == plen - 1:
                nodes[node][bit] = ("d", data_i)
                return
            nxt = nodes[node][bit]
            if not isinstance(nxt, int):
                nodes.append([None, None])
                nxt = len(nodes) - 1
                nodes[node][bit] = nxt
            node = nxt

    for i, (cidr, _) in enumerate(networks):
        insert(cidr, i)

    node_count = len(nodes)
    tree = bytearray()
    for left, right in nodes:
        for rec in (left, right):
            if rec is None:
                val = node_count
            elif isinstance(rec, int):
                val = rec
            else:
                val = node_count + 16 + offsets[rec[1]]
            tree += val.to_bytes(4, "big")  # record_size 32

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": 0,
        "database_type": database_type,
        "description": {"en": "benthos_spark test fixture"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": 32,
    }
    with open(path, "wb") as f:
        f.write(bytes(tree))
        f.write(bytes(data))  # starts with the 16-byte separator
        f.write(_METADATA_MARKER)
        f.write(_encode_value(meta))
