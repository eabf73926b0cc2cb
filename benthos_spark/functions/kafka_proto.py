"""Kafka wire protocol — primitives, record batches (v2), and the five
request/response pairs the connector family needs, all from scratch off
the public protocol spec (https://kafka.apache.org/protocol) and the
record-batch layout in the Kafka documentation.

The reference's kafka connectors (internal/impl/kafka/input_kafka_franz.go,
output_kafka_franz.go and the sarama variants) speak this protocol via
franz-go/sarama. Here the encoding lives in this module so that
benthos_spark.operators.kafka can talk to ANY Kafka-compatible broker
from executors, and tests run against the loopback
:class:`MiniKafkaBroker`.

Deliberately NON-flexible API versions are used (Metadata v1, Produce
v3, Fetch v4, ListOffsets v1, ApiVersions v0) — fixed-width encodings,
no tagged fields — which every Kafka broker since 0.11/2.x accepts and
which keep the codec small and auditable. Record batches are the
current magic-2 format (required by v3 produce): varint-packed records,
CRC32C over the post-CRC region.

CRC32C (Castagnoli) is implemented table-driven (slicing-by-8). Note
the CRC covers attributes..records — NOT base_offset/batch_length/
leader_epoch — so a broker may rewrite the base offset of a produced
batch without re-checksumming (exactly what MiniKafkaBroker does, and
what real brokers rely on too).
"""

from __future__ import annotations

import struct
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Iterable, Optional

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected poly 0x82F63B78) — slicing-by-8
# ---------------------------------------------------------------------------

_CRC32C_POLY = 0x82F63B78


def _make_tables() -> list[list[int]]:
    t0 = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ (_CRC32C_POLY if c & 1 else 0)
        t0.append(c)
    tables = [t0]
    for k in range(1, 8):
        prev = tables[k - 1]
        tables.append([(prev[n] >> 8) ^ t0[prev[n] & 0xFF] for n in range(256)])
    return tables


_T = _make_tables()


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC32C checksum (RFC 3720 §B.4 test vector pinned in tests)."""
    crc = ~crc & 0xFFFFFFFF
    n = len(data)
    i = 0
    t0, t1, t2, t3, t4, t5, t6, t7 = _T
    # slicing-by-8 over the aligned body
    end8 = n - (n % 8)
    while i < end8:
        w = crc ^ int.from_bytes(data[i:i + 4], "little")
        b4, b5, b6, b7 = data[i + 4], data[i + 5], data[i + 6], data[i + 7]
        crc = (t7[w & 0xFF] ^ t6[(w >> 8) & 0xFF] ^ t5[(w >> 16) & 0xFF]
               ^ t4[(w >> 24) & 0xFF] ^ t3[b4] ^ t2[b5] ^ t1[b6] ^ t0[b7])
        i += 8
    while i < n:
        crc = (crc >> 8) ^ t0[(crc ^ data[i]) & 0xFF]
        i += 1
    return ~crc & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


class Writer:
    def __init__(self):
        self._parts: list[bytes] = []

    def raw(self, b: bytes) -> "Writer":
        self._parts.append(b)
        return self

    def i8(self, v: int):
        return self.raw(struct.pack(">b", v))

    def i16(self, v: int):
        return self.raw(struct.pack(">h", v))

    def i32(self, v: int):
        return self.raw(struct.pack(">i", v))

    def u32(self, v: int):
        return self.raw(struct.pack(">I", v))

    def i64(self, v: int):
        return self.raw(struct.pack(">q", v))

    def bool_(self, v: bool):
        return self.raw(b"\x01" if v else b"\x00")

    def varint(self, v: int):
        return self.uvarint((v << 1) ^ (v >> 63))  # zigzag64

    def uvarint(self, v: int):
        v &= (1 << 64) - 1
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        return self.raw(bytes(out))

    def string(self, s: Optional[str]):
        if s is None:
            return self.i16(-1)
        b = s.encode()
        return self.i16(len(b)).raw(b)

    def bytes_(self, b: Optional[bytes]):
        if b is None:
            return self.i32(-1)
        return self.i32(len(b)).raw(b)

    def array(self, items: Iterable, enc) -> "Writer":
        items = list(items)
        self.i32(len(items))
        for it in items:
            enc(self, it)
        return self

    def done(self) -> bytes:
        return b"".join(self._parts)


class Reader:
    def __init__(self, data: bytes):
        self._d = data
        self._i = 0

    def remaining(self) -> int:
        return len(self._d) - self._i

    def raw(self, n: int) -> bytes:
        out = self._d[self._i:self._i + n]
        if len(out) < n:
            raise EOFError("short kafka frame")
        self._i += n
        return out

    def i8(self) -> int:
        return struct.unpack(">b", self.raw(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.raw(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.raw(4))[0]

    def u32(self) -> int:
        return struct.unpack(">I", self.raw(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.raw(8))[0]

    def bool_(self) -> bool:
        return self.raw(1) != b"\x00"

    def uvarint(self) -> int:
        shift, out = 0, 0
        while True:
            b = self._d[self._i]
            self._i += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def varint(self) -> int:
        u = self.uvarint()
        return (u >> 1) ^ -(u & 1)  # un-zigzag

    def string(self) -> Optional[str]:
        n = self.i16()
        return None if n < 0 else self.raw(n).decode()

    def bytes_(self) -> Optional[bytes]:
        n = self.i32()
        return None if n < 0 else self.raw(n)

    def array(self, dec) -> list:
        n = self.i32()
        return [dec(self) for _ in range(max(0, n))]


# ---------------------------------------------------------------------------
# Record batches (magic 2)
# ---------------------------------------------------------------------------


@dataclass
class Record:
    key: Optional[bytes]
    value: Optional[bytes]
    headers: list[tuple[str, bytes]] = field(default_factory=list)
    timestamp_ms: int = 0
    offset: int = 0  # absolute, filled on decode / assigned by broker


def encode_record_batch(records: list[Record], base_offset: int = 0) -> bytes:
    """One magic-2 record batch. Timestamps: base = min present, delta
    per record; attributes 0 (no compression — payloads in this engine
    are already codec-compressed media bytes)."""
    if not records:
        raise ValueError("empty record batch")
    base_ts = min(r.timestamp_ms for r in records)
    max_ts = max(r.timestamp_ms for r in records)
    body = Writer()
    for i, r in enumerate(records):
        rec = Writer()
        rec.i8(0)  # attributes
        rec.varint(r.timestamp_ms - base_ts)
        rec.varint(i)  # offsetDelta
        if r.key is None:
            rec.varint(-1)
        else:
            rec.varint(len(r.key)).raw(r.key)
        if r.value is None:
            rec.varint(-1)
        else:
            rec.varint(len(r.value)).raw(r.value)
        rec.varint(len(r.headers))
        for hk, hv in r.headers:
            kb = hk.encode()
            rec.varint(len(kb)).raw(kb)
            if hv is None:
                rec.varint(-1)
            else:
                rec.varint(len(hv)).raw(hv)
        rb = rec.done()
        body.varint(len(rb)).raw(rb)
    records_bytes = body.done()

    after_crc = (Writer()
                 .i16(0)                      # attributes
                 .i32(len(records) - 1)       # lastOffsetDelta
                 .i64(base_ts).i64(max_ts)
                 .i64(-1).i16(-1).i32(-1)     # producer id/epoch/base seq
                 .i32(len(records))
                 .raw(records_bytes)).done()
    crc = crc32c(after_crc)
    inner = (Writer()
             .i32(0)                          # partitionLeaderEpoch
             .i8(2)                           # magic
             .u32(crc)
             .raw(after_crc)).done()
    return (Writer()
            .i64(base_offset)
            .i32(len(inner))
            .raw(inner)).done()


def decode_record_batches(data: bytes, verify_crc: bool = True) -> list[Record]:
    """Decode a concatenation of magic-2 batches into flat records with
    absolute offsets. Tolerates a trailing partial batch (brokers may
    truncate at max_bytes — the protocol contract)."""
    out: list[Record] = []
    i = 0
    while i + 12 <= len(data):
        base_offset = struct.unpack(">q", data[i:i + 8])[0]
        batch_len = struct.unpack(">i", data[i + 8:i + 12])[0]
        if i + 12 + batch_len > len(data):
            break  # trailing partial batch
        r = Reader(data[i + 12:i + 12 + batch_len])
        r.i32()  # leader epoch
        magic = r.i8()
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic}")
        crc = r.u32()
        after = data[i + 12 + 9:i + 12 + batch_len]
        if verify_crc and crc32c(after) != crc:
            raise ValueError("record batch CRC mismatch")
        attributes = r.i16()
        if attributes & 0x07:
            raise ValueError("compressed record batches not supported (codec attr set)")
        r.i32()  # lastOffsetDelta
        base_ts = r.i64()
        r.i64()  # maxTimestamp
        r.i64()  # producerId
        r.i16()  # producerEpoch
        r.i32()  # baseSequence
        n = r.i32()
        for _ in range(n):
            ln = r.varint()
            rr = Reader(r.raw(ln))
            rr.i8()  # attributes
            ts_delta = rr.varint()
            off_delta = rr.varint()
            klen = rr.varint()
            key = None if klen < 0 else rr.raw(klen)
            vlen = rr.varint()
            value = None if vlen < 0 else rr.raw(vlen)
            hn = rr.varint()
            headers = []
            for _ in range(hn):
                hkl = rr.varint()
                hk = rr.raw(hkl).decode()
                hvl = rr.varint()
                hv = None if hvl < 0 else rr.raw(hvl)
                headers.append((hk, hv))
            out.append(Record(key=key, value=value, headers=headers,
                              timestamp_ms=base_ts + ts_delta,
                              offset=base_offset + off_delta))
        i += 12 + batch_len
    return out


def rewrite_base_offset(batch: bytes, base_offset: int) -> bytes:
    """Replace a batch's base offset in place — CRC-safe (the CRC region
    starts after the offset/length/epoch/magic/crc prefix)."""
    return struct.pack(">q", base_offset) + batch[8:]


# ---------------------------------------------------------------------------
# Request / response codecs
# ---------------------------------------------------------------------------

API_PRODUCE, API_FETCH, API_LIST_OFFSETS, API_METADATA, API_VERSIONS = 0, 1, 2, 3, 18

#: api_key -> (min_version, max_version) this codec speaks
SUPPORTED = {API_PRODUCE: (3, 3), API_FETCH: (4, 4), API_LIST_OFFSETS: (1, 1),
             API_METADATA: (1, 1), API_VERSIONS: (0, 0)}


def encode_request(api_key: int, api_version: int, correlation_id: int,
                   client_id: Optional[str], body: bytes) -> bytes:
    hdr = (Writer().i16(api_key).i16(api_version).i32(correlation_id)
           .string(client_id)).done()
    frame = hdr + body
    return struct.pack(">i", len(frame)) + frame


# --- Metadata v1 ---

def encode_metadata_request(topics: Optional[list[str]]) -> bytes:
    w = Writer()
    if topics is None:
        w.i32(-1)
    else:
        w.array(topics, lambda wr, t: wr.string(t))
    return w.done()


def decode_metadata_request(r: Reader) -> Optional[list[str]]:
    n = r.i32()
    if n < 0:
        return None
    return [r.string() for _ in range(n)]


def encode_metadata_response(broker: tuple[int, str, int],
                             topics: dict[str, int]) -> bytes:
    """Single-broker cluster shape: every partition led by `broker`.
    topics: name -> partition_count."""
    node_id, host, port = broker
    w = Writer()
    w.array([broker], lambda wr, b: (wr.i32(node_id), wr.string(host),
                                     wr.i32(port), wr.string(None)))
    w.i32(node_id)  # controller id

    def enc_topic(wr: Writer, item):
        name, n_parts = item
        wr.i16(0).string(name).bool_(False)
        wr.array(range(n_parts), lambda w2, p: (
            w2.i16(0), w2.i32(p), w2.i32(node_id),
            w2.array([node_id], lambda w3, rid: w3.i32(rid)),
            w2.array([node_id], lambda w3, rid: w3.i32(rid)),
        ))

    w.array(sorted(topics.items()), enc_topic)
    return w.done()


def decode_metadata_response(r: Reader) -> dict:
    brokers = r.array(lambda rr: (rr.i32(), rr.string(), rr.i32(), rr.string()))
    controller = r.i32()

    def dec_topic(rr: Reader):
        err = rr.i16()
        name = rr.string()
        rr.bool_()
        parts = rr.array(lambda r3: (r3.i16(), r3.i32(), r3.i32(),
                                     r3.array(lambda r4: r4.i32()),
                                     r3.array(lambda r4: r4.i32())))
        return {"error": err, "name": name,
                "partitions": [{"error": p[0], "partition": p[1], "leader": p[2]}
                               for p in parts]}

    topics = r.array(dec_topic)
    return {"brokers": [{"node_id": b[0], "host": b[1], "port": b[2]} for b in brokers],
            "controller": controller, "topics": topics}


# --- Produce v3 ---

def encode_produce_request(topic_parts: dict[str, dict[int, bytes]],
                           acks: int = -1, timeout_ms: int = 30000) -> bytes:
    w = Writer().string(None).i16(acks).i32(timeout_ms)

    def enc_topic(wr: Writer, item):
        name, parts = item
        wr.string(name)
        wr.array(sorted(parts.items()),
                 lambda w2, pv: (w2.i32(pv[0]), w2.bytes_(pv[1])))

    w.array(sorted(topic_parts.items()), enc_topic)
    return w.done()


def decode_produce_request(r: Reader) -> tuple[int, dict[str, dict[int, bytes]]]:
    r.string()  # transactional id
    acks = r.i16()
    r.i32()  # timeout
    out: dict[str, dict[int, bytes]] = {}
    for _ in range(r.i32()):
        name = r.string()
        parts = {}
        for _ in range(r.i32()):
            pid = r.i32()
            parts[pid] = r.bytes_()
        out[name] = parts
    return acks, out


def encode_produce_response(results: dict[str, dict[int, tuple[int, int]]]) -> bytes:
    """results: topic -> partition -> (error_code, base_offset)."""
    w = Writer()

    def enc_topic(wr: Writer, item):
        name, parts = item
        wr.string(name)
        wr.array(sorted(parts.items()), lambda w2, pv: (
            w2.i32(pv[0]), w2.i16(pv[1][0]), w2.i64(pv[1][1]), w2.i64(-1)))

    w.array(sorted(results.items()), enc_topic)
    w.i32(0)  # throttle
    return w.done()


def decode_produce_response(r: Reader) -> dict[str, dict[int, tuple[int, int]]]:
    out: dict[str, dict[int, tuple[int, int]]] = {}
    for _ in range(r.i32()):
        name = r.string()
        parts = {}
        for _ in range(r.i32()):
            pid, err, base_off = r.i32(), r.i16(), r.i64()
            r.i64()  # log append time
            parts[pid] = (err, base_off)
        out[name] = parts
    r.i32()  # throttle
    return out


# --- Fetch v4 ---

def encode_fetch_request(topic_parts: dict[str, dict[int, int]],
                         max_wait_ms: int = 500, min_bytes: int = 1,
                         max_bytes: int = 64 << 20,
                         part_max_bytes: int = 16 << 20) -> bytes:
    w = (Writer().i32(-1).i32(max_wait_ms).i32(min_bytes)
         .i32(max_bytes).i8(0))  # isolation: read uncommitted

    def enc_topic(wr: Writer, item):
        name, parts = item
        wr.string(name)
        wr.array(sorted(parts.items()), lambda w2, pv: (
            w2.i32(pv[0]), w2.i64(pv[1]), w2.i32(part_max_bytes)))

    w.array(sorted(topic_parts.items()), enc_topic)
    return w.done()


def decode_fetch_request(r: Reader) -> tuple[int, int, dict[str, dict[int, int]]]:
    r.i32()  # replica id
    max_wait = r.i32()
    min_bytes = r.i32()
    r.i32()  # max bytes
    r.i8()   # isolation
    out: dict[str, dict[int, int]] = {}
    for _ in range(r.i32()):
        name = r.string()
        parts = {}
        for _ in range(r.i32()):
            pid = r.i32()
            off = r.i64()
            r.i32()  # partition max bytes
            parts[pid] = off
        out[name] = parts
    return max_wait, min_bytes, out


def encode_fetch_response(results: dict[str, dict[int, tuple[int, int, bytes]]]) -> bytes:
    """results: topic -> partition -> (error, high_watermark, records)."""
    w = Writer().i32(0)  # throttle

    def enc_topic(wr: Writer, item):
        name, parts = item
        wr.string(name)
        wr.array(sorted(parts.items()), lambda w2, pv: (
            w2.i32(pv[0]), w2.i16(pv[1][0]), w2.i64(pv[1][1]),
            w2.i64(pv[1][1]),                       # last stable offset
            w2.array([], lambda *_: None),          # aborted txns
            w2.bytes_(pv[1][2])))

    w.array(sorted(results.items()), enc_topic)
    return w.done()


def decode_fetch_response(r: Reader) -> dict[str, dict[int, dict]]:
    r.i32()  # throttle
    out: dict[str, dict[int, dict]] = {}
    for _ in range(r.i32()):
        name = r.string()
        parts = {}
        for _ in range(r.i32()):
            pid, err, hw = r.i32(), r.i16(), r.i64()
            r.i64()  # last stable
            r.array(lambda rr: (rr.i64(), rr.i64()))  # aborted
            records = r.bytes_() or b""
            parts[pid] = {"error": err, "high_watermark": hw, "records": records}
        out[name] = parts
    return out


# --- ListOffsets v1 ---

def encode_list_offsets_request(topic_parts: dict[str, dict[int, int]]) -> bytes:
    """timestamp -1 = latest, -2 = earliest."""
    w = Writer().i32(-1)

    def enc_topic(wr: Writer, item):
        name, parts = item
        wr.string(name)
        wr.array(sorted(parts.items()),
                 lambda w2, pv: (w2.i32(pv[0]), w2.i64(pv[1])))

    w.array(sorted(topic_parts.items()), enc_topic)
    return w.done()


def decode_list_offsets_request(r: Reader) -> dict[str, dict[int, int]]:
    r.i32()
    out: dict[str, dict[int, int]] = {}
    for _ in range(r.i32()):
        name = r.string()
        parts = {}
        for _ in range(r.i32()):
            pid = r.i32()
            ts = r.i64()
            parts[pid] = ts
        out[name] = parts
    return out


def encode_list_offsets_response(results: dict[str, dict[int, tuple[int, int]]]) -> bytes:
    """results: topic -> partition -> (error, offset)."""
    w = Writer()

    def enc_topic(wr: Writer, item):
        name, parts = item
        wr.string(name)
        wr.array(sorted(parts.items()), lambda w2, pv: (
            w2.i32(pv[0]), w2.i16(pv[1][0]), w2.i64(-1), w2.i64(pv[1][1])))

    w.array(sorted(results.items()), enc_topic)
    return w.done()


def decode_list_offsets_response(r: Reader) -> dict[str, dict[int, tuple[int, int]]]:
    out: dict[str, dict[int, tuple[int, int]]] = {}
    for _ in range(r.i32()):
        name = r.string()
        parts = {}
        for _ in range(r.i32()):
            pid, err = r.i32(), r.i16()
            r.i64()  # timestamp
            off = r.i64()
            parts[pid] = (err, off)
        out[name] = parts
    return out


# --- ApiVersions v0 ---

def encode_api_versions_response() -> bytes:
    w = Writer().i16(0)
    w.array(sorted(SUPPORTED.items()),
            lambda wr, kv: (wr.i16(kv[0]), wr.i16(kv[1][0]), wr.i16(kv[1][1])))
    return w.done()


def decode_api_versions_response(r: Reader) -> dict[int, tuple[int, int]]:
    err = r.i16()
    if err:
        raise ValueError(f"ApiVersions error {err}")
    rows = r.array(lambda rr: (rr.i16(), rr.i16(), rr.i16()))
    return {k: (lo, hi) for k, lo, hi in rows}


# ---------------------------------------------------------------------------
# Mini broker
# ---------------------------------------------------------------------------

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC = 3


class MiniKafkaBroker:
    """In-process single-node Kafka-protocol broker (loopback TCP).

    Topics auto-create on first produce/metadata with ``num_partitions``
    (like a broker with auto.create.topics.enable). Each partition is a
    list of raw record-batch segments [(base_offset, next_offset,
    bytes)] — produced batches are stored verbatim with the base offset
    rewritten (CRC-safe, see module docstring), and fetch serves whole
    segments from the first one containing the requested offset, exactly
    like a real log serves aligned batches.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 num_partitions: int = 2):
        self._host, self._port = host, port
        self.num_partitions = num_partitions
        self._lock = threading.Condition()
        # topic -> partition -> list[(base, next, raw)]
        self._log: dict[str, dict[int, list[tuple[int, int, bytes]]]] = {}
        self._server = None
        self.address = ""

    # -- lifecycle ----------------------------------------------------
    def start(self) -> "MiniKafkaBroker":
        import socketserver

        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    outer._serve(self.request)
                except (ConnectionError, OSError, EOFError):
                    pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((self._host, self._port), Handler)
        self.address = "%s:%d" % self._server.server_address[:2]
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def _ensure_topic(self, name: str) -> dict[int, list]:
        t = self._log.get(name)
        if t is None:
            t = self._log[name] = {p: [] for p in range(self.num_partitions)}
        return t

    def _next_offset(self, topic: str, part: int) -> int:
        segs = self._ensure_topic(topic).get(part)
        return segs[-1][1] if segs else 0

    # -- request loop ---------------------------------------------------
    def _serve(self, sock) -> None:
        import socket as _socket

        def read_exact(n: int) -> bytes:
            buf = b""
            while len(buf) < n:
                chunk = sock.recv(n - len(buf))
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            return buf

        while True:
            size = struct.unpack(">i", read_exact(4))[0]
            frame = read_exact(size)
            r = Reader(frame)
            api_key, api_version, corr = r.i16(), r.i16(), r.i32()
            r.string()  # client id
            body = self._handle(api_key, api_version, r)
            resp = struct.pack(">i", 4 + len(body)) + struct.pack(">i", corr) + body
            sock.sendall(resp)

    def _handle(self, api_key: int, api_version: int, r: Reader) -> bytes:
        lo_hi = SUPPORTED.get(api_key)
        if lo_hi is None or not (lo_hi[0] <= api_version <= lo_hi[1]):
            # version mismatch: error body shapes differ per api; the
            # codec only sends supported versions, so this is defensive
            return Writer().i16(35).done()  # UNSUPPORTED_VERSION
        if api_key == API_VERSIONS:
            return encode_api_versions_response()
        if api_key == API_METADATA:
            topics = decode_metadata_request(r)
            with self._lock:
                if topics:
                    for t in topics:
                        self._ensure_topic(t)
                    shape = {t: len(self._log[t]) for t in topics}
                else:
                    shape = {t: len(ps) for t, ps in self._log.items()}
            host, port = self.address.rsplit(":", 1)
            return encode_metadata_response((0, host, int(port)), shape)
        if api_key == API_PRODUCE:
            _, topic_parts = decode_produce_request(r)
            results: dict[str, dict[int, tuple[int, int]]] = {}
            with self._lock:
                for topic, parts in topic_parts.items():
                    self._ensure_topic(topic)
                    results[topic] = {}
                    for pid, raw in parts.items():
                        if pid not in self._log[topic]:
                            results[topic][pid] = (ERR_UNKNOWN_TOPIC, -1)
                            continue
                        n_records = len(decode_record_batches(raw))
                        base = self._next_offset(topic, pid)
                        self._log[topic][pid].append(
                            (base, base + n_records, rewrite_base_offset(raw, base)))
                        results[topic][pid] = (ERR_NONE, base)
                self._lock.notify_all()
            return encode_produce_response(results)
        if api_key == API_FETCH:
            max_wait, min_bytes, topic_parts = decode_fetch_request(r)
            deadline = time.time() + max_wait / 1000.0

            def collect():
                results: dict[str, dict[int, tuple[int, int, bytes]]] = {}
                total = 0
                for topic, parts in topic_parts.items():
                    results[topic] = {}
                    for pid, off in parts.items():
                        segs = self._log.get(topic, {}).get(pid)
                        if segs is None:
                            results[topic][pid] = (ERR_UNKNOWN_TOPIC, -1, b"")
                            continue
                        hw = segs[-1][1] if segs else 0
                        if off > hw:
                            results[topic][pid] = (ERR_OFFSET_OUT_OF_RANGE, hw, b"")
                            continue
                        chunks = [raw for base, nxt, raw in segs if nxt > off]
                        data = b"".join(chunks)
                        total += len(data)
                        results[topic][pid] = (ERR_NONE, hw, data)
                return results, total

            with self._lock:
                while True:
                    results, total = collect()
                    if total >= min_bytes or time.time() >= deadline:
                        return encode_fetch_response(results)
                    self._lock.wait(min(0.1, max(0.0, deadline - time.time())))
        if api_key == API_LIST_OFFSETS:
            topic_parts = decode_list_offsets_request(r)
            results: dict[str, dict[int, tuple[int, int]]] = {}
            with self._lock:
                for topic, parts in topic_parts.items():
                    results[topic] = {}
                    for pid, ts in parts.items():
                        segs = self._log.get(topic, {}).get(pid)
                        if segs is None:
                            results[topic][pid] = (ERR_UNKNOWN_TOPIC, -1)
                        elif ts == -2:  # earliest
                            results[topic][pid] = (ERR_NONE, segs[0][0] if segs else 0)
                        else:  # latest
                            results[topic][pid] = (ERR_NONE, segs[-1][1] if segs else 0)
            return encode_list_offsets_response(results)
        raise AssertionError("unreachable")
