"""From-scratch CQL binary protocol v4 (the public
`native_protocol_v4.spec` shipped with Apache Cassandra) — enough of the
frame codec for the `cassandra` input/output
(internal/impl/cassandra/input.go:17, output.go:44): STARTUP/READY,
QUERY with positional values, and RESULT (Void / Rows with full
row-metadata + typed value decode). No external driver — the reference
embeds gocql; here the same frames are written by hand.

Client-side type mapping for positional values (the gocql marshalling
subset the reference's `args_mapping` produces from Bloblang values):
``int`` → bigint (8 bytes BE), ``float`` → double, ``bool`` → boolean,
``str`` → varchar (utf8), ``bytes`` → blob, ``None`` → null (-1 length).
The mini server declares its tables' column types up front (as a real
node's schema does) and decodes values with the same table.
"""

from __future__ import annotations

import io
import socket
import socketserver
import struct
import threading
from typing import Any, Optional

# opcodes (spec §2.4)
OP_ERROR = 0x00
OP_STARTUP = 0x01
OP_READY = 0x02
OP_QUERY = 0x07
OP_RESULT = 0x08

# result kinds (§4.2.5)
RESULT_VOID = 0x0001
RESULT_ROWS = 0x0002

# type option ids (§4.2.5.2)
TYPE_ASCII = 0x0001
TYPE_BIGINT = 0x0002
TYPE_BLOB = 0x0003
TYPE_BOOLEAN = 0x0004
TYPE_DOUBLE = 0x0007
TYPE_FLOAT = 0x0008
TYPE_INT = 0x0009
TYPE_TIMESTAMP = 0x000B
TYPE_VARCHAR = 0x000D

_TYPE_BY_NAME = {
    "ascii": TYPE_ASCII, "bigint": TYPE_BIGINT, "blob": TYPE_BLOB,
    "boolean": TYPE_BOOLEAN, "double": TYPE_DOUBLE, "float": TYPE_FLOAT,
    "int": TYPE_INT, "timestamp": TYPE_TIMESTAMP, "varchar": TYPE_VARCHAR,
    "text": TYPE_VARCHAR,
}

CONSISTENCY_QUORUM = 0x0004


class CqlError(RuntimeError):
    pass


# -- primitive notations (§3) -------------------------------------------------

def _w_string(b: io.BytesIO, s: str) -> None:
    data = s.encode()
    b.write(struct.pack(">H", len(data)))
    b.write(data)


def _w_long_string(b: io.BytesIO, s: str) -> None:
    data = s.encode()
    b.write(struct.pack(">i", len(data)))
    b.write(data)


def _w_bytes(b: io.BytesIO, v: Optional[bytes]) -> None:
    if v is None:
        b.write(struct.pack(">i", -1))
    else:
        b.write(struct.pack(">i", len(v)))
        b.write(v)


def _r_string(b: io.BytesIO) -> str:
    (n,) = struct.unpack(">H", b.read(2))
    return b.read(n).decode()


def _r_long_string(b: io.BytesIO) -> str:
    (n,) = struct.unpack(">i", b.read(4))
    return b.read(n).decode()


def _r_bytes(b: io.BytesIO) -> Optional[bytes]:
    (n,) = struct.unpack(">i", b.read(4))
    return None if n < 0 else b.read(n)


# -- value (de)serialization ---------------------------------------------------

def serialize_value(v: Any) -> tuple[Optional[bytes], int]:
    """Python value -> (wire bytes, inferred type id)."""
    if v is None:
        return None, TYPE_VARCHAR
    if isinstance(v, bool):
        return (b"\x01" if v else b"\x00"), TYPE_BOOLEAN
    if isinstance(v, int):
        return struct.pack(">q", v), TYPE_BIGINT
    if isinstance(v, float):
        return struct.pack(">d", v), TYPE_DOUBLE
    if isinstance(v, bytes):
        return v, TYPE_BLOB
    return str(v).encode(), TYPE_VARCHAR


def deserialize_value(data: Optional[bytes], type_id: int) -> Any:
    if data is None:
        return None
    if type_id == TYPE_BOOLEAN:
        return data != b"\x00"
    if type_id in (TYPE_BIGINT, TYPE_TIMESTAMP):
        return struct.unpack(">q", data)[0]
    if type_id == TYPE_INT:
        return struct.unpack(">i", data)[0]
    if type_id == TYPE_DOUBLE:
        return struct.unpack(">d", data)[0]
    if type_id == TYPE_FLOAT:
        return struct.unpack(">f", data)[0]
    if type_id == TYPE_BLOB:
        return data
    return data.decode()


# -- frames (§2) ----------------------------------------------------------------

def encode_frame(opcode: int, body: bytes, stream: int = 0, *,
                 response: bool = False) -> bytes:
    version = 0x84 if response else 0x04
    return struct.pack(">BBhBi", version, 0, stream, opcode, len(body)) + body


def read_frame(rfile) -> tuple[int, int, bytes]:
    """-> (stream, opcode, body); raises EOFError on clean close."""
    header = rfile.read(9)
    if len(header) < 9:
        raise EOFError
    _ver, _flags, stream, opcode, length = struct.unpack(">BBhBi", header)
    body = rfile.read(length) if length else b""
    if len(body) < length:
        raise EOFError
    return stream, opcode, body


def encode_startup() -> bytes:
    b = io.BytesIO()
    b.write(struct.pack(">H", 1))
    _w_string(b, "CQL_VERSION")
    _w_string(b, "3.0.0")
    return encode_frame(OP_STARTUP, b.getvalue())


def encode_query(query: str, values: Optional[list] = None,
                 consistency: int = CONSISTENCY_QUORUM, stream: int = 0) -> bytes:
    b = io.BytesIO()
    _w_long_string(b, query)
    b.write(struct.pack(">H", consistency))
    if values:
        b.write(struct.pack(">B", 0x01))  # flags: VALUES
        b.write(struct.pack(">H", len(values)))
        for v in values:
            _w_bytes(b, serialize_value(v)[0])
    else:
        b.write(struct.pack(">B", 0x00))
    return encode_frame(OP_QUERY, b.getvalue(), stream=stream)


def encode_result_void(stream: int) -> bytes:
    return encode_frame(OP_RESULT, struct.pack(">i", RESULT_VOID),
                        stream=stream, response=True)


def encode_result_rows(stream: int, keyspace: str, table: str,
                       columns: list[tuple[str, int]],
                       rows: list[list[Optional[bytes]]]) -> bytes:
    b = io.BytesIO()
    b.write(struct.pack(">i", RESULT_ROWS))
    b.write(struct.pack(">i", 0x0001))  # metadata flags: global table spec
    b.write(struct.pack(">i", len(columns)))
    _w_string(b, keyspace)
    _w_string(b, table)
    for name, type_id in columns:
        _w_string(b, name)
        b.write(struct.pack(">H", type_id))
    b.write(struct.pack(">i", len(rows)))
    for row in rows:
        for cell in row:
            _w_bytes(b, cell)
    return encode_frame(OP_RESULT, b.getvalue(), stream=stream, response=True)


def encode_error(stream: int, code: int, message: str) -> bytes:
    b = io.BytesIO()
    b.write(struct.pack(">i", code))
    _w_string(b, message)
    return encode_frame(OP_ERROR, b.getvalue(), stream=stream, response=True)


def parse_query_body(body: bytes) -> tuple[str, list[Optional[bytes]]]:
    b = io.BytesIO(body)
    query = _r_long_string(b)
    b.read(2)  # consistency
    (flags,) = struct.unpack(">B", b.read(1))
    values: list[Optional[bytes]] = []
    if flags & 0x01:
        (n,) = struct.unpack(">H", b.read(2))
        values = [_r_bytes(b) for _ in range(n)]
    return query, values


def parse_result_body(body: bytes):
    """-> ('void', None) | ('rows', (col_names, col_types, rows_py))."""
    b = io.BytesIO(body)
    (kind,) = struct.unpack(">i", b.read(4))
    if kind == RESULT_VOID:
        return "void", None
    if kind != RESULT_ROWS:
        return "other", kind
    (flags,) = struct.unpack(">i", b.read(4))
    (ncols,) = struct.unpack(">i", b.read(4))
    if flags & 0x0001:
        _r_string(b)  # keyspace
        _r_string(b)  # table
    names, types = [], []
    for _ in range(ncols):
        if not flags & 0x0001:
            _r_string(b)
            _r_string(b)
        names.append(_r_string(b))
        (tid,) = struct.unpack(">H", b.read(2))
        types.append(tid)
    (nrows,) = struct.unpack(">i", b.read(4))
    rows = []
    for _ in range(nrows):
        rows.append([deserialize_value(_r_bytes(b), t) for t in types])
    return "rows", (names, types, rows)


# -- client ---------------------------------------------------------------------

class CqlConnection:
    """One CQL v4 connection: STARTUP handshake then synchronous
    QUERY/RESULT round-trips (stream ids single-flight, like the
    reference's per-goroutine gocql conn use)."""

    def __init__(self, address: str, timeout_s: float = 10.0):
        host, _, port = address.rpartition(":")
        self._sock = socket.create_connection((host or "127.0.0.1", int(port)),
                                              timeout=timeout_s)
        self._rfile = self._sock.makefile("rb")
        self._lock = threading.Lock()
        self._stream = 0
        self._sock.sendall(encode_startup())
        _, opcode, body = read_frame(self._rfile)
        if opcode != OP_READY:
            raise CqlError(f"expected READY, got opcode {opcode}")

    def execute(self, query: str, values: Optional[list] = None):
        """-> list[dict] for rows results, [] for void."""
        with self._lock:
            self._stream = (self._stream + 1) % 32768
            self._sock.sendall(encode_query(query, values, stream=self._stream))
            _, opcode, body = read_frame(self._rfile)
        if opcode == OP_ERROR:
            b = io.BytesIO(body)
            (code,) = struct.unpack(">i", b.read(4))
            raise CqlError(f"server error 0x{code:04x}: {_r_string(b)}")
        if opcode != OP_RESULT:
            raise CqlError(f"unexpected opcode {opcode}")
        kind, payload = parse_result_body(body)
        if kind != "rows":
            return []
        names, _types, rows = payload
        return [dict(zip(names, r)) for r in rows]

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


# -- mini server -----------------------------------------------------------------

class MiniCassandraServer:
    """In-process CQL v4 node for tests: tables declared as
    {"ks.table": {"col": "bigint", ...}} (column order = declaration
    order, the schema a real node would hold). Supports
    `INSERT INTO ks.t (a, b) VALUES (?, ?)` with positional values and
    `SELECT * FROM ks.t` / `SELECT a, b FROM ks.t` (full scans —
    the reference input's shape)."""

    def __init__(self, tables: dict[str, dict[str, str]],
                 host: str = "127.0.0.1", port: int = 0):
        self.tables = {
            name: {col: _TYPE_BY_NAME[t] for col, t in cols.items()}
            for name, cols in tables.items()
        }
        self.rows: dict[str, list[dict]] = {name: [] for name in tables}
        lock = threading.Lock()
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                try:
                    while True:
                        stream, opcode, body = read_frame(self.rfile)
                        if opcode == OP_STARTUP:
                            self.wfile.write(encode_frame(OP_READY, b"", stream=stream,
                                                          response=True))
                        elif opcode == OP_QUERY:
                            self.wfile.write(outer._handle_query(stream, body, lock))
                        else:
                            self.wfile.write(encode_error(stream, 0x000A,
                                                          f"unsupported opcode {opcode}"))
                except EOFError:
                    return
                except OSError:
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = f"{self._server.server_address[0]}:{self._server.server_address[1]}"
        threading.Thread(target=self._server.serve_forever, daemon=True).start()

    # very small CQL statement surface — just what the connector emits
    def _handle_query(self, stream: int, body: bytes, lock) -> bytes:
        import re

        query, values = parse_query_body(body)
        q = query.strip().rstrip(";")
        m = re.match(r"(?is)^INSERT\s+INTO\s+([\w.]+)\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)$", q)
        if m:
            table, cols_s, _vals = m.group(1), m.group(2), m.group(3)
            if table not in self.tables:
                return encode_error(stream, 0x2200, f"unconfigured table {table}")
            cols = [c.strip() for c in cols_s.split(",")]
            schema = self.tables[table]
            row = {}
            for col, raw in zip(cols, values):
                if col not in schema:
                    return encode_error(stream, 0x2200, f"unknown column {col}")
                row[col] = _deserialize_lenient(raw, schema[col])
            with lock:
                self.rows[table].append(row)
            return encode_result_void(stream)
        m = re.match(r"(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s*$", q)
        if m:
            sel, table = m.group(1).strip(), m.group(2)
            if table not in self.tables:
                return encode_error(stream, 0x2200, f"unconfigured table {table}")
            schema = self.tables[table]
            cols = list(schema) if sel == "*" else [c.strip() for c in sel.split(",")]
            ks, _, tname = table.rpartition(".")
            with lock:
                data = list(self.rows[table])
            wire_rows = [
                [_serialize_typed(r.get(c), schema[c]) for c in cols]
                for r in data
            ]
            return encode_result_rows(stream, ks or "ks", tname,
                                      [(c, schema[c]) for c in cols], wire_rows)
        return encode_error(stream, 0x2000, f"unsupported statement: {q[:80]}")

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def _deserialize_lenient(data: Optional[bytes], type_id: int) -> Any:
    """INSERT-side decode: an unprepared client infers widths (int →
    8-byte bigint), so integer columns accept either width — the same
    widening a real node performs for unprepared positional values."""
    if data is None:
        return None
    if type_id in (TYPE_BIGINT, TYPE_TIMESTAMP, TYPE_INT):
        return int.from_bytes(data, "big", signed=True)
    if type_id in (TYPE_DOUBLE, TYPE_FLOAT):
        return struct.unpack(">d" if len(data) == 8 else ">f", data)[0]
    return deserialize_value(data, type_id)


# typed serialization for the server's response path (values stored as
# python objects re-serialize under the SCHEMA type — serialize_value's
# inference would widen an `int` column to bigint)
def _serialize_typed(v: Any, type_id: int) -> Optional[bytes]:
    if v is None:
        return None
    if type_id == TYPE_BOOLEAN:
        return b"\x01" if v else b"\x00"
    if type_id in (TYPE_BIGINT, TYPE_TIMESTAMP):
        return struct.pack(">q", int(v))
    if type_id == TYPE_INT:
        return struct.pack(">i", int(v))
    if type_id == TYPE_DOUBLE:
        return struct.pack(">d", float(v))
    if type_id == TYPE_FLOAT:
        return struct.pack(">f", float(v))
    if type_id == TYPE_BLOB:
        return v if isinstance(v, bytes) else str(v).encode()
    return str(v).encode()
