"""Couchbase KV wire protocol — the memcached BINARY protocol (the
published 24-byte-header framing Couchbase's data service speaks) plus
the Couchbase extensions the connectors need: SASL PLAIN
authentication (opcode 0x21 with the published list 0x20 first) and
SELECT_BUCKET (0x89). From scratch off the public binary-protocol
specification (the memcached project's protocol_binary.h layout,
reproduced in Couchbase's kv_engine docs):

  header: magic u8 (0x80 request / 0x81 response), opcode u8,
  key_length u16, extras_length u8, data_type u8,
  vbucket/status u16, total_body u32, opaque u32, cas u64 —
  all big-endian; body = extras + key + value.

Opcodes used: GET 0x00 (response extras = 4-byte flags), SET 0x01,
ADD 0x02, REPLACE 0x03, DELETE 0x04 (SET/ADD/REPLACE request extras =
flags u32 + expiry u32), SASL_LIST 0x20, SASL_AUTH 0x21,
SELECT_BUCKET 0x89. Status codes: 0x0000 success, 0x0001 KEY_ENOENT,
0x0002 KEY_EEXISTS, 0x0020 AUTH_ERROR.

The reference's couchbase connectors (internal/impl/couchbase/
processor.go, cache.go) use gocb; the same KV verbs are written here
by hand, and :class:`MiniCouchbaseServer` enforces the auth +
select-bucket sequence before serving data ops."""

from __future__ import annotations

import socket
import struct
import threading
from typing import Optional

MAGIC_REQ, MAGIC_RES = 0x80, 0x81

OP_GET, OP_SET, OP_ADD, OP_REPLACE, OP_DELETE = 0x00, 0x01, 0x02, 0x03, 0x04
OP_SASL_LIST, OP_SASL_AUTH, OP_SELECT_BUCKET = 0x20, 0x21, 0x89

ST_OK, ST_KEY_ENOENT, ST_KEY_EEXISTS, ST_AUTH_ERROR = 0x0000, 0x0001, 0x0002, 0x0020
ST_NOT_SUPPORTED = 0x0083

HEADER = struct.Struct(">BBHBBHIIQ")


class CouchbaseError(RuntimeError):
    def __init__(self, status: int, msg: str = ""):
        super().__init__(f"status 0x{status:04x} {msg}")
        self.status = status


def pack_request(opcode: int, key: bytes = b"", value: bytes = b"",
                 extras: bytes = b"", opaque: int = 0, cas: int = 0,
                 vbucket: int = 0) -> bytes:
    body = extras + key + value
    return HEADER.pack(MAGIC_REQ, opcode, len(key), len(extras), 0,
                       vbucket, len(body), opaque, cas) + body


def pack_response(opcode: int, status: int = ST_OK, key: bytes = b"",
                  value: bytes = b"", extras: bytes = b"", opaque: int = 0,
                  cas: int = 0) -> bytes:
    body = extras + key + value
    return HEADER.pack(MAGIC_RES, opcode, len(key), len(extras), 0,
                       status, len(body), opaque, cas) + body


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def read_packet(sock: socket.socket) -> dict:
    hdr = _read_exact(sock, 24)
    magic, opcode, klen, elen, dtype, status, blen, opaque, cas = HEADER.unpack(hdr)
    body = _read_exact(sock, blen) if blen else b""
    return {"magic": magic, "opcode": opcode, "status": status,
            "extras": body[:elen], "key": body[elen:elen + klen],
            "value": body[elen + klen:], "opaque": opaque, "cas": cas}


class CouchbaseClient:
    """One authenticated, bucket-selected KV connection."""

    def __init__(self, url: str, username: str = "", password: str = "",
                 bucket: str = "default", timeout_s: float = 30.0):
        a = url
        for scheme in ("couchbase://", "tcp://"):
            if a.startswith(scheme):
                a = a[len(scheme):]
        host, _, port = a.rpartition(":")
        self.sock = socket.create_connection((host or "127.0.0.1", int(port)),
                                             timeout=timeout_s)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._lock = threading.Lock()
        if username:
            mechs = self._round(OP_SASL_LIST)["value"]
            if b"PLAIN" not in mechs:
                raise CouchbaseError(ST_NOT_SUPPORTED, f"mechs {mechs!r}")
            auth = b"\x00" + username.encode() + b"\x00" + password.encode()
            res = self._round(OP_SASL_AUTH, key=b"PLAIN", value=auth)
            if res["status"] != ST_OK:
                raise CouchbaseError(res["status"], "auth failed")
        res = self._round(OP_SELECT_BUCKET, key=bucket.encode())
        if res["status"] != ST_OK:
            raise CouchbaseError(res["status"], f"select bucket {bucket}")

    def _round(self, opcode: int, **kw) -> dict:
        with self._lock:
            self.sock.sendall(pack_request(opcode, **kw))
            return read_packet(self.sock)

    def get(self, key: str) -> Optional[bytes]:
        res = self._round(OP_GET, key=key.encode())
        if res["status"] == ST_KEY_ENOENT:
            return None
        if res["status"] != ST_OK:
            raise CouchbaseError(res["status"])
        return res["value"]

    def _store(self, opcode: int, key: str, value: bytes,
               expiry_s: int = 0) -> None:
        extras = struct.pack(">II", 0, expiry_s)  # flags, expiry
        res = self._round(opcode, key=key.encode(), value=value, extras=extras)
        if res["status"] != ST_OK:
            raise CouchbaseError(res["status"])

    def set(self, key: str, value: bytes, expiry_s: int = 0) -> None:
        self._store(OP_SET, key, value, expiry_s)

    def add(self, key: str, value: bytes, expiry_s: int = 0) -> bool:
        """ADD: store only if absent (KEY_EEXISTS otherwise) — the
        published atomic add, the cache dedupe primitive."""
        try:
            self._store(OP_ADD, key, value, expiry_s)
            return True
        except CouchbaseError as e:
            if e.status == ST_KEY_EEXISTS:
                return False
            raise

    def replace(self, key: str, value: bytes, expiry_s: int = 0) -> None:
        self._store(OP_REPLACE, key, value, expiry_s)

    def delete(self, key: str) -> None:
        res = self._round(OP_DELETE, key=key.encode())
        if res["status"] not in (ST_OK, ST_KEY_ENOENT):
            raise CouchbaseError(res["status"])

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class MiniCouchbaseServer:
    """Loopback KV node: SASL PLAIN then SELECT_BUCKET gate the data
    ops; buckets hold (value, cas) pairs."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 username: str = "user", password: str = "pass",
                 buckets: tuple[str, ...] = ("default",)):
        self.host, self.port = host, port
        self.username, self.password = username, password
        self.buckets: dict[str, dict[bytes, tuple[bytes, int]]] = {
            b: {} for b in buckets}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._cas = 0

    def start(self) -> "MiniCouchbaseServer":
        self._srv = socket.create_server((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    @property
    def url(self) -> str:
        return f"couchbase://{self.host}:{self.port}"

    def stop(self) -> None:
        self._stop.set()
        self._srv.close()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._conn_loop, args=(sock,),
                             daemon=True).start()

    def _conn_loop(self, sock: socket.socket) -> None:
        authed = not self.username
        bucket: Optional[dict] = None
        try:
            while not self._stop.is_set():
                req = read_packet(sock)
                op, key, value = req["opcode"], req["key"], req["value"]
                if op == OP_SASL_LIST:
                    sock.sendall(pack_response(op, value=b"PLAIN",
                                               opaque=req["opaque"]))
                elif op == OP_SASL_AUTH:
                    parts = value.split(b"\x00")
                    ok = (key == b"PLAIN" and len(parts) == 3
                          and parts[1].decode() == self.username
                          and parts[2].decode() == self.password)
                    authed = authed or ok
                    sock.sendall(pack_response(
                        op, ST_OK if ok else ST_AUTH_ERROR,
                        value=b"Authenticated" if ok else b"Auth failure",
                        opaque=req["opaque"]))
                elif op == OP_SELECT_BUCKET:
                    name = key.decode()
                    if not authed:
                        sock.sendall(pack_response(op, ST_AUTH_ERROR,
                                                   opaque=req["opaque"]))
                    elif name in self.buckets:
                        bucket = self.buckets[name]
                        sock.sendall(pack_response(op, opaque=req["opaque"]))
                    else:
                        sock.sendall(pack_response(op, ST_KEY_ENOENT,
                                                   opaque=req["opaque"]))
                elif bucket is None or not authed:
                    sock.sendall(pack_response(op, ST_AUTH_ERROR,
                                               opaque=req["opaque"]))
                elif op == OP_GET:
                    with self._lock:
                        hit = bucket.get(key)
                    if hit is None:
                        sock.sendall(pack_response(op, ST_KEY_ENOENT,
                                                   value=b"Not found",
                                                   opaque=req["opaque"]))
                    else:
                        sock.sendall(pack_response(
                            op, value=hit[0], extras=struct.pack(">I", 0),
                            opaque=req["opaque"], cas=hit[1]))
                elif op in (OP_SET, OP_ADD, OP_REPLACE):
                    with self._lock:
                        exists = key in bucket
                        if op == OP_ADD and exists:
                            status = ST_KEY_EEXISTS
                        elif op == OP_REPLACE and not exists:
                            status = ST_KEY_ENOENT
                        else:
                            self._cas += 1
                            bucket[key] = (value, self._cas)
                            status = ST_OK
                    sock.sendall(pack_response(
                        op, status, opaque=req["opaque"],
                        cas=bucket[key][1] if status == ST_OK else 0))
                elif op == OP_DELETE:
                    with self._lock:
                        status = ST_OK if bucket.pop(key, None) is not None \
                            else ST_KEY_ENOENT
                    sock.sendall(pack_response(op, status,
                                               opaque=req["opaque"]))
                else:
                    sock.sendall(pack_response(op, ST_NOT_SUPPORTED,
                                               opaque=req["opaque"]))
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                sock.close()
            except OSError:
                pass
