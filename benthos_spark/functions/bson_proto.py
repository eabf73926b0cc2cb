"""BSON codec + MongoDB OP_MSG wire protocol + in-process mini server,
from scratch off the public specs (bsonspec.org for BSON; the MongoDB
wire protocol documentation for OP_MSG, opcode 2013). The reference's
mongodb connectors (internal/impl/mongodb/{input,output,processor,
cache}.go) use mongo-go-driver; here the driver layer is this module,
so the connectors speak to a real mongod while tests run against
:class:`MiniMongoServer`.

BSON subset (the JSON-object model the engine moves around): double,
string, document, array, binary, ObjectId (decoded to hex), bool,
datetime (ms int), null, int32, int64. Encoding picks int32/int64 by
range and double for floats — the same choice mongo drivers make.

OP_MSG: header ``int32 messageLength | int32 requestID |
int32 responseTo | int32 opCode(2013)`` then ``uint32 flagBits`` and a
kind-0 section (one BSON command document). Commands implemented by the
mini server: hello/ping, insert, find (equality + $gt/$gte/$lt/$lte/$in
filters, limit/sort), update ($set, upsert), delete, count, drop.
"""

from __future__ import annotations

import itertools
import socket
import socketserver
import struct
import threading
from typing import Any, Optional

# ---------------------------------------------------------------------------
# BSON
# ---------------------------------------------------------------------------


def _enc_element(name: str, v: Any) -> bytes:
    nb = name.encode() + b"\x00"
    if v is None:
        return b"\x0a" + nb
    if isinstance(v, bool):
        return b"\x08" + nb + (b"\x01" if v else b"\x00")
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + nb + struct.pack("<i", v)
        return b"\x12" + nb + struct.pack("<q", v)
    if isinstance(v, float):
        return b"\x01" + nb + struct.pack("<d", v)
    if isinstance(v, str):
        sb = v.encode() + b"\x00"
        return b"\x02" + nb + struct.pack("<i", len(sb)) + sb
    if isinstance(v, (bytes, bytearray)):
        return b"\x05" + nb + struct.pack("<i", len(v)) + b"\x00" + bytes(v)
    if isinstance(v, dict):
        return b"\x03" + nb + encode_bson(v)
    if isinstance(v, (list, tuple)):
        doc = {str(i): x for i, x in enumerate(v)}
        return b"\x04" + nb + encode_bson(doc)
    raise TypeError(f"cannot BSON-encode {type(v).__name__}")


def encode_bson(doc: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def decode_bson(data: bytes, offset: int = 0) -> tuple[dict, int]:
    """(document, bytes consumed)."""
    total = struct.unpack("<i", data[offset:offset + 4])[0]
    end = offset + total - 1  # excluding trailing NUL
    i = offset + 4
    out: dict[str, Any] = {}
    while i < end:
        t = data[i]
        i += 1
        z = data.index(b"\x00", i)
        name = data[i:z].decode()
        i = z + 1
        if t == 0x01:
            out[name] = struct.unpack("<d", data[i:i + 8])[0]
            i += 8
        elif t == 0x02:
            n = struct.unpack("<i", data[i:i + 4])[0]
            out[name] = data[i + 4:i + 4 + n - 1].decode()
            i += 4 + n
        elif t in (0x03, 0x04):
            sub, used = decode_bson(data, i)
            out[name] = list(sub.values()) if t == 0x04 else sub
            i += used
        elif t == 0x05:
            n = struct.unpack("<i", data[i:i + 4])[0]
            out[name] = data[i + 5:i + 5 + n]
            i += 5 + n
        elif t == 0x07:
            out[name] = data[i:i + 12].hex()
            i += 12
        elif t == 0x08:
            out[name] = bool(data[i])
            i += 1
        elif t == 0x09:
            out[name] = struct.unpack("<q", data[i:i + 8])[0]
            i += 8
        elif t == 0x0A:
            out[name] = None
        elif t == 0x10:
            out[name] = struct.unpack("<i", data[i:i + 4])[0]
            i += 4
        elif t == 0x12:
            out[name] = struct.unpack("<q", data[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"unsupported BSON element type 0x{t:02x}")
    return out, total


# ---------------------------------------------------------------------------
# OP_MSG
# ---------------------------------------------------------------------------

OP_MSG = 2013


def encode_op_msg(request_id: int, command: dict, response_to: int = 0) -> bytes:
    body = struct.pack("<I", 0) + b"\x00" + encode_bson(command)
    return struct.pack("<iiii", 16 + len(body), request_id, response_to, OP_MSG) + body


def decode_op_msg(frame: bytes) -> tuple[int, dict]:
    """(request_id, command document) from a full message frame."""
    _length, request_id, _resp_to, opcode = struct.unpack("<iiii", frame[:16])
    if opcode != OP_MSG:
        raise ValueError(f"unsupported opcode {opcode} (only OP_MSG)")
    # flagBits (4) + section kind byte (1)
    kind = frame[20]
    if kind != 0:
        raise ValueError(f"unsupported OP_MSG section kind {kind}")
    doc, _ = decode_bson(frame, 21)
    return request_id, doc


class MongoClient:
    """Minimal synchronous driver over OP_MSG."""

    def __init__(self, url: str, db: str = "test"):
        u = url
        for scheme in ("mongodb://", "tcp://"):
            if u.startswith(scheme):
                u = u[len(scheme):]
        u = u.split("/", 1)[0]
        host, port = u.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self._buf = b""
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        self.db = db

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("mongo connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def command(self, cmd: dict) -> dict:
        cmd = {**cmd, "$db": self.db}
        with self._lock:
            rid = next(self._ids)
            self._sock.sendall(encode_op_msg(rid, cmd))
            length = struct.unpack("<i", self._read_exact(4))[0]
            frame = self._read_exact(length - 4)
        _rid, doc = decode_op_msg(struct.pack("<i", length) + frame)
        if not doc.get("ok"):
            raise IOError(f"mongo command failed: {doc!r}")
        return doc

    def insert_many(self, coll: str, docs: list[dict]) -> int:
        return self.command({"insert": coll, "documents": docs})["n"]

    def find(self, coll: str, filter: Optional[dict] = None,
             sort: Optional[dict] = None, limit: int = 0) -> list[dict]:
        cmd: dict = {"find": coll, "filter": filter or {}}
        if sort:
            cmd["sort"] = sort
        if limit:
            cmd["limit"] = limit
        return self.command(cmd)["cursor"]["firstBatch"]

    def update_many(self, coll: str, filter: dict, update: dict,
                    upsert: bool = False) -> dict:
        return self.command({"update": coll, "updates": [
            {"q": filter, "u": update, "multi": True, "upsert": upsert}]})

    def delete_many(self, coll: str, filter: dict) -> int:
        return self.command({"delete": coll, "deletes": [
            {"q": filter, "limit": 0}]})["n"]

    def count(self, coll: str, filter: Optional[dict] = None) -> int:
        return self.command({"count": coll, "query": filter or {}})["n"]

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Mini server
# ---------------------------------------------------------------------------


def _match(filter: dict, doc: dict) -> bool:
    for k, cond in filter.items():
        have = doc.get(k)
        if isinstance(cond, dict) and any(op.startswith("$") for op in cond):
            for op, rhs in cond.items():
                try:
                    if op == "$gt" and not have > rhs:
                        return False
                    elif op == "$gte" and not have >= rhs:
                        return False
                    elif op == "$lt" and not have < rhs:
                        return False
                    elif op == "$lte" and not have <= rhs:
                        return False
                    elif op == "$ne" and not have != rhs:
                        return False
                    elif op == "$in" and have not in rhs:
                        return False
                except TypeError:
                    return False  # null/missing never satisfies a range op
        elif have != cond:
            return False
    return True


class MiniMongoServer:
    """Loopback mongod subset speaking OP_MSG."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._server = None
        self.address = ""
        self._lock = threading.Lock()
        # (db, coll) -> list of documents
        self.colls: dict[tuple[str, str], list[dict]] = {}
        self._oid = itertools.count(1)

    def start(self) -> "MiniMongoServer":
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                buf = b""

                def read_exact(n: int) -> bytes:
                    nonlocal buf
                    while len(buf) < n:
                        chunk = self.request.recv(65536)
                        if not chunk:
                            raise ConnectionError("closed")
                        buf += chunk
                    out, buf = buf[:n], buf[n:]
                    return out

                try:
                    while True:
                        length = struct.unpack("<i", read_exact(4))[0]
                        frame = struct.pack("<i", length) + read_exact(length - 4)
                        rid, cmd = decode_op_msg(frame)
                        reply = outer._dispatch(cmd)
                        self.request.sendall(
                            encode_op_msg(rid + 1_000_000, reply, response_to=rid))
                except (ConnectionError, OSError, ValueError, struct.error):
                    return

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

    def _dispatch(self, cmd: dict) -> dict:
        db = cmd.get("$db", "test")
        verb = next(iter(cmd))
        with self._lock:
            if verb in ("hello", "ismaster", "ping"):
                return {"ok": 1, "maxWireVersion": 17}
            coll_key = (db, cmd[verb]) if isinstance(cmd[verb], str) else None
            if verb == "insert":
                docs = cmd.get("documents", [])
                store = self.colls.setdefault(coll_key, [])
                for d in docs:
                    if "_id" not in d:
                        d = {"_id": f"oid{next(self._oid):08d}", **d}
                    store.append(dict(d))
                return {"ok": 1, "n": len(docs)}
            if verb == "find":
                store = self.colls.get(coll_key, [])
                got = [dict(d) for d in store if _match(cmd.get("filter") or {}, d)]
                for key, direction in (cmd.get("sort") or {}).items():
                    got.sort(key=lambda d: d.get(key), reverse=direction < 0)
                limit = cmd.get("limit") or 0
                if limit:
                    got = got[:limit]
                return {"ok": 1, "cursor": {"id": 0, "ns": f"{db}.{cmd[verb]}",
                                            "firstBatch": got}}
            if verb == "update":
                store = self.colls.setdefault(coll_key, [])
                n = n_mod = 0
                upserted = []
                for u in cmd.get("updates", []):
                    q, upd = u.get("q") or {}, u.get("u") or {}
                    matched = [d for d in store if _match(q, d)]
                    if not matched and u.get("upsert"):
                        base = {k: v for k, v in q.items() if not isinstance(v, dict)}
                        doc = {"_id": f"oid{next(self._oid):08d}", **base,
                               **upd.get("$set", {})}
                        store.append(doc)
                        upserted.append(doc["_id"])
                        continue
                    for d in matched if u.get("multi") else matched[:1]:
                        n += 1
                        if "$set" in upd:
                            d.update(upd["$set"])
                        else:  # replacement document
                            _id = d.get("_id")
                            d.clear()
                            d.update(upd)
                            d.setdefault("_id", _id)
                        n_mod += 1
                return {"ok": 1, "n": n + len(upserted), "nModified": n_mod,
                        "upserted": [{"index": i, "_id": x}
                                     for i, x in enumerate(upserted)]}
            if verb == "delete":
                store = self.colls.setdefault(coll_key, [])
                n = 0
                for spec in cmd.get("deletes", []):
                    q = spec.get("q") or {}
                    keep = [d for d in store if not _match(q, d)]
                    n += len(store) - len(keep)
                    store[:] = keep
                return {"ok": 1, "n": n}
            if verb == "count":
                store = self.colls.get(coll_key, [])
                return {"ok": 1,
                        "n": sum(1 for d in store if _match(cmd.get("query") or {}, d))}
            if verb == "drop":
                self.colls.pop(coll_key, None)
                return {"ok": 1}
        return {"ok": 0, "errmsg": f"no such command: '{verb}'", "code": 59}
