"""From-scratch memcached TEXT protocol (the public protocol.txt spec)
— client + in-process mini server for the `memcached` cache backend
(internal/impl/memcached/cache.go:16).

Only the storage/retrieval verbs the reference cache actually issues
through gomemcache are implemented: ``get``, ``set``, ``add``,
``delete`` (cache.go Get/Set/AddWithTTL/Delete). Wire format:

    set <key> <flags> <exptime> <bytes>\r\n<data>\r\n  -> STORED
    add ...                                            -> STORED | NOT_STORED
    get <key>\r\n    -> VALUE <key> <flags> <bytes>\r\n<data>\r\nEND\r\n
    delete <key>\r\n -> DELETED | NOT_FOUND

The client round-robins get misses across addresses the way gomemcache
hashes keys across its server list — with one server (the tested shape)
the behaviors coincide; with several we hash the key (CRC32, the
gomemcache default modulo) so a key always lands on one server.
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time
import zlib
from typing import Optional


class MemcachedError(RuntimeError):
    pass


class MemcachedClient:
    """Minimal text-protocol client; one pooled connection per server."""

    def __init__(self, addresses: list[str], timeout_s: float = 5.0):
        if not addresses:
            raise ValueError("memcached needs at least one address")
        self.addresses = []
        for addr in addresses:
            for part in addr.split(","):
                if part:
                    self.addresses.append(part)
        self.timeout_s = timeout_s
        self._socks: dict[str, socket.socket] = {}
        self._lock = threading.Lock()

    # -- connection management -------------------------------------------
    def _pick(self, key: str) -> str:
        if len(self.addresses) == 1:
            return self.addresses[0]
        return self.addresses[zlib.crc32(key.encode()) % len(self.addresses)]

    def _sock(self, addr: str) -> socket.socket:
        s = self._socks.get(addr)
        if s is not None:
            return s
        host, _, port = addr.rpartition(":")
        s = socket.create_connection((host or "127.0.0.1", int(port)), timeout=self.timeout_s)
        self._socks[addr] = s
        return s

    def close(self) -> None:
        with self._lock:
            for s in self._socks.values():
                try:
                    s.close()
                except OSError:
                    pass
            self._socks.clear()

    def _roundtrip(self, key: str, payload: bytes, read_body_for: Optional[str] = None):
        """Send one command, read one reply line (+ value block for get)."""
        addr = self._pick(key)
        with self._lock:
            s = self._sock(addr)
            try:
                s.sendall(payload)
                return self._read_reply(s, read_body_for)
            except OSError:
                # one reconnect attempt — memcached servers drop idle conns
                try:
                    s.close()
                finally:
                    self._socks.pop(addr, None)
                s = self._sock(addr)
                s.sendall(payload)
                return self._read_reply(s, read_body_for)

    @staticmethod
    def _read_line(s: socket.socket, buf: bytearray) -> bytes:
        while b"\r\n" not in buf:
            chunk = s.recv(65536)
            if not chunk:
                raise MemcachedError("connection closed mid-reply")
            buf.extend(chunk)
        line, _, rest = bytes(buf).partition(b"\r\n")
        buf.clear()
        buf.extend(rest)
        return line

    def _read_reply(self, s: socket.socket, read_body_for: Optional[str]):
        buf = bytearray()
        line = self._read_line(s, buf)
        if line.startswith((b"ERROR", b"CLIENT_ERROR", b"SERVER_ERROR")):
            raise MemcachedError(line.decode(errors="replace"))
        if read_body_for is None:
            return line, None
        # get reply: VALUE <key> <flags> <bytes>\r\n<data>\r\nEND  |  END
        if line == b"END":
            return line, None
        if not line.startswith(b"VALUE "):
            raise MemcachedError(f"unexpected get reply {line!r}")
        nbytes = int(line.split()[3])
        while len(buf) < nbytes + 2:
            chunk = s.recv(65536)
            if not chunk:
                raise MemcachedError("connection closed mid-value")
            buf.extend(chunk)
        data = bytes(buf[:nbytes])
        del buf[: nbytes + 2]
        end = self._read_line(s, buf)
        if end != b"END":
            raise MemcachedError(f"missing END, got {end!r}")
        return line, data

    # -- verbs -------------------------------------------------------------
    def get(self, key: str) -> Optional[bytes]:
        _, data = self._roundtrip(key, f"get {key}\r\n".encode(), read_body_for=key)
        return data

    def _store(self, verb: str, key: str, value: bytes, exptime_s: int) -> bool:
        cmd = f"{verb} {key} 0 {exptime_s} {len(value)}\r\n".encode() + value + b"\r\n"
        line, _ = self._roundtrip(key, cmd)
        if line == b"STORED":
            return True
        if line == b"NOT_STORED":
            return False
        raise MemcachedError(f"{verb} reply {line!r}")

    def set(self, key: str, value: bytes, exptime_s: int = 0) -> None:
        self._store("set", key, value, exptime_s)

    def add(self, key: str, value: bytes, exptime_s: int = 0) -> bool:
        return self._store("add", key, value, exptime_s)

    def delete(self, key: str) -> bool:
        line, _ = self._roundtrip(key, f"delete {key}\r\n".encode())
        return line == b"DELETED"


class MiniMemcachedServer:
    """In-process memcached speaking the text protocol subset above,
    with real exptime expiry — the test stand-in for a cluster."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        store = {}
        lock = threading.Lock()

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    parts = line.strip().decode(errors="replace").split()
                    if not parts:
                        continue
                    verb = parts[0]
                    try:
                        if verb in ("set", "add"):
                            key, _flags, exptime, nbytes = parts[1], parts[2], int(parts[3]), int(parts[4])
                            data = self.rfile.read(nbytes + 2)[:nbytes]
                            expiry = time.monotonic() + exptime if exptime > 0 else None
                            with lock:
                                live = key in store and (
                                    store[key][1] is None or store[key][1] > time.monotonic()
                                )
                                if verb == "add" and live:
                                    self.wfile.write(b"NOT_STORED\r\n")
                                    continue
                                store[key] = (data, expiry)
                            self.wfile.write(b"STORED\r\n")
                        elif verb == "get":
                            key = parts[1]
                            with lock:
                                item = store.get(key)
                                if item is not None and item[1] is not None and item[1] <= time.monotonic():
                                    del store[key]
                                    item = None
                            if item is None:
                                self.wfile.write(b"END\r\n")
                            else:
                                data = item[0]
                                self.wfile.write(
                                    f"VALUE {key} 0 {len(data)}\r\n".encode() + data + b"\r\nEND\r\n"
                                )
                        elif verb == "delete":
                            with lock:
                                found = store.pop(parts[1], None) is not None
                            self.wfile.write(b"DELETED\r\n" if found else b"NOT_FOUND\r\n")
                        elif verb == "quit":
                            return
                        else:
                            self.wfile.write(b"ERROR\r\n")
                    except (IndexError, ValueError):
                        self.wfile.write(b"CLIENT_ERROR bad command line\r\n")

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = f"{self._server.server_address[0]}:{self._server.server_address[1]}"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        self.store = store

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
