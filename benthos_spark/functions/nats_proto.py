"""NATS wire protocol + in-process mini server, from scratch off the
public protocol spec (docs.nats.io/reference/reference-protocols/
nats-protocol). The reference's nats connectors
(internal/impl/nats/input.go, output.go) use nats.go; here the same
text protocol is spoken directly so the connectors work against a real
NATS server, while tests run against :class:`MiniNatsServer` over
loopback TCP.

Protocol (all lines CRLF-terminated):
  server → client:  INFO {json}   MSG <subj> <sid> [reply] <n>\\r\\n<payload>
                    PING  PONG  +OK  -ERR 'msg'
  client → server:  CONNECT {json}   PUB <subj> [reply] <n>\\r\\n<payload>
                    SUB <subj> [queue] <sid>   UNSUB <sid>   PING  PONG

Subject matching implements the spec's wildcards: ``*`` matches one
token, ``>`` matches the remaining tail. Queue groups deliver each
message to ONE member (round-robin)."""

from __future__ import annotations

import itertools
import json
import socket
import socketserver
import threading
from typing import Callable, Optional

CRLF = b"\r\n"


def subject_matches(pattern: str, subject: str) -> bool:
    """NATS subject wildcard match (`*` one token, `>` tail)."""
    pt, st = pattern.split("."), subject.split(".")
    for i, p in enumerate(pt):
        if p == ">":
            return len(st) > i  # '>' matches one or more remaining tokens
        if i >= len(st):
            return False
        if p != "*" and p != st[i]:
            return False
    return len(pt) == len(st)


class NatsConnection:
    """Client side: CONNECT, PUB, SUB with a callback pump thread."""

    def __init__(self, url: str, name: str = "benthos-spark"):
        u = url
        for scheme in ("nats://", "tcp://"):
            if u.startswith(scheme):
                u = u[len(scheme):]
        host, port = u.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self._buf = b""
        self._lock = threading.Lock()
        self._sids = itertools.count(1)
        self._subs: dict[str, Callable[[str, bytes, Optional[str]], None]] = {}
        info = self._read_line()
        if not info.startswith(b"INFO "):
            raise ConnectionError(f"expected INFO, got {info[:40]!r}")
        self._send(b"CONNECT " + json.dumps(
            {"verbose": False, "pedantic": False, "name": name,
             "lang": "python", "version": "0"}).encode() + CRLF)
        self._pump_started = False

    def _send(self, data: bytes) -> None:
        with self._lock:
            self._sock.sendall(data)

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("nats connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_line(self) -> bytes:
        while CRLF not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("nats connection closed")
            self._buf += chunk
        line, self._buf = self._buf.split(CRLF, 1)
        return line

    def publish(self, subject: str, payload: bytes, reply: Optional[str] = None) -> None:
        head = f"PUB {subject} {reply + ' ' if reply else ''}{len(payload)}\r\n"
        self._send(head.encode() + payload + CRLF)

    def subscribe(self, subject: str, cb, queue: Optional[str] = None) -> str:
        sid = str(next(self._sids))
        self._subs[sid] = cb
        q = f" {queue}" if queue else ""
        self._send(f"SUB {subject}{q} {sid}\r\n".encode())
        if not self._pump_started:
            self._pump_started = True
            threading.Thread(target=self._pump, daemon=True).start()
        return sid

    def flush(self) -> None:
        """PING/PONG round trip — guarantees prior commands were
        processed (requires the pump NOT running; use right after
        publish-only use or before the first subscribe)."""
        if self._pump_started:
            return
        self._send(b"PING\r\n")
        while True:
            line = self._read_line()
            if line == b"PONG":
                return

    def _pump(self) -> None:
        try:
            while True:
                line = self._read_line()
                if line == b"PING":
                    self._send(b"PONG\r\n")
                    continue
                if line.startswith(b"MSG "):
                    parts = line.decode().split(" ")
                    # MSG <subject> <sid> [reply] <n>
                    if len(parts) == 4:
                        _, subject, sid, n = parts
                        reply = None
                    else:
                        _, subject, sid, reply, n = parts
                    payload = self._read_exact(int(n))
                    self._read_exact(2)  # trailing CRLF
                    cb = self._subs.get(sid)
                    if cb is not None:
                        cb(subject, payload, reply)
        except (ConnectionError, OSError):
            return

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class MiniNatsServer:
    """Loopback NATS server: core pub/sub with wildcards and queue
    groups (round-robin per group). No auth/TLS/JetStream — the core
    protocol the reference's plain nats input/output uses."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._server = None
        self.address = ""
        self._lock = threading.Lock()
        # list of (pattern, queue, sid, send_fn); send_fn(subject, payload)
        self._subs: list[tuple[str, Optional[str], str, Callable]] = []
        self._rr: dict[tuple[str, str], int] = {}

    def start(self) -> "MiniNatsServer":
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    outer._serve(self.request)
                except (ConnectionError, OSError):
                    pass
                finally:
                    outer._drop_conn(self.request)

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

    def _drop_conn(self, sock) -> None:
        with self._lock:
            self._subs = [s for s in self._subs if s[3].__self__ is not sock]

    def _serve(self, sock: socket.socket) -> None:
        host, port = self.address.rsplit(":", 1)
        sock.sendall(b"INFO " + json.dumps(
            {"server_id": "mini-nats", "version": "2.0.0-mini", "host": host,
             "port": int(port), "max_payload": 1 << 20, "proto": 1}).encode() + CRLF)
        send_lock = threading.Lock()

        def send(data: bytes) -> None:
            with send_lock:
                sock.sendall(data)

        send.__self__ = sock  # connection identity for cleanup

        buf = b""

        def read_line() -> bytes:
            nonlocal buf
            while CRLF not in buf:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            line, buf = buf.split(CRLF, 1)
            return line

        def read_exact(n: int) -> bytes:
            nonlocal buf
            while len(buf) < n:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            out, buf = buf[:n], buf[n:]
            return out

        while True:
            line = read_line()
            if not line:
                continue
            verb = line.split(b" ", 1)[0].upper()
            if verb == b"CONNECT":
                continue
            if verb == b"PING":
                send(b"PONG\r\n")
                continue
            if verb == b"PONG":
                continue
            if verb == b"SUB":
                parts = line.decode().split(" ")
                if len(parts) == 3:
                    _, pattern, sid = parts
                    queue = None
                else:
                    _, pattern, queue, sid = parts
                with self._lock:
                    self._subs.append((pattern, queue, sid, send))
                continue
            if verb == b"UNSUB":
                sid = line.decode().split(" ")[1]
                with self._lock:
                    self._subs = [s for s in self._subs
                                  if not (s[2] == sid and s[3].__self__ is sock)]
                continue
            if verb == b"PUB":
                parts = line.decode().split(" ")
                if len(parts) == 3:
                    _, subject, n = parts
                    reply = None
                else:
                    _, subject, reply, n = parts
                payload = read_exact(int(n))
                read_exact(2)  # CRLF
                self._deliver(subject, payload, reply)
                continue
            send(b"-ERR 'Unknown Protocol Operation'\r\n")

    def _deliver(self, subject: str, payload: bytes, reply: Optional[str]) -> None:
        with self._lock:
            matches = [s for s in self._subs if subject_matches(s[0], subject)]
            # queue groups: one member each, round-robin; plain subs: all
            plain = [s for s in matches if s[1] is None]
            by_queue: dict[tuple[str, str], list] = {}
            for s in matches:
                if s[1] is not None:
                    by_queue.setdefault((s[0], s[1]), []).append(s)
            chosen = list(plain)
            for key, members in sorted(by_queue.items()):
                idx = self._rr.get(key, 0) % len(members)
                self._rr[key] = idx + 1
                chosen.append(members[idx])
        r = f" {reply}" if reply else ""
        for pattern, queue, sid, send in chosen:
            head = f"MSG {subject} {sid}{r} {len(payload)}\r\n".encode()
            try:
                send(head + payload + CRLF)
            except OSError:
                pass
