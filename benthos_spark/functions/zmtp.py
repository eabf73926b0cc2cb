"""ZMTP 3.0 (ZeroMQ Message Transport Protocol) and the nanomsg SP TCP
mapping, from scratch off the public specs — rfc.zeromq.org/spec/23
(ZMTP 3.0: 64-byte greeting, NULL security handshake with a READY
metadata command, flags+length frames) and nanomsg's SP-over-TCP
mapping (sp-tcp-mapping RFC: an 8-byte protocol header followed by
64-bit-length-prefixed messages). The reference embeds go-zeromq/zmq4
(internal/impl/zeromq/input_zmq4.go, output_zmq4.go) and
go-mangos/mangos (internal/impl/nanomsg/input.go, output.go); here both
wire protocols are written by hand so the connectors interoperate with
real libzmq / nanomsg peers.

ZMTP pins (spec §;greeting / §;framing):

- greeting: ``\\xFF`` + 8 padding bytes + ``\\x7F`` signature, version
  ``\\x03\\x00``, mechanism "NULL" zero-padded to 20 bytes, as-server
  ``\\x00``, 31 filler bytes — 64 bytes total.
- NULL handshake: a READY command carrying ``Socket-Type`` (and
  optionally ``Identity``) metadata as (1-byte name length, name,
  4-byte BE value length, value) pairs.
- frames: flags byte (bit0 MORE, bit1 LONG, bit2 COMMAND) then a 1-byte
  (short) or 8-byte BE (long) size and the body.
- socket-type compatibility is enforced exactly per the spec table
  (PUSH↔PULL, PUB↔SUB, REQ↔REP, PAIR↔PAIR).
- SUB sockets send subscriptions as ``\\x01 + prefix`` messages
  (cancel = ``\\x00 + prefix``), and PUB sides filter on them — the
  ZMTP 3.0 subscription scheme.

SP/nanomsg pins (the TCP mapping RFC): header ``\\x00SP\\x00`` +
2-byte BE protocol number + ``\\x00\\x00`` reserved; protocol numbers
are ``16*family + role`` (PAIR 16, PUB 32, SUB 33, REQ 48, REP 49,
PUSH 80, PULL 81); each message is an 8-byte BE length + payload.
Peers validate the remote protocol number against the compatibility
table on connect.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Callable, Iterator, Optional

# ---------------------------------------------------------------------------
# ZMTP 3.0
# ---------------------------------------------------------------------------

ZMTP_COMPAT = {"PUSH": "PULL", "PULL": "PUSH", "PUB": "SUB", "SUB": "PUB",
               "REQ": "REP", "REP": "REQ", "PAIR": "PAIR"}


def zmtp_greeting() -> bytes:
    return (b"\xff" + b"\x00" * 8 + b"\x7f"          # signature
            + b"\x03\x00"                              # version 3.0
            + b"NULL" + b"\x00" * 16                   # mechanism
            + b"\x00"                                  # as-server
            + b"\x00" * 31)                            # filler


def zmtp_ready(socket_type: str) -> bytes:
    """READY command frame with Socket-Type metadata."""
    name = b"Socket-Type"
    value = socket_type.encode()
    meta = bytes([len(name)]) + name + struct.pack(">I", len(value)) + value
    body = bytes([5]) + b"READY" + meta
    return encode_frame(body, command=True)


def encode_frame(body: bytes, more: bool = False, command: bool = False) -> bytes:
    flags = (1 if more else 0) | (4 if command else 0)
    if len(body) <= 255:
        return bytes([flags, len(body)]) + body
    return bytes([flags | 2]) + struct.pack(">Q", len(body)) + body


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, bytes]:
    """Return (flags, body)."""
    flags = _read_exact(sock, 1)[0]
    if flags & 2:
        size = struct.unpack(">Q", _read_exact(sock, 8))[0]
    else:
        size = _read_exact(sock, 1)[0]
    return flags, _read_exact(sock, size)


def parse_ready(body: bytes) -> dict[str, bytes]:
    """Parse a READY command body into its metadata dict."""
    if body[:1] != b"\x05" or body[1:6] != b"READY":
        raise ConnectionError(f"expected READY, got {body[:16]!r}")
    meta: dict[str, bytes] = {}
    i = 6
    while i < len(body):
        nlen = body[i]
        name = body[i + 1:i + 1 + nlen].decode("ascii")
        i += 1 + nlen
        vlen = struct.unpack(">I", body[i:i + 4])[0]
        meta[name.lower()] = body[i + 4:i + 4 + vlen]
        i += 4 + vlen
    return meta


class ZmtpConnection:
    """One handshaken ZMTP peer connection."""

    def __init__(self, sock: socket.socket, socket_type: str):
        self.sock = sock
        self.socket_type = socket_type
        self.subscriptions: list[bytes] = []  # when the peer is SUB
        self._lock = threading.Lock()

    def handshake(self) -> "ZmtpConnection":
        self.sock.sendall(zmtp_greeting())
        greet = _read_exact(self.sock, 64)
        if greet[0] != 0xFF or greet[9] != 0x7F:
            raise ConnectionError("bad ZMTP signature")
        if greet[12:16].rstrip(b"\x00") != b"NULL":
            raise ConnectionError(f"unsupported mechanism {greet[12:32]!r}")
        self.sock.sendall(zmtp_ready(self.socket_type))
        flags, body = read_frame(self.sock)
        if not flags & 4:
            raise ConnectionError("expected a command frame")
        meta = parse_ready(body)
        peer = meta.get("socket-type", b"").decode()
        if ZMTP_COMPAT.get(self.socket_type) != peer:
            raise ConnectionError(
                f"incompatible socket types: {self.socket_type} vs {peer}")
        return self

    def send_message(self, parts: list[bytes]) -> None:
        with self._lock:
            for i, part in enumerate(parts):
                self.sock.sendall(encode_frame(part, more=i < len(parts) - 1))

    def recv_message(self) -> list[bytes]:
        parts = []
        while True:
            flags, body = read_frame(self.sock)
            if flags & 4:
                continue  # ignore mid-stream commands (e.g. PING)
            parts.append(body)
            if not flags & 1:
                return parts

    def subscribe(self, prefix: bytes = b"") -> None:
        """ZMTP 3.0 SUB subscription: a \\x01+prefix message."""
        self.send_message([b"\x01" + prefix])

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def zmtp_connect(address: str, socket_type: str,
                 timeout_s: float = 30.0) -> ZmtpConnection:
    host, port = _split(address)
    sock = socket.create_connection((host, port), timeout=timeout_s)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return ZmtpConnection(sock, socket_type).handshake()


class ZmtpListener:
    """Bound end: accepts peers, handshakes each on a thread, and hands
    connections to ``on_peer``. PUB listeners track each SUB peer's
    subscription list and fan out with prefix filtering."""

    def __init__(self, address: str, socket_type: str,
                 on_message: Optional[Callable[[list[bytes]], None]] = None):
        self.socket_type = socket_type
        self.on_message = on_message
        host, port = _split(address)
        self._srv = socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self.address = f"{host}:{self.port}"
        self._peers: list[ZmtpConnection] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._peer_loop, args=(sock,),
                             daemon=True).start()

    def _peer_loop(self, sock: socket.socket) -> None:
        try:
            conn = ZmtpConnection(sock, self.socket_type).handshake()
        except ConnectionError:
            sock.close()
            return
        with self._lock:
            self._peers.append(conn)
        try:
            while not self._stop.is_set():
                msg = conn.recv_message()
                if self.socket_type == "PUB" and len(msg) == 1 and msg[0][:1] in (b"\x00", b"\x01"):
                    prefix = msg[0][1:]
                    with self._lock:
                        if msg[0][:1] == b"\x01":
                            conn.subscriptions.append(prefix)
                        elif prefix in conn.subscriptions:
                            conn.subscriptions.remove(prefix)
                    continue
                if self.on_message is not None:
                    self.on_message(msg)
        except (ConnectionError, OSError):
            pass
        finally:
            with self._lock:
                if conn in self._peers:
                    self._peers.remove(conn)
            conn.close()

    def publish(self, parts: list[bytes]) -> None:
        """PUB fan-out with ZMTP prefix filtering."""
        with self._lock:
            peers = list(self._peers)
        for p in peers:
            if self.socket_type == "PUB":
                subs = list(p.subscriptions)
                if not any(parts[0].startswith(s) for s in subs):
                    continue
            try:
                p.send_message(parts)
            except OSError:
                pass

    def push(self, parts: list[bytes]) -> None:
        """PUSH round-robin to connected PULL peers (blocks until one)."""
        while True:
            with self._lock:
                peers = list(self._peers)
            if peers:
                # round-robin: rotate the list head
                p = peers[0]
                with self._lock:
                    if p in self._peers:
                        self._peers.remove(p)
                        self._peers.append(p)
                try:
                    p.send_message(parts)
                    return
                except OSError:
                    continue
            else:
                if self._stop.wait(0.01):
                    return

    def peer_count(self) -> int:
        with self._lock:
            return len(self._peers)

    def close(self) -> None:
        self._stop.set()
        self._srv.close()
        with self._lock:
            for p in self._peers:
                p.close()
            self._peers.clear()


def _split(address: str) -> tuple[str, int]:
    a = address
    for scheme in ("tcp://", "nn://"):
        if a.startswith(scheme):
            a = a[len(scheme):]
    host, _, port = a.rpartition(":")
    return host or "127.0.0.1", int(port)


# ---------------------------------------------------------------------------
# nanomsg SP TCP mapping
# ---------------------------------------------------------------------------

SP_PROTO = {"PAIR": 16, "PUB": 32, "SUB": 33, "REQ": 48, "REP": 49,
            "PUSH": 80, "PULL": 81}
SP_COMPAT = {16: 16, 32: 33, 33: 32, 48: 49, 49: 48, 80: 81, 81: 80}


def sp_header(socket_type: str) -> bytes:
    return b"\x00SP\x00" + struct.pack(">H", SP_PROTO[socket_type]) + b"\x00\x00"


class SpConnection:
    """One handshaken SP peer."""

    def __init__(self, sock: socket.socket, socket_type: str):
        self.sock, self.socket_type = sock, socket_type
        self._lock = threading.Lock()

    def handshake(self) -> "SpConnection":
        self.sock.sendall(sp_header(self.socket_type))
        hdr = _read_exact(self.sock, 8)
        if hdr[:4] != b"\x00SP\x00":
            raise ConnectionError(f"bad SP header {hdr!r}")
        peer_proto = struct.unpack(">H", hdr[4:6])[0]
        if SP_COMPAT.get(SP_PROTO[self.socket_type]) != peer_proto:
            raise ConnectionError(
                f"incompatible SP protocols: {SP_PROTO[self.socket_type]} vs {peer_proto}")
        return self

    def send(self, payload: bytes) -> None:
        with self._lock:
            self.sock.sendall(struct.pack(">Q", len(payload)) + payload)

    def recv(self) -> bytes:
        size = struct.unpack(">Q", _read_exact(self.sock, 8))[0]
        return _read_exact(self.sock, size)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def sp_connect(address: str, socket_type: str,
               timeout_s: float = 30.0) -> SpConnection:
    host, port = _split(address)
    sock = socket.create_connection((host, port), timeout=timeout_s)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return SpConnection(sock, socket_type).handshake()


class SpListener:
    """Bound SP end; same fan-in/fan-out roles as ZmtpListener. nanomsg
    SUB filtering is client-side (subscriptions never reach the wire),
    so PUB publishes to every peer and the SUB end filters."""

    def __init__(self, address: str, socket_type: str,
                 on_message: Optional[Callable[[bytes], None]] = None):
        self.socket_type = socket_type
        self.on_message = on_message
        host, port = _split(address)
        self._srv = socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self.address = f"{host}:{self.port}"
        self._peers: list[SpConnection] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._peer_loop, args=(sock,),
                             daemon=True).start()

    def _peer_loop(self, sock: socket.socket) -> None:
        try:
            conn = SpConnection(sock, self.socket_type).handshake()
        except ConnectionError:
            sock.close()
            return
        with self._lock:
            self._peers.append(conn)
        try:
            while not self._stop.is_set():
                payload = conn.recv()
                if self.on_message is not None:
                    self.on_message(payload)
        except (ConnectionError, OSError):
            pass
        finally:
            with self._lock:
                if conn in self._peers:
                    self._peers.remove(conn)
            conn.close()

    def publish(self, payload: bytes) -> None:
        with self._lock:
            peers = list(self._peers)
        for p in peers:
            try:
                p.send(payload)
            except OSError:
                pass

    def push(self, payload: bytes) -> None:
        while True:
            with self._lock:
                peers = list(self._peers)
            if peers:
                p = peers[0]
                with self._lock:
                    if p in self._peers:
                        self._peers.remove(p)
                        self._peers.append(p)
                try:
                    p.send(payload)
                    return
                except OSError:
                    continue
            else:
                if self._stop.wait(0.01):
                    return

    def peer_count(self) -> int:
        with self._lock:
            return len(self._peers)

    def close(self) -> None:
        self._stop.set()
        self._srv.close()
        with self._lock:
            for p in self._peers:
                p.close()
            self._peers.clear()
