"""From-scratch RFC 6455 WebSocket — handshake + frame codec + a small
client, enough to implement the reference's `websocket` input/output
(internal/impl/io/input_websocket.go:58, output_websocket.go:39)
offline (no ws library in this environment).

Wire format pinned against the RFC's own published examples
(tests/test_websocket.py): the §1.3 Sec-WebSocket-Accept vector
("dGhlIHNhbXBsZSBub25jZQ==" → "s3pKLMBiTxaQ9kYGzzhZRbK+xOo=") and all
four §5.7 example frames (unmasked/masked "Hello", 256-byte and
64 KiB binary length encodings).

The codec is symmetric, so the test-side server is built from the same
primitives the client uses — the same forward-transform validation
discipline as the image codecs (functions/webp.py et al.).
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
from urllib.parse import urlparse

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10


def accept_key(sec_websocket_key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §1.3)."""
    digest = hashlib.sha1((sec_websocket_key + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(payload: bytes, opcode: int = OP_TEXT, mask: bytes | None = None,
                 fin: bool = True) -> bytes:
    """One frame (§5.2). Clients MUST mask (pass a 4-byte mask);
    servers MUST NOT (mask=None)."""
    b0 = (0x80 if fin else 0) | opcode
    n = len(payload)
    mbit = 0x80 if mask is not None else 0
    if n < 126:
        hdr = struct.pack("!BB", b0, mbit | n)
    elif n < (1 << 16):
        hdr = struct.pack("!BBH", b0, mbit | 126, n)
    else:
        hdr = struct.pack("!BBQ", b0, mbit | 127, n)
    if mask is None:
        return hdr + payload
    assert len(mask) == 4
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    return hdr + mask + masked


def decode_frame(read_exact) -> tuple[int, bytes, bool]:
    """Read one frame via `read_exact(n) -> bytes`; returns
    (opcode, payload, fin). Unmasks when the mask bit is set."""
    b0, b1 = struct.unpack("!BB", read_exact(2))
    fin, opcode = bool(b0 & 0x80), b0 & 0x0F
    masked, n = bool(b1 & 0x80), b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack("!H", read_exact(2))
    elif n == 127:
        (n,) = struct.unpack("!Q", read_exact(8))
    mask = read_exact(4) if masked else None
    payload = read_exact(n)
    if mask:
        payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    return opcode, payload, fin


def _read_exact_from(sock: socket.socket):
    def read_exact(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("websocket peer closed mid-frame")
            buf += chunk
        return buf

    return read_exact


class WsClient:
    """Minimal RFC 6455 client: handshake, send/recv messages with
    ping/pong + continuation handling, close."""

    def __init__(self, url: str, timeout_s: float = 30.0):
        u = urlparse(url)
        if u.scheme not in ("ws", "http"):
            raise ValueError(f"websocket url scheme {u.scheme!r} not supported (ws only)")
        self.host, self.port = u.hostname, u.port or 80
        self.path = u.path or "/"
        if u.query:
            self.path += "?" + u.query
        self.timeout_s = timeout_s
        self.sock: socket.socket | None = None

    def connect(self) -> "WsClient":
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock = socket.create_connection((self.host, self.port), timeout=self.timeout_s)
        req = (
            f"GET {self.path} HTTP/1.1\r\n"
            f"Host: {self.host}:{self.port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("websocket handshake: server closed")
            resp += chunk
        head_b, leftover = resp.split(b"\r\n\r\n", 1)
        head = head_b.decode("latin-1")
        status = head.split("\r\n")[0]
        if " 101 " not in status + " ":
            raise ConnectionError(f"websocket handshake rejected: {status}")
        hdrs = {
            ln.split(":", 1)[0].strip().lower(): ln.split(":", 1)[1].strip()
            for ln in head.split("\r\n")[1:] if ":" in ln
        }
        if hdrs.get("sec-websocket-accept") != accept_key(key):
            raise ConnectionError("websocket handshake: bad Sec-WebSocket-Accept")
        # frames may arrive in the same TCP chunk as the 101 — keep them
        pre = bytearray(leftover)
        raw = _read_exact_from(self.sock)

        def read_exact(n: int) -> bytes:
            if pre:
                take = bytes(pre[:n])
                del pre[: len(take)]
                return take + (raw(n - len(take)) if len(take) < n else b"")
            return raw(n)

        self._read_exact = read_exact
        return self

    def send(self, payload: bytes | str, opcode: int | None = None) -> None:
        if isinstance(payload, str):
            payload, op = payload.encode(), OP_TEXT
        else:
            op = OP_BINARY
        self.sock.sendall(encode_frame(payload, opcode if opcode is not None else op,
                                       mask=os.urandom(4)))

    def recv(self) -> tuple[int, bytes] | None:
        """Next data message (opcode, payload) with fragmentation
        reassembled; answers pings; None on clean close."""
        buf, first_op = b"", None
        while True:
            op, payload, fin = decode_frame(self._read_exact)
            if op == OP_PING:
                self.sock.sendall(encode_frame(payload, OP_PONG, mask=os.urandom(4)))
                continue
            if op == OP_PONG:
                continue
            if op == OP_CLOSE:
                try:
                    self.sock.sendall(encode_frame(payload[:2], OP_CLOSE, mask=os.urandom(4)))
                except OSError:
                    pass
                return None
            if op in (OP_TEXT, OP_BINARY):
                first_op, buf = op, payload
            elif op == OP_CONT:
                buf += payload
            if fin:
                return first_op, buf

    def close(self) -> None:
        if self.sock is not None:
            try:
                self.sock.sendall(encode_frame(b"\x03\xe8", OP_CLOSE, mask=os.urandom(4)))
                self.sock.settimeout(2)
                try:
                    decode_frame(self._read_exact)  # the close echo
                except Exception:
                    pass
            except OSError:
                pass
            self.sock.close()
            self.sock = None


def server_handshake(conn: socket.socket) -> str:
    """Server side of the upgrade (for the test server and the
    spool-listener variant): reads the HTTP request, answers 101,
    returns the request path."""
    req = b""
    while b"\r\n\r\n" not in req:
        chunk = conn.recv(4096)
        if not chunk:
            raise ConnectionError("websocket client closed during handshake")
        req += chunk
    head = req.split(b"\r\n\r\n", 1)[0].decode("latin-1")
    lines = head.split("\r\n")
    path = lines[0].split(" ")[1]
    hdrs = {
        ln.split(":", 1)[0].strip().lower(): ln.split(":", 1)[1].strip()
        for ln in lines[1:] if ":" in ln
    }
    key = hdrs["sec-websocket-key"]
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
        ).encode()
    )
    return path
