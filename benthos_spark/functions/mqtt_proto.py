"""MQTT 3.1.1 packet codec + in-process mini broker, from scratch off
the public OASIS spec (mqtt/mqtt/v3.1.1/os). The reference's mqtt
connectors (internal/impl/mqtt/input.go, output.go) use paho; here the
packets are encoded directly so the connectors work against any MQTT
broker, while tests run against :class:`MiniMqttBroker` on loopback.

Implemented control packets: CONNECT/CONNACK, PUBLISH (QoS 0/1) /
PUBACK, SUBSCRIBE/SUBACK, UNSUBSCRIBE/UNSUBACK, PINGREQ/PINGRESP,
DISCONNECT. QoS 2 and retained-message delivery are not implemented
(the reference defaults to QoS 1; retained flag is accepted and
ignored by the mini broker)."""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Callable, Optional

CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK = 8, 9, 10, 11
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


def encode_remaining_length(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def encode_packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([ptype << 4 | flags]) + encode_remaining_length(len(body)) + body


def _mqtt_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def read_packet(recv) -> tuple[int, int, bytes]:
    """(type, flags, body) from a blocking byte reader recv(n)->bytes."""
    first = recv(1)
    ptype, flags = first[0] >> 4, first[0] & 0x0F
    mult, n = 1, 0
    while True:
        b = recv(1)[0]
        n += (b & 0x7F) * mult
        if not b & 0x80:
            break
        mult *= 128
        if mult > 128 ** 3:
            raise ValueError("malformed remaining length")
    return ptype, flags, recv(n) if n else b""


def topic_matches(pattern: str, topic: str) -> bool:
    """MQTT topic filter match (`+` one level, `#` multi-level tail)."""
    pt, tt = pattern.split("/"), topic.split("/")
    for i, p in enumerate(pt):
        if p == "#":
            return True
        if i >= len(tt):
            return False
        if p != "+" and p != tt[i]:
            return False
    return len(pt) == len(tt)


class MqttConnection:
    """Client: CONNECT → CONNACK; publish QoS 0 (fire) or 1 (PUBACK
    round trip); subscribe with a callback pump thread."""

    def __init__(self, url: str, client_id: str = "benthos-spark"):
        u = url
        for scheme in ("mqtt://", "tcp://"):
            if u.startswith(scheme):
                u = u[len(scheme):]
        host, port = u.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self._wlock = threading.Lock()
        self._pid = 0
        self._acks: dict[int, threading.Event] = {}
        self._on_msg: Optional[Callable[[str, bytes], None]] = None
        self._suback = threading.Event()
        self._pump_thread = None
        body = (_mqtt_string("MQTT") + bytes([4])  # protocol level 3.1.1
                + bytes([0x02])                    # clean session
                + struct.pack(">H", 30)            # keepalive
                + _mqtt_string(client_id))
        self._send(encode_packet(CONNECT, 0, body))
        ptype, _, ack = read_packet(self._read_exact)
        if ptype != CONNACK or ack[1] != 0:
            raise ConnectionError(f"mqtt connect refused: {ack!r}")

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("mqtt connection closed")
            buf += chunk
        return buf

    def _send(self, data: bytes) -> None:
        with self._wlock:
            self._sock.sendall(data)

    def _next_pid(self) -> int:
        self._pid = self._pid % 65535 + 1
        return self._pid

    def _ensure_pump(self) -> None:
        if self._pump_thread is None:
            self._pump_thread = threading.Thread(target=self._pump, daemon=True)
            self._pump_thread.start()

    def _pump(self) -> None:
        try:
            while True:
                ptype, flags, body = read_packet(self._read_exact)
                if ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    tlen = struct.unpack(">H", body[:2])[0]
                    topic = body[2:2 + tlen].decode()
                    i = 2 + tlen
                    if qos > 0:
                        pid = struct.unpack(">H", body[i:i + 2])[0]
                        i += 2
                        self._send(encode_packet(PUBACK, 0, struct.pack(">H", pid)))
                    if self._on_msg is not None:
                        self._on_msg(topic, body[i:])
                elif ptype == PUBACK:
                    pid = struct.unpack(">H", body[:2])[0]
                    ev = self._acks.pop(pid, None)
                    if ev is not None:
                        ev.set()
                elif ptype == SUBACK:
                    self._suback.set()
                elif ptype == PINGRESP:
                    pass
        except (ConnectionError, OSError):
            return

    def publish(self, topic: str, payload: bytes, qos: int = 1,
                retain: bool = False, timeout_s: float = 30.0) -> None:
        flags = (qos << 1) | (1 if retain else 0)
        body = _mqtt_string(topic)
        ev = None
        if qos > 0:
            self._ensure_pump()
            pid = self._next_pid()
            ev = threading.Event()
            self._acks[pid] = ev
            body += struct.pack(">H", pid)
        self._send(encode_packet(PUBLISH, flags, body + payload))
        if ev is not None and not ev.wait(timeout_s):
            raise TimeoutError(f"no PUBACK for publish to {topic}")

    def subscribe(self, topic_filter: str, on_msg, qos: int = 1,
                  timeout_s: float = 10.0) -> None:
        self._on_msg = on_msg
        self._ensure_pump()
        pid = self._next_pid()
        body = struct.pack(">H", pid) + _mqtt_string(topic_filter) + bytes([qos])
        self._suback.clear()
        self._send(encode_packet(SUBSCRIBE, 0x02, body))
        if not self._suback.wait(timeout_s):
            raise TimeoutError("no SUBACK")

    def close(self) -> None:
        try:
            self._send(encode_packet(DISCONNECT, 0, b""))
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass


class MiniMqttBroker:
    """Loopback MQTT 3.1.1 broker: QoS 0/1 publish/subscribe with
    wildcard filters. Messages forward at the subscriber's granted QoS
    (capped at the publish QoS); no persistence/retained delivery."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._server = None
        self.address = ""
        self._lock = threading.Lock()
        # (filter, qos, send_fn) with send_fn.__conn__ identity
        self._subs: list[tuple[str, int, Callable]] = []
        self._pid = 0

    def start(self) -> "MiniMqttBroker":
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    outer._serve(self.request)
                except (ConnectionError, OSError, ValueError, IndexError):
                    pass
                finally:
                    outer._drop(self.request)

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

    def _drop(self, sock) -> None:
        with self._lock:
            self._subs = [s for s in self._subs if s[2].__conn__ is not sock]

    def _serve(self, sock: socket.socket) -> None:
        def read_exact(n: int) -> bytes:
            buf = b""
            while len(buf) < n:
                chunk = sock.recv(n - len(buf))
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            return buf

        wlock = threading.Lock()

        def send(data: bytes) -> None:
            with wlock:
                sock.sendall(data)

        send.__conn__ = sock

        ptype, _, body = read_packet(read_exact)
        if ptype != CONNECT:
            return
        # session present 0, return code 0 (accepted)
        send(encode_packet(CONNACK, 0, b"\x00\x00"))

        while True:
            ptype, flags, body = read_packet(read_exact)
            if ptype == DISCONNECT:
                return
            if ptype == PINGREQ:
                send(encode_packet(PINGRESP, 0, b""))
            elif ptype == SUBSCRIBE:
                pid = struct.unpack(">H", body[:2])[0]
                i, codes = 2, []
                with self._lock:
                    while i < len(body):
                        tlen = struct.unpack(">H", body[i:i + 2])[0]
                        filt = body[i + 2:i + 2 + tlen].decode()
                        qos = min(body[i + 2 + tlen], 1)
                        i += 3 + tlen
                        self._subs.append((filt, qos, send))
                        codes.append(qos)
                send(encode_packet(SUBACK, 0, struct.pack(">H", pid) + bytes(codes)))
            elif ptype == UNSUBSCRIBE:
                pid = struct.unpack(">H", body[:2])[0]
                i, filts = 2, []
                while i < len(body):
                    tlen = struct.unpack(">H", body[i:i + 2])[0]
                    filts.append(body[i + 2:i + 2 + tlen].decode())
                    i += 2 + tlen
                with self._lock:
                    self._subs = [s for s in self._subs
                                  if not (s[0] in filts and s[2].__conn__ is sock)]
                send(encode_packet(UNSUBACK, 0, struct.pack(">H", pid)))
            elif ptype == PUBLISH:
                qos = (flags >> 1) & 0x03
                tlen = struct.unpack(">H", body[:2])[0]
                topic = body[2:2 + tlen].decode()
                i = 2 + tlen
                if qos > 0:
                    pid = struct.unpack(">H", body[i:i + 2])[0]
                    i += 2
                payload = body[i:]
                if qos == 1:
                    send(encode_packet(PUBACK, 0, struct.pack(">H", pid)))
                self._forward(topic, payload, qos)

    def _forward(self, topic: str, payload: bytes, pub_qos: int) -> None:
        with self._lock:
            targets = [(min(q, pub_qos), s) for f, q, s in self._subs
                       if topic_matches(f, topic)]
            self._pid = self._pid % 65535 + 1
            pid = self._pid
        for qos, send in targets:
            body = _mqtt_string(topic)
            if qos > 0:
                body += struct.pack(">H", pid)
            try:
                send(encode_packet(PUBLISH, qos << 1, body + payload))
            except OSError:
                pass
