"""AMQP 0-9-1 wire protocol + in-process mini broker, from scratch off
the public OASIS/RabbitMQ spec (amqp-0-9-1 "complete" specification:
frame layout §2.3, method/content framing §4.2, grammar appendix). The
reference's amqp_0_9 connectors (internal/impl/amqp09/input.go,
output.go) use github.com/rabbitmq/amqp091-go; here the frames are
encoded directly so the connectors work against a real RabbitMQ, while
tests run against :class:`MiniAmqpBroker` on loopback TCP.

Implemented surface (what the connectors need): connection + channel
handshake (PLAIN auth accepted verbatim), exchange.declare
(direct/fanout/topic), queue.declare/bind, basic.publish (method +
content-header + body frames), basic.consume/deliver, basic.get,
basic.ack, basic.qos (accepted, prefetch not enforced). Single body
frame per message up to frame-max (the connectors' message sizes);
heartbeats answered.

Frame: ``octet type | short channel | long size | payload | 0xCE``.
Types: 1 method, 2 content header, 3 body, 8 heartbeat.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Any, Callable, Optional

FRAME_METHOD, FRAME_HEADER, FRAME_BODY, FRAME_HEARTBEAT = 1, 2, 3, 8
FRAME_END = 0xCE

# class ids
C_CONNECTION, C_CHANNEL, C_EXCHANGE, C_QUEUE, C_BASIC = 10, 20, 40, 50, 60


# ---------------------------------------------------------------------------
# Argument codec
# ---------------------------------------------------------------------------


class Args:
    def __init__(self, data: bytes = b""):
        self._d = data
        self._i = 0
        self._out: list[bytes] = []
        self._bits: list[bool] = []

    # -- write --
    def _flush_bits(self):
        if self._bits:
            octet = 0
            for j, b in enumerate(self._bits):
                if b:
                    octet |= 1 << j
            self._out.append(bytes([octet]))
            self._bits = []

    def octet(self, v: int):
        self._flush_bits()
        self._out.append(struct.pack(">B", v))
        return self

    def short(self, v: int):
        self._flush_bits()
        self._out.append(struct.pack(">H", v))
        return self

    def long(self, v: int):
        self._flush_bits()
        self._out.append(struct.pack(">I", v))
        return self

    def longlong(self, v: int):
        self._flush_bits()
        self._out.append(struct.pack(">Q", v))
        return self

    def shortstr(self, s: str):
        self._flush_bits()
        b = s.encode()
        if len(b) > 255:
            raise ValueError("shortstr too long")
        self._out.append(bytes([len(b)]) + b)
        return self

    def longstr(self, b: bytes):
        self._flush_bits()
        self._out.append(struct.pack(">I", len(b)) + b)
        return self

    def bit(self, v: bool):
        self._bits.append(bool(v))
        return self

    def table(self, d: dict):
        """Field table: only the longstr ('S') value type is emitted —
        all the connectors' tables carry strings."""
        body = b""
        for k, v in d.items():
            kb = k.encode()
            vb = v if isinstance(v, bytes) else str(v).encode()
            body += bytes([len(kb)]) + kb + b"S" + struct.pack(">I", len(vb)) + vb
        return self.longstr(body)

    def done(self) -> bytes:
        self._flush_bits()
        return b"".join(self._out)

    # -- read --
    def r_octet(self) -> int:
        v = self._d[self._i]
        self._i += 1
        return v

    def r_short(self) -> int:
        v = struct.unpack(">H", self._d[self._i:self._i + 2])[0]
        self._i += 2
        return v

    def r_long(self) -> int:
        v = struct.unpack(">I", self._d[self._i:self._i + 4])[0]
        self._i += 4
        return v

    def r_longlong(self) -> int:
        v = struct.unpack(">Q", self._d[self._i:self._i + 8])[0]
        self._i += 8
        return v

    def r_shortstr(self) -> str:
        n = self.r_octet()
        v = self._d[self._i:self._i + n].decode()
        self._i += n
        return v

    def r_longstr(self) -> bytes:
        n = self.r_long()
        v = self._d[self._i:self._i + n]
        self._i += n
        return v

    def r_bits(self, n: int) -> list[bool]:
        octet = self.r_octet()
        return [bool(octet >> j & 1) for j in range(n)]

    def r_table(self) -> dict:
        raw = self.r_longstr()
        out: dict[str, Any] = {}
        i = 0
        while i < len(raw):
            kn = raw[i]
            k = raw[i + 1:i + 1 + kn].decode()
            i += 1 + kn
            tag = raw[i:i + 1]
            i += 1
            if tag == b"S":
                n = struct.unpack(">I", raw[i:i + 4])[0]
                out[k] = raw[i + 4:i + 4 + n]
                i += 4 + n
            elif tag == b"t":
                out[k] = bool(raw[i])
                i += 1
            elif tag == b"I":
                out[k] = struct.unpack(">i", raw[i:i + 4])[0]
                i += 4
            elif tag == b"l":
                out[k] = struct.unpack(">q", raw[i:i + 8])[0]
                i += 8
            elif tag == b"F":
                n = struct.unpack(">I", raw[i:i + 4])[0]
                out[k] = raw[i + 4:i + 4 + n]  # nested tables kept raw
                i += 4 + n
            else:
                raise ValueError(f"unsupported field-table value tag {tag!r}")
        return out


def encode_frame(ftype: int, channel: int, payload: bytes) -> bytes:
    return struct.pack(">BHI", ftype, channel, len(payload)) + payload + bytes([FRAME_END])


def encode_method(channel: int, class_id: int, method_id: int, args: bytes) -> bytes:
    return encode_frame(FRAME_METHOD, channel,
                        struct.pack(">HH", class_id, method_id) + args)


def encode_content(channel: int, body: bytes,
                   content_type: str = "application/octet-stream") -> bytes:
    """Content header (basic class, content-type property) + one body
    frame."""
    props = Args().shortstr(content_type).done()
    header = struct.pack(">HHQH", C_BASIC, 0, len(body), 0x8000) + props
    return (encode_frame(FRAME_HEADER, channel, header)
            + encode_frame(FRAME_BODY, channel, body))


def read_frame(recv) -> tuple[int, int, bytes]:
    hdr = recv(7)
    ftype, channel, size = struct.unpack(">BHI", hdr)
    payload = recv(size) if size else b""
    if recv(1)[0] != FRAME_END:
        raise ValueError("missing AMQP frame-end octet")
    return ftype, channel, payload


def topic_key_matches(pattern: str, key: str) -> bool:
    """Topic exchange binding match (`*` one word, `#` >= 0 words)."""
    pt, kt = pattern.split("."), key.split(".")

    def rec(pi: int, ki: int) -> bool:
        while pi < len(pt):
            p = pt[pi]
            if p == "#":
                if pi == len(pt) - 1:
                    return True
                for skip in range(len(kt) - ki + 1):
                    if rec(pi + 1, ki + skip):
                        return True
                return False
            if ki >= len(kt):
                return False
            if p != "*" and p != kt[ki]:
                return False
            pi += 1
            ki += 1
        return ki == len(kt)

    return rec(0, 0)


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class AmqpConnection:
    """One connection + one channel (the connectors' shape). Handshake
    per §2.2.4: protocol header → Start/StartOk (PLAIN) → Tune/TuneOk →
    Open/OpenOk → Channel.Open."""

    def __init__(self, url: str, user: str = "guest", password: str = "guest",
                 vhost: str = "/"):
        u = url
        for scheme in ("amqp://", "tcp://"):
            if u.startswith(scheme):
                u = u[len(scheme):]
        if "@" in u:
            creds, u = u.split("@", 1)
            user, password = creds.split(":", 1)
        u = u.split("/", 1)[0]
        host, port = u.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self._buf = b""
        self._wlock = threading.Lock()
        self._replies: dict[tuple[int, int], list] = {}
        self._reply_cv = threading.Condition()
        self._consumers: dict[str, Callable] = {}
        self._pending_deliver: Optional[dict] = None
        self._pump_started = False
        self._delivery_acks: list[int] = []

        self._sock.sendall(b"AMQP\x00\x00\x09\x01")
        # Connection.Start
        self._expect_method(C_CONNECTION, 10)
        response = b"\x00" + user.encode() + b"\x00" + password.encode()
        self._send(encode_method(0, C_CONNECTION, 11, Args()
                                 .table({"product": "benthos-spark"})
                                 .shortstr("PLAIN").longstr(response)
                                 .shortstr("en_US").done()))
        # Tune
        a = self._expect_method(C_CONNECTION, 30)
        a.r_short()
        self.frame_max = a.r_long() or (1 << 20)
        self._send(encode_method(0, C_CONNECTION, 31, Args()
                                 .short(0).long(self.frame_max).short(0).done()))
        self._send(encode_method(0, C_CONNECTION, 40, Args()
                                 .shortstr(vhost).shortstr("").bit(False).done()))
        self._expect_method(C_CONNECTION, 41)
        self._send(encode_method(1, C_CHANNEL, 10, Args().shortstr("").done()))
        self._expect_method(C_CHANNEL, 11)

    # -- plumbing --
    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("amqp connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _send(self, data: bytes) -> None:
        with self._wlock:
            self._sock.sendall(data)

    def _expect_method(self, class_id: int, method_id: int) -> Args:
        """Synchronous read until the wanted method (pre-pump only)."""
        while True:
            ftype, _ch, payload = read_frame(self._recv_exact)
            if ftype == FRAME_HEARTBEAT:
                self._send(encode_frame(FRAME_HEARTBEAT, 0, b""))
                continue
            if ftype != FRAME_METHOD:
                raise ValueError(f"unexpected frame type {ftype} awaiting method")
            c, m = struct.unpack(">HH", payload[:4])
            if (c, m) == (class_id, method_id):
                return Args(payload[4:])
            raise ValueError(f"unexpected method {c}.{m}, wanted {class_id}.{method_id}")

    def _rpc(self, class_id: int, method_id: int, args: bytes,
             reply: tuple[int, int]) -> Args:
        if not self._pump_started:
            self._send(encode_method(1, class_id, method_id, args))
            return self._expect_method(*reply)
        with self._reply_cv:
            self._send(encode_method(1, class_id, method_id, args))
            while reply not in self._replies:
                if not self._reply_cv.wait(30):
                    raise TimeoutError(f"no reply {reply}")
            return Args(self._replies.pop(reply)[0])

    # -- surface --
    def exchange_declare(self, name: str, ex_type: str = "direct") -> None:
        self._rpc(C_EXCHANGE, 10, Args().short(0).shortstr(name)
                  .shortstr(ex_type).bit(False).bit(False).bit(False)
                  .bit(False).bit(False).table({}).done(), (C_EXCHANGE, 11))

    def queue_declare(self, name: str) -> str:
        a = self._rpc(C_QUEUE, 10, Args().short(0).shortstr(name)
                      .bit(False).bit(False).bit(False).bit(False).bit(False)
                      .table({}).done(), (C_QUEUE, 11))
        return a.r_shortstr()

    def queue_bind(self, queue: str, exchange: str, routing_key: str) -> None:
        self._rpc(C_QUEUE, 20, Args().short(0).shortstr(queue)
                  .shortstr(exchange).shortstr(routing_key).bit(False)
                  .table({}).done(), (C_QUEUE, 21))

    def publish(self, exchange: str, routing_key: str, body: bytes,
                content_type: str = "application/octet-stream") -> None:
        self._send(encode_method(1, C_BASIC, 40, Args().short(0)
                                 .shortstr(exchange).shortstr(routing_key)
                                 .bit(False).bit(False).done())
                   + encode_content(1, body, content_type))

    def get(self, queue: str) -> Optional[bytes]:
        """basic.get polling read; None when the queue is empty."""
        if self._pump_started:
            raise RuntimeError("get() not supported after consume() started")
        self._send(encode_method(1, C_BASIC, 70,
                                 Args().short(0).shortstr(queue).bit(True).done()))
        ftype, _ch, payload = read_frame(self._recv_exact)
        c, m = struct.unpack(">HH", payload[:4])
        if (c, m) == (C_BASIC, 72):  # get-empty
            return None
        if (c, m) != (C_BASIC, 71):
            raise ValueError(f"unexpected method {c}.{m} for basic.get")
        # content header + body frames follow
        _t, _c, hdr = read_frame(self._recv_exact)
        body_size = struct.unpack(">Q", hdr[4:12])[0]
        body = b""
        while len(body) < body_size:
            _t2, _c2, chunk = read_frame(self._recv_exact)
            body += chunk
        return body

    def consume(self, queue: str, on_msg: Callable[[bytes, str], None]) -> str:
        """basic.consume with explicit acks: on_msg(body, routing_key)
        runs on the pump thread; the message is acked after it returns
        (at-least-once, input.go's shape)."""
        a = self._rpc(C_BASIC, 20, Args().short(0).shortstr(queue)
                      .shortstr("").bit(False).bit(False).bit(False).bit(False)
                      .table({}).done(), (C_BASIC, 21))
        tag = a.r_shortstr()
        self._consumers[tag] = on_msg
        if not self._pump_started:
            self._pump_started = True
            threading.Thread(target=self._pump, daemon=True).start()
        return tag

    def _pump(self) -> None:
        deliver: Optional[dict] = None
        body = b""
        body_size = -1
        try:
            while True:
                ftype, _ch, payload = read_frame(self._recv_exact)
                if ftype == FRAME_HEARTBEAT:
                    self._send(encode_frame(FRAME_HEARTBEAT, 0, b""))
                elif ftype == FRAME_METHOD:
                    c, m = struct.unpack(">HH", payload[:4])
                    if (c, m) == (C_BASIC, 60):  # deliver
                        a = Args(payload[4:])
                        tag = a.r_shortstr()
                        dtag = a.r_longlong()
                        a.r_bits(1)
                        a.r_shortstr()  # exchange
                        rk = a.r_shortstr()
                        deliver = {"tag": tag, "dtag": dtag, "rk": rk}
                        body, body_size = b"", -1
                    else:
                        with self._reply_cv:
                            self._replies[(c, m)] = [payload[4:]]
                            self._reply_cv.notify_all()
                elif ftype == FRAME_HEADER and deliver is not None:
                    body_size = struct.unpack(">Q", payload[4:12])[0]
                    if body_size == 0:
                        self._finish_delivery(deliver, body)
                        deliver = None
                elif ftype == FRAME_BODY and deliver is not None:
                    body += payload
                    if len(body) >= body_size:
                        self._finish_delivery(deliver, body)
                        deliver = None
        except (ConnectionError, OSError):
            return

    def _finish_delivery(self, deliver: dict, body: bytes) -> None:
        cb = self._consumers.get(deliver["tag"])
        if cb is not None:
            cb(body, deliver["rk"])
        self._send(encode_method(1, C_BASIC, 80,
                                 Args().longlong(deliver["dtag"]).bit(False).done()))

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Mini broker
# ---------------------------------------------------------------------------


class MiniAmqpBroker:
    """Loopback AMQP 0-9-1 broker: default + direct/fanout/topic
    exchanges, queue declare/bind, publish routing, basic.get and
    basic.consume push with ack bookkeeping (unacked messages are
    requeued when the consumer connection drops — the at-least-once
    contract the reference's input relies on)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._server = None
        self.address = ""
        self._lock = threading.Condition()
        self.queues: dict[str, list[tuple[str, bytes]]] = {}  # (routing_key, body)
        self.exchanges: dict[str, str] = {"": "direct"}
        self.bindings: list[tuple[str, str, str]] = []  # (exchange, key, queue)
        # queue -> list of (send_fn, consumer_tag, conn_key)
        self._consumers: dict[str, list[tuple[Callable, str, int]]] = {}
        self._unacked: dict[tuple[int, int], tuple[str, str, bytes]] = {}
        self._dtag = 0  # broker-global so (conn, dtag) can't collide

    def start(self) -> "MiniAmqpBroker":
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    outer._serve(self.request)
                except (ConnectionError, OSError, ValueError, struct.error):
                    pass
                finally:
                    outer._drop(id(self.request))

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

    def _drop(self, conn_key: int) -> None:
        with self._lock:
            for q in self._consumers:
                self._consumers[q] = [c for c in self._consumers[q] if c[2] != conn_key]
            # requeue unacked deliveries from this connection (front)
            for (ck, _dtag), (queue, rk, body) in sorted(self._unacked.items(),
                                                         reverse=True):
                if ck == conn_key:
                    self.queues.setdefault(queue, []).insert(0, (rk, body))
            self._unacked = {k: v for k, v in self._unacked.items() if k[0] != conn_key}
            self._lock.notify_all()

    def _route(self, exchange: str, key: str) -> list[str]:
        ex_type = self.exchanges.get(exchange)
        if exchange == "":
            return [key] if key in self.queues else []
        targets = []
        for ex, bkey, queue in self.bindings:
            if ex != exchange:
                continue
            if ex_type == "fanout" or \
               (ex_type == "direct" and bkey == key) or \
               (ex_type == "topic" and topic_key_matches(bkey, key)):
                targets.append(queue)
        return targets

    def _serve(self, sock: socket.socket) -> None:
        conn_key = id(sock)
        buf = b""

        def recv(n: int) -> bytes:
            nonlocal buf
            while len(buf) < n:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            out, buf = buf[:n], buf[n:]
            return out

        wlock = threading.Lock()

        def send(data: bytes) -> None:
            with wlock:
                sock.sendall(data)

        if recv(8) != b"AMQP\x00\x00\x09\x01":
            sock.sendall(b"AMQP\x00\x00\x09\x01")  # version mismatch reply
            return
        send(encode_method(0, C_CONNECTION, 10, Args()
                           .octet(0).octet(9).table({"product": "mini-amqp"})
                           .longstr(b"PLAIN").longstr(b"en_US").done()))

        pending_pub: Optional[dict] = None

        def try_deliver(queue: str) -> None:
            """Push queued messages to this queue's consumers (round
            robin across them)."""
            while self.queues.get(queue) and self._consumers.get(queue):
                rk, body = self.queues[queue].pop(0)
                csend, tag, ck = self._consumers[queue][0]
                self._consumers[queue].append(self._consumers[queue].pop(0))
                self._dtag += 1
                dtag = self._dtag
                self._unacked[(ck, dtag)] = (queue, rk, body)
                csend(encode_method(1, C_BASIC, 60, Args().shortstr(tag)
                                    .longlong(dtag).bit(False).shortstr("")
                                    .shortstr(rk).done())
                      + encode_content(1, body))

        while True:
            ftype, channel, payload = read_frame(recv)
            if ftype == FRAME_HEARTBEAT:
                send(encode_frame(FRAME_HEARTBEAT, 0, b""))
                continue
            if ftype == FRAME_HEADER and pending_pub is not None:
                pending_pub["size"] = struct.unpack(">Q", payload[4:12])[0]
                if pending_pub["size"] == 0:
                    self._publish(pending_pub, try_deliver)
                    pending_pub = None
                continue
            if ftype == FRAME_BODY and pending_pub is not None:
                pending_pub["body"] += payload
                if len(pending_pub["body"]) >= pending_pub["size"]:
                    self._publish(pending_pub, try_deliver)
                    pending_pub = None
                continue
            if ftype != FRAME_METHOD:
                continue
            c, m = struct.unpack(">HH", payload[:4])
            a = Args(payload[4:])
            if (c, m) == (C_CONNECTION, 11):      # start-ok
                send(encode_method(0, C_CONNECTION, 30, Args()
                                   .short(0).long(1 << 20).short(0).done()))
            elif (c, m) == (C_CONNECTION, 31):    # tune-ok
                pass
            elif (c, m) == (C_CONNECTION, 40):    # open
                send(encode_method(0, C_CONNECTION, 41, Args().shortstr("").done()))
            elif (c, m) == (C_CONNECTION, 50):    # close
                send(encode_method(0, C_CONNECTION, 51, b""))
                return
            elif (c, m) == (C_CHANNEL, 10):       # channel.open
                send(encode_method(channel, C_CHANNEL, 11, Args().longstr(b"").done()))
            elif (c, m) == (C_EXCHANGE, 10):      # exchange.declare
                a.r_short()
                name = a.r_shortstr()
                ex_type = a.r_shortstr()
                with self._lock:
                    self.exchanges[name] = ex_type
                send(encode_method(channel, C_EXCHANGE, 11, b""))
            elif (c, m) == (C_QUEUE, 10):         # queue.declare
                a.r_short()
                name = a.r_shortstr() or f"amq.gen-{id(sock) & 0xFFFF:x}"
                with self._lock:
                    self.queues.setdefault(name, [])
                    n = len(self.queues[name])
                send(encode_method(channel, C_QUEUE, 11, Args()
                                   .shortstr(name).long(n).long(0).done()))
            elif (c, m) == (C_QUEUE, 20):         # queue.bind
                a.r_short()
                queue = a.r_shortstr()
                exchange = a.r_shortstr()
                key = a.r_shortstr()
                with self._lock:
                    self.bindings.append((exchange, key, queue))
                send(encode_method(channel, C_QUEUE, 21, b""))
            elif (c, m) == (C_BASIC, 10):         # qos
                send(encode_method(channel, C_BASIC, 11, b""))
            elif (c, m) == (C_BASIC, 40):         # publish
                a.r_short()
                exchange = a.r_shortstr()
                key = a.r_shortstr()
                pending_pub = {"exchange": exchange, "key": key,
                               "body": b"", "size": -1}
            elif (c, m) == (C_BASIC, 20):         # consume
                a.r_short()
                queue = a.r_shortstr()
                tag = a.r_shortstr() or f"ctag-{conn_key & 0xFFFF:x}"
                send(encode_method(channel, C_BASIC, 21, Args().shortstr(tag).done()))
                with self._lock:
                    self._consumers.setdefault(queue, []).append((send, tag, conn_key))
                    try_deliver(queue)
            elif (c, m) == (C_BASIC, 70):         # get
                a.r_short()
                queue = a.r_shortstr()
                with self._lock:
                    items = self.queues.get(queue) or []
                    if not items:
                        send(encode_method(channel, C_BASIC, 72,
                                           Args().shortstr("").done()))
                    else:
                        rk, body = items.pop(0)
                        self._dtag += 1
                        send(encode_method(channel, C_BASIC, 71, Args()
                                           .longlong(self._dtag).bit(False)
                                           .shortstr("").shortstr(rk)
                                           .long(len(items)).done())
                             + encode_content(channel, body))
            elif (c, m) == (C_BASIC, 80):         # ack
                dtag = a.r_longlong()
                with self._lock:
                    self._unacked.pop((conn_key, dtag), None)

    def _publish(self, pub: dict, try_deliver) -> None:
        with self._lock:
            for queue in self._route(pub["exchange"], pub["key"]):
                self.queues.setdefault(queue, []).append((pub["key"], pub["body"]))
                try_deliver(queue)
            self._lock.notify_all()
