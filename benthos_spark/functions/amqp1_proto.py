"""AMQP 1.0 wire protocol — from scratch off the public OASIS AMQP
1.0 specification (docs.oasis-open.org/amqp/core/v1.0): the type
system (§1.6 primitive encodings, §1.2 described types), framing
(§2.3: 8-byte frame header ``size u32 / doff u8 / type u8 /
channel u16`` after the ``AMQP\\x00\\x01\\x00\\x00`` protocol
header), the connection/session/link performatives (§2.7: open 0x10,
begin 0x11, attach 0x12, flow 0x13, transfer 0x14, disposition 0x15,
detach 0x16, end 0x17, close 0x18) and the message format (§3.2:
data 0x75 / amqp-value 0x77 body sections, properties 0x73,
application-properties 0x74) with the accepted outcome (§3.4.2,
descriptor 0x24).

The reference's amqp_1 connectors (internal/impl/amqp1/input.go,
output.go) embed Azure/go-amqp; here the wire is written by hand, so
the connectors interoperate with any AMQP 1.0 broker (ActiveMQ
Artemis, Qpid, Azure Service Bus's AMQP surface...), while tests run
against :class:`MiniAmqp1Broker` — which speaks the same codec back
and enforces the open→begin→attach handshake and link credit."""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any, Optional

AMQP_HEADER = b"AMQP\x00\x01\x00\x00"

# performative descriptors (§2.7)
P_OPEN, P_BEGIN, P_ATTACH, P_FLOW = 0x10, 0x11, 0x12, 0x13
P_TRANSFER, P_DISPOSITION, P_DETACH, P_END, P_CLOSE = 0x14, 0x15, 0x16, 0x17, 0x18
# message sections (§3.2) / outcomes (§3.4)
S_HEADER, S_PROPERTIES, S_APP_PROPERTIES = 0x70, 0x73, 0x74
S_DATA, S_AMQP_VALUE = 0x75, 0x77
O_ACCEPTED = 0x24


class Described:
    """A described value: descriptor (ulong code) + described."""

    def __init__(self, descriptor: int, value: Any):
        self.descriptor, self.value = descriptor, value

    def __repr__(self):
        return f"Described(0x{self.descriptor:02x}, {self.value!r})"

    def __eq__(self, other):
        return (isinstance(other, Described)
                and (self.descriptor, self.value) == (other.descriptor, other.value))


class Symbol(str):
    """AMQP symbol (sym8/sym32) — distinct from str (str8/str32)."""


class Uint(int):
    """Force the uint encoding (flow/transfer count fields)."""


# ---------------------------------------------------------------------------
# §1.6 primitive encodings
# ---------------------------------------------------------------------------


def encode_value(v: Any) -> bytes:
    if isinstance(v, Described):
        return b"\x00" + encode_value(v.descriptor) + encode_value(v.value)
    if v is None:
        return b"\x40"                                   # null
    if isinstance(v, bool):
        return b"\x41" if v else b"\x42"                 # true / false
    if isinstance(v, Symbol):
        b = str(v).encode("ascii")
        if len(b) <= 255:
            return b"\xa3" + bytes([len(b)]) + b          # sym8
        return b"\xb3" + struct.pack(">I", len(b)) + b    # sym32
    if isinstance(v, Uint):
        if v == 0:
            return b"\x43"                                # uint0
        if v <= 255:
            return b"\x52" + bytes([v])                   # smalluint
        return b"\x70" + struct.pack(">I", v)             # uint
    if isinstance(v, int):
        if 0 <= v <= 255:
            return b"\x53" + bytes([v])                   # smallulong
        if v >= 0:
            return b"\x80" + struct.pack(">Q", v)         # ulong
        return b"\x81" + struct.pack(">q", v)             # long
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) <= 255:
            return b"\xa1" + bytes([len(b)]) + b          # str8-utf8
        return b"\xb1" + struct.pack(">I", len(b)) + b    # str32-utf8
    if isinstance(v, (bytes, bytearray)):
        b = bytes(v)
        if len(b) <= 255:
            return b"\xa0" + bytes([len(b)]) + b          # vbin8
        return b"\xb0" + struct.pack(">I", len(b)) + b    # vbin32
    if isinstance(v, list):
        if not v:
            return b"\x45"                                # list0
        body = b"".join(encode_value(x) for x in v)
        if len(body) + 1 <= 255 and len(v) <= 255:
            return b"\xc0" + bytes([len(body) + 1, len(v)]) + body  # list8
        return (b"\xd0" + struct.pack(">II", len(body) + 4, len(v))
                + body)                                   # list32
    if isinstance(v, dict):
        items: list[Any] = []
        for k, val in v.items():
            items.extend([k, val])
        body = b"".join(encode_value(x) for x in items)
        if len(body) + 1 <= 255 and len(items) <= 255:
            return b"\xc1" + bytes([len(body) + 1, len(items)]) + body  # map8
        return (b"\xd1" + struct.pack(">II", len(body) + 4, len(items))
                + body)                                   # map32
    raise TypeError(f"cannot encode {type(v)}")


def decode_value(buf: bytes, pos: int = 0) -> tuple[Any, int]:
    code = buf[pos]
    pos += 1
    if code == 0x00:  # described
        desc, pos = decode_value(buf, pos)
        val, pos = decode_value(buf, pos)
        return Described(desc, val), pos
    if code == 0x40:
        return None, pos
    if code == 0x41:
        return True, pos
    if code == 0x42:
        return False, pos
    if code == 0x56:  # boolean with payload
        return buf[pos] == 1, pos + 1
    if code == 0x43:
        return Uint(0), pos
    if code == 0x52:
        return Uint(buf[pos]), pos + 1
    if code == 0x70:
        return Uint(struct.unpack(">I", buf[pos:pos + 4])[0]), pos + 4
    if code == 0x50:  # ubyte
        return buf[pos], pos + 1
    if code == 0x60:  # ushort
        return struct.unpack(">H", buf[pos:pos + 2])[0], pos + 2
    if code == 0x53:
        return buf[pos], pos + 1
    if code == 0x80:
        return struct.unpack(">Q", buf[pos:pos + 8])[0], pos + 8
    if code == 0x81:
        return struct.unpack(">q", buf[pos:pos + 8])[0], pos + 8
    if code == 0x54:  # smallint
        return struct.unpack(">b", buf[pos:pos + 1])[0], pos + 1
    if code == 0x71:  # int
        return struct.unpack(">i", buf[pos:pos + 4])[0], pos + 4
    if code in (0xA1, 0xA3):
        n = buf[pos]
        s = buf[pos + 1:pos + 1 + n]
        pos += 1 + n
        return (Symbol(s.decode("ascii")) if code == 0xA3
                else s.decode("utf-8")), pos
    if code in (0xB1, 0xB3):
        n = struct.unpack(">I", buf[pos:pos + 4])[0]
        s = buf[pos + 4:pos + 4 + n]
        pos += 4 + n
        return (Symbol(s.decode("ascii")) if code == 0xB3
                else s.decode("utf-8")), pos
    if code == 0xA0:
        n = buf[pos]
        return buf[pos + 1:pos + 1 + n], pos + 1 + n
    if code == 0xB0:
        n = struct.unpack(">I", buf[pos:pos + 4])[0]
        return buf[pos + 4:pos + 4 + n], pos + 4 + n
    if code == 0x45:
        return [], pos
    if code in (0xC0, 0xC1):
        size, count = buf[pos], buf[pos + 1]
        end = pos + size
        pos += 2
        items = []
        while len(items) < count:
            item, pos = decode_value(buf, pos)
            items.append(item)
        if code == 0xC1:
            return dict(zip(items[::2], items[1::2])), end + 1
        return items, end + 1
    if code in (0xD0, 0xD1):
        size, count = struct.unpack(">II", buf[pos:pos + 8])
        end = pos + size
        pos += 8
        items = []
        while len(items) < count:
            item, pos = decode_value(buf, pos)
            items.append(item)
        if code == 0xD1:
            return dict(zip(items[::2], items[1::2])), end + 4
        return items, end + 4
    raise ValueError(f"unknown constructor 0x{code:02x} at {pos - 1}")


# ---------------------------------------------------------------------------
# §2.3 framing
# ---------------------------------------------------------------------------


def encode_frame(channel: int, performative: Described,
                 payload: bytes = b"") -> bytes:
    body = encode_value(performative) + payload
    size = 8 + len(body)
    return struct.pack(">IBBH", size, 2, 0, channel) + body


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, Optional[Described], bytes]:
    """-> (channel, performative | None for empty/keepalive, payload)."""
    size, doff, ftype, channel = struct.unpack(">IBBH", _read_exact(sock, 8))
    body = _read_exact(sock, size - 8) if size > 8 else b""
    body = body[(doff - 2) * 4:]
    if not body:
        return channel, None, b""
    perf, pos = decode_value(body)
    return channel, perf, body[pos:]


def encode_message(data: bytes, app_properties: Optional[dict] = None) -> bytes:
    out = b""
    if app_properties:
        out += encode_value(Described(S_APP_PROPERTIES, dict(app_properties)))
    out += encode_value(Described(S_DATA, data))
    return out


def decode_message(payload: bytes) -> tuple[bytes, dict]:
    """-> (body bytes, application-properties)."""
    pos, body, props = 0, b"", {}
    while pos < len(payload):
        section, pos = decode_value(payload, pos)
        if not isinstance(section, Described):
            continue
        if section.descriptor == S_DATA:
            body += section.value
        elif section.descriptor == S_AMQP_VALUE:
            v = section.value
            body += v if isinstance(v, bytes) else str(v).encode()
        elif section.descriptor == S_APP_PROPERTIES:
            props = dict(section.value)
    return body, props


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class Amqp1Connection:
    """One connection + session + one link (sender or receiver)."""

    def __init__(self, url: str, container_id: str = "benthos-spark",
                 timeout_s: float = 30.0):
        a = url
        for scheme in ("amqp://", "tcp://"):
            if a.startswith(scheme):
                a = a[len(scheme):]
        host, _, port = a.rpartition(":")
        self.sock = socket.create_connection((host or "127.0.0.1", int(port)),
                                             timeout=timeout_s)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.sock.sendall(AMQP_HEADER)
        if _read_exact(self.sock, 8) != AMQP_HEADER:
            raise ConnectionError("bad AMQP protocol header")
        self._send(P_OPEN, [container_id])
        self._expect(P_OPEN)
        # begin: [remote-channel=null, next-outgoing-id, incoming-window,
        #         outgoing-window]
        self._send(P_BEGIN, [None, Uint(0), Uint(1000), Uint(1000)])
        self._expect(P_BEGIN)
        self._delivery_id = 0
        self._credit = 0

    def _send(self, code: int, fields: list, payload: bytes = b"") -> None:
        self.sock.sendall(encode_frame(0, Described(code, fields), payload))

    def _expect(self, code: int) -> tuple[Described, bytes]:
        while True:
            _, perf, payload = read_frame(self.sock)
            if perf is None:
                continue
            if perf.descriptor == P_CLOSE:
                raise ConnectionError(f"peer closed: {perf.value}")
            if perf.descriptor == code:
                return perf, payload
            if perf.descriptor == P_FLOW and code != P_FLOW:
                f = perf.value
                self._credit += int(f[6]) if len(f) > 6 and f[6] is not None else 0
                continue
            raise ConnectionError(
                f"expected 0x{code:02x}, got 0x{perf.descriptor:02x}")

    def attach_sender(self, target_address: str, name: str = "sender-0") -> None:
        # attach: [name, handle, role(False=sender), snd-mode, rcv-mode,
        #          source, target]
        self._send(P_ATTACH, [
            name, Uint(0), False, None, None,
            Described(0x28, [None]),                 # source
            Described(0x29, [target_address]),       # target
        ])
        self._expect(P_ATTACH)
        # the broker grants credit with a flow
        while self._credit <= 0:
            _, perf, _ = read_frame(self.sock)
            if perf is not None and perf.descriptor == P_FLOW:
                f = perf.value
                self._credit += int(f[6]) if len(f) > 6 and f[6] is not None else 0

    def send(self, data: bytes, app_properties: Optional[dict] = None) -> None:
        if self._credit <= 0:
            while self._credit <= 0:
                _, perf, _ = read_frame(self.sock)
                if perf is not None and perf.descriptor == P_FLOW:
                    f = perf.value
                    self._credit += int(f[6]) if len(f) > 6 and f[6] is not None else 0
        did = self._delivery_id
        self._delivery_id += 1
        self._credit -= 1
        # transfer: [handle, delivery-id, delivery-tag, message-format,
        #            settled=False]
        self._send(P_TRANSFER,
                   [Uint(0), Uint(did), struct.pack(">I", did), Uint(0), False],
                   encode_message(data, app_properties))
        # wait for the accepted disposition (§3.4.2) — at-least-once
        while True:
            _, perf, _ = read_frame(self.sock)
            if perf is None:
                continue
            if perf.descriptor == P_FLOW:
                f = perf.value
                self._credit += int(f[6]) if len(f) > 6 and f[6] is not None else 0
                continue
            if perf.descriptor == P_DISPOSITION:
                state = perf.value[4] if len(perf.value) > 4 else None
                if not (isinstance(state, Described)
                        and state.descriptor == O_ACCEPTED):
                    raise IOError(f"delivery {did} not accepted: {state!r}")
                return
            raise ConnectionError(f"unexpected 0x{perf.descriptor:02x}")

    def attach_receiver(self, source_address: str,
                        name: str = "receiver-0", credit: int = 100) -> None:
        self._send(P_ATTACH, [
            name, Uint(0), True, None, None,
            Described(0x28, [source_address]),
            Described(0x29, [None]),
        ])
        self._expect(P_ATTACH)
        # flow: [next-incoming-id, incoming-window, next-outgoing-id,
        #        outgoing-window, handle, delivery-count, link-credit]
        self._send(P_FLOW, [Uint(0), Uint(1000), Uint(0), Uint(1000),
                            Uint(0), Uint(0), Uint(credit)])

    def receive(self, timeout_s: Optional[float] = None) -> Optional[dict]:
        if timeout_s is not None:
            self.sock.settimeout(timeout_s)
        try:
            while True:
                _, perf, payload = read_frame(self.sock)
                if perf is None:
                    continue
                if perf.descriptor == P_TRANSFER:
                    did = int(perf.value[1])
                    body, props = decode_message(payload)
                    return {"delivery_id": did, "body": body,
                            "app_properties": props}
                if perf.descriptor == P_FLOW:
                    continue
                raise ConnectionError(f"unexpected 0x{perf.descriptor:02x}")
        except socket.timeout:
            return None
        finally:
            if timeout_s is not None:
                self.sock.settimeout(30.0)

    def accept(self, delivery_id: int) -> None:
        """disposition: [role=receiver, first, last, settled, state]"""
        self._send(P_DISPOSITION, [True, Uint(delivery_id), None, True,
                                   Described(O_ACCEPTED, [])])

    def close(self) -> None:
        try:
            self._send(P_CLOSE, [])
            self.sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Mini broker
# ---------------------------------------------------------------------------


class MiniAmqp1Broker:
    """Queue-per-address broker: senders' transfers are accepted into
    the queue; receivers get transfers up to their link credit and
    their accepted dispositions settle (unsettled deliveries requeue on
    disconnect — at-least-once, the connectors' contract)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self.queues: dict[str, list[bytes]] = {}
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._stop = threading.Event()

    def start(self) -> "MiniAmqp1Broker":
        self._srv = socket.create_server((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    @property
    def url(self) -> str:
        return f"amqp://{self.host}:{self.port}"

    def stop(self) -> None:
        self._stop.set()
        with self._cond:
            self._cond.notify_all()
        self._srv.close()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._conn_loop, args=(sock,),
                             daemon=True).start()

    def _send(self, sock, code: int, fields: list, payload: bytes = b"") -> None:
        sock.sendall(encode_frame(0, Described(code, fields), payload))

    def _conn_loop(self, sock: socket.socket) -> None:
        role: Optional[str] = None
        address = ""
        unacked: dict[int, bytes] = {}
        send_lock = threading.Lock()
        out_delivery = [0]
        pump_stop = threading.Event()
        try:
            if _read_exact(sock, 8) != AMQP_HEADER:
                return
            sock.sendall(AMQP_HEADER)
            while not self._stop.is_set():
                _, perf, payload = read_frame(sock)
                if perf is None:
                    continue
                code = perf.descriptor
                if code == P_OPEN:
                    self._send(sock, P_OPEN, ["mini-amqp1-broker"])
                elif code == P_BEGIN:
                    self._send(sock, P_BEGIN, [Uint(0), Uint(0), Uint(1000),
                                               Uint(1000)])
                elif code == P_ATTACH:
                    name, handle, is_receiver = perf.value[0], perf.value[1], perf.value[2]
                    if is_receiver:  # peer receives: we are the sender side
                        role = "receiver"
                        src = perf.value[5]
                        address = src.value[0] if isinstance(src, Described) else ""
                        self._send(sock, P_ATTACH,
                                   [name, handle, False, None, None,
                                    Described(0x28, [address]),
                                    Described(0x29, [None])])
                    else:
                        role = "sender"
                        tgt = perf.value[6]
                        address = tgt.value[0] if isinstance(tgt, Described) else ""
                        with self._lock:
                            self.queues.setdefault(address, [])
                        self._send(sock, P_ATTACH,
                                   [name, handle, True, None, None,
                                    Described(0x28, [None]),
                                    Described(0x29, [address])])
                        # grant link credit
                        self._send(sock, P_FLOW,
                                   [Uint(0), Uint(1000), Uint(0), Uint(1000),
                                    Uint(0), Uint(0), Uint(500)])
                elif code == P_TRANSFER and role == "sender":
                    did = int(perf.value[1])
                    with self._cond:
                        self.queues.setdefault(address, []).append(payload)
                        self._cond.notify_all()
                    self._send(sock, P_DISPOSITION,
                               [True, Uint(did), None, True,
                                Described(O_ACCEPTED, [])])
                elif code == P_FLOW and role == "receiver":
                    credit = int(perf.value[6]) if len(perf.value) > 6 else 0

                    def pump(n=credit):
                        sent = 0
                        while sent < n and not pump_stop.is_set():
                            with self._cond:
                                while (not self.queues.get(address)
                                       and not pump_stop.is_set()
                                       and not self._stop.is_set()):
                                    self._cond.wait(0.1)
                                if pump_stop.is_set() or self._stop.is_set():
                                    return
                                payload2 = self.queues[address].pop(0)
                                did = out_delivery[0]
                                out_delivery[0] += 1
                                unacked[did] = payload2
                            with send_lock:
                                try:
                                    self._send(
                                        sock, P_TRANSFER,
                                        [Uint(0), Uint(did),
                                         struct.pack(">I", did), Uint(0),
                                         False],
                                        payload2)
                                except OSError:
                                    return
                            sent += 1

                    threading.Thread(target=pump, daemon=True).start()
                elif code == P_DISPOSITION and role == "receiver":
                    first = int(perf.value[1])
                    last = int(perf.value[2]) if perf.value[2] is not None else first
                    state = perf.value[4] if len(perf.value) > 4 else None
                    if isinstance(state, Described) and state.descriptor == O_ACCEPTED:
                        for d in range(first, last + 1):
                            unacked.pop(d, None)
                elif code in (P_DETACH, P_END):
                    pass
                elif code == P_CLOSE:
                    self._send(sock, P_CLOSE, [])
                    return
        except (ConnectionError, OSError):
            pass
        finally:
            pump_stop.set()
            if unacked:  # requeue unsettled deliveries (at-least-once)
                with self._cond:
                    q = self.queues.setdefault(address, [])
                    for d in sorted(unacked, reverse=True):
                        q.insert(0, unacked[d])
                    self._cond.notify_all()
            try:
                sock.close()
            except OSError:
                pass
