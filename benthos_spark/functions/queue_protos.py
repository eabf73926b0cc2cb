"""NSQ and beanstalkd wire protocols + in-process mini servers, from
scratch off the public specs (nsq.com/clients/tcp_protocol_spec;
beanstalkd's doc/protocol.txt). The reference's connectors
(internal/impl/nsq/input.go, output.go; internal/impl/beanstalkd/
input.go, output.go) use go-nsq / go-beanstalk; here the same bytes go
over the socket directly, with loopback servers for tests.

NSQ (V2): client magic ``"  V2"``, then line commands — IDENTIFY,
SUB <topic> <channel>, RDY <n>, PUB <topic>\\n[4-byte size][body],
FIN <id>, NOP. Server frames: ``[4-byte size][4-byte frame type]
[data]`` with types 0=response, 1=error, 2=message; a message is
``8-byte ns-timestamp | 2-byte attempts | 16-byte id | body``.

beanstalkd: CRLF text — ``use <tube>``, ``put <pri> <delay> <ttr>
<bytes>\\r\\n<data>\\r\\n`` → ``INSERTED <id>``; ``watch <tube>``,
``reserve-with-timeout <s>`` → ``RESERVED <id> <bytes>\\r\\n<data>`` or
``TIMED_OUT``; ``delete <id>`` → ``DELETED``.
"""

from __future__ import annotations

import itertools
import socket
import socketserver
import struct
import threading
import time
from typing import Callable, Optional

# ---------------------------------------------------------------------------
# NSQ
# ---------------------------------------------------------------------------

NSQ_FRAME_RESPONSE, NSQ_FRAME_ERROR, NSQ_FRAME_MESSAGE = 0, 1, 2


def nsq_frame(ftype: int, data: bytes) -> bytes:
    return struct.pack(">i", len(data) + 4) + struct.pack(">i", ftype) + data


def nsq_encode_message(msg_id: bytes, body: bytes, attempts: int = 1,
                       ts_ns: int = 0) -> bytes:
    assert len(msg_id) == 16
    return struct.pack(">qH", ts_ns, attempts) + msg_id + body


class NsqConnection:
    """NSQ V2 client: PUB (awaits OK) and SUB/RDY with a pump thread
    that FINs each message after the callback returns."""

    def __init__(self, address: str):
        host, port = address.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self._wlock = threading.Lock()
        self._responses: list[bytes] = []
        self._resp_cv = threading.Condition()
        self._on_msg: Optional[Callable[[bytes], None]] = None
        self._pump_started = False
        self._sock.sendall(b"  V2")

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("nsq connection closed")
            buf += chunk
        return buf

    def _read_frame(self) -> tuple[int, bytes]:
        size = struct.unpack(">i", self._read_exact(4))[0]
        data = self._read_exact(size)
        return struct.unpack(">i", data[:4])[0], data[4:]

    def _send(self, data: bytes) -> None:
        with self._wlock:
            self._sock.sendall(data)

    def _await_response(self) -> bytes:
        if not self._pump_started:
            while True:
                ftype, data = self._read_frame()
                if ftype == NSQ_FRAME_RESPONSE:
                    if data == b"_heartbeat_":
                        self._send(b"NOP\n")
                        continue
                    return data
                if ftype == NSQ_FRAME_ERROR:
                    raise IOError(f"nsq error: {data.decode()}")
        with self._resp_cv:
            while not self._responses:
                if not self._resp_cv.wait(30):
                    raise TimeoutError("no nsq response")
            return self._responses.pop(0)

    def pub(self, topic: str, body: bytes) -> None:
        self._send(f"PUB {topic}\n".encode() + struct.pack(">I", len(body)) + body)
        resp = self._await_response()
        if resp != b"OK":
            raise IOError(f"nsq PUB failed: {resp!r}")

    def sub(self, topic: str, channel: str, on_msg: Callable[[bytes], None],
            rdy: int = 64) -> None:
        self._on_msg = on_msg
        self._send(f"SUB {topic} {channel}\n".encode())
        resp = self._await_response()
        if resp != b"OK":
            raise IOError(f"nsq SUB failed: {resp!r}")
        self._pump_started = True
        threading.Thread(target=self._pump, daemon=True).start()
        self._send(f"RDY {rdy}\n".encode())

    def _pump(self) -> None:
        try:
            while True:
                ftype, data = self._read_frame()
                if ftype == NSQ_FRAME_RESPONSE:
                    if data == b"_heartbeat_":
                        self._send(b"NOP\n")
                    else:
                        with self._resp_cv:
                            self._responses.append(data)
                            self._resp_cv.notify_all()
                elif ftype == NSQ_FRAME_MESSAGE:
                    msg_id = data[10:26]
                    body = data[26:]
                    if self._on_msg is not None:
                        self._on_msg(body)
                    self._send(b"FIN " + msg_id + b"\n")
                elif ftype == NSQ_FRAME_ERROR:
                    raise IOError(f"nsq error: {data.decode()}")
        except (ConnectionError, OSError):
            return

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class MiniNsqServer:
    """Loopback nsqd subset: topics × channels; each channel delivers a
    message to ONE subscriber (nsq's channel = queue semantics; every
    channel gets every message). UnFINished messages are requeued when
    the consumer drops."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._server = None
        self.address = ""
        self._lock = threading.Condition()
        # topic -> channel -> list[bytes]; subscribers per (topic, channel)
        self.topics: dict[str, dict[str, list[bytes]]] = {}
        self._subs: dict[tuple[str, str], list[tuple[Callable, int]]] = {}
        self._inflight: dict[bytes, tuple[str, str, bytes, int]] = {}
        self._ids = itertools.count(1)

    def start(self) -> "MiniNsqServer":
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    outer._serve(self.request)
                except (ConnectionError, OSError, ValueError):
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
            for k in self._subs:
                self._subs[k] = [s for s in self._subs[k] if s[1] != conn_key]
            for mid, (topic, channel, body, ck) in sorted(self._inflight.items()):
                if ck == conn_key:
                    self.topics[topic][channel].insert(0, body)
            self._inflight = {k: v for k, v in self._inflight.items()
                              if v[3] != conn_key}

    def _deliver(self, topic: str, channel: str) -> None:
        q = self.topics[topic][channel]
        subs = self._subs.get((topic, channel)) or []
        while q and subs:
            body = q.pop(0)
            send, ck = subs[0]
            subs.append(subs.pop(0))
            msg_id = b"%016d" % next(self._ids)
            self._inflight[msg_id] = (topic, channel, body, ck)
            send(nsq_frame(NSQ_FRAME_MESSAGE,
                           nsq_encode_message(msg_id, body,
                                              ts_ns=int(time.time() * 1e9))))

    def _serve(self, sock: socket.socket) -> None:
        conn_key = id(sock)
        buf = b""

        def recv_more():
            nonlocal buf
            chunk = sock.recv(65536)
            if not chunk:
                raise ConnectionError("closed")
            buf += chunk

        def read_line() -> bytes:
            nonlocal buf
            while b"\n" not in buf:
                recv_more()
            line, buf = buf.split(b"\n", 1)
            return line

        def read_exact(n: int) -> bytes:
            nonlocal buf
            while len(buf) < n:
                recv_more()
            out, buf = buf[:n], buf[n:]
            return out

        wlock = threading.Lock()

        def send(data: bytes) -> None:
            with wlock:
                sock.sendall(data)

        if read_exact(4) != b"  V2":
            return
        while True:
            line = read_line()
            parts = line.decode().split(" ")
            cmd = parts[0]
            if cmd == "IDENTIFY":
                n = struct.unpack(">I", read_exact(4))[0]
                read_exact(n)
                send(nsq_frame(NSQ_FRAME_RESPONSE, b"OK"))
            elif cmd == "PUB":
                topic = parts[1]
                n = struct.unpack(">I", read_exact(4))[0]
                body = read_exact(n)
                with self._lock:
                    chans = self.topics.setdefault(topic, {})
                    if not chans:
                        chans["_default_buffer"] = []  # retain pre-channel pubs
                    for ch in chans:
                        chans[ch].append(body)
                    for ch in list(chans):
                        self._deliver(topic, ch)
                send(nsq_frame(NSQ_FRAME_RESPONSE, b"OK"))
            elif cmd == "SUB":
                topic, channel = parts[1], parts[2]
                with self._lock:
                    chans = self.topics.setdefault(topic, {})
                    if channel not in chans:
                        # the FIRST channel inherits the pre-channel
                        # buffer (nsqd's topic-queue adoption); the
                        # buffer is then dropped — later channels only
                        # see new messages
                        chans[channel] = list(chans.pop("_default_buffer", []))
                    self._subs.setdefault((topic, channel), []).append((send, conn_key))
                send(nsq_frame(NSQ_FRAME_RESPONSE, b"OK"))
            elif cmd == "RDY":
                topic_chans = [(t, c) for (t, c), subs in self._subs.items()
                               if any(ck == conn_key for _s, ck in subs)]
                with self._lock:
                    for t, c in topic_chans:
                        self._deliver(t, c)
            elif cmd == "FIN":
                mid = parts[1].encode()
                with self._lock:
                    self._inflight.pop(mid, None)
            elif cmd == "NOP":
                pass
            elif cmd == "CLS":
                send(nsq_frame(NSQ_FRAME_RESPONSE, b"CLOSE_WAIT"))
                return
            else:
                send(nsq_frame(NSQ_FRAME_ERROR, b"E_INVALID"))


# ---------------------------------------------------------------------------
# beanstalkd
# ---------------------------------------------------------------------------


class BeanstalkdConnection:
    """Text-protocol client: use/put, watch/reserve-with-timeout/delete."""

    def __init__(self, address: str):
        host, port = address.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self._buf = b""
        self._lock = threading.Lock()

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("beanstalkd connection closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("beanstalkd connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n + 2:]
        return out

    def use(self, tube: str) -> None:
        with self._lock:
            self._sock.sendall(f"use {tube}\r\n".encode())
            resp = self._read_line()
        if not resp.startswith(b"USING"):
            raise IOError(f"beanstalkd use failed: {resp!r}")

    def put(self, body: bytes, pri: int = 1024, delay: int = 0, ttr: int = 60) -> int:
        with self._lock:
            self._sock.sendall(f"put {pri} {delay} {ttr} {len(body)}\r\n".encode()
                               + body + b"\r\n")
            resp = self._read_line()
        if not resp.startswith(b"INSERTED"):
            raise IOError(f"beanstalkd put failed: {resp!r}")
        return int(resp.split()[1])

    def watch(self, tube: str) -> None:
        with self._lock:
            self._sock.sendall(f"watch {tube}\r\n".encode())
            resp = self._read_line()
        if not resp.startswith(b"WATCHING"):
            raise IOError(f"beanstalkd watch failed: {resp!r}")

    def reserve(self, timeout_s: int = 0) -> Optional[tuple[int, bytes]]:
        with self._lock:
            self._sock.sendall(f"reserve-with-timeout {timeout_s}\r\n".encode())
            resp = self._read_line()
            if resp == b"TIMED_OUT":
                return None
            if not resp.startswith(b"RESERVED"):
                raise IOError(f"beanstalkd reserve failed: {resp!r}")
            _, jid, nbytes = resp.split()
            return int(jid), self._read_exact(int(nbytes))

    def delete(self, job_id: int) -> None:
        with self._lock:
            self._sock.sendall(f"delete {job_id}\r\n".encode())
            resp = self._read_line()
        if resp != b"DELETED":
            raise IOError(f"beanstalkd delete failed: {resp!r}")

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class MiniBeanstalkdServer:
    """Loopback beanstalkd subset: tubes as FIFO job queues (priority
    ordering within a put batch; delay ignored beyond validation),
    reserve-with-timeout blocking, TTR-free reserve bookkeeping with
    requeue-on-disconnect."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._server = None
        self.address = ""
        self._lock = threading.Condition()
        self.tubes: dict[str, list[tuple[int, int, bytes]]] = {}  # (pri, id, body)
        self._reserved: dict[int, tuple[str, int, bytes, int]] = {}
        self._ids = itertools.count(1)

    def start(self) -> "MiniBeanstalkdServer":
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    outer._serve(self.request)
                except (ConnectionError, OSError, ValueError):
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
            for jid, (tube, pri, body, ck) in sorted(self._reserved.items()):
                if ck == conn_key:
                    self.tubes.setdefault(tube, []).insert(0, (pri, jid, body))
            self._reserved = {k: v for k, v in self._reserved.items() if v[3] != conn_key}
            self._lock.notify_all()

    def _serve(self, sock: socket.socket) -> None:
        conn_key = id(sock)
        buf = b""

        def read_line() -> bytes:
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            line, buf = buf.split(b"\r\n", 1)
            return line

        def read_exact(n: int) -> bytes:
            nonlocal buf
            while len(buf) < n + 2:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            out, buf = buf[:n], buf[n + 2:]
            return out

        using = "default"
        watching = {"default"}
        while True:
            parts = read_line().decode().split(" ")
            cmd = parts[0]
            if cmd == "use":
                using = parts[1]
                sock.sendall(f"USING {using}\r\n".encode())
            elif cmd == "put":
                pri, _delay, _ttr, nbytes = (int(x) for x in parts[1:5])
                body = read_exact(nbytes)
                with self._lock:
                    jid = next(self._ids)
                    self.tubes.setdefault(using, []).append((pri, jid, body))
                    self.tubes[using].sort(key=lambda t: (t[0], t[1]))
                    self._lock.notify_all()
                sock.sendall(f"INSERTED {jid}\r\n".encode())
            elif cmd == "watch":
                watching.add(parts[1])
                sock.sendall(f"WATCHING {len(watching)}\r\n".encode())
            elif cmd == "ignore":
                watching.discard(parts[1])
                sock.sendall(f"WATCHING {len(watching)}\r\n".encode())
            elif cmd == "reserve-with-timeout":
                deadline = time.time() + int(parts[1])
                got = None
                with self._lock:
                    while True:
                        for tube in sorted(watching):
                            q = self.tubes.get(tube)
                            if q:
                                pri, jid, body = q.pop(0)
                                self._reserved[jid] = (tube, pri, body, conn_key)
                                got = (jid, body)
                                break
                        if got or time.time() >= deadline:
                            break
                        self._lock.wait(min(0.25, max(0.0, deadline - time.time())))
                        if self._server is None:
                            break
                if got is None:
                    sock.sendall(b"TIMED_OUT\r\n")
                else:
                    sock.sendall(f"RESERVED {got[0]} {len(got[1])}\r\n".encode()
                                 + got[1] + b"\r\n")
            elif cmd == "delete":
                jid = int(parts[1])
                with self._lock:
                    found = self._reserved.pop(jid, None)
                sock.sendall(b"DELETED\r\n" if found else b"NOT_FOUND\r\n")
            elif cmd == "quit":
                return
            else:
                sock.sendall(b"UNKNOWN_COMMAND\r\n")
