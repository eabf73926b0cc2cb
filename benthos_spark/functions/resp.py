"""RESP (REdis Serialization Protocol) wire codec + an in-process
mini Redis server, both from scratch off the public protocol spec
(https://redis.io/docs/latest/develop/reference/protocol-spec/ — RESP2).

The reference's redis connector family (internal/impl/redis/client.go,
cache.go, input_list.go, output_list.go, input_pubsub.go,
output_pubsub.go, input_streams.go, output_streams.go, output_hash.go,
rate_limit.go, processor.go) talks to an external Redis over this
protocol via go-redis. This sandbox has no network and no Redis binary,
so the same wire protocol is implemented here twice over loopback TCP:

- :func:`encode_command` / :class:`RespReader` — the client side used
  by benthos_spark.operators.redis (executors open real sockets and
  speak real RESP, so the connectors work unchanged against an actual
  Redis server on a cluster);
- :class:`MiniRedisServer` — a threaded in-process server implementing
  the command subset the connector family needs (strings with expiry,
  lists with blocking pops, hashes, sets, streams, pub/sub). It exists
  so tests and local pipelines can round-trip without an external
  service; it is NOT a Redis replacement (single-node, in-RAM, no AOF).

RESP2 framing (protocol-spec):
  +OK\r\n            simple string
  -ERR msg\r\n       error
  :123\r\n           integer
  $5\r\nhello\r\n    bulk string ($-1 = null)
  *2\r\n...          array (*-1 = null array)
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time
from typing import Any, Optional

CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# Wire codec
# ---------------------------------------------------------------------------

def _as_bytes(v: Any) -> bytes:
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, bool):
        return b"1" if v else b"0"
    if isinstance(v, float) and v == int(v):
        return str(int(v)).encode()
    return str(v).encode()


def encode_command(*args: Any) -> bytes:
    """Client → server: commands are always a flat array of bulk strings."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = _as_bytes(a)
        out.append(b"$%d\r\n" % len(b))
        out.append(b)
        out.append(CRLF)
    return b"".join(out)


def encode_reply(v: Any) -> bytes:
    """Server → client: python value → RESP2 reply.

    Conventions: ``None`` → null bulk, ``int`` → integer, ``bytes`` →
    bulk string, ``list/tuple`` → array, :class:`Simple` → simple
    string, :class:`RespError` → error line.
    """
    if v is None:
        return b"$-1\r\n"
    if isinstance(v, RespError):
        return b"-" + _as_bytes(str(v)) + CRLF
    if isinstance(v, Simple):
        return b"+" + _as_bytes(v.s) + CRLF
    if isinstance(v, bool):
        return b":%d\r\n" % (1 if v else 0)
    if isinstance(v, int):
        return b":%d\r\n" % v
    if isinstance(v, (list, tuple)):
        return b"*%d\r\n" % len(v) + b"".join(encode_reply(x) for x in v)
    b = _as_bytes(v)
    return b"$%d\r\n" % len(b) + b + CRLF


class Simple:
    """Marker for a RESP simple-string reply (+OK)."""

    def __init__(self, s: str):
        self.s = s

    def __repr__(self):  # pragma: no cover
        return f"Simple({self.s!r})"

    def __eq__(self, other):
        return (isinstance(other, Simple) and other.s == self.s) or other == self.s


OK = Simple("OK")


class RespError(Exception):
    """An error reply (-ERR ...). Raised client-side, encoded server-side."""


class RespReader:
    """Incremental RESP2 parser over a socket (client or server side)."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""

    def _fill(self) -> None:
        chunk = self._sock.recv(65536)
        if not chunk:
            raise ConnectionError("connection closed")
        self._buf += chunk

    def _read_line(self) -> bytes:
        while CRLF not in self._buf:
            self._fill()
        line, self._buf = self._buf.split(CRLF, 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n + 2:]
        return out

    def read_value(self, raise_errors: bool = True) -> Any:
        """One RESP value: bulk → bytes, integer → int, simple → Simple,
        array → list, null → None, error → RespError (raised unless
        ``raise_errors=False``)."""
        line = self._read_line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return Simple(rest.decode())
        if t == b"-":
            err = RespError(rest.decode())
            if raise_errors:
                raise err
            return err
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            return None if n < 0 else self._read_exact(n)
        if t == b"*":
            n = int(rest)
            if n < 0:
                return None
            return [self.read_value(raise_errors) for _ in range(n)]
        raise RespError(f"protocol error: unexpected byte {t!r}")

    def read_command(self) -> Optional[list[bytes]]:
        """Server side: one inbound command array (inline commands are
        also accepted per spec: a bare line splits on whitespace)."""
        line = self._read_line()
        if line[:1] == b"*":
            n = int(line[1:])
            args = []
            for _ in range(n):
                hdr = self._read_line()
                if hdr[:1] != b"$":
                    raise RespError("protocol error: expected bulk string")
                args.append(self._read_exact(int(hdr[1:])))
            return args
        return line.split() or None


# ---------------------------------------------------------------------------
# Mini server
# ---------------------------------------------------------------------------


class _Store:
    """The keyspace: one lock, typed values, passive expiry.

    Types mirror Redis: str→bytes, list→list[bytes], hash→dict,
    set→set, stream→list[(ms, seq, {field: value})]. A key holds exactly
    one type (WRONGTYPE on mismatch, like Redis).
    """

    def __init__(self):
        self.lock = threading.Condition()
        self.data: dict[bytes, Any] = {}
        self.expiry: dict[bytes, float] = {}  # absolute epoch seconds
        self.stream_last: dict[bytes, tuple[int, int]] = {}

    def _expired(self, key: bytes) -> bool:
        exp = self.expiry.get(key)
        return exp is not None and time.time() >= exp

    def get(self, key: bytes, typ: type | None = None):
        if self._expired(key):
            self.data.pop(key, None)
            self.expiry.pop(key, None)
        v = self.data.get(key)
        if v is not None and typ is not None and not isinstance(v, typ):
            raise RespError("WRONGTYPE Operation against a key holding the wrong kind of value")
        return v


class _StreamVal:
    """A stream value: ordered entries [(ms, seq, {field: value}), ...].
    Deliberately NOT a list subclass so list commands raise WRONGTYPE."""

    def __init__(self):
        self.entries: list[tuple[int, int, dict]] = []

    def __len__(self):
        return len(self.entries)

    def __iter__(self):
        return iter(self.entries)

    def append(self, e):
        self.entries.append(e)


def _match_glob(pattern: bytes, s: bytes) -> bool:
    """Redis KEYS-style glob (* ? only — the subset the connectors use)."""
    import fnmatch

    return fnmatch.fnmatchcase(s.decode("utf-8", "replace"),
                               pattern.decode("utf-8", "replace"))


def _parse_stream_id(raw: bytes, store: _Store, key: bytes, for_add: bool) -> tuple[int, int]:
    """XADD/XRANGE id forms: '*', 'ms-seq', 'ms', '-', '+', '$'."""
    if raw == b"*":
        now_ms = int(time.time() * 1000)
        last = store.stream_last.get(key, (0, -1))
        if now_ms > last[0]:
            return (now_ms, 0)
        return (last[0], last[1] + 1)
    if raw == b"-":
        return (0, 0)
    if raw == b"+":
        return (2**63 - 1, 2**63 - 1)
    if raw == b"$":
        return store.stream_last.get(key, (0, 0))
    if b"-" in raw:
        ms, seq = raw.split(b"-", 1)
        if seq == b"*":
            last = store.stream_last.get(key, (0, -1))
            msi = int(ms)
            return (msi, last[1] + 1 if last[0] == msi else 0)
        return (int(ms), int(seq))
    # bare ms: XADD needs full form; ranges default seq per end
    return (int(raw), 0)


def _fmt_id(sid: tuple[int, int]) -> bytes:
    return b"%d-%d" % sid


class MiniRedisServer:
    """Threaded loopback Redis-protocol server (command subset).

    Usage::

        srv = MiniRedisServer().start()      # binds 127.0.0.1:0
        addr = srv.address                   # "127.0.0.1:PORT"
        ...
        srv.stop()
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._store = _Store()
        self._server: Optional[socketserver.ThreadingTCPServer] = None
        self.address = ""
        # channel -> list of subscriber queues; guarded by store lock
        self._subs: dict[bytes, list] = {}
        self._psubs: list[tuple[bytes, Any]] = []

    # -- lifecycle ----------------------------------------------------
    def start(self) -> "MiniRedisServer":
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                reader = RespReader(self.request)
                try:
                    outer._serve_conn(self.request, reader)
                except (ConnectionError, OSError):
                    pass

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

    # -- dispatch -----------------------------------------------------
    def _serve_conn(self, sock: socket.socket, reader: RespReader) -> None:
        sub_queue: list = []  # populated when this conn SUBSCRIBEs
        sub_cv = threading.Condition()
        sub_channels: set[bytes] = set()
        sub_patterns: set[bytes] = set()
        pump_started = [False]

        def pump():
            # subscriber mode: forward published messages as they land
            while True:
                with sub_cv:
                    while not sub_queue:
                        sub_cv.wait(0.25)
                        if self._server is None:
                            return
                    msg = sub_queue.pop(0)
                try:
                    sock.sendall(encode_reply(msg))
                except OSError:
                    return

        while True:
            args = reader.read_command()
            if not args:
                continue
            cmd = args[0].upper()
            if cmd == b"QUIT":
                sock.sendall(encode_reply(OK))
                return
            if cmd in (b"SUBSCRIBE", b"PSUBSCRIBE"):
                pats = cmd == b"PSUBSCRIBE"
                with self._store.lock:
                    for ch in args[1:]:
                        if pats:
                            sub_patterns.add(ch)
                            self._psubs.append((ch, (sub_queue, sub_cv)))
                        else:
                            sub_channels.add(ch)
                            self._subs.setdefault(ch, []).append((sub_queue, sub_cv))
                for i, ch in enumerate(args[1:]):
                    kind = b"psubscribe" if pats else b"subscribe"
                    sock.sendall(encode_reply([kind, ch, len(sub_channels) + len(sub_patterns)]))
                if not pump_started[0]:
                    pump_started[0] = True
                    threading.Thread(target=pump, daemon=True).start()
                continue
            if cmd in (b"UNSUBSCRIBE", b"PUNSUBSCRIBE"):
                with self._store.lock:
                    for ch in args[1:] or list(sub_channels):
                        sub_channels.discard(ch)
                        lst = self._subs.get(ch, [])
                        self._subs[ch] = [q for q in lst if q[0] is not sub_queue]
                sock.sendall(encode_reply([b"unsubscribe", args[1] if len(args) > 1 else None, len(sub_channels)]))
                continue
            try:
                reply = self._dispatch(cmd, args[1:])
            except RespError as e:
                reply = e
            except Exception as e:  # defensive: never kill the conn
                reply = RespError(f"ERR {e}")
            sock.sendall(encode_reply(reply))

    # -- commands -----------------------------------------------------
    def _dispatch(self, cmd: bytes, a: list[bytes]) -> Any:
        s = self._store
        with s.lock:
            handler = getattr(self, "_cmd_" + cmd.decode().lower(), None)
            if handler is None:
                raise RespError(f"ERR unknown command '{cmd.decode()}'")
            out = handler(a)
            s.lock.notify_all()
            return out

    # connection / admin
    def _cmd_ping(self, a):
        return Simple(a[0].decode()) if a else Simple("PONG")

    def _cmd_echo(self, a):
        return a[0]

    def _cmd_select(self, a):
        return OK

    def _cmd_auth(self, a):
        return OK

    def _cmd_hello(self, a):
        # RESP2 only; reply with a flat field list like HELLO v2 does
        return [b"server", b"mini-redis", b"proto", 2]

    def _cmd_client(self, a):
        return OK

    def _cmd_info(self, a):
        return b"# Server\r\nredis_version:7.0.0-mini\r\n"

    def _cmd_flushall(self, a):
        self._store.data.clear()
        self._store.expiry.clear()
        self._store.stream_last.clear()
        return OK

    def _cmd_dbsize(self, a):
        return len(self._store.data)

    def _cmd_keys(self, a):
        pat = a[0]
        return sorted(k for k in self._store.data if not self._store._expired(k)
                      and _match_glob(pat, k))

    def _cmd_type(self, a):
        v = self._store.get(a[0])
        if v is None:
            return Simple("none")
        return Simple({bytes: "string", list: "list", dict: "hash", set: "set",
                       _StreamVal: "stream"}.get(type(v), "string"))

    def _cmd_del(self, a):
        n = 0
        for k in a:
            if self._store.data.pop(k, None) is not None:
                n += 1
            self._store.expiry.pop(k, None)
        return n

    def _cmd_exists(self, a):
        return sum(1 for k in a if self._store.get(k) is not None)

    # strings
    def _cmd_set(self, a):
        key, val, opts = a[0], a[1], [x.upper() for x in a[2:]]
        s = self._store
        exists = s.get(key) is not None
        i, ttl = 0, None
        keep_args = a[2:]
        while i < len(opts):
            o = opts[i]
            if o == b"NX":
                if exists:
                    return None
            elif o == b"XX":
                if not exists:
                    return None
            elif o in (b"EX", b"PX"):
                n = int(keep_args[i + 1])
                ttl = n if o == b"EX" else n / 1000.0
                i += 1
            elif o == b"KEEPTTL":
                ttl = "keep"
            i += 1
        s.data[key] = val
        if ttl is None:
            s.expiry.pop(key, None)
        elif ttl != "keep":
            s.expiry[key] = time.time() + ttl
        return OK

    def _cmd_get(self, a):
        return self._store.get(a[0], bytes)

    def _cmd_setnx(self, a):
        if self._store.get(a[0]) is not None:
            return 0
        self._store.data[a[0]] = a[1]
        self._store.expiry.pop(a[0], None)
        return 1

    def _cmd_psetex(self, a):
        self._store.data[a[0]] = a[2]
        self._store.expiry[a[0]] = time.time() + int(a[1]) / 1000.0
        return OK

    def _cmd_setex(self, a):
        self._store.data[a[0]] = a[2]
        self._store.expiry[a[0]] = time.time() + int(a[1])
        return OK

    def _cmd_incr(self, a):
        return self._cmd_incrby([a[0], b"1"])

    def _cmd_decr(self, a):
        return self._cmd_incrby([a[0], b"-1"])

    def _cmd_incrby(self, a):
        cur = self._store.get(a[0], bytes)
        try:
            n = (int(cur) if cur is not None else 0) + int(a[1])
        except ValueError:
            raise RespError("ERR value is not an integer or out of range")
        self._store.data[a[0]] = str(n).encode()
        return n

    def _cmd_expire(self, a):
        return self._cmd_pexpire([a[0], str(int(a[1]) * 1000).encode()] + a[2:])

    def _cmd_pexpire(self, a):
        key = a[0]
        if self._store.get(key) is None:
            return 0
        nx = any(x.upper() == b"NX" for x in a[2:])
        if nx and key in self._store.expiry:
            return 0
        self._store.expiry[key] = time.time() + int(a[1]) / 1000.0
        return 1

    def _cmd_ttl(self, a):
        p = self._cmd_pttl(a)
        return p if p < 0 else (p + 999) // 1000

    def _cmd_pttl(self, a):
        if self._store.get(a[0]) is None:
            return -2
        exp = self._store.expiry.get(a[0])
        if exp is None:
            return -1
        return max(0, int((exp - time.time()) * 1000))

    # lists
    def _list(self, key: bytes, create: bool = False) -> list:
        v = self._store.get(key, list)
        if v is None and create:
            v = self._store.data[key] = []
        return v if v is not None else []

    def _cmd_lpush(self, a):
        lst = self._list(a[0], create=True)
        for v in a[1:]:
            lst.insert(0, v)
        return len(lst)

    def _cmd_rpush(self, a):
        lst = self._list(a[0], create=True)
        lst.extend(a[1:])
        return len(lst)

    def _pop(self, key: bytes, left: bool, count: Optional[int]):
        lst = self._list(key)
        if not lst:
            return None
        if count is None:
            v = lst.pop(0) if left else lst.pop()
        else:
            v = [lst.pop(0) if left else lst.pop() for _ in range(min(count, len(lst)))]
        if not lst:
            self._store.data.pop(key, None)
        return v

    def _cmd_lpop(self, a):
        return self._pop(a[0], True, int(a[1]) if len(a) > 1 else None)

    def _cmd_rpop(self, a):
        return self._pop(a[0], False, int(a[1]) if len(a) > 1 else None)

    def _blocking_pop(self, a, left: bool):
        keys, timeout = a[:-1], float(a[-1])
        deadline = None if timeout == 0 else time.time() + timeout
        s = self._store
        while True:
            for k in keys:
                v = self._pop(k, left, None)
                if v is not None:
                    return [k, v]
            remain = None if deadline is None else deadline - time.time()
            if remain is not None and remain <= 0:
                return None
            s.lock.wait(min(0.25, remain) if remain is not None else 0.25)
            if self._server is None:
                return None

    def _cmd_blpop(self, a):
        return self._blocking_pop(a, True)

    def _cmd_brpop(self, a):
        return self._blocking_pop(a, False)

    def _cmd_llen(self, a):
        return len(self._list(a[0]))

    def _cmd_lrange(self, a):
        lst = self._list(a[0])
        start, stop = int(a[1]), int(a[2])
        if stop == -1:
            return lst[start:]
        return lst[start:stop + 1]

    # hashes
    def _hash(self, key: bytes, create: bool = False) -> dict:
        v = self._store.get(key, dict)
        if v is None and create:
            v = self._store.data[key] = {}
        return v if v is not None else {}

    def _cmd_hset(self, a):
        h = self._hash(a[0], create=True)
        n = 0
        for f, v in zip(a[1::2], a[2::2]):
            n += 0 if f in h else 1
            h[f] = v
        return n

    def _cmd_hget(self, a):
        return self._hash(a[0]).get(a[1])

    def _cmd_hdel(self, a):
        h = self._hash(a[0])
        return sum(1 for f in a[1:] if h.pop(f, None) is not None)

    def _cmd_hgetall(self, a):
        out = []
        for f, v in self._hash(a[0]).items():
            out.extend([f, v])
        return out

    def _cmd_hlen(self, a):
        return len(self._hash(a[0]))

    # sets
    def _set(self, key: bytes, create: bool = False) -> set:
        v = self._store.get(key, set)
        if v is None and create:
            v = self._store.data[key] = set()
        return v if v is not None else set()

    def _cmd_sadd(self, a):
        st = self._set(a[0], create=True)
        n = 0
        for v in a[1:]:
            if v not in st:
                st.add(v)
                n += 1
        return n

    def _cmd_srem(self, a):
        st = self._set(a[0])
        n = 0
        for v in a[1:]:
            if v in st:
                st.discard(v)
                n += 1
        return n

    def _cmd_scard(self, a):
        return len(self._set(a[0]))

    def _cmd_sismember(self, a):
        return 1 if a[1] in self._set(a[0]) else 0

    def _cmd_smembers(self, a):
        return sorted(self._set(a[0]))

    # streams
    def _stream(self, key: bytes, create: bool = False) -> "_StreamVal":
        v = self._store.get(key, _StreamVal)
        if v is None and create:
            v = self._store.data[key] = _StreamVal()
        return v if v is not None else _StreamVal()

    def _cmd_xadd(self, a):
        key, raw_id = a[0], a[1]
        fields = a[2:]
        sid = _parse_stream_id(raw_id, self._store, key, for_add=True)
        last = self._store.stream_last.get(key, (0, -1))
        if sid <= last:
            raise RespError("ERR The ID specified in XADD is equal or smaller than the target stream top item")
        entries = self._stream(key, create=True)
        pairs = {f: v for f, v in zip(fields[::2], fields[1::2])}
        entries.append((sid[0], sid[1], pairs))
        self._store.stream_last[key] = sid
        return _fmt_id(sid)

    def _cmd_xlen(self, a):
        return len(self._stream(a[0]))

    @staticmethod
    def _entry_reply(e) -> list:
        flat = []
        for f, v in e[2].items():
            flat.extend([f, v])
        return [_fmt_id((e[0], e[1])), flat]

    def _cmd_xrange(self, a):
        key = a[0]
        lo = _parse_stream_id(a[1], self._store, key, for_add=False)
        hi_raw = a[2]
        hi = _parse_stream_id(hi_raw, self._store, key, for_add=False)
        if b"-" not in hi_raw and hi_raw not in (b"-", b"+", b"$"):
            hi = (hi[0], 2**63 - 1)  # bare ms end id covers the whole ms
        count = None
        if len(a) > 4 and a[3].upper() == b"COUNT":
            count = int(a[4])
        out = [self._entry_reply(e) for e in self._stream(key)
               if lo <= (e[0], e[1]) <= hi]
        return out[:count] if count else out

    def _cmd_xrevrange(self, a):
        key = a[0]
        # args are (key, end, start) — run the ascending scan WITHOUT a
        # count, reverse, then take count from the latest end
        out = self._cmd_xrange([key, a[2], a[1]])
        out.reverse()
        if len(a) > 4 and a[3].upper() == b"COUNT":
            out = out[:int(a[4])]
        return out

    def _cmd_xread(self, a):
        # XREAD [COUNT n] [BLOCK ms] STREAMS key... id...
        i, count, block_ms = 0, None, None
        while i < len(a) and a[i].upper() != b"STREAMS":
            if a[i].upper() == b"COUNT":
                count, i = int(a[i + 1]), i + 2
            elif a[i].upper() == b"BLOCK":
                block_ms, i = int(a[i + 1]), i + 2
            else:
                raise RespError("ERR syntax error")
        keys_ids = a[i + 1:]
        half = len(keys_ids) // 2
        keys, ids = keys_ids[:half], keys_ids[half:]
        deadline = None if block_ms is None else time.time() + block_ms / 1000.0

        def collect():
            out = []
            for k, raw in zip(keys, ids):
                after = _parse_stream_id(raw, self._store, k, for_add=False)
                got = [self._entry_reply(e) for e in self._stream(k)
                       if (e[0], e[1]) > after]
                if count:
                    got = got[:count]
                if got:
                    out.append([k, got])
            return out

        while True:
            out = collect()
            if out or deadline is None:
                return out or None
            remain = deadline - time.time()
            if remain <= 0:
                return None
            self._store.lock.wait(min(0.25, remain))
            if self._server is None:
                return None

    # pub/sub
    def _cmd_publish(self, a):
        ch, msg = a[0], a[1]
        n = 0
        for q, cv in self._subs.get(ch, []):
            with cv:
                q.append([b"message", ch, msg])
                cv.notify_all()
            n += 1
        for pat, (q, cv) in self._psubs:
            if _match_glob(pat, ch):
                with cv:
                    q.append([b"pmessage", pat, ch, msg])
                    cv.notify_all()
                n += 1
        return n
