"""Notification-service connectors — `pusher` output
(internal/impl/pusher/output_pusher.go), `sentry_capture` processor
(internal/impl/sentry/processor_capture.go) and `discord` input/output
(internal/impl/discord/input.go, output.go) — over their public HTTP
APIs, written from scratch with in-process loopback servers for tests.

- **pusher**: the published Channels HTTP API — POST
  ``/apps/{app_id}/events`` with events batched <=10 (the API cap) and
  the documented auth query: ``auth_key``, ``auth_timestamp``,
  ``auth_version=1.0``, ``body_md5``, and ``auth_signature`` =
  HMAC-SHA256(secret, "POST\\n{path}\\n{sorted query}"). The mini
  server VERIFIES the signature by independent recomputation.
- **sentry_capture**: the store endpoint ``/api/{project_id}/store/``
  with the ``X-Sentry-Auth`` header (sentry_version=7, sentry_key from
  the DSN); the processor is a TAP — events are captured per message
  at ``sampling_rate`` and the message passes through unchanged, like
  the reference's.
- **discord**: bot-token REST — the input polls
  ``GET /channels/{id}/messages?after={last_id}`` (the reference's
  poll_period loop; ``after`` makes message ids a replayable cursor),
  the output POSTs ``/channels/{id}/messages``."""

from __future__ import annotations

import hashlib
import hmac
import json
import threading
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.sources.readers import Source


def _http(method: str, url: str, payload: Optional[bytes] = None,
          headers: Optional[dict] = None, timeout_s: float = 30.0) -> tuple[int, bytes]:
    req = urllib.request.Request(url, data=payload,
                                 headers=headers or {}, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


# ---------------------------------------------------------------------------
# Pusher
# ---------------------------------------------------------------------------


def pusher_sign(secret: str, method: str, path: str,
                query: dict[str, str]) -> str:
    """The published Channels auth signature: HMAC-SHA256 over
    'METHOD\\npath\\nkey=value&...' with query keys sorted."""
    qs = "&".join(f"{k}={query[k]}" for k in sorted(query))
    sts = f"{method.upper()}\n{path}\n{qs}"
    return hmac.new(secret.encode(), sts.encode(), hashlib.sha256).hexdigest()


class PusherClient:
    def __init__(self, endpoint: str, app_id: str, key: str, secret: str):
        self.base = (endpoint if endpoint.startswith("http")
                     else "http://" + endpoint).rstrip("/")
        self.app_id, self.key, self.secret = app_id, key, secret

    def trigger_batch(self, events: list[dict]) -> None:
        """events: [{"name", "channel", "data"}] — <=10 per call."""
        if len(events) > 10:
            raise ValueError("pusher batch cap is 10 events")
        path = f"/apps/{self.app_id}/events"
        # the batch API triggers one event per call body; Channels also
        # has /batch_events — one body per call keeps the auth identical
        for ev in events:
            body = json.dumps({"name": ev["name"],
                               "channels": [ev["channel"]],
                               "data": ev["data"]}).encode()
            query = {"auth_key": self.key,
                     "auth_timestamp": str(int(time.time())),
                     "auth_version": "1.0",
                     "body_md5": hashlib.md5(body).hexdigest()}
            query["auth_signature"] = pusher_sign(self.secret, "POST", path, query)
            url = self.base + path + "?" + urllib.parse.urlencode(query)
            status, out = _http("POST", url, body,
                                {"Content-Type": "application/json"})
            if status != 200:
                raise IOError(f"pusher trigger: {status} {out!r}")


class PusherSink:
    """`pusher` output: events per Spark partition, <=10 per batch
    (output_pusher.go's batching cap)."""

    def __init__(self, endpoint: str, app_id: str, key: str, secret: str,
                 event: str, channel: str = "", channel_col: Optional[str] = None,
                 col: str = "value"):
        if not channel and not channel_col:
            raise ValueError("pusher output needs channel or channel_col")
        self.endpoint, self.app_id, self.key, self.secret = endpoint, app_id, key, secret
        self.event, self.channel, self.channel_col, self.col = event, channel, channel_col, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        endpoint, app_id, key, secret = self.endpoint, self.app_id, self.key, self.secret
        event, channel, channel_col, col = self.event, self.channel, self.channel_col, self.col
        cols = [col] + ([channel_col] if channel_col else [])

        def write_partition(rows):
            client = PusherClient(endpoint, app_id, key, secret)
            batch: list[dict] = []
            for row in rows:
                v = row[col]
                if isinstance(v, (bytes, bytearray)):
                    v = bytes(v).decode("utf-8", "replace")
                batch.append({"name": event,
                              "channel": (str(row[channel_col])
                                          if channel_col else channel),
                              "data": str(v)})
                if len(batch) == 10:
                    client.trigger_batch(batch)
                    batch = []
            if batch:
                client.trigger_batch(batch)

        df.select(*cols).foreachPartition(write_partition)


class MiniPusherServer:
    """Verifies each trigger's auth signature by recomputation, then
    stores events per channel."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 app_id: str = "1", key: str = "k", secret: str = "s"):
        self.host, self.port = host, port
        self.app_id, self.key, self.secret = app_id, key, secret
        self.events: dict[str, list[dict]] = {}
        self._lock = threading.Lock()

    def start(self) -> "MiniPusherServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n)
                parsed = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(parsed.query))
                sig = q.pop("auth_signature", "")
                ok = (parsed.path == f"/apps/{outer.app_id}/events"
                      and q.get("auth_key") == outer.key
                      and q.get("body_md5") == hashlib.md5(body).hexdigest()
                      and hmac.compare_digest(
                          pusher_sign(outer.secret, "POST", parsed.path, q), sig))
                if not ok:
                    self.send_response(401)
                    self.end_headers()
                    return
                doc = json.loads(body)
                with outer._lock:
                    for ch in doc["channels"]:
                        outer.events.setdefault(ch, []).append(
                            {"name": doc["name"], "data": doc["data"]})
                out = b"{}"
                self.send_response(200)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"


# ---------------------------------------------------------------------------
# Sentry
# ---------------------------------------------------------------------------


def parse_dsn(dsn: str) -> tuple[str, str, str]:
    """'http://KEY@host:port/PROJECT' -> (base_url, key, project)."""
    p = urllib.parse.urlparse(dsn)
    key = p.username or ""
    project = p.path.strip("/")
    base = f"{p.scheme}://{p.hostname}" + (f":{p.port}" if p.port else "")
    return base, key, project


class SentryCaptureProcessor:
    """`sentry_capture`: a per-message tap posting store events; the
    message content is UNCHANGED (processor_capture.go returns the
    input batch). Deterministic sampling by content hash so redelivery
    does not double-sample differently."""

    _LEVELS = ("debug", "info", "warning", "error", "fatal")

    def __init__(self, dsn: str, message_col: str = "value",
                 level: str = "info", environment: str = "",
                 release: str = "", sampling_rate: float = 1.0,
                 tags_cols: Optional[dict[str, str]] = None):
        if level.lower() not in self._LEVELS:
            raise ValueError(f"sentry level {level!r}")
        if not 0.0 <= sampling_rate <= 1.0:
            raise ValueError("sampling_rate must be within [0, 1]")
        self.dsn, self.message_col, self.level = dsn, message_col, level.lower()
        self.environment, self.release = environment, release
        self.sampling_rate = sampling_rate
        self.tags_cols = tags_cols or {}

    def __call__(self, df: DataFrame) -> DataFrame:
        dsn, col, level = self.dsn, self.message_col, self.level
        env, release, rate = self.environment, self.release, self.sampling_rate
        tags_cols = self.tags_cols
        out_schema = df.schema

        def run(batches):
            base, key, project = parse_dsn(dsn)
            url = f"{base}/api/{project}/store/"
            auth = (f"Sentry sentry_version=7, sentry_key={key}, "
                    "sentry_client=benthos-spark/1.0")
            for pdf in batches:
                for _, row in pdf.iterrows():
                    msg = str(row[col])
                    # deterministic sampling (no RNG -> redelivery-safe)
                    h = int.from_bytes(
                        hashlib.sha256(msg.encode()).digest()[:8], "big")
                    if rate < 1.0 and (h / 2**64) >= rate:
                        continue
                    event = {"message": msg, "level": level,
                             "platform": "python"}
                    if env:
                        event["environment"] = env
                    if release:
                        event["release"] = release
                    if tags_cols:
                        event["tags"] = {t: str(row[c])
                                         for t, c in sorted(tags_cols.items())}
                    status, out = _http(
                        "POST", url, json.dumps(event).encode(),
                        {"Content-Type": "application/json",
                         "X-Sentry-Auth": auth})
                    if status != 200:
                        raise IOError(f"sentry store: {status} {out!r}")
                yield pdf  # tap: batch unchanged

        return df.mapInPandas(run, out_schema)


class MiniSentryServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 key: str = "sentrykey", project: str = "42"):
        self.host, self.port, self.key, self.project = host, port, key, project
        self.events: list[dict] = []
        self._lock = threading.Lock()

    @property
    def dsn(self) -> str:
        return f"http://{self.key}@{self.host}:{self.port}/{self.project}"

    def start(self) -> "MiniSentryServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n)
                auth = self.headers.get("X-Sentry-Auth", "")
                ok = (self.path == f"/api/{outer.project}/store/"
                      and f"sentry_key={outer.key}" in auth
                      and "sentry_version=7" in auth)
                if not ok:
                    self.send_response(401)
                    self.end_headers()
                    return
                with outer._lock:
                    outer.events.append(json.loads(body))
                out = b'{"id": "1"}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


# ---------------------------------------------------------------------------
# Discord
# ---------------------------------------------------------------------------


@dataclass
class DiscordSource(Source):
    """`discord` input: poll the channel with an ``after`` message-id
    cursor (replayable — the id axis is the offset)."""

    endpoint: str = ""
    channel_id: str = ""
    bot_token: str = ""
    poll_period_s: float = 0.2
    spool_dir: str = ""
    streaming: bool = False
    _thread: object = field(default=None, repr=False)
    _stop: object = field(default=None, repr=False)

    def _poll(self, after: str) -> list[dict]:
        url = (f"{self.endpoint}/channels/{self.channel_id}/messages"
               f"?after={after}&limit=100")
        status, body = _http("GET", url, None,
                             {"Authorization": f"Bot {self.bot_token}"})
        if status != 200:
            raise IOError(f"discord poll: {status} {body!r}")
        return json.loads(body)

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            rows, after = [], "0"
            while True:
                msgs = self._poll(after)
                if not msgs:
                    break
                for m in msgs:
                    rows.append((m["content"], m["id"],
                                 m.get("author", {}).get("username", "")))
                    after = m["id"]
            return spark.createDataFrame(
                rows, "value string, message_id string, author string")
        if not self.spool_dir:
            raise ValueError("streaming discord input needs a spool_dir")
        import os

        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            spool, period = self.spool_dir, self.poll_period_s

            def loop():
                after = "0"
                while not stop.is_set():
                    msgs = self._poll(after)
                    if msgs:
                        _spool_write(spool, b"".join(
                            m["content"].replace("\n", " ").encode() + b"\n"
                            for m in msgs))
                        after = msgs[-1]["id"]
                    else:
                        time.sleep(period)

            self._stop = stop
            t = threading.Thread(target=loop, daemon=True)
            t.start()
            self._thread = t
        return (spark.readStream.format("text")
                .schema("value string").load(self.spool_dir))

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
            self._thread.join(timeout=5)


class DiscordSink:
    """`discord` output: POST /channels/{id}/messages per row."""

    def __init__(self, endpoint: str, channel_id: str, bot_token: str,
                 col: str = "value"):
        self.endpoint, self.channel_id = endpoint, channel_id
        self.bot_token, self.col = bot_token, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        endpoint, channel, token, col = (self.endpoint, self.channel_id,
                                         self.bot_token, self.col)

        def write_partition(rows):
            import urllib.request as _rq  # executor closure needs the submodule

            for row in rows:
                v = row[col]
                if isinstance(v, (bytes, bytearray)):
                    v = bytes(v).decode("utf-8", "replace")
                body = json.dumps({"content": str(v)}).encode()
                req = _rq.Request(
                    f"{endpoint}/channels/{channel}/messages", data=body,
                    headers={"Authorization": f"Bot {token}",
                             "Content-Type": "application/json"},
                    method="POST")
                with _rq.urlopen(req, timeout=30) as resp:
                    resp.read()

        df.select(col).foreachPartition(write_partition)


class MiniDiscordServer:
    """Channel message log with after-id pagination and bot auth."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 bot_token: str = "token"):
        self.host, self.port, self.bot_token = host, port, bot_token
        self.channels: dict[str, list[dict]] = {}
        self._lock = threading.Lock()
        self._seq = 0

    def post(self, channel: str, content: str, author: str = "user") -> dict:
        with self._lock:
            self._seq += 1
            m = {"id": str(self._seq), "content": content,
                 "author": {"username": author}}
            self.channels.setdefault(channel, []).append(m)
            return m

    def start(self) -> "MiniDiscordServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                return self.headers.get("Authorization") == f"Bot {outer.bot_token}"

            def do_GET(self):
                if not self._authed():
                    self._reply(401, {"message": "401: Unauthorized"})
                    return
                parsed = urllib.parse.urlparse(self.path)
                parts = parsed.path.strip("/").split("/")
                q = dict(urllib.parse.parse_qsl(parsed.query))
                if len(parts) == 3 and parts[0] == "channels" and parts[2] == "messages":
                    after = int(q.get("after", "0"))
                    limit = int(q.get("limit", "50"))
                    with outer._lock:
                        msgs = [m for m in outer.channels.get(parts[1], [])
                                if int(m["id"]) > after][:limit]
                    self._reply(200, msgs)
                    return
                self._reply(404, {"message": "404"})

            def do_POST(self):
                if not self._authed():
                    self._reply(401, {"message": "401: Unauthorized"})
                    return
                n = int(self.headers.get("Content-Length") or 0)
                doc = json.loads(self.rfile.read(n))
                parts = urllib.parse.urlparse(self.path).path.strip("/").split("/")
                if len(parts) == 3 and parts[0] == "channels" and parts[2] == "messages":
                    self._reply(200, outer.post(parts[1], doc["content"], "bot"))
                    return
                self._reply(404, {"message": "404"})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"
