"""`gcp_pubsub` input/output (internal/impl/gcp/input_pubsub.go,
output_pubsub.go) over the public Pub/Sub REST API
(cloud.google.com/pubsub/docs/reference/rest): topics `:publish`,
subscriptions `:pull` / `:acknowledge`, subscription creation. The
reference uses the Google SDK; the REST surface is plain HTTP+JSON with
base64 payloads, so the connectors here talk to a real endpoint (or
Google's own Pub/Sub emulator — the `endpoint` field is exactly the
emulator hookup) while tests run against :class:`MiniPubSubServer`.
Auth: a bearer token field is passed through when set; the emulator
convention (no auth) is the default in this no-network sandbox.

Spark shape: pull-based delivery maps cleanly — the input pulls
batches, spools them, and ACKS ONLY AFTER the durable spool rename
(crash between pull and spool → redelivery after the ack deadline:
at-least-once, the reference's contract). The output publishes per
Spark partition in batches of ``publish_batch``."""

from __future__ import annotations

import base64
import itertools
import json
import os
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.sources.readers import Source


def _post(url: str, obj: dict, token: Optional[str] = None, timeout_s: float = 30.0) -> dict:
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return json.loads(resp.read() or b"{}")


class PubSubClient:
    """REST client for the emulator-compatible v1 surface."""

    def __init__(self, endpoint: str, project: str, token: Optional[str] = None):
        self.base = (endpoint if endpoint.startswith("http") else "http://" + endpoint).rstrip("/")
        self.project, self.token = project, token

    def create_topic(self, topic: str) -> None:
        req = urllib.request.Request(
            f"{self.base}/v1/projects/{self.project}/topics/{topic}", method="PUT",
            data=b"{}", headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=30).read()

    def create_subscription(self, sub: str, topic: str) -> None:
        req = urllib.request.Request(
            f"{self.base}/v1/projects/{self.project}/subscriptions/{sub}", method="PUT",
            data=json.dumps({"topic": f"projects/{self.project}/topics/{topic}"}).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=30).read()

    def publish(self, topic: str, messages: list[tuple[bytes, dict]]) -> list[str]:
        body = {"messages": [
            {"data": base64.b64encode(d).decode(), "attributes": attrs or {}}
            for d, attrs in messages]}
        out = _post(f"{self.base}/v1/projects/{self.project}/topics/{topic}:publish",
                    body, self.token)
        return out.get("messageIds", [])

    def pull(self, sub: str, max_messages: int = 100) -> list[dict]:
        out = _post(f"{self.base}/v1/projects/{self.project}/subscriptions/{sub}:pull",
                    {"maxMessages": max_messages}, self.token)
        return out.get("receivedMessages", [])

    def acknowledge(self, sub: str, ack_ids: list[str]) -> None:
        if ack_ids:
            _post(f"{self.base}/v1/projects/{self.project}/subscriptions/{sub}:acknowledge",
                  {"ackIds": ack_ids}, self.token)


@dataclass
class PubSubSource(Source):
    """`gcp_pubsub` input: pull from a subscription. Batch mode drains
    until an empty pull; streaming mode runs a driver pull loop spooling
    atomic files (ack after rename) consumed as a checkpointed text
    stream."""

    endpoint: str = ""
    project: str = ""
    subscription: str = ""
    spool_dir: str = ""
    streaming: bool = False
    token: Optional[str] = None
    _stop: object = field(default=None, repr=False)
    _thread: object = field(default=None, repr=False)

    def read(self, spark: SparkSession) -> DataFrame:
        client = PubSubClient(self.endpoint, self.project, self.token)
        if not self.streaming:
            rows = []
            while True:
                got = client.pull(self.subscription)
                if not got:
                    break
                client.acknowledge(self.subscription, [m["ackId"] for m in got])
                for m in got:
                    rows.append((base64.b64decode(m["message"]["data"]).decode("utf-8", "replace"),))
            return spark.createDataFrame(rows, "value string")
        if not self.spool_dir:
            raise ValueError("streaming gcp_pubsub input needs a spool_dir")
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            sub, spool = self.subscription, self.spool_dir

            def loop():
                while not stop.is_set():
                    try:
                        got = client.pull(sub)
                    except OSError:
                        time.sleep(0.3)
                        continue
                    if not got:
                        time.sleep(0.1)
                        continue
                    for m in got:
                        _spool_write(spool, base64.b64decode(m["message"]["data"])
                                     .rstrip(b"\n") + b"\n")
                    # ack AFTER the durable renames
                    client.acknowledge(sub, [m["ackId"] for m in got])

            self._stop = stop
            self._thread = threading.Thread(target=loop, daemon=True)
            self._thread.start()
        return spark.readStream.format("text").load(self.spool_dir)

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
            self._thread = None


class PubSubSink:
    """`gcp_pubsub` output: publish each row to ``topic``; optional
    attribute columns ride as message attributes."""

    def __init__(self, endpoint: str, project: str, topic: str,
                 col: str = "value", attr_cols: Sequence[str] = (),
                 publish_batch: int = 100, token: Optional[str] = None):
        self.endpoint, self.project, self.topic = endpoint, project, topic
        self.col, self.attr_cols = col, list(attr_cols)
        self.publish_batch, self.token = publish_batch, token

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        endpoint, project, topic = self.endpoint, self.project, self.topic
        col, attr_cols, nbatch, token = (self.col, self.attr_cols,
                                         self.publish_batch, self.token)
        cols = [col] + attr_cols

        def write_partition(rows):
            client = PubSubClient(endpoint, project, token)
            pending: list[tuple[bytes, dict]] = []
            for row in rows:
                v = row[col]
                data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                attrs = {a: str(row[a]) for a in attr_cols if row[a] is not None}
                pending.append((data, attrs))
                if len(pending) >= nbatch:
                    client.publish(topic, pending)
                    pending = []
            if pending:
                client.publish(topic, pending)

        df.select(*cols).foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# Emulator
# ---------------------------------------------------------------------------


class MiniPubSubServer:
    """Loopback Pub/Sub v1 REST emulator: topic/subscription creation,
    publish fan-out to every attached subscription, pull with lease
    bookkeeping (unacked messages return to the queue after
    ``ack_deadline_s`` — the redelivery contract), acknowledge."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 ack_deadline_s: float = 5.0):
        self._host, self._port = host, port
        self.ack_deadline_s = ack_deadline_s
        self._server = None
        self.address = ""
        self.endpoint = ""
        self._lock = threading.Lock()
        self.topics: dict[str, list[str]] = {}          # topic path -> sub paths
        self.queues: dict[str, list[dict]] = {}         # sub path -> messages
        self._leased: dict[str, tuple[str, dict, float]] = {}  # ackId -> (sub, msg, t)
        self._ids = itertools.count(1)

    def start(self) -> "MiniPubSubServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _reply(self, status: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(n) or b"{}")
                path = self.path.lstrip("/").removeprefix("v1/")
                with outer._lock:
                    if "/topics/" in path:
                        outer.topics.setdefault(path, [])
                        self._reply(200, {"name": path})
                    elif "/subscriptions/" in path:
                        tpath = payload["topic"]  # "projects/{p}/topics/{t}"
                        outer.topics.setdefault(tpath, [])
                        if path not in outer.topics[tpath]:
                            outer.topics[tpath].append(path)
                        outer.queues.setdefault(path, [])
                        self._reply(200, {"name": path, "topic": tpath})
                    else:
                        self._reply(404, {"error": "unknown resource"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(n) or b"{}")
                path = self.path.lstrip("/").removeprefix("v1/")
                if path.endswith(":publish"):
                    tpath = path[:-len(":publish")]
                    ids = []
                    with outer._lock:
                        subs = outer.topics.setdefault(tpath, [])
                        for m in payload.get("messages", []):
                            mid = str(next(outer._ids))
                            ids.append(mid)
                            msg = {"data": m.get("data", ""), "messageId": mid,
                                   "attributes": m.get("attributes", {})}
                            for s in subs:
                                outer.queues.setdefault(s, []).append(dict(msg))
                    self._reply(200, {"messageIds": ids})
                    return
                if path.endswith(":pull"):
                    spath = path[:-len(":pull")]
                    maxn = int(payload.get("maxMessages", 100))
                    now = time.time()
                    with outer._lock:
                        # expire stale leases back to the queue first
                        for ack_id, (s, msg, t) in list(outer._leased.items()):
                            if now - t > outer.ack_deadline_s:
                                outer.queues.setdefault(s, []).insert(0, msg)
                                del outer._leased[ack_id]
                        q = outer.queues.setdefault(spath, [])
                        got = []
                        while q and len(got) < maxn:
                            msg = q.pop(0)
                            ack_id = f"ack-{next(outer._ids)}"
                            outer._leased[ack_id] = (spath, msg, now)
                            got.append({"ackId": ack_id, "message": msg})
                    self._reply(200, {"receivedMessages": got})
                    return
                if path.endswith(":acknowledge"):
                    with outer._lock:
                        for ack_id in payload.get("ackIds", []):
                            outer._leased.pop(ack_id, None)
                    self._reply(200, {})
                    return
                self._reply(404, {"error": "unknown endpoint"})

        class Server(ThreadingHTTPServer):
            daemon_threads = True

        self._server = Server((self._host, self._port), Handler)
        self.address = "%s:%d" % self._server.server_address[:2]
        self.endpoint = "http://" + self.address
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
