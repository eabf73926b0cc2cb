"""HTTP ops API + config watcher — the reference's service surface.

- :func:`serve_api` ≙ internal/api/api.go:180-228: a driver-side HTTP
  endpoint exposing `/ping`, `/ready`, `/version`, `/endpoints`,
  `/streams` (active StreamingQuery status, ≙ internal/stream/manager),
  `/metrics` (the per-batch counters from streaming/metrics.py when a
  listener is attached), and `/debug/config/json` when a config dict is
  provided. Read-only by design — stream mutation happens through
  config reload, not POSTs (the Spark analog of the API's stream CRUD
  is a checkpointed restart, which the watcher below performs).
- :func:`run_config_watched` ≙ the CLI's `-w/--watcher` flag
  (internal/config/reader.go:209 BeginFileWatching): polls the config
  file's mtime, and on change stops the running query, recompiles, and
  restarts on the SAME checkpoint — offsets and state carry over, so a
  reload is exactly-once-safe for stateless edits (Spark's contract:
  sources/stateful-operator topology must stay compatible, the same
  restriction real Structured Streaming upgrades have).
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

VERSION = "benthos-spark/0.4.0"

_ENDPOINTS = {
    "/ping": "Ping me.",
    "/ready": "200 when every active stream is running.",
    "/version": "Returns the service version.",
    "/endpoints": "Returns this map of endpoints.",
    "/streams": "Active streaming queries with progress.",
    "/metrics": "Per-batch pipeline counters (when a metrics listener is attached).",
    "/metrics/prometheus": "The same counters in Prometheus text exposition format.",
    "/debug/config/json": "Returns the loaded config as JSON (when provided).",
}


class ApiServer:
    def __init__(self, spark, host="127.0.0.1", port=0, config: Optional[dict] = None,
                 metrics=None, streams=None):
        self.spark = spark
        self.config = config
        self.metrics = metrics
        self.streams_manager = streams
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, body, ctype="application/json"):
                data = body if isinstance(body, bytes) else json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/ping":
                    self._send(200, b"pong", "text/plain")
                elif self.path == "/version":
                    self._send(200, {"version": VERSION})
                elif self.path == "/endpoints":
                    self._send(200, _ENDPOINTS)
                elif self.path == "/ready":
                    active = outer.spark.streams.active
                    bad = [q.name or q.id for q in active if q.exception() is not None]
                    self._send(503 if bad else 200, {"ready": not bad, "failed": [str(b) for b in bad]})
                elif self.path == "/streams":
                    out = {}
                    for q in outer.spark.streams.active:
                        prog = q.lastProgress
                        out[str(q.name or q.id)] = {
                            "id": str(q.id),
                            "isActive": q.isActive,
                            "lastBatchId": prog.get("batchId") if prog else None,
                            "inputRowsPerSecond": prog.get("inputRowsPerSecond") if prog else None,
                        }
                    if outer.streams_manager is not None:
                        out["managed"] = outer.streams_manager.list()
                    self._send(200, out)
                elif self.path.startswith("/streams/") and outer.streams_manager is not None:
                    sid = self.path.split("/streams/", 1)[1]
                    want_stats = sid.endswith("/stats")
                    if want_stats:
                        sid = sid[: -len("/stats")]
                    try:
                        info = outer.streams_manager.read(sid)
                    except KeyError:
                        self._send(404, {"error": f"stream {sid!r} does not exist"})
                        return
                    if want_stats:
                        # /streams/{id}/stats (stream/manager/api.go:45):
                        # the structured metrics object for one stream
                        self._send(200, outer.streams_manager.stats(sid))
                    else:
                        self._send(200, info)
                elif self.path == "/metrics":
                    m = outer.metrics
                    if m is None:
                        self._send(200, [])
                    elif hasattr(m, "records"):
                        self._send(200, m.records())
                    else:  # a metrics_path JSONL file
                        try:
                            with open(m) as f:
                                recs = [json.loads(ln) for ln in f if ln.strip()]
                        except OSError:
                            recs = []
                        self._send(200, recs)
                elif self.path == "/metrics/prometheus":
                    # Prometheus text exposition (the reference's
                    # prometheus metrics exporter surface,
                    # internal/impl/prometheus): running totals of the
                    # reference-named counters plus per-stream gauges
                    lines = []
                    m = outer.metrics
                    totals = dict(getattr(m, "totals", {}) or {})
                    for k in sorted(totals):
                        name = f"benthos_{k}"
                        lines.append(f"# TYPE {name} counter")
                        lines.append(f"{name} {totals[k]:g}")
                    lines.append("# TYPE benthos_stream_active gauge")
                    for q in outer.spark.streams.active:
                        label = str(q.name or q.id).replace('"', "'")
                        lines.append(
                            f'benthos_stream_active{{stream="{label}"}} '
                            f"{1 if q.isActive else 0}"
                        )
                        prog = q.lastProgress
                        if prog and prog.get("inputRowsPerSecond") is not None:
                            lines.append(
                                f'benthos_input_rows_per_second{{stream="{label}"}} '
                                f"{prog['inputRowsPerSecond']:g}"
                            )
                    self._send(
                        200,
                        ("\n".join(lines) + "\n").encode(),
                        "text/plain; version=0.0.4",
                    )
                elif self.path == "/debug/config/json":
                    if outer.config is None:
                        self._send(404, {"error": "no config loaded"})
                    else:
                        self._send(200, outer.config)
                else:
                    self._send(404, {"error": f"unknown endpoint {self.path}"})

            # ---- streams-mode CRUD (stream/manager/api.go:264) ----
            def _body(self) -> str:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n).decode() if n else ""

            def _crud(self, method: str):
                mgr = outer.streams_manager
                if mgr is None or not self.path.startswith("/streams"):
                    self._send(404, {"error": f"unknown endpoint {self.path}"})
                    return
                from benthos_spark.config import ConfigError
                from benthos_spark.streaming.streams import StreamExists

                try:
                    if self.path == "/streams" and method == "POST":
                        # replace the whole set: {id: config, ...}
                        body = json.loads(self._body())
                        mgr.set_all(
                            {
                                sid: conf if isinstance(conf, str) else json.dumps(conf)
                                for sid, conf in body.items()
                            }
                        )
                        self._send(200, {"replaced": sorted(body)})
                        return
                    sid = self.path.split("/streams/", 1)[1] if "/streams/" in self.path else ""
                    if not sid:
                        self._send(400, {"error": "stream id must be set"})
                        return
                    if method == "POST":
                        mgr.create(sid, self._body())
                        self._send(200, {"created": sid})
                    elif method == "PUT":
                        mgr.update(sid, self._body())
                        self._send(200, {"updated": sid})
                    elif method == "DELETE":
                        mgr.delete(sid)
                        self._send(200, {"deleted": sid})
                    else:
                        self._send(405, {"error": f"unsupported method {method}"})
                except StreamExists as e:
                    self._send(400, {"error": str(e)})
                except KeyError:
                    self._send(404, {"error": f"stream {sid!r} does not exist"})
                except ConfigError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:
                    self._send(502, {"error": str(e)})

            def do_POST(self):
                self._crud("POST")

            def do_PUT(self):
                self._crud("PUT")

            def do_DELETE(self):
                self._crud("DELETE")

            def log_message(self, *a):
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.address = "%s:%d" % self._server.server_address[:2]
        threading.Thread(target=self._server.serve_forever, daemon=True).start()

    def stop(self):
        self._server.shutdown()
        self._server.server_close()


def serve_api(spark, host="127.0.0.1", port=0, config=None, metrics=None,
              streams=None) -> ApiServer:
    return ApiServer(spark, host=host, port=port, config=config, metrics=metrics,
                     streams=streams)


class WatchedRun:
    """Handle for a watched streaming config: `.query` is the live
    StreamingQuery (changes across reloads), `.reloads` counts restarts,
    `.stop()` ends the watcher and the query."""

    def __init__(self, spark, path: str, checkpoint: str, poll_s: float = 1.0,
                 **start_kwargs):
        from benthos_spark.config import run_config

        self.spark = spark
        self.path = path
        self.checkpoint = checkpoint
        self.poll_s = poll_s
        self.reloads = 0
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._start_kwargs = dict(start_kwargs)
        self._start_kwargs.setdefault("trigger_once", False)
        with open(path) as f:
            self._mtime = os.fstat(f.fileno()).st_mtime
            self.query = run_config(spark, f.read(), checkpoint, **self._start_kwargs)
        if self.query is None:
            raise ValueError("run_config_watched needs a streaming config")
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def _watch(self):
        from benthos_spark.config import run_config

        while not self._stop.wait(self.poll_s):
            try:
                mtime = os.path.getmtime(self.path)
            except OSError:
                continue
            if mtime == self._mtime:
                continue
            self._mtime = mtime
            with self._lock, open(self.path) as f:
                conf = f.read()
                try:
                    # Drain before stopping: an in-flight micro-batch whose
                    # output is visible but whose offsets aren't committed
                    # yet would otherwise REPLAY into the new config's sink
                    # (a different sink path keeps its own file-sink
                    # metadata log, so Spark's own dedup can't cover a
                    # cross-config restart). processAllAvailable blocks
                    # until everything readable is processed AND committed
                    # on this checkpoint; bound it so a wedged source can't
                    # hang the watcher forever.
                    drained = threading.Thread(
                        target=self.query.processAllAvailable, daemon=True
                    )
                    drained.start()
                    drained.join(60)
                    self.query.stop()
                    self.query.awaitTermination(30)
                except Exception:
                    pass
                self.query = run_config(
                    self.spark, conf, self.checkpoint, **self._start_kwargs
                )
                self.reloads += 1

    def stop(self):
        self._stop.set()
        self._thread.join(10)
        with self._lock:
            try:
                self.query.stop()
            except Exception:
                pass


def run_config_watched(spark, path: str, checkpoint: str, poll_s: float = 1.0,
                       **start_kwargs) -> WatchedRun:
    return WatchedRun(spark, path, checkpoint, poll_s=poll_s, **start_kwargs)
