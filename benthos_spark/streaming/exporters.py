"""Push-metrics exporters: `statsd` and `influxdb` metrics targets
(internal/impl/statsd/metrics_statsd.go:18,
internal/impl/influxdb/metrics_influxdb.go:33) re-expressed over the
engine's StreamingQueryProgress-driven metric stream.

The reference registers these as metrics TARGETS: every component
counter/timer/gauge flows to one configured backend. Here the
per-micro-batch facts already land in
:class:`benthos_spark.streaming.metrics.MetricsListener`; these
exporters speak the two public wire formats —

- **StatsD datagrams** (``<path>:<delta>|c``, ``|ms`` timers, ``|g``
  gauges) with the reference's three tag formats: ``none`` drops tags,
  ``datadog`` appends ``|#k:v,...``, ``influxdb`` folds tags into the
  bucket name as ``path,k=v`` (metrics_statsd.go TagFormat* consts);
- **InfluxDB line protocol** batches POSTed to ``<url>/write?db=...``
  (the v1 write API the reference's client targets), one measurement
  per metric path with global ``tags`` merged over per-metric tags
  (metrics_influxdb.go:206-215) and the counter value in a ``count``
  field / gauges in ``value`` / timers in ``ns``.

``PushMetricsListener`` attaches either exporter (or both) to a
SparkSession exactly like metrics.attach: per-batch DELTAS map onto
the reference metric names (`input_received`, `output_sent`,
`processor_latency_ns`, `batch_created`). Exporters are driver-side by
nature (the reference's registries are process-local too) — the
listener thread is the only writer, so both exporters are lock-free
buffered + explicitly flushable.
"""

from __future__ import annotations

import socket
import threading
import time
import urllib.request
from typing import Any, Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

TAG_FORMAT_NONE = "none"
TAG_FORMAT_DATADOG = "datadog"
TAG_FORMAT_INFLUXDB = "influxdb"

_MAX_DATAGRAM = 1432  # go-statsd's default safe UDP payload size


def _escape_influx(s: str, *, is_measurement: bool = False) -> str:
    out = s.replace("\\", "\\\\").replace(" ", "\\ ").replace(",", "\\,")
    if not is_measurement:
        out = out.replace("=", "\\=")
    return out


class StatsdExporter:
    """UDP StatsD client (metrics_statsd.go's smira/go-statsd analog):
    counters / timings / gauges, buffered into <=1432-byte datagrams,
    flushed on ``flush_period_s`` or when the buffer fills."""

    def __init__(self, address: str, prefix: str = "benthos",
                 tag_format: str = TAG_FORMAT_NONE,
                 flush_period_s: float = 0.1):
        if tag_format not in (TAG_FORMAT_NONE, TAG_FORMAT_DATADOG, TAG_FORMAT_INFLUXDB):
            raise ValueError(f"unknown tag_format {tag_format!r}")
        host, _, port = address.rpartition(":")
        self._addr = (host or "127.0.0.1", int(port))
        self.prefix = prefix
        self.tag_format = tag_format
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._buf: list[bytes] = []
        self._buf_len = 0
        self._lock = threading.Lock()
        self._closed = threading.Event()
        self._thread = threading.Thread(
            target=self._flush_loop, args=(flush_period_s,), daemon=True)
        self._thread.start()

    # -- formatting --------------------------------------------------------
    def _line(self, path: str, value: str, kind: str,
              tags: Optional[dict] = None) -> bytes:
        name = f"{self.prefix}.{path}" if self.prefix else path
        tail = ""
        if tags and self.tag_format == TAG_FORMAT_INFLUXDB:
            name += "," + ",".join(f"{k}={v}" for k, v in sorted(tags.items()))
        elif tags and self.tag_format == TAG_FORMAT_DATADOG:
            tail = "|#" + ",".join(f"{k}:{v}" for k, v in sorted(tags.items()))
        return f"{name}:{value}|{kind}{tail}".encode()

    # -- public verbs (statsdStat.Incr/Timing/Set) ---------------------------
    def incr(self, path: str, count: int = 1, tags: Optional[dict] = None) -> None:
        self._enqueue(self._line(path, str(int(count)), "c", tags))

    def timing(self, path: str, delta_ms: float, tags: Optional[dict] = None) -> None:
        self._enqueue(self._line(path, f"{delta_ms:g}", "ms", tags))

    def gauge(self, path: str, value: float, tags: Optional[dict] = None) -> None:
        self._enqueue(self._line(path, f"{value:g}", "g", tags))

    # -- buffering -----------------------------------------------------------
    def _enqueue(self, line: bytes) -> None:
        with self._lock:
            if self._buf and self._buf_len + 1 + len(line) > _MAX_DATAGRAM:
                self._send_locked()
            self._buf.append(line)
            self._buf_len += len(line) + 1

    def _send_locked(self) -> None:
        if not self._buf:
            return
        try:
            self._sock.sendto(b"\n".join(self._buf), self._addr)
        except OSError:
            pass  # metrics are best-effort, like the reference's UDP client
        self._buf.clear()
        self._buf_len = 0

    def flush(self) -> None:
        with self._lock:
            self._send_locked()

    def _flush_loop(self, period_s: float) -> None:
        while not self._closed.wait(period_s):
            self.flush()

    def close(self) -> None:
        self._closed.set()
        self.flush()
        self._sock.close()


class InfluxDBExporter:
    """InfluxDB v1 line-protocol writer (metrics_influxdb.go:33): points
    buffer locally; ``flush`` POSTs one batch to ``{url}/write?db={db}``.
    ``tags`` are the reference's global tags, merged OVER per-point tags
    (metrics_influxdb.go:206-215: global wins)."""

    def __init__(self, url: str, db: str, prefix: str = "benthos.",
                 tags: Optional[dict] = None, timeout_s: float = 5.0):
        self.url = url.rstrip("/")
        self.db = db
        self.prefix = prefix
        self.tags = dict(tags or {})
        self.timeout_s = timeout_s
        self._points: list[str] = []
        self._lock = threading.Lock()

    def _point(self, path: str, fields: dict, tags: Optional[dict]) -> None:
        merged = dict(tags or {})
        merged.update(self.tags)
        name = _escape_influx(self.prefix + path, is_measurement=True)
        if merged:
            name += "," + ",".join(
                f"{_escape_influx(k)}={_escape_influx(str(v))}"
                for k, v in sorted(merged.items()))
        body = ",".join(
            f"{_escape_influx(k)}={v}i" if isinstance(v, int) and not isinstance(v, bool)
            else f"{_escape_influx(k)}={v}"
            for k, v in fields.items())
        ts = time.time_ns()
        with self._lock:
            self._points.append(f"{name} {body} {ts}")

    # -- public verbs ---------------------------------------------------------
    def incr(self, path: str, count: int = 1, tags: Optional[dict] = None) -> None:
        self._point(path, {"count": int(count)}, tags)

    def timing(self, path: str, delta_ms: float, tags: Optional[dict] = None) -> None:
        self._point(path, {"ns": int(delta_ms * 1e6)}, tags)

    def gauge(self, path: str, value: float, tags: Optional[dict] = None) -> None:
        self._point(path, {"value": float(value)}, tags)

    def flush(self) -> None:
        with self._lock:
            points, self._points = self._points, []
        if not points:
            return
        req = urllib.request.Request(
            f"{self.url}/write?db={self.db}&precision=ns",
            data="\n".join(points).encode(),
            headers={"Content-Type": "text/plain; charset=utf-8"},
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=self.timeout_s).read()
        except OSError:
            pass  # best-effort, matching the reference's logged-not-fatal writes

    def close(self) -> None:
        self.flush()


class PushMetricsListener(StreamingQueryListener):
    """Maps per-batch progress onto the reference metric names and pushes
    DELTAS through one or more exporters (statsd / influxdb), with the
    stream name as a tag — the reference's `label` tag analog."""

    def __init__(self, *exporters: Any):
        self.exporters = list(exporters)

    def onQueryStarted(self, event: Any) -> None:
        pass

    def onQueryProgress(self, event: Any) -> None:
        p = event.progress
        tags = {"stream": str(p.name or p.id)}
        trigger_ms = float(p.durationMs.get("triggerExecution", 0))
        for ex in self.exporters:
            ex.incr("input_received", p.numInputRows, tags)
            ex.incr("output_sent", p.numInputRows if p.sink is not None else 0, tags)
            ex.incr("batch_created", 1, tags)
            ex.timing("processor_latency_ns", trigger_ms, tags)
            wm = p.eventTime.get("watermark")
            if wm:
                ex.gauge("event_time_epoch_ms", _parse_wm_ms(wm), tags)
            ex.flush()

    def onQueryTerminated(self, event: Any) -> None:
        err = getattr(event, "exception", None)
        for ex in self.exporters:
            if err:
                ex.incr("output_error", 1)
            ex.flush()

    def onQueryIdle(self, event: Any) -> None:  # Spark 3.5+
        pass


def _parse_wm_ms(wm: str) -> float:
    import datetime as dt

    try:
        return dt.datetime.fromisoformat(wm.replace("Z", "+00:00")).timestamp() * 1000
    except ValueError:
        return 0.0


def attach_push(spark: SparkSession, *exporters: Any) -> PushMetricsListener:
    listener = PushMetricsListener(*exporters)
    spark.streams.addListener(listener)
    return listener


def detach_push(spark: SparkSession, listener: PushMetricsListener) -> None:
    spark.streams.removeListener(listener)
    for ex in listener.exporters:
        ex.close()
