"""statsd / influxdb push-metrics exporters
(internal/impl/statsd/metrics_statsd.go,
internal/impl/influxdb/metrics_influxdb.go) — wire-format units over
capture servers plus a streaming end-to-end through the config path."""

from __future__ import annotations

import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from benthos_spark.streaming.exporters import (InfluxDBExporter,
                                               PushMetricsListener,
                                               StatsdExporter, attach_push,
                                               detach_push)


@pytest.fixture()
def udp_capture():
    """UDP listener collecting every datagram's lines."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(0.2)
    lines: list[str] = []
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            try:
                data, _ = sock.recvfrom(65536)
            except socket.timeout:
                continue
            lines.extend(data.decode().split("\n"))

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    yield sock.getsockname(), lines
    stop.set()
    t.join()
    sock.close()


def _wait_for(pred, timeout_s=10.0):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_statsd_counter_timer_gauge_formats(udp_capture):
    (host, port), lines = udp_capture
    ex = StatsdExporter(f"{host}:{port}", prefix="benthos")
    ex.incr("input_received", 5)
    ex.timing("processor_latency_ns", 12.5)
    ex.gauge("state_rows", 42)
    ex.flush()
    assert _wait_for(lambda: len(lines) >= 3)
    assert "benthos.input_received:5|c" in lines
    assert "benthos.processor_latency_ns:12.5|ms" in lines
    assert "benthos.state_rows:42|g" in lines
    ex.close()


def test_statsd_tag_formats(udp_capture):
    (host, port), lines = udp_capture
    tags = {"stream": "s1", "env": "dev"}
    dd = StatsdExporter(f"{host}:{port}", tag_format="datadog")
    dd.incr("c", 1, tags)
    dd.flush()
    infl = StatsdExporter(f"{host}:{port}", tag_format="influxdb")
    infl.incr("c", 1, tags)
    infl.flush()
    none = StatsdExporter(f"{host}:{port}", tag_format="none")
    none.incr("c", 1, tags)
    none.flush()
    assert _wait_for(lambda: len(lines) >= 3)
    assert "benthos.c:1|c|#env:dev,stream:s1" in lines
    assert "benthos.c,env=dev,stream=s1:1|c" in lines
    assert "benthos.c:1|c" in lines
    for ex in (dd, infl, none):
        ex.close()


def test_statsd_buffers_respect_datagram_size(udp_capture):
    (host, port), lines = udp_capture
    ex = StatsdExporter(f"{host}:{port}", flush_period_s=60)
    for i in range(200):
        ex.incr(f"some.rather.long.metric.path.{i:04d}", i)
    ex.flush()
    assert _wait_for(lambda: sum(1 for ln in lines if ln) >= 200)
    assert sorted(ln for ln in lines if ln.endswith(":199|c"))
    ex.close()


@pytest.fixture()
def influx_server():
    """Captures /write query strings + line-protocol bodies."""
    writes = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            writes.append((self.path, self.rfile.read(n).decode()))
            self.send_response(204)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    srv.writes = writes
    yield srv
    srv.shutdown()
    srv.server_close()


def test_influxdb_line_protocol(influx_server):
    port = influx_server.server_address[1]
    ex = InfluxDBExporter(f"http://127.0.0.1:{port}", db="telemetry",
                          tags={"env": "dev"})
    ex.incr("input_received", 7, {"stream": "s1", "env": "ignored"})
    ex.gauge("state_rows", 3.5)
    ex.timing("processor_latency_ns", 2.0)
    ex.flush()
    assert len(influx_server.writes) == 1
    path, body = influx_server.writes[0]
    assert path.startswith("/write?db=telemetry")
    lines = body.split("\n")
    assert len(lines) == 3
    # global tag wins over the per-point value (metrics_influxdb.go:206-215)
    assert lines[0].startswith("benthos.input_received,env=dev,stream=s1 count=7i ")
    assert lines[1].startswith("benthos.state_rows,env=dev value=3.5 ")
    assert lines[2].startswith("benthos.processor_latency_ns,env=dev ns=2000000i ")
    # flush drains — second flush posts nothing
    ex.flush()
    assert len(influx_server.writes) == 1
    ex.close()


def test_influxdb_escaping(influx_server):
    port = influx_server.server_address[1]
    ex = InfluxDBExporter(f"http://127.0.0.1:{port}", db="db", prefix="")
    ex.incr("weird path,x", 1, {"k 1": "v=2"})
    ex.flush()
    _, body = influx_server.writes[0]
    assert body.startswith("weird\\ path\\,x,k\\ 1=v\\=2 count=1i ")
    ex.close()


def test_push_listener_streaming_end_to_end(spark, tmp_path, udp_capture, influx_server):
    from benthos_spark.datagen.clips import CLIPS_SCHEMA, generate_clips
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
    from benthos_spark.sources.readers import ParquetSource
    from benthos_spark.streaming.pipeline import Pipeline, run_to_completion

    (host, port), lines = udp_capture
    iport = influx_server.server_address[1]
    src = str(tmp_path / "src")
    generate_clips(spark, 60, partitions=2).write.mode("overwrite").parquet(src)

    statsd = StatsdExporter(f"{host}:{port}")
    influx = InfluxDBExporter(f"http://127.0.0.1:{iport}", db="m")
    listener = attach_push(spark, statsd, influx)
    try:
        pipe = Pipeline(source=ParquetSource(src, streaming=True, schema=CLIPS_SCHEMA), processors=[])
        q = pipe.start(spark, ExactlyOnceParquetSink(str(tmp_path / "out")),
                       checkpoint=str(tmp_path / "ckpt"), trigger_once=True)
        run_to_completion(q, timeout_s=300)
        assert _wait_for(lambda: any("input_received:60|c" in ln for ln in lines), 30)
        assert _wait_for(lambda: any("count=60i" in b for _, b in influx_server.writes), 30)
    finally:
        detach_push(spark, listener)
    # stream label rides as a tag only in tagged formats — none drops it
    assert all("|#" not in ln for ln in lines)


def test_metrics_config_section_statsd(spark, tmp_path, udp_capture):
    """Top-level `metrics: {statsd: ...}` attaches the push listener
    through run_config (the reference's metrics target config)."""
    from benthos_spark.config import run_config
    from benthos_spark.datagen.clips import generate_clips

    (host, port), lines = udp_capture
    src = str(tmp_path / "src")
    generate_clips(spark, 30, partitions=1).write.mode("overwrite").parquet(src)
    conf = f"""
input:
  parquet: {{path: {src}, streaming: true}}
output:
  exactly_once: {{dir: {tmp_path / "out"}}}
metrics:
  statsd: {{address: "{host}:{port}", prefix: bsk}}
"""
    from benthos_spark.streaming.pipeline import run_to_completion

    q = run_config(spark, conf, checkpoint=str(tmp_path / "ckpt"), trigger_once=True)
    run_to_completion(q, timeout_s=300)
    assert _wait_for(lambda: any("bsk.input_received:30|c" in ln for ln in lines), 30)
