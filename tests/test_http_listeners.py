"""`http` processor (operators/http.py) and the listener inputs
`socket_server` / `http_server` (sources/listeners.py), exercised
against in-process localhost servers — the same strategy the reference
uses (httptest servers in httpclient/client_test.go)."""

from __future__ import annotations

import json
import socket
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from benthos_spark.operators.http import Http
from benthos_spark.sources.listeners import HttpServerSource, SocketServerSource


@pytest.fixture()
def echo_http():
    """Localhost server: POST /echo upper-cases the body; /status/<n>
    returns that code; /flaky fails twice then succeeds."""
    flaky_state = {"n": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if self.path == "/echo":
                out = body.upper()
                self.send_response(200)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            elif self.path.startswith("/status/"):
                code = int(self.path.rsplit("/", 1)[1])
                self.send_response(code)
                self.end_headers()
            elif self.path == "/flaky":
                flaky_state["n"] += 1
                if flaky_state["n"] <= 2:
                    self.send_response(503)
                    self.end_headers()
                else:
                    self.send_response(200)
                    self.send_header("Content-Length", "2")
                    self.end_headers()
                    self.wfile.write(b"ok")
            elif self.path == "/hdr":
                v = self.headers.get("X-Doc-Id", "?").encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(v)))
                self.end_headers()
                self.wfile.write(v)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def test_http_processor_replaces_body(spark, echo_http):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], "i int, value string")
    out = {r.i: r for r in Http(url=echo_http + "/echo")(df).collect()}
    assert out[1].value == "HELLO" and out[1]._error is None
    assert out[2].value == "WORLD"
    assert out[1].http_status_code == 200


def test_http_processor_4xx_fails_fast(spark, echo_http):
    df = spark.createDataFrame([(1, "x")], "i int, value string")
    r = Http(url=echo_http + "/status/404", retries=3)(df).collect()[0]
    assert r.value == "x" and "404" in r._error and r.http_status_code == 404
    # successful_on whitelists it
    r2 = Http(url=echo_http + "/status/404", successful_on=(404,))(df).collect()[0]
    assert r2._error is None


def test_http_processor_retries_5xx(spark, echo_http):
    df = spark.createDataFrame([(1, "x")], "i int, value string")
    r = Http(url=echo_http + "/flaky", retries=3, backoff_ms=10)(df).collect()[0]
    assert r.value == "ok" and r._error is None


def test_http_processor_interpolated_url_and_headers(spark, echo_http):
    docs = [{"id": "d1", "ep": "hdr"}, {"id": "d2", "ep": "hdr"}]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i int, value string"
    )
    p = Http(
        url=echo_http + "/${! this.ep }",
        headers={"X-Doc-Id": "${! this.id }", "Content-Type": "application/json"},
    )
    rows = {r.i: r.value for r in p(df).collect()}
    assert rows == {0: "d1", 1: "d2"}


def test_http_processor_parallel(spark, echo_http):
    df = spark.createDataFrame([(i, f"m{i}") for i in range(20)], "i int, value string")
    out = Http(url=echo_http + "/echo", parallel=True, parallel_n=8)(df)
    rows = {r.i: r.value for r in out.collect()}
    assert rows == {i: f"M{i}" for i in range(20)}


def test_http_processor_connection_refused(spark):
    df = spark.createDataFrame([(1, "x")], "i int, value string")
    r = Http(url="http://127.0.0.1:9/none", retries=0, timeout_s=2)(df).collect()[0]
    assert r.value == "x" and "request error" in r._error
    with pytest.raises(ValueError):
        Http()


def test_socket_server_source(spark, tmp_path):
    src = SocketServerSource(spool_dir=str(tmp_path / "spool"), streaming=False).start()
    host, port = src.address.rsplit(":", 1)
    with socket.create_connection((host, int(port))) as c:
        c.sendall(b"l1\nl2\n")
    with socket.create_connection((host, int(port))) as c:
        c.sendall(b"l3")  # no trailing newline: flushed on close
    import time

    deadline = time.time() + 10
    rows = []
    while time.time() < deadline:
        rows = sorted(r.value for r in src.read(spark).collect())
        if len(rows) == 3:
            break
        time.sleep(0.2)
    assert rows == ["l1", "l2", "l3"]
    src.stop()
    with pytest.raises(ValueError):
        SocketServerSource(spool_dir="")


def test_http_server_source_streaming(spark, tmp_path):
    src = HttpServerSource(spool_dir=str(tmp_path / "spool")).start()
    for body in (b'{"a":1}', b'{"a":2}'):
        req = urllib.request.Request(f"http://{src.address}/post", data=body, method="POST")
        assert urllib.request.urlopen(req).status == 200
    # wrong path → 404; GET → 405
    bad = urllib.request.Request(f"http://{src.address}/nope", data=b"x", method="POST")
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(bad)
    # consume the spool as a bounded stream (availableNow over text files)
    df = src.read(spark)
    assert df.isStreaming
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = df.writeStream.format("parquet").option("path", out_dir).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(60)
    rows = sorted(r.value for r in spark.read.parquet(out_dir).collect())
    assert rows == ['{"a":1}', '{"a":2}']
    src.stop()


@pytest.fixture()
def collector_http():
    """Localhost server that records every POST body and serves a feed
    on GET /feed."""
    state = {"bodies": []}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            state["bodies"].append(self.rfile.read(n))
            self.send_response(200)
            self.end_headers()

        def do_GET(self):
            if self.path == "/feed":
                out = b"f1\nf2\nf3\n"
                self.send_response(200)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()
    srv.server_close()


def test_http_client_source(spark, collector_http):
    from benthos_spark.operators.http import HttpClientSource

    url, _ = collector_http
    rows = sorted(
        r.value
        for r in HttpClientSource(url=url + "/feed", codec="lines").read(spark).collect()
    )
    assert rows == ["f1", "f2", "f3"]
    whole = HttpClientSource(url=url + "/feed").read(spark).collect()
    assert len(whole) == 1 and whole[0].value == "f1\nf2\nf3\n"
    with pytest.raises(ValueError):
        HttpClientSource()


def test_http_client_sink(spark, collector_http):
    from benthos_spark.operators.http import HttpClientSink

    url, state = collector_http
    df = spark.createDataFrame([("b1",), ("b2",), ("b3",)], "value string")
    HttpClientSink(url=url + "/ingest")(df, batch_id=0)
    assert sorted(state["bodies"]) == [b"b1", b"b2", b"b3"]
    # unreachable server fails the batch (at-least-once: runner retries)
    bad = HttpClientSink(url="http://127.0.0.1:9/x", retries=0, timeout_s=2)
    with pytest.raises(Exception):
        bad(df, batch_id=1)


def test_config_wiring(spark, tmp_path, echo_http):
    from benthos_spark.config import _input, _proc

    df = spark.createDataFrame([(1, "hey")], "i int, value string")
    p = _proc({"http": {"url": echo_http + "/echo"}})
    assert p(df).collect()[0].value == "HEY"
    src = _input({"socket_server": {"spool_dir": str(tmp_path / "s"), "streaming": False}})
    assert src.read(spark).columns == ["value"]
    src.stop()
    h = _input({"http_server": {"spool_dir": str(tmp_path / "h")}})
    assert h.read(spark).isStreaming
    h.stop()
    from benthos_spark.config import _output

    c = _input({"http_client": {"url": echo_http + "/echo", "verb": "POST", "payload": "ping"}})
    assert c.read(spark).collect()[0].value == "PING"
    snk = _output({"http_client": {"url": echo_http + "/echo"}})
    snk(df, 0)  # must not raise


# -- sync request/reply (http_server input + sync_response output) ----------


def test_sync_response_store_basics():
    from benthos_spark.sources.listeners import SyncResponseStore

    store = SyncResponseStore()
    store.register("r1")
    assert store.set_result("r1", [b"hi"]) is True
    assert store.wait("r1", 1.0) == ([b"hi"], 200)
    # unregistered id: dropped without penalty (the reference contract)
    assert store.set_result("ghost", [b"x"]) is False
    # wait with no result: None after timeout, entry cleaned up
    store.register("r2")
    assert store.wait("r2", 0.05) is None
    assert store.set_result("r2", [b"late"]) is False


def test_sync_response_sink_groups_parts_and_drops_unkeyed(spark):
    from benthos_spark.sinks.http_server import SyncResponseSink
    from benthos_spark.sources.listeners import SYNC_META_KEY, SyncResponseStore

    store = SyncResponseStore()
    store.register("a")
    df = spark.createDataFrame(
        [("p1", {SYNC_META_KEY: "a"}),
         ("p2", {SYNC_META_KEY: "a"}),
         ("orphan", {}),                       # no id: dropped silently
         ("other", {SYNC_META_KEY: "nobody"})  # unregistered: dropped
         ],
        "value string, _meta map<string,string>")
    SyncResponseSink(store=store)(df, 0)
    parts, status = store.wait("a", 1.0)
    assert sorted(parts) == [b"p1", b"p2"] and status == 200


def test_sync_response_sink_row_guard(spark):
    from benthos_spark.sinks.http_server import SyncResponseSink
    from benthos_spark.sources.listeners import SyncResponseStore

    df = spark.range(50).selectExpr(
        "cast(id as string) as value",
        "map('http_server_request_id', 'x') as _meta")
    with pytest.raises(RuntimeError, match="connection-scale"):
        SyncResponseSink(store=SyncResponseStore(), max_rows=10)(df, 0)


def test_http_server_sync_timeout(tmp_path):
    src = HttpServerSource(spool_dir=str(tmp_path / "sp"), sync_response=True,
                           sync_timeout_s=0.3).start()
    req = urllib.request.Request(
        f"http://{src.address}/post", data=b"ping", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 408
    src.stop()


def test_http_server_sync_roundtrip_streaming(spark, tmp_path):
    """Full request/reply: POST → spool → streaming pipeline (uppercase)
    → sync_response sink → the POST's response body is the processed
    payload (the reference's sync-responses guide example)."""
    from pyspark.sql import functions as F

    from benthos_spark.sinks.http_server import SyncResponseSink
    from benthos_spark.sources.listeners import SyncResponseStore
    from benthos_spark.streaming.pipeline import Pipeline

    store = SyncResponseStore()
    src = HttpServerSource(spool_dir=str(tmp_path / "sp"), sync_response=True,
                           sync_timeout_s=60.0, store=store).start()
    pipe = Pipeline(source=src,
                    processors=[lambda df: df.withColumn("value", F.upper("value"))])
    q = pipe.start(spark, SyncResponseSink(store=store),
                   checkpoint=str(tmp_path / "ckpt"),
                   processing_time="100 milliseconds")
    try:
        req = urllib.request.Request(
            f"http://{src.address}/post", data=b"hello world", method="POST")
        resp = urllib.request.urlopen(req, timeout=60)
        assert resp.status == 200
        assert resp.read() == b"HELLO WORLD"
    finally:
        q.stop()
        src.stop()


# -- http_server output ------------------------------------------------------


def test_http_server_sink_get_pops_messages(spark):
    from benthos_spark.sinks.http_server import HttpServerSink

    sink = HttpServerSink(timeout_s=0.3).start()
    df = spark.createDataFrame([("m1",), ("m2",)], "value string")
    sink(df, 0)
    url = f"http://{sink.address}/get"
    got = {urllib.request.urlopen(url).read() for _ in range(2)}
    assert got == {b"m1", b"m2"}
    # empty queue → 408 after timeout (getHandler, output_http_server.go:308)
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(url)
    assert ei.value.code == 408
    # POST is not an allowed verb → 405
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(urllib.request.Request(url, data=b"x", method="POST"))
    assert ei.value.code == 405
    sink.stop()


def test_http_server_sink_stream_endpoint(spark):
    from benthos_spark.sinks.http_server import HttpServerSink

    sink = HttpServerSink(timeout_s=0.3).start()
    sink(spark.createDataFrame([("s1",), ("s2",), ("s3",)], "value string"), 0)
    body = urllib.request.urlopen(
        f"http://{sink.address}/get/stream", timeout=10).read()
    assert body == b"s1\ns2\ns3\n"
    sink.stop()


def test_http_server_sink_websocket_endpoint(spark):
    from benthos_spark.functions.ws import WsClient
    from benthos_spark.sinks.http_server import HttpServerSink

    sink = HttpServerSink(timeout_s=0.5).start()
    sink(spark.createDataFrame([("w1",), ("w2",)], "value string"), 0)
    c = WsClient(f"ws://{sink.address}/get/ws", timeout_s=10).connect()
    assert c.recv() == (1, b"w1")   # (OP_TEXT, payload)
    assert c.recv() == (1, b"w2")
    c.close()
    sink.stop()


def test_http_server_sink_backpressure_guard(spark):
    from benthos_spark.sinks.http_server import HttpServerSink

    sink = HttpServerSink(max_queue=2, put_timeout_s=0.2).start()
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "value string")
    with pytest.raises(Exception, match="unread"):
        sink(df, 0)
    sink.stop()


def test_sync_and_http_server_outputs_config_wired(spark, tmp_path):
    from benthos_spark.config import _input, _output

    snk = _output({"sync_response": {}})
    from benthos_spark.sinks.http_server import SyncResponseSink

    assert isinstance(snk, SyncResponseSink)
    hs = _output({"http_server": {"timeout_s": 0.2}})
    hs(spark.createDataFrame([("cfg",)], "value string"), 0)
    assert urllib.request.urlopen(f"http://{hs.address}/get").read() == b"cfg"
    hs.stop()
    src = _input({"http_server": {"spool_dir": str(tmp_path / "sp"),
                                  "sync_response": True, "sync_timeout_s": 0.2}})
    assert src.sync_response is True
    src.stop()
