"""stdin/stdout and TCP socket inputs/outputs (sources/readers.py,
sinks/routing.py) — the reference's local byte-stream surfaces
(input_stdin.go, output_stdout.go, input_socket.go, output_socket.go)."""

from __future__ import annotations

import io
import socket
import threading

import pytest

from benthos_spark.sinks.routing import SocketSink, StdoutSink
from benthos_spark.sources.readers import SocketSource, StdinSource


def test_stdin_source(spark, monkeypatch):
    monkeypatch.setattr("sys.stdin", io.StringIO("one\ntwo\n\nthree\n"))
    rows = [r.value for r in StdinSource().read(spark).collect()]
    assert sorted(rows) == ["one", "three", "two"]
    # empty stdin → zero rows, stable schema
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    df = StdinSource().read(spark)
    assert df.count() == 0 and df.columns == ["value"]
    with pytest.raises(ValueError):
        StdinSource(codec="tar")


def test_stdout_sink(spark, capfd):
    df = spark.createDataFrame([("a",), ("b",)], "value string")
    StdoutSink()(df, batch_id=0)
    out = capfd.readouterr().out
    assert sorted(out.splitlines()) == ["a", "b"]
    with pytest.raises(ValueError):
        StdoutSink(codec="tar")


def _serve_once(payload: bytes, result: dict):
    """One-shot localhost TCP server: sends `payload` then closes
    (for the source), or receives everything (for the sink)."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)
    result["port"] = srv.getsockname()[1]
    result["ready"].set()

    def run():
        if payload:
            conn, _ = srv.accept()
            conn.sendall(payload)
            conn.close()
        else:
            got = []
            # the sink opens one connection per partition
            srv.settimeout(20)
            try:
                while True:
                    conn, _ = srv.accept()
                    buf = b""
                    while True:
                        chunk = conn.recv(65536)
                        if not chunk:
                            break
                        buf += chunk
                    got.append(buf)
                    conn.close()
                    if b"".join(got).count(b"\n") >= result["expect_lines"]:
                        break
            except socket.timeout:
                pass
            result["data"] = b"".join(got)
        srv.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    result["thread"] = t


def test_socket_source_batch(spark):
    res = {"ready": threading.Event()}
    _serve_once(b"x1\nx2\nx3\n", res)
    res["ready"].wait(10)
    src = SocketSource(address=f"127.0.0.1:{res['port']}", streaming=False)
    rows = sorted(r.value for r in src.read(spark).collect())
    assert rows == ["x1", "x2", "x3"]


def test_socket_source_streaming_plan(spark):
    # streaming mode maps onto Spark's native socket source — verify the
    # plan materializes without connecting (isStreaming + schema)
    src = SocketSource(address="127.0.0.1:9", streaming=True)
    df = src.read(spark)
    assert df.isStreaming and df.columns == ["value"]


def test_socket_sink(spark):
    res = {"ready": threading.Event(), "expect_lines": 3}
    _serve_once(b"", res)
    res["ready"].wait(10)
    df = spark.createDataFrame([("s1",), ("s2",), ("s3",)], "value string").coalesce(1)
    SocketSink(address=f"127.0.0.1:{res['port']}")(df, batch_id=0)
    res["thread"].join(20)
    assert sorted(res["data"].decode().splitlines()) == ["s1", "s2", "s3"]


def test_socket_validation():
    with pytest.raises(ValueError):
        SocketSource(address="no-port")
    with pytest.raises(ValueError):
        SocketSource(address="h:1", network="unix")
    with pytest.raises(ValueError):
        SocketSink(address="h:1", network="udp")


def test_file_sink(spark, tmp_path):
    from benthos_spark.sinks.routing import FileSink

    out = str(tmp_path / "files")
    df = spark.createDataFrame([("a", "x"), ("a", "y"), ("b", "z")], "k string, value string")
    FileSink(out)(df, 0)
    assert sorted(r.value for r in spark.read.text(out).collect()) == ["x", "y", "z"]
    # appends across batches
    FileSink(out)(spark.createDataFrame([("c", "w")], "k string, value string"), 1)
    assert spark.read.text(out).count() == 4
    # partitioned fan-out (the interpolated-path analog)
    out2 = str(tmp_path / "parts")
    FileSink(out2, partition_by=("k",))(df, 0)
    assert sorted(r.value for r in spark.read.text(out2 + "/k=a").collect()) == ["x", "y"]
    with pytest.raises(ValueError):
        FileSink(out, codec="tar")


def test_config_wiring(spark, monkeypatch, capfd):
    from benthos_spark.config import _input, _output

    monkeypatch.setattr("sys.stdin", io.StringIO("cfg\n"))
    src = _input({"stdin": {}})
    df = src.read(spark)
    assert [r.value for r in df.collect()] == ["cfg"]
    _output({"stdout": {}})(df, 0)
    assert "cfg" in capfd.readouterr().out
    assert _input({"socket": {"address": "127.0.0.1:9"}}).read(spark).isStreaming
