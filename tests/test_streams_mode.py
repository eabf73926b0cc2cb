"""Streams mode: multi-config manager + CRUD HTTP API
(streaming/streams.py; reference internal/stream/manager/api.go)."""

import json
import time
import urllib.error
import urllib.request

import pytest

from benthos_spark.streaming.api import serve_api
from benthos_spark.streaming.streams import StreamsManager, load_stream_dir


def _conf(src, out):
    return (
        f"input:\n  parquet: {{path: {src}, streaming: true}}\n"
        f"output:\n  exactly_once: {{dir: {out}}}\n"
    )


def _seed(spark, src, vals):
    spark.createDataFrame([(v,) for v in vals], "v long").write.mode("append").parquet(str(src))


def _req(addr, path, method="GET", body=None):
    req = urllib.request.Request(
        f"http://{addr}{path}", method=method, data=body.encode() if body else None
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def _wait_rows(spark, out_dir, n, timeout=60):
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(out_dir))
    deadline = time.time() + timeout
    rows = []
    while time.time() < deadline:
        try:
            rows = sink.read_committed(spark).collect()
        except Exception:
            rows = []
        if len(rows) >= n:
            return rows
        time.sleep(0.4)
    return rows


@pytest.fixture()
def mgr(spark, tmp_path):
    m = StreamsManager(
        spark, str(tmp_path / "ckpt"), processing_time="200 milliseconds"
    )
    yield m
    m.stop_all()


def test_crud_lifecycle_over_http(spark, tmp_path, mgr):
    src = tmp_path / "src"
    out_a, out_b = tmp_path / "out_a", tmp_path / "out_b"
    _seed(spark, src, [1, 2, 3])
    api = serve_api(spark, streams=mgr)
    try:
        # CREATE
        code, body = _req(api.address, "/streams/s1", "POST", _conf(src, out_a))
        assert code == 200 and body == {"created": "s1"}
        assert len(_wait_rows(spark, out_a, 3)) == 3
        # duplicate create rejected
        code, body = _req(api.address, "/streams/s1", "POST", _conf(src, out_a))
        assert code == 400 and "exists" in body["error"]
        # READ
        code, body = _req(api.address, "/streams/s1")
        assert code == 200 and body["active"] is True and "parquet" in body["config"]
        # LIST merges managed streams
        code, body = _req(api.address, "/streams")
        assert code == 200 and "s1" in body["managed"]
        # UPDATE: swap the sink; same checkpoint -> only NEW rows go to b
        code, body = _req(api.address, "/streams/s1", "PUT", _conf(src, out_b))
        assert code == 200 and body == {"updated": "s1"}
        _seed(spark, src, [4, 5])
        rows_b = _wait_rows(spark, out_b, 2)
        assert sorted(r.v for r in rows_b) == [4, 5]  # no replay of 1..3
        # STATS
        code, body = _req(api.address, "/streams/s1/stats")
        assert code == 200 and body["uptime_ns"] > 0
        code, _ = _req(api.address, "/streams/ghost/stats")
        assert code == 404
        # DELETE
        code, body = _req(api.address, "/streams/s1", "DELETE")
        assert code == 200 and body == {"deleted": "s1"}
        code, body = _req(api.address, "/streams/s1")
        assert code == 404
        code, body = _req(api.address, "/streams/ghost", "DELETE")
        assert code == 404
        # bad config -> 400
        code, body = _req(api.address, "/streams/s2", "POST", "input:\n  nope: {}\noutput:\n  drop: {}\n")
        assert code == 400 and "unknown input" in body["error"]
    finally:
        api.stop()


def test_set_all_replaces(spark, tmp_path, mgr):
    src = tmp_path / "src"
    _seed(spark, src, [1])
    api = serve_api(spark, streams=mgr)
    try:
        mgr.create("old", _conf(src, tmp_path / "o1"))
        code, body = _req(
            api.address,
            "/streams",
            "POST",
            json.dumps({"new": _conf(src, str(tmp_path / "o2"))}),
        )
        assert code == 200 and body == {"replaced": ["new"]}
        listing = mgr.list()
        assert set(listing) == {"new"}
    finally:
        api.stop()


def test_load_stream_dir(spark, tmp_path, mgr):
    src = tmp_path / "src"
    _seed(spark, src, [7])
    d = tmp_path / "confs"
    d.mkdir()
    (d / "alpha.yaml").write_text(_conf(src, tmp_path / "oa"))
    (d / "beta.yml").write_text(_conf(src, tmp_path / "ob"))
    (d / "notes.txt").write_text("ignored")
    assert load_stream_dir(mgr, str(d)) == ["alpha", "beta"]
    assert set(mgr.list()) == {"alpha", "beta"}
