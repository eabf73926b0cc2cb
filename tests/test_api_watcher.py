"""HTTP ops API (`serve_api`) and config watcher (`run_config_watched`)
— streaming/api.py, the reference's service surface (internal/api/
api.go endpoints; config/reader.go BeginFileWatching)."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from benthos_spark.streaming.api import run_config_watched, serve_api


def _get(addr, path):
    with urllib.request.urlopen(f"http://{addr}{path}", timeout=10) as r:
        return r.status, r.read()


def test_api_endpoints(spark, tmp_path):
    mpath = tmp_path / "metrics.jsonl"
    mpath.write_text('{"event": "progress", "batchId": 1}\n')
    api = serve_api(spark, config={"input": {"stdin": {}}}, metrics=str(mpath))
    try:
        assert _get(api.address, "/ping") == (200, b"pong")
        st, body = _get(api.address, "/version")
        assert st == 200 and "benthos-spark" in json.loads(body)["version"]
        st, body = _get(api.address, "/endpoints")
        assert st == 200 and "/streams" in json.loads(body)
        st, body = _get(api.address, "/ready")
        assert st == 200 and json.loads(body)["ready"] is True
        st, body = _get(api.address, "/streams")
        assert st == 200  # no active queries → empty map
        st, body = _get(api.address, "/metrics")
        assert st == 200 and json.loads(body)[0]["batchId"] == 1
        st, body = _get(api.address, "/debug/config/json")
        assert st == 200 and "stdin" in json.loads(body)["input"]
        with pytest.raises(urllib.error.HTTPError):
            _get(api.address, "/nope")
    finally:
        api.stop()


def test_streams_endpoint_reflects_active_query(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame([("a",)], "value string").write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema("value string").parquet(src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .queryName("api_probe").start()
    )
    api = serve_api(spark)
    try:
        deadline = time.time() + 30
        seen = {}
        while time.time() < deadline:
            _, body = _get(api.address, "/streams")
            seen = json.loads(body)
            if "api_probe" in seen and seen["api_probe"]["isActive"]:
                break
            time.sleep(0.3)
        assert "api_probe" in seen and seen["api_probe"]["isActive"]
    finally:
        api.stop()
        q.stop()


def test_config_watcher_reload(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame([("seed",)], "value string").write.mode("overwrite").parquet(str(src))
    out_a, out_b = tmp_path / "out_a", tmp_path / "out_b"

    def conf(out_dir):
        return (
            "input:\n"
            f"  parquet: {{path: {src}, streaming: true}}\n"
            "output:\n"
            f"  file: {{path: {out_dir}}}\n"
        )

    cfile = tmp_path / "pipe.yaml"
    cfile.write_text(conf(out_a))
    run = run_config_watched(
        spark, str(cfile), str(tmp_path / "ckpt"), poll_s=0.3,
        processing_time="200 milliseconds",
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not (out_a.exists() and any(out_a.iterdir())):
            time.sleep(0.3)
        assert out_a.exists(), "first config never produced output"

        # swap the sink path; new rows (and only new rows) go to out_b.
        # Generous deadlines: a stop+recompile+restart cycle can take
        # tens of seconds when the host runs the full suite in parallel.
        cfile.write_text(conf(out_b))
        deadline = time.time() + 120
        while time.time() < deadline and run.reloads == 0:
            time.sleep(0.3)
        assert run.reloads >= 1
        spark.createDataFrame([("after",)], "value string").write.mode("append").parquet(str(src))
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            try:
                got = [r.value for r in spark.read.text(str(out_b)).collect()]
            except Exception:
                got = []
            if "after" in got:
                break
            time.sleep(0.3)
        assert "after" in got
        # the pre-reload row was consumed under config A (same checkpoint
        # carried the offsets over — no duplicate delivery into out_b)
        assert "seed" not in got
    finally:
        run.stop()


def test_metrics_prometheus_exposition(spark, tmp_path):
    import urllib.request

    from benthos_spark.streaming.api import serve_api
    from benthos_spark.streaming.metrics import MetricsListener

    m = MetricsListener(metrics_path=str(tmp_path / "m.jsonl"))
    m.totals["input_received"] = 42
    api = serve_api(spark, metrics=m)
    try:
        with urllib.request.urlopen(f"http://{api.address}/metrics/prometheus") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
        assert "# TYPE benthos_input_received counter" in body
        assert "benthos_input_received 42" in body
        assert "# TYPE benthos_stream_active gauge" in body
        with urllib.request.urlopen(f"http://{api.address}/endpoints") as r:
            assert "/metrics/prometheus" in r.read().decode()
    finally:
        api.stop()
