"""splunk_hec output template — port of the reference's splunk
connector, which is a template over http_client
(internal/impl/splunk/template_output.yaml): embedded expansion test,
output-level `processors` support, and an end-to-end POST capture."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from benthos_spark import templates as T
from benthos_spark.config import _output, compile_config

TEMPLATE_PATH = "examples/templates/splunk_hec.yaml"


@pytest.fixture(autouse=True)
def _load_template():
    T.clear_templates()
    assert T.load_template_files([TEMPLATE_PATH]) == []
    yield
    T.clear_templates()


@pytest.fixture()
def hec_server():
    """Captures (path, headers, body) for every POST; replies like HEC."""
    captured = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            captured.append((self.path, dict(self.headers), body))
            out = b'{"text":"Success","code":0}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    srv.captured = captured
    yield srv
    srv.shutdown()
    srv.server_close()


def test_embedded_expansion_tests_pass():
    t = T.lookup("output", "splunk_hec")
    assert t is not None
    assert T.run_template_tests(t) == []


def test_expansion_wires_token_and_envelope():
    t = T.lookup("output", "splunk_hec")
    got = T.expand(t, {"url": "https://x/services/collector/event",
                       "token": "tok", "event_index": "main"})
    assert got["http_client"]["headers"]["Authorization"] == "Splunk tok"
    assert 'config_index = "main"' in got["processors"][0]["bloblang"]


def test_end_to_end_post_capture(spark, tmp_path, hec_server):
    import pandas as pd

    port = hec_server.server_address[1]
    src = tmp_path / "in"
    spark.createDataFrame(
        pd.DataFrame({"value": ["hello world", json.dumps({"event": "already", "host": "h0"})]})
    ).write.mode("overwrite").parquet(str(src))
    conf = f"""
input:
  parquet: {{path: {src}}}
output:
  splunk_hec:
    url: http://127.0.0.1:{port}/services/collector/event
    token: footoken
    event_sourcetype: benthos_spark
"""
    pipe, sink = compile_config(conf)
    sink(pipe.run_batch(spark), 0)

    assert len(hec_server.captured) == 2
    events = []
    for path, headers, body in hec_server.captured:
        assert path == "/services/collector/event"
        assert headers["Authorization"] == "Splunk footoken"
        assert headers["Content-Type"] == "application/json"
        events.append(json.loads(body))
    events.sort(key=lambda e: e["event"])
    # raw string wrapped into an envelope; existing envelope passed through
    assert events[0]["event"] == "already" and events[0]["host"] == "h0"
    assert events[1]["event"] == "hello world"
    assert all(e["sourcetype"] == "benthos_spark" for e in events)


def test_output_level_processors_without_template(spark, tmp_path, hec_server):
    """output-level `processors` is a first-class node, not template-only."""
    port = hec_server.server_address[1]
    sink = _output({
        "http_client": {"url": f"http://127.0.0.1:{port}/sink"},
        "processors": [{"mutation": 'root.value = this.value.uppercase()'}],
    })
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"value": ["abc"]}))
    sink(df, 0)
    assert hec_server.captured[0][2] == b"ABC"
