"""`http` processor — per-message HTTP request enrichment.

Reference parity (internal/impl/io/processor_http.go:69 + the
httpclient package): each message performs one request; the URL and
headers accept ``${! expr }`` Bloblang interpolation resolved per
message; the response body REPLACES the content, the status code lands
in ``http_status_code`` (≙ the client's metadata injection), and a
failed request / non-2xx (after ``successful_on``) keeps the content
and marks the message failed (``_error``). ``parallel`` sends a
batch's requests concurrently (httpclient parallel mode) — here a
thread pool inside each Arrow batch, so concurrency is
``parallel_n × partitions`` across the cluster while the plan stays a
single ``mapInPandas`` stage. ``retries``/``backoff_ms`` mirror the
client's retry loop.

Network scope: this engine runs offline; the processor is
network-agnostic (stdlib urllib) and is exercised against in-process
localhost servers in tests — exactly how the reference tests its own
client (httpclient/client_test.go spins httptest servers).
"""

from __future__ import annotations

import json
import re as _re
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Iterator, Optional

from pyspark.sql import DataFrame

from benthos_spark.operators.processors import Processor

_INTERP = _re.compile(r"\$\{!\s*(.*?)\s*\}")


def _interp_exec(template: str):
    """Compile a ``${! expr }`` template into (literal, Executor) pairs;
    returns None when the template is static."""
    from benthos_spark.bloblang.interp import Executor

    pairs = [
        (m.group(0), Executor(f"root = {m.group(1)}"))
        for m in _INTERP.finditer(template)
    ]
    return pairs or None


def _resolve(template: str, pairs, doc) -> str:
    if not pairs:
        return template
    out = template
    for lit, ex in pairs:
        v = ex.map_part(doc)[0]
        out = out.replace(lit, v if isinstance(v, str) else json.dumps(v))
    return out


@dataclass
class HttpClientSource:
    """`http_client` input (internal/impl/io/input_http_client.go:84):
    perform requests against a URL and turn the responses into
    messages. ``polls`` requests are made (one by default — the bounded
    read; the reference keeps polling forever, which a batch read
    cannot); streaming-body mode (``codec='lines'``) splits the
    response body into one message per line, ``codec='all-bytes'``
    keeps one message per response. Driver-side requests — the payload
    rows then distribute normally (same singleton-ingress reasoning as
    sources/listeners.py)."""

    url: str = ""
    verb: str = "GET"
    headers: dict = field(default_factory=dict)
    payload: Optional[str] = None
    codec: str = "all-bytes"
    polls: int = 1
    timeout_s: float = 10.0
    streaming: bool = False

    def __post_init__(self):
        if not self.url:
            raise ValueError("http_client input needs a url")
        if self.codec not in ("lines", "all-bytes"):
            raise ValueError(f"http_client codec {self.codec!r} not recognised")

    def read(self, spark) -> DataFrame:
        rows = []
        for _ in range(max(1, self.polls)):
            data = self.payload.encode() if self.payload is not None else None
            if self.verb in ("GET", "HEAD"):
                data = None
            req = urllib.request.Request(
                self.url, data=data, headers=self.headers, method=self.verb
            )
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                body = resp.read().decode("utf-8", "replace")
            if self.codec == "lines":
                rows += [(ln,) for ln in body.split("\n") if ln]
            else:
                rows.append((body,))
        return spark.createDataFrame(rows or [(None,)], "value string").filter(
            "value is not null"
        )


@dataclass
class HttpClientSink:
    """`http_client` output (internal/impl/io/output_http_client.go:64):
    send each message's content as one request. One thread pool per
    partition (``parallel_n`` concurrent requests per task — the
    cluster-wide analog of the reference's max_in_flight); any failed
    request after retries fails the batch so the runner retries
    (at-least-once, the reference's contract)."""

    url: str = ""
    verb: str = "POST"
    headers: dict = field(default_factory=dict)
    timeout_s: float = 5.0
    retries: int = 3
    backoff_ms: int = 300
    parallel_n: int = 16
    col: str = "value"

    def __post_init__(self):
        if not self.url:
            raise ValueError("http_client output needs a url")

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        cfg = self
        col = self.col

        def send_partition(rows):
            def one(v):
                content = v if isinstance(v, bytes) else str(v).encode()
                last = None
                for attempt in range(cfg.retries + 1):
                    req = urllib.request.Request(
                        cfg.url, data=content, headers=cfg.headers, method=cfg.verb
                    )
                    try:
                        with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                            if 200 <= resp.status < 300:
                                return
                            last = f"HTTP {resp.status}"
                    except urllib.error.HTTPError as e:
                        last = f"HTTP {e.code}"
                        if e.code < 500 and e.code != 429:
                            break
                    except Exception as e:
                        last = f"request error: {e}"
                    if attempt < cfg.retries:
                        time.sleep(cfg.backoff_ms / 1000.0 * (attempt + 1))
                raise RuntimeError(f"http_client output failed: {last}")

            vals = [row[col] for row in rows]
            if not vals:
                return
            with ThreadPoolExecutor(max_workers=cfg.parallel_n) as pool:
                list(pool.map(one, vals))

        df.select(col).foreachPartition(send_partition)


@dataclass
class Http(Processor):
    """Per-message HTTP request; body replaces content on success."""

    url: str = ""
    verb: str = "POST"
    headers: dict = field(default_factory=dict)
    timeout_s: float = 5.0
    retries: int = 3
    backoff_ms: int = 300
    parallel: bool = False
    parallel_n: int = 16
    successful_on: tuple = ()  # extra non-2xx codes treated as success
    col: str = "value"

    def __post_init__(self):
        if not self.url:
            raise ValueError("http processor needs a url")

    def __call__(self, df: DataFrame) -> DataFrame:
        col = self.col
        cfg = self
        has_err = "_error" in df.columns
        extra = [c for c in ("_error", "http_status_code") if c not in df.columns]
        out_fields = list(df.columns) + extra
        schema = ", ".join(
            f"`{name}` string" if name == "_error"
            else f"`{name}` int" if name == "http_status_code"
            else f"`{name}` {df.schema[name].dataType.simpleString()}"
            for name in out_fields
        )

        def run(batches):
            import pandas as pd

            url_pairs = _interp_exec(cfg.url)
            hdr_pairs = {k: _interp_exec(str(v)) for k, v in cfg.headers.items()}

            def one(raw, err0):
                content = raw if isinstance(raw, bytes) else str(raw).encode()
                try:
                    doc = json.loads(content)
                except Exception:
                    doc = content.decode("utf-8", "replace")
                try:
                    url = _resolve(cfg.url, url_pairs, doc)
                    headers = {
                        k: _resolve(str(v), hdr_pairs[k], doc)
                        for k, v in cfg.headers.items()
                    }
                except Exception as e:
                    return raw, f"interpolation error: {e}", None
                last_err, status, body = None, None, None
                for attempt in range(cfg.retries + 1):
                    req = urllib.request.Request(
                        url,
                        data=content if cfg.verb not in ("GET", "HEAD") else None,
                        headers=headers,
                        method=cfg.verb,
                    )
                    try:
                        with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                            status, body = resp.status, resp.read()
                        break
                    except urllib.error.HTTPError as e:
                        status, body = e.code, e.read()
                        if status in cfg.successful_on:
                            break
                        last_err = f"HTTP {status}"
                        # reference client: retry 5xx/429, fail fast on other 4xx
                        if status < 500 and status != 429:
                            break
                    except Exception as e:  # URLError, timeout
                        last_err, status = f"request error: {e}", None
                    if attempt < cfg.retries:
                        time.sleep(cfg.backoff_ms / 1000.0 * (attempt + 1))
                ok = status is not None and (
                    200 <= status < 300 or status in cfg.successful_on
                )
                if not ok:
                    return raw, last_err or f"HTTP {status}", status
                val = body if isinstance(raw, bytes) else body.decode("utf-8", "replace")
                return val, err0, status

            for pdf in batches:
                raws = [pdf[col].iat[i] for i in range(len(pdf))]
                errs0 = [pdf["_error"].iat[i] if has_err else None for i in range(len(pdf))]
                if cfg.parallel and len(raws) > 1:
                    with ThreadPoolExecutor(max_workers=cfg.parallel_n) as pool:
                        results = list(pool.map(one, raws, errs0))
                else:
                    results = [one(r, e) for r, e in zip(raws, errs0)]
                out = {c: pdf[c] for c in pdf.columns}
                out[col] = pd.Series([r[0] for r in results], dtype=pdf[col].dtype)
                out["_error"] = pd.Series([r[1] for r in results], dtype="object")
                out["http_status_code"] = pd.Series(
                    [r[2] for r in results], dtype="object"
                )
                yield pd.DataFrame(out)

        return df.mapInPandas(run, schema=schema)
