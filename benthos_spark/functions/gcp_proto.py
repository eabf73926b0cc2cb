"""GCP Cloud Storage (JSON API) and BigQuery (REST v2) protocols —
from scratch off the public references (cloud.google.com/storage/docs/
json_api: objects insert/get/list/delete with ``uploadType=media`` /
``alt=media``; cloud.google.com/bigquery/docs/reference/rest: jobs
``queries`` and ``tabledata.insertAll``). The reference's connectors
(internal/impl/gcp/input_cloud_storage.go, output_cloud_storage.go,
cache_cloud_storage.go, input_bigquery_select.go,
processor_bigquery_select.go, output_bigquery.go) use the Google SDKs;
here the REST surface is plain HTTP+JSON, compatible with real GCP (a
bearer token field passes through) and with the standard emulators
(fake-gcs-server for storage; the ``endpoint`` field is exactly the
emulator hookup, same convention as the gcp_pubsub connector), while
tests run against the mini servers below.

:class:`MiniBigQueryServer` executes queries with an embedded DuckDB —
inserted rows become real tables, so the connectors' SQL (standard-SQL
SELECTs with positional ``?`` parameters) runs against a genuine
engine rather than a canned response."""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional


class GcsError(RuntimeError):
    pass


def _http(method: str, url: str, payload: Optional[bytes] = None,
          token: Optional[str] = None, ctype: str = "application/json",
          timeout_s: float = 30.0) -> tuple[int, bytes]:
    headers = {"Content-Type": ctype}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url, data=payload, headers=headers,
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class GcsClient:
    """Cloud Storage JSON-API client: insert/get/list/delete objects."""

    def __init__(self, endpoint: str, token: Optional[str] = None):
        self.base = (endpoint if endpoint.startswith("http")
                     else "http://" + endpoint).rstrip("/")
        self.token = token

    def create_bucket(self, bucket: str) -> None:
        status, body = _http("POST", f"{self.base}/storage/v1/b",
                             json.dumps({"name": bucket}).encode(), self.token)
        if status not in (200, 409):
            raise GcsError(f"create bucket: {status} {body!r}")

    def insert_object(self, bucket: str, name: str, data: bytes,
                      if_generation_match: Optional[int] = None) -> None:
        """uploadType=media; ``ifGenerationMatch=0`` is the published
        atomic create-if-absent (the cache `add` primitive)."""
        q = {"uploadType": "media", "name": name}
        if if_generation_match is not None:
            q["ifGenerationMatch"] = str(if_generation_match)
        url = (f"{self.base}/upload/storage/v1/b/{bucket}/o?"
               + urllib.parse.urlencode(q))
        status, body = _http("POST", url, data, self.token,
                             "application/octet-stream")
        if status == 412:
            raise GcsError("precondition failed")
        if status != 200:
            raise GcsError(f"insert object: {status} {body!r}")

    def get_object(self, bucket: str, name: str) -> bytes:
        url = (f"{self.base}/storage/v1/b/{bucket}/o/"
               f"{urllib.parse.quote(name, safe='')}?alt=media")
        status, body = _http("GET", url, None, self.token)
        if status == 404:
            raise FileNotFoundError(name)
        if status != 200:
            raise GcsError(f"get object: {status} {body!r}")
        return body

    def list_objects(self, bucket: str, prefix: str = "") -> list[dict]:
        q = urllib.parse.urlencode({"prefix": prefix} if prefix else {})
        url = f"{self.base}/storage/v1/b/{bucket}/o" + (f"?{q}" if q else "")
        status, body = _http("GET", url, None, self.token)
        if status != 200:
            raise GcsError(f"list objects: {status} {body!r}")
        return json.loads(body).get("items", [])

    def delete_object(self, bucket: str, name: str) -> None:
        url = (f"{self.base}/storage/v1/b/{bucket}/o/"
               f"{urllib.parse.quote(name, safe='')}")
        status, body = _http("DELETE", url, None, self.token)
        if status not in (204, 404):
            raise GcsError(f"delete object: {status} {body!r}")


class BigQueryClient:
    """BigQuery REST-v2 client: jobs.query + tabledata.insertAll."""

    def __init__(self, endpoint: str, project: str,
                 token: Optional[str] = None):
        self.base = (endpoint if endpoint.startswith("http")
                     else "http://" + endpoint).rstrip("/")
        self.project, self.token = project, token

    def query(self, sql: str, params: Optional[list] = None) -> list[dict]:
        """Standard-SQL query with positional ``?`` parameters; rows come
        back through the published f/v envelope and are re-keyed by the
        schema field names."""
        body: dict[str, Any] = {"query": sql, "useLegacySql": False}
        if params:
            body["parameterMode"] = "POSITIONAL"
            body["queryParameters"] = [
                {"parameterType": {"type": "STRING"},
                 "parameterValue": {"value": str(p)}} for p in params]
        status, out = _http(
            "POST", f"{self.base}/bigquery/v2/projects/{self.project}/queries",
            json.dumps(body).encode(), self.token)
        if status != 200:
            raise GcsError(f"bigquery query: {status} {out!r}")
        doc = json.loads(out)
        names = [f["name"] for f in doc["schema"]["fields"]]
        return [{n: cell["v"] for n, cell in zip(names, row["f"])}
                for row in doc.get("rows", [])]

    def insert_all(self, dataset: str, table: str, rows: list[dict]) -> None:
        body = {"rows": [{"json": r} for r in rows]}
        status, out = _http(
            "POST",
            f"{self.base}/bigquery/v2/projects/{self.project}/datasets/"
            f"{dataset}/tables/{table}/insertAll",
            json.dumps(body).encode(), self.token)
        if status != 200:
            raise GcsError(f"insertAll: {status} {out!r}")
        errs = json.loads(out).get("insertErrors")
        if errs:
            raise GcsError(f"insertAll errors: {errs}")


# ---------------------------------------------------------------------------
# Mini servers
# ---------------------------------------------------------------------------


class MiniGcsServer:
    """fake-gcs-server-style loopback: buckets of objects with
    generations and the ifGenerationMatch=0 atomic-create check."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self.buckets: dict[str, dict[str, dict]] = {}
        self._lock = threading.Lock()

    def start(self) -> "MiniGcsServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, body: bytes = b"{}",
                       ctype: str = "application/json") -> None:
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _handle(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n)
                parsed = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(parsed.query,
                                                keep_blank_values=True))
                path = urllib.parse.unquote(parsed.path)
                with outer._lock:
                    outer._route(self, self.command, path, q, payload)

            do_GET = do_POST = do_DELETE = _handle

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    def _route(self, h, verb: str, path: str, q: dict, payload: bytes) -> None:
        if verb == "POST" and path == "/storage/v1/b":
            self.buckets.setdefault(json.loads(payload)["name"], {})
            h._reply(200)
            return
        m = re.match(r"^/upload/storage/v1/b/([^/]+)/o$", path)
        if m and verb == "POST":
            b = self.buckets.get(m.group(1))
            if b is None:
                h._reply(404)
                return
            name = q["name"]
            if q.get("ifGenerationMatch") == "0" and name in b:
                h._reply(412, b'{"error": {"code": 412}}')
                return
            gen = b[name]["generation"] + 1 if name in b else 1
            b[name] = {"data": payload, "generation": gen}
            h._reply(200, json.dumps({"name": name, "size": str(len(payload)),
                                      "generation": str(gen)}).encode())
            return
        m = re.match(r"^/storage/v1/b/([^/]+)/o/(.+)$", path)
        if m:
            b = self.buckets.get(m.group(1))
            obj = None if b is None else b.get(m.group(2))
            if verb == "GET":
                if obj is None:
                    h._reply(404, b'{"error": {"code": 404}}')
                elif q.get("alt") == "media":
                    h._reply(200, obj["data"], "application/octet-stream")
                else:
                    h._reply(200, json.dumps(
                        {"name": m.group(2),
                         "size": str(len(obj["data"]))}).encode())
                return
            if verb == "DELETE":
                if b is not None:
                    b.pop(m.group(2), None)
                h._reply(204, b"")
                return
        m = re.match(r"^/storage/v1/b/([^/]+)/o$", path)
        if m and verb == "GET":
            b = self.buckets.get(m.group(1))
            if b is None:
                h._reply(404)
                return
            prefix = q.get("prefix", "")
            items = [{"name": k, "size": str(len(v["data"]))}
                     for k, v in sorted(b.items()) if k.startswith(prefix)]
            h._reply(200, json.dumps({"items": items}).encode())
            return
        h._reply(400)


class MiniBigQueryServer:
    """BigQuery REST-v2 loopback over an embedded DuckDB: insertAll
    appends rows to `dataset_table` tables; jobs.query runs the SQL for
    real and renders the published f/v row envelope. Table references
    like ``project.dataset.table`` / backtick-quoted forms are rewritten
    to the flat names."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 project: str = "test-project"):
        self.host, self.port, self.project = host, port, project
        self._lock = threading.Lock()
        import duckdb

        self._db = duckdb.connect(":memory:")

    def start(self) -> "MiniBigQueryServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, body: bytes) -> None:
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(n) or b"{}")
                path = urllib.parse.urlparse(self.path).path
                try:
                    with outer._lock:
                        out = outer._route(path, payload)
                    self._reply(200, json.dumps(out).encode())
                except Exception as e:
                    self._reply(400, json.dumps(
                        {"error": {"message": str(e)}}).encode())

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    def _flat(self, sql: str) -> str:
        """`proj.dataset.table` / `dataset.table` (optionally
        backtick-quoted) -> dataset_table."""
        def sub(m):
            parts = m.group(1).split(".")
            return "_".join(parts[-2:])
        return re.sub(r"`([\w.-]+)`", sub,
                      re.sub(r"\b([\w-]+\.[\w-]+\.[\w-]+)\b", sub, sql))

    def _route(self, path: str, payload: dict) -> dict:
        m = re.match(r"^/bigquery/v2/projects/([^/]+)/queries$", path)
        if m:
            sql = self._flat(payload["query"])
            params = [p["parameterValue"]["value"]
                      for p in payload.get("queryParameters", [])]
            rel = self._db.execute(sql, params) if params else self._db.execute(sql)
            names = [d[0] for d in rel.description]
            rows = rel.fetchall()
            return {
                "kind": "bigquery#queryResponse",
                "schema": {"fields": [{"name": n, "type": "STRING"}
                                      for n in names]},
                "rows": [{"f": [{"v": None if v is None else str(v)}
                                for v in row]} for row in rows],
                "totalRows": str(len(rows)), "jobComplete": True,
            }
        m = re.match(
            r"^/bigquery/v2/projects/([^/]+)/datasets/([^/]+)/tables/([^/]+)/insertAll$",
            path)
        if m:
            table = f"{m.group(2)}_{m.group(3)}"
            rows = [r["json"] for r in payload["rows"]]
            if not rows:
                return {"kind": "bigquery#tableDataInsertAllResponse"}
            cols = sorted({k for r in rows for k in r})
            exists = self._db.execute(
                "SELECT count(*) FROM information_schema.tables WHERE table_name = ?",
                [table]).fetchone()[0]
            if not exists:
                decl = ", ".join(
                    f'"{c}" {self._duck_type(rows, c)}' for c in cols)
                self._db.execute(f'CREATE TABLE "{table}" ({decl})')
            have = [d[0] for d in self._db.execute(
                f'SELECT * FROM "{table}" LIMIT 0').description]
            ph = ", ".join("?" for _ in have)
            self._db.executemany(
                f'INSERT INTO "{table}" VALUES ({ph})',
                [[r.get(c) for c in have] for r in rows])
            return {"kind": "bigquery#tableDataInsertAllResponse"}
        raise ValueError(f"unknown path {path}")

    @staticmethod
    def _duck_type(rows: list[dict], col: str) -> str:
        for r in rows:
            v = r.get(col)
            if isinstance(v, bool):
                return "BOOLEAN"
            if isinstance(v, int):
                return "BIGINT"
            if isinstance(v, float):
                return "DOUBLE"
            if v is not None:
                return "VARCHAR"
        return "VARCHAR"
