"""`elasticsearch` output (internal/impl/elasticsearch/output.go) over
the public Elasticsearch REST _bulk API (NDJSON action/source pairs) —
plus an in-process :class:`MiniElasticServer` for loopback tests. The
reference uses the official Go client; the API itself is plain HTTP, so
the sink works against any real Elasticsearch/OpenSearch endpoint.

Spark shape: one bulk request per ``bulk_size`` rows per Spark
partition (the data plane is executor-side HTTP; no driver fan-in);
``index``/``id``/``action`` may come from columns (the reference's
per-message interpolations). Replays with the same ids are idempotent
for `index` actions — the exactly-once upgrade beyond the reference's
at-least-once."""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import DataFrame

_ACTIONS = ("index", "create", "update", "delete")


class ElasticsearchSink:
    def __init__(self, url: str, index: str, col: str = "value",
                 id_col: Optional[str] = None, index_col: Optional[str] = None,
                 action: str = "index", bulk_size: int = 500):
        if action not in _ACTIONS:
            raise ValueError(f"elasticsearch action {action!r} (want one of {_ACTIONS})")
        self.url = url if url.startswith("http") else "http://" + url
        self.index, self.col, self.action = index, col, action
        self.id_col, self.index_col, self.bulk_size = id_col, index_col, bulk_size

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, index, col, action = self.url, self.index, self.col, self.action
        id_col, index_col, bulk_size = self.id_col, self.index_col, self.bulk_size
        cols = [col] + [c for c in (id_col, index_col) if c]

        def write_partition(rows):
            import urllib.request  # ensure the submodule exists in the worker

            buf: list[bytes] = []

            def flush():
                if not buf:
                    return
                body = b"".join(buf)
                req = urllib.request.Request(
                    url.rstrip("/") + "/_bulk", data=body,
                    headers={"Content-Type": "application/x-ndjson"}, method="POST")
                with urllib.request.urlopen(req, timeout=30) as resp:
                    out = json.loads(resp.read())
                if out.get("errors"):
                    bad = [i for i in out["items"]
                           if list(i.values())[0].get("status", 200) >= 300]
                    raise IOError(f"elasticsearch bulk had {len(bad)} failed items: "
                                  f"{bad[:3]!r}")
                buf.clear()

            for row in rows:
                meta: dict = {"_index": row[index_col] if index_col else index}
                if id_col:
                    meta["_id"] = str(row[id_col])
                v = row[col]
                doc = v if isinstance(v, str) else (
                    bytes(v).decode("utf-8", "replace") if isinstance(v, (bytes, bytearray))
                    else json.dumps(v))
                buf.append(json.dumps({action: meta}).encode() + b"\n")
                if action != "delete":
                    src = doc if action != "update" else json.dumps({"doc": json.loads(doc)})
                    buf.append(src.encode() + b"\n")
                if len(buf) >= bulk_size * 2:
                    flush()
            flush()

        df.select(*cols).foreachPartition(write_partition)


class MiniElasticServer:
    """Loopback subset of the ES REST API: POST /_bulk (index/create/
    update/delete), GET /{index}/_doc/{id}, GET /{index}/_count,
    POST|GET /{index}/_search (match_all). Dynamic index creation like
    the real thing."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._server = None
        self.address = ""
        self.endpoint = ""
        self._lock = threading.Lock()
        self.indices: dict[str, dict[str, dict]] = {}
        self._auto_id = [0]

    def start(self) -> "MiniElasticServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _reply(self, status: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n)
                if self.path.rstrip("/") == "/_bulk" or self.path.endswith("/_bulk"):
                    self._reply(200, outer._bulk(payload))
                    return
                if self.path.endswith("/_search"):
                    idx = self.path.split("/")[1]
                    self._reply(200, outer._search(idx))
                    return
                self._reply(404, {"error": "unknown endpoint"})

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 3 and parts[1] == "_doc":
                    idx, _d, did = parts
                    with outer._lock:
                        doc = outer.indices.get(idx, {}).get(did)
                    if doc is None:
                        self._reply(404, {"found": False, "_id": did})
                    else:
                        self._reply(200, {"found": True, "_id": did,
                                          "_index": idx, "_source": doc})
                    return
                if len(parts) == 2 and parts[1] == "_count":
                    with outer._lock:
                        n = len(outer.indices.get(parts[0], {}))
                    self._reply(200, {"count": n})
                    return
                if len(parts) == 2 and parts[1] == "_search":
                    self._reply(200, outer._search(parts[0]))
                    return
                self._reply(404, {"error": "unknown endpoint"})

        class Server(ThreadingHTTPServer):
            daemon_threads = True

        self._server = Server((self._host, self._port), Handler)
        self.address = "%s:%d" % self._server.server_address[:2]
        self.endpoint = "http://" + self.address
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def _search(self, idx: str) -> dict:
        with self._lock:
            docs = self.indices.get(idx, {})
            hits = [{"_index": idx, "_id": k, "_source": v}
                    for k, v in sorted(docs.items())]
        return {"hits": {"total": {"value": len(hits)}, "hits": hits}}

    def _bulk(self, payload: bytes) -> dict:
        lines = [ln for ln in payload.split(b"\n") if ln.strip()]
        items = []
        errors = False
        i = 0
        with self._lock:
            while i < len(lines):
                meta = json.loads(lines[i])
                (action, spec), = meta.items()
                idx = spec["_index"]
                store = self.indices.setdefault(idx, {})
                if action == "delete":
                    existed = store.pop(spec.get("_id", ""), None) is not None
                    items.append({"delete": {"_index": idx, "_id": spec.get("_id"),
                                             "status": 200 if existed else 404,
                                             "result": "deleted" if existed else "not_found"}})
                    i += 1
                    continue
                doc = json.loads(lines[i + 1])
                did = spec.get("_id")
                if did is None:
                    self._auto_id[0] += 1
                    did = f"auto-{self._auto_id[0]}"
                if action == "create" and did in store:
                    items.append({"create": {"_index": idx, "_id": did, "status": 409,
                                             "error": {"type": "version_conflict_engine_exception"}}})
                    errors = True
                elif action == "update":
                    if did not in store:
                        items.append({"update": {"_index": idx, "_id": did, "status": 404,
                                                 "error": {"type": "document_missing_exception"}}})
                        errors = True
                    else:
                        store[did].update(doc.get("doc", {}))
                        items.append({"update": {"_index": idx, "_id": did, "status": 200}})
                else:  # index / create-new
                    store[did] = doc
                    items.append({action: {"_index": idx, "_id": did, "status": 201}})
                i += 2
        return {"took": 1, "errors": errors, "items": items}
