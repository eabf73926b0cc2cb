"""WebHDFS REST protocol — from scratch off the public Hadoop WebHDFS
REST API specification (hadoop.apache.org: "WebHDFS REST API"):
``/webhdfs/v1/<PATH>?op=...&user.name=...`` with LISTSTATUS / OPEN /
CREATE / APPEND / MKDIRS / DELETE / GETFILESTATUS, including the
spec's TWO-STEP write: the NameNode answers ``op=CREATE`` with a 307
redirect to a DataNode location and the data is PUT there (the
documented dance that avoids streaming file bytes through the
NameNode). The mini server plays both roles and enforces the two-step
— a client that PUTs data straight at the first URL is rejected, so
the redirect handling is actually exercised.

The reference's hdfs connectors (internal/impl/hdfs/input.go:49,
output.go:48) use colinmarc/hdfs — the NATIVE Hadoop RPC wire
(protobuf + SASL). WebHDFS is the other public access path every HDFS
deployment ships; this engine uses it as the transport, a documented
transport substitution (the connector surface — directory in, one file
per message out — is the same)."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class WebHdfsError(RuntimeError):
    pass


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, *a, **kw):  # surface 307s to the caller
        return None


_opener = urllib.request.build_opener(_NoRedirect)


class WebHdfsClient:
    def __init__(self, hosts: list[str] | str, user: str = "hadoop",
                 timeout_s: float = 30.0):
        if isinstance(hosts, str):
            hosts = [hosts]
        self.bases = [(h if h.startswith("http") else "http://" + h).rstrip("/")
                      for h in hosts]
        self.user, self._timeout = user, timeout_s

    def _url(self, base: str, path: str, op: str, **params) -> str:
        q = {"op": op, "user.name": self.user,
             **{k: v for k, v in params.items() if v is not None}}
        return (f"{base}/webhdfs/v1{urllib.parse.quote(path)}?"
                + urllib.parse.urlencode(q))

    def _request(self, method: str, path: str, op: str,
                 data: Optional[bytes] = None, **params) -> tuple[int, bytes, dict]:
        last: Exception | None = None
        for base in self.bases:  # namenode failover list (input.go hosts)
            url = self._url(base, path, op, **params)
            try:
                req = urllib.request.Request(url, data=data, method=method)
                with _opener.open(req, timeout=self._timeout) as resp:
                    return resp.status, resp.read(), dict(resp.headers)
            except urllib.error.HTTPError as e:
                if e.code == 307:  # the documented two-step redirect
                    return e.code, e.read(), dict(e.headers)
                last = WebHdfsError(f"{op} {path}: {e.code} {e.read()!r}")
            except OSError as e:
                last = e
        raise last or WebHdfsError(f"no hosts for {op}")

    def list_status(self, directory: str) -> list[dict]:
        _, body, _ = self._request("GET", directory, "LISTSTATUS")
        return json.loads(body)["FileStatuses"]["FileStatus"]

    def open(self, path: str) -> bytes:
        status, body, headers = self._request("GET", path, "OPEN")
        if status == 307:  # read redirect to the datanode
            with _opener.open(urllib.request.Request(headers["Location"]),
                              timeout=self._timeout) as resp:
                return resp.read()
        return body

    def create(self, path: str, data: bytes, overwrite: bool = True) -> None:
        status, _, headers = self._request(
            "PUT", path, "CREATE", data=None,
            overwrite="true" if overwrite else "false")
        if status != 307:
            raise WebHdfsError(f"expected 307 redirect, got {status}")
        req = urllib.request.Request(headers["Location"], data=data,
                                     method="PUT",
                                     headers={"Content-Type":
                                              "application/octet-stream"})
        try:
            with _opener.open(req, timeout=self._timeout) as resp:
                if resp.status not in (200, 201):
                    raise WebHdfsError(f"datanode PUT: {resp.status}")
        except urllib.error.HTTPError as e:
            raise WebHdfsError(f"datanode PUT: {e.code} {e.read()!r}") from None

    def mkdirs(self, path: str) -> None:
        self._request("PUT", path, "MKDIRS")

    def delete(self, path: str, recursive: bool = False) -> None:
        self._request("DELETE", path, "DELETE",
                      recursive="true" if recursive else "false")


class MiniWebHdfsServer:
    """NameNode + DataNode in one: op=CREATE answers 307 with a
    ``datanode=1``-marked location; a PUT carrying data without that
    marker is rejected (400) so clients must do the two-step."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self.files: dict[str, bytes] = {}
        self.dirs: set[str] = {"/"}
        self._lock = threading.Lock()

    def start(self) -> "MiniWebHdfsServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, body: bytes = b"",
                       headers: Optional[dict] = None) -> None:
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _parts(self):
                parsed = urllib.parse.urlparse(self.path)
                if not parsed.path.startswith("/webhdfs/v1"):
                    return None, None
                path = urllib.parse.unquote(parsed.path[len("/webhdfs/v1"):]) or "/"
                q = dict(urllib.parse.parse_qsl(parsed.query))
                return path, q

            def do_GET(self):
                path, q = self._parts()
                if path is None:
                    self._reply(404)
                    return
                op = q.get("op", "")
                with outer._lock:
                    if op == "LISTSTATUS":
                        prefix = path.rstrip("/") + "/"
                        entries = []
                        for f, data in sorted(outer.files.items()):
                            if f.startswith(prefix) and "/" not in f[len(prefix):]:
                                entries.append({
                                    "pathSuffix": f[len(prefix):],
                                    "type": "FILE", "length": len(data)})
                        for d in sorted(outer.dirs):
                            if (d.startswith(prefix)
                                    and d != path.rstrip("/")
                                    and "/" not in d[len(prefix):].rstrip("/")
                                    and d[len(prefix):]):
                                entries.append({"pathSuffix":
                                                d[len(prefix):].rstrip("/"),
                                                "type": "DIRECTORY",
                                                "length": 0})
                        self._reply(200, json.dumps(
                            {"FileStatuses": {"FileStatus": entries}}).encode(),
                            {"Content-Type": "application/json"})
                        return
                    if op == "OPEN":
                        data = outer.files.get(path)
                        if data is None:
                            self._reply(404, json.dumps(
                                {"RemoteException":
                                 {"exception": "FileNotFoundException"}}).encode())
                            return
                        self._reply(200, data)
                        return
                    if op == "GETFILESTATUS":
                        if path in outer.files:
                            self._reply(200, json.dumps({"FileStatus": {
                                "type": "FILE",
                                "length": len(outer.files[path])}}).encode())
                        elif path in outer.dirs:
                            self._reply(200, json.dumps({"FileStatus": {
                                "type": "DIRECTORY", "length": 0}}).encode())
                        else:
                            self._reply(404)
                        return
                self._reply(400)

            def do_PUT(self):
                path, q = self._parts()
                if path is None:
                    self._reply(404)
                    return
                n = int(self.headers.get("Content-Length") or 0)
                data = self.rfile.read(n)
                op = q.get("op", "")
                if op == "CREATE":
                    if q.get("datanode") != "1":
                        # NameNode role: no data accepted here (the spec's
                        # "Expect: 100-continue ... redirect" step)
                        if data:
                            self._reply(400, b"data must go to the datanode")
                            return
                        loc = (f"http://{outer.host}:{outer.port}/webhdfs/v1"
                               f"{urllib.parse.quote(path)}?"
                               + urllib.parse.urlencode({**q, "datanode": "1"}))
                        self._reply(307, b"", {"Location": loc})
                        return
                    if q.get("overwrite", "true") == "false":
                        with outer._lock:
                            if path in outer.files:
                                self._reply(403, b"file exists")
                                return
                    with outer._lock:
                        outer.files[path] = data
                        d = path.rsplit("/", 1)[0] or "/"
                        outer.dirs.add(d if d.endswith("/") or d == "/" else d)
                    self._reply(201)
                    return
                if op == "MKDIRS":
                    with outer._lock:
                        outer.dirs.add(path.rstrip("/") or "/")
                    self._reply(200, b'{"boolean": true}')
                    return
                self._reply(400)

            def do_DELETE(self):
                path, q = self._parts()
                if path is None or q.get("op") != "DELETE":
                    self._reply(400)
                    return
                with outer._lock:
                    outer.files.pop(path, None)
                    if q.get("recursive") == "true":
                        for f in [f for f in outer.files
                                  if f.startswith(path.rstrip("/") + "/")]:
                            outer.files.pop(f)
                self._reply(200, b'{"boolean": true}')

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
