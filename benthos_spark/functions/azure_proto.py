"""Azure Blob Storage REST protocol — SharedKey signing, a minimal
client, and an in-process Azurite-style server, from scratch off the
public docs (learn.microsoft.com: "Authorize with Shared Key", the
Put Blob / Get Blob / List Blobs REST operations). The reference's
azure_blob_storage connectors (internal/impl/azure/input_blob_storage.go,
output_blob_storage.go) use the Azure SDK; the REST surface here works
against real accounts or Azurite, while tests run against
:class:`MiniAzureBlobServer` — which VERIFIES each request's SharedKey
signature by independent recomputation (the same
client-tested-by-the-server design as the S3 stack).

SharedKey string-to-sign (2019-12-12 canonicalization):
  VERB \n Content-Encoding \n Content-Language \n Content-Length \n
  Content-MD5 \n Content-Type \n Date \n If-Modified-Since \n If-Match
  \n If-None-Match \n If-Unmodified-Since \n Range \n
  CanonicalizedHeaders CanonicalizedResource
with Content-Length EMPTY when zero, x-ms-* headers sorted, and the
resource as /account/path plus sorted query params as name:value lines.
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import hmac
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from xml.sax.saxutils import escape

API_VERSION = "2019-12-12"


def string_to_sign(verb: str, headers: dict[str, str], account: str,
                   path: str, query: dict[str, str]) -> str:
    h = {k.lower(): v for k, v in headers.items()}
    cl = h.get("content-length", "")
    if cl == "0":
        cl = ""  # 2019-12-12 rule: zero length signs as empty
    canon_headers = "".join(
        f"{k}:{h[k].strip()}\n" for k in sorted(h) if k.startswith("x-ms-"))
    canon_resource = f"/{account}{path}"
    for k in sorted(query):
        canon_resource += f"\n{k.lower()}:{query[k]}"
    return "\n".join([
        verb.upper(), h.get("content-encoding", ""), h.get("content-language", ""),
        cl, h.get("content-md5", ""), h.get("content-type", ""), h.get("date", ""),
        h.get("if-modified-since", ""), h.get("if-match", ""),
        h.get("if-none-match", ""), h.get("if-unmodified-since", ""),
        h.get("range", ""),
    ]) + "\n" + canon_headers + canon_resource


def sign_shared_key(sts: str, account_key_b64: str) -> str:
    key = base64.b64decode(account_key_b64)
    return base64.b64encode(hmac.new(key, sts.encode(), hashlib.sha256).digest()).decode()


class AzureBlobClient:
    """Minimal Blob REST client: put/get/delete blob, list (flat)."""

    def __init__(self, endpoint: str, account: str = "devstoreaccount1",
                 key_b64: str = base64.b64encode(b"mini-azure-test-key").decode(),
                 timeout_s: float = 30.0):
        self.endpoint = (endpoint if endpoint.startswith("http")
                         else "http://" + endpoint).rstrip("/")
        self.account, self.key_b64, self._timeout = account, key_b64, timeout_s

    def _request(self, verb: str, path: str, query: dict[str, str],
                 payload: bytes = b"", extra_headers: Optional[dict] = None
                 ) -> tuple[int, bytes]:
        now = datetime.datetime.now(datetime.timezone.utc)
        headers = {
            "x-ms-date": now.strftime("%a, %d %b %Y %H:%M:%S GMT"),
            "x-ms-version": API_VERSION,
            "Content-Length": str(len(payload)),
            **(extra_headers or {}),
        }
        if verb == "PUT" and "Content-Type" not in headers:
            # urllib injects a default Content-Type on data requests;
            # set it explicitly so the signed headers match the wire
            headers["Content-Type"] = "application/octet-stream"
        sts = string_to_sign(verb, headers, self.account, path, query)
        headers["Authorization"] = (
            f"SharedKey {self.account}:{sign_shared_key(sts, self.key_b64)}")
        qs = urllib.parse.urlencode(query)
        url = self.endpoint + urllib.parse.quote(path) + (f"?{qs}" if qs else "")
        req = urllib.request.Request(
            url, data=payload if verb == "PUT" else None,
            headers=headers, method=verb)
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    def create_container(self, container: str) -> None:
        status, body = self._request("PUT", f"/{container}", {"restype": "container"})
        if status not in (201, 409):
            raise IOError(f"create_container: HTTP {status} {body[:200]!r}")

    def put_blob(self, container: str, name: str, data: bytes) -> None:
        status, body = self._request(
            "PUT", f"/{container}/{name}", {}, payload=data,
            extra_headers={"x-ms-blob-type": "BlockBlob"})
        if status != 201:
            raise IOError(f"put_blob {name}: HTTP {status} {body[:200]!r}")

    def get_blob(self, container: str, name: str) -> bytes:
        status, body = self._request("GET", f"/{container}/{name}", {})
        if status != 200:
            raise IOError(f"get_blob {name}: HTTP {status} {body[:200]!r}")
        return body

    def delete_blob(self, container: str, name: str) -> None:
        status, body = self._request("DELETE", f"/{container}/{name}", {})
        if status not in (202, 204):
            raise IOError(f"delete_blob {name}: HTTP {status} {body[:200]!r}")

    def list_blobs(self, container: str, prefix: str = "") -> list[dict]:
        query = {"restype": "container", "comp": "list"}
        if prefix:
            query["prefix"] = prefix
        status, body = self._request("GET", f"/{container}", query)
        if status != 200:
            raise IOError(f"list_blobs: HTTP {status} {body[:200]!r}")
        from xml.etree import ElementTree

        root = ElementTree.fromstring(body)
        out = []
        for b in root.iter("Blob"):
            out.append({"name": b.find("Name").text,
                        "size": int(b.find("Properties/Content-Length").text)})
        return sorted(out, key=lambda d: d["name"])


class MiniAzureBlobServer:
    """In-RAM Blob service: container create, Put/Get/Delete Blob, flat
    List Blobs with prefix. SharedKey signatures are recomputed and
    verified on every request (403 on mismatch)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 account: str = "devstoreaccount1",
                 key_b64: str = base64.b64encode(b"mini-azure-test-key").decode()):
        self._host, self._port = host, port
        self.account, self.key_b64 = account, key_b64
        self._server = None
        self.address = ""
        self.endpoint = ""
        self._lock = threading.Lock()
        self.containers: dict[str, dict[str, bytes]] = {}

    def start(self) -> "MiniAzureBlobServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _reply(self, status: int, body: bytes = b"",
                       ctype: str = "application/xml") -> None:
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _verify(self) -> bool:
                auth = self.headers.get("Authorization", "")
                if not auth.startswith(f"SharedKey {outer.account}:"):
                    return False
                got_sig = auth.split(":", 1)[1]
                parsed = urllib.parse.urlparse(self.path)
                query = dict(urllib.parse.parse_qsl(parsed.query,
                                                    keep_blank_values=True))
                sts = string_to_sign(self.command, dict(self.headers),
                                     outer.account,
                                     urllib.parse.unquote(parsed.path), query)
                want = sign_shared_key(sts, outer.key_b64)
                return hmac.compare_digest(want, got_sig)

            def _route(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n) if n else b""
                if not self._verify():
                    self._reply(403, b"<Error><Code>AuthenticationFailed</Code></Error>")
                    return
                parsed = urllib.parse.urlparse(self.path)
                query = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
                parts = urllib.parse.unquote(parsed.path).lstrip("/").split("/", 1)
                container = parts[0]
                blob = parts[1] if len(parts) > 1 else ""
                with outer._lock:
                    if self.command == "PUT" and query.get("restype") == "container":
                        outer.containers.setdefault(container, {})
                        self._reply(201)
                        return
                    store = outer.containers.get(container)
                    if store is None:
                        self._reply(404, b"<Error><Code>ContainerNotFound</Code></Error>")
                        return
                    if self.command == "PUT" and blob:
                        store[blob] = payload
                        self._reply(201)
                    elif self.command == "DELETE" and blob:
                        if store.pop(blob, None) is None:
                            self._reply(404, b"<Error><Code>BlobNotFound</Code></Error>")
                        else:
                            self._reply(202)
                    elif self.command == "GET" and blob:
                        data = store.get(blob)
                        if data is None:
                            self._reply(404, b"<Error><Code>BlobNotFound</Code></Error>")
                        else:
                            self._reply(200, data, "application/octet-stream")
                    elif self.command == "GET" and query.get("comp") == "list":
                        prefix = query.get("prefix", "")
                        items = "".join(
                            f"<Blob><Name>{escape(k)}</Name><Properties>"
                            f"<Content-Length>{len(v)}</Content-Length>"
                            f"</Properties></Blob>"
                            for k, v in sorted(store.items()) if k.startswith(prefix))
                        self._reply(200, (
                            '<?xml version="1.0" encoding="utf-8"?>'
                            f'<EnumerationResults ContainerName="{escape(container)}">'
                            f"<Blobs>{items}</Blobs><NextMarker/></EnumerationResults>"
                        ).encode())
                    else:
                        self._reply(400, b"<Error><Code>InvalidQueryParameterValue</Code></Error>")

            do_GET = do_PUT = do_DELETE = _route

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
