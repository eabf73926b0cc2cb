"""S3 REST protocol — AWS Signature Version 4 signing, a minimal
path-style client, and an in-process S3-compatible server, all from
scratch off the public specs (AWS SigV4 documented in the AWS General
Reference "Signature Version 4 signing process"; the S3 REST API in the
Amazon S3 API Reference; ListObjectsV2 XML shape).

The reference's aws_s3 connectors (internal/impl/aws/input_s3.go,
output_s3.go) use aws-sdk-go; here requests are signed and issued
directly over HTTP so the connectors work against real S3 or any
S3-compatible store (minio, ceph-rgw...), while tests run against
:class:`MiniS3Server` — which VERIFIES each request's SigV4 signature
with the same key-derivation chain, so the client's signing is tested
against an independent recomputation, not trusted.

Path-style addressing (http://host:port/bucket/key) — the form every
S3-compatible store accepts (the output's force_path_style_urls field).
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import http.server
import io
import threading
import urllib.parse
import urllib.request
from typing import Optional
from xml.etree import ElementTree
from xml.sax.saxutils import escape

EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


# ---------------------------------------------------------------------------
# SigV4
# ---------------------------------------------------------------------------


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str, service: str = "s3") -> bytes:
    """kSigning = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
    service), "aws4_request") — the published derivation chain."""
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def _canonical_query(query: str) -> str:
    if not query:
        return ""
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    enc = [(urllib.parse.quote(k, safe="-_.~"), urllib.parse.quote(v, safe="-_.~"))
           for k, v in pairs]
    return "&".join(f"{k}={v}" for k, v in sorted(enc))


def sign_request(method: str, url: str, headers: dict[str, str],
                 payload: bytes, access_key: str, secret_key: str,
                 region: str = "us-east-1",
                 now: Optional[datetime.datetime] = None,
                 service: str = "s3") -> dict[str, str]:
    """Return headers + the SigV4 ``Authorization`` header for the
    request. Adds x-amz-date, x-amz-content-sha256 and host (S3 requires
    the signed payload hash header). ``service`` parameterizes the
    credential scope so the sqs/sns/kinesis/dynamodb/lambda/monitoring
    clients (functions/aws_proto.py) share this one signer."""
    parsed = urllib.parse.urlparse(url)
    now = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date = amz_date[:8]
    payload_hash = hashlib.sha256(payload).hexdigest()

    all_headers = {k.lower(): v for k, v in headers.items()}
    all_headers["host"] = parsed.netloc
    all_headers["x-amz-date"] = amz_date
    all_headers["x-amz-content-sha256"] = payload_hash

    signed_names = sorted(all_headers)
    canonical_headers = "".join(f"{k}:{all_headers[k].strip()}\n" for k in signed_names)
    # S3's SigV4 variant: the canonical URI is the request path AS SENT
    # (already percent-encoded once) — no re-encoding/normalization
    canonical_uri = parsed.path or "/"
    canonical = "\n".join([
        method.upper(), canonical_uri, _canonical_query(parsed.query),
        canonical_headers, ";".join(signed_names), payload_hash])
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest()])
    sig = hmac.new(signing_key(secret_key, date, region, service),
                   string_to_sign.encode(), hashlib.sha256).hexdigest()
    all_headers["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={';'.join(signed_names)}, Signature={sig}")
    return all_headers


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class S3Client:
    """Minimal path-style S3 client over urllib: put/get/delete object,
    list_objects_v2 with prefix + continuation, create_bucket."""

    def __init__(self, endpoint: str, access_key: str = "test",
                 secret_key: str = "test", region: str = "us-east-1",
                 timeout_s: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        if not self.endpoint.startswith("http"):
            self.endpoint = "http://" + self.endpoint
        self.access_key, self.secret_key, self.region = access_key, secret_key, region
        self._timeout = timeout_s

    def _request(self, method: str, path: str, payload: bytes = b"",
                 headers: Optional[dict] = None, query: str = "") -> tuple[int, bytes, dict]:
        url = self.endpoint + path + (f"?{query}" if query else "")
        signed = sign_request(method, url, headers or {}, payload,
                              self.access_key, self.secret_key, self.region)
        req = urllib.request.Request(url, data=payload if method in ("PUT", "POST") else None,
                                     headers=signed, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return resp.status, resp.read(), dict(resp.headers)
        except urllib.error.HTTPError as e:
            return e.code, e.read(), dict(e.headers)

    def create_bucket(self, bucket: str) -> None:
        status, body, _ = self._request("PUT", f"/{bucket}")
        if status not in (200, 409):
            raise IOError(f"create_bucket {bucket}: HTTP {status} {body[:200]!r}")

    def put_object(self, bucket: str, key: str, data: bytes,
                   content_type: str = "application/octet-stream") -> None:
        status, body, _ = self._request(
            "PUT", f"/{bucket}/{urllib.parse.quote(key)}", payload=data,
            headers={"content-type": content_type})
        if status != 200:
            raise IOError(f"put_object {bucket}/{key}: HTTP {status} {body[:200]!r}")

    def get_object(self, bucket: str, key: str) -> bytes:
        status, body, _ = self._request("GET", f"/{bucket}/{urllib.parse.quote(key)}")
        if status != 200:
            raise IOError(f"get_object {bucket}/{key}: HTTP {status} {body[:200]!r}")
        return body

    def delete_object(self, bucket: str, key: str) -> None:
        status, body, _ = self._request("DELETE", f"/{bucket}/{urllib.parse.quote(key)}")
        if status not in (200, 204):
            raise IOError(f"delete_object {bucket}/{key}: HTTP {status} {body[:200]!r}")

    def list_objects(self, bucket: str, prefix: str = "",
                     start_after: str = "") -> list[dict]:
        """All keys (paginated ListObjectsV2): [{key, size}] sorted by key."""
        out: list[dict] = []
        token = ""
        while True:
            q = "list-type=2&max-keys=1000"
            if prefix:
                q += "&prefix=" + urllib.parse.quote(prefix, safe="")
            if start_after:
                q += "&start-after=" + urllib.parse.quote(start_after, safe="")
            if token:
                q += "&continuation-token=" + urllib.parse.quote(token, safe="")
            status, body, _ = self._request("GET", f"/{bucket}", query=q)
            if status != 200:
                raise IOError(f"list_objects {bucket}: HTTP {status} {body[:200]!r}")
            root = ElementTree.fromstring(body)
            ns = root.tag.split("}")[0] + "}" if "}" in root.tag else ""
            for c in root.findall(f"{ns}Contents"):
                out.append({"key": c.find(f"{ns}Key").text,
                            "size": int(c.find(f"{ns}Size").text)})
            trunc = root.find(f"{ns}IsTruncated")
            if trunc is None or trunc.text != "true":
                return out
            token = root.find(f"{ns}NextContinuationToken").text


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------


class MiniS3Server:
    """In-RAM S3-compatible server: PUT/GET/DELETE object, PUT bucket,
    ListObjectsV2 (prefix/start-after/max-keys/continuation). Every
    request's SigV4 signature is INDEPENDENTLY recomputed and verified
    (403 SignatureDoesNotMatch on mismatch) — the client's signing path
    is therefore test-verified against the published algorithm."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self._host, self._port = host, port
        self.access_key, self.secret_key, self.region = access_key, secret_key, region
        self._lock = threading.Lock()
        self.buckets: dict[str, dict[str, bytes]] = {}
        self._server = None
        self.address = ""
        self.endpoint = ""

    def start(self) -> "MiniS3Server":
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _verify(self, payload: bytes) -> bool:
                auth = self.headers.get("Authorization", "")
                if not auth.startswith("AWS4-HMAC-SHA256 "):
                    return False
                fields = dict(p.strip().split("=", 1)
                              for p in auth[len("AWS4-HMAC-SHA256 "):].split(","))
                cred = fields["Credential"].split("/")
                access, date, region = cred[0], cred[1], cred[2]
                if access != outer.access_key:
                    return False
                signed_names = fields["SignedHeaders"].split(";")
                canonical_headers = "".join(
                    f"{n}:{(self.headers.get(n) or '').strip()}\n" for n in signed_names)
                parsed = urllib.parse.urlparse(self.path)
                payload_hash = self.headers.get("x-amz-content-sha256",
                                                hashlib.sha256(payload).hexdigest())
                canonical = "\n".join([
                    self.command, parsed.path or "/",  # raw path as sent
                    _canonical_query(parsed.query),
                    canonical_headers, fields["SignedHeaders"], payload_hash])
                string_to_sign = "\n".join([
                    "AWS4-HMAC-SHA256", self.headers["x-amz-date"],
                    f"{date}/{region}/s3/aws4_request",
                    hashlib.sha256(canonical.encode()).hexdigest()])
                want = hmac.new(signing_key(outer.secret_key, date, region),
                                string_to_sign.encode(), hashlib.sha256).hexdigest()
                return hmac.compare_digest(want, fields["Signature"])

            def _reply(self, status: int, body: bytes = b"",
                       content_type: str = "application/xml") -> None:
                self.send_response(status)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _err(self, status: int, code: str) -> None:
                self._reply(status, f"<Error><Code>{code}</Code></Error>".encode())

            def _route(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n) if n else b""
                if not self._verify(payload):
                    self._err(403, "SignatureDoesNotMatch")
                    return
                parsed = urllib.parse.urlparse(self.path)
                parts = urllib.parse.unquote(parsed.path).lstrip("/").split("/", 1)
                bucket = parts[0]
                key = parts[1] if len(parts) > 1 else ""
                q = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
                with outer._lock:
                    if self.command == "PUT" and not key:
                        outer.buckets.setdefault(bucket, {})
                        self._reply(200)
                        return
                    store = outer.buckets.get(bucket)
                    if store is None and not (self.command == "PUT" and key):
                        self._err(404, "NoSuchBucket")
                        return
                    if self.command == "PUT":
                        outer.buckets.setdefault(bucket, {})[key] = payload
                        self._reply(200)
                    elif self.command == "DELETE":
                        store.pop(key, None)
                        self._reply(204)
                    elif self.command == "GET" and key:
                        data = store.get(key)
                        if data is None:
                            self._err(404, "NoSuchKey")
                        else:
                            self._reply(200, data, "application/octet-stream")
                    elif self.command == "GET":
                        self._reply(200, outer._list_xml(bucket, q))
                    else:
                        self._err(405, "MethodNotAllowed")

            do_GET = do_PUT = do_DELETE = _route

        class Server(http.server.ThreadingHTTPServer):
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

    def _list_xml(self, bucket: str, q: dict) -> bytes:
        prefix = q.get("prefix", "")
        start_after = max(q.get("start-after", ""), q.get("continuation-token", ""))
        max_keys = int(q.get("max-keys", "1000"))
        keys = sorted(k for k in self.buckets.get(bucket, {})
                      if k.startswith(prefix) and k > start_after)
        page, rest = keys[:max_keys], keys[max_keys:]
        items = "".join(
            f"<Contents><Key>{escape(k)}</Key>"
            f"<Size>{len(self.buckets[bucket][k])}</Size></Contents>"
            for k in page)
        more = ""
        if rest:
            more = (f"<IsTruncated>true</IsTruncated>"
                    f"<NextContinuationToken>{escape(page[-1])}</NextContinuationToken>")
        else:
            more = "<IsTruncated>false</IsTruncated>"
        return (f'<?xml version="1.0" encoding="UTF-8"?>'
                f"<ListBucketResult><Name>{escape(bucket)}</Name>"
                f"<KeyCount>{len(page)}</KeyCount>{items}{more}"
                f"</ListBucketResult>").encode()
