"""Snowflake stage-upload + Snowpipe REST protocol — from scratch off
the public docs (docs.snowflake.com: "Snowpipe REST API"
``insertFiles`` / ``insertReport``, and the SQL-API key-pair
authentication scheme: an RS256 JWT whose ``iss`` is
``ACCOUNT.USER.SHA256:<base64 fingerprint of the DER-encoded public
key>`` and ``sub`` is ``ACCOUNT.USER``). The reference's
snowflake_put output (internal/impl/snowflake/output_snowflake_put.go)
uses gosnowflake + golang-jwt; here the JWT is built over the repo's
own from-scratch RSA (functions/pki.py) and the mini server VERIFIES
it — recomputing the RSASSA-PKCS1-v1_5 signature and the key
fingerprint — before accepting uploads.

Stage uploads ride ``PUT /stages/<stage>/<path>`` on the same
endpoint — the loopback model of the driver's internal-stage upload
channel (real Snowflake brokers the upload through presigned cloud
storage; the connector surface — file lands in the stage, Snowpipe
picks it up by path — is identical)."""

from __future__ import annotations

import base64
import hashlib
import json
import threading
import time
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from benthos_spark.functions import pki


def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _der_int(v: int) -> bytes:
    body = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if body[0] & 0x80:
        body = b"\x00" + body
    return b"\x02" + _der_len(len(body)) + body


def _der_seq(*parts: bytes) -> bytes:
    body = b"".join(parts)
    return b"\x30" + _der_len(len(body)) + body


def rsa_spki_der(pub: pki.RsaPublic) -> bytes:
    """SubjectPublicKeyInfo DER for an RSA key (the form Snowflake
    fingerprints: base64(sha256(DER)))."""
    pkcs1 = _der_seq(_der_int(pub.n), _der_int(pub.e))
    alg = _der_seq(bytes.fromhex("06092a864886f70d010101"),  # rsaEncryption
                   b"\x05\x00")
    bitstr = b"\x03" + _der_len(len(pkcs1) + 1) + b"\x00" + pkcs1
    return _der_seq(alg, bitstr)


def key_fingerprint(pub: pki.RsaPublic) -> str:
    return "SHA256:" + base64.b64encode(
        hashlib.sha256(rsa_spki_der(pub)).digest()).decode()


def make_jwt(account: str, user: str, priv: pki.RsaPrivate,
             lifetime_s: int = 60, now: Optional[int] = None) -> str:
    """The published Snowflake key-pair JWT."""
    pub = pki.RsaPublic(priv.n, priv.e)
    qual = f"{account.upper()}.{user.upper()}"
    iat = int(time.time()) if now is None else now
    header = {"alg": "RS256", "typ": "JWT"}
    claims = {"iss": f"{qual}.{key_fingerprint(pub)}", "sub": qual,
              "iat": iat, "exp": iat + lifetime_s}
    signing_input = (_b64url(json.dumps(header, separators=(",", ":")).encode())
                     + "." +
                     _b64url(json.dumps(claims, separators=(",", ":")).encode()))
    sig = pki.rsa_sign(priv, signing_input.encode(), "sha256")
    return signing_input + "." + _b64url(sig)


def verify_jwt(token: str, account: str, user: str,
               pub: pki.RsaPublic) -> bool:
    try:
        signing_input, _, sig_b64 = token.rpartition(".")
        sig = base64.urlsafe_b64decode(sig_b64 + "==")
        if not pki.rsa_verify(pub, signing_input.encode(), sig, "sha256"):
            return False
        claims = json.loads(base64.urlsafe_b64decode(
            signing_input.split(".")[1] + "=="))
        qual = f"{account.upper()}.{user.upper()}"
        return (claims.get("sub") == qual
                and claims.get("iss") == f"{qual}.{key_fingerprint(pub)}"
                and claims.get("exp", 0) > time.time() - 1)
    except Exception:
        return False


class SnowflakeClient:
    def __init__(self, endpoint: str, account: str, user: str,
                 private_key: pki.RsaPrivate, timeout_s: float = 30.0):
        self.base = (endpoint if endpoint.startswith("http")
                     else "http://" + endpoint).rstrip("/")
        self.account, self.user = account, user
        self.key, self._timeout = private_key, timeout_s

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {make_jwt(self.account, self.user, self.key)}",
                "X-Snowflake-Authorization-Token-Type": "KEYPAIR_JWT",
                "Content-Type": "application/json"}

    def _req(self, method: str, path: str, payload: Optional[bytes] = None,
             ctype: Optional[str] = None) -> bytes:
        headers = self._headers()
        if ctype:
            headers["Content-Type"] = ctype
        req = urllib.request.Request(self.base + path, data=payload,
                                     headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            raise IOError(f"{method} {path}: {e.code} {e.read()!r}") from None

    def put_stage_file(self, stage: str, path: str, data: bytes) -> None:
        stage = stage.lstrip("@")
        self._req("PUT",
                  f"/stages/{urllib.parse.quote(stage, safe='')}/"
                  f"{urllib.parse.quote(path)}",
                  data, "application/octet-stream")

    def insert_files(self, pipe: str, files: list[str],
                     request_id: str = "r1") -> dict:
        body = json.dumps({"files": [{"path": p} for p in files]}).encode()
        out = self._req("POST",
                        f"/v1/data/pipes/{urllib.parse.quote(pipe)}/insertFiles"
                        f"?requestId={request_id}", body)
        return json.loads(out)

    def insert_report(self, pipe: str) -> list[dict]:
        out = self._req("GET",
                        f"/v1/data/pipes/{urllib.parse.quote(pipe)}/insertReport")
        return json.loads(out).get("files", [])


class MiniSnowflakeServer:
    """Stage store + Snowpipe: insertFiles 'loads' staged files into a
    per-pipe report, JWT verified on every request."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 account: str = "acct", user: str = "worker",
                 public_key: Optional[pki.RsaPublic] = None):
        self.host, self.port = host, port
        self.account, self.user, self.public_key = account, user, public_key
        self.stages: dict[str, dict[str, bytes]] = {}
        self.pipes: dict[str, list[dict]] = {}
        self._lock = threading.Lock()

    def start(self) -> "MiniSnowflakeServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, obj=None) -> None:
                body = json.dumps(obj or {}).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                auth = self.headers.get("Authorization", "")
                if not auth.startswith("Bearer "):
                    return False
                return verify_jwt(auth[7:], outer.account, outer.user,
                                  outer.public_key)

            def _handle(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n)
                if not self._authed():
                    self._reply(401, {"message": "JWT rejected"})
                    return
                parsed = urllib.parse.urlparse(self.path)
                parts = [urllib.parse.unquote(p)
                         for p in parsed.path.strip("/").split("/")]
                with outer._lock:
                    if self.command == "PUT" and parts[0] == "stages":
                        stage, path = parts[1], "/".join(parts[2:])
                        outer.stages.setdefault(stage, {})[path] = payload
                        self._reply(200, {"status": "UPLOADED"})
                        return
                    if (len(parts) == 5 and parts[:3] == ["v1", "data", "pipes"]
                            and parts[4] == "insertFiles"
                            and self.command == "POST"):
                        pipe = parts[3]
                        files = [f["path"] for f in json.loads(payload)["files"]]
                        staged = {p: d for s in outer.stages.values()
                                  for p, d in s.items()}
                        report = outer.pipes.setdefault(pipe, [])
                        for p in files:
                            ok = p in staged
                            report.append({
                                "path": p,
                                "status": "LOADED" if ok else "LOAD_FAILED",
                                "rowsInserted": (staged[p].count(b"\n") + 1
                                                 if ok and staged[p] else 0)})
                        self._reply(200, {"responseCode": "SUCCESS"})
                        return
                    if (len(parts) == 5 and parts[:3] == ["v1", "data", "pipes"]
                            and parts[4] == "insertReport"
                            and self.command == "GET"):
                        self._reply(200, {"files": outer.pipes.get(parts[3], [])})
                        return
                self._reply(404, {"message": "not found"})

            do_GET = do_POST = do_PUT = _handle

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
