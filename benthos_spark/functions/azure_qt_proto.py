"""Azure Queue Storage + Table Storage REST protocols — from scratch
off the public docs (learn.microsoft.com: "Queue Service REST API"
Put/Get/Delete Message XML operations; "Table Service REST API" OData
JSON entity operations; "Authorize with Shared Key" incl. the Table
service's distinct string-to-sign). The reference's connectors
(internal/impl/azure/input_queue_storage.go, output_queue_storage.go,
input_table_storage.go, output_table_storage.go) use the Azure SDK;
here the wire surface works against real accounts or Azurite, while
tests run against the mini servers below — which VERIFY each request's
SharedKey signature by independent recomputation.

Signing: the Queue service shares the Blob string-to-sign
(functions/azure_proto.string_to_sign — 2019-12-12 canonicalization);
the Table service uses its own published form
``VERB\\nContent-MD5\\nContent-Type\\nDate\\nCanonicalizedResource``
with the resource as /account/path plus ONLY a ``comp=`` query (no
x-ms-* header block) — implemented as :func:`table_string_to_sign`.

Queue messages ride the published XML envelope
(``<QueueMessage><MessageText>base64</MessageText></QueueMessage>``);
dequeue hands back a PopReceipt that Delete Message requires — the same
receive→process→delete at-least-once loop as SQS. Table entities are
OData JSON rows keyed (PartitionKey, RowKey); the query surface
supports ``$filter`` (eq/ne/gt/lt/ge/le joined by ``and``), ``$select``
and ``$top`` — the subset input_table_storage.go exposes.
"""

from __future__ import annotations

import base64
import datetime
import json
import re
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from xml.etree import ElementTree
from xml.sax.saxutils import escape

from benthos_spark.functions.azure_proto import (API_VERSION,
                                                 sign_shared_key,
                                                 string_to_sign)

DEFAULT_KEY = base64.b64encode(b"mini-azure-test-key").decode()


def table_string_to_sign(verb: str, headers: dict[str, str], account: str,
                         path: str, query: dict[str, str]) -> str:
    """The Table service SharedKey form (published separately from
    blob/queue): VERB, Content-MD5, Content-Type, Date, then the
    canonicalized resource with only the comp= query component."""
    h = {k.lower(): v for k, v in headers.items()}
    date = h.get("x-ms-date") or h.get("date", "")
    canon_resource = f"/{account}{path}"
    if "comp" in query:
        canon_resource += f"?comp={query['comp']}"
    return "\n".join([verb.upper(), h.get("content-md5", ""),
                      h.get("content-type", ""), date]) + "\n" + canon_resource


class _AzureHttp:
    def __init__(self, endpoint: str, account: str = "devstoreaccount1",
                 key_b64: str = DEFAULT_KEY, timeout_s: float = 30.0):
        self.endpoint = (endpoint if endpoint.startswith("http")
                         else "http://" + endpoint).rstrip("/")
        self.account, self.key_b64, self._timeout = account, key_b64, timeout_s

    def _request(self, verb: str, path: str, query: dict[str, str],
                 payload: bytes = b"", table_auth: bool = False,
                 content_type: Optional[str] = None) -> tuple[int, bytes]:
        now = datetime.datetime.now(datetime.timezone.utc)
        headers = {
            "x-ms-date": now.strftime("%a, %d %b %Y %H:%M:%S GMT"),
            "x-ms-version": API_VERSION,
            "Content-Length": str(len(payload)),
        }
        if payload or content_type:
            # urllib injects a Content-Type on data requests; set it
            # explicitly so the signed headers match the wire
            headers["Content-Type"] = content_type or "application/xml"
        if table_auth:
            headers["Accept"] = "application/json;odata=nometadata"
            sts = table_string_to_sign(verb, headers, self.account, path, query)
        else:
            sts = string_to_sign(verb, headers, self.account, path, query)
        headers["Authorization"] = (
            f"SharedKey {self.account}:{sign_shared_key(sts, self.key_b64)}")
        qs = urllib.parse.urlencode(query)
        url = self.endpoint + urllib.parse.quote(path, safe="/()'") + (f"?{qs}" if qs else "")
        req = urllib.request.Request(
            url, data=payload if payload else None, headers=headers, method=verb)
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()


class AzureQueueClient(_AzureHttp):
    """Queue REST client: create queue, put/get/delete messages."""

    def create_queue(self, queue: str) -> None:
        status, body = self._request("PUT", f"/{queue}", {})
        if status not in (201, 204, 409):
            raise IOError(f"create queue: {status} {body!r}")

    def put_message(self, queue: str, text: str) -> None:
        xml = ("<QueueMessage><MessageText>"
               f"{escape(base64.b64encode(text.encode()).decode())}"
               "</MessageText></QueueMessage>")
        status, body = self._request(
            "POST", f"/{queue}/messages", {}, xml.encode())
        if status != 201:
            raise IOError(f"put message: {status} {body!r}")

    def get_messages(self, queue: str, n: int = 32,
                     visibility_timeout_s: int = 30) -> list[dict]:
        status, body = self._request(
            "GET", f"/{queue}/messages",
            {"numofmessages": str(n),
             "visibilitytimeout": str(visibility_timeout_s)})
        if status != 200:
            raise IOError(f"get messages: {status} {body!r}")
        out = []
        for el in ElementTree.fromstring(body).findall("QueueMessage"):
            out.append({
                "id": el.findtext("MessageId"),
                "pop_receipt": el.findtext("PopReceipt"),
                "insertion_time": el.findtext("InsertionTime") or "",
                "text": base64.b64decode(el.findtext("MessageText") or "").decode(),
            })
        return out

    def delete_message(self, queue: str, msg_id: str, pop_receipt: str) -> None:
        status, body = self._request(
            "DELETE", f"/{queue}/messages/{msg_id}",
            {"popreceipt": pop_receipt})
        if status != 204:
            raise IOError(f"delete message: {status} {body!r}")

    def approximate_count(self, queue: str) -> int:
        status, body = self._request(
            "GET", f"/{queue}", {"comp": "metadata"})
        if status != 200:
            raise IOError(f"queue metadata: {status} {body!r}")
        return int(json.loads(body)["approximate_messages_count"])


class AzureTableClient(_AzureHttp):
    """Table REST client (OData nometadata JSON): create table,
    insert / insert-or-replace / insert-or-merge entities, query."""

    def create_table(self, table: str) -> None:
        status, body = self._request(
            "POST", "/Tables", {},
            json.dumps({"TableName": table}).encode(),
            table_auth=True, content_type="application/json")
        if status not in (201, 204, 409):
            raise IOError(f"create table: {status} {body!r}")

    def insert(self, table: str, entity: dict, mode: str = "INSERT") -> None:
        """mode: INSERT (fails on conflict) | INSERT_REPLACE |
        INSERT_MERGE — output_table_storage.go's insert_type values."""
        payload = json.dumps(entity).encode()
        if mode == "INSERT":
            status, body = self._request(
                "POST", f"/{table}", {}, payload,
                table_auth=True, content_type="application/json")
            ok = (201, 204)
        else:
            pk, rk = entity["PartitionKey"], entity["RowKey"]
            path = f"/{table}(PartitionKey='{pk}',RowKey='{rk}')"
            verb = "PUT" if mode == "INSERT_REPLACE" else "MERGE"
            status, body = self._request(
                verb, path, {}, payload,
                table_auth=True, content_type="application/json")
            ok = (204,)
        if status not in ok:
            raise IOError(f"insert {mode}: {status} {body!r}")

    def query(self, table: str, filter: Optional[str] = None,
              select: Optional[str] = None, top: Optional[int] = None) -> list[dict]:
        q: dict[str, str] = {}
        if filter:
            q["$filter"] = filter
        if select:
            q["$select"] = select
        if top:
            q["$top"] = str(top)
        status, body = self._request(
            "GET", f"/{table}()", q, table_auth=True)
        if status != 200:
            raise IOError(f"query: {status} {body!r}")
        return json.loads(body)["value"]


# ---------------------------------------------------------------------------
# Mini servers
# ---------------------------------------------------------------------------


_FILTER_TERM = re.compile(
    r"^\s*(\w+)\s+(eq|ne|gt|lt|ge|le)\s+'([^']*)'\s*$")


def _match_filter(entity: dict, expr: str) -> bool:
    """OData $filter subset: comparisons on string-rendered values
    joined by `and` (the operator set input_table_storage.go documents)."""
    for term in expr.split(" and "):
        m = _FILTER_TERM.match(term)
        if not m:
            raise ValueError(f"unsupported $filter term: {term!r}")
        prop, op, want = m.groups()
        have = str(entity.get(prop, ""))
        ok = {"eq": have == want, "ne": have != want, "gt": have > want,
              "lt": have < want, "ge": have >= want, "le": have <= want}[op]
        if not ok:
            return False
    return True


class _MiniAzureBase:
    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 account: str = "devstoreaccount1", key_b64: str = DEFAULT_KEY):
        self.host, self.port = host, port
        self.account, self.key_b64 = account, key_b64
        self._lock = threading.Lock()
        self._clock = [0.0]

    def advance_clock(self, seconds: float) -> None:
        with self._lock:
            self._clock[0] += seconds

    def start(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, body: bytes = b"",
                       ctype: str = "application/xml") -> None:
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _verify(self, payload_len: int) -> bool:
                auth = self.headers.get("Authorization", "")
                m = re.match(r"SharedKey ([^:]+):(.+)", auth)
                if not m or m.group(1) != outer.account:
                    return False
                parsed = urllib.parse.urlparse(self.path)
                query = dict(urllib.parse.parse_qsl(parsed.query,
                                                    keep_blank_values=True))
                headers = {k: v for k, v in self.headers.items()}
                headers["Content-Length"] = str(payload_len)
                path = urllib.parse.unquote(parsed.path)
                sts = outer._sts(self.command, headers, path, query)
                want = sign_shared_key(sts, outer.key_b64)
                return want == m.group(2)

            def _handle(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n)
                if not self._verify(n):
                    self._reply(403, b"<Error><Code>AuthenticationFailed</Code></Error>")
                    return
                parsed = urllib.parse.urlparse(self.path)
                query = dict(urllib.parse.parse_qsl(parsed.query,
                                                    keep_blank_values=True))
                with outer._lock:
                    outer._route(self, self.command,
                                 urllib.parse.unquote(parsed.path),
                                 query, payload)

            do_GET = do_PUT = do_POST = do_DELETE = do_MERGE = _handle

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


class MiniAzureQueueServer(_MiniAzureBase):
    """Queue service with PopReceipt + visibility-timeout redelivery."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.queues: dict[str, dict] = {}
        self._seq = 0

    def _sts(self, verb, headers, path, query):
        return string_to_sign(verb, headers, self.account, path, query)

    def _route(self, h, verb: str, path: str, query: dict, payload: bytes) -> None:
        parts = path.strip("/").split("/")
        # /queue[/messages[/id]] (account rides the canonical resource)
        if not parts or not parts[0]:
            h._reply(404)
            return
        qname = parts[0]
        if verb == "PUT" and len(parts) == 1:
            self.queues.setdefault(qname, {"msgs": [], "inflight": {}})
            h._reply(201)
            return
        q = self.queues.get(qname)
        if q is None:
            h._reply(404, b"<Error><Code>QueueNotFound</Code></Error>")
            return
        if verb == "GET" and len(parts) == 1 and query.get("comp") == "metadata":
            body = json.dumps({"approximate_messages_count":
                               len(q["msgs"]) + len(q["inflight"])}).encode()
            h._reply(200, body, "application/json")
            return
        now = self._clock[0]
        if verb == "POST" and parts[1:] == ["messages"]:
            text = ElementTree.fromstring(payload).findtext("MessageText") or ""
            self._seq += 1
            q["msgs"].append({"id": f"mid-{self._seq:06d}", "text": text,
                              "inserted": "2026-01-01T00:00:00Z"})
            h._reply(201)
            return
        if verb == "GET" and parts[1:] == ["messages"]:
            for pr in [pr for pr, (m, vis) in q["inflight"].items() if vis <= now]:
                msg, _ = q["inflight"].pop(pr)
                q["msgs"].insert(0, msg)
            n = int(query.get("numofmessages", "1"))
            vis_t = int(query.get("visibilitytimeout", "30"))
            out = []
            for _ in range(min(n, 32)):
                if not q["msgs"]:
                    break
                msg = q["msgs"].pop(0)
                self._seq += 1
                pr = f"pr-{self._seq:06d}"
                q["inflight"][pr] = (msg, now + vis_t)
                out.append(
                    f"<QueueMessage><MessageId>{msg['id']}</MessageId>"
                    f"<PopReceipt>{pr}</PopReceipt>"
                    f"<InsertionTime>{msg['inserted']}</InsertionTime>"
                    f"<MessageText>{escape(msg['text'])}</MessageText>"
                    "</QueueMessage>")
            h._reply(200, ("<QueueMessagesList>" + "".join(out) +
                           "</QueueMessagesList>").encode())
            return
        if verb == "DELETE" and len(parts) == 3 and parts[1] == "messages":
            pr = query.get("popreceipt", "")
            if pr in q["inflight"]:
                q["inflight"].pop(pr)
                h._reply(204)
            else:
                h._reply(404, b"<Error><Code>MessageNotFound</Code></Error>")
            return
        h._reply(400)


class MiniAzureTableServer(_MiniAzureBase):
    """Table service: Tables collection + entity CRUD + $filter query."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.tables: dict[str, dict[tuple[str, str], dict]] = {}

    def _sts(self, verb, headers, path, query):
        return table_string_to_sign(verb, headers, self.account, path, query)

    _ENTITY_PATH = re.compile(
        r"^/([^/()]+)\(PartitionKey='([^']*)',RowKey='([^']*)'\)$")

    def _route(self, h, verb: str, path: str, query: dict, payload: bytes) -> None:
        if verb == "POST" and path == "/Tables":
            name = json.loads(payload)["TableName"]
            self.tables.setdefault(name, {})
            h._reply(201, json.dumps({"TableName": name}).encode(),
                     "application/json")
            return
        m = self._ENTITY_PATH.match(path)
        if m:
            t = self.tables.get(m.group(1))
            if t is None:
                h._reply(404)
                return
            key = (m.group(2), m.group(3))
            if verb == "PUT":  # InsertOrReplace
                t[key] = json.loads(payload)
                h._reply(204)
                return
            if verb == "MERGE":  # InsertOrMerge
                t.setdefault(key, {}).update(json.loads(payload))
                h._reply(204)
                return
            if verb == "DELETE":
                t.pop(key, None)
                h._reply(204)
                return
        parts = path.strip("/").split("/")
        if len(parts) == 1 and parts[0]:
            name = parts[0].rstrip("()")
            t = self.tables.get(name)
            if t is None:
                h._reply(404, b'{"odata.error": {"code": "TableNotFound"}}',
                         "application/json")
                return
            if verb == "POST":  # Insert Entity (conflict on existing)
                e = json.loads(payload)
                key = (e["PartitionKey"], e["RowKey"])
                if key in t:
                    h._reply(409, b'{"odata.error": {"code": "EntityAlreadyExists"}}',
                             "application/json")
                    return
                t[key] = e
                h._reply(201, payload, "application/json")
                return
            if verb == "GET":
                rows = [t[k] for k in sorted(t)]
                flt = query.get("$filter")
                if flt:
                    rows = [r for r in rows if _match_filter(r, flt)]
                sel = query.get("$select")
                if sel:
                    cols = [c.strip() for c in sel.split(",")]
                    rows = [{c: r[c] for c in cols if c in r} for r in rows]
                top = query.get("$top")
                if top:
                    rows = rows[:int(top)]
                h._reply(200, json.dumps({"value": rows}).encode(),
                         "application/json")
                return
        h._reply(400)
