"""AWS service protocols beyond S3 — SQS, SNS, Kinesis, Firehose,
DynamoDB (incl. the PartiQL subset), Lambda Invoke and CloudWatch
PutMetricData — all from scratch off the public API references, plus an
in-process multi-service server for tests.

The reference's connectors (internal/impl/aws/input_sqs.go,
output_sqs.go, output_sns.go, input_kinesis.go, output_kinesis.go,
output_kinesis_firehose.go, output_dynamodb.go, cache_dynamodb.go,
processor_dynamodb_partiql.go, processor_lambda.go,
metrics_cloudwatch.go) use aws-sdk-go; here the same requests are
signed with the SigV4 signer shared with functions/s3_proto.py
(service-parameterized credential scope) and issued over plain HTTP, so
the connectors work against real AWS or any compatible emulator
(localstack, elasticmq, dynamodb-local...), while tests run against
:class:`MiniAwsServer` — which VERIFIES each request's SigV4 signature
by independent recomputation before acting on it.

Wire protocols implemented (all public):

- **AWS JSON 1.0/1.1** (SQS since 2023, Kinesis, DynamoDB, Firehose):
  ``POST /`` with ``X-Amz-Target: <Service_Version>.<Action>`` and a
  JSON body.
- **AWS Query** (SNS, CloudWatch monitoring): form-encoded
  ``Action=...&Param.member.1=...`` with XML responses.
- **Lambda REST**: ``POST /2015-03-31/functions/<name>/invocations``.

Mini-server semantics pinned to the published ones where a connector
depends on them: SQS visibility timeout + receipt-handle redelivery,
Kinesis md5-of-partition-key shard routing over an evenly split 128-bit
hash-key space with per-shard monotone sequence numbers (replayable via
``AFTER_SEQUENCE_NUMBER`` iterators), DynamoDB conditional put
(``attribute_not_exists``) returning ``ConditionalCheckFailedException``
— the atomic `add` primitive cache_dynamodb.go relies on.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Optional
from xml.sax.saxutils import escape

from benthos_spark.functions.s3_proto import sign_request, signing_key

MAX_HASH_KEY = 2 ** 128  # Kinesis hash key space upper bound (exclusive)


class AwsError(RuntimeError):
    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}")
        self.code = code


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class AwsClient:
    """Signed HTTP client for the JSON, Query and Lambda-REST protocols."""

    def __init__(self, endpoint: str, access_key: str = "test",
                 secret_key: str = "test", region: str = "us-east-1"):
        self.endpoint = endpoint.rstrip("/")
        self.access_key, self.secret_key, self.region = access_key, secret_key, region

    def _send(self, method: str, path: str, payload: bytes,
              headers: dict[str, str], service: str) -> bytes:
        url = self.endpoint + path
        signed = sign_request(method, url, headers, payload,
                              self.access_key, self.secret_key,
                              region=self.region, service=service)
        req = urllib.request.Request(url, data=payload, headers=signed,
                                     method=method)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:  # surface the AWS error code
            body = e.read()
            try:
                err = json.loads(body)
                code = (err.get("__type") or err.get("Error", {}).get("Code", "")).split("#")[-1]
                raise AwsError(code or str(e.code), err.get("message") or err.get("Message", ""))
            except (ValueError, AttributeError):
                m = re.search(rb"<Code>([^<]+)</Code>", body)
                if m:
                    raise AwsError(m.group(1).decode()) from None
                raise AwsError(str(e.code), body.decode("utf-8", "replace")) from None

    def json_call(self, service: str, target: str, body: dict) -> dict:
        """AWS JSON protocol: X-Amz-Target dispatch on POST /."""
        payload = json.dumps(body).encode()
        out = self._send("POST", "/", payload, {
            "Content-Type": "application/x-amz-json-1.0",
            "X-Amz-Target": target,
        }, service)
        return json.loads(out or b"{}")

    def query_call(self, service: str, action: str, params: dict[str, str]) -> str:
        """AWS Query protocol: form-encoded action, XML response."""
        form = {"Action": action, "Version": _QUERY_VERSIONS[service], **params}
        payload = urllib.parse.urlencode(form).encode()
        out = self._send("POST", "/", payload,
                         {"Content-Type": "application/x-www-form-urlencoded"},
                         service)
        return out.decode()

    def lambda_invoke(self, function: str, payload: bytes) -> bytes:
        return self._send(
            "POST", f"/2015-03-31/functions/{urllib.parse.quote(function)}/invocations",
            payload, {"Content-Type": "application/json"}, "lambda")


_QUERY_VERSIONS = {"sns": "2010-03-31", "monitoring": "2010-08-01"}


# -- typed service helpers ---------------------------------------------------


class SqsClient(AwsClient):
    def create_queue(self, name: str) -> str:
        return self.json_call("sqs", "AmazonSQS.CreateQueue",
                              {"QueueName": name})["QueueUrl"]

    def send_message_batch(self, queue_url: str,
                           entries: list[dict]) -> dict:
        return self.json_call("sqs", "AmazonSQS.SendMessageBatch",
                              {"QueueUrl": queue_url, "Entries": entries})

    def receive(self, queue_url: str, max_messages: int = 10,
                wait_time_s: int = 0, visibility_timeout_s: Optional[int] = None) -> list[dict]:
        body = {"QueueUrl": queue_url, "MaxNumberOfMessages": max_messages,
                "WaitTimeSeconds": wait_time_s,
                "MessageAttributeNames": ["All"]}
        if visibility_timeout_s is not None:
            body["VisibilityTimeout"] = visibility_timeout_s
        return self.json_call("sqs", "AmazonSQS.ReceiveMessage", body).get("Messages", [])

    def delete_batch(self, queue_url: str, receipts: list[str]) -> None:
        if receipts:
            self.json_call("sqs", "AmazonSQS.DeleteMessageBatch", {
                "QueueUrl": queue_url,
                "Entries": [{"Id": str(i), "ReceiptHandle": r}
                            for i, r in enumerate(receipts)]})

    def change_visibility(self, queue_url: str, receipt: str, timeout_s: int) -> None:
        self.json_call("sqs", "AmazonSQS.ChangeMessageVisibility", {
            "QueueUrl": queue_url, "ReceiptHandle": receipt,
            "VisibilityTimeout": timeout_s})


class KinesisClient(AwsClient):
    def create_stream(self, name: str, shards: int) -> None:
        self.json_call("kinesis", "Kinesis_20131202.CreateStream",
                       {"StreamName": name, "ShardCount": shards})

    def list_shards(self, name: str) -> list[dict]:
        return self.json_call("kinesis", "Kinesis_20131202.ListShards",
                              {"StreamName": name})["Shards"]

    def put_records(self, name: str, records: list[tuple[bytes, str]]) -> dict:
        return self.json_call("kinesis", "Kinesis_20131202.PutRecords", {
            "StreamName": name,
            "Records": [{"Data": base64.b64encode(d).decode(), "PartitionKey": pk}
                        for d, pk in records]})

    def shard_iterator(self, name: str, shard_id: str, kind: str,
                       after_seq: Optional[str] = None) -> str:
        body = {"StreamName": name, "ShardId": shard_id, "ShardIteratorType": kind}
        if after_seq is not None:
            body["StartingSequenceNumber"] = after_seq
        return self.json_call("kinesis", "Kinesis_20131202.GetShardIterator",
                              body)["ShardIterator"]

    def get_records(self, iterator: str, limit: int = 10000) -> dict:
        return self.json_call("kinesis", "Kinesis_20131202.GetRecords",
                              {"ShardIterator": iterator, "Limit": limit})


class FirehoseClient(AwsClient):
    def put_record_batch(self, stream: str, records: list[bytes]) -> dict:
        return self.json_call("firehose", "Firehose_20150804.PutRecordBatch", {
            "DeliveryStreamName": stream,
            "Records": [{"Data": base64.b64encode(d).decode()} for d in records]})


class DynamoDBClient(AwsClient):
    def create_table(self, name: str, hash_key: str) -> None:
        self.json_call("dynamodb", "DynamoDB_20120810.CreateTable", {
            "TableName": name,
            "KeySchema": [{"AttributeName": hash_key, "KeyType": "HASH"}],
            "AttributeDefinitions": [{"AttributeName": hash_key,
                                      "AttributeType": "S"}]})

    def put_item(self, table: str, item: dict,
                 condition: Optional[str] = None) -> None:
        body = {"TableName": table, "Item": item}
        if condition:
            body["ConditionExpression"] = condition
        self.json_call("dynamodb", "DynamoDB_20120810.PutItem", body)

    def get_item(self, table: str, key: dict,
                 consistent: bool = True) -> Optional[dict]:
        out = self.json_call("dynamodb", "DynamoDB_20120810.GetItem",
                             {"TableName": table, "Key": key,
                              "ConsistentRead": consistent})
        return out.get("Item")

    def delete_item(self, table: str, key: dict) -> None:
        self.json_call("dynamodb", "DynamoDB_20120810.DeleteItem",
                       {"TableName": table, "Key": key})

    def batch_write(self, table: str, requests: list[dict]) -> dict:
        return self.json_call("dynamodb", "DynamoDB_20120810.BatchWriteItem",
                              {"RequestItems": {table: requests}})

    def execute_statement(self, statement: str,
                          parameters: Optional[list] = None) -> list[dict]:
        body: dict[str, Any] = {"Statement": statement}
        if parameters:
            body["Parameters"] = parameters
        return self.json_call("dynamodb", "DynamoDB_20120810.ExecuteStatement",
                              body).get("Items", [])


class SnsClient(AwsClient):
    def create_topic(self, name: str) -> str:
        xml = self.query_call("sns", "CreateTopic", {"Name": name})
        return re.search(r"<TopicArn>([^<]+)</TopicArn>", xml).group(1)

    def subscribe_queue(self, topic_arn: str, queue: str) -> None:
        self.query_call("sns", "Subscribe", {"TopicArn": topic_arn,
                                             "Protocol": "sqs",
                                             "Endpoint": queue})

    def publish(self, topic_arn: str, message: str,
                group_id: Optional[str] = None) -> str:
        params = {"TopicArn": topic_arn, "Message": message}
        if group_id:
            params["MessageGroupId"] = group_id
        xml = self.query_call("sns", "Publish", params)
        return re.search(r"<MessageId>([^<]+)</MessageId>", xml).group(1)


class CloudWatchClient(AwsClient):
    def put_metric_data(self, namespace: str, datums: list[dict]) -> None:
        """datums: [{"name": str, "value": float, "unit": str,
        "dimensions": {k: v}}] — flattened to the Query member lists."""
        params: dict[str, str] = {"Namespace": namespace}
        for i, d in enumerate(datums, 1):
            p = f"MetricData.member.{i}"
            params[f"{p}.MetricName"] = d["name"]
            params[f"{p}.Value"] = repr(float(d["value"]))
            params[f"{p}.Unit"] = d.get("unit", "None")
            for j, (k, v) in enumerate(sorted((d.get("dimensions") or {}).items()), 1):
                params[f"{p}.Dimensions.member.{j}.Name"] = k
                params[f"{p}.Dimensions.member.{j}.Value"] = str(v)
        self.query_call("monitoring", "PutMetricData", params)


# ---------------------------------------------------------------------------
# Mini multi-service server
# ---------------------------------------------------------------------------


def _shard_for(partition_key: str, n_shards: int) -> int:
    """Kinesis routing: md5(partition key) as a 128-bit int into evenly
    split shard hash-key ranges (the published PutRecord semantics)."""
    h = int(hashlib.md5(partition_key.encode()).hexdigest(), 16)
    return min(h * n_shards // MAX_HASH_KEY, n_shards - 1)


_PARTIQL_SELECT = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+\"([^\"]+)\"(?:\s+WHERE\s+(\w+)\s*=\s*\?)?\s*$",
    re.IGNORECASE)
_PARTIQL_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+\"([^\"]+)\"\s+WHERE\s+(\w+)\s*=\s*\?\s*$",
    re.IGNORECASE)


class MiniAwsServer:
    """One loopback HTTP server hosting SQS + SNS + Kinesis + Firehose +
    DynamoDB + Lambda + CloudWatch, verifying every request's SigV4
    signature by independent recomputation (service taken from the
    credential scope, so one server validates all seven)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 secret_key: str = "test", monotonic_time: bool = False):
        self.host, self.port, self.secret = host, port, secret_key
        self._lock = threading.RLock()
        self._clock = [0.0]  # test hook: advance visibility time manually
        self.monotonic_time = monotonic_time
        self.sqs: dict[str, dict] = {}
        self.kinesis: dict[str, list[list[dict]]] = {}
        self.firehose: dict[str, list[bytes]] = {}
        self.dynamo: dict[str, dict] = {}
        self.sns: dict[str, list[str]] = {}
        self.lambdas: dict[str, Callable[[bytes], bytes]] = {}
        self.metrics: dict[str, list[dict]] = {}
        self._msg_seq = [0]

    # -- test hooks ----------------------------------------------------------
    def register_function(self, name: str, fn: Callable[[bytes], bytes]) -> None:
        self.lambdas[name] = fn

    def advance_clock(self, seconds: float) -> None:
        with self._lock:
            self._clock[0] += seconds

    def _now(self) -> float:
        if self.monotonic_time:
            import time
            return time.monotonic()
        return self._clock[0]

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "MiniAwsServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, body: bytes,
                       ctype: str = "application/x-amz-json-1.0") -> None:
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json_err(self, code: str, msg: str = "") -> None:
                self._reply(400, json.dumps(
                    {"__type": code, "message": msg}).encode())

            def _verify(self, payload: bytes) -> Optional[str]:
                """Recompute the signature from the raw request; return
                the scoped service name, or None on mismatch."""
                auth = self.headers.get("Authorization", "")
                m = re.match(
                    r"AWS4-HMAC-SHA256 Credential=([^/]+)/(\d+)/([^/]+)/([^/]+)/aws4_request, "
                    r"SignedHeaders=([^,]+), Signature=([0-9a-f]+)", auth)
                if not m:
                    return None
                _akid, date, region, service, signed_names, sig = m.groups()
                parsed = urllib.parse.urlparse(self.path)
                names = signed_names.split(";")
                canonical_headers = "".join(
                    f"{n}:{(self.headers.get(n) or '').strip()}\n" for n in names)
                payload_hash = hashlib.sha256(payload).hexdigest()
                from benthos_spark.functions.s3_proto import _canonical_query
                canonical = "\n".join([
                    self.command, parsed.path or "/",
                    _canonical_query(parsed.query),
                    canonical_headers, signed_names, payload_hash])
                scope = f"{date}/{region}/{service}/aws4_request"
                sts = "\n".join([
                    "AWS4-HMAC-SHA256", self.headers.get("x-amz-date", ""),
                    scope, hashlib.sha256(canonical.encode()).hexdigest()])
                want = hmac.new(signing_key(outer.secret, date, region, service),
                                sts.encode(), hashlib.sha256).hexdigest()
                return service if hmac.compare_digest(want, sig) else None

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n)
                service = self._verify(payload)
                if service is None:
                    self._json_err("IncompleteSignatureException",
                                   "signature mismatch")
                    return
                try:
                    if self.path.startswith("/2015-03-31/functions/"):
                        outer._handle_lambda(self, payload)
                    elif self.headers.get("X-Amz-Target"):
                        outer._handle_json(self, payload)
                    else:
                        outer._handle_query(self, payload)
                except AwsError as e:
                    self._json_err(e.code, str(e))

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    # -- lambda ---------------------------------------------------------------
    def _handle_lambda(self, h, payload: bytes) -> None:
        name = urllib.parse.unquote(h.path.split("/functions/")[1].split("/")[0])
        fn = self.lambdas.get(name)
        if fn is None:
            h._json_err("ResourceNotFoundException", f"function {name}")
            return
        try:
            out = fn(payload)
        except Exception as e:  # the unhandled-function-error shape
            h.send_response(200)
            h.send_header("X-Amz-Function-Error", "Unhandled")
            body = json.dumps({"errorMessage": str(e)}).encode()
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)
            return
        h._reply(200, out, "application/json")

    # -- JSON protocol (SQS / Kinesis / DynamoDB / Firehose) -------------------
    def _handle_json(self, h, payload: bytes) -> None:
        target = h.headers["X-Amz-Target"]
        action = target.split(".")[-1]
        body = json.loads(payload or b"{}")
        with self._lock:
            out = self._dispatch_json(target, action, body)
        h._reply(200, json.dumps(out).encode())

    def _dispatch_json(self, target: str, action: str, body: dict) -> dict:
        if target.startswith("AmazonSQS."):
            return self._sqs_action(action, body)
        if target.startswith("Kinesis_"):
            return self._kinesis_action(action, body)
        if target.startswith("DynamoDB_"):
            return self._dynamo_action(action, body)
        if target.startswith("Firehose_"):
            return self._firehose_action(action, body)
        raise AwsError("UnknownOperationException", target)

    # SQS ----------------------------------------------------------------
    def _queue(self, url_or_name: str) -> dict:
        name = url_or_name.rstrip("/").rsplit("/", 1)[-1]
        q = self.sqs.get(name)
        if q is None:
            raise AwsError("QueueDoesNotExist", name)
        return q

    def _sqs_action(self, action: str, body: dict) -> dict:
        if action == "CreateQueue":
            name = body["QueueName"]
            self.sqs.setdefault(name, {"msgs": [], "inflight": {}})
            return {"QueueUrl": f"{self.endpoint}/000000000000/{name}"}
        if action == "SendMessage":
            q = self._queue(body["QueueUrl"])
            mid = self._new_id()
            q["msgs"].append({"MessageId": mid, "Body": body["MessageBody"],
                              "MessageAttributes": body.get("MessageAttributes") or {}})
            return {"MessageId": mid}
        if action == "SendMessageBatch":
            q = self._queue(body["QueueUrl"])
            ok = []
            for e in body["Entries"]:
                mid = self._new_id()
                q["msgs"].append({"MessageId": mid, "Body": e["MessageBody"],
                                  "MessageAttributes": e.get("MessageAttributes") or {}})
                ok.append({"Id": e["Id"], "MessageId": mid})
            return {"Successful": ok, "Failed": []}
        if action == "ReceiveMessage":
            q = self._queue(body["QueueUrl"])
            now = self._now()
            # expire stale in-flight entries back onto the queue (redelivery)
            for rh in [rh for rh, (m, vis) in q["inflight"].items() if vis <= now]:
                msg, _ = q["inflight"].pop(rh)
                q["msgs"].insert(0, msg)
            vis_timeout = body.get("VisibilityTimeout", 30)
            out = []
            for _ in range(min(int(body.get("MaxNumberOfMessages", 1)), 10)):
                if not q["msgs"]:
                    break
                msg = q["msgs"].pop(0)
                rh = self._new_id()
                q["inflight"][rh] = (msg, now + vis_timeout)
                out.append({**msg, "ReceiptHandle": rh})
            return {"Messages": out} if out else {}
        if action == "DeleteMessage":
            self._queue(body["QueueUrl"])["inflight"].pop(body["ReceiptHandle"], None)
            return {}
        if action == "DeleteMessageBatch":
            q = self._queue(body["QueueUrl"])
            ok = []
            for e in body["Entries"]:
                q["inflight"].pop(e["ReceiptHandle"], None)
                ok.append({"Id": e["Id"]})
            return {"Successful": ok, "Failed": []}
        if action == "ChangeMessageVisibility":
            q = self._queue(body["QueueUrl"])
            rh = body["ReceiptHandle"]
            if rh in q["inflight"]:
                msg, _ = q["inflight"][rh]
                timeout = int(body["VisibilityTimeout"])
                if timeout == 0:  # reset_visibility: requeue immediately
                    q["inflight"].pop(rh)
                    q["msgs"].insert(0, msg)
                else:
                    q["inflight"][rh] = (msg, self._now() + timeout)
            return {}
        raise AwsError("UnknownOperationException", f"sqs {action}")

    # Kinesis ---------------------------------------------------------------
    def _stream(self, name: str) -> list[list[dict]]:
        s = self.kinesis.get(name)
        if s is None:
            raise AwsError("ResourceNotFoundException", name)
        return s

    def _kinesis_action(self, action: str, body: dict) -> dict:
        if action == "CreateStream":
            self.kinesis.setdefault(body["StreamName"],
                                    [[] for _ in range(int(body["ShardCount"]))])
            return {}
        if action == "ListShards":
            shards = self._stream(body["StreamName"])
            n = len(shards)
            return {"Shards": [
                {"ShardId": f"shardId-{i:012d}",
                 "HashKeyRange": {
                     "StartingHashKey": str(i * MAX_HASH_KEY // n),
                     "EndingHashKey": str((i + 1) * MAX_HASH_KEY // n - 1)},
                 "SequenceNumberRange": {"StartingSequenceNumber": "0"}}
                for i in range(n)]}
        if action in ("PutRecord", "PutRecords"):
            shards = self._stream(body["StreamName"])
            recs = (body["Records"] if action == "PutRecords"
                    else [{"Data": body["Data"], "PartitionKey": body["PartitionKey"]}])
            out = []
            for r in recs:
                i = _shard_for(r["PartitionKey"], len(shards))
                seq = str(len(shards[i]) + 1)
                shards[i].append({"SequenceNumber": seq,
                                  "PartitionKey": r["PartitionKey"],
                                  "Data": r["Data"]})
                out.append({"ShardId": f"shardId-{i:012d}", "SequenceNumber": seq})
            if action == "PutRecord":
                return out[0]
            return {"FailedRecordCount": 0, "Records": out}
        if action == "GetShardIterator":
            shards = self._stream(body["StreamName"])
            i = int(body["ShardId"].rsplit("-", 1)[-1])
            kind = body["ShardIteratorType"]
            if kind == "TRIM_HORIZON":
                idx = 0
            elif kind == "LATEST":
                idx = len(shards[i])
            elif kind == "AFTER_SEQUENCE_NUMBER":
                idx = int(body["StartingSequenceNumber"])
            elif kind == "AT_SEQUENCE_NUMBER":
                idx = int(body["StartingSequenceNumber"]) - 1
            else:
                raise AwsError("InvalidArgumentException", kind)
            it = base64.b64encode(json.dumps(
                {"s": body["StreamName"], "i": i, "x": idx}).encode()).decode()
            return {"ShardIterator": it}
        if action == "GetRecords":
            it = json.loads(base64.b64decode(body["ShardIterator"]))
            shard = self._stream(it["s"])[it["i"]]
            limit = int(body.get("Limit", 10000))
            recs = shard[it["x"]:it["x"] + limit]
            nxt = base64.b64encode(json.dumps(
                {"s": it["s"], "i": it["i"], "x": it["x"] + len(recs)}).encode()).decode()
            return {"Records": recs, "NextShardIterator": nxt,
                    "MillisBehindLatest": 0 if it["x"] + len(recs) >= len(shard) else 1}
        raise AwsError("UnknownOperationException", f"kinesis {action}")

    # Firehose ----------------------------------------------------------------
    def _firehose_action(self, action: str, body: dict) -> dict:
        if action == "PutRecordBatch":
            dest = self.firehose.setdefault(body["DeliveryStreamName"], [])
            out = []
            for r in body["Records"]:
                dest.append(base64.b64decode(r["Data"]))
                out.append({"RecordId": self._new_id()})
            return {"FailedPutCount": 0, "RequestResponses": out}
        raise AwsError("UnknownOperationException", f"firehose {action}")

    # DynamoDB ----------------------------------------------------------------
    def _table(self, name: str) -> dict:
        t = self.dynamo.get(name)
        if t is None:
            raise AwsError("ResourceNotFoundException", name)
        return t

    @staticmethod
    def _pk_of(table: dict, item: dict) -> str:
        attr = item[table["hash_key"]]
        return next(iter(attr.values()))

    def _dynamo_action(self, action: str, body: dict) -> dict:
        if action == "CreateTable":
            hk = next(k["AttributeName"] for k in body["KeySchema"]
                      if k["KeyType"] == "HASH")
            self.dynamo.setdefault(body["TableName"],
                                   {"hash_key": hk, "items": {}})
            return {"TableDescription": {"TableStatus": "ACTIVE"}}
        if action == "PutItem":
            t = self._table(body["TableName"])
            pk = self._pk_of(t, body["Item"])
            cond = body.get("ConditionExpression", "")
            if "attribute_not_exists" in cond and pk in t["items"]:
                raise AwsError("ConditionalCheckFailedException", pk)
            t["items"][pk] = body["Item"]
            return {}
        if action == "GetItem":
            t = self._table(body["TableName"])
            item = t["items"].get(self._pk_of(t, body["Key"]))
            return {"Item": item} if item else {}
        if action == "DeleteItem":
            t = self._table(body["TableName"])
            t["items"].pop(self._pk_of(t, body["Key"]), None)
            return {}
        if action == "BatchWriteItem":
            for table, reqs in body["RequestItems"].items():
                t = self._table(table)
                for r in reqs:
                    if "PutRequest" in r:
                        item = r["PutRequest"]["Item"]
                        t["items"][self._pk_of(t, item)] = item
                    else:
                        t["items"].pop(
                            self._pk_of(t, r["DeleteRequest"]["Key"]), None)
            return {"UnprocessedItems": {}}
        if action == "ExecuteStatement":
            return {"Items": self._partiql(body["Statement"],
                                           body.get("Parameters") or [])}
        raise AwsError("UnknownOperationException", f"dynamodb {action}")

    def _partiql(self, stmt: str, params: list) -> list[dict]:
        m = _PARTIQL_SELECT.match(stmt)
        if m:
            t = self._table(m.group(1))
            items = sorted(t["items"].values(),
                           key=lambda it: self._pk_of(t, it))
            col = m.group(2)
            if col is None:
                return items
            want = params[0]
            return [it for it in items if it.get(col) == want]
        m = _PARTIQL_DELETE.match(stmt)
        if m:
            t = self._table(m.group(1))
            col, want = m.group(2), params[0]
            for pk in [pk for pk, it in t["items"].items()
                       if it.get(col) == want]:
                t["items"].pop(pk)
            return []
        raise AwsError("ValidationException", f"unsupported PartiQL: {stmt}")

    # Query protocol (SNS / CloudWatch) ----------------------------------------
    def _handle_query(self, h, payload: bytes) -> None:
        form = dict(urllib.parse.parse_qsl(payload.decode(), keep_blank_values=True))
        action = form.get("Action", "")
        with self._lock:
            if action == "CreateTopic":
                arn = f"arn:aws:sns:us-east-1:000000000000:{form['Name']}"
                self.sns.setdefault(arn, [])
                body = f"<CreateTopicResult><TopicArn>{escape(arn)}</TopicArn></CreateTopicResult>"
            elif action == "Subscribe":
                self.sns.setdefault(form["TopicArn"], []).append(form["Endpoint"])
                body = "<SubscribeResult><SubscriptionArn>sub-1</SubscriptionArn></SubscribeResult>"
            elif action == "Publish":
                subs = self.sns.get(form["TopicArn"])
                if subs is None:
                    raise AwsError("NotFound", form["TopicArn"])
                mid = self._new_id()
                for queue in subs:
                    q = self.sqs.setdefault(queue, {"msgs": [], "inflight": {}})
                    q["msgs"].append({"MessageId": mid,
                                      "Body": form["Message"],
                                      "MessageAttributes": {}})
                body = f"<PublishResult><MessageId>{mid}</MessageId></PublishResult>"
            elif action == "PutMetricData":
                ns = self.metrics.setdefault(form["Namespace"], [])
                i = 1
                while f"MetricData.member.{i}.MetricName" in form:
                    p = f"MetricData.member.{i}"
                    dims = {}
                    j = 1
                    while f"{p}.Dimensions.member.{j}.Name" in form:
                        dims[form[f"{p}.Dimensions.member.{j}.Name"]] = \
                            form[f"{p}.Dimensions.member.{j}.Value"]
                        j += 1
                    ns.append({"name": form[f"{p}.MetricName"],
                               "value": float(form[f"{p}.Value"]),
                               "unit": form.get(f"{p}.Unit", "None"),
                               "dimensions": dims})
                    i += 1
                body = ""
            else:
                raise AwsError("InvalidAction", action)
        xml = (f'<{action}Response xmlns="http://sns.amazonaws.com/doc/2010-03-31/">'
               f"{body}<ResponseMetadata><RequestId>{self._new_id()}"
               f"</RequestId></ResponseMetadata></{action}Response>")
        h._reply(200, xml.encode(), "text/xml")

    def _new_id(self) -> str:
        with self._lock:  # RLock: safe under the dispatch lock too
            self._msg_seq[0] += 1
            return f"id-{self._msg_seq[0]:08d}"
