"""aws_s3 connector over the from-scratch SigV4 + S3 REST stack
(functions/s3_proto.py, operators/s3.py). The mini server VERIFIES
every request's signature by independent recomputation, so these tests
check the client's signing against the published algorithm, not against
itself. The SigV4 test vector below is from the AWS General Reference
"Signature Version 4 signing process" documentation (the canonical
get-vanilla example derivation)."""

from __future__ import annotations

import datetime
import time

import pytest

from benthos_spark.functions.s3_proto import (MiniS3Server, S3Client,
                                              sign_request, signing_key)
from benthos_spark.operators.s3 import S3Sink, S3Source


@pytest.fixture()
def s3():
    srv = MiniS3Server(access_key="AK", secret_key="SK").start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(s3):
    c = S3Client(s3.endpoint, access_key="AK", secret_key="SK")
    c.create_bucket("data")
    return c


# ---------------------------------------------------------------------------
# SigV4
# ---------------------------------------------------------------------------


def test_sigv4_signing_key_aws_doc_vector():
    # AWS docs "Deriving the signing key" example:
    # key=wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY, 20120215,
    # us-east-1, iam -> published kSigning hex
    k = signing_key("wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
                    "20120215", "us-east-1", "iam")
    assert k.hex() == ("f4780e2d9f65fa895f9c67b32ce1baf0b0d8a43505a000a1a9e090d414db404d")


def test_sigv4_headers_shape():
    hdrs = sign_request(
        "GET", "http://s3.local:9000/bucket/key.txt", {}, b"",
        "AKIDEXAMPLE", "secret",
        now=datetime.datetime(2015, 8, 30, 12, 36, tzinfo=datetime.timezone.utc))
    auth = hdrs["Authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/s3/aws4_request")
    assert "SignedHeaders=host;x-amz-content-sha256;x-amz-date" in auth
    assert hdrs["x-amz-date"] == "20150830T123600Z"


def test_bad_signature_rejected(s3):
    bad = S3Client(s3.endpoint, access_key="AK", secret_key="WRONG")
    with pytest.raises(IOError, match="403"):
        bad.put_object("data", "k", b"v")


# ---------------------------------------------------------------------------
# Client <-> server
# ---------------------------------------------------------------------------


def test_put_get_delete_roundtrip(client):
    client.put_object("data", "a/b.txt", b"hello s3")
    assert client.get_object("data", "a/b.txt") == b"hello s3"
    client.put_object("data", "key with spaces.txt", b"sp")
    assert client.get_object("data", "key with spaces.txt") == b"sp"
    client.delete_object("data", "a/b.txt")
    with pytest.raises(IOError, match="404"):
        client.get_object("data", "a/b.txt")


def test_list_objects_prefix_and_pagination(client):
    for i in range(7):
        client.put_object("data", f"logs/2026/{i:03d}.log", str(i).encode())
    client.put_object("data", "other/x", b"x")
    got = client.list_objects("data", prefix="logs/")
    assert [o["key"] for o in got] == [f"logs/2026/{i:03d}.log" for i in range(7)]
    # pagination path: small server pages via continuation token
    got_sa = client.list_objects("data", prefix="logs/", start_after="logs/2026/003.log")
    assert [o["key"] for o in got_sa] == [f"logs/2026/{i:03d}.log" for i in range(4, 7)]


# ---------------------------------------------------------------------------
# Spark source / sink
# ---------------------------------------------------------------------------


def test_sink_then_batch_source(spark, s3, client):
    df = spark.createDataFrame([(f"payload{i}",) for i in range(6)], "value string")
    S3Sink(s3.endpoint, "data", path_prefix="batch/",
           access_key="AK", secret_key="SK")(df, 42)
    src = S3Source(endpoint=s3.endpoint, bucket="data", prefix="batch/",
                   access_key="AK", secret_key="SK")
    rows = src.read(spark).collect()
    assert sorted(bytes(r.value).decode() for r in rows) == sorted(f"payload{i}" for i in range(6))
    assert all(r.key.startswith("batch/000000000042-") for r in rows)
    # replay idempotence: same batch_id overwrites the same keys
    S3Sink(s3.endpoint, "data", path_prefix="batch/",
           access_key="AK", secret_key="SK")(df, 42)
    assert src.read(spark).count() == 6


def test_lines_codec(spark, s3, client):
    client.put_object("data", "lines/f1", b"l1\nl2\nl3\n")
    src = S3Source(endpoint=s3.endpoint, bucket="data", prefix="lines/",
                   codec="lines", access_key="AK", secret_key="SK")
    rows = src.read(spark).collect()
    assert sorted(bytes(r.value).decode() for r in rows) == ["l1", "l2", "l3"]


def test_streaming_key_watermark_resume(spark, s3, client, tmp_path):
    """Key-watermark streaming: objects appended with increasing keys
    arrive exactly once across micro-batches and across a query restart
    on the same checkpoint."""
    client.put_object("data", "st/000.bin", b"first")
    src = S3Source(endpoint=s3.endpoint, bucket="data", prefix="st/",
                   streaming=True, access_key="AK", secret_key="SK")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_until(n, deadline_s=45):
        q = (src.read(spark).writeStream.format("parquet")
             .option("checkpointLocation", ckpt).option("path", out)
             .trigger(processingTime="300 milliseconds").start())
        try:
            deadline = time.time() + deadline_s
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= n:
                        return
                except Exception:
                    pass
                time.sleep(0.4)
            raise AssertionError(f"never reached {n} rows")
        finally:
            q.stop()

    run_until(1)
    client.put_object("data", "st/001.bin", b"second")
    run_until(2)
    rows = spark.read.parquet(out).collect()
    assert sorted(bytes(r.value).decode() for r in rows) == ["first", "second"]
    assert len(rows) == 2


def test_config_wiring(s3):
    from benthos_spark.config import _input, _output

    src = _input({"aws_s3": {"endpoint": s3.endpoint, "bucket": "b"}})
    assert isinstance(src, S3Source)
    sink = _output({"aws_s3": {"endpoint": s3.endpoint, "bucket": "b", "path": "p/"}})
    assert isinstance(sink, S3Sink) and sink.path_prefix == "p/"
