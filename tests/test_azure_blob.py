"""azure_blob_storage connector over the from-scratch SharedKey REST
stack (functions/azure_proto.py, operators/azure_blob.py). The mini
server verifies every SharedKey signature by independent recomputation."""

from __future__ import annotations

import base64

import pytest

from benthos_spark.functions.azure_proto import (AzureBlobClient,
                                                 MiniAzureBlobServer,
                                                 sign_shared_key,
                                                 string_to_sign)
from benthos_spark.operators.azure_blob import AzureBlobSink, AzureBlobSource


@pytest.fixture()
def azure():
    s = MiniAzureBlobServer().start()
    yield s
    s.stop()


@pytest.fixture()
def client(azure):
    c = AzureBlobClient(azure.endpoint)
    c.create_container("data")
    return c


def test_string_to_sign_shape():
    sts = string_to_sign(
        "PUT",
        {"x-ms-date": "Mon, 01 Jan 2026 00:00:00 GMT", "x-ms-version": "2019-12-12",
         "Content-Length": "5", "x-ms-blob-type": "BlockBlob"},
        "acct", "/c/b.txt", {})
    lines = sts.split("\n")
    assert lines[0] == "PUT"
    assert lines[3] == "5"  # Content-Length position
    # x-ms headers sorted, then the canonical resource
    assert "x-ms-blob-type:BlockBlob" in sts
    assert sts.index("x-ms-blob-type") < sts.index("x-ms-date") < sts.index("x-ms-version")
    assert sts.endswith("/acct/c/b.txt")
    # zero content-length signs as empty (2019-12-12 rule)
    sts0 = string_to_sign("GET", {"Content-Length": "0"}, "a", "/c", {"comp": "list"})
    assert "\n0\n" not in sts0
    assert sts0.endswith("/a/c\ncomp:list")


def test_signature_is_deterministic_hmac():
    key = base64.b64encode(b"k").decode()
    assert sign_shared_key("abc", key) == sign_shared_key("abc", key)
    assert sign_shared_key("abc", key) != sign_shared_key("abd", key)


def test_bad_key_rejected(azure):
    bad = AzureBlobClient(azure.endpoint, key_b64=base64.b64encode(b"WRONG").decode())
    with pytest.raises(IOError, match="403"):
        bad.create_container("x")


def test_put_get_list_delete(client):
    client.put_blob("data", "a/one.txt", b"first")
    client.put_blob("data", "a/two.txt", b"second!")
    client.put_blob("data", "b/other.txt", b"x")
    assert client.get_blob("data", "a/one.txt") == b"first"
    got = client.list_blobs("data", prefix="a/")
    assert [(b["name"], b["size"]) for b in got] == [("a/one.txt", 5), ("a/two.txt", 7)]
    client.delete_blob("data", "a/one.txt")
    with pytest.raises(IOError, match="404"):
        client.get_blob("data", "a/one.txt")


def test_sink_then_source(spark, azure, client):
    df = spark.createDataFrame([(f"blob{i}",) for i in range(5)], "value string")
    AzureBlobSink(azure.endpoint, "data", path_prefix="batch/")(df, 7)
    src = AzureBlobSource(endpoint=azure.endpoint, container="data", prefix="batch/")
    rows = src.read(spark).collect()
    assert sorted(bytes(r.value).decode() for r in rows) == sorted(f"blob{i}" for i in range(5))
    assert all(r.name.startswith("batch/000000000007-") for r in rows)
    # replay idempotence
    AzureBlobSink(azure.endpoint, "data", path_prefix="batch/")(df, 7)
    assert src.read(spark).count() == 5


def test_lines_codec_and_empty_prefix(spark, azure, client):
    client.put_blob("data", "lines/l", b"a\nb\n")
    src = AzureBlobSource(endpoint=azure.endpoint, container="data",
                          prefix="lines/", codec="lines")
    assert sorted(bytes(r.value).decode() for r in src.read(spark).collect()) == ["a", "b"]
    empty = AzureBlobSource(endpoint=azure.endpoint, container="data", prefix="nope/")
    assert empty.read(spark).count() == 0


def test_config_wiring(azure):
    from benthos_spark.config import _input, _output

    src = _input({"azure_blob_storage": {"endpoint": azure.endpoint, "container": "c"}})
    assert isinstance(src, AzureBlobSource)
    sink = _output({"azure_blob_storage": {"endpoint": azure.endpoint, "container": "c"}})
    assert isinstance(sink, AzureBlobSink)
