"""hdfs connectors over the from-scratch WebHDFS REST stack
(functions/webhdfs.py, operators/hdfs.py). The mini server enforces
the spec's two-step NameNode→DataNode CREATE redirect — a client that
PUTs data at the first URL is rejected."""

from __future__ import annotations

import urllib.request

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions.webhdfs import (MiniWebHdfsServer, WebHdfsClient,
                                             WebHdfsError)
from benthos_spark.operators.hdfs import HdfsSink, HdfsSource


@pytest.fixture()
def hdfs():
    srv = MiniWebHdfsServer().start()
    yield srv
    srv.stop()


def test_two_step_create_enforced(hdfs):
    # a naive single-step PUT with data is refused by the NameNode role
    url = (f"{hdfs.endpoint}/webhdfs/v1/direct.txt?op=CREATE&user.name=u")
    req = urllib.request.Request(url, data=b"cheat", method="PUT")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    # the client's two-step works
    c = WebHdfsClient(hdfs.endpoint, "u")
    c.create("/ok.txt", b"payload")
    assert c.open("/ok.txt") == b"payload"
    assert hdfs.files == {"/ok.txt": b"payload"}


def test_liststatus_and_delete(hdfs):
    c = WebHdfsClient(hdfs.endpoint)
    c.mkdirs("/logs")
    c.create("/logs/a.log", b"aa")
    c.create("/logs/b.log", b"bbb")
    c.create("/other.txt", b"x")
    ls = c.list_status("/logs")
    assert [(e["pathSuffix"], e["length"]) for e in ls] == \
        [("a.log", 2), ("b.log", 3)]
    c.delete("/logs/a.log")
    assert [e["pathSuffix"] for e in c.list_status("/logs")] == ["b.log"]


def test_overwrite_false_conflicts(hdfs):
    c = WebHdfsClient(hdfs.endpoint)
    c.create("/once.txt", b"1")
    with pytest.raises(WebHdfsError):
        c.create("/once.txt", b"2", overwrite=False)
    assert c.open("/once.txt") == b"1"


def test_namenode_failover_list(hdfs):
    # first host dead -> the second (live) one serves (input.go hosts)
    c = WebHdfsClient(["127.0.0.1:1", hdfs.endpoint])
    c.create("/ha.txt", b"v")
    assert c.open("/ha.txt") == b"v"


def test_sink_then_source_roundtrip(hdfs, spark):
    df = spark.createDataFrame(
        [("f1.txt", b"one"), ("f2.txt", b"two"), ("f3.txt", b"three")],
        "path string, value binary")
    HdfsSink([hdfs.endpoint], "/data", path_col="path")(df, 0)
    # replay overwrites the same files: no duplicates
    HdfsSink([hdfs.endpoint], "/data", path_col="path")(df, 0)
    src = HdfsSource(hosts=[hdfs.endpoint], directory="/data")
    rows = {r.key: bytes(r.value) for r in src.read(spark).collect()}
    assert rows == {"/data/f1.txt": b"one", "/data/f2.txt": b"two",
                    "/data/f3.txt": b"three"}


def test_config_wiring(hdfs, spark):
    from benthos_spark.config import _input, _output

    sink = _output({"hdfs": {"hosts": [hdfs.endpoint], "directory": "/cfg"}})
    sink(spark.createDataFrame([("payload",)], "value string"), 7)
    src = _input({"hdfs": {"hosts": [hdfs.endpoint], "directory": "/cfg"}})
    out = src.read(spark).collect()
    assert len(out) == 1 and bytes(out[0].value) == b"payload"
