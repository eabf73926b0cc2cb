"""gcp_cloud_storage / gcp_bigquery connectors over the from-scratch
JSON-API / REST-v2 clients (functions/gcp_proto.py,
operators/gcp_storage.py). The mini BigQuery server runs queries
through an embedded DuckDB, so the SQL surface is exercised against a
real engine."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions.gcp_proto import (BigQueryClient, GcsClient,
                                               GcsError, MiniBigQueryServer,
                                               MiniGcsServer)
from benthos_spark.operators.gcp_storage import (BigQuerySelectProcessor,
                                                 BigQuerySelectSource,
                                                 BigQuerySink, GcsCache,
                                                 GcsSink, GcsSource)


@pytest.fixture()
def gcs():
    srv = MiniGcsServer().start()
    yield srv
    srv.stop()


@pytest.fixture()
def bq():
    srv = MiniBigQueryServer().start()
    yield srv
    srv.stop()


def _client(gcs) -> GcsClient:
    c = GcsClient(gcs.endpoint)
    c.create_bucket("b")
    return c


# ---------------------------------------------------------------------------
# wire-level
# ---------------------------------------------------------------------------


def test_gcs_atomic_create(gcs):
    c = _client(gcs)
    c.insert_object("b", "k", b"v1", if_generation_match=0)
    with pytest.raises(GcsError):  # the published 412 on generation 0
        c.insert_object("b", "k", b"v2", if_generation_match=0)
    assert c.get_object("b", "k") == b"v1"
    c.insert_object("b", "k", b"v2")  # unconditional overwrite
    assert c.get_object("b", "k") == b"v2"


def test_gcs_list_prefix(gcs):
    c = _client(gcs)
    for name in ("a/1", "a/2", "b/1"):
        c.insert_object("b", name, b"x")
    assert [o["name"] for o in c.list_objects("b", "a/")] == ["a/1", "a/2"]


def test_bigquery_duckdb_roundtrip(bq):
    c = BigQueryClient(bq.endpoint, "test-project")
    c.insert_all("ds", "t", [{"k": "a", "n": 1}, {"k": "b", "n": 2}])
    rows = c.query("SELECT k, n FROM `test-project.ds.t` WHERE n > ? ORDER BY k",
                   ["1"])
    assert rows == [{"k": "b", "n": "2"}]


# ---------------------------------------------------------------------------
# Spark connectors
# ---------------------------------------------------------------------------


def test_gcs_sink_collision_modes_and_source(gcs, spark):
    c = _client(gcs)
    df = spark.createDataFrame([("p1", b"one"), ("p2", b"two")],
                               "path string, value binary")
    GcsSink(gcs.endpoint, "b", path_col="path")(df, 0)
    # error-if-exists surfaces the conflict
    with pytest.raises(Exception):
        GcsSink(gcs.endpoint, "b", path_col="path",
                collision_mode="error-if-exists")(df, 0)
    # ignore keeps originals; append concatenates
    GcsSink(gcs.endpoint, "b", path_col="path", collision_mode="ignore")(df, 0)
    assert c.get_object("b", "p1") == b"one"
    GcsSink(gcs.endpoint, "b", path_col="path", collision_mode="append")(df, 0)
    assert c.get_object("b", "p1") == b"oneone"

    src = GcsSource(endpoint=gcs.endpoint, bucket="b")
    rows = {r.key: bytes(r.value) for r in src.read(spark).collect()}
    assert rows == {"p1": b"oneone", "p2": b"twotwo"}


def test_gcs_source_delete_objects(gcs, spark):
    c = _client(gcs)
    c.insert_object("b", "once", b"data")
    src = GcsSource(endpoint=gcs.endpoint, bucket="b", delete_objects=True)
    assert [r.key for r in src.read(spark).collect()] == ["once"]
    assert c.list_objects("b") == []


def test_gcs_cache(gcs):
    _client(gcs)
    cache = GcsCache(gcs.endpoint, "b")
    assert cache.get("k") is None
    cache.set("k", "v")
    assert cache.get("k") == "v"
    assert cache.add("k", "w") is False   # atomic ifGenerationMatch=0
    assert cache.add("k2", "x") is True
    cache.delete("k")
    assert cache.get("k") is None


def test_bigquery_sink_then_select_source(bq, spark):
    df = spark.range(10).select(
        F.to_json(F.struct(
            F.col("id").alias("n"),
            F.concat(F.lit("row-"), F.col("id")).alias("name"))).alias("value"))
    BigQuerySink(bq.endpoint, "test-project", "ds", "rows")(df, 0)
    src = BigQuerySelectSource(
        endpoint=bq.endpoint, project="test-project", table="ds.rows",
        columns=["name"], where="n >= ?", args=["8"],
        suffix="ORDER BY name")
    out = [json.loads(r.value) for r in src.read(spark).collect()]
    assert out == [{"name": "row-8"}, {"name": "row-9"}]


def test_bigquery_select_processor(bq, spark):
    c = BigQueryClient(bq.endpoint, "test-project")
    c.insert_all("ds", "users", [{"uid": "u1", "tier": "gold"},
                                 {"uid": "u2", "tier": "free"}])
    df = spark.createDataFrame([("gold",)], "value string")
    proc = BigQuerySelectProcessor(
        bq.endpoint, "test-project", "ds.users", columns=["uid"],
        where="tier = ?", args_cols=["value"])
    out = json.loads(proc(df).collect()[0].value)
    assert out == [{"uid": "u1"}]


def test_config_wiring(gcs, bq, spark):
    from benthos_spark.config import _cache_resource, _input, _output

    _client(gcs)
    sink = _output({"gcp_cloud_storage": {
        "endpoint": gcs.endpoint, "bucket": "b", "path_col": "path"}})
    sink(spark.createDataFrame([("cfg", b"v")], "path string, value binary"), 0)
    src = _input({"gcp_cloud_storage": {"endpoint": gcs.endpoint, "bucket": "b",
                                        "prefix": "cfg"}})
    assert [bytes(r.value) for r in src.read(spark).collect()] == [b"v"]

    cache = _cache_resource({"label": "x", "gcp_cloud_storage": {
        "endpoint": gcs.endpoint, "bucket": "b"}})
    assert cache.add("ck", "1") is True and cache.add("ck", "2") is False

    BigQueryClient(bq.endpoint, "p").insert_all("d", "t", [{"a": 1}])
    bsrc = _input({"gcp_bigquery_select": {
        "endpoint": bq.endpoint, "project": "p", "table": "d.t"}})
    assert json.loads(bsrc.read(spark).collect()[0].value) == {"a": "1"}
