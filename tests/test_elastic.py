"""elasticsearch output over the public _bulk REST API
(operators/elastic.py) against the loopback MiniElasticServer."""

from __future__ import annotations

import json
import urllib.request

import pytest

from benthos_spark.operators.elastic import ElasticsearchSink, MiniElasticServer


@pytest.fixture()
def es():
    s = MiniElasticServer().start()
    yield s
    s.stop()


def _get(es, path):
    with urllib.request.urlopen(es.endpoint + path, timeout=10) as r:
        return json.loads(r.read())


def test_bulk_index_with_ids(spark, es):
    df = spark.createDataFrame(
        [(json.dumps({"name": f"d{i}", "v": i}), f"id{i}") for i in range(5)],
        "value string, did string")
    ElasticsearchSink(es.endpoint, index="docs", id_col="did")(df, 0)
    assert _get(es, "/docs/_count")["count"] == 5
    got = _get(es, "/docs/_doc/id3")
    assert got["found"] and got["_source"] == {"name": "d3", "v": 3}
    # replay idempotence: same ids overwrite, no duplicates
    ElasticsearchSink(es.endpoint, index="docs", id_col="did")(df, 0)
    assert _get(es, "/docs/_count")["count"] == 5


def test_bulk_auto_ids_and_index_col(spark, es):
    df = spark.createDataFrame(
        [(json.dumps({"k": 1}), "ix_a"), (json.dumps({"k": 2}), "ix_b")],
        "value string, target string")
    ElasticsearchSink(es.endpoint, index="unused", index_col="target")(df, 0)
    assert _get(es, "/ix_a/_count")["count"] == 1
    assert _get(es, "/ix_b/_count")["count"] == 1


def test_bulk_delete_and_update_actions(spark, es):
    base = spark.createDataFrame([(json.dumps({"a": 1, "b": 1}), "x")],
                                 "value string, did string")
    ElasticsearchSink(es.endpoint, index="mut", id_col="did")(base, 0)
    upd = spark.createDataFrame([(json.dumps({"b": 2}), "x")], "value string, did string")
    ElasticsearchSink(es.endpoint, index="mut", id_col="did", action="update")(upd, 1)
    assert _get(es, "/mut/_doc/x")["_source"] == {"a": 1, "b": 2}
    ElasticsearchSink(es.endpoint, index="mut", id_col="did", action="delete")(base, 2)
    assert _get(es, "/mut/_count")["count"] == 0


def test_bulk_error_fails_batch(spark, es):
    df = spark.createDataFrame([(json.dumps({"x": 1}), "dup")], "value string, did string")
    ElasticsearchSink(es.endpoint, index="c", id_col="did", action="create")(df, 0)
    with pytest.raises(Exception, match="failed items"):
        ElasticsearchSink(es.endpoint, index="c", id_col="did", action="create")(df, 1)


def test_search_and_config_wiring(spark, es):
    df = spark.createDataFrame([(json.dumps({"t": "hello"}), "s1")],
                               "value string, did string")
    ElasticsearchSink(es.endpoint, index="srch", id_col="did")(df, 0)
    hits = _get(es, "/srch/_search")["hits"]
    assert hits["total"]["value"] == 1
    assert hits["hits"][0]["_source"] == {"t": "hello"}
    from benthos_spark.config import _output

    sink = _output({"elasticsearch": {"url": es.endpoint, "index": "i"}})
    assert isinstance(sink, ElasticsearchSink)
    with pytest.raises(ValueError, match="action"):
        ElasticsearchSink(es.endpoint, index="i", action="nope")
