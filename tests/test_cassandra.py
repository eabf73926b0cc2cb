"""cassandra connector over the from-scratch CQL v4 wire codec
(functions/cql_proto.py, operators/cassandra.py) — protocol units,
the reference's own doc-example config shapes
(internal/impl/cassandra/output.go:53-80), and a Spark roundtrip."""

from __future__ import annotations

import json
import struct

import pytest

from benthos_spark.functions.cql_proto import (CqlConnection, CqlError,
                                               MiniCassandraServer,
                                               deserialize_value,
                                               parse_query_body,
                                               parse_result_body,
                                               serialize_value)
from benthos_spark.operators.cassandra import CassandraSink, CassandraSource


@pytest.fixture()
def server():
    srv = MiniCassandraServer({
        "foo.bar": {"id": "bigint", "content": "varchar", "created_at": "timestamp"},
        "foospace.footable": {"doc": "varchar"},
        "t.types": {"i": "int", "b": "boolean", "d": "double", "x": "blob"},
    })
    yield srv
    srv.stop()


# -- wire units ---------------------------------------------------------------

def test_value_serialization_roundtrip():
    for v, tid_name in [(7, "bigint"), (3.5, "double"), (True, "boolean"),
                        ("héllo", "varchar"), (b"\x00\xff", "blob")]:
        data, tid = serialize_value(v)
        assert deserialize_value(data, tid) == v
    assert serialize_value(None)[0] is None


def test_query_body_roundtrip():
    from benthos_spark.functions.cql_proto import encode_query

    frame = encode_query("INSERT INTO a.b (x) VALUES (?)", [42, "s", None])
    body = frame[9:]
    q, values = parse_query_body(body)
    assert q == "INSERT INTO a.b (x) VALUES (?)"
    assert values[0] == struct.pack(">q", 42)
    assert values[1] == b"s"
    assert values[2] is None


def test_connection_handshake_insert_select(server):
    conn = CqlConnection(server.address)
    assert conn.execute(
        "INSERT INTO foo.bar (id, content, created_at) VALUES (?, ?, ?)",
        [1, "hello world", 1605219406000]) == []
    conn.execute(
        "INSERT INTO foo.bar (id, content, created_at) VALUES (?, ?, ?)",
        [2, "naïve ✓", None])
    rows = conn.execute("SELECT id, content, created_at FROM foo.bar")
    assert rows == [
        {"id": 1, "content": "hello world", "created_at": 1605219406000},
        {"id": 2, "content": "naïve ✓", "created_at": None},
    ]
    conn.close()


def test_typed_columns_roundtrip(server):
    conn = CqlConnection(server.address)
    conn.execute("INSERT INTO t.types (i, b, d, x) VALUES (?, ?, ?, ?)",
                 [5, True, 2.25, b"\x01\x02"])
    (row,) = conn.execute("SELECT * FROM t.types")
    assert row == {"i": 5, "b": True, "d": 2.25, "x": b"\x01\x02"}
    conn.close()


def test_server_error_frames(server):
    conn = CqlConnection(server.address)
    with pytest.raises(CqlError, match="unconfigured table"):
        conn.execute("SELECT * FROM no.table")
    with pytest.raises(CqlError, match="unsupported statement"):
        conn.execute("DROP TABLE foo.bar")
    # connection survives an error frame
    assert conn.execute("SELECT * FROM foo.bar") == []
    conn.close()


# -- Spark operators ------------------------------------------------------------

def test_sink_reference_doc_example_args_mapping(spark, server):
    """output.go:53-70 — JSON docs of the form
    {"id":"342354354","content":"hello world","timestamp":1605219406}."""
    import pandas as pd

    docs = [
        {"id": "342354354", "content": "hello world", "timestamp": 1605219406},
        {"id": "1", "content": "second", "timestamp": 1605219407},
    ]
    df = spark.createDataFrame(pd.DataFrame({"value": [json.dumps(d) for d in docs]}))
    sink = CassandraSink(
        addresses=[server.address],
        query="INSERT INTO foo.bar (id, content, created_at) VALUES (?, ?, ?)",
        args_mapping='[ this.id.number(), this.content, this.timestamp * 1000 ]',
    )
    sink(df, 0)
    stored = sorted(server.rows["foo.bar"], key=lambda r: r["id"])
    assert stored == [
        {"id": 1, "content": "second", "created_at": 1605219407000},
        {"id": 342354354, "content": "hello world", "created_at": 1605219406000},
    ]


def test_sink_insert_json_form(spark, server):
    """output.go:73-80 — INSERT ... JSON ? with root = [ this ]."""
    import pandas as pd

    # the mini server has no JSON-statement parser; the sink still must
    # pass the whole document as the single positional arg
    df = spark.createDataFrame(pd.DataFrame({"value": [json.dumps({"a": 1})]}))
    sink = CassandraSink(
        addresses=[server.address],
        query="INSERT INTO foospace.footable (doc) VALUES (?)",
        args_mapping="[ this.string() ]",
    )
    sink(df, 0)
    assert json.loads(server.rows["foospace.footable"][0]["doc"]) == {"a": 1}


def test_source_row_per_message(spark, server):
    conn = CqlConnection(server.address)
    for i in range(5):
        conn.execute("INSERT INTO foo.bar (id, content, created_at) VALUES (?, ?, ?)",
                     [i, f"msg{i}", None])
    conn.close()
    src = CassandraSource(addresses=[server.address],
                          query="SELECT id, content FROM foo.bar")
    df = src.read(spark)
    docs = sorted(json.loads(r.value)["id"] for r in df.collect())
    assert docs == [0, 1, 2, 3, 4]


def test_config_dispatch_roundtrip(spark, server, tmp_path):
    from benthos_spark.config import compile_config

    conn = CqlConnection(server.address)
    conn.execute("INSERT INTO foo.bar (id, content, created_at) VALUES (?, ?, ?)",
                 [9, "from-config", None])
    conn.close()
    conf = f"""
input:
  cassandra:
    addresses: [{server.address}]
    query: SELECT id, content FROM foo.bar
output:
  cassandra:
    addresses: [{server.address}]
    query: 'INSERT INTO foospace.footable (doc) VALUES (?)'
    args_mapping: '[ this.content ]'
"""
    pipe, sink = compile_config(conf)
    sink(pipe.run_batch(spark), 0)
    assert server.rows["foospace.footable"] == [{"doc": "from-config"}]
