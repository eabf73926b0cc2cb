"""azure_queue_storage / azure_table_storage connectors over the
from-scratch SharedKey REST stack (functions/azure_qt_proto.py,
operators/azure_qt.py). Both mini servers verify every request's
SharedKey signature by independent recomputation — the Table service
against its own published string-to-sign form, distinct from
blob/queue."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions.azure_qt_proto import (AzureQueueClient,
                                                    AzureTableClient,
                                                    MiniAzureQueueServer,
                                                    MiniAzureTableServer,
                                                    _match_filter,
                                                    table_string_to_sign)
from benthos_spark.operators.azure_qt import (AzureQueueSink,
                                              AzureQueueSource,
                                              AzureTableSink,
                                              AzureTableSource)


@pytest.fixture()
def qsrv():
    srv = MiniAzureQueueServer().start()
    yield srv
    srv.stop()


@pytest.fixture()
def tsrv():
    srv = MiniAzureTableServer().start()
    yield srv
    srv.stop()


# ---------------------------------------------------------------------------
# wire-level
# ---------------------------------------------------------------------------


def test_table_string_to_sign_shape():
    sts = table_string_to_sign(
        "GET", {"x-ms-date": "Mon, 01 Jan 2026 00:00:00 GMT",
                "Content-Type": "application/json"},
        "acct", "/People()", {"$filter": "x eq 'y'"})
    # the table form: VERB, MD5, Content-Type, Date, resource (no $filter)
    assert sts == ("GET\n\napplication/json\n"
                   "Mon, 01 Jan 2026 00:00:00 GMT\n/acct/People()")


def test_queue_bad_key_rejected(qsrv):
    bad = AzureQueueClient(qsrv.endpoint, key_b64="d3Jvbmcta2V5")
    with pytest.raises(IOError):
        bad.create_queue("q")


def test_queue_visibility_redelivery(qsrv):
    c = AzureQueueClient(qsrv.endpoint)
    c.create_queue("q")
    c.put_message("q", "hello")
    got = c.get_messages("q", visibility_timeout_s=10)
    assert [m["text"] for m in got] == ["hello"]
    assert c.get_messages("q") == []          # in flight
    qsrv.advance_clock(11)
    again = c.get_messages("q")               # redelivered
    assert [m["text"] for m in again] == ["hello"]
    c.delete_message("q", again[0]["id"], again[0]["pop_receipt"])
    qsrv.advance_clock(60)
    assert c.get_messages("q") == []


def test_queue_stale_pop_receipt_404(qsrv):
    c = AzureQueueClient(qsrv.endpoint)
    c.create_queue("q")
    c.put_message("q", "x")
    m = c.get_messages("q", visibility_timeout_s=1)[0]
    qsrv.advance_clock(2)
    c.get_messages("q")  # re-dequeue invalidates the old receipt
    with pytest.raises(IOError):
        c.delete_message("q", m["id"], m["pop_receipt"])


def test_table_insert_conflict_and_upserts(tsrv):
    c = AzureTableClient(tsrv.endpoint)
    c.create_table("People")
    c.insert("People", {"PartitionKey": "p", "RowKey": "1", "name": "ann"})
    with pytest.raises(IOError):  # plain INSERT conflicts
        c.insert("People", {"PartitionKey": "p", "RowKey": "1", "name": "bob"})
    c.insert("People", {"PartitionKey": "p", "RowKey": "1", "name": "bob"},
             mode="INSERT_REPLACE")
    c.insert("People", {"PartitionKey": "p", "RowKey": "1", "age": 4},
             mode="INSERT_MERGE")
    rows = c.query("People")
    assert rows == [{"PartitionKey": "p", "RowKey": "1",
                     "name": "bob", "age": 4}]


def test_table_filter_select_top(tsrv):
    c = AzureTableClient(tsrv.endpoint)
    c.create_table("T")
    for i in range(5):
        c.insert("T", {"PartitionKey": "p", "RowKey": str(i),
                       "tier": "gold" if i % 2 == 0 else "free"})
    rows = c.query("T", filter="tier eq 'gold' and RowKey gt '0'",
                   select="RowKey", top=1)
    assert rows == [{"RowKey": "2"}]


def test_filter_operator_table():
    e = {"a": "m"}
    assert _match_filter(e, "a ge 'm'") and _match_filter(e, "a le 'm'")
    assert _match_filter(e, "a ne 'n'") and not _match_filter(e, "a gt 'm'")
    with pytest.raises(ValueError):
        _match_filter(e, "a like 'm'")


# ---------------------------------------------------------------------------
# Spark connectors
# ---------------------------------------------------------------------------


def test_queue_sink_then_source(qsrv, spark):
    AzureQueueClient(qsrv.endpoint).create_queue("rt")
    df = spark.range(12).select(F.concat(F.lit("m-"), F.col("id")).alias("value"))
    AzureQueueSink(qsrv.endpoint, "rt")(df, 0)
    src = AzureQueueSource(endpoint=qsrv.endpoint, queue_name="rt",
                           track_properties=True)
    out = src.read(spark).collect()
    assert sorted(r.value for r in out) == sorted(f"m-{i}" for i in range(12))
    assert all(r.queue_storage_insertion_time for r in out)
    # drained: delete-after-emit
    assert AzureQueueClient(qsrv.endpoint).get_messages("rt") == []


def test_table_sink_json_col_and_source_filter(tsrv, spark):
    AzureTableClient(tsrv.endpoint).create_table("Orders")
    df = spark.createDataFrame(
        [("p1", "r1", '{"status": "open", "total": 10}'),
         ("p1", "r2", '{"status": "done", "total": 20}')],
        "pk string, rk string, doc string")
    AzureTableSink(tsrv.endpoint, "Orders", "pk", "rk", json_col="doc",
                   insert_type="INSERT_REPLACE")(df, 0)
    # replay is idempotent (upsert by PartitionKey/RowKey)
    AzureTableSink(tsrv.endpoint, "Orders", "pk", "rk", json_col="doc",
                   insert_type="INSERT_REPLACE")(df, 0)
    src = AzureTableSource(endpoint=tsrv.endpoint, table_name="Orders",
                           filter="status eq 'done'")
    rows = [json.loads(r.value) for r in src.read(spark).collect()]
    assert rows == [{"PartitionKey": "p1", "RowKey": "r2",
                     "status": "done", "total": 20}]


def test_config_wiring(qsrv, tsrv, spark):
    from benthos_spark.config import _input, _output
    from benthos_spark.functions.azure_qt_proto import DEFAULT_KEY

    AzureQueueClient(qsrv.endpoint).create_queue("cfg")
    sink = _output({"azure_queue_storage": {
        "endpoint": qsrv.endpoint, "queue_name": "cfg",
        "storage_access_key": DEFAULT_KEY}})
    sink(spark.createDataFrame([("wired",)], "value string"), 0)
    src = _input({"azure_queue_storage": {
        "endpoint": qsrv.endpoint, "queue_name": "cfg",
        "storage_access_key": DEFAULT_KEY}})
    assert [r.value for r in src.read(spark).collect()] == ["wired"]

    AzureTableClient(tsrv.endpoint).create_table("Cfg")
    tsink = _output({"azure_table_storage": {
        "endpoint": tsrv.endpoint, "table_name": "Cfg",
        "partition_key_col": "pk", "row_key_col": "rk",
        "properties": {"v": "value"},
        "storage_access_key": DEFAULT_KEY}})
    tsink(spark.createDataFrame([("a", "1", "x")], "pk string, rk string, value string"), 0)
    tsrc = _input({"azure_table_storage": {
        "endpoint": tsrv.endpoint, "table_name": "Cfg",
        "storage_access_key": DEFAULT_KEY}})
    assert json.loads(tsrc.read(spark).collect()[0].value)["v"] == "x"
