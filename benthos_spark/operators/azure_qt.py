"""`azure_queue_storage` input/output and `azure_table_storage`
input/output (internal/impl/azure/input_queue_storage.go,
output_queue_storage.go, input_table_storage.go,
output_table_storage.go) over the from-scratch SharedKey REST stack in
benthos_spark/functions/azure_qt_proto.py.

Spark shapes:

- **queue input**: the same non-replayable-queue contract as aws_sqs /
  gcp_pubsub — batch mode drains get→emit→delete; streaming mode runs
  a driver dequeue loop spooling atomic files (DELETE ONLY AFTER the
  durable spool rename; crash in between → visibility-timeout
  redelivery: at-least-once, upgraded to exactly-once by the sink
  ledger downstream). ``track_properties`` adds the reference's
  queue_storage_message_lag metadata column.
- **queue output**: Put Message per row from executors (the API is
  single-put), one HTTP session per Spark partition.
- **table input**: a bounded OData query — ``filter``/``select``/
  ``page_size`` map straight through; rows land as one JSON document
  per entity (the reference's shape). Server-side $filter is the
  predicate-pushdown axis: push the selective filter into the query
  string, not into Spark.
- **table output**: one entity per row; ``partition_key_col`` /
  ``row_key_col`` name the key columns (the interpolation analog) and
  ``insert_type`` INSERT | INSERT_REPLACE | INSERT_MERGE matches the
  reference's transaction types. INSERT_REPLACE replays are idempotent
  upserts by (PartitionKey, RowKey)."""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.azure_qt_proto import (DEFAULT_KEY,
                                                    AzureQueueClient,
                                                    AzureTableClient)
from benthos_spark.sources.readers import Source


@dataclass
class AzureQueueSource(Source):
    """`azure_queue_storage` input: dequeue → emit → delete."""

    endpoint: str = ""
    queue_name: str = ""
    account: str = "devstoreaccount1"
    key_b64: str = DEFAULT_KEY
    dequeue_visibility_timeout_s: int = 30
    track_properties: bool = False
    spool_dir: str = ""
    streaming: bool = False
    _thread: object = field(default=None, repr=False)
    _stop: object = field(default=None, repr=False)

    def _client(self) -> AzureQueueClient:
        return AzureQueueClient(self.endpoint, self.account, self.key_b64)

    def read(self, spark: SparkSession) -> DataFrame:
        client = self._client()
        if not self.streaming:
            rows = []
            while True:
                msgs = client.get_messages(
                    self.queue_name, 32, self.dequeue_visibility_timeout_s)
                if not msgs:
                    break
                lag = (client.approximate_count(self.queue_name)
                       if self.track_properties else None)
                for m in msgs:
                    client.delete_message(self.queue_name, m["id"], m["pop_receipt"])
                    rows.append((m["text"], m["id"], m["insertion_time"], lag))
            return spark.createDataFrame(
                rows, "value string, message_id string, "
                      "queue_storage_insertion_time string, "
                      "queue_storage_message_lag long")
        if not self.spool_dir:
            raise ValueError("streaming azure_queue_storage input needs a spool_dir")
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            qname, spool = self.queue_name, self.spool_dir
            vis = self.dequeue_visibility_timeout_s

            def loop():
                c = self._client()
                while not stop.is_set():
                    msgs = c.get_messages(qname, 32, vis)
                    if not msgs:
                        time.sleep(0.05)
                        continue
                    # durable spool FIRST, delete after (at-least-once)
                    _spool_write(spool, b"".join(
                        m["text"].encode() + b"\n" for m in msgs))
                    for m in msgs:
                        c.delete_message(qname, m["id"], m["pop_receipt"])

            self._stop = stop
            t = threading.Thread(target=loop, daemon=True)
            t.start()
            self._thread = t
        return (spark.readStream.format("text")
                .schema("value string").load(self.spool_dir))

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
            self._thread.join(timeout=5)


class AzureQueueSink:
    """`azure_queue_storage` output: Put Message per row."""

    def __init__(self, endpoint: str, queue_name: str, col: str = "value",
                 account: str = "devstoreaccount1", key_b64: str = DEFAULT_KEY):
        self.endpoint, self.queue_name, self.col = endpoint, queue_name, col
        self.account, self.key_b64 = account, key_b64

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        endpoint, qname, col = self.endpoint, self.queue_name, self.col
        account, key = self.account, self.key_b64

        def write_partition(rows):
            client = AzureQueueClient(endpoint, account, key)
            for row in rows:
                v = row[col]
                if isinstance(v, (bytes, bytearray)):
                    v = bytes(v).decode("utf-8", "replace")
                client.put_message(qname, str(v))

        df.select(col).foreachPartition(write_partition)


@dataclass
class AzureTableSource(Source):
    """`azure_table_storage` input: OData query → one JSON document per
    entity (filter/select/page_size pushed server-side)."""

    endpoint: str = ""
    table_name: str = ""
    filter: Optional[str] = None
    select: Optional[str] = None
    page_size: Optional[int] = None
    account: str = "devstoreaccount1"
    key_b64: str = DEFAULT_KEY
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        client = AzureTableClient(self.endpoint, self.account, self.key_b64)
        rows = client.query(self.table_name, self.filter, self.select,
                            self.page_size)
        return spark.createDataFrame(
            [(json.dumps(r, sort_keys=True),) for r in rows], "value string")


class AzureTableSink:
    """`azure_table_storage` output: one entity per row with the
    reference's insert types."""

    def __init__(self, endpoint: str, table_name: str,
                 partition_key_col: str, row_key_col: str,
                 properties: Optional[dict[str, str]] = None,
                 json_col: Optional[str] = None,
                 insert_type: str = "INSERT",
                 account: str = "devstoreaccount1", key_b64: str = DEFAULT_KEY):
        if insert_type not in ("INSERT", "INSERT_REPLACE", "INSERT_MERGE"):
            raise ValueError(f"unknown insert_type {insert_type!r}")
        if not properties and not json_col:
            raise ValueError("azure_table_storage output needs properties "
                             "and/or json_col (the all-fields path)")
        self.endpoint, self.table_name = endpoint, table_name
        self.pk_col, self.rk_col = partition_key_col, row_key_col
        self.properties = properties or {}
        self.json_col = json_col
        self.insert_type = insert_type
        self.account, self.key_b64 = account, key_b64

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        endpoint, table = self.endpoint, self.table_name
        pk_col, rk_col = self.pk_col, self.rk_col
        props, json_col, mode = self.properties, self.json_col, self.insert_type
        account, key = self.account, self.key_b64
        need = sorted({pk_col, rk_col, *props.values(),
                       *([json_col] if json_col else [])})

        def write_partition(rows):
            client = AzureTableClient(endpoint, account, key)
            for row in rows:
                entity: dict = {}
                if json_col:  # "all the json fields are marshalled and stored"
                    doc = json.loads(row[json_col])
                    if not isinstance(doc, dict):
                        raise ValueError("json_col document must be an object")
                    entity.update(doc)
                for attr, colname in props.items():
                    entity[attr] = row[colname]
                entity["PartitionKey"] = str(row[pk_col])
                entity["RowKey"] = str(row[rk_col])
                client.insert(table, entity, mode)

        df.select(*need).foreachPartition(write_partition)
