"""AWS service connectors — `aws_sqs` input/output, `aws_sns` output,
`aws_kinesis` input/output, `aws_kinesis_firehose` output,
`aws_dynamodb` output + cache, `aws_s3` cache, `aws_lambda` processor,
`aws_dynamodb_partiql` processor and the `aws_cloudwatch` metrics
target (internal/impl/aws/input_sqs.go, output_sqs.go, output_sns.go,
input_kinesis.go, output_kinesis.go, output_kinesis_firehose.go,
output_dynamodb.go, cache_dynamodb.go, cache_s3.go,
processor_lambda.go, processor_dynamodb_partiql.go,
metrics_cloudwatch.go) over the from-scratch signed clients in
benthos_spark/functions/aws_proto.py.

Spark shapes:

- **SQS input**: queues are not replayable, so the same contract as the
  gcp_pubsub input — batch mode drains receive→emit→delete;
  streaming mode runs a driver receive loop spooling atomic files
  (DELETE ONLY AFTER the durable spool rename; crash in between →
  visibility-timeout redelivery: at-least-once, the reference's
  contract, upgraded to exactly-once by the sink ledger downstream).
  ``delete_message: false`` + ``reset_visibility`` mirror
  input_sqs.go's fields.
- **Kinesis input**: a REPLAYABLE shard log — the good story. Batch
  mode = one Spark partition per shard, each draining TRIM_HORIZON →
  tip on executors (fully distributed, zero driver data-plane).
  Streaming mode = a Python data source whose checkpoint offsets are
  per-shard SEQUENCE NUMBERS (the public replay axis, like the kafka
  input's partition offsets). Tip discovery: Kinesis publishes no
  "latest sequence number" API, so ``latestOffset`` advances each
  shard by a capped driver-side GetRecords walk and executors re-fetch
  the (start, end] span via AFTER_SEQUENCE_NUMBER — deterministic and
  resumable; a production deployment on real AWS would swap tip
  discovery for enhanced fan-out consumers to avoid the double read
  (documented tradeoff; the reference sidesteps it by checkpointing to
  DynamoDB outside any offset model, input_kinesis_checkpointer.go).
- **outputs**: per-Spark-partition batched writes from executors — SQS
  SendMessageBatch (10/batch, the API cap), Kinesis PutRecords
  (500/batch cap), Firehose PutRecordBatch (500), DynamoDB
  BatchWriteItem (25). SNS publishes per message (its API is
  single-publish). At-least-once on retry; DynamoDB replays are
  natural upserts by primary key.
- **caches / processors / metrics**: driver-or-executor-side control
  plane by contract (a cache `get` is one item; lambda invokes are
  per-message escape hatches like the reference's).
"""

from __future__ import annotations

import base64
import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Iterator, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.aws_proto import (AwsError, CloudWatchClient,
                                               DynamoDBClient, FirehoseClient,
                                               KinesisClient, SnsClient,
                                               SqsClient)
from benthos_spark.operators.cache import Cache
from benthos_spark.sources.readers import Source

KINESIS_SCHEMA = "shard_id string, sequence_number string, partition_key string, value binary"
SQS_SCHEMA = "value string, message_id string"


def _creds(opts: dict) -> dict:
    return {"endpoint": opts["endpoint"],
            "access_key": opts.get("access_key", "test"),
            "secret_key": opts.get("secret_key", "test"),
            "region": opts.get("region", "us-east-1")}


# ---------------------------------------------------------------------------
# SQS
# ---------------------------------------------------------------------------


@dataclass
class SqsSource(Source):
    """`aws_sqs` input (input_sqs.go): receive → emit → delete (or
    reset visibility when ``delete_message`` is off)."""

    endpoint: str = ""
    url: str = ""
    access_key: str = "test"
    secret_key: str = "test"
    region: str = "us-east-1"
    wait_time_seconds: int = 0
    delete_message: bool = True
    reset_visibility: bool = True
    max_number_of_messages: int = 10
    spool_dir: str = ""
    streaming: bool = False
    _thread: object = field(default=None, repr=False)
    _stop: object = field(default=None, repr=False)

    def _client(self) -> SqsClient:
        return SqsClient(self.endpoint, self.access_key, self.secret_key,
                         self.region)

    def _drain_once(self, client: SqsClient) -> list[dict]:
        msgs = client.receive(self.url, self.max_number_of_messages,
                              self.wait_time_seconds)
        if msgs:
            if self.delete_message:
                client.delete_batch(self.url, [m["ReceiptHandle"] for m in msgs])
            elif self.reset_visibility:
                for m in msgs:
                    client.change_visibility(self.url, m["ReceiptHandle"], 0)
        return msgs

    def read(self, spark: SparkSession) -> DataFrame:
        client = self._client()
        if not self.streaming:
            rows = []
            while True:
                msgs = self._drain_once(client)
                if not msgs:
                    break
                rows.extend((m["Body"], m["MessageId"]) for m in msgs)
            return spark.createDataFrame(rows, SQS_SCHEMA)
        if not self.spool_dir:
            raise ValueError("streaming aws_sqs input needs a spool_dir")
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            url, spool = self.url, self.spool_dir
            delete, maxn, wait = self.delete_message, self.max_number_of_messages, self.wait_time_seconds

            def loop():
                c = self._client()
                while not stop.is_set():
                    msgs = c.receive(url, maxn, wait)
                    if not msgs:
                        time.sleep(0.05)
                        continue
                    # durable spool FIRST, delete after (at-least-once)
                    _spool_write(spool, b"".join(
                        m["Body"].encode() + b"\n" for m in msgs))
                    if delete:
                        c.delete_batch(url, [m["ReceiptHandle"] for m in msgs])

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


class SqsSink:
    """`aws_sqs` output (output_sqs.go): SendMessageBatch per Spark
    partition, 10 entries per call (the API cap)."""

    def __init__(self, endpoint: str, url: str, col: str = "value",
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.opts = {"endpoint": endpoint, "access_key": access_key,
                     "secret_key": secret_key, "region": region}
        self.url, self.col = url, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        opts, url, col = self.opts, self.url, self.col

        def write_partition(rows):
            client = SqsClient(**opts)
            batch: list[dict] = []

            def flush():
                if batch:
                    client.send_message_batch(url, list(batch))
                    batch.clear()

            for row in rows:
                v = row[col]
                if isinstance(v, (bytes, bytearray)):
                    v = bytes(v).decode("utf-8", "replace")
                batch.append({"Id": str(len(batch)), "MessageBody": str(v)})
                if len(batch) == 10:
                    flush()
            flush()

        df.select(col).foreachPartition(write_partition)


class SnsSink:
    """`aws_sns` output (output_sns.go): Publish per message from
    executors (the API is single-publish)."""

    def __init__(self, endpoint: str, topic_arn: str, col: str = "value",
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.opts = {"endpoint": endpoint, "access_key": access_key,
                     "secret_key": secret_key, "region": region}
        self.topic_arn, self.col = topic_arn, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        opts, arn, col = self.opts, self.topic_arn, self.col

        def write_partition(rows):
            client = SnsClient(**opts)
            for row in rows:
                v = row[col]
                if isinstance(v, (bytes, bytearray)):
                    v = bytes(v).decode("utf-8", "replace")
                client.publish(arn, str(v))

        df.select(col).foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# Kinesis
# ---------------------------------------------------------------------------


def _fetch_shard_span(opts: dict, stream: str, shard_id: str,
                      after_seq: Optional[str], end_seq: Optional[str]) -> Iterator[tuple]:
    """Yield (shard_id, seq, pkey, data) from after_seq (exclusive) to
    end_seq (inclusive); to the tip when end_seq is None."""
    client = KinesisClient(**opts)
    if after_seq:
        it = client.shard_iterator(stream, shard_id, "AFTER_SEQUENCE_NUMBER",
                                   after_seq)
    else:
        it = client.shard_iterator(stream, shard_id, "TRIM_HORIZON")
    end = int(end_seq) if end_seq is not None else None
    while True:
        out = client.get_records(it)
        for r in out["Records"]:
            seq = r["SequenceNumber"]
            if end is not None and int(seq) > end:
                return
            yield (shard_id, seq, r["PartitionKey"],
                   base64.b64decode(r["Data"]))
        it = out.get("NextShardIterator")
        if not out["Records"] and (end is None and out.get("MillisBehindLatest", 0) == 0):
            return
        if end is not None and out["Records"] and int(out["Records"][-1]["SequenceNumber"]) >= end:
            return
        if not out["Records"] and end is not None:
            return  # span exhausted (shard trimmed past end)


def register_kinesis_source(spark: SparkSession) -> None:
    """Register the `benthos_kinesis` Python data source (idempotent).
    Streaming offsets: {shard_id: last consumed sequence number}."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        DataSourceStreamReader, InputPartition)
    from pyspark.sql.types import StructType

    class _Part(InputPartition):
        def __init__(self, opts, stream, shard_id, after_seq, end_seq):
            self.opts, self.stream, self.shard_id = opts, stream, shard_id
            self.after_seq, self.end_seq = after_seq, end_seq

    class _BatchReader(DataSourceReader):
        def __init__(self, options):
            self.opts = {k: options[k] for k in
                         ("endpoint", "access_key", "secret_key", "region")}
            self.stream = options["stream"]

        def partitions(self):
            client = KinesisClient(**self.opts)
            return [_Part(self.opts, self.stream, s["ShardId"], None, None)
                    for s in client.list_shards(self.stream)]

        def read(self, part):
            yield from _fetch_shard_span(part.opts, part.stream,
                                         part.shard_id, part.after_seq,
                                         part.end_seq)

    class _StreamReader(DataSourceStreamReader):
        # pickled for executor read() — no sockets on the instance
        def __init__(self, options):
            self.opts = {k: options[k] for k in
                         ("endpoint", "access_key", "secret_key", "region")}
            self.stream = options["stream"]
            self.max_per_batch = int(options.get("max_records_per_batch", "10000"))
            client = KinesisClient(**self.opts)
            self._shards = [s["ShardId"] for s in client.list_shards(self.stream)]

        def initialOffset(self):
            return {s: "0" for s in self._shards}

        def latestOffset(self):
            # capped driver walk keeping only end seqs (see module doc)
            client = KinesisClient(**self.opts)
            cur = getattr(self, "_last", None) or {s: "0" for s in self._shards}
            out = {}
            for s in self._shards:
                last = cur.get(s, "0")
                it = client.shard_iterator(self.stream, s,
                                           "AFTER_SEQUENCE_NUMBER", last)
                budget = self.max_per_batch
                while budget > 0:
                    got = client.get_records(it, min(budget, 10000))
                    recs = got["Records"]
                    if recs:
                        last = recs[-1]["SequenceNumber"]
                        budget -= len(recs)
                    it = got.get("NextShardIterator")
                    if not recs or got.get("MillisBehindLatest", 0) == 0:
                        break
                out[s] = last
            self._last = out
            return out

        def partitions(self, start, end):
            return [_Part(self.opts, self.stream, s, start.get(s, "0"),
                          end[s])
                    for s in self._shards
                    if int(end.get(s, "0")) > int(start.get(s, "0"))]

        def read(self, part):
            after = None if part.after_seq == "0" else part.after_seq
            yield from _fetch_shard_span(part.opts, part.stream,
                                         part.shard_id, after, part.end_seq)

        def commit(self, end):
            pass  # retention is stream-side; the checkpoint holds seqs

    class _KinesisDataSource(DataSource):
        @classmethod
        def name(cls):
            return "benthos_kinesis"

        def schema(self):
            return KINESIS_SCHEMA

        def reader(self, schema: StructType):
            return _BatchReader(self.options)

        def streamReader(self, schema: StructType):
            return _StreamReader(self.options)

    try:
        spark.dataSource.register(_KinesisDataSource)
    except Exception as e:
        if "already" not in str(e).lower():
            raise


@dataclass
class KinesisSource(Source):
    """`aws_kinesis` input (input_kinesis.go): one Spark partition per
    shard; streaming offsets = per-shard sequence numbers."""

    endpoint: str = ""
    stream: str = ""
    access_key: str = "test"
    secret_key: str = "test"
    region: str = "us-east-1"
    max_records_per_batch: int = 10000
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        register_kinesis_source(spark)
        reader = spark.readStream if self.streaming else spark.read
        return (reader.format("benthos_kinesis")
                .option("endpoint", self.endpoint)
                .option("stream", self.stream)
                .option("access_key", self.access_key)
                .option("secret_key", self.secret_key)
                .option("region", self.region)
                .option("max_records_per_batch", str(self.max_records_per_batch))
                .load())


class KinesisSink:
    """`aws_kinesis` output (output_kinesis.go): PutRecords of <=500 per
    call per Spark partition; partition key from ``partition_key_col``
    (the interpolation analog) or the row index."""

    def __init__(self, endpoint: str, stream: str, col: str = "value",
                 partition_key_col: Optional[str] = None,
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.opts = {"endpoint": endpoint, "access_key": access_key,
                     "secret_key": secret_key, "region": region}
        self.stream, self.col = stream, col
        self.partition_key_col = partition_key_col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        opts, stream, col = self.opts, self.stream, self.col
        pk_col = self.partition_key_col
        cols = [col] + ([pk_col] if pk_col else [])

        def write_partition(rows):
            client = KinesisClient(**opts)
            batch: list[tuple[bytes, str]] = []
            n = 0

            def flush():
                if batch:
                    client.put_records(stream, list(batch))
                    batch.clear()

            for row in rows:
                v = row[col]
                data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                pk = str(row[pk_col]) if pk_col else str(n)
                batch.append((data, pk))
                n += 1
                if len(batch) == 500:
                    flush()
            flush()

        df.select(*cols).foreachPartition(write_partition)


class KinesisFirehoseSink:
    """`aws_kinesis_firehose` output (output_kinesis_firehose.go):
    PutRecordBatch of <=500 per call per Spark partition."""

    def __init__(self, endpoint: str, stream: str, col: str = "value",
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.opts = {"endpoint": endpoint, "access_key": access_key,
                     "secret_key": secret_key, "region": region}
        self.stream, self.col = stream, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        opts, stream, col = self.opts, self.stream, self.col

        def write_partition(rows):
            client = FirehoseClient(**opts)
            batch: list[bytes] = []
            for row in rows:
                v = row[col]
                batch.append(bytes(v) if isinstance(v, (bytes, bytearray))
                             else str(v).encode())
                if len(batch) == 500:
                    client.put_record_batch(stream, batch)
                    batch = []
            if batch:
                client.put_record_batch(stream, batch)

        df.select(col).foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# DynamoDB
# ---------------------------------------------------------------------------


class DynamoDBSink:
    """`aws_dynamodb` output (output_dynamodb.go): BatchWriteItem of
    <=25 puts per call per Spark partition. ``string_columns`` maps
    DynamoDB attribute -> DataFrame column rendered as a string (the
    reference's interpolated-string map); ``json_map_columns`` maps
    attribute -> column whose JSON content becomes a typed attribute
    value ('' = whole document under the attribute). Replays are
    natural upserts by primary key — redelivery-idempotent."""

    def __init__(self, endpoint: str, table: str,
                 string_columns: Optional[dict[str, str]] = None,
                 json_map_columns: Optional[dict[str, str]] = None,
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        if not string_columns and not json_map_columns:
            raise ValueError("aws_dynamodb output needs string_columns "
                             "and/or json_map_columns")
        self.opts = {"endpoint": endpoint, "access_key": access_key,
                     "secret_key": secret_key, "region": region}
        self.table = table
        self.string_columns = string_columns or {}
        self.json_map_columns = json_map_columns or {}

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        opts, table = self.opts, self.table
        scols, jcols = self.string_columns, self.json_map_columns
        need = sorted({*scols.values(), *jcols.values()} - {""})

        def to_attr(v: Any) -> dict:
            if isinstance(v, bool):
                return {"BOOL": v}
            if isinstance(v, (int, float)):
                return {"N": repr(v)}
            if isinstance(v, (bytes, bytearray)):
                return {"B": base64.b64encode(bytes(v)).decode()}
            if isinstance(v, dict):
                return {"M": {k: to_attr(x) for k, x in v.items()}}
            if isinstance(v, list):
                return {"L": [to_attr(x) for x in v]}
            if v is None:
                return {"NULL": True}
            return {"S": str(v)}

        def write_partition(rows):
            client = DynamoDBClient(**opts)
            batch: list[dict] = []

            def flush():
                if batch:
                    client.batch_write(table, list(batch))
                    batch.clear()

            for row in rows:
                item: dict[str, dict] = {}
                for attr, colname in scols.items():
                    v = row[colname]
                    if isinstance(v, (bytes, bytearray)):
                        v = bytes(v).decode("utf-8", "replace")
                    item[attr] = {"S": str(v)}
                for attr, colname in jcols.items():
                    doc = json.loads(row[colname])
                    if attr == "":
                        if not isinstance(doc, dict):
                            raise ValueError("json_map_columns '' needs an object document")
                        for k, v in doc.items():
                            item[k] = to_attr(v)
                    else:
                        item[attr] = to_attr(doc)
                batch.append({"PutRequest": {"Item": item}})
                if len(batch) == 25:
                    flush()
            flush()

        df.select(*need).foreachPartition(write_partition)


class DynamoDBCache(Cache):
    """`aws_dynamodb` cache (cache_dynamodb.go): one item per key,
    ``hash_key`` / ``data_key`` attribute names; `add` is the published
    atomic conditional put (attribute_not_exists)."""

    def __init__(self, endpoint: str, table: str, hash_key: str = "key",
                 data_key: str = "value", consistent_read: bool = True,
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.client = DynamoDBClient(endpoint, access_key, secret_key, region)
        self.table, self.hash_key, self.data_key = table, hash_key, data_key
        self.consistent_read = consistent_read

    def get(self, key: str) -> Any:
        item = self.client.get_item(self.table, {self.hash_key: {"S": key}},
                                    self.consistent_read)
        if item is None or self.data_key not in item:
            return None
        return item[self.data_key].get("S")

    def set(self, key: str, value: Any) -> None:
        self.client.put_item(self.table, {self.hash_key: {"S": key},
                                          self.data_key: {"S": str(value)}})

    def add(self, key: str, value: Any) -> bool:
        try:
            self.client.put_item(
                self.table,
                {self.hash_key: {"S": key}, self.data_key: {"S": str(value)}},
                condition=f"attribute_not_exists({self.hash_key})")
            return True
        except AwsError as e:
            if e.code == "ConditionalCheckFailedException":
                return False
            raise

    def delete(self, key: str) -> None:
        self.client.delete_item(self.table, {self.hash_key: {"S": key}})


class S3Cache(Cache):
    """`aws_s3` cache (cache_s3.go): one object per key under the
    bucket. `add` is get-then-put — NOT atomic across processes, the
    same published caveat as the reference ("there's no atomic create
    on S3"); single-writer flows (dedupe within one pipeline) are
    unaffected."""

    def __init__(self, endpoint: str, bucket: str,
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        from benthos_spark.functions.s3_proto import S3Client

        self.client = S3Client(endpoint, access_key, secret_key, region)
        self.bucket = bucket

    def get(self, key: str) -> Any:
        try:
            return self.client.get_object(self.bucket, key).decode("utf-8", "replace")
        except Exception:
            return None

    def set(self, key: str, value: Any) -> None:
        v = value if isinstance(value, bytes) else str(value).encode()
        self.client.put_object(self.bucket, key, v)

    def add(self, key: str, value: Any) -> bool:
        if self.get(key) is not None:
            return False
        self.set(key, value)
        return True

    def delete(self, key: str) -> None:
        self.client.delete_object(self.bucket, key)


# ---------------------------------------------------------------------------
# Processors
# ---------------------------------------------------------------------------


class LambdaProcessor:
    """`aws_lambda` processor (processor_lambda.go): invoke the function
    with the message as payload; the response replaces the message
    content (unless ``result_col`` keeps it alongside). Per-message by
    contract — an escape hatch like the reference's, not a hot-path
    operator; ``parallel`` invokes concurrently within each Arrow
    batch."""

    def __init__(self, endpoint: str, function: str, col: str = "value",
                 result_col: Optional[str] = None, parallel: bool = False,
                 retries: int = 3,
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.opts = {"endpoint": endpoint, "access_key": access_key,
                     "secret_key": secret_key, "region": region}
        self.function, self.col = function, col
        self.result_col = result_col or col
        self.parallel, self.retries = parallel, retries

    def __call__(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        opts, function, col = self.opts, self.function, self.col
        result_col, parallel, retries = self.result_col, self.parallel, self.retries
        out_schema = df.schema if result_col == col else (
            df.withColumn(result_col, df[col]).schema)

        def run(batches):
            from benthos_spark.functions.aws_proto import AwsClient
            client = AwsClient(**opts)

            def invoke(v) -> str:
                payload = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                last: Exception | None = None
                for _ in range(retries + 1):
                    try:
                        return client.lambda_invoke(function, payload).decode("utf-8", "replace")
                    except Exception as e:
                        last = e
                raise last

            for pdf in batches:
                vals = pdf[col].tolist()
                if parallel and len(vals) > 1:
                    from concurrent.futures import ThreadPoolExecutor
                    with ThreadPoolExecutor(max_workers=min(16, len(vals))) as pool:
                        results = list(pool.map(invoke, vals))
                else:
                    results = [invoke(v) for v in vals]
                pdf = pdf.copy()
                pdf[result_col] = pd.Series(results, index=pdf.index, dtype=object)
                yield pdf

        return df.mapInPandas(run, out_schema)


class DynamoDBPartiQLProcessor:
    """`aws_dynamodb_partiql` processor (processor_dynamodb_partiql.go):
    run a PartiQL statement per message with ``args_mapping``-style
    positional parameters taken from columns; the result items replace
    the message as a JSON array (the reference's unchanged=false
    path)."""

    def __init__(self, endpoint: str, query: str,
                 args_cols: Sequence[str] = (), col: str = "value",
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.opts = {"endpoint": endpoint, "access_key": access_key,
                     "secret_key": secret_key, "region": region}
        self.query, self.args_cols, self.col = query, list(args_cols), col

    def __call__(self, df: DataFrame) -> DataFrame:
        opts, query, args_cols, col = self.opts, self.query, self.args_cols, self.col
        out_schema = df.schema

        def run(batches):
            client = DynamoDBClient(**opts)
            for pdf in batches:
                results = []
                for _, row in pdf.iterrows():
                    params = [{"S": str(row[c])} for c in args_cols]
                    items = client.execute_statement(query, params)
                    plain = [{k: next(iter(v.values())) for k, v in it.items()}
                             for it in items]
                    results.append(json.dumps(plain, sort_keys=True))
                pdf = pdf.copy()
                pdf[col] = results
                yield pdf

        return df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Metrics target
# ---------------------------------------------------------------------------


class CloudWatchExporter:
    """`aws_cloudwatch` metrics target (metrics_cloudwatch.go): buffers
    counter/timing/gauge datums and flushes PutMetricData in <=20-datum
    calls (the API cap), on a period like the reference's loop."""

    def __init__(self, endpoint: str, namespace: str = "Benthos",
                 flush_period_s: float = 0.1,
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.client = CloudWatchClient(endpoint, access_key, secret_key, region)
        self.namespace = namespace
        self._buf: list[dict] = []
        self._lock = threading.Lock()
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._loop,
                                        args=(flush_period_s,), daemon=True)
        self._thread.start()

    def incr(self, path: str, count: int = 1, tags: Optional[dict] = None) -> None:
        self._push({"name": path, "value": float(count), "unit": "Count",
                    "dimensions": tags or {}})

    def timing(self, path: str, delta_ms: float, tags: Optional[dict] = None) -> None:
        self._push({"name": path, "value": float(delta_ms),
                    "unit": "Milliseconds", "dimensions": tags or {}})

    def gauge(self, path: str, value: float, tags: Optional[dict] = None) -> None:
        self._push({"name": path, "value": float(value), "unit": "None",
                    "dimensions": tags or {}})

    def _push(self, datum: dict) -> None:
        with self._lock:
            self._buf.append(datum)

    def flush(self) -> None:
        with self._lock:
            buf, self._buf = self._buf, []
        for i in range(0, len(buf), 20):
            self.client.put_metric_data(self.namespace, buf[i:i + 20])

    def _loop(self, period_s: float) -> None:
        while not self._closed.wait(period_s):
            try:
                self.flush()
            except Exception:
                pass  # metrics must never take the pipeline down

    def close(self) -> None:
        self._closed.set()
        self._thread.join(timeout=5)
        self.flush()
