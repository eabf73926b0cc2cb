"""YAML pipeline configs — the `benthos -c config.yaml` surface
(/root/reference/internal/cli/run.go:282; config read + lint
internal/config/reader.go:173-314) and the embedded StreamBuilder
(public/service/stream_builder.go: SetYAML :472, AddInputYAML :252,
AddProcessorYAML :274, AddOutputYAML :371).

A config compiles to a :class:`~benthos_spark.streaming.pipeline.Pipeline`
plus a sink — one DataFrame lineage, no interpreter. Expressions inside
configs are Spark SQL strings (``F.expr``), the declarative analogue of
inline Bloblang; `${! expr }` interpolation is supported in string
fields via :func:`benthos_spark.functions.bloblang.interpolate`.

Example::

    input:
      parquet: {path: /data/clips, streaming: true}
    pipeline:
      processors:
        - mutation: {n_words: "size(split(transcript, ' '))"}
        - filter: "dur_ms < 10000"
        - window_agg:
            ts_col: event_ts
            size: 1 minute
            lateness: 30 seconds
            group_by: [codec]
            aggs: {n_clips: "count(1)", total_ms: "sum(dur_ms)"}
    output:
      exactly_once: {dir: /data/out}

Unknown component names fail at compile time with the known set listed —
the analogue of the reference's config lint (reader.go:314).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable

import yaml
from pyspark.sql import functions as F

from benthos_spark.operators import processors as P
from benthos_spark.operators.windows import SessionWindowAgg, WindowAgg
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
from benthos_spark.sinks import routing as R
from benthos_spark.sources import readers as S
from benthos_spark.streaming.pipeline import Pipeline


class ConfigError(ValueError):
    pass


class Resources:
    """Named resource components (`cache_resources`, `input_resources`,
    `processor_resources`, `output_resources` + `resource: label`
    references — internal/impl/pure resources; e.g. config/examples/
    joining_streams.yaml cache_resources). Labels resolve in declaration
    order: declare a resource before referencing it from another."""

    def __init__(self):
        self.caches: dict[str, Any] = {}
        self.inputs: dict[str, Any] = {}
        self.processors: dict[str, Any] = {}
        self.outputs: dict[str, Any] = {}

    @classmethod
    def from_config(cls, conf: dict) -> "Resources":
        res = cls()
        for item in conf.get("cache_resources", []) or []:
            res.caches[item["label"]] = _cache_resource(item)
        for item in conf.get("input_resources", []) or []:
            res.inputs[item["label"]] = _input(_strip_label(item), res)
        for item in conf.get("processor_resources", []) or []:
            res.processors[item["label"]] = _proc(_strip_label(item), res)
        for item in conf.get("output_resources", []) or []:
            res.outputs[item["label"]] = _output(_strip_label(item), res)
        return res


def _strip_label(item: dict) -> dict:
    body = {k: v for k, v in item.items() if k != "label"}
    if len(body) != 1:
        raise ConfigError(f"resource {item.get('label')!r} must define exactly one component")
    return body


def _cache_resource(item: dict):
    from benthos_spark.operators import cache as C

    body = _strip_label(item)
    (kind, conf), = body.items()
    conf = conf or {}
    if kind == "memory":
        c = C.MemoryCache()
    elif kind == "lru":
        c = C.LRUCache(capacity=conf.get("cap", 1024))
    elif kind == "ttlru":
        c = C.TTLCache(ttl_s=conf.get("default_ttl", 60.0))
    elif kind == "file":
        c = C.FileCache(directory=conf["directory"])
    elif kind == "redis":
        from benthos_spark.operators.redis import RedisCache

        c = RedisCache(
            url=conf["url"],
            prefix=conf.get("prefix", ""),
            default_ttl_ms=conf.get("default_ttl_ms"),
        )
    elif kind == "memcached":
        from benthos_spark.operators.memcached import MemcachedCache

        c = MemcachedCache(
            addresses=conf["addresses"],
            prefix=conf.get("prefix", ""),
            default_ttl_s=conf.get("default_ttl", 0),
        )
    elif kind == "aws_dynamodb":
        from benthos_spark.operators.awsio import DynamoDBCache

        c = DynamoDBCache(
            endpoint=conf["endpoint"],
            table=conf["table"],
            hash_key=conf.get("hash_key", "key"),
            data_key=conf.get("data_key", "value"),
            consistent_read=conf.get("consistent_read", True),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
        )
    elif kind == "aws_s3":
        from benthos_spark.operators.awsio import S3Cache

        c = S3Cache(
            endpoint=conf["endpoint"],
            bucket=conf["bucket"],
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
        )
    elif kind == "gcp_cloud_storage":
        from benthos_spark.operators.gcp_storage import GcsCache

        c = GcsCache(
            endpoint=conf["endpoint"],
            bucket=conf["bucket"],
            token=conf.get("token"),
        )
    elif kind == "ristretto":
        from benthos_spark.operators.ristretto import RistrettoCache

        c = RistrettoCache(
            max_cost=conf.get("max_cost", 1 << 20),
            default_ttl_s=conf.get("default_ttl"),
            get_retries=conf.get("get_retries", 0),
            retry_period_s=conf.get("retry_period", 0.05),
        )
    elif kind == "couchbase":
        from benthos_spark.operators.couchbase import CouchbaseCache

        c = CouchbaseCache(
            url=conf["url"],
            bucket=conf.get("bucket", "default"),
            username=conf.get("username", ""),
            password=conf.get("password", ""),
            default_ttl_s=conf.get("default_ttl", 0),
        )
    else:
        expanded = _try_template(
            "cache", kind, conf, lambda spec, _res: _cache_resource({"label": "t", **spec}), None
        )
        if expanded is not None:
            return expanded
        raise ConfigError(
            f"unknown cache resource {kind!r}; known: memory, lru, ttlru, file, redis, memcached, aws_dynamodb, aws_s3, gcp_cloud_storage, couchbase, ristretto"
        )
    for k, v in (conf.get("init_values") or {}).items():
        c.set(k, v)
    return c


# -- inputs -----------------------------------------------------------------


_TPL_DEPTH = 0


def _try_template(ttype: str, name: str, conf, dispatch, resources):
    """Template expansion hook (internal/template/template.go
    ExpandToNode): if `name` is a registered template of this component
    type, render its Bloblang mapping over the field values and compile
    the produced component config. Returns None when no template
    matches (the caller raises its unknown-component error). Depth-
    capped so a self-referential template fails with a clear message."""
    global _TPL_DEPTH
    from benthos_spark import templates as _templates

    t = _templates.lookup(ttype, name)
    if t is None:
        return None
    if _TPL_DEPTH >= 25:
        raise ConfigError(f"template expansion too deep at {name!r} (cycle?)")
    _TPL_DEPTH += 1
    try:
        try:
            expanded = _templates.expand(t, conf)
        except _templates.TemplateError as e:
            raise ConfigError(str(e))
        return dispatch(expanded, resources)
    finally:
        _TPL_DEPTH -= 1


class _ProcessedSource(S.Source):
    """Input-level `processors` (the reference's input.WithPipeline —
    a processor chain attached to the input node itself): run the chain
    on every DataFrame the source produces, before the pipeline's own
    processors."""

    def __init__(self, inner: S.Source, processors: list):
        self.inner = inner
        self.processors = processors

    @property
    def streaming(self) -> bool:  # delegate, the inner source decides
        return self.inner.streaming

    def __getattr__(self, item):
        return getattr(self.inner, item)

    def read(self, spark):
        from benthos_spark.operators.processors import compose

        return compose(self.inner.read(spark), self.processors)


def _input(spec: dict, resources: Resources | None = None) -> S.Source:
    if "processors" in spec and len(spec) > 1:
        spec = dict(spec)
        procs = [_proc(p, resources) for p in spec.pop("processors") or []]
        src = _input(spec, resources)
        return _ProcessedSource(src, procs) if procs else src
    (name, conf), = spec.items()
    conf = conf or {}
    if name == "resource":
        if resources is None or conf not in resources.inputs:
            raise ConfigError(f"unknown input resource {conf!r}")
        return resources.inputs[conf]
    if name == "parquet":
        return S.ParquetSource(
            conf["path"],
            streaming=conf.get("streaming", False),
            max_files_per_trigger=conf.get("max_files_per_trigger"),
        )
    if name == "csv":
        return S.CsvSource(conf["path"], header=conf.get("header", True),
                           streaming=conf.get("streaming", False))
    if name == "file":
        return S.FileSource(conf["path"], codec=conf.get("codec", "lines"),
                            streaming=conf.get("streaming", False))
    if name == "generate":
        return S.GenerateSource(
            mapping=conf.get("mapping", {}),
            rows_per_second=conf.get("rows_per_second", 1000),
            count=conf.get("count"),
            streaming=conf.get("streaming", True),
        )
    if name == "subprocess":
        from benthos_spark.operators.subproc import SubprocessSource

        return SubprocessSource(
            name=conf.get("name", ""),
            args=conf.get("args", []),
            codec=conf.get("codec", "lines"),
            max_buffer=conf.get("max_buffer", 65536),
            timeout_s=conf.get("timeout_s", 60.0),
        )
    if name == "stdin":
        return S.StdinSource(
            codec=conf.get("codec", "lines"),
            max_buffer=conf.get("max_buffer", 65536),
        )
    if name == "socket":
        return S.SocketSource(
            address=conf.get("address", ""),
            network=conf.get("network", "tcp"),
            max_buffer=conf.get("max_buffer", 65536),
            streaming=conf.get("streaming", True),
        )
    if name == "socket_server":
        from benthos_spark.sources.listeners import SocketServerSource

        return SocketServerSource(
            address=conf.get("address", "127.0.0.1:0"),
            spool_dir=conf["spool_dir"],
            network=conf.get("network", "tcp"),
            max_buffer=conf.get("max_buffer", 1 << 20),
            streaming=conf.get("streaming", True),
        )
    if name == "http_server":
        from benthos_spark.sources.listeners import HttpServerSource

        return HttpServerSource(
            address=conf.get("address", "127.0.0.1:0"),
            path=conf.get("path", "/post"),
            spool_dir=conf["spool_dir"],
            max_buffer=conf.get("max_buffer", 1 << 20),
            streaming=conf.get("streaming", True),
            sync_response=conf.get("sync_response", False),
            sync_timeout_s=conf.get("sync_timeout_s", 30.0),
        )
    if name == "websocket":
        from benthos_spark.operators.wsio import WebsocketSource

        return WebsocketSource(
            url=conf.get("url", ""),
            open_message=conf.get("open_message"),
            open_message_type=conf.get("open_message_type", "text"),
            max_messages=conf.get("max_messages"),
            idle_timeout_s=conf.get("idle_timeout_s", 10.0),
        )
    if name == "http_client":
        from benthos_spark.operators.http import HttpClientSource

        return HttpClientSource(
            url=conf.get("url", ""),
            verb=conf.get("verb", "GET"),
            headers=conf.get("headers", {}),
            payload=conf.get("payload"),
            codec=conf.get("codec", "all-bytes"),
            polls=conf.get("polls", 1),
            timeout_s=conf.get("timeout_s", 10.0),
        )
    if name == "aws_sqs":
        from benthos_spark.operators.awsio import SqsSource

        return SqsSource(
            endpoint=conf["endpoint"],
            url=conf["url"],
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
            wait_time_seconds=conf.get("wait_time_seconds", 0),
            delete_message=conf.get("delete_message", True),
            reset_visibility=conf.get("reset_visibility", True),
            max_number_of_messages=conf.get("max_number_of_messages", 10),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "aws_kinesis":
        from benthos_spark.operators.awsio import KinesisSource

        return KinesisSource(
            endpoint=conf["endpoint"],
            stream=conf["stream"],
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
            max_records_per_batch=conf.get("max_records_per_batch", 10000),
            streaming=conf.get("streaming", False),
        )
    if name == "aws_s3":
        from benthos_spark.operators.s3 import S3Source

        return S3Source(
            endpoint=conf["endpoint"],
            bucket=conf["bucket"],
            prefix=conf.get("prefix", ""),
            codec=conf.get("codec", "all-bytes"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
            streaming=conf.get("streaming", False),
        )
    if name == "azure_blob_storage":
        from benthos_spark.operators.azure_blob import AzureBlobSource

        return AzureBlobSource(
            endpoint=conf["endpoint"],
            container=conf["container"],
            prefix=conf.get("prefix", ""),
            codec=conf.get("codec", "all-bytes"),
            account=conf.get("storage_account", "devstoreaccount1"),
            key_b64=conf.get("storage_access_key", ""),
        )
    if name == "sftp":
        from benthos_spark.operators.sftpio import SftpSource

        creds = conf.get("credentials") or {}
        return SftpSource(
            address=conf["address"],
            username=creds.get("username", conf.get("username", "")),
            password=creds.get("password", conf.get("password", "")),
            paths=conf["paths"],
            codec=conf.get("codec", "all-bytes"),
            delete_on_finish=conf.get("delete_on_finish", False),
        )
    if name == "amqp_1":
        from benthos_spark.operators.amqp1 import Amqp1Source

        return Amqp1Source(
            url=conf["url"],
            source_address=conf["source_address"],
            credit=conf.get("credit", 200),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "hdfs":
        from benthos_spark.operators.hdfs import HdfsSource

        return HdfsSource(
            hosts=conf["hosts"],
            user=conf.get("user", "hadoop"),
            directory=conf["directory"],
        )
    if name == "twitter_search":
        from benthos_spark.operators.twitter import TwitterSearchSource

        label = conf["cache"]
        if resources is None or label not in resources.caches:
            raise ConfigError(f"unknown cache resource {label!r}")
        return TwitterSearchSource(
            api_url=conf.get("api_url", "https://api.twitter.com"),
            query=conf["query"],
            tweet_fields=conf.get("tweet_fields", []),
            backfill_period_s=_duration_s(conf.get("backfill_period", "5m")),
            cache=resources.caches[label],
            cache_key=conf.get("cache_key", "last_tweet_id"),
            api_key=conf["api_key"],
            api_secret=conf["api_secret"],
            poll_period_s=_duration_s(conf.get("poll_period", "1m")),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "discord":
        from benthos_spark.operators.notify import DiscordSource

        return DiscordSource(
            endpoint=conf["endpoint"],
            channel_id=conf["channel_id"],
            bot_token=conf["bot_token"],
            poll_period_s=conf.get("poll_period", 0.2),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "pulsar":
        from benthos_spark.operators.pulsario import PulsarSource

        return PulsarSource(
            url=conf["url"],
            topic=(conf.get("topics") or [conf.get("topic", "")])[0],
            subscription_name=conf["subscription_name"],
            subscription_type=conf.get("subscription_type", "shared"),
            subscription_initial_position=conf.get(
                "subscription_initial_position", "earliest"),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "zmq4":
        from benthos_spark.operators.zmqio import ZmqSource

        return ZmqSource(
            urls=conf["urls"],
            socket_type=conf.get("socket_type", "PULL"),
            bind=conf.get("bind", True),
            sub_filters=conf.get("sub_filters", [""]),
            spool_dir=conf["spool_dir"],
            streaming=conf.get("streaming", False),
        )
    if name == "nanomsg":
        from benthos_spark.operators.zmqio import NanomsgSource

        return NanomsgSource(
            urls=conf["urls"],
            socket_type=conf.get("socket_type", "PULL"),
            bind=conf.get("bind", True),
            sub_filters=conf.get("sub_filters", [""]),
            spool_dir=conf["spool_dir"],
            streaming=conf.get("streaming", False),
        )
    if name == "gcp_cloud_storage":
        from benthos_spark.operators.gcp_storage import GcsSource

        return GcsSource(
            endpoint=conf["endpoint"],
            bucket=conf["bucket"],
            prefix=conf.get("prefix", ""),
            codec=conf.get("codec", "all-bytes"),
            delete_objects=conf.get("delete_objects", False),
            token=conf.get("token"),
        )
    if name == "gcp_bigquery_select":
        from benthos_spark.operators.gcp_storage import BigQuerySelectSource

        return BigQuerySelectSource(
            endpoint=conf["endpoint"],
            project=conf["project"],
            table=conf["table"],
            columns=conf.get("columns", ["*"]),
            where=conf.get("where"),
            args=conf.get("args", []),
            suffix=conf.get("suffix"),
            token=conf.get("token"),
        )
    if name == "azure_queue_storage":
        from benthos_spark.operators.azure_qt import AzureQueueSource

        return AzureQueueSource(
            endpoint=conf["endpoint"],
            queue_name=conf["queue_name"],
            account=conf.get("storage_account", "devstoreaccount1"),
            key_b64=conf.get("storage_access_key", ""),
            dequeue_visibility_timeout_s=conf.get("dequeue_visibility_timeout", 30),
            track_properties=conf.get("track_properties", False),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "azure_table_storage":
        from benthos_spark.operators.azure_qt import AzureTableSource

        return AzureTableSource(
            endpoint=conf["endpoint"],
            table_name=conf["table_name"],
            filter=conf.get("filter"),
            select=conf.get("select"),
            page_size=conf.get("page_size"),
            account=conf.get("storage_account", "devstoreaccount1"),
            key_b64=conf.get("storage_access_key", ""),
        )
    if name == "cassandra":
        from benthos_spark.operators.cassandra import CassandraSource

        return CassandraSource(
            addresses=conf.get("addresses") or [conf.get("address", "")],
            query=conf["query"],
        )
    if name == "mongodb":
        from benthos_spark.operators.mongo import MongoSource

        return MongoSource(
            url=conf["url"],
            database=conf.get("database", "test"),
            collection=conf["collection"],
            filter=conf.get("query"),
            split_key=conf.get("split_key"),
            splits=conf.get("splits", []),
        )
    if name == "gcp_pubsub":
        from benthos_spark.operators.gcp_pubsub import PubSubSource

        return PubSubSource(
            endpoint=conf["endpoint"],
            project=conf["project"],
            subscription=conf["subscription"],
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
            token=conf.get("token"),
        )
    if name == "nsq":
        from benthos_spark.operators.queueio import NsqSource

        return NsqSource(
            address=conf.get("address") or conf.get("nsqd_tcp_address", ""),
            topic=conf["topic"],
            channel=conf.get("channel", "benthos_spark"),
            spool_dir=conf["spool_dir"],
        )
    if name == "beanstalkd":
        from benthos_spark.operators.queueio import BeanstalkdSource

        return BeanstalkdSource(
            address=conf["address"],
            tube=conf.get("tube", "default"),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "amqp_0_9":
        from benthos_spark.operators.amqp09 import Amqp09Source

        return Amqp09Source(
            url=conf.get("url") or (conf.get("urls") or [""])[0],
            queue=conf["queue"],
            declare=bool(conf.get("queue_declare", {}).get("enabled", False)),
            bindings=[(b["exchange"], b.get("key", "")) for b in
                      conf.get("bindings_declare", [])],
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", True),
        )
    if name == "nats":
        from benthos_spark.operators.natsio import NatsSource

        return NatsSource(
            url=conf.get("url") or (conf.get("urls") or [""])[0],
            subject=conf["subject"],
            queue=conf.get("queue"),
            spool_dir=conf["spool_dir"],
        )
    if name == "mqtt":
        from benthos_spark.operators.mqttio import MqttSource

        return MqttSource(
            url=conf.get("url") or (conf.get("urls") or [""])[0],
            topic=conf["topic"] if "topic" in conf else (conf.get("topics") or [""])[0],
            qos=conf.get("qos", 1),
            client_id=conf.get("client_id", "benthos-spark-in"),
            spool_dir=conf["spool_dir"],
        )
    if name == "kafka":
        from benthos_spark.operators.kafka import KafkaSource

        address = conf.get("address") or (conf.get("addresses") or [""])[0]
        if not address or not conf.get("topics"):
            raise ConfigError("kafka input needs address (or addresses) and topics")
        return KafkaSource(
            address=address,
            topics=conf.get("topics", []),
            starting_offsets="earliest" if conf.get("start_from_oldest", True) else "latest",
            streaming=conf.get("streaming", True),
        )
    if name == "redis_list":
        from benthos_spark.operators.redis import RedisListSource

        return RedisListSource(
            url=conf["url"],
            key=conf["key"],
            command=conf.get("command", "blpop"),
            spool_dir=conf.get("spool_dir", ""),
            streaming=conf.get("streaming", False),
        )
    if name == "redis_pubsub":
        from benthos_spark.operators.redis import RedisPubSubSource

        return RedisPubSubSource(
            url=conf["url"],
            channels=conf.get("channels", []),
            use_patterns=conf.get("use_patterns", False),
            spool_dir=conf["spool_dir"],
        )
    if name == "redis_streams":
        from benthos_spark.operators.redis import RedisStreamsSource

        return RedisStreamsSource(
            url=conf["url"],
            streams=conf.get("streams", []),
            body_key=conf.get("body_key", "body"),
            streaming=conf.get("streaming", True),
        )
    if name == "sql_select":
        from benthos_spark.operators.sql import SqlSelectSource

        return SqlSelectSource(
            dsn=conf["dsn"],
            table=conf["table"],
            columns=conf.get("columns", ["*"]),
            where=conf.get("where"),
            driver=conf.get("driver"),
            partition_column=conf.get("partition_column"),
            num_partitions=conf.get("num_partitions", 1),
            lower_bound=conf.get("lower_bound"),
            upper_bound=conf.get("upper_bound"),
        )
    if name == "sql_raw":
        from benthos_spark.operators.sql import SqlRawSource

        return SqlRawSource(dsn=conf["dsn"], query=conf["query"], driver=conf.get("driver"))
    if name == "dynamic":
        reg = S.DynamicSet()
        for label, child in (conf.get("inputs") or {}).items():
            reg.set(label, _input(child, resources))
        streaming = any(c.streaming for _, c in reg.items())
        return S.DynamicSource(reg, streaming=streaming)
    if name == "changelog":
        from benthos_spark.operators.cdc import ChangelogFileSource

        return ChangelogFileSource(
            path=conf["path"],
            row_schema=conf["row_schema"],
            envelope=conf.get("envelope", True),
            streaming=conf.get("streaming", False),
            max_files_per_trigger=conf.get("max_files_per_trigger"),
        )
    if name == "iceberg":
        from benthos_spark.iceberg.source import IcebergSource

        return IcebergSource(
            path=conf["path"],
            streaming=conf.get("streaming", False),
            snapshot_id=conf.get("snapshot_id"),
            as_of_ms=conf.get("as_of_ms"),
            starting_offsets=conf.get("starting_offsets", "earliest"),
            where=conf.get("where"),
        )
    if name == "batched":
        if conf.get("policy", {}).get("check"):
            raise ConfigError(
                "batched: a Bloblang `check` flush condition has no micro-batch "
                "equivalent (flushing is time/size-driven in Spark); use period/"
                "count/byte_size"
            )
        pol = conf.get("policy", {})
        child = _input(conf["child"], resources)
        if child.streaming and (pol.get("count") is not None or pol.get("byte_size") is not None):
            raise ConfigError(
                "batched: count/byte_size policies size partitions from a batch-only "
                "aggregation and cannot run over a streaming child; use `period` "
                "(micro-batch trigger) or set the child input's streaming: false"
            )
        return S.BatchedSource(
            child=child,
            policy=S.BatchPolicy(
                count=pol.get("count"),
                byte_size=pol.get("byte_size"),
                period=pol.get("period"),
                size_col=pol.get("size_col"),
            ),
        )
    expanded = _try_template("input", name, conf, _input, resources)
    if expanded is not None:
        return expanded
    raise ConfigError(
        f"unknown input {name!r}; known: parquet, csv, file, generate, batched, changelog, iceberg, "
        "dynamic, sql_select, sql_raw, subprocess, stdin, socket, socket_server, http_server, http_client, websocket, "
        "kafka, nats, mqtt, amqp_0_9, amqp_1, nsq, beanstalkd, aws_s3, aws_sqs, aws_kinesis, pulsar, discord, twitter_search, hdfs, sftp, zmq4, nanomsg, gcp_pubsub, gcp_cloud_storage, gcp_bigquery_select, azure_blob_storage, azure_queue_storage, azure_table_storage, mongodb, cassandra, "
        "redis_list, redis_pubsub, redis_streams, resource"
    )


# -- processors -------------------------------------------------------------


_DUR_UNITS = {"ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}


def _duration_s(v) -> float:
    """Go-style duration strings ("10m", "60s", "1h") → seconds; bare
    numbers pass through as seconds."""
    if isinstance(v, (int, float)):
        return float(v)
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ns|us|ms|s|m|h)", str(v).strip())
    if not m:
        raise ConfigError(f"invalid duration {v!r}")
    return float(m.group(1)) * _DUR_UNITS[m.group(2)]


def _exprs(d: dict) -> dict:
    return {k: F.expr(v) if isinstance(v, str) else F.lit(v) for k, v in d.items()}


def _proc(spec: dict | str, resources: Resources | None = None) -> P.Processor:
    if isinstance(spec, str):  # bare string = filter predicate shorthand
        return P.Filter(F.expr(spec))
    (name, conf), = spec.items()
    if name == "resource":
        if resources is None or conf not in resources.processors:
            raise ConfigError(f"unknown processor resource {conf!r}")
        return resources.processors[conf]
    if name == "cache":
        conf = conf or {}
        label = conf["resource"]
        if resources is None or label not in resources.caches:
            raise ConfigError(f"unknown cache resource {label!r}")
        from benthos_spark.operators.cache import CacheGet

        if conf.get("operator", "get") != "get":
            raise ConfigError("cache processor supports operator: get (set is an output)")
        return CacheGet(resources.caches[label], key_col=conf["key"],
                        value_col=conf.get("value_col", "cache_value"))
    if name in ("mapping", "bloblang"):
        # `bloblang` is the reference's historical alias for `mapping`
        # (processor_bloblang.go); both take Bloblang source
        if isinstance(conf, str):
            # real Bloblang source (processor_mapping.go:96) — compiles
            # to Columns, falls back to the Arrow interpreter
            from benthos_spark.bloblang import BloblangMapping

            return BloblangMapping(conf)
        return P.Mapping(_exprs(conf))
    if name == "mutation":
        if isinstance(conf, str):
            from benthos_spark.bloblang import BloblangMutation

            return BloblangMutation(conf)
        return P.Mutation(_exprs(conf))
    if name == "filter":
        return P.Filter(F.expr(conf if isinstance(conf, str) else conf["check"]))
    if name == "switch":
        cases = []
        for case in conf:
            check = case.get("check")
            cases.append(
                (F.expr(check) if check else None, [_proc(p, resources) for p in case.get("processors", [])])
            )
        return P.Switch(cases=cases)
    if name == "dedupe":
        return P.Dedupe(key_cols=conf["keys"])
    if name == "bounds_check":
        return P.BoundsCheck(col=conf["col"], min_len=conf.get("min_len", 0),
                             max_len=conf.get("max_len", 1 << 62))
    if name == "grok":
        return P.Grok(col=conf["col"], pattern=conf["pattern"], types=conf.get("types", {}))
    if name == "parse_log":
        return P.ParseLog(col=conf["col"], format=conf.get("format", "app_log"))
    if name == "json_schema":
        return P.JsonSchema(col=conf["col"], required=conf["required"])
    if name == "archive":
        return P.Archive(group_cols=conf.get("group_by", []), payload=F.expr(conf["payload"]),
                         fmt=conf.get("format", "lines"), out_col=conf.get("out", "archived"))
    if name == "unarchive":
        return P.Unarchive(col=conf["col"], fmt=conf.get("format", "lines"),
                           out_col=conf.get("out", "part"))
    if name == "split":
        return P.Split(conf["partitions"] if isinstance(conf, dict) else int(conf))
    if name == "try":
        return P.Try([_proc(p, resources) for p in conf])
    if name == "catch":
        return P.Catch([_proc(p, resources) for p in conf])
    if name == "compress":
        return P.Compress(col=conf["col"], level=conf.get("level", 6))
    if name == "decompress":
        return P.Decompress(col=conf["col"])
    if name == "window_agg":
        return WindowAgg(
            ts_col=conf["ts_col"], size=conf["size"], slide=conf.get("slide"),
            offset=conf.get("offset"), lateness=conf.get("lateness"),
            group_cols=conf.get("group_by", []), aggs=_exprs(conf["aggs"]),
        )
    if name == "session_window_agg":
        return SessionWindowAgg(
            ts_col=conf["ts_col"], gap=conf["gap"], lateness=conf.get("lateness"),
            group_cols=conf.get("group_by", []), aggs=_exprs(conf["aggs"]),
        )
    if name == "jq":
        from benthos_spark.functions.jq_program import JqProcessor

        if isinstance(conf, str):
            return JqProcessor(conf)
        return JqProcessor(conf["query"], col=conf.get("col", "value"),
                           out_col=conf.get("out_col"))
    if name == "protobuf":
        from benthos_spark.functions.protobuf import ProtobufProcessor

        return ProtobufProcessor(
            operator=conf["operator"],
            message=conf["message"],
            import_paths=conf.get("import_paths", []),
            col=conf.get("col", "value"),
        )
    if name == "jmespath":
        from benthos_spark.functions.jmespath_program import JmespathProcessor

        if isinstance(conf, str):
            return JmespathProcessor(conf)
        return JmespathProcessor(conf["query"], col=conf.get("col", "value"),
                                 out_col=conf.get("out_col"))
    if name == "sequence_match":
        from benthos_spark.operators.cep import SequenceMatch

        return SequenceMatch(
            key_cols=conf["key_cols"],
            ts_col=conf["ts_col"],
            id_col=conf["id_col"],
            symbol_col=conf["symbol_col"],
            symbols=conf["symbols"],
            within=conf.get("within", "1 hour"),
        )
    if name == "funnel_match":
        from benthos_spark.operators.cep import FunnelMatch

        return FunnelMatch(
            key_cols=conf["key_cols"],
            ts_col=conf["ts_col"],
            id_col=conf["id_col"],
            steps=[(st["name"], F.expr(st["check"])) for st in conf["steps"]],
            within=conf.get("within", "1 hour"),
        )
    if name == "absence_match":
        from benthos_spark.operators.cep import AbsenceMatch

        return AbsenceMatch(
            key_cols=conf["key_cols"],
            ts_col=conf["ts_col"],
            id_col=conf["id_col"],
            anchor=F.expr(conf["anchor"]),
            follower=F.expr(conf["follower"]),
            within=conf.get("within", "1 hour"),
        )
    if name == "loudness_gate":
        from benthos_spark.operators.audio import LoudnessGate

        return LoudnessGate(
            min_lufs=conf.get("min_lufs"),
            max_lufs=conf.get("max_lufs"),
            drop_measures=conf.get("drop_measures", False),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "loudness_measure":
        from benthos_spark.operators.audio import LoudnessMeasure

        conf = conf or {}
        return LoudnessMeasure(
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "loudness_normalize":
        from benthos_spark.operators.audio import LoudnessNormalize

        conf = conf or {}
        return LoudnessNormalize(
            target_lufs=conf.get("target_lufs", -23.0),
            max_gain_db=conf.get("max_gain_db", 30.0),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "vad_measure":
        from benthos_spark.operators.audio import VadMeasure

        conf = conf or {}
        return VadMeasure(
            threshold_db=conf.get("threshold_db", -35.0),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "vad_gate":
        from benthos_spark.operators.audio import VadGate

        return VadGate(
            min_active_frac=conf.get("min_active_frac"),
            min_longest_run_ms=conf.get("min_longest_run_ms"),
            threshold_db=conf.get("threshold_db", -35.0),
            drop_measures=conf.get("drop_measures", False),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "diarize":
        from benthos_spark.operators.audio import Diarize

        conf = conf or {}
        return Diarize(
            threshold_db=conf.get("threshold_db", -35.0),
            min_silence_ms=conf.get("min_silence_ms", 200),
            min_speech_ms=conf.get("min_speech_ms", 100),
            ahc_threshold=conf.get("ahc_threshold", 0.2),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "awk":
        from benthos_spark.operators.awk import AwkProcessor

        conf = conf or {}
        if "program" not in conf:
            raise ConfigError("awk processor needs a `program`")
        return AwkProcessor(
            program=conf["program"],
            codec=conf.get("codec", "text"),
            col=conf.get("col", "content"),
        )
    if name == "align_transcript":
        from benthos_spark.operators.audio import AlignTranscript

        conf = conf or {}
        return AlignTranscript(
            id_col=conf.get("id_col", "clip_id"),
            transcript_col=conf.get("transcript_col", "transcript"),
            threshold_db=conf.get("threshold_db", -35.0),
            min_silence_ms=conf.get("min_silence_ms", 200),
            min_speech_ms=conf.get("min_speech_ms", 100),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "pitch_measure":
        from benthos_spark.operators.audio import PitchMeasure

        conf = conf or {}
        return PitchMeasure(
            fmin=conf.get("fmin", 60.0),
            fmax=conf.get("fmax", 500.0),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "quality_measure":
        from benthos_spark.operators.audio import QualityMeasure

        conf = conf or {}
        return QualityMeasure(
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "quality_gate":
        from benthos_spark.operators.audio import QualityGate

        return QualityGate(
            max_clipped_frac=conf.get("max_clipped_frac"),
            max_abs_dc=conf.get("max_abs_dc"),
            min_rms_db=conf.get("min_rms_db"),
            drop_measures=conf.get("drop_measures", False),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "vad_segment":
        from benthos_spark.operators.audio import VadSegment

        conf = conf or {}
        return VadSegment(
            id_col=conf.get("id_col", "clip_id"),
            threshold_db=conf.get("threshold_db", -35.0),
            min_silence_ms=conf.get("min_silence_ms", 200),
            min_speech_ms=conf.get("min_speech_ms", 100),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "speed_perturb":
        from benthos_spark.operators.audio import SpeedPerturb

        conf = conf or {}
        return SpeedPerturb(
            factors=tuple(conf.get("factors", (0.9, 1.0, 1.1))),
            fanout=conf.get("fanout", False),
            taps=conf.get("taps", 16),
            id_col=conf.get("id_col", "clip_id"),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "tempo_perturb":
        from benthos_spark.operators.audio import TempoPerturb

        conf = conf or {}
        return TempoPerturb(
            factors=tuple(conf.get("factors", (0.9, 1.0, 1.1))),
            fanout=conf.get("fanout", False),
            id_col=conf.get("id_col", "clip_id"),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "gain_perturb":
        from benthos_spark.operators.audio import GainPerturb

        conf = conf or {}
        return GainPerturb(
            min_db=conf.get("min_db", -6.0),
            max_db=conf.get("max_db", 6.0),
            id_col=conf.get("id_col", "clip_id"),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "noise_mix":
        from benthos_spark.operators.audio import NoiseMix

        conf = conf or {}
        return NoiseMix(
            snr_db=conf.get("snr_db", 20.0),
            jitter_db=conf.get("jitter_db", 0.0),
            id_col=conf.get("id_col", "clip_id"),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "reverb":
        from benthos_spark.operators.audio import ReverbAugment

        conf = conf or {}
        return ReverbAugment(
            rt60_ms=conf.get("rt60_ms", 300.0),
            wet=conf.get("wet", 0.3),
            id_col=conf.get("id_col", "clip_id"),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "fbank_augment":
        from benthos_spark.operators.audio import FbankAugment

        conf = conf or {}
        return FbankAugment(
            n_mels=conf.get("n_mels", 40),
            time_masks=conf.get("time_masks", 2),
            freq_masks=conf.get("freq_masks", 2),
            max_t=conf.get("max_t", 20),
            max_f=conf.get("max_f", 8),
            drop_payload=conf.get("drop_payload", False),
            id_col=conf.get("id_col", "clip_id"),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "speaking_rate":
        from benthos_spark.operators.audio import SpeakingRate

        conf = conf or {}
        return SpeakingRate(
            min_wps=conf.get("min_wps"),
            max_wps=conf.get("max_wps"),
            drop_measures=conf.get("drop_measures", False),
            transcript_col=conf.get("transcript_col", "transcript"),
            dur_col=conf.get("dur_col", "dur_ms"),
        )
    if name == "cmvn":
        from benthos_spark.operators.audio import Cmvn

        conf = conf or {}
        return Cmvn(
            fbank_col=conf.get("fbank_col", "fbank"),
            n_mels_col=conf.get("n_mels_col", "n_mels"),
            eps=conf.get("eps", 1e-8),
        )
    if name == "augment":
        from benthos_spark.operators.audio import AugmentChain

        conf = conf or {}
        return AugmentChain(
            stages=tuple(conf.get("stages", ())),
            id_col=conf.get("id_col", "clip_id"),
            bytes_col=conf.get("bytes_col", "bytes"),
            codec_col=conf.get("codec_col", "codec"),
            sr_col=conf.get("sr_col", "sr_hz"),
        )
    if name == "wasm":
        from benthos_spark.operators.wasm import Wasm

        conf = conf or {}
        module_bytes = b""
        if conf.get("module_bytes_b64"):
            import base64

            module_bytes = base64.b64decode(conf["module_bytes_b64"])
        elif not conf.get("module_path"):
            raise ConfigError("wasm processor needs a `module_path`")
        return Wasm(
            module_path=conf.get("module_path", ""),
            module_bytes=module_bytes,
            function=conf.get("function", "process"),
            col=conf.get("col", "value"),
        )
    if name == "sleep":
        conf = conf or {}
        if isinstance(conf, str):
            conf = {"duration": conf}
        return P.Sleep(duration=conf.get("duration", ""))
    if name == "xml":
        # reference: internal/impl/xml/processor.go — sole operator
        # to_json parses the content as XML into the structured form;
        # delegates to the same ToMap conventions as parse_xml
        conf = conf or {}
        op = conf.get("operator", "")
        if op != "to_json":
            raise ConfigError(f"operator not recognised: {op}")
        from benthos_spark.bloblang import BloblangMapping

        cast = "true" if conf.get("cast", False) else "false"
        return BloblangMapping(f"root = content().parse_xml(cast: {cast})")
    if name == "javascript":
        from benthos_spark.operators.js import JavaScript

        conf = conf or {}
        if bool(conf.get("code")) == bool(conf.get("file")):
            raise ConfigError(
                "javascript processor: exactly one of `code` or `file` "
                "must be specified")
        return JavaScript(
            code=conf.get("code", ""),
            file=conf.get("file", ""),
            col=conf.get("col", "value"),
        )
    if name == "subprocess":
        from benthos_spark.operators.subproc import Subprocess

        return Subprocess(
            name=conf.get("name", ""),
            args=conf.get("args", []),
            codec_send=conf.get("codec_send", "lines"),
            codec_recv=conf.get("codec_recv", "lines"),
            col=conf.get("col", "value"),
            max_buffer=conf.get("max_buffer", 65536),
        )
    if name == "command":
        from benthos_spark.operators.subproc import Command

        return Command(
            name=conf.get("name", ""),
            args_mapping=conf.get("args_mapping"),
            col=conf.get("col", "value"),
            timeout_s=conf.get("timeout_s", 30.0),
        )
    if name == "http":
        from benthos_spark.operators.http import Http

        return Http(
            url=conf.get("url", ""),
            verb=conf.get("verb", "POST"),
            headers=conf.get("headers", {}),
            timeout_s=conf.get("timeout_s", 5.0),
            retries=conf.get("retries", 3),
            backoff_ms=conf.get("backoff_ms", 300),
            parallel=conf.get("parallel", False),
            parallel_n=conf.get("parallel_n", 16),
            successful_on=tuple(conf.get("successful_on", ())),
            col=conf.get("col", "value"),
        )
    if name == "mongodb":
        from benthos_spark.operators.mongo import MongoFindOne

        return MongoFindOne(
            url=conf["url"],
            database=conf.get("database", "test"),
            collection=conf["collection"],
            key_field=conf.get("key_field", "_id"),
            key_col=conf.get("key_col", "key"),
            result_col=conf.get("result_col", "mongo_doc"),
        )
    if name == "redis":
        from benthos_spark.operators.redis import RedisProcessor

        return RedisProcessor(
            url=conf["url"],
            operator=conf.get("operator"),
            key_col=conf.get("key_col", "key"),
            value_col=conf.get("value_col", "value"),
            command=conf.get("command"),
            args_cols=conf.get("args_cols", []),
            result_col=conf.get("result_col", "redis_result"),
        )
    if name == "sql_select":
        from benthos_spark.operators.sql import SqlSelect

        return SqlSelect(
            dsn=conf["dsn"],
            table=conf["table"],
            columns=conf["columns"],
            args_mapping=conf.get("args_mapping", {}),
            where=conf.get("where"),
            driver=conf.get("driver"),
            how=conf.get("how", "left"),
            prefix=conf.get("prefix", ""),
        )
    if name == "schema_registry_decode":
        from benthos_spark.operators.confluent import SchemaRegistryDecode

        return SchemaRegistryDecode(
            url=conf["url"],
            col=conf.get("col", "value"),
            out_col=conf.get("out_col"),
            avro_raw_json=conf.get("avro_raw_json", False),
        )
    if name == "schema_registry_encode":
        from benthos_spark.operators.confluent import SchemaRegistryEncode

        return SchemaRegistryEncode(
            url=conf["url"],
            subject=conf["subject"],
            col=conf.get("col", "value"),
            out_col=conf.get("out_col"),
            avro_raw_json=conf.get("avro_raw_json", False),
            refresh_period=_duration_s(conf.get("refresh_period", "10m")),
        )
    if name == "aws_lambda":
        from benthos_spark.operators.awsio import LambdaProcessor

        return LambdaProcessor(
            endpoint=conf["endpoint"],
            function=conf["function"],
            col=conf.get("col", "value"),
            result_col=conf.get("result_col"),
            parallel=conf.get("parallel", False),
            retries=conf.get("retries", 3),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
        )
    if name == "sentry_capture":
        from benthos_spark.operators.notify import SentryCaptureProcessor

        return SentryCaptureProcessor(
            dsn=conf["dsn"],
            message_col=conf.get("message_col", "value"),
            level=conf.get("level", "INFO").lower(),
            environment=conf.get("environment", ""),
            release=conf.get("release", ""),
            sampling_rate=conf.get("sampling_rate", 1.0),
            tags_cols=conf.get("tags_cols"),
        )
    if name == "couchbase":
        from benthos_spark.operators.couchbase import CouchbaseProcessor

        return CouchbaseProcessor(
            url=conf["url"],
            bucket=conf.get("bucket", "default"),
            username=conf.get("username", ""),
            password=conf.get("password", ""),
            operation=conf.get("operation", "get"),
            id_col=conf.get("id_col", "key"),
            content_col=conf.get("content_col"),
            col=conf.get("col", "value"),
        )
    if name == "gcp_bigquery_select":
        from benthos_spark.operators.gcp_storage import BigQuerySelectProcessor

        return BigQuerySelectProcessor(
            endpoint=conf["endpoint"],
            project=conf["project"],
            table=conf["table"],
            columns=conf.get("columns", ["*"]),
            where=conf.get("where"),
            args_cols=conf.get("args_cols", []),
            col=conf.get("col", "value"),
            token=conf.get("token"),
        )
    if name == "aws_dynamodb_partiql":
        from benthos_spark.operators.awsio import DynamoDBPartiQLProcessor

        return DynamoDBPartiQLProcessor(
            endpoint=conf["endpoint"],
            query=conf["query"],
            args_cols=conf.get("args_cols", []),
            col=conf.get("col", "value"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
        )
    expanded = _try_template("processor", name, conf, _proc, resources)
    if expanded is not None:
        return expanded
    raise ConfigError(
        f"unknown processor {name!r}; known: mapping, mutation, filter, switch, dedupe, "
        "bounds_check, grok, parse_log, json_schema, archive, unarchive, split, try, catch, "
        "compress, decompress, window_agg, session_window_agg, sql_select, jq, jmespath, redis, mongodb, "
        "loudness_gate, loudness_measure, loudness_normalize, vad_measure, vad_gate, "
        "pitch_measure, quality_measure, quality_gate, vad_segment, diarize, "
        "align_transcript, awk, "
        "speed_perturb, tempo_perturb, gain_perturb, noise_mix, reverb, fbank_augment, "
        "augment, speaking_rate, cmvn, "
        "subprocess, command, http, wasm, javascript, xml, sleep, sequence_match, funnel_match, absence_match, "
        "schema_registry_encode, schema_registry_decode, aws_lambda, aws_dynamodb_partiql, gcp_bigquery_select, couchbase, sentry_capture"
    )


# -- outputs ----------------------------------------------------------------


class _ProcessedSink:
    """Output-level `processors` (the reference's output.WithPipeline,
    produced e.g. by template expansions that attach a processor chain to
    an output node, splunk template_output.yaml:93): run the chain on
    each micro-batch's DataFrame before the inner sink sees it."""

    def __init__(self, inner: Callable, processors: list):
        self.inner = inner
        self.processors = processors

    def __getattr__(self, item):
        # sinks expose start/stop/address-style surface; delegate it
        return getattr(self.inner, item)

    def __call__(self, df, batch_id) -> None:
        from benthos_spark.operators.processors import compose

        self.inner(compose(df, self.processors), batch_id)


def _output(spec: dict, resources: Resources | None = None) -> Callable:
    if "processors" in spec and len(spec) > 1:
        spec = dict(spec)
        procs = [_proc(p, resources) for p in spec.pop("processors") or []]
        sink = _output(spec, resources)
        return _ProcessedSink(sink, procs) if procs else sink
    (name, conf), = spec.items()
    conf = conf or {}
    if name == "resource":
        if resources is None or conf not in resources.outputs:
            raise ConfigError(f"unknown output resource {conf!r}")
        return resources.outputs[conf]
    if name == "cache":
        label = conf["resource"]
        if resources is None or label not in resources.caches:
            raise ConfigError(f"unknown cache resource {label!r}")
        from benthos_spark.operators.cache import CacheWriteSink

        return CacheWriteSink(resources.caches[label], key_col=conf["key"],
                              value_col=conf.get("value_col", "value"))
    if name == "exactly_once":
        return ExactlyOnceParquetSink(conf["dir"], lineage_cols=tuple(conf.get("lineage", [])))
    if name == "iceberg":
        from benthos_spark.sinks.iceberg import ExactlyOnceIcebergSink

        return ExactlyOnceIcebergSink(
            conf["table"] if "table" in conf else conf["path"],
            lineage_cols=tuple(conf.get("lineage", [])),
            partition_by=tuple(conf.get("partition_by", [])),
            rewrite_manifests_every=conf.get("rewrite_manifests_every"),
        )
    if name == "dynamic":
        from benthos_spark.sources.readers import DynamicSet

        reg = DynamicSet()
        for label, child in (conf.get("outputs") or {}).items():
            reg.set(label, _output(child, resources))
        selected = conf.get("selected") or (reg.labels()[0] if reg.labels() else None)
        if selected is None:
            raise ConfigError("dynamic output: no outputs registered")
        return R.DynamicSink(reg, selected=selected)
    if name == "iceberg_merge_apply":
        from benthos_spark.sinks.iceberg import IcebergMergeApplySink

        return IcebergMergeApplySink(
            table_path=conf["table"] if "table" in conf else conf["path"],
            pk_cols=tuple(conf["pk"]),
            order_col=conf.get("order_col", "lsn"),
        )
    if name == "aws_sqs":
        from benthos_spark.operators.awsio import SqsSink

        return SqsSink(
            endpoint=conf["endpoint"], url=conf["url"],
            col=conf.get("col", "value"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"))
    if name == "aws_sns":
        from benthos_spark.operators.awsio import SnsSink

        return SnsSink(
            endpoint=conf["endpoint"], topic_arn=conf["topic_arn"],
            col=conf.get("col", "value"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"))
    if name == "aws_kinesis":
        from benthos_spark.operators.awsio import KinesisSink

        return KinesisSink(
            endpoint=conf["endpoint"], stream=conf["stream"],
            col=conf.get("col", "value"),
            partition_key_col=conf.get("partition_key_col"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"))
    if name == "aws_kinesis_firehose":
        from benthos_spark.operators.awsio import KinesisFirehoseSink

        return KinesisFirehoseSink(
            endpoint=conf["endpoint"], stream=conf["stream"],
            col=conf.get("col", "value"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"))
    if name == "aws_dynamodb":
        from benthos_spark.operators.awsio import DynamoDBSink

        return DynamoDBSink(
            endpoint=conf["endpoint"], table=conf["table"],
            string_columns=conf.get("string_columns"),
            json_map_columns=conf.get("json_map_columns"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"))
    if name == "aws_s3":
        from benthos_spark.operators.s3 import S3Sink

        return S3Sink(
            endpoint=conf["endpoint"],
            bucket=conf["bucket"],
            col=conf.get("col", "value"),
            path_col=conf.get("path_col"),
            path_prefix=conf.get("path", "out/"),
            content_type=conf.get("content_type", "application/octet-stream"),
            access_key=conf.get("access_key", "test"),
            secret_key=conf.get("secret_key", "test"),
            region=conf.get("region", "us-east-1"),
        )
    if name == "azure_blob_storage":
        from benthos_spark.operators.azure_blob import AzureBlobSink

        return AzureBlobSink(
            endpoint=conf["endpoint"],
            container=conf["container"],
            col=conf.get("col", "value"),
            path_col=conf.get("path_col"),
            path_prefix=conf.get("path", "out/"),
            account=conf.get("storage_account", "devstoreaccount1"),
            key_b64=conf.get("storage_access_key", ""),
        )
    if name == "sftp":
        from benthos_spark.operators.sftpio import SftpSink

        creds = conf.get("credentials") or {}
        return SftpSink(
            address=conf["address"],
            username=creds.get("username", conf.get("username", "")),
            password=creds.get("password", conf.get("password", "")),
            directory=conf["directory"] if "directory" in conf else conf["path"],
            col=conf.get("col", "value"),
            path_col=conf.get("path_col"),
        )
    if name == "amqp_1":
        from benthos_spark.operators.amqp1 import Amqp1Sink

        return Amqp1Sink(
            url=conf["url"],
            target_address=conf["target_address"],
            col=conf.get("col", "value"),
        )
    if name == "snowflake_put":
        from benthos_spark.operators.snowflake import SnowflakePutSink

        return SnowflakePutSink(
            endpoint=conf["endpoint"],
            account=conf["account"],
            user=conf["user"],
            private_key_pem=conf.get("private_key"),
            private_key=conf.get("private_key_obj"),
            stage=conf.get("stage", "@%BENTHOS_TBL"),
            path=conf.get("path", "out"),
            snowpipe=conf.get("snowpipe"),
            compression=conf.get("compression", "AUTO"),
            batch_rows=conf.get("batch_rows", 1000),
            col=conf.get("col", "value"),
        )
    if name == "hdfs":
        from benthos_spark.operators.hdfs import HdfsSink

        return HdfsSink(
            hosts=conf["hosts"],
            directory=conf["directory"],
            col=conf.get("col", "value"),
            path_col=conf.get("path_col"),
            user=conf.get("user", "hadoop"),
        )
    if name == "discord":
        from benthos_spark.operators.notify import DiscordSink

        return DiscordSink(
            endpoint=conf["endpoint"],
            channel_id=conf["channel_id"],
            bot_token=conf["bot_token"],
            col=conf.get("col", "value"),
        )
    if name == "pusher":
        from benthos_spark.operators.notify import PusherSink

        return PusherSink(
            endpoint=conf["endpoint"],
            app_id=conf["appId"] if "appId" in conf else conf["app_id"],
            key=conf["key"],
            secret=conf["secret"],
            event=conf["event"],
            channel=conf.get("channel", ""),
            channel_col=conf.get("channel_col"),
            col=conf.get("col", "value"),
        )
    if name == "pulsar":
        from benthos_spark.operators.pulsario import PulsarSink

        return PulsarSink(
            url=conf["url"],
            topic=conf["topic"],
            col=conf.get("col", "value"),
            key_col=conf.get("key_col"),
        )
    if name == "zmq4":
        from benthos_spark.operators.zmqio import ZmqSink

        return ZmqSink(
            urls=conf["urls"],
            socket_type=conf.get("socket_type", "PUSH"),
            bind=conf.get("bind", False),
            col=conf.get("col", "value"),
        )
    if name == "nanomsg":
        from benthos_spark.operators.zmqio import NanomsgSink

        return NanomsgSink(
            urls=conf["urls"],
            socket_type=conf.get("socket_type", "PUSH"),
            bind=conf.get("bind", False),
            col=conf.get("col", "value"),
        )
    if name == "gcp_cloud_storage":
        from benthos_spark.operators.gcp_storage import GcsSink

        return GcsSink(
            endpoint=conf["endpoint"],
            bucket=conf["bucket"],
            col=conf.get("col", "value"),
            path_col=conf.get("path_col"),
            path_prefix=conf.get("path", "out/"),
            collision_mode=conf.get("collision_mode", "overwrite"),
            token=conf.get("token"),
        )
    if name == "gcp_bigquery":
        from benthos_spark.operators.gcp_storage import BigQuerySink

        return BigQuerySink(
            endpoint=conf["endpoint"],
            project=conf["project"],
            dataset=conf["dataset"],
            table=conf["table"],
            json_col=conf.get("col", "value"),
            batch_rows=conf.get("batch_rows", 500),
            token=conf.get("token"),
        )
    if name == "azure_queue_storage":
        from benthos_spark.operators.azure_qt import AzureQueueSink

        return AzureQueueSink(
            endpoint=conf["endpoint"],
            queue_name=conf["queue_name"],
            col=conf.get("col", "value"),
            account=conf.get("storage_account", "devstoreaccount1"),
            key_b64=conf.get("storage_access_key", ""),
        )
    if name == "azure_table_storage":
        from benthos_spark.operators.azure_qt import AzureTableSink

        return AzureTableSink(
            endpoint=conf["endpoint"],
            table_name=conf["table_name"],
            partition_key_col=conf["partition_key_col"],
            row_key_col=conf["row_key_col"],
            properties=conf.get("properties"),
            json_col=conf.get("json_col"),
            insert_type=conf.get("insert_type", "INSERT"),
            account=conf.get("storage_account", "devstoreaccount1"),
            key_b64=conf.get("storage_access_key", ""),
        )
    if name == "cassandra":
        from benthos_spark.operators.cassandra import CassandraSink

        return CassandraSink(
            addresses=conf.get("addresses") or [conf.get("address", "")],
            query=conf["query"],
            args_mapping=conf.get("args_mapping"),
            col=conf.get("col", "value"),
            max_retries=conf.get("max_retries", 3),
        )
    if name == "mongodb":
        from benthos_spark.operators.mongo import MongoSink

        return MongoSink(
            url=conf["url"],
            database=conf.get("database", "test"),
            collection=conf["collection"],
            col=conf.get("col", "value"),
            operation=conf.get("operation", "insert"),
            key_col=conf.get("key_col"),
        )
    if name == "gcp_pubsub":
        from benthos_spark.operators.gcp_pubsub import PubSubSink

        return PubSubSink(
            endpoint=conf["endpoint"],
            project=conf["project"],
            topic=conf["topic"],
            col=conf.get("col", "value"),
            attr_cols=conf.get("attr_cols", []),
            publish_batch=conf.get("publish_batch", 100),
            token=conf.get("token"),
        )
    if name == "elasticsearch":
        from benthos_spark.operators.elastic import ElasticsearchSink

        return ElasticsearchSink(
            url=(conf.get("urls") or [conf.get("url", "")])[0]
            if "urls" in conf else conf["url"],
            index=conf["index"],
            col=conf.get("col", "value"),
            id_col=conf.get("id_col"),
            index_col=conf.get("index_col"),
            action=conf.get("action", "index"),
            bulk_size=conf.get("bulk_size", 500),
        )
    if name == "nsq":
        from benthos_spark.operators.queueio import NsqSink

        return NsqSink(
            address=conf.get("address") or conf.get("nsqd_tcp_address", ""),
            topic=conf["topic"],
            col=conf.get("col", "value"),
        )
    if name == "beanstalkd":
        from benthos_spark.operators.queueio import BeanstalkdSink

        return BeanstalkdSink(
            address=conf["address"],
            tube=conf.get("tube", "default"),
            col=conf.get("col", "value"),
        )
    if name == "amqp_0_9":
        from benthos_spark.operators.amqp09 import Amqp09Sink

        return Amqp09Sink(
            url=conf.get("url") or (conf.get("urls") or [""])[0],
            exchange=conf.get("exchange", ""),
            key=conf.get("key", ""),
            col=conf.get("col", "value"),
            key_col=conf.get("key_col"),
            declare_queue=conf.get("declare_queue"),
        )
    if name == "nats":
        from benthos_spark.operators.natsio import NatsSink

        return NatsSink(
            url=conf.get("url") or (conf.get("urls") or [""])[0],
            subject=conf.get("subject", ""),
            col=conf.get("col", "value"),
            subject_col=conf.get("subject_col"),
        )
    if name == "mqtt":
        from benthos_spark.operators.mqttio import MqttSink

        return MqttSink(
            url=conf.get("url") or (conf.get("urls") or [""])[0],
            topic=conf.get("topic", ""),
            col=conf.get("col", "value"),
            topic_col=conf.get("topic_col"),
            qos=conf.get("qos", 1),
            retained=conf.get("retained", False),
        )
    if name == "kafka":
        from benthos_spark.operators.kafka import KafkaSink

        return KafkaSink(
            address=conf.get("address") or (conf.get("addresses") or [""])[0],
            topic=conf["topic"],
            col=conf.get("col", "value"),
            key_col=conf.get("key_col"),
            headers_col=conf.get("headers_col"),
            batch_records=conf.get("batch_records", 256),
        )
    if name == "redis_list":
        from benthos_spark.operators.redis import RedisListSink

        return RedisListSink(
            url=conf["url"],
            key=conf.get("key", ""),
            command=conf.get("command", "rpush"),
            col=conf.get("col", "value"),
            key_col=conf.get("key_col"),
        )
    if name == "redis_pubsub":
        from benthos_spark.operators.redis import RedisPubSubSink

        return RedisPubSubSink(
            url=conf["url"],
            channel=conf.get("channel", ""),
            col=conf.get("col", "value"),
            channel_col=conf.get("channel_col"),
        )
    if name == "redis_streams":
        from benthos_spark.operators.redis import RedisStreamsSink

        return RedisStreamsSink(
            url=conf["url"],
            stream=conf["stream"],
            col=conf.get("col", "value"),
            body_key=conf.get("body_key", "body"),
            meta_cols=conf.get("metadata_cols", []),
        )
    if name == "redis_hash":
        from benthos_spark.operators.redis import RedisHashSink

        return RedisHashSink(
            url=conf["url"],
            key_col=conf["key_col"],
            field_cols=conf["fields"],
        )
    if name == "merge_apply":
        from benthos_spark.operators.cdc import MergeApplySink

        return MergeApplySink(
            out_dir=conf["dir"],
            pk_cols=conf["pk"],
            order_col=conf.get("order_col", "lsn"),
            n_buckets=conf.get("n_buckets", 16),
        )
    if name == "drop":
        return R.DropSink()
    if name == "subprocess":
        from benthos_spark.operators.subproc import SubprocessSink

        return SubprocessSink(
            name=conf.get("name", ""),
            args=conf.get("args", []),
            codec=conf.get("codec", "lines"),
            col=conf.get("col", "value"),
        )
    if name == "stdout":
        return R.StdoutSink(col=conf.get("col", "value"), codec=conf.get("codec", "lines"))
    if name == "file":
        return R.FileSink(
            path=conf["path"],
            col=conf.get("col", "value"),
            codec=conf.get("codec", "lines"),
            partition_by=tuple(conf.get("partition_by", ())),
        )
    if name == "websocket":
        from benthos_spark.operators.wsio import WebsocketSink

        return WebsocketSink(
            url=conf.get("url", ""),
            col=conf.get("col", "value"),
            timeout_s=conf.get("timeout_s", 30.0),
        )
    if name == "http_client":
        from benthos_spark.operators.http import HttpClientSink

        return HttpClientSink(
            url=conf.get("url", ""),
            verb=conf.get("verb", "POST"),
            headers=conf.get("headers", {}),
            timeout_s=conf.get("timeout_s", 5.0),
            retries=conf.get("retries", 3),
            backoff_ms=conf.get("backoff_ms", 300),
            parallel_n=conf.get("parallel_n", 16),
            col=conf.get("col", "value"),
        )
    if name == "socket":
        return R.SocketSink(
            address=conf.get("address", ""),
            network=conf.get("network", "tcp"),
            col=conf.get("col", "value"),
            codec=conf.get("codec", "lines"),
        )
    if name == "fan_out":
        return R.FanOut(*[_output(c, resources) for c in conf])
    if name == "switch":
        cases = [(F.expr(c["check"]), _output(c["output"], resources), c.get("continue", False)) for c in conf.get("cases", [])]
        default = _output(conf["default"], resources) if "default" in conf else None
        return R.SwitchSink(cases=cases, default=default)
    if name == "fallback":
        return R.Fallback(*[_output(c, resources) for c in conf])
    if name == "round_robin":
        return R.RoundRobinSink([_output(c, resources) for c in conf["outputs"]], key=conf.get("key"))
    if name == "dlq_split":
        return R.DlqSplit(_output(conf["main"], resources), _output(conf["dlq"], resources))
    if name == "retry":
        return R.RetrySink(
            _output(conf["output"], resources),
            max_retries=conf.get("max_retries", 3),
            backoff_s=conf.get("backoff", 0.5),
        )
    if name == "reject":
        return R.RejectSink(conf if isinstance(conf, str) else conf.get("error"))
    if name == "inproc":
        return R.InprocSink(conf if isinstance(conf, str) else conf["name"])
    if name == "sql_insert":
        from benthos_spark.operators.sql import SqlInsertSink

        return SqlInsertSink(
            dsn=conf["dsn"],
            table=conf["table"],
            columns=conf.get("columns", []),
            args_mapping=conf.get("args_mapping"),
            driver=conf.get("driver"),
        )
    if name == "sync_response":
        from benthos_spark.sinks.http_server import SyncResponseSink

        return SyncResponseSink(
            col=conf.get("col", "value"),
            status=conf.get("status", 200),
            max_rows=conf.get("max_rows", 10_000),
        )
    if name == "http_server":
        from benthos_spark.sinks.http_server import HttpServerSink

        return HttpServerSink(
            address=conf.get("address", "127.0.0.1:0"),
            path=conf.get("path", "/get"),
            stream_path=conf.get("stream_path", "/get/stream"),
            ws_path=conf.get("ws_path", "/get/ws"),
            col=conf.get("col", "value"),
            timeout_s=conf.get("timeout_s", 5.0),
            max_queue=conf.get("max_queue", 1024),
        )
    expanded = _try_template("output", name, conf, _output, resources)
    if expanded is not None:
        return expanded
    raise ConfigError(
        f"unknown output {name!r}; known: exactly_once, iceberg, iceberg_merge_apply, merge_apply, dynamic, drop, fan_out, switch, "
        "fallback, round_robin, dlq_split, retry, reject, inproc, sql_insert, cache, subprocess, stdout, file, socket, http_client, "
        "websocket, sync_response, http_server, kafka, nats, mqtt, amqp_0_9, amqp_1, nsq, beanstalkd, aws_s3, aws_sqs, aws_sns, "
        "aws_kinesis, aws_kinesis_firehose, aws_dynamodb, pulsar, discord, pusher, hdfs, sftp, snowflake_put, zmq4, nanomsg, gcp_pubsub, gcp_cloud_storage, gcp_bigquery, "
        "azure_blob_storage, azure_queue_storage, azure_table_storage, mongodb, cassandra, elasticsearch, redis_list, redis_pubsub, redis_streams, redis_hash, resource"
    )


# -- top level --------------------------------------------------------------


_ENV_RE = re.compile(r"\$\{([0-9A-Za-z_.]+)(:((\$\{[^}]+\})|[^}])*)?\}")
_ESCAPED_ENV_RE = re.compile(r"\$\{(\{[0-9A-Za-z_.]+(:((\$\{[^}]+\})|[^}])*)?\})\}")


def replace_env_variables(text: str, lookup=None) -> str:
    """`${FOO}` / `${FOO:default}` config interpolation
    (internal/config/env_vars.go:41 ReplaceEnvVariables): empty/missing
    var → default (or error without one); `${{FOO}}` escapes to a
    literal `${FOO}`. `${! ...}` Bloblang interpolations are untouched
    (the env pattern requires an identifier first)."""
    lookup = lookup or (lambda k: os.environ.get(k))
    missing: list[str] = []

    def sub(m: re.Match) -> str:
        name = m.group(1)
        default = m.group(2)[1:] if m.group(2) else None
        val = lookup(name)
        if val:
            return val
        if default is not None:
            return default
        missing.append(name)
        return ""

    out = _ENV_RE.sub(sub, text)
    if missing:
        raise ConfigError(f"required environment variables were not set: {missing}")
    return _ESCAPED_ENV_RE.sub(lambda m: "${" + m.group(1)[1:-1] + "}", out)


def compile_config(conf: str | dict) -> tuple[Pipeline, Callable]:
    """YAML/dict config -> (Pipeline, sink). Raises ConfigError on unknown
    components (compile-time lint ≙ reader.go:314). String configs get
    `${VAR}` env interpolation before parsing (env_vars.go)."""
    if isinstance(conf, str):
        conf = yaml.safe_load(replace_env_variables(conf))
    if "input" not in conf or "output" not in conf:
        raise ConfigError("config needs `input` and `output` sections")
    resources = Resources.from_config(conf)
    source = _input(conf["input"], resources)
    procs = [_proc(p, resources) for p in (conf.get("pipeline") or {}).get("processors", [])]
    if isinstance(source, S.BatchedSource):
        rebatch = source.policy.processor()
        if rebatch is not None:
            procs = [rebatch] + procs
    sink = _output(conf["output"], resources)
    if conf.get("tracer"):
        _tracer(conf["tracer"])  # compile-time lint; wiring is run_config's
    return Pipeline(source=source, processors=procs), sink


def _tracer(spec: dict):
    """Top-level `tracer:` section → span exporter. The reference ships
    none/jaeger/open_telemetry_collector/gcp_cloudtrace providers
    (internal/impl/pure/tracer_none.go:15, jaeger/tracer_jaeger.go:26,
    otlp/tracer_otlp.go:46, gcp/tracer_cloudtrace.go:23); network
    backends are gated here — `file_collector` is the local OTLP-agent
    analog (streaming/tracing.py)."""
    from benthos_spark.streaming import tracing as T

    (name, conf), = spec.items()
    conf = conf or {}
    if name == "none":
        return T.NoneTracer()
    if name == "file_collector":
        if not conf.get("path"):
            raise ConfigError("tracer file_collector needs `path`")
        return T.FileCollector(conf["path"])
    if name in ("jaeger", "open_telemetry_collector"):
        # jaeger >=1.35 ingests OTLP natively (its published surface);
        # one OTLP/HTTP exporter serves both tracer names
        from benthos_spark.functions.otlp import OtlpHttpExporter

        endpoint = (conf.get("http", {}).get("address")
                    or conf.get("collector_url") or conf.get("endpoint"))
        if not endpoint:
            raise ConfigError(f"tracer {name!r} needs an endpoint "
                              "(http.address / collector_url / endpoint)")
        return OtlpHttpExporter(
            endpoint=endpoint,
            service_name=conf.get("service_name", "benthos"),
        )
    if name == "gcp_cloudtrace":
        raise ConfigError(
            "tracer 'gcp_cloudtrace' needs Google-managed OAuth this "
            "environment cannot mint; use `open_telemetry_collector` (OTLP) "
            "or `file_collector: {path: ...}`"
        )
    raise ConfigError(f"unknown tracer {name!r}")


def run_config(
    spark, conf: str | dict, checkpoint: str, trigger_once: bool = True, **start_kwargs
):
    """Compile + start (streaming) or materialize (batch). The CLI
    entrypoint equivalent of `benthos -c config.yaml`."""
    if isinstance(conf, str):
        conf = yaml.safe_load(replace_env_variables(conf))
    pipe, sink = compile_config(conf)
    # top-level `tracer:` section — span propagation + export, no event
    # capture (the reference's tracer config sets the OTel provider;
    # event capture is the RunObserved/test surface: tracing.traced)
    tconf = conf.get("tracer") if isinstance(conf, dict) else None
    if tconf:
        from benthos_spark.streaming.tracing import NoneTracer, traced

        tracer = _tracer(tconf)
        if not isinstance(tracer, NoneTracer):
            pipe, sink, _ = traced(pipe, spark, sink=sink, tracer=tracer, events=False)
    # top-level `metrics:` section (reference config metrics exporters;
    # here: the per-batch JSONL listener, streaming/metrics.py)
    mconf = conf.get("metrics") if isinstance(conf, dict) else None
    if mconf and "metrics_path" not in start_kwargs:
        path = mconf.get("json_file", {}).get("path") if isinstance(mconf, dict) else None
        if path:
            start_kwargs["metrics_path"] = path
    if isinstance(mconf, dict) and ("statsd" in mconf or "influxdb" in mconf
                                    or "aws_cloudwatch" in mconf):
        # push exporters (internal/impl/statsd/metrics_statsd.go,
        # internal/impl/influxdb/metrics_influxdb.go,
        # internal/impl/aws/metrics_cloudwatch.go)
        from benthos_spark.streaming import exporters as E

        push = []
        if "aws_cloudwatch" in mconf:
            from benthos_spark.operators.awsio import CloudWatchExporter

            cconf = mconf["aws_cloudwatch"] or {}
            push.append(CloudWatchExporter(
                endpoint=cconf["endpoint"],
                namespace=cconf.get("namespace", "Benthos"),
                access_key=cconf.get("access_key", "test"),
                secret_key=cconf.get("secret_key", "test"),
                region=cconf.get("region", "us-east-1"),
            ))
        if "statsd" in mconf:
            sconf = mconf["statsd"] or {}
            push.append(E.StatsdExporter(
                address=sconf["address"],
                prefix=sconf.get("prefix", "benthos"),
                tag_format=sconf.get("tag_format", "none"),
            ))
        if "influxdb" in mconf:
            iconf = mconf["influxdb"] or {}
            push.append(E.InfluxDBExporter(
                url=iconf["url"],
                db=iconf["db"],
                prefix=iconf.get("prefix", "benthos."),
                tags=iconf.get("tags"),
            ))
        E.attach_push(spark, *push)
    # look through the tracing wrapper for the policy check (the traced
    # source delegates attributes but not isinstance)
    inner_source = getattr(pipe.source, "wrapped", pipe.source)
    if isinstance(inner_source, S.BatchedSource) and not trigger_once:
        start_kwargs = {**inner_source.policy.start_kwargs(), **start_kwargs}
    if pipe.source.streaming:
        return pipe.start(spark, sink, checkpoint=checkpoint, trigger_once=trigger_once,
                          **start_kwargs)
    df = pipe.run_batch(spark)
    sink(df, 0)
    return None
