"""`aws_s3` input/output (internal/impl/aws/input_s3.go, output_s3.go)
over the from-scratch SigV4 client in benthos_spark/functions/s3_proto.

Spark shape:

- **batch input**: ListObjectsV2 under the prefix on the driver (keys
  only — cheap), then one Spark partition per object GET on executors
  (bin-packed by size up to ``max_partition_bytes``), codec `all-bytes`
  (one row per object) or `lines`. Listing is metadata-scale; the data
  plane is fully distributed.
- **streaming input**: a Python data source whose checkpoint offset is
  the lexicographically LARGEST KEY consumed — ListObjectsV2's
  ``start-after`` makes key order a replayable offset axis, so resume
  is exactly-once downstream of the sink ledger. Contract (documented,
  same as every watermark-keyed lake ingestion): producers write keys
  in lexicographically increasing order (timestamped prefixes). The
  reference instead tails SQS bucket notifications — an external queue
  this engine models with its kafka/nats inputs; key-watermark polling
  is the queue-free equivalent.
- **output**: one PUT per message (the reference's contract: each part
  becomes an object at an interpolated path) from executors, one HTTP
  connection per partition task; ``path_col`` carries the per-row key
  (the interpolation analog), else ``path_prefix`` + a deterministic
  (batch, partition, row) suffix — replays overwrite the same keys,
  making redelivery idempotent rather than duplicating.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.s3_proto import S3Client
from benthos_spark.sources.readers import Source

S3_SCHEMA = "key string, value binary, size long"


def _client(opts: dict) -> S3Client:
    return S3Client(endpoint=opts["endpoint"],
                    access_key=opts.get("access_key", "test"),
                    secret_key=opts.get("secret_key", "test"),
                    region=opts.get("region", "us-east-1"))


def _fetch_keys(opts: dict, bucket: str, keys: list[str],
                codec: str) -> Iterator[tuple]:
    client = _client(opts)
    for key in keys:
        data = client.get_object(bucket, key)
        if codec == "lines":
            for line in data.split(b"\n"):
                if line:
                    yield (key, line, len(line))
        else:
            yield (key, data, len(data))


def register_s3_source(spark: SparkSession) -> None:
    """Register the `benthos_s3` Python data source (idempotent).
    Streaming offset: {"after": <largest consumed key>}."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        DataSourceStreamReader, InputPartition)
    from pyspark.sql.types import StructType

    class _Part(InputPartition):
        def __init__(self, opts, bucket, keys, codec):
            self.opts, self.bucket, self.keys, self.codec = opts, bucket, keys, codec

    def _binpack(objs: list[dict], max_bytes: int) -> list[list[str]]:
        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        for o in objs:
            if cur and cur_bytes + o["size"] > max_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(o["key"])
            cur_bytes += o["size"]
        if cur:
            groups.append(cur)
        return groups

    class _BatchReader(DataSourceReader):
        def __init__(self, options):
            self.opts = dict(options)

        def partitions(self):
            objs = _client(self.opts).list_objects(
                self.opts["bucket"], prefix=self.opts.get("prefix", ""))
            mpb = int(self.opts.get("max_partition_bytes", 32 << 20))
            return [_Part(self.opts, self.opts["bucket"], g,
                          self.opts.get("codec", "all-bytes"))
                    for g in _binpack(objs, mpb)]

        def read(self, part):
            yield from _fetch_keys(part.opts, part.bucket, part.keys, part.codec)

    class _StreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.opts = dict(options)

        def initialOffset(self):
            return {"after": ""}

        def latestOffset(self):
            objs = _client(self.opts).list_objects(
                self.opts["bucket"], prefix=self.opts.get("prefix", ""))
            keys = [o["key"] for o in objs]
            return {"after": max(keys) if keys else ""}

        def partitions(self, start, end):
            if end["after"] <= start["after"]:
                return []
            objs = _client(self.opts).list_objects(
                self.opts["bucket"], prefix=self.opts.get("prefix", ""),
                start_after=start["after"])
            keys = sorted(o["key"] for o in objs if o["key"] <= end["after"])
            if not keys:
                return []
            mpb = int(self.opts.get("max_partition_bytes", 32 << 20))
            sizes = {o["key"]: o["size"] for o in objs}
            return [_Part(self.opts, self.opts["bucket"], g,
                          self.opts.get("codec", "all-bytes"))
                    for g in _binpack([{"key": k, "size": sizes[k]} for k in keys], mpb)]

        def read(self, part):
            yield from _fetch_keys(part.opts, part.bucket, part.keys, part.codec)

        def commit(self, end):
            pass

    class _S3DataSource(DataSource):
        @classmethod
        def name(cls):
            return "benthos_s3"

        def schema(self):
            return S3_SCHEMA

        def reader(self, schema: StructType):
            return _BatchReader(self.options)

        def streamReader(self, schema: StructType):
            return _StreamReader(self.options)

    try:
        spark.dataSource.register(_S3DataSource)
    except Exception as e:
        if "already" not in str(e).lower():
            raise


@dataclass
class S3Source(Source):
    """`aws_s3` input: rows = (key, value, size). ``codec``:
    all-bytes (one row per object) | lines."""

    endpoint: str = ""
    bucket: str = ""
    prefix: str = ""
    codec: str = "all-bytes"
    access_key: str = "test"
    secret_key: str = "test"
    region: str = "us-east-1"
    streaming: bool = False
    max_partition_bytes: int = 32 << 20

    def read(self, spark: SparkSession) -> DataFrame:
        if self.codec not in ("all-bytes", "lines"):
            raise ValueError(f"aws_s3 codec {self.codec!r} (want all-bytes|lines)")
        register_s3_source(spark)
        reader = spark.readStream if self.streaming else spark.read
        return (reader.format("benthos_s3")
                .option("endpoint", self.endpoint)
                .option("bucket", self.bucket)
                .option("prefix", self.prefix)
                .option("codec", self.codec)
                .option("access_key", self.access_key)
                .option("secret_key", self.secret_key)
                .option("region", self.region)
                .option("max_partition_bytes", str(self.max_partition_bytes))
                .load())


class S3Sink:
    """`aws_s3` output: PUT each row as one object."""

    def __init__(self, endpoint: str, bucket: str, col: str = "value",
                 path_col: Optional[str] = None, path_prefix: str = "out/",
                 content_type: str = "application/octet-stream",
                 access_key: str = "test", secret_key: str = "test",
                 region: str = "us-east-1"):
        self.endpoint, self.bucket, self.col = endpoint, bucket, col
        self.path_col, self.path_prefix = path_col, path_prefix
        self.content_type = content_type
        self.access_key, self.secret_key, self.region = access_key, secret_key, region

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        opts = {"endpoint": self.endpoint, "access_key": self.access_key,
                "secret_key": self.secret_key, "region": self.region}
        bucket, col, path_col = self.bucket, self.col, self.path_col
        prefix, ctype = self.path_prefix, self.content_type
        cols = [col] + ([path_col] if path_col else [])

        def write_partition(rows):
            from pyspark import TaskContext

            client = _client(opts)
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else 0
            for i, row in enumerate(rows):
                v = row[col]
                data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                key = row[path_col] if path_col else f"{prefix}{batch_id:012d}-{pid:05d}-{i:08d}"
                client.put_object(bucket, key, data, content_type=ctype)

        df.select(*cols).foreachPartition(write_partition)
