"""`hdfs` input/output (internal/impl/hdfs/input.go:49, output.go:48)
over the WebHDFS REST client in benthos_spark/functions/webhdfs.py
(transport substitution documented there).

Spark shape — the aws_s3 / gcp_cloud_storage pattern:

- **input**: "Reads files from a HDFS directory, where each discrete
  file will be consumed as a single message payload" (input.go:22) —
  the driver LISTSTATUSes the directory (metadata-scale), executors
  OPEN one Spark partition per bin-packed file group. ``hosts`` is the
  NameNode failover list, tried in order like the reference's.
- **output**: "Sends message parts as files" — one CREATE per message
  from executors via the two-step NameNode→DataNode redirect;
  ``path_col`` carries the per-row filename (the `path` interpolation
  analog), else a deterministic (batch, partition, row) name under
  ``directory`` so replays overwrite the same files
  (redelivery-idempotent)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.webhdfs import WebHdfsClient
from benthos_spark.sources.readers import Source

HDFS_SCHEMA = "key string, value binary, size long"


@dataclass
class HdfsSource(Source):
    hosts: Sequence[str] = ()
    user: str = "hadoop"
    directory: str = ""
    max_partition_bytes: int = 128 * 1024 * 1024
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        client = WebHdfsClient(list(self.hosts), self.user)
        entries = [e for e in client.list_status(self.directory)
                   if e["type"] == "FILE"]
        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        base = self.directory.rstrip("/")
        for e in entries:
            if cur and cur_bytes + e["length"] > self.max_partition_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(f"{base}/{e['pathSuffix']}")
            cur_bytes += e["length"]
        if cur:
            groups.append(cur)
        hosts, user = list(self.hosts), self.user

        def fetch(paths: list[str]) -> Iterator[tuple]:
            c = WebHdfsClient(hosts, user)
            for p in paths:
                data = c.open(p)
                yield (p, data, len(data))

        if not groups:
            return spark.createDataFrame([], HDFS_SCHEMA)
        rdd = spark.sparkContext.parallelize(groups, len(groups))
        return spark.createDataFrame(rdd.flatMap(fetch), HDFS_SCHEMA)


class HdfsSink:
    def __init__(self, hosts: Sequence[str], directory: str,
                 col: str = "value", path_col: Optional[str] = None,
                 user: str = "hadoop"):
        self.hosts, self.directory = list(hosts), directory.rstrip("/")
        self.col, self.path_col, self.user = col, path_col, user

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        hosts, directory, user = self.hosts, self.directory, self.user
        col, path_col = self.col, self.path_col
        cols = [col] + ([path_col] if path_col else [])

        def write_partition(pid: int, rows):
            client = WebHdfsClient(hosts, user)
            client.mkdirs(directory)
            for i, row in enumerate(rows):
                v = row[col]
                data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                name = (str(row[path_col]) if path_col
                        else f"{batch_id:08d}-{pid:05d}-{i:08d}.dat")
                client.create(f"{directory}/{name}", data)
            return iter(())

        df.select(*cols).rdd.mapPartitionsWithIndex(write_partition).count()
