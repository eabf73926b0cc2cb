"""`azure_blob_storage` input/output (internal/impl/azure/
input_blob_storage.go, output_blob_storage.go) over the from-scratch
SharedKey REST stack in benthos_spark/functions/azure_proto.py.

Same Spark shape as the aws_s3 connector (operators/s3.py): the input
lists blob names on the driver (metadata-scale) and GETs blob contents
from executors, bin-packed by size; the output PUTs one blob per
message with deterministic replay-idempotent names (or a per-row
``path_col``). For streaming ingestion over a monotonic naming scheme,
the s3 source's key-watermark pattern applies identically — this input
is the batch walk, which is also what the reference's container mode
does."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.azure_proto import AzureBlobClient
from benthos_spark.sources.readers import Source


@dataclass
class AzureBlobSource(Source):
    endpoint: str = ""
    container: str = ""
    prefix: str = ""
    codec: str = "all-bytes"  # all-bytes | lines
    account: str = "devstoreaccount1"
    key_b64: str = ""
    max_partition_bytes: int = 32 << 20
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        if self.codec not in ("all-bytes", "lines"):
            raise ValueError(f"azure_blob_storage codec {self.codec!r}")
        if self.streaming:
            raise ValueError(
                "azure_blob_storage input is a batch container walk; for "
                "streaming ingestion use a monotonic naming scheme with the "
                "aws_s3-style key-watermark source pattern")
        kwargs = {"endpoint": self.endpoint, "account": self.account}
        if self.key_b64:
            kwargs["key_b64"] = self.key_b64
        client = AzureBlobClient(**kwargs)
        blobs = client.list_blobs(self.container, prefix=self.prefix)
        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        for b in blobs:
            if cur and cur_bytes + b["size"] > self.max_partition_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(b["name"])
            cur_bytes += b["size"]
        if cur:
            groups.append(cur)
        container, codec = self.container, self.codec

        def fetch(names: list[str]) -> Iterator[tuple]:
            c = AzureBlobClient(**kwargs)
            for name in names:
                data = c.get_blob(container, name)
                if codec == "lines":
                    for line in data.split(b"\n"):
                        if line:
                            yield (name, line, len(line))
                else:
                    yield (name, data, len(data))

        if not groups:
            return spark.createDataFrame([], "name string, value binary, size long")
        rdd = spark.sparkContext.parallelize(groups, len(groups)).flatMap(fetch)
        return spark.createDataFrame(rdd, "name string, value binary, size long")


class AzureBlobSink:
    def __init__(self, endpoint: str, container: str, col: str = "value",
                 path_col: Optional[str] = None, path_prefix: str = "out/",
                 account: str = "devstoreaccount1", key_b64: str = ""):
        self.endpoint, self.container, self.col = endpoint, container, col
        self.path_col, self.path_prefix = path_col, path_prefix
        self.account, self.key_b64 = account, key_b64

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        kwargs = {"endpoint": self.endpoint, "account": self.account}
        if self.key_b64:
            kwargs["key_b64"] = self.key_b64
        container, col, path_col, prefix = (self.container, self.col,
                                            self.path_col, self.path_prefix)
        cols = [col] + ([path_col] if path_col else [])

        def write_partition(rows):
            from pyspark import TaskContext

            client = AzureBlobClient(**kwargs)
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else 0
            for i, row in enumerate(rows):
                v = row[col]
                data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                name = row[path_col] if path_col else f"{prefix}{batch_id:012d}-{pid:05d}-{i:08d}"
                client.put_blob(container, name, data)

        df.select(*cols).foreachPartition(write_partition)
