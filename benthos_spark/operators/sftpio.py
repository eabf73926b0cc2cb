"""`sftp` input/output (internal/impl/sftp/input.go, output.go) over
the from-scratch SSH-2 + SFTP v3 stack in
benthos_spark/functions/ssh_proto.py.

Spark shape — the object-store pattern:

- **input**: the driver lists each configured path's directory
  (metadata-scale, one SSH connection), executors open their own SSH
  connections and read one Spark partition per bin-packed file group;
  ``delete_on_finish`` removes each file after its partition emits it
  (the reference's same flag, at-least-once).
- **output**: one file per message from executors (the reference
  writes each message to an interpolated remote path); ``path_col``
  carries the per-row path, else a deterministic
  (batch, partition, row) name under ``directory`` so replays
  overwrite the same files (redelivery-idempotent). Credentials are
  the reference's ``credentials.username/password`` block; host-key
  verification happens inside the client (the KEXDH_REPLY signature
  is checked against the presented key blob)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.ssh_proto import SftpClient
from benthos_spark.sources.readers import Source

SFTP_SCHEMA = "key string, value binary, size long"


@dataclass
class SftpSource(Source):
    address: str = ""
    username: str = ""
    password: str = ""
    paths: Sequence[str] = ()
    codec: str = "all-bytes"
    delete_on_finish: bool = False
    max_partition_bytes: int = 128 * 1024 * 1024
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        client = SftpClient(self.address, self.username, self.password)
        try:
            files: list[tuple[str, int]] = []
            for p in self.paths:
                size = client.stat(p)
                if size is not None:
                    files.append((p, size))
                    continue
                base = p.rstrip("/")
                for e in client.listdir(base):
                    files.append((f"{base}/{e['name']}", e["size"]))
        finally:
            client.close()
        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        for path, size in files:
            if cur and cur_bytes + size > self.max_partition_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(path)
            cur_bytes += size
        if cur:
            groups.append(cur)
        address, user, pw = self.address, self.username, self.password
        codec, delete = self.codec, self.delete_on_finish

        def fetch(paths: list[str]) -> Iterator[tuple]:
            c = SftpClient(address, user, pw)
            try:
                for path in paths:
                    data = c.read_file(path)
                    if codec == "lines":
                        for line in data.split(b"\n"):
                            if line:
                                yield (path, line, len(line))
                    else:
                        yield (path, data, len(data))
                    if delete:
                        c.remove(path)
            finally:
                c.close()

        if not groups:
            return spark.createDataFrame([], SFTP_SCHEMA)
        rdd = spark.sparkContext.parallelize(groups, len(groups))
        return spark.createDataFrame(rdd.flatMap(fetch), SFTP_SCHEMA)


class SftpSink:
    def __init__(self, address: str, username: str, password: str,
                 directory: str, col: str = "value",
                 path_col: Optional[str] = None):
        self.address, self.username, self.password = address, username, password
        self.directory, self.col, self.path_col = directory.rstrip("/"), col, path_col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        address, user, pw = self.address, self.username, self.password
        directory, col, path_col = self.directory, self.col, self.path_col
        cols = [col] + ([path_col] if path_col else [])

        def write_partition(pid: int, rows):
            client = None
            try:
                for i, row in enumerate(rows):
                    if client is None:
                        client = SftpClient(address, user, pw)
                        client.mkdir(directory)
                    v = row[col]
                    data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    name = (str(row[path_col]) if path_col
                            else f"{batch_id:08d}-{pid:05d}-{i:08d}.dat")
                    client.write_file(f"{directory}/{name}", data)
            finally:
                if client is not None:
                    client.close()
            return iter(())

        df.select(*cols).rdd.mapPartitionsWithIndex(write_partition).count()
