"""`snowflake_put` output (internal/impl/snowflake/
output_snowflake_put.go:387) over the from-scratch keypair-JWT +
Snowpipe client in benthos_spark/functions/snowflake_proto.py.

Per Spark partition from executors: messages are concatenated into
newline-delimited files of ``batch_rows`` (the reference concatenates
each batch into one stage file), compressed per ``compression``
(AUTO/GZIP gzip the file and append ``.gz``; NONE uploads raw —
output_snowflake_put.go's compression map), uploaded to the stage at
``path/<batch>-<partition>-<seq>.json[.gz]`` (deterministic, so
replays overwrite the same stage files — redelivery-idempotent at the
stage), and, when ``snowpipe`` is set, registered with ONE
``insertFiles`` call per file like the reference ("a Snowpipe
insertFiles REST API call will be made for each individual file")."""

from __future__ import annotations

import gzip
from typing import Optional

from pyspark.sql import DataFrame

from benthos_spark.functions import pki
from benthos_spark.functions.snowflake_proto import SnowflakeClient

_COMPRESSIONS = ("AUTO", "GZIP", "NONE")


class SnowflakePutSink:
    def __init__(self, endpoint: str, account: str, user: str,
                 private_key: Optional[pki.RsaPrivate] = None,
                 private_key_pem: Optional[str] = None,
                 stage: str = "@%BENTHOS_TBL", path: str = "out",
                 snowpipe: Optional[str] = None,
                 compression: str = "AUTO", batch_rows: int = 1000,
                 col: str = "value"):
        if compression not in _COMPRESSIONS:
            raise ValueError(f"unknown compression {compression!r} "
                             f"(want one of {_COMPRESSIONS})")
        if private_key is None:
            if not private_key_pem:
                raise ValueError("snowflake_put needs private_key or "
                                 "private_key_pem (keypair JWT auth)")
            key = pki.load_private_key(private_key_pem)
            if not isinstance(key, pki.RsaPrivate):
                raise ValueError("snowflake keypair auth needs an RSA key")
            private_key = key
        self.endpoint, self.account, self.user = endpoint, account, user
        self.private_key = private_key
        self.stage, self.path = stage, path.strip("/")
        self.snowpipe, self.compression = snowpipe, compression
        self.batch_rows, self.col = batch_rows, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        endpoint, account, user = self.endpoint, self.account, self.user
        key, stage, path = self.private_key, self.stage, self.path
        snowpipe, compression = self.snowpipe, self.compression
        batch_rows, col = self.batch_rows, self.col
        gz = compression in ("AUTO", "GZIP")

        def write_partition(pid: int, rows):
            client = SnowflakeClient(endpoint, account, user, key)
            buf: list[bytes] = []
            seq = 0

            def flush():
                nonlocal seq
                if not buf:
                    return
                data = b"\n".join(buf)
                name = f"{path}/{batch_id:08d}-{pid:05d}-{seq:06d}.json"
                if gz:
                    data = gzip.compress(data, mtime=0)  # deterministic
                    name += ".gz"
                client.put_stage_file(stage, name, data)
                if snowpipe:
                    client.insert_files(snowpipe, [name],
                                        request_id=f"{batch_id}-{pid}-{seq}")
                buf.clear()
                seq += 1

            for row in rows:
                v = row[col]
                buf.append(bytes(v) if isinstance(v, (bytes, bytearray))
                           else str(v).encode())
                if len(buf) >= batch_rows:
                    flush()
            flush()
            return iter(())

        df.select(col).rdd.mapPartitionsWithIndex(write_partition).count()
