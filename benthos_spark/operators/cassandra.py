"""`cassandra` input/output (internal/impl/cassandra/input.go:17,
output.go:44) over the from-scratch CQL v4 wire codec in
functions/cql_proto.py.

- :class:`CassandraSource` — "Executes a find query and creates a
  message for each row received" (input.go:17): the query runs on ONE
  connection (a CQL result stream is a single-session cursor, exactly
  like the reference's gocql iterator), and the rows parallelize into a
  DataFrame. Control-plane-scale by contract — a data-plane-scale
  Cassandra read belongs to a token-range-partitioned scan, which the
  docstring of the config block points at.

- :class:`CassandraSink` — "Runs a query against a Cassandra database
  for each message in order to insert data" (output.go:45): per Spark
  partition one connection; ``args_mapping`` is a Bloblang query
  producing the positional-values array per message (output.go:109-111),
  resolved with the interpreter exactly like the reference resolves it
  with its Bloblang executor per message. Executor-side, no driver
  fan-in; at-least-once on retry (idempotent when the query upserts by
  primary key — Cassandra INSERT semantics make replays natural).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CassandraSource:
    """One-shot batch input: SELECT rows -> DataFrame."""

    addresses: list[str]
    query: str
    streaming: bool = False

    def __post_init__(self):
        if self.streaming:
            raise ValueError("cassandra input is a one-shot query (batch); "
                             "stream CDC belongs to a changelog source")
        if not self.addresses:
            raise ValueError("cassandra input needs addresses")

    def read(self, spark: SparkSession) -> DataFrame:
        from benthos_spark.functions.cql_proto import CqlConnection

        conn = CqlConnection(self.addresses[0])
        try:
            rows = conn.execute(self.query)
        finally:
            conn.close()
        if not rows:
            return spark.createDataFrame([], "value string")
        # one message per row, the row object as the JSON document
        # (input.go's row -> structured message mapping)
        payload = [(json.dumps(r, sort_keys=True, default=_json_default),) for r in rows]
        return spark.createDataFrame(payload, "value string")


def _json_default(v):
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", "replace")
    return str(v)


@dataclass
class CassandraSink:
    """Per-message CQL execution with Bloblang args (output.go:108-111)."""

    addresses: list[str]
    query: str
    args_mapping: Optional[str] = None
    col: str = "value"
    max_retries: int = 3

    def __post_init__(self):
        if not self.addresses:
            raise ValueError("cassandra output needs addresses")
        if not self.query:
            raise ValueError("cassandra output needs a query")

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        addresses = self.addresses
        query = self.query
        args_src = self.args_mapping
        col = self.col
        retries = self.max_retries

        def write_partition(rows):
            import time

            from benthos_spark.bloblang.interp import BloblangError, Executor
            from benthos_spark.functions.cql_proto import CqlConnection

            rows = list(rows)
            if not rows:
                return
            args_exec = Executor(f"root = {args_src}") if args_src else None
            conn = CqlConnection(addresses[0])
            try:
                for row in rows:
                    raw = row[col]
                    content = raw if isinstance(raw, bytes) else str(raw).encode()
                    try:
                        doc = json.loads(content)
                    except Exception:
                        doc = content.decode("utf-8", "replace")
                    values = None
                    if args_exec is not None:
                        mapped = args_exec.map_part(doc)[0]
                        if not isinstance(mapped, list):
                            raise BloblangError(
                                f"args_mapping must return an array, got "
                                f"{type(mapped).__name__}")
                        values = mapped
                    last = None
                    for attempt in range(retries + 1):
                        try:
                            conn.execute(query, values)
                            last = None
                            break
                        except OSError as e:  # transient transport errors
                            last = e
                            time.sleep(min(0.2 * (2 ** attempt), 2.0))
                            conn.close()
                            conn = CqlConnection(addresses[0])
                    if last is not None:
                        raise last
            finally:
                conn.close()

        df.select(col).foreachPartition(write_partition)
