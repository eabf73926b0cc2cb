"""Iceberg Python DataSource: batch scan + incremental Structured
Streaming over the from-scratch tables.

The streaming offset is the table's **sequence number** (monotonic,
assigned at commit, stable under snapshot expiry — unlike snapshot-log
indices): a micro-batch covers the data files added by snapshots with
``start_seq < sequence-number <= end_seq``. Spark checkpoints these
offsets, so a restarted query resumes exactly where it stopped — the
Iceberg analogue of a Kafka consumer offset, and the input half of the
north rule's "Structured Streaming over an Iceberg table".

Reads are Arrow-native: each InputPartition is a size-bin-packed GROUP
of data files (option ``max_partition_bytes``, default 4 MiB — merges
only pathologically small files so scan parallelism is unaffected),
read in the Python worker via pyarrow with identity-partition values
re-attached as constant columns, yielded as RecordBatches (no per-row
Python).

Usage::

    from benthos_spark.iceberg.source import IcebergDataSource
    spark.dataSource.register(IcebergDataSource)
    df = (spark.readStream.format("benthos_iceberg")
          .option("path", "/path/to/table").load())

Reference semantics: the fork's streamed inputs ack batches and resume
from stored offsets (/root/reference/internal/impl/postgres_cdc/
input.go:184 keeps the LSN the same way).

Known engine limitation: with ``Trigger.AvailableNow`` Spark does not
schedule the final NO-DATA micro-batch for Python data sources, so
watermarked window aggregations downstream won't flush in a
trigger-once run. Re-running on the same checkpoint does NOT help: the
advanced watermark is only persisted in the NEXT batch's offset entry,
which a trigger-once run never writes. Use
``Pipeline.run_once(..., drain=True)`` (streaming/pipeline.py) — one
processing-time-trigger run that auto-stops after the no-data flush
batch executes — or drive the stream with a processing-time trigger
yourself. Pass-through pipelines are unaffected.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from benthos_spark.iceberg.table import IcebergTable


@dataclass
class IcebergFilePartition(InputPartition):
    # One Spark task reads a GROUP of data files (bin-packed by size up
    # to max_partition_bytes) so the per-file Python-worker constant —
    # the python-source's main overhead vs the JVM reader — amortizes
    # across small files. files: tuple of (file_path, partition_values).
    files: tuple = ()
    schema_json: str = ""  # Spark schema JSON (workers rebuild arrow schema)


def _read_file_as_arrow(part: IcebergFilePartition) -> Iterator[Any]:
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType as _St

    spark_schema = _St.fromJson(json.loads(part.schema_json))
    target = to_arrow_schema(spark_schema)
    for file_path, partition_values in part.files:
        table = pq.read_table(file_path)
        same_shape = (
            not partition_values
            and table.schema.names == target.names
            and all(
                table.schema.field(i).type == target.field(i).type
                for i in range(len(target))
            )
        )
        if same_shape:
            # fast path: names and types already match (metadata/
            # nullability differences don't matter to Spark) — hand the
            # batches over without any copy/cast
            yield from table.to_batches()
            continue
        n = table.num_rows
        cols = []
        for fld in target:
            if fld.name in table.column_names:
                c = table.column(fld.name)
                cols.append(c if c.type == fld.type else c.cast(fld.type))
            elif fld.name in partition_values:
                v = partition_values[fld.name]
                cols.append(pa.array([v] * n).cast(fld.type))
            else:
                cols.append(pa.nulls(n, fld.type))
        out = pa.table(dict(zip([f.name for f in target], cols)), schema=target)
        yield from out.to_batches()


def _decode_partition(data_file: dict, tbl: IcebergTable) -> dict:
    """Manifest partition record → python values keyed by column name
    (dates arrive as epoch-day ints; Spark casts them on read)."""
    import datetime

    out = {}
    src_types = {
        f["name"]: f["type"] for f in tbl.schema_json["fields"] if isinstance(f["type"], str)
    }
    for k, v in (data_file.get("partition") or {}).items():
        if v is not None and src_types.get(k) == "date":
            v = datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        out[k] = v
    return out


# default bin-pack target: merges only PATHOLOGICALLY small files (a
# long stream of tiny per-micro-batch commits) while ordinary multi-MB
# data files keep one task each — scan parallelism is unaffected
DEFAULT_MAX_PARTITION_BYTES = 4 << 20


def _partitions_for_files(
    tbl: IcebergTable,
    files: list[dict],
    max_partition_bytes: int = DEFAULT_MAX_PARTITION_BYTES,
) -> list[IcebergFilePartition]:
    import json

    schema_json = json.dumps(tbl.spark_schema.jsonValue())
    parts: list[IcebergFilePartition] = []
    cur: list[tuple] = []
    cur_bytes = 0
    for f in files:
        sz = f.get("file_size_in_bytes") or 0
        if cur and max_partition_bytes > 0 and cur_bytes + sz > max_partition_bytes:
            parts.append(IcebergFilePartition(files=tuple(cur), schema_json=schema_json))
            cur, cur_bytes = [], 0
        cur.append((f["file_path"], _decode_partition(f, tbl)))
        cur_bytes += sz
        if max_partition_bytes <= 0:
            parts.append(IcebergFilePartition(files=tuple(cur), schema_json=schema_json))
            cur, cur_bytes = [], 0
    if cur:
        parts.append(IcebergFilePartition(files=tuple(cur), schema_json=schema_json))
    return parts


def _mpb_option(options: dict) -> int:
    v = options.get("max_partition_bytes")
    return int(v) if v is not None else DEFAULT_MAX_PARTITION_BYTES


class IcebergBatchReader(DataSourceReader):
    def __init__(self, path: str, options: dict):
        self.path = path
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        tbl = IcebergTable.load(self.path)
        snapshot_id = self.options.get("snapshot_id")
        as_of_ms = self.options.get("as_of_ms")
        files = tbl.live_files(
            snapshot_id=int(snapshot_id) if snapshot_id else None,
            as_of_ms=int(as_of_ms) if as_of_ms else None,
        )
        return _partitions_for_files(tbl, files, _mpb_option(self.options))

    def read(self, partition: IcebergFilePartition) -> Iterator[Any]:
        return _read_file_as_arrow(partition)


class IcebergStreamReader(DataSourceStreamReader):
    """Offsets are ``{"seq": <last-sequence-number covered>}``."""

    def __init__(self, path: str, options: dict):
        self.path = path
        self.options = options
        self._tbl = IcebergTable.load(path)

    def initialOffset(self) -> dict:
        if self.options.get("starting_offsets", "earliest") == "latest":
            return {"seq": self._tbl.refresh().metadata["last-sequence-number"]}
        return {"seq": 0}

    def latestOffset(self) -> dict:
        return {"seq": self._tbl.refresh().metadata["last-sequence-number"]}

    def _snapshots_in_range(self, start_seq: int, end_seq: int) -> list[dict]:
        tbl = self._tbl.refresh()
        snaps = [
            s
            for s in tbl.metadata["snapshots"]
            if start_seq < s["sequence-number"] <= end_seq
        ]
        covered = {s["sequence-number"] for s in snaps}
        missing = [
            q for q in range(start_seq + 1, end_seq + 1) if q not in covered
        ]
        if missing:
            raise RuntimeError(
                f"iceberg stream gap: sequence numbers {missing} were expired "
                f"before this reader consumed them (like a Kafka retention "
                f"breach) — restart from a fresh checkpoint"
            )
        return sorted(snaps, key=lambda s: s["sequence-number"])

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files: list[dict] = []
        for snap in self._snapshots_in_range(start["seq"], end["seq"]):
            # `replace` snapshots (rewrite_data_files / rewrite_manifests
            # compactions) re-add EXISTING rows under new file paths — no
            # logical change, so a streaming reader must skip them or a
            # compaction would re-deliver every rewritten row (the same
            # rule Iceberg's own streaming read applies to rewrites)
            if snap.get("summary", {}).get("operation") == "replace":
                continue
            files.extend(self._tbl.added_files(snap["snapshot-id"]))
        return _partitions_for_files(self._tbl, files, _mpb_option(self.options))

    def read(self, partition: IcebergFilePartition) -> Iterator[Any]:
        return _read_file_as_arrow(partition)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: snapshots expire via table maintenance


class IcebergDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "benthos_iceberg"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("benthos_iceberg requires .option('path', <table dir>)")
        return path

    def schema(self) -> StructType:
        return IcebergTable.load(self._path()).spark_schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return IcebergBatchReader(self._path(), dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return IcebergStreamReader(self._path(), dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(IcebergDataSource)


# free the name for Source-style config wiring
class IcebergSource:
    """Config-level source (sources/readers.py style): batch reads go
    JVM-native through :meth:`IcebergTable.scan` (full codegen parquet
    scan with partition pruning); streaming reads go through the
    registered Python data source (incremental by snapshot)."""

    def __init__(
        self,
        path: str,
        streaming: bool = False,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        starting_offsets: str = "earliest",
        where: str | None = None,
    ):
        """``where`` (batch only): pushed into metadata-level file
        skipping via :meth:`IcebergTable.scan` — files whose bounds
        cannot match never reach Spark."""
        self.path = path
        self.streaming = streaming
        self.snapshot_id = snapshot_id
        self.as_of_ms = as_of_ms
        self.starting_offsets = starting_offsets
        self.where = where

    def read(self, spark):
        if not self.streaming:
            return IcebergTable.load(self.path).scan(
                spark,
                snapshot_id=self.snapshot_id,
                as_of_ms=self.as_of_ms,
                where=self.where,
            )
        register(spark)
        reader = (
            spark.readStream.format("benthos_iceberg")
            .option("path", self.path)
            .option("starting_offsets", self.starting_offsets)
        )
        return reader.load()
