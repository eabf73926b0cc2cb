"""Source definitions: batch + streaming readers.

Mapping from the reference's inputs (/root/reference/internal/impl/):

- ``generate`` (pure/input_generate.go:29)  → :class:`RateSource` /
  :func:`benthos_spark.datagen.clips.generate_clips`
- ``file`` + codec scanners (io/input_file.go:95; codec/reader.go:193-311)
  → :class:`FileSource` with codec chain (lines/csv/json/gzip/tar)
- ``parquet`` (parquet/input_parquet.go:42) → :class:`ParquetSource`
- ``broker`` fan-in (pure/input_broker.go:21) → :func:`fan_in`
- ``batched`` re-batching (pure/input_batched.go:21) → trigger options
  (``maxFilesPerTrigger``) — batching is admission control in Spark.
"""

from __future__ import annotations

import gzip
import io
import tarfile
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class Source:
    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    streaming: bool = False


@dataclass
class ParquetSource(Source):
    path: str
    streaming: bool = False
    schema: object | None = None  # required for streaming reads
    max_files_per_trigger: int | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            return spark.read.parquet(self.path)
        reader = spark.readStream
        if self.schema is None:
            # infer once from a batch read (file sources need a schema)
            self.schema = spark.read.parquet(self.path).schema
        reader = reader.schema(self.schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.parquet(self.path)


@dataclass
class CsvSource(Source):
    path: str
    header: bool = True
    schema: object | None = None
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream if self.streaming else spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.option("header", self.header).csv(self.path)


@dataclass
class RateSource(Source):
    """≙ `generate` with an interval: monotonically increasing (timestamp,
    value) rows at `rows_per_second`."""

    rows_per_second: int = 1000
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rows_per_second)
            .load()
        )


@dataclass
class MemorySource(Source):
    df: DataFrame
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        return self.df


@dataclass
class FileSource(Source):
    """`file` input with a codec chain (internal/codec/reader.go:193-311;
    chainable like ``gzip/lines``). Text codecs use native readers
    (pushdown-friendly); container codecs (gzip/tar) go through
    ``binaryFile`` + an Arrow-batched unpack — one Python hop per FILE,
    not per row."""

    path: str
    codec: str = "lines"
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        parts = self.codec.split("/")
        if parts == ["lines"]:
            return (spark.readStream if self.streaming else spark.read).text(self.path)
        if parts == ["csv"]:
            return CsvSource(self.path, streaming=self.streaming).read(spark)
        if parts == ["json_array"] or parts == ["json_documents"]:
            reader = spark.readStream if self.streaming else spark.read
            return reader.option("multiLine", parts == ["json_array"]).json(self.path)
        if parts[0] in ("gzip", "tar"):
            binary = spark.read.format("binaryFile").load(self.path)
            inner = parts[1] if len(parts) > 1 else "lines"
            return binary.mapInPandas(_unpack_container(parts[0], inner), schema="path string, line string")
        raise ValueError(f"unsupported codec {self.codec}")


def _unpack_container(container: str, inner: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, lines = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                if container == "gzip":
                    blobs = [(path, gzip.decompress(bytes(content)))]
                else:  # tar
                    blobs = []
                    with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                        for m in tf.getmembers():
                            if m.isfile():
                                blobs.append((f"{path}!{m.name}", tf.extractfile(m).read()))
                for name, blob in blobs:
                    if inner == "lines":
                        for ln in blob.decode("utf-8", errors="replace").splitlines():
                            paths.append(name)
                            lines.append(ln)
                    else:  # whole-blob
                        paths.append(name)
                        lines.append(blob.decode("utf-8", errors="replace"))
            yield pd.DataFrame({"path": paths, "line": lines})

    return fn


@dataclass
class GenerateSource(Source):
    """`generate` input (internal/impl/pure/input_generate.go:29): rows
    synthesized from a mapping at an interval. Spark-first: the rate
    source provides (timestamp, value); ``mapping`` columns derive the
    payload (≙ the Bloblang mapping), all JVM-side. ``count`` bounds the
    stream for tests (enforced by a filter; the query is stopped by the
    caller or `availableNow`)."""

    mapping: dict = field(default_factory=dict)  # name -> Column/SQL str
    rows_per_second: int = 1000
    count: int | None = None
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F

        if self.streaming:
            df = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", self.rows_per_second)
                .load()
            )
        else:
            n = self.count or 1000
            df = spark.range(n).select(
                F.current_timestamp().alias("timestamp"), F.col("id").alias("value")
            )
        if self.count is not None:
            df = df.filter(F.col("value") < self.count)
        cols = [(F.expr(e) if isinstance(e, str) else e).alias(k) for k, e in self.mapping.items()]
        return df.select("timestamp", "value", *cols) if cols else df


@dataclass
class SequenceSource(Source):
    """`sequence` input (internal/impl/pure/input_sequence.go:27): consume
    child sources one after another. Batch: ordered union (a `_seq` column
    records provenance). The sharded-join variant lives in
    operators/state.py (clip_transcript_join)."""

    children: tuple = ()
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F

        dfs = []
        for i, child in enumerate(self.children):
            dfs.append(child.read(spark).withColumn("_seq", F.lit(i)))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out


def read_until(query, predicate, poll_s: float = 0.5, timeout_s: float = 600.0) -> None:
    """`read_until` input (internal/impl/pure/input_read_until.go:27):
    consume until a check is true — in Spark, stop the StreamingQuery when
    ``predicate(progress) -> bool`` holds (e.g. inspect observed metrics
    or sink state). Blocks until stopped or timed out."""
    import time as _t

    deadline = _t.time() + timeout_s
    while _t.time() < deadline and query.isActive:
        if predicate(query.lastProgress):
            query.stop()
            return
        _t.sleep(poll_s)
    if query.isActive:
        query.stop()
        raise TimeoutError("read_until predicate never satisfied")


def fan_in(*dfs: DataFrame) -> DataFrame:
    """`broker` fan-in (internal/impl/pure/input_broker_fan_in.go:1-136):
    merge N sources into one stream."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
