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
import json
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
class BatchPolicy:
    """The reference's batch policy (count / byte_size / period — the
    re-batching knobs of `batched` and per-output batching,
    internal/impl/pure/input_batched.go:21, service batch policy).

    Spark-first mapping: the micro-batch IS the batch, so
    - ``period``    → micro-batch trigger interval (processingTime)
    - ``count``     → physical partition sizing: ~count rows per task
    - ``byte_size`` → ~byte_size payload bytes per task (needs size_col)
    A Bloblang ``check`` flush condition has no micro-batch equivalent
    (flushing is time/size-driven in Spark) and is rejected at compile
    time rather than silently ignored."""

    count: int | None = None
    byte_size: int | None = None
    period: str | None = None
    size_col: str | None = None

    def processor(self):
        from benthos_spark.operators.processors import Split

        if self.count is not None:
            return Split(count=self.count)
        if self.byte_size is not None:
            return Split(byte_size=self.byte_size, size_col=self.size_col)
        return None

    def start_kwargs(self) -> dict:
        return {"processing_time": self.period} if self.period else {}


@dataclass
class BatchedSource(Source):
    """`batched` input (input_batched.go:21): wrap a child input and
    re-batch by policy. The child's stream is unchanged; the policy
    contributes a re-partitioning stage and/or a trigger interval."""

    child: Source
    policy: BatchPolicy

    @property
    def streaming(self) -> bool:  # type: ignore[override]
        return self.child.streaming

    def read(self, spark: SparkSession) -> DataFrame:
        return self.child.read(spark)


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
        # native fast paths: pushdown-friendly JVM readers
        if parts == ["lines"]:
            return (spark.readStream if self.streaming else spark.read).text(self.path)
        if parts == ["csv"]:
            return CsvSource(self.path, streaming=self.streaming).read(spark)
        if parts == ["json_array"] or parts == ["json_documents"]:
            reader = spark.readStream if self.streaming else spark.read
            return reader.option("multiLine", parts == ["json_array"]).json(self.path)
        # general codec chain: binaryFile scan + ONE Arrow hop per file
        if parts != ["auto"]:
            for p in parts:
                name = p.split(":", 1)[0]
                if name not in _CODECS:
                    raise ValueError(
                        f"unsupported codec {p!r} in chain {self.codec!r}; known: "
                        f"auto, {sorted(_CODECS)}"
                    )
        binary = spark.read.format("binaryFile").load(self.path)
        return binary.mapInPandas(_unpack_chain(parts), schema="path string, line string")


# -- codec chain (internal/codec/reader.go:193-311) --------------------------
#
# Each codec maps [(name, blob)] -> [(name, blob)]; terminal scanners
# (lines/csv/chunker/delim/regex/all-bytes) emit one part per message.
# Chains compose left to right like the reference's `gzip/delim:\t`.


def _codec_gzip(parts, arg):
    return [(n, gzip.decompress(b)) for n, b in parts]


def _codec_tar(parts, arg):
    out = []
    for n, b in parts:
        with tarfile.open(fileobj=io.BytesIO(b)) as tf:
            for m in tf.getmembers():
                if m.isfile():
                    out.append((f"{n}!{m.name}", tf.extractfile(m).read()))
    return out


def _codec_skipbom(parts, arg):
    # reader.go skipbom: strip a UTF-8/16 BOM prefix, pass through
    out = []
    for n, b in parts:
        for bom in (b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff"):
            if b.startswith(bom):
                b = b[len(bom):]
                break
        out.append((n, b))
    return out


def _codec_lines(parts, arg):
    return [(n, ln.encode()) for n, b in parts for ln in b.decode("utf-8", "replace").splitlines()]


def _codec_all_bytes(parts, arg):
    return parts


def _codec_chunker(parts, arg):
    size = int(arg)
    return [(n, b[i : i + size]) for n, b in parts for i in range(0, len(b), size)]


def _codec_delim(parts, arg):
    delim = arg.encode().decode("unicode_escape").encode()
    out = []
    for n, b in parts:
        for piece in b.split(delim):
            if piece:
                out.append((n, piece))
    return out


def _codec_regex(parts, arg):
    # reader.go regex codec: split the document at lines matching the
    # pattern (each match starts a new message)
    import re as _re

    pat = _re.compile(arg.encode())
    out = []
    for n, b in parts:
        last = 0
        for m in pat.finditer(b):
            if m.start() > last:
                out.append((n, b[last : m.start()]))
            last = m.start()
        if last < len(b):
            out.append((n, b[last:]))
    return out


def _codec_csv(parts, arg):
    import csv as _csv

    delim = arg if arg else ","
    out = []
    for n, b in parts:
        rows = list(_csv.reader(io.StringIO(b.decode("utf-8", "replace")), delimiter=delim))
        if not rows:
            continue
        header = rows[0]
        for r in rows[1:]:
            out.append((n, json.dumps(dict(zip(header, r))).encode()))
    return out


def _codec_avro_ocf(parts, arg):
    # one JSON message per OCF record (reader.go avro-ocf scanner);
    # pure-python decoder, see functions/avro_ocf.py
    from benthos_spark.functions.avro_ocf import read_ocf

    out = []
    for n, b in parts:
        _, records = read_ocf(b)
        for r in records:
            out.append((n, json.dumps(r, default=lambda v: v.hex() if isinstance(v, bytes) else str(v)).encode()))
    return out


_CODECS = {
    "avro-ocf": _codec_avro_ocf,
    "gzip": _codec_gzip,
    "tar": _codec_tar,
    "skipbom": _codec_skipbom,
    "lines": _codec_lines,
    "all-bytes": _codec_all_bytes,
    "chunker": _codec_chunker,
    "delim": _codec_delim,
    "regex": _codec_regex,
    "csv": _codec_csv,
}

_TERMINAL = {"lines", "all-bytes", "chunker", "delim", "regex", "csv", "avro-ocf"}


def resolve_auto_codec(path: str) -> list[str]:
    """Extension-based codec auto-detect (reader.go:344-366)."""
    chain: list[str] = []
    p = path.lower()
    if p.endswith((".tar.gz", ".tgz")):
        return ["gzip", "tar", "all-bytes"]
    if p.endswith(".gz"):
        chain.append("gzip")
        p = p[: -len(".gz")]
    if p.endswith(".tar"):
        chain.append("tar")
        chain.append("all-bytes")
        return chain
    if p.endswith(".csv"):
        chain.append("csv")
    else:
        chain.append("lines")
    return chain


def _unpack_chain(chain: list[str]):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, lines = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                steps = resolve_auto_codec(path) if chain == ["auto"] else list(chain)
                if steps[-1].split(":", 1)[0] not in _TERMINAL:
                    steps.append("lines")
                parts = [(path, bytes(content))]
                for step in steps:
                    name, _, arg = step.partition(":")
                    parts = _CODECS[name](parts, arg)
                for n, b in parts:
                    paths.append(n)
                    lines.append(b.decode("utf-8", errors="replace"))
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


# -- dynamic component registry ---------------------------------------------
# `dynamic` input/output (internal/impl/io/input_dynamic.go:19,
# output_dynamic.go:22): labelled children created/changed/removed at
# runtime. The reference mutates them via REST endpoints; here the
# registry is the in-process API (the endpoints are network plumbing this
# engine declares out of scope). Semantics mapping:
# - dynamic INPUT: the labelled set is resolved when the pipeline's
#   lineage is built — add/remove take effect on (re)start, exactly like
#   a config reload; a running Spark query's source set is immutable.
# - dynamic OUTPUT: the sink re-resolves the registry EVERY micro-batch,
#   so output swaps take effect at the next batch boundary (closer to
#   the reference's live mutation, because foreachBatch is re-entered).


class DynamicSet:
    """A labelled, mutable set of child components."""

    def __init__(self, **children):
        self._children: dict[str, object] = dict(children)

    def set(self, label: str, child) -> None:
        self._children[label] = child

    def remove(self, label: str) -> None:
        self._children.pop(label, None)

    def labels(self) -> list[str]:
        return sorted(self._children)

    def get(self, label: str):
        return self._children[label]

    def items(self):
        return sorted(self._children.items())


@dataclass
class DynamicSource(Source):
    """`dynamic` input: fan-in over the registry's current members,
    resolved at read time (≙ restart-time reload)."""

    registry: DynamicSet
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        children = [c for _, c in self.registry.items()]
        if not children:
            raise ValueError("dynamic input: no children registered")
        return fan_in(*[c.read(spark) for c in children])


@dataclass
class StdinSource(Source):
    """`stdin` input (internal/impl/io/input_stdin.go:26): consume the
    process's stdin as newline-delimited messages. Bounded driver-side
    read (stdin belongs to the driver process by definition); the codec
    chain is the FileSource's (`lines` only here — pipe binary payloads
    through `file` + codecs instead)."""

    codec: str = "lines"
    max_buffer: int = 65536
    streaming: bool = False

    def __post_init__(self):
        if self.codec != "lines":
            raise ValueError(f"stdin codec {self.codec!r} not recognised (want 'lines')")

    def read(self, spark: SparkSession) -> DataFrame:
        import sys

        lines = [
            (ln[: self.max_buffer],)
            for ln in sys.stdin.read().split("\n")
            if ln
        ]
        return spark.createDataFrame(lines or [(None,)], "value string").filter(
            "value is not null"
        )


@dataclass
class SocketSource(Source):
    """`socket` input (internal/impl/io/input_socket.go:26): connect to
    a TCP server and consume newline-delimited messages. Streaming mode
    maps onto Spark's native `socket` source (the same connect-and-read
    client contract, distributed checkpointing included); batch mode
    reads the connection to EOF on the driver. `unix` networks aren't
    reachable from executors — TCP only."""

    address: str = ""
    network: str = "tcp"
    max_buffer: int = 65536
    streaming: bool = True

    def __post_init__(self):
        if self.network != "tcp":
            raise ValueError(
                f"socket network {self.network!r} not supported (tcp only: Spark "
                "executors can't share a unix socket fd)"
            )
        if ":" not in self.address:
            raise ValueError("socket address must be host:port")

    def read(self, spark: SparkSession) -> DataFrame:
        host, port = self.address.rsplit(":", 1)
        if self.streaming:
            return (
                spark.readStream.format("socket")
                .option("host", host)
                .option("port", int(port))
                .load()
            )
        import socket as _socket

        buf = b""
        with _socket.create_connection((host, int(port)), timeout=30) as s:
            while True:
                chunk = s.recv(65536)
                if not chunk:
                    break
                buf += chunk
        lines = [
            (ln[: self.max_buffer],)
            for ln in buf.decode("utf-8", "replace").split("\n")
            if ln
        ]
        return spark.createDataFrame(lines or [(None,)], "value string").filter(
            "value is not null"
        )
