"""Output brokers: fan-out, sequential fan-out, switch, round-robin —
composed INSIDE one ``foreachBatch`` call so the micro-batch has a single
commit point.

Reference semantics (/root/reference/internal/impl/pure/):

- ``broker: fan_out`` — copy to all outputs, parent ack only when every
  child acked (output_broker_fan_out.go:95-115). Here: all child sinks
  run inside one foreachBatch; the batch "acks" (offset commit) only if
  none raised — Spark then replays the whole batch, and each idempotent
  child skips what it already committed, preserving exactly-once per
  child.
- ``broker: fan_out_sequential`` (output_broker_fan_out_sequential.go) —
  same, strictly ordered.
- ``switch`` (output_switch.go:42-115) — route rows to the first
  matching case's sink.
- ``broker: round_robin``/``greedy`` (output_broker_round_robin.go:1-101)
  — partition rows across outputs; distributed form: hash-mod split
  (row-level round-robin would need a global counter = a serialization
  point).
- ``drop_on``/``fallback`` (output_drop_on.go:30, output_fallback.go:19)
  — try children in order, first success wins.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Sink = Callable[[DataFrame, int], None]


class FanOut:
    """Write each micro-batch to ALL child sinks (parallel semantics; the
    persisted batch is computed once, children read the cached plan)."""

    def __init__(self, *sinks: Sink):
        self.sinks = sinks

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        df = df.persist()
        try:
            for sink in self.sinks:
                sink(df, batch_id)
        finally:
            df.unpersist()


class FanOutSequential(FanOut):
    """Alias of FanOut in the DataFrame model — children already run in
    declaration order inside the single foreachBatch."""


class SwitchSink:
    """Route rows to the first matching case's sink; optional default.
    ``cases`` = [(condition, sink)] or [(condition, sink, continue_)] —
    a `continue: true` case lets matching rows ALSO be tested against
    later cases (output_switch.go:160, non-mutually-exclusive checks)."""

    def __init__(self, cases: Sequence[tuple], default: Sink | None = None):
        self.cases = [
            (c[0], c[1], c[2] if len(c) > 2 else False) for c in cases
        ]
        self.default = default

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        df = df.persist()
        try:
            prior = F.lit(False)
            for cond, sink, cont in self.cases:
                c = F.expr(cond) if isinstance(cond, str) else cond
                sink(df.filter(c & ~prior), batch_id)
                if not cont:
                    prior = prior | c
            if self.default is not None:
                self.default(df.filter(~prior), batch_id)
        finally:
            df.unpersist()


class RoundRobinSink:
    """Partition each batch across N sinks by a deterministic hash-mod of
    ``key`` (or all columns). Row-level round-robin needs a global counter
    — a serialization point a distributed engine refuses on purpose."""

    def __init__(self, sinks: Sequence[Sink], key: str | None = None):
        self.sinks = list(sinks)
        self.key = key

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        n = len(self.sinks)
        key = F.col(self.key) if self.key else F.struct(*df.columns)
        tagged = df.withColumn("_rr", F.pmod(F.hash(key), F.lit(n))).persist()
        try:
            for i, sink in enumerate(self.sinks):
                sink(tagged.filter(F.col("_rr") == i).drop("_rr"), batch_id)
        finally:
            tagged.unpersist()


class Fallback:
    """`fallback`/`try` output (output_fallback.go:19): attempt sinks in
    order until one succeeds; raise only if all fail (→ batch retry)."""

    def __init__(self, *sinks: Sink):
        self.sinks = sinks

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        errors: list[Exception] = []
        for sink in self.sinks:
            try:
                sink(df, batch_id)
                return
            except Exception as e:  # noqa: BLE001 — fallback must catch everything
                errors.append(e)
        raise RuntimeError(f"all fallback sinks failed: {errors}")


class DropSink:
    """`drop` (output_drop.go:18): materialize and discard (still forces
    the plan so upstream `observe`/metrics fire)."""

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").format("noop").save()


class DropOn:
    """`drop_on` (output_drop_on.go:30): forward to the child; on error,
    drop the batch instead of failing the query."""

    def __init__(self, child: Sink):
        self.child = child

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        try:
            self.child(df, batch_id)
        except Exception:  # noqa: BLE001 — drop-on-error is the contract
            pass


class DlqSplit:
    """Error-routing sink: rows with a null ``_error`` go to ``main``,
    errored rows to the ``dlq`` (≙ the reference's error-routing cookbook:
    try/catch + switch output on errored())."""

    def __init__(self, main: Sink, dlq: Sink, error_col: str = "_error"):
        self.main = main
        self.dlq = dlq
        self.error_col = error_col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        df = df.persist()
        try:
            self.main(df.filter(F.col(self.error_col).isNull()).drop(self.error_col), batch_id)
            self.dlq(df.filter(F.col(self.error_col).isNotNull()), batch_id)
        finally:
            df.unpersist()


class RetrySink:
    """`retry` output (output_retry.go:105): retry the child sink with
    exponential backoff until success or ``max_retries``. This is the
    explicit in-batch retry loop ON TOP of Spark's own task/batch
    replay: transient child failures (a flaky JDBC endpoint, an object
    store 503) are absorbed without failing the micro-batch, so the
    stream doesn't reprocess the whole batch for a blip. The child must
    be idempotent (same contract as batch replay)."""

    def __init__(self, child: Sink, max_retries: int = 3,
                 backoff_s: float = 0.5, backoff_multiplier: float = 2.0):
        self.child = child
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.backoff_multiplier = backoff_multiplier

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        import time

        delay = self.backoff_s
        for attempt in range(self.max_retries + 1):
            try:
                self.child(df, batch_id)
                return
            except Exception:
                if attempt == self.max_retries:
                    raise
                time.sleep(delay)
                delay *= self.backoff_multiplier


class RejectSink:
    """`reject` output (output_reject.go:25): nack every message with an
    interpolated error. Spark form: raising inside foreachBatch fails
    the micro-batch → the offset is not committed → upstream redelivers
    (the nack). ``error_expr`` is evaluated against the FIRST row only —
    one driver round-trip per batch, and an explicit assumption that the
    interpolation is effectively constant across the batch (config
    resolution, not per-row data): a batch fails as one unit here, so a
    per-row message could not be surfaced anyway. Rows with differing
    expression values still all reject with the first row's message."""

    def __init__(self, error_expr: object = None):
        self.error_expr = error_expr

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        msg = "message rejected"
        if self.error_expr is not None:
            col = F.expr(self.error_expr) if isinstance(self.error_expr, str) else self.error_expr
            row = df.select(col.alias("m")).limit(1).collect()
            if row:
                msg = str(row[0]["m"])
        raise RuntimeError(f"reject: {msg} (batch {batch_id})")


# `inproc` exchange (input_inproc.go:31 / output_inproc.go:20): a named
# in-process handoff between two pipelines in one session. DataFrame
# model: a registry of named frames — the writing pipeline registers its
# result, the reading pipeline picks it up as a source.
_INPROC: dict[str, DataFrame] = {}


class InprocSink:
    def __init__(self, name: str):
        self.name = name

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        # A micro-batch frame's lineage is only valid inside its own batch:
        # pin the rows NOW (eager localCheckpoint) so readers after later
        # batches don't recompute from a source that has moved on.
        snap = df.localCheckpoint(eager=True)
        cur = _INPROC.get(self.name)
        _INPROC[self.name] = snap if cur is None else cur.unionByName(snap, allowMissingColumns=True)


def inproc_read(name: str) -> DataFrame:
    if name not in _INPROC:
        raise KeyError(f"inproc channel {name!r} has no data")
    return _INPROC[name]


def inproc_clear(name: str | None = None) -> None:
    if name is None:
        _INPROC.clear()
    else:
        _INPROC.pop(name, None)


class DynamicSink:
    """`dynamic` output (io/output_dynamic.go:22): route every batch to
    the registry's currently-selected child sink. The selection (and the
    registry contents) are re-read per micro-batch, so runtime swaps
    apply at the next batch boundary."""

    def __init__(self, registry, selected: str):
        self.registry = registry
        self.selected = selected

    def select(self, label: str) -> None:
        self.selected = label

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        child = self.registry.get(self.selected)
        child(df, batch_id)


class StdoutSink:
    """`stdout` output (internal/impl/io/output_stdout.go:27): print
    messages to the process stdout as newline-delimited lines. Driver-
    side by definition (stdout belongs to the driver); rows stream
    through ``toLocalIterator`` so the batch never fully materializes
    in driver memory."""

    def __init__(self, col: str = "value", codec: str = "lines"):
        if codec != "lines":
            raise ValueError(f"stdout codec {codec!r} not recognised (want 'lines')")
        self.col = col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        import sys

        for row in df.select(self.col).toLocalIterator():
            v = row[self.col]
            sys.stdout.write((v.decode("utf-8", "replace") if isinstance(v, (bytes, bytearray)) else str(v)) + "\n")
        sys.stdout.flush()


class SocketSink:
    """`socket` output (internal/impl/io/output_socket.go:24): connect
    to a TCP server and write messages as newline-delimited lines — one
    connection per partition (executors cannot share one fd; the server
    sees N ordered streams, the reference's per-instance contract held
    per task)."""

    def __init__(self, address: str, network: str = "tcp", col: str = "value",
                 codec: str = "lines"):
        if network != "tcp":
            raise ValueError(f"socket network {network!r} not supported (tcp only)")
        if codec != "lines":
            raise ValueError(f"socket codec {codec!r} not recognised (want 'lines')")
        if ":" not in address:
            raise ValueError("socket address must be host:port")
        self.address = address
        self.col = col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        host, port = self.address.rsplit(":", 1)
        port_i = int(port)
        col = self.col

        def write_partition(rows):
            import socket as _socket

            conn = None
            try:
                for row in rows:
                    if conn is None:
                        conn = _socket.create_connection((host, port_i), timeout=30)
                    v = row[col]
                    payload = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    conn.sendall(bytes(payload) + b"\n")
            finally:
                if conn is not None:
                    conn.close()

        df.select(col).foreachPartition(write_partition)


class FileSink:
    """`file` output (internal/impl/io/output_file.go:63): write
    messages to files under a path as newline-delimited lines (`lines`
    codec). The reference appends to one interpolated path; the Spark
    analog appends one text-file set per batch under the directory
    (atomic per-partition task files — the exactly-once parquet sink is
    the ledgered variant; this is the raw codec-parity surface).
    ``partition_by`` columns map the reference's interpolated-path
    fan-out onto hive-style subdirectories."""

    def __init__(self, path: str, col: str = "value", codec: str = "lines",
                 partition_by: tuple = ()):
        if codec != "lines":
            raise ValueError(f"file output codec {codec!r} not recognised (want 'lines')")
        self.path = path
        self.col = col
        self.partition_by = tuple(partition_by)

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        out = df.select(*self.partition_by, F.col(self.col).cast("string").alias("value")) \
            if self.partition_by else df.select(F.col(self.col).cast("string").alias("value"))
        w = out.write.mode("append")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.text(self.path)
