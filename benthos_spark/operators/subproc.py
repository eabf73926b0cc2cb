"""`subprocess` and `command` processors — pipe message content through
external programs.

Reference parity:

- ``subprocess`` (internal/impl/io/processor_subprocess.go:34) keeps ONE
  child process alive and, per message, writes the content framed by
  ``codec_send`` to its stdin, then reads one framed response: a stdout
  response REPLACES the content; a stderr response leaves the content
  unchanged and marks the message failed (our ``_error`` slot). Codecs:
  ``lines`` (newline-delimited), ``netstring`` (``len:payload,``),
  ``length_prefixed_uint32_be``.
- ``command`` (internal/impl/io/processor_command.go:74) executes the
  command FRESH per message with the content as stdin; stdout replaces
  the content verbatim, stderr lands in the ``command_stderr`` column
  (≙ metadata), a non-zero exit marks the message failed.

Spark shape: both run inside ``mapInPandas`` — ``subprocess`` spawns one
child PER PARTITION TASK and streams rows through it request/response
(the reference's exact per-message protocol; state never leaves the
task, so the operator scales horizontally with partitions and restarts
cleanly under retries), ``command`` spawns per row (inherently so —
that's the reference's semantics; use ``subprocess`` for hot paths).
This is a designed per-row surface like the reference's: the external
program IS the work; there is no vectorized alternative.

Dynamic ``command`` arguments follow the reference: ``name`` accepts
``${! expr }`` Bloblang interpolation and ``args_mapping`` is a Bloblang
query producing the argument list, both resolved per message with the
interpreter (the message document is the JSON-parsed content column
when parseable, else the raw string).
"""

from __future__ import annotations

import json
import struct
import subprocess as sp
import threading
from dataclasses import dataclass, field
from queue import Empty, Queue
from typing import Iterator, Optional

from pyspark.sql import DataFrame

from benthos_spark.operators.processors import Processor

_CODECS = ("lines", "netstring", "length_prefixed_uint32_be")


def _encode_frame(payload: bytes, codec: str) -> bytes:
    if codec == "lines":
        return payload + b"\n"
    if codec == "netstring":
        return str(len(payload)).encode() + b":" + payload + b","
    if codec == "length_prefixed_uint32_be":
        return struct.pack(">I", len(payload)) + payload
    raise ValueError(f"unknown subprocess codec {codec!r} (want one of {_CODECS})")


def _frame_reader(pipe, codec: str, tag: str, q: Queue, max_buffer: int):
    """Reader-thread body: parse framed responses off `pipe`, push
    (tag, payload) onto the queue; EOF pushes (tag+'_eof', b'')."""

    def put(b: bytes):
        q.put((tag, b[:max_buffer]))

    try:
        if codec == "lines":
            for line in pipe:
                put(line.rstrip(b"\n"))
        elif codec == "netstring":
            buf = b""
            while True:
                ch = pipe.read(1)
                if not ch:
                    break
                if ch != b":":
                    buf += ch
                    continue
                n = int(buf)
                buf = b""
                payload = pipe.read(n)
                pipe.read(1)  # trailing comma
                put(payload)
        else:  # length_prefixed_uint32_be
            while True:
                hdr = pipe.read(4)
                if len(hdr) < 4:
                    break
                (n,) = struct.unpack(">I", hdr)
                put(pipe.read(n))
    except Exception:
        pass
    q.put((tag + "_eof", b""))


class _Child:
    """One live subprocess with framed request/response I/O — the
    per-partition analog of the reference's subprocWrapper
    (processor_subprocess.go:176): stdout and stderr are read by
    threads into one queue; Send writes a frame then takes whichever
    stream answers first."""

    def __init__(self, argv, codec_send, codec_recv, max_buffer):
        self.argv = argv
        self.codec_send = codec_send
        self.codec_recv = codec_recv
        self.max_buffer = max_buffer
        self.proc: Optional[sp.Popen] = None
        self.q: Queue = Queue()

    def start(self):
        self.proc = sp.Popen(
            self.argv, stdin=sp.PIPE, stdout=sp.PIPE, stderr=sp.PIPE, bufsize=0
        )
        self.q = Queue()
        for pipe, tag in ((self.proc.stdout, "out"), (self.proc.stderr, "err")):
            t = threading.Thread(
                target=_frame_reader,
                args=(pipe, self.codec_recv, tag, self.q, self.max_buffer),
                daemon=True,
            )
            t.start()

    def send(self, payload: bytes, timeout: float = 30.0):
        """Returns (tag, response) with tag 'out' or 'err'. Respawns a
        dead child before sending (subprocWrapper restart behavior)."""
        if self.proc is None or self.proc.poll() is not None:
            self.start()
        try:
            self.proc.stdin.write(_encode_frame(payload, self.codec_send))
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError) as e:
            return "err", f"subprocess write failed: {e}".encode()
        while True:
            try:
                tag, resp = self.q.get(timeout=timeout)
            except Empty:
                return "err", b"subprocess response timeout"
            if tag in ("out", "err"):
                return tag, resp
            # an _eof: the child died mid-request
            return "err", b"subprocess exited before responding"

    def close(self):
        if self.proc is not None and self.proc.poll() is None:
            try:
                self.proc.stdin.close()
                self.proc.wait(timeout=5)
            except Exception:
                self.proc.kill()


@dataclass
class Subprocess(Processor):
    """Pipe each message through a persistent child process
    (processor_subprocess.go:34). stdout response replaces `col`;
    stderr response keeps it and fills ``_error``."""

    name: str = ""
    args: list = field(default_factory=list)
    codec_send: str = "lines"
    codec_recv: str = "lines"
    col: str = "value"
    max_buffer: int = 65536

    def __post_init__(self):
        if not self.name:
            raise ValueError("subprocess needs a command name")
        for c in (self.codec_send, self.codec_recv):
            if c not in _CODECS:
                raise ValueError(f"unknown subprocess codec {c!r} (want one of {_CODECS})")

    def __call__(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        col = self.col
        argv = [self.name] + [str(a) for a in self.args]
        codec_send, codec_recv, max_buffer = (
            self.codec_send, self.codec_recv, self.max_buffer,
        )
        has_err = "_error" in df.columns
        out_fields = list(df.columns) + ([] if has_err else ["_error"])
        schema = ", ".join(
            f"`{name}` string" if name == "_error"
            else f"`{name}` {df.schema[name].dataType.simpleString()}"
            for name in out_fields
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            child = _Child(argv, codec_send, codec_recv, max_buffer)
            try:
                for pdf in batches:
                    vals, errs = [], []
                    for i in range(len(pdf)):
                        raw = pdf[col].iat[i]
                        payload = raw if isinstance(raw, bytes) else str(raw).encode()
                        tag, resp = child.send(payload)
                        if tag == "out":
                            vals.append(
                                resp if isinstance(raw, bytes) else resp.decode("utf-8", "replace")
                            )
                            errs.append(pdf["_error"].iat[i] if has_err else None)
                        else:
                            vals.append(raw)
                            errs.append(resp.decode("utf-8", "replace"))
                    out = {c: pdf[c] for c in pdf.columns}
                    out[col] = pd.Series(vals, dtype=pdf[col].dtype)
                    out["_error"] = pd.Series(errs, dtype="object")
                    yield pd.DataFrame(out)
            finally:
                child.close()

        return df.mapInPandas(run, schema=schema)


@dataclass
class SubprocessSource:
    """`subprocess` input (internal/impl/io/input_subprocess.go:28):
    execute a command once and consume its stdout as messages (codec
    ``lines``); stderr lines are logged. Bounded driver-side run —
    the external program is a single local process by definition, so
    this is a `generate`-style source: the rows it emits then
    distribute normally. ``restart_on_exit`` is meaningless for a
    bounded batch read and is not offered."""

    name: str = ""
    args: list = field(default_factory=list)
    codec: str = "lines"
    max_buffer: int = 65536
    timeout_s: float = 60.0
    streaming: bool = False

    def __post_init__(self):
        if not self.name:
            raise ValueError("subprocess input needs a command name")
        if self.codec != "lines":
            raise ValueError(f"subprocess input codec {self.codec!r} not recognised (want 'lines')")

    def read(self, spark) -> DataFrame:
        res = sp.run(
            [self.name] + [str(a) for a in self.args],
            capture_output=True, timeout=self.timeout_s,
        )
        if res.returncode != 0:
            raise RuntimeError(
                f"subprocess input exited {res.returncode}: "
                + res.stderr.decode("utf-8", "replace")
            )
        if res.stderr:
            import logging

            logging.getLogger(__name__).warning(
                "subprocess input stderr: %s", res.stderr.decode("utf-8", "replace")
            )
        lines = [
            (ln[: self.max_buffer],)
            for ln in res.stdout.decode("utf-8", "replace").split("\n")
            if ln
        ]
        return spark.createDataFrame(lines or [(None,)], "value string").filter(
            "value is not null"
        )


@dataclass
class SubprocessSink:
    """`subprocess` output (internal/impl/io/output_subprocess.go:27):
    write messages to a command's stdin (codec ``lines``), one child
    per partition — the scale-correct analog of the reference's single
    local process (executors cannot share one OS pipe); a non-zero
    exit fails the batch so the runner retries (reference behavior:
    log stderr + re-execute until success)."""

    name: str = ""
    args: list = field(default_factory=list)
    codec: str = "lines"
    col: str = "value"

    def __post_init__(self):
        if not self.name:
            raise ValueError("subprocess output needs a command name")
        if self.codec != "lines":
            raise ValueError(f"subprocess output codec {self.codec!r} not recognised (want 'lines')")

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        argv = [self.name] + [str(a) for a in self.args]
        col = self.col

        def write_partition(rows):
            proc = None
            for row in rows:
                if proc is None:
                    proc = sp.Popen(argv, stdin=sp.PIPE, stdout=sp.DEVNULL, stderr=sp.PIPE)
                v = row[col]
                payload = v if isinstance(v, bytes) else str(v).encode()
                proc.stdin.write(payload + b"\n")
            if proc is not None:
                proc.stdin.close()
                _, err = None, proc.stderr.read()
                if proc.wait() != 0:
                    raise RuntimeError(
                        f"subprocess output exited {proc.returncode}: "
                        + err.decode("utf-8", "replace")
                    )

        df.select(col).foreachPartition(write_partition)


@dataclass
class Command(Processor):
    """Execute a command per message (processor_command.go:74):
    content → stdin, stdout replaces content, stderr → the
    ``command_stderr`` column, non-zero exit → ``_error``. ``name``
    takes ``${! expr }`` interpolation; ``args_mapping`` is a Bloblang
    query returning the argument list."""

    name: str = ""
    args_mapping: Optional[str] = None
    col: str = "value"
    timeout_s: float = 30.0

    def __post_init__(self):
        if not self.name:
            raise ValueError("command needs a name")

    def __call__(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        import re as _re

        from benthos_spark.bloblang.interp import BloblangError, Executor

        col = self.col
        name_tpl = self.name
        args_src = self.args_mapping
        timeout_s = self.timeout_s
        interp_re = _re.compile(r"\$\{!\s*(.*?)\s*\}")
        has_err = "_error" in df.columns
        extra = [c for c in ("_error", "command_stderr") if c not in df.columns]
        out_fields = list(df.columns) + extra
        schema = ", ".join(
            f"`{name}` string" if name in ("_error", "command_stderr")
            else f"`{name}` {df.schema[name].dataType.simpleString()}"
            for name in out_fields
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            args_exec = Executor(f"root = {args_src}") if args_src else None
            name_execs = [
                (m.group(0), Executor(f"root = {m.group(1)}"))
                for m in interp_re.finditer(name_tpl)
            ]
            for pdf in batches:
                vals, errs, stderrs = [], [], []
                for i in range(len(pdf)):
                    raw = pdf[col].iat[i]
                    content = raw if isinstance(raw, bytes) else str(raw).encode()
                    try:
                        doc = json.loads(content)
                    except Exception:
                        doc = content.decode("utf-8", "replace")
                    err = pdf["_error"].iat[i] if has_err else None
                    try:
                        name = name_tpl
                        for lit, ex in name_execs:
                            v = ex.map_part(doc)[0]
                            name = name.replace(lit, v if isinstance(v, str) else json.dumps(v))
                        argv = [name]
                        if args_exec is not None:
                            mapped = args_exec.map_part(doc)[0]
                            if not isinstance(mapped, list):
                                raise BloblangError(
                                    f"args_mapping must return a list, got {type(mapped).__name__}"
                                )
                            argv += [a if isinstance(a, str) else json.dumps(a) for a in mapped]
                        res = sp.run(argv, input=content, capture_output=True, timeout=timeout_s)
                        if res.returncode != 0:
                            raise RuntimeError(
                                f"execution error: exit {res.returncode}: "
                                + res.stderr.decode("utf-8", "replace")
                            )
                        vals.append(
                            res.stdout if isinstance(raw, bytes)
                            else res.stdout.decode("utf-8", "replace")
                        )
                        stderrs.append(res.stderr.decode("utf-8", "replace") or None)
                        errs.append(err)
                    except Exception as e:
                        vals.append(raw)
                        stderrs.append(None)
                        errs.append(str(e))
                out = {c: pdf[c] for c in pdf.columns}
                out[col] = pd.Series(vals, dtype=pdf[col].dtype)
                out["_error"] = pd.Series(errs, dtype="object")
                out["command_stderr"] = pd.Series(stderrs, dtype="object")
                yield pd.DataFrame(out)

        return df.mapInPandas(run, schema=schema)
