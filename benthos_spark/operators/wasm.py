"""`wasm` processor — execute a module function per message.

Reference: internal/impl/wasm/processor_wazero.go (wazero runtime) and
functions.go (the "benthos_wasm" host module). Here the runtime is this
repo's own from-scratch interpreter (functions/wasm.py); everything
else mirrors the reference:

- host module ``benthos_wasm`` exports v0_msg_as_bytes /
  v0_msg_set_bytes / v0_msg_get_meta / v0_msg_set_meta
  (functions.go:22-109), pointers packed as ``ptr<<32 | len``,
- the module must export the target function (default ``process``,
  called with no arguments once per message) and an allocator: Go
  convention ``malloc``/``free`` or Rust convention
  ``allocate``/``deallocate`` (processor_wazero.go:131-135),
- in-bound allocations are freed after each process call
  (processor_wazero.go:206-230); out-bound reads deallocate via
  ``deallocate`` when the module exports it,
- a host-side failure errors the message (``_error`` slot) without
  dropping it, exactly like funcErr → SetError (processor_wazero.go:
  268-276),
- a minimal deterministic WASI snapshot-preview-1 shim satisfies
  modules built with `-target=wasi` (the reference instantiates
  wazero's wasi_snapshot_preview1 the same way,
  processor_wazero.go:122).

One module instance per executor worker per module hash — the
interpreter is single-threaded per instance, matching the reference's
pool-of-runners answer to the same constraint.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from benthos_spark.operators.processors import (
    ERROR_COL,
    META_COL,
    Processor,
    ensure_error_col,
    ensure_meta_col,
)

_RUNNERS: dict = {}  # (sha256, function) -> _Runner


def _pack(ptr: int, length: int) -> int:
    return ((ptr & 0xFFFFFFFF) << 32) | (length & 0xFFFFFFFF)


# A module whose allocator never reclaims (arena/bump malloc — common
# in toolchain output) grows linear memory monotonically across the
# millions of messages a long-lived executor sees. Past this watermark
# the runner reinstantiates the module: per-message state must not
# outlive the call anyway (the reference frees all inbound allocations
# after each process call, processor_wazero.go:206-230).
_MEMORY_WATERMARK_BYTES = 256 * 1024 * 1024


class _Runner:
    """moduleRunner analog (processor_wazero.go:176): one instantiated
    module plus the per-message target slots."""

    def __init__(self, binary: bytes, function: str):
        self._binary = binary
        self._function = function
        self._instantiate(binary, function)

    def _instantiate(self, binary: bytes, function: str):
        from benthos_spark.functions import wasm

        module = wasm.parse_module(binary)
        imports = {}
        for imp in module.imports:
            if imp.kind != 0:
                continue
            key = (imp.module, imp.name)
            if imp.module == "benthos_wasm":
                imports[key] = self._host_fn(imp.name)
            elif imp.module == "wasi_snapshot_preview1":
                imports[key] = self._wasi_fn(imp.name)
            else:
                raise wasm.WasmError(f"unsatisfied import {key}")
        self.inst = wasm.Instance(module, imports)
        self.process = self.inst.exported(function)
        if self.process is None:
            raise wasm.WasmError(f"module does not export function {function!r}")
        self.malloc = self.inst.exported("malloc") or self.inst.exported("allocate")
        self.free = self.inst.exported("free")
        self.dealloc = self.inst.exported("deallocate")
        # per-message state
        self.content: Optional[bytes] = None
        self.meta: dict = {}
        self.err: Optional[str] = None
        self._inbound: list = []

    # -- benthos_wasm host module (functions.go:22-109) --------------------

    def _host_fn(self, name: str):
        if name == "v0_msg_as_bytes":
            def fn():
                if self.content is None:
                    self.err = "attempted to read bytes of deleted message"
                    return 0
                ptr = self._alloc_inbound(self.content)
                return _pack(ptr, len(self.content))
            return fn
        if name == "v0_msg_set_bytes":
            def fn(ptr, size):
                if self.content is None:
                    self.err = "attempted to set bytes of deleted message"
                    return
                self.content = self._read_outbound(ptr, size)
            return fn
        if name == "v0_msg_get_meta":
            def fn(kptr, ksize):
                key = self._read_outbound(kptr, ksize).decode("utf-8")
                val = self.meta.get(key, "").encode("utf-8")
                return _pack(self._alloc_inbound(val), len(val))
            return fn
        if name == "v0_msg_set_meta":
            def fn(kptr, ksize, vptr, vsize):
                key = self._read_outbound(kptr, ksize).decode("utf-8")
                self.meta[key] = self._read_outbound(vptr, vsize).decode("utf-8")
            return fn
        raise ValueError(f"unknown benthos_wasm function {name!r}")

    # -- deterministic wasi shim -------------------------------------------

    def _wasi_fn(self, name: str):
        inst_ref = self

        def fd_write(fd, iovs, iovs_len, nwritten_ptr):
            # count bytes, discard content (stdout/stderr of the module)
            total = 0
            for i in range(iovs_len):
                base = int.from_bytes(
                    inst_ref.inst.read_memory(iovs + 8 * i, 4), "little"
                )
                ln = int.from_bytes(
                    inst_ref.inst.read_memory(iovs + 8 * i + 4, 4), "little"
                )
                total += ln
            inst_ref.inst.write_memory(nwritten_ptr, total.to_bytes(4, "little"))
            return 0

        def random_get(ptr, length):
            # deterministic: exactly-once redelivery must reproduce bytes
            pat = hashlib.sha256(length.to_bytes(4, "little")).digest()
            buf = (pat * (length // 32 + 1))[:length]
            inst_ref.inst.write_memory(ptr, buf)
            return 0

        def clock_time_get(clock_id, precision, out_ptr):
            inst_ref.inst.write_memory(out_ptr, (0).to_bytes(8, "little"))
            return 0

        def zero2(a, b):
            inst_ref.inst.write_memory(a, (0).to_bytes(4, "little"))
            inst_ref.inst.write_memory(b, (0).to_bytes(4, "little"))
            return 0

        def proc_exit(code):
            from benthos_spark.functions.wasm import WasmTrap

            raise WasmTrap(f"proc_exit({code})")

        table = {
            "fd_write": fd_write,
            "random_get": random_get,
            "clock_time_get": clock_time_get,
            "environ_sizes_get": zero2,
            "args_sizes_get": zero2,
            "environ_get": lambda a, b: 0,
            "args_get": lambda a, b: 0,
            "proc_exit": proc_exit,
            "fd_close": lambda fd: 8,
            "fd_seek": lambda *a: 8,
            "fd_fdstat_get": lambda *a: 8,
            "fd_prestat_get": lambda *a: 8,
            "fd_prestat_dir_name": lambda *a: 8,
            "sched_yield": lambda: 0,
            "poll_oneoff": lambda *a: 52,
        }
        fn = table.get(name)
        if fn is None:
            # unknown wasi call: errno 52 (ENOSYS) keeps honest modules alive
            return lambda *a: 52
        return fn

    # -- allocator plumbing (processor_wazero.go:206-257) -------------------

    def _alloc_inbound(self, data: bytes) -> int:
        if self.malloc is None:
            from benthos_spark.functions.wasm import WasmTrap

            raise WasmTrap("module exports no malloc/allocate")
        ptr = self.malloc(len(data))
        self.inst.write_memory(ptr, data)
        self._inbound.append((ptr, len(data)))
        return ptr

    def _read_outbound(self, ptr: int, size: int) -> bytes:
        data = self.inst.read_memory(ptr, size)
        if self.dealloc is not None:
            self.dealloc(ptr, size)
        return data

    # -- per-message run (processor_wazero.go:259-285) ----------------------

    def run(self, content: bytes, meta: dict) -> tuple:
        self.content = bytes(content)
        self.meta = dict(meta or {})
        self.err = None
        self._inbound = []
        try:
            self.process()
        except Exception as e:
            self.err = str(e)
        finally:
            if self.free is not None:
                for ptr, _ in self._inbound:
                    try:
                        self.free(ptr)
                    except Exception:
                        pass
        if len(self.inst.memory) > _MEMORY_WATERMARK_BYTES:
            content, meta, err = self.content, self.meta, self.err
            self._instantiate(self._binary, self._function)
            return content, meta, err
        return self.content, self.meta, self.err


def get_runner(binary: bytes, function: str) -> _Runner:
    key = (hashlib.sha256(binary).hexdigest(), function)
    runner = _RUNNERS.get(key)
    if runner is None:
        runner = _Runner(binary, function)
        _RUNNERS[key] = runner
    return runner


@dataclass
class Wasm(Processor):
    """Config-wired `wasm` processor: module_path (or inline bytes) +
    function name, applied per message over an Arrow-batched UDF."""

    module_path: str = ""
    module_bytes: bytes = b""
    function: str = "process"
    col: str = "value"

    def __post_init__(self):
        if not self.module_bytes:
            with open(self.module_path, "rb") as f:
                self.module_bytes = f.read()
        # fail fast on the driver, like the reference's constructor
        # instantiating one runner up front (processor_wazero.go:91-98)
        get_runner(self.module_bytes, self.function)

    def __call__(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        df = ensure_meta_col(df)
        binary, function = self.module_bytes, self.function

        @F.pandas_udf("struct<v:binary,m:map<string,string>,e:string>")
        def run(vals: pd.Series, metas: pd.Series) -> pd.DataFrame:
            runner = get_runner(binary, function)
            out_v, out_m, out_e = [], [], []
            for v, m in zip(vals, metas):
                content, meta, err = runner.run(
                    b"" if v is None else bytes(v), m or {}
                )
                out_v.append(content)
                out_m.append(meta)
                out_e.append(err)
            return pd.DataFrame({"v": out_v, "m": out_m, "e": out_e})

        # string content columns ride as UTF-8 and come back as string
        # (messages are bytes in the reference; the cast keeps the
        # DataFrame column type stable either way)
        is_binary = dict(df.dtypes).get(self.col) == "binary"
        res = run(F.col(self.col).cast("binary"), F.col(META_COL))
        out_v = F.col("_w.v") if is_binary else F.col("_w.v").cast("string")
        return (
            df.withColumn("_w", res)
            .withColumn(self.col, out_v)
            .withColumn(META_COL, F.col("_w.m"))
            .withColumn(ERROR_COL, F.coalesce(F.col(ERROR_COL), F.col("_w.e")))
            .drop("_w")
        )
