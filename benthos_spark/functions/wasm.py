"""From-scratch WebAssembly interpreter (core spec 1.0 "MVP" + the
sign-extension, saturating-truncation, multi-value-blocktype and
memory.copy/fill extensions that every modern toolchain emits).

The reference's `wasm` processor executes a module per message with the
wazero runtime (internal/impl/wasm/processor_wazero.go:26). This engine
has no JVM/WASM runtime dependency, so the virtual machine itself is
implemented here from the public WebAssembly core specification
(https://www.w3.org/TR/wasm-core-1/): binary decoding (§5), a
structured-control interpreter with spec trap semantics (§4), linear
memory, tables + call_indirect, and host-function imports. The benthos
host-module surface and allocator conventions live in
operators/wasm.py.

Scope notes (honest gates, not stubs):
- single memory / single table (the MVP limit),
- no SIMD (0xFD) and no threads — a module using them fails to parse
  with a clear message,
- floats use Python doubles with explicit f32 re-rounding after every
  f32 op, and spec NaN/∞ propagation for min/max/nearest/trunc.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

PAGE = 65536


class WasmError(ValueError):
    """Malformed or unsupported module (decode/validate time)."""


class WasmTrap(RuntimeError):
    """Runtime trap (spec §4: unreachable, OOB, div-by-zero, ...)."""


# -- binary reader (spec §5.2) -------------------------------------------------


class _Reader:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos

    def eof(self) -> bool:
        return self.pos >= len(self.b)

    def u8(self) -> int:
        p = self.pos
        if p >= len(self.b):
            raise WasmError("unexpected end of section")
        self.pos = p + 1
        return self.b[p]

    def take(self, n: int) -> bytes:
        p = self.pos
        if p + n > len(self.b):
            raise WasmError("unexpected end of section")
        self.pos = p + n
        return self.b[p : p + n]

    def uleb(self, bits: int = 32) -> int:
        out = shift = 0
        while True:
            byte = self.u8()
            out |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                break
            if shift > bits + 7:
                raise WasmError("uleb too long")
        if out >= 1 << bits:
            raise WasmError("uleb out of range")
        return out

    def sleb(self, bits: int = 32) -> int:
        out = shift = 0
        while True:
            byte = self.u8()
            out |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                if byte & 0x40 and shift < bits + 7:
                    out -= 1 << shift
                break
            if shift > bits + 7:
                raise WasmError("sleb too long")
        return out

    def f32(self) -> float:
        return struct.unpack("<f", self.take(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.take(8))[0]

    def name(self) -> str:
        return self.take(self.uleb()).decode("utf-8")


# -- module structure -----------------------------------------------------------

VALTYPES = {0x7F: "i32", 0x7E: "i64", 0x7D: "f32", 0x7C: "f64", 0x70: "funcref"}


@dataclass(frozen=True)
class FuncType:
    params: tuple
    results: tuple


@dataclass
class _Import:
    module: str
    name: str
    kind: int  # 0 func, 1 table, 2 mem, 3 global
    desc: Any


@dataclass
class _Global:
    valtype: int
    mutable: bool
    init: list  # const expr instructions


@dataclass
class _Code:
    locals: list  # flattened valtype list
    body: list  # decoded instruction list (op, imm)


@dataclass
class Module:
    types: list = field(default_factory=list)
    imports: list = field(default_factory=list)
    func_typeidx: list = field(default_factory=list)  # non-imported
    table_limits: Optional[tuple] = None
    mem_limits: Optional[tuple] = None
    globals: list = field(default_factory=list)
    exports: dict = field(default_factory=dict)  # name -> (kind, idx)
    start: Optional[int] = None
    elems: list = field(default_factory=list)  # (offset_expr, [funcidx])
    codes: list = field(default_factory=list)
    datas: list = field(default_factory=list)  # (offset_expr, bytes)


def _read_functype(r: _Reader) -> FuncType:
    if r.u8() != 0x60:
        raise WasmError("expected functype 0x60")
    params = tuple(r.u8() for _ in range(r.uleb()))
    results = tuple(r.u8() for _ in range(r.uleb()))
    return FuncType(params, results)


def _read_limits(r: _Reader) -> tuple:
    flag = r.u8()
    lo = r.uleb()
    hi = r.uleb() if flag & 1 else None
    return (lo, hi)


def _read_expr(r: _Reader) -> list:
    """Decode a const-expr / code body to the terminating `end`."""
    out = []
    depth = 0
    while True:
        op, imm = _read_instr(r)
        if op == 0x0B and depth == 0:
            return out
        if op in (0x02, 0x03, 0x04):
            depth += 1
        elif op == 0x0B:
            depth -= 1
        out.append((op, imm))


_MEM_OPS = set(range(0x28, 0x3F))


def _read_blocktype(r: _Reader):
    b = r.b[r.pos]
    if b == 0x40:
        r.pos += 1
        return ((), ())
    if b in VALTYPES:
        r.pos += 1
        return ((), (b,))
    return r.sleb(33)  # type index (multi-value); resolved at prepare time


def _read_instr(r: _Reader) -> tuple:
    op = r.u8()
    if op in (0x02, 0x03, 0x04):  # block/loop/if
        return op, _read_blocktype(r)
    if op in (0x0C, 0x0D, 0x10):  # br, br_if, call
        return op, r.uleb()
    if op == 0x0E:  # br_table
        targets = [r.uleb() for _ in range(r.uleb())]
        return op, (targets, r.uleb())
    if op == 0x11:  # call_indirect
        typeidx = r.uleb()
        r.uleb()  # table index (0 in MVP)
        return op, typeidx
    if op == 0x1C:  # select t*
        for _ in range(r.uleb()):
            r.u8()
        return 0x1B, None
    if 0x20 <= op <= 0x24:  # local/global get/set/tee
        return op, r.uleb()
    if op in _MEM_OPS:  # loads/stores: align + offset
        r.uleb()
        return op, r.uleb()
    if op in (0x3F, 0x40):  # memory.size/grow
        r.u8()
        return op, None
    if op == 0x41:
        return op, r.sleb(32) & 0xFFFFFFFF
    if op == 0x42:
        return op, r.sleb(64) & 0xFFFFFFFFFFFFFFFF
    if op == 0x43:
        return op, r.f32()
    if op == 0x44:
        return op, r.f64()
    if op == 0xFC:
        sub = r.uleb()
        if sub <= 7:  # trunc_sat family
            return 0xFC00 + sub, None
        if sub == 10:  # memory.copy
            r.u8(), r.u8()
            return 0xFC0A, None
        if sub == 11:  # memory.fill
            r.u8()
            return 0xFC0B, None
        raise WasmError(f"unsupported 0xFC opcode {sub}")
    if op == 0xFD:
        raise WasmError("SIMD (0xFD prefix) not supported")
    if op > 0xC4:
        raise WasmError(f"unknown opcode 0x{op:02x}")
    return op, None


def parse_module(binary: bytes) -> Module:
    if binary[:4] != b"\x00asm":
        raise WasmError("bad magic")
    if binary[4:8] != b"\x01\x00\x00\x00":
        raise WasmError("unsupported wasm version")
    r = _Reader(binary, 8)
    m = Module()
    while not r.eof():
        sec = r.u8()
        size = r.uleb()
        body = _Reader(r.take(size))
        if sec == 1:
            m.types = [_read_functype(body) for _ in range(body.uleb())]
        elif sec == 2:
            for _ in range(body.uleb()):
                mod, name, kind = body.name(), body.name(), body.u8()
                if kind == 0:
                    desc = body.uleb()
                elif kind == 1:
                    body.u8()  # reftype
                    desc = _read_limits(body)
                elif kind == 2:
                    desc = _read_limits(body)
                elif kind == 3:
                    desc = (body.u8(), body.u8())
                else:
                    raise WasmError(f"bad import kind {kind}")
                m.imports.append(_Import(mod, name, kind, desc))
        elif sec == 3:
            m.func_typeidx = [body.uleb() for _ in range(body.uleb())]
        elif sec == 4:
            n = body.uleb()
            if n > 1:
                raise WasmError("multiple tables not supported")
            if n:
                body.u8()  # reftype
                m.table_limits = _read_limits(body)
        elif sec == 5:
            n = body.uleb()
            if n > 1:
                raise WasmError("multiple memories not supported")
            if n:
                m.mem_limits = _read_limits(body)
        elif sec == 6:
            for _ in range(body.uleb()):
                vt, mut = body.u8(), body.u8()
                m.globals.append(_Global(vt, bool(mut), _read_expr(body)))
        elif sec == 7:
            for _ in range(body.uleb()):
                name, kind, idx = body.name(), body.u8(), body.uleb()
                m.exports[name] = (kind, idx)
        elif sec == 8:
            m.start = body.uleb()
        elif sec == 9:
            for _ in range(body.uleb()):
                flag = body.uleb()
                if flag not in (0,):
                    raise WasmError("only active funcref element segments supported")
                off = _read_expr(body)
                m.elems.append((off, [body.uleb() for _ in range(body.uleb())]))
        elif sec == 10:
            for _ in range(body.uleb()):
                sz = body.uleb()
                cr = _Reader(body.take(sz))
                locals_ = []
                for _ in range(cr.uleb()):
                    cnt, vt = cr.uleb(), cr.u8()
                    locals_.extend([vt] * cnt)
                m.codes.append(_Code(locals_, _read_expr(cr)))
        elif sec == 11:
            for _ in range(body.uleb()):
                flag = body.uleb()
                if flag == 0:
                    off = _read_expr(body)
                    m.datas.append((off, body.take(body.uleb())))
                elif flag == 1:  # passive
                    m.datas.append((None, body.take(body.uleb())))
                else:
                    raise WasmError("multi-memory data segments not supported")
        # section 0 (custom) and unknown: skipped
    return m


# -- prepared function bodies -----------------------------------------------------


@dataclass
class _Prepared:
    """A code body with control flow resolved: every block/loop/if
    carries (else_pc, end_pc, param_arity, result_arity)."""

    functype: FuncType
    locals: list
    code: list


def _block_arity(m: Module, bt) -> tuple:
    if isinstance(bt, tuple):
        params, results = bt
        return len(params), len(results)
    ft = m.types[bt]
    return len(ft.params), len(ft.results)


def _prepare(m: Module, functype: FuncType, code: _Code) -> _Prepared:
    instrs = list(code.body)
    # match block starts to else/end positions
    stack = []
    meta: dict[int, tuple] = {}
    elses: dict[int, int] = {}
    for pc, (op, imm) in enumerate(instrs):
        if op in (0x02, 0x03, 0x04):
            stack.append(pc)
        elif op == 0x05:
            elses[stack[-1]] = pc
        elif op == 0x0B:
            start = stack.pop()
            meta[start] = (elses.get(start), pc)
    if stack:
        raise WasmError("unbalanced control flow")
    out = []
    for pc, (op, imm) in enumerate(instrs):
        if op in (0x02, 0x03, 0x04):
            pa, ra = _block_arity(m, imm)
            else_pc, end_pc = meta[pc]
            out.append((op, (else_pc, end_pc, pa, ra)))
        else:
            out.append((op, imm))
    return _Prepared(functype, list(code.locals), out)


# -- instance ---------------------------------------------------------------------


class HostFunc:
    __slots__ = ("functype", "fn")

    def __init__(self, functype: FuncType, fn: Callable):
        self.functype = functype
        self.fn = fn


_ZERO = {0x7F: 0, 0x7E: 0, 0x7D: 0.0, 0x7C: 0.0, 0x70: None}

_I32 = 0xFFFFFFFF
_I64 = 0xFFFFFFFFFFFFFFFF


def _s32(v: int) -> int:
    return v - 0x100000000 if v & 0x80000000 else v

def _s64(v: int) -> int:
    return v - 0x10000000000000000 if v & 0x8000000000000000 else v


def _canon_args(ft: FuncType, args: tuple) -> list:
    if len(args) != len(ft.params):
        raise WasmTrap(
            f"expected {len(ft.params)} arguments, got {len(args)}"
        )
    return [
        (v & _I32) if t == 0x7F else (v & _I64) if t == 0x7E else v
        for t, v in zip(ft.params, args)
    ]


def _f32r(x: float) -> float:
    """Re-round to f32 precision; overflow → ±inf (IEEE 754)."""
    try:
        return struct.unpack("<f", struct.pack("<f", x))[0]
    except OverflowError:
        return math.inf if x > 0 else -math.inf


def _div_trunc(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _nearest(x: float) -> float:
    if math.isnan(x) or math.isinf(x) or x == 0.0:
        return x
    f = math.floor(x)
    d = x - f
    if d > 0.5:
        r = f + 1.0
    elif d < 0.5:
        r = f
    else:
        r = f if f % 2 == 0 else f + 1.0
    return math.copysign(r, x) if r == 0.0 else r


def _fmin(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == b == 0.0:  # min(-0, 0) = -0
        return a if math.copysign(1.0, a) < 0 else b
    return a if a < b else b


def _fmax(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == b == 0.0:
        return a if math.copysign(1.0, a) > 0 else b
    return a if a > b else b


def _trunc_checked(x: float, lo: int, hi: int) -> int:
    if math.isnan(x):
        raise WasmTrap("invalid conversion to integer")
    if math.isinf(x):
        raise WasmTrap("integer overflow")
    t = math.trunc(x)
    if t < lo or t > hi:
        raise WasmTrap("integer overflow")
    return int(t)


def _trunc_sat(x: float, lo: int, hi: int) -> int:
    if math.isnan(x):
        return 0
    t = math.trunc(x) if not math.isinf(x) else (hi if x > 0 else lo)
    return min(max(int(t), lo), hi)


class Instance:
    """An instantiated module: memory, globals, table, callable exports.

    `imports` maps (module, name) → python callable for functions (args
    and results are python ints/floats, i32/i64 as unsigned ints), or a
    value for globals. Mirrors wazero's HostModuleBuilder surface that
    the reference builds "benthos_wasm" with
    (processor_wazero.go:113-118)."""

    def __init__(self, module: Module, imports: Optional[dict] = None):
        self.m = module
        imports = imports or {}
        self.funcs: list = []
        self.globals: list = []
        self.table: list = []
        self.memory = bytearray()
        self.mem_max: Optional[int] = None

        n_imported_globals = 0
        for imp in module.imports:
            key = (imp.module, imp.name)
            if imp.kind == 0:
                fn = imports.get(key)
                if fn is None:
                    raise WasmError(f"missing function import {key}")
                self.funcs.append(HostFunc(module.types[imp.desc], fn))
            elif imp.kind == 2:
                lo, hi = imp.desc
                self.memory = bytearray(lo * PAGE)
                self.mem_max = hi
            elif imp.kind == 3:
                self.globals.append([imports.get(key, 0)])
                n_imported_globals += 1
            elif imp.kind == 1:
                lo, hi = imp.desc
                self.table = [None] * lo

        n_imported_funcs = len(self.funcs)
        for i, tidx in enumerate(module.func_typeidx):
            ft = module.types[tidx]
            self.funcs.append(_prepare(module, ft, module.codes[i]))

        if module.mem_limits is not None:
            lo, hi = module.mem_limits
            self.memory = bytearray(lo * PAGE)
            self.mem_max = hi
        if module.table_limits is not None:
            lo, hi = module.table_limits
            self.table = [None] * lo

        for g in module.globals:
            self.globals.append([self._const_expr(g.init)])
        for off_expr, funcidxs in module.elems:
            base = self._const_expr(off_expr)
            need = base + len(funcidxs)
            if need > len(self.table):
                raise WasmError("element segment out of table bounds")
            for j, fi in enumerate(funcidxs):
                self.table[base + j] = fi
        for off_expr, data in module.datas:
            if off_expr is None:
                continue
            base = self._const_expr(off_expr)
            if base + len(data) > len(self.memory):
                raise WasmError("data segment out of memory bounds")
            self.memory[base : base + len(data)] = data

        if module.start is not None:
            self.call(module.start, [])

    # -- public API -------------------------------------------------------

    def exported(self, name: str) -> Optional[Callable]:
        exp = self.m.exports.get(name)
        if exp is None or exp[0] != 0:
            return None
        idx = exp[1]
        ft = self.funcs[idx].functype
        # Host boundary convention: integer args are accepted signed or
        # unsigned (masked to the canonical unsigned internal form);
        # integer results come back as SIGNED Python ints (i32/i64
        # two's complement), floats pass through.
        return lambda *args: self._call_ret(idx, _canon_args(ft, args))

    def invoke(self, name: str, *args):
        fn = self.exported(name)
        if fn is None:
            raise WasmError(f"no exported function {name!r}")
        return fn(*args)

    def read_memory(self, ptr: int, n: int) -> bytes:
        if ptr < 0 or n < 0 or ptr + n > len(self.memory):
            raise WasmTrap("out of bounds memory access")
        return bytes(self.memory[ptr : ptr + n])

    def write_memory(self, ptr: int, data: bytes) -> None:
        if ptr < 0 or ptr + len(data) > len(self.memory):
            raise WasmTrap("out of bounds memory access")
        self.memory[ptr : ptr + len(data)] = data

    # -- internals --------------------------------------------------------

    def _const_expr(self, instrs: list):
        stack: list = []
        for op, imm in instrs:
            if op in (0x41, 0x42, 0x43, 0x44):
                stack.append(imm)
            elif op == 0x23:
                stack.append(self.globals[imm][0])
            else:
                raise WasmError(f"unsupported const-expr opcode 0x{op:02x}")
        return stack[-1] if stack else 0

    def _call_ret(self, funcidx: int, args: list):
        ft = self.funcs[funcidx].functype
        res = [
            _s32(v) if t == 0x7F else _s64(v) if t == 0x7E else v
            for t, v in zip(ft.results, self.call(funcidx, args))
        ]
        if not res:
            return None
        return res[0] if len(res) == 1 else tuple(res)

    def call(self, funcidx: int, args: list) -> list:
        f = self.funcs[funcidx]
        if isinstance(f, HostFunc):
            out = f.fn(*args)
            if out is None:
                return []
            return list(out) if isinstance(out, tuple) else [out]
        return self._exec(f, args)

    def _mem_grow(self, pages: int) -> int:
        cur = len(self.memory) // PAGE
        limit = self.mem_max if self.mem_max is not None else 0x10000
        if pages < 0 or cur + pages > limit:
            return _I32  # -1
        self.memory.extend(b"\x00" * (pages * PAGE))
        return cur

    def _exec(self, f: _Prepared, args: list) -> list:  # noqa: C901
        mvals = [_ZERO[vt] for vt in f.locals]
        loc = list(args) + mvals
        code = f.code
        st: list = []
        # control frames: (target_pc, br_arity, stack_height, is_loop_start)
        ctrl: list = [(len(code), len(f.functype.results), 0, None)]
        pc = 0
        mem = self.memory
        while pc < len(code):
            op, imm = code[pc]
            pc += 1
            if op == 0x20:  # local.get
                st.append(loc[imm])
            elif op == 0x21:
                loc[imm] = st.pop()
            elif op == 0x22:
                loc[imm] = st[-1]
            elif op == 0x41 or op == 0x42 or op == 0x43 or op == 0x44:
                st.append(imm)
            elif op == 0x02:  # block
                _, end_pc, pa, ra = imm
                ctrl.append((end_pc + 1, ra, len(st) - pa, None))
            elif op == 0x03:  # loop
                _, end_pc, pa, ra = imm
                ctrl.append((pc - 1, pa, len(st) - pa, pc))
            elif op == 0x04:  # if
                else_pc, end_pc, pa, ra = imm
                cond = st.pop()
                ctrl.append((end_pc + 1, ra, len(st) - pa, None))
                if not cond:
                    pc = (else_pc + 1) if else_pc is not None else end_pc
            elif op == 0x05:  # else reached from then-branch: jump to end
                pc = ctrl[-1][0] - 1
            elif op == 0x0B:  # end
                ctrl.pop()
            elif op == 0x0C or op == 0x0D or op == 0x0E:  # br / br_if / br_table
                if op == 0x0D:
                    if not st.pop():
                        continue
                    depth = imm
                elif op == 0x0E:
                    i = st.pop()
                    targets, default = imm
                    depth = targets[i] if i < len(targets) else default
                else:
                    depth = imm
                target, arity, height, loop_start = ctrl[-1 - depth]
                vals = st[len(st) - arity :] if arity else []
                del st[height:]
                st.extend(vals)
                if loop_start is not None:
                    del ctrl[len(ctrl) - depth :]
                    pc = loop_start
                else:
                    del ctrl[len(ctrl) - depth - 1 :]
                    pc = target
            elif op == 0x0F:  # return
                arity = ctrl[0][1]
                return st[len(st) - arity :] if arity else []
            elif op == 0x10:  # call
                callee = self.funcs[imm]
                ft = callee.functype
                n = len(ft.params)
                cargs = st[len(st) - n :] if n else []
                del st[len(st) - n :]
                st.extend(self.call(imm, cargs))
                mem = self.memory
            elif op == 0x11:  # call_indirect
                i = st.pop()
                if i >= len(self.table) or self.table[i] is None:
                    raise WasmTrap("undefined element")
                fi = self.table[i]
                callee = self.funcs[fi]
                if callee.functype != self.m.types[imm]:
                    raise WasmTrap("indirect call type mismatch")
                n = len(callee.functype.params)
                cargs = st[len(st) - n :] if n else []
                del st[len(st) - n :]
                st.extend(self.call(fi, cargs))
                mem = self.memory
            elif op == 0x1A:  # drop
                st.pop()
            elif op == 0x1B:  # select
                c = st.pop()
                b = st.pop()
                a = st.pop()
                st.append(a if c else b)
            elif op == 0x23:
                st.append(self.globals[imm][0])
            elif op == 0x24:
                self.globals[imm][0] = st.pop()
            elif 0x28 <= op <= 0x35:  # loads
                addr = st.pop() + imm
                try:
                    if op == 0x28:
                        st.append(int.from_bytes(mem[addr : addr + 4], "little")
                                  if addr + 4 <= len(mem) and addr >= 0 else self._oob())
                    elif op == 0x29:
                        st.append(int.from_bytes(self._ld(mem, addr, 8), "little"))
                    elif op == 0x2A:
                        st.append(struct.unpack("<f", self._ld(mem, addr, 4))[0])
                    elif op == 0x2B:
                        st.append(struct.unpack("<d", self._ld(mem, addr, 8))[0])
                    elif op == 0x2C:  # i32.load8_s
                        st.append(struct.unpack("<b", self._ld(mem, addr, 1))[0] & _I32)
                    elif op == 0x2D:
                        st.append(self._ld(mem, addr, 1)[0])
                    elif op == 0x2E:  # i32.load16_s
                        st.append(struct.unpack("<h", self._ld(mem, addr, 2))[0] & _I32)
                    elif op == 0x2F:
                        st.append(int.from_bytes(self._ld(mem, addr, 2), "little"))
                    elif op == 0x30:  # i64.load8_s
                        st.append(struct.unpack("<b", self._ld(mem, addr, 1))[0] & _I64)
                    elif op == 0x31:
                        st.append(self._ld(mem, addr, 1)[0])
                    elif op == 0x32:
                        st.append(struct.unpack("<h", self._ld(mem, addr, 2))[0] & _I64)
                    elif op == 0x33:
                        st.append(int.from_bytes(self._ld(mem, addr, 2), "little"))
                    elif op == 0x34:  # i64.load32_s
                        st.append(struct.unpack("<i", self._ld(mem, addr, 4))[0] & _I64)
                    elif op == 0x35:
                        st.append(int.from_bytes(self._ld(mem, addr, 4), "little"))
                except struct.error:
                    raise WasmTrap("out of bounds memory access")
            elif 0x36 <= op <= 0x3E:  # stores
                v = st.pop()
                addr = st.pop() + imm
                if op == 0x36:
                    self._stb(mem, addr, (v & _I32).to_bytes(4, "little"))
                elif op == 0x37:
                    self._stb(mem, addr, (v & _I64).to_bytes(8, "little"))
                elif op == 0x38:
                    self._stb(mem, addr, struct.pack("<f", _f32r(v)))
                elif op == 0x39:
                    self._stb(mem, addr, struct.pack("<d", v))
                elif op == 0x3A:
                    self._stb(mem, addr, bytes([v & 0xFF]))
                elif op == 0x3B:
                    self._stb(mem, addr, (v & 0xFFFF).to_bytes(2, "little"))
                elif op == 0x3C:
                    self._stb(mem, addr, bytes([v & 0xFF]))
                elif op == 0x3D:
                    self._stb(mem, addr, (v & 0xFFFF).to_bytes(2, "little"))
                elif op == 0x3E:
                    self._stb(mem, addr, (v & _I32).to_bytes(4, "little"))
            elif op == 0x3F:
                st.append(len(mem) // PAGE)
            elif op == 0x40:
                st.append(self._mem_grow(st.pop()))
                mem = self.memory
            elif op == 0x00:
                raise WasmTrap("unreachable")
            elif op == 0x01:
                pass
            else:
                self._numeric(op, st)
        arity = len(f.functype.results)
        return st[len(st) - arity :] if arity else []

    @staticmethod
    def _oob():
        raise WasmTrap("out of bounds memory access")

    @staticmethod
    def _ld(mem: bytearray, addr: int, n: int) -> bytes:
        if addr < 0 or addr + n > len(mem):
            raise WasmTrap("out of bounds memory access")
        return bytes(mem[addr : addr + n])

    @staticmethod
    def _stb(mem: bytearray, addr: int, data: bytes) -> None:
        if addr < 0 or addr + len(data) > len(mem):
            raise WasmTrap("out of bounds memory access")
        mem[addr : addr + len(data)] = data

    def _numeric(self, op: int, st: list) -> None:  # noqa: C901
        # -- i32 compare/arith (0x45-0x78) --
        if op == 0x45:
            st.append(int(st.pop() == 0))
        elif op == 0x46:
            b, a = st.pop(), st.pop(); st.append(int(a == b))
        elif op == 0x47:
            b, a = st.pop(), st.pop(); st.append(int(a != b))
        elif op == 0x48:
            b, a = st.pop(), st.pop(); st.append(int(_s32(a) < _s32(b)))
        elif op == 0x49:
            b, a = st.pop(), st.pop(); st.append(int(a < b))
        elif op == 0x4A:
            b, a = st.pop(), st.pop(); st.append(int(_s32(a) > _s32(b)))
        elif op == 0x4B:
            b, a = st.pop(), st.pop(); st.append(int(a > b))
        elif op == 0x4C:
            b, a = st.pop(), st.pop(); st.append(int(_s32(a) <= _s32(b)))
        elif op == 0x4D:
            b, a = st.pop(), st.pop(); st.append(int(a <= b))
        elif op == 0x4E:
            b, a = st.pop(), st.pop(); st.append(int(_s32(a) >= _s32(b)))
        elif op == 0x4F:
            b, a = st.pop(), st.pop(); st.append(int(a >= b))
        elif op == 0x50:
            st.append(int(st.pop() == 0))
        elif op == 0x51:
            b, a = st.pop(), st.pop(); st.append(int(a == b))
        elif op == 0x52:
            b, a = st.pop(), st.pop(); st.append(int(a != b))
        elif op == 0x53:
            b, a = st.pop(), st.pop(); st.append(int(_s64(a) < _s64(b)))
        elif op == 0x54:
            b, a = st.pop(), st.pop(); st.append(int(a < b))
        elif op == 0x55:
            b, a = st.pop(), st.pop(); st.append(int(_s64(a) > _s64(b)))
        elif op == 0x56:
            b, a = st.pop(), st.pop(); st.append(int(a > b))
        elif op == 0x57:
            b, a = st.pop(), st.pop(); st.append(int(_s64(a) <= _s64(b)))
        elif op == 0x58:
            b, a = st.pop(), st.pop(); st.append(int(a <= b))
        elif op == 0x59:
            b, a = st.pop(), st.pop(); st.append(int(_s64(a) >= _s64(b)))
        elif op == 0x5A:
            b, a = st.pop(), st.pop(); st.append(int(a >= b))
        elif 0x5B <= op <= 0x60:  # f32 comparisons
            b, a = st.pop(), st.pop()
            st.append(int({0x5B: a == b, 0x5C: a != b, 0x5D: a < b,
                           0x5E: a > b, 0x5F: a <= b, 0x60: a >= b}[op]))
        elif 0x61 <= op <= 0x66:  # f64 comparisons
            b, a = st.pop(), st.pop()
            st.append(int({0x61: a == b, 0x62: a != b, 0x63: a < b,
                           0x64: a > b, 0x65: a <= b, 0x66: a >= b}[op]))
        elif op == 0x67:  # i32.clz
            v = st.pop(); st.append(32 - v.bit_length() if v else 32)
        elif op == 0x68:  # i32.ctz
            v = st.pop(); st.append((v & -v).bit_length() - 1 if v else 32)
        elif op == 0x69:
            st.append(bin(st.pop()).count("1"))
        elif op == 0x6A:
            b, a = st.pop(), st.pop(); st.append((a + b) & _I32)
        elif op == 0x6B:
            b, a = st.pop(), st.pop(); st.append((a - b) & _I32)
        elif op == 0x6C:
            b, a = st.pop(), st.pop(); st.append((a * b) & _I32)
        elif op == 0x6D:  # i32.div_s
            b, a = _s32(st.pop()), _s32(st.pop())
            if b == 0:
                raise WasmTrap("integer divide by zero")
            q = _div_trunc(a, b)
            if q == 0x80000000:
                raise WasmTrap("integer overflow")
            st.append(q & _I32)
        elif op == 0x6E:
            b, a = st.pop(), st.pop()
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st.append(a // b)
        elif op == 0x6F:  # i32.rem_s
            b, a = _s32(st.pop()), _s32(st.pop())
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st.append((a - b * _div_trunc(a, b)) & _I32)
        elif op == 0x70:
            b, a = st.pop(), st.pop()
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st.append(a % b)
        elif op == 0x71:
            b, a = st.pop(), st.pop(); st.append(a & b)
        elif op == 0x72:
            b, a = st.pop(), st.pop(); st.append(a | b)
        elif op == 0x73:
            b, a = st.pop(), st.pop(); st.append(a ^ b)
        elif op == 0x74:
            b, a = st.pop(), st.pop(); st.append((a << (b % 32)) & _I32)
        elif op == 0x75:  # i32.shr_s
            b, a = st.pop(), st.pop(); st.append((_s32(a) >> (b % 32)) & _I32)
        elif op == 0x76:
            b, a = st.pop(), st.pop(); st.append(a >> (b % 32))
        elif op == 0x77:  # rotl
            b, a = st.pop() % 32, st.pop()
            st.append(((a << b) | (a >> (32 - b))) & _I32 if b else a)
        elif op == 0x78:  # rotr
            b, a = st.pop() % 32, st.pop()
            st.append(((a >> b) | (a << (32 - b))) & _I32 if b else a)
        # -- i64 arith (0x79-0x8A) --
        elif op == 0x79:
            v = st.pop(); st.append(64 - v.bit_length() if v else 64)
        elif op == 0x7A:
            v = st.pop(); st.append((v & -v).bit_length() - 1 if v else 64)
        elif op == 0x7B:
            st.append(bin(st.pop()).count("1"))
        elif op == 0x7C:
            b, a = st.pop(), st.pop(); st.append((a + b) & _I64)
        elif op == 0x7D:
            b, a = st.pop(), st.pop(); st.append((a - b) & _I64)
        elif op == 0x7E:
            b, a = st.pop(), st.pop(); st.append((a * b) & _I64)
        elif op == 0x7F:
            b, a = _s64(st.pop()), _s64(st.pop())
            if b == 0:
                raise WasmTrap("integer divide by zero")
            q = _div_trunc(a, b)
            if q == 0x8000000000000000:
                raise WasmTrap("integer overflow")
            st.append(q & _I64)
        elif op == 0x80:
            b, a = st.pop(), st.pop()
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st.append(a // b)
        elif op == 0x81:
            b, a = _s64(st.pop()), _s64(st.pop())
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st.append((a - b * _div_trunc(a, b)) & _I64)
        elif op == 0x82:
            b, a = st.pop(), st.pop()
            if b == 0:
                raise WasmTrap("integer divide by zero")
            st.append(a % b)
        elif op == 0x83:
            b, a = st.pop(), st.pop(); st.append(a & b)
        elif op == 0x84:
            b, a = st.pop(), st.pop(); st.append(a | b)
        elif op == 0x85:
            b, a = st.pop(), st.pop(); st.append(a ^ b)
        elif op == 0x86:
            b, a = st.pop(), st.pop(); st.append((a << (b % 64)) & _I64)
        elif op == 0x87:
            b, a = st.pop(), st.pop(); st.append((_s64(a) >> (b % 64)) & _I64)
        elif op == 0x88:
            b, a = st.pop(), st.pop(); st.append(a >> (b % 64))
        elif op == 0x89:
            b, a = st.pop() % 64, st.pop()
            st.append(((a << b) | (a >> (64 - b))) & _I64 if b else a)
        elif op == 0x8A:
            b, a = st.pop() % 64, st.pop()
            st.append(((a >> b) | (a << (64 - b))) & _I64 if b else a)
        # -- f32 (0x8B-0x98) --
        elif op == 0x8B:
            st.append(_f32r(abs(st.pop())))
        elif op == 0x8C:
            v = st.pop(); st.append(_f32r(-v if v == v else math.nan))
        elif op == 0x8D:
            st.append(_f32r(self._ceil(st.pop())))
        elif op == 0x8E:
            st.append(_f32r(self._floor(st.pop())))
        elif op == 0x8F:
            st.append(_f32r(self._truncf(st.pop())))
        elif op == 0x90:
            st.append(_f32r(_nearest(st.pop())))
        elif op == 0x91:
            v = st.pop()
            st.append(_f32r(math.sqrt(v)) if v >= 0 else math.nan)
        elif op == 0x92:
            b, a = st.pop(), st.pop(); st.append(_f32r(a + b))
        elif op == 0x93:
            b, a = st.pop(), st.pop(); st.append(_f32r(a - b))
        elif op == 0x94:
            b, a = st.pop(), st.pop(); st.append(_f32r(a * b))
        elif op == 0x95:
            b, a = st.pop(), st.pop()
            st.append(_f32r(a / b) if b != 0 else (
                math.nan if (a != a or b != b or a == 0) else math.copysign(math.inf, a) * math.copysign(1.0, b)))
        elif op == 0x96:
            b, a = st.pop(), st.pop(); st.append(_f32r(_fmin(a, b)))
        elif op == 0x97:
            b, a = st.pop(), st.pop(); st.append(_f32r(_fmax(a, b)))
        elif op == 0x98:
            b, a = st.pop(), st.pop(); st.append(_f32r(math.copysign(a, b)))
        # -- f64 (0x99-0xA6) --
        elif op == 0x99:
            st.append(abs(st.pop()))
        elif op == 0x9A:
            v = st.pop(); st.append(-v if v == v else math.nan)
        elif op == 0x9B:
            st.append(self._ceil(st.pop()))
        elif op == 0x9C:
            st.append(self._floor(st.pop()))
        elif op == 0x9D:
            st.append(self._truncf(st.pop()))
        elif op == 0x9E:
            st.append(_nearest(st.pop()))
        elif op == 0x9F:
            v = st.pop()
            st.append(math.sqrt(v) if v >= 0 else math.nan)
        elif op == 0xA0:
            b, a = st.pop(), st.pop(); st.append(a + b)
        elif op == 0xA1:
            b, a = st.pop(), st.pop(); st.append(a - b)
        elif op == 0xA2:
            b, a = st.pop(), st.pop(); st.append(a * b)
        elif op == 0xA3:
            b, a = st.pop(), st.pop()
            if b != 0:
                st.append(a / b)
            elif a != a or b != b or a == 0:
                st.append(math.nan)
            else:
                st.append(math.copysign(math.inf, a) * math.copysign(1.0, b))
        elif op == 0xA4:
            b, a = st.pop(), st.pop(); st.append(_fmin(a, b))
        elif op == 0xA5:
            b, a = st.pop(), st.pop(); st.append(_fmax(a, b))
        elif op == 0xA6:
            b, a = st.pop(), st.pop(); st.append(math.copysign(a, b))
        # -- conversions (0xA7-0xC4) --
        elif op == 0xA7:  # i32.wrap_i64
            st.append(st.pop() & _I32)
        elif op == 0xA8:
            st.append(_trunc_checked(st.pop(), -(1 << 31), (1 << 31) - 1) & _I32)
        elif op == 0xA9:
            st.append(_trunc_checked(st.pop(), 0, _I32))
        elif op == 0xAA:
            st.append(_trunc_checked(st.pop(), -(1 << 31), (1 << 31) - 1) & _I32)
        elif op == 0xAB:
            st.append(_trunc_checked(st.pop(), 0, _I32))
        elif op == 0xAC:  # i64.extend_i32_s
            st.append(_s32(st.pop()) & _I64)
        elif op == 0xAD:
            st.append(st.pop())
        elif op == 0xAE:
            st.append(_trunc_checked(st.pop(), -(1 << 63), (1 << 63) - 1) & _I64)
        elif op == 0xAF:
            st.append(_trunc_checked(st.pop(), 0, _I64))
        elif op == 0xB0:
            st.append(_trunc_checked(st.pop(), -(1 << 63), (1 << 63) - 1) & _I64)
        elif op == 0xB1:
            st.append(_trunc_checked(st.pop(), 0, _I64))
        elif op == 0xB2:  # f32.convert_i32_s
            st.append(_f32r(float(_s32(st.pop()))))
        elif op == 0xB3:
            st.append(_f32r(float(st.pop())))
        elif op == 0xB4:
            st.append(_f32r(float(_s64(st.pop()))))
        elif op == 0xB5:
            st.append(_f32r(float(st.pop())))
        elif op == 0xB6:  # f32.demote_f64
            st.append(_f32r(st.pop()))
        elif op == 0xB7:
            st.append(float(_s32(st.pop())))
        elif op == 0xB8:
            st.append(float(st.pop()))
        elif op == 0xB9:
            st.append(float(_s64(st.pop())))
        elif op == 0xBA:
            st.append(float(st.pop()))
        elif op == 0xBB:  # f64.promote_f32
            st.append(float(st.pop()))
        elif op == 0xBC:  # i32.reinterpret_f32
            st.append(struct.unpack("<I", struct.pack("<f", st.pop()))[0])
        elif op == 0xBD:
            st.append(struct.unpack("<Q", struct.pack("<d", st.pop()))[0])
        elif op == 0xBE:
            st.append(struct.unpack("<f", struct.pack("<I", st.pop()))[0])
        elif op == 0xBF:
            st.append(struct.unpack("<d", struct.pack("<Q", st.pop()))[0])
        elif op == 0xC0:  # i32.extend8_s
            self._ext(st, 8, 32)
        elif op == 0xC1:
            self._ext(st, 16, 32)
        elif op == 0xC2:
            self._ext(st, 8, 64)
        elif op == 0xC3:
            self._ext(st, 16, 64)
        elif op == 0xC4:
            self._ext(st, 32, 64)
        # -- 0xFC extensions --
        elif op == 0xFC00:
            st.append(_trunc_sat(st.pop(), -(1 << 31), (1 << 31) - 1) & _I32)
        elif op == 0xFC01:
            st.append(_trunc_sat(st.pop(), 0, _I32))
        elif op == 0xFC02:
            st.append(_trunc_sat(st.pop(), -(1 << 31), (1 << 31) - 1) & _I32)
        elif op == 0xFC03:
            st.append(_trunc_sat(st.pop(), 0, _I32))
        elif op == 0xFC04:
            st.append(_trunc_sat(st.pop(), -(1 << 63), (1 << 63) - 1) & _I64)
        elif op == 0xFC05:
            st.append(_trunc_sat(st.pop(), 0, _I64))
        elif op == 0xFC06:
            st.append(_trunc_sat(st.pop(), -(1 << 63), (1 << 63) - 1) & _I64)
        elif op == 0xFC07:
            st.append(_trunc_sat(st.pop(), 0, _I64))
        elif op == 0xFC0A:  # memory.copy
            n, s, d = st.pop(), st.pop(), st.pop()
            if s + n > len(self.memory) or d + n > len(self.memory):
                raise WasmTrap("out of bounds memory access")
            self.memory[d : d + n] = self.memory[s : s + n]
        elif op == 0xFC0B:  # memory.fill
            n, v, d = st.pop(), st.pop(), st.pop()
            if d + n > len(self.memory):
                raise WasmTrap("out of bounds memory access")
            self.memory[d : d + n] = bytes([v & 0xFF]) * n
        else:
            raise WasmTrap(f"unimplemented opcode 0x{op:02x}")

    @staticmethod
    def _ext(st: list, from_bits: int, to_bits: int) -> None:
        v = st.pop() & ((1 << from_bits) - 1)
        if v & (1 << (from_bits - 1)):
            v -= 1 << from_bits
        st.append(v & (_I32 if to_bits == 32 else _I64))

    @staticmethod
    def _ceil(x: float) -> float:
        if math.isnan(x) or math.isinf(x):
            return x
        r = float(math.ceil(x))
        return math.copysign(r, x) if r == 0.0 else r

    @staticmethod
    def _floor(x: float) -> float:
        if math.isnan(x) or math.isinf(x):
            return x
        r = float(math.floor(x))
        return math.copysign(r, x) if r == 0.0 else r

    @staticmethod
    def _truncf(x: float) -> float:
        if math.isnan(x) or math.isinf(x):
            return x
        r = float(math.trunc(x))
        return math.copysign(r, x) if r == 0.0 else r


def instantiate(binary: bytes, imports: Optional[dict] = None) -> Instance:
    return Instance(parse_module(binary), imports)
