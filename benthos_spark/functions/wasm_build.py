"""Tiny WebAssembly module assembler (spec §5 binary format, emit side).

Companion to functions/wasm.py: lets tests and pipelines author modules
as symbolic instruction lists instead of shipping opaque .wasm blobs —
the same role the reference's public/wasm examples + tinygo build.sh
play for its wazero processor (internal/impl/wasm/build.sh). Everything
here is emitted straight from the public spec's opcode table.

Usage:

    b = ModuleBuilder()
    b.import_func("benthos_wasm", "v0_msg_as_bytes", [], ["i64"])
    b.add_memory(1)
    b.add_global("i32", mutable=True, init=65536)     # bump allocator
    b.add_func("malloc", ["i32"], ["i32"], [], [
        ("global.get", 0), ("local.get", 0), "i32.add", ("global.set", 0),
        ("global.get", 0), ("local.get", 0), "i32.sub",
    ], export=True)
    wasm_bytes = b.build()
"""

from __future__ import annotations

import io
import struct
from typing import Optional

VALTYPE = {"i32": 0x7F, "i64": 0x7E, "f32": 0x7D, "f64": 0x7C}

# opcode table, spec index — names match the text format
OP = {
    "unreachable": 0x00, "nop": 0x01, "block": 0x02, "loop": 0x03,
    "if": 0x04, "else": 0x05, "end": 0x0B, "br": 0x0C, "br_if": 0x0D,
    "br_table": 0x0E, "return": 0x0F, "call": 0x10, "call_indirect": 0x11,
    "drop": 0x1A, "select": 0x1B,
    "local.get": 0x20, "local.set": 0x21, "local.tee": 0x22,
    "global.get": 0x23, "global.set": 0x24,
    "i32.load": 0x28, "i64.load": 0x29, "f32.load": 0x2A, "f64.load": 0x2B,
    "i32.load8_s": 0x2C, "i32.load8_u": 0x2D, "i32.load16_s": 0x2E,
    "i32.load16_u": 0x2F, "i64.load8_s": 0x30, "i64.load8_u": 0x31,
    "i64.load16_s": 0x32, "i64.load16_u": 0x33, "i64.load32_s": 0x34,
    "i64.load32_u": 0x35,
    "i32.store": 0x36, "i64.store": 0x37, "f32.store": 0x38,
    "f64.store": 0x39, "i32.store8": 0x3A, "i32.store16": 0x3B,
    "i64.store8": 0x3C, "i64.store16": 0x3D, "i64.store32": 0x3E,
    "memory.size": 0x3F, "memory.grow": 0x40,
    "i32.const": 0x41, "i64.const": 0x42, "f32.const": 0x43, "f64.const": 0x44,
    "i32.eqz": 0x45, "i32.eq": 0x46, "i32.ne": 0x47, "i32.lt_s": 0x48,
    "i32.lt_u": 0x49, "i32.gt_s": 0x4A, "i32.gt_u": 0x4B, "i32.le_s": 0x4C,
    "i32.le_u": 0x4D, "i32.ge_s": 0x4E, "i32.ge_u": 0x4F,
    "i64.eqz": 0x50, "i64.eq": 0x51, "i64.ne": 0x52, "i64.lt_s": 0x53,
    "i64.lt_u": 0x54, "i64.gt_s": 0x55, "i64.gt_u": 0x56, "i64.le_s": 0x57,
    "i64.le_u": 0x58, "i64.ge_s": 0x59, "i64.ge_u": 0x5A,
    "f32.eq": 0x5B, "f32.ne": 0x5C, "f32.lt": 0x5D, "f32.gt": 0x5E,
    "f32.le": 0x5F, "f32.ge": 0x60,
    "f64.eq": 0x61, "f64.ne": 0x62, "f64.lt": 0x63, "f64.gt": 0x64,
    "f64.le": 0x65, "f64.ge": 0x66,
    "i32.clz": 0x67, "i32.ctz": 0x68, "i32.popcnt": 0x69, "i32.add": 0x6A,
    "i32.sub": 0x6B, "i32.mul": 0x6C, "i32.div_s": 0x6D, "i32.div_u": 0x6E,
    "i32.rem_s": 0x6F, "i32.rem_u": 0x70, "i32.and": 0x71, "i32.or": 0x72,
    "i32.xor": 0x73, "i32.shl": 0x74, "i32.shr_s": 0x75, "i32.shr_u": 0x76,
    "i32.rotl": 0x77, "i32.rotr": 0x78,
    "i64.clz": 0x79, "i64.ctz": 0x7A, "i64.popcnt": 0x7B, "i64.add": 0x7C,
    "i64.sub": 0x7D, "i64.mul": 0x7E, "i64.div_s": 0x7F, "i64.div_u": 0x80,
    "i64.rem_s": 0x81, "i64.rem_u": 0x82, "i64.and": 0x83, "i64.or": 0x84,
    "i64.xor": 0x85, "i64.shl": 0x86, "i64.shr_s": 0x87, "i64.shr_u": 0x88,
    "i64.rotl": 0x89, "i64.rotr": 0x8A,
    "f32.abs": 0x8B, "f32.neg": 0x8C, "f32.ceil": 0x8D, "f32.floor": 0x8E,
    "f32.trunc": 0x8F, "f32.nearest": 0x90, "f32.sqrt": 0x91, "f32.add": 0x92,
    "f32.sub": 0x93, "f32.mul": 0x94, "f32.div": 0x95, "f32.min": 0x96,
    "f32.max": 0x97, "f32.copysign": 0x98,
    "f64.abs": 0x99, "f64.neg": 0x9A, "f64.ceil": 0x9B, "f64.floor": 0x9C,
    "f64.trunc": 0x9D, "f64.nearest": 0x9E, "f64.sqrt": 0x9F, "f64.add": 0xA0,
    "f64.sub": 0xA1, "f64.mul": 0xA2, "f64.div": 0xA3, "f64.min": 0xA4,
    "f64.max": 0xA5, "f64.copysign": 0xA6,
    "i32.wrap_i64": 0xA7, "i32.trunc_f32_s": 0xA8, "i32.trunc_f32_u": 0xA9,
    "i32.trunc_f64_s": 0xAA, "i32.trunc_f64_u": 0xAB,
    "i64.extend_i32_s": 0xAC, "i64.extend_i32_u": 0xAD,
    "i64.trunc_f32_s": 0xAE, "i64.trunc_f32_u": 0xAF,
    "i64.trunc_f64_s": 0xB0, "i64.trunc_f64_u": 0xB1,
    "f32.convert_i32_s": 0xB2, "f32.convert_i32_u": 0xB3,
    "f32.convert_i64_s": 0xB4, "f32.convert_i64_u": 0xB5,
    "f32.demote_f64": 0xB6,
    "f64.convert_i32_s": 0xB7, "f64.convert_i32_u": 0xB8,
    "f64.convert_i64_s": 0xB9, "f64.convert_i64_u": 0xBA,
    "f64.promote_f32": 0xBB,
    "i32.reinterpret_f32": 0xBC, "i64.reinterpret_f64": 0xBD,
    "f32.reinterpret_i32": 0xBE, "f64.reinterpret_i64": 0xBF,
    "i32.extend8_s": 0xC0, "i32.extend16_s": 0xC1, "i64.extend8_s": 0xC2,
    "i64.extend16_s": 0xC3, "i64.extend32_s": 0xC4,
}

_FC = {
    "i32.trunc_sat_f32_s": 0, "i32.trunc_sat_f32_u": 1,
    "i32.trunc_sat_f64_s": 2, "i32.trunc_sat_f64_u": 3,
    "i64.trunc_sat_f32_s": 4, "i64.trunc_sat_f32_u": 5,
    "i64.trunc_sat_f64_s": 6, "i64.trunc_sat_f64_u": 7,
    "memory.copy": 10, "memory.fill": 11,
}

_BLOCK = {"block", "loop", "if"}
_IDX_IMM = {"br", "br_if", "call", "local.get", "local.set", "local.tee",
            "global.get", "global.set"}
_MEM = set(range(0x28, 0x3F))


def uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not b & 0x40) or (n == -1 and b & 0x40):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


def assemble(instrs: list) -> bytes:
    """Symbolic instruction list → code bytes (without the final end).

    Each entry is either an opcode name string (no immediate) or a
    tuple ``(name, imm...)``. Block instructions take a blocktype:
    "empty" or a valtype name. Memory ops take (offset,) or
    (align, offset)."""
    out = io.BytesIO()
    for ins in instrs:
        if isinstance(ins, str):
            name, args = ins, ()
        else:
            name, *args = ins
        if name in _FC:
            out.write(b"\xfc" + uleb(_FC[name]))
            if name == "memory.copy":
                out.write(b"\x00\x00")
            elif name == "memory.fill":
                out.write(b"\x00")
            continue
        op = OP[name]
        out.write(bytes([op]))
        if name in _BLOCK:
            bt = args[0] if args else "empty"
            out.write(b"\x40" if bt == "empty" else bytes([VALTYPE[bt]]))
        elif name in _IDX_IMM:
            out.write(uleb(args[0]))
        elif name == "br_table":
            targets, default = args
            out.write(uleb(len(targets)))
            for t in targets:
                out.write(uleb(t))
            out.write(uleb(default))
        elif name == "call_indirect":
            out.write(uleb(args[0]) + b"\x00")
        elif name == "i32.const":
            out.write(sleb(args[0]))
        elif name == "i64.const":
            out.write(sleb(args[0]))
        elif name == "f32.const":
            out.write(struct.pack("<f", args[0]))
        elif name == "f64.const":
            out.write(struct.pack("<d", args[0]))
        elif op in _MEM:
            if len(args) == 2:
                align, offset = args
            else:
                align, offset = 0, (args[0] if args else 0)
            out.write(uleb(align) + uleb(offset))
        elif name in ("memory.size", "memory.grow"):
            out.write(b"\x00")
    return out.getvalue()


class ModuleBuilder:
    def __init__(self):
        self.types: list = []
        self.imports: list = []  # (mod, name, typeidx)
        self.funcs: list = []  # (typeidx, locals, body, name|None)
        self.mem: Optional[tuple] = None
        self.globals: list = []  # (valtype, mut, init_instr)
        self.exports: list = []  # (name, kind, idx)
        self.table: Optional[int] = None
        self.elems: list = []  # (offset, [funcidx])
        self.datas: list = []  # (offset, bytes)
        self.start: Optional[int] = None

    def _typeidx(self, params: list, results: list) -> int:
        key = (tuple(VALTYPE[p] for p in params), tuple(VALTYPE[r] for r in results))
        if key not in self.types:
            self.types.append(key)
        return self.types.index(key)

    def import_func(self, module: str, name: str, params: list, results: list) -> int:
        if self.funcs:
            raise ValueError("declare all imports before local functions")
        self.imports.append((module, name, self._typeidx(params, results)))
        return len(self.imports) - 1

    def add_func(self, name: Optional[str], params: list, results: list,
                 locals_: list, body: list, export: bool = False) -> int:
        idx = len(self.imports) + len(self.funcs)
        self.funcs.append((self._typeidx(params, results),
                           [VALTYPE[t] for t in locals_], assemble(body)))
        if export and name:
            self.exports.append((name, 0, idx))
        return idx

    def add_memory(self, min_pages: int, max_pages: Optional[int] = None,
                   export: Optional[str] = "memory") -> None:
        self.mem = (min_pages, max_pages)
        if export:
            self.exports.append((export, 2, 0))

    def add_global(self, valtype: str, mutable: bool, init) -> int:
        self.globals.append((VALTYPE[valtype], mutable, init))
        return len(self.globals) - 1

    def add_table(self, size: int, funcidxs: list) -> None:
        self.table = size
        self.elems.append((0, funcidxs))

    def add_data(self, offset: int, data: bytes) -> None:
        self.datas.append((offset, data))

    def export_func(self, name: str, idx: int) -> None:
        self.exports.append((name, 0, idx))

    def build(self) -> bytes:
        def section(sid: int, body: bytes) -> bytes:
            return bytes([sid]) + uleb(len(body)) + body

        out = io.BytesIO()
        out.write(b"\x00asm\x01\x00\x00\x00")

        body = uleb(len(self.types))
        for params, results in self.types:
            body += b"\x60" + uleb(len(params)) + bytes(params)
            body += uleb(len(results)) + bytes(results)
        out.write(section(1, body))

        if self.imports:
            body = uleb(len(self.imports))
            for mod, name, tidx in self.imports:
                body += uleb(len(mod.encode())) + mod.encode()
                body += uleb(len(name.encode())) + name.encode()
                body += b"\x00" + uleb(tidx)
            out.write(section(2, body))

        if self.funcs:
            body = uleb(len(self.funcs))
            for tidx, _, _ in self.funcs:
                body += uleb(tidx)
            out.write(section(3, body))

        if self.table is not None:
            out.write(section(4, uleb(1) + b"\x70\x00" + uleb(self.table)))

        if self.mem is not None:
            lo, hi = self.mem
            if hi is None:
                out.write(section(5, uleb(1) + b"\x00" + uleb(lo)))
            else:
                out.write(section(5, uleb(1) + b"\x01" + uleb(lo) + uleb(hi)))

        if self.globals:
            body = uleb(len(self.globals))
            for vt, mut, init in self.globals:
                const_op = {0x7F: "i32.const", 0x7E: "i64.const",
                            0x7D: "f32.const", 0x7C: "f64.const"}[vt]
                body += bytes([vt, int(mut)]) + assemble([(const_op, init)]) + b"\x0b"
            out.write(section(6, body))

        if self.exports:
            body = uleb(len(self.exports))
            for name, kind, idx in self.exports:
                body += uleb(len(name.encode())) + name.encode()
                body += bytes([kind]) + uleb(idx)
            out.write(section(7, body))

        if self.start is not None:
            out.write(section(8, uleb(self.start)))

        if self.elems:
            body = uleb(len(self.elems))
            for offset, funcidxs in self.elems:
                body += b"\x00" + assemble([("i32.const", offset)]) + b"\x0b"
                body += uleb(len(funcidxs))
                for fi in funcidxs:
                    body += uleb(fi)
            out.write(section(9, body))

        if self.funcs:
            body = uleb(len(self.funcs))
            for tidx, locals_, code in self.funcs:
                groups = []
                for vt in locals_:
                    if groups and groups[-1][1] == vt:
                        groups[-1][0] += 1
                    else:
                        groups.append([1, vt])
                entry = uleb(len(groups))
                for cnt, vt in groups:
                    entry += uleb(cnt) + bytes([vt])
                entry += code + b"\x0b"
                body += uleb(len(entry)) + entry
            out.write(section(10, body))

        if self.datas:
            body = uleb(len(self.datas))
            for offset, data in self.datas:
                body += b"\x00" + assemble([("i32.const", offset)]) + b"\x0b"
                body += uleb(len(data)) + data
            out.write(section(11, body))

        return out.getvalue()
