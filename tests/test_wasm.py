"""From-scratch WASM runtime (functions/wasm.py) + the `wasm`
processor (operators/wasm.py) — reference parity with
internal/impl/wasm/processor_wazero{,_test}.go and spec semantics
pinned against the W3C core-spec tables (traps, rounding, saturation).
"""

from __future__ import annotations

import base64
import math

import pytest

from benthos_spark.functions import wasm as W
from benthos_spark.functions.wasm_build import ModuleBuilder
from benthos_spark.functions.wasm_examples import (
    louder_module,
    meta_echo_module,
    uppercase_module,
)
from benthos_spark.operators.wasm import Wasm, _Runner


def _run(params, results, body, args=(), locals_=(), setup=None):
    b = ModuleBuilder()
    if setup:
        setup(b)
    b.add_func("f", list(params), list(results), list(locals_), body, export=True)
    inst = W.instantiate(b.build())
    res = inst.invoke("f", *args)
    if res is None:
        return []
    return list(res) if isinstance(res, tuple) else [res]


# -- integer semantics ---------------------------------------------------------


def test_i32_arith_wraps():
    out = _run(["i32", "i32"], ["i32"], [("local.get", 0), ("local.get", 1), "i32.add"],
               args=(0x7FFFFFFF, 1))
    assert out == [-0x80000000]  # signed wraparound, spec §4.3.2


def test_i32_div_traps():
    body = [("local.get", 0), ("local.get", 1), "i32.div_s"]
    assert _run(["i32", "i32"], ["i32"], body, args=(-7, 2)) == [-3]  # trunc toward 0
    with pytest.raises(W.WasmTrap):
        _run(["i32", "i32"], ["i32"], body, args=(1, 0))
    with pytest.raises(W.WasmTrap):
        _run(["i32", "i32"], ["i32"], body, args=(-0x80000000, -1))  # overflow trap


def test_i64_unsigned_compare_and_rem():
    out = _run(["i64", "i64"], ["i64"], [("local.get", 0), ("local.get", 1), "i64.rem_s"],
               args=(-7, 2))
    assert out == [-1]  # sign follows dividend
    out = _run([], ["i32"], [("i64.const", -1), ("i64.const", 1), "i64.gt_u"])
    assert out == [1]  # -1 is max u64


def test_i32_rotl_clz_popcnt():
    assert _run([], ["i32"], [("i32.const", 0x10), "i32.clz"]) == [27]
    assert _run([], ["i32"], [("i32.const", 0), "i32.ctz"]) == [32]
    assert _run([], ["i32"], [("i32.const", 0xF0F0), "i32.popcnt"]) == [8]
    assert _run([], ["i32"], [("i32.const", 1), ("i32.const", 33), "i32.rotl"]) == [2]


def test_sign_extension_ops():
    assert _run([], ["i32"], [("i32.const", 0x80), "i32.extend8_s"]) == [-128]
    assert _run([], ["i32"], [("i32.const", 0x8000), "i32.extend16_s"]) == [-32768]
    assert _run([], ["i64"], [("i64.const", 0xFFFFFFFF), "i64.extend32_s"]) == [-1]


# -- float semantics -----------------------------------------------------------


def test_f32_rerounds_after_every_op():
    # 0.1 + 0.2 in f32 differs from the f64 sum; the interpreter must
    # re-round to single precision (spec: f32 ops compute in f32).
    import struct

    out = _run([], ["f32"], [("f32.const", 0.1), ("f32.const", 0.2), "f32.add"])
    expected = struct.unpack("<f", struct.pack("<f",
        struct.unpack("<f", struct.pack("<f", 0.1))[0]
        + struct.unpack("<f", struct.pack("<f", 0.2))[0]))[0]
    assert out == [expected]


def test_trunc_traps_and_saturates():
    with pytest.raises(W.WasmTrap):
        _run([], ["i32"], [("f64.const", 1e30), "i32.trunc_f64_s"])
    with pytest.raises(W.WasmTrap):
        _run([], ["i32"], [("f64.const", float("nan")), "i32.trunc_f64_s"])
    assert _run([], ["i32"], [("f64.const", 1e30), "i32.trunc_sat_f64_s"]) == [0x7FFFFFFF]
    assert _run([], ["i32"], [("f64.const", float("nan")), "i32.trunc_sat_f64_s"]) == [0]
    assert _run([], ["i32"], [("f64.const", -1e30), "i32.trunc_sat_f64_s"]) == [-0x80000000]


def test_nearest_ties_to_even():
    assert _run([], ["f64"], [("f64.const", 2.5), "f64.nearest"]) == [2.0]
    assert _run([], ["f64"], [("f64.const", 3.5), "f64.nearest"]) == [4.0]
    assert _run([], ["f64"], [("f64.const", -0.5), "f64.nearest"]) == [-0.0]


def test_min_max_nan_propagation():
    import math

    out = _run([], ["f64"], [("f64.const", 1.0), ("f64.const", float("nan")), "f64.min"])
    assert math.isnan(out[0])
    # min(-0, +0) is -0 per spec
    out = _run([], ["f64"], [("f64.const", -0.0), ("f64.const", 0.0), "f64.min"])
    assert out == [0.0] and math.copysign(1, out[0]) == -1


# -- control flow --------------------------------------------------------------


def test_loop_br_if_sums():
    # sum 1..n with a loop
    body = [
        ("block", "empty"),
        ("loop", "empty"),
        ("local.get", 0), "i32.eqz", ("br_if", 1),
        ("local.get", 1), ("local.get", 0), "i32.add", ("local.set", 1),
        ("local.get", 0), ("i32.const", 1), "i32.sub", ("local.set", 0),
        ("br", 0),
        "end", "end",
        ("local.get", 1),
    ]
    assert _run(["i32"], ["i32"], body, args=(100,), locals_=["i32"]) == [5050]


def test_br_table_dispatch():
    body = [
        ("block", "empty"), ("block", "empty"), ("block", "empty"),
        ("local.get", 0), ("br_table", [0, 1], 2),
        "end", ("i32.const", 10), "return",
        "end", ("i32.const", 20), "return",
        "end", ("i32.const", 30),
    ]
    assert _run(["i32"], ["i32"], body, args=(0,)) == [10]
    assert _run(["i32"], ["i32"], body, args=(1,)) == [20]
    assert _run(["i32"], ["i32"], body, args=(7,)) == [30]  # default


def test_if_else_with_result():
    body = [
        ("local.get", 0),
        ("if", "i32"), ("i32.const", 1), "else", ("i32.const", 2), "end",
    ]
    assert _run(["i32"], ["i32"], body, args=(5,)) == [1]
    assert _run(["i32"], ["i32"], body, args=(0,)) == [2]


def test_unreachable_traps():
    with pytest.raises(W.WasmTrap):
        _run([], [], ["unreachable"])


def test_call_and_call_indirect():
    b = ModuleBuilder()
    sq = b.add_func("sq", ["i32"], ["i32"],
                    [], [("local.get", 0), ("local.get", 0), "i32.mul"])
    dbl = b.add_func("dbl", ["i32"], ["i32"],
                     [], [("local.get", 0), ("i32.const", 2), "i32.mul"])
    b.add_table(2, [sq, dbl])
    ti = b._typeidx(["i32"], ["i32"])
    b.add_func("apply", ["i32", "i32"], ["i32"], [], [
        ("local.get", 1), ("local.get", 0), ("call_indirect", ti),
    ], export=True)
    b.add_func("via_call", ["i32"], ["i32"], [], [
        ("local.get", 0), ("call", sq),
    ], export=True)
    inst = W.instantiate(b.build())
    assert inst.invoke("apply", 0, 7) == 49
    assert inst.invoke("apply", 1, 7) == 14
    assert inst.invoke("via_call", 9) == 81
    with pytest.raises(W.WasmTrap):
        inst.invoke("apply", 5, 1)  # table OOB


def test_call_indirect_signature_mismatch_traps():
    b = ModuleBuilder()
    noarg = b.add_func("n", [], ["i32"], [], [("i32.const", 3)])
    b.add_table(1, [noarg])
    ti = b._typeidx(["i32"], ["i32"])  # wrong signature at the call site
    b.add_func("f", [], ["i32"], [], [
        ("i32.const", 1), ("i32.const", 0), ("call_indirect", ti),
    ], export=True)
    inst = W.instantiate(b.build())
    with pytest.raises(W.WasmTrap):
        inst.invoke("f")


# -- memory --------------------------------------------------------------------


def _mem_setup(b: ModuleBuilder):
    b.add_memory(1)


def test_memory_load_store_and_oob():
    body = [
        ("i32.const", 16), ("local.get", 0), ("i32.store", 0),
        ("i32.const", 16), ("i32.load", 0),
    ]
    assert _run(["i32"], ["i32"], body, args=(-123,), setup=_mem_setup) == [-123]
    with pytest.raises(W.WasmTrap):
        _run([], ["i32"], [("i32.const", W.PAGE - 2), ("i32.load", 0)],
             setup=_mem_setup)


def test_memory_grow_size_fill_copy():
    b = ModuleBuilder()
    b.add_memory(1)
    b.add_func("f", [], ["i32", "i32"], [], [
        ("i32.const", 1), "memory.grow", "drop",
        ("i32.const", 0), ("i32.const", 0xAB), ("i32.const", 8), "memory.fill",
        ("i32.const", 100), ("i32.const", 0), ("i32.const", 8), "memory.copy",
        ("i32.const", 104), ("i32.load", 0),
        "memory.size",
    ], export=True)
    inst = W.instantiate(b.build())
    val, pages = inst.invoke("f")
    assert val == -0x54545455  # 0xABABABAB as signed i32
    assert pages == 2


def test_load8_store16_variants():
    body = [
        ("i32.const", 0), ("i32.const", 0x1FF), ("i32.store16", 0),
        ("i32.const", 0), ("i32.load8_u", 0),        # low byte 0xFF
        ("i32.const", 0), ("i32.load8_s", 0),        # sign-extended
        "i32.add",
    ]
    assert _run([], ["i32"], body, setup=_mem_setup) == [0xFF - 1]


def test_data_segment_and_globals():
    b = ModuleBuilder()
    b.add_memory(1)
    b.add_data(8, b"\x2a\x00\x00\x00")
    g = b.add_global("i32", mutable=True, init=5)
    b.add_func("f", [], ["i32"], [], [
        ("global.get", g), ("i32.const", 8), ("i32.load", 0), "i32.add",
        ("global.set", g), ("global.get", g),
    ], export=True)
    inst = W.instantiate(b.build())
    assert inst.invoke("f") == 47
    assert inst.invoke("f") == 89  # global persisted across calls


# -- module-level errors -------------------------------------------------------


def test_unsupported_simd_rejected():
    b = ModuleBuilder()
    b.add_func("f", [], [], [], ["nop"], export=True)
    binary = bytearray(b.build())
    # splice a SIMD opcode into the code body: locate 'nop end' tail
    idx = binary.rfind(bytes([0x01, 0x0B]))
    binary[idx] = 0xFD
    with pytest.raises(W.WasmError):
        inst = W.instantiate(bytes(binary))
        inst.invoke("f")


def test_missing_export_and_import():
    b = ModuleBuilder()
    b.add_func("f", [], [], [], ["nop"], export=True)
    inst = W.instantiate(b.build())
    assert inst.exported("nope") is None
    b2 = ModuleBuilder()
    b2.import_func("other_mod", "fn", [], [])
    b2.add_func("f", [], [], [], ["nop"], export=True)
    with pytest.raises((W.WasmError, ValueError)):
        _Runner(b2.build(), "f")


# -- example modules: reference-test parity ------------------------------------
# processor_wazero_test.go pins "HELLO WORLD" (Go/tinygo malloc-free
# convention) and "hello world!!!!111!!11!" (Rust allocate/deallocate).


def test_uppercase_reference_parity_repeated():
    r = _Runner(uppercase_module(), "process")
    for i in range(50):
        msg = f"hello world {i}".encode()
        content, meta, err = r.run(msg, {})
        assert err is None
        assert content == msg.upper()


def test_louder_reference_parity():
    r = _Runner(louder_module(), "process")
    content, meta, err = r.run(b"hello world", {})
    assert err is None
    assert content == b"hello world!!!!111!!11!"


def test_meta_roundtrip():
    r = _Runner(meta_echo_module(), "process")
    content, meta, err = r.run(b"x", {"foo": "bar"})
    assert err is None
    assert meta.get("seen") == "yes"
    assert meta.get("foo") == "bar"


def test_trap_becomes_message_error_not_crash():
    b = ModuleBuilder()
    b.add_memory(1)
    _bump_alloc(b)
    b.add_func("process", [], [], [], ["unreachable"], export=True)
    r = _Runner(b.build(), "process")
    content, meta, err = r.run(b"payload", {})
    assert content == b"payload"  # unchanged, like funcErr -> SetError
    assert err is not None and "unreachable" in err


def _bump_alloc(b: ModuleBuilder):
    g = b.add_global("i32", mutable=True, init=65536)
    b.add_func("malloc", ["i32"], ["i32"], ["i32"], [
        ("global.get", g), ("local.set", 1),
        ("global.get", g), ("local.get", 0), "i32.add", ("global.set", g),
        ("local.get", 1),
    ], export=True)
    b.add_func("free", ["i32"], [], [], [], export=True)


# -- Spark processor -----------------------------------------------------------


def test_wasm_processor_spark(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"alpha")), (2, bytearray(b"Beta Two"))],
        "i int, value binary",
    )
    out = Wasm(module_bytes=uppercase_module())(df)
    rows = {r.i: r for r in out.collect()}
    assert bytes(rows[1].value) == b"ALPHA"
    assert bytes(rows[2].value) == b"BETA TWO"
    assert rows[1]._error is None


def test_wasm_processor_config_wired(spark):
    from benthos_spark.config import ConfigError, _proc

    proc = _proc(
        {"wasm": {
            "module_bytes_b64": base64.b64encode(louder_module()).decode(),
        }},
    )
    df = spark.createDataFrame([(bytearray(b"hello world"),)], "value binary")
    out = proc(df).collect()
    assert bytes(out[0].value) == b"hello world!!!!111!!11!"

    with pytest.raises(ConfigError):
        _proc({"wasm": {}})


def test_runner_reinstantiates_past_memory_watermark(monkeypatch):
    """Arena allocators grow linear memory monotonically; a long-lived
    runner must reinstantiate past the watermark instead of letting a
    worker's memory grow without bound."""
    import benthos_spark.operators.wasm as OW

    monkeypatch.setattr(OW, "_MEMORY_WATERMARK_BYTES", 4 * W.PAGE)
    r = _Runner(uppercase_module(), "process")
    for i in range(200):
        content, _, err = r.run(b"x" * 3000, {})
        assert err is None and content == b"X" * 3000
        assert len(r.inst.memory) <= 5 * W.PAGE  # watermark + one grow


# -- randomized differential ALU check ------------------------------------------
# hypothesis drives random (op, a, b) triples through a one-function
# module; the expected value is computed by an INDEPENDENT two's-
# complement model in this test (spec §4.3.2 integer ops).

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

_I32_OPS = {
    "i32.add": lambda a, b: (a + b) & 0xFFFFFFFF,
    "i32.sub": lambda a, b: (a - b) & 0xFFFFFFFF,
    "i32.mul": lambda a, b: (a * b) & 0xFFFFFFFF,
    "i32.and": lambda a, b: a & b,
    "i32.or": lambda a, b: a | b,
    "i32.xor": lambda a, b: a ^ b,
    "i32.shl": lambda a, b: (a << (b % 32)) & 0xFFFFFFFF,
    "i32.shr_u": lambda a, b: a >> (b % 32),
    "i32.rotl": lambda a, b: ((a << (b % 32)) | (a >> ((32 - b) % 32)))
    & 0xFFFFFFFF if b % 32 else a,
    "i32.eq": lambda a, b: int(a == b),
    "i32.lt_u": lambda a, b: int(a < b),
    "i32.gt_s": lambda a, b: int(_sgn32(a) > _sgn32(b)),
}


def _sgn32(v):
    return v - 0x100000000 if v & 0x80000000 else v


if _HAVE_HYP:

    @settings(max_examples=300, deadline=None)
    @given(
        op=st.sampled_from(sorted(_I32_OPS)),
        a=st.integers(min_value=0, max_value=0xFFFFFFFF),
        b=st.integers(min_value=0, max_value=0xFFFFFFFF),
    )
    def test_i32_alu_differential(op, a, b):
        got = _run([], ["i32"], [
            ("i32.const", _sgn32(a)), ("i32.const", _sgn32(b)), op,
        ])[0]
        want = _sgn32(_I32_OPS[op](a, b))
        assert got == want, (op, a, b, got, want)

    @settings(max_examples=200, deadline=None)
    @given(
        a=st.integers(min_value=-(2**63), max_value=2**63 - 1),
        b=st.integers(min_value=-(2**63), max_value=2**63 - 1),
        op=st.sampled_from(["i64.add", "i64.sub", "i64.mul", "i64.xor"]),
    )
    def test_i64_alu_differential(a, b, op):
        got = _run([], ["i64"], [("i64.const", a), ("i64.const", b), op])[0]
        mask = 0xFFFFFFFFFFFFFFFF
        ua, ub = a & mask, b & mask
        fn = {"i64.add": ua + ub, "i64.sub": ua - ub,
              "i64.mul": ua * ub, "i64.xor": ua ^ ub}[op] & mask
        want = fn - 0x10000000000000000 if fn >> 63 else fn
        assert got == want, (op, a, b, got, want)

    @settings(max_examples=200, deadline=None)
    @given(
        a=st.floats(allow_nan=False, allow_infinity=False, width=64),
        b=st.floats(allow_nan=False, allow_infinity=False, width=64),
        op=st.sampled_from(["f64.add", "f64.sub", "f64.mul"]),
    )
    def test_f64_alu_differential(a, b, op):
        got = _run([], ["f64"], [("f64.const", a), ("f64.const", b), op])[0]
        want = {"f64.add": a + b, "f64.sub": a - b, "f64.mul": a * b}[op]
        assert (got == want) or (math.isnan(got) and math.isnan(want)), (
            op, a, b, got, want)



def test_wasm_processor_string_column(spark):
    """String content columns ride as UTF-8 bytes and come back as
    string — the column type stays stable through the processor."""
    df = spark.createDataFrame([("hello",), ("world",)], "value string")
    out = Wasm(module_bytes=uppercase_module())(df)
    assert dict(out.dtypes)["value"] == "string"
    assert sorted(r.value for r in out.collect()) == ["HELLO", "WORLD"]


def test_wasi_shim_fd_write_and_random():
    """Modules built with -target=wasi import wasi_snapshot_preview1;
    the shim must satisfy fd_write (count bytes, discard) and
    random_get (deterministic bytes — exactly-once redelivery must
    reproduce payloads)."""
    b = ModuleBuilder()
    fd_write = b.import_func(
        "wasi_snapshot_preview1", "fd_write",
        ["i32", "i32", "i32", "i32"], ["i32"])
    random_get = b.import_func(
        "wasi_snapshot_preview1", "random_get", ["i32", "i32"], ["i32"])
    b.add_memory(1)
    b.add_data(1024, b"hi")
    # iovec at 16: base=1024, len=2; nwritten at 24
    b.add_func("go", [], ["i32", "i32", "i32", "i32"], [], [
        ("i32.const", 16), ("i32.const", 1024), ("i32.store", 0),
        ("i32.const", 20), ("i32.const", 2), ("i32.store", 0),
        ("i32.const", 1), ("i32.const", 16), ("i32.const", 1),
        ("i32.const", 24), ("call", fd_write),
        ("i32.const", 24), ("i32.load", 0),
        ("i32.const", 64), ("i32.const", 8), ("call", random_get),
        ("i32.const", 64), ("i32.load", 0),
    ], export=True)
    binary = b.build()

    # _Runner requires malloc; bypass by instantiating with the wasi
    # imports only (module has no benthos imports)
    import benthos_spark.operators.wasm as OW
    from benthos_spark.functions import wasm as W2

    runner = object.__new__(OW._Runner)
    module = W2.parse_module(binary)
    imports = {("wasi_snapshot_preview1", i.name): runner._wasi_fn(i.name)
               for i in module.imports}
    runner.inst = W2.Instance(module, imports)
    errno, nwritten, errno2, rand_word = runner.inst.invoke("go")
    assert errno == 0 and nwritten == 2 and errno2 == 0
    # deterministic: a second instance reads identical "random" bytes
    runner2 = object.__new__(OW._Runner)
    module2 = W2.parse_module(binary)
    imports2 = {("wasi_snapshot_preview1", i.name): runner2._wasi_fn(i.name)
                for i in module2.imports}
    runner2.inst = W2.Instance(module2, imports2)
    assert runner2.inst.invoke("go")[3] == rand_word
