"""Hand-assembled WASM example modules for the `wasm` processor.

These mirror the reference's compiled test modules (uppercase.wasm from
public/wasm/examples/tinygo via build.sh — Go malloc/free convention —
and louder.wasm from the Rust example — allocate/deallocate convention,
internal/impl/wasm/processor_wazero_test.go:18-110). Since this
environment has no wasm toolchain, the modules are assembled from
symbolic instructions with functions/wasm_build.py; they exercise the
exact host-ABI surface the reference's examples do.

Memory layout convention in all three: static data below 1024, bump
heap from 65536 (page 1), growing the memory as needed.
"""

from __future__ import annotations

from benthos_spark.functions.wasm_build import ModuleBuilder

_HEAP_BASE = 65536


def _add_bump_allocator(b: ModuleBuilder, names: tuple) -> None:
    """alloc(n) -> ptr with 8-byte alignment + on-demand memory.grow;
    free is a no-op (arena semantics are fine: the processor resets no
    state between calls and inbound buffers are tiny)."""
    bump = b.add_global("i32", mutable=True, init=_HEAP_BASE)
    alloc_name, free_name = names
    b.add_func(alloc_name, ["i32"], ["i32"], ["i32"], [
        ("global.get", bump), ("local.set", 1),
        ("global.get", bump), ("local.get", 0), "i32.add",
        ("i32.const", 7), "i32.add", ("i32.const", -8), "i32.and",
        ("global.set", bump),
        ("block", "empty"),
        ("loop", "empty"),
        ("global.get", bump),
        "memory.size", ("i32.const", 16), "i32.shl",
        "i32.le_u", ("br_if", 1),
        ("i32.const", 1), "memory.grow", "drop",
        ("br", 0),
        "end",
        "end",
        ("local.get", 1),
    ], export=True)
    if free_name == "free":
        b.add_func("free", ["i32"], [], [], [], export=True)
    else:
        b.add_func("deallocate", ["i32", "i32"], [], [], [], export=True)


def uppercase_module() -> bytes:
    """ASCII-uppercase the message in place (Go malloc/free convention,
    like the reference's tinygo uppercase.wasm)."""
    b = ModuleBuilder()
    as_bytes = b.import_func("benthos_wasm", "v0_msg_as_bytes", [], ["i64"])
    set_bytes = b.import_func("benthos_wasm", "v0_msg_set_bytes", ["i32", "i32"], [])
    b.add_memory(2)
    _add_bump_allocator(b, ("malloc", "free"))
    # locals: 0=pl(i64) 1=ptr 2=len 3=i 4=b
    b.add_func("process", [], [], ["i64", "i32", "i32", "i32", "i32"], [
        ("call", as_bytes), ("local.set", 0),
        ("local.get", 0), ("i64.const", 32), "i64.shr_u", "i32.wrap_i64",
        ("local.set", 1),
        ("local.get", 0), "i32.wrap_i64", ("local.set", 2),
        ("block", "empty"),
        ("loop", "empty"),
        ("local.get", 3), ("local.get", 2), "i32.ge_u", ("br_if", 1),
        ("local.get", 1), ("local.get", 3), "i32.add",
        ("i32.load8_u", 0), ("local.set", 4),
        ("local.get", 4), ("i32.const", 97), "i32.ge_u",
        ("local.get", 4), ("i32.const", 122), "i32.le_u", "i32.and",
        ("if", "empty"),
        ("local.get", 1), ("local.get", 3), "i32.add",
        ("local.get", 4), ("i32.const", 32), "i32.sub",
        ("i32.store8", 0),
        "end",
        ("local.get", 3), ("i32.const", 1), "i32.add", ("local.set", 3),
        ("br", 0),
        "end",
        "end",
        ("local.get", 1), ("local.get", 2), ("call", set_bytes),
    ], export=True)
    return b.build()


_SUFFIX = b"!!!!111!!11!"


def louder_module() -> bytes:
    """Append "!!!!111!!11!" (Rust allocate/deallocate convention, like
    the reference's louder.wasm: 'hello world' → 'hello world!!!!111!!11!')."""
    b = ModuleBuilder()
    as_bytes = b.import_func("benthos_wasm", "v0_msg_as_bytes", [], ["i64"])
    set_bytes = b.import_func("benthos_wasm", "v0_msg_set_bytes", ["i32", "i32"], [])
    b.add_memory(2)
    b.add_data(1024, _SUFFIX)
    _add_bump_allocator(b, ("allocate", "deallocate"))
    alloc_idx = 2  # after the two imports: allocate is func 2
    # locals: 0=pl 1=ptr 2=len 3=nptr
    b.add_func("process", [], [], ["i64", "i32", "i32", "i32"], [
        ("call", as_bytes), ("local.set", 0),
        ("local.get", 0), ("i64.const", 32), "i64.shr_u", "i32.wrap_i64",
        ("local.set", 1),
        ("local.get", 0), "i32.wrap_i64", ("local.set", 2),
        ("local.get", 2), ("i32.const", len(_SUFFIX)), "i32.add",
        ("call", alloc_idx), ("local.set", 3),
        # copy body
        ("local.get", 3), ("local.get", 1), ("local.get", 2), "memory.copy",
        # copy suffix
        ("local.get", 3), ("local.get", 2), "i32.add",
        ("i32.const", 1024), ("i32.const", len(_SUFFIX)), "memory.copy",
        ("local.get", 3), ("local.get", 2), ("i32.const", len(_SUFFIX)),
        "i32.add", ("call", set_bytes),
    ], export=True)
    return b.build()


def meta_echo_module() -> bytes:
    """Replace the content with meta("tag") and stamp meta seen=yes —
    exercises v0_msg_get_meta / v0_msg_set_meta (functions.go:60-109)."""
    b = ModuleBuilder()
    get_meta = b.import_func("benthos_wasm", "v0_msg_get_meta", ["i32", "i32"], ["i64"])
    set_meta = b.import_func(
        "benthos_wasm", "v0_msg_set_meta", ["i32", "i32", "i32", "i32"], []
    )
    set_bytes = b.import_func("benthos_wasm", "v0_msg_set_bytes", ["i32", "i32"], [])
    b.add_memory(2)
    b.add_data(512, b"tag")
    b.add_data(520, b"seen")
    b.add_data(528, b"yes")
    _add_bump_allocator(b, ("malloc", "free"))
    b.add_func("process", [], [], ["i64"], [
        ("i32.const", 512), ("i32.const", 3), ("call", get_meta),
        ("local.set", 0),
        ("local.get", 0), ("i64.const", 32), "i64.shr_u", "i32.wrap_i64",
        ("local.get", 0), "i32.wrap_i64",
        ("call", set_bytes),
        ("i32.const", 520), ("i32.const", 4),
        ("i32.const", 528), ("i32.const", 3),
        ("call", set_meta),
    ], export=True)
    return b.build()
