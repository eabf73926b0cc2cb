"""The dynamic JSON document model — VariantType.

The reference's payload is schemaless JSON parsed lazily per message
(/root/reference/internal/message/data.go:30-65: bytes↔structured dual
representation) and queried with `jq`/`jmespath`/Bloblang paths
(internal/impl/pure/processor_jq.go:26, processor_jmespath.go:25;
json() function internal/bloblang/query/functions.go:421).

Spark 4's VARIANT is the native equivalent: a binary-encoded dynamic
value parsed once at ingest (``parse_json``) and path-queried without
re-parsing (``variant_get``) — the lazy dual representation, columnar.
This module wraps it and compiles jq-style paths.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(e) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def parse_dynamic(col) -> Column:
    """bytes/string → VARIANT (the one-time lazy parse, data.go:53-65)."""
    return F.parse_json(_c(col))


def to_json_dynamic(col) -> Column:
    """VARIANT → JSON string (AsBytes re-serialization, data.go:30-35)."""
    return F.to_json(_c(col))


def schema_of(col) -> Column:
    """Observed dynamic schema (`type()` over the whole doc)."""
    return F.schema_of_variant(_c(col))


_JQ_INDEX = re.compile(r"\[(-?\d+)\]")


def jq_path(path: str) -> str:
    """Compile a jq-style path (``.a.b[0].c``) to a variant_get path
    (``$.a.b[0].c``). Supports field access and numeric indexing — the
    subset the reference's jq processor uses for extraction (full jq
    programs with pipes/functions are out of scope; Bloblang mappings
    cover those cases as Column expressions)."""
    p = path.strip()
    if p.startswith("$"):
        return p
    if not p.startswith("."):
        raise ValueError(f"jq path must start with '.': {path!r}")
    return "$" + p


def jq(col, path: str, as_type: str = "string") -> Column:
    """`jq` processor extraction (processor_jq.go:26): one path, one
    typed result, evaluated on the variant without re-parsing."""
    return F.try_variant_get(_c(col), jq_path(path), as_type)


def jmespath(col, path: str, as_type: str = "string") -> Column:
    """`jmespath` (processor_jmespath.go:25) — same path subset; jmespath
    writes ``a.b[0]`` without the leading dot."""
    p = path if path.startswith(("$", ".")) else "." + path
    return jq(_c(col), p, as_type)


def explode_array(col, path: str = "$"):
    """``.items[]`` — explode a variant array into rows (the jq iterate
    op). Returns a Column suitable for ``select(explode_array(...))``."""
    return F.explode(F.try_variant_get(_c(col), jq_path(path) if path != "$" else "$", "array<variant>"))
