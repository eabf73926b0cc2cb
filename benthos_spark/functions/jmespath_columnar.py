"""JMESPath → columnar compiler (subset), reusing the jq CV machinery.

The `jmespath` processor (processor_jmespath.go:25) otherwise runs the
spec-complete interpreter per row inside Arrow batches
(functions/jmespath_program.py). JMESPath's navigation semantics map
cleanly onto null-safe VARIANT access (missing field → null, field on
null → null — no errors, unlike jq), so the common shapes compile to
pure Column expressions:

- dotted identifier paths ``a.b.c`` (incl. quoted ``"weird key"``)
- index access ``a[0]`` (non-negative literal)
- pipes ``a.b | c``
- multiselect hash ``{k: a.b, n: c}`` (JMESPath null-LHS rule: a null
  current value yields null, not ``{}``)
- multiselect list ``[a, b.c]`` (same null-LHS rule)
- raw JSON literals ``` `…` ``` and raw strings ``'…'``

Everything else — projections ``a[].b``, filters ``[?x]``, functions,
``||``/``&&`` (JMESPath truthiness differs from jq's), slices — raises
``JmesCompileError`` and the caller falls back to the interpreter, so
coverage is a pure optimization. The dual-backend conformance test
(tests/test_jmespath_columnar.py) pins the agreeing corpus.
"""

from __future__ import annotations

import json
import re
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from benthos_spark.functions.jq_columnar import CV, _compile, _render


class JmesCompileError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<raw>`(?:[^`\\]|\\.)*`)
  | (?P<rawstr>'(?:[^'\\]|\\.)*')
  | (?P<quoted>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>[.\[\]{}(),:|@])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise JmesCompileError(f"jmespath: char {src[pos]!r} not in compilable subset")
        pos = m.end()
        if m.lastgroup != "ws":
            toks.append((m.lastgroup, m.group()))
    toks.append(("eof", ""))
    return toks


class _Parser:
    """Parses the compilable subset into jq_columnar AST tuples."""

    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise JmesCompileError(f"expected {val!r}, got {t[1]!r}")

    def parse(self):
        node = self.pipe()
        if self.peek()[0] != "eof":
            raise JmesCompileError(f"trailing input {self.peek()[1]!r}")
        return node

    def pipe(self):
        stages = [self.expr()]
        while self.peek()[1] == "|":
            self.next()
            stages.append(self.expr())
        return ("pipe", stages) if len(stages) > 1 else stages[0]

    def expr(self):
        node = self.primary()
        while True:
            t = self.peek()
            if t[1] == ".":
                self.next()
                nt = self.next()
                if nt[0] == "ident":
                    node = ("field", node, nt[1])
                elif nt[0] == "quoted":
                    node = ("field", node, json.loads(nt[1]))
                else:
                    raise JmesCompileError(f"sub-expression {nt[1]!r} not compiled")
            elif t[1] == "[":
                if self.peek(1)[0] == "number" and self.peek(2)[1] == "]":
                    self.next()
                    idx = int(self.next()[1])
                    self.next()
                    if idx < 0:
                        raise JmesCompileError("negative index not compiled")
                    node = ("index", node, idx)
                else:
                    raise JmesCompileError("projection/slice/filter not compiled")
            else:
                return node

    def primary(self):
        kind, val = self.peek()
        if kind == "ident":
            self.next()
            return ("field", ("identity",), val)
        if kind == "quoted":
            self.next()
            return ("field", ("identity",), json.loads(val))
        if val == "@":
            self.next()
            return ("identity",)
        if kind == "raw":
            self.next()
            lit = json.loads(val[1:-1].replace("\\`", "`"))
            return _lit_node(lit)
        if kind == "rawstr":
            self.next()
            return ("lit_str", val[1:-1].replace("\\'", "'"))
        if val == "{":
            self.next()
            pairs = []
            while self.peek()[1] != "}":
                kt = self.next()
                if kt[0] == "ident":
                    key = kt[1]
                elif kt[0] == "quoted":
                    key = json.loads(kt[1])
                else:
                    raise JmesCompileError(f"multiselect key {kt[1]!r} not compiled")
                self.expect(":")
                pairs.append((key, self.expr()))
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return ("ms_hash", pairs)
        if val == "[":
            # bare [ at primary position is a multiselect list
            self.next()
            items = []
            while self.peek()[1] != "]":
                items.append(self.expr())
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            if not items:
                raise JmesCompileError("flatten/empty-list not compiled")
            return ("ms_list", items)
        raise JmesCompileError(f"token {val!r} not in the compilable subset")


def _lit_node(v):
    if v is None:
        return ("lit_null",)
    if isinstance(v, bool):
        return ("lit_bool", v)
    if isinstance(v, (int, float)):
        return ("lit_num", float(v), isinstance(v, int))
    if isinstance(v, str):
        return ("lit_str", v)
    raise JmesCompileError("container literal not compiled")


def _compile_jmes(node, cur: CV):
    """JMESPath evaluation over the jq CV model. Multiselects apply the
    null-LHS rule: a null current value yields null."""
    tag = node[0]
    if tag in ("field", "index"):
        # navigation shares jq's compiler (variant access is already
        # missing/null-safe, which IS JMESPath's rule)
        base = cur if node[1][0] == "identity" else _compile_jmes(node[1], cur)
        if base.kind != "variant":
            raise JmesCompileError(f"cannot navigate a {base.kind} value")
        _, out = _compile((tag, ("identity",), node[2]), base, None)
        return out
    if tag in ("identity", "lit_null", "lit_bool", "lit_num", "lit_str"):
        _, out = _compile(node, cur, None)
        return out
    if tag == "pipe":
        for stage in node[1]:
            cur = _compile_jmes(stage, cur)
        return cur
    if tag in ("ms_hash", "ms_list"):
        if cur.kind != "variant":
            raise JmesCompileError("multiselect over non-variant")
        parts = [F.lit("{" if tag == "ms_hash" else "[")]
        items = node[1]
        for i, item in enumerate(items):
            if i:
                parts.append(F.lit(","))
            if tag == "ms_hash":
                key, expr = item
                parts.append(F.lit(json.dumps(key, ensure_ascii=False) + ":"))
            else:
                expr = item
            parts.append(_render(_compile_jmes(expr, cur)))
        parts.append(F.lit("}" if tag == "ms_hash" else "]"))
        rendered = F.concat(*parts)
        # null-LHS rule: `{a: x}` / `[x]` on a null value is null
        base = cur.vcol()
        not_null = base.isNotNull() & ~F.is_variant_null(base)
        return CV("json", col=F.when(not_null, rendered))
    raise JmesCompileError(f"node {tag!r} not compiled")


class CompiledJmes:
    def __init__(self, src: str):
        self.ast = _Parser(src).parse()

    def apply(self, variant_col: Column) -> Column:
        out = _compile_jmes(self.ast, CV.variant(variant_col))
        return _render(out)


def try_compile(src: str) -> Optional[CompiledJmes]:
    try:
        return CompiledJmes(src)
    except ValueError:  # JmesCompileError + malformed raw literals
        return None
