"""jq program interpreter — full-program support for the `jq` processor.

The reference embeds gojq (internal/impl/pure/processor_jq.go:26):
arbitrary jq programs run per message; no output filters the message,
multiple outputs become an array, ``$metadata`` exposes message
metadata. The plain-path subset stays on the columnar VARIANT fast path
(functions/dynamic.py); this module implements the *program* semantics
— pipes, streams, generators, builtins — as a from-scratch interpreter
over JSON values, executed Arrow-batched via ``mapInPandas``.

jq semantics implemented (per jq's public manual):
- every expression maps one input value to a STREAM of outputs
- ``|`` composes streams; ``,`` concatenates them
- binary operators form the cartesian product of operand streams
- ``.foo`` / ``.[i]`` / ``.[]`` navigation, optional ``?`` suppression
- ``select``/``map``/``to_entries``-style builtins, if-then-else
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from typing import Any, Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class JqError(ValueError):
    pass


def normalize_numbers(v):
    """gojq number normalization at render boundaries: integral floats
    inside the exact double-int range print as integers (gojq's JSON
    encoder — the reference embeds gojq, processor_jq.go:26 — prints
    0.5*2 as 1, not 1.0). Applied to every stringified output so both
    backends and the columnar variant round-trip agree."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, float) and v.is_integer() and abs(v) <= 2**53:
        return int(v)
    if isinstance(v, list):
        return [normalize_numbers(x) for x in v]
    if isinstance(v, dict):
        return {k: normalize_numbers(x) for k, x in v.items()}
    return v


def render_json(v, **kw) -> str:
    kw.setdefault("separators", (",", ":"))
    return json.dumps(normalize_numbers(v), **kw)


# -- tokenizer ---------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>\d+\.\d+|\d+)
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<field>\.[A-Za-z_][A-Za-z0-9_]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|\|\||//|\.\.|and\b|or\b|[.\[\](){}|,:;?<>=+\-*/%])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise JqError(f"jq: unexpected character {src[pos]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    toks.append(("eof", ""))
    return toks


# -- parser → evaluator closures ---------------------------------------------
# Each node compiles to fn(value, env) -> Iterator[value].


@dataclass
class _P:
    toks: list
    i: int = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def at(self, text):
        return self.peek()[1] == text and self.peek()[0] in ("op", "ident")

    def expect(self, text):
        t = self.next()
        if t[1] != text:
            raise JqError(f"jq: expected {text!r}, got {t[1]!r}")

    # pipe := comma ('|' comma)*
    def pipe(self):
        node = self.comma()
        while self.peek() == ("op", "|"):
            self.next()
            rhs = self.comma()
            node = _mk_pipe(node, rhs)
        return node

    def comma(self):
        node = self.alt()
        if self.peek() == ("ident", "as"):
            # EXPR as $x | BODY — generator binding (jq manual "Variable
            # / Symbolic Binding Operator"): body runs once per value of
            # EXPR with the ORIGINAL input as `.`
            self.next()
            vt = self.next()
            if vt[0] != "var":
                raise JqError("jq: `as` requires a $variable pattern")
            self.expect("|")
            body = self.pipe()
            return _mk_bind(node, vt[1][1:], body)
        while self.peek() == ("op", ","):
            self.next()
            rhs = self.alt()
            node = _mk_comma(node, rhs)
        return node

    # '//' alternative operator
    def alt(self):
        node = self.or_()
        while self.peek() == ("op", "//"):
            self.next()
            rhs = self.or_()
            node = _mk_alt(node, rhs)
        return node

    def or_(self):
        node = self.and_()
        while self.peek()[1] == "or" and self.peek()[0] == "ident":
            self.next()
            rhs = self.and_()
            node = _mk_bool(node, rhs, any)
        return node

    def and_(self):
        node = self.cmp()
        while self.peek()[1] == "and" and self.peek()[0] == "ident":
            self.next()
            rhs = self.cmp()
            node = _mk_bool(node, rhs, all)
        return node

    def cmp(self):
        node = self.sum()
        while self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            rhs = self.sum()
            node = _mk_binop(node, rhs, op)
        return node

    def sum(self):
        node = self.prod()
        while self.peek()[1] in ("+", "-") and self.peek()[0] == "op":
            op = self.next()[1]
            rhs = self.prod()
            node = _mk_binop(node, rhs, op)
        return node

    def prod(self):
        node = self.postfix()
        while self.peek()[1] in ("*", "/", "%") and self.peek()[0] == "op":
            op = self.next()[1]
            rhs = self.postfix()
            node = _mk_binop(node, rhs, op)
        return node

    def postfix(self):
        node = self.primary()
        while True:
            t = self.peek()
            if t[0] == "field":
                self.next()
                node = _mk_pipe(node, _mk_field(t[1][1:]))
            elif t == ("op", "["):
                self.next()
                if self.peek() == ("op", "]"):
                    self.next()
                    node = _mk_pipe(node, _ITERATE)
                elif self.peek() == ("op", ":"):  # .[:n] slice
                    self.next()
                    hi = self.pipe()
                    self.expect("]")
                    node = _mk_slice(node, _mk_const(0), hi)
                else:
                    idx = self.pipe()
                    if self.peek() == ("op", ":"):
                        self.next()
                        hi = None if self.peek() == ("op", "]") else self.pipe()
                        self.expect("]")
                        node = _mk_slice(node, idx, hi)
                    else:
                        self.expect("]")
                        node = _mk_index(node, idx)
            elif t == ("op", "?"):
                self.next()
                node = _mk_try(node)
            else:
                return node

    def primary(self):
        t = self.peek()
        if t[0] == "op" and t[1] == "..":
            # `..` ≡ recurse: the value itself, then every descendant,
            # depth-first pre-order (arrays in document order, object
            # VALUES in document order)
            self.next()
            return _mk_recurse(None)
        if t[0] == "op" and t[1] == ".":
            self.next()
            nxt = self.peek()
            if nxt[0] == "string":
                self.next()
                return _mk_field(json.loads(nxt[1]))
            return _IDENTITY
        if t[0] == "field":
            self.next()
            return _mk_field(t[1][1:])
        if t[0] == "op" and t[1] == "-":
            self.next()
            inner = self.postfix()
            return _mk_neg(inner)
        if t[0] == "number":
            self.next()
            v = float(t[1]) if "." in t[1] else int(t[1])
            return _mk_const(v)
        if t[0] == "string":
            self.next()
            parts = split_interpolated(t[1])
            if parts is None:
                return _mk_const(json.loads(t[1]))
            compiled = []
            for kind, p in parts:
                if kind == "lit":
                    compiled.append(("lit", p))
                else:
                    sub = _P(_tokenize(p))
                    node = sub.pipe()
                    if sub.peek()[0] != "eof":
                        raise JqError(f"jq: trailing input in interpolation {p!r}")
                    compiled.append(("expr", node))
            return _mk_interp(compiled)
        if t[0] == "var":
            self.next()
            return _mk_var(t[1][1:])
        if t == ("op", "("):
            self.next()
            node = self.pipe()
            self.expect(")")
            return node
        if t == ("op", "["):
            self.next()
            if self.peek() == ("op", "]"):
                self.next()
                return _mk_const([])
            inner = self.pipe()
            self.expect("]")
            return _mk_collect(inner)
        if t == ("op", "{"):
            return self.object()
        if t[0] == "ident":
            name = t[1]
            if name in ("true", "false", "null"):
                self.next()
                return _mk_const({"true": True, "false": False, "null": None}[name])
            if name == "if":
                return self.if_()
            if name == "not":
                self.next()
                return _mk_not()
            if name == "empty":
                self.next()
                return _EMPTY
            if name == "reduce":
                self.next()
                src = self.postfix()
                if self.peek() != ("ident", "as"):
                    raise JqError("jq: reduce requires `as $var`")
                self.next()
                vt = self.next()
                if vt[0] != "var":
                    raise JqError("jq: reduce requires a $variable pattern")
                self.expect("(")
                init = self.pipe()
                self.expect(";")
                update = self.pipe()
                self.expect(")")
                return _mk_reduce(src, vt[1][1:], init, update)
            self.next()
            args = []
            if self.peek() == ("op", "("):
                self.next()
                args.append(self.pipe())
                while self.peek() == ("op", ";"):
                    self.next()
                    args.append(self.pipe())
                self.expect(")")
            return _mk_func(name, args)
        raise JqError(f"jq: unexpected token {t[1]!r}")

    def object(self):
        self.expect("{")
        pairs = []
        while True:
            if self.peek() == ("op", "}"):
                self.next()
                break
            kt = self.next()
            if kt[0] == "string":
                key = _mk_const(json.loads(kt[1]))
            elif kt[0] == "ident":
                key = _mk_const(kt[1])
            elif kt == ("op", "("):
                key = self.pipe()
                self.expect(")")
            else:
                raise JqError(f"jq: bad object key {kt[1]!r}")
            if self.peek() == ("op", ":"):
                self.next()
                val = self.alt()
            else:
                # {foo} shorthand = {foo: .foo}
                val = _mk_field(kt[1])
            pairs.append((key, val))
            if self.peek() == ("op", ","):
                self.next()
        return _mk_object(pairs)

    def if_(self):
        self.expect("if")
        cond = self.pipe()
        self.expect("then")
        then = self.pipe()
        elifs = []
        orelse = _IDENTITY
        while True:
            t = self.peek()
            if t[1] == "elif":
                self.next()
                c = self.pipe()
                self.expect("then")
                e = self.pipe()
                elifs.append((c, e))
            elif t[1] == "else":
                self.next()
                orelse = self.pipe()
            elif t[1] == "end":
                self.next()
                break
            else:
                raise JqError("jq: expected elif/else/end")
        return _mk_if(cond, then, elifs, orelse)


def split_interpolated(raw: str) -> list[tuple[str, str]] | None:
    """Split a RAW double-quoted string token into jq string-interpolation
    parts — ``[("lit", text) | ("expr", source), ...]`` — or None when the
    literal holds no ``\\(...)`` (gojq lexer.go scanString states; the
    reference embeds gojq via processor_jq.go:26). Nested parens balance;
    a nested string literal inside the interpolation cannot appear here
    because the outer tokenizer's string regex would have terminated the
    token at its first quote (such programs fail to parse → JqError)."""
    if "\\(" not in raw:
        return None
    body = raw[1:-1]
    parts: list[tuple[str, str]] = []
    lit: list[str] = []
    i = 0

    def flush():
        if lit:
            parts.append(("lit", json.loads('"' + "".join(lit) + '"')))
            lit.clear()

    while i < len(body):
        ch = body[i]
        if ch == "\\":
            nxt = body[i + 1] if i + 1 < len(body) else ""
            if nxt == "(":
                depth, j = 1, i + 2
                while j < len(body):
                    if body[j] == "(":
                        depth += 1
                    elif body[j] == ")":
                        depth -= 1
                        if not depth:
                            break
                    j += 1
                if depth:
                    raise JqError("jq: unterminated \\( string interpolation")
                flush()
                parts.append(("expr", body[i + 2 : j]))
                i = j + 1
                continue
            lit.append(ch + nxt)
            i += 2
            continue
        lit.append(ch)
        i += 1
    flush()
    return parts


def _mk_interp(parts):
    """Interpolated string: each expr part is a full jq expression whose
    OUTPUT STREAM multiplies the result (gojq: `"a\\(1,2)"` yields two
    strings), rendered with tostring semantics (strings verbatim, other
    values compact JSON)."""

    def fn(v, env):
        def rec(k, acc):
            if k == len(parts):
                yield acc
                return
            kind, p = parts[k]
            if kind == "lit":
                yield from rec(k + 1, acc + p)
            else:
                for out in p(v, env):
                    s = out if isinstance(out, str) else render_json(out, ensure_ascii=False)
                    yield from rec(k + 1, acc + s)

        yield from rec(0, "")

    return fn


# -- node constructors -------------------------------------------------------


def _IDENTITY(v, env):
    yield v


def _EMPTY(v, env):
    return
    yield


def _ITERATE(v, env):
    if isinstance(v, list):
        yield from v
    elif isinstance(v, dict):
        yield from v.values()
    elif v is None:
        return
    else:
        raise JqError(f"cannot iterate over {_t(v)}")


def _t(v):
    return {type(None): "null", bool: "boolean", int: "number", float: "number",
            str: "string", list: "array", dict: "object"}.get(type(v), "unknown")


def _mk_pipe(a, b):
    def fn(v, env):
        for x in a(v, env):
            yield from b(x, env)

    return fn


def _mk_comma(a, b):
    def fn(v, env):
        yield from a(v, env)
        yield from b(v, env)

    return fn


def _mk_alt(a, b):
    def fn(v, env):
        got = False
        try:
            for x in a(v, env):
                if x is not None and x is not False:
                    got = True
                    yield x
        except JqError:
            pass
        if not got:
            yield from b(v, env)

    return fn


def _mk_field(name):
    def fn(v, env):
        if v is None:
            yield None
        elif isinstance(v, dict):
            yield v.get(name)
        else:
            raise JqError(f"cannot index {_t(v)} with \"{name}\"")

    return fn


def _mk_index(node, idx):
    def fn(v, env):
        for base in node(v, env):
            for i in idx(base, env):
                if isinstance(base, list) and isinstance(i, int):
                    yield base[i] if -len(base) <= i < len(base) else None
                elif isinstance(base, dict) and isinstance(i, str):
                    yield base.get(i)
                elif base is None:
                    yield None
                else:
                    raise JqError(f"cannot index {_t(base)} with {_t(i)}")

    return fn


def _mk_slice(node, lo, hi):
    def fn(v, env):
        for base in node(v, env):
            lo_v = next(lo(base, env)) if lo is not None else None
            hi_v = next(hi(base, env)) if hi is not None else None
            if isinstance(base, (list, str)):
                yield base[lo_v:hi_v]
            elif base is None:
                yield None
            else:
                raise JqError(f"cannot slice {_t(base)}")

    return fn


def _mk_try(node):
    def fn(v, env):
        try:
            yield from node(v, env)
        except JqError:
            return

    return fn


def _mk_const(c):
    def fn(v, env):
        yield c

    return fn


def _mk_var(name):
    def fn(v, env):
        if name not in env:
            raise JqError(f"${name} is not defined")
        yield env[name]

    return fn


def _mk_bind(expr, name, body):
    def fn(v, env):
        for bound in expr(v, env):
            yield from body(v, {**env, name: bound})

    return fn


def _mk_reduce(src, name, init, update):
    """jq reduce: fold `update` over the source generator; if update
    yields several values only the LAST is kept, and an empty update
    erases the reduction (jq manual semantics)."""

    def fn(v, env):
        for acc in init(v, env):
            dead = False
            for x in src(v, env):
                last = _SENTINEL = object()
                for out in update(acc, {**env, name: x}):
                    last = out
                if last is _SENTINEL:
                    dead = True
                    break
                acc = last
            if not dead:
                yield acc

    return fn


def _mk_neg(node):
    def fn(v, env):
        for x in node(v, env):
            if not isinstance(x, (int, float)) or isinstance(x, bool):
                raise JqError(f"{_t(x)} cannot be negated")
            yield -x

    return fn


def _mk_not():
    def fn(v, env):
        yield v is None or v is False

    return fn


def _truthy(v):
    return not (v is None or v is False)


def _mk_bool(a, b, combine):
    def fn(v, env):
        for x in a(v, env):
            for y in b(v, env):
                yield combine([_truthy(x), _truthy(y)])

    return fn


_CMP_ORDER = {"null": 0, "boolean": 1, "number": 2, "string": 3, "array": 4, "object": 5}


def _jq_cmp(a, b):
    ta, tb = _t(a), _t(b)
    if ta != tb:
        return -1 if _CMP_ORDER[ta] < _CMP_ORDER[tb] else 1
    if a == b:
        return 0
    if ta in ("number", "string", "boolean"):
        return -1 if a < b else 1
    return -1 if json.dumps(a, sort_keys=True) < json.dumps(b, sort_keys=True) else 1


def _mk_binop(a, b, op):
    def apply(x, y):
        if op == "==":
            return _jq_cmp(x, y) == 0
        if op == "!=":
            return _jq_cmp(x, y) != 0
        if op in ("<", "<=", ">", ">="):
            c = _jq_cmp(x, y)
            return {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[op]
        if op == "+":
            if x is None:
                return y
            if y is None:
                return x
            if isinstance(x, bool) or isinstance(y, bool):
                raise JqError("boolean cannot be added")
            if isinstance(x, (int, float)) and isinstance(y, (int, float)):
                return x + y
            if isinstance(x, str) and isinstance(y, str):
                return x + y
            if isinstance(x, list) and isinstance(y, list):
                return x + y
            if isinstance(x, dict) and isinstance(y, dict):
                return {**x, **y}
            raise JqError(f"{_t(x)} and {_t(y)} cannot be added")
        if op == "-":
            if isinstance(x, list) and isinstance(y, list):
                return [e for e in x if e not in y]
            return x - y
        if op == "*":
            if isinstance(x, str) and isinstance(y, int):
                return x * y if y > 0 else None
            return x * y
        if op == "/":
            if isinstance(x, str) and isinstance(y, str):
                return x.split(y)
            if y == 0:
                raise JqError("division by zero")
            return x / y
        if op == "%":
            if y == 0:
                raise JqError("division by zero")
            # C-truncated integer mod (gojq), exact — math.fmod would
            # round the operands through float64 first
            xi, yi = int(x), int(y)
            r = abs(xi) % abs(yi)
            return -r if xi < 0 else r
        raise JqError(f"unknown op {op}")

    def fn(v, env):
        for y in b(v, env):
            for x in a(v, env):
                yield apply(x, y)

    return fn


def _mk_collect(inner):
    def fn(v, env):
        yield list(inner(v, env))

    return fn


def _mk_object(pairs):
    def fn(v, env):
        def rec(i, acc):
            if i == len(pairs):
                yield dict(acc)
                return
            kf, vf = pairs[i]
            for k in kf(v, env):
                for val in vf(v, env):
                    yield from rec(i + 1, acc + [(k, val)])

        yield from rec(0, [])

    return fn


def _mk_if(cond, then, elifs, orelse):
    def fn(v, env):
        for c in cond(v, env):
            if _truthy(c):
                yield from then(v, env)
                continue
            done = False
            for ec, ee in elifs:
                ok = False
                for cv in ec(v, env):
                    if _truthy(cv):
                        ok = True
                        break
                if ok:
                    yield from ee(v, env)
                    done = True
                    break
            if not done:
                yield from orelse(v, env)

    return fn


# -- builtins ----------------------------------------------------------------


def _one(node, v, env):
    it = node(v, env)
    try:
        return next(it)
    except StopIteration:
        raise JqError("expected a value")


def _recurse_all(v):
    """`..` output stream: v, then descendants depth-first pre-order.
    Arrays descend per element in document order; objects per VALUE in
    document order (matching `.[]?` — scalars terminate silently)."""
    stack = [v]
    while stack:
        x = stack.pop()
        yield x
        if isinstance(x, list):
            stack.extend(reversed(x))
        elif isinstance(x, dict):
            stack.extend(reversed(list(x.values())))


def _mk_recurse(f):
    """jq `recurse` (gojq builtin `def recurse: recurse(.[]?)` /
    `def recurse(f): def r: ., (f | r); r`): argless walks containers
    leniently; recurse(f) re-applies f depth-first, errors propagating
    (suppress with `?` inside f, exactly jq's contract)."""

    def fn(v, env):
        if f is None:
            yield from _recurse_all(v)
            return

        def r(x):
            yield x
            for out in f(x, env):
                yield from r(out)

        yield from r(v)

    return fn


# jq type filters: `numbers` ≡ select(type=="number") etc. — the usual
# companions of `..` (e.g. `[.. | numbers]`)
_TYPE_FILTERS = {
    "numbers": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "strings": lambda v: isinstance(v, str),
    "booleans": lambda v: isinstance(v, bool),
    "nulls": lambda v: v is None,
    "objects": lambda v: isinstance(v, dict),
    "arrays": lambda v: isinstance(v, list),
    "iterables": lambda v: isinstance(v, (list, dict)),
    "scalars": lambda v: not isinstance(v, (list, dict)),
}


def _mk_func(name, args):
    def fn(v, env):
        if name == "recurse":
            yield from _mk_recurse(args[0] if args else None)(v, env)
            return
        if name in _TYPE_FILTERS:
            if _TYPE_FILTERS[name](v):
                yield v
            return
        if name == "select":
            for c in args[0](v, env):
                if _truthy(c):
                    yield v
            return
        if name == "map":
            if not isinstance(v, list):
                raise JqError(f"cannot map over {_t(v)}")
            yield [x for e in v for x in args[0](e, env)]
            return
        if name == "map_values":
            if isinstance(v, dict):
                out = {}
                for k, val in v.items():
                    for x in args[0](val, env):
                        out[k] = x
                        break
                yield out
                return
            yield [next(args[0](e, env), None) for e in v]
            return
        if name == "with_entries":
            ents = [{"key": k, "value": val} for k, val in v.items()]
            out = {}
            for e in ents:
                for r in args[0](e, env):
                    out[r["key"]] = r["value"]
            yield out
            return
        if name == "length":
            if v is None:
                yield 0
            elif isinstance(v, (str, list, dict)):
                yield len(v)
            elif isinstance(v, (int, float)):
                yield abs(v)
            else:
                raise JqError(f"{_t(v)} has no length")
            return
        if name == "keys" or name == "keys_unsorted":
            if isinstance(v, dict):
                ks = list(v.keys())
                yield sorted(ks) if name == "keys" else ks
            elif isinstance(v, list):
                yield list(range(len(v)))
            else:
                raise JqError(f"{_t(v)} has no keys")
            return
        if name == "values":
            yield list(v.values()) if isinstance(v, dict) else v
            return
        if name == "has":
            k = _one(args[0], v, env)
            yield (k in v) if isinstance(v, dict) else (0 <= k < len(v))
            return
        if name == "add":
            if not v:
                yield None
                return
            acc = v[0]
            for e in v[1:]:
                if isinstance(acc, dict):
                    acc = {**acc, **e}
                else:
                    acc = acc + e
            yield acc
            return
        if name == "any":
            yield any(_truthy(e) for e in v)
            return
        if name == "all":
            yield all(_truthy(e) for e in v)
            return
        if name in ("floor", "ceil", "sqrt", "fabs"):
            yield {"floor": math.floor, "ceil": math.ceil, "sqrt": math.sqrt, "fabs": abs}[name](v)
            return
        if name == "abs":  # jq 1.7: int-preserving absolute value
            yield abs(v)
            return
        if name == "min":
            yield None if not v else min(v)
            return
        if name == "max":
            yield None if not v else max(v)
            return
        if name == "sort":
            import functools

            yield sorted(v, key=functools.cmp_to_key(_jq_cmp))
            return
        if name == "sort_by":
            yield sorted(v, key=lambda e: _one(args[0], e, env))
            return
        if name == "group_by":
            import itertools

            keyed = sorted(((_one(args[0], e, env), e) for e in v), key=lambda kv: json.dumps(kv[0], sort_keys=True, default=str))
            yield [[e for _, e in grp] for _, grp in itertools.groupby(keyed, key=lambda kv: kv[0])]
            return
        if name == "unique":
            # jq: sort by the TOTAL VALUE ORDER (like sort), then drop
            # adjacent duplicates — [10, 2.25] must yield [2.25, 10]
            import functools

            seen, out = set(), []
            for e in sorted(v, key=functools.cmp_to_key(_jq_cmp)):
                k = json.dumps(e, sort_keys=True, default=str)
                if k not in seen:
                    seen.add(k)
                    out.append(e)
            yield out
            return
        if name == "reverse":
            yield v[::-1]
            return
        if name == "flatten":
            depth = _one(args[0], v, env) if args else 1 << 31

            def flat(x, d):
                out = []
                for e in x:
                    if isinstance(e, list) and d > 0:
                        out.extend(flat(e, d - 1))
                    else:
                        out.append(e)
                return out

            yield flat(v, depth)
            return
        if name == "join":
            sep = _one(args[0], v, env)
            yield sep.join("" if e is None else (e if isinstance(e, str) else render_json(e)) for e in v)
            return
        if name == "split":
            yield v.split(_one(args[0], v, env))
            return
        if name == "test":
            yield re.search(_one(args[0], v, env), v) is not None
            return
        if name == "ltrimstr":
            p = _one(args[0], v, env)
            yield v.removeprefix(p) if isinstance(v, str) else v
            return
        if name == "rtrimstr":
            p = _one(args[0], v, env)
            yield v.removesuffix(p) if isinstance(v, str) else v
            return
        if name == "startswith":
            yield v.startswith(_one(args[0], v, env))
            return
        if name == "endswith":
            yield v.endswith(_one(args[0], v, env))
            return
        if name == "ascii_downcase":
            yield v.lower()
            return
        if name == "ascii_upcase":
            yield v.upper()
            return
        if name == "tostring":
            yield v if isinstance(v, str) else render_json(v)
            return
        if name == "tonumber":
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                yield v
            else:
                s = str(v)
                yield float(s) if "." in s or "e" in s.lower() else int(s)
            return
        if name == "type":
            yield _t(v)
            return
        if name == "contains":
            needle = _one(args[0], v, env)
            if isinstance(v, str):
                yield needle in v
            elif isinstance(v, list):
                yield all(any(n == e or (isinstance(e, str) and isinstance(n, str) and n in e) for e in v) for n in needle)
            else:
                yield all(k in v and v[k] == val for k, val in needle.items())
            return
        if name == "to_entries":
            yield [{"key": k, "value": val} for k, val in v.items()]
            return
        if name == "from_entries":
            out = {}
            for e in v:
                k = e.get("key", e.get("k", e.get("name")))
                out[k] = e.get("value", e.get("v"))
            yield out
            return
        if name == "limit":
            import itertools

            n = _one(args[0], v, env)
            if not isinstance(n, int) or isinstance(n, bool):
                raise JqError("limit() count must be a number")
            yield from itertools.islice(args[1](v, env), max(n, 0))
            return
        if name == "range":
            vals = [_one(a, v, env) for a in args]
            if len(vals) == 1:
                yield from range(vals[0])
            elif len(vals) == 2:
                yield from range(vals[0], vals[1])
            else:
                yield from range(vals[0], vals[1], vals[2])
            return
        if name == "first":
            if args:
                yield from list(args[0](v, env))[:1]
            else:
                yield v[0]
            return
        if name == "last":
            if args:
                out = list(args[0](v, env))
                if out:
                    yield out[-1]
            else:
                yield v[-1]
            return
        if name == "error":
            raise JqError(str(_one(args[0], v, env)) if args else str(v))
        if name == "tojson":
            yield render_json(v)
            return
        if name == "fromjson":
            yield json.loads(v)
            return
        raise JqError(f"jq function {name!r} is not defined")

    return fn


# -- public API --------------------------------------------------------------


class JqProgram:
    """Compiled jq program (≙ gojq.Parse + Compile in processor_jq.go)."""

    def __init__(self, src: str):
        p = _P(_tokenize(src))
        self.fn = p.pipe()
        if p.peek()[0] != "eof":
            raise JqError(f"jq: unexpected trailing input {p.peek()[1]!r}")

    def run(self, value: Any, metadata: Optional[dict] = None) -> list:
        env = {"metadata": metadata or {}, "__loc__": None}
        return list(self.fn(value, env))


@dataclass
class JqProcessor:
    """`jq` processor with full-program support (processor_jq.go:26):
    the message is replaced by the query result; no output filters the
    message; multiple outputs become an array. Runs Arrow-batched via
    mapInPandas; plain paths should use functions.dynamic.jq (columnar
    VARIANT) instead."""

    query: str
    col: str = "value"
    out_col: Optional[str] = None  # defaults to col (replace in place)
    columnar: bool = True  # compile the common subset to Column exprs

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.columnar:
            from benthos_spark.functions.jq_columnar import (
                recurse_depth_exceeded,
                try_compile,
            )

            compiled = try_compile(self.query)
            if compiled is not None:
                if getattr(compiled, "uses_merge", False):
                    # runtime-typed `+` may hit the object-merge lane
                    # (map_concat); jq merge is later-keys-win
                    df.sparkSession.conf.set(
                        "spark.sql.mapKeyDedupPolicy", "LAST_WIN"
                    )
                try:
                    if getattr(compiled, "uses_recurse", False):
                        # `..` compiles depth-bounded: ROW-LEVEL tiering.
                        # Documents within the bound take the compiled
                        # path; deeper ones (conservative root-depth
                        # check) go through the interpreter — semantics
                        # identical, the bound only picks the tier.
                        v = F.parse_json(F.col(self.col).cast("string"))
                        deep = F.coalesce(recurse_depth_exceeded(v), F.lit(False))
                        shallow_out = self._apply_compiled(df.filter(~deep), compiled)
                        return shallow_out.unionByName(self._interpret(df.filter(deep)))
                    return self._apply_compiled(df, compiled)
                except JqError:
                    # apply-time type rejections (e.g. indexing a
                    # literal) — the interpreter is always the fallback
                    return self._interpret(df)
        return self._interpret(df)

    def _apply_compiled(self, df: DataFrame, compiled) -> DataFrame:
        # Stage the parsed VARIANT as its own projection so the compiled
        # program references an ATTRIBUTE rather than an inline
        # parse_json(...) tree — programs mention the document many
        # times and inlining would re-parse the JSON per occurrence
        # (CollapseProject keeps the stage: parse_json is non-cheap and
        # multiply referenced; same fix as JmespathProcessor).
        tmp = f"_jq_parsed_{abs(hash(self.query)) % 10**6}"
        staged = df.withColumn(tmp, F.parse_json(F.col(self.col).cast("string")))
        v = F.col(tmp)
        keep, rendered = compiled.apply(v)
        out = staged if keep is None else staged.filter(keep)
        out_col = self.out_col or self.col
        out = out.withColumn(out_col, rendered).drop(tmp)
        # the interpreter path replaces the input column
        return out.drop(self.col) if out_col != self.col else out

    def _interpret(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        src = self.query
        col = self.col
        out_col = self.out_col or col
        out_fields = [f"{c}" for c in df.columns if c != col] + [out_col]
        schema = ", ".join(
            f"{name} string" if name == out_col else f"{name} {df.schema[name].dataType.simpleString()}"
            for name in out_fields
        )

        def run(batches):
            prog = JqProgram(src)
            for pdf in batches:
                keep_cols = [c for c in pdf.columns if c != col]
                rows = []
                for i in range(len(pdf)):
                    doc = json.loads(pdf[col].iloc[i])
                    outs = prog.run(doc)
                    if not outs:
                        continue  # no value -> message filtered
                    result = outs[0] if len(outs) == 1 else outs
                    row = {c: pdf[c].iloc[i] for c in keep_cols}
                    # ensure_ascii=False to match the columnar renderer
                    # (Spark to_json emits raw UTF-8, not \uXXXX escapes)
                    row[out_col] = render_json(result, ensure_ascii=False)
                    rows.append(row)
                yield pd.DataFrame(rows) if rows else pd.DataFrame({c: [] for c in out_fields})

        return df.mapInPandas(run, schema=schema)
