"""JMESPath interpreter — full-language support for the `jmespath`
processor (internal/impl/pure/processor_jmespath.go:25, which embeds
go-jmespath; the message is replaced by the search result).

From-scratch implementation of the public JMESPath spec
(jmespath.org/specification.html): identifiers, sub/index/slice
expressions, list/object projections (`[*]`, `.*`), flatten (`[]`),
filter projections (`[?expr]`), pipes, multiselect list/hash, `@`,
literals (`` `json` ``/'raw'), comparators, and/or/not, and the
standard function library. Plain paths should stay on the columnar
VARIANT fast path (functions/dynamic.py); this runs Arrow-batched via
``mapInPandas`` for full programs.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import DataFrame


class JmesError(ValueError):
    pass


# A projection is represented by wrapping the value list in _Proj.
class _Proj(list):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<literal>`(?:[^`\\]|\\.)*`)
  | (?P<raw>'(?:[^'\\]|\\.)*')
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|\[\?|\[\]|\[\*\]|[.\[\]{}():,*@!<>|&=])
    """,
    re.VERBOSE,
)


def _tokenize(src: str):
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise JmesError(f"jmespath: unexpected character {src[pos]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            toks.append((m.lastgroup, m.group()))
    toks.append(("eof", ""))
    return toks


def _is_true(v) -> bool:
    # JMESPath truthiness: false-like = null, false, '', [], {}
    return not (v is None or v is False or v == "" or v == [] or v == {})


def _cmp_ok(a, b) -> bool:
    return isinstance(a, (int, float)) and isinstance(b, (int, float)) and not (
        isinstance(a, bool) or isinstance(b, bool)
    )


@dataclass
class _Parser:
    toks: list
    i: int = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def expect(self, text):
        t = self.next()
        if t[1] != text:
            raise JmesError(f"jmespath: expected {text!r}, got {t[1]!r}")

    # pipe := or ('|' or)*     (| has lowest precedence)
    def pipe(self):
        node = self.or_()
        while self.peek() == ("op", "|"):
            self.next()
            node = ("pipe", node, self.or_())
        return node

    def or_(self):
        node = self.and_()
        while self.peek() == ("op", "||"):
            self.next()
            node = ("or", node, self.and_())
        return node

    def and_(self):
        node = self.cmp()
        while self.peek() == ("op", "&&"):
            self.next()
            node = ("and", node, self.cmp())
        return node

    def cmp(self):
        node = self.chain()
        if self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            node = ("cmp", op, node, self.chain())
        return node

    # chain of postfix expressions starting from a primary
    def chain(self):
        node = self.primary()
        while True:
            t = self.peek()
            if t == ("op", "."):
                self.next()
                node = self.after_dot(node)
            elif t[1] in ("[", "[?", "[]", "[*]") and t[0] == "op":
                node = self.bracket(node)
            else:
                return node

    def after_dot(self, node):
        t = self.peek()
        if t[0] == "ident":
            self.next()
            return ("field", node, t[1])
        if t[0] == "string":
            self.next()
            return ("field", node, json.loads(t[1]))
        if t == ("op", "*"):
            self.next()
            return ("oproj", node)
        if t == ("op", "{"):
            return ("mshash", node, self.multiselect_hash())
        if t == ("op", "["):
            # .[ multiselect list
            return ("mslist", node, self.multiselect_list())
        raise JmesError(f"jmespath: bad token after '.': {t[1]!r}")

    def bracket(self, node):
        t = self.next()
        if t[1] == "[]":
            return ("flatten", node)
        if t[1] == "[*]":
            return ("lproj", node)
        if t[1] == "[?":
            cond = self.pipe()
            self.expect("]")
            return ("filter", node, cond)
        # '[' — index, slice, or multiselect list on a fresh chain
        if self.peek()[0] == "number" or self.peek() == ("op", ":"):
            parts: list = [None, None, None]
            idx = 0
            if self.peek()[0] == "number":
                parts[0] = int(self.next()[1])
            while self.peek() == ("op", ":"):
                self.next()
                idx += 1
                if self.peek()[0] == "number":
                    parts[idx] = int(self.next()[1])
            self.expect("]")
            if idx == 0:
                return ("index", node, parts[0])
            return ("slice", node, parts[0], parts[1], parts[2])
        # multiselect list [expr, expr]
        self.i -= 1
        return ("mslist", node, self.multiselect_list())

    def multiselect_list(self):
        self.expect("[")
        items = [self.pipe()]
        while self.peek() == ("op", ","):
            self.next()
            items.append(self.pipe())
        self.expect("]")
        return items

    def multiselect_hash(self):
        self.expect("{")
        pairs = []
        while True:
            kt = self.next()
            if kt[0] == "ident":
                key = kt[1]
            elif kt[0] == "string":
                key = json.loads(kt[1])
            else:
                raise JmesError(f"jmespath: bad multiselect key {kt[1]!r}")
            self.expect(":")
            pairs.append((key, self.pipe()))
            if self.peek() == ("op", ","):
                self.next()
                continue
            self.expect("}")
            return pairs

    def primary(self):
        t = self.peek()
        if t == ("op", "@"):
            self.next()
            return ("current",)
        if t == ("op", "!"):
            self.next()
            return ("not", self.chain())
        if t == ("op", "("):
            self.next()
            node = self.pipe()
            self.expect(")")
            return node
        if t[0] == "literal":
            self.next()
            body = t[1][1:-1].replace("\\`", "`")
            return ("lit", json.loads(body))
        if t[0] == "raw":
            self.next()
            return ("lit", t[1][1:-1].replace("\\'", "'"))
        if t[0] == "string":
            self.next()
            return ("field", ("current",), json.loads(t[1]))
        if t[0] == "ident":
            name = t[1]
            if self.peek(1) == ("op", "("):
                self.next()
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.func_arg())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.func_arg())
                self.expect(")")
                return ("func", name, args)
            self.next()
            return ("field", ("current",), name)
        if t == ("op", "{"):
            return ("mshash", ("current",), self.multiselect_hash())
        if t[1] in ("[", "[?", "[]", "[*]") and t[0] == "op":
            return self.bracket(("current",))
        if t == ("op", "*"):
            self.next()
            return ("oproj", ("current",))
        if t == ("op", "&"):
            self.next()
            return ("expref", self.pipe())
        raise JmesError(f"jmespath: unexpected token {t[1]!r}")

    def func_arg(self):
        if self.peek() == ("op", "&"):
            self.next()
            return ("expref", self.pipe())
        return self.pipe()


def _stop_proj(node_type: str) -> bool:
    # pipe stops projections
    return node_type == "pipe"


class JmesProgram:
    """Compiled JMESPath expression."""

    def __init__(self, src: str):
        p = _Parser(_tokenize(src))
        self.ast = p.pipe()
        if p.peek()[0] != "eof":
            raise JmesError(f"jmespath: unexpected trailing input {p.peek()[1]!r}")

    def search(self, value: Any) -> Any:
        out = self._eval(self.ast, value)
        return list(out) if isinstance(out, _Proj) else out

    # -- evaluation (projection-aware) --------------------------------------
    def _eval(self, node, v):
        t = node[0]
        if t == "current":
            return v
        if t == "lit":
            return node[1]
        if t == "pipe":
            left = self._eval(node[1], v)
            if isinstance(left, _Proj):
                left = list(left)
            return self._eval(node[2], left)
        if t == "or":
            left = self._eval(node[1], v)
            return left if _is_true(left) else self._eval(node[2], v)
        if t == "and":
            left = self._eval(node[1], v)
            return self._eval(node[2], v) if _is_true(left) else left
        if t == "not":
            return not _is_true(self._eval(node[1], v))
        if t == "cmp":
            _, op, ln, rn = node
            a, b = self._eval(ln, v), self._eval(rn, v)
            if isinstance(a, _Proj):
                a = list(a)
            if isinstance(b, _Proj):
                b = list(b)
            if op == "==":
                return a == b
            if op == "!=":
                return a != b
            if not _cmp_ok(a, b):
                return None
            return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        if t == "field":
            base = self._eval(node[1], v)
            return self._project(base, lambda x: x.get(node[2]) if isinstance(x, dict) else None)
        if t == "index":
            base = self._eval(node[1], v)
            if isinstance(base, _Proj):
                return self._project(base, lambda x: self._index(x, node[2]))
            return self._index(base, node[2])
        if t == "slice":
            base = self._eval(node[1], v)

            def do_slice(x):
                if not isinstance(x, list):
                    return None
                step = node[4] if node[4] is not None else 1
                return x[node[2] : node[3] : step]

            if isinstance(base, _Proj):
                return self._project(base, do_slice)
            sliced = do_slice(base)
            # a slice expression creates a projection (spec §slices)
            return _Proj(sliced) if isinstance(sliced, list) else None
        if t == "lproj":
            base = self._eval(node[1], v)
            if isinstance(base, _Proj):
                base = list(base)
            if not isinstance(base, list):
                return None
            return _Proj(base)
        if t == "oproj":
            base = self._eval(node[1], v)
            if isinstance(base, _Proj):
                base = list(base)
            if not isinstance(base, dict):
                return None
            return _Proj(base.values())
        if t == "flatten":
            base = self._eval(node[1], v)
            if isinstance(base, _Proj):
                base = list(base)
            if not isinstance(base, list):
                return None
            out = []
            for item in base:
                if isinstance(item, list):
                    out.extend(item)
                else:
                    out.append(item)
            return _Proj(out)
        if t == "filter":
            base = self._eval(node[1], v)
            if isinstance(base, _Proj):
                base = list(base)
            if not isinstance(base, list):
                return None
            return _Proj([x for x in base if _is_true(self._eval(node[2], x))])
        if t == "mslist":
            base = self._eval(node[1], v) if node[1] != ("current",) else v
            return self._project_or_apply(
                base, lambda x: [self._plain(e, x) for e in node[2]]
            )
        if t == "mshash":
            base = self._eval(node[1], v) if node[1] != ("current",) else v
            return self._project_or_apply(
                base, lambda x: {k: self._plain(e, x) for k, e in node[2]}
            )
        if t == "func":
            args = []
            for a in node[2]:
                if a[0] == "expref":
                    args.append(("expref", a[1]))
                else:
                    val = self._eval(a, v)
                    args.append(list(val) if isinstance(val, _Proj) else val)
            return _call(node[1], args, self)
        if t == "expref":
            return ("expref", node[1])
        raise JmesError(f"jmespath: bad node {t}")

    def _plain(self, node, v):
        out = self._eval(node, v)
        return list(out) if isinstance(out, _Proj) else out

    def _index(self, x, i):
        if not isinstance(x, list):
            return None
        return x[i] if -len(x) <= i < len(x) else None

    def _project(self, base, fn):
        if isinstance(base, _Proj):
            out = _Proj()
            for item in base:
                r = fn(item)
                if r is not None:
                    out.append(list(r) if isinstance(r, _Proj) else r)
            return out
        return fn(base)

    def _project_or_apply(self, base, fn):
        if isinstance(base, _Proj):
            return _Proj([fn(x) for x in base])
        if base is None:
            return None
        return fn(base)


# -- function library (spec §functions) --------------------------------------


def _typ(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "unknown"


def _call(name, args, prog: JmesProgram):
    def expref_fn(a):
        if not (isinstance(a, tuple) and a[0] == "expref"):
            raise JmesError(f"{name}: expected expression reference")
        return lambda x: prog._plain(a[1], x)

    if name == "length":
        (v,) = args
        if isinstance(v, (str, list, dict)):
            return len(v)
        raise JmesError("length: invalid type")
    if name == "keys":
        return list(args[0].keys())
    if name == "values":
        return list(args[0].values())
    if name == "type":
        return _typ(args[0])
    if name == "not_null":
        for a in args:
            if a is not None:
                return a
        return None
    if name == "to_string":
        v = args[0]
        return v if isinstance(v, str) else json.dumps(v, separators=(",", ":"))
    if name == "to_number":
        v = args[0]
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return v
        if isinstance(v, str):
            try:
                return int(v)
            except ValueError:
                try:
                    return float(v)
                except ValueError:
                    return None
        return None
    if name == "to_array":
        v = args[0]
        return v if isinstance(v, list) else [v]
    if name == "contains":
        sub, item = args[0], args[1]
        if isinstance(sub, str):
            return isinstance(item, str) and item in sub
        if isinstance(sub, list):
            return item in sub
        raise JmesError("contains: invalid type")
    if name == "starts_with":
        return args[0].startswith(args[1])
    if name == "ends_with":
        return args[0].endswith(args[1])
    if name == "join":
        sep, arr = args
        return sep.join(arr)
    if name == "split":
        return args[0].split(args[1])
    if name == "reverse":
        return args[0][::-1]
    if name == "abs":
        return abs(args[0])
    if name == "ceil":
        return math.ceil(args[0])
    if name == "floor":
        return math.floor(args[0])
    if name == "sum":
        return sum(args[0]) if args[0] else 0
    if name == "avg":
        return sum(args[0]) / len(args[0]) if args[0] else None
    if name == "max":
        return max(args[0]) if args[0] else None
    if name == "min":
        return min(args[0]) if args[0] else None
    if name == "sort":
        return sorted(args[0])
    if name == "sort_by":
        return sorted(args[0], key=expref_fn(args[1]))
    if name == "max_by":
        return max(args[0], key=expref_fn(args[1]), default=None)
    if name == "min_by":
        return min(args[0], key=expref_fn(args[1]), default=None)
    if name == "map":
        fn = expref_fn(args[0])
        return [fn(x) for x in args[1]]
    if name == "merge":
        out = {}
        for a in args:
            out.update(a)
        return out
    raise JmesError(f"jmespath function {name!r} is not defined")


@dataclass
class JmespathProcessor:
    """`jmespath` processor (processor_jmespath.go:25): the message is
    replaced by the search result; a null result leaves the message
    unchanged is NOT reference behavior — go-jmespath replaces with
    null, so we do too. Arrow-batched via mapInPandas."""

    query: str
    col: str = "value"
    out_col: Optional[str] = None
    columnar: bool = True  # compile the common subset to Column exprs

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.columnar:
            from pyspark.sql import functions as F

            from benthos_spark.functions.jmespath_columnar import try_compile

            compiled = try_compile(self.query)
            if compiled is not None:
                v = F.parse_json(F.col(self.col).cast("string"))
                out_col = self.out_col or self.col
                out = df.withColumn(out_col, compiled.apply(v))
                return out.drop(self.col) if out_col != self.col else out
        return self._interpret(df)

    def _interpret(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        src = self.query
        col = self.col
        out_col = self.out_col or col
        out_fields = [c for c in df.columns if c != col] + [out_col]
        schema = ", ".join(
            f"{n} string" if n == out_col else f"{n} {df.schema[n].dataType.simpleString()}"
            for n in out_fields
        )

        def run(batches):
            prog = JmesProgram(src)
            for pdf in batches:
                keep = [c for c in pdf.columns if c != col]
                rows = []
                for i in range(len(pdf)):
                    doc = json.loads(pdf[col].iloc[i])
                    result = prog.search(doc)
                    row = {c: pdf[c].iloc[i] for c in keep}
                    # ensure_ascii=False to match the columnar renderer
                    row[out_col] = json.dumps(result, separators=(",", ":"), ensure_ascii=False)
                    rows.append(row)
                yield pd.DataFrame(rows) if rows else pd.DataFrame({c: [] for c in out_fields})

        return df.mapInPandas(run, schema=schema)
