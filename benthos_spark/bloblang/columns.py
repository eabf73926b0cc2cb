"""Bloblang → pyspark Column compiler (the JVM hot path).

Compiles the typed subset of a parsed mapping onto the existing Column
helper layer (:mod:`benthos_spark.functions.bloblang`) so Bloblang
configs run inside whole-stage codegen with zero Python in the data
path. Raises :class:`UnsupportedBloblang` for constructs that need the
dynamic-document model; the processor falls back to the Arrow-batched
interpreter (interp.py) for those.

Coverage: root/path assignments, ``let`` (inlined; Catalyst CSE
de-duplicates), ``meta`` (merged into the ``_meta`` map column),
``deleted()`` (column drop / row filter), ``if``/``match`` (→ when
chains), lambdas (→ higher-order functions), ``map``+``apply`` (inline
expansion), the full operator set with the reference's precedence and
number semantics (`/` → double, `+` → concat for strings).

Reference: internal/bloblang/mapping/executor.go (statement semantics),
internal/bloblang/query/arithmetic.go (operators).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from benthos_spark.bloblang import ast as A
from benthos_spark.functions import bloblang as B


class UnsupportedBloblang(ValueError):
    """The mapping needs the dynamic-document path (interp.py)."""


_DELETED = object()  # sentinel Column marker for deleted() assignments


@dataclass
class _Env:
    schema: Optional[T.StructType]
    contexts: dict = field(default_factory=dict)  # lambda name -> Column
    vars: dict = field(default_factory=dict)  # let name -> Column
    this_col: Optional[Column] = None  # bound context (match/lambda `this`)
    this_type: Optional[T.DataType] = None
    maps: dict = field(default_factory=dict)
    assigned: dict = field(default_factory=dict)  # root path[0] -> Column
    flags: dict = field(default_factory=dict)  # shared compile-wide markers

    def child(self, **kw) -> "_Env":
        d = dict(
            schema=self.schema,
            contexts=self.contexts,
            vars=self.vars,
            this_col=self.this_col,
            this_type=self.this_type,
            maps=self.maps,
            assigned=self.assigned,
            flags=self.flags,
        )
        d.update(kw)
        return _Env(**d)


@dataclass
class CompiledMapping:
    """Result of compiling a mapping against a schema."""

    assignments: list  # list[(path: tuple, Column)]
    drops: list  # column names assigned deleted()
    row_filter: Optional[Column]  # None = keep all; else keep-predicate
    meta: list  # list[(key, Column)]
    identity_root: bool  # root = this appeared (keep input columns)
    reads_meta: bool = False  # expressions reference @key / tracing_*()

    def apply(self, df: DataFrame, mutate: bool) -> DataFrame:
        out = df
        if self.reads_meta:
            from benthos_spark.operators.processors import ensure_meta_col

            out = ensure_meta_col(out)
        if self.meta:
            from benthos_spark.operators.processors import ensure_meta_col, META_COL

            out = ensure_meta_col(out)
            pairs = []
            for k, c in self.meta:
                pairs.extend([F.lit(k), c.cast("string")])
            out = out.withColumn(META_COL, F.map_concat(F.col(META_COL), F.create_map(*pairs)))
        cols: dict[str, Column] = {}
        for path, col in self.assignments:
            if len(path) == 1:
                cols[path[0]] = col
            else:
                # nested path: build/extend a struct column
                head = path[0]
                base = cols.get(head)
                if base is None:
                    base = F.col(head) if head in out.columns else None
                rest = ".".join(str(p) for p in path[1:])
                if base is None:
                    c = col
                    for seg in reversed(path[1:]):
                        c = F.struct(c.alias(str(seg)))
                    cols[head] = c
                else:
                    cols[head] = base.withField(rest, col)
        if cols:
            out = out.withColumns(cols)
        if self.drops:
            out = out.drop(*[d for d in self.drops if d in out.columns])
        if self.row_filter is not None:
            out = out.filter(self.row_filter)
        if not mutate and not self.identity_root:
            keep = [p[0] for p, _ in self.assignments]
            from benthos_spark.operators.processors import META_COL

            extra = [META_COL] if (self.meta or META_COL in out.columns) and META_COL in out.columns else []
            seen: list[str] = []
            for k in keep + extra:
                if k not in seen:
                    seen.append(k)
            out = out.select(*seen)
        return out


def compile_mapping(ast: A.MappingAST, schema: Optional[T.StructType] = None) -> CompiledMapping:
    env = _Env(schema=schema, maps=ast.maps)
    assignments: list = []
    drops: list = []
    row_filter: Optional[Column] = None
    meta: list = []
    identity_root = False
    for stmt in ast.statements:
        if stmt.kind == "var":
            env.vars[stmt.path[0]] = _compile(stmt.expr, env)
            continue
        if stmt.kind == "meta":
            if not stmt.path:
                raise UnsupportedBloblang("whole-map meta assignment")
            c = _compile(stmt.expr, env)
            if c is _DELETED:
                raise UnsupportedBloblang("meta deletion")
            meta.append((stmt.path[0], c))
            continue
        # root assignment
        if not stmt.path:
            fdel = _compile_root_filter(stmt.expr, env)
            if fdel is not None:
                row_filter = fdel if row_filter is None else (row_filter & fdel)
                continue
            if isinstance(stmt.expr, A.ContextRef) and stmt.expr.name is None and not stmt.expr.path:
                identity_root = True
                continue
            if isinstance(stmt.expr, A.ObjectLit):
                for k, v in stmt.expr.pairs:
                    if not isinstance(k, A.Lit):
                        raise UnsupportedBloblang("dynamic object key at root")
                    c = _compile(v, env)
                    if c is _DELETED:
                        continue
                    assignments.append(((str(k.value),), c))
                    env.assigned[str(k.value)] = c
                continue
            # scalar root: the message becomes a single value — one
            # `value` column (≙ newPart.SetBytes/SetStructuredMut on a
            # non-object result, executor.go:225-239)
            c = _compile(stmt.expr, env)
            if c is _DELETED:
                row_filter = F.lit(False)
                continue
            assignments = [(("value",), c)]
            env.assigned = {"value": c}
            continue
        c = _compile(stmt.expr, env)
        if c is _DELETED:
            if len(stmt.path) > 1:
                raise UnsupportedBloblang("nested field deletion")
            drops.append(stmt.path[0])
            assignments = [(p, col) for p, col in assignments if p[0] != stmt.path[0]]
            continue
        assignments.append((tuple(str(p) for p in stmt.path), c))
        if len(stmt.path) == 1:
            env.assigned[str(stmt.path[0])] = c
    return CompiledMapping(
        assignments, drops, row_filter, meta, identity_root,
        reads_meta=bool(env.flags.get("reads_meta")),
    )


def _compile_root_filter(expr: A.Node, env: _Env) -> Optional[Column]:
    """`root = deleted()` / `root = if cond { deleted() }` — the
    canonical Bloblang message-filter idioms — compile to row filters.
    Returns the KEEP predicate, or None if this isn't a filter form."""
    if isinstance(expr, A.FuncCall) and expr.name == "deleted":
        return F.lit(False)
    if isinstance(expr, A.IfExpr) and not expr.elifs:
        then_del = isinstance(expr.then, A.FuncCall) and expr.then.name == "deleted"
        else_del = isinstance(expr.orelse, A.FuncCall) and getattr(expr.orelse, "name", None) == "deleted"
        if then_del and expr.orelse is None:
            return ~F.coalesce(_compile(expr.cond, env), F.lit(False))
        if then_del and isinstance(expr.orelse, A.ContextRef) and not expr.orelse.path:
            return ~F.coalesce(_compile(expr.cond, env), F.lit(False))
        if else_del and isinstance(expr.then, A.ContextRef) and not expr.then.path:
            return F.coalesce(_compile(expr.cond, env), F.lit(False))
    return None


# -- expression compiler -----------------------------------------------------


def _compile(node: A.Node, env: _Env):
    fn = _COMPILERS.get(type(node).__name__)
    if fn is None:
        raise UnsupportedBloblang(f"node {type(node).__name__}")
    return fn(node, env)


def _c_lit(node: A.Lit, env):
    return F.lit(node.value)


def _c_array(node: A.ArrayLit, env):
    return F.array(*[_compile(it, env) for it in node.items])


def _c_object(node: A.ObjectLit, env):
    cols = []
    for k, v in node.pairs:
        if not isinstance(k, A.Lit):
            raise UnsupportedBloblang("dynamic object key")
        cols.append(_compile(v, env).alias(str(k.value)))
    return F.struct(*cols)


def _field_type(schema, name):
    if schema is None:
        return None
    try:
        return schema[name].dataType
    except (KeyError, TypeError):
        return None


def _c_context(node: A.ContextRef, env: _Env):
    if node.name is not None:
        base = env.contexts.get(node.name)
        if base is None:
            raise UnsupportedBloblang(f"unknown context {node.name!r}")
        return _path_col(base, node.path)
    if env.this_col is not None:
        if not node.path:
            return env.this_col
        return _path_col(env.this_col, node.path)
    if not node.path:
        if env.schema is None:
            raise UnsupportedBloblang("bare `this` without schema")
        return F.struct(*[F.col(f.name) for f in env.schema.fields])
    head = node.path[0]
    if env.schema is not None and _field_type(env.schema, str(head)) is None:
        raise UnsupportedBloblang(f"unknown field {head!r}")
    return _path_col(F.col(str(head)), node.path[1:])


def _c_root(node: A.RootRef, env: _Env):
    if not node.path:
        raise UnsupportedBloblang("bare root reference in expression")
    head = str(node.path[0])
    base = env.assigned.get(head)
    if base is None:
        raise UnsupportedBloblang(f"root.{head} read before assignment")
    return _path_col(base, node.path[1:])


def _path_col(base: Column, path) -> Column:
    for seg in path:
        if isinstance(seg, int):
            base = F.get(base, F.lit(seg)) if hasattr(F, "get") else base[seg]
        else:
            base = base[str(seg)]
    return base


def _c_var(node: A.VarRef, env: _Env):
    if node.name not in env.vars:
        raise UnsupportedBloblang(f"variable {node.name} undefined")
    return env.vars[node.name]


def _c_meta(node: A.MetaRef, env: _Env):
    from benthos_spark.operators.processors import META_COL

    env.flags["reads_meta"] = True
    if node.key is None:
        return F.col(META_COL)
    return F.col(META_COL)[node.key]


def _c_not(node: A.Not, env):
    return ~_compile(node.expr, env)


def _c_neg(node: A.Neg, env):
    return -_compile(node.expr, env)


def _c_if(node: A.IfExpr, env):
    then = _compile(node.then, env)
    if then is _DELETED:
        raise UnsupportedBloblang("conditional field deletion")
    out = F.when(_compile(node.cond, env), then)
    for c, e in node.elifs:
        out = out.when(_compile(c, env), _compile(e, env))
    if node.orelse is not None:
        out = out.otherwise(_compile(node.orelse, env))
    return out


def _c_match(node: A.MatchExpr, env: _Env):
    sub_env = env
    if node.target is not None:
        tcol = _compile(node.target, env)
        sub_env = env.child(this_col=tcol)
    ctx = sub_env.this_col
    out = None
    for case, result in node.cases:
        res = _compile(result, sub_env)
        if case is None:
            cond = F.lit(True)
        elif isinstance(case, A.Lit):
            if ctx is None:
                # targetless match at mapping top level: the context is
                # the whole row object, which never equals a scalar
                # literal (ref query_expression_parser.go:78-132 — case
                # literals compare against the context value)
                if isinstance(case.value, (dict, list)):
                    raise UnsupportedBloblang("container literal match case")
                cond = F.lit(False)
            else:
                cond = ctx == F.lit(case.value)
        else:
            cond = _compile(case, sub_env)
        out = F.when(cond, res) if out is None else out.when(cond, res)
    if out is None:
        raise UnsupportedBloblang("empty match")
    return out


def _c_binop(node: A.BinOp, env: _Env):
    op = node.op
    if op == "|":
        return F.coalesce(_compile(node.left, env), _compile(node.right, env))
    left = _compile(node.left, env)
    right = _compile(node.right, env)
    if op == "+":
        if _is_stringy(node.left, env) or _is_stringy(node.right, env):
            return F.concat(left, right)
        return left + right
    if op == "-":
        return left - right
    if op == "*":
        return left * right
    if op == "/":
        return left.cast("double") / right.cast("double")
    if op == "%":
        return left % right
    if op == "==":
        return left == right
    if op == "!=":
        return left != right
    if op == ">":
        return left > right
    if op == ">=":
        return left >= right
    if op == "<":
        return left < right
    if op == "<=":
        return left <= right
    if op == "&&":
        return left & right
    if op == "||":
        return left | right
    raise UnsupportedBloblang(f"operator {op}")


_STR_METHODS = {
    "uppercase", "lowercase", "capitalize", "trim", "trim_prefix", "trim_suffix",
    "join", "replace_all", "re_replace_all", "quote", "string", "format_json",
    "slice", "strip_html", "escape_url_query", "unescape_url_query",
    "escape_html", "unescape_html", "format_timestamp", "ts_format", "reverse",
}


def _is_stringy(node: A.Node, env: _Env) -> bool:
    if isinstance(node, A.Lit):
        return isinstance(node.value, str)
    if isinstance(node, A.MethodCall):
        return node.name in _STR_METHODS
    if isinstance(node, A.BinOp) and node.op == "+":
        return _is_stringy(node.left, env) or _is_stringy(node.right, env)
    if isinstance(node, A.ContextRef) and env.schema is not None and node.name is None and len(node.path) == 1:
        return isinstance(_field_type(env.schema, str(node.path[0])), T.StringType)
    if isinstance(node, A.VarRef):
        return False
    return False


def _c_func(node: A.FuncCall, env: _Env):
    name = node.name
    if name == "deleted":
        return _DELETED
    args = node.args
    if name == "now":
        return B.now()
    if name == "timestamp_unix":
        return B.timestamp_unix()
    if name == "uuid_v4":
        return B.uuid_v4()
    if name == "ulid":
        return B.ulid()
    if name == "ksuid":
        return B.ksuid()
    if name == "nanoid":
        return B.nanoid(*[_lit_val(a) for a in args])
    if name == "snowflake_id":
        return B.snowflake_id(*[_lit_val(a) for a in args])
    if name == "random_int":
        return B.random_int(*[_lit_val(a) for a in args])
    if name == "counter":
        return B.counter()
    if name == "throw":
        return B.throw(_compile(args[0], env))
    if name == "range":
        vals = [_lit_val(a) for a in args]
        return B.range_(*vals)
    if name == "json":
        if not args:
            return _c_context(A.ContextRef(None, ()), env)
        path = _lit_val(args[0])
        return _c_context(A.ContextRef(None, tuple(path.split("."))), env)
    if name == "meta" or name == "metadata":
        key = _lit_val(args[0]) if args else None
        return _c_meta(A.MetaRef(key), env)
    if name == "var":
        return _c_var(A.VarRef(_lit_val(args[0])), env)
    if name == "hostname":
        import socket

        return F.lit(socket.gethostname())
    if name == "env":
        import os

        return F.lit(os.environ.get(_lit_val(args[0])))
    if name == "tracing_span":
        # TextMap of the message's span — {traceparent: ...} or null when
        # untraced (query/functions.go:232; streaming/tracing.py injects
        # the header)
        tp = _c_meta(A.MetaRef("traceparent"), env)
        return F.when(tp.isNotNull(), F.struct(tp.alias("traceparent")))
    if name == "tracing_id":
        # the 32-hex trace id; ZEROED when the message has no span
        # (query/functions.go:252-262)
        tp = _c_meta(A.MetaRef("traceparent"), env)
        return F.coalesce(F.substring(tp, 4, 32), F.lit("0" * 32))
    raise UnsupportedBloblang(f"function {name}")


def _lit_val(node: A.Node):
    if isinstance(node, A.Lit):
        return node.value
    if isinstance(node, A.Neg) and isinstance(node.expr, A.Lit):
        return -node.expr.value
    raise UnsupportedBloblang("argument must be a literal")


def _lambda_fn(node: A.Lambda, env: _Env):
    # Spark validates higher-order-function callables as 1-3 positional
    # params — no *args allowed.
    def fn(c: Column) -> Column:
        sub = env.child(contexts=dict(env.contexts), this_col=c)
        if node.param != "_":
            sub.contexts[node.param] = c
        return _compile(node.body, sub)

    return fn


# methods whose named (kwarg) form the Column tier understands; any
# other named args force the dynamic tier instead of being dropped
_NAMED_OK: dict = {}


def _c_method(node: A.MethodCall, env: _Env):
    name = node.name
    if node.named and name not in _NAMED_OK:
        raise UnsupportedBloblang(f"named arguments on {name} (dynamic tier)")
    target = _compile(node.target, env)
    if target is _DELETED:
        raise UnsupportedBloblang("method on deleted()")

    def lam(i: int):
        a = node.args[i]
        if not isinstance(a, A.Lambda):
            raise UnsupportedBloblang(f"{name} needs a lambda argument")
        return _lambda_fn(a, env)

    def val(i: int, default=None):
        if i >= len(node.args):
            return default
        return _lit_val(node.args[i])

    def col(i: int):
        return _compile(node.args[i], env)

    nargs = len(node.args)
    if name == "apply":
        return _apply_map_col(_lit_val(node.args[0]), target, env)
    if name == "catch":
        return B.catch_(target, col(0))
    if name == "or":
        return B.or_(target, col(0))
    if name in ("string",):
        # structs/arrays/maps stringify as JSON (reference AsBytes), not
        # Spark's struct-display format
        if _infer_is_container(node.target, env) or (
            isinstance(node.target, A.ContextRef)
            and node.target.name is None
            and not node.target.path
        ):
            return F.to_json(target)
        return target.cast("string")
    if name in ("number", "float64"):
        return target.cast("double")
    if name in ("int64", "int32", "uint64"):
        return target.cast("long")
    if name == "bool":
        return target.cast("boolean")
    if name == "bytes":
        return target.cast("binary")
    if name == "uppercase":
        return B.uppercase(target)
    if name == "lowercase":
        return B.lowercase(target)
    if name == "capitalize":
        return B.capitalize(target)
    if name == "trim":
        return B.trim(target, val(0))
    if name == "trim_prefix":
        return B.trim_prefix(target, val(0))
    if name == "trim_suffix":
        return B.trim_suffix(target, val(0))
    if name == "has_prefix":
        return B.has_prefix(target, col(0))
    if name == "has_suffix":
        return B.has_suffix(target, col(0))
    if name == "index_of":
        return B.index_of(target, col(0))
    if name == "split":
        return B.split(target, val(0))
    if name == "join":
        return B.join(target, val(0, ""))
    if name == "replace_all":
        return B.replace_all(target, val(0), val(1))
    if name == "re_replace_all":
        return B.re_replace_all(target, val(0), val(1))
    if name == "re_match":
        return B.re_match(target, val(0))
    if name == "re_find_all":
        return B.re_find_all(target, val(0))
    if name == "quote":
        return B.quote(target)
    if name == "reverse":
        return B.reverse(target)
    if name == "length":
        # Bloblang length() is polymorphic: element count for arrays/
        # objects, byte/char count for strings (methods.go `length`)
        if _infer_is_container(node.target, env):
            return F.size(target)
        return B.length(target)
    if name == "slice":
        return B.slice_(target, val(0), val(1))
    if name == "contains":
        return B.contains(target, col(0))
    if name == "strip_html":
        if nargs:
            raise UnsupportedBloblang("strip_html tag allowlist (dynamic tier)")
        return B.strip_html(target)
    if name in ("escape_url_query", "unescape_url_query", "escape_html", "unescape_html"):
        return getattr(B, name)(target)
    if name == "encode":
        scheme = val(0)
        if scheme == "base64":
            return B.encode_b64(target)
        if scheme == "hex":
            return B.encode_hex(target)
        raise UnsupportedBloblang(f"encode scheme {scheme}")
    if name == "decode":
        scheme = val(0)
        if scheme == "base64":
            return B.decode_b64(target)
        if scheme == "hex":
            return B.decode_hex(target)
        raise UnsupportedBloblang(f"decode scheme {scheme}")
    if name == "hash":
        return B.hash_(target, val(0, "sha256"))
    if name == "parse_json":
        if not nargs:
            raise UnsupportedBloblang("parse_json without target schema (dynamic path)")
        return B.parse_json(target, val(0))
    if name == "format_json":
        return B.format_json(target)
    if name == "parse_csv":
        return B.parse_csv(target, val(0))
    if name == "floor":
        return B.floor(target)
    if name == "ceil":
        return B.ceil(target)
    if name == "round":
        return B.round_(target, val(0, 0))
    if name == "abs":
        return B.abs_(target)
    if name == "max":
        return F.array_max(target)
    if name == "min":
        return F.array_min(target)
    if name == "log":
        return F.log(target)
    if name == "log10":
        return F.log10(target)
    if name == "not_empty":
        return B.not_empty(target)
    if name == "not_null":
        return F.when(target.isNotNull(), target).otherwise(B.throw(F.lit("value is null")))
    if name == "type":
        return B.type_of(target)
    if name == "map_each":
        return B.map_each(target, lam(0))
    if name == "map_each_key":
        return B.map_each_key(target, lam(0))
    if name == "filter":
        return B.filter_(target, lam(0))
    if name == "fold":
        if nargs == 2 and isinstance(node.args[1], A.Lambda):
            la = node.args[1]
            # reference fold lambda receives {tally, value}
            def fold_fn(acc: Column, v: Column) -> Column:
                struct_ctx = F.struct(acc.alias("tally"), v.alias("value"))
                sub = env.child(contexts=dict(env.contexts), this_col=struct_ctx)
                if la.param != "_":
                    sub.contexts[la.param] = struct_ctx
                return _compile(la.body, sub)

            return B.fold(target, col(0), fold_fn)
        raise UnsupportedBloblang("fold requires (init, lambda)")
    if name == "all":
        return B.all_(target, lam(0))
    if name == "any":
        return B.any_(target, lam(0))
    if name == "append":
        return B.append(target, *[_compile(a, env) for a in node.args])
    if name == "concat":
        return B.concat_arrays(target, *[_compile(a, env) for a in node.args])
    if name == "flatten":
        return B.flatten(target)
    if name == "index":
        return B.index(target, _lit_val(node.args[0]))
    if name == "first":
        return B.index(target, 0)
    if name == "last":
        return F.element_at(target, -1)
    if name == "sort":
        if nargs:
            raise UnsupportedBloblang("sort with comparator")
        return B.sort(target)
    if name == "sort_by":
        return B.sort_by(target, lam(0))
    if name == "sum":
        return B.sum_(target)
    if name == "unique":
        return B.unique(target)
    if name == "enumerated":
        return B.enumerated(target)
    if name == "zip":
        # Bloblang zip yields arrays of (possibly heterogeneous) tuples —
        # not a typed Spark array; dynamic tier
        raise UnsupportedBloblang("zip (heterogeneous tuples, dynamic tier)")
    if name == "keys":
        return B.keys(target)
    if name == "values":
        return B.values(target)
    if name == "key_values":
        return B.key_values(target)
    if name == "merge":
        return B.merge(target, col(0))
    if name == "without":
        return B.without(target, *[_lit_val(a) for a in node.args])
    if name == "with":
        return B.with_only(target, *[_lit_val(a) for a in node.args])
    if name == "get":
        return B.get(target, _lit_val(node.args[0]))
    if name == "exists":
        return B.get(target, _lit_val(node.args[0])).isNotNull()
    if name in ("ts_parse", "parse_timestamp"):
        return B.ts_parse(target, val(0)) if nargs else target.cast("timestamp")
    if name in ("ts_format", "format_timestamp"):
        return B.ts_format(target, val(0)) if nargs else target.cast("string")
    if name == "ts_unix":
        return B.ts_unix(target)
    if name == "ts_unix_milli":
        return B.ts_unix_milli(target)
    if name == "ts_round":
        return B.ts_round(target, val(0))
    if name == "ts_tz":
        return B.ts_tz(target, val(0))
    if name == "ts_sub":
        return B.ts_sub(target, col(0))
    if name == "json_path":
        return B.json_path(target, val(0))
    if name == "parse_duration":
        return B.parse_duration(target)
    if name == "parse_duration_iso8601":
        return B.parse_duration_iso8601(target)
    if name == "ts_strftime":
        if nargs > 1:
            raise UnsupportedBloblang("ts_strftime with tz")
        try:
            return B.ts_strftime(target, val(0))
        except ValueError as e:
            raise UnsupportedBloblang(str(e))
    if name == "ts_strptime":
        try:
            return B.ts_strptime(target, val(0))
        except ValueError as e:
            raise UnsupportedBloblang(str(e))
    if name == "filepath_join":
        return F.regexp_replace(F.array_join(target, "/"), "//", "/")
    if name == "filepath_split":
        return B.filepath_split_pair(target)
    if name == "parse_xml":
        return B.parse_xml(target, val(0))
    if name == "format_xml":
        return B.format_xml(target)
    raise UnsupportedBloblang(f"method {name}")


def _apply_map_col(map_name: str, target: Column, env: _Env):
    stmts = env.maps.get(map_name)
    if stmts is None:
        raise UnsupportedBloblang(f"map {map_name!r} not found")
    sub = env.child(contexts=dict(env.contexts), vars=dict(env.vars), this_col=target)
    # nested assignment tree: name -> Column | subtree (insertion-ordered,
    # later assignments to the same path replace)
    tree: dict = {}
    single: Optional[Column] = None

    def _set(path, col):
        node = tree
        for seg in path[:-1]:
            nxt = node.get(str(seg))
            if not isinstance(nxt, dict):
                if nxt is not None and isinstance(nxt, Column):
                    # writing under a previously-assigned scalar: patch
                    # the struct column field-by-field
                    raise UnsupportedBloblang("sub-path write into an expression value")
                nxt = {}
                node[str(seg)] = nxt
            node = nxt
        node[str(path[-1])] = col

    def _del(path):
        node = tree
        for seg in path[:-1]:
            node = node.get(str(seg))
            if not isinstance(node, dict):
                return  # nothing assigned there: deletion is a no-op
        node.pop(str(path[-1]), None)

    for stmt in stmts:
        if stmt.kind == "var":
            sub.vars[stmt.path[0]] = _compile(stmt.expr, sub)
            continue
        c = _compile(stmt.expr, sub)
        if c is _DELETED:
            if stmt.path:
                _del(stmt.path)
            continue
        if not stmt.path:
            single = c
            tree.clear()
        else:
            _set(stmt.path, c)
            single = None

    def _build(node: dict) -> Column:
        return F.struct(
            *[
                (_build(v) if isinstance(v, dict) else v).alias(k)
                for k, v in node.items()
            ]
        )

    if single is not None:
        return single
    if tree:
        return _build(tree)
    raise UnsupportedBloblang(f"map {map_name!r} produced no assignments")


# methods whose result is an array/map regardless of input
_CONTAINER_METHODS = {
    "filter", "map_each", "sort", "sort_by", "unique", "append", "concat",
    "flatten", "enumerated", "zip", "keys", "values", "key_values", "split",
    "re_find_all", "without", "with", "merge", "slice",
}


def _dt_at_path(dt: Optional[T.DataType], path) -> Optional[T.DataType]:
    for seg in path:
        if isinstance(dt, T.StructType):
            dt = _field_type(dt, str(seg))
        elif isinstance(dt, T.ArrayType) and isinstance(seg, int):
            dt = dt.elementType
        elif isinstance(dt, T.MapType):
            dt = dt.valueType
        else:
            return None
    return dt


def _infer_is_container(node: A.Node, env: _Env) -> bool:
    if isinstance(node, (A.ArrayLit, A.ObjectLit)):
        return True
    if isinstance(node, A.MethodCall):
        return node.name in _CONTAINER_METHODS
    if isinstance(node, A.ContextRef) and node.name is None and env.this_col is None:
        dt = _dt_at_path(env.schema, node.path)
        return isinstance(dt, (T.ArrayType, T.MapType))
    if isinstance(node, A.GetField):
        # collapse to a context path when possible
        flat = _flatten_path(node)
        if flat is not None:
            return _infer_is_container(flat, env)
    return False


def _flatten_path(node: A.GetField) -> Optional[A.ContextRef]:
    segs: list = [node.seg]
    cur = node.target
    while isinstance(cur, A.GetField):
        segs.append(cur.seg)
        cur = cur.target
    if isinstance(cur, A.ContextRef):
        return A.ContextRef(cur.name, cur.path + tuple(reversed(segs)))
    return None


def _c_getfield(n: A.GetField, e: _Env):
    # `this.a.b` arrives as GetField chains — collapse onto the context
    # ref so we emit col("a")["b"] instead of struct(*).a.b (which also
    # works schema-less: the head becomes a plain column reference)
    flat = _flatten_path(n)
    if flat is not None:
        return _c_context(flat, e)
    return _path_col(_compile(n.target, e), (n.seg,))


_COMPILERS = {
    "Lit": _c_lit,
    "ArrayLit": _c_array,
    "ObjectLit": _c_object,
    "ContextRef": _c_context,
    "RootRef": _c_root,
    "VarRef": _c_var,
    "MetaRef": _c_meta,
    "GetField": _c_getfield,
    "ExprTail": lambda n, e: _compile(n.sub, e.child(this_col=_compile(n.target, e))),
    "Not": _c_not,
    "Neg": _c_neg,
    "BinOp": _c_binop,
    "IfExpr": _c_if,
    "MatchExpr": _c_match,
    "FuncCall": _c_func,
    "MethodCall": _c_method,
}
