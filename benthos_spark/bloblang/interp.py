"""Dynamic-document Bloblang evaluator.

Evaluates a parsed mapping over plain JSON values (dict/list/str/num/
bool/None/bytes), reproducing the reference executor's semantics
(internal/bloblang/mapping/executor.go:147 mapPart):

- the new document starts as Nothing; a ``root`` assignment of Nothing
  is skipped; assigning ``deleted()`` to root deletes the message
  (executor.go:167,204,225)
- statements run in order; ``let`` fills the variable scope, ``meta``
  the metadata map
- arithmetic follows the number-degradation rules (query/arithmetic.go:
  101-132): int op int stays int except ``/`` (always float) and ``%``
  (int only); ``+`` concatenates strings; ``|`` coalesces on error/null
- method/function behavior follows the public Bloblang spec
  (website/docs/guides/bloblang/methods.md + functions.md in the
  reference; each entry cites its Go impl)

Used by the golden-test harness (``benthos test`` analogue) and by the
Arrow-batched ``mapInPandas`` fallback in processor.py for mappings the
Column compiler can't express.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import json
import math
import re as _re
from typing import Any, Optional

from benthos_spark.bloblang import ast as A
from benthos_spark.bloblang.parser import parse_mapping


class BloblangError(Exception):
    pass


class _NothingType:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "Nothing"


class _DeletedType(_NothingType):
    _inst = None

    def __repr__(self):
        return "Deleted"


NOTHING = _NothingType()
DELETED = _DeletedType()


class Raw(str):
    """Unstructured message content: the reference errors when `this`
    is referenced on content that doesn't parse as JSON
    (executor.go:195 "unable to reference message as structured").
    Wrap non-JSON content in Raw to get that behavior; plain str docs
    stay directly addressable (a JSON string scalar)."""


class Scope:
    __slots__ = ("doc", "named", "vars", "meta", "root_ref", "maps", "error", "message",
                 "batch", "index")

    def __init__(self, doc, named=None, vars=None, meta=None, root_ref=None, maps=None,
                 message=None, batch=None, index=0, error=None):
        self.doc = doc
        self.error = error
        self.named = named or {}
        self.vars = vars if vars is not None else {}
        self.meta = meta if meta is not None else {}
        self.root_ref = root_ref  # 1-element list holding the new doc
        self.maps = maps or {}
        # the original message content: content() reads THIS even inside
        # lambda/match contexts (functions.go content() is message-level)
        self.message = doc if message is None else message
        # batch context (from_all()/.from(i)/batch_index(), the reference's
        # windowed batch functions — query/functions.go batch accessors)
        self.batch = batch if batch is not None else [self.message]
        self.index = index

    def child_context(self, doc, name: Optional[str] = None):
        named = self.named
        if name is not None:
            named = dict(named)
            named[name] = doc
        s = Scope(doc, named, self.vars, self.meta, self.root_ref, self.maps,
                  message=self.message, batch=self.batch, index=self.index)
        return s


def _type_name(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "number"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, bytes):
        return "bytes"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, _dt.datetime):
        return "timestamp"
    return type(v).__name__


def _as_string(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        # Go json encoding: integral floats print without exponent/decimal
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (dict, list)):
        return _format_json(v)
    return str(v)


def _as_number(v) -> float:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        if isinstance(v, str):
            try:
                return int(v)
            except ValueError:
                try:
                    return float(v)
                except ValueError:
                    pass
        raise BloblangError(f"expected number value, got {_type_name(v)}")
    return v


def _as_int(v) -> int:
    n = _as_number(v)
    if isinstance(n, float):
        if n != int(n):
            raise BloblangError(f"expected integer value, got {n}")
        return int(n)
    return n


def _as_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    raise BloblangError(f"expected bool value, got {_type_name(v)}")


def _ts_json(ts: _dt.datetime) -> str:
    s = ts.isoformat()
    s = _re.sub(r"\.(\d*?)0+(?=$|[Z+-])", lambda m: "." + m.group(1) if m.group(1) else "", s)
    return s.replace("+00:00", "Z")


def _json_default(v):
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, _dt.datetime):
        return _ts_json(v)
    raise TypeError(str(type(v)))


def _format_json(v) -> str:
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False, default=_json_default)


def _get_path(v, path):
    for seg in path:
        if v is NOTHING or v is DELETED:
            return NOTHING
        if isinstance(seg, int) or (isinstance(seg, str) and seg.lstrip("-").isdigit()):
            i = int(seg)
            if isinstance(v, list):
                if -len(v) <= i < len(v):
                    v = v[i]
                else:
                    return None
            elif isinstance(v, dict):
                v = v.get(str(seg))
            else:
                return None
        elif isinstance(v, dict):
            v = v.get(seg)
        else:
            return None
    return v


def _set_path(container, path, value):
    """Create nested objects along the way (gabs-style assignment,
    mapping/assignment.go). The segment ``-`` on a LIST target appends
    (gabs array-append — what config templates use to build processor
    lists, internal/template/template.go)."""
    if not path:
        return value
    if not isinstance(container, (dict, list)):
        container = {}
    root = container
    cur = container
    for i, seg in enumerate(path[:-1]):
        if isinstance(cur, list) and seg == "-":
            nxt = {}
            cur.append(nxt)
            cur = nxt
            continue
        nxt = cur.get(seg) if isinstance(cur, dict) else None
        if path[i + 1] == "-":
            # the next segment appends: this level must be a list
            if not isinstance(nxt, list):
                nxt = []
                cur[seg] = nxt
        elif not isinstance(nxt, dict):
            nxt = {}
            cur[seg] = nxt
        cur = nxt
    last = path[-1]
    if isinstance(cur, list) and last == "-":
        if value is not DELETED:
            cur.append(value)
        return root
    if value is DELETED:
        cur.pop(last, None)
    else:
        cur[last] = value
    return root


def _icompare(a, b) -> bool:
    """query.ICompare: numbers compare numerically across int/float."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


def _sort_key(v):
    """Total order for sort(): numbers < strings, like the reference's
    ICompare-based sort which errors on mixed types; we order by type
    name then value to stay deterministic."""
    if isinstance(v, bool):
        return (0, v)
    if isinstance(v, (int, float)):
        return (1, float(v), "")
    if isinstance(v, str):
        return (2, 0.0, v)
    return (3, 0.0, _format_json(v))


class Executor:
    """Parsed mapping + maps, executable per message
    (≙ mapping.Executor, internal/bloblang/mapping/executor.go)."""

    def __init__(self, src_or_ast):
        if isinstance(src_or_ast, A.MappingAST):
            self.ast = src_or_ast
        else:
            self.ast = parse_mapping(src_or_ast)

    # -- public -------------------------------------------------------------
    def map_part(self, doc, meta: Optional[dict] = None, mutate: bool = False,
                 batch=None, index: int = 0, error: Optional[str] = None):
        """Run the mapping over one document. Returns (new_doc, new_meta);
        new_doc is DELETED when the message is deleted (root = deleted()).
        ``mutate=True`` starts root as a copy of the input (the `mutation`
        processor's MapOnto path, executor.go:143). ``batch``/``index``
        provide the batch context for from_all()/batch_index()."""
        meta = dict(meta or {})
        import copy

        root_ref = [copy.deepcopy(doc) if mutate else NOTHING]
        scope = Scope(doc, vars={}, meta=meta, root_ref=root_ref, maps=self.ast.maps,
                      batch=batch, index=index, error=error)
        for stmt in self.ast.statements:
            try:
                res = self.eval(stmt.expr, scope)
            except BloblangError as e:
                # Go parity: mapping errors carry the failing statement's
                # line (executor.go:202 "failed assignment (line %v): %w")
                if str(e).startswith("failed assignment"):
                    raise
                raise BloblangError(
                    f"failed assignment (line {stmt.line or 1}): {e}"
                ) from e
            if res is NOTHING:
                continue  # skip assignment entirely (executor.go:204)
            if isinstance(res, (dict, list)):
                # assignments CLONE the value (assignment.go IClone):
                # `root = this` must not alias the input — later path
                # writes would corrupt the source message/batch
                res = copy.deepcopy(res)
            if stmt.kind == "var":
                scope.vars[stmt.path[0]] = res
            elif stmt.kind == "meta":
                if res is DELETED:
                    if stmt.path:
                        meta.pop(stmt.path[0], None)
                    else:
                        meta.clear()
                elif stmt.path:
                    meta[stmt.path[0]] = res
                elif isinstance(res, dict):
                    meta.clear()
                    meta.update(res)
                else:
                    raise BloblangError("setting root meta requires object value")
            else:  # root
                if not stmt.path:
                    root_ref[0] = res
                else:
                    if root_ref[0] is NOTHING or root_ref[0] is DELETED:
                        root_ref[0] = {}
                    if not isinstance(root_ref[0], dict):
                        raise BloblangError(
                            f"failed to assign mapping results: unable to navigate "
                            f"path on {_type_name(root_ref[0])} value"
                        )
                    root_ref[0] = _set_path(root_ref[0], list(stmt.path), res)
        out = root_ref[0]
        if out is NOTHING:
            # no root assignment: the original contents are unchanged
            # (executor.go:225 "case query.Nothing: Do not change")
            out = doc
        return out, meta

    def map_batch(self, docs, metas=None, mutate: bool = False):
        """Run the mapping over a whole batch with batch context
        (ProcessBatch semantics). Returns [(doc, meta)] with deleted
        messages removed."""
        metas = metas or [{} for _ in docs]
        out = []
        for i, (d, m) in enumerate(zip(docs, metas)):
            nd, nm = self.map_part(d, m, mutate=mutate, batch=list(docs), index=i)
            if nd is not DELETED:
                out.append((nd, nm))
        return out

    def query(self, doc, meta: Optional[dict] = None):
        """Evaluate as a boolean check (QueryPart, executor.go:111)."""
        out, _ = self.map_part(doc, meta)
        return out

    # -- evaluation ---------------------------------------------------------
    def eval(self, node, scope: Scope):
        m = getattr(self, "_eval_" + type(node).__name__, None)
        if m is None:
            raise BloblangError(f"unsupported node {type(node).__name__}")
        return m(node, scope)

    def _eval_Lit(self, node, scope):
        return node.value

    def _eval_ArrayLit(self, node, scope):
        out = []
        for it in node.items:
            v = self.eval(it, scope)
            if v is NOTHING or v is DELETED:
                continue
            out.append(v)
        return out

    def _eval_ObjectLit(self, node, scope):
        out = {}
        for k, v in node.pairs:
            key = _as_string(self.eval(k, scope))
            val = self.eval(v, scope)
            if val is DELETED or val is NOTHING:
                continue
            out[key] = val
        return out

    def _eval_ContextRef(self, node, scope):
        if node.name is not None:
            base = scope.named[node.name]
        else:
            base = scope.doc
            if isinstance(base, Raw):
                raise BloblangError(
                    "unable to reference message as structured (with 'this')"
                )
        return _get_path(base, node.path)

    def _eval_RootRef(self, node, scope):
        if scope.root_ref is None:
            raise BloblangError("root is not accessible in this context")
        base = scope.root_ref[0]
        if base is NOTHING:
            return None
        return _get_path(base, node.path)

    def _eval_VarRef(self, node, scope):
        if node.name not in scope.vars:
            raise BloblangError(f"variable {node.name} undefined")
        return scope.vars[node.name]

    def _eval_MetaRef(self, node, scope):
        if node.key is None:
            return dict(scope.meta)
        return scope.meta.get(node.key)

    def _eval_GetField(self, node, scope):
        v = self.eval(node.target, scope)
        return _get_path(v, (node.seg,))

    def _eval_ExprTail(self, node, scope):
        v = self.eval(node.target, scope)
        return self.eval(node.sub, scope.child_context(v))

    def _eval_Not(self, node, scope):
        return not _as_bool(self.eval(node.expr, scope))

    def _eval_Neg(self, node, scope):
        v = _as_number(self.eval(node.expr, scope))
        return -v

    def _eval_Lambda(self, node, scope):
        raise BloblangError("lambda used outside a method argument")

    def _eval_IfExpr(self, node, scope):
        if _as_bool(self.eval(node.cond, scope)):
            return self.eval(node.then, scope)
        for c, e in node.elifs:
            if _as_bool(self.eval(c, scope)):
                return self.eval(e, scope)
        if node.orelse is not None:
            return self.eval(node.orelse, scope)
        return NOTHING

    def _eval_MatchExpr(self, node, scope):
        ctx_scope = scope
        if node.target is not None:
            ctx_scope = scope.child_context(self.eval(node.target, scope))
        for case, result in node.cases:
            if case is None:
                return self.eval(result, ctx_scope)
            if isinstance(case, A.Lit):
                if ctx_scope.doc is not None and _icompare(ctx_scope.doc, case.value):
                    return self.eval(result, ctx_scope)
            else:
                if _as_bool(self.eval(case, ctx_scope)):
                    return self.eval(result, ctx_scope)
        return NOTHING

    def _eval_BinOp(self, node, scope):
        op = node.op
        if op == "|":
            try:
                left = self.eval(node.left, scope)
            except BloblangError:
                return self.eval(node.right, scope)
            if left is None or left is NOTHING:
                return self.eval(node.right, scope)
            return left
        if op == "&&":
            return _as_bool(self.eval(node.left, scope)) and _as_bool(self.eval(node.right, scope))
        if op == "||":
            return _as_bool(self.eval(node.left, scope)) or _as_bool(self.eval(node.right, scope))
        left = self.eval(node.left, scope)
        right = self.eval(node.right, scope)
        return _arith(op, left, right)

    def _eval_FuncCall(self, node, scope):
        args = [self.eval(a, scope) for a in node.args]
        named = {k: self.eval(v, scope) for k, v in node.named}
        return _call_function(node.name, args, named, scope)

    def _eval_MethodCall(self, node, scope):
        name = node.name
        if name == "catch":
            # lazy: fallback evaluated only on error (methods.go `catch`);
            # a lambda fallback receives the error message as context
            try:
                target = self.eval(node.target, scope)
            except BloblangError as e:
                fb = node.args[0]
                if isinstance(fb, A.Lambda):
                    return _LambdaFn(self, fb, scope)(str(e))
                return self.eval(fb, scope)
            return target
        if name == "or":
            # lazy: methods.go `or` replaces a FAILED or null target
            try:
                target = self.eval(node.target, scope)
            except BloblangError:
                return self.eval(node.args[0], scope)
            if target is None or target is NOTHING:
                return self.eval(node.args[0], scope)
            return target
        if name == "from_all":
            # evaluate the target once per message in the batch
            out = []
            for d in scope.batch:
                sub = Scope(d, {}, scope.vars, scope.meta, scope.root_ref, scope.maps,
                            message=d, batch=scope.batch, index=scope.index)
                out.append(self.eval(node.target, sub))
            return out
        if name == "from":
            i = self.eval(node.args[0], scope)
            d = scope.batch[_as_int(i)]
            sub = Scope(d, {}, scope.vars, scope.meta, scope.root_ref, scope.maps,
                        message=d, batch=scope.batch, index=scope.index)
            return self.eval(node.target, sub)
        target = self.eval(node.target, scope)
        if name == "apply":
            map_name = _as_string(self.eval(node.args[0], scope))
            return self._apply_map(map_name, target, scope)
        query_arg_idx = _QUERY_ARGS.get(name, ())
        args = []
        for i, a in enumerate(node.args):
            if isinstance(a, A.Lambda):
                args.append(_LambdaFn(self, a, scope))
            elif i in query_arg_idx:
                # non-lambda query arg: evaluated per element with `this`
                # rebound to it (map_each(this.value.uppercase()) form,
                # query_parser.go — the named-context lambda is optional)
                args.append(_QueryFn(self, a, scope))
            else:
                args.append(self.eval(a, scope))
        named = {k: self.eval(v, scope) for k, v in node.named}
        fn = _METHODS.get(name)
        if fn is None:
            raise BloblangError(f"unrecognised method {name!r}")
        try:
            return fn(target, *args, **named)
        except TypeError as e:
            raise BloblangError(f"method {name}: {e}") from e
        except BloblangError as e:
            # Go parity: type errors are annotated ONCE with the field the
            # offending value came from (query/errors.go ErrFrom +
            # TypeError.From; fieldFunction.Annotation)
            msg = str(e)
            if (
                msg.startswith("expected ")
                and " from " not in msg
                and " value, got " in msg
            ):
                ann = _field_annotation(node.target)
                if ann:
                    raise BloblangError(f"{msg} from {ann}") from e
            raise

    def _apply_map(self, name: str, value, scope: Scope):
        stmts = scope.maps.get(name)
        if stmts is None:
            raise BloblangError(f"map {name!r} not found")
        sub_root = [NOTHING]
        sub = Scope(value, {}, {}, scope.meta, sub_root, scope.maps)
        for stmt in stmts:
            res = self.eval(stmt.expr, sub)
            if res is NOTHING:
                continue
            if isinstance(res, (dict, list)):
                import copy as _copy

                res = _copy.deepcopy(res)
            if stmt.kind == "var":
                sub.vars[stmt.path[0]] = res
            elif not stmt.path:
                sub_root[0] = res
            else:
                if sub_root[0] is NOTHING:
                    sub_root[0] = {}
                sub_root[0] = _set_path(sub_root[0], list(stmt.path), res)
        return None if sub_root[0] is NOTHING else sub_root[0]


# methods whose (positional) args are queries evaluated per element
_QUERY_ARGS = {
    "map_each": (0,),
    "map_each_key": (0,),
    "filter": (0,),
    "sort_by": (0,),
    "sort": (0,),
    "all": (0,),
    "any": (0,),
    "fold": (1,),
    "find_by": (0,),
    "find_all_by": (0,),
}


class _QueryFn:
    """A non-lambda query argument: evaluated with `this` rebound to
    each element (the implicit-context form of mapping args)."""

    __slots__ = ("ex", "node", "scope")

    def __init__(self, ex: "Executor", node, scope: Scope):
        self.ex = ex
        self.node = node
        self.scope = scope

    def __call__(self, value):
        return self.ex.eval(self.node, self.scope.child_context(value))


class _LambdaFn:
    """A lambda argument bound to its defining scope."""

    __slots__ = ("ex", "node", "scope")

    def __init__(self, ex: Executor, node: A.Lambda, scope: Scope):
        self.ex = ex
        self.node = node
        self.scope = scope

    def __call__(self, value):
        name = None if self.node.param == "_" else self.node.param
        return self.ex.eval(self.node.body, self.scope.child_context(value, name))


def _arith(op, left, right):
    if op == "+":
        if isinstance(left, _dt.datetime):
            return left + _dt.timedelta(seconds=_as_number(right))
        if isinstance(left, bytes):
            # []byte + x stays bytes (arithmetic.go sumOp string/[]byte case)
            return left + (right if isinstance(right, bytes) else _as_string(right).encode())
        if isinstance(left, str):
            return left + _as_string(right)
        a, b = _as_number(left), _as_number(right)
        return a + b
    if op == "-":
        if isinstance(left, _dt.datetime):
            if isinstance(right, _dt.datetime):
                return (left - right).total_seconds()
            return left - _dt.timedelta(seconds=_as_number(right))
        return _as_number(left) - _as_number(right)
    if op == "*":
        return _as_number(left) * _as_number(right)
    if op == "/":
        b = _as_number(right)
        if b == 0:
            raise BloblangError("attempted to divide by zero")
        return float(_as_number(left)) / float(b)
    if op == "%":
        b = _as_int(right)
        if b == 0:
            raise BloblangError("attempted to divide by zero")
        a = _as_int(left)
        # Go's % truncates toward zero
        r = math.fmod(a, b)
        return int(r)
    if op == "==":
        return _icompare(left, right)
    if op == "!=":
        return not _icompare(left, right)
    if op in (">", ">=", "<", "<="):
        if isinstance(left, str) and isinstance(right, str):
            a, b = left, right
        else:
            a, b = _as_number(left), _as_number(right)
        if op == ">":
            return a > b
        if op == ">=":
            return a >= b
        if op == "<":
            return a < b
        return a <= b
    raise BloblangError(f"unknown operator {op}")


# -- functions (internal/impl/pure/functions.go + query docs) ----------------


def _call_function(name, args, named, scope: Scope):
    if name == "deleted":
        return DELETED
    if name == "this":
        return scope.doc
    if name == "content":
        doc = scope.message
        if isinstance(doc, (bytes, str)):
            return bytes(doc) if isinstance(doc, bytes) else str(doc).encode()
        return _format_json(doc).encode()
    if name == "json":
        path = args[0] if args else ""
        if not path:
            return scope.doc
        return _get_path(scope.doc, tuple(path.split(".")))
    if name == "meta" or name == "metadata":
        if not args:
            return dict(scope.meta)
        return scope.meta.get(_as_string(args[0]))
    if name == "tracing_span":
        tp = scope.meta.get("traceparent")
        return {"traceparent": tp} if tp else None
    if name == "tracing_id":
        tp = scope.meta.get("traceparent")
        return tp.split("-")[1] if tp and len(tp.split("-")) == 4 else "0" * 32
    if name == "var":
        return scope.vars.get(_as_string(args[0]))
    if name == "error":
        return scope.error if hasattr(scope, "error") else None
    if name == "errored":
        return getattr(scope, "error", None) is not None
    if name == "range":
        start = _as_int(named.get("start", args[0] if args else 0))
        stop = _as_int(named.get("stop", args[1] if len(args) > 1 else 0))
        step = _as_int(named.get("step", args[2] if len(args) > 2 else 1))
        return list(range(start, stop, step))
    if name == "now":
        return _dt.datetime.now(_dt.timezone.utc).isoformat()
    if name == "timestamp_unix":
        return int(_dt.datetime.now(_dt.timezone.utc).timestamp())
    if name == "timestamp_unix_milli":
        return int(_dt.datetime.now(_dt.timezone.utc).timestamp() * 1000)
    if name == "timestamp_unix_nano":
        return int(_dt.datetime.now(_dt.timezone.utc).timestamp() * 1e9)
    if name == "uuid_v4":
        import uuid

        return str(uuid.uuid4())
    if name == "nanoid":
        import secrets
        import string as _string

        alphabet = _string.ascii_letters + _string.digits + "_-"
        n = _as_int(args[0]) if args else 21
        return "".join(secrets.choice(alphabet) for _ in range(n))
    if name == "ksuid":
        import secrets

        return secrets.token_hex(14)
    if name == "random_int":
        import random

        seed = named.get("seed")
        mx = _as_int(named.get("max", (1 << 31) - 1))
        mn = _as_int(named.get("min", 0))
        rng = random.Random(seed) if seed is not None else random
        return rng.randint(mn, mx)
    if name == "throw":
        raise BloblangError(_as_string(args[0]) if args else "thrown")
    if name == "batch_index":
        return scope.index
    if name == "batch_size":
        return len(scope.batch)
    if name == "count":
        key = _as_string(args[0]) if args else ""
        counts = _COUNTERS.setdefault(key, [0])
        counts[0] += 1
        return counts[0]
    if name == "env":
        import os

        return os.environ.get(_as_string(args[0]))
    if name == "hostname":
        import socket

        return socket.gethostname()
    if name == "file":
        with open(_as_string(args[0]), "rb") as f:
            return f.read()
    if name == "fake":
        # internal/impl/lang/bloblang.go:79 embeds gofakeit; this engine
        # substitutes DETERMINISTIC per-call sequences (same types, no
        # randomness — seeded pipelines must replay exactly)
        ftype = _as_string(args[0]) if args else ""
        counts = _COUNTERS.setdefault(f"__fake_{ftype}", [0])
        counts[0] += 1
        i = counts[0]
        fakes = {
            "email": lambda: f"user{i:04d}@example.com",
            "name": lambda: f"Fake Name {i:04d}",
            "first_name": lambda: f"First{i:04d}",
            "last_name": lambda: f"Last{i:04d}",
            "username": lambda: f"user_{i:04d}",
            "uuid_hyphenated": lambda: f"00000000-0000-4000-8000-{i:012d}",
            "uuid_digit": lambda: f"00000000000040008000{i:012d}",
            "phone": lambda: f"+1555{i:07d}",
            "url": lambda: f"https://example.com/page/{i}",
            "ipv4_address": lambda: f"10.{(i >> 16) & 255}.{(i >> 8) & 255}.{i & 255}",
            "time_string": lambda: f"{i % 24:02d}:{(i * 7) % 60:02d}",
            "year_string": lambda: str(2000 + (i % 50)),
            "month_string": lambda: f"{1 + (i % 12):02d}",
            "day_string": lambda: f"{1 + (i % 28):02d}",
        }
        if ftype in fakes:
            return fakes[ftype]()
        return f"fake-{ftype or 'string'}-{i:06d}"
    raise BloblangError(f"unrecognised function {name!r}")


_COUNTERS: dict = {}


# -- methods (internal/bloblang/query/methods*.go) ---------------------------


def _m_map_each(v, fn):
    if isinstance(v, dict):
        out = {}
        for k, val in v.items():
            r = fn({"key": k, "value": val})
            if r is DELETED or r is NOTHING:
                continue
            out[k] = r
        return out
    out = []
    for item in _as_array(v):
        r = fn(item)
        if r is DELETED or r is NOTHING:
            continue
        out.append(r)
    return out


def _as_array(v):
    if not isinstance(v, list):
        raise BloblangError(f"expected array value, got {_type_name(v)}")
    return v


def _as_object(v):
    if not isinstance(v, dict):
        raise BloblangError(f"expected object value, got {_type_name(v)}")
    return v


def _m_sort(v, fn=None):
    arr = list(_as_array(v))
    if fn is not None:
        import functools

        def cmp(a, b):
            return -1 if _as_bool(fn({"left": a, "right": b})) else 1

        return sorted(arr, key=functools.cmp_to_key(cmp))
    return sorted(arr, key=_sort_key)


def _m_sort_by(v, fn):
    return sorted(_as_array(v), key=lambda item: _sort_key(fn(item)))


def _m_join(v, sep=""):
    parts = []
    for item in _as_array(v):
        if not isinstance(item, (str, bytes)):
            raise BloblangError(f"expected string value, got {_type_name(item)}")
        parts.append(_as_string(item))
    return _as_string(sep).join(parts)


def _m_slice(v, low, high=None):
    low = _as_int(low)
    if high is not None:
        high = _as_int(high)
    if isinstance(v, str) or isinstance(v, bytes):
        return v[low:high]
    return _as_array(v)[low:high]


def _m_index(v, i):
    i = _as_int(i)
    if isinstance(v, bytes):
        if -len(v) <= i < len(v):
            return v[i]  # byte value, like Go indexing
        raise BloblangError(f"index {i} out of bounds for size {len(v)}")
    if isinstance(v, str):
        if -len(v) <= i < len(v):
            return v[i]
        raise BloblangError(f"index {i} out of bounds for size {len(v)}")
    arr = _as_array(v)
    if -len(arr) <= i < len(arr):
        return arr[i]
    raise BloblangError(f"index {i} out of bounds for size {len(arr)}")


def _m_contains(v, needle):
    if isinstance(v, str):
        return _as_string(needle) in v
    if isinstance(v, bytes):
        return _as_string(needle).encode() in v
    if isinstance(v, list):
        return any(_icompare(x, needle) for x in v)
    if isinstance(v, dict):
        return any(_icompare(x, needle) for x in v.values())
    raise BloblangError(f"expected string/array/object, got {_type_name(v)}")


def _m_get(v, path):
    return _get_path(_as_object(v), tuple(_as_string(path).split(".")))


def _m_number(v, default=None):
    try:
        return _as_number(v)
    except BloblangError:
        if default is not None:
            return default
        raise


def _m_merge(v, other):
    """methods_structured.go:1058 merge: deep merge for objects
    (colliding scalars become arrays); an array target appends
    (concat for array-with-array)."""
    if isinstance(v, list):
        return v + (other if isinstance(other, list) else [other])
    if isinstance(v, dict) and isinstance(other, dict):
        out = dict(v)
        for k, val in other.items():
            if k in out:
                a = out[k]
                if isinstance(a, dict) and isinstance(val, dict):
                    out[k] = _m_merge(a, val)
                else:
                    a_list = a if isinstance(a, list) else [a]
                    v_list = val if isinstance(val, list) else [val]
                    out[k] = a_list + v_list
            else:
                out[k] = val
        return out
    raise BloblangError("expected object values for merge")


def _m_format_timestamp(v, fmt="2006-01-02T15:04:05.999999999Z07:00", tz=None, format=None):
    if format is not None:
        fmt = format
    ts = _to_datetime(v)
    if tz:
        import zoneinfo

        ts = ts.astimezone(zoneinfo.ZoneInfo(tz))
    return _go_strftime(ts, fmt)


_GO_TO_PY = [
    ("2006", "%Y"),
    ("Jan", "%b"),
    ("Mon", "%a"),
    ("01", "%m"),
    ("02", "%d"),
    ("15", "%H"),
    ("04", "%M"),
    ("05", "%S"),
    ("Z07:00", "%:z"),
    ("-07:00", "%:z"),
    ("Z0700", "%z"),
    ("-0700", "%z"),
    ("MST", "%Z"),
    ("03", "%I"),
    ("PM", "%p"),
    # two-digit year: replaced LAST so every other "06"-bearing token
    # ("2006") has already been consumed
    ("06", "%y"),
]

_GO_FRAC_RE = _re.compile(r"\.(9+|0+)")


def _go_strftime(ts: _dt.datetime, fmt: str) -> str:
    py = fmt
    # Go fractional seconds: .9s strip trailing zeros (dot dropped when
    # zero); .0s are fixed width
    def frac(m):
        n = len(m.group(1))
        micros = f"{ts.microsecond:06d}"
        nanos = (micros + "000")[:n]
        if m.group(1)[0] == "9":
            nanos = nanos.rstrip("0")
            return ("." + nanos) if nanos else ""
        return "." + nanos

    py = _GO_FRAC_RE.sub(lambda m: frac(m).replace("%", "%%"), py)
    for go, p in _GO_TO_PY:
        py = py.replace(go, p)
    if "%:z" in py:
        off = ts.strftime("%z") or "+0000"
        off = off[:3] + ":" + off[3:]
        if ts.utcoffset() == _dt.timedelta(0):
            off = "Z"
        py = py.replace("%:z", off.replace("%", "%%"))
    return ts.strftime(py)


def _go_strptime(value: str, fmt: str) -> _dt.datetime:
    """Parse with a Go reference layout (time.Parse)."""
    py = _GO_FRAC_RE.sub("%f_FRAC", fmt)
    for go, p in _GO_TO_PY:
        py = py.replace(go, p)
    py = py.replace("%f_FRAC", "%f").replace(".%f", "%f_DOT")
    py = py.replace("%f_DOT", ".%f")
    if "%:z" in py:
        # normalize Z / +01:00 offsets to strptime's %z
        py = py.replace("%:z", "%z")
        value = value.replace("Z", "+0000")
        value = _re.sub(r"([+-]\d{2}):(\d{2})$", r"\1\2", value)
    try:
        ts = _dt.datetime.strptime(value, py)
    except ValueError as e:
        raise BloblangError(f"unable to parse timestamp {value!r} with layout {fmt!r}: {e}")
    return ts if ts.tzinfo else ts.replace(tzinfo=_dt.timezone.utc)


def _to_datetime(v) -> _dt.datetime:
    if isinstance(v, _dt.datetime):
        return v if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc)
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return _dt.datetime.fromtimestamp(float(v), _dt.timezone.utc)
    if isinstance(v, str):
        s = v.replace("Z", "+00:00")
        try:
            ts = _dt.datetime.fromisoformat(s)
        except ValueError:
            raise BloblangError(f"unable to parse timestamp {v!r}")
        return ts if ts.tzinfo else ts.replace(tzinfo=_dt.timezone.utc)
    raise BloblangError(f"expected timestamp, got {_type_name(v)}")


def _m_parse_timestamp(v, fmt=None):
    if fmt is not None and isinstance(v, str):
        return _go_strptime(v, fmt)
    return _to_datetime(v)


_DUR_UNITS = {"ns": 1, "us": 1000, "µs": 1000, "ms": 1000_000, "s": 1000_000_000,
              "m": 60 * 1000_000_000, "h": 3600 * 1000_000_000}
_DUR_RE = _re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")


def _m_parse_duration(v) -> int:
    """Go time.ParseDuration → integer nanoseconds ("1h30m", "50us")."""
    sv = _as_string(v).strip()
    sign = -1 if sv.startswith("-") else 1
    sv = sv.lstrip("+-")
    pos = 0
    total = 0.0
    for m in _DUR_RE.finditer(sv):
        if m.start() != pos:
            raise BloblangError(f"invalid duration {v!r}")
        total += float(m.group(1)) * _DUR_UNITS[m.group(2)]
        pos = m.end()
    if pos != len(sv) or pos == 0:
        raise BloblangError(f"invalid duration {v!r}")
    return sign * int(total)


_ISO_DUR_RE = _re.compile(
    r"^P(?:(\d+(?:\.\d+)?)Y)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)W)?(?:(\d+(?:\.\d+)?)D)?"
    r"(?:T(?:(\d+(?:\.\d+)?)H)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def _m_parse_duration_iso8601(v) -> int:
    """ISO-8601 duration → integer nanoseconds (years=365d, months=30d,
    matching the reference's fixed-unit interpretation)."""
    m = _ISO_DUR_RE.match(_as_string(v).strip())
    if not m or not any(m.groups()):
        raise BloblangError(f"invalid ISO-8601 duration {v!r}")
    y, mo, w, d, h, mi, sec = (float(g) if g else 0.0 for g in m.groups())
    year_s = 365.2425 * 86400  # Gregorian year, month = year/12 (Go period lib)
    total_s = y * year_s + mo * (year_s / 12) + w * 7 * 86400 + d * 86400 + h * 3600 + mi * 60 + sec
    return int(total_s * 1_000_000_000)


_CRC32_POLYS = {"ieee": 0xEDB88320, "castagnoli": 0x82F63B78, "koopman": 0xEB31D82E}


def _crc32(data: bytes, poly_name: str) -> int:
    poly = _CRC32_POLYS.get(poly_name.lower())
    if poly is None:
        raise BloblangError(f"unknown crc32 polynomial {poly_name!r}")
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def _xxhash64(data: bytes, seed: int = 0) -> int:
    """Pure-python XXH64 (public spec, xxhash.com) — matches the
    reference's hash("xxhash64") output."""
    M = (1 << 64) - 1
    P1, P2, P3, P4, P5 = (
        11400714785074694791, 14029467366897019727, 1609587929392839161,
        9650029242287828579, 2870177450012600261,
    )

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def round_(acc, inp):
        acc = (acc + inp * P2) & M
        return (rotl(acc, 31) * P1) & M

    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M
        while i <= n - 32:
            v1 = round_(v1, int.from_bytes(data[i : i + 8], "little")); i += 8
            v2 = round_(v2, int.from_bytes(data[i : i + 8], "little")); i += 8
            v3 = round_(v3, int.from_bytes(data[i : i + 8], "little")); i += 8
            v4 = round_(v4, int.from_bytes(data[i : i + 8], "little")); i += 8
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ round_(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        h = ((rotl(h ^ round_(0, int.from_bytes(data[i : i + 8], "little")), 27) * P1) + P4) & M
        i += 8
    if i <= n - 4:
        h = ((rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * P1) & M), 23) * P2) + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _m_hash(v, algorithm="sha256", key=None, polynomial="IEEE"):
    data = v.encode() if isinstance(v, str) else v
    alg = algorithm.replace("-", "").lower()
    if alg == "crc32":
        return _crc32(data, polynomial).to_bytes(4, "big")
    if alg == "xxhash64":
        # the reference returns the decimal string (methods_strings.go)
        return str(_xxhash64(data))
    if key is not None:
        import hmac as _hmac

        kb = key.encode() if isinstance(key, str) else key
        name = alg.removeprefix("hmac").lstrip("_-") or "sha1"
        return _hmac.new(kb, data, getattr(hashlib, name)).digest()
    if alg.startswith("hmac"):
        raise BloblangError("hmac hash requires key argument")
    return getattr(hashlib, alg)(data).digest()


_JWT_ALGS = {"sha256": "HS256", "sha384": "HS384", "sha512": "HS512"}


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_dec(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _m_sign_jwt(claims, secret, alg: str) -> str:
    """sign_jwt_hs* (jwt_sign.go): claims object → compact JWS."""
    import hmac as _hmac

    header = {"alg": _JWT_ALGS[alg], "typ": "JWT"}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(_as_object(claims), separators=(",", ":"),
                             default=_json_default).encode())
    )
    sig = _hmac.new(_as_string(secret).encode(), signing_input.encode(),
                    getattr(hashlib, alg)).digest()
    return signing_input + "." + _b64url(sig)


def _m_parse_jwt(token, secret, alg: str) -> dict:
    """parse_jwt_hs* (jwt_parse.go): verify signature, return claims."""
    import hmac as _hmac

    parts = _as_string(token).split(".")
    if len(parts) != 3:
        raise BloblangError("invalid JWT: expected 3 segments")
    header = json.loads(_b64url_dec(parts[0]))
    if header.get("alg") != _JWT_ALGS[alg]:
        raise BloblangError(
            f"invalid JWT: algorithm mismatch ({header.get('alg')} != {_JWT_ALGS[alg]})"
        )
    expect = _hmac.new(_as_string(secret).encode(),
                       f"{parts[0]}.{parts[1]}".encode(), getattr(hashlib, alg)).digest()
    if not _hmac.compare_digest(expect, _b64url_dec(parts[2])):
        raise BloblangError("invalid JWT: signature verification failed")
    return json.loads(_b64url_dec(parts[1]))


def _m_sign_jwt_pk(claims, pem, alg_name: str) -> str:
    """sign_jwt_rs*/es* (jwt_sign.go:113-151): PEM private key; ES uses
    RFC 6979 deterministic nonces (functions/pki.py) so signing is
    reproducible."""
    from benthos_spark.functions import pki

    halg = {"256": "sha256", "384": "sha384", "512": "sha512"}[alg_name[2:]]
    header = {"alg": alg_name, "typ": "JWT"}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(_as_object(claims), separators=(",", ":"),
                             default=_json_default).encode())
    )
    try:
        key = pki.load_private_key(_as_string(pem))
    except ValueError as e:
        raise BloblangError(f"{alg_name}: {e}") from e
    if alg_name.startswith("RS"):
        if not isinstance(key, pki.RsaPrivate):
            raise BloblangError(f"{alg_name} requires an RSA private key")
        sig = pki.rsa_sign(key, signing_input.encode(), halg)
    else:
        if not isinstance(key, pki.EcPrivate):
            raise BloblangError(f"{alg_name} requires an EC private key")
        r, s = pki.ecdsa_sign(key, signing_input.encode(), halg)
        ln = pki.ec_coord_len(key.curve)
        sig = r.to_bytes(ln, "big") + s.to_bytes(ln, "big")
    return signing_input + "." + _b64url(sig)


def _m_parse_jwt_pk(token, pem, alg_name: str) -> dict:
    """parse_jwt_rs*/es* (jwt_parse.go:123-180): verify with a PEM
    public key; rejects alg mismatch incl. the `none` attack."""
    from benthos_spark.functions import pki

    halg = {"256": "sha256", "384": "sha384", "512": "sha512"}[alg_name[2:]]
    parts = _as_string(token).split(".")
    if len(parts) != 3:
        raise BloblangError("invalid JWT: expected 3 segments")
    header = json.loads(_b64url_dec(parts[0]))
    if header.get("alg") != alg_name:
        raise BloblangError(
            f"invalid JWT: algorithm mismatch ({header.get('alg')} != {alg_name})"
        )
    try:
        key = pki.load_public_key(_as_string(pem))
    except ValueError as e:
        raise BloblangError(f"{alg_name}: {e}") from e
    msg = f"{parts[0]}.{parts[1]}".encode()
    sig = _b64url_dec(parts[2])
    if alg_name.startswith("RS"):
        if not isinstance(key, pki.RsaPublic):
            raise BloblangError(f"{alg_name} requires an RSA public key")
        ok = pki.rsa_verify(key, msg, sig, halg)
    else:
        if not isinstance(key, pki.EcPublic):
            raise BloblangError(f"{alg_name} requires an EC public key")
        ln = len(sig) // 2
        ok = pki.ecdsa_verify(
            key, msg,
            int.from_bytes(sig[:ln], "big"), int.from_bytes(sig[ln:], "big"), halg,
        )
    if not ok:
        raise BloblangError("invalid JWT: signature verification failed")
    return json.loads(_b64url_dec(parts[1]))


def _m_encode(v, scheme):
    data = v.encode() if isinstance(v, str) else v
    scheme = scheme.lower()
    if scheme == "base64":
        return base64.b64encode(data).decode()
    if scheme == "base64url":
        return base64.urlsafe_b64encode(data).decode()
    if scheme == "hex":
        return data.hex()
    if scheme == "ascii85":
        return base64.a85encode(data).decode()
    raise BloblangError(f"unrecognised encoding {scheme!r}")


def _m_decode(v, scheme):
    s = v if isinstance(v, (str, bytes)) else _as_string(v)
    data = s.encode() if isinstance(s, str) else s
    scheme = scheme.lower()
    if scheme == "base64":
        return base64.b64decode(data)
    if scheme == "base64url":
        return base64.urlsafe_b64decode(data)
    if scheme == "hex":
        return bytes.fromhex(data.decode())
    if scheme == "ascii85":
        return base64.a85decode(data)
    raise BloblangError(f"unrecognised encoding {scheme!r}")


def _m_compress(v, algorithm, level, compress):
    from benthos_spark.operators.processors import _codec_pair

    try:
        c, d = _codec_pair(_as_string(algorithm), int(level))
    except (ValueError, NotImplementedError) as e:
        raise BloblangError(str(e))
    data = v.encode() if isinstance(v, str) else bytes(v)
    return c(data) if compress else d(data)


def _m_fold(v, init, fn):
    acc = init
    for item in _as_array(v):
        acc = fn({"tally": acc, "value": item})
    return acc


def _m_enumerated(v):
    return [{"index": i, "value": x} for i, x in enumerate(_as_array(v))]


def _m_zip(v, *others):
    arrs = [_as_array(v)] + [_as_array(o) for o in others]
    return [list(t) for t in zip(*arrs)]


def _m_unique(v):
    seen = set()
    out = []
    for x in _as_array(v):
        k = _format_json(x) if isinstance(x, (dict, list)) else (type(x).__name__, x)
        if k in seen:
            continue
        seen.add(k)
        out.append(x)
    return out


def _m_with(v, *fields):
    """methods_structured.go `with`: keep only the listed (dot-path)
    fields, preserving nesting."""
    obj = _as_object(v)
    keep_top = set()
    nested: dict[str, list] = {}
    for f in fields:
        f = _as_string(f)
        if "." in f:
            head, rest = f.split(".", 1)
            nested.setdefault(head, []).append(rest)
        else:
            keep_top.add(f)
    out = {}
    for k, val in obj.items():
        if k in keep_top:
            out[k] = val
        elif k in nested and isinstance(val, dict):
            out[k] = _m_with(val, *nested[k])
    return out


def _m_without(v, *fields):
    obj = _as_object(v)
    drop = set()
    nested: dict[str, list] = {}
    for f in fields:
        f = _as_string(f)
        if "." in f:
            head, rest = f.split(".", 1)
            nested.setdefault(head, []).append(rest)
        else:
            drop.add(f)
    out = {}
    for k, val in obj.items():
        if k in drop:
            continue
        if k in nested and isinstance(val, dict):
            out[k] = _m_without(val, *nested[k])
        else:
            out[k] = val
    return out


def _m_replace_all_many(v, pairs):
    s = _as_string(v)
    arr = _as_array(pairs)
    for i in range(0, len(arr) - 1, 2):
        s = s.replace(_as_string(arr[i]), _as_string(arr[i + 1]))
    return s


def _m_re_replace_all(v, pattern, replacement):
    # Go regexp uses $1/$name for group refs; Python uses \1/\g<name>
    py_repl = _re.sub(r"\$(\d+)", r"\\\1", _as_string(replacement))
    py_repl = _re.sub(r"\$\{(\w+)\}", r"\\g<\1>", py_repl)
    return _re.sub(pattern, py_repl, _as_string(v))


def _m_parse_csv(v, parse_header_row=True, delimiter=",", lazy_quotes=False):
    import csv
    import io

    rows = list(csv.reader(io.StringIO(_as_string(v)), delimiter=delimiter))
    if not parse_header_row:
        return [list(r) for r in rows]
    if not rows:
        return []
    header = rows[0]
    return [dict(zip(header, r)) for r in rows[1:]]


def _match_to_object(m) -> dict:
    # group key = subexp name when named, else its index (SubexpNames)
    name_by_index = {}
    for name, idx in (m.re.groupindex or {}).items():
        name_by_index[idx] = name
    out = {"0": m.group(0)}
    for i in range(1, (m.re.groups or 0) + 1):
        g = m.group(i)
        out[name_by_index.get(i, str(i))] = g if g is not None else ""
    return out


def _m_re_find_object(v, pattern):
    m = _re.search(pattern, _as_string(v))
    if not m:
        return {}
    return _match_to_object(m)


def _m_re_find_all_object(v, pattern):
    return [_match_to_object(m) for m in _re.finditer(pattern, _as_string(v))]


_METHODS = {
    # strings (query/methods_strings.go)
    "uppercase": lambda v: _as_string(v).upper(),
    "lowercase": lambda v: _as_string(v).lower(),
    "capitalize": lambda v: _as_string(v).title(),
    "trim": lambda v, cutset=None: _as_string(v).strip(cutset),
    "trim_prefix": lambda v, p: _as_string(v).removeprefix(_as_string(p)),
    "trim_suffix": lambda v, s: _as_string(v).removesuffix(_as_string(s)),
    "has_prefix": lambda v, p: _as_string(v).startswith(_as_string(p)),
    "has_suffix": lambda v, s: _as_string(v).endswith(_as_string(s)),
    "index_of": lambda v, s: _as_string(v).find(_as_string(s)),
    "split": lambda v, sep: _as_string(v).split(_as_string(sep)),
    "replace_all": lambda v, old, new: _as_string(v).replace(_as_string(old), _as_string(new)),
    "replace_all_many": _m_replace_all_many,
    "re_replace_all": _m_re_replace_all,
    "re_match": lambda v, p: _re.search(p, _as_string(v)) is not None,
    "re_find_all": lambda v, p: [m.group(0) for m in _re.finditer(p, _as_string(v))],
    "re_find_all_submatch": lambda v, p: [
        [m.group(0), *[g if g is not None else "" for g in m.groups()]]
        for m in _re.finditer(p, _as_string(v))
    ],
    "re_find_object": _m_re_find_object,
    "re_find_all_object": _m_re_find_all_object,
    "quote": lambda v: json.dumps(_as_string(v), ensure_ascii=False),
    "unquote": lambda v: json.loads(_as_string(v)),
    "reverse": lambda v: v[::-1] if isinstance(v, (str, bytes)) else _as_array(v)[::-1],
    "length": lambda v: len(v) if isinstance(v, (str, bytes, list, dict)) else (_ for _ in ()).throw(BloblangError(f"expected string/array/object, got {_type_name(v)}")),
    "slice": _m_slice,
    "strip_html": lambda v, allowed=None: _strip_html(v, allowed),
    "escape_url_query": lambda v: __import__("urllib.parse", fromlist=["quote_plus"]).quote_plus(_as_string(v)),
    "unescape_url_query": lambda v: __import__("urllib.parse", fromlist=["unquote_plus"]).unquote_plus(_as_string(v)),
    "escape_html": lambda v: __import__("html").escape(_as_string(v)),
    "unescape_html": lambda v: __import__("html").unescape(_as_string(v)),
    "format": lambda v, *a: _go_format(_as_string(v), a),
    "contains": _m_contains,
    "lines": lambda v: _as_string(v).split("\n"),
    "parse_json": lambda v, use_number=False: json.loads(_as_string(v)),
    # impl/msgpack/processor.go + bloblang methods: pure-python codec
    "parse_msgpack": lambda v: __import__(
        "benthos_spark.functions.msgpack", fromlist=["unpackb"]
    ).unpackb(v if isinstance(v, (bytes, bytearray)) else _as_string(v).encode("latin-1")),
    "format_msgpack": lambda v: __import__(
        "benthos_spark.functions.msgpack", fromlist=["packb"]
    ).packb(v),
    "format_json": lambda v, indent="    ", no_indent=False: (
        json.dumps(v, separators=(",", ":"), ensure_ascii=False, default=_json_default)
        if no_indent
        else json.dumps(v, ensure_ascii=False, indent=indent, default=_json_default)
    ),
    "format_yaml": lambda v: __import__("yaml").safe_dump(v, default_flow_style=False, sort_keys=False, allow_unicode=True),
    "parse_yaml": lambda v: __import__("yaml").safe_load(_as_string(v)),
    "parse_csv": _m_parse_csv,
    "encode": _m_encode,
    "decode": _m_decode,
    "compress": lambda v, algorithm, level=6: _m_compress(v, algorithm, level, True),
    "decompress": lambda v, algorithm: _m_compress(v, algorithm, 6, False),
    "hash": _m_hash,
    # methods_strings.go:279,367 — pure-python AES (functions/aes.py),
    # reference semantics: no padding, IV must be one block, CBC needs
    # len % 16 == 0; encrypt/decrypt return raw bytes
    "encrypt_aes": lambda v, scheme, key, iv: __import__(
        "benthos_spark.functions.aes", fromlist=["encrypt"]
    ).encrypt(_as_string(scheme),
              key if isinstance(key, (bytes, bytearray)) else _as_string(key).encode(),
              iv if isinstance(iv, (bytes, bytearray)) else _as_string(iv).encode(),
              v if isinstance(v, (bytes, bytearray)) else _as_string(v).encode()),
    "decrypt_aes": lambda v, scheme, key, iv: __import__(
        "benthos_spark.functions.aes", fromlist=["decrypt"]
    ).decrypt(_as_string(scheme),
              key if isinstance(key, (bytes, bytearray)) else _as_string(key).encode(),
              iv if isinstance(iv, (bytes, bytearray)) else _as_string(iv).encode(),
              v if isinstance(v, (bytes, bytearray)) else _as_string(v).encode()),
    # JWT HMAC family (impl/crypto/jwt_sign.go:91-105, jwt_parse.go:178;
    # RS*/ES* need RSA/ECDSA libs and are gated)
    "sign_jwt_hs256": lambda v, secret: _m_sign_jwt(v, secret, "sha256"),
    "sign_jwt_hs384": lambda v, secret: _m_sign_jwt(v, secret, "sha384"),
    "sign_jwt_hs512": lambda v, secret: _m_sign_jwt(v, secret, "sha512"),
    "parse_jwt_hs256": lambda v, secret: _m_parse_jwt(v, secret, "sha256"),
    "parse_jwt_hs384": lambda v, secret: _m_parse_jwt(v, secret, "sha384"),
    "parse_jwt_hs512": lambda v, secret: _m_parse_jwt(v, secret, "sha512"),
    # RS*/ES* family (jwt_sign.go:113-151, jwt_parse.go:123-180) over the
    # from-scratch PKI (functions/pki.py) — formerly jar/lib-gated
    "sign_jwt_rs256": lambda v, secret: _m_sign_jwt_pk(v, secret, "RS256"),
    "sign_jwt_rs384": lambda v, secret: _m_sign_jwt_pk(v, secret, "RS384"),
    "sign_jwt_rs512": lambda v, secret: _m_sign_jwt_pk(v, secret, "RS512"),
    "sign_jwt_es256": lambda v, secret: _m_sign_jwt_pk(v, secret, "ES256"),
    "sign_jwt_es384": lambda v, secret: _m_sign_jwt_pk(v, secret, "ES384"),
    "sign_jwt_es512": lambda v, secret: _m_sign_jwt_pk(v, secret, "ES512"),
    "parse_jwt_rs256": lambda v, secret: _m_parse_jwt_pk(v, secret, "RS256"),
    "parse_jwt_rs384": lambda v, secret: _m_parse_jwt_pk(v, secret, "RS384"),
    "parse_jwt_rs512": lambda v, secret: _m_parse_jwt_pk(v, secret, "RS512"),
    "parse_jwt_es256": lambda v, secret: _m_parse_jwt_pk(v, secret, "ES256"),
    "parse_jwt_es384": lambda v, secret: _m_parse_jwt_pk(v, secret, "ES384"),
    "parse_jwt_es512": lambda v, secret: _m_parse_jwt_pk(v, secret, "ES512"),
    # numbers (query/methods.go + math)
    "floor": lambda v: math.floor(_as_number(v)),
    "ceil": lambda v: math.ceil(_as_number(v)),
    "round": lambda v: int(math.floor(_as_number(v) + 0.5)) if _as_number(v) >= 0 else int(math.ceil(_as_number(v) - 0.5)),
    "abs": lambda v: abs(_as_number(v)),
    "int64": lambda v: _as_int(v),
    "int32": lambda v: _as_int(v),
    "uint64": lambda v: _as_int(v),
    "float64": lambda v: float(_as_number(v)),
    "float32": lambda v: float(_as_number(v)),
    "max": lambda v: max(_as_number(x) for x in _as_array(v)),
    "min": lambda v: min(_as_number(x) for x in _as_array(v)),
    "log": lambda v: math.log(_as_number(v)),
    "log10": lambda v: math.log10(_as_number(v)),
    # coercion (query/methods.go)
    "string": _as_string,
    "bytes": lambda v: v if isinstance(v, bytes) else _as_string(v).encode(),
    "number": _m_number,
    "bool": lambda v, default=None: _m_bool(v, default),
    "not_null": lambda v: v if v is not None else (_ for _ in ()).throw(BloblangError("value is null")),
    "not_empty": lambda v: v if v not in ("", [], {}) else (_ for _ in ()).throw(BloblangError("value is empty")),
    "type": _type_name,
    "exists": lambda v, path: _get_path(_as_object(v), tuple(_as_string(path).split("."))) is not None,
    "or": lambda v, fallback: fallback if v is None or v is NOTHING else v,
    # arrays (query/methods.go)
    "map_each": _m_map_each,
    "map_each_key": lambda v, fn: {
        (k if (nk := fn(k)) is NOTHING else _as_string(nk)): val
        for k, val in _as_object(v).items()
    },
    "filter": lambda v, fn: (
        [x for x in v if _as_bool(fn(x))]
        if isinstance(v, list)
        else {k: val for k, val in _as_object(v).items() if _as_bool(fn({"key": k, "value": val}))}
    ),
    "fold": _m_fold,
    "all": lambda v, fn: all(_as_bool(fn(x)) for x in _as_array(v)),
    "any": lambda v, fn: any(_as_bool(fn(x)) for x in _as_array(v)),
    "append": lambda v, *items: _as_array(v) + list(items),
    "concat": lambda v, *others: sum((_as_array(o) for o in others), _as_array(v)),
    "flatten": lambda v: [y for x in _as_array(v) for y in (x if isinstance(x, list) else [x])],
    "index": _m_index,
    "first": lambda v: _m_index(v, 0),
    "last": lambda v: _m_index(v, -1),
    "find": lambda v, needle: next((i for i, x in enumerate(_as_array(v)) if _icompare(x, needle)), None),
    "find_all": lambda v, needle: [i for i, x in enumerate(_as_array(v)) if _icompare(x, needle)],
    "find_by": lambda v, fn: next((i for i, x in enumerate(_as_array(v)) if _as_bool(fn(x))), None),
    "find_all_by": lambda v, fn: [i for i, x in enumerate(_as_array(v)) if _as_bool(fn(x))],
    "parse_url": lambda v: _m_parse_url(v),
    "filepath_join": lambda v: "/".join(_as_string(x) for x in _as_array(v)).replace("//", "/"),
    "filepath_split": lambda v: [
        _as_string(v)[: _as_string(v).rfind("/") + 1],
        _as_string(v)[_as_string(v).rfind("/") + 1 :],
    ],
    "sort": _m_sort,
    "sort_by": _m_sort_by,
    "join": _m_join,
    "sum": lambda v: sum(_as_number(x) for x in _as_array(v)) if v else 0,
    "enumerated": _m_enumerated,
    "zip": _m_zip,
    "unique": _m_unique,
    "slice_each": _m_slice,
    # objects (query/methods.go)
    "keys": lambda v: list(_as_object(v).keys()),
    "values": lambda v: list(_as_object(v).values()),
    "key_values": lambda v: [{"key": k, "value": val} for k, val in _as_object(v).items()],
    "merge": _m_merge,
    "assign": lambda v, other: {**_as_object(v), **_as_object(other)},
    "without": _m_without,
    "with": lambda v, *fields: _m_with(v, *fields),
    "collapse": lambda v, include_empty=False: _collapse(v, include_empty=include_empty),
    "explode": lambda v, path: _m_explode(v, path),
    "get": _m_get,
    "squash": lambda v: _squash(_as_array(v)),
    # timestamps (query/methods_time.go)
    "ts_parse": lambda v, fmt=None: _m_parse_timestamp(v, fmt),
    "parse_timestamp": lambda v, fmt=None: _m_parse_timestamp(v, fmt),
    "ts_format": _m_format_timestamp,
    "format_timestamp": _m_format_timestamp,
    "ts_unix": lambda v: int(_to_datetime(v).timestamp()),
    "ts_unix_milli": lambda v: int(_to_datetime(v).timestamp() * 1000),
    "ts_unix_micro": lambda v: int(_to_datetime(v).timestamp() * 1_000_000),
    "ts_unix_nano": lambda v: int(_to_datetime(v).timestamp() * 1_000_000_000),
    "ts_round": lambda v, dur_ns: _ts_round(v, dur_ns),
    "ts_tz": lambda v, tz: _m_ts_tz(v, tz),
    "ts_strptime": lambda v, fmt: _dt.datetime.strptime(_as_string(v), fmt).replace(tzinfo=_dt.timezone.utc),
    "ts_strftime": lambda v, fmt, tz=None: _m_ts_strftime(v, fmt, tz),
    "parse_duration": _m_parse_duration,
    # impl/crypto/bcrypt.go:26 / argon2.go:110 — from-scratch verifiers
    # (functions/bcrypt.py, functions/argon2.py; NIST/RFC-vector tested)
    "compare_bcrypt": lambda v, hashed: _m_compare_pw("bcrypt", v, hashed),
    # impl/maxmind/bloblang_geoip.go:56-89 — from-scratch MMDB reader
    # (functions/mmdb.py); all geoip_* methods return the raw record map
    # (the data the geoip2 wrapper structs are decoded from)
    "geoip_city": lambda v, path: _m_geoip(v, path),
    "geoip_country": lambda v, path: _m_geoip(v, path),
    "geoip_asn": lambda v, path: _m_geoip(v, path),
    "geoip_enterprise": lambda v, path: _m_geoip(v, path),
    "geoip_anonymous_ip": lambda v, path: _m_geoip(v, path),
    "geoip_connection_type": lambda v, path: _m_geoip(v, path),
    "geoip_domain": lambda v, path: _m_geoip(v, path),
    "geoip_isp": lambda v, path: _m_geoip(v, path),
    "compare_argon2": lambda v, hashed: _m_compare_pw("argon2", v, hashed),
    "parse_duration_iso8601": _m_parse_duration_iso8601,
    "ts_sub": lambda v, other: int((_to_datetime(v) - _to_datetime(other)).total_seconds() * 1e9),
    # aliases registered by the plugin API (impl/pure/bloblang_time.go)
    "format_timestamp_strftime": lambda v, fmt, tz=None: _m_ts_strftime(v, fmt, tz),
    "parse_timestamp_strptime": lambda v, fmt: _dt.datetime.strptime(_as_string(v), fmt).replace(tzinfo=_dt.timezone.utc),
    "format_timestamp_unix": lambda v: int(_to_datetime(v).timestamp()),
    "format_timestamp_unix_milli": lambda v: int(_to_datetime(v).timestamp() * 1e3),
    "format_timestamp_unix_micro": lambda v: int(_to_datetime(v).timestamp() * 1e6),
    "format_timestamp_unix_nano": lambda v: int(_to_datetime(v).timestamp() * 1e9),
    "ts_add_iso8601": lambda v, dur: _to_datetime(v) + _dt.timedelta(
        seconds=_m_parse_duration_iso8601(dur) / 1e9
    ),
    "ts_sub_iso8601": lambda v, dur: _to_datetime(v) - _dt.timedelta(
        seconds=_m_parse_duration_iso8601(dur) / 1e9
    ),
    "parse_form_url_encoded": lambda v: _m_parse_form(v),
    "parse_xml": lambda v, cast=False: _xml_to_obj(_as_string(v), cast),
    "format_xml": lambda v, indent="    ", no_indent=False: _obj_to_xml(v, indent, no_indent),
    "json_path": lambda v, expr: _m_json_path(v, _as_string(expr)),
}


def _m_bool(v, default=None):
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, str) and v.lower() in ("true", "false"):
        return v.lower() == "true"
    if default is not None:
        return default
    raise BloblangError(f"expected bool, got {_type_name(v)}")


def _m_parse_form(v):
    """parse_form_url_encoded (impl/pure/bloblang_string.go): single
    values unwrap, repeated keys stay arrays."""
    from urllib.parse import parse_qs

    out = {}
    for k, vals in parse_qs(_as_string(v), keep_blank_values=True).items():
        out[k] = vals[0] if len(vals) == 1 else vals
    return out


def _xml_cast(txt: str, cast: bool):
    if not cast:
        return txt
    if txt.lower() in ("true", "false"):
        return txt.lower() == "true"
    try:
        return int(txt)
    except ValueError:
        try:
            return float(txt)
        except ValueError:
            return txt


def _xml_to_obj(src: str, cast: bool = False):
    """parse_xml (impl/xml/bloblang.go conventions: attributes as
    '-name', mixed text as '#text', repeated elements become arrays)."""
    import xml.etree.ElementTree as ET

    # the reference tolerates unquoted attribute values (id=99)
    src = _re.sub(r'=\s*([A-Za-z0-9_.]+)([\s>/])', r'="\1"\2', src)

    def conv(el):
        obj = {}
        for k, val in el.attrib.items():
            obj[f"-{k}"] = _xml_cast(val, cast)
        for child in el:
            c = conv(child)
            if child.tag in obj:
                cur = obj[child.tag]
                obj[child.tag] = cur + [c] if isinstance(cur, list) else [cur, c]
            else:
                obj[child.tag] = c
        text = (el.text or "").strip()
        if text and not obj:
            return _xml_cast(text, cast)
        if text:
            obj["#text"] = _xml_cast(text, cast)
        return obj if obj else ""

    root = ET.fromstring(src)
    return {root.tag: conv(root)}


def _obj_to_xml(v, indent: str = "    ", no_indent: bool = False) -> str:
    """format_xml: object → (pretty) XML; no_indent collapses to one
    line, an empty indent keeps newlines without padding (xmlutil)."""
    if no_indent:
        indent = ""
    lines: list[str] = []

    def rec(obj, depth):
        pad = indent * depth
        if isinstance(obj, dict):
            for k, val in obj.items():
                if k.startswith("-") or k == "#text":
                    continue
                vals = val if isinstance(val, list) else [val]
                for item in vals:
                    attrs = ""
                    if isinstance(item, dict):
                        attrs = "".join(
                            f' {ak[1:]}="{av}"' for ak, av in item.items() if ak.startswith("-")
                        )
                    if isinstance(item, dict) and any(
                        not kk.startswith("-") and kk != "#text" for kk in item
                    ):
                        lines.append(f"{pad}<{k}{attrs}>")
                        rec(item, depth + 1)
                        lines.append(f"{pad}</{k}>")
                    else:
                        inner = item.get("#text", "") if isinstance(item, dict) else item
                        lines.append(f"{pad}<{k}{attrs}>{_as_string(inner)}</{k}>")

    rec(v, 0)
    return ("" if no_indent else "\n").join(lines)


_JSONPATH_SEG = _re.compile(
    r"\.\.([A-Za-z0-9_]+)"      # ..name recursive descent
    r"|\.([A-Za-z0-9_]+|\*)"     # .name / .*
    r"|\[\s*'([^']*)'\s*\]"      # ['name']
    r"|\[\s*(-?\d+)\s*\]"       # [n]
    r"|\[\s*\*\s*\]"            # [*]
    r"|\[\?\(([^)]*)\)\]"       # [?(@.field op value)]
)

_JSONPATH_FILTER = _re.compile(
    r"^@(?:\.([A-Za-z0-9_]+))?\s*(==|!=|<=|>=|<|>)\s*(.+)$"
)


def _m_json_path(v, expr: str):
    """json_path (impl/jsonpath/bloblang_jsonpath.go — goessner
    JSONPath): dot/bracket access, wildcards, recursive descent, and
    @-filters. Multi-match operators return arrays; plain paths return
    the single value (error when absent, like gval)."""
    if not expr.startswith("$"):
        raise BloblangError(f"json_path expression must start with $: {expr!r}")
    pos = 1
    matches = [v]
    multi = False
    while pos < len(expr):
        m = _JSONPATH_SEG.match(expr, pos)
        if not m:
            raise BloblangError(f"invalid json_path segment at {expr[pos:]!r}")
        pos = m.end()
        rec_name, name, bname, idx, filt = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
        )
        nxt = []
        if rec_name is not None:
            multi = True

            def walk(x):
                if isinstance(x, dict):
                    for k, val in x.items():
                        if k == rec_name:
                            nxt.append(val)
                        walk(val)
                elif isinstance(x, list):
                    for e in x:
                        walk(e)

            for cur in matches:
                walk(cur)
        elif name == "*" or (name is None and bname is None and idx is None and filt is None):
            multi = True
            for cur in matches:
                if isinstance(cur, dict):
                    nxt.extend(cur.values())
                elif isinstance(cur, list):
                    nxt.extend(cur)
        elif name is not None or bname is not None:
            key = name if name is not None else bname
            for cur in matches:
                if isinstance(cur, dict) and key in cur:
                    nxt.append(cur[key])
        elif idx is not None:
            i = int(idx)
            for cur in matches:
                if isinstance(cur, list) and -len(cur) <= i < len(cur):
                    nxt.append(cur[i])
        elif filt is not None:
            multi = True
            fm = _JSONPATH_FILTER.match(filt.strip())
            if not fm:
                raise BloblangError(f"unsupported json_path filter {filt!r}")
            fkey, op, raw = fm.group(1), fm.group(2), fm.group(3).strip()
            rhs = json.loads(raw.replace("'", '"')) if raw[0] in "'\"0123456789tfn-[{" else raw

            def keep(e):
                lhs = e.get(fkey) if fkey else e
                if not isinstance(lhs, type(rhs)) and not (
                    isinstance(lhs, (int, float)) and isinstance(rhs, (int, float))
                ):
                    return False
                return {
                    "==": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
                    "<=": lhs <= rhs, ">": lhs > rhs, ">=": lhs >= rhs,
                }[op]

            for cur in matches:
                if isinstance(cur, list):
                    nxt.extend(e for e in cur if isinstance(e, (dict, int, float, str)) and keep(e))
        matches = nxt
    if multi:
        return matches
    if not matches:
        raise BloblangError(f"json_path {expr!r}: unknown key")
    return matches[0]


def _go_format(fmt: str, args):
    """Go fmt verbs subset: %s %d %f %v %q."""
    out = []
    it = iter(args)
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            verb = fmt[i + 1]
            if verb == "%":
                out.append("%")
            elif verb in "sv":
                out.append(_as_string(next(it)))
            elif verb == "d":
                out.append(str(_as_int(next(it))))
            elif verb == "f":
                out.append(f"{_as_number(next(it)):f}")
            elif verb == "q":
                out.append(json.dumps(_as_string(next(it))))
            else:
                out.append(c + verb)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _collapse(v, prefix="", include_empty=False):
    """methods_structured.go collapse: flatten to dot paths; empty
    objects/arrays are DROPPED unless include_empty."""
    out = {}

    def rec(val, pre):
        if isinstance(val, dict) and val:
            for k, x in val.items():
                rec(x, f"{pre}.{k}" if pre else k)
        elif isinstance(val, list) and val:
            for i, x in enumerate(val):
                rec(x, f"{pre}.{i}" if pre else str(i))
        elif isinstance(val, (dict, list)):
            if include_empty:
                out[pre] = val
        else:
            out[pre] = val

    rec(v, prefix)
    return out


def _m_parse_url(v):
    """methods_strings.go parse_url → Go net/url.URL shaped object
    (keys as the reference marshals them; `user` present only when the
    URL carries userinfo)."""
    from urllib.parse import urlsplit

    u = urlsplit(_as_string(v))
    out = {
        "fragment": u.fragment,
        "host": u.netloc.rsplit("@", 1)[-1] if u.netloc else "",
        "opaque": "",
        "path": u.path,
        "raw_fragment": "",
        "raw_path": "",
        "raw_query": u.query,
        "scheme": u.scheme,
    }
    if "@" in (u.netloc or ""):
        userinfo = u.netloc.rsplit("@", 1)[0]
        name, _, password = userinfo.partition(":")
        out["user"] = {"name": name, "password": password}
    return out


def _strip_html(v, allowed=None):
    if not allowed:
        return _re.sub(r"<[^>]*>", "", _as_string(v))
    keep = {str(t).lower() for t in allowed}

    def sub(m):
        tag = m.group(1).lower()
        return m.group(0) if tag in keep else ""

    return _re.sub(r"</?\s*([A-Za-z0-9]+)[^>]*>", sub, _as_string(v))


def _m_explode(v, path):
    """methods_structured.go explode: the array/object at `path` fans
    the WHOLE document out — one copy per element, with the path
    replaced by that element."""
    import copy

    obj = _as_object(v)
    segs = _as_string(path).split(".")
    target = _get_path(obj, tuple(segs))
    if isinstance(target, list):
        out = []
        for item in target:
            c = copy.deepcopy(obj)
            _set_path(c, segs, item)
            out.append(c)
        return out
    if isinstance(target, dict):
        outd = {}
        for k, item in target.items():
            c = copy.deepcopy(obj)
            _set_path(c, segs, item)
            outd[k] = c
        return outd
    raise BloblangError(f"expected array or object at {path!r}, got {_type_name(target)}")


def _squash(arr):
    out = {}
    for obj in arr:
        out = _m_merge(out, _as_object(obj)) if out else dict(_as_object(obj))
    return out


def _m_ts_tz(v, tz):
    ts = _to_datetime(v)
    if tz.upper() == "UTC":
        return ts.astimezone(_dt.timezone.utc)
    import zoneinfo

    return ts.astimezone(zoneinfo.ZoneInfo(tz))


def _m_ts_strftime(v, fmt, tz=None):
    ts = _to_datetime(v)
    if tz:
        ts = _m_ts_tz(ts, tz)
    return ts.strftime(fmt)


def _ts_round(v, dur_ns):
    ts = _to_datetime(v)
    ns = int(ts.timestamp() * 1e9)
    d = _as_int(dur_ns)
    rounded = ((ns + d // 2) // d) * d
    return _dt.datetime.fromtimestamp(rounded / 1e9, _dt.timezone.utc)


def _field_annotation(node) -> Optional[str]:
    """Go's fieldFunction.Annotation(): the `this.a.b` provenance string
    for a context/root field chain, or None for non-field targets."""
    segs: list[str] = []
    cur = node
    while isinstance(cur, A.GetField):
        segs.append(str(cur.seg))
        cur = cur.target
    if isinstance(cur, A.ContextRef):
        head = cur.name or "this"
        path = [str(s) for s in cur.path] + list(reversed(segs))
    elif isinstance(cur, A.RootRef):
        head = "root"
        path = [str(s) for s in cur.path] + list(reversed(segs))
    else:
        return None
    full = head + ("." + ".".join(path) if path else "")
    return f"field `{full}`"


def _m_compare_pw(scheme: str, v, hashed) -> bool:
    """impl/crypto bcrypt.go:26 / argon2.go:110: True/False on compare;
    malformed hashes error (Go returns the error, not a mismatch)."""
    import importlib

    mod = importlib.import_module(f"benthos_spark.functions.{scheme}")
    try:
        return mod.compare(_as_string(v), _as_string(hashed))
    except ValueError as e:
        raise BloblangError(f"compare_{scheme}: {e}") from e


def _m_geoip(v, path):
    """Shared geoip_* lookup: parse the IP, search the mmdb, return the
    record (error for malformed IPs, like the reference)."""
    import ipaddress

    from benthos_spark.functions import mmdb

    s = _as_string(v)
    try:
        ipaddress.ip_address(s)
    except ValueError:
        raise BloblangError(
            f"value {s} does not appear to be a valid v4 or v6 IP address"
        )
    try:
        return mmdb.open_db(_as_string(path)).lookup(s)
    except (OSError, mmdb.MmdbError) as e:
        raise BloblangError(f"geoip lookup failed: {e}") from e
