"""JMESPath → columnar compiler, reusing the jq CV machinery.

The `jmespath` processor (processor_jmespath.go:25) otherwise runs the
spec-complete interpreter per row inside Arrow batches
(functions/jmespath_program.py). JMESPath's navigation semantics map
cleanly onto null-safe VARIANT access (missing field → null, field on
null → null), and its projections map onto higher-order array
functions, so the common shapes compile to pure Column expressions:

- dotted identifier paths ``a.b.c`` (incl. quoted ``"weird key"``),
  indexes ``a[0]`` / ``a[-1]``, pipes
- list projections ``a[*].b`` (nested projections nest per element,
  exactly like the rewritten interpreter / go-jmespath), object-value
  projections ``a.*.b``, flatten ``a[].b``, slices ``a[1:3]`` /
  ``a[-2:]`` (python bound semantics, step 1)
- filter projections ``a[?x > `1`].y`` with JMESPath comparison
  semantics (ordering is numbers-only → null, equality is deep) and
  ``&&``/``||``/``!`` truthiness
- multiselect hash/list (null-LHS rule)
- functions: length, contains, starts_with, ends_with, not_null,
  to_string, to_number, abs, ceil, floor, sum, avg, min, max, reverse,
  keys, join, type, to_array, sort
- expression-reference family: ``sort_by``/``min_by``/``max_by`` with a
  compiled ``&body`` key (array_sort comparator / aggregate fold —
  keys must be all-number or all-string per the spec, anything else
  yields null where the interpreter raises), and ``map(&expr, arr)``
  (null results KEPT, unlike projections)
- ``merge(a, b, …)`` via variant→map casts + ``map_concat`` (the
  processor sets ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` when a
  compiled merge is present — JMESPath's later-keys-win rule)

Everything else — exprefs outside the by-family/map — raises
``JmesCompileError`` and the caller falls back to the interpreter, so
coverage is a pure optimization. The
dual-backend conformance test (tests/test_jmespath_columnar.py) pins
the agreeing corpus. Numbers render with Go ``encoding/json``
normalization (integral floats print as integers — go-jmespath's
marshal; shared with the jq tier's gojq rule).

Documented divergences from the per-row interpreter (both deliberate):

- where the interpreter RAISES an invalid-type error (``length(`1`)``),
  the compiled plan yields null — a compiled projection cannot abort a
  single message, and go-jmespath's host processor flags the message
  rather than crashing the stream;
- compiled object renders sort keys (variant ``to_json``) and
  object-value projections — and ``keys()`` — iterate in sorted-key
  order, while the interpreter preserves insertion order
  (go-jmespath's map iteration is randomized, so neither order is
  spec-bearing);
- ``min``/``max``/``join`` yield null where the interpreter raises on
  mixed-type arrays (same lenient-error rule as above).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from benthos_spark.functions.jmespath_program import (
    JmesError,
    _Parser as _ProgParser,
    _tokenize as _prog_tokenize,
)
from benthos_spark.functions.jq_columnar import (
    _INT_LEXEME,
    CV,
    _as_num,
    _compile as _jq_compile,
    _num,
    _render,
)


class JmesCompileError(ValueError):
    pass


# a JSON value lexeme that denotes a number (rendered text starts with
# a digit or minus sign; strings start with '"', containers with [/{)
_NUM_LEXEME = r"^-?[0-9]"


@dataclass
class _Arr:
    """array<variant> intermediate (flatten / slice output)."""

    col: Column


@dataclass
class _Frags:
    """A projection result: array<string> of compact-JSON fragments
    (null fragments already dropped — spec: projections drop nulls).
    SQL-null column ≙ the projection base was not a list."""

    col: Column


def _elems(jv) -> Column:
    """The value as array<variant> — null when it is not a JSON array."""
    if isinstance(jv, _Arr):
        return jv.col
    if isinstance(jv, _Frags):
        return F.transform(jv.col, lambda s: F.parse_json(s))
    if jv.kind == "variant":
        return F.try_variant_get(jv.vcol(), "$", "array<variant>")
    if jv.kind == "json":
        return F.try_variant_get(F.try_parse_json(jv.col), "$", "array<variant>")
    # str/num/bool/null are statically not lists
    return F.lit(None).cast("array<variant>")


def _render_jv(jv) -> Column:
    """Compact JSON text of the value; never SQL-null ('null' instead)."""
    if isinstance(jv, _Arr):
        return F.coalesce(F.to_json(jv.col), F.lit("null"))
    if isinstance(jv, _Frags):
        return F.coalesce(
            F.concat(F.lit("["), F.array_join(jv.col, ","), F.lit("]")), F.lit("null")
        )
    return _render(jv)


def _truthy(jv) -> Column:
    # JMESPath truthiness: false-like = null, false, '', [], {}
    return ~_render_jv(jv).isin("null", "false", '""', "[]", "{}")


def _scalar_cv(jv) -> CV:
    """A plain CV for contexts that navigate into the value."""
    if isinstance(jv, (_Arr, _Frags)):
        return CV.variant(F.try_parse_json(_render_jv(jv)))
    return jv


def _str_val(jv, rendered: Column) -> Column:
    """The string payload when the value IS a JSON string, else null."""
    if not isinstance(jv, (_Arr, _Frags)):
        if jv.kind == "str":
            return jv.col
        if jv.kind == "variant":
            return F.when(rendered.startswith('"'), F.try_variant_get(jv.vcol(), "$", "string"))
    return F.when(
        rendered.startswith('"'),
        F.try_variant_get(F.try_parse_json(rendered), "$", "string"),
    )


def _cmp(op: str, l, r) -> CV:
    """JMESPath comparison: `==`/`!=` are deep equality (numeric lane
    keeps 1 == 1.0 and stays exact past 2^53); ordering operators are
    valid for numbers only and yield null otherwise (spec §comparators),
    which a filter treats as excluded."""
    lr, rr = _render_jv(l), _render_jv(r)
    ln, rn = lr.rlike(_NUM_LEXEME), rr.rlike(_NUM_LEXEME)
    ld, rd = lr.try_cast("double"), rr.try_cast("double")
    if op in ("==", "!="):
        both_int = lr.rlike(_INT_LEXEME) & rr.rlike(_INT_LEXEME)
        eq = (
            F.when(both_int, lr.try_cast("decimal(38,0)") == rr.try_cast("decimal(38,0)"))
            .when(ln & rn, ld == rd)
            .otherwise(lr == rr)
        )
        return CV("bool", col=eq if op == "==" else ~eq)
    cmps = {"<": ld < rd, "<=": ld <= rd, ">": ld > rd, ">=": ld >= rd}
    return CV("bool", col=F.when(ln & rn, cmps[op]))


def _project(elems: Column, cond_ast, rhs_ast) -> _Frags:
    """Spec projection: optionally filter elements by a truthy
    condition, apply the absorbed RHS per element, drop null results."""
    if cond_ast is not None:
        elems = F.filter(elems, lambda e: _truthy(_compile_jmes(cond_ast, CV.variant(e))))
    frags = F.transform(elems, lambda e: _render_jv(_compile_jmes(rhs_ast, CV.variant(e))))
    return _Frags(F.filter(frags, lambda f: f != F.lit("null")))


def _lit_jv(v):
    if v is None:
        return CV("null")
    if isinstance(v, bool):
        return CV("bool", col=F.lit(v))
    if isinstance(v, (int, float)):
        return _num(F.lit(float(v)), F.lit(isinstance(v, int)), F.lit(int(v)))
    if isinstance(v, str):
        return CV("str", col=F.lit(v))
    # container literal: sorted keys to match the variant renderer
    return CV(
        "json",
        col=F.lit(json.dumps(v, separators=(",", ":"), ensure_ascii=False, sort_keys=True)),
    )


def _compile_jmes(node, cur):
    tag = node[0]
    if tag == "current":
        return cur
    if tag == "lit":
        return _lit_jv(node[1])
    if tag == "pipe":
        return _compile_jmes(node[2], _compile_jmes(node[1], cur))
    if tag == "field":
        base = _compile_jmes(node[1], cur)
        if isinstance(base, (_Arr, _Frags)):
            return CV("null")  # a field on a list value is null
        if base.kind == "json":
            base = CV.variant(F.try_parse_json(base.col))
        if base.kind != "variant":
            return CV("null")
        _, out = _jq_compile(("field", ("identity",), node[2]), base, None)
        return out
    if tag == "index":
        arr = _elems(_compile_jmes(node[1], cur))
        i = node[2]
        elem = F.get(arr, i) if i >= 0 else F.get(arr, F.size(arr) + i)
        return CV.variant(elem)
    if tag == "slice":
        _, base_n, a, b, step = node
        arr = _elems(_compile_jmes(base_n, cur))
        n = F.size(arr)

        def clamp(bound, default):
            # python slice-bound semantics: negatives count from the
            # end, results clamp into [0, n]
            if bound is None:
                return default
            if bound >= 0:
                return F.least(F.lit(bound), n)
            return F.greatest(n + F.lit(bound), F.lit(0))

        if step in (None, 1):
            lo = clamp(a, F.lit(0))
            hi = clamp(b, n)
            length = F.greatest(hi - lo, F.lit(0))
            return _Arr(F.when(arr.isNotNull(), F.slice(arr, lo + 1, length)))
        # stepped slice (python slice.indices semantics): materialize
        # the index sequence lo, lo+step, ... and gather — one
        # F.sequence + F.transform, no Python
        st = step
        if st == 0:
            raise JmesCompileError("slice step cannot be 0")
        if st > 0:
            lo, hi = clamp(a, F.lit(0)), clamp(b, n)
        else:
            # negative step: bounds clamp into [-1, n-1], defaults
            # start=n-1 stop=-1 (exclusive)
            def clampn(bound, default):
                if bound is None:
                    return default
                if bound >= 0:
                    return F.least(F.lit(bound), n - 1)
                return F.greatest(n + F.lit(bound), F.lit(-1))

            lo, hi = clampn(a, n - 1), clampn(b, F.lit(-1))
        cnt = F.greatest(
            F.ceil((hi - lo).cast("double") / F.lit(float(st))).cast("int"), F.lit(0)
        )
        idxs = F.when(cnt > 0, F.sequence(F.lit(0), cnt - 1)).otherwise(
            F.array().cast("array<int>")
        )

        def gather(j):
            return F.get(arr, lo + j * F.lit(st))

        return _Arr(F.when(arr.isNotNull(), F.transform(idxs, gather)))
    if tag == "project":
        return _project(_elems(_compile_jmes(node[1], cur)), None, node[2])
    if tag == "fproject":
        return _project(_elems(_compile_jmes(node[1], cur)), node[2], node[3])
    if tag == "vproject":
        base = _scalar_cv(_compile_jmes(node[1], cur))
        if base.kind == "json":
            base = CV.variant(F.try_parse_json(base.col))
        if base.kind != "variant":
            return CV("null")
        vals = F.map_values(F.try_variant_get(base.vcol(), "$", "map<string,variant>"))
        return _project(vals, None, node[2])
    if tag == "flatten":
        elems = _elems(_compile_jmes(node[1], cur))
        merged = F.flatten(
            F.transform(
                elems,
                lambda e: F.coalesce(F.try_variant_get(e, "$", "array<variant>"), F.array(e)),
            )
        )
        return _Arr(merged)
    if tag == "or":
        l, r = _compile_jmes(node[1], cur), _compile_jmes(node[2], cur)
        return CV("json", col=F.when(_truthy(l), _render_jv(l)).otherwise(_render_jv(r)))
    if tag == "and":
        l, r = _compile_jmes(node[1], cur), _compile_jmes(node[2], cur)
        return CV("json", col=F.when(_truthy(l), _render_jv(r)).otherwise(_render_jv(l)))
    if tag == "not":
        return CV("bool", col=~_truthy(_compile_jmes(node[1], cur)))
    if tag == "cmp":
        return _cmp(node[1], _compile_jmes(node[2], cur), _compile_jmes(node[3], cur))
    if tag in ("mshash", "mslist"):
        base = _scalar_cv(
            _compile_jmes(node[1], cur) if node[1] != ("current",) else cur
        )
        if base.kind == "json":
            base = CV.variant(F.try_parse_json(base.col))
        if base.kind not in ("variant",):
            raise JmesCompileError(f"multiselect over a {base.kind} value")
        parts = [F.lit("{" if tag == "mshash" else "[")]
        for i, item in enumerate(node[2]):
            if i:
                parts.append(F.lit(","))
            if tag == "mshash":
                key, expr = item
                parts.append(F.lit(json.dumps(key, ensure_ascii=False) + ":"))
            else:
                expr = item
            parts.append(_render_jv(_compile_jmes(expr, base)))
        parts.append(F.lit("}" if tag == "mshash" else "]"))
        rendered = F.concat(*parts)
        # null-LHS rule: a multiselect over a null value is null
        bv = base.vcol()
        not_null = bv.isNotNull() & ~F.is_variant_null(bv)
        return CV("json", col=F.when(not_null, rendered))
    if tag == "func":
        name, arg_nodes = node[1], node[2]
        # expression-reference family: the &body compiles per element
        if (
            name in ("sort_by", "min_by", "max_by")
            and len(arg_nodes) == 2
            and arg_nodes[1][0] == "expref"
        ):
            return _by_family(name, _compile_jmes(arg_nodes[0], cur), arg_nodes[1][1])
        if name == "map" and len(arg_nodes) == 2 and arg_nodes[0][0] == "expref":
            return _map_expref(arg_nodes[0][1], _compile_jmes(arg_nodes[1], cur))
        if name == "sort" and len(arg_nodes) == 1:
            # sort(a) ≡ sort_by(a, &@)
            return _by_family("sort_by", _compile_jmes(arg_nodes[0], cur), ("current",))
        if name == "merge" and len(arg_nodes) >= 1:
            # objects merge left→right, later keys win (the processor
            # sets spark.sql.mapKeyDedupPolicy=LAST_WIN when a compiled
            # merge is present); non-objects yield null (lenient rule)
            maps, guards = [], []
            for a in arg_nodes:
                cv = _compile_jmes(a, cur)
                r = _render_jv(cv)
                maps.append(
                    F.try_variant_get(F.try_parse_json(r), "$", "map<string, variant>")
                )
                guards.append(r.startswith("{"))
            all_obj = guards[0]
            for g in guards[1:]:
                all_obj = all_obj & g
            merged = maps[0] if len(maps) == 1 else F.map_concat(*maps)
            return CV("json", col=F.when(all_obj, F.to_json(merged)))
        return _fn(name, [_compile_jmes(a, cur) for a in _args(arg_nodes)], cur)
    raise JmesCompileError(f"node {tag!r} not compiled")


def _ord3(a: Column, b: Column) -> Column:
    return F.when(a < b, F.lit(-1)).when(a > b, F.lit(1)).otherwise(F.lit(0))


def _key_lanes(body, e: Column):
    """Per-element sort key: (rendered lexeme, numeric lane, string
    lane) of the &body applied to the element."""
    kv = _compile_jmes(body, CV.variant(e))
    r = F.coalesce(_render_jv(kv), F.lit("null"))
    return (
        r,
        F.when(r.rlike(_NUM_LEXEME), r.try_cast("double")),
        F.when(r.startswith('"'), _str_val(kv, r)),
    )


def _by_family(name: str, arrcv, body) -> CV:
    """sort_by / min_by / max_by with a compiled &expression key. Spec:
    keys must be ALL numbers or ALL strings — the interpreter raises on
    anything else, the compiled plan yields null (lenient-error rule).
    Ties keep first occurrence (Python min/max + stable sort parity)."""
    arr = _elems(arrcv)
    all_num = F.forall(arr, lambda e: _key_lanes(body, e)[0].rlike(_NUM_LEXEME))
    all_str = F.forall(arr, lambda e: _key_lanes(body, e)[0].startswith('"'))
    valid = arr.isNotNull() & (all_num | all_str)
    if name == "sort_by":

        def cmp(le, re_):
            _, ln_, ls = _key_lanes(body, le)
            _, rn, rs = _key_lanes(body, re_)
            return (
                F.when(ln_.isNotNull() & rn.isNotNull(), _ord3(ln_, rn))
                .when(ls.isNotNull() & rs.isNotNull(), _ord3(ls, rs))
                .otherwise(F.lit(0))
            )

        out_arr = F.array_sort(arr, cmp)
        rendered = F.concat(
            F.lit("["),
            F.array_join(
                F.transform(out_arr, lambda e: F.coalesce(F.to_json(e), F.lit("null"))),
                ",",
            ),
            F.lit("]"),
        )
        return CV("json", col=F.when(valid, rendered))
    take_lt = name == "min_by"

    def step(acc, x):
        _, xn, xs = _key_lanes(body, x)
        _, an, as_ = _key_lanes(body, acc)
        if take_lt:
            better = (xn.isNotNull() & an.isNotNull() & (xn < an)) | (
                xs.isNotNull() & as_.isNotNull() & (xs < as_)
            )
        else:
            better = (xn.isNotNull() & an.isNotNull() & (xn > an)) | (
                xs.isNotNull() & as_.isNotNull() & (xs > as_)
            )
        return F.when(better, x).otherwise(acc)

    best = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))), F.get(arr, 0), step
    )
    nonempty = valid & (F.size(arr) > 0)
    return CV("json", col=F.when(nonempty, F.coalesce(F.to_json(best), F.lit("null"))))


def _map_expref(body, arrcv) -> CV:
    """map(&expr, array): unlike projections, null results are KEPT."""
    arr = _elems(arrcv)

    def b(e):
        return F.coalesce(_render_jv(_compile_jmes(body, CV.variant(e))), F.lit("null"))

    rendered = F.concat(F.lit("["), F.array_join(F.transform(arr, b), ","), F.lit("]"))
    return CV("json", col=F.when(arr.isNotNull(), rendered))


def _args(arg_nodes):
    for a in arg_nodes:
        if a[0] == "expref":
            raise JmesCompileError("expression references not compiled")
        yield a


def _fn(name: str, args: list, cur) -> CV:
    """The compilable slice of the spec function library. Where the
    interpreter raises invalid-type, these yield null (see module doc)."""
    if name == "length" and len(args) == 1:
        (a,) = args
        r = _render_jv(a)
        n = (
            F.when(r.startswith('"'), F.length(_str_val(a, r)))
            .when(r.startswith("["), F.size(_elems(a)))
            .when(r.startswith("{"), F.size(F.json_object_keys(r)))
            .cast("long")
        )
        return _num(n.cast("double"), F.lit(True), n)
    if name == "contains" and len(args) == 2:
        sub, item = args
        sr, ir = _render_jv(sub), _render_jv(item)
        in_str = F.when(
            ir.startswith('"'), F.contains(_str_val(sub, sr), _str_val(item, ir))
        ).otherwise(F.lit(False))
        in_arr = F.exists(_elems(sub), lambda e: _cmp("==", CV.variant(e), item).col)
        return CV(
            "bool",
            col=F.when(sr.startswith('"'), in_str).when(sr.startswith("["), in_arr),
        )
    if name in ("starts_with", "ends_with") and len(args) == 2:
        l, r = args
        lr, rr = _render_jv(l), _render_jv(r)
        sl, sr = _str_val(l, lr), _str_val(r, rr)
        op = F.startswith if name == "starts_with" else F.endswith
        return CV("bool", col=F.when(lr.startswith('"') & rr.startswith('"'), op(sl, sr)))
    if name == "not_null" and args:
        chain = None
        for a in args:
            r = _render_jv(a)
            chain = F.when(r != "null", r) if chain is None else chain.when(r != "null", r)
        return CV("json", col=chain)
    if name == "to_string" and len(args) == 1:
        (a,) = args
        r = _render_jv(a)
        return CV("str", col=F.when(r.startswith('"'), _str_val(a, r)).otherwise(r))
    if name == "to_number" and len(args) == 1:
        (a,) = args
        r = _render_jv(a)
        s = _str_val(a, r)
        d = F.when(r.rlike(_NUM_LEXEME), r.try_cast("double")).when(
            r.startswith('"'), s.try_cast("double")
        )
        isint = F.when(r.rlike(_NUM_LEXEME), r.rlike(_INT_LEXEME)).when(
            r.startswith('"'), s.rlike(_INT_LEXEME)
        )
        lng = F.when(r.rlike(_NUM_LEXEME), r.try_cast("bigint")).when(
            r.startswith('"'), s.try_cast("bigint")
        )
        return _num(d, F.coalesce(isint, F.lit(False)), lng)
    if name in ("abs", "ceil", "floor") and len(args) == 1:
        n = _as_num(_scalar_cv(args[0])) if not isinstance(args[0], (_Arr, _Frags)) else None
        if n is None:
            return CV("null")
        if name == "abs":
            return _num(F.abs(n.d), n.isint, F.abs(n.l))
        # int input: keep the exact long lane (ceil of 2^53+1 must not
        # round through the double)
        c = F.when(n.isint, n.l).otherwise(F.ceil(n.d) if name == "ceil" else F.floor(n.d))
        return _num(c.cast("double"), F.lit(True), c)
    if name in ("sum", "avg") and len(args) == 1:
        elems = _elems(args[0])
        all_num = F.forall(elems, lambda e: F.to_json(e).rlike(_NUM_LEXEME))
        dbls = F.transform(elems, lambda e: F.try_variant_get(e, "$", "double"))
        total = F.when(all_num, F.aggregate(dbls, F.lit(0.0), lambda acc, x: acc + x))
        if name == "avg":
            return _num(F.when(F.size(elems) > 0, total / F.size(elems)), F.lit(False))
        all_int = F.forall(elems, lambda e: F.to_json(e).rlike(_INT_LEXEME))
        lngs = F.transform(elems, lambda e: F.try_variant_get(e, "$", "bigint"))
        total_l = F.aggregate(lngs, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        return _num(total, F.coalesce(all_int, F.lit(False)), total_l)
    if name in ("min", "max") and len(args) == 1:
        elems = _elems(args[0])
        lex = F.transform(elems, lambda e: F.coalesce(F.to_json(e), F.lit("null")))
        all_num = F.forall(lex, lambda s: s.rlike(_NUM_LEXEME))
        all_str = F.forall(lex, lambda s: s.startswith('"'))
        fn = F.array_min if name == "min" else F.array_max
        dbls = F.transform(elems, lambda e: F.try_variant_get(e, "$", "double"))
        strs = F.transform(elems, lambda e: F.try_variant_get(e, "$", "string"))
        d = fn(dbls)
        # winner's int-ness from its own lexeme (min of [10, 2.5] is 2.5)
        win_int = F.exists(
            F.zip_with(dbls, lex, lambda dv, s: F.struct(dv.alias("d"), s.alias("s"))),
            lambda p: (p["d"] == d) & p["s"].rlike(_INT_LEXEME),
        )
        num_js = F.when(win_int, d.cast("long").cast("string")).otherwise(
            d.cast("string")
        )
        out = (
            F.when((F.size(elems) > 0) & all_num, num_js)
            .when((F.size(elems) > 0) & all_str, _json_quote_str(fn(strs)))
            .otherwise(F.lit(None).cast("string"))
        )
        return CV("json", col=out)
    if name == "reverse" and len(args) == 1:
        (a,) = args
        r = _render_jv(a)
        elems = _elems(a)
        arr_js = F.concat(
            F.lit("["),
            F.array_join(
                F.reverse(F.transform(elems, lambda e: F.coalesce(F.to_json(e), F.lit("null")))),
                ",",
            ),
            F.lit("]"),
        )
        str_js = _json_quote_str(F.reverse(_str_val(a, r)))
        return CV(
            "json",
            col=F.when(r.startswith("["), arr_js).when(r.startswith('"'), str_js),
        )
    if name == "keys" and len(args) == 1:
        (a,) = args
        r = _render_jv(a)
        ks = F.json_object_keys(r)  # insertion order from the JSON text
        out = F.concat(
            F.lit("["), F.array_join(F.transform(ks, _json_quote_str), ","), F.lit("]")
        )
        return CV("json", col=F.when(r.startswith("{"), out))
    if name == "join" and len(args) == 2:
        glue, arr = args
        gr = _render_jv(glue)
        g = _str_val(glue, gr)
        elems = _elems(arr)
        all_str = F.forall(
            elems, lambda e: F.coalesce(F.to_json(e), F.lit("null")).startswith('"')
        )
        acc = F.aggregate(
            F.transform(elems, lambda e: F.try_variant_get(e, "$", "string")),
            F.lit(None).cast("string"),
            lambda a_, x: F.when(a_.isNull(), x).otherwise(F.concat(a_, g, x)),
        )
        return CV(
            "str",
            col=F.when(
                gr.startswith('"') & all_str & elems.isNotNull(),
                F.coalesce(acc, F.lit("")),
            ),
        )
    if name == "type" and len(args) == 1:
        r = _render_jv(args[0])
        t = (
            F.when(r == "null", "null")
            .when((r == "true") | (r == "false"), "boolean")
            .when(r.startswith('"'), "string")
            .when(r.startswith("["), "array")
            .when(r.startswith("{"), "object")
            .otherwise("number")
        )
        return CV("str", col=t)
    if name == "to_array" and len(args) == 1:
        # spec: arrays pass through; ANY other value (null included)
        # wraps into a one-element array
        r = _render_jv(args[0])
        out = F.when(r.startswith("["), r).otherwise(
            F.concat(F.lit("["), r, F.lit("]"))
        )
        return CV("json", col=out)
    raise JmesCompileError(f"function {name!r} not compiled")


def _json_quote_str(col: Column) -> Column:
    """String column → JSON string literal (escaped)."""
    return F.regexp_extract(
        F.to_json(F.struct(col.alias("s"))), r'^\{"s":(.*)\}$', 1
    )


_FNS = {
    "length": 1,
    "contains": 2,
    "starts_with": 2,
    "ends_with": 2,
    "to_string": 1,
    "to_number": 1,
    "abs": 1,
    "ceil": 1,
    "floor": 1,
    "sum": 1,
    "avg": 1,
    "min": 1,
    "max": 1,
    "reverse": 1,
    "keys": 1,
    "join": 2,
    "type": 1,
    "to_array": 1,
}


def _validate(node):
    """Pure AST walk: reject unsupported nodes BEFORE any Column is
    built (try_compile must work without an active SparkSession)."""
    tag = node[0]
    if tag in ("current", "lit"):
        return
    if tag in ("field", "flatten", "not"):
        _validate(node[1])
        return
    if tag in ("pipe", "or", "and", "project", "vproject"):
        _validate(node[1])
        _validate(node[2])
        return
    if tag == "index":
        _validate(node[1])
        return
    if tag == "slice":
        _, base, a, b, step = node
        if step == 0:
            raise JmesCompileError("slice step cannot be 0")
        _validate(base)
        return
    if tag == "fproject":
        _validate(node[1])
        _validate(node[2])
        _validate(node[3])
        return
    if tag == "cmp":
        _validate(node[2])
        _validate(node[3])
        return
    if tag in ("mshash", "mslist"):
        _validate(node[1])
        for item in node[2]:
            _validate(item[1] if tag == "mshash" else item)
        return
    if tag == "func":
        name, arg_nodes = node[1], node[2]
        if (
            name in ("sort_by", "min_by", "max_by")
            and len(arg_nodes) == 2
            and arg_nodes[1][0] == "expref"
        ):
            _validate(arg_nodes[0])
            _validate(arg_nodes[1][1])
            return
        if name == "map" and len(arg_nodes) == 2 and arg_nodes[0][0] == "expref":
            _validate(arg_nodes[0][1])
            _validate(arg_nodes[1])
            return
        if name == "sort" and len(arg_nodes) == 1:
            _validate(arg_nodes[0])
            return
        if name == "merge" and len(arg_nodes) >= 1:
            for a in arg_nodes:
                if a[0] == "expref":
                    raise JmesCompileError("expression references not compiled")
                _validate(a)
            return
        if name == "not_null":
            if not arg_nodes:
                raise JmesCompileError("not_null needs arguments")
        elif _FNS.get(name) != len(arg_nodes):
            raise JmesCompileError(f"function {name!r} not compiled")
        for a in arg_nodes:
            if a[0] == "expref":
                raise JmesCompileError("expression references not compiled")
            _validate(a)
        return
    raise JmesCompileError(f"node {tag!r} not compiled")


def _uses_merge(x) -> bool:
    if isinstance(x, (tuple, list)):
        if isinstance(x, tuple) and x and x[0] == "func" and x[1] == "merge":
            return True
        return any(_uses_merge(c) for c in x)
    return False


class CompiledJmes:
    def __init__(self, src: str):
        p = _ProgParser(_prog_tokenize(src))
        self.ast = p.pipe()
        if p.peek()[0] != "eof":
            raise JmesCompileError(f"trailing input {p.peek()[1]!r}")
        _validate(self.ast)
        # merge() compiles onto map_concat, which needs LAST_WIN dedup —
        # the processor sets the conf when this flag is on
        self.uses_merge = _uses_merge(self.ast)

    def apply(self, variant_col: Column) -> Column:
        return _render_jv(_compile_jmes(self.ast, CV.variant(variant_col)))


def try_compile(src: str) -> Optional[CompiledJmes]:
    try:
        return CompiledJmes(src)
    except (JmesCompileError, JmesError, ValueError):
        return None
