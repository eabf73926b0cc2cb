"""jq program → columnar compiler (the VARIANT fast path for programs).

The reference embeds compiled gojq (internal/impl/pure/processor_jq.go:26)
so jq programs run at native speed; our full interpreter
(functions/jq_program.py) is per-row Python inside Arrow batches —
correct, but the engine's only row-at-a-time surface. This module
compiles the *common program subset* straight onto Spark VARIANT /
Column expressions so `JqProcessor` stays JVM-side for the shapes real
pipelines use:

- field paths ``.a.b[0]`` / ``.tags[-1]`` (with ``?``), identity
  ``.``, slices ``.[2:5]`` / ``.[:n]`` / ``.[n:]`` / ``.[-2:]`` over
  arrays and strings (python bound semantics)
- literals, object ``{k: e}`` and array ``[e, ...]`` construction
- arithmetic ``+ - * / %``, comparisons, ``and``/``or``, ``//``
- ``select(cond)`` as a pipe stage (compiles to a relational filter)
- ``if .. then .. elif .. else .. end``, ``map(f)``, ``floor``/``ceil``,
  ``tostring``/``tonumber``, ``not``, ``length``, ``type``,
  ``has("key")``, ``abs``/``fabs``, ``first``/``last``, ``add``,
  ``min``/``max`` (numeric arrays)
- variable bindings ``EXPR as $x | BODY`` and ``$x`` references
- ``reduce .[] as $x (INIT; UPDATE)`` — compiled to ``F.aggregate`` with
  the accumulator carried as compact JSON (re-parsed per step with
  ``try_parse_json``), so int-ness survives the loop via the lexeme
- string methods with literal args: ``ltrimstr``/``rtrimstr``/
  ``startswith``/``endswith``/``split``/``join``/``test``/
  ``ascii_downcase``/``ascii_upcase``

- bare generators ``.items[]`` / ``.a[].b`` / ``.[]`` as pipe stages and
  inside ``[...]`` collection — compiled to higher-order array exprs
  (filter/transform/flatten) with the program-level stream semantics
  (0 outputs filter the message, 1 output is the value, n outputs
  become an array, per processor_jq.go's gojq result collection)
- ``,`` stream concatenation (pipe level / array items), literal-int
  ``range()`` generators, and the entries family ``to_entries`` /
  ``from_entries`` / ``with_entries(f)`` (≡ to_entries|map(f)|
  from_entries)
- generators in OBJECT-VALUE and STRING-INTERPOLATION position
  distribute cartesian (later fields/parts vary fastest — pinned
  against the interpreter), object merge ``+`` (right-biased
  ``map_concat``; the processor sets mapKeyDedupPolicy=LAST_WIN via
  ``CompiledJq.uses_merge``), and stream limiting ``limit(n; f)`` /
  ``first(f)`` / ``last(f)``

- ``..`` / argless ``recurse`` (depth-BOUNDED compile: pre-order
  expansion to ``RECURSE_MAX_DEPTH`` nested transform/flatten levels;
  the processor row-splits on ``recurse_depth_exceeded`` and routes
  deeper documents to the interpreter, so the bound picks the TIER per
  row, never the answer) and the jq type filters ``numbers``/
  ``strings``/``booleans``/``nulls``/``objects``/``arrays``/
  ``iterables``/``scalars`` (≡ select(type == ...))

Anything else (``recurse(f)``, ``$__loc__``, computed object keys)
raises
``JqCompileError`` and the caller falls back to the interpreter, so
coverage is a pure optimization, never a semantics change. Numbers render with gojq normalization: integral floats in the
exact double range print as integers (``0.5*2`` → ``1``) — both
backends share the rule (``normalize_numbers`` in jq_program.py), which
also makes the variant render→parse round-trip lossless. Number
int-ness is tracked per row (jq ints must render ``6``, floats ``6.0``)
via the variant's own JSON lexeme. Known divergences from the
interpreter, pinned by the dual-backend conformance test
(tests/test_jq_columnar.py):

- lenient errors: arithmetic on null / iterating null with ``map``
  yields JSON null instead of raising (jq would error);
- object key order: variant ``to_json`` emits keys sorted, the
  interpreter preserves input order — JSON-equivalent output bytes;
- float rendering: very large/small doubles use Java notation
  (``1.0E20``) rather than Python's (``1e+20``);
- ``test()`` compiles to Java regex (``rlike``) while the interpreter
  uses Python ``re`` — identical for the common syntax, divergent on
  exotic escapes (jq itself uses a third engine, Oniguruma);
- ``min``/``max`` compile for numeric arrays only; arrays of other
  types yield null (the interpreter orders them jq-style);
- compiled ``.[]`` over an OBJECT yields values in sorted-key order
  (like every compiled object iteration); the interpreter preserves
  document order. Arrays iterate in document order in both;
- iterating null / scalars yields the empty stream (message filtered)
  instead of erroring.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from benthos_spark.functions.jq_program import JqError, _tokenize, split_interpolated


class JqCompileError(JqError):
    """Program is outside the columnar subset — use the interpreter."""


_IDENT_PATH = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_INT_LEXEME = r"^-?[0-9]+$"


# ---------------------------------------------------------------------------
# compiled values: tagged columns
# ---------------------------------------------------------------------------


@dataclass
class CV:
    """A compiled jq value: `kind` ∈ variant|num|str|bool|null|json.
    num carries (d: double col, isint: bool col); variant is lazy — a
    (base, path) pair materialized into ONE try_variant_get; `json` is
    an already-rendered compact JSON text (the unifier for branches of
    if/alt and constructed objects/arrays)."""

    kind: str
    col: Optional[Column] = None  # variant/str/bool/json payload
    d: Optional[Column] = None  # num: double value
    isint: Optional[Column] = None  # num: per-row jq int-ness
    l: Optional[Column] = None  # num: exact long lane (used when isint)
    base: Optional[Column] = None  # variant: unmaterialized base
    path: str = "$"

    @staticmethod
    def variant(base: Column, path: str = "$") -> "CV":
        return CV("variant", base=base, path=path)

    def vcol(self) -> Column:
        """Materialize a variant CV into one variant_get call."""
        if self.kind != "variant":
            raise JqCompileError(f"not a variant value: {self.kind}")
        if self.col is not None:
            return self.col
        return self.base if self.path == "$" else F.try_variant_get(self.base, self.path, "variant")


def _num(d: Column, isint: Column, l: Optional[Column] = None) -> CV:
    """Numbers carry a double lane plus an exact long lane: jq renders
    ints without a fraction, and int arithmetic must not lose precision
    past 2^53 (the interpreter uses Python ints)."""
    return CV("num", d=d, isint=isint, l=(d.cast("long") if l is None else l))


def _as_num(v: CV) -> CV:
    if v.kind == "num":
        return v
    if v.kind == "variant":
        lng = (
            F.try_variant_get(v.col, "$", "bigint")
            if v.col is not None
            else F.try_variant_get(v.base, v.path, "bigint")
        )
        return _num(_variant_double(v), F.to_json(v.vcol()).rlike(_INT_LEXEME), lng)
    if v.kind == "json":
        return _num(v.col.try_cast("double"), v.col.rlike(_INT_LEXEME), v.col.try_cast("bigint"))
    if v.kind == "null":
        return _num(F.lit(None).cast("double"), F.lit(False))
    raise JqCompileError(f"cannot use {v.kind} as number")


def _variant_double(v: CV) -> Column:
    if v.col is not None:
        return F.try_variant_get(v.col, "$", "double")
    return F.try_variant_get(v.base, v.path, "double")


def _as_str(v: CV) -> Column:
    """The string payload when the value IS a JSON string, else NULL."""
    if v.kind == "str":
        return v.col
    if v.kind == "variant":
        c = v.vcol()
        js = F.to_json(c)
        return F.when(js.startswith('"'), F.try_variant_get(c, "$", "string"))
    raise JqCompileError(f"cannot use {v.kind} as string")


def _truthy(v: CV) -> Column:
    """jq truthiness: everything except null/false (0 and "" are true)."""
    if v.kind == "null":
        return F.lit(False)
    if v.kind == "json":
        t = F.coalesce(v.col, F.lit("null"))
        return (t != "null") & (t != "false")
    if v.kind == "bool":
        return F.coalesce(v.col, F.lit(False))
    if v.kind == "num":
        return v.d.isNotNull()
    if v.kind == "str":
        return v.col.isNotNull()
    # only JSON null / false are falsy — derive from the lexeme, NOT a
    # boolean cast (Spark would cast the number 0 to false)
    js = F.coalesce(F.to_json(v.vcol()), F.lit("null"))
    return (js != "null") & (js != "false")


def _render(v: CV) -> Column:
    """Compiled value → its compact JSON text (the processor's output)."""
    if v.kind == "null":
        return F.lit("null")
    if v.kind == "json":
        return F.coalesce(v.col, F.lit("null"))
    if v.kind == "bool":
        return F.when(v.col.isNull(), "null").when(v.col, "true").otherwise("false")
    if v.kind == "num":
        # gojq number normalization (render boundary): integral floats
        # in the exact double-int range print as integers — matches
        # normalize_numbers() in the interpreter and the variant
        # round-trip (parse_json("1.0") → to_json "1")
        integral = (v.d == F.floor(v.d)) & (F.abs(v.d) <= F.lit(2.0**53))
        return F.coalesce(
            F.when(v.isint, v.l.cast("string"))
            .when(integral, v.d.cast("long").cast("string"))
            .otherwise(v.d.cast("string")),
            F.lit("null"),
        )
    if v.kind == "str":
        # JSON-escape via to_json(struct(s)) == '{"s":<escaped>}'
        js = F.to_json(F.struct(v.col.alias("s")))
        return F.when(v.col.isNull(), "null").otherwise(
            F.substring(js, 6, F.length(js) - 6)
        )
    return F.coalesce(F.to_json(v.vcol()), F.lit("null"))


def _tostring_col(v: CV) -> Column:
    """jq `tostring` semantics as a plain string Column: strings verbatim
    (no quotes), everything else compact JSON, null → \"null\" — the
    rendering string interpolation applies to each expr part."""
    if v.kind == "str":
        return F.coalesce(v.col, F.lit("null"))
    if v.kind == "json":
        js = F.coalesce(v.col, F.lit("null"))
        return F.when(
            js.startswith('"'), F.try_variant_get(F.try_parse_json(js), "$", "string")
        ).otherwise(js)
    if v.kind == "variant":
        js = F.coalesce(F.to_json(v.vcol()), F.lit("null"))
        return F.when(
            js.startswith('"'), F.try_variant_get(v.vcol(), "$", "string")
        ).otherwise(js)
    return _render(v)


def _empty_varr() -> Column:
    """A typed empty array<variant> literal (there is no castable empty
    array literal for variant, so filter a 1-element one to nothing)."""
    return F.filter(F.array(F.try_parse_json(F.lit("null"))), lambda _: F.lit(False))


def _elements_of(vc: Column) -> Column:
    """jq ``.[]`` element stream of one variant value as array<variant>:
    arrays yield elements in document order; objects yield values in
    SORTED key order (all compiled object iteration is sorted —
    documented divergence, the interpreter preserves document order);
    null / scalars yield the empty stream (lenient — jq errors)."""
    arr = F.try_variant_get(vc, "$", "array<variant>")
    objvals = F.map_values(F.try_variant_get(vc, "$", "map<string, variant>"))
    return F.coalesce(arr, objvals, _empty_varr())


_STREAM_TAGS = ("iterate", "comma", "rangegen", "rangegen_dyn", "recurse")

# `..` compiles to a DEPTH-BOUNDED pre-order expansion: nested
# transform/flatten lambdas, one level per depth. Documents whose depth
# exceeds the bound are detected per row by ``recurse_depth_exceeded``
# and the processor routes THOSE ROWS to the interpreter (row-level
# tiering — semantics never change, the bound only decides which tier
# runs a row). 12 levels keeps the expression tree small while covering
# anything a sane pipeline document nests.
RECURSE_MAX_DEPTH = 12


def _recurse_elems(vc: Column, depth: int) -> Column:
    """jq ``..`` output stream of one variant value as array<variant>,
    depth-first pre-order (the value itself first, then descendants via
    ``_elements_of`` — arrays document order, objects sorted-key order
    like all compiled object iteration), truncated at ``depth``."""
    if depth <= 0:
        return F.array(vc)
    return F.concat(
        F.array(vc),
        F.flatten(F.transform(_elements_of(vc), lambda x: _recurse_elems(x, depth - 1))),
    )


def recurse_depth_exceeded(variant_col: Column, depth: int = RECURSE_MAX_DEPTH) -> Column:
    """True when the DOCUMENT nests deeper than ``depth`` — conservative
    per-row overflow signal for bounded ``..``: any value `..` can apply
    to is a descendant of the root, so root-depth ≤ bound guarantees
    every compiled recursion in the program is complete."""
    frontier = F.array(variant_col)
    for _ in range(depth):
        frontier = F.flatten(F.transform(frontier, _elements_of))
    return F.exists(frontier, lambda x: F.size(_elements_of(x)) > 0)


def _node_has_iterate(x) -> bool:
    """Does this AST subtree contain a bare ``iterate`` node? (``reduce``
    strips its source's iterate at parse time, so it never matches.)"""
    if isinstance(x, (tuple, list)):
        if isinstance(x, tuple) and x and x[0] == "iterate":
            return True
        return any(_node_has_iterate(c) for c in x)
    return False


def _node_has_stream(x) -> bool:
    """Any multi-output source in the subtree (generator, comma,
    range) — the stream-dispatch superset of _node_has_iterate."""
    if isinstance(x, (tuple, list)):
        if isinstance(x, tuple) and x and x[0] in _STREAM_TAGS:
            return True
        return any(_node_has_stream(c) for c in x)
    return False


def _is_stream_expr(node) -> bool:
    """Does this expression itself produce a multi-output stream at its
    top level? Collection boundaries ([...], map, reduce) absorb their
    inner streams into one value, so they are NOT streams."""
    if not isinstance(node, tuple) or not node:
        return False
    tag = node[0]
    if tag in _STREAM_TAGS:
        return True
    if tag == "pipe":
        return any(_is_stream_expr(st) for st in node[1])
    if tag == "bind":
        return _is_stream_expr(node[3])
    if tag in ("field", "index", "slice"):
        return isinstance(node[1], tuple) and _is_stream_expr(node[1])
    if tag in ("limit", "limit_dyn", "lastfn"):
        return True
    if tag == "object":
        return any(_is_stream_expr(v) for _k, v in node[1])
    if tag == "interp":
        return any(pk != "lit" and _is_stream_expr(p) for pk, p in node[1])
    if tag in ("arith", "cmp"):
        return _is_stream_expr(node[2]) or _is_stream_expr(node[3])
    return False


_NULL_ORDER = {"null": 0, "bool": 1, "num": 2, "str": 3}


def _compare(a: CV, b: CV, op: str) -> CV:
    """jq comparison with its total type order (null < bool < num < str).
    Only null/num/str/bool comparands compile; arrays/objects fall back."""

    def norm(v: CV):
        if v.kind == "variant":
            # typed views of the variant; type rank derived from the lexeme
            js = F.to_json(v.vcol())
            rank = (
                F.when(js.isNull() | (js == "null"), 0)
                .when((js == "true") | (js == "false"), 1)
                .when(js.startswith('"'), 3)
                .otherwise(2)
            )
            return rank, _variant_double(v), _as_str(v), F.try_variant_get(v.vcol(), "$", "boolean")
        if v.kind == "null":
            return F.lit(0), F.lit(None).cast("double"), F.lit(None).cast("string"), F.lit(None).cast("boolean")
        if v.kind == "bool":
            return F.when(v.col.isNull(), 0).otherwise(1), F.lit(None).cast("double"), F.lit(None).cast("string"), v.col
        if v.kind == "num":
            return F.when(v.d.isNull(), 0).otherwise(2), v.d, F.lit(None).cast("string"), F.lit(None).cast("boolean")
        if v.kind == "str":
            return F.when(v.col.isNull(), 0).otherwise(3), F.lit(None).cast("double"), v.col, F.lit(None).cast("boolean")
        raise JqCompileError(f"cannot compare {v.kind}")

    ra, da, sa, ba = norm(a)
    rb, db, sb, bb = norm(b)
    # three-way sign: rank first, then the typed payload
    sign = (
        F.when(ra < rb, -1)
        .when(ra > rb, 1)
        .when(ra == 2, F.when(da < db, -1).when(da > db, 1).otherwise(0))
        .when(ra == 3, F.when(sa < sb, -1).when(sa > sb, 1).otherwise(0))
        .when(ra == 1, F.when(ba < bb, -1).when(ba > bb, 1).otherwise(0))
        .otherwise(0)
    )
    cond = {
        "==": sign == 0, "!=": sign != 0,
        "<": sign < 0, "<=": sign <= 0, ">": sign > 0, ">=": sign >= 0,
    }[op]
    return CV("bool", col=cond)


def _str_payload(v: CV) -> Column:
    """The raw string value when the runtime value IS a JSON string,
    else NULL (no error — used inside runtime type dispatch)."""
    if v.kind == "str":
        return v.col
    if v.kind == "variant":
        c = v.vcol()
        return F.when(
            F.coalesce(F.to_json(c), F.lit("null")).startswith('"'),
            F.try_variant_get(c, "$", "string"),
        )
    if v.kind == "json":
        j = F.coalesce(v.col, F.lit("null"))
        return F.when(
            j.startswith('"'), F.try_variant_get(F.try_parse_json(j), "$", "string")
        )
    return F.lit(None).cast("string")


def _poly_add(a: CV, b: CV) -> CV:
    """jq's polymorphic ``+`` when operand types are only known at
    runtime (variant/json/null operands): null is the identity, numbers
    add (int lanes preserved), strings and arrays concatenate, objects
    merge right-biased (jq semantics) via ``map<string,variant>`` +
    ``map_concat`` — which needs ``spark.sql.mapKeyDedupPolicy=
    LAST_WIN``; ``CompiledJq.uses_merge`` tells the processor to set it.
    Mixed-type adds render null (documented leniency — the interpreter
    errors there)."""

    def safe_num(v: CV) -> CV:
        try:
            return _as_num(v)
        except JqCompileError:  # statically str/bool: never a number
            return _num(F.lit(None).cast("double"), F.lit(False))

    na, nb = safe_num(a), safe_num(b)
    num = _num(na.d + nb.d, na.isint & nb.isint, F.try_add(na.l, nb.l))
    ja, jb = _render(a), _render(b)
    ta, tb = F.substring(ja, 1, 1), F.substring(jb, 1, 1)

    def is_num(t: Column) -> Column:
        return ((t >= "0") & (t <= "9")) | (t == "-")

    s_cat = _render(CV("str", col=F.concat(_str_payload(a), _str_payload(b))))
    ia = F.substring(ja, 2, F.length(ja) - 2)
    ib = F.substring(jb, 2, F.length(jb) - 2)
    body = F.when(ia == "", ib).when(ib == "", ia).otherwise(F.concat(ia, F.lit(","), ib))
    a_cat = F.concat(F.lit("["), body, F.lit("]"))
    # object merge: right-biased shallow merge, value lexemes preserved
    # through the variant map entries (big ints, float-ness intact)
    ma = F.try_variant_get(F.try_parse_json(ja), "$", "map<string, variant>")
    mb = F.try_variant_get(F.try_parse_json(jb), "$", "map<string, variant>")
    o_merge = F.to_json(F.map_concat(ma, mb))
    out = (
        F.when(ja == "null", jb)
        .when(jb == "null", ja)
        .when(is_num(ta) & is_num(tb), _render(num))
        .when((ta == '"') & (tb == '"'), s_cat)
        .when((ta == "[") & (tb == "["), a_cat)
        .when((ta == "{") & (tb == "{"), o_merge)
        .otherwise(F.lit(None).cast("string"))
    )
    return CV("json", col=out)


def _arith(a: CV, b: CV, op: str) -> CV:
    if op == "+" and a.kind == "str" and b.kind == "str":
        return CV("str", col=F.concat(a.col, b.col))
    if op == "+" and (
        a.kind in ("variant", "json", "null") or b.kind in ("variant", "json", "null")
    ):
        return _poly_add(a, b)
    na, nb = _as_num(a), _as_num(b)
    if op in ("+", "-", "*"):
        d = {"+": na.d + nb.d, "-": na.d - nb.d, "*": na.d * nb.d}[op]
        # try_* keeps int64 overflow from hard-failing under ANSI mode;
        # an overflowed long lane renders null (documented leniency —
        # the interpreter promotes to Python bigint there)
        lng = {
            "+": F.try_add(na.l, nb.l),
            "-": F.try_subtract(na.l, nb.l),
            "*": F.try_multiply(na.l, nb.l),
        }[op]
        return _num(d, na.isint & nb.isint, lng)
    if op == "/":
        # jq/Python: true division, always float (interpreter errors on /0;
        # compiled yields null — lenient)
        return _num(F.when(nb.d != 0, na.d / nb.d), F.lit(False))
    if op == "%":
        # interpreter: int(math.fmod(int(x), int(y))) — C-truncated mod,
        # which is exactly Spark's % on longs
        lng = F.when(nb.l != 0, na.l % nb.l)
        return _num(lng.cast("double"), F.lit(True), lng)
    raise JqCompileError(f"unsupported operator {op}")


# ---------------------------------------------------------------------------
# parser (subset) → AST tuples
# ---------------------------------------------------------------------------


# jq type-filter builtins → the `type` strings they select
_TYPE_FILTER_TYPES = {
    "numbers": ("number",),
    "strings": ("string",),
    "booleans": ("boolean",),
    "nulls": ("null",),
    "objects": ("object",),
    "arrays": ("array",),
    "iterables": ("array", "object"),
    "scalars": ("null", "boolean", "number", "string"),
}


class _SubsetParser:
    """Recursive descent over the shared tokenizer; anything outside the
    compilable grammar raises JqCompileError (→ interpreter fallback)."""

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

    def _signed_int(self):
        """Optional literal [-]int at the cursor (bracket positions)."""
        neg = False
        if self.peek()[1] == "-":
            self.next()
            neg = True
        t = self.peek()
        if t[0] != "number" or "." in t[1]:
            if neg:
                raise JqCompileError("only literal slice bounds compile")
            return None
        self.next()
        return -int(t[1]) if neg else int(t[1])

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise JqCompileError(f"expected {val!r}, got {t[1]!r}")

    def parse(self):
        node = self.pipe()
        if self.peek()[0] != "eof":
            raise JqCompileError(f"trailing input {self.peek()[1]!r}")
        return node

    def pipe(self):
        first = self.comma_level()
        if self.peek()[1] == "as":
            self.next()
            vt = self.next()
            if vt[0] != "var":
                raise JqCompileError("as requires a $variable pattern")
            self.expect("|")
            return ("bind", first, vt[1][1:], self.pipe())
        stages = [first]
        while self.peek()[1] == "|":
            self.next()
            nxt = self.comma_level()
            if self.peek()[1] == "as":
                self.next()
                vt = self.next()
                if vt[0] != "var":
                    raise JqCompileError("as requires a $variable pattern")
                self.expect("|")
                stages.append(("bind", nxt, vt[1][1:], self.pipe()))
                break
            stages.append(nxt)
        return ("pipe", stages) if len(stages) > 1 else stages[0]

    def comma_level(self):
        # jq: `,` concatenates output streams and binds looser than
        # everything except `|`
        items = [self.alt()]
        while self.peek()[1] == ",":
            self.next()
            items.append(self.alt())
        return ("comma", items) if len(items) > 1 else items[0]

    def alt(self):
        node = self.or_()
        while self.peek()[1] == "//":
            self.next()
            node = ("alt", node, self.or_())
        return node

    def or_(self):
        node = self.and_()
        while self.peek()[1] in ("or",):
            self.next()
            node = ("or", node, self.and_())
        return node

    def and_(self):
        node = self.cmp()
        while self.peek()[1] in ("and",):
            self.next()
            node = ("and", node, self.cmp())
        return node

    def cmp(self):
        node = self.add()
        if self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            node = ("cmp", op, node, self.add())
        return node

    def add(self):
        node = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self.mul())
        return node

    def mul(self):
        node = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = ("arith", op, node, self.unary())
        return node

    def unary(self):
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.postfix())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            t = self.peek()
            if t[0] == "field":
                self.next()
                node = ("field", node, t[1][1:])
            elif t[1] == "[":
                self.next()
                if self.peek()[1] == "]":  # .[] iteration (reduce-source only)
                    self.next()
                    node = ("iterate", node)
                    continue
                if self.peek()[1] == ":":  # .[:n] slice
                    self.next()
                    hi = self._signed_int()
                    if hi is None or self.peek()[1] != "]":
                        raise JqCompileError("only literal slice bounds compile")
                    self.next()
                    node = ("slice", node, None, hi)
                    continue
                if self.peek()[0] == "string":
                    idx = self.next()
                    if self.peek()[1] != "]":
                        raise JqCompileError('only literal ["key"] indexing compiles')
                    self.next()
                    node = ("field", node, json.loads(idx[1]))
                    continue
                lo = self._signed_int()
                if lo is None:
                    raise JqCompileError("only literal [int] / [\"key\"] indexing compiles")
                if self.peek()[1] == ":":  # .[a:b] / .[a:]
                    self.next()
                    if self.peek()[1] == "]":
                        self.next()
                        node = ("slice", node, lo, None)
                        continue
                    hi = self._signed_int()
                    if hi is None or self.peek()[1] != "]":
                        raise JqCompileError("only literal slice bounds compile")
                    self.next()
                    node = ("slice", node, lo, hi)
                elif self.peek()[1] == "]":
                    self.next()
                    node = ("index", node, lo)
                else:
                    raise JqCompileError("only literal [int] / [\"key\"] indexing compiles")
            elif t[1] == "?":
                self.next()  # navigation is already null-safe columnar
            else:
                return node

    def primary(self):
        kind, val = self.peek()
        if kind == "field":
            self.next()
            return ("field", ("identity",), val[1:])
        if val == "..":
            self.next()
            return ("recurse",)
        if val == ".":
            self.next()
            if self.peek()[1] == "[":  # .[0] / .["k"] handled by postfix
                node = ("identity",)
                return node
            return ("identity",)
        if kind == "number":
            self.next()
            return ("lit_num", float(val), "." not in val)
        if kind == "string":
            self.next()
            parts = split_interpolated(val)
            if parts is None:
                return ("lit_str", json.loads(val))
            comp = []
            for pk, p in parts:
                comp.append(("lit", p) if pk == "lit" else ("expr", _SubsetParser(p).parse()))
            return ("interp", comp)
        if val == "(":
            self.next()
            node = self.pipe()
            self.expect(")")
            return node
        if val == "[":
            self.next()
            items = []
            if self.peek()[1] != "]":
                items.append(self.pipe())
                while self.peek()[1] == ",":
                    self.next()
                    items.append(self.pipe())
            self.expect("]")
            return ("array", items)
        if val == "{":
            self.next()
            pairs = []
            while self.peek()[1] != "}":
                kt = self.next()
                if kt[0] == "ident" or kt[0] == "field":
                    key = kt[1].lstrip(".")
                elif kt[0] == "string":
                    key = json.loads(kt[1])
                else:
                    raise JqCompileError(f"object key {kt[1]!r} not compiled")
                if self.peek()[1] == ":":
                    self.next()
                    pairs.append((key, self.alt()))
                else:  # {k} shorthand
                    pairs.append((key, ("field", ("identity",), key)))
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return ("object", pairs)
        if kind == "var":
            self.next()
            return ("var", val[1:])
        if kind == "ident":
            return self.ident_primary()
        raise JqCompileError(f"token {val!r} not in the compilable subset")

    def ident_primary(self):
        name = self.next()[1]
        if name == "true":
            return ("lit_bool", True)
        if name == "false":
            return ("lit_bool", False)
        if name == "null":
            return ("lit_null",)
        if name == "if":
            cond = self.pipe()
            self.expect("then")
            then = self.pipe()
            elifs = []
            while self.peek()[1] == "elif":
                self.next()
                c = self.pipe()
                self.expect("then")
                elifs.append((c, self.pipe()))
            orelse = ("identity",)
            if self.peek()[1] == "else":
                self.next()
                orelse = self.pipe()
            self.expect("end")
            return ("if", cond, then, elifs, orelse)
        if name == "recurse":
            if self.peek()[1] == "(":
                raise JqCompileError("recurse(f) is interpreter-only (`..`/argless recurse compile)")
            return ("recurse",)
        if name in _TYPE_FILTER_TYPES:
            # jq type filters (`numbers`, `strings`, ...) desugar to
            # select(type == "..."), streaming naturally as pipe stages
            types = _TYPE_FILTER_TYPES[name]
            cond = ("cmp", "==", ("call0", "type"), ("lit_str", types[0]))
            for t in types[1:]:
                cond = ("or", cond, ("cmp", "==", ("call0", "type"), ("lit_str", t)))
            return ("select", cond)
        if name in ("select", "map"):
            self.expect("(")
            arg = self.pipe()
            self.expect(")")
            return (name, arg)
        if name == "reduce":
            src = self.postfix()
            if src[0] != "iterate":
                raise JqCompileError("reduce compiles over .[] / .path[] sources only")
            self.expect("as")
            vt = self.next()
            if vt[0] != "var":
                raise JqCompileError("reduce requires a $variable pattern")
            self.expect("(")
            init = self.pipe()
            self.expect(";")
            update = self.pipe()
            self.expect(")")
            return ("reduce", src[1], vt[1][1:], init, update)
        if name in (
            "floor", "ceil", "tostring", "tonumber", "not", "length", "type",
            "abs", "fabs", "first", "last", "add", "min", "max",
            "ascii_downcase", "ascii_upcase", "keys", "sort", "unique", "reverse",
            "to_entries", "from_entries",
        ) and not (name in ("first", "last") and self.peek()[1] == "("):
            return ("call0", name)
        if name == "range":
            # literal-int range(n) / range(lo;hi) / range(lo;hi;step)
            # compiles to a CONSTANT stream; dynamic-argument forms
            # compile to an F.sequence-built stream (both only in
            # stream positions)
            self.expect("(")
            save = self.i
            try:
                vals = []
                while True:
                    neg = False
                    if self.peek()[1] == "-":
                        self.next()
                        neg = True
                    t = self.next()
                    if t[0] != "number" or "." in t[1]:
                        raise JqCompileError("range() literal fast path")
                    vals.append(-int(t[1]) if neg else int(t[1]))
                    if self.peek()[1] == ";":
                        self.next()
                        continue
                    break
                self.expect(")")
                if len(vals) == 1:
                    lo, hi, step = 0, vals[0], 1
                elif len(vals) == 2:
                    lo, hi, step = vals[0], vals[1], 1
                elif len(vals) == 3:
                    lo, hi, step = vals
                else:
                    raise JqCompileError("range() takes 1-3 args")
                if step == 0:
                    raise JqCompileError("range() step must be nonzero")
                return ("rangegen", lo, hi, step)
            except JqCompileError:
                self.i = save
            args = [self.pipe()]
            while self.peek()[1] == ";":
                self.next()
                args.append(self.pipe())
            self.expect(")")
            if len(args) > 3:
                raise JqCompileError("range() takes 1-3 args")
            return ("rangegen_dyn", args)
        if name in ("limit", "first", "last") and self.peek()[1] == "(":
            # stream forms: limit(n; f), first(f) ≡ limit(1; f),
            # last(f). (Bare first/last remain call0 array builtins.)
            self.next()
            if name == "limit":
                if self.peek()[0] == "number" and "." not in self.peek()[1] and self.peek(1)[1] == ";":
                    nt = self.next()
                    self.expect(";")
                    body = self.pipe()
                    self.expect(")")
                    return ("limit", int(nt[1]), body)
                # dynamic count expression (evaluated against `.`)
                cnt = self.pipe()
                self.expect(";")
                body = self.pipe()
                self.expect(")")
                return ("limit_dyn", cnt, body)
            body = self.pipe()
            self.expect(")")
            return ("limit", 1, body) if name == "first" else ("lastfn", body)
        if name == "with_entries":
            # with_entries(f) ≡ to_entries | map(f) | from_entries
            self.expect("(")
            f = self.pipe()
            self.expect(")")
            return (
                "pipe",
                [("call0", "to_entries"), ("map", f), ("call0", "from_entries")],
            )
        if name == "has":
            self.expect("(")
            if self.peek()[0] == "string":
                kt = self.next()
                if split_interpolated(kt[1]) is None:
                    self.expect(")")
                    return ("has", json.loads(kt[1]))
                raise JqCompileError("has() with interpolation not compiled")
            arg = self.pipe()
            self.expect(")")
            return ("has_dyn", arg)
        if name in ("ltrimstr", "rtrimstr", "startswith", "endswith", "split", "join", "test"):
            self.expect("(")
            if self.peek()[0] == "string" and split_interpolated(self.peek()[1]) is None:
                kt = self.next()
                self.expect(")")
                return ("call1s", name, json.loads(kt[1]))
            # dynamic argument (an expression over `.`, $vars, or an
            # interpolated string) — compiled per-row
            arg = self.pipe()
            self.expect(")")
            return ("call1d", name, arg)
        raise JqCompileError(f"function {name!r} not compiled")


# ---------------------------------------------------------------------------
# AST → (keep predicate, CV)
# ---------------------------------------------------------------------------


def _string_view(cv: CV) -> Column:
    """Column of the value AS a string, SQL-null when it isn't a JSON
    string (jq would error; we're documented-lenient)."""
    if cv.kind == "str":
        return cv.col
    if cv.kind == "variant":
        c = cv.vcol()
        js = F.coalesce(F.to_json(c), F.lit("null"))
        return F.when(js.startswith('"'), F.try_variant_get(c, "$", "string"))
    return F.lit(None).cast("string")


def _json_quote(col: Column) -> Column:
    """String column → its compact-JSON string literal (escaped)."""
    return F.regexp_extract(
        F.to_json(F.struct(col.alias("s"))), r'^\{"s":(.*)\}$', 1
    )


# lexical $variable scope during compilation (single-threaded per
# program; lambdas capture the bound Columns eagerly)
_ENV: list[dict] = []


def _lookup_var(name: str) -> CV:
    for frame in reversed(_ENV):
        if name in frame:
            return frame[name]
    raise JqCompileError(f"${name} is not defined (metadata vars not compiled)")


def _compile(node, cur: CV, keep: Optional[Column]):
    """Returns (keep, CV). `select` stages narrow keep; everything else
    maps the current value."""
    tag = node[0]
    if tag == "identity":
        return keep, cur
    if tag == "var":
        return keep, _lookup_var(node[1])
    if tag == "bind":
        keep, bound = _compile(node[1], cur, keep)
        _ENV.append({node[2]: bound})
        try:
            return _compile(node[3], cur, keep)
        finally:
            _ENV.pop()
    if tag == "iterate":
        raise JqCompileError("bare .[] generators compile only in pipe stages / array items")
    if tag == "has_dyn":
        # has(EXPR): object → string-key membership, array → int index
        # in range (the interpreter's exact rule); type mismatches
        # yield null (lenient — jq errors)
        if cur.kind == "json":
            cur = CV.variant(F.try_parse_json(cur.col))
        if cur.kind != "variant":
            raise JqCompileError("has() over non-variant")
        _, kv = _compile(node[1], cur, None)
        js = F.coalesce(F.to_json(cur.vcol()), F.lit("null"))
        ks = None
        if kv.kind == "str":
            ks = kv.col
        elif kv.kind == "variant":
            kjs = F.coalesce(F.to_json(kv.vcol()), F.lit("null"))
            ks = F.when(kjs.startswith('"'), F.try_variant_get(kv.vcol(), "$", "string"))
        # null/non-string keys on objects: the interpreter's `k in dict`
        # yields False (jq proper errors) — match the truth bar
        obj_case = (
            F.coalesce(F.array_contains(F.json_object_keys(js), ks), F.lit(False))
            if ks is not None
            else F.lit(False)
        )
        arr = F.try_variant_get(cur.vcol(), "$", "array<variant>")
        try:
            n = _as_num(kv)
            arr_case = n.l.isNotNull() & (n.l >= 0) & (n.l < F.size(arr))
        except JqCompileError:
            arr_case = F.lit(None).cast("boolean")
        out = (
            F.when(js.startswith("{"), obj_case)
            .when(js.startswith("["), arr_case)
            .otherwise(F.lit(None).cast("boolean"))
        )
        return keep, CV("bool", col=out)
    if tag == "comma":
        raise JqCompileError("`,` stream concatenation compiles only in stream positions")
    if tag == "reduce":
        # fold over an array with the accumulator carried as compact
        # JSON: each step re-parses with try_parse_json, runs the
        # compiled update (where `.` = acc, $x = the element), and
        # re-renders — int-ness survives via the lexeme. Stays fully
        # JVM-side (higher-order F.aggregate), no Python.
        _, base = _compile(node[1], cur, None)
        if base.kind != "variant":
            raise JqCompileError("reduce source must be a variant array")
        arr = F.try_variant_get(base.vcol(), "$", "array<variant>")
        _, init = _compile(node[3], cur, None)
        update_node = node[4]
        var_name = node[2]

        def step(acc, x):
            _ENV.append({var_name: CV.variant(x)})
            try:
                _, out = _compile(
                    update_node, CV.variant(F.try_parse_json(acc)), None
                )
            finally:
                _ENV.pop()
            return _render(out)

        folded = F.aggregate(arr, _render(init), step)
        # null / non-array source iterates to nothing → the init value
        # survives untouched (matches the interpreter's silent-empty
        # iteration; jq proper errors — documented leniency)
        return keep, CV("json", col=F.when(arr.isNotNull(), folded).otherwise(_render(init)))
    if tag == "slice":
        _, base = _compile(node[1], cur, None)
        a, b = node[2], node[3]

        def _bounds(n):
            # python slice-bound semantics (jq's .[a:b]): negatives
            # count from the end, everything clamps into [0, n]
            def clamp(bound, default):
                if bound is None:
                    return default
                if bound >= 0:
                    return F.least(F.lit(bound), n)
                return F.greatest(n + F.lit(bound), F.lit(0))

            lo = clamp(a, F.lit(0))
            hi = clamp(b, n)
            return lo, F.greatest(hi - lo, F.lit(0))

        if base.kind == "str":
            lo, ln = _bounds(F.length(base.col))
            return keep, CV("str", col=F.substring(base.col, lo + 1, ln))
        if base.kind != "variant":
            raise JqCompileError(f"cannot slice {base.kind}")
        c = base.vcol()
        js = F.coalesce(F.to_json(c), F.lit("null"))
        arr = F.try_variant_get(c, "$", "array<variant>")
        alo, aln = _bounds(F.size(arr))
        sliced = F.slice(arr, alo + 1, aln)
        arr_js = F.concat(
            F.lit("["),
            F.array_join(F.transform(sliced, lambda x: _render(CV.variant(x))), ","),
            F.lit("]"),
        )
        s = F.try_variant_get(c, "$", "string")
        slo, sln = _bounds(F.length(s))
        str_js = F.to_json(F.struct(F.substring(s, slo + 1, sln).alias("s")))
        str_js = F.regexp_extract(str_js, r'^\{"s":(.*)\}$', 1)
        out = (
            F.when(js.startswith("["), arr_js)
            .when(js.startswith('"'), str_js)
            .otherwise(F.lit(None).cast("string"))
        )
        return keep, CV("json", col=out)
    if tag == "pipe":
        for stage in node[1]:
            keep, cur = _compile(stage, cur, keep)
        return keep, cur
    if tag == "select":
        _, cond = _compile(node[1], cur, None)
        c = _truthy(cond)
        return (c if keep is None else (keep & c)), cur
    if tag == "field":
        keep, base = _compile(node[1], cur, keep)
        name = node[2]
        if base.kind != "variant":
            raise JqCompileError(f"cannot index {base.kind}")
        if _IDENT_PATH.match(name):
            seg = "." + name
        else:
            esc = name.replace("\\", "\\\\").replace('"', '\\"')
            seg = f'["{esc}"]'
        if base.col is not None:
            return keep, CV.variant(base.col, "$" + seg)
        return keep, CV.variant(base.base, base.path + seg)
    if tag == "index":
        keep, base = _compile(node[1], cur, keep)
        if base.kind != "variant":
            raise JqCompileError(f"cannot index {base.kind}")
        if node[2] < 0:
            # negative index counts from the end — no variant-path form,
            # so go through the array cast (F.get is 0-based, null-safe)
            arr = F.try_variant_get(base.vcol(), "$", "array<variant>")
            return keep, CV.variant(F.get(arr, F.size(arr) + F.lit(node[2])))
        seg = f"[{node[2]}]"
        if base.col is not None:
            return keep, CV.variant(base.col, "$" + seg)
        return keep, CV.variant(base.base, base.path + seg)
    if tag == "lit_num":
        return keep, _num(F.lit(node[1]), F.lit(node[2]), F.lit(int(node[1])))
    if tag == "lit_str":
        return keep, CV("str", col=F.lit(node[1]))
    if tag == "interp":
        # single-output interpolation: concat of literal chunks and
        # tostring-rendered expr parts (generator parts never reach here —
        # `,` is outside this parser's grammar, so they fall back)
        cols = []
        for pk, p in node[1]:
            if pk == "lit":
                cols.append(F.lit(p))
            else:
                _, v = _compile(p, cur, None)
                cols.append(_tostring_col(v))
        return keep, CV("str", col=F.concat(*cols) if cols else F.lit(""))
    if tag == "lit_bool":
        return keep, CV("bool", col=F.lit(node[1]))
    if tag == "lit_null":
        return keep, CV("null")
    if tag == "neg":
        _, v = _compile(node[1], cur, None)
        n = _as_num(v)
        return keep, _num(-n.d, n.isint, -n.l)
    if tag == "arith":
        _, a = _compile(node[2], cur, None)
        _, b = _compile(node[3], cur, None)
        return keep, _arith(a, b, node[1])
    if tag == "cmp":
        _, a = _compile(node[2], cur, None)
        _, b = _compile(node[3], cur, None)
        return keep, _compare(a, b, node[1])
    if tag == "and":
        _, a = _compile(node[1], cur, None)
        _, b = _compile(node[2], cur, None)
        return keep, CV("bool", col=_truthy(a) & _truthy(b))
    if tag == "or":
        _, a = _compile(node[1], cur, None)
        _, b = _compile(node[2], cur, None)
        return keep, CV("bool", col=_truthy(a) | _truthy(b))
    if tag == "alt":
        _, a = _compile(node[1], cur, None)
        _, b = _compile(node[2], cur, None)
        return keep, CV("json", col=F.when(_truthy(a), _render(a)).otherwise(_render(b)))
    if tag == "if":
        _, c = _compile(node[1], cur, None)
        _, t = _compile(node[2], cur, None)
        expr = F.when(_truthy(c), _render(t))
        for ec, et in node[3]:
            _, cc = _compile(ec, cur, None)
            _, tt = _compile(et, cur, None)
            expr = expr.when(_truthy(cc), _render(tt))
        _, e = _compile(node[4], cur, None)
        return keep, CV("json", col=expr.otherwise(_render(e)))
    if tag == "array":
        # [...] collects each item's OUTPUT STREAM (0..n values per
        # item): a bare generator contributes its elements, a select()
        # that fails contributes nothing — per-item string arrays are
        # concatenated then joined so commas land only between values
        item_arrs = []
        for item in node[1]:
            k2, cv2, elems = _stream_eval(item, cur, None)
            if elems is not None:
                arr_s = F.transform(elems, lambda e: _render(CV.variant(e)))
            else:
                arr_s = F.array(_render(cv2))
            if k2 is not None:
                arr_s = F.when(F.coalesce(k2, F.lit(False)), arr_s).otherwise(
                    F.array().cast("array<string>")
                )
            item_arrs.append(arr_s)
        if not item_arrs:
            return keep, CV("json", col=F.lit("[]"))
        all_outs = F.concat(*item_arrs) if len(item_arrs) > 1 else item_arrs[0]
        return keep, CV(
            "json",
            col=F.concat(F.lit("["), F.array_join(all_outs, ","), F.lit("]")),
        )
    if tag == "object":
        parts = [F.lit("{")]
        for i, (key, vnode) in enumerate(node[1]):
            if i:
                parts.append(F.lit(","))
            parts.append(F.lit(json.dumps(key, ensure_ascii=False) + ":"))
            _, v = _compile(vnode, cur, None)
            parts.append(_render(v))
        parts.append(F.lit("}"))
        return keep, CV("json", col=F.concat(*parts))
    if tag == "map":
        if cur.kind == "json":
            # rendered intermediate (to_entries/sort/… output) re-enters
            # the variant lane
            cur = CV.variant(F.try_parse_json(cur.col))
        if cur.kind != "variant":
            raise JqCompileError("map over non-variant")
        # map(f) ≡ [.[] | f] — the stream machinery gives element-level
        # select() filtering and nested-generator flattening for free;
        # the null-guard keeps the documented leniency (map over
        # null / non-array → JSON null, not an error)
        arr = F.try_variant_get(cur.vcol(), "$", "array<variant>")
        desugared = ("array", [("pipe", [("iterate", ("identity",)), node[1]])])
        keep, out = _compile(desugared, cur, keep)
        return keep, CV("json", col=F.when(arr.isNotNull(), out.col))
    if tag == "call0":
        name = node[1]
        if cur.kind == "json" and name in (
            "first", "last", "add", "min", "max", "keys", "sort", "unique",
            "reverse", "length", "type", "tostring", "tonumber",
            "to_entries", "from_entries",
        ):
            # rendered intermediates (sort/unique/map/if outputs) re-enter
            # the variant lane so builtin chains stay columnar
            cur = CV.variant(F.try_parse_json(cur.col))
        if name == "to_entries":
            # object → [{key, value}…] in sorted-key order (compiled
            # object iteration is sorted — documented divergence)
            if cur.kind != "variant":
                raise JqCompileError("to_entries over non-variant")
            m = F.try_variant_get(cur.vcol(), "$", "map<string, variant>")
            ents = F.transform(
                F.map_entries(m),
                lambda e: F.concat(
                    F.lit('{"key":'),
                    _json_quote(e["key"]),
                    F.lit(',"value":'),
                    F.coalesce(F.to_json(e["value"]), F.lit("null")),
                    F.lit("}"),
                ),
            )
            rendered = F.concat(F.lit("["), F.array_join(ents, ","), F.lit("]"))
            return keep, CV("json", col=F.when(m.isNotNull(), rendered))
        if name == "from_entries":
            # [{key|k|name, value|v}…] → object; duplicate keys keep the
            # LAST occurrence once re-parsed (JSON text carries both;
            # every consumer — jq included — resolves to the last)
            if cur.kind != "variant":
                raise JqCompileError("from_entries over non-variant")
            arr = F.try_variant_get(cur.vcol(), "$", "array<variant>")

            def ent(e):
                kvar = F.coalesce(
                    F.try_variant_get(e, "$.key", "variant"),
                    F.try_variant_get(e, "$.k", "variant"),
                    F.try_variant_get(e, "$.name", "variant"),
                )
                vjson = F.coalesce(
                    F.to_json(F.try_variant_get(e, "$.value", "variant")),
                    F.to_json(F.try_variant_get(e, "$.v", "variant")),
                    F.lit("null"),
                )
                return F.concat(
                    _json_quote(_tostring_col(CV.variant(kvar))), F.lit(":"), vjson
                )

            rendered = F.concat(
                F.lit("{"), F.array_join(F.transform(arr, ent), ","), F.lit("}")
            )
            return keep, CV("json", col=F.when(arr.isNotNull(), rendered))
        if name in ("floor", "ceil"):
            n = _as_num(cur)
            fn = F.floor if name == "floor" else F.ceil
            # already-int inputs keep the exact long lane
            lng = F.when(n.isint, n.l).otherwise(fn(n.d).cast("long"))
            return keep, _num(F.when(n.isint, n.d).otherwise(fn(n.d).cast("double")), F.lit(True), lng)
        if name == "tostring":
            if cur.kind == "str":
                return keep, cur
            if cur.kind == "variant":
                js = F.to_json(cur.vcol())
                s = F.when(js.startswith('"'), F.try_variant_get(cur.vcol(), "$", "string")).otherwise(js)
                return keep, CV("str", col=s)
            return keep, CV("str", col=_render(cur))
        if name == "tonumber":
            if cur.kind == "num":
                return keep, cur
            if cur.kind == "str":
                return keep, _num(cur.col.try_cast("double"), cur.col.rlike(_INT_LEXEME), cur.col.try_cast("bigint"))
            n = _as_num(cur)
            return keep, n
        if name == "not":
            return keep, CV("bool", col=~_truthy(cur))
        if name == "type":
            if cur.kind != "variant":
                kindmap = {"num": "number", "str": "string", "bool": "boolean", "null": "null"}
                if cur.kind in kindmap:
                    return keep, CV("str", col=F.lit(kindmap[cur.kind]))
                raise JqCompileError("type over rendered value")
            js = F.coalesce(F.to_json(cur.vcol()), F.lit("null"))
            t = (
                F.when(js == "null", "null")
                .when((js == "true") | (js == "false"), "boolean")
                .when(js.startswith('"'), "string")
                .when(js.startswith("["), "array")
                .when(js.startswith("{"), "object")
                .otherwise("number")
            )
            return keep, CV("str", col=t)
        if name == "length":
            # jq: strings/arrays/objects -> size, null -> 0, number -> abs
            if cur.kind == "num":
                return keep, _num(F.abs(cur.d), cur.isint, F.abs(cur.l))
            if cur.kind == "str":
                return keep, _num(F.length(cur.col).cast("double"), F.lit(True),
                                  F.length(cur.col).cast("long"))
            if cur.kind == "null":
                return keep, _num(F.lit(0.0), F.lit(True), F.lit(0))
            if cur.kind != "variant":
                raise JqCompileError("length over rendered value")
            c = cur.vcol()
            js = F.coalesce(F.to_json(c), F.lit("null"))
            n = (
                F.when(js == "null", F.lit(0).cast("long"))
                .when(js.startswith('"'), F.length(F.try_variant_get(c, "$", "string")).cast("long"))
                .when(js.startswith("["), F.array_size(F.try_variant_get(c, "$", "array<variant>")).cast("long"))
                .when(js.startswith("{"), F.size(F.map_keys(F.try_variant_get(c, "$", "map<string,variant>"))).cast("long"))
                .when((js == "true") | (js == "false"), F.lit(None).cast("long"))  # jq errors; lenient null
                .otherwise(F.abs(F.try_variant_get(c, "$", "bigint")))
            )
            isint = ~(js.rlike(r"^-?[0-9]*\.")) | js.startswith("[")
            d = (
                F.when(js.rlike(r"^-?[0-9.eE+]+$") & ~js.rlike(_INT_LEXEME),
                       F.abs(_variant_double(cur)))
                .otherwise(n.cast("double"))
            )
            return keep, _num(d, isint, F.coalesce(n, d.cast("long")))
        if name in ("ascii_downcase", "ascii_upcase"):
            s = _string_view(cur)
            fn = F.lower if name == "ascii_downcase" else F.upper
            return keep, CV("str", col=fn(s))
        if name in ("abs", "fabs"):
            # both int-preserving: jq has one number type and prints
            # integral doubles without a fraction; the interpreter's
            # Python abs() keeps ints too
            n = _as_num(cur)
            return keep, _num(F.abs(n.d), n.isint, F.abs(n.l))
        if name in ("first", "last"):
            if cur.kind != "variant":
                raise JqCompileError(f"{name} over non-variant")
            arr = F.try_variant_get(cur.vcol(), "$", "array<variant>")
            elem = F.try_element_at(arr, F.lit(1 if name == "first" else -1))
            return keep, CV.variant(elem)
        if name in ("add", "min", "max"):
            if cur.kind != "variant":
                raise JqCompileError(f"{name} over non-variant")
            c = cur.vcol()
            arr_v = F.try_variant_get(c, "$", "array<variant>")
            lex = F.transform(arr_v, lambda x: F.coalesce(F.to_json(x), F.lit("null")))
            all_num = F.forall(lex, lambda s: s.rlike(r"^-?[0-9.eE+\-]+$"))
            all_int = F.forall(lex, lambda s: s.rlike(_INT_LEXEME))
            all_str = F.forall(lex, lambda s: s.startswith('"'))
            arr_d = F.try_variant_get(c, "$", "array<double>")
            arr_l = F.try_variant_get(c, "$", "array<bigint>")
            arr_s = F.try_variant_get(c, "$", "array<string>")
            empty = F.size(arr_v) == 0
            if name == "add":
                d = F.aggregate(arr_d, F.lit(0.0), lambda a, x: a + x)
                ln = F.aggregate(arr_l, F.lit(0).cast("long"), lambda a, x: a + x)
                s = F.aggregate(arr_s, F.lit(""), lambda a, x: F.concat(a, x))
            else:
                fn = F.array_min if name == "min" else F.array_max
                d, ln, s = fn(arr_d), fn(arr_l), fn(arr_s)
            ok_num = arr_v.isNotNull() & ~empty & all_num
            ok_str = arr_v.isNotNull() & ~empty & all_str
            if name == "add":
                res_isint = all_int
            else:
                # min/max return an ELEMENT: int-ness comes from the
                # winning element's lexeme, not the whole array (the
                # max of [10, 2.25] is the int 10)
                pairs = F.zip_with(
                    arr_d, lex, lambda dv, s_: F.struct(dv.alias("d"), s_.alias("s"))
                )
                res_isint = F.exists(
                    pairs, lambda p: (p["d"] == d) & p["s"].rlike(_INT_LEXEME)
                )
                # exact long lane only holds for all-int arrays (mixed
                # arrays fail the array<bigint> cast); fall back to the
                # double-derived long for mixed winners
                ln = F.when(all_int, ln).otherwise(d.cast("long"))
            # numeric and all-string arrays; [] -> null like jq; mixed/
            # object element types -> null (documented lenient divergence)
            num_cv = _num(F.when(ok_num, d), F.when(ok_num, res_isint), F.when(ok_num, ln))
            out = (
                F.when(ok_num, _render(num_cv))
                .when(ok_str, _json_quote(s))
                .otherwise(F.lit(None).cast("string"))
            )
            return keep, CV("json", col=out)
        if name == "keys":
            # jq keys is SORTED (unlike jmespath) — matches the variant
            # renderer's key order exactly, so both tiers agree
            if cur.kind != "variant":
                raise JqCompileError("keys over non-variant")
            js = F.coalesce(F.to_json(cur.vcol()), F.lit("null"))
            ks = F.array_sort(F.json_object_keys(js))
            out = F.concat(
                F.lit("["), F.array_join(F.transform(ks, _json_quote), ","), F.lit("]")
            )
            return keep, CV("json", col=F.when(js.startswith("{"), out))
        if name == "reverse":
            if cur.kind == "str":
                return keep, CV("str", col=F.reverse(cur.col))
            if cur.kind != "variant":
                raise JqCompileError("reverse over non-variant")
            c = cur.vcol()
            js = F.coalesce(F.to_json(c), F.lit("null"))
            arr = F.try_variant_get(c, "$", "array<variant>")
            arr_js = F.concat(
                F.lit("["),
                F.array_join(
                    F.reverse(F.transform(arr, lambda x: _render(CV.variant(x)))), ","
                ),
                F.lit("]"),
            )
            s = F.try_variant_get(c, "$", "string")
            return keep, CV(
                "json",
                col=F.when(js.startswith("["), arr_js).when(
                    js.startswith('"'), _json_quote(F.reverse(s))
                ),
            )
        if name in ("sort", "unique"):
            # jq sorts the result for BOTH; compile for all-number or
            # all-string arrays (mixed types need jq's total order —
            # interpreter fallback). The sort permutes the ORIGINAL
            # LEXEMES with a value comparator, so big ints past 2^53
            # keep their exact digits and 6 vs 6.0 render unchanged.
            if cur.kind != "variant":
                raise JqCompileError(f"{name} over non-variant")
            c = cur.vcol()
            arr_v = F.try_variant_get(c, "$", "array<variant>")
            lex = F.transform(arr_v, lambda x: F.coalesce(F.to_json(x), F.lit("null")))
            all_num = F.forall(lex, lambda s_: s_.rlike(r"^-?[0-9.eE+\-]+$"))
            all_str = F.forall(lex, lambda s_: s_.startswith('"'))

            def cmp(x, y):
                xd, yd = x.try_cast("double"), y.try_cast("double")
                num_cmp = F.when(xd < yd, -1).when(xd > yd, 1).otherwise(0)
                # quoted lexemes order like their contents for
                # escape-free strings; numeric lexemes use value order
                return F.when(
                    xd.isNotNull() & yd.isNotNull(), num_cmp
                ).otherwise(F.when(x < y, -1).when(x > y, 1).otherwise(0))

            sorted_lex = F.array_sort(lex, cmp)
            if name == "unique":
                # drop adjacent value-duplicates post-sort (1 and 1.0
                # are the same jq value even with distinct lexemes)
                def keep_first(x, i):
                    prev = F.element_at(sorted_lex, i)  # 1-based = previous
                    xd, pd_ = x.try_cast("double"), prev.try_cast("double")
                    same = F.when(
                        xd.isNotNull() & pd_.isNotNull(), xd == pd_
                    ).otherwise(x == prev)
                    return (i == 0) | ~same

                sorted_lex = F.filter(sorted_lex, keep_first)
            body = F.concat(
                F.lit("["), F.array_join(sorted_lex, ","), F.lit("]")
            )
            empty_arr = F.size(arr_v) == 0
            out = (
                F.when(arr_v.isNotNull() & empty_arr, F.lit("[]"))
                .when(arr_v.isNotNull() & (all_num | all_str), body)
                .otherwise(F.lit(None).cast("string"))
            )
            return keep, CV("json", col=out)
        raise JqCompileError(f"builtin {name!r} not compiled")
    if tag == "call1s":
        name, arg = node[1], node[2]
        if name in ("ascii_downcase", "ascii_upcase"):
            raise JqCompileError("case functions take no args")
        s = _string_view(cur)
        if name in ("startswith", "endswith"):
            fn = (lambda c: c.startswith(arg)) if name == "startswith" else (
                lambda c: c.endswith(arg)
            )
            return keep, CV("bool", col=F.when(s.isNotNull(), fn(s)))
        if name == "test":
            # Java regex vs the interpreter's Python `re` — see module
            # docstring for the documented divergence surface
            return keep, CV("bool", col=F.when(s.isNotNull(), s.rlike(arg)))
        if name == "ltrimstr" or name == "rtrimstr":
            if name == "ltrimstr":
                stripped = F.when(
                    s.startswith(arg), F.substring(s, len(arg) + 1, F.length(s))
                ).otherwise(s)
            else:
                stripped = F.when(
                    s.endswith(arg),
                    F.substring(s, 1, F.length(s) - len(arg)),
                ).otherwise(s)
            # jq: non-string input passes through UNCHANGED
            passthrough = _render(cur)
            out = F.when(s.isNotNull(), _json_quote(stripped)).otherwise(passthrough)
            return keep, CV("json", col=out)
        if name == "split":
            quoted = "\\Q" + arg.replace("\\E", "\\E\\\\E\\Q") + "\\E"
            parts = F.split(s, quoted, -1)
            return keep, CV(
                "json", col=F.when(s.isNotNull(), F.to_json(parts))
            )
        if name == "join":
            if cur.kind != "variant":
                raise JqCompileError("join over non-variant")
            arr = F.try_variant_get(cur.vcol(), "$", "array<variant>")

            def render_elem(x):
                js = F.coalesce(F.to_json(x), F.lit("null"))
                return (
                    F.when(js == "null", F.lit(""))
                    .when(js.startswith('"'), F.try_variant_get(x, "$", "string"))
                    .otherwise(js)
                )

            joined = F.array_join(F.transform(arr, render_elem), arg)
            return keep, CV("str", col=F.when(arr.isNotNull(), joined))
        raise JqCompileError(f"string function {name!r} not compiled")
    if tag == "call1d":
        # dynamic-argument string functions: the arg is an expression
        # over `.` / $vars (reference embeds gojq which evaluates args
        # per input, internal/impl/pure/processor_jq.go:26); a
        # non-string runtime arg yields null/passthrough (lenient — jq
        # errors there)
        name, argnode = node[1], node[2]
        _, acv = _compile(argnode, cur, None)
        sa = _str_payload(acv)
        if name == "join":
            if cur.kind != "variant":
                raise JqCompileError("join over non-variant")
            arr = F.try_variant_get(cur.vcol(), "$", "array<variant>")

            def render_elem(x):
                js = F.coalesce(F.to_json(x), F.lit("null"))
                return (
                    F.when(js == "null", F.lit(""))
                    .when(js.startswith('"'), F.try_variant_get(x, "$", "string"))
                    .otherwise(js)
                )

            rendered = F.transform(arr, render_elem)
            nonfirst = F.slice(
                rendered, F.lit(2), F.greatest(F.size(rendered) - 1, F.lit(0))
            )
            joined = F.when(F.size(rendered) == 0, F.lit("")).otherwise(
                F.aggregate(
                    nonfirst,
                    F.element_at(rendered, 1),
                    lambda acc, x: F.concat(acc, sa, x),
                )
            )
            return keep, CV(
                "str", col=F.when(arr.isNotNull() & sa.isNotNull(), joined)
            )
        s = _string_view(cur)
        if name in ("startswith", "endswith"):
            fn = s.startswith(sa) if name == "startswith" else s.endswith(sa)
            return keep, CV("bool", col=F.when(s.isNotNull() & sa.isNotNull(), fn))
        if name == "test":
            return keep, CV(
                "bool", col=F.when(s.isNotNull() & sa.isNotNull(), F.regexp_like(s, sa))
            )
        if name in ("ltrimstr", "rtrimstr"):
            if name == "ltrimstr":
                stripped = F.when(
                    s.startswith(sa), F.substring(s, F.length(sa) + 1, F.length(s))
                ).otherwise(s)
            else:
                stripped = F.when(
                    s.endswith(sa), F.substring(s, F.lit(1), F.length(s) - F.length(sa))
                ).otherwise(s)
            # jq: non-string input (or arg) passes through unchanged
            passthrough = _render(cur)
            out = F.when(
                s.isNotNull() & sa.isNotNull(), _json_quote(stripped)
            ).otherwise(passthrough)
            return keep, CV("json", col=out)
        if name == "split":
            # literal (non-regex) split, like jq's 1-arg split: quote
            # the dynamic delimiter with \Q..\E (embedded \E re-escaped)
            quoted = F.concat(
                F.lit("\\Q"),
                F.replace(sa, F.lit("\\E"), F.lit("\\E\\\\E\\Q")),
                F.lit("\\E"),
            )
            parts = F.split(s, quoted, F.lit(-1))
            return keep, CV(
                "json",
                col=F.when(s.isNotNull() & sa.isNotNull(), F.to_json(parts)),
            )
        raise JqCompileError(f"string function {name!r} not compiled")
    if tag == "has":
        if cur.kind != "variant":
            raise JqCompileError("has over non-variant")
        c = cur.vcol()
        name = node[1]
        if _IDENT_PATH.match(name):
            seg = "$." + name
        else:
            esc = name.replace("\\", "\\\\").replace('"', '\\"')
            seg = '$["' + esc + '"]'
        # missing key -> SQL NULL; key-with-JSON-null -> variant null
        # (NOT SQL null) -> has = true, matching jq
        present = F.try_variant_get(c, seg, "variant").isNotNull()
        return keep, CV("bool", col=present)
    raise JqCompileError(f"node {tag!r} not compiled")


def _to_variant(v: CV) -> Column:
    """Any compiled value as a variant Column (render→re-parse keeps the
    number lexeme, so int-ness survives the round-trip)."""
    if v.kind == "variant":
        return v.vcol()
    return F.try_parse_json(_render(v))


def _stream_eval(node, cur: CV, keep: Optional[Column]):
    """Compile an expression that may produce a multi-output stream
    (bare ``.[]`` generators as pipe stages or inside postfix chains).
    Returns ``(keep, cv, elems)`` — exactly one of cv/elems is set;
    ``elems`` is a Column of array<variant> holding the output stream
    in order. jq's stream semantics at the program level: 0 outputs
    filter the message, 1 output is the value, n outputs become an
    array (processor_jq.go:26 — gojq result collection)."""
    tag = node[0]
    if tag == "pipe":
        elems = None
        for st in node[1]:
            if elems is None:
                keep, cv, elems = _stream_eval(st, cur, keep)
                if elems is None:
                    cur = cv
                continue
            # NB: single-arg closures via factories — a second default
            # parameter would make PySpark's HOF arity sniffing pass the
            # element INDEX into it
            if st[0] == "select":
                elems = F.filter(elems, _el_keep_fn(st))
            elif _is_stream_expr(st):
                elems = F.flatten(F.transform(elems, _el_stream_fn(st)))
            else:
                # a parenthesized sub-pipe may bury a select() — filter
                # on the stage's keep before mapping
                if _node_has_select(st):
                    elems = F.filter(elems, _el_keep_fn(st))
                elems = F.transform(elems, _el_map_fn(st))
        return keep, (cur if elems is None else None), elems
    if tag == "bind":
        keep, bound = _compile(node[1], cur, keep)
        _ENV.append({node[2]: bound})
        try:
            return _stream_eval(node[3], cur, keep)
        finally:
            _ENV.pop()
    if tag == "iterate":
        keep, cv, elems = _stream_eval(node[1], cur, keep)
        if elems is None:
            return keep, None, _elements_of(_to_variant(cv))
        # nested generator: flatten (elements_of never yields null)
        return keep, None, F.flatten(F.transform(elems, _elements_of))
    if tag == "recurse":
        # `..`: bounded pre-order expansion of the current value (rows
        # deeper than RECURSE_MAX_DEPTH are routed to the interpreter by
        # the processor via recurse_depth_exceeded — never truncated)
        return keep, None, _recurse_elems(_to_variant(cur), RECURSE_MAX_DEPTH)
    if tag == "rangegen":
        # literal bounds → the values are known at compile time; emit a
        # constant variant array (jq: half-open, step-signed)
        lo, hi, step = node[1], node[2], node[3]
        vals = list(range(lo, hi, step))
        if not vals:
            return keep, None, _empty_varr()
        return keep, None, F.array(
            *[F.try_parse_json(F.lit(str(v))) for v in vals]
        )
    if tag == "comma":
        # `,` concatenates the items' output streams in order
        arrs = []
        for item in node[1]:
            k2, cv2, el2 = _stream_eval(item, cur, None)
            if el2 is None:
                el2 = F.array(_to_variant(cv2))
            if k2 is not None:
                el2 = F.when(F.coalesce(k2, F.lit(False)), el2).otherwise(_empty_varr())
            arrs.append(F.coalesce(el2, _empty_varr()))
        return keep, None, F.concat(*arrs)
    if tag in ("field", "index", "slice") and isinstance(node[1], tuple) and _is_stream_expr(node[1]):
        # the BASE is a stream — navigate each element (.a[].b)
        keep, _, elems = _stream_eval(node[1], cur, keep)
        rebuilt = (tag, ("identity",)) + tuple(node[2:])
        return keep, None, F.transform(elems, _el_map_fn(rebuilt))
    if tag == "limit":
        keep, cv, elems = _stream_eval(node[2], cur, keep)
        if elems is None:
            return keep, cv, None  # single value: limit(n≥1) is identity
        return keep, None, F.slice(elems, 1, node[1])
    if tag == "limit_dyn":
        # limit(EXPR; f): the count evaluates against `.` per row
        _, cnt_cv = _compile(node[1], cur, None)
        n = F.coalesce(_as_num(cnt_cv).l, F.lit(0))
        keep, cv, elems = _stream_eval(node[2], cur, keep)
        if elems is None:
            elems = F.array(_to_variant(cv))
        return keep, None, F.slice(elems, F.lit(1), F.greatest(n, F.lit(0)))
    if tag == "rangegen_dyn":
        # range(EXPR...): bounds evaluate against `.` per row; the
        # stream builds as lo + i*step over an F.sequence index — floats
        # supported (count = ceil((hi-lo)/step), jq's half-open rule);
        # null/invalid args or step=0 yield the empty stream (lenient —
        # jq errors / loops forever)
        nums = [_as_num(_compile(a, cur, None)[1]) for a in node[1]]
        zero = _num(F.lit(0.0), F.lit(True), F.lit(0).cast("long"))
        one = _num(F.lit(1.0), F.lit(True), F.lit(1).cast("long"))
        if len(nums) == 1:
            lo, hi, step = zero, nums[0], one
        elif len(nums) == 2:
            lo, hi, step = nums[0], nums[1], one
        else:
            lo, hi, step = nums
        cnt = F.when(
            step.d != 0, F.ceil((hi.d - lo.d) / step.d).cast("long")
        ).otherwise(F.lit(0))
        cnt = F.greatest(F.coalesce(cnt, F.lit(0)), F.lit(0).cast("long"))
        all_int = F.coalesce(lo.isint & step.isint, F.lit(False))
        lo_l, step_l = lo.l, step.l
        lo_d, step_d = lo.d, step.d

        def txt(i):
            vd = lo_d + i.cast("double") * step_d
            integral = (vd == F.floor(vd)) & (F.abs(vd) <= F.lit(2.0**53))
            return (
                F.when(all_int, (lo_l + i * step_l).cast("string"))
                .when(integral, vd.cast("long").cast("string"))
                .otherwise(vd.cast("string"))
            )

        seq = F.sequence(F.lit(0).cast("long"), cnt - 1)
        elems = F.when(
            cnt > 0, F.transform(seq, lambda i: F.try_parse_json(txt(i)))
        ).otherwise(_empty_varr())
        return keep, None, elems
    if tag == "lastfn":
        keep, cv, elems = _stream_eval(node[1], cur, keep)
        if elems is None:
            return keep, cv, None
        return keep, None, F.slice(elems, F.greatest(F.size(elems), F.lit(1)), 1)
    if tag == "object" and _is_stream_expr(node):
        # generator-valued entries distribute per jq's cartesian rule:
        # fields evaluate left-to-right with LATER stream fields varying
        # fastest ({a:(1,2),b:(3,4)} -> a1b3, a1b4, a2b3, a2b4) — nested
        # F.transform per stream field, flattened once per extra level
        pairs = node[1]
        stream_idxs = [i for i, (_k, v) in enumerate(pairs) if _is_stream_expr(v)]
        elem_arrays = {}
        for i in stream_idxs:
            keep, _, el = _stream_eval(pairs[i][1], cur, keep)
            elem_arrays[i] = F.coalesce(el, _empty_varr())

        def build(bound):
            parts = [F.lit("{")]
            for i, (key, vnode) in enumerate(pairs):
                if i:
                    parts.append(F.lit(","))
                parts.append(F.lit(json.dumps(key, ensure_ascii=False) + ":"))
                if i in bound:
                    parts.append(F.coalesce(F.to_json(bound[i]), F.lit("null")))
                else:
                    _, v = _compile(vnode, cur, None)
                    parts.append(_render(v))
            parts.append(F.lit("}"))
            return F.try_parse_json(F.concat(*parts))

        def nest(level, bound):
            if level == len(stream_idxs):
                return build(bound)
            idx = stream_idxs[level]

            def make_fn(_level, _idx, _bound):
                # single-arg factory closure: a multi-param lambda makes
                # PySpark's HOF arity sniffing pass the element INDEX as
                # the second argument (see HANDOFF gotcha)
                def fn(e):
                    return nest(_level + 1, {**_bound, _idx: e})

                return fn

            return F.transform(elem_arrays[idx], make_fn(level, idx, bound))

        elems = nest(0, {})
        for _ in range(len(stream_idxs) - 1):
            elems = F.flatten(elems)
        return keep, None, elems
    if tag == "interp" and _is_stream_expr(node):
        # generator parts distribute like object-value entries: parts
        # evaluate left-to-right with LATER stream parts varying fastest
        # ("\(1,2)-\(3,4)" → 1-3, 1-4, 2-3, 2-4 — pinned against the
        # interpreter)
        parts = node[1]
        stream_idxs = [
            i for i, (pk, p) in enumerate(parts)
            if pk != "lit" and _is_stream_expr(p)
        ]
        elem_arrays = {}
        for i in stream_idxs:
            keep, _, el = _stream_eval(parts[i][1], cur, keep)
            elem_arrays[i] = F.coalesce(el, _empty_varr())

        def build_interp(bound):
            cols = []
            for i, (pk, p) in enumerate(parts):
                if pk == "lit":
                    cols.append(F.lit(p))
                elif i in bound:
                    cols.append(_tostring_col(CV.variant(bound[i])))
                else:
                    _, v = _compile(p, cur, None)
                    cols.append(_tostring_col(v))
            s = CV("str", col=F.concat(*cols) if cols else F.lit(""))
            return F.try_parse_json(_render(s))

        def nest_interp(level, bound):
            if level == len(stream_idxs):
                return build_interp(bound)
            idx = stream_idxs[level]

            def make_fn(_level, _idx, _bound):
                # single-arg factory closure (HOF arity-sniffing gotcha)
                def fn(e):
                    return nest_interp(_level + 1, {**_bound, _idx: e})

                return fn

            return F.transform(elem_arrays[idx], make_fn(level, idx, bound))

        elems = nest_interp(0, {})
        for _ in range(len(stream_idxs) - 1):
            elems = F.flatten(elems)
        return keep, None, elems
    if tag in ("arith", "cmp") and (
        _is_stream_expr(node[2]) or _is_stream_expr(node[3])
    ):
        # stream operands distribute; both-stream is the cartesian with
        # the RIGHT side varying SLOWEST (.nums[]+.den[] evaluates
        # right-to-left, gojq order — verified against the interpreter)
        op = node[1]
        combine = _arith if tag == "arith" else _compare
        l_node, r_node = node[2], node[3]
        l_stream, r_stream = _is_stream_expr(l_node), _is_stream_expr(r_node)

        def op_cv(a: CV, b: CV) -> Column:
            return _to_variant(combine(a, b, op))

        if l_stream and r_stream:
            keep, _, l_el = _stream_eval(l_node, cur, keep)
            keep, _, r_el = _stream_eval(r_node, cur, keep)
            l_el = F.coalesce(l_el, _empty_varr())
            r_el = F.coalesce(r_el, _empty_varr())

            def outer_fn(b):
                def inner_fn(a):
                    return op_cv(CV.variant(a), CV.variant(b))

                return F.transform(l_el, inner_fn)

            return keep, None, F.flatten(F.transform(r_el, outer_fn))
        if l_stream:
            keep, _, l_el = _stream_eval(l_node, cur, keep)
            _, r_cv = _compile(r_node, cur, None)

            def lmap(a):
                return op_cv(CV.variant(a), r_cv)

            return keep, None, F.transform(F.coalesce(l_el, _empty_varr()), lmap)
        keep, _, r_el = _stream_eval(r_node, cur, keep)
        _, l_cv = _compile(l_node, cur, None)

        def rmap(b):
            return op_cv(l_cv, CV.variant(b))

        return keep, None, F.transform(F.coalesce(r_el, _empty_varr()), rmap)
    k, v = _compile(node, cur, keep)
    return k, v, None


def _el_keep_fn(st):
    """Element-level keep predicate for a stage whose compile yields a
    keep (select, or a sub-pipe burying one)."""

    def el_keep(e):
        k2, _ = _compile(st, CV.variant(e), None)
        return F.lit(True) if k2 is None else F.coalesce(k2, F.lit(False))

    return el_keep


def _el_map_fn(st):
    def el_map(e):
        _, v2 = _compile(st, CV.variant(e), None)
        return _to_variant(v2)

    return el_map


def _el_stream_fn(st):
    """Element → its output stream (for a nested-generator stage)."""

    def el_stream(e):
        k2, cv2, el2 = _stream_eval(st, CV.variant(e), None)
        if el2 is None:
            el2 = F.array(_to_variant(cv2))
        if k2 is not None:
            el2 = F.when(F.coalesce(k2, F.lit(False)), el2).otherwise(_empty_varr())
        return F.coalesce(el2, _empty_varr())

    return el_stream


def _node_has_select(x) -> bool:
    if isinstance(x, (tuple, list)):
        if isinstance(x, tuple) and x and x[0] == "select":
            return True
        return any(_node_has_select(c) for c in x)
    return False


def _validate(node, scope: frozenset, stream_ok: bool = False):
    """Symbolic compilability walk (no SparkSession needed): rejects
    bare generators outside stream positions (pipe stages, array items,
    generator bases), unbound $variables, and non-numeric reduce inits
    at try_compile time so apply() cannot surprise the processor."""
    tag = node[0]
    if tag in ("identity", "lit_num", "lit_str", "lit_bool", "lit_null"):
        return
    if tag == "var":
        if node[1] not in scope:
            raise JqCompileError(f"${node[1]} is not defined")
        return
    if tag == "bind":
        _validate(node[1], scope)
        _validate(node[3], scope | {node[2]}, stream_ok)
        return
    if tag == "iterate":
        if not stream_ok:
            raise JqCompileError(
                "bare .[] generators compile only in pipe stages / array items"
            )
        _validate(node[1], scope, True)
        return
    if tag == "comma":
        if not stream_ok:
            raise JqCompileError(
                "`,` stream concatenation compiles only in stream positions"
            )
        for item in node[1]:
            _validate(item, scope, True)
        return
    if tag == "rangegen":
        if not stream_ok:
            raise JqCompileError("range() compiles only in stream positions")
        return
    if tag == "reduce":
        _validate(node[1], scope)
        _validate(node[3], scope)
        _validate(node[4], scope | {node[2]})
        return
    if tag == "pipe":
        for stage in node[1]:
            _validate(stage, scope, stream_ok)
        return
    if tag == "interp":
        for pk, p in node[1]:
            if pk != "lit":
                # generator parts distribute (stream position inherited,
                # like object-value entries)
                _validate(p, scope, stream_ok and _is_stream_expr(p))
        return
    if tag == "has_dyn":
        _validate(node[1], scope)
        return
    if tag == "call1d":
        _validate(node[2], scope)
        return
    if tag == "limit_dyn":
        _validate(node[1], scope)
        _validate(node[2], scope, stream_ok)
        return
    if tag == "rangegen_dyn":
        if not stream_ok:
            raise JqCompileError("range() compiles only in stream positions")
        for a in node[1]:
            _validate(a, scope)
        return
    if tag == "recurse":
        if not stream_ok:
            raise JqCompileError("`..` compiles only in stream positions")
        return
    if tag in ("field", "index", "neg", "select", "map", "call0", "has", "call1s"):
        if tag in ("field", "index") and isinstance(node[1], tuple):
            # a stream base is navigable per element (.a[].b)
            _validate(node[1], scope, stream_ok)
        if tag == "map":
            # map(f) desugars to [.[] | f] — the body is a stream stage
            _validate(node[1], scope, True)
        elif tag in ("neg", "select"):
            _validate(node[1], scope)
        return
    if tag == "slice":
        _validate(node[1], scope, stream_ok)
        return
    if tag in ("arith", "cmp"):
        # stream operands distribute in stream positions (cartesian)
        _validate(node[2], scope, stream_ok and _is_stream_expr(node[2]))
        _validate(node[3], scope, stream_ok and _is_stream_expr(node[3]))
        return
    if tag in ("and", "or", "alt"):
        _validate(node[1], scope)
        _validate(node[2], scope)
        return
    if tag == "if":
        _validate(node[1], scope)
        _validate(node[2], scope)
        for c, t in node[3]:
            _validate(c, scope)
            _validate(t, scope)
        _validate(node[4], scope)
        return
    if tag == "array":
        for item in node[1]:
            _validate(item, scope, True)
        return
    if tag == "object":
        for item in node[1]:
            # generator-valued entries distribute cartesian (stream
            # position inherited); everything else is single-output
            _validate(item[1], scope, stream_ok and _is_stream_expr(item[1]))
        return
    if tag in ("limit", "lastfn"):
        _validate(node[2] if tag == "limit" else node[1], scope, stream_ok)
        return
    raise JqCompileError(f"node {tag!r} not compiled")


def _node_has_tag(x, tag: str) -> bool:
    if isinstance(x, (tuple, list)):
        if isinstance(x, tuple) and x and x[0] == tag:
            return True
        return any(_node_has_tag(c, tag) for c in x)
    return False


def _uses_plus(node) -> bool:
    if isinstance(node, tuple):
        if node and node[0] == "arith" and node[1] == "+":
            return True
        return any(_uses_plus(c) for c in node)
    if isinstance(node, list):
        return any(_uses_plus(c) for c in node)
    return False


class CompiledJq:
    """A jq program compiled to Column expressions over one variant input."""

    def __init__(self, src: str):
        self.ast = _SubsetParser(src).parse()
        _validate(self.ast, frozenset(), True)
        # a runtime-typed `+` may hit the object-merge lane, which
        # compiles onto map_concat and needs
        # spark.sql.mapKeyDedupPolicy=LAST_WIN — the processor sets it
        # when this flag is on (same contract as CompiledJmes.uses_merge)
        self.uses_merge = _uses_plus(self.ast)
        # `..` compiles depth-bounded: the processor must row-split on
        # recurse_depth_exceeded and interpret the too-deep rows
        self.uses_recurse = _node_has_tag(self.ast, "recurse")

    def apply(self, variant_col: Column) -> tuple[Optional[Column], Column]:
        """(keep predicate or None, rendered compact-JSON output column).

        Program-level stream semantics match the interpreter
        (processor_jq.go:26): no output filters the message, one output
        is the value itself, multiple outputs become an array."""
        keep, cv, elems = _stream_eval(self.ast, CV.variant(variant_col), None)
        if elems is None:
            return keep, _render(cv)
        outs = F.transform(elems, lambda e: _render(CV.variant(e)))
        n = F.size(outs)
        nonempty = n > 0
        keep = nonempty if keep is None else (F.coalesce(keep, F.lit(False)) & nonempty)
        rendered = F.when(n == 1, F.element_at(outs, 1)).otherwise(
            F.concat(F.lit("["), F.array_join(outs, ","), F.lit("]"))
        )
        return keep, rendered


def try_compile(src: str) -> Optional[CompiledJq]:
    try:
        return CompiledJq(src)
    except JqError:
        return None
