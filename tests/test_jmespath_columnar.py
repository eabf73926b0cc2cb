"""Dual-backend conformance for the JMESPath→columnar subset compiler:
every compilable expression must agree with the spec-complete per-row
interpreter over a varied document corpus. Rows where the interpreter
raises invalid-type become null in BOTH tiers (the processor catches
per-row errors), so the expectation here is uniform."""

from __future__ import annotations

import json

import pytest

from benthos_spark.functions.jmespath_columnar import try_compile
from benthos_spark.functions.jmespath_program import JmesProgram, JmespathProcessor

DOCS = [
    {"a": {"b": {"c": 7}}, "name": "alpha", "tags": ["x", "y", "z"], "n": 3},
    {"a": {"b": None}, "name": "", "tags": [], "n": 0},
    {"a": None, "name": "Gamma δ", "tags": ["only"], "n": -4},
    {"name": 'quote"inside', "tags": None, "n": 2.5},
    {"a": {"b": {"c": "str"}}, "weird key": 42, "n": 9007199254740993},
    None,
    # projection / filter / function shapes
    {
        "name": "proj",
        "tags": ["x", "x", "q"],
        "n": 1,
        "items": [
            {"v": 1, "k": "a", "ys": [1, 2]},
            {"v": 2, "k": "b", "ys": [3]},
            {"v": "s", "k": "c"},
            {"v": 5, "k": None, "ys": "not-a-list"},
        ],
        "nums": [3, 1, 2],
        "mixed": [1.5, 2],
        "nested": [[1, 2], [3], 4, None],
        "obj": {"p": {"n": 1}, "q": {"n": 2}},
    },
    {"items": "not-a-list", "nums": [], "nested": [], "obj": {}},
]

EXPRESSIONS = [
    "@",
    "a",
    "a.b",
    "a.b.c",
    "missing",
    "missing.deeper.still",
    "tags[0]",
    "tags[2]",
    "tags[5]",
    "tags[-1]",
    '"weird key"',
    "a.b | c",
    "name | @",
    "{c: a.b.c, nm: name}",
    "{one: a, two: missing}",
    "[a.b.c, name]",
    "[n]",
    "`42`",
    "`\"lit\"`",
    "`null`",
    "'raw string'",
    "{n: `1`, s: 'x'}",
    # projections (nested per the spec parse shape), flatten, slices
    "tags[*]",
    "items[*].k",
    "items[*].ys[*]",
    "items[*].ys[0]",
    "items[].ys[]",
    "nested[]",
    "tags[0:2]",
    "items[1:]",
    "items[:2].k",
    "obj.*.n",
    "items[*].{key: k, val: v}",
    # filters
    "tags[?@ == 'x']",
    "items[?v > `1`].k",
    "items[?v != `1`].k",
    "items[?v >= `2` && k].k",
    "items[?k == 'a' || k == 'c'].v",
    "items[?!ys].k",
    # comparators / boolean operators at top level
    "n > `1`",
    "n == `2.5`",
    "name != 'alpha'",
    "a || name",
    "a && name",
    "!a",
    # functions
    "length(name)",
    "length(tags)",
    "length(@)",
    "length(obj)",
    "contains(name, 'am')",
    "contains(tags, 'x')",
    "starts_with(name, 'G')",
    "ends_with(name, 'a')",
    "not_null(a, name, `3`)",
    "to_string(n)",
    "to_number(name)",
    "to_number(n)",
    "abs(n)",
    "ceil(n)",
    "floor(n)",
    "sum(nums)",
    "sum(mixed)",
    "avg(nums)",
    "sum(items[*].v)",
    # round-3 second-wave additions
    "min(nums)",
    "max(nums)",
    "min(tags)",
    "max(tags)",
    "min(mixed)",
    "reverse(tags)",
    "reverse(name)",
    "reverse(nums)",
    "keys(obj)",
    "join('-', tags)",
    "join(', ', tags)",
    "type(n)",
    "type(name)",
    "type(tags)",
    "type(obj)",
    "type(missing)",
    "to_array(n)",
    "to_array(tags)",
    "to_array(missing)",
    "max(items[*].v)",
    # round-3 third-wave: expression-reference family
    "sort(tags)",
    "sort(nums)",
    "sort(mixed)",
    "sort_by(items, &v)",
    "sort_by(items, &k)",
    "min_by(items, &v)",
    "max_by(items, &v)",
    "max_by(items, &k)",
    "map(&k, items)",
    "map(&v, items)",
    "map(&ys[0], items)",
    "sort_by(items, &v)[*].k",
    "max_by(items, &v).k",
    "merge(obj, `{}`)",
    "merge(`{\"p\": 0}`, obj)",
    "merge(obj, `{\"p\": {\"n\": 9}}`)",
    "merge(a, obj)",
    "merge(tags, obj)",
    "merge(obj.p, obj.q)",
    # negative slice bounds (python semantics)
    "tags[-2:]",
    "tags[:-1]",
    "tags[-3:-1]",
    "items[-2:].k",
    "nums[-9:]",
    # round-4: stepped slices (python slice.indices semantics)
    "tags[::2]",
    "tags[::-1]",
    "nums[1::2]",
    "nums[5:1:-2]",
    "nums[::-3]",
    "tags[-1::-1]",
    "nums[:2:2]",
    "items[::2].k",
]

# outside the subset — must fall back, not mis-compile
FALLBACK = [
    "sort_by(items, v)",  # second arg must be an &expression
]


@pytest.mark.parametrize("expr", FALLBACK)
def test_outside_subset_falls_back(expr):
    assert try_compile(expr) is None


def test_subset_compiles():
    for expr in EXPRESSIONS:
        assert try_compile(expr) is not None, expr


def _expected(prog, d):
    from benthos_spark.functions.jq_program import render_json

    try:
        # the processor's own render boundary (Go json.Marshal number
        # normalization included)
        return render_json(prog.search(d), ensure_ascii=False)
    except Exception:
        return "null"  # the processor nulls invalid-type rows in both tiers


def test_dual_backend_conformance(spark):
    rows = [(i, json.dumps(d)) for i, d in enumerate(DOCS)]
    df = spark.createDataFrame(rows, "i int, value string")
    mismatches = []
    for expr in EXPRESSIONS:
        prog = JmesProgram(expr)
        expect = {i: _expected(prog, d) for i, d in enumerate(DOCS)}
        got_rows = JmespathProcessor(expr)(df).collect()
        got = {r["i"]: r["value"] for r in got_rows}
        for i in range(len(DOCS)):
            if not _json_equal(expect[i], got[i]):
                mismatches.append((expr, i, expect[i], got[i]))
    assert not mismatches, mismatches[:10]


def _typed(v):
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", v)
    if isinstance(v, list):
        return [_typed(x) for x in v]
    if isinstance(v, dict):
        return {k: _typed(x) for k, x in v.items()}
    return v


def _json_equal(e, g):
    if e == g:
        return True
    if e is None or g is None:
        return False
    try:
        return _typed(json.loads(e)) == _typed(json.loads(g))
    except Exception:
        return False


def test_columnar_plan_has_no_python_stage(spark):
    df = spark.createDataFrame([(1, '{"a": {"b": 5}}')], "i int, value string")
    for expr in ("{v: a.b}", "items[?v > `1`].k", "sum(items[*].v)"):
        out = JmespathProcessor(expr)(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan and "EvalPython" not in plan, expr
