"""Dual-backend conformance for the JMESPath→columnar subset compiler:
every compilable expression must agree with the spec-complete per-row
interpreter over a varied document corpus."""

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
]

FALLBACK = [
    "tags[]",
    "tags[*].x",
    "a.*.c",
    "tags[?@ == 'x']",
    "length(tags)",
    "a || name",
    "a && name",
    "tags[1:2]",
    "sort(tags)",
]


@pytest.mark.parametrize("expr", FALLBACK)
def test_outside_subset_falls_back(expr):
    assert try_compile(expr) is None


def test_subset_compiles():
    for expr in EXPRESSIONS:
        assert try_compile(expr) is not None, expr


def test_dual_backend_conformance(spark):
    rows = [(i, json.dumps(d)) for i, d in enumerate(DOCS)]
    df = spark.createDataFrame(rows, "i int, value string")
    mismatches = []
    for expr in EXPRESSIONS:
        prog = JmesProgram(expr)
        expect = {}
        for i, d in enumerate(DOCS):
            expect[i] = json.dumps(
                prog.search(d), separators=(",", ":"), ensure_ascii=False
            )
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
    out = JmespathProcessor("{v: a.b}")(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan


def test_interpreter_forced_path_still_works(spark):
    df = spark.createDataFrame([(1, '{"a": {"b": 5}}')], "i int, value string")
    out = JmespathProcessor("{v: a.b}", columnar=False)(df).collect()
    assert out[0]["value"] == '{"v":5}'
