"""Dual-backend conformance for the jq→columnar compiler: every program
in the compilable subset must produce byte-identical output (and
identical row-keep decisions) through the Column path and the per-row
interpreter, over a corpus of varied documents."""

from __future__ import annotations

import json

import pytest

from benthos_spark.functions.jq_columnar import JqCompileError, try_compile
from benthos_spark.functions.jq_program import JqProcessor, JqProgram

DOCS = [
    {"k": 7, "name": "alpha", "tags": ["a", "b"], "meta": {"depth": 2, "ok": True}, "nums": [1, 2, 3]},
    {"k": 52, "name": "beta", "tags": [], "meta": {"depth": 0, "ok": False}, "nums": []},
    {"k": 0, "name": "", "tags": ["x"], "meta": {"depth": -3, "ok": True}, "nums": [5]},
    {"k": -13, "name": "Gamma δelta", "tags": ["q", "r", "s"], "meta": {"depth": 11, "ok": False}, "nums": [-4, 0, 9, 2]},
    {"k": 2.5, "name": "float-k", "tags": ["z"], "meta": {"depth": 1, "ok": True}, "nums": [0.5, 1.5]},
    {"name": "no-k at all", "tags": ["t"], "meta": {"depth": 4, "ok": True}, "nums": [10, 2.25]},
    {"k": 100, "name": 'quote"inside', "tags": ["a"], "meta": {"depth": 7, "ok": False}, "nums": [7, 7, 7]},
    {"k": 31, "name": None, "tags": None, "meta": {}},
    {"k": 9007199254740993, "name": "big", "tags": ["big"], "meta": {"depth": 5, "ok": True}, "nums": [2, 9007199254740993]},
]

# Programs inside the compilable subset: interpreter is the truth bar.
PROGRAMS = [
    ".",
    ".k",
    ".name",
    ".meta.depth",
    ".meta.ok",
    ".missing",
    ".missing.deeper",
    ".tags[0]",
    ".tags[2]",
    "{k: .k}",
    '{"key with space": .k, n: .name}',
    "{k: .k, d: .meta.depth, both: (.k != null and .meta.ok)}",
    "select(.k != null)",
    "select(.k != null) | {k: .k, dbl: (.k * 2), hi: (.k >= 50)}",
    "select(.meta.ok) | .name",
    "select(.k != null) | .k + 1",
    "select(.k != null) | .k - 10",
    "select(.k != null) | .k % 7",
    "select(.k != null) | -.k",
    "select(.k != null) | if .k >= 50 then \"high\" else \"low\" end",
    "if .meta.ok then 1 else 0 end",
    "if .k == null then \"none\" elif .k > 10 then \"big\" else \"small\" end",
    ".k == 7",
    ".k != 7",
    ".name == \"beta\"",
    ".k > 10 or .meta.ok",
    ".k > 10 and .k < 60",
    ".k // 42",
    ".name // \"anon\"",
    "[.k, .name]",
    "[]",
    "{}",
    "map(.) ",
    # map over the tags array
    ".tags | map(.)",
    "select(.k != null) | .k | floor",
    "select(.k != null) | .k | ceil",
    "select(.k != null) | .k | tostring",
    ".name | tostring",
    ".meta.ok | not",
    "null",
    "true",
    '"literal"',
    "3.5",
    "12",
    ".tags | length",
    ".name | length",
    ".k | length",
    ".meta | length",
    ".missing | length",
    "type",
    ".k | type",
    ".tags | type",
    ".meta.ok | type",
    'has("k")',
    'has("nope")',
    'select(.k != null) | {t: (.k | type), n: has("name")}',
    # string interpolation (single-output parts compile; tostring render)
    r'"id-\(.k)"',
    r'"\(.name)!"',
    r'"\(.k)-\(.meta.depth)"',
    r'"v=\((.k // 0) * 2)"',
    r'select(.k != null) | {label: "k=\(.k) ok=\(.meta.ok)"}',
    r'"name:\(.name | tostring):\(.tags | length)"',
    # round-3 additions: variables, reduce, slices, string/array builtins
    ".k as $v | $v",
    ". as $x | $x.k",
    ".k as $v | {orig: $v, plus: (($v // 0) + 1)}",
    ".meta.depth as $d | select($d != null) | $d * 2",
    ".nums | reduce .[] as $x (0; . + $x)",
    ".nums | reduce .[] as $x (1; . * $x)",
    "reduce .nums[] as $x (0; . + $x)",
    ".nums | reduce .[] as $x (0; . + ($x * 2))",
    # round-4: string/array-init reduce + polymorphic `+` (null identity,
    # string/array concat, runtime type dispatch)
    'reduce .tags[] as $x (""; . + $x)',
    'reduce .tags[] as $x ("pre-"; . + $x)',
    "reduce .nums[] as $x ([]; . + [$x])",
    "reduce .nums[] as $x ([]; . + [$x * 2])",
    "reduce .tags[] as $x (null; $x)",
    "reduce .tags[] as $x ([]; . + [$x]) | length",
    # object merge `+` (right bias, lexeme-preserving) + object-init reduce
    ".meta + {extra: 1}",
    "{k: .k} + {k: 99, n: .name}",
    "{} + {}",
    ".meta + {}",
    "{a: 1} + .meta",
    ".meta + null",
    "null + .meta",
    ".meta + .missing",
    "reduce .nums[] as $x ({}; . + {n: $x})",
    "reduce .nums[] as $x ({seen: 0}; . + {seen: (.seen + 1), last: $x})",
    '(.meta + {ok: "flipped"}) | .ok',
    # generator-inside-interpolation distributes (later parts fastest)
    r'"v=\(1,2)"',
    r'"\(1,2)-\(3,4)"',
    r'"t:\(.tags[])"',
    r'"\(.tags[])=\(.k)"',
    r'["p-\(.nums[])"]',
    r'{msg: "n=\(.nums[])"}',
    '.name + "!"',
    '.tags + ["z"]',
    ".tags + .nums",
    ".k + 1",
    ".missing + 5",
    ".tags + null",
    "null + .k",
    ".nums | add",
    ".nums | min",
    ".nums | max",
    ".tags | add",
    ".tags | min",
    ".nums | first",
    ".nums | last",
    ".tags | first",
    ".nums[1:3]",
    ".nums[:2]",
    ".nums[1:]",
    ".name[1:3]",
    "select(.k != null) | .k | abs",
    "select(.k != null) | -.k | fabs",
    ".name | ascii_downcase",
    ".name | ascii_upcase",
    '.name | ltrimstr("a")',
    '.name | rtrimstr("a")',
    '.name | startswith("b")',
    '.name | endswith("a")',
    '.name | split("e")',
    '.tags | join("-")',
    '.name | test("^[a-z]+$")',
    '.tags | join(",") | ascii_upcase',
    'select(.k != null) | {sum: (.nums | add), top: (.nums | max)}',
    ".meta | keys",
    ".nums | sort",
    ".tags | sort",
    ".nums | unique",
    ".tags | unique",
    ".nums | reverse",
    ".tags | reverse",
    ".name | reverse",
    ".nums | sort | first",
    ".tags | unique | length",
    # bare generators: 0 outputs filter, 1 output is the value, n
    # outputs collect into an array (processor_jq.go semantics)
    ".tags[]",
    ".nums[]",
    ".nums[] | . * 2",
    '.tags[] | select(. != "a")',
    "[.nums[] | select(. > 1)]",
    "[.nums[] | select(. > 1) | . * 10] | add",
    "{first_tag: .tags[0], all: [.tags[]]}",
    "[.nums[], .k]",
    "select(.k != null) | .nums[] | . + 1",
    ".meta[]",  # object iteration (sorted keys == insertion order here)
    ".nums[] | tostring",
    "[.tags[] | ascii_upcase]",
    ".nums[0:2][]",
    ".tags[-1]",
    ".nums[-2:]",
    ".nums[:-1]",
    ".nums[-3:-1]",
    ".name | .[1:-1]",
    ".nums[-9]",
    # `,` stream concatenation
    ".k, .name",
    ".nums[], .k",
    "[.k, .name]",
    ".tags[], \"end\"",
    "(.k, .meta.depth) | select(. != null)",
    # entries family (.meta keys are already sorted in DOCS, so the
    # sorted-iteration divergence cannot bite)
    ".meta | to_entries",
    ".meta | to_entries | map(.key)",
    ".meta | with_entries(select(.value != null))",
    '.meta | to_entries | from_entries',
    # range() generator (literal bounds)
    "range(3)",
    "range(1; 4)",
    "range(0; 10; 3)",
    "range(5; 1; -2)",
    "[range(4)]",
    "range(2) | . * 10",
    "range(0)",
    ".nums[], range(2)",
    # generator in object-value position distributes (single stream)
    "{t: .tags[]}",
    "{t: .tags[], n: .k}",
    "{a: (1, 2)}",
    # round-4: cartesian generators — multiple streams in object /
    # operand positions (field order: later fields vary fastest;
    # operands: right side varies slowest, gojq evaluation order)
    "{a: .tags[], b: .nums[]}",
    "{a: .tags[], b: .nums[], c: 1}",
    "{a: (1, 2), b: (3, 4)}",
    "[.nums[] + .nums[]]",
    ".nums[] + 1",
    "1 + .nums[]",
    "[.nums[] > .nums[]]",
    "[range(2) + range(2)]",
    "[.nums[] * 10 + .nums[]] | length",
    # stream limiting
    "limit(2; .nums[])",
    "limit(2; range(9))",
    "first(.nums[])",
    "last(.nums[])",
    "[limit(2; .nums[] | . * 10)]",
    # dynamic has(): object string-key membership / array index range
    "has(.name)",
    ".meta | has(\"depth\")",
    '.tags | has(1)',
    '.tags | has(5)',
    '.meta | has(.name)',
    # round-4: dynamic-argument range / limit / string functions
    "[range(.meta.depth // 0)]",
    "[range(1; .meta.depth // 0)]",
    "[range(.meta.depth // 0; 0; -1)]",
    "[range(0; .meta.depth // 0; 2)]",
    "[limit(.meta.depth // 0; .nums[])]",
    "[limit(.meta.depth // 0; range(10))]",
    'range(.meta.depth // 0) | . * 2',
    '.name | ltrimstr(.tags[0] // "")',
    '.name | rtrimstr(.tags[0] // "")',
    '.name | startswith(.tags[0] // "zzz")',
    '.name | endswith(.tags[0] // "zzz")',
    '.name | split(.tags[0] // ",")',
    '.tags | join(.name // ",")',
    '.name | test(.tags[0] // "^$")',
    r'.name | ltrimstr("\(.k)")',
]

# outside the subset — must fall back, not mis-compile
FALLBACK_PROGRAMS = [
    # computed object keys `{(EXPR): v}` are interpreter-only
    'reduce .[] as $x ({}; . + {($x | tostring): 1})',
    # `..`/argless recurse compile (round 5); recurse(f) stays interpreter-only
    "recurse(.children[]?)",
    "$metadata.topic",
]


@pytest.mark.parametrize("prog", FALLBACK_PROGRAMS)
def test_outside_subset_falls_back(prog):
    assert try_compile(prog) is None


def test_subset_compiles():
    for prog in PROGRAMS:
        assert try_compile(prog) is not None, prog


def _interp_rows(prog, docs):
    p = JqProgram(prog)
    out = {}
    for i, doc in enumerate(docs):
        try:
            res = p.run(doc)
        except Exception:
            out[i] = "<error>"
            continue
        if not res:
            out[i] = None  # filtered
        else:
            r = res[0] if len(res) == 1 else res
            # render through the interpreter's own boundary (gojq
            # number normalization included)
            from benthos_spark.functions.jq_program import render_json

            out[i] = render_json(r, ensure_ascii=False)
    return out


def test_dual_backend_conformance(spark):
    rows = [(i, json.dumps(d)) for i, d in enumerate(DOCS)]
    df = spark.createDataFrame(rows, "i int, value string")
    mismatches = []
    for prog in PROGRAMS:
        expect = _interp_rows(prog, DOCS)
        got_rows = JqProcessor(prog)(df).collect()
        got = {r["i"]: r["value"] for r in got_rows}
        for i in range(len(DOCS)):
            e = expect.get(i)
            if e == "<error>":
                continue  # interpreter errors; columnar is lenient (documented)
            g = got.get(i)
            if not _json_equal(e, g):
                mismatches.append((prog, i, e, g))
    assert not mismatches, mismatches[:10]


def _typed(v):
    """JSON value with int/float distinction preserved for comparison."""
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
    """Byte equality, else JSON-value equality (variant to_json emits
    object keys sorted; the interpreter preserves input order — JSON-
    equivalent, and the int/float distinction must still hold)."""
    if e == g:
        return True
    if e is None or g is None:
        return False
    try:
        return _typed(json.loads(e)) == _typed(json.loads(g))
    except Exception:
        return False


def test_columnar_plan_has_no_python_stage(spark):
    df = spark.createDataFrame([(1, '{"k": 5}')], "i int, value string")
    out = JqProcessor('select(.k != null) | {k: .k, dbl: (.k * 2)}')(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_object_iteration_order_divergence_pinned(spark):
    """Compiled `.[]` over an OBJECT yields values in sorted-key order
    (all compiled object iteration is sorted — same as keys()); the
    interpreter preserves document order. Same value SET, different
    order — the divergence is documented in the module docstring."""
    doc = '{"b":2,"a":1,"c":3}'
    df = spark.createDataFrame([(1, doc)], "i int, value string")
    got = JqProcessor(".[]")(df).collect()[0]["value"]
    assert json.loads(got) == [1, 2, 3]  # sorted by key a,b,c
    interp = JqProgram(".[]").run(json.loads(doc))
    assert interp == [2, 1, 3]  # document order


def test_generator_empty_stream_filters_message(spark):
    df = spark.createDataFrame(
        [(1, '{"tags":["x"]}'), (2, '{"tags":[]}'), (3, '{"k":1}')],
        "i int, value string",
    )
    out = JqProcessor(".tags[]")(df).collect()
    assert [r["i"] for r in out] == [1]
    assert out[0]["value"] == '"x"'


def test_select_inside_array_collects_nothing(spark):
    # regression: the pre-stream array compiler dropped the select keep
    # and emitted the value unconditionally
    df = spark.createDataFrame([(1, '{"a":1}'), (2, '{"a":2}')], "i int, value string")
    out = {r["i"]: r["value"] for r in JqProcessor("[select(.a > 1)]")(df).collect()}
    assert out == {1: "[]", 2: '[{"a":2}]'}


def test_generator_plan_has_no_python_stage(spark):
    df = spark.createDataFrame([(1, '{"items":[{"a":1}]}')], "i int, value string")
    out = JqProcessor(".items[] | select(.a > 0) | {id: .a}")(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_interpreter_forced_path_still_works(spark):
    df = spark.createDataFrame([(1, '{"k": 5}'), (2, '{"k": null}')], "i int, value string")
    out = JqProcessor('select(.k != null) | {k: .k}', columnar=False)(df).collect()
    assert len(out) == 1 and out[0]["value"] == '{"k":5}'


# ---------------------------------------------------------------------------
# `..` recursive descent (round 5): bounded columnar compile + row-level
# interpreter fallback past RECURSE_MAX_DEPTH
# ---------------------------------------------------------------------------

# sorted-key docs so both tiers emit the same object-value order (the
# sorted-vs-document order divergence is pinned separately above)
RECURSE_DOCS = [
    {"a": [1, 2], "b": 3},
    {"a": [1, {"c": "x"}], "b": True},
    {"a": {"b": {"c": [None, "s", 4.5]}}},
    [1, [2, [3, [4]]]],
    "scalar",
    7,
    None,
    {},
    [],
]

RECURSE_PROGRAMS = [
    "[..]",
    "[.. | numbers]",
    ".. | numbers",
    "[.. | strings]",
    "[.. | booleans]",
    "[.. | nulls]",
    "[.. | arrays]",
    "[.. | objects]",
    "[.. | iterables]",
    "[.. | scalars]",
    "[recurse]",
    "[.a | ..]",
    '[.. | select(type == "number")]',
]


def _deep_doc(depth, leaf=99):
    v = leaf
    for _ in range(depth):
        v = [v]
    return v


def _deep_obj(depth, leaf=99):
    # object nesting, so field navigation (.a) stays legal on the deep
    # row in BOTH tiers (the interpreter errors on .a over an array —
    # jq-correct strictness the lenient columnar tier doesn't share)
    v = leaf
    for _ in range(depth):
        v = {"a": v}
    return v


def test_recurse_compiles_with_flag():
    for prog in RECURSE_PROGRAMS:
        c = try_compile(prog)
        assert c is not None and c.uses_recurse, prog
    # type filters alone don't force the recurse row-split
    c = try_compile(".k | numbers")
    assert c is not None and not c.uses_recurse


def test_recurse_dual_backend_conformance(spark):
    docs = RECURSE_DOCS + [_deep_obj(20)]  # last doc exceeds the bound
    rows = [(i, json.dumps(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "i int, value string")
    mismatches = []
    for prog in RECURSE_PROGRAMS:
        expect = _interp_rows(prog, docs)
        got = {r["i"]: r["value"] for r in JqProcessor(prog)(df).collect()}
        for i in range(len(docs)):
            e = expect.get(i)
            if e == "<error>":
                continue
            if not _json_equal(e, got.get(i)):
                mismatches.append((prog, i, e, got.get(i)))
    assert not mismatches, mismatches[:10]


def test_recurse_deep_doc_is_complete_not_truncated(spark):
    """A document deeper than RECURSE_MAX_DEPTH must take the interpreter
    row-split and come back COMPLETE — the bound picks the tier, never
    truncates the answer."""
    from benthos_spark.functions.jq_columnar import RECURSE_MAX_DEPTH

    deep = _deep_doc(RECURSE_MAX_DEPTH + 8)
    df = spark.createDataFrame([(1, json.dumps(deep))], "i int, value string")
    out = JqProcessor("[.. | numbers]")(df).collect()
    assert json.loads(out[0]["value"]) == [99]
    out2 = JqProcessor("[..]")(df).collect()
    # pre-order: every nesting level once, then the leaf
    assert len(json.loads(out2[0]["value"])) == RECURSE_MAX_DEPTH + 8 + 1


def test_recurse_depth_exceeded_boundary(spark):
    from pyspark.sql import functions as F

    from benthos_spark.functions.jq_columnar import (
        RECURSE_MAX_DEPTH,
        recurse_depth_exceeded,
    )

    docs = [_deep_doc(RECURSE_MAX_DEPTH), _deep_doc(RECURSE_MAX_DEPTH + 1)]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i int, value string"
    )
    v = F.parse_json(F.col("value"))
    got = {
        r["i"]: r["deep"]
        for r in df.select("i", recurse_depth_exceeded(v).alias("deep")).collect()
    }
    assert got == {0: False, 1: True}


def test_recurse_shallow_rows_stay_jvm_side(spark):
    """With `..`, the plan's compiled branch carries the shallow rows; the
    interpreter branch exists but receives only rows past the depth bound
    — on an all-shallow input every row flows JVM-side."""
    deep = _deep_doc(30)
    df = spark.createDataFrame(
        [(1, '{"a":[1,2]}'), (2, json.dumps(deep))], "i int, value string"
    )
    out = {r["i"]: r["value"] for r in JqProcessor("[.. | numbers]")(df).collect()}
    assert json.loads(out[1]) == [1, 2]
    assert json.loads(out[2]) == [99]
