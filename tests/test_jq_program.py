"""Full jq-program interpreter tests (processor_jq.go:26 semantics:
replace-with-result, empty→filter, multiple→array, $metadata)."""

from __future__ import annotations

import json

import pytest

from benthos_spark.functions.jq_program import JqError, JqProcessor, JqProgram


def run(src, doc, meta=None):
    return JqProgram(src).run(doc, meta)


def test_identity_and_paths():
    assert run(".", {"a": 1}) == [{"a": 1}]
    assert run(".a.b", {"a": {"b": 7}}) == [7]
    assert run(".a[1]", {"a": [10, 20]}) == [20]
    assert run('.["weird key"]', {"weird key": 3}) == [3]
    assert run(".missing", {}) == [None]


def test_pipe_and_comma():
    assert run(".a | .b", {"a": {"b": 5}}) == [5]
    assert run(".a, .b", {"a": 1, "b": 2}) == [1, 2]


def test_iteration_stream():
    assert run(".[]", [1, 2, 3]) == [1, 2, 3]
    assert run(".items[] | .v", {"items": [{"v": 1}, {"v": 2}]}) == [1, 2]


def test_select_filters_stream():
    assert run(".[] | select(. > 2)", [1, 2, 3, 4]) == [3, 4]
    assert run('select(.status == "ok")', {"status": "no"}) == []


def test_map_and_collect():
    assert run("map(. * 2)", [1, 2]) == [[2, 4]]
    assert run("[.[] | . + 1]", [1, 2]) == [[2, 3]]


def test_object_construction():
    assert run('{x: .a, ("k" + "2"): .b}', {"a": 1, "b": 2}) == [{"x": 1, "k2": 2}]
    assert run("{a}", {"a": 9, "b": 1}) == [{"a": 9}]


def test_arithmetic_and_comparison():
    assert run(". + 1", 2) == [3]
    assert run('"a" + "b"', None) == ["ab"]
    assert run("[1,2] + [3]", None) == [[1, 2, 3]]
    assert run('{"a":1} + {"b":2}', None) == [{"a": 1, "b": 2}]
    assert run(".a < .b and .a != 0", {"a": 1, "b": 2}) == [True]
    assert run('"abc" / "b"', None) == [["a", "c"]]


def test_builtins():
    assert run("length", [1, 2, 3]) == [3]
    assert run("keys", {"b": 1, "a": 2}) == [["a", "b"]]
    assert run("add", [1, 2, 3]) == [6]
    assert run("sort_by(.v) | map(.v)", [{"v": 3}, {"v": 1}]) == [[1, 3]]
    assert run("unique", [3, 1, 3]) == [[1, 3]]
    assert run('join(",")', ["a", "b"]) == ["a,b"]
    assert run("to_entries | map(.key)", {"x": 1}) == [["x"]]
    assert run("from_entries", [{"key": "a", "value": 1}]) == [{"a": 1}]
    assert run("flatten", [[1, [2]], [3]]) == [[1, 2, 3]]
    assert run("flatten(1)", [[1, [2]], [3]]) == [[1, [2], 3]]
    assert run("tostring", {"a": 1}) == ['{"a":1}']
    assert run("tonumber", "42") == [42]
    assert run('test("^ab")', "abc") == [True]
    assert run("range(3)", None) == [0, 1, 2]


def test_if_then_else():
    assert run('if . > 5 then "big" elif . > 2 then "mid" else "small" end', 7) == ["big"]
    assert run('if . > 5 then "big" elif . > 2 then "mid" else "small" end', 3) == ["mid"]
    assert run('if . > 5 then "big" elif . > 2 then "mid" else "small" end', 1) == ["small"]


def test_alternative_and_try():
    assert run(".a // 5", {}) == [5]
    assert run(".a // 5", {"a": 2}) == [2]
    assert run("(.a | .b)?", {"a": 3}) == []  # error suppressed


def test_errors():
    with pytest.raises(JqError):
        run(".a.b", {"a": 3})
    with pytest.raises(JqError):
        run("nosuchfn", {})


def test_metadata_variable():
    assert run("$metadata.topic", {}, {"topic": "t1"}) == ["t1"]


def test_string_interpolation():
    assert run(r'"id-\(.a)"', {"a": 5}) == ["id-5"]
    assert run(r'"\(.a)-\(.b.c)!"', {"a": "x", "b": {"c": 2.5}}) == ["x-2.5!"]
    # generator part multiplies the output stream (gojq semantics)
    assert run(r'"v=\(1,2)"', None) == ["v=1", "v=2"]
    # non-string parts render as compact JSON; escapes still decode
    assert run(r'"j=\([.a, {k: .a}])"', {"a": 1}) == ['j=[1,{"k":1}]']
    assert run('"esc\\n\\(.a)"', {"a": True}) == ["esc\ntrue"]
    assert run(r'"nested \((.a + 1) * 2)"', {"a": 3}) == ["nested 8"]
    with pytest.raises(JqError):
        run(r'"\(.a"', {})  # unterminated interpolation


def test_multiple_outputs_and_generators():
    assert run(".[] , .[]", [1]) == [1, 1]
    assert run("[range(2) | . * 10]", None) == [[0, 10]]


def test_processor_semantics(spark):
    df = spark.createDataFrame(
        [
            ('{"user": {"name": "ann"}, "n": 3}',),
            ('{"user": {"name": "bob"}, "n": 9}',),
            ('{"user": {"name": "eve"}, "n": 1}',),
        ],
        "value string",
    )
    # replace message with transformed doc; filter n < 2
    proc = JqProcessor('select(.n >= 2) | {who: .user.name, nn: (.n * 2)}')
    rows = sorted(json.loads(r["value"])["who"] for r in proc(df).collect())
    assert rows == ["ann", "bob"]
    out = {json.loads(r["value"])["who"]: json.loads(r["value"])["nn"] for r in proc(df).collect()}
    assert out == {"ann": 6, "bob": 18}


def test_processor_multiple_outputs_become_array(spark):
    df = spark.createDataFrame([('{"xs": [1, 2, 3]}',)], "value string")
    out = JqProcessor(".xs[]")(df).collect()
    assert json.loads(out[0]["value"]) == [1, 2, 3]
