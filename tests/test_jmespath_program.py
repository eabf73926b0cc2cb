"""JMESPath interpreter tests — examples from the public spec/tutorial
(jmespath.org) plus processor semantics (processor_jmespath.go:25)."""

from __future__ import annotations

import json

import pytest

from benthos_spark.functions.jmespath_program import (
    JmesError,
    JmesProgram,
    JmespathProcessor,
)


def run(src, doc):
    return JmesProgram(src).search(doc)


def test_basic_paths():
    assert run("a", {"a": 1}) == 1
    assert run("a.b.c", {"a": {"b": {"c": 7}}}) == 7
    assert run("a.missing", {"a": {}}) is None
    assert run('"weird key"', {"weird key": 2}) == 2


def test_index_and_slice():
    assert run("[1]", [10, 20, 30]) == 20
    assert run("[-1]", [10, 20, 30]) == 30
    assert run("a[0]", {"a": [5]}) == 5
    assert run("[0:2]", [1, 2, 3, 4]) == [1, 2]
    assert run("[::2]", [1, 2, 3, 4]) == [1, 3]


def test_list_projection():
    doc = {"people": [{"first": "James"}, {"first": "Jacob"}, {"last": "x"}]}
    assert run("people[*].first", doc) == ["James", "Jacob"]
    # spec: projections drop null results
    assert run("people[:2].first", {"people": [{"first": "a"}, {"first": "b"}]}) == ["a", "b"]


def test_object_projection():
    doc = {"ops": {"a": {"numArgs": 2}, "b": {"numArgs": 3}}}
    got = run("ops.*.numArgs", doc)
    assert sorted(got) == [2, 3]


def test_flatten():
    doc = {"reservations": [{"instances": [1, 2]}, {"instances": [3]}]}
    assert run("reservations[*].instances", doc) == [[1, 2], [3]]
    assert run("reservations[].instances[]", doc) == [1, 2, 3]
    assert run("[]", [[1, [2]], [3]]) == [1, [2], 3]


def test_filter_projection():
    doc = {"machines": [
        {"name": "a", "state": "running"},
        {"name": "b", "state": "stopped"},
        {"name": "c", "state": "running"},
    ]}
    assert run("machines[?state=='running'].name", doc) == ["a", "c"]
    assert run("machines[?state!='running'] | [0].name", doc) == "b"


def test_pipe_stops_projection():
    doc = {"people": [{"first": "James"}, {"first": "Jacob"}]}
    assert run("people[*].first | [0]", doc) == "James"
    # without pipe, [0] inside projection applies per element
    assert run("people[*].first[0]", doc) == []


def test_nested_projections():
    # the jmespath.org tutorial example: nested [*] projections yield
    # NESTED lists (each inner projection evaluates per outer element);
    # [] flatten is what merges them
    doc = {"reservations": [
        {"instances": [{"state": "running"}, {"state": "stopped"}]},
        {"instances": [{"state": "terminated"}, {"state": "running"}]},
    ]}
    assert run("reservations[*].instances[*].state", doc) == [
        ["running", "stopped"],
        ["terminated", "running"],
    ]
    assert run("reservations[].instances[].state", doc) == [
        "running", "stopped", "terminated", "running",
    ]
    # a projection whose RHS dies on every element is empty, not null
    assert run("a[*].b[*].c", {"a": [{"b": "no"}]}) == []


def test_projection_null_dropping():
    # identity-RHS projections drop nulls; flatten alone keeps them but
    # the projection it creates drops them
    assert run("[*]", [None, 1, False, "x"]) == [1, False, "x"]
    assert run("[]", [[1, 2], [3], 4, None, [None]]) == [1, 2, 3, 4]


def test_filter_then_flatten():
    # flatten binds looser than a filter projection: [] applies to the
    # materialized filter output, then re-projects
    doc = {"a": [{"x": 2, "y": [1, 2]}, {"x": 0, "y": [3]}, {"x": 5, "y": [4]}]}
    assert run("a[?x > `1`][].y", doc) == [[1, 2], [4]]
    assert run("a[?x > `1`].y[]", doc) == [1, 2, 4]


def test_slice_rhs_projection():
    # a nested [*] inside a slice projection's RHS applies per element:
    # dict elements are invalid for a list projection and drop
    assert run("a[0:2][*].x", {"a": [{"x": 1}, {"x": 2}, {"x": 3}]}) == []
    assert run("*.n", {"a": {"n": 1}, "b": {"n": 2}}) == [1, 2]


def test_multiselect():
    doc = {"people": [{"name": "a", "age": 20, "other": "x"}, {"name": "b", "age": 30}]}
    assert run("people[*].{Name: name, Age: age}", doc) == [
        {"Name": "a", "Age": 20},
        {"Name": "b", "Age": 30},
    ]
    assert run("people[0].[name, age]", doc) == ["a", 20]


def test_literals_and_raw_strings():
    assert run("`5`", {}) == 5
    assert run("'raw'", {}) == "raw"
    assert run("a == `[1, 2]`", {"a": [1, 2]}) is True


def test_boolean_logic():
    assert run("a && b", {"a": 1, "b": 2}) == 2
    assert run("a || b", {"a": None, "b": 2}) == 2
    assert run("!a", {"a": []}) is True
    assert run("a > b", {"a": 3, "b": 1}) is True
    assert run("a > b", {"a": "x", "b": "y"}) is None  # non-numbers compare to null


def test_functions():
    assert run("length(@)", [1, 2, 3]) == 3
    assert run("max_by(items, &age).name", {"items": [{"age": 1, "name": "a"}, {"age": 9, "name": "b"}]}) == "b"
    assert run("sort_by(@, &n)[*].n", [{"n": 3}, {"n": 1}]) == [1, 3]
    assert run("join(', ', @)", ["a", "b"]) == "a, b"
    assert run("to_number('12')", {}) == 12
    assert run("contains(@, 'b')", ["a", "b"]) is True
    assert run("starts_with(@, 'ab')", "abc") is True
    assert run("merge(@, `{\"b\": 2}`)", {"a": 1}) == {"a": 1, "b": 2}
    assert run("sum(@)", [1, 2, 3]) == 6
    assert run("type(@)", {}) == "object"
    assert run("not_null(a, b, c)", {"b": 7}) == 7
    assert run("map(&x, @)", [{"x": 1}, {"x": 2}]) == [1, 2]
    assert run("avg(@)", [2, 4]) == 3


def test_nested_spec_example():
    # the jmespath.org front-page example
    doc = {
        "locations": [
            {"name": "Seattle", "state": "WA"},
            {"name": "New York", "state": "NY"},
            {"name": "Bellevue", "state": "WA"},
            {"name": "Olympia", "state": "WA"},
        ]
    }
    got = run("locations[?state == 'WA'].name | sort(@) | {WashingtonCities: join(', ', @)}", doc)
    assert got == {"WashingtonCities": "Bellevue, Olympia, Seattle"}


def test_errors():
    with pytest.raises(JmesError):
        run("length(`1`)", {})
    with pytest.raises(JmesError):
        JmesProgram("a.[")


def test_processor(spark):
    df = spark.createDataFrame(
        [('{"people": [{"name": "ann", "age": 3}, {"name": "bob", "age": 9}]}',)],
        "value string",
    )
    out = JmespathProcessor("people[?age > `5`].name")(df).collect()
    assert json.loads(out[0]["value"]) == ["bob"]
