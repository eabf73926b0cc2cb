"""Bloblang conformance: cases ported from the reference's own parser
test table (internal/bloblang/parser/mapping_parser_test.go
TestMappings) — input content + mapping → expected output content/meta.

Contents are JSON-parsed when possible (the reference's lazy
bytes↔structured duality); outputs compare as parsed values so key
order doesn't matter, exactly like the Go test's message comparison.
"""

from __future__ import annotations

import json

import pytest

from benthos_spark.bloblang.interp import DELETED, Executor

# (name, mapping, input_content, input_meta, want_content, want_meta)
# want_meta None = don't check; content strings are parsed as JSON when
# they parse, else compared raw.
CASES = [
    ("compressed arithmetic", "this.foo+this.bar", '{"foo":5,"bar":3}', None, "8", None),
    ("compressed arithmetic 2", "this.foo-this.bar", '{"foo":5,"bar":3}', None, "2", None),
    (
        "simple json map",
        'foo = foo + 2\nbar = "test1"\nzed = deleted()',
        '{"foo":10,"zed":"gone"}',
        None,
        '{"bar":"test1","foo":12}',
        None,
    ),
    (
        "simple json map 2",
        '\nfoo = foo + 2\n\nbar = "test1"\n\nzed = deleted()\n',
        '{"foo":10,"zed":"gone"}',
        None,
        '{"bar":"test1","foo":12}',
        None,
    ),
    (
        "simple json map 3",
        '\n  foo = foo + 2\n\n   bar = "test1"\n\nzed = deleted()\n  ',
        '{"foo":10,"zed":"gone"}',
        None,
        '{"bar":"test1","foo":12}',
        None,
    ),
    ("simple root query", '{"result": foo + 2}', '{"foo":10}', None, '{"result":12}', None),
    ("simple root query 2", "foo.bar", '{"foo":{"bar":10}}', None, "10", None),
    ("simple root query 3", "root = foo.bar", '{"foo":{"bar":10}}', None, "10", None),
    (
        "simple json map with comments",
        '\n# Here\'s a comment\nfoo = foo + 2 # And here\n\nbar = "test1"         # And one here\n\n# And here\nzed = deleted()\n',
        '{"foo":10,"zed":"gone"}',
        None,
        '{"bar":"test1","foo":12}',
        None,
    ),
    (
        "test mapping metadata and json",
        'meta foo = foo\nbar.baz = meta("bar baz")\nmeta "bar baz" = deleted()',
        '{"foo":"bar"}',
        {"bar baz": "test1"},
        '{"bar":{"baz":"test1"}}',
        {"foo": "bar"},
    ),
    (
        "test mapping metadata and json 2",
        'meta = foo\nmeta "bar baz" = "test1"',
        '{"foo":{"bar":"baz"}}',
        None,
        '{"foo":{"bar":"baz"}}',
        {"bar": "baz", "bar baz": "test1"},
    ),
    (
        "test mapping delete and json",
        'meta foo = foo\nbar.baz = meta("bar baz")\nmeta = deleted()',
        '{"foo":"bar"}',
        {"bar baz": "test1"},
        '{"bar":{"baz":"test1"}}',
        {},
    ),
    (
        "test variables and json",
        'let foo = foo\nlet "bar baz" = "test1"\nbar.baz = var("bar baz")',
        '{"foo":"bar"}',
        None,
        '{"bar":{"baz":"test1"}}',
        None,
    ),
    (
        "map json root",
        'root = {\n  "foo": "this is a literal map"\n}',
        '{"zed":"gone"}',
        None,
        '{"foo":"this is a literal map"}',
        None,
    ),
    (
        "map json root 2",
        'root = {\n  "foo": "this is a literal map"\n}\nbar = "this is another thing"',
        '{"zed":"gone"}',
        None,
        '{"bar":"this is another thing","foo":"this is a literal map"}',
        None,
    ),
    (
        "test mapping metadata without json",
        'meta foo = "foo"\nmeta bar = 5 + 2',
        "this isn't json",
        None,
        "this isn't json",
        {"foo": "foo", "bar": 7},
    ),
    (
        "field called root",
        'root.root = "not set at root"',
        "this isn't json",
        None,
        '{"root":"not set at root"}',
        None,
    ),
    (
        "quoted paths",
        '\nmeta "foo bar" = "hello world"\nroot."bar baz".test = 5 + 2',
        "this isn't json",
        None,
        '{"bar baz":{"test":7}}',
        {"foo bar": "hello world"},
    ),
    (
        "test mapping to string",
        'root = "static string"',
        '{"this":"is a json doc"}',
        None,
        "static string",
        None,
    ),
    (
        "test map without mapping",
        'map foo {\n  foo = "static foo"\n}',
        '{"foo":"bar"}',
        None,
        '{"foo":"bar"}',
        None,
    ),
    (
        "test maps",
        'map foo {\n  foo = "static foo"\n  bar = this\n  applied = ["foo"]\n}\nroot = this.apply("foo")',
        '{"outer":{"inner":"hello world"}}',
        None,
        '{"applied":["foo"],"bar":{"outer":{"inner":"hello world"}},"foo":"static foo"}',
        None,
    ),
    (
        "test nested maps",
        'map foo {\n  let tmp = this.apply("bar")\n  foo = var("tmp")\n  applied = var("tmp").applied.merge("foo")\n  foo.applied = deleted()\n}\nmap bar {\n  static = "this is valid"\n  bar = this\n  applied = ["bar"]\n}\nroot = this.apply("foo")',
        '{"outer":{"inner":"hello world"}}',
        None,
        '{"applied":["bar","foo"],"foo":{"bar":{"outer":{"inner":"hello world"}},"static":"this is valid"}}',
        None,
    ),
    ("test single root mapping", '"foo" == "bar"', "", None, "false", None),
    ("test single root mapping with blobl shebang", '#!blobl\n"foo" == "bar"', "", None, "false", None),
]


def _parse(content):
    if content == "":
        return ""
    try:
        return json.loads(content)
    except (json.JSONDecodeError, TypeError):
        return content


@pytest.mark.parametrize("name,mapping,inp,in_meta,want,want_meta", CASES, ids=[c[0] for c in CASES])
def test_reference_mapping_case(name, mapping, inp, in_meta, want, want_meta):
    ex = Executor(mapping)
    out, meta = ex.map_part(_parse(inp), dict(in_meta or {}))
    assert out is not DELETED
    got = out
    expected = _parse(want)
    if isinstance(expected, bool) or expected in (True, False):
        assert got == expected
    else:
        assert got == expected, f"{name}: {got!r} != {expected!r}"
    if want_meta is not None:
        assert meta == want_meta, f"{name} meta: {meta!r} != {want_meta!r}"


def test_imported_map_from_file(tmp_path):
    # TestMappings "test imported map"
    f = tmp_path / "foo_map.blobl"
    f.write_text('map foo {\n  foo = "this is valid"\n  nested = this\n}')
    src = f'import "{f}"\n\nroot = this.apply("foo")'
    out, _ = Executor(src).map_part({"outer": {"inner": "hello world"}})
    assert out == {"foo": "this is valid", "nested": {"outer": {"inner": "hello world"}}}


def test_parse_failures_from_reference_table():
    # mapping_parser_test.go TestMappingErrors — a sample of the
    # must-fail inputs
    from benthos_spark.bloblang.parser import BloblangParseError, parse_mapping

    for bad in (
        "foo = bar bar = baz",
        "!foo = bar",
        "foo = blah.",
        "let = blah",
    ):
        with pytest.raises(BloblangParseError):
            parse_mapping(bad)
