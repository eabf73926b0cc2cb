"""Bloblang mapping-language tests.

Layer 1: parser + interpreter unit tests (≙ the reference's
mapping_parser_test.go / query_parser_test.go colocated tests).
Layer 2: the reference's own golden suites from config/test/bloblang/
(cities, csv_formatter, github_releases) run through the interpreter —
the `benthos test` analogue.
Layer 3: the Column tier on real DataFrames — the same source compiles
to a fused JVM projection; dynamic fallback via mapInPandas.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.bloblang import (
    BloblangMapping,
    BloblangMutation,
    BloblangParseError,
    Executor,
    compile_mapping,
    parse_mapping,
)
from benthos_spark.bloblang.interp import DELETED, BloblangError


def run(src, doc, meta=None, mutate=False):
    out, m = Executor(src).map_part(doc, meta, mutate=mutate)
    return out


# -- layer 1: parser + interpreter ------------------------------------------


def test_basic_assignment():
    assert run("root.x = this.a + 1", {"a": 2}) == {"x": 3}


def test_nested_paths():
    out = run('root.a.b.c = this.v\nroot.a.d = "y"', {"v": 1})
    assert out == {"a": {"b": {"c": 1}, "d": "y"}}


def test_root_prefix_optional():
    assert run("x = this.a", {"a": 5}) == {"x": 5}


def test_single_root_query():
    assert run("this.a.uppercase()", {"a": "hi"}) == "HI"


def test_number_semantics_div_always_float():
    assert run("root.x = 10 / 4", {}) == {"x": 2.5}
    assert run("root.x = 3 * 2", {}) == {"x": 6}
    assert isinstance(run("root.x = 3 * 2", {})["x"], int)
    assert run("root.x = 7 % 3", {}) == {"x": 1}


def test_string_concat_plus():
    assert run('root.x = "a" + "b" + "c"', {}) == {"x": "abc"}


def test_precedence_reference_four_pass():
    # {* / % |} then {+ -} then cmp then bool — arithmetic.go:432
    assert run("root.x = 2 + 3 * 4", {}) == {"x": 14}
    assert run("root.x = 2 + 3 * 4 == 14 && true", {}) == {"x": True}
    assert run("root.x = 10 - 2 - 3", {}) == {"x": 5}


def test_pipe_coalesce():
    assert run('root.x = this.missing | "fallback"', {"a": 1}) == {"x": "fallback"}
    assert run('root.x = this.a | "fallback"', {"a": 1}) == {"x": 1}


def test_if_else_expression():
    src = 'root.x = if this.v > 5 { "big" } else if this.v > 2 { "mid" } else { "small" }'
    assert run(src, {"v": 9}) == {"x": "big"}
    assert run(src, {"v": 3}) == {"x": "mid"}
    assert run(src, {"v": 1}) == {"x": "small"}


def test_if_without_else_skips_assignment():
    assert run("root.x = if this.v > 5 { this.v }\nroot.y = 1", {"v": 1}) == {"y": 1}


def test_match_literal_and_predicate_cases():
    # a match target rebinds `this` for every case (NewMatchFunction)
    src = """root.t = match this.status {
  "open" => "o"
  this == "closed" => "c"
  _ => "other"
}"""
    assert run(src, {"status": "open"}) == {"t": "o"}
    assert run(src, {"status": "closed"}) == {"t": "c"}
    assert run(src, {"status": "x"}) == {"t": "other"}


def test_match_without_target_uses_outer_this():
    src = """root.t = match {
  this.code >= 500 => "err"
  this.status == "open" => "o"
  _ => "other"
}"""
    assert run(src, {"status": "open", "code": 200}) == {"t": "o"}
    assert run(src, {"status": "x", "code": 503}) == {"t": "err"}
    assert run(src, {"status": "x", "code": 200}) == {"t": "other"}


def test_match_with_target_rebinds_this():
    src = 'root.x = match this.meta { this.level == "hi" => this.level.uppercase(), _ => "?" }'
    assert run(src, {"meta": {"level": "hi"}}) == {"x": "HI"}


def test_let_variables():
    src = "let n = this.a * 2\nroot.x = $n + 1\nroot.y = $n"
    assert run(src, {"a": 5}) == {"x": 11, "y": 10}


def test_meta_assignment_and_read():
    ex = Executor('meta topic = "t1"\nroot.x = @topic')
    out, meta = ex.map_part({}, {})
    assert meta["topic"] == "t1" and out == {"x": "t1"}


def test_deleted_field_and_message():
    out = run("root = this\nroot.b = deleted()", {"a": 1, "b": 2}, mutate=False)
    assert out == {"a": 1}
    ex = Executor("root.keep = true\nroot = if this.drop { deleted() }")
    out, _ = ex.map_part({"drop": True})
    assert out is DELETED
    out, _ = ex.map_part({"drop": False})
    assert out == {"keep": True}


def test_method_chains_and_lambdas():
    src = 'root.v = this.xs.filter(x -> x.n > 1).map_each(x -> x.n * 10).sort().join(",")'
    # join requires strings
    src = 'root.v = this.xs.filter(x -> x.n > 1).map_each(x -> (x.n * 10).string()).sort().join(",")'
    assert run(src, {"xs": [{"n": 1}, {"n": 3}, {"n": 2}]}) == {"v": "20,30"}


def test_map_apply():
    src = """map parts {
  root.first = this.split("-").index(0)
  root.n = this.length()
}
root.out = this.id.apply("parts")"""
    assert run(src, {"id": "abc-def"}) == {"out": {"first": "abc", "n": 7}}


def test_object_and_array_literals():
    src = 'root = {"a": [1, 2, this.v], "b": {"c": true}}'
    assert run(src, {"v": 3}) == {"a": [1, 2, 3], "b": {"c": True}}


def test_numeric_index_path():
    assert run("root.x = this.0.name", [{"name": "n0"}, {"name": "n1"}]) == {"x": "n0"}


def test_negation_and_not():
    assert run("root.x = !this.flag\nroot.y = -this.n", {"flag": False, "n": 4}) == {
        "x": True,
        "y": -4,
    }


def test_catch_and_or():
    assert run('root.x = this.s.number().catch(-1)', {"s": "abc"}) == {"x": -1}
    assert run('root.x = this.miss.or(9)', {}) == {"x": 9}


def test_fold():
    src = "root.total = this.ns.fold(0, item -> item.tally + item.value)"
    assert run(src, {"ns": [1, 2, 3]}) == {"total": 6}


def test_parse_errors():
    with pytest.raises(BloblangParseError):
        parse_mapping("root.x = = 1")
    with pytest.raises(BloblangParseError):
        parse_mapping("root.x = this.foo.")


def test_comments_and_blank_lines():
    src = "# header\nroot.a = 1\n\n# more\nroot.b = 2 # not a comment marker inside? no\n"
    out = run("# header\nroot.a = 1\n\nroot.b = 2\n", {})
    assert out == {"a": 1, "b": 2}


def test_quoted_path_segment():
    assert run('root."weird key" = 1', {}) == {"weird key": 1}


# -- layer 2: reference golden suites ---------------------------------------

GOLDEN_DIR = "/root/reference/config/test/bloblang"


def test_golden_cities():
    src = open(f"{GOLDEN_DIR}/cities.blobl").read()
    doc = {
        "locations": [
            {"name": "Seattle", "state": "WA"},
            {"name": "New York", "state": "NY"},
            {"name": "Bellevue", "state": "WA"},
            {"name": "Olympia", "state": "WA"},
        ]
    }
    assert run(src, doc) == {"Cities": "Bellevue, Olympia, Seattle"}


def test_golden_csv_formatter():
    src = open(f"{GOLDEN_DIR}/csv_formatter.blobl").read()
    doc = [
        {"foo": "hello world", "baz": 110, "bar": "bar value", "buz": False},
        {"foo": "hello world 2", "bar": "bar value 2", "baz": 220, "buz": True},
        {"foo": "hello world 3", "bar": "bar value 3", "baz": 330, "buz": True},
    ]
    expect = (
        "bar,baz,buz,foo\n"
        "bar value,110,false,hello world\n"
        "bar value 2,220,true,hello world 2\n"
        "bar value 3,330,true,hello world 3"
    )
    assert run(src, doc) == expect


def test_golden_github_releases():
    src = open(f"{GOLDEN_DIR}/github_releases.blobl").read()
    doc = [
        {
            "tag_name": "1.23.4",
            "assets": [
                {"name": "benthos-lambda_1.23.4_linux_amd64.zip", "download_count": 123},
                {"name": "benthos_1.23.4_checksums.txt", "download_count": 456},
                {"name": "benthos_1.23.4_darwin_amd64.tar.gz", "download_count": 789},
                {"name": "benthos_1.23.4_linux_amd64.tar.gz", "download_count": 101112},
                {"name": "benthos_1.23.4_linux_arm64.tar.gz", "download_count": 131415},
            ],
        }
    ]
    assert run(src, doc) == [
        {"source": "github", "dist": "lambda_linux_amd64", "download_count": 123, "version": "1.23.4"},
        {"source": "github", "dist": "darwin_amd64", "download_count": 789, "version": "1.23.4"},
        {"source": "github", "dist": "linux_amd64", "download_count": 101112, "version": "1.23.4"},
        {"source": "github", "dist": "linux_arm64", "download_count": 131415, "version": "1.23.4"},
    ]


# -- layer 3: Column tier on DataFrames -------------------------------------


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "alpha", 10.0, ["x", "y"]), (2, "beta", 20.0, ["z"]), (3, "gamma", 30.0, [])],
        "id int, name string, score double, tags array<string>",
    )


def test_column_tier_basic(df):
    proc = BloblangMapping('root.up = this.name.uppercase()\nroot.double = this.score * 2')
    out = proc(df)
    assert out.columns == ["up", "double"]
    rows = {r["up"]: r["double"] for r in out.collect()}
    assert rows == {"ALPHA": 20.0, "BETA": 40.0, "GAMMA": 60.0}


def test_column_tier_is_jvm_only(df):
    proc = BloblangMapping("root.x = this.score + 1")
    plan = proc(df)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "Python" not in plan


def test_column_tier_mutation_keeps_columns(df):
    proc = BloblangMutation('root.tier = if this.score > 15 { "hi" } else { "lo" }')
    out = proc(df)
    assert set(out.columns) == {"id", "name", "score", "tags", "tier"}
    assert {r["id"]: r["tier"] for r in out.collect()} == {1: "lo", 2: "hi", 3: "hi"}


def test_column_tier_filter_idiom(df):
    proc = BloblangMutation("root = if this.score < 15 { deleted() }")
    assert proc(df).count() == 2


def test_column_tier_lambda_over_typed_array(df):
    proc = BloblangMapping('root.n = this.tags.filter(t -> t != "x").length()')
    assert {r["n"] for r in proc(df).collect()} == {1, 0}


def test_column_tier_match(df):
    proc = BloblangMapping(
        'root.label = match this.name { "alpha" => "A", this.length() > 4 => "long", _ => "?" }'
    )
    got = [r["label"] for r in proc(df).orderBy(F.col("label")).collect()]
    assert sorted(got) == ["?", "A", "long"]


def test_column_tier_let_and_meta(df):
    proc = BloblangMutation('let s = this.score * 10\nmeta src = "unit"\nroot.big = $s')
    out = proc(df)
    row = out.filter("id = 1").collect()[0]
    assert row["big"] == 100.0 and row["_meta"]["src"] == "unit"


def test_column_tier_nested_assignment(df):
    proc = BloblangMapping("root.agg.sum = this.score + 1\nroot.agg.id = this.id")
    row = proc(df).filter("agg.id = 2").collect()[0]
    assert row["agg"]["sum"] == 21.0


def test_dynamic_fallback_restructures_json(spark):
    docs = [
        {"locations": [{"name": "Seattle", "state": "WA"}, {"name": "Olympia", "state": "WA"}, {"name": "NYC", "state": "NY"}]},
        {"locations": [{"name": "Austin", "state": "WA"}]},
    ]
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "value string")
    src = open(f"{GOLDEN_DIR}/cities.blobl").read()
    proc = BloblangMapping(src)
    out = proc(df)
    vals = sorted(json.loads(r["value"])["Cities"] for r in out.collect())
    assert vals == ["Austin", "Olympia, Seattle"]


def test_dynamic_fallback_typed_output(spark):
    df = spark.createDataFrame(
        [('{"a": 3, "b": "x"}',), ('{"a": 5, "b": "y"}',)], "value string"
    )
    proc = BloblangMapping(
        "root.total = this.a * 2\nroot.tag = this.b.uppercase()",
        output_schema="total long, tag string",
    )
    got = {r["total"]: r["tag"] for r in proc(df).collect()}
    assert got == {6: "X", 10: "Y"}


def test_golden_literals(monkeypatch):
    """literals.yaml: if-without-else (Nothing) and deleted() inside
    object/array literals omit the key/entry."""
    src = """root = {
  "1": "1",
  "2": if env("FOO") == "ENABLED" {
    "foo"
  },
  "3": if this.count > 5 {
    this.count
  } else {
    deleted()
  },
  "4": [
    "1",
    if env("FOO") == "ENABLED" {
      "foo"
    },
    if this.count > 5 {
      this.count
    } else {
      deleted()
    },
    "4"
  ]
}"""
    monkeypatch.setenv("FOO", "ENABLED")
    assert run(src, {"count": 10}) == {"1": "1", "2": "foo", "3": 10, "4": ["1", "foo", 10, "4"]}
    assert run(src, {"count": 3}) == {"1": "1", "2": "foo", "4": ["1", "foo", "4"]}
    monkeypatch.setenv("FOO", "DISABLED")
    assert run(src, {"count": 10}) == {"1": "1", "3": 10, "4": ["1", 10, "4"]}
    assert run(src, {"count": 3}) == {"1": "1", "4": ["1", "4"]}


def test_golden_boolean_operands():
    """boolean_operands.yaml: short-circuit &&/|| with catch on missing
    operands."""
    src = 'ands = (first && second).catch("failed")\nors = (first || second).catch("failed")'
    assert run(src, {"none": "of the target values"}) == {"ands": "failed", "ors": "failed"}
    assert run(src, {"first": True}) == {"ands": "failed", "ors": True}
    assert run(src, {"first": False}) == {"ands": False, "ors": "failed"}
    assert run(src, {"first": True, "second": True}) == {"ands": True, "ors": True}


def test_golden_walk_json():
    """walk_json.yaml: recursive named map over arbitrary JSON via
    match-on-type + apply (implicit-context map_each args)."""
    src = """map unescape_values {
  root = match {
    this.type() == "object" => this.map_each(this.value.apply("unescape_values")),
    this.type() == "array" => this.map_each(this.apply("unescape_values")),
    this.type() == "string" => this.unescape_html(),
    this.type() == "bytes" => this.unescape_html(),
    _ => this,
  }
}
root = this.apply("unescape_values")"""
    assert run(src, "foo &amp; bar") == "foo & bar"
    assert run(src, ["foo &amp; bar", 10, "1 &lt; 2"]) == ["foo & bar", 10, "1 < 2"]
    assert run(src, {"first": "foo &amp; bar", "second": 10, "third": "1 &lt; 2"}) == {
        "first": "foo & bar", "second": 10, "third": "1 < 2"
    }
    assert run(src, {"first": {"nested": "foo &amp; bar"}, "second": 10,
                     "third": ["1 &lt; 2", {"also_nested": "2 &gt; 1"}]}) == {
        "first": {"nested": "foo & bar"}, "second": 10,
        "third": ["1 < 2", {"also_nested": "2 > 1"}],
    }


def test_golden_message_expansion():
    """message_expansion.yaml: let + without + map_each($var.merge(this))."""
    src = 'let doc_root = this.without("items")\nroot = items.map_each($doc_root.merge(this))'
    doc = {"id": "foobar", "items": [{"content": "foo"}, {"content": "bar"}, {"content": "baz"}]}
    assert run(src, doc) == [
        {"content": "foo", "id": "foobar"},
        {"content": "bar", "id": "foobar"},
        {"content": "baz", "id": "foobar"},
    ]


def test_import_statement_merges_maps():
    files = {"maps.blobl": 'map shout {\n  root = this.uppercase() + "!"\n}\n'}
    from benthos_spark.bloblang.parser import parse_mapping as pm

    ast = pm('import "maps.blobl"\nroot.out = this.w.apply("shout")',
             import_loader=lambda p: files[p])
    out, _ = Executor(ast).map_part({"w": "hey"})
    assert out == {"out": "HEY!"}


def test_import_missing_file_fails():
    from benthos_spark.bloblang.parser import parse_mapping as pm

    def loader(path):
        raise OSError("no such mapping")

    with pytest.raises(BloblangParseError, match="import"):
        pm('import "nope.blobl"\nroot = this', import_loader=loader)


def test_column_tier_scalar_root(df):
    proc = BloblangMapping("root = this.name.uppercase()")
    out = proc(df)
    assert out.columns == ["value"]
    assert sorted(r["value"] for r in out.collect()) == ["ALPHA", "BETA", "GAMMA"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan


def test_parser_fuzz_no_crashes():
    """Arbitrary input must either parse or raise BloblangParseError —
    never an unhandled exception (tokenizer/parser robustness)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from benthos_spark.bloblang.parser import parse_mapping as pm

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def fuzz(src):
        try:
            pm(src)
        except BloblangParseError:
            pass

    fuzz()


def test_interp_fuzz_no_crashes_on_random_docs():
    """A fixed mapping over arbitrary JSON-ish docs either evaluates or
    raises BloblangError — never an unhandled exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    json_vals = st.recursive(
        st.none() | st.booleans() | st.integers(-10, 10) | st.text(max_size=6),
        lambda s: st.lists(s, max_size=3) | st.dictionaries(st.text(max_size=4), s, max_size=3),
        max_leaves=8,
    )
    ex = Executor(
        'root.a = this.x | "d"\n'
        'root.b = (this.y.uppercase()).catch("?")\n'
        "root.c = this.z.type()"
    )

    @settings(max_examples=200, deadline=None)
    @given(json_vals)
    def fuzz(doc):
        try:
            ex.map_part(doc)
        except BloblangError:
            pass

    fuzz()


def test_batch_functions_from_all_and_index():
    """Windowed batch functions (query batch accessors): from_all()
    evaluates per message, batch_index()/batch_size() expose position."""
    docs = [{"n": 3}, {"n": 5}, {"n": 9}]
    src = ("root.sum = json(\"n\").from_all().sum()\n"
           "root.i = batch_index()\n"
           "root.first = json(\"n\").from(0)\n"
           "root = if batch_index() > 0 { deleted() }")
    out = Executor(src).map_batch(docs)
    assert out == [({"sum": 17, "i": 0, "first": 3}, {})]


def test_assignment_clones_no_aliasing():
    """`root = this` must not alias: later path writes cannot corrupt
    the input message or batch (assignment.go IClone)."""
    doc = {"a": {"b": 1}}
    src = "root = this\nroot.a.b = 99"
    out, _ = Executor(src).map_part(doc)
    assert out == {"a": {"b": 99}}
    assert doc == {"a": {"b": 1}}  # input untouched


def test_jwt_hs_family_roundtrip():
    """sign_jwt_hs*/parse_jwt_hs* (impl/crypto/jwt_sign.go/jwt_parse.go)."""
    claims = {"sub": "user-1", "mood": "disdainful", "iat": 1696222515}
    for alg in ("hs256", "hs384", "hs512"):
        src = f'root.t = this.sign_jwt_{alg}("dont-tell-anyone")'
        tok = run(src, claims)["t"]
        assert tok.count(".") == 2
        back = run(f'root.c = this.t.parse_jwt_{alg}("dont-tell-anyone")', {"t": tok})
        assert back["c"] == claims
        # wrong secret -> verification error -> catch
        bad = run(f'root.c = this.t.parse_jwt_{alg}("wrong").catch("bad sig")', {"t": tok})
        assert bad["c"] == "bad sig"
    # cross-check HS256 against the RFC 7515 JWS structure
    import base64 as b64, hashlib, hmac, json as js
    tok = run('root.t = this.sign_jwt_hs256("k")', {"a": 1})["t"]
    h, p, s = tok.split(".")
    assert js.loads(b64.urlsafe_b64decode(h + "==")) == {"alg": "HS256", "typ": "JWT"}
    expect = hmac.new(b"k", f"{h}.{p}".encode(), hashlib.sha256).digest()
    assert b64.urlsafe_b64decode(s + "==") == expect


def test_xxhash64_known_vectors():
    """hash("xxhash64") — pure-python XXH64 verified against the
    cespare/xxhash test vectors (the library the reference embeds),
    covering the empty, short-tail, and 32+-byte accumulator paths."""
    from benthos_spark.bloblang.interp import _xxhash64

    assert _xxhash64(b"") == 0xEF46DB3751D8E999
    assert _xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert _xxhash64(b"as") == 0x1C330FB2D66BE179
    assert (
        _xxhash64(b"Call me Ishmael. Some years ago--never mind how long precisely-")
        == 0x02A2E85470D6FD96
    )
    # the bloblang surface returns the decimal string (methods_strings.go)
    assert run('root.h = this.v.hash("xxhash64")', {"v": "a"}) == {
        "h": str(0xD24EC4F1A98C6E5B)
    }


def test_password_compare_malformed_hash_errors():
    """A malformed hash must surface as a catchable Bloblang error (Go
    returns the error rather than a mismatch), not a raw exception."""
    out = run('root.r = this.pw.compare_bcrypt("$2a$x").catch("bad-hash")', {"pw": "secret"})
    assert out == {"r": "bad-hash"}
    out = run('root.r = this.pw.compare_argon2("nope").catch("bad-hash")', {"pw": "secret"})
    assert out == {"r": "bad-hash"}


def test_parse_format_msgpack_methods():
    """interp-tier msgpack methods (impl/msgpack bloblang plugins) ride
    the pure-python codec; roundtrip through both."""
    from benthos_spark.bloblang.interp import Executor

    doc = {"v": {"a": 1, "b": [1, 2.5, "x"], "c": None, "ok": True}}
    packed, _ = Executor("root = this.v.format_msgpack()").map_part(doc)
    assert isinstance(packed, bytes)
    out, _ = Executor("root = this.format_msgpack().parse_msgpack()").map_part(doc["v"])
    assert out == doc["v"]


def test_fake_is_deterministic_per_sequence():
    from benthos_spark.bloblang.interp import Executor, _COUNTERS

    for k in [k for k in _COUNTERS if k.startswith("__fake_")]:
        del _COUNTERS[k]
    out1, _ = Executor('root = fake("email")').map_part({})
    out2, _ = Executor('root = fake("email")').map_part({})
    assert out1 == "user0001@example.com" and out2 == "user0002@example.com"
    uu, _ = Executor('root = fake("uuid_hyphenated")').map_part({})
    assert len(uu) == 36 and uu.count("-") == 4


def test_column_tier_named_map_nested_paths(df):
    """Named `map` bodies with nested assignment paths compile to nested
    structs in the Column tier (ref mapping_parser.go:189-305) — no
    Arrow fallback."""
    src = """
map shape {
  root.meta.orig = this.name
  root.meta.len = this.name.length()
  root.score2 = this.score * 2
}
root.out = this.apply("shape")
"""
    proc = BloblangMapping(src)
    plan = proc(df)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "Python" not in plan
    rows = {r["out"]["meta"]["orig"]: r["out"] for r in proc(df).collect()}
    assert rows["alpha"]["meta"]["len"] == 5
    assert rows["beta"]["score2"] == 40.0


def test_column_tier_named_map_nested_delete(df):
    src = """
map shape {
  root.a.keep = this.id
  root.a.drop = this.id * 10
  root.a.drop = deleted()
}
root.out = this.apply("shape")
"""
    out = BloblangMapping(src)(df).collect()[0]["out"]
    assert out["a"].asDict() == {"keep": out["a"]["keep"]}


def test_column_tier_literal_match_without_target(df):
    """A targetless match at mapping top level compares case literals
    against the whole row object — never equal to a scalar literal, so
    only predicate/default cases can fire; it must compile, not fall
    back (ref query_expression_parser.go:78-132)."""
    proc = BloblangMapping(
        'root.label = match { "alpha" => "A", this.score > 15 => "hi", _ => "lo" }'
    )
    plan = proc(df)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "Python" not in plan
    assert {r["label"] for r in proc(df).collect()} == {"hi", "lo"}


def test_interp_literal_match_without_target_scalar_context():
    """In a scalar context the same targetless form matches literals —
    interpreter parity check for the semantics the Column tier encodes."""
    from benthos_spark.bloblang.interp import Executor

    out, _ = Executor(
        'map m { root = match { "F" => "done", _ => "other" } }\n'
        'root.state = this.status.apply("m")'
    ).map_part({"status": "F"})
    assert out == {"state": "done"}


def test_aes_nist_vectors():
    """functions/aes.py against FIPS-197 App. C and SP 800-38A — the
    public vectors the Go stdlib is itself verified against."""
    from benthos_spark.functions import aes

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert aes.AES(key).encrypt_block(pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes.AES(key).decrypt_block(aes.AES(key).encrypt_block(pt)) == pt
    k192 = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    assert aes.AES(k192).encrypt_block(pt).hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f")
    assert aes.AES(k256).encrypt_block(pt).hex() == "8ea2b7ca516745bfeafc49904b496089"
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    pt2 = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172aae2d8a571e03ac9c9eb76fac45af8e51")
    assert aes.ctr_xcrypt(key, iv, pt2).hex() == (
        "874d6191b620e3261bef6864990db6ce9806f66b7970fdff8617187bb9fffdff")
    iv2 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    assert aes.cbc_encrypt(key, iv2, pt2).hex() == (
        "7649abac8119b246cee98e9b12e9197d5086cb9b507219ee95db113a917678b2")
    assert aes.cbc_decrypt(key, iv2, aes.cbc_encrypt(key, iv2, pt2)) == pt2
    assert aes.ofb_xcrypt(key, iv2, pt2).hex() == (
        "3b3fd92eb72dad20333449f8e83cfb4a7789508d16918f03f53c52dac54ed825")


def test_aes_bloblang_methods_reference_example():
    """The reference's own encrypt_aes/decrypt_aes doc example
    (methods_strings.go:284-289) end-to-end through the interpreter."""
    from benthos_spark.bloblang.interp import Executor

    src = (
        'let key = "2b7e151628aed2a6abf7158809cf4f3c".decode("hex")\n'
        'let vector = "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")\n'
        'root.encrypted = this.value.encrypt_aes("ctr", $key, $vector).encode("hex")'
    )
    out, _ = Executor(src).map_part({"value": "hello world!"})
    assert out == {"encrypted": "84e9b31ff7400bdf80be7254"}
    src2 = (
        'let key = "2b7e151628aed2a6abf7158809cf4f3c".decode("hex")\n'
        'let vector = "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")\n'
        'root.decrypted = this.value.decode("hex").decrypt_aes("ctr", $key, $vector).string()'
    )
    out2, _ = Executor(src2).map_part({"value": "84e9b31ff7400bdf80be7254"})
    assert out2 == {"decrypted": "hello world!"}


def test_aes_cbc_requires_block_multiple():
    from benthos_spark.functions import aes

    with pytest.raises(ValueError, match="multiple of the block size"):
        aes.cbc_encrypt(b"0" * 16, b"1" * 16, b"short")


def test_bcrypt_public_vectors():
    """functions/bcrypt.py vs the published OpenWall/OpenBSD vectors
    (low cost — fast) incl. π-derived Blowfish constants."""
    from benthos_spark.functions import bcrypt as B

    w = B._pi_words()
    assert w[:4] == [0x243F6A88, 0x85A308D3, 0x13198A2E, 0x03707344]
    assert w[18] == 0xD1310BA6  # S-box starts where P ends
    assert B.compare("U*U", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.E5YPO9kmyuRGyh0XouQYb4YMJKvyOeW")
    assert B.compare("U*U*", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.VGOzA784oUp/Z0DY336zx7pLYAy0lwK")
    assert B.compare("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s.")
    assert not B.compare("wrong", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.E5YPO9kmyuRGyh0XouQYb4YMJKvyOeW")
    with pytest.raises(ValueError):
        B.compare("x", "$notbcrypt$")


def test_argon2_rfc9106_vectors():
    from benthos_spark.functions.argon2 import argon2

    pw, salt = bytes([1] * 32), bytes([2] * 16)
    secret, ad = bytes([3] * 8), bytes([4] * 12)
    assert argon2(pw, salt, t=3, m=32, p=4, taglen=32, kind="d",
                  secret=secret, ad=ad).hex() == (
        "512b391b6f1162975371d30919734294f868e3be3984f3c1a13a4db9fabe4acb")
    assert argon2(pw, salt, t=3, m=32, p=4, taglen=32, kind="i",
                  secret=secret, ad=ad).hex() == (
        "c814d9d1dc7f37aa13f0d77f2494bda1c8de6b016dd388d29952a4c4672b6ce8")
    assert argon2(pw, salt, t=3, m=32, p=4, taglen=32, kind="id",
                  secret=secret, ad=ad).hex() == (
        "0d640df58d78766c08c037a34a8b53c9d01ef0452d75b65eb52520e96b01e659")


def test_compare_password_methods_reference_examples():
    """The reference's own compare_bcrypt / compare_argon2 doc examples
    (impl/crypto/bcrypt.go:17-24, argon2.go:110-117) — cost-10 bcrypt
    and m=4096 argon2id, a few seconds each in pure python."""
    from benthos_spark.bloblang.interp import Executor

    bh = "$2y$10$Dtnt5NNzVtMCOZONT705tOcS8It6krJX8bEjnDJnwxiFKsz1C.3Ay"
    out, _ = Executor(f'root.match = this.secret.compare_bcrypt("{bh}")').map_part(
        {"secret": "there-are-many-blobs-in-the-sea"})
    assert out == {"match": True}
    out, _ = Executor(f'root.match = this.secret.compare_bcrypt("{bh}")').map_part(
        {"secret": "will-i-ever-find-love"})
    assert out == {"match": False}
    ah = ("$argon2id$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$"
          "RMUMwgtS32/mbszd+ke4o4Ej1jFpYiUqY6MHWa69X7Y")
    out, _ = Executor(f'root.match = this.secret.compare_argon2("{ah}")').map_part(
        {"secret": "there-are-many-blobs-in-the-sea"})
    assert out == {"match": True}
    out, _ = Executor(f'root.match = this.secret.compare_argon2("{ah}")').map_part(
        {"secret": "will-i-ever-find-love"})
    assert out == {"match": False}


def test_geoip_methods_with_fixture_db(tmp_path):
    """geoip_* (impl/maxmind/bloblang_geoip.go) over a from-scratch MMDB
    reader; the fixture file is written by our minimal spec-conforming
    writer (functions/mmdb.py)."""
    from benthos_spark.bloblang.interp import BloblangError, Executor
    from benthos_spark.functions import mmdb

    db = str(tmp_path / "test.mmdb")
    mmdb.build_mmdb(
        [
            ("81.2.69.0/24", {"country": {"iso_code": "GB"},
                              "city": {"names": {"en": "London"}}}),
            ("2001:db8::/32", {"country": {"iso_code": "V6"}}),
        ],
        db,
    )
    out, _ = Executor(f'root = this.ip.geoip_city("{db}")').map_part({"ip": "81.2.69.160"})
    assert out["city"]["names"]["en"] == "London"
    out, _ = Executor(f'root = this.ip.geoip_country("{db}")').map_part({"ip": "2001:db8::1"})
    assert out["country"]["iso_code"] == "V6"
    out, _ = Executor(f'root = this.ip.geoip_asn("{db}")').map_part({"ip": "8.8.8.8"})
    assert out is None  # not in the db
    with pytest.raises(BloblangError, match="valid v4 or v6"):
        Executor(f'root = this.ip.geoip_city("{db}")').map_part({"ip": "not-an-ip"})


def test_mmdb_record_sizes_and_types(tmp_path):
    from benthos_spark.functions import mmdb

    db = str(tmp_path / "types.mmdb")
    rec = {"s": "str", "d": 1.25, "b": b"\x01\x02", "u16": 7, "u32": 70000,
           "u64": 1 << 40, "i32": -9, "t": True, "f": False,
           "m": {"nested": {"deep": "x"}}, "a": [1, "two", {"three": 3}]}
    mmdb.build_mmdb([("192.0.2.0/24", rec)], db)
    got = mmdb.Reader(db).lookup("192.0.2.55")
    assert got == rec


def test_mmdb_hypothesis_roundtrip(tmp_path):
    """Property: any JSON-ish record written by the fixture writer reads
    back identically through the mmdb decoder."""
    from hypothesis import given, settings, strategies as st

    from benthos_spark.functions import mmdb

    scalars = st.one_of(
        st.booleans(),
        st.integers(min_value=-(2**31), max_value=2**63 - 1),
        st.text(max_size=20),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.binary(max_size=16),
    )
    values = st.recursive(
        scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=4),
            st.dictionaries(st.text(min_size=1, max_size=8), kids, max_size=4),
        ),
        max_leaves=12,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.dictionaries(st.text(min_size=1, max_size=8), values, min_size=1, max_size=4))
    def check(rec):
        db = str(tmp_path / "h.mmdb")
        mmdb.build_mmdb([("198.51.100.0/24", rec)], db)
        got = mmdb.Reader(db).lookup("198.51.100.7")
        assert got == rec

    check()


# -- tracing functions (query/functions.go:232 tracing_span, :252 tracing_id) --

_TP = "00-4bf92f3577b34da6a3ce929d0e0e4736-00f067aa0ba902b7-01"


def test_tracing_functions_interp():
    ex = Executor("root.tid = tracing_id()\nroot.span = tracing_span()")
    out, _ = ex.map_part({}, {"traceparent": _TP})
    assert out == {
        "tid": "4bf92f3577b34da6a3ce929d0e0e4736",
        "span": {"traceparent": _TP},
    }
    out, _ = ex.map_part({}, {})
    assert out == {"tid": "0" * 32, "span": None}


def test_tracing_functions_column_tier(spark):
    df = spark.createDataFrame([("a",), ("b",)], "value string").withColumn(
        "_meta", F.create_map(F.lit("traceparent"), F.lit(_TP))
    )
    # the reference doc example: propagate the span into a header object
    proc = BloblangMutation(
        "root.tid = tracing_id()\nroot.headers.traceparent = tracing_span().traceparent"
    )
    row = proc(df).collect()[0]
    assert row["tid"] == "4bf92f3577b34da6a3ce929d0e0e4736"
    assert row["headers"]["traceparent"] == _TP
    # untraced messages: zeroed id (functions.go:254 "zeroed if no span")
    bare = spark.createDataFrame([("x",)], "value string")
    row = BloblangMutation("root.tid = tracing_id()")(bare).collect()[0]
    assert row["tid"] == "0" * 32
