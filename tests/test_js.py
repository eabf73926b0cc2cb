"""From-scratch JavaScript engine (functions/js.py) + the `javascript`
processor (operators/js.py) — the reference's processor_test.go corpus
ported verbatim plus language-semantics pins against goja/spec
behavior (internal/impl/javascript/)."""

from __future__ import annotations

import http.server
import json
import math
import threading

import pytest

from benthos_spark.functions import js as J
from benthos_spark.operators.js import JavaScript, _Runner, go_json_error


def ev(src: str):
    return J.Interpreter().run(src)


# -- language semantics --------------------------------------------------------


@pytest.mark.parametrize("src,want", [
    ("[1,2,3].map(x => x*2).join(',')", "2,4,6"),
    ("'Hello'.toUpperCase() + '!'", "HELLO!"),
    ("JSON.stringify({a:1,b:[true,null,'x']})", '{"a":1,"b":[true,null,"x"]}'),
    ("Object.keys({x:1,y:2}).length", 2.0),
    ("(function f(n){ return n<=1?1:n*f(n-1); })(5)", 120.0),
    ("typeof undefined_var", "undefined"),
    ("typeof null", "object"),
    ("typeof (()=>1)", "function"),
    ("'a,b,,c'.split(',').length", 4.0),
    ("var s=0; for (let i=0;i<10;i++){ if(i%2) continue; s+=i; } s", 20.0),
    ("let o={}; o['k']=5; delete o.k; JSON.stringify(o)", "{}"),
    ("`x=${1+2} ${'a'.repeat(3)}`", "x=3 aaa"),
    ("/ab+c/i.test('xABBc!')", True),
    ("'2019-05-06'.replace(/-/g, '/')", "2019/05/06"),
    ("[3,1,2].sort().join('')", "123"),
    ("[3,1,2].sort((a,b)=>b-a).join('')", "321"),
    ("parseInt('42px')", 42.0),
    ("parseInt('ff', 16)", 255.0),
    ("(5).toFixed(2)", "5.00"),
    ("String(123.0)", "123"),
    ("String(1.5)", "1.5"),
    ("JSON.parse('{\"n\": 3}').n + 1", 4.0),
    ("[1,[2,[3]]].flat(2).join('')", "123"),
    ("let {a, b: c = 9} = {a: 1}; a + c", 10.0),
    ("let [p, ...q] = [1,2,3]; p + q.length", 3.0),
    ("-7 % 3", -1.0),
    ("7 % -3", 1.0),
    ("(1/0) + ''", "Infinity"),
    ("1/'x' === 1/'x'", False),          # NaN !== NaN
    ("null == undefined", True),
    ("null === undefined", False),
    ("'5' == 5", True),
    ("'5' === 5", False),
    ("[] + []", ""),
    ("[] + {}", "[object Object]"),
    ("1 + '2'", "12"),
    ("'3' * '4'", 12.0),
    ("true + true", 2.0),
    ("do { var z = 1; } while (false); z", 1.0),
    ("var t = 0; try { throw 5; } catch (e) { t = e; } finally { t += 1; } t",
     6.0),
    ("let f = (a, b = a + 1) => a + b; f(2)", 5.0),
    ("let xs = [...[1,2], 3]; xs.length", 3.0),
    ("let o2 = {...{a:1}, b:2}; JSON.stringify(o2)", '{"a":1,"b":2}'),
    ("[10, 20, 30].reduce((acc, v) => acc + v, 0)", 60.0),
    ("[1,2,3,4].filter(x => x % 2 === 0).length", 2.0),
    ("'abc'.charCodeAt(1)", 98.0),
    ("String.fromCharCode(72, 105)", "Hi"),
    ("Math.max(1, 5, 3)", 5.0),
    ("Math.floor(-1.5)", -2.0),
    ("Math.round(2.5)", 3.0),
    ("Math.round(-2.5)", -2.0),          # JS rounds .5 toward +inf
    ("(255).toString(16)", "ff"),
    ("5 & 3", 1.0),
    ("-1 >>> 28", 15.0),
    ("1 << 31", -2147483648.0),
    ("~5", -6.0),
    ("let obj = {n: 2, twice() { return this.n * 2; }}; obj.twice()", 4.0),
    ("var c=0; switch('b'){case 'a': c=1; case 'b': c=2; case 'c': c+=10; "
     "break; default: c=99;} c", 12.0),  # fallthrough
    ("(() => { let s = ''; for (const k in {x:1,y:2}) s += k; return s; })()",
     "xy"),
    ("(() => { let s = 0; for (const v of [1,2,3]) s += v; return s; })()",
     6.0),
    ("'  pad  '.trim()", "pad"),
    ("'5'.padStart(3, '0')", "005"),
    ("JSON.stringify([undefined, function(){}])", "[null,null]"),
    ("JSON.stringify({u: undefined, f: function(){}, k: 1})", '{"k":1}'),
    ("encodeURIComponent('a b&c')", "a%20b%26c"),
    ("decodeURIComponent('a%20b%26c')", "a b&c"),
    ("[1,2,3].indexOf(9)", -1.0),
    ("'abcdef'.slice(-3)", "def"),
    ("'abcdef'.substring(4, 1)", "bcd"),  # substring swaps
    ("var n = 0; while (n < 5) { n++; if (n === 3) break; } n", 3.0),
    ("(x => x)(9)", 9.0),
    ("let m = /(\\d+)-(\\d+)/.exec('a 12-34 b'); m[1] + '/' + m[2]", "12/34"),
    ("'aaa'.replace('a', 'b')", "baa"),
    ("'aaa'.replaceAll('a', 'b')", "bbb"),
    ("'x1y2'.match(/\\d/g).join('')", "12"),
    ("[10,20,30].at(-1)", 30.0),
    ("'abc'.at(-2)", "b"),
    ("[0,0,0,0].fill(7, 1, 3).join('')", "0770"),
    ("[1,2,3,4].findLast(x => x < 4)", 3.0),
    ("[1,2,3,4].findLastIndex(x => x % 2 === 0)", 3.0),
])
def test_semantics(src, want):
    got = ev(src)
    if isinstance(want, float):
        assert isinstance(got, (int, float)) and float(got) == want, (src, got)
    else:
        assert got == want, (src, got)


def test_number_string_edges():
    assert ev("0.1 + 0.2") == 0.30000000000000004
    assert ev("(0.1 + 0.2) + ''") == "0.30000000000000004"
    assert ev("1e21 + ''") == "1e+21"
    assert math.isnan(ev("parseInt('zz')"))
    assert ev("1/0") == float("inf")
    assert ev("-1/0") == float("-inf")
    assert math.isnan(ev("0/0"))


def test_closures_and_scope():
    src = """
    function counter() {
      let n = 0;
      return () => { n += 1; return n; };
    }
    var c1 = counter(), c2 = counter();
    c1(); c1(); c2();
    [c1(), c2()].join('-')
    """
    assert ev(src) == "3-2"


def test_var_hoisting_and_function_hoisting():
    assert ev("function g() { return h() + v(); } "
              "function h() { return 1; } var v = () => 2; g()") == 3.0
    assert ev("var seen = typeof hoisted; var hoisted = 5; seen") == \
        "undefined"


def test_this_binding_arrow_vs_method():
    src = """
    var obj = {
      x: 10,
      getArrow: function() { return () => this.x; },
      plain: function() { return this.x; }
    };
    obj.getArrow()() + obj.plain()
    """
    assert ev(src) == 20.0


def test_deterministic_math_random():
    a = J.Interpreter().run("[Math.random(), Math.random()]")
    b = J.Interpreter().run("[Math.random(), Math.random()]")
    assert a == b            # counter-based: same per fresh interpreter
    assert a[0] != a[1]
    assert 0 <= a[0] < 1


def test_date_gated_with_clear_error():
    # the gate message must point the user at the deterministic alternative
    with pytest.raises(J.JSThrow, match="Date is not supported"):
        ev("new Date()")
    with pytest.raises(J.JSThrow, match="event_ts"):
        ev("new Date()")


@pytest.mark.parametrize("src,want", [
    # -- Map (spec §23.1): insertion order, SameValueZero, chaining --
    ("let m=new Map(); m.set('a',1).set('b',2); m.get('a')+m.size", 3.0),
    ("let m=new Map([['x',1],['y',2]]); m.has('x') && !m.has('z')", True),
    ("let m=new Map(); m.set(NaN,'n'); m.get(NaN)", "n"),          # SameValueZero
    ("let m=new Map(); m.set(-0,'z'); m.get(0)", "z"),             # +0 === -0
    ("let m=new Map([['a',1]]); m.delete('a') && m.size===0", True),
    ("let m=new Map([['a',1],['b',2]]); let s=''; "
     "for (const [k,v] of m) s+=k+v; s", "a1b2"),
    ("let m=new Map([['a',1],['b',2]]); m.keys().join(',')", "a,b"),
    ("let m=new Map([['a',1],['b',2]]); m.values().join(',')", "1,2"),
    ("let m=new Map([['a',1]]); let out=[]; "
     "m.forEach((v,k)=>out.push(k+'='+v)); out.join('')", "a=1"),
    ("let m=new Map([['a',1]]); m.set('a',9); m.get('a')+m.size", 10.0),
    ("new Map() instanceof Map", True),
    ("typeof new Map()", "object"),
    ("let m=new Map([['a',1]]); m.clear(); m.size", 0.0),
    ("Array.from(new Map([['k',7]]))[0].join(':')", "k:7"),
    # -- Set (spec §23.2) --
    ("let s=new Set([1,2,2,3]); s.size", 3.0),
    ("let s=new Set(); s.add(1).add(1).add(2); s.size", 2.0),
    ("let s=new Set([NaN, NaN]); s.size", 1.0),                    # SameValueZero
    ("let s=new Set([1,2,3]); s.delete(2) && !s.has(2)", True),
    ("let s=new Set('aba'); s.size", 2.0),                         # string iterable
    ("let s=new Set([3,1,2]); let o=''; for (const v of s) o+=v; o", "312"),
    ("new Set() instanceof Set && !(new Set() instanceof Map)", True),
    ("let s=new Set([1]); s.clear(); s.size", 0.0),
    ("Array.from(new Set([5,5,6])).join(',')", "5,6"),
    # dedupe idiom the reference corpus-style scripts actually use
    ("let seen=new Set(); let out=[]; "
     "for (const w of ['a','b','a','c','b']) { "
     "  if (!seen.has(w)) { seen.add(w); out.push(w); } } out.join('')", "abc"),
    # word-count idiom with Map
    ("let c=new Map(); for (const w of ['x','y','x']) "
     "c.set(w,(c.get(w)||0)+1); c.get('x')", 2.0),
    ("JSON.stringify(new Map([['a',1]]))", "{}"),   # no enumerable own props
    ("String(new Map())", "[object Map]"),
    ("String(new Set())", "[object Set]"),
])
def test_map_set_semantics(src, want):
    assert ev(src) == want


@pytest.mark.parametrize("src,want", [
    # Array.prototype.keys/values/entries return real iterators:
    # for-of, spread, and manual next() all work (goja parity)
    ("[...['a','b'].keys()].join(',')", "0,1"),
    ("[...['a','b'].values()].join(',')", "a,b"),
    ("let o=''; for (const [i,v] of ['x','y'].entries()) o+=i+v; o", "0x1y"),
    ("let it=[7,8].values(); it.next().value + it.next().value", 15.0),
    ("let it=[7,8].values(); it.next(); it.next(); it.next().done", True),
    # return() closes the iterator early
    ("let it=[1,2,3].values(); it.next(); it.return(9); it.next().done",
     True),
    # flatMap
    ("[1,2,3].flatMap(x => [x, x*10]).join(',')", "1,10,2,20,3,30"),
    ("[1,2].flatMap(x => x*2).join(',')", "2,4"),   # non-array results kept
    ("['a b','c'].flatMap(s => s.split(' ')).length", 3.0),
    # Object.fromEntries over Map / iterator / array-of-pairs
    ("Object.fromEntries(new Map([['a',1],['b',2]])).b", 2.0),
    ("Object.fromEntries([['x',1]]).x", 1.0),
    ("Object.fromEntries(['ab','cd'].entries())['0']", "ab"),
    # round-trip idiom: Map -> object -> JSON
    ("JSON.stringify(Object.fromEntries(new Map([['k','v']])))",
     '{"k":"v"}'),
    # String.fromCodePoint (incl. astral plane)
    ("String.fromCodePoint(72, 105)", "Hi"),
    ("String.fromCodePoint(0x1F600).length", 1.0),  # python str: 1 char
    # ES2021 numeric separators in all literal forms
    ("1_000_000 + 1", 1000001.0),
    ("0xFF_FF", 65535.0),
    ("0b1010_1010", 170.0),
    ("0o7_7", 63.0),
    ("1_0.5_5", 10.55),
    ("1e1_0 === 1e10", True),
])
def test_es_builtin_extensions(src, want):
    assert ev(src) == want


def test_map_object_keys_by_identity():
    # objects key by reference identity, not structure (SameValueZero)
    assert ev("let k1={},k2={}; let m=new Map(); m.set(k1,'a'); m.set(k2,'b');"
              "m.get(k1)+m.get(k2)+m.size") == "ab2"
    assert ev("let m=new Map(); m.set({}, 1); m.get({})") is J.UNDEF


def test_operation_budget_stops_runaway_loops():
    it = J.Interpreter(max_ops=100_000)
    with pytest.raises(J.JSThrow, match="operation budget"):
        it.run("while (true) {}")


def test_uncaught_throw_and_error_objects():
    with pytest.raises(J.JSThrow) as ei:
        ev("throw new TypeError('bad thing')")
    assert ei.value.value["message"] == "bad thing"
    assert ei.value.value["name"] == "TypeError"
    assert ev("var r; try { null.x; } catch (e) { r = 'caught'; } r") == \
        "caught"


# -- go_json_error parity --------------------------------------------------------


def test_go_json_error_strings():
    # pinned against Go encoding/json (processor_test.go:216)
    assert go_json_error("not a structured message") == \
        "invalid character 'o' in literal null (expecting 'u')"
    assert go_json_error("xyz") == \
        "invalid character 'x' looking for beginning of value"
    assert go_json_error("truthy") == \
        "invalid character 't' in literal true (expecting 'e')"
    assert go_json_error("{1: 2}") == \
        "invalid character '1' looking for beginning of object key string"
    assert go_json_error("") == "unexpected end of JSON input"
    assert go_json_error('{"a":1} extra') == \
        "invalid character 'e' after top-level value"


# -- reference processor corpus (processor_test.go, ported verbatim) -----------


_BASIC = """
(() => {
  let foo = "hello world"
  benthos.v0_msg_set_string(benthos.v0_msg_as_string() + foo);
})();
"""


def test_processor_basic_repeated():
    r = _Runner(_BASIC)
    for msg in (b"first ", b"second "):
        content, meta, err = r.run(msg, {})
        assert err is None
        assert content == msg + b"hello world"
    # runtime reuse across many invocations (reference loops 1000x)
    for i in range(200):
        content, _, err = r.run(f"hello world {i}".encode(), {})
        assert err is None
        assert content == f"hello world {i}hello world".encode()


def test_processor_no_encapsulation():
    r = _Runner(
        'benthos.v0_msg_set_string(benthos.v0_msg_as_string() + '
        '"hello world");')
    content, _, err = r.run(b"first ", {})
    assert err is None and content == b"first hello world"


def test_processor_metadata():
    r = _Runner("""
(() => {
  benthos.v0_msg_set_meta("testa", "hello world");
  benthos.v0_msg_set_meta("testb", benthos.v0_msg_get_meta("testa") + " two");
  benthos.v0_msg_set_meta("testc", ["first","second"]);
  benthos.v0_msg_set_meta("testd", 123.4);
})();
""")
    content, meta, err = r.run(b"first", {})
    assert err is None
    assert content == b"first"
    assert meta == {
        "testa": "hello world",
        "testb": "hello world two",
        "testc": ["first", "second"],
        "testd": 123.4,
    }


def test_processor_structured():
    r = _Runner("""
(() => {
  let thing = benthos.v0_msg_as_structured();
  thing.num_keys = Object.keys(thing).length;
  delete thing["b"];
  benthos.v0_msg_set_structured(thing);
})();
""")
    content, _, err = r.run(b'{"a":"a value","b":"b value"}', {})
    assert err is None
    assert content == b'{"a":"a value","num_keys":2}'


def test_processor_structured_imut():
    r = _Runner("""
(() => {
  let thing = benthos.v0_msg_as_structured();
  thing.num_keys = Object.keys(thing).length;
  delete thing["b"];
  benthos.v0_msg_set_meta("result", thing);
})();
""")
    content, meta, err = r.run(b'{"a":"a value","b":"b value"}', {})
    assert err is None
    assert content == b'{"a":"a value","b":"b value"}'  # unchanged
    # goja Export: integral float -> int (casts.go / Export semantics)
    assert meta["result"] == {"a": "a value", "num_keys": 2}
    assert isinstance(meta["result"]["num_keys"], int)


def test_processor_error_handling():
    r = _Runner("""
(() => {
  try {
    let thing = benthos.v0_msg_as_structured();
    benthos.v0_msg_set_meta("no_err", thing);
  } catch (e) {
    benthos.v0_msg_set_meta("err", e);
  }
})();
""")
    content, meta, err = r.run(b"not a structured message", {})
    assert err is None
    assert content == b"not a structured message"
    assert meta == {
        "err": "invalid character 'o' in literal null (expecting 'u')"}


def test_processor_basic_from_file(tmp_path):
    p = tmp_path / "foo.js"
    p.write_text(_BASIC)
    proc = JavaScript(file=str(p))
    r = _Runner(proc.code)
    content, _, err = r.run(b"first ", {})
    assert err is None and content == b"first hello world"


def test_processor_http_fetch():
    class Echo(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"echo: " + body.upper())

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Echo)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        r = _Runner(f"""
(() => {{
  let foo = benthos.v0_fetch("{url}", {{}}, "GET", benthos.v0_msg_as_string());
  benthos.v0_msg_set_string(foo.status.toString() + ": " + foo.body);
}})();
""")
        content, _, err = r.run(b"first", {})
        assert err is None
        assert content == b"200: echo: FIRST"
        content, _, err = r.run(b"second", {})
        assert content == b"200: echo: SECOND"
    finally:
        srv.shutdown()


def test_uncaught_script_error_marks_message():
    r = _Runner("benthos.v0_msg_get_meta('missing');")
    content, meta, err = r.run(b"body", {})
    assert content == b"body"
    assert err == "key not found"


# -- Spark processor ------------------------------------------------------------


def test_javascript_processor_spark(spark):
    df = spark.createDataFrame(
        [(1, '{"n": 2}'), (2, '{"n": 5}')], "i int, value string")
    proc = JavaScript(code="""
(() => {
  let m = benthos.v0_msg_as_structured();
  m.n2 = m.n * m.n;
  benthos.v0_msg_set_structured(m);
  benthos.v0_msg_set_meta("seen", "yes");
})();
""")
    rows = {r.i: r for r in proc(df).collect()}
    assert json.loads(rows[1].value) == {"n": 2, "n2": 4}
    assert json.loads(rows[2].value) == {"n": 5, "n2": 25}
    assert rows[1]._meta["seen"] == "yes"
    assert rows[1]._error is None


def test_javascript_config_wired(spark):
    from benthos_spark.config import ConfigError, _proc

    proc = _proc({"javascript": {
        "code": 'benthos.v0_msg_set_string('
                'benthos.v0_msg_as_string().toUpperCase());'}})
    df = spark.createDataFrame([("hello",)], "value string")
    out = proc(df).collect()
    assert out[0].value == "HELLO"

    with pytest.raises(ConfigError):
        _proc({"javascript": {}})
    with pytest.raises(ConfigError):
        _proc({"javascript": {"code": "1;", "file": "/tmp/x.js"}})


def test_javascript_streaming_exactly_once(spark, tmp_path):
    """The JS plugin path is streaming-safe: deterministic per-message
    execution through a config-compiled pipeline into the exactly-once
    sink (same shape as the reference running its goja processor inside
    a stream)."""
    from benthos_spark.config import run_config
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
    from benthos_spark.streaming.pipeline import run_to_completion

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(f'{{"id": {i}, "v": {i * 3}}}',) for i in range(20)],
        "value string",
    ).repartition(2).write.parquet(src)
    out_dir = str(tmp_path / "out")
    # IIFE-wrapped per the reference's own guidance: runtimes are
    # reused, so a bare global `let` would error on the second message
    code = ("(() => { let m = benthos.v0_msg_as_structured(); "
            "m.sq = m.v * m.v; benthos.v0_msg_set_structured(m); })();")
    cfg = f"""
input:
  parquet: {{path: {src}, streaming: true}}
pipeline:
  processors:
    - javascript:
        code: '{code}'
output:
  exactly_once: {{dir: {out_dir}}}
"""
    q = run_config(spark, cfg, checkpoint=str(tmp_path / "ckpt"))
    run_to_completion(q, timeout_s=300)
    got = ExactlyOnceParquetSink(out_dir).read_committed(spark)
    rows = sorted(
        (json.loads(r.value)["id"], json.loads(r.value)["sq"])
        for r in got.collect()
    )
    assert rows == [(i, (i * 3) ** 2) for i in range(20)]


def test_op_budget_is_per_execution_not_cumulative():
    """The runner pool reuses interpreters across messages; the op
    budget must reset per program run or long-lived executors start
    failing healthy messages after enough traffic."""
    it = J.Interpreter(max_ops=200_000)
    prog = J.parse_js("var s = 0; for (var i = 0; i < 10000; i++) s += i; s")
    for _ in range(40):     # cumulative ops would blow the budget ~8x over
        assert it.run(prog) == 49995000.0


def test_global_let_redeclaration_errors_like_goja():
    """The reference documents that reused runtimes fail on duplicate
    global declarations unless the program IIFE-encapsulates — pin the
    same behavior (and that builtins may still be shadowed: they live
    in the global-object scope, not the user's lexical scope)."""
    it = J.Interpreter()
    prog = J.parse_js('let foo = "hello"')
    it.run(prog)
    with pytest.raises(J.JSThrow, match="already been declared"):
        it.run(prog)
    # per-message error, not a poisoned runtime: IIFE code still runs
    it.run("(() => { let foo = 1; })();")
    assert J.Interpreter().run("let Math = 5; Math") == 5.0
    with pytest.raises(J.JSThrow, match="already been declared"):
        ev("let x = 1; let x = 2;")
    with pytest.raises(J.JSThrow, match="already been declared"):
        ev("let y = 1; var y = 2;")


def test_runner_survives_non_iife_program():
    """A non-encapsulated program marks messages failed from the second
    one on (the reference's documented caveat) without crashing the
    stream."""
    r = _Runner('let n = benthos.v0_msg_as_string(); '
                'benthos.v0_msg_set_string(n + "!");')
    content, _, err = r.run(b"a", {})
    assert err is None and content == b"a!"
    content, _, err = r.run(b"b", {})
    assert content == b"b"          # unchanged
    assert "already been declared" in err


# -- randomized JSON roundtrip -------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _json_vals = st.recursive(
        st.none() | st.booleans()
        | st.floats(allow_nan=False, allow_infinity=False)
        | st.integers(min_value=-(2**53), max_value=2**53)
        | st.text(max_size=20),
        lambda children: st.lists(children, max_size=4)
        | st.dictionaries(st.text(max_size=8), children, max_size=4),
        max_leaves=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(v=_json_vals)
    def test_json_stringify_parse_roundtrip(v):
        """JSON.parse(JSON.stringify(x)) is identity over the JSON value
        domain (numbers land as doubles on both paths)."""
        it = J.Interpreter()
        jsv = J.js_import(
            json.loads(json.dumps(v), parse_int=float, parse_float=float))
        it.global_env.declare("input", jsv)
        out = it.run("JSON.parse(JSON.stringify(input))")

        def norm(x):
            if isinstance(x, dict):
                return {k: norm(y) for k, y in x.items()}
            if isinstance(x, list):
                return [norm(y) for y in x]
            if isinstance(x, bool) or x is None:
                return x
            if isinstance(x, (int, float)):
                return float(x)
            return x
        assert norm(out) == norm(jsv)
except ImportError:  # pragma: no cover
    pass


def test_labeled_statements():
    src = ("var out=''; outer: for (var i=0;i<3;i++){ "
           "for (var j=0;j<3;j++){ if (j===1 && i===1) continue outer; "
           "if (i===2) break outer; out += ''+i+j; } } out")
    assert ev(src) == "00010210"
    assert ev("var n=0; lbl: { n=1; break lbl; n=2; } n") == 1.0
    src2 = ("var s=''; loop1: for (var a of [1,2,3]) { "
            "for (var b of [1,2,3]) { if (b===2) continue loop1; "
            "s+=''+a+b; } } s")
    assert ev(src2) == "112131"


@pytest.mark.parametrize("src,want", [
    # -- classes (spec §14.5 subset) --
    ("class P { constructor(x){ this.x = x; } getX(){ return this.x; } } "
     "new P(7).getX()", 7.0),
    ("class P { constructor(x){ this.x = x; } } new P(3).x", 3.0),
    ("class C { m(){ return 'base'; } } "
     "class D extends C { } new D().m()", "base"),
    ("class C { constructor(){ this.a = 1; } } "
     "class D extends C { constructor(){ super(); this.b = 2; } } "
     "let d = new D(); d.a + d.b", 3.0),
    # implicit constructor forwards arguments through the chain
    ("class C { constructor(x){ this.x = x; } } "
     "class D extends C { } new D(9).x", 9.0),
    ("class C { m(){ return 1; } } "
     "class D extends C { m(){ return super.m() + 1; } } new D().m()", 2.0),
    ("class A {} class B extends A {} let b = new B(); "
     "(b instanceof B) && (b instanceof A) && !(new A() instanceof B)", True),
    ("class A { static make(v){ return new A(v); } constructor(v){ this.v = v; } } "
     "A.make(5).v", 5.0),
    # statics inherit through the chain
    ("class A { static who(){ return 'A'; } } class B extends A { } B.who()", "A"),
    ("class A {} typeof A", "function"),
    ("class A {} A.name", "A"),
    ("class P { constructor(){ this.x = 1; this.y = 2; } m(){ return 0; } } "
     "JSON.stringify(new P())", '{"x":1,"y":2}'),   # methods not enumerable
    ("class P { constructor(){ this.x = 1; } } Object.keys(new P()).join('')", "x"),
    ("let A = class { m(){ return 42; } }; new A().m()", 42.0),  # class expression
    ("class A { constructor(){ this.v = 10; } scale(k){ return this.v * k; } } "
     "[1,2,3].map(k => new A().scale(k)).join(',')", "10,20,30"),
    # `this` in methods via arrow callbacks (lexical this)
    ("class Acc { constructor(){ this.total = 0; } addAll(xs){ "
     "xs.forEach(x => { this.total += x; }); return this.total; } } "
     "new Acc().addAll([1,2,3])", 6.0),
    ("class A { constructor(){ this.k = 'c'; } } new A().constructor === A", True),
    ("class Shape { area(){ return 0; } describe(){ return 'area=' + this.area(); } } "
     "class Sq extends Shape { constructor(s){ super(); this.s = s; } "
     "area(){ return this.s * this.s; } } new Sq(4).describe()", "area=16"),
])
def test_class_semantics(src, want):
    assert ev(src) == want


def test_class_gates_and_errors():
    # calling a class without `new` throws the spec TypeError
    with pytest.raises(J.JSThrow, match="cannot be invoked without 'new'"):
        ev("class A {} A()")
    # extends a non-constructor
    with pytest.raises(J.JSThrow, match="is not a constructor"):
        ev("class A extends 5 {}")
    with pytest.raises(J.JSThrow, match="super"):
        ev("class A { m(){ return super.m(); } } new A().m()")


@pytest.mark.parametrize("src,want", [
    # --- instance accessors ---
    ("class A { constructor(){ this._v = 3; } get v(){ return this._v * 2; } } "
     "new A().v", 6.0),
    ("class A { constructor(){ this._v = 0; } get v(){ return this._v; } "
     "set v(x){ this._v = x + 1; } } let a = new A(); a.v = 10; a.v", 11.0),
    # getter-only write is a sloppy-mode no-op
    ("class A { get v(){ return 7; } } let a = new A(); a.v = 99; a.v", 7.0),
    # own data property shadows the accessor pair
    ("class A { get v(){ return 1; } set v(x){} } let a = new A(); "
     "Object.keys(a).length", 0.0),
    # accessors inherit through extends, super.getter works
    ("class A { get v(){ return 5; } } class B extends A { "
     "m(){ return super.v + 1; } } new B().m()", 6.0),
    ("class A { get v(){ return 5; } } class B extends A {} new B().v", 5.0),
    # --- static accessors + static data props ---
    ("class A { static get tag(){ return 'T'; } } A.tag", "T"),
    ("class A { static set conf(x){ A._c = x * 2; } } A.conf = 5; A._c", 10.0),
    ("class A { static x = 41; } A.x + 1", 42.0),
    ("class A { static x = 2; static y = A.x * 3; } A.y", 6.0),
    # statics inherit; assignment lands on the class written to
    ("class A { static x = 1; } class B extends A {} B.x", 1.0),
    # --- public instance fields ---
    ("class A { x = 1; y; } let a = new A(); "
     "JSON.stringify([a.x, a.y === undefined])", "[1,true]"),
    # field init sees `this` and ctor runs after fields in a base class
    ("class A { x = 10; constructor(){ this.y = this.x + 1; } } new A().y", 11.0),
    # derived-class fields initialize when super() returns
    ("class A { constructor(){ this.log = 'A'; } } "
     "class B extends A { z = this.log + 'B'; } new B().z", "AB"),
    # implicit ctor still initializes fields, parent-first
    ("class A { a = 1; } class B extends A { b = 2; } "
     "let o = new B(); o.a + o.b", 3.0),
    # fields named get/set and methods named get/set still parse
    ("class A { get = 1; set(x){ return x + this.get; } } new A().set(1)", 2.0),
    # --- generator methods parse into callable generators ---
    ("class A { *seq(n){ for (let i = 0; i < n; i++) yield i; } } "
     "[...new A().seq(3)].join(',')", "0,1,2"),
    ("class A { static *pair(){ yield 'a'; yield 'b'; } } "
     "[...A.pair()].join('')", "ab"),
])
def test_class_accessors_fields(src, want):
    assert ev(src) == want


@pytest.mark.parametrize("src,want", [
    # object-literal accessors
    ("let o = { _v: 2, get v(){ return this._v * 10; } }; o.v", 20.0),
    ("let o = { _v: 0, set v(x){ this._v = x - 1; } }; o.v = 5; o._v", 4.0),
    ("let o = { get v(){ return 1; } }; o.v = 9; o.v", 1.0),
    # accessors are enumerable own properties: keys/JSON/for-in see them
    ("let o = { a: 1, get b(){ return 2; } }; Object.keys(o).join(',')", "a,b"),
    ("JSON.stringify({ a: 1, get b(){ return this.a + 1; } })",
     '{"a":1,"b":2}'),
    ("let s = ''; for (let k in { get x(){ return 0; }, y: 1 }) s += k; s",
     "xy"),
    # spread copies VALUES (the getter is read once; accessor not carried)
    ("let n = 0; let src = { get v(){ n++; return n; } }; "
     "let c = { ...src }; c.v + c.v * 10 + n * 100", 111.0),
    # Object.assign triggers target setters
    ("let hits = []; let t = { set v(x){ hits.push(x); } }; "
     "Object.assign(t, { v: 7 }); hits.join(',')", "7"),
    # later data property replaces an earlier accessor
    ("let o = { get v(){ return 1; }, v: 2 }; o.v", 2.0),
    # delete removes accessors
    ("let o = { get v(){ return 1; } }; delete o.v; o.v === undefined", True),
])
def test_object_literal_accessors(src, want):
    assert ev(src) == want


@pytest.mark.parametrize("src,want", [
    # basic protocol: {value, done} records, exhaustion stays done
    ("function* g(){ yield 1; yield 2; return 9; } let it = g(); "
     "JSON.stringify([it.next(), it.next(), it.next(), it.next()])",
     '[{"value":1,"done":false},{"value":2,"done":false},'
     '{"value":9,"done":true},{"done":true}]'),
    # lazy: an infinite generator only runs as far as it is pulled
    ("function* g(){ for (let i = 0;; i++) yield i * 2; } "
     "let it = g(); it.next(); it.next(); it.next().value", 4.0),
    # two-way traffic: next(v) becomes the value of the paused yield
    ("function* g(){ let x = yield 'a'; let y = yield x + 1; return y * 2; } "
     "let it = g(); "
     "[it.next().value, it.next(10).value, it.next(3).value].join(',')",
     "a,11,6"),
    # yield* delegates and evaluates to the inner return value
    ("function* inner(){ yield 1; yield 2; return 'R'; } "
     "function* outer(){ let r = yield* inner(); yield r; } "
     "[...outer()].join(',')", "1,2,R"),
    ("function* g(){ yield* [1,2]; yield* 'ab'; } [...g()].join('')", "12ab"),
    # return(v) runs finally blocks before completing
    ("var log = []; function* g(){ try { yield 1; } finally "
     "{ log.push('f'); } } let it = g(); it.next(); "
     "let r = it.return(7); log[0] + r.value + r.done", "f7true"),
    # throw(e) is catchable inside the body
    ("function* g(){ try { yield 1; } catch (e) { yield 'caught:' + e; } } "
     "let it = g(); it.next(); it.throw('boom').value", "caught:boom"),
    # iteration protocol consumers
    ("function* g(n){ while (n--) yield n; } Array.from(g(3)).join(',')",
     "2,1,0"),
    ("function* g(){ yield [1,'a']; yield [2,'b']; } new Map(g()).get(2)",
     "b"),
    ("function* g(){ yield 1; yield 1; yield 2; } new Set(g()).size", 2.0),
    ("let s = 0; function* g(){ yield 1; yield 2; yield 3; } "
     "for (const v of g()) s += v; s", 6.0),
    ("function* g(){ yield 1; yield 5; } Math.max(...g(), 0)", 5.0),
    # generator function expressions and hoisted declarations
    ("let g = function*(){ yield 'x'; }; g().next().value", "x"),
    ("let r = [...h()].join(''); function* h(){ yield 'h'; yield 'i'; } r",
     "hi"),
    # typeof / JSON behavior matches real JS
    ("function* g(){} typeof g", "function"),
    ("function* g(){ yield 1; } JSON.stringify(g())", "{}"),
    # `yield` stays a plain identifier outside generator bodies
    ("let yield = 5; yield + 1", 6.0),
    # ASI: newline after yield ends the operand (restricted production)
    ("function* g(){ yield\n1; } JSON.stringify(g().next())",
     '{"done":false}'),
])
def test_generators(src, want):
    assert ev(src) == want


def test_generator_errors():
    # reentrant next() while the body is running
    with pytest.raises(J.JSThrow, match="already running"):
        ev("var it; function* g(){ yield it.next(); } it = g(); it.next()")
    # new on a generator function
    with pytest.raises(J.JSThrow, match="not a constructor"):
        ev("function* g(){} new g()")
    # uncaught throw() propagates to the caller
    with pytest.raises(J.JSThrow, match="boom"):
        ev("function* g(){ yield 1; } let it = g(); it.next(); "
           "it.throw('boom')")
    # an exception inside the body surfaces on next()
    with pytest.raises(J.JSThrow, match="kaput"):
        ev("function* g(){ yield 1; throw 'kaput'; } "
           "let it = g(); it.next(); it.next()")
    # yield inside a nested plain function / arrow is not a yield expr
    with pytest.raises(J.JSThrow, match="yield is not defined"):
        ev("function* g(){ let f = function(){ return yield; }; "
           "yield f(); } g().next()")


def test_generator_threads_do_not_leak():
    import gc
    import threading
    import time

    base = threading.active_count()
    i = J.Interpreter()
    # 20 abandoned suspended generators: finalizers must inject a
    # return so each body thread unwinds and exits
    i.run("function* g(){ try { for (;;) yield 1; } finally {} } "
          "for (let k = 0; k < 20; k++) { let it = g(); it.next(); }")
    del i
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == base


@pytest.mark.parametrize("src,want", [
    # nested binding patterns (declarations)
    ("let [[a], [b, c]] = [[1], [2, 3]]; a + b + c", 6.0),
    ("let {p: {q}} = {p: {q: 'deep'}}; q", "deep"),
    ("let {xs: [x0, , x2]} = {xs: [1, 2, 3]}; x0 + x2", 4.0),
    ("let [{n}, {n: m}] = [{n: 1}, {n: 2}]; n + m", 3.0),
    ("let [[k, v]] = new Map([['a', 1]]); k + v", "a1"),
    # destructuring from iterables: generator pulls only what it binds
    ("function* g(){ yield 1; yield 2; yield 3; } let [a, b] = g(); "
     "a * 10 + b", 12.0),
    ("function* g(){ for (;;) yield 7; } let [x] = g(); x", 7.0),
    ("function* g(){ yield 1; yield 2; yield 3; } let [a, ...r] = g(); "
     "a + r.length", 3.0),
    ("let [p] = new Set([5, 5, 6]); p", 5.0),
    # nested destructuring assignment (no declaration)
    ("let a, b; [[a], {x: b}] = [[7], {x: 8}]; a + b", 15.0),
    ("let h, t; [h, ...t] = [1, 2, 3]; h + t.length", 3.0),
    # destructured parameters (functions and arrows)
    ("function f({a, b = 10}){ return a + b; } f({a: 1})", 11.0),
    ("function f([x, y]){ return x * y; } f([3, 4])", 12.0),
    ("let g = ({v}) => v + 1; g({v: 41})", 42.0),
    ("function f({p: {q}}, [r]){ return q + r; } f({p: {q: 'x'}}, ['y'])",
     "xy"),
    ("function f(...[a, b]){ return a + b; } f(1, 2)", 3.0),
    # var hoisting reaches names inside nested patterns
    ("var seen = typeof inner; var [[inner]] = [[5]]; seen + inner",
     "undefined5"),
    # for-of with a nested binding
    ("let s = 0; for (const [a, [b]] of [[1, [2]], [3, [4]]]) s += a * b; s",
     14.0),
])
def test_nested_destructuring(src, want):
    assert ev(src) == want
