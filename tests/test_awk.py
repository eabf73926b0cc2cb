"""AWK processor + from-scratch interpreter (functions/awk.py,
operators/awk.py).

The parity corpus ports the reference's processor tests
(/root/reference/internal/impl/awk/processor_test.go) — same programs,
same inputs, same expected outputs/metadata — plus language-level
cases for the interpreter core.
"""

import pytest

from benthos_spark.functions.awk import AwkError, compile_program
from benthos_spark.operators.awk import run_awk_message


def _run(program, stdin="", vars=None, funcs=None):
    return compile_program(program).run(stdin, vars, funcs)


def _msg(program, codec, content, meta=None):
    prog = compile_program(program)
    return run_awk_message(prog, codec, content, meta or {})


# ----------------------------------------------------- language core


def test_fields_and_rebuild():
    assert _run("{ print $2, $1 }", "hello world")[0] == "world hello\n"
    assert _run('{ $2 = "X"; print }', "a b c")[0] == "a X c\n"
    assert _run('BEGIN { OFS="-" } { $1=$1; print }', "a b c")[0] == "a-b-c\n"
    assert _run("{ print NF, $NF }", "x y z")[0] == "3 z\n"
    assert _run("{ NF = 2; print $0 }", "a b c")[0] == "a b\n"


def test_numeric_string_comparisons():
    # strnum fields compare numerically; string constants don't
    assert _run('{ print ($1 == 10) }', "10.0")[0] == "1\n"
    assert _run('BEGIN { print ("10.0" == 10) }')[0] == "0\n"
    assert _run('{ print ($1 < $2) }', "9 10")[0] == "1\n"
    assert _run('BEGIN { print ("9" < "10") }')[0] == "0\n"


def test_uninitialized_semantics():
    assert _run('BEGIN { print x+0, length(x), (x=="" ? "e" : "n") }')[0] == "0 0 e\n"


def test_arrays_subsep_delete():
    out = _run(
        'BEGIN { a[1,2]=3; for (k in a) { split(k, p, SUBSEP); print p[1], p[2] } '
        'delete a[1,2]; print length(a) }'
    )[0]
    assert out == "1 2\n0\n"


def test_functions_recursion_and_array_ref():
    prog = """
    function fib(n) { return n < 2 ? n : fib(n-1) + fib(n-2) }
    function fill(arr,  i) { for (i = 0; i < 3; i++) arr[i] = i * 2 }
    BEGIN { print fib(10); fill(a); print a[0] a[1] a[2] }
    """
    assert _run(prog)[0] == "55\n024\n"


def test_printf_and_sprintf():
    assert _run(r'BEGIN { printf "%d|%5.2f|%-4s|%x|%c\n", 42, 3.14159, "ab", 255, 65 }')[0] == "42| 3.14|ab  |ff|A\n"
    assert _run(r'BEGIN { print sprintf("%03d", 7) }')[0] == "007\n"
    assert _run(r'BEGIN { printf "%s", "no newline" }')[0] == "no newline"


def test_gsub_sub_match_amp():
    assert _run(r'{ gsub(/l/, "[&]"); print }', "hello")[0] == "he[l][l]o\n"
    assert _run(r'{ sub(/l+/, "\\&"); print }', "hello")[0] == "he&o\n"
    assert _run('BEGIN { s = "aXbXc"; n = gsub(/X/, "-", s); print n, s }')[0] == "2 a-b-c\n"


def test_getline_and_ranges():
    assert _run("NR==2, NR==3", "a\nb\nc\nd")[0] == "b\nc\n"
    assert _run("{ getline nxt; print $0 \"+\" nxt }", "a\nb\nc\nd")[0] == "a+b\nc+d\n"


def test_split_fs_variants():
    assert _run('BEGIN { n = split("a.b.c", p, "."); print n, p[2] }')[0] == "3 b\n"
    assert _run('BEGIN { n = split("a1b22c", p, /[0-9]+/); print n, p[3] }')[0] == "3 c\n"
    assert _run('BEGIN { FS=":" } { print $2 }', "root:x:0")[0] == "x\n"


def test_do_while_break_continue():
    prog = 'BEGIN { i=0; do { i++; if (i==2) continue; if (i>4) break; s = s i } while (1); print s }'
    assert _run(prog)[0] == "134\n"


def test_deterministic_rand():
    a = _run("BEGIN { srand(7); print rand(), rand() }")[0]
    b = _run("BEGIN { srand(7); print rand(), rand() }")[0]
    assert a == b
    c = _run("BEGIN { srand(8); print rand(), rand() }")[0]
    assert a != c


def test_rejections():
    with pytest.raises(AwkError, match="redirection"):
        compile_program('{ print "x" > "file" }')
    with pytest.raises(AwkError, match="system"):
        _run('BEGIN { system("ls") }')
    with pytest.raises(AwkError, match="division by zero"):
        _run("BEGIN { print 1/0 }")
    with pytest.raises(AwkError, match="step budget"):
        _run("BEGIN { while (1) x++ }")


# ------------------------------------ reference parity corpus (ported)


@pytest.mark.parametrize(
    "codec,program,content,expected",
    [
        ("none", "{ }", "hello world", " "),
        ("none", '{ print "" }', "hello world", ""),
        ("none", '{ print json_get("obj.foo") }', '{"obj":{"foo":12}}', "12"),
        ("none", '{ print json_get("obj.bar") }', '{"obj":{"foo":12}}', "null"),
        ("none", '{ print json_get("obj.1.foo") }', '{"obj":[{"foo":11},{"foo":12}]}', "12"),
        ("none", '{ json_set("obj.1.foo", "nope") }', '{"obj":[{"foo":11},{"foo":12}]}', '{"obj":[{"foo":11},{"foo":"nope"}]}'),
        ("none", '{ print json_get("obj.foo") }', '{"obj":{"foo":"hello"}}', "hello"),
        ("none", '{ json_set("obj.foo", "hello world") }', "{}", '{"obj":{"foo":"hello world"}}'),
        ("none", '{ json_delete("obj.foo") }', '{"obj":{"foo":"hello world","bar":"baz"}}', '{"obj":{"bar":"baz"}}'),
        ("none", '{ json_set_int("obj.foo", 5) }', "{}", '{"obj":{"foo":5}}'),
        ("none", '{ json_set_float("obj.foo", 5.3) }', "{}", '{"obj":{"foo":5.3}}'),
        ("none", '{ json_set_bool("obj.foo", "foo" == "foo") }', "{}", '{"obj":{"foo":true}}'),
        ("json", "{ print obj_foo }", '{"obj":{"foo":"hello"}}', "hello"),
        ("none", '{ print create_json_object("foo", "1", "bar", "2", "baz", "3") }', "ignored", '{"bar":"2","baz":"3","foo":"1"}'),
        ("none", '{ print create_json_object("foo", "1", "bar", 2, "baz", "true") }', "ignored", '{"bar":"2","baz":"true","foo":"1"}'),
        ("none", "{ print create_json_object() }", "ignored", "{}"),
        ("none", '{ print create_json_array("1", 2, "3") }', "ignored", '["1","2","3"]'),
        ("none", "{ print create_json_array() }", "ignored", "[]"),
        ("none", '{ json_append("obj.foo", "hello world") }', "{}", '{"obj":{"foo":["hello world"]}}'),
        ("none", '{ json_append("obj.foo", "hello world") }', '{"0":"test"}', '{"0":"test","obj":{"foo":["hello world"]}}'),
        ("none", '{ json_append("obj.foo", "hello world") }', '{"obj":{"foo":"first"}}', '{"obj":{"foo":["first","hello world"]}}'),
        ("none", '{ json_append("obj.foo", "hello world") }', '{"obj":{"foo":["first",2]}}', '{"obj":{"foo":["first",2,"hello world"]}}'),
        ("none", '{ json_append_int("obj.foo", 1) }', "{}", '{"obj":{"foo":[1]}}'),
        ("none", '{ json_append_float("obj.foo", 1.2) }', "{}", '{"obj":{"foo":[1.2]}}'),
        ("none", '{ json_append_bool("obj.foo", 1) }', "{}", '{"obj":{"foo":[true]}}'),
        ("none", '{ json_append_bool("obj.foo", 0) }', "{}", '{"obj":{"foo":[false]}}'),
        ("none", '{ print json_type("foo") }', "{}", "undefined"),
        ("none", '{ print json_type("foo") }', '{"foo":null}', "null"),
        ("none", '{ print json_type("foo") }', '{"foo":5}', "float"),
        ("none", '{ print json_type("foo") }', '{"foo":"foo"}', "string"),
        ("none", '{ print json_type("foo") }', '{"foo":["foo",5,false]}', "array"),
        ("none", '{ print json_length("foo") }', '{"foo":"hello"}', "5"),
        ("none", '{ print json_length("foo") }', '{"foo":["a","b",3]}', "3"),
        ("none", '{ print json_length("nope") }', "{}", "0"),
        ("none", '{ print base64_encode("hello") }', "x", "aGVsbG8="),
        ("none", '{ print base64_decode("aGVsbG8=") }', "x", "hello"),
    ],
)
def test_reference_corpus(codec, program, content, expected):
    out, _meta = _msg(program, codec, content)
    assert out == expected


def test_reference_metadata_cases():
    out, meta = _msg('{ print metadata_get("meta.foo") }', "none", "hello world", {"meta.foo": "12"})
    assert out == "12"
    out, meta = _msg('{ print metadata_get("meta.bar") }', "none", "hello world", {"meta.foo": "12"})
    assert out == ""
    out, meta = _msg(
        '{ metadata_set("meta.foo", 24); metadata_set("meta.bar", "36") }',
        "none",
        "hello world",
        {"meta.foo": "12"},
    )
    assert out == "hello world"
    assert meta == {"meta.foo": "24", "meta.bar": "36"}


def test_reference_metadata_vars():
    # text codec: metadata becomes variables (dots -> underscores)
    out, _ = _msg('{ print $2 " " meta_foo }', "text", "hello world", {"meta.foo": "12"})
    assert out == "world 12"
    # json codec: flattened json + metadata vars
    out, _ = _msg('{ print obj_foo " " meta_foo }', "json", '{"obj":{"foo":"hello"}}', {"meta.foo": "12"})
    assert out == "hello 12"
    # none codec: NO metadata vars
    out, _ = _msg("{ print $2 meta_foo }", "none", "foo", {"meta.foo": "12"})
    assert out == ""


def test_reference_timestamps():
    stamp = "2018-12-18T11:57:32"
    out, _ = _msg("{ print timestamp_unix(foostamp) }", "text", "foo", {"foostamp": stamp})
    assert out == "1545134252"
    out, _ = _msg(
        '{ print timestamp_unix(foostamp, "2006TOTALLY01CUSTOM02T15:04:05") }',
        "text",
        "foo",
        {"foostamp": "2018TOTALLY12CUSTOM18T11:57:32"},
    )
    assert out == "1545134252"
    out, _ = _msg(
        '{ print timestamp_format(foostamp, "02 Jan 06 15:04") }',
        "text",
        "foo",
        {"foostamp": "1545134252"},
    )
    assert out == "18 Dec 18 11:57"
    out, _ = _msg(
        '{ print timestamp_format_nano(foostamp, "02 Jan 06 15:04:05.000000000") }',
        "text",
        "foo",
        {"foostamp": "1545134252123000064"},
    )
    assert out == "18 Dec 18 11:57:32.123000064"


def test_reference_exit_status_error():
    with pytest.raises(AwkError, match="non-zero exit"):
        _msg("{ exit 1; print foo }", "none", "hello world")


def test_reference_json_errors_passthrough_shape():
    # invalid json: json_get raises -> processor maps to _error, content
    # passes through (here we just check the exception carries through)
    with pytest.raises(AwkError, match="parse message into json"):
        _msg('{ print json_get("obj.bar") }', "none", "not json content")
    with pytest.raises(AwkError, match="parse part into json"):
        _msg("{ print foo_bar }", "json", "not json content")


def test_reference_doc_example_arithmetic():
    # the processor docs' flagship example (processor.go Example 1)
    program = """
    function map_add_vals() {
      json_set_int("doc.result", json_get("doc.val1") + json_get("doc.val2"));
    }
    function map_multiply_vals() {
      json_set_int("doc.result", json_get("doc.val1") * json_get("doc.val2"));
    }
    function map_unknown(type) {
      json_set("error","unknown document type");
    }
    {
      type = json_get("type");
      if (type == "add")
        map_add_vals();
      else if (type == "multiply")
        map_multiply_vals();
      else
        map_unknown(type);
    }
    """
    out, _ = _msg(program, "none", '{"doc":{"val1":5,"val2":10},"id":"1","type":"add"}')
    assert out == '{"doc":{"result":15,"val1":5,"val2":10},"id":"1","type":"add"}'
    out, _ = _msg(program, "none", '{"doc":{"val1":5,"val2":10},"id":"2","type":"multiply"}')
    assert out == '{"doc":{"result":50,"val1":5,"val2":10},"id":"2","type":"multiply"}'
    out, _ = _msg(program, "none", '{"doc":{},"id":"3","type":"nope"}')
    assert out == '{"doc":{},"error":"unknown document type","id":"3","type":"nope"}'


def test_reference_doc_example_array_dedupe():
    # processor docs Example 2: dedupe a JSON array via json_append
    program = """
    {
      array_path = "path.to.foos"
      array_len = json_length(array_path)

      for (i = 0; i < array_len; i++) {
        ele = json_get(array_path "." i)
        if ( ! ( ele in seen ) ) {
          json_append(array_path "_unique", ele)
          seen[ele] = 1
        }
      }
    }
    """
    out, _ = _msg(program, "none", '{"path":{"to":{"foos":["one","two","three","two","four"]}}}')
    assert out == '{"path":{"to":{"foos":["one","two","three","two","four"],"foos_unique":["one","two","three","four"]}}}'


# --------------------------------------------------------- Spark layer


def test_awk_processor_spark(spark):
    import pandas as pd

    from benthos_spark.config import _proc

    pdf = pd.DataFrame(
        {
            "content": [
                '{"doc":{"val1":5,"val2":10},"type":"add"}',
                "plain text row",
                "not json",
            ]
        }
    )
    df = spark.createDataFrame(pdf)
    p = _proc(
        {
            "awk": {
                "codec": "none",
                "program": '{ json_set_int("doc.result", json_get("doc.val1") + json_get("doc.val2")); }',
            }
        }
    )
    rows = {r.content: r for r in p(df).collect()}
    assert '{"doc":{"result":15,"val1":5,"val2":10},"type":"add"}' in rows
    # non-json rows pass through with _error set
    bad = rows["not json"]
    assert bad._error and "json" in bad._error


def test_awk_processor_text_codec_spark(spark):
    import pandas as pd

    from benthos_spark.operators.awk import AwkProcessor

    pdf = pd.DataFrame({"content": ["10 20", "3 4"]})
    df = spark.createDataFrame(pdf)
    p = AwkProcessor(program="{ print $1 + $2 }", codec="text")
    out = sorted(r.content for r in p(df).collect())
    assert out == ["30", "7"]


def test_awk_bad_program_fails_compile():
    from benthos_spark.operators.awk import AwkProcessor

    with pytest.raises(AwkError):
        AwkProcessor(program="{ print ( }", codec="none")
