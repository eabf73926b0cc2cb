"""`subprocess` / `command` processors (operators/subproc.py) — pipe
message content through external programs, reference semantics
(processor_subprocess.go / processor_command.go)."""

from __future__ import annotations

import json
import sys

import pytest

from benthos_spark.operators.subproc import Command, Subprocess, _encode_frame

# a deterministic line-oriented echo-transform child: upper-cases each
# line; a line containing "ERR" goes to stderr instead
_CHILD = (
    "import sys\n"
    "for line in sys.stdin:\n"
    "    line = line.rstrip('\\n')\n"
    "    if 'ERR' in line:\n"
    "        print('bad:' + line, file=sys.stderr, flush=True)\n"
    "    else:\n"
    "        print(line.upper(), flush=True)\n"
)

# netstring echo child (reads len:payload, frames, answers in kind)
_NS_CHILD = (
    "import sys\n"
    "r, w = sys.stdin.buffer, sys.stdout.buffer\n"
    "while True:\n"
    "    n = b''\n"
    "    ch = r.read(1)\n"
    "    if not ch: break\n"
    "    while ch != b':':\n"
    "        n += ch\n"
    "        ch = r.read(1)\n"
    "    p = r.read(int(n)); r.read(1)\n"
    "    out = p[::-1]\n"
    "    w.write(str(len(out)).encode() + b':' + out + b',')\n"
    "    w.flush()\n"
)


def test_encode_frames():
    assert _encode_frame(b"abc", "lines") == b"abc\n"
    assert _encode_frame(b"abc", "netstring") == b"3:abc,"
    assert _encode_frame(b"abc", "length_prefixed_uint32_be") == b"\x00\x00\x00\x03abc"
    with pytest.raises(ValueError):
        _encode_frame(b"x", "nope")


def test_subprocess_lines_replace_and_stderr_marks_failed(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "ERR-this"), (3, "world")], "i int, value string"
    )
    out = Subprocess(name=sys.executable, args=["-c", _CHILD])(df)
    rows = {r.i: r for r in out.collect()}
    assert rows[1].value == "HELLO" and rows[1]._error is None
    assert rows[3].value == "WORLD" and rows[3]._error is None
    # stderr response: content unchanged, message marked failed
    assert rows[2].value == "ERR-this" and rows[2]._error == "bad:ERR-this"


def test_subprocess_netstring_codec(spark):
    df = spark.createDataFrame([(1, "abcdef")], "i int, value string")
    out = Subprocess(
        name=sys.executable, args=["-c", _NS_CHILD],
        codec_send="netstring", codec_recv="netstring",
    )(df)
    assert out.collect()[0].value == "fedcba"


def test_subprocess_validation():
    with pytest.raises(ValueError):
        Subprocess()
    with pytest.raises(ValueError):
        Subprocess(name="cat", codec_send="nope")


def test_command_static_and_stderr_meta(spark):
    df = spark.createDataFrame([(1, "x\ny"), (2, "z")], "i int, value string")
    # `sort` reads stdin fully, writes sorted lines to stdout
    out = Command(name="sort")(df)
    rows = {r.i: r for r in out.collect()}
    assert rows[1].value == "x\ny\n" and rows[1]._error is None
    assert rows[2].value == "z\n"
    assert rows[1].command_stderr is None


def test_command_nonzero_exit_marks_failed(spark):
    df = spark.createDataFrame([(1, "whatever")], "i int, value string")
    out = Command(name=sys.executable, args_mapping='["-c", "import sys; sys.exit(3)"]')(df)
    r = out.collect()[0]
    assert r.value == "whatever"
    assert "exit 3" in r._error


def test_command_dynamic_name_and_args(spark):
    # the reference's headline example: structured messages carry the
    # command to run ({"command": "echo", "args": ["foo"]})
    docs = [
        {"command": "echo", "args": ["foo"]},
        {"command": "echo", "args": ["bar", "baz"]},
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i int, value string"
    )
    out = Command(name="${! this.command }", args_mapping="this.args")(df)
    rows = {r.i: r for r in out.collect()}
    assert rows[0].value == "foo\n"
    assert rows[1].value == "bar baz\n"


def test_command_args_mapping_must_be_list(spark):
    df = spark.createDataFrame([(1, '{"a": 1}')], "i int, value string")
    r = Command(name="echo", args_mapping="this.a")(df).collect()[0]
    assert r.value == '{"a": 1}' and "must return a list" in r._error


def test_subprocess_source(spark):
    from benthos_spark.operators.subproc import SubprocessSource

    src = SubprocessSource(name=sys.executable, args=["-c", "print('a'); print('b')"])
    rows = sorted(r.value for r in src.read(spark).collect())
    assert rows == ["a", "b"]
    # empty stdout → zero rows, stable schema
    empty = SubprocessSource(name=sys.executable, args=["-c", "pass"]).read(spark)
    assert empty.count() == 0 and empty.columns == ["value"]
    # non-zero exit fails the read
    with pytest.raises(RuntimeError):
        SubprocessSource(
            name=sys.executable, args=["-c", "import sys; sys.exit(2)"]
        ).read(spark)
    with pytest.raises(ValueError):
        SubprocessSource()


def test_subprocess_sink(spark, tmp_path):
    from benthos_spark.operators.subproc import SubprocessSink

    out = tmp_path / "sink_out.txt"
    df = spark.createDataFrame([("r1",), ("r2",), ("r3",)], "value string").coalesce(1)
    # child appends its stdin to a file (one child per partition)
    child = f"import sys\nopen({str(out)!r}, 'a').write(sys.stdin.read())\n"
    SubprocessSink(name=sys.executable, args=["-c", child])(df, batch_id=0)
    assert sorted(out.read_text().splitlines()) == ["r1", "r2", "r3"]
    # non-zero exit fails the batch
    with pytest.raises(Exception):
        SubprocessSink(
            name=sys.executable, args=["-c", "import sys; sys.stdin.read(); sys.exit(1)"]
        )(df, batch_id=1)


def test_config_wiring(spark):
    from benthos_spark.config import _proc

    df = spark.createDataFrame([(1, "hi")], "i int, value string")
    p = _proc({"subprocess": {"name": sys.executable, "args": ["-c", _CHILD]}})
    assert p(df).collect()[0].value == "HI"
    c = _proc({"command": {"name": "sort"}})
    assert c(df).collect()[0].value == "hi\n"
    # input + output config blocks
    from benthos_spark.config import _input, _output

    src = _input({"subprocess": {"name": sys.executable, "args": ["-c", "print('x')"]}})
    assert [r.value for r in src.read(spark).collect()] == ["x"]
    sink = _output({"subprocess": {"name": "cat"}})
    sink(df, batch_id=0)  # cat to stdout: just must not raise
