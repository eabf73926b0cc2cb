"""Source readers: file codec chains (internal/codec/reader.go:193-311
semantics — lines/csv/gzip/tar, chainable), parquet streaming, fan-in."""

from __future__ import annotations

import gzip
import io
import os
import tarfile

from benthos_spark.sources.readers import FileSource, fan_in


def test_lines_codec(spark, tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("one\ntwo\nthree")
    rows = FileSource(str(p), codec="lines").read(spark).collect()
    assert sorted(r["value"] for r in rows) == ["one", "three", "two"]


def test_gzip_lines_codec(spark, tmp_path):
    p = tmp_path / "a.gz"
    p.write_bytes(gzip.compress(b"x\ny\nz"))
    rows = FileSource(str(p), codec="gzip/lines").read(spark).collect()
    assert sorted(r["line"] for r in rows) == ["x", "y", "z"]
    assert all(r["path"].endswith("a.gz") for r in rows)


def test_tar_lines_codec(spark, tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, content in (("f1.txt", b"a\nb"), ("f2.txt", b"c")):
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))
    p = tmp_path / "a.tar"
    p.write_bytes(buf.getvalue())
    rows = FileSource(str(p), codec="tar/lines").read(spark).collect()
    assert sorted(r["line"] for r in rows) == ["a", "b", "c"]
    assert any(r["path"].endswith("!f1.txt") for r in rows)


def test_csv_codec(spark, tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("x,y\n1,foo\n2,bar\n")
    rows = FileSource(str(p), codec="csv").read(spark).collect()
    assert {(r["x"], r["y"]) for r in rows} == {("1", "foo"), ("2", "bar")}


def test_fan_in_union(spark):
    a = spark.createDataFrame([(1, "a")], "id int, s string")
    b = spark.createDataFrame([(2,)], "id int")
    out = fan_in(a, b)
    got = {(r["id"], r["s"]) for r in out.collect()}
    assert got == {(1, "a"), (2, None)}


# -- codec chain scanners (internal/codec/reader.go:193-311) -----------------

import pytest


@pytest.fixture(scope="module")
def codec_dir(tmp_path_factory):
    import gzip as _gz
    import tarfile as _tar
    import io as _io

    d = tmp_path_factory.mktemp("codecs")
    (d / "plain.txt").write_bytes(b"l1\nl2\nl3")
    (d / "bom.txt").write_bytes(b"\xef\xbb\xbfline1\nline2")
    (d / "data.gz").write_bytes(_gz.compress(b"ga\ngb"))
    (d / "chunk.bin").write_bytes(b"abcdefgh")
    (d / "delim.txt").write_bytes(b"one|two|three")
    (d / "log.txt").write_bytes(b"2024-01-01 start\ndetail a\n2024-01-02 next\ndetail b\n")
    buf = _io.BytesIO()
    with _tar.open(fileobj=buf, mode="w") as tf:
        for name, data in [("x.txt", b"xx1\nxx2"), ("y.txt", b"yy")]:
            ti = _tar.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, _io.BytesIO(data))
    (d / "arch.tar.gz").write_bytes(_gz.compress(buf.getvalue()))
    return d


def _lines(spark, path, codec):
    from benthos_spark.sources.readers import FileSource

    return [r["line"] for r in FileSource(str(path), codec=codec).read(spark).collect()]


def test_codec_skipbom(spark, codec_dir):
    got = _lines(spark, codec_dir / "bom.txt", "skipbom/lines")
    assert got == ["line1", "line2"]


def test_codec_chunker(spark, codec_dir):
    got = _lines(spark, codec_dir / "chunk.bin", "chunker:3")
    assert got == ["abc", "def", "gh"]


def test_codec_delim(spark, codec_dir):
    got = _lines(spark, codec_dir / "delim.txt", "delim:|")
    assert got == ["one", "two", "three"]


def test_codec_regex_sections(spark, codec_dir):
    got = _lines(spark, codec_dir / "log.txt", r"regex:\d{4}-\d{2}-\d{2}")
    assert len(got) == 2
    assert got[0].startswith("2024-01-01") and "detail a" in got[0]
    assert got[1].startswith("2024-01-02") and "detail b" in got[1]


def test_codec_chained_gzip_tar_lines(spark, codec_dir):
    got = sorted(_lines(spark, codec_dir / "arch.tar.gz", "gzip/tar/lines"))
    assert got == ["xx1", "xx2", "yy"]


def test_codec_chained_gzip_delim(spark, codec_dir):
    import gzip as _gz

    p = codec_dir / "gz_delim.gz"
    p.write_bytes(_gz.compress(b"a;b;c"))
    assert _lines(spark, p, "delim:;") != ["a", "b", "c"]  # without gzip: garbage
    assert _lines(spark, p, "gzip/delim:;") == ["a", "b", "c"]


def test_codec_auto_detect(spark, codec_dir):
    got = sorted(_lines(spark, codec_dir / "arch.tar.gz", "auto"))
    assert got == ["xx1\nxx2", "yy"]  # auto: gzip/tar/all-bytes per file
    assert _lines(spark, codec_dir / "data.gz", "auto") == ["ga", "gb"]


def test_codec_all_bytes(spark, codec_dir):
    got = _lines(spark, codec_dir / "plain.txt", "all-bytes")
    assert got == ["l1\nl2\nl3"]


def test_py_files_package_is_importable(tmp_path):
    """tools/package.py builds the spark-submit --py-files artifact; the
    zip must be importable standalone (zipimport), matching how
    executors resolve UDF closures on a real cluster."""
    import subprocess
    import sys

    from tools.package import build

    out = build(str(tmp_path / "benthos_spark.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import benthos_spark.functions.bloblang, benthos_spark.bloblang.parser, "
        "benthos_spark.functions.jq_program as jq; "
        "assert jq.JqProgram('.a').run({'a': 1}) == [1]; print('ok')"
    ) % out
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd="/")
    assert r.returncode == 0 and r.stdout.strip() == "ok", r.stderr


def test_dynamic_input_set_mutation(spark):
    """`dynamic` input (io/input_dynamic.go): labelled children added /
    removed between runs; the read resolves the current set."""
    from benthos_spark.sources.readers import DynamicSet, DynamicSource, GenerateSource

    reg = DynamicSet(
        a=GenerateSource(mapping={"v": "value"}, count=3, streaming=False),
    )
    src = DynamicSource(reg)
    assert src.read(spark).count() == 3
    reg.set("b", GenerateSource(mapping={"v": "value + 100"}, count=2, streaming=False))
    assert src.read(spark).count() == 5
    reg.remove("a")
    assert src.read(spark).count() == 2


def test_dynamic_output_swap_between_batches(spark, tmp_path):
    """`dynamic` output: the target sink is re-resolved per micro-batch,
    so a swap applies at the next batch boundary."""
    from benthos_spark.sinks.routing import DynamicSink, InprocSink, inproc_clear, inproc_read
    from benthos_spark.sources.readers import DynamicSet

    inproc_clear()
    reg = DynamicSet(one=InprocSink("chan_one"), two=InprocSink("chan_two"))
    sink = DynamicSink(reg, selected="one")
    df1 = spark.createDataFrame([(1,)], "v int")
    df2 = spark.createDataFrame([(2,)], "v int")
    sink(df1, 0)
    sink.select("two")
    sink(df2, 1)
    assert [r["v"] for r in inproc_read("chan_one").collect()] == [1]
    assert [r["v"] for r in inproc_read("chan_two").collect()] == [2]
    inproc_clear()
