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
