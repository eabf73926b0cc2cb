"""Bloblang expression-layer parity tests (SURVEY.md §2.5): each helper
mirrors one reference method (cites in benthos_spark/functions/bloblang.py)
and must produce the value the reference's interpreter would."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions import bloblang as bl


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("  Hello World. ", 3, [3, 1, 2], {"a": 1, "b": 2}, "2024-03-01 01:42:03")],
        "s string, n int, arr array<int>, m map<string,int>, ts_str string",
    ).withColumn("ts", F.to_timestamp("ts_str"))


def one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


def test_string_methods(df):
    assert one(df, bl.uppercase(F.trim("s"))) == "HELLO WORLD."
    assert one(df, bl.lowercase(F.trim("s"))) == "hello world."
    assert one(df, bl.capitalize(F.lit("hello world"))) == "Hello World"
    assert one(df, bl.trim("s")) == "Hello World."
    assert one(df, bl.trim_prefix(F.lit("abc_x"), "abc_")) == "x"
    assert one(df, bl.trim_prefix(F.lit("zbc_x"), "abc_")) == "zbc_x"
    assert one(df, bl.trim_suffix(F.lit("x.wav"), ".wav")) == "x"
    assert one(df, bl.has_prefix(F.trim("s"), "Hello"))
    assert one(df, bl.has_suffix(F.trim("s"), "."))
    assert one(df, bl.index_of(F.lit("hello"), "llo")) == 2
    assert one(df, bl.index_of(F.lit("hello"), "zzz")) == -1
    assert one(df, bl.encode_b64(F.lit("hi"))) == "aGk="
    assert one(df, bl.decode_b64(F.lit("aGk="))) == bytearray(b"hi")
    assert one(df, bl.encode_hex(F.lit("hi"))) == "6869"
    assert one(df, bl.replace_all(F.lit("a.b.c"), ".", "-")) == "a-b-c"
    assert one(df, bl.re_replace_all(F.lit("a1b22c"), r"\d+", "#")) == "a#b#c"
    assert one(df, bl.re_match(F.lit("abc123"), r"\d+"))
    assert one(df, bl.re_find_all(F.lit("a1 b22"), r"\d+")) == ["1", "22"]
    assert one(df, bl.split(F.lit("a.b.c"), ".")) == ["a", "b", "c"]
    assert one(df, bl.join(F.lit(["a", "b"]), "-")) == "a-b"
    assert one(df, bl.format_("%s=%03d", F.lit("k"), F.lit(7))) == "k=007"
    assert one(df, bl.reverse(F.lit("abc"))) == "cba"
    assert one(df, bl.length(F.lit("héllo"))) == 5
    assert one(df, bl.slice_(F.lit("hello"), 1, 3)) == "el"
    assert one(df, bl.strip_html(F.lit("<b>hi</b> there"))) == "hi there"
    assert len(one(df, bl.hash_(F.lit("x"), "sha256"))) == 64
    assert one(df, bl.hash_(F.lit("x"), "md5")) == "9dd4e461268c8034f5c8564e155c67a6"


def test_number_methods(df):
    assert one(df, bl.floor(F.lit(3.7))) == 3
    assert one(df, bl.ceil(F.lit(3.2))) == 4
    assert one(df, bl.round_(F.lit(3.456), 2)) == 3.46
    assert one(df, bl.abs_(F.lit(-5))) == 5
    assert one(df, bl.max_(F.lit(1), F.lit(9), F.lit(4))) == 9
    assert one(df, bl.min_(F.lit(1), F.lit(9), F.lit(4))) == 1
    assert one(df, bl.number(F.lit("3.5"))) == 3.5
    assert one(df, bl.number(F.lit("nope"))) is None


def test_time_methods(df):
    import datetime as dt

    assert one(df, bl.ts_round("ts", "hour")) == dt.datetime(2024, 3, 1, 1, 0, 0)
    assert one(df, bl.ts_format("ts", "yyyy-MM-dd HH")) == "2024-03-01 01"
    assert one(df, bl.ts_unix("ts")) == 1709257323
    assert one(df, bl.ts_unix_milli("ts")) == 1709257323000
    assert one(df, bl.ts_sub("ts", bl.ts_round("ts", "hour"))) == 42 * 60 + 3
    assert one(df, bl.ts_add_seconds("ts", 57)) == dt.datetime(2024, 3, 1, 1, 43, 0)
    assert one(df, bl.ts_parse(F.lit("01/03/2024"), "dd/MM/yyyy")) == dt.datetime(2024, 3, 1)


def test_array_methods(df):
    assert one(df, bl.all_("arr", lambda x: x > 0))
    assert not one(df, bl.all_("arr", lambda x: x > 1))
    assert one(df, bl.any_("arr", lambda x: x == 2))
    assert one(df, bl.append("arr", 9)) == [3, 1, 2, 9]
    assert one(df, bl.contains("arr", 3))
    assert one(df, bl.filter_("arr", lambda x: x >= 2)) == [3, 2]
    assert one(df, bl.map_each("arr", lambda x: x * 10)) == [30, 10, 20]
    assert one(df, bl.fold("arr", 0, lambda acc, v: acc + v)) == 6
    assert one(df, bl.sum_("arr")) == 6.0
    assert one(df, bl.flatten(F.lit([[1], [2, 3]]))) == [1, 2, 3]
    assert one(df, bl.index("arr", 0)) == 3
    assert one(df, bl.index("arr", -1)) == 2
    assert one(df, bl.sort("arr")) == [1, 2, 3]
    assert one(df, bl.sort_by("arr", lambda x: -x)) == [3, 2, 1]
    assert one(df, bl.unique(F.lit([1, 1, 2]))) == [1, 2]
    assert [r.asDict() for r in one(df, bl.enumerated(F.lit(["a", "b"])))] == [
        {"index": 0, "value": "a"},
        {"index": 1, "value": "b"},
    ]
    zipped = [tuple(r) for r in one(df, bl.zip_(F.lit([1, 2]), F.lit([3, 4])))]
    assert zipped == [(1, 3), (2, 4)]
    assert one(df, bl.concat_arrays(F.lit([1]), F.lit([2]))) == [1, 2]


def test_object_methods(df):
    assert sorted(one(df, bl.keys("m"))) == ["a", "b"]
    assert sorted(one(df, bl.values("m"))) == [1, 2]
    kv = one(df, bl.key_values("m"))
    assert {e["key"]: e["value"] for e in kv} == {"a": 1, "b": 2}
    merged = one(df, bl.merge("m", F.create_map(F.lit("c"), F.lit(3))))
    assert merged == {"a": 1, "b": 2, "c": 3}
    st = F.struct(F.lit(1).alias("x"), F.lit(2).alias("y"), F.lit(3).alias("z"))
    assert one(df, bl.without(st, "y")).asDict() == {"x": 1, "z": 3}
    assert one(df, bl.with_only(st, "y")).asDict() == {"y": 2}
    assert one(df, bl.get(F.struct(st.alias("inner")), "inner.z")) == 3
    assert one(df, bl.or_(F.lit(None).cast("int"), 7)) == 7
    assert one(df, bl.type_of(F.lit(1.5))) == "number"  # Bloblang type names


def test_json_functions(df):
    j = F.lit('{"a": {"b": 42}, "tags": ["x"]}')
    assert one(df, bl.json_path(j, "a.b")) == "42"
    assert one(df, bl.json_path(j, "$.tags[0]")) == "x"
    parsed = one(df, bl.parse_json(j, "a struct<b:int>, tags array<string>"))
    assert parsed["a"]["b"] == 42 and parsed["tags"] == ["x"]
    assert one(df, bl.format_json(F.struct(F.lit(1).alias("k")))) == '{"k":1}'
    csv = one(df, bl.parse_csv(F.lit("1,x"), "a int, b string"))
    assert csv["a"] == 1 and csv["b"] == "x"


def test_interpolation(df):
    got = one(df, bl.interpolate("n=${! n * 2 }, s=${! trim(s) } end"))
    assert got == "n=6, s=Hello World. end"
    assert one(df, bl.interpolate("static only")) == "static only"
    assert one(df, bl.interpolate("${! n }")) == "3"


def test_functions(df):
    assert one(df, bl.range_(0, 4)) == [0, 1, 2, 3]
    assert len(one(df, bl.uuid_v4())) == 36
    v = one(df, bl.random_int(100))
    assert 0 <= v < 100
    assert one(df, bl.timestamp_unix()) > 1_700_000_000


def test_xml_functions(df):
    x = F.lit("<item><id>7</id><name>disk</name></item>")
    parsed = one(df, bl.parse_xml(x, "id int, name string"))
    assert parsed["id"] == 7 and parsed["name"] == "disk"
    rendered = one(df, bl.format_xml(F.struct(F.lit(3).alias("n"))))
    assert "<n>3</n>" in rendered


def test_object_extras(spark, df):
    assert one(df, bl.catch_(F.lit(None).cast("int"), 9)) == 9
    assert one(df, bl.catch_(F.try_divide(F.lit(1), F.lit(0)), -1.0)) == -1.0
    assert one(df, bl.not_empty(F.lit(""))) is None
    assert one(df, bl.not_empty(F.lit("x"))) == "x"
    form = one(df, bl.parse_form_url_encoded(F.lit("a=1&b=hello%20world")))
    assert form == {"a": "1", "b": "hello world"}
    sq = one(
        df,
        bl.squash([
            F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)),
            F.create_map(F.lit("b"), F.lit(9), F.lit("c"), F.lit(3)),
        ]),
    )
    assert sq == {"a": 1, "b": 9, "c": 3}


def test_collapse(spark):
    d = spark.createDataFrame(
        [((1, ("x", 2.5)),)], "s struct<a:int, inner:struct<name:string, v:double>>"
    )
    got = d.select(bl.collapse(d, "s").alias("m")).collect()[0]["m"]
    assert got == {"a": "1", "inner.name": "x", "inner.v": "2.5"}


def test_crypto_and_ids(spark, df):
    key = F.lit("0123456789abcdef")  # 16-byte AES key
    enc = bl.encrypt_aes(F.lit("secret payload"), key)
    dec = one(df, bl.decrypt_aes(enc, key).cast("string"))
    assert dec == "secret payload"

    assert one(df, bl.escape_html(F.lit('<a href="x">&'))) == "&lt;a href=&#34;x&#34;&gt;&amp;"
    assert one(df, bl.unescape_html(bl.escape_html(F.lit("<b>'hi'</b>")))) == "<b>'hi'</b>"

    assert one(df, bl.filepath_join(F.lit("a"), F.lit("b"), F.lit("c.wav"))) == "a/b/c.wav"
    fp = one(df, bl.filepath_split(F.lit("x/y/z.txt")))
    assert (fp["dir"], fp["file"]) == ("x/y", "z.txt")
    fp2 = one(df, bl.filepath_split(F.lit("plain.txt")))
    assert (fp2["dir"], fp2["file"]) == ("", "plain.txt")

    sid = one(df, bl.snowflake_id(machine_id=3))
    assert sid > (1 << 50)  # 41-bit millis shifted left 22
    u = one(df, bl.ulid())
    assert len(u) == 26 and all(ch in bl._CROCKFORD for ch in u)
    assert len(one(df, bl.nanoid())) == 21
    k = one(df, bl.ksuid())
    assert len(k) == 27


def test_remaining_helpers(spark, df):
    assert one(df, bl.decode_hex(F.lit("6869"))) == bytearray(b"hi")
    assert one(df, bl.escape_url_query(F.lit("a b&c"))) == "a+b%26c"
    assert one(df, bl.unescape_url_query(F.lit("a+b%26c"))) == "a b&c"
    assert one(df, bl.parse_url(F.lit("https://h.io/p?q=1"), "HOST")) == "h.io"
    assert one(df, bl.parse_url(F.lit("https://h.io/p?q=1"), "PATH")) == "/p"
    assert one(df, bl.map_each_key("m", lambda k: F.upper(k))) in ({"A": 1, "B": 2},)
    assert one(df, bl.hash_(F.lit("x"), "xxhash64")) is not None
    assert one(df, bl.hash_(F.lit("x"), "crc32")) is not None
    assert one(df, bl.trim(F.lit("xxabcxx"), "x")) == "abc"
    v = one(df, bl.counter())
    assert isinstance(v, int)


def test_quote(spark):
    from benthos_spark.functions import bloblang as B

    df = spark.createDataFrame([('he said "hi"\tok',), ("plain",)], "s string")
    got = {r["s"]: r["q"] for r in df.select("s", B.quote("s").alias("q")).collect()}
    assert got["plain"] == '"plain"'
    assert got['he said "hi"\tok'] == '"he said \\"hi\\"\\tok"'


def test_interpolation_accepts_bloblang_queries(spark, df):
    import benthos_spark.functions.bloblang as bl

    out = df.select(
        bl.interpolate("v-${! this.s.trim().uppercase() }-${! n * 2 }").alias("x")
    ).collect()
    assert any(r["x"].startswith("v-") and r["x"].endswith("-6") for r in out)
