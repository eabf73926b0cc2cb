"""Per-processor unit tests, modeled on the reference's colocated
`_test.go` pattern (SURVEY.md §5 layer 1): build the processor, feed a
small batch, assert outputs/errors."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.processors import (
    Archive,
    Branch,
    Catch,
    Compress,
    Decompress,
    Filter,
    Grok,
    InsertPart,
    JsonSchema,
    Mapping,
    Mutation,
    ParseLog,
    SelectParts,
    Split,
    Switch,
    Tag,
    Try,
    Unarchive,
    Workflow,
    compose,
    grok_to_regex,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0), (3, "gamma", 30.0), (4, "delta", 40.0)],
        "id int, name string, score double",
    )


def test_mapping_replaces_document(df):
    out = Mapping({"key": F.col("id") * 100, "upper": F.upper("name")})(df)
    assert out.columns == ["key", "upper"]
    assert out.filter("key = 200").collect()[0]["upper"] == "BETA"


def test_mutation_keeps_document(df):
    out = Mutation({"double_score": F.col("score") * 2})(df)
    assert set(out.columns) == {"id", "name", "score", "double_score"}


def test_switch_first_match_wins(df):
    out = Switch(
        cases=[
            (F.col("id") <= 2, [Mutation({"route": F.lit("low")})]),
            (F.col("id") <= 3, [Mutation({"route": F.lit("mid")})]),
            (None, [Mutation({"route": F.lit("high")})]),
        ]
    )(df)
    got = {r["id"]: r["route"] for r in out.collect()}
    assert got == {1: "low", 2: "low", 3: "mid", 4: "high"}


def test_branch_request_result_map(df):
    out = Branch(
        request_cols=["id"],
        processors=[Mutation({"sq": F.col("id") * F.col("id")})],
        result_exprs={"squared": F.col("sq")},
    )(df)
    got = {r["id"]: r["squared"] for r in out.collect()}
    assert got == {1: 1, 2: 4, 3: 9, 4: 16}
    assert "sq" not in out.columns  # request/result isolation


def test_try_catch_error_routing(df):
    chain = [
        Tag(cond=F.col("id") % 2 == 0, message=F.lit("even id")),
        Try([Mutation({"val": F.col("score") * 10})]),
        Catch([Mutation({"val": F.lit(-1.0)})]),
    ]
    out = compose(df, chain)
    got = {r["id"]: (r["val"], r["_error"]) for r in out.collect()}
    assert got[1] == (100.0, None)
    assert got[2] == (-1.0, None)  # recovered + error cleared


def test_archive_unarchive_roundtrip(df):
    arch = Archive(group_cols=[], payload=F.col("name"), fmt="lines", out_col="blob")(df)
    restored = Unarchive(col="blob", fmt="lines", out_col="name")(arch)
    assert sorted(r["name"] for r in restored.collect()) == ["alpha", "beta", "delta", "gamma"]


def test_insert_part(df):
    out = InsertPart({"id": 99, "name": "sentinel", "score": 0.0})(df)
    assert out.count() == 5
    assert out.filter("id = 99").count() == 1


def test_select_parts(df):
    out = SelectParts(order_by=F.col("id").desc(), indices=[0])(df)
    assert [r["id"] for r in out.collect()] == [4]


def test_split_repartitions(df):
    assert Split(2)(df).rdd.getNumPartitions() == 2


def test_compress_decompress_roundtrip(spark):
    df = spark.createDataFrame([(b"hello world " * 50,)], "payload binary")
    out = compose(df, [Compress("payload"), Decompress("payload")])
    assert bytes(out.collect()[0]["payload"]) == b"hello world " * 50
    compressed = Compress("payload")(df).collect()[0]["payload"]
    assert len(compressed) < 600
    assert zlib.decompress(bytes(compressed)) == b"hello world " * 50


def test_grok_to_regex():
    regex, names = grok_to_regex("%{INT:a} then %{WORD:b}")
    assert names == ["a", "b"]
    import re

    m = re.match(regex, "-42 then xyz")
    assert m.group(1) == "-42" and m.group(2) == "xyz"


def test_grok_processor(spark):
    df = spark.createDataFrame([("2024-03-01T01:02:03 ERROR svc-a boom",)], "line string")
    out = Grok(
        "line",
        "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{NOTSPACE:svc} %{GREEDYDATA:msg}",
    )(df).collect()[0]
    assert out["level"] == "ERROR" and out["svc"] == "svc-a" and out["msg"] == "boom"


def test_parse_log(spark):
    df = spark.createDataFrame([("2024-03-01T01:02:03 WARN svc-b disk low",)], "line string")
    out = ParseLog("line", "app_log")(df).collect()[0]
    assert out["level"] == "WARN" and out["message"] == "disk low"
    assert out["ts"].year == 2024


def test_json_schema_validation(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": "bad"}'), (3, '{"other": 1}')], "id int, props string"
    )
    out = JsonSchema("props", required={"k": "int"})(df)
    got = {r["id"]: r["_error"] for r in out.collect()}
    assert got[1] is None
    assert got[2] == "field k is not int"
    assert got[3] == "missing required field k"


def test_workflow_dag_ordering(df):
    wf = Workflow(
        stages={
            "c": (["b"], Mutation({"v3": F.col("v2") + 1})),
            "a": ([], Mutation({"v1": F.col("id") * 2})),
            "b": (["a"], Mutation({"v2": F.col("v1") * 10})),
        }
    )
    assert wf.order() == ["a", "b", "c"]
    out = wf(df).filter("id = 2").collect()[0]
    assert (out["v1"], out["v2"], out["v3"]) == (4, 40, 41)


def test_workflow_cycle_detection():
    wf = Workflow(stages={"a": (["b"], lambda d: d), "b": (["a"], lambda d: d)})
    with pytest.raises(ValueError, match="cycle"):
        wf.order()


def test_filter(df):
    assert Filter(F.col("score") > 25)(df).count() == 2


def test_while_loop(spark):
    from benthos_spark.operators.processors import While

    df = spark.createDataFrame([(1,), (40,)], "v int")
    # per-row loop: double v while THAT row is below 100
    w = While(
        cond=F.col("v") < 100,
        processors=[Mutation({"v": F.col("v") * 2})],
        max_loops=20,
    )
    got = sorted(r["v"] for r in w(df).collect())
    assert got == [128, 160]  # 1 doubles 7x -> 128; 40 doubles 2x -> 160


def test_cached_memoizes(spark):
    from benthos_spark.operators.processors import Cached

    calls = []

    class Counting(Mutation):
        def __call__(self, df):
            calls.append(1)
            return super().__call__(df)

    df = spark.createDataFrame([(1,)], "v int")
    proc = Cached([Counting({"w": F.col("v") + 1})], key="test-cached-1")
    a = proc(df)
    b = proc(df)
    assert len(calls) == 1  # second call served from the registry
    assert a is b
    Cached.REGISTRY.pop("test-cached-1")[0].unpersist()


def test_generate_source_batch(spark):
    from benthos_spark.sources.readers import GenerateSource

    src = GenerateSource(
        mapping={"clip_no": "value", "codec": F.lit("pcm_s16le")}, count=5, streaming=False
    )
    rows = src.read(spark).collect()
    assert len(rows) == 5
    assert rows[0]["codec"] == "pcm_s16le"


def test_sequence_source(spark):
    from benthos_spark.sources.readers import MemorySource, SequenceSource

    a = MemorySource(spark.createDataFrame([(1,)], "v int"))
    b = MemorySource(spark.createDataFrame([(2,)], "v int"))
    out = SequenceSource(children=(a, b)).read(spark)
    assert {(r["v"], r["_seq"]) for r in out.collect()} == {(1, 0), (2, 1)}


def test_metadata_model(spark):
    from benthos_spark.operators.processors import MetaFilter, WithMeta, meta_get

    df = spark.createDataFrame([(1, "pcm_s16le")], "id int, codec string")
    chain = [
        WithMeta({"kafka_topic": F.lit("clips"), "kafka_key": F.col("codec"), "tmp_debug": F.lit("x")}),
        WithMeta({"kafka_key": F.upper("codec")}),  # overwrite wins
        MetaFilter(include_prefixes=["kafka_"]),
    ]
    out = compose(df, chain)
    row = out.select(meta_get("kafka_topic").alias("t"), meta_get("kafka_key").alias("k"),
                     meta_get("tmp_debug").alias("d")).collect()[0]
    assert (row["t"], row["k"], row["d"]) == ("clips", "PCM_S16LE", None)


def test_switch_unmatched_passthrough(spark):
    """Reference parity: the processor switch passes non-matching
    messages through unchanged (processor_switch.go)."""
    df = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    out = Switch(cases=[(F.col("v") == 1, [Mutation({"tag": F.lit("one")})])])(df)
    got = {r["v"]: r["tag"] for r in out.collect()}
    assert got == {1: "one", 2: None, 3: None}


def test_while_null_condition_rows_survive(spark):
    """NULL loop conditions count as non-matching — the row is kept,
    not silently dropped (SQL three-valued logic trap)."""
    from benthos_spark.operators.processors import While

    df = spark.createDataFrame([(1,), (None,), (200,)], "v int")
    w = While(cond=F.col("v") < 100, processors=[Mutation({"v": F.col("v") * 2})], max_loops=20)
    got = sorted((r["v"] for r in w(df).collect()), key=lambda x: (x is None, x))
    assert got == [128, 200, None]


def test_branch_survives_cache_eviction(spark):
    """The general-path row id must stay aligned even when cached blocks
    are dropped mid-pipeline (localCheckpoint, not best-effort persist)."""
    df = spark.createDataFrame([(i, i * 10.0) for i in range(1, 101)], "id int, x double")
    out = Branch(
        request_cols=["id", "x"],
        # repartition forces the non-fused join-back path
        processors=[Split(partitions=4), Mutation({"sq": F.col("x") * F.col("x")})],
        result_exprs={"squared": F.col("sq")},
    )(df)
    spark.catalog.clearCache()
    got = {r["id"]: r["squared"] for r in out.collect()}
    assert got == {i: (i * 10.0) ** 2 for i in range(1, 101)}


@pytest.mark.parametrize("algorithm", ["zlib", "gzip", "pgzip", "flate"])
def test_compress_roundtrip_algorithms(spark, algorithm):
    from benthos_spark.operators.processors import Decompress

    df = spark.createDataFrame(
        [(b"hello world " * 50,), (b"\x00\xff binary \x01" * 20,)], "payload binary"
    )
    out = compose(df, [Compress("payload", algorithm=algorithm),
                       Decompress("payload", algorithm=algorithm)])
    got = sorted(bytes(r["payload"]) for r in out.collect())
    want = sorted([b"hello world " * 50, b"\x00\xff binary \x01" * 20])
    assert got == want
    # and it actually compresses
    comp = Compress("payload", algorithm=algorithm)(df).collect()[0]["payload"]
    assert len(comp) < len(b"hello world " * 50)


def test_compress_gated_algorithms_raise(spark):
    df = spark.createDataFrame([(b"x",)], "payload binary")
    for alg in ("snappy", "lz4", "zstd"):
        try:
            Compress("payload", algorithm=alg)(df).collect()
        except Exception as e:
            assert "NotImplementedError" in str(type(e)) or "needs" in str(e)
        else:  # pragma: no cover - only hit if the lib is installed
            pass


def test_archive_unarchive_tar_roundtrip(spark):
    df = spark.createDataFrame(
        [("g", "a.txt", b"alpha"), ("g", "b.txt", b"beta")],
        "grp string, fname string, payload binary",
    )
    arch = Archive(
        group_cols=["grp"], payload=F.col("payload"), fmt="tar",
        out_col="blob", name_col=F.col("fname"),
    )(df)
    assert arch.count() == 1
    restored = Unarchive(col="blob", fmt="tar", out_col="payload")(arch)
    got = {r["archive_name"]: bytes(r["payload"]) for r in restored.collect()}
    assert got == {"a.txt": b"alpha", "b.txt": b"beta"}


def test_archive_unarchive_zip_roundtrip(spark):
    df = spark.createDataFrame(
        [("g", "x", b"one"), ("g", "y", b"two"), ("h", "z", b"three")],
        "grp string, fname string, payload binary",
    )
    arch = Archive(
        group_cols=["grp"], payload=F.col("payload"), fmt="zip",
        out_col="blob", name_col=F.col("fname"),
    )(df)
    restored = Unarchive(col="blob", fmt="zip", out_col="payload")(arch)
    got = {(r["grp"], r["archive_name"]): bytes(r["payload"]) for r in restored.collect()}
    assert got == {("g", "x"): b"one", ("g", "y"): b"two", ("h", "z"): b"three"}


def test_archive_binary_blob_format(spark):
    """The length-prefixed batch blob must match the reference layout
    (message.go:79-99: u32 count, then u32 len + content per part)."""
    import struct

    df = spark.createDataFrame([("g", b"hello"), ("g", b"world")], "grp string, p binary")
    arch = Archive(group_cols=["grp"], payload=F.col("p"), fmt="binary", out_col="blob")(df)
    blob = bytes(arch.collect()[0]["blob"])
    (n,) = struct.unpack_from(">I", blob, 0)
    assert n == 2
    (l1,) = struct.unpack_from(">I", blob, 4)
    assert blob[8 : 8 + l1] in (b"hello", b"world")
    restored = Unarchive(col="blob", fmt="binary", out_col="p")(arch)
    assert sorted(bytes(r["p"]) for r in restored.collect()) == [b"hello", b"world"]


def test_unarchive_csv(spark):
    df = spark.createDataFrame([("id,name\n1,alpha\n2,beta",)], "doc string")
    out = Unarchive(col="doc", fmt="csv", out_col="rec")(df)
    got = sorted((r["rec"]["id"], r["rec"]["name"]) for r in out.collect())
    assert got == [("1", "alpha"), ("2", "beta")]


def test_unarchive_json_map(spark):
    df = spark.createDataFrame([('{"a": 1, "b": 2}',)], "doc string")
    out = Unarchive(col="doc", fmt="json_map", out_col="v", element_type="int")(df)
    got = {r["archive_key"]: r["v"] for r in out.collect()}
    assert got == {"a": 1, "b": 2}


def test_split_by_count_and_bytes(spark):
    df = spark.createDataFrame([(("x" * 100),) for _ in range(40)], "payload string")
    assert Split(count=10)(df).rdd.getNumPartitions() == 4
    assert Split(byte_size=1000, size_col="payload")(df).rdd.getNumPartitions() == 4


def test_cached_ttl_expires(spark):
    import time

    from benthos_spark.operators.processors import Cached

    calls = []

    class Counting(Mutation):
        def __call__(self, df):
            calls.append(1)
            return super().__call__(df)

    df = spark.createDataFrame([(1,)], "v int")
    # long TTL: second call must be a registry hit even on a slow host
    proc = Cached(processors=[Counting({"w": F.col("v") + 1})], key="ttl_long", ttl_s=300)
    proc(df).collect()
    proc(df).collect()
    assert len(calls) == 1  # memoized
    # tiny TTL + explicit sleep: entry must expire and recompute
    proc2 = Cached(processors=[Counting({"w": F.col("v") + 1})], key="ttl_short", ttl_s=0.05)
    proc2(df).collect()
    time.sleep(0.1)
    proc2(df).collect()
    assert len(calls) == 3  # expired → recomputed
    Cached.REGISTRY.pop("ttl_long")[0].unpersist()
    Cached.REGISTRY.pop("ttl_short")[0].unpersist()


def test_group_by_per_group_chains(spark):
    """group_by (processor_group_by.go:100-137): first-match group
    membership, per-group processor chains, groupless pass-through."""
    from benthos_spark.operators.processors import GroupBy

    df = spark.createDataFrame(
        [(1, "a"), (5, "b"), (11, "c"), (25, "d")], "v int, k string"
    )
    gb = GroupBy(
        groups=[
            (F.col("v") < 10, [Mutation({"grp": F.lit("small"), "v2": F.col("v") * 2})]),
            (F.col("v") < 20, [Mutation({"grp": F.lit("mid")})]),
        ]
    )
    rows = {r["k"]: (r["grp"], r["v2"]) for r in gb(df).collect()}
    assert rows["a"] == ("small", 2)
    assert rows["b"] == ("small", 10)
    assert rows["c"] == ("mid", None)
    assert rows["d"] == (None, None)  # groupless, untouched

    parts = gb.split(df)
    assert [p.count() for p in parts] == [2, 1, 1]


def test_try_cast_mutation_tags_runtime_failures(spark):
    """Real conversion failures (not explicit Tags) must reach the error
    slot so try/catch routing sees them (internal/batch/error.go)."""
    from benthos_spark.operators.processors import Catch, TryCastMutation

    df = spark.createDataFrame(
        [("1", "a"), ("nope", "b"), (None, "c")], "raw string, k string"
    )
    chain = [
        TryCastMutation({"n": (F.col("raw"), "int")}),
        Catch([Mutation({"n": F.lit(-1)})]),
    ]
    out = compose(df, chain)
    got = {r["k"]: (r["n"], r["_error"]) for r in out.collect()}
    assert got["a"] == (1, None)
    assert got["b"] == (-1, None)  # runtime cast failure -> caught
    assert got["c"] == (None, None)  # null source is not an error


def test_parse_log_syslog_rfc5424(spark):
    """The reference's primary parse_log format, pure JVM regex."""
    from benthos_spark.operators.processors import ParseLog

    line = (
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog 123 ID47 '
        '[exampleSDID@32473 iut="3"] An application event log entry'
    )
    df = spark.createDataFrame([(line,), ("<34>1 2003-10-11T22:14:15Z host app - - - msg",)], "raw string")
    out = {r["hostname"]: r for r in ParseLog("raw", "syslog_rfc5424")(df).collect()}
    r = out["mymachine.example.com"]
    assert (r["priority"], r["facility"], r["severity"]) == (165, 20, 5)
    assert r["appname"] == "evntslog" and r["procid"] == "123" and r["msgid"] == "ID47"
    assert r["structureddata"].startswith("[exampleSDID@32473")
    assert r["message"] == "An application event log entry"
    assert r["timestamp"].year == 2003
    r2 = out["host"]
    assert r2["procid"] is None and r2["msgid"] is None and r2["message"] == "msg"


def test_parse_log_syslog_rfc3164(spark):
    from benthos_spark.operators.processors import ParseLog

    df = spark.createDataFrame(
        [("<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",),
         ("<13>Feb  5 17:32:18 10.0.0.99 myapp: Use the BFG!",)],
        "raw string",
    )
    out = {r["hostname"]: r for r in ParseLog("raw", "syslog_rfc3164", default_year=2003)(df).collect()}
    r = out["mymachine"]
    assert (r["priority"], r["facility"], r["severity"]) == (34, 4, 2)
    assert r["appname"] == "su" and r["procid"] == "230"
    assert r["message"] == "'su root' failed"
    assert (r["timestamp"].month, r["timestamp"].day) == (10, 11)
    r2 = out["10.0.0.99"]
    assert r2["appname"] == "myapp" and r2["procid"] is None
    assert r2["timestamp"].day == 5


def test_parse_log_is_jvm_only(spark):
    from benthos_spark.operators.processors import ParseLog

    df = spark.createDataFrame([("<34>1 2003-10-11T22:14:15Z h a - - - m",)], "raw string")
    plan = ParseLog("raw", "syslog_rfc5424")(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "mapInPandas" not in plan


def test_parquet_encode_decode_roundtrip(spark):
    """parquet_encode/parquet_decode processors (impl/parquet): rows →
    one parquet-file payload per group → back to one message per row."""
    import json as _json

    from benthos_spark.operators.processors import ParquetDecode, ParquetEncode

    df = spark.createDataFrame(
        [("g1", 1, "a"), ("g1", 2, "b"), ("g2", 3, "c")],
        "grp string, n int, s string",
    )
    packed = ParquetEncode(group_cols=["grp"], payload_cols=["n", "s"])(df)
    assert packed.count() == 2
    blob = bytes(packed.filter("grp = 'g1'").collect()[0]["parquet"])
    assert blob[:4] == b"PAR1"  # real parquet magic
    restored = ParquetDecode(col="parquet", out_col="row")(packed)
    rows = sorted(
        (r["grp"], _json.loads(r["row"])["n"], _json.loads(r["row"])["s"])
        for r in restored.collect()
    )
    assert rows == [("g1", 1, "a"), ("g1", 2, "b"), ("g2", 3, "c")]


def test_try_cast_mutation_same_name_as_source(spark):
    """Casting a column onto ITSELF must still flag runtime failures: the
    failure check has to see the pre-cast value, not the cast result."""
    from benthos_spark.operators.processors import TryCastMutation

    df = spark.createDataFrame(
        [("1", "a"), ("nope", "b"), (None, "c")], "n string, k string"
    )
    out = TryCastMutation({"n": (F.col("n"), "int")})(df)
    got = {r["k"]: (r["n"], r["_error"]) for r in out.collect()}
    assert got["a"] == (1, None)
    assert got["b"][0] is None and got["b"][1] is not None  # flagged, not silent
    assert got["c"] == (None, None)


def test_split_count_on_streaming_frame_rejected(spark):
    from benthos_spark.operators.processors import Split

    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="streaming"):
        Split(count=10)(stream)


def test_compress_snappy_lz4_pure_python_roundtrip(spark):
    """snappy/lz4 no longer env-gated: pure-python block/frame codecs
    (functions/snappy.py, functions/lz4frame.py) back the processors
    when the native libs are absent."""
    import random

    from benthos_spark.operators.processors import Compress, Decompress

    rng = random.Random(11)
    payloads = [
        b"hello world " * 50,
        bytes(rng.randrange(256) for _ in range(2000)),
        b"",
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "payload binary")
    for alg in ("snappy", "lz4"):
        comp = Compress(col="payload", algorithm=alg)(df)
        out = Decompress(col="payload", algorithm=alg)(comp)
        got = [bytes(r["payload"]) if r["payload"] is not None else None
               for r in out.collect()]
        assert sorted(got, key=len) == sorted(payloads, key=len), alg


def test_snappy_handcrafted_stream_and_xxh32_vectors():
    from benthos_spark.functions import lz4frame, snappy

    # literal "ab" + 1-byte-offset copy (offset 2, len 6) -> "abababab"
    hand = bytes([8, 1 << 2]) + b"ab" + bytes([((6 - 4) << 2) | 1, 2])
    assert snappy.decompress(hand) == b"abababab"
    # xxHash32 public vectors
    assert lz4frame.xxh32(b"") == 0x02CC5D05
    assert lz4frame.xxh32(b"a") == 0x550D7456
    assert lz4frame.xxh32(b"abc") == 0x32D153FF
    # lz4 frame content-checksum corruption is detected
    z = bytearray(lz4frame.compress(b"payload " * 20))
    z[-1] ^= 0xFF
    import pytest as _pytest

    with _pytest.raises(lz4frame.Lz4Error, match="checksum"):
        lz4frame.decompress(bytes(z))


def test_decompress_bzip2(spark):
    """bzip2 decompress parity (bloblang_encoding.go:303 — the reference
    is decompress-only; compress here is a stdlib superset)."""
    import bz2

    from benthos_spark.operators.processors import Decompress

    payloads = [bz2.compress(b"bzip2 payload " * 20)]
    df = spark.createDataFrame([(p,) for p in payloads], "payload binary")
    out = Decompress(col="payload", algorithm="bzip2")(df).collect()
    assert bytes(out[0]["payload"]) == b"bzip2 payload " * 20


def test_snappy_lz4_hypothesis_roundtrip():
    """Property: decompress(compress(x)) == x for arbitrary byte strings
    (catches end-of-block constraints, long-match splits, literal-run
    length encodings)."""
    from hypothesis import given, settings, strategies as st

    from benthos_spark.functions import lz4frame, snappy

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=5000))
    def check(data):
        assert snappy.decompress(snappy.compress(data)) == data
        assert lz4frame.decompress(lz4frame.compress(data)) == data

    check()

    # adversarial repetitive shapes (long matches, overlapping copies)
    @settings(max_examples=50, deadline=None)
    @given(st.binary(min_size=1, max_size=8), st.integers(1, 2000))
    def check_rep(chunk, reps):
        data = chunk * reps
        assert snappy.decompress(snappy.compress(data)) == data
        assert lz4frame.decompress(lz4frame.compress(data)) == data

    check_rep()


def test_sleep_processor(spark):
    """`sleep` (processor_sleep.go): per-message Go-duration throttle;
    interpolated durations resolve per row; bad durations log-and-skip
    without failing the message."""
    import time as _time

    import pytest

    from benthos_spark.config import _proc
    from benthos_spark.operators.processors import Sleep, _go_duration_seconds

    assert _go_duration_seconds("300ms") == 0.3
    assert _go_duration_seconds("1.5s") == 1.5
    assert _go_duration_seconds("2m45s") == 165.0
    with pytest.raises(ValueError):
        _go_duration_seconds("nope")

    df = spark.createDataFrame([(i,) for i in range(4)], "i int").coalesce(1)
    t0 = _time.monotonic()
    out = Sleep(duration="50ms")(df).collect()
    elapsed = _time.monotonic() - t0
    assert len(out) == 4 and elapsed >= 0.2

    # interpolated duration + bad-duration tolerance
    df2 = spark.createDataFrame(
        [("60ms",), ("garbage",)], "value string").coalesce(1)
    proc = _proc({"sleep": {"duration": "${! value }"}})
    assert proc(df2).count() == 2

    with pytest.raises(ValueError):
        Sleep()
