"""From-scratch Iceberg v2 table format (benthos_spark/iceberg/).

The interop bar: manifests and manifest lists we write must parse with
the REAL Java Avro reader on Spark's classpath (org.apache.avro) —
field names, unions, nested records, int-keyed map encodings and all —
and the metadata JSON must carry the spec's required v2 fields.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from benthos_spark.iceberg import CommitConflict, IcebergTable
from benthos_spark.iceberg import manifests as M


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="bs_iceberg_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sample_df(spark, n=100, offset=0):
    return spark.range(n).select(
        (F.col("id") + offset).alias("k"),
        (F.col("id") % 3).cast("int").alias("part"),
        F.concat(F.lit("v"), F.col("id") + offset).alias("val"),
    )


def test_roundtrip_unpartitioned(spark, tmpdir):
    df = _sample_df(spark)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    out = t.scan(spark)
    # parquet scans come back nullable regardless of writer nullability
    assert out.schema.simpleString() == df.schema.simpleString()
    assert sorted(r.k for r in out.collect()) == list(range(100))


def test_roundtrip_partitioned_and_metadata_shape(spark, tmpdir):
    df = _sample_df(spark)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    t.append(df)
    t.append(_sample_df(spark, offset=100))
    out = t.scan(spark)
    assert out.count() == 200
    got = {r.k: (r.part, r.val) for r in out.collect()}
    assert got[5] == (2, "v5") and got[105] == (2, "v105")

    # spec-required v2 metadata fields
    meta = IcebergTable.load(tmpdir + "/t").metadata
    for key in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-column-id", "schemas", "current-schema-id", "partition-specs",
        "default-spec-id", "last-partition-id", "snapshots", "snapshot-log",
    ):
        assert key in meta, key
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 2
    snap = [s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]][0]
    assert snap["summary"]["operation"] == "append"
    assert snap["summary"]["total-records"] == "200"
    assert snap["sequence-number"] == 2
    # identity partition spec with spec field-ids from 1000
    spec = meta["partition-specs"][0]["fields"]
    assert spec == [
        {"name": "part", "transform": "identity", "source-id": 2, "field-id": 1000}
    ]


def test_manifests_parse_with_real_java_avro(spark, tmpdir):
    """Our pure-python Avro manifests read back via
    org.apache.avro.file.DataFileReader + GenericDatumReader — the
    stock Java Avro stack every Iceberg implementation links."""
    df = _sample_df(spark)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    sid = t.append(df)
    snap = t.snapshot(sid)

    jvm = spark._jvm

    def java_read(path):
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        records = []
        while reader.hasNext():
            records.append(reader.next())
        metadata = {k: bytes(reader.getMeta(k)) for k in list(reader.getMetaKeys())}
        reader.close()
        return records, metadata

    # manifest list
    mlist_records, mlist_meta = java_read(snap["manifest-list"])
    assert mlist_meta[b"format-version".decode()] == b"2"
    assert int(mlist_meta["snapshot-id"].decode()) == sid
    assert len(mlist_records) == 1
    jmf = mlist_records[0]
    assert str(jmf.get("manifest_path").toString())
    assert int(str(jmf.get("added_rows_count"))) == 100
    assert int(str(jmf.get("added_snapshot_id"))) == sid

    # manifest entries
    mpath = str(jmf.get("manifest_path").toString())
    entries, mmeta = java_read(mpath)
    assert mmeta["format-version"] == b"2"
    assert json.loads(mmeta["partition-spec"].decode())[0]["transform"] == "identity"
    assert len(entries) >= 3  # one per partition value at least
    total = 0
    for e in entries:
        assert int(str(e.get("status"))) == M.STATUS_ADDED
        datafile = e.get("data_file")
        assert str(datafile.get("file_format").toString()) == "PARQUET"
        total += int(str(datafile.get("record_count")))
        part = datafile.get("partition")
        assert int(str(part.get("part"))) in (0, 1, 2)
    assert total == 100


def test_time_travel_and_incremental(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema)
    s1 = t.append(_sample_df(spark, 50))
    s2 = t.append(_sample_df(spark, 30, offset=50))
    s3 = t.append(_sample_df(spark, 20, offset=80))
    assert t.scan(spark).count() == 100
    assert t.scan(spark, snapshot_id=s1).count() == 50
    assert t.scan(spark, snapshot_id=s2).count() == 80
    assert t.snapshots_between(None, s3) == [s1, s2, s3]
    inc = t.incremental_scan(spark, s1, s3)
    assert sorted(r.k for r in inc.collect()) == list(range(50, 100))
    # as-of timestamp resolves through the snapshot log
    ts2 = t.snapshot(s2)["timestamp-ms"]
    assert t.scan(spark, as_of_ms=ts2).count() == 80


def test_overwrite_and_expire(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema)
    t.append(_sample_df(spark, 100))
    t.overwrite(_sample_df(spark, 10, offset=500))
    assert t.scan(spark).count() == 10
    assert t.current_snapshot()["summary"]["operation"] == "overwrite"
    n_files_before = sum(1 for _ in _walk_files(tmpdir + "/t/data"))
    deleted = t.expire_snapshots(keep_last=1)
    assert deleted  # the first snapshot's files are unreachable
    n_files_after = sum(1 for _ in _walk_files(tmpdir + "/t/data"))
    assert n_files_after < n_files_before
    assert IcebergTable.load(tmpdir + "/t").scan(spark).count() == 10


def _walk_files(root):
    for r, _d, files in os.walk(root):
        for f in files:
            yield os.path.join(r, f)


def test_concurrent_commit_conflict_retries(spark, tmpdir):
    """Two handles on the same table racing appends: the filesystem
    (O_EXCL on the version file) arbitrates; the loser refreshes and
    lands on the next version — both snapshots survive."""
    df = _sample_df(spark, 10)
    a = IcebergTable.create(tmpdir + "/t", df.schema)
    b = IcebergTable.load(tmpdir + "/t")
    a.append(df)
    # b's view is stale (version 1); its append must retry onto v3
    b.append(_sample_df(spark, 5, offset=100))
    final = IcebergTable.load(tmpdir + "/t")
    assert final.scan(spark).count() == 15
    assert len(final.metadata["snapshots"]) == 2
    assert final.metadata["last-sequence-number"] == 2


def test_version_race_is_atomic(spark, tmpdir):
    df = _sample_df(spark, 5)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    # simulate a competing writer having claimed v2
    with open(tmpdir + "/t/metadata/v2.metadata.json", "w") as f:
        json.dump(t.metadata, f)
    with pytest.raises(CommitConflict):
        t._write_version(2, t.metadata)
    # append still succeeds by skipping to v3
    t.append(df)
    assert t.version == 3


def test_partition_pruning_reaches_scan(spark, tmpdir):
    """A filter on the identity-partition column must become a
    PartitionFilter (prunes files) — not a post-scan filter."""
    df = _sample_df(spark, 300)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    t.append(df)
    q = t.scan(spark).filter(F.col("part") == 1)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "part" in plan.split("PartitionFilters:")[1][:120]
    assert q.count() == 100


def test_schema_json_nested_roundtrip(spark):
    from pyspark.sql import types as T

    from benthos_spark.iceberg import schema as S

    st = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.ArrayType(T.StringType(), True), True),
            T.StructField(
                "c",
                T.StructType(
                    [
                        T.StructField("x", T.DoubleType(), True),
                        T.StructField("y", T.BinaryType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("d", T.MapType(T.StringType(), T.IntegerType()), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    sj, last_id = S.to_iceberg_schema(st)
    # ids unique and dense
    ids = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    ids.append(f["id"])
                    walk(f["type"])
            elif t.get("type") == "list":
                ids.append(t["element-id"])
                walk(t["element"])
            elif t.get("type") == "map":
                ids.append(t["key-id"])
                ids.append(t["value-id"])
                walk(t["key"])
                walk(t["value"])

    walk({"type": "struct", "fields": sj["fields"]})
    assert sorted(ids) == list(range(1, last_id + 1))
    assert S.to_spark_schema(sj) == st


def test_bound_encoding_roundtrip():
    cases = [
        (42, "int"), (-7, "long"), (3.5, "double"), (1.25, "float"),
        ("héllo", "string"), (True, "boolean"), (b"\x00\x01", "binary"),
    ]
    for v, t in cases:
        assert M.decode_bound(M.encode_bound(v, t), t) == v


# -- exactly-once streaming sink over native Iceberg tables ----------------


def _clips_pipeline(src_dir, max_files=None):
    from benthos_spark.datagen.clips import CLIPS_SCHEMA
    from benthos_spark.operators.windows import WindowAgg
    from benthos_spark.sources.readers import ParquetSource
    from benthos_spark.streaming.pipeline import Pipeline

    return Pipeline(
        source=ParquetSource(
            src_dir, streaming=True, schema=CLIPS_SCHEMA, max_files_per_trigger=max_files
        ),
        processors=[
            WindowAgg(
                ts_col="event_ts",
                size="1 minute",
                lateness="30 seconds",
                group_cols=["codec"],
                aggs={"n_clips": F.count(F.lit(1))},
            )
        ],
    )


@pytest.fixture(scope="module")
def iceberg_clips_src(spark, tmp_path_factory):
    from benthos_spark.datagen.clips import write_clips, write_sentinel

    d = str(tmp_path_factory.mktemp("iceberg_clips"))
    write_clips(spark, d, 300, files=6)
    write_sentinel(spark, d)
    return d


def test_exactly_once_iceberg_sink_end_to_end(spark, iceberg_clips_src, tmp_path):
    from benthos_spark.datagen.clips import SENTINEL_CODEC
    from benthos_spark.sinks.iceberg import ExactlyOnceIcebergSink
    from benthos_spark.streaming.pipeline import run_to_completion

    tbl = str(tmp_path / "tbl")
    sink = ExactlyOnceIcebergSink(tbl, lineage_cols=("window_start",), partition_by=("codec",))
    q = _clips_pipeline(iceberg_clips_src).start(
        spark, sink, checkpoint=str(tmp_path / "ckpt"), trigger_once=True
    )
    run_to_completion(q)

    out = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
    assert out.agg(F.sum("n_clips")).collect()[0][0] == 300
    assert out.groupBy("window_start", "codec").count().filter("count > 1").count() == 0
    lineage = sink.lineage()
    assert lineage and all(e["partitions"] for e in lineage if e["rows"])
    # snapshots are the ledger: every committed batch id appears once
    ids = [e["batch_id"] for e in lineage]
    assert len(ids) == len(set(ids))

    # replaying an already-committed batch id must be a no-op
    t = IcebergTable.load(tbl)
    n_snaps = len(t.metadata["snapshots"])
    sink(sink.read_committed(spark).limit(1), lineage[0]["batch_id"])
    assert len(IcebergTable.load(tbl).metadata["snapshots"]) == n_snaps


def test_kill_resume_exactly_once_iceberg(spark, iceberg_clips_src, tmp_path):
    import time as _time

    from benthos_spark.datagen.clips import SENTINEL_CODEC
    from benthos_spark.sinks.iceberg import ExactlyOnceIcebergSink
    from benthos_spark.streaming.pipeline import run_to_completion

    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    sink = ExactlyOnceIcebergSink(tbl, partition_by=("codec",))

    q = _clips_pipeline(iceberg_clips_src, max_files=1).start(
        spark, sink, checkpoint=ckpt, processing_time="200 milliseconds"
    )
    deadline = _time.time() + 120
    while not IcebergTable.exists(tbl) and _time.time() < deadline:
        _time.sleep(0.2)
    q.stop()
    assert IcebergTable.exists(tbl), "no snapshot committed before the kill"

    q2 = _clips_pipeline(iceberg_clips_src, max_files=1).start(
        spark, sink, checkpoint=ckpt, trigger_once=True
    )
    run_to_completion(q2, timeout_s=300)

    out = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
    # exactly-once: totals bounded by the watermark oracle window and no
    # (window, codec) key is ever emitted twice
    total = out.agg(F.sum("n_clips")).collect()[0][0]
    assert total is not None and total <= 300
    assert out.groupBy("window_start", "codec").count().filter("count > 1").count() == 0


# -- Python DataSource: batch + incremental streaming ----------------------


def test_python_datasource_batch_parity(spark, tmpdir):
    from benthos_spark.iceberg.source import register

    df = _sample_df(spark, 120)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    t.append(df)
    register(spark)
    got = spark.read.format("benthos_iceberg").option("path", tmpdir + "/t").load()
    assert got.schema.simpleString() == t.scan(spark).schema.simpleString()
    assert sorted(r.k for r in got.collect()) == list(range(120))
    # partition values re-attached correctly in the arrow path
    assert got.filter(F.col("part") == 2).count() == 40


def test_streaming_source_incremental_and_resume(spark, tmpdir):
    """Sequence-number offsets: a running stream picks up snapshots
    appended AFTER it started; a restart from the checkpoint consumes
    only snapshots it has not yet covered."""
    import time as _time

    from benthos_spark.iceberg.source import IcebergSource

    loc = tmpdir + "/t"
    out_dir, ckpt = tmpdir + "/out", tmpdir + "/ckpt"
    df = _sample_df(spark, 50)
    t = IcebergTable.create(loc, df.schema, partition_by=("part",))
    t.append(df)

    q = (
        IcebergSource(loc, streaming=True)
        .read(spark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= 50:
                    break
            except Exception:
                pass
            _time.sleep(0.5)
        t.append(_sample_df(spark, 50, offset=50))  # mid-stream append
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if spark.read.parquet(out_dir).count() >= 100:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    assert spark.read.parquet(out_dir).count() == 100

    # offline append, then resume from the same checkpoint
    t.append(_sample_df(spark, 25, offset=100))
    q2 = (
        IcebergSource(loc, streaming=True)
        .read(spark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 125  # no re-reads, no gaps
    assert sorted(r.k for r in got.select("k").collect()) == list(range(125))


def test_iceberg_to_iceberg_pipeline(spark, tmpdir):
    """The north-star loop: Structured Streaming FROM an Iceberg table
    of clips, through the processor chain, INTO an exactly-once
    Iceberg sink."""
    from benthos_spark.datagen.clips import CLIPS_SCHEMA, SENTINEL_CODEC, write_clips, write_sentinel
    from benthos_spark.iceberg.source import IcebergSource
    from benthos_spark.operators.windows import WindowAgg
    from benthos_spark.sinks.iceberg import ExactlyOnceIcebergSink
    from benthos_spark.streaming.pipeline import Pipeline, run_to_completion

    # stage clips INTO a source Iceberg table
    staging = tmpdir + "/clips_parquet"
    write_clips(spark, staging, 200, files=4)
    write_sentinel(spark, staging)
    src_tbl = IcebergTable.create(
        tmpdir + "/src_tbl", spark.read.parquet(staging).schema
    )
    src_tbl.append(spark.read.parquet(staging))

    pipe = Pipeline(
        source=IcebergSource(tmpdir + "/src_tbl", streaming=True),
        processors=[
            WindowAgg(
                ts_col="event_ts",
                size="1 minute",
                lateness="30 seconds",
                group_cols=["codec"],
                aggs={"n_clips": F.count(F.lit(1))},
            )
        ],
    )
    sink = ExactlyOnceIcebergSink(tmpdir + "/dst_tbl", partition_by=("codec",))
    # availableNow over a Python data source skips the final no-data
    # micro-batch that flushes watermarked windows (see source.py) — a
    # processing-time trigger runs it, so poll until the flush lands.
    import time as _time

    q = pipe.start(
        spark, sink, checkpoint=tmpdir + "/ckpt", processing_time="200 milliseconds"
    )
    try:
        total = 0
        deadline = _time.time() + 120
        while total < 200 and _time.time() < deadline:
            _time.sleep(0.5)
            if not IcebergTable.exists(tmpdir + "/dst_tbl"):
                continue
            got = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
            total = got.agg(F.sum("n_clips")).collect()[0][0] or 0
    finally:
        q.stop()

    out = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
    assert out.agg(F.sum("n_clips")).collect()[0][0] == 200
    assert out.groupBy("window_start", "codec").count().filter("count > 1").count() == 0


def test_config_iceberg_input_output(spark, tmpdir):
    """YAML config wiring: iceberg input (batch) -> iceberg output."""
    import yaml

    from benthos_spark.config import compile_config

    df = _sample_df(spark, 40)
    t = IcebergTable.create(tmpdir + "/in", df.schema)
    t.append(df)
    conf = yaml.safe_load(
        f"""
input:
  iceberg: {{path: {tmpdir}/in}}
pipeline:
  processors:
    - mutation: {{k2: "k * 2"}}
output:
  iceberg: {{path: {tmpdir}/out}}
"""
    )
    pipe, sink = compile_config(conf)
    sink(pipe.run_batch(spark), 0)
    got = sink.read_committed(spark)
    assert got.count() == 40
    assert got.agg(F.max("k2")).collect()[0][0] == 78


# -- v2 position deletes (merge-on-read) -----------------------------------


def test_position_delete_where(spark, tmpdir):
    df = _sample_df(spark, 100)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    s1 = t.append(df)
    sd = t.delete_where(spark, "k % 10 = 3")
    assert sd is not None
    assert t.current_snapshot()["summary"]["operation"] == "delete"
    assert t.current_snapshot()["summary"]["added-position-deletes"] == "10"

    out = t.scan(spark)
    assert out.count() == 90
    assert out.filter("k % 10 = 3").count() == 0
    # time travel BEFORE the delete still sees every row
    assert t.scan(spark, snapshot_id=s1).count() == 100

    # appends after the delete are untouched (path-keyed tombstones)
    t.append(df.withColumn("k", F.col("k") + 100))
    out2 = t.scan(spark)
    assert out2.count() == 190
    assert out2.filter("k = 103").count() == 1

    # no-match delete is a no-op commit-wise
    n = len(t.metadata["snapshots"])
    assert t.delete_where(spark, "k = -42") is None
    assert len(t.metadata["snapshots"]) == n

    # deletes stack
    t.delete_where(spark, "k >= 190")
    assert t.scan(spark).count() == 180


def test_position_delete_manifest_shape(spark, tmpdir):
    """The delete snapshot's manifest list must mark the delete
    manifest content=1 and its entries data_file.content=1, parseable
    by the real Java Avro reader like everything else."""
    df = _sample_df(spark, 60)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    t.delete_where(spark, "k < 10")
    snap = t.current_snapshot()
    mfs = M.read_manifest_list(snap["manifest-list"])
    by_content = {m["content"] for m in mfs}
    assert by_content == {0, 1}
    delete_mf = next(m for m in mfs if m["content"] == 1)
    entries = M.read_manifest(delete_mf["manifest_path"])
    assert all(e["data_file"]["content"] == M.CONTENT_POSITION_DELETES for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 10
    # the delete file itself is (file_path, pos) parquet, sorted
    import pyarrow.parquet as pq

    tbl = pq.read_table(entries[0]["data_file"]["file_path"])
    assert tbl.column_names == ["file_path", "pos"]
    pos = tbl.column("pos").to_pylist()
    fp = tbl.column("file_path").to_pylist()
    assert sorted(zip(fp, pos)) == list(zip(fp, pos))

    # streaming source never re-emits tombstoned snapshots as data
    assert t.added_files(snap["snapshot-id"]) == []


# -- schema evolution ------------------------------------------------------


def test_schema_evolution_add_and_widen(spark, tmpdir):
    from pyspark.sql import types as T

    df = _sample_df(spark, 40)  # k long, part int, val string
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    t.append(df)

    evolved = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("part", T.LongType()),  # int -> long widen
            T.StructField("val", T.StringType()),
            T.StructField("score", T.DoubleType()),  # added
        ]
    )
    sid = t.evolve_schema(evolved)
    assert t.metadata["current-schema-id"] == sid
    # ids preserved by name; the added column got a FRESH id
    ids = {f["name"]: f["id"] for f in t.schema_json["fields"]}
    assert ids["k"] == 1 and ids["part"] == 2 and ids["val"] == 3
    assert ids["score"] == 4
    assert t.schema_json["fields"][1]["type"] == "long"

    # old files scan under the NEW schema: nulls + upcast
    out = t.scan(spark)
    assert out.schema["part"].dataType == T.LongType()
    assert out.schema["score"].dataType == T.DoubleType()
    assert out.filter(F.col("score").isNull()).count() == 40

    # new appends carry the new column; mixed-schema scan unions cleanly
    new_rows = _sample_df(spark, 10, offset=100).withColumn(
        "part", F.col("part").cast("long")
    ).withColumn("score", F.lit(0.5))
    t.append(new_rows)
    out2 = t.scan(spark)
    assert out2.count() == 50
    assert out2.filter(F.col("score").isNotNull()).count() == 10
    assert out2.filter("part = 1").count() > 0  # partition still prunes/attaches

    # illegal changes fail loudly
    import pytest as _pytest

    bad_drop = T.StructType([T.StructField("k", T.LongType())])
    with _pytest.raises(ValueError, match="drop"):
        t.evolve_schema(bad_drop)
    bad_narrow = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("part", T.LongType()),
            T.StructField("val", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    with _pytest.raises(ValueError, match="illegal type change"):
        t.evolve_schema(bad_narrow)


# -- CDC merge-apply onto Iceberg ------------------------------------------


def _changelog(spark, rows):
    """rows: (op, lsn, after_dict_or_None, before_dict_or_None)"""
    from pyspark.sql import types as T

    row_t = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("after", row_t),
            T.StructField("before", row_t),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_iceberg_merge_apply_upserts_deletes(spark, tmpdir):
    from benthos_spark.sinks.iceberg import IcebergMergeApplySink

    sink = IcebergMergeApplySink(tmpdir + "/t", pk_cols=("id",))
    b0 = _changelog(
        spark,
        [
            ("c", 10, (1, "new", 5.0), None),
            ("c", 11, (2, "new", 7.0), None),
            ("c", 12, (3, "new", 1.0), None),
        ],
    )
    sink(b0, 0)
    b1 = _changelog(
        spark,
        [
            ("u", 20, (1, "paid", 6.0), (1, "new", 5.0)),
            ("d", 21, None, (2, "new", 7.0)),
            ("c", 22, (4, "new", 9.0), None),
        ],
    )
    sink(b1, 1)
    got = {r["id"]: (r["status"], r["amount"]) for r in sink.read_state(spark).collect()}
    assert got == {1: ("paid", 6.0), 3: ("new", 1.0), 4: ("new", 9.0)}

    # replayed batch is a no-op (atomic snapshot is batch-id-stamped)
    t = IcebergTable.load(tmpdir + "/t")
    n = len(t.metadata["snapshots"])
    sink(b1, 1)
    assert len(IcebergTable.load(tmpdir + "/t").metadata["snapshots"]) == n

    # each merge batch is ONE snapshot carrying deletes + data together
    snap = IcebergTable.load(tmpdir + "/t").current_snapshot()
    assert "added-data-files" in snap["summary"]
    assert "added-delete-files" in snap["summary"]


def test_iceberg_merge_apply_tombstone_guard(spark, tmpdir):
    """A delete's order guard must stop a LATER-arriving insert with a
    LOWER lsn from resurrecting the key (cross-batch out-of-order)."""
    from benthos_spark.sinks.iceberg import IcebergMergeApplySink

    sink = IcebergMergeApplySink(tmpdir + "/t", pk_cols=("id",))
    sink(_changelog(spark, [("d", 50, None, (9, "x", 0.0))]), 0)  # delete first
    sink(_changelog(spark, [("c", 40, (9, "late", 3.0), None)]), 1)  # stale insert
    assert sink.read_state(spark).filter("id = 9").count() == 0

    # a genuinely newer insert DOES take the key back
    sink(_changelog(spark, [("c", 60, (9, "back", 4.0), None)]), 2)
    rows = sink.read_state(spark).filter("id = 9").collect()
    assert len(rows) == 1 and rows[0]["status"] == "back"

    # tombstone expiry: horizon past the delete's lsn removes it
    sink.expire_tombstones(spark, below_order=1000)
    t = IcebergTable.load(tmpdir + "/t")
    live_all = t.scan(spark)
    assert live_all.filter("_deleted").count() == 0


def test_remove_orphans(spark, tmpdir):
    """Crash leftovers (unreferenced data files, manifests, staging
    dirs) are reclaimed; live files and version metadata survive."""
    import os as _os

    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema)
    t.append(_sample_df(spark, 50))
    # simulate a crash between staging and commit
    orphan = tmpdir + "/t/data/deadbeef-orphan.parquet"
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    _os.makedirs(tmpdir + "/t/_staging/zzz", exist_ok=True)
    with open(tmpdir + "/t/metadata/feedface-m0.avro", "wb") as f:
        f.write(b"orphan manifest")

    kept = t.remove_orphans(older_than_s=10)  # inside grace: nothing swept
    assert kept == []
    deleted = t.remove_orphans(older_than_s=0)
    assert orphan in deleted
    assert any("_staging" in p for p in deleted)
    assert any(p.endswith("feedface-m0.avro") for p in deleted)
    # table still fully readable; version files intact
    assert t.scan(spark).count() == 50
    assert _os.path.exists(tmpdir + "/t/metadata/version-hint.text")


def test_compact_folds_deletes(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema, partition_by=("part",))
    t.append(_sample_df(spark, 60))
    t.append(_sample_df(spark, 40, offset=60))
    t.delete_where(spark, "k % 7 = 0")
    expect = sorted(r.k for r in t.scan(spark).collect())
    t.compact(spark)
    # post-compaction: no delete files remain live, content identical
    data, deletes = t._live_entries()
    assert deletes == []
    assert sorted(r.k for r in t.scan(spark).collect()) == expect
    assert t.current_snapshot()["summary"]["benthos-spark.compaction"] == "true"
    # expiry then reclaims the pre-compaction generation
    assert t.expire_snapshots(keep_last=1)
    assert sorted(r.k for r in t.scan(spark).collect()) == expect


def test_create_race_adopts_winner(spark, tmpdir):
    df = _sample_df(spark, 5)
    a = IcebergTable.create(tmpdir + "/t", df.schema)
    b = IcebergTable.create(tmpdir + "/t", df.schema)  # racing creator
    assert b.metadata["table-uuid"] == a.metadata["table-uuid"]
    b.append(df)
    assert IcebergTable.load(tmpdir + "/t").scan(spark).count() == 5


def test_time_transform_partitioning(spark, tmpdir):
    """day()/hour() partition transforms: hive dirs carry epoch
    ordinals, the source timestamp column stays IN the data files, and
    manifests record int partition values per the spec's transform
    table."""
    from pyspark.sql import types as T

    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.expr("timestamp'2026-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600)")).alias("ts"),
    )
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("day(ts)",))
    t.append(df)
    spec = t.partition_spec
    assert spec[0]["transform"] == "day" and spec[0]["name"] == "ts_day"

    out = t.scan(spark)
    assert out.count() == 200
    assert out.schema.fieldNames() == ["k", "ts"]  # no derived col leaks
    # ts survives inside the files (not stripped like identity partitions)
    assert out.filter("ts = timestamp'2026-03-01 05:00:00'").count() == 1

    # manifest partition values are epoch-day ints covering the range
    import datetime

    days = set()
    for f in t.live_files():
        days.add(f["partition"]["ts_day"])
    d0 = (datetime.date(2026, 3, 1) - datetime.date(1970, 1, 1)).days
    assert min(days) == d0
    assert max(days) == d0 + (200 * 3600) // 86400

    # multi-level: identity + hour transform together
    df2 = df.withColumn("part", (F.col("k") % 2).cast("int"))
    t2 = IcebergTable.create(
        tmpdir + "/t2", df2.schema, partition_by=("part", "hour(ts)")
    )
    t2.append(df2)
    out2 = t2.scan(spark)
    assert out2.count() == 200
    assert out2.filter("part = 1").count() == 100
    hours = {f["partition"]["ts_hour"] for f in t2.live_files()}
    assert len(hours) == 200  # one distinct hour per row

    # deletes + merge still work over transform-partitioned tables
    t.delete_where(spark, "k < 10")
    assert t.scan(spark).count() == 190


def test_bucket_transform_partitioning(spark, tmpdir):
    """bucket(N, col) per spec Appendix B: Murmur3 seed-0 bucket values
    in the hive dirs and manifests; every row's bucket matches the
    reference hash (long 34 -> 2017239379, 'iceberg' -> 1210000089,
    0x00010203 -> -188683207 pinned separately in the unit vectors)."""
    import numpy as np

    from benthos_spark.iceberg.bucketing import bucket_longs, bucket_value, murmur3_32, murmur3_32_longs

    # spec Appendix B published reference hashes
    assert int(murmur3_32_longs(np.array([34]), 0)[0]) == 2017239379
    assert murmur3_32(b"iceberg", 0) == 1210000089
    assert murmur3_32(bytes([0, 1, 2, 3]), 0) == -188683207

    df = _sample_df(spark, 300)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("bucket(8, k)",))
    t.append(df)
    assert t.partition_spec[0]["transform"] == "bucket[8]"
    out = t.scan(spark)
    assert sorted(r.k for r in out.collect()) == list(range(300))
    # manifest bucket values agree with the reference transform
    expect = {int(k): int(b) for k, b in zip(range(300), bucket_longs(np.arange(300), 8))}
    for f in t.live_files():
        assert 0 <= f["partition"]["k_bucket"] < 8
    # spot-check: rows land in the file whose dir matches their bucket
    got = (
        t._df_for_files(spark, t.live_files(), with_meta=True)
        .select("k", "_bs_file")
        .collect()
    )
    for r in got:
        assert f"k_bucket={expect[r['k']]}/" in r["_bs_file"], (r["k"], r["_bs_file"])

    # string buckets through the same path
    t2 = IcebergTable.create(tmpdir + "/t2", df.schema, partition_by=("bucket(4, val)",))
    t2.append(df)
    assert t2.scan(spark).count() == 300
    for f in t2.live_files():
        assert 0 <= f["partition"]["val_bucket"] < 4
    r0 = next(f for f in t2.live_files())
    # recompute one bucket from a value inside that file
    import pyarrow.parquet as pq

    sample_val = pq.read_table(r0["file_path"]).column("val")[0].as_py()
    assert bucket_value(sample_val, "string", 4) == r0["partition"]["val_bucket"]


def test_manifest_column_stats(spark, tmpdir):
    """Data-file entries carry footer-derived value/null counts and
    spec-encoded lower/upper bounds by FIELD-ID — the file-skipping
    metadata any Iceberg planner reads."""
    df = _sample_df(spark, 100).withColumn(
        "maybe", F.when(F.col("k") % 4 == 0, F.col("k")).cast("long")
    )
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df.coalesce(1))
    [entry] = M.read_manifest(
        M.read_manifest_list(t.current_snapshot()["manifest-list"])[0]["manifest_path"]
    )
    f = entry["data_file"]
    vc = {kv["key"]: kv["value"] for kv in f["value_counts"]}
    assert vc[1] == 100  # k
    nulls = {kv["key"]: kv["value"] for kv in f["null_value_counts"]}
    assert nulls.get(4, 0) == 75  # 'maybe' is null for k%4 != 0
    lo = {kv["key"]: kv["value"] for kv in f["lower_bounds"]}
    hi = {kv["key"]: kv["value"] for kv in f["upper_bounds"]}
    assert M.decode_bound(lo[1], "long") == 0
    assert M.decode_bound(hi[1], "long") == 99
    assert M.decode_bound(lo[3], "string") == "v0"  # lexicographic min of val
    # java avro still parses the stats maps (int-keyed map encoding)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(
            M.read_manifest_list(t.current_snapshot()["manifest-list"])[0]["manifest_path"]
        ),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    rec = reader.next()
    reader.close()
    assert rec.get("data_file").get("value_counts") is not None


def test_scan_file_skipping(spark, tmpdir):
    """scan(where=...) prunes files at the METADATA level: appends with
    disjoint key ranges produce files a bounds test excludes before
    Spark ever lists them, and the result still equals a full filter."""
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema)
    t.append(_sample_df(spark, 100).coalesce(1))            # k in [0, 99]
    t.append(_sample_df(spark, 100, offset=1000).coalesce(1))  # [1000, 1099]
    t.append(_sample_df(spark, 100, offset=5000).coalesce(1))  # [5000, 5099]
    assert len(t.live_files()) == 3

    assert len(t.plan_files("k >= 1000")) == 2
    assert len(t.plan_files("k > 1099")) == 1
    assert len(t.plan_files("k = 5050")) == 1
    assert len(t.plan_files("k >= 1000 AND k < 2000")) == 1
    assert len(t.plan_files("val = 'v5'")) == 1  # string bounds prune too
    # unparseable predicate: conservative (no skipping)
    assert len(t.plan_files("k % 2 = 0")) == 3

    got = sorted(r.k for r in t.scan(spark, where="k >= 1000 AND k < 2000").collect())
    assert got == list(range(1000, 1100))
    # residual filtering still applies within the surviving file
    assert t.scan(spark, where="k = 5050").count() == 1
    assert t.scan(spark, where="k % 10 = 3").count() == 30

    # identity partition values prune when bounds are absent
    t2 = IcebergTable.create(tmpdir + "/t2", _sample_df(spark).schema, partition_by=("part",))
    t2.append(_sample_df(spark, 90))
    files_p1 = t2.plan_files("part = 1")
    assert files_p1 and all(f["partition"]["part"] == 1 for f in files_p1)
    assert t2.scan(spark, where="part = 1").count() == 30


# ---------------------------------------------------------------------
# v2 EQUALITY deletes (upsert / equality_delete)
# ---------------------------------------------------------------------


def test_upsert_replaces_keys_and_adds_new(spark, tmpdir):
    df = _sample_df(spark, 100)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    s1 = t.append(df)
    up = _sample_df(spark, 10, offset=95).withColumn("val", F.lit("UP"))
    t.upsert(spark, up, on=["k"])
    out = t.scan(spark)
    assert out.count() == 105  # 100 - 5 replaced + 10 upserts ∩ 5 new
    assert out.filter("val = 'UP'").count() == 10
    assert out.filter("k = 97 AND val <> 'UP'").count() == 0
    # time travel BEFORE the upsert sees the original rows
    assert t.scan(spark, snapshot_id=s1).filter("val = 'UP'").count() == 0


def test_upsert_new_rows_survive_their_own_delete(spark, tmpdir):
    """The equality delete and its data share one sequence number, and
    deletes apply only to STRICTLY SMALLER seqs (spec): the batch's own
    rows must not be deleted even though their keys are in the file."""
    df = _sample_df(spark, 5)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.upsert(spark, df, on=["k"])  # upsert into an EMPTY table
    assert t.scan(spark).count() == 5


def test_upserts_stack_latest_wins(spark, tmpdir):
    df = _sample_df(spark, 20)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    t.upsert(spark, _sample_df(spark, 20).withColumn("val", F.lit("A")), on=["k"])
    t.upsert(spark, _sample_df(spark, 10).withColumn("val", F.lit("B")), on=["k"])
    vals = {r.k: r.val for r in t.scan(spark).collect()}
    assert len(vals) == 20
    assert all(v == "B" for k, v in vals.items() if k < 10)
    assert all(v == "A" for k, v in vals.items() if k >= 10)


def test_equality_delete_pure_and_mixed_with_position(spark, tmpdir):
    df = _sample_df(spark, 50)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    sid = t.equality_delete(spark, spark.range(10).select(F.col("id").alias("k")), on=["k"])
    assert sid is not None
    assert t.scan(spark).count() == 40
    # position delete stacks on top of the equality delete
    t.delete_where(spark, "k >= 45")
    assert t.scan(spark).count() == 35
    # appends AFTER the equality delete resurrect nothing but are visible
    t.append(_sample_df(spark, 5))  # keys 0..4 again, later seq
    assert t.scan(spark).count() == 40
    assert t.scan(spark).filter("k = 2").count() == 1
    # empty key set is a no-op
    n = len(t.metadata["snapshots"])
    assert t.equality_delete(spark, spark.range(0).select(F.col("id").alias("k")), on=["k"]) is None
    assert len(t.metadata["snapshots"]) == n


def test_equality_delete_manifest_shape(spark, tmpdir):
    """Equality-delete entries: manifest_file.content=1,
    data_file.content=2, equality_ids = the key field-ids."""
    from benthos_spark.iceberg import manifests as M

    df = _sample_df(spark, 10)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    t.upsert(spark, _sample_df(spark, 3), on=["k"])
    snap = t.current_snapshot()
    mfs = M.read_manifest_list(snap["manifest-list"])
    eq_mfs = [m for m in mfs if m["added_snapshot_id"] == snap["snapshot-id"] and m["content"] == 1]
    assert eq_mfs, "no delete-content manifest in the upsert snapshot"
    entries = [e for m in eq_mfs for e in M.read_manifest(m["manifest_path"])]
    eq_entries = [e for e in entries if e["data_file"]["content"] == M.CONTENT_EQUALITY_DELETES]
    assert eq_entries
    k_id = {f["name"]: f["id"] for f in t.schema_json["fields"]}["k"]
    assert eq_entries[0]["data_file"]["equality_ids"] == [k_id]


def test_compact_folds_equality_deletes(spark, tmpdir):
    df = _sample_df(spark, 30)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    t.upsert(spark, _sample_df(spark, 10).withColumn("val", F.lit("U")), on=["k"])
    t.compact(spark)
    _, deletes = t._live_entries()
    assert deletes == []  # folded away
    out = t.scan(spark)
    assert out.count() == 30
    assert out.filter("val = 'U'").count() == 10


def test_iceberg_merge_apply_equality_mode(spark, tmpdir):
    """mode='equality' reproduces the position-mode state exactly; with
    assume_ordered the write plan never scans the live table."""
    from benthos_spark.sinks.iceberg import IcebergMergeApplySink

    batches = [
        _changelog(spark, [
            ("c", 10, (1, "new", 5.0), None),
            ("c", 11, (2, "new", 7.0), None),
            ("c", 12, (3, "new", 1.0), None),
        ]),
        _changelog(spark, [
            ("u", 20, (1, "paid", 6.0), (1, "new", 5.0)),
            ("d", 21, None, (2, "new", 7.0)),
            ("c", 22, (4, "new", 9.0), None),
            ("u", 23, (4, "hot", 9.5), (4, "new", 9.0)),  # two ops, one key, one batch
        ]),
    ]
    want = {1: ("paid", 6.0), 3: ("new", 1.0), 4: ("hot", 9.5)}
    for kwargs, sub in [
        (dict(mode="equality"), "eq"),
        (dict(mode="equality", assume_ordered=True), "eqo"),
    ]:
        sink = IcebergMergeApplySink(tmpdir + f"/{sub}", pk_cols=("id",), **kwargs)
        for i, b in enumerate(batches):
            sink(b, i)
        got = {r["id"]: (r["status"], r["amount"]) for r in sink.read_state(spark).collect()}
        assert got == want, (sub, got)
        # replay skip still holds
        t = IcebergTable.load(tmpdir + f"/{sub}")
        n = len(t.metadata["snapshots"])
        sink(batches[1], 1)
        assert len(IcebergTable.load(tmpdir + f"/{sub}").metadata["snapshots"]) == n

    # out-of-order tombstone guard works in equality mode too (without
    # assume_ordered: the guard needs the old-row read)
    sink = IcebergMergeApplySink(tmpdir + "/g", pk_cols=("id",), mode="equality")
    sink(_changelog(spark, [("d", 50, None, (9, "x", 0.0))]), 0)
    sink(_changelog(spark, [("c", 40, (9, "late", 3.0), None)]), 1)
    assert sink.read_state(spark).filter("id = 9").count() == 0

    # bad configs are rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        IcebergMergeApplySink(tmpdir + "/x", pk_cols=("id",), mode="bogus")
    with _pytest.raises(ValueError):
        IcebergMergeApplySink(tmpdir + "/y", pk_cols=("id",), assume_ordered=True)


# -- snapshot refs (tags & branches) + metadata tables -----------------------


def test_refs_tag_branch_and_expire_retention(spark, tmpdir):
    df = _sample_df(spark, 30)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    t.append(df)
    t.create_tag("v1")
    t.append(_sample_df(spark, 10, offset=100))
    t.create_branch("dev")
    t.append(_sample_df(spark, 5, offset=200), branch="dev")

    # main is unaffected by the branch write; the tag is frozen
    assert t.scan(spark).count() == 40
    assert t.scan(spark, ref="v1").count() == 30
    assert t.scan(spark, ref="dev").count() == 45
    assert t.refs["v1"]["type"] == "tag"
    assert t.refs["dev"]["type"] == "branch"
    assert t.refs["main"]["snapshot-id"] == t.current_snapshot()["snapshot-id"]

    # tags are immutable; main is reserved; unknown refs raise
    with pytest.raises(ValueError):
        t.create_tag("v1")
    with pytest.raises(ValueError):
        t.create_branch("main")
    with pytest.raises(KeyError):
        t.scan(spark, ref="nope")
    with pytest.raises(KeyError):
        t.append(df, branch="undeclared")
    with pytest.raises(ValueError):
        t.append(df, branch="v1")  # writing to a tag

    # expire keeps ref-pinned snapshots readable
    t.expire_snapshots(keep_last=1)
    assert t.scan(spark, ref="v1").count() == 30
    assert t.scan(spark, ref="dev").count() == 45
    assert t.scan(spark).count() == 40

    t.drop_ref("dev")
    assert "dev" not in t.refs
    with pytest.raises(ValueError):
        t.drop_ref("main")


def test_metadata_tables(spark, tmpdir):
    df = _sample_df(spark, 30)
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("part",))
    t.append(df)
    t.create_tag("v1")
    t.append(_sample_df(spark, 10, offset=100))

    snaps = t.metadata_table(spark, "snapshots").collect()
    assert [r.operation for r in snaps] == ["append", "append"]
    assert snaps[1].parent_id == snaps[0].snapshot_id
    assert int(snaps[1].summary["total-records"]) == 40

    hist = t.metadata_table(spark, "history").collect()
    assert len(hist) == 2 and all(r.is_current_ancestor for r in hist)

    refs = {r.name: r for r in t.metadata_table(spark, "refs").collect()}
    assert refs["v1"].type == "tag" and refs["main"].type == "branch"
    assert refs["main"].snapshot_id == t.current_snapshot()["snapshot-id"]

    mans = t.metadata_table(spark, "manifests").collect()
    assert sum(m.added_rows_count for m in mans) == 40
    assert all(m.content == 0 for m in mans)

    files = t.metadata_table(spark, "files")
    assert files.agg(F.sum("record_count")).collect()[0][0] == 40
    parts = {
        r.partition["part"]: r.record_count
        for r in t.metadata_table(spark, "partitions").collect()
    }
    assert parts == {"0": 14, "1": 13, "2": 13}
    assert t.metadata_table(spark, "delete_files").count() == 0

    with pytest.raises(ValueError):
        t.metadata_table(spark, "bogus")


def test_sort_order_tightens_bounds_and_prunes(spark, tmpdir):
    """A sort order + range distribution gives files DISJOINT value
    ranges, so a point/range predicate prunes most files at the
    MANIFEST level; the same data unsorted prunes nothing."""
    import random

    rng = random.Random(3)
    vals = list(range(1000))
    rng.shuffle(vals)
    df = spark.createDataFrame([(v, f"r{v}") for v in vals], "k long, s string").repartition(8)

    plain = IcebergTable.create(tmpdir + "/plain", df.schema)
    plain.append(df)
    sorted_t = IcebergTable.create(
        tmpdir + "/sorted",
        df.schema,
        sort_by=("k",),
        properties={"write.distribution-mode": "range"},
    )
    sorted_t.append(df)

    assert sorted_t.metadata["default-sort-order-id"] == 1
    assert sorted_t.metadata["sort-orders"][1]["fields"][0]["direction"] == "asc"
    f = sorted_t.live_files()[0]
    assert f["sort_order_id"] == 1

    n_plain = len(plain.live_files())
    n_sorted = len(sorted_t.live_files())
    # shuffled input: most unsorted files span ~the full range (a
    # round-robin file can miss the tail by luck, so >= half survive)
    assert len(plain.plan_files("k >= 990")) >= n_plain // 2
    # range-distributed + sorted: only the tail file(s) survive
    pruned = sorted_t.plan_files("k >= 990")
    assert len(pruned) <= max(1, n_sorted // 4)
    # correctness unchanged
    assert sorted_t.scan(spark, where="k >= 990").count() == 10
    assert plain.scan(spark, where="k >= 990").count() == 10

    with pytest.raises(ValueError):
        IcebergTable.create(tmpdir + "/bad", df.schema, sort_by=("k sideways",))


def test_rewrite_manifests_folds_and_keeps_delete_scoping(spark, tmpdir):
    """Ten appends leave ten manifests; rewrite_manifests folds them to
    one EXISTING-entry manifest keeping original data sequence numbers,
    so a position delete committed mid-history still applies only to
    the files it targeted."""
    df10 = _sample_df(spark, 10)
    t = IcebergTable.create(tmpdir + "/t", df10.schema)
    for i in range(5):
        t.append(_sample_df(spark, 10, offset=i * 100))
    # delete some rows (position-delete manifest enters the mix)
    t.delete_where(spark, "k >= 100 and k < 103")
    for i in range(5, 8):
        t.append(_sample_df(spark, 10, offset=i * 100))
    before = sorted(r.k for r in t.scan(spark).collect())
    from benthos_spark.iceberg import manifests as M

    n_before = len(M.read_manifest_list(t.current_snapshot()["manifest-list"]))
    assert n_before >= 8

    sid = t.rewrite_manifests()
    mfs = M.read_manifest_list(t.current_snapshot()["manifest-list"])
    assert len(mfs) == 2  # one data + one delete manifest
    assert {m["content"] for m in mfs} == {0, 1}
    assert t.current_snapshot()["summary"]["operation"] == "replace"
    after = sorted(r.k for r in t.scan(spark).collect())
    assert after == before and 100 not in after and 103 in after

    # idempotent-ish: a second rewrite is a no-op commit-wise? (two
    # manifests stay two)
    t.rewrite_manifests()
    assert len(M.read_manifest_list(t.current_snapshot()["manifest-list"])) == 2

    # appends continue cleanly on the rewritten base
    t.append(_sample_df(spark, 3, offset=900))
    assert t.scan(spark).count() == len(after) + 3
    # pre-rewrite time travel still works
    assert t.scan(spark, snapshot_id=sid).count() == len(after)


def test_entries_metadata_table(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema)
    t.append(_sample_df(spark, 10))
    t.append(_sample_df(spark, 5, offset=100))
    ents = t.metadata_table(spark, "entries")
    assert ents.agg(F.sum("record_count")).collect()[0][0] == 15
    assert set(r.status for r in ents.collect()) == {M.STATUS_ADDED}
    t.rewrite_manifests()
    ents2 = t.metadata_table(spark, "entries").collect()
    assert all(r.status == M.STATUS_EXISTING for r in ents2)
    assert sum(r.record_count for r in ents2) == 15


def test_sink_auto_rewrite_manifests(spark, tmpdir):
    from benthos_spark.sinks.iceberg import ExactlyOnceIcebergSink

    loc = tmpdir + "/t"
    sink = ExactlyOnceIcebergSink(loc, rewrite_manifests_every=2)
    for b in range(4):
        sink(_sample_df(spark, 10, offset=b * 100), b)
    t = IcebergTable.load(loc)
    # batches 1 and 3 triggered folds: the current snapshot is a
    # 'replace' carrying ONE data manifest
    mfs = M.read_manifest_list(t.current_snapshot()["manifest-list"])
    assert len(mfs) == 1
    assert t.current_snapshot()["summary"]["operation"] == "replace"
    assert t.scan(spark).count() == 40
    # exactly-once replay skip still works after the rewrite
    n = len(t.metadata["snapshots"])
    sink(_sample_df(spark, 10, offset=300), 3)
    assert len(IcebergTable.load(loc).metadata["snapshots"]) == n


def test_python_source_bin_packs_small_files(spark, tmpdir):
    from benthos_spark.iceberg.source import (
        IcebergBatchReader,
        _partitions_for_files,
    )

    df = _sample_df(spark, 200).repartition(16)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    files = t.live_files()
    assert len(files) >= 8
    # tiny test files group under the 4 MiB default…
    packed = _partitions_for_files(t, files)
    assert len(packed) == 1
    assert sum(len(p.files) for p in packed) == len(files)
    # …0 disables grouping (one file per task)
    unpacked = _partitions_for_files(t, files, 0)
    assert len(unpacked) == len(files)
    # grouped reads return the same rows via the registered source
    from benthos_spark.iceberg.source import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    got = (
        spark.read.format("benthos_iceberg").option("path", tmpdir + "/t").load()
    )
    assert sorted(r.k for r in got.collect()) == list(range(200))


def test_branch_overwrite(spark, tmpdir):
    df = _sample_df(spark, 20)
    t = IcebergTable.create(tmpdir + "/t", df.schema)
    t.append(df)
    t.create_branch("exp")
    t.overwrite(_sample_df(spark, 5, offset=500), branch="exp")
    # main untouched; branch replaced
    assert t.scan(spark).count() == 20
    assert t.scan(spark, ref="exp").count() == 5
    assert sorted(r.k for r in t.scan(spark, ref="exp").collect()) == list(range(500, 505))


def test_truncate_transform_partitioning(spark, tmpdir):
    """truncate(W, col) per the spec's transform table: integers
    truncate to v - (v mod W) with a positive remainder (pure integer
    arithmetic, exact for big longs), strings to their first W
    codepoints; partition values carry the SOURCE type."""
    df = spark.range(-50, 50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("PRIO-"), (F.col("id") % 3).cast("string")).alias("prio"),
    )
    t = IcebergTable.create(
        tmpdir + "/t", df.schema, partition_by=("truncate(10, k)", "truncate(6, prio)")
    )
    t.append(df)
    spec = t.partition_spec
    assert spec[0]["transform"] == "truncate[10]" and spec[0]["name"] == "k_trunc"
    assert spec[1]["transform"] == "truncate[6]" and spec[1]["name"] == "prio_trunc"

    out = t.scan(spark)
    assert out.count() == 100
    assert out.schema.fieldNames() == ["k", "prio"]  # no derived col leaks
    # k survives inside the files (derived cols exist only as hive dirs)
    assert out.filter("k = -7").count() == 1

    # spec semantics: -7 -> -10 (positive remainder), 7 -> 0, 10 -> 10
    ks = {f["partition"]["k_trunc"] for f in t.live_files()}
    assert ks == {-50, -40, -30, -20, -10, 0, 10, 20, 30, 40}
    prios = {f["partition"]["prio_trunc"] for f in t.live_files()}
    assert prios == {"PRIO-0", "PRIO-1", "PRIO-2", "PRIO--"}  # 6 codepoints

    # metadata-level pruning uses the truncate[W] integer ranges
    assert len(t.plan_files("k >= 40")) < len(t.live_files())
    assert t.scan(spark, where="k >= 40").count() == 10


def test_partition_spec_evolution(spark, tmpdir):
    """update_spec(): a NEW spec-id becomes the default; files already
    written keep their spec (resolved per-manifest at scan); identity
    values from OLD hive layouts still load and prune; repeated
    (source-id, transform) pairs keep their field-id."""
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "O").otherwise("F").alias("status"),
    )
    t = IcebergTable.create(tmpdir + "/t", df.schema, partition_by=("status",))
    t.append(df.filter("k < 50"))
    old_fid = t.partition_spec[0]["field-id"]

    sid = t.update_spec(("truncate(10, k)",))
    assert sid == 1 and t.metadata["default-spec-id"] == 1
    t.append(df.filter("k >= 50"))

    out = t.scan(spark)
    assert out.count() == 100
    assert out.agg(F.sum("k")).collect()[0][0] == 4950
    # identity values from the OLD layout still come back correct
    assert out.filter("status = 'O'").count() == 50

    # old-spec files prune on identity partition values, new-spec files
    # on truncate ranges
    assert len(t.plan_files("k >= 90")) < len(t.live_files())
    assert t.scan(spark, where="k >= 90").count() == 10

    # deletes work across mixed layouts
    t.delete_where(spark, "k % 10 = 3")
    assert t.scan(spark).count() == 90

    # re-adding the SAME (source, transform) keeps its field-id
    sid2 = t.update_spec(("status", "truncate(10, k)"))
    assert sid2 == 2
    by_tf = {f["transform"]: f for f in t.partition_spec}
    assert by_tf["identity"]["field-id"] == old_fid
    assert by_tf["truncate[10]"]["field-id"] == 1001
    t.append(df.filter("k < 10").withColumn("k", F.col("k") + 1000))
    assert t.scan(spark).count() == 100

    # snapshot time travel still resolves the layouts files had THEN
    hist = t.history()
    first = hist[0]["snapshot-id"]
    assert t.scan(spark, snapshot_id=first).count() == 50


def test_run_once_drain_flushes_windows_from_python_source(spark, tmp_path):
    """Pipeline.run_once(drain=True): the Iceberg-ends flagship shape —
    Python-DataSource stream -> watermarked window agg -> exactly-once
    sink — produces FLUSHED windows under Trigger.AvailableNow in one
    call. Spark skips the no-data flush batch for Python sources, so
    without the drain pass the windows stay in state; the drain's second
    AvailableNow run on the same checkpoint evicts them, and the ledger
    makes it idempotent."""
    import datetime as dt

    import pandas as pd

    from benthos_spark.datagen.clips import (
        BASE_TS,
        CLIPS_SCHEMA,
        SENTINEL_CODEC,
        generate_clips,
    )
    from benthos_spark.iceberg.source import IcebergSource
    from benthos_spark.operators.windows import WindowAgg
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
    from benthos_spark.streaming.pipeline import Pipeline

    src_tbl = str(tmp_path / "src")
    clips = generate_clips(spark, 120)
    t = IcebergTable.create(src_tbl, clips.schema)
    t.append(clips)
    # one far-future sentinel row advances the watermark past every window
    import numpy as np

    sentinel = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": ["clip-sentinel"],
                "bytes": [b""],
                "sr_hz": np.array([0], dtype=np.int32),
                "dur_ms": np.array([0], dtype=np.int32),
                "codec": [SENTINEL_CODEC],
                "transcript": [""],
                "event_ts": [BASE_TS + dt.timedelta(days=365)],
            }
        ),
        schema=CLIPS_SCHEMA,
    )
    t.append(sentinel)

    pipe = Pipeline(
        source=IcebergSource(src_tbl, streaming=True),
        processors=[
            WindowAgg(
                ts_col="event_ts",
                size="1 minute",
                lateness="30 seconds",
                group_cols=["codec"],
                aggs={"n_clips": F.count(F.lit(1))},
            )
        ],
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    pipe.run_once(spark, sink, checkpoint=str(tmp_path / "ckpt"), drain=True)

    out = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
    assert out.agg(F.sum("n_clips")).collect()[0][0] == 120
    assert out.groupBy("window_start", "codec").count().filter("count > 1").count() == 0


def test_rewrite_data_files_bin_packs_small_files(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema, partition_by=("part",))
    # one big append (stays) + many tiny appends (packed): the shape an
    # exactly-once streaming sink leaves behind
    t.append(_sample_df(spark, 3000))
    big_paths = {f["file_path"] for f in t._live_entries()[0]}
    for i in range(5):
        t.append(_sample_df(spark, 6, offset=3000 + 6 * i))
    pre_snapshot = t.current_snapshot()["snapshot-id"]
    expect = sorted(r.k for r in t.scan(spark).collect())
    data, _ = t._live_entries()
    n_small_before = sum(1 for f in data if f["file_path"] not in big_paths)
    assert n_small_before >= 10  # 5 appends x 3 partitions

    # threshold chosen between tiny-append and big-append file sizes
    big_min = min(
        f["file_size_in_bytes"] for f in data if f["file_path"] in big_paths
    )
    small_max = max(
        f["file_size_in_bytes"] for f in data if f["file_path"] not in big_paths
    )
    assert small_max < big_min  # the threshold below separates the two
    res = t.rewrite_data_files(
        spark, target_file_size_bytes=2 * big_min, min_input_files=2, small_ratio=0.5
    )
    assert res["rewritten_files"] == n_small_before
    assert res["groups"] == 3  # one per partition value
    assert 0 < res["added_files"] < n_small_before

    # content identical; big files untouched; small files replaced
    assert sorted(r.k for r in t.scan(spark).collect()) == expect
    data2, _ = t._live_entries()
    paths2 = {f["file_path"] for f in data2}
    assert big_paths <= paths2
    assert len(data2) == len(big_paths) + res["added_files"]
    assert t.current_snapshot()["summary"]["operation"] == "replace"
    # time travel to the pre-rewrite snapshot still works
    assert sorted(r.k for r in t.scan(spark, snapshot_id=pre_snapshot).collect()) == expect


def test_rewrite_data_files_materializes_deletes(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema, partition_by=("part",))
    for i in range(4):
        t.append(_sample_df(spark, 10, offset=10 * i))
    t.delete_where(spark, "k % 5 = 0")
    expect = sorted(r.k for r in t.scan(spark).collect())
    _, deletes_before = t._live_entries()
    assert deletes_before  # pending position deletes exist

    res = t.rewrite_data_files(spark, target_file_size_bytes=1 << 20, min_input_files=2)
    assert res["rewritten_files"] > 0
    assert sorted(r.k for r in t.scan(spark).collect()) == expect
    # the rewritten files no longer depend on the delete files: reading
    # the NEW data files raw (no delete application) shows no deleted key
    data2, _ = t._live_entries()
    new_paths = [f["file_path"] for f in data2]
    raw = spark.read.option("basePath", tmpdir + "/t/data").parquet(*new_paths)
    assert sorted(r.k for r in raw.select("k").collect()) == expect


def test_rewrite_data_files_respects_min_input_files(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema)
    t.append(_sample_df(spark, 5).coalesce(1))  # exactly one small file
    res = t.rewrite_data_files(spark, target_file_size_bytes=1 << 20, min_input_files=2)
    assert res == {
        "rewritten_files": 0,
        "added_files": 0,
        "groups": 0,
        "snapshot_id": t.current_snapshot()["snapshot-id"],
    }


def test_rewrite_data_files_survives_spec_evolution(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema, partition_by=("part",))
    t.append(_sample_df(spark, 9))          # spec 0 files (small, kept or packed)
    t.update_spec(partition_by=())          # drop partitioning
    t.append(_sample_df(spark, 6, offset=9))   # spec 1 files
    t.append(_sample_df(spark, 6, offset=15))  # spec 1 files
    expect = sorted(r.k for r in t.scan(spark).collect())
    res = t.rewrite_data_files(spark, target_file_size_bytes=1 << 20, min_input_files=2)
    assert res["rewritten_files"] > 0
    assert sorted(r.k for r in t.scan(spark).collect()) == expect
    # rewritten files were written under the CURRENT (unpartitioned)
    # spec; any kept old-spec entries keep their own layout
    assert sorted(r.k for r in t.scan(spark).collect()) == expect


def test_streaming_source_skips_rewrite_snapshots(spark, tmpdir):
    import tempfile as _tf

    from benthos_spark.iceberg import source as ice_source

    loc = tmpdir + "/t"
    t = IcebergTable.create(loc, _sample_df(spark).schema)
    for i in range(3):
        t.append(_sample_df(spark, 4, offset=4 * i))
    t.rewrite_data_files(spark, target_file_size_bytes=1 << 20, min_input_files=2)
    t.append(_sample_df(spark, 4, offset=12))

    ice_source.register(spark)
    out_dir, ckpt = _tf.mkdtemp(prefix="bs_rw_out_"), _tf.mkdtemp(prefix="bs_rw_ck_")
    q = (
        spark.readStream.format("benthos_iceberg").option("path", loc).load()
        .writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = sorted(r.k for r in spark.read.parquet(out_dir).collect())
    # every row exactly once: the replace snapshot's re-added files are
    # skipped; appends before AND after the rewrite are all delivered
    assert got == list(range(16))


def test_rewrite_manifests_preserves_evolved_spec_layouts(spark, tmpdir):
    # regression: rewrite_manifests used to stamp EVERY entry with the
    # default spec id; old-spec files have a different partition struct
    # (identity values live in hive dirs), so their partition columns
    # silently came back NULL after a metadata compaction.
    t = IcebergTable.create(tmpdir + "/t", _sample_df(spark).schema, partition_by=("part",))
    t.append(_sample_df(spark, 6))           # spec 0 (partitioned)
    t.update_spec(partition_by=())           # spec 1 (unpartitioned)
    t.append(_sample_df(spark, 6, offset=6)) # spec 1
    expect = {r.k: r.part for r in t.scan(spark).collect()}
    assert all(p is not None for p in expect.values())
    t.rewrite_manifests()
    got = {r.k: r.part for r in t.scan(spark).collect()}
    assert got == expect  # no nulled partition columns
    # per-spec manifests keep identity pruning working for old files
    assert len(t.plan_files("part = 1")) < len(t._live_entries()[0])
