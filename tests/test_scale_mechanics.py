"""100TB-scale mechanics, verified on plans and small data: bucketed
co-located joins (no Exchange), partitioned exactly-once output with
pruning, and file sizing for wide binary rows."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from benthos_spark.datagen.clips import generate_clips, split_clip_stream
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Pre-bucketing both sides by clip_id makes the join co-located:
    the physical plan must contain NO Exchange (at 100 TB this is the
    difference between joining in place and re-shuffling the table)."""
    full = generate_clips(spark, 200, partitions=4)
    clip_side, transcript_side = split_clip_stream(full)
    clip_side.write.bucketBy(8, "clip_id").sortBy("clip_id").mode("overwrite").saveAsTable("clips_b")
    transcript_side.write.bucketBy(8, "clip_id").sortBy("clip_id").mode("overwrite").saveAsTable(
        "transcripts_b"
    )
    # at 100 TB neither side broadcasts — force the big-big strategy the
    # bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("clips_b").join(spark.table("transcripts_b"), "clip_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS clips_b")
        spark.sql("DROP TABLE IF EXISTS transcripts_b")


def test_unbucketed_join_shuffles_for_contrast(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    full = generate_clips(spark, 200, partitions=4)
    clip_side, transcript_side = split_clip_stream(full)
    # disable broadcast so the contrast shows the shuffle a big-big join pays
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        clip_side.write.mode("overwrite").parquet(a)
        transcript_side.write.mode("overwrite").parquet(b)
        joined = spark.read.parquet(a).join(spark.read.parquet(b), "clip_id")
        assert "Exchange" in _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_exactly_once_sink(spark, tmp_path):
    """partition_by on the sink: hive layout inside the batch dir, and a
    partition-pruning read touches only the matching directory."""
    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out"), partition_by=("codec",), max_records_per_file=50
    )
    clips = generate_clips(spark, 120, partitions=3)
    sink(clips, batch_id=0)
    out = sink.read_committed(spark)
    assert out.count() == 120
    assert set(out.columns) == set(clips.columns)
    # hive-style partition dirs exist
    batch_dir = tmp_path / "out" / "data" / "_batch_id=0"
    assert any(p.name.startswith("codec=") for p in batch_dir.iterdir() if p.is_dir())
    # pruning: the scan of one codec reads only that partition
    plan = _plan(out.filter(F.col("codec") == "wav"))
    assert "PartitionFilters: [isnotnull(codec" in plan
    assert out.filter(F.col("codec") == "wav").count() > 0


def test_embedding_neardup_pairs_refuses_at_scale(spark, monkeypatch):
    """The O(n^2) exact baseline must refuse corpus-scale inputs and
    point at the LSH scale path."""
    import pytest as _pytest

    from benthos_spark.plans import catalog

    with _pytest.raises(ValueError, match="neardup_lsh"):
        catalog.embedding_neardup_pairs(spark, "/root/testdata/sf0.01", max_rows=10)
