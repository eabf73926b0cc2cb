"""Bucketed co-located joins: both sides pre-bucketed by the join key →
the join plan has ZERO shuffle Exchange (the 100 TB fact⨝fact
strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.bucketing import (
    assert_no_shuffle,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    clips = spark.range(0, 2000).select(
        F.concat(F.lit("c"), F.col("id")).alias("clip_id"),
        (F.col("id") % 7).alias("dur_bucket"),
    )
    transcripts = spark.range(0, 2000).select(
        F.concat(F.lit("c"), F.col("id")).alias("clip_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("transcript"),
    )
    write_bucketed(clips, "b_clips", ["clip_id"], 8)
    write_bucketed(transcripts, "b_transcripts", ["clip_id"], 8)
    yield "b_clips", "b_transcripts"
    spark.sql("DROP TABLE IF EXISTS b_clips")
    spark.sql("DROP TABLE IF EXISTS b_transcripts")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["clip_id"])
    assert_no_shuffle(joined)
    assert joined.count() == 2000


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join against a plain DataFrame (no bucketing,
    broadcast disabled) requires shuffles — showing the assertion bites."""
    left, _ = bucketed_tables
    plain = spark.range(0, 2000).select(
        F.concat(F.lit("c"), F.col("id")).alias("clip_id"), F.lit("x").alias("v")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(left).join(plain, "clip_id")
        with pytest.raises(AssertionError, match="shuffle"):
            assert_no_shuffle(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also reuses the bucketing (no Exchange
    before the final aggregate)."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("clip_id").agg(F.count(F.lit(1)).alias("n"))
    assert_no_shuffle(agg)
    assert agg.count() == 2000


def test_exactly_once_bucketed_table_sink(spark, tmp_path):
    """The streaming sink variant that lands a bucketed table: replays
    are idempotent (ledger + dynamic partition overwrite) and the
    committed table joins downstream WITHOUT a shuffle."""
    from benthos_spark.sinks.exactly_once import ExactlyOnceBucketedTableSink

    sink = ExactlyOnceBucketedTableSink(
        "eo_bucketed", str(tmp_path / "ledger"), ("clip_id",), n_buckets=8
    )
    batch0 = spark.range(0, 100).select(
        F.concat(F.lit("c"), F.col("id")).alias("clip_id"), F.lit(1).alias("v")
    )
    batch1 = spark.range(100, 150).select(
        F.concat(F.lit("c"), F.col("id")).alias("clip_id"), F.lit(2).alias("v")
    )
    try:
        sink(batch0, 0)
        sink(batch1, 1)
        sink(batch0, 0)  # replay: must be a no-op (ledger skip)
        out = sink.read_committed(spark)
        assert out.count() == 150
        assert out.groupBy("clip_id").count().filter("count > 1").count() == 0

        # downstream co-located join against another 8-bucket table
        dim = spark.range(0, 150).select(
            F.concat(F.lit("c"), F.col("id")).alias("clip_id"),
            F.concat(F.lit("t"), F.col("id")).alias("transcript"),
        )
        write_bucketed(dim, "eo_dim", ["clip_id"], 8)
        joined = spark.table("eo_bucketed").join(spark.table("eo_dim"), "clip_id")
        assert_no_shuffle(joined)
        assert joined.count() == 150
    finally:
        spark.sql("DROP TABLE IF EXISTS eo_bucketed")
        spark.sql("DROP TABLE IF EXISTS eo_dim")
