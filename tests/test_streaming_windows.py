"""Streaming-mode window semantics (SURVEY.md §2.3): sliding-window
duplicate delivery, session windows on a stream, and stateful-join
kill/resume — the F5 fault-injection invariant on keyed state."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from benthos_spark.datagen.clips import (
    CLIPS_SCHEMA,
    SENTINEL_CODEC,
    generate_clips,
    split_clip_stream,
    write_clips,
    write_sentinel,
)
from benthos_spark.operators.state import clip_transcript_join
from benthos_spark.operators.windows import SessionWindowAgg, WindowAgg
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
from benthos_spark.sources.readers import ParquetSource
from benthos_spark.streaming.pipeline import Pipeline, run_to_completion

N = 240


@pytest.fixture(scope="module")
def clips_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("win_src"))
    write_clips(spark, d, N, files=4)
    write_sentinel(spark, d)
    return d


def test_sliding_window_duplicate_delivery(spark, clips_dir, tmp_path):
    """size=2m slide=1m: every row is delivered to exactly two windows —
    the duplicate emission is the SPEC (buffer_system_window.go:45), so
    the streamed counts must equal the batch double-count."""
    pipe = Pipeline(
        source=ParquetSource(clips_dir, streaming=True, schema=CLIPS_SCHEMA),
        processors=[
            WindowAgg(
                ts_col="event_ts", size="2 minutes", slide="1 minute",
                lateness="30 seconds", group_cols=[],
                aggs={"n": F.count(F.lit(1))},
            )
        ],
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    run_to_completion(
        pipe.start(spark, sink, checkpoint=str(tmp_path / "ckpt"), trigger_once=True),
        timeout_s=300,
    )
    got = {
        r["window_start"]: r["n"]
        for r in sink.read_committed(spark).filter(F.col("n") > 0).collect()
    }
    batch = spark.read.parquet(clips_dir).filter(F.col("codec") != SENTINEL_CODEC)
    expected = {
        r["ws"]: r["n"]
        for r in batch.groupBy(F.window("event_ts", "2 minutes", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    # the stream saw the sentinel too; drop its windows
    got = {k: v for k, v in got.items() if k in expected}
    assert got == expected
    assert sum(got.values()) == 2 * N  # every clip counted twice


def test_session_window_streaming(spark, clips_dir, tmp_path):
    """Built-in session windows on the stream (gap 30s over the 250ms
    cadence ⇒ one giant session per codec, split where jittered-late rows
    create isolated early clusters) must match the batch session_window."""
    pipe = Pipeline(
        source=ParquetSource(clips_dir, streaming=True, schema=CLIPS_SCHEMA),
        processors=[
            SessionWindowAgg(
                ts_col="event_ts", gap="30 seconds", lateness="10 minutes",
                group_cols=["codec"], aggs={"n": F.count(F.lit(1))},
            )
        ],
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    run_to_completion(
        pipe.start(spark, sink, checkpoint=str(tmp_path / "ckpt"), trigger_once=True),
        timeout_s=300,
    )
    got = {
        (r["codec"], r["session_start"]): r["n"]
        for r in sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC).collect()
    }
    batch = spark.read.parquet(clips_dir).filter(F.col("codec") != SENTINEL_CODEC)
    expected = {
        (r["codec"], r["ss"]): r["n"]
        for r in batch.groupBy(F.session_window("event_ts", "30 seconds").alias("w"), "codec")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("codec", F.col("w.start").alias("ss"), "n")
        .collect()
    }
    assert got == expected
    assert sum(got.values()) == N


def test_stateful_join_kill_resume(spark, tmp_path):
    """F5 on keyed state: kill the stream-stream join mid-run, resume from
    the checkpoint — committed output must hold each clip exactly once."""
    full = generate_clips(spark, N, partitions=6)
    clip_side, transcript_side = split_clip_stream(full)
    cdir, tdir = str(tmp_path / "c"), str(tmp_path / "t")
    clip_side.write.parquet(cdir)
    transcript_side.write.parquet(tdir)

    def pipeline(trigger_once: bool):
        c = spark.readStream.schema(
            "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, event_ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(cdir)
        t = spark.readStream.schema(
            "clip_id string, transcript string, event_ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(tdir)
        joined = clip_transcript_join(c, t)
        w = (
            joined.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
        )
        w = w.trigger(availableNow=True) if trigger_once else w.trigger(processingTime="200 milliseconds")
        return w.start()

    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    q = pipeline(trigger_once=False)
    deadline = time.time() + 120
    while not sink.committed_batches() and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    assert sink.committed_batches(), "no batch committed before the kill"

    q2 = pipeline(trigger_once=True)
    run_to_completion(q2, timeout_s=300)

    out = sink.read_committed(spark)
    assert out.count() == N
    assert out.groupBy("clip_id").count().filter("count > 1").count() == 0


def test_sliding_window_kill_resume(spark, clips_dir, tmp_path):
    """F5 under a SLIDING window: kill mid-run, resume — committed counts
    must stay within [watermark-strict, no-drop] bounds per (window) and
    no (window) key may commit twice (exactly-once per (row, window),
    SURVEY §7 hard part (b))."""
    ckpt = str(tmp_path / "ckpt")
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))

    def pipeline(trigger_once: bool):
        pipe = Pipeline(
            source=ParquetSource(
                clips_dir, streaming=True, schema=CLIPS_SCHEMA, max_files_per_trigger=1
            ),
            processors=[
                WindowAgg(
                    ts_col="event_ts", size="2 minutes", slide="1 minute",
                    lateness="30 seconds", group_cols=[],
                    aggs={"n": F.count(F.lit(1))},
                )
            ],
        )
        return pipe.start(
            spark, sink, checkpoint=ckpt,
            trigger_once=trigger_once,
            processing_time=None if trigger_once else "200 milliseconds",
        )

    q = pipeline(trigger_once=False)
    deadline = time.time() + 120
    while not sink.committed_batches() and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    assert sink.committed_batches(), "no batch committed before the kill"

    q2 = pipeline(trigger_once=True)
    run_to_completion(q2, timeout_s=300)

    batch = spark.read.parquet(clips_dir).filter(F.col("codec") != SENTINEL_CODEC)
    upper = {
        r["ws"]: r["n"]
        for r in batch.groupBy(F.window("event_ts", "2 minutes", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    got = sink.read_committed(spark).filter(F.col("n") > 0).collect()
    counts = {}
    for r in got:
        if r["window_start"] in upper:
            counts[r["window_start"]] = counts.get(r["window_start"], 0) + 1
            assert r["n"] <= upper[r["window_start"]]
    assert all(c == 1 for c in counts.values())  # each window exactly once
    # nothing can exceed the no-drop bound; most rows survive (late-row
    # drops are bounded by the 5% late fraction x <=3 windows)
    total_got = sum(r["n"] for r in got if r["window_start"] in upper)
    assert total_got <= 2 * N
    assert total_got >= int(2 * N * 0.80)
