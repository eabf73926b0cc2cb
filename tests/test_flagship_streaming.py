"""The end-to-end slice (SURVEY.md §7 step 2): clips parquet stream →
vectorized decode features → watermarked tumbling window agg per codec →
exactly-once sink; resumable from checkpoint (kill/resume invariant,
FIXTURES.md F5)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from benthos_spark.datagen.clips import CLIPS_SCHEMA, SENTINEL_CODEC, write_clips, write_sentinel
from benthos_spark.functions.audio import AUDIO_FEATURE_FIELDS, audio_features_map_in_pandas
from benthos_spark.operators.processors import Mutation, Processor
from benthos_spark.operators.windows import WindowAgg
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
from benthos_spark.sources.readers import ParquetSource
from benthos_spark.streaming.pipeline import Pipeline, run_to_completion

N_CLIPS = 400


class AudioFeatures(Processor):
    """Vectorized PCM decode → per-clip features (the `mapping` stage with
    a pandas-UDF body, ≙ processor_mapping.go:15 semantics on binary)."""

    def __call__(self, df):
        passthrough = ["clip_id", "sr_hz", "dur_ms", "codec", "event_ts"]
        fn = audio_features_map_in_pandas(passthrough)
        schema = (
            "clip_id string, sr_hz int, dur_ms int, codec string, event_ts timestamp, "
            + AUDIO_FEATURE_FIELDS
        )
        return df.mapInPandas(fn, schema=schema)


def _flagship_pipeline(src_dir: str, max_files: int | None = None) -> Pipeline:
    return Pipeline(
        source=ParquetSource(
            src_dir, streaming=True, schema=CLIPS_SCHEMA, max_files_per_trigger=max_files
        ),
        processors=[
            AudioFeatures(),
            Mutation({"clip_ok": F.col("clip_ok") & (F.col("rms") > 0)}),
            WindowAgg(
                ts_col="event_ts",
                size="1 minute",
                lateness="30 seconds",
                group_cols=["codec"],
                aggs={
                    "n_clips": F.count(F.lit(1)),
                    "total_samples": F.sum("n_samples"),
                    "avg_rms": F.avg("rms"),
                    "ok_clips": F.sum(F.col("clip_ok").cast("long")),
                },
            ),
            # NOTE: do NOT filter the sentinel here — Catalyst pushes a
            # `codec != '_sentinel'` predicate below the EventTimeWatermark
            # node (through the agg into the scan), so the sentinel would
            # never advance the watermark. Sentinel rows are excluded on
            # the read side instead.
        ],
    )


@pytest.fixture(scope="module")
def clips_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clips_src"))
    write_clips(spark, d, N_CLIPS, files=8)
    write_sentinel(spark, d)
    return d


def _expected_windows(spark, clips_dir):
    """Batch oracle: the same aggregation computed non-streaming. Late rows
    (jittered backwards ≤3 windows, lateness 30s) can be dropped by the
    stream; the oracle models the watermark by excluding rows arriving
    after it (arrival order = clip index order)."""
    df = spark.read.parquet(clips_dir).filter(F.col("codec") != SENTINEL_CODEC)
    # watermark at end of run = max event_ts - 30s; every window ending
    # before that flushed before late rows older than it could enter —
    # a row is dropped iff event_ts < (max event ts seen BEFORE it) - 30s.
    # With a monotone main sequence (step 250ms), "seen before" ≈ its
    # arrival position ts; we replicate via a running max over clip index.
    from pyspark.sql.window import Window

    w = Window.orderBy("clip_id").rowsBetween(Window.unboundedPreceding, -1)
    arr = df.withColumn("prior_max", F.max("event_ts").over(w))
    kept = arr.filter(
        F.col("prior_max").isNull()
        | (F.col("event_ts") >= F.col("prior_max") - F.expr("INTERVAL 30 seconds"))
    )
    return (
        kept.groupBy(F.window("event_ts", "1 minute").alias("w"), "codec")
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select(F.col("w.start").alias("window_start"), "codec", "n_clips")
        .collect()
    )


def _collect_counts(spark, sink):
    return {
        (r["window_start"], r["codec"]): r["n_clips"]
        for r in sink.read_committed(spark)
        .filter((F.col("n_clips") > 0) & (F.col("codec") != SENTINEL_CODEC))
        .collect()
    }


def test_flagship_end_to_end(spark, clips_dir, tmp_path):
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), lineage_cols=("window_start",))
    q = _flagship_pipeline(clips_dir).start(
        spark, sink, checkpoint=str(tmp_path / "ckpt"), output_mode="append", trigger_once=True
    )
    run_to_completion(q)

    got = _collect_counts(spark, sink)
    # all-at-once ingestion: watermark never trails the main sequence, so
    # nothing real is dropped — totals must cover every clip.
    assert sum(got.values()) == N_CLIPS
    expected = {
        (r["window_start"], r["codec"]): r["n_clips"]
        for r in _expected_windows_all(spark, clips_dir)
    }
    assert got == expected
    assert all("partitions" in entry for entry in sink.lineage())
    assert sink.committed_rows() >= len(got)  # ledger also counts sentinel rows


def _expected_windows_all(spark, clips_dir):
    df = spark.read.parquet(clips_dir).filter(F.col("codec") != SENTINEL_CODEC)
    return (
        df.groupBy(F.window("event_ts", "1 minute").alias("w"), "codec")
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select(F.col("w.start").alias("window_start"), "codec", "n_clips")
        .collect()
    )


def test_kill_resume_exactly_once(spark, clips_dir, tmp_path):
    """Start incremental processing, stop after ≥1 committed batch
    ('crash'), resume from the same checkpoint with availableNow: committed
    output must match a single uninterrupted run exactly (F5)."""
    ckpt = str(tmp_path / "ckpt")
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))

    q = _flagship_pipeline(clips_dir, max_files=2).start(
        spark, sink, checkpoint=ckpt, processing_time="200 milliseconds"
    )
    deadline = time.time() + 120
    while not sink.committed_batches() and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    assert sink.committed_batches(), "no batch committed before the kill"

    q2 = _flagship_pipeline(clips_dir, max_files=2).start(
        spark, sink, checkpoint=ckpt, trigger_once=True
    )
    run_to_completion(q2, timeout_s=300)

    got = _collect_counts(spark, sink)
    # incremental ingestion: the watermark can genuinely drop jittered-late
    # rows — compare against the arrival-aware oracle, allowing the stream
    # to have kept rows the strict oracle drops (watermark advances lazily).
    strict = {
        (r["window_start"], r["codec"]): r["n_clips"] for r in _expected_windows(spark, clips_dir)
    }
    upper = {
        (r["window_start"], r["codec"]): r["n_clips"]
        for r in _expected_windows_all(spark, clips_dir)
    }
    assert sum(strict.values()) <= sum(got.values()) <= sum(upper.values())
    for k, n in got.items():
        assert strict.get(k, 0) <= n <= upper[k], (k, n)
    # exactly-once: no (window, codec) appears twice across batches
    rows = sink.read_committed(spark).groupBy("window_start", "codec").count().collect()
    assert all(r["count"] == 1 for r in rows)


def test_bloblang_mapping_streams_exactly_once(spark, clips_dir, tmp_path):
    """A real-Bloblang `mutation` stage (Column tier — no Python in the
    plan) inside a streaming pipeline with the exactly-once sink: the
    mapping-language frontend composes with watermarked windows and the
    commit ledger like any Column processor."""
    from benthos_spark.bloblang import BloblangMutation

    pipe = Pipeline(
        source=ParquetSource(clips_dir, streaming=True, schema=CLIPS_SCHEMA),
        processors=[
            BloblangMutation(
                'root.n_words = this.transcript.split(" ").length()\n'
                'root.long_clip = this.dur_ms > 1000'
            ),
            WindowAgg(
                ts_col="event_ts",
                size="1 minute",
                lateness="30 seconds",
                group_cols=["codec"],
                aggs={
                    "n_clips": F.count(F.lit(1)),
                    "total_words": F.sum("n_words"),
                    "n_long": F.sum(F.col("long_clip").cast("long")),
                },
            ),
        ],
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    q = pipe.start(spark, sink, checkpoint=str(tmp_path / "ckpt"), trigger_once=True)
    run_to_completion(q)
    out = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
    total = out.agg(F.sum("n_clips"), F.sum("total_words")).collect()[0]
    assert total[0] == N_CLIPS
    assert total[1] > 0
    dup = out.groupBy("window_start", "codec").count().filter("count > 1").count()
    assert dup == 0
