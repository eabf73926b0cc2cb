"""Streaming content-fingerprint dedupe: the reference's `dedupe`
processor keys on a hash of message CONTENT (internal/impl/pure/
processor_dedupe.go:26 — `key: ${! content().hash("xxhash64") }` is the
documented idiom), so redelivered payloads are dropped even when they
arrive under fresh message IDs. Here the content hash is the audio
spectral fingerprint (functions/audio_dsp.py) computed in-stream by a
vectorized Arrow stage, and the dedupe state is
``dropDuplicatesWithinWatermark`` — at-least-once upgraded to
exactly-once on content identity, not delivery identity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benthos_spark.datagen.clips import CLIPS_SCHEMA, SENTINEL_CODEC, write_clips, write_sentinel
from benthos_spark.functions.audio import AUDIO_MFCC_FP_FIELDS, mfcc_fp_map_in_pandas
from benthos_spark.operators.state import dedupe_within_watermark
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
from benthos_spark.streaming.pipeline import run_to_completion

N = 240
REDO_EVERY = 4  # every 4th clip is redelivered under a fresh message id

PASSTHROUGH = ["clip_id", "codec", "dur_ms", "event_ts"]
FP_SCHEMA = "clip_id string, codec string, dur_ms int, event_ts timestamp, " + AUDIO_MFCC_FP_FIELDS
# content identity = codec + duration + fingerprint stats; identical bytes
# produce identical fingerprints (pure numpy), so a redelivery always
# collides while distinct clips differ unless they are true content twins
# (which the batch oracle below treats identically).
CONTENT_KEYS = ["codec", "dur_ms", "n_fp", "fp_xor32"]


@pytest.fixture(scope="module")
def redelivered_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clips_redelivered"))
    write_clips(spark, d, N, files=4)
    # at-least-once redelivery: same bytes, FRESH message id — clip_id
    # dedupe cannot catch these, content dedupe must.
    redo = (
        spark.read.parquet(d)
        .filter(F.substring("clip_id", -1, 1).isin([str(i) for i in range(0, 10, REDO_EVERY)]))
        .withColumn("clip_id", F.concat(F.col("clip_id"), F.lit("~redo")))
    )
    redo.coalesce(1).write.mode("append").parquet(d)
    write_sentinel(spark, d)
    return d


def _fingerprinted(df):
    return df.mapInPandas(mfcc_fp_map_in_pandas(PASSTHROUGH), schema=FP_SCHEMA)


def test_streaming_content_dedupe_matches_batch_oracle(spark, redelivered_dir, tmp_path):
    stream = spark.readStream.schema(CLIPS_SCHEMA).parquet(redelivered_dir)
    deduped = dedupe_within_watermark(_fingerprinted(stream), CONTENT_KEYS, "event_ts", "10 minutes")
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    run_to_completion(q)

    got = sink.read_committed(spark).filter(F.col("codec") != SENTINEL_CODEC)
    batch = _fingerprinted(
        spark.read.parquet(redelivered_dir).filter(F.col("codec") != SENTINEL_CODEC)
    )
    n_total = batch.count()
    n_distinct = batch.dropDuplicates(CONTENT_KEYS).count()
    assert n_total > N  # the redeliveries really are in the source
    # stream output ≡ batch dedupe on the same content keys
    assert got.count() == n_distinct
    assert got.dropDuplicates(CONTENT_KEYS).count() == n_distinct
    # and every redelivered payload lost exactly one of its two arrivals
    base = F.regexp_replace("clip_id", "~redo$", "")
    survivors = got.select(base.alias("base")).distinct().count()
    assert survivors == n_distinct  # one survivor per content identity
