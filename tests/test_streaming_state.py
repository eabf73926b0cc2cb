"""Keyed streaming state (SURVEY.md §2.7): clip↔transcript stream-stream
join (≙ sequence.sharded_join, input_sequence.go:144-157), the
applyInPandasWithState variant, dedupe-within-watermark
(processor_dedupe.go:26), and the end-to-end per-row invariant from
BASELINE.json: decoded-PCM SNR ≥ 30 dB + transcript equality, exactly-once.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from benthos_spark.datagen import clips as clipgen
from benthos_spark.functions import audio
from benthos_spark.operators.state import (
    clip_transcript_join,
    dedupe_within_watermark,
    stateful_clip_join,
)
from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
from benthos_spark.streaming.pipeline import run_to_completion

N = 200

CLIP_SIDE_SCHEMA = "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, event_ts timestamp"
TRANSCRIPT_SIDE_SCHEMA = "clip_id string, transcript string, event_ts timestamp"


@pytest.fixture(scope="module")
def side_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("split_stream")
    full = clipgen.generate_clips(spark, N, partitions=4)
    clip_side, transcript_side = clipgen.split_clip_stream(full)
    cdir, tdir = str(base / "clips"), str(base / "transcripts")
    clip_side.write.mode("overwrite").parquet(cdir)
    transcript_side.write.mode("overwrite").parquet(tdir)
    return cdir, tdir


def _read_stream(spark, path, schema):
    return spark.readStream.schema(schema).parquet(path)


def _run_to_sink(spark, df, tmp_path, name):
    sink = ExactlyOnceParquetSink(str(tmp_path / f"{name}_out"))
    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q, timeout_s=300)
    return sink


def test_stream_stream_join(spark, side_dirs, tmp_path):
    """Watermarked equi-join of the two sub-streams recovers every pair
    with the transcript intact (≙ sharded_join inner semantics)."""
    cdir, tdir = side_dirs
    joined = clip_transcript_join(
        _read_stream(spark, cdir, CLIP_SIDE_SCHEMA),
        _read_stream(spark, tdir, TRANSCRIPT_SIDE_SCHEMA),
    )
    sink = _run_to_sink(spark, joined, tmp_path, "ssj")
    out = sink.read_committed(spark)
    assert out.count() == N
    assert out.select("clip_id").distinct().count() == N

    expected = clipgen.generate_clips(spark, N, partitions=4).select(
        "clip_id", F.col("transcript").alias("expected_transcript")
    )
    mismatches = (
        out.join(expected, "clip_id")
        .filter(F.col("transcript") != F.col("expected_transcript"))
        .count()
    )
    assert mismatches == 0


def test_stateful_clip_join(spark, side_dirs, tmp_path):
    """applyInPandasWithState buffer-until-both-sides join over the tagged
    union stream — the custom-collision-strategy path."""
    cdir, tdir = side_dirs
    c = _read_stream(spark, cdir, CLIP_SIDE_SCHEMA).withColumn("transcript", F.lit(None).cast("string"))
    t = (
        _read_stream(spark, tdir, TRANSCRIPT_SIDE_SCHEMA)
        .withColumn("bytes", F.lit(None).cast("binary"))
        .withColumn("sr_hz", F.lit(None).cast("int"))
        .withColumn("dur_ms", F.lit(None).cast("int"))
        .withColumn("codec", F.lit(None).cast("string"))
    )
    union = c.unionByName(t.select(c.columns))
    joined = stateful_clip_join(union, timeout_ms=None)
    sink = _run_to_sink(spark, joined, tmp_path, "apws")
    out = sink.read_committed(spark)
    assert out.count() == N
    assert out.filter(F.col("transcript").isNull() | F.col("bytes").isNull()).count() == 0


def test_dedupe_within_watermark(spark, side_dirs, tmp_path):
    """Re-delivered rows (the F2 duplication case) collapse to one
    survivor per clip_id."""
    cdir, _ = side_dirs
    s1 = _read_stream(spark, cdir, CLIP_SIDE_SCHEMA)
    s2 = _read_stream(spark, cdir, CLIP_SIDE_SCHEMA)  # same data again
    doubled = s1.unionByName(s2)
    deduped = dedupe_within_watermark(doubled, ["clip_id"], "event_ts", "10 minutes")
    sink = _run_to_sink(spark, deduped, tmp_path, "dedupe")
    assert sink.read_committed(spark).count() == N


def test_end_to_end_row_invariant(spark, side_dirs, tmp_path):
    """The BASELINE.json gate: stream-join the two sides, commit
    exactly-once, then verify EVERY row's decoded PCM reaches SNR ≥ 30 dB
    against the reference signal and the transcript matches exactly."""
    cdir, tdir = side_dirs
    joined = clip_transcript_join(
        _read_stream(spark, cdir, CLIP_SIDE_SCHEMA),
        _read_stream(spark, tdir, TRANSCRIPT_SIDE_SCHEMA),
    )
    sink = _run_to_sink(spark, joined, tmp_path, "inv")
    rows = sink.read_committed(spark).collect()
    assert len(rows) == N
    for r in rows:
        i = int(r["clip_id"].split("-")[1])
        ref = clipgen.reference_signal(i, r["sr_hz"], r["dur_ms"])
        decoded = audio.decode(bytes(r["bytes"]), r["codec"])
        assert audio.snr_db(ref, decoded) >= 30.0, r["clip_id"]
        assert r["transcript"] == clipgen.make_transcript(i, r["dur_ms"]), r["clip_id"]


def test_transcode_stage_roundtrip(spark):
    """Decode → resample → re-encode mapInPandas stage: output is uniform
    pcm_s16le@16k and still correlates with the reference signal."""
    from benthos_spark.functions.audio import transcode_map_in_pandas

    df = clipgen.generate_clips(spark, 40, partitions=2)
    out = df.mapInPandas(
        transcode_map_in_pandas("pcm_s16le", 16000), schema=clipgen.CLIPS_SCHEMA
    ).collect()
    assert len(out) == 40
    for r in out:
        assert r["codec"] == "pcm_s16le" and r["sr_hz"] == 16000
        i = int(r["clip_id"].split("-")[1])
        # resampled: compare against the reference resampled the same way
        p = clipgen.clip_params(np.array([i], dtype=np.uint64))
        ref = clipgen.reference_signal(i, int(p["sr_hz"][0]), int(p["dur_ms"][0]))
        ref_rs = audio.resample_linear(ref, int(p["sr_hz"][0]), 16000)
        assert audio.snr_db(ref_rs, audio.decode(bytes(r["bytes"]), "pcm_s16le")) >= 25.0


def test_rocksdb_state_store_backend(spark, side_dirs, tmp_path):
    """The north-star state backend: the same watermarked dedupe runs on
    the RocksDB state store provider (changelog-checkpointed, the
    at-scale choice over the default HDFS-backed in-memory map)."""
    cdir, _ = side_dirs
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        s = _read_stream(spark, cdir, CLIP_SIDE_SCHEMA)
        doubled = s.unionByName(s)
        deduped = dedupe_within_watermark(doubled, ["clip_id"], "event_ts", "10 minutes")
        sink = _run_to_sink(spark, deduped, tmp_path, "rocksdb")
        assert sink.read_committed(spark).count() == N
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_stream_outer_join_emits_unmatched(spark, tmp_path):
    """sharded_join `outer` semantics (input_sequence.go:144-157): clips
    whose transcript never arrives emit with a NULL transcript once the
    watermark passes the join window."""
    import datetime as dt

    import pandas as pd

    full = clipgen.generate_clips(spark, 60, partitions=2)
    clip_side, transcript_side = clipgen.split_clip_stream(full)
    # drop a deterministic 25% of transcripts
    orphaned = transcript_side.filter(F.crc32(F.col("clip_id")) % 4 == 0)
    kept = transcript_side.filter(F.crc32(F.col("clip_id")) % 4 != 0)
    n_orphans = orphaned.count()
    assert n_orphans > 0

    cdir, tdir = str(tmp_path / "c"), str(tmp_path / "t")
    clip_side.write.parquet(cdir)
    kept.write.parquet(tdir)
    # far-future watermark pushers on BOTH sides (outer emission waits for
    # the watermark to pass the buffered rows' join window)
    future = clipgen.BASE_TS + dt.timedelta(days=365)
    spark.createDataFrame(
        pd.DataFrame({"clip_id": ["s"], "bytes": [b""], "sr_hz": [0], "dur_ms": [0],
                      "codec": ["_sentinel"], "event_ts": [future]}),
        schema=CLIP_SIDE_SCHEMA,
    ).write.mode("append").parquet(cdir)
    spark.createDataFrame(
        pd.DataFrame({"clip_id": ["s"], "transcript": [""], "event_ts": [future]}),
        schema=TRANSCRIPT_SIDE_SCHEMA,
    ).write.mode("append").parquet(tdir)

    joined = clip_transcript_join(
        _read_stream(spark, cdir, CLIP_SIDE_SCHEMA),
        _read_stream(spark, tdir, TRANSCRIPT_SIDE_SCHEMA),
        how="leftOuter",
    )
    sink = _run_to_sink(spark, joined, tmp_path, "outer")
    out = sink.read_committed(spark).filter(F.col("codec") != "_sentinel")
    assert out.count() == 60
    nulls = out.filter(F.col("transcript").isNull())
    assert nulls.count() == n_orphans
    assert out.filter(F.col("transcript").isNotNull()).count() == 60 - n_orphans


def test_sessionize_with_state_burst_closure(spark, tmp_path):
    """Custom stateful sessionizer: a later burst for the same key closes
    the earlier session (emitted mid-stream, no timeout needed)."""
    import datetime as dt

    import pandas as pd

    from benthos_spark.operators.state import sessionize_with_state

    base = dt.datetime(2024, 3, 1)
    rows = []
    for u in (1, 2):
        for i in range(5):  # burst A
            rows.append((u, base + dt.timedelta(minutes=i)))
        for i in range(3):  # burst B, 2h later -> closes burst A
            rows.append((u, base + dt.timedelta(hours=2, minutes=i)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf, "user_id long, ts timestamp").write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    sessions = sessionize_with_state(stream, timeout_ms=None)
    sink = _run_to_sink(spark, sessions, tmp_path, "sessb")
    got = sink.read_committed(spark).collect()
    # burst A closed for each user; burst B stays open in state
    assert len(got) == 2
    for r in got:
        assert r["n_events"] == 5
        assert r["session_start"] == base
        assert r["session_end"] == base + dt.timedelta(minutes=4)


def test_stateful_join_fn_vectorized_parity():
    """The round-5 mask-vectorized ingest in _make_stateful_join_fn must be
    row-for-row identical to the original scalar itertuples walk — emitted
    frames AND carried state — across randomized multi-batch scenarios
    (mixed clip/transcript interleavings, carried halves, emit-and-clear).
    No Spark needed: the function is exercised directly with a fake
    GroupState, the same harness style as the CEP parity tests."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from benthos_spark.operators.state import _make_stateful_join_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v = None
            self.exists = False

        def setTimeoutDuration(self, ms):
            pass

    def old_fn(key, pdfs, state):
        # the pre-round-5 scalar walk, kept verbatim as the semantic oracle
        if state.hasTimedOut:
            state.remove()
            return
        (clip_bytes, sr, dur, codec, transcript, ts_ms) = (
            state.get if state.exists else (None,) * 6
        )
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                side_bytes = getattr(r, "bytes", None)
                side_tr = getattr(r, "transcript", None)
                if side_bytes is not None:
                    clip_bytes, sr, dur, codec = (
                        bytes(side_bytes), int(r.sr_hz), int(r.dur_ms), r.codec,
                    )
                    ts_ms = int(r.event_ts.timestamp() * 1000)
                if isinstance(side_tr, str):
                    transcript = side_tr
                    if ts_ms is None:
                        ts_ms = int(r.event_ts.timestamp() * 1000)
        if clip_bytes is not None and transcript is not None:
            state.remove()
            yield pd.DataFrame(
                {
                    "clip_id": [key[0]], "bytes": [clip_bytes], "sr_hz": [sr],
                    "dur_ms": [dur], "codec": [codec], "transcript": [transcript],
                    "event_ts": [dt.datetime.utcfromtimestamp(ts_ms / 1000.0)],
                }
            )
        else:
            state.update((clip_bytes, sr, dur, codec, transcript, ts_ms))

    def make_pdf(n, seed):
        rng = np.random.default_rng(seed)
        is_clip = rng.random(n) < 0.5
        ts0 = dt.datetime(2026, 1, 1)
        return pd.DataFrame(
            {
                "clip_id": ["k"] * n,
                "bytes": [b"\x01\x02" * 8 if c else None for c in is_clip],
                "sr_hz": [16000 if c else None for c in is_clip],
                "dur_ms": [1000 if c else None for c in is_clip],
                "codec": ["pcm16" if c else None for c in is_clip],
                "transcript": [None if c else f"t{i}" for i, c in enumerate(is_clip)],
                "event_ts": [ts0 + dt.timedelta(milliseconds=int(i)) for i in range(n)],
            }
        )

    new_fn = _make_stateful_join_fn(None)
    rng = np.random.default_rng(0)
    for trial in range(40):
        n = int(rng.integers(1, 400))
        p = make_pdf(n, seed=trial)
        if n > 4:
            parts = np.sort(rng.choice(np.arange(1, n), size=3, replace=False))
            chunks = np.split(np.arange(n), parts)
        else:
            chunks = [np.arange(n)]
        so, sn = FakeState(), FakeState()
        oo = [x for ch in chunks for x in old_fn(("k",), iter([p.iloc[ch]]), so)]
        nn = [x for ch in chunks for x in new_fn(("k",), iter([p.iloc[ch]]), sn)]
        assert len(oo) == len(nn), (trial, len(oo), len(nn))
        for a, b in zip(oo, nn):
            pd.testing.assert_frame_equal(
                a.reset_index(drop=True), b.reset_index(drop=True)
            )
        assert so._v == sn._v, (trial, so._v, sn._v)
