"""LoudnessGate / LoudnessMeasure — the audio quality cut as a
first-class (and streaming-safe) processor over the standard clip
schema."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from benthos_spark.functions import audio as A
from benthos_spark.operators.audio import LoudnessGate, LoudnessMeasure


def _clip_rows():
    """Six clips with controlled loudness: three 'loud' sines (~ -13
    LUFS) and three 'quiet' ones ~40 LU lower."""
    sr = 16000
    t = np.arange(sr)  # 1 s
    rows = []
    for i in range(6):
        amp = 0.5 if i < 3 else 0.005
        x = amp * np.sin(2 * np.pi * 440.0 * t / sr)
        rows.append(
            (
                f"c{i}",
                A.encode(x, "wav", sr),
                sr,
                1000,
                "wav",
                "loud" if i < 3 else "quiet",
            )
        )
    return rows


_SCHEMA = "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, label string"


def test_measure_appends_lufs_and_keeps_payload(spark):
    df = spark.createDataFrame(_clip_rows(), _SCHEMA)
    out = LoudnessMeasure()(df)
    rows = {r.clip_id: r for r in out.collect()}
    assert set(out.columns) == set(df.columns) | {"lufs_i", "lufs_mmax"}
    # payload survives the Arrow round trip byte-for-byte
    orig = {r[0]: r[1] for r in _clip_rows()}
    for cid, r in rows.items():
        assert bytes(r.bytes) == orig[cid]
        assert r.lufs_mmax >= r.lufs_i
    # the quiet clips sit ~40 LU below the loud ones (amplitude 1/100)
    assert rows["c0"].lufs_i - rows["c3"].lufs_i == pytest.approx(40.0, abs=0.5)


def test_gate_filters_by_range(spark):
    df = spark.createDataFrame(_clip_rows(), _SCHEMA)
    kept = LoudnessGate(min_lufs=-30.0)(df)
    assert sorted(r.clip_id for r in kept.collect()) == ["c0", "c1", "c2"]
    # pure-gate mode restores the input schema
    pure = LoudnessGate(max_lufs=-30.0, drop_measures=True)(df)
    assert pure.columns == df.columns
    assert sorted(r.label for r in pure.collect()) == ["quiet"] * 3
    with pytest.raises(ValueError):
        LoudnessGate()


def test_gate_custom_column_names(spark):
    df = spark.createDataFrame(_clip_rows(), _SCHEMA).select(
        "clip_id",
        F.col("bytes").alias("payload"),
        F.col("sr_hz").alias("rate"),
        F.col("codec").alias("enc"),
    )
    out = LoudnessGate(min_lufs=-30.0, bytes_col="payload", sr_col="rate", codec_col="enc")(df)
    assert sorted(r.clip_id for r in out.collect()) == ["c0", "c1", "c2"]
    assert "payload" in out.columns and "bytes" not in out.columns


def test_gate_streaming_exactly_once(spark, tmp_path):
    from benthos_spark.config import run_config
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink
    from benthos_spark.streaming.pipeline import run_to_completion

    src = str(tmp_path / "src")
    spark.createDataFrame(_clip_rows(), _SCHEMA).repartition(2).write.parquet(src)
    out_dir = str(tmp_path / "out")
    cfg = f"""
input:
  parquet: {{path: {src}, streaming: true}}
pipeline:
  processors:
    - loudness_gate: {{min_lufs: -30.0, drop_measures: true}}
output:
  exactly_once: {{dir: {out_dir}}}
"""
    q = run_config(spark, cfg, checkpoint=str(tmp_path / "ckpt"))
    run_to_completion(q, timeout_s=300)
    got = ExactlyOnceParquetSink(out_dir).read_committed(spark)
    assert sorted(r.clip_id for r in got.collect()) == ["c0", "c1", "c2"]


def test_normalize_hits_target(spark):
    from benthos_spark.operators.audio import LoudnessNormalize

    df = spark.createDataFrame(_clip_rows(), _SCHEMA)
    out = LoudnessNormalize(target_lufs=-23.0)(df)
    rows = {r.clip_id: r for r in out.collect()}
    assert set(out.columns) == set(df.columns) | {"gain_db"}
    # re-measure: every clip lands on the target (within codec
    # quantization + the gating nonlinearity)
    measured = {
        r.clip_id: r.lufs_i
        for r in LoudnessMeasure()(out.drop("gain_db")).collect()
    }
    for cid, lufs in measured.items():
        assert lufs == pytest.approx(-23.0, abs=0.3), (cid, lufs)
    # quiet clips got boosted, loud ones attenuated
    assert rows["c3"].gain_db > 0 > rows["c0"].gain_db


def test_normalize_gain_cap_and_silence(spark):
    from benthos_spark.operators.audio import LoudnessNormalize

    sr = 16000
    t = np.arange(sr)
    quiet = 0.005 * np.sin(2 * np.pi * 440.0 * t / sr)  # ≈ -53 LUFS
    silent = np.zeros(sr)  # below the -70 LKFS absolute gate
    df = spark.createDataFrame(
        [
            ("quiet", A.encode(quiet, "wav", sr), sr, 1000, "wav", "q"),
            ("silent", A.encode(silent, "wav", sr), sr, 1000, "wav", "s"),
        ],
        _SCHEMA,
    )
    rows = {
        r.clip_id: r
        for r in LoudnessNormalize(target_lufs=-16.0, max_gain_db=20.0)(df).collect()
    }
    # the quiet clip wants ~+37 dB — capped at 20
    assert rows["quiet"].gain_db == pytest.approx(20.0)
    # gated-silent clips (no measurable loudness) are left untouched
    assert rows["silent"].gain_db == 0.0
    orig = {r[0]: r[1] for r in (("silent", A.encode(silent, "wav", sr)),)}
    assert bytes(rows["silent"].bytes) == orig["silent"]
