"""Pitch tracking (functions/pitch.py), waveform-quality metrics
(functions/aquality.py) and VAD utterance segmentation
(functions/vad.py vad_segments) — the audio curation stages a
training-data pipeline runs before transcription."""

from __future__ import annotations

import numpy as np
import pytest

from benthos_spark.functions import audio as A
from benthos_spark.functions.aquality import quality_metrics
from benthos_spark.functions.pitch import pitch_stats, pitch_track
from benthos_spark.functions.vad import vad_segments
from benthos_spark.operators.audio import (
    PitchMeasure,
    QualityGate,
    QualityMeasure,
    VadSegment,
)

SR = 16000


def _harmonic(f0, secs=1.0, sr=SR, amps=(1.0, 0.5, 0.3)):
    t = np.arange(int(sr * secs), dtype=np.float64) / sr
    x = sum(a * np.sin(2 * np.pi * (k + 1) * f0 * t) for k, a in enumerate(amps))
    return 0.3 * x / np.abs(x).max()


# ---------------------------------------------------------------- pitch


def test_pitch_recovers_f0_across_range():
    for f0 in (80.0, 120.0, 220.0, 330.0, 440.0):
        med, frac, nf = pitch_stats(_harmonic(f0), SR)
        assert nf > 0 and frac > 0.9
        assert abs(med / f0 - 1.0) < 0.01, (f0, med)


def test_pitch_octave_guard_on_strong_harmonics():
    # 2nd harmonic louder than the fundamental — naive argmax over the
    # ACF band picks lag(sr/f0) anyway, but the 90%-of-peak smallest-lag
    # rule is what guards the octave; verify it holds.
    x = _harmonic(150.0, amps=(0.5, 1.0, 0.3))
    med, frac, _ = pitch_stats(x, SR)
    assert abs(med / 150.0 - 1.0) < 0.02


def test_pitch_unvoiced_inputs():
    # silence → no voiced frames, sentinel 0.0
    assert pitch_stats(np.zeros(SR), SR) == (0.0, 0.0, pitch_stats(np.zeros(SR), SR)[2])
    # white noise → aperiodic: voiced fraction stays low
    rng = np.random.RandomState(7)
    med, frac, nf = pitch_stats(rng.uniform(-0.3, 0.3, SR), SR)
    assert frac < 0.3
    # too short for one frame → empty track
    f0, voiced = pitch_track(np.zeros(10), SR)
    assert len(f0) == 0 and len(voiced) == 0


def test_pitch_out_of_band_rejected():
    # 30 Hz hum sits below fmin=60 — unvoiced or at least not ~30
    med, frac, _ = pitch_stats(_harmonic(30.0, amps=(1.0,)), SR)
    assert frac == 0.0 or med >= 55.0


# -------------------------------------------------------------- quality


def test_quality_metrics_closed_form():
    # constant half-scale: peak == rms, crest 0 dB, dc == 0.5
    x = np.full(SR, 0.5)
    peak, rms_db, crest_db, clipped, dc = quality_metrics(x)
    assert peak == 0.5 and abs(crest_db) < 1e-9 and dc == 0.5 and clipped == 0.0
    assert abs(rms_db - 20 * np.log10(0.5)) < 1e-9

    # full-scale sine: crest ≈ 3.01 dB, half the samples don't clip at 0.98
    t = np.arange(SR) / SR
    s = np.sin(2 * np.pi * 100.0 * t)
    peak, rms_db, crest_db, clipped, dc = quality_metrics(s)
    assert abs(crest_db - 3.0103) < 0.01
    assert 0.0 < clipped < 0.15 and abs(dc) < 1e-3

    # hard-clipped: large clipped fraction
    assert quality_metrics(np.clip(4 * s, -0.999, 0.999))[3] > 0.5

    # silence sentinels
    assert quality_metrics(np.zeros(100)) == (0.0, -120.0, 0.0, 0.0, 0.0)
    assert quality_metrics(np.empty(0)) == (0.0, -120.0, 0.0, 0.0, 0.0)


# ----------------------------------------------------------- segments


def _gapped(spans, secs=3.0, sr=SR):
    """Loud tone with speech only inside the given (start,end) fractions."""
    n = int(sr * secs)
    x = np.zeros(n)
    t = np.arange(n) / sr
    tone = 0.5 * np.sin(2 * np.pi * 300.0 * t)
    for a, b in spans:
        x[int(a * n) : int(b * n)] = tone[int(a * n) : int(b * n)]
    return x


def test_vad_segments_merge_and_min_speech():
    # two speech spans separated by a 1s gap → two segments
    x = _gapped([(0.0, 0.3), (0.65, 1.0)])
    segs = vad_segments(x, SR)
    assert len(segs) == 2
    (s0, e0), (s1, e1) = segs
    assert s0 == 0 and abs(e0 - 900) <= 30
    assert abs(s1 - 1950) <= 30 and abs(e1 - 3000) <= 30

    # a 100ms gap (< min_silence 200ms) merges into one utterance
    x2 = _gapped([(0.0, 0.45), (0.48, 1.0)], secs=3.0)
    assert len(vad_segments(x2, SR)) == 1

    # a 60ms blip (< min_speech 100ms) is dropped
    x3 = _gapped([(0.0, 0.02)], secs=3.0)
    assert vad_segments(x3, SR) == []

    # silence → nothing
    assert vad_segments(np.zeros(SR), SR) == []


def test_vad_segments_cover_speech():
    # segment spans cover ~ the active audio and nothing silent-heavy
    x = _gapped([(0.2, 0.5), (0.7, 0.9)])
    segs = vad_segments(x, SR)
    total = sum(e - s for s, e in segs)
    assert abs(total - 1500) < 120  # 0.3*3s + 0.2*3s = 1.5s of speech


# ------------------------------------------------- Spark processors

_SCHEMA = "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"


def _clip_rows():
    rows = [
        ("voiced_150", A.encode(_harmonic(150.0), "wav", SR), SR, 1000, "wav"),
        ("voiced_300", A.encode(_harmonic(300.0), "pcm_s16le", SR), SR, 1000, "pcm_s16le"),
        ("silence", A.encode(np.zeros(SR), "wav", SR), SR, 1000, "wav"),
    ]
    return rows


def test_pitch_measure_processor(spark):
    df = spark.createDataFrame(_clip_rows(), _SCHEMA)
    out = {r.clip_id: r for r in PitchMeasure()(df).collect()}
    assert abs(out["voiced_150"].f0_med / 150.0 - 1.0) < 0.01
    assert abs(out["voiced_300"].f0_med / 300.0 - 1.0) < 0.01
    assert out["silence"].f0_med == 0.0 and out["silence"].voiced_frac == 0.0
    # payload passes through untouched
    orig = {r[0]: r[1] for r in _clip_rows()}
    for cid, r in out.items():
        assert bytes(r.bytes) == orig[cid]


def test_quality_measure_and_gate(spark):
    sr = SR
    t = np.arange(sr) / sr
    clean = 0.3 * np.sin(2 * np.pi * 200.0 * t)
    clipped = np.clip(4 * clean, -0.999, 0.999)
    dc_bad = np.clip(0.05 * clean + 0.2, -0.999, 0.999)
    rows = [
        ("clean", A.encode(clean, "wav", sr), sr, 1000, "wav"),
        ("clipped", A.encode(clipped, "wav", sr), sr, 1000, "wav"),
        ("dc_bad", A.encode(dc_bad, "wav", sr), sr, 1000, "wav"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    m = {r.clip_id: r for r in QualityMeasure()(df).collect()}
    assert m["clean"].clipped_frac == 0.0 and abs(m["clean"].dc_offset) < 0.01
    assert m["clipped"].clipped_frac > 0.3
    assert m["dc_bad"].dc_offset > 0.15

    kept = QualityGate(max_clipped_frac=0.01, max_abs_dc=0.05, drop_measures=True)(df)
    assert [r.clip_id for r in kept.collect()] == ["clean"]
    assert set(kept.columns) == set(df.columns)
    with pytest.raises(ValueError):
        QualityGate()


def test_vad_segment_processor(spark):
    x = _gapped([(0.0, 0.3), (0.65, 1.0)])
    rows = [("clip_a", A.encode(x, "wav", SR), SR, 3000, "wav"),
            ("quiet", A.encode(np.zeros(SR), "wav", SR), SR, 1000, "wav")]
    df = spark.createDataFrame(rows, _SCHEMA)
    segs = VadSegment()(df).collect()
    ids = sorted(r.segment_id for r in segs)
    assert ids == ["clip_a#s000", "clip_a#s001"]  # quiet clip vanishes
    for r in segs:
        assert r.dur_ms == r.end_ms - r.start_ms
        # re-encoded payload decodes to the sliced span length
        y = A.decode(bytes(r.bytes), r.codec)
        assert abs(len(y) - (r.dur_ms * SR // 1000)) <= 2


def test_pitch_quality_config_wiring(spark):
    from benthos_spark.config import _proc

    df = spark.createDataFrame(_clip_rows(), _SCHEMA)
    p = _proc({"pitch_measure": {}})
    out = {r.clip_id: r.f0_med for r in p(df).collect()}
    assert abs(out["voiced_150"] / 150.0 - 1.0) < 0.01
    g = _proc({"quality_gate": {"min_rms_db": -30.0}})
    kept = sorted(r.clip_id for r in g(df).collect())
    assert kept == ["voiced_150", "voiced_300"]  # silence cut
    s = _proc({"vad_segment": {"min_speech_ms": 50}})
    assert s(df).count() >= 2
