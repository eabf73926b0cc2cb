"""Codec kernels: the per-row invariant is decoded-PCM SNR ≥ 30 dB against
the reference float signal + exact transcript determinism (BASELINE.json
``input_hint``)."""

import numpy as np
import pytest

from benthos_spark.datagen import clips
from benthos_spark.functions import audio


@pytest.mark.parametrize("codec", audio.CODECS)
@pytest.mark.parametrize("i,sr,dur", [(0, 8000, 500), (7, 16000, 1000), (13, 44100, 300)])
def test_roundtrip_snr(codec, i, sr, dur):
    x = clips.reference_signal(i, sr, dur)
    decoded = audio.decode(audio.encode(x, codec, sr), codec)
    assert len(decoded) == len(x)
    assert audio.snr_db(x, decoded) >= 30.0


def test_wav_header_roundtrip():
    x = clips.reference_signal(3, 22050, 400)
    b = audio.encode(x, "wav", 22050)
    assert audio.wav_sample_rate(b) == 22050
    assert np.allclose(audio.decode(b, "wav"), audio.decode(b[44:], "pcm_s16le"))


def test_resample_preserves_content():
    x = clips.reference_signal(5, 16000, 1000)
    down = audio.resample_linear(x, 16000, 8000)
    up = audio.resample_linear(down, 8000, 16000)
    assert len(down) == 8000 and len(up) == 16000
    # linear interp attenuates content near Nyquist (sines go up to 3kHz
    # of a 4kHz limit) — expect rough preservation, not transparency
    assert audio.snr_db(x, up) > 8.0


def test_clip_rows_deterministic():
    a = clips.clips_pdf(np.array([11], dtype=np.uint64))
    b = clips.clips_pdf(np.array([11], dtype=np.uint64))
    assert a.bytes[0] == b.bytes[0]
    assert a.transcript[0] == b.transcript[0]
    assert a.event_ts[0] == b.event_ts[0]


def test_duration_and_codec_skew():
    p = clips.clip_params(np.arange(20000, dtype=np.uint64))
    durs = p["dur_ms"]
    assert durs.min() >= 200 and durs.max() <= 30000
    assert np.mean(durs < 2000) > 0.8  # long tail, hot short clips
    codec_hot = np.mean(p["codec_ix"] == 0)
    assert 0.5 < codec_hot < 0.6  # zipf-skewed hot key
    assert 0.03 < p["is_late"].mean() < 0.07


def test_frame_energies_and_trim():
    sr = 16000
    # 0.2s silence + 0.5s tone + 0.2s silence
    tone = clips.reference_signal(3, sr, 500)
    sil = np.zeros(int(0.2 * sr))
    x = np.concatenate([sil, tone, sil]).astype(np.float64)
    e = audio.frame_energies(x)
    assert len(e) > 10 and e.max() > 0.1
    t = audio.trim_silence(x)
    # trimmed to roughly the tone (within one frame of slack each side)
    assert abs(len(t) - len(tone)) < 1600
    assert audio.trim_silence(np.zeros(4000)).size == 0


def test_spectral_features_locate_tone():
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    x = np.sin(2 * np.pi * 1000.0 * t)
    centroid, rolloff = audio.spectral_features(x, sr)
    assert 900 < centroid < 1100  # pure 1kHz tone
    assert 900 < rolloff < 1200


def test_audio_analysis_stage(spark):
    df = clips.generate_clips(spark, 30, partitions=2)
    out = df.mapInPandas(
        audio.audio_analysis_map_in_pandas(["clip_id", "codec", "sr_hz", "dur_ms"]),
        schema="clip_id string, codec string, sr_hz int, dur_ms int, " + audio.AUDIO_ANALYSIS_FIELDS,
    ).collect()
    assert len(out) == 30
    for r in out:
        # synthetic clips are tonal throughout: nearly nothing trims
        assert r["voiced_ratio"] > 0.8
        assert 50 < r["spectral_centroid"] < 6000
        assert r["trimmed_ms"] <= r["dur_ms"] + 40
