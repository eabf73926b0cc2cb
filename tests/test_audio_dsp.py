"""Audio DSP kernels (functions/audio_dsp.py), the IMA-ADPCM codec, and
the polyphase sinc resampler (functions/audio.py).

The catalog's correctness gate (tools/check_oracles.py) hash-checks the
rollup/dedup entries against generation-time ground truth; these tests
pin the kernel-level invariants: codec fidelity, determinism, the
closed-form frame/length arithmetic the SQL oracles rely on, and the
fingerprint's re-encode-collision / cross-clip-discrimination contract.
"""

import numpy as np
import pytest

from benthos_spark.datagen import clips
from benthos_spark.functions import audio, audio_dsp


# ---------------------------------------------------------------- STFT/MFCC


@pytest.mark.parametrize("n", [0, 1, 100, 511, 512, 513, 1024, 5000])
def test_n_frames_closed_form_matches_stft(n):
    x = np.linspace(-0.5, 0.5, n)
    mag = audio_dsp.stft_mag(x)
    assert mag.shape == (audio_dsp.n_frames_for(n), audio_dsp.FRAME // 2 + 1)


def test_mel_filterbank_shape_and_coverage():
    fb = audio_dsp.mel_filterbank(16000)
    assert fb.shape == (audio_dsp.N_MELS, audio_dsp.FRAME // 2 + 1)
    assert (fb >= 0).all()
    # every filter has support; interior bins are covered by some filter
    assert (fb.sum(axis=1) > 0).all()
    assert (fb[:, 30:200].sum(axis=0) > 0).all()


def test_mfcc_shape_and_determinism():
    x = clips.reference_signal(17, 16000, 800)
    m1 = audio_dsp.mfcc(x, 16000)
    m2 = audio_dsp.mfcc(x, 16000)
    assert m1.shape == (audio_dsp.n_frames_for(len(x)), audio_dsp.N_MFCC)
    assert np.array_equal(m1, m2)
    # precomputed-mag path is bit-identical to the internal-STFT path
    mag = audio_dsp.stft_mag(x)
    assert np.array_equal(audio_dsp.mfcc(x, 16000, mag=mag), m1)


def test_mfcc_mean_tracks_loudness():
    x = clips.reference_signal(21, 16000, 600)
    quiet = audio_dsp.mfcc_mean(0.01 * x, 16000)
    loud = audio_dsp.mfcc_mean(x, 16000)
    # c0 is overall log-energy: scaling the signal up raises it
    assert loud[0] > quiet[0]


# ---------------------------------------------------------------- fingerprint


def test_fingerprint_deterministic_and_sorted():
    x = clips.reference_signal(3, 22050, 900)
    h1 = audio_dsp.fingerprint(x)
    h2 = audio_dsp.fingerprint(x)
    assert np.array_equal(h1, h2)
    assert h1.dtype == np.uint64
    assert np.array_equal(h1, np.unique(h1))  # sorted unique
    assert len(h1) > 0


@pytest.mark.parametrize("codec", ["ulaw", "alaw", "adpcm_ima"])
def test_fingerprint_survives_lossy_reencode(codec):
    """The dedup contract: a lossy re-encode of a clip shares ≥ half its
    hashes with the original (the catalog entry's keep predicate)."""
    x = clips.reference_signal(8, 16000, 1500)
    y = audio.decode(audio.encode(x.astype(np.float32), codec, 16000), codec)
    ha = audio_dsp.fingerprint(x)
    hb = audio_dsp.fingerprint(y)
    m = audio_dsp.match_count(ha, hb)
    assert m >= 8
    assert 2 * m >= min(len(ha), len(hb))


def test_fingerprint_discriminates_distinct_clips():
    """Different clips (different partials/vibrato) share almost nothing."""
    pairs = [(2, 9), (11, 30), (41, 77)]
    for i, j in pairs:
        ha = audio_dsp.fingerprint(clips.reference_signal(i, 16000, 1200))
        hb = audio_dsp.fingerprint(clips.reference_signal(j, 16000, 1200))
        m = audio_dsp.match_count(ha, hb)
        assert 2 * m < min(len(ha), len(hb)), (i, j, m, len(ha), len(hb))


def test_fingerprint_stats_consistency():
    x = clips.reference_signal(5, 8000, 700)
    h = audio_dsp.fingerprint(x)
    n, xor = audio_dsp.fingerprint_stats(x)
    assert n == len(h)
    assert xor == int(np.bitwise_xor.reduce(h) & np.uint64(0xFFFFFFFF))
    assert audio_dsp.fingerprint_stats(np.zeros(10)) == (0, 0)


# ---------------------------------------------------------------- IMA ADPCM


@pytest.mark.parametrize("i,sr,dur", [(0, 8000, 500), (7, 16000, 1000), (13, 44100, 300)])
def test_adpcm_roundtrip_snr(i, sr, dur):
    x = clips.reference_signal(i, sr, dur)
    y = audio.decode_adpcm_ima(audio.encode_adpcm_ima(x))
    assert len(y) == len(x)
    # 4-bit ADPCM is deliberately lossy; ~16 dB on the synthetic trio
    assert audio.snr_db(x, y) >= 12.0


def test_adpcm_many_equals_singles():
    sigs = [clips.reference_signal(i, 16000, 300 + 100 * i) for i in range(4)]
    enc_many = audio.adpcm_encode_many(sigs)
    for s, e in zip(sigs, enc_many):
        assert e == audio.encode_adpcm_ima(s)
        assert np.array_equal(audio.decode_adpcm_ima(e), audio.adpcm_decode_many([e])[0])


def test_adpcm_wire_format():
    x = clips.reference_signal(2, 8000, 400)
    b = audio.encode_adpcm_ima(x)
    n = int(np.frombuffer(b[:4], dtype="<u4")[0])
    assert n == len(x)
    n_blocks = (n + audio.ADPCM_BLOCK - 1) // audio.ADPCM_BLOCK
    assert len(b) == 4 + n_blocks * audio._ADPCM_BPB
    # block 0's first sample is stored verbatim as little-endian int16
    first = int(np.frombuffer(b[4:6], dtype="<i2")[0])
    assert first == int(np.clip(np.rint(x[0] * 32767.0), -32768, 32767))
    # decoded first sample reproduces it exactly
    y = audio.decode_adpcm_ima(b)
    assert int(np.rint(y[0] * 32767.0)) == first


def test_adpcm_edge_lengths():
    for n in (0, 1, 1023, 1024, 1025):
        x = np.linspace(-0.4, 0.4, n).astype(np.float32)
        y = audio.decode_adpcm_ima(audio.encode_adpcm_ima(x))
        assert len(y) == n
    assert audio.adpcm_encode_many([]) == []
    assert audio.adpcm_decode_many([]) == []


def test_adpcm_registered_codec():
    x = clips.reference_signal(4, 16000, 250).astype(np.float32)
    b = audio.encode(x, "adpcm_ima", 16000)
    y = audio.decode(b, "adpcm_ima")
    assert audio.snr_db(x, y) >= 12.0


# ------------------------------------------------------------ polyphase sinc


@pytest.mark.parametrize("sr_in,sr_out", [(22050, 16000), (44100, 16000), (8000, 16000)])
def test_sinc_length_formula(sr_in, sr_out):
    x = clips.reference_signal(6, sr_in, 730)
    y = audio.resample_sinc(x, sr_in, sr_out)
    assert len(y) == len(x) * sr_out // sr_in


def test_sinc_preserves_dc_exactly():
    dc = np.full(44100, 0.35)
    y = audio.resample_sinc(dc, 44100, 16000)
    assert float(np.abs(y[64:-64] - 0.35).max()) < 1e-7


def test_sinc_beats_linear_on_tone():
    sr_in, sr_out, f = 44100, 16000, 3000.0
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * f * t)
    ref = np.sin(2 * np.pi * f * np.arange(sr_in * sr_out // sr_in) / sr_out)
    ys = audio.resample_sinc(tone, sr_in, sr_out)
    yl = audio.resample_linear(tone, sr_in, sr_out)
    m = min(len(ref), len(yl), len(ys))
    s_sinc = audio.snr_db(ref[64 : m - 64], ys[64 : m - 64])
    s_lin = audio.snr_db(ref[64 : m - 64], yl[64 : m - 64])
    assert s_sinc > 60.0
    assert s_sinc > s_lin + 20.0


def test_sinc_identity_and_empty():
    x = np.linspace(-1, 1, 777).astype(np.float32)
    assert np.array_equal(audio.resample_sinc(x, 16000, 16000), x)
    assert len(audio.resample_sinc(np.zeros(0), 8000, 16000)) == 0


# ------------------------------------------------------------ gate versioning


def test_gate_version_regenerates_stale_tables(tmp_path, monkeypatch):
    from benthos_spark.datagen import gate

    monkeypatch.setattr(gate, "GATE_ROOT", tmp_path)
    monkeypatch.setitem(gate.SIZES, "sf0.001", {"clips": 4, "images": 4, "videos": 2})
    gate.ensure_gate_tables("sf0.001")
    vf = tmp_path / "sf0.001" / "VERSION"
    assert int(vf.read_text()) == gate.GATE_VERSION
    p = tmp_path / "sf0.001" / "clips.parquet"
    mtime = p.stat().st_mtime_ns
    # matching version: untouched
    gate.ensure_gate_tables("sf0.001")
    assert p.stat().st_mtime_ns == mtime
    # stale version marker: everything regenerates
    vf.write_text("1")
    gate.ensure_gate_tables("sf0.001")
    assert p.stat().st_mtime_ns > mtime
    assert int(vf.read_text()) == gate.GATE_VERSION


def test_gate_clips_ground_truth_matches_engine(tmp_path, monkeypatch):
    """The consistency contract the oracle relies on: engine recompute
    from bytes == generation-time ground truth, bit-for-bit."""
    pdf = clips.clips_pdf(np.arange(6, dtype=np.int64), with_expected=True)
    for i in range(len(pdf)):
        x = audio.decode(pdf["bytes"].iat[i], pdf["codec"].iat[i])
        mag = audio_dsp.stft_mag(x)
        mm = audio_dsp.mfcc_mean(x, int(pdf["sr_hz"].iat[i]), mag=mag)
        assert float(mm[0]) == pdf["mfcc0_mean"].iat[i]
        assert float(mm[1]) == pdf["mfcc1_mean"].iat[i]
        h = audio_dsp.fingerprint(x, mag=mag)
        assert len(h) == pdf["n_fp"].iat[i]
        assert np.array_equal(h.astype(np.int64), np.array(pdf["fp_hashes"].iat[i]))
        if i % clips.DUP_EVERY == 0:
            y = audio.decode_adpcm_ima(audio.encode_adpcm_ima(x))
            ha = audio_dsp.fingerprint(y)
            assert np.array_equal(
                ha.astype(np.int64), np.array(pdf["fp_hashes_adpcm"].iat[i])
            )
        else:
            assert pdf["fp_hashes_adpcm"].iat[i] == []


# ------------------------------------------------------------- Spark surface


def test_mfcc_fp_stage_spark(spark):
    df = clips.generate_clips(spark, 20, partitions=2)
    out = df.mapInPandas(
        audio.mfcc_fp_map_in_pandas(["clip_id", "codec"], with_hashes=True),
        schema="clip_id string, codec string, " + audio.AUDIO_MFCC_FP_FIELDS
        + ", fp_hashes array<bigint>",
    ).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_fp"] == len(r["fp_hashes"])
        if r["n_fp"]:
            xor = 0
            for v in r["fp_hashes"]:
                xor ^= v & 0xFFFFFFFFFFFFFFFF
            assert r["fp_xor32"] == (xor & 0xFFFFFFFF)


def test_adpcm_dup_lane_stage_spark(spark):
    df = clips.generate_clips(spark, 20, partitions=2)
    out = df.mapInPandas(
        audio.adpcm_dup_lane_map_in_pandas(5),
        schema="fp_id string, n_fp bigint, fp_hashes array<bigint>",
    ).collect()
    ids = sorted(r["fp_id"] for r in out)
    assert ids == [f"clip-{i:012d}~adpcm" for i in range(0, 20, 5)]
    assert all(r["n_fp"] == len(r["fp_hashes"]) for r in out)


def test_mfcc_embed_stage_spark(spark):
    from benthos_spark.functions import audio_dsp

    df = clips.generate_clips(spark, 10, partitions=2)
    out = df.mapInPandas(
        audio.mfcc_embed_map_in_pandas(["clip_id", "bytes", "sr_hz", "codec"]),
        schema="clip_id string, bytes binary, sr_hz int, codec string, emb array<double>",
    ).collect()
    assert len(out) == 10
    for r in out:
        assert r["emb"] is not None and len(r["emb"]) == audio_dsp.N_MFCC
        # Spark-side embedding matches the local kernel to ~1 ulp (the
        # mel matmul is BLAS, whose blocking may differ across worker
        # processes; the catalog entry's round-4 output absorbs this)
        x = audio.decode(bytes(r["bytes"]), r["codec"])
        local = audio_dsp.mfcc_mean(np.asarray(x, dtype=np.float64), r["sr_hz"])
        np.testing.assert_allclose(np.asarray(r["emb"]), local, rtol=0, atol=1e-12)


def test_mfcc_embed_stage_foreign_codec(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "clip_id": ["bad"],
            "bytes": [b"\x00\x01"],
            "sr_hz": np.array([16000], dtype=np.int32),
            "codec": ["opus"],
        }
    )
    out = (
        spark.createDataFrame(pdf)
        .mapInPandas(
            audio.mfcc_embed_map_in_pandas(["clip_id"]),
            schema="clip_id string, emb array<double>",
        )
        .collect()
    )
    assert out[0]["emb"] is None
