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


# -- FLAC (functions/flac.py) ----------------------------------------------


def _flac_signals():
    import numpy as np

    rng = np.random.default_rng(11)
    yield "silence", np.zeros(5000, dtype=np.int16)
    yield "const", np.full(4096, -1234, dtype=np.int16)
    yield "sine", (10000 * np.sin(np.arange(9000) * 0.03)).astype(np.int16)
    yield "noise", rng.integers(-32768, 32768, 7777).astype(np.int16)
    yield "ramp", np.arange(-3000, 3000, dtype=np.int16)
    yield "tiny", np.array([1, -1, 5], dtype=np.int16)
    yield "mix", (8000 * np.sin(np.arange(12000) * 0.01) + rng.normal(0, 200, 12000)).astype(np.int16)


def test_flac_roundtrip_bit_exact():
    import numpy as np

    from benthos_spark.functions import flac

    for name, x in _flac_signals():
        b = flac.encode(x, 16000)
        y, sr = flac.decode(b)
        assert sr == 16000
        assert np.array_equal(x.astype(np.int32), y), name
        # compressible signals actually compress
        if name in ("silence", "const", "ramp", "sine"):
            assert len(b) < 2 * len(x) / 2, name


def test_flac_integrity_channels():
    """CRC-8 (header), CRC-16 (frame), and STREAMINFO MD5 are three
    independent tamper channels — corrupting any region is caught."""
    import numpy as np
    import pytest as _pytest

    from benthos_spark.functions import flac

    x = (9000 * np.sin(np.arange(6000) * 0.02)).astype(np.int16)
    good = bytearray(flac.encode(x, 8000))
    frame_start = good.index(b"\xff\xf8", 4)

    # flip a bit in the frame HEADER -> CRC-8 (or sync) failure
    bad = bytearray(good)
    bad[frame_start + 3] ^= 0x04
    with _pytest.raises(flac.FlacError):
        flac.decode(bytes(bad))

    # flip a bit deep in the frame BODY -> CRC-16 failure
    bad = bytearray(good)
    bad[frame_start + 60] ^= 0x01
    with _pytest.raises(flac.FlacError):
        flac.decode(bytes(bad))

    # alter the STREAMINFO MD5 -> decoded-sample digest mismatch
    bad = bytearray(good)
    bad[8 + 18] ^= 0xFF  # first md5 byte inside STREAMINFO
    with _pytest.raises(flac.FlacError, match="MD5"):
        flac.decode(bytes(bad))


def test_flac_decodes_lpc_subframe():
    """Hand-assembled LPC subframe (order 2, shift 5): the decoder's
    prediction loop must reproduce the signal the residuals encode."""
    import struct

    import numpy as np

    from benthos_spark.functions import flac
    from benthos_spark.functions.flac import _BitWriter, crc8, crc16

    # target signal and LPC model
    n = 64
    coefs = [51, -25]  # Q5: pred = (51*x[i-1] - 25*x[i-2]) >> 5
    shift = 5
    sig = [100, 103]
    rng = np.random.default_rng(3)
    residuals = rng.integers(-8, 8, n - 2).tolist()
    for e in residuals:
        pred = (coefs[0] * sig[-1] + coefs[1] * sig[-2]) >> shift
        sig.append(pred + e)

    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)   # block size: 16-bit value follows
    bw.write(0, 4)   # sr from streaminfo
    bw.write(0, 4)   # mono
    bw.write(4, 3)   # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)   # frame 0 (utf8)
    bw.write(n - 1, 16)
    bw.align()
    hdr = bytes(bw.out)
    bw.write(crc8(hdr), 8)
    # subframe: LPC order 2 -> type 0b100001
    bw.write(0, 1)
    bw.write(32 + (2 - 1), 6)
    bw.write(0, 1)  # no wasted bits
    for w in sig[:2]:
        bw.write(w & 0xFFFF, 16)
    bw.write(15 - 1, 4)      # precision 15 (code 14)
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c & 0x7FFF, 15)
    bw.write(0, 2)  # rice method 0
    bw.write(0, 4)  # partition order 0
    bw.write(4, 4)  # rice param 4
    for e in residuals:
        u = (abs(int(e)) << 1) - (1 if e < 0 else 0)
        bw.write_unary(u >> 4)
        bw.write(u & 15, 4)
    bw.align()
    body = bytes(bw.out)
    frame = body + struct.pack(">H", crc16(body))

    streaminfo = bytearray(34)
    struct.pack_into(">HH", streaminfo, 0, n, n)
    si = (8000 << 44) | (0 << 41) | (15 << 36) | n
    streaminfo[10:18] = si.to_bytes(8, "big")
    # md5 zeros = unverified (spec allows unknown)
    data = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(streaminfo) + frame
    y, sr = flac.decode(data)
    assert sr == 8000
    assert y.tolist() == sig


def test_flac_decodes_mid_side_stereo():
    """Hand-assembled mid/side stereo frame: decorrelation must invert
    exactly (mid = (l+r)>>1 with the side's low bit, side = l-r)."""
    import struct

    import numpy as np

    from benthos_spark.functions import flac
    from benthos_spark.functions.flac import _BitWriter, crc8, crc16

    n = 16
    left = [10, -5, 300, 0, 7, 7, -100, 50, 1, 2, 3, 4, -4, -3, -2, -1]
    right = [3, -5, 299, 1, 7, 0, 100, -50, 0, 2, 2, 4, 4, -3, 2, -1]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]

    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)
    bw.write(0, 4)
    bw.write(10, 4)  # mid/side
    bw.write(4, 3)
    bw.write(0, 1)
    bw.write(0, 8)
    bw.write(n - 1, 16)
    bw.align()
    bw.write(crc8(bytes(bw.out)), 8)
    for vals, bps in ((mid, 16), (side, 17)):  # side gets +1 bit
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in vals:
            bw.write(v & ((1 << bps) - 1), bps)
    bw.align()
    body = bytes(bw.out)
    frame = body + struct.pack(">H", crc16(body))

    streaminfo = bytearray(34)
    struct.pack_into(">HH", streaminfo, 0, n, n)
    si = (8000 << 44) | (1 << 41) | (15 << 36) | n
    streaminfo[10:18] = si.to_bytes(8, "big")
    data = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(streaminfo) + frame
    y, sr = flac.decode(data)
    assert y.shape == (n, 2)
    assert y[:, 0].tolist() == left
    assert y[:, 1].tolist() == right


def test_flac_through_audio_kernel():
    """codec='flac' works through the engine's audio encode/decode
    contract (float [-1,1] mono)."""
    import numpy as np

    from benthos_spark.functions import audio

    x = (0.4 * np.sin(np.arange(8000) * 0.05)).astype(np.float32)
    b = audio.encode(x, "flac", 16000)
    y = audio.decode(b, "flac")
    assert y.shape == x.shape
    assert audio.snr_db(x, y) >= 40  # 16-bit quantization only


def test_flac_long_stream_multibyte_frame_numbers():
    """>128 frames forces multi-byte UTF-8-coded frame numbers (the
    regression that broke clip 61 of the gate table)."""
    import numpy as np

    from benthos_spark.functions import flac
    from benthos_spark.functions.flac import _BitReader, _encode_utf8_number, _read_utf8_number

    for n in (127, 128, 2047, 2048, 65535, 1 << 20, 1 << 31, (1 << 36) - 1):
        assert _read_utf8_number(_BitReader(_encode_utf8_number(n))) == n

    x = (5000 * np.sin(np.arange(4096 * 130 + 17) * 0.013)).astype(np.int16)
    y, sr = flac.decode(flac.encode(x, 44100))
    assert np.array_equal(x.astype(np.int32), y)
