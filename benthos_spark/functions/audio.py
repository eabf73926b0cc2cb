"""Audio codec kernels + vectorized Spark UDFs.

The reference pipes opaque bytes through per-message processors
(``compress``/``decompress``, /root/reference/internal/impl/pure/
processor_compress.go:21; codec scanners internal/codec/reader.go:193-311).
Here the payload is audio: we define four deterministic codecs over mono
PCM float signals in ``[-1, 1]``:

- ``pcm_s16le`` — raw 16-bit little-endian PCM.
- ``wav``       — 44-byte RIFF/WAVE header + 16-bit PCM data chunk.
- ``ulaw``      — continuous μ-law companding (μ=255) quantized to 8 bits.
- ``alaw``      — continuous A-law companding (A=87.6) quantized to 8 bits.

Everything is numpy-vectorized; the Spark surface is Arrow-batched pandas
UDFs / ``mapInPandas`` — no per-row Python in the hot path (BASELINE.json
``input_hint``). 8-bit companding keeps SNR ≈ 37-38 dB ≥ the 30 dB gate.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

MU = 255.0
ALAW_A = 87.6

CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")

# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def encode_pcm16(x: np.ndarray) -> bytes:
    q = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    return q.tobytes()


def decode_pcm16(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i2").astype(np.float32) / 32767.0


def encode_wav(x: np.ndarray, sr_hz: int) -> bytes:
    data = encode_pcm16(x)
    n = len(data)
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + n, b"WAVE",
        b"fmt ", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16,
        b"data", n,
    )
    return header + data


def decode_wav(b: bytes) -> np.ndarray:
    # Walk RIFF chunks to find `data` (robust to extra chunks).
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE", "not a WAV payload"
    pos = 12
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"data":
            return decode_pcm16(b[pos + 8 : pos + 8 + size])
        pos += 8 + size + (size & 1)
    raise ValueError("WAV data chunk not found")


def wav_sample_rate(b: bytes) -> int:
    assert b[:4] == b"RIFF"
    pos = 12
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            return struct.unpack("<I", b[pos + 12 : pos + 16])[0]
        pos += 8 + size + (size & 1)
    raise ValueError("WAV fmt chunk not found")


def encode_ulaw(x: np.ndarray) -> bytes:
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
    q = np.clip(np.rint(y * 127.0), -127, 127).astype(np.int16)
    return (q + 128).astype(np.uint8).tobytes()


def decode_ulaw(b: bytes) -> np.ndarray:
    q = np.frombuffer(b, dtype=np.uint8).astype(np.float32) - 128.0
    y = q / 127.0
    return (np.sign(y) * (np.power(1.0 + MU, np.abs(y)) - 1.0) / MU).astype(np.float32)


def encode_alaw(x: np.ndarray) -> bytes:
    x = np.clip(x, -1.0, 1.0)
    ax = np.abs(x)
    denom = 1.0 + np.log(ALAW_A)
    y = np.where(ax < 1.0 / ALAW_A, ALAW_A * ax / denom, (1.0 + np.log(ALAW_A * np.maximum(ax, 1e-12))) / denom)
    y = np.sign(x) * y
    q = np.clip(np.rint(y * 127.0), -127, 127).astype(np.int16)
    return (q + 128).astype(np.uint8).tobytes()


def decode_alaw(b: bytes) -> np.ndarray:
    q = np.frombuffer(b, dtype=np.uint8).astype(np.float32) - 128.0
    y = q / 127.0
    ay = np.abs(y)
    denom = 1.0 + np.log(ALAW_A)
    knee = 1.0 / denom  # companded value at |x| = 1/A
    ax = np.where(ay < knee, ay * denom / ALAW_A, np.exp(ay * denom - 1.0) / ALAW_A)
    return (np.sign(y) * ax).astype(np.float32)


_ENCODERS = {
    "pcm_s16le": lambda x, sr: encode_pcm16(x),
    "wav": encode_wav,
    "ulaw": lambda x, sr: encode_ulaw(x),
    "alaw": lambda x, sr: encode_alaw(x),
}
_DECODERS = {
    "pcm_s16le": decode_pcm16,
    "wav": decode_wav,
    "ulaw": decode_ulaw,
    "alaw": decode_alaw,
}


def encode(x: np.ndarray, codec: str, sr_hz: int) -> bytes:
    return _ENCODERS[codec](x, sr_hz)


def decode(b: bytes, codec: str) -> np.ndarray:
    return _DECODERS[codec](b)


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample (the vectorized 'resample' mapping)."""
    if sr_in == sr_out or len(x) == 0:
        return x.astype(np.float32)
    n_out = max(1, int(round(len(x) * sr_out / sr_in)))
    t_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(t_out, np.arange(len(x), dtype=np.float64), x).astype(np.float32)


def frame_energies(x: np.ndarray, frame: int = 512, hop: int = 256) -> np.ndarray:
    """Per-frame RMS energies (the VAD primitive) — strided, no copy."""
    if len(x) < frame:
        return np.array([float(np.sqrt(np.mean(np.square(x, dtype=np.float64))))] if len(x) else [], dtype=np.float64)
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx].astype(np.float64)
    return np.sqrt(np.mean(frames * frames, axis=1))


def trim_silence(x: np.ndarray, threshold_db: float = -40.0, frame: int = 512, hop: int = 256) -> np.ndarray:
    """Energy-gated silence trim at head/tail (the `trim` mapping of an
    audio ETL): frames quieter than threshold relative to peak RMS are
    cut from both ends."""
    e = frame_energies(x, frame, hop)
    if len(e) == 0:
        return x
    peak = float(e.max())
    if peak <= 0:
        return x[:0]
    keep = e >= peak * (10.0 ** (threshold_db / 20.0))
    nz = np.flatnonzero(keep)
    if len(nz) == 0:
        return x[:0]
    start = int(nz[0]) * hop
    end = min(int(nz[-1]) * hop + frame, len(x))
    return x[start:end]


def spectral_features(x: np.ndarray, sr_hz: int) -> tuple[float, float]:
    """(spectral centroid Hz, rolloff-85 Hz) from one rFFT of the whole
    clip — numpy-vectorized, deterministic."""
    if len(x) < 8:
        return 0.0, 0.0
    mag = np.abs(np.fft.rfft(x.astype(np.float64)))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr_hz)
    total = float(mag.sum())
    if total <= 0:
        return 0.0, 0.0
    centroid = float((freqs * mag).sum() / total)
    csum = np.cumsum(mag)
    rolloff = float(freqs[int(np.searchsorted(csum, 0.85 * total))])
    return centroid, rolloff


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against reference signal, in dB."""
    n = min(len(ref), len(test))
    ref, test = ref[:n].astype(np.float64), test[:n].astype(np.float64)
    noise = np.sum((ref - test) ** 2)
    if noise == 0.0:
        return float("inf")
    sig = np.sum(ref**2)
    return float(10.0 * np.log10(sig / noise)) if sig > 0 else float("-inf")


# ---------------------------------------------------------------------------
# Spark surface — Arrow-batched, never per-row Python objects in a loop
# over Spark rows; the loop below is over numpy buffers inside one Arrow
# batch (the reference's batch→batch processor shape,
# internal/component/processor/auto_observed.go:34-54).
# ---------------------------------------------------------------------------

AUDIO_FEATURE_FIELDS = (
    "n_samples bigint, rms double, peak double, decoded_ms double, "
    "checksum16 bigint, clip_ok boolean"
)


def checksum16(x: np.ndarray) -> int:
    """Integer checksum of a decoded float signal: sum of the 16-bit
    re-quantization. For PCM/WAV payloads this equals the sum of the
    encoder's own int16 samples (an encoder-side ground truth the gate
    parquet carries), so a decode offset/endianness/scaling bug breaks
    the oracle match."""
    if len(x) == 0:
        return 0
    return int(np.rint(x.astype(np.float64) * 32767.0).sum())


def audio_features_map_in_pandas(schema_passthrough_cols: list[str]):
    """Build a ``mapInPandas`` function: decode `bytes` per `codec`, emit
    per-clip features next to the passthrough columns.

    Usage::

        fn, out_schema = audio_features_map_in_pandas([...])
        df.mapInPandas(fn, schema=out_schema)
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_samples = np.zeros(n, dtype=np.int64)
            rms = np.zeros(n, dtype=np.float64)
            peak = np.zeros(n, dtype=np.float64)
            csum = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            codecs = pdf["codec"].to_numpy()
            srs = pdf["sr_hz"].to_numpy()
            durs = pdf["dur_ms"].to_numpy()
            payloads = pdf["bytes"].to_numpy()
            for i in range(n):
                try:
                    x = decode(payloads[i], codecs[i])
                except Exception:
                    ok[i] = False
                    continue
                n_samples[i] = len(x)
                if len(x):
                    rms[i] = float(np.sqrt(np.mean(np.square(x, dtype=np.float64))))
                    peak[i] = float(np.max(np.abs(x)))
                    csum[i] = checksum16(x)
                expect = int(round(srs[i] * durs[i] / 1000.0))
                ok[i] = abs(len(x) - expect) <= 1
            out = pdf[schema_passthrough_cols].copy()
            out["n_samples"] = n_samples
            out["rms"] = rms
            out["peak"] = peak
            out["decoded_ms"] = np.divide(
                n_samples * 1000.0, srs, out=np.zeros(n, dtype=np.float64), where=srs > 0
            )
            out["checksum16"] = csum
            out["clip_ok"] = ok
            yield out

    return fn


AUDIO_ANALYSIS_FIELDS = (
    "trimmed_ms double, voiced_ratio double, spectral_centroid double, rolloff85 double"
)


def audio_analysis_map_in_pandas(passthrough_cols: list[str]):
    """``mapInPandas`` stage: decode → silence-trim → spectral features
    (centroid + 85% rolloff via one rFFT) — the analysis pass of an audio
    training-data pipeline; everything numpy inside one Arrow batch."""

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            trimmed_ms = np.zeros(n)
            voiced = np.zeros(n)
            centroid = np.zeros(n)
            rolloff = np.zeros(n)
            for i in range(n):
                try:
                    x = decode(pdf["bytes"].iat[i], pdf["codec"].iat[i])
                except Exception:
                    continue
                sr = int(pdf["sr_hz"].iat[i])
                t = trim_silence(x)
                trimmed_ms[i] = len(t) * 1000.0 / sr if sr else 0.0
                voiced[i] = len(t) / len(x) if len(x) else 0.0
                centroid[i], rolloff[i] = spectral_features(t if len(t) else x, sr)
            out = pdf[passthrough_cols].copy()
            out["trimmed_ms"] = trimmed_ms
            out["voiced_ratio"] = voiced
            out["spectral_centroid"] = centroid
            out["rolloff85"] = rolloff
            yield out

    return fn


def transcode_map_in_pandas(target_codec: str, target_sr: int):
    """``mapInPandas`` stage: decode → resample to `target_sr` → re-encode
    as `target_codec`. The full decode/resample/encode path stays in numpy.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for b, codec, sr in zip(
                pdf["bytes"].to_numpy(), pdf["codec"].to_numpy(), pdf["sr_hz"].to_numpy()
            ):
                x = resample_linear(decode(b, codec), int(sr), target_sr)
                out_bytes.append(encode(x, target_codec, target_sr))
            out = pdf.copy()
            out["bytes"] = out_bytes
            out["codec"] = target_codec
            out["sr_hz"] = np.int32(target_sr)
            yield out

    return fn
