"""Pitch (F0) estimation for audio curation — vectorized ACF tracker.

A training pipeline over speech wants per-clip pitch statistics (F0
median, voiced fraction) for filtering (e.g. drop clips whose F0 sits
outside the human range — synthetic tones, hum, ultrasonic junk) and
for metadata the downstream TTS/ASR stages condition on.

The tracker is the classic normalized-autocorrelation method (the
first stage of RAPT/YIN-family estimators): per 40 ms frame at a 20 ms
hop, DC-removed, the ACF over all lags is computed with one FFT per
frame batch (Wiener–Khinchin), normalized by lag-0 energy, and the
F0 candidate is the SMALLEST lag whose normalized peak reaches 90% of
the global maximum (the standard octave-error guard: a harmonic stack
peaks at every multiple of the true period, near-equally). Sub-sample
lag precision comes from parabolic interpolation around the peak.

Everything is numpy over frame matrices (no per-frame Python beyond a
bounded candidate scan), float64 end-to-end: the gate table's
generation-time ground truth (datagen/gate.py ``clips_pitch``) and the
query-side kernel reproduce each other bit-for-bit — the same contract
as functions/loudness.py / functions/vad.py.

Reference parity: the reference has no DSP (audio is opaque bytes in
processors, /root/reference/internal/message/part.go); this extends
the pipeline surface the way a user would with a native plugin.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

FRAME_MS = 40
HOP_MS = 20

PITCH_FIELDS = "f0_med double, voiced_frac double, n_pitch_frames long"


def pitch_track(
    x: np.ndarray,
    sr: int,
    fmin: float = 60.0,
    fmax: float = 500.0,
    energy_floor_db: float = -45.0,
    periodicity_min: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame (f0_hz, voiced) arrays for a float PCM signal.

    Unvoiced frames (below the energy floor, or with no normalized ACF
    peak ≥ `periodicity_min` in the lag range) get f0 = nan.
    """
    x = np.asarray(x, dtype=np.float64)
    frame = max(2, int(round(sr * FRAME_MS / 1000.0)))
    hop = max(1, int(round(sr * HOP_MS / 1000.0)))
    if len(x) < frame:
        return np.empty(0), np.zeros(0, dtype=bool)
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + (np.arange(n_frames) * hop)[:, None]
    fr = x[idx]
    fr = fr - fr.mean(axis=1, keepdims=True)

    lag_min = max(1, int(np.floor(sr / fmax)))
    lag_max = min(frame - 1, int(np.ceil(sr / fmin)))
    if lag_max <= lag_min:
        return np.full(n_frames, np.nan), np.zeros(n_frames, dtype=bool)

    nfft = 1 << int(np.ceil(np.log2(2 * frame)))
    spec = np.fft.rfft(fr, n=nfft, axis=1)
    acf = np.fft.irfft(spec * np.conj(spec), n=nfft, axis=1)[:, : lag_max + 2]

    e0 = acf[:, 0]
    rms_ok = (e0 / frame) > 10.0 ** (energy_floor_db / 10.0)
    safe_e0 = np.where(e0 > 0.0, e0, 1.0)
    r = acf / safe_e0[:, None]  # normalized ACF, r[:, 0] == 1

    band = r[:, lag_min : lag_max + 1]
    peak = band.max(axis=1)
    # octave guard: the smallest-lag LOCAL MAXIMUM reaching 90% of the
    # frame's best peak (a first-lag-over-threshold rule would land on
    # the rising edge of the peak and bias F0 ~3% sharp)
    left = r[:, lag_min - 1 : lag_max]
    right = r[:, lag_min + 1 : lag_max + 2]
    is_peak = (band >= left) & (band > right)
    cand = is_peak & (band >= 0.9 * peak[:, None])
    has_cand = cand.any(axis=1)
    first = np.where(
        has_cand, np.argmax(cand, axis=1), np.argmax(band, axis=1)
    ) + lag_min
    voiced = rms_ok & (peak >= periodicity_min) & (e0 > 0.0)

    # parabolic interpolation around the chosen lag (guard the edges)
    k = np.clip(first, 1, acf.shape[1] - 2)
    y0 = np.take_along_axis(r, (k - 1)[:, None], axis=1)[:, 0]
    y1 = np.take_along_axis(r, k[:, None], axis=1)[:, 0]
    y2 = np.take_along_axis(r, (k + 1)[:, None], axis=1)[:, 0]
    denom = y0 - 2.0 * y1 + y2
    with np.errstate(invalid="ignore", divide="ignore"):
        delta = np.where(np.abs(denom) > 1e-12, 0.5 * (y0 - y2) / denom, 0.0)
    delta = np.nan_to_num(delta)
    delta = np.clip(delta, -0.5, 0.5)
    lag = k.astype(np.float64) + delta
    f0 = np.where(voiced & (lag > 0), sr / np.where(lag > 0, lag, 1.0), np.nan)
    return f0, voiced


def pitch_stats(x: np.ndarray, sr: int, **kw) -> tuple[float, float, int]:
    """(median F0 over voiced frames, voiced fraction, n frames).

    A fully unvoiced clip reports f0_med = 0.0 (not nan — parquet/SQL
    aggregation-friendly sentinel, documented here)."""
    f0, voiced = pitch_track(x, sr, **kw)
    n = len(voiced)
    if n == 0 or not voiced.any():
        return 0.0, 0.0, int(n)
    med = float(np.median(f0[voiced]))
    return med, float(voiced.sum() / n), int(n)


def pitch_map_in_pandas(passthrough_cols: list[str], **kw):
    """Arrow-batched kernel: decode each payload (functions/audio) and
    append PITCH_FIELDS (f0_med rounded to 4dp for gate-stable
    hashing, like the loudness kernel)."""
    from benthos_spark.functions import audio as A

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c] for c in passthrough_cols}
            meds, fracs, nfs = [], [], []
            for i in range(len(pdf)):
                x = np.asarray(
                    A.decode(pdf["bytes"].iat[i], pdf["codec"].iat[i]), dtype=np.float64
                )
                med, frac, nf = pitch_stats(x, int(pdf["sr_hz"].iat[i]), **kw)
                meds.append(round(med, 4))
                fracs.append(round(frac, 6))
                nfs.append(nf)
            out["f0_med"] = np.array(meds, dtype=np.float64)
            out["voiced_frac"] = np.array(fracs, dtype=np.float64)
            out["n_pitch_frames"] = np.array(nfs, dtype=np.int64)
            yield pd.DataFrame(out)

    return fn
