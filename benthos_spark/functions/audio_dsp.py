"""Audio DSP feature kernels: STFT, mel filterbank, MFCC, spectral-peak
fingerprints.

These are the feature-extraction mappings of an audio training-data
pipeline (the reference pipes payloads through per-message processors —
internal/impl/pure/processor_jq.go-style transforms; here the payload is
PCM and the transform is a spectral feature). Everything is numpy over
Arrow batches — frames come from one stride-tricks view, the FFT runs
across the whole frame matrix at once, mel/DCT are single matmuls.

Determinism: identical inputs produce bit-identical outputs on a given
platform (pure numpy, no RNG), which is what lets the gate parquet carry
generation-time MFCC / fingerprint ground truth the engine must
reproduce from the payload bytes alone (datagen/gate.py).
"""

from __future__ import annotations

import numpy as np

FRAME = 512
HOP = 256
N_MELS = 26
N_MFCC = 13

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def n_frames_for(n_samples: int, frame: int = FRAME, hop: int = HOP) -> int:
    """Frame count of the STFT below — closed-form so an SQL oracle can
    derive it from ``n_samples`` alone: 1 + (n-frame)//hop for n ≥ frame,
    else 1 for any non-empty signal (single zero-padded frame), else 0."""
    if n_samples <= 0:
        return 0
    if n_samples < frame:
        return 1
    return 1 + (n_samples - frame) // hop


def stft_mag(x: np.ndarray, frame: int = FRAME, hop: int = HOP) -> np.ndarray:
    """Hann-windowed STFT magnitudes, (n_frames, frame//2+1) float64.
    Short signals are zero-padded to one frame."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) == 0:
        return np.zeros((0, frame // 2 + 1))
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_fr = 1 + (len(x) - frame) // hop
    sv = np.lib.stride_tricks.as_strided(
        x, shape=(n_fr, frame), strides=(x.strides[0] * hop, x.strides[0]), writeable=False
    )
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)  # periodic Hann
    # chunked rfft: one giant batched call hits a pathological slow path
    # in numpy's pocketfft (measured 65x slower than 1024-frame chunks)
    out = np.empty((n_fr, frame // 2 + 1))
    for s in range(0, n_fr, 1024):
        out[s : s + 1024] = np.abs(np.fft.rfft(sv[s : s + 1024] * win, axis=1))
    return out


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (np.power(10.0, np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    sr_hz: int, n_fft: int = FRAME, n_mels: int = N_MELS, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filters on the HTK mel scale."""
    fmax = fmax if fmax is not None else sr_hz / 2.0
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.fft.rfftfreq(n_fft, d=1.0 / sr_hz)
    fb = np.zeros((n_mels, len(bins)))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def _dct2_ortho(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in) — the cepstral lift."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    c = np.sqrt(2.0 / n_in) * np.cos(np.pi * (n + 0.5) * k / n_in)
    c[0] /= np.sqrt(2.0)
    return c


def mfcc(
    x: np.ndarray, sr_hz: int, n_mfcc: int = N_MFCC, mag: np.ndarray | None = None
) -> np.ndarray:
    """(n_frames, n_mfcc) mel-frequency cepstral coefficients:
    STFT → mel energies → log → DCT-II (orthonormal). Pass a precomputed
    ``mag`` (from :func:`stft_mag`) to share the STFT with fingerprint()."""
    if mag is None:
        mag = stft_mag(x)
    if mag.shape[0] == 0:
        return np.zeros((0, n_mfcc))
    fb = mel_filterbank(sr_hz)
    logmel = np.log(mag @ fb.T + 1e-10)
    return logmel @ _dct2_ortho(n_mfcc, fb.shape[0]).T


def mfcc_mean(
    x: np.ndarray, sr_hz: int, n_mfcc: int = N_MFCC, mag: np.ndarray | None = None
) -> np.ndarray:
    m = mfcc(x, sr_hz, n_mfcc, mag=mag)
    return m.mean(axis=0) if len(m) else np.zeros(n_mfcc)


# ---------------------------------------------------------------------------
# Spectral-peak fingerprints for RE-ENCODE DEDUP (the constellation idea
# of Wang 2003 "An Industrial-Strength Audio Search Algorithm", adapted):
# per frame, the peak bin in each of `n_bands` log-spaced bands; a hash
# joins TWO prominent peaks ≥ FP_MIN_DIST bins apart in the SAME frame,
# anchored to the frame index. Differences from retrieval fingerprints
# are deliberate:
#   - time-ANCHORED, not time-shift-invariant: a lossy re-encode of a
#     clip is sample-aligned with its original, while two different
#     clips must then agree jointly in frequency AND time — measured on
#     the synthetic corpus, shift-invariant variants collapse into
#     single-frequency features that match any clip sharing one partial;
#   - cross-band pairs only, ≥ FP_MIN_DIST bins apart: a strong tone
#     near a band boundary leaks into both adjacent bands and would
#     otherwise emit a "pair" that is really ONE frequency;
#   - straddled >>1 quantization (each peak emits both q and q+1>>1):
#     companding/ADPCM noise flips argmaxes by ±1 bin, and straddling
#     keeps one shared hash across the flip.
# Robust to μ-law/A-law/ADPCM re-encodes (peaks survive), discriminative
# across clips (joint frequency+time match required).
# ---------------------------------------------------------------------------

FP_BANDS = 8
FP_QUANT = 1  # peak bins are hashed at >>1 (2-bin tolerance)
FP_PROMINENCE = 3.0  # peak counts at ≥ 3x the band mean excluding the peak
FP_MIN_DIST = 8  # bins between the two peaks of a pair (leakage guard)
FP_STABLE = 0.25  # band must be prominent in ≥ 25% of frames


def _splitmix64(v: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        v = v.astype(np.uint64)
        v = (v + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        v = ((v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        v = ((v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return v ^ (v >> np.uint64(31))


def band_peaks(mag: np.ndarray, n_bands: int = FP_BANDS) -> tuple[np.ndarray, np.ndarray]:
    """Per log-spaced band (bins < 4 excluded — the bottom octaves are
    1-2 bins wide, where "the band peak" is a constant and every clip
    would share the same universal hash): (peak_bins, prominent) — each
    (n_frames, n_bands); `prominent` marks peaks ≥ FP_PROMINENCE × the
    band's mean magnitude EXCLUDING the peak itself (with the peak
    included, a 3-bin band maxes out at exactly ratio 3 and the test
    becomes a float-noise coin flip; noise-floor argmaxes would
    otherwise jitter per re-encode and poison the hash set)."""
    n_bins = mag.shape[1]
    edges = np.unique(
        np.round(np.geomspace(min(4, n_bins - 1), n_bins - 1, n_bands + 1)).astype(np.int64)
    )
    while len(edges) < n_bands + 1:  # tiny FFTs: pad degenerate edges
        edges = np.append(edges, edges[-1] + 1)
    peaks = np.zeros((mag.shape[0], n_bands), dtype=np.int32)
    prominent = np.zeros((mag.shape[0], n_bands), dtype=bool)
    for b in range(n_bands):
        lo, hi = int(edges[b]), int(min(edges[b + 1], n_bins))
        if hi <= lo:
            hi = lo + 1
        sub = mag[:, lo:hi]
        ix = np.argmax(sub, axis=1)
        peaks[:, b] = lo + ix.astype(np.int32)
        vals = np.take_along_axis(sub, ix[:, None], axis=1)[:, 0]
        w = hi - lo
        rest_mean = (sub.sum(axis=1) - vals) / max(w - 1, 1)
        prominent[:, b] = vals >= FP_PROMINENCE * np.maximum(rest_mean, 1e-12)
    return peaks, prominent


def fingerprint(
    x: np.ndarray, n_bands: int = FP_BANDS, mag: np.ndarray | None = None
) -> np.ndarray:
    """Sorted unique uint64 fingerprint hashes for one clip. Each hash
    packs (frame, band-pair, peak_bin_lo >> FP_QUANT, peak_bin_hi >>
    FP_QUANT) through splitmix64 for every same-frame pair of prominent
    peaks ≥ FP_MIN_DIST bins apart (see the family docstring above for
    why time-anchored + cross-band + straddled). Pass a precomputed
    ``mag`` (from :func:`stft_mag`) to share the STFT with mfcc()."""
    if mag is None:
        mag = stft_mag(x)
    if mag.shape[0] == 0:
        return np.zeros(0, dtype=np.uint64)
    p, ok = band_peaks(mag, n_bands)
    # clip-level stability gate: a band that is only sporadically
    # prominent is tracking the noise floor — its argmaxes are random
    # bins that differ per re-encode and dilute the match fraction.
    ok = ok & (ok.mean(axis=0, keepdims=True) >= FP_STABLE)
    ts = np.arange(mag.shape[0], dtype=np.uint64)
    parts = []
    with np.errstate(over="ignore"):
        for b1 in range(n_bands):
            for b2 in range(b1 + 1, n_bands):
                both = ok[:, b1] & ok[:, b2] & (p[:, b2] - p[:, b1] >= FP_MIN_DIST)
                if not both.any():
                    continue
                t_u = ts[both] * np.uint64(1 << 46) + np.uint64(
                    (b1 * n_bands + b2) << 40
                )
                for qa in (p[both, b1] >> FP_QUANT, (p[both, b1] + 1) >> FP_QUANT):
                    for qb in (p[both, b2] >> FP_QUANT, (p[both, b2] + 1) >> FP_QUANT):
                        key = t_u + qa.astype(np.uint64) * np.uint64(1 << 20) + qb.astype(
                            np.uint64
                        )
                        parts.append(_splitmix64(key))
    return np.unique(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.uint64)


def fingerprint_stats(x: np.ndarray) -> tuple[int, int]:
    """(n_fp, fp_xor32) — count of unique hashes and their XOR folded to
    32 bits (sums of the fold stay inside int64 for any realistic table,
    and both are exact integers an oracle can hash-check)."""
    h = fingerprint(x)
    if len(h) == 0:
        return 0, 0
    xor = np.bitwise_xor.reduce(h)
    return int(len(h)), int(xor & np.uint64(0xFFFFFFFF))


def match_count(fp_a: np.ndarray, fp_b: np.ndarray) -> int:
    """|intersection| of two sorted unique hash arrays."""
    return int(len(np.intersect1d(fp_a, fp_b, assume_unique=True)))
