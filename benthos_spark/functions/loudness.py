"""ITU-R BS.1770-4 loudness (LUFS) — K-weighting + gated integration.

From-scratch implementation of the broadcast loudness measure over the
engine's mono PCM lanes (the reference pipes audio payloads through
Bloblang/processor chains; a loudness stage is table stakes for an
audio training-data pipeline — filtering clips by loudness range is the
audio analog of the text quality score, catalog.py text_quality_docs).

Filter design: the spec publishes the two K-weighting biquads only at
fs=48 kHz; other rates re-derive them from the documented analog
prototype (high-shelf f0≈1681.97 Hz / +4 dB / Q≈0.7072, then an RLB
high-pass f0≈38.135 Hz / Q≈0.5003) through the RBJ bilinear-transform
shelf equations — the public derivation used across open loudness
meters (e.g. pyloudnorm, BSD). ``k_weighting_coeffs(48000)`` reproduces
the spec's coefficient table to 1e-6 (tests/test_loudness.py), which is
the independent check that the re-derivation is the spec's filter.

Gating (BS.1770-4 §10): 400 ms blocks, 75 % overlap, absolute gate at
−70 LKFS, then a relative gate 10 LU below the absolute-gated mean;
integrated loudness is the mean square of surviving blocks. Mono
channel weight 1.0; clips shorter than one block fall back to a single
full-length block (the spec leaves sub-400 ms programme undefined).

Everything is float64 and deterministic — the gate entry stores the
generation-side value and requires the decode path to reproduce it
bit-for-bit before rounding.
"""

from __future__ import annotations

import math

import numpy as np

# Analog prototype constants behind the spec's 48 kHz table (public
# derivation; see module docstring).
_SHELF_F0 = 1681.9744509555319
_SHELF_GAIN_DB = 3.999843853973347
_SHELF_Q = 0.7071752369554196
_HP_F0 = 38.13547087602444
_HP_Q = 0.5003270373238773
# Mid-band gain split of the shelf prototype (Vb = Vh**alpha).
_SHELF_VB_EXP = 0.4996667741545416

ABS_GATE_LKFS = -70.0
REL_GATE_LU = -10.0
_OFFSET = -0.691  # the spec's K-weighted offset


def k_weighting_coeffs(fs: int) -> tuple[tuple[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]:
    """(b, a) for stage 1 (shelf) and stage 2 (RLB high-pass) at fs."""
    # stage 1: high shelf (RBJ bilinear transform of the prototype)
    K = math.tan(math.pi * _SHELF_F0 / fs)
    Vh = 10.0 ** (_SHELF_GAIN_DB / 20.0)
    Vb = Vh**_SHELF_VB_EXP
    a0 = 1.0 + K / _SHELF_Q + K * K
    b1 = np.array(
        [
            (Vh + Vb * K / _SHELF_Q + K * K) / a0,
            2.0 * (K * K - Vh) / a0,
            (Vh - Vb * K / _SHELF_Q + K * K) / a0,
        ]
    )
    a1 = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / _SHELF_Q + K * K) / a0])
    # stage 2: RLB high-pass — the spec's table keeps b unnormalized
    K = math.tan(math.pi * _HP_F0 / fs)
    den = 1.0 + K / _HP_Q + K * K
    b2 = np.array([1.0, -2.0, 1.0])
    a2 = np.array([1.0, 2.0 * (K * K - 1.0) / den, (1.0 - K / _HP_Q + K * K) / den])
    return (b1, a1), (b2, a2)


def _biquad(x: np.ndarray, b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Direct-form-II-transposed biquad (zero initial state)."""
    y = np.empty_like(x)
    b0, b1, b2 = float(b[0]), float(b[1]), float(b[2])
    a1, a2 = float(a[1]), float(a[2])
    z1 = z2 = 0.0
    for i in range(x.shape[0]):
        xi = x[i]
        yi = b0 * xi + z1
        z1 = b1 * xi - a1 * yi + z2
        z2 = b2 * xi - a2 * yi
        y[i] = yi
    return y


def k_weight(x: np.ndarray, fs: int) -> np.ndarray:
    """Apply the two-stage K-weighting prefilter."""
    (b1, a1), (b2, a2) = k_weighting_coeffs(fs)
    x = np.asarray(x, dtype=np.float64)
    return _biquad(_biquad(x, b1, a1), b2, a2)


def _block_power(y: np.ndarray, fs: int) -> np.ndarray:
    """Mean-square power of 400 ms blocks at 75 % overlap (100 ms hop).
    Shorter-than-one-block input → one full-length block."""
    n = y.shape[0]
    block = int(round(0.400 * fs))
    step = int(round(0.100 * fs))
    if n < block or block == 0:
        return np.array([float(np.mean(y * y))]) if n else np.array([])
    csum = np.concatenate(([0.0], np.cumsum(y * y)))
    starts = np.arange(0, n - block + 1, step)
    return (csum[starts + block] - csum[starts]) / float(block)


def integrated_lufs(x: np.ndarray, fs: int) -> float:
    """Gated integrated loudness (LKFS ≡ LUFS) of a mono signal in
    [-1, 1]. Returns -inf for silence/empty input."""
    y = k_weight(x, fs)
    z = _block_power(y, fs)
    if z.size == 0:
        return float("-inf")
    with np.errstate(divide="ignore"):
        l_blocks = _OFFSET + 10.0 * np.log10(z)
    j_abs = l_blocks > ABS_GATE_LKFS
    if not np.any(j_abs):
        return float("-inf")
    rel_thresh = _OFFSET + 10.0 * math.log10(float(np.mean(z[j_abs]))) + REL_GATE_LU
    j = j_abs & (l_blocks > rel_thresh)
    if not np.any(j):
        return float("-inf")
    return _OFFSET + 10.0 * math.log10(float(np.mean(z[j])))


def momentary_max_lufs(x: np.ndarray, fs: int) -> float:
    """Maximum momentary (400 ms) loudness — the clipping-risk dial."""
    y = k_weight(x, fs)
    z = _block_power(y, fs)
    if z.size == 0 or float(np.max(z)) <= 0.0:
        return float("-inf")
    return _OFFSET + 10.0 * math.log10(float(np.max(z)))


def loudness_map_in_pandas(passthrough_cols: list[str]):
    """mapInPandas kernel: decode each clip's payload and measure
    integrated + max-momentary loudness. Emits float64 rounded to 4dp
    in NUMPY (so the generation-side ground truth, produced by the same
    rounding on the same floats, matches bit-for-bit)."""
    import pandas as pd

    from benthos_spark.functions import audio as A

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            li = np.empty(n, dtype=np.float64)
            lm = np.empty(n, dtype=np.float64)
            for i in range(n):
                x = A.decode(pdf["bytes"].iat[i], pdf["codec"].iat[i])
                fs = int(pdf["sr_hz"].iat[i])
                li[i] = integrated_lufs(np.asarray(x, dtype=np.float64), fs)
                lm[i] = momentary_max_lufs(np.asarray(x, dtype=np.float64), fs)
            out = {c: pdf[c] for c in passthrough_cols}
            out["lufs_i"] = np.round(li, 4)
            out["lufs_mmax"] = np.round(lm, 4)
            yield pd.DataFrame(out)

    return fn
