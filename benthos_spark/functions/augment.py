"""Deterministic audio augmentation kernels — the ASR/TTS training-data
expansion stages (speed perturbation, gain perturbation, additive noise
at a target SNR, synthetic-room reverb, SpecAugment feature masking).

The reference pipes audio payloads through processor chains opaquely
(internal/message/part.go parts + Bloblang stages); a 10^12-clip corpus
build needs these as engine-native vectorized stages. Everything here
is pure float64/float32 numpy over decoded PCM, driven by COUNTER-BASED
splitmix64 randomness keyed on the clip id — the same draw happens for
a clip no matter which executor, partition, or retry touches it, which
is what makes augmentation replay-safe under exactly-once delivery
(a redelivered batch re-produces byte-identical augmented payloads).

Kaldi/lhotse-style conventions (public knowledge): speed perturbation
is sox's `speed` — resample from round(sr·factor) back to sr, shifting
duration by 1/factor and pitch by factor; noise mixing scales a noise
draw so the measured SNR equals the target exactly; SpecAugment
(Park et al., 2019, arXiv:1904.08779) masks random time and frequency
stripes of the log-mel features.
"""

from __future__ import annotations

import math

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = 0x9E3779B97F4A7C15


def _splitmix64(v: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        v = v.astype(np.uint64)
        v = (v + np.uint64(_GOLDEN)) & _MASK
        v = ((v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        v = ((v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return v ^ (v >> np.uint64(31))


def seed_from_id(clip_id: str) -> int:
    """Stable 64-bit FNV-1a of the clip id — the per-clip RNG key."""
    h = 0xCBF29CE484222325
    for b in str(clip_id).encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def rand_u01(seed: int, stream: int, n: int) -> np.ndarray:
    """n uniforms in [0,1): counter-based, independent per stream."""
    ctr = np.arange(n, dtype=np.uint64)
    offset = np.uint64((stream * _GOLDEN + seed) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        h = _splitmix64(ctr * np.uint64(0x2545F4914F6CDD1D) + offset)
    return h.astype(np.float64) / 18446744073709551616.0


def gauss(seed: int, stream: int, n: int) -> np.ndarray:
    """n standard-normal draws via Box–Muller over two counter streams
    (u1 shifted into (0,1] so log() never sees zero)."""
    m = (n + 1) // 2
    u1 = 1.0 - rand_u01(seed, stream, m)  # (0, 1]
    u2 = rand_u01(seed, stream + 1, m)
    r = np.sqrt(-2.0 * np.log(u1))
    out = np.empty(2 * m, dtype=np.float64)
    out[0::2] = r * np.cos(2 * np.pi * u2)
    out[1::2] = r * np.sin(2 * np.pi * u2)
    return out[:n]


def speed_n_out(n: int, sr: int, factor: float) -> int:
    """Closed-form output length of :func:`speed_perturb` — integer
    arithmetic an SQL oracle can reproduce from (n, sr, factor)."""
    if n == 0:
        return 0
    sr_in = int(round(sr * factor))
    if sr_in == sr:
        return n
    return max(1, n * sr // sr_in)


def speed_perturb(x: np.ndarray, sr: int, factor: float, taps: int = 16) -> np.ndarray:
    """sox-style speed change: reinterpret the samples at rate
    round(sr·factor) and polyphase-resample back to sr. Duration scales
    by 1/factor, pitch by factor (the Kaldi 0.9/1.0/1.1 trick)."""
    from benthos_spark.functions.audio import resample_sinc

    if len(x) == 0 or factor == 1.0:
        return np.asarray(x, dtype=np.float32)
    sr_in = int(round(sr * factor))
    return resample_sinc(np.asarray(x, dtype=np.float64), sr_in, sr, taps=taps)


def apply_gain_db(x: np.ndarray, g_db: float) -> np.ndarray:
    """Linear gain with a hard clip at full scale (int16 codecs saturate
    anyway — clipping here keeps the float and encoded paths equal)."""
    return np.clip(np.asarray(x, dtype=np.float64) * (10.0 ** (g_db / 20.0)), -1.0, 1.0)


def mix_noise_snr(x: np.ndarray, snr_db: float, seed: int, stream: int = 11) -> np.ndarray:
    """Add Gaussian noise scaled so the measured SNR vs `x` is EXACTLY
    `snr_db` (the draw is renormalized by its own measured power, so the
    target holds in float64, not just in expectation). Silent input is
    returned unchanged — there is no signal to define an SNR against."""
    x = np.asarray(x, dtype=np.float64)
    px = float(np.mean(np.square(x))) if len(x) else 0.0
    if px <= 0.0:
        return x
    n0 = gauss(seed, stream, len(x))
    pn0 = float(np.mean(np.square(n0)))
    scale = math.sqrt(px / (pn0 * 10.0 ** (snr_db / 10.0)))
    return x + n0 * scale


def measured_snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of `test` against `ref` over the common prefix (float64)."""
    n = min(len(ref), len(test))
    if n == 0:
        return float("inf")
    r = np.asarray(ref[:n], dtype=np.float64)
    e = np.asarray(test[:n], dtype=np.float64) - r
    pr = float(np.mean(np.square(r)))
    pe = float(np.mean(np.square(e)))
    if pe <= 0.0:
        return float("inf")
    return 10.0 * math.log10(max(pr, 1e-300) / pe)


def synth_ir(sr: int, rt60_ms: float, seed: int, stream: int = 21, wet: float = 0.3) -> np.ndarray:
    """Synthetic room impulse response: unit direct path + an
    exponentially decaying Gaussian tail reaching -60 dB at `rt60_ms`
    (the textbook Schroeder/image-method stand-in — deterministic, so
    the augmented payload is reproducible on redelivery)."""
    n_ir = max(2, int(round(sr * rt60_ms / 1000.0)))
    t = np.arange(n_ir, dtype=np.float64) / sr
    env = np.exp(-6.907755278982137 * t / (rt60_ms / 1000.0))  # ln(1000)
    h = gauss(seed, stream, n_ir) * env * wet
    h[0] = 1.0
    return h


def apply_reverb(x: np.ndarray, ir: np.ndarray) -> np.ndarray:
    """FFT convolution trimmed to len(x), peak-renormalized to the dry
    peak so the wet clip never clips hotter than the input."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) == 0:
        return x
    n_fft = 1 << int(np.ceil(np.log2(len(x) + len(ir) - 1)))
    y = np.fft.irfft(np.fft.rfft(x, n_fft) * np.fft.rfft(ir, n_fft), n_fft)[: len(x)]
    peak_in = float(np.abs(x).max())
    peak_out = float(np.abs(y).max())
    if peak_out > 0.0 and peak_in > 0.0:
        y *= peak_in / peak_out
    return np.clip(y, -1.0, 1.0)


def log_mel(x: np.ndarray, sr: int, n_mels: int = 40) -> np.ndarray:
    """(n_frames, n_mels) log-mel features — the SpecAugment substrate."""
    from benthos_spark.functions.audio_dsp import mel_filterbank, stft_mag

    mag = stft_mag(np.asarray(x, dtype=np.float64))
    if mag.shape[0] == 0:
        return np.zeros((0, n_mels))
    fb = mel_filterbank(sr, n_mels=n_mels)
    return np.log(mag @ fb.T + 1e-10)


def spec_augment(
    mel: np.ndarray,
    seed: int,
    time_masks: int = 2,
    freq_masks: int = 2,
    max_t: int = 20,
    max_f: int = 8,
    stream: int = 31,
) -> tuple[np.ndarray, float]:
    """SpecAugment time/frequency masking (Park et al. 2019): mask
    `time_masks` random frame stripes (width ≤ max_t) and `freq_masks`
    random mel stripes (width ≤ max_f) to the feature mean. Returns the
    masked copy and the fraction of cells masked."""
    mel = np.asarray(mel, dtype=np.float64)
    nf, nm = mel.shape
    if nf == 0 or nm == 0:
        return mel.copy(), 0.0
    out = mel.copy()
    fill = float(mel.mean())
    u = rand_u01(seed, stream, 2 * (time_masks + freq_masks))
    masked = np.zeros((nf, nm), dtype=bool)
    k = 0
    for _ in range(time_masks):
        w = int(u[k] * (min(max_t, nf) + 1))
        s = int(u[k + 1] * max(1, nf - w + 1))
        out[s : s + w, :] = fill
        masked[s : s + w, :] = True
        k += 2
    for _ in range(freq_masks):
        w = int(u[k] * (min(max_f, nm) + 1))
        s = int(u[k + 1] * max(1, nm - w + 1))
        out[:, s : s + w] = fill
        masked[:, s : s + w] = True
        k += 2
    return out, float(masked.mean())


# ---------------------------------------------------------------------------
# Gate-table chain: the canonical augmentation pipeline measured end to end
# (speed → gain → noise → int16 round trip). Both the datagen ground-truth
# writer and the catalog query run THIS function, so the oracle hash matches
# only on bit-exact decode + DSP reproduction; the length and SNR checks are
# re-derived analytically on both sides (catalog audio_augment_rollup).
# ---------------------------------------------------------------------------


def chain_stats(
    x: np.ndarray,
    sr: int,
    clip_id: str,
    snr_db: float = 20.0,
    factors: tuple = (0.9, 1.0, 1.1),
    gain_range: tuple = (-3.0, 3.0),
) -> tuple[float, float, int, float, float]:
    """Run the speed→gain→noise chain with id-seeded draws and measure
    the result after an int16 quantization round trip (what any int16
    re-encode does). Returns (factor, gain_db, n_out, rms_db,
    snr_meas_db) with the floats rounded to 4dp."""
    seed = seed_from_id(clip_id)
    u = rand_u01(seed, 40, 2)
    factor = float(factors[int(u[0] * len(factors))])
    g = float(gain_range[0] + u[1] * (gain_range[1] - gain_range[0]))
    y = np.asarray(speed_perturb(x, sr, factor), dtype=np.float64)
    y = apply_gain_db(y, g)
    z = np.clip(mix_noise_snr(y, snr_db, seed), -1.0, 1.0)
    q = np.clip(np.rint(z * 32767.0), -32768, 32767) / 32767.0
    pq = float(np.mean(np.square(q))) if len(q) else 0.0
    rms_db = 10.0 * math.log10(pq) if pq > 0.0 else -200.0
    snr = measured_snr_db(y, q)
    return (
        round(factor, 4),
        round(g, 4),
        int(len(q)),
        round(rms_db, 4),
        round(snr if math.isfinite(snr) else 999.0, 4),
    )


AUGMENT_FIELDS = (
    "factor double, gain_db double, n_out bigint, rms_db double, snr_meas_db double"
)


def augment_chain_map_in_pandas(
    passthrough: list[str],
    snr_db: float = 20.0,
    factors: tuple = (0.9, 1.0, 1.1),
    gain_range: tuple = (-3.0, 3.0),
    id_col: str = "clip_id",
):
    """Arrow kernel: decode each payload and append the chain_stats
    columns (AUGMENT_FIELDS) after the passthrough columns."""

    def fn(batches):
        import pandas as pd

        from benthos_spark.functions import audio as A

        for pdf in batches:
            n = len(pdf)
            fac = np.empty(n, dtype=np.float64)
            gdb = np.empty(n, dtype=np.float64)
            nout = np.empty(n, dtype=np.int64)
            rms = np.empty(n, dtype=np.float64)
            snr = np.empty(n, dtype=np.float64)
            for i in range(n):
                x = np.asarray(
                    A.decode(pdf["bytes"].iat[i], pdf["codec"].iat[i]), dtype=np.float64
                )
                fac[i], gdb[i], nout[i], rms[i], snr[i] = chain_stats(
                    x,
                    int(pdf["sr_hz"].iat[i]),
                    pdf[id_col].iat[i],
                    snr_db=snr_db,
                    factors=factors,
                    gain_range=gain_range,
                )
            out = {c: pdf[c] for c in passthrough}
            out["factor"] = fac
            out["gain_db"] = gdb
            out["n_out"] = nout
            out["rms_db"] = rms
            out["snr_meas_db"] = snr
            yield pd.DataFrame(out)

    return fn


def time_stretch(x: np.ndarray, rate: float, frame: int = 1024) -> np.ndarray:
    """WSOLA time stretch (Verhelst & Roelands 1993, public algorithm):
    change duration by 1/rate while PRESERVING pitch — the complement of
    :func:`speed_perturb` (which shifts pitch by the factor). Synthesis
    frames advance by Hs = frame/2 with a 50%-overlap periodic Hann
    (constant OLA sum); each frame is picked within ±Hs/2 of its nominal
    analysis position by maximizing cross-correlation with the natural
    continuation of the previously copied segment (one (2Δ+1, frame) @
    (frame,) matmul per frame — no per-sample Python). Deterministic:
    no randomness anywhere."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    hs = frame // 2
    delta = hs // 2
    if rate == 1.0 or n < frame + 2 * delta + hs:
        return x.astype(np.float32)
    n_out = max(frame, int(round(n / rate)))
    k_frames = (n_out - frame) // hs + 1
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)  # periodic Hann
    out = np.zeros(n_out + frame, dtype=np.float64)
    wsum = np.zeros(n_out + frame, dtype=np.float64)
    swv = np.lib.stride_tricks.sliding_window_view(x, frame)
    p_prev = 0
    for k in range(k_frames):
        nominal = int(round(k * hs * rate))
        if k == 0:
            p = 0
        else:
            lo = max(0, min(nominal - delta, n - frame))
            hi = max(lo, min(nominal + delta, n - frame))
            template = x[p_prev + hs : p_prev + hs + frame]
            if len(template) < frame or hi == lo:
                p = lo
            else:
                # (hi-lo+1, frame) candidate matrix @ template
                scores = swv[lo : hi + 1] @ template
                p = lo + int(np.argmax(scores))
        seg = x[p : p + frame]
        pos = k * hs
        out[pos : pos + frame] += seg * win
        wsum[pos : pos + frame] += win
        p_prev = p
    out = out[:n_out]
    wsum = wsum[:n_out]
    nz = wsum > 1e-8
    out[nz] /= wsum[nz]
    return np.clip(out, -1.0, 1.0).astype(np.float32)
