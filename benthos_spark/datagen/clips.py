"""The `clips` table — audio clip + transcript pairs (FIXTURES.md F1).

Schema (BASELINE.json ``input_hint``)::

    clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
    codec:string, transcript:string, event_ts:timestamp

Deterministic per clip index: parameters come from a splitmix64 hash of
the index (scale-independent), the PCM signal is seeded multi-sine+noise
(counter-based Philox keyed by [seed, i]), transcripts are seeded word
sequences with mixed case/whitespace/punctuation for the normalization
tests. `dur_ms` is long-tailed and `codec` zipf-skewed (hot key
``pcm_s16le``) to exercise salting/AQE-skew handling.

Generation is distributed: ``mapInPandas`` over ``spark.range(n)``.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from benthos_spark.functions import audio

SEED = 42
BASE_TS = dt.datetime(2024, 3, 1, 0, 0, 0)
STEP_MS = 250  # one clip arrives every 250ms of event time
WINDOW_S = 60  # the canonical window size late rows jitter against
DUP_EVERY = 5  # every 5th clip gets a planted ADPCM-transcode near-dup

SR_CHOICES = np.array([8000, 16000, 22050, 44100], dtype=np.int64)
CODEC_CHOICES = ("pcm_s16le", "wav", "ulaw", "alaw")

VOCAB = (
    "the quick brown fox jumps over lazy dog alpha bravo charlie delta "
    "echo foxtrot golf hotel india juliet kilo lima mike november oscar "
    "papa quebec romeo sierra tango uniform victor whiskey xray yankee "
    "zulu zero one two three four five six seven eight nine audio clip "
    "stream window state join codec sample signal noise filter spark "
    "engine batch shuffle skew salt"
).split()

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def _splitmix64(v: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        v = v.astype(np.uint64)
        v = (v + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        v = ((v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        v = ((v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return v ^ (v >> np.uint64(31))


def _hash_u01(ids: np.ndarray, stream: int, seed: int = SEED) -> np.ndarray:
    """Uniform [0,1) per id, independent per `stream`."""
    offset = np.uint64((stream * 0x9E3779B97F4A7C15 + seed) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        h = _splitmix64(ids.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D) + offset)
    return h.astype(np.float64) / 18446744073709551616.0


def clip_params(ids: np.ndarray, seed: int = SEED) -> dict[str, np.ndarray]:
    """Scale-independent per-clip parameters from the clip index."""
    u_sr = _hash_u01(ids, 1, seed)
    u_dur = _hash_u01(ids, 2, seed)
    u_codec = _hash_u01(ids, 3, seed)
    u_late = _hash_u01(ids, 4, seed)
    u_lmag = _hash_u01(ids, 5, seed)

    sr = SR_CHOICES[(u_sr * len(SR_CHOICES)).astype(np.int64)]

    # 90% short (200-2000ms), 10% quadratic long tail up to 30s — the
    # duration skew axis.
    short = 200 + (u_dur / 0.9 * 1800.0)
    tail = 2000 + ((u_dur - 0.9) / 0.1) ** 2 * 28000.0
    dur = np.where(u_dur < 0.9, short, tail).astype(np.int64)

    # zipf-ish codec skew: pcm_s16le is the hot key (55%).
    codec_ix = np.select(
        [u_codec < 0.55, u_codec < 0.75, u_codec < 0.90],
        [0, 1, 2],
        default=3,
    )

    # event time: ordered by index, ~5% jittered late by 1-3 windows.
    ts_ms = ids.astype(np.int64) * STEP_MS
    late = u_late < 0.05
    lateness_ms = (1 + (u_lmag * 3).astype(np.int64)) * WINDOW_S * 1000
    ts_ms = np.where(late, np.maximum(ts_ms - lateness_ms, 0), ts_ms)

    return {"sr_hz": sr, "dur_ms": dur, "codec_ix": codec_ix, "ts_ms": ts_ms, "is_late": late}


def reference_signal(i: int, sr_hz: int, dur_ms: int, seed: int = SEED) -> np.ndarray:
    """The ground-truth float PCM for clip `i` — the per-row invariant
    baseline (decoded payload must reach SNR ≥ 30 dB against this)."""
    n = int(round(sr_hz * dur_ms / 1000.0))
    ids = np.array([i], dtype=np.uint64)
    t = np.arange(n, dtype=np.float64) / sr_hz
    x = np.zeros(n, dtype=np.float64)
    # three vibrato'd partials: per-clip seeded frequency modulation
    # (depth 2-6%, rate 0.5-4 Hz) makes the spectral-peak TRAJECTORY
    # clip-specific — a stationary trio would make every same-frequency
    # clip a fingerprint twin (audio_dsp.fingerprint), and real speech/
    # music is non-stationary anyway
    for j, amp in enumerate((0.45, 0.25, 0.15)):
        f = 100.0 + _hash_u01(ids, 10 + j, seed)[0] * 2900.0
        p = _hash_u01(ids, 13 + j, seed)[0] * 2 * np.pi
        depth = 0.02 + _hash_u01(ids, 16 + j, seed)[0] * 0.04
        rate = 0.5 + _hash_u01(ids, 19 + j, seed)[0] * 3.5
        pv = _hash_u01(ids, 23 + j, seed)[0] * 2 * np.pi
        # phase integral of f·(1 + depth·sin(2π·rate·t + pv))
        theta = 2 * np.pi * f * (
            t - depth * (np.cos(2 * np.pi * rate * t + pv) - np.cos(pv)) / (2 * np.pi * rate)
        )
        x += amp * np.sin(theta + p)
    rng = np.random.Generator(np.random.Philox(key=[seed, int(i)]))
    x += 0.002 * rng.standard_normal(n)
    return np.clip(x, -0.999, 0.999).astype(np.float64)


def make_transcript(i: int, dur_ms: int, seed: int = SEED) -> str:
    """Seeded word sequence, length ∝ duration; mixed case/whitespace/punct
    so normalization (lowercase/trim/collapse/strip-punct) is exercised."""
    n_words = 2 + dur_ms // 400
    base = np.uint64((int(i) * 1000003 + seed * 7919) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        ids = np.arange(n_words, dtype=np.uint64) + base
    picks = _splitmix64(ids)
    deco = _hash_u01(ids, 21, seed)
    words = []
    for j in range(n_words):
        w = VOCAB[int(picks[j] % np.uint64(len(VOCAB)))]
        d = deco[j]
        if d < 0.08:
            w = w.upper()
        elif d < 0.20:
            w = w.capitalize()
        if 0.20 <= d < 0.26:
            w = w + ","
        sep = "  " if 0.26 <= d < 0.30 else " "
        words.append(w + (sep if j < n_words - 1 else ""))
    body = "".join(words)
    head = "  " if _hash_u01(np.array([i], dtype=np.uint64), 22, seed)[0] < 0.1 else ""
    return head + body + "."


def clips_pdf(ids: np.ndarray, seed: int = SEED, with_expected: bool = False) -> pd.DataFrame:
    """Materialize clip rows for a chunk of indices (runs inside a task).

    ``with_expected=True`` adds ground-truth columns the DuckDB oracle
    reads so the gate can hash-check the decode/analysis entries
    (datagen/gate.py):

    - ``n_samples``   — arithmetic (round(sr·dur/1000)), independent of
      both encoder and decoder.
    - ``checksum16``  — for pcm/wav the ENCODER's own int16 sample sum
      (decode-independent ground truth); for the companded codecs the
      encode→decode roundtrip value (their fidelity gate is the SNR≥30dB
      pytest against `reference_signal`).
    - ``voiced_ratio``/``spectral_centroid``/``rolloff85`` — the
      deterministic trim+rFFT analysis of the decoded payload, computed
      here at generation time (consistency columns: the engine must
      reproduce them bit-for-bit at query time from the bytes alone).
    - ``mfcc0_mean``/``mfcc1_mean`` — clip-mean of the first two MFCCs of
      the decoded payload (functions/audio_dsp.py), same consistency
      contract.
    - ``n_fp``/``fp_xor32``/``fp_hashes`` — the spectral-peak fingerprint
      of the decoded payload (count, 32-bit-folded XOR, and the full
      sorted hash list as BIGINTs) so the oracle can replay pair-
      intersection dedup in plain SQL (unnest + join).
    - ``fp_hashes_adpcm`` — for the planted-duplicate subset (clip index
      % DUP_EVERY == 0) the fingerprint of the clip after an IMA-ADPCM
      transcode roundtrip (decode → adpcm encode → decode); empty list
      for the rest. Ground truth for the fingerprint-dedup entry: the
      re-encode is a lossy copy whose spectral peaks survive, so its
      hashes collide with the original's.
    """
    params = clip_params(ids, seed)
    rows_bytes, transcripts = [], []
    exp: dict[str, list] = {"n_samples": [], "checksum16": [], "voiced_ratio": [],
                            "spectral_centroid": [], "rolloff85": [],
                            "mfcc0_mean": [], "mfcc1_mean": [],
                            "n_fp": [], "fp_xor32": [], "fp_hashes": []}
    decoded: list[np.ndarray] = []
    for k, i in enumerate(ids):
        sr = int(params["sr_hz"][k])
        dur = int(params["dur_ms"][k])
        codec = CODEC_CHOICES[int(params["codec_ix"][k])]
        x = reference_signal(int(i), sr, dur, seed)
        b = audio.encode(x, codec, sr)
        rows_bytes.append(b)
        transcripts.append(make_transcript(int(i), dur, seed))
        if with_expected:
            from benthos_spark.functions import audio_dsp

            exp["n_samples"].append(int(round(sr * dur / 1000.0)))
            if codec in ("pcm_s16le", "wav"):
                q = np.clip(np.rint(x * 32767.0), -32768, 32767)
                exp["checksum16"].append(int(q.sum()))
            else:
                exp["checksum16"].append(audio.checksum16(audio.decode(b, codec)))
            xd = audio.decode(b, codec)
            decoded.append(xd)
            t = audio.trim_silence(xd)
            exp["voiced_ratio"].append(len(t) / len(xd) if len(xd) else 0.0)
            c, r = audio.spectral_features(t if len(t) else xd, sr)
            exp["spectral_centroid"].append(c)
            exp["rolloff85"].append(r)
            mag = audio_dsp.stft_mag(xd)  # ONE STFT shared by MFCC + fingerprint
            mm = audio_dsp.mfcc_mean(xd, sr, mag=mag)
            exp["mfcc0_mean"].append(float(mm[0]))
            exp["mfcc1_mean"].append(float(mm[1]))
            h = audio_dsp.fingerprint(xd, mag=mag)
            exp["n_fp"].append(int(len(h)))
            exp["fp_xor32"].append(
                int(np.bitwise_xor.reduce(h) & np.uint64(0xFFFFFFFF)) if len(h) else 0
            )
            exp["fp_hashes"].append(h.astype(np.int64).tolist())
    if with_expected:
        from benthos_spark.functions import audio_dsp

        # batched ADPCM roundtrip for the planted-dup subset only (one
        # vectorized lane matrix for the chunk), then fingerprint the
        # transcoded signals
        dup_ix = [k for k, i in enumerate(ids) if int(i) % DUP_EVERY == 0]
        rt = audio.adpcm_decode_many(audio.adpcm_encode_many([decoded[k] for k in dup_ix]))
        adpcm_fp: list[list[int]] = [[] for _ in range(len(ids))]
        for k, y in zip(dup_ix, rt):
            adpcm_fp[k] = audio_dsp.fingerprint(y).astype(np.int64).tolist()
        exp["fp_hashes_adpcm"] = adpcm_fp
    out = pd.DataFrame(
        {
            "clip_id": [f"clip-{int(i):012d}" for i in ids],
            "bytes": rows_bytes,
            "sr_hz": params["sr_hz"].astype(np.int32),
            "dur_ms": params["dur_ms"].astype(np.int32),
            "codec": [CODEC_CHOICES[int(c)] for c in params["codec_ix"]],
            "transcript": transcripts,
            "event_ts": [BASE_TS + dt.timedelta(milliseconds=int(m)) for m in params["ts_ms"]],
        }
    )
    if with_expected:
        out["n_samples"] = np.array(exp["n_samples"], dtype=np.int64)
        out["checksum16"] = np.array(exp["checksum16"], dtype=np.int64)
        out["voiced_ratio"] = np.array(exp["voiced_ratio"], dtype=np.float64)
        out["spectral_centroid"] = np.array(exp["spectral_centroid"], dtype=np.float64)
        out["rolloff85"] = np.array(exp["rolloff85"], dtype=np.float64)
        out["mfcc0_mean"] = np.array(exp["mfcc0_mean"], dtype=np.float64)
        out["mfcc1_mean"] = np.array(exp["mfcc1_mean"], dtype=np.float64)
        out["n_fp"] = np.array(exp["n_fp"], dtype=np.int64)
        out["fp_xor32"] = np.array(exp["fp_xor32"], dtype=np.int64)
        out["fp_hashes"] = exp["fp_hashes"]
        out["fp_hashes_adpcm"] = exp["fp_hashes_adpcm"]
    return out


def generate_clips(
    spark: SparkSession, n: int, seed: int = SEED, partitions: int | None = None
) -> DataFrame:
    """Distributed clip generation: ``spark.range(n)`` → ``mapInPandas``."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield clips_pdf(pdf["id"].to_numpy(), seed)

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=CLIPS_SCHEMA)


def write_clips(
    spark: SparkSession, out_dir: str, n: int, seed: int = SEED, files: int | None = None
) -> None:
    """Write the clips table as `files` parquet files (a file-per-trigger
    streaming source replays them in order)."""
    df = generate_clips(spark, n, seed, partitions=files)
    df.write.mode("overwrite").parquet(out_dir)


SENTINEL_CODEC = "_sentinel"


def write_sentinel(spark: SparkSession, out_dir: str, event_ts: dt.datetime | None = None) -> None:
    """Append one far-future sentinel row: on bounded input it pushes the
    watermark past every real window so append-mode aggregations flush
    (the reference nacks partial windows on shutdown for redelivery,
    buffer_system_window.go:403-448; a bounded Spark run instead closes
    them via the sentinel). Filter ``codec = '_sentinel'`` downstream."""
    ts = event_ts or (BASE_TS + dt.timedelta(days=365))
    row = pd.DataFrame(
        {
            "clip_id": ["clip-sentinel"],
            "bytes": [b""],
            "sr_hz": np.array([0], dtype=np.int32),
            "dur_ms": np.array([0], dtype=np.int32),
            "codec": [SENTINEL_CODEC],
            "transcript": [""],
            "event_ts": [ts],
        }
    )
    spark.createDataFrame(row, schema=CLIPS_SCHEMA).coalesce(1).write.mode("append").parquet(out_dir)


def split_clip_stream(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """FIXTURES F2: split into clip-side and transcript-side sub-streams
    for the stateful stream-stream join (≙ reference `sequence.sharded_join`,
    /root/reference/internal/impl/pure/input_sequence.go:144-157)."""
    clip_side = df.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "event_ts")
    transcript_side = df.select("clip_id", "transcript", "event_ts")
    return clip_side, transcript_side
