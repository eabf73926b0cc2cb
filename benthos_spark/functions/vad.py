"""Energy-based voice-activity detection (VAD) for audio curation.

A training-data pipeline's speech-side analog of the text quality
filters: clips with too little activity (dead air, failed recordings)
or pathological run structure get cut before transcription/training.
This is the classic frame-energy detector (the ETSI/WebRTC "energy
first stage"): RMS per 25 ms frame at a 10 ms hop, active iff the frame
is louder than an absolute dBFS threshold; metrics summarize the
active-frame mask.

Everything is vectorized numpy (frame energies via one cumulative sum,
run lengths via one diff), float64 end-to-end, so the generation-side
ground truth in the gate table (datagen/gate.py ``clips_vad``) and the
query-side kernel produce bit-identical values — the same
reproduce-it-exactly contract as functions/loudness.py.

Reference parity: the reference has no DSP (audio flows through opaque
processors); this extends its pipeline surface the way a Benthos user
would with a native plugin.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

FRAME_MS = 25
HOP_MS = 10

VAD_FIELDS = (
    "n_frames long, n_active long, active_ms long, longest_run_ms long, "
    "active_frac double"
)


def vad_metrics(
    x: np.ndarray, sr: int, threshold_db: float = -35.0
) -> tuple[int, int, int, int, float]:
    """(n_frames, n_active, active_ms, longest_run_ms, active_frac) of a
    float PCM signal. Frames shorter than FRAME_MS at the tail are
    dropped (standard framing); a clip shorter than one frame is one
    all-or-nothing frame."""
    x = np.asarray(x, dtype=np.float64)
    frame = max(1, int(round(sr * FRAME_MS / 1000.0)))
    hop = max(1, int(round(sr * HOP_MS / 1000.0)))
    if len(x) < frame:
        e = float(np.mean(x * x)) if len(x) else 0.0
        active = e > 10.0 ** (threshold_db / 10.0)
        ms = int(round(1000.0 * len(x) / sr)) if len(x) else 0
        return 1, int(active), ms if active else 0, ms if active else 0, float(active)
    n_frames = 1 + (len(x) - frame) // hop
    c = np.concatenate([[0.0], np.cumsum(x * x)])
    starts = np.arange(n_frames, dtype=np.int64) * hop
    energy = (c[starts + frame] - c[starts]) / frame
    active = energy > 10.0 ** (threshold_db / 10.0)
    n_active = int(active.sum())
    # longest True run via the edges of the padded mask
    padded = np.concatenate([[False], active, [False]])
    edges = np.nonzero(np.diff(padded.view(np.int8)))[0]
    runs = edges[1::2] - edges[0::2]
    longest = int(runs.max()) if len(runs) else 0
    return (
        n_frames,
        n_active,
        n_active * HOP_MS,
        longest * HOP_MS,
        float(n_active / n_frames),
    )


def vad_map_in_pandas(passthrough_cols: list[str], threshold_db: float = -35.0):
    """Arrow-batched kernel: decode each payload (functions/audio) and
    measure the VAD metrics — schema = passthrough + VAD_FIELDS."""
    from benthos_spark.functions import audio as A

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c] for c in passthrough_cols}
            nf, na, ams, lms, frac = [], [], [], [], []
            for b, codec, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"]):
                x = np.asarray(A.decode(bytes(b), str(codec)), dtype=np.float64)
                r = vad_metrics(x, int(sr), threshold_db)
                nf.append(r[0])
                na.append(r[1])
                ams.append(r[2])
                lms.append(r[3])
                frac.append(r[4])
            out["n_frames"] = np.array(nf, dtype=np.int64)
            out["n_active"] = np.array(na, dtype=np.int64)
            out["active_ms"] = np.array(ams, dtype=np.int64)
            out["longest_run_ms"] = np.array(lms, dtype=np.int64)
            out["active_frac"] = np.array(frac, dtype=np.float64)
            yield pd.DataFrame(out)

    return fn


def _active_mask(x: np.ndarray, sr: int, threshold_db: float = -35.0) -> np.ndarray:
    """The per-frame activity mask vad_metrics summarizes (same framing:
    FRAME_MS window, HOP_MS hop, mean-power threshold)."""
    x = np.asarray(x, dtype=np.float64)
    frame = max(1, int(round(sr * FRAME_MS / 1000.0)))
    hop = max(1, int(round(sr * HOP_MS / 1000.0)))
    if len(x) < frame:
        e = float(np.mean(x * x)) if len(x) else 0.0
        return np.array([e > 10.0 ** (threshold_db / 10.0)])
    n_frames = 1 + (len(x) - frame) // hop
    c = np.concatenate([[0.0], np.cumsum(x * x)])
    starts = np.arange(n_frames, dtype=np.int64) * hop
    energy = (c[starts + frame] - c[starts]) / frame
    return energy > 10.0 ** (threshold_db / 10.0)


def vad_segments(
    x: np.ndarray,
    sr: int,
    threshold_db: float = -35.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
) -> list[tuple[int, int]]:
    """Utterance boundaries: (start_ms, end_ms) spans of speech.

    Active frame runs separated by silence shorter than
    ``min_silence_ms`` merge into one utterance; merged runs shorter
    than ``min_speech_ms`` are dropped. Boundaries are frame-accurate:
    start = first active frame's start, end = last active frame's start
    + FRAME_MS, capped at the clip length. Vectorized run logic (one
    diff over the padded mask; one pass over the run list — runs are
    bounded by the clip's utterance count, not its sample count)."""
    active = _active_mask(x, sr, threshold_db)
    padded = np.concatenate([[False], active, [False]])
    edges = np.nonzero(np.diff(padded.view(np.int8)))[0]
    starts_f, ends_f = edges[0::2], edges[1::2]  # [start, end) in frames
    if len(starts_f) == 0:
        return []
    clip_ms = int(round(1000.0 * len(x) / sr))
    min_sil_f = max(1, int(np.ceil(min_silence_ms / HOP_MS)))
    merged: list[list[int]] = [[int(starts_f[0]), int(ends_f[0])]]
    for s, e in zip(starts_f[1:], ends_f[1:]):
        if int(s) - merged[-1][1] < min_sil_f:
            merged[-1][1] = int(e)
        else:
            merged.append([int(s), int(e)])
    out = []
    for s, e in merged:
        start_ms = s * HOP_MS
        end_ms = min((e - 1) * HOP_MS + FRAME_MS, clip_ms)
        if end_ms - start_ms >= min_speech_ms:
            out.append((start_ms, end_ms))
    return out


SEGMENT_FIELDS = (
    "segment_id string, bytes binary, sr_hz int, codec string, "
    "start_ms long, end_ms long, dur_ms long"
)


def segment_map_in_pandas(
    id_col: str = "clip_id",
    threshold_db: float = -35.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
):
    """Clip → utterances UDTF (``mapInPandas`` as table function, the
    audio analog of video frame sampling): decode each payload, find
    speech spans (vad_segments), slice them out, and re-encode each
    utterance with the clip's own codec. Output schema: SEGMENT_FIELDS
    (segment_id = `<id>#sNN`)."""
    from benthos_spark.functions import audio as A

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, srs, codecs, sms, ems, dms = [], [], [], [], [], [], []
            for i in range(len(pdf)):
                codec = str(pdf["codec"].iat[i])
                sr = int(pdf["sr_hz"].iat[i])
                x = np.asarray(A.decode(pdf["bytes"].iat[i], codec), dtype=np.float64)
                segs = vad_segments(x, sr, threshold_db, min_silence_ms, min_speech_ms)
                for k, (s_ms, e_ms) in enumerate(segs):
                    s0 = int(round(s_ms * sr / 1000.0))
                    s1 = min(len(x), int(round(e_ms * sr / 1000.0)))
                    ids.append(f"{pdf[id_col].iat[i]}#s{k:03d}")
                    blobs.append(A.encode(x[s0:s1], codec, sr))
                    srs.append(sr)
                    codecs.append(codec)
                    sms.append(s_ms)
                    ems.append(e_ms)
                    dms.append(e_ms - s_ms)
            yield pd.DataFrame(
                {
                    "segment_id": ids,
                    "bytes": blobs,
                    "sr_hz": np.array(srs, dtype=np.int32),
                    "codec": codecs,
                    "start_ms": np.array(sms, dtype=np.int64),
                    "end_ms": np.array(ems, dtype=np.int64),
                    "dur_ms": np.array(dms, dtype=np.int64),
                }
            )

    return fn
