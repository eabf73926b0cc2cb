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
