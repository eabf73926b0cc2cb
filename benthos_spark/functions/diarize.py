"""Speaker diarization (lite) for audio-corpus curation.

A training-data pipeline over clip+transcript pairs needs to know *how
many voices* a clip carries and *how often they take turns*: single-
speaker read speech, two-speaker interviews, and crowd recordings get
routed to different curation paths (and multi-speaker clips usually
need transcript-side speaker tags before they are usable for ASR).

Classic unsupervised pipeline, all-deterministic and per-clip:

 1. segment     — energy-VAD utterance spans (functions/vad.py);
 2. embed       — per-segment spectral-envelope embedding: the mean
                  log-mel vector over the segment's frames, gain-
                  removed (a constant log-offset is loudness, not
                  identity) and L2-normalized;
 3. cluster     — average-linkage agglomerative clustering on cosine
                  distance with a stop threshold (the standard AHC
                  step of diarization systems; deterministic ties:
                  first-index pair wins);
 4. label       — clusters renumbered by first appearance in time,
                  so labels read as a turn sequence ("0,1,0,1").

Everything is float64 numpy with no RNG, so the generation-side ground
truth in the gate table (datagen/gate.py ``clips_diar``) and the query
side produce bit-identical values — the same reproduce-it-exactly
contract as functions/vad.py / loudness.py.

Scale: the whole pipeline is per-clip work inside one Arrow batch — no
shuffle, no state; 100 TB of clips diarize as a single mapInPandas
projection. Reference parity: the reference moves audio as opaque bytes
through processors (/root/reference/internal/message/part.go:8-11);
this is the pluggable-analysis surface a Benthos user would bolt on.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from benthos_spark.functions.audio_dsp import N_MELS, mel_filterbank, stft_mag
from benthos_spark.functions.vad import vad_segments

DIAR_FIELDS = (
    "n_segments long, n_speakers long, n_turns long, speech_ms long, "
    "turn_labels string"
)

# cosine-distance stop threshold for average-linkage merging; same-
# speaker segments of one clip sit well under it (shared harmonic
# envelope), different voices well over (measured margins in
# tests/test_diarize.py are >5x on both sides)
DEFAULT_AHC_THRESHOLD = 0.2


def segment_embedding(x: np.ndarray, sr: int, start_ms: int, end_ms: int) -> np.ndarray:
    """Gain-invariant spectral-envelope embedding of one segment: mean
    log-mel over the segment's frames, mean-removed, unit-normalized."""
    s0 = int(round(start_ms * sr / 1000.0))
    s1 = min(len(x), int(round(end_ms * sr / 1000.0)))
    mag = stft_mag(np.asarray(x[s0:s1], dtype=np.float64))
    if mag.shape[0] == 0:
        return np.zeros(N_MELS)
    fb = mel_filterbank(sr)
    v = np.log(mag @ fb.T + 1e-10).mean(axis=0)
    v = v - v.mean()  # log-domain gain removal
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def ahc_labels(emb: np.ndarray, threshold: float = DEFAULT_AHC_THRESHOLD) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance.

    Merges the closest cluster pair until the minimum average pairwise
    distance exceeds ``threshold``. Deterministic: distances are exact
    float64 functions of the embeddings and ``np.argmin`` tie-breaks to
    the first (lowest-index) pair. Returns labels renumbered by first
    appearance (time order), so the sequence doubles as a turn string."""
    n = len(emb)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # cosine distance matrix (embeddings are unit-norm)
    d = 1.0 - emb @ emb.T
    np.fill_diagonal(d, np.inf)
    members: list[list[int]] = [[i] for i in range(n)]
    labels = np.arange(n, dtype=np.int64)
    active = list(range(n))
    while len(active) > 1:
        sub = d[np.ix_(active, active)]
        k = int(np.argmin(sub))
        ai, aj = divmod(k, len(active))
        if sub[ai, aj] > threshold:
            break
        i, j = active[min(ai, aj)], active[max(ai, aj)]
        # average linkage: distance of the merged cluster to any other
        # cluster is the member-count-weighted mean of the parts
        ni, nj = len(members[i]), len(members[j])
        for o in active:
            if o in (i, j):
                continue
            d[i, o] = d[o, i] = (ni * d[i, o] + nj * d[j, o]) / (ni + nj)
        members[i].extend(members[j])
        labels[labels == j] = i
        active.remove(j)
    # renumber by first appearance in time order
    remap: dict[int, int] = {}
    out = np.empty(n, dtype=np.int64)
    for t, lab in enumerate(labels):
        if lab not in remap:
            remap[lab] = len(remap)
        out[t] = remap[lab]
    return out


def diarize_metrics(
    x: np.ndarray,
    sr: int,
    threshold_db: float = -35.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
    ahc_threshold: float = DEFAULT_AHC_THRESHOLD,
) -> tuple[int, int, int, int, str]:
    """(n_segments, n_speakers, n_turns, speech_ms, turn_labels) of a
    float PCM signal. ``n_turns`` counts adjacent-label changes in time
    order; ``turn_labels`` is the comma-joined label sequence."""
    segs = vad_segments(x, sr, threshold_db, min_silence_ms, min_speech_ms)
    if not segs:
        return 0, 0, 0, 0, ""
    emb = np.stack([segment_embedding(x, sr, s, e) for s, e in segs])
    labels = ahc_labels(emb, ahc_threshold)
    n_turns = int(np.count_nonzero(np.diff(labels))) if len(labels) > 1 else 0
    speech_ms = int(sum(e - s for s, e in segs))
    return (
        len(segs),
        int(labels.max()) + 1,
        n_turns,
        speech_ms,
        ",".join(str(int(v)) for v in labels),
    )


def diarize_map_in_pandas(
    passthrough_cols: list[str],
    threshold_db: float = -35.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
    ahc_threshold: float = DEFAULT_AHC_THRESHOLD,
):
    """``mapInPandas`` stage: decode → VAD → embed → cluster per clip.
    Output schema: passthrough + DIAR_FIELDS. Rows whose codec can't be
    decoded in this sandbox pass through with n_segments = -1 (never
    fail a batch on a foreign row — watermark-sentinel-safe, same
    contract as the augment processors)."""
    from benthos_spark.functions import audio as A

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_seg = np.full(n, -1, dtype=np.int64)
            n_spk = np.zeros(n, dtype=np.int64)
            n_trn = np.zeros(n, dtype=np.int64)
            sp_ms = np.zeros(n, dtype=np.int64)
            labs = [""] * n
            for i in range(n):
                try:
                    x = np.asarray(
                        A.decode(pdf["bytes"].iat[i], str(pdf["codec"].iat[i])),
                        dtype=np.float64,
                    )
                except Exception:
                    continue
                n_seg[i], n_spk[i], n_trn[i], sp_ms[i], labs[i] = diarize_metrics(
                    x,
                    int(pdf["sr_hz"].iat[i]),
                    threshold_db,
                    min_silence_ms,
                    min_speech_ms,
                    ahc_threshold,
                )
            out = pdf[passthrough_cols].copy()
            out["n_segments"] = n_seg
            out["n_speakers"] = n_spk
            out["n_turns"] = n_trn
            out["speech_ms"] = sp_ms
            out["turn_labels"] = labs
            yield out

    return fn
