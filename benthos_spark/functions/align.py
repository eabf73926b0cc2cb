"""Transcript-to-audio word alignment (forced-alignment-lite).

ASR corpus builds need per-word timestamps: to split long recordings
into training utterances, to attach transcript spans to VAD segments,
and to sanity-gate clips whose transcript can't plausibly fit their
speech. Full forced alignment needs an acoustic model; the standard
model-free baseline (what alignment toolkits fall back to, and what
uniform-segmentation bootstrapping uses) is PROPORTIONAL alignment:

 1. energy-VAD speech spans (functions/vad.py) define the speech
    timeline — silence carries no words;
 2. each whitespace token gets a slice of that timeline proportional
    to its visible length (longer words take longer to say — the
    letter-rate approximation);
 3. virtual speech-timeline boundaries map back through the segment
    list to real clip milliseconds, so every word lands INSIDE a
    speech span and words never overlap.

All integer-ms arithmetic (cumulative weights, floor division), so
generation-side gate truth reproduces bit-exactly on the query side —
the same contract as functions/vad.py / diarize.py.

Scale: per-clip work inside one Arrow batch (the UDTF explodes a clip
row into word rows) — no shuffle, no state. Reference parity: the
reference moves payloads opaquely (internal/message/part.go:8-11);
this is pipeline surface a Benthos user adds for speech curation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from benthos_spark.functions.vad import vad_segments

ALIGN_FIELDS = (
    "word string, word_idx int, seg_idx int, start_ms long, end_ms long"
)


def _word_weights(words: list[str]) -> list[int]:
    """Visible length of each token (alnum chars, min 1) + 1 for the
    inter-word gap — the letter-rate duration proxy."""
    return [max(1, sum(ch.isalnum() for ch in w)) + 1 for w in words]


def align_words(
    x: np.ndarray,
    sr: int,
    transcript: str,
    threshold_db: float = -35.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
) -> list[tuple[str, int, int, int, int]]:
    """(word, word_idx, seg_idx, start_ms, end_ms) for every whitespace
    token of ``transcript``, with timestamps in real clip milliseconds.

    Words are laid out on the concatenated-speech timeline
    proportionally to their visible length, then mapped back through
    the VAD segment list. ``seg_idx`` is the segment containing the
    word's start. A clip with no detected speech aligns over the whole
    clip as one pseudo-segment (seg_idx -1) rather than dropping the
    transcript."""
    words = transcript.split()
    if not words:
        return []
    clip_ms = int(round(1000.0 * len(x) / sr)) if len(x) else 0
    segs = vad_segments(x, sr, threshold_db, min_silence_ms, min_speech_ms)
    pseudo = not segs
    if pseudo:
        segs = [(0, max(clip_ms, len(words)))]
    total = sum(e - s for s, e in segs)
    weights = _word_weights(words)
    wsum = sum(weights)
    # virtual boundaries on the concatenated speech timeline, floor'd —
    # monotone non-decreasing by construction
    bounds = [0]
    acc = 0
    for w in weights:
        acc += w
        bounds.append((total * acc) // wsum)
    # segment offsets on the virtual timeline
    seg_starts_virt = []
    run = 0
    for s, e in segs:
        seg_starts_virt.append(run)
        run += e - s

    def to_real(v: int) -> tuple[int, int]:
        """virtual speech-ms -> (seg_idx, real clip ms)."""
        k = 0
        for i, sv in enumerate(seg_starts_virt):
            if v >= sv:
                k = i
            else:
                break
        s, e = segs[k]
        return k, min(s + (v - seg_starts_virt[k]), e)

    out = []
    for j, w in enumerate(words):
        k0, start = to_real(bounds[j])
        k1, end = to_real(max(bounds[j + 1] - 1, bounds[j]))
        if k1 != k0:
            # the proportional span straddles a silence gap: a word is
            # attributed to the segment containing its start, so clamp
            # its end there rather than letting it span the silence
            end = segs[k0][1]
        out.append((w, j, -1 if pseudo else k0, start, max(end, start)))
    return out


def align_map_in_pandas(
    id_col: str = "clip_id",
    transcript_col: str = "transcript",
    threshold_db: float = -35.0,
    min_silence_ms: int = 200,
    min_speech_ms: int = 100,
):
    """Clip → word rows UDTF (``mapInPandas`` as table function): decode
    each payload, align its transcript, emit one row per word. Output
    schema: ``<id_col> string, `` + ALIGN_FIELDS. Undecodable payloads
    emit no rows (never fail a batch on a foreign row)."""
    from benthos_spark.functions import audio as A

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, wi, si, sm, em = [], [], [], [], [], []
            for i in range(len(pdf)):
                try:
                    x = np.asarray(
                        A.decode(pdf["bytes"].iat[i], str(pdf["codec"].iat[i])),
                        dtype=np.float64,
                    )
                except Exception:
                    continue
                rows = align_words(
                    x,
                    int(pdf["sr_hz"].iat[i]),
                    str(pdf[transcript_col].iat[i]),
                    threshold_db,
                    min_silence_ms,
                    min_speech_ms,
                )
                for w, j, k, s, e in rows:
                    ids.append(pdf[id_col].iat[i])
                    ws.append(w)
                    wi.append(j)
                    si.append(k)
                    sm.append(s)
                    em.append(e)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "word": ws,
                    "word_idx": np.array(wi, dtype=np.int32),
                    "seg_idx": np.array(si, dtype=np.int32),
                    "start_ms": np.array(sm, dtype=np.int64),
                    "end_ms": np.array(em, dtype=np.int64),
                }
            )

    return fn
