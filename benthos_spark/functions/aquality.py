"""Audio signal-quality metrics — the clip-side analog of the text
quality score (plans/catalog.py text_quality_docs).

A corpus-hygiene pass over recorded audio cuts on simple waveform
statistics before any expensive transcription: clipping (overdriven
input chains), DC offset (broken capture hardware), crest factor
(near-constant tones vs dynamic speech), and RMS level. All metrics
are closed-form float64 reductions over the decoded signal, so the
generation-time ground truth in the gate table (datagen/gate.py
``clips_quality``) and the query-side kernel reproduce each other
bit-for-bit — the reproduce-it-exactly contract shared with
functions/loudness.py / functions/vad.py / functions/pitch.py.

Reference parity: the reference moves audio as opaque bytes through
processors (/root/reference/internal/message/part.go); this is the
native-plugin surface a Benthos user would add for audio curation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

# |x| at or above this counts as clipped: full-scale int16 (32767)
# decodes to ~0.99997, and the datagen's overdriven clips saturate at
# 0.999 — both land above the threshold; ordinary content stays below.
CLIP_LEVEL = 0.98

QUALITY_FIELDS = (
    "peak double, rms_db double, crest_db double, clipped_frac double, "
    "dc_offset double"
)

_FLOOR_DB = -120.0


def quality_metrics(x: np.ndarray) -> tuple[float, float, float, float, float]:
    """(peak, rms_db, crest_db, clipped_frac, dc_offset) of float PCM.

    Silent clips report rms_db at the -120 dB floor and crest_db 0.0
    (documented sentinels — parquet/SQL aggregation-friendly)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) == 0:
        return 0.0, _FLOOR_DB, 0.0, 0.0, 0.0
    peak = float(np.max(np.abs(x)))
    rms = float(np.sqrt(np.mean(x * x)))
    rms_db = 20.0 * np.log10(rms) if rms > 0.0 else _FLOOR_DB
    rms_db = float(max(rms_db, _FLOOR_DB))
    crest_db = float(20.0 * np.log10(peak / rms)) if rms > 0.0 and peak > 0.0 else 0.0
    clipped = float(np.mean(np.abs(x) >= CLIP_LEVEL))
    dc = float(np.mean(x))
    return peak, rms_db, crest_db, clipped, dc


def quality_map_in_pandas(passthrough_cols: list[str]):
    """Arrow-batched kernel: decode each payload (functions/audio) and
    append QUALITY_FIELDS, rounded (4dp dB / 6dp fractions) for
    gate-stable hashing."""
    from benthos_spark.functions import audio as A

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c] for c in passthrough_cols}
            cols: dict[str, list] = {k: [] for k in ("peak", "rms_db", "crest_db", "clipped_frac", "dc_offset")}
            for i in range(len(pdf)):
                x = np.asarray(
                    A.decode(pdf["bytes"].iat[i], pdf["codec"].iat[i]), dtype=np.float64
                )
                peak, rms_db, crest_db, clipped, dc = quality_metrics(x)
                cols["peak"].append(round(peak, 6))
                cols["rms_db"].append(round(rms_db, 4))
                cols["crest_db"].append(round(crest_db, 4))
                cols["clipped_frac"].append(round(clipped, 6))
                cols["dc_offset"].append(round(dc, 6))
            for k, v in cols.items():
                out[k] = np.array(v, dtype=np.float64)
            yield pd.DataFrame(out)

    return fn
