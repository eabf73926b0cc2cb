"""Energy-VAD (functions/vad.py) + VadMeasure/VadGate processors — the
speech-curation cut a training pipeline runs before transcription."""

from __future__ import annotations

import numpy as np
import pytest

from benthos_spark.functions import audio as A
from benthos_spark.functions.vad import FRAME_MS, HOP_MS, vad_metrics
from benthos_spark.operators.audio import VadGate, VadMeasure


def _sig(sr=16000, secs=2.0, spans=((0.25, 0.5),)):
    """A loud sine with silent spans (fractions of the clip)."""
    n = int(sr * secs)
    x = 0.5 * np.sin(2 * np.pi * 300.0 * np.arange(n) / sr)
    for a, b in spans:
        x[int(a * n) : int(b * n)] = 0.0
    return x


def test_vad_metrics_basics():
    sr = 16000
    # fully loud: every frame active; longest run == all frames
    x = _sig(sr, 1.0, spans=())
    nf, na, ams, lms, frac = vad_metrics(x, sr)
    assert nf == 1 + (len(x) - int(sr * FRAME_MS / 1000)) // int(sr * HOP_MS / 1000)
    assert na == nf and frac == 1.0 and lms == nf * HOP_MS

    # fully silent: nothing active
    nf2, na2, ams2, lms2, frac2 = vad_metrics(np.zeros(sr), sr)
    assert (na2, ams2, lms2, frac2) == (0, 0, 0, 0.0)

    # a 25% silent span knocks out ~25% of frames
    x3 = _sig(sr, 2.0, spans=((0.25, 0.5),))
    nf3, na3, _, lms3, frac3 = vad_metrics(x3, sr)
    assert 0.70 < frac3 < 0.80
    # longest run is the second half (~50% of frames)
    assert 0.45 * nf3 * HOP_MS < lms3 < 0.60 * nf3 * HOP_MS

    # threshold moves the decision: at -90 dBFS even faint noise counts
    x4 = 0.001 * np.sin(2 * np.pi * 300.0 * np.arange(sr) / sr)
    assert vad_metrics(x4, sr, threshold_db=-35.0)[4] == 0.0
    assert vad_metrics(x4, sr, threshold_db=-90.0)[4] == 1.0

    # shorter than one frame: all-or-nothing single frame
    assert vad_metrics(np.full(10, 0.5), sr)[0] == 1


_SCHEMA = "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"


def _rows():
    sr = 16000
    rows = []
    specs = {
        "mostly_speech": ((0.8, 0.9),),
        "half_dead": ((0.0, 0.5),),
        "dead_air": ((0.0, 1.0),),
    }
    for cid, spans in specs.items():
        x = _sig(sr, 2.0, spans=spans)
        rows.append((cid, A.encode(x, "wav", sr), sr, 2000, "wav"))
    return rows


def test_vad_measure_appends_and_keeps_payload(spark):
    df = spark.createDataFrame(_rows(), _SCHEMA)
    out = VadMeasure()(df)
    rows = {r.clip_id: r for r in out.collect()}
    assert set(out.columns) == set(df.columns) | {
        "n_frames", "n_active", "active_ms", "longest_run_ms", "active_frac"
    }
    orig = {r[0]: r[1] for r in _rows()}
    for cid, r in rows.items():
        assert bytes(r.bytes) == orig[cid]
    assert rows["mostly_speech"].active_frac > 0.85
    assert 0.4 < rows["half_dead"].active_frac < 0.6
    assert rows["dead_air"].active_frac == 0.0


def test_vad_gate_filters(spark):
    df = spark.createDataFrame(_rows(), _SCHEMA)
    kept = VadGate(min_active_frac=0.7, drop_measures=True)(df)
    assert [r.clip_id for r in kept.collect()] == ["mostly_speech"]
    assert set(kept.columns) == set(df.columns)
    # longest-run floor: half_dead still has a ~1s continuous run
    kept2 = VadGate(min_longest_run_ms=800)(df)
    assert sorted(r.clip_id for r in kept2.collect()) == ["half_dead", "mostly_speech"]
    with pytest.raises(ValueError):
        VadGate()


def test_vad_config_wiring(spark):
    from benthos_spark.config import _proc

    p = _proc({"vad_gate": {"min_active_frac": 0.7, "drop_measures": True}})
    df = spark.createDataFrame(_rows(), _SCHEMA)
    assert [r.clip_id for r in p(df).collect()] == ["mostly_speech"]
    p2 = _proc({"vad_measure": {"threshold_db": -90.0}})
    out = {r.clip_id: r.active_frac for r in p2(df).collect()}
    assert out["dead_air"] == 0.0  # true zeros stay inactive at any threshold
