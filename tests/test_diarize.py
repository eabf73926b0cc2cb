"""Speaker diarization (functions/diarize.py, operators/audio.Diarize)."""

import numpy as np
import pandas as pd
import pytest

from benthos_spark.functions.diarize import (
    ahc_labels,
    diarize_metrics,
    segment_embedding,
)
from benthos_spark.functions.vad import vad_segments

SR = 16000


def _speaker(f0, amps, dur_s, sr=SR):
    n = int(sr * dur_s)
    t = np.arange(n, dtype=np.float64) / sr
    sig = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t + k) for k, a in enumerate(amps))
    return 0.3 * sig / np.abs(sig).max()


A_VOICE = lambda d: _speaker(150.0, (1.0, 0.5, 0.25, 0.1), d)
B_VOICE = lambda d: _speaker(310.0, (0.4, 1.0, 0.2, 0.6), d)
C_VOICE = lambda d: _speaker(500.0, (0.3, 0.6, 1.0, 0.8), d)


def _gap(d=0.3, sr=SR):
    return np.zeros(int(sr * d))


def _conversation(turns):
    pieces = []
    for fn, dur in turns:
        pieces.append(fn(dur))
        pieces.append(_gap())
    return np.concatenate(pieces[:-1])


def test_two_speakers_alternating():
    x = _conversation([(A_VOICE, 0.5), (B_VOICE, 0.6), (A_VOICE, 0.45), (B_VOICE, 0.5)])
    n_seg, n_spk, n_trn, sp_ms, labs = diarize_metrics(x, SR)
    assert (n_seg, n_spk, n_trn) == (4, 2, 3)
    assert labs == "0,1,0,1"
    assert sp_ms > 1500


def test_single_speaker_monologue():
    x = _conversation([(A_VOICE, 0.5), (A_VOICE, 0.4), (A_VOICE, 0.6)])
    n_seg, n_spk, n_trn, _, labs = diarize_metrics(x, SR)
    assert (n_seg, n_spk, n_trn) == (3, 1, 0)
    assert labs == "0,0,0"


def test_three_speakers():
    x = _conversation([(A_VOICE, 0.5), (B_VOICE, 0.5), (C_VOICE, 0.5), (A_VOICE, 0.5)])
    n_seg, n_spk, n_trn, _, labs = diarize_metrics(x, SR)
    assert (n_seg, n_spk, n_trn) == (4, 3, 3)
    assert labs == "0,1,2,0"


def test_silence_and_empty():
    assert diarize_metrics(np.zeros(SR), SR) == (0, 0, 0, 0, "")
    assert diarize_metrics(np.zeros(0), SR) == (0, 0, 0, 0, "")


def test_margins_are_wide():
    # same-speaker vs cross-speaker cosine distances sit >5x on either
    # side of the 0.2 threshold (the contract the gate relies on)
    x = _conversation([(A_VOICE, 0.5), (B_VOICE, 0.6), (A_VOICE, 0.45), (B_VOICE, 0.5)])
    segs = vad_segments(x, SR)
    emb = np.stack([segment_embedding(x, SR, s, e) for s, e in segs])
    d = 1.0 - emb @ emb.T
    assert d[0, 2] < 0.04 and d[1, 3] < 0.04
    assert min(d[0, 1], d[0, 3], d[1, 2]) > 0.25


def test_gain_invariance():
    # the same voice at -20 dB must embed to (numerically) the same point
    x = _conversation([(A_VOICE, 0.5), (lambda d: 0.1 * A_VOICE(d), 0.5)])
    n_seg, n_spk, _, _, labs = diarize_metrics(x, SR, threshold_db=-45.0)
    assert n_seg == 2 and n_spk == 1 and labs == "0,0"


def test_deterministic():
    x = _conversation([(A_VOICE, 0.5), (B_VOICE, 0.6), (C_VOICE, 0.5)])
    assert diarize_metrics(x, SR) == diarize_metrics(x, SR)


def test_ahc_labels_edge_cases():
    assert list(ahc_labels(np.zeros((0, 4)))) == []
    one = np.array([[1.0, 0.0]])
    assert list(ahc_labels(one)) == [0]
    # identical embeddings all merge
    same = np.tile(np.array([[0.6, 0.8]]), (5, 1))
    assert list(ahc_labels(same)) == [0] * 5


def test_ahc_first_appearance_renumber():
    # cluster structure B A B A — labels must come out 0 1 0 1 because
    # renumbering follows time order, whatever the merge order was
    a = np.array([1.0, 0.0])
    b = np.array([0.0, 1.0])
    emb = np.stack([b, a, b, a])
    assert list(ahc_labels(emb)) == [0, 1, 0, 1]


def test_map_in_pandas_and_foreign_codec(spark):
    from benthos_spark.functions import audio as A
    from benthos_spark.functions.diarize import DIAR_FIELDS, diarize_map_in_pandas

    x = _conversation([(A_VOICE, 0.5), (B_VOICE, 0.6)])
    pdf = pd.DataFrame(
        {
            "clip_id": ["c1", "c2"],
            "bytes": [A.encode(x, "wav", SR), b"\x00\x01garbage"],
            "sr_hz": np.array([SR, SR], dtype=np.int32),
            "codec": ["wav", "opus"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = df.mapInPandas(
        diarize_map_in_pandas(["clip_id"]), schema="clip_id string, " + DIAR_FIELDS
    )
    rows = {r.clip_id: r for r in out.collect()}
    assert rows["c1"].n_segments == 2
    assert rows["c1"].n_speakers == 2
    assert rows["c1"].turn_labels == "0,1"
    # foreign codec passes through instead of failing the batch
    assert rows["c2"].n_segments == -1


def test_config_wired_processor(spark):
    from benthos_spark.config import _proc
    from benthos_spark.functions import audio as A

    x = _conversation([(A_VOICE, 0.5), (B_VOICE, 0.6), (A_VOICE, 0.5)])
    pdf = pd.DataFrame(
        {
            "clip_id": ["c1"],
            "bytes": [A.encode(x, "wav", SR)],
            "sr_hz": np.array([SR], dtype=np.int32),
            "codec": ["wav"],
        }
    )
    df = spark.createDataFrame(pdf)
    p = _proc({"diarize": {}})
    row = p(df).collect()[0]
    assert row.n_speakers == 2 and row.n_turns == 2 and row.turn_labels == "0,1,0"
