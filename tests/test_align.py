"""Transcript word alignment (functions/align.py, AlignTranscript)."""

import numpy as np
import pandas as pd

from benthos_spark.functions.align import _word_weights, align_words
from benthos_spark.functions.vad import vad_segments

SR = 16000


def _tone(dur_s, f=440.0):
    t = np.arange(int(SR * dur_s)) / SR
    return 0.3 * np.sin(2 * np.pi * f * t)


def _gap(dur_s=0.3):
    return np.zeros(int(SR * dur_s))


def test_single_segment_proportional_layout():
    x = _tone(1.0)
    out = align_words(x, SR, "a bb cccc")
    assert [w for w, *_ in out] == ["a", "bb", "cccc"]
    assert [j for _, j, *_ in out] == [0, 1, 2]
    # all in segment 0, monotone, proportional: 'cccc' gets the longest span
    assert all(k == 0 for _, _, k, _, _ in out)
    spans = [(s, e) for *_, s, e in out]
    assert spans[0][0] == 0 or spans[0][0] >= 0
    assert spans[0][1] <= spans[1][0] + 1
    durs = [e - s for s, e in spans]
    assert durs[2] > durs[0]


def test_words_never_land_in_silence():
    x = np.concatenate([_tone(0.6), _gap(0.5), _tone(0.8)])
    segs = vad_segments(x, SR)
    assert len(segs) == 2
    out = align_words(x, SR, "one two three four five six")
    assert len(out) == 6
    used = set()
    for w, j, k, s, e in out:
        ss, se = segs[k]
        assert ss <= s <= e <= se, (w, s, e, segs)
        used.add(k)
    assert used == {0, 1}  # words spread across both speech spans


def test_no_speech_pseudo_segment():
    out = align_words(np.zeros(SR), SR, "hello world")
    assert len(out) == 2
    assert all(k == -1 for _, _, k, _, _ in out)
    assert out[0][3] >= 0 and out[1][4] <= 1000


def test_empty_transcript_and_empty_audio():
    assert align_words(_tone(1.0), SR, "") == []
    assert align_words(_tone(1.0), SR, "   ") == []
    out = align_words(np.zeros(0), SR, "x y")
    assert len(out) == 2


def test_deterministic_and_monotone():
    x = np.concatenate([_tone(0.5), _gap(), _tone(0.4), _gap(), _tone(0.7)])
    tr = "the quick brown fox jumps over the lazy dog again and again"
    a = align_words(x, SR, tr)
    assert a == align_words(x, SR, tr)
    # global monotonicity on (seg_idx, start)
    keys = [(k, s) for _, _, k, s, _ in a]
    assert keys == sorted(keys)
    # no overlap within a segment
    last_end: dict[int, int] = {}
    for _, _, k, s, e in a:
        assert s >= last_end.get(k, -1)
        last_end[k] = e


def test_word_weights_punct_min():
    assert _word_weights(["a", "bb,", "—", "Hello."]) == [2, 3, 2, 6]


def test_udtf_and_config_wiring(spark):
    from benthos_spark.config import _proc
    from benthos_spark.functions import audio as A

    x = np.concatenate([_tone(0.6), _gap(0.5), _tone(0.8)])
    pdf = pd.DataFrame(
        {
            "clip_id": ["c1", "bad"],
            "bytes": [A.encode(x, "wav", SR), b"\x00"],
            "sr_hz": np.array([SR, SR], dtype=np.int32),
            "codec": ["wav", "opus"],
            "transcript": ["alpha beta gamma", "x"],
        }
    )
    df = spark.createDataFrame(pdf)
    p = _proc({"align_transcript": {}})
    rows = p(df).collect()
    # foreign codec emits no rows; c1 emits one row per word
    assert sorted(r.word for r in rows) == ["alpha", "beta", "gamma"]
    assert all(r.clip_id == "c1" for r in rows)
    local = align_words(np.asarray(A.decode(A.encode(x, "wav", SR), "wav"), dtype=np.float64), SR, "alpha beta gamma")
    got = sorted((r.word, r.word_idx, r.seg_idx, r.start_ms, r.end_ms) for r in rows)
    assert got == sorted(local)
