"""Materialized gate tables for the DuckDB correctness oracle.

The audio/image/video catalog entries run over *synthesized* inputs
(datagen/clips.py, functions/multimodal.py) — there is no clips table in
``/root/testdata/sf*``, so round 1/2 could only rows-check them. This
module writes the SAME deterministic tables to parquet under
``<repo>/data/gate/<sf>/`` so that

- the Spark query reads the materialized parquet, and
- the oracle SQL reads the identical file via DuckDB ``read_parquet``,

turning the rows-only entries into hash-checked gate rows. The parquet
carries ground-truth columns computed at generation time (encoder-side
int16 checksums, arithmetic sample counts, pre-serialization luminance)
that the engine must reproduce at query time from the payload bytes
alone — see clips_pdf/images_pdf ``with_expected``.

Generation is pure numpy/pyarrow (no SparkSession) so `oracle_sql()` can
trigger it before any query runs; writes are atomic (tmp + rename) and
idempotent.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[2]
GATE_ROOT = REPO_ROOT / "data" / "gate"

# per-sf row counts (match the pre-round-3 _AUDIO_N / _IMG_N scaling)
SIZES = {
    "sf0.001": {"clips": 300, "images": 200, "videos": 50},
    "sf0.01": {"clips": 1200, "images": 800, "videos": 200},
}

_TABLES = (
    "clips",
    "images",
    "videos",
    "images_png",
    "images_webp",
    "clips_flac",
    "clips_lufs",
    "clips_vad",
    "clips_pitch",
    "clips_quality",
    "clips_augment",
    "videos_mjpeg",
    "videos_h264",
    "videos_h264c",
    "clips_diar",
    "clips_emb_topk",
    "clips_align",
)

# Bump when ground-truth columns change shape: stale gate parquet is
# deleted and regenerated (the VERSION marker file per sf dir).
GATE_VERSION = 14


def gate_sf_name(sf_dir: str) -> str | None:
    """The sf name for a testdata dir, or None if not a gated scale."""
    name = str(sf_dir).rstrip("/").rsplit("/", 1)[-1]
    return name if name in SIZES else None


def table_path(sf_name: str, table: str) -> str:
    return str(GATE_ROOT / sf_name / f"{table}.parquet")


def _write_atomic(pdf, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    # micros, not pandas' default nanos — Spark's vectorized reader
    # rejects TIMESTAMP(NANOS) parquet columns
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        tmp,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    os.replace(tmp, path)


def ensure_gate_tables(sf_name: str) -> None:
    """Generate any missing gate parquet for `sf_name` (idempotent)."""
    if sf_name not in SIZES:
        raise ValueError(f"no gate sizing for {sf_name!r}; known: {sorted(SIZES)}")
    sizes = SIZES[sf_name]
    version_file = GATE_ROOT / sf_name / "VERSION"
    try:
        on_disk = int(version_file.read_text().strip())
    except (OSError, ValueError):
        on_disk = 0
    if on_disk != GATE_VERSION:
        for t in _TABLES:  # stale ground-truth schema: regenerate all
            try:
                os.remove(table_path(sf_name, t))
            except OSError:
                pass
    elif all(os.path.exists(table_path(sf_name, t)) for t in _TABLES):
        return

    from benthos_spark.datagen.clips import clips_pdf
    from benthos_spark.functions.multimodal import images_pdf, videos_pdf

    p = table_path(sf_name, "clips")
    if not os.path.exists(p):
        ids = np.arange(sizes["clips"], dtype=np.int64)
        _write_atomic(clips_pdf(ids, with_expected=True), p)
    p = table_path(sf_name, "images")
    if not os.path.exists(p):
        ids = np.arange(sizes["images"], dtype=np.int64)
        _write_atomic(images_pdf(ids, with_expected=True), p)
    p = table_path(sf_name, "videos")
    if not os.path.exists(p):
        ids = np.arange(sizes["videos"], dtype=np.int64)
        _write_atomic(videos_pdf(ids), p)
    p = table_path(sf_name, "images_png")
    if not os.path.exists(p):
        # the same deterministic images, PNG-CONTAINER-encoded: the gate
        # then hash-checks a real container decode (functions/png.py)
        from benthos_spark.functions import png as _png

        ids = np.arange(sizes["images"] // 4, dtype=np.int64)
        pdf = images_pdf(ids, with_expected=True)
        blobs = []
        for i in range(len(pdf)):
            arr = np.frombuffer(pdf["bytes"].iat[i], dtype=np.uint8).reshape(
                pdf["height"].iat[i], pdf["width"].iat[i], pdf["channels"].iat[i]
            )
            blobs.append(_png.encode(arr))
        pdf["bytes"] = blobs
        pdf["codec"] = "png"
        _write_atomic(pdf, p)
    p = table_path(sf_name, "images_webp")
    if not os.path.exists(p):
        # the same deterministic images, lossless-WebP-encoded: the gate
        # then hash-checks a real VP8L container decode
        # (functions/webp.py) against pre-encode ground truth
        from benthos_spark.functions import webp as _webp

        ids = np.arange(sizes["images"] // 4, dtype=np.int64)
        pdf = images_pdf(ids, with_expected=True)
        blobs = []
        for i in range(len(pdf)):
            arr = np.frombuffer(pdf["bytes"].iat[i], dtype=np.uint8).reshape(
                pdf["height"].iat[i], pdf["width"].iat[i], pdf["channels"].iat[i]
            )
            blobs.append(_webp.encode(arr))
        pdf["bytes"] = blobs
        pdf["codec"] = "webp"
        _write_atomic(pdf, p)
    p = table_path(sf_name, "clips_flac")
    if not os.path.exists(p):
        # the deterministic reference signals, FLAC-CONTAINER-encoded:
        # checksum16/n_samples are computed from the PRE-ENCODE int16
        # samples, so the gate only matches on a real lossless decode
        import pandas as pd

        from benthos_spark.datagen.clips import clip_params, reference_signal
        from benthos_spark.functions import flac as _flac

        ids = np.arange(sizes["clips"] // 8, dtype=np.int64)
        params = clip_params(ids)
        rows = []
        for i in ids:
            sr = int(params["sr_hz"][i])
            dur = int(params["dur_ms"][i])
            sig = reference_signal(int(i), sr, dur)
            q = np.clip(np.rint(sig * 32767.0), -32768, 32767).astype(np.int16)
            rows.append(
                {
                    "clip_id": f"flac-{i:010d}",
                    "bytes": _flac.encode(q, sr),
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(dur),
                    "codec": "flac",
                    "n_samples": np.int64(len(q)),
                    "checksum16": np.int64(int(q.astype(np.int64).sum())),
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "clips_vad")
    if not os.path.exists(p):
        # energy-VAD ground truth: the reference signal with
        # DETERMINISTIC silence spans zeroed in (the bare signal is
        # continuously loud — real recordings aren't), encoded, decoded
        # back, and measured through the SAME float64 kernel the query
        # side uses (functions/vad.py) — gate matches only on bit-exact
        # decode + framing + energy reproduction.
        import pandas as pd

        from benthos_spark.datagen.clips import _hash_u01, clip_params, reference_signal
        from benthos_spark.functions import audio as A
        from benthos_spark.functions.vad import vad_metrics, vad_segments

        ids = np.arange(sizes["clips"] // 6, dtype=np.int64)
        params = clip_params(ids)
        rows = []
        for i in ids:
            sr = int(params["sr_hz"][i])
            dur = int(params["dur_ms"][i])
            codec = "wav" if i % 2 == 0 else "pcm_s16le"
            sig = reference_signal(int(i), sr, dur).copy()
            # two seeded silent spans, each 10-25% of the clip
            arr = np.array([int(i)], dtype=np.uint64)
            for k in range(2):
                off = _hash_u01(arr, 40 + 2 * k)[0]
                ln = 0.10 + 0.15 * _hash_u01(arr, 41 + 2 * k)[0]
                s0 = int(off * (1 - ln) * len(sig))
                sig[s0 : s0 + int(ln * len(sig))] = 0.0
            b = A.encode(sig, codec, sr)
            x = np.asarray(A.decode(b, codec), dtype=np.float64)
            nf, na, ams, lms, frac = vad_metrics(x, sr)
            segs = vad_segments(x, sr)
            rows.append(
                {
                    "clip_id": f"vad-{i:010d}",
                    "bytes": b,
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(dur),
                    "codec": codec,
                    "n_frames": np.int64(nf),
                    "n_active": np.int64(na),
                    "active_ms": np.int64(ams),
                    "longest_run_ms": np.int64(lms),
                    "active_frac": np.float64(round(frac, 6)),
                    "n_segments": np.int64(len(segs)),
                    "speech_ms": np.int64(sum(e - s for s, e in segs)),
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "clips_lufs")
    if not os.path.exists(p):
        # BS.1770 loudness ground truth: the gen side encodes the
        # reference signal, DECODES it back, and measures LUFS through
        # the same float path the query-side kernel uses — so the gate
        # matches only if decode + K-weighting + gating reproduce the
        # stored value bit-for-bit before the 4dp rounding.
        import pandas as pd

        from benthos_spark.datagen.clips import clip_params, reference_signal
        from benthos_spark.functions import audio as A
        from benthos_spark.functions import loudness as L

        ids = np.arange(sizes["clips"] // 6, dtype=np.int64)
        params = clip_params(ids)
        rows = []
        for i in ids:
            sr = int(params["sr_hz"][i])
            dur = int(params["dur_ms"][i])
            codec = "wav" if i % 2 == 0 else "pcm_s16le"
            sig = reference_signal(int(i), sr, dur)
            b = A.encode(sig, codec, sr)
            x = np.asarray(A.decode(b, codec), dtype=np.float64)
            li = float(np.round(L.integrated_lufs(x, sr), 4))
            lm = float(np.round(L.momentary_max_lufs(x, sr), 4))
            assert np.isfinite(li) and np.isfinite(lm), f"silent gate clip {i}"
            rows.append(
                {
                    "clip_id": f"lufs-{i:010d}",
                    "bytes": b,
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(dur),
                    "codec": codec,
                    "lufs_i": li,
                    "lufs_mmax": lm,
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "clips_pitch")
    if not os.path.exists(p):
        # pitch ground truth: HARMONIC clips (fundamental + 3 partials,
        # mild seeded vibrato — the shape a voiced signal actually has;
        # the standard reference_signal is deliberately inharmonic and
        # has no defined F0). f0_true is the synthesis parameter;
        # f0_med/voiced_frac are measured at generation time through
        # the SAME kernel the query runs (functions/pitch.py) AFTER an
        # encode→decode round trip, so the gate matches only on a
        # bit-exact decode + tracker reproduction, and pitch_ok proves
        # the tracker recovers the synthesis F0 within 2%.
        import pandas as pd

        from benthos_spark.datagen.clips import _hash_u01, clip_params
        from benthos_spark.functions import audio as A
        from benthos_spark.functions.pitch import pitch_stats

        ids = np.arange(sizes["clips"] // 6, dtype=np.int64)
        params = clip_params(ids)
        rows = []
        for i in ids:
            sr = int(params["sr_hz"][i])
            dur = max(300, int(params["dur_ms"][i]))
            codec = "wav" if i % 2 == 0 else "pcm_s16le"
            arr = np.array([int(i)], dtype=np.uint64)
            f0_true = 80.0 + _hash_u01(arr, 60)[0] * 320.0
            vib_rate = 2.0 + _hash_u01(arr, 61)[0] * 4.0
            vib_depth = 0.01 * _hash_u01(arr, 62)[0]
            n = int(round(sr * dur / 1000.0))
            t = np.arange(n, dtype=np.float64) / sr
            ph = 2 * np.pi * f0_true * (
                t + vib_depth * np.sin(2 * np.pi * vib_rate * t) / (2 * np.pi * vib_rate)
            )
            sig = sum(a * np.sin((k + 1) * ph) for k, a in enumerate((1.0, 0.5, 0.3, 0.2)))
            sig = 0.3 * sig / max(1e-9, np.abs(sig).max())
            b = A.encode(sig, codec, sr)
            x = np.asarray(A.decode(b, codec), dtype=np.float64)
            med, frac, nf = pitch_stats(x, sr)
            ok = med > 0 and abs(med / f0_true - 1.0) < 0.02
            assert ok, f"pitch tracker missed gate clip {i}: {med} vs {f0_true}"
            rows.append(
                {
                    "clip_id": f"pit-{i:010d}",
                    "bytes": b,
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(dur),
                    "codec": codec,
                    "f0_true": np.float64(round(f0_true, 4)),
                    "f0_med": np.float64(round(med, 4)),
                    "voiced_frac": np.float64(round(frac, 6)),
                    "n_pitch_frames": np.int64(nf),
                    # decoded sample count: the tempo entry's SQL side
                    # re-derives WSOLA's closed-form output length from it
                    "n_samples": np.int64(len(x)),
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "clips_quality")
    if not os.path.exists(p):
        # waveform-quality ground truth: a third of the clips overdriven
        # into clipping, a third quiet with a DC offset (the two classic
        # broken-capture signatures), a third untouched. Metrics are
        # measured at generation time through the SAME kernel the query
        # runs (functions/aquality.py) after the encode→decode round
        # trip — bit-exact reproduction or no hash match.
        import pandas as pd

        from benthos_spark.datagen.clips import clip_params, reference_signal
        from benthos_spark.functions import audio as A
        from benthos_spark.functions.aquality import quality_metrics

        ids = np.arange(sizes["clips"] // 6, dtype=np.int64)
        params = clip_params(ids)
        rows = []
        for i in ids:
            sr = int(params["sr_hz"][i])
            dur = int(params["dur_ms"][i])
            codec = "wav" if i % 2 == 0 else "pcm_s16le"
            sig = reference_signal(int(i), sr, dur)
            mode = int(i) % 3
            if mode == 1:  # overdriven input chain
                sig = np.clip(sig * 4.0, -0.999, 0.999)
            elif mode == 2:  # quiet capture with DC offset
                sig = np.clip(sig * 0.05 + 0.1, -0.999, 0.999)
            b = A.encode(sig, codec, sr)
            x = np.asarray(A.decode(b, codec), dtype=np.float64)
            peak, rms_db, crest_db, clipped, dc = quality_metrics(x)
            rows.append(
                {
                    "clip_id": f"qua-{i:010d}",
                    "bytes": b,
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(dur),
                    "codec": codec,
                    "mode": np.int32(mode),
                    "peak": np.float64(round(peak, 6)),
                    "rms_db": np.float64(round(rms_db, 4)),
                    "crest_db": np.float64(round(crest_db, 4)),
                    "clipped_frac": np.float64(round(clipped, 6)),
                    "dc_offset": np.float64(round(dc, 6)),
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "clips_augment")
    if not os.path.exists(p):
        # augmentation-chain ground truth: each payload is the plain
        # encoded reference signal; factor/gain_db/n_out/rms_db/
        # snr_meas_db are chain_stats of the DECODED payload measured at
        # generation time through the SAME kernel the query runs
        # (functions/augment.py — id-seeded speed→gain→noise→int16
        # round trip), so the gate matches only on bit-exact decode +
        # DSP + RNG reproduction. n_in feeds the SQL side's INDEPENDENT
        # closed-form resample-length check.
        import pandas as pd

        from benthos_spark.datagen.clips import clip_params, reference_signal
        from benthos_spark.functions import audio as A
        from benthos_spark.functions.augment import chain_stats, log_mel, speed_n_out

        ids = np.arange(sizes["clips"] // 6, dtype=np.int64)
        params = clip_params(ids)
        rows = []
        for i in ids:
            sr = int(params["sr_hz"][i])
            dur = int(params["dur_ms"][i])
            codec = "wav" if i % 2 == 0 else "pcm_s16le"
            cid = f"aug-{i:010d}"
            sig = reference_signal(int(i), sr, dur)
            b = A.encode(sig, codec, sr)
            x = np.asarray(A.decode(b, codec), dtype=np.float64)
            fac, g, n_out, rms, snr = chain_stats(x, sr, cid)
            assert n_out == speed_n_out(len(x), sr, fac), (i, n_out)
            assert abs(snr - 20.0) < 0.5, (i, snr)
            # per-clip log-mel partial sums, MICRO-SCALED TO INT64 so both
            # engines aggregate exactly (integer sums are order-independent;
            # float sums are not) — the CMVN-stats ground truth
            lm = log_mel(x, sr, n_mels=40)
            rows.append(
                {
                    "clip_id": cid,
                    "bytes": b,
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(dur),
                    "codec": codec,
                    "n_in": np.int64(len(x)),
                    "factor": np.float64(fac),
                    "gain_db": np.float64(g),
                    "n_out": np.int64(n_out),
                    "rms_db": np.float64(rms),
                    "snr_meas_db": np.float64(snr),
                    "mel_sum_u": np.int64(round(float(lm.sum()) * 1e6)),
                    "mel_sumsq_u": np.int64(round(float(np.square(lm).sum()) * 1e6)),
                    "mel_cells": np.int64(lm.size),
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "videos_mjpeg")
    if not os.path.exists(p):
        # the same deterministic videos, MJPEG-RIFF-AVI-encoded
        # (functions/avi.py): mean_lum is computed from the frames
        # BEFORE encoding, so the gate's tolerance check only passes on
        # a real container + JPEG decode; frame counts must be exact.
        ids = np.arange(sizes["videos"] // 4, dtype=np.int64)
        _write_atomic(videos_pdf(ids, codec="mjpeg", with_expected=True), p)
    p = table_path(sf_name, "clips_diar")
    if not os.path.exists(p):
        # diarization ground truth: clips with TWO planted "speakers" —
        # distinct harmonic envelopes (disjoint dominant partials, seeded
        # F0s in non-overlapping ranges) — alternating A,B,A,... with
        # 300 ms silences between turns. truth columns are synthesis
        # parameters (true_speakers/true_turns/true_labels); the measured
        # columns run the SAME kernel the query uses
        # (functions/diarize.py) after the encode→decode round trip, and
        # generation ASSERTS the kernel recovers the plant exactly, so
        # the gate proves decode + VAD + embedding + clustering
        # reproduction AND genuine speaker recovery.
        import pandas as pd

        from benthos_spark.datagen.clips import _hash_u01
        from benthos_spark.functions import audio as A
        from benthos_spark.functions.diarize import diarize_metrics

        ids = np.arange(sizes["clips"] // 6, dtype=np.int64)
        rows = []
        for i in ids:
            sr = 16000 if i % 2 == 0 else 8000
            codec = "wav" if i % 2 == 0 else "pcm_s16le"
            arr = np.array([int(i)], dtype=np.uint64)
            f0_a = 120.0 + _hash_u01(arr, 70)[0] * 60.0  # 120-180 Hz
            f0_b = 260.0 + _hash_u01(arr, 71)[0] * 80.0  # 260-340 Hz
            n_turns_true = 2 + int(_hash_u01(arr, 72)[0] * 4)  # 2-5 turns
            amps = {0: (1.0, 0.5, 0.25, 0.1), 1: (0.35, 1.0, 0.15, 0.6)}
            f0s = {0: f0_a, 1: f0_b}
            pieces = []
            labels = []
            for k in range(n_turns_true + 1):
                spk = k % 2
                dur_s = 0.4 + _hash_u01(arr, 73 + k)[0] * 0.3
                n = int(round(sr * dur_s))
                t = np.arange(n, dtype=np.float64) / sr
                sig = sum(
                    a * np.sin(2 * np.pi * f0s[spk] * (j + 1) * t + j)
                    for j, a in enumerate(amps[spk])
                )
                sig = 0.3 * sig / max(1e-9, np.abs(sig).max())
                pieces.append(sig)
                pieces.append(np.zeros(int(0.3 * sr)))
                labels.append(spk)
            x0 = np.concatenate(pieces[:-1])
            b = A.encode(x0, codec, sr)
            x = np.asarray(A.decode(b, codec), dtype=np.float64)
            n_seg, n_spk, n_trn, sp_ms, labs = diarize_metrics(x, sr)
            true_labs = ",".join(str(v) for v in labels)
            assert (n_seg, n_spk, n_trn, labs) == (
                len(labels),
                2,
                n_turns_true,
                true_labs,
            ), f"diarizer missed gate clip {i}: {(n_seg, n_spk, n_trn, labs)}"
            rows.append(
                {
                    "clip_id": f"dia-{i:010d}",
                    "bytes": b,
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(round(1000.0 * len(x) / sr)),
                    "codec": codec,
                    "true_speakers": np.int64(2),
                    "true_turns": np.int64(n_turns_true),
                    "true_labels": true_labs,
                    "n_segments": np.int64(n_seg),
                    "n_speakers": np.int64(n_spk),
                    "n_turns": np.int64(n_trn),
                    "speech_ms": np.int64(sp_ms),
                    "turn_labels": labs,
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "clips_align")
    if not os.path.exists(p):
        # word-alignment ground truth: the clips_vad construction (two
        # seeded silence spans) plus a seeded transcript; the alignment
        # digest columns run the SAME integer-ms kernel the query uses
        # (functions/align.py) after the encode→decode round trip, and
        # generation ASSERTS the structural invariants (every word
        # placed, monotone non-overlapping spans, every span inside a
        # VAD segment) so the gate proves decode + VAD + layout
        # reproduction AND a structurally valid alignment.
        import pandas as pd

        from benthos_spark.datagen.clips import (
            _hash_u01,
            clip_params,
            make_transcript,
            reference_signal,
        )
        from benthos_spark.functions import audio as A
        from benthos_spark.functions.align import align_words
        from benthos_spark.functions.vad import vad_segments

        ids = np.arange(sizes["clips"] // 6, dtype=np.int64)
        params = clip_params(ids)
        rows = []
        for i in ids:
            sr = int(params["sr_hz"][i])
            dur = int(params["dur_ms"][i])
            codec = "wav" if i % 2 == 0 else "pcm_s16le"
            transcript = make_transcript(int(i), dur)
            sig = reference_signal(int(i), sr, dur).copy()
            arr = np.array([int(i)], dtype=np.uint64)
            for k in range(2):
                off = _hash_u01(arr, 50 + 2 * k)[0]
                ln = 0.10 + 0.15 * _hash_u01(arr, 51 + 2 * k)[0]
                s0 = int(off * (1 - ln) * len(sig))
                sig[s0 : s0 + int(ln * len(sig))] = 0.0
            b = A.encode(sig, codec, sr)
            x = np.asarray(A.decode(b, codec), dtype=np.float64)
            words = align_words(x, sr, transcript)
            segs = vad_segments(x, sr)
            assert len(words) == len(transcript.split()), f"clip {i}: word dropped"
            prev_end = {-1: -1}
            for w, j, k2, s, e in words:
                assert s <= e, f"clip {i}: negative span"
                assert s >= prev_end.get(k2, -1), f"clip {i}: overlap in seg {k2}"
                prev_end[k2] = e
                if k2 >= 0:
                    ss, se = segs[k2]
                    assert ss <= s and e <= se, f"clip {i}: span outside segment"
            rows.append(
                {
                    "clip_id": f"aln-{i:010d}",
                    "bytes": b,
                    "sr_hz": np.int32(sr),
                    "dur_ms": np.int32(dur),
                    "codec": codec,
                    "transcript": transcript,
                    "n_words": np.int64(len(words)),
                    "n_segs_used": np.int64(len({k2 for _, _, k2, _, _ in words})),
                    "sum_start_ms": np.int64(sum(s for *_, s, _ in words)),
                    "sum_end_ms": np.int64(sum(e for *_, _, e in words)),
                    "map_digest": np.int64(
                        sum((j + 1) * (k2 + 2) for _, j, k2, _, _ in words)
                    ),
                }
            )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "clips_emb_topk")
    if not os.path.exists(p):
        # audio-similarity ground truth: clip-mean MFCC embeddings of
        # EVERY clip (decode → functions/audio_dsp.mfcc_mean, the same
        # kernel the query's mapInPandas stage runs), then brute-force
        # cosine top-5 for the 10 lexicographically-first clips. All
        # arithmetic mirrors the Spark plan exactly: dot products and
        # norms are sequential left folds (matching F.aggregate),
        # rounding is floor(x*1e4 + 0.5)/1e4 (the same floor expression
        # JVM-side). The only residual drift is ~1 ulp in the BLAS mel
        # matmul across processes, absorbed by the 4-decimal rounding.
        import math

        import pandas as pd

        from benthos_spark.functions import audio as A
        from benthos_spark.functions import audio_dsp

        clips = pd.read_parquet(table_path(sf_name, "clips"))
        embs: dict[str, np.ndarray] = {}
        for r in clips.itertuples():
            x = np.asarray(A.decode(r.bytes, r.codec), dtype=np.float64)
            embs[str(r.clip_id)] = audio_dsp.mfcc_mean(x, int(r.sr_hz))

        def fold_dot(a, b):
            s = 0.0
            for j in range(len(a)):
                s += float(a[j]) * float(b[j])
            return s

        ids_sorted = sorted(embs)
        norms = {cid: math.sqrt(fold_dot(v, v)) for cid, v in embs.items()}
        rows = []
        for qid in ids_sorted[:10]:
            qa = embs[qid]
            scored = []
            for cid in ids_sorted:
                if cid == qid:
                    continue
                cos = fold_dot(qa, embs[cid]) / (norms[qid] * norms[cid])
                scored.append((math.floor(cos * 10000.0 + 0.5) / 10000.0, cid))
            scored.sort(key=lambda t: (-t[0], t[1]))
            for rank, (cos_r, cid) in enumerate(scored[:5], 1):
                rows.append(
                    {
                        "q_id": qid,
                        "cand_id": cid,
                        "cos": np.float64(cos_r),
                        "rank": np.int32(rank),
                    }
                )
        _write_atomic(pd.DataFrame(rows), p)
    p = table_path(sf_name, "videos_h264")
    if not os.path.exists(p):
        # the same deterministic videos as a from-scratch Annex-B H.264
        # I_PCM stream (functions/h264.py): gray carriage is bit-exact,
        # so the gate requires the decoded mean_lum to reproduce the
        # pre-encode value EXACTLY (unlike mjpeg's lossy tolerance).
        ids = np.arange(sizes["videos"] // 4, dtype=np.int64)
        _write_atomic(videos_pdf(ids, codec="h264", with_expected=True), p)
    p = table_path(sf_name, "videos_h264c")
    if not os.path.exists(p):
        # round 5: ENTROPY-CODED streams (CAVLC Intra_4x4/Intra_16x16,
        # functions/h264_cavlc.py) with deterministic per-video noise so
        # residual coding is real. Lossy — the stored mean_lum is the
        # decoder-exact reconstruction computed at generation time from
        # the encoder's normative reconstruction loop, and the gate
        # requires the Spark-side decode to reproduce it EXACTLY.
        ids = np.arange(sizes["videos"] // 4, dtype=np.int64)
        _write_atomic(videos_pdf(ids, codec="h264_cavlc", with_expected=True), p)
    tmp_v = f"{version_file}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(tmp_v), exist_ok=True)
    with open(tmp_v, "w") as fh:
        fh.write(str(GATE_VERSION))
    os.replace(tmp_v, version_file)
