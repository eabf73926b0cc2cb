"""Audio processors for the streaming engine.

The reference treats audio payloads as opaque parts flowing through
processor chains (internal/message/part.go payload + Bloblang stages);
a training-data pipeline over clips needs first-class audio gates the
way text pipelines need quality filters. ``LoudnessGate`` is the audio
analog of the text quality score (plans/catalog.py text_quality_docs):
decode each clip, measure BS.1770-4 loudness (functions/loudness.py),
and drop clips outside the target range — the standard corpus-hygiene
cut for ASR/TTS training data (near-silent or clipping-hot clips).

Both stages are stateless Arrow ``mapInPandas`` kernels over the
standard clip schema (clip_id, bytes, sr_hz, dur_ms, codec, …), so they
are streaming-safe, scale linearly with input partitions, and never
shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from benthos_spark.operators.processors import Processor


@dataclass
class LoudnessMeasure(Processor):
    """Append ``lufs_i`` (integrated) and ``lufs_mmax`` (max momentary)
    BS.1770-4 loudness columns by decoding the payload per row inside an
    Arrow batch. Column names are configurable; everything else passes
    through unchanged (including the payload bytes)."""

    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.loudness import loudness_map_in_pandas

        renames = {self.bytes_col: "bytes", self.codec_col: "codec", self.sr_col: "sr_hz"}
        work = df
        for src, dst in renames.items():
            if src != dst:
                work = work.withColumnRenamed(src, dst)
        passthrough = list(work.columns)
        schema = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in work.schema.fields)
            + ", lufs_i double, lufs_mmax double"
        )
        out = work.mapInPandas(loudness_map_in_pandas(passthrough), schema=schema)
        for src, dst in renames.items():
            if src != dst:
                out = out.withColumnRenamed(dst, src)
        return out


@dataclass
class LoudnessNormalize(Processor):
    """Re-gain every clip to a target integrated loudness (the standard
    corpus-normalization pass before ASR/TTS training: BS.1770 measure →
    linear gain → re-encode with the clip's own codec). Gain is capped
    at ``max_gain_db`` so near-silence is not blown up into noise, and
    the scaled signal hard-clips at full scale (int16 codecs saturate
    anyway — the cap is there to keep that rare). Adds ``gain_db``;
    payload bytes are REPLACED. Stateless Arrow ``mapInPandas``."""

    target_lufs: float = -23.0  # EBU R 128 programme target
    max_gain_db: float = 30.0
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        import numpy as np

        target = float(self.target_lufs)
        cap = float(self.max_gain_db)
        renames = {self.bytes_col: "bytes", self.codec_col: "codec", self.sr_col: "sr_hz"}
        work = df
        for src, dst in renames.items():
            if src != dst:
                work = work.withColumnRenamed(src, dst)
        cols = list(work.columns)
        schema = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in work.schema.fields)
            + ", gain_db double"
        )

        def fn(batches):
            import pandas as pd

            from benthos_spark.functions import audio as A
            from benthos_spark.functions.loudness import integrated_lufs

            for pdf in batches:
                n = len(pdf)
                payloads = []
                gains = np.empty(n, dtype=np.float64)
                for i in range(n):
                    codec = pdf["codec"].iat[i]
                    fs = int(pdf["sr_hz"].iat[i])
                    x = np.asarray(A.decode(pdf["bytes"].iat[i], codec), dtype=np.float64)
                    li = integrated_lufs(x, fs)
                    g = 0.0 if not np.isfinite(li) else min(target - li, cap)
                    y = np.clip(x * (10.0 ** (g / 20.0)), -1.0, 1.0)
                    payloads.append(A.encode(y, codec, fs))
                    gains[i] = g
                out = {c: pdf[c] for c in cols}
                out["bytes"] = pd.Series(payloads, dtype=object)
                out["gain_db"] = np.round(gains, 4)
                yield pd.DataFrame(out)

        out = work.mapInPandas(fn, schema=schema)
        for src, dst in renames.items():
            if src != dst:
                out = out.withColumnRenamed(dst, src)
        return out


@dataclass
class LoudnessGate(Processor):
    """Filter clips to a loudness range: keep ``min_lufs <= lufs_i <=
    max_lufs`` (either bound optional). ``drop_measures=True`` removes
    the measurement columns afterwards so the payload schema is
    unchanged — a pure gate."""

    min_lufs: float | None = None
    max_lufs: float | None = None
    drop_measures: bool = False
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __post_init__(self):
        if self.min_lufs is None and self.max_lufs is None:
            raise ValueError("loudness_gate needs min_lufs and/or max_lufs")

    def __call__(self, df: DataFrame) -> DataFrame:
        out = LoudnessMeasure(self.bytes_col, self.codec_col, self.sr_col)(df)
        cond = F.lit(True)
        if self.min_lufs is not None:
            cond = cond & (F.col("lufs_i") >= F.lit(float(self.min_lufs)))
        if self.max_lufs is not None:
            cond = cond & (F.col("lufs_i") <= F.lit(float(self.max_lufs)))
        out = out.filter(cond)
        if self.drop_measures:
            out = out.drop("lufs_i", "lufs_mmax")
        return out


@dataclass
class VadMeasure(Processor):
    """Append energy-VAD activity columns (functions/vad.py: 25 ms
    frames, 10 ms hop, absolute dBFS threshold) by decoding the payload
    per row inside an Arrow batch: ``n_frames``, ``n_active``,
    ``active_ms``, ``longest_run_ms``, ``active_frac``. Everything else
    passes through unchanged."""

    threshold_db: float = -35.0
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.vad import VAD_FIELDS, vad_map_in_pandas

        renames = {self.bytes_col: "bytes", self.codec_col: "codec", self.sr_col: "sr_hz"}
        work = df
        for src, dst in renames.items():
            if src != dst:
                work = work.withColumnRenamed(src, dst)
        passthrough = list(work.columns)
        schema = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in work.schema.fields)
            + ", " + VAD_FIELDS
        )
        out = work.mapInPandas(
            vad_map_in_pandas(passthrough, self.threshold_db), schema=schema
        )
        for src, dst in renames.items():
            if src != dst:
                out = out.withColumnRenamed(dst, src)
        return out


@dataclass
class VadGate(Processor):
    """Keep clips whose voice-activity fraction (and optionally the
    longest continuous active run) clears a floor — the speech-curation
    gate a training pipeline runs before transcription. A pure filter:
    with ``drop_measures=True`` the payload schema is unchanged."""

    min_active_frac: float | None = None
    min_longest_run_ms: int | None = None
    threshold_db: float = -35.0
    drop_measures: bool = False
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __post_init__(self):
        if self.min_active_frac is None and self.min_longest_run_ms is None:
            raise ValueError("vad_gate needs min_active_frac and/or min_longest_run_ms")

    def __call__(self, df: DataFrame) -> DataFrame:
        out = VadMeasure(self.threshold_db, self.bytes_col, self.codec_col, self.sr_col)(df)
        cond = F.lit(True)
        if self.min_active_frac is not None:
            cond = cond & (F.col("active_frac") >= F.lit(float(self.min_active_frac)))
        if self.min_longest_run_ms is not None:
            cond = cond & (F.col("longest_run_ms") >= F.lit(int(self.min_longest_run_ms)))
        out = out.filter(cond)
        if self.drop_measures:
            out = out.drop(
                "n_frames", "n_active", "active_ms", "longest_run_ms", "active_frac"
            )
        return out


@dataclass
class PitchMeasure(Processor):
    """Append pitch columns (functions/pitch.py — normalized-ACF F0
    tracker, 40 ms frames / 20 ms hop): ``f0_med``, ``voiced_frac``,
    ``n_pitch_frames``. Stateless Arrow kernel; everything else passes
    through unchanged."""

    fmin: float = 60.0
    fmax: float = 500.0
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.pitch import PITCH_FIELDS, pitch_map_in_pandas

        renames = {self.bytes_col: "bytes", self.codec_col: "codec", self.sr_col: "sr_hz"}
        work = df
        for src, dst in renames.items():
            if src != dst:
                work = work.withColumnRenamed(src, dst)
        passthrough = list(work.columns)
        schema = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in work.schema.fields)
            + ", " + PITCH_FIELDS
        )
        out = work.mapInPandas(
            pitch_map_in_pandas(passthrough, fmin=self.fmin, fmax=self.fmax),
            schema=schema,
        )
        for src, dst in renames.items():
            if src != dst:
                out = out.withColumnRenamed(dst, src)
        return out


@dataclass
class QualityMeasure(Processor):
    """Append waveform-quality columns (functions/aquality.py): ``peak``,
    ``rms_db``, ``crest_db``, ``clipped_frac``, ``dc_offset``."""

    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.aquality import QUALITY_FIELDS, quality_map_in_pandas

        renames = {self.bytes_col: "bytes", self.codec_col: "codec", self.sr_col: "sr_hz"}
        work = df
        for src, dst in renames.items():
            if src != dst:
                work = work.withColumnRenamed(src, dst)
        passthrough = list(work.columns)
        schema = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in work.schema.fields)
            + ", " + QUALITY_FIELDS
        )
        out = work.mapInPandas(quality_map_in_pandas(passthrough), schema=schema)
        for src, dst in renames.items():
            if src != dst:
                out = out.withColumnRenamed(dst, src)
        return out


@dataclass
class QualityGate(Processor):
    """Drop clips failing waveform-hygiene bounds (clipping, DC offset,
    level) — the audio corpus-curation cut before transcription. Pure
    filter; with ``drop_measures=True`` the schema is unchanged."""

    max_clipped_frac: float | None = None
    max_abs_dc: float | None = None
    min_rms_db: float | None = None
    drop_measures: bool = False
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __post_init__(self):
        if self.max_clipped_frac is None and self.max_abs_dc is None and self.min_rms_db is None:
            raise ValueError(
                "quality_gate needs max_clipped_frac, max_abs_dc and/or min_rms_db"
            )

    def __call__(self, df: DataFrame) -> DataFrame:
        out = QualityMeasure(self.bytes_col, self.codec_col, self.sr_col)(df)
        cond = F.lit(True)
        if self.max_clipped_frac is not None:
            cond = cond & (F.col("clipped_frac") <= F.lit(float(self.max_clipped_frac)))
        if self.max_abs_dc is not None:
            cond = cond & (F.abs(F.col("dc_offset")) <= F.lit(float(self.max_abs_dc)))
        if self.min_rms_db is not None:
            cond = cond & (F.col("rms_db") >= F.lit(float(self.min_rms_db)))
        out = out.filter(cond)
        if self.drop_measures:
            out = out.drop("peak", "rms_db", "crest_db", "clipped_frac", "dc_offset")
        return out


@dataclass
class VadSegment(Processor):
    """Explode each clip into VAD utterance segments (functions/vad.py
    ``segment_map_in_pandas`` — the audio analog of video frame
    sampling): one output row per speech span, re-encoded with the
    clip's codec. OUTPUT SCHEMA CHANGES to SEGMENT_FIELDS
    (segment_id, bytes, sr_hz, codec, start_ms, end_ms, dur_ms)."""

    id_col: str = "clip_id"
    threshold_db: float = -35.0
    min_silence_ms: int = 200
    min_speech_ms: int = 100
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.vad import SEGMENT_FIELDS, segment_map_in_pandas

        renames = {self.bytes_col: "bytes", self.codec_col: "codec", self.sr_col: "sr_hz"}
        work = df
        for src, dst in renames.items():
            if src != dst:
                work = work.withColumnRenamed(src, dst)
        return work.mapInPandas(
            segment_map_in_pandas(
                self.id_col, self.threshold_db, self.min_silence_ms, self.min_speech_ms
            ),
            schema=SEGMENT_FIELDS,
        )


@dataclass
class AlignTranscript(Processor):
    """Explode each clip into per-word alignment rows (functions/
    align.py: VAD speech timeline + proportional word layout — the
    model-free forced-alignment baseline). OUTPUT SCHEMA CHANGES to
    ``<id_col>, word, word_idx, seg_idx, start_ms, end_ms``."""

    id_col: str = "clip_id"
    transcript_col: str = "transcript"
    threshold_db: float = -35.0
    min_silence_ms: int = 200
    min_speech_ms: int = 100
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.align import ALIGN_FIELDS, align_map_in_pandas

        work, _ = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        return work.mapInPandas(
            align_map_in_pandas(
                self.id_col,
                self.transcript_col,
                self.threshold_db,
                self.min_silence_ms,
                self.min_speech_ms,
            ),
            schema=f"{self.id_col} string, " + ALIGN_FIELDS,
        )


@dataclass
class Diarize(Processor):
    """Append speaker-diarization columns (functions/diarize.py:
    energy-VAD segmentation → gain-invariant mean-log-mel segment
    embeddings → average-linkage clustering on cosine distance):
    ``n_segments``, ``n_speakers``, ``n_turns``, ``speech_ms``,
    ``turn_labels``. Rows with undecodable codecs pass through with
    ``n_segments = -1`` (never fail a batch on a foreign row). All
    per-clip work inside one Arrow batch — no shuffle, no state."""

    threshold_db: float = -35.0
    min_silence_ms: int = 200
    min_speech_ms: int = 100
    ahc_threshold: float = 0.2
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        from benthos_spark.functions.diarize import DIAR_FIELDS, diarize_map_in_pandas

        work, renames = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        out = work.mapInPandas(
            diarize_map_in_pandas(
                list(work.columns),
                self.threshold_db,
                self.min_silence_ms,
                self.min_speech_ms,
                self.ahc_threshold,
            ),
            schema=_schema_plus(work, DIAR_FIELDS),
        )
        return _unrenamed(out, renames)


# ---------------------------------------------------------------------------
# Augmentation stages (functions/augment.py) — the training-data expansion
# pass. All randomness is counter-based splitmix64 keyed on the clip id
# (augment.seed_from_id), so a redelivered batch re-produces byte-identical
# augmented payloads: augmentation composes with exactly-once delivery.
# ---------------------------------------------------------------------------


def _renamed(df: DataFrame, bytes_col: str, codec_col: str, sr_col: str):
    renames = {bytes_col: "bytes", codec_col: "codec", sr_col: "sr_hz"}
    work = df
    for src, dst in renames.items():
        if src != dst:
            work = work.withColumnRenamed(src, dst)
    return work, renames


def _unrenamed(df: DataFrame, renames: dict) -> DataFrame:
    for src, dst in renames.items():
        if src != dst:
            df = df.withColumnRenamed(dst, src)
    return df


def _schema_plus(work: DataFrame, extra: str) -> str:
    base = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in work.schema.fields)
    return base + (", " + extra if extra else "")


@dataclass
class SpeedPerturb(Processor):
    """sox/Kaldi speed perturbation: resample each clip from
    round(sr·factor) back to sr (duration × 1/factor, pitch × factor)
    and re-encode with the clip's own codec. With ``fanout=False`` one
    factor is chosen per clip (seeded on the id); with ``fanout=True``
    every clip becomes len(factors) rows with ``#sp<factor>``-suffixed
    ids — the classic 3× corpus expansion. Adds ``speed_factor``;
    updates ``dur_ms`` when present. Stateless Arrow mapInPandas."""

    factors: tuple = (0.9, 1.0, 1.1)
    fanout: bool = False
    taps: int = 16
    id_col: str = "clip_id"
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    # subclass knobs: id suffix tag, RNG stream, factor column, kernel
    _tag = "sp"
    _stream = 40
    _factor_col = "speed_factor"

    @staticmethod
    def _kernel(x, fs, f, taps):
        from benthos_spark.functions import augment as G

        return G.speed_perturb(x, fs, f, taps=taps)

    def __call__(self, df: DataFrame) -> DataFrame:
        import numpy as np

        factors = tuple(float(f) for f in self.factors)
        fanout, taps, id_col = self.fanout, int(self.taps), self.id_col
        tag, stream, factor_col = self._tag, self._stream, self._factor_col
        kernel = type(self)._kernel
        work, renames = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        cols = list(work.columns)
        has_dur = "dur_ms" in cols
        schema = _schema_plus(work, f"{factor_col} double")

        def fn(batches):
            import pandas as pd

            from benthos_spark.functions import audio as A
            from benthos_spark.functions import augment as G

            for pdf in batches:
                rows = {c: [] for c in cols}
                facs = []
                for i in range(len(pdf)):
                    codec = pdf["codec"].iat[i]
                    if not A.is_decodable(codec):
                        # foreign/sentinel codec: pass through untouched
                        # (never fail a batch on one odd row)
                        for c in cols:
                            rows[c].append(pdf[c].iat[i])
                        facs.append(np.nan)
                        continue
                    fs = int(pdf["sr_hz"].iat[i])
                    cid = pdf[id_col].iat[i]
                    x = np.asarray(A.decode(pdf["bytes"].iat[i], codec), dtype=np.float64)
                    if fanout:
                        picks = factors
                    else:
                        u = G.rand_u01(G.seed_from_id(cid), stream, 1)[0]
                        picks = (factors[int(u * len(factors))],)
                    for f in picks:
                        y = kernel(x, fs, f, taps)
                        for c in cols:
                            if c == "bytes":
                                rows[c].append(A.encode(y, codec, fs))
                            elif c == id_col and fanout:
                                rows[c].append(f"{cid}#{tag}{f:g}")
                            elif c == "dur_ms" and has_dur:
                                rows[c].append(int(round(len(y) * 1000.0 / fs)))
                            else:
                                rows[c].append(pdf[c].iat[i])
                        facs.append(f)
                out = pd.DataFrame({c: pd.Series(v, dtype=object) for c, v in rows.items()})
                for c in cols:  # restore non-object dtypes Arrow can map
                    if c not in ("bytes", id_col, "codec"):
                        out[c] = out[c].infer_objects()
                out[factor_col] = np.asarray(facs, dtype=np.float64)
                yield out

        return _unrenamed(work.mapInPandas(fn, schema=schema), renames)


@dataclass
class TempoPerturb(SpeedPerturb):
    """WSOLA tempo perturbation (functions/augment.py time_stretch):
    change each clip's duration by 1/factor while PRESERVING pitch —
    the complement of :class:`SpeedPerturb`, which shifts pitch by the
    factor. Same pick/fanout semantics (``#tp<factor>`` suffixes, an
    independent RNG stream so chaining both draws independently). Adds
    ``tempo_factor``; updates ``dur_ms`` when present. Deterministic:
    WSOLA has no randomness."""

    _tag = "tp"
    _stream = 45
    _factor_col = "tempo_factor"

    @staticmethod
    def _kernel(x, fs, f, taps):
        from benthos_spark.functions import augment as G

        return G.time_stretch(x, f)


def _payload_augment(work: DataFrame, cols, extra_name, fn_one):
    """Shared mapInPandas shell: decode → fn_one(x, fs, seed) →
    (y, value) → re-encode with the clip's codec; adds one double."""
    import numpy as np

    def fn(batches):
        import pandas as pd

        from benthos_spark.functions import audio as A

        for pdf in batches:
            payloads, vals = [], np.empty(len(pdf), dtype=np.float64)
            for i in range(len(pdf)):
                codec = pdf["codec"].iat[i]
                if not A.is_decodable(codec):
                    payloads.append(pdf["bytes"].iat[i])
                    vals[i] = np.nan
                    continue
                fs = int(pdf["sr_hz"].iat[i])
                x = np.asarray(A.decode(pdf["bytes"].iat[i], codec), dtype=np.float64)
                y, vals[i] = fn_one(pdf, i, x, fs)
                payloads.append(A.encode(np.clip(y, -1.0, 1.0), codec, fs))
            out = {c: pdf[c] for c in cols}
            out["bytes"] = pd.Series(payloads, dtype=object)
            out[extra_name] = np.round(vals, 4)
            yield pd.DataFrame(out)

    return fn


@dataclass
class GainPerturb(Processor):
    """Per-clip uniform gain draw in [min_db, max_db] (seeded on the
    id), hard-clipped at full scale; adds ``gain_db``. The volume-
    perturbation half of the Kaldi recipe."""

    min_db: float = -6.0
    max_db: float = 6.0
    id_col: str = "clip_id"
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        lo, hi, id_col = float(self.min_db), float(self.max_db), self.id_col
        work, renames = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        cols = list(work.columns)

        def one(pdf, i, x, fs):
            from benthos_spark.functions import augment as G

            g = lo + G.rand_u01(G.seed_from_id(pdf[id_col].iat[i]), 41, 1)[0] * (hi - lo)
            return G.apply_gain_db(x, g), g

        out = work.mapInPandas(
            _payload_augment(work, cols, "gain_db", one),
            schema=_schema_plus(work, "gain_db double"),
        )
        return _unrenamed(out, renames)


@dataclass
class NoiseMix(Processor):
    """Additive Gaussian noise at a target SNR (± uniform jitter_db,
    seeded on the id): the noise draw is renormalized by its measured
    power so the pre-clip SNR is exact. Adds ``snr_target_db``."""

    snr_db: float = 20.0
    jitter_db: float = 0.0
    id_col: str = "clip_id"
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        snr, jit, id_col = float(self.snr_db), float(self.jitter_db), self.id_col
        work, renames = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        cols = list(work.columns)

        def one(pdf, i, x, fs):
            from benthos_spark.functions import augment as G

            seed = G.seed_from_id(pdf[id_col].iat[i])
            t = snr + (2.0 * G.rand_u01(seed, 42, 1)[0] - 1.0) * jit
            return G.mix_noise_snr(x, t, seed), t

        out = work.mapInPandas(
            _payload_augment(work, cols, "snr_target_db", one),
            schema=_schema_plus(work, "snr_target_db double"),
        )
        return _unrenamed(out, renames)


@dataclass
class ReverbAugment(Processor):
    """Convolve each clip with a deterministic synthetic room impulse
    response (exponential-decay Gaussian tail, -60 dB at ``rt60_ms``),
    trimmed to the dry length and peak-renormalized. Adds ``rt60_ms``."""

    rt60_ms: float = 300.0
    wet: float = 0.3
    id_col: str = "clip_id"
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        rt60, wet, id_col = float(self.rt60_ms), float(self.wet), self.id_col
        work, renames = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        cols = list(work.columns)

        def one(pdf, i, x, fs):
            from benthos_spark.functions import augment as G

            seed = G.seed_from_id(pdf[id_col].iat[i])
            ir = G.synth_ir(fs, rt60, seed, wet=wet)
            return G.apply_reverb(x, ir), rt60

        out = work.mapInPandas(
            _payload_augment(work, cols, "rt60_ms", one),
            schema=_schema_plus(work, "rt60_ms double"),
        )
        return _unrenamed(out, renames)


@dataclass
class FbankAugment(Processor):
    """Decode → log-mel filterbank features → SpecAugment time/freq
    masking (Park et al. 2019, seeded on the id). Appends ``n_frames``,
    ``n_mels``, ``masked_frac`` and the flattened masked features as
    ``fbank: array<float>`` (row-major frames×mels) — the feature
    tensor an ASR trainer consumes. ``drop_payload=True`` removes the
    bytes column afterwards (features replace audio downstream)."""

    n_mels: int = 40
    time_masks: int = 2
    freq_masks: int = 2
    max_t: int = 20
    max_f: int = 8
    drop_payload: bool = False
    id_col: str = "clip_id"
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __call__(self, df: DataFrame) -> DataFrame:
        import numpy as np

        nm, tm, fm = int(self.n_mels), int(self.time_masks), int(self.freq_masks)
        mt, mf, id_col = int(self.max_t), int(self.max_f), self.id_col
        work, renames = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        cols = list(work.columns)
        schema = _schema_plus(
            work, "n_frames int, n_mels int, masked_frac double, fbank array<float>"
        )

        def fn(batches):
            import pandas as pd

            from benthos_spark.functions import audio as A
            from benthos_spark.functions import augment as G

            for pdf in batches:
                nfr = np.empty(len(pdf), dtype=np.int32)
                frac = np.empty(len(pdf), dtype=np.float64)
                feats = []
                for i in range(len(pdf)):
                    codec = pdf["codec"].iat[i]
                    if not A.is_decodable(codec):
                        nfr[i] = 0
                        frac[i] = np.nan
                        feats.append(np.zeros(0, dtype=np.float32))
                        continue
                    fs = int(pdf["sr_hz"].iat[i])
                    x = np.asarray(A.decode(pdf["bytes"].iat[i], codec), dtype=np.float64)
                    mel = G.log_mel(x, fs, n_mels=nm)
                    seed = G.seed_from_id(pdf[id_col].iat[i])
                    masked, mfrac = G.spec_augment(
                        mel, seed, time_masks=tm, freq_masks=fm, max_t=mt, max_f=mf
                    )
                    nfr[i] = masked.shape[0]
                    frac[i] = round(mfrac, 6)
                    feats.append(masked.astype(np.float32).ravel())
                out = {c: pdf[c] for c in cols}
                out["n_frames"] = nfr
                out["n_mels"] = np.full(len(pdf), nm, dtype=np.int32)
                out["masked_frac"] = frac
                out["fbank"] = pd.Series(feats, dtype=object)
                yield pd.DataFrame(out)

        out = work.mapInPandas(fn, schema=schema)
        if self.drop_payload:
            out = out.drop("bytes")
        return _unrenamed(out, renames)


@dataclass
class AugmentChain(Processor):
    """Fused augmentation pipeline: ONE decode → every stage in order →
    ONE re-encode. Stacking the standalone processors instead costs a
    decode + int16 re-encode round trip PER STAGE — at corpus scale
    that roughly doubles the DSP cost and injects quantization noise
    between stages; the fused chain quantizes exactly once at the end.

    ``stages`` is an ordered list of single-key dicts (the YAML shape):
    ``[{"speed": {"factors": [0.9,1.0,1.1]}}, {"gain": {"min_db": -3,
    "max_db": 3}}, {"noise": {"snr_db": 20}}, {"reverb": {"rt60_ms":
    300}}]``. Speed inside a chain picks per clip (no fanout — fan out
    with the standalone SpeedPerturb first if you need 3×). Appends one
    ``aug_params`` string column (JSON of the applied draws — the
    lineage a curation pipeline keeps). Seeds are per-clip and
    per-stage-index, so two chains differing only in stage order draw
    independent randomness."""

    stages: tuple = ()
    id_col: str = "clip_id"
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    sr_col: str = "sr_hz"

    def __post_init__(self):
        known = {"speed", "tempo", "gain", "noise", "reverb"}
        norm = []
        for st in self.stages:
            if not isinstance(st, dict) or len(st) != 1:
                raise ValueError(f"augment stage must be a single-key dict, got {st!r}")
            (kind, conf), = st.items()
            if kind not in known:
                raise ValueError(f"unknown augment stage {kind!r}; known: {sorted(known)}")
            norm.append((kind, dict(conf or {})))
        if not norm:
            raise ValueError("augment chain needs at least one stage")
        self._stages = tuple(norm)

    def __call__(self, df: DataFrame) -> DataFrame:
        import numpy as np

        stages, id_col = self._stages, self.id_col
        work, renames = _renamed(df, self.bytes_col, self.codec_col, self.sr_col)
        cols = list(work.columns)
        schema = _schema_plus(work, "aug_params string")

        def fn(batches):
            import json

            import pandas as pd

            from benthos_spark.functions import audio as A
            from benthos_spark.functions import augment as G

            for pdf in batches:
                payloads, params = [], []
                for i in range(len(pdf)):
                    codec = pdf["codec"].iat[i]
                    if not A.is_decodable(codec):
                        payloads.append(pdf["bytes"].iat[i])
                        params.append(None)
                        continue
                    fs = int(pdf["sr_hz"].iat[i])
                    seed = G.seed_from_id(pdf[id_col].iat[i])
                    x = np.asarray(A.decode(pdf["bytes"].iat[i], codec), dtype=np.float64)
                    applied = []
                    for si, (kind, conf) in enumerate(stages):
                        # per-stage stream base keeps draws independent
                        # across stages AND across chain positions
                        base = 100 + 10 * si
                        if kind in ("speed", "tempo"):
                            facs = tuple(float(f) for f in conf.get("factors", (0.9, 1.0, 1.1)))
                            u = G.rand_u01(seed, base, 1)[0]
                            f = facs[int(u * len(facs))]
                            if kind == "speed":
                                y = G.speed_perturb(x, fs, f, taps=int(conf.get("taps", 16)))
                            else:
                                y = G.time_stretch(x, f)
                            x = np.asarray(y, dtype=np.float64)
                            applied.append({kind: round(f, 4)})
                        elif kind == "gain":
                            lo = float(conf.get("min_db", -6.0))
                            hi = float(conf.get("max_db", 6.0))
                            g = lo + G.rand_u01(seed, base, 1)[0] * (hi - lo)
                            x = G.apply_gain_db(x, g)
                            applied.append({"gain_db": round(g, 4)})
                        elif kind == "noise":
                            snr = float(conf.get("snr_db", 20.0))
                            jit = float(conf.get("jitter_db", 0.0))
                            t = snr + (2.0 * G.rand_u01(seed, base, 1)[0] - 1.0) * jit
                            x = G.mix_noise_snr(x, t, seed, stream=base + 1)
                            applied.append({"snr_db": round(t, 4)})
                        else:  # reverb
                            rt60 = float(conf.get("rt60_ms", 300.0))
                            ir = G.synth_ir(
                                fs, rt60, seed, stream=base + 1,
                                wet=float(conf.get("wet", 0.3)),
                            )
                            x = G.apply_reverb(x, ir)
                            applied.append({"rt60_ms": rt60})
                    payloads.append(A.encode(np.clip(x, -1.0, 1.0), codec, fs))
                    params.append(json.dumps(applied, separators=(",", ":")))
                out = {c: pdf[c] for c in cols}
                out["bytes"] = pd.Series(payloads, dtype=object)
                out["aug_params"] = pd.Series(params, dtype=object)
                yield pd.DataFrame(out)

        return _unrenamed(work.mapInPandas(fn, schema=schema), renames)


@dataclass
class SpeakingRate(Processor):
    """Transcript↔audio consistency gate: words per second computed
    entirely JVM-side (no UDF — one codegen'd projection), the cheap
    curation cut that catches truncated audio, runaway transcripts, and
    empty captions before any expensive decode runs. Adds ``n_words``
    and ``rate_wps``; with bounds set, keeps only
    ``min_wps <= rate_wps <= max_wps`` (and n_words > 0)."""

    min_wps: float | None = None
    max_wps: float | None = None
    drop_measures: bool = False
    transcript_col: str = "transcript"
    dur_col: str = "dur_ms"

    def __call__(self, df: DataFrame) -> DataFrame:
        t = F.trim(F.col(self.transcript_col))
        n_words = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
        out = df.withColumn("n_words", n_words.cast("int")).withColumn(
            "rate_wps",
            F.round(
                F.col("n_words") / (F.col(self.dur_col).cast("double") / 1000.0), 4
            ),
        )
        if self.min_wps is not None or self.max_wps is not None:
            cond = F.col("n_words") > 0
            if self.min_wps is not None:
                cond = cond & (F.col("rate_wps") >= float(self.min_wps))
            if self.max_wps is not None:
                cond = cond & (F.col("rate_wps") <= float(self.max_wps))
            out = out.filter(cond)
        if self.drop_measures:
            out = out.drop("n_words", "rate_wps")
        return out


@dataclass
class Cmvn(Processor):
    """Corpus-level cepstral/filterbank mean-variance normalization —
    the classic two-pass ASR feature stage. Pass 1 reduces each clip's
    ``fbank`` tensor to per-mel-bin (sum, sumsq, n) partials INSIDE the
    Arrow batch (numpy reshape+sum — no per-cell rows ever shuffle),
    explodes only n_mels rows per clip, and aggregates globally; the
    resulting n_mels-row stats table is collected (bounded by n_mels,
    never by data) and closed over by pass 2, which rewrites ``fbank``
    as (x - mean) / std. Consume after :class:`FbankAugment` (use
    time_masks=0/freq_masks=0 for unmasked features). The input should
    be persisted by the caller when the double pass matters."""

    fbank_col: str = "fbank"
    n_mels_col: str = "n_mels"
    eps: float = 1e-8

    def __call__(self, df: DataFrame) -> DataFrame:
        import numpy as np

        fb_col, nm_col, eps = self.fbank_col, self.n_mels_col, float(self.eps)
        cols = list(df.columns)

        def partials(batches):
            import pandas as pd

            for pdf in batches:
                sums, sqs, ns, bins = [], [], [], []
                for i in range(len(pdf)):
                    nm = int(pdf[nm_col].iat[i])
                    v = np.asarray(pdf[fb_col].iat[i], dtype=np.float64)
                    m = v.reshape(-1, nm) if nm > 0 and v.size else np.zeros((0, max(nm, 1)))
                    for b in range(nm):
                        bins.append(b)
                        sums.append(float(m[:, b].sum()))
                        sqs.append(float(np.square(m[:, b]).sum()))
                        ns.append(int(m.shape[0]))
                yield pd.DataFrame(
                    {"bin": np.asarray(bins, dtype=np.int32),
                     "s": np.asarray(sums, dtype=np.float64),
                     "sq": np.asarray(sqs, dtype=np.float64),
                     "n": np.asarray(ns, dtype=np.int64)}
                )

        stats_rows = (
            df.select(fb_col, nm_col)
            .mapInPandas(partials, schema="bin int, s double, sq double, n bigint")
            .groupBy("bin")
            .agg(F.sum("s").alias("s"), F.sum("sq").alias("sq"), F.sum("n").alias("n"))
            .collect()  # bounded by n_mels — never data-sized
        )
        mean = {}
        std = {}
        for r in stats_rows:
            mu = r.s / r.n if r.n else 0.0
            var = max(r.sq / r.n - mu * mu, 0.0) if r.n else 0.0
            mean[r.bin] = mu
            std[r.bin] = var**0.5
        n_bins = len(mean)
        mu_vec = np.asarray([mean[b] for b in range(n_bins)], dtype=np.float64)
        sd_vec = np.asarray([max(std[b], eps) for b in range(n_bins)], dtype=np.float64)

        def normalize(batches):
            import pandas as pd

            for pdf in batches:
                out = {c: pdf[c] for c in cols}
                normed = []
                for i in range(len(pdf)):
                    nm = int(pdf[nm_col].iat[i])
                    v = np.asarray(pdf[fb_col].iat[i], dtype=np.float64)
                    if nm != n_bins or v.size == 0:
                        normed.append(v.astype(np.float32))
                        continue
                    m = (v.reshape(-1, nm) - mu_vec) / sd_vec
                    normed.append(m.astype(np.float32).ravel())
                out[fb_col] = pd.Series(normed, dtype=object)
                yield pd.DataFrame(out)

        schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        return df.mapInPandas(normalize, schema=schema)
