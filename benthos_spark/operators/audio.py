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
