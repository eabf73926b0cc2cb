"""Windowing — the reference's ``system_window`` buffer re-expressed as
event-time windows + watermarks.

Reference semantics (/root/reference/internal/impl/pure/
buffer_system_window.go): ``size``/``slide``/``offset`` window math
(:234-266), ``allowed_lateness`` then late-drop (:296-351), flush stamps
``window_end_timestamp`` metadata (:374). Sliding windows deliver a
message once per window it belongs to (:45) — exactly `window()` with a
slide; we do NOT dedupe across windows. Session windows are an addition
(the reference only has tumbling/sliding; the north rule requires all
three).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from benthos_spark.operators.processors import Processor


def windowed(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str | None = None,
    offset: str | None = None,
    lateness: str | None = None,
) -> DataFrame:
    """Watermark + window assignment; adds a ``window`` struct column."""
    if lateness:
        df = df.withWatermark(ts_col, lateness)
    win = F.window(F.col(ts_col), size, slide or size, offset or "0 seconds")
    return df.withColumn("window", win)


@dataclass
class WindowAgg(Processor):
    """Tumbling/sliding window + per-key aggregation in one processor —
    the canonical composition from buffer_system_window.go:94-118
    (window → group_by_value → sum/unique). Emits ``window_start`` and
    ``window_end_timestamp`` (metadata parity with :374)."""

    ts_col: str
    size: str
    aggs: dict[str, Column]
    slide: str | None = None
    offset: str | None = None
    lateness: str | None = None
    group_cols: Sequence[str] = field(default_factory=list)

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.lateness:
            df = df.withWatermark(self.ts_col, self.lateness)
        win = F.window(
            F.col(self.ts_col), self.size, self.slide or self.size, self.offset or "0 seconds"
        )
        out = df.groupBy(win.alias("window"), *self.group_cols).agg(
            *[a.alias(n) for n, a in self.aggs.items()]
        )
        return out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end_timestamp"),
            *self.group_cols,
            *self.aggs.keys(),
        )


@dataclass
class SessionWindowAgg(Processor):
    """Session windows (gap-based) keyed by ``group_cols`` — built-in
    ``session_window`` (north-rule addition; no reference analogue)."""

    ts_col: str
    gap: str
    aggs: dict[str, Column]
    group_cols: Sequence[str] = field(default_factory=list)
    lateness: str | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.lateness:
            df = df.withWatermark(self.ts_col, self.lateness)
        out = df.groupBy(
            F.session_window(F.col(self.ts_col), self.gap).alias("window"), *self.group_cols
        ).agg(*[a.alias(n) for n, a in self.aggs.items()])
        return out.select(
            F.col("window.start").alias("session_start"),
            F.col("window.end").alias("session_end"),
            *self.group_cols,
            *self.aggs.keys(),
        )
