"""Keyed streaming state: dedupe, stream-stream join, custom stateful ops.

Reference analogues:

- `dedupe` processor + cache resource (/root/reference/internal/impl/pure/
  processor_dedupe.go:26,107-145) → ``dropDuplicatesWithinWatermark``.
- `sequence.sharded_join` (internal/impl/pure/input_sequence.go:144-157,
  joiner :173-230) and the joining-streams cookbook
  (website/cookbooks/joining_streams.md) → watermarked stream-stream join
  keyed by ``clip_id``, plus an ``applyInPandasWithState`` variant that
  mirrors the cache-based buffer-until-both-sides pattern with a state
  timeout (≙ cache TTL).
- cache get/set (internal/impl/pure/processor_cache.go:26) → the RocksDB/
  HDFS state store underneath ``applyInPandasWithState``.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def dedupe_within_watermark(df: DataFrame, keys: list[str], ts_col: str, delay: str) -> DataFrame:
    """Streaming dedupe: drop re-deliveries of the same key arriving within
    the watermark delay; state is evicted afterwards (the reference's cache
    TTL, processor_dedupe.go at-least-once caveat becomes exactly-once-
    within-watermark)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def clip_transcript_join(
    clip_side: DataFrame,
    transcript_side: DataFrame,
    watermark: str = "2 minutes",
    join_window: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join on ``clip_id`` with an event-time
    range bound so both sides' state is evictable.

    The range condition bounds how long a clip waits for its transcript —
    the Spark-native form of the sharded-join's buffering window. Use
    ``how="leftOuter"`` for outer semantics (unmatched clips emit with a
    null transcript after the watermark passes, ≙ sharded_join "outer").
    """
    c = clip_side.withWatermark("event_ts", watermark).alias("c")
    t = (
        transcript_side.withColumnRenamed("event_ts", "t_event_ts")
        .withWatermark("t_event_ts", watermark)
        .alias("t")
    )
    cond = (
        (F.col("c.clip_id") == F.col("t.clip_id"))
        & (F.col("t.t_event_ts") >= F.col("c.event_ts") - F.expr(f"INTERVAL {join_window}"))
        & (F.col("t.t_event_ts") <= F.col("c.event_ts") + F.expr(f"INTERVAL {join_window}"))
    )
    joined = c.join(t, cond, how)
    return joined.select(
        F.col("c.clip_id").alias("clip_id"),
        "c.bytes",
        "c.sr_hz",
        "c.dur_ms",
        "c.codec",
        "c.event_ts",
        "t.transcript",
    )


# ---------------------------------------------------------------------------
# applyInPandasWithState custom operators
# ---------------------------------------------------------------------------

JOIN_STATE_SCHEMA = "bytes binary, sr_hz int, dur_ms int, codec string, " "transcript string, ts_ms long"

JOIN_OUT_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, event_ts timestamp"
)


def _make_stateful_join_fn(timeout_ms: int | None):
    def _stateful_join_fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Buffer-until-both-sides join, keyed by clip_id.

        State = the half seen so far. When the other half arrives, emit the
        joined row and clear. A ProcessingTimeTimeout expires abandoned
        halves (≙ the joining-streams cookbook's cache TTL).

        Groups are keyed by clip_id so a well-formed stream holds 1-2
        rows per group — but redelivery storms or a hot key can fan a
        group out arbitrarily, so the ingest is mask-vectorized (the
        same numpy pattern operators/cep.py got in round 4) instead of
        an itertuples walk: per Arrow batch we take ``pd.notna`` masks
        and touch only the LAST clip half and LAST transcript half
        (last-write-wins, identical to the row-order walk); cost is
        O(batch) C-speed masking + O(1) Python, not O(batch) Python."""
        import datetime as dt

        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return

        (clip_bytes, sr, dur, codec, transcript, ts_ms) = (
            state.get if state.exists else (None, None, None, None, None, None)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            cols = pdf.columns
            bvals = pdf["bytes"].to_numpy() if "bytes" in cols else None
            tvals = pdf["transcript"].to_numpy() if "transcript" in cols else None
            bidx = np.flatnonzero(pd.notna(bvals)) if bvals is not None else ()
            tidx = np.flatnonzero(pd.notna(tvals)) if tvals is not None else ()
            if len(bidx):
                i = int(bidx[-1])
                clip_bytes = bytes(bvals[i])
                sr = int(pdf["sr_hz"].iloc[i])
                dur = int(pdf["dur_ms"].iloc[i])
                codec = pdf["codec"].iloc[i]
                ts_ms = int(pdf["event_ts"].iloc[i].timestamp() * 1000)
            if len(tidx):
                transcript = str(tvals[tidx[-1]])
                if ts_ms is None:
                    # no clip half yet: the FIRST transcript row stamps the
                    # event time (matches the old walk's set-once-if-None)
                    ts_ms = int(pdf["event_ts"].iloc[int(tidx[0])].timestamp() * 1000)

        if clip_bytes is not None and transcript is not None:
            state.remove()
            yield pd.DataFrame(
                {
                    "clip_id": [key[0]],
                    "bytes": [clip_bytes],
                    "sr_hz": [sr],
                    "dur_ms": [dur],
                    "codec": [codec],
                    "transcript": [transcript],
                    "event_ts": [dt.datetime.utcfromtimestamp(ts_ms / 1000.0)],
                }
            )
        else:
            state.update((clip_bytes, sr, dur, codec, transcript, ts_ms))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return _stateful_join_fn


def stateful_clip_join(union_stream: DataFrame, timeout_ms: int | None = 120_000) -> DataFrame:
    """`applyInPandasWithState` clip↔transcript join over a tagged union
    stream (columns: clip_id, bytes?, sr_hz?, dur_ms?, codec?, transcript?,
    event_ts). The RocksDB-backed alternative to the built-in stream-stream
    join — use when join semantics need custom collision handling
    (sharded_join collision strategies, input_sequence.go:151-157).

    ``timeout_ms`` expires abandoned halves (cache-TTL parity) on
    long-running queries. Pass ``None`` for bounded ``availableNow`` runs:
    processing-time timeouts keep scheduling wall-clock batches after the
    data is drained, which availableNow never terminates."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return union_stream.groupBy("clip_id").applyInPandasWithState(
        _make_stateful_join_fn(timeout_ms),
        outputStructType=JOIN_OUT_SCHEMA,
        stateStructType=JOIN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


SESSION_OUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events int"
SESSION_STATE_SCHEMA = "start_ms long, end_ms long, n int"


def _sessionize_fn(
    key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom session builder with a processing-time flush — demonstrates
    stateful-operator parity beyond built-in session_window (emits sessions
    on gap timeout rather than watermark). Used with
    ProcessingTimeTimeout on continuous queries; on bounded availableNow
    runs use ``sessionize_with_state(..., timeout_ms=None)`` and only
    burst-closed sessions emit."""
    import datetime as dt

    gap_ms = 30 * 60 * 1000
    if state.hasTimedOut:
        start_ms, end_ms, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [dt.datetime.utcfromtimestamp(start_ms / 1000.0)],
                "session_end": [dt.datetime.utcfromtimestamp(end_ms / 1000.0)],
                "n_events": [n],
            }
        )
        return

    start_ms, end_ms, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int, int]] = []
    import numpy as np

    batches = [
        (pdf["ts"].astype("int64") // 1_000_000).to_numpy() for pdf in pdfs
    ]
    arr = np.sort(np.concatenate(batches)) if batches else np.empty(0, dtype=np.int64)
    if len(arr):
        # vectorized sessionization: gaps > gap_ms split the sorted
        # timestamps into segments (one np.diff, no per-event loop);
        # sessions = [carried? + seg0] seg1 ... seg_last, all closed
        # except the last, which becomes the new open state
        breaks = np.nonzero(np.diff(arr) > gap_ms)[0]
        seg_starts = np.concatenate(([0], breaks + 1))
        seg_ends = np.concatenate((breaks, [len(arr) - 1]))
        sessions: list[tuple[int, int, int]] = []
        if start_ms is not None:
            sessions.append((start_ms, end_ms, n))
        for s in range(len(seg_starts)):
            seg = (
                int(arr[seg_starts[s]]),
                int(arr[seg_ends[s]]),
                int(seg_ends[s] - seg_starts[s] + 1),
            )
            if sessions and seg[0] - sessions[-1][1] <= gap_ms:
                prev = sessions[-1]
                sessions[-1] = (prev[0], max(prev[1], seg[1]), prev[2] + seg[2])
            else:
                sessions.append(seg)
        closed.extend(sessions[:-1])
        start_ms, end_ms, n = sessions[-1]
    state.update((start_ms, end_ms, n))
    try:
        state.setTimeoutDuration(60_000)
    except Exception:  # NoTimeout conf on bounded runs — flush-by-burst only
        pass
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [dt.datetime.utcfromtimestamp(s / 1000.0) for s, _, _ in closed],
                "session_end": [dt.datetime.utcfromtimestamp(e / 1000.0) for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_with_state(events: DataFrame, timeout_ms: int | None = 60_000) -> DataFrame:
    """Stateful sessionization of an (user_id, ts, ...) stream."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
