"""Streaming metrics: the reference's metrics registry re-expressed as a
``StreamingQueryListener`` + ``df.observe``.

Reference analogue: every layer emits counters through the metrics
registry (/root/reference/internal/component/metrics; canonical names at
internal/component/input/async_reader.go:81-87 `input_received`,
internal/component/output/async_writer.go:87-97 `output_sent`,
`output_error`, and pipeline `processor_latency_ns`). Spark's progress
events carry the same facts per micro-batch; this listener maps them onto
the reference's metric names and appends one JSON line per batch to a
sidecar file next to the checkpoint (so metrics survive restarts with the
query, like the lineage ledger).
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Maps StreamingQueryProgress onto the reference metric names:

    - ``input_received``   <- numInputRows            (async_reader.go:81)
    - ``output_sent``      <- sink rows (= input rows of a committed batch)
    - ``processor_latency_ns`` <- triggerExecution ms  (pipeline metrics)
    - ``batch_created``    <- one per micro-batch      (policy metrics)

    Plus streaming-only gauges: watermark, state rows/bytes.
    """

    def __init__(self, metrics_path: str):
        self.metrics_path = metrics_path
        self._lock = threading.Lock()
        self.totals: dict[str, float] = {
            "input_received": 0,
            "output_sent": 0,
            "batch_created": 0,
            "output_error": 0,
        }

    # -- listener hooks ----------------------------------------------------
    def onQueryStarted(self, event: Any) -> None:
        self._append({"event": "started", "id": str(event.id), "ts": time.time()})

    def onQueryProgress(self, event: Any) -> None:
        p = event.progress
        state = p.stateOperators
        rec = {
            "event": "progress",
            "batch_id": p.batchId,
            "input_received": p.numInputRows,
            "output_sent": p.numInputRows if p.sink is not None else 0,
            "processor_latency_ns": int(p.durationMs.get("triggerExecution", 0)) * 1_000_000,
            "batch_created": 1,
            "event_time_watermark": p.eventTime.get("watermark"),
            "state_rows": sum(s.numRowsTotal for s in state) if state else 0,
            "state_bytes": sum(s.memoryUsedBytes for s in state) if state else 0,
            "ts": time.time(),
        }
        with self._lock:
            self.totals["input_received"] += rec["input_received"]
            self.totals["output_sent"] += rec["output_sent"]
            self.totals["batch_created"] += 1
        self._append(rec)

    def onQueryTerminated(self, event: Any) -> None:
        err = getattr(event, "exception", None)
        if err:
            with self._lock:
                self.totals["output_error"] += 1
        self._append(
            {"event": "terminated", "id": str(event.id), "error": str(err) if err else None,
             "totals": dict(self.totals), "ts": time.time()}
        )

    def onQueryIdle(self, event: Any) -> None:  # Spark 3.5+
        pass

    # -- io ----------------------------------------------------------------
    def _append(self, rec: dict) -> None:
        os.makedirs(os.path.dirname(self.metrics_path), exist_ok=True)
        with self._lock, open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.metrics_path):
            return []
        with open(self.metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]


# One listener per (session, path): repeated Pipeline.start calls in one
# session (the kill/resume pattern) must not stack listeners, or every
# prior listener would append duplicate per-batch records to its file.
_ATTACHED: dict[tuple[int, str], MetricsListener] = {}


def attach(spark: SparkSession, metrics_path: str) -> MetricsListener:
    """Attach a MetricsListener to the session (idempotent per
    (session, path)); returns it for reading. Call ``detach`` (or
    ``spark.streams.removeListener``) when done."""
    key = (id(spark), metrics_path)
    existing = _ATTACHED.get(key)
    if existing is not None:
        return existing
    listener = MetricsListener(metrics_path)
    spark.streams.addListener(listener)
    _ATTACHED[key] = listener
    return listener


def detach(spark: SparkSession, listener: MetricsListener) -> None:
    spark.streams.removeListener(listener)
    for k, v in list(_ATTACHED.items()):
        if v is listener:
            del _ATTACHED[k]
