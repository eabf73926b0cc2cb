"""Streams mode — run many named pipeline configs in one engine with
CRUD lifecycle management.

Mirrors the reference's `benthos streams` mode (internal/stream/manager
— type.go holds the id→stream map; api.go:264 HandleStreamCRUD exposes
POST/GET/PUT/DELETE on /streams/{id}, GET/POST on /streams). Each
stream runs on its own checkpoint under the manager's root, so an
UPDATE (stop + recompile + restart on the SAME checkpoint) keeps
exactly-once delivery across the config swap — the same contract as
the config watcher (streaming/api.py WatchedRun), including the
drain-before-stop step that keeps an uncommitted in-flight batch from
replaying into the new config's sink.

Batch (non-streaming) configs are accepted too: they materialize once
at create/update and report ``active: false`` afterwards.
"""

from __future__ import annotations

import os
import threading
import time

__all__ = ["StreamsManager", "StreamExists", "StreamNotFound"]


class StreamExists(ValueError):
    pass


class StreamNotFound(KeyError):
    pass


class StreamsManager:
    def __init__(self, spark, checkpoint_root: str, **start_kwargs):
        self.spark = spark
        self.checkpoint_root = checkpoint_root
        self._start_kwargs = dict(start_kwargs)
        self._start_kwargs.setdefault("trigger_once", False)
        self._streams: dict[str, dict] = {}
        self._lock = threading.Lock()

    # ------------------------------------------------------------ CRUD
    def create(self, stream_id: str, conf_yaml: str) -> None:
        with self._lock:
            if stream_id in self._streams:
                raise StreamExists(f"stream {stream_id!r} already exists")
            self._streams[stream_id] = self._start(stream_id, conf_yaml)

    def read(self, stream_id: str) -> dict:
        with self._lock:
            ent = self._streams.get(stream_id)
        if ent is None:
            raise StreamNotFound(stream_id)
        return self._status(stream_id, ent, with_config=True)

    def update(self, stream_id: str, conf_yaml: str) -> None:
        with self._lock:
            ent = self._streams.get(stream_id)
            if ent is None:
                raise StreamNotFound(stream_id)
            self._stop(ent)
            self._streams[stream_id] = self._start(stream_id, conf_yaml)

    def delete(self, stream_id: str) -> None:
        with self._lock:
            ent = self._streams.pop(stream_id, None)
        if ent is None:
            raise StreamNotFound(stream_id)
        self._stop(ent)

    def list(self) -> dict:
        with self._lock:
            items = list(self._streams.items())
        return {sid: self._status(sid, ent) for sid, ent in items}

    def stats(self, stream_id: str) -> dict:
        """/streams/{id}/stats: the structured per-stream metrics object
        (stream/manager/api.go HandleStreamStats) from the query's last
        StreamingQueryProgress."""
        import json as _json

        with self._lock:
            ent = self._streams.get(stream_id)
        if ent is None:
            raise StreamNotFound(stream_id)
        q = ent.get("query")
        out = {"uptime_ns": int((time.time() - ent["created"]) * 1e9)}
        if q is None:
            out["batch"] = None
            return out
        prog = q.lastProgress
        if isinstance(prog, str):
            prog = _json.loads(prog)
        if prog:
            out.update(
                {
                    "batch_id": prog.get("batchId"),
                    "input_received": prog.get("numInputRows"),
                    "input_rows_per_second": prog.get("inputRowsPerSecond"),
                    "processed_rows_per_second": prog.get("processedRowsPerSecond"),
                    "duration_ms": prog.get("durationMs"),
                    "state": prog.get("stateOperators"),
                    "watermark": (prog.get("eventTime") or {}).get("watermark"),
                }
            )
        return out

    def set_all(self, configs: dict[str, str]) -> None:
        """POST /streams: replace the entire set (reference api.go)."""
        with self._lock:
            for sid, ent in list(self._streams.items()):
                if sid not in configs:
                    self._stop(ent)
                    del self._streams[sid]
            for sid, conf in configs.items():
                if sid in self._streams:
                    self._stop(self._streams[sid])
                self._streams[sid] = self._start(sid, conf)

    def stop_all(self) -> None:
        with self._lock:
            for ent in self._streams.values():
                self._stop(ent)
            self._streams.clear()

    # ------------------------------------------------------- internals
    def _start(self, stream_id: str, conf_yaml: str) -> dict:
        from benthos_spark.config import run_config

        ckpt = os.path.join(self.checkpoint_root, stream_id)
        # each stream needs its own query name (one SparkSession hosts
        # them all; the default name would collide on the second stream)
        query = run_config(
            self.spark, conf_yaml, checkpoint=ckpt,
            query_name=f"benthos_stream_{stream_id}", **self._start_kwargs,
        )
        return {"query": query, "config": conf_yaml, "created": time.time()}

    @staticmethod
    def _stop(ent: dict) -> None:
        q = ent.get("query")
        if q is None:
            return
        try:
            # drain before stop: see WatchedRun — an uncommitted batch
            # would replay into the replacement config's sink
            drained = threading.Thread(target=q.processAllAvailable, daemon=True)
            drained.start()
            drained.join(60)
            q.stop()
            q.awaitTermination(30)
        except Exception:
            pass

    @staticmethod
    def _status(stream_id: str, ent: dict, with_config: bool = False) -> dict:
        q = ent.get("query")
        active = bool(q is not None and q.isActive)
        out = {
            "active": active,
            "uptime": round(time.time() - ent["created"], 3),
            "uptime_str": f"{time.time() - ent['created']:.0f}s",
        }
        if q is not None:
            try:
                exc = q.exception()
            except Exception:
                exc = None
            if exc is not None:
                out["error"] = str(exc)
        if with_config:
            out["config"] = ent["config"]
        return out


def load_stream_dir(manager: StreamsManager, directory: str) -> list[str]:
    """`benthos streams ./dir` bootstrap: every *.yaml becomes a stream
    named after its file stem. Returns the created ids."""
    ids = []
    for fn in sorted(os.listdir(directory)):
        if not fn.endswith((".yaml", ".yml")):
            continue
        sid = os.path.splitext(fn)[0]
        with open(os.path.join(directory, fn)) as f:
            manager.create(sid, f.read())
        ids.append(sid)
    return ids
