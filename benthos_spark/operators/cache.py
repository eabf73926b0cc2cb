"""Cache & rate-limit resources (SURVEY.md §2.6).

The reference's caches are shared KV resources used for enrichment,
idempotency, and stream-joins (/root/reference/internal/impl/pure/
cache_memory.go:55, cache_lru.go:96, cache_ttlru.go:80,
cache_multilevel.go:49; io/cache_file.go:27). In Spark the same roles
split by access pattern:

- **read-mostly enrichment** → a snapshot DataFrame broadcast-joined
  (:class:`CacheGet`); at 100 TB the "cache" is a dimension table, and
  broadcast is the shuffle-free physical strategy.
- **keyed mutable state** → the state store via
  ``applyInPandasWithState`` (benthos_spark/operators/state.py).
- **control-plane KV** (offsets, idempotency markers, small rollups) →
  the driver-side caches here, which back :class:`CacheWriteSink`.

Rate limits (`local` token bucket, pure/rate_limit_local.go:27) become
admission control: Spark meters ingest per micro-batch
(``maxFilesPerTrigger``/``maxOffsetsPerTrigger``), so the bucket
translates a rows/sec budget into trigger options
(:func:`admission_options`); :class:`TokenBucket` is also usable
directly in driver loops and pandas-UDF workers.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from benthos_spark.operators.processors import Processor


class Cache:
    """KV resource protocol (≙ public/service cache plugin surface):
    get/set/add/delete, `add` failing when present (the dedupe primitive,
    processor_dedupe.go:107-145)."""

    def get(self, key: str) -> Any:  # pragma: no cover
        raise NotImplementedError

    def set(self, key: str, value: Any) -> None:  # pragma: no cover
        raise NotImplementedError

    def add(self, key: str, value: Any) -> bool:
        """Set only if absent; True if stored (≙ cache add op)."""
        if self.get(key) is None:
            self.set(key, value)
            return True
        return False

    def delete(self, key: str) -> None:  # pragma: no cover
        raise NotImplementedError


class MemoryCache(Cache):
    """cache_memory.go:55 — unbounded in-RAM map."""

    def __init__(self) -> None:
        self._d: dict[str, Any] = {}
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            return self._d.get(key)

    def set(self, key, value):
        with self._lock:
            self._d[key] = value

    def delete(self, key):
        with self._lock:
            self._d.pop(key, None)

    def items(self) -> list[tuple[str, Any]]:
        with self._lock:
            return list(self._d.items())


class LRUCache(MemoryCache):
    """cache_lru.go:96 — bounded, least-recently-used eviction."""

    def __init__(self, capacity: int = 1024) -> None:
        super().__init__()
        self._d: OrderedDict[str, Any] = OrderedDict()
        self.capacity = capacity

    def get(self, key):
        with self._lock:
            if key not in self._d:
                return None
            self._d.move_to_end(key)
            return self._d[key]

    def set(self, key, value):
        with self._lock:
            self._d[key] = value
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)


class TTLCache(MemoryCache):
    """cache_ttlru.go:80 — per-entry expiry."""

    def __init__(self, ttl_s: float = 60.0) -> None:
        super().__init__()
        self.ttl_s = ttl_s

    def get(self, key):
        with self._lock:
            hit = self._d.get(key)
            if hit is None:
                return None
            value, stored = hit
            if time.time() - stored > self.ttl_s:
                del self._d[key]
                return None
            return value

    def set(self, key, value):
        with self._lock:
            self._d[key] = (value, time.time())

    def items(self):
        now = time.time()
        with self._lock:
            return [(k, v) for k, (v, t) in self._d.items() if now - t <= self.ttl_s]


class FileCache(Cache):
    """io/cache_file.go:27 — one JSON file per key under a directory
    (atomic rename writes; safe across processes on one node)."""

    def __init__(self, directory: str) -> None:
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, key: str) -> str:
        safe = "".join(c if c.isalnum() or c in "-_." else f"_{ord(c):02x}" for c in key)
        return os.path.join(self.dir, safe + ".json")

    def get(self, key):
        try:
            with open(self._path(key)) as f:
                return json.load(f)["v"]
        except FileNotFoundError:
            return None

    def set(self, key, value):
        tmp = self._path(key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"v": value}, f)
        os.rename(tmp, self._path(key))

    def delete(self, key):
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    def items(self):
        out = []
        for name in os.listdir(self.dir):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append((name[:-5], json.load(f)["v"]))
        return out


class MultilevelCache(Cache):
    """cache_multilevel.go:49 — read through levels, write back up."""

    def __init__(self, *levels: Cache) -> None:
        self.levels = levels

    def get(self, key):
        for i, lvl in enumerate(self.levels):
            v = lvl.get(key)
            if v is not None:
                for upper in self.levels[:i]:
                    upper.set(key, v)
                return v
        return None

    def set(self, key, value):
        for lvl in self.levels:
            lvl.set(key, value)

    def delete(self, key):
        for lvl in self.levels:
            lvl.delete(key)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@dataclass
class CacheGet(Processor):
    """`cache` get-enrichment (processor_cache.go:26): snapshot the cache
    into a DataFrame and join it on ``key_col``.

    The reference's cache doubles as a corpus-scale dedupe/idempotency
    store, so an unconditional broadcast is a footgun. ``broadcast``:
    None (default) hints a broadcast only while the snapshot is small
    (≤ ``broadcast_max_rows``); beyond that the join is left to
    Catalyst/AQE. True forces the hint, False forbids it."""

    cache: Cache
    key_col: str
    value_col: str = "cache_value"
    broadcast: Optional[bool] = None
    broadcast_max_rows: int = 100_000

    def __call__(self, df: DataFrame) -> DataFrame:
        items = self.cache.items()  # type: ignore[attr-defined]
        spark = df.sparkSession
        # Empty cache → truly empty frame (an ("","") sentinel row would
        # phantom-match stream rows whose key is the empty string).
        snap = spark.createDataFrame(
            [(k, json.dumps(v) if not isinstance(v, str) else v) for k, v in items],
            f"{self.key_col} string, {self.value_col} string",
        )
        hint = self.broadcast if self.broadcast is not None else len(items) <= self.broadcast_max_rows
        return df.join(F.broadcast(snap) if hint else snap, on=self.key_col, how="left")


class CacheWriteSink:
    """`cache` output (output_cache.go:26) as a foreachBatch sink:
    upsert (key, value) rows into the resource. Driver-side by design —
    meant for control-plane-sized results (rollups, markers), not the
    data plane; at data-plane scale the 'cache' is a table and the write
    is an exactly-once append.

    ``max_rows`` (default 100k) is the scale guard enforcing that
    contract: the batch streams through ``toLocalIterator`` (never a
    full driver collect) and the sink refuses once the bound is crossed
    instead of silently becoming a driver bottleneck. Cache ``set`` is
    an idempotent upsert, so rows written before the refusal are safe
    under the retry. Pass ``max_rows=None`` to opt out explicitly."""

    def __init__(self, cache: Cache, key_col: str, value_col: str,
                 max_rows: Optional[int] = 100_000):
        self.cache = cache
        self.key_col = key_col
        self.value_col = value_col
        self.max_rows = max_rows

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        for i, row in enumerate(df.select(self.key_col, self.value_col).toLocalIterator()):
            if self.max_rows is not None and i >= self.max_rows:
                raise ValueError(
                    f"CacheWriteSink batch {batch_id} exceeds max_rows="
                    f"{self.max_rows}: the cache output is a control-plane "
                    "sink (rollups, markers, idempotency keys). For "
                    "data-plane-sized keyed state use an exactly-once table "
                    "sink (sinks.exactly_once.ExactlyOnceParquetSink / "
                    "sinks.iceberg) or a stateful operator backed by the "
                    "RocksDB state store (operators.state), or pass "
                    "max_rows=None to accept the driver bottleneck."
                )
            self.cache.set(str(row[self.key_col]), row[self.value_col])


class TokenBucket:
    """`local` rate limit (rate_limit_local.go:27): N tokens per interval;
    ``acquire`` blocks, ``try_acquire`` doesn't."""

    def __init__(self, count: int, interval_s: float):
        self.count = count
        self.interval_s = interval_s
        self._tokens = float(count)
        self._last = time.monotonic()
        self._lock = threading.Lock()

    def _refill(self) -> None:
        now = time.monotonic()
        self._tokens = min(
            float(self.count), self._tokens + (now - self._last) * self.count / self.interval_s
        )
        self._last = now

    def try_acquire(self, n: int = 1) -> bool:
        with self._lock:
            self._refill()
            if self._tokens >= n:
                self._tokens -= n
                return True
            return False

    def acquire(self, n: int = 1) -> None:
        while not self.try_acquire(n):
            time.sleep(self.interval_s / max(self.count, 1))


def admission_options(rows_per_sec: int, trigger_interval_s: float, avg_rows_per_file: int) -> dict:
    """Translate a rows/sec budget into Spark admission-control options
    (the reference throttles per message; Spark meters per micro-batch)."""
    rows_per_trigger = max(1, int(rows_per_sec * trigger_interval_s))
    return {
        "maxOffsetsPerTrigger": str(rows_per_trigger),
        "maxFilesPerTrigger": str(max(1, rows_per_trigger // max(avg_rows_per_file, 1))),
    }
