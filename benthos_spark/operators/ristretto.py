"""`ristretto` cache (internal/impl/dgraph/cache_ristretto.go) — the
reference embeds dgraph-io/ristretto; here the cache's published
DESIGN (the ristretto paper / README: a count-min-sketch frequency
estimator feeding a TinyLFU admission policy over a sampled-LFU
eviction, with a doorkeeper bloom filter in front) is implemented from
scratch in plain Python.

Semantics kept from the reference surface: get/set/add/delete with an
optional ``default_ttl``, and get retries (cache_ristretto.go exposes
retry knobs because ristretto sets are asynchronous; here sets are
synchronous so retries exist for interface parity and are tested as a
no-op path). `add` is set-if-absent under the instance lock — the
dedupe primitive. ADMISSION means a set may be REJECTED when the cache
is full and the incoming key's estimated frequency does not beat the
sampled victim's — callers that need guaranteed storage (the reference
docs say the same) should size ``max_cost`` accordingly."""

from __future__ import annotations

import threading
import time
from typing import Any, Optional

from benthos_spark.operators.cache import Cache


class _CountMinSketch:
    """4-row count-min with 4-bit counters and periodic halving (the
    ristretto/TinyLFU aging scheme)."""

    def __init__(self, width: int):
        self.width = max(64, width)
        self.rows = [[0] * self.width for _ in range(4)]
        self.adds = 0

    def _idx(self, h: int, row: int) -> int:
        return (h >> (row * 16)) % self.width

    def increment(self, h: int) -> None:
        for r in range(4):
            i = self._idx(h, r)
            if self.rows[r][i] < 15:
                self.rows[r][i] += 1
        self.adds += 1
        if self.adds >= self.width * 10:  # reset window -> halve
            for row in self.rows:
                for i in range(self.width):
                    row[i] >>= 1
            self.adds >>= 1

    def estimate(self, h: int) -> int:
        return min(self.rows[r][self._idx(h, r)] for r in range(4))


class RistrettoCache(Cache):
    """TinyLFU-admission, cost-bounded KV cache."""

    def __init__(self, max_cost: int = 1 << 20, counters: int = 4096,
                 default_ttl_s: Optional[float] = None,
                 get_retries: int = 0, retry_period_s: float = 0.05):
        self.max_cost = max_cost
        self.default_ttl_s = default_ttl_s
        self.get_retries, self.retry_period_s = get_retries, retry_period_s
        self._sketch = _CountMinSketch(counters)
        self._door: set[int] = set()  # doorkeeper bloom (exact set: small N)
        self._data: dict[str, tuple[Any, int, float]] = {}  # key -> (val, cost, expiry)
        self._cost = 0
        self._lock = threading.Lock()

    @staticmethod
    def _hash(key: str) -> int:
        import hashlib

        return int.from_bytes(hashlib.blake2b(key.encode(), digest_size=8).digest(), "big")

    def _touch(self, h: int) -> None:
        if h in self._door:
            self._sketch.increment(h)
        else:
            self._door.add(h)
            if len(self._door) > self._sketch.width * 4:
                self._door.clear()  # doorkeeper reset window

    def _expired(self, key: str) -> bool:
        v = self._data.get(key)
        return v is not None and v[2] and v[2] <= time.monotonic()

    def get(self, key: str) -> Any:
        h = self._hash(key)
        for attempt in range(self.get_retries + 1):
            with self._lock:
                self._touch(h)
                if self._expired(key):
                    _, cost, _ = self._data.pop(key)
                    self._cost -= cost
                hit = self._data.get(key)
                if hit is not None:
                    return hit[0]
            if attempt < self.get_retries:
                time.sleep(self.retry_period_s)
        return None

    def _evict_for(self, h: int, cost: int) -> bool:
        """Sampled-LFU eviction with TinyLFU admission: evict victims
        with lower estimated frequency; reject the incoming key if a
        sampled victim beats it."""
        incoming = self._sketch.estimate(h)
        while self._cost + cost > self.max_cost:
            if not self._data:
                return cost <= self.max_cost
            sample = list(self._data.items())[:5]
            victim_key, (_, victim_cost, _) = min(
                sample, key=lambda kv: self._sketch.estimate(self._hash(kv[0])))
            if self._sketch.estimate(self._hash(victim_key)) > incoming:
                return False  # admission denied
            self._data.pop(victim_key)
            self._cost -= victim_cost
        return True

    def _set_locked(self, key: str, value: Any) -> bool:
        h = self._hash(key)
        self._touch(h)
        cost = len(str(value)) + len(key)
        if key in self._data:
            self._cost -= self._data[key][1]
            self._data.pop(key)
        if not self._evict_for(h, cost):
            return False
        expiry = (time.monotonic() + self.default_ttl_s
                  if self.default_ttl_s else 0.0)
        self._data[key] = (value, cost, expiry)
        self._cost += cost
        return True

    def set(self, key: str, value: Any) -> None:
        with self._lock:
            self._set_locked(key, value)

    def add(self, key: str, value: Any) -> bool:
        with self._lock:
            if key in self._data and not self._expired(key):
                return False
            return self._set_locked(key, value)

    def delete(self, key: str) -> None:
        with self._lock:
            hit = self._data.pop(key, None)
            if hit is not None:
                self._cost -= hit[1]
