"""`memcached` cache resource (internal/impl/memcached/cache.go:16)
over the from-scratch text-protocol client in
functions/memcached_proto.py.

Reference semantics preserved: ``addresses`` accepts a list with
comma-joined entries (cache.go:90-97 splits them), ``prefix``
namespaces every key (cache.go:113-126 prepends it on every verb),
``default_ttl`` becomes the exptime SECONDS memcached stores
(cache.go:114-118 truncates ms→s), and ``add`` maps to the protocol's
`add` verb so the dedupe primitive stays a single server-side
conditional store (cache.go AddWithTTL → memcache.Add →
ErrNotStored)."""

from __future__ import annotations

import json
from typing import Any, Optional

from benthos_spark.functions.memcached_proto import MemcachedClient
from benthos_spark.operators.cache import Cache


class MemcachedCache(Cache):
    def __init__(self, addresses: list[str], prefix: str = "",
                 default_ttl_s: int = 0, timeout_s: float = 5.0):
        self.prefix = prefix
        self.default_ttl_s = int(default_ttl_s)
        self._client = MemcachedClient(addresses, timeout_s=timeout_s)

    def _k(self, key: str) -> str:
        return self.prefix + key

    def get(self, key: str) -> Any:
        raw = self._client.get(self._k(key))
        return None if raw is None else json.loads(raw)["v"]

    def set(self, key: str, value: Any) -> None:
        self._client.set(self._k(key), json.dumps({"v": value}).encode(),
                         exptime_s=self.default_ttl_s)

    def add(self, key: str, value: Any) -> bool:
        return self._client.add(self._k(key), json.dumps({"v": value}).encode(),
                                exptime_s=self.default_ttl_s)

    def delete(self, key: str) -> None:
        self._client.delete(self._k(key))

    def close(self) -> None:
        self._client.close()
