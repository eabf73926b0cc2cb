"""memcached cache backend over the from-scratch text protocol
(functions/memcached_proto.py, operators/memcached.py) — the analog of
the reference's memcached cache integration tests
(internal/impl/memcached/cache_test.go) over an in-process server."""

from __future__ import annotations

import threading
import time

import pytest

from benthos_spark.functions.memcached_proto import (MemcachedClient,
                                                     MiniMemcachedServer)
from benthos_spark.operators.memcached import MemcachedCache


@pytest.fixture()
def server():
    srv = MiniMemcachedServer()
    yield srv
    srv.stop()


def test_client_set_get_delete(server):
    c = MemcachedClient([server.address])
    assert c.get("missing") is None
    c.set("k", b"hello")
    assert c.get("k") == b"hello"
    assert c.delete("k") is True
    assert c.delete("k") is False
    assert c.get("k") is None
    c.close()


def test_client_add_is_conditional(server):
    c = MemcachedClient([server.address])
    assert c.add("once", b"1") is True
    assert c.add("once", b"2") is False
    assert c.get("once") == b"1"
    c.close()


def test_client_exptime_expires(server):
    c = MemcachedClient([server.address])
    c.set("ttl", b"v", exptime_s=1)
    assert c.get("ttl") == b"v"
    time.sleep(1.2)
    assert c.get("ttl") is None
    # an expired key is add-able again (reference dedupe-window semantics)
    assert c.add("ttl", b"w") is True
    c.close()


def test_client_binary_safe_values(server):
    c = MemcachedClient([server.address])
    blob = bytes(range(256)) + b"\r\nEND\r\n" + bytes(range(256))
    c.set("bin", blob)
    assert c.get("bin") == blob
    c.close()


def test_client_reconnects_after_server_drop(server):
    c = MemcachedClient([server.address])
    c.set("k", b"v")
    # kill the pooled connection server-side; client must reconnect
    for s in list(c._socks.values()):
        s.close()
    c._socks.clear()
    assert c.get("k") == b"v"
    c.close()


def test_cache_resource_roundtrip(server):
    cache = MemcachedCache([server.address], prefix="ns:")
    cache.set("a", {"x": 1})
    assert cache.get("a") == {"x": 1}
    assert cache.add("a", 2) is False
    assert cache.add("b", [1, 2]) is True
    assert cache.get("b") == [1, 2]
    cache.delete("a")
    assert cache.get("a") is None
    # prefix actually namespaces the stored key
    assert any(k.startswith("ns:") for k in server.store)
    cache.close()


def test_cache_concurrent_add_single_winner(server):
    cache = MemcachedCache([server.address])
    wins = []

    def worker(i):
        if cache.add("lock", i):
            wins.append(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert cache.get("lock") == wins[0]
    cache.close()


def test_config_dispatch(server):
    from benthos_spark.config import _cache_resource

    cache = _cache_resource({
        "label": "mc",
        "memcached": {"addresses": [server.address], "prefix": "p:"},
    })
    cache.set("k", "v")
    assert cache.get("k") == "v"


def test_multi_address_key_affinity():
    s1, s2 = MiniMemcachedServer(), MiniMemcachedServer()
    try:
        c = MemcachedClient([s1.address, s2.address])
        for i in range(32):
            c.set(f"key{i}", str(i).encode())
        for i in range(32):
            assert c.get(f"key{i}") == str(i).encode()
        # keys actually spread over both servers
        assert s1.store and s2.store
        c.close()
    finally:
        s1.stop()
        s2.stop()
