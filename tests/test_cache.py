"""Cache & rate-limit resources (SURVEY.md §2.6)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from benthos_spark.operators.cache import (
    CacheGet,
    CacheWriteSink,
    FileCache,
    LRUCache,
    MemoryCache,
    MultilevelCache,
    TokenBucket,
    TTLCache,
    admission_options,
)


def test_memory_cache_add_semantics():
    c = MemoryCache()
    assert c.add("k", 1)
    assert not c.add("k", 2)  # dedupe primitive: second add fails
    assert c.get("k") == 1
    c.delete("k")
    assert c.get("k") is None


def test_lru_eviction():
    c = LRUCache(capacity=2)
    c.set("a", 1)
    c.set("b", 2)
    c.get("a")  # refresh a
    c.set("c", 3)  # evicts b
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3


def test_ttl_expiry():
    c = TTLCache(ttl_s=0.2)
    c.set("k", 42)
    assert c.get("k") == 42
    time.sleep(0.3)
    assert c.get("k") is None


def test_file_cache_roundtrip(tmp_path):
    c = FileCache(str(tmp_path / "fc"))
    c.set("weird/key name", {"x": 1})
    assert c.get("weird/key name") == {"x": 1}
    assert dict(c.items())  # listable
    c.delete("weird/key name")
    assert c.get("weird/key name") is None


def test_multilevel_write_back():
    l1, l2 = MemoryCache(), MemoryCache()
    ml = MultilevelCache(l1, l2)
    l2.set("k", 7)
    assert ml.get("k") == 7
    assert l1.get("k") == 7  # promoted to the upper level


def test_cache_get_enrichment(spark):
    cache = MemoryCache()
    cache.set("alpha", "A")
    cache.set("beta", "B")
    df = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "key string")
    out = CacheGet(cache, key_col="key", value_col="val")(df)
    got = {r["key"]: r["val"] for r in out.collect()}
    assert got == {"alpha": "A", "beta": "B", "gamma": None}


def test_cache_write_sink(spark):
    cache = MemoryCache()
    df = spark.createDataFrame([("k1", 10), ("k2", 20)], "k string, v int")
    CacheWriteSink(cache, "k", "v")(df, batch_id=0)
    assert cache.get("k1") == 10 and cache.get("k2") == 20


def test_cache_write_sink_scale_guard(spark):
    """A data-plane-sized batch must NOT materialize into the driver-side
    cache: the sink streams via toLocalIterator and refuses once max_rows
    is crossed, pointing at the exactly-once table / state-store path."""
    import pytest

    cache = MemoryCache()
    big = spark.range(5000).selectExpr("cast(id as string) as k", "id as v")
    sink = CacheWriteSink(cache, "k", "v", max_rows=1000)
    with pytest.raises(ValueError, match="exactly-once table"):
        sink(big, batch_id=0)
    # the guard fired at the bound — the cache holds at most max_rows
    assert len(cache.items()) <= 1000
    # idempotent upsert: the retry with the guard lifted converges
    CacheWriteSink(cache, "k", "v", max_rows=None)(big, batch_id=0)
    assert cache.get("4999") == 4999


def test_token_bucket():
    tb = TokenBucket(count=5, interval_s=0.5)
    assert all(tb.try_acquire() for _ in range(5))
    assert not tb.try_acquire()  # drained
    time.sleep(0.6)
    assert tb.try_acquire()  # refilled


def test_admission_options():
    opts = admission_options(rows_per_sec=1000, trigger_interval_s=2.0, avg_rows_per_file=100)
    assert opts["maxOffsetsPerTrigger"] == "2000"
    assert opts["maxFilesPerTrigger"] == "20"


def test_cache_get_empty_cache_no_phantom(spark):
    """An empty cache snapshot must not invent a ('','') row that
    phantom-matches stream rows keyed by the empty string."""
    cache = MemoryCache()
    df = spark.createDataFrame([("",), ("alpha",)], "key string")
    out = CacheGet(cache, key_col="key", value_col="val")(df)
    got = {r["key"]: r["val"] for r in out.collect()}
    assert got == {"": None, "alpha": None}


def test_cache_get_large_snapshot_not_broadcast(spark):
    """Auto mode must stop hinting a broadcast once the snapshot exceeds
    the row threshold — the reference's cache doubles as a corpus-scale
    dedupe store."""
    from benthos_spark.operators.cache import CacheGet, MemoryCache

    cache = MemoryCache()
    for i in range(50):
        cache.set(f"k{i}", f"v{i}")
    df = spark.createDataFrame([(f"k{i}",) for i in range(5)], "key string")
    # tiny snapshot: hinted
    plan = CacheGet(cache, key_col="key")(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # same snapshot with a tiny threshold: no hint
    plan2 = (
        CacheGet(cache, key_col="key", broadcast_max_rows=10)(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan2
    # explicit override wins either way
    plan3 = (
        CacheGet(cache, key_col="key", broadcast=False)(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan3
