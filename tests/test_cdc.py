"""CDC changelog source + merge-apply sink (the pg_stream analogue,
/root/reference/internal/impl/postgres_cdc/input.go:184)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.cdc import ChangelogFileSource, MergeApplySink

ROW = "id int, name string, qty int"


def _event(op, lsn, after=None, before=None, envelope=True):
    body = {
        "op": op,
        "ts_ms": 1700000000000 + lsn,
        "before": before,
        "after": after,
        "source": {"lsn": lsn, "table": "items"},
    }
    if envelope:
        return {"payload": body}
    return {"op": op, "lsn": lsn, "ts_ms": body["ts_ms"], "before": before, "after": after}


def _write_events(path, events, files=1):
    os.makedirs(path, exist_ok=True)
    per = max(1, -(-len(events) // files))
    for fi in range(files):
        chunk = events[fi * per:(fi + 1) * per]
        if not chunk:
            continue
        with open(os.path.join(path, f"part-{fi:04d}.json"), "w") as f:
            for e in chunk:
                f.write(json.dumps(e) + "\n")


def test_changelog_source_envelope_and_flat(spark, tmp_path):
    for envelope in (True, False):
        d = str(tmp_path / f"log_{envelope}")
        _write_events(d, [
            _event("c", 1, after={"id": 1, "name": "a", "qty": 5}, envelope=envelope),
            _event("d", 2, before={"id": 1, "name": "a", "qty": 5}, envelope=envelope),
        ])
        out = ChangelogFileSource(d, ROW, envelope=envelope).read(spark).orderBy("lsn").collect()
        assert [r["op"] for r in out] == ["c", "d"]
        assert out[0]["after"]["name"] == "a"
        assert out[1]["after"] is None and out[1]["before"]["id"] == 1


def test_merge_apply_insert_update_delete(spark, tmp_path):
    d = str(tmp_path / "log")
    _write_events(d, [
        _event("c", 1, after={"id": 1, "name": "a", "qty": 5}),
        _event("c", 2, after={"id": 2, "name": "b", "qty": 7}),
        _event("u", 3, after={"id": 1, "name": "a2", "qty": 6}),
        _event("d", 4, before={"id": 2, "name": "b", "qty": 7}),
        _event("c", 5, after={"id": 3, "name": "c", "qty": 1}),
    ])
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=4)
    sink(ChangelogFileSource(d, ROW).read(spark), 0)
    got = {r["id"]: (r["name"], r["qty"]) for r in sink.read_state(spark).collect()}
    assert got == {1: ("a2", 6), 3: ("c", 1)}


def test_merge_apply_latest_lsn_wins_within_batch(spark, tmp_path):
    d = str(tmp_path / "log")
    _write_events(d, [
        _event("u", 9, after={"id": 1, "name": "late", "qty": 9}),
        _event("c", 1, after={"id": 1, "name": "first", "qty": 1}),
        _event("u", 5, after={"id": 1, "name": "mid", "qty": 5}),
    ])
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=4)
    sink(ChangelogFileSource(d, ROW).read(spark), 0)
    rows = sink.read_state(spark).collect()
    assert len(rows) == 1 and rows[0]["name"] == "late"


def test_merge_apply_stale_event_cannot_regress(spark, tmp_path):
    """An event redelivered across batches with a LOWER lsn than the
    stored row must not overwrite it (at-least-once safety)."""
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=4)
    d1 = str(tmp_path / "log1")
    _write_events(d1, [_event("u", 10, after={"id": 1, "name": "new", "qty": 2})])
    sink(ChangelogFileSource(d1, ROW).read(spark), 0)
    d2 = str(tmp_path / "log2")
    _write_events(d2, [_event("u", 3, after={"id": 1, "name": "stale", "qty": 1})])
    sink(ChangelogFileSource(d2, ROW).read(spark), 1)
    rows = sink.read_state(spark).collect()
    assert len(rows) == 1 and rows[0]["name"] == "new"


def test_merge_apply_replay_idempotent(spark, tmp_path):
    d = str(tmp_path / "log")
    _write_events(d, [
        _event("c", 1, after={"id": 1, "name": "a", "qty": 5}),
    ])
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=4)
    batch = ChangelogFileSource(d, ROW).read(spark)
    sink(batch, 0)
    man1 = sink._manifest()
    sink(batch, 0)  # replay — exactly-once skip
    assert sink._manifest() == man1
    assert sink.read_state(spark).count() == 1


def test_merge_apply_untouched_buckets_carried_forward(spark, tmp_path):
    """A batch only rewrites the buckets it touches — the manifest must
    reference other buckets' prior directories unchanged."""
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=8)
    d1 = str(tmp_path / "log1")
    _write_events(d1, [
        _event("c", i, after={"id": i, "name": f"n{i}", "qty": i}) for i in range(1, 17)
    ])
    sink(ChangelogFileSource(d1, ROW).read(spark), 0)
    man1 = dict(sink._manifest()["buckets"])
    d2 = str(tmp_path / "log2")
    _write_events(d2, [_event("u", 100, after={"id": 1, "name": "upd", "qty": 0})])
    sink(ChangelogFileSource(d2, ROW).read(spark), 1)
    man2 = dict(sink._manifest()["buckets"])
    changed = {b for b in man2 if man1.get(b) != man2[b]}
    assert len(changed) == 1  # only id=1's bucket rewritten
    unchanged = {b for b in man1 if man1[b] == man2.get(b)}
    assert unchanged  # prior directories carried forward by reference
    got = {r["id"]: r["name"] for r in sink.read_state(spark).collect()}
    assert got[1] == "upd" and len(got) == 16


def test_merge_apply_streaming_kill_resume(spark, tmp_path):
    """Stream the changelog file-by-file with a stop/restart on the same
    checkpoint: the applied table must equal the full replay exactly."""
    import time

    d = str(tmp_path / "log")
    events = []
    lsn = 0
    for i in range(1, 31):
        lsn += 1
        events.append(_event("c", lsn, after={"id": i, "name": f"n{i}", "qty": i}))
    for i in range(1, 31, 3):
        lsn += 1
        events.append(_event("u", lsn, after={"id": i, "name": f"u{i}", "qty": i * 10}))
    for i in range(2, 31, 7):
        lsn += 1
        events.append(_event("d", lsn, before={"id": i, "name": "", "qty": 0}))
    _write_events(d, events, files=6)

    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    src = ChangelogFileSource(d, ROW, streaming=True, max_files_per_trigger=1)

    q = (
        src.read(spark)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while not sink.committed_batches() and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)
    assert sink.committed_batches(), "no batch committed before the kill"

    q2 = (
        src.read(spark)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    # oracle replay: last event per id, deletes drop the key
    last = {}
    for e in events:
        p = e["payload"]
        key = (p["after"] or p["before"])["id"]
        last[key] = p
    want = {
        k: (p["after"]["name"], p["after"]["qty"])
        for k, p in last.items()
        if p["op"] != "d"
    }
    got = {r["id"]: (r["name"], r["qty"]) for r in sink.read_state(spark).collect()}
    assert got == want


def test_cdc_config_surface(spark, tmp_path):
    """changelog input + merge_apply output through the YAML config."""
    from benthos_spark.config import run_config

    d = str(tmp_path / "log")
    _write_events(d, [
        _event("c", 1, after={"id": 1, "name": "a", "qty": 5}),
        _event("u", 2, after={"id": 1, "name": "a2", "qty": 6}),
    ])
    state_dir = str(tmp_path / "state")
    conf = {
        "input": {"changelog": {"path": d, "row_schema": ROW, "streaming": True,
                                "max_files_per_trigger": 1}},
        "output": {"merge_apply": {"dir": state_dir, "pk": ["id"], "n_buckets": 2}},
    }
    from benthos_spark.streaming.pipeline import run_to_completion

    q = run_config(spark, conf, checkpoint=str(tmp_path / "ckpt"))
    run_to_completion(q)
    sink = MergeApplySink(state_dir, pk_cols=["id"], n_buckets=2)
    rows = sink.read_state(spark).collect()
    assert len(rows) == 1 and rows[0]["name"] == "a2"


def test_merge_apply_schema_evolution(spark, tmp_path):
    """A changelog that grows a column merges over old state: historical
    rows read back with the new column null."""
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=2)
    d1 = str(tmp_path / "log1")
    _write_events(d1, [_event("c", 1, after={"id": 1, "name": "a", "qty": 5})])
    sink(ChangelogFileSource(d1, ROW).read(spark), 0)
    d2 = str(tmp_path / "log2")
    _write_events(d2, [_event("c", 2, after={"id": 2, "name": "b", "qty": 1,
                                             "lang": "en"})])
    sink(ChangelogFileSource(d2, ROW + ", lang string").read(spark), 1)
    got = {r["id"]: r.asDict() for r in sink.read_state(spark).collect()}
    assert got[1]["lang"] is None and got[2]["lang"] == "en"
    assert got[1]["name"] == "a" and got[2]["name"] == "b"


def test_merge_apply_auto_compaction(spark, tmp_path):
    """auto_compact_every triggers compaction inside the foreachBatch
    hook: tombstones older than the retention horizon (relative to the
    manifest's max applied LSN) are expired, fresh ones survive, and the
    next batch applies normally against the compacted snapshot."""
    sink = MergeApplySink(
        str(tmp_path / "state"), pk_cols=["id"], n_buckets=2,
        auto_compact_every=2, tombstone_retention=5,
    )
    d1 = str(tmp_path / "log1")
    _write_events(d1, [
        _event("c", 1, after={"id": 1, "name": "a", "qty": 1}),
        _event("c", 2, after={"id": 2, "name": "b", "qty": 2}),
        _event("d", 3, before={"id": 2, "name": "b", "qty": 2}),
    ])
    sink(ChangelogFileSource(d1, ROW).read(spark), 0)  # no compact yet (1st batch)
    man = sink._manifest()
    assert man["max_order"] == 3
    assert spark.read.parquet(*man["buckets"].values()).filter("_deleted").count() == 1
    d2 = str(tmp_path / "log2")
    _write_events(d2, [
        _event("c", 20, after={"id": 3, "name": "c", "qty": 3}),
        _event("d", 21, before={"id": 3, "name": "c", "qty": 3}),
    ])
    sink(ChangelogFileSource(d2, ROW).read(spark), 1)  # 2nd batch -> auto compact
    man = sink._manifest()
    assert man["max_order"] == 21
    raw = spark.read.parquet(*man["buckets"].values())
    # id=2's tombstone (lsn 3 < 21-5) expired; id=3's (lsn 21) survives
    tombs = [r["id"] for r in raw.filter("_deleted").collect()]
    assert tombs == [3]
    # late replay of the expired delete's victim cannot resurrect id=3
    # (its tombstone is still in state), and the stream continues fine
    d3 = str(tmp_path / "log3")
    _write_events(d3, [_event("c", 20, after={"id": 3, "name": "zombie", "qty": 9})])
    sink(ChangelogFileSource(d3, ROW).read(spark), 2)
    assert sorted(r["id"] for r in sink.read_state(spark).collect()) == [1]


def test_merge_apply_type_widening(spark, tmp_path):
    """int→long evolution: old buckets store qty as int, a later
    changelog declares it bigint with a value beyond int range — state
    reads back widened, the merge keeps both rows, and the PK's bucket
    assignment is stable across the widening (string-canonical hash)."""
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=2)
    d1 = str(tmp_path / "log1")
    _write_events(d1, [
        _event("c", 1, after={"id": 1, "name": "a", "qty": 5}),
        _event("c", 2, after={"id": 2, "name": "b", "qty": 7}),
    ])
    sink(ChangelogFileSource(d1, ROW).read(spark), 0)
    big = 9_000_000_000  # > 2^31
    d2 = str(tmp_path / "log2")
    _write_events(d2, [
        _event("u", 3, after={"id": 1, "name": "a2", "qty": big}),
        _event("c", 4, after={"id": 3, "name": "c", "qty": 1}),
    ])
    wide = "id bigint, name string, qty bigint"
    sink(ChangelogFileSource(d2, wide).read(spark), 1)
    state = sink.read_state(spark)
    assert dict(state.dtypes)["qty"] == "bigint"
    got = {r["id"]: r.asDict() for r in state.collect()}
    assert got[1]["qty"] == big and got[1]["name"] == "a2"
    assert got[2]["qty"] == 7  # untouched narrow-schema row survives
    assert got[3]["qty"] == 1
    # the id=1 update REPLACED the old row (same bucket despite the
    # int→bigint pk widening) — no duplicate key anywhere
    assert state.count() == 3
    # a pre-widening LSN can still not regress a widened row
    d3 = str(tmp_path / "log3")
    _write_events(d3, [_event("u", 2, after={"id": 1, "name": "stale", "qty": 0})])
    sink(ChangelogFileSource(d3, wide).read(spark), 2)
    assert sink.read_state(spark).filter("id = 1").collect()[0]["name"] == "a2"
    # incompatible narrowing (bigint → string) raises, never corrupts
    d4 = str(tmp_path / "log4")
    _write_events(d4, [_event("u", 9, after={"id": 1, "name": "x", "qty": "NaN"})])
    with pytest.raises(Exception, match="incompatible schema evolution"):
        sink(ChangelogFileSource(d4, "id bigint, name string, qty string").read(spark), 3)


def test_merge_apply_compaction_expires_tombstones(spark, tmp_path):
    sink = MergeApplySink(str(tmp_path / "state"), pk_cols=["id"], n_buckets=2)
    d1 = str(tmp_path / "log1")
    _write_events(d1, [
        _event("c", 1, after={"id": 1, "name": "a", "qty": 5}),
        _event("c", 2, after={"id": 2, "name": "b", "qty": 6}),
        _event("d", 3, before={"id": 2, "name": "b", "qty": 6}),
    ])
    sink(ChangelogFileSource(d1, ROW).read(spark), 0)
    # tombstone for id=2 is in state (protected against late arrivals)
    man = sink._manifest()
    raw = spark.read.parquet(*man["buckets"].values())
    assert raw.filter("_deleted").count() == 1
    kept = sink.compact(spark, expire_tombstones_below=10)
    assert sum(kept.values()) == 1  # only the live row remains
    rows = sink.read_state(spark).collect()
    assert len(rows) == 1 and rows[0]["id"] == 1
    # stream resumes against the compacted snapshot: replay of batch 0
    # skips (ledger), a new batch applies normally
    d2 = str(tmp_path / "log2")
    _write_events(d2, [_event("c", 20, after={"id": 3, "name": "c", "qty": 1})])
    sink(ChangelogFileSource(d2, ROW).read(spark), 1)
    assert sink.read_state(spark).count() == 2
