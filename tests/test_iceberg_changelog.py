"""Row-level changelog scan (iceberg/table.py changelog_scan) — the
engine-native analog of Iceberg's create_changelog_view procedure."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from benthos_spark.iceberg import IcebergTable


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="bs_chlog_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, keys, val="a"):
    return spark.createDataFrame([(k, val) for k in keys], "k long, val string")


def _chg(df):
    return sorted(
        (r["_commit_order"], r["_change_type"], r["k"], r["val"])
        for r in df.collect()
    )


def test_append_only_changelog(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    s1 = t.append(_df(spark, [1, 2], "a"))
    s2 = t.append(_df(spark, [3], "b"))
    out = _chg(t.changelog_scan(spark))
    assert out == [
        (1, "insert", 1, "a"),
        (1, "insert", 2, "a"),
        (2, "insert", 3, "b"),
    ]
    # window (s1, s2] only sees the second commit
    out2 = _chg(t.changelog_scan(spark, after_snapshot_id=s1, until_snapshot_id=s2))
    assert out2 == [(1, "insert", 3, "b")]


def test_upsert_emits_delete_plus_insert(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    s1 = t.append(_df(spark, [1, 2, 3], "a"))
    # update k=2, add k=9
    t.upsert(spark, _df(spark, [2, 9], "new"), on=["k"])
    out = _chg(t.changelog_scan(spark, after_snapshot_id=s1))
    assert out == [
        (1, "delete", 2, "a"),  # pre-image of the updated row
        (1, "insert", 2, "new"),
        (1, "insert", 9, "new"),
    ]


def test_delete_where_emits_preimages(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    s1 = t.append(_df(spark, [1, 2, 3, 4], "a"))
    t.delete_where(spark, "k >= 3")
    out = _chg(t.changelog_scan(spark, after_snapshot_id=s1))
    assert out == [(1, "delete", 3, "a"), (1, "delete", 4, "a")]


def test_equality_delete_scopes_to_parent_live(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    s1 = t.append(_df(spark, [1, 2], "a"))
    t.equality_delete(spark, _df(spark, [2, 99], "x").select("k"), on=["k"])
    out = _chg(t.changelog_scan(spark, after_snapshot_id=s1))
    # k=99 never existed: no phantom delete row
    assert out == [(1, "delete", 2, "a")]


def test_full_overwrite_emits_all_preimages(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    s1 = t.append(_df(spark, [1, 2], "a"))
    t.overwrite(_df(spark, [7], "b"))
    out = _chg(t.changelog_scan(spark, after_snapshot_id=s1))
    assert out == [
        (1, "delete", 1, "a"),
        (1, "delete", 2, "a"),
        (1, "insert", 7, "b"),
    ]


def test_compaction_and_rewrite_emit_nothing(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    t.append(_df(spark, [1], "a"))
    s2 = t.append(_df(spark, [2], "a"))
    t.compact(spark)
    t.rewrite_manifests()
    out = _chg(t.changelog_scan(spark, after_snapshot_id=s2))
    assert out == []


def test_changelog_replays_to_current_state(spark, tmpdir):
    # the fundamental invariant: applying the changelog in commit order
    # (delete pre-images, add inserts) reproduces the live table
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    t.append(_df(spark, [1, 2, 3], "a"))
    t.append(_df(spark, [4, 5], "b"))
    t.upsert(spark, _df(spark, [2, 6], "u"), on=["k"])
    t.delete_where(spark, "k = 4")
    chg = t.changelog_scan(spark).collect()
    state: dict[tuple, int] = {}
    for r in sorted(chg, key=lambda r: r["_commit_order"]):
        key = (r["k"], r["val"])
        if r["_change_type"] == "insert":
            state[key] = state.get(key, 0) + 1
        else:
            state[key] -= 1
            if state[key] == 0:
                del state[key]
    live = {(r["k"], r["val"]) for r in t.scan(spark).collect()}
    assert set(state) == live and all(v == 1 for v in state.values())


def test_empty_table_changelog(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    df = t.changelog_scan(spark)
    assert df.count() == 0
    assert "_change_type" in df.columns and "_commit_order" in df.columns


def test_merge_rows_position_delete_preimages(spark, tmpdir):
    t = IcebergTable.create(tmpdir + "/t", _df(spark, [0]).schema)
    s1 = t.append(_df(spark, [1, 2, 3], "a"))
    # merge_rows: position-delete the old images of keys 1,3 + append news
    t.merge_rows(
        spark,
        delete_keys=_df(spark, [1, 3], "x").select("k"),
        append_df=_df(spark, [1, 3], "m"),
        on=["k"],
    )
    out = _chg(t.changelog_scan(spark, after_snapshot_id=s1))
    assert out == [
        (1, "delete", 1, "a"),
        (1, "delete", 3, "a"),
        (1, "insert", 1, "m"),
        (1, "insert", 3, "m"),
    ]
