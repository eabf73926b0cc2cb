"""sql_select / sql_insert / sql_raw over real JDBC (embedded Derby,
shipped in Spark's classpath) — the reference's SQL component surface
(internal/impl/sql/) without network access."""

from __future__ import annotations

import pytest

from benthos_spark.operators.sql import (
    SqlInsertSink,
    SqlRawSource,
    SqlSelect,
    SqlSelectSource,
)


@pytest.fixture(scope="module")
def derby_dsn(tmp_path_factory, spark):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    dsn = f"jdbc:derby:{db};create=true"
    # seed a dimension table through the JDBC writer itself
    dim = spark.createDataFrame(
        [(1, "gold", 0.10), (2, "silver", 0.05), (3, "bronze", 0.01)],
        "TIER_ID int, TIER_NAME string, DISCOUNT double",
    )
    SqlInsertSink(dsn, "tiers", ["TIER_ID", "TIER_NAME", "DISCOUNT"], mode="overwrite").write(dim)
    return dsn


def test_sql_raw_roundtrip(spark, derby_dsn):
    out = SqlRawSource(derby_dsn, "SELECT tier_id, tier_name FROM tiers").read(spark)
    assert {(r["TIER_ID"], r["TIER_NAME"]) for r in out.collect()} == {
        (1, "gold"),
        (2, "silver"),
        (3, "bronze"),
    }


def test_sql_select_source_pushdown(spark, derby_dsn):
    src = SqlSelectSource(
        derby_dsn, "tiers", columns=["tier_id", "discount"], where="discount >= 0.05"
    )
    out = src.read(spark)
    assert out.count() == 2
    assert set(c.upper() for c in out.columns) == {"TIER_ID", "DISCOUNT"}


def test_sql_select_source_partitioned(spark, derby_dsn):
    src = SqlSelectSource(
        derby_dsn,
        "tiers",
        columns=["tier_id", "tier_name"],
        partition_column="tier_id",
        num_partitions=3,
        lower_bound=1,
        upper_bound=4,
    )
    out = src.read(spark)
    assert out.rdd.getNumPartitions() == 3
    assert out.count() == 3


def test_sql_select_processor_enrichment(spark, derby_dsn):
    stream = spark.createDataFrame(
        [("o1", 1), ("o2", 3), ("o3", 1), ("o4", 9)], "order_id string, tier int"
    )
    proc = SqlSelect(
        dsn=derby_dsn,
        table="tiers",
        columns=["TIER_NAME", "DISCOUNT"],
        args_mapping={"tier": "TIER_ID"},
    )
    out = proc(stream)
    got = {r["order_id"]: (r["TIER_NAME"], r["DISCOUNT"]) for r in out.collect()}
    assert got["o1"] == ("gold", 0.10)
    assert got["o2"] == ("bronze", 0.01)
    assert got["o4"] == (None, None)  # left join keeps unmatched (empty result set)


def test_sql_select_processor_plan_is_broadcast(spark, derby_dsn):
    """broadcast_dim=True (a table the user KNOWS is dim-sized) forces
    the broadcast hint."""
    stream = spark.createDataFrame([("o1", 1)], "order_id string, tier int")
    proc = SqlSelect(
        dsn=derby_dsn, table="tiers", columns=["TIER_NAME"],
        args_mapping={"tier": "TIER_ID"}, broadcast_dim=True,
    )
    plan = proc(stream)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_sql_select_default_does_not_force_broadcast(spark, derby_dsn):
    """Default (None): no hint — a JDBC scan has unknown/huge size stats,
    so Catalyst must NOT plan a broadcast of the remote table (pointing
    the processor at a billion-row table would otherwise OOM the
    driver)."""
    stream = spark.createDataFrame([("o1", 1)], "order_id string, tier int")
    proc = SqlSelect(
        dsn=derby_dsn, table="tiers", columns=["TIER_NAME"], args_mapping={"tier": "TIER_ID"}
    )
    plan = proc(stream)._jdf.queryExecution().executedPlan().toString()
    # the STREAM side may be broadcast (it is tiny here); the dim scan
    # (JDBCRelation) must not sit under a BroadcastExchange subtree
    lines = plan.splitlines()

    def node_depth(line):
        m = line.find("+- ")
        m2 = line.find(":- ")
        cands = [x for x in (m, m2) if x >= 0]
        return min(cands) if cands else (-1 if not line.strip() else 0)

    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = node_depth(line)
        for nxt in lines[i + 1:]:
            nd = node_depth(nxt)
            if 0 <= nd <= d:
                break  # subtree ended
            assert "JDBCRelation" not in nxt, (
                "remote table broadcast by default:\n" + plan
            )


def test_sql_insert_append_and_readback(spark, derby_dsn):
    rows = spark.createDataFrame([(10, "x", 0.5)], "TIER_ID int, TIER_NAME string, DISCOUNT double")
    SqlInsertSink(derby_dsn, "tiers", ["TIER_ID", "TIER_NAME", "DISCOUNT"]).write(rows)
    out = SqlRawSource(derby_dsn, "SELECT count(*) AS n FROM tiers").read(spark)
    assert out.collect()[0]["N"] == 4


def test_sql_insert_args_mapping(spark, derby_dsn):
    rows = spark.createDataFrame([(20, "mega")], "i int, nm string")
    SqlInsertSink(
        derby_dsn,
        "tiers",
        ["TIER_ID", "TIER_NAME", "DISCOUNT"],
        args_mapping={"TIER_ID": "i", "TIER_NAME": "upper(nm)", "DISCOUNT": "0.9"},
    ).write(rows)
    out = SqlRawSource(
        derby_dsn, "SELECT tier_name FROM tiers WHERE tier_id = 20"
    ).read(spark)
    assert out.collect()[0]["TIER_NAME"] == "MEGA"
