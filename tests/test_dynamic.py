"""Dynamic document model on VariantType (the reference's lazy JSON
dual representation + jq/jmespath path extraction)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions import dynamic as dyn


@pytest.fixture(scope="module")
def vdf(spark):
    rows = [
        ('{"user": {"name": "ada", "tags": ["a", "b"], "scores": [9, 7]}, "ok": true}',),
        ('{"user": {"name": "bob", "tags": [], "scores": [1]}, "ok": false}',),
    ]
    return spark.createDataFrame(rows, "j string").select(dyn.parse_dynamic("j").alias("v"))


def test_jq_paths(vdf):
    got = vdf.select(
        dyn.jq("v", ".user.name").alias("name"),
        dyn.jq("v", ".user.scores[0]", "int").alias("s0"),
        dyn.jq("v", ".user.tags[1]").alias("t1"),
        dyn.jq("v", ".ok", "boolean").alias("ok"),
        dyn.jq("v", ".missing.path").alias("m"),
    ).collect()
    assert (got[0]["name"], got[0]["s0"], got[0]["t1"], got[0]["ok"], got[0]["m"]) == (
        "ada", 9, "b", True, None,
    )
    assert got[1]["t1"] is None  # short array -> null, no error (try_)


def test_jmespath_without_dot(vdf):
    got = vdf.select(dyn.jmespath("v", "user.name").alias("n")).collect()
    assert [r["n"] for r in got] == ["ada", "bob"]


def test_roundtrip_and_schema(vdf):
    j = vdf.select(dyn.to_json_dynamic("v").alias("j")).collect()[0]["j"]
    assert json.loads(j)["user"]["name"] == "ada"
    sch = vdf.select(dyn.schema_of("v").alias("s")).collect()[0]["s"]
    assert "OBJECT" in sch and "user" in sch


def test_explode_array(vdf):
    rows = vdf.select(dyn.explode_array("v", ".user.tags").alias("tag"))
    tags = [r["tag"] for r in rows.collect()]
    assert sorted(dyn.to_json_dynamic(F.lit(None)) is not None for _ in []) == []  # noqa: trivial
    assert len(tags) == 2  # ada's two tags; bob's empty array contributes none


def test_jq_path_compiler():
    assert dyn.jq_path(".a.b[0].c") == "$.a.b[0].c"
    assert dyn.jq_path("$.x") == "$.x"
    with pytest.raises(ValueError):
        dyn.jq_path("a.b")
