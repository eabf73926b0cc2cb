"""YAML config compiler (the `benthos -c config.yaml` surface,
internal/cli/run.go:282 + stream_builder.go): config -> Pipeline + sink,
compile-time lint on unknown components."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benthos_spark.config import ConfigError, compile_config, run_config
from benthos_spark.datagen.clips import generate_clips


@pytest.fixture(scope="module")
def clips_parquet(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cfg_src"))
    generate_clips(spark, 100, partitions=2).write.mode("overwrite").parquet(d)
    return d


def test_batch_config_end_to_end(spark, clips_parquet, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = f"""
input:
  parquet: {{path: {clips_parquet}}}
pipeline:
  processors:
    - mutation: {{n_words: "size(split(transcript, ' '))"}}
    - filter: "dur_ms < 10000"
output:
  exactly_once: {{dir: {out_dir}}}
"""
    run_config(spark, cfg, checkpoint=str(tmp_path / "ckpt"))
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(out_dir)
    got = sink.read_committed(spark)
    assert "n_words" in got.columns
    assert got.filter(F.col("dur_ms") >= 10000).count() == 0
    assert got.count() > 0


def test_streaming_config_with_window(spark, clips_parquet, tmp_path):
    from benthos_spark.datagen.clips import write_sentinel

    write_sentinel(spark, clips_parquet)
    out_dir = str(tmp_path / "out")
    cfg = f"""
input:
  parquet: {{path: {clips_parquet}, streaming: true}}
pipeline:
  processors:
    - window_agg:
        ts_col: event_ts
        size: 1 minute
        lateness: 30 seconds
        group_by: [codec]
        aggs: {{n_clips: "count(1)"}}
output:
  exactly_once: {{dir: {out_dir}}}
"""
    from benthos_spark.streaming.pipeline import run_to_completion

    q = run_config(spark, cfg, checkpoint=str(tmp_path / "ckpt"))
    run_to_completion(q, timeout_s=300)
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink

    got = ExactlyOnceParquetSink(out_dir).read_committed(spark)
    n = (
        got.filter(F.col("codec") != "_sentinel")
        .agg(F.sum("n_clips"))
        .collect()[0][0]
    )
    assert n == 100


def test_switch_output_config(spark, clips_parquet, tmp_path):
    cfg = {
        "input": {"parquet": {"path": clips_parquet}},
        "output": {
            "switch": {
                "cases": [
                    {"check": "codec = 'pcm_s16le'",
                     "output": {"exactly_once": {"dir": str(tmp_path / "hot")}}},
                ],
                "default": {"exactly_once": {"dir": str(tmp_path / "rest")}},
            }
        },
    }
    run_config(spark, cfg, checkpoint=str(tmp_path / "ckpt"))
    from benthos_spark.sinks.exactly_once import ExactlyOnceParquetSink

    hot = ExactlyOnceParquetSink(str(tmp_path / "hot")).read_committed(spark)
    assert hot.filter(F.col("codec") != "pcm_s16le").count() == 0


def test_unknown_component_lint():
    with pytest.raises(ConfigError, match="unknown processor 'frobnicate'"):
        compile_config(
            {"input": {"parquet": {"path": "/x"}},
             "pipeline": {"processors": [{"frobnicate": {}}]},
             "output": {"drop": {}}}
        )
    with pytest.raises(ConfigError, match="unknown input"):
        compile_config({"input": {"solace": {}}, "output": {"drop": {}}})
    # kafka exists since round 5 — an empty block now fails its own
    # required-field lint rather than the unknown-component one
    with pytest.raises(ConfigError, match="kafka input needs"):
        compile_config({"input": {"kafka": {}}, "output": {"drop": {}}})
    with pytest.raises(ConfigError, match="needs"):
        compile_config({"input": {"parquet": {"path": "/x"}}})


def test_examples_compile(spark):
    """Every shipped example YAML must pass the compile-time lint."""
    import glob

    from benthos_spark.config import compile_config

    paths = sorted(glob.glob("/root/repo/examples/*.yaml"))
    assert len(paths) >= 4
    for p in paths:
        with open(p) as f:
            pipe, sink = compile_config(f.read())
        assert pipe is not None and sink is not None


def test_config_jq_processor(spark, tmp_path):
    import json

    from benthos_spark.config import _proc

    proc = _proc({"jq": "select(.n > 1) | {big: .n}"})
    df = spark.createDataFrame([('{"n": 1}',), ('{"n": 5}',)], "value string")
    rows = [json.loads(r["value"]) for r in proc(df).collect()]
    assert rows == [{"big": 5}]


def test_config_bloblang_mapping_string(spark):
    from benthos_spark.config import _proc

    proc = _proc({"mapping": "root.out = this.v * 3"})
    df = spark.createDataFrame([(2,), (3,)], "v int")
    assert sorted(r["out"] for r in proc(df).collect()) == [6, 9]


def test_config_resources_cache_enrichment(spark):
    """cache_resources + `cache` processor by `resource:` label
    (config/examples/joining_streams.yaml shape)."""
    import json

    from benthos_spark.config import compile_config

    conf = {
        "input": {"generate": {"count": 3, "streaming": False,
                               "mapping": {"key": "concat('k', value)"}}},
        "pipeline": {"processors": [
            {"cache": {"resource": "hydration", "key": "key", "value_col": "doc"}},
        ]},
        "output": {"drop": {}},
        "cache_resources": [
            {"label": "hydration", "memory": {"init_values": {"k0": "v-zero", "k2": "v-two"}}},
        ],
    }
    pipeline, sink = compile_config(conf)
    out = pipeline.run_batch(spark)
    got = {r["key"]: r["doc"] for r in out.collect()}
    assert got == {"k0": "v-zero", "k1": None, "k2": "v-two"}


def test_config_processor_resource_reference(spark):
    from benthos_spark.config import compile_config

    conf = {
        "input": {"generate": {"count": 4, "streaming": False,
                               "mapping": {"v": "value"}}},
        "pipeline": {"processors": [{"resource": "keep_evens"}]},
        "output": {"drop": {}},
        "processor_resources": [
            {"label": "keep_evens", "filter": "v % 2 = 0"},
        ],
    }
    pipeline, _ = compile_config(conf)
    assert pipeline.run_batch(spark).count() == 2


def test_config_unknown_resource_fails_compile():
    import pytest as _pytest

    from benthos_spark.config import ConfigError, compile_config

    conf = {
        "input": {"generate": {"count": 1}},
        "pipeline": {"processors": [{"resource": "nope"}]},
        "output": {"drop": {}},
    }
    with _pytest.raises(ConfigError, match="nope"):
        compile_config(conf)


def test_config_batched_input_rebatches(spark):
    from benthos_spark.config import compile_config

    conf = {
        "input": {"batched": {
            "child": {"generate": {"count": 40, "streaming": False,
                                   "mapping": {"v": "value"}}},
            "policy": {"count": 10},
        }},
        "output": {"drop": {}},
    }
    pipe, _ = compile_config(conf)
    out = pipe.run_batch(spark)
    assert out.count() == 40
    assert out.rdd.getNumPartitions() == 4  # ~count rows per physical batch


def test_config_batched_check_rejected():
    import pytest as _pytest

    from benthos_spark.config import ConfigError, compile_config

    conf = {
        "input": {"batched": {"child": {"generate": {"count": 1}},
                              "policy": {"check": "this.v > 0"}}},
        "output": {"drop": {}},
    }
    with _pytest.raises(ConfigError, match="check"):
        compile_config(conf)


def test_env_var_interpolation(spark, monkeypatch):
    from benthos_spark.config import ConfigError, compile_config, replace_env_variables

    monkeypatch.setenv("N_ROWS", "7")
    conf = """
input:
  generate: {count: ${N_ROWS}, streaming: false, mapping: {v: value}}
pipeline:
  processors:
    - filter: "v >= ${MIN_V:3}"
output:
  drop: {}
"""
    pipe, _ = compile_config(conf)
    assert pipe.run_batch(spark).count() == 4  # 3..6 of 0..6

    assert replace_env_variables("a ${MISSING:dflt} b", lambda k: None) == "a dflt b"
    assert replace_env_variables("${{LITERAL}}", lambda k: None) == "${LITERAL}"
    import pytest as _pytest

    with _pytest.raises(ConfigError, match="MISSING"):
        replace_env_variables("${MISSING}", lambda k: None)


def test_cli_test_subcommand(tmp_path):
    """`python -m benthos_spark test file.yaml` — the `benthos test`
    CLI entrypoint (internal/cli/test)."""
    import subprocess
    import sys

    conf = tmp_path / "case.yaml"
    conf.write_text(
        """
pipeline:
  processors:
    - mutation: {d: "v * 2"}
tests:
  - name: doubles
    target_processors: /pipeline/processors
    input_batch:
      - json: {v: 21}
    output_batch:
      - json_contains: {d: 42}
"""
    )
    r = subprocess.run(
        [sys.executable, "-m", "benthos_spark", "test", str(conf)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PASS" in r.stdout


def test_config_metrics_section(spark, tmp_path):
    """Top-level `metrics:` config section attaches the JSONL listener
    (reference metrics exporters ≙ streaming/metrics.py)."""
    import json as _json
    import time

    from benthos_spark.config import run_config
    from benthos_spark.streaming.pipeline import run_to_completion

    src = tmp_path / "in"
    spark.range(0, 20).selectExpr("id as v", "timestamp'2024-01-01' as ts").write.parquet(str(src))
    mpath = tmp_path / "metrics.jsonl"
    conf = {
        "input": {"parquet": {"path": str(src), "streaming": True}},
        "pipeline": {"processors": [{"mutation": {"d": "v * 2"}}]},
        "output": {"drop": {}},
        "metrics": {"json_file": {"path": str(mpath)}},
    }
    q = run_config(spark, conf, checkpoint=str(tmp_path / "ckpt"))
    run_to_completion(q)
    deadline = time.time() + 10
    recs = []
    while time.time() < deadline:
        if mpath.exists():
            recs = [_json.loads(l) for l in mpath.read_text().splitlines() if l.strip()]
            if any(r.get("event") == "progress" and r.get("input_received", 0) > 0 for r in recs):
                break
        time.sleep(0.2)
    assert any(r.get("input_received", 0) >= 20 for r in recs if r.get("event") == "progress")


def test_cli_blobl_subcommand():
    """`python -m benthos_spark blobl '<mapping>'` — the `benthos blobl`
    CLI (internal/cli/blobl): JSONL in, one result per line, deleted
    messages omitted, raw content supported."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "benthos_spark", "blobl",
         'root.v = this.n * 2\nroot = if this.n > 5 { deleted() }'],
        input='{"n":2}\n{"n":9}\n{"n":3}\n',
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert r.stdout.splitlines() == ['{"v":4}', '{"v":6}']


def test_config_batched_count_streaming_rejected():
    """count/byte_size sizing needs a batch aggregation — over a streaming
    child it must fail at compile time, not at Pipeline.start."""
    import pytest as _pytest

    from benthos_spark.config import ConfigError, compile_config

    conf = {
        "input": {"batched": {
            "child": {"generate": {"count": 5, "streaming": True,
                                   "mapping": {"v": "value"}}},
            "policy": {"count": 2},
        }},
        "output": {"drop": {}},
    }
    with _pytest.raises(ConfigError, match="streaming"):
        compile_config(conf)


def test_run_config_sql_select_input(spark, tmp_path):
    """run_config must treat sql inputs as batch sources (they carry
    streaming=False) instead of crashing on the attribute."""
    from benthos_spark.config import run_config
    from benthos_spark.operators.sql import SqlInsertSink

    dsn = f"jdbc:derby:{tmp_path}/cfgdb;create=true"
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "ID int, NAME string")
    SqlInsertSink(dsn, "items", ["ID", "NAME"], mode="overwrite").write(dim)
    from benthos_spark.sinks.routing import inproc_clear, inproc_read

    inproc_clear()
    conf = {
        "input": {"sql_select": {"dsn": dsn, "table": "items",
                                 "columns": ["id", "name"]}},
        "output": {"inproc": "sqlchan"},
    }
    run_config(spark, conf, checkpoint=str(tmp_path / "ckpt"))
    assert sorted(r["NAME"] for r in inproc_read("sqlchan").collect()) == ["a", "b"]
    inproc_clear("sqlchan")


def test_config_dynamic_input_and_output(spark, tmp_path):
    from benthos_spark.config import run_config
    from benthos_spark.sinks.routing import inproc_clear, inproc_read

    inproc_clear()
    conf = {
        "input": {"dynamic": {"inputs": {
            "a": {"generate": {"count": 2, "streaming": False, "mapping": {"v": "value"}}},
            "b": {"generate": {"count": 3, "streaming": False, "mapping": {"v": "value + 10"}}},
        }}},
        "output": {"dynamic": {"outputs": {"main": {"inproc": "dynchan"}},
                               "selected": "main"}},
    }
    run_config(spark, conf, checkpoint=str(tmp_path / "ckpt"))
    assert inproc_read("dynchan").count() == 5
    inproc_clear()


def test_cli_lint_and_echo(tmp_path, capsys):
    from benthos_spark.__main__ import run_echo, run_lint

    good = tmp_path / "good.yaml"
    good.write_text("input: {generate: {count: 1}}\noutput: {drop: {}}\n")
    bad = tmp_path / "bad.yaml"
    bad.write_text("input: {solace: {}}\noutput: {drop: {}}\n")
    assert run_lint([str(good)]) == 0
    assert run_lint([str(bad)]) == 1
    assert run_echo(str(good)) == 0
    out = capsys.readouterr().out
    assert "generate" in out and "LINT" in out


def test_xml_processor_to_json(spark):
    """`xml` processor operator to_json (impl/xml/processor.go docs
    example, ported verbatim: attributes -> "-attr", simple elements
    with attributes -> "#text", repeated elements -> array)."""
    import json

    from benthos_spark.config import ConfigError, _proc

    xmldoc = (
        "<root>\n"
        "  <title>This is a title</title>\n"
        '  <description tone="boring">This is a description</description>\n'
        '  <elements id="1">foo1</elements>\n'
        '  <elements id="2">foo2</elements>\n'
        "  <elements>foo3</elements>\n"
        "</root>"
    )
    df = spark.createDataFrame([(xmldoc,)], "value string")
    out = _proc({"xml": {"operator": "to_json"}})(df).collect()
    assert json.loads(out[0].value) == {
        "root": {
            "title": "This is a title",
            "description": {"-tone": "boring",
                            "#text": "This is a description"},
            "elements": [{"-id": "1", "#text": "foo1"},
                         {"-id": "2", "#text": "foo2"}, "foo3"],
        }
    }
    # cast: numbers/bools typed (docs.FieldBool("cast", ...))
    df2 = spark.createDataFrame([("<r><n>7</n><b>true</b></r>",)],
                                "value string")
    out2 = _proc({"xml": {"operator": "to_json", "cast": True}})(df2).collect()
    assert json.loads(out2[0].value) == {"r": {"n": 7, "b": True}}
    # operator gate (processor.go:111)
    import pytest

    with pytest.raises(ConfigError, match="operator not recognised"):
        _proc({"xml": {"operator": "nope"}})
