"""Config templates (benthos_spark/templates.py — the reference's
internal/template system: Bloblang-rendered reusable components).

The expansion tests port the reference's own template examples
(/root/reference/config/template_examples/*.yaml) where their
component surface exists here.
"""

import textwrap

import pytest

from benthos_spark import templates as T
from benthos_spark.config import ConfigError, _proc, compile_config


@pytest.fixture(autouse=True)
def _clean_registry():
    T.clear_templates()
    yield
    T.clear_templates()


def test_parse_validates():
    with pytest.raises(T.TemplateError, match="name"):
        T.parse_template("type: processor\nmapping: root = {}")
    with pytest.raises(T.TemplateError, match="type"):
        T.parse_template("name: x\ntype: nope\nmapping: root = {}")
    with pytest.raises(T.TemplateError, match="mapping"):
        T.parse_template("name: x\ntype: processor")
    with pytest.raises(T.TemplateError, match="compile"):
        T.parse_template("name: x\ntype: processor\nmapping: 'root = ((('")


def test_expand_fields_defaults_and_required():
    t = T.parse_template(
        textwrap.dedent(
            """
            name: tiered
            type: processor
            fields:
              - name: column
                type: string
              - name: threshold
                type: float
                default: 10.5
            mapping: |
              root.mutation = "tier = CASE WHEN %s > %v THEN 'big' ELSE 'small' END".format(this.column, this.threshold)
            """
        )
    )
    out = T.expand(t, {"column": "price"})
    assert out == {"mutation": "tier = CASE WHEN price > 10.5 THEN 'big' ELSE 'small' END"}
    with pytest.raises(T.TemplateError, match="required"):
        T.expand(t, {})
    with pytest.raises(T.TemplateError, match="unrecognised fields"):
        T.expand(t, {"column": "x", "nope": 1})
    with pytest.raises(T.TemplateError, match="must be a string"):
        T.expand(t, {"column": 5})


def test_reference_example_log_and_drop_expansion():
    # ported verbatim from config/template_examples/processor_log_and_drop.yaml
    src = textwrap.dedent(
        '''
        name: log_and_drop
        type: processor
        fields: []
        mapping: |
          root.catch = [
            {
              "log": {
                "level": "ERROR",
                "fields": {
                  "content": "${! content() }"
                },
                "message": "${! error() }"
              }
            },
            {
              "bloblang": "root = deleted()"
            }
          ]
        tests:
          - name: No fields
            config: {}
            expected:
              catch:
                - log:
                    level: ERROR
                    fields:
                      content: "${! content() }"
                    message: "${! error() }"
                - bloblang: root = deleted()
        '''
    )
    t = T.parse_template(src)
    assert T.run_template_tests(t) == []


def test_reference_example_stdin_uppercase_shape():
    # the mapping shape from input_stdin_uppercase.yaml: the gabs `-`
    # append segment builds a processors LIST
    t = T.parse_template(
        textwrap.dedent(
            '''
            name: stdin_uppercase
            type: input
            mapping: |
              root.stdin = {}
              root.processors = []
              root.processors."-".bloblang = """
                root = content().uppercase().string()
              """
            '''
        )
    )
    out = T.expand(t, {})
    assert out["stdin"] == {}
    assert isinstance(out["processors"], list) and len(out["processors"]) == 1
    assert "uppercase" in out["processors"][0]["bloblang"]


def test_embedded_test_failure_reported():
    t = T.parse_template(
        textwrap.dedent(
            """
            name: bad
            type: processor
            mapping: 'root.mutation = "x = 1"'
            tests:
              - name: wrong
                config: {}
                expected: {mutation: "x = 2"}
            """
        )
    )
    fails = T.run_template_tests(t)
    assert len(fails) == 1 and "mismatch" in fails[0]


def test_registered_template_compiles_in_pipeline(spark):
    t = T.parse_template(
        textwrap.dedent(
            """
            name: keep_big
            type: processor
            fields:
              - name: column
                type: string
              - name: min
                type: float
                default: 0
            mapping: |
              root.filter = "%s >= %v".format(this.column, this.min)
            """
        )
    )
    T.register_template(t)
    p = _proc({"keep_big": {"column": "v", "min": 10}}, None)
    from benthos_spark.operators.processors import Filter

    assert isinstance(p, Filter)
    # unknown template fields surface as ConfigError
    with pytest.raises(ConfigError, match="unrecognised fields"):
        _proc({"keep_big": {"column": "v", "bogus": 1}}, None)
    # unknown component still errors normally
    with pytest.raises(ConfigError, match="unknown processor"):
        _proc({"still_nope": {}}, None)


def test_template_of_template_and_cycle_guard(spark):
    T.register_template(
        T.parse_template(
            "name: inner\ntype: processor\nmapping: 'root.filter = \"v > 1\"'"
        )
    )
    T.register_template(
        T.parse_template(
            "name: outer\ntype: processor\nmapping: 'root.inner = {}'"
        )
    )
    from benthos_spark.operators.processors import Filter

    assert isinstance(_proc({"outer": {}}, None), Filter)
    T.register_template(
        T.parse_template("name: loop\ntype: processor\nmapping: 'root.loop = {}'")
    )
    with pytest.raises(ConfigError, match="too deep"):
        _proc({"loop": {}}, None)


def test_template_end_to_end_pipeline(spark, tmp_path):
    import pandas as pd

    T.register_template(
        T.parse_template(
            textwrap.dedent(
                """
                name: price_tier
                type: processor
                fields:
                  - name: threshold
                    type: float
                mapping: |
                  root.mutation = "root.tier = if this.price > %v { \\"big\\" } else { \\"small\\" }".format(this.threshold)
                """
            )
        )
    )
    src = tmp_path / "in"
    spark.createDataFrame(pd.DataFrame({"price": [5.0, 50.0]})).write.mode(
        "overwrite"
    ).parquet(str(src))
    conf = f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - price_tier: {{threshold: 10}}
output:
  drop: {{}}
"""
    pipe, _sink = compile_config(conf)
    rows = sorted((r.price, r.tier) for r in pipe.run_batch(spark).collect())
    assert rows == [(5.0, "small"), (50.0, "big")]


def test_cli_template_lint(tmp_path, capsys):
    from benthos_spark.__main__ import run_template_lint

    good = tmp_path / "good.yaml"
    good.write_text(
        "name: g\ntype: processor\nmapping: 'root.filter = \"1 = 1\"'\n"
        "tests:\n  - name: t\n    config: {}\n    expected: {filter: '1 = 1'}\n"
    )
    bad = tmp_path / "bad.yaml"
    bad.write_text("name: b\ntype: processor\n")  # no mapping
    assert run_template_lint([str(good)]) == 0
    assert run_template_lint([str(bad)]) == 1
    out = capsys.readouterr().out
    assert "OK" in out and "LINT" in out
