"""CLI subcommands: list / create (internal/cli/list.go, create.go)."""


def test_list_registry_complete_and_live():
    """`benthos list` names come from the compiler's own errors, and
    every listed processor actually dispatches (no drift)."""
    from benthos_spark.__main__ import component_registry
    from benthos_spark.config import ConfigError, _proc

    reg = component_registry()
    assert len(reg["inputs"]) >= 15
    assert len(reg["outputs"]) >= 15
    assert reg["caches"] == sorted(reg["caches"])
    assert {"memory", "lru", "ttlru", "file", "redis", "memcached",
            "aws_dynamodb", "aws_s3", "gcp_cloud_storage", "couchbase",
            "ristretto"} <= set(reg["caches"])
    for name in reg["processors"]:
        try:
            _proc({name: {}}, None)
        except ConfigError as e:
            assert "unknown processor" not in str(e), name
        except Exception:
            pass  # missing required fields etc — still a known component


def test_create_prints_valid_yaml():
    import io
    from contextlib import redirect_stdout

    import yaml

    from benthos_spark.__main__ import run_create

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert run_create("") == 0
    doc = yaml.safe_load(buf.getvalue())
    assert "input" in doc and "output" in doc
