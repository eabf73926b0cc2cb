"""CLI: run or test a YAML pipeline config.

- run (default): the `benthos -c config.yaml` entrypoint
  (/root/reference/internal/cli/run.go:282) on Spark
- `blobl`: the `benthos blobl` entrypoint (internal/cli/blobl) —
  execute a Bloblang mapping over JSONL documents on stdin, one result
  per line (empty for deleted messages is omitted)
- `test`: the `benthos test <files...>` entrypoint
  (internal/cli/test) — executes each file's embedded `tests:` section
  (inline processors, /pipeline/processors pointers, or
  target_mapping Bloblang goldens)

Local:      python -m benthos_spark -c pipeline.yaml --checkpoint /tmp/ckpt
            python -m benthos_spark test configs/*.yaml
Cluster:    spark-submit --py-files benthos_spark.zip run_config.py ...
            (spark-submit ships the package; the session then comes from
            the cluster manager instead of the local builder).
"""

from __future__ import annotations

import argparse
import sys

from benthos_spark.config import run_config
from benthos_spark.session import get_spark
from benthos_spark.streaming.pipeline import run_to_completion


def run_tests(paths: list[str]) -> int:
    import yaml

    from benthos_spark.testing import CaseFailure, run_cases, run_reference_suite

    spark = get_spark(app="benthos-spark:test")
    spark.sparkContext.setLogLevel("ERROR")
    failed = 0
    for path in paths:
        with open(path) as f:
            text = f.read()
        doc = yaml.safe_load(text)
        cases = (doc or {}).get("tests", [])
        if not cases:
            print(f"SKIP {path}: no tests section")
            continue
        # reference-format files (target_mapping or bloblang-pointer
        # cases) run through the golden-suite runner; DataFrame-typed
        # cases (inline processors or json inputs) use the harness
        dataframe_style = any(
            isinstance(c.get("target_processors"), list)
            or any("json" in m for m in c.get("input_batch", []))
            for c in cases
        )
        try:
            if dataframe_style:
                results = run_cases(spark, text)
            else:
                results = run_reference_suite(spark, path)
            for name in results:
                tag = "SKIP" if str(name).startswith("SKIP") else "PASS"
                print(f"{tag} {path}: {name}")
        except CaseFailure as e:
            failed += 1
            print(f"FAIL {path}: {e}")
        except Exception as e:  # unexpected — report, keep going
            failed += 1
            print(f"FAIL {path}: {type(e).__name__}: {e}")
    return 1 if failed else 0


def run_blobl(argv: list[str]) -> int:
    import json

    from benthos_spark.bloblang.interp import DELETED, BloblangError, Executor, Raw, _format_json

    if argv and argv[0] == "-f":
        src = open(argv[1]).read()
    elif argv:
        src = argv[0]
    else:
        print("usage: python -m benthos_spark blobl '<mapping>' | -f file.blobl", file=sys.stderr)
        return 2
    ex = Executor(src)
    status = 0
    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line:
            continue
        try:
            doc = json.loads(line)
        except json.JSONDecodeError:
            doc = Raw(line)
        try:
            out, _ = ex.map_part(doc)
        except BloblangError as e:
            print(f"Error: {e}", file=sys.stderr)
            status = 1
            continue
        if out is DELETED:
            continue
        print(out if isinstance(out, str) else _format_json(out))
    return status


def run_lint(paths: list[str]) -> int:
    """`benthos lint` (internal/cli/lint.go): compile-check configs
    without running them — unknown components, missing sections, and
    invalid policies fail here with the known-set listed."""
    from benthos_spark.config import ConfigError, compile_config, replace_env_variables

    # Column expressions (F.expr) need a JVM even at compile time
    spark = get_spark(app="benthos-spark:lint", cores=1)
    spark.sparkContext.setLogLevel("ERROR")
    failed = 0
    for path in paths:
        try:
            with open(path) as f:
                compile_config(replace_env_variables(f.read()))
            print(f"OK   {path}")
        except ConfigError as e:
            print(f"LINT {path}: {e}")
            failed += 1
        except Exception as e:  # unreadable/invalid YAML
            print(f"LINT {path}: {e}")
            failed += 1
    return 1 if failed else 0


def run_echo(path: str) -> int:
    """`benthos echo`: parse + env-interpolate the config and print the
    normalized YAML (what the compiler actually sees)."""
    import yaml

    from benthos_spark.config import replace_env_variables

    with open(path) as f:
        doc = yaml.safe_load(replace_env_variables(f.read()))
    print(yaml.safe_dump(doc, default_flow_style=False, sort_keys=False), end="")
    return 0


def component_registry() -> dict[str, list[str]]:
    """Component names per section, extracted from the compiler's own
    unknown-component errors — the single source of truth, so `list`
    can never drift from what actually dispatches."""
    from benthos_spark.config import ConfigError, _cache_resource, _input, _output, _proc

    out: dict[str, list[str]] = {}
    probes = {
        "inputs": lambda: _input({"__nope__": {}}, None),
        "processors": lambda: _proc({"__nope__": {}}, None),
        "outputs": lambda: _output({"__nope__": {}}, None),
        "caches": lambda: _cache_resource({"label": "x", "__nope__": {}}),
    }
    for section, probe in probes.items():
        try:
            probe()
        except ConfigError as e:
            known = str(e).split("known:", 1)[1]
            out[section] = sorted(
                n.strip() for n in known.replace("\n", " ").split(",") if n.strip()
            )
        except Exception:
            out[section] = []
    return out


def run_list() -> int:
    """`benthos list` (internal/cli/list.go): print every registered
    component per section."""
    for section, names in component_registry().items():
        print(section.upper())
        for n in names:
            print(f"  {n}")
    return 0


def run_create(kind: str = "") -> int:
    """`benthos create` (internal/cli/create.go): print a starter config
    (optionally `input/processor/output` as a path triple)."""
    parts = (kind or "parquet/mapping/exactly_once").split("/")
    inp = parts[0] if len(parts) > 0 and parts[0] else "parquet"
    proc = parts[1] if len(parts) > 1 and parts[1] else "mapping"
    outp = parts[2] if len(parts) > 2 and parts[2] else "exactly_once"
    print(
        f"""input:
  {inp}: {{path: /path/to/input, streaming: true}}
pipeline:
  processors:
    - {proc}: {{}}
output:
  {outp}: {{dir: /path/to/output}}
"""
    )
    return 0


def run_template_lint(paths: list[str]) -> int:
    """`benthos template lint` (internal/cli/template): parse each
    template file and run its embedded expansion tests."""
    from benthos_spark.templates import TemplateError, parse_template, run_template_tests

    failed = 0
    for path in paths:
        try:
            with open(path) as f:
                t = parse_template(f.read())
        except (TemplateError, OSError) as e:
            print(f"LINT {path}: {e}")
            failed += 1
            continue
        failures = run_template_tests(t)
        for msg in failures:
            print(f"LINT {path}: {msg}")
        failed += len(failures)
        if not failures:
            print(f"OK   {path}")
    return 1 if failed else 0


def _load_templates_opt(argv: list[str]) -> list[str]:
    """Consume -t/--templates FILE options (repeatable) and register the
    templates; returns argv with the options removed."""
    from benthos_spark.templates import load_template_files

    out: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-t", "--templates") and i + 1 < len(argv):
            for lint in load_template_files([argv[i + 1]]):
                print(f"WARN {lint}", file=sys.stderr)
            i += 2
        else:
            out.append(argv[i])
            i += 1
    return out


def run_streams(argv: list[str]) -> int:
    """`benthos streams [dir]` (internal/cli/run.go streams mode): run
    many named configs in one engine with the CRUD HTTP API
    (/streams/{id} POST/GET/PUT/DELETE, /streams GET/POST)."""
    import time

    ap = argparse.ArgumentParser(prog="benthos_spark streams")
    ap.add_argument("dir", nargs="?", help="directory of *.yaml stream configs")
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--port", type=int, default=4195)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)

    from benthos_spark.streaming.api import serve_api
    from benthos_spark.streaming.streams import StreamsManager, load_stream_dir

    spark = get_spark(app="benthos-spark:streams")
    mgr = StreamsManager(spark, args.checkpoint_root)
    if args.dir:
        for sid in load_stream_dir(mgr, args.dir):
            print(f"started stream {sid}")
    api = serve_api(spark, host=args.host, port=args.port, streams=mgr)
    print(f"streams API listening on {api.address}")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        pass
    finally:
        mgr.stop_all()
        api.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "streams":
        return run_streams(argv[1:])
    if argv and argv[0] == "template":
        if len(argv) >= 2 and argv[1] == "lint":
            return run_template_lint(argv[2:])
        print("usage: python -m benthos_spark template lint <files...>", file=sys.stderr)
        return 2
    argv = _load_templates_opt(argv)
    if argv and argv[0] == "blobl":
        return run_blobl(argv[1:])
    if argv and argv[0] == "test":
        return run_tests(argv[1:])
    if argv and argv[0] == "lint":
        return run_lint(argv[1:])
    if argv and argv[0] == "echo":
        return run_echo(argv[1])
    if argv and argv[0] == "list":
        return run_list()
    if argv and argv[0] == "create":
        return run_create(argv[1] if len(argv) > 1 else "")
    ap = argparse.ArgumentParser(prog="benthos_spark")
    ap.add_argument("-c", "--config", required=True, help="pipeline YAML path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--continuous", action="store_true",
                    help="run until interrupted instead of draining available data")
    ap.add_argument("--trigger-interval", default=None, help="e.g. '10 seconds'")
    ap.add_argument("--metrics", default=None, help="metrics JSONL path")
    args = ap.parse_args(argv)

    spark = get_spark(app=f"benthos-spark:{args.config}")
    with open(args.config) as f:
        conf = f.read()
    kwargs = {}
    if args.metrics:
        kwargs["metrics_path"] = args.metrics
    if args.continuous and args.trigger_interval:
        kwargs["processing_time"] = args.trigger_interval
    query = run_config(
        spark, conf, checkpoint=args.checkpoint,
        trigger_once=not args.continuous, **kwargs,
    )
    if query is None:  # batch config — already materialized
        return 0
    if args.continuous:
        query.awaitTermination()
    else:
        run_to_completion(query, timeout_s=24 * 3600)
    return 0


if __name__ == "__main__":
    sys.exit(main())
