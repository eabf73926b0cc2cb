"""CLI: run a YAML pipeline config — the `benthos -c config.yaml`
entrypoint (/root/reference/internal/cli/run.go:282) on Spark.

Local:      python -m benthos_spark -c pipeline.yaml --checkpoint /tmp/ckpt
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


def main(argv: list[str] | None = None) -> int:
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
