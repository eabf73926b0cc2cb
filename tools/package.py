"""Build the --py-files artifact for cluster submission.

The north rule runs the engine "via spark-submit --py-files on a
multi-executor cluster" (BASELINE.json). This packages benthos_spark/
into a single zip importable by executors:

    python tools/package.py                      # dist/benthos_spark.zip
    spark-submit --py-files dist/benthos_spark.zip \\
        --conf spark.sql.shuffle.partitions=2048 \\
        your_job.py

`your_job.py` then does `from benthos_spark import Pipeline, ...` on
driver and executors alike; the Arrow UDF closures (audio, bloblang
interp, jq) resolve against the shipped zip on every worker.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "benthos_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "benthos_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    import sys

    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
