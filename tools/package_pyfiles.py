"""Package the engine for `spark-submit --py-files` (north-rule packaging
clause): zips readability_1_spark/ into dist/readability_1_spark.zip and
prints the submit command.

The package is pure Python (stdlib + pandas/pyarrow already on executors),
so one zip on the executors' PYTHONPATH is the whole deployment.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "readability_1_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "readability_1_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    path = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"built {path}")
    print(
        "submit with:\n"
        f"  spark-submit --py-files {path} \\\n"
        "    --conf spark.sql.adaptive.enabled=true \\\n"
        "    --conf spark.sql.execution.arrow.pyspark.enabled=true \\\n"
        "    jobs/extract_job.py --input <transcripts> --output <warehouse>"
    )
