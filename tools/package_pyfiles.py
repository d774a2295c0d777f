"""Package the engine for `spark-submit --py-files` (north rule launch path).

Builds ``dist/mtsad_spark.zip`` containing the pure-Python package — the
artifact every executor needs on a multi-executor cluster (Arrow/pandas UDF
kernels deserialize on executors, so the package must be importable THERE,
not just on the driver). Usage:

    python tools/package_pyfiles.py
    spark-submit --master <cluster> --py-files dist/mtsad_spark.zip \
        tools/submit_launcher.py --cores 32 --input <parquet> [...]

The zip is source-only (no fixtures/tests/caches): fixture generation and
oracle harnesses are driver-side tooling, not executor code.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "mtsad_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "mtsad_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
