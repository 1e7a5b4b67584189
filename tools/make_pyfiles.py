"""Build dist/parquet_python_spark.zip for `spark-submit --py-files`.

The north rule mandates the encode job run via `spark-submit --py-files`;
this produces the artifact that ships the engine package to executors.

Usage:
    python tools/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles_zip(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO_ROOT, "dist", "parquet_python_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg = os.path.join(REPO_ROOT, "parquet_python_spark")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, files in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, REPO_ROOT))
    return out_zip


if __name__ == "__main__":
    print(make_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else None))
