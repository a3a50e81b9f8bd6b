#!/usr/bin/env python
"""Build the --py-files archive for spark-submit deployment.

    python jobs/make_pyfiles.py [dist_dir]

Produces dist/index_search_monorepo_spark.zip containing the package, ready
for `spark-submit --py-files dist/index_search_monorepo_spark.zip ...` —
executors add the zip to sys.path, so every pandas UDF and mapInPandas
closure resolves the library on the worker side.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

PACKAGE = "index_search_monorepo_spark"


def build(dist_dir: str | Path = "dist") -> Path:
    repo = Path(__file__).resolve().parents[1]
    pkg = repo / PACKAGE
    out_dir = Path(dist_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f"{PACKAGE}.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(pkg.rglob("*.py")):
            zf.write(f, f.relative_to(repo))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "dist"
    print(build(dest))
