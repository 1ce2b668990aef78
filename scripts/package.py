#!/usr/bin/env python
"""Build the --py-files zip for spark-submit deployment (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage:
    python scripts/package.py            # -> dist/gdal_boots_spark.zip
    spark-submit --py-files dist/gdal_boots_spark.zip scripts/pipeline.py \
        --sf-dir /data/sfX --out /data/out
"""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "gdal_boots_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "gdal_boots_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
