"""Package the engine for spark-submit --py-files.

  python scripts/build_pyfiles_zip.py          # -> dist/ppge_spark.zip

The zip contains the pure_python_geospatial_export_spark package plus
__spark_entry__.py and the golden fixtures it references, so executors on
a real cluster can import everything:

  spark-submit --master <cluster> \
      --py-files dist/ppge_spark.zip scripts/flagship_job.py --pages-n 1e9
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pure_python_geospatial_export_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "ppge_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for fn in files:
                if fn.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"),
                "__spark_entry__.py")
        fixtures = os.path.join(REPO, "tests", "fixtures",
                                "golden_geometry.json")
        z.write(fixtures, "tests/fixtures/golden_geometry.json")
    print(out)
    return out


if __name__ == "__main__":
    main()
