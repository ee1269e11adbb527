"""Build the --py-files artifact.

    python tools/package.py [out.zip]

Produces a zip of the vid_dup_finder_lib_spark package suitable for

    spark-submit --py-files vid_dup_finder_lib_spark.zip \
        vid_dup_finder_lib_spark/plans/job.py --docs ... --checkpoint ...
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "vid_dup_finder_lib_spark.zip")
    pkg = os.path.join(ROOT, "vid_dup_finder_lib_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
