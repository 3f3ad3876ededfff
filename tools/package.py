"""Build the --py-files archive for cluster submission.

    python tools/package.py [dest.zip]

Produces a zip of the ``taco_toolbox_spark`` package (source only, no
caches) whose root entries import directly when the archive is placed on
``sys.path`` — exactly what ``spark-submit --py-files`` does on every
executor and on the driver. The deploy story of the north rule is then
literally:

    python tools/package.py dist/taco_toolbox_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/taco_toolbox_spark.zip \
        jobs/validate.py --input ... --baseline ... --output ...

Entries are written in sorted order with zeroed timestamps so the same
tree always produces a byte-identical archive (rsync/cache friendly).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "taco_toolbox_spark"


def build_zip(dest: str, repo: str = REPO) -> str:
    """Write the package archive to ``dest`` and return ``dest``."""
    root = os.path.join(repo, PACKAGE)
    entries = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((full, os.path.relpath(full, repo)))
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return dest


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", f"{PACKAGE}.zip"
    )
    print(build_zip(out))
