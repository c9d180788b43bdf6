"""Build the --py-files zip for spark-submit (north_rule packaging step).

    python jobs/package_pyfiles.py [dest_dir]   # default dist/

Produces dist/ala_er_pyfiles.zip containing the ala_name_matching_spark
package at the archive root, which is exactly what executors need on their
PYTHONPATH. Deterministic (sorted entries, zeroed timestamps) so repeated
builds of the same tree are byte-identical — convenient for cache keys on
object stores.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "ala_name_matching_spark"


def build(dest_dir: str = "dist") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, dest_dir), exist_ok=True)
    out = os.path.join(root, dest_dir, "ala_er_pyfiles.zip")
    entries = []
    for dirpath, _dirnames, filenames in os.walk(os.path.join(root, PKG)):
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, root), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            zi = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(zi, fh.read(), zipfile.ZIP_DEFLATED)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
