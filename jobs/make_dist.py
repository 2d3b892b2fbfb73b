#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

    python jobs/make_dist.py   ->  dist/rosreestr_xml_to_gis_converter_spark.zip
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "rosreestr_xml_to_gis_converter_spark"


def main() -> str:
    out = os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, names in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for name in sorted(names):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
