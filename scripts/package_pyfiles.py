#!/usr/bin/env python
"""Build dist/fel_spark.zip for ``spark-submit --py-files``.

The zip contains the pure-Python ``fel_spark`` package at archive root so
executors can ``import fel_spark`` after Spark adds it to sys.path — the
Spark-native analogue of the reference shipping its jar + datapack to the
grid (`utils/RunFELOntheGrid.java:40-64`).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "fel_spark.zip"
    out.parent.mkdir(exist_ok=True)
    src = REPO / "fel_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(src.rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
