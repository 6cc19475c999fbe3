#!/usr/bin/env python
"""Build the --py-files zip for spark-submit deployment."""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or REPO / "build" / "html5x.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "crystal_html5_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(pkg.rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
