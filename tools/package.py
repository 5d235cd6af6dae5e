"""Build the spark-submit artifact: dist/ccl_spark.zip + dist/main.py."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DIST = REPO / "dist"

MAIN = '''"""spark-submit driver shim: ships with --py-files ccl_spark.zip."""
from ccl_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
'''


def build() -> Path:
    DIST.mkdir(exist_ok=True)
    zpath = DIST / "ccl_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO / "ccl_spark").glob("*.py")):
            z.write(f, f"ccl_spark/{f.name}")
    (DIST / "main.py").write_text(MAIN)
    return zpath


if __name__ == "__main__":
    print(build())
