"""Build engine.zip for spark-submit --py-files.

    python jobs/package.py [--out engine.zip]
"""

from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "engine.zip"))
    args = ap.parse_args()
    pkg = ROOT / "search_engine_spark"
    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg.rglob("*.py")):
            zf.write(p, p.relative_to(ROOT))
    print(args.out)


if __name__ == "__main__":
    main()
