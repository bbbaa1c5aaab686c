"""Package the engine for `spark-submit --py-files` (north rule: "ships via
spark-submit --py-files").

Usage: python tools/make_pyfiles_zip.py [out.zip]
Then:  spark-submit --py-files simple_osm_queries_spark.zip your_job.py
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "simple_osm_queries_spark"


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "simple_osm_queries_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pattern in ("*.py", "*.html"):  # web_app.html ships with the pkg
            for f in sorted(PKG.rglob(pattern)):
                z.write(f, f.relative_to(ROOT))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
