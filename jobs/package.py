"""Build dist/crawler.zip for spark-submit --py-files (SURVEY.md §7.3 M6).

The zip contains the storm_focused_crawler_spark package only (no
tests, no fixtures data) — executors import UDF/operator code from it.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "storm_focused_crawler_spark"


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "crawler.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in sorted(files):
                if f.endswith((".py", ".json")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    print(build())
