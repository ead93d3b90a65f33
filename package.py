"""Build dist/osmspark.zip for spark-submit --py-files (north_rule M7).

Usage: python package.py  ->  dist/osmspark.zip
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "osmspark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "osmspark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    print(out)
    return out


if __name__ == "__main__":
    main()
