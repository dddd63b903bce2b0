"""Package the engine for spark-submit --py-files.

Produces dist/supacrawler_spark.zip (the package) and dist/cli_main.py
(a thin launcher that imports the zipped package)."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(REPO, "dist")

LAUNCHER = '''"""spark-submit launcher for supacrawler_spark (see cli.py)."""
import sys
from supacrawler_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
'''


def main():
    os.makedirs(DIST, exist_ok=True)
    zpath = os.path.join(DIST, "supacrawler_spark.zip")
    pkg = os.path.join(REPO, "supacrawler_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    with open(os.path.join(DIST, "cli_main.py"), "w") as f:
        f.write(LAUNCHER)
    print(zpath)


if __name__ == "__main__":
    main()
