"""Build the --py-files artifact for spark-submit (north_rule: "run via
spark-submit --py-files").

dist/sophox_spark.zip holds the ``sophox_spark`` package plus
``__spark_entry__.py`` at the zip root, exactly what a real cluster
deployment ships to executors. tools/submit_job.py (and the scaling
harness) import ONLY from this zip — the submit scripts live in tools/,
which contains no package, so a missing/incomplete zip fails loudly
instead of silently importing from the repo checkout.
"""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DEFAULT_OUT = os.path.join(REPO, "dist", "sophox_spark.zip")


def build(out: str = DEFAULT_OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "sophox_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return out


if __name__ == "__main__":
    print(build())
