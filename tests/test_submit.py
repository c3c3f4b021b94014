"""spark-submit --py-files deployment test (north_rule launch shape).

Runs the real spark-submit binary from a NEUTRAL cwd (/tmp) so the
engine can only be imported from the dist zip — proving the deployable
artifact is self-contained, not leaning on the repo checkout.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "sophox_spark.zip"))
    env = dict(os.environ, SPARK_GRAFT_INHERIT_MASTER="1")
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "8g",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "q_geo_pip_rects", "/root/testdata/sf0.001",
        ],
        capture_output=True, text=True, timeout=240, check=True,
        cwd="/tmp", env=env,
    )
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["rows"] == 1000
    assert result["master"] == "local[4]"
    assert result["query"] == "q_geo_pip_rects"
