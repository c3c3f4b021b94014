"""spark-submit entry point (north_rule: the DAG runs via
``spark-submit --py-files``).

Usage::

    python tools/package_pyfiles.py   # build dist/sophox_spark.zip
    spark-submit --master local[8] --driver-memory 8g \\
        --py-files dist/sophox_spark.zip \\
        tools/submit_job.py <query_name> <sf_dir>

Prints one JSON line {query, rows, elapsed_sec, master}. The engine code
is imported from the --py-files zip only: this script's directory
(tools/) holds no package, so the run proves the deployable artifact is
self-contained — the same invocation shape works unchanged on a real
multi-executor cluster (swap --master for the cluster URL).

The master comes from spark-submit; only SQL-level confs (Arrow, UTC,
AQE) are (re)applied here so results match the in-process harness.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession

SQL_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
}


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "q_geo_pip_rects"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName(f"submit_{qname}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for k, v in SQL_CONF.items():
        spark.conf.set(k, v)

    import __spark_entry__ as entry  # resolved from --py-files

    t0 = time.time()
    df = entry.queries()[qname](spark, sf_dir)
    n = df.count()
    print(
        json.dumps(
            {
                "query": qname,
                "rows": n,
                "elapsed_sec": round(time.time() - t0, 3),
                "master": spark.sparkContext.master,
            }
        )
    )


if __name__ == "__main__":
    main()
