"""Guarded maintenance-query runner.

Reference convention (/root/reference/osm2rdf/runMaintenanceScripts.py:
44-68): for each maintenance script ``foo.sql`` there may be a guard
``foo-test.sql``; the mutation runs only when the guard returns rows,
and the runner loops every 600 s. Spark version: SQL files in a
directory, executed against the session catalog; returns what ran.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def run_maintenance_scripts(spark: SparkSession, script_dir: str) -> dict[str, str]:
    """Execute every ``*.sql`` (except ``*-test.sql``) whose guard —
    ``<name>-test.sql`` if present — returns at least one row.

    Returns {script_name: 'ran' | 'skipped(guard-empty)' | 'no-guard-ran'}.
    """
    outcome: dict[str, str] = {}
    for fname in sorted(os.listdir(script_dir)):
        if not fname.endswith(".sql") or fname.endswith("-test.sql"):
            continue
        name = fname[: -len(".sql")]
        guard_path = os.path.join(script_dir, f"{name}-test.sql")
        sql = open(os.path.join(script_dir, fname)).read()
        if os.path.exists(guard_path):
            guard_rows = spark.sql(open(guard_path).read()).limit(1).count()
            if guard_rows == 0:
                outcome[name] = "skipped(guard-empty)"
                continue
            spark.sql(sql).collect()
            outcome[name] = "ran"
        else:
            spark.sql(sql).collect()
            outcome[name] = "no-guard-ran"
    return outcome
