"""Guarded maintenance-query runner.

Reference convention (/root/reference/osm2rdf/runMaintenanceScripts.py:
44-68): for each maintenance script ``foo.sparql`` there may be a guard
``foo-test.sparql``; the mutation runs only when the guard SELECT
returns rows (``Sparql.run('query', ...)`` returns the binding list;
``if not ...: skip``), and the runner loops every 600 s.

Two Spark-native modes:

* ``run_maintenance_sparql`` — the faithful one: ``*.sparql`` files
  executed through SparqlEngine (guards) / SparqlUpdateEngine
  (mutations) over an (s, p, o) triples DataFrame, scripts chained in
  sorted order exactly like the reference loop. Runs the reference's
  own shipped artifact (maintenance/add_osmt_to_meta.sparql) verbatim.
* ``run_maintenance_scripts`` — the catalog analog: ``*.sql`` files
  against the session catalog, same guard convention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def run_maintenance_sparql(
    triples: DataFrame, script_dir: str
) -> tuple[dict[str, str], DataFrame]:
    """One pass of the reference maintenance loop over ``*.sparql``
    files (runMaintenanceScripts.py:44-68, minus the 600 s sleep —
    schedule passes externally).

    For each ``foo.sparql`` (sorted, ``*-test.sparql`` guards excluded
    from direct execution): if ``foo-test.sparql`` exists, evaluate it
    as a SELECT against the CURRENT triples and skip the mutation when
    it returns no rows; otherwise run ``foo.sparql`` through
    SparqlUpdateEngine. Mutations chain — a later script sees the
    earlier script's output, like consecutive POSTs to the endpoint.

    Returns ``({script_name: 'ran' | 'skipped(guard-empty)' |
    'no-guard-ran' | 'orphan-test'}, final_triples)``.
    """
    from sophox_spark.operators.sparql import SparqlEngine, SparqlUpdateEngine

    suffix = "-test"
    names = sorted(
        f[: -len(".sparql")]
        for f in os.listdir(script_dir)
        if f.endswith(".sparql")
    )
    outcome: dict[str, str] = {}
    cur = triples
    for name in names:
        if name.endswith(suffix):
            if name[: -len(suffix)] not in names:
                # reference logs a warning for guard files with no
                # matching mutation (runMaintenanceScripts.py:56-58)
                outcome[name] = "orphan-test"
            continue
        with open(os.path.join(script_dir, f"{name}.sparql")) as f:
            update_text = f.read()
        guard_path = os.path.join(script_dir, f"{name}{suffix}.sparql")
        if os.path.exists(guard_path):
            with open(guard_path) as f:
                guard_rows = SparqlEngine(cur).select(f.read()).head(1)
            if not guard_rows:
                outcome[name] = "skipped(guard-empty)"
                continue
            cur = SparqlUpdateEngine(cur).update(update_text)
            outcome[name] = "ran"
        else:
            cur = SparqlUpdateEngine(cur).update(update_text)
            outcome[name] = "no-guard-ran"
    return outcome, cur


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
