"""Checkpoint / lineage manifest (north_rule resumability).

The reference keeps its ingestion watermark *inside the store*
(``osmroot: schema:version <seqid>`` + ``schema:dateModified``,
/root/reference/osm2rdf/RdfUpdateHandler.py:59-66, utils.py:77-87) and
gates bulk-import phases with per-file ``.good``/``.pending`` status
flags (/root/reference/osm2rdf/osm2rdf-import.sh:13-17,55-103). This
module is the Spark-native generalization: a small parquet manifest
table recording, per (job, unit), the applied sequence id, event-time
watermark, and row counts — the per-partition lineage + metrics stream
the north_rule requires.

Without Iceberg jars in this container there is no multi-table atomic
commit; the protocol is therefore *write data → write manifest row*,
and correctness under replay comes from idempotent MERGE semantics
(ST3/ST4): re-applying a batch whose manifest row is missing is a
no-op row-for-row. ``completed_units`` drives mid-job resume: finished
cells/batches are skipped without recomputation.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = (
    "job string, unit string, seqid long, watermark timestamp, "
    "row_count long, commit_id string"
)


class Manifest:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        # Hadoop FS probe: works for file://, hdfs://, s3a:// manifests
        from . import fs

        return fs.any_file_with_suffix(self.spark, self.path, ".parquet")

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)

    def record(self, job: str, unit: str, seqid: int, watermark, row_count: int) -> str:
        """Append one lineage row; returns the commit id."""
        commit_id = uuid.uuid4().hex
        pdf = pd.DataFrame(
            [
                {
                    "job": job,
                    "unit": unit,
                    "seqid": seqid,
                    "watermark": pd.Timestamp(watermark) if watermark is not None else None,
                    "row_count": row_count,
                    "commit_id": commit_id,
                }
            ]
        )
        self.spark.createDataFrame(pdf, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)
        return commit_id

    def completed_units(self, job: str) -> set[str]:
        if not self._exists():
            return set()
        rows = self.read().filter(f"job = '{job}'").select("unit").distinct().collect()
        return {r.unit for r in rows}

    def units_df(self, job: str) -> DataFrame | None:
        """Unit rows of one job as a DataFrame (None before first
        commit) — lets callers filter Spark-side and collect only the
        rows they need instead of the whole history."""
        if not self._exists():
            return None
        return self.read().filter(f"job = '{job}'").select("unit")

    def last_seqid(self, job: str) -> int | None:
        """The resume offset (ST1/ST3): max applied sequence id."""
        if not self._exists():
            return None
        row = self.read().filter(f"job = '{job}'").agg({"seqid": "max"}).collect()[0]
        return row[0]

    def metrics(self, job: str) -> DataFrame:
        """Per-unit row counts — the A5 counter statistics analog
        (/root/reference/osm2rdf/RdfHandler.py:124-137)."""
        return (
            self.read()
            .filter(f"job = '{job}'")
            .groupBy("unit")
            .agg({"row_count": "sum", "seqid": "max"})
            .withColumnRenamed("sum(row_count)", "rows")
            .withColumnRenamed("max(seqid)", "seqid")
        )
