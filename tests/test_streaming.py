"""Structured Streaming ingest + guarded maintenance runner."""

import pandas as pd
import pytest

from sophox_spark.manifest import Manifest
from sophox_spark.plans.maintenance import run_maintenance_scripts
from sophox_spark.sources import synth
from sophox_spark.streaming import incremental, stream_jobs
from sophox_spark.streaming.stream_jobs import CHANGES_SCHEMA


class TestStreamingIngest:
    def test_stream_equals_batch_and_restart_is_noop(self, spark, tmp_path):
        nodes_pdf = synth.osm_nodes_pdf(100)
        changes_pdf = synth.changes_pdf(nodes_pdf, 5)
        changes = spark.createDataFrame(changes_pdf, CHANGES_SCHEMA)
        # one file per seqid → maxFilesPerTrigger=1 gives per-seq batches
        cdir = str(tmp_path / "changes")
        for seq in sorted(changes_pdf["seqid"].unique()):
            changes.filter(f"seqid = {seq}").coalesce(1).write.mode("append").parquet(cdir)

        man = Manifest(spark, str(tmp_path / "manifest"))
        table = incremental.SnapshotTable(spark, str(tmp_path / "tbl"), man, "nodes")
        q = stream_jobs.stream_changes_ingest(
            spark, cdir, table, str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)
        got = {r.id: r.tags["name"] for r in table.read().collect()}

        # batch reference result
        man2 = Manifest(spark, str(tmp_path / "manifest2"))
        table2 = incremental.SnapshotTable(spark, str(tmp_path / "tbl2"), man2, "nodes")
        incremental.apply_change_batches(spark, table2, changes)
        want = {r.id: r.tags["name"] for r in table2.read().collect()}
        assert got == want

        # restart with a FRESH checkpoint (at-least-once replay of all
        # files): the seqid guard must make it a no-op
        v_before = table.current_version()
        q2 = stream_jobs.stream_changes_ingest(
            spark, cdir, table, str(tmp_path / "ckpt2")
        )
        q2.awaitTermination(120)
        assert table.current_version() == v_before

    def test_windowed_counts_memory_sink(self, spark, tmp_path):
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        edir = str(tmp_path / "events")
        events.write.parquet(edir)
        stream = spark.readStream.schema(events.schema).parquet(edir)
        agg = stream_jobs.windowed_event_counts(spark, stream, "1 hour")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("wincounts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT sum(n) FROM wincounts"
        ).collect()[0][0]
        assert got == events.count()


class TestMaintenanceRunner:
    def test_guard_semantics(self, spark, tmp_path):
        spark.range(10).createOrReplaceTempView("mt_src")
        d = tmp_path / "scripts"
        d.mkdir()
        (d / "a.sql").write_text(
            "CREATE OR REPLACE TEMP VIEW mt_a AS SELECT id * 2 AS v FROM mt_src"
        )
        (d / "a-test.sql").write_text("SELECT 1 WHERE EXISTS (SELECT 1 FROM mt_src)")
        (d / "b.sql").write_text(
            "CREATE OR REPLACE TEMP VIEW mt_b AS SELECT id FROM mt_src"
        )
        (d / "b-test.sql").write_text("SELECT 1 FROM mt_src WHERE id > 100")  # empty
        (d / "c.sql").write_text(
            "CREATE OR REPLACE TEMP VIEW mt_c AS SELECT 42 AS v"
        )
        out = run_maintenance_scripts(spark, str(d))
        assert out == {"a": "ran", "b": "skipped(guard-empty)", "c": "no-guard-ran"}
        assert spark.table("mt_a").count() == 10
        assert spark.table("mt_c").collect()[0].v == 42
        with pytest.raises(Exception):
            spark.table("mt_b")


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
