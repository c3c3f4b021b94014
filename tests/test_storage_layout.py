"""Storage-layout scale patterns: cell-range file skipping on the
persisted covering, and bucketed co-located joins (SURVEY §4 rows
'secondary index' and 'bucketing')."""

import glob

import pytest
from pyspark.sql import functions as F

from sophox_spark.operators import spatial_join
from sophox_spark.plans import explain
from sophox_spark.sources import synth


class TestCellRangePartitioning:
    def test_range_partitioned_covering_prunes_files(self, spark, tmp_path):
        """Persisting polygon_cells repartitionByRange(cell) gives
        parquet files with tight cell min/max — a cell-range predicate
        reads a subset of files (the Iceberg-partition-pruning analog
        available without Iceberg jars)."""
        polygons = synth.admin_polygons_df(spark, 60)
        pcells = spatial_join.build_polygon_cells_adaptive(
            polygons, 8, 13, num_partitions=16
        )
        path = str(tmp_path / "pcells")
        pcells.write.parquet(path)
        files = glob.glob(path + "/part-*.parquet")
        assert len(files) >= 8
        # query one cell range; pushed filter must appear and row-group
        # stats let parquet skip — verify the scan reads fewer rows than
        # the full table by checking numOutputRows is bounded via a
        # simple count comparison on matching files' min/max
        full = spark.read.parquet(path)
        lo = full.selectExpr("percentile_approx(cell, 0.45)").collect()[0][0]
        hi = full.selectExpr("percentile_approx(cell, 0.55)").collect()[0][0]
        q = full.filter((F.col("cell") >= lo) & (F.col("cell") <= hi))
        pushed = explain.pushed_filters(q)
        assert pushed and "cell" in pushed[0]
        # file-level stats: most files lie entirely outside [lo, hi]
        import pyarrow.parquet as pq

        skippable = 0
        for f in files:
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            if max(maxs) < lo or min(mins) > hi:
                skippable += 1
        assert skippable >= len(files) // 2, (
            f"only {skippable}/{len(files)} files skippable — range "
            "partitioning did not localize cell ranges"
        )


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """bucketBy co-location: a repeated equi-join on the bucket key
        runs without shuffling either side (SortMergeJoin over bucketed
        scans, zero Exchange) — the pre-partitioning strategy for
        repeatedly-joined 100 TB tables."""
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("b_orders")
        )
        (
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("b_lineitem")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
            n_exchanges = explain.count_exchanges(j)
            assert n_exchanges == 0, explain.formatted_plan(j)[:2000]
            assert j.count() == lineitem.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
