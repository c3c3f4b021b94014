"""Structured Streaming jobs (SURVEY §2.8).

The reference's update loop is a 60 s poll over minute-diff files
(ST6, RdfUpdateHandler.py:104-146). Two Spark-native expressions of it:

  * ``stream_changes_ingest`` — a real ``readStream`` over a parquet
    changes directory driving the same idempotent upsert through
    ``foreachBatch`` (exactly-once via the manifest seqid guard);
  * ``windowed_event_counts`` — watermarked tumbling-window aggregation
    over the events stream (the ST10 row: the reference has no windowed
    aggs, our engine provides them as first-class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .incremental import SnapshotTable, apply_change_batches

CHANGES_SCHEMA = (
    "seqid long, op string, id long, version int, user string, ts timestamp, "
    "lon double, lat double, tags map<string,string>"
)


def stream_changes_ingest(
    spark: SparkSession,
    changes_dir: str,
    table: SnapshotTable,
    checkpoint_dir: str,
):
    """readStream(parquet) → foreachBatch → idempotent seqid-guarded
    upsert. Replays after a restart are no-ops (ST3/ST4): the manifest
    seqid guard inside apply_change_batches skips applied batches, so
    at-least-once delivery from the stream becomes effectively-once in
    the table."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_change_batches(spark, table, batch_df)

    return (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    spark: SparkSession,
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # parquet event time may arrive as TIMESTAMP_NTZ; watermarks need
    # an instant-semantics TIMESTAMP
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
