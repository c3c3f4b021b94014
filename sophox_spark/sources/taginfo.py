"""Taginfo-style JSON stats source + usage-stats job.

Reference: updateUsageStats.py fetches the taginfo all-keys JSON
snapshot (S5, :80-92), resolves key strings to metadata item ids
through the store in 5000-key chunks (J10, :96-105), deletes all
existing usage counters and re-inserts fresh ones (SO3, :110-133).

Spark shape: ``spark.read.json`` with an explicit schema (no
inference), a broadcast equi-join on key (chunking unnecessary — the
join IS the chunking), and a snapshot-table overwrite commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TAGINFO_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("count_all", T.LongType(), True),
        T.StructField("count_nodes", T.LongType(), True),
        T.StructField("count_ways", T.LongType(), True),
        T.StructField("count_relations", T.LongType(), True),
        T.StructField("values_all", T.LongType(), True),
        T.StructField("users_all", T.LongType(), True),
    ]
)


def read_taginfo_json(spark: SparkSession, path: str) -> DataFrame:
    """S5: JSON stats snapshot → DataFrame, declared schema."""
    return spark.read.schema(TAGINFO_SCHEMA).json(path)


def resolve_keys(stats_df: DataFrame, key_items_df: DataFrame) -> DataFrame:
    """J10: key string → metadata item id, broadcast inner join
    (keys without an item are dropped, as the VALUES join does)."""
    return stats_df.join(F.broadcast(key_items_df), "key")


def usage_stats_overwrite(
    stats_df: DataFrame, key_items_df: DataFrame, table
) -> int:
    """SO3: recompute + full replace of the usage-counter table
    (delete-then-insert becomes a snapshot overwrite commit)."""
    resolved = resolve_keys(stats_df, key_items_df)
    return table.commit(resolved, seqid=0, watermark=None)
