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


# enum-key ontology values (reference metabot/metabot/TagInfoDb.py)

# keys whose wiki item claims enum type but whose value space is
# free-form in practice (TagInfoDb.py / consts.py:89-94)
KNOWN_NON_ENUMS = ("name", "brand", "operator", "source")

Q_ENUM_KEY_TYPE = "Q8"
_P_KEY_TYPE = "P9"
_P_KEY_ID = "P16"

# well-formed enum value: lowercase alnum runs joined by -:_.
# (TagInfoDb.py:19 re_value)
_ENUM_VALUE_RE = r"^[a-z0-9]+([-:_.][a-z0-9]+)*$"


def enum_key_values(
    items_df: DataFrame,
    tags_df: DataFrame,
    min_count: int = 5000,
    min_count_wellformed: int = 50,
) -> DataFrame:
    """Candidate enum values per enum-typed key (TagInfoDb.generate,
    TagInfoDb.py:18-48).

    The reference loops a sqlite cursor per key; here the enum-key set
    (instance-of Key, key-type enum, minus the known free-form keys) is
    a broadcastable dimension semi-joined against the tags stats table,
    ``;``-packed multi-values explode and re-aggregate, and the
    acceptance filter keeps values with count > ``min_count`` or
    well-formed values (lowercase alnum joined by ``-:_.``) with count
    > ``min_count_wellformed``.

    ``items_df``: parsed item table (wiki_items.items_from_jsonl).
    ``tags_df``: (key string, value string, count_all long).
    Output: (k, v, c) rows like the reference's JSON-Lines cache.
    """
    keys = (
        items_df.where(
            (F.col("instance_of") == "Q7")
            & (F.col("claims")[_P_KEY_TYPE][0] == Q_ENUM_KEY_TYPE)
        )
        .select(F.col("claims")[_P_KEY_ID][0].alias("key"))
        .where(F.col("key").isNotNull() & ~F.col("key").isin(*KNOWN_NON_ENUMS))
        .distinct()
    )
    split = (
        tags_df.join(F.broadcast(keys), "key", "left_semi")
        .select(
            "key",
            F.explode(F.split("value", ";")).alias("v"),
            F.col("count_all").alias("c"),
        )
    )
    agg = split.groupBy(F.col("key").alias("k"), "v").agg(
        F.sum("c").alias("c")
    )
    return agg.where(
        (F.col("c") > min_count)
        | ((F.col("c") > min_count_wellformed) & F.col("v").rlike(_ENUM_VALUE_RE))
    )
