"""metabot's upload/reconcile half as a statement-level MERGE.

The reference's UploadItem diffs freshly-parsed wiki claims against the
existing wikibase item and edits only what differs
(/root/reference/metabot/metabot/UploadItem.py:128-182 update_prop_claims,
:15 no_del_claims, :69-77 prohibit): per (item, property) —

  * identical claim sets (value+rank+qualifiers) → untouched;
  * a property the USER has edited (contributions cache) is never
    overwritten unless explicitly whitelisted — the bot logs and skips;
    new items have no user edits, so nothing is blocked on creation;
  * otherwise the desired claims replace the item's: kept values take
    the desired rank and the desired qualifier set (item qualifiers not
    desired are removed, missing ones appended — the net effect IS the
    desired set, UploadItem.py:146-172), removed values are deleted,
    new values added;
  * a property with NO desired claims is deleted — except the
    never-delete set (key type, image, use-on-*), which is kept.

Spark-native re-expression: claim sets are compared as sorted
signature arrays per (item, prop) — one groupBy each side — and the
per-pair decision drives which side's rows survive. Row-level work is
all native (groupBy/join/when); no Python in the path. The output is
the post-merge claims table (editEntity-shaped state) plus a decision
column, so replay is idempotent: re-running with the merged table as
``existing`` yields decision='unchanged' everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# UploadItem.py:15 — claims the bot never deletes even when the wiki
# page stops asserting them
NO_DEL_PROPS = (
    "key_type", "image", "use_on_nodes", "use_on_ways",
    "use_on_areas", "use_on_relations",
)

CLAIM_COLS = ("item", "prop", "value", "rank", "quals")


def _pair_sig(df: DataFrame, name: str) -> DataFrame:
    """(item, prop) → sorted claim-set signature (value/rank/quals)."""
    return df.groupBy("item", "prop").agg(
        F.sort_array(
            F.collect_list(F.concat_ws("\x1f", "value", "rank", "quals"))
        ).alias(name)
    )


def reconcile_claims(
    existing_df: DataFrame,
    desired_df: DataFrame,
    contribs_df: DataFrame | None = None,
    no_del_props: tuple[str, ...] = NO_DEL_PROPS,
    overwrite_props: tuple[str, ...] = (),
) -> DataFrame:
    """MERGE desired claims into existing claims with UploadItem
    semantics. Inputs share the schema ``item string, prop string,
    value string, rank string, quals string`` (quals = canonical sorted
    'p=v;p=v' form — the reference's qualifier reconcile nets out to
    "kept values carry the desired qualifier set", so one canonical
    string per claim captures it). ``contribs_df`` holds (item, prop)
    pairs a human edited (the contributions cache behind prohibit()).

    Returns the POST-MERGE claims table with a ``decision`` column:
    unchanged | blocked | replace | kept_no_del (delete produces no
    rows — visible as pairs absent from the output)."""
    ex_sig = _pair_sig(existing_df, "__ex")
    de_sig = _pair_sig(desired_df, "__de")
    pairs = ex_sig.join(de_sig, ["item", "prop"], "full_outer")

    if contribs_df is not None:
        contrib = contribs_df.select("item", "prop").distinct().withColumn(
            "__contrib", F.lit(True)
        )
        pairs = pairs.join(contrib, ["item", "prop"], "left_outer")
    else:
        pairs = pairs.withColumn("__contrib", F.lit(False))
    # prohibit() never blocks a NEW item (UploadItem.py:70-71): an item
    # with no existing claims at all cannot have user edits
    items_ex = existing_df.select("item").distinct().withColumn(
        "__item_exists", F.lit(True)
    )
    pairs = pairs.join(items_ex, "item", "left_outer")

    blocked = F.coalesce("__contrib", F.lit(False)) & F.coalesce(
        "__item_exists", F.lit(False)
    )
    if overwrite_props:
        blocked = blocked & ~F.col("prop").isin(*overwrite_props)
    decision = (
        F.when(F.col("__ex").eqNullSafe(F.col("__de")), "unchanged")
        .when(blocked, "blocked")
        .when(F.col("__de").isNotNull(), "replace")
        .when(F.col("prop").isin(*no_del_props), "kept_no_del")
        .otherwise("delete")
    )
    decided = pairs.select("item", "prop", decision.alias("decision"))

    from_existing = existing_df.join(
        decided.filter(F.col("decision").isin("unchanged", "blocked", "kept_no_del")),
        ["item", "prop"],
    )
    from_desired = desired_df.join(
        decided.filter(F.col("decision") == "replace"), ["item", "prop"]
    )
    return from_existing.unionByName(from_desired)


def reconcile_summary(merged_df: DataFrame) -> DataFrame:
    """A5-style counters: claims per decision (the bot's
    needs_changes/messages analog, aggregated)."""
    return merged_df.groupBy("decision").agg(
        F.count("*").alias("n_claims"),
        F.countDistinct("item", "prop").alias("n_pairs"),
    )
