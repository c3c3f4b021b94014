"""metabot reporting long-tail as DataFrame jobs.

* ``tag_template_usage`` — the distributed analog of
  WikiTagTemplateUsage.generate (metabot/WikiTagTemplateUsage.py:26-52):
  the reference walks every page transcluding Template:Tag, extracts
  each ``{{Tag|k|v}}`` occurrence via parse_tag, and writes
  ``key\\tvalue\\tcount`` lines sorted by per-key total (desc) then
  value. Here: one Arrow-batched wikitext parse (the shared
  DescriptionParserItem tag grammar from sources/wiki_descriptions),
  a count aggregation, and a window total per key for the ordering —
  no per-row python, no driver loop, scales to a full wiki dump.

* ``contributor_digest`` — the distributed analog of
  DataItemContributors (metabot/DataItemContributors.py:38-80): parse
  wikibase revision comments (``/* wbsetlabel-set:1|en */ ...``) with
  the reference's reComment/reProperty regexes, drop the bot's own
  edits, and emit the distinct (qid, kind, value) facts — touched
  label/description/alias languages and claimed properties, with
  ``editentity-create`` counting toward all three language kinds.
  Entirely native Spark SQL expressions (JVM regex, no python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tag_template_usage(
    pages_df: DataFrame, text_col: str = "wikitext"
) -> DataFrame:
    """Pages → (key, value, cnt, key_total): per-(key,value) usage
    counts over every {{Tag}}/{{Key}} template occurrence plus the
    per-key total the reference sorts by. ``value`` is '' for Key
    items (WikiTagTemplateUsage.py:40-45 counts (key, value) pairs the
    same way)."""
    from ..sources.wiki_descriptions import (
        _extract_templates, _parse_tag_template,
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            keys, vals = [], []
            for text in pdf[text_col]:
                msgs: list = []
                for name, params in _extract_templates(text or ""):
                    for typ, item in _parse_tag_template(name, params, msgs):
                        if typ == "Tag":
                            k, _, v = item.partition("=")
                        else:  # Key
                            k, v = item, ""
                        keys.append(k)
                        vals.append(v)
            yield pd.DataFrame({"key": keys, "value": vals})

    pairs = pages_df.select(text_col).mapInPandas(
        gen, "key string, value string"
    )
    counts = pairs.groupBy("key", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("key")
    return counts.withColumn("key_total", F.sum("cnt").over(w))


# the reference's comment / property regexes
# (DataItemContributors.py:9-10), group-indexed for Spark
_RE_COMMENT = (
    r"^/\* wb([a-z]+)(?:-([a-z]+))?:(?:[0-9|]+)?(?:\|([a-z-]+))? \*/ (.*)$"
)
_RE_PROPERTY = r"\[\[Property:(P[0-9]+)\]\]"


def contributor_digest(
    revisions_df: DataFrame,
    qid_col: str = "qid",
    user_col: str = "user",
    comment_col: str = "comment",
    bot_user: str = "Yurikbot",
) -> DataFrame:
    """Revision log → distinct (qid, kind, value) contribution facts:
    kind ∈ {label, description, aliases, claims}; value is the touched
    language (or the claimed property id). Mirrors the per-item set
    accumulation of DataItemContributors.__call__ as one distinct
    aggregation over the whole revision table."""
    c = F.col(comment_col)
    cmd = F.regexp_extract(c, _RE_COMMENT, 1)
    subcmd = F.regexp_extract(c, _RE_COMMENT, 2)
    lang = F.regexp_extract(c, _RE_COMMENT, 3)
    text = F.regexp_extract(c, _RE_COMMENT, 4)
    prop = F.regexp_extract(text, _RE_PROPERTY, 1)
    created = (cmd == "editentity") & (subcmd == "create")

    def lang_kind(name):
        hit = (cmd.contains(name) | created) & (cmd != "")
        return F.when(hit, F.struct(
            F.lit(name).alias("kind"), lang.alias("value"),
        ))

    facts = F.array(
        lang_kind("aliases"),
        lang_kind("description"),
        lang_kind("label"),
        F.when(cmd.contains("claim") & (prop != ""), F.struct(
            F.lit("claims").alias("kind"), prop.alias("value"),
        )),
    )
    return (
        revisions_df
        .filter(F.col(user_col) != bot_user)
        .select(
            F.col(qid_col).alias("qid"),
            F.explode(facts).alias("fact"),
        )
        .filter(F.col("fact").isNotNull())
        .select("qid", "fact.kind", "fact.value")
        .distinct()
    )
