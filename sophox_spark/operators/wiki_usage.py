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

import re

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


# ---------------------------------------------------------------------------
# Map-Features template table parser (WikiFeatures.py analog)
# ---------------------------------------------------------------------------

# the reference's cell regexes (WikiFeatures.py:178-187)
_RE_KV_1 = re.compile(
    r"(?:\{\{anchor[^}]*\}\})?(?:\[\[ *)?\{\{\{([^|\]}]*)\| *(?:[^|\]}]*)\}\}\}"
    r"(?: *\| *(.*)\]\])?"
)
_RE_KV_2 = re.compile(
    r"^\{\{[^|}]*\|(?:lang=\{\{\{lang\|\}\}\}\|)?\{\{\{([^|}]+) *\|\}\}\}"
    r" *\| *([^|}]+(?: *\| *[^|}]*))\}\}"
)
_RE_PARAM = re.compile(r"\{\{\{([^|\]}]*)(?:\| *((?:.|\n)*))?\}\}\}")
_RE_FILE_LINK = re.compile(r"\[\[\s*(?:File|Image)\s*:\s*([^|\]]+)")


def _parse_kv_cell(val):
    m = _RE_KV_1.match(val)
    if not m:
        m = _RE_KV_2.match(val)
    return m.groups() if m else (None, None)


def _parse_param_cell(val):
    m = _RE_PARAM.match(val)
    return m.groups() if m else (None, None)


def _parse_file_cell(val, messages):
    param, file = _parse_param_cell(val)
    if param and file:
        m = _RE_FILE_LINK.search(file)
        file = m.group(1).strip() if m else None
    if not file:
        messages.append(f"Unparsable {val}")
    return param, file


def parse_map_features_table(title: str, content: str, messages: list
                             ) -> list[tuple]:
    """One Map-Features template page → parsed table rows
    (WikiFeatures.get_all_relevant_pages, WikiFeatures.py:103-133):
    exactly one ``{| … |}`` wiki table, rows split on ``|-`` markers,
    7 ``|``-led columns per row, cells decoded through the reference's
    parse_kv / parse_param regexes; the render/image file cells resolve
    to the bare ``[[File:…]]`` name. Rows that fail any stage are
    logged and skipped, like the reference."""
    tbl_start = [m.end() for m in re.finditer(r"^ *\{\|", content, re.M)]
    tbl_end = [m.end() for m in re.finditer(r"^ *\|\} *$", content, re.M)]
    if len(tbl_start) != len(tbl_end) or len(tbl_start) != 1:
        messages.append(
            f"Multiple tables in {title} - {len(tbl_start)} starts, "
            f"{len(tbl_end)}"
        )
        return []
    content = content[tbl_start[0] : tbl_end[0]]
    out = []
    for row in re.split(r"\n\|-.*\n", content):
        cols = re.split(r"(?:^|\n)+\| *", row)
        if len(cols) != 7:
            # the reference logs and skips (incl. the final chunk when
            # a table does not close with a '|-' separator, since the
            # slice keeps the trailing '|}')
            if row.strip() and not row.lstrip().startswith(("!", "}")):
                messages.append(f"Unable to parse {row[:60]!r}")
            continue
        key_param, key_id = _parse_kv_cell(cols[1])
        val_param, val_id = _parse_kv_cell(cols[2])
        if not val_param:
            messages.append(f"Invalid {cols[2]}")
            continue
        desc_param, desc_text = _parse_param_cell(cols[4])
        _rp, render_file = _parse_file_cell(cols[5], messages)
        _ip, image_file = _parse_file_cell(cols[6], messages)
        out.append((
            title, key_param, key_id, val_param, val_id,
            cols[3].strip(), desc_param, desc_text, render_file, image_file,
        ))
    return out


_MAP_FEATURES_SCHEMA = (
    "title string, key_param string, key_id string, val_param string, "
    "val_id string, members_text string, desc_param string, "
    "desc_text string, render_file string, image_file string"
)


def map_features_rows(
    pages_df: DataFrame, title_col: str = "title", text_col: str = "wikitext"
) -> DataFrame:
    """Map-Features template pages → one structured row per parsed
    table row (Arrow-batched page parse; per-page work is the
    reference's exact regex pipeline)."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for title, text in zip(pdf[title_col], pdf[text_col]):
                msgs: list = []
                rows.extend(parse_map_features_table(title, text or "", msgs))
            yield pd.DataFrame(
                rows, columns=[f.split(" ")[0] for f in
                               _MAP_FEATURES_SCHEMA.split(", ")],
            )

    return pages_df.select(title_col, text_col).mapInPandas(
        gen, _MAP_FEATURES_SCHEMA
    )
