"""Derived lookup tables over the OSM-wiki data-item dump.

Mirrors the metabot cache layer that indexes the wiki's Wikibase items
(reference ``metabot/metabot/DataItems.py``) and the page-title
resolver (``metabot/metabot/WikiPageTitles.py``) as DataFrame jobs:

* the reference materializes each lookup as an in-memory dict built by
  a single pass over a JSON-Lines dump (``CacheJsonl`` /
  ``CacheInMemory``); here each lookup is a declarative plan over the
  parsed item table, so Catalyst prunes the dump scan to the columns a
  given lookup needs and the builds parallelize per partition,
* dict insertion-order tie-breaks ("first occurrence wins" for
  duplicate strids, DataItems.py:95-99; "last wins" for name
  collisions, DataItems.py:131-139) become explicit min/max-by-qid
  aggregations — same winner for dumps ordered by ascending qid (the
  allpages generator order, DataItems.py:36-39), but deterministic
  under any partitioning.

Everything is native ``pyspark.sql.functions`` — no Python UDFs; the
JSON-Lines parse is a single ``from_json`` per partition batch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# instance-of classes (reference metabot/metabot/consts.py:25-32)
Q_TAG = "Q2"
Q_KEY = "Q7"
Q_RELATION = "Q6"
Q_REL_MEMBER_ROLE = "Q4667"
Q_LOCALE_INSTANCE = "Q6999"

# OSM element items whose description omits the "(Qid)" suffix
# (consts.py:16-23, used DataItems.py:62-68)
ELEMENT_QIDS = ("Q3", "Q4", "Q5", "Q6", "Q4669", "Q4670")

P_INSTANCE_OF = "P2"
P_KEY_ID = "P16"
P_TAG_ID = "P19"
P_REL_ID = "P41"
P_ROLE_ID = "P21"
P_LANG_CODE = "P32"

# hand-curated strid rewrites (reference metabot/metabot/utils.py:141-149)
SOLVED_AMBIGUOUS = {
    "amenity=drinking water": "amenity=drinking_water",
    "amenity=fast food": "amenity=fast_food",
    "amenity=food court": "amenity=food_court",
    "amenity=ice cream": "amenity=ice_cream",
    "emergency=fire hydrant": "emergency=fire_hydrant",
    "flat steps": "flat_steps",
    "nuclear explosion:country": "nuclear_explosion:country",
}

# language namespaces on the OSM wiki (consts.py:3-12)
LANG_NS = {
    "en": 0, "de": 200, "fr": 202, "es": 204,
    "it": 206, "nl": 208, "ru": 210, "ja": 212,
}

_ITEM_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
    T.StructField(
        "aliases", T.MapType(T.StringType(), T.ArrayType(T.StringType()))
    ),
    T.StructField(
        "claims", T.MapType(T.StringType(), T.ArrayType(T.StringType()))
    ),
    T.StructField("sitelink", T.StringType()),
])


def items_from_jsonl(df: DataFrame, col: str = "value") -> DataFrame:
    """JSON-Lines item dump -> typed item table.

    The reference streams the dump line-by-line into dicts
    (DataItems.py:26-33 writes it, Cache.py re-reads it); here one
    ``from_json`` per row parses the flattened item shape:
    ``{id, labels: {lang: text}, aliases: {lang: [text]},
    claims: {pid: [value]}, sitelink}``.  ``instance_of`` follows
    ``get_instance_of`` (utils.py:134-138): the P2 value only when the
    item carries exactly one P2 claim, else NULL.
    """
    j = F.from_json(F.col(col), _ITEM_SCHEMA)
    p2 = j["claims"][P_INSTANCE_OF]
    return df.select(
        j["id"].alias("qid"),
        j["labels"].alias("labels"),
        j["aliases"].alias("aliases"),
        j["claims"].alias("claims"),
        j["sitelink"].alias("sitelink"),
        F.when(F.size(p2) == 1, p2[0]).alias("instance_of"),
    ).where(F.col("qid").isNotNull())


def _qid_num(col):
    return F.substring(col, 2, 18).cast("long")


def item_descriptions(items: DataFrame) -> DataFrame:
    """qid -> display description (DataItemDescByQid,
    DataItems.py:58-70): the English label when present, else the
    item's first label (fixtures carry at most one non-English label,
    so "first" = the lexicographically smallest language — identical
    to the reference's insertion-order pick on such dumps), with a
    ``" (Qid)"`` suffix unless the item is one of the core OSM element
    items."""
    langs = F.array_sort(F.map_keys("labels"))
    first_lang = F.coalesce(
        F.get(F.filter(langs, lambda k: k == F.lit("en")), 0),
        F.get(langs, 0),
    )
    base = F.coalesce(F.element_at("labels", first_lang), F.lit(""))
    desc = F.when(
        F.col("qid").isin(*ELEMENT_QIDS), base
    ).otherwise(F.concat(base, F.lit(" ("), F.col("qid"), F.lit(")")))
    return items.select("qid", desc.alias("description"))


def items_by_sitelink(items: DataFrame) -> DataFrame:
    """wiki sitelink title -> qid (DataItemBySitelink,
    DataItems.py:73-80)."""
    return (
        items.where(F.col("sitelink").isNotNull())
        .select(F.col("sitelink").alias("title"), "qid")
    )


def keys_by_strid(items: DataFrame) -> DataFrame:
    """(type, strid) -> owning item (DataItemsKeysByStrid,
    DataItems.py:84-110) with the reference's duplicate-strid report
    folded in as columns.

    The strid comes from the id claim of the item's class — key-id /
    tag-id / rel-id / role-id / lang-code — with the English label as
    fallback for keys and tags (utils.py:152-177), then the
    ``solved_ambiguous`` rewrites.  Where the reference keeps the first
    dump occurrence and prints the clash (DataItems.py:95-103), this
    emits the smallest-qid claimant as the winner plus ``n_claimants``
    and the full sorted claimant list, so the duplicate report is part
    of the output instead of stdout.
    """
    en_label = F.element_at("labels", F.lit("en"))
    first_claim = {
        p: F.col("claims")[p][0]
        for p in (P_KEY_ID, P_TAG_ID, P_REL_ID, P_ROLE_ID, P_LANG_CODE)
    }
    typ = (
        F.when(F.col("instance_of") == Q_KEY, F.lit("Key"))
        .when(F.col("instance_of") == Q_TAG, F.lit("Tag"))
        .when(F.col("instance_of") == Q_RELATION, F.lit("Relation"))
        .when(F.col("instance_of") == Q_REL_MEMBER_ROLE, F.lit("Role"))
        .when(F.col("instance_of") == Q_LOCALE_INSTANCE, F.lit("Locale"))
    )
    raw = (
        F.when(F.col("instance_of") == Q_KEY,
               F.coalesce(first_claim[P_KEY_ID], en_label))
        .when(F.col("instance_of") == Q_TAG,
              F.coalesce(first_claim[P_TAG_ID], en_label))
        .when(F.col("instance_of") == Q_RELATION, first_claim[P_REL_ID])
        .when(F.col("instance_of") == Q_REL_MEMBER_ROLE,
              first_claim[P_ROLE_ID])
        .when(F.col("instance_of") == Q_LOCALE_INSTANCE,
              first_claim[P_LANG_CODE])
    )
    # single map-literal lookup, NOT a chained when(): each when layer
    # would embed two copies of the raw expression tree, blowing the
    # serialized plan up 2^len(SOLVED_AMBIGUOUS)-fold
    rewrites = F.create_map(
        *[F.lit(x) for kv in SOLVED_AMBIGUOUS.items() for x in kv]
    )
    tagged = (
        items.select(typ.alias("strid_type"), raw.alias("strid"), "qid")
        .withColumn(
            "strid",
            F.coalesce(F.element_at(rewrites, F.col("strid")), F.col("strid")),
        )
        .where(F.col("strid_type").isNotNull() & F.col("strid").isNotNull())
    )
    return (
        tagged.groupBy("strid_type", "strid")
        .agg(
            F.min_by("qid", _qid_num(F.col("qid"))).alias("qid"),
            F.count("*").alias("n_claimants"),
            F.array_sort(F.collect_list("qid")).alias("claimants"),
        )
    )


def items_by_name(items: DataFrame, instance_of: str) -> DataFrame:
    """lowercased label/alias -> qid for one item class
    (DataItemsByName, DataItems.py:122-140).  The reference's
    last-write-wins dict fill (ascending-qid dump order) becomes
    max-by-qid."""
    cls = items.where(F.col("instance_of") == instance_of)
    labels = cls.select(
        "qid", F.explode(F.map_values("labels")).alias("name")
    )
    aliases = cls.select(
        "qid",
        F.explode(F.flatten(F.map_values("aliases"))).alias("name"),
    )
    return (
        labels.unionByName(aliases)
        .select(F.lower("name").alias("name"), "qid")
        .groupBy("name")
        .agg(F.max_by("qid", _qid_num(F.col("qid"))).alias("qid"))
    )


def region_by_lang_code(items: DataFrame) -> DataFrame:
    """language code -> locale item (RegionByLangCode,
    DataItems.py:113-119)."""
    return (
        items.where(F.col("instance_of") == Q_LOCALE_INSTANCE)
        .select(
            F.col("claims")[P_LANG_CODE][0].alias("lang_code"), "qid"
        )
        .where(F.col("lang_code").isNotNull())
    )


# ---------------------------------------------------------------------------
# WikiPageTitles: title grammar -> canonical page per (sitelink, lang)
# -> redirect-chain resolution
# ---------------------------------------------------------------------------

_KEYS_RE = r"(?i)^(Key|Tag|Relation):(.+)$"


def parse_page_titles(pages: DataFrame) -> DataFrame:
    """Parse wiki page titles into (type, lang, id) per the reference
    grammar (utils.py:186-213 ``parse_wiki_page_title``):

    * the namespace pins the language (``LANG_NS``; odd = talk page of
      the even namespace below it),
    * outside ns 0 the leading ``XX:`` language prefix is stripped
      before matching,
    * ``Key|Tag|Relation:<id>`` case-insensitively; in the main
      namespace a ``<lang>:Key:...`` prefix form is also allowed,
    * ``good_title`` is the canonical spelling the page *should* have
      (WikiPageTitles.py:31-35): ``Type:id`` with the language
      prepended for non-English (lowercase in ns 0, uppercase
      namespace prefix otherwise), first letter uppercased.

    Emits one row per recognized page with its ``sitelink`` group key
    (``id_to_sitelink``, utils.py:62-79: underscores -> spaces).
    """
    lang_map = F.create_map(
        *[F.lit(x) for kv in LANG_NS.items() for x in (str(kv[1]), kv[0])]
    )
    primens = F.col("ns") - F.col("ns") % 2
    lang = F.coalesce(
        F.element_at(lang_map, primens.cast("string")), F.lit("en")
    )
    # outside ns 0 strip the single leading "XX:" namespace prefix
    # (split-once, NOT substring_index(-1), which would eat "Key:x" too)
    body = F.when(F.col("ns") == 0, F.col("title")).otherwise(
        F.expr("substring(title, instr(title, ':') + 1)")
    )
    t1 = F.regexp_extract(body, _KEYS_RE, 1)
    i1 = F.regexp_extract(body, _KEYS_RE, 2)
    lang_re = r"(?i)^([a-z]{2,3}(?:-[a-z]+)?):((?:Key|Tag|Relation):.+)$"
    l2 = F.lower(F.regexp_extract(body, lang_re, 1))
    rest2 = F.regexp_extract(body, lang_re, 2)
    t2 = F.regexp_extract(rest2, _KEYS_RE, 1)
    i2 = F.regexp_extract(rest2, _KEYS_RE, 2)
    use2 = (primens == 0) & (t1 == "") & (t2 != "")
    typ = F.initcap(F.when(use2, t2).otherwise(t1))
    pid = F.when(use2, i2).otherwise(i1)
    plang = F.when(use2, l2).otherwise(lang)
    good_body = F.concat(typ, F.lit(":"), pid)
    good = F.when(plang == "en", good_body).otherwise(
        F.concat(
            F.when(F.col("ns") == 0, plang).otherwise(F.upper(plang)),
            F.lit(":"), good_body,
        )
    )
    good = F.concat(F.upper(F.substring(good, 1, 1)), F.substring(good, 2, 10000))
    sitelink = F.trim(
        F.regexp_replace(F.concat(typ, F.lit(":"), pid), "_", " ")
    )
    return (
        pages.select(
            "ns", "title", "is_redirect",
            typ.alias("item_type"), pid.alias("item_id"),
            plang.alias("lang"), good.alias("good_title"),
            sitelink.alias("sitelink"),
        )
        .where(F.col("item_type") != "")
    )


def canonical_page_titles(parsed: DataFrame) -> DataFrame:
    """Pick the single page per (sitelink, lang), mirroring the
    disambiguation ladder of WikiPageTitles.py:40-63:

    * one candidate -> it,
    * several English candidates -> none (flagged upstream),
    * several non-English: exactly one non-redirect -> it; several
      non-redirects -> none; all redirects: exactly one whose spelling
      equals its ``good_title`` -> it, else none.
    """
    g = parsed.groupBy("sitelink", "lang").agg(
        F.count("*").alias("n"),
        F.sum(F.when(~F.col("is_redirect"), 1).otherwise(0)).alias("n_live"),
        F.sum(
            F.when(F.col("title") == F.col("good_title"), 1).otherwise(0)
        ).alias("n_good"),
        F.min_by(
            F.struct("title", "is_redirect"), F.col("title")
        ).alias("only"),
        F.min_by(
            F.struct("title", "is_redirect"),
            F.when(~F.col("is_redirect"), F.col("title")),
        ).alias("live"),
        F.min_by(
            F.struct("title", "is_redirect"),
            F.when(F.col("title") == F.col("good_title"), F.col("title")),
        ).alias("good"),
    )
    pick = (
        F.when(F.col("n") == 1, F.col("only"))
        .when(F.col("lang") == "en", F.lit(None))
        .when(F.col("n_live") == 1, F.col("live"))
        .when(F.col("n_live") > 1, F.lit(None))
        .when(F.col("n_good") == 1, F.col("good"))
    )
    return (
        g.select("sitelink", "lang", pick.alias("pick"))
        .where(F.col("pick").isNotNull())
        .select(
            "sitelink", "lang",
            F.col("pick")["title"].alias("title"),
            F.col("pick")["is_redirect"].alias("is_redirect"),
        )
    )


def resolve_redirects(
    chosen: DataFrame,
    edges: DataFrame,
    max_hops: int = 8,
) -> DataFrame:
    """Follow redirect chains to their final target
    (WikiPageTitles.py:68-104): hop the ``(from_title, to_title)``
    edge table until fixpoint; circular chains and dangling targets
    resolve to NULL, exactly like the reference's ``False`` sentinel.

    Chains on real wikis are 1-2 hops, so the loop joins only the
    still-unresolved worklist each round (same shrinking-worklist shape
    as ``incremental.relation_centroids_fixpoint``) and stops as soon
    as a round moves nothing; ``max_hops`` bounds pathological data.
    The worklist is tiny relative to the page table, so each hop is a
    broadcast-friendly equi-join keyed on the current head title.
    """
    resolved = chosen.select(
        "sitelink", "lang", "title",
        F.when(F.col("is_redirect"), F.col("title")).alias("head"),
        F.array().cast("array<string>").alias("seen"),
    )
    edges = edges.select(
        F.col("from_title").alias("head"),
        F.col("to_title").alias("nxt"),
    ).localCheckpoint(eager=False)
    # hoisted: identical every round; inside the loop it re-ran the
    # edge derivation + a distinct shuffle per hop
    heads = edges.select(F.col("head").alias("nxt")).distinct()
    out = resolved.where(F.col("head").isNull()).select(
        "sitelink", "lang", "title",
        F.lit(None).cast("string").alias("redirect_target"),
    )
    # materialize once: the redirect worklist is tiny (only redirect
    # pages), but without truncation every round's isEmpty() replayed
    # the WHOLE upstream parse/canonical pipeline — measured ~13 s →
    # ~3 s on the sf0.1 fixture (guide §5: localCheckpoint to cut
    # lineage on iterative worklists)
    work = resolved.where(F.col("head").isNotNull()).localCheckpoint(eager=True)
    for _ in range(max_hops):
        if work.isEmpty():
            break
        hop = work.join(edges, "head", "left").select(
            "sitelink", "lang", "title", "seen",
            F.col("nxt"),
            F.array_append("seen", F.col("head")).alias("seen2"),
        )
        # dangling target or cycle -> unresolvable (NULL), matching the
        # reference's REDIRECT-NOT-FOUND / CIRCULAR branches
        done_bad = hop.where(
            F.col("nxt").isNull() | F.array_contains("seen2", F.col("nxt"))
        ).select(
            "sitelink", "lang", "title",
            F.lit(None).cast("string").alias("redirect_target"),
        )
        # target that is not itself a redirect head -> final
        nxt = hop.where(
            F.col("nxt").isNotNull()
            & ~F.array_contains("seen2", F.col("nxt"))
        )
        done_ok = nxt.join(heads, "nxt", "left_anti").select(
            "sitelink", "lang", "title",
            F.col("nxt").alias("redirect_target"),
        )
        out = out.unionByName(done_bad).unionByName(done_ok)
        work = nxt.join(heads, "nxt", "left_semi").select(
            "sitelink", "lang", "title",
            F.col("nxt").alias("head"),
            F.col("seen2").alias("seen"),
        ).localCheckpoint(eager=True)
    # chains still unresolved after max_hops are unresolvable too —
    # they must surface as NULL rows, not silently vanish from the
    # output (every input (sitelink, lang) appears exactly once)
    leftover = work.select(
        "sitelink", "lang", "title",
        F.lit(None).cast("string").alias("redirect_target"),
    )
    return out.unionByName(leftover)


def wiki_page_titles(
    pages: DataFrame, edges: DataFrame
) -> DataFrame:
    """Full WikiPageTitles pipeline: parse -> canonical pick ->
    redirect resolution; one row per (sitelink, lang) with the chosen
    page title and, for redirect pages, the resolved final target."""
    parsed = parse_page_titles(pages)
    chosen = canonical_page_titles(parsed)
    return resolve_redirects(chosen, edges)
