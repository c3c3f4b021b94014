"""Wikibase item canonicalization (metabot Sorter analog).

The reference's Sorter bot (/root/reference/metabot/metabot/Sorter.py)
rewrites every wiki data item into a canonical shape: root keys in a
fixed order, label/description/alias languages English-first, claims
ordered by a curated property list with the meant/not-meant props
(P5/P24) deleted, claim statements within a property ordered
preferred-rank-first then by value, and qualifier values ordered by
the locale list / language / value (Sorter.py:7-49 ``prop_delete`` /
``root_order`` / ``prop_order``, :52-93 ``qualifier_order``, :96-147
key functions, :174-200 ``order``).

Two mirrors here:

* ``canonicalize_item`` — the faithful pure-dict port for item JSON
  (one item at a time, used inside Arrow batches by callers);
* ``sort_claims`` — the same ordering rules as native DataFrame
  expressions over a flat claims table (item, prop, value, rank):
  prop-delete filter + a deterministic position per claim. This is the
  scale path: canonical claim order for millions of items is a window
  rank, not a python loop.

Subset notes: properties outside ``PROP_ORDER`` sort after all known
ones by property id (the reference prints a warning and would fall
into a py3 str/int comparison if one appeared); the per-property
``merge_all`` no-sort exemption is exposed as ``no_sort_props``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Sorter.py:7
PROP_DELETE = frozenset({"P5", "P24"})

# Sorter.py:8
ROOT_ORDER = (
    "pageid", "ns", "title", "lastrevid", "modified", "type", "id",
    "labels", "descriptions", "aliases", "sitelinks", "claims",
)

# Sorter.py:10-49 (property ids resolved through Properties.py:170-213)
PROP_ORDER = (
    "P2", "P3", "P32", "P16", "P9", "P19", "P10", "P41", "P40", "P21",
    "P17", "P4", "P28", "P38", "P39", "P6", "P33", "P34", "P35", "P36",
    "P37", "P25", "P12", "P22", "P44", "P45", "P46", "P18", "P11",
    "P48", "P26", "P47", "P31", "P50", "P7", "P8", "P43", "P13",
)

# Sorter.py:52-93 — locale qualifier ordering (English names sorted)
QUALIFIER_ORDER = (
    "Q7811", "Q7780", "Q7781", "Q7783", "Q7782", "Q7816", "Q7784",
    "Q7817", "Q7818", "Q7794", "Q7785", "Q7786", "Q7804", "Q7789",
    "Q7791", "Q7792", "Q7793", "Q6994", "Q7787", "Q7795", "Q7796",
    "Q7797", "Q7798", "Q7799", "Q7800", "Q7802", "Q7801", "Q7803",
    "Q7805", "Q7790", "Q7806", "Q7807", "Q7808", "Q7809", "Q7810",
    "Q7788", "Q7812", "Q7813", "Q7814", "Q7815",
)

_UNKNOWN = 10_000


def _key_from_list(key: str, order: tuple) -> int:
    try:
        return order.index(key)
    except ValueError:
        return _UNKNOWN


def _lang_key(lang: str) -> str:
    # lang_sorter (Sorter.py:143-144): English first, then alphabetical
    return "" if lang == "en" else lang


def _claim_sort_key(claim: dict) -> str:
    """mainsnak_key / claim_order (Sorter.py:112-134): preferred rank
    sorts before normal (' ' < '_'), then by the snak's string value or
    entity id; monolingual values order en-first."""
    pref = claim.get("rank") == "preferred"
    val = claim.get("mainsnak", {}).get("datavalue", {}).get("value")
    res = " " if pref else "_"
    if isinstance(val, dict):
        if "language" in val:
            res += "__" if val["language"] == "en" else val["language"]
        if "id" in val:
            res += val["id"]
        return res
    return res + str(val)


def _snak_value_key(snak: dict) -> str:
    val = snak.get("datavalue", {}).get("value")
    if isinstance(val, dict) and "id" in val:
        return val["id"]
    return str(val)


# The reference's merge_all properties (Properties.py:186,195,210,211:
# P22 requires-key-or-tag, P18 diff-from, P45 implies, P46 combination)
# keep their statements in input order — Sorter.py:188 skips sorting
# them — so they are the default no-sort set here too.
MERGE_ALL_PROPS = frozenset({"P22", "P18", "P45", "P46"})


def canonicalize_item(
    content: dict, no_sort_props: frozenset = MERGE_ALL_PROPS
) -> dict:
    """One wikibase item JSON → canonical shape (Sorter.order,
    Sorter.py:174-200): root order, en-first languages, claims in
    PROP_ORDER with PROP_DELETE dropped, statements rank+value sorted
    (except ``no_sort_props``), qualifiers ordered by the locale list
    (P26), language (P31 captions), or value."""
    out = dict(
        sorted(
            content.items(),
            key=lambda kv: (_key_from_list(kv[0], ROOT_ORDER), kv[0]),
        )
    )
    for k in ("labels", "descriptions", "aliases"):
        if out.get(k):
            out[k] = dict(
                sorted(out[k].items(), key=lambda kv: _lang_key(kv[0]))
            )
    if out.get("claims"):
        claims = {
            p: c for p, c in out["claims"].items() if p not in PROP_DELETE
        }
        out["claims"] = dict(
            sorted(
                claims.items(),
                key=lambda kv: (_key_from_list(kv[0], PROP_ORDER), kv[0]),
            )
        )
        for prop_id, claim in out["claims"].items():
            if prop_id not in no_sort_props:
                claim.sort(key=_claim_sort_key)
            for cl in claim:
                for qp, qvals in cl.get("qualifiers", {}).items():
                    if qp == "P26":  # limit-to locale
                        qvals.sort(
                            key=lambda v: (
                                _key_from_list(
                                    _snak_value_key(v), QUALIFIER_ORDER
                                ),
                                _snak_value_key(v),
                            )
                        )
                    elif qp == "P47":  # image caption (monolingual)
                        qvals.sort(
                            key=lambda v: _lang_key(
                                v["datavalue"]["value"]["language"]
                            )
                        )
                    else:
                        qvals.sort(key=_snak_value_key)
                if "qualifiers-order" in cl:
                    cl["qualifiers-order"].sort(
                        key=lambda v: (_key_from_list(v, PROP_ORDER), v)
                    )
    return out


def _prop_rank_expr(prop_col):
    """Native PROP_ORDER index: a chained CASE — constant-folded by
    Catalyst into a lookup, no python."""
    expr = F.lit(_UNKNOWN)
    for i in range(len(PROP_ORDER) - 1, -1, -1):
        expr = F.when(prop_col == PROP_ORDER[i], F.lit(i)).otherwise(expr)
    return expr


def sort_claims(
    claims_df: DataFrame,
    item_col: str = "item",
    prop_col: str = "prop",
    value_col: str = "value",
    rank_col: str = "rank",
    no_sort_props: frozenset = MERGE_ALL_PROPS,
    input_order_col: str | None = None,
) -> DataFrame:
    """Flat claims table → the same rows with ``pos``: each claim's
    0-based position in its item's canonical order (prop by PROP_ORDER
    then id, statements preferred-first then by value), P5/P24 claims
    deleted. One window rank over (item) — the distributed equivalent
    of Sorter.order for claim statements.

    ``no_sort_props`` (default: the reference's merge_all set,
    Sorter.py:188) keeps statements in INPUT order — but a DataFrame is
    unordered, so that order must arrive as an explicit
    ``input_order_col``; when none is given, those props fall back to
    the rank+value key so the output stays deterministic (documented
    deviation for order-free inputs)."""
    kept = claims_df.filter(~F.col(prop_col).isin(*PROP_DELETE))
    stmt_key = F.concat(
        F.when(F.col(rank_col) == "preferred", F.lit(" ")).otherwise(
            F.lit("_")
        ),
        F.col(value_col),
    )
    if input_order_col is not None and no_sort_props:
        stmt_key = F.when(
            F.col(prop_col).isin(*no_sort_props),
            F.lpad(F.col(input_order_col).cast("string"), 12, "0"),
        ).otherwise(stmt_key)
    key = F.concat(
        F.lpad(_prop_rank_expr(F.col(prop_col)).cast("string"), 5, "0"),
        F.lit(":"), F.col(prop_col), F.lit(":"),
        stmt_key,
    )
    w = Window.partitionBy(item_col).orderBy(key)
    return kept.withColumn("pos", F.row_number().over(w) - F.lit(1))
