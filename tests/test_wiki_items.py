"""Data-item lookup tables + page-title resolver (wiki_items.py) vs
hand-computed expectations mirroring metabot's DataItems.py /
WikiPageTitles.py semantics."""
import json

import pytest
from pyspark.sql import functions as F

from sophox_spark.operators import wiki_items as wi


def _item(qid, labels=None, aliases=None, claims=None, sitelink=None):
    return json.dumps({
        "id": qid,
        "labels": labels or {},
        "aliases": aliases or {},
        "claims": claims or {},
        "sitelink": sitelink,
    })


@pytest.fixture(scope="module")
def items(spark):
    rows = [
        # key with explicit key-id claim + sitelink
        _item("Q100", {"en": "highway"}, {"en": ["road kind"]},
              {"P2": ["Q7"], "P16": ["highway"]}, "Key:highway"),
        # key falling back to the en label (no P16)
        _item("Q101", {"en": "building"}, None, {"P2": ["Q7"]}),
        # tag whose id claim hits the solved_ambiguous rewrite
        _item("Q102", {"en": "fast food"}, None,
              {"P2": ["Q2"], "P19": ["amenity=fast food"]}, "Tag:amenity=fast food"),
        # duplicate strid claimants (reference prints the clash)
        _item("Q103", {"en": "dup"}, None, {"P2": ["Q7"], "P16": ["surface"]}),
        _item("Q104", {"en": "dup2"}, None, {"P2": ["Q7"], "P16": ["surface"]}),
        # relation + role + locale
        _item("Q105", {"en": "route"}, None, {"P2": ["Q6"], "P41": ["route"]}),
        _item("Q106", {"en": "stop role"}, None, {"P2": ["Q4667"], "P21": ["stop"]}),
        _item("Q107", {"en": "Germany"}, {"en": ["DE region"]},
              {"P2": ["Q6999"], "P32": ["de"]}),
        # no en label -> first (only) other label; element item Q3
        _item("Q108", {"de": "nur deutsch"}, None, {"P2": ["Q2"], "P19": ["x=y"]}),
        _item("Q3", {"en": "node"}, None, {"P2": ["Q2"]}),
        # two P2 claims -> instance_of undefined (utils.get_instance_of)
        _item("Q109", {"en": "ambiguous"}, None, {"P2": ["Q7", "Q2"], "P16": ["amb"]}),
        # name collision for by-name: last (max qid) wins
        _item("Q110", {"en": "Shared"}, None, {"P2": ["Q4667"], "P21": ["shared"]}),
        _item("Q111", {"fr": "shared"}, {"fr": ["SHARED"]},
              {"P2": ["Q4667"], "P21": ["shared2"]}),
    ]
    df = spark.createDataFrame([(r,) for r in rows], ["value"])
    return wi.items_from_jsonl(df).cache()


def test_parse_and_instance_of(items):
    got = {r["qid"]: r["instance_of"] for r in items.collect()}
    assert got["Q100"] == "Q7"
    assert got["Q109"] is None  # multi-valued P2 -> undefined


def test_item_descriptions(items):
    got = {r["qid"]: r["description"]
           for r in wi.item_descriptions(items).collect()}
    assert got["Q100"] == "highway (Q100)"
    assert got["Q108"] == "nur deutsch (Q108)"  # no en -> first label
    assert got["Q3"] == "node"  # element item: no suffix


def test_items_by_sitelink(items):
    got = {r["title"]: r["qid"]
           for r in wi.items_by_sitelink(items).collect()}
    assert got == {"Key:highway": "Q100", "Tag:amenity=fast food": "Q102"}


def test_keys_by_strid(items):
    rows = {(r["strid_type"], r["strid"]): r
            for r in wi.keys_by_strid(items).collect()}
    assert rows[("Key", "highway")]["qid"] == "Q100"
    assert rows[("Key", "building")]["qid"] == "Q101"  # label fallback
    # solved_ambiguous rewrite applied
    assert ("Tag", "amenity=fast_food") in rows
    assert ("Tag", "amenity=fast food") not in rows
    # duplicate strid: min-qid winner + full claimant list
    dup = rows[("Key", "surface")]
    assert dup["qid"] == "Q103" and dup["n_claimants"] == 2
    assert dup["claimants"] == ["Q103", "Q104"]
    assert rows[("Relation", "route")]["qid"] == "Q105"
    assert rows[("Role", "stop")]["qid"] == "Q106"
    assert rows[("Locale", "de")]["qid"] == "Q107"
    # undefined instance_of contributes nothing
    assert not any(r["qid"] == "Q109" for r in rows.values())


def test_items_by_name(items):
    got = {r["name"]: r["qid"]
           for r in wi.items_by_name(items, wi.Q_REL_MEMBER_ROLE).collect()}
    # labels + aliases lowercased; collision -> max-qid (last in dump)
    assert got == {"stop role": "Q106", "shared": "Q111"}


def test_region_by_lang_code(items):
    got = [tuple(r) for r in wi.region_by_lang_code(items).collect()]
    assert got == [("de", "Q107")]


# ---------------------------------------------------------------------------
# WikiPageTitles
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # (ns, title, is_redirect)
        (0, "Key:highway", False),
        (200, "DE:Key:highway", False),
        (0, "fr:Key:highway", False),          # main-ns language prefix
        (0, "Tag:amenity=café", False),
        (0, "Key:old_name", True),             # redirect chain: 2 hops
        (0, "Key:older_name", True),
        (0, "Key:loop_a", True),               # circular pair
        (0, "Key:loop_b", True),
        # underscore/space spellings share one sitelink ("Key:surface
        # one"): de group = one live + one redirect -> live wins; the
        # same pair in English -> ambiguous, dropped
        (200, "DE:Key:surface one", False),
        (200, "DE:Key:surface_one", True),
        (0, "Key:surface one", False),
        (0, "Key:surface_one", True),
        # all-redirect group: the good_title spelling wins ("FR:key:"
        # lowercase type differs from its canonical form)
        (202, "FR:key:surface_one", True),
        (202, "FR:Key:surface one", True),
        (0, "Random page", False),             # unparseable -> dropped
    ]
    return spark.createDataFrame(rows, ["ns", "title", "is_redirect"])


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("Key:old_name", "Key:older_name"),
        ("Key:older_name", "Key:highway"),
        ("Key:loop_a", "Key:loop_b"),
        ("Key:loop_b", "Key:loop_a"),
        ("Key:surface_one", "Key:surface one"),
        ("DE:Key:surface_one", "DE:Key:surface one"),
        ("FR:key:surface_one", "FR:Key:surface one"),
        ("FR:Key:surface one", "DE:Key:surface one"),
    ]
    return spark.createDataFrame(rows, ["from_title", "to_title"])


def test_parse_page_titles(spark, pages):
    parsed = wi.parse_page_titles(pages)
    rows = {r["title"]: r for r in parsed.collect()}
    assert "Random page" not in rows
    de = rows["DE:Key:highway"]
    assert (de["lang"], de["item_type"], de["item_id"]) == ("de", "Key", "highway")
    assert de["good_title"] == "DE:Key:highway"
    fr = rows["fr:Key:highway"]
    assert (fr["lang"], fr["sitelink"]) == ("fr", "Key:highway")
    assert fr["good_title"] == "Fr:Key:highway"
    assert rows["Key:old_name"]["sitelink"] == "Key:old name"


def test_canonical_and_redirects(spark, pages, edges):
    out = wi.wiki_page_titles(pages, edges)
    rows = {(r["sitelink"], r["lang"]): r for r in out.collect()}
    # single candidates pass straight through
    assert rows[("Key:highway", "en")]["redirect_target"] is None
    assert rows[("Key:highway", "de")]["title"] == "DE:Key:highway"
    assert rows[("Key:highway", "fr")]["title"] == "fr:Key:highway"
    # multi-candidate de group: the single non-redirect wins
    assert rows[("Key:surface one", "de")]["title"] == "DE:Key:surface one"
    # all-redirect fr group: the canonical-spelling candidate wins and
    # its chain resolves through the de redirect target
    fr = rows[("Key:surface one", "fr")]
    assert fr["title"] == "FR:Key:surface one"
    assert fr["redirect_target"] == "DE:Key:surface one"
    # redirect chain resolves transitively
    assert rows[("Key:old name", "en")]["redirect_target"] == "Key:highway"
    assert rows[("Key:older name", "en")]["redirect_target"] == "Key:highway"
    # circular chain -> NULL target (reference's False sentinel)
    assert rows[("Key:loop a", "en")]["redirect_target"] is None
    # multiple en candidates drop the group (live + redirect, lang==en)
    assert ("Key:surface one", "en") not in rows


def test_redirect_chain_longer_than_max_hops_yields_null_row(spark):
    # a chain deeper than max_hops must still produce its (sitelink,
    # lang) row — with a NULL target — not silently vanish
    pages = spark.createDataFrame(
        [(0, "Key:deep_a", True)], ["ns", "title", "is_redirect"]
    )
    edges = spark.createDataFrame(
        [
            ("Key:deep_a", "Key:deep_b"),
            ("Key:deep_b", "Key:deep_c"),
            ("Key:deep_c", "Key:deep_d"),
        ],
        ["from_title", "to_title"],
    )
    chosen = wi.canonical_page_titles(wi.parse_page_titles(pages))
    out = wi.resolve_redirects(chosen, edges, max_hops=2).collect()
    assert len(out) == 1
    assert out[0]["sitelink"] == "Key:deep a"
    assert out[0]["redirect_target"] is None
    # and with enough hops the same chain resolves
    ok = wi.resolve_redirects(chosen, edges, max_hops=4).collect()
    assert ok[0]["redirect_target"] == "Key:deep_d"
