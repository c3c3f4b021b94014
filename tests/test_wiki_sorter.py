"""metabot Sorter analog (operators/wiki_sorter.py): canonical item
ordering goldens + the distributed claims sort."""

import pytest

from sophox_spark.operators import wiki_sorter as ws


class TestCanonicalizeItem:
    def test_root_and_language_order(self):
        item = {
            "claims": {},
            "labels": {"fr": "route", "en": "road", "de": "Strasse"},
            "id": "Q1",
            "type": "item",
        }
        out = ws.canonicalize_item(item)
        assert list(out) == ["type", "id", "labels", "claims"]
        assert list(out["labels"]) == ["en", "de", "fr"]

    def test_prop_delete_and_order(self):
        def claim(v, rank="normal"):
            return {"rank": rank,
                    "mainsnak": {"datavalue": {"value": v}}}

        item = {
            "claims": {
                "P16": [claim("highway")],
                "P5": [claim("gone")],      # meant/not-meant: deleted
                "P2": [claim("Q7")],
                "P24": [claim("gone2")],    # deleted
                "P6": [claim("b"), claim("a", "preferred")],
            }
        }
        out = ws.canonicalize_item(item)
        assert list(out["claims"]) == ["P2", "P16", "P6"]
        # preferred sorts before normal regardless of value
        vals = [c["mainsnak"]["datavalue"]["value"]
                for c in out["claims"]["P6"]]
        assert vals == ["a", "b"]

    def test_qualifier_ordering(self):
        qual_locale = [
            {"datavalue": {"value": {"id": "Q7788"}}},  # Spanish (late)
            {"datavalue": {"value": {"id": "Q6994"}}},  # German (early)
        ]
        qual_caption = [
            {"datavalue": {"value": {"language": "fr", "text": "x"}}},
            {"datavalue": {"value": {"language": "en", "text": "y"}}},
        ]
        item = {
            "claims": {
                "P28": [{
                    "rank": "normal",
                    "mainsnak": {"datavalue": {"value": "img.png"}},
                    "qualifiers": {"P26": qual_locale, "P47": qual_caption},
                    "qualifiers-order": ["P47", "P26"],
                }]
            }
        }
        out = ws.canonicalize_item(item)
        cl = out["claims"]["P28"][0]
        assert [q["datavalue"]["value"]["id"]
                for q in cl["qualifiers"]["P26"]] == ["Q6994", "Q7788"]
        assert [q["datavalue"]["value"]["language"]
                for q in cl["qualifiers"]["P47"]] == ["en", "fr"]
        assert cl["qualifiers-order"] == ["P26", "P47"]

    def test_no_sort_props_exemption(self):
        def claim(v):
            return {"rank": "normal",
                    "mainsnak": {"datavalue": {"value": v}}}

        item = {"claims": {"P46": [claim("z"), claim("a")]}}
        out = ws.canonicalize_item(item, no_sort_props=frozenset({"P46"}))
        vals = [c["mainsnak"]["datavalue"]["value"]
                for c in out["claims"]["P46"]]
        assert vals == ["z", "a"]  # merge_all props keep input order

    def test_merge_all_props_unsorted_by_default(self):
        # the DEFAULT no-sort set is the reference's merge_all
        # properties (Properties.py: P22, P18, P45, P46) — Sorter.py:188
        # skips sorting them, so the default must too
        def claim(v):
            return {"rank": "normal",
                    "mainsnak": {"datavalue": {"value": v}}}

        item = {"claims": {p: [claim("z"), claim("a")]
                           for p in ("P22", "P18", "P45", "P46")}}
        out = ws.canonicalize_item(item)
        for p in ("P22", "P18", "P45", "P46"):
            vals = [c["mainsnak"]["datavalue"]["value"]
                    for c in out["claims"][p]]
            assert vals == ["z", "a"], p

    def test_monolingual_claim_value_order(self):
        def mono(lang):
            return {"rank": "normal",
                    "mainsnak": {"datavalue": {
                        "value": {"language": lang, "text": "t"}}}}

        item = {"claims": {"P31": [mono("fr"), mono("en"), mono("de")]}}
        out = ws.canonicalize_item(item)
        langs = [c["mainsnak"]["datavalue"]["value"]["language"]
                 for c in out["claims"]["P31"]]
        assert langs == ["en", "de", "fr"]


class TestSortClaims:
    def test_positions_match_pure_ordering(self, spark):
        rows = [
            ("Q1", "P16", "highway", "normal"),
            ("Q1", "P2", "Q7", "normal"),
            ("Q1", "P5", "x", "normal"),        # deleted
            ("Q1", "P6", "b", "normal"),
            ("Q1", "P6", "a", "preferred"),     # preferred first
            ("Q1", "P999", "u", "normal"),      # unknown prop: last
            ("Q2", "P46", "t2", "normal"),
            ("Q2", "P46", "t1", "normal"),
        ]
        df = spark.createDataFrame(
            rows, "item string, prop string, value string, claim_rank string"
        )
        out = ws.sort_claims(df, rank_col="claim_rank")
        got = {
            (r.item, r.pos): (r.prop, r.value)
            for r in out.collect()
        }
        assert got == {
            ("Q1", 0): ("P2", "Q7"),
            ("Q1", 1): ("P16", "highway"),
            ("Q1", 2): ("P6", "a"),
            ("Q1", 3): ("P6", "b"),
            ("Q1", 4): ("P999", "u"),
            ("Q2", 0): ("P46", "t1"),
            ("Q2", 1): ("P46", "t2"),
        }

    def test_merge_all_props_keep_input_order(self, spark):
        # with an explicit input-order column, merge_all props (the
        # default no_sort_props) keep that order instead of value order
        rows = [
            ("Q1", "P46", "z", "normal", 0),
            ("Q1", "P46", "a", "normal", 1),
            ("Q1", "P6", "z", "normal", 2),
            ("Q1", "P6", "a", "normal", 3),
        ]
        df = spark.createDataFrame(
            rows,
            "item string, prop string, value string, claim_rank string,"
            " seq long",
        )
        out = ws.sort_claims(
            df, rank_col="claim_rank", input_order_col="seq")
        got = {(r.item, r.pos): (r.prop, r.value) for r in out.collect()}
        assert got == {
            ("Q1", 0): ("P6", "a"),     # P6 sorted by value
            ("Q1", 1): ("P6", "z"),
            ("Q1", 2): ("P46", "z"),    # P46 keeps input order
            ("Q1", 3): ("P46", "a"),
        }


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
