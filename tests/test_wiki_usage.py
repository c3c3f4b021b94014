"""metabot reporting long-tail (operators/wiki_usage.py):
WikiTagTemplateUsage + DataItemContributors analogs."""

import pandas as pd
import pytest

from sophox_spark.operators import wiki_usage as wu


class TestTagTemplateUsage:
    def test_counts_and_key_totals(self, spark):
        pages = spark.createDataFrame(
            pd.DataFrame({
                "wikitext": [
                    "{{Tag|highway|residential}} and {{Key|surface}}",
                    "{{Tag|highway|residential}} {{Tag|highway|service}}",
                    "{{Tag|fuel|octane_95/octane_98}}",  # multi-value split
                    "no templates here",
                ]
            })
        )
        out = wu.tag_template_usage(pages).toPandas()
        got = {
            (r.key, r.value): (r.cnt, r.key_total)
            for r in out.itertuples()
        }
        assert got == {
            ("highway", "residential"): (2, 3),
            ("highway", "service"): (1, 3),
            ("surface", ""): (1, 1),
            ("fuel", "octane_95"): (1, 2),
            ("fuel", "octane_98"): (1, 2),
        }


class TestContributorDigest:
    def test_kinds_langs_props_and_bot_filter(self, spark):
        rows = [
            ("Q1", "alice", "/* wbsetlabel-add:1|en */ foo"),
            ("Q1", "alice", "/* wbsetlabel-add:1|en */ foo again"),  # dup
            ("Q1", "bob", "/* wbsetdescription-set:1|de */ bar"),
            ("Q1", "bob", "/* wbsetaliases-add:1|fr */ baz"),
            ("Q2", "carol", "/* wbeditentity-create:0| */ new item"),
            ("Q2", "dave",
             "/* wbsetclaim-create:2||1 */ [[Property:P16]]: highway"),
            ("Q2", "Yurikbot", "/* wbsetlabel-add:1|ru */ bot edit"),
            ("Q3", "erin", "Reverted edits by vandal"),  # unparseable
            ("Q3", "erin", "undo revision 123"),
        ]
        df = spark.createDataFrame(
            rows, "qid string, user string, comment string")
        out = wu.contributor_digest(df)
        got = {(r.qid, r.kind, r.value) for r in out.collect()}
        assert got == {
            ("Q1", "label", "en"),
            ("Q1", "description", "de"),
            ("Q1", "aliases", "fr"),
            # editentity-create counts toward all three language kinds
            ("Q2", "label", ""),
            ("Q2", "description", ""),
            ("Q2", "aliases", ""),
            ("Q2", "claims", "P16"),
        }

    def test_claim_without_property_link_skipped(self, spark):
        df = spark.createDataFrame(
            [("Q9", "x", "/* wbsetclaim-update:2||1 */ no link here")],
            "qid string, user string, comment string")
        assert wu.contributor_digest(df).count() == 0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


MAP_FEATURES_PAGE = """Some intro text
{|
! header junk
|-
| [[{{{key|}}}|highway]]
| [[{{{value|}}}|residential]]
| node way
| {{{description|A residential road}}}
| {{{render|[[File:r1.png|80px]]}}}
| {{{image|[[Image:i1.jpg]]}}}
|- style="x"
| [[{{{key|}}}|building]]
| [[{{{value|}}}|yes]]
| area
| {{{description|A building}}}
| {{{render|[[File:r2.png]]}}}
| {{{image|[[File:i2.jpg|thumb]]}}}
|-
|}
trailer
"""


class TestMapFeatures:
    def test_table_rows_parsed(self):
        msgs = []
        rows = wu.parse_map_features_table("T", MAP_FEATURES_PAGE, msgs)
        assert rows == [
            ("T", "key", "highway", "value", "residential", "node way",
             "description", "A residential road", "r1.png", "i1.jpg"),
            ("T", "key", "building", "value", "yes", "area",
             "description", "A building", "r2.png", "i2.jpg"),
        ]

    def test_anchor_prefix_and_alt_kv_form(self):
        # {{anchor}}-prefixed cell + the second parse_kv form
        msgs = []
        p, i = wu._parse_kv_cell("{{anchor|x}}[[{{{key|}}}|amenity]]")
        assert (p, i) == ("key", "amenity")
        # the reference's greedy [^|}]+ group keeps the trailing space
        p2, i2 = wu._parse_kv_cell(
            "{{Tag|lang={{{lang|}}}|{{{key |}}} | shop | mall}}")
        assert p2.strip() == "key" and "shop" in i2

    def test_invalid_value_cell_skipped(self):
        msgs = []
        bad = MAP_FEATURES_PAGE.replace(
            "[[{{{value|}}}|residential]]", "just text")
        rows = wu.parse_map_features_table("T", bad, msgs)
        assert len(rows) == 1  # only the building row survives
        assert any("Invalid" in m for m in msgs)

    def test_multiple_tables_rejected(self):
        msgs = []
        two = MAP_FEATURES_PAGE + "\n{|\n|-\n|}\n"
        assert wu.parse_map_features_table("T", two, msgs) == []
        assert any("Multiple tables" in m for m in msgs)

    def test_dataframe_wrapper(self, spark):
        import pandas as pd

        pages = spark.createDataFrame(
            pd.DataFrame({"title": ["Template:Map Features:highway"],
                          "wikitext": [MAP_FEATURES_PAGE]}))
        out = wu.map_features_rows(pages).toPandas()
        assert len(out) == 2
        assert set(out["key_id"]) == {"highway", "building"}
        assert set(out["render_file"]) == {"r1.png", "r2.png"}
