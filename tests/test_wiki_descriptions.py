"""metabot DescriptionParser / ItemFromConcept analogs
(sources/wiki_descriptions.py) — pure-parse goldens plus the
DataFrame merge semantics."""

import pytest

from sophox_spark.sources import wiki_descriptions as wd


class TestTitleParsing:
    def test_plain_key_title(self):
        assert wd.parse_page_title(0, "Key:highway") == (
            "Key", "en", "highway", False)

    def test_tag_title(self):
        assert wd.parse_page_title(0, "Tag:highway=residential") == (
            "Tag", "en", "highway=residential", False)

    def test_lang_prefix_main_ns(self):
        assert wd.parse_page_title(0, "DE:Key:highway") == (
            "Key", "de", "highway", False)

    def test_lang_namespace(self):
        # ns 200 = DE wiki; title keeps the prefix before the first ':'
        assert wd.parse_page_title(200, "DE:Key:highway") == (
            "Key", "de", "highway", False)
        # talk namespace folds to its subject namespace language
        assert wd.parse_page_title(201, "DE talk:Key:highway") == (
            "Key", "de", "highway", False)

    def test_suspect_lang(self):
        t, lang, i, suspect = wd.parse_page_title(0, "xx:Key:highway")
        assert suspect and t is False

    def test_non_key_page(self):
        assert wd.parse_page_title(0, "Some article") == (
            False, "en", False, False)


class TestParamNormalization:
    def run(self, template, params):
        msgs = []
        return wd.normalize_params(template, params, msgs), msgs

    def test_synonyms_and_star_strip(self):
        r, _ = self.run("keydescription",
                        {"descrizione": "* some text", "key": "highway"})
        assert r == {"description": "some text", "key": "highway"}

    def test_lang_folding(self):
        r, _ = self.run("keydescription", {"language": "PT-BR"})
        assert r == {"lang": "pt"}

    def test_wikidata_validation(self):
        r, msgs = self.run("keydescription",
                           {"wikidata": "Q123", "key": "a"})
        assert r["wikidata"] == "Q123"
        r, msgs = self.run("keydescription", {"wikidata": "Q0"})
        assert "wikidata" not in r and msgs

    def test_status_and_on_keys(self):
        r, msgs = self.run("keydescription",
                           {"status": "Approved", "onNode": "YES",
                            "onWay": "?", "onArea": "maybe"})
        assert r == {"status": "approved", "onnode": "yes"}
        assert any("onarea" in m for m in msgs)

    def test_image_sanitization(self):
        r, _ = self.run("keydescription", {"image": "Image:Foo.png"})
        assert r["image"] == "File:Foo.png"
        r, msgs = self.run("keydescription", {"image": "None yet.jpg"})
        assert "image" not in r and msgs

    def test_deprecated_gate(self):
        r, _ = self.run("deprecated",
                        {"oldkey": "k", "oldvalue": "v",
                         "newtext": "use x", "status": "approved",
                         "description": "gone"})
        assert r == {"oldkey": "k", "oldvalue": "v", "newtext": "use x"}

    def test_combination_extraction(self):
        r, _ = self.run(
            "keydescription",
            {"combination": "{{Tag|lanes|2}} {{Key|surface}}"},
        )
        assert r["combination"] == "Tag lanes=2;Key surface"
        assert r["combination!text"] == "{{Tag|lanes|2}} {{Key|surface}}"

    def test_tag_template_subkey_and_multivalue(self):
        msgs = []
        items = wd._parse_tag_template(
            "Tag", {"1": "fuel", "subkey": "octane_95", "2": "yes/no"}, msgs)
        assert items == [("Tag", "fuel:octane_95=yes"),
                         ("Tag", "fuel:octane_95=no")]

    def test_bad_tag_value_logged_but_yielded(self):
        # DescriptionParserItem.py:251-255: a bad value logs
        # 'Bad Tag val' but the item is STILL yielded
        msgs = []
        items = wd._parse_tag_template(
            "Tag", {"1": "highway", "2": "bad!!value"}, msgs)
        assert items == [("Tag", "highway=bad!!value")]
        assert any("Bad Tag val" in m for m in msgs)

    def test_relation_link_extraction(self):
        # free-text [[Relation:...]] links inside combination lists
        # (parse_combinations, DescriptionParserItem.py:184-191)
        r, _ = self.run(
            "keydescription",
            {"combination": "{{Key|surface}} and [[Relation:route|a route]]"},
        )
        assert r["combination"] == "Key surface;Relation route"
        # Key/Tag links are logged, not extracted
        r2, msgs2 = self.run(
            "keydescription", {"combination": "[[Key:lanes|lanes]]"})
        assert "combination" not in r2
        assert any("unrecognized" in m for m in msgs2)
        # language-prefixed Relation link
        r3, _ = self.run(
            "keydescription", {"combination": "[[DE:Relation:route]]"})
        assert r3["combination"] == "Relation route"


class TestIdExtractor:
    def test_key_id(self):
        msgs = []
        assert wd.id_extractor("Key", "highway",
                               {"key": "highway"}, msgs) == "highway"

    def test_tag_id_composition(self):
        msgs = []
        assert wd.id_extractor(
            "Tag", "highway=residential",
            {"key": "highway", "value": "residential"}, msgs
        ) == "highway=residential"

    def test_mismatch_normalizes_through_sitelink(self):
        msgs = []
        # underscore vs space: sitelink-equal, param id wins
        assert wd.id_extractor("Key", "name left",
                               {"key": "name_left"}, msgs) == "name_left"
        # true mismatch: refused + message
        assert wd.id_extractor("Key", "highway",
                               {"key": "building"}, msgs) is False
        assert msgs

    def test_relation_type_id(self):
        assert wd.id_extractor("Relation", "route",
                               {"type": "route"}, []) == "route"
        assert wd.id_extractor(
            "Relation", False,
            {"oldkey": "type", "oldvalue": "multipolygon"}, []
        ) == "multipolygon"


class TestPageParse:
    WIKITEXT = (
        "Intro text.\n{{KeyDescription|key=highway"
        "|description=Roads and paths|status=Approved|onNode=no"
        "|onWay=yes|wikidata=Q42}}\nFooter."
    )

    def test_full_page(self):
        r = wd.parse_description_page(0, "Key:highway", self.WIKITEXT)
        assert r["type"] == "Key" and r["str_id"] == "highway"
        assert r["lang"] == "en" and r["template"] == "keydescription"
        assert r["params"]["description"] == "Roads and paths"
        assert r["params"]["status"] == "approved"
        assert r["params"]["onway"] == "yes"

    def test_talk_and_user_pages_skipped(self):
        assert wd.parse_description_page(1, "Talk:Key:highway",
                                         self.WIKITEXT) is None
        assert wd.parse_description_page(2, "User:Bob", self.WIKITEXT) is None

    def test_template_name_variants(self):
        text = "{{Template:ValueDescription|key=amenity|value=pub|description=A pub}}"
        r = wd.parse_description_page(0, "Tag:amenity=pub", text)
        assert r["template"] == "valuedescription"
        assert r["str_id"] == "amenity=pub" and r["type"] == "Tag"

    def test_title_lang_conflict_en_yields_param_lang(self):
        text = "{{KeyDescription|key=highway|lang=de|description=Strassen}}"
        r = wd.parse_description_page(0, "Key:highway", text)
        assert r["lang"] == "de" and r["messages"]


class TestMergeAndConcepts:
    def test_language_fallback_merge(self, spark):
        pages = spark.createDataFrame(
            [
                (0, "Key:highway",
                 "{{KeyDescription|key=highway|description=Roads"
                 "|status=approved|onNode=no|onWay=yes}}"),
                (200, "DE:Key:highway",
                 "{{KeyDescription|key=highway|description=Strassen"
                 "|onNode=yes|wikidata=Q42}}"),
                # es page binds description only — must not shadow en
                (204, "ES:Key:surface",
                 "{{KeyDescription|key=surface|description=Superficie}}"),
                (202, "FR:Key:surface",
                 "{{KeyDescription|key=surface|status=draft}}"),
            ],
            "ns long, title string, wikitext string",
        )
        items = wd.description_items(pages)
        got = {
            r.str_id: r
            for r in wd.merged_descriptions(items).collect()
        }
        hw = got["highway"]
        assert hw.description == "Roads"  # en outranks de
        assert hw.description_lang == "en"
        assert hw.wikidata == "Q42"  # only de bound it
        assert hw.on_node and hw.on_way  # OR across languages
        sf = got["surface"]
        assert sf.description == "Superficie"  # es page, not fr's null
        assert sf.status == "draft"
        assert sf.n_pages == 2

    def test_concept_items(self, spark):
        df = spark.createDataFrame(
            [("pt_BR", "Portuguese", None), ("de", "German", "Deutschland")],
            "lang_code string, lang_name string, label string",
        )
        got = {r.lang_code: r
               for r in wd.concept_items(df, label_en_col="label").collect()}
        pt = got["pt_BR"]
        assert pt.sitelink == "Locale:pt BR"
        assert pt.instance_of == "Q6999" and pt.lang_code_prop == "P32"
        assert pt.label_en == "Portuguese-speaking region"
        assert pt.description_en.startswith("This region includes Portuguese")
        de = got["de"]
        assert de.label_en == "Deutschland" and de.description_en is None


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
