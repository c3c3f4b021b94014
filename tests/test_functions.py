"""Grammar goldens: tag normalization, TTL literal grammar, HTML text
extraction (byte-identical), mention extraction."""

import json
from urllib.parse import quote

import pandas as pd
import pytest

from sophox_spark.functions import extract, normalize, ttl
from sophox_spark.sources import synth


class TestNormalize:
    def test_key_validity(self):
        keys = pd.Series(
            ["name", "addr:street", "is_in:city", "-lead", "trail-", "a" * 61,
             "a" * 60, "ok_key-1", "bad key", "x"]
        )
        got = normalize.valid_keys(keys).tolist()
        assert got == [True, True, True, False, False, False, True, True, False, True]

    def test_wikidata_values(self):
        vals = pd.Series(["Q42", "Q1;Q2", "Q01", "nope", "Q42;bad", None])
        got = normalize.wikidata_iris(vals).tolist()
        assert got[0] == ["wd:Q42"]
        assert got[1] == ["wd:Q1", "wd:Q2"]
        assert got[2] is None and got[3] is None and got[4] is None

    def test_wikipedia_urls(self):
        vals = pd.Series(["en:Page With Space#anchor", "de:Straße", "EN:Bad", "plain"])
        got = normalize.wikipedia_urls(vals).tolist()
        assert got[0] == "https://en.wikipedia.org/wiki/Page_With_Space#anchor"
        assert got[1] == "https://de.wikipedia.org/wiki/Stra%C3%9Fe"
        assert got[2] is None and got[3] is None


class TestTtlGrammar:
    """Byte-level goldens re-derived independently from the reference
    grammar spec (osmutils.py:107-132 + utils.py:23-24,90-98)."""

    def test_tag_plain(self):
        assert ttl.tag_statement("name", 'Caffè "X"') == 'osmt:name "Caffè \\"X\\""'

    def test_tag_badkey(self):
        assert ttl.tag_statement("-lead", "v") == 'osmm:badkey "-lead"'
        assert ttl.tag_statement("k" * 61, "v") == f'osmm:badkey "{"k" * 61}"'

    def test_tag_wikidata(self):
        assert ttl.tag_statement("wikidata", "Q42") == "osmt:wikidata wd:Q42"
        assert (
            ttl.tag_statement("xx:wikidata", "Q1;Q2")
            == "osmt:xx:wikidata wd:Q1,wd:Q2"
        )
        # invalid Q stays a plain string literal
        assert ttl.tag_statement("wikidata", "Q01") == 'osmt:wikidata "Q01"'

    def test_tag_wikipedia(self):
        got = ttl.tag_statement("wikipedia", "en:Page With Space#anchor")
        assert got == "osmt:wikipedia <https://en.wikipedia.org/wiki/Page_With_Space#anchor>"
        # the exact reference safe-set must hold for every special char
        title = "A;B@C$D!E*F(G)H,I/J~K:L#M N?O&P"
        got = ttl.tag_statement("wikipedia", f"en:{title}")
        want = "<https://en.wikipedia.org/wiki/" + quote(
            title.replace(" ", "_"), safe=";@$!*(),/~:#"
        ) + ">"
        assert got == "osmt:wikipedia " + want

    def test_typed_literals(self):
        assert ttl.point_statement("osmm:loc", 13.4, 52.5) == (
            'osmm:loc "Point(13.4 52.5)"^^geo:wktLiteral'
        )
        # str(float) shortest-repr, not fixed precision
        assert ttl.point_statement("osmm:loc", 0.1 + 0.2, 1.0) == (
            'osmm:loc "Point(0.30000000000000004 1.0)"^^geo:wktLiteral'
        )
        import datetime as dt

        d = dt.datetime(2015, 5, 1, 1, 0, 0)
        assert ttl.xsd_date(d) == '"2015-05-01T01:00:00Z"^^xsd:dateTime'

    def test_stringify_json_escape(self):
        assert ttl.stringify('tab\there "q" ß') == json.dumps(
            'tab\there "q" ß', ensure_ascii=False
        )

    def test_turtle_block(self):
        blk = ttl.turtle_block("osmnode:1", ['osmt:name "x"', 'osmm:version "2"^^xsd:integer'])
        assert blk == 'osmnode:1\nosmt:name "x";\nosmm:version "2"^^xsd:integer.\n\n'

    def test_header_footer(self):
        h = ttl.file_header()
        assert h.startswith("@prefix wd: <http://www.wikidata.org/entity/> .")
        assert h.endswith("\n\n")
        import datetime as dt

        f = ttl.footer(dt.datetime(2025, 1, 2, 3, 4, 5))
        assert f == '\nosmroot: schema:dateModified "2025-01-02T03:04:05Z"^^xsd:dateTime .'


def independent_extract(html: str) -> str:
    """Second implementation of the text-extraction spec, written
    differently on purpose (char scanner instead of regex substitution)."""
    import re as _re

    # strip script/style/comment blocks
    for pat in (r"(?is)<script\b.*?</script\s*>", r"(?is)<style\b.*?</style\s*>", r"(?s)<!--.*?-->"):
        html = _re.sub(pat, "", html)
    out = []
    in_tag = False
    for ch in html:
        if ch == "<":
            in_tag = True
            out.append(" ")
        elif ch == ">" and in_tag:
            in_tag = False
        elif not in_tag:
            out.append(ch)
    s = "".join(out)
    for ent, rep in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
        s = s.replace(ent, rep)
    return _re.sub(r"[ \t\r\n]+", " ", s).strip()


class TestExtract:
    def test_byte_identical_vs_independent_impl(self):
        pages = synth.pages_pdf(80)
        for _, row in pages.iterrows():
            html = row["html"].decode("utf-8")
            assert extract.extract_text_str(html) == independent_extract(html), row["url"]

    def test_text_column_matches_extractor(self):
        pages = synth.pages_pdf(40)
        got = extract.extract_text_batch(pages["html"])
        assert (got == pages["text"]).all()

    def test_script_style_comment_stripped(self):
        html = '<p>keep</p><script>var a = "1.234, 5.678";</script><!-- 9.123, 4.567 -->'
        t = extract.extract_text_str(html)
        assert t == "keep"

    def test_entities(self):
        assert extract.extract_text_str("a &amp;&lt;b&gt; &quot;c&#39;") == 'a &<b> "c\''

    def test_mentions_found(self):
        pages = synth.pages_pdf(120)
        m = extract.extract_mentions_batch(pages["url"], pages["html"])
        kinds = set(m["kind"])
        assert {"meta_geo", "meta_icbm", "text_latlon", "osm_ref"} <= kinds
        coords = m[m["kind"].isin(["meta_geo", "meta_icbm", "text_latlon"])]
        assert coords["lat"].abs().max() <= 90
        assert coords["lon"].abs().max() <= 180
        # script/comment decoys never leak
        assert not ((coords["lat"] == 12.345) & (coords["lon"] == 67.890)).any()
        assert not (coords["lat"] == 99.999).any()

    def test_mentions_spark_parity(self, spark):
        pages = synth.pages_df(spark, 60)
        got = extract.extract_mentions(pages).toPandas()
        pdf = synth.pages_pdf(60)
        want = extract.extract_mentions_batch(pdf["url"], pdf["html"])
        got_s = got.sort_values(list(got.columns)).reset_index(drop=True)
        want_s = want.sort_values(list(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got_s[sorted(got.columns)], want_s[sorted(want.columns)], check_dtype=False
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestExtractionGoldenFile:
    """Checked-in (url → sha256(text)) fixture pins the extractor's
    output bytes ACROSS sessions and rounds (input_hint: byte-identical
    extracted text per url). If the extraction spec or the synthetic
    page generator changes intentionally, regenerate the fixture —
    any other diff here is a byte-level regression."""

    def test_hashes_match_golden_file(self):
        import hashlib
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_text_hashes.json")
        golden = json.load(open(path))
        pages = synth.pages_pdf(200)
        got = {
            r["url"]: hashlib.sha256(r["text"].encode()).hexdigest()
            for _, r in pages.iterrows()
        }
        assert got == golden
        # and re-extracting from html reproduces the same bytes
        re_extracted = extract.extract_text_batch(pages["html"])
        got2 = {
            u: hashlib.sha256(t.encode()).hexdigest()
            for u, t in zip(pages["url"], re_extracted)
        }
        assert got2 == golden


class TestWikipages:
    """metabot-analog template parser (sources/wikipages.py) — balanced
    braces, nested templates/links, positional params, language merge."""

    def test_parse_basic_and_case(self):
        from sophox_spark.sources import wikipages as wp

        t = "x {{KeyDescription|key=highway|onNode=YES|status= Approved }} y"
        p = wp.parse_template(t, ("keydescription",))
        assert p["key"] == "highway"
        assert p["onnode"] == "YES"
        assert p["status"] == "Approved"

    def test_parse_nested_template_and_link(self):
        from sophox_spark.sources import wikipages as wp

        t = (
            "{{ValueDescription|key=amenity|value=bar|description=See "
            "{{tag|amenity|pub}} and [[Some|Link]] here|onArea=yes}}"
        )
        p = wp.parse_template(t, ("keydescription", "valuedescription"))
        # the nested {{tag|..}} pipes and [[..|..]] pipe must NOT split params
        assert p["description"] == "See {{tag|amenity|pub}} and [[Some|Link]] here"
        assert p["onarea"] == "yes"
        assert p["value"] == "bar"

    def test_positional_params_and_multiline(self):
        from sophox_spark.sources import wikipages as wp

        t = "{{tag|building|house}}\n{{KeyDescription\n|key=building\n|onWay=no\n}}"
        p = wp.parse_template(t, ("keydescription",))
        assert p["key"] == "building"
        pos = wp.parse_template(t, ("tag",))
        assert pos["1"] == "building" and pos["2"] == "house"

    def test_no_template_returns_none(self):
        from sophox_spark.sources import wikipages as wp

        assert wp.parse_template("no templates here", ("keydescription",)) is None
        assert wp.parse_template("{{KeyDescription|key=x", ("keydescription",)) is None

    def test_tag_refs(self):
        from sophox_spark.sources import wikipages as wp

        t = "a {{tag|highway|primary}} b {{Key|building}} c {{tag|amenity}} d"
        assert wp.extract_tag_refs(t) == [
            "highway=primary", "building", "amenity",
        ]

    def test_language_merge_prefers_en(self, spark):
        from sophox_spark.sources import wikipages as wp

        pdf = pd.DataFrame(
            {
                "lang": ["de", "en", "zz"],
                "wikitext": [
                    "{{KeyDescription|key=k1|onNode=yes|description=DE desc|status=approved}}",
                    "{{KeyDescription|key=k1|onNode=no|description=EN desc|status=in use}}",
                    "{{KeyDescription|key=k1|onWay=yes|description=ZZ desc|status=rejected}}",
                ],
            }
        )
        pages = spark.createDataFrame(pdf, "lang string, wikitext string")
        merged = wp.merge_language_claims(wp.page_claims(pages)).collect()
        assert len(merged) == 1
        r = merged[0]
        assert r.description == "EN desc" and r.description_lang == "en"
        assert r.status == "in use"
        assert r.on_node is True  # OR across languages (de said yes)
        assert r.on_way is True   # zz said yes
        assert r.n_pages == 3


def test_repetition_stats_hand_computed(spark):
    import pandas as pd

    from sophox_spark.functions import textstats

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["a b\na b\nc d e",      # dup line + repeated bigram
                     "unique line only"],    # no newlines, no repeats
        })
    )
    out = {r.doc_id: r for r in
           textstats.repetition_stats(docs).collect()}
    r1 = out[1]
    assert r1.n_lines == 3
    assert r1.dup_line_frac == pytest.approx(1 / 3)
    # 'a b' occurs twice: one repeat * 3 chars / (2*3 + 5) line chars
    assert r1.dup_line_char_frac == pytest.approx(3 / 11)
    # bigrams over newline-joined tokens: 'a b' twice, len 3, text 13
    assert r1.top_bigram == "a b"
    assert r1.top_bigram_frac == pytest.approx(6 / 13)
    r2 = out[2]
    assert r2.n_lines == 1 and r2.dup_line_frac == 0.0
    assert r2.dup_line_char_frac == 0.0
    # all bigrams count 1 -> lexicographic tie-break
    assert r2.top_bigram == "line only"


def test_gopher_rules_hand_computed(spark):
    import pandas as pd

    from sophox_spark.functions import textstats

    good = " ".join(["word"] * 52) + " the of and that"
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                good,                                  # passes everything
                "tiny text",                           # word count fails
                "• one two\n• three\nthe end of it...",  # bullet+ellipsis
                good + " " + " ".join(["#"] * 7),      # symbol ratio fails
            ],
        })
    )
    out = {r.doc_id: r for r in textstats.gopher_rules(docs).collect()}
    r1 = out[1]
    assert r1.n_words == 56
    assert r1.mean_word_len == pytest.approx((52 * 4 + 12) / 56)
    assert r1.alpha_word_frac == 1.0
    assert r1.symbol_word_ratio == 0.0
    assert r1.stop_hits == 4
    assert r1.passes == 1
    r2 = out[2]
    assert r2.n_words == 2 and r2.passes == 0
    r3 = out[3]
    assert r3.bullet_line_frac == pytest.approx(2 / 3)
    assert r3.ellipsis_line_frac == pytest.approx(1 / 3)
    assert r3.passes == 0  # ellipsis > 0.3 (and word count)
    r4 = out[4]
    # '#' words carry no alpha char
    assert r4.n_words == 63
    assert r4.symbol_word_ratio == pytest.approx(7 / 63)
    assert r4.alpha_word_frac == pytest.approx(56 / 63)
    assert r4.passes == 0  # symbol ratio > 0.1


def test_c4_filters_hand_computed(spark):
    import pandas as pd

    from sophox_spark.functions import textstats

    keepers = "\n".join(
        f"Keeper sentence number {w} stays." for w in ("one", "two", "three", "four", "five")
    )
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [
                keepers,                                     # clean: keep_doc
                "One two three four.\nshort.\nno punct here\n"
                "Use javascript now.\n" + keepers,           # lorem-free but js line
                keepers + "\nlorem ipsum paragraph here.",   # lorem kills doc
            ],
        })
    )
    out = {r.doc_id: r for r in textstats.c4_filters(docs).collect()}
    r1 = out[1]
    assert r1.n_kept == 5 and r1.n_dropped == 0 and r1.keep_doc == 1
    assert r1.clean_text == keepers
    r2 = out[2]
    # 'short.' (1 word), 'no punct here' (no terminal), javascript line drop
    assert r2.n_kept == 6 and r2.n_dropped == 3
    assert "javascript" not in r2.clean_text
    assert r2.keep_doc == 1  # 6 sentences, no lorem/brace
    r3 = out[3]
    # the lorem line itself is a valid line (kept in clean_text) but
    # the DOCUMENT verdict is drop
    assert r3.n_kept == 6 and r3.keep_doc == 0


def test_c4_filters_curly_brace_doc(spark):
    import pandas as pd

    from sophox_spark.functions import textstats

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1],
            "text": ["Good line one stays here.\n" * 6 + "f() { return; }"],
        })
    )
    r = textstats.c4_filters(docs).collect()[0]
    assert r.keep_doc == 0 and r.n_kept == 6


def test_pretoken_count_hand_computed(spark):
    import pandas as pd

    from sophox_spark.functions import textstats

    cases = {
        # "don't stop": [don]["'t"][ stop] = 3
        "don't stop": 3,
        # [it]['s][ 42][.][5][%][ off][!] = 8
        "it's 42.5% off!": 8,
        "": 0,
        # ["  "][leading][ spaces]: the ' ?\p{L}+' branch needs a letter
        # right after its single optional space, so the leading run
        # falls to '\s+' as one segment
        "  leading spaces": 3,
    }
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"i": range(len(cases)), "text": list(cases.keys())}
        )
    )
    from pyspark.sql import functions as F2

    out = {
        r.i: r.n
        for r in docs.select(
            "i", textstats.pretoken_count(F2.col("text")).alias("n")
        ).collect()
    }
    for i, want in enumerate(cases.values()):
        assert out[i] == want, (i, list(cases)[i], out[i], want)


class TestBpe:
    def test_sennrich_classic_merges(self, spark):
        from sophox_spark.functions import bpe

        rows = []
        for i, (w, c) in enumerate(
            [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        ):
            rows.append((i, (w + " ") * c))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = bpe.train_bpe(df, n_merges=6)
        # hand-derived: ties break (count desc, left asc, right asc)
        assert merges == [
            (0, "e", "s", 9),
            (1, "es", "t", 9),
            (2, "l", "o", 7),
            (3, "lo", "w", 7),
            (4, "e", "w", 6),
            (5, "ew", "est", 6),
        ]
        seg = {
            r["doc_id"]: r["pieces"]
            for r in bpe.apply_bpe(df, merges).collect()
        }
        assert seg[0] == ["low"] * 5
        assert seg[1] == ["low", "e", "r"] * 2
        assert seg[2] == ["n", "ewest"] * 6  # merge 5 (ew,est) applies too
        assert seg[3] == ["w", "i", "d", "est"] * 3

    def test_matches_reference_bpe(self, spark):
        # independent reference implementation (Sennrich get_stats /
        # merge_vocab semantics, deterministic tie-break) over a
        # less-structured corpus
        import collections

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the dog and the fox and the quick cat",
            "lazy lazy dogs dogs dogs foxes",
        ]

        def ref_bpe(texts, n):
            vocab = collections.Counter()
            for t in texts:
                for w in t.lower().split():
                    vocab[tuple(w)] += 1
            out = []
            for rank in range(n):
                stats = collections.Counter()
                for syms, c in vocab.items():
                    for i in range(len(syms) - 1):
                        stats[(syms[i], syms[i + 1])] += c
                if not stats:
                    break
                best = max(stats.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0][0]], ))
                # deterministic: count desc, left asc, right asc
                bc = max(stats.values())
                cands = sorted(k for k, v in stats.items() if v == bc)
                left, right = cands[0]
                out.append((rank, left, right, bc))
                new = {}
                for syms, c in vocab.items():
                    merged, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    new[tuple(merged)] = new.get(tuple(merged), 0) + c
                vocab = collections.Counter(new)
            return out

        from sophox_spark.functions import bpe

        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = bpe.train_bpe(df, n_merges=10)
        assert got == ref_bpe(texts, 10)


class TestQualityClf:
    @staticmethod
    def _bucket(tok, dim=64):
        import hashlib

        h = hashlib.md5(tok.encode()).hexdigest()
        u = 0
        for j in range(8):
            u += int(h[j], 16) * 16 ** (7 - j)
        return u % dim

    def test_hand_computed_two_steps(self, spark):
        import math

        from sophox_spark.functions import quality_clf

        fa, fb = self._bucket("aaa"), self._bucket("bbb")
        assert fa != fb
        df = spark.createDataFrame(
            [(1, "aaa", 1.0), (2, "bbb", 0.0)],
            "doc_id long, text string, label double",
        )
        w = {
            r["f"]: r["w"]
            for r in quality_clf.train_quality_clf(df, iters=2).collect()
        }
        # step 1: margins 0 -> sigmoid .5; grads -(1-.5)/2 and +.5/2
        wa1, wb1 = 0.25, -0.25
        # step 2
        ra = 1.0 / (1.0 + math.exp(-wa1)) - 1.0
        rb = 1.0 / (1.0 + math.exp(-wb1)) - 0.0
        wa2 = wa1 - ra / 2
        wb2 = wb1 - rb / 2
        assert abs(w[fa] - wa2) < 1e-12
        assert abs(w[fb] - wb2) < 1e-12
        assert sum(1 for v in w.values() if v == 0.0) == 62

    def test_separates_vocabularies(self, spark):
        from sophox_spark.functions import quality_clf

        rows = []
        for i in range(20):
            rows.append((i, "good clean prose with substance", 1.0))
            rows.append((100 + i, "spam junk noise garbage clutter", 0.0))
        df = spark.createDataFrame(rows, "doc_id long, text string, label double")
        w = quality_clf.train_quality_clf(df, iters=5, lr=4.0)
        scores = {
            r["doc_id"]: r["p_good"]
            for r in quality_clf.score_quality(df, w).collect()
        }
        assert min(scores[i] for i in range(20)) > max(
            scores[100 + i] for i in range(20)
        )
