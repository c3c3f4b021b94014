"""Template census (WikiPagesWithTemplate) + enum-key taginfo values
(TagInfoDb) mirrors."""
import pytest

from sophox_spark.sources import wikipages as wp
from sophox_spark.sources import taginfo


def test_extract_all_templates_nested_and_params():
    text = (
        "Lead <!-- {{Hidden|x}} --> {{KeyDescription|key=hwy "
        "|description=Main {{Tag|highway|primary}} road|1st}} "
        "tail {{Other}}"
    )
    got = wp.extract_all_templates(text)
    names = [n for n, _ in got]
    # comment-disabled template dropped; nested yielded separately,
    # document order by start offset
    assert names == ["KeyDescription", "Tag", "Other"]
    kd = got[0][1]
    assert kd["key"] == "hwy"
    assert kd["description"] == "Main {{Tag|highway|primary}} road"
    assert kd["1"] == "1st"  # positional after named params
    assert got[1][1] == {"1": "highway", "2": "primary"}
    assert got[2][1] == {}


def test_extract_all_templates_eq_inside_nested():
    got = wp.extract_all_templates("{{A|x={{B|k=v}}|y=[[C|d=e]]}}")
    a = dict(got)["A"]
    assert a["x"] == "{{B|k=v}}"
    assert a["y"] == "[[C|d=e]]"


@pytest.fixture(scope="module")
def census_pages(spark):
    rows = [
        (0, "Key:highway", "{{KeyDescription|key=highway|g=1}} {{Nope|z}}"),
        (1, "Talk:Key:highway", "{{KeyDescription|key=talk}}"),     # talk ns
        (2, "User:Bob", "{{KeyDescription|key=user}}"),             # user ns
        (10, "Template:KeyDescription/doc", "{{KeyDescription|key=doc}}"),
        (10, "Template:Other", "{{ValueDescription|key=t|value=v}}"),
        (200, "DE:Key:surface", "x {{Template:KeyDescription|key=de}} y"),
        (0, "Key:empty", "no templates here"),
    ]
    return spark.createDataFrame(rows, ["ns", "title", "wikitext"])


def test_pages_with_template(spark, census_pages):
    out = wp.pages_with_template(
        census_pages,
        template=("Template:KeyDescription",),
        template_filters=("KeyDescription", "ValueDescription"),
    ).collect()
    got = {(r["ns"], r["title"], r["template"]) for r in out}
    assert got == {
        (0, "Key:highway", "KeyDescription"),
        (10, "Template:Other", "ValueDescription"),
        (200, "DE:Key:surface", "Template:KeyDescription"),
    }
    by_title = {r["title"]: r["params"] for r in out}
    assert by_title["Key:highway"] == {"key": "highway", "g": "1"}
    assert by_title["Template:Other"] == {"key": "t", "value": "v"}


def test_enum_key_values(spark):
    from sophox_spark.operators import wiki_items as wi
    import json

    items_rows = [
        json.dumps({"id": "Q1", "labels": {}, "aliases": {},
                    "claims": {"P2": ["Q7"], "P9": ["Q8"], "P16": ["surface"]},
                    "sitelink": None}),
        json.dumps({"id": "Q2", "labels": {}, "aliases": {},
                    "claims": {"P2": ["Q7"], "P9": ["Q9"], "P16": ["highway"]},
                    "sitelink": None}),  # not enum-typed
        json.dumps({"id": "Q3", "labels": {}, "aliases": {},
                    "claims": {"P2": ["Q7"], "P9": ["Q8"], "P16": ["name"]},
                    "sitelink": None}),  # known non-enum
    ]
    items = wi.items_from_jsonl(
        spark.createDataFrame([(r,) for r in items_rows], ["value"])
    )
    tags = spark.createDataFrame(
        [
            ("surface", "asphalt", 6000),       # big count, kept
            ("surface", "dirt;gravel", 60),     # split, each kept (wellformed)
            ("surface", "dirt", 30),            # merges with split dirt: 90
            ("surface", "Weird Case", 80),      # not wellformed, <=5000: drop
            ("surface", "rare", 10),            # below both thresholds
            ("highway", "primary", 9999),       # key not enum-typed
            ("name", "Main Street", 9001),      # known non-enum
        ],
        ["key", "value", "count_all"],
    )
    got = {(r["k"], r["v"]): r["c"]
           for r in taginfo.enum_key_values(items, tags).collect()}
    assert got == {
        ("surface", "asphalt"): 6000,
        ("surface", "dirt"): 90,
        ("surface", "gravel"): 60,
    }
