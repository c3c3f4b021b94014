"""OSM conversion pipeline goldens: way-geometry join, polygon
classification, TTL statement blocks (byte-level, independent oracle)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sophox_spark.functions import ttl
from sophox_spark.operators import osm2ttl, osm_geometry
from sophox_spark.sources import synth

NODES_SCHEMA = (
    "id long, version int, user string, ts timestamp, changeset long, "
    "deleted boolean, lon double, lat double, tags map<string,string>"
)
WAYS_SCHEMA = (
    "id long, version int, user string, ts timestamp, changeset long, "
    "deleted boolean, refs array<long>, tags map<string,string>"
)
RELS_SCHEMA = (
    "id long, version int, user string, ts timestamp, changeset long, "
    "deleted boolean, members array<struct<type:string,ref:long,role:string>>, "
    "tags map<string,string>"
)


@pytest.fixture(scope="module")
def osm(spark):
    nodes_pdf = synth.osm_nodes_pdf(300)
    ways_pdf = synth.osm_ways_pdf(nodes_pdf, 80)
    rels_pdf = synth.osm_relations_pdf(nodes_pdf, ways_pdf, 30)
    return (
        spark.createDataFrame(nodes_pdf, NODES_SCHEMA).cache(),
        spark.createDataFrame(ways_pdf, WAYS_SCHEMA).cache(),
        spark.createDataFrame(rels_pdf, RELS_SCHEMA).cache(),
        nodes_pdf, ways_pdf, rels_pdf,
    )


class TestWayLocations:
    def test_against_pandas_oracle(self, spark, osm):
        nodes_df, ways_df, _, nodes_pdf, ways_pdf, _ = osm
        got = osm_geometry.way_locations(nodes_df, ways_df).toPandas().set_index("way_id")
        node_loc = nodes_pdf.set_index("id")[["lon", "lat"]]
        for _, w in ways_pdf.iterrows():
            g = got.loc[w["id"]]
            refs = list(w["refs"])
            coords = []
            err = len(refs) == 0
            for r in refs:
                if r in node_loc.index:
                    lon, lat = node_loc.loc[r]
                    if np.isnan(lon) or np.isnan(lat):
                        err = True
                    coords.append((lon, lat))
                else:
                    err = True
            assert bool(g["loc_error"]) == err, w["id"]
            # osmium obj.is_closed(): first node REF == last node REF,
            # regardless of resolution (RdfHandler.py:76)
            closed = len(refs) > 0 and refs[0] == refs[-1]
            assert bool(g["is_closed"]) == closed, w["id"]
            if coords and not err:
                mid = coords[(len(coords) - 1) // 2]
                assert g["rep_lon"] == pytest.approx(mid[0])
                assert g["rep_lat"] == pytest.approx(mid[1])

    def test_polygon_classification(self, spark, osm):
        _, ways_df, _, _, ways_pdf, _ = osm
        got = osm_geometry.classify_polygons(ways_df).select("id", "is_polygon").toPandas()
        got = got.set_index("id")["is_polygon"]
        from sophox_spark.functions.normalize import is_polygon_tags

        for _, w in ways_pdf.iterrows():
            assert bool(got.loc[w["id"]]) == is_polygon_tags(w["tags"]), w["tags"]


def oracle_turtle_blocks(nodes_pdf, ways_pdf, rels_pdf):
    """Independent plain-Python conversion (the reference algorithm
    re-executed sequentially — FIXTURES.md §7 golden_statements)."""
    node_loc = nodes_pdf.set_index("id")[["lon", "lat"]]
    blocks = {}

    def meta(row, type_char):
        return [
            "osmm:type " + ttl.stringify(type_char),
            f'osmm:version "{row["version"]}"^^xsd:integer',
            "osmm:user " + ttl.stringify(row["user"]),
            f'osmm:timestamp "{row["ts"]:%Y-%m-%dT%H:%M:%S}Z"^^xsd:dateTime',
            f'osmm:changeset "{row["changeset"]}"^^xsd:integer',
        ]

    for _, r in nodes_pdf.iterrows():
        if r["deleted"]:
            continue
        tags = [(k, v) for k, v in r["tags"].items() if k != "created_by"]
        if not tags:
            continue
        stmts = [ttl.tag_statement(k, v) for k, v in tags]
        if np.isnan(r["lon"]) or np.isnan(r["lat"]):
            stmts.append(ttl.loc_error_statement())
        else:
            stmts.append(ttl.point_statement("osmm:loc", r["lon"], r["lat"]))
        stmts += meta(r, "n")
        blocks[f"osmnode:{r['id']}"] = ttl.turtle_block(f"osmnode:{r['id']}", stmts)

    for _, r in ways_pdf.iterrows():
        if r["deleted"]:
            continue
        stmts = [
            ttl.tag_statement(k, v) for k, v in r["tags"].items() if k != "created_by"
        ]
        refs = list(r["refs"])
        coords, err = [], len(refs) == 0
        for ref in refs:
            if ref in node_loc.index:
                lon, lat = node_loc.loc[ref]
                if np.isnan(lon) or np.isnan(lat):
                    err = True
                coords.append((lon, lat))
            else:
                err = True
                coords.append((np.nan, np.nan))
        # osmium obj.is_closed(): first REF == last REF (RdfHandler.py:76)
        closed = len(refs) > 0 and refs[0] == refs[-1]
        stmts.append(f'osmm:isClosed "{"true" if closed else "false"}"^^xsd:boolean')
        if err:
            stmts.append(ttl.loc_error_statement())
        else:
            mid = coords[(len(coords) - 1) // 2]
            stmts.append(ttl.point_statement("osmm:loc", mid[0], mid[1]))
        stmts += meta(r, "w")
        blocks[f"osmway:{r['id']}"] = ttl.turtle_block(f"osmway:{r['id']}", stmts)

    tp = {"n": "osmnode:", "w": "osmway:", "r": "osmrel:"}
    for _, r in rels_pdf.iterrows():
        if r["deleted"]:
            continue
        stmts = [
            ttl.tag_statement(k, v) for k, v in r["tags"].items() if k != "created_by"
        ]
        for m in r["members"]:
            ref = tp[m["type"]] + str(m["ref"])
            stmts.append("osmm:has " + ref)
            stmts.append(ref + " " + ttl.stringify(m["role"]))
        stmts += meta(r, "r")
        blocks[f"osmrel:{r['id']}"] = ttl.turtle_block(f"osmrel:{r['id']}", stmts)
    return blocks


class TestTurtleConversion:
    def test_blocks_byte_identical(self, spark, osm):
        nodes_df, ways_df, rels_df, nodes_pdf, ways_pdf, rels_pdf = osm
        got = {
            r.subject: r.block
            for r in osm2ttl.convert(nodes_df, ways_df, rels_df).collect()
        }
        # is_closed is refs-based in both paths (osmium obj.is_closed())
        want = oracle_turtle_blocks(nodes_pdf, ways_pdf, rels_pdf)
        assert set(got) == set(want)
        mismatches = [s for s in want if got[s] != want[s]]
        assert mismatches == [], (
            mismatches[:3],
            [got[s] for s in mismatches[:1]],
            [want[s] for s in mismatches[:1]],
        )

    def test_write_turtle_roundtrip(self, spark, osm, tmp_path):
        import gzip
        import glob

        nodes_df, ways_df, rels_df, *_ = osm
        blocks = osm2ttl.convert(nodes_df, ways_df, rels_df)
        out = str(tmp_path / "ttl")
        osm2ttl.write_turtle(blocks, out, max_blocks_per_file=50,
                             last_timestamp=pd.Timestamp("2025-06-01T12:00:00"))
        parts = sorted(glob.glob(out + "/part-*.txt.gz"))
        assert len(parts) >= 2  # rotation happened
        text = "".join(gzip.open(p, "rt").read() for p in parts)
        assert text.count(".\n\n") == blocks.count()
        header = open(out + "/prefixes.ttl").read()
        assert header.startswith("@prefix wd:")
        footer = gzip.open(out + "/zz-footer.ttl.gz", "rt").read()
        assert footer == '\nosmroot: schema:dateModified "2025-06-01T12:00:00Z"^^xsd:dateTime .'


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
