"""Deterministic synthetic fixtures (seed=42 conventions, FIXTURES.md).

Generates the engine's own test tables at any scale — Common-Crawl-style
``pages`` exactly matching the input_hint shape
``(url, warc_ts, html:binary, text, lang)``, OSM-style elements
(nodes/ways/relations mirroring /root/reference/osm2rdf/RdfHandler.py's
data model), admin/water polygons, POIs, and a change stream. No
external data; same seed ⇒ identical bytes.

Skew is built in on purpose: ≥30% of geo mentions fall in one dense
urban cell (FIXTURES.md §1) so the salting/two-phase paths are actually
exercised.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.extract import extract_text_str
from ..geometry import wkb

SEED = 42
# the "dense city" — all skewed mentions cluster here
CITY_LON, CITY_LAT = 13.40, 52.50
WORLD = (-25.0, 30.0, 45.0, 65.0)  # lon0, lat0, lon1, lat1 (Europe-ish box)


def _rng(salt: int = 0) -> np.random.Generator:
    return np.random.default_rng(SEED + salt)


def random_points(n: int, salt: int = 0, skew: float = 0.3):
    """(lon, lat) with ``skew`` share gaussian-clustered in the city."""
    rng = _rng(salt)
    n_city = int(n * skew)
    lon = np.empty(n)
    lat = np.empty(n)
    lon[:n_city] = rng.normal(CITY_LON, 0.02, n_city)
    lat[:n_city] = rng.normal(CITY_LAT, 0.012, n_city)
    lon[n_city:] = rng.uniform(WORLD[0], WORLD[2], n - n_city)
    lat[n_city:] = rng.uniform(WORLD[1], WORLD[3], n - n_city)
    return np.round(lon, 6), np.round(lat, 6)


def _star_polygon(rng, cx, cy, r_mean):
    nv = int(rng.integers(6, 20))
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = rng.uniform(0.4 * r_mean, 1.6 * r_mean, nv)
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def admin_polygons_pdf(n: int = 60) -> pd.DataFrame:
    """polygon_id, wikidata, kind, admin_level, geom(WKB).

    Includes: shared Q-ids (dissolve/union-per-id), water polygons
    (water-subtraction case wd_only_sql.js:23-28), one donut (hole), one
    multipolygon, mixed winding, and a big polygon right over the dense
    city (maximum skew in the cell join)."""
    rng = _rng(1)
    rows = []
    # the dense-city polygon first: guaranteed hot
    city = _star_polygon(rng, CITY_LON, CITY_LAT, 0.15)
    rows.append((0, "Q64", "admin", 4, wkb.polygon_wkb([city])))
    for pid in range(1, n):
        cx = rng.uniform(WORLD[0] + 2, WORLD[2] - 2)
        cy = rng.uniform(WORLD[1] + 2, WORLD[3] - 2)
        r_mean = float(rng.uniform(0.2, 2.5))
        kind = "water" if rng.random() < 0.15 else "admin"
        qid = f"Q{int(rng.integers(100, 100 + n * 0.7))}"  # collisions intended
        level = int(rng.integers(2, 9))
        if pid == 1:  # donut
            outer = _star_polygon(rng, cx, cy, r_mean)
            hole = _star_polygon(rng, cx, cy, r_mean * 0.25)
            blob = wkb.polygon_wkb([outer, hole])
        elif pid == 2:  # multipolygon, parts disjoint
            p1 = _star_polygon(rng, cx, cy, r_mean * 0.5)
            p2 = _star_polygon(rng, cx + 3 * r_mean, cy, r_mean * 0.5)
            blob = wkb.multipolygon_wkb([[p1], [p2]])
        elif pid == 3:  # mixed winding (exterior CCW instead of CW)
            ring = _star_polygon(rng, cx, cy, r_mean)[::-1].copy()
            blob = wkb.polygon_wkb([ring])
        else:
            blob = wkb.polygon_wkb([_star_polygon(rng, cx, cy, r_mean)])
        rows.append((pid, qid, kind, level, blob))
    return pd.DataFrame(
        rows, columns=["polygon_id", "wikidata", "kind", "admin_level", "geom"]
    )


def pois_pdf(n: int = 500) -> pd.DataFrame:
    lon, lat = random_points(n, salt=2, skew=0.4)
    rng = _rng(3)
    names = [f"poi_{i:05d}" for i in range(n)]
    cat = rng.choice(["cafe", "station", "museum", "park", "shop"], n)
    return pd.DataFrame(
        {"poi_id": np.arange(n, dtype=np.int64), "name": names,
         "category": cat, "lon": lon, "lat": lat}
    )


_HTML_TMPL = """<html><head>
<title>Page {i}</title>
{metas}<script>var x = 1 < 2 && "ignored 99.999, 11.111";</script>
<style>.a {{ color: red; }}</style>
</head><body>
<!-- comment with 12.345, 67.890 -->
<h1>Report &amp; notes {i}</h1>
<p>{body}</p>
{links}
<p>tags: {tags}</p>
</body></html>"""


def pages_pdf(n: int = 200, mentions_per_page: int = 3) -> pd.DataFrame:
    """input_hint-shaped pages with embedded geo signals; the returned
    ``text`` column is produced by the pinned extractor (so the
    byte-identical invariant is testable end to end)."""
    rng = _rng(4)
    n_mentions = n * mentions_per_page
    lon, lat = random_points(n_mentions, salt=5, skew=0.35)
    langs = rng.choice(
        np.array(["en", "de", "fr", "pt-br", "EN!", "x9"], dtype=object),
        n, p=[0.45, 0.2, 0.15, 0.1, 0.05, 0.05],
    )
    rows = []
    mi = 0
    base_ts = np.datetime64("2025-06-01T00:00:00")
    for i in range(n):
        k = int(rng.integers(1, mentions_per_page + 1))
        metas, body_parts, links, tags = [], [], [], []
        for j in range(k):
            la, lo = lat[mi], lon[mi]
            mi += 1
            style = int(rng.integers(0, 4))
            if style == 0:
                metas.append(f'<meta name="geo.position" content="{la};{lo}">\n')
            elif style == 1:
                metas.append(f'<meta name="ICBM" content="{la}, {lo}">\n')
            elif style == 2:
                body_parts.append(f"Visit us at {la}, {lo} for details.")
            else:
                body_parts.append(f"Coordinates {la}, {lo} were logged.")
        if rng.random() < 0.4:
            links.append(
                f'<a href="https://www.openstreetmap.org/node/{int(rng.integers(1, 500))}">node</a>'
            )
        if rng.random() < 0.25:
            links.append(
                f'<a href="https://www.openstreetmap.org/way/{int(rng.integers(1, 120))}">way</a>'
            )
        if rng.random() < 0.35:
            qs = ";".join(
                f"Q{int(q)}" for q in rng.integers(1, 5000, rng.integers(1, 3))
            )
            tags.append(f"wikidata={qs}")
        if rng.random() < 0.3:
            tags.append("wikipedia=en:Some Page Title")
        body = " ".join(body_parts) or "No coordinates here."
        html = _HTML_TMPL.format(
            i=i, metas="".join(metas), body=body,
            links=" ".join(links), tags=" ".join(tags),
        )
        rows.append(
            (
                f"https://example.org/page/{i:06d}",
                base_ts + np.timedelta64(int(rng.integers(0, 30 * 86400)), "s"),
                html.encode("utf-8"),
                extract_text_str(html),
                str(langs[i]),
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def osm_nodes_pdf(n: int = 400) -> pd.DataFrame:
    """OSM node fixtures incl. every grammar edge case (FIXTURES.md §2)."""
    rng = _rng(6)
    lon, lat = random_points(n, salt=7)
    users = rng.choice(
        np.array(['alice', 'böb "quoted"', '碧海', 'tab\there', 'carol'], dtype=object), n
    )
    tags: list[dict | None] = []
    for i in range(n):
        t: dict[str, str] = {}
        r = rng.random()
        if r < 0.08:
            t = {}  # untagged → skipped node
        else:
            t["name"] = f"node {i}"
            if rng.random() < 0.3:
                t["created_by"] = "editor"  # dropped
            if rng.random() < 0.2:
                t["wikidata"] = f"Q{int(rng.integers(1, 9999))}"
            if rng.random() < 0.05:
                t["wikidata"] = "Q12;Q13"
            if rng.random() < 0.05:
                t["xx:wikidata"] = "Q7"
            if rng.random() < 0.1:
                t["wikipedia"] = "en:Page With Space#anchor"
            if rng.random() < 0.05:
                t["-badlead"] = "x"  # badkey
            if rng.random() < 0.05:
                t["k" * 61] = "toolong"  # badkey
        tags.append(t)
    deleted = rng.random(n) < 0.05
    lat = lat.copy()
    lat[5] = np.nan  # the invalid-location row → loc:error
    return pd.DataFrame(
        {
            "id": np.arange(1, n + 1, dtype=np.int64),
            "version": rng.integers(1, 9, n).astype(np.int32),
            "user": users,
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000_000, n), unit="s"),
            "changeset": rng.integers(1, 10_000, n).astype(np.int64),
            "deleted": deleted,
            "lon": lon,
            "lat": lat,
            "tags": tags,
        }
    )


def osm_ways_pdf(nodes: pd.DataFrame, n: int = 120) -> pd.DataFrame:
    """Ways referencing node ids; includes closed rings, a missing-node
    ref (loc error), polygon-classifying tags."""
    rng = _rng(8)
    node_ids = nodes["id"].to_numpy()
    rows = []
    for i in range(n):
        k = int(rng.integers(2, 9))
        refs = rng.choice(node_ids, k, replace=False).astype(np.int64).tolist()
        if i % 10 == 0 and k >= 3:
            refs.append(refs[0])  # closed ring
        if i == 7:
            refs[0] = 999_999  # missing node → loc error
        if i == 11:
            refs = []  # zero-ref way: still emits isClosed/loc rows
        if i == 13:
            refs = [refs[0], refs[0]]  # 2-node loop [a,a]: is_closed by REF
        t = {"name": f"way {i}"}
        if rng.random() < 0.4:
            t["building"] = "yes"  # polygon key
        if rng.random() < 0.1:
            t["area"] = "no"
        if rng.random() < 0.1:
            t["area"] = "yes"
        rows.append(
            (
                np.int64(i + 1), np.int32(rng.integers(1, 5)), "mapper",
                pd.Timestamp("2025-02-01") + pd.Timedelta(seconds=int(rng.integers(0, 10_000_00))),
                np.int64(rng.integers(1, 10_000)), bool(rng.random() < 0.04),
                refs, t,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["id", "version", "user", "ts", "changeset", "deleted", "refs", "tags"],
    )


def osm_relations_pdf(nodes: pd.DataFrame, ways: pd.DataFrame, n: int = 40) -> pd.DataFrame:
    """Relations with typed members; includes rel→rel chains and a 2-cycle
    (fixpoint termination case, updateRelLoc.py:76-87)."""
    rng = _rng(9)
    rows = []
    for i in range(n):
        rid = np.int64(i + 1)
        members = []
        for _ in range(int(rng.integers(1, 6))):
            t = str(rng.choice(["n", "w"], p=[0.7, 0.3]))
            ref = int(rng.choice(nodes["id"] if t == "n" else ways["id"]))
            members.append(
                {"type": t, "ref": ref, "role": str(rng.choice(["inner", "outer", ""]))}
            )
        if i in (10, 11, 12):  # chain r10 → r11 → r12
            members.append({"type": "r", "ref": int(rid) + 1, "role": "sub"})
        if i == 20:  # 2-cycle r20 ↔ r21
            members.append({"type": "r", "ref": 22, "role": "loop"})
        if i == 21:
            members.append({"type": "r", "ref": 21, "role": "loop"})
        rows.append(
            (
                rid, np.int32(rng.integers(1, 4)), "relmapper",
                pd.Timestamp("2025-03-01") + pd.Timedelta(seconds=int(rng.integers(0, 10_000_00))),
                np.int64(rng.integers(1, 10_000)), bool(rng.random() < 0.03),
                members, {"type": "multipolygon"} if rng.random() < 0.5 else {"name": f"rel {i}"},
            )
        )
    return pd.DataFrame(
        rows,
        columns=["id", "version", "user", "ts", "changeset", "deleted", "members", "tags"],
    )


def changes_pdf(nodes: pd.DataFrame, n_batches: int = 5) -> pd.DataFrame:
    """Change stream over nodes: seqid batches of create/modify/delete,
    with an in-batch duplicate (RdfUpdateHandler.py:27-31) and a replayed
    seqid (at-least-once resume, RdfUpdateHandler.py:84-85)."""
    rng = _rng(10)
    rows = []
    base = nodes.head(50).reset_index(drop=True)
    for b in range(n_batches):
        seq = 1000 + b
        ids = rng.choice(base["id"].to_numpy(), 12, replace=False)
        for j, nid in enumerate(ids):
            op = str(rng.choice(["create", "modify", "delete"], p=[0.2, 0.65, 0.15]))
            rows.append(
                (
                    np.int64(seq), op, np.int64(nid),
                    np.int32(b + 2), "editor",
                    pd.Timestamp("2025-05-01") + pd.Timedelta(minutes=b * 60 + j),
                    float(np.round(rng.uniform(*WORLD[::2]), 6)),
                    float(np.round(rng.uniform(*WORLD[1::2]), 6)),
                    {"name": f"v{b}-{nid}"},
                )
            )
        # in-batch duplicate: same subject twice, later one must win
        rows.append(
            (
                np.int64(seq), "modify", np.int64(ids[0]), np.int32(b + 3), "editor",
                pd.Timestamp("2025-05-01") + pd.Timedelta(minutes=b * 60 + 59),
                13.0, 52.0, {"name": f"dup-win-{b}"},
            )
        )
    # replayed batch: seqid 1001 appears again, identical rows
    replay = [r for r in rows if r[0] == 1001]
    rows.extend(replay)
    return pd.DataFrame(
        rows,
        columns=["seqid", "op", "id", "version", "user", "ts", "lon", "lat", "tags"],
    )


# ---- Spark wrappers -------------------------------------------------------

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
POLYGONS_SCHEMA = (
    "polygon_id long, wikidata string, kind string, admin_level int, geom binary"
)
POIS_SCHEMA = "poi_id long, name string, category string, lon double, lat double"


def pages_df(spark, n: int = 200):
    return spark.createDataFrame(pages_pdf(n), schema=PAGES_SCHEMA)


def admin_polygons_df(spark, n: int = 60):
    return spark.createDataFrame(admin_polygons_pdf(n), schema=POLYGONS_SCHEMA)


def pois_df(spark, n: int = 500):
    return spark.createDataFrame(pois_pdf(n), schema=POIS_SCHEMA)
