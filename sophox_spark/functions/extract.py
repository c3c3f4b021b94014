"""HTML → text + geo-entity extraction (byte-pinned, Arrow-batched).

The ``input_hint`` contract: pages arrive as
``(url, warc_ts, html:binary, text, lang)`` and extracted text must be
byte-identical per url. The reference stack never parses HTML (Sophox
consumes OSM PBF), so the extractor below IS the specification — the
rules are pinned here exactly, the goldens in tests/ assert them
byte-for-byte against an independent re-implementation, the same way the
reference pins its tag grammar across two implementations
(osmutils.py:107-124 vs utils.rs:19-132).

Text extraction spec (order matters; all regex case-insensitive,
DOTALL where noted):
  1. decode html bytes as UTF-8 with errors='replace'
  2. delete <script…>…</script> and <style…>…</style> blocks (DOTALL)
  3. delete <!-- … --> comments (DOTALL)
  4. replace every remaining <…> tag with a single space
  5. decode exactly these entities, in this order:
     &lt; &gt; &quot; &#39; &nbsp;(→space) and finally &amp;
  6. collapse [ \\t\\r\\n]+ runs to one space; strip both ends

Geo signals extracted (SURVEY §7.1; analog of the reference's tag
normalization rules P3-P5):
  * <meta name="geo.position" content="LAT;LON">
  * <meta name="ICBM" content="LAT, LON">
  * decimal "lat, lon" pairs in the extracted text (3-7 decimals,
    range-validated)
  * openstreetmap.org/node/{id} and /way/{id} hrefs
  * wikidata=Q… / wikipedia=lang:Title tag strings (normalized via
    sophox_spark.functions.normalize)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.I | re.S)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.I | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n]+")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]

GEO_POSITION_RE = re.compile(
    r'<meta\s+name="geo\.position"\s+content="(-?\d+(?:\.\d+)?);(-?\d+(?:\.\d+)?)"',
    re.I,
)
ICBM_RE = re.compile(
    r'<meta\s+name="ICBM"\s+content="(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)"', re.I
)
TEXT_LATLON_RE = re.compile(r"(-?\d{1,2}\.\d{3,7}),\s(-?\d{1,3}\.\d{3,7})")
OSM_REF_RE = re.compile(r"openstreetmap\.org/(node|way)/(\d+)")
WIKIDATA_TAG_RE = re.compile(r"wikidata=((?:Q[0-9]+)(?:;\s?Q[0-9]+)*)")
WIKIPEDIA_TAG_RE = re.compile(r"wikipedia=([-a-z]+:[^\s<\"]+)")


def extract_text_str(html: str) -> str:
    """The pinned extraction function (scalar; batched callers below)."""
    s = _SCRIPT_RE.sub("", html)
    s = _STYLE_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    s = _TAG_RE.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    return _WS_RE.sub(" ", s).strip()


def extract_text_batch(html_bytes: pd.Series) -> pd.Series:
    """binary html → extracted text, one Arrow batch at a time."""
    decoded = html_bytes.map(lambda b: b.decode("utf-8", "replace") if b is not None else None)
    return decoded.map(lambda s: extract_text_str(s) if s is not None else None)


def extract_mentions_batch(urls: pd.Series, html_bytes: pd.Series) -> pd.DataFrame:
    """Pages batch → long mentions frame
    ``(url, kind, lat, lon, osm_type, osm_id, entity)``.

    kind ∈ {meta_geo, meta_icbm, text_latlon, osm_ref, wikidata,
    wikipedia}; coordinate kinds fill lat/lon, osm_ref fills
    osm_type/osm_id, entity kinds fill entity. Invalid coordinates are
    kept with lat/lon = NaN (loc:error semantics — never dropped
    silently, osmutils.py:68-73)."""
    html = html_bytes.map(
        lambda b: b.decode("utf-8", "replace") if b is not None else ""
    )
    text = html.map(extract_text_str)
    out: dict[str, list] = {
        "url": [], "kind": [], "lat": [], "lon": [],
        "osm_type": [], "osm_id": [], "entity": [],
    }

    def emit(url, kind, lat=np.nan, lon=np.nan, osm_type=None, osm_id=None, entity=None):
        out["url"].append(url)
        out["kind"].append(kind)
        out["lat"].append(lat)
        out["lon"].append(lon)
        out["osm_type"].append(osm_type)
        out["osm_id"].append(osm_id)
        out["entity"].append(entity)

    def checked(lat_s: str, lon_s: str) -> tuple[float, float]:
        lat, lon = float(lat_s), float(lon_s)
        if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
            return np.nan, np.nan
        return lat, lon

    for url, h, t in zip(urls.tolist(), html.tolist(), text.tolist()):
        for m in GEO_POSITION_RE.finditer(h):
            lat, lon = checked(m.group(1), m.group(2))
            emit(url, "meta_geo", lat, lon)
        for m in ICBM_RE.finditer(h):
            lat, lon = checked(m.group(1), m.group(2))
            emit(url, "meta_icbm", lat, lon)
        for m in TEXT_LATLON_RE.finditer(t):
            lat, lon = checked(m.group(1), m.group(2))
            if not np.isnan(lat):  # free-text pairs: drop non-coordinates
                emit(url, "text_latlon", lat, lon)
        for m in OSM_REF_RE.finditer(h):
            emit(url, "osm_ref", osm_type=m.group(1), osm_id=int(m.group(2)))
        for m in WIKIDATA_TAG_RE.finditer(h):
            emit(url, "wikidata", entity=m.group(1))
        for m in WIKIPEDIA_TAG_RE.finditer(h):
            emit(url, "wikipedia", entity=m.group(1))
    df = pd.DataFrame(out)
    df["osm_id"] = df["osm_id"].astype("Int64")
    return df


MENTIONS_SCHEMA = (
    "url string, kind string, lat double, lon double, "
    "osm_type string, osm_id long, entity string"
)


def extract_mentions(pages_df):
    """Spark wrapper: pages → mentions via mapInPandas (UDTF analog of
    the reference's per-element callbacks, SURVEY §2.9)."""

    def gen(batches):
        for pdf in batches:
            yield extract_mentions_batch(pdf["url"], pdf["html"])

    return pages_df.select("url", "html").mapInPandas(gen, MENTIONS_SCHEMA)
