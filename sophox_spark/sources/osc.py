"""OsmChange (.osc / .osc.gz) XML diff source — the reference's minute-diff
input format (S3), parsed for real.

The reference's update loop consumes osmosis replication diffs: gzipped
``<osmChange>`` documents whose ``<create>/<modify>/<delete>`` blocks hold
``<node>/<way>/<relation>`` elements (attributes ``id version timestamp
changeset uid user lat lon``; children ``<tag k v>``, ``<nd ref>``,
``<member type ref role>``). See /root/reference/osm2rdf/osm2rdf.py:49-60
(update path, ``osmium.apply`` over replication payloads) and
RdfUpdateHandler.py (the per-diff merge the parsed rows feed).

Spark shape: replication diffs are many small independent files, so
``spark.read.format("binaryFile")`` gives one task per file — the natural
unit of parallelism (the reference processes them *serially*; here a
backlog of N files fans out N-wide). Each task gunzips + parses its file
and emits element rows with their document position, so downstream
last-writer-wins merges (``incremental.dedup_latest`` on (seq, pos)) can
reproduce apply-in-order semantics exactly.

Raw coordinate/timestamp attribute *strings* are surfaced alongside parsed
doubles: merge logic and parity checks use the exact bytes from the XML,
never a float round-trip.
"""

from __future__ import annotations

import gzip
import os
from xml.etree import ElementTree
from xml.sax.saxutils import quoteattr

import pandas as pd

ACTIONS = ("create", "modify", "delete")

OSC_SCHEMA = (
    "file string, pos int, action string, kind string, id long, version int, "
    "ts_s string, changeset long, uid long, user string, lat_s string, "
    "lon_s string, lat double, lon double, tags map<string,string>, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)

_COLS = [
    "file", "pos", "action", "kind", "id", "version", "ts_s", "changeset",
    "uid", "user", "lat_s", "lon_s", "lat", "lon", "tags", "refs", "members",
]


# ---------------------------------------------------------------------------
# writer (fixture generation / sink symmetry)
# ---------------------------------------------------------------------------


def _elem_xml(row) -> str:
    attrs = [f"id={quoteattr(str(int(row['id'])))}"]
    for attr, col in (
        ("version", "version"), ("timestamp", "ts_s"),
        ("changeset", "changeset"), ("uid", "uid"), ("user", "user"),
        ("lat", "lat_s"), ("lon", "lon_s"),
    ):
        v = row.get(col)
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        if col in ("version", "changeset", "uid"):
            v = int(v)
        attrs.append(f"{attr}={quoteattr(str(v))}")
    head = f"<{row['kind']} " + " ".join(attrs)
    body = []
    for ref in row.get("refs") or []:
        body.append(f'<nd ref={quoteattr(str(int(ref)))}/>')
    for m in row.get("members") or []:
        body.append(
            f"<member type={quoteattr(m['type'])} ref={quoteattr(str(int(m['ref'])))}"
            f" role={quoteattr(m['role'])}/>"
        )
    for k in sorted(row.get("tags") or {}):
        body.append(f"<tag k={quoteattr(k)} v={quoteattr(str(row['tags'][k]))}/>")
    if not body:
        return head + "/>"
    return head + ">" + "".join(body) + f"</{row['kind']}>"


def write_osc(path: str, changes: pd.DataFrame, compress: bool | None = None,
              generator: str = "sophox_spark") -> None:
    """Write an osmChange document; ``changes`` needs an ``action`` column
    plus the element columns (see OSC_SCHEMA). Consecutive rows with the
    same action share one ``<action>`` block; row order is preserved (it
    IS the apply order)."""
    if compress is None:
        compress = path.endswith(".gz")
    parts = ["<?xml version='1.0' encoding='UTF-8'?>",
             f'<osmChange version="0.6" generator={quoteattr(generator)}>']
    prev = None
    for row in changes.to_dict("records"):
        action = row["action"]
        if action not in ACTIONS:
            raise ValueError(f"unknown action {action!r}")
        if action != prev:
            if prev is not None:
                parts.append(f"</{prev}>")
            parts.append(f"<{action}>")
            prev = action
        parts.append(_elem_xml(row))
    if prev is not None:
        parts.append(f"</{prev}>")
    parts.append("</osmChange>")
    data = "\n".join(parts).encode("utf-8")
    if compress:
        # mtime=0: byte-deterministic output for a given input
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def parse_osc_bytes(data: bytes, fname: str = "") -> pd.DataFrame:
    """One osmChange document → element rows in document order."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    root = ElementTree.fromstring(data)
    rows = []
    pos = 0
    for block in root:
        action = block.tag
        if action not in ACTIONS:
            continue
        for el in block:
            if el.tag not in ("node", "way", "relation"):
                continue
            a = el.attrib
            tags, refs, members = {}, [], []
            for child in el:
                if child.tag == "tag":
                    tags[child.attrib["k"]] = child.attrib["v"]
                elif child.tag == "nd":
                    refs.append(int(child.attrib["ref"]))
                elif child.tag == "member":
                    members.append(
                        {
                            "type": child.attrib["type"],
                            "ref": int(child.attrib["ref"]),
                            "role": child.attrib.get("role", ""),
                        }
                    )
            lat_s, lon_s = a.get("lat"), a.get("lon")
            rows.append(
                {
                    "file": fname,
                    "pos": pos,
                    "action": action,
                    "kind": el.tag,
                    "id": int(a["id"]),
                    "version": int(a.get("version", 0)),
                    "ts_s": a.get("timestamp"),
                    "changeset": int(a.get("changeset", 0)),
                    "uid": int(a.get("uid", 0)),
                    "user": a.get("user", ""),
                    "lat_s": lat_s,
                    "lon_s": lon_s,
                    "lat": float(lat_s) if lat_s is not None else None,
                    "lon": float(lon_s) if lon_s is not None else None,
                    "tags": tags,
                    "refs": refs if el.tag == "way" else None,
                    "members": members if el.tag == "relation" else None,
                }
            )
            pos += 1
    return pd.DataFrame(rows, columns=_COLS)


def parse_file_batches(batches):
    """mapInPandas kernel shared by the batch and streaming scans:
    (path, content) rows → parsed element rows."""
    for pdf in batches:
        for p, data in zip(pdf["path"], pdf["content"]):
            out = parse_osc_bytes(bytes(data), os.path.basename(p))
            if len(out):
                yield out


def read_osc(spark, path: str):
    """Distributed osmChange scan: one task per diff file (binaryFile
    splits), gunzip + XML parse inside the task, rows tagged with
    (file, pos) so callers can replay apply order across a backlog."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse_file_batches, OSC_SCHEMA)
