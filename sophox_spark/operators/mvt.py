"""Mapbox Vector Tile (MVT 2.1) wire-format codec + tile sink.

The reference serves map tiles (server.js /tiles endpoints); this is
the binary half of that surface for the Spark engine: encode the
per-(tile, polygon) quantized rings of
``tiles.vector_tile_features`` into REAL ``.mvt`` protobuf tiles any
MVT renderer consumes, and decode them back (own parser — enables the
encode→decode roundtrip oracle).

Wire format per the PUBLIC Mapbox Vector Tile spec 2.1 + protobuf
encoding rules:

* ``Tile``: repeated ``Layer`` (field 3, length-delimited)
* ``Layer``: version (15, varint) name (1, string) features (2,
  repeated message) keys (3) values (4) extent (5, varint)
* ``Feature``: id (1, varint) tags (2, packed) type (3, enum —
  POLYGON=3) geometry (4, packed uint32)
* geometry commands: ``(count << 3) | cmd_id`` with MoveTo=1,
  LineTo=2, ClosePath=7; coordinate deltas zigzag-encoded, cursor
  carried across rings within a feature

Subset notes (documented): one layer per tile, empty tag tables,
polygon features only, rings emitted in input order (winding left to
the producer, like the quantizer upstream). ClosePath implies the ring
closure, so a closed input ring drops its duplicate last point on
encode and decode re-closes it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

POLYGON = 3


class MvtFormatError(ValueError):
    """Malformed or out-of-subset MVT input."""


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _ld(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _encode_geometry(rings) -> bytes:
    """Polygon rings (Nx2 int arrays, open or closed) → packed command
    varints. The cursor carries across rings (spec 4.3.5.3)."""
    cx = cy = 0
    out = bytearray()
    for ring in rings:
        r = np.asarray(ring, np.int64).reshape(-1, 2)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]  # ClosePath implies the closing segment
        if len(r) < 3:
            raise MvtFormatError("polygon ring needs >= 3 distinct points")
        out += _varint((1 << 3) | 1)  # MoveTo, count 1
        out += _varint(_zigzag(int(r[0, 0]) - cx))
        out += _varint(_zigzag(int(r[0, 1]) - cy))
        cx, cy = int(r[0, 0]), int(r[0, 1])
        n = len(r) - 1
        out += _varint((n << 3) | 2)  # LineTo, count n
        for x, y in r[1:]:
            out += _varint(_zigzag(int(x) - cx))
            out += _varint(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        out += _varint((1 << 3) | 7)  # ClosePath
    return bytes(out)


def encode_tile(
    features, layer_name: str = "layer", extent: int = 4096,
) -> bytes:
    """``features``: iterable of (feature_id, rings) → one-layer MVT
    tile bytes."""
    body = bytearray()
    body += _field(15, 0) + _varint(2)  # version
    body += _ld(1, layer_name.encode("utf-8"))
    for fid, rings in features:
        feat = bytearray()
        feat += _field(1, 0) + _varint(int(fid))
        feat += _field(3, 0) + _varint(POLYGON)
        feat += _ld(4, _encode_geometry(rings))
        body += _ld(2, bytes(feat))
    body += _field(5, 0) + _varint(extent)
    return bytes(_ld(3, bytes(body)))


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if i >= len(data):
            raise MvtFormatError("truncated varint")
        b = data[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7
        if shift > 63:
            raise MvtFormatError("varint too long")


def _walk_fields(data: bytes):
    i = 0
    while i < len(data):
        key, i = _read_varint(data, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(data, i)
            yield num, v
        elif wire == 2:
            ln, i = _read_varint(data, i)
            if i + ln > len(data):
                raise MvtFormatError("truncated length-delimited field")
            yield num, data[i : i + ln]
            i += ln
        elif wire == 5:
            if i + 4 > len(data):
                raise MvtFormatError("truncated fixed32 field")
            yield num, data[i : i + 4]
            i += 4
        elif wire == 1:
            if i + 8 > len(data):
                raise MvtFormatError("truncated fixed64 field")
            yield num, data[i : i + 8]
            i += 8
        else:
            raise MvtFormatError(f"unsupported wire type {wire}")


def _decode_geometry(data: bytes) -> list[np.ndarray]:
    """Packed commands → rings as Nx2 arrays of ABSOLUTE coordinates
    (closing point not repeated)."""
    rings: list[np.ndarray] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(data):
        cmd, i = _read_varint(data, i)
        cid, count = cmd & 7, cmd >> 3
        if cid in (1, 2):  # MoveTo / LineTo
            for _ in range(count):
                dx, i = _read_varint(data, i)
                dy, i = _read_varint(data, i)
                cx += _unzigzag(dx)
                cy += _unzigzag(dy)
                if cid == 1 and cur:
                    rings.append(np.array(cur, np.int64))
                    cur = []
                cur.append((cx, cy))
        elif cid == 7:  # ClosePath
            if not cur:
                raise MvtFormatError("ClosePath with no open ring")
            rings.append(np.array(cur, np.int64))
            cur = []
        else:
            raise MvtFormatError(f"unknown geometry command {cid}")
    if cur:
        rings.append(np.array(cur, np.int64))
    return rings


def decode_tile(data: bytes) -> list[dict]:
    """MVT bytes → layers: {name, version, extent, features:
    [(id, type, rings)]}."""
    layers = []
    for num, val in _walk_fields(data):
        if num != 3:
            continue
        layer = {"name": "", "version": 0, "extent": 4096, "features": []}
        for lnum, lval in _walk_fields(val):
            if lnum == 15:
                layer["version"] = lval
            elif lnum == 1:
                layer["name"] = lval.decode("utf-8")
            elif lnum == 5:
                layer["extent"] = lval
            elif lnum == 2:
                fid = 0
                ftype = 0
                rings: list[np.ndarray] = []
                for fnum, fval in _walk_fields(lval):
                    if fnum == 1:
                        fid = fval
                    elif fnum == 3:
                        ftype = fval
                    elif fnum == 4:
                        rings = _decode_geometry(fval)
                layer["features"].append((fid, ftype, rings))
        layers.append(layer)
    return layers


def tile_blobs(
    features_df: DataFrame,
    id_col: str = "polygon_id",
    layer_name: str = "layer",
    extent: int = 4096,
) -> DataFrame:
    """(tile, polygon_id, ring_idx, coords_q) feature rows → one REAL
    ``.mvt`` blob per tile: groupBy(tile) + applyInPandas — each tile
    serializes independently (the natural unit of a tile server), no
    driver involvement."""

    def build(key, pdf):
        feats = []
        for pid, grp in pdf.sort_values([id_col, "ring_idx"]).groupby(
            id_col, sort=True
        ):
            rings = [
                np.asarray(c, np.int64).reshape(-1, 2)
                for c in grp["coords_q"]
            ]
            feats.append((int(pid), rings))
        blob = encode_tile(feats, layer_name, extent)
        return pd.DataFrame(
            {"tile": [key[0]], "mvt": [blob],
             "n_features": [len(feats)], "n_bytes": [len(blob)]}
        )

    return features_df.groupBy("tile").applyInPandas(
        build, "tile long, mvt binary, n_features long, n_bytes long"
    )


def roundtrip_rings(
    blobs_df: DataFrame, id_col: str = "polygon_id"
) -> DataFrame:
    """Decode ``tile_blobs`` output back to per-ring quantized
    coordinate rows (ring re-closed, matching the
    ``vector_tile_features`` shape) — the encode→decode oracle path:
    any command/zigzag/cursor bug breaks the coordinate hash."""

    def gen(batches):
        for pdf in batches:
            rows = {"tile": [], id_col: [], "ring_idx": [],
                    "coords_q": []}
            for tile, blob in zip(pdf["tile"], pdf["mvt"]):
                for layer in decode_tile(bytes(blob)):
                    for fid, ftype, rings in layer["features"]:
                        if ftype != POLYGON:
                            raise MvtFormatError("non-polygon feature")
                        for ri, r in enumerate(rings):
                            closed = np.vstack([r, r[:1]])
                            rows["tile"].append(tile)
                            rows[id_col].append(fid)
                            rows["ring_idx"].append(ri)
                            rows["coords_q"].append(
                                [int(v) for xy in closed for v in xy]
                            )
            yield pd.DataFrame(rows)

    return blobs_df.mapInPandas(
        gen,
        f"tile long, {id_col} long, ring_idx int, coords_q array<long>",
    )
