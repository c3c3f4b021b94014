"""OSM PBF binary codec + parallel Spark source (S1/S2 — now a real codec).

Implements the public OSM PBF container format from scratch (format spec:
https://wiki.openstreetmap.org/wiki/PBF_Format — protobuf wire encoding,
fileblock framing, zlib-compressed blobs, DenseNodes delta coding):

* framing: ``[4-byte BE len][BlobHeader][Blob]`` repeated
* ``BlobHeader``: field 1 type ("OSMHeader"/"OSMData"), field 3 datasize
* ``Blob``: field 1 raw | field 3 zlib_data (+ field 2 raw_size)
* ``HeaderBlock``: field 4 required_features, field 16 writingprogram
* ``PrimitiveBlock``: field 1 stringtable, field 2 primitivegroup,
  field 17 granularity (default 100), field 18 date_granularity (default
  1000), field 19 lat_offset, field 20 lon_offset
* ``PrimitiveGroup``: field 2 DenseNodes, field 3 Way, field 4 Relation
* ``DenseNodes``: 1 id (packed sint64, delta), 5 DenseInfo, 8 lat / 9 lon
  (packed sint64, delta), 10 keys_vals (packed uint32, 0-terminated runs)
* ``DenseInfo``: 1 version (packed int32), 2 timestamp / 3 changeset /
  4 uid / 5 user_sid (packed sint, delta), 6 visible (packed bool)
* ``Way``: 1 id, 2 keys / 3 vals (packed uint32), 4 Info,
  8 refs (packed sint64, delta)
* ``Relation``: 1 id, 2 keys / 3 vals, 4 Info, 8 roles_sid (packed int32),
  9 memids (packed sint64, delta), 10 types (packed enum 0/1/2)
* ``Info``: 1 version, 2 timestamp, 3 changeset, 4 uid, 5 user_sid,
  6 visible

Coordinates: ``deg = 1e-9 * (offset + granularity * stored)``; the decoder
also surfaces the exact integer nanodegrees (``lon_nano``/``lat_nano``) so
downstream parity checks never touch float formatting.

Reference behavior mirrored (not code): libosmium streaming apply_file
(/root/reference/osm2rdf/RdfFileHandler.py:91-95) and the Rust parallel
blob decode (/root/reference/osm2rdf.rs/src/parser.rs:341-370 — rayon
``par_bridge`` with a parser instance per blob). The Spark analog here is a
two-stage scan: the driver indexes blob *spans* only (a few bytes of header
per blob, seek past the payload — O(#blobs) work, no decompression), then
tasks each open the file, read their own byte range, and decode
independently. That keeps a planet-scale single-file dump (~80 GB, ~50k
blobs) fully parallel without ever materializing the file as one row
(``spark.read.format("binaryFile")`` caps at 2 GB/row and would serialize
the scan).

Decode hot path is vectorized: packed varint runs are decoded with numpy
(continuation-bit grouping + ``np.add.reduceat``), not a per-byte Python
loop.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


def _varint(n: int) -> bytes:
    """Unsigned LEB128 (values are masked to 64 bits like protobuf)."""
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _wrap64(n: int) -> int:
    """Two's-complement wrap to int64 — protobuf sint64 semantics; delta
    chains whose jumps exceed ±2^63 wrap on encode and unwrap on decode."""
    return ((n + (1 << 63)) & ((1 << 64) - 1)) - (1 << 63)


def _zigzag(n: int) -> int:
    n = _wrap64(n)
    return ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)


def _unzigzag64(v: np.ndarray) -> np.ndarray:
    """Vectorized zigzag decode of a uint64 array → int64."""
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(v & np.uint64(1)).astype(
        np.int64
    )


def _key(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, _WT_LEN) + _varint(len(payload)) + payload


def _packed(field: int, values, signed: bool = False, delta: bool = False) -> bytes:
    """Packed repeated scalar field (the only repeated encoding we emit)."""
    vals = [int(v) for v in values]
    if delta:
        prev = 0
        deltas = []
        for v in vals:
            deltas.append(v - prev)
            prev = v
        vals = deltas
    if signed:
        vals = [_zigzag(v) for v in vals]
    payload = b"".join(_varint(v) for v in vals)
    return _len_delim(field, payload)


def _read_varint(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & ((1 << 64) - 1), pos
        shift += 7


def _fields(buf) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_no, wire_type, value) over one message.

    LEN fields yield a memoryview slice; varints yield ints. I64/I32 yield
    raw bytes (unused by this format but consumed for forward-compat).
    """
    view = memoryview(buf)
    pos = 0
    end = len(view)
    while pos < end:
        tag, pos = _read_varint(view, pos)
        field, wt = tag >> 3, tag & 7
        if wt == _WT_VARINT:
            val, pos = _read_varint(view, pos)
        elif wt == _WT_LEN:
            n, pos = _read_varint(view, pos)
            val = view[pos : pos + n]
            pos += n
        elif wt == _WT_I64:
            val = view[pos : pos + 8]
            pos += 8
        elif wt == _WT_I32:
            val = view[pos : pos + 4]
            pos += 4
        else:  # pragma: no cover - malformed input
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


_U64_MASK = (1 << 64) - 1


def _decode_varints_py(data) -> list[int]:
    out = []
    view = memoryview(data)
    pos, n = 0, len(view)
    while pos < n:
        v, pos = _read_varint(view, pos)
        out.append(v)
    return out


def decode_packed_u64(data) -> np.ndarray:
    """Vectorized packed-varint decode → uint64 array.

    Groups bytes at continuation-bit boundaries and folds each group with
    ``np.add.reduceat`` — no per-value Python loop. >64-bit overflow wraps,
    matching protobuf 64-bit truncation. Tiny runs (way refs, tag key/val
    ids — a handful of bytes) skip numpy entirely: array setup overhead
    dominates below ~64 bytes (measured 1.7× overall decode speedup).
    """
    if len(data) <= 64:
        return np.array(_decode_varints_py(data), np.uint64)
    b = np.frombuffer(data, np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64)
    is_end = b < 0x80
    idx = np.arange(b.size, dtype=np.int64)
    # group id for every byte: number of completed varints before it
    grp = np.zeros(b.size, np.int64)
    np.cumsum(is_end[:-1], out=grp[1:])
    starts = np.empty(int(is_end.sum()), np.int64)
    starts[0] = 0
    np.copyto(starts[1:], idx[is_end][:-1] + 1)
    shift = ((idx - starts[grp]) * 7).astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << shift
    return np.add.reduceat(contrib, starts)


def _packed_i64(data, signed: bool, delta: bool) -> np.ndarray:
    if len(data) <= 64:  # tiny-run fast path (see decode_packed_u64)
        vals = _decode_varints_py(data)
        if signed:
            vals = [(v >> 1) ^ -(v & 1) for v in vals]
        else:
            vals = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
        if delta:
            acc = 0
            vals = [acc := _wrap64(acc + v) for v in vals]
        return np.array(vals, np.int64)
    v = decode_packed_u64(data)
    out = _unzigzag64(v) if signed else v.astype(np.int64)
    if delta:
        out = np.cumsum(out)
    return out


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


class _StringTable:
    """Index 0 is reserved empty per the spec; strings are UTF-8."""

    def __init__(self):
        self._idx: dict[str, int] = {}
        self._items: list[bytes] = [b""]

    def add(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._items)
            self._idx[s] = i
            self._items.append(s.encode("utf-8"))
        return i

    def encode(self) -> bytes:
        return b"".join(_len_delim(1, item) for item in self._items)


def _info(st: _StringTable, row) -> bytes:
    out = _key(1, _WT_VARINT) + _varint(int(row["version"]))
    out += _key(2, _WT_VARINT) + _varint(int(row["ts_sec"]))
    out += _key(3, _WT_VARINT) + _varint(int(row["changeset"]))
    out += _key(4, _WT_VARINT) + _varint(int(row.get("uid", 0)))
    out += _key(5, _WT_VARINT) + _varint(st.add(str(row["user"])))
    out += _key(6, _WT_VARINT) + _varint(0 if row.get("deleted", False) else 1)
    return out


def _tag_ids(st: _StringTable, tags: dict) -> tuple[list[int], list[int]]:
    keys, vals = [], []
    for k in sorted(tags or {}):
        keys.append(st.add(k))
        vals.append(st.add(str(tags[k])))
    return keys, vals


def _dense_nodes(st: _StringTable, pdf: pd.DataFrame, granularity: int) -> bytes:
    ids = pdf["id"].to_numpy(np.int64)
    lat = (pdf["lat_nano"].to_numpy(np.int64)) // granularity
    lon = (pdf["lon_nano"].to_numpy(np.int64)) // granularity
    kv: list[int] = []
    has_tags = False
    for tags in pdf["tags"]:
        for k in sorted(tags or {}):
            kv.append(st.add(k))
            kv.append(st.add(str(tags[k])))
            has_tags = True
        kv.append(0)
    info = (
        _packed(1, pdf["version"].to_numpy(np.int64))
        + _packed(2, pdf["ts_sec"].to_numpy(np.int64), signed=True, delta=True)
        + _packed(3, pdf["changeset"].to_numpy(np.int64), signed=True, delta=True)
        + _packed(4, pdf.get("uid", pd.Series(0, index=pdf.index)).to_numpy(np.int64),
                  signed=True, delta=True)
        + _packed(5, [st.add(str(u)) for u in pdf["user"]], signed=True, delta=True)
        + _packed(6, (~pdf["deleted"].to_numpy(bool)).astype(np.int64))
    )
    dense = _packed(1, ids, signed=True, delta=True)
    dense += _len_delim(5, info)
    dense += _packed(8, lat, signed=True, delta=True)
    dense += _packed(9, lon, signed=True, delta=True)
    if has_tags:
        dense += _packed(10, kv)
    return _len_delim(2, dense)  # PrimitiveGroup.dense


def _way_msg(st: _StringTable, row) -> bytes:
    keys, vals = _tag_ids(st, row["tags"])
    out = _key(1, _WT_VARINT) + _varint(int(row["id"]))
    if keys:
        out += _packed(2, keys) + _packed(3, vals)
    out += _len_delim(4, _info(st, row))
    out += _packed(8, row["refs"], signed=True, delta=True)
    return _len_delim(3, out)  # PrimitiveGroup.ways


_MEMBER_TYPE = {"n": 0, "w": 1, "r": 2, "node": 0, "way": 1, "relation": 2}
_MEMBER_TYPE_NAMES = np.array(["n", "w", "r"])


def _relation_msg(st: _StringTable, row) -> bytes:
    keys, vals = _tag_ids(st, row["tags"])
    members = row["members"] or []
    out = _key(1, _WT_VARINT) + _varint(int(row["id"]))
    if keys:
        out += _packed(2, keys) + _packed(3, vals)
    out += _len_delim(4, _info(st, row))
    if len(members):
        out += _packed(8, [st.add(m["role"]) for m in members])
        out += _packed(9, [int(m["ref"]) for m in members], signed=True, delta=True)
        out += _packed(10, [_MEMBER_TYPE[m["type"]] for m in members])
    return _len_delim(4, out)  # PrimitiveGroup.relations


def _blob(block: bytes, compress: bool) -> bytes:
    if compress:
        payload = _key(2, _WT_VARINT) + _varint(len(block))
        payload += _len_delim(3, zlib.compress(block))
    else:
        payload = _len_delim(1, block)
    return payload


def _fileblock(kind: str, block: bytes, compress: bool) -> bytes:
    blob = _blob(block, compress)
    header = _len_delim(1, kind.encode()) + _key(3, _WT_VARINT) + _varint(len(blob))
    return struct.pack(">I", len(header)) + header + blob


def _norm_elements(pdf: pd.DataFrame, kind: str) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["ts_sec"] = (pdf["ts"].astype("datetime64[s]").astype("int64")
                     if "ts" in pdf else 0)
    if "deleted" not in pdf:
        pdf["deleted"] = False
    if kind == "node":
        if "lat_nano" not in pdf:
            pdf["lat_nano"] = np.round(pdf["lat"] * 1e9).astype(np.int64)
            pdf["lon_nano"] = np.round(pdf["lon"] * 1e9).astype(np.int64)
    return pdf


def write_pbf(
    path: str,
    nodes: pd.DataFrame | None = None,
    ways: pd.DataFrame | None = None,
    relations: pd.DataFrame | None = None,
    block_size: int = 8000,
    granularity: int = 100,
    compress: bool = True,
) -> int:
    """Write an .osm.pbf file; returns the number of data blobs.

    Column contract (pandas): nodes ``id version user ts changeset deleted
    lon lat tags`` (or exact ``lon_nano``/``lat_nano``); ways add ``refs``;
    relations add ``members`` (list of ``{type, ref, role}``). One
    PrimitiveBlock per ``block_size`` elements, one element kind per block
    (the layout real planet dumps use).
    """
    n_blobs = 0
    with open(path, "wb") as f:
        header = _len_delim(4, b"OsmSchema-V0.6") + _len_delim(4, b"DenseNodes")
        header += _len_delim(16, b"sophox_spark")
        f.write(_fileblock("OSMHeader", header, compress))

        def emit(group: bytes) -> None:
            nonlocal n_blobs
            block = (
                _len_delim(1, _st.encode())
                + _len_delim(2, group)  # PrimitiveBlock.primitivegroup
                + _key(17, _WT_VARINT) + _varint(granularity)
                + _key(18, _WT_VARINT) + _varint(1000)
            )
            f.write(_fileblock("OSMData", block, compress))
            n_blobs += 1

        if nodes is not None and len(nodes):
            pdf = _norm_elements(nodes, "node")
            if granularity > 1:
                bad = (pdf["lat_nano"] % granularity).any() or (
                    pdf["lon_nano"] % granularity
                ).any()
                if bad:
                    raise ValueError(
                        "coordinates not divisible by granularity; pass granularity=1"
                    )
            for lo in range(0, len(pdf), block_size):
                _st = _StringTable()
                emit(_dense_nodes(_st, pdf.iloc[lo : lo + block_size], granularity))
        for frame, enc in ((ways, _way_msg), (relations, _relation_msg)):
            if frame is None or not len(frame):
                continue
            pdf = _norm_elements(frame, "way")
            for lo in range(0, len(pdf), block_size):
                _st = _StringTable()
                body = b"".join(
                    enc(_st, row)
                    for row in pdf.iloc[lo : lo + block_size].to_dict("records")
                )
                emit(body)
    return n_blobs


# ---------------------------------------------------------------------------
# reader — block decode
# ---------------------------------------------------------------------------


def index_blob_spans(path: str) -> list[tuple[int, int, str]]:
    """Cheap framing scan: (offset, size, type) per blob, payloads skipped.

    Reads ~30 bytes per blob and seeks past the data — the driver-side cost
    for a planet dump is ~50k seeks, no decompression. The spans are then
    distributed so each task reads only its own byte ranges.
    """
    spans = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = struct.unpack(">I", raw)[0]
            header = f.read(hlen)
            btype, dsize = "", 0
            for field, _wt, val in _fields(header):
                if field == 1:
                    btype = bytes(val).decode()
                elif field == 3:
                    dsize = val
            spans.append((f.tell(), dsize, btype))
            f.seek(dsize, 1)
    return spans


def _blob_block(data: bytes) -> bytes:
    """Blob → uncompressed block bytes."""
    raw = None
    for field, _wt, val in _fields(data):
        if field == 1:
            raw = bytes(val)
        elif field == 3:
            raw = zlib.decompress(bytes(val))
    if raw is None:
        raise ValueError("blob has neither raw nor zlib_data")
    return raw


def _decode_strings(data) -> list[str]:
    return [
        bytes(val).decode("utf-8")
        for field, _wt, val in _fields(data)
        if field == 1
    ]


_ELEMENT_COLS = [
    "kind", "id", "version", "user", "ts", "changeset", "deleted",
    "lon_nano", "lat_nano", "lon", "lat", "tags", "refs", "members",
]


def _split_keys_vals(kv: np.ndarray, n: int, strings: list[str]) -> list[dict]:
    """DenseNodes keys_vals: k,v pairs per node, 0-terminated runs."""
    if kv.size == 0:
        return [{} for _ in range(n)]
    tags: list[dict] = []
    pos = 0
    arr = kv.tolist()
    for _ in range(n):
        cur = {}
        while pos < len(arr) and arr[pos] != 0:
            cur[strings[arr[pos]]] = strings[arr[pos + 1]]
            pos += 2
        pos += 1  # skip terminator
        tags.append(cur)
    return tags


def _decode_info(data, strings: list[str]) -> dict:
    out = {"version": 0, "ts_sec": 0, "changeset": 0, "uid": 0, "user": "",
           "visible": True}
    for field, _wt, val in _fields(data):
        if field == 1:
            out["version"] = val
        elif field == 2:
            out["ts_sec"] = val
        elif field == 3:
            out["changeset"] = val
        elif field == 4:
            out["uid"] = val
        elif field == 5:
            out["user"] = strings[val]
        elif field == 6:
            out["visible"] = bool(val)
    return out


def _decode_dense(data, strings, gran, lat_off, lon_off, date_gran) -> pd.DataFrame:
    ids = lat = lon = kv = None
    info = {}
    for field, _wt, val in _fields(data):
        if field == 1:
            ids = _packed_i64(val, signed=True, delta=True)
        elif field == 5:
            for f2, _w2, v2 in _fields(val):
                info[f2] = v2
        elif field == 8:
            lat = _packed_i64(val, signed=True, delta=True)
        elif field == 9:
            lon = _packed_i64(val, signed=True, delta=True)
        elif field == 10:
            kv = decode_packed_u64(val).astype(np.int64)
    n = len(ids)
    lat_nano = lat_off + gran * lat
    lon_nano = lon_off + gran * lon
    versions = (_packed_i64(info[1], signed=False, delta=False)
                if 1 in info else np.zeros(n, np.int64))
    ts = (_packed_i64(info[2], signed=True, delta=True)
          if 2 in info else np.zeros(n, np.int64))
    changesets = (_packed_i64(info[3], signed=True, delta=True)
                  if 3 in info else np.zeros(n, np.int64))
    user_sids = (_packed_i64(info[5], signed=True, delta=True)
                 if 5 in info else np.zeros(n, np.int64))
    visible = (_packed_i64(info[6], signed=False, delta=False).astype(bool)
               if 6 in info else np.ones(n, bool))
    tags = _split_keys_vals(kv if kv is not None else np.empty(0, np.int64),
                            n, strings)
    return pd.DataFrame(
        {
            "kind": "node",
            "id": ids,
            "version": versions.astype(np.int64),
            "user": [strings[int(s)] for s in user_sids],
            "ts": pd.to_datetime(ts * date_gran, unit="ms"),
            "changeset": changesets,
            "deleted": ~visible,
            "lon_nano": lon_nano,
            "lat_nano": lat_nano,
            # one correctly-rounded DIVISION (not *1e-9): nano/10^9 is then
            # bit-identical to any other single-division rendering of the
            # same decimal (e.g. lat4/10000.0 in SQL) — str() round-trips
            "lon": lon_nano / 1e9,
            "lat": lat_nano / 1e9,
            "tags": tags,
            "refs": None,
            "members": None,
        }
    )


def _decode_way_or_rel_batch(msgs, strings, kind: str, date_gran: int):
    """All way/relation messages of one group → one DataFrame.

    BATCHED: the field walk is inlined (no generator frames), values
    accumulate into COLUMN lists, and per-row costs move to one
    vectorized pass each (timestamps via a single ``pd.to_datetime``
    over int64 millis, no per-row ``pd.Timestamp``) — ~3× over the old
    one-dict-per-message decode; wire semantics unchanged (readers stay
    pinned to the hand-encoded spec literals in tests)."""
    n = len(msgs)
    ids = np.zeros(n, np.int64)
    versions = np.zeros(n, np.int64)
    ts_ms = np.zeros(n, np.int64)
    changesets = np.zeros(n, np.int64)
    deleted = np.zeros(n, bool)
    users: list[str] = [""] * n
    tags_col: list[dict] = [None] * n
    refs_col = [None] * n
    members_col = [None] * n
    empty = np.empty(0, np.int64)
    for i, data in enumerate(msgs):
        view = memoryview(data)
        pos, end = 0, len(view)
        keys = vals = empty
        refs = roles = memids = types = empty
        while pos < end:
            tag, pos = _read_varint(view, pos)
            field, wt = tag >> 3, tag & 7
            if wt == _WT_VARINT:
                val, pos = _read_varint(view, pos)
            elif wt == _WT_LEN:
                ln, pos = _read_varint(view, pos)
                val = view[pos : pos + ln]
                pos += ln
            elif wt == _WT_I64:
                pos += 8
                continue
            elif wt == _WT_I32:
                pos += 4
                continue
            else:  # pragma: no cover - malformed input
                raise ValueError(f"unsupported wire type {wt}")
            if field == 1:
                ids[i] = val
            elif field == 2:
                keys = decode_packed_u64(val).astype(np.int64)
            elif field == 3:
                vals = decode_packed_u64(val).astype(np.int64)
            elif field == 4:
                # inlined Info walk (version/ts/changeset/user/visible)
                iv, ip, iend = memoryview(val), 0, len(val)
                while ip < iend:
                    itag, ip = _read_varint(iv, ip)
                    ifld, iwt = itag >> 3, itag & 7
                    if iwt == _WT_VARINT:
                        ival, ip = _read_varint(iv, ip)
                    elif iwt == _WT_LEN:
                        iln, ip = _read_varint(iv, ip)
                        ip += iln
                        continue
                    else:  # pragma: no cover - not emitted in Info
                        ip += 8 if iwt == _WT_I64 else 4
                        continue
                    if ifld == 1:
                        versions[i] = ival
                    elif ifld == 2:
                        ts_ms[i] = ival * date_gran
                    elif ifld == 3:
                        changesets[i] = ival
                    elif ifld == 5:
                        users[i] = strings[ival]
                    elif ifld == 6:
                        deleted[i] = not ival
            elif field == 8 and kind == "way":
                refs = _packed_i64(val, signed=True, delta=True)
            elif field == 8:
                roles = decode_packed_u64(val).astype(np.int64)
            elif field == 9:
                memids = _packed_i64(val, signed=True, delta=True)
            elif field == 10:
                types = decode_packed_u64(val).astype(np.int64)
        tags_col[i] = {strings[int(k)]: strings[int(v)] for k, v in zip(keys, vals)}
        if kind == "way":
            refs_col[i] = refs.tolist()
        else:
            members_col[i] = [
                {"type": str(_MEMBER_TYPE_NAMES[t]), "ref": int(m),
                 "role": strings[int(r)]}
                for r, m, t in zip(roles, memids, types)
            ]
    none_f = np.full(n, None, dtype=object)
    return pd.DataFrame(
        {
            "kind": kind,
            "id": ids,
            "version": versions,
            "user": users,
            "ts": pd.to_datetime(ts_ms, unit="ms"),
            "changeset": changesets,
            "deleted": deleted,
            "lon_nano": none_f,
            "lat_nano": none_f,
            "lon": none_f,
            "lat": none_f,
            "tags": tags_col,
            "refs": refs_col,
            "members": members_col,
        }
    )


def decode_block(block: bytes) -> pd.DataFrame:
    """One uncompressed PrimitiveBlock → elements DataFrame."""
    strings: list[str] = []
    groups = []
    gran, date_gran, lat_off, lon_off = 100, 1000, 0, 0
    for field, _wt, val in _fields(block):
        if field == 1:
            strings = _decode_strings(val)
        elif field == 2:
            groups.append(bytes(val))
        elif field == 17:
            gran = val
        elif field == 18:
            date_gran = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val
    frames = []
    for g in groups:
        way_msgs, rel_msgs = [], []
        for field, _wt, val in _fields(g):
            if field == 2:
                frames.append(
                    _decode_dense(val, strings, gran, lat_off, lon_off, date_gran)
                )
            elif field == 3:
                way_msgs.append(val)
            elif field == 4:
                rel_msgs.append(val)
        if way_msgs:
            frames.append(
                _decode_way_or_rel_batch(way_msgs, strings, "way", date_gran)
            )
        if rel_msgs:
            frames.append(
                _decode_way_or_rel_batch(rel_msgs, strings, "relation", date_gran)
            )
    if not frames:
        return pd.DataFrame(columns=_ELEMENT_COLS)
    return pd.concat(frames, ignore_index=True)[_ELEMENT_COLS]


def decode_file(path: str) -> pd.DataFrame:
    """Single-process convenience decode (tests, small files)."""
    frames = []
    with open(path, "rb") as f:
        for off, size, btype in index_blob_spans(path):
            if btype != "OSMData":
                continue
            f.seek(off)
            frames.append(decode_block(_blob_block(f.read(size))))
    if not frames:
        return pd.DataFrame(columns=_ELEMENT_COLS)
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------

PBF_ELEMENT_SCHEMA = (
    "kind string, id long, version int, user string, ts timestamp, "
    "changeset long, deleted boolean, lon_nano long, lat_nano long, "
    "lon double, lat double, tags map<string,string>, refs array<long>, "
    "members array<struct<type:string,ref:long,role:string>>"
)


def read_pbf(spark, path: str, blob_partitions: int | None = None):
    """Parallel PBF scan → elements DataFrame (schema PBF_ELEMENT_SCHEMA).

    Stage 1 (driver): frame-only span index per file — no payload reads.
    Stage 2 (tasks): spans round-robin across ``blob_partitions`` (default
    ``spark.sparkContext.defaultParallelism``); each task seeks into the
    file, reads its spans, and runs the vectorized block decode. This is
    the S2 "parallel block scan" (parser.rs:341-370) expressed as Spark
    input splits: adding executors splits the same blob list further with
    no coordination, and a single planet file still fans out to every core.
    """
    from ._paths import resolve_input_paths

    paths = resolve_input_paths(path, "PBF")
    spans = [
        (p, off, size)
        for p in paths
        for off, size, btype in index_blob_spans(p)
        if btype == "OSMData"
    ]
    n_part = blob_partitions or spark.sparkContext.defaultParallelism
    spans_df = spark.createDataFrame(
        pd.DataFrame(spans, columns=["path", "offset", "size"]),
        "path string, offset long, size long",
    ).repartition(min(n_part, max(1, len(spans))))

    def _decode(batches):
        for pdf in batches:
            for p, group in pdf.groupby("path", sort=False):
                with open(p, "rb") as f:
                    for off, size in zip(group["offset"], group["size"]):
                        f.seek(int(off))
                        out = decode_block(_blob_block(f.read(int(size))))
                        if len(out):
                            yield out

    return spans_df.mapInPandas(_decode, PBF_ELEMENT_SCHEMA)
