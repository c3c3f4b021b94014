"""WARC (ISO 28500) web-archive source — the container Common-Crawl-style
pages ship in, bridging raw crawl archives to the input_hint ``pages``
table ``(url, warc_ts, html, text, lang)``.

Format implemented from the public spec / Common-Crawl conventions:

* a file is a sequence of records; in ``.warc.gz`` each record is its OWN
  gzip member (the CC layout), so any record is independently seekable
  given (offset, length) — which CC publishes in its CDX index
* record = ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + exactly
  ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``
* ``response`` records wrap an HTTP/1.1 message
  (``Content-Type: application/http; msgtype=response``): status line +
  response headers + ``\\r\\n\\r\\n`` + body (the html bytes)

Spark shape mirrors the PBF source: the scalable path distributes
(offset, length) spans from a sidecar ``.idx`` (JSON-lines CDX analog,
written alongside by :func:`write_warc`) so each task gunzips and parses
only its own members — no 2 GB binaryFile row cap, no serial scan. Without
an index it falls back to one task per file, walking gzip members via
``decompressobj().unused_data`` (archives are many ~1 GB files, so
file-level parallelism is the natural CC unit there).

Writer is byte-deterministic (gzip mtime=0, record ids derived from the
url hash) so fixtures hash identically across runs.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import zlib

import pandas as pd

WARC_SCHEMA = (
    "file string, offset long, record_type string, url string, ts_s string, "
    "http_status int, mime string, html binary"
)

_COLS = ["file", "offset", "record_type", "url", "ts_s", "http_status",
         "mime", "html"]


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        b"WARC/1.0\r\n"
        + head.encode("utf-8")
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def _response_record(url: str, ts_s: str, html: bytes, status: int,
                     mime: str) -> bytes:
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html
    rid = hashlib.md5(url.encode()).hexdigest()
    return _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Date", ts_s),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http,
    )


def write_warc(path: str, pages: pd.DataFrame, compress: bool | None = None,
               with_index: bool = True) -> list[dict]:
    """Write response records (columns ``url ts_s html`` (+ optional
    ``status``/``mime``)); one gzip member per record (CC layout). Returns
    the span index [{offset, length, url, ts_s}], also written to
    ``path + '.idx'`` as JSON lines — the CDX-index analog the seekable
    read path consumes."""
    if compress is None:
        compress = path.endswith(".gz")
    spans = []
    with open(path, "wb") as f:
        info = _record(
            [("WARC-Type", "warcinfo"),
             ("WARC-Record-ID", "<urn:uuid:warcinfo>"),
             ("Content-Type", "application/warc-fields")],
            b"software: sophox_spark\r\n",
        )
        f.write(gzip.compress(info, mtime=0) if compress else info)
        status = (pages["status"] if "status" in pages
                  else pd.Series(200, index=pages.index))
        mime = (pages["mime"] if "mime" in pages
                else pd.Series("text/html", index=pages.index))
        for url, ts_s, html, st, mi in zip(
            pages["url"], pages["ts_s"], pages["html"], status, mime
        ):
            rec = _response_record(url, ts_s, bytes(html), int(st), mi)
            if compress:
                rec = gzip.compress(rec, mtime=0)
            spans.append({"offset": f.tell(), "length": len(rec),
                          "url": url, "ts_s": ts_s})
            f.write(rec)
    if with_index:
        with open(path + ".idx", "w") as fi:
            for s in spans:
                fi.write(json.dumps(s) + "\n")
    return spans


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def parse_warc_record(data: bytes, fname: str = "", offset: int = 0) -> dict | None:
    """One (uncompressed) WARC record → row dict; None for non-response
    records (warcinfo/request/metadata are skipped like CC text pipelines
    do)."""
    sep = data.find(b"\r\n\r\n")
    if sep < 0 or not data.startswith(b"WARC/"):
        return None  # garbage member in a real-world crawl: skip, don't kill the task
    headers = {}
    for line in data[:sep].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode()] = v.strip().decode()
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError):
        # missing or non-numeric length: take the remainder minus the
        # record-terminating CRLFCRLF instead of emptying it or raising
        clen = max(0, len(data) - sep - 4 - 4)
    payload = data[sep + 4 : sep + 4 + clen]
    rtype = headers.get("warc-type", "")
    row = {
        "file": fname,
        "offset": offset,
        "record_type": rtype,
        "url": headers.get("warc-target-uri"),
        "ts_s": headers.get("warc-date"),
        "http_status": None,
        "mime": None,
        "html": None,
    }
    if rtype != "response":
        return None
    hsep = payload.find(b"\r\n\r\n")
    if hsep < 0:
        # truncated HTTP envelope: surface the row with a NULL body
        # rather than leaking header bytes into html
        return row
    http_head = payload[:hsep].split(b"\r\n")
    status_line = http_head[0].split(b" ")
    try:
        row["http_status"] = int(status_line[1])
    except (IndexError, ValueError):
        row["http_status"] = None
    for line in http_head[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            row["mime"] = v.strip().decode()
    row["html"] = payload[hsep + 4 :]
    return row


def iter_warc_members(data: bytes):
    """Walk concatenated gzip members: yields (offset, member_bytes)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        yield pos, out
        pos += consumed


def _decode_spans(batches):
    for pdf in batches:
        for p, group in pdf.groupby("path", sort=False):
            rows = []
            with open(p, "rb") as f:
                for off, length in zip(group["offset"], group["length"]):
                    f.seek(int(off))
                    data = f.read(int(length))
                    if data[:2] == b"\x1f\x8b":
                        data = gzip.decompress(data)
                    row = parse_warc_record(data, os.path.basename(p), int(off))
                    if row is not None:
                        rows.append(row)
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)


def read_warc(spark, path: str, span_partitions: int | None = None):
    """Distributed WARC scan → response-record DataFrame (WARC_SCHEMA).

    With sidecar ``.idx`` files (the CDX analog): spans fan out across
    ``span_partitions`` tasks, each seeking + gunzipping only its own
    members — record-level parallelism inside arbitrarily large archives.
    Without an index: one task per file via binaryFile, walking gzip
    members sequentially (CC's many-files layout makes that the natural
    split)."""
    from ._paths import resolve_input_paths

    paths = resolve_input_paths(path, "WARC")
    indexed = [p for p in paths if os.path.exists(p + ".idx")]
    if len(indexed) == len(paths) and paths:
        spans = []
        for p in paths:
            with open(p + ".idx") as f:
                for line in f:
                    s = json.loads(line)
                    spans.append((p, s["offset"], s["length"]))
        n_part = span_partitions or spark.sparkContext.defaultParallelism
        spans_df = spark.createDataFrame(
            pd.DataFrame(spans, columns=["path", "offset", "length"]),
            "path string, offset long, length long",
        ).repartition(min(n_part, max(1, len(spans))))
        return spans_df.mapInPandas(_decode_spans, WARC_SCHEMA)

    files = spark.read.format("binaryFile").load(path)
    files = files.filter(~files.path.endswith(".idx")).select("path", "content")

    def _scan(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                rows = []
                members = (
                    iter_warc_members(data)
                    if data[:2] == b"\x1f\x8b"
                    else _iter_plain_records(data)
                )
                for off, rec in members:
                    row = parse_warc_record(rec, os.path.basename(p), off)
                    if row is not None:
                        rows.append(row)
                if rows:
                    yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(_scan, WARC_SCHEMA)


def _iter_plain_records(data: bytes):
    """Uncompressed .warc: records delimited by Content-Length walking.

    A malformed Content-Length (garbage member in a real-world crawl)
    must not kill the task — same tolerant policy as parse_warc_record
    and the gzip-member path: resync by scanning for the next
    ``WARC/`` version line and skip the broken record."""
    pos = 0
    while pos < len(data):
        sep = data.find(b"\r\n\r\n", pos)
        if sep < 0:
            break
        clen = None
        for line in data[pos:sep].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                try:
                    clen = int(v.strip())
                except ValueError:
                    clen = None
        if clen is None or clen < 0:
            nxt = data.find(b"\r\nWARC/", sep + 4)
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        end = sep + 4 + clen + 4
        yield pos, data[pos:end]
        pos = end


def warc_to_pages(warc_df):
    """WARC response records → the input_hint ``pages`` shape
    ``(url, warc_ts, html, text, lang)``: byte-pinned text extraction
    (functions/extract.py, Arrow-batched) + native-expression language id
    (functions/textstats.py). This is the crawl→table ingestion edge of
    the north_star pipeline."""
    from pyspark.sql import functions as F

    from sophox_spark.functions import extract, textstats

    pages = warc_df.select(
        "url",
        F.to_timestamp("ts_s", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        "html",
    )

    def _extract(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = extract.extract_text_batch(pdf["html"])
            yield pdf

    with_text = pages.mapInPandas(
        _extract, "url string, warc_ts timestamp, html binary, text string"
    )
    return with_text.withColumn("lang", textstats.lang_id(F.col("text")))
