"""WARC container source tests (sources/warc.py).

Parser pinned to a hand-written record literal (independent of the
writer); writer by roundtrip; Spark paths cover both the span-indexed
(CDX-analog) scan and the index-less gzip-member walk.
"""

import gzip

import numpy as np
import pandas as pd

from sophox_spark.sources import warc

HAND_RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Record-ID: <urn:uuid:abc>\r\n"
    b"WARC-Date: 2024-03-04T05:06:07Z\r\n"
    b"WARC-Target-URI: https://example.com/a?b=c\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"Content-Length: 98\r\n"
    b"\r\n"
    b"HTTP/1.1 301 OK\r\n"
    b"Content-Type: text/html; charset=utf-8\r\n"
    b"Content-Length: 19\r\n"
    b"\r\n"
    b"<html>\r\nbody</html>"
    b"\r\n\r\n"
)


def test_parse_hand_written_record():
    row = warc.parse_warc_record(HAND_RECORD, "f.warc.gz", 17)
    assert row["url"] == "https://example.com/a?b=c"
    assert row["ts_s"] == "2024-03-04T05:06:07Z"
    assert row["http_status"] == 301
    assert row["mime"] == "text/html; charset=utf-8"
    assert row["html"] == b"<html>\r\nbody</html>"  # \r\n INSIDE body kept
    assert row["offset"] == 17 and row["record_type"] == "response"
    # http payload length bookkeeping: 79 header bytes + 19 body = 98
    assert len(b"HTTP/1.1 301 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
               b"Content-Length: 19\r\n\r\n") + 19 == 98


def test_non_response_records_skipped():
    rec = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    assert warc.parse_warc_record(rec) is None


def _pages_pdf(n=30, binary_bytes=False):
    rng = np.random.default_rng(11)
    html = []
    for i in range(n):
        if binary_bytes and i % 7 == 0:
            # non-UTF8 bytes must survive the container byte-for-byte
            html.append(bytes(rng.integers(0, 256, 50, dtype=np.uint8)))
        else:
            html.append(f"<html><body>page {i} &amp; stuff</body></html>".encode())
    return pd.DataFrame(
        {
            "url": [f"https://ex.org/{i}" for i in range(n)],
            "ts_s": [f"2024-01-0{1 + i % 9}T00:00:{i % 60:02d}Z" for i in range(n)],
            "html": html,
            "status": [200 if i % 5 else 404 for i in range(n)],
        }
    )


def test_roundtrip_and_index(tmp_path):
    path = str(tmp_path / "crawl-000.warc.gz")
    pages = _pages_pdf(binary_bytes=True)
    spans = warc.write_warc(path, pages)
    assert len(spans) == 30
    # every record its own gzip member at the indexed offset
    data = open(path, "rb").read()
    for s in spans[:5]:
        member = data[s["offset"] : s["offset"] + s["length"]]
        row = warc.parse_warc_record(gzip.decompress(member))
        assert row["url"] == s["url"]
    # full-file member walk sees warcinfo + 30 responses
    rows = [
        warc.parse_warc_record(rec)
        for _, rec in warc.iter_warc_members(data)
    ]
    got = [r for r in rows if r is not None]
    assert len(got) == 30
    assert [r["html"] for r in got] == pages["html"].tolist()
    assert [r["http_status"] for r in got] == pages["status"].tolist()

    # deterministic bytes
    path2 = str(tmp_path / "again.warc.gz")
    warc.write_warc(path2, pages)
    assert open(path2, "rb").read() == data


def test_read_warc_spark_indexed_and_fallback(spark, tmp_path):
    for k in range(3):
        warc.write_warc(
            str(tmp_path / f"crawl-{k:03d}.warc.gz"), _pages_pdf(20)
        )
    glob = str(tmp_path / "*.warc.gz")

    df = warc.read_warc(spark, glob, span_partitions=5)
    assert df.rdd.getNumPartitions() == 5
    got = df.toPandas()
    assert len(got) == 60
    assert got["record_type"].eq("response").all()
    assert sorted(got["url"].unique()) == sorted({f"https://ex.org/{i}" for i in range(20)})

    # index-less fallback: one task per file, same rows
    import os
    for k in range(3):
        os.remove(str(tmp_path / f"crawl-{k:03d}.warc.gz.idx"))
    got2 = warc.read_warc(spark, glob).toPandas()
    key = ["file", "offset"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        got2.sort_values(key).reset_index(drop=True),
    )


def test_warc_to_pages_shape(spark, tmp_path):
    path = str(tmp_path / "p.warc.gz")
    warc.write_warc(path, _pages_pdf(15))
    pages = warc.warc_to_pages(warc.read_warc(spark, path))
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )
    out = pages.toPandas()
    assert len(out) == 15
    assert out["warc_ts"].notna().all()
    r = out[out["url"] == "https://ex.org/3"].iloc[0]
    assert "page 3 & stuff" in r["text"]


def test_malformed_records_are_safe():
    # garbage member: skipped, not a task-killing exception
    assert warc.parse_warc_record(b"not a warc record\r\n\r\n") is None
    # truncated HTTP envelope: NULL body, never header bytes leaked as html
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/a\r\nContent-Length: 15\r\n\r\n"
        b"HTTP/1.1 200 OK" b"\r\n\r\n"
    )
    row = warc.parse_warc_record(rec)
    assert row["html"] is None and row["url"] == "https://x/a"


def test_plain_warc_malformed_content_length_resyncs():
    """One garbage Content-Length in an uncompressed .warc must not kill
    the walk — the walker resyncs on the next WARC/ marker and keeps the
    surrounding good records (same tolerance as the gzip-member path)."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/bad\r\nContent-Length: oops\r\n\r\n"
        b"junk payload with no reliable end"
        b"\r\n\r\n"
    )
    data = HAND_RECORD + bad + HAND_RECORD
    recs = list(warc._iter_plain_records(data))
    urls = [
        warc.parse_warc_record(r, "f.warc", off)["url"] for off, r in recs
        if warc.parse_warc_record(r, "f.warc", off)
    ]
    assert urls == ["https://example.com/a?b=c", "https://example.com/a?b=c"]


def test_read_warc_missing_path_fails_loudly(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        warc.read_warc(spark, str(tmp_path / "nope-*.warc.gz"))
