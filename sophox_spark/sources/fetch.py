"""Bounded-concurrency hourly-dump fetch loop (S4/S5 I/O half).

The reference's pageview updater enumerates hourly dump URLs from the
stored watermark, fetches them with a 3-connection aiohttp session,
tolerates per-file failures, advances the watermark to the max
successfully-processed hour, and commits stats + watermark together
(/root/reference/osm2rdf/updatePageViewStats.py:63-140 run /
process_files / iterate_hours / process_file). Spark-native
re-expression:

  * ``iterate_hours`` mirrors the reference generator exactly
    (inclusive backward / exclusive forward start, max_files cap,
    2015-05-01 floor, stop at the wall clock going forward);
  * the fetch itself runs EXECUTOR-SIDE: candidate URLs become a
    DataFrame, ``fetch_hourly`` maps each partition through a
    ``ThreadPoolExecutor(concurrency)`` — the TCPConnector(limit=3)
    analog, per task rather than per process — via a pluggable
    ``transport(url) -> bytes | None`` so tests (and this sandbox,
    which has no network) inject fakes while production injects a real
    HTTP client;
  * per-URL failure → ``ok = false`` row, never a task kill (the
    reference logs-and-skips), and the new watermark is the max hour
    with ok = true — computed with one agg, exactly
    ``process_files``'s ``new_last`` rule;
  * downstream parse/aggregate reuses sources/pageviews.py (P8/A3) and
    the Manifest watermark commit used by every other incremental path.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# oldest pageview dump (updatePageViewStats.py:60-61)
MINIMUM_DATA_TS = datetime(2015, 5, 1, tzinfo=timezone.utc)

DEFAULT_URL_FMT = (
    "https://dumps.wikimedia.org/other/pageviews/"
    "{0:%Y}/{0:%Y-%m}/pageviews-{0:%Y%m%d}-{0:%H}0000.gz"
)


def iterate_hours(
    last_processed: datetime,
    max_count: int,
    backwards: bool = True,
    now: datetime | None = None,
    minimum_ts: datetime = MINIMUM_DATA_TS,
):
    """Hour timestamps to fetch — the reference generator verbatim:
    backward iteration starts AT ``last_processed`` (inclusive),
    forward starts one hour after (exclusive), capped at ``max_count``
    and bounded by the data floor / the wall clock. ``now`` is
    injectable for determinism (Date.now-free tests)."""
    delta = timedelta(hours=(-1 if backwards else 1))
    done = 0
    current = last_processed
    if not backwards:
        current += delta
    wall = now or datetime.now(timezone.utc)
    while current > minimum_ts if backwards else current < wall:
        if done >= max_count:
            break
        yield current
        done += 1
        current += delta


def fetch_hourly(
    spark: SparkSession,
    transport,
    last_processed: datetime,
    max_files: int,
    backwards: bool = True,
    url_fmt: str = DEFAULT_URL_FMT,
    concurrency: int = 3,
    now: datetime | None = None,
) -> DataFrame:
    """Fetch the due hourly dumps with bounded concurrency.

    Returns ``(ts timestamp, url string, ok boolean, payload binary)``
    — one row per candidate hour; failed fetches keep their row with
    ``ok = false`` so the caller can log/alert on gaps the way the
    reference does. ``transport(url) -> bytes | None`` runs inside the
    executor task; exceptions and None both count as failure."""
    hours = list(iterate_hours(last_processed, max_files, backwards, now=now))
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([h.replace(tzinfo=None) for h in hours]),
            "url": [url_fmt.format(h) for h in hours],
        }
    )
    if not hours:
        return spark.createDataFrame(
            [], "ts timestamp, url string, ok boolean, payload binary"
        )
    urls = spark.createDataFrame(pdf, "ts timestamp, url string")

    def gen(batches):
        pool = ThreadPoolExecutor(max_workers=concurrency)

        def one(url):
            try:
                return transport(url)
            except Exception:
                return None  # log-and-skip policy, never a task kill

        for b in batches:
            payloads = list(pool.map(one, b["url"]))
            yield pd.DataFrame(
                {
                    "ts": b["ts"],
                    "url": b["url"],
                    "ok": [p is not None for p in payloads],
                    "payload": [p if p is not None else None for p in payloads],
                }
            )

    return urls.repartition(max(1, len(hours) // 8)).mapInPandas(
        gen, "ts timestamp, url string, ok boolean, payload binary"
    )


def new_watermark(fetched_df: DataFrame):
    """``process_files``'s new_last rule: max hour with ok = true (None
    when nothing succeeded), found with one aggregation."""
    row = fetched_df.filter("ok").agg(F.max("ts")).collect()[0]
    return row[0]


def pageview_stats(fetched_df: DataFrame) -> DataFrame:
    """Decompress + parse + sum the fetched dumps into per-page stats
    (reuses the S4/P8/A3 operators; gzip payloads inflate in Arrow
    batches executor-side)."""
    import gzip

    from . import pageviews

    def inflate(batches):
        for b in batches:
            lines = []
            for ok, payload in zip(b["ok"], b["payload"]):
                if not ok or payload is None:
                    continue
                raw = bytes(payload)
                if raw[:2] == b"\x1f\x8b":
                    raw = gzip.decompress(raw)
                for ln in raw.decode("utf-8", "replace").splitlines():
                    if ln:
                        lines.append(ln)
            yield pd.DataFrame({"value": lines})

    lines = fetched_df.mapInPandas(inflate, "value string")
    return pageviews.aggregate_pageviews(pageviews.parse_pageview_lines(lines))
