"""Bounded-concurrency fetch loop (sources/fetch.py) vs the reference's
updatePageViewStats semantics: hour enumeration, failure tolerance,
watermark advance, stats aggregation."""

import gzip
from datetime import datetime, timedelta, timezone

import pytest

from sophox_spark.sources import fetch

UTC = timezone.utc
NOW = datetime(2024, 3, 1, 12, 30, tzinfo=UTC)


class TestIterateHours:
    def test_backwards_inclusive_capped(self):
        start = datetime(2024, 3, 1, 10, tzinfo=UTC)
        hours = list(fetch.iterate_hours(start, 3, backwards=True, now=NOW))
        assert hours == [start, start - timedelta(hours=1), start - timedelta(hours=2)]

    def test_forward_exclusive_stops_at_now(self):
        start = datetime(2024, 3, 1, 10, tzinfo=UTC)
        hours = list(fetch.iterate_hours(start, 10, backwards=False, now=NOW))
        # starts one hour AFTER last processed, stops before wall clock
        assert hours == [
            datetime(2024, 3, 1, 11, tzinfo=UTC),
            datetime(2024, 3, 1, 12, tzinfo=UTC),
        ]

    def test_backwards_floor(self):
        start = fetch.MINIMUM_DATA_TS + timedelta(hours=2)
        hours = list(fetch.iterate_hours(start, 99, backwards=True, now=NOW))
        assert len(hours) == 2  # stops at the 2015-05-01 data floor


def _payload(lines):
    # NOTE: executor-shipped transports must not reference this module
    # (executors can't import test files) — inline payloads there.
    return gzip.compress("\n".join(lines).encode())


class TestFetchHourly:
    def test_failures_skip_not_kill_and_watermark(self, spark):
        start = datetime(2024, 3, 1, 10, tzinfo=UTC)

        def transport(url):
            if "-090000" in url:
                raise OSError("connection reset")  # exception → skipped
            if "-080000" in url:
                return None  # HTTP error analog → skipped
            import gzip as _g

            return _g.compress(b"en Page_A 3 0\nen Page_B 2 0")

        out = fetch.fetch_hourly(
            spark, transport, start, 4, backwards=True, now=NOW
        )
        rows = {r.ts.hour: r.ok for r in out.collect()}
        assert rows == {10: True, 9: False, 8: False, 7: True}
        # new_last = max successfully processed hour
        wm = fetch.new_watermark(out)
        assert wm.hour == 10

    def test_stats_aggregate_across_hours(self, spark):
        start = datetime(2024, 3, 1, 10, tzinfo=UTC)

        def transport(url):
            import gzip as _g

            return _g.compress(
                b"en Page_A 3 0\nen.m Page_A 1 0\nNOTvalid X 5 0\n"
                b"de Page_C bad 0"
            )

        out = fetch.fetch_hourly(spark, transport, start, 2, now=NOW)
        stats = {
            (r.project, r.title): r.views
            for r in fetch.pageview_stats(out).collect()
        }
        # 2 hours × 3 views; non-matching projects ('NOTvalid' uppercase,
        # 'en.m' has a dot — outside ^[-a-z]+$) and the malformed count
        # line are all dropped (P8)
        assert stats == {("en", "Page_A"): 6}

    def test_no_due_hours_empty(self, spark):
        start = datetime(2024, 3, 1, 11, tzinfo=UTC)
        out = fetch.fetch_hourly(
            spark, lambda u: b"", start, 5, backwards=False,
            now=datetime(2024, 3, 1, 11, 30, tzinfo=UTC),
        )
        assert out.count() == 0
        assert fetch.new_watermark(out) is None

    def test_url_format_matches_reference(self):
        h = datetime(2024, 3, 1, 7, tzinfo=UTC)
        assert fetch.DEFAULT_URL_FMT.format(h) == (
            "https://dumps.wikimedia.org/other/pageviews/2024/2024-03/"
            "pageviews-20240301-070000.gz"
        )

    def test_bounded_concurrency(self, spark, tmp_path):
        """No more than ``concurrency`` transport calls in flight at
        once per task — the TCPConnector(limit=3) analog. Executor-side
        transport calls journal (start, end) wall-clock intervals to a
        shared directory; max interval overlap must stay ≤ 3."""
        import os
        import time
        import uuid

        start = datetime(2024, 3, 1, 23, tzinfo=UTC)
        log_dir = str(tmp_path / "calls")
        os.makedirs(log_dir, exist_ok=True)

        def transport(url):
            t0 = time.monotonic_ns()
            time.sleep(0.2)
            t1 = time.monotonic_ns()
            with open(os.path.join(log_dir, uuid.uuid4().hex), "w") as f:
                f.write(f"{t0} {t1}")
            import gzip as _g

            return _g.compress(b"en P 1 0")

        out = fetch.fetch_hourly(
            spark, transport, start, 12, concurrency=3, now=NOW
        )
        assert out.count() == 12
        spans = []
        for fn in os.listdir(log_dir):
            a, b = open(os.path.join(log_dir, fn)).read().split()
            spans.append((int(a), int(b)))
        assert len(spans) == 12
        events = sorted(
            [(a, 1) for a, _ in spans] + [(b, -1) for _, b in spans]
        )
        peak = cur = 0
        for _, d in events:
            cur += d
            peak = max(peak, cur)
        # fetch_hourly partitions 12 urls into ⌊12/8⌋ = 1 partition →
        # one pool of 3
        assert peak <= 3
