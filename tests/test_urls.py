"""URL canonicalization / registered-domain (functions/urls.py) —
native-expression webtext ops."""

import pytest
from pyspark.sql import functions as F

from sophox_spark.functions import urls


def _canon(spark, raw):
    df = spark.createDataFrame([(u,) for u in raw], "u string")
    return [
        r.c for r in df.select(urls.canonicalize_url(F.col("u")).alias("c")).collect()
    ]


def test_canonicalize_cases(spark):
    got = _canon(spark, [
        "HTTP://WWW.Example.COM:80/a/b?utm_source=x&z=2&a=1#frag",
        "https://Sub.Example.co.uk:443/p",
        "https://example.com:8443/p?fbclid=abc",
        "http://example.com/only?utm_campaign=c&utm_medium=m",
        "https://example.com/q?b=2&a=1&a=0",
    ])
    assert got == [
        "http://example.com/a/b?a=1&z=2",
        "https://sub.example.co.uk/p",
        "https://example.com:8443/p",
        "http://example.com/only",
        "https://example.com/q?a=0&a=1&b=2",
    ]


def test_registered_domain(spark):
    hosts = ["sub.a.example.com", "example.co.uk", "x.example.co.uk",
             "example.com", "localhost", "a.b.gov.au"]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = [
        r.d
        for r in df.select(urls.registered_domain(F.col("h")).alias("d")).collect()
    ]
    assert got == ["example.com", "example.co.uk", "example.co.uk",
                   "example.com", "localhost", "b.gov.au"]


def test_all_native_no_python(spark):
    df = spark.createDataFrame([("https://www.x.com/a?b=1",)], "u string")
    plan = (
        df.select(urls.canonicalize_url(F.col("u")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
