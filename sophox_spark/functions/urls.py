"""URL canonicalization + registered-domain extraction (webtext pipeline).

Crawl pipelines key nearly everything on a canonical URL (dedup, host
aggregation, per-domain quality stats). These are pure NATIVE column
expressions — ``parse_url`` (JVM-side) + array lambda functions — so the
hot path stays inside whole-stage codegen with zero Python.

Canonical form (the common crawl-processing rules):
* scheme and host lowercased, leading ``www.`` stripped
* default ports stripped (``:80`` for http, ``:443`` for https)
* tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``), remaining query params sorted by full ``k=v`` text
* fragment dropped

``registered_domain`` is the naive eTLD+1: the last two host labels,
or the last three when the second-level label is a well-known
multi-label suffix (``co com org net gov ac edu`` + ≤3-char TLD). The
full Public Suffix List is not shipped in this container; the subset is
documented and the function is the single place to widen it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_PARAMS = ("fbclid", "gclid", "msclkid")
_MULTI_LABEL_SLD = ("co", "com", "org", "net", "gov", "ac", "edu")


def _is_tracking(kv: Column) -> Column:
    key = F.substring_index(kv, "=", 1)
    cond = F.lit(False)
    for p in _TRACKING_PREFIXES:
        cond = cond | key.startswith(p)
    for name in _TRACKING_PARAMS:
        cond = cond | (key == name)
    return cond


def canonical_host(url: Column) -> Column:
    """Lowercased host, ``www.`` stripped, default port stripped."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    auth = F.lower(F.parse_url(url, F.lit("AUTHORITY")))
    default_port = F.when(scheme == "https", F.lit(":443")).otherwise(F.lit(":80"))
    no_port = F.when(
        auth.endswith(default_port),
        F.substring(auth, F.lit(1), F.length(auth) - F.length(default_port)),
    ).otherwise(auth)
    return F.regexp_replace(no_port, r"^www\.", "")


def canonical_query(url: Column) -> Column:
    """'?a=1&b=2' with tracking params dropped and params sorted; '' when
    nothing survives."""
    q = F.parse_url(url, F.lit("QUERY"))
    parts = F.filter(
        F.split(q, "&"),
        lambda kv: (kv != "") & ~_is_tracking(kv),
    )
    joined = F.array_join(F.array_sort(parts), "&")
    return F.when(
        q.isNull() | (F.coalesce(joined, F.lit("")) == ""), F.lit("")
    ).otherwise(F.concat(F.lit("?"), joined))


def canonicalize_url(url: Column) -> Column:
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    return F.concat(
        scheme, F.lit("://"), canonical_host(url), path, canonical_query(url)
    )


def registered_domain(host: Column) -> Column:
    """Naive eTLD+1 over a (canonical) host column; a trailing ':port'
    is ignored."""
    host = F.regexp_replace(host, r":[0-9]+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sld = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (
        (n >= 3) & sld.isin(*_MULTI_LABEL_SLD) & (F.length(tld) <= 3)
    )
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    return F.when(n < 2, host).when(take3, last3).otherwise(last2)
