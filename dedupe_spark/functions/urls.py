"""URL canonicalization for web-crawl dedup.

The first dedup pass over a crawl is URL-level: the same page is
fetched as `HTTP://WWW.Example.com:443/a/?utm_source=x&b=1#frag` and
`https://example.com/a?b=1`. Canonicalizing before the content passes
collapses these for free (no text ever shuffles).

Rules (the common subset of public crawler canonicalizers — cf. the
URL normalizations described in RFC 3986 §6):

- scheme and host lowercased; leading ``www.`` dropped
- the scheme's OWN default port dropped (``:80`` for http, ``:443``
  for https — never cross-scheme: ``http://host:443/x`` is a distinct
  resource and keeps its port)
- fragment dropped
- trailing slashes on a non-root path dropped
- tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``) dropped
- remaining query params sorted (byte order), ``?`` dropped if none

Everything is JVM-side regex/array expressions (codegen, no Python),
and every regex is alternation/class-only so RE2 (DuckDB) and Java
agree — the oracle query hash-verifies the whole chain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ^scheme://hostport path query(fragment dropped by omission)
_ABS_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*).*$"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*).*$"
_QUERY_RE = r"^[^?#]*\?([^#]*).*$"

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _strip_default_port(host: Column, scheme: Column) -> Column:
    """Drop the port only when it is the scheme's default (ADVICE r3:
    a blanket ':(80|443)$' strip collapsed http://h:443 with http://h)."""
    out = host
    for sch, port in _DEFAULT_PORTS.items():
        out = F.when(
            scheme == sch, F.regexp_replace(out, f":{port}$", "")
        ).otherwise(out)
    return out


def is_absolute_url(url: Column) -> Column:
    """True iff ``url`` starts with a ``scheme://`` prefix — the
    precondition for ``canonical_url`` to be meaningful."""
    return url.rlike(_ABS_RE)


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules. Input must be
    an absolute ``scheme://...`` URL; anything else degenerates to
    ``'://'`` (+ any ``?query``) because every component regex extracts
    an empty group — callers that may see malformed urls must gate on
    ``is_absolute_url`` first (``dedup_fetches`` does), or distinct
    malformed rows would collapse into one canonical group."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = _strip_default_port(host, scheme)
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/+$", "")
    rawq = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def dedup_fetches(
    pages,
    url_col: str = "url",
    ts_col: str = "warc_ts",
):
    """Crawl-level dedup: keep exactly one fetch per CANONICAL url —
    the newest by ``ts_col`` (ties broken by the raw url, ascending,
    so the survivor set is deterministic at any parallelism).

    This is the stage every crawl pipeline runs before touching page
    content: refetches and tracking-param/www/port/fragment variants
    of one page never reach extraction or sketching. All other columns
    pass through untouched — in particular the RAW url survives, so
    downstream doc ids (xxhash64(url)) and the byte-identical
    extraction contract are unaffected.

    One shuffle on the canonical-url key. Skew per key is bounded by
    the crawler's refetch count (not corpus size), so a plain window
    is the right plan even at 10^12 pages.

    Malformed (non-absolute) urls are grouped by their RAW string, not
    canonicalized — canonical_url degenerates to '://' on them, which
    would silently collapse every malformed row into one group.
    """
    from pyspark.sql import Window

    curl = F.when(
        is_absolute_url(F.col(url_col)), canonical_url(F.col(url_col))
    ).otherwise(F.col(url_col))
    w = Window.partitionBy("_curl").orderBy(
        F.col(ts_col).desc(), F.col(url_col).asc()
    )
    return (
        pages.withColumn("_curl", curl)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_curl", "_rn")
    )


def url_host(url: Column) -> Column:
    """Registrable-host convenience: lowercased host, no www, and the
    scheme's own default port stripped (same rule as canonical_url)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return _strip_default_port(host, scheme)
