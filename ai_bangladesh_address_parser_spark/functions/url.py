"""URL canonicalization as pure codegen-level column expressions.

Web-corpus pipelines dedup and filter BY URL before they ever touch
page text: the same article is crawled as ``http://Host.com:80/a/`` and
``https://host.com/a?utm_source=feed``, and host-level statistics drive
per-domain quality decisions. This module provides the canonical-URL
mapping as JVM column expressions (regexp + higher-order array
functions — no Python in the row path), so the dedup key costs one
projection over the scan.

Canonicalization contract (each rule is pinned in tests/test_url.py):

1. scheme lowercased;
2. authority lowercased; the scheme's default port stripped
   (``:80`` for http, ``:443`` for https — only as a trailing port);
3. empty path becomes ``/``; a non-root path loses trailing slashes;
4. the query string is split on ``&``; empty params and tracking
   params (``utm_`` prefix, ``fbclid``/``gclid``/``ref`` keys) are
   dropped; survivors are byte-order sorted and rejoined — param order
   never distinguishes two URLs;
5. the fragment is dropped.

The same rules are expressible one-for-one in ANSI SQL (DuckDB oracle:
regexp_extract / list_filter / list_sort / array_to_string), which is
what makes x8/x9 fully hash-verifiable.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# dropped query params: the substring prefixes below (LIKE is avoided on
# purpose — its `_` wildcard would make "utm_" match "utmX")
_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")


def scheme_expr(col: str | Column) -> Column:
    return F.lower(F.regexp_extract(col, _SCHEME_RE, 1))


def host_expr(col: str | Column) -> Column:
    """Lowercased authority with the scheme's default port stripped."""
    auth = F.lower(F.regexp_extract(col, _AUTH_RE, 1))
    scheme = scheme_expr(col)
    return (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )


def path_expr(col: str | Column) -> Column:
    """Path with trailing slashes stripped; root/empty both map to /."""
    raw = F.regexp_extract(col, _PATH_RE, 1)
    stripped = F.regexp_replace(raw, "/+$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def _keeps(p: Column) -> Column:
    keep = p != ""
    for pre in _TRACKING_PREFIXES:
        keep = keep & (F.substring(p, 1, len(pre)) != pre)
    return keep


def query_expr(col: str | Column) -> Column:
    """Tracking-free, byte-order-sorted query string ('' if none left)."""
    raw = F.regexp_extract(col, _QUERY_RE, 1)
    params = F.filter(F.split(raw, "&"), _keeps)
    return F.array_join(F.array_sort(params), "&")


def canonical_url_expr(col: str | Column) -> Column:
    qs = query_expr(col)
    return F.concat(
        scheme_expr(col),
        F.lit("://"),
        host_expr(col),
        path_expr(col),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def canonical_reference(url: str) -> str:
    """Pure-Python reference of the same contract, for property tests
    (urllib-based — an INDEPENDENT implementation, not a transcription
    of the expressions above)."""
    from urllib.parse import urlsplit

    s = urlsplit(url)
    scheme = s.scheme.lower()
    host = s.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = s.path.rstrip("/") or "/"
    params = [
        p
        for p in s.query.split("&")
        if p and not any(p.startswith(t) for t in _TRACKING_PREFIXES)
    ]
    qs = "&".join(sorted(params))
    return f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "")
