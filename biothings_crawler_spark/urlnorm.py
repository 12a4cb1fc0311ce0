"""URL canonicalization — the seen-set key.

The reference relies on Scrapy's default ``RFPDupeFilter`` (SHA1 over
method + w3lib-canonicalized URL; never overridden — no
``DUPEFILTER_CLASS`` in crawler/settings.py and no ``dont_filter=True``
anywhere), so one fetch per canonical URL per crawl. We reproduce the
load-bearing parts of that canonicalization:

  * lowercase scheme and host
  * drop the default port (http:80 / https:443)
  * empty path -> "/"
  * strip the fragment
  * sort query parameters lexicographically (full "k=v" token sort,
    keeping blank values)

Two implementations that MUST agree byte-for-byte (test-enforced):

  * :func:`canonicalize_url` — pure Python, used by the frozen oracle
    (oracle/bfs.py) and tests.
  * :func:`canonicalize_col` — native Spark column expression
    (regexp + array_sort; JVM-side, whole-stage codegen, no Python in
    the 10^10-row hot path).

Plus the reference's same-domain quirk: CLIC strips ``www.`` with
``lstrip('www.')`` — a *character-set* strip (``"ww2.example.org"`` ->
``"2.example.org"``) — reproduced bit-for-bit per SURVEY.md §2.3
(reference crawler/spiders/broadscrape/clic.py:99-101).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin  # re-exported for link extraction

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "host_of",
    "domain_key",
    "canonicalize_col",
    "host_col",
    "domain_key_col",
    "urljoin",
]

_URL_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)


def canonicalize_url(url: str) -> str | None:
    """Canonical form of *url*; None if it is not an absolute http(s)-ish URL."""
    m = _URL_RE.match(url)
    if not m:
        return None
    scheme, authority, path, query = m.groups()
    scheme = scheme.lower()
    authority = authority.lower()
    if scheme == "http" and authority.endswith(":80"):
        authority = authority[:-3]
    elif scheme == "https" and authority.endswith(":443"):
        authority = authority[:-4]
    if not path:
        path = "/"
    out = f"{scheme}://{authority}{path}"
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


def host_of(url: str) -> str | None:
    """Lowercased host (authority minus port) of *url*."""
    m = _URL_RE.match(url)
    if not m:
        return None
    authority = m.group(2).lower()
    return authority.rsplit(":", 1)[0] if ":" in authority else authority


def domain_key(host: str) -> str:
    """The reference's same-domain comparison key: ``host.lstrip('www.')``.

    NOTE deliberate quirk reproduction: ``lstrip`` strips the CHARACTER
    SET {w, '.'} — e.g. ``"www.x.org"`` -> ``"x.org"`` but also
    ``"web.x.org"`` -> ``"eb.x.org"`` (reference clic.py:100).
    """
    return host.lstrip("www.")


# --- native Spark twins (JVM-side; no Python UDF) ---------------------------

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*).*$"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*).*$"
_QUERY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*).*$"


def canonicalize_col(url: Column) -> Column:
    """Native-Spark twin of :func:`canonicalize_url` (null on non-match)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    base = F.concat(scheme, F.lit("://"), auth, path)
    out = F.when(query == "", base).otherwise(F.concat(base, F.lit("?"), sorted_q))
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(out)


def host_col(url: Column) -> Column:
    """Native-Spark twin of :func:`host_of`."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    host = F.regexp_extract(auth, r"^([^:]*)", 1)
    return F.when(F.regexp_extract(url, _SCHEME_RE, 1) == "", F.lit(None).cast("string")).otherwise(host)


def domain_key_col(host: Column) -> Column:
    """Native-Spark twin of :func:`domain_key` (lstrip of char-set {w,.})."""
    return F.regexp_replace(host, r"^[w.]*", "")
