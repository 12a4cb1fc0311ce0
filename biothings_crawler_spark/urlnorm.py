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


_VALID_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"


def _parts(url: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, authority, path, query) via string surgery — one cheap
    anchored rlike for validity, everything else substring_index/instr
    (codegen string ops, ~5× faster than the regexp_extract chain at
    10^10 rows; byte-equality with canonicalize_url is test-enforced).

    The scheme char class excludes ':' and '/', so the regex's scheme
    boundary is exactly the FIRST '://'; the char classes [^/?#]*,
    [^?#]*, [^#]* make '#', then '?', then '/' the authority/path/query
    delimiters in that precedence — reproduced below.
    """
    pre = F.substring_index(url, "://", 1)
    scheme = F.lower(pre)
    rest = F.substring(url, F.length(pre) + 4, F.lit(2**30))
    rest = F.substring_index(rest, "#", 1)  # strip fragment at first '#'
    auth = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    pathquery = F.substring(rest, F.length(auth) + 1, F.lit(2**30))
    path = F.substring_index(pathquery, "?", 1)
    qpos = F.instr(pathquery, "?")
    query = F.when(qpos > 0, F.substring(pathquery, qpos + 1, F.lit(2**30))).otherwise(F.lit(""))
    return scheme, F.lower(auth), path, query


def canonicalize_col(url: Column) -> Column:
    """Native-Spark twin of :func:`canonicalize_url` (null on no-match).

    The (scheme, auth, path, query) tuple is let-bound (text.bind_col):
    the assembly below references auth ~6 times and query 3 times, and
    codegen's subexpression elimination does not reach inside CaseWhen
    branches, so the unbound form re-ran the whole substring-chain
    parse per reference — measured 2.0 s -> 0.7 s per 150k-URL
    identity pass."""
    from biothings_crawler_spark.operators.text import bind_col

    scheme, auth, path, query = _parts(url)

    def assemble(p: Column) -> Column:
        scheme, auth, path, query = p["s"], p["a"], p["p"], p["q"]
        auth = (
            F.when((scheme == "http") & auth.endswith(":80"),
                   F.substring(auth, 1, F.length(auth) - 3))
            .when((scheme == "https") & auth.endswith(":443"),
                  F.substring(auth, 1, F.length(auth) - 4))
            .otherwise(auth)
        )
        path = F.when(path == "", F.lit("/")).otherwise(path)
        sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
        base = F.concat(scheme, F.lit("://"), auth, path)
        return F.when(query == "", base).otherwise(
            F.concat(base, F.lit("?"), sorted_q))

    out = bind_col(
        F.struct(scheme.alias("s"), auth.alias("a"),
                 path.alias("p"), query.alias("q")),
        assemble,
    )
    return F.when(url.rlike(_VALID_RE), out).otherwise(F.lit(None).cast("string"))


def host_col(url: Column) -> Column:
    """Native-Spark twin of :func:`host_of`."""
    _, auth, _, _ = _parts(url)
    host = F.substring_index(auth, ":", 1)
    return F.when(url.rlike(_VALID_RE), host).otherwise(F.lit(None).cast("string"))


def domain_key_col(host: Column) -> Column:
    """Native-Spark twin of :func:`domain_key` (lstrip of char-set {w,.})."""
    return F.regexp_replace(host, r"^[w.]*", "")


def surt_key_col(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the web
    archive / CDX-index convention (Internet Archive's Heritrix +
    wayback cdx format): host labels reversed and comma-joined, a
    ``)`` delimiter, then path?query — e.g.
    ``https://www.news.example.org/a/b?x=1`` ->
    ``org,example,news)/a/b?x=1``.

    Why it matters at 10^10 URLs: sorting by SURT clusters every page
    of a registered domain (and all its subdomains) into one
    contiguous key range, so "everything under example.org" is a
    RANGE SCAN — the layout trick behind CDX lookups, per-domain
    exports, and min/max parquet pruning after a
    ``sortWithinPartitions(surt)`` write.  Scheme and ports are
    dropped, the leading ``www.`` label is stripped (protocol and www
    variants of a page must share a key), query strings are kept
    AS-IS — canonicalize first (:func:`canonicalize_col`) if you want
    sorted params.  Pure codegen string ops; null for non-URLs.
    """
    _, auth, path, query = _parts(url)
    host = F.substring_index(auth, ":", 1)
    host = F.when(host.startswith("www."), F.substring(host, 5, F.lit(2**30))
                  ).otherwise(host)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    p = F.when(path == "", F.lit("/")).otherwise(path)
    out = F.concat(
        rev, F.lit(")"), p,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(url.rlike(_VALID_RE), out).otherwise(
        F.lit(None).cast("string"))


def surt_prefix(domain: str) -> str:
    """The SURT range prefix owning ``domain`` and every subdomain:
    ``surt_prefix('example.org')`` = ``'org,example'`` — filter
    ``surt_key.startsWith(prefix)`` and the predicate prunes a
    surt-sorted layout to one contiguous slice."""
    d = domain.lower()
    d = d[4:] if d.startswith("www.") else d
    return ",".join(reversed(d.split(".")))


# Two-label public suffixes (mini public-suffix list). The real
# Mozilla PSL has ~9k rules; politeness and budget grouping only need
# the high-traffic ccTLD second-level registries — for a full list,
# broadcast-join a PSL table on the same label-suffix keys instead
# (operators/blocklist.py shows the pattern). Sorted, deduped.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "ac.jp", "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk",
    "co.za", "com.ar", "com.au", "com.br", "com.cn", "com.mx",
    "com.sg", "com.tr", "com.tw", "edu.au", "gov.uk", "ne.jp",
    "net.au", "nhs.uk", "or.jp", "org.au", "org.uk",
)


def etld1_col(host: Column) -> Column:
    """Registrable domain (eTLD+1) of ``host`` — the public-suffix-
    list rule (publicsuffix.org): one label more than the longest
    matching public suffix.  ``www.news.example.co.uk`` ->
    ``example.co.uk``; ``foo.com`` -> ``foo.com``; a host that IS a
    public suffix (``co.uk``) or has one label (``localhost``) has no
    registrable domain -> null.

    Why the frontier needs it at 10^10 URLs: per-HOST politeness lets
    a single registrant with wildcard subdomains (``*.blogspot.com``
    -style farms) multiply its budget by minting hosts; keying budgets
    and crawl quotas on eTLD+1 closes that hole.  Pure row-local
    expression (``substring_index`` + a literal ``isin``) — zero
    exchange, no UDF; swap in a broadcast PSL join for the full list.
    """
    last2 = F.substring_index(host, ".", -2)
    n = F.size(F.split(host, r"\."))
    is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(n >= 3, F.when(is_multi, F.substring_index(host, ".", -3))
               .otherwise(last2))
        .when((n == 2) & ~is_multi, last2)
        .otherwise(F.lit(None).cast("string"))
    )


def pct_normalize_col(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization: decode escapes
    of UNRESERVED characters (ALPHA / DIGIT / ``-._~``: ``%41`` -> ``A``,
    ``%7E`` -> ``~``) and uppercase the hex of every other escape
    (``%3a`` -> ``%3A``).  Without it, ``/a%2Fb``-style URLs split into
    spurious frontier keys per encoder whim — the same page can carry
    dozens of byte-distinct URLs in the wild.

    Implementation is tokenize -> transform -> join, all JVM-side: the
    URL splits into ``%XX`` escapes and literal runs
    (``regexp_extract_all``), each escape folds through integer hex
    arithmetic (``conv``+``char``) inside one ``transform`` lambda —
    no UDF, no join, zero exchange.  Composable before
    :func:`canonicalize_col` (which is frozen to the reference's own
    normalization quirks and deliberately left untouched).
    """
    toks = F.regexp_extract_all(
        url, F.lit(r"(%[0-9A-Fa-f]{2}|[^%]+|%)"), 0)
    is_esc = lambda t: t.rlike("^%[0-9A-Fa-f]{2}$")  # noqa: E731

    def decode_tok(t: Column) -> Column:
        hexpart = F.upper(F.substring(t, 2, 2))
        code = F.conv(hexpart, 16, 10).cast("int")
        unreserved = (
            ((code >= 48) & (code <= 57)) | ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | code.isin(45, 46, 95, 126)  # - . _ ~
        )
        return F.when(
            unreserved, F.char(code)
        ).otherwise(F.concat(F.lit("%"), hexpart))
    out = F.array_join(
        F.transform(toks, lambda t: F.when(is_esc(t), decode_tok(t))
                    .otherwise(t)), "")
    return F.when(url.isNotNull(), out)
