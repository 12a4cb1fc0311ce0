"""Redirect-chain tracing (Harvard resumable tracing scan).

Reference behavior (crawler/spiders/focusedscrape/harvard.py:104-122):
``requests.head(url, allow_redirects=True)`` per item URL, yielding
``{_id, success: True, location: r.url, status: r.status_code,
history: [{url, status}, ...]}`` — history being the redirect responses
followed, in order — and on exception an error doc
``{_id, success: False, exception: str}``.

Spark-first rebuild: the network is modeled as a ``hops(url, next_url,
status)`` table (one row per URL's response; ``next_url`` set for 3xx).
Tracing is an iterative join — each round joins only the still-
unresolved chains against the hop table, appends to the history array,
and truncates lineage with localCheckpoint (the same bounded-loop
pattern as the BFS crawl rounds and connected_components). Per round
the shuffle carries only unresolved chains, which shrink geometrically;
``max_hops`` bounds the loop, so redirect cycles terminate as
``success=false, exception='too many redirects'`` — mirroring
requests' TooManyRedirects. A seed URL absent from the hop table is a
connection error (``success=false, exception='connection error'``).

Output: (_id, success, location, status, history_json, exception) —
history as a canonical JSON string so the DuckDB recursive-CTE oracle
(driver_queries.SQL_REDIRECT_TRACE) can compare byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOO_MANY = "too many redirects"
CONN_ERROR = "connection error"


def _hist_elem(url_col, status_col) -> F.Column:
    """One history entry as canonical JSON: keys sorted (status<url)."""
    return F.concat(
        F.lit('{"status":'), status_col.cast("string"),
        F.lit(',"url":"'), url_col, F.lit('"}'),
    )


def trace_redirects(
    seeds: DataFrame,
    hops: DataFrame,
    url_col: str = "url",
    max_hops: int = 10,
    round_sizes: list | None = None,
) -> DataFrame:
    """Follow each seed's redirect chain through the hop table.

    ``seeds``: one row per URL to trace. ``hops``: (url, next_url,
    status). A chain resolves when it reaches a non-3xx response
    (success, final location+status) or a URL with no hop row
    (connection error); chains still unresolved after ``max_hops``
    rounds fail as 'too many redirects' (covers cycles).

    Per round only the still-UNRESOLVED sliver is joined and
    checkpointed — resolved chains (the vast majority after hop 1-2)
    are captured lazily off each round's checkpoint and unioned once
    at the end, never re-materialized, so state written per round
    shrinks geometrically with chain length instead of rewriting the
    whole frontier up to max_hops times. Pass ``round_sizes`` (a list)
    to record the per-round pending count — test/observability hook
    for the shrink invariant; it adds one count job per round, leave
    it None in production."""
    h = hops.select(
        F.col("url").alias("h_url"),
        F.col("next_url").alias("h_next"),
        F.col("status").alias("h_status"),
    )
    pending = seeds.select(
        F.col(url_col).alias("_id"),
        F.col(url_col).alias("cur"),
        F.array().cast("array<string>").alias("history"),
        F.lit(False).alias("resolved"),
        F.lit(None).cast("boolean").alias("success"),
        F.lit(None).cast("string").alias("location"),
        F.lit(None).cast("long").alias("status"),
        F.lit(None).cast("string").alias("exception"),
    ).localCheckpoint(eager=True)

    resolved_parts: list[DataFrame] = []
    for _ in range(max_hops):
        if pending.isEmpty():
            break
        if round_sizes is not None:
            round_sizes.append(pending.count())
        j = pending.drop("resolved", "success", "location", "status",
                         "exception").join(h, pending.cur == h.h_url, "left")
        missing = F.col("h_url").isNull()
        redirect = (~missing & F.col("h_next").isNotNull()
                    & F.col("h_status").between(300, 399))
        final = ~missing & ~redirect
        stepped = j.select(
            "_id",
            F.when(redirect, F.col("h_next")).otherwise(F.col("cur")).alias("cur"),
            F.when(redirect,
                   F.concat(F.col("history"),
                            F.array(_hist_elem(F.col("cur"), F.col("h_status")))))
            .otherwise(F.col("history")).alias("history"),
            (missing | final).alias("resolved"),
            F.when(missing, F.lit(False)).when(final, F.lit(True))
            .otherwise(F.lit(None).cast("boolean")).alias("success"),
            F.when(final, F.col("cur")).otherwise(F.lit(None).cast("string")).alias("location"),
            F.when(final, F.col("h_status").cast("long"))
            .otherwise(F.lit(None).cast("long")).alias("status"),
            F.when(missing, F.lit(CONN_ERROR))
            .otherwise(F.lit(None).cast("string")).alias("exception"),
        ).localCheckpoint(eager=True)
        resolved_parts.append(stepped.filter(F.col("resolved")))
        pending = stepped.filter(~F.col("resolved"))

    state = pending
    for part in resolved_parts:
        state = state.unionByName(part)

    return state.select(
        "_id",
        F.coalesce("success", F.lit(False)).alias("success"),
        "location",
        "status",
        F.concat(F.lit("["), F.array_join("history", ","), F.lit("]")).alias("history_json"),
        F.when(~F.col("resolved"), F.lit(TOO_MANY)).otherwise(F.col("exception")).alias("exception"),
    )


def redirect_error_docs(traced: DataFrame) -> DataFrame:
    """The exception error-doc sink shape (harvard.py:117-122):
    failures as {"_id":..,"exception":..,"success":false} documents."""
    return traced.filter(~F.col("success")).select(
        F.lit("error").alias("_type"),
        F.concat(
            F.lit('{"_id":"'), F.col("_id"),
            F.lit('","exception":"'), F.col("exception"),
            F.lit('","success":false}'),
        ).alias("_document"),
    )


def assemble_pagination(
    pages: DataFrame,
    url_col: str = "url",
    next_col: str = "next_url",
    max_hops: int = 16,
) -> DataFrame:
    """Multi-page article assembly from rel="next" chains — the
    pagination sibling of :func:`trace_redirects` (the extract plane
    already surfaces rel attributes; a webtext corpus that treats each
    page of a 5-page article as its own document double-counts
    boilerplate and splits the text mid-sentence).

    ``pages``: (url, next_url nullable).  A SERIES starts at a page no
    other page points to; each round extends every unfinished chain by
    one hop.  Cycle defense is row-local: a next already in the chain
    ends the series there (flagged ``cycle``), so a malicious
    next-loop terminates without burning the hop budget.  Chains
    still unfinished at ``max_hops`` end flagged ``truncated``.

    Output: (series, n_pages, chain, status) with ``chain`` the
    '|'-joined page URLs in reading order and status in
    {complete, cycle, truncated}.

    Scale shape: the trace_redirects delta discipline — each round
    joins only the UNFINISHED chains against the (url -> next) table
    (frontier-sized shuffles, geometric shrink), lineage truncated per
    round, one bounded isEmpty probe per round."""
    p = pages.select(
        F.col(url_col).alias("url"), F.col(next_col).alias("next"),
    ).localCheckpoint(eager=True)
    targets = p.filter(F.col("next").isNotNull()) \
        .select(F.col("next").alias("url")).distinct()
    starts = p.join(targets, "url", "left_anti")
    state = starts.select(
        F.col("url").alias("series"),
        F.col("next").alias("cur"),
        F.array(F.col("url")).alias("chain"),
        F.when(F.col("next").isNull(), F.lit("complete"))
        .otherwise(F.lit(None).cast("string")).alias("status"),
    ).localCheckpoint(eager=True)
    for _ in range(max_hops):
        open_ = state.filter(F.col("status").isNull())
        if open_.isEmpty():
            break
        done = state.filter(F.col("status").isNotNull())
        stepped = (
            open_.join(p, open_.cur == p.url, "left")
            .select(
                "series",
                F.col("next").alias("_nxt"),
                F.concat(F.col("chain"), F.array(F.col("cur")))
                .alias("chain"),
            )
            .select(
                "series", "chain",
                F.when(F.col("_nxt").isNull(), F.lit("complete"))
                .when(F.array_contains(F.col("chain"), F.col("_nxt")),
                      F.lit("cycle"))
                .otherwise(F.lit(None).cast("string")).alias("status"),
                F.col("_nxt").alias("cur"),
            )
        )
        state = done.select("series", "cur", "chain", "status").unionByName(
            stepped.select("series", "cur", "chain", "status")
        ).localCheckpoint(eager=True)
    state = state.withColumn(
        "status", F.coalesce("status", F.lit("truncated")))
    return state.select(
        "series",
        F.size("chain").cast("long").alias("n_pages"),
        F.array_join("chain", "|").alias("chain"),
        "status",
    )


# --- client-side (meta refresh / JS) redirects --------------------------
#
# The HTTP redirect plane above only sees 3xx hops; real sites also
# redirect client-side, and search engines treat an immediate
# meta-refresh or scripted location change as a "sneaky redirect"
# (classic cloaking vector).  A crawler that ignores them both misses
# content (the target never enters the frontier) and mis-attributes it
# (text indexed under the redirecting URL).  All regexes are RE2-safe
# so the DuckDB oracle replays the identical extraction.

_META_REFRESH_EL = r"(?i)<meta\b[^>]*http-equiv\s*=\s*[\"']?refresh[\"']?[^>]*>"
# content= value split by quote style: a double-quoted attr may carry
# single quotes inside (content="5;URL='/x'"), so a joint [^"'] class
# would truncate it — try double-quoted first, then single-quoted.
_CONTENT_ATTR_DQ = r'(?i)content\s*=\s*"([^">]*)"'
_CONTENT_ATTR_SQ = r"(?i)content\s*=\s*'([^'>]*)'"
_REFRESH_DELAY = r"^\s*(\d+)"
_REFRESH_URL = r"(?i)url\s*=\s*[\"']?\s*([^\"' >;]+)"
# leading \b: without it, prose like "memory allocation = 'dynamic'"
# or calls on geolocation objects match as sneaky redirects (review
# finding, runtime-confirmed)
_JS_ASSIGN = (
    r"(?i)\b(?:window\.|document\.|top\.)?location(?:\.href)?"
    r"\s*=\s*[\"']([^\"']+)[\"']"
)
_JS_REPLACE = r"(?i)\blocation\.replace\(\s*[\"']([^\"']+)[\"']\s*\)"


def client_redirects(
    pages: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html_text",
) -> DataFrame:
    """Client-side redirect extraction: one row per detected signal.

    Signals (first occurrence each, which is what browsers honor):

    * ``meta`` — ``<meta http-equiv=refresh content="N; url=T">``,
      either attribute order, optionally quoted target, delay
      defaulting to 0 when the content string leads with ``url=``.
      A delay-only refresh (no url= part) reloads self — not a
      redirect, no row.
    * ``js`` — ``[window.]location[.href] = '...'`` assignment or
      ``location.replace('...')``.

    Targets resolve with the anchor-plane policy (extract.
    anchor_pairs_col): absolute http(s) kept, root-relative joined
    onto the page's scheme+host, anything else → ``target_abs`` NULL.
    ``sneaky`` flags what search engines penalize: any scripted
    redirect, or a meta refresh with delay ≤ 1 s.

    Output: (id, url, kind, delay, target, target_abs, sneaky).
    Shape: pure whole-stage-codegen projections + one explode of a
    ≤2-element array — zero shuffles, zero Python.
    """
    html = F.col(html_col)
    root = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)

    el = F.regexp_extract(html, _META_REFRESH_EL, 0)
    content = F.coalesce(
        F.nullif(F.regexp_extract(el, _CONTENT_ATTR_DQ, 1), F.lit("")),
        F.nullif(F.regexp_extract(el, _CONTENT_ATTR_SQ, 1), F.lit("")),
        F.lit(""),
    )
    meta_tgt = F.nullif(F.regexp_extract(content, _REFRESH_URL, 1), F.lit(""))
    meta_delay = F.coalesce(
        F.nullif(F.regexp_extract(content, _REFRESH_DELAY, 1), F.lit(""))
        .cast("long"),
        F.lit(0),
    )
    js_tgt = F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(html, _JS_ASSIGN, 1), F.lit("")),
            F.nullif(F.regexp_extract(html, _JS_REPLACE, 1), F.lit("")),
        ),
        F.lit(""),
    )

    def _sig(kind: str, tgt: F.Column, delay: F.Column) -> F.Column:
        return F.struct(
            F.lit(kind).alias("kind"),
            delay.cast("long").alias("delay"),
            tgt.alias("target"),
        )

    sigs = F.filter(
        F.array(
            _sig("meta", meta_tgt, meta_delay),
            _sig("js", js_tgt, F.lit(0)),
        ),
        lambda s: s.getField("target").isNotNull(),
    )
    out = pages.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        root.alias("_root"),
        F.explode(sigs).alias("s"),
    )
    tgt = F.col("s.target")
    abs_ = (
        F.when(tgt.rlike(r"^https?://"), tgt)
        .when(tgt.startswith("/"), F.concat(F.col("_root"), tgt))
        .otherwise(F.lit(None).cast("string"))
    )
    return out.select(
        "id", "url",
        F.col("s.kind").alias("kind"),
        F.col("s.delay").alias("delay"),
        tgt.alias("target"),
        abs_.alias("target_abs"),
        F.when(
            (F.col("s.kind") == "js") | (F.col("s.delay") <= 1), F.lit(1)
        ).otherwise(F.lit(0)).cast("long").alias("sneaky"),
    )
