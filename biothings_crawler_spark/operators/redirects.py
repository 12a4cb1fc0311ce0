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
