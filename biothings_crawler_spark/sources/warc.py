"""WARC record parsing — Common-Crawl-style ingestion, pure codegen.

BASELINE.json's input_hint frames the engine's input as an Iceberg
table of Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``.
Upstream of that table sits the raw WARC record: a CRLF-terminated
header block (``WARC/1.0``, ``WARC-Type``, ``WARC-Target-URI``,
``WARC-Date``, ``Content-Length``), a blank line, then the payload —
for ``response`` records an HTTP message whose own header block
precedes the html body.

The reference never parses WARC (Scrapy speaks live HTTP — reference
``crawler/spiders/*`` fetch per-request), but a batch engine fed from
a crawl archive must, and at 100 TB the parse has to stay JVM-side:
every field here is a ``regexp_extract`` / ``regexp_replace`` over the
decoded record — no Python, no splitting into intermediate arrays, one
narrow projection.  All patterns are RE2-safe so the DuckDB oracle
runs the identical pipeline.

Scale notes: a WARC ingest at 100 TB is scan-bound; this projection
pipelines inside whole-stage codegen with zero exchanges.  Records
ride as one ``binary`` column (never pre-split — Spark's parquet
reader streams them); malformed records degrade to NULL fields rather
than failing the task, and :func:`warc_pages` drops them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# header values end at CR/LF — (?m)^ anchors after \n in both Java and RE2
_URI_RE = r"(?m)^WARC-Target-URI: ([^\r\n]+)"
_TYPE_RE = r"(?m)^WARC-Type: ([^\r\n]+)"
_DATE_RE = r"(?m)^WARC-Date: ([^\r\n]+)"
_CLEN_RE = r"(?m)^Content-Length: ([0-9]+)"
_BLOCK_RE = r"(?s)^.*?\r\n\r\n"  # everything through the first blank line
_HDR_RE = r"(?s)^(.*?)\r\n\r\n"  # the header block itself (group 1)


def _nullif_empty(c: Column) -> Column:
    return F.when(c != "", c)


def parse_warc_records(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Parse raw WARC records into
    ``(url, warc_type, warc_ts_us, content_length, payload)``.

    * ``warc_ts_us`` — epoch microseconds of ``WARC-Date``
      (``yyyy-MM-ddTHH:mm:ssZ``; the session runs UTC so the integer is
      timezone-stable and DuckDB's ``epoch_us(strptime(...))`` matches
      exactly).
    * ``payload`` — everything after the WARC header block's blank
      line, undecoded further (response records still carry their HTTP
      header block; :func:`warc_pages` strips it).
    * Missing headers yield NULL, never a task failure — at archive
      scale a few torn records per shard are a certainty.
    """
    t = F.decode(F.col(record_col), "utf-8")
    hdr = F.regexp_extract(t, _HDR_RE, 1)
    date = _nullif_empty(F.regexp_extract(hdr, _DATE_RE, 1))
    return df.select(
        _nullif_empty(F.regexp_extract(hdr, _URI_RE, 1)).alias("url"),
        _nullif_empty(F.regexp_extract(hdr, _TYPE_RE, 1)).alias("warc_type"),
        F.unix_micros(F.to_timestamp(date, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .alias("warc_ts_us"),
        _nullif_empty(F.regexp_extract(hdr, _CLEN_RE, 1)).cast("long")
        .alias("content_length"),
        F.regexp_replace(t, _BLOCK_RE, "").alias("payload"),
    )


def warc_pages(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Response records -> the input_hint page shape
    ``(url, warc_ts_us, content_length, html)``.

    Keeps only ``WARC-Type: response`` rows with a target URI, and
    strips the payload's HTTP header block (status line + headers up
    to the blank line) leaving the html body.  A payload that carries
    no HTTP header block passes through unchanged.
    """
    rec = parse_warc_records(df, record_col)
    body = F.when(
        F.col("payload").rlike(r"^HTTP/[0-9.]+ "),
        F.regexp_replace(F.col("payload"), _BLOCK_RE, ""),
    ).otherwise(F.col("payload"))
    return (
        rec.filter((F.col("warc_type") == "response") & F.col("url").isNotNull())
        .select("url", "warc_ts_us", "content_length", body.alias("html"))
    )


def render_warc(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    status_col: str | None = None,
    mime: str = "text/html",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """The writer half of the archive loop: pages -> framed WARC
    response records (one binary ``record`` column), the exact shape
    :func:`parse_warc_records` reads back — roundtrip is
    pytest-asserted.

    Framing per the WARC 1.0 convention this module parses: version
    line, ``WARC-Type: response``, Target-URI, ``WARC-Date`` (ISO-8601
    UTC seconds), ``Content-Length`` counting the HTTP payload BYTES
    (an HTTP status/Content-Type block + the body), blank line,
    payload.  Entirely codegen string/byte ops — zero exchange, zero
    Python; at 100 TB this projection feeds a
    ``repartitionByRange(surt)`` writer and :mod:`.cdx` indexes the
    files as they land.
    """
    body = F.decode(F.col(html_col), "utf-8")
    status = (
        F.col(status_col).cast("string") if status_col else F.lit("200 OK")
    )
    payload = F.concat(
        F.lit("HTTP/1.1 "), status, F.lit("\r\nContent-Type: "), F.lit(mime),
        F.lit("\r\n\r\n"), body,
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("\r\nContent-Length: "),
        F.length(F.encode(payload, "utf-8")).cast("string"),
        F.lit("\r\n\r\n"), payload,
    )
    # ``keep`` passes writer metadata (file assignment, sequence
    # number) through to the indexing stage — still a pure projection.
    return df.select(
        *[F.col(c) for c in keep], F.encode(record, "utf-8").alias("record"))


def render_wet(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """WET conversion records — the Common-Crawl companion artifact to
    the WARC response archive: one ``WARC-Type: conversion`` record per
    page carrying the EXTRACTED PLAIN TEXT (no HTTP block), so text
    consumers never re-parse HTML.  Pairs with
    :func:`render_warc` (responses) the way CC's .warc/.wet files pair;
    ``operators/extract.html_to_text_col`` produces the text column.

    Same CRLF framing contract as the parser; Content-Length counts
    the UTF-8 text bytes.  Pure codegen projection — zero exchange,
    zero Python."""
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("string"),
        F.lit("\r\n\r\n"), F.col(text_col),
    )
    return df.select(
        *[F.col(c) for c in keep], F.encode(record, "utf-8").alias("record"))
