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


def _json_escape(c: Column) -> Column:
    # backslash first, then quote — the two escapes JSON requires for the
    # URL/title value domain this module handles (control chars in a
    # Target-URI or <title> are already stripped by the extract plane).
    return F.regexp_replace(
        F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\\"')


def render_wat(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """WAT metadata-sidecar records — the third Common-Crawl archive
    artifact beside .warc (responses, :func:`render_warc`) and .wet
    (extracted text, :func:`render_wet`): one ``WARC-Type: metadata``
    record per page whose JSON payload carries the response's header
    metadata plus HTML metadata (``<title>``, outgoing ``<a href>``
    links in document order), so link-graph and catalog consumers never
    touch the response bytes.

    The payload is canonical compact JSON with keys in sorted order
    (the house json_canon contract), built entirely from codegen
    string/regexp ops — title via one ``regexp_extract``, links via
    ``regexp_extract_all`` + ``transform`` + ``array_join``, values
    JSON-escaped for backslash/quote.  Missing title renders as ``""``
    and a linkless page as ``[]`` (deviation from CC's key-omission,
    documented here, so the record schema stays fixed-shape for
    downstream parquet).  Same CRLF framing and byte-counted
    Content-Length as the other two renderers; pure projection, zero
    exchange, zero Python.  Reference never emits archives (Scrapy
    pipelines, reference ``crawler/pipelines.py``) — this is the
    batch-engine storage plane the 100-TB tier needs.
    """
    html = F.decode(F.col(html_col), "utf-8")
    title = _json_escape(
        F.regexp_extract(html, r"(?s)<title>(.*?)</title>", 1))
    links = F.regexp_extract_all(html, F.lit(r'<a href="([^"]*)"'), 1)
    links_json = F.concat(
        F.lit("["),
        F.array_join(
            F.transform(
                links,
                lambda u: F.concat(
                    F.lit('{"url":"'), _json_escape(u), F.lit('"}'))),
            ","),
        F.lit("]"),
    )
    dt = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    payload = F.concat(
        F.lit('{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
              '{"HTML-Metadata":{"Links":'),
        links_json,
        F.lit(',"Title":"'), title,
        F.lit('"}}},"WARC-Header-Metadata":{"WARC-Date":"'), dt,
        F.lit('","WARC-Target-URI":"'), F.col(url_col),
        F.lit('","WARC-Type":"response"}}}'),
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "), dt,
        F.lit("\r\nContent-Type: application/json\r\nContent-Length: "),
        F.length(F.encode(payload, "utf-8")).cast("string"),
        F.lit("\r\n\r\n"), payload,
    )
    return df.select(
        *[F.col(c) for c in keep], F.encode(record, "utf-8").alias("record"))


def gzip_member_files(
    df: DataFrame,
    file_col: str = "file_id",
    record_col: str = "record",
) -> DataFrame:
    """The writer half of Common Crawl's ``.warc.gz`` framing: group
    records by ``file_col`` and emit ONE binary blob per file made of
    CONCATENATED GZIP MEMBERS — one member per record, deterministic
    record order (lexicographic by raw record bytes), mtime=0 so the
    bytes are reproducible.  This member-per-record layout is what
    makes CC archives randomly addressable: a CDX row's
    (offset, length) slice of the file is a self-contained gzip
    stream.

    Arrow-batched ``applyInPandas`` (gzip itself is Python's zlib —
    there is no JVM-side expression for it); one keyed shuffle on the
    file assignment, the same shape any archive writer needs.  The
    output file column keeps ``file_col``'s name and type."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import gzip as _gzip

        # join once at the end — += over immutable bytes is quadratic
        # in member count (CC shards carry ~50k members per file)
        blob = b"".join(
            _gzip.compress(bytes(rec), compresslevel=6, mtime=0)
            for rec in sorted(pdf[record_col], key=bytes)
        )
        return pd.DataFrame(
            {file_col: [pdf[file_col].iloc[0]], "content": [blob]}
        )

    ftype = df.schema[file_col].dataType.simpleString()
    return df.groupBy(file_col).applyInPandas(
        pack, f"{file_col} {ftype}, content binary"
    )


def split_warc_gz_members(
    df: DataFrame,
    content_col: str = "content",
    keep: tuple[str, ...] = ("file_id",),
) -> DataFrame:
    """The reader half: split a ``.warc.gz`` blob (one binary column,
    e.g. from ``spark.read.format('binaryFile')``) into its gzip
    members and decompress each — one output row per WARC record:
    ``(*keep, member_no, offset, comp_length, record, split_err)``.

    ``offset``/``comp_length`` delimit the member INSIDE the blob —
    exactly the (offset, length) pair a CDX index records, so
    ``content[offset : offset+comp_length]`` gunzips standalone
    (pytest-asserted).  Decompression walks ``zlib.decompressobj``'s
    ``unused_data`` chain — sequential per file by gzip's nature, but
    embarrassingly parallel ACROSS files, which is how a 100-TB
    archive scales (CC shards are ~1 GB each; parallelism = file
    count).  ``keep`` columns keep their input types.

    Corruption policy (the media-plane decode_err contract): a corrupt
    or torn member becomes a ``split_err`` row (NULL record) covering
    the damaged byte range, and the walk RESYNCS at the next gzip
    magic (``1f 8b 08``) so one flipped bit cannot silently drop the
    rest of a 50k-member shard — a false-positive magic inside
    compressed data just fails the next decompress and the scan
    continues.  Good rows carry ``split_err`` NULL."""
    import pandas as pd

    MAGIC = b"\x1f\x8b\x08"

    def split(batches):
        import zlib as _zlib

        for pdf in batches:
            out: dict = {k: [] for k in keep}
            out.update({"member_no": [], "offset": [],
                        "comp_length": [], "record": [],
                        "split_err": []})

            def emit(row, member, pos, length, rec, err):
                for k in keep:
                    out[k].append(row[k])
                out["member_no"].append(member)
                out["offset"].append(pos)
                out["comp_length"].append(length)
                out["record"].append(rec)
                out["split_err"].append(err)

            for _, row in pdf.iterrows():
                data = bytes(row[content_col])
                pos = 0
                member = 0
                while pos < len(data):
                    d = _zlib.decompressobj(wbits=31)
                    err = None
                    try:
                        rec = d.decompress(data[pos:])
                        rec += d.flush()
                        if not d.eof:
                            err = "torn gzip member (no trailer)"
                    except _zlib.error as e:
                        err = f"corrupt gzip member: {e}"
                    if err is None:
                        consumed = len(data) - pos - len(d.unused_data)
                        if consumed <= 0:
                            err = "empty gzip member"
                    if err is not None:
                        # resync at the next member magic; the error
                        # row covers the skipped byte range
                        nxt = data.find(MAGIC, pos + 1)
                        end = nxt if nxt >= 0 else len(data)
                        emit(row, member, pos, end - pos, None, err)
                        member += 1
                        if nxt < 0:
                            break
                        pos = nxt
                        continue
                    emit(row, member, pos, consumed, rec, None)
                    member += 1
                    pos += consumed
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"{k} {df.schema[k].dataType.simpleString()}" for k in keep]
        + ["member_no long", "offset long", "comp_length long",
           "record binary", "split_err string"]
    )
    return df.mapInPandas(split, schema)
