"""CDX index generation — the byte-offset lookup artifact for a WARC
archive (Internet Archive / Common Crawl convention).

A 100-TB crawl archive is useless without random access: "give me the
record for this URL" must not scan a petabyte.  The CDX index solves
it with one line per archived response —

    <surt> <ts14> <url> <mime> <status> <digest> <length> <offset> <file>

— where ``offset``/``length`` locate the raw record inside its WARC
file, so a reader seeks straight to it.  The reference crawler never
builds one (Scrapy pushes items to Elasticsearch, reference
``crawler/pipelines.py``), but a batch engine whose sink IS a WARC
archive needs the index as a first-class output.

Shape at scale: offsets are a RUNNING SUM of record sizes within one
WARC file, so the window partitions on the file name — thousands of
~1 GB files give thousands of independent partitions, each a bounded
(~50k-row) sorted run; no global sort, no skew (file sizes are capped
by the writer).  Every field is codegen string/regex work off the raw
record; the only exchange is the hash partition by file.

Digest note: real CDX uses SHA1-Base32; this engine standardizes on
md5 hex (its one cross-engine-exact hash primitive — see
``testing.frame_digest``), documented here rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..urlnorm import surt_key_col

# HTTP response payloads: status line + Content-Type header
_STATUS_RE = r"^HTTP/[0-9.]+ ([0-9]{3})"
_MIME_RE = r"(?m)^Content-Type: ([^;\r\n]+)"

# WARC records are stored back-to-back, each followed by two CRLFs
# (the record trailer mandated by the WARC spec) — 4 bytes the offset
# arithmetic must count even though parse_warc_records never sees them.
RECORD_TRAILER_BYTES = 4


def cdx_index(
    df: DataFrame,
    file_col: str = "warc_file",
    pos_col: str = "pos",
    record_col: str = "record",
) -> DataFrame:
    """Raw WARC records ``(warc_file, pos, record)`` -> CDX lines.

    ``pos`` is the record's ordinal within its file (the writer's
    sequence number).  Offsets accumulate over ALL records in file
    order — request/metadata records occupy bytes too — but only
    ``response`` records with a target URI get index lines, per the
    CDX convention.

    Columns out: ``surt, ts14, url, mime, status, digest, length,
    offset, warc_file`` — ``length`` includes the 4-byte record
    trailer; ``offset`` is 0-based from the start of the file.
    """
    t = F.decode(F.col(record_col), "utf-8")
    hdr = F.regexp_extract(t, r"(?s)^(.*?)\r\n\r\n", 1)
    payload = F.regexp_replace(t, r"(?s)^.*?\r\n\r\n", "")
    size = (F.length(F.col(record_col)) + F.lit(RECORD_TRAILER_BYTES))

    w = Window.partitionBy(file_col).orderBy(pos_col)
    rows = df.select(
        F.col(file_col),
        F.col(pos_col),
        size.alias("length"),
        (F.sum(size).over(w) - size).alias("offset"),
        F.when(F.regexp_extract(hdr, r"(?m)^WARC-Type: ([^\r\n]+)", 1) != "",
               F.regexp_extract(hdr, r"(?m)^WARC-Type: ([^\r\n]+)", 1))
        .alias("warc_type"),
        F.when(F.regexp_extract(hdr, r"(?m)^WARC-Target-URI: ([^\r\n]+)", 1) != "",
               F.regexp_extract(hdr, r"(?m)^WARC-Target-URI: ([^\r\n]+)", 1))
        .alias("url"),
        F.regexp_extract(hdr, r"(?m)^WARC-Date: ([^\r\n]+)", 1).alias("warc_date"),
        F.when(F.regexp_extract(payload, _STATUS_RE, 1) != "",
               F.regexp_extract(payload, _STATUS_RE, 1)).alias("status"),
        F.when(F.regexp_extract(payload, _MIME_RE, 1) != "",
               F.regexp_extract(payload, _MIME_RE, 1)).alias("mime"),
        F.md5(F.encode(payload, "utf-8")).alias("digest"),
    )
    ts14 = F.regexp_replace(F.col("warc_date"), r"[^0-9]", "")
    return (
        rows.filter((F.col("warc_type") == "response") & F.col("url").isNotNull())
        .select(
            surt_key_col(F.col("url")).alias("surt"),
            ts14.alias("ts14"),
            "url", "mime", "status", "digest", "length", "offset", file_col,
        )
    )


def cdx_lines(cdx: DataFrame) -> DataFrame:
    """Render the 9-field space-joined CDX text line (one string
    column ``line``), sorted by (surt, ts14) — the on-disk order that
    makes URL lookup a binary search / range scan."""
    return (
        cdx.select(F.concat_ws(
            " ", "surt", "ts14", "url", "mime", "status", "digest",
            F.col("length").cast("string"), F.col("offset").cast("string"),
            "warc_file",
        ).alias("line"), "surt", "ts14")
        .sort("surt", "ts14")
        .select("line")
    )


def cdx_revisits(cdx: DataFrame) -> DataFrame:
    """Identical-payload-digest deduplication across captures — the
    WARC ``revisit`` record convention (Internet Archive / Heritrix):
    when a URL is re-fetched and the payload digest matches ANY prior
    capture, the archive stores a slim revisit record pointing at the
    original instead of the payload bytes (30-50% of a recrawl's
    volume on stable sites).

    For each capture: ``is_revisit`` plus the original's location
    (``refers_to_file``/``refers_to_offset`` — the WARC-Refers-To
    fields).  One window over (surt, digest) ordered by capture time:
    row 1 is the original, every later row a revisit.  Scale shape:
    the partition key includes the DIGEST, so state per window is the
    capture count of one URL *version* — bounded by recrawl frequency,
    never by corpus size; hot URLs with changing content split across
    digests.
    """
    w = (
        Window.partitionBy("surt", "digest")
        .orderBy("ts14", "warc_file", "offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cdx.select(
        "surt", "ts14", "url", "digest", "length", "offset", "warc_file",
        (F.row_number().over(
            Window.partitionBy("surt", "digest")
            .orderBy("ts14", "warc_file", "offset")) > 1).alias("is_revisit"),
        F.first("warc_file").over(w).alias("refers_to_file"),
        F.first("offset").over(w).alias("refers_to_offset"),
    )


def revisit_savings(marked: DataFrame) -> DataFrame:
    """Storage saved by revisit records, per WARC file: bytes of
    payload NOT rewritten.  Plain hash aggregation over the marked
    capture table."""
    return (
        marked.groupBy("warc_file")
        .agg(
            F.count("*").alias("n_captures"),
            F.sum(F.col("is_revisit").cast("int")).alias("n_revisits"),
            F.sum(F.when(F.col("is_revisit"), F.col("length"))
                  .otherwise(F.lit(0))).alias("saved_bytes"),
        )
    )


def cdx_from_members(
    records: DataFrame,
    file_col: str = "file_id",
) -> DataFrame:
    """CDX index for a COMPRESSED (.warc.gz) archive — the framing
    Common Crawl actually serves.  Input is
    :func:`..warc.split_warc_gz_members` output
    ``(*, member_no, offset, comp_length, record)``: here
    ``offset``/``length`` are the gzip member's position in the .gz
    file (NOT uncompressed-stream arithmetic), so a reader satisfies a
    CDX row with one ranged GET + standalone gunzip — the CC access
    pattern.

    Better scale shape than :func:`cdx_index`: the offsets come free
    from the member walk, so there is NO window at all — pure
    projection + filter over the already-split records.  Same columns
    out: ``surt, ts14, url, mime, status, digest, length, offset,
    warc_file``.  Header patterns are the parser's own (sources/warc)
    so a header-format fix there applies to the index too; split_err
    rows (NULL record) regex to NULL url and fall out of the response
    filter."""
    from .warc import _DATE_RE, _HDR_RE, _TYPE_RE, _URI_RE, _nullif_empty

    t = F.decode(F.col("record"), "utf-8")
    hdr = F.regexp_extract(t, _HDR_RE, 1)
    payload = F.regexp_replace(t, r"(?s)^.*?\r\n\r\n", "")
    rows = records.select(
        F.col(file_col).cast("string").alias("warc_file"),
        F.col("comp_length").alias("length"),
        F.col("offset"),
        F.regexp_extract(hdr, _TYPE_RE, 1).alias("warc_type"),
        _nullif_empty(F.regexp_extract(hdr, _URI_RE, 1)).alias("url"),
        F.regexp_extract(hdr, _DATE_RE, 1).alias("warc_date"),
        _nullif_empty(F.regexp_extract(payload, _STATUS_RE, 1))
        .alias("status"),
        _nullif_empty(F.regexp_extract(payload, _MIME_RE, 1)).alias("mime"),
        F.md5(F.encode(payload, "utf-8")).alias("digest"),
    )
    ts14 = F.regexp_replace(F.col("warc_date"), r"[^0-9]", "")
    return (
        rows.filter((F.col("warc_type") == "response")
                    & F.col("url").isNotNull())
        .select(
            surt_key_col(F.col("url")).alias("surt"),
            ts14.alias("ts14"),
            "url", "mime", "status", "digest", "length", "offset",
            "warc_file",
        )
    )
