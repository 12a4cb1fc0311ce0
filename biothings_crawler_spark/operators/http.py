"""HTTP response-layer operators: charset sniffing and cache-policy
TTLs.

The reference crawler delegates both to Scrapy's response machinery
(reference ``crawler/spiders`` never touch encodings or caching
explicitly); a batch engine ingesting raw archived bytes has to make
them first-class columns.  Both operators are pure codegen
regex/arithmetic projections — zero exchange, zero Python — so at
100 TB they ride the ingest scan for free.

``sniff_charset`` follows the WHATWG encoding-sniffing precedence
(https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding),
simplified to the layers a batch pipeline can honor:

1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE),
2. ``charset=`` parameter of the Content-Type header,
3. ``<meta charset>`` / ``<meta http-equiv=content-type>`` inside the
   first ``prefix_bytes`` of the body (the spec's prescan window),
4. the caller's default (HTML5's legacy default is windows-1252).

Labels are lowercased and folded through the WHATWG alias table's
high-traffic rows (``iso-8859-1``/``latin1`` -> ``windows-1252``,
``utf8`` -> ``utf-8``) — enough to make downstream decode dispatch on
a small closed set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# WHATWG alias table, high-traffic rows only.
_ALIASES: dict[str, str] = {
    "utf8": "utf-8",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
}

_CT_RE = r"""(?i)charset\s*=\s*["']?([A-Za-z0-9_.:-]+)"""
_META_RE = (
    r"""(?i)<meta[^>]{0,200}?charset\s*=\s*["']?([A-Za-z0-9_.:-]+)"""
)


def _fold(label: Column) -> Column:
    # ONE map-literal lookup, not a when-chain: chained
    # when(x==k).otherwise(prev) references the previous expression
    # twice per alias, doubling the Catalyst tree each row of the
    # table (2^9 subtrees here — blows past Janino's 64KB method
    # limit and drops the projection to interpreted).
    alias_map = F.create_map(
        *[F.lit(x) for kv in _ALIASES.items() for x in kv])
    low = F.lower(label)
    return F.coalesce(F.element_at(alias_map, low), low)


def sniff_charset(
    df: DataFrame,
    html_col: str = "html",
    content_type_col: str = "content_type",
    default: str = "windows-1252",
    prefix_bytes: int = 1024,
) -> DataFrame:
    """Add ``charset`` (folded label) and ``charset_source`` (``bom`` /
    ``header`` / ``meta`` / ``default``) columns.

    The meta prescan decodes the first ``prefix_bytes`` as ISO-8859-1
    — a byte-preserving decode every byte sequence survives — so the
    regex never sees a decode error; BOM detection compares the hex of
    the first bytes, never decoding them.
    """
    head3 = F.hex(F.expr(f"substring({html_col}, 1, 3)"))
    head2 = F.hex(F.expr(f"substring({html_col}, 1, 2)"))
    prescan = F.decode(
        F.expr(f"substring({html_col}, 1, {int(prefix_bytes)})"), "ISO-8859-1"
    )
    hdr = F.regexp_extract(F.coalesce(F.col(content_type_col), F.lit("")),
                           _CT_RE, 1)
    meta = F.regexp_extract(prescan, _META_RE, 1)
    charset = (
        F.when(head3 == "EFBBBF", F.lit("utf-8"))
        .when(head2 == "FFFE", F.lit("utf-16le"))
        .when(head2 == "FEFF", F.lit("utf-16be"))
        .when(hdr != "", _fold(hdr))
        .when(meta != "", _fold(meta))
        .otherwise(F.lit(default))
    )
    source = (
        F.when((head3 == "EFBBBF") | head2.isin("FFFE", "FEFF"), F.lit("bom"))
        .when(hdr != "", F.lit("header"))
        .when(meta != "", F.lit("meta"))
        .otherwise(F.lit("default"))
    )
    return df.withColumn("charset", charset).withColumn(
        "charset_source", source)


# ---------------------------------------------------------------------------

_MAXAGE_RE = r"(?i)(?:^|[,\s])max-age\s*=\s*([0-9]+)"
_SMAXAGE_RE = r"(?i)(?:^|[,\s])s-maxage\s*=\s*([0-9]+)"
_NOSTORE_RE = r"(?i)(?:^|[,\s])(?:no-store|no-cache)(?:$|[,\s=])"


def cache_ttl(
    df: DataFrame,
    cache_control_col: str = "cache_control",
    age_col: str | None = "age_s",
    fetch_ts_us_col: str = "fetch_ts_us",
    default_ttl_s: int = 86_400,
) -> DataFrame:
    """Server-declared revalidation horizon per response (RFC 9111
    freshness model, shared-cache view):

    * ``no-store`` / ``no-cache`` -> TTL 0 (always refetch),
    * ``s-maxage`` overrides ``max-age`` (we are a shared cache),
    * remaining freshness is reduced by the ``Age`` header,
    * no directive at all -> ``default_ttl_s`` (heuristic freshness).

    Adds ``ttl_s`` and ``stale_at_us`` (fetch time + TTL) — the column
    adaptive recrawl scheduling (operators/recrawl.py) clamps its
    model-driven intervals against: a crawler may revisit LATER than
    the server allows, never assume freshness LONGER than declared.
    Pure row-local regex + integer arithmetic.
    """
    cc = F.coalesce(F.col(cache_control_col), F.lit(""))
    no_store = cc.rlike(_NOSTORE_RE)
    smax = F.regexp_extract(cc, _SMAXAGE_RE, 1)
    maxage = F.regexp_extract(cc, _MAXAGE_RE, 1)
    declared = (
        F.when(no_store, F.lit(0))
        .when(smax != "", smax.cast("long"))
        .when(maxage != "", maxage.cast("long"))
        .otherwise(F.lit(int(default_ttl_s)))
    )
    age = (
        F.coalesce(F.col(age_col).cast("long"), F.lit(0))
        if age_col else F.lit(0)
    )
    ttl = F.greatest(F.lit(0), declared - age)
    return df.withColumn("ttl_s", ttl.cast("long")).withColumn(
        "stale_at_us",
        (F.col(fetch_ts_us_col) + F.col("ttl_s") * F.lit(1_000_000))
        .cast("long"),
    )


# ---------------------------------------------------------------------------

# ASCII magic prefixes detectable cross-engine; binary magics (PNG
# \x89PNG, gzip \x1f\x8b) are hex-checked Spark-side and pytest-only
# (their bytes can't live in a DuckDB VARCHAR fixture).
_ASCII_MAGICS = ("%PDF", "GIF8", "PK\x03\x04")


def fetch_quality(
    df: DataFrame,
    status_col: str = "status",
    content_type_col: str = "content_type",
    content_length_col: str = "content_length",
    body_col: str = "body",
) -> DataFrame:
    """Per-fetch hygiene flags — the checks that keep garbage out of
    the corpus before any text operator spends cycles on it:

    * ``truncated``: body shorter than the declared Content-Length
      (connection cut mid-transfer — the page must be refetched, not
      indexed);
    * ``empty_body``: zero bytes;
    * ``mime_mismatch``: declared text/html but the body leads with a
      known non-HTML magic (%PDF, GIF8, ZIP/OOXML, PNG, gzip) —
      mislabeled binary that would poison text extraction;
    * ``status_class``: 2xx/3xx/4xx/5xx bucket;
    * ``ok``: 2xx ∧ none of the above.

    Row-local byte/arithmetic projection, zero exchange, zero Python.
    """
    body_bytes = F.length(F.col(body_col))
    head4 = F.decode(F.expr(f"substring({body_col}, 1, 4)"), "ISO-8859-1")
    hex4 = F.hex(F.expr(f"substring({body_col}, 1, 4)"))
    is_htmlish = F.lower(F.coalesce(F.col(content_type_col), F.lit(""))).rlike(
        r"text/html|application/xhtml")
    magic = (
        head4.isin(*_ASCII_MAGICS)
        | hex4.startswith("89504E47")   # PNG
        | hex4.startswith("1F8B")       # gzip
    )
    truncated = (
        F.col(content_length_col).isNotNull()
        & (body_bytes < F.col(content_length_col))
    )
    status_class = F.concat(
        F.floor(F.col(status_col) / 100).cast("int").cast("string"),
        F.lit("xx"))
    return df.select(
        *df.columns,
        body_bytes.cast("long").alias("body_bytes"),
        status_class.alias("status_class"),
        truncated.alias("truncated"),
        (body_bytes == 0).alias("empty_body"),
        (is_htmlish & magic).alias("mime_mismatch"),
        ((F.col(status_col) >= 200) & (F.col(status_col) < 300)
         & ~truncated & (body_bytes > 0) & ~(is_htmlish & magic)).alias("ok"),
    )


def dechunk_col(body: Column, max_chunks: int = 24) -> Column:
    """Decode an HTTP/1.1 chunked Transfer-Encoding body (RFC 9112
    §7.1) to ``struct(ok boolean, text string)`` — ``text`` is the
    concatenated chunk data iff the framing is valid end-to-end
    (every size line parses, every chunk is terminated by CRLF, and
    the final ``0`` chunk is present); otherwise ``(false, NULL)``.

    One bounded expression fold (``aggregate`` over
    ``sequence(1, max_chunks)``): each step reads the hex size line at
    the cursor (chunk extensions after ``;`` are ignored, per spec),
    validates the chunk's CRLF terminator, appends the data, and
    advances.  Trailers after the last chunk are ignored.  All
    relative arithmetic happens on ``substr(body, pos)`` so only the
    cursor is absolute.  Row-local, zero exchange, zero Python.

    Contract notes for scale: sizes are CHARACTER counts — exact for
    single-byte payloads (the transfer framing itself is ASCII; pair
    with charset decode downstream).  ``max_chunks`` bounds the fold:
    bodies with more chunks report ``ok = false`` rather than silently
    truncating (the driver pair plants a body at the bound to pin
    that).  Size lines longer than 7 hex digits (>256 MiB chunks) fail
    the terminator check by construction.
    """
    crlf = "\r\n"

    def step(acc: Column, _i: Column) -> Column:
        p = acc["pos"]
        rest = F.substring(body, p, F.length(body) - p + 1)
        le = F.locate(crlf, rest)  # 1-based, 0 = not found
        line = F.substring(rest, F.lit(1), le - 1)
        hexs = F.regexp_extract(line, r"^([0-9A-Fa-f]{1,7})", 1)
        size = F.conv(hexs, 16, 10).cast("long")
        data = F.substring(rest, le + 2, size)
        term = F.substring(rest, le + 2 + size, 2)
        step_ok = (
            (le > 0) & (hexs != "") & size.isNotNull()
            & ((size == 0)
               | ((F.length(data) == size) & (term == crlf))))
        frozen = acc["done"] | ~acc["ok"]
        return F.struct(
            F.when(frozen, acc["ok"]).otherwise(step_ok).alias("ok"),
            F.when(frozen | ~step_ok | (size == 0), acc["out"])
             .otherwise(F.concat(acc["out"], data)).alias("out"),
            F.when(frozen, acc["done"])
             .otherwise(step_ok & (size == 0)).alias("done"),
            F.when(frozen | ~step_ok, p)
             .otherwise(p + le + 1 + size + 2).cast("long").alias("pos"),
        )

    def finish(acc: Column) -> Column:
        # acc is a lambda VARIABLE — referencing it is a leaf node, so
        # the final struct does not re-embed the whole fold tree (the
        # naive `agg[...]` field extraction copies the aggregate once
        # per reference and multiplies Catalyst analysis time).
        ok = acc["ok"] & acc["done"] & body.isNotNull()
        return F.struct(
            ok.alias("ok"), F.when(ok, acc["out"]).alias("text"))

    init = F.struct(
        F.lit(True).alias("ok"), F.lit("").alias("out"),
        F.lit(False).alias("done"), F.lit(1).cast("long").alias("pos"))
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(int(max_chunks))), init, step, finish)


# ---------------------------------------------------------------------------
# gzip (RFC 1952) payload layer: fixture-side member builder with STORED
# deflate blocks (framing only — no compressor involved, so the decoder is
# never tested against its own inverse) and a REAL decoder over stdlib zlib.
# ---------------------------------------------------------------------------

def gen_gzip_stored(
    data: bytes,
    fname: str | None = None,
    mtime: int = 0,
    block: int = 20,
) -> bytes:
    """Assemble an RFC 1952 gzip member whose deflate stream uses only
    STORED (BTYPE=0) blocks — pure framing, no compression: 1-byte
    block header (BFINAL|BTYPE), LEN/NLEN little-endian, raw bytes.
    Splitting ``data`` into ``block``-byte stored blocks exercises the
    decoder's multi-block walk.  CRC32 comes from ``zlib.crc32``; the
    SQL oracle recomputes it with its own table fold, so the two CRC
    implementations cross-check through the byte-identical payload."""
    import struct
    import zlib

    flg = 0x08 if fname is not None else 0x00
    out = bytearray(b"\x1f\x8b\x08")
    out.append(flg)
    out += struct.pack("<I", mtime & 0xFFFFFFFF)
    out += b"\x00\x03"  # XFL, OS=unix
    if fname is not None:
        out += fname.encode("latin-1") + b"\x00"
    pieces = [data[i:i + block] for i in range(0, len(data), block)] or [b""]
    for k, p in enumerate(pieces):
        final = 1 if k == len(pieces) - 1 else 0
        out.append(final)  # BFINAL=final, BTYPE=00 (stored)
        out += struct.pack("<H", len(p)) + struct.pack("<H", 0xFFFF - len(p))
        out += p
    out += struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF)
    out += struct.pack("<I", len(data) & 0xFFFFFFFF)
    return bytes(out)


def _parse_gzip_member(b: bytes):
    """(valid, text, fname, mtime) for one gzip member — real RFC 1952
    header walk (FEXTRA/FNAME/FCOMMENT/FHCRC) + raw-deflate inflate via
    zlib, then CRC32 and ISIZE trailer verification.  Any framing,
    inflate, checksum, or length violation -> (False, None, None,
    None)."""
    import zlib

    bad = (False, None, None, None)
    try:
        if len(b) < 18 or b[0] != 0x1F or b[1] != 0x8B or b[2] != 0x08:
            return bad
        flg = b[3]
        mtime = int.from_bytes(b[4:8], "little")
        pos = 10
        if flg & 0x04:  # FEXTRA
            xlen = int.from_bytes(b[pos:pos + 2], "little")
            pos += 2 + xlen
        fname = None
        if flg & 0x08:  # FNAME
            z = b.index(0, pos)
            fname = b[pos:z].decode("latin-1")
            pos = z + 1
        if flg & 0x10:  # FCOMMENT
            pos = b.index(0, pos) + 1
        if flg & 0x02:  # FHCRC
            pos += 2
        d = zlib.decompressobj(-15)
        out = d.decompress(b[pos:])
        if not d.eof or len(d.unused_data) != 8:
            return bad
        crc = int.from_bytes(d.unused_data[:4], "little")
        isize = int.from_bytes(d.unused_data[4:8], "little")
        if crc != (zlib.crc32(out) & 0xFFFFFFFF):
            return bad
        if isize != (len(out) & 0xFFFFFFFF):
            return bad
        return (True, out.decode("latin-1"), fname, mtime)
    except Exception:
        return bad


def gunzip_report(
    df: DataFrame, id_col: str, payload_col: str,
) -> DataFrame:
    """Decode a gzip ``binary`` column: ``(id, payload_hex, valid,
    text, fname, mtime)``.  Arrow-batched ``mapInPandas`` (the
    sanctioned Python path — inflate has no JVM expression form);
    row-local, rides the scan, zero exchange.  ``payload_hex`` carries
    the member bytes into the output so an oracle that BUILDS the same
    member independently compares the bytes themselves, not just the
    decode."""
    import pandas as pd  # noqa: F811  (worker-side import)

    schema = (f"{id_col} long, payload_hex string, valid boolean, "
              f"text string, fname string, mtime long")

    def run(batches):
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b) if b is not None else b""
                valid, text, fname, mtime = _parse_gzip_member(b)
                rows.append((int(i), b.hex().upper(), valid, text,
                             fname, mtime if valid else None))
            yield pd.DataFrame(rows, columns=[
                id_col, "payload_hex", "valid", "text", "fname", "mtime"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
