"""Web-text normalization: HTML character-reference decoding and
Unicode NFC normalization.

Raw web text arrives with its characters encoded three different ways
for the same glyph — ``&eacute;``, ``&#233;``, ``&#xE9;`` and the byte
``é`` are all one letter — and with canonically-equivalent Unicode
sequences (``e`` + COMBINING ACUTE vs precomposed ``é``) that hash,
dedup, shingle and tokenize differently unless folded first.  At
100 TB that skew is structural: near-dup recall drops, line-dedup
misses template boilerplate, and token counts drift per encoder whim.
The reference (Scrapy/extruct, crawler/spiders) inherits entity
decoding from lxml's parser and never normalizes Unicode; this module
makes both steps explicit, deterministic operators.

Entity decoding (:func:`decode_entities_col`) is **pure JVM
expression**: tokenize with ``regexp_extract_all`` into numeric
references / named references / literal runs, fold each numeric
reference through the WHATWG "numeric character reference end state"
rules (HTML5 §13.2.5.80: C1 range 0x80-0x9F remaps through the
windows-1252 table, NUL / out-of-range / surrogates become U+FFFD),
then materialize the code point by computing its UTF-8 bytes
arithmetically (``shiftright`` + masks -> hex -> ``unhex`` ->
``decode``) — Spark's ``char()`` only covers ASCII, so the operator
carries its own UTF-8 encoder in expression space.  Named references
resolve through ONE ``create_map`` literal (a chain of ``when``
aliases doubles the Catalyst tree per arm); unknown names pass through
verbatim, exactly like browsers and Python's ``html.unescape``.  The
name->text table is read from stdlib ``html.entities.html5`` at import
time, so the operator agrees with ``html.unescape`` by construction on
the supported set (semicolon forms; legacy no-semicolon references are
out of contract and pass through).

NFC (:func:`nfc_normalize`) has no JVM builtin, so it is the sanctioned
slow path: an Arrow-batched pandas UDF over stdlib ``unicodedata`` —
row-local, no shuffle, and the DuckDB oracle recomputes with its own
independent ``nfc_normalize`` implementation (utf8proc), making the
pair a genuine cross-implementation check of the Unicode composition
tables.
"""

from __future__ import annotations

import html.entities as _he

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Named references supported by the expression path (all single- or
# multi-codepoint values come from stdlib html.entities.html5, so the
# table cannot drift from html.unescape).  Chosen as the high-frequency
# web set: core XML five, typography, currency, Latin-1 letters.
NAMED_ENTITY_NAMES: tuple[str, ...] = (
    "amp", "lt", "gt", "quot", "apos",
    "nbsp", "shy", "ensp", "emsp", "thinsp", "zwnj", "zwj",
    "mdash", "ndash", "hellip", "lsquo", "rsquo", "ldquo", "rdquo",
    "sbquo", "bdquo", "prime", "Prime", "bull", "middot", "dagger",
    "Dagger", "permil", "laquo", "raquo", "lsaquo", "rsaquo",
    "copy", "reg", "trade", "deg", "sect", "para", "micro",
    "euro", "pound", "yen", "cent", "curren",
    "times", "divide", "plusmn", "minus", "frac12", "frac14", "frac34",
    "sup1", "sup2", "sup3", "iexcl", "iquest",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring",
    "ccedil", "egrave", "eacute", "ecirc", "euml",
    "igrave", "iacute", "icirc", "iuml", "ntilde",
    "ograve", "oacute", "ocirc", "otilde", "ouml", "oslash",
    "ugrave", "uacute", "ucirc", "uuml", "yacute", "yuml", "szlig",
    "Agrave", "Aacute", "Auml", "Eacute", "Ouml", "Uuml",
)

NAMED_ENTITY_MAP: dict[str, str] = {
    n: _he.html5[n + ";"] for n in NAMED_ENTITY_NAMES
}

# WHATWG numeric-character-reference remap for 0x80..0x9F (HTML5
# "numeric character reference end state"): windows-1252 glyph code
# points; entries absent from the spec table map to themselves.
C1_REMAP: tuple[int, ...] = (
    8364, 129, 8218, 402, 8222, 8230, 8224, 8225,          # 80-87
    710, 8240, 352, 8249, 338, 141, 381, 143,              # 88-8F
    144, 8216, 8217, 8220, 8221, 8226, 8211, 8212,         # 90-97
    732, 8482, 353, 8250, 339, 157, 382, 376,              # 98-9F
)

# Tokenizer: numeric decimal / numeric hex / named / literal run /
# stray '&'.  Bounds (7 decimal digits, 6 hex digits, 31 name chars)
# keep every downstream integer in range; longer sequences fall apart
# into a stray '&' plus a literal run and pass through untouched.
_ENTITY_TOKEN_RE = (
    r"(&#[0-9]{1,7};|&#[xX][0-9A-Fa-f]{1,6};"
    r"|&[a-zA-Z][a-zA-Z0-9]{1,31};|[^&]+|&)"
)


def utf8_char_col(cp: Column) -> Column:
    """UTF-8 string for a VALID scalar code point column (1..0x10FFFF,
    non-surrogate): the 1/2/3/4-byte encodings of RFC 3629 computed
    with shifts and masks, hex-assembled, then ``unhex`` -> ``decode``.
    ASCII short-circuits through the builtin ``char``."""
    cp = cp.cast("long")

    def b(x: Column) -> Column:  # one encoded byte -> 2 hex digits
        return F.lpad(F.hex(x.cast("long")), 2, "0")

    def low6(x: Column) -> Column:
        return x.bitwiseAND(F.lit(63))

    two = F.concat(b(F.shiftright(cp, 6) + 192), b(low6(cp) + 128))
    three = F.concat(
        b(F.shiftright(cp, 12) + 224),
        b(low6(F.shiftright(cp, 6)) + 128), b(low6(cp) + 128))
    four = F.concat(
        b(F.shiftright(cp, 18) + 240),
        b(low6(F.shiftright(cp, 12)) + 128),
        b(low6(F.shiftright(cp, 6)) + 128), b(low6(cp) + 128))
    hexs = (F.when(cp < 0x800, two)
            .when(cp < 0x10000, three).otherwise(four))
    return F.when(cp < 128, F.char(cp)).otherwise(
        F.decode(F.unhex(hexs), "UTF-8"))


def decode_entities_col(text: Column) -> Column:
    """Decode HTML character references in ``text`` — numeric decimal,
    numeric hex (WHATWG C1 remap + U+FFFD for NUL / surrogates /
    out-of-range), and the :data:`NAMED_ENTITY_MAP` named set — as one
    zero-exchange JVM projection.  Unknown or malformed references pass
    through verbatim."""
    toks = F.regexp_extract_all(text, F.lit(_ENTITY_TOKEN_RE), 0)
    named = F.create_map(*[
        x for n, v in NAMED_ENTITY_MAP.items()
        for x in (F.lit(f"&{n};"), F.lit(v))
    ])
    c1 = F.array(*[F.lit(v).cast("long") for v in C1_REMAP])

    def dec_numeric(t: Column) -> Column:
        is_dec = t.rlike(r"^&#[0-9]{1,7};$")
        dec_digits = F.substring(t, F.lit(3), F.length(t) - 3)
        hex_digits = F.substring(t, F.lit(4), F.length(t) - 4)
        cp0 = F.when(is_dec, dec_digits.cast("long")).otherwise(
            F.conv(hex_digits, 16, 10).cast("long"))
        cp1 = F.when(
            (cp0 >= 128) & (cp0 <= 159),
            F.element_at(c1, (cp0 - 127).cast("int"))).otherwise(cp0)
        bad = ((cp1 <= 0) | (cp1 > 0x10FFFF)
               | ((cp1 >= 0xD800) & (cp1 <= 0xDFFF)))
        # C0 controls (except HT/LF/FF/CR), DEL, and Unicode
        # noncharacters decode to the EMPTY string — the
        # html.unescape contract, and the right cleaning behavior
        # for a text pipeline (never emit raw controls).
        dropped = (
            ((cp1 >= 1) & (cp1 <= 8)) | (cp1 == 0x0B)
            | ((cp1 >= 0x0E) & (cp1 <= 0x1F)) | (cp1 == 0x7F)
            | ((cp1 >= 0xFDD0) & (cp1 <= 0xFDEF))
            | (cp1.bitwiseAND(F.lit(0xFFFF)) >= 0xFFFE))
        return F.when(~bad & dropped, F.lit("")).otherwise(
            utf8_char_col(F.when(bad, F.lit(65533)).otherwise(cp1)))

    is_num = lambda t: t.rlike(r"^&#[0-9xX]")  # noqa: E731
    out = F.array_join(
        F.transform(toks, lambda t: F.when(is_num(t), dec_numeric(t))
                    .otherwise(F.coalesce(named[t], t))), "")
    return F.when(text.isNotNull(), out)


def nfc_normalize(df: DataFrame, text_col: str,
                  out_col: str = "nfc") -> DataFrame:
    """Append ``out_col`` = Unicode NFC normalization of ``text_col``.

    Canonical composition (precompose base+combining pairs, canonical
    reordering of combining marks, singleton folds like U+212B ANGSTROM
    SIGN -> U+00C5, Hangul jamo -> syllables).  No JVM builtin exists,
    so this is an Arrow-batched pandas UDF over stdlib ``unicodedata``
    — row-local (rides the scan, zero exchange); the per-batch Python
    hop is the documented cost.  The oracle twin recomputes with
    DuckDB's utf8proc-backed ``nfc_normalize``, so the pair
    cross-checks two independent Unicode implementations.
    """
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    return df.withColumn(out_col, _nfc(F.col(text_col)))


def cp1252_from_latin1_col(text: Column) -> Column:
    """Reinterpret a latin-1-decoded string as windows-1252.

    Spark's ``decode`` whitelists charsets (no windows-1252), but
    latin-1 is byte-preserving and cp1252 differs from it ONLY on
    0x80-0x9F — the same 32-entry WHATWG table the entity decoder
    uses (:data:`C1_REMAP`) — so one JVM ``translate`` finishes the
    decode.  Composable after ``decode(bin, 'ISO-8859-1')``."""
    matching = "".join(chr(c) for c in range(0x80, 0xA0))
    replace = "".join(chr(v) for v in C1_REMAP)
    return F.translate(text, matching, replace)


REFS_HEADINGS = ("references", "bibliography", "works cited")


def strip_references(
    df,
    id_col: str,
    text_col: str,
):
    """Trailing reference-section removal — the academic-webtext
    sibling of boilerplate stripping (papers and preprint mirrors end
    in a citation block that is metadata, not prose; left in, it
    poisons n-gram stats and teaches models to hallucinate citations).

    Rule, shared verbatim with the RE2 oracle: the LAST line that
    consists solely of a known heading ('references' / 'bibliography'
    / 'works cited', case-insensitive, optional trailing colon) cuts
    the document there — everything from that heading on is dropped;
    documents without such a line pass through unchanged.  'last'
    matters: prose that merely contains the word references is not cut
    (only whole-line headings match), and a heading after an earlier
    one cuts at the later one (greedy prefix capture).

    Returns (id, clean_text, n_chars_kept, n_chars_cut).  Pure
    codegen: one regexp extract + one rlike, no shuffle."""
    alts = "|".join(h.replace(" ", r"\s+") for h in REFS_HEADINGS)
    t = F.coalesce(F.col(text_col), F.lit(""))
    # greedy (?:.*\n)* pushes the heading match to its LAST
    # whole-line occurrence; group 1 is everything before it
    pat = rf"(?is)^((?:.*\n)*)(?:{alts})[ \t]*:?[ \t]*(?:\n.*)?$"
    matched = t.rlike(rf"(?im)^(?:{alts})[ \t]*:?[ \t]*$")
    return df.select(
        F.col(id_col).alias("id"), t.alias("_t"),
        F.regexp_extract(t, pat, 1).alias("_head"),
        matched.alias("_m"),
    ).select(
        "id",
        F.when(F.col("_m"),
               F.regexp_replace(F.col("_head"), r"\s+$", ""))
        .otherwise(F.col("_t")).alias("clean_text"),
        F.col("_t").alias("_t"),
    ).select(
        "id", "clean_text",
        F.length("clean_text").cast("long").alias("n_chars_kept"),
        (F.length("_t") - F.length("clean_text")).cast("long")
        .alias("n_chars_cut"),
    )
