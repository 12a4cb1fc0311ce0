"""Mojibake detection + repair — the ftfy core case for web text:
UTF-8 bytes that some upstream stage decoded as windows-1252 (the
classic ``cafÃ©`` for ``café``), the single most common
encoding damage in Common-Crawl-class corpora (the HTTP layer's
charset_sniff prevents NEW damage; this repairs text that arrived
already broken).

Repair = invert the wrong decode: map every char back to the
windows-1252 byte it was decoded from (the 27 printable cp1252
specials live at 0x80-0x9F; everything else <= U+00FF is its own
byte), then re-decode those bytes as UTF-8. The repair is accepted
ONLY when the whole string round-trips as valid UTF-8 and actually
changes — genuine Latin-1-range text (``café`` itself) re-decodes
invalidly (0xE9 + non-continuation) and is kept untouched, which is
what makes the transform safe to run corpus-wide. One pass (doubly-
damaged text repairs one layer per run).

Spark shape: a single row-local projection — translate (cp1252
specials -> their byte-value chars), encode ISO-8859-1, decode UTF-8
(the JVM decoder substitutes U+FFFD on malformed input, so "contains
no U+FFFD" IS the validity test), all guarded by an eligibility regex
(every char must HAVE a cp1252 byte). Zero exchanges, zero Python.
The DuckDB oracle cannot delegate to a lenient decoder, so it
re-derives every code point with a from-scratch UTF-8 validator fold
(minimal-form, surrogate, and range checks included) — the two
engines agree exactly because "valid UTF-8" is the same predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the 27 printable windows-1252 specials at 0x80-0x9F, and the
# byte-value (latin-1) chars they must map back to
_SPECIALS = {
    b: bytes([b]).decode("windows-1252")
    for b in range(0x80, 0xA0)
    if bytes([b]).decode("windows-1252", errors="ignore")
}
_FROM = "".join(_SPECIALS.values())
_TO = "".join(chr(b) for b in _SPECIALS)

# eligible = every char has a cp1252 byte (<= U+00FF or a special),
# and at least one char is non-ASCII (pure ASCII can't be mojibake)
_ELIGIBLE_RE = "^[\\x00-\\xff" + "".join(
    "\\u%04x" % ord(c) for c in _FROM
) + "]*$"


def fix_mojibake(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Returns ``(id, mojibake, text_fixed)``: ``text_fixed`` is the
    repaired string when the inverse-cp1252 bytes decode as valid
    UTF-8 (and differ), else the original; ``mojibake`` flags rows
    that were repaired."""
    eligible = (
        F.col(text_col).rlike(_ELIGIBLE_RE)
        & F.col(text_col).rlike("[^\\x00-\\x7f]")
    )
    # mask ineligible rows to '' BEFORE encode: when/otherwise does not
    # short-circuit evaluation per row, and ISO-8859-1 must never see a
    # char without a byte
    src = F.when(eligible, F.col(text_col)).otherwise(F.lit(""))
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        eligible.alias("_elig"),
        F.encode(F.translate(src, _FROM, _TO), "ISO-8859-1").alias("_b"),
    )
    valid = F.expr("is_valid_utf8(_b)")
    # decode is STRICT in Spark 4 (raises on malformed), so invalid
    # byte rows are masked to empty before it ever sees them
    decoded = F.decode(
        F.when(valid, F.col("_b")).otherwise(F.encode(F.lit(""), "UTF-8")),
        "UTF-8",
    )
    repaired = F.col("_elig") & valid & (decoded != F.col("_t"))
    return staged.select(
        "id",
        repaired.alias("mojibake"),
        F.when(repaired, decoded).otherwise(F.col("_t")).alias("text_fixed"),
    )


def mojibake_oracle_sql(table_expr: str, id_expr: str, text_expr: str) -> str:
    """DuckDB twin of :func:`fix_mojibake` over ``table_expr`` (a CTE
    or table name with columns ``{id_expr}, {text_expr}``) — inverse
    cp1252 byte mapping + a from-scratch UTF-8 validator/decoder as a
    single-string-state fold (fields are all numeric/commas, so the
    '|'-packed state never collides with decoded content, which is
    materialized only in the final chr() pass)."""
    sp = "string_split(acc, '|')"
    need = f"CAST({sp}[1] AS BIGINT)"
    cp = f"CAST({sp}[2] AS BIGINT)"
    lead = f"CAST({sp}[3] AS BIGINT)"
    fc = f"CAST({sp}[4] AS BIGINT)"
    ok = f"CAST({sp}[5] AS BIGINT)"
    cps = f"{sp}[6]"
    specials = " ".join(
        f"WHEN {ord(c)} THEN {b}" for b, c in _SPECIALS.items()
    )
    byte = f"(CASE ord(c) {specials} ELSE ord(c) END)"
    # list_reduce needs a uniform element type, so bytes travel as
    # VARCHAR digits (the prepended state is VARCHAR) and the lambda
    # re-casts: b = the element's integer byte value
    b = "CAST(eb AS BIGINT)"
    cont_ok = (
        f"({b} >= 128 AND {b} <= 191 AND (CASE WHEN {fc} = 0 THEN TRUE "
        f"WHEN {lead} = 224 THEN {b} >= 160 "   # E0: no overlong 3-byte
        f"WHEN {lead} = 237 THEN {b} <= 159 "   # ED: no surrogates
        f"WHEN {lead} = 240 THEN {b} >= 144 "   # F0: no overlong 4-byte
        f"WHEN {lead} = 244 THEN {b} <= 143 "   # F4: cap U+10FFFF
        f"ELSE TRUE END))"
    )
    emit = f"(CASE WHEN {cps} = '' THEN '' ELSE {cps} || ',' END)"
    step = f"""(
  CASE
    WHEN {ok} = 0 THEN acc
    WHEN {need} = 0 AND {b} < 128
      THEN '0|0|0|0|1|' || {emit} || eb
    WHEN {need} = 0 AND {b} >= 194 AND {b} <= 223
      THEN '1|' || CAST({b} - 192 AS VARCHAR) || '|' || eb
           || '|1|1|' || {cps}
    WHEN {need} = 0 AND {b} >= 224 AND {b} <= 239
      THEN '2|' || CAST({b} - 224 AS VARCHAR) || '|' || eb
           || '|1|1|' || {cps}
    WHEN {need} = 0 AND {b} >= 240 AND {b} <= 244
      THEN '3|' || CAST({b} - 240 AS VARCHAR) || '|' || eb
           || '|1|1|' || {cps}
    WHEN {need} > 0 AND {cont_ok} AND {need} = 1
      THEN '0|0|0|0|1|' || {emit} || CAST({cp} * 64 + {b} - 128 AS VARCHAR)
    WHEN {need} > 0 AND {cont_ok}
      THEN CAST({need} - 1 AS VARCHAR) || '|'
           || CAST({cp} * 64 + {b} - 128 AS VARCHAR) || '|' || {sp}[3]
           || '|0|1|' || {cps}
    ELSE '0|0|0|0|0|'
  END)"""
    return f"""
chars AS (
  SELECT {id_expr} AS id, {text_expr} AS text,
         string_split({text_expr}, '') AS cs
  FROM {table_expr}),
elig AS (
  SELECT id, text,
         len(cs) > 0
         AND list_aggregate(list_transform(cs,
               c -> ord(c) <= 255 OR CASE ord(c) {specials}
                                     ELSE -1 END >= 0), 'bool_and')
         AND list_aggregate(list_transform(cs, c -> ord(c) > 127),
                            'bool_or') AS eligible,
         list_transform(cs, c -> {byte}) AS bs
  FROM chars),
folded AS (
  SELECT id, text, eligible,
         CASE WHEN eligible THEN
           list_reduce(list_prepend('0|0|0|0|1|',
                                    list_transform(bs, x -> CAST(x AS VARCHAR))),
                       (acc, eb) -> {step})
         ELSE '0|0|0|0|0|' END AS st
  FROM elig),
dec AS (
  SELECT id, text, eligible,
         CAST(string_split(st, '|')[1] AS BIGINT) = 0
         AND CAST(string_split(st, '|')[5] AS BIGINT) = 1 AS valid,
         string_split(st, '|')[6] AS cps
  FROM folded),
fixed AS (
  SELECT id, text, eligible, valid,
         CASE WHEN eligible AND valid AND cps <> ''
           THEN list_aggregate(list_transform(string_split(cps, ','),
                                x -> chr(CAST(x AS INTEGER))),
                               'string_agg', '')
           ELSE text END AS decoded
  FROM dec)
SELECT id,
       (eligible AND valid AND decoded <> text) AS mojibake,
       CASE WHEN eligible AND valid AND decoded <> text
            THEN decoded ELSE text END AS text_fixed
FROM fixed
"""
