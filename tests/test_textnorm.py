"""textnorm: HTML character references + NFC normalization.

The entity decoder's contract IS CPython's html.unescape on the
supported grammar (semicolon forms, NAMED_ENTITY_MAP names), so the
main test generates adversarial reference soup and asserts byte
equality against the stdlib — covering the WHATWG C1 remap, U+FFFD
substitution, control/noncharacter drops, astral-plane UTF-8
encoding, and verbatim passthrough in one sweep.
"""

import html
import random
import unicodedata

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.textnorm import (
    C1_REMAP,
    NAMED_ENTITY_MAP,
    decode_entities_col,
    nfc_normalize,
    utf8_char_col,
)

EDGE_CPS = [
    0, 1, 8, 9, 10, 11, 12, 13, 14, 31, 32, 38, 59, 65, 127, 128, 129,
    147, 159, 160, 0x7FF, 0x800, 0xD7FF, 0xD800, 0xDFFF, 0xE000,
    0xFDD0, 0xFDEF, 0xFFFD, 0xFFFE, 0xFFFF, 0x10000, 0x1F600,
    0x10FFFD, 0x10FFFE, 0x10FFFF, 0x110000, 9999999,
]


def test_entity_decode_matches_html_unescape(spark):
    rng = random.Random(7)
    names = list(NAMED_ENTITY_MAP)
    cases = []
    for cp in EDGE_CPS:
        cases += [f"a&#{cp};b", f"a&#x{cp:X};b", f"a&#x{cp:x};b"]
    for n in names:
        cases.append(f"[&{n};]")
    for _ in range(150):
        parts = []
        for _ in range(rng.randint(1, 10)):
            k = rng.randint(0, 5)
            if k == 0:
                parts.append(f"&{rng.choice(names)};")
            elif k == 1:
                parts.append(f"&#{rng.randint(0, 1200000)};")
            elif k == 2:
                parts.append(f"&#x{rng.randint(0, 0x120000):x};")
            elif k == 3:
                parts.append(rng.choice(
                    ["text ", "a&b", "&", "#x27;", "x;&", "&&", ";;"]))
            elif k == 4:
                parts.append(f"&#{rng.choice(EDGE_CPS)};")
            else:
                parts.append(f"&{rng.choice(['bogus', 'nosuch1', 'Xy'])};")
        cases.append("".join(parts))
    cases += ["", "&", "&#", "&#x", "&#;", "&#x;", "&#xG;", "& amp;"]

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, t string")
    got = {r["i"]: r["d"] for r in df.select(
        "i", decode_entities_col(F.col("t")).alias("d")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == html.unescape(c), (i, c, got[i], html.unescape(c))


def test_entity_decode_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i int, t string")
    assert df.select(
        decode_entities_col(F.col("t")).alias("d")).first()["d"] is None


def test_utf8_char_col_all_widths(spark):
    cps = [1, 65, 127, 128, 0x7FF, 0x800, 0xFFFD, 0xFFFF,
           0x10000, 0x1F600, 0x10FFFF]
    df = spark.createDataFrame([(cp,) for cp in cps], "cp long")
    rows = df.select("cp", utf8_char_col(F.col("cp")).alias("s")).collect()
    for r in rows:
        assert r["s"] == chr(r["cp"]), (r["cp"], r["s"])


def test_named_map_agrees_with_stdlib():
    import html.entities as he
    for n, v in NAMED_ENTITY_MAP.items():
        assert he.html5[n + ";"] == v
    assert len(C1_REMAP) == 32
    # spot-check the WHATWG table: 0x91/0x92 are the curly quotes
    assert C1_REMAP[0x91 - 0x80] == 0x2018
    assert C1_REMAP[0x92 - 0x80] == 0x2019


def test_nfc_normalize_canonical_cases(spark):
    cases = [
        ("e\u0301", "\u00e9"),                     # compose
        ("\u212b", "\u00c5"),                      # singleton fold
        ("q\u0307\u0323", "q\u0323\u0307"),        # canonical reorder
        ("\u1100\u1161\u11a8", "\uac01"),          # Hangul jamo
        ("\u00e9", "\u00e9"),                      # already NFC
        ("plain", "plain"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i int, raw string")
    got = {r["i"]: r["nfc"]
           for r in nfc_normalize(df, "raw").collect()}
    for i, (s, exp) in enumerate(cases):
        assert got[i] == exp == unicodedata.normalize("NFC", s), (i, s)


def test_cp1252_from_latin1_matches_codec(spark):
    from biothings_crawler_spark.operators.textnorm import (
        cp1252_from_latin1_col)

    raws = [bytes([b]) for b in range(0x20, 0xFF)]
    cases = []
    for rb in raws:
        latin1 = rb.decode("latin-1")
        cases.append((latin1, rb.decode("cp1252", errors="replace")))
    # python's cp1252 codec errors on the 5 undefined bytes; WHATWG (and
    # our table) maps them to themselves — align expectations
    fixed = []
    for latin1, exp in cases:
        if exp == "�":
            exp = latin1
        fixed.append((latin1, exp))
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(fixed)], "i int, s string")
    got = {r["i"]: r["d"] for r in df.select(
        "i", cp1252_from_latin1_col(F.col("s")).alias("d")).collect()}
    for i, (s, exp) in enumerate(fixed):
        assert got[i] == exp, (hex(ord(s)), got[i], exp)


def test_strip_references_lanes(spark):
    from biothings_crawler_spark.operators.textnorm import strip_references

    rows = [
        (1, "prose only, no heading"),
        (2, "intro text\nReferences\n[1] a\n[2] b"),
        (3, "intro\nBibliography:\n- book"),
        (4, "the references section is discussed here"),  # mid-prose
        (5, "a\nreferences\nearly\nmore\nREFERENCES\n[9] late"),
        (6, "works   cited\n[1] only a heading doc"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.clean_text, r.n_chars_cut)
           for r in strip_references(df, "doc_id", "text").collect()}
    assert got[1] == ("prose only, no heading", 0)
    assert got[2][0] == "intro text"
    assert got[2][1] == len("\nReferences\n[1] a\n[2] b")
    assert got[3][0] == "intro"
    assert got[4] == ("the references section is discussed here", 0)
    # LAST heading wins: the early lowercase block survives
    assert got[5][0] == "a\nreferences\nearly\nmore"
    # heading on line 1: everything cut
    assert got[6][0] == ""
    assert got[7] == ("", 0)
