"""RFC 3492 Punycode decoding: stdlib cross-check (incl. fuzz), host
composition, and the decode_err degradation lanes."""

import random

import pytest

from biothings_crawler_spark.operators.idn import (
    decode_host,
    idn_decode,
    punycode_decode,
)

KNOWN = [
    ("münchen", "mnchen-3ya"),
    ("bücher", "bcher-kva"),
    ("россия", "h1alffa9f"),
    ("ελλάδα", "hxakic4aa"),
    ("例え", "r8jz45g"),
    ("paypal-аccount", "paypal-ccount-21k"),  # Cyrillic а homograph
    ("café", "caf-dma"),
    ("☃-⌘", "--dqo34k"),
]


def test_known_labels():
    for uni, ace in KNOWN:
        assert punycode_decode(ace) == uni
        # and agrees with the encoder we did not use to build it
        assert uni.encode("punycode").decode("ascii") == ace


def test_fuzz_against_stdlib():
    rng = random.Random(7)
    checked = 0
    while checked < 5000:
        s = "".join(
            chr(rng.randrange(0x2D, 0x3000))
            for _ in range(rng.randrange(1, 14))
        )
        try:
            enc = s.encode("punycode").decode("ascii")
            std = enc.encode("ascii").decode("punycode")
        except Exception:
            continue
        assert punycode_decode(enc) == std == s
        checked += 1


def test_malformed_lanes():
    with pytest.raises(ValueError, match="invalid punycode digit"):
        punycode_decode("a-ecp!")
    with pytest.raises(ValueError, match="codepoint overflow"):
        punycode_decode("9999999999h")
    with pytest.raises(ValueError, match="truncated"):
        punycode_decode("mnchen-3y9")  # digit >= t at end of input
    with pytest.raises(ValueError, match="non-basic"):
        punycode_decode("mü-3ya")


def test_decode_host_composition():
    assert decode_host("XN--MNCHEN-3YA.Example.COM") == (
        "münchen.example.com", None)
    assert decode_host("plain.example.com") == ("plain.example.com", None)
    host, err = decode_host("xn--a-ecp!.example")
    assert host == "xn--a-ecp!.example" and "invalid punycode digit" in err


def test_idn_decode_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "XN--MNCHEN-3YA.example"), (2, "www.example"),
         (3, "xn--9999999999h.example"), (4, None)],
        "id long, host string",
    )
    rows = {r["id"]: r for r in idn_decode(df).collect()}
    assert rows[1]["unicode_host"] == "münchen.example"
    assert rows[1]["ace"] == 1
    assert rows[2]["unicode_host"] == "www.example" and rows[2]["ace"] == 0
    assert "overflow" in rows[3]["decode_err"]
    assert rows[3]["unicode_host"] == "xn--9999999999h.example"
    assert rows[4]["unicode_host"] is None and rows[4]["decode_err"] is None


def test_ace_flag_is_label_anchored(spark):
    df = spark.createDataFrame(
        [(1, "foxn--bar.example"), (2, "a.xn--mnchen-3ya.example")],
        "id long, host string")
    rows = {r["id"]: r for r in idn_decode(df).collect()}
    # mid-label 'xn--' is not an ACE label (review finding)
    assert rows[1]["ace"] == 0 and rows[1]["unicode_host"] == rows[1]["host"]
    assert rows[2]["ace"] == 1
