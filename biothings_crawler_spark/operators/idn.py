"""RFC 3492 Punycode (Bootstring) decoding for IDN hostnames.

A web-scale frontier sees internationalized hosts as their ACE form
(``xn--mnchen-3ya.example``); politeness keys, homograph skeletons
(operators/homograph.py) and per-language routing all want the Unicode
form. The reference crawler never decodes ACE labels (Scrapy passes
hostnames through verbatim); this is the Spark-native decoder.

The decoder is the RFC 3492 §6.2 algorithm implemented directly —
generalized variable-length integers with bias adaptation — not a
wrapper around a codec, so malformed labels degrade per the media
plane's ``decode_err`` policy (operators/jpegcodec.py precedent): a
bad label yields an error string, never a task kill. pytest
cross-checks every fixture against the stdlib ``punycode`` codec, and
the driver pair pins ground-truth (unicode, ACE) literal pairs the
oracle replays — the same pinned-oracle contract the media decoders
use.

Scale shape: Arrow-batched pandas UDF (the sanctioned Python path) —
per-label work is O(len); hosts are short, so throughput is
Arrow-transfer-bound. Zero shuffles; composes as a projection.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# RFC 3492 §5 parameter values
_BASE = 36
_TMIN = 1
_TMAX = 26
_SKEW = 38
_DAMP = 700
_INITIAL_BIAS = 72
_INITIAL_N = 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit(ch: str) -> int:
    o = ord(ch)
    if 0x30 <= o <= 0x39:          # 0-9 -> 26..35
        return o - 22
    if 0x41 <= o <= 0x5A:          # A-Z -> 0..25
        return o - 0x41
    if 0x61 <= o <= 0x7A:          # a-z -> 0..25
        return o - 0x61
    raise ValueError(f"invalid punycode digit {ch!r}")


def punycode_decode(label: str) -> str:
    """Decode one Punycode label (WITHOUT the ``xn--`` prefix) per
    RFC 3492 §6.2. Raises ValueError on malformed input (bad digit,
    truncated integer, codepoint overflow)."""
    n, i, bias = _INITIAL_N, 0, _INITIAL_BIAS
    pos = label.rfind("-")
    if pos > 0:
        output = [c for c in label[:pos]]
        for c in output:
            if ord(c) >= 0x80:
                raise ValueError("non-basic codepoint in literal part")
        rest = label[pos + 1:]
    else:
        output = []
        rest = label[1:] if pos == 0 else label
    it = iter(rest)
    consumed = object()
    while True:
        ch = next(it, consumed)
        if ch is consumed:
            break
        oldi, w, k = i, 1, _BASE
        while True:
            if ch is consumed:
                raise ValueError("truncated variable-length integer")
            d = _digit(ch)
            if d > (0x10FFFF - i) // w:
                raise ValueError("codepoint overflow")
            i += d * w
            t = _TMIN if k <= bias else (_TMAX if k >= bias + _TMAX
                                         else k - bias)
            if d < t:
                break
            if w > 0x10FFFF // (_BASE - t):
                raise ValueError("codepoint overflow")
            w *= _BASE - t
            k += _BASE
            ch = next(it, consumed)
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise ValueError("codepoint overflow")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def decode_host(host: str) -> tuple[str, str | None]:
    """Decode every ``xn--`` label of a dotted hostname. Returns
    (decoded_host, err) — on the first bad label the original host is
    kept and err describes the failure."""
    out = []
    for lab in host.split("."):
        low = lab.lower()
        if low.startswith("xn--"):
            try:
                out.append(punycode_decode(low[4:]))
            except ValueError as e:
                return host, f"{lab}: {e}"
        else:
            out.append(low)
    return ".".join(out), None


def idn_decode(
    df: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Add ``unicode_host`` / ``decode_err`` columns. ``ace`` flags
    hosts that carried at least one ``xn--`` label."""

    @pandas_udf("struct<unicode_host:string,decode_err:string>")
    def _dec(hosts: pd.Series) -> pd.DataFrame:
        dec, err = [], []
        for h in hosts:
            if h is None:
                dec.append(None)
                err.append(None)
                continue
            d, e = decode_host(h)
            dec.append(d)
            err.append(e)
        return pd.DataFrame({"unicode_host": dec, "decode_err": err})

    c = F.col(host_col)
    # ace = some LABEL starts with xn-- (review finding: a substring
    # contains() also matched hosts merely embedding the sequence
    # mid-label, e.g. 'foxn--bar.example')
    ace = F.exists(
        F.split(F.lower(c), r"\."),
        lambda lab: lab.startswith("xn--"),
    )
    return df.withColumn("_d", _dec(c)).select(
        *df.columns,
        F.col("_d.unicode_host").alias("unicode_host"),
        F.col("_d.decode_err").alias("decode_err"),
        F.coalesce(ace, F.lit(False)).cast("long").alias("ace"),
    )
