"""PDF text extraction — the training-data pipeline's third document
source format beside HTML (operators/extract.html_to_text) and the
WARC/WET archive plane (operators/warc.py).

A web-scale corpus build ingests the PDF slice of a crawl (CCpdf-style)
through exactly this shape: an Arrow-batched ``mapInPandas`` decode of
an opaque ``binary`` column into ``(n_pages, text, n_chars)`` plus the
media plane's ``decode_err`` pass-through, so one malformed file never
kills a 100 TB stage.

The decoder is REAL, stdlib-only, and navigates the document structure
rather than scanning linearly:

* object map from ``N 0 obj .. endobj`` spans,
* ``trailer`` -> ``/Root`` -> catalog ``/Pages`` -> ``/Kids`` array
  (LOGICAL page order — the fixture plants documents whose object
  numbering disagrees with Kids order, so a lazy linear-scan parser
  produces wrong page order and fails the oracle),
* per page ``/Contents N 0 R`` -> stream dict; data sliced by the
  declared ``/Length`` (never by searching for ``endstream``, which
  can legally occur inside stream data), inflated with ``zlib`` when
  ``/Filter /FlateDecode`` is declared,
* a content-stream scanner that tokenizes literal strings with PDF
  escape handling (``\\(`` ``\\)`` ``\\\\``, octal ``\\nnn``, balanced
  unescaped parens) and emits one text line per ``Tj`` (single string)
  or ``TJ`` (array of strings; kerning numbers concatenate, never
  space) show op; lines join with ``\\n``, pages with ``\\f``.

Out-of-scope PDF features (xref streams, object streams, encryption,
non-Flate filters, CID/Type0 encodings) raise ``ValueError`` into the
``decode_err`` lane — the honest-capability-gate policy shared with
the JPEG/GIF codecs (operators/jpegcodec.py).

Scale shape: pure map stage — no state across rows, no shuffle; the
plan is a single mapInPandas over the media table, so partitioning is
inherited from the scan and the 100 TB story is embarrassing
parallelism.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b", re.S)


def _find_objects(data: bytes) -> dict[int, bytes]:
    """Map object number -> object body bytes (between ``obj`` and the
    matching ``endobj``)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        end = data.find(b"endobj", m.end())
        if end < 0:
            raise ValueError(f"object {int(m.group(1))} has no endobj")
        objs[int(m.group(1))] = data[m.end():end]
    return objs


def _ref(body: bytes, name: str) -> int:
    m = re.search(rb"/" + name.encode() + rb"\s+(\d+)\s+0\s+R", body)
    if not m:
        raise ValueError(f"missing /{name} reference")
    return int(m.group(1))


def _stream_data(body: bytes) -> bytes:
    """Slice stream payload by the declared /Length and inflate when
    /FlateDecode is declared."""
    m = re.search(rb"/Length\s+(\d+)", body)
    if not m:
        raise ValueError("stream object without /Length")
    length = int(m.group(1))
    s = re.search(rb"stream\r?\n", body)
    if not s:
        raise ValueError("stream keyword missing")
    raw = body[s.end():s.end() + length]
    if len(raw) < length:
        raise ValueError("stream shorter than declared /Length")
    filt = re.search(rb"/Filter\s*/(\w+)", body)
    if filt is None:
        return raw
    if filt.group(1) == b"FlateDecode":
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError(f"FlateDecode failed: {e}") from e
    raise ValueError(f"unsupported filter /{filt.group(1).decode()}")


def _scan_text_lines(content: bytes) -> list[str]:
    """One line per Tj/TJ show op, in stream order."""
    lines: list[str] = []
    pending: list[str] = []
    i, n = 0, len(content)
    while i < n:
        c = content[i:i + 1]
        if c == b"(":
            chars: list[str] = []
            depth, i = 1, i + 1
            while i < n and depth:
                ch = content[i]
                if ch == 0x5C:  # backslash escape
                    nxt = content[i + 1:i + 2]
                    if nxt.isdigit():
                        oct_digits = b""
                        j = i + 1
                        while j < n and len(oct_digits) < 3 \
                                and content[j:j + 1].isdigit():
                            oct_digits += content[j:j + 1]
                            j += 1
                        chars.append(chr(int(oct_digits, 8)))
                        i = j
                    elif nxt in (b"(", b")", b"\\"):
                        chars.append(nxt.decode("latin-1"))
                        i += 2
                    elif nxt == b"n":
                        chars.append("\n")
                        i += 2
                    else:  # unknown escape: drop the backslash
                        i += 1
                elif ch == 0x28:
                    depth += 1
                    chars.append("(")
                    i += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth:
                        chars.append(")")
                    i += 1
                else:
                    chars.append(chr(ch))
                    i += 1
            if depth:
                raise ValueError("unbalanced literal string")
            pending.append("".join(chars))
        elif content[i:i + 2] == b"TJ":
            lines.append("".join(pending))
            pending = []
            i += 2
        elif content[i:i + 2] == b"Tj":
            if not pending:
                raise ValueError("Tj with no string operand")
            lines.append(pending[-1])
            pending = []
            i += 2
        elif c == b"[":
            pending = []  # TJ array opens: collect afresh
            i += 1
        else:
            i += 1
    return lines


def extract_pdf_text(data: bytes) -> tuple[int, str, int]:
    """(n_pages, text, n_chars) for one PDF, following the Kids order."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF header")
    objs = _find_objects(data)
    t = data.rfind(b"trailer")
    if t < 0:
        raise ValueError("no trailer (xref-stream PDFs unsupported)")
    root = _ref(data[t:], "Root")
    pages_obj = objs[_ref(objs[root], "Pages")]
    kids = re.search(rb"/Kids\s*\[([^\]]*)\]", pages_obj)
    if not kids:
        raise ValueError("Pages node without /Kids")
    page_nums = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", kids.group(1))]
    if not page_nums:
        raise ValueError("empty /Kids")
    pages_text = []
    for p in page_nums:
        content = _stream_data(objs[_ref(objs[p], "Contents")])
        pages_text.append("\n".join(_scan_text_lines(content)))
    text = "\f".join(pages_text)
    return len(page_nums), text, len(text)


PDF_TEXT_SCHEMA = ("media_id long, n_pages long, text string, "
                   "n_chars long, decode_err string")


def decode_pdf_text(media: DataFrame) -> DataFrame:
    """(media_id, content) -> (media_id, n_pages, text, n_chars,
    decode_err) via Arrow-batched mapInPandas; one-row decode failures
    land in decode_err, the shared media-plane policy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from biothings_crawler_spark.operators.multimodal import (
            DECODE_ERR_CLASSES,
            _decode_rows,
        )

        for pdf in batches:
            yield pd.DataFrame(_decode_rows(
                pdf, ("n_pages", "text", "n_chars"), extract_pdf_text,
                DECODE_ERR_CLASSES))

    return media.mapInPandas(run, PDF_TEXT_SCHEMA)


def _pdf_escape(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out).encode("latin-1")


def _build_pdf(pages: list[list[str]], *, flate: bool,
               reverse_objects: bool, tj_arrays: bool) -> bytes:
    """Write a real single-xref PDF with one content stream per page.

    ``reverse_objects`` emits the page/content objects in REVERSE
    object-number order relative to /Kids — the casualty lane for
    linear-scan parsers.  ``tj_arrays`` shows each line as a TJ array
    split in two with a kern number between the halves (concatenation
    must be exact)."""
    np_ = len(pages)
    # object numbers: 1=catalog, 2=pages, 3..2+np=page nodes,
    # 3+np..2+2np=content streams
    page_ids = list(range(3, 3 + np_))
    cont_ids = list(range(3 + np_, 3 + 2 * np_))
    bodies: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids ["
            + b" ".join(b"%d 0 R" % p for p in page_ids)
            + b"] /Count %d >>" % np_),
    }
    for pid, cid in zip(page_ids, cont_ids):
        bodies[pid] = (b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>"
                       % cid)
    for cid, lines in zip(cont_ids, pages):
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for k, ln in enumerate(lines):
            if tj_arrays and len(ln) > 3:
                cut = len(ln) // 2
                ops.append(b"[" + b"(" + _pdf_escape(ln[:cut]) + b") -250 ("
                           + _pdf_escape(ln[cut:]) + b")] TJ")
            else:
                ops.append(b"(" + _pdf_escape(ln) + b") Tj")
            if k + 1 < len(lines):
                ops.append(b"0 -14 Td")
        ops.append(b"ET")
        payload = b"\n".join(ops)
        if flate:
            comp = zlib.compress(payload)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(comp)
            bodies[cid] = head + b"\nstream\n" + comp + b"\nendstream"
        else:
            bodies[cid] = (b"<< /Length %d >>" % len(payload)
                           + b"\nstream\n" + payload + b"\nendstream")
    order = sorted(bodies)
    if reverse_objects:
        order = sorted(bodies, reverse=True)
    out = [b"%PDF-1.4"]
    offsets: dict[int, int] = {}
    pos = len(out[0]) + 1
    for num in order:
        chunk = b"%d 0 obj\n" % num + bodies[num] + b"\nendobj"
        offsets[num] = pos
        out.append(chunk)
        pos += len(chunk) + 1
    xref_pos = pos
    n_obj = max(bodies) + 1
    xref = [b"xref", b"0 %d" % n_obj, b"0000000000 65535 f "]
    for num in range(1, n_obj):
        xref.append(b"%010d 00000 n " % offsets[num])
    out.append(b"\n".join(xref))
    out.append(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
               % (n_obj, xref_pos))
    return b"\n".join(out)


def fixture_lines(seed: int) -> list[list[str]]:
    """Closed-form fixture text, shared verbatim with the SQL oracle:
    page p line i is ``pg{p} ln{i} w{(seed*31+p*17+i*7)%97} (k{i})`` —
    the parens exercise the escape path on every line."""
    np_ = 1 + seed % 3
    nl = 2 + seed % 4
    return [
        [f"pg{p} ln{i} w{(seed * 31 + p * 17 + i * 7) % 97} (k{i})"
         for i in range(nl)]
        for p in range(np_)
    ]


def gen_pdf_media_seeded(ids: DataFrame) -> DataFrame:
    """(media_id, seed) -> real PDF bytes.  Lanes by seed: ``seed%2``
    picks FlateDecode vs plain streams, ``seed%5==0`` reverses object
    numbering vs /Kids order (linear-scan casualty), ``seed%3==1``
    renders lines as split TJ arrays with kern numbers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "content": []}
            for mid, seed in zip(pdf["media_id"], pdf["seed"]):
                seed = int(seed)
                out["media_id"].append(int(mid))
                out["content"].append(_build_pdf(
                    fixture_lines(seed),
                    flate=seed % 2 == 0,
                    reverse_objects=seed % 5 == 0,
                    tj_arrays=seed % 3 == 1,
                ))
            yield pd.DataFrame(out)

    return ids.mapInPandas(run, "media_id long, content binary")
