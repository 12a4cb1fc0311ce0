"""RDFa Lite 1.1 extraction (vocab / typeof / property / resource) —
the third schema.org syntax, completing the structured-data plane
beside JSON-LD (operators/extract.py, the reference's only path —
crawler/spiders/helper.py:5 uses extruct's JsonLdExtractor) and HTML
microdata (operators/microdata.py). Real Common-Crawl pages carry
schema.org markup in all three; extruct ships an RDFa extractor the
reference never wired in.

Same architecture as the microdata sibling: a REAL stdlib
``html.parser.HTMLParser`` walk (charrefs decoded), Arrow-batched
through ``mapInPandas`` — pure map, no cross-row state.

Supported subset (documented like the microdata extractor's):

* ``typeof`` opens a subject, numbered in document order; its type IRI
  is the in-scope ``vocab`` (nearest ancestor carrying one, self
  included) prepended unless the typeof token is already absolute
  (contains ``:``). Multi-token ``typeof`` keeps the FIRST token as
  the type (full multi-type subjects are out of scope).
* ``property`` attaches to the nearest open subject; with no open
  subject the property attaches to the page (``subj_no`` NULL) — RDFa
  allows document-level triples, unlike microdata's orphan rule.
* Value source per common tags: ``meta`` -> @content, ``a``/``link``
  -> @href, ``img`` -> @src, ``time`` -> @datetime, any element with
  ``resource`` -> @resource, anything else -> descendant text
  (non-overlapping text properties; a text property nested inside
  another's value span is out of scope, as for microdata).
* ``property`` + ``typeof`` on one element: the new subject is the
  VALUE of that property on the parent subject
  (``parent_subj``/``parent_prop``), one nesting level — the
  schema.org publisher/author idiom.
* Multi-token ``property="a b"`` emits one row per token.

Output: one row per (page, subject, property):
``(id, subj_no, type_iri, parent_subj, parent_prop, prop, value)``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RDFA_SCHEMA = (
    "id long, subj_no long, type_iri string, parent_subj long, "
    "parent_prop string, prop string, value string"
)

_VOID = {"meta", "img", "link", "br", "hr", "input", "source"}


def _parse_rdfa(html: str) -> list[tuple]:
    """One page -> [(subj_no, type_iri, parent_subj, parent_prop,
    prop, value)] per the module-docstring subset."""
    from html.parser import HTMLParser

    out: list[tuple] = []

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            # open-element frames: [tag, subj_no|None, vocab|None]
            self.stack: list[list] = []
            self.n_subj = 0
            # subj_no -> (subj_no, type_iri, parent_subj, parent_prop)
            self.subjects: dict[int, tuple] = {}
            # depth -> [subj_meta, props, text-chunks] for an open
            # text-valued property element
            self.pending: dict[int, list] = {}

        def _in_scope_vocab(self, self_vocab):
            if self_vocab is not None:
                return self_vocab
            for fr in reversed(self.stack):
                if fr[2] is not None:
                    return fr[2]
            return ""

        def _cur_subj(self):
            for fr in reversed(self.stack):
                if fr[1] is not None:
                    return fr[1]
            return None

        def _emit(self, subj_meta, props, value):
            s = subj_meta or (None, None, None, None)
            for p in props:
                out.append((s[0], s[1], s[2], s[3], p, value))

        def _start(self, tag, attrs, void):
            a = dict(attrs)
            vocab = a.get("vocab")
            props = (a.get("property") or "").split()
            parent = self._cur_subj()
            subj_no = None
            if "typeof" in a:
                subj_no = self.n_subj
                self.n_subj += 1
                tok = (a.get("typeof") or "").split()
                tok0 = tok[0] if tok else ""
                voc = self._in_scope_vocab(vocab)
                self.subjects[subj_no] = (
                    subj_no,
                    tok0 if ":" in tok0 else voc + tok0,
                    parent if props else None,
                    props[0] if props else None,
                )
                # subject-as-value: the property is carried by the
                # subject linkage, not a text row
                props = []
            subj_meta = (
                self.subjects[subj_no] if subj_no is not None
                else (self.subjects[parent] if parent is not None
                      else None)
            )
            if props:
                if tag == "meta" and "content" in a:
                    self._emit(subj_meta, props, a.get("content") or "")
                elif tag in ("a", "link") and "href" in a:
                    self._emit(subj_meta, props, a.get("href") or "")
                elif tag == "img" and "src" in a:
                    self._emit(subj_meta, props, a.get("src") or "")
                elif tag == "time" and "datetime" in a:
                    self._emit(subj_meta, props, a.get("datetime") or "")
                elif "resource" in a:
                    self._emit(subj_meta, props, a.get("resource") or "")
                elif not void:
                    self.pending[len(self.stack)] = [subj_meta, props, []]
                else:
                    self._emit(subj_meta, props, "")
            if not void:
                self.stack.append([tag, subj_no, vocab])

        def handle_starttag(self, tag, attrs):
            self._start(tag, attrs, tag in _VOID)

        def handle_startendtag(self, tag, attrs):
            self._start(tag, attrs, True)

        def handle_data(self, data):
            if self.pending:
                # innermost open text property collects the chunk
                self.pending[max(self.pending)][2].append(data)

        def handle_endtag(self, tag):
            for k in range(len(self.stack) - 1, -1, -1):
                if self.stack[k][0] == tag:
                    for depth in sorted(self.pending, reverse=True):
                        if depth >= k:
                            subj, props, buf = self.pending.pop(depth)
                            self._emit(subj, props, "".join(buf).strip())
                    del self.stack[k:]
                    break

    p = P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return out


def rdfa_extract(
    pages: DataFrame, id_col: str = "id", html_col: str = "html"
) -> DataFrame:
    """Arrow-batched RDFa Lite extraction over an HTML column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for pid, html in zip(b[id_col], b[html_col]):
                if html is None:
                    continue
                for (subj, type_iri, psubj, pprop, prop,
                     value) in _parse_rdfa(html):
                    rows.append((pid, subj, type_iri, psubj, pprop,
                                 prop, value))
            yield pd.DataFrame(
                rows, columns=["id", "subj_no", "type_iri",
                               "parent_subj", "parent_prop", "prop",
                               "value"])

    return pages.select(id_col, html_col).mapInPandas(run, RDFA_SCHEMA)
