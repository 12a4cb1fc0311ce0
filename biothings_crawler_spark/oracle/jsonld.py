"""Frozen oracle: JSON-LD extraction with extruct semantics.

Reproduces, row-at-a-time, the reference's
``JsonLdExtractor().extract(response.body)`` + ``_id`` injection
(reference crawler/spiders/helper.py:30-50), per the public extruct
implementation (extruct/jsonld.py):

  1. parse HTML; select every ``<script type="application/ld+json">``
  2. take the node's string value (script content is CDATA-like — NO
     entity unescaping inside <script>)
  3. ``json.loads(script, strict=False)``; on ValueError retry after
     stripping a leading ``//...`` or ``<!--...-->`` comment line
     (regex ``^\\s*(//.*|<!--.*-->)``)
  4. a top-level JSON array yields one item per element; a dict yields
     one item; anything else yields none; falsy items are dropped
  5. inject ``_id`` = caller id if given else the response URL
     (helper.py:41-45)

HTML parsing uses stdlib ``html.parser`` (lxml absent here); script
elements are CDATA content in both parsers, so the extracted string
value agrees for the fixture corpus.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

from biothings_crawler_spark.functions.json_canon import canonical_json

# exact regex from public extruct source (extruct/jsonld.py)
HTML_OR_JS_COMMENTLINE = re.compile(r"^\s*(//.*|<!--.*-->)")


class _ScriptCollector(HTMLParser):
    """Collects the text content of application/ld+json scripts."""

    def __init__(self) -> None:
        # convert_charrefs affects normal text only; <script> content is
        # CDATA and delivered verbatim by html.parser either way.
        super().__init__(convert_charrefs=True)
        self.scripts: list[str] = []
        self._in_jsonld = False
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "script" and dict(attrs).get("type") == "application/ld+json":
            self._in_jsonld = True
            self._buf = []

    def handle_endtag(self, tag):
        if tag == "script" and self._in_jsonld:
            self._in_jsonld = False
            self.scripts.append("".join(self._buf))

    def handle_data(self, data):
        if self._in_jsonld:
            self._buf.append(data)


def _jsonld_scripts(html: str) -> list[str]:
    p = _ScriptCollector()
    p.feed(html)
    return p.scripts


def _extract_items(script: str) -> list:
    """extruct _extract_items: strict=False parse with comment-line retry."""
    try:
        data = json.loads(script, strict=False)
    except ValueError:
        try:
            data = json.loads(HTML_OR_JS_COMMENTLINE.sub("", script), strict=False)
        except ValueError:
            return []
    if isinstance(data, list):
        return [item for item in data if item]
    if isinstance(data, dict):
        return [data] if data else []
    return []


def extract_jsonld_items(html: str, url: str, _id: str | None = None) -> list[dict]:
    """All JSON-LD items of *html* with ``_id`` injected (helper.py:39-48)."""
    items = []
    for script in _jsonld_scripts(html):
        for item in _extract_items(script):
            if isinstance(item, dict):
                item = dict(item)
                item["_id"] = _id if _id else url
            items.append(item)
    return items


def page_text(html: str, url: str) -> str:
    """The golden ``text`` of a JSON-LD page: canonical JSON of its items."""
    return canonical_json(extract_jsonld_items(html, url))
