"""Frozen oracle: link extraction (Scrapy LinkExtractor analog).

Collects ``<a href>`` values in document order via stdlib html.parser
(independent of the engine's regex-scan UDF — the two are byte-compared
in tests), resolves them against the page URL (``response.urljoin``,
clic.py:84), and drops fragment-only / javascript: / mailto: links as
LinkExtractor's sanitization does.
"""

from __future__ import annotations

from html.parser import HTMLParser

from biothings_crawler_spark.urlnorm import urljoin


class _LinkCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break


def extract_links(html: str, base_url: str) -> list[str]:
    p = _LinkCollector()
    p.feed(html)
    out = []
    for href in p.hrefs:
        if href.startswith(("#", "javascript:", "mailto:")):
            continue
        out.append(urljoin(base_url, href))
    return out
