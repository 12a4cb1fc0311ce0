"""Frozen oracle: NCBI GEO nested-HTML-table scrape.

Reproduces reference crawler/spiders/focusedscrape/ncbi_geo.py:29-53
row-at-a-time with a stdlib mini-DOM (lxml absent):

  rows = xpath('/html/body/table/tr/td/table[6]/tr[3]/td[2]'
               '/table/tr/td/table/tr/td/table[2]/tr/td/table[1]/tr')
  for node in rows:
      if node.attrib.get('bgcolor') == '#cccccc':
          data['_id'] = node.xpath('.//strong').attrib.get('id')
      elif len(node.xpath('./td')) == 2:
          if node.xpath('string(./td[1])').get().strip():
              if node.xpath('./td[2]').attrib.get('onmouseout'):
                  key = node.xpath('./td[1]/text()').get().split()[0]
                  data[key] = node.xpath('./td[2]//a/text()').getall()
              else:
                  key = node.xpath('./td[1]/text()').get()
                  data[key] = node.xpath('string(./td[2])').get().strip().replace('\\xa0', ' ')
  return data if data else None

Semantics notes (all test-exercised):
  * ``text()`` = the element's first DIRECT text node (SelectorList.get()).
  * ``string(.)`` = concatenation of all descendant text.
  * entity references in normal (non-script) text resolve (``&nbsp;`` ->
    U+00A0), matching lxml.
  * lxml's HTML parser does NOT synthesize <tbody>; neither do we — the
    ``table/tr`` steps rely on that.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = {"br", "img", "meta", "link", "input", "hr", "area", "base", "col", "embed",
         "source", "track", "wbr"}


class Node:
    __slots__ = ("tag", "attrib", "children")

    def __init__(self, tag: str, attrib: dict):
        self.tag = tag
        self.attrib = attrib
        self.children: list = []  # Node | str (text chunk)

    def child_elems(self, tag: str | None = None) -> list["Node"]:
        return [c for c in self.children
                if isinstance(c, Node) and (tag is None or c.tag == tag)]

    def texts(self) -> list[str]:
        """Direct text nodes (xpath ``text()``)."""
        return [c for c in self.children if isinstance(c, str)]

    def string(self) -> str:
        """xpath ``string(.)``: all descendant text concatenated."""
        out: list[str] = []

        # depth-first, document order
        def walk(n: "Node"):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)
        walk(self)
        return "".join(out)

    def descendants(self, tag: str) -> list["Node"]:
        found: list[Node] = []

        def walk(n: "Node"):
            for c in n.children:
                if isinstance(c, Node):
                    if c.tag == tag:
                        found.append(c)
                    walk(c)
        walk(self)
        return found


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def build_dom(html: str) -> Node:
    b = _DomBuilder()
    b.feed(html)
    return b.root


# The reference's row path as (tag, index|None) steps; index is 1-based
# per-tag position, None = all matching children (node-set expansion).
GEO_ROW_PATH: list[tuple[str, int | None]] = [
    ("html", None), ("body", None), ("table", None), ("tr", None), ("td", None),
    ("table", 6), ("tr", 3), ("td", 2),
    ("table", None), ("tr", None), ("td", None),
    ("table", None), ("tr", None), ("td", None),
    ("table", 2), ("tr", None), ("td", None),
    ("table", 1), ("tr", None),
]


def xpath_steps(roots: list[Node], steps: list[tuple[str, int | None]]) -> list[Node]:
    nodes = roots
    for tag, idx in steps:
        nxt: list[Node] = []
        for n in nodes:
            matches = n.child_elems(tag)
            if idx is None:
                nxt.extend(matches)
            elif len(matches) >= idx:
                nxt.append(matches[idx - 1])
        nodes = nxt
    return nodes


def _first_text(node: Node) -> str | None:
    t = node.texts()
    return t[0] if t else None


def parse_geo_table(html: str) -> dict | None:
    """The GEO spider's ``parse`` (ncbi_geo.py:29-53), returns item or None."""
    root = build_dom(html)
    rows = xpath_steps([root], GEO_ROW_PATH)
    data: dict = {}
    for node in rows:
        if node.attrib.get("bgcolor") == "#cccccc":
            # SelectorList.attrib == first element's attrib ({} when empty),
            # so the reference stores None when no <strong id=...> exists
            strongs = node.descendants("strong")
            data["_id"] = strongs[0].attrib.get("id") if strongs else None
        else:
            tds = node.child_elems("td")
            if len(tds) == 2:
                if tds[0].string().strip():
                    if tds[1].attrib.get("onmouseout"):
                        key = _first_text(tds[0])
                        if key is None:
                            continue
                        key = key.split()[0]
                        data[key] = [t for a in tds[1].descendants("a") for t in a.texts()]
                    else:
                        key = _first_text(tds[0])
                        if key is None:
                            continue
                        data[key] = tds[1].string().strip().replace("\xa0", " ")
    return data if data else None
