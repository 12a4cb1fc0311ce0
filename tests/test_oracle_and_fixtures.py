"""Frozen-oracle semantics + fixture determinism."""

import json

from biothings_crawler_spark.fixtures import corpus
from biothings_crawler_spark.oracle.geo_table import parse_geo_table
from biothings_crawler_spark.oracle.jsonld import extract_jsonld_items


def _page(payloads: list[str], extra: str = "") -> str:
    scripts = "\n".join(
        f'<script type="application/ld+json">{p}</script>' for p in payloads
    )
    return f"<html><body>{scripts}{extra}</body></html>"


URL = "https://x.example.org/r/1"


def test_plain_object_and_id_injection():
    items = extract_jsonld_items(_page(['{"@type":"Dataset","name":"n"}']), URL)
    assert items == [{"@type": "Dataset", "name": "n", "_id": URL}]


def test_explicit_id_wins():
    items = extract_jsonld_items(_page(['{"a":1}']), URL, _id="custom")
    assert items[0]["_id"] == "custom"


def test_top_level_array_multi_item():
    items = extract_jsonld_items(_page(['[{"a":1},{"b":2}]']), URL)
    assert [i["a" if "a" in i else "b"] for i in items] == [1, 2]
    assert all(i["_id"] == URL for i in items)


def test_comment_line_retry_paths():
    items = extract_jsonld_items(_page(['// c\n{"a":1}', '<!-- c -->\n{"b":2}']), URL)
    assert len(items) == 2


def test_strict_false_control_chars():
    payload = '{"a":"line1\nline2\ttab"}'
    items = extract_jsonld_items(_page([payload]), URL)
    assert items[0]["a"] == "line1\nline2\ttab"


def test_falsy_blocks_dropped():
    items = extract_jsonld_items(
        _page(["{}", "[]", "null", '""', '[{"a":1},{},null,""]']), URL
    )
    assert len(items) == 1 and items[0]["a"] == 1


def test_invalid_json_dropped():
    assert extract_jsonld_items(_page(["{nope"]), URL) == []


def test_no_jsonld_page():
    assert extract_jsonld_items("<html><body><p>x</p></body></html>", URL) == []


def test_other_script_types_ignored():
    html = '<html><body><script type="text/javascript">{"a":1}</script></body></html>'
    assert extract_jsonld_items(html, URL) == []


# --- GEO table oracle ---------------------------------------------------------

def test_geo_parse_semantics():
    html = corpus._geo_html(5, ["https://t.example.org/x"])
    data = parse_geo_table(html)
    assert data is not None
    assert data["_id"] == "GSE5"
    # single-value cell: string(td2) stripped, \xa0 -> ' '
    assert data["Title"] == "Expression data 5 study"
    # multi-value cell: key is first token of td1 text ('Contributor(s)\xa0')
    assert isinstance(data["Contributor(s)"], list)
    assert all(c.startswith("Contrib ") for c in data["Contributor(s)"])
    # placeholder + spanning rows skipped
    assert "" not in data
    assert data["Summary"] == "Synthetic GEO series 5."
    # Organism is single-value (no onmouseout): string() descends into <a>
    assert data["Organism"] == "Homo sapiens"


def test_geo_parse_empty_page():
    assert parse_geo_table("<html><body><p>nothing</p></body></html>") is None


# --- fixtures ----------------------------------------------------------------

def test_pages_deterministic_and_golden_matches_oracle():
    a = corpus.gen_pages(60)
    b = corpus.gen_pages(60)
    assert a == b
    for i, row in enumerate(a):
        html = row["html"].decode("utf-8")
        parser = corpus.parser_for_source(corpus.source_of(i))
        expect = corpus.canonical_json(
            corpus.oracle_page_items(parser, html, row["url"])
        )
        assert row["text"] == expect, row["url"]
        if parser == "jsonld":  # cross-check via the raw extractor too
            assert expect == corpus.canonical_json(
                extract_jsonld_items(html, row["url"])
            )


def test_pages_quirk_coverage():
    rows = corpus.gen_pages(200)
    saw_empty = saw_multi = saw_geo = 0
    for r in rows:
        items = json.loads(r["text"])
        if not items:
            saw_empty += 1
        if len(items) > 1:
            saw_multi += 1
        if "acc.cgi" in r["url"]:
            saw_geo += 1
            assert items and "_id" in items[0]
    assert saw_empty and saw_multi and saw_geo


def test_hot_host_skew():
    rows = corpus.gen_pages(1000)
    hot = sum(1 for r in rows if "figshare.example.org" in r["url"])
    assert hot == 300  # 30% on the hot host


def test_seed_robots_sitemap_shapes(spark):
    n = 200
    assert len({s["url"] for s in corpus.gen_seeds(n)}) == len(corpus.gen_seeds(n))
    hosts = {r["host"] for r in corpus.gen_robots()}
    assert "dataverse.example.org" in hosts  # Disallow-/ host
    sm = corpus.gen_sitemaps(n)
    assert any(s["is_index"] and s["child_sitemaps"] for s in sm)
    # two-level: an index whose child is itself an index
    by_url = {s["sitemap_url"]: s for s in sm}
    assert any(
        s["is_index"] and any(by_url[c]["is_index"] for c in s["child_sitemaps"] if c in by_url)
        for s in sm
    )
    # Spark DF builders round-trip
    assert corpus.pages_df(spark, 30).count() == 30
    assert corpus.robots_df(spark).count() == len(corpus.gen_robots())
