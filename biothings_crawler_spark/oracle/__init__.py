"""Frozen row-at-a-time oracle of the reference's extraction semantics.

extruct/Scrapy/lxml are not installed in this sandbox; these modules are
pure-stdlib re-implementations written from the cited reference call
sites (SURVEY.md §2.9) and the public extruct source
(github.com/scrapinghub/extruct, extruct/jsonld.py). They are the
authority the vectorized engine UDFs are byte-compared against — do not
"optimize" them.
"""

from biothings_crawler_spark.oracle.jsonld import extract_jsonld_items, page_text
from biothings_crawler_spark.oracle.geo_table import parse_geo_table

__all__ = ["extract_jsonld_items", "page_text", "parse_geo_table"]
