"""URL/domain blocklist filtering (UT1-style) for the crawl frontier.

Large-scale web-text pipelines (C4, RefinedWeb, FineWeb) drop documents
whose host falls under a curated domain blocklist — e.g. the UT1 adult/
malware category lists — where an entry ``bad.example.org`` blocks the
domain itself and every subdomain.  The reference crawler has no
blocklist stage (its seeds are curated APIs; crawler/spiders/* fetch
known-good sources), but a Common-Crawl-scale frontier needs one
before scheduling.

Matching semantics: a host is blocked iff some blocklist entry equals
the host OR is a label-boundary suffix of it (``host = d`` or
``host LIKE '%.d'``).  Substring matches do NOT count
(``notbad.example.org`` is not blocked by ``bad.example.org``).

Scale shape: the host's label-suffix set is bounded (≤ ``max_levels``),
so the filter is ``max_levels`` chained **broadcast LEFT ANTI joins**,
one per suffix depth — each join key is a row-local expression over the
host column, the blocklist broadcasts once, and the frontier itself is
never shuffled (the joins fuse into one whole-stage pipeline).  This
holds for real blocklists (UT1 ≈ 4M rows ≈ tens of MB).  For a
blocklist too large to broadcast, the same suffix expressions feed a
host-keyed shuffled anti-join instead — one exchange, co-partitioned
with the politeness groupBy(host) that follows in the round plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suffix_at_level(host, level: int):
    """Label-boundary suffix of ``host`` dropping ``level`` leading
    labels (level 0 = the host itself); NULL when the host has too few
    labels — a NULL join key matches nothing, so the row passes that
    level's anti-join untouched."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    sfx = F.array_join(F.slice(parts, level + 1, n), ".")
    return F.when(n >= F.lit(level + 1), sfx)


def blocklist_filter(
    frontier: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
    max_levels: int = 6,
) -> DataFrame:
    """Remove frontier rows whose host is equal to, or a subdomain of,
    any blocklist domain.  Hosts deeper than ``max_levels`` labels are
    only matched on their first ``max_levels`` suffix depths (UT1-class
    lists name registrable domains, 2-3 labels; 6 is generous).
    """
    out = frontier
    bl = F.broadcast(blocklist.select(F.col(domain_col).alias("__bl_domain")))
    for level in range(max_levels):
        key = suffix_at_level(F.col(host_col), level)
        out = out.join(bl, key == F.col("__bl_domain"), "left_anti")
    return out
