"""Frozen oracle: BFS crawl simulator.

A pure-Python, single-threaded simulation of the crawl-round semantics
the Spark engine (plans/crawl.py) implements distributed. Both sides
share ONLY the specification below — the engine runs DataFrame joins /
windows / bloom segments; the oracle runs dicts and sorts. Equality of
(ordering, docs, seen set) between them is the SURVEY §5.3 end-to-end
gate and the north_rule "matching crawl ordering and URL-seen set under
the same seed list + politeness budget".

Specification (per round k):
  1. frontier dedup per canonical URL — winner = min
     (priority, depth, url, seed_id)
  2. robots filter (longest-match allow/disallow; skipped when
     obey_robots=False, which is the reference's actual configuration —
     crawler/settings.py:31)
  3. unseen filter — canonical URL never scheduled before (Scrapy
     RFPDupeFilter semantics: exactly-once per canonical URL per crawl)
  4. politeness — per host, budget = floor(round_seconds / crawl_delay)
     (min 1) else default_budget; select top-budget by
     (priority, url_hash, url_canon); rest are DEFERRED to round k+1
  5. fetch = lookup in the pages corpus by url_canon (miss = fetch
     failure, recorded, not retried — reference RETRY_ENABLED=False,
     clic.py:66)
  6. parse: items per the source's parser when url matches the policy's
     extract_regex (re.search); links when policy.follow, filtered by
     allow_link (re.search), same-domain (domain_key suffix match,
     reproducing the lstrip('www.') quirk) and depth+1 <= max_depth;
     link entries inherit priority/seed_id/source, depth+1, round k+1
  7. seen += scheduled; frontier(k+1) = deferred + new links
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from biothings_crawler_spark.functions.json_canon import canonical_json
from biothings_crawler_spark.fixtures.corpus import oracle_page_items
from biothings_crawler_spark.hashing import xxhash64_str
from biothings_crawler_spark.oracle.links import extract_links
from biothings_crawler_spark.urlnorm import canonicalize_url, domain_key, host_of


@dataclass
class CrawlConfig:
    max_rounds: int = 10
    default_budget: int = 1000
    round_seconds: float = 60.0
    obey_robots: bool = True
    n_segments: int = 16
    bloom_bits_per_segment: int = 1 << 17
    bloom_hashes: int = 7
    salt_target: int = 100_000


@dataclass
class SimResult:
    ordering: list[tuple]            # (round, host, sched_rank, url)
    docs: list[tuple]                # (round, url, item_json)
    seen: set                        # url_canon
    metrics: dict = field(default_factory=dict)  # (round, host) -> counters


def _entry(url: str, depth: int, priority: int, rnd: int, seed_id: str,
           source: str, parser: str) -> dict | None:
    canon = canonicalize_url(url)
    if canon is None:
        return None
    return {
        "url": url, "url_canon": canon, "url_hash": xxhash64_str(canon),
        "host": host_of(url), "depth": depth, "priority": priority,
        "round": rnd, "seed_id": seed_id, "source": source, "parser": parser,
    }


def _robots_blocked(path: str, allow: list, disallow: list) -> bool:
    a = max((len(p) for p in allow if path.startswith(p)), default=0)
    d = max((len(p) for p in disallow if path.startswith(p)), default=0)
    return d > a and d > 0


def _path_of(canon: str) -> str:
    return re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "", canon)


def simulate_crawl(
    pages: dict[str, str],          # url -> html (str)
    seeds: list[dict],
    robots: list[dict],
    policies: dict[str, dict],
    cfg: CrawlConfig,
) -> SimResult:
    pages_by_canon = {canonicalize_url(u): (u, h) for u, h in pages.items()}
    robots_by_host = {r["host"]: r for r in robots}

    def budget_of(host: str) -> int:
        r = robots_by_host.get(host)
        if r and r.get("crawl_delay"):
            return max(1, int(cfg.round_seconds / r["crawl_delay"]))
        return cfg.default_budget

    frontier: list[dict] = []
    for s in seeds:
        e = _entry(s["url"], 0, s["priority"], 0, s["seed_id"], s["source"], s["parser"])
        if e:
            frontier.append(e)

    seen: set[str] = set()
    ordering: list[tuple] = []
    docs: list[tuple] = []
    metrics: dict = {}

    for rnd in range(cfg.max_rounds):
        if not frontier:
            break
        # 1. dedup by canonical URL
        best: dict[str, dict] = {}
        for e in frontier:
            k = e["url_canon"]
            cur = best.get(k)
            key = (e["priority"], e["depth"], e["url"], e["seed_id"])
            if cur is None or key < (cur["priority"], cur["depth"], cur["url"], cur["seed_id"]):
                best[k] = e
        cands = list(best.values())
        # 2. robots
        if cfg.obey_robots:
            kept = []
            for e in cands:
                r = robots_by_host.get(e["host"])
                if r and _robots_blocked(_path_of(e["url_canon"]), r["allow"], r["disallow"]):
                    continue
                kept.append(e)
            cands = kept
        # 3. unseen
        cands = [e for e in cands if e["url_canon"] not in seen]
        # 4. politeness
        by_host: dict[str, list[dict]] = {}
        for e in cands:
            by_host.setdefault(e["host"], []).append(e)
        scheduled: list[dict] = []
        deferred: list[dict] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (e["priority"], e["url_hash"], e["url_canon"]))
            b = budget_of(host)
            for rank, e in enumerate(entries[:b], start=1):
                e = dict(e)
                e["sched_rank"] = rank
                scheduled.append(e)
            deferred.extend(entries[b:])
        # 5-6. fetch + parse
        next_frontier: list[dict] = list(deferred)
        for e in scheduled:
            ordering.append((rnd, e["host"], e["sched_rank"], e["url_canon"]))
            m = metrics.setdefault((rnd, e["host"]),
                                   {"scheduled": 0, "fetched": 0, "docs": 0, "links": 0})
            m["scheduled"] += 1
            seen.add(e["url_canon"])
            hit = pages_by_canon.get(e["url_canon"])
            if hit is None:
                continue
            m["fetched"] += 1
            orig_url, html = hit
            pol = policies.get(e["source"], policies.get("web"))
            ex = pol.get("extract_regex")
            if ex is None or re.search(ex, e["url"]):
                for item in oracle_page_items(e["parser"], html, e["url"]):
                    docs.append((rnd, e["url_canon"], canonical_json(item)))
                    m["docs"] += 1
            if pol.get("follow"):
                md = pol.get("max_depth")
                if md is None or e["depth"] + 1 <= md:
                    dk = domain_key(e["host"])
                    for link in extract_links(html, e["url"]):
                        if pol.get("allow_link") and not re.search(pol["allow_link"], link):
                            continue
                        lh = host_of(link)
                        if pol.get("same_domain") and lh is not None:
                            if not (lh == dk or lh.endswith("." + dk)):
                                continue
                        ne = _entry(link, e["depth"] + 1, e["priority"], rnd + 1,
                                    e["seed_id"], e["source"], e["parser"])
                        if ne:
                            next_frontier.append(ne)
                            m["links"] += 1
        frontier = next_frontier
    return SimResult(ordering=ordering, docs=docs, seen=seen, metrics=metrics)
