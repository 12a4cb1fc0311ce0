"""robots.txt parsing: raw fetched bodies -> the structured per-host
rules table that :func:`..operators.politeness.apply_robots` and
:func:`..sources.sitemap.seed_sitemap_urls` consume.

Reference behavior being rebuilt: the reference relies on Scrapy's
``RobotsTxtMiddleware`` machinery plus hand-rolled uses — massbank
seeds its sitemap crawl from robots.txt ``Sitemap:`` directives
(crawler/spiders/massbank.py:10) and harvard documents honoring
``Crawl-delay: 10`` (crawler/spiders/harvard.py:20) — but never ships
its own parser (``ROBOTSTXT_OBEY=False``, crawler/settings.py:31).
At 10^10-frontier scale the robots corpus is itself a table (one
fetched body per host), so parsing must be a *columnar* operator, not
a per-request middleware.

Semantics implemented (RFC 9309, simplified where noted):

* Lines are ``key: value`` with ``#`` comments stripped; unknown keys
  and malformed lines are ignored but still terminate a user-agent
  header block.
* Consecutive ``User-agent:`` lines form ONE group sharing the
  following rules; any other line (including blank) ends the header
  block, so a later ``User-agent:`` starts a new group.
* Group selection: if any group names the target agent, the output is
  the union of rules from exactly those groups and ``*`` groups are
  ignored; otherwise the ``*`` groups apply.  (Simplification vs RFC:
  agent match is exact case-insensitive token equality, not
  longest-prefix product-token matching.)
* ``Allow:`` / ``Disallow:`` with an empty value carry no restriction
  and are dropped; rule order within the output arrays is line order.
* ``Crawl-delay:`` takes the LAST integer-valued occurrence in the
  applicable group class; a non-integer value is ignored.  No
  fallback from a matching specific group to ``*``.
* ``Sitemap:`` is global per RFC — collected from anywhere in the
  file, original case preserved.

Scale shape: the whole parse is ONE row-local ``aggregate`` fold over
the line array — zero exchanges, no UDF, no window.  The output is
|hosts|-bounded, i.e. the small dimension every crawl round broadcasts
(politeness.py:64).  Higher-order functions evaluate outside
whole-stage codegen (interpreted projection), which is fine here:
robots bodies are KB-sized and the table is 10^8 rows at worst, vs the
10^10-row frontier the result joins against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-line derived terms, repeated inline because SQL lambdas have no
# let-binding.  {r} is the lambda's line variable.
_C = "trim(regexp_replace({r}, '#.*', ''))"
_H = "instr(" + _C + ", ':') > 0"
_K = "lower(trim(substring_index(" + _C + ", ':', 1)))"
_V = "trim(substr(" + _C + ", instr(" + _C + ", ':') + 1))"

_EMPTY = "CAST(array() AS array<string>)"

_ZERO = (
    "named_struct("
    f"'grp', {_EMPTY}, 'lua', false, 'seen', false, "
    f"'asp', {_EMPTY}, 'dsp', {_EMPTY}, 'ast', {_EMPTY}, 'dst', {_EMPTY}, "
    "'ysp', CAST(-1 AS bigint), 'yst', CAST(-1 AS bigint), "
    f"'maps', {_EMPTY})"
)


def _acc(grp="acc.grp", lua="false", seen="acc.seen", asp="acc.asp",
         dsp="acc.dsp", ast="acc.ast", dst="acc.dst", ysp="acc.ysp",
         yst="acc.yst", maps="acc.maps") -> str:
    return (
        f"named_struct('grp', {grp}, 'lua', {lua}, 'seen', {seen}, "
        f"'asp', {asp}, 'dsp', {dsp}, 'ast', {ast}, 'dst', {dst}, "
        f"'ysp', {ysp}, 'yst', {yst}, 'maps', {maps})"
    )


def _merge(agent_lit: str) -> str:
    c, h, k, v = (_C.format(r="r"), _H.format(r="r"),
                  _K.format(r="r"), _V.format(r="r"))
    is_sp = f"array_contains(acc.grp, {agent_lit})"
    is_st = "array_contains(acc.grp, '*')"
    add = "concat({arr}, array({x}))"
    ua = _acc(
        grp=f"IF(acc.lua, {add.format(arr='acc.grp', x=f'lower({v})')}, "
            f"array(lower({v})))",
        lua="true",
        seen=f"acc.seen OR lower({v}) = {agent_lit}",
    )
    allow = _acc(
        asp=f"IF({is_sp}, {add.format(arr='acc.asp', x=v)}, acc.asp)",
        ast=f"IF(NOT {is_sp} AND {is_st}, {add.format(arr='acc.ast', x=v)}, acc.ast)",
    )
    dis = _acc(
        dsp=f"IF({is_sp}, {add.format(arr='acc.dsp', x=v)}, acc.dsp)",
        dst=f"IF(NOT {is_sp} AND {is_st}, {add.format(arr='acc.dst', x=v)}, acc.dst)",
    )
    delay = _acc(
        ysp=f"IF({is_sp}, CAST({v} AS bigint), acc.ysp)",
        yst=f"IF(NOT {is_sp} AND {is_st}, CAST({v} AS bigint), acc.yst)",
    )
    smap = _acc(maps=add.format(arr="acc.maps", x=v))
    return f"""(acc, r) -> CASE
      WHEN {h} AND {k} = 'user-agent' AND {v} <> '' THEN {ua}
      WHEN {h} AND {k} = 'allow' AND {v} <> '' THEN {allow}
      WHEN {h} AND {k} = 'disallow' AND {v} <> '' THEN {dis}
      WHEN {h} AND {k} = 'crawl-delay' AND {v} rlike '^[0-9]+$' THEN {delay}
      WHEN {h} AND {k} = 'sitemap' AND {v} <> '' THEN {smap}
      ELSE {_acc()} END"""


_FINISH = (
    "acc -> named_struct("
    "'allow', IF(acc.seen, acc.asp, acc.ast), "
    "'disallow', IF(acc.seen, acc.dsp, acc.dst), "
    "'crawl_delay', nullif(IF(acc.seen, acc.ysp, acc.yst), CAST(-1 AS bigint)), "
    "'sitemap_urls', acc.maps)"
)


def parse_robots_txt(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """Parse raw robots.txt bodies into ``(host, allow, disallow,
    crawl_delay, sitemap_urls)`` for the given user agent — the exact
    input contract of :func:`..operators.politeness.apply_robots` /
    :func:`..operators.politeness.host_budgets`.

    ``agent`` is matched as an exact case-insensitive token.  One input
    row per host; a host whose body yields no applicable rules gets
    empty arrays and a NULL crawl_delay (i.e. fully allowed).
    """
    agent_lit = "'" + agent.lower().replace("'", "''") + "'"
    fold = (
        f"aggregate(split({body_col}, '\\n'), {_ZERO}, "
        f"{_merge(agent_lit)}, {_FINISH})"
    )
    return df.select(
        F.col(host_col).alias("host"), F.expr(fold).alias("_r")
    ).select(
        "host",
        F.col("_r.allow").alias("allow"),
        F.col("_r.disallow").alias("disallow"),
        F.col("_r.crawl_delay").alias("crawl_delay"),
        F.col("_r.sitemap_urls").alias("sitemap_urls"),
    )


def render_robots_txt(
    policy: DataFrame,
    host_col: str = "host",
    agent: str = "*",
) -> DataFrame:
    """Render canonical robots.txt bodies from a policy table —
    the inverse of :func:`parse_robots_txt`, completing the
    parse/render symmetry the sitemap and WARC planes already have
    (sources/sitemap.render_sitemaps, sources/warc.render_warc).  A
    crawl operator publishes its OWN robots.txt for mirror endpoints,
    and round-tripping (``parse(render(p)) == p``, pinned in pytest)
    is the cheapest full-coverage proof both directions are faithful.

    Canonical form: one ``User-agent`` group with Allow lines first
    (input order), then Disallow, then ``Crawl-delay`` when set, then
    global ``Sitemap`` lines; LF separators, no trailing newline.
    Pure codegen projection — zero Exchange, zero Python."""
    def lines(prefix: str, arr: str):
        return F.transform(F.col(arr), lambda r: F.concat(
            F.lit(prefix + ": "), r))

    body = F.concat_ws(
        "\n",
        F.flatten(F.array(
            F.array(F.lit("User-agent: " + agent)),
            lines("Allow", "allow"),
            lines("Disallow", "disallow"),
            F.when(F.col("crawl_delay").isNotNull(),
                   F.array(F.concat(F.lit("Crawl-delay: "),
                                    F.col("crawl_delay").cast("string"))))
            .otherwise(F.array().cast("array<string>")),
            lines("Sitemap", "sitemap_urls"),
        )),
    )
    return policy.select(F.col(host_col).alias("host"),
                         body.alias("robots_txt"))
