"""Driver-contract query registry: one (Spark query, DuckDB oracle SQL)
pair per operator family from SURVEY.md §2, all over the driver's
testdata tables (region nation customer supplier part orders lineitem
events documents embeddings).

Design rules that make the value-hash comparison deterministic:

  * **Money/measure aggregation goes through DECIMAL.** Double sums are
    partial-aggregation-order dependent; summing CAST(x AS DECIMAL(18,6))
    is exact in both engines, then one CAST to DOUBLE at the end is the
    same nearest-double on both sides.
  * **Averages are computed as exact_sum_double / count**, never the
    engines' avg() (whose internal accumulation order differs).
  * **Hash-bearing operators use the md5 family** (`hash_family='md5'`
    variants of SimHash / hyperplane-LSH / centroid picking):
    Spark's md5() and DuckDB's md5() agree byte-for-byte, so even the
    LSH banding internals get a CONFIRMED oracle. xxhash64 remains the
    production scale path.
  * **Float vector math is written as an identical left fold** on both
    sides (Spark `aggregate`/`zip_with`; DuckDB `list_reduce` over
    per-element FLOAT products cast to DOUBLE) — bit-identical cosines.
  * **Integer-valued outputs are cast to BIGINT on both sides**
    (row_number ranks, counts, bit counts) so pandas dtypes align.
  * Timestamps are emitted as formatted strings.

Scale notes live with each operator's implementation module; these
wrappers only choose literals small enough for the sf0.01 oracle run
while exercising the exact production code path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.dedup import (
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from biothings_crawler_spark.operators.frontier import dedup_frontier, frontier_from_seeds
from biothings_crawler_spark.sources.api import expand_api_pages, stop_at_short_page
from biothings_crawler_spark.sources.idrange import id_list_seeds, id_range_seeds
from biothings_crawler_spark.sources.sitemap import expand_sitemaps
from biothings_crawler_spark.streaming.incremental import incremental_round
from biothings_crawler_spark.operators.extract import (
    extract_hub_table_links_udf,
    extract_items_udf,
    extract_links_udf,
    extract_website_field_links_udf,
)
from biothings_crawler_spark.plans.upload import transform_docs
from biothings_crawler_spark.urlnorm import domain_key_col
from biothings_crawler_spark.operators.multimodal import extract_media_features
from biothings_crawler_spark.operators.politeness import (
    apply_robots,
    host_budgets,
    select_politely,
)
from biothings_crawler_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    ivf_topk,
    pick_centroids,
    read_ivf_index,
    write_ivf_index,
)
from biothings_crawler_spark.operators.text import (
    lang_id_col,
    line_dedup,
    quality_score_col,
    token_count_col,
)
from biothings_crawler_spark.plans.analysis import (
    coverage_pivot,
    field_coverage,
    funder_counts,
    sample_docs,
    search_view,
    transform_hits,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SOURCES = [f"src{i}" for i in range(20)]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scratch_index_path(kind: str, sf_dir: str) -> str:
    """Per-(pid, kind, sf) scratch dir for persisted on-disk indexes.

    pid-keyed so concurrent sessions over the same sf never race on the
    overwrite (and never collide on /tmp ownership across users); repeat
    calls within one process overwrite idempotently; an atexit hook
    removes every dir this process created, so gate/bench runs leave no
    index copies behind in /tmp (the index must outlive the returning
    DataFrame — probes re-read it lazily — so cleanup waits for exit)."""
    import atexit
    import os
    import shutil
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{kind}_{os.getpid()}_"
        + os.path.basename(os.path.normpath(sf_dir)),
    )
    if path not in _SCRATCH_PATHS:
        _SCRATCH_PATHS.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


_SCRATCH_PATHS: set[str] = set()


def _dec(c) -> F.Column:
    return F.col(c).cast("decimal(18,6)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(18,6)")

# SQL fragment: exact-fold cosine between two FLOAT[] columns (DuckDB).
# Mirrors operators/dedup.cosine_col: FLOAT multiply, DOUBLE left-fold.


def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_reduce(list_transform(range({dim}), "
        f"i -> CAST({a}[i+1] * {b}[i+1] AS DOUBLE)), (x, y) -> x + y)"
    )


def _sql_cosine(a: str, b: str, dim: int = 64) -> str:
    na = (f"sqrt(list_reduce(list_transform(range({dim}), "
          f"i -> CAST({a}[i+1] * {a}[i+1] AS DOUBLE)), (x, y) -> x + y))")
    nb = (f"sqrt(list_reduce(list_transform(range({dim}), "
          f"i -> CAST({b}[i+1] * {b}[i+1] AS DOUBLE)), (x, y) -> x + y))")
    return f"({_sql_dot(a, b, dim)} / ({na} * {nb}))"


# DuckDB shingle pipeline (mirrors operators/dedup.shingles_col, k=3)
_SQL_SHINGLES = """
    w AS (
      SELECT doc_id,
             list_filter(
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
               x -> len(x) > 0) AS words
      FROM documents),
    s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN [array_to_string(words[j:j+2], ' ') for j in range(1, len(words) - 1)]
               ELSE [array_to_string(words, ' ')] END) AS sh
      FROM w)
"""

# ---------------------------------------------------------------------------
# relational core (reference analysis/join/agg shapes over TPC-H-ish tables)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + hash agg (partial/final), exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    charge = disc_price * (_one() + _dec("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        F.round(F.col("_sq").cast("double"), 4).alias("sum_qty"),
        F.round(F.col("_sbp").cast("double"), 4).alias("sum_base_price"),
        F.round(F.col("_sdp").cast("double"), 4).alias("sum_disc_price"),
        F.round(F.col("_sc").cast("double"), 4).alias("sum_charge"),
        F.round(F.col("_sq").cast("double") / F.col("count_order"), 4).alias("avg_qty"),
        F.round(F.col("_sbp").cast("double") / F.col("count_order"), 4).alias("avg_price"),
        "count_order",
    )


SQL_PRICING_SUMMARY = """
WITH a AS (
  SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS _sq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS _sbp,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS _sdp,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
             * (1 + CAST(l_tax AS DECIMAL(18,6)))) AS _sc,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus,
       round(CAST(_sq AS DOUBLE), 4) AS sum_qty,
       round(CAST(_sbp AS DOUBLE), 4) AS sum_base_price,
       round(CAST(_sdp AS DOUBLE), 4) AS sum_disc_price,
       round(CAST(_sc AS DOUBLE), 4) AS sum_charge,
       round(CAST(_sq AS DOUBLE) / count_order, 4) AS avg_qty,
       round(CAST(_sbp AS DOUBLE) / count_order, 4) AS avg_price,
       count_order
FROM a
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k (TakeOrderedAndProject).

    Plan: the BUILDING-segment customer filter is applied to orders
    FIRST via a broadcast left-semi join, so the only big shuffle
    (lineitem |><| orders on orderkey) carries ~1/5 of orders and its
    output shrinks to match; the groupBy key equals the join key, so
    the aggregation reuses the join partitioning (no second exchange).
    The previous shape joined FULL lineitem to FULL orders before the
    segment filter could bite — 5x the shuffle for the same 10 rows."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").join(
        F.broadcast(cust.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    ).select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(revenue).cast("double"), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TOP_REVENUE_ORDERS = """
SELECT o_orderkey, o_orderpriority,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1, 2
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through region→nation→customer→orders→lineitem; small
    dims broadcast (no shuffle of the fact side until the agg)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(revenue).cast("double"), 4).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# crawl-engine shapes (politeness window, seen anti-join, frontier dedup)
# ---------------------------------------------------------------------------

POLITENESS_BUDGET = 5


def q_politeness_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real two-phase salted per-host budget selection
    (operators/politeness.select_politely) — users stand in for hosts,
    event ids for url hashes. The oracle is the naive global window the
    salted plan must equal exactly."""
    ev = _t(spark, sf_dir, "events")
    cand = ev.select(
        F.col("user_id").cast("string").alias("host"),
        F.lpad(F.col("event_id").cast("string"), 12, "0").alias("url_canon"),
        F.col("event_id").alias("url_hash"),
        F.lit(0).alias("priority"),
        F.col("user_id"),
        F.col("event_id"),
    )
    budgets = spark.createDataFrame([], "host string, budget int")
    sel = select_politely(cand, budgets, POLITENESS_BUDGET, salt_target=2000)
    return sel.select(
        "user_id", "event_id", F.col("sched_rank").cast("long").alias("sched_rank")
    )


SQL_POLITENESS_QUOTA = f"""
SELECT user_id, event_id, CAST(rn AS BIGINT) AS sched_rank
FROM (SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events)
WHERE rn <= {POLITENESS_BUDGET}
"""


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-seen anti-join shape (SURVEY.md §2.4 row 1) as left_anti."""
    orders = _t(spark, sf_dir, "orders")
    seen = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        orders.join(F.broadcast(seen), orders.o_custkey == seen.c_custkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_unseen"))
    )


SQL_SEEN_ANTIJOIN = """
SELECT o_orderpriority, COUNT(*) AS n_unseen
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
GROUP BY 1
"""


def q_frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real frontier construction + deterministic-winner dedup
    (operators/frontier) over URLs synthesized from orders columns."""
    orders = _t(spark, sf_dir, "orders")
    seeds = orders.select(
        F.concat(
            F.lit("https://h"), (F.col("o_custkey") % 7).cast("string"),
            F.lit(".example.org/o/"), (F.col("o_orderkey") % 500).cast("string"),
        ).alias("url"),
        (F.col("o_orderkey") % 3).cast("int").alias("priority"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("seed_id"),
        F.lit("synthetic").alias("source"),
        F.lit("jsonld").alias("parser"),
    )
    fr = dedup_frontier(frontier_from_seeds(seeds))
    return fr.select("url", "host", F.col("priority").cast("long").alias("priority"),
                     "seed_id")


SQL_FRONTIER_DEDUP = """
WITH f AS (
  SELECT 'https://h' || CAST(o_custkey % 7 AS VARCHAR) || '.example.org/o/'
           || CAST(o_orderkey % 500 AS VARCHAR) AS url,
         'h' || CAST(o_custkey % 7 AS VARCHAR) || '.example.org' AS host,
         CAST(o_orderkey % 3 AS BIGINT) AS priority,
         lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS seed_id
  FROM orders)
SELECT url, host, priority, seed_id
FROM (SELECT *, row_number() OVER (PARTITION BY url ORDER BY priority, seed_id) AS rn
      FROM f)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# reference analysis layer (field coverage, pivot, funder top-k, search)
# ---------------------------------------------------------------------------


def _docs_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → schema-free doc_json rows exactly like the crawl
    output (SURVEY.md §1.4: dynamic schema = JSON payload column).
    Field presence varies per row so coverage is non-trivial."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "source",
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("_id"),
        F.to_json(F.struct(
            F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("_id"),
            F.col("text").alias("description"),
            F.col("lang").alias("inLanguage"),
            F.when(F.col("n_chars") % 2 == 0, F.split(F.col("text"), " ")).alias("keywords"),
            F.when(
                F.col("lang") == "en",
                F.struct(F.lit("Organization").alias("@type"),
                         F.concat(F.lit("Fund-"), (F.col("doc_id") % 7).cast("string")).alias("name")),
            ).alias("curatedBy"),
            F.col("n_chars").alias("payload_chars"),
        )).alias("doc_json"),
    )


def q_field_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read field/type coverage (field_aggs.py:37-58) via the
    vectorized melt UDF over the JSON payload column."""
    cov = field_coverage(_docs_frame(spark, sf_dir))
    return cov.select("source", "field", "valtype", "n", "ratio")


SQL_FIELD_COVERAGE = """
WITH t AS (SELECT source, COUNT(*) AS total FROM documents GROUP BY source),
m AS (
  SELECT source, '_id' AS field, 'str' AS valtype FROM documents
  UNION ALL SELECT source, 'description', 'str' FROM documents
  UNION ALL SELECT source, '__EE__', 'str' FROM documents
  UNION ALL SELECT source, 'keywords', 'list' FROM documents WHERE n_chars % 2 = 0
  UNION ALL SELECT source, 'curatedBy', 'dict' FROM documents WHERE lang = 'en'
  UNION ALL SELECT source, '__EE__', 'int' FROM documents),
c AS (SELECT source, field, valtype, COUNT(*) AS n FROM m GROUP BY 1, 2, 3),
pf AS (SELECT source, field, SUM(n) AS n_field FROM c GROUP BY 1, 2)
SELECT c.source, c.field, c.valtype, c.n,
       CAST(pf.n_field AS DOUBLE) / t.total AS ratio
FROM c JOIN pf USING (source, field) JOIN t USING (source)
"""


def q_coverage_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fields × sources ratio matrix (field_aggs.py:75-83)."""
    cov = field_coverage(_docs_frame(spark, sf_dir))
    return coverage_pivot(cov, SOURCES)


SQL_COVERAGE_PIVOT = """
WITH t AS (SELECT source, COUNT(*) AS total FROM documents GROUP BY source),
m AS (
  SELECT source, '_id' AS field FROM documents
  UNION ALL SELECT source, 'description' FROM documents
  UNION ALL SELECT source, '__EE__' FROM documents
  UNION ALL SELECT source, 'keywords' FROM documents WHERE n_chars % 2 = 0
  UNION ALL SELECT source, 'curatedBy' FROM documents WHERE lang = 'en'
  UNION ALL SELECT source, '__EE__' FROM documents),
pf AS (SELECT source, field, COUNT(*) AS n_field FROM m GROUP BY 1, 2),
r AS (SELECT pf.source, pf.field, CAST(pf.n_field AS DOUBLE) / t.total AS ratio
      FROM pf JOIN t USING (source))
SELECT field, {cols}
FROM r GROUP BY field ORDER BY field
""".format(cols=", ".join(
    f"max(CASE WHEN source = '{s}' THEN ratio END) AS {s}" for s in SOURCES
))


def q_funder_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode-funder top-k (funder.py:34-49) over constructed docs with
    1–2 funders each."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "source",
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("_id"),
        F.to_json(F.struct(F.when(
            F.col("doc_id") % 3 == 0,
            F.array(
                F.struct(F.lit("Organization").alias("@type"),
                         F.concat(F.lit("Fund-"), (F.col("doc_id") % 7).cast("string")).alias("name")),
                F.struct(F.lit("Organization").alias("@type"),
                         F.concat(F.lit("FundB-"), (F.col("doc_id") % 4).cast("string")).alias("name")),
            ),
        ).otherwise(F.array(
            F.struct(F.lit("Organization").alias("@type"),
                     F.concat(F.lit("Fund-"), (F.col("doc_id") % 7).cast("string")).alias("name")),
        )).alias("funder"))).alias("doc_json"),
    )
    return funder_counts(docs, top_k=50)


SQL_FUNDER_TOP = """
WITH f AS (
  SELECT 'Fund-' || CAST(doc_id % 7 AS VARCHAR) AS name FROM documents
  UNION ALL
  SELECT 'FundB-' || CAST(doc_id % 4 AS VARCHAR) FROM documents WHERE doc_id % 3 = 0)
SELECT name, COUNT(*) AS n FROM f GROUP BY 1 ORDER BY n DESC, name LIMIT 50
"""


SEARCH_TERM = "spark"


def q_search_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dis_max relevance proxy (web/pipeline.py:12-30): name^6,
    description^3, any-field^1."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "source",
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("_id"),
        F.to_json(F.struct(
            F.substring(F.col("text"), 1, 40).alias("name"),
            F.col("text").alias("description"),
        )).alias("doc_json"),
    )
    return search_view(docs, SEARCH_TERM).select("source", "_id", "_score")


SQL_SEARCH_VIEW = f"""
SELECT source, _id, CAST(_score AS DOUBLE) AS _score FROM (
  SELECT source, 'doc' || CAST(doc_id AS VARCHAR) AS _id,
         (CASE WHEN contains(lower(substr(text, 1, 40)), '{SEARCH_TERM}') THEN 6.0 ELSE 0.0 END
          + CASE WHEN contains(lower(text), '{SEARCH_TERM}') THEN 3.0 ELSE 0.0 END
          + CASE WHEN contains(lower(text), '{SEARCH_TERM}')
                   OR contains(lower(substr(text, 1, 40)), '{SEARCH_TERM}') THEN 1.0 ELSE 0.0 END
         ) AS _score
  FROM documents)
WHERE _score > 0
"""


# ---------------------------------------------------------------------------
# training-data pipeline: dedup family
# ---------------------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d, "doc_id", "text")


SQL_EXACT_DEDUP = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", k=3, n_perm=16, bands=4,
                             verify_threshold=0.5)


# affine-family constants interpolated from the OPERATOR's own values
# (operators.dedup) — the twin can't drift from the engine
from biothings_crawler_spark.operators.dedup import (  # noqa: E402
    MINHASH_P as _MH_P,
    _MH_A,
    _MH_B,
)

_MH_A16 = ", ".join(str(a) for a in _MH_A[:16])
_MH_B16 = ", ".join(str(b) for b in _MH_B[:16])

SQL_MINHASH_LSH = f"""
WITH {_SQL_SHINGLES},
hv AS (
  SELECT doc_id, sh,
         list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT
                                 % {_MH_P}) AS hv
  FROM s),
sig AS (
  SELECT doc_id, sh,
         [list_min(list_transform(hv, h -> ([{_MH_A16}][j+1] * h
                                            + [{_MH_B16}][j+1]) % {_MH_P}))
          for j in range(16)] AS sig
  FROM hv),
banded AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_transform(sig[b*4+1:b*4+4],
                                        v -> CAST(v AS VARCHAR)), '|') AS band_key
  FROM sig, unnest(range(4)) AS u(b)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, jaccard FROM (
  SELECT p.id_a, p.id_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
  FROM pairs p
  JOIN s sa ON sa.doc_id = p.id_a
  JOIN s sb ON sb.doc_id = p.id_b)
WHERE jaccard >= 0.5
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs Jaccard — the LSH recall oracle (only run
    at oracle scale; the LSH path is the 10^10 plan)."""
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5)


SQL_NGRAM_JACCARD = f"""
WITH {_SQL_SHINGLES}
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
  FROM s a, s b WHERE a.doc_id < b.doc_id)
WHERE jaccard >= 0.5
"""

_SQL_HASH60 = "CAST(('0x' || substr(md5({w}), 1, 15)) AS BIGINT)"


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    p = simhash_pairs(d, "doc_id", "text", max_hamming=8, hash_family="md5")
    return p.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


SQL_SIMHASH_PAIRS = f"""
WITH words AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> len(x) > 0)) AS ws
  FROM documents),
sig AS (
  SELECT doc_id,
         list_sum(list_transform(range(60), i ->
           CASE WHEN list_sum(list_transform(ws, w ->
                  CASE WHEN ({_SQL_HASH60.format(w='w')} >> i) & 1 = 1
                       THEN 1 ELSE -1 END)) > 0
                THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))::BIGINT AS sig
  FROM words),
banded AS (
  SELECT doc_id, sig, b AS band_id, (sig >> (b * 15)) & 32767 AS band_key
  FROM sig, unnest(range(4)) AS u(b)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM pairs
WHERE bit_count(xor(sig_a, sig_b)) <= 8
"""


EMB_TABLES = 2


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        e, "vec_id", "embedding", dim=64, threshold=0.25, n_planes=8,
        hash_family="md5", n_tables=EMB_TABLES,
    )


def _sql_plane_sig(vec: str, n_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    terms = []
    for p in range(n_planes):
        dot = (
            f"list_reduce(list_transform(range({dim}), i -> "
            f"CAST({vec}[i+1] AS DOUBLE) * (CASE WHEN substr(md5('{seed}:{p}:' || CAST(i AS VARCHAR)), 1, 1) < '8' "
            f"THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y)"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END")
    return "(" + " | ".join(terms) + ")"


_SQL_EMB_SIGS = ",\n".join(
    f"sig{t} AS (SELECT vec_id AS id, "
    f"{_sql_plane_sig('embedding', seed=42 + 1000 * t)} AS bucket FROM embeddings)"
    for t in range(EMB_TABLES)
)
_SQL_EMB_UNION = "\n  UNION\n".join(
    f"  SELECT a.id AS id_a, b.id AS id_b FROM sig{t} a JOIN sig{t} b "
    f"USING (bucket) WHERE a.id < b.id"
    for t in range(EMB_TABLES)
)

SQL_EMBEDDING_NEAR_DUP = f"""
WITH {_SQL_EMB_SIGS},
pairs AS (
{_SQL_EMB_UNION}),
base AS (SELECT vec_id AS id, embedding AS v FROM embeddings)
SELECT id_a, id_b, cosine FROM (
  SELECT p.id_a, p.id_b, {_sql_cosine('a.v', 'b.v')} AS cosine
  FROM pairs p JOIN base a ON a.id = p.id_a JOIN base b ON b.id = p.id_b)
WHERE cosine >= 0.25
"""


# ---------------------------------------------------------------------------
# similarity search (brute-force + IVF)
# ---------------------------------------------------------------------------

N_QUERY_VECS = 5


def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    out = brute_force_topk(e, q, "vec_id", "embedding", k=10)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


SQL_ANN_BRUTE_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id, embedding AS v FROM embeddings),
sc AS (SELECT query_id, vec_id, {_sql_cosine('qv', 'v')} AS cosine FROM c, q)
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM sc)
WHERE rn <= 10
"""

def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector 8-bit scalar quantization (operators/quantize) — the
    4x index-compression path for 10^10-vector ANN. Codes use explicit
    floor(x+0.5) rounding in DOUBLE so the DuckDB twin reproduces them
    bit-for-bit (round() half-modes differ between the engines). Codes
    emitted as a canonical comma string (array columns don't hash
    portably)."""
    from biothings_crawler_spark.operators.quantize import quantize_embeddings

    qt = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return qt.select(
        "vec_id",
        "vmin",
        "vmax",
        F.array_join(
            F.transform(F.col("qvec"), lambda q: q.cast("string")), ","
        ).alias("qcodes"),
    )


SQL_QUANTIZE_EMBEDDINGS = """
WITH mm AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS vmin,
         CAST(list_max(embedding) AS DOUBLE) AS vmax
  FROM embeddings)
SELECT vec_id, vmin, vmax,
       array_to_string(
         list_transform(embedding,
           x -> CAST(CAST(CASE WHEN vmax - vmin > 0
                     THEN floor((CAST(x AS DOUBLE) - vmin) * 255
                                / (vmax - vmin) + 0.5)
                     ELSE 0 END AS INT) AS VARCHAR)),
         ',') AS qcodes
FROM mm
"""


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute top-k over the QUANTIZED index (dequantize -> cosine)
    against full-precision query vectors — the serving arithmetic when
    the stored index is 8-bit codes; exact oracle because quantize,
    dequantize, and the cosine fold are the same IEEE doubles in both
    engines. Recall vs full precision is pytest-measured separately."""
    from biothings_crawler_spark.operators.quantize import (
        quantize_embeddings,
        quantized_brute_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    out = quantized_brute_topk(quantize_embeddings(e), q, k=10)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


SQL_ANN_QUANTIZED_TOPK = f"""
WITH mm AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS vmin,
         CAST(list_max(embedding) AS DOUBLE) AS vmax
  FROM embeddings),
qt AS (
  SELECT vec_id, vmin, vmax,
         list_transform(embedding,
           x -> CAST(CASE WHEN vmax - vmin > 0
                     THEN floor((CAST(x AS DOUBLE) - vmin) * 255
                                / (vmax - vmin) + 0.5)
                     ELSE 0 END AS INT)) AS qvec
  FROM mm),
c AS (
  SELECT vec_id,
         list_transform(qvec,
           q -> vmin + CAST(q AS DOUBLE) * ((vmax - vmin) / 255.0)) AS v
  FROM qt),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id < {{n_query}}),
sc AS (SELECT query_id, vec_id, {{cosine}} AS cosine FROM c, q)
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM sc)
WHERE rn <= 10
"""
SQL_ANN_QUANTIZED_TOPK = SQL_ANN_QUANTIZED_TOPK.format(
    n_query=N_QUERY_VECS, cosine=_sql_cosine("qv", "v")
)


IVF_CENTROIDS = 8
IVF_NPROBE = 3
IVF_K = 5


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the PERSISTED on-disk index: build (assign_cells ->
    write_ivf_index, parquet partitioned by cell), then probe the
    re-read index — so the gate's own plan runs the 10^10-row shape:
    the probe join's partition filter prunes the scan to the nprobe
    probed cells (dynamic partition pruning against the broadcast
    probes side; pytest asserts the pruning expression in THIS query's
    plan). The index lands in a per-sf temp dir, rebuilt idempotently
    per call and removed at interpreter exit."""
    e = _t(spark, sf_dir, "embeddings")
    cents = pick_centroids(e, "vec_id", "embedding", IVF_CENTROIDS, hash_family="md5")
    cells = assign_cells(e, cents, "vec_id", "embedding")
    idx_path = _scratch_index_path("ivf", sf_dir)
    write_ivf_index(cells, idx_path)
    idx = read_ivf_index(spark, idx_path)
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    out = ivf_topk(idx, cents, q, "vec_id", "embedding", k=IVF_K, nprobe=IVF_NPROBE)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


SQL_ANN_IVF_TOPK = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_CENTROIDS}),
asg AS (
  SELECT vec_id, v, centroid_id AS cell FROM (
    SELECT e.vec_id, e.embedding AS v, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_cosine('e.embedding', 'cent.cv')} DESC,
                                       cent.centroid_id) AS rn
    FROM embeddings e, cent)
  WHERE rn = 1),
probes AS (
  SELECT query_id, qv, centroid_id AS cell FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qv, cent.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_sql_cosine('q.embedding', 'cent.cv')} DESC,
                                       cent.centroid_id) AS rn
    FROM embeddings q, cent WHERE q.vec_id < {N_QUERY_VECS})
  WHERE rn <= {IVF_NPROBE}),
sc AS (
  SELECT p.query_id, a.vec_id, {_sql_cosine('p.qv', 'a.v')} AS cosine
  FROM asg a JOIN probes p USING (cell))
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM sc)
WHERE rn <= {IVF_K}
"""


def q_ann_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the QUANTIZED persisted index (operators/quantize.
    write_quantized_ivf_index): 8-bit codes + (vmin, vmax) partitioned
    by cell on disk, probe with the same DPP-pruned plan as
    q_ann_ivf_topk, dequantize only the probe sliver. Exact oracle:
    quantize, dequantize, and the cosine fold are the same IEEE doubles
    in both engines. Recall@k vs the full-precision IVF is
    pytest-enforced (>= 0.9)."""
    from biothings_crawler_spark.operators.quantize import (
        ivf_quantized_topk,
        write_quantized_ivf_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = pick_centroids(e, "vec_id", "embedding", IVF_CENTROIDS, hash_family="md5")
    cells = assign_cells(e, cents, "vec_id", "embedding")
    idx_path = _scratch_index_path("ivfq", sf_dir)
    write_quantized_ivf_index(cells, idx_path)
    qidx = spark.read.parquet(idx_path)
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    out = ivf_quantized_topk(qidx, cents, q, "vec_id", "embedding",
                             k=IVF_K, nprobe=IVF_NPROBE)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


_SQL_IVFQ_CTES = f"""cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_CENTROIDS}),
asg AS (
  SELECT vec_id, v, centroid_id AS cell FROM (
    SELECT e.vec_id, e.embedding AS v, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_cosine('e.embedding', 'cent.cv')} DESC,
                                       cent.centroid_id) AS rn
    FROM embeddings e, cent)
  WHERE rn = 1),
mm AS (
  SELECT vec_id, cell, v,
         CAST(list_min(v) AS DOUBLE) AS vmin,
         CAST(list_max(v) AS DOUBLE) AS vmax
  FROM asg),
deq AS (
  SELECT vec_id, cell,
         list_transform(v,
           x -> vmin + CAST(CAST(CASE WHEN vmax - vmin > 0
                      THEN floor((CAST(x AS DOUBLE) - vmin) * 255
                                 / (vmax - vmin) + 0.5)
                      ELSE 0 END AS INT) AS DOUBLE)
                * ((vmax - vmin) / 255.0)) AS dv
  FROM mm),
probes AS (
  SELECT query_id, qv, centroid_id AS cell FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qv, cent.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_sql_cosine('q.embedding', 'cent.cv')} DESC,
                                       cent.centroid_id) AS rn
    FROM embeddings q, cent WHERE q.vec_id < {N_QUERY_VECS})
  WHERE rn <= {IVF_NPROBE}),
sc AS (
  SELECT p.query_id, d.vec_id, {_sql_cosine('p.qv', 'd.dv')} AS cosine
  FROM deq d JOIN probes p USING (cell))"""

SQL_ANN_IVF_QUANTIZED = f"""
WITH {_SQL_IVFQ_CTES}
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM sc)
WHERE rn <= {IVF_K}
"""

RERANK_FACTOR = 4


def q_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (operators/quantize.ivf_rerank_topk): the
    quantized DPP-pruned IVF index recalls k*{RERANK_FACTOR} candidates
    per query, the full-precision vectors re-score only that sliver,
    exact cosine re-ranks. The oracle composes the identical two
    stages in one DuckDB statement."""
    from biothings_crawler_spark.operators.quantize import (
        ivf_rerank_topk,
        write_quantized_ivf_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = pick_centroids(e, "vec_id", "embedding", IVF_CENTROIDS, hash_family="md5")
    cells = assign_cells(e, cents, "vec_id", "embedding")
    idx_path = _scratch_index_path("ivfq", sf_dir)
    write_quantized_ivf_index(cells, idx_path)
    qidx = spark.read.parquet(idx_path)
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    out = ivf_rerank_topk(qidx, cents, q, e, "vec_id", "embedding",
                          k=IVF_K, nprobe=IVF_NPROBE,
                          rerank_factor=RERANK_FACTOR)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


SQL_ANN_RERANK = f"""
WITH {_SQL_IVFQ_CTES},
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rn FROM sc)
  WHERE rn <= {IVF_K * RERANK_FACTOR}),
fullv AS (SELECT vec_id, embedding AS fv FROM embeddings),
q2 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       WHERE vec_id < {N_QUERY_VECS}),
re AS (
  SELECT c.query_id, c.vec_id, {_sql_cosine('q2.qv', 'fullv.fv')} AS cosine
  FROM cand c JOIN fullv USING (vec_id) JOIN q2 USING (query_id))
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM re)
WHERE rn <= {IVF_K}
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_SQL_WORDS = ("list_filter(string_split_regex(lower(text), '\\s+'), "
              "x -> len(x) > 0)")
_SQL_EN = "['the','and','of','to','a','in','is','for','with','data']"
_SQL_DE = "['der','die','und','das','mit','von','für','ist','ein','daten']"
_SQL_ES = "['el','la','de','los','con','por','una','es','para','datos']"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", lang_id_col(F.col("text")).alias("lang_pred"))
        .groupBy("source", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_LANG_ID = f"""
WITH h AS (
  SELECT source,
         len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_EN})) AS en,
         len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_DE})) AS de,
         len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_ES})) AS es
  FROM documents)
SELECT source,
       CASE WHEN en >= de AND en >= es AND en > 0 THEN 'en'
            WHEN de >= es AND de > 0 THEN 'de'
            WHEN es > 0 THEN 'es'
            ELSE 'und' END AS lang_pred,
       COUNT(*) AS n
FROM h GROUP BY 1, 2
"""

def q_lang_id_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas model-hook path (operators/text.lang_id_model)
    for language ID, aggregated the same way as q_lang_id — the driver
    gate verifies the Arrow-batched per-worker-model plumbing end to
    end against the identical DuckDB oracle (the default stand-in
    predictor is the deterministic Python twin of the expression, so
    the two queries share one oracle by construction)."""
    from biothings_crawler_spark.operators.text import lang_id_model

    d = _t(spark, sf_dir, "documents").select("source", "text")
    return (
        lang_id_model(d, "text", out_col="lang_pred")
        .groupBy("source", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SQL_TOKENS = ("len(list_filter(regexp_extract_all(text, "
               "'([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s])', 1), x -> len(x) > 0))")


def q_tokenizer_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas tokenizer-hook path (operators/text.
    tokenizer_model) for token counting, aggregated the same way as
    q_token_stats — the driver gate verifies the Arrow-batched
    per-worker-memoized tokenizer plumbing end to end against the
    identical DuckDB oracle (the default stand-in tokenizer is the
    deterministic Python twin of the token_count_col expression, so
    the two queries share one oracle by construction)."""
    from biothings_crawler_spark.operators.text import tokenizer_model

    d = _t(spark, sf_dir, "documents").select("source", "text")
    per = tokenizer_model(d, "text", out_col="tok")
    return (
        per.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("tok").alias("sum_tokens"))
        .select("source", "n_docs", "sum_tokens",
                (F.col("sum_tokens").cast("double") / F.col("n_docs")).alias("avg_tokens"))
    )


def q_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram-coverage fluency score (operators/text.
    bigram_coverage): per doc, ratio of its word bigrams occurring
    >= 3 times corpus-wide, as an exact millionths integer — KenLM-ish
    quality scoring without float log-probs, so the pair hashes
    exactly."""
    from biothings_crawler_spark.operators.text import bigram_coverage

    return bigram_coverage(_t(spark, sf_dir, "documents"), "doc_id", "text",
                           min_count=3)


SQL_BIGRAM_COVERAGE = f"""
WITH w AS (SELECT doc_id AS id, {_SQL_WORDS} AS ws FROM documents),
g AS (
  SELECT id, CASE WHEN len(ws) >= 2
             THEN list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])
             ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
dg AS (SELECT id, unnest(grams) AS bg FROM g),
common AS (SELECT bg FROM dg GROUP BY bg HAVING COUNT(*) >= 3),
hits AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM dg SEMI JOIN common USING (bg) GROUP BY id),
tot AS (SELECT id, CAST(len(grams) AS BIGINT) AS n_bigrams FROM g)
SELECT t.id, t.n_bigrams,
       CAST(COALESCE(h.n_common, 0) AS BIGINT) AS n_common,
       CAST(CASE WHEN t.n_bigrams > 0
            THEN COALESCE(h.n_common, 0) * 1000000 // t.n_bigrams
            ELSE 0 END AS BIGINT) AS coverage_q6
FROM tot t LEFT JOIN hits h USING (id)
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    per = d.select("source", token_count_col(F.col("text")).alias("tok"))
    return (
        per.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("tok").alias("sum_tokens"))
        .select("source", "n_docs", "sum_tokens",
                (F.col("sum_tokens").cast("double") / F.col("n_docs")).alias("avg_tokens"))
    )


SQL_TOKEN_STATS = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM({_SQL_TOKENS}) AS BIGINT) AS sum_tokens,
       CAST(SUM({_SQL_TOKENS}) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM documents GROUP BY 1
"""


def q_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scores integer-encoded (×40 is exact: three 0/1 bands ×10
    + stopword hits) so the per-source aggregate is order-independent."""
    d = _t(spark, sf_dir, "documents")
    per = d.select(
        "source",
        F.round(quality_score_col(F.col("text")) * 40).cast("long").alias("q40"),
    )
    return (
        per.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("q40").alias("sum_q40"))
        .select("source", "n_docs", "sum_q40",
                (F.col("sum_q40").cast("double") / (F.col("n_docs") * 40)).alias("avg_quality"))
    )


SQL_QUALITY_STATS = f"""
WITH per AS (
  SELECT source,
         (CASE WHEN len(text) BETWEEN 50 AND 20000 THEN 10 ELSE 0 END
          + CASE WHEN len({_SQL_WORDS}) > 0
                  AND CAST(len(text) AS DOUBLE) / len({_SQL_WORDS}) >= 3.0
                  AND CAST(len(text) AS DOUBLE) / len({_SQL_WORDS}) <= 12.0
                 THEN 10 ELSE 0 END
          + CASE WHEN len(text) > 0
                  AND CAST(len(list_filter(regexp_extract_all(text, '([^\\w\\s])', 1),
                                           x -> len(x) > 0)) AS DOUBLE) / len(text) <= 0.2
                 THEN 10 ELSE 0 END
          + len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_EN}))) AS q40
  FROM documents)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(q40) AS BIGINT) AS sum_q40,
       CAST(SUM(q40) AS DOUBLE) / (COUNT(*) * 40) AS avg_quality
FROM per GROUP BY 1
"""


# ---------------------------------------------------------------------------
# incremental cursor / windowed events / union view
# ---------------------------------------------------------------------------


def q_incremental_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-cursor checkpoint values (figshare.py:88-110 analog):
    per source the next cursor = max(ts), plus the backlog count."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("cursor"),
             F.count(F.lit(1)).alias("n_events"))
    )


SQL_INCREMENTAL_CURSOR = """
SELECT event_type, strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS cursor,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (Structured Streaming shape run as a
    batch plan — identical expression under readStream)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n", "sum_value")
    )


SQL_EVENT_WINDOWS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n,
       round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns) multi-source view (§2.8)."""
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("lang") == "en").select("doc_id", "source", "lang")
    b = d.filter(F.col("lang") != "en").select("doc_id", "source")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("lang").isNull().cast("long")).alias("n_lang_null"),
    )


SQL_UNION_SOURCES = """
SELECT source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_lang_null
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# non-SQL-expressible: multimodal plumbing (rows-only check)
# ---------------------------------------------------------------------------


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-media feature extraction over mapInPandas (the decode is
    the documented deterministic stub — operators/multimodal.py). The
    fake byte-histogram features ARE deterministic, so this now has an
    exact golden-parquet oracle: features are float32-quantized to
    floor(x*1e6) ints and emitted as a canonical string on both sides
    (no float-array hashing across engines)."""
    from biothings_crawler_spark.operators.multimodal import gen_media_fixture

    media = gen_media_fixture(spark, 64).coalesce(2)  # 64 rows, 2 tasks
    out = extract_media_features(media)
    feature_q = F.array_join(
        F.transform(
            "feature",
            lambda x: F.floor(x.cast("double") * F.lit(1e6)).cast("string"),
        ),
        ",",
    )
    return out.select("media_id", "kind", "n_bytes", feature_q.alias("feature_q"))




# ---------------------------------------------------------------------------
# sources, robots, transforms, incremental (batch 2)
# ---------------------------------------------------------------------------

GEO_PREFIX = "https://www.ncbi.nlm.nih.gov/geo/query/acc.cgi?acc="
ID_RANGE_END = 2000


def q_id_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-range seed generation (ncbi_geo.py:21-27 / nyu.py:42-51) —
    spark.range + concat, bucketed count as the verifiable surface."""
    seeds = id_range_seeds(
        spark, "ncbi_geo", GEO_PREFIX + "GSE", 1, ID_RANGE_END,
        parser="geo_table",
    )
    return (
        seeds.groupBy(F.length("url").cast("long").alias("url_len"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("url").alias("first_url"))
    )


SQL_ID_RANGE_SCAN = f"""
SELECT len(u) AS url_len, COUNT(*) AS n, MIN(u) AS first_url FROM (
  SELECT '{{pfx}}GSE' || CAST(g AS VARCHAR) AS u
  FROM generate_series(1, {ID_RANGE_END}) t(g))
GROUP BY 1
""".format(pfx=GEO_PREFIX)


def _sitemaps_frame(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    part = _t(spark, sf_dir, "part")
    leaves = part.select(
        F.concat(F.lit("https://s.example.org/smap-"),
                 F.col("p_partkey").cast("string"), F.lit(".xml")).alias("sitemap_url"),
        F.lit("s.example.org").alias("host"),
        F.lit(False).alias("is_index"),
        F.array().cast("array<string>").alias("child_sitemaps"),
        F.array(
            F.concat(F.lit("https://s.example.org/record/"), F.col("p_partkey").cast("string")),
            F.concat(F.lit("https://s.example.org/other/"), F.col("p_partkey").cast("string")),
        ).alias("loc_urls"),
    )
    indexes = (
        part.groupBy((F.col("p_partkey") % 10).alias("bucket"))
        .agg(F.collect_list(
            F.concat(F.lit("https://s.example.org/smap-"),
                     F.col("p_partkey").cast("string"), F.lit(".xml"))).alias("child_sitemaps"))
        .select(
            F.concat(F.lit("https://s.example.org/sitemap-index-"),
                     F.col("bucket").cast("string"), F.lit(".xml")).alias("sitemap_url"),
            F.lit("s.example.org").alias("host"),
            F.lit(True).alias("is_index"),
            "child_sitemaps",
            F.array().cast("array<string>").alias("loc_urls"),
        )
    )
    return leaves.unionByName(indexes), indexes.select("sitemap_url")


def q_sitemap_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-index recursion to fixpoint + rule routing (zenodo.py:
    14-18, massbank.py:6-13): start from the index sitemaps only, expand
    to leaves, keep /record/ URLs."""
    sitemaps, start = _sitemaps_frame(spark, sf_dir)
    urls = expand_sitemaps(sitemaps, start)
    return urls.filter(F.col("url").rlike("/record/")).select("url")


SQL_SITEMAP_EXPAND = """
SELECT DISTINCT 'https://s.example.org/record/' || CAST(p_partkey AS VARCHAR) AS url
FROM part
"""

ROBOTS_ROWS = [
    ("h0.example.org", ["/private/ok"], ["/private/"], 10.0),
    ("h1.example.org", [], ["/o/"], None),
    ("h2.example.org", None, None, 2.0),
]
ROBOTS_SCHEMA = ("host string, allow array<string>, disallow array<string>, "
                 "crawl_delay double")


def _robots_frame(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROBOTS_ROWS, ROBOTS_SCHEMA)


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots allow/disallow enforcement, longest-match-wins
    (operators/politeness.apply_robots; north_rule-mandated — the
    reference itself ran ROBOTSTXT_OBEY=False, settings.py:31)."""
    orders = _t(spark, sf_dir, "orders")
    cand = orders.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 4).cast("string"),
                 F.lit(".example.org")).alias("host"),
        F.concat(
            F.lit("https://h"), (F.col("o_custkey") % 4).cast("string"),
            F.lit(".example.org"),
            F.when(F.col("o_orderkey") % 3 == 0,
                   F.concat(F.lit("/private/ok/"), F.col("o_orderkey").cast("string")))
            .when(F.col("o_orderkey") % 3 == 1,
                  F.concat(F.lit("/private/x/"), F.col("o_orderkey").cast("string")))
            .otherwise(F.concat(F.lit("/o/"), F.col("o_orderkey").cast("string"))),
        ).alias("url_canon"),
    )
    out = apply_robots(cand, _robots_frame(spark), obey=True)
    return out.groupBy("host").agg(F.count(F.lit(1)).alias("n_allowed"))


SQL_ROBOTS_FILTER = """
WITH robots AS (
  SELECT * FROM (VALUES
    ('h0.example.org', ['/private/ok'], ['/private/']),
    ('h1.example.org', CAST([] AS VARCHAR[]), ['/o/']),
    ('h2.example.org', CAST(NULL AS VARCHAR[]), CAST(NULL AS VARCHAR[]))
  ) AS t(host, allow, disallow)),
cand AS (
  SELECT 'h' || CAST(o_custkey % 4 AS VARCHAR) || '.example.org' AS host,
         CASE WHEN o_orderkey % 3 = 0 THEN '/private/ok/' || CAST(o_orderkey AS VARCHAR)
              WHEN o_orderkey % 3 = 1 THEN '/private/x/' || CAST(o_orderkey AS VARCHAR)
              ELSE '/o/' || CAST(o_orderkey AS VARCHAR) END AS path
  FROM orders),
j AS (
  SELECT c.host, c.path, r.allow, r.disallow,
         coalesce(list_max(list_transform(
           list_filter(r.allow, p -> starts_with(c.path, p)), p -> len(p))), 0) AS allow_len,
         coalesce(list_max(list_transform(
           list_filter(r.disallow, p -> starts_with(c.path, p)), p -> len(p))), 0) AS dis_len
  FROM cand c LEFT JOIN robots r USING (host))
SELECT host, COUNT(*) AS n_allowed
FROM j
WHERE NOT (disallow IS NOT NULL AND dis_len > allow_len AND dis_len > 0)
GROUP BY 1
"""


def q_host_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crawl_delay -> per-round budget (AutoThrottle target-1.0 analog,
    settings.py:82-89; Crawl-delay honored, harvard.py:20)."""
    return host_budgets(_robots_frame(spark), round_seconds=60.0, default_budget=100)


SQL_HOST_BUDGETS = """
SELECT host, CAST(CASE WHEN crawl_delay IS NOT NULL AND crawl_delay > 0
            THEN greatest(floor(60.0 / crawl_delay), 1)
            ELSE 100 END AS INTEGER) AS budget
FROM (VALUES ('h0.example.org', 10.0), ('h1.example.org', CAST(NULL AS DOUBLE)),
             ('h2.example.org', 2.0)) AS t(host, crawl_delay)
"""


def q_domain_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's lstrip('www.') same-domain quirk reproduced
    bit-for-bit (clic.py:99-101; char-set strip, not prefix strip)."""
    d = _t(spark, sf_dir, "documents")
    hosts = d.select(
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("www."), F.col("source"), F.lit(".org")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("web."), F.col("source"), F.lit(".org")))
        .otherwise(F.concat(F.col("source"), F.lit(".org"))).alias("host")
    )
    return (
        hosts.select(domain_key_col(F.col("host")).alias("domain_key"))
        .groupBy("domain_key").agg(F.count(F.lit(1)).alias("n"))
    )


SQL_DOMAIN_KEY = """
SELECT regexp_replace(host, '^[w.]*', '') AS domain_key, COUNT(*) AS n
FROM (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'www.' || source || '.org'
              WHEN doc_id % 3 = 1 THEN 'web.' || source || '.org'
              ELSE source || '.org' END AS host
  FROM documents)
GROUP BY 1
"""

INCR_CURSOR = "2024-01-20 00:00:00"


def q_incremental_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One resumable incremental-cursor round (figshare.py:77-129
    semantics: >= cursor scope, seen anti-join) over events."""
    ev = _t(spark, sf_dir, "events")
    hits = ev.select(F.col("event_id").alias("id"),
                     F.col("ts").alias("published_date"), "event_type")
    seen = ev.filter(F.col("event_id") % 2 == 0).select(F.col("event_id").alias("id"))
    new, next_cursor = incremental_round(hits, seen, INCR_CURSOR)
    return new.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.date_format(F.max("published_date"), "yyyy-MM-dd HH:mm:ss").alias("cursor"),
    )


SQL_INCREMENTAL_ROUND = f"""
SELECT event_type, COUNT(*) AS n_new,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS cursor
FROM events
WHERE ts >= TIMESTAMP '{INCR_CURSOR}' AND event_id % 2 = 1
GROUP BY 1
"""


def _geo_docs_frame(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = _t(spark, sf_dir, "documents")
    p1 = (F.col("doc_id") * 2 + 1).cast("string")
    p2 = (F.col("doc_id") * 2 + 2).cast("string")
    title = F.substring(F.col("text"), 1, 20)
    docs = d.select(
        F.lit("ncbi_geo").alias("source"),
        F.concat(
            F.lit('{"Citation(s)":"'), p1, F.lit(", "), p2,
            F.lit('","Title":"'), title,
            F.lit('","_id":"GSE'), F.col("doc_id").cast("string"), F.lit('"}'),
        ).alias("doc_json"),
    )
    pmid_info = (
        d.select(p1.alias("pmid"))
        .unionByName(d.select(p2.alias("pmid")))
        .select("pmid",
                F.concat(F.lit("Citation "), F.col("pmid")).alias("citation"),
                F.lit("[]").alias("grants_json"))
    )
    return docs, pmid_info


def q_upload_geo_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full NCBI-GEO uploader transform (upload/ncbi_geo.py:27-99):
    PMID broadcast enrichment + dict surgery + canonical sorted-key JSON
    emit — the byte-identity surface, verified against an oracle that
    constructs the exact output bytes in SQL."""
    docs, pmid_info = _geo_docs_frame(spark, sf_dir)
    return transform_docs(docs, pmid_info, run_ts="2026-01-01")


SQL_UPLOAD_GEO_TRANSFORM = f"""
SELECT 'ncbi_geo' AS source,
       '{{pfx}}GSE' || CAST(doc_id AS VARCHAR) AS _id,
       '{{{{"@context":"http://schema.org/","@type":"Dataset","citation":["Citation '
         || CAST(doc_id * 2 + 1 AS VARCHAR) || '","Citation ' || CAST(doc_id * 2 + 2 AS VARCHAR)
         || '"],"distribution":{{{{"@type":"dataDownload","contentUrl":"{{pfx}}GSE'
         || CAST(doc_id AS VARCHAR)
         || '"}}}},"identifier":"GSE' || CAST(doc_id AS VARCHAR)
         || '","includedInDataCatalog":{{{{"@type":"DataCatalog","name":"NCBI GEO from Metadataplus","url":"https://www.ncbi.nlm.nih.gov/geo/"}}}},"name":"'
         || substr(text, 1, 20) || '"}}}}' AS doc_json
FROM documents
""".format(pfx=GEO_PREFIX)


def q_upload_dataset_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawlerDatasetESUploader envelope (upload/__init__.py:105-117):
    @context/@type under the doc, _id popped, canonical emit."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        F.lit("dataset").alias("source"),
        F.concat(
            F.lit('{"_id":"doc'), F.col("doc_id").cast("string"),
            F.lit('","name":"'), F.substring(F.col("text"), 1, 20), F.lit('"}'),
        ).alias("doc_json"),
    )
    return transform_docs(docs, None, run_ts="2026-01-01")


SQL_UPLOAD_DATASET_ENVELOPE = """
SELECT 'dataset' AS source, 'doc' || CAST(doc_id AS VARCHAR) AS _id,
       '{"@context":"http://schema.org/","@type":"Dataset","name":"'
         || substr(text, 1, 20) || '"}' AS doc_json
FROM documents
"""


# ---------------------------------------------------------------------------
# batch 3: GEO table scrape byte-identity + zenodo/immport transforms
# ---------------------------------------------------------------------------


def _geo_skeleton() -> tuple[str, str]:
    """The exact nested-table skeleton the GEO xpath walks (reference
    ncbi_geo.py:29-34; same nesting as fixtures/corpus.py:162-202),
    split at the variable row block."""
    dummy = "<table><tr><td>x</td></tr></table>"
    target = "<table>@@ROWS@@</table>"
    lvl3 = f"<table><tr><td>{target}{dummy}</td></tr></table>"
    lvl2 = (f"<table><tr><td><table><tr><td>{dummy}{lvl3}"
            "</td></tr></table></td></tr></table>")
    table6 = ("<table><tr><td>hdr</td></tr><tr><td>nav</td></tr>"
              f"<tr><td>side</td><td>{lvl2}</td></tr></table>")
    full = ("<html><body><table><tr><td>" + dummy * 5 + table6
            + "</td></tr></table></body></html>")
    pre, suf = full.split("@@ROWS@@")
    return pre, suf


def q_geo_table_scrape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NCBI GEO nested-table scraper (ncbi_geo.py:29-53) as the
    vectorized extraction UDF over HTML synthesized in-plan: _id from
    the bgcolor row, single-value cells (string() + nbsp + strip),
    multi-value onmouseout cells, canonical sorted-key JSON out —
    byte-identical vs an oracle that constructs the JSON in SQL."""
    pre, suf = _geo_skeleton()
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    ca = (F.col("doc_id") % 29).cast("string")
    cb = ((F.col("doc_id") + 1) % 29).cast("string")
    rows = F.concat(
        F.lit('<tr bgcolor="#cccccc"><td colspan="2"><strong id="GSE'), i,
        F.lit('">Series GSE'), i, F.lit("</strong></td></tr>"),
        F.lit("<tr><td>Title</td><td>Expr data "), i, F.lit("&nbsp;study</td></tr>"),
        F.lit('<tr><td>Contributor(s)&nbsp;</td><td onmouseout="x">'
              '<a href="#">Contrib '), ca, F.lit('</a>,<a href="#">Contrib '), cb,
        F.lit("</a>,</td></tr>"),
        F.lit("<tr><td>Summary</td><td>Series "), i, F.lit(" summary.</td></tr>"),
    )
    pages = d.select(
        F.concat(F.lit("https://geo.example.org/acc.cgi?acc=GSE"), i).alias("url"),
        F.encode(F.concat(F.lit(pre), rows, F.lit(suf)), "utf-8").alias("html"),
    )
    return pages.select(
        "url",
        F.explode(extract_items_udf(F.col("html"), F.col("url"),
                                    F.lit("geo_table"))).alias("doc_json"),
    )


SQL_GEO_TABLE_SCRAPE = """
SELECT 'https://geo.example.org/acc.cgi?acc=GSE' || CAST(doc_id AS VARCHAR) AS url,
       '{"Contributor(s)":["Contrib ' || CAST(doc_id % 29 AS VARCHAR)
         || '","Contrib ' || CAST((doc_id + 1) % 29 AS VARCHAR)
         || '"],"Summary":"Series ' || CAST(doc_id AS VARCHAR)
         || ' summary.","Title":"Expr data ' || CAST(doc_id AS VARCHAR)
         || ' study","_id":"GSE' || CAST(doc_id AS VARCHAR) || '"}' AS doc_json
FROM documents
"""


def q_upload_zenodo_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZenodoCovidUploader transform (upload/zenodo_covid.py:54-95):
    curatedBy injection (run_ts for datetime.now), ScholarlyArticle ->
    Publication, affiliation objectify, single-keywords re-split on
    ', |,|; |;', dict-license unwrap, citation delete, zenodo _id rule."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    even = F.concat(
        F.lit('{"@type":"ScholarlyArticle","_id":"10.5281/zenodo.'), i,
        F.lit('","citation":"drop me","creator":[{"affiliation":"Aff '), i,
        F.lit('","name":"N '), i,
        F.lit('"}],"keywords":["alpha, beta; gamma"],"license":{"license":"CC-BY-'),
        (F.col("doc_id") % 4).cast("string"), F.lit('"}}'),
    )
    odd = F.concat(
        F.lit('{"@type":"Dataset","_id":"10.5281/zenodo.'), i,
        F.lit('","creator":[{"affiliation":"Aff '), i,
        F.lit('","name":"N '), i,
        F.lit('"}],"keywords":["kw'), i, F.lit('","kw2"],"license":"MIT"}'),
    )
    docs = d.select(
        F.lit("zenodo_covid").alias("source"),
        F.when(F.col("doc_id") % 2 == 0, even).otherwise(odd).alias("doc_json"),
    )
    return transform_docs(docs, None, run_ts="2026-01-01")


_ZC_CURATED = ('"curatedBy":{"@type":"Organization","name":"Zenodo",'
               '"url":"https://zenodo.org/communities/covid-19/",'
               '"versionDate":"2026-01-01"}')

SQL_UPLOAD_ZENODO_TRANSFORM = """
SELECT 'zenodo_covid' AS source,
       'zenodo.' || CAST(doc_id AS VARCHAR) AS _id,
       CASE WHEN doc_id % 2 = 0 THEN
         '{{"@type":"Publication","creator":[{{"affiliation":{{"name":"Aff '
           || CAST(doc_id AS VARCHAR) || '"}},"name":"N ' || CAST(doc_id AS VARCHAR)
           || '"}}],{cb},"keywords":["alpha","beta","gamma"],"license":"CC-BY-'
           || CAST(doc_id % 4 AS VARCHAR) || '"}}'
       ELSE
         '{{"@type":"Dataset","creator":[{{"affiliation":{{"name":"Aff '
           || CAST(doc_id AS VARCHAR) || '"}},"name":"N ' || CAST(doc_id AS VARCHAR)
           || '"}}],{cb},"keywords":["kw' || CAST(doc_id AS VARCHAR)
           || '","kw2"],"license":"MIT"}}'
       END AS doc_json
FROM documents
""".format(cb=_ZC_CURATED)


def q_upload_immport_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImmPortUploader transform (upload/immport.py:37-133): PI split
    with ' - ' validation (malformed segments skipped), condition ->
    keywords, DOI -> sameAs, renames, envelope merge, prune_untouched,
    _id=None (reference lets ES mint)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    docs = d.select(
        F.lit("immport").alias("source"),
        F.concat(
            F.lit('{"Accession":"SDY'), i,
            F.lit('","Title":"T'), i,
            F.lit('","PI":"P One - UnivA; Bad Entry; P Two - UnivB"'),
            F.lit(',"Condition Studied":"flu, cold"'),
            F.lit(',"DOI":"10.1/x'), i,
            F.lit('","_id":"https://immport.org/s/SDY'), i, F.lit('"}'),
        ).alias("doc_json"),
    )
    return transform_docs(docs, None, run_ts="2026-01-01")


SQL_UPLOAD_IMMPORT_TRANSFORM = """
SELECT 'immport' AS source,
       CAST(NULL AS VARCHAR) AS _id,
       '{{"@context":"http://schema.org/","@type":"Dataset",'
        || '"creator":[{{"@type":"Person","affiliation":"UnivA","name":"P One"}},'
        || '{{"@type":"Person","affiliation":"UnivB","name":"P Two"}}],'
        || '"curatedBy":{{"@type":"Organization","curationDate":"2026-01-01",'
        || '"name":"ImmPort","url":"https://www.immport.org/shared/study/SDY'
        || CAST(doc_id AS VARCHAR) || '"}},'
        || '"identifier":"SDY' || CAST(doc_id AS VARCHAR) || '",'
        || '"includedInDataCatalog":{{"@type":"DataCatalog","name":"ImmPort","url":"http://immport.org/"}},'
        || '"keywords":["flu","cold"],'
        || '"name":"T' || CAST(doc_id AS VARCHAR) || '",'
        || '"sameAs":"https://www.doi.org/10.1/x' || CAST(doc_id AS VARCHAR) || '",'
        || '"url":"https://immport.org/s/SDY' || CAST(doc_id AS VARCHAR) || '"}}'
        AS doc_json
FROM documents
""".replace("{{", "{").replace("}}", "}")


# ---------------------------------------------------------------------------
# batch 4: PMID citation formatting, link extraction, full BFS crawl
# ---------------------------------------------------------------------------


def q_pmid_citation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eutils XML -> citation string + grants (upload/helper.py:38-171
    re-implementation, functions/citation.py) over XML synthesized
    in-plan; exercises the et-al cutoff, ValidYN='N' skip,
    CollectiveName trailing dot, numeric-month abbrev, day de-zeroing,
    season dates, and grant extraction — byte-identical vs SQL."""
    import pandas as pd

    from biothings_crawler_spark.functions.citation import eutils_batch_info
    from biothings_crawler_spark.functions.json_canon import canonical_json

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    c = F.col("doc_id") % 4

    def au(last: str, init: str) -> str:
        return (f"<Author><LastName>{last}</LastName>"
                f"<Initials>{init}</Initials></Author>")

    five = "".join(au(f"Auth{j}", "X") for j in range(5))
    case0_authors = au("One", "A") + au("Two", "B")
    case2_authors = ('<Author ValidYN="N"><LastName>Skip</LastName>'
                     "<Initials>S</Initials></Author>"
                     "<Author><CollectiveName>The Consortium</CollectiveName></Author>")
    pubdate0 = "<Year>2020</Year><Month>03</Month><Day>05</Day>"
    pubdate1 = "<Year>2021</Year>"
    pubdate3 = "<Year>2019</Year><Season>Spring</Season>"

    xml = F.concat(
        F.lit("<PubmedArticleSet><PubmedArticle><MedlineCitation><PMID>"), i,
        F.lit("</PMID><Article><ArticleTitle>Study "), i,
        F.lit("</ArticleTitle><AuthorList>"),
        F.when(c == 0, F.lit(case0_authors))
        .when(c == 1, F.lit(five))
        .when(c == 2, F.lit(case2_authors))
        .otherwise(F.lit("")),
        F.lit("</AuthorList><Journal><JournalIssue><Volume>12</Volume>"
              "<Issue>3</Issue><PubDate>"),
        F.when(c == 0, F.lit(pubdate0))
        .when(c == 1, F.lit(pubdate1))
        .when(c == 2, F.lit(pubdate1))
        .otherwise(F.lit(pubdate3)),
        F.lit("</PubDate></JournalIssue></Journal>"
              "<Pagination><MedlinePgn>100-10</MedlinePgn></Pagination>"),
        F.when(c == 0, F.concat(
            F.lit('<GrantList><Grant><GrantID>R01-'), i,
            F.lit("</GrantID><Agency>NIH</Agency></Grant></GrantList>"),
        )).otherwise(F.lit("")),
        F.lit("</Article><MedlineJournalInfo><MedlineTA>J Abbr</MedlineTA>"
              "</MedlineJournalInfo></MedlineCitation></PubmedArticle>"
              "</PubmedArticleSet>"),
    )
    rows = d.select(F.col("doc_id"), xml.alias("xml"))

    def run(batches):
        for pdf in batches:
            cites, grants = [], []
            for x in pdf["xml"]:
                info = next(iter(eutils_batch_info(x).values()))
                cites.append(info["citation"])
                grants.append(canonical_json(info["grants"]))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "citation": cites, "grants_json": grants,
            })

    return rows.mapInPandas(run, "doc_id long, citation string, grants_json string")


SQL_PMID_CITATION = """
SELECT doc_id,
  CASE doc_id % 4
    WHEN 0 THEN 'One A, Two B. Study ' || CAST(doc_id AS VARCHAR)
      || ' J Abbr 2020 Mar 5;12(3):100-10. PMID: ' || CAST(doc_id AS VARCHAR)
    WHEN 1 THEN 'Auth0 X, Auth1 X, Auth2 X, Auth3 X et al. Study ' || CAST(doc_id AS VARCHAR)
      || ' J Abbr 2021;12(3):100-10. PMID: ' || CAST(doc_id AS VARCHAR)
    WHEN 2 THEN 'The Consortium.. Study ' || CAST(doc_id AS VARCHAR)
      || ' J Abbr 2021;12(3):100-10. PMID: ' || CAST(doc_id AS VARCHAR)
    ELSE '[No authors listed] Study ' || CAST(doc_id AS VARCHAR)
      || ' J Abbr 2019 Spring;12(3):100-10. PMID: ' || CAST(doc_id AS VARCHAR)
  END AS citation,
  CASE doc_id % 4
    WHEN 0 THEN '[{"funder":{"@type":"Organization","name":"NIH"},"identifier":"R01-'
      || CAST(doc_id AS VARCHAR) || '"}]'
    ELSE '[]'
  END AS grants_json
FROM documents
"""


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """href extraction + urljoin resolution in document order with
    duplicates preserved (LinkExtractor analog; extract_links_udf)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
                    F.lit(".example.org/base/page.html"))
    html = F.concat(
        F.lit('<html><body><a href="/rel/'), i, F.lit('">x</a>'),
        F.lit('<a href="https://abs.example.org/p/'), i, F.lit('">y</a>'),
        F.lit('<a href="rel2">z</a>'),
        F.lit('<a href="/rel/'), i, F.lit('">dup</a></body></html>'),
    )
    pages = d.select(base.alias("url"), F.encode(html, "utf-8").alias("html"))
    return pages.select(
        "url",
        F.posexplode(extract_links_udf(F.col("html"), F.col("url"))).alias("pos", "link"),
    ).select("url", F.col("pos").cast("long").alias("pos"), "link")


SQL_LINK_EXTRACT = """
WITH b AS (
  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' AS origin,
         'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/base/page.html' AS url,
         CAST(doc_id AS VARCHAR) AS i
  FROM documents)
SELECT url, CAST(pos AS BIGINT) AS pos, link FROM (
  SELECT url, 0 AS pos, origin || '/rel/' || i AS link FROM b
  UNION ALL SELECT url, 1, 'https://abs.example.org/p/' || i FROM b
  UNION ALL SELECT url, 2, origin || '/base/rel2' FROM b
  UNION ALL SELECT url, 3, origin || '/rel/' || i FROM b)
"""


_FIXTURE_CRAWL_CACHE: dict = {}


def _run_fixture_crawl(spark: SparkSession):
    """Run the BFS crawl engine over the golden fixture corpus with the
    exact config the frozen-simulator golden tables were built from
    (oracle/golden.CRAWL_N / CRAWL_CFG — single source of truth, so the
    Spark query and the DuckDB oracle cannot drift apart).

    Memoized per process: q_crawl_bfs_e2e and q_crawl_docs read
    different tables of the SAME deterministic crawl, so the second
    query reuses the first's committed checkpoint instead of re-running
    the engine."""
    import tempfile

    from biothings_crawler_spark.catalog import ParquetManifestCatalog
    from biothings_crawler_spark.fixtures import corpus
    from biothings_crawler_spark.oracle import golden
    from biothings_crawler_spark.oracle.bfs import CrawlConfig
    from biothings_crawler_spark.plans.crawl import run_crawl

    n = golden.CRAWL_N
    cfg = CrawlConfig(**golden.CRAWL_CFG)
    cache_key = (id(spark._jsparkSession), n)
    if cache_key in _FIXTURE_CRAWL_CACHE:
        return ParquetManifestCatalog(_FIXTURE_CRAWL_CACHE[cache_key])
    ckpt = tempfile.mkdtemp(prefix="crawl-bfs-driver-")
    # tiny corpus: cap shuffle width so the round loop is not dominated
    # by empty-task scheduling under a wide session default
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        run_crawl(spark, corpus.pages_df(spark, n).coalesce(4),
                  corpus.seeds_df(spark, n).coalesce(4),
                  corpus.robots_df(spark).coalesce(1),
                  corpus.gen_policies(), ckpt, cfg)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    _FIXTURE_CRAWL_CACHE[cache_key] = ckpt
    return ParquetManifestCatalog(ckpt)


def q_crawl_bfs_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BFS crawl engine (plans/crawl.run_crawl) over the
    deterministic fixture corpus: frontier -> robots -> bloom+exact
    seen filter -> salted politeness -> fetch join -> extraction ->
    link follow -> atomic round checkpoints. Returns the crawl ordering
    (round, host, sched_rank, url_canon); the oracle is the frozen
    pure-Python BFS simulator's expected ordering materialized to a
    golden parquet (oracle/golden.py) — an EXACT cross-implementation
    pair for the engine's reason-to-exist (helper.py:30-50,
    broadscrape/clic.py:61-103)."""
    cat = _run_fixture_crawl(spark)
    sched = cat.read(spark, "scheduled")
    return sched.select(F.col("round").cast("long").alias("round"), "host",
                        F.col("sched_rank").cast("long").alias("sched_rank"),
                        "url_canon")


def q_crawl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship evidence, part 2: the docs the crawl EXTRACTED
    (fetch join -> extract_items_udf -> canonical JSON) vs the frozen
    simulator's expected docs — this pins the JSON-LD/GEO extraction
    inside the loop, not just the scheduling."""
    cat = _run_fixture_crawl(spark)
    docs = cat.read(spark, "docs")
    return docs.select(F.col("round").cast("long").alias("round"),
                       "url_canon", "doc_json")


def _run_refetch_crawl(spark: SparkSession):
    """The incremental-crawl loop CLOSED end to end: round-1 BFS crawl
    (memoized fixture crawl) -> md5 content diff of corpus v1 vs v2
    (operators/snapshot.snapshot_diff) -> refetch queue (changed only;
    added urls enter via discovery, not refetch) -> semi-join against
    the round-1 catalog's scheduled table (refetch only what the crawl
    actually fetched) -> host-rule source/parser routing (the
    reference's sitemap-rule mechanism; corpus.fixture_seed_router) ->
    a fresh one-round run_crawl over corpus v2 with link-follow off,
    through the same extraction UDFs and atomic checkpoint commit.
    The whole composition is plans/crawl.run_refetch — the same code
    path jobs/refetch_job.py launches via spark-submit. Memoized per
    process like _run_fixture_crawl."""
    import tempfile

    from biothings_crawler_spark.catalog import ParquetManifestCatalog
    from biothings_crawler_spark.fixtures import corpus
    from biothings_crawler_spark.oracle import golden
    from biothings_crawler_spark.oracle.bfs import CrawlConfig
    from biothings_crawler_spark.plans.crawl import run_refetch

    n = golden.CRAWL_N
    cache_key = (id(spark._jsparkSession), "refetch", n)
    if cache_key in _FIXTURE_CRAWL_CACHE:
        return ParquetManifestCatalog(_FIXTURE_CRAWL_CACHE[cache_key])
    cat1 = _run_fixture_crawl(spark)

    ckpt = tempfile.mkdtemp(prefix="crawl-refetch-driver-")
    cfg = CrawlConfig(**{**golden.CRAWL_CFG, "max_rounds": 1})
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        run_refetch(
            spark,
            corpus.pages_df(spark, n).coalesce(4),
            corpus.pages_v2_df(spark, n).coalesce(4),
            str(cat1.root),
            corpus.fixture_seed_router,
            corpus.robots_df(spark).coalesce(1),
            corpus.gen_policies(),
            ckpt,
            cfg,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    _FIXTURE_CRAWL_CACHE[cache_key] = ckpt
    return ParquetManifestCatalog(ckpt)


def q_crawl_refetch_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The docs the REFETCH round re-extracted (diff -> queue ->
    catalog semi-join -> seeded run_crawl on the mutated corpus) vs
    the frozen simulator's expected docs for the identical two-round
    scenario — the golden pair that closes the incremental-crawl loop
    (reference: the resumable/incremental harvest semantics of
    crawler/spiders/helper.py round bookkeeping)."""
    cat = _run_refetch_crawl(spark)
    docs = cat.read(spark, "docs")
    return docs.select(F.col("round").cast("long").alias("round"),
                       "url_canon", "doc_json")


def q_jsonld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-LD / mainEntity / GEO-table extraction over every fixture
    page quirk (extruct comment-retry, strict=False control chars,
    top-level arrays, falsy drops, _id inject — helper.py:30-50,
    omicsdi.py:31-33, ncbi_geo.py:29-53): the engine's regex-scan
    pandas UDF vs the frozen html.parser oracle's golden parquet."""
    from biothings_crawler_spark.fixtures import corpus as cx
    from biothings_crawler_spark.oracle import golden

    rows = []
    for i in range(golden.JSONLD_N):
        r = cx.page_row(i, golden.JSONLD_N)
        rows.append((r["url"], r["html"], cx.parser_for_source(cx.source_of(i))))
    # coalesce: 300 fixture rows don't amortize 32 python-worker forks
    pages = spark.createDataFrame(
        rows, "url string, html binary, parser string").coalesce(4)
    return pages.select(
        "url", "parser",
        F.explode(extract_items_udf(F.col("html"), F.col("url"), F.col("parser"))
                  ).alias("item_json"),
    )


# ---------------------------------------------------------------------------
# batch 5: paginated-API expansion, error-doc sink, short-page stop
# ---------------------------------------------------------------------------


def _api_pages_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    hit = F.struct(
        F.col("o_orderkey").cast("string").alias("id"),
        F.concat(F.lit("https://api.example.org/rec/"),
                 F.col("o_orderkey").cast("string")).alias("url"),
        (F.col("o_orderkey") % 17 == 0).alias("missing_link"),
    )
    return (
        orders.groupBy((F.col("o_orderkey") % 40).alias("page_no"))
        .agg(F.collect_list(hit).alias("hits"))
        .select(F.lit("zenodo_covid").alias("source"), "page_no", "hits")
    )


def q_api_seed_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated-API seed expansion (zenodo_covid.py:32-68): per-hit
    URL routing, missing-link hits diverted to the errors table."""
    seeds, _ = expand_api_pages(_api_pages_frame(spark, sf_dir), "zenodo_covid")
    return seeds.select("seed_id", "url")


SQL_API_SEED_EXPANSION = """
SELECT 'zenodo_covid:' || CAST(o_orderkey AS VARCHAR) AS seed_id,
       'https://api.example.org/rec/' || CAST(o_orderkey AS VARCHAR) AS url
FROM orders WHERE o_orderkey % 17 <> 0
"""


def q_api_error_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-doc sink (zenodo_covid.py:48-51 / harvard.py:117-122):
    malformed hits emitted as {"_type":"error","_document":hit}."""
    _, errors = expand_api_pages(_api_pages_frame(spark, sf_dir), "zenodo_covid")
    return errors.select("_type", "_document", F.col("page_no").cast("long").alias("page_no"))


SQL_API_ERROR_DOCS = """
SELECT 'error' AS _type,
       '{"id":"' || CAST(o_orderkey AS VARCHAR)
         || '","url":"https://api.example.org/rec/' || CAST(o_orderkey AS VARCHAR)
         || '","missing_link":true}' AS _document,
       o_orderkey % 40 AS page_no
FROM orders WHERE o_orderkey % 17 = 0
"""


def q_api_stop_short(spark: SparkSession, sf_dir: str) -> DataFrame:
    """harvard.py:63-71 stop condition: pages after the first short page
    are never requested."""
    nation = _t(spark, sf_dir, "nation")
    hit = F.struct(F.lit("x").alias("id"), F.lit("u").alias("url"),
                   F.lit(False).alias("missing_link"))
    pages = nation.select(
        F.lit("harvard").alias("source"),
        F.col("n_nationkey").alias("page_no"),
        F.array_repeat(hit, F.when(F.col("n_nationkey") == 13, 3).otherwise(10)).alias("hits"),
    )
    kept = stop_at_short_page(pages, "harvard", 10)
    return kept.select("page_no", F.size("hits").alias("n_hits"))


SQL_API_STOP_SHORT = """
SELECT n_nationkey AS page_no,
       CAST(CASE WHEN n_nationkey = 13 THEN 3 ELSE 10 END AS INTEGER) AS n_hits
FROM nation WHERE n_nationkey <= 13
"""


def q_hit_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-side hit cleanup (web/pipeline.py:43-53): transport fields
    stripped, _index rewritten to the source label."""
    d = _t(spark, sf_dir, "documents")
    hits = d.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("_id"),
        F.lit("_doc").alias("_type"),
        F.lit("n1").alias("_node"),
        F.concat(F.lit("indexed_"), F.col("source")).alias("_index"),
        F.col("n_chars"),
    )
    return transform_hits(hits)


SQL_HIT_TRANSFORM = """
SELECT 'doc' || CAST(doc_id AS VARCHAR) AS _id, n_chars, source
FROM documents
"""


def q_random_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded random sampling (config.py:35 ALLOW_RANDOM_QUERY) via
    hash ordering — md5(seed:_id) is a uniform, deterministic,
    CROSS-ENGINE ranking (engine RNGs are not portable; md5 is), so
    this is now an exact pair instead of rows-only."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("_id"),
                    "source")
    return sample_docs(docs, 25, seed=42)


SQL_RANDOM_SAMPLE = """
SELECT _id, source FROM (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS _id, source FROM documents)
ORDER BY md5('42:' || _id), _id
LIMIT 25
"""


def q_id_list_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-list seed generation (immport.py:44-65 / disprot.py:25-36):
    search-hit ids -> per-ID page URLs."""
    d = _t(spark, sf_dir, "documents")
    ids = d.select(F.concat(F.lit("SDY"), F.col("doc_id").cast("string")).alias("id"))
    seeds = id_list_seeds(ids, "immport", "https://www.immport.org/shared/study/")
    return seeds.select("seed_id", "url", "source", "parser",
                        F.col("priority").cast("long").alias("priority"))


SQL_ID_LIST_SCAN = """
SELECT 'immport:SDY' || CAST(doc_id AS VARCHAR) AS seed_id,
       'https://www.immport.org/shared/study/SDY' || CAST(doc_id AS VARCHAR) AS url,
       'immport' AS source, 'jsonld' AS parser, CAST(0 AS BIGINT) AS priority
FROM documents
"""


def q_clic_hub_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIC two-hop hub expansion (clic.py:75-103): round-0 hub-table
    links + round-1 'Website'-labeled field links, extracted from hub
    HTML synthesized in-plan (mini-DOM xpath semantics)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    hub_html = F.concat(
        F.lit('<html><body><table><tr><td><a href="/clinic/'), i,
        F.lit('">Clinic</a></td></tr><tr><td><a href="/clinic/'), i,
        F.lit('b">Clinic B</a></td></tr></table>'),
        F.lit('<a href="/outside">not in hub table</a></body></html>'),
    )
    detail_html = F.concat(
        F.lit('<html><body><table><tr><td>Name</td><td>Clinic '), i,
        F.lit('</td></tr><tr><td>Website</td><td><a href="https://ext'),
        (F.col("doc_id") % 9).cast("string"),
        F.lit('.example.com/">site</a></td></tr></table></body></html>'),
    )
    pages = d.select(
        F.concat(F.lit("https://clic.example.org/hub/"), i).alias("url"),
        F.encode(hub_html, "utf-8").alias("hub_html"),
        F.encode(detail_html, "utf-8").alias("detail_html"),
    )
    hub = pages.select(
        "url",
        F.explode(extract_hub_table_links_udf(F.col("hub_html"), F.col("url"))).alias("link"),
    ).withColumn("hop", F.lit("hub_table"))
    site = pages.select(
        "url",
        F.explode(extract_website_field_links_udf(F.col("detail_html"), F.col("url"))).alias("link"),
    ).withColumn("hop", F.lit("website_field"))
    return hub.unionByName(site)


SQL_CLIC_HUB_LINKS = """
SELECT url, link, hop FROM (
  SELECT 'https://clic.example.org/hub/' || CAST(doc_id AS VARCHAR) AS url,
         'https://clic.example.org/clinic/' || CAST(doc_id AS VARCHAR) AS link,
         'hub_table' AS hop
  FROM documents
  UNION ALL
  SELECT 'https://clic.example.org/hub/' || CAST(doc_id AS VARCHAR),
         'https://clic.example.org/clinic/' || CAST(doc_id AS VARCHAR) || 'b',
         'hub_table'
  FROM documents
  UNION ALL
  SELECT 'https://clic.example.org/hub/' || CAST(doc_id AS VARCHAR),
         'https://ext' || CAST(doc_id % 9 AS VARCHAR) || '.example.com/',
         'website_field'
  FROM documents)
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup (CCNet/RefinedWeb boilerplate removal):
    multi-line docs synthesized from documents (5-word lines + an
    injected COMMON FOOTER on every doc); lines appearing in > 10 docs
    corpus-wide are dropped, order preserved."""
    return line_dedup(_chunked_docs(spark, sf_dir), "id", "t", max_occurrences=10)


SQL_LINE_DEDUP = """
WITH docs AS (
  SELECT doc_id AS id,
         array_to_string(
           [array_to_string((string_split(text, ' '))[j*5+1:j*5+5], ' ')
            for j in range(0, CAST(ceil(len(string_split(text, ' ')) / 5.0) AS INTEGER))],
           chr(10)) || chr(10) || 'COMMON FOOTER' AS t
  FROM documents),
lines AS (
  SELECT id, ls[i] AS line, i AS pos
  FROM (SELECT id, string_split(t, chr(10)) AS ls FROM docs),
       UNNEST(range(1, len(ls) + 1)) AS r(i)),
freq AS (SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT id) > 10),
kept AS (SELECT l.id, l.line, l.pos FROM lines l ANTI JOIN freq USING (line)),
rebuilt AS (
  SELECT id, array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY id),
tot AS (SELECT id, len(string_split(t, chr(10))) AS n_lines FROM docs)
SELECT t.id, coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM tot t LEFT JOIN rebuilt r USING (id)
"""


WINNOW_K, WINNOW_W = 8, 4


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: per-doc distinct window
    minima over char 8-gram md5s, window 4 — partial-overlap detection
    via fingerprint collisions (operators/text.winnow_fingerprints).
    Raw (id, fp) rows, value-hashed against the DuckDB twin."""
    from biothings_crawler_spark.operators.text import winnow_fingerprints

    d = _t(spark, sf_dir, "documents")
    return winnow_fingerprints(d, "doc_id", "text", k=WINNOW_K, w=WINNOW_W)


SQL_WINNOW_FINGERPRINTS = f"""
WITH norm AS (
  SELECT doc_id AS id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents),
g AS (
  SELECT id,
         [md5(substr(t, i, {WINNOW_K}))
          for i in range(1, GREATEST(len(t) - {WINNOW_K - 1}, 1) + 1)] AS grams
  FROM norm),
w AS (
  SELECT id,
         list_distinct(
           [list_min(grams[j:j+{WINNOW_W - 1}])
            for j in range(1, GREATEST(len(grams) - {WINNOW_W - 1}, 1) + 1)]) AS fps
  FROM g)
SELECT id, unnest(fps) AS fp FROM w
"""


def _chunked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-line docs synthesized from documents (5-word lines + an
    injected COMMON FOOTER) — shared by q_line_dedup and q_clean_corpus."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / 5).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.array_join(F.slice(words, j * 5 + 1, 5), " "),
    )
    return d.select(
        F.col("doc_id").alias("id"),
        F.concat(F.array_join(chunks, "\n"), F.lit("\nCOMMON FOOTER")).alias("t"),
    )


_SQL_CHUNKED_DOCS = """
  SELECT doc_id AS id,
         array_to_string(
           [array_to_string((string_split(text, ' '))[j*5+1:j*5+5], ' ')
            for j in range(0, CAST(ceil(len(string_split(text, ' ')) / 5.0) AS INTEGER))],
           chr(10)) || chr(10) || 'COMMON FOOTER' AS text
  FROM documents
"""


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-corpus cleaning pipeline (plans/pipeline):
    lang filter -> quality filter -> exact dedup -> MinHash near-dup
    components -> boilerplate line dedup -> token count, end-to-end in
    one lazy plan, verified against one DuckDB statement (brute-force
    pair generation + recursive-CTE components on the oracle side)."""
    from biothings_crawler_spark.plans.pipeline import clean_corpus

    # 500-doc oracle fixture: cap shuffle width so the component loop's
    # per-iteration jobs aren't dominated by empty-task scheduling
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = clean_corpus(_chunked_docs(spark, sf_dir).coalesce(8), "id", "t")
        # the component loop materializes eagerly (localCheckpoint), so
        # the capped width is baked in before the conf is restored
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_SQL_Q40 = f"""(CASE WHEN len(text) BETWEEN 50 AND 20000 THEN 10 ELSE 0 END
          + CASE WHEN len({_SQL_WORDS}) > 0
                  AND CAST(len(text) AS DOUBLE) / len({_SQL_WORDS}) >= 3.0
                  AND CAST(len(text) AS DOUBLE) / len({_SQL_WORDS}) <= 12.0
                 THEN 10 ELSE 0 END
          + CASE WHEN len(text) > 0
                  AND CAST(len(list_filter(regexp_extract_all(text, '([^\\w\\s])', 1),
                                           x -> len(x) > 0)) AS DOUBLE) / len(text) <= 0.2
                 THEN 10 ELSE 0 END
          + len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_EN})))"""

SQL_CLEAN_CORPUS = f"""
WITH RECURSIVE docs AS ({_SQL_CHUNKED_DOCS}),
lq AS (
  SELECT id, text FROM (
    SELECT id, text,
           len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_EN})) AS en,
           len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_DE})) AS de,
           len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_ES})) AS es,
           {_SQL_Q40} AS q40
    FROM docs)
  WHERE en >= de AND en >= es AND en > 0 AND q40 >= 20),
ex AS (SELECT MIN(id) AS id FROM lq
       GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
d2 AS (SELECT lq.id, lq.text FROM lq JOIN ex USING (id)),
wds AS (
  SELECT id,
         list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
                     x -> len(x) > 0) AS words
  FROM d2),
shg AS (
  SELECT id,
         list_distinct(CASE WHEN len(words) >= 3
           THEN [array_to_string(words[j:j+2], ' ') for j in range(1, len(words) - 1)]
           ELSE [array_to_string(words, ' ')] END) AS sh
  FROM wds),
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS j
    FROM shg a, shg b
    -- J>=0.5 requires |sh| sizes within 2x (min>=t*max): prunes the
    -- quadratic list_intersect work without changing the result set
    WHERE a.id < b.id
      AND len(a.sh) <= 2 * len(b.sh) AND len(b.sh) <= 2 * len(a.sh))
  WHERE j >= 0.5),
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT id, id FROM d2
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
comp AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a),
surv AS (SELECT d2.id, d2.text FROM d2 JOIN comp ON d2.id = comp.id
         WHERE comp.component = d2.id),
lines AS (
  SELECT id, ls[i] AS line, i AS pos
  FROM (SELECT id, string_split(text, chr(10)) AS ls FROM surv),
       UNNEST(range(1, len(ls) + 1)) AS r(i)),
freq AS (SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT id) > 10),
keptl AS (SELECT l.id, l.line, l.pos FROM lines l ANTI JOIN freq USING (line)),
rebuilt AS (
  SELECT id, array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
         COUNT(*) AS n_kept
  FROM keptl GROUP BY id),
tot AS (SELECT id, len(string_split(text, chr(10))) AS n_lines FROM surv)
SELECT t.id, coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       CAST(len(list_filter(regexp_extract_all(coalesce(r.clean_text, ''),
                 '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s])', 1),
                 x -> len(x) > 0)) AS BIGINT) AS n_tokens
FROM tot t LEFT JOIN rebuilt r USING (id)
"""


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup completion: connected components over the MinHash-LSH
    near-dup pairs — (id, component) with component = smallest reachable
    id; survivors are id == component. Iterative label propagation on
    Spark vs a recursive-CTE transitive closure in DuckDB."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", k=3, n_perm=16, bands=4,
                              verify_threshold=0.5)
    nodes = d.select(F.col("doc_id").alias("id"))
    return connected_components(pairs, nodes)


SQL_NEARDUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_SHINGLES},
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM s a, s b
    WHERE a.doc_id < b.doc_id
      AND len(a.sh) <= 2 * len(b.sh) AND len(b.sh) <= 2 * len(a.sh))
  WHERE jaccard >= 0.5),
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a
"""


def _typed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic typed-write input with planted mapping conflicts:
    doc_id%7==3 -> keywords is a string (should be array);
    doc_id%11==5 -> name is an array (should be string);
    funder present iff doc_id%3==0 (existence-sampling probe field)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = i.cast("string")
    keywords = F.when(i % 7 == 3, F.concat(F.lit('"kw'), s, F.lit('"'))).otherwise(
        F.concat(F.lit('["kw'), s, F.lit('","x"]')))
    name = F.when(i % 11 == 5, F.concat(F.lit('["n'), s, F.lit('"]'))).otherwise(
        F.concat(F.lit('"n'), s, F.lit('"')))
    funder = F.when(i % 3 == 0, F.lit(',"funder":"NIH"')).otherwise(F.lit(""))
    return d.select(
        "source",
        F.concat(F.lit("doc"), s).alias("_id"),
        F.concat(F.lit('{"name":'), name, F.lit(',"keywords":'), keywords,
                 funder, F.lit("}")).alias("doc_json"),
    )


def q_reindex_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed reindex with conflicts quarantine (SURVEY §2.2: replaces
    the reference's retry-into-suffixed-indices at
    upload/__init__.py:195-211): docs violating the enforced mapping
    land in an explicit conflicts table with field + observed type."""
    from biothings_crawler_spark.plans.upload import reindex_conflicts

    docs = _typed_docs(spark, sf_dir)
    typed, conflicts = reindex_conflicts(
        docs, {"name": "string", "keywords": "array"})
    return conflicts


SQL_REINDEX_CONFLICTS = """
SELECT source, 'doc' || CAST(doc_id AS VARCHAR) AS _id,
       'keywords' AS field, 'array' AS expected, 'string' AS actual
FROM documents WHERE doc_id % 7 = 3
UNION ALL
SELECT source, 'doc' || CAST(doc_id AS VARCHAR),
       'name', 'string', 'array'
FROM documents WHERE doc_id % 11 = 5
"""


def q_existence_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence sampling (field_aggs_funder.py:20-36): first-10 docs
    having and missing the funder field, 'first' = id order."""
    from biothings_crawler_spark.plans.analysis import existence_sample

    docs = _typed_docs(spark, sf_dir)
    having = existence_sample(docs, "funder", missing=False, k=10).select(
        "_id", F.lit("having").alias("probe"))
    missing = existence_sample(docs, "funder", missing=True, k=10).select(
        "_id", F.lit("missing").alias("probe"))
    return having.unionByName(missing)


SQL_EXISTENCE_SAMPLE = """
WITH docs AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) AS _id, doc_id % 3 = 0 AS has_f
  FROM documents)
SELECT _id, 'having' AS probe FROM (
  SELECT _id FROM docs WHERE has_f ORDER BY _id LIMIT 10)
UNION ALL
SELECT _id, 'missing' FROM (
  SELECT _id FROM docs WHERE NOT has_f ORDER BY _id LIMIT 10)
"""


def q_sitemap_from_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-from-robots seeding (massbank.py:10 path): robots.txt
    Sitemap: directives unioned with explicit sitemap seeds, distinct
    (dedicated pair — round 1 folded this into the sitemap expansion)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    host_urls = F.array(*[
        F.concat(F.lit("https://h"), F.col("n_nationkey").cast("string"),
                 F.lit(f".example.org/sm-{j}.xml")) for j in (0, 1)
    ])
    robots = n.select(
        F.concat(F.lit("h"), F.col("n_nationkey").cast("string")).alias("host"),
        F.when(F.col("n_nationkey") % 2 == 0, host_urls)
        .otherwise(F.array().cast("array<string>")).alias("sitemap_urls"),
    )
    explicit = r.select(
        F.concat(F.lit("https://explicit.example.org/r"),
                 F.col("r_regionkey").cast("string"), F.lit(".xml")).alias("sitemap_url")
    ).unionByName(
        r.limit(1).select(F.lit("https://h0.example.org/sm-0.xml").alias("sitemap_url"))
    )
    from biothings_crawler_spark.sources.sitemap import seed_sitemap_urls

    return seed_sitemap_urls(robots, explicit)


SQL_SITEMAP_FROM_ROBOTS = """
SELECT DISTINCT sitemap_url FROM (
  SELECT 'https://h' || CAST(n_nationkey AS VARCHAR) || '.example.org/sm-'
         || CAST(j AS VARCHAR) || '.xml' AS sitemap_url
  FROM nation, unnest([0, 1]) AS t(j) WHERE n_nationkey % 2 = 0
  UNION ALL
  SELECT 'https://explicit.example.org/r' || CAST(r_regionkey AS VARCHAR) || '.xml'
  FROM region
  UNION ALL
  SELECT 'https://h0.example.org/sm-0.xml')
"""


REDIRECT_MAX_HOPS = 5
_RED_URL = "https://r.example.org/u/"


def _redirect_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic network for redirect tracing (harvard.py:104-122),
    derived from documents: %50==49 self-loops (cycle guard), %10==6
    404 finals, %4==0 200 finals, %4==1/2 hop down-chain (302->301->200
    two-hop chains), %4==3 hops to doc_id+1 (the last one dangles ->
    connection error)."""
    d = _t(spark, sf_dir, "documents")
    u = lambda c: F.concat(F.lit(_RED_URL), c.cast("string"))  # noqa: E731
    i = F.col("doc_id")
    status = (
        F.when(i % 50 == 49, F.lit(301))
        .when(i % 10 == 6, F.lit(404))
        .when(i % 4 == 0, F.lit(200))
        .when(i % 4 == 1, F.lit(301))
        .when(i % 4 == 2, F.lit(302))
        .otherwise(F.lit(301))
    )
    nxt = (
        F.when(i % 50 == 49, u(i))
        .when((i % 10 == 6) | (i % 4 == 0), F.lit(None).cast("string"))
        .when((i % 4 == 1) | (i % 4 == 2), u(i - 1))
        .otherwise(u(i + 1))
    )
    return d.select(u(i).alias("url"), nxt.alias("next_url"),
                    status.cast("int").alias("status"))


def q_redirect_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harvard redirect-chain tracing (harvard.py:104-122): per seed,
    follow the hop table to {_id, success, location, status, history[]}
    with connection-error and too-many-redirects exception docs;
    iterative join with lineage truncation vs a DuckDB recursive CTE."""
    from biothings_crawler_spark.operators.redirects import trace_redirects

    hops = _redirect_hops(spark, sf_dir)
    seeds = hops.select("url")
    return trace_redirects(seeds, hops, max_hops=REDIRECT_MAX_HOPS)


SQL_REDIRECT_TRACE = f"""
WITH RECURSIVE hops AS (
  SELECT '{_RED_URL}' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 50 = 49 THEN '{_RED_URL}' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 10 = 6 OR doc_id % 4 = 0 THEN NULL
              WHEN doc_id % 4 IN (1, 2) THEN '{_RED_URL}' || CAST(doc_id - 1 AS VARCHAR)
              ELSE '{_RED_URL}' || CAST(doc_id + 1 AS VARCHAR) END AS next_url,
         CASE WHEN doc_id % 50 = 49 THEN 301
              WHEN doc_id % 10 = 6 THEN 404
              WHEN doc_id % 4 = 0 THEN 200
              WHEN doc_id % 4 = 1 THEN 301
              WHEN doc_id % 4 = 2 THEN 302
              ELSE 301 END AS status
  FROM documents),
trace(_id, cur, hist, n, done, success, location, status, exception) AS (
  SELECT url, url, '', 0, FALSE, NULL::BOOLEAN, NULL::VARCHAR,
         NULL::BIGINT, NULL::VARCHAR
  FROM hops
  UNION ALL
  SELECT t._id,
         CASE WHEN h.url IS NOT NULL AND h.next_url IS NOT NULL
                   AND h.status BETWEEN 300 AND 399
              THEN h.next_url ELSE t.cur END,
         CASE WHEN h.url IS NOT NULL AND h.next_url IS NOT NULL
                   AND h.status BETWEEN 300 AND 399
              THEN CASE WHEN t.hist = '' THEN '' ELSE t.hist || ',' END
                   || '{{"status":' || CAST(h.status AS VARCHAR)
                   || ',"url":"' || t.cur || '"}}'
              ELSE t.hist END,
         t.n + 1,
         (h.url IS NULL) OR NOT (h.next_url IS NOT NULL
                                 AND h.status BETWEEN 300 AND 399),
         CASE WHEN h.url IS NULL THEN FALSE
              WHEN NOT (h.next_url IS NOT NULL AND h.status BETWEEN 300 AND 399)
              THEN TRUE ELSE NULL END,
         CASE WHEN h.url IS NOT NULL
                   AND NOT (h.next_url IS NOT NULL AND h.status BETWEEN 300 AND 399)
              THEN t.cur END,
         CASE WHEN h.url IS NOT NULL
                   AND NOT (h.next_url IS NOT NULL AND h.status BETWEEN 300 AND 399)
              THEN CAST(h.status AS BIGINT) END,
         CASE WHEN h.url IS NULL THEN 'connection error' END
  FROM trace t LEFT JOIN hops h ON t.cur = h.url
  WHERE NOT t.done AND t.n < {REDIRECT_MAX_HOPS})
SELECT _id, success, location, status,
       '[' || hist || ']' AS history_json, exception
FROM (
  SELECT _id, success, location, status, hist, exception FROM trace WHERE done
  UNION ALL
  SELECT _id, FALSE, NULL, NULL, hist, 'too many redirects'
  FROM trace WHERE NOT done AND n = {REDIRECT_MAX_HOPS})
"""


def q_discovery_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API dump scan (discovery.py:29-35): one-shot hit list, _id = base
    prefix + hit._id."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("https://discovery.biothings.io/api/dataset/"),
                 F.col("doc_id").cast("string")).alias("_id"),
        F.col("source"),
    )


SQL_DISCOVERY_DUMP = """
SELECT 'https://discovery.biothings.io/api/dataset/' || CAST(doc_id AS VARCHAR) AS _id,
       source
FROM documents
"""


def q_mainentity_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """omicsdi mainEntity unwrap (omicsdi.py:31-33) through the REAL
    extraction path: fixture omicsdi pages (JSON-LD wrapped in a
    mainEntity envelope, falsy wrappers dropped) -> extract_items_udf
    with parser='jsonld_mainentity' -> unwrapped canonical items,
    paired against the frozen oracle's golden parquet. (The round-1
    version synthesized its JSON inline, exercising a string CASE
    rather than the extractor — this is the real operator.)"""
    return (
        q_jsonld_extract(spark, sf_dir)
        .filter(F.col("parser") == "jsonld_mainentity")
        .select("url", "item_json")
    )


# ---------------------------------------------------------------------------
# web-text pipeline: PII scrub / repetition filters / decontamination
# ---------------------------------------------------------------------------


def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministically injected PII (email for
    id%3==0, phone for id%4==0, IPv4 for id%5==0 — combinations occur
    at the lcm residues, and id%3,4,5 != 0 rows stay PII-free)."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.org"))
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" from 10."), (did % 256).cast("string"),
        F.lit("."), ((did * 7) % 256).cast("string"),
        F.lit("."), ((did * 13) % 256).cast("string"),
    )
    # SSN shape for id%8==0 (varying last group, no checksum); Luhn-
    # VALID card for id%6==0, card-SHAPED-but-invalid for id%7==0;
    # mod-97-VALID IBAN for id%9==0, IBAN-SHAPED-but-invalid (bad check
    # digits) for id%11==0: counts see only the valid ones, redaction
    # masks both.
    ssn = F.concat(F.lit(" ssn 078-05-"),
                   F.lpad((did % 10000).cast("string"), 4, "0"))
    # ONE flat concat of conditional suffixes, NOT a nested
    # when(...).otherwise(t) chain: nesting references the running
    # text expression twice per level, duplicating the subtree 2^9
    # times — that single fixture expression overflowed Janino's 64 KB
    # method limit and silently dropped the whole fused projection
    # (fixture + scrub cascade) to interpreted mode.  The flat form is
    # linear, matches the SQL twin's `|| CASE ... ELSE '' END` shape,
    # and keeps the scrub pass inside WholeStageCodegen.
    def _sfx(cond, piece):
        return F.when(cond, piece).otherwise(F.lit(""))

    t = F.concat(
        F.col("text"),
        _sfx(did % 3 == 0, email),
        _sfx(did % 4 == 0, phone),
        _sfx(did % 5 == 0, ip),
        _sfx(did % 6 == 0, F.lit(" card 4111-1111-1111-1111")),
        _sfx(did % 7 == 0, F.lit(" ref 4111 1111 1111 1112")),
        _sfx(did % 8 == 0, ssn),
        _sfx(did % 9 == 0, F.lit(" iban DE89370400440532013000")),
        _sfx(did % 11 == 0, F.lit(" acct DE00370400440532013000")),
    )
    return d.select(did.alias("id"), t.alias("text"))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (operators/pii.pii_scrub): per-doc
    email/IPv4/phone counts and the redacted text, over documents with
    deterministically injected contact strings. Pure-expression pass —
    the plan is one WholeStageCodegen projection, no exchange."""
    from biothings_crawler_spark.operators.pii import pii_scrub

    return pii_scrub(_pii_docs(spark, sf_dir), "id", "text")


_SQL_PII_DOCS = """
  SELECT doc_id AS id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN ' card 4111-1111-1111-1111' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ref 4111 1111 1111 1112' ELSE '' END
         || CASE WHEN doc_id % 8 = 0
                 THEN ' ssn 078-05-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0
                 THEN ' iban DE89370400440532013000' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' acct DE00370400440532013000' ELSE '' END AS text
  FROM documents
"""

# the oracle interpolates the OPERATOR's own patterns/tokens — editing
# pii.py can't silently leave the DuckDB side running the old regex
from biothings_crawler_spark.operators.pii import (  # noqa: E402
    CC_RE as _RE_CC_SQL,
    CC_TOKEN as _TOK_CC,
    EMAIL_RE as _RE_EMAIL_SQL,
    EMAIL_TOKEN as _TOK_EMAIL,
    IBAN_RE as _RE_IBAN_SQL,
    IBAN_TOKEN as _TOK_IBAN,
    IPV4_RE as _RE_IPV4_SQL,
    IPV4_TOKEN as _TOK_IP,
    PHONE_RE as _RE_PHONE_SQL,
    PHONE_TOKEN as _TOK_PHONE,
    SSN_RE as _RE_SSN_SQL,
    SSN_TOKEN as _TOK_SSN,
)

# DuckDB Luhn twin of operators.pii.luhn_valid_col: odd 1-based
# positions doubled (16-digit shapes), -9 when over 9, sum % 10 == 0
_SQL_LUHN = (
    "list_sum(list_transform(range(1, 17), i -> "
    "CASE WHEN i % 2 = 1 THEN "
    "CASE WHEN 2 * CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), i, 1) AS INT) > 9 "
    "THEN 2 * CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), i, 1) AS INT) - 9 "
    "ELSE 2 * CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), i, 1) AS INT) END "
    "ELSE CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), i, 1) AS INT) END)) % 10 = 0"
)

# DuckDB mod-97 twin of operators.pii.iban_valid_col: rearrange, fold
# character ASCII codes with an integer-only running remainder
_SQL_IBAN_VALID = (
    "list_reduce(list_prepend(0, list_transform("
    "list_filter(string_split(substr(c, 5) || substr(c, 1, 4), ''), "
    "ch -> len(ch) > 0), ch -> ascii(ch))), "
    "(r, d) -> CASE WHEN d <= 57 THEN (r * 10 + (d - 48)) % 97 "
    "ELSE (r * 100 + (d - 55)) % 97 END) = 1"
)

SQL_PII_SCRUB = f"""
WITH docs AS ({_SQL_PII_DOCS}),
s1 AS (SELECT id, text,
              regexp_replace(text, '{_RE_EMAIL_SQL}', '{_TOK_EMAIL}', 'g') AS t1
       FROM docs),
s2 AS (SELECT *, regexp_replace(t1, '{_RE_IPV4_SQL}', '{_TOK_IP}', 'g') AS t2 FROM s1),
s3 AS (SELECT *, regexp_replace(t2, '{_RE_PHONE_SQL}', '{_TOK_PHONE}', 'g') AS t3 FROM s2),
s4 AS (SELECT *, regexp_replace(t3, '{_RE_SSN_SQL}', '{_TOK_SSN}', 'g') AS t4 FROM s3),
s5 AS (SELECT *, regexp_replace(t4, '{_RE_IBAN_SQL}', '{_TOK_IBAN}', 'g') AS t5 FROM s4)
SELECT id,
       CAST(len(regexp_extract_all(text, '{_RE_EMAIL_SQL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{_RE_IPV4_SQL}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t2, '{_RE_PHONE_SQL}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t3, '{_RE_SSN_SQL}')) AS BIGINT) AS n_ssns,
       CAST(len(list_filter(regexp_extract_all(t4, '{_RE_IBAN_SQL}'),
                            c -> {_SQL_IBAN_VALID})) AS BIGINT) AS n_ibans,
       CAST(len(list_filter(regexp_extract_all(t5, '{_RE_CC_SQL}'),
                            c -> {_SQL_LUHN})) AS BIGINT) AS n_cards,
       regexp_replace(t5, '{_RE_CC_SQL}', '{_TOK_CC}', 'g') AS clean_text
FROM s5
"""


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level KEEP-FIRST exact passage dedup (operators/text.
    passage_dedup — Lee et al. 'Deduplicating Training Data' semantics
    at line granularity): later occurrences of a normalized passage are
    removed corpus-wide, the smallest (id, pos) copy survives; short
    passages (<20 normalized chars — e.g. the COMMON FOOTER) are
    exempt. Complements q_line_dedup, whose CCNet semantics instead
    drop ALL copies of over-frequent lines."""
    from biothings_crawler_spark.operators.text import passage_dedup

    return passage_dedup(
        _chunked_docs(spark, sf_dir), "id", "t", sep="\n", min_chars=20
    )


SQL_PASSAGE_DEDUP = f"""
WITH docs AS ({_SQL_CHUNKED_DOCS}),
lines AS (
  SELECT id, ls[i] AS passage, i - 1 AS pos
  FROM (SELECT id, string_split(text, chr(10)) AS ls FROM docs),
       UNNEST(range(1, len(ls) + 1)) AS r(i)),
keyed AS (
  SELECT id, pos, passage,
         md5(trim(regexp_replace(lower(passage), '\\s+', ' ', 'g'))) AS k,
         len(trim(regexp_replace(lower(passage), '\\s+', ' ', 'g'))) >= 20
           AS eligible
  FROM lines),
winners AS (
  -- lexicographic struct MIN mirrors the Spark side's min(struct(id,pos)):
  -- no bit-packing, so ids >= 2^43 and >2^20 passages per doc stay exact
  SELECT k, MIN(struct_pack(i := id, p := pos)) AS w
  FROM keyed WHERE eligible GROUP BY k),
kept AS (
  SELECT x.id, x.pos, x.passage FROM keyed x LEFT JOIN winners USING (k)
  WHERE NOT eligible
     OR (id = struct_extract(w, 'i') AND pos = struct_extract(w, 'p'))),
rebuilt AS (
  SELECT id, array_to_string(list(passage ORDER BY pos), chr(10)) AS clean_text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY id),
tot AS (SELECT id, len(string_split(text, chr(10))) AS n_total FROM docs)
SELECT t.id, COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_total - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM tot t LEFT JOIN rebuilt r USING (id)
"""


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive recrawl scheduling (operators/recrawl.recrawl_schedule
    — Cho & Garcia-Molina refresh policy): fetch history synthesized
    from events (url = user bucket, content hash = quantized value, so
    changes occur deterministically), folded into per-url revisit
    intervals (halve on change, double on no-change, clamped) and
    next-due timestamps. Integer-only fold — bit-identical DuckDB
    list_reduce twin."""
    from biothings_crawler_spark.operators.recrawl import recrawl_schedule

    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(F.lit("u"), (F.col("user_id") % 200).cast("string")).alias("url"),
        F.col("ts"),
        F.col("event_id"),
        (F.floor(F.col("value") * 10).cast("long") % 3).cast("string").alias("h"),
    )
    return recrawl_schedule(
        fetches, "url", "ts", "h", "event_id",
        base_interval_s=86400, min_interval_s=3600, max_interval_s=2592000,
    )


SQL_RECRAWL_SCHEDULE = """
WITH f AS (
  SELECT 'u' || CAST(user_id % 200 AS VARCHAR) AS url,
         ts, event_id,
         CAST(CAST(floor(value * 10) AS BIGINT) % 3 AS VARCHAR) AS h,
         epoch_us(ts) AS us
  FROM events),
fl AS (
  SELECT url, us, event_id,
         CASE WHEN lag(h) OVER w IS NOT NULL
              THEN CAST(h <> lag(h) OVER w AS INT) END AS chg
  FROM f WINDOW w AS (PARTITION BY url ORDER BY ts, event_id)),
agg AS (
  SELECT url, CAST(COUNT(*) AS BIGINT) AS n_fetches,
         CAST(COALESCE(SUM(chg), 0) AS BIGINT) AS n_changes,
         MAX(us) AS last_us,
         list(chg ORDER BY us, event_id) AS flags
  FROM fl GROUP BY url),
iv AS (
  SELECT url, n_fetches, n_changes, last_us,
         list_reduce(
           list_prepend(CAST(86400 AS BIGINT),
                        list_transform(list_filter(flags, c -> c IS NOT NULL),
                                       c -> CAST(c AS BIGINT))),
           (acc, c) -> CASE WHEN c = 1
                            THEN GREATEST(CAST(3600 AS BIGINT), acc // 2)
                            ELSE LEAST(CAST(2592000 AS BIGINT), acc * 2)
                       END) AS interval_s
  FROM agg)
SELECT url, n_fetches, n_changes, interval_s,
       last_us + interval_s * 1000000 AS next_due_us
FROM iv
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot diff (operators/snapshot.snapshot_diff): two
    synthetic rounds derived from documents — round 2 drops doc_id%7==0
    (removed), adds shifted ids (added), and rewrites text for
    doc_id%5==0 (changed) — classified by one full-outer join +
    row-local CASE; the added+changed set is the next round's
    re-extract queue."""
    from biothings_crawler_spark.operators.snapshot import snapshot_diff

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://s.example.org/d/"), F.col("doc_id").cast("string"))
    old = d.select(url.alias("url"), F.md5("text").alias("content_hash"))
    new = (
        d.filter(F.col("doc_id") % 7 != 0)
        .select(
            url.alias("url"),
            F.md5(
                F.when(F.col("doc_id") % 5 == 0,
                       F.concat(F.col("text"), F.lit(" v2")))
                .otherwise(F.col("text"))
            ).alias("content_hash"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0).select(
                F.concat(F.lit("https://s.example.org/d/"),
                         (F.col("doc_id") + 1_000_000).cast("string")).alias("url"),
                F.md5("text").alias("content_hash"),
            )
        )
    )
    return snapshot_diff(old, new)


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT 'https://s.example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
         md5(text) AS old_hash
  FROM documents),
new AS (
  SELECT 'https://s.example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS new_hash
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT 'https://s.example.org/d/' || CAST(doc_id + 1000000 AS VARCHAR),
         md5(text)
  FROM documents WHERE doc_id % 11 = 0)
SELECT COALESCE(o.url, n.url) AS url,
       CASE WHEN o.old_hash IS NULL THEN 'added'
            WHEN n.new_hash IS NULL THEN 'removed'
            WHEN o.old_hash <> n.new_hash THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.old_hash, n.new_hash
FROM old o FULL OUTER JOIN new n ON o.url = n.url
"""


def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl ingest dedup (operators/snapshot.latest_snapshot):
    events re-keyed as repeated URL fetch records (each url fetched by
    many events over time) -> exactly one row per url, the newest by
    (epoch-us, event_id), payload carried inside the max-struct — one
    hash agg, no window. The oracle is the row_number formulation;
    equality proves the struct-max picks the identical winner."""
    from biothings_crawler_spark.operators.snapshot import latest_snapshot

    ev = _t(spark, sf_dir, "events")
    snaps = ev.select(
        F.concat(
            F.lit("https://h"), (F.col("user_id") % 97).cast("string"),
            F.lit(".example.org/p/"), (F.col("event_id") % 2000).cast("string"),
        ).alias("url"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("us"),
        "event_id",
        F.md5(F.col("props")).alias("content_hash"),
    )
    return latest_snapshot(snaps, "url", "us", "event_id",
                           payload_cols=("content_hash",))


SQL_LATEST_SNAPSHOT = """
WITH s AS (
  SELECT 'https://h' || CAST(user_id % 97 AS VARCHAR)
           || '.example.org/p/' || CAST(event_id % 2000 AS VARCHAR) AS url,
         epoch_us(ts) AS us, event_id, md5(props) AS content_hash
  FROM events)
SELECT url, us AS fetched_us, content_hash
FROM (SELECT *, row_number() OVER (PARTITION BY url
                                   ORDER BY us DESC, event_id DESC) AS rn
      FROM s)
WHERE rn = 1
"""


def q_refetch_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED incremental-crawl round built from the round-3
    operators working together: snapshot_diff between the last two
    rounds feeds refetch_queue (added+changed), recrawl_schedule over
    a 3-round fetch history contributes the freshness-due URLs
    (next_due_us <= cutoff), and the union is deduplicated per URL
    keeping the highest-priority reason (changed > added > due).
    Verified against ONE DuckDB statement for the whole composition —
    the integration contract, like q_clean_corpus / q_web_refine."""
    from biothings_crawler_spark.operators.recrawl import recrawl_schedule
    from biothings_crawler_spark.operators.snapshot import (
        refetch_queue,
        snapshot_diff,
    )

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://s.example.org/d/"), F.col("doc_id").cast("string"))

    # 3-round fetch history: content of doc_id%3==0 changes at round 2
    rounds = spark.range(3).select(F.col("id").alias("r"))
    hist = d.crossJoin(rounds).select(
        url.alias("url"),
        F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00' + make_interval(0,0,0,r)").alias("ts"),
        (F.col("doc_id") * 3 + F.col("r")).alias("fetch_id"),
        F.when((F.col("doc_id") % 3 == 0) & (F.col("r") == 2), F.lit("v2"))
        .otherwise(F.lit("v1")).alias("h"),
    )
    sched = recrawl_schedule(
        hist, "url", "ts", "h", "fetch_id",
        base_interval_s=86400, min_interval_s=3600, max_interval_s=30 * 86400,
    )
    cutoff_us = 1704412800000000  # 2024-01-05T00:00:00Z epoch micros
    due = sched.filter(F.col("next_due_us") <= cutoff_us).select(
        "url", F.lit("due").alias("reason"), F.lit(3).alias("prio")
    )

    # snapshot diff between the last two rounds (same fixture rules as
    # q_snapshot_diff: %7 removed, %11 added, %5 changed)
    old = d.select(url.alias("url"), F.md5("text").alias("content_hash"))
    new = (
        d.filter(F.col("doc_id") % 7 != 0)
        .select(
            url.alias("url"),
            F.md5(
                F.when(F.col("doc_id") % 5 == 0,
                       F.concat(F.col("text"), F.lit(" v2")))
                .otherwise(F.col("text"))
            ).alias("content_hash"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0).select(
                F.concat(F.lit("https://s.example.org/d/"),
                         (F.col("doc_id") + 1_000_000).cast("string")).alias("url"),
                F.md5("text").alias("content_hash"),
            )
        )
    )
    diffq = refetch_queue(snapshot_diff(old, new)).select(
        "url",
        F.col("status").alias("reason"),
        F.when(F.col("status") == "changed", F.lit(1)).otherwise(F.lit(2)).alias("prio"),
    )

    merged = diffq.unionByName(due)
    return (
        merged.groupBy("url")
        .agg(F.min(F.struct("prio", "reason")).alias("w"))
        .select("url", F.col("w.reason").alias("reason"),
                F.col("w.prio").cast("long").alias("prio"))
    )


SQL_REFETCH_ROUND = """
WITH hist AS (
  SELECT 'https://s.example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (r) DAY AS ts,
         doc_id * 3 + r AS fetch_id,
         CASE WHEN doc_id % 3 = 0 AND r = 2 THEN 'v2' ELSE 'v1' END AS h
  FROM documents CROSS JOIN UNNEST(range(0, 3)) AS rr(r)),
fl AS (
  SELECT url, epoch_us(ts) AS us, fetch_id,
         CASE WHEN lag(h) OVER w IS NOT NULL
              THEN CAST(h <> lag(h) OVER w AS INT) END AS chg
  FROM hist WINDOW w AS (PARTITION BY url ORDER BY ts, fetch_id)),
agg AS (
  SELECT url, MAX(us) AS last_us, list(chg ORDER BY us, fetch_id) AS flags
  FROM fl GROUP BY url),
iv AS (
  SELECT url, last_us,
         list_reduce(
           list_prepend(CAST(86400 AS BIGINT),
                        list_transform(list_filter(flags, c -> c IS NOT NULL),
                                       c -> CAST(c AS BIGINT))),
           (acc, c) -> CASE WHEN c = 1
                            THEN GREATEST(CAST(3600 AS BIGINT), acc // 2)
                            ELSE LEAST(CAST(2592000 AS BIGINT), acc * 2)
                       END) AS interval_s
  FROM agg),
due AS (
  SELECT url, 'due' AS reason, 3 AS prio FROM iv
  WHERE last_us + interval_s * 1000000 <= 1704412800000000),
old AS (
  SELECT 'https://s.example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
         md5(text) AS old_hash
  FROM documents),
new AS (
  SELECT 'https://s.example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS new_hash
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT 'https://s.example.org/d/' || CAST(doc_id + 1000000 AS VARCHAR),
         md5(text)
  FROM documents WHERE doc_id % 11 = 0),
diffq AS (
  SELECT COALESCE(o.url, n.url) AS url,
         CASE WHEN o.old_hash IS NULL THEN 'added'
              WHEN o.old_hash <> n.new_hash THEN 'changed' END AS reason
  FROM old o FULL OUTER JOIN new n ON o.url = n.url
  WHERE n.new_hash IS NOT NULL
    AND (o.old_hash IS NULL OR o.old_hash <> n.new_hash)),
merged AS (
  SELECT url, reason,
         CASE reason WHEN 'changed' THEN 1 WHEN 'added' THEN 2 END AS prio
  FROM diffq
  UNION ALL
  SELECT url, reason, prio FROM due)
SELECT url,
       arg_min(reason, prio) AS reason,
       CAST(MIN(prio) AS BIGINT) AS prio
FROM merged GROUP BY url
"""


def _repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked multi-line docs with planted casualties: duplicated
    spam lines (id%7==0), bullet lines (id%11==0), ellipsis lines
    (id%13==0)."""
    d = _chunked_docs(spark, sf_dir)
    did = F.col("id")
    t = F.col("t")
    t = F.when(did % 7 == 0, F.concat(t, F.lit("\nbuy now\nbuy now\nbuy now"))).otherwise(t)
    t = F.when(did % 11 == 0, F.concat(t, F.lit("\n- item one\n- item two"))).otherwise(t)
    t = F.when(did % 13 == 0, F.concat(t, F.lit("\nread more..."))).otherwise(t)
    return d.select("id", t.alias("t"))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/format quality signals
    (operators/text.repetition_stats) over multi-line docs with
    planted spam/bullet/ellipsis casualties; ratios quantized to
    floor(x*1e6) BIGINT for cross-engine hashing, plus the composite
    Gopher flag (dup_line>0.3 | dup_para>0.3 | top_word>0.2)."""
    from biothings_crawler_spark.operators.text import repetition_stats

    r = repetition_stats(_repetition_docs(spark, sf_dir), "id", "t")

    def q6(c: str):
        return F.floor(F.col(c) * 1e6).cast("long").alias(c.replace("_frac", "_q6"))

    return r.select(
        "id", "n_lines", "n_words",
        q6("dup_line_frac"), q6("dup_para_frac"),
        q6("bullet_frac"), q6("ellipsis_frac"), q6("top_word_frac"),
        (
            (F.col("dup_line_frac") > 0.3)
            | (F.col("dup_para_frac") > 0.3)
            | (F.col("top_word_frac") > 0.2)
        ).alias("flagged"),
    )


SQL_REPETITION_STATS = f"""
WITH base AS ({_SQL_CHUNKED_DOCS}),
docs AS (
  SELECT id,
         text
         || CASE WHEN id % 7 = 0 THEN chr(10) || 'buy now' || chr(10) || 'buy now' || chr(10) || 'buy now' ELSE '' END
         || CASE WHEN id % 11 = 0 THEN chr(10) || '- item one' || chr(10) || '- item two' ELSE '' END
         || CASE WHEN id % 13 = 0 THEN chr(10) || 'read more...' ELSE '' END AS t
  FROM base),
per AS (
  SELECT id,
         list_filter(string_split(t, chr(10)), l -> len(trim(l)) > 0) AS lines,
         list_filter(string_split(t, chr(10) || chr(10)), p -> len(trim(p)) > 0) AS paras,
         list_filter(string_split_regex(lower(t), '\\s+'), x -> len(x) > 0) AS words
  FROM docs),
expr AS (
  SELECT id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CASE WHEN len(lines) > 0
              THEN 1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE)
              ELSE 0.0 END AS dup_line_frac,
         CASE WHEN len(paras) > 0
              THEN 1.0 - len(list_distinct(paras)) / CAST(len(paras) AS DOUBLE)
              ELSE 0.0 END AS dup_para_frac,
         CASE WHEN len(lines) > 0
              THEN len(list_filter(lines, l -> regexp_matches(l, '^[-*] '))) / CAST(len(lines) AS DOUBLE)
              ELSE 0.0 END AS bullet_frac,
         CASE WHEN len(lines) > 0
              THEN len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$'))) / CAST(len(lines) AS DOUBLE)
              ELSE 0.0 END AS ellipsis_frac
  FROM per),
wc AS (
  SELECT id, w, COUNT(*) AS c
  FROM (SELECT id, unnest(words) AS w FROM per)
  GROUP BY id, w),
tops AS (SELECT id, MAX(c) AS top_c, SUM(c) AS n_words FROM wc GROUP BY id),
joined AS (
  SELECT e.*, CAST(coalesce(tp.n_words, 0) AS BIGINT) AS n_words,
         CASE WHEN coalesce(tp.n_words, 0) > 0
              THEN tp.top_c / CAST(tp.n_words AS DOUBLE) ELSE 0.0 END AS top_word_frac
  FROM expr e LEFT JOIN tops tp USING (id))
SELECT id, n_lines, n_words,
       CAST(floor(dup_line_frac * 1e6) AS BIGINT) AS dup_line_q6,
       CAST(floor(dup_para_frac * 1e6) AS BIGINT) AS dup_para_q6,
       CAST(floor(bullet_frac * 1e6) AS BIGINT) AS bullet_q6,
       CAST(floor(ellipsis_frac * 1e6) AS BIGINT) AS ellipsis_q6,
       CAST(floor(top_word_frac * 1e6) AS BIGINT) AS top_word_q6,
       (dup_line_frac > 0.3 OR dup_para_frac > 0.3 OR top_word_frac > 0.2) AS flagged
FROM joined
"""

DECONTAM_N = 5


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/contamination.decontaminate,
    GPT-3-style n-gram overlap, n=5 at fixture scale): the 'benchmark'
    is a 10-word slice of every 20th document — those documents (and
    any chance n-gram collisions) must flag as contaminated. The
    benchmark gram set is broadcast (bounded by construction); the
    corpus side never shuffles."""
    from biothings_crawler_spark.operators.contamination import decontaminate
    from biothings_crawler_spark.operators.text import words_col

    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"), "text")
    bench = d.filter(F.col("id") % 20 == 0).select(
        F.array_join(F.slice(words_col(F.col("text")), 3, 10), " ").alias("text")
    )
    return decontaminate(d, bench, "id", "text", n=DECONTAM_N)


_SQL_GRAMS5 = (
    "CASE WHEN len(words) >= 5 THEN "
    "[array_to_string(words[i:i+4], ' ') for i in range(1, len(words) - 3)] "
    "ELSE [] END"
)

SQL_DECONTAMINATION = f"""
WITH wds AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
bwords AS (SELECT words[3:12] AS words FROM wds WHERE id % 20 = 0),
bgrams AS (
  SELECT DISTINCT unnest({_SQL_GRAMS5}) AS gram FROM bwords),
dg AS (SELECT id, list_distinct({_SQL_GRAMS5}) AS grams FROM wds),
hits AS (
  SELECT id, COUNT(*) AS n_hits
  FROM (SELECT id, unnest(grams) AS gram FROM dg) JOIN bgrams USING (gram)
  GROUP BY id)
SELECT d.id, CAST(len(d.grams) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) >= 1 AS contaminated
FROM dg d LEFT JOIN hits h USING (id)
"""


def _synth_html_pages(
    spark: SparkSession, sf_dir: str, inject_email: bool = False
) -> DataFrame:
    """(id, source, html binary) pages synthesized from documents:
    script/style blocks, comments, entities incl. the '&amp;lt;'
    double-escape case, block tags, <br>; optionally an email in the
    second paragraph for id%3==0 (the web_refine PII casualty)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    words = F.split(F.col("text"), " ")
    p1 = F.array_join(F.slice(words, 1, 8), " ")
    # unbounded tail (mirrors the oracle's w[9:]) — a fixed length cap
    # would silently truncate long docs on the Spark side only
    p2 = F.array_join(
        F.slice(words, 9, F.greatest(F.size(words) - F.lit(8), F.lit(1))), " "
    )
    spam = F.lit("")
    if inject_email:
        # web_refine casualties: an email (PII scrub must catch it) and,
        # for id%9==0, a 6-item spam list (dup_line_frac 5/13 > 0.3 after
        # html->text, so the repetition filter must drop the doc)
        p2 = F.concat(
            p2,
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" contact user"), i, F.lit("@example.org")),
            ).otherwise(F.lit("")),
        )
        spam = F.when(
            F.col("doc_id") % 9 == 0, F.lit("<li>buy now</li>" * 6)
        ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "), i, F.lit("</title>"),
        F.lit("<style>body { color: red; }</style>"),
        F.lit('<script type="text/javascript">var x = "'), i, F.lit('";</script></head>'),
        F.lit("<body><!-- build "), i, F.lit(" --><h1>Q&amp;A &amp;lt;doc "), i, F.lit("&gt;</h1>"),
        F.lit("<p>"), p1, F.lit("</p><p>"), p2, F.lit("&nbsp;&#39;end&quot;</p>"),
        F.lit("<ul><li>alpha</li><li>beta</li>"), spam,
        F.lit("</ul><br>tail</body></html>"),
    )
    return d.select(
        F.col("doc_id").alias("id"), "source", F.encode(html, "utf-8").alias("html")
    )


def q_html_to_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (operators/extract.html_to_text_col):
    full HTML pages synthesized from documents -> readable text, all
    JVM regexp expressions. Oracle = the identical RE2 pipeline in
    DuckDB."""
    from biothings_crawler_spark.operators.extract import html_to_text_col

    pages = _synth_html_pages(spark, sf_dir)
    return pages.select("id", html_to_text_col(F.col("html")).alias("text"))


def _sql_html_pipeline(inject_email: bool = False) -> str:
    """CTE chain d -> h -> ... -> tx(id, source, text): the synthetic
    pages plus the full RE2 html->text pipeline, ending at extracted
    text. Shared by SQL_HTML_TO_TEXT and SQL_WEB_REFINE."""
    email = (
        " || CASE WHEN id % 3 = 0 THEN ' contact user' || i || '@example.org'"
        " ELSE '' END"
        if inject_email
        else ""
    )
    spam = (
        " || CASE WHEN id % 9 = 0 THEN repeat('<li>buy now</li>', 6)"
        " ELSE '' END"
        if inject_email
        else ""
    )
    return f"""
d AS (
  SELECT doc_id AS id, CAST(doc_id AS VARCHAR) AS i,
         string_split(text, ' ') AS w, source
  FROM documents),
h AS (
  SELECT id, source,
         '<html><head><title>Doc ' || i || '</title>'
         || '<style>body {{ color: red; }}</style>'
         || '<script type="text/javascript">var x = "' || i || '";</script></head>'
         || '<body><!-- build ' || i || ' --><h1>Q&amp;A &amp;lt;doc ' || i || '&gt;</h1>'
         || '<p>' || array_to_string(w[1:8], ' ') || '</p><p>'
         || array_to_string(w[9:], ' '){email} || '&nbsp;&#39;end&quot;</p>'
         || '<ul><li>alpha</li><li>beta</li>'{spam}
         || '</ul><br>tail</body></html>' AS t
  FROM d),
r1 AS (SELECT id, source, regexp_replace(t, '(?is)<script[^>]*>.*?</script>', '', 'g') AS t FROM h),
r2 AS (SELECT id, source, regexp_replace(t, '(?is)<style[^>]*>.*?</style>', '', 'g') AS t FROM r1),
r3 AS (SELECT id, source, regexp_replace(t, '(?s)<!--.*?-->', '', 'g') AS t FROM r2),
r4 AS (SELECT id, source, regexp_replace(t, '(?i)<br[^>]*>|</(p|div|h[1-6]|li|tr|title)>', chr(10), 'g') AS t FROM r3),
r5 AS (SELECT id, source, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM r4),
e AS (
  SELECT id, source,
         replace(replace(replace(replace(replace(replace(t,
           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
           '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t
  FROM r5),
w1 AS (SELECT id, source, regexp_replace(t, '[^\\S\\n]+', ' ', 'g') AS t FROM e),
w2 AS (SELECT id, source, regexp_replace(t, ' ?\\n ?', chr(10), 'g') AS t FROM w1),
w3 AS (SELECT id, source, regexp_replace(t, '\\n{{3,}}', chr(10) || chr(10), 'g') AS t FROM w2),
tx AS (SELECT id, source, regexp_replace(t, '^\\s+|\\s+$', '', 'g') AS text FROM w3)"""


SQL_HTML_TO_TEXT = f"""
WITH {_sql_html_pipeline()}
SELECT id, text FROM tx
"""


def q_web_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED web-page refinement pipeline, end-to-end in one
    lazy plan: synthetic HTML pages (with injected emails) ->
    html_to_text -> PII scrub -> repetition filter (dup_line<=0.3,
    top_word<=0.2) -> per-source mixture sampling. One DuckDB
    statement is the oracle for the whole composition. The only
    exchanges in the plan are the repetition word-mode agg and its
    1:1 id-join back — extraction, scrubbing, and sampling are all
    codegen projections / row-local filters riding the scan."""
    from biothings_crawler_spark.operators.extract import html_to_text_col
    from biothings_crawler_spark.operators.pii import (
        pii_email_count,
        pii_scrub_col,
    )
    from biothings_crawler_spark.operators.sampling import mixture_sample
    from biothings_crawler_spark.operators.text import repetition_stats

    pages = _synth_html_pages(spark, sf_dir, inject_email=True)
    txt = pages.select("id", "source", html_to_text_col(F.col("html")).alias("text"))
    t = F.col("text")
    scr = txt.select(
        "id", "source",
        pii_email_count(t).cast("long").alias("n_emails"),
        pii_scrub_col(t).alias("clean_text"),
    )
    rep = repetition_stats(scr, "id", "clean_text")
    keep = scr.join(rep.select("id", "n_words", "dup_line_frac", "top_word_frac"), "id").filter(
        (F.col("dup_line_frac") <= 0.3) & (F.col("top_word_frac") <= 0.2)
    )
    rates = {f"src{i}": MIX_RATES[i % 4] for i in range(20)}
    sampled = mixture_sample(keep, "id", "source", rates, seed="web1")
    return sampled.select(
        "id", "source", "n_emails",
        F.md5("clean_text").alias("text_md5"),
        "n_words",
    )


def _sql_web_refine() -> str:
    from biothings_crawler_spark.operators.sampling import rate_threshold

    whens = "\n".join(
        f"        WHEN {m} THEN {rate_threshold(MIX_RATES[m])}" for m in range(4)
    )
    return f"""
WITH {_sql_html_pipeline(inject_email=True)},
s1 AS (SELECT id, source, text,
              regexp_replace(text, '{_RE_EMAIL_SQL}', '{_TOK_EMAIL}', 'g') AS t1
       FROM tx),
s2 AS (SELECT *, regexp_replace(t1, '{_RE_IPV4_SQL}', '{_TOK_IP}', 'g') AS t2 FROM s1),
scr AS (
  SELECT id, source,
         CAST(len(regexp_extract_all(text, '{_RE_EMAIL_SQL}')) AS BIGINT) AS n_emails,
         regexp_replace(t2, '{_RE_PHONE_SQL}', '{_TOK_PHONE}', 'g') AS clean_text
  FROM s2),
per AS (
  SELECT id,
         list_filter(string_split(clean_text, chr(10)), l -> len(trim(l)) > 0) AS lines,
         list_filter(string_split_regex(lower(clean_text), '\\s+'), x -> len(x) > 0) AS words
  FROM scr),
expr AS (
  SELECT id,
         CASE WHEN len(lines) > 0
              THEN 1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE)
              ELSE 0.0 END AS dup_line_frac
  FROM per),
wc AS (
  SELECT id, w, COUNT(*) AS c
  FROM (SELECT id, unnest(words) AS w FROM per)
  GROUP BY id, w),
tops AS (SELECT id, MAX(c) AS top_c, SUM(c) AS n_words FROM wc GROUP BY id),
keep AS (
  -- LEFT JOIN + coalesce mirrors repetition_stats' left join: a
  -- zero-word doc has no tops row but top_word_frac 0.0, so it passes
  SELECT s.id, s.source, s.n_emails, s.clean_text,
         CAST(coalesce(tp.n_words, 0) AS BIGINT) AS n_words
  FROM scr s JOIN expr e USING (id) LEFT JOIN tops tp USING (id)
  WHERE e.dup_line_frac <= 0.3
    AND (CASE WHEN coalesce(tp.n_words, 0) > 0
              THEN tp.top_c / CAST(tp.n_words AS DOUBLE)
              ELSE 0.0 END) <= 0.2)
SELECT id, source, n_emails, md5(clean_text) AS text_md5, n_words
FROM keep
WHERE {_SQL_HASH60.format(w="'web1:' || CAST(id AS VARCHAR)")}
      < CASE CAST(substr(source, 4) AS INT) % 4
{whens}
        END
"""


MIX_RATES = [0.8, 0.4, 0.2, 0.1]  # by source-number % 4


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling (operators/sampling): per-source
    keep rates (0.8/0.4/0.2/0.1 by source number % 4), decision =
    md5-u60 hash threshold — zero shuffle, and the oracle verifies the
    individual sampling DECISIONS, not just the rates."""
    from biothings_crawler_spark.operators.sampling import mixture_sample

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "source"
    )
    rates = {f"src{i}": MIX_RATES[i % 4] for i in range(20)}
    return mixture_sample(d, "id", "source", rates, seed="mix1")


def _mix_sql_thresholds() -> str:
    from biothings_crawler_spark.operators.sampling import rate_threshold

    whens = "\n".join(
        f"         WHEN {m} THEN {rate_threshold(MIX_RATES[m])}" for m in range(4)
    )
    return f"CASE CAST(substr(source, 4) AS INT) % 4\n{whens}\n         END"


SQL_MIXTURE_SAMPLE = f"""
SELECT doc_id AS id, source
FROM documents
WHERE {_SQL_HASH60.format(w="'mix1:' || CAST(doc_id AS VARCHAR)")}
      < {_mix_sql_thresholds()}
"""


CHUNK_TOKENS, CHUNK_OVERLAP = 24, 8


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators/text.chunk_documents):
    24-token windows, 8-token overlap, whitespace tokens — pure array
    expressions + posexplode, zero shuffle."""
    from biothings_crawler_spark.operators.text import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(
        d, "doc_id", "text", chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


SQL_DOC_CHUNKS = f"""
WITH wds AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
st AS (
  SELECT id, words,
         range(1, GREATEST(len(words) - {CHUNK_OVERLAP}, 1) + 1,
               {CHUNK_TOKENS - CHUNK_OVERLAP}) AS starts
  FROM wds),
ex AS (
  SELECT id, generate_subscripts(starts, 1) - 1 AS chunk_idx,
         unnest(starts) AS s, words
  FROM st)
SELECT id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(LEAST({CHUNK_TOKENS}, len(words) - s + 1) AS BIGINT) AS n_tokens,
       array_to_string(words[s:s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text
FROM ex
"""


HLL_MOD = 7000  # true cardinality at sf0.01: 500 docs x 20 -> 0..9999 mod 7000


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-arithmetic HyperLogLog (operators/sketch): distinct
    count of 'v{(doc_id*20+k) % 7000}' over 20 values per doc (true
    cardinality 7000 at sf0.01 — deliberately above the raw-HLL
    small-range cutoff 2.5m=640, with planted duplicates). The
    ESTIMATE itself is the oracle-compared value — md5 registers +
    power-of-two integer harmonic mean make it bit-identical in
    DuckDB, which no float HLL can be."""
    from biothings_crawler_spark.operators.sketch import hll_distinct

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("k")
    ).select(
        F.concat(
            F.lit("v"), ((F.col("doc_id") * 20 + F.col("k")) % HLL_MOD).cast("string")
        ).alias("v")
    )
    return hll_distinct(d, "v")


# shared DuckDB HLL tail: registers -> harmonic mean -> estimate with
# the linear-counting small-range branch; the LC lookup table literal
# comes from operators.sketch.LC_LUT, so both engines embed the SAME
# pre-rounded m*ln(m/V) integers (no runtime log in either engine)
def _sql_hll_tail() -> str:
    from biothings_crawler_spark.operators.sketch import LC_CUTOFF, LC_LUT

    lut = ", ".join(str(x) for x in LC_LUT)
    return f"""
h AS (SELECT md5(v) AS h FROM vals),
br AS (SELECT ('0x' || substr(h, 1, 2))::BIGINT AS bucket,
              ('0x' || substr(h, 3, 13))::BIGINT AS suffix FROM h),
rr AS (SELECT bucket,
              LEAST(CASE WHEN suffix > 0 THEN 53 - length(bin(suffix))
                         ELSE 30 END, 30) AS rho
       FROM br),
regs AS (SELECT bucket, MAX(rho) AS r FROM rr GROUP BY bucket),
z AS (SELECT SUM(1::BIGINT << (30 - r))
             + (256 - COUNT(*)) * (1::BIGINT << 30) AS z,
             CAST(256 - COUNT(*) AS BIGINT) AS v_empty FROM regs),
raw AS (SELECT CAST(712300 * (65536 * (1::BIGINT << 30) // z) // 1000000
               AS BIGINT) AS raw_est, v_empty FROM z)
SELECT CAST(CASE WHEN raw_est <= {LC_CUTOFF} AND v_empty > 0
            THEN list_extract([{lut}], CAST(v_empty AS INT))
            ELSE raw_est END AS BIGINT) AS estimate
FROM raw
"""


SQL_HLL_DISTINCT = f"""
WITH vals AS (
  SELECT 'v' || CAST((doc_id * 20 + k) % {HLL_MOD} AS VARCHAR) AS v
  FROM documents CROSS JOIN UNNEST(range(0, 20)) AS r(k)),
{_sql_hll_tail()}
"""


HLL_SMALL_MOD = 97  # true cardinality: deep in the linear-counting regime


def q_hll_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer HLL in the SMALL-RANGE regime: distinct count of
    'v{{doc_id % 97}}' (true cardinality 97, raw estimate <= 2.5m=640),
    exercising the linear-counting branch — m*ln(m/V) via the shared
    pre-rounded integer LUT, bit-identical in DuckDB. Linear counting
    is near-exact at this load factor, so the sketch answer is also a
    good estimate (pytest asserts error bounds)."""
    from biothings_crawler_spark.operators.sketch import hll_distinct

    d = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("v"), (F.col("doc_id") % HLL_SMALL_MOD).cast("string")
        ).alias("v")
    )
    return hll_distinct(d, "v")


SQL_HLL_SMALL = f"""
WITH vals AS (
  SELECT 'v' || CAST(doc_id % {HLL_SMALL_MOD} AS VARCHAR) AS v FROM documents),
{_sql_hll_tail()}
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascaded rollup (TimescaleDB continuous
    aggregates): hour buckets from raw events, day buckets from the
    HOURLY materialization, month buckets from the DAILY one — each
    coarser level re-aggregates the finer level, never the raw table
    (at 100 TB that's the difference between scanning 24 rows per day
    and 86M). Sums go through DECIMAL(18,6) so the cascade is exact
    and order-independent; DOUBLE only in the final projection.
    Output: (level, bucket, n_events, sum_value) across all three
    levels. pytest asserts cascade == direct-from-raw per level."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select(F.date_trunc("hour", "ts").alias("b"),
                  F.col("value").cast("decimal(18,6)").alias("v"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("v").alias("s"))
    )
    daily = (
        hourly.select(F.date_trunc("day", "b").alias("b"), "n", "s")
        .groupBy("b").agg(F.sum("n").cast("long").alias("n"), F.sum("s").alias("s"))
    )
    monthly = (
        daily.select(F.date_trunc("month", "b").alias("b"), "n", "s")
        .groupBy("b").agg(F.sum("n").cast("long").alias("n"), F.sum("s").alias("s"))
    )

    def lvl(df, name):
        return df.select(
            F.lit(name).alias("level"),
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            F.col("s").cast("double").alias("sum_value"),
        )

    return (
        lvl(hourly, "hour")
        .unionByName(lvl(daily, "day"))
        .unionByName(lvl(monthly, "month"))
        .withColumnRenamed("n", "n_events")
    )


SQL_HYPERTABLE_ROLLUP = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS b, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1),
daily AS (
  SELECT date_trunc('day', b) AS b, SUM(n) AS n, SUM(s) AS s
  FROM hourly GROUP BY 1),
monthly AS (
  SELECT date_trunc('month', b) AS b, SUM(n) AS n, SUM(s) AS s
  FROM daily GROUP BY 1)
SELECT 'hour' AS level, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(n AS BIGINT) AS n_events, CAST(s AS DOUBLE) AS sum_value FROM hourly
UNION ALL
SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), CAST(n AS BIGINT), CAST(s AS DOUBLE) FROM daily
UNION ALL
SELECT 'month', strftime(b, '%Y-%m-%d %H:%M:%S'), CAST(n AS BIGINT), CAST(s AS DOUBLE) FROM monthly
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.asof_join): every event enriched
    with the latest per-user snapshot value at event time (12-hourly
    snapshots). The oracle is DuckDB's NATIVE ASOF JOIN — the composed
    union-window operator is checked against an independent built-in
    implementation of the semantics."""
    from biothings_crawler_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    upd = (
        ev.select("user_id").distinct()
        .select("user_id", F.explode(F.sequence(F.lit(0), F.lit(40))).alias("k"))
        .select(
            "user_id",
            F.expr(
                "timestampadd(HOUR, 12 * k, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
            ).alias("rts"),
            (F.col("user_id") * 1000 + F.col("k")).cast("long").alias("val"),
        )
    )
    out = asof_join(ev, upd, "user_id", "ts", "rts", "val")
    return out.select("event_id", "user_id", F.col("val").alias("snapshot_val"))


SQL_ASOF_JOIN = """
WITH upd AS (
  SELECT u.user_id,
         TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 12 HOUR AS rts,
         u.user_id * 1000 + k AS val
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN UNNEST(range(0, 41)) AS r(k))
SELECT e.event_id, e.user_id, CAST(u.val AS BIGINT) AS snapshot_val
FROM events e ASOF JOIN upd u
  ON e.user_id = u.user_id AND e.ts >= u.rts
"""

RANGE_BUCKET_US = 3_600 * 1_000_000  # 1h buckets; intervals span 90min


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join (operators/temporal.bucketed_range_join):
    events x 90-minute maintenance windows every 5 hours, joined via
    1-hour bucket equi-join + exact filter instead of the O(N*M)
    nested loop a plain inequality join would plan."""
    from biothings_crawler_spark.operators.temporal import bucketed_range_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("tus"),
    )
    iv = spark.range(100).select(
        F.col("id").alias("window_id"),
        (F.col("id") * 18_000_000_000).alias("start_us"),
        (F.col("id") * 18_000_000_000 + 5_400_000_000).alias("end_us"),
    )
    out = bucketed_range_join(ev, iv, "tus", "start_us", "end_us", RANGE_BUCKET_US)
    return out.select("event_id", "window_id")


SQL_RANGE_JOIN = """
WITH p AS (
  SELECT event_id,
         epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00') AS tus
  FROM events),
iv AS (
  SELECT k AS window_id, k * 18000000000 AS s, k * 18000000000 + 5400000000 AS e
  FROM UNNEST(range(0, 100)) AS r(k))
SELECT p.event_id, CAST(iv.window_id AS BIGINT) AS window_id
FROM p JOIN iv ON p.tus BETWEEN iv.s AND iv.e
"""


SESSION_GAP_S = 600


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessionize): per-user
    sessions over events with a 10-minute gap, integer
    epoch-microsecond boundaries — batch twin of streaming session
    windows."""
    from biothings_crawler_spark.operators.sessionize import sessionize

    ev = _t(spark, sf_dir, "events")
    return sessionize(ev, "user_id", "ts", "event_id", gap_seconds=SESSION_GAP_S)


def q_sessionize_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-agg-only sessionization (operators/sessionize.
    sessionize_fold): same sessions as q_sessionize — same oracle —
    computed with zero SortExec/WindowExec (array_sort + filter +
    transform per key), the shape built for N->4N executor-concurrency
    scaling on hosts where partition sorts degrade."""
    from biothings_crawler_spark.operators.sessionize import sessionize_fold

    ev = _t(spark, sf_dir, "events")
    return sessionize_fold(
        ev, "user_id", "ts", "event_id", gap_seconds=SESSION_GAP_S
    )


SQL_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id AS key, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS boundary,
         ts, event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT key, us,
         SUM(boundary) OVER (PARTITION BY key ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged)
SELECT key, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(us) AS start_us, MAX(us) AS end_us,
       MAX(us) - MIN(us) AS duration_us
FROM sess GROUP BY key, session_idx
"""


BM25_QUERY = ["data", "table", "spark"]


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical inverted-index projection (operators/bm25.
    inverted_index): (term, df, 'id:tf id:tf ...' postings in id order
    — canonical string because array columns don't hash portably).
    Fixture-scale oracle form only; the scale-path representation is
    (term, id, tf) rows / bounded chunks — see q_postings_chunks.
    chunk_range=64 here so the chunk re-assembly path is itself
    exercised (multiple chunks per term at sf0.01)."""
    from biothings_crawler_spark.operators.bm25 import inverted_index

    return inverted_index(
        _t(spark, sf_dir, "documents"), "doc_id", "text", chunk_range=64
    )


SQL_INVERTED_INDEX = f"""
WITH tf AS (
  SELECT term, id, COUNT(*) AS tf FROM (
    SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents)
  GROUP BY term, id)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(
         list(CAST(id AS VARCHAR) || ':' || CAST(tf AS VARCHAR) ORDER BY id),
         ' ') AS postings
FROM tf GROUP BY term
"""


def q_postings_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-PATH index representation (operators/bm25.
    postings_chunks): bounded (term, chunk_no, df_chunk, postings)
    chunk rows keyed row-locally by id div 64 — per-group memory
    bounded by the chunk range no matter how frequent the term, so hot
    stop-word terms shard across reducers instead of one collect_list
    reducer (the r2 scale-killer this replaces)."""
    from biothings_crawler_spark.operators.bm25 import (
        inverted_postings,
        postings_chunks,
    )

    return postings_chunks(
        inverted_postings(_t(spark, sf_dir, "documents"), "doc_id", "text"),
        chunk_range=64,
    )


SQL_POSTINGS_CHUNKS = f"""
WITH tf AS (
  SELECT term, id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents)
  GROUP BY term, id)
SELECT term, id // 64 AS chunk_no, CAST(COUNT(*) AS BIGINT) AS df_chunk,
       array_to_string(
         list(CAST(id AS VARCHAR) || ':' || CAST(tf AS VARCHAR) ORDER BY id),
         ' ') AS postings
FROM tf GROUP BY term, id // 64
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer BM25 ranked retrieval (operators/bm25.bm25_topk) for a
    3-term query: exact rational arithmetic (no libm log — see module
    docstring), so even the RANK ORDER is cross-engine verifiable."""
    from biothings_crawler_spark.operators.bm25 import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "text", BM25_QUERY, k=20
    )


SQL_BM25_TOPK = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY id, term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.id,
         ((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tf.tf * t.w_total
           // (20 * tf.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)
           AS term_score
  FROM tf JOIN dfq d USING (term) JOIN lens l ON l.id = tf.id CROSS JOIN tot t)
SELECT id, CAST(SUM(term_score) AS BIGINT) AS score
FROM sc GROUP BY id
ORDER BY score DESC, id LIMIT 20
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 hard-negative mining for retrieval training pairs (the
    DPR/Karpukhin recipe: the strongest negatives are top-ranked
    lexical hits that are NOT judged positive): exact-integer BM25
    scores, judged positives anti-joined out (broadcast — judgment
    sets are small by construction), top-20 survivors ranked.  The
    final rank window runs over the 20-row TakeOrdered result, never
    the corpus.  Oracle shares the BM25 kernel chain + the same
    anti-join and QUALIFY."""
    from pyspark.sql import Window

    from biothings_crawler_spark.operators.bm25 import bm25_scores

    d = _t(spark, sf_dir, "documents")
    pos = d.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("id"))
    negs = (
        bm25_scores(d, "doc_id", "text", BM25_QUERY)
        .join(F.broadcast(pos), "id", "left_anti")
        .orderBy(F.desc("score"), "id")
        .limit(20)
    )
    w = Window.orderBy(F.desc("score"), "id")
    return negs.withColumn(
        "neg_rank", F.row_number().over(w).cast("long")
    ).select("id", "score", "neg_rank")


SQL_HARD_NEGATIVES = f"""
WITH docs AS (SELECT doc_id AS id, {{words}} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({{terms}})
  GROUP BY id, term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.id,
         ((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tf.tf * t.w_total
           // (20 * tf.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)
           AS term_score
  FROM tf JOIN dfq d USING (term) JOIN lens l ON l.id = tf.id
  CROSS JOIN tot t),
scores AS (SELECT id, CAST(SUM(term_score) AS BIGINT) AS score
           FROM sc GROUP BY id),
negs AS (SELECT id, score FROM scores WHERE id % 17 <> 0
         ORDER BY score DESC, id LIMIT 20)
SELECT id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT)
         AS neg_rank
FROM negs
""".format(
    words=_SQL_WORDS,
    terms=", ".join("'" + t + "'" for t in BM25_QUERY),
)


BLOCKLIST_MIN_QUALITY = 0.8


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality filtering (the CC-pipeline stage after
    per-doc scoring): aggregate quality per source, derive the
    blocklist (avg < 0.8 — 3 of 20 sources at sf0.01), anti-join it
    out. The blocklist is one row per domain — inherently tiny, so the
    hard broadcast on the anti-join is justified by construction
    (contrast line_dedup's unbounded frequent-line set, which must not
    be hinted)."""
    d = _t(spark, sf_dir, "documents")
    per = d.select(
        "source", F.round(quality_score_col(F.col("text")) * 40).cast("long").alias("q40")
    )
    stats = per.groupBy("source").agg(
        F.sum("q40").alias("sum_q40"), F.count(F.lit(1)).alias("n")
    )
    block = stats.filter(
        (F.col("sum_q40").cast("double") / (F.col("n") * 40)) < BLOCKLIST_MIN_QUALITY
    ).select("source")
    return (
        d.join(F.broadcast(block), "source", "left_anti")
        .select(F.col("doc_id").alias("id"), "source")
    )


SQL_DOMAIN_BLOCKLIST = f"""
WITH per AS (
  SELECT source, doc_id, {_SQL_Q40} AS q40 FROM documents),
block AS (
  SELECT source FROM per GROUP BY source
  HAVING CAST(SUM(q40) AS DOUBLE) / (COUNT(*) * 40) < {BLOCKLIST_MIN_QUALITY})
SELECT p.doc_id AS id, p.source
FROM per p ANTI JOIN block b USING (source)
"""


SEMDEDUP_CENTROIDS = 8
SEMDEDUP_THRESHOLD = 0.95


def _semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings augmented with planted semantic duplicates: every
    vec_id%10==0 vector gets a twin at vec_id+10000 scaled by 2, every
    vec_id%20==0 additionally a twin at vec_id+20000 scaled by 4.
    Power-of-two scaling is float-EXACT, and cosine is scale-invariant
    bit-for-bit under the shared fold (dot and norms scale by exactly
    2^k, the quotient is the identical double), so the planted twins
    have cosine ~1.0 with their base on BOTH engines while the fixture's
    natural max pairwise cosine is ~0.51 — the planted clusters are
    exactly the pairs above the 0.95 threshold."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def twin(mod: int, off: int, scale: float) -> DataFrame:
        return e.filter(F.col("vec_id") % mod == 0).select(
            (F.col("vec_id") + off).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.lit(scale)).cast("float")
            ).alias("embedding"),
        )

    return e.unionByName(twin(10, 10000, 2.0)).unionByName(twin(20, 20000, 4.0))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup composition (operators/dedup.semantic_dedup, Abbas et
    al. arXiv:2303.09540): IVF coarse cells as semantic clusters ->
    exact pairwise cosine WITHIN cells only -> connected components ->
    1e6//size soft weights, over the twin-augmented embeddings. The
    within-cell restriction's zero-casualty property at this threshold
    is separately pytest-enforced against brute force
    (tests/test_pipeline_ops.py::test_semantic_dedup_no_casualties)."""
    from biothings_crawler_spark.operators.dedup import semantic_dedup

    aug = _semdedup_embeddings(spark, sf_dir)
    return semantic_dedup(
        aug, "vec_id", "embedding",
        n_centroids=SEMDEDUP_CENTROIDS, threshold=SEMDEDUP_THRESHOLD,
        hash_family="md5",
    )


_SQL_SEMDEDUP_EMB = """
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000,
         list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 2 AS FLOAT))
  FROM embeddings WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 20000,
         list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 4 AS FLOAT))
  FROM embeddings WHERE vec_id % 20 = 0
"""

SQL_SEMANTIC_DEDUP = f"""
WITH RECURSIVE emb AS ({_SQL_SEMDEDUP_EMB}),
cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {SEMDEDUP_CENTROIDS}),
asg AS (
  SELECT vec_id, v, centroid_id AS cell FROM (
    SELECT e.vec_id, e.embedding AS v, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_cosine('e.embedding', 'cent.cv')} DESC,
                                       cent.centroid_id) AS rn
    FROM emb e, cent)
  WHERE rn = 1),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b USING (cell)
  WHERE a.vec_id < b.vec_id
    AND {_sql_cosine('a.v', 'b.v')} >= {SEMDEDUP_THRESHOLD}),
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT vec_id, vec_id FROM emb
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
cc AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a)
SELECT id, component,
       CAST(1000000 // COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS weight_ppm
FROM cc
"""


def q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of dropping near-dups, weight each
    document by 1e6 // cluster_size micro-units (integer division =
    cross-engine exact) so a training pipeline can downsample
    duplicates proportionally. Composition: MinHash-LSH pairs ->
    connected components -> one groupBy(component) count joined back —
    a hash agg + a join keyed on the component label, no window."""
    cc = q_neardup_clusters(spark, sf_dir)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return cc.join(sizes, "component").select(
        "id", "component",
        F.expr("1000000 div csize").alias("weight_ppm"),
    )


SQL_DEDUP_WEIGHTS = f"""
SELECT id, component,
       CAST(1000000 // COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS weight_ppm
FROM ({SQL_NEARDUP_CLUSTERS})
"""


PR_ITERS = 4


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier-priority PageRank (operators/pagerank): integer
    micro-unit ranks over a deterministic hub graph (doc_id -> id//3
    and id//7 — low ids are authorities), 4 synchronous iterations.
    Exact cross-engine because every contribution is integer floor
    division — sums commute at any partitioning."""
    from biothings_crawler_spark.operators.pagerank import pagerank

    d = _t(spark, sf_dir, "documents")
    e = (
        d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 3").alias("dst"))
        .union(
            d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 7").alias("dst"))
        )
        .distinct()
        .filter(F.col("src") != F.col("dst"))
    )
    return pagerank(e, iters=PR_ITERS)


def _sql_pagerank() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    base = 15 * PR_SCALE // 100
    ctes = [
        """
e AS (
  SELECT src, dst FROM (
    SELECT doc_id AS src, doc_id // 3 AS dst FROM documents
    UNION
    SELECT doc_id AS src, doc_id // 7 AS dst FROM documents)
  WHERE src <> dst),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)""",
        f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(PR_ITERS):
        ctes.append(f"""
r{i + 1} AS (
  SELECT n.node, CAST({base} + coalesce(s.in_sum, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * r.rank) // (100 * d.deg)) AS in_sum
    FROM e JOIN deg d USING (src) JOIN r{i} r ON r.node = e.src
    GROUP BY e.dst) s USING (node))""")
    return "WITH " + ",".join(ctes) + f"\nSELECT node, rank FROM r{PR_ITERS}"


SQL_PAGERANK = _sql_pagerank()


SQL_WEB_REFINE = _sql_web_refine()


# --- golden-parquet oracles (frozen pure-Python implementations of the
# non-single-statement operators, materialized once — oracle/golden.py).
# paths() is generate-if-missing: pure Python, no SparkSession, ~2s on
# first import, free afterwards.
from biothings_crawler_spark.oracle import golden as _golden  # noqa: E402

_GOLDEN = _golden.paths()

SQL_CRAWL_BFS_E2E = (
    "SELECT round, host, sched_rank, url_canon "
    f"FROM read_parquet('{_GOLDEN['crawl_sched']}')"
)
SQL_CRAWL_DOCS = (
    "SELECT round, url_canon, doc_json "
    f"FROM read_parquet('{_GOLDEN['crawl_docs']}')"
)
SQL_CRAWL_REFETCH_ROUND = (
    "SELECT round, url_canon, doc_json "
    f"FROM read_parquet('{_GOLDEN['refetch_docs']}')"
)
SQL_JSONLD_EXTRACT = (
    "SELECT url, parser, item_json "
    f"FROM read_parquet('{_GOLDEN['jsonld_items']}')"
)
SQL_MAINENTITY_UNWRAP = (
    f"SELECT url, item_json FROM read_parquet('{_GOLDEN['jsonld_items']}') "
    "WHERE parser = 'jsonld_mainentity'"
)
SQL_MULTIMODAL_FEATURES = (
    "SELECT media_id, kind, n_bytes, feature_q "
    f"FROM read_parquet('{_GOLDEN['media_features']}')"
)


# ---------------------------------------------------------------------------
# crawl hygiene: trap detection, hot-host skew, anchor-text index (round 4)
# ---------------------------------------------------------------------------


def _trap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic frontier with three URL populations routed per-row
    by o_orderkey % 5: lanes 0-2 = calendar-trap hosts (every order a
    fresh URL, ONE digit-normalized pattern), lane 3 = benign
    priority/status pages (≈15 distinct URLs/host), lane 4 = a
    mid-size host (60 URLs, one pattern — clears the ratio gate but
    NOT min_urls, exercising the AND)."""
    orders = _t(spark, sf_dir, "orders")
    lane = F.col("o_orderkey") % 5
    ck = (F.col("o_custkey") % 3).cast("string")
    ok = F.col("o_orderkey").cast("string")
    url = (
        F.when(lane <= 2, F.concat(
            F.lit("https://trap"), ck, F.lit(".example.org/cal/"), ok))
        .when(lane == 3, F.concat(
            F.lit("https://site"), ck, F.lit(".example.org/"),
            F.col("o_orderpriority"), F.lit("/"), F.col("o_orderstatus")))
        .otherwise(F.concat(
            F.lit("https://mid.example.org/m/"),
            (F.col("o_orderkey") % 60).cast("string")))
    )
    host = (
        F.when(lane <= 2, F.concat(F.lit("trap"), ck, F.lit(".example.org")))
        .when(lane == 3, F.concat(F.lit("site"), ck, F.lit(".example.org")))
        .otherwise(F.lit("mid.example.org"))
    )
    return orders.select(url.alias("url"), host.alias("host"))


# The same synthetic frontier as a DuckDB CTE (shared by both oracles).
_SQL_TRAP_FRONTIER = """
f AS (
  SELECT CASE
           WHEN o_orderkey % 5 <= 2 THEN
             'https://trap' || CAST(o_custkey % 3 AS VARCHAR)
               || '.example.org/cal/' || CAST(o_orderkey AS VARCHAR)
           WHEN o_orderkey % 5 = 3 THEN
             'https://site' || CAST(o_custkey % 3 AS VARCHAR)
               || '.example.org/' || o_orderpriority || '/' || o_orderstatus
           ELSE 'https://mid.example.org/m/' || CAST(o_orderkey % 60 AS VARCHAR)
         END AS url,
         CASE
           WHEN o_orderkey % 5 <= 2 THEN
             'trap' || CAST(o_custkey % 3 AS VARCHAR) || '.example.org'
           WHEN o_orderkey % 5 = 3 THEN
             'site' || CAST(o_custkey % 3 AS VARCHAR) || '.example.org'
           ELSE 'mid.example.org'
         END AS host
  FROM orders)"""


def q_crawl_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spider-trap detection (operators/traps.detect_traps): hosts
    whose distinct-URL count explodes relative to their distinct
    digit-normalized URL patterns."""
    from biothings_crawler_spark.operators.traps import detect_traps

    return detect_traps(_trap_frontier(spark, sf_dir))


SQL_CRAWL_TRAPS = f"""
WITH {_SQL_TRAP_FRONTIER},
p AS (
  SELECT host, url,
         regexp_replace(regexp_replace(url, '[?#].*$', ''),
                        '[0-9]+', '{{N}}', 'g') AS pattern
  FROM f),
a AS (
  SELECT host,
         CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT pattern) AS BIGINT) AS n_patterns
  FROM p GROUP BY host)
SELECT host, n_urls, n_patterns,
       CAST(n_urls * 1000000 // n_patterns AS BIGINT) AS urls_per_pattern_ppm,
       n_urls >= 100 AND n_urls * 1000000 // n_patterns >= 50000000 AS is_trap
FROM a
"""


def q_host_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-host skew report (operators/traps.host_skew_report): top-10
    hosts by frontier share with the exact-integer salt factor the
    politeness window would apply."""
    from biothings_crawler_spark.operators.traps import host_skew_report

    return host_skew_report(
        _trap_frontier(spark, sf_dir), top_k=10, target_per_task=100
    )


SQL_HOST_SKEW = f"""
WITH {_SQL_TRAP_FRONTIER},
c AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls FROM f GROUP BY host),
t AS (SELECT CAST(SUM(n_urls) AS BIGINT) AS total_urls,
             CAST(COUNT(*) AS BIGINT) AS n_hosts FROM c)
SELECT host, n_urls,
       CAST(n_urls * 1000000 // total_urls AS BIGINT) AS share_ppm,
       CAST(n_urls * n_hosts * 1000000 // total_urls AS BIGINT) AS skew_x_ppm,
       CAST((n_urls + 99) // 100 AS BIGINT) AS salt
FROM c, t
ORDER BY n_urls DESC, host
LIMIT 10
"""


def q_heavy_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitter bigrams (operators/text.heavy_bigrams):
    top-100 most frequent word bigrams, deterministic (n desc, bigram)
    order — the boilerplate/template detector."""
    from biothings_crawler_spark.operators.text import heavy_bigrams

    return heavy_bigrams(_t(spark, sf_dir, "documents"), "doc_id", "text",
                         top_k=100)


SQL_HEAVY_BIGRAMS = f"""
WITH w AS (SELECT {_SQL_WORDS} AS ws FROM documents),
g AS (
  SELECT CASE WHEN len(ws) >= 2
         THEN list_transform(range(1, len(ws)),
                             i -> ws[i] || ' ' || ws[i + 1])
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(grams) AS bigram FROM g)
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 100
"""


def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted crawl-budget allocation (operators/
    pagerank.allocate_budget): the q_pagerank hub graph's micro-unit
    ranks rolled up to host mass (node % 23 hosts), budget 100k split
    by floor-division share."""
    from biothings_crawler_spark.operators.pagerank import allocate_budget, pagerank

    d = _t(spark, sf_dir, "documents")
    e = (
        d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 3").alias("dst"))
        .union(
            d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 7").alias("dst"))
        )
        .distinct()
        .filter(F.col("src") != F.col("dst"))
    )
    ranks = pagerank(e, iters=PR_ITERS)
    host = F.concat(
        F.lit("h"), (F.col("node") % 23).cast("string"), F.lit(".example.org")
    )
    return allocate_budget(ranks, host, total_budget=100_000)


def _sql_crawl_budget() -> str:
    pr = _sql_pagerank()
    return f"""
WITH pr AS ({pr}),
hm AS (
  SELECT 'h' || CAST(node % 23 AS VARCHAR) || '.example.org' AS host,
         CAST(SUM(rank) AS BIGINT) AS mass
  FROM pr GROUP BY 1),
t AS (SELECT CAST(SUM(mass) AS BIGINT) AS total FROM hm)
SELECT host, mass,
       CAST(greatest(CAST(mass AS HUGEINT) * 100000 // total, 1) AS BIGINT)
         AS quota
FROM hm, t
"""


SQL_CRAWL_BUDGET = _sql_crawl_budget()


def q_index_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance (operators/bm25.merge_postings):
    a refetch round's changed docs (doc_id%11==5, text refreshed) and
    removals (doc_id%17==3) folded into the base (term, id, tf) index
    by per-document replacement — one broadcast anti-join + fresh
    postings over only the delta."""
    from biothings_crawler_spark.operators.bm25 import (
        inverted_postings,
        merge_postings,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    base = inverted_postings(docs, "id", "text")
    delta = docs.filter(F.col("id") % 11 == 5).select(
        "id", F.concat(F.col("text"), F.lit(" refreshed crawl refreshed")).alias("text")
    )
    removed = docs.filter(F.col("id") % 17 == 3).select("id")
    return merge_postings(base, delta, removed)


_SQL_WORDS_T = _SQL_WORDS.replace("lower(text)", "lower(t.text)")

SQL_INDEX_MERGE = f"""
WITH base_tf AS (
  SELECT term, id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents)
  GROUP BY term, id),
delta AS (
  SELECT doc_id AS id, text || ' refreshed crawl refreshed' AS text
  FROM documents WHERE doc_id % 11 = 5),
stale AS (
  SELECT id FROM delta
  UNION SELECT doc_id AS id FROM documents WHERE doc_id % 17 = 3),
fresh AS (
  SELECT term, id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT t.id, unnest({_SQL_WORDS_T}) AS term FROM delta t)
  GROUP BY term, id)
SELECT term, id, tf FROM base_tf WHERE id NOT IN (SELECT id FROM stale)
UNION ALL
SELECT term, id, tf FROM fresh
"""


def q_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer retrieval evaluation (operators/bm25.
    retrieval_metrics): a deterministic 50-query ranked run vs a
    3-judgment qrels set with query-varying overlap (some queries hit
    at rank 1, some never) — per-query reciprocal rank and recall@10
    in ppm floor divisions."""
    from biothings_crawler_spark.operators.bm25 import retrieval_metrics

    qs = spark.range(1, 51).select(F.col("id").alias("query_id"))
    q = F.col("query_id")
    ranked = qs.select(
        "query_id", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("r")
    ).select(
        "query_id",
        ((q * 7 + F.col("r") * F.col("r")) % 97).cast("long").alias("id"),
        F.col("r").cast("long").alias("rank"),
    )
    qrels = (
        qs.select(
            "query_id",
            F.explode(F.array(q % 11, (q * q) % 23, (q + 17) % 31)).alias("o"),
        )
        .select("query_id", ((q * 7 + F.col("o")) % 97).cast("long").alias("id"))
        .distinct()
    )
    return retrieval_metrics(ranked, qrels, k=10)


SQL_RETRIEVAL_METRICS = """
WITH qs AS (SELECT CAST(range AS BIGINT) AS query_id FROM range(1, 51)),
ranked AS (
  SELECT query_id,
         CAST((query_id * 7 + r * r) % 97 AS BIGINT) AS id,
         CAST(r AS BIGINT) AS rank
  FROM qs, (SELECT unnest(generate_series(1, 10)) AS r)),
qrels AS (
  SELECT DISTINCT query_id,
         CAST((query_id * 7 + o) % 97 AS BIGINT) AS id
  FROM (SELECT query_id,
               unnest([query_id % 11, (query_id * query_id) % 23,
                       (query_id + 17) % 31]) AS o
        FROM qs)),
t AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM qrels GROUP BY 1),
h AS (
  SELECT r.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits_at_k,
         CAST(MIN(rank) AS BIGINT) AS first_rank
  FROM ranked r JOIN qrels q ON r.query_id = q.query_id AND r.id = q.id
  WHERE rank <= 10 GROUP BY 1)
SELECT t.query_id, n_rel,
       CAST(COALESCE(n_hits_at_k, 0) AS BIGINT) AS n_hits_at_k,
       first_rank,
       CAST(COALESCE(1000000 // first_rank, 0) AS BIGINT) AS rr_ppm,
       CAST(COALESCE(n_hits_at_k, 0) * 1000000 // n_rel AS BIGINT)
         AS recall_at_k_ppm
FROM t LEFT JOIN h ON t.query_id = h.query_id
"""


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl WARC ingestion (sources/warc.warc_pages): raw
    CRLF-framed WARC records synthesized from documents — response
    records with an HTTP header block, request records (dropped), and
    a torn record with no Target-URI (dropped) — parsed to the
    input_hint page shape entirely in codegen regexes.

    The records ride CC's REAL archive framing end-to-end: packed into
    .warc.gz blobs of concatenated per-record gzip members
    (gzip_member_files, ~25 records/file), then split + gunzipped back
    (split_warc_gz_members) before parsing — so the oracle match also
    certifies the member framing roundtrip."""
    from biothings_crawler_spark.sources.warc import (
        gzip_member_files,
        split_warc_gz_members,
        warc_pages,
    )

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    # doc_id%7==3 -> request record; doc_id%13==6 -> torn (no URI header)
    wtype = F.when(F.col("doc_id") % 7 == 3, F.lit("request")).otherwise(
        F.lit("response")
    )
    date = F.concat(
        F.lit("2026-08-"),
        F.lpad((F.lit(1) + F.col("doc_id") % 28).cast("string"), 2, "0"),
        F.lit("T"),
        F.lpad((F.col("doc_id") % 24).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((F.col("doc_id") * 7 % 60).cast("string"), 2, "0"),
        F.lit("Z"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body>"),
        F.col("text"), F.lit("</body></html>"),
    )
    uri_line = F.when(
        F.col("doc_id") % 13 == 6, F.lit("")
    ).otherwise(F.concat(
        F.lit("WARC-Target-URI: https://site"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.org/page/"), i, F.lit("\r\n"),
    ))
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: "), wtype, F.lit("\r\n"),
        uri_line,
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit("Content-Length: "), F.length(http).cast("string"), F.lit("\r\n"),
        F.lit("\r\n"), http,
    )
    framed = d.select(
        (F.col("doc_id") % 20).alias("file_id"),
        F.encode(record, "utf-8").alias("record"),
    )
    files = gzip_member_files(framed)           # .warc.gz member blobs
    records = split_warc_gz_members(files)      # back to one row/record
    return warc_pages(records)


SQL_WARC_INGEST = r"""
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 7 = 3 THEN 'request' ELSE 'response' END AS wtype,
         '2026-08-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
           || 'T' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST(doc_id * 7 % 60 AS VARCHAR), 2, '0') || 'Z' AS dt,
         'HTTP/1.1 200 OK' || chr(13) || chr(10) || 'Content-Type: text/html'
           || chr(13) || chr(10) || chr(13) || chr(10)
           || '<html><body>' || text || '</body></html>' AS http,
         CASE WHEN doc_id % 13 = 6 THEN ''
              ELSE 'WARC-Target-URI: https://site' || CAST(doc_id % 5 AS VARCHAR)
                   || '.example.org/page/' || CAST(doc_id AS VARCHAR)
                   || chr(13) || chr(10) END AS uri_line
  FROM documents),
rec AS (
  SELECT 'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: ' || wtype
         || chr(13) || chr(10) || uri_line
         || 'WARC-Date: ' || dt || chr(13) || chr(10)
         || 'Content-Length: ' || CAST(length(http) AS VARCHAR)
         || chr(13) || chr(10) || chr(13) || chr(10) || http AS t
  FROM d),
p AS (
  SELECT regexp_extract(t, '(?s)^(.*?)\r\n\r\n', 1) AS hdr,
         regexp_replace(t, '(?s)^.*?\r\n\r\n', '') AS payload
  FROM rec),
x AS (
  SELECT nullif(regexp_extract(hdr, '(?m)^WARC-Target-URI: ([^\r\n]+)', 1), '') AS url,
         nullif(regexp_extract(hdr, '(?m)^WARC-Type: ([^\r\n]+)', 1), '') AS warc_type,
         CAST(epoch_us(strptime(
           nullif(regexp_extract(hdr, '(?m)^WARC-Date: ([^\r\n]+)', 1), ''),
           '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS warc_ts_us,
         CAST(nullif(regexp_extract(hdr, '(?m)^Content-Length: ([0-9]+)', 1), '')
              AS BIGINT) AS content_length,
         payload
  FROM p)
SELECT url, warc_ts_us, content_length,
       CASE WHEN regexp_matches(payload, '^HTTP/[0-9.]+ ')
            THEN regexp_replace(payload, '(?s)^.*?\r\n\r\n', '')
            ELSE payload END AS html
FROM x
WHERE warc_type = 'response' AND url IS NOT NULL
"""


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index (operators/extract.anchor_text_index): pages
    with absolute, root-relative, and unresolvable anchors -> the
    aggregated (target_url, anchor_text, n_refs) inlink-text table."""
    from biothings_crawler_spark.operators.extract import anchor_text_index

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><p>intro "), i, F.lit("</p>"),
        F.lit('<a href="https://docs.example.org/doc/'),
        (F.col("doc_id") % 97).cast("string"),
        F.lit('" class="x">doc '), (F.col("doc_id") % 97).cast("string"), F.lit("</a>"),
        F.lit('<a href="/about">About us </a>'),
        F.lit('<a href="rel/x">relative dropped</a>'),
        F.lit('<a href="https://docs.example.org/doc/'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('">read more</a></body></html>'),
    )
    pages = d.select(
        F.encode(html, "utf-8").alias("html"),
        F.concat(F.lit("https://site"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example.org/page/"), i).alias("url"),
    )
    return anchor_text_index(pages)


SQL_ANCHOR_TEXT = r"""
WITH d AS (
  SELECT doc_id,
         '<html><body><p>intro ' || CAST(doc_id AS VARCHAR) || '</p>'
         || '<a href="https://docs.example.org/doc/' || CAST(doc_id % 97 AS VARCHAR)
         || '" class="x">doc ' || CAST(doc_id % 97 AS VARCHAR) || '</a>'
         || '<a href="/about">About us </a>'
         || '<a href="rel/x">relative dropped</a>'
         || '<a href="https://docs.example.org/doc/' || CAST(doc_id % 7 AS VARCHAR)
         || '">read more</a></body></html>' AS html,
         'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/page/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
m AS (
  SELECT doc_id, url,
         regexp_extract_all(html, '<a\s+href="([^"]*)"[^>]*>([^<]*)</a>', 1) AS hrefs,
         regexp_extract_all(html, '<a\s+href="([^"]*)"[^>]*>([^<]*)</a>', 2) AS texts
  FROM d),
x AS (
  SELECT url, hrefs[i] AS href, trim(texts[i]) AS anchor_text
  FROM (SELECT *, unnest(generate_series(1, len(hrefs))) AS i FROM m)),
r AS (
  SELECT CASE
           WHEN regexp_matches(href, '^https?://') THEN href
           WHEN href LIKE '/%' THEN regexp_extract(url, '^(https?://[^/]+)', 1) || href
         END AS target_url,
         anchor_text
  FROM x)
SELECT target_url, anchor_text, CAST(COUNT(*) AS BIGINT) AS n_refs
FROM r WHERE target_url IS NOT NULL
GROUP BY 1, 2
"""


def _farm_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic host link graph from ``orders``: four ``farmN`` hosts
    exchanging links pairwise (lanes 0-5), forty honest ``siteN``
    hosts all linking the hub (lanes 6-8), and the hub linking back to
    just seven of them (lane 9).  Farms show full reciprocity over 3
    partners (flagged); sites 0-6 are fully reciprocal but have a
    single partner (partner gate blocks them); sites 7-39 sit at 0
    ppm; the hub's own OUTLINK partners are exactly the seven sites
    that link back, so it flags too — reciprocity is computed over
    outlinks, and a hub that only ever links to back-linkers is
    exactly the exchange pattern the operator exists to surface."""
    orders = _t(spark, sf_dir, "orders")
    lane = F.col("o_orderkey") % 10
    ext = F.lit(".example.org")
    src = (
        F.when(lane <= 5, F.concat(
            F.lit("farm"), (F.col("o_custkey") % 4).cast("string"), ext))
        .when(lane <= 8, F.concat(
            F.lit("site"), (F.col("o_custkey") % 40).cast("string"), ext))
        .otherwise(F.lit("hub.example.org"))
    )
    dst = (
        F.when(lane <= 5, F.concat(
            F.lit("farm"),
            ((F.col("o_custkey") + 1 + F.col("o_orderkey") % 3) % 4).cast("string"),
            ext))
        .when(lane <= 8, F.lit("hub.example.org"))
        .otherwise(F.concat(
            F.lit("site"), (F.col("o_orderkey") % 7).cast("string"), ext))
    )
    return orders.select(src.alias("src_host"), dst.alias("dst_host"))


def q_link_farm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-link farm detection (operators/traps.link_farm_report):
    per-host outlink partners vs partners that link back, exact ppm
    reciprocity, farm flag."""
    from biothings_crawler_spark.operators.traps import link_farm_report

    return link_farm_report(_farm_edges(spark, sf_dir))


SQL_LINK_FARM = """
WITH e AS (
  SELECT CASE
           WHEN o_orderkey % 10 <= 5 THEN
             'farm' || CAST(o_custkey % 4 AS VARCHAR) || '.example.org'
           WHEN o_orderkey % 10 <= 8 THEN
             'site' || CAST(o_custkey % 40 AS VARCHAR) || '.example.org'
           ELSE 'hub.example.org'
         END AS src,
         CASE
           WHEN o_orderkey % 10 <= 5 THEN
             'farm' || CAST((o_custkey + 1 + o_orderkey % 3) % 4 AS VARCHAR)
               || '.example.org'
           WHEN o_orderkey % 10 <= 8 THEN 'hub.example.org'
           ELSE 'site' || CAST(o_orderkey % 7 AS VARCHAR) || '.example.org'
         END AS dst
  FROM orders),
p AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
r AS (SELECT a.src, a.dst FROM p a JOIN p b ON a.src = b.dst AND a.dst = b.src),
pa AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_partners FROM p GROUP BY 1),
ra AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reciprocal FROM r GROUP BY 1)
SELECT pa.src AS host, n_partners,
       CAST(COALESCE(n_reciprocal, 0) AS BIGINT) AS n_reciprocal,
       CAST(COALESCE(n_reciprocal, 0) * 1000000 // n_partners AS BIGINT)
         AS recip_ppm,
       n_partners >= 3
         AND COALESCE(n_reciprocal, 0) * 1000000 // n_partners >= 500000
         AS is_farm
FROM pa LEFT JOIN ra ON pa.src = ra.src
"""


def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition datasheet (operators/datasheet.corpus_datasheet):
    per-(lang, source) doc counts, corpus share, token totals, and
    short-doc fraction — all exact integer ppm."""
    from biothings_crawler_spark.operators.datasheet import corpus_datasheet

    return corpus_datasheet(_t(spark, sf_dir, "documents"))


SQL_CORPUS_DATASHEET = f"""
WITH per AS (
  SELECT lang, source,
         CAST({_SQL_TOKENS} AS BIGINT) AS n_tokens,
         CAST(len(text) AS BIGINT) AS n_chars,
         CASE WHEN len(text) < 200 THEN 1 ELSE 0 END AS is_short
  FROM documents),
s AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(is_short) AS BIGINT) AS n_short
  FROM per GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM s)
SELECT lang, source, n_docs,
       CAST(n_docs * 1000000 // total_docs AS BIGINT) AS share_ppm,
       total_tokens,
       CAST(total_tokens * 1000000 // n_docs AS BIGINT) AS avg_tokens_ppm,
       total_chars,
       CAST(n_short * 1000000 // n_docs AS BIGINT) AS short_docs_ppm
FROM s, t
"""


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style page cleaning (operators/text.c4_quality_filter) over
    synthetic multi-line pages: ``doc_id % 9`` copies of a terminal-
    punctuated sentence (so the >=5-sentence gate splits the corpus),
    plus planted casualties — a 2-word line, a "javascript" line, a
    "lorem ipsum" page flag (doc_id % 13), a ``{`` page flag
    (doc_id % 17), and a line with no terminal punctuation."""
    from biothings_crawler_spark.operators.text import c4_quality_filter

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.concat(
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 6), " "),
            F.lit("."),
        ).alias("sent"),
        (F.col("doc_id") % 9).cast("int").alias("rep"),
    )
    text = F.concat(
        F.expr("repeat(sent || chr(10), rep)"),
        F.lit("tiny line\n"),
        F.lit("Enable javascript to view this page.\n"),
        F.when(F.col("doc_id") % 13 == 0,
               F.lit("lorem ipsum dolor sit amet.\n")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 17 == 0,
               F.lit('{ "config": 1 }\n')).otherwise(F.lit("")),
        F.lit("no terminal punct here at all"),
    )
    pages = base.select("doc_id", text.alias("text"))
    return c4_quality_filter(pages, "doc_id", "text")


SQL_C4_FILTER = r"""
WITH base AS (
  SELECT doc_id,
         array_to_string((string_split(text, ' '))[1:6], ' ') || '.' AS sent,
         CAST(doc_id % 9 AS INTEGER) AS rep
  FROM documents),
pages AS (
  SELECT doc_id,
         repeat(sent || chr(10), rep)
         || 'tiny line' || chr(10)
         || 'Enable javascript to view this page.' || chr(10)
         || CASE WHEN doc_id % 13 = 0
                 THEN 'lorem ipsum dolor sit amet.' || chr(10) ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN '{ "config": 1 }' || chr(10) ELSE '' END
         || 'no terminal punct here at all' AS text
  FROM base),
f AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)),
                     l -> len(list_filter(string_split_regex(trim(l), '\s+'),
                                          w -> len(w) > 0)) >= 3
                          AND regexp_matches(trim(l), '[.!?"]$')
                          AND NOT contains(lower(trim(l)), 'javascript'))
           AS kept,
         contains(lower(text), 'lorem ipsum') AS lorem,
         contains(text, '{') AS brace
  FROM pages),
x AS (
  -- array_to_string([]) is NULL in DuckDB where Spark's array_join
  --([]) is '' — coalesce to match.
  SELECT doc_id AS id,
         coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
         CAST(len(kept) AS BIGINT) AS n_lines_kept,
         CAST(len(regexp_extract_all(
                    coalesce(array_to_string(kept, chr(10)), ''),
                    '([.!?])', 1)) AS BIGINT) AS n_sentences,
         lorem, brace
  FROM f)
SELECT id, clean_text, n_lines_kept, n_sentences,
       NOT lorem AND NOT brace AND n_sentences >= 5 AS keep
FROM x
"""


def q_domain_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed crawl-policy scorecard (operators/traps.domain_scorecard):
    the trap report over the _trap_frontier fixture full-outer-joined
    with the farm report over the _farm_edges fixture — hosts seen by
    only one signal get zero-filled columns, verdict precedence
    trap > farm > ok."""
    from biothings_crawler_spark.operators.traps import (
        detect_traps,
        domain_scorecard,
        link_farm_report,
    )

    return domain_scorecard(
        detect_traps(_trap_frontier(spark, sf_dir)),
        link_farm_report(_farm_edges(spark, sf_dir)),
    )


SQL_DOMAIN_SCORECARD = f"""
WITH {_SQL_TRAP_FRONTIER},
tp AS (
  SELECT host, url,
         regexp_replace(regexp_replace(url, '[?#].*$', ''),
                        '[0-9]+', '{{N}}', 'g') AS pattern
  FROM f),
ta AS (
  SELECT host,
         CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT pattern) AS BIGINT) AS n_patterns
  FROM tp GROUP BY host),
trap AS (
  SELECT host, n_urls,
         CAST(n_urls * 1000000 // n_patterns AS BIGINT) AS urls_per_pattern_ppm,
         n_urls >= 100 AND n_urls * 1000000 // n_patterns >= 50000000 AS is_trap
  FROM ta),
e AS (
  SELECT CASE
           WHEN o_orderkey % 10 <= 5 THEN
             'farm' || CAST(o_custkey % 4 AS VARCHAR) || '.example.org'
           WHEN o_orderkey % 10 <= 8 THEN
             'site' || CAST(o_custkey % 40 AS VARCHAR) || '.example.org'
           ELSE 'hub.example.org'
         END AS src,
         CASE
           WHEN o_orderkey % 10 <= 5 THEN
             'farm' || CAST((o_custkey + 1 + o_orderkey % 3) % 4 AS VARCHAR)
               || '.example.org'
           WHEN o_orderkey % 10 <= 8 THEN 'hub.example.org'
           ELSE 'site' || CAST(o_orderkey % 7 AS VARCHAR) || '.example.org'
         END AS dst
  FROM orders),
fp AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
fr AS (SELECT a.src, a.dst FROM fp a JOIN fp b ON a.src = b.dst AND a.dst = b.src),
fpa AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_partners FROM fp GROUP BY 1),
fra AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reciprocal FROM fr GROUP BY 1),
farm AS (
  SELECT fpa.src AS host, n_partners,
         CAST(COALESCE(n_reciprocal, 0) * 1000000 // n_partners AS BIGINT)
           AS recip_ppm,
         n_partners >= 3
           AND COALESCE(n_reciprocal, 0) * 1000000 // n_partners >= 500000
           AS is_farm
  FROM fpa LEFT JOIN fra ON fpa.src = fra.src)
SELECT COALESCE(trap.host, farm.host) AS host,
       CAST(COALESCE(n_urls, 0) AS BIGINT) AS n_urls,
       CAST(COALESCE(urls_per_pattern_ppm, 0) AS BIGINT) AS urls_per_pattern_ppm,
       COALESCE(is_trap, false) AS is_trap,
       CAST(COALESCE(n_partners, 0) AS BIGINT) AS n_partners,
       CAST(COALESCE(recip_ppm, 0) AS BIGINT) AS recip_ppm,
       COALESCE(is_farm, false) AS is_farm,
       CASE WHEN COALESCE(is_trap, false) THEN 'trap'
            WHEN COALESCE(is_farm, false) THEN 'farm'
            ELSE 'ok' END AS verdict
FROM trap FULL OUTER JOIN farm ON trap.host = farm.host
"""


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer HITS hub/authority scores (operators/pagerank.hits) over
    the same doc_id div 3 / div 7 hub graph as q_pagerank."""
    from biothings_crawler_spark.operators.pagerank import hits

    d = _t(spark, sf_dir, "documents")
    e = (
        d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 3").alias("dst"))
        .union(
            d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 7").alias("dst"))
        )
        .distinct()
        .filter(F.col("src") != F.col("dst"))
    )
    return hits(e, iters=PR_ITERS)


def _sql_hits() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    s = PR_SCALE
    # Every unrolled level references the previous one TWICE (the keyed
    # join + the 1-row total) — DuckDB inlines plain CTEs, which makes
    # re-evaluation exponential in the iteration count (measured: 97 s
    # plain vs 0.12 s materialized at sf0.01).  MATERIALIZED is the
    # oracle-side analog of the Spark operator's localCheckpoint.
    ctes = [
        """
e AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT doc_id AS src, doc_id // 3 AS dst FROM documents
    UNION
    SELECT doc_id AS src, doc_id // 7 AS dst FROM documents)
  WHERE src <> dst),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        f"h0 AS MATERIALIZED (SELECT node, CAST({s} AS BIGINT) AS hub FROM nodes)",
    ]
    for i in range(PR_ITERS):
        ctes.append(f"""
ar{i + 1} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.hub) AS raw
  FROM e JOIN h{i} h ON h.node = e.src GROUP BY e.dst),
a{i + 1} AS MATERIALIZED (
  SELECT n.node,
         CAST(coalesce(CAST(r.raw AS HUGEINT) * {s} // t.total, 0) AS BIGINT)
           AS auth
  FROM nodes n
  LEFT JOIN ar{i + 1} r USING (node)
  CROSS JOIN (SELECT CAST(SUM(raw) AS BIGINT) AS total FROM ar{i + 1}) t),
hr{i + 1} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.auth) AS raw
  FROM e JOIN a{i + 1} a ON a.node = e.dst GROUP BY e.src),
h{i + 1} AS MATERIALIZED (
  SELECT n.node,
         CAST(coalesce(CAST(r.raw AS HUGEINT) * {s} // t.total, 0) AS BIGINT)
           AS hub
  FROM nodes n
  LEFT JOIN hr{i + 1} r USING (node)
  CROSS JOIN (SELECT CAST(SUM(raw) AS BIGINT) AS total FROM hr{i + 1}) t)""")
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT node, auth, hub FROM a{PR_ITERS} "
              f"JOIN h{PR_ITERS} USING (node)")


SQL_HITS = _sql_hits()


_ROBOTS_BODY = """'# robots for this host' || chr(10) ||
'User-agent: *' || chr(10) ||
'Disallow: /private/' || chr(10) ||
'Allow: /private/pub   # inline comment' || chr(10) ||
CASE WHEN doc_id % 4 = 0 THEN 'Crawl-delay: ' || CAST(doc_id % 9 AS {S})
     ELSE 'Crawl-delay: soon' END || chr(10) ||
chr(10) ||
CASE WHEN doc_id % 3 = 0 THEN
  'User-agent: otherbot' || chr(10) || 'User-agent: SparkBot' || chr(10) ||
  'Allow: /shared/' || chr(10) || 'Disallow: /tmp/' || chr(10) ||
  'Crawl-delay: ' || CAST(1 + doc_id % 7 AS {S}) || chr(10) || chr(10)
ELSE '' END ||
CASE WHEN doc_id % 5 = 0 THEN
  'User-agent: sparkbot' || chr(10) || 'Disallow: /deep/' || chr(10)
ELSE '' END ||
CASE WHEN doc_id % 7 = 0 THEN
  'Sitemap: https://h' || CAST(doc_id AS {S}) || '.example.org/sitemap.xml'
  || chr(10)
ELSE '' END ||
'Disallow:' || chr(10) || 'no colon junk' || chr(10) || 'Unknown: x'"""

_ROBOTS_HOST = "'h' || CAST(doc_id AS {S}) || '.example.org'"

_ROBOTS_PATHS = ["/private/secret", "/private/pub/data", "/tmp/x",
                 "/ok/page", "/deep/page", "/shared/thing"]


def _robots_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synthetic robots.txt body per documents row: a ``*`` group
    with an allow/disallow pair and a sometimes-numeric crawl-delay,
    a doc_id%3 multi-agent group naming SparkBot (mixed case), a
    doc_id%5 single-agent sparkbot group, a doc_id%7 global Sitemap
    line, plus planted junk (inline comment, empty Disallow, no-colon
    line, unknown key)."""
    return _t(spark, sf_dir, "documents").selectExpr(
        _ROBOTS_HOST.format(S="STRING") + " AS host",
        _ROBOTS_BODY.format(S="STRING") + " AS body",
    )


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing (operators/robots.parse_robots_txt) for agent
    'sparkbot': RFC 9309 group selection (specific groups beat and
    exclude ``*``), consecutive-User-agent grouping, last-wins integer
    crawl-delay, global Sitemap collection.  Arrays projected to
    '|'-joined strings for the value-hash compare."""
    from biothings_crawler_spark.operators.robots import parse_robots_txt

    parsed = parse_robots_txt(_robots_pages(spark, sf_dir), agent="sparkbot")
    return parsed.select(
        "host",
        F.array_join("allow", "|").alias("allow_rules"),
        F.array_join("disallow", "|").alias("disallow_rules"),
        "crawl_delay",
        F.array_join("sitemap_urls", "|").alias("sitemaps"),
    )


# DuckDB re-derives the same parse relationally: explode lines with
# position, detect group starts with lag(is_ua), prefix-sum a group id,
# aggregate each group's agent set, then collect rules from the
# applicable group class (specific if any group names the agent, else *).
_SQL_ROBOTS_CTES = f"""pages AS (
  SELECT {_ROBOTS_HOST.format(S="VARCHAR")} AS host,
         {_ROBOTS_BODY.format(S="VARCHAR")} AS body
  FROM documents),
rlines AS (
  SELECT host,
         generate_subscripts(string_split(body, chr(10)), 1) AS pos,
         unnest(string_split(body, chr(10))) AS raw
  FROM pages),
rkv AS (
  SELECT host, pos, c, instr(c, ':') > 0 AS has,
         CASE WHEN instr(c, ':') > 0
              THEN lower(trim(substr(c, 1, instr(c, ':') - 1))) ELSE '' END AS k,
         CASE WHEN instr(c, ':') > 0
              THEN trim(substr(c, instr(c, ':') + 1)) ELSE '' END AS v
  FROM (SELECT host, pos, trim(regexp_replace(raw, '#.*', '')) AS c FROM rlines)),
rua AS (
  SELECT *, has AND k = 'user-agent' AND v <> '' AS is_ua FROM rkv),
rg AS (
  SELECT *, CASE WHEN is_ua AND NOT coalesce(
              lag(is_ua) OVER (PARTITION BY host ORDER BY pos), false)
            THEN 1 ELSE 0 END AS gstart
  FROM rua),
rgg AS (
  SELECT *, SUM(gstart) OVER (PARTITION BY host ORDER BY pos) AS gid FROM rg),
ragents AS (
  SELECT host, gid, list(lower(v)) AS ag FROM rgg WHERE is_ua
  GROUP BY host, gid),
rr AS (
  SELECT rgg.*, coalesce(list_contains(ag, 'sparkbot'), false) AS is_sp,
         coalesce(list_contains(ag, '*'), false) AS is_st
  FROM rgg LEFT JOIN ragents USING (host, gid)),
rseen AS (SELECT host, bool_or(is_sp) AS seen FROM rr GROUP BY host),
rrules AS (
  SELECT rr.*, CASE WHEN rseen.seen THEN is_sp ELSE is_st END AS app
  FROM rr JOIN rseen USING (host)),
rp AS (
  SELECT host,
    coalesce(list(v ORDER BY pos)
      FILTER (WHERE has AND k = 'allow' AND v <> '' AND app), []) AS al,
    coalesce(list(v ORDER BY pos)
      FILTER (WHERE has AND k = 'disallow' AND v <> '' AND app), []) AS dl,
    arg_max(try_cast(v AS BIGINT), pos)
      FILTER (WHERE has AND k = 'crawl-delay'
              AND regexp_matches(v, '^[0-9]+$') AND app) AS crawl_delay,
    coalesce(list(v ORDER BY pos)
      FILTER (WHERE has AND k = 'sitemap' AND v <> ''), []) AS maps
  FROM rrules GROUP BY host)"""

SQL_ROBOTS_PARSE = f"""
WITH {_SQL_ROBOTS_CTES}
SELECT host,
       coalesce(array_to_string(al, '|'), '') AS allow_rules,
       coalesce(array_to_string(dl, '|'), '') AS disallow_rules,
       crawl_delay,
       coalesce(array_to_string(maps, '|'), '') AS sitemaps
FROM rp
"""


def q_robots_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed robots enforcement: parse_robots_txt over the fixture
    bodies feeding operators/politeness.apply_robots (longest-match
    wins, specific groups exclude ``*``) on a 6-path-per-host synthetic
    frontier; returns the admitted (host, url_canon) rows."""
    from biothings_crawler_spark.operators.robots import parse_robots_txt

    pages = _robots_pages(spark, sf_dir)
    parsed = parse_robots_txt(pages, agent="sparkbot")
    paths = ", ".join(f"'{p}'" for p in _ROBOTS_PATHS)
    frontier = pages.select(
        "host", F.explode(F.expr(f"array({paths})")).alias("p")
    ).select("host", F.concat(F.lit("https://"), "host", "p").alias("url_canon"))
    return apply_robots(frontier, parsed)


SQL_ROBOTS_ENFORCE = f"""
WITH {_SQL_ROBOTS_CTES},
fr AS (
  SELECT host, unnest([{", ".join(f"'{p}'" for p in _ROBOTS_PATHS)}]) AS p
  FROM pages),
sel AS (
  SELECT f.host, 'https://' || f.host || f.p AS url_canon,
    coalesce(list_max(list_transform(
      list_filter(rp.al, x -> starts_with(f.p, x)), x -> len(x))), 0) AS alen,
    coalesce(list_max(list_transform(
      list_filter(rp.dl, x -> starts_with(f.p, x)), x -> len(x))), 0) AS dlen
  FROM fr f LEFT JOIN rp ON f.host = rp.host)
SELECT host, url_canon FROM sel WHERE NOT (dlen > alen AND dlen > 0)
"""


_BL_HOST = """CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN 'bad' || CAST(doc_id % 23 AS {S}) || '.example.org'
  WHEN 1 THEN 'www.bad' || CAST(doc_id % 23 AS {S}) || '.example.org'
  WHEN 2 THEN 'deep.sub.bad' || CAST(doc_id % 23 AS {S}) || '.example.org'
  WHEN 3 THEN 'notbad' || CAST(doc_id % 23 AS {S}) || '.example.org'
  ELSE 'x' || CAST(doc_id % 3 AS {S}) || '.evil.net'
END"""

_BL_DOMAINS = [f"bad{i}.example.org" for i in range(8)] + ["evil.net"]


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style domain blocklist (operators/blocklist.blocklist_filter):
    label-boundary suffix matching as chained broadcast anti-joins.
    Planted cases: exact domain hit, www./deep.sub. subdomain hits, a
    'notbad<N>' substring trap that must NOT match, and a bare-eTLD+1
    'evil.net' entry blocking its subdomains."""
    from biothings_crawler_spark.operators.blocklist import blocklist_filter

    d = _t(spark, sf_dir, "documents")
    frontier = d.selectExpr(
        _BL_HOST.format(S="STRING") + " AS host",
        "'https://' || " + _BL_HOST.format(S="STRING")
        + " || '/p/' || CAST(doc_id AS STRING) AS url_canon",
    )
    bl = spark.createDataFrame([(x,) for x in _BL_DOMAINS], "domain string")
    return blocklist_filter(frontier, bl)


SQL_BLOCKLIST_FILTER = f"""
WITH fr AS (
  SELECT {_BL_HOST.format(S="VARCHAR")} AS host,
         'https://' || {_BL_HOST.format(S="VARCHAR")}
           || '/p/' || CAST(doc_id AS VARCHAR) AS url_canon
  FROM documents),
bl(domain) AS (VALUES {", ".join(f"('{x}')" for x in _BL_DOMAINS)})
SELECT host, url_canon FROM fr
WHERE NOT EXISTS (
  SELECT 1 FROM bl
  WHERE fr.host = bl.domain OR ends_with(fr.host, '.' || bl.domain))
"""


_LM_TEXT = """CASE WHEN doc_id % 7 = 0 THEN reverse(text)
     WHEN doc_id % 5 = 0 THEN text || ' ' || reverse(text)
     ELSE text END"""
_LM_TRAIN = "id % 2 = 0 AND id % 7 <> 0 AND id % 5 <> 0"


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM filter (operators/lm): train an exact-integer
    bigram model on the clean half of the corpus, score a corpus with
    planted casualties — doc_id%7 char-reversed (all-OOV -> tail),
    doc_id%5 half-reversed (halved score -> middle) — and bucket into
    head/middle/tail."""
    from biothings_crawler_spark.operators.lm import lm_score, train_bigram_lm

    d = _t(spark, sf_dir, "documents")
    mutated = d.selectExpr("doc_id", _LM_TEXT + " AS text")
    train = mutated.filter(_LM_TRAIN.replace("id", "doc_id"))
    model = train_bigram_lm(train, "doc_id", "text", min_count=2)
    return lm_score(mutated, model, "doc_id", "text")


SQL_LM_SCORE = f"""
WITH m AS (SELECT doc_id, {_LM_TEXT} AS text FROM documents),
w AS (SELECT doc_id AS id, {_SQL_WORDS} AS ws FROM m),
g AS (
  SELECT id, CASE WHEN len(ws) >= 2
             THEN list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])
             ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
tr AS (SELECT unnest(grams) AS bg FROM g WHERE {_LM_TRAIN}),
big AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM tr GROUP BY bg),
uni AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c12) AS c1
        FROM big GROUP BY 1),
mdl AS (SELECT bg, c12, CAST(c1 AS BIGINT) AS c1
        FROM big JOIN uni ON split_part(big.bg, ' ', 1) = uni.w1
        WHERE c12 >= 2),
dg AS (SELECT id, unnest(grams) AS bg FROM g),
sc AS (
  SELECT dg.id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(mdl.bg) AS BIGINT) AS n_seen,
         SUM(CASE WHEN mdl.bg IS NOT NULL
                  THEN mdl.c12 * 1000000 // mdl.c1 ELSE 0 END) AS s
  FROM dg LEFT JOIN mdl USING (bg) GROUP BY dg.id),
f AS (
  SELECT d.id, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         CAST(coalesce(n_seen, 0) AS BIGINT) AS n_seen,
         CAST(CASE WHEN coalesce(n_bigrams, 0) > 0
              THEN s // n_bigrams ELSE 0 END AS BIGINT) AS score_ppm,
         CAST(CASE WHEN coalesce(n_bigrams, 0) > 0
              THEN (n_bigrams - n_seen) * 1000000 // n_bigrams
              ELSE 0 END AS BIGINT) AS oov_ppm
  FROM (SELECT doc_id AS id FROM documents) d LEFT JOIN sc USING (id))
SELECT id, n_bigrams, n_seen, score_ppm, oov_ppm,
       CASE WHEN score_ppm >= 20000 THEN 'head'
            WHEN score_ppm >= 2000 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM f
"""


def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (operators/lm
    .train_kn_bigram + kn_score, D=3/4) on the q_lm_score fixture:
    clean-half training corpus, planted casualties (doc_id%7 reversed
    -> backoff/continuation-only mass, doc_id%5 half-reversed).  Exact
    integer ppm — discounted seen-bigram mass plus λ(w1)-weighted
    continuation probability, the CCNet/KenLM smoothing family."""
    from biothings_crawler_spark.operators.lm import kn_score, train_kn_bigram

    d = _t(spark, sf_dir, "documents")
    mutated = d.selectExpr("doc_id", _LM_TEXT + " AS text")
    train = mutated.filter(_LM_TRAIN.replace("id", "doc_id"))
    model = train_kn_bigram(train, "doc_id", "text")
    return kn_score(mutated, model, "doc_id", "text")


SQL_KNESER_NEY = f"""
WITH m AS (SELECT doc_id, {_LM_TEXT} AS text FROM documents),
w AS (SELECT doc_id AS id, {_SQL_WORDS} AS ws FROM m),
g AS (
  SELECT id, CASE WHEN len(ws) >= 2
             THEN list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])
             ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
tr AS (SELECT unnest(grams) AS bg FROM g WHERE {_LM_TRAIN}),
big AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM tr GROUP BY bg),
w1tab AS (SELECT split_part(bg, ' ', 1) AS w1,
                 CAST(SUM(c12) AS BIGINT) AS c1,
                 CAST(COUNT(*) AS BIGINT) AS n1w1
          FROM big GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1tot FROM big),
contp AS (
  SELECT w2, CAST(n1w2 * 1000000 // n1tot AS BIGINT) AS pc_ppm
  FROM (SELECT split_part(bg, ' ', 2) AS w2,
               CAST(COUNT(*) AS BIGINT) AS n1w2
        FROM big GROUP BY 1), tot),
dgx AS (
  SELECT id, bg, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM (SELECT id, unnest(grams) AS bg FROM g)),
sc AS (
  SELECT dgx.id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(big.bg) AS BIGINT) AS n_seen,
         SUM(CASE WHEN big.bg IS NOT NULL
                  THEN (4 * c12 - 3) * 1000000 // (4 * c1)
                       + (3 * n1w1 * coalesce(pc_ppm, 0)) // (4 * c1)
                  WHEN c1 IS NOT NULL
                  THEN (3 * n1w1 * coalesce(pc_ppm, 0)) // (4 * c1)
                  ELSE coalesce(pc_ppm, 0) END) AS s
  FROM dgx LEFT JOIN big USING (bg) LEFT JOIN w1tab USING (w1)
           LEFT JOIN contp USING (w2)
  GROUP BY dgx.id)
SELECT d.id, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(n_seen, 0) AS BIGINT) AS n_seen,
       CAST(CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN s // n_bigrams ELSE 0 END AS BIGINT) AS kn_ppm,
       CAST(CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN (n_bigrams - n_seen) * 1000000 // n_bigrams
            ELSE 0 END AS BIGINT) AS oov_ppm
FROM (SELECT doc_id AS id FROM documents) d LEFT JOIN sc USING (id)
"""


def q_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram scoring (operators/lm.train_stupid_backoff
    + sb_score, α=2/5 — Brants et al. EMNLP 2007, the MapReduce-scale
    smoothing) on the same fixture as q_kneser_ney: seen bigrams score
    their relative frequency, unseen back off to α times the w2
    unigram frequency, all exact integer ppm."""
    from biothings_crawler_spark.operators.lm import (
        sb_score,
        train_stupid_backoff,
    )

    d = _t(spark, sf_dir, "documents")
    mutated = d.selectExpr("doc_id", _LM_TEXT + " AS text")
    train = mutated.filter(_LM_TRAIN.replace("id", "doc_id"))
    model = train_stupid_backoff(train, "doc_id", "text")
    return sb_score(mutated, model, "doc_id", "text")


SQL_STUPID_BACKOFF = f"""
WITH m AS (SELECT doc_id, {_LM_TEXT} AS text FROM documents),
w AS (SELECT doc_id AS id, {_SQL_WORDS} AS ws FROM m),
g AS (
  SELECT id, CASE WHEN len(ws) >= 2
             THEN list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])
             ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
tr AS (SELECT id, unnest(grams) AS bg FROM g WHERE {_LM_TRAIN}),
big0 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM tr GROUP BY bg),
big AS (SELECT bg, c12, CAST(c1 AS BIGINT) AS c1
        FROM big0 JOIN (SELECT split_part(bg, ' ', 1) AS w1,
                               SUM(c12) AS c1 FROM big0 GROUP BY 1) u
        ON split_part(big0.bg, ' ', 1) = u.w1),
toks AS (
  SELECT w2 AS w, CAST(COUNT(*) AS BIGINT) AS cw
  FROM (SELECT unnest(ws) AS w2 FROM w WHERE {_LM_TRAIN}) GROUP BY 1),
tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS ntok FROM toks),
dgx AS (SELECT id, bg, split_part(bg, ' ', 2) AS w2
        FROM (SELECT id, unnest(grams) AS bg FROM g)),
sc AS (
  SELECT dgx.id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(big.bg) AS BIGINT) AS n_seen,
         SUM(CASE WHEN big.bg IS NOT NULL THEN c12 * 1000000 // c1
                  ELSE coalesce((2 * cw * 1000000) // (5 * ntok), 0)
             END) AS s
  FROM dgx LEFT JOIN big USING (bg)
           LEFT JOIN (SELECT w AS w2, cw FROM toks) t USING (w2), tot
  GROUP BY dgx.id)
SELECT d.id, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(n_seen, 0) AS BIGINT) AS n_seen,
       CAST(CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN s // n_bigrams ELSE 0 END AS BIGINT) AS sb_ppm,
       CAST(CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN (n_bigrams - n_seen) * 1000000 // n_bigrams
            ELSE 0 END AS BIGINT) AS oov_ppm
FROM (SELECT doc_id AS id FROM documents) d LEFT JOIN sc USING (id)
"""


def _hre_fixture(S: str, D: str) -> tuple[str, str, str]:
    """(url, lang, html) SQL exprs for the hreflang-cluster fixture,
    dialect-parameterized (S = STRING/VARCHAR, D = div///).  3 language
    variants per group; groups %4=0 declare only their en alternate
    (partial clusters), doc_id%11=0 pages declare nothing.  Quote-style
    and relative-URL extraction quirks are q_hreflang_map's fixture
    concern — this one exercises the CLUSTERING contract."""
    grp = f"(doc_id {D} 3)"
    lang = "CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END"
    site = f"'https://site' || CAST({grp} % 50 AS {S}) || '.example'"

    def url_of(lx: str) -> str:
        return f"{site} || '/' || {lx} || '/page/' || CAST({grp} AS {S})"

    def tag(lit_lang: str) -> str:
        u = url_of(f"'{lit_lang}'")
        return (
            f"'<link rel=\"alternate\" hreflang=\"{lit_lang}\" href=\"'"
            f" || {u} || '\"/>'"
        )

    tags = " || ".join(tag(lx) for lx in ("en", "de", "fr"))
    html = (
        "CASE WHEN doc_id % 11 = 0 THEN '<html><head></head></html>' "
        f"WHEN {grp} % 4 = 0 THEN "
        f"'<html><head>' || {tag('en')} || '</head></html>' "
        f"ELSE '<html><head>' || {tags} || '</head></html>' END"
    )
    return url_of(f"({lang})"), lang, html


def q_hreflang_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang alternate-cluster mining (operators/hreflang
    .hreflang_clusters over operators/extract.hreflang_map edges — the
    CCAligned EMNLP-2020 declared-translation signal): cluster each
    declaring page under the lexicographic min of {self} ∪ {targets}.
    Complete groups collapse to one cluster per group; partial
    declarers degrade to subclusters (asserted by the oracle); silent
    pages drop out."""
    from biothings_crawler_spark.operators.extract import hreflang_map
    from biothings_crawler_spark.operators.hreflang import hreflang_clusters

    url, lang, html = _hre_fixture("STRING", "div")
    d = _t(spark, sf_dir, "documents")
    pages = d.selectExpr(
        f"{url} AS url", f"{lang} AS lang",
        f"encode({html}, 'utf-8') AS html",
    )
    return hreflang_clusters(hreflang_map(pages), pages)


def _sql_hreflang() -> str:
    url, lang, html = _hre_fixture("VARCHAR", "//")
    # mirror hreflang_map's extraction: one regex requiring
    # rel -> hreflang -> href within the tag, href = group 2; fixture
    # hrefs are absolute https so resolution is identity
    pat = ('(?i)<link[^>]*rel="alternate"[^>]*hreflang="([^"]*)"'
           '[^>]*href="([^"]*)"')
    return f"""
WITH pages AS (
  SELECT {url} AS url, {lang} AS lang, {html} AS html FROM documents),
lx AS (
  SELECT url, unnest(regexp_extract_all(html, '{pat}', 2)) AS href
  FROM pages),
cl AS (
  SELECT url, least(min(href), url) AS cluster_id
  FROM lx WHERE href <> '' GROUP BY url)
SELECT cluster_id, url, lang FROM cl JOIN pages USING (url)
"""


SQL_HREFLANG_CLUSTERS = _sql_hreflang()


_UAP_LANGS = "en|de|fr|es|it|pt|ja|zh|ru|ar"
_UAP_URL = """CASE doc_id % 4
  WHEN 0 THEN 'https://www.site' || CAST(doc_id {D} 12 AS {S})
              || '.example/' || {L} || '/docs/' || CAST(doc_id {D} 12 AS {S})
  WHEN 1 THEN 'https://site' || CAST(doc_id {D} 12 AS {S})
              || '.example/page?id=' || CAST(doc_id {D} 12 AS {S})
              || '&lang=' || {L}
  WHEN 2 THEN 'https://' || {L} || '.site' || CAST(doc_id {D} 12 AS {S})
              || '.example/docs/' || CAST(doc_id {D} 12 AS {S})
  ELSE 'https://site' || CAST(doc_id {D} 12 AS {S})
       || '.example/plain/' || CAST(doc_id {D} 12 AS {S}) END"""
_UAP_LANG = "(CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END)"


def q_url_parallel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCAligned URL-matching document alignment (operators/hreflang
    .url_align_pairs): strip language identifiers (path segment, query
    param, subdomain) from frontier URLs and pair English pages with
    other-language pages colliding on the stripped key.  Fixture URLs
    cycle all three marker styles plus a marker-free lane that must
    never pair."""
    from biothings_crawler_spark.operators.hreflang import url_align_pairs

    d = _t(spark, sf_dir, "documents")
    frontier = d.selectExpr(
        _UAP_URL.format(D="div", S="STRING", L=_UAP_LANG) + " AS url"
    )
    return url_align_pairs(frontier)


SQL_URL_PARALLEL_PAIRS = f"""
WITH fr AS (
  SELECT {_UAP_URL.format(D="//", S="VARCHAR", L=_UAP_LANG)} AS url
  FROM documents),
keyed AS (
  SELECT url AS u,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         regexp_replace(regexp_replace(regexp_replace(
           url, '://({_UAP_LANGS})\\.', '://_.', 'g'),
           '/({_UAP_LANGS})/', '/_/', 'g'),
           '/({_UAP_LANGS})$', '/_', 'g'),
           '[?]lang=({_UAP_LANGS})', '?lang=_', 'g'),
           '[?]hl=({_UAP_LANGS})', '?hl=_', 'g'),
           '&lang=({_UAP_LANGS})', '&lang=_', 'g'),
           '&hl=({_UAP_LANGS})', '&hl=_', 'g') AS align_key,
         CASE WHEN regexp_extract(url, '/({_UAP_LANGS})(/|$)', 1) <> ''
              THEN regexp_extract(url, '/({_UAP_LANGS})(/|$)', 1)
              WHEN regexp_extract(url, '[?&](?:lang|hl)=({_UAP_LANGS})', 1) <> ''
              THEN regexp_extract(url, '[?&](?:lang|hl)=({_UAP_LANGS})', 1)
              ELSE regexp_extract(url, '://({_UAP_LANGS})\\.', 1) END AS lg
  FROM fr),
k AS (SELECT * FROM keyed WHERE lg <> '')
SELECT s.align_key, s.u AS src_url, t.u AS tgt_url, t.lg AS tgt_lang
FROM (SELECT * FROM k WHERE lg = 'en') s
JOIN (SELECT * FROM k WHERE lg <> 'en') t USING (align_key)
"""


def q_bitext_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilingual-lexicon overlap verification of mined document pairs
    (operators/bitext.bitext_lexicon_score — the Resnik-&-Smith-2003 /
    CCAligned dictionary baseline): even docs are 'en' pages, odd slots
    synthesize the paired 'de' page as a word-level translation
    (lexicon = w -> 'q'||w over the corpus vocabulary).  Casualty
    lanes: g%5 pairs carry the RAW untranslated text (fake pair,
    ~0 overlap), g%3 pairs carry the translation of the NEXT group's
    document (related-but-wrong page, partial vocabulary overlap);
    everything else scores full coverage."""
    from biothings_crawler_spark.operators.bitext import bitext_lexicon_score
    from biothings_crawler_spark.operators.text import words_col

    d = _t(spark, sf_dir, "documents")
    src = d.filter("doc_id % 2 = 0").selectExpr(
        "doc_id div 2 AS g", "text AS src_text"
    )
    nxt = src.selectExpr("g - 1 AS g", "src_text AS next_text")
    base = src.join(nxt, "g", "left")

    def tr(c):
        return F.concat_ws(
            " ", F.transform(words_col(c), lambda w: F.concat(F.lit("q"), w))
        )

    gs = F.col("g").cast("string")
    url_s = F.concat(F.lit("https://en.site"), gs, F.lit(".example/d/"), gs)
    url_t = F.concat(F.lit("https://de.site"), gs, F.lit(".example/d/"), gs)
    tgt_text = (
        F.when(F.col("g") % 5 == 0, F.col("src_text"))
        .when(F.col("g") % 3 == 0,
              tr(F.coalesce(F.col("next_text"), F.col("src_text"))))
        .otherwise(tr(F.col("src_text")))
    )
    src_docs = base.select(url_s.alias("url"), F.col("src_text").alias("text"))
    tgt_docs = base.select(url_t.alias("url"), tgt_text.alias("text"))
    pairs = base.select(url_s.alias("src_url"), url_t.alias("tgt_url"))
    lex = (
        d.select(F.explode(words_col(F.col("text"))).alias("src_word"))
        .distinct()
        .select("src_word",
                F.concat(F.lit("q"), F.col("src_word")).alias("tgt_word"))
    )
    return bitext_lexicon_score(pairs, src_docs, tgt_docs, lex)


def _sql_bitext() -> str:
    def W(e: str) -> str:
        return _SQL_WORDS.replace("lower(text)", f"lower({e})")

    def TR(e: str) -> str:
        return f"array_to_string(list_transform({W(e)}, w -> 'q' || w), ' ')"

    us = "'https://en.site' || CAST(g AS VARCHAR) || '.example/d/' || CAST(g AS VARCHAR)"
    ut = "'https://de.site' || CAST(g AS VARCHAR) || '.example/d/' || CAST(g AS VARCHAR)"
    return f"""
WITH src AS (
  SELECT doc_id // 2 AS g, text AS src_text FROM documents
  WHERE doc_id % 2 = 0),
nxt AS (SELECT g - 1 AS g, src_text AS next_text FROM src),
tx AS (
  SELECT src.g, src_text,
         CASE WHEN src.g % 5 = 0 THEN src_text
              WHEN src.g % 3 = 0
              THEN {TR("coalesce(next_text, src_text)")}
              ELSE {TR("src_text")} END AS tgt_text
  FROM src LEFT JOIN nxt USING (g)),
pairs AS (SELECT {us} AS src_url, {ut} AS tgt_url FROM tx),
lex AS (
  SELECT DISTINCT w AS src_word, 'q' || w AS tgt_word
  FROM (SELECT unnest({_SQL_WORDS}) AS w FROM documents)),
sw AS (
  SELECT DISTINCT {us} AS url, unnest({W("src_text")}) AS w FROM tx),
tw AS (
  SELECT DISTINCT {ut} AS url, unnest({W("tgt_text")}) AS w FROM tx),
pw AS (
  SELECT p.src_url, p.tgt_url, sw.w,
         MAX(CASE WHEN l.src_word IS NOT NULL THEN 1 ELSE 0 END) AS in_lex,
         MAX(CASE WHEN t2.w IS NOT NULL THEN 1 ELSE 0 END) AS covered
  FROM pairs p
  JOIN sw ON sw.url = p.src_url
  LEFT JOIN lex l ON l.src_word = sw.w
  LEFT JOIN tw t2 ON t2.url = p.tgt_url AND t2.w = l.tgt_word
  GROUP BY 1, 2, 3),
sc AS (
  SELECT src_url, tgt_url, CAST(COUNT(*) AS BIGINT) AS n_src_words,
         CAST(SUM(in_lex) AS BIGINT) AS n_lexical,
         CAST(SUM(covered) AS BIGINT) AS n_covered
  FROM pw GROUP BY 1, 2)
SELECT p.src_url, p.tgt_url,
       CAST(coalesce(n_src_words, 0) AS BIGINT) AS n_src_words,
       CAST(coalesce(n_lexical, 0) AS BIGINT) AS n_lexical,
       CAST(coalesce(n_covered, 0) AS BIGINT) AS n_covered,
       CAST(CASE WHEN coalesce(n_lexical, 0) > 0
            THEN n_covered * 1000000 // n_lexical ELSE 0 END AS BIGINT)
         AS overlap_ppm
FROM pairs p LEFT JOIN sc USING (src_url, tgt_url)
"""


SQL_BITEXT_VERIFY = _sql_bitext()


def q_sent_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gale-Church sentence alignment (operators/sentalign
    .gale_church_align — integer bead penalties from Gale & Church CL
    1993, exact-rational length term): the iterative-DP mapInPandas
    operator over the deterministic fixture pairs
    (oracle/galechurch.fixture_rows: 2-1 merges, surplus/deficit target
    ends) vs the frozen memoized-recursion aligner materialized to
    golden parquet — an exact cross-implementation pair, same pattern
    as the BFS crawl golden."""
    from biothings_crawler_spark.operators.sentalign import gale_church_align
    from biothings_crawler_spark.oracle import galechurch as gc
    from biothings_crawler_spark.oracle.golden import SENTALIGN_N

    pairs = spark.createDataFrame(gc.fixture_rows(SENTALIGN_N))
    return gale_church_align(pairs)


SQL_SENT_ALIGN = (
    "SELECT src_url, tgt_url, bead_no, src_lo, src_hi, tgt_lo, tgt_hi, "
    f"bead_cost FROM read_parquet('{_GOLDEN['sentalign_beads']}')"
)


_RAG_M = 24   # chunk token budget
_RAG_V = 1    # sentence overlap between consecutive chunks


def _rag_fixture_sql(dialect: str) -> str:
    """Punctuated-document fixture, dialect-parameterized.  The
    synthetic documents carry no sentence punctuation, so the fixture
    inserts a terminal mark after every 5th word — the mark cycles
    .!? by doc so all three boundary chars are exercised — and the
    doc_id%7 lane keeps the raw unpunctuated text (one run-on
    sentence longer than the budget: the oversized own-chunk path)."""
    if dialect == "spark":
        # Spark SQL string literals eat single backslashes — double them
        pat = r"((?:\\S+ ){4}\\S+) "

        def rep(p: str) -> str:
            return f"regexp_replace(text, '{pat}', '$1{p} ')"
    else:
        pat = r"((?:\S+ ){4}\S+) "

        def rep(p: str) -> str:
            return f"regexp_replace(text, '{pat}', '\\1{p} ', 'g')"
    return (
        "CASE WHEN doc_id % 7 = 0 THEN text "
        f"WHEN doc_id % 3 = 0 THEN {rep('.')} "
        f"WHEN doc_id % 3 = 1 THEN {rep('!')} "
        f"ELSE {rep('?')} END"
    )


def q_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-snapped overlapping retrieval chunking
    (operators/chunking.rag_chunks): greedy token-bounded passages
    with 1-sentence overlap, one row-local JVM expression fold per
    document — the RAG corpus splitter.  The doc_id%7 lane is a
    single run-on sentence over budget (own-chunk path); the rest
    split into ~5-token sentences and pack 4 per chunk."""
    from biothings_crawler_spark.operators.chunking import rag_chunks

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _rag_fixture_sql("spark") + " AS t"
    )
    return rag_chunks(d, "doc_id", "t", max_tokens=_RAG_M, overlap=_RAG_V)


def _sql_rag_chunks() -> str:
    """DuckDB twin of the rag_chunks fold.  Same two list_reduce
    quirk workarounds as SQL_CDC_CHUNKS: spans accumulate as a
    delimited STRING (list-in-struct accumulators drop appends), and
    every row folds over the same max-length range with live-guarded
    no-op steps (varying fold lengths corrupt accumulator state
    across rows in a vector)."""
    live = "x.b <= len(tk)"
    close = (f"({live} AND x.b - 1 > acc.b AND "
             f"list_sum(array_slice(tk, acc.b + 1, x.b)) > {_RAG_M})")
    sl = "array_slice(sents, lo + 1, hi + 1)"
    return f"""
WITH d AS (
  SELECT doc_id, {_rag_fixture_sql("duckdb")} AS t FROM documents),
s AS (
  SELECT doc_id,
    list_filter(list_transform(
      string_split(regexp_replace(t, '([.!?])\\s+', '\\1' || chr(1), 'g'),
                   chr(1)),
      x -> trim(x)), x -> x <> '') AS sents
  FROM d),
t2 AS (
  SELECT doc_id, sents,
    list_transform(sents,
                   x -> len(regexp_split_to_array(x, '\\s+'))) AS tk
  FROM s WHERE len(sents) > 0),
m AS (SELECT max(len(tk)) AS mx FROM t2),
f AS (
  SELECT doc_id, sents, tk,
    list_reduce(
      list_prepend(struct_pack(spans := '', b := 0),
        list_transform(range(1, (SELECT mx FROM m) + 1), i ->
          struct_pack(spans := '', b := CAST(i AS INTEGER)))),
      (acc, x) -> CASE WHEN {close}
        THEN struct_pack(
               spans := acc.spans || CAST(acc.b AS VARCHAR) || ':' ||
                        CAST(x.b - 2 AS VARCHAR) || ';',
               b := greatest(acc.b + 1, x.b - 1 - {_RAG_V}))
        ELSE acc END) AS st
  FROM t2),
c AS (
  SELECT doc_id, sents, tk,
    string_split(st.spans || CAST(st.b AS VARCHAR) || ':' ||
                 CAST(len(tk) - 1 AS VARCHAR), ';') AS spans
  FROM f),
x AS (
  SELECT doc_id, sents, tk, CAST(k - 1 AS INT) AS chunk_id,
    CAST(string_split(spans[CAST(k AS INTEGER)], ':')[1] AS INTEGER) AS lo,
    CAST(string_split(spans[CAST(k AS INTEGER)], ':')[2] AS INTEGER) AS hi
  FROM c, unnest(range(1, len(spans) + 1)) AS u(k))
SELECT doc_id, chunk_id,
  CAST(lo AS INT) AS sent_lo, CAST(hi AS INT) AS sent_hi,
  CAST(hi - lo + 1 AS INT) AS n_sents,
  CAST(list_sum(array_slice(tk, lo + 1, hi + 1)) AS BIGINT) AS n_tokens,
  CAST(len(array_to_string({sl}, ' ')) AS INT) AS n_chars,
  md5(array_to_string({sl}, ' ')) AS chunk_md5
FROM x
"""


SQL_RAG_CHUNKS = _sql_rag_chunks()


def q_ai_optout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AI/TDM opt-out compliance census (operators/compliance):
    noai / noimageai / TDM-Reservation signals from robots meta tags
    (both attr orders, unquoted-uppercase lane) and the response
    header, rolled up per host with exact ppm and tokens kept/lost.
    Lanes (doc_id%8): meta noai, reversed-attr noai, header noai,
    tdm meta 1, tdm meta 0 (waived — must NOT flag), header
    noimageai (images only — must not gate text), tdm header, clean."""
    from biothings_crawler_spark.operators.compliance import (
        ai_optout_flags,
        optout_accounting,
    )
    from biothings_crawler_spark.operators.text import words_col

    d = _t(spark, sf_dir, "documents")
    lane = F.col("doc_id") % 8
    html = (
        F.when(lane == 0, F.lit(
            '<html><head><meta name="robots" content="noai"></head>'
            "<body>b</body></html>"))
        .when(lane == 1, F.lit(
            '<html><head><META CONTENT="noindex, noai" NAME=ROBOTS>'
            "</head></html>"))
        .when(lane == 3, F.lit(
            '<html><head><meta name="tdm-reservation" content="1">'
            "</head></html>"))
        .when(lane == 4, F.lit(
            '<html><head><meta name="tdm-reservation" content="0">'
            "</head></html>"))
        .otherwise(F.lit("<html><head><title>t</title></head></html>"))
    )
    hdr = (
        F.when(lane == 2, F.lit("X-Robots-Tag: noai"))
        .when(lane == 5, F.lit("X-Robots-Tag: noimageai"))
        .when(lane == 6, F.lit("tdm-reservation: 1"))
        .otherwise(F.lit(""))
    )
    pages = d.select(
        F.concat(F.lit("h"),
                 F.expr("CAST(doc_id div 20 AS STRING)")).alias("host"),
        F.encode(html, "utf-8").alias("html"),
        hdr.alias("x_robots_tag"),
        F.size(words_col(F.col("text"))).alias("n_tokens"),
    )
    return optout_accounting(ai_optout_flags(pages), "host", "n_tokens")


def _sql_ai_optout() -> str:
    from biothings_crawler_spark.operators.compliance import (
        _ROBOTS_RE1,
        _ROBOTS_RE2,
        _TDM_RE1,
        _TDM_RE2,
    )

    def q(pat: str) -> str:  # SQL-quote a regex containing apostrophes
        return "'" + pat.replace("'", "''") + "'"

    def meta_union(r1: str, r2: str) -> str:
        # DuckDB array_to_string([]) is NULL (same quirk q_meta_robots
        # documents) — coalesce each side or the concat goes NULL
        return (
            f"coalesce(array_to_string("
            f"regexp_extract_all(html, {q(r1)}, 1), ' '), '')"
            f" || ' ' || "
            f"coalesce(array_to_string("
            f"regexp_extract_all(html, {q(r2)}, 1), ' '), '')"
        )

    return f"""
WITH p AS (
  SELECT 'h' || CAST(doc_id // 20 AS VARCHAR) AS host,
    CASE doc_id % 8
      WHEN 0 THEN '<html><head><meta name="robots" content="noai"></head><body>b</body></html>'
      WHEN 1 THEN '<html><head><META CONTENT="noindex, noai" NAME=ROBOTS></head></html>'
      WHEN 3 THEN '<html><head><meta name="tdm-reservation" content="1"></head></html>'
      WHEN 4 THEN '<html><head><meta name="tdm-reservation" content="0"></head></html>'
      ELSE '<html><head><title>t</title></head></html>' END AS html,
    CASE doc_id % 8
      WHEN 2 THEN 'X-Robots-Tag: noai'
      WHEN 5 THEN 'X-Robots-Tag: noimageai'
      WHEN 6 THEN 'tdm-reservation: 1'
      ELSE '' END AS hdr,
    len({_SQL_WORDS}) AS n_tokens
  FROM documents),
fl AS (
  SELECT host, n_tokens,
    lower({meta_union(_ROBOTS_RE1, _ROBOTS_RE2)} || ' ' || hdr) AS comb,
    lower({meta_union(_TDM_RE1, _TDM_RE2)}) AS tdmc,
    lower(hdr) AS lh
  FROM p),
fg AS (
  SELECT host, n_tokens,
    regexp_matches(comb, '\\bnoai\\b') AS noai,
    regexp_matches(comb, '\\bnoimageai\\b') AS noimageai,
    (regexp_matches(tdmc, '(^|\\s)1(\\s|$)')
     OR regexp_matches(lh, 'tdm-reservation\\s*:\\s*1(\\s|$|;)')) AS tdm
  FROM fl)
SELECT host,
  CAST(COUNT(*) AS BIGINT) AS n_pages,
  CAST(SUM(CASE WHEN noai THEN 1 ELSE 0 END) AS BIGINT) AS n_noai,
  CAST(SUM(CASE WHEN noimageai THEN 1 ELSE 0 END) AS BIGINT)
    AS n_noimageai,
  CAST(SUM(CASE WHEN tdm THEN 1 ELSE 0 END) AS BIGINT) AS n_tdm,
  CAST(SUM(CASE WHEN noai OR tdm THEN 1 ELSE 0 END) AS BIGINT)
    AS n_opt_out,
  CAST(SUM(CASE WHEN noai OR tdm THEN 0 ELSE n_tokens END) AS BIGINT)
    AS tokens_kept,
  CAST(SUM(CASE WHEN noai OR tdm THEN n_tokens ELSE 0 END) AS BIGINT)
    AS tokens_lost,
  CAST(SUM(CASE WHEN noai OR tdm THEN 1 ELSE 0 END) * 1000000
       // COUNT(*) AS BIGINT) AS optout_ppm
FROM fg GROUP BY host
"""


SQL_AI_OPTOUT = _sql_ai_optout()


_TILE_W, _TILE_K = 10, 2


def q_texttiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling topic segmentation (operators/texttiling — Hearst CL
    1997 with the squared-cosine ppm surrogate and the sqrt-free
    integer cutoff): fixture doc = text followed by its z-prefixed
    twin, a vocabulary-disjoint second topic, so the strongest depth
    lands at the junction gap.  Three hash aggs + one bounded per-doc
    collect; the depth fold is row-local."""
    from biothings_crawler_spark.operators.texttiling import texttiling

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" "),
            F.regexp_replace("text", r"(\S+)", r"z$1"),
        ).alias("t"),
    )
    return texttiling(d, "doc_id", "t", w=_TILE_W, k=_TILE_K)


def _sql_tile_core(w: int, k: int) -> str:
    """Shared CTE prefix for the tiling twins: the two-topic fixture,
    the agg pipeline, and the depth fold — ends at ``st`` with
    ``(doc_id, ntok, sc, m, d, sd, sd2)``."""
    return f"""
WITH dd AS (
  SELECT doc_id,
         text || ' ' || regexp_replace(text, '(\\S+)', 'z\\1', 'g') AS text
  FROM documents),
w2 AS (
  SELECT doc_id, ws, len(ws) AS ntok
  FROM (SELECT doc_id, {_SQL_WORDS} AS ws FROM dd)
  WHERE len(ws) > {w}),
tok AS (
  SELECT doc_id, ntok, CAST((ntok + {w} - 1) // {w} AS INTEGER) AS pp,
         CAST((i - 1) // {w} AS INTEGER) AS p,
         ws[CAST(i AS INTEGER)] AS tok
  FROM w2, unnest(range(1, len(ws) + 1)) AS u(i)),
cnt AS (
  SELECT doc_id, ntok, pp, p, tok, COUNT(*) AS c FROM tok GROUP BY ALL),
sides AS (
  SELECT doc_id, ntok, tok, c, CAST(g AS INTEGER) AS gap, 'l' AS side
  FROM cnt, unnest(range(p + 1, p + {k} + 1)) AS u(g)
  WHERE g >= 1 AND g <= pp - 1
  UNION ALL
  SELECT doc_id, ntok, tok, c, CAST(g AS INTEGER) AS gap, 'r' AS side
  FROM cnt, unnest(range(p - {k} + 1, p + 1)) AS u(g)
  WHERE g >= 1 AND g <= pp - 1),
pt AS (
  SELECT doc_id, ntok, gap, tok,
         SUM(CASE WHEN side = 'l' THEN c ELSE 0 END) AS cl,
         SUM(CASE WHEN side = 'r' THEN c ELSE 0 END) AS cr
  FROM sides GROUP BY ALL),
sc0 AS (
  SELECT doc_id, ntok, gap,
         CAST(SUM(cl * cr) * SUM(cl * cr) * 1000000
              // (SUM(cl * cl) * SUM(cr * cr)) AS BIGINT) AS s
  FROM pt GROUP BY doc_id, ntok, gap),
ar AS (SELECT doc_id, ntok, list(s ORDER BY gap) AS sc
       FROM sc0 GROUP BY doc_id, ntok),
dp AS (
  SELECT doc_id, ntok, sc, len(sc) AS m,
    list_transform(range(0, len(sc)), j ->
      sc[list_max(list_filter(range(0, j + 1),
           t -> t = 0 OR sc[t] < sc[t + 1])) + 1]
      + sc[list_min(list_filter(range(j, len(sc)),
           t -> t = len(sc) - 1 OR sc[t + 2] < sc[t + 1])) + 1]
      - 2 * sc[j + 1]) AS d
  FROM ar),
st AS (
  SELECT doc_id, ntok, sc, m, d, list_sum(d) AS sd,
         list_sum(list_transform(d, x -> x * x)) AS sd2
  FROM dp)"""


def _sql_texttiling() -> str:
    w = _TILE_W
    dj = "d[CAST(j AS INTEGER)]"
    b = f"(2 * sd - 2 * m * {dj})"
    return f"""{_sql_tile_core(_TILE_W, _TILE_K)}
SELECT doc_id, CAST(j AS INT) AS gap, CAST(j * {w} AS INT) AS pos,
  CAST(sc[CAST(j AS INTEGER)] AS BIGINT) AS score_ppm,
  CAST({dj} AS BIGINT) AS depth,
  ({b} < 0 OR m * sd2 - sd * sd > {b} * {b}) AS is_boundary
FROM st, unnest(range(1, m + 1)) AS u(j)
"""


SQL_TEXTTILING = _sql_texttiling()


_TILE_M = 40  # topic-chunk token budget


def q_topic_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic chunking (operators/texttiling.topic_chunks): TextTiling
    boundaries first, token budget second — chunks never straddle a
    topic shift.  Same two-topic fixture as q_texttiling, so the
    z-twin junction must always be a chunk edge."""
    from biothings_crawler_spark.operators.texttiling import topic_chunks

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" "),
            F.regexp_replace("text", r"(\S+)", r"z$1"),
        ).alias("t"),
    )
    return topic_chunks(d, "doc_id", "t",
                        w=_TILE_W, k=_TILE_K, max_tokens=_TILE_M)


def _sql_topic_chunks() -> str:
    w, s = _TILE_W, max(1, _TILE_M // _TILE_W)
    x = "2 * sd - 2 * m * x"
    cj = "ck[CAST(j AS INTEGER)]"
    hi = f"least({cj}.phi * {w}, ntok)"
    return f"""{_sql_tile_core(_TILE_W, _TILE_K)},
bf AS (
  SELECT doc_id, ntok, m,
    list_transform(d, x -> {x} < 0
      OR m * sd2 - sd * sd > ({x}) * ({x})) AS bf
  FROM st),
ct AS (
  SELECT doc_id, ntok,
    list_concat(list_concat([0],
      list_filter(range(1, m + 1), g -> bf[CAST(g AS INTEGER)])),
      [m + 1]) AS cuts
  FROM bf),
ck AS (
  SELECT doc_id, ntok,
    flatten(list_transform(range(1, len(cuts)), si ->
      list_transform(range(0,
          (cuts[CAST(si + 1 AS INTEGER)] - cuts[CAST(si AS INTEGER)] - 1)
          // {s} + 1), t ->
        struct_pack(
          seg := si - 1,
          plo := cuts[CAST(si AS INTEGER)] + t * {s},
          phi := least(cuts[CAST(si AS INTEGER)] + (t + 1) * {s},
                       cuts[CAST(si + 1 AS INTEGER)]))))) AS ck
  FROM ct)
SELECT doc_id,
  CAST({cj}.seg AS INT) AS seg_id,
  CAST(j - 1 AS INT) AS chunk_id,
  CAST({cj}.plo * {w} AS INT) AS tok_lo,
  CAST({hi} AS INT) AS tok_hi,
  CAST({hi} - {cj}.plo * {w} AS INT) AS n_tokens
FROM ck, unnest(range(1, len(ck) + 1)) AS u(j)
"""


SQL_TOPIC_CHUNKS = _sql_topic_chunks()


def q_sitemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-vs-crawl coverage audit (operators/audit
    .sitemap_coverage): per-host declared/fetched census with exact
    ppm coverage and orphan rates.  Lanes (doc_id%5): 0 = crawled but
    never declared (orphan), 1 = declared but never fetched (gap),
    else both; the crawl side re-lists doc_id%10==3 twice to prove
    the distinct() guard."""
    from biothings_crawler_spark.operators.audit import sitemap_coverage

    d = _t(spark, sf_dir, "documents").selectExpr(
        "CAST(doc_id div 25 AS STRING) AS hid",
        "doc_id", "doc_id % 5 AS lane",
    ).select(
        F.concat(F.lit("h"), F.col("hid")).alias("host"),
        F.concat(F.lit("https://h"), F.col("hid"),
                 F.lit(".example/p/"), F.col("doc_id")).alias("url"),
        "lane", "doc_id",
    )
    declared = d.filter("lane <> 0").select("host", "url")
    crawled = d.filter("lane <> 1").select("host", "url")
    dup = d.filter("lane <> 1 AND doc_id % 10 = 3").select("host", "url")
    return sitemap_coverage(declared, crawled.unionAll(dup))


SQL_SITEMAP_AUDIT = """
WITH d AS (
  SELECT 'h' || CAST(doc_id // 25 AS VARCHAR) AS host,
         'https://h' || CAST(doc_id // 25 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         doc_id % 5 AS lane
  FROM documents),
j AS (
  SELECT coalesce(dd.host, cc.host) AS host,
         CASE WHEN dd.url IS NOT NULL THEN 1 ELSE 0 END AS dd,
         CASE WHEN cc.url IS NOT NULL THEN 1 ELSE 0 END AS cc
  FROM (SELECT DISTINCT host, url FROM d WHERE lane <> 0) dd
  FULL OUTER JOIN (SELECT DISTINCT host, url FROM d WHERE lane <> 1) cc
  USING (host, url)),
a AS (
  SELECT host,
         CAST(SUM(dd) AS BIGINT) AS n_declared,
         CAST(SUM(cc) AS BIGINT) AS n_crawled,
         CAST(SUM(dd * cc) AS BIGINT) AS n_both,
         CAST(SUM(dd * (1 - cc)) AS BIGINT) AS n_gaps,
         CAST(SUM((1 - dd) * cc) AS BIGINT) AS n_orphans
  FROM j GROUP BY host)
SELECT host, n_declared, n_crawled, n_both, n_gaps, n_orphans,
  CAST(CASE WHEN n_declared > 0
       THEN n_both * 1000000 // n_declared ELSE 0 END AS BIGINT)
    AS coverage_ppm,
  CAST(CASE WHEN n_crawled > 0
       THEN n_orphans * 1000000 // n_crawled ELSE 0 END AS BIGINT)
    AS orphan_ppm
FROM a
"""


_TRS_ROUNDS, _TRS_N = 3, 2


def q_textrank_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractive summarization (operators/textrank.textrank_summary —
    TextRank over the per-document sentence-similarity graph, the
    §4.1 sentence variant of q_textrank_keywords): top-2 sentences
    per doc after 3 exact-integer weighted rounds.  Fixture reuses
    the rag punctuation rule; the doc_id%7 unpunctuated lane is a
    single isolated sentence and must emit nothing."""
    from biothings_crawler_spark.operators.textrank import textrank_summary

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _rag_fixture_sql("spark") + " AS t"
    )
    return textrank_summary(d, "doc_id", "t",
                            rounds=_TRS_ROUNDS, n=_TRS_N)


def _sql_textrank_summary() -> str:
    def W(e: str) -> str:
        return _SQL_WORDS.replace("lower(text)", f"lower({e})")

    it = "it0"
    iters = ""
    for r in range(1, _TRS_ROUNDS + 1):
        iters += f""",
it{r} AS MATERIALIZED (
  SELECT e.doc_id, e.sj AS si,
         CAST(150000 + SUM(p.s * 85 * e.w // (100 * e.w_out))
              AS BIGINT) AS s
  FROM edges e JOIN it{r - 1} p ON p.doc_id = e.doc_id AND p.si = e.si
  GROUP BY e.doc_id, e.sj)"""
        it = f"it{r}"
    return f"""
WITH d AS (
  SELECT doc_id, {_rag_fixture_sql("duckdb")} AS t FROM documents),
sl AS (
  SELECT doc_id,
    list_filter(list_transform(
      string_split(regexp_replace(t, '([.!?])\\s+', '\\1' || chr(1), 'g'),
                   chr(1)), x -> trim(x)), x -> x <> '') AS sl
  FROM d),
sen AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS si,
         list_distinct({W("sl[CAST(i AS INTEGER)]")}) AS tw
  FROM sl, unnest(range(1, len(sl) + 1)) AS u(i)),
s2 AS (SELECT doc_id, si, tw, len(tw) AS nt FROM sen WHERE len(tw) > 0),
st AS (SELECT doc_id, si, nt, unnest(tw) AS w FROM s2),
half AS (
  SELECT a.doc_id, a.si, b.si AS sj,
         CAST(COUNT(*) * 1000000 // (a.nt + b.nt) AS BIGINT) AS w
  FROM st a JOIN st b ON a.doc_id = b.doc_id AND a.w = b.w
                      AND a.si < b.si
  GROUP BY a.doc_id, a.si, b.si, a.nt, b.nt
  HAVING COUNT(*) * 1000000 // (a.nt + b.nt) > 0),
edges0 AS (
  SELECT doc_id, si, sj, w FROM half
  UNION ALL SELECT doc_id, sj, si, w FROM half),
wout AS (
  SELECT doc_id, si, CAST(SUM(w) AS BIGINT) AS w_out
  FROM edges0 GROUP BY doc_id, si),
edges AS MATERIALIZED (
  SELECT e.doc_id, e.si, e.sj, e.w, o.w_out
  FROM edges0 e JOIN wout o USING (doc_id, si)),
it0 AS (
  SELECT DISTINCT doc_id, si, CAST(1000000 AS BIGINT) AS s
  FROM edges){iters}
SELECT doc_id, si, s AS score_micro,
       CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY s DESC, si) AS INT) AS pick
FROM {it}
QUALIFY pick <= {_TRS_N}
"""


SQL_TEXTRANK_SUMMARY = _sql_textrank_summary()


_PACK_CAP = 96
_PACK_SHARDS = 8


def _pack_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tok"),
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
    )


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-shard sequence packing (operators/packing): documents
    in ascending-id order fill capacity-96 context bins; docs past the
    capacity are clipped and flagged oversized."""
    from biothings_crawler_spark.operators.packing import pack_sequences

    return pack_sequences(
        _pack_base(spark, sf_dir), "doc_id", "n_tok", _PACK_CAP, "shard"
    )


def q_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing utilization (operators/packing.packing_stats)
    over q_seq_packing's assignment."""
    from biothings_crawler_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    packed = pack_sequences(
        _pack_base(spark, sf_dir), "doc_id", "n_tok", _PACK_CAP, "shard"
    )
    return packing_stats(packed, _PACK_CAP)


# Greedy packing is a sequential fold per shard; DuckDB re-derives it
# with a recursive CTE stepping one row per shard per iteration
# (recursion depth = max shard size — fixture-bounded).
_SQL_PACK_REC = f"""base AS (
  SELECT doc_id AS id, doc_id % {_PACK_SHARDS} AS shard,
         least({_SQL_TOKENS}, {_PACK_CAP}) AS tok,
         {_SQL_TOKENS} > {_PACK_CAP} AS oversized
  FROM documents),
o AS (SELECT id, shard, tok, oversized,
             row_number() OVER (PARTITION BY shard ORDER BY id) AS rn
      FROM base),
p AS (
  SELECT id, shard, rn, tok, oversized,
         CAST(0 AS BIGINT) AS bin, tok AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.id, o.shard, o.rn, o.tok, o.oversized,
         CASE WHEN p.fill + o.tok <= {_PACK_CAP}
              THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + o.tok <= {_PACK_CAP}
              THEN p.fill + o.tok ELSE o.tok END
  FROM p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1)"""

SQL_SEQ_PACKING = f"""
WITH RECURSIVE {_SQL_PACK_REC}
SELECT id, CAST(shard AS BIGINT) AS shard, bin, CAST(tok AS BIGINT) AS tok,
       CAST(fill AS BIGINT) AS fill_after, oversized
FROM p
"""

SQL_PACK_STATS = f"""
WITH RECURSIVE {_SQL_PACK_REC}
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
       CAST(SUM(tok) * 1000000 // ((MAX(bin) + 1) * {_PACK_CAP}) AS BIGINT)
         AS util_ppm
FROM p GROUP BY shard
"""


def q_pack_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document attention accounting (operators/packing.
    packing_fragmentation) over q_seq_packing's assignment: per bin,
    intra-doc pair volume and the cross-doc leakage ppm a missing
    block-diagonal mask would expose."""
    from biothings_crawler_spark.operators.packing import (
        pack_sequences,
        packing_fragmentation,
    )

    packed = pack_sequences(
        _pack_base(spark, sf_dir), "doc_id", "n_tok", _PACK_CAP, "shard"
    )
    return packing_fragmentation(packed)


SQL_PACK_FRAGMENTATION = f"""
WITH RECURSIVE {_SQL_PACK_REC}
SELECT CAST(shard AS BIGINT) AS shard, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS tokens,
       CAST(SUM(tok * tok) AS BIGINT) AS intra_pairs,
       CAST((SUM(tok) * SUM(tok) - SUM(tok * tok)) * 1000000
            // greatest(SUM(tok) * SUM(tok), 1) AS BIGINT) AS cross_ppm
FROM p GROUP BY shard, bin
"""


_DUST_URL = """'https://s' || CAST((doc_id div 7) % 20 AS {S}) || '.example.org/page/'
  || CAST(doc_id div 7 AS {S})
  || '?lang=' || CAST(doc_id % 2 AS {S})
  || CASE WHEN doc_id % 3 <> 2
          THEN '&session=' || CAST(doc_id AS {S}) ELSE '' END
  || '&utm=x'"""
_DUST_CONTENT = ("md5(CAST(doc_id div 7 AS {S}) || '|' "
                 "|| CAST(doc_id % 2 AS {S}))")


def _dust_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl corpus where content depends on (page group, lang) only:
    'session' varies freely within identical-content groups (DUST),
    'lang' provably changes content, 'utm' never varies (no
    experiments -> conservatively kept)."""
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        _DUST_URL.format(S="STRING").replace("div", "div") + " AS url",
        _DUST_CONTENT.format(S="STRING") + " AS content_hash",
    )


def q_dust_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST rule learning (operators/dust.dust_params): per-parameter
    content-irrelevance verdicts from residual-group experiments."""
    from biothings_crawler_spark.operators.dust import dust_params

    return dust_params(_dust_urls(spark, sf_dir))


def q_dust_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-rule application (operators/dust.strip_learned_params):
    canonicalize the corpus URLs by stripping every parameter the
    evidence marked content-irrelevant ('session' on this fixture)."""
    from biothings_crawler_spark.operators.dust import (
        dust_params,
        strip_learned_params,
    )

    urls = _dust_urls(spark, sf_dir)
    return strip_learned_params(
        urls.select("doc_id", "url"), dust_params(urls)
    )


_SQL_DUST_CTES = f"""urls AS (
  SELECT doc_id, {_DUST_URL.format(S="VARCHAR").replace("div 7", "// 7")}
           AS url,
         {_DUST_CONTENT.format(S="VARCHAR").replace("div 7", "// 7")}
           AS content_hash
  FROM documents),
dx AS (
  SELECT url, content_hash, split_part(url, '?', 1) AS path,
         string_split(substr(url, instr(url, '?') + 1), '&') AS params
  FROM urls),
dk AS (SELECT url, content_hash, path, params, unnest(params) AS kv FROM dx),
dg AS (
  SELECT split_part(kv, '=', 1) AS param,
         path || '?' ||
           coalesce(array_to_string(
             list_filter(params, p -> p <> kv), '&'), '') AS residual,
         kv, content_hash
  FROM dk),
dgr AS (
  SELECT param, residual, COUNT(DISTINCT kv) AS n_vals,
         COUNT(DISTINCT content_hash) AS n_contents
  FROM dg GROUP BY 1, 2),
dv AS (
  SELECT param,
         CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_groups_multi,
         CAST(SUM(CASE WHEN n_vals > 1 AND n_contents = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_irrelevant
  FROM dgr GROUP BY 1),
dverdict AS (
  SELECT param, n_groups_multi, n_irrelevant,
         CAST(CASE WHEN n_groups_multi > 0
              THEN n_irrelevant * 1000000 // n_groups_multi
              ELSE 0 END AS BIGINT) AS irrelevant_ppm,
         n_groups_multi >= 3
           AND (CASE WHEN n_groups_multi > 0
                THEN n_irrelevant * 1000000 // n_groups_multi
                ELSE 0 END) >= 900000 AS strip
  FROM dv)"""

SQL_DUST_PARAMS = f"""
WITH {_SQL_DUST_CTES}
SELECT param, n_groups_multi, n_irrelevant, irrelevant_ppm, strip
FROM dverdict
"""

SQL_DUST_STRIP = f"""
WITH {_SQL_DUST_CTES},
ss AS (SELECT coalesce(list(param) FILTER (WHERE strip), []) AS sl
       FROM dverdict),
cleaned AS (
  SELECT doc_id, split_part(url, '?', 1) AS path,
         list_filter(string_split(substr(url, instr(url, '?') + 1), '&'),
                     p -> NOT list_contains(ss.sl, split_part(p, '=', 1)))
           AS kept
  FROM urls CROSS JOIN ss)
SELECT doc_id,
       CASE WHEN len(kept) > 0
            THEN path || '?' || array_to_string(kept, '&')
            ELSE path END AS url
FROM cleaned
"""


_SM_BLOCK = """'<url><loc>https://h' || CAST(doc_id AS {S}) || '.example.org/p/'
  || CAST({I} AS {S}) || '</loc>'
  || CASE WHEN (doc_id + {I}) % 3 = 0 THEN
       '<lastmod>2024-' || lpad(CAST((doc_id + {I}) % 12 + 1 AS {S}), 2, '0')
       || '-' || lpad(CAST((doc_id + {I}) % 28 + 1 AS {S}), 2, '0')
       || '</lastmod>' ELSE '' END
  || CASE CAST((doc_id + {I}) % 8 AS INT)
       WHEN 0 THEN '<changefreq>daily</changefreq>'
       WHEN 1 THEN '<changefreq>Hourly</changefreq>'
       WHEN 2 THEN '<changefreq>monthly</changefreq>'
       WHEN 3 THEN '<changefreq>never</changefreq>'
       ELSE '' END
  || CASE WHEN (doc_id + {I}) % 4 = 0 THEN
       '<priority>0.' || CAST((doc_id + {I}) % 10 AS {S}) || '</priority>'
     WHEN (doc_id + {I}) % 4 = 1 THEN '<priority>1</priority>'
     ELSE '' END
  || '</url>'"""


def _sm_body(S: str) -> str:
    blocks = " || chr(10) || ".join(
        _SM_BLOCK.format(S=S, I=i) for i in range(3)
    )
    return ("'<?xml version=\"1.0\"?><urlset>' || chr(10) || " + blocks
            + " || chr(10) || '<url><lastmod>2024-01-01</lastmod></url>'"
            + " || '</urlset>'")


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML parsing (sources/sitemap.parse_sitemap_xml): per-URL
    loc/lastmod/changefreq/priority extraction with exact integer
    milli-priorities and changefreq->recrawl-hours mapping; a loc-less
    decoy block per sitemap must be dropped."""
    from biothings_crawler_spark.sources.sitemap import parse_sitemap_xml

    sm = _t(spark, sf_dir, "documents").selectExpr(
        "'https://h' || CAST(doc_id AS STRING) || '.example.org/sitemap.xml'"
        " AS sitemap_url",
        _sm_body("STRING") + " AS body",
    )
    return parse_sitemap_xml(sm)


SQL_SITEMAP_PARSE = f"""
WITH sm AS (
  SELECT 'https://h' || CAST(doc_id AS VARCHAR) || '.example.org/sitemap.xml'
           AS sitemap_url,
         {_sm_body("VARCHAR")} AS body
  FROM documents),
bl AS (
  SELECT sitemap_url,
         unnest(regexp_extract_all(body, '(?s)<url>(.*?)</url>', 1)) AS b
  FROM sm),
f AS (
  SELECT sitemap_url,
         regexp_extract(b, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1) AS loc,
         regexp_extract(b, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1) AS lastmod,
         lower(regexp_extract(b, '(?s)<changefreq>\\s*(.*?)\\s*</changefreq>', 1))
           AS changefreq,
         regexp_extract(b, '(?s)<priority>\\s*(.*?)\\s*</priority>', 1) AS pr
  FROM bl)
SELECT sitemap_url, loc, lastmod, changefreq,
  CAST(CASE WHEN pr = '' THEN 500 ELSE
    (CASE WHEN split_part(pr, '.', 1) = '' THEN 0
          ELSE CAST(split_part(pr, '.', 1) AS INT) END) * 1000
    + CASE WHEN instr(pr, '.') > 0
           THEN CAST(substr(rpad(split_part(pr, '.', 2), 3, '0'), 1, 3) AS INT)
           ELSE 0 END
  END AS INT) AS priority_milli,
  CAST(CASE changefreq WHEN 'always' THEN 1 WHEN 'hourly' THEN 1
       WHEN 'daily' THEN 24 WHEN 'weekly' THEN 168 WHEN 'monthly' THEN 720
       WHEN 'yearly' THEN 8760 WHEN 'never' THEN 0 ELSE 168 END AS INT)
    AS recrawl_hours
FROM f WHERE loc <> ''
"""


_CM_HOST = """CASE WHEN o_orderkey % 10 <= 3 THEN 'hot.example.org'
     WHEN o_orderkey % 10 <= 6
       THEN 'warm' || CAST(o_custkey % 5 AS {S}) || '.example.org'
     ELSE 'cold' || CAST(o_orderkey % 97 AS {S}) || '.example.org'
END"""


def q_countmin_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min host-frequency sketch (operators/sketch.countmin_build
    / countmin_estimate) over a skewed host stream (one hot host with
    ~40% of the mass, 5 warm, 97 cold): per-host conservative estimate
    joined against the exact count."""
    from biothings_crawler_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    hosts = _t(spark, sf_dir, "orders").selectExpr(
        _CM_HOST.format(S="STRING") + " AS host"
    )
    sketch = countmin_build(hosts, "host")
    est = countmin_estimate(sketch, hosts.distinct(), "host")
    exact = hosts.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    return est.join(exact, est.value == exact.host).select(
        "host", "exact_n", "estimate"
    )


SQL_COUNTMIN_HOSTS = f"""
WITH hosts AS (SELECT {_CM_HOST.format(S="VARCHAR")} AS host FROM orders),
ex AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS exact_n
       FROM hosts GROUP BY host),
pairs AS (
  SELECT host, r,
         CAST(('0x' || substr(md5(host), 1 + 8 * r, 8))::BIGINT % 512
              AS BIGINT) AS c
  FROM hosts CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(r)),
sk AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY r, c),
kp AS (SELECT DISTINCT host, r, c FROM pairs),
est AS (SELECT kp.host, MIN(coalesce(sk.n, 0)) AS estimate
        FROM kp LEFT JOIN sk USING (r, c) GROUP BY kp.host)
SELECT ex.host, exact_n, CAST(estimate AS BIGINT) AS estimate
FROM ex JOIN est ON ex.host = est.host
"""


def q_crawl_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed crawl-admission pipeline over one coherent fixture:
    domain blocklist (operators/blocklist) -> robots.txt parse+enforce
    (operators/robots + politeness.apply_robots, agent 'sparkbot') ->
    DUST learn+strip (operators/dust) -> distinct.  8 docs per page
    share content and differ only in a session param; hosts h7/h13/h21
    are blocklisted; every host's robots disallows /private/ for '*'
    but hosts with id%3=0 have a sparkbot group disallowing only /tmp/
    (specific group EXCLUDES the star rules).  The oracle is ONE DuckDB
    statement encoding the fixture's intended admissions — a golden
    pair in the q_clean_corpus style: if any stage's learning or rule
    semantics drift, the hash breaks."""
    from biothings_crawler_spark.operators.blocklist import blocklist_filter
    from biothings_crawler_spark.operators.dust import (
        dust_params,
        strip_learned_params,
    )
    from biothings_crawler_spark.operators.robots import parse_robots_txt

    d = _t(spark, sf_dir, "documents")
    u = d.selectExpr(
        "doc_id",
        "doc_id div 8 AS page",
        "(doc_id div 8) % 50 AS hid",
        """CASE WHEN doc_id % 8 < 2 THEN '/private/p' || CAST(doc_id div 8 AS STRING)
                WHEN doc_id % 8 < 4 THEN '/tmp/p' || CAST(doc_id div 8 AS STRING)
                ELSE '/ok/p' || CAST(doc_id div 8 AS STRING) END AS path""",
    ).selectExpr(
        "doc_id", "page", "hid", "path",
        "'h' || CAST(hid AS STRING) || '.example.org' AS host",
    ).selectExpr(
        "doc_id", "page", "hid", "host",
        "'https://' || host || path || '?id=' || CAST(page AS STRING)"
        " || '&session=' || CAST(doc_id AS STRING) AS url_canon",
        "md5(host || path) AS content_hash",
    )
    bl = spark.createDataFrame(
        [(f"h{i}.example.org",) for i in (7, 13, 21)], "domain string"
    )
    robots_pages = u.select("hid", "host").distinct().selectExpr(
        "host",
        """'User-agent: *' || chr(10) || 'Disallow: /private/' || chr(10) ||
           CASE WHEN hid % 3 = 0 THEN chr(10) || 'User-agent: sparkbot'
                || chr(10) || 'Disallow: /tmp/' || chr(10) ELSE '' END
           AS body""",
    )
    robots = parse_robots_txt(robots_pages, agent="sparkbot")
    admitted = blocklist_filter(u, bl)
    admitted = apply_robots(admitted, robots)
    rules = dust_params(u, "url_canon", "content_hash")
    cleaned = strip_learned_params(
        admitted.select("host", "url_canon"), rules, url_col="url_canon"
    )
    return cleaned.distinct()


SQL_CRAWL_ADMISSION = """
WITH u AS (
  SELECT doc_id, doc_id // 8 AS page, (doc_id // 8) % 50 AS hid,
         CASE WHEN doc_id % 8 < 2 THEN '/private/p' || CAST(doc_id // 8 AS VARCHAR)
              WHEN doc_id % 8 < 4 THEN '/tmp/p' || CAST(doc_id // 8 AS VARCHAR)
              ELSE '/ok/p' || CAST(doc_id // 8 AS VARCHAR) END AS path
  FROM documents),
a AS (
  SELECT DISTINCT 'h' || CAST(hid AS VARCHAR) || '.example.org' AS host,
         'https://h' || CAST(hid AS VARCHAR) || '.example.org' || path
           || '?id=' || CAST(page AS VARCHAR) AS url_canon
  FROM u
  WHERE hid NOT IN (7, 13, 21)
    AND NOT (CASE WHEN hid % 3 = 0 THEN path LIKE '/tmp/%'
                  ELSE path LIKE '/private/%' END))
SELECT host, url_canon FROM a
"""


_TP_FWD = """CASE CAST(doc_id % 4 AS INT)
  WHEN 0 THEN 'alpha beta gamma delta epsilon.'
  WHEN 1 THEN 'beta gamma delta epsilon zeta.'
  WHEN 2 THEN 'gamma delta epsilon zeta eta.'
  ELSE 'delta epsilon zeta eta theta.'
END"""
_TP_REV = """CASE CAST(doc_id % 4 AS INT)
  WHEN 0 THEN 'epsilon delta gamma beta alpha.'
  WHEN 1 THEN 'zeta epsilon delta gamma beta.'
  WHEN 2 THEN 'eta zeta epsilon delta gamma.'
  ELSE 'theta eta zeta epsilon delta.'
END"""
_TP_SENT = (f"CASE WHEN doc_id % 6 = 1 THEN {_TP_REV} ELSE {_TP_FWD} END")


def q_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data tail (plans/pipeline.training_prep):
    C4 filter -> bigram-LM tail-drop -> greedy packing, on pages of
    doc_id%9 repeated shared-vocab sentences.  Casualties: <5-sentence
    pages die at C4; doc_id%6==1 pages use word-reversed sentences
    (all bigrams OOV vs the even-id model) and die at the LM stage."""
    from biothings_crawler_spark.plans.pipeline import training_prep

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"repeat(({_TP_SENT}) || chr(10), CAST(doc_id % 9 AS INT)) AS ptext",
    )
    return training_prep(pages, "doc_id", "ptext")


SQL_TRAINING_PREP = f"""
WITH RECURSIVE pg AS (
  SELECT doc_id AS id,
         repeat(({_TP_SENT}) || chr(10), CAST(doc_id % 9 AS INT)) AS ptext
  FROM documents),
cl AS (
  SELECT id,
         list_filter(string_split(ptext, chr(10)),
           l -> len(list_filter(string_split_regex(trim(l), '\\s+'),
                                x -> len(x) > 0)) >= 3
                AND regexp_matches(trim(l), '[.!?"]$')
                AND NOT contains(lower(trim(l)), 'javascript')) AS kept,
         contains(lower(ptext), 'lorem ipsum') AS lorem,
         contains(ptext, '{{') AS brace
  FROM pg),
c4 AS (
  SELECT id, coalesce(array_to_string(kept, chr(10)), '') AS text,
         CAST(len(regexp_extract_all(
           coalesce(array_to_string(kept, chr(10)), ''), '([.!?])', 1))
           AS BIGINT) AS n_sent,
         lorem, brace
  FROM cl),
keep AS (SELECT id, text FROM c4
         WHERE NOT lorem AND NOT brace AND n_sent >= 5),
w AS (SELECT id, {_SQL_WORDS} AS ws FROM keep),
g AS (
  SELECT id, CASE WHEN len(ws) >= 2
             THEN list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])
             ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
tr AS (SELECT unnest(grams) AS bg FROM g WHERE id % 2 = 0),
big AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM tr GROUP BY bg),
uni AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c12) AS c1
        FROM big GROUP BY 1),
mdl AS (SELECT bg, c12, CAST(c1 AS BIGINT) AS c1
        FROM big JOIN uni ON split_part(big.bg, ' ', 1) = uni.w1
        WHERE c12 >= 2),
dg AS (SELECT id, unnest(grams) AS bg FROM g),
sc AS (
  SELECT dg.id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         SUM(CASE WHEN mdl.bg IS NOT NULL
                  THEN mdl.c12 * 1000000 // mdl.c1 ELSE 0 END) AS s
  FROM dg LEFT JOIN mdl USING (bg) GROUP BY dg.id),
good AS (
  SELECT k.id, k.text FROM keep k JOIN sc ON sc.id = k.id
  WHERE CASE WHEN n_bigrams > 0 THEN s // n_bigrams ELSE 0 END >= 2000),
base AS (
  SELECT id, id % 8 AS shard, least(tokc, 128) AS tok, tokc > 128 AS oversized
  FROM (SELECT id, {_SQL_TOKENS} AS tokc FROM good)),
o AS (SELECT id, shard, tok, oversized,
             row_number() OVER (PARTITION BY shard ORDER BY id) AS rn
      FROM base),
p AS (
  SELECT id, shard, rn, tok, oversized, CAST(0 AS BIGINT) AS bin, tok AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.id, o.shard, o.rn, o.tok, o.oversized,
         CASE WHEN p.fill + o.tok <= 128 THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + o.tok <= 128 THEN p.fill + o.tok ELSE o.tok END
  FROM p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1)
SELECT id, CAST(shard AS BIGINT) AS shard, bin, CAST(tok AS BIGINT) AS tok,
       CAST(fill AS BIGINT) AS fill_after, oversized
FROM p
"""


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-density main-content extraction
    (operators/extract.extract_main_content) over pages with a planted
    nav bar, 1-2 content paragraphs (one containing a low-density
    inline anchor), a word-sparse junk block, and a link-farm footer —
    only the paragraphs must survive."""
    from biothings_crawler_spark.operators.extract import extract_main_content

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        """'<div id="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>'
        || '<p>' || array_join(slice(split(text, ' '), 1, 25), ' ')
        || ' end of paragraph one here today.</p>'
        || CASE WHEN doc_id % 3 = 0 THEN
             '<p>' || array_join(slice(split(text, ' '), 26, 15), ' ')
             || ' plus filler words to reach the minimum easily see <a href="/d">details page</a> now.</p>'
           ELSE '' END
        || '<div>tiny junk</div>'
        || '<div class="footer"><a href="/1">link one</a> <a href="/2">link two</a> <a href="/3">link three</a></div>'
        AS html""",
    )
    return extract_main_content(pages, "doc_id", "html")


SQL_MAIN_CONTENT = r"""
WITH pages AS (
  SELECT doc_id,
    '<div id="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>'
    || '<p>' || coalesce(array_to_string((string_split(text, ' '))[1:25], ' '), '')
    || ' end of paragraph one here today.</p>'
    || CASE WHEN doc_id % 3 = 0 THEN
         '<p>' || coalesce(array_to_string((string_split(text, ' '))[26:40], ' '), '')
         || ' plus filler words to reach the minimum easily see <a href="/d">details page</a> now.</p>'
       ELSE '' END
    || '<div>tiny junk</div>'
    || '<div class="footer"><a href="/1">link one</a> <a href="/2">link two</a> <a href="/3">link three</a></div>'
    AS html
  FROM documents),
f AS (
  SELECT doc_id AS id,
    list_transform(
      string_split_regex(html,
        '(?i)</?(?:p|div|td|li|h[1-6]|section|article|table|ul|ol|br)[^>]*>'),
      b -> struct_pack(
        txt := trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'),
                                   '\s+', ' ', 'g')),
        w := len(list_filter(string_split_regex(
               trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'),
                                   '\s+', ' ', 'g')), '\s+'),
               x -> len(x) > 0)),
        aw := len(list_filter(string_split_regex(
                regexp_replace(coalesce(array_to_string(
                  regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
                  '<[^>]*>', ' ', 'g'), '\s+'),
                x -> len(x) > 0)))) AS feats
  FROM pages),
k AS (
  SELECT id, feats,
    list_filter(feats, t -> struct_extract(t, 'w') >= 10
      AND (struct_extract(t, 'aw') * 1000000)
          // greatest(struct_extract(t, 'w'), 1) <= 333333) AS kept
  FROM f)
SELECT id,
  coalesce(array_to_string(
    list_transform(kept, t -> struct_extract(t, 'txt')), chr(10)), '')
    AS main_text,
  CAST(len(feats) AS BIGINT) AS n_blocks,
  CAST(len(kept) AS BIGINT) AS n_kept
FROM k
"""


def q_url_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 URL content-version history (operators/snapshot.url_history)
    over a fetch log derived from events: 50 URLs keyed by user_id,
    content hash drifting in event_id div 25 blocks so consecutive
    same-hash fetches collapse into versions."""
    from biothings_crawler_spark.operators.snapshot import url_history

    log = _t(spark, sf_dir, "events").selectExpr(
        "'u' || CAST(user_id AS STRING) AS url",
        "ts AS fetch_ts",
        "md5('u' || CAST(user_id AS STRING) || ':' "
        "|| CAST((event_id div 25) % 5 AS STRING)) AS content_hash",
    )
    return url_history(log)


SQL_URL_HISTORY = """
WITH log AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS url, ts,
         md5('u' || CAST(user_id AS VARCHAR) || ':'
             || CAST((event_id // 25) % 5 AS VARCHAR)) AS h
  FROM events),
c AS (
  SELECT url, ts, h,
         CASE WHEN lag(h) OVER (PARTITION BY url ORDER BY ts)
                   IS DISTINCT FROM h THEN 1 ELSE 0 END AS chg
  FROM log),
v AS (
  SELECT url, ts, h,
         SUM(chg) OVER (PARTITION BY url ORDER BY ts) AS vid
  FROM c),
g AS (
  SELECT url, vid, MIN(h) AS content_hash, MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_fetches
  FROM v GROUP BY url, vid)
SELECT url, CAST(vid AS BIGINT) AS version_no, content_hash, valid_from,
       lead(valid_from) OVER (PARTITION BY url ORDER BY vid) AS valid_to,
       n_fetches
FROM g
"""


def q_aimd_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host AIMD crawl-rate controller (operators/recrawl.
    aimd_host_rates): fetch log synthesized from events (host = user
    bucket, HTTP status deterministic from a Knuth-hash of event_id:
    ~7% 429, ~3% 503, rest 200).  Hourly backpressure flags fold into
    next-round requests-per-hour budgets — additive increase on clean
    hours, halving on backpressure hours, clamped.  Integer-only, so
    the DuckDB list_reduce twin is bit-identical."""
    from biothings_crawler_spark.operators.recrawl import aimd_host_rates

    ev = _t(spark, sf_dir, "events")
    mix = (F.col("event_id") * F.lit(2654435761)) % 100
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias("host"),
        F.col("ts"),
        F.when(mix < 7, F.lit(429))
        .when(mix < 10, F.lit(503))
        .otherwise(F.lit(200))
        .alias("status"),
    )
    return aimd_host_rates(
        fetches, "host", "ts", "status",
        base_rate_rph=60, min_rate_rph=6, max_rate_rph=3600, incr_rph=12,
    )


SQL_AIMD_RATES = """
WITH f AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         epoch_us(ts) AS us,
         CASE WHEN (event_id * 2654435761) % 100 < 7 THEN 429
              WHEN (event_id * 2654435761) % 100 < 10 THEN 503
              ELSE 200 END AS status
  FROM events),
hourly AS (
  SELECT host, us - us % 3600000000 AS hour_us,
         CAST(COUNT(*) AS BIGINT) AS n_fetches,
         MAX(CAST(status = 429 OR status >= 500 AS INT)) AS backoff
  FROM f GROUP BY host, us - us % 3600000000),
agg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n_fetches) AS BIGINT) AS n_fetches,
         CAST(SUM(backoff) AS BIGINT) AS n_backoff_hours,
         list(backoff ORDER BY hour_us) AS flags
  FROM hourly GROUP BY host)
SELECT host, n_hours, n_fetches, n_backoff_hours,
       list_reduce(
         list_prepend(CAST(60 AS BIGINT),
                      list_transform(flags, c -> CAST(c AS BIGINT))),
         (acc, c) -> CASE WHEN c = 1
                          THEN GREATEST(CAST(6 AS BIGINT), acc // 2)
                          ELSE LEAST(CAST(3600 AS BIGINT), acc + 12)
                     END) AS rate_rph
FROM agg
"""


def q_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection (operators/traps.soft404_flags): fetch
    bodies synthesized from documents — doc_id%11==0 serves the
    host's identical 'Page Not Found' template (error phrase +
    repeats across distinct URLs -> flagged), doc_id%13==0 serves a
    shared newsletter blurb (repeats but NO error phrase -> stays
    False: repetition alone must not flag), the rest serve their own
    text.  Both gate conditions exercised; oracle is the identical
    two-condition SQL."""
    from biothings_crawler_spark.operators.traps import soft404_flags

    d = _t(spark, sf_dir, "documents")
    body = (
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit("Oops! Page Not Found. The requested document does not exist."),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.lit("Subscribe to our newsletter today"),
        )
        .otherwise(F.col("text"))
    )
    fetches = d.select(
        F.col("source").alias("host"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        body.alias("text"),
    )
    return soft404_flags(fetches, "host", "url", "text", min_urls=2)


SQL_SOFT404 = """
WITH f AS (
  SELECT source AS host,
         'https://' || source || '/p/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 11 = 0
              THEN 'Oops! Page Not Found. The requested document does not exist.'
              WHEN doc_id % 13 = 0
              THEN 'Subscribe to our newsletter today'
              ELSE text END AS text
  FROM documents),
b AS (
  SELECT host, url,
         md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS body_hash,
         regexp_matches(text,
           '(?i)(page not found|404 error|does not exist|no longer available|nothing was found|page you requested)')
           AS has_phrase
  FROM f),
sigs AS (
  SELECT host, body_hash
  FROM b GROUP BY host, body_hash
  HAVING COUNT(DISTINCT url) >= 2 AND MAX(CAST(has_phrase AS INT)) = 1)
SELECT b.host, b.url, b.body_hash,
       (s.body_hash IS NOT NULL) AS is_soft404
FROM b LEFT JOIN sigs s ON b.host = s.host AND b.body_hash = s.body_hash
"""


def _mirror_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared mirror-detection fixture (q_mirror_hosts +
    q_site_families): originals, a '.mirror' twin re-serving
    doc_id%3!=2 of each host's docs, a shared 'About us' page on every
    host, and a '.blog' partial syndicator below mirror threshold."""
    d = _t(spark, sf_dir, "documents")
    orig = d.select(
        F.col("source").alias("host"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
    )
    mirr = d.filter(F.col("doc_id") % 3 != 2).select(
        F.concat(F.col("source"), F.lit(".mirror")).alias("host"),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".mirror/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
    )
    about = d.select(F.col("source")).distinct().select(
        F.col("source").alias("host"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/about")).alias("url"),
        F.lit("About us and our mission statement").alias("text"),
    )
    # a '.blog' twin syndicates a few of the host's docs plus its own
    # unique commentary -> containment well under 50%, must stay
    # is_mirror=False.  doc_id is STRIPED across sources (source =
    # 'src'||doc_id%20), so per-host mixes key on the within-host
    # ordinal doc_id div 20, not raw doc_id mods.
    ordinal = F.col("doc_id") - (F.col("doc_id") % 20)
    ordinal = (ordinal / 20).cast("long")
    blog = d.filter((ordinal % 8 == 0) | (ordinal % 3 == 0)).select(
        F.concat(F.col("source"), F.lit(".blog")).alias("host"),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".blog/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.when(ordinal % 8 == 0, F.col("text"))
        .otherwise(
            F.concat(F.lit("original commentary on item "),
                     F.col("doc_id").cast("string"))
        ).alias("text"),
    )
    return orig.unionByName(mirr).unionByName(about).unionByName(blog)


def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-mirror detection (operators/traps.mirror_report): each
    source hosts its documents; a '.mirror' twin re-serves doc_id%3!=2
    of them (→ containment ~2/3e6, flagged); every host also serves
    one identical 'About us' page whose hash lands on ALL hosts and
    must be dropped by the max_hosts_per_hash bound BEFORE the pair
    join — without the bound every host pair would share it."""
    from biothings_crawler_spark.operators.traps import mirror_report

    pages = _mirror_pages(spark, sf_dir)
    return mirror_report(
        pages, "host", "url", "text",
        max_hosts_per_hash=8, min_shared=3, min_share_ppm=500_000,
    )


SQL_MIRROR_HOSTS = """
WITH pages AS (
  SELECT source AS host, text FROM documents
  UNION ALL
  SELECT source || '.mirror' AS host, text FROM documents WHERE doc_id % 3 <> 2
  UNION ALL
  SELECT DISTINCT source AS host, 'About us and our mission statement' AS text
  FROM documents
  UNION ALL
  SELECT source || '.blog' AS host,
         CASE WHEN (doc_id // 20) % 8 = 0 THEN text
              ELSE 'original commentary on item ' || CAST(doc_id AS VARCHAR)
         END AS text
  FROM documents WHERE (doc_id // 20) % 8 = 0 OR (doc_id // 20) % 3 = 0),
hh AS (
  SELECT DISTINCT host,
         md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS body_hash
  FROM pages),
sizes AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_hashes FROM hh GROUP BY host),
bounded AS (
  SELECT hh.* FROM hh
  WHERE body_hash IN (
    SELECT body_hash FROM hh GROUP BY body_hash HAVING COUNT(*) <= 8)),
shared AS (
  SELECT a.host AS host_a, b.host AS host_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM bounded a JOIN bounded b ON a.body_hash = b.body_hash AND a.host < b.host
  GROUP BY a.host, b.host)
SELECT s.host_a, s.host_b, s.n_shared,
       s.n_shared * 1000000 // LEAST(sa.n_hashes, sb.n_hashes) AS share_ppm,
       (s.n_shared >= 3 AND
        s.n_shared * 1000000 // LEAST(sa.n_hashes, sb.n_hashes) >= 500000)
         AS is_mirror
FROM shared s
JOIN sizes sa ON s.host_a = sa.host
JOIN sizes sb ON s.host_b = sb.host
"""


def q_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical alias collapse (operators/extract.
    canonical_map/canonical_clusters): pages synthesized from
    documents — within-host ordinal%4==1 declares a root-relative
    canonical onto the previous ordinal's page, %4==2 declares an
    ABSOLUTE self-canonical with the href-before-rel attribute order,
    %4 in {0,3} carry no hint (implicit self).  Clusters of size 2
    (canonical + alias) and singletons both appear; resolution and
    both attribute orders exercised."""
    from biothings_crawler_spark.operators.extract import canonical_clusters

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    ordinal = (F.col("doc_id") / 20).cast("long")
    url = F.concat(F.lit("https://"), F.col("source"), F.lit("/p/"), i)
    link = (
        F.when(
            ordinal % 4 == 1,
            F.concat(F.lit('<link rel="canonical" href="/p/'),
                     (F.col("doc_id") - 20).cast("string"), F.lit('">')),
        )
        .when(
            ordinal % 4 == 2,
            F.concat(F.lit('<link href="https://'), F.col("source"),
                     F.lit("/p/"), i, F.lit('" rel="canonical">')),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><head>"), link, F.lit("</head><body><p>"),
        F.col("text"), F.lit("</p></body></html>"),
    )
    pages = d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))
    return canonical_clusters(pages)


SQL_CANONICAL_CLUSTERS = """
WITH d AS (
  SELECT doc_id, source, text, doc_id // 20 AS ord,
         'https://' || source || '/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
h AS (
  SELECT url,
         '<html><head>' ||
         CASE WHEN ord % 4 = 1
              THEN '<link rel="canonical" href="/p/'
                   || CAST(doc_id - 20 AS VARCHAR) || '">'
              WHEN ord % 4 = 2
              THEN '<link href="https://' || source || '/p/'
                   || CAST(doc_id AS VARCHAR) || '" rel="canonical">'
              ELSE '' END ||
         '</head><body><p>' || text || '</p></body></html>' AS t
  FROM d),
m AS (
  SELECT url,
         COALESCE(
           NULLIF(regexp_extract(t, '(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"', 1), ''),
           NULLIF(regexp_extract(t, '(?i)<link[^>]*href="([^"]*)"[^>]*rel="canonical"', 1), ''))
           AS href,
         regexp_extract(url, '^(https?://[^/]+)', 1) AS root
  FROM h),
r AS (
  SELECT url,
         CASE WHEN regexp_matches(href, '^https?://') THEN href
              WHEN href LIKE '/%' THEN root || href
              ELSE url END AS canonical_url
  FROM m)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(CAST(canonical_url <> url AS INT)) AS BIGINT) AS n_aliases,
       MAX(canonical_url = url) AS has_canonical_page
FROM r GROUP BY canonical_url
"""


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script-mix profile (operators/text.script_mix): docs
    salted by within-host ordinal — %5==1 appends a Cyrillic phrase
    (mixed), %5==2 replaces text with CJK (dominant flips), %5==3
    appends a short Arabic phrase, %5==4 plants Cyrillic HOMOGLYPHS
    inside a Latin word (the spoofing shape), %5==0 stays pure Latin.
    Oracle runs the identical literal codepoint-range regexes."""
    from biothings_crawler_spark.operators.text import script_mix

    d = _t(spark, sf_dir, "documents")
    o = (F.col("doc_id") / 20).cast("long") % 5
    body = (
        F.when(o == 1, F.concat(F.col("text"), F.lit(" Привет мир сегодня")))
        .when(o == 2, F.lit("你好世界 こんにちは 你好"))
        .when(o == 3, F.concat(F.col("text"), F.lit(" مرحبا")))
        .when(o == 4, F.concat(F.lit("pаypаl sеcurity alеrt "), F.col("text")))
        .otherwise(F.col("text"))
    )
    docs = d.select(F.col("doc_id").alias("id"), body.alias("text"))
    return script_mix(docs, "id", "text", mixed_ppm=5_000)


SQL_SCRIPT_MIX = """
WITH d AS (
  SELECT doc_id AS id,
         CASE (doc_id // 20) % 5
           WHEN 1 THEN text || ' Привет мир сегодня'
           WHEN 2 THEN '你好世界 こんにちは 你好'
           WHEN 3 THEN text || ' مرحبا'
           WHEN 4 THEN 'pаypаl sеcurity alеrt ' || text
           ELSE text END AS text
  FROM documents),
c AS (
  SELECT id,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
         CAST(length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g')) AS BIGINT) AS n_cyrillic,
         CAST(length(regexp_replace(text, '[^一-鿿぀-ヿ]', '', 'g')) AS BIGINT) AS n_cjk,
         CAST(length(regexp_replace(text, '[^؀-ۿ]', '', 'g')) AS BIGINT) AS n_arabic
  FROM d),
t AS (
  SELECT *, n_latin + n_cyrillic + n_cjk + n_arabic AS n_letters,
         GREATEST(n_latin, n_cyrillic, n_cjk, n_arabic) AS mx
  FROM c)
SELECT id, n_latin, n_cyrillic, n_cjk, n_arabic, n_letters,
       CASE WHEN n_letters = 0 THEN 'none'
            WHEN n_latin = mx THEN 'latin'
            WHEN n_cyrillic = mx THEN 'cyrillic'
            WHEN n_cjk = mx THEN 'cjk'
            ELSE 'arabic' END AS dominant_script,
       CASE WHEN n_letters = 0 THEN 0
            ELSE (n_letters - mx) * 1000000 // n_letters END AS mixed_ppm,
       CASE WHEN n_letters = 0 THEN FALSE
            ELSE (n_letters - mx) * 1000000 // n_letters >= 5000 END AS is_mixed
FROM t
"""


def q_template_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural template clustering (operators/traps.
    template_report): per host, ordinal%3 picks one of three CMS
    skeletons (text varies, tag sequence doesn't -> pages collide on
    the fingerprint and clear min_pages), while ordinal%7==0 pages get
    an ordinal-length run of spans (unique skeleton -> singleton,
    is_template False)."""
    from biothings_crawler_spark.operators.traps import template_report

    d = _t(spark, sf_dir, "documents")
    o = (F.col("doc_id") / 20).cast("long")
    body = F.col("text")
    html = (
        F.when(
            o % 7 == 0,
            F.concat(
                F.lit("<html><body>"),
                F.expr("repeat('<span class=\"x\">', CAST(doc_id div 20 AS INT) + 1)"),
                body, F.lit("</body></html>"),
            ),
        )
        .when(
            o % 3 == 0,
            F.concat(F.lit('<html><body><article><h1 class="t">'), body,
                     F.lit("</h1></article></body></html>")),
        )
        .when(
            o % 3 == 1,
            F.concat(F.lit("<html><body><ul><li>"), body,
                     F.lit("</li><li>x</li></ul></body></html>")),
        )
        .otherwise(
            F.concat(F.lit('<html><body><div id="m"><p>'), body,
                     F.lit("</p></div></body></html>")),
        )
    )
    pages = d.select(
        F.col("source").alias("host"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )
    return template_report(pages, "host", "url", "html", min_pages=3)


SQL_TEMPLATE_FPS = """
WITH d AS (
  SELECT doc_id, source, text, doc_id // 20 AS o FROM documents),
h AS (
  SELECT source AS host,
         CASE WHEN o % 7 = 0
              THEN '<html><body>' || repeat('<span class="x">', CAST(o AS INT) + 1)
                   || text || '</body></html>'
              WHEN o % 3 = 0
              THEN '<html><body><article><h1 class="t">' || text
                   || '</h1></article></body></html>'
              WHEN o % 3 = 1
              THEN '<html><body><ul><li>' || text
                   || '</li><li>x</li></ul></body></html>'
              ELSE '<html><body><div id="m"><p>' || text
                   || '</p></div></body></html>' END AS t
  FROM d),
fp AS (
  SELECT host,
         md5(array_to_string(regexp_extract_all(t, '<([a-z][a-z0-9]*)[^>]*>', 1), ','))
           AS template_fp
  FROM h),
per_fp AS (
  SELECT host, template_fp, CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM fp GROUP BY host, template_fp),
per_host AS (
  SELECT host, CAST(SUM(n_pages) AS BIGINT) AS host_pages
  FROM per_fp GROUP BY host)
SELECT f.host, f.template_fp, f.n_pages,
       f.n_pages * 1000000 // p.host_pages AS share_ppm,
       f.n_pages >= 3 AS is_template
FROM per_fp f JOIN per_host p ON f.host = p.host
"""


def q_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host latency percentiles from the 64-bin log2 histogram
    (operators/sketch.host_latency_quantiles): fetch latencies
    synthesized from events (host = user bucket, latency_us =
    floor(value*12345)); p50/p95/p99 are conservative upper bounds
    2^(bin+1)-1 — exact integer arithmetic end-to-end, DuckDB list
    fold twin."""
    from biothings_crawler_spark.operators.sketch import host_latency_quantiles

    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias("host"),
        F.floor(F.col("value") * 12345).cast("long").alias("latency_us"),
    )
    return host_latency_quantiles(fetches, "host", "latency_us")


SQL_LATENCY_QUANTILES = """
WITH f AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         GREATEST(CAST(floor(value * 12345) AS BIGINT), 1) AS v
  FROM events),
binned AS (
  SELECT host, CAST(length(bin(v)) - 1 AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM f GROUP BY host, CAST(length(bin(v)) - 1 AS BIGINT)),
per_host AS (
  SELECT host, CAST(SUM(n) AS BIGINT) AS n,
         list({'bin': bin, 'n': n} ORDER BY bin) AS bins
  FROM binned GROUP BY host),
q AS (
  -- field order matters: DuckDB list_reduce materializes the result
  -- struct field-by-field IN LITERAL ORDER and later fields see the
  -- already-updated accumulator, so 'cum' must come LAST or the
  -- quantile conditions read post-increment cum (off-by-one bin)
  SELECT host, n,
         list_reduce(
           list_prepend({'b50': CAST(-1 AS BIGINT), 'b95': CAST(-1 AS BIGINT),
                         'b99': CAST(-1 AS BIGINT), 'cum': CAST(0 AS BIGINT)},
                        list_transform(bins, s -> {'b50': s.bin, 'b95': s.bin,
                                                   'b99': s.bin, 'cum': s.n})),
           (acc, s) -> {
             'b50': CASE WHEN acc.b50 = -1 AND (acc.cum + s.cum) * 1000000 >= n * 500000
                         THEN s.b50 ELSE acc.b50 END,
             'b95': CASE WHEN acc.b95 = -1 AND (acc.cum + s.cum) * 1000000 >= n * 950000
                         THEN s.b95 ELSE acc.b95 END,
             'b99': CASE WHEN acc.b99 = -1 AND (acc.cum + s.cum) * 1000000 >= n * 990000
                         THEN s.b99 ELSE acc.b99 END,
             'cum': acc.cum + s.cum}) AS r
  FROM per_host)
SELECT host, n,
       (CAST(1 AS BIGINT) << CAST(r.b50 + 1 AS INT)) - 1 AS p50_us,
       (CAST(1 AS BIGINT) << CAST(r.b95 + 1 AS INT)) - 1 AS p95_us,
       (CAST(1 AS BIGINT) << CAST(r.b99 + 1 AS INT)) - 1 AS p99_us
FROM q
"""


def q_frontier_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Starvation-free frontier rounds (operators/politeness.
    apply_aging + defer_unselected + select_politely): round 1
    schedules even event_ids at priority 5 under budget 3/host; the
    deferred carry-over ages by 2 (effective 3) and must beat the
    round-2 arrivals at priority 4 — without aging the fresh URLs
    would starve the old frontier forever.  Output = both rounds'
    selections; oracle = the naive-window two-round simulation."""
    from biothings_crawler_spark.operators.politeness import (
        apply_aging,
        defer_unselected,
        select_politely,
    )

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias("host"),
        F.lpad(F.col("event_id").cast("string"), 12, "0").alias("url_canon"),
        F.col("event_id").alias("url_hash"),
        F.col("event_id"),
    )
    r1 = base.filter(F.col("event_id") % 2 == 0).withColumn(
        "priority", F.lit(5).cast("long")
    )
    budgets = spark.createDataFrame([], "host string, budget int")
    s1 = select_politely(r1, budgets, 3, salt_target=2000)
    deferred = defer_unselected(r1, s1)
    fresh = base.filter(F.col("event_id") % 2 == 1).withColumn(
        "priority", F.lit(4).cast("long")
    )
    r2 = apply_aging(deferred, boost_per_round=2).drop("wait_rounds").unionByName(
        fresh
    )
    s2 = select_politely(r2, budgets, 3, salt_target=2000)
    pick = lambda df, rnd: df.select(
        "event_id", "host",
        F.lit(rnd).cast("long").alias("round"),
        F.col("sched_rank").cast("long").alias("sched_rank"),
        F.col("priority").cast("long").alias("eff_priority"),
    )
    return pick(s1, 1).unionByName(pick(s2, 2))


SQL_FRONTIER_AGING = """
WITH base AS (
  SELECT 'h' || CAST(user_id % 50 AS VARCHAR) AS host, event_id
  FROM events),
r1 AS (
  SELECT host, event_id, 5 AS priority,
         row_number() OVER (PARTITION BY host ORDER BY event_id) AS rn
  FROM base WHERE event_id % 2 = 0),
s1 AS (SELECT host, event_id, priority, rn FROM r1 WHERE rn <= 3),
r2 AS (
  SELECT host, event_id, eff,
         row_number() OVER (PARTITION BY host ORDER BY eff, event_id) AS rn
  FROM (
    SELECT host, event_id, 3 AS eff FROM r1 WHERE rn > 3
    UNION ALL
    SELECT host, event_id, 4 AS eff FROM base WHERE event_id % 2 = 1)),
s2 AS (SELECT host, event_id, eff, rn FROM r2 WHERE rn <= 3)
SELECT event_id, host, CAST(1 AS BIGINT) AS round,
       CAST(rn AS BIGINT) AS sched_rank, CAST(priority AS BIGINT) AS eff_priority
FROM s1
UNION ALL
SELECT event_id, host, CAST(2 AS BIGINT), CAST(rn AS BIGINT), CAST(eff AS BIGINT)
FROM s2
"""


def q_robots_wildcards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 wildcard robots enforcement (operators/politeness.
    apply_robots_rfc): per-host rules allow=['/pub/', '/p/10'],
    disallow=['/p/*7$', '/p/1*', '/x'] over three synthetic paths per
    document — exercises the '*' run, the '$' end anchor, longest-
    rule precedence, and the equal-length tie going to allow
    ('/p/10...' matches both '/p/1*' and '/p/10' at length 5).
    Oracle: an INDEPENDENT plain-SQL formulation of the same rule
    table (LIKE prefixes + one anchored regex), not the engine's
    regex-compilation pipeline."""
    from biothings_crawler_spark.operators.politeness import apply_robots_rfc

    d = _t(spark, sf_dir, "documents")
    robots = d.select(F.col("source").alias("host")).distinct().select(
        "host",
        F.expr("array('/pub/', '/p/10')").alias("allow"),
        F.expr("array('/p/*7$', '/p/1*', '/x')").alias("disallow"),
    )
    i = F.col("doc_id").cast("string")
    frontier = d.select(
        F.col("source").alias("host"),
        F.explode(
            F.array(
                F.concat(F.lit("/p/"), i),
                F.concat(F.lit("/pub/"), i),
                F.concat(F.lit("/x"), (F.col("doc_id") % 10).cast("string")),
            )
        ).alias("path"),
    ).select(
        "host", F.concat(F.lit("https://"), F.col("host"), F.col("path")).alias("url_canon")
    )
    return apply_robots_rfc(frontier, robots).select("host", "url_canon")


SQL_ROBOTS_WILDCARDS = """
WITH fr AS (
  SELECT source AS host, p
  FROM documents,
       UNNEST(['/p/' || CAST(doc_id AS VARCHAR),
               '/pub/' || CAST(doc_id AS VARCHAR),
               '/x' || CAST(doc_id % 10 AS VARCHAR)]) AS u(p)),
scored AS (
  SELECT host, 'https://' || host || p AS url_canon,
         GREATEST(CASE WHEN regexp_matches(p, '^/p/.*7$') THEN 7 ELSE 0 END,
                  CASE WHEN p LIKE '/p/1%' THEN 5 ELSE 0 END,
                  CASE WHEN p LIKE '/x%' THEN 2 ELSE 0 END) AS dlen,
         GREATEST(CASE WHEN p LIKE '/pub/%' THEN 5 ELSE 0 END,
                  CASE WHEN p LIKE '/p/10%' THEN 5 ELSE 0 END) AS alen
  FROM fr)
SELECT host, url_canon FROM scored
WHERE NOT (dlen > alen AND dlen > 0)
"""


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric quote/scrape detection (operators/dedup.
    containment_pairs): within-host ordinal%9==1 documents append a
    FULL copy of the previous ordinal's text — the quoting pair has
    low Jaccard (the union is large) but containment 1e6 of the
    quoted doc, exactly the case the symmetric MinHash family can't
    flag.  Natural small overlaps in the corpus surface as unflagged
    pairs; oracle replicates the k=5 shingle pipeline."""
    from biothings_crawler_spark.operators.dedup import containment_pairs

    d = _t(spark, sf_dir, "documents")
    prev = d.select(
        (F.col("doc_id") + 20).alias("doc_id"), F.col("text").alias("prev_text")
    )
    o = (F.col("doc_id") / 20).cast("long")
    aug = d.join(prev, "doc_id", "left").select(
        F.col("doc_id").alias("id"),
        F.when(
            (o % 9 == 1) & F.col("prev_text").isNotNull(),
            F.concat(F.col("text"), F.lit(" "), F.col("prev_text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return containment_pairs(
        aug, "id", "text", k=5,
        max_docs_per_shingle=16, min_shared=2, min_containment_ppm=800_000,
    )


SQL_CONTAINMENT_PAIRS = """
WITH aug AS (
  SELECT d.doc_id AS id,
         CASE WHEN (d.doc_id // 20) % 9 = 1 AND p.text IS NOT NULL
              THEN d.text || ' ' || p.text ELSE d.text END AS text
  FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 20),
w AS (
  SELECT id,
         list_filter(
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
           x -> len(x) > 0) AS words
  FROM aug),
s AS (
  SELECT id,
         list_distinct(CASE WHEN len(words) >= 5
           THEN [array_to_string(words[j:j+4], ' ') for j in range(1, len(words) - 3)]
           ELSE [array_to_string(words, ' ')] END) AS shl
  FROM w),
sh AS (
  SELECT DISTINCT id, md5(u.s) AS sh FROM s, UNNEST(shl) AS u(s)),
sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY id),
bounded AS (
  SELECT sh.* FROM sh
  WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 16)),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM bounded a JOIN bounded b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id HAVING COUNT(*) >= 2)
SELECT s.id_a, s.id_b, s.n_shared,
       s.n_shared * 1000000 // LEAST(sa.n_sh, sb.n_sh) AS containment_ppm,
       s.n_shared * 1000000 // LEAST(sa.n_sh, sb.n_sh) >= 800000 AS is_contained
FROM shared s
JOIN sizes sa ON s.id_a = sa.id
JOIN sizes sb ON s.id_b = sb.id
"""


def q_relevance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focused-crawl frontier scoring (operators/frontier.
    relevance_scores): inlinks synthesized from documents — target
    paths carry the 'data'/'research' topic tokens for some ordinals,
    anchors are the target doc's first three words (which sometimes
    contain topic terms), multiple inlinks per target accumulate
    anchor evidence.  Exact integer scores; oracle replicates the
    tokenize-intersect-sum pipeline."""
    from biothings_crawler_spark.operators.frontier import relevance_scores

    d = _t(spark, sf_dir, "documents")
    o = (F.col("doc_id") / 20).cast("long")
    seg = (
        F.when(o % 4 == 0, F.lit("data"))
        .when(o % 4 == 1, F.lit("research"))
        .when(o % 4 == 2, F.lit("data-research"))
        .otherwise(F.lit("misc"))
    )
    target = F.concat(
        F.lit("https://"), F.col("source"), F.lit("/"), seg, F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    words = F.split(F.col("text"), " ")
    anchor = F.array_join(F.slice(words, 1, 3), " ")
    links = d.select(
        target.alias("target_url"), anchor.alias("anchor_text")
    ).unionByName(
        # second inlink for even ordinals: a topic-bearing anchor
        d.filter(o % 2 == 0).select(
            target.alias("target_url"),
            F.lit("open data portal").alias("anchor_text"),
        )
    )
    return relevance_scores(links, ["data", "research"])


SQL_RELEVANCE_SCORES = """
WITH d AS (
  SELECT doc_id, source, text, doc_id // 20 AS o,
         CASE (doc_id // 20) % 4
           WHEN 0 THEN 'data' WHEN 1 THEN 'research'
           WHEN 2 THEN 'data-research' ELSE 'misc' END AS seg
  FROM documents),
links AS (
  SELECT 'https://' || source || '/' || seg || '/' || CAST(doc_id AS VARCHAR)
           AS target_url,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS anchor_text
  FROM d
  UNION ALL
  SELECT 'https://' || source || '/' || seg || '/' || CAST(doc_id AS VARCHAR),
         'open data portal'
  FROM d WHERE o % 2 = 0),
tok AS (
  SELECT target_url, anchor_text,
         len(list_intersect(
           list_distinct(list_filter(
             string_split_regex(lower(anchor_text), '[^a-z0-9]+'), x -> len(x) > 0)),
           ['data', 'research'])) AS h
  FROM links),
anchor_side AS (
  SELECT target_url, CAST(SUM(h) AS BIGINT) AS anchor_hits
  FROM tok GROUP BY target_url),
url_side AS (
  SELECT DISTINCT target_url,
         CAST(len(list_intersect(
           list_distinct(list_filter(
             string_split_regex(lower(target_url), '[^a-z0-9]+'), x -> len(x) > 0)),
           ['data', 'research'])) AS BIGINT) AS url_hits
  FROM links)
SELECT u.target_url, u.url_hits, a.anchor_hits,
       u.url_hits * 2 + a.anchor_hits * 1 AS score
FROM url_side u JOIN anchor_side a ON u.target_url = a.target_url
"""


def q_adaptive_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed adaptive politeness plane (operators/politeness.
    adaptive_budgets = AIMD rate fold ∧ p95 latency bound): one fetch
    log (host, ts, status, latency) from events; budget = clamp(min(
    rate_rph*round/3600, round_us/p95_us), 1).  Both component
    operators are oracle-paired alone (q_aimd_rates,
    q_latency_quantiles); this pair verifies the COMPOSITION in one
    DuckDB statement."""
    from biothings_crawler_spark.operators.politeness import adaptive_budgets

    ev = _t(spark, sf_dir, "events")
    mix = (F.col("event_id") * F.lit(2654435761)) % 100
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias("host"),
        F.col("ts"),
        F.when(mix < 7, F.lit(429))
        .when(mix < 10, F.lit(503))
        .otherwise(F.lit(200))
        .alias("status"),
        F.floor(F.col("value") * 12345).cast("long").alias("latency_us"),
    )
    return adaptive_budgets(
        fetches, "host", "ts", "status", "latency_us",
        round_seconds=600, min_budget=1,
        base_rate_rph=60, min_rate_rph=6, max_rate_rph=3600, incr_rph=12,
    )


SQL_ADAPTIVE_BUDGETS = """
WITH f AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         epoch_us(ts) AS us,
         CASE WHEN (event_id * 2654435761) % 100 < 7 THEN 429
              WHEN (event_id * 2654435761) % 100 < 10 THEN 503
              ELSE 200 END AS status,
         GREATEST(CAST(floor(value * 12345) AS BIGINT), 1) AS v
  FROM events),
hourly AS (
  SELECT host, us - us % 3600000000 AS hour_us,
         MAX(CAST(status = 429 OR status >= 500 AS INT)) AS backoff
  FROM f GROUP BY host, us - us % 3600000000),
rates AS (
  SELECT host,
         list_reduce(
           list_prepend(CAST(60 AS BIGINT),
                        list_transform(list(backoff ORDER BY hour_us),
                                       c -> CAST(c AS BIGINT))),
           (acc, c) -> CASE WHEN c = 1 THEN GREATEST(CAST(6 AS BIGINT), acc // 2)
                            ELSE LEAST(CAST(3600 AS BIGINT), acc + 12) END)
           AS rate_rph
  FROM hourly GROUP BY host),
binned AS (
  SELECT host, CAST(length(bin(v)) - 1 AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM f GROUP BY host, CAST(length(bin(v)) - 1 AS BIGINT)),
ph AS (
  SELECT host, CAST(SUM(n) AS BIGINT) AS n,
         list({'bin': bin, 'n': n} ORDER BY bin) AS bins
  FROM binned GROUP BY host),
lat AS (
  -- running counter LAST: see SQL_LATENCY_QUANTILES field-order note
  SELECT host,
         (CAST(1 AS BIGINT) << CAST(
            list_reduce(
              list_prepend({'b': CAST(-1 AS BIGINT), 'cum': CAST(0 AS BIGINT)},
                           list_transform(bins, s -> {'b': s.bin, 'cum': s.n})),
              (acc, s) -> {
                'b': CASE WHEN acc.b = -1 AND (acc.cum + s.cum) * 1000000 >= n * 950000
                          THEN s.b ELSE acc.b END,
                'cum': acc.cum + s.cum}).b + 1 AS INT)) - 1 AS p95_us
  FROM ph)
SELECT r.host, r.rate_rph, l.p95_us,
       CAST(GREATEST(CAST(1 AS BIGINT),
                     LEAST(r.rate_rph * 600 // 3600,
                           CAST(600 AS BIGINT) * 1000000 // l.p95_us)) AS INT)
         AS budget
FROM rates r JOIN lat l ON r.host = l.host
"""


# Registry order: queries with no driver CORRECTNESS row yet for their
# CURRENT implementation (new this round, or rewritten since their last
# green row) come first, so the driver's first-50 sample covers them;
# the long-stable queries (green in earlier rounds, unchanged since)
# follow.
# ---------------------------------------------------------------------------
# round-4 session-4: oracle pairs for the engine-internal operators that
# landed with pytest only (gate window was full) + site-family collapse
# ---------------------------------------------------------------------------


def q_site_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive mirror collapse (operators/traps.site_families):
    mirror pairs -> connected components over HOSTS -> one family head
    per clone group.  Fixture = the q_mirror_hosts pages; expected
    families: {src_i, src_i.mirror} pairs, every .blog / lone host its
    own head.  Oracle: the mirror SQL feeding a recursive-CTE
    transitive closure (string hosts, lexicographic min label)."""
    from biothings_crawler_spark.operators.traps import site_families

    pages = _mirror_pages(spark, sf_dir)
    return site_families(
        pages, "host", "url", "text",
        max_hosts_per_hash=8, min_shared=3, min_share_ppm=500_000,
    )


SQL_SITE_FAMILIES = f"""
WITH RECURSIVE rep AS (SELECT * FROM ({SQL_MIRROR_HOSTS})),
hosts AS (
  SELECT DISTINCT source AS host FROM documents
  UNION
  SELECT DISTINCT source || '.mirror' FROM documents WHERE doc_id % 3 <> 2
  UNION
  SELECT DISTINCT source || '.blog' FROM documents
  WHERE (doc_id // 20) % 8 = 0 OR (doc_id // 20) % 3 = 0),
und AS (
  SELECT host_a AS a, host_b AS b FROM rep WHERE is_mirror
  UNION
  SELECT host_b, host_a FROM rep WHERE is_mirror),
reach(a, b) AS (
  SELECT host, host FROM hosts
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
SELECT a AS host, MIN(b) AS family, a = MIN(b) AS is_family_head
FROM reach GROUP BY a
"""


_HREFLANG_SQL_RE = (
    '(?i)<link[^>]*rel="alternate"[^>]*hreflang="([^"]*)"[^>]*href="([^"]*)"'
)


def q_hreflang_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang alternate extraction (operators/extract.hreflang_map):
    each page declares an absolute 'EN' self-variant (case-folded to
    'en'), a root-relative '/p{id}/de' variant (joined onto the page
    host), and — on doc_id%4==0 — an ftp: variant that must be DROPPED
    (neither absolute http(s) nor root-relative).  Oracle re-parses the
    same synthesized HTML with DuckDB's RE2 regexp_extract_all."""
    from biothings_crawler_spark.operators.extract import hreflang_map

    d = _t(spark, sf_dir, "documents")
    s = F.col("doc_id").cast("string")
    root = F.concat(F.lit("https://"), F.col("source"), F.lit(".example"))
    url = F.concat(root, F.lit("/p"), s)
    html = F.concat(
        F.lit('<html><head><link rel="alternate" hreflang="EN" href="'),
        url, F.lit('"/>'),
        F.lit('<link rel="alternate" hreflang="de" href="/p'), s,
        F.lit('/de"/>'),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit('<link rel="alternate" hreflang="fr" href="ftp://bad/x"/>'),
        ).otherwise(F.lit("")),
        F.lit("</head><body></body></html>"),
    )
    pages = d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))
    return hreflang_map(pages, "url", "html")


SQL_HREFLANG_MAP = f"""
WITH pages AS (
  SELECT 'https://' || source || '.example/p' || CAST(doc_id AS VARCHAR) AS url,
         '<html><head><link rel="alternate" hreflang="EN" href="https://'
           || source || '.example/p' || CAST(doc_id AS VARCHAR) || '"/>'
           || '<link rel="alternate" hreflang="de" href="/p'
           || CAST(doc_id AS VARCHAR) || '/de"/>'
           || CASE WHEN doc_id % 4 = 0
                THEN '<link rel="alternate" hreflang="fr" href="ftp://bad/x"/>'
                ELSE '' END
           || '</head><body></body></html>' AS html
  FROM documents),
m AS (
  SELECT url,
         regexp_extract(url, '^(https?://[^/]+)', 1) AS root,
         regexp_extract_all(html, '{_HREFLANG_SQL_RE}', 1) AS langs,
         regexp_extract_all(html, '{_HREFLANG_SQL_RE}', 2) AS hrefs
  FROM pages),
z AS (
  SELECT url, lower(p.l) AS lang,
         CASE WHEN regexp_matches(p.h, '^https?://') THEN p.h
              WHEN starts_with(p.h, '/') THEN root || p.h
              ELSE NULL END AS target_url
  FROM m, unnest(list_transform(range(len(langs)),
                                i -> {{'l': langs[i+1], 'h': hrefs[i+1]}})) AS u(p))
SELECT url, lang, target_url FROM z WHERE target_url IS NOT NULL
"""


def q_conditional_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-GET bandwidth accounting (operators/snapshot.
    conditional_fetch_report): fetch log synthesized from events (url =
    event_id%500, host = url%25, content hash = md5(url:event_type) so
    consecutive same-type fetches of a url are 'unchanged'); per-host
    recoverable bytes + waste_ppm.  Oracle = the same lag window +
    host agg in plain SQL."""
    from biothings_crawler_spark.operators.snapshot import (
        conditional_fetch_report,
    )

    ev = _t(spark, sf_dir, "events")
    u = F.concat(F.lit("u"), (F.col("event_id") % 500).cast("string"))
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("event_id") % 500 % 25).cast("string")
                 ).alias("host"),
        u.alias("url"),
        F.col("ts"),
        F.md5(F.concat_ws(":", u, F.col("event_type"))).alias("content_hash"),
        (F.lit(100) + F.col("event_id") % 900).cast("long").alias("size"),
        F.col("event_id"),
    )
    return conditional_fetch_report(
        fetches, "host", "url", "ts", "content_hash", "size", "event_id"
    )


SQL_CONDITIONAL_FETCH = """
WITH f AS (
  SELECT 'h' || CAST(event_id % 500 % 25 AS VARCHAR) AS host,
         'u' || CAST(event_id % 500 AS VARCHAR) AS url,
         ts,
         md5('u' || CAST(event_id % 500 AS VARCHAR) || ':' || event_type) AS h,
         CAST(100 + event_id % 900 AS BIGINT) AS size,
         event_id
  FROM events),
l AS (
  SELECT host, size,
         CASE WHEN lag(h) OVER w IS NOT NULL THEN 1 ELSE 0 END AS is_refetch,
         CASE WHEN lag(h) OVER w = h THEN 1 ELSE 0 END AS unchanged
  FROM f WINDOW w AS (PARTITION BY url ORDER BY ts, event_id))
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(SUM(is_refetch) AS BIGINT) AS n_refetches,
       CAST(SUM(unchanged) AS BIGINT) AS n_unchanged,
       CAST(SUM(size * unchanged) AS BIGINT) AS bytes_unchanged,
       CAST(CASE WHEN SUM(size * is_refetch) = 0 THEN 0
            ELSE SUM(size * unchanged) * 1000000 // SUM(size * is_refetch)
            END AS BIGINT) AS waste_ppm
FROM l GROUP BY host
"""


def q_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional sampling (operators/sampling.
    quality_weighted_sample): keep probability = 0.9 * score_ppm/1e6,
    decision = exact integer compare of md5-u60 against score*threshold
    (128-bit product) — the oracle verifies every individual keep/drop
    DECISION, not the rate."""
    from biothings_crawler_spark.operators.sampling import (
        quality_weighted_sample,
    )

    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        F.col("doc_id").alias("id"),
        ((F.col("n_chars") * 7919) % 1000001).cast("long").alias("score_ppm"),
    )
    return quality_weighted_sample(docs, "id", "score_ppm",
                                   base_rate=0.9, seed="qw1")


def _sql_quality_sample() -> str:
    from biothings_crawler_spark.operators.sampling import rate_threshold

    thr = rate_threshold(0.9)
    u60 = _SQL_HASH60.format(w="'qw1:' || CAST(id AS VARCHAR)")
    return f"""
WITH docs AS (
  SELECT doc_id AS id,
         CAST((n_chars * 7919) % 1000001 AS BIGINT) AS score_ppm
  FROM documents)
SELECT id, score_ppm FROM docs
WHERE CAST({u60} AS HUGEINT) * 1000000
      < CAST(score_ppm AS HUGEINT) * {thr}
"""


SQL_QUALITY_SAMPLE = _sql_quality_sample()


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection (operators/sampling.
    select_token_budget): take documents in (score desc, id) order
    until 40% of total tokens is spent.  The operator's banded
    two-level plan (band totals -> bounded band window -> one boundary
    band's per-doc window) must equal the oracle's naive global
    running-sum prefix exactly, cum_tokens included."""
    from biothings_crawler_spark.operators.sampling import select_token_budget

    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        F.col("doc_id").alias("id"),
        (F.lit(1) + F.col("n_chars") % 50).cast("long").alias("tokens"),
        ((F.col("doc_id") * 37) % 101).cast("long").alias("score_ppm"),
    )
    total = docs.agg(F.sum("tokens").cast("long")).collect()[0][0]
    budget = total * 2 // 5
    out = select_token_budget(docs, "id", "tokens", "score_ppm", budget)
    return out.select("id", "tokens", "score_ppm",
                      F.col("cum_tokens").cast("long").alias("cum_tokens"))


SQL_TOKEN_BUDGET = """
WITH docs AS (
  SELECT doc_id AS id,
         CAST(1 + n_chars % 50 AS BIGINT) AS tokens,
         CAST((doc_id * 37) % 101 AS BIGINT) AS score_ppm
  FROM documents),
tot AS (SELECT SUM(tokens) * 2 // 5 AS b FROM docs),
r AS (
  SELECT id, tokens, score_ppm,
         SUM(tokens) OVER (ORDER BY score_ppm DESC, id) AS cum
  FROM docs)
SELECT id, tokens, score_ppm, CAST(cum AS BIGINT) AS cum_tokens
FROM r, tot WHERE cum <= b
"""


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup (operators/dedup.incremental_neardup): the
    full documents table is the already-indexed corpus; the increment
    is every doc_id%5==0 document re-fetched with an appended tail
    (id + 10M).  Each increment doc must collide with its source via
    the persisted band index and clear the signature-agreement
    estimate WITHOUT re-reading corpus text.  Oracle rebuilds both
    sides' affine-family signatures and replicates the band join +
    min-winner in SQL — all integer."""
    from biothings_crawler_spark.operators.dedup import (
        incremental_neardup,
        minhash_index,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.select(F.col("doc_id").alias("id"), "text")
    inc = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("id"),
        F.concat(F.col("text"), F.lit(" appended tail marker")).alias("text"),
    )
    idx = minhash_index(corpus, "id", "text", k=3, n_perm=16, bands=4)
    pairs, _updated = incremental_neardup(
        inc, idx, "id", "text", k=3, n_perm=16, bands=4,
        min_est_ppm=500_000,
    )
    return pairs


SQL_INCREMENTAL_NEARDUP = f"""
WITH docs AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS id, text || ' appended tail marker' AS text
  FROM documents WHERE doc_id % 5 = 0),
w AS (
  SELECT id,
         list_filter(
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),
           x -> len(x) > 0) AS words
  FROM docs),
s AS (
  SELECT id,
         list_distinct(CASE WHEN len(words) >= 3
           THEN [array_to_string(words[j:j+2], ' ') for j in range(1, len(words) - 1)]
           ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w),
hv AS (
  SELECT id, list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT
                                     % {_MH_P}) AS hv
  FROM s),
sig AS (
  SELECT id,
         [list_min(list_transform(hv, h -> ([{_MH_A16}][j+1] * h
                                            + [{_MH_B16}][j+1]) % {_MH_P}))
          for j in range(16)] AS sig
  FROM hv),
banded AS (
  SELECT id, b AS band_id,
         array_to_string(list_transform(sig[b*4+1:b*4+4],
                                        v -> CAST(v AS VARCHAR)), '|') AS band_key,
         sig
  FROM sig, unnest(range(4)) AS u(b)),
newb AS (SELECT * FROM banded WHERE id >= 10000000),
cands AS (
  SELECT DISTINCT n.id, o.id AS old_id, n.sig AS nsig, o.sig AS osig
  FROM newb n
  JOIN banded o ON n.band_id = o.band_id AND n.band_key = o.band_key
  WHERE o.id < n.id),
scored AS (
  SELECT id, old_id,
         CAST(list_sum(list_transform(range(16),
                j -> CASE WHEN nsig[j+1] = osig[j+1] THEN 1 ELSE 0 END))
              * 1000000 // 16 AS BIGINT) AS est
  FROM cands)
SELECT id AS new_id, MIN(old_id) AS dup_of,
       arg_min(est, old_id) AS est_jaccard_ppm
FROM scored WHERE est >= 500000 GROUP BY id
"""


def q_hist_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram mergeability (operators/sketch.
    merge_latency_histograms): two per-shard log2 latency histograms
    (events split by event_id parity) merged with one (host, bin) agg
    must equal the histogram of the WHOLE fetch log — the contract
    that lets crawl shards fold sketches without raw rows.  Oracle
    bins the full log directly."""
    from biothings_crawler_spark.operators.sketch import (
        latency_histogram,
        merge_latency_histograms,
    )

    ev = _t(spark, sf_dir, "events")
    f = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")
                 ).alias("host"),
        F.floor(F.col("value") * 12345).cast("long").alias("latency_us"),
        F.col("event_id"),
    )
    a = latency_histogram(f.filter(F.col("event_id") % 2 == 0),
                          "host", "latency_us")
    b = latency_histogram(f.filter(F.col("event_id") % 2 == 1),
                          "host", "latency_us")
    return merge_latency_histograms(a, b)


SQL_HIST_MERGE = """
WITH f AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         GREATEST(CAST(floor(value * 12345) AS BIGINT), 1) AS v
  FROM events)
SELECT host, CAST(length(bin(v)) - 1 AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM f GROUP BY 1, 2
"""


def q_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (operators/multimodal.decode_wav_features):
    worker-side mapInPandas synthesizes an actual RIFF/PCM WAV per
    doc_id (stdlib wave codec), a second mapInPandas stage parses the
    container bytes back and emits exact-integer features.  The oracle
    never sees the bytes — it recomputes every feature from the
    generator's closed-form sample formula, so a Spark-side parse bug
    (header offsets, channel interleave, sample width) cannot cancel
    out.  Ids divisible by 30 emit an 8-bit PCM container — the
    out-of-scope lane that must land in ``decode_err`` with NULL
    features while the stage completes."""
    from biothings_crawler_spark.operators.multimodal import (
        decode_wav_features,
        gen_wav_media,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    media = gen_wav_media(ids, "doc_id", malformed_every=30)
    return decode_wav_features(media)


SQL_WAV_DECODE = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 30 = 0 AS bad, 1 + doc_id % 2 AS c,
         800 + (doc_id % 5) * 160 AS n
  FROM documents WHERE doc_id % 10 = 0),
s AS (
  SELECT media_id, bad, c, n,
         list_transform(range(n * c),
                        j -> ((media_id * 31 + j * 7) % 2001) - 1000) AS xs
  FROM m)
SELECT media_id,
       CASE WHEN bad THEN NULL ELSE CAST(8000 AS BIGINT) END AS sample_rate,
       CASE WHEN bad THEN NULL ELSE CAST(c AS BIGINT) END AS n_channels,
       CASE WHEN bad THEN NULL ELSE CAST(n AS BIGINT) END AS n_samples,
       CASE WHEN bad THEN NULL
            ELSE CAST(n * 1000000 // 8000 AS BIGINT) END AS duration_us,
       CASE WHEN bad THEN NULL
            ELSE CAST(list_sum(list_transform(xs, x -> x * x)) AS BIGINT)
            END AS sum_sq,
       CASE WHEN bad THEN NULL
            ELSE CAST(list_max(list_transform(xs, x -> abs(x))) AS BIGINT)
            END AS peak_abs,
       CASE WHEN bad THEN 'only 16-bit PCM supported, got sampwidth=1'
            ELSE NULL END AS decode_err
FROM s
"""


SHARD_FROM, SHARD_TO = 8, 12


def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous shard rebalance (operators/sharding.
    shard_rebalance_report): URL keys from documents, owners computed
    for 8 and for 12 shards in one row-local projection; the report
    shows exactly which (old, new) owner pairs exist.  HRW property
    under growth: every moved key lands on a NEW shard (id >= 8) —
    the oracle recomputes each placement with arg_max over the same
    md5-u60 hashes."""
    from biothings_crawler_spark.operators.sharding import (
        shard_rebalance_report,
    )

    d = _t(spark, sf_dir, "documents")
    keys = d.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 97).cast("string"),
                 F.lit(".example/p/"), F.col("doc_id").cast("string")
                 ).alias("url")
    )
    return shard_rebalance_report(keys, "url", SHARD_FROM, SHARD_TO, salt="sh")


SQL_SHARD_REBALANCE = f"""
WITH k AS (
  SELECT 'https://h' || CAST(doc_id % 97 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
h AS (
  SELECT url, s,
         CAST(('0x' || substr(md5('sh' || CAST(s AS VARCHAR) || ':' || url),
                              1, 15)) AS BIGINT) AS hv
  FROM k, unnest(range({SHARD_TO})) AS u(s)),
w AS (
  SELECT url,
         arg_max(CASE WHEN s < {SHARD_FROM} THEN s END,
                 CASE WHEN s < {SHARD_FROM} THEN hv END) AS shard_from,
         arg_max(s, hv) AS shard_to
  FROM h GROUP BY url)
SELECT CAST(shard_from AS BIGINT) AS shard_from,
       CAST(shard_to AS BIGINT) AS shard_to,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       shard_from <> shard_to AS moved
FROM w GROUP BY shard_from, shard_to
"""


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded TrustRank (operators/pagerank.trustrank) over the same
    deterministic hub graph as q_pagerank, teleport restricted to
    nodes divisible by 13 — unreachable-from-seed neighborhoods must
    end at exactly rank 0 (integer arithmetic, no float residue).
    Oracle = fixed-iteration SQL recursion with the seed-gated base
    term."""
    from biothings_crawler_spark.operators.pagerank import trustrank

    d = _t(spark, sf_dir, "documents")
    e = (
        d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 3").alias("dst"))
        .union(
            d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 7").alias("dst"))
        )
        .distinct()
        .filter(F.col("src") != F.col("dst"))
    )
    seeds = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 13 == 0)
    )
    return trustrank(e, seeds, iters=PR_ITERS)


def _sql_trustrank() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    base = 15 * PR_SCALE // 100
    ctes = [
        """
e AS (
  SELECT src, dst FROM (
    SELECT doc_id AS src, doc_id // 3 AS dst FROM documents
    UNION
    SELECT doc_id AS src, doc_id // 7 AS dst FROM documents)
  WHERE src <> dst),
nodes AS (SELECT DISTINCT node,
                 CASE WHEN node % 13 = 0 THEN 1 ELSE 0 END AS is_seed
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)""",
        f"r0 AS (SELECT node, is_seed, CAST(is_seed * {PR_SCALE} AS BIGINT) "
        "AS rank FROM nodes)",
    ]
    for i in range(PR_ITERS):
        ctes.append(f"""
r{i + 1} AS (
  SELECT n.node, n.is_seed,
         CAST(n.is_seed * {base} + coalesce(s.in_sum, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * r.rank) // (100 * d.deg)) AS in_sum
    FROM e JOIN deg d USING (src) JOIN r{i} r ON r.node = e.src
    GROUP BY e.dst) s USING (node))""")
    return "WITH " + ",".join(ctes) + f"\nSELECT node, rank FROM r{PR_ITERS}"


SQL_TRUSTRANK = _sql_trustrank()


def q_postings_varint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-gap + varint storage accounting for the chunked inverted
    index (operators/bm25.postings_compression_report, chunk_range 64
    to match q_postings_chunks): exact LEB128 byte counts per (term,
    chunk) vs 12-byte raw postings.  Oracle recomputes gaps and varint
    lengths with DuckDB list folds over the same bin()-length
    arithmetic."""
    from biothings_crawler_spark.operators.bm25 import (
        inverted_postings,
        postings_compression_report,
    )

    d = _t(spark, sf_dir, "documents")
    return postings_compression_report(
        inverted_postings(d, "doc_id", "text"), chunk_range=64
    )


SQL_POSTINGS_VARINT = f"""
WITH tf AS (
  SELECT term, id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents)
  GROUP BY term, id),
ch AS (
  SELECT term, id // 64 AS chunk_no,
         list({{'id': id, 'tf': tf}} ORDER BY id) AS ps
  FROM tf GROUP BY term, id // 64),
g AS (
  SELECT term, chunk_no, ps,
         [ps[i].id - CASE WHEN i = 1 THEN chunk_no * 64
                          ELSE ps[i-1].id END
          for i in range(1, len(ps) + 1)] AS gaps
  FROM ch)
SELECT term, chunk_no,
       CAST(len(ps) AS BIGINT) AS df_chunk,
       CAST(len(ps) * 12 AS BIGINT) AS raw_bytes,
       CAST(list_sum(list_transform(gaps, x -> (length(bin(x)) + 6) // 7))
            + list_sum(list_transform(ps, s -> (length(bin(s.tf)) + 6) // 7))
            AS BIGINT) AS packed_bytes,
       CAST((len(ps) * 12
             - (list_sum(list_transform(gaps, x -> (length(bin(x)) + 6) // 7))
                + list_sum(list_transform(ps, s -> (length(bin(s.tf)) + 6) // 7))))
            * 1000000 // (len(ps) * 12) AS BIGINT) AS savings_ppm
FROM g
"""


PROBE_TERMS = ("table", "spark", "hash")


def q_sharded_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING index round-trip (operators/bm25.
    write_postings_index + probe_postings): chunked postings written
    partitioned by the term's rendezvous shard, then a 3-term query
    probed back through the on-disk layout with a driver-computed
    static shard filter — the scan touches at most 3 of 16 shard
    directories.  Result must equal the unsharded chunk table filtered
    to the query terms (the oracle), proving the layout loses
    nothing."""
    from biothings_crawler_spark.operators.bm25 import (
        inverted_postings,
        postings_chunks,
        probe_postings,
        write_postings_index,
    )

    d = _t(spark, sf_dir, "documents")
    chunks = postings_chunks(inverted_postings(d, "doc_id", "text"),
                             chunk_range=64)
    path = _scratch_index_path("postings", sf_dir)
    write_postings_index(chunks, path, n_shards=16, salt="ix")
    return probe_postings(spark, path, list(PROBE_TERMS), n_shards=16,
                          salt="ix")


SQL_SHARDED_POSTINGS = (
    SQL_POSTINGS_CHUNKS.rstrip()
    + "\nHAVING term IN ('table', 'spark', 'hash')\n"
)


def q_compact_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown compaction (operators/bm25.compact_index): purge two
    whole sources (src3, src7 — a host-level takedown) from the
    chunked serving index by re-aggregating ONLY the (term, chunk)
    groups that contained their postings; untouched chunk rows pass
    through by anti-join.  Oracle = the index rebuilt from scratch
    without the purged docs — the incremental path must equal it
    exactly, chunk strings included."""
    from biothings_crawler_spark.operators.bm25 import (
        compact_index,
        inverted_postings,
        postings_chunks,
    )

    d = _t(spark, sf_dir, "documents")
    postings = inverted_postings(d, "doc_id", "text")
    chunks = postings_chunks(postings, chunk_range=64)
    dels = d.filter(F.col("source").isin("src3", "src7")).select(
        F.col("doc_id").alias("id")
    )
    return compact_index(postings, chunks, dels, id_col="id", chunk_range=64)


SQL_COMPACT_INDEX = f"""
WITH tf AS (
  SELECT term, id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents
    WHERE source NOT IN ('src3', 'src7'))
  GROUP BY term, id)
SELECT term, id // 64 AS chunk_no, CAST(COUNT(*) AS BIGINT) AS df_chunk,
       array_to_string(
         list(CAST(id AS VARCHAR) || ':' || CAST(tf AS VARCHAR) ORDER BY id),
         ' ') AS postings
FROM tf GROUP BY term, id // 64
"""


def q_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT/CDX canonical sort keys (urlnorm.surt_key_col): archive-
    convention keys over a URL mix exercising subdomain reversal, www
    strip, port-bearing authority, missing path, query retention, and
    a non-URL (null key).  Oracle rebuilds the key with DuckDB string/
    list ops — independent of the Spark expression chain."""
    from biothings_crawler_spark.urlnorm import surt_key_col

    d = _t(spark, sf_dir, "documents")
    s = F.col("doc_id").cast("string")
    url = (
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit("https://www."), F.col("source"),
                        F.lit(".example.org/a/"), s, F.lit("?x=1&y=2")))
        .when(F.col("doc_id") % 7 == 1,
              F.concat(F.lit("http://news."), F.col("source"),
                       F.lit(".example.org:8080/p/"), s))
        .when(F.col("doc_id") % 7 == 2,
              F.concat(F.lit("https://"), F.col("source"), F.lit(".example.org")))
        .when(F.col("doc_id") % 7 == 3, F.lit("not a url"))
        .otherwise(F.concat(F.lit("https://"), F.col("source"),
                            F.lit(".example.org/"), s))
    )
    return d.select(
        F.col("doc_id"), url.alias("url"), surt_key_col(url).alias("surt")
    )


SQL_SURT_KEYS = """
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 7
           WHEN 0 THEN 'https://www.' || source || '.example.org/a/'
                       || CAST(doc_id AS VARCHAR) || '?x=1&y=2'
           WHEN 1 THEN 'http://news.' || source || '.example.org:8080/p/'
                       || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN 'https://' || source || '.example.org'
           WHEN 3 THEN 'not a url'
           ELSE 'https://' || source || '.example.org/'
                || CAST(doc_id AS VARCHAR)
         END AS url
  FROM documents),
p AS (
  SELECT doc_id, url,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)', 1) AS host,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*\\?([^#]*)', 1) AS query
  FROM u)
SELECT doc_id, url,
       CASE WHEN NOT regexp_matches(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
            THEN NULL
            ELSE array_to_string(
                   list_reverse(string_split(
                     CASE WHEN starts_with(host, 'www.')
                          THEN substr(host, 5) ELSE host END, '.')), ',')
                 || ')'
                 || CASE WHEN path = '' THEN '/' ELSE path END
                 || CASE WHEN query = '' THEN '' ELSE '?' || query END
       END AS surt
FROM p
"""


def q_politeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-request politeness audit (operators/politeness.
    politeness_audit): fetch log from events (host = user bucket),
    per-host crawl delays from a derived table (half the hosts listed,
    the rest on the 1 s default); gaps vs delay through one lag
    window.  Oracle = the same lag + epoch arithmetic in SQL."""
    from biothings_crawler_spark.operators.politeness import politeness_audit

    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 30).cast("string")
                 ).alias("host"),
        F.col("ts"), F.col("event_id"),
    )
    hosts = spark.range(0, 15).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        ((F.col("id") % 5 + 1) * 250_000).cast("long").alias("crawl_delay_us"),
    )
    return politeness_audit(fetches, "host", "ts", hosts, "event_id")


SQL_POLITENESS_AUDIT = """
WITH f AS (
  SELECT 'h' || CAST(user_id % 30 AS VARCHAR) AS host, ts, event_id
  FROM events),
d AS (
  SELECT 'h' || CAST(i AS VARCHAR) AS host,
         CAST((i % 5 + 1) * 250000 AS BIGINT) AS crawl_delay_us
  FROM unnest(range(15)) AS t(i)),
g AS (
  SELECT f.host,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY f.host ORDER BY ts, event_id) AS gap_us,
         COALESCE(d.crawl_delay_us, 1000000) AS delay_us
  FROM f LEFT JOIN d ON f.host = d.host)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN gap_us < delay_us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(CASE WHEN COUNT(gap_us) = 0 THEN 0 ELSE
            SUM(CASE WHEN gap_us < delay_us THEN 1 ELSE 0 END) * 1000000
            // COUNT(gap_us) END AS BIGINT) AS violation_ppm
FROM g GROUP BY host
"""


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX archive index (sources/cdx.cdx_index): synthetic WARC
    records (the q_warc_ingest family, plus a file assignment
    ``warc-<doc_id%8>`` and writer sequence number) -> one CDX row per
    response record with a Target-URI.  Offsets are per-file running
    sums over ALL records — requests and torn records occupy bytes
    even though they emit no lines.  Oracle rebuilds record bytes,
    header/payload split, byte-counted offsets, SURT, and md5 digest
    independently in DuckDB."""
    from biothings_crawler_spark.sources.cdx import cdx_index

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    wtype = F.when(F.col("doc_id") % 7 == 3, F.lit("request")).otherwise(
        F.lit("response")
    )
    date = F.concat(
        F.lit("2026-08-"),
        F.lpad((F.lit(1) + F.col("doc_id") % 28).cast("string"), 2, "0"),
        F.lit("T"),
        F.lpad((F.col("doc_id") % 24).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((F.col("doc_id") * 7 % 60).cast("string"), 2, "0"),
        F.lit("Z"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body>"),
        F.col("text"), F.lit("</body></html>"),
    )
    uri_line = F.when(
        F.col("doc_id") % 13 == 6, F.lit("")
    ).otherwise(F.concat(
        F.lit("WARC-Target-URI: https://site"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.org/page/"), i, F.lit("\r\n"),
    ))
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: "), wtype, F.lit("\r\n"),
        uri_line,
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit("Content-Length: "), F.length(http).cast("string"), F.lit("\r\n"),
        F.lit("\r\n"), http,
    )
    recs = d.select(
        F.concat(F.lit("warc-"), (F.col("doc_id") % 8).cast("string")
                 ).alias("warc_file"),
        F.col("doc_id").alias("pos"),
        F.encode(record, "utf-8").alias("record"),
    )
    return cdx_index(recs)


SQL_CDX_INDEX = r"""
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 7 = 3 THEN 'request' ELSE 'response' END AS wtype,
         '2026-08-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
           || 'T' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST(doc_id * 7 % 60 AS VARCHAR), 2, '0') || 'Z' AS dt,
         'HTTP/1.1 200 OK' || chr(13) || chr(10) || 'Content-Type: text/html'
           || chr(13) || chr(10) || chr(13) || chr(10)
           || '<html><body>' || text || '</body></html>' AS http,
         CASE WHEN doc_id % 13 = 6 THEN ''
              ELSE 'WARC-Target-URI: https://site' || CAST(doc_id % 5 AS VARCHAR)
                   || '.example.org/page/' || CAST(doc_id AS VARCHAR)
                   || chr(13) || chr(10) END AS uri_line
  FROM documents),
rec AS (
  SELECT 'warc-' || CAST(doc_id % 8 AS VARCHAR) AS warc_file, doc_id AS pos,
         'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: ' || wtype
         || chr(13) || chr(10) || uri_line
         || 'WARC-Date: ' || dt || chr(13) || chr(10)
         || 'Content-Length: ' || CAST(length(http) AS VARCHAR)
         || chr(13) || chr(10) || chr(13) || chr(10) || http AS t
  FROM d),
sized AS (
  SELECT *, octet_length(encode(t)) + 4 AS len FROM rec),
off AS (
  SELECT *, SUM(len) OVER (PARTITION BY warc_file ORDER BY pos) - len AS off
  FROM sized),
p AS (
  SELECT warc_file, len, off,
         regexp_extract(t, '(?s)^(.*?)\r\n\r\n', 1) AS hdr,
         regexp_replace(t, '(?s)^.*?\r\n\r\n', '') AS payload
  FROM off),
x AS (
  SELECT warc_file, len, off, payload,
         nullif(regexp_extract(hdr, '(?m)^WARC-Type: ([^\r\n]+)', 1), '')
           AS warc_type,
         nullif(regexp_extract(hdr, '(?m)^WARC-Target-URI: ([^\r\n]+)', 1), '')
           AS url,
         regexp_extract(hdr, '(?m)^WARC-Date: ([^\r\n]+)', 1) AS warc_date
  FROM p),
h AS (
  SELECT *,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)', 1) AS host,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)
           AS path
  FROM x WHERE warc_type = 'response' AND url IS NOT NULL)
SELECT array_to_string(list_reverse(string_split(
         CASE WHEN starts_with(host, 'www.') THEN substr(host, 5) ELSE host END,
         '.')), ',')
       || ')' || CASE WHEN path = '' THEN '/' ELSE path END AS surt,
       regexp_replace(warc_date, '[^0-9]', '', 'g') AS ts14,
       url,
       nullif(regexp_extract(payload, '(?m)^Content-Type: ([^;\r\n]+)', 1), '')
         AS mime,
       nullif(regexp_extract(payload, '^HTTP/[0-9.]+ ([0-9]{3})', 1), '')
         AS status,
       md5(payload) AS digest,
       CAST(len AS INTEGER) AS length,
       CAST(off AS BIGINT) AS offset,
       warc_file
FROM h
"""


def q_etld1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain extraction (urlnorm.etld1_col): eTLD+1 per
    the public-suffix rule over a host mix exercising multi-label
    ccTLD registries (co.uk, ac.jp, com.au), plain gTLDs, deep
    subdomains, a bare public suffix (null), and a single label
    (null).  Oracle re-derives the rule with DuckDB list slicing —
    independent of the Spark substring_index chain."""
    from biothings_crawler_spark.urlnorm import etld1_col

    d = _t(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 8 == 0,
               F.concat(F.lit("www."), F.col("source"), F.lit(".example.co.uk")))
        .when(F.col("doc_id") % 8 == 1, F.concat(F.col("source"), F.lit(".com")))
        .when(F.col("doc_id") % 8 == 2,
              F.concat(F.lit("a.b."), F.col("source"), F.lit(".ac.jp")))
        .when(F.col("doc_id") % 8 == 3, F.lit("co.uk"))
        .when(F.col("doc_id") % 8 == 4, F.lit("localhost"))
        .when(F.col("doc_id") % 8 == 5, F.concat(F.col("source"), F.lit(".co.uk")))
        .when(F.col("doc_id") % 8 == 6,
              F.concat(F.lit("news."), F.col("source"), F.lit(".org")))
        .otherwise(F.concat(F.lit("x.y.z."), F.col("source"), F.lit(".com.au")))
    )
    return d.select(
        F.col("doc_id"), host.alias("host"), etld1_col(host).alias("etld1")
    )


_SQL_PSL = ("'ac.jp','ac.uk','co.in','co.jp','co.kr','co.nz','co.uk','co.za',"
            "'com.ar','com.au','com.br','com.cn','com.mx','com.sg','com.tr',"
            "'com.tw','edu.au','gov.uk','ne.jp','net.au','nhs.uk','or.jp',"
            "'org.au','org.uk'")

SQL_ETLD1 = f"""
WITH h AS (
  SELECT doc_id,
         CASE doc_id % 8
           WHEN 0 THEN 'www.' || source || '.example.co.uk'
           WHEN 1 THEN source || '.com'
           WHEN 2 THEN 'a.b.' || source || '.ac.jp'
           WHEN 3 THEN 'co.uk'
           WHEN 4 THEN 'localhost'
           WHEN 5 THEN source || '.co.uk'
           WHEN 6 THEN 'news.' || source || '.org'
           ELSE 'x.y.z.' || source || '.com.au'
         END AS host
  FROM documents),
t AS (
  SELECT doc_id, host, len(l) AS n,
         array_to_string(l[-2:], '.') AS last2,
         array_to_string(l[-3:], '.') AS last3
  FROM (SELECT doc_id, host, string_split(host, '.') AS l FROM h))
SELECT doc_id, host,
       CASE WHEN n >= 3 THEN
              CASE WHEN last2 IN ({_SQL_PSL}) THEN last3 ELSE last2 END
            WHEN n = 2 AND last2 NOT IN ({_SQL_PSL}) THEN last2
            ELSE NULL END AS etld1
FROM t
"""


def q_cdx_revisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archival identical-digest dedup (sources/cdx.cdx_revisits):
    three capture snapshots per document with a version matrix
    covering stable (0,0,0), changed-once (0,1,1), REVERTED (0,1,0 —
    the any-prior-not-just-consecutive case), and always-changing
    (0,1,2) histories.  Oracle = the same row_number/first_value
    window in SQL."""
    from biothings_crawler_spark.sources.cdx import cdx_revisits

    d = _t(spark, sf_dir, "documents")
    snaps = d.select("doc_id", "text", F.explode(F.array(
        F.lit(0), F.lit(1), F.lit(2))).alias("snap"))
    m = F.col("doc_id") % 4
    version = (
        F.when(m == 0, F.lit(0))
        .when(m == 1, F.least(F.col("snap"), F.lit(1)))
        .when(m == 2, F.col("snap") % 2)
        .otherwise(F.col("snap"))
    )
    i = F.col("doc_id").cast("string")
    caps = snaps.select(
        F.concat(F.lit("org,example,site"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(")/page/"), i).alias("surt"),
        F.concat(F.lit("202608"),
                 F.lpad((F.col("snap") + 1).cast("string"), 2, "0"),
                 F.lit("120000")).alias("ts14"),
        F.concat(F.lit("https://site"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example.org/page/"), i).alias("url"),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("#"),
                                version.cast("string")), "utf-8")
              ).alias("digest"),
        (F.length("text") + 100).alias("length"),
        (F.col("doc_id") * 1000 + F.col("snap")).alias("offset"),
        F.concat(F.lit("warc-"), F.col("snap").cast("string")
                 ).alias("warc_file"),
    )
    return cdx_revisits(caps)


SQL_CDX_REVISITS = """
WITH caps AS (
  SELECT 'org,example,site' || CAST(doc_id % 5 AS VARCHAR) || ')/page/'
           || CAST(doc_id AS VARCHAR) AS surt,
         '202608' || lpad(CAST(s.snap + 1 AS VARCHAR), 2, '0') || '120000'
           AS ts14,
         'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         md5(text || '#' || CAST(
           CASE doc_id % 4
             WHEN 0 THEN 0
             WHEN 1 THEN least(s.snap, 1)
             WHEN 2 THEN s.snap % 2
             ELSE s.snap END AS VARCHAR)) AS digest,
         CAST(length(text) + 100 AS INTEGER) AS length,
         doc_id * 1000 + s.snap AS "offset",
         'warc-' || CAST(s.snap AS VARCHAR) AS warc_file
  FROM documents, unnest([0, 1, 2]) AS s(snap))
SELECT surt, ts14, url, digest, length, "offset", warc_file,
       row_number() OVER w > 1 AS is_revisit,
       first_value(warc_file) OVER w AS refers_to_file,
       first_value("offset") OVER w AS refers_to_offset
FROM caps
WINDOW w AS (PARTITION BY surt, digest ORDER BY ts14, warc_file, "offset")
"""


def q_warc_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC writer framing (sources/warc.render_warc): documents ->
    framed response records; the oracle rebuilds the record STRING in
    DuckDB and both sides hash it — any framing drift (CRLFs, ISO
    date, byte-counted Content-Length) breaks the md5.  The parse
    roundtrip (render -> parse_warc_records recovers the page) is
    pytest-asserted in tests/test_cdx.py."""
    from biothings_crawler_spark.sources.warc import render_warc

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.concat(F.lit("https://site"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example.org/page/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_micros(
            (F.lit(1756684800) + F.col("doc_id") % 86400 * 7) * 1_000_000
        ).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "utf-8").alias("html"),
    )
    return render_warc(pages).select(
        F.length("record").alias("rec_len"),
        F.md5("record").alias("rec_md5"),
    )


SQL_WARC_RENDER = r"""
WITH p AS (
  SELECT 'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         strftime(make_timestamp((1756684800 + doc_id % 86400 * 7) * 1000000),
                  '%Y-%m-%dT%H:%M:%SZ') AS dt,
         'HTTP/1.1 200 OK' || chr(13) || chr(10)
           || 'Content-Type: text/html' || chr(13) || chr(10) || chr(13)
           || chr(10) || '<html><body>' || text || '</body></html>' AS payload
  FROM documents),
rec AS (
  SELECT 'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: response'
         || chr(13) || chr(10) || 'WARC-Target-URI: ' || url
         || chr(13) || chr(10) || 'WARC-Date: ' || dt
         || chr(13) || chr(10) || 'Content-Length: '
         || CAST(octet_length(encode(payload)) AS VARCHAR)
         || chr(13) || chr(10) || chr(13) || chr(10) || payload AS t
  FROM p)
SELECT CAST(octet_length(encode(t)) AS INTEGER) AS rec_len, md5(t) AS rec_md5
FROM rec
"""


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHATWG charset sniffing (operators/http.sniff_charset): BOM >
    Content-Type header > meta prescan > default, with alias folding.
    Fixture covers a UTF-8 BOM, a header label, ``<meta charset>``, a
    ``http-equiv`` meta, an unlabeled page, and a header-beats-meta
    conflict.  Oracle re-derives the precedence with DuckDB regexes on
    the same constructed page.  (UTF-16 BOMs are pytest-only — their
    bytes can't live in a DuckDB VARCHAR.)"""
    from biothings_crawler_spark.operators.http import sniff_charset

    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    html_s = (
        F.when(m == 0, F.concat(F.lit("﻿<html>"), F.col("text")))
        .when(m == 2, F.concat(
            F.lit('<html><head><meta charset="Shift_JIS"></head>'),
            F.col("text")))
        .when(m == 3, F.concat(
            F.lit('<head><meta http-equiv="Content-Type" '
                  'content="text/html; charset=utf8"></head>'),
            F.col("text")))
        .when(m == 5, F.concat(
            F.lit("<head><meta charset='latin1'></head>"), F.col("text")))
        .otherwise(F.concat(F.lit("<html>"), F.col("text")))
    )
    ct = (
        F.when(m == 1, F.lit("text/html; charset=ISO-8859-1"))
        .when(m == 5, F.lit('text/html; charset="UTF-8"'))
        .otherwise(F.lit("text/html"))
    )
    pages = d.select(
        "doc_id",
        F.encode(html_s, "utf-8").alias("html"),
        ct.alias("content_type"),
    )
    return sniff_charset(pages).select(
        "doc_id", "charset", "charset_source")


SQL_CHARSET_SNIFF = r"""
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN chr(65279) || '<html>' || text
           WHEN 2 THEN '<html><head><meta charset="Shift_JIS"></head>' || text
           WHEN 3 THEN '<head><meta http-equiv="Content-Type" '
                       || 'content="text/html; charset=utf8"></head>' || text
           WHEN 5 THEN '<head><meta charset=''latin1''></head>' || text
           ELSE '<html>' || text
         END AS html,
         CASE doc_id % 6
           WHEN 1 THEN 'text/html; charset=ISO-8859-1'
           WHEN 5 THEN 'text/html; charset="UTF-8"'
           ELSE 'text/html'
         END AS content_type
  FROM documents),
x AS (
  SELECT doc_id,
         starts_with(html, chr(65279)) AS bom,
         regexp_extract(content_type,
           'charset\s*=\s*["'']?([A-Za-z0-9_.:-]+)', 1, 'i') AS hdr,
         regexp_extract(substring(html, 1, 1024),
           '<meta[^>]{0,200}?charset\s*=\s*["'']?([A-Za-z0-9_.:-]+)', 1, 'i')
           AS meta
  FROM p),
lab AS (
  SELECT doc_id, bom, hdr, meta,
         CASE WHEN bom THEN 'utf-8'
              WHEN hdr <> '' THEN lower(hdr)
              WHEN meta <> '' THEN lower(meta)
              ELSE 'windows-1252' END AS raw
  FROM x)
SELECT doc_id,
       CASE raw
         WHEN 'utf8' THEN 'utf-8'
         WHEN 'iso-8859-1' THEN 'windows-1252'
         WHEN 'iso8859-1' THEN 'windows-1252'
         WHEN 'latin1' THEN 'windows-1252'
         WHEN 'latin-1' THEN 'windows-1252'
         WHEN 'us-ascii' THEN 'windows-1252'
         WHEN 'ascii' THEN 'windows-1252'
         WHEN 'shift-jis' THEN 'shift_jis'
         WHEN 'sjis' THEN 'shift_jis'
         ELSE raw END AS charset,
       CASE WHEN bom THEN 'bom'
            WHEN hdr <> '' THEN 'header'
            WHEN meta <> '' THEN 'meta'
            ELSE 'default' END AS charset_source
FROM lab
"""


def q_cache_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9111 freshness TTLs (operators/http.cache_ttl): no-store /
    no-cache zero, s-maxage over max-age (shared cache), Age-reduced
    freshness with a zero clamp, heuristic default when undeclared.
    Oracle = the same directive regexes + integer arithmetic in SQL."""
    from biothings_crawler_spark.operators.http import cache_ttl

    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    cc = (
        F.when(m == 0, F.lit("max-age=3600, public"))
        .when(m == 1, F.lit("no-store"))
        .when(m == 2, F.lit("s-maxage=600, max-age=30"))
        .when(m == 3, F.lit(""))
        .when(m == 4, F.lit("private, max-age=0, no-cache"))
        .otherwise(F.lit("max-age=100"))
    )
    resp = d.select(
        "doc_id",
        cc.alias("cache_control"),
        F.when(m == 5, F.lit(150)).otherwise(F.col("doc_id") % 20)
        .cast("long").alias("age_s"),
        (F.col("doc_id") * 1_000_000).alias("fetch_ts_us"),
    )
    return cache_ttl(resp).select(
        "doc_id", "cache_control", "ttl_s", "stale_at_us")


SQL_CACHE_TTL = r"""
WITH r AS (
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN 'max-age=3600, public'
           WHEN 1 THEN 'no-store'
           WHEN 2 THEN 's-maxage=600, max-age=30'
           WHEN 3 THEN ''
           WHEN 4 THEN 'private, max-age=0, no-cache'
           ELSE 'max-age=100'
         END AS cache_control,
         CAST(CASE WHEN doc_id % 6 = 5 THEN 150 ELSE doc_id % 20 END
              AS BIGINT) AS age_s,
         doc_id * 1000000 AS fetch_ts_us
  FROM documents),
d AS (
  SELECT doc_id, cache_control, age_s, fetch_ts_us,
         regexp_matches(cache_control,
           '(?:^|[,\s])(?:no-store|no-cache)(?:$|[,\s=])', 'i') AS no_store,
         regexp_extract(cache_control,
           '(?:^|[,\s])s-maxage\s*=\s*([0-9]+)', 1, 'i') AS smax,
         regexp_extract(cache_control,
           '(?:^|[,\s])max-age\s*=\s*([0-9]+)', 1, 'i') AS maxage
  FROM r),
t AS (
  SELECT doc_id, cache_control, age_s, fetch_ts_us,
         CASE WHEN no_store THEN 0
              WHEN smax <> '' THEN CAST(smax AS BIGINT)
              WHEN maxage <> '' THEN CAST(maxage AS BIGINT)
              ELSE 86400 END AS declared
  FROM d)
SELECT doc_id, cache_control,
       CAST(greatest(0, declared - age_s) AS BIGINT) AS ttl_s,
       CAST(fetch_ts_us + greatest(0, declared - age_s) * 1000000 AS BIGINT)
         AS stale_at_us
FROM t
"""


def q_recrawl_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model schedule ∧ server policy (operators/recrawl.
    clamp_with_cache_policy): the Cho & Garcia-Molina intervals from
    q_recrawl_schedule, floored by per-URL cache staleness horizons
    (operators/http.cache_ttl's output shape); a third of the URLs
    carry no policy and pass through.  Oracle = the recrawl SQL twin
    wrapped in the same left join + greatest clamp."""
    from biothings_crawler_spark.operators.recrawl import (
        clamp_with_cache_policy,
        recrawl_schedule,
    )

    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(F.lit("u"), (F.col("user_id") % 200).cast("string")).alias("url"),
        F.col("ts"),
        F.col("event_id"),
        (F.floor(F.col("value") * 10).cast("long") % 3).cast("string").alias("h"),
    )
    sched = recrawl_schedule(
        fetches, "url", "ts", "h", "event_id",
        base_interval_s=86400, min_interval_s=3600, max_interval_s=2592000,
    )
    policies = (
        spark.range(0, 200)
        .filter(F.col("id") % 3 != 2)
        .select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            (F.lit(1_787_000_000_000_000)
             + (F.col("id") % 7) * F.lit(500_000_000_000))
            .cast("long").alias("stale_at_us"),
        )
    )
    return clamp_with_cache_policy(sched, policies)


SQL_RECRAWL_CLAMPED = f"""
WITH sched AS ({SQL_RECRAWL_SCHEDULE}),
pol AS (
  SELECT 'u' || CAST(i AS VARCHAR) AS url,
         CAST(1787000000000000 + (i % 7) * 500000000000 AS BIGINT)
           AS stale_at_us
  FROM unnest(range(200)) AS t(i) WHERE i % 3 <> 2)
SELECT s.url, n_fetches, n_changes, interval_s,
       GREATEST(next_due_us, COALESCE(stale_at_us, 0)) AS next_due_us,
       COALESCE(stale_at_us, 0) > next_due_us AS was_clamped
FROM sched s LEFT JOIN pol p ON s.url = p.url
"""


def q_sitemap_refetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-driven refetch queue (sources/sitemap.sitemap_refetch):
    the q_sitemap_parse entries joined against a last-fetch table
    (a fifth of the locs never fetched), decided by the
    new > lastmod > changefreq-age precedence with ``never``
    suppressing the heuristic path.  Oracle = the sitemap-parse SQL
    twin plus the same join and CASE."""
    from biothings_crawler_spark.sources.sitemap import (
        parse_sitemap_xml,
        sitemap_refetch,
    )

    sm = _t(spark, sf_dir, "documents").selectExpr(
        "'https://h' || CAST(doc_id AS STRING) || '.example.org/sitemap.xml'"
        " AS sitemap_url",
        _sm_body("STRING") + " AS body",
    )
    entries = parse_sitemap_xml(sm)
    d = _t(spark, sf_dir, "documents")
    k = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("i")
    pairs = d.select("doc_id", k)
    fetched = (
        pairs.filter((F.col("doc_id") + F.col("i")) % 5 != 4)
        .select(
            F.concat(F.lit("https://h"), F.col("doc_id").cast("string"),
                     F.lit(".example.org/p/"), F.col("i").cast("string")
                     ).alias("loc"),
            F.concat(F.lit("2024-"),
                     F.lpad(((F.col("doc_id") + F.col("i")) % 12 + 1)
                            .cast("string"), 2, "0"),
                     F.lit("-10")).alias("last_fetch"),
        )
    )
    return sitemap_refetch(entries, fetched, "2026-08-17")


SQL_SITEMAP_REFETCH = f"""
WITH ent AS ({SQL_SITEMAP_PARSE}),
fet AS (
  SELECT 'https://h' || CAST(doc_id AS VARCHAR) || '.example.org/p/'
           || CAST(s.i AS VARCHAR) AS loc,
         '2024-' || lpad(CAST((doc_id + s.i) % 12 + 1 AS VARCHAR), 2, '0')
           || '-10' AS last_fetch
  FROM documents, unnest([0, 1, 2]) AS s(i)
  WHERE (doc_id + s.i) % 5 <> 4),
j AS (
  SELECT ent.*, fet.last_fetch,
         CASE WHEN fet.last_fetch IS NULL THEN 'new'
              WHEN ent.lastmod <> '' AND ent.lastmod > fet.last_fetch
                THEN 'lastmod'
              WHEN ent.recrawl_hours > 0
                   AND date_diff('day', CAST(fet.last_fetch AS DATE),
                                 DATE '2026-08-17') * 24 >= ent.recrawl_hours
                THEN 'age'
              ELSE 'fresh' END AS reason
  FROM ent LEFT JOIN fet ON ent.loc = fet.loc)
SELECT *, reason <> 'fresh' AS refetch FROM j
"""


def q_meta_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level robots directives (operators/extract.meta_robots):
    meta tags in both attribute orders and casings, an unquoted name
    attr, multi-tag union, the X-Robots-Tag header, ``none`` implying
    both flags, ``all``/unknown directives implying neither.  Oracle
    re-extracts with DuckDB regexes."""
    from biothings_crawler_spark.operators.extract import meta_robots

    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    head = (
        F.when(m == 0, F.lit(
            '<meta name="robots" content="noindex, follow">'))
        .when(m == 1, F.lit('<META NAME="ROBOTS" CONTENT="NOFOLLOW">'))
        .when(m == 3, F.lit(
            '<meta name=robots content="nofollow">'
            '<meta content="noindex" name="robots">'))
        .when(m == 5, F.lit('<meta name="robots" content="all">'))
        .otherwise(F.lit(""))
    )
    hdr = (
        F.when(m == 2, F.lit("none"))
        .when(m == 5, F.lit("noarchive"))
        .otherwise(F.lit(""))
    )
    pages = d.select(
        "doc_id",
        F.encode(F.concat(F.lit("<html><head>"), head,
                          F.lit("</head><body>"), F.col("text"),
                          F.lit("</body></html>")), "utf-8").alias("html"),
        hdr.alias("x_robots_tag"),
    )
    return meta_robots(pages).select("doc_id", "noindex", "nofollow")


SQL_META_ROBOTS = r"""
WITH p AS (
  SELECT doc_id,
         '<html><head>' ||
         CASE doc_id % 6
           WHEN 0 THEN '<meta name="robots" content="noindex, follow">'
           WHEN 1 THEN '<META NAME="ROBOTS" CONTENT="NOFOLLOW">'
           WHEN 3 THEN '<meta name=robots content="nofollow">'
                       || '<meta content="noindex" name="robots">'
           WHEN 5 THEN '<meta name="robots" content="all">'
           ELSE '' END
         || '</head><body>' || text || '</body></html>' AS html,
         CASE doc_id % 6 WHEN 2 THEN 'none' WHEN 5 THEN 'noarchive'
              ELSE '' END AS hdr
  FROM documents),
c AS (
  SELECT doc_id,
         lower(
           COALESCE(array_to_string(regexp_extract_all(html,
             '(?i)<meta[^>]*name\s*=\s*["'']?robots["'']?[^>]*content\s*=\s*["'']([^"'']*)["'']',
             1), ' '), '')
           || ' ' ||
           COALESCE(array_to_string(regexp_extract_all(html,
             '(?i)<meta[^>]*content\s*=\s*["'']([^"'']*)["''][^>]*name\s*=\s*["'']?robots["'']?',
             1), ' '), '')
           || ' ' || hdr) AS combined
  FROM p)
SELECT doc_id,
       regexp_matches(combined, '\bnoindex\b')
         OR regexp_matches(combined, '\bnone\b') AS noindex,
       regexp_matches(combined, '\bnofollow\b')
         OR regexp_matches(combined, '\bnone\b') AS nofollow
FROM c
"""


def q_feed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed polling source (sources/feed.parse_feed): even doc_ids
    serve RSS (CDATA title, RFC-822 pubDate -> ts14 via exact month
    map, a dateless item, a linkless decoy dropped), odd serve Atom
    (href-attribute links, ISO updated -> ts14).  Oracle re-parses
    with the same RE2 patterns + list_position month arithmetic in
    DuckDB."""
    from biothings_crawler_spark.sources.feed import parse_feed

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    h = F.concat(F.lit("https://h"), i, F.lit(".example.org"))
    mon = F.element_at(
        F.array(*[F.lit(m) for m in
                  ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                   "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]]),
        (F.col("doc_id") % 12 + 1).cast("int"))
    dd = (F.col("doc_id") % 28 + 1).cast("string")
    dd2 = F.lpad(dd, 2, "0")
    rss = F.concat(
        F.lit("<rss><channel>"),
        F.lit("<item><title><![CDATA[T"), i, F.lit("a]]></title><link>"),
        h, F.lit("/a</link><guid>g"), i, F.lit("a</guid><pubDate>Tue, "),
        dd, F.lit(" "), mon, F.lit(" 2026 07:30:05 GMT</pubDate></item>"),
        F.lit("<item><title>T"), i, F.lit("b</title><link>"),
        h, F.lit("/b</link><guid>g"), i, F.lit("b</guid></item>"),
        F.lit("<item><title>nolink</title><guid>g"), i,
        F.lit("c</guid></item>"),
        F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit("<feed>"),
        F.lit("<entry><title>A"), i, F.lit('x</title><link href="'),
        h, F.lit('/x"/><id>i'), i, F.lit("x</id><updated>2026-08-"),
        dd2, F.lit("T10:20:30Z</updated></entry>"),
        F.lit("<entry><title>A"), i, F.lit('y</title><link href="'),
        h, F.lit('/y"/><id>i'), i, F.lit("y</id></entry>"),
        F.lit("</feed>"),
    )
    feeds = d.select(
        F.concat(h, F.lit("/feed.xml")).alias("feed_url"),
        F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom).alias("body"),
    )
    return parse_feed(feeds)


SQL_FEED_PARSE = r"""
WITH d AS (
  SELECT doc_id,
         'https://h' || CAST(doc_id AS VARCHAR) || '.example.org' AS h,
         ['Jan','Feb','Mar','Apr','May','Jun',
          'Jul','Aug','Sep','Oct','Nov','Dec'][CAST(doc_id % 12 + 1 AS INT)]
           AS mon,
         CAST(doc_id % 28 + 1 AS VARCHAR) AS dd,
         lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd2
  FROM documents),
f AS (
  SELECT h || '/feed.xml' AS feed_url,
         CASE WHEN doc_id % 2 = 0 THEN
           '<rss><channel>'
           || '<item><title><![CDATA[T' || CAST(doc_id AS VARCHAR)
           || 'a]]></title><link>' || h || '/a</link><guid>g'
           || CAST(doc_id AS VARCHAR) || 'a</guid><pubDate>Tue, ' || dd
           || ' ' || mon || ' 2026 07:30:05 GMT</pubDate></item>'
           || '<item><title>T' || CAST(doc_id AS VARCHAR)
           || 'b</title><link>' || h || '/b</link><guid>g'
           || CAST(doc_id AS VARCHAR) || 'b</guid></item>'
           || '<item><title>nolink</title><guid>g'
           || CAST(doc_id AS VARCHAR) || 'c</guid></item>'
           || '</channel></rss>'
         ELSE
           '<feed>'
           || '<entry><title>A' || CAST(doc_id AS VARCHAR)
           || 'x</title><link href="' || h || '/x"/><id>i'
           || CAST(doc_id AS VARCHAR) || 'x</id><updated>2026-08-' || dd2
           || 'T10:20:30Z</updated></entry>'
           || '<entry><title>A' || CAST(doc_id AS VARCHAR)
           || 'y</title><link href="' || h || '/y"/><id>i'
           || CAST(doc_id AS VARCHAR) || 'y</id></entry>'
           || '</feed>'
         END AS body
  FROM d),
bl AS (
  SELECT feed_url,
         CASE WHEN len(regexp_extract_all(body, '(?s)<item>(.*?)</item>', 1))
                   > 0 THEN 'rss' ELSE 'atom' END AS kind,
         unnest(CASE WHEN len(regexp_extract_all(body,
                              '(?s)<item>(.*?)</item>', 1)) > 0
                     THEN regexp_extract_all(body, '(?s)<item>(.*?)</item>', 1)
                     ELSE regexp_extract_all(body,
                              '(?s)<entry>(.*?)</entry>', 1) END) AS b
  FROM f),
x AS (
  SELECT feed_url, kind,
         regexp_replace(
           regexp_extract(b, '(?s)<title[^>]*>\s*(.*?)\s*</title>', 1),
           '(?s)^<!\[CDATA\[(.*)\]\]>$', '\1') AS title,
         CASE WHEN kind = 'rss'
              THEN regexp_extract(b, '(?s)<link[^>]*>\s*(.*?)\s*</link>', 1)
              ELSE regexp_extract(b, '(?s)<link[^>]*href="([^"]*)"', 1)
         END AS link,
         CASE WHEN kind = 'rss'
              THEN regexp_extract(b, '(?s)<guid[^>]*>\s*(.*?)\s*</guid>', 1)
              ELSE regexp_extract(b, '(?s)<id[^>]*>\s*(.*?)\s*</id>', 1)
         END AS entry_id,
         CASE WHEN kind = 'rss'
              THEN regexp_extract(b, '(?s)<pubDate[^>]*>\s*(.*?)\s*</pubDate>', 1)
              ELSE regexp_extract(b, '(?s)<updated[^>]*>\s*(.*?)\s*</updated>', 1)
         END AS published_raw
  FROM bl),
ts AS (
  SELECT *,
    CASE WHEN kind = 'rss' THEN
      CASE WHEN regexp_extract(published_raw,
             '([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})',
             3) <> ''
      THEN regexp_extract(published_raw,
             '([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})', 3)
        || lpad(CAST(list_position(
             ['Jan','Feb','Mar','Apr','May','Jun',
              'Jul','Aug','Sep','Oct','Nov','Dec'],
             regexp_extract(published_raw,
               '([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})', 2))
             AS VARCHAR), 2, '0')
        || lpad(regexp_extract(published_raw,
             '([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})', 1), 2, '0')
        || regexp_extract(published_raw,
             '([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})', 4)
        || regexp_extract(published_raw,
             '([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})', 5)
        || regexp_extract(published_raw,
             '([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})', 6)
      ELSE '' END
    ELSE CASE WHEN published_raw <> ''
              THEN substring(regexp_replace(published_raw, '[^0-9]', '', 'g'),
                             1, 14)
              ELSE '' END
    END AS ts14
  FROM x)
SELECT feed_url, kind, title, link, entry_id, published_raw, ts14
FROM ts WHERE link <> ''
"""


def q_opengraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open Graph / Twitter card extraction (operators/extract.
    opengraph): both attribute orders, single- and double-quoted
    attrs, partial and absent blocks -> null columns.  Oracle
    re-extracts with DuckDB regexes."""
    from biothings_crawler_spark.operators.extract import opengraph

    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 5
    i = F.col("doc_id").cast("string")
    head = (
        F.when(m == 0, F.concat(
            F.lit('<meta property="og:title" content="Title '), i,
            F.lit('"><meta property="og:description" content="Desc '), i,
            F.lit('">')))
        .when(m == 1, F.concat(
            F.lit('<meta content="Rev '), i,
            F.lit('" property="og:title">'
                  '<meta name="twitter:card" content="summary">')))
        .when(m == 2, F.concat(
            F.lit('<meta property="og:image" content="https://img/'), i,
            F.lit('.png">')))
        .when(m == 4, F.concat(
            F.lit("<meta property='og:title' content='Q "), i,
            F.lit("'><meta property='og:description' content='D'>"
                  "<meta property='og:image' content='https://i/x'>"
                  "<meta name='twitter:card' content='summary_large_image'>")))
        .otherwise(F.lit(""))
    )
    pages = d.select(
        "doc_id",
        F.encode(F.concat(F.lit("<html><head>"), head,
                          F.lit("</head><body>"), F.col("text"),
                          F.lit("</body></html>")), "utf-8").alias("html"),
    )
    return opengraph(pages).select(
        "doc_id", "og_title", "og_description", "og_image", "twitter_card")


SQL_OPENGRAPH = r"""
WITH p AS (
  SELECT doc_id,
         '<html><head>' ||
         CASE doc_id % 5
           WHEN 0 THEN '<meta property="og:title" content="Title '
                       || CAST(doc_id AS VARCHAR)
                       || '"><meta property="og:description" content="Desc '
                       || CAST(doc_id AS VARCHAR) || '">'
           WHEN 1 THEN '<meta content="Rev ' || CAST(doc_id AS VARCHAR)
                       || '" property="og:title">'
                       || '<meta name="twitter:card" content="summary">'
           WHEN 2 THEN '<meta property="og:image" content="https://img/'
                       || CAST(doc_id AS VARCHAR) || '.png">'
           WHEN 4 THEN '<meta property=''og:title'' content=''Q '
                       || CAST(doc_id AS VARCHAR) || '''>'
                       || '<meta property=''og:description'' content=''D''>'
                       || '<meta property=''og:image'' content=''https://i/x''>'
                       || '<meta name=''twitter:card'''
                       || ' content=''summary_large_image''>'
           ELSE '' END
         || '</head><body>' || text || '</body></html>' AS html
  FROM documents)
SELECT doc_id,
  NULLIF(COALESCE(
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*property\s*=\s*["'']og:title["''][^>]*content\s*=\s*["'']([^"'']*)["'']', 1), ''),
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*content\s*=\s*["'']([^"'']*)["''][^>]*property\s*=\s*["'']og:title["'']', 1), ''),
    ''), '') AS og_title,
  NULLIF(COALESCE(
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*property\s*=\s*["'']og:description["''][^>]*content\s*=\s*["'']([^"'']*)["'']', 1), ''),
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*content\s*=\s*["'']([^"'']*)["''][^>]*property\s*=\s*["'']og:description["'']', 1), ''),
    ''), '') AS og_description,
  NULLIF(COALESCE(
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*property\s*=\s*["'']og:image["''][^>]*content\s*=\s*["'']([^"'']*)["'']', 1), ''),
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*content\s*=\s*["'']([^"'']*)["''][^>]*property\s*=\s*["'']og:image["'']', 1), ''),
    ''), '') AS og_image,
  NULLIF(COALESCE(
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*name\s*=\s*["'']twitter:card["''][^>]*content\s*=\s*["'']([^"'']*)["'']', 1), ''),
    NULLIF(regexp_extract(html,
      '(?i)<meta[^>]*content\s*=\s*["'']([^"'']*)["''][^>]*name\s*=\s*["'']twitter:card["'']', 1), ''),
    ''), '') AS twitter_card
FROM p
"""


def q_fetch_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch hygiene flags (operators/http.fetch_quality): truncation
    (declared Content-Length > body bytes), declared-HTML-but-PDF
    magic, empty body, 4xx/5xx classes, and the clean path.  Binary
    magics (PNG/gzip) are pytest-only — their bytes can't live in a
    DuckDB VARCHAR.  Oracle = the same byte arithmetic in SQL."""
    from biothings_crawler_spark.operators.http import fetch_quality

    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    body_s = (
        F.when(m == 2, F.concat(F.lit("%PDF-1.7 "), F.col("text")))
        .when(m == 4, F.lit(""))
        .otherwise(F.concat(F.lit("<html>"), F.col("text"), F.lit("</html>")))
    )
    body = F.encode(body_s, "utf-8")
    status = (
        F.when(m == 3, F.lit(404)).when(m == 5, F.lit(503))
        .otherwise(F.lit(200))
    )
    clen = F.when(m == 1, F.length(body) + 50).otherwise(F.length(body))
    resp = d.select(
        "doc_id",
        status.alias("status"),
        F.lit("text/html; charset=utf-8").alias("content_type"),
        clen.cast("long").alias("content_length"),
        body.alias("body"),
    )
    return fetch_quality(resp).select(
        "doc_id", "status", "body_bytes", "status_class",
        "truncated", "empty_body", "mime_mismatch", "ok")


SQL_FETCH_QUALITY = r"""
WITH r AS (
  SELECT doc_id,
         CASE doc_id % 6 WHEN 3 THEN 404 WHEN 5 THEN 503 ELSE 200 END
           AS status,
         CASE doc_id % 6
           WHEN 2 THEN '%PDF-1.7 ' || text
           WHEN 4 THEN ''
           ELSE '<html>' || text || '</html>' END AS body
  FROM documents),
s AS (
  SELECT doc_id, status, body,
         CAST(octet_length(encode(body)) AS BIGINT) AS body_bytes,
         CAST(CASE WHEN doc_id % 6 = 1
                   THEN octet_length(encode(body)) + 50
                   ELSE octet_length(encode(body)) END AS BIGINT)
           AS content_length
  FROM r),
q AS (
  SELECT doc_id, status, body_bytes,
         CAST(status // 100 AS VARCHAR) || 'xx' AS status_class,
         body_bytes < content_length AS truncated,
         body_bytes = 0 AS empty_body,
         substring(body, 1, 4) IN ('%PDF', 'GIF8') AS mime_mismatch
  FROM s)
SELECT doc_id, status, body_bytes, status_class, truncated, empty_body,
       mime_mismatch,
       status >= 200 AND status < 300 AND NOT truncated AND body_bytes > 0
         AND NOT mime_mismatch AS ok
FROM q
"""


def q_archive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archive plane composed end to end: three crawl snapshots
    per document (the q_cdx_revisits version matrix) -> render_warc
    framing -> cdx_index (per-file offsets over the REAL rendered
    bytes) -> cdx_revisits -> per-file storage savings.  Verified as
    ONE DuckDB statement rebuilding the same bytes, offsets, digests,
    window, and rollup — any drift in any stage breaks the digest or
    the byte counts."""
    from biothings_crawler_spark.sources.cdx import cdx_index, cdx_revisits, revisit_savings
    from biothings_crawler_spark.sources.warc import render_warc

    d = _t(spark, sf_dir, "documents")
    snaps = d.select("doc_id", "text", F.explode(F.array(
        F.lit(0), F.lit(1), F.lit(2))).alias("snap"))
    m = F.col("doc_id") % 4
    version = (
        F.when(m == 0, F.lit(0))
        .when(m == 1, F.least(F.col("snap"), F.lit(1)))
        .when(m == 2, F.col("snap") % 2)
        .otherwise(F.col("snap"))
    )
    pages = snaps.select(
        "doc_id", "snap",
        F.concat(F.lit("https://site"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example.org/page/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_micros(
            (F.lit(1756684800) + F.col("snap") * 86400
             + F.col("doc_id") % 3600) * 1_000_000).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body v='"), version.cast("string"),
                          F.lit("'>"), F.col("text"),
                          F.lit("</body></html>")), "utf-8").alias("html"),
    )
    recs = render_warc(
        pages.withColumn(
            "warc_file",
            F.concat(F.lit("warc-"), F.col("snap").cast("string"))
        ).withColumn("pos", F.col("doc_id")),
        keep=("warc_file", "pos"),
    )
    return revisit_savings(cdx_revisits(cdx_index(recs)))


SQL_ARCHIVE_ROUNDTRIP = r"""
WITH d AS (
  SELECT doc_id, s.snap, text,
         CASE doc_id % 4
           WHEN 0 THEN 0
           WHEN 1 THEN least(s.snap, 1)
           WHEN 2 THEN s.snap % 2
           ELSE s.snap END AS v
  FROM documents, unnest([0, 1, 2]) AS s(snap)),
p AS (
  SELECT doc_id, snap,
         'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         strftime(make_timestamp(
             (1756684800 + snap * 86400 + doc_id % 3600) * 1000000),
           '%Y-%m-%dT%H:%M:%SZ') AS dt,
         'HTTP/1.1 200 OK' || chr(13) || chr(10) || 'Content-Type: text/html'
           || chr(13) || chr(10) || chr(13) || chr(10)
           || '<html><body v=''' || CAST(v AS VARCHAR) || '''>' || text
           || '</body></html>' AS payload
  FROM d),
rec AS (
  SELECT doc_id, 'warc-' || CAST(snap AS VARCHAR) AS warc_file,
         doc_id AS pos, payload, dt,
         'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: response'
         || chr(13) || chr(10) || 'WARC-Target-URI: ' || url
         || chr(13) || chr(10) || 'WARC-Date: ' || dt
         || chr(13) || chr(10) || 'Content-Length: '
         || CAST(octet_length(encode(payload)) AS VARCHAR)
         || chr(13) || chr(10) || chr(13) || chr(10) || payload AS t
  FROM p),
sized AS (SELECT *, octet_length(encode(t)) + 4 AS len FROM rec),
cdx AS (
  SELECT 'org,example,site' || CAST(doc_id % 5 AS VARCHAR) || ')/page/'
           || CAST(doc_id AS VARCHAR) AS surt,
         regexp_replace(dt, '[^0-9]', '', 'g') AS ts14,
         md5(payload) AS digest,
         len AS length,
         SUM(len) OVER (PARTITION BY warc_file ORDER BY pos) - len AS off,
         warc_file
  FROM sized),
rev AS (
  SELECT warc_file, length,
         row_number() OVER (PARTITION BY surt, digest
                            ORDER BY ts14, warc_file, off) > 1 AS is_revisit
  FROM cdx)
SELECT warc_file,
       CAST(COUNT(*) AS BIGINT) AS n_captures,
       CAST(SUM(CASE WHEN is_revisit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_revisits,
       CAST(SUM(CASE WHEN is_revisit THEN length ELSE 0 END) AS BIGINT)
         AS saved_bytes
FROM rev GROUP BY warc_file
"""


def q_wet_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET conversion-record framing (sources/warc.render_wet): the
    Common-Crawl text companion to the WARC archive — plain-text
    payload, no HTTP block, byte-counted Content-Length.  Oracle
    rebuilds the record string in DuckDB; both sides md5 it."""
    from biothings_crawler_spark.sources.warc import render_wet

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.concat(F.lit("https://site"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example.org/page/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_micros(
            (F.lit(1756684800) + F.col("doc_id") % 86400 * 7) * 1_000_000
        ).alias("warc_ts"),
        F.col("text"),
    )
    return render_wet(pages).select(
        F.length("record").alias("rec_len"),
        F.md5("record").alias("rec_md5"),
    )


SQL_WET_RENDER = r"""
WITH p AS (
  SELECT 'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         strftime(make_timestamp((1756684800 + doc_id % 86400 * 7) * 1000000),
                  '%Y-%m-%dT%H:%M:%SZ') AS dt,
         text
  FROM documents),
rec AS (
  SELECT 'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: conversion'
         || chr(13) || chr(10) || 'WARC-Target-URI: ' || url
         || chr(13) || chr(10) || 'WARC-Date: ' || dt
         || chr(13) || chr(10) || 'Content-Type: text/plain'
         || chr(13) || chr(10) || 'Content-Length: '
         || CAST(octet_length(encode(text)) AS VARCHAR)
         || chr(13) || chr(10) || chr(13) || chr(10) || text AS t
  FROM p)
SELECT CAST(octet_length(encode(t)) AS INTEGER) AS rec_len, md5(t) AS rec_md5
FROM rec
"""


def q_wat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT metadata-sidecar framing (sources/warc.render_wat): the
    third Common-Crawl archive artifact beside .warc/.wet — JSON
    Envelope with title + outgoing links per response, JSON-escaped,
    byte-counted Content-Length.  Fixture lanes: one page in four has
    no title and no links (empty-Title/empty-Links shape); the rest
    carry a quote-and-backslash title (escape path) and one or two
    links.  Oracle re-derives title and links from the html with the
    same RE2 patterns and re-builds the record string in DuckDB; both
    sides md5 the full record."""
    from biothings_crawler_spark.sources.warc import render_wat

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    link1 = F.concat(F.lit('<a href="https://h'),
                     (F.col("doc_id") % 7).cast("string"),
                     F.lit(".example.org/p"), i, F.lit('">x</a>'))
    link2 = F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit('<a href="/rel/'), i, F.lit('">y</a>'))
                   ).otherwise(F.lit(""))
    html = F.when(
        F.col("doc_id") % 4 == 0,
        F.lit("<html><body>plain</body></html>"),
    ).otherwise(F.concat(
        F.lit('<html><head><title>Doc "'), i, F.lit('" \\ t</title></head>'),
        F.lit("<body>"), link1, link2, F.lit("</body></html>"),
    ))
    pages = d.select(
        F.concat(F.lit("https://site"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example.org/page/"), i).alias("url"),
        F.timestamp_micros(
            (F.lit(1756684800) + F.col("doc_id") % 86400 * 7) * 1_000_000
        ).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
    )
    return render_wat(pages).select(
        F.length("record").alias("rec_len"),
        F.md5("record").alias("rec_md5"),
    )


SQL_WAT_RENDER = r"""
WITH p AS (
  SELECT 'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         strftime(make_timestamp((1756684800 + doc_id % 86400 * 7) * 1000000),
                  '%Y-%m-%dT%H:%M:%SZ') AS dt,
         CASE WHEN doc_id % 4 = 0 THEN '<html><body>plain</body></html>'
              ELSE '<html><head><title>Doc "' || CAST(doc_id AS VARCHAR)
                   || '" \ t</title></head><body><a href="https://h'
                   || CAST(doc_id % 7 AS VARCHAR) || '.example.org/p'
                   || CAST(doc_id AS VARCHAR) || '">x</a>'
                   || CASE WHEN doc_id % 3 = 0
                           THEN '<a href="/rel/' || CAST(doc_id AS VARCHAR)
                                || '">y</a>'
                           ELSE '' END
                   || '</body></html>'
         END AS html
  FROM documents),
m AS (
  SELECT url, dt,
         replace(replace(
             regexp_extract(html, '(?s)<title>(.*?)</title>', 1),
             '\', '\\'), '"', '\"') AS title,
         '[' || coalesce(array_to_string(list_transform(
             regexp_extract_all(html, '<a href="([^"]*)"', 1),
             u -> '{"url":"' || replace(replace(u, '\', '\\'), '"', '\"')
                  || '"}'), ','), '') || ']' AS links
  FROM p),
j AS (
  SELECT url, dt,
         '{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
         || '{"HTML-Metadata":{"Links":' || links || ',"Title":"' || title
         || '"}}},"WARC-Header-Metadata":{"WARC-Date":"' || dt
         || '","WARC-Target-URI":"' || url
         || '","WARC-Type":"response"}}}' AS payload
  FROM m),
rec AS (
  SELECT 'WARC/1.0' || chr(13) || chr(10) || 'WARC-Type: metadata'
         || chr(13) || chr(10) || 'WARC-Target-URI: ' || url
         || chr(13) || chr(10) || 'WARC-Date: ' || dt
         || chr(13) || chr(10) || 'Content-Type: application/json'
         || chr(13) || chr(10) || 'Content-Length: '
         || CAST(octet_length(encode(payload)) AS VARCHAR)
         || chr(13) || chr(10) || chr(13) || chr(10) || payload AS t
  FROM j)
SELECT CAST(octet_length(encode(t)) AS INTEGER) AS rec_len, md5(t) AS rec_md5
FROM rec
"""


def q_pct_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986 percent-encoding normalization (urlnorm.
    pct_normalize_col): unreserved escapes decode, reserved escapes
    uppercase, bare/partial ``%`` passes through.  Oracle re-derives
    with DuckDB list_transform + strpos hex arithmetic — independent
    of Spark's conv/char path."""
    from biothings_crawler_spark.urlnorm import pct_normalize_col

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    url = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://h"), i,
                        F.lit(".example.org/p%2Fq/%41%62%5A?x=%7e")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("https://h"), i,
                       F.lit(".example.org/a%3a%2F%2fb")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("https://h"), i, F.lit(".example.org/plain")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("https://h"), i, F.lit(".example.org/x%4")))
        .otherwise(F.concat(F.lit("https://h"), i,
                            F.lit(".example.org/%2e%2E/up")))
    )
    return d.select(
        "doc_id", url.alias("url"),
        pct_normalize_col(url).alias("normalized"))


SQL_PCT_NORMALIZE = r"""
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'https://h' || CAST(doc_id AS VARCHAR)
                       || '.example.org/p%2Fq/%41%62%5A?x=%7e'
           WHEN 1 THEN 'https://h' || CAST(doc_id AS VARCHAR)
                       || '.example.org/a%3a%2F%2fb'
           WHEN 2 THEN 'https://h' || CAST(doc_id AS VARCHAR)
                       || '.example.org/plain'
           WHEN 3 THEN 'https://h' || CAST(doc_id AS VARCHAR)
                       || '.example.org/x%4'
           ELSE 'https://h' || CAST(doc_id AS VARCHAR)
                || '.example.org/%2e%2E/up'
         END AS url
  FROM documents),
t AS (
  SELECT doc_id, url,
         regexp_extract_all(url, '(%[0-9A-Fa-f]{2}|[^%]+|%)', 0) AS toks
  FROM u)
SELECT doc_id, url,
  array_to_string(list_transform(toks, s ->
    CASE WHEN regexp_matches(s, '^%[0-9A-Fa-f]{2}$') THEN
      CASE WHEN
        ((strpos('0123456789ABCDEF', substr(upper(substr(s, 2, 2)), 1, 1)) - 1)
           * 16
         + strpos('0123456789ABCDEF', substr(upper(substr(s, 2, 2)), 2, 1))
           - 1)
        IN (45, 46, 95, 126)
        OR ((strpos('0123456789ABCDEF',
                    substr(upper(substr(s, 2, 2)), 1, 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substr(upper(substr(s, 2, 2)), 2, 1)) - 1)
           BETWEEN 48 AND 57
        OR ((strpos('0123456789ABCDEF',
                    substr(upper(substr(s, 2, 2)), 1, 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substr(upper(substr(s, 2, 2)), 2, 1)) - 1)
           BETWEEN 65 AND 90
        OR ((strpos('0123456789ABCDEF',
                    substr(upper(substr(s, 2, 2)), 1, 1)) - 1) * 16
            + strpos('0123456789ABCDEF',
                     substr(upper(substr(s, 2, 2)), 2, 1)) - 1)
           BETWEEN 97 AND 122
      THEN chr(CAST((strpos('0123456789ABCDEF',
                       substr(upper(substr(s, 2, 2)), 1, 1)) - 1) * 16
               + strpos('0123456789ABCDEF',
                        substr(upper(substr(s, 2, 2)), 2, 1)) - 1 AS INTEGER))
      ELSE '%' || upper(substr(s, 2, 2)) END
    ELSE s END), '') AS normalized
FROM t
"""


def q_line_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line trimming (operators/text.
    trim_repeated_lines): template banners injected around each text
    (one doc class repeats its footer too) — first occurrences kept in
    order.  The Spark path is array_distinct; the oracle reconstructs
    the keep-first contract INDEPENDENTLY via min-ordinality grouping,
    cross-checking the order guarantee array_distinct provides."""
    from biothings_crawler_spark.operators.text import trim_repeated_lines

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    nl = F.lit("\n")
    tail = F.when(F.col("doc_id") % 3 == 0, F.lit("FOOT")).otherwise(
        F.concat(F.lit("tail-"), i))
    t2 = F.concat(
        F.lit("BANNER"), nl, F.col("text"), nl, F.lit("BANNER"), nl,
        F.lit("FOOT"), nl, tail)
    return trim_repeated_lines(d.select("doc_id", t2.alias("text")))


SQL_LINE_TRIM = r"""
WITH u AS (
  SELECT doc_id,
         'BANNER' || chr(10) || text || chr(10) || 'BANNER' || chr(10)
           || 'FOOT' || chr(10)
           || CASE WHEN doc_id % 3 = 0 THEN 'FOOT'
                   ELSE 'tail-' || CAST(doc_id AS VARCHAR) END AS t
  FROM documents),
s AS (SELECT doc_id, t, string_split(t, chr(10)) AS arr FROM u),
l AS (
  SELECT doc_id, arr[CAST(r.i AS INT)] AS line, r.i AS ord
  FROM s, unnest(range(1, len(arr) + 1)) AS r(i)),
k AS (SELECT doc_id, line, MIN(ord) AS o FROM l GROUP BY doc_id, line),
agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY o) AS text_trimmed,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM k GROUP BY doc_id)
SELECT s.doc_id, agg.text_trimmed,
       CAST(len(s.arr) AS BIGINT) AS n_lines, agg.n_kept,
       CAST(length(s.t) - length(agg.text_trimmed) AS BIGINT) AS chars_saved
FROM s JOIN agg ON s.doc_id = agg.doc_id
"""


def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (operators/multimodal.decode_png_features):
    worker-side synthesis of actual PNG containers (8-bit RGB, all
    five scanline filters across rows), decoded back by an independent
    stdlib-zlib parser — chunk walk, CRC, inflate, spec-§9
    unfiltering.  The oracle recomputes every feature from the
    generator's closed-form pixel formula, never touching the bytes,
    so a symmetric encode/decode bug in the container walk cannot
    cancel (the filter mirror is additionally pinned by a pytest
    golden: a canonical spec-produced 1x1 Sub-filtered RGBA PNG).
    Ids divisible by 15 get a flipped IDAT byte — bit-rot that must
    land in ``decode_err`` (bad CRC) with NULL features, stage
    completing."""
    from biothings_crawler_spark.operators.multimodal import (
        decode_png_features,
        gen_png_media,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 5).select(
        F.col("doc_id").alias("media_id"))
    return decode_png_features(gen_png_media(ids, malformed_every=15))


SQL_PNG_DECODE = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 15 = 0 AS bad,
         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents WHERE doc_id % 10 = 5)
SELECT media_id,
       CASE WHEN bad THEN NULL ELSE CAST(w AS INT) END AS width,
       CASE WHEN bad THEN NULL ELSE CAST(h AS INT) END AS height,
       CASE WHEN bad THEN NULL ELSE CAST(8 AS INT) END AS bit_depth,
       CASE WHEN bad THEN NULL ELSE CAST(2 AS INT) END AS color_type,
       CASE WHEN bad THEN NULL ELSE CAST(w * h AS BIGINT) END AS n_pixels,
       CASE WHEN bad THEN NULL
            ELSE CAST(list_sum(list_transform(range(w * h),
              j -> (media_id * 31 + (j // w) * 17 + (j % w) * 7 + 0) % 256))
              AS BIGINT) END AS sum_r,
       CASE WHEN bad THEN NULL
            ELSE CAST(list_sum(list_transform(range(w * h),
              j -> (media_id * 31 + (j // w) * 17 + (j % w) * 7 + 3) % 256))
              AS BIGINT) END AS sum_g,
       CASE WHEN bad THEN NULL
            ELSE CAST(list_sum(list_transform(range(w * h),
              j -> (media_id * 31 + (j // w) * 17 + (j % w) * 7 + 6) % 256))
              AS BIGINT) END AS sum_b,
       CASE WHEN bad THEN 'bad CRC in b''IDAT''' ELSE NULL END AS decode_err
FROM m
"""


def _entity_fixture_variant(i, text):
    """Shared Spark-side raw-string construction for q_html_entities:
    eight lanes of planted references (named / decimal / hex / C1
    windows-1252 remap / invalid -> U+FFFD / dropped controls +
    noncharacters / astral / passthrough) prefixing a slice of the
    document text (which may itself contain stray ``&`` — both engines
    tokenize it identically)."""
    lanes = [
        "Fish &amp; Chips &lt;b&gt;&quot;x&quot;&apos;y&apos; ",
        "caf&eacute; = caf&#233; = caf&#xE9; &Auml;&szlig;&frac12; ",
        "smart &#147;quotes&#148; it&#x92;s &permil;&hellip; ",
        "bad &#0; &#x110000; &#xD800; &#57343; &#9999999; ",
        "unknown &bogus123; bare & amp; &x; &#x; &#; &#xG1; ",
        "drop[&#1;&#31;&#127;&#xFDD0;&#xFFFE;&#x1FFFF;]keep[&#9;&#13;] ",
        "astral &#x1F600;=&#128512; edge &#x10FFFD; nb:&nbsp;&shy;: ",
        "plain pass-through ",
    ]
    out = F.when(i % 8 == 0, F.lit(lanes[0]))
    for k in range(1, 8):
        out = out.when(i % 8 == k, F.lit(lanes[k]))
    return F.concat(out, F.substring(text, 1, 48))


def q_html_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML character-reference decoding (operators/textnorm.
    decode_entities_col): numeric decimal/hex with the WHATWG C1
    windows-1252 remap, U+FFFD for NUL/surrogates/out-of-range,
    control/noncharacter drops, an html5 named subset, verbatim
    passthrough for unknown or malformed references.  The Spark path
    is one JVM projection that ENCODES UTF-8 arithmetically
    (shiftright/mask -> unhex -> decode); the oracle re-derives every
    code point with DuckDB's own chr() — two independent UTF-8
    encoders must agree byte-for-byte."""
    from biothings_crawler_spark.operators.textnorm import (
        decode_entities_col)

    d = _t(spark, sf_dir, "documents")
    raw = _entity_fixture_variant(F.col("doc_id"), F.col("text"))
    return d.select(
        "doc_id", raw.alias("raw"),
        decode_entities_col(raw).alias("decoded"),
        F.length(decode_entities_col(raw)).alias("n_decoded"))


def _sql_entity_oracle() -> str:
    """DuckDB twin of q_html_entities, generated from the SAME
    NAMED_ENTITY_MAP / C1_REMAP constants the Spark expression uses
    (shared-LUT pattern) — the decode LOGIC is re-implemented
    independently (struct_pack token stages + chr), only the tables
    are shared."""
    from biothings_crawler_spark.operators.textnorm import (
        C1_REMAP, NAMED_ENTITY_MAP)

    def sqlstr(v: str) -> str:
        return " || ".join(f"chr({ord(ch)})" for ch in v)

    named_arms = "\n        ".join(
        f"WHEN '&{n};' THEN {sqlstr(v)}"
        for n, v in NAMED_ENTITY_MAP.items())
    c1_list = "[" + ", ".join(str(v) for v in C1_REMAP) + "]"
    lanes = [
        "'Fish &amp; Chips &lt;b&gt;&quot;x&quot;&apos;y&apos; '",
        "'caf&eacute; = caf&#233; = caf&#xE9; &Auml;&szlig;&frac12; '",
        "'smart &#147;quotes&#148; it&#x92;s &permil;&hellip; '",
        "'bad &#0; &#x110000; &#xD800; &#57343; &#9999999; '",
        "'unknown &bogus123; bare & amp; &x; &#x; &#; &#xG1; '",
        "'drop[&#1;&#31;&#127;&#xFDD0;&#xFFFE;&#x1FFFF;]keep[&#9;&#13;] '",
        "'astral &#x1F600;=&#128512; edge &#x10FFFD; nb:&nbsp;&shy;: '",
        "'plain pass-through '",
    ]
    lane_arms = "\n           ".join(
        f"WHEN {k} THEN {lanes[k]}" for k in range(8))
    return f"""
WITH u AS (
  SELECT doc_id,
         (CASE doc_id % 8
           {lane_arms}
          END) || substr(text, 1, 48) AS raw
  FROM documents),
t AS (
  SELECT doc_id, raw,
         regexp_extract_all(raw,
           '(&#[0-9]{{1,7}};|&#[xX][0-9A-Fa-f]{{1,6}};' ||
           '|&[a-zA-Z][a-zA-Z0-9]{{1,31}};|[^&]+|&)', 0) AS toks
  FROM u),
s1 AS (
  SELECT doc_id, raw,
    list_transform(toks, s -> struct_pack(
      s := s,
      cp := CASE
        WHEN regexp_matches(s, '^&#[0-9]{{1,7}};$')
          THEN CAST(substr(s, 3, len(s) - 3) AS BIGINT)
        WHEN regexp_matches(s, '^&#[xX][0-9A-Fa-f]{{1,6}};$')
          THEN CAST('0x' || substr(s, 4, len(s) - 4) AS BIGINT)
        ELSE NULL END)) AS l1
  FROM t),
s2 AS (
  SELECT doc_id, raw,
    list_transform(l1, x -> struct_pack(
      s := x.s,
      isnum := x.cp IS NOT NULL,
      cp := CASE WHEN x.cp BETWEEN 128 AND 159
                 THEN {c1_list}[CAST(x.cp AS INTEGER) - 127]
                 ELSE x.cp END)) AS l2
  FROM s1),
dec AS (
  SELECT doc_id, raw,
    COALESCE(array_to_string(list_transform(l2, x ->
      CASE
        WHEN NOT x.isnum THEN
          CASE x.s
        {named_arms}
          ELSE x.s END
        WHEN x.cp <= 0 OR x.cp > 1114111
             OR x.cp BETWEEN 55296 AND 57343 THEN chr(65533)
        WHEN (x.cp BETWEEN 1 AND 8) OR x.cp = 11
             OR (x.cp BETWEEN 14 AND 31) OR x.cp = 127
             OR (x.cp BETWEEN 64976 AND 65007)
             OR (x.cp % 65536) >= 65534 THEN ''
        ELSE chr(CAST(x.cp AS INTEGER))
      END), ''), '') AS decoded
  FROM s2)
SELECT doc_id, raw, decoded, CAST(len(decoded) AS INT) AS n_decoded
FROM dec
"""


def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators/textnorm.nfc_normalize):
    planted canonical-equivalence lanes — decomposed e+ACUTE,
    A+RING-ABOVE, ANGSTROM-SIGN singleton, combining-mark canonical
    REORDERING (dot-below sorts before dot-above), Hangul jamo
    composition, already-composed control lane.  Engine = pandas UDF
    over CPython unicodedata; oracle = DuckDB nfc_normalize
    (utf8proc) — two independent Unicode implementations must agree
    exactly."""
    from biothings_crawler_spark.operators.textnorm import nfc_normalize

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    lanes = [
        "cafe\u0301",                          # e + COMBINING ACUTE
        "A\u030angstrom",                      # A + COMBINING RING ABOVE
        "\u212bngstr\u00f6m",                  # ANGSTROM SIGN singleton
        "q\u0307\u0323-reorder",               # dot-above then dot-below
        "\u1100\u1161\u11a8-hangul",           # jamo -> syllable GAG
        "caf\u00e9-composed",                  # already NFC
    ]
    raw = F.when(i % 6 == 0, F.lit(lanes[0]))
    for k in range(1, 6):
        raw = raw.when(i % 6 == k, F.lit(lanes[k]))
    raw = F.concat(raw, F.lit(" "), F.substring(F.col("text"), 1, 32))
    base = d.select("doc_id", raw.alias("raw"))
    out = nfc_normalize(base, "raw", "nfc")
    return out.select(
        "doc_id", "raw", "nfc",
        (F.col("raw") != F.col("nfc")).alias("changed"),
        F.length("nfc").alias("n_nfc"))


def _sql_nfc_oracle() -> str:
    lanes = [
        "'cafe' || chr(769)",
        "'A' || chr(778) || 'ngstrom'",
        "chr(8491) || 'ngstr' || chr(246) || 'm'",
        "'q' || chr(775) || chr(803) || '-reorder'",
        "chr(4352) || chr(4449) || chr(4520) || '-hangul'",
        "'caf' || chr(233) || '-composed'",
    ]
    arms = "\n           ".join(
        f"WHEN {k} THEN {lanes[k]}" for k in range(6))
    return f"""
WITH u AS (
  SELECT doc_id,
         (CASE doc_id % 6
           {arms}
          END) || ' ' || substr(text, 1, 32) AS raw
  FROM documents)
SELECT doc_id, raw, nfc_normalize(raw) AS nfc,
       raw <> nfc_normalize(raw) AS changed,
       CAST(len(nfc_normalize(raw)) AS INT) AS n_nfc
FROM u
"""


SQL_HTML_ENTITIES = _sql_entity_oracle()
SQL_NFC_NORMALIZE = _sql_nfc_oracle()


def q_chunked_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP/1.1 chunked Transfer-Encoding decode (operators/http.
    dechunk_col): six framing lanes — multi-chunk, chunk extension,
    zero-only body, trailer section, bad chunk terminator, truncated
    data, missing final zero chunk.  The Spark path is one bounded
    expression fold (aggregate over sequence); the oracle re-walks the
    framing with DuckDB list_reduce and its own strpos/substr
    arithmetic."""
    from biothings_crawler_spark.operators.http import dechunk_col

    d = _t(spark, sf_dir, "documents")
    i, text = F.col("doc_id"), F.col("text")
    nl = "\r\n"
    p16 = F.rpad(F.substring(text, 1, 16), 16, "x")
    p10 = F.rpad(F.substring(text, 18, 10), 10, "y")
    lanes = [
        F.concat(F.lit("10" + nl), p16, F.lit(nl + "a" + nl), p10,
                 F.lit(nl + "0" + nl + nl)),
        F.concat(F.lit("10;x=1" + nl), p16,
                 F.lit(nl + "0" + nl + "X-T: v" + nl + nl)),
        F.lit("0" + nl + nl),
        F.concat(F.lit("10" + nl), p16, F.lit("ZZ0" + nl + nl)),
        F.concat(F.lit("10" + nl), F.substring(p16, 1, 8)),
        F.concat(F.lit("a" + nl), p10, F.lit(nl)),
    ]
    body = F.when(i % 6 == 0, lanes[0])
    for k in range(1, 6):
        body = body.when(i % 6 == k, lanes[k])
    # Stage body and the fold result as NAMED columns: the fold's step
    # expression references body ~20x, and the select reads the result
    # struct 3x — staged projections keep those references as leaf
    # attributes instead of re-embedding the trees (34s -> sub-second
    # Catalyst analysis at sf0.01).
    staged = (d.withColumn("body", body)
              .withColumn("s", dechunk_col(F.col("body"))))
    return staged.select(
        "doc_id", "body",
        F.col("s")["ok"].alias("ok"), F.col("s")["text"].alias("text"),
        F.length(F.col("s")["text"]).alias("n_text"))


def _sql_chunked_oracle(max_chunks: int = 24) -> str:
    """DuckDB list_reduce twin of dechunk_col.  Field order in the
    accumulator struct is deliberate: DuckDB materializes struct
    fields in literal order and later field expressions observe the
    ALREADY-UPDATED earlier fields, so the cursor (pos) goes LAST and
    the out/done/pos expressions are written against that semantics
    (equivalence with Spark's all-from-old-state evaluation argued
    field-by-field: divergent branches are reachable only when the
    final observable is already frozen)."""
    def locs(pos):
        rest = f"substr(body, CAST({pos} AS INTEGER))"
        le = f"strpos({rest}, chr(13)||chr(10))"
        line = f"substr({rest}, 1, greatest({le} - 1, 0))"
        hexs = f"regexp_extract({line}, '^([0-9A-Fa-f]{{1,7}})', 1)"
        size = f"TRY_CAST(('0x' || {hexs}) AS BIGINT)"
        data = (f"substr({rest}, CAST({le} + 2 AS INTEGER), "
                f"CAST(COALESCE({size},0) AS INTEGER))")
        term = (f"substr({rest}, CAST({le} + 2 + COALESCE({size},0) "
                f"AS INTEGER), 2)")
        step_ok = (
            f"({le} > 0 AND {hexs} <> '' AND {size} IS NOT NULL AND "
            f"({size} = 0 OR (len({data}) = {size} "
            f"AND {term} = chr(13)||chr(10))))")
        return le, size, data, step_ok

    le, size, data, step_ok = locs("acc.pos")
    return f"""
WITH u AS (
  SELECT doc_id,
         rpad(substr(text, 1, 16), 16, 'x') AS p16,
         rpad(substr(text, 18, 10), 10, 'y') AS p10
  FROM documents),
b AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN '10' || chr(13)||chr(10) || p16 || chr(13)||chr(10)
                  || 'a' || chr(13)||chr(10) || p10 || chr(13)||chr(10)
                  || '0' || chr(13)||chr(10) || chr(13)||chr(10)
      WHEN 1 THEN '10;x=1' || chr(13)||chr(10) || p16 || chr(13)||chr(10)
                  || '0' || chr(13)||chr(10) || 'X-T: v'
                  || chr(13)||chr(10) || chr(13)||chr(10)
      WHEN 2 THEN '0' || chr(13)||chr(10) || chr(13)||chr(10)
      WHEN 3 THEN '10' || chr(13)||chr(10) || p16 || 'ZZ0'
                  || chr(13)||chr(10) || chr(13)||chr(10)
      WHEN 4 THEN '10' || chr(13)||chr(10) || substr(p16, 1, 8)
      ELSE 'a' || chr(13)||chr(10) || p10 || chr(13)||chr(10)
    END AS body
  FROM u),
r AS (
  SELECT doc_id, body,
    list_reduce(
      list_prepend(
        struct_pack(ok := true, outp := '', done := false,
                    pos := CAST(1 AS BIGINT)),
        list_transform(range({max_chunks}), i ->
          struct_pack(ok := true, outp := '', done := false,
                      pos := CAST(1 AS BIGINT)))),
      (acc, x) -> struct_pack(
        ok := CASE WHEN acc.done OR NOT acc.ok THEN acc.ok
                   ELSE {step_ok} END,
        outp := CASE WHEN NOT acc.ok OR acc.done THEN acc.outp
                     WHEN COALESCE({size},0) = 0 THEN acc.outp
                     ELSE acc.outp || {data} END,
        done := CASE WHEN acc.done THEN true WHEN NOT acc.ok THEN false
                     ELSE COALESCE({size},-1) = 0 END,
        pos := CASE WHEN acc.done OR NOT acc.ok THEN acc.pos
                    ELSE acc.pos + {le} + 1 + {size} + 2 END)) AS s
  FROM b)
SELECT doc_id, body, (s.ok AND s.done) AS ok,
       CASE WHEN s.ok AND s.done THEN s.outp END AS text,
       CAST(CASE WHEN s.ok AND s.done THEN len(s.outp) END AS INT)
         AS n_text
FROM r
"""


SQL_CHUNKED_DECODE = _sql_chunked_oracle()



def q_gzip_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gzip member decode (operators/http.gen_gzip_stored +
    gunzip_report): six lanes — 2-block member with FNAME, plain
    1-block member, bad magic, corrupted CRC, truncated stream, wrong
    ISIZE.  The engine inflates with REAL zlib (raw-deflate window) and
    verifies CRC32/ISIZE; the fixture encoder emits STORED deflate
    blocks (framing only, so the decoder never runs against its own
    inverse — a hand-crafted spec golden pins it in pytest).  The
    oracle REBUILDS each member byte-for-byte in SQL — including CRC32
    via its own table fold, checked against zlib's through the
    byte-identical payload_hex column — and derives the expected decode
    by construction."""
    from biothings_crawler_spark.operators.http import (
        gen_gzip_stored, gunzip_report)

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.rpad(F.substring("text", 1, 20), 20, "a").alias("p1"),
        F.rpad(F.substring("text", 22, 12), 12, "b").alias("p2"))

    def build(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, p1, p2 in zip(pdf["doc_id"], pdf["p1"], pdf["p2"]):
                i = int(i)
                lane = i % 6
                if lane == 0:
                    b = gen_gzip_stored(
                        (p1 + p2).encode("latin-1"), fname=f"d{i}",
                        mtime=1_000_000 + i, block=20)
                else:
                    b = bytearray(gen_gzip_stored(
                        p1.encode("latin-1"), mtime=i))
                    if lane == 2:
                        b[0] = 0x1E
                    elif lane == 3:
                        b[-8] ^= 0xFF
                    elif lane == 4:
                        b = b[:-3]
                    elif lane == 5:
                        b[-4] = (b[-4] + 1) % 256
                    b = bytes(b)
                rows.append((i, b))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = d.mapInPandas(build, schema="doc_id long, payload binary")
    return gunzip_report(payloads, "doc_id", "payload")


def _sql_gzip_oracle() -> str:
    """SQL twin that BUILDS each gzip member independently (hex
    assembly + CRC32 table fold over the text bytes) and states the
    expected decode by construction; byte identity of payload_hex is
    what ties the two builders — and their two CRC32 implementations —
    together."""
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (0xEDB88320 ^ (c >> 1)) if c & 1 else c >> 1
        tbl.append(c)
    TBL = "[" + ", ".join(str(v) for v in tbl) + "]"

    def crc(s: str) -> str:
        return (
            f"xor(list_reduce(list_prepend(CAST(4294967295 AS BIGINT), "
            f"list_transform(range(1, len({s}) + 1), i -> "
            f"CAST(ascii(substr({s}, CAST(i AS INTEGER), 1)) AS BIGINT))), "
            f"(a, c) -> xor(({TBL})[CAST(xor(a, c) & 255 AS INTEGER) + 1], "
            f"a >> 8)), 4294967295)"
        )

    def bh(x: str) -> str:
        return f"lpad(upper(hex(CAST(({x}) AS BIGINT))), 2, '0')"

    def le2(x: str) -> str:
        return f"({bh(f'({x}) % 256')} || {bh(f'({x}) // 256')})"

    def le4(x: str) -> str:
        return (f"({bh(f'({x}) % 256')} || {bh(f'(({x}) // 256) % 256')} || "
                f"{bh(f'(({x}) // 65536) % 256')} || "
                f"{bh(f'(({x}) // 16777216) % 256')})")

    block1_p1 = f"('01' || {le2('20')} || {le2('65515')} || hex(p1))"
    lane1 = (f"('1F8B08' || '00' || {le4('doc_id')} || '0003' || "
             f"{block1_p1} || {le4('c1')} || {le4('20')})")
    lane0 = (f"('1F8B08' || '08' || {le4('1000000 + doc_id')} || '0003' || "
             f"hex('d' || CAST(doc_id AS VARCHAR)) || '00' || "
             f"'00' || {le2('20')} || {le2('65515')} || hex(p1) || "
             f"'01' || {le2('12')} || {le2('65523')} || hex(p2) || "
             f"{le4('c12')} || {le4('32')})")
    lane3 = (f"('1F8B08' || '00' || {le4('doc_id')} || '0003' || "
             f"{block1_p1} || {le4('xor(c1, 255)')} || {le4('20')})")
    lane5 = (f"('1F8B08' || '00' || {le4('doc_id')} || '0003' || "
             f"{block1_p1} || {le4('c1')} || {le4('21')})")
    return f"""
WITH u AS (
  SELECT doc_id,
         rpad(substr(text, 1, 20), 20, 'a') AS p1,
         rpad(substr(text, 22, 12), 12, 'b') AS p2
  FROM documents),
c AS (
  SELECT doc_id, p1, p2,
         {crc('p1')} AS c1,
         {crc('p1 || p2')} AS c12
  FROM u),
b AS (
  SELECT doc_id, p1, p2,
    CASE doc_id % 6
      WHEN 0 THEN {lane0}
      WHEN 1 THEN {lane1}
      WHEN 2 THEN '1E' || substr({lane1}, 3)
      WHEN 3 THEN {lane3}
      WHEN 4 THEN substr({lane1}, 1, len({lane1}) - 6)
      ELSE {lane5}
    END AS payload_hex
  FROM c)
SELECT doc_id, payload_hex,
  (doc_id % 6) IN (0, 1) AS valid,
  CASE doc_id % 6 WHEN 0 THEN p1 || p2 WHEN 1 THEN p1 END AS text,
  CASE doc_id % 6 WHEN 0 THEN 'd' || CAST(doc_id AS VARCHAR) END AS fname,
  CASE doc_id % 6 WHEN 0 THEN 1000000 + doc_id WHEN 1 THEN doc_id
    END AS mtime
FROM b
"""


SQL_GZIP_DECODE = _sql_gzip_oracle()



def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/cdc.cdc_chunks): gear-hash
    boundaries with min/max clamps over a doubled document text (long
    enough for several cuts per doc).  The Spark path is one JVM
    expression fold per row; the oracle re-walks the same gear recipe
    with DuckDB list_reduce (shared gear LUT, independent fold/explode
    logic).  chunk_md5 keys the downstream storage-dedup aggregate."""
    from biothings_crawler_spark.operators.cdc import cdc_chunks

    # Fixed 301-char text: uniform fold length bounds the per-row work
    # on BOTH engines and sidesteps DuckDB 1.0's varying-length
    # list_reduce corruption by construction (see the oracle docstring).
    # row-local fold: spread the single parquet split across cores
    d = (_t(spark, sf_dir, "documents").repartition(32, "doc_id")
         .select("doc_id",
                 F.substring(
                     F.rpad(F.concat("text", F.lit(" "), "text"),
                            301, "."), 1, 301).alias("t")))
    return cdc_chunks(d, "doc_id", "t")


def _sql_cdc_oracle() -> str:
    """DuckDB twin of the gear CDC fold.  Two DuckDB 1.0 lambda quirks
    shape this SQL: (1) a LIST-typed field in a list_reduce struct
    accumulator silently loses appended elements across steps, so cut
    positions accumulate as a comma-delimited STRING; (2) list_reduce
    over PER-ROW-VARYING list lengths corrupts accumulator state
    across rows in a vector (rows receive other rows' intermediate
    values), so every row folds over the SAME max-length range with
    no-op steps past its own length."""
    from biothings_crawler_spark.operators.cdc import GEAR, MOD48

    G = "[" + ", ".join(str(v) for v in GEAR) + "]"
    h2 = (f"((acc.h * 2 + ({G})[(ascii(substr(t, x.last, 1)) % 256) + 1]) "
          f"% {MOD48})")
    cut = (f"(((x.last - acc.last >= 8) AND (({h2} & 31) = 0)) "
           f"OR (x.last - acc.last >= 128))")
    live = "(x.last <= len(t))"
    return f"""
WITH u AS (
  SELECT doc_id,
         substr(rpad(text || ' ' || text, 301, '.'), 1, 301) AS t
  FROM documents),
m AS (SELECT max(len(t)) AS mx FROM u),
f AS (
  SELECT doc_id, t,
    list_reduce(
      list_prepend(
        struct_pack(cuts := '', last := 0, h := CAST(0 AS BIGINT)),
        list_transform(range(1, (SELECT mx FROM m) + 1), i ->
          struct_pack(cuts := '', last := CAST(i AS INTEGER),
                      h := CAST(0 AS BIGINT)))),
      (acc, x) -> struct_pack(
        cuts := CASE WHEN {live} AND {cut}
                     THEN acc.cuts || ',' || CAST(x.last AS VARCHAR)
                     ELSE acc.cuts END,
        last := CASE WHEN {live} AND {cut} THEN x.last
                     ELSE acc.last END,
        h := CASE WHEN {live} THEN {h2} ELSE acc.h END)) AS st
  FROM u),
c AS (
  SELECT doc_id, t,
    list_transform(
      string_split(trim(
        CASE WHEN st.last = len(t) THEN st.cuts
             ELSE st.cuts || ',' || CAST(len(t) AS VARCHAR) END, ','), ','),
      s -> CAST(s AS INTEGER)) AS cuts
  FROM f)
SELECT doc_id,
  CAST(k - 1 AS INT) AS chunk_no,
  CAST(CASE WHEN k = 1 THEN 1 ELSE cuts[CAST(k - 1 AS INTEGER)] + 1 END
    AS INT) AS start,
  CAST(cuts[CAST(k AS INTEGER)]
       - CASE WHEN k = 1 THEN 0 ELSE cuts[CAST(k - 1 AS INTEGER)] END
    AS INT) AS chunk_len,
  md5(substr(t,
        CASE WHEN k = 1 THEN 1 ELSE cuts[CAST(k - 1 AS INTEGER)] + 1 END,
        cuts[CAST(k AS INTEGER)]
        - CASE WHEN k = 1 THEN 0 ELSE cuts[CAST(k - 1 AS INTEGER)] END))
    AS chunk_md5
FROM c, unnest(range(1, len(cuts) + 1)) AS s(k)
"""


SQL_CDC_CHUNKS = _sql_cdc_oracle()



def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order layout key (layout.zorder_key_col): interleave
    (n_chars, doc_id) and answer a rectangle query through the coarse
    z-range bound [z(a0,b0), z(a1,b1)] plus the exact per-column
    predicates — the pruning pattern a z-ordered parquet reader pushes
    into min/max stats.  The oracle re-derives the five shift/mask
    spread rounds in staged SQL CTEs."""
    from biothings_crawler_spark.layout import (
        zorder_key_col, zorder_key_py)

    a0, a1, b0, b1 = 100, 400, 50, 350
    zlo, zhi = zorder_key_py(a0, b0), zorder_key_py(a1, b1)
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("a"), F.col("doc_id").alias("b"))
    keyed = d.withColumn("zkey", zorder_key_col(F.col("a"), F.col("b")))
    return (keyed
            .filter((F.col("zkey") >= zlo) & (F.col("zkey") <= zhi))
            .filter((F.col("a") >= a0) & (F.col("a") <= a1)
                    & (F.col("b") >= b0) & (F.col("b") <= b1))
            .select("doc_id", "a", "b", "zkey"))


def _sql_zorder_oracle() -> str:
    from biothings_crawler_spark.layout import _SPREAD, zorder_key_py

    a0, a1, b0, b1 = 100, 400, 50, 350
    zlo, zhi = zorder_key_py(a0, b0), zorder_key_py(a1, b1)
    stages = []
    prev = "s0"
    for k, (sh, mask) in enumerate(_SPREAD, start=1):
        stages.append(
            f"s{k} AS (SELECT doc_id, a, b, "
            f"(ax | (ax << {sh})) & {mask} AS ax, "
            f"(bx | (bx << {sh})) & {mask} AS bx FROM {prev})")
        prev = f"s{k}"
    chain = ",\n".join(stages)
    return f"""
WITH s0 AS (
  SELECT doc_id, n_chars AS a, doc_id AS b,
         (n_chars & 2147483647) AS ax,
         (doc_id & 2147483647) AS bx
  FROM documents),
{chain}
SELECT doc_id, a, b, (ax | (bx << 1)) AS zkey
FROM {prev}
WHERE (ax | (bx << 1)) BETWEEN {zlo} AND {zhi}
  AND a BETWEEN {a0} AND {a1} AND b BETWEEN {b0} AND {b1}
"""


SQL_ZORDER_KEY = _sql_zorder_oracle()



def q_delta_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-storage composition: two crawl rounds of the same pages ->
    gear-CDC chunk both -> round 2 stores ONLY chunks whose hash is
    absent from the round-1 store (cross-document dedup against the
    whole archive).  One doc class takes a length-preserving mid-page
    edit, one is appended-to via tail rewrite; the rest are unchanged
    and must store ZERO new bytes.  Spark shape: two row-local chunk
    projections, one distinct hash set, one anti-join, one hash
    aggregate; the oracle states the whole composition as ONE DuckDB
    statement."""
    from biothings_crawler_spark.operators.cdc import cdc_chunks

    base = (_t(spark, sf_dir, "documents").repartition(32, "doc_id")
            .select("doc_id",
                    F.substring(
                        F.rpad(F.concat("text", F.lit(" "), "text"),
                               301, "."), 1, 301).alias("t1")))
    t2 = (F.when(F.col("doc_id") % 5 == 0,
                 F.concat(F.lit("EDIT! "),
                          F.substring(F.col("t1"), 7, 295)))
          .when(F.col("doc_id") % 5 == 1,
                F.concat(F.substring(F.col("t1"), 1, 281),
                         F.lit(" tail-rewrite v2 etc")))
          .otherwise(F.col("t1")))
    rounds = base.withColumn("t2", t2)

    c1 = cdc_chunks(rounds.select("doc_id", "t1"), "doc_id", "t1")
    c2 = cdc_chunks(rounds.select("doc_id", "t2"), "doc_id", "t2")
    store = c1.select("chunk_md5").distinct()
    new = c2.join(F.broadcast(store), "chunk_md5", "left_anti")
    totals = c2.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum("chunk_len").cast("long").alias("total_bytes"))
    news = new.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_new_chunks"),
        F.sum("chunk_len").cast("long").alias("new_bytes"))
    return (totals.join(news, "doc_id", "left")
            .select("doc_id", "n_chunks", "total_bytes",
                    F.coalesce("n_new_chunks", F.lit(0)).cast("int")
                     .alias("n_new_chunks"),
                    F.coalesce("new_bytes", F.lit(0)).cast("long")
                     .alias("new_bytes")))


def _sql_delta_storage_oracle() -> str:
    """ONE-statement DuckDB twin: both rounds fold through the same
    padded gear recipe (fixed 301-char texts keep every row's fold the
    same length — the varying-length list_reduce corruption workaround)
    and the store/anti-join/aggregate run as plain SQL."""
    from biothings_crawler_spark.operators.cdc import GEAR, MOD48

    G = "[" + ", ".join(str(v) for v in GEAR) + "]"

    def fold(tcol: str) -> str:
        h2 = (f"((acc.h * 2 + ({G})[(ascii(substr({tcol}, x.last, 1)) "
              f"% 256) + 1]) % {MOD48})")
        cut = (f"(((x.last - acc.last >= 8) AND (({h2} & 31) = 0)) "
               f"OR (x.last - acc.last >= 128))")
        return f"""list_reduce(
      list_prepend(
        struct_pack(cuts := '', last := 0, h := CAST(0 AS BIGINT)),
        list_transform(range(1, 302), i ->
          struct_pack(cuts := '', last := CAST(i AS INTEGER),
                      h := CAST(0 AS BIGINT)))),
      (acc, x) -> struct_pack(
        cuts := CASE WHEN {cut}
                     THEN acc.cuts || ',' || CAST(x.last AS VARCHAR)
                     ELSE acc.cuts END,
        last := CASE WHEN {cut} THEN x.last ELSE acc.last END,
        h := {h2}))"""

    explode = """
  SELECT doc_id, t,
    CASE WHEN k = 1 THEN 1 ELSE cuts[CAST(k - 1 AS INTEGER)] + 1 END
      AS start,
    cuts[CAST(k AS INTEGER)]
      - CASE WHEN k = 1 THEN 0 ELSE cuts[CAST(k - 1 AS INTEGER)] END
      AS chunk_len
  FROM {src}, unnest(range(1, len(cuts) + 1)) AS s(k)"""

    return f"""
WITH base AS (
  SELECT doc_id,
         substr(rpad(text || ' ' || text, 301, '.'), 1, 301) AS t1
  FROM documents),
rounds AS (
  SELECT doc_id, t1,
    CASE
      WHEN doc_id % 5 = 0 THEN 'EDIT! ' || substr(t1, 7, 295)
      WHEN doc_id % 5 = 1 THEN substr(t1, 1, 281) || ' tail-rewrite v2 etc'
      ELSE t1 END AS t2
  FROM base),
f1 AS (
  SELECT doc_id, t1 AS t, {fold('t1')} AS st FROM rounds),
f2 AS (
  SELECT doc_id, t2 AS t, {fold('t2')} AS st FROM rounds),
c1 AS (
  SELECT doc_id, t,
    list_transform(string_split(trim(
      CASE WHEN st.last = len(t) THEN st.cuts
           ELSE st.cuts || ',' || CAST(len(t) AS VARCHAR) END, ','), ','),
      s -> CAST(s AS INTEGER)) AS cuts
  FROM f1),
c2 AS (
  SELECT doc_id, t,
    list_transform(string_split(trim(
      CASE WHEN st.last = len(t) THEN st.cuts
           ELSE st.cuts || ',' || CAST(len(t) AS VARCHAR) END, ','), ','),
      s -> CAST(s AS INTEGER)) AS cuts
  FROM f2),
e1 AS ({explode.format(src='c1')}),
e2 AS ({explode.format(src='c2')}),
h1 AS (
  SELECT DISTINCT md5(substr(t, start, chunk_len)) AS chunk_md5
  FROM e1),
h2 AS (
  SELECT doc_id, chunk_len, md5(substr(t, start, chunk_len)) AS chunk_md5
  FROM e2),
news AS (
  SELECT doc_id, count(*) AS n_new_chunks, sum(chunk_len) AS new_bytes
  FROM h2 ANTI JOIN h1 USING (chunk_md5)
  GROUP BY doc_id)
SELECT h2.doc_id,
       CAST(count(*) AS INT) AS n_chunks,
       CAST(sum(h2.chunk_len) AS BIGINT) AS total_bytes,
       CAST(COALESCE(any_value(news.n_new_chunks), 0) AS INT)
         AS n_new_chunks,
       CAST(COALESCE(any_value(news.new_bytes), 0) AS BIGINT) AS new_bytes
FROM h2 LEFT JOIN news ON h2.doc_id = news.doc_id
GROUP BY h2.doc_id
"""


SQL_DELTA_STORAGE = _sql_delta_storage_oracle()



def q_typosquat_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 host pairs (operators/typosquat.typosquat_pairs,
    FastSS deletion-neighborhood equi-join — no crossJoin): fixture
    plants substitution / deletion / insertion typos of a base host
    family plus unrelated controls.  The oracle re-derives the pairs
    INDEPENDENTLY by brute force: DuckDB cross-joins the (small)
    distinct host set and keeps levenshtein = 1 — so the banding join
    is checked against exhaustive truth, recall included."""
    from biothings_crawler_spark.operators.typosquat import (
        typosquat_pairs)

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    base = F.concat(F.lit("host"), (i % 20).cast("string"),
                    F.lit(".example.org"))
    host = (
        F.when(i % 11 == 3,
               F.concat(F.lit("hosst"), (i % 20).cast("string"),
                        F.lit(".example.org")))        # insertion
        .when(i % 11 == 7,
              F.concat(F.lit("hst"), (i % 20).cast("string"),
                       F.lit(".example.org")))         # deletion
        .when(i % 11 == 5,
              F.concat(F.lit("hast"), (i % 20).cast("string"),
                       F.lit(".example.org")))         # substitution
        .when(i % 11 == 9,
              F.concat(F.lit("unrelated"), (i % 7).cast("string"),
                       F.lit(".example.net")))         # control
        .otherwise(base))
    return typosquat_pairs(d.select(host.alias("host")), "host")


SQL_TYPOSQUAT_PAIRS = """
WITH h AS (
  SELECT DISTINCT
    CASE
      WHEN doc_id % 11 = 3 THEN 'hosst' || CAST(doc_id % 20 AS VARCHAR)
        || '.example.org'
      WHEN doc_id % 11 = 7 THEN 'hst' || CAST(doc_id % 20 AS VARCHAR)
        || '.example.org'
      WHEN doc_id % 11 = 5 THEN 'hast' || CAST(doc_id % 20 AS VARCHAR)
        || '.example.org'
      WHEN doc_id % 11 = 9 THEN 'unrelated' || CAST(doc_id % 7 AS VARCHAR)
        || '.example.net'
      ELSE 'host' || CAST(doc_id % 20 AS VARCHAR) || '.example.org'
    END AS host
  FROM documents)
SELECT a.host AS host_a, b.host AS host_b
FROM h a, h b
WHERE a.host < b.host AND levenshtein(a.host, b.host) = 1
"""



def _bpe_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biothings_crawler_spark.operators.bpe import word_counts
    return word_counts(_t(spark, sf_dir, "documents"), "text")


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training (operators/bpe.bpe_train): 6 rounds of
    weighted adjacent-pair counting + greedy merge over the corpus
    word table.  The oracle replays the SAME training loop as chained
    SQL CTEs — per round one pair aggregate, one deterministic argmax
    (cnt DESC, left ASC, right ASC), one padded string-fold merge
    application — and must land on the identical merge table."""
    from biothings_crawler_spark.operators.bpe import bpe_train

    merges, _ = bpe_train(spark, _bpe_words(spark, sf_dir), n_merges=6)
    return spark.createDataFrame(
        merges, "rank int, lft string, rgt string, cnt long")


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final BPE segmentation of every corpus word after the 6 learned
    merges — the per-word evidence that engine and oracle walked the
    same training trajectory (a divergence at ANY round changes
    downstream segment strings)."""
    from biothings_crawler_spark.operators.bpe import bpe_train

    _, seg = bpe_train(spark, _bpe_words(spark, sf_dir), n_merges=6)
    return seg.select("w", "weight", "seq")


def _sql_bpe_oracle(n_merges: int = 6, max_tokens: int = 14,
                    final: str = "merges") -> str:
    """Chained-CTE DuckDB twin of bpe_train.  The merge-application
    fold keeps string-only state padded to a fixed length (both
    v1.0.0 list_reduce pitfalls avoided); the round's best pair is
    CROSS JOINed into the row first because DuckDB lambdas cannot
    contain subqueries."""
    def fold() -> str:
        # SINGLE-field string state 'out<US>prev' (US = chr(31)):
        # experiments show DuckDB 1.0 struct-accumulator lambdas read
        # sibling fields PRE-update at small row counts but POST-update
        # past ~tens of rows (vector-strategy dependent), so any fold
        # whose field reads another mutated field is row-count-unsound.
        # One field reading only ITSELF is safe in either order.
        # Tokens come off the plain STRING via split_part (a varying-
        # length LIST column inside a lambda corrupts across rows —
        # the CDC oracle documents that sibling bug).
        live = "(x.i <= len(seq) - len(replace(seq, ' ', '')) + 1)"
        t = "split_part(seq, ' ', x.i)"
        op = "split_part(acc.s, chr(31), 1)"
        pv = "split_part(acc.s, chr(31), 2)"
        merging = f"({pv} = ma AND {t} = mb)"
        new_out = (f"CASE WHEN NOT {live} OR {merging} OR {pv} = '' "
                   f"THEN {op} WHEN {op} = '' THEN {pv} "
                   f"ELSE {op} || ' ' || {pv} END")
        new_prev = (f"CASE WHEN NOT {live} THEN {pv} "
                    f"WHEN {merging} THEN ma || mb ELSE {t} END")
        return f"""list_reduce(
      list_prepend(struct_pack(s := chr(31), i := 0),
        list_transform(range(1, {max_tokens} + 1), j ->
          struct_pack(s := '', i := CAST(j AS INTEGER)))),
      (acc, x) -> struct_pack(
        s := ({new_out}) || chr(31) || ({new_prev}),
        i := 0))"""

    rounds = []
    for k in range(1, n_merges + 1):
        rounds.append(f"""p{k} AS (
  SELECT toks[CAST(i AS INTEGER)] AS a,
         toks[CAST(i AS INTEGER) + 1] AS b,
         CAST(sum(weight) AS BIGINT) AS cnt
  FROM (SELECT weight, string_split(seq, ' ') AS toks FROM s{k-1}) t,
       unnest(range(1, len(toks))) u(i)
  GROUP BY 1, 2),
b{k} AS (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
j{k} AS (
  SELECT w, weight, seq, b.a AS ma, b.b AS mb
  FROM s{k-1}, b{k} b),
f{k} AS (
  SELECT w, weight, {fold()} AS st FROM j{k}),
s{k} AS (
  SELECT w, weight,
    split_part(st.s, chr(31), 1)
    || CASE WHEN split_part(st.s, chr(31), 2) = '' THEN ''
            ELSE ' ' || split_part(st.s, chr(31), 2) END AS seq
  FROM f{k})""")
    chain = ",\n".join(rounds)
    if final == "merges":
        sel = "\nUNION ALL\n".join(
            f"SELECT CAST({k-1} AS INT) AS rank, a AS lft, b AS rgt, cnt "
            f"FROM b{k}" for k in range(1, n_merges + 1))
    else:
        sel = f"SELECT w, weight, seq FROM s{n_merges}"
    return f"""
WITH wc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS weight
  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE len(w) > 0 AND len(w) <= 12
  GROUP BY w),
s0 AS (
  SELECT w, weight,
    array_to_string(list_transform(range(1, len(w) + 1),
      i -> substr(w, CAST(i AS INTEGER), 1)), ' ') || ' $' AS seq
  FROM wc),
{chain}
{sel}
"""


SQL_BPE_MERGES = _sql_bpe_oracle(final="merges")
SQL_BPE_SEGMENT = _sql_bpe_oracle(final="segment")



def q_payload_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE ingest text path in one chain: gzip member -> real
    zlib inflate (+CRC/ISIZE) -> windows-1252 charset decode (JVM
    encode/decode; the latin-1 text column out of gunzip_report is
    byte-preserving by construction) -> HTML character-reference
    decode -> Unicode NFC.  The fixture's original bytes contain a
    cp1252 smart-quote pair (0x93/0x94), an entity that decodes to a
    COMBINING mark ('cafe&#769;' -> 'cafe' + U+0301, which only NFC
    folds to U+00E9), and '&amp;' — so every stage is load-bearing.
    One lane ships truncated and must come out NULL.  The oracle
    rebuilds the member bytes independently (builder + table-fold
    CRC32 over the cp1252 BYTES) and states the final text by
    construction with chr() arithmetic."""
    from biothings_crawler_spark.operators.http import (
        gen_gzip_stored, gunzip_report)
    from biothings_crawler_spark.operators.textnorm import (
        cp1252_from_latin1_col, decode_entities_col, nfc_normalize)

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.rpad(F.substring("text", 1, 16), 16, "w").alias("p1"))

    def build(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, p1 in zip(pdf["doc_id"], pdf["p1"]):
                i = int(i)
                original = (b"cafe&#769; &amp; \x93" + b"fish\x94 "
                            + p1.encode("latin-1"))
                b = gen_gzip_stored(original, mtime=i, block=20)
                if i % 7 == 3:
                    b = b[:-5]  # truncated member -> invalid
                rows.append((i, b))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = d.mapInPandas(build, schema="doc_id long, payload binary")
    g = gunzip_report(payloads, "doc_id", "payload")
    txt1252 = cp1252_from_latin1_col(F.col("text"))
    staged = g.select(
        "doc_id", "payload_hex", "valid",
        decode_entities_col(txt1252).alias("decoded"))
    out = nfc_normalize(staged, "decoded", "final")
    return out.select(
        "doc_id", "payload_hex", "valid",
        F.col("final"), F.length("final").alias("n_final"))


def _sql_payload_pipeline_oracle() -> str:
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (0xEDB88320 ^ (c >> 1)) if c & 1 else c >> 1
        tbl.append(c)
    TBL = "[" + ", ".join(str(v) for v in tbl) + "]"

    def crc_hex(h: str) -> str:
        """CRC-32 over the BYTES of a hex string (scalar BIGINT fold —
        scalar accumulators are safe at any row count)."""
        return (
            f"xor(list_reduce(list_prepend(CAST(4294967295 AS BIGINT), "
            f"list_transform(range(1, len({h}) // 2 + 1), i -> "
            f"('0x' || substr({h}, CAST(i * 2 - 1 AS INTEGER), 2))::BIGINT)), "
            f"(a, c) -> xor(({TBL})[CAST(xor(a, c) & 255 AS INTEGER) + 1], "
            f"a >> 8)), 4294967295)"
        )

    def bh(x: str) -> str:
        return f"lpad(upper(hex(CAST(({x}) AS BIGINT))), 2, '0')"

    def le2(x: str) -> str:
        return f"({bh(f'({x}) % 256')} || {bh(f'({x}) // 256')})"

    def le4(x: str) -> str:
        return (f"({bh(f'({x}) % 256')} || {bh(f'(({x}) // 256) % 256')} || "
                f"{bh(f'(({x}) // 65536) % 256')} || "
                f"{bh(f'(({x}) // 16777216) % 256')})")

    # original bytes: 'cafe&#769; &amp; ' + 0x93 + 'fish' + 0x94 + ' ' + p1
    data_hex = ("hex('cafe&#769; &amp; ') || '93' || hex('fish') || '94' "
                "|| hex(' ' || p1)")
    # byte length: 17 + 1 + 4 + 1 + 1 + 16 = 40 -> two 20-byte stored blocks
    member = (
        f"('1F8B08' || '00' || {le4('doc_id')} || '0003' || "
        f"'00' || {le2('20')} || {le2('65515')} || substr(dh, 1, 40) || "
        f"'01' || {le2('20')} || {le2('65515')} || substr(dh, 41, 40) || "
        f"{le4('c0')} || {le4('40')})")
    expected = ("'caf' || chr(233) || ' & ' || chr(8220) || 'fish' || "
                "chr(8221) || ' ' || p1")
    return f"""
WITH u AS (
  SELECT doc_id, rpad(substr(text, 1, 16), 16, 'w') AS p1
  FROM documents),
dhx AS (
  SELECT doc_id, p1, {data_hex} AS dh FROM u),
c AS (
  SELECT doc_id, p1, dh, {crc_hex('dh')} AS c0 FROM dhx),
b AS (
  SELECT doc_id, p1,
    CASE WHEN doc_id % 7 = 3
         THEN substr({member}, 1, len({member}) - 10)
         ELSE {member} END AS payload_hex
  FROM c)
SELECT doc_id, payload_hex,
  doc_id % 7 <> 3 AS valid,
  CASE WHEN doc_id % 7 <> 3 THEN {expected} END AS final,
  CAST(CASE WHEN doc_id % 7 <> 3
       THEN len({expected}) END AS INT) AS n_final
FROM b
"""


SQL_PAYLOAD_PIPELINE = _sql_payload_pipeline_oracle()



def q_waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair crawl-budget allocation (operators/allocation.
    waterfill_allocate): 40 hosts with skewed demands share 60% of the
    total demand as budget; the water level t and the R leftover slots
    are integer-deterministic, so both engines compute the identical
    per-host allocation.  The Spark threshold uses the DISTRIBUTED
    two-pass prefix scan (range repartition + per-partition window +
    broadcast offsets), never a single-task global window; the oracle
    uses DuckDB's ordinary global window."""
    from biothings_crawler_spark.operators.allocation import (
        waterfill_allocate)

    demands = (_t(spark, sf_dir, "documents")
               .groupBy(F.concat(F.lit("h"),
                                 (F.col("doc_id") % 40).cast("string"))
                        .alias("host"))
               .agg(F.sum(F.col("doc_id") % 13 + 1).cast("long")
                    .alias("demand")))
    total = demands.agg(F.sum("demand")).first()[0]
    return waterfill_allocate(demands, "host", "demand",
                              budget=int(total * 6 // 10))


SQL_WATERFILL_BUDGET = """
WITH d AS (
  SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) AS host,
         CAST(sum(doc_id % 13 + 1) AS BIGINT) AS demand
  FROM documents GROUP BY 1),
g AS (SELECT CAST(sum(demand) * 6 // 10 AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS n FROM d),
p AS (
  SELECT host, demand,
         row_number() OVER (ORDER BY demand, host) AS rank,
         sum(demand) OVER (ORDER BY demand, host
                           ROWS UNBOUNDED PRECEDING) AS prefix
  FROM d),
feas AS (
  SELECT COALESCE(max_by(rank, rank), 0) AS k_star,
         COALESCE(max_by(prefix, rank), 0) AS pref_star,
         COALESCE(max_by(demand, rank), 0) AS d_star
  FROM p, g
  WHERE prefix + (n - rank) * demand <= b),
lvl AS (
  SELECT k_star,
    CASE WHEN k_star = n THEN d_star
         ELSE d_star + (b - pref_star - (n - k_star) * d_star)
              // (n - k_star) END AS t,
    CASE WHEN k_star = n THEN 0
         ELSE b - pref_star - (n - k_star) *
           (CASE WHEN k_star = n THEN d_star
                 ELSE d_star + (b - pref_star - (n - k_star) * d_star)
                      // (n - k_star) END) END AS leftover
  FROM feas, g)
SELECT host, demand,
  CAST(CASE WHEN demand <= t THEN demand
       ELSE t + (CASE WHEN rank > k_star AND rank <= k_star + leftover
                 THEN 1 ELSE 0 END) END AS BIGINT) AS alloc
FROM p, lvl
"""



def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-weighted retrieval (operators/bm25.bm25f_topk): anchor
    text worth 3 body hits through the same exact-integer BM25 kernel.
    The fixture plants query terms in the anchors of doc_id%9==2
    targets (pages linked AS 'spark data table' that barely say so) —
    those must outrank body-only matches; anchor-only docs outside the
    corpus drop at the length join.  Oracle = one SQL statement with
    the identical integer kernel over the same two tf fields."""
    from biothings_crawler_spark.operators.bm25 import bm25f_topk

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    anchor = (
        F.when(i % 9 == 2, F.lit("spark data table spark data"))
        .when(i % 9 == 5, F.concat(F.lit("mirror link "),
                                   F.substring("text", 10, 20)))
        .otherwise(F.lit("plain link")))
    anchors = d.select("doc_id", anchor.alias("anchor"))
    return bm25f_topk(d, anchors, "doc_id", "text", "anchor",
                      BM25_QUERY, w_anchor=3, k=20)


def _anchor_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic link rows (src_host, dst, anchor) over the hub
    rule: two links per doc (-> div 3, -> div 7), 7 source hosts,
    anchor lanes mixing sitewide nav noise ('click here' from every
    page of a host) with meaningful terms keyed on the TARGET."""
    d = _t(spark, sf_dir, "documents")
    s = F.col("doc_id")
    rows = d.select(
        s.alias("src"), F.expr("doc_id div 3").alias("dst"),
        F.lit(0).alias("pos")
    ).unionAll(d.select(
        s.alias("src"), F.expr("doc_id div 7").alias("dst"),
        F.lit(1).alias("pos")))
    lane = (F.col("src") + F.col("pos")) % 5
    anchor = (
        F.when(lane == 1, F.concat(F.lit("dataset "),
                                   (F.col("dst") % 17).cast("string")))
        .when(lane == 2, F.lit("spark data table"))
        .when(lane == 4, F.concat(F.lit("mirror of page "),
                                  (F.col("dst") % 3).cast("string")))
        .otherwise(F.lit("click here")))
    return rows.select(
        F.concat(F.lit("h"), (F.col("src") % 7).cast("string"))
        .alias("src_host"),
        "dst", anchor.alias("anchor"))


_SQL_ANCHOR_LINKS = """
links AS (
  SELECT 'h' || CAST(src % 7 AS VARCHAR) AS src_host, dst,
    CASE (src + pos) % 5
      WHEN 1 THEN 'dataset ' || CAST(dst % 17 AS VARCHAR)
      WHEN 2 THEN 'spark data table'
      WHEN 4 THEN 'mirror of page ' || CAST(dst % 3 AS VARCHAR)
      ELSE 'click here' END AS anchor
  FROM (SELECT doc_id AS src, doc_id // 3 AS dst, 0 AS pos FROM documents
        UNION ALL
        SELECT doc_id, doc_id // 7, 1 FROM documents))
""".strip()

_SQL_ANCHOR_SCORED = """
hits AS (
  SELECT dst, src_host, unnest(list_filter(
    string_split_regex(lower(anchor), '\\s+'), x -> len(x) > 0)) AS term
  FROM links),
per_host AS (
  SELECT dst, term, src_host,
         CAST(COUNT(*) AS BIGINT) AS links_from_host
  FROM hits GROUP BY dst, term, src_host),
scored AS (
  SELECT dst, term, CAST(COUNT(*) AS BIGINT) AS n_hosts,
         CAST(SUM(links_from_host) AS BIGINT) AS n_links
  FROM per_host GROUP BY dst, term)
""".strip()


def q_anchor_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-collapsed anchor-term summary (operators/anchors.
    anchor_summary, Brin & Page / Craswell et al.): top-3 anchor terms
    per link target weighted by DISTINCT LINKING HOSTS — sitewide
    'click here' nav links collapse to one vote per host, so
    meaningful target-keyed terms can outrank them.  Oracle = the same
    two-stage collapse + QUALIFY top-k in SQL."""
    from biothings_crawler_spark.operators.anchors import anchor_summary

    return anchor_summary(
        _anchor_links(spark, sf_dir), "src_host", "dst", "anchor", m=3)


SQL_ANCHOR_SUMMARY = f"""
WITH {_SQL_ANCHOR_LINKS},
{_SQL_ANCHOR_SCORED}
SELECT dst, term, n_hosts, n_links, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY dst ORDER BY n_hosts DESC, n_links DESC, term) AS rn
      FROM scored)
WHERE rn <= 3
"""


def q_anchor_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor FIELD assembly (operators/anchors.
    anchor_field): each top-3 term repeated n_hosts times in rank
    order — the BM25F anchor input whose tf IS the host-collapsed
    vote.  Oracle rebuilds the bag with repeat()/string_agg in rank
    order."""
    from biothings_crawler_spark.operators.anchors import anchor_field

    return anchor_field(
        _anchor_links(spark, sf_dir), "src_host", "dst", "anchor", m=3)


SQL_ANCHOR_FIELD = f"""
WITH {_SQL_ANCHOR_LINKS},
{_SQL_ANCHOR_SCORED},
topk AS (
  SELECT dst, term, n_hosts, rn FROM (
    SELECT *, row_number() OVER (
      PARTITION BY dst ORDER BY n_hosts DESC, n_links DESC, term) AS rn
    FROM scored)
  WHERE rn <= 3)
SELECT dst,
       string_agg(trim(repeat(term || ' ', CAST(n_hosts AS INTEGER))),
                  ' ' ORDER BY rn) AS anchor
FROM topk GROUP BY dst
"""


# the BM25F integer kernel over two prepared CTEs: docs(id, words) and
# anch(id, words) — shared by the synthetic-anchor pair and the
# link-graph composition
_SQL_BM25F_KERNEL = f"""
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
tfb AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tfb FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY id, term),
tfa AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tfa FROM (
    SELECT id, unnest(words) AS term FROM anch)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY id, term),
tfw AS (
  SELECT COALESCE(tfb.id, tfa.id) AS id,
         COALESCE(tfb.term, tfa.term) AS term,
         COALESCE(tfb, 0) + 3 * COALESCE(tfa, 0) AS tf
  FROM tfb FULL JOIN tfa USING (id, term)),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfw GROUP BY term),
sc AS (
  SELECT tfw.id,
         ((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tfw.tf * t.w_total
           // (20 * tfw.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)
           AS term_score
  FROM tfw JOIN dfq d USING (term) JOIN lens l ON l.id = tfw.id
  CROSS JOIN tot t)
SELECT id, CAST(SUM(term_score) AS BIGINT) AS score
FROM sc GROUP BY id
ORDER BY score DESC, id LIMIT 20
""".strip()

SQL_BM25F_TOPK = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
anch AS (
  SELECT doc_id AS id,
    list_filter(string_split_regex(lower(
      CASE WHEN doc_id % 9 = 2 THEN 'spark data table spark data'
           WHEN doc_id % 9 = 5 THEN 'mirror link ' || substr(text, 10, 20)
           ELSE 'plain link' END), '\\s+'), x -> len(x) > 0) AS words
  FROM documents),
{_SQL_BM25F_KERNEL}
"""


def q_anchor_bm25f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END anchor retrieval composition: link graph ->
    host-collapsed anchor field (operators/anchors.anchor_field) ->
    BM25F (operators/bm25.bm25f_topk) — the full web-ranking anchor
    pipeline as ONE verified statement.  Targets linked as 'spark data
    table' by many hosts must outrank body-only matches.  Oracle =
    anchor chain + the shared BM25F integer-kernel SQL."""
    from biothings_crawler_spark.operators.anchors import anchor_field
    from biothings_crawler_spark.operators.bm25 import bm25f_topk

    d = _t(spark, sf_dir, "documents")
    anchors = anchor_field(
        _anchor_links(spark, sf_dir), "src_host", "dst", "anchor", m=3
    ).select(F.col("dst").alias("doc_id"), "anchor")
    return bm25f_topk(d, anchors, "doc_id", "text", "anchor",
                      BM25_QUERY, w_anchor=3, k=20)


SQL_ANCHOR_BM25F = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
{_SQL_ANCHOR_LINKS},
{_SQL_ANCHOR_SCORED},
topk AS (
  SELECT dst, term, n_hosts, rn FROM (
    SELECT *, row_number() OVER (
      PARTITION BY dst ORDER BY n_hosts DESC, n_links DESC, term) AS rn
    FROM scored)
  WHERE rn <= 3),
anch AS (
  SELECT dst AS id, list_filter(string_split_regex(lower(
    string_agg(trim(repeat(term || ' ', CAST(n_hosts AS INTEGER))),
               ' ' ORDER BY rn)), '\\s+'), x -> len(x) > 0) AS words
  FROM topk GROUP BY dst),
{_SQL_BM25F_KERNEL}
"""


# ---------------------------------------------------------------------------
# sparse term-space all-pairs similarity (Bayardo-style df pruning)
# ---------------------------------------------------------------------------

TFIDF_DF_MAX = 20


def q_tfidf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine all-pairs top-50 over the df-pruned bigram
    vocabulary (operators/sparse.tfidf_neighbors): candidate pairs via
    posting-list self-join on rare terms only (Σ df² bounded), squared
    cosine in exact ppm through DECIMAL(38,0).  Oracle repeats the
    pruned-space algebra with HUGEINT products."""
    from biothings_crawler_spark.operators.sparse import tfidf_neighbors

    d = _t(spark, sf_dir, "documents")
    return tfidf_neighbors(d, "doc_id", "text", df_max=TFIDF_DF_MAX, k=50)


SQL_TFIDF_NEIGHBORS = f"""
WITH w AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
bg AS (SELECT id, words[i] || ' ' || words[i+1] AS term
       FROM w, unnest(range(1, len(words))) AS r(i)),
tf AS (SELECT term, id, CAST(COUNT(*) AS BIGINT) AS tf FROM bg GROUP BY term, id),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfc FROM tf GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
wt AS (SELECT t.term, t.id,
              t.tf * ((2 * o.n_docs - 2 * d.dfc + 1) * 1000 // (2 * d.dfc + 1))
                AS wgt
       FROM tf t JOIN dfq d USING (term) CROSS JOIN tot o
       WHERE d.dfc <= {TFIDF_DF_MAX}),
nrm AS (SELECT id, SUM(wgt * wgt) AS nrm FROM wt GROUP BY id),
pr AS (SELECT a.id AS id1, b.id AS id2, SUM(a.wgt * b.wgt) AS dot
       FROM wt a JOIN wt b ON a.term = b.term AND a.id < b.id
       GROUP BY a.id, b.id)
SELECT id1, id2,
       CAST(CAST(dot AS HUGEINT) * dot * 1000000
            // (CAST(n1.nrm AS HUGEINT) * n2.nrm) AS BIGINT) AS cos2_ppm
FROM pr JOIN nrm n1 ON n1.id = pr.id1 JOIN nrm n2 ON n2.id = pr.id2
ORDER BY cos2_ppm DESC, id1, id2 LIMIT 50
"""


# ---------------------------------------------------------------------------
# graph plane: multi-source BFS seed distance, label-propagation communities
# ---------------------------------------------------------------------------

_SQL_HUBGRAPH = """
e AS (
  SELECT src, dst FROM (
    SELECT doc_id AS src, doc_id // 3 AS dst FROM documents
    UNION
    SELECT doc_id AS src, doc_id // 7 AS dst FROM documents)
  WHERE src <> dst)"""

SEED_HOPS = 6


def _hub_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic hub graph shared by q_pagerank / q_trustrank /
    q_hits: src -> src div 3 and src div 7, self-loops dropped."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 3").alias("dst"))
        .union(
            d.select(F.col("doc_id").alias("src"), F.expr("doc_id div 7").alias("dst"))
        )
        .distinct()
        .filter(F.col("src") != F.col("dst"))
    )


def q_seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS crawl depth (operators/pagerank.seed_distance):
    min hop count from the trustrank seed set (node %% 13 == 0)
    following out-edges, capped at 6 hops — frontier-delta iteration,
    one min-agg per round.  Oracle = a recursive CTE enumerating all
    paths of length <= 6 and taking MIN(dist) per node."""
    from biothings_crawler_spark.operators.pagerank import seed_distance

    e = _hub_edges(spark, sf_dir)
    seeds = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 13 == 0)
    )
    return seed_distance(e, seeds, max_hops=SEED_HOPS)


SQL_SEED_DISTANCE = f"""
WITH RECURSIVE {_SQL_HUBGRAPH},
seeds AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
          WHERE node % 13 = 0),
d(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.node
  WHERE d.dist < {SEED_HOPS})
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM d GROUP BY node
"""

LPA_ITERS = 4


def q_host_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label-propagation communities (operators/
    pagerank.label_propagation) over the undirected hub graph, 4
    synchronous rounds, (count DESC, label ASC) tie order.  Oracle =
    per-round count + QUALIFY row_number() CTE chain."""
    from biothings_crawler_spark.operators.pagerank import label_propagation

    return label_propagation(_hub_edges(spark, sf_dir), iters=LPA_ITERS)


def _lpa_ctes() -> list:
    """The shared LPA CTE chain: hub graph -> undirected edges ->
    LPA_ITERS synchronous label rounds ending at l{LPA_ITERS}."""
    ctes = [
        _SQL_HUBGRAPH,
        """
und AS (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)
        WHERE src <> dst)""",
        "l0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS label FROM und)",
    ]
    for i in range(LPA_ITERS):
        ctes.append(f"""
c{i} AS (SELECT u.src AS node, l.label, COUNT(*) AS cnt
         FROM und u JOIN l{i} l ON l.node = u.dst GROUP BY u.src, l.label),
l{i + 1} AS (SELECT node, label FROM c{i}
             QUALIFY row_number() OVER (PARTITION BY node
                                        ORDER BY cnt DESC, label) = 1)""")
    return ctes


def _sql_host_communities() -> str:
    return (
        "WITH " + ",".join(_lpa_ctes()) + f"\nSELECT node, label FROM l{LPA_ITERS}"
    )


SQL_HOST_COMMUNITIES = _sql_host_communities()


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the label-propagation partition over the
    undirected hub graph (operators/pagerank.modularity composed with
    label_propagation) — the one-row diagnostic that says whether the
    LPA communities found real structure (Q > 0.3) or noise.  Exact
    integer arithmetic end-to-end: q_ppm = floor(1e6 * Q) via the
    shift trick shared with the DuckDB twin."""
    from biothings_crawler_spark.operators.pagerank import (
        label_propagation,
        modularity,
    )

    e = _hub_edges(spark, sf_dir)
    labels = label_propagation(e, iters=LPA_ITERS)
    return modularity(e, labels)


def _sql_modularity() -> str:
    ctes = _lpa_ctes()
    ctes.append(f"""
eu AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       FROM e WHERE src <> dst),
tg AS (SELECT coalesce(la.label, eu.a) AS la, coalesce(lb.label, eu.b) AS lb
       FROM eu
       LEFT JOIN l{LPA_ITERS} la ON la.node = eu.a
       LEFT JOIN l{LPA_ITERS} lb ON lb.node = eu.b),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
              CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
                AS intra_edges
       FROM tg),
inc AS (SELECT la AS c FROM tg UNION ALL SELECT lb FROM tg),
pc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM inc GROUP BY c),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
             SUM(d::HUGEINT * d) AS sum_d2
      FROM pc)""")
    return ("WITH " + ",".join(ctes) + """
SELECT n_communities, m_edges, intra_edges,
       CAST(1000000::HUGEINT
            * (4::HUGEINT * m_edges * intra_edges - sum_d2
               + 4::HUGEINT * m_edges * m_edges)
            // (4::HUGEINT * m_edges * m_edges) AS BIGINT)
         - 1000000 AS q_ppm
FROM s, mm
""")


SQL_MODULARITY = _sql_modularity()


# ---------------------------------------------------------------------------
# query serving: phrase search, snippets, host-diversified top-k, Elias-Fano
# ---------------------------------------------------------------------------

PHRASE = ["table", "hash"]


def q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase ranked retrieval (operators/serving.phrase_topk):
    the positional index is (term, id, pos) rows, the phrase resolves
    as an adjacency equi-join between the two terms' posting slivers.
    Oracle re-derives positions with unnest(range(...)) and the same
    pos+1 self-join."""
    from biothings_crawler_spark.operators.serving import phrase_topk

    d = _t(spark, sf_dir, "documents")
    return phrase_topk(d, "doc_id", "text", PHRASE, k=20)


SQL_PHRASE_TOPK = f"""
WITH w AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
p AS (SELECT id, i, words[i] AS term
      FROM w, unnest(range(1, len(words) + 1)) AS r(i)),
m AS (SELECT p1.id
      FROM p p1 JOIN p p2 ON p2.id = p1.id AND p2.i = p1.i + 1
      WHERE p1.term = '{PHRASE[0]}' AND p2.term = '{PHRASE[1]}')
SELECT id, CAST(COUNT(*) AS BIGINT) AS phrase_tf
FROM m GROUP BY id
ORDER BY phrase_tf DESC, id LIMIT 20
"""

SNIPPET_WIDTH = 8


def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-dependent snippet extraction (operators/serving.
    snippet_windows): best 8-word window by query-term hits, earliest
    window on ties — a zero-Exchange row-local projection.  Oracle
    enumerates the same windows with a lateral range unnest and picks
    the winner with QUALIFY row_number()."""
    from biothings_crawler_spark.operators.serving import snippet_windows

    d = _t(spark, sf_dir, "documents")
    return snippet_windows(d, "doc_id", "text", BM25_QUERY, width=SNIPPET_WIDTH)


_SQL_SNIP_TERMS = ", ".join("'" + t + "'" for t in BM25_QUERY)

SQL_SNIPPETS = f"""
WITH w AS (SELECT doc_id AS id, {_SQL_WORDS} AS words,
                  len({_SQL_WORDS}) AS n FROM documents),
s AS (SELECT id, words, n, st
      FROM w, unnest(range(1,
           (CASE WHEN n > {SNIPPET_WIDTH} THEN n - {SNIPPET_WIDTH} + 1
                 ELSE 1 END) + 1)) AS r(st)),
h AS (SELECT id, words, st,
             CAST(list_sum(
               [CASE WHEN words[j] IN ({_SQL_SNIP_TERMS}) THEN 1 ELSE 0 END
                for j in range(st, least(st + {SNIPPET_WIDTH} - 1, n) + 1)])
               AS BIGINT) AS hits
      FROM s),
b AS (SELECT id, st, hits, words FROM h
      QUALIFY row_number() OVER (PARTITION BY id ORDER BY hits DESC, st) = 1)
SELECT id, CAST(st AS BIGINT) AS "start", hits,
       COALESCE(array_to_string(
         [words[j] for j in range(st,
            least(st + {SNIPPET_WIDTH} - 1, len(words)) + 1)], ' '), '')
         AS snippet
FROM b WHERE hits > 0
"""


def q_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-crowding diversification (operators/serving.diverse_topk):
    integer-BM25 scores capped at 2 results per host before the global
    top-15 — the classic serving-side host-collapse.  Oracle reuses the
    exact integer BM25 SQL plus the same window."""
    from biothings_crawler_spark.operators.serving import diverse_topk

    d = _t(spark, sf_dir, "documents")
    return diverse_topk(d, "doc_id", "text", "source", BM25_QUERY, k=15, per_host=2)


SQL_DIVERSE_TOPK = f"""
WITH docs AS (SELECT doc_id AS id, source AS host, {_SQL_WORDS} AS words
              FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({_SQL_SNIP_TERMS})
  GROUP BY id, term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.id,
         ((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tf.tf * t.w_total
           // (20 * tf.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)
           AS term_score
  FROM tf JOIN dfq d USING (term) JOIN lens l ON l.id = tf.id CROSS JOIN tot t),
scored AS (SELECT id, CAST(SUM(term_score) AS BIGINT) AS score
           FROM sc GROUP BY id),
ranked AS (
  SELECT s.id, d.host, s.score,
         CAST(row_number() OVER (PARTITION BY d.host
                                 ORDER BY s.score DESC, s.id) AS BIGINT)
           AS host_rank
  FROM scored s JOIN docs d ON d.id = s.id)
SELECT id, host, score, host_rank
FROM ranked WHERE host_rank <= 2
ORDER BY score DESC, id LIMIT 15
"""


def q_postings_ef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elias-Fano doc-id storage accounting (operators/bm25.
    postings_ef_report, chunk_range 64 to match q_postings_varint):
    exact bit counts n*l + n + (u >> l) with floor-log2 via bin()
    length — no libm, bit-identical in DuckDB."""
    from biothings_crawler_spark.operators.bm25 import (
        inverted_postings,
        postings_ef_report,
    )

    d = _t(spark, sf_dir, "documents")
    return postings_ef_report(inverted_postings(d, "doc_id", "text"), chunk_range=64)


SQL_POSTINGS_EF = f"""
WITH tf AS (
  SELECT DISTINCT term, id FROM (
    SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents)),
g AS (SELECT term, id // 64 AS chunk_no, CAST(COUNT(*) AS BIGINT) AS df_chunk
      FROM tf GROUP BY term, id // 64),
e AS (SELECT term, chunk_no, df_chunk,
             CAST(length(bin(64 // df_chunk)) - 1 AS BIGINT) AS low_bits
      FROM g)
SELECT term, chunk_no, df_chunk, low_bits,
       CAST(df_chunk * low_bits + df_chunk
            + (64 >> CAST(low_bits AS INTEGER)) AS BIGINT) AS ef_bits,
       CAST(df_chunk * 32 AS BIGINT) AS raw_bits,
       CAST((df_chunk * 32 - (df_chunk * low_bits + df_chunk
             + (64 >> CAST(low_bits AS INTEGER)))) * 1000000
            // (df_chunk * 32) AS BIGINT) AS savings_ppm
FROM e
"""


def q_indegree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph in-degree distribution in log2 bins — the power-law
    skew evidence that justifies the politeness plane's salting and
    the triangle counter's orientation: (bin = floor-log2 of indegree
    via bin()-length, n_hosts, share_ppm, cumulative hosts from the
    hottest bin down).  Two hash aggs + one 1-row broadcast + a 64-row
    window; the degree agg is the only corpus-sized exchange."""
    e = _hub_edges(spark, sf_dir)
    deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    bins = deg.select(
        (F.length(F.bin(F.col("d"))) - 1).cast("long").alias("bin")
    ).groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("n_hosts"))
    tot = bins.agg(F.sum("n_hosts").cast("long").alias("t"))
    from pyspark.sql import Window

    w = (Window.orderBy(F.desc("bin"))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n_hosts",
            F.expr("n_hosts * 1000000 div t").alias("share_ppm"),
            F.sum("n_hosts").over(w).cast("long").alias("hosts_at_least"),
        )
    )


SQL_INDEGREE_DIST = f"""
WITH {_SQL_HUBGRAPH},
deg AS (SELECT dst, COUNT(*) AS d FROM e GROUP BY dst),
bins AS (SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bin,
                CAST(COUNT(*) AS BIGINT) AS n_hosts
         FROM deg GROUP BY 1),
tot AS (SELECT CAST(SUM(n_hosts) AS BIGINT) AS t FROM bins)
SELECT bin, n_hosts,
       n_hosts * 1000000 // t AS share_ppm,
       CAST(SUM(n_hosts) OVER (ORDER BY bin DESC) AS BIGINT)
         AS hosts_at_least
FROM bins CROSS JOIN tot
"""


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host serial-politeness queue simulation (operators/
    politeness.fetch_schedule): start_i = max(arrival_i, start_{i-1} +
    delay) computed EXACTLY via the closed-form prefix transform
    (delay*i + running max of arrival_j - delay*j — no fold state).
    Oracle recomputes the same transform with a SQL window."""
    from pyspark.sql import Window

    from biothings_crawler_spark.operators.politeness import fetch_schedule

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("host").orderBy("arrival_us", "event_id")
    arr = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
        .alias("host"),
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("arrival_us"),
        "event_id",
    ).withColumn("seq", F.row_number().over(w) - 1).drop("event_id")
    return fetch_schedule(arr, delay_us=500_000)


SQL_FETCH_SCHEDULE = """
WITH a AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         epoch_us(ts) AS arrival_us,
         row_number() OVER (PARTITION BY 'h' || CAST(user_id % 40
                            AS VARCHAR)
                            ORDER BY epoch_us(ts), event_id) - 1 AS seq
  FROM events)
SELECT host, CAST(seq AS BIGINT) AS seq,
       CAST(arrival_us AS BIGINT) AS arrival_us,
       CAST(500000 * seq
            + MAX(arrival_us - 500000 * seq)
              OVER (PARTITION BY host ORDER BY seq) AS BIGINT) AS start_us,
       CAST(500000 * seq
            + MAX(arrival_us - 500000 * seq)
              OVER (PARTITION BY host ORDER BY seq)
            - arrival_us AS BIGINT) AS wait_us
FROM a
"""


def q_url_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified URL-identity graph (plans/analysis.url_identity):
    canonical hints + redirect chains (incl. 2-hop) + body-hash
    mirrors, transitively closed.  The Spark side EXTRACTS canonicals
    from real HTML; the oracle constructs canonical edges from the
    fixture's closed form but re-derives mirror edges honestly from
    md5(html) grouping and closes everything with a recursive CTE."""
    from biothings_crawler_spark.plans.analysis import url_identity

    d = _t(spark, sf_dir, "documents")
    u = F.concat(F.lit("https://site.org/p"), F.col("doc_id").cast("string"))
    base_html = F.concat(F.lit("<html><body>"), F.col("text"),
                         F.lit("</body></html>"))
    base = d.select(u.alias("url"), base_html.alias("html"))
    alias_pages = d.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(u, F.lit("?ref=x")).alias("url"),
        F.concat(F.lit('<html><head><link rel="canonical" href="'), u,
                 F.lit('"></head><body>'), F.col("text"),
                 F.lit(" ref</body></html>")).alias("html"),
    )
    mirrors = d.filter(F.col("doc_id") % 7 == 2).select(
        F.concat(F.lit("https://mirror.org/p"),
                 F.col("doc_id").cast("string")).alias("url"),
        base_html.alias("html"),
    )
    pages = base.unionByName(alias_pages).unionByName(mirrors)
    redirects = d.filter(F.col("doc_id") % 5 == 1).select(
        F.concat(u, F.lit("/old")).alias("src_url"), u.alias("dst_url")
    ).unionByName(d.filter(F.col("doc_id") % 15 == 1).select(
        F.concat(u, F.lit("/older")).alias("src_url"),
        F.concat(u, F.lit("/old")).alias("dst_url"),
    ))
    return url_identity(pages, redirects)


SQL_URL_IDENTITY = """
WITH RECURSIVE base AS (
  SELECT 'https://site.org/p' || CAST(doc_id AS VARCHAR) AS u,
         doc_id, text,
         '<html><body>' || text || '</body></html>' AS bh_html
  FROM documents),
pages AS (
  SELECT u AS url, bh_html AS html FROM base
  UNION ALL
  SELECT u || '?ref=x',
         '<html><head><link rel="canonical" href="' || u
           || '"></head><body>' || text || ' ref</body></html>'
  FROM base WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'https://mirror.org/p' || CAST(doc_id AS VARCHAR), bh_html
  FROM base WHERE doc_id % 7 = 2),
redirects AS (
  SELECT u || '/old' AS src_url, u AS dst_url FROM base WHERE doc_id % 5 = 1
  UNION ALL
  SELECT u || '/older', u || '/old' FROM base WHERE doc_id % 15 = 1),
canon_e AS (
  SELECT u || '?ref=x' AS a, u AS b FROM base WHERE doc_id % 3 = 0),
reps AS (SELECT md5(html) AS bh, MIN(url) AS rep FROM pages GROUP BY 1),
mirror_e AS (
  SELECT p.url AS a, r.rep AS b
  FROM pages p JOIN reps r ON md5(p.html) = r.bh
  WHERE p.url <> r.rep),
edges AS (
  SELECT a, b FROM canon_e
  UNION SELECT src_url, dst_url FROM redirects
  UNION SELECT a, b FROM mirror_e),
und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
nodes AS (
  SELECT url AS n FROM pages
  UNION SELECT src_url FROM redirects
  UNION SELECT dst_url FROM redirects
  UNION SELECT b FROM edges),
reach(a, b) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.a, u2.b FROM reach r JOIN und u2 ON r.b = u2.a),
comp AS (SELECT a AS url, MIN(b) AS identity FROM reach GROUP BY a),
sizes AS (SELECT identity, CAST(COUNT(*) AS BIGINT) AS group_size
          FROM comp GROUP BY identity)
SELECT c.url, c.identity, s.group_size
FROM comp c JOIN sizes s USING (identity)
"""


SEED_COVER_K = 8


def q_seed_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted seed selection as greedy maximum coverage (operators/
    frontier.greedy_seed_cover): 50 candidate seeds x 120 reachable
    hosts, pick 8 — each round's winner maximizes NEWLY covered hosts
    (ties to the smaller seed), plan-side argmax, no driver collect.
    Oracle replays all 8 rounds as MATERIALIZED CTEs with QUALIFY
    argmax."""
    from biothings_crawler_spark.operators.frontier import greedy_seed_cover

    d = _t(spark, sf_dir, "documents")
    s = F.concat(F.lit("s"), (F.col("doc_id") % 50).cast("string"))
    cov = d.select(
        s.alias("seed"),
        F.concat(F.lit("h"), F.expr("(doc_id div 3) % 120").cast("string"))
        .alias("host"),
    ).unionByName(d.select(
        s.alias("seed"),
        F.concat(F.lit("h"), F.expr("(doc_id div 7) % 120").cast("string"))
        .alias("host"),
    ))
    return greedy_seed_cover(cov, SEED_COVER_K)


def _sql_seed_cover() -> str:
    ctes = ["""cov AS MATERIALIZED (
  SELECT DISTINCT seed, host FROM (
    SELECT 's' || CAST(doc_id % 50 AS VARCHAR) AS seed,
           'h' || CAST((doc_id // 3) % 120 AS VARCHAR) AS host
    FROM documents
    UNION ALL
    SELECT 's' || CAST(doc_id % 50 AS VARCHAR),
           'h' || CAST((doc_id // 7) % 120 AS VARCHAR)
    FROM documents)),
c0 AS MATERIALIZED (SELECT host FROM cov WHERE 1 = 0)"""]
    for r in range(1, SEED_COVER_K + 1):
        ctes.append(f"""
w{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS round, seed,
         CAST(COUNT(*) AS BIGINT) AS gain
  FROM cov WHERE host NOT IN (SELECT host FROM c{r - 1})
  GROUP BY seed
  QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, seed) = 1),
c{r} AS MATERIALIZED (
  SELECT host FROM c{r - 1}
  UNION SELECT cov.host FROM cov JOIN w{r} USING (seed))""")
    final = " UNION ALL ".join(
        f"SELECT * FROM w{r}" for r in range(1, SEED_COVER_K + 1))
    return "WITH " + ",".join(ctes) + "\n" + final


SQL_SEED_COVER = _sql_seed_cover()


def q_crawl_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-ops rollup via GROUPING SETS — (host, day), (host), (day),
    () in ONE Expand pass over the fetch log (the OLAP surface a crawl
    dashboard reads), with grouping_id distinguishing the levels and
    DECIMAL-exact value sums.  Oracle = DuckDB GROUPING SETS with the
    same grouping-id arithmetic."""
    e = _t(spark, sf_dir, "events")
    f = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
        .alias("host"),
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts) div 86400000000").alias("day_no"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    return (
        f.groupingSets(
            [["host", "day_no"], ["host"], ["day_no"], []],
            "host", "day_no")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.sum("v").cast("decimal(28,6)").cast("double").alias("sum_v"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


SQL_CRAWL_CUBE = """
WITH f AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         epoch_us(ts) // 86400000000 AS day_no,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events)
SELECT host, day_no,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(CAST(SUM(v) AS DECIMAL(28,6)) AS DOUBLE) AS sum_v,
       CAST(GROUPING(host) * 2 + GROUPING(day_no) AS BIGINT) AS gid
FROM f
GROUP BY GROUPING SETS ((host, day_no), (host), (day_no), ())
"""


COLLOC_MIN_COUNT = 24


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining: bigram PMI in exact integer ppm —
    ``pmi_ppm = c_xy * n_uni * 1e6 div (c_x * c_y)`` (the classic
    pointwise-mutual-information ratio with the log dropped: log is
    monotone, so the RANKING is identical and the arithmetic stays
    cross-engine exact) over bigrams with count >= 24.  The phrase
    table a tokenizer/boilerplate learner consumes.  Shape: one bigram
    hash agg + one unigram hash agg + two broadcast-joined lookups."""
    from biothings_crawler_spark.operators.text import words_col

    d = _t(spark, sf_dir, "documents")
    ws = d.select(F.col("doc_id").alias("id"),
                  words_col(F.col("text")).alias("ws"))
    uni = (
        ws.select(F.explode("ws").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("long").alias("n_uni"))
    big = ws.select(
        F.explode(
            F.when(
                F.size("ws") > 1,
                F.zip_with(
                    F.slice("ws", 1, F.size("ws") - 1),
                    F.slice("ws", 2, F.size("ws") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array())
        ).alias("bg")
    ).groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy")).filter(
        F.col("c_xy") >= COLLOC_MIN_COUNT)
    scored = (
        big.withColumn("x", F.split("bg", " ")[0])
        .withColumn("y", F.split("bg", " ")[1])
        .join(uni.withColumnRenamed("w", "x")
              .withColumnRenamed("c", "c_x"), "x")
        .join(uni.withColumnRenamed("w", "y")
              .withColumnRenamed("c", "c_y"), "y")
        .crossJoin(F.broadcast(n_uni))
    )
    return scored.select(
        "bg",
        F.col("c_xy").cast("long"),
        F.expr("c_xy * n_uni * 1000000 div (c_x * c_y)").alias("pmi_ppm"),
    )


SQL_COLLOCATIONS = f"""
WITH ws AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM documents),
uni AS (SELECT u.x AS w, CAST(COUNT(*) AS BIGINT) AS c
        FROM ws, unnest(w) AS u(x) GROUP BY u.x),
nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
big AS (
  SELECT w[CAST(r.i AS INT)] || ' ' || w[CAST(r.i + 1 AS INT)] AS bg,
         CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM ws, unnest(range(1, len(w))) AS r(i)
  GROUP BY 1 HAVING COUNT(*) >= {COLLOC_MIN_COUNT})
SELECT bg, c_xy,
       c_xy * nu.n_uni * 1000000 // (ux.c * uy.c) AS pmi_ppm
FROM big
JOIN uni ux ON ux.w = string_split(bg, ' ')[1]
JOIN uni uy ON uy.w = string_split(bg, ' ')[2]
CROSS JOIN nu
"""


def q_leakage_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test splits (operators/sampling.
    leakage_safe_splits): docs hash into splits by their near-dup
    CLUSTER representative (the q_neardup_clusters components), so
    contamination pairs cannot straddle train/test.  Oracle = the
    recursive-CTE transitive closure composed with the md5-u60
    threshold arithmetic in one statement."""
    from biothings_crawler_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from biothings_crawler_spark.operators.sampling import (
        leakage_safe_splits,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", k=3, n_perm=16, bands=4,
                              verify_threshold=0.5)
    clusters = connected_components(
        pairs, d.select(F.col("doc_id").alias("id")))
    return leakage_safe_splits(
        d.select(F.col("doc_id").alias("id")), clusters)


SQL_LEAKAGE_SPLITS = f"""
WITH comp AS ({SQL_NEARDUP_CLUSTERS})
SELECT id, component,
       CASE WHEN {_SQL_HASH60.format(
           w="'split1:' || CAST(component AS VARCHAR)")}
                 < 1129863074514710016 THEN 'train'
            WHEN {_SQL_HASH60.format(
           w="'split1:' || CAST(component AS VARCHAR)")}
                 < 1141392289560778496 THEN 'val'
            ELSE 'test' END AS split
FROM comp
"""


def q_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-backoff retry scheduling (operators/recrawl.
    retry_backoff): fetch log from events (error rows = failures),
    trailing-failure streaks -> ok / retry-with-doubled-delay /
    give_up.  Oracle recomputes streaks with the same two conditional
    aggregates and the shifted delay in plain SQL."""
    from biothings_crawler_spark.operators.recrawl import retry_backoff

    e = _t(spark, sf_dir, "events")
    fetches = e.select(
        F.concat(F.lit("u"), (F.col("event_id") % 83).cast("string"))
        .alias("url"),
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("ts_us"),
        (F.col("event_type") != "error").alias("ok"),
    )
    return retry_backoff(fetches, base_s=60, cap_s=3600, max_attempts=5)


SQL_RETRY_BACKOFF = """
WITH f AS (
  SELECT 'u' || CAST(event_id % 83 AS VARCHAR) AS url,
         epoch_us(ts) AS ts_us,
         event_type <> 'error' AS ok
  FROM events),
agg AS (
  SELECT url, MAX(ts_us) AS last_ts_us,
         MAX(CASE WHEN ok THEN ts_us END) AS last_ok_us
  FROM f GROUP BY url),
fails AS (
  SELECT f.url, CAST(COUNT(*) AS BIGINT) AS n_fails
  FROM f JOIN agg USING (url)
  WHERE agg.last_ok_us IS NULL OR f.ts_us > agg.last_ok_us
  GROUP BY f.url),
j AS (
  SELECT a.url, COALESCE(x.n_fails, 0) AS n_fails,
         CAST(a.last_ts_us AS BIGINT) AS last_ts_us
  FROM agg a LEFT JOIN fails x USING (url))
SELECT url, n_fails, last_ts_us,
       CASE WHEN n_fails = 0 THEN 'ok'
            WHEN n_fails >= 5 THEN 'give_up'
            ELSE 'retry' END AS action,
       CASE WHEN n_fails > 0 AND n_fails < 5
            THEN last_ts_us + LEAST(60 << CAST(n_fails - 1 AS INTEGER),
                                    3600) * 1000000 END AS next_due_us
FROM j
"""


FORECAST_ALPHA = 30


def q_discovery_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host EWMA discovery forecasting (operators/frontier.
    discovery_forecast): hourly URL-mint counts from events, exact
    centi-unit integer recurrence.  Oracle = a single-integer
    list_reduce (the one DuckDB fold shape that is row-count-sound)
    over the same ordered series."""
    from biothings_crawler_spark.operators.frontier import discovery_forecast

    e = _t(spark, sf_dir, "events")
    counts = (
        e.select(
            F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
            .alias("host"),
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
                   "00:00:00', ts) div 3600000000").alias("hour_no"),
        )
        .groupBy("host", "hour_no")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return discovery_forecast(counts, FORECAST_ALPHA)


SQL_DISCOVERY_FORECAST = f"""
WITH c AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         epoch_us(ts) // 3600000000 AS hour_no,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
ser AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_hours,
         list(n * 100 ORDER BY hour_no) AS a100
  FROM c GROUP BY host),
fold AS (
  SELECT host, n_hours,
         CAST(CASE WHEN len(a100) > 1
              THEN list_reduce(a100, (acc, x) ->
                   ({FORECAST_ALPHA} * x
                    + {100 - FORECAST_ALPHA} * acc) // 100)
              ELSE a100[1] END AS BIGINT) AS ewma_centi
  FROM ser)
SELECT host, n_hours, ewma_centi,
       CAST(ewma_centi // 100 AS BIGINT) AS forecast
FROM fold
"""


KCORE_K = 4
KCORE_ORACLE_ROUNDS = 12
KCORE_CLIQUE = [11, 23, 37, 41, 53, 67]


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal 4-core of the hub graph with a planted K6 (operators/
    pagerank.k_core, Seidman coreness): synchronous peeling to the
    FIXPOINT — one degree agg + two semi-joins per round — strips the
    tree-like hub mass in 8 rounds and must leave exactly the clique
    (the link-farm shape coreness exists to find).  The oracle replays
    12 peeling rounds as chained MATERIALIZED CTEs — more than the
    fixture needs, and peeling past the fixpoint is a no-op, so both
    terminate at the same core."""
    from itertools import combinations

    from biothings_crawler_spark.operators.pagerank import k_core

    cliq = _hub_edges(spark, sf_dir).sparkSession.createDataFrame(
        list(combinations(KCORE_CLIQUE, 2)), "src long, dst long")
    return k_core(_hub_edges(spark, sf_dir).unionByName(cliq), KCORE_K)


def _sql_kcore() -> str:
    from itertools import combinations

    cliq = " UNION ALL ".join(
        f"SELECT {a} AS src, {b} AS dst"
        for a, b in combinations(KCORE_CLIQUE, 2))
    ctes = [
        _SQL_HUBGRAPH,
        f"e2 AS (SELECT src, dst FROM e UNION ALL {cliq})",
        """
ce AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM e2),
u0 AS MATERIALIZED (SELECT a, b FROM ce UNION ALL SELECT b, a FROM ce)""",
    ]
    # each round references u{i} three times — without MATERIALIZED,
    # DuckDB inlines CTEs and the scan tree grows 3^rounds
    for i in range(KCORE_ORACLE_ROUNDS):
        ctes.append(f"""
a{i} AS MATERIALIZED (SELECT a FROM u{i} GROUP BY a
                      HAVING COUNT(*) >= {KCORE_K}),
u{i + 1} AS MATERIALIZED (SELECT u.a, u.b FROM u{i} u
             JOIN a{i} x ON u.a = x.a JOIN a{i} y ON u.b = y.a)""")
    last = f"u{KCORE_ORACLE_ROUNDS}"
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core_deg "
              f"FROM {last} GROUP BY a")


SQL_KCORE = _sql_kcore()


JACC_T_PPM = 900_000


def q_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard set-similarity self-join with prefix filtering
    (operators/dedup.jaccard_join, PPJoin family) at t=0.9 over
    documents plus planted one-token-appended twins.  The oracle is the
    prefix-FREE formulation — every shared-token pair counted and
    filtered exactly — so the gate proves the prefix filter loses no
    qualifying pair (the PPJoin completeness lemma, checked on real
    data, not trusted)."""
    from biothings_crawler_spark.operators.dedup import jaccard_join

    d = _t(spark, sf_dir, "documents")
    twins = d.filter(F.col("doc_id") % 9 == 4).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzuniquetoken")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(twins)
    return jaccard_join(corpus, "doc_id", "text", JACC_T_PPM)


SQL_JACCARD_JOIN = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' zzuniquetoken'
  FROM documents WHERE doc_id % 9 = 4),
toks AS (
  SELECT doc_id AS id,
         list_distinct(list_filter(
           string_split_regex(lower(text), '\\s+'),
           x -> len(x) > 0)) AS ws
  FROM corpus),
tok AS (SELECT id, unnest(ws) AS w FROM toks),
shared AS (
  SELECT a.id AS x, b.id AS y, CAST(COUNT(*) AS BIGINT) AS inter
  FROM tok a JOIN tok b ON a.w = b.w AND a.id < b.id
  GROUP BY a.id, b.id),
sized AS (
  SELECT s.x, s.y, s.inter,
         CAST(len(tx.ws) + len(ty.ws) - s.inter AS BIGINT) AS union_sz
  FROM shared s
  JOIN toks tx ON tx.id = s.x JOIN toks ty ON ty.id = s.y)
SELECT x, y, inter, union_sz,
       inter * 1000000 // union_sz AS jacc_ppm
FROM sized WHERE inter * 1000000 >= {JACC_T_PPM} * union_sz
"""


RELATED_K = 25


def q_related_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction (operators/pagerank.
    related_hosts): top-25 non-adjacent hub-graph pairs by integer-ppm
    RA score.  Oracle recomputes wedges, the adjacency anti-join, and
    the 1000000//deg sum in plain SQL."""
    from biothings_crawler_spark.operators.pagerank import related_hosts

    return related_hosts(_hub_edges(spark, sf_dir), k=RELATED_K)


SQL_RELATED_HOSTS = f"""
WITH {_SQL_HUBGRAPH},
ce AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e),
und AS (SELECT a, b FROM ce UNION ALL SELECT b, a FROM ce),
deg AS (SELECT a AS z, COUNT(*) AS d FROM und GROUP BY a),
wedges AS (
  SELECT w1.a AS x, w2.b AS y, 1000000 // deg.d AS ra_ppm
  FROM und w1 JOIN und w2 ON w1.b = w2.a AND w1.a < w2.b
  JOIN deg ON deg.z = w1.b),
cand AS (
  SELECT x, y, ra_ppm FROM wedges
  WHERE NOT EXISTS (SELECT 1 FROM ce WHERE ce.a = wedges.x
                    AND ce.b = wedges.y))
SELECT x, y, CAST(SUM(ra_ppm) AS BIGINT) AS ra_ppm,
       CAST(COUNT(*) AS BIGINT) AS common_neighbors
FROM cand GROUP BY x, y
ORDER BY ra_ppm DESC, x, y LIMIT {RELATED_K}
"""


def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting with degree-ordered orientation (operators/
    pagerank.triangle_counts) over the undirected hub graph — link-spam
    clique detection's primitive.  Oracle = an independent brute-force
    enumeration: all node triples joined three ways on the canonical
    undirected edge list with a < b < c (no orientation logic shared
    with the engine)."""
    from biothings_crawler_spark.operators.pagerank import triangle_counts

    return triangle_counts(_hub_edges(spark, sf_dir))


SQL_HOST_TRIANGLES = f"""
WITH {_SQL_HUBGRAPH},
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
FROM (SELECT x AS node FROM t UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t)
GROUP BY node
"""


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients (operators/pagerank.
    clustering_coefficients, Watts & Strogatz): exact ppm floor of
    2T(v) / (deg(v)(deg(v)-1)) over the hub graph, degree >= 2 only.
    The oracle recomputes triangles by INDEPENDENT brute-force triple
    enumeration (no orientation logic shared with the engine) and the
    same decimal division in HUGEINT."""
    from biothings_crawler_spark.operators.pagerank import (
        clustering_coefficients)

    return clustering_coefficients(_hub_edges(spark, sf_dir))


SQL_CLUSTERING_COEFF = f"""
WITH {_SQL_HUBGRAPH},
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tri AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
  FROM (SELECT x AS node FROM t UNION ALL SELECT y FROM t
        UNION ALL SELECT z FROM t)
  GROUP BY node)
SELECT d.node, d.deg,
       CAST(COALESCE(tri.triangles, 0) AS BIGINT) AS triangles,
       CAST(CAST(COALESCE(tri.triangles, 0) AS HUGEINT) * 2000000
            // (CAST(d.deg AS HUGEINT) * (d.deg - 1)) AS BIGINT)
         AS lcc_ppm
FROM deg d LEFT JOIN tri ON tri.node = d.node
WHERE d.deg >= 2
"""


def q_microdata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema.org microdata extraction (operators/microdata.
    microdata_extract — REAL stdlib HTMLParser, not regex): each doc
    renders a Dataset item (attribute order and quoting vary by id,
    ``&amp;`` must decode, a whitespace lane interleaves text nodes, an
    itemprop outside any scope must be ignored) with @content/@href/
    @src/text value sources and a nested Person item under ``creator``.
    The oracle CONSTRUCTS the expected rows from the same closed form
    the fixture uses — Spark must parse actual HTML to match."""
    from biothings_crawler_spark.operators.microdata import microdata_extract

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    gap = F.when(F.col("doc_id") % 5 == 0, F.lit("\n  ")).otherwise(F.lit(""))
    open_div = F.when(
        F.col("doc_id") % 2 == 0,
        F.lit('<div itemscope itemtype="https://schema.org/Dataset">'),
    ).otherwise(F.lit("<div itemtype='https://schema.org/Dataset' itemscope>"))
    html = F.concat(
        F.lit("<html><body>"), gap, open_div, gap,
        F.lit('<h1 itemprop="name">DS '), i, F.lit(" &amp; co</h1>"), gap,
        F.lit('<meta itemprop="identifier" content="id-'), i, F.lit('">'),
        gap,
        F.lit('<a itemprop="url" href="https://ex.org/d/'), i,
        F.lit('">link '), i, F.lit("</a>"), gap,
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit('<span itemprop="keywords">k'),
                        (F.col("doc_id") % 7).cast("string"),
                        F.lit("</span>"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit('<img itemprop="image" src="/i/'), i,
                        F.lit('.png">'))).otherwise(F.lit("")),
        gap,
        F.lit('<div itemprop="creator" itemscope '
              'itemtype="https://schema.org/Person">'
              '<span itemprop="name">Person '),
        (F.col("doc_id") % 11).cast("string"),
        F.lit("</span></div>"), gap,
        F.lit('</div><p itemprop="orphan">zzz</p></body></html>'),
    )
    pages = d.select(F.col("doc_id").alias("id"), html.alias("html"))
    return microdata_extract(pages)


SQL_MICRODATA_EXTRACT = """
WITH d AS (SELECT doc_id AS id FROM documents),
ds AS (SELECT id, CAST(0 AS BIGINT) AS item_no,
              'https://schema.org/Dataset' AS item_type,
              CAST(NULL AS BIGINT) AS parent_item,
              CAST(NULL AS VARCHAR) AS parent_prop
       FROM d)
SELECT id, item_no, item_type, parent_item, parent_prop,
       'name' AS prop, 'DS ' || id || ' & co' AS value FROM ds
UNION ALL
SELECT id, item_no, item_type, parent_item, parent_prop,
       'identifier', 'id-' || id FROM ds
UNION ALL
SELECT id, item_no, item_type, parent_item, parent_prop,
       'url', 'https://ex.org/d/' || id FROM ds
UNION ALL
SELECT id, item_no, item_type, parent_item, parent_prop,
       'keywords', 'k' || (id % 7) FROM ds WHERE id % 3 = 0
UNION ALL
SELECT id, item_no, item_type, parent_item, parent_prop,
       'image', '/i/' || id || '.png' FROM ds WHERE id % 4 = 1
UNION ALL
SELECT id, CAST(1 AS BIGINT), 'https://schema.org/Person',
       CAST(0 AS BIGINT), 'creator', 'name',
       'Person ' || (id % 11) FROM d
"""


COMPACTION_TARGET = 200_000


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (operators/maintenance.
    compaction_plan): a synthetic manifest from orders (8 table
    partitions, sizes 0..300k so ~1/3 exceed the 200k target and are
    kept), packed by the deterministic big-first running-sum boundary
    rule.  The oracle replays the same windows in SQL."""
    from biothings_crawler_spark.operators.maintenance import compaction_plan

    o = _t(spark, sf_dir, "orders")
    manifest = o.select(
        F.concat(F.lit("p"), (F.col("o_orderkey") % 8).cast("string"))
        .alias("part"),
        F.col("o_orderkey").alias("file_id"),
        ((F.col("o_orderkey") * 9973) % 300_000 + 1024).alias("size_bytes"),
    )
    return compaction_plan(manifest, COMPACTION_TARGET)


SQL_COMPACTION_PLAN = f"""
WITH manifest AS (
  SELECT 'p' || CAST(o_orderkey % 8 AS VARCHAR) AS part,
         o_orderkey AS file_id,
         (o_orderkey * 9973) % 300000 + 1024 AS size_bytes
  FROM orders),
small AS (
  SELECT part, file_id, size_bytes,
         SUM(size_bytes) OVER (PARTITION BY part
                               ORDER BY size_bytes DESC, file_id) AS cum
  FROM manifest WHERE size_bytes < {COMPACTION_TARGET}),
grouped AS (
  SELECT part, file_id, size_bytes,
         (cum - size_bytes) // {COMPACTION_TARGET} AS group_no
  FROM small),
planned AS (
  SELECT part, file_id, size_bytes, 'compact' AS action,
         CAST(group_no AS BIGINT) AS group_no,
         CAST(SUM(size_bytes) OVER (PARTITION BY part, group_no)
              AS BIGINT) AS group_bytes,
         CAST(COUNT(*) OVER (PARTITION BY part, group_no)
              AS BIGINT) AS group_files
  FROM grouped)
SELECT * FROM planned
UNION ALL
SELECT part, file_id, size_bytes, 'keep' AS action,
       CAST(NULL AS BIGINT) AS group_no,
       CAST(size_bytes AS BIGINT) AS group_bytes,
       CAST(1 AS BIGINT) AS group_files
FROM manifest WHERE size_bytes >= {COMPACTION_TARGET}
"""


def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gain-invariant audio dedup over REAL WAV decode (operators/
    multimodal.audio_fingerprint + audio_dup_groups): same-seed media
    pairs differ only by 2x gain, so their zero-crossing fingerprints
    must collide (one dup group of 2, n_gain_variants 2) while energy
    envelopes differ.  The oracle rebuilds both canonical profile
    strings from the closed-form sample formula — block zc via a lag
    window, envelope via floor-log2 on exact block energies — and md5s
    them identically."""
    from biothings_crawler_spark.operators.multimodal import (
        audio_dup_groups,
        audio_fingerprint,
        gen_wav_media_seeded,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("media_id"),
        F.expr("doc_id div 20").alias("seed"),
        F.expr("1 + (doc_id div 10) % 2").alias("amp"),
    )
    return audio_dup_groups(audio_fingerprint(gen_wav_media_seeded(ids)))


SQL_AUDIO_FINGERPRINT = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id // 20 AS seed,
         1 + (doc_id // 10) % 2 AS amp
  FROM documents WHERE doc_id % 10 = 7),
dims AS (SELECT media_id, seed, amp, 1 + seed % 2 AS c,
                800 + (seed % 5) * 160 AS n
         FROM m),
s AS (
  SELECT media_id, CAST(r.j AS BIGINT) AS j,
         (((seed * 31 + r.j * 7) % 2001) - 1000) * amp AS v
  FROM dims, unnest(range(n * c)) AS r(j)),
cr AS (
  SELECT media_id, j, v,
         CASE WHEN j > 0 AND v * lag(v) OVER
                (PARTITION BY media_id ORDER BY j) < 0
              THEN 1 ELSE 0 END AS x
  FROM s),
b AS (SELECT media_id, j // 240 AS blk,
             CAST(SUM(x) AS BIGINT) AS zc, CAST(SUM(v * v) AS BIGINT) AS e
      FROM cr GROUP BY media_id, j // 240),
fp AS (
  SELECT media_id,
         md5(string_agg(CAST(zc AS VARCHAR), ',' ORDER BY blk)) AS zc_fp,
         md5(string_agg(CAST(length(bin(e + 1)) AS VARCHAR),
                        ',' ORDER BY blk)) AS env_fp,
         CAST(COUNT(*) AS BIGINT) AS n_blocks
  FROM b GROUP BY media_id),
base AS (
  SELECT fp.media_id, CAST(d.n * d.c AS BIGINT) AS n_samples,
         fp.n_blocks, fp.zc_fp, fp.env_fp
  FROM fp JOIN dims d USING (media_id)),
grp AS (SELECT zc_fp, MIN(media_id) AS dup_group,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT env_fp) AS BIGINT) AS n_gain_variants
        FROM base GROUP BY zc_fp)
SELECT b2.media_id, b2.n_samples, b2.n_blocks, b2.zc_fp, b2.env_fp,
       g.dup_group, g.group_size, g.n_gain_variants,
       CAST(NULL AS VARCHAR) AS decode_err
FROM base b2 JOIN grp g USING (zc_fp)
"""


def q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL decoded pixels (operators/
    multimodal.decode_png_phash + phash_dup_groups): worker-side PNG
    synthesis where content follows the SEED (doc_id//30 — triples of
    media share one) while brightness varies per media, then dHash over
    the decoded bytes.  Planted triples must land in one dup group —
    dHash's cell-mean comparisons are exactly invariant to the constant
    shift — and the oracle recomputes every hash from the closed-form
    pixel formula, never touching the container bytes."""
    from biothings_crawler_spark.operators.multimodal import (
        decode_png_phash,
        gen_png_media_seeded,
        phash_dup_groups,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 5).select(
        F.col("doc_id").alias("media_id"),
        F.expr("doc_id div 30").alias("seed"),
        F.expr("((doc_id div 10) % 3) * 25").alias("bright"),
    )
    return phash_dup_groups(decode_png_phash(gen_png_media_seeded(ids)))


SQL_IMAGE_PHASH = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id // 30 AS seed,
         ((doc_id // 10) % 3) * 25 AS bright
  FROM documents WHERE doc_id % 10 = 5),
dims AS (SELECT media_id, seed, bright,
                16 + 2 * (seed % 5) AS w, 12 + 2 * (seed % 4) AS h
         FROM m),
px AS (
  SELECT media_id, w, h, bright, CAST(r.j AS BIGINT) AS idx,
         seed * 31 + (r.j // w) * 17 + (r.j % w) * 7 AS base
  FROM dims, unnest(range(w * h)) AS r(j)),
g AS (
  SELECT media_id, ((idx // w) * 8) // h AS ci, ((idx % w) * 9) // w AS cj,
         (299 * (base % 180) + 587 * ((base + 3) % 180)
          + 114 * ((base + 6) % 180)) // 1000 + bright AS gray
  FROM px),
c AS (SELECT media_id, ci, cj, SUM(gray) AS s, COUNT(*) AS n
      FROM g GROUP BY media_id, ci, cj),
bits AS (
  SELECT l.media_id, l.ci, l.cj,
         CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS bit
  FROM c l JOIN c r
    ON l.media_id = r.media_id AND l.ci = r.ci AND r.cj = l.cj + 1
  WHERE l.cj < 8),
hashes AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN ci >= 4
                       THEN bit * (CAST(1 AS BIGINT) << ((ci - 4) * 8 + cj))
                       ELSE 0 END) AS BIGINT) AS phash_hi,
         CAST(SUM(CASE WHEN ci < 4
                       THEN bit * (CAST(1 AS BIGINT) << (ci * 8 + cj))
                       ELSE 0 END) AS BIGINT) AS phash_lo
  FROM bits GROUP BY media_id),
fl AS (
  SELECT h.media_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
         h.phash_hi, h.phash_lo
  FROM hashes h JOIN dims d USING (media_id)),
grp AS (SELECT phash_hi, phash_lo, MIN(media_id) AS dup_group,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM fl GROUP BY phash_hi, phash_lo)
SELECT f.media_id, f.width, f.height, f.phash_hi, f.phash_lo,
       g2.dup_group, g2.group_size, CAST(NULL AS VARCHAR) AS decode_err
FROM fl f JOIN grp g2 USING (phash_hi, phash_lo)
"""


def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate image pairs via banded hamming join over the real
    decoded dHash (operators/multimodal.phash_neardup_pairs — the image
    twin of MinHash LSH banding).  Fixture quads share a seed: two
    brightness levels (dHash-invariant, hamming 0 → exact-dup pairs)
    crossed with a row-0 "scratch" edit that can flip only the 8 bits
    of dHash cell row 0 (hamming <= 8 → the near-dup lane); distinct
    seeds stay far apart.  Pigeonhole over the 8 single-byte bands
    makes recall at hamming <= 7 EXACT, so the oracle — which
    recomputes every hash from the closed-form pixel formula and
    replays the identical band/verify rule — must agree pair-for-pair,
    hamming-for-hamming."""
    from biothings_crawler_spark.operators.multimodal import (
        decode_png_phash,
        gen_png_media_seeded,
        phash_neardup_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("media_id"),
        F.expr("doc_id div 40").alias("seed"),
        F.expr("(((doc_id div 10) % 4) % 2) * 25").alias("bright"),
        F.expr("((doc_id div 10) % 4) div 2").alias("scratch"),
    )
    return phash_neardup_pairs(decode_png_phash(gen_png_media_seeded(ids)))


SQL_IMAGE_NEARDUP = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id // 40 AS seed,
         (((doc_id // 10) % 4) % 2) * 25 AS bright,
         ((doc_id // 10) % 4) // 2 AS scratch
  FROM documents WHERE doc_id % 10 = 7),
dims AS (SELECT media_id, seed, bright, scratch,
                16 + 2 * (seed % 5) AS w, 12 + 2 * (seed % 4) AS h
         FROM m),
px AS (
  SELECT media_id, w, h, bright, CAST(r.j AS BIGINT) AS idx,
         seed * 31 + (r.j // w) * 17 + (r.j % w) * 7
           + CASE WHEN r.j // w = 0 THEN scratch * 41 ELSE 0 END AS base
  FROM dims, unnest(range(w * h)) AS r(j)),
g AS (
  SELECT media_id, ((idx // w) * 8) // h AS ci, ((idx % w) * 9) // w AS cj,
         (299 * (base % 180) + 587 * ((base + 3) % 180)
          + 114 * ((base + 6) % 180)) // 1000 + bright AS gray
  FROM px),
c AS (SELECT media_id, ci, cj, SUM(gray) AS s, COUNT(*) AS n
      FROM g GROUP BY media_id, ci, cj),
bits AS (
  SELECT l.media_id, l.ci, l.cj,
         CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS bit
  FROM c l JOIN c r
    ON l.media_id = r.media_id AND l.ci = r.ci AND r.cj = l.cj + 1
  WHERE l.cj < 8),
hl AS (
  SELECT media_id,
         CAST(SUM(CASE WHEN ci >= 4
                       THEN bit * (CAST(1 AS BIGINT) << ((ci - 4) * 8 + cj))
                       ELSE 0 END) AS BIGINT) AS phash_hi,
         CAST(SUM(CASE WHEN ci < 4
                       THEN bit * (CAST(1 AS BIGINT) << (ci * 8 + cj))
                       ELSE 0 END) AS BIGINT) AS phash_lo
  FROM bits GROUP BY media_id),
bands AS (
  SELECT media_id,
         CASE WHEN b.i >= 4 THEN (phash_hi >> (CAST(b.i - 4 AS INT) * 8)) & 255
              ELSE (phash_lo >> (CAST(b.i AS INT) * 8)) & 255 END AS byte,
         CAST(b.i AS BIGINT) AS band
  FROM hl, unnest(range(8)) AS b(i)),
cand AS (
  SELECT DISTINCT l.media_id AS media_a, r.media_id AS media_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.byte = r.byte AND l.media_id < r.media_id)
SELECT c2.media_a, c2.media_b,
       CAST(bit_count(xor(a.phash_hi, b.phash_hi))
            + bit_count(xor(a.phash_lo, b.phash_lo)) AS BIGINT) AS hamming
FROM cand c2
JOIN hl a ON a.media_id = c2.media_a
JOIN hl b ON b.media_id = c2.media_b
WHERE bit_count(xor(a.phash_hi, b.phash_hi))
      + bit_count(xor(a.phash_lo, b.phash_lo)) <= 7
"""


def q_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PDF text extraction (operators/pdftext) — the corpus
    build's third document format beside HTML and WARC/WET.  The
    decoder navigates trailer -> /Root -> /Pages -> /Kids (logical page
    order), slices streams by declared /Length, inflates FlateDecode
    with zlib, and scans Tj/TJ show ops with PDF string-escape
    handling.  Fixture lanes: Flate vs plain streams (seed%2), object
    numbering REVERSED vs /Kids (seed%5==0 — a linear-scan parser
    emits pages out of order and fails the hash), lines as split TJ
    arrays with kern numbers (seed%3==1 — concatenation must be
    exact).  The oracle rebuilds the text closed-form from the shared
    fixture formula and never touches the bytes."""
    from biothings_crawler_spark.operators.pdftext import (
        decode_pdf_text,
        gen_pdf_media_seeded,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("media_id"),
        F.expr("doc_id div 10").alias("seed"),
    )
    return decode_pdf_text(gen_pdf_media_seeded(ids))


SQL_PDF_TEXT = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id // 10 AS seed
  FROM documents WHERE doc_id % 10 = 3),
dims AS (SELECT media_id, seed, 1 + seed % 3 AS np, 2 + seed % 4 AS nl
         FROM m),
lines AS (
  SELECT media_id, CAST(p.i AS BIGINT) AS p, CAST(l.i AS BIGINT) AS i,
         'pg' || CAST(p.i AS VARCHAR) || ' ln' || CAST(l.i AS VARCHAR)
         || ' w' || CAST((seed * 31 + p.i * 17 + l.i * 7) % 97 AS VARCHAR)
         || ' (k' || CAST(l.i AS VARCHAR) || ')' AS ln
  FROM dims, unnest(range(np)) AS p(i), unnest(range(nl)) AS l(i)),
pg AS (SELECT media_id, p, string_agg(ln, chr(10) ORDER BY i) AS ptxt
       FROM lines GROUP BY media_id, p),
doc AS (SELECT media_id, string_agg(ptxt, chr(12) ORDER BY p) AS text,
               CAST(COUNT(*) AS BIGINT) AS n_pages
        FROM pg GROUP BY media_id)
SELECT media_id, n_pages, text, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(NULL AS VARCHAR) AS decode_err
FROM doc
"""


_LICENSE_HDR_SPARK = """CASE doc_id % 9
  WHEN 1 THEN '// SPDX-License-Identifier: MIT\n'
  WHEN 2 THEN '// SPDX-License-Identifier: Apache-2.0\n'
  WHEN 3 THEN '// SPDX-License-Identifier: GPL-3.0-only\n'
  WHEN 4 THEN '/* Permission is hereby granted, free of charge */\n'
  WHEN 5 THEN '/* Licensed under the Apache License, Version 2.0 */\n'
  WHEN 6 THEN '/* Redistribution and use in source and binary forms */\n'
  WHEN 7 THEN '/* free software under the GNU General Public License */\n'
  WHEN 8 THEN '// SPDX-License-Identifier: MIT\n/* GNU General Public License */\n'
  ELSE '' END"""


def q_license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License classification for training-data compliance
    (operators/license.detect_licenses, The Stack's inclusion rule):
    SPDX identifier beats phrase heuristics beats 'unknown', scan
    bounded to the 600-char header window.  Fixture lanes prepend a
    deterministic header per doc_id%9 — SPDX ids (incl. GPL), each
    phrase family, a conflict lane where the SPDX MIT line must beat a
    GPL phrase, and a no-header lane.  Oracle replays the identical
    header construction + CASE chain in SQL."""
    from biothings_crawler_spark.operators.license import detect_licenses

    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.concat(F.expr(_LICENSE_HDR_SPARK),
                 F.coalesce(F.col("text"), F.lit(""))).alias("text"),
    )
    return detect_licenses(docs).select(
        "doc_id", "license", "detector", "permissive")


SQL_LICENSE_DETECT = """
WITH d AS (
  SELECT doc_id,
         CASE doc_id % 9
           WHEN 1 THEN '// SPDX-License-Identifier: MIT' || chr(10)
           WHEN 2 THEN '// SPDX-License-Identifier: Apache-2.0' || chr(10)
           WHEN 3 THEN '// SPDX-License-Identifier: GPL-3.0-only' || chr(10)
           WHEN 4 THEN '/* Permission is hereby granted, free of charge */'
                       || chr(10)
           WHEN 5 THEN '/* Licensed under the Apache License, Version 2.0 */'
                       || chr(10)
           WHEN 6 THEN '/* Redistribution and use in source and binary forms */'
                       || chr(10)
           WHEN 7 THEN '/* free software under the GNU General Public License */'
                       || chr(10)
           WHEN 8 THEN '// SPDX-License-Identifier: MIT' || chr(10)
                       || '/* GNU General Public License */' || chr(10)
           ELSE '' END || coalesce(text, '') AS t
  FROM documents),
w AS (SELECT doc_id,
             regexp_extract(substring(t, 1, 600),
                            'SPDX-License-Identifier: ([A-Za-z0-9.\\-]+)',
                            1) AS spdx,
             substring(t, 1, 600) AS win
      FROM d),
cls AS (
  SELECT doc_id,
         CASE WHEN spdx <> '' THEN spdx
              WHEN contains(win, 'Permission is hereby granted, free of charge')
                THEN 'MIT'
              WHEN contains(win, 'Licensed under the Apache License, Version 2.0')
                THEN 'Apache-2.0'
              WHEN contains(win, 'Redistribution and use in source and binary forms')
                THEN 'BSD-3-Clause'
              WHEN contains(win, 'This is free and unencumbered software')
                THEN 'Unlicense'
              WHEN contains(win, 'GNU General Public License')
                THEN 'GPL-3.0-only'
              ELSE 'unknown' END AS license,
         CASE WHEN spdx <> '' THEN 'spdx'
              WHEN contains(win, 'Permission is hereby granted, free of charge')
                OR contains(win, 'Licensed under the Apache License, Version 2.0')
                OR contains(win, 'Redistribution and use in source and binary forms')
                OR contains(win, 'This is free and unencumbered software')
                OR contains(win, 'GNU General Public License')
                THEN 'phrase'
              ELSE 'none' END AS detector
  FROM w)
SELECT doc_id, license, detector,
       CAST(CASE WHEN license IN
                 ('MIT', 'Apache-2.0', 'BSD-3-Clause', 'Unlicense')
                 THEN 1 ELSE 0 END AS BIGINT) AS permissive
FROM cls
"""


def q_epoch_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch allocation (operators/sampling.
    allocate_epochs, after Muennighoff et al. 2023): per-source unique
    tokens from ONE corpus hash agg, then the greedy threshold rule
    over the bounded (source x epoch) candidate table — whole epochs
    while the budget lasts, one partial boundary epoch, integer
    utility.  Budget is pinned at 2.3x the unique pool so the fixture
    exercises full, partial, and cut lanes.  Oracle replays the same
    running-sum prefix in SQL."""
    from biothings_crawler_spark.operators.sampling import allocate_epochs

    d = _t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.lit(1) + F.col("n_chars") % 50).cast("long").alias("tokens"))
    total = src.agg(F.sum("tokens")).collect()[0][0]
    return allocate_epochs(src, int(total) * 23 // 10)


SQL_EPOCH_ALLOC = """
WITH src AS (
  SELECT source, CAST(SUM(1 + n_chars % 50) AS BIGINT) AS tokens
  FROM documents GROUP BY source),
b AS (SELECT CAST(SUM(tokens) AS BIGINT) * 23 // 10 AS budget FROM src),
decay AS (
  SELECT CAST(e.i + 1 AS BIGINT) AS epoch,
         CAST([1000000, 880000, 700000, 450000, 180000][e.i + 1] AS BIGINT)
           AS value_ppm
  FROM unnest(range(5)) AS e(i)),
cand AS (SELECT source, tokens, epoch, value_ppm FROM src, decay),
run AS (
  SELECT source, tokens, epoch, value_ppm,
         SUM(tokens) OVER (ORDER BY value_ppm DESC, tokens DESC, source)
           - tokens AS before_cum
  FROM cand),
alloc AS (
  SELECT source, epoch, tokens, value_ppm,
         CAST(GREATEST(CAST(0 AS BIGINT),
                       LEAST(tokens, (SELECT budget FROM b) - before_cum))
              AS BIGINT) AS tokens_used
  FROM run)
SELECT source, epoch, tokens, value_ppm, tokens_used,
       CAST(tokens_used * value_ppm // 1000000 AS BIGINT) AS utility,
       CASE WHEN tokens_used = tokens THEN 'full'
            WHEN tokens_used > 0 THEN 'partial'
            ELSE 'cut' END AS status
FROM alloc
"""


def q_exif_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction from real JPEG APP1 segments
    (operators/exif): marker scan, TIFF header in BOTH endiannesses
    (seed%2), IFD0 walk with inline vs offset-addressed values (model
    strings inline, make/datetime offset), ExifIFD pointer follow,
    exact-rational exposure.  The oracle rebuilds every field
    closed-form from the shared seed formula and never touches the
    bytes — so endianness, offset arithmetic, and type decoding are
    all on the hook."""
    from biothings_crawler_spark.operators.exif import (
        decode_exif,
        gen_exif_media_seeded,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 9).select(
        F.col("doc_id").alias("media_id"),
        F.expr("doc_id div 10").alias("seed"),
    )
    return decode_exif(gen_exif_media_seeded(ids))


SQL_EXIF_EXTRACT = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id // 10 AS seed
  FROM documents WHERE doc_id % 10 = 9)
SELECT media_id,
       'Cam' || CAST(seed % 7 AS VARCHAR) AS make,
       'M' || CAST(seed % 13 AS VARCHAR) AS model,
       CAST(1 + seed % 8 AS BIGINT) AS orientation,
       '2025:' || lpad(CAST(1 + seed % 12 AS VARCHAR), 2, '0')
       || ':' || lpad(CAST(1 + seed % 28 AS VARCHAR), 2, '0')
       || ' ' || lpad(CAST(seed % 24 AS VARCHAR), 2, '0')
       || ':' || lpad(CAST(seed % 60 AS VARCHAR), 2, '0') || ':00'
         AS taken_at,
       CAST(1 AS BIGINT) AS exposure_num,
       CAST(50 + (seed % 20) * 10 AS BIGINT) AS exposure_den,
       CAST(100 * (1 + seed % 32) AS BIGINT) AS iso,
       CAST(NULL AS VARCHAR) AS decode_err
FROM m
"""


def q_sitemap_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host sitemap.xml rendering (sources/sitemap.render_sitemaps)
    — the inverse of the sitemap scan plane, completing the
    scan/render symmetry the WARC/WET/WAT trio already has.  Part
    files respect the protocol's URL cap (pinned to 20 here so the
    fixture forces multi-part hosts + index documents); part
    assignment is the bounded two-level bucket-offset rank, never a
    whole-host sort; ampersands and angle brackets in URLs must leave
    as XML entities.  Oracle replays buckets, offsets, ranks, caps,
    and the entity escaping in SQL."""
    from biothings_crawler_spark.sources.sitemap import render_sitemaps

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.concat(F.lit("site"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".example.org")).alias("host"),
        F.concat(F.lit("https://site"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
                 F.lit("?a=1&b=<2>")).alias("url"),
        F.date_format(
            F.timestamp_micros(
                (F.lit(1756684800) + F.col("doc_id") % 90 * 86400)
                * 1_000_000),
            "yyyy-MM-dd").alias("lastmod"),
    )
    return render_sitemaps(pages, cap=20, n_buckets=8)


SQL_SITEMAP_RENDER = """
WITH pages AS (
  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS host,
         'https://site' || CAST(doc_id % 7 AS VARCHAR)
         || '.example.org/p/' || CAST(doc_id AS VARCHAR)
         || '?a=1&b=<2>' AS url,
         strftime(to_timestamp(1756684800 + doc_id % 90 * 86400),
                  '%Y-%m-%d') AS lastmod
  FROM documents),
b AS (
  SELECT host, url, lastmod,
         CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % 8 AS bucket
  FROM pages),
counts AS (SELECT host, bucket, CAST(COUNT(*) AS BIGINT) AS n
           FROM b GROUP BY host, bucket),
offs AS (
  SELECT host, bucket,
         CAST(SUM(n) OVER (PARTITION BY host ORDER BY bucket) - n
              AS BIGINT) AS off
  FROM counts),
ranked AS (
  SELECT b.host, b.url, b.lastmod,
         o.off + ROW_NUMBER() OVER
           (PARTITION BY b.host, b.bucket ORDER BY b.url) - 1 AS rank
  FROM b JOIN offs o ON b.host = o.host AND b.bucket = o.bucket),
ent AS (
  SELECT host, rank // 20 AS part, rank,
         '<url><loc>'
         || replace(replace(replace(replace(replace(url,
              '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
              '"', '&quot;'), CHR(39), '&apos;')
         || '</loc><lastmod>' || lastmod || '</lastmod></url>' AS e
  FROM ranked),
parts AS (
  SELECT host, CAST(part AS BIGINT) AS part, 'sitemap' AS kind,
         '<?xml version="1.0" encoding="UTF-8"?><urlset '
         || 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
         || string_agg(e, '' ORDER BY rank) || '</urlset>' AS xml,
         CAST(COUNT(*) AS BIGINT) AS n_urls
  FROM ent GROUP BY host, part),
idx AS (
  SELECT host, CAST(-1 AS BIGINT) AS part, 'index' AS kind,
         '<?xml version="1.0" encoding="UTF-8"?><sitemapindex '
         || 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
         || string_agg('<sitemap><loc>https://' || host || '/sitemap-'
                       || CAST(part AS VARCHAR) || '.xml</loc></sitemap>',
                       '' ORDER BY part)
         || '</sitemapindex>' AS xml,
         CAST(0 AS BIGINT) AS n_urls
  FROM parts GROUP BY host HAVING COUNT(*) > 1)
SELECT host, part, kind, xml, n_urls FROM parts
UNION ALL
SELECT host, part, kind, xml, n_urls FROM idx
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus trigram novelty (operators/text.
    ngram_novelty) — the Self-BLEU-inverse memorization audit: share
    of a document's distinct trigrams that occur in NO other document,
    exact ppm.  One distinct hash agg + one gram-keyed df agg + a
    (gram, df)-only join; oracle replays the identical pipeline from
    an unnest-derived gram stream."""
    from biothings_crawler_spark.operators.text import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"), "doc_id", "text")


SQL_NGRAM_NOVELTY = f"""
WITH w AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
g AS (
  SELECT DISTINCT id,
         words[r.i + 1] || ' ' || words[r.i + 2] || ' ' || words[r.i + 3]
           AS gram
  FROM w, unnest(range(len(words) - 2)) AS r(i)
  WHERE len(words) >= 3),
dfreq AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df
          FROM g GROUP BY gram),
agg AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM g JOIN dfreq USING (gram) GROUP BY id)
SELECT id, n_grams, n_novel,
       CAST(n_novel * 1000000 // n_grams AS BIGINT) AS novelty_ppm
FROM agg
"""


def q_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style release manifest (operators/manifest.
    release_manifest): per-bucket md5 digests over id-ordered leaf
    hashes plus the root row — the verifiable-handoff artifact for a
    corpus release.  Bucketing depends only on ids, so the manifest is
    invariant to physical layout (pinned in pytest); the oracle
    reproduces every digest byte-for-byte in SQL."""
    from biothings_crawler_spark.operators.manifest import release_manifest

    return release_manifest(_t(spark, sf_dir, "documents"),
                            "doc_id", "text", n_buckets=32)


SQL_RELEASE_MANIFEST = """
WITH leaves AS (
  SELECT doc_id AS id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 32 AS bucket,
         md5(CAST(doc_id AS VARCHAR) || ':' || md5(coalesce(text, '')))
           AS leaf
  FROM documents),
buckets AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         md5(string_agg(leaf, '' ORDER BY id)) AS digest
  FROM leaves GROUP BY bucket),
root AS (
  SELECT CAST(-1 AS BIGINT) AS bucket,
         CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         md5(string_agg(digest, '' ORDER BY bucket)) AS digest
  FROM buckets)
SELECT bucket, n_docs, digest FROM buckets
UNION ALL
SELECT bucket, n_docs, digest FROM root
"""


def q_scc_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCC labeling (operators/pagerank.scc_census, FW-BW with
    trimming): three planted chorded-cycle SCCs (one per residue
    class, chords +1/+4/+16 keep the BFS diameter logarithmic) with
    tree nodes hanging off them — trim peels every tree node in one
    pass, then exactly three pivot rounds find the cycles.  The
    oracle computes ground truth from a recursive-CTE transitive
    closure (mutual-reachability min label) — a completely independent
    derivation at fixture scale of what the distributed algorithm must
    produce."""
    from pyspark.sql import Window

    from biothings_crawler_spark.operators.pagerank import scc_census

    d = _t(spark, sf_dir, "documents").select("doc_id")
    mem = d.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("id"), (F.col("doc_id") % 3).alias("g"))
    w = Window.partitionBy("g").orderBy("id")
    mem = mem.withColumn("k", (F.row_number().over(w) - 1).cast("long"))
    msz = mem.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("m"))
    mm = mem.join(msz, "g")
    cyc = None
    for off in (1, 4, 16, 64, 256):
        part = (
            mm.select("g", F.col("id").alias("src"),
                      ((F.col("k") + off) % F.col("m")).alias("kt"))
            .join(mem.select("g", F.col("k").alias("kt"),
                             F.col("id").alias("dst")), ["g", "kt"])
            .select("src", "dst")
        )
        cyc = part if cyc is None else cyc.union(part)
    tre = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(
            F.col("doc_id").alias("src"),
            (F.expr("doc_id div 15") * 15
             + F.expr("CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 10 "
                      "ELSE 5 END")).cast("long").alias("dst"),
        )
        .join(mem.select(F.col("id").alias("dst")), "dst", "left_semi")
    )
    return scc_census(cyc.union(tre.select("src", "dst")), max_hops=64)


SQL_SCC_CENSUS = """
WITH RECURSIVE
mem AS (SELECT doc_id AS id, doc_id % 3 AS g,
               ROW_NUMBER() OVER (PARTITION BY doc_id % 3
                                  ORDER BY doc_id) - 1 AS k
        FROM documents WHERE doc_id % 5 = 0),
msz AS (SELECT g, COUNT(*) AS m FROM mem GROUP BY g),
offs AS (SELECT unnest([1, 4, 16, 64, 256]) AS off),
cyc AS (SELECT a.id AS src, b.id AS dst
        FROM mem a, offs o, msz s, mem b
        WHERE s.g = a.g AND b.g = a.g AND b.k = (a.k + o.off) % s.m),
tre AS (SELECT doc_id AS src,
               (doc_id // 15) * 15
               + CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 10
                 ELSE 5 END AS dst
        FROM documents
        WHERE doc_id % 5 <> 0),
edges AS (SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM cyc
            UNION ALL
            SELECT src, dst FROM tre
            WHERE dst IN (SELECT id FROM mem))),
reach AS (SELECT src AS a, dst AS b FROM edges
          UNION
          SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst AS node FROM edges),
mutual AS (SELECT r1.a AS v, r1.b AS u
           FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
lab AS (SELECT n.node,
               CAST(LEAST(n.node, COALESCE(MIN(m.u), n.node)) AS BIGINT)
                 AS scc_label
        FROM nodes n LEFT JOIN mutual m ON m.v = n.node
        GROUP BY n.node),
sz AS (SELECT scc_label, CAST(COUNT(*) AS BIGINT) AS scc_size
       FROM lab GROUP BY scc_label)
SELECT l.node, l.scc_label, s.scc_size
FROM lab l JOIN sz s USING (scc_label)
"""


def q_robots_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical robots.txt rendering (operators/robots.
    render_robots_txt) from a closed-form per-host policy — the
    parse/render symmetry completion (pytest additionally pins the
    full round-trip parse(render(p)) == p through the REAL parser).
    Lanes: empty and multi-entry rule arrays, NULL vs set
    crawl-delay, multi-sitemap hosts."""
    from biothings_crawler_spark.operators.robots import render_robots_txt

    d = _t(spark, sf_dir, "documents")
    policy = d.filter(F.col("doc_id") % 25 == 0).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"),
                 F.lit("-"), F.col("doc_id").cast("string"),
                 F.lit(".example.org")).alias("host"),
        F.when(F.col("doc_id") % 3 != 0,
               F.array(F.lit("/pub/"), F.lit("/data/")))
        .otherwise(F.array().cast("array<string>")).alias("allow"),
        F.when(F.col("doc_id") % 2 == 0, F.array(F.lit("/private/")))
        .otherwise(F.array(F.lit("/tmp/"),
                           F.lit("/cgi/"))).alias("disallow"),
        F.when(F.col("doc_id") % 4 == 0,
               (1 + F.col("doc_id") % 9).cast("long"))
        .otherwise(F.lit(None).cast("long")).alias("crawl_delay"),
        F.when(F.col("doc_id") % 5 == 0,
               F.array(F.concat(F.lit("https://s"),
                                F.col("doc_id").cast("string"),
                                F.lit("/sm-0.xml")),
                       F.concat(F.lit("https://s"),
                                F.col("doc_id").cast("string"),
                                F.lit("/sm-1.xml"))))
        .otherwise(F.array().cast("array<string>")).alias("sitemap_urls"),
    )
    return render_robots_txt(policy)


SQL_ROBOTS_RENDER = """
WITH p AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 7 AS VARCHAR) || '-'
         || CAST(doc_id AS VARCHAR) || '.example.org' AS host,
         CASE WHEN doc_id % 3 <> 0
              THEN ['Allow: /pub/', 'Allow: /data/']
              ELSE [] END AS al,
         CASE WHEN doc_id % 2 = 0 THEN ['Disallow: /private/']
              ELSE ['Disallow: /tmp/', 'Disallow: /cgi/'] END AS dis,
         CASE WHEN doc_id % 4 = 0
              THEN ['Crawl-delay: ' || CAST(1 + doc_id % 9 AS VARCHAR)]
              ELSE [] END AS cd,
         CASE WHEN doc_id % 5 = 0
              THEN ['Sitemap: https://s' || CAST(doc_id AS VARCHAR)
                    || '/sm-0.xml',
                    'Sitemap: https://s' || CAST(doc_id AS VARCHAR)
                    || '/sm-1.xml']
              ELSE [] END AS sm
  FROM documents WHERE doc_id % 25 = 0)
SELECT host,
       array_to_string(
         flatten([['User-agent: *'], al, dis, cd, sm]), chr(10))
         AS robots_txt
FROM p
"""


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score calibration audit (operators/serving.
    calibration_report): reliability bins + exact-integer ECE.  The
    fixture plants a classifier that is systematically OVERCONFIDENT
    (empirical positive rate = half the score), so bins show a growing
    gap and ECE is provably nonzero; labels derive from a hash coin so
    both engines replay them exactly."""
    from biothings_crawler_spark.operators.serving import calibration_report

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        ((F.col("doc_id") * 37 % 101) * 10000).cast("long")
        .alias("score_ppm"),
        F.when(
            F.conv(F.substring(F.md5(F.concat(
                F.lit("cal:"), F.col("doc_id").cast("string"))), 1, 8),
                16, 10).cast("long") % 1000000
            < (F.col("doc_id") * 37 % 101) * 5000,
            F.lit(1)).otherwise(F.lit(0)).cast("long").alias("label"),
    )
    return calibration_report(scored)


SQL_CALIBRATION = """
WITH scored AS (
  SELECT (doc_id * 37 % 101) * 10000 AS s,
         CASE WHEN CAST(('0x' || substr(md5('cal:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
                  < (doc_id * 37 % 101) * 5000
              THEN 1 ELSE 0 END AS y
  FROM documents),
b AS (SELECT s * 10 // 1000001 AS bin, s, y FROM scored),
bins AS (
  SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_score_ppm,
         CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS emp_ppm
  FROM b GROUP BY bin),
g AS (SELECT bin, n, mean_score_ppm, emp_ppm,
             CAST(ABS(mean_score_ppm - emp_ppm) AS BIGINT) AS gap_ppm
      FROM bins),
tot AS (
  SELECT CAST(-1 AS BIGINT) AS bin, CAST(SUM(n) AS BIGINT) AS n,
         CAST(NULL AS BIGINT) AS mean_score_ppm,
         CAST(NULL AS BIGINT) AS emp_ppm,
         CAST(SUM(CAST(n AS HUGEINT) * gap_ppm) // SUM(n) AS BIGINT)
           AS gap_ppm
  FROM g)
SELECT bin, n, mean_score_ppm, emp_ppm, gap_ppm FROM g
UNION ALL
SELECT bin, n, mean_score_ppm, emp_ppm, gap_ppm FROM tot
"""


def q_audio_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio clip matching by aligned landmark windows
    (operators/multimodal.audio_block_fps + audio_match_pairs, the
    Wang-2003 local-key design over real WAV decode): 4-block
    zero-crossing window md5s joined on (widx, wfp), match ratio in
    exact ppm of the shorter clip.  Fixture quads share a seed — gain
    variants must match fully (zc is gain-invariant), a block-2
    dropout ('glitch') kills only the ≤3 windows touching that block
    so long clips still clear the 50% gate while 1-window clips drop
    — and the oracle recomputes every window hash from the closed-form
    sample formula."""
    from biothings_crawler_spark.operators.multimodal import (
        audio_block_fps,
        audio_match_pairs,
        gen_wav_media_seeded,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 1).select(
        F.col("doc_id").alias("media_id"),
        F.expr("doc_id div 40").alias("seed"),
        F.expr("1 + (((doc_id div 10) % 4) % 2) * 2").alias("amp"),
        F.expr("((doc_id div 10) % 4) div 2").alias("glitch"),
    )
    return audio_match_pairs(audio_block_fps(gen_wav_media_seeded(ids)))


SQL_AUDIO_MATCH = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id // 40 AS seed,
         1 + (((doc_id // 10) % 4) % 2) * 2 AS amp,
         ((doc_id // 10) % 4) // 2 AS gl
  FROM documents WHERE doc_id % 10 = 1),
dims AS (SELECT media_id, seed, amp, gl, 1 + seed % 2 AS c,
                800 + (seed % 5) * 160 AS n
         FROM m),
s AS (
  SELECT media_id, CAST(r.j AS BIGINT) AS j,
         CASE WHEN gl = 1 AND r.j // 240 = 2 AND r.j % 5 = 0
              THEN -((((seed * 31 + r.j * 7) % 2001) - 1000) * amp)
              ELSE (((seed * 31 + r.j * 7) % 2001) - 1000) * amp
         END AS v
  FROM dims, unnest(range(n * c)) AS r(j)),
cr AS (
  SELECT media_id, j, v,
         CASE WHEN j > 0 AND v * lag(v) OVER
                (PARTITION BY media_id ORDER BY j) < 0
              THEN 1 ELSE 0 END AS x
  FROM s),
b AS (SELECT media_id, j // 240 AS blk, CAST(SUM(x) AS BIGINT) AS zc
      FROM cr GROUP BY media_id, j // 240),
nw AS (SELECT media_id, CAST(COUNT(*) - 3 AS BIGINT) AS nw
       FROM b GROUP BY media_id),
w AS (
  SELECT b0.media_id, CAST(b0.blk AS BIGINT) AS widx,
         md5(CAST(b0.zc AS VARCHAR) || ',' || CAST(b1.zc AS VARCHAR)
             || ',' || CAST(b2.zc AS VARCHAR) || ','
             || CAST(b3.zc AS VARCHAR)) AS wfp
  FROM b b0
  JOIN b b1 ON b1.media_id = b0.media_id AND b1.blk = b0.blk + 1
  JOIN b b2 ON b2.media_id = b0.media_id AND b2.blk = b0.blk + 2
  JOIN b b3 ON b3.media_id = b0.media_id AND b3.blk = b0.blk + 3),
hits AS (
  SELECT l.media_id AS media_a, r.media_id AS media_b,
         CAST(COUNT(*) AS BIGINT) AS n_match
  FROM w l JOIN w r
    ON l.widx = r.widx AND l.wfp = r.wfp AND l.media_id < r.media_id
  GROUP BY 1, 2)
SELECT h.media_a, h.media_b, h.n_match,
       CAST(h.n_match * 1000000 // LEAST(a.nw, b2.nw) AS BIGINT)
         AS match_ppm
FROM hits h
JOIN nw a ON a.media_id = h.media_a
JOIN nw b2 ON b2.media_id = h.media_b
WHERE h.n_match * 1000000 // LEAST(a.nw, b2.nw) >= 500000
"""


def q_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-manifest diff (operators/manifest.manifest_diff): two
    manifests of the same corpus where release B tampers with
    doc_id % 97 == 13 rows — the diff must localize to exactly the
    tampered buckets plus the root row, and every untouched bucket
    must vanish from the output.  Oracle rebuilds both manifests and
    the same digest-inequality filter in SQL."""
    from biothings_crawler_spark.operators.manifest import (
        manifest_diff,
        release_manifest,
    )

    d = _t(spark, sf_dir, "documents")
    a = release_manifest(d, "doc_id", "text", n_buckets=32)
    tampered = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 97 == 13,
               F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit("!")))
        .otherwise(F.col("text")).alias("text"),
    )
    b = release_manifest(tampered, "doc_id", "text", n_buckets=32)
    return manifest_diff(a, b)


SQL_MANIFEST_DIFF = """
WITH leaves_a AS (
  SELECT doc_id AS id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 32 AS bucket,
         md5(CAST(doc_id AS VARCHAR) || ':' || md5(coalesce(text, '')))
           AS leaf
  FROM documents),
leaves_b AS (
  SELECT doc_id AS id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 32 AS bucket,
         md5(CAST(doc_id AS VARCHAR) || ':'
             || md5(CASE WHEN doc_id % 97 = 13
                         THEN coalesce(text, '') || '!'
                         ELSE coalesce(text, '') END)) AS leaf
  FROM documents),
ba AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
              md5(string_agg(leaf, '' ORDER BY id)) AS digest
       FROM leaves_a GROUP BY bucket),
bb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
              md5(string_agg(leaf, '' ORDER BY id)) AS digest
       FROM leaves_b GROUP BY bucket),
ra AS (SELECT CAST(-1 AS BIGINT) AS bucket,
              CAST(SUM(n_docs) AS BIGINT) AS n_docs,
              md5(string_agg(digest, '' ORDER BY bucket)) AS digest
       FROM ba),
rb AS (SELECT CAST(-1 AS BIGINT) AS bucket,
              CAST(SUM(n_docs) AS BIGINT) AS n_docs,
              md5(string_agg(digest, '' ORDER BY bucket)) AS digest
       FROM bb),
ma AS (SELECT * FROM ba UNION ALL SELECT * FROM ra),
mb AS (SELECT * FROM bb UNION ALL SELECT * FROM rb)
SELECT COALESCE(ma.bucket, mb.bucket) AS bucket,
       ma.n_docs AS n_docs_a, mb.n_docs AS n_docs_b,
       ma.digest AS digest_a, mb.digest AS digest_b
FROM ma FULL OUTER JOIN mb ON ma.bucket = mb.bucket
WHERE ma.digest IS NULL OR mb.digest IS NULL OR ma.digest <> mb.digest
"""


def q_host_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-scoped template subtraction (operators/text.
    host_boilerplate_strip): a line on >=80% of ONE host's pages is
    that site's chrome and dies there only — the planted cross-host
    'syndicated quote' (14% of each host's pages) must survive
    everywhere, which corpus-global line dedup cannot express.
    Oracle replays the (host, line) presence aggregation, threshold,
    anti-join, and order-preserving reassembly."""
    from biothings_crawler_spark.operators.text import host_boilerplate_strip

    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"))
        .alias("host"),
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\nfooter of h"), (F.col("doc_id") % 5).cast("string"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit("\nshared syndicated quote"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return host_boilerplate_strip(docs, "doc_id", "host", "text")


SQL_HOST_BOILERPLATE = """
WITH w AS (
  SELECT doc_id AS id, 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
         string_split(
           coalesce(text, '') || chr(10) || 'footer of h'
           || CAST(doc_id % 5 AS VARCHAR)
           || CASE WHEN doc_id % 7 = 0
                   THEN chr(10) || 'shared syndicated quote'
                   ELSE '' END,
           chr(10)) AS ls
  FROM documents),
l AS (SELECT id, host, CAST(r.i AS BIGINT) AS pos, ls[r.i + 1] AS line
      FROM w, unnest(range(len(ls))) AS r(i)),
pages AS (SELECT host, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_pages
          FROM l GROUP BY host),
freq AS (SELECT host, line, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
         FROM l GROUP BY host, line),
tmpl AS (SELECT f.host, f.line
         FROM freq f JOIN pages p USING (host)
         WHERE p.n_pages >= 3
           AND f.n_docs * 1000000 >= 800000 * p.n_pages),
kept AS (SELECT l.id, l.host, l.pos, l.line FROM l
         WHERE NOT EXISTS (SELECT 1 FROM tmpl t
                           WHERE t.host = l.host AND t.line = l.line)),
outp AS (SELECT id, host,
                string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                CAST(COUNT(*) AS BIGINT) AS n_kept
         FROM kept GROUP BY id, host),
tot AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM l GROUP BY id)
SELECT w.id, w.host,
       coalesce(o.clean_text, '') AS clean_text,
       CAST(coalesce(o.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(t.n_total, 0) - coalesce(o.n_kept, 0) AS BIGINT)
         AS n_removed
FROM w
LEFT JOIN outp o ON o.id = w.id AND o.host = w.host
LEFT JOIN tot t ON t.id = w.id
"""


def q_homograph_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN homograph collision census (operators/homograph): hosts
    whose confusable skeletons collide.  Fixture plants Cyrillic-і
    spoofs (doc_id%10==4) and digit-0 spoofs (doc_id%10==8) of the
    Latin base hosts; the census must group each spoof with its Latin
    canonical and ignore non-colliding hosts.  Oracle replays the
    identical translate() map — DuckDB's translate is codepoint-wise
    like Spark's."""
    from biothings_crawler_spark.operators.homograph import homograph_groups

    d = _t(spark, sf_dir, "documents")
    base = F.concat(F.lit("site"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.org"))
    host = (
        F.when(F.col("doc_id") % 10 == 4,
               F.translate(base, "i", "і"))
        .when(F.col("doc_id") % 10 == 8, F.translate(base, "o", "0"))
        .otherwise(base)
    )
    return homograph_groups(d.select(host.alias("host")))


SQL_HOMOGRAPH_HOSTS = """
WITH hosts AS (
  SELECT DISTINCT
         CASE WHEN doc_id % 10 = 4
              THEN translate('site' || CAST(doc_id % 7 AS VARCHAR)
                             || '.example.org', 'i', 'і')
              WHEN doc_id % 10 = 8
              THEN translate('site' || CAST(doc_id % 7 AS VARCHAR)
                             || '.example.org', 'o', '0')
              ELSE 'site' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.org' END AS host
  FROM documents),
sk AS (SELECT host,
              translate(lower(host), 'аеорсхуіѕј01', 'aeopcxyisjol')
                AS skeleton
       FROM hosts),
grp AS (SELECT skeleton, CAST(COUNT(*) AS BIGINT) AS n_hosts,
               MIN(host) AS canonical
        FROM sk GROUP BY skeleton HAVING COUNT(*) > 1)
SELECT g.skeleton, s.host, g.canonical, g.n_hosts
FROM sk s JOIN grp g USING (skeleton)
"""


def q_nofollow_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-level rel-attribute classification (RFC-style
    nofollow/ugc/sponsored beside the PAGE-level meta-robots gate,
    q_meta_robots): per anchor, the href plus whether a compliant
    frontier may follow it — rel tokens are matched as tokens inside
    the quoted attribute, attribute order must not matter, and
    anchors without href drop.  Pure codegen regex chain shared
    shape-for-shape with the RE2 oracle."""
    d = _t(spark, sf_dir, "documents")
    n_links = 1 + F.col("doc_id") % 4
    link = F.transform(
        F.sequence(F.lit(0), n_links - 1),
        lambda j: F.concat(
            F.lit('<a '),
            F.when((F.col("doc_id") + j) % 3 == 0,
                   F.lit('rel="nofollow noopener" '))
            .when((F.col("doc_id") + j) % 3 == 1,
                  F.lit('rel="ugc sponsored" '))
            .otherwise(F.lit("")),
            F.lit('href="https://t'), (F.col("doc_id") * 10 + j)
            .cast("string"), F.lit('.org/p">x</a>'),
        ),
    )
    html = F.concat(F.lit("<html><body>"),
                    F.array_join(link, " "),
                    F.lit('<a name="anchor-no-href">y</a></body></html>'))
    pages = d.select("doc_id", html.alias("html"))
    attrs = pages.select(
        "doc_id",
        F.explode(F.expr(r"regexp_extract_all(html, '<a\\s+([^>]*)>', 1)"))
        .alias("attr"),
    )
    out = attrs.select(
        "doc_id",
        F.regexp_extract("attr", r'href="([^"]*)"', 1).alias("href"),
        F.regexp_extract("attr", r'rel="([^"]*)"', 1).alias("_rel"),
    ).filter(F.col("href") != "").select(
        "doc_id", "href",
        F.when(F.col("_rel").rlike(r"(^|\s)nofollow(\s|$)"),
               F.lit("nofollow"))
        .when(F.col("_rel").rlike(r"(^|\s)(ugc|sponsored)(\s|$)"),
              F.lit("ugc_sponsored"))
        .otherwise(F.lit("follow")).alias("rel_class"),
    ).withColumn(
        "may_follow",
        F.when(F.col("rel_class") == "follow", F.lit(1))
        .otherwise(F.lit(0)).cast("long"),
    )
    return out


SQL_NOFOLLOW_LINKS = """
WITH pages AS (
  SELECT doc_id,
         '<html><body>' || array_to_string(list_transform(
           range(1 + doc_id % 4),
           j -> '<a ' ||
                CASE WHEN (doc_id + j) % 3 = 0
                     THEN 'rel="nofollow noopener" '
                     WHEN (doc_id + j) % 3 = 1
                     THEN 'rel="ugc sponsored" '
                     ELSE '' END
                || 'href="https://t' || CAST(doc_id * 10 + j AS VARCHAR)
                || '.org/p">x</a>'), ' ')
         || '<a name="anchor-no-href">y</a></body></html>' AS html
  FROM documents),
attrs AS (
  SELECT doc_id, unnest(regexp_extract_all(html, '<a\\s+([^>]*)>', 1))
           AS attr
  FROM pages),
links AS (
  SELECT doc_id,
         regexp_extract(attr, 'href="([^"]*)"', 1) AS href,
         regexp_extract(attr, 'rel="([^"]*)"', 1) AS r
  FROM attrs)
SELECT doc_id, href,
       CASE WHEN regexp_matches(r, '(^|[ ])nofollow([ ]|$)')
              THEN 'nofollow'
            WHEN regexp_matches(r, '(^|[ ])(ugc|sponsored)([ ]|$)')
              THEN 'ugc_sponsored'
            ELSE 'follow' END AS rel_class,
       CAST(CASE WHEN NOT regexp_matches(r, '(^|[ ])nofollow([ ]|$)')
                  AND NOT regexp_matches(r, '(^|[ ])(ugc|sponsored)([ ]|$)')
                 THEN 1 ELSE 0 END AS BIGINT) AS may_follow
FROM links WHERE href <> ''
"""


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic HTML table extraction (operators/extract.html_tables):
    per-cell rows with 0-based table/row/col indexes, th-vs-td header
    flags, inner markup stripped.  Fixture: a header+data table per
    doc (dims vary by doc), a second single-row table for doc_id%4==0
    (multi-table indexing lane), and bold markup inside every
    (r+c)%5==0 cell (strip lane).  Oracle rebuilds every cell from the
    closed-form value formula, never parsing HTML."""
    from biothings_crawler_spark.operators.extract import html_tables

    d = _t(spark, sf_dir, "documents")
    ncols = 2 + F.col("doc_id") % 2
    nrows = 1 + F.col("doc_id") % 3

    def cell(r, c):
        v = F.concat(F.lit("v"),
                     ((F.col("doc_id") * 97 + r * 7 + c) % 1000)
                     .cast("string"))
        return F.when((r + c) % 5 == 0,
                      F.concat(F.lit("<b>"), v, F.lit("</b>"))) \
            .otherwise(v)

    hdr = F.concat(F.lit("<tr>"), F.array_join(
        F.transform(F.sequence(F.lit(0), ncols - 1),
                    lambda c: F.concat(F.lit("<th>hd"), c.cast("string"),
                                       F.lit("</th>"))), ""),
        F.lit("</tr>"))
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), nrows),
            lambda r: F.concat(F.lit("<tr>"), F.array_join(
                F.transform(F.sequence(F.lit(0), ncols - 1),
                            lambda c: F.concat(F.lit("<td>"), cell(r, c),
                                               F.lit("</td>"))), ""),
                F.lit("</tr>"))), "")
    t2 = F.when(
        F.col("doc_id") % 4 == 0,
        F.lit("<table class=x><tr><td>extra0</td><td>extra1</td></tr>"
              "</table>")).otherwise(F.lit(""))
    html = F.concat(F.lit("<html><body><p>prose</p><table>"), hdr, body,
                    F.lit("</table>"), t2, F.lit("</body></html>"))
    return html_tables(d.select("doc_id", html.alias("html")),
                       "doc_id", "html").withColumnRenamed("id", "doc_id")


SQL_HTML_TABLES = """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 2 AS ncols, 1 + doc_id % 3 AS nrows
  FROM documents),
hdr AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS table_idx, CAST(0 AS BIGINT) AS row,
         CAST(c.i AS BIGINT) AS col,
         'hd' || CAST(c.i AS VARCHAR) AS cell, CAST(1 AS BIGINT) AS is_header
  FROM d, unnest(range(ncols)) AS c(i)),
body AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS table_idx,
         CAST(r.i + 1 AS BIGINT) AS row, CAST(c.i AS BIGINT) AS col,
         'v' || CAST((doc_id * 97 + (r.i + 1) * 7 + c.i) % 1000 AS VARCHAR)
           AS cell,
         CAST(0 AS BIGINT) AS is_header
  FROM d, unnest(range(nrows)) AS r(i), unnest(range(ncols)) AS c(i)),
extra AS (
  SELECT doc_id, CAST(1 AS BIGINT) AS table_idx, CAST(0 AS BIGINT) AS row,
         CAST(c.i AS BIGINT) AS col,
         'extra' || CAST(c.i AS VARCHAR) AS cell,
         CAST(0 AS BIGINT) AS is_header
  FROM d, unnest(range(2)) AS c(i)
  WHERE doc_id % 4 = 0)
SELECT doc_id, table_idx, row, col, cell, is_header FROM hdr
UNION ALL SELECT doc_id, table_idx, row, col, cell, is_header FROM body
UNION ALL SELECT doc_id, table_idx, row, col, cell, is_header FROM extra
"""


def q_pagination_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=next pagination assembly (operators/redirects.
    assemble_pagination): series = chains of pages in reading order.
    Fixture chains vary 1-4 pages; every 13th chain's last page points
    BACK to page 1 — the cycle lane must flag and terminate without
    burning the hop budget.  Oracle replays the walk as a recursive
    CTE with the same row-local cycle test."""
    from biothings_crawler_spark.operators.redirects import (
        assemble_pagination,
    )

    d = _t(spark, sf_dir, "documents")
    g = F.expr("doc_id div 4")
    pp = F.col("doc_id") % 4
    ln = 1 + g % 4
    cyc = (g % 13 == 5) & (ln >= 2)

    def url(pos):
        return F.concat(F.lit("https://s/a"), g.cast("string"),
                        F.lit("/p"), pos.cast("string"))

    pages = d.filter(pp < ln).select(
        url(pp).alias("url"),
        F.when(cyc & (pp == ln - 1), url(F.lit(1)))
        .when(pp + 1 < ln, url(pp + 1))
        .otherwise(F.lit(None).cast("string")).alias("next_url"),
    )
    return assemble_pagination(pages)


SQL_PAGINATION_CHAINS = """
WITH RECURSIVE base AS (
  SELECT doc_id // 4 AS g, doc_id % 4 AS pp,
         1 + (doc_id // 4) % 4 AS L,
         ((doc_id // 4) % 13 = 5) AND (1 + (doc_id // 4) % 4 >= 2) AS cyc
  FROM documents),
p AS (
  SELECT 'https://s/a' || CAST(g AS VARCHAR) || '/p' || CAST(pp AS VARCHAR)
           AS url,
         CASE WHEN cyc AND pp = L - 1
              THEN 'https://s/a' || CAST(g AS VARCHAR) || '/p1'
              WHEN pp + 1 < L
              THEN 'https://s/a' || CAST(g AS VARCHAR) || '/p'
                   || CAST(pp + 1 AS VARCHAR)
              ELSE NULL END AS next
  FROM base WHERE pp < L),
starts AS (
  SELECT url, next FROM p
  WHERE url NOT IN (SELECT next FROM p WHERE next IS NOT NULL)),
walk AS (
  SELECT url AS series, url AS chain, next AS cur, 1 AS n,
         CASE WHEN next IS NULL THEN 'complete' END AS status
  FROM starts
  UNION ALL
  SELECT w.series, w.chain || '|' || w.cur, p2.next, w.n + 1,
         CASE WHEN p2.next IS NULL THEN 'complete'
              WHEN position('|' || p2.next || '|'
                   IN '|' || w.chain || '|' || w.cur || '|') > 0
                THEN 'cycle'
         END
  FROM walk w LEFT JOIN p p2 ON p2.url = w.cur
  WHERE w.status IS NULL AND w.n <= 16)
SELECT series, CAST(n AS BIGINT) AS n_pages, chain,
       COALESCE(status, 'truncated') AS status
FROM walk WHERE status IS NOT NULL
"""


def q_js_required(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Client-side-rendering detection (operators/extract.
    js_required_col): the routing gate for a headless-fetch queue.
    Fixture lanes by doc_id%5: plain article (not flagged), SPA mount
    point + giant bundle (flagged via spa), script-heavy-but-readable
    page (flagged via >60% ratio), noscript fallback (reported, not
    flagged), thin page with a small script (flagged via
    visible<80&script>0).  Oracle replays the strip/ratio/rule chain
    in RE2 + BIGINT //."""
    from biothings_crawler_spark.operators.extract import js_required_col

    d = _t(spark, sf_dir, "documents")
    body = F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 120)
    lane = F.col("doc_id") % 5
    html = (
        F.when(lane == 0, F.concat(
            F.lit("<html><body><p>"), body, F.lit("</p></body></html>")))
        .when(lane == 1, F.concat(
            F.lit('<html><body><div id="root"></div><script>'),
            F.repeat(F.lit("var x=1;"), 40), F.lit("</script></body></html>")))
        .when(lane == 2, F.concat(
            F.lit("<html><body><p>"), body,
            F.lit("</p><script>"), F.repeat(F.lit("f();"), 200),
            F.lit("</script></body></html>")))
        .when(lane == 3, F.concat(
            F.lit("<html><body><noscript><p>"), body,
            F.lit("</p></noscript></body></html>")))
        .otherwise(F.concat(
            F.lit("<html><body><p>hi</p><script>go()</script>"
                  "</body></html>")))
    )
    m = js_required_col(html)
    return d.select(
        "doc_id",
        m["script_ratio_ppm"].alias("script_ratio_ppm"),
        m["visible_len"].alias("visible_len"),
        m["spa_mount"].alias("spa_mount"),
        m["has_noscript"].alias("has_noscript"),
        m["js_required"].alias("js_required"),
    )


SQL_JS_REQUIRED = """
WITH pages AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN '<html><body><p>'
                       || substring(coalesce(text, ''), 1, 120)
                       || '</p></body></html>'
           WHEN 1 THEN '<html><body><div id="root"></div><script>'
                       || repeat('var x=1;', 40)
                       || '</script></body></html>'
           WHEN 2 THEN '<html><body><p>'
                       || substring(coalesce(text, ''), 1, 120)
                       || '</p><script>' || repeat('f();', 200)
                       || '</script></body></html>'
           WHEN 3 THEN '<html><body><noscript><p>'
                       || substring(coalesce(text, ''), 1, 120)
                       || '</p></noscript></body></html>'
           ELSE '<html><body><p>hi</p><script>go()</script></body></html>'
         END AS html
  FROM documents),
m AS (
  SELECT doc_id, html,
         regexp_replace(html, '(?is)<script[^>]*>.*?</script>', '', 'gs')
           AS stripped
  FROM pages),
m2 AS (
  SELECT doc_id, html, stripped,
         length(html) - length(stripped) AS script_bytes,
         length(trim(regexp_replace(regexp_replace(regexp_replace(
           stripped, '(?is)<style[^>]*>.*?</style>', '', 'gs'),
           '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g'))) AS visible_len,
         CASE WHEN regexp_matches(html,
                '(?i)<div id="(root|app)"\\s*>\\s*</div>')
              THEN 1 ELSE 0 END AS spa_mount,
         CASE WHEN regexp_matches(html, '(?i)<noscript[\\s>]')
              THEN 1 ELSE 0 END AS has_noscript
  FROM m)
SELECT doc_id,
       CAST(script_bytes * 1000000 // GREATEST(length(html), 1) AS BIGINT)
         AS script_ratio_ppm,
       CAST(visible_len AS BIGINT) AS visible_len,
       CAST(spa_mount AS BIGINT) AS spa_mount,
       CAST(has_noscript AS BIGINT) AS has_noscript,
       CAST(CASE WHEN spa_mount = 1
                  OR (visible_len < 80 AND script_bytes > 0)
                  OR script_bytes * 1000000
                     // GREATEST(length(html), 1) > 600000
                 THEN 1 ELSE 0 END AS BIGINT) AS js_required
FROM m2
"""


def q_query_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fielded query-language parsing (operators/serving.
    parse_queries): Lucene-style subset — field prefixes, ``-``
    negation, quoted phrases with interior spaces, unknown prefixes
    degrade to text terms.  Query strings are synthesized closed-form
    per doc so the oracle rebuilds and re-parses identically in RE2."""
    from biothings_crawler_spark.operators.serving import parse_queries

    d = _t(spark, sf_dir, "documents")
    q = F.concat(
        F.lit("data host:s"), (F.col("doc_id") % 9).cast("string"),
        F.lit(".org -lang:de "),
        F.lit('"exact phrase '), (F.col("doc_id") % 4).cast("string"),
        F.lit('" '),
        F.when(F.col("doc_id") % 3 == 0, F.lit("foo:bar "))
        .otherwise(F.lit("")),
        F.lit("-noise title:spark"),
    )
    return parse_queries(
        d.select(F.col("doc_id").alias("query_id"), q.alias("q")))


SQL_QUERY_PARSE = """
WITH qs AS (
  SELECT doc_id AS query_id,
         lower('data host:s' || CAST(doc_id % 9 AS VARCHAR)
         || '.org -lang:de "exact phrase '
         || CAST(doc_id % 4 AS VARCHAR) || '" '
         || CASE WHEN doc_id % 3 = 0 THEN 'foo:bar ' ELSE '' END
         || '-noise title:spark') AS q
  FROM documents),
toks AS (
  SELECT query_id, t.i - 1 AS clause_idx,
         arr[t.i] AS tok
  FROM (SELECT query_id,
               regexp_extract_all(q,
                 '(-?(?:[a-z]+:)?"[^"]*"|\\S+)', 1) AS arr
        FROM qs), unnest(range(1, len(arr) + 1)) AS t(i)),
c1 AS (
  SELECT query_id, clause_idx,
         CASE WHEN tok LIKE '-%' THEN 1 ELSE 0 END AS negated,
         CASE WHEN tok LIKE '-%' THEN substring(tok, 2) ELSE tok END
           AS body
  FROM toks),
c2 AS (
  SELECT query_id, clause_idx, negated,
         regexp_extract(body, '^(title|host|lang|text):', 1) AS fld,
         body
  FROM c1),
c3 AS (
  SELECT query_id, clause_idx, negated,
         CASE WHEN fld = '' THEN 'text' ELSE fld END AS field,
         CASE WHEN fld = '' THEN body
              ELSE substring(body, length(fld) + 2) END AS rest
  FROM c2)
SELECT query_id, CAST(clause_idx AS BIGINT) AS clause_idx, field,
       CASE WHEN regexp_matches(rest, '^"[^"]*"$')
            THEN substring(rest, 2, length(rest) - 2)
            ELSE rest END AS term,
       CAST(negated AS BIGINT) AS negated,
       CAST(CASE WHEN regexp_matches(rest, '^"[^"]*"$') THEN 1 ELSE 0 END
            AS BIGINT) AS is_phrase
FROM c3
WHERE (CASE WHEN regexp_matches(rest, '^"[^"]*"$')
            THEN substring(rest, 2, length(rest) - 2)
            ELSE rest END) <> ''
"""


SHARD_SKIP_QUERY = ["merge", "vector", "dup"]


def q_shard_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-skip bloom planning (operators/bm25.shard_skip_report):
    per-shard term-membership bloom bits (sparse exact form) probed by
    a conjunctive query, with the ground truth beside it — the bloom
    guarantee (truth=1 implies candidate=1) is structural and
    pytest-pinned; false-positive shards are visible in the report.
    'dup' appears in ~5% of documents, so over 64 fine shards many
    genuinely lack it and the skip actually skips (bloom false
    positives, if any, are visible as candidate=1/truth=0 rows).  Oracle replays the md5 bit math,
    the distinct-bit probe count, and the truth join in SQL."""
    from biothings_crawler_spark.operators.bm25 import shard_skip_report

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 64).alias("shard"))
    return shard_skip_report(d, "doc_id", "text", "shard",
                             SHARD_SKIP_QUERY)


def _sql_shard_skip() -> str:
    qb = []
    import hashlib

    for t in SHARD_SKIP_QUERY:
        for h in range(3):
            qb.append(int(hashlib.md5(f"{h}:{t}".encode())
                          .hexdigest()[:8], 16) % 1024)
    qbits = sorted(set(qb))
    terms = ", ".join(f"'{t}'" for t in SHARD_SKIP_QUERY)
    return f"""
WITH d AS (SELECT doc_id, doc_id % 64 AS shard, {_SQL_WORDS} AS words
           FROM documents),
pairs AS (SELECT DISTINCT shard, unnest(words) AS term FROM d),
bits AS (
  SELECT DISTINCT shard,
         CAST(('0x' || substr(md5(CAST(h.i AS VARCHAR) || ':' || term),
                              1, 8)) AS BIGINT) % 1024 AS bit
  FROM pairs, unnest(range(3)) AS h(i)),
cand AS (
  SELECT shard, CAST(COUNT(DISTINCT bit) AS BIGINT) AS n_hit
  FROM bits WHERE bit IN ({', '.join(str(b) for b in qbits)})
  GROUP BY shard),
truth AS (
  SELECT shard, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
  FROM pairs WHERE term IN ({terms}) GROUP BY shard),
shards AS (SELECT DISTINCT shard FROM d)
SELECT s.shard,
       CAST(COALESCE(c.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(CASE WHEN COALESCE(c.n_hit, 0) = {len(qbits)}
                 THEN 1 ELSE 0 END AS BIGINT) AS candidate,
       CAST(CASE WHEN COALESCE(t.n_terms, 0) = {len(SHARD_SKIP_QUERY)}
                 THEN 1 ELSE 0 END AS BIGINT) AS truth
FROM shards s
LEFT JOIN cand c ON c.shard = s.shard
LEFT JOIN truth t ON t.shard = s.shard
"""


SQL_SHARD_SKIP = _sql_shard_skip()


WSEG_WORDS = ["merge", "vector", "stream", "hash", "join", "scan",
              "data", "table", "spark", "window", "batch", "row"]


def q_word_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary word segmentation (operators/serving.segment_words):
    space-free strings rebuilt from the corpus vocabulary by exact DP
    — fewest words, then highest total frequency, then smallest
    joined string.  Inputs concatenate three known corpus words per
    doc; the corpus-derived (term, freq) table is the broadcast side.
    The oracle walks EVERY segmentation with a recursive CTE and
    applies the identical tie-break — DP optimality itself is on the
    hook, not just the arithmetic."""
    from biothings_crawler_spark.operators.serving import segment_words
    from biothings_crawler_spark.operators.text import words_col

    d = _t(spark, sf_dir, "documents")
    vocab = d.select(F.explode(words_col(F.col("text"))).alias("term")) \
        .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    w = F.array(*[F.lit(x) for x in WSEG_WORDS])
    q = F.concat(
        F.element_at(w, (F.col("doc_id") % 12 + 1).cast("int")),
        F.element_at(w, (F.expr("doc_id div 12") % 12 + 1).cast("int")),
        F.element_at(w, (F.col("doc_id") * 7 % 12 + 1).cast("int")),
    )
    queries = d.select(F.col("doc_id").alias("query_id"), q.alias("q"))
    return segment_words(queries, vocab)


def _sql_word_segment() -> str:
    arr = "[" + ", ".join(f"'{x}'" for x in WSEG_WORDS) + "]"
    return f"""
WITH RECURSIVE
v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest({_SQL_WORDS}) AS term FROM documents)
      GROUP BY term),
qs AS (
  SELECT doc_id AS query_id,
         {arr}[CAST(doc_id % 12 AS INT) + 1]
         || {arr}[CAST((doc_id // 12) % 12 AS INT) + 1]
         || {arr}[CAST(doc_id * 7 % 12 AS INT) + 1] AS q
  FROM documents),
walk AS (
  SELECT query_id, q, 0 AS pos, 0 AS n, CAST(0 AS BIGINT) AS fs,
         '' AS path
  FROM qs
  UNION ALL
  SELECT w.query_id, w.q, w.pos + len(v.term), w.n + 1, w.fs + v.freq,
         CASE WHEN w.path = '' THEN v.term
              ELSE w.path || ' ' || v.term END
  FROM walk w JOIN v
    ON substring(w.q, w.pos + 1, len(v.term)) = v.term
  WHERE w.pos < len(w.q) AND len(v.term) <= 12),
full_segs AS (
  SELECT query_id, n, fs, path FROM walk WHERE pos = len(q)),
best AS (
  SELECT query_id, path, n FROM full_segs
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY n, fs DESC, path) = 1)
SELECT q2.query_id, b.path AS segmented,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_words
FROM qs q2 LEFT JOIN best b USING (query_id)
"""


SQL_WORD_SEGMENT = _sql_word_segment()


def q_feed_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atom feed rendering (sources/feed.render_atom) — the publishing
    side of the polling loop; cap pinned to 5 so the newest-first
    truncation lane is exercised (feeds have 3-10 candidate entries).
    Titles carry '&'/'<' to exercise escaping; pytest additionally
    round-trips parse_feed(render_atom(e)).  Oracle replays ranking,
    cap, escaping, and framing in SQL."""
    from biothings_crawler_spark.sources.feed import render_atom

    d = _t(spark, sf_dir, "documents")
    entries = d.select(
        F.concat(F.lit("https://f"), (F.col("doc_id") % 60).cast("string"),
                 F.lit(".org/feed")).alias("feed_url"),
        F.concat(F.lit("id-"), F.col("doc_id").cast("string"))
        .alias("entry_id"),
        F.concat(F.lit("T&tle <"), (F.col("doc_id") % 97).cast("string"),
                 F.lit(">")).alias("title"),
        F.concat(F.lit("https://p/"), F.col("doc_id").cast("string"))
        .alias("link"),
        F.date_format(
            F.timestamp_micros(
                (F.lit(1756684800) + F.col("doc_id") % 400 * 3600)
                * 1_000_000),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("updated_iso"),
    )
    return render_atom(entries, cap=5)


SQL_FEED_RENDER = """
WITH e AS (
  SELECT 'https://f' || CAST(doc_id % 60 AS VARCHAR) || '.org/feed'
           AS feed,
         'id-' || CAST(doc_id AS VARCHAR) AS entry_id,
         replace(replace(replace(
           'T&tle <' || CAST(doc_id % 97 AS VARCHAR) || '>',
           '&', '&amp;'), '<', '&lt;'), '>', '&gt;') AS title_esc,
         'https://p/' || CAST(doc_id AS VARCHAR) AS link,
         strftime(to_timestamp(1756684800 + doc_id % 400 * 3600),
                  '%Y-%m-%dT%H:%M:%SZ') AS upd
  FROM documents),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY feed
                               ORDER BY upd DESC, entry_id) AS r
  FROM e QUALIFY r <= 5),
docs AS (
  SELECT feed,
         '<?xml version="1.0" encoding="utf-8"?>'
         || '<feed xmlns="http://www.w3.org/2005/Atom">'
         || string_agg('<entry><id>' || entry_id || '</id><title>'
                       || title_esc || '</title><link href="' || link
                       || '"/><updated>' || upd || '</updated></entry>',
                       '' ORDER BY r)
         || '</feed>' AS atom_xml,
         CAST(COUNT(*) AS BIGINT) AS n_entries
  FROM ranked GROUP BY feed)
SELECT feed AS feed_url, atom_xml, n_entries FROM docs
"""


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-centroid drift between snapshots (operators/quantize.
    embedding_drift): snapshot B REVERSES the vectors of labels with
    label%3==0 (a deterministic stand-in for a re-trained encoder) —
    those labels must show cos2 far below 10^6 while untouched labels
    sit at exactly 10^6.  Code-space integer sums make the statistic
    order-independent; oracle replays quantization, per-(label,dim)
    sums, and the HUGEINT cosine fold."""
    from biothings_crawler_spark.operators.quantize import embedding_drift

    e = _t(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        F.when(F.col("label") % 3 == 0, F.reverse("embedding"))
        .otherwise(F.col("embedding")).alias("embedding"),
        "label",
    )
    return embedding_drift(e, b)


SQL_EMBEDDING_DRIFT = """
WITH qa AS (
  SELECT label, embedding AS v FROM embeddings),
qb AS (
  SELECT label,
         CASE WHEN label % 3 = 0 THEN list_reverse(embedding)
              ELSE embedding END AS v
  FROM embeddings),
ca AS (
  SELECT label, CAST(d.i AS INT) AS dim,
         CAST(SUM(CASE WHEN list_max(v) - list_min(v) > 0
                  THEN CAST(floor((CAST(v[d.i + 1] AS DOUBLE)
                       - CAST(list_min(v) AS DOUBLE)) * 255
                       / (CAST(list_max(v) AS DOUBLE)
                          - CAST(list_min(v) AS DOUBLE)) + 0.5) AS INT)
                  ELSE 0 END) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM qa, unnest(range(len(v))) AS d(i)
  GROUP BY label, d.i),
cb AS (
  SELECT label, CAST(d.i AS INT) AS dim,
         CAST(SUM(CASE WHEN list_max(v) - list_min(v) > 0
                  THEN CAST(floor((CAST(v[d.i + 1] AS DOUBLE)
                       - CAST(list_min(v) AS DOUBLE)) * 255
                       / (CAST(list_max(v) AS DOUBLE)
                          - CAST(list_min(v) AS DOUBLE)) + 0.5) AS INT)
                  ELSE 0 END) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM qb, unnest(range(len(v))) AS d(i)
  GROUP BY label, d.i),
j AS (
  SELECT ca.label, ca.s AS sa, cb.s AS sb, ca.n AS na, cb.n AS nb
  FROM ca JOIN cb ON ca.label = cb.label AND ca.dim = cb.dim),
per AS (
  SELECT label,
         SUM(CAST(sa AS HUGEINT) * sb) AS dot,
         SUM(CAST(sa AS HUGEINT) * sa) AS aa,
         SUM(CAST(sb AS HUGEINT) * sb) AS bb,
         CAST(MAX(na) AS BIGINT) AS n_vecs_a,
         CAST(MAX(nb) AS BIGINT) AS n_vecs_b
  FROM j GROUP BY label)
SELECT label, n_vecs_a, n_vecs_b,
       CAST(dot * dot * 1000000 // (aa * bb) AS BIGINT) AS cos2_ppm,
       CAST(CASE WHEN dot * dot * 1000000 // (aa * bb) < 900000
                 THEN 1 ELSE 0 END AS BIGINT) AS drifted
FROM per
"""


def q_refs_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing reference-section removal (operators/textnorm.
    strip_references).  Lanes by doc_id%5: clean doc (unchanged),
    'References' heading + citation lines (cut), 'Bibliography:' with
    colon (cut), the word references mid-prose only (NOT cut), and
    TWO headings where the cut must land at the LAST one.  Oracle
    replays the greedy-prefix extract and the whole-line match in
    RE2."""
    from biothings_crawler_spark.operators.textnorm import strip_references

    d = _t(spark, sf_dir, "documents")
    body = F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 100)
    lane = F.col("doc_id") % 5
    txt = (
        F.when(lane == 0, body)
        .when(lane == 1, F.concat(
            body, F.lit("\nReferences\n[1] Smith 2020\n[2] Lee 2021")))
        .when(lane == 2, F.concat(
            body, F.lit("\nBibliography:\n- a book")))
        .when(lane == 3, F.concat(
            F.lit("see the references section of "), body))
        .otherwise(F.concat(
            body, F.lit("\nreferences\nearly block\nmore prose\n"
                        "REFERENCES\n[9] Late 2024")))
    )
    return strip_references(
        d.select("doc_id", txt.alias("text")), "doc_id", "text")


SQL_REFS_STRIP = """
WITH d AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN substring(coalesce(text, ''), 1, 100)
           WHEN 1 THEN substring(coalesce(text, ''), 1, 100)
                || chr(10) || 'References' || chr(10) || '[1] Smith 2020'
                || chr(10) || '[2] Lee 2021'
           WHEN 2 THEN substring(coalesce(text, ''), 1, 100)
                || chr(10) || 'Bibliography:' || chr(10) || '- a book'
           WHEN 3 THEN 'see the references section of '
                || substring(coalesce(text, ''), 1, 100)
           ELSE substring(coalesce(text, ''), 1, 100)
                || chr(10) || 'references' || chr(10) || 'early block'
                || chr(10) || 'more prose' || chr(10) || 'REFERENCES'
                || chr(10) || '[9] Late 2024'
         END AS t
  FROM documents),
m AS (
  SELECT doc_id, t,
         regexp_matches(t,
           '(?im)^(?:references|bibliography|works\\s+cited)'
           || '[ \\t]*:?[ \\t]*$') AS hit,
         regexp_extract(t,
           '(?is)^((?:.*\\n)*)(?:references|bibliography|works\\s+cited)'
           || '[ \\t]*:?[ \\t]*(?:\\n.*)?$', 1) AS head
  FROM d)
SELECT doc_id AS id,
       CASE WHEN hit THEN regexp_replace(head, '\\s+$', '')
            ELSE t END AS clean_text,
       CAST(length(CASE WHEN hit THEN regexp_replace(head, '\\s+$', '')
                        ELSE t END) AS BIGINT) AS n_chars_kept,
       CAST(length(t)
            - length(CASE WHEN hit THEN regexp_replace(head, '\\s+$', '')
                          ELSE t END) AS BIGINT) AS n_chars_cut
FROM m
"""


def q_depth_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl depth-yield curve — the planner's 'how deep is still
    worth it' report: per BFS depth from the trustrank seed set
    (q_seed_distance's exact shape), page count, exact mean quality
    (ppm over the q40 scale), and the cumulative page share.  The
    per-depth census is one hash agg; the cumulative runs over <= 7
    depth rows (bounded window by construction, the epoch-alloc
    precedent).  Oracle: the same recursive-CTE distances + quality
    twin + window."""
    from pyspark.sql import Window

    from biothings_crawler_spark.operators.pagerank import seed_distance

    e = _hub_edges(spark, sf_dir)
    seeds = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 13 == 0)
    )
    dist = seed_distance(e, seeds, max_hops=SEED_HOPS)
    d = _t(spark, sf_dir, "documents")
    q = d.select(F.col("doc_id").alias("node"),
                 F.round(quality_score_col(F.col("text")) * 40)
                 .cast("long").alias("q40"))
    per = (
        dist.join(q, "node")
        .groupBy("dist")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
             F.sum("q40").cast("long").alias("_sq"))
        .withColumn("mean_q_ppm",
                    F.expr("_sq * 1000000 div (n_pages * 40)")
                    .cast("long"))
    )
    tot = per.agg(F.sum("n_pages").cast("long").alias("_tot"))
    w = Window.orderBy("dist")
    return (
        per.join(F.broadcast(tot))
        .withColumn("cum_pages", F.sum("n_pages").over(w).cast("long"))
        .selectExpr(
            "dist", "n_pages", "mean_q_ppm",
            "CAST(cum_pages * 1000000 div _tot AS BIGINT) AS cum_share_ppm",
        )
    )


SQL_DEPTH_YIELD = f"""
WITH RECURSIVE {_SQL_HUBGRAPH},
seeds AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
          WHERE node % 13 = 0),
dd(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT e.dst, dd.dist + 1 FROM dd JOIN e ON e.src = dd.node
  WHERE dd.dist < {{hops}}),
dist AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
         FROM dd GROUP BY node),
q AS (SELECT doc_id AS node, {{q40}} AS q40 FROM documents),
per AS (
  SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(q40) AS BIGINT) AS sq
  FROM dist JOIN q USING (node) GROUP BY dist),
tot AS (SELECT CAST(SUM(n_pages) AS BIGINT) AS t FROM per)
SELECT dist, n_pages,
       CAST(sq * 1000000 // (n_pages * 40) AS BIGINT) AS mean_q_ppm,
       CAST(CAST(SUM(n_pages) OVER (ORDER BY dist) AS BIGINT)
            * 1000000 // (SELECT t FROM tot) AS BIGINT) AS cum_share_ppm
FROM per
""".format(hops=SEED_HOPS, q40=_SQL_Q40)


def q_rendezvous_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HRW fetcher assignment (operators/politeness.rendezvous_assign)
    at N=8 and N=9 side by side: per host, both owners plus a moved
    flag — the minimal-churn property (≈1/9 of hosts move when a
    worker joins) is the operational point and is pytest-asserted on
    the aggregate.  Oracle replays every md5 weight and both
    argmaxes."""
    from biothings_crawler_spark.operators.politeness import (
        rendezvous_assign,
    )

    d = _t(spark, sf_dir, "documents")
    hosts = d.select(
        F.concat(F.lit("h"), (F.col("doc_id")).cast("string"),
                 F.lit(".example.org")).alias("host")).distinct()
    a = rendezvous_assign(hosts, 8).select(
        "host", F.col("worker").alias("worker_8"))
    b = rendezvous_assign(hosts, 9).select(
        "host", F.col("worker").alias("worker_9"))
    return a.join(b, "host").select(
        "host", "worker_8", "worker_9",
        F.when(F.col("worker_8") != F.col("worker_9"), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("moved"),
    )


SQL_RENDEZVOUS_ASSIGN = """
WITH hosts AS (
  SELECT DISTINCT 'h' || CAST(doc_id AS VARCHAR) || '.example.org' AS host
  FROM documents),
w AS (
  SELECT host, CAST(n.i AS BIGINT) AS worker,
         CAST(('0x' || substr(md5(CAST(n.i AS VARCHAR) || ':' || host),
                              1, 8)) AS BIGINT) AS weight
  FROM hosts, unnest(range(9)) AS n(i)),
a8 AS (
  SELECT host, worker AS worker_8 FROM w WHERE worker < 8
  QUALIFY ROW_NUMBER() OVER (PARTITION BY host
                             ORDER BY weight DESC, worker) = 1),
a9 AS (
  SELECT host, worker AS worker_9 FROM w
  QUALIFY ROW_NUMBER() OVER (PARTITION BY host
                             ORDER BY weight DESC, worker) = 1)
SELECT h.host, a8.worker_8, a9.worker_9,
       CAST(CASE WHEN a8.worker_8 <> a9.worker_9 THEN 1 ELSE 0 END
            AS BIGINT) AS moved
FROM hosts h
JOIN a8 ON a8.host = h.host
JOIN a9 ON a9.host = h.host
"""


def q_meta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Client-side redirect extraction (operators/redirects.
    client_redirects): meta refresh in both attribute orders and both
    quote styles (incl. a double-quoted content carrying a
    single-quoted url), delay-only refresh dropped, JS location
    assignment and location.replace, root-relative resolution onto the
    page origin, sneaky flag on immediate/scripted redirects.  Oracle
    replays the identical RE2 extraction in DuckDB."""
    from biothings_crawler_spark.operators.redirects import client_redirects

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 7
    body = (
        F.when(m == 1, F.concat(
            F.lit('<meta http-equiv="refresh" '
                  'content="0; url=https://other.example.com/p'),
            i, F.lit('">')))
        .when(m == 2, F.concat(
            F.lit('<meta http-equiv=refresh content="5;URL=\'/page'),
            i, F.lit("'\">")))
        .when(m == 3, F.concat(
            F.lit('<meta content="2; url=next'), i,
            F.lit('.html" http-equiv="Refresh">')))
        .when(m == 4, F.lit('<meta http-equiv="refresh" content="30">'))
        .when(m == 5, F.concat(
            F.lit('<script>window.location.href="https://js.example.org/'),
            i, F.lit('";</script>')))
        .when(m == 6, F.concat(
            F.lit("<script>location.replace('/moved/"), i,
            F.lit("')</script>")))
        .otherwise(F.lit(""))
    )
    pages = d.select(
        "doc_id",
        F.concat(F.lit("https://h"), (F.col("doc_id") % 50).cast("string"),
                 F.lit(".example.com/a/page"), i).alias("url"),
        F.concat(F.lit("<html><head>"), body, F.lit("</head><body>"),
                 F.col("text"), F.lit("</body></html>")).alias("html_text"),
    )
    return client_redirects(pages)


SQL_META_REFRESH = r"""
WITH p AS (
  SELECT doc_id,
         'https://h' || CAST(doc_id % 50 AS VARCHAR)
         || '.example.com/a/page' || CAST(doc_id AS VARCHAR) AS url,
         '<html><head>' ||
         CASE doc_id % 7
           WHEN 1 THEN '<meta http-equiv="refresh" '
                       || 'content="0; url=https://other.example.com/p'
                       || CAST(doc_id AS VARCHAR) || '">'
           WHEN 2 THEN '<meta http-equiv=refresh content="5;URL=''/page'
                       || CAST(doc_id AS VARCHAR) || '''">'
           WHEN 3 THEN '<meta content="2; url=next'
                       || CAST(doc_id AS VARCHAR)
                       || '.html" http-equiv="Refresh">'
           WHEN 4 THEN '<meta http-equiv="refresh" content="30">'
           WHEN 5 THEN '<script>window.location.href="https://js.example.org/'
                       || CAST(doc_id AS VARCHAR) || '";</script>'
           WHEN 6 THEN '<script>location.replace(''/moved/'
                       || CAST(doc_id AS VARCHAR) || ''')</script>'
           ELSE '' END
         || '</head><body>' || text || '</body></html>' AS html
  FROM documents),
el AS (
  SELECT doc_id, url, html,
         regexp_extract(html,
           '(?i)<meta\b[^>]*http-equiv\s*=\s*["'']?refresh["'']?[^>]*>',
           0) AS el,
         regexp_extract(url, '^(https?://[^/]+)', 1) AS root
  FROM p),
c AS (
  SELECT *, COALESCE(
           NULLIF(regexp_extract(el, '(?i)content\s*=\s*"([^">]*)"', 1), ''),
           NULLIF(regexp_extract(el, '(?i)content\s*=\s*''([^''>]*)''', 1),
                  ''),
           '') AS content
  FROM el),
sig AS (
  SELECT doc_id, url, root, 'meta' AS kind,
         COALESCE(TRY_CAST(NULLIF(regexp_extract(content,
           '^\s*([0-9]+)', 1), '') AS BIGINT), 0) AS delay,
         NULLIF(regexp_extract(content,
           '(?i)url\s*=\s*["'']?\s*([^"'' >;]+)', 1), '') AS target
  FROM c
  UNION ALL
  SELECT doc_id, url, root, 'js' AS kind, CAST(0 AS BIGINT) AS delay,
         COALESCE(
           NULLIF(regexp_extract(html,
             '(?i)\b(?:window\.|document\.|top\.)?location(?:\.href)?\s*=\s*["'']([^"'']+)["'']',
             1), ''),
           NULLIF(regexp_extract(html,
             '(?i)\blocation\.replace\(\s*["'']([^"'']+)["'']\s*\)', 1),
             '')) AS target
  FROM c)
SELECT doc_id AS id, url, kind, delay, target,
       CASE WHEN regexp_matches(target, '^https?://') THEN target
            WHEN target LIKE '/%' THEN root || target
            ELSE NULL END AS target_abs,
       CAST(CASE WHEN kind = 'js' OR delay <= 1 THEN 1 ELSE 0 END
            AS BIGINT) AS sneaky
FROM sig WHERE target IS NOT NULL
"""


def q_cloaking_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-UA cloaking verdicts (operators/cloaking.cloaking_verdicts):
    long-format fetch table pivoted by ONE hash agg, then row-local
    integer word-set Jaccard + length-ratio ladder. Lanes: identical,
    whitespace/case-only dynamic, keyword-stuffed cloak, tripled-text
    stuffing cloak (ratio trigger), one-word drift, missing bot fetch.
    Oracle replays the ladder on the pivoted shape."""
    from biothings_crawler_spark.operators.cloaking import cloaking_verdicts

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 6
    bot = (
        F.when(m == 1, F.upper(F.regexp_replace(F.col("text"), " ", "  ")))
        .when(m == 2, F.concat(F.repeat(F.lit("buy cheap pills now "), 8), i))
        .when(m == 3, F.concat(F.col("text"), F.lit(" "), F.col("text"),
                               F.lit(" "), F.col("text")))
        .when(m == 4, F.concat(F.col("text"), F.lit(" zzzunique"), i))
        .when(m == 5, F.lit(None).cast("string"))
        .otherwise(F.col("text"))
    )
    base = d.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 40).cast("string"),
                 F.lit(".example.com/p"), i).alias("url"),
        F.concat(F.lit("h"), (F.col("doc_id") % 40).cast("string")).alias("host"),
        bot.alias("bot"), F.col("text").alias("browser"),
    )
    fetches = base.select(
        "url", "host",
        F.explode(F.array(
            F.struct(F.lit("bot").alias("ua"), F.col("bot").alias("text")),
            F.struct(F.lit("browser").alias("ua"),
                     F.col("browser").alias("text")),
        )).alias("f"),
    ).select("url", "host", "f.ua", "f.text").filter(F.col("text").isNotNull())
    return cloaking_verdicts(fetches)


SQL_CLOAKING_HOSTS = r"""
WITH base AS (
  SELECT 'https://h' || CAST(doc_id % 40 AS VARCHAR) || '.example.com/p'
         || CAST(doc_id AS VARCHAR) AS url,
         'h' || CAST(doc_id % 40 AS VARCHAR) AS host,
         CASE doc_id % 6
           WHEN 1 THEN upper(replace(text, ' ', '  '))
           WHEN 2 THEN repeat('buy cheap pills now ', 8)
                       || CAST(doc_id AS VARCHAR)
           WHEN 3 THEN text || ' ' || text || ' ' || text
           WHEN 4 THEN text || ' zzzunique' || CAST(doc_id AS VARCHAR)
           WHEN 5 THEN NULL
           ELSE text END AS bot,
         text AS browser
  FROM documents),
w AS (
  SELECT url, host, bot, browser,
         list_filter(string_split_regex(lower(bot), '\s+'),
                     x -> len(x) > 0) AS wb,
         list_filter(string_split_regex(lower(browser), '\s+'),
                     x -> len(x) > 0) AS ww
  FROM base),
s AS (
  SELECT url, host, bot, browser,
         CAST(len(wb) AS BIGINT) AS n_bot,
         CAST(len(ww) AS BIGINT) AS n_browser,
         array_to_string(wb, ' ') AS norm_b,
         array_to_string(ww, ' ') AS norm_w,
         CAST(len(list_intersect(list_distinct(wb), list_distinct(ww)))
              AS BIGINT) AS inter,
         CAST(len(list_distinct(wb)) + len(list_distinct(ww))
              AS BIGINT) AS sizes
  FROM w),
v AS (
  SELECT *,
         CASE WHEN sizes - inter > 0
              THEN inter * 1000000 // (sizes - inter)
              ELSE 1000000 END AS jac,
         greatest(n_bot, n_browser) * 1000000
           // greatest(least(n_bot, n_browser), 1) AS ratio,
         (bot IS NULL OR browser IS NULL) AS part
  FROM s)
SELECT url, host,
       CASE WHEN part THEN 'partial'
            WHEN bot = browser THEN 'same'
            WHEN norm_b = norm_w THEN 'dynamic'
            WHEN jac < 500000 OR ratio > 1500000 THEN 'cloaked'
            ELSE 'differs' END AS verdict,
       CASE WHEN NOT part THEN n_bot END AS n_bot,
       CASE WHEN NOT part THEN n_browser END AS n_browser,
       CAST(CASE WHEN NOT part THEN jac END AS BIGINT) AS jaccard_ppm,
       CAST(CASE WHEN NOT part THEN ratio END AS BIGINT) AS ratio_ppm
FROM v
"""


def q_idn_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3492 Punycode host decoding (operators/idn.idn_decode):
    Latin/Cyrillic/Greek/CJK labels, a mixed-script homograph label,
    case-folded ACE prefix, plain-ASCII passthrough, and two malformed
    lanes (bad digit, codepoint overflow) landing in decode_err — the
    media plane's policy. Oracle pins stdlib-verified ground-truth
    pairs (pytest fuzz-checks the decoder against the stdlib codec on
    5000 random labels)."""
    from biothings_crawler_spark.operators.idn import idn_decode

    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 9
    lab = (
        F.when(m == 0, F.lit("XN--MNCHEN-3YA"))
        .when(m == 1, F.lit("xn--bcher-kva"))
        .when(m == 2, F.lit("xn--h1alffa9f"))
        .when(m == 3, F.lit("xn--hxakic4aa"))
        .when(m == 4, F.lit("xn--r8jz45g"))
        .when(m == 5, F.lit("xn--paypal-ccount-21k"))
        .when(m == 6, F.lit("WWW"))
        .when(m == 7, F.lit("xn--a-ecp!"))
        .otherwise(F.lit("xn--9999999999h"))
    )
    hosts = d.select(
        "doc_id",
        F.concat(lab, F.lit(".site"), (F.col("doc_id") % 30).cast("string"),
                 F.lit(".example")).alias("host"),
    )
    return idn_decode(hosts).select(
        "doc_id", "host", "unicode_host", "decode_err", "ace")


SQL_IDN_DECODE = """
WITH h AS (
  SELECT doc_id,
         CASE doc_id % 9
           WHEN 0 THEN 'XN--MNCHEN-3YA'
           WHEN 1 THEN 'xn--bcher-kva'
           WHEN 2 THEN 'xn--h1alffa9f'
           WHEN 3 THEN 'xn--hxakic4aa'
           WHEN 4 THEN 'xn--r8jz45g'
           WHEN 5 THEN 'xn--paypal-ccount-21k'
           WHEN 6 THEN 'WWW'
           WHEN 7 THEN 'xn--a-ecp!'
           ELSE 'xn--9999999999h' END AS lab,
         '.site' || CAST(doc_id % 30 AS VARCHAR) || '.example' AS tail
  FROM documents)
SELECT doc_id, lab || tail AS host,
       CASE doc_id % 9
         WHEN 0 THEN 'münchen' || tail
         WHEN 1 THEN 'bücher' || tail
         WHEN 2 THEN 'россия' || tail
         WHEN 3 THEN 'ελλάδα' || tail
         WHEN 4 THEN '例え' || tail
         WHEN 5 THEN 'paypal-аccount' || tail
         WHEN 6 THEN 'www' || tail
         ELSE lab || tail END AS unicode_host,
       CASE doc_id % 9
         WHEN 7 THEN 'xn--a-ecp!: invalid punycode digit ''!'''
         WHEN 8 THEN 'xn--9999999999h: codepoint overflow'
         END AS decode_err,
       CAST(CASE WHEN doc_id % 9 = 6 THEN 0 ELSE 1 END AS BIGINT) AS ace
FROM h
"""


def q_pairwise_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group ROC-AUC (operators/serving.pairwise_auc,
    Mann-Whitney rank-sum with midrank ties): the fixture plants a
    hash-derived score whose label coin is biased by the score, so
    AUC is provably above 500000 ppm, with heavy score ties exercising
    the midrank path; one group is all-negative -> NULL auc_ppm.
    Oracle replays the rank-sum identity with SQL window functions."""
    from biothings_crawler_spark.operators.serving import pairwise_auc

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        (F.col("doc_id") % 5).alias("grp"),
        ((F.col("doc_id") * 37) % 101).cast("long").alias("score_ppm"),
        F.when(
            (F.col("doc_id") % 5) == 4, F.lit(0)
        ).otherwise(
            (((F.col("doc_id") * 13 + 5) % 100)
             < ((F.col("doc_id") * 37) % 101)).cast("int")
        ).alias("label"),
    )
    return pairwise_auc(scored)


SQL_PAIRWISE_AUC = """
WITH scored AS (
  SELECT doc_id % 5 AS grp,
         CAST((doc_id * 37) % 101 AS BIGINT) AS s,
         CASE WHEN doc_id % 5 = 4 THEN 0
              WHEN ((doc_id * 13 + 5) % 100) < ((doc_id * 37) % 101)
              THEN 1 ELSE 0 END AS label
  FROM documents),
cells AS (
  SELECT grp, s, CAST(COUNT(*) AS BIGINT) AS n_at,
         CAST(SUM(label) AS BIGINT) AS pos_at
  FROM scored GROUP BY grp, s),
ranked AS (
  SELECT grp, n_at, pos_at,
         SUM(n_at) OVER (PARTITION BY grp ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_at AS cum_below
  FROM cells),
agg AS (
  SELECT grp AS "group",
         CAST(SUM(pos_at) AS BIGINT) AS n_pos,
         CAST(SUM(n_at) - SUM(pos_at) AS BIGINT) AS n_neg,
         CAST(SUM(pos_at * (2 * cum_below + n_at + 1)) AS BIGINT)
           AS rank2_pos
  FROM ranked GROUP BY grp)
SELECT "group", n_pos, n_neg,
       CAST(CASE WHEN n_pos > 0 AND n_neg > 0
                 THEN (rank2_pos - n_pos * (n_pos + 1)) * 1000000
                      // (2 * n_pos * n_neg)
            END AS BIGINT) AS auc_ppm
FROM agg
"""


def q_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per language stratum (operators/confidence.
    cohen_kappa): annotator B copies A on a 70% hash coin and drifts
    one of two ways otherwise, so kappa is provably positive but well
    under raw agreement; one stratum makes both annotators constant
    (chance agreement total) -> NULL kappa. Oracle replays the
    marginal-product identity."""
    from biothings_crawler_spark.operators.confidence import cohen_kappa

    d = _t(spark, sf_dir, "documents")
    a = (F.col("doc_id") * 7) % 3
    agree_coin = (F.col("doc_id") % 10) < 7
    b = F.when(agree_coin, a).otherwise(
        (a + 1 + (F.col("doc_id") % 2)) % 3)
    labels = d.select(
        F.when(F.col("doc_id") % 11 == 0, F.lit("zz"))
        .otherwise(F.col("lang")).alias("grp"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(9)).otherwise(a)
        .cast("long").alias("label_a"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(9)).otherwise(b)
        .cast("long").alias("label_b"),
    )
    return cohen_kappa(labels)


SQL_LABEL_AGREEMENT = """
WITH labels AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN 'zz' ELSE lang END AS grp,
         CAST(CASE WHEN doc_id % 11 = 0 THEN 9
                   ELSE (doc_id * 7) % 3 END AS BIGINT) AS a,
         CAST(CASE WHEN doc_id % 11 = 0 THEN 9
                   WHEN doc_id % 10 < 7 THEN (doc_id * 7) % 3
                   ELSE ((doc_id * 7) % 3 + 1 + doc_id % 2) % 3
              END AS BIGINT) AS b
  FROM documents),
cells AS (
  SELECT grp, a, b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM labels GROUP BY grp, a, b),
totals AS (
  SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = b THEN cnt ELSE 0 END) AS BIGINT) AS agree
  FROM cells GROUP BY grp),
r AS (SELECT grp, a AS k, CAST(SUM(cnt) AS BIGINT) AS row_k
      FROM cells GROUP BY grp, a),
c AS (SELECT grp, b AS k, CAST(SUM(cnt) AS BIGINT) AS col_k
      FROM cells GROUP BY grp, b),
pe AS (
  SELECT r.grp, CAST(SUM(row_k * col_k) AS BIGINT) AS pe_num
  FROM r JOIN c ON r.grp = c.grp AND r.k = c.k GROUP BY r.grp)
SELECT t.grp AS "group", t.n, t.agree, pe.pe_num,
       CAST(CASE WHEN t.n * t.n <> pe.pe_num
                 THEN (t.agree * t.n - pe.pe_num) * 1000000
                      // (t.n * t.n - pe.pe_num)
            END AS BIGINT) AS kappa_ppm
FROM totals t JOIN pe ON pe.grp = t.grp
"""


N_MINE_SRC = 500


def q_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/bitext.margin_mining,
    Artetxe & Schwenk ratio margin, mutual-best): the 'de' side is the
    'en' vector under a tiny deterministic perturbation (true pairs,
    cos ~ 0.999) except every vec_id%10==2, whose pair is sign-flipped
    (hubness decoy — its best match is an unrelated vector with margin
    ~ 1.1, which the 1.3 threshold rejects while true pairs score ~2).
    Candidates here are the bounded brute set (the production path
    plugs the IVF probe in); oracle replays windows, sums and the
    integer margin."""
    from biothings_crawler_spark.operators.bitext import margin_mining

    e = _t(spark, sf_dir, "embeddings")
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x + (((F.col("vec_id") * (i + F.lit(1))) % 7) - 3)
            .cast("double") * F.lit(0.01)
        ).cast("float"),
    )
    alt = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x * F.when((i + 1) % 2 == 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        ).cast("float"),
    )
    def norm(v) -> F.Column:
        return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                                  F.lit(0.0), lambda acc, x: acc + x))

    # norms are per-SIDE quantities: computing them once per row here
    # (instead of per pair inside a cosine call) cuts the pair work to
    # a single dot fold — same expression tree per value, so the
    # doubles are bit-identical to the per-pair formulation.
    tgt = e.select(
        F.col("vec_id").alias("tgt_id"),
        F.when(F.col("vec_id") % 10 == 2, alt).otherwise(pert).alias("tv"),
    ).withColumn("tn", norm(F.col("tv")))
    src = e.filter(F.col("vec_id") < N_MINE_SRC).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("sv"),
    ).withColumn("sn", norm(F.col("sv"))).repartition(32)
    dot = F.aggregate(F.zip_with(F.col("sv"), F.col("tv"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cand = src.crossJoin(tgt).select(
        "src_id", "tgt_id",
        F.floor(dot / (F.col("sn") * F.col("tn")) * 1_000_000)
        .cast("long").alias("cos_ppm"),
    )
    return margin_mining(cand)


SQL_MARGIN_MINING = f"""
WITH tgt AS (
  SELECT vec_id AS tgt_id,
         CASE WHEN vec_id % 10 = 2
              THEN list_transform(embedding, (x, i) ->
                     CAST(x * (CASE WHEN i % 2 = 0 THEN -1.0 ELSE 1.0 END)
                          AS FLOAT))
              ELSE list_transform(embedding, (x, i) ->
                     CAST(x + CAST((vec_id * i) % 7 - 3 AS DOUBLE)
                              * CAST(0.01 AS DOUBLE) AS FLOAT))
         END AS tv
  FROM embeddings),
src AS (SELECT vec_id AS src_id, embedding AS sv FROM embeddings
        WHERE vec_id < {{n_src}}),
cand0 AS (
  SELECT src_id, tgt_id,
         CAST(floor({_sql_cosine('sv', 'tv')} * 1000000) AS BIGINT)
           AS cos_ppm
  FROM src, tgt),
cand AS (SELECT * FROM cand0 WHERE cos_ppm > 0),
rs AS (SELECT *, row_number() OVER (PARTITION BY src_id
         ORDER BY cos_ppm DESC, src_id, tgt_id) AS rn FROM cand),
rt AS (SELECT *, row_number() OVER (PARTITION BY tgt_id
         ORDER BY cos_ppm DESC, src_id, tgt_id) AS rn FROM cand),
ss AS (SELECT src_id, CAST(SUM(cos_ppm) AS BIGINT) AS sum_s,
              CAST(COUNT(*) AS BIGINT) AS m_s
       FROM rs WHERE rn <= 4 GROUP BY src_id),
st AS (SELECT tgt_id, CAST(SUM(cos_ppm) AS BIGINT) AS sum_t,
              CAST(COUNT(*) AS BIGINT) AS m_t
       FROM rt WHERE rn <= 4 GROUP BY tgt_id),
fwd AS (SELECT src_id, tgt_id FROM rs WHERE rn = 1),
bwd AS (SELECT src_id, tgt_id FROM rt WHERE rn = 1),
mutual AS (SELECT f.src_id, f.tgt_id FROM fwd f
           JOIN bwd b ON b.src_id = f.src_id AND b.tgt_id = f.tgt_id),
o AS (
  SELECT c.src_id, c.tgt_id, c.cos_ppm,
         c.cos_ppm * 2 * ss.m_s * st.m_t * 1000000
           // (ss.sum_s * st.m_t + st.sum_t * ss.m_s) AS margin
  FROM cand c
  JOIN mutual m ON m.src_id = c.src_id AND m.tgt_id = c.tgt_id
  JOIN ss ON ss.src_id = c.src_id
  JOIN st ON st.tgt_id = c.tgt_id)
SELECT src_id, tgt_id, cos_ppm,
       CAST(margin AS BIGINT) AS margin_ppm,
       CAST(CASE WHEN margin >= 1300000 THEN 1 ELSE 0 END AS BIGINT)
         AS mined
FROM o
""".format(n_src=N_MINE_SRC)


def q_rdfa_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFa Lite extraction (operators/rdfa.rdfa_extract — REAL stdlib
    HTMLParser, like the microdata sibling): body-level vocab
    inheritance, text/@content/@href/@src/@resource value sources,
    charref decoding, subject-as-value nesting (creator -> Person),
    a document-level triple with no open subject, and an absolute
    CURIE typeof that must NOT get the vocab prefix. The oracle
    CONSTRUCTS the expected rows from the fixture's closed form —
    Spark must parse actual HTML to match."""
    from biothings_crawler_spark.operators.rdfa import rdfa_extract

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    gap = F.when(F.col("doc_id") % 5 == 0, F.lit("\n  ")).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><body vocab="https://schema.org/">'), gap,
        F.lit('<div typeof="Dataset">'), gap,
        F.lit('<h1 property="name">DS '), i, F.lit(" &amp; co</h1>"), gap,
        F.lit('<meta property="identifier" content="id-'), i, F.lit('">'),
        gap,
        F.lit('<a property="url" href="https://ex.org/d/'), i,
        F.lit('">link '), i, F.lit("</a>"), gap,
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit('<span property="keywords">k'),
                        (F.col("doc_id") % 7).cast("string"),
                        F.lit("</span>"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit('<img property="image" src="/i/'), i,
                        F.lit('.png">'))).otherwise(F.lit("")),
        gap,
        F.lit('<div property="creator" typeof="Person">'
              '<span property="name">Person '),
        (F.col("doc_id") % 11).cast("string"),
        F.lit("</span></div>"), gap,
        F.lit('</div><p property="note">N'),
        (F.col("doc_id") % 13).cast("string"), F.lit("</p>"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit('<div typeof="dc:Text">'
                              '<span property="title">T'), i,
                        F.lit("</span></div>"))).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.repartition(32, "doc_id").select(
        F.col("doc_id").alias("id"), html.alias("html"))
    return rdfa_extract(pages)


SQL_RDFA_EXTRACT = """
WITH d AS (SELECT doc_id AS id FROM documents),
ds AS (SELECT id, CAST(0 AS BIGINT) AS subj_no,
              'https://schema.org/Dataset' AS type_iri,
              CAST(NULL AS BIGINT) AS parent_subj,
              CAST(NULL AS VARCHAR) AS parent_prop
       FROM d)
SELECT id, subj_no, type_iri, parent_subj, parent_prop,
       'name' AS prop, 'DS ' || id || ' & co' AS value FROM ds
UNION ALL
SELECT id, subj_no, type_iri, parent_subj, parent_prop,
       'identifier', 'id-' || id FROM ds
UNION ALL
SELECT id, subj_no, type_iri, parent_subj, parent_prop,
       'url', 'https://ex.org/d/' || id FROM ds
UNION ALL
SELECT id, subj_no, type_iri, parent_subj, parent_prop,
       'keywords', 'k' || (id % 7) FROM ds WHERE id % 3 = 0
UNION ALL
SELECT id, subj_no, type_iri, parent_subj, parent_prop,
       'image', '/i/' || id || '.png' FROM ds WHERE id % 4 = 1
UNION ALL
SELECT id, CAST(1 AS BIGINT), 'https://schema.org/Person',
       CAST(0 AS BIGINT), 'creator', 'name', 'Person ' || (id % 11)
FROM d
UNION ALL
SELECT id, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
       'note', 'N' || (id % 13)
FROM d
UNION ALL
SELECT id, CAST(2 AS BIGINT), 'dc:Text', CAST(NULL AS BIGINT),
       CAST(NULL AS VARCHAR), 'title', 'T' || id
FROM d WHERE id % 2 = 0
"""


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption accounting (operators/packing.
    span_corruption_stats): hash-coin span starts with sequential
    exclusion folded row-local over each document's token indices;
    enc/dec lengths after sentinel substitution. Oracle replays the
    identical struct fold via list_reduce."""
    from biothings_crawler_spark.operators.packing import (
        span_corruption_stats,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text")
    return span_corruption_stats(d)


# Oracle note: the first formulation used list_reduce struct folds;
# DuckDB 1.0.0 computes those INCORRECTLY in full-table vectorized
# runs while giving the right answer under a pushed id filter (9 of
# 500 docs drifted, deterministic across reruns/threads=1; a minimal
# fold reproduces fine, so the trigger is the md5-bearing CASE body).
# The twin below avoids lambdas entirely: per-(id, i) coins in a flat
# UNNEST projection, then the sequential-exclusion walk as a
# one-token-per-iteration RECURSIVE CTE -- plain scalar SQL per step.
SQL_SPAN_CORRUPTION = """
WITH RECURSIVE w AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> len(x) > 0) AS ws
  FROM documents),
base AS (
  SELECT id, CAST(coalesce(len(ws), 0) AS BIGINT) AS n FROM w),
tok AS (
  SELECT id, n, CAST(r.i AS BIGINT) AS i,
         CAST(('0x' || substr(md5('7:' || id || ':' || r.i), 1, 8))
              AS BIGINT) % 100 AS coin,
         2 + CAST(('0x' || substr(md5('7:' || id || ':' || r.i
                                      || ':L'), 1, 8))
                  AS BIGINT) % 3 AS ln
  FROM base, unnest(range(1, n + 1)) AS r(i)),
walk AS (
  SELECT id, n, CAST(1 AS BIGINT) AS i, CAST(0 AS BIGINT) AS nf,
         CAST(0 AS BIGINT) AS ns, CAST(0 AS BIGINT) AS nn
  FROM base WHERE n >= 1
  UNION ALL
  SELECT wk.id, wk.n, wk.i + 1,
         CASE WHEN t.i >= wk.nf AND t.coin < 15
              THEN t.i + t.ln ELSE wk.nf END,
         CASE WHEN t.i >= wk.nf AND t.coin < 15
              THEN wk.ns + 1 ELSE wk.ns END,
         CASE WHEN t.i >= wk.nf AND t.coin < 15
              THEN wk.nn + least(t.ln, wk.n - t.i + 1) ELSE wk.nn END
  FROM walk wk JOIN tok t ON t.id = wk.id AND t.i = wk.i
  WHERE wk.i <= wk.n),
fin AS (
  SELECT id, n, ns, nn FROM walk WHERE i = n + 1
  UNION ALL
  SELECT id, n, 0, 0 FROM base WHERE n = 0)
SELECT id, n AS n_tokens, ns AS n_spans, nn AS n_noise,
       CAST(CASE WHEN n > 0 THEN nn * 1000000 // n END AS BIGINT)
         AS corrupted_ppm,
       n - nn + ns AS enc_len,
       nn + ns + 1 AS dec_len
FROM fin
"""


def q_sitemap_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sitemaps.org cross-scope audit (sources/sitemap.
    sitemap_scope_audit + census): /sub/ sitemaps vs root sitemaps,
    lanes for wrong host, http-vs-https origin mismatch, sibling-path
    escape (ignored for /sub/ sitemaps but IN scope for root ones),
    and deeper-subtree URLs. Returns the per-sitemap census join of
    both outputs; oracle replays verdicts and the rollup."""
    from biothings_crawler_spark.sources.sitemap import (
        sitemap_scope_audit,
        sitemap_scope_census,
    )

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    # 7 is coprime to the parity and lane moduli, so every sitemap
    # sees every lane (a %20 host key would alias doc_id%5 and give
    # each sitemap a single degenerate verdict mix)
    k = (F.col("doc_id") % 7).cast("string")
    k2 = ((F.col("doc_id") + 1) % 7).cast("string")
    host = F.concat(F.lit("https://h"), k, F.lit(".example.com"))
    sm = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(host, F.lit("/sub/sitemap.xml")),
    ).otherwise(F.concat(host, F.lit("/sitemap.xml")))
    m = F.col("doc_id") % 5
    url = (
        F.when(m == 0, F.concat(host, F.lit("/sub/page"), i))
        .when(m == 1, F.concat(host, F.lit("/other/page"), i))
        .when(m == 2, F.concat(F.lit("https://h"), k2,
                               F.lit(".example.com/sub/p"), i))
        .when(m == 3, F.concat(F.lit("http://h"), k,
                               F.lit(".example.com/sub/p"), i))
        .otherwise(F.concat(host, F.lit("/sub/a/b/p"), i))
    )
    entries = d.select(sm.alias("sitemap_url"), url.alias("url"))
    audited = sitemap_scope_audit(entries)
    return sitemap_scope_census(audited)


SQL_SITEMAP_SCOPE = """
WITH e AS (
  SELECT CASE WHEN doc_id % 2 = 0
              THEN 'https://h' || (doc_id % 7) || '.example.com/sub/sitemap.xml'
              ELSE 'https://h' || (doc_id % 7) || '.example.com/sitemap.xml'
         END AS sitemap_url,
         CASE doc_id % 5
           WHEN 0 THEN 'https://h' || (doc_id % 7)
                       || '.example.com/sub/page' || doc_id
           WHEN 1 THEN 'https://h' || (doc_id % 7)
                       || '.example.com/other/page' || doc_id
           WHEN 2 THEN 'https://h' || ((doc_id + 1) % 7)
                       || '.example.com/sub/p' || doc_id
           WHEN 3 THEN 'http://h' || (doc_id % 7)
                       || '.example.com/sub/p' || doc_id
           ELSE 'https://h' || (doc_id % 7)
                || '.example.com/sub/a/b/p' || doc_id
         END AS url
  FROM documents),
v AS (
  SELECT sitemap_url, url,
         CASE WHEN regexp_extract(url, '^(https?://[^/]+)', 1)
                   <> regexp_extract(sitemap_url, '^(https?://[^/]+)', 1)
              THEN 'wrong_origin'
              WHEN NOT starts_with(
                     CASE WHEN url = regexp_extract(url,
                                       '^(https?://[^/]+)', 1)
                          THEN url || '/' ELSE url END,
                     regexp_replace(sitemap_url, '[^/]*$', ''))
              THEN 'above_path'
              ELSE 'in_scope' END AS verdict
  FROM e)
SELECT sitemap_url,
       CAST(COUNT(*) AS BIGINT) AS n_declared,
       CAST(SUM(CASE WHEN verdict <> 'in_scope' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ignored,
       CAST(SUM(CASE WHEN verdict <> 'in_scope' THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS ignored_ppm
FROM v GROUP BY sitemap_url
"""


SA_DOCS = 200
SA_TRUNC = 64


def q_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed suffix array by prefix doubling (operators/substr.
    suffix_array — Manber-Myers rounds, distinct-pair dense re-ranking
    through the distributed two-pass prefix scan, no global window).
    The oracle sorts the ACTUAL suffix strings of the identical
    corpus string — two unrelated algorithms, one answer; bounded
    fixture (200 docs x 64 chars) because the oracle's comparison
    sort is quadratic in character work."""
    from biothings_crawler_spark.operators.substr import suffix_array

    d = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < SA_DOCS
    ).select(
        F.col("doc_id").alias("id"),
        F.substring("text", 1, SA_TRUNC).alias("text"),
    )
    return suffix_array(d, n_partitions=8)


SQL_SUFFIX_ARRAY = f"""
WITH d AS (
  SELECT doc_id AS id, left(text, {SA_TRUNC}) AS t
  FROM documents WHERE doc_id < {SA_DOCS}),
s AS (SELECT string_agg(t || chr(1), '' ORDER BY id) AS S FROM d),
p AS (SELECT CAST(r.i AS BIGINT) AS pos
      FROM s, unnest(range(1, len(S) + 1)) AS r(i))
SELECT pos,
       CAST(row_number() OVER (
              ORDER BY substr((SELECT S FROM s), CAST(pos AS INTEGER)))
            AS BIGINT) AS rank
FROM p
"""


def q_survival_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source first-kill survival ledger (operators/datasheet.
    survival_attribution): language gate -> quality gate (25 words; corpus spans 10-99) -> exact
    dedup with winners elected only among earlier-stage survivors.
    The fixture plants extra duplicates by mapping every doc_id%9==4
    text onto its neighbor's text, so dedup kills are guaranteed in
    every source. Oracle replays the election and ledger."""
    from biothings_crawler_spark.operators.datasheet import (
        survival_attribution,
    )

    d = _t(spark, sf_dir, "documents")
    planted = d.alias("a").join(
        d.select(F.col("doc_id").alias("nid"),
                 F.col("text").alias("ntext")).alias("b"),
        F.col("a.doc_id") - (F.col("a.doc_id") % 9 == 4).cast("long")
        == F.col("nid"),
    ).select(
        "a.doc_id", "a.lang", "a.source",
        F.when(F.col("a.doc_id") % 9 == 4, F.col("ntext"))
        .otherwise(F.col("a.text")).alias("text"),
    )
    return survival_attribution(planted, min_words=25)


SQL_SURVIVAL_LEDGER = f"""
WITH planted AS (
  SELECT a.doc_id, a.lang, a.source,
         CASE WHEN a.doc_id % 9 = 4 THEN b.text ELSE a.text END AS text
  FROM documents a
  JOIN documents b
    ON b.doc_id = a.doc_id - CASE WHEN a.doc_id % 9 = 4
                                  THEN 1 ELSE 0 END),
flags AS (
  SELECT source, doc_id AS id, text,
         CAST(coalesce(len({_SQL_WORDS}), 0) AS BIGINT) AS tok,
         coalesce(lang IN ('en', 'de', 'es', 'fr'), false) AS ok_lang,
         CAST(len({_SQL_WORDS}) AS BIGINT) >= 25 AS ok_quality
  FROM planted),
winners AS (
  SELECT text, MIN(id) AS w FROM flags
  WHERE ok_lang AND ok_quality GROUP BY text),
v AS (
  SELECT f.source, f.tok,
         CASE WHEN NOT f.ok_lang THEN 'lang'
              WHEN NOT f.ok_quality THEN 'quality'
              WHEN f.id <> w.w THEN 'dup'
              ELSE 'ok' END AS v
  FROM flags f LEFT JOIN winners w ON w.text = f.text)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS tokens_in,
       CAST(SUM(CASE WHEN v = 'lang' THEN 1 ELSE 0 END) AS BIGINT)
         AS killed_lang,
       CAST(SUM(CASE WHEN v = 'quality' THEN 1 ELSE 0 END) AS BIGINT)
         AS killed_quality,
       CAST(SUM(CASE WHEN v = 'dup' THEN 1 ELSE 0 END) AS BIGINT)
         AS killed_dup,
       CAST(SUM(CASE WHEN v = 'ok' THEN 1 ELSE 0 END) AS BIGINT)
         AS survived,
       CAST(SUM(CASE WHEN v = 'ok' THEN tok ELSE 0 END) AS BIGINT)
         AS tokens_out,
       CAST(SUM(CASE WHEN v = 'ok' THEN tok ELSE 0 END) * 1000000
            // greatest(SUM(tok), 1) AS BIGINT) AS survival_ppm
FROM v GROUP BY source
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition census over per-user event streams
    (operators/sessionize.event_transitions): LEAD within user
    partitions, session-gap cutoff, exact outgoing-share ppm and
    source-local suggestion rank. Oracle replays lead + census with
    SQL windows."""
    from biothings_crawler_spark.operators.sessionize import (
        event_transitions,
    )

    e = _t(spark, sf_dir, "events")
    return event_transitions(e)


SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT event_type AS src,
         lead(event_type) OVER w AS dst,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
census AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE dst IS NOT NULL AND gap <= 1800000000
  GROUP BY src, dst),
tot AS (SELECT src, SUM(n) AS t FROM census GROUP BY src)
SELECT c.src, c.dst, c.n,
       CAST(c.n * 1000000 // t.t AS BIGINT) AS share_ppm,
       CAST(row_number() OVER (PARTITION BY c.src
                               ORDER BY c.n DESC, c.dst) AS BIGINT)
         AS rank
FROM census c JOIN tot t ON t.src = c.src
"""


def q_heading_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heading-outline structural chunking (operators/chunking.
    heading_chunks): preamble section, h1/h2/h3 breadcrumb paths,
    stack pops on sibling/uplevel headings, tag-stripped bodies.
    Oracle constructs the expected sections in closed form."""
    from biothings_crawler_spark.operators.chunking import heading_chunks

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    html = F.concat(
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("intro "), i)).otherwise(F.lit("")),
        F.lit("<h1>Doc "), i, F.lit("</h1><p>alpha "), i,
        F.lit(" beta</p><h2>Part A</h2><p>gamma gamma</p>"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("<h3>Deep "),
                        (F.col("doc_id") % 5).cast("string"),
                        F.lit("</h3><span>delta</span>")))
        .otherwise(F.lit("")),
        F.lit("<h2>Part B</h2>omega "), i,
    )
    pages = d.repartition(32, "doc_id").select(
        F.col("doc_id").alias("id"), html.alias("html"))
    return heading_chunks(pages)


SQL_HEADING_CHUNKS = """
WITH d AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS pre,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS deep
  FROM documents)
SELECT id, CAST(0 AS BIGINT) AS sec_no, CAST(0 AS BIGINT) AS level,
       '' AS path, '' AS title, CAST(2 AS BIGINT) AS n_words,
       'intro ' || id AS content
FROM d WHERE pre = 1
UNION ALL
SELECT id, CAST(pre AS BIGINT), 1, '', 'Doc ' || id, 3,
       'alpha ' || id || ' beta' FROM d
UNION ALL
SELECT id, CAST(pre + 1 AS BIGINT), 2, 'Doc ' || id, 'Part A', 2,
       'gamma gamma' FROM d
UNION ALL
SELECT id, CAST(pre + 2 AS BIGINT), 3, 'Doc ' || id || ' > Part A',
       'Deep ' || (id % 5), 1, 'delta'
FROM d WHERE deep = 1
UNION ALL
SELECT id, CAST(pre + 2 + deep AS BIGINT), 2, 'Doc ' || id, 'Part B',
       2, 'omega ' || id FROM d
"""


def q_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim re-scoring (operators/similarity.
    maxsim_topk): 3 queries, the full corpus as the bounded candidate
    set, 8x8-dim token slices, floor-ppm cosines. Oracle replays the
    sum-of-max-of-cos with list folds."""
    from biothings_crawler_spark.operators.similarity import maxsim_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    cand = q.select(F.col("vec_id").alias("query_id")).crossJoin(
        e.select(F.col("vec_id").alias("doc_id")))
    return maxsim_topk(cand, q, e)


def _sql_subcos(i: str, j: str) -> str:
    dot = (f"list_reduce(list_transform(range(1, 9), kk -> "
           f"CAST(qv[{i} * 8 + kk] * dv[{j} * 8 + kk] AS DOUBLE)), "
           f"(a, b) -> a + b)")
    qn = (f"sqrt(list_reduce(list_transform(range(1, 9), kk -> "
          f"CAST(qv[{i} * 8 + kk] * qv[{i} * 8 + kk] AS DOUBLE)), "
          f"(a, b) -> a + b))")
    dn = (f"sqrt(list_reduce(list_transform(range(1, 9), kk -> "
          f"CAST(dv[{j} * 8 + kk] * dv[{j} * 8 + kk] AS DOUBLE)), "
          f"(a, b) -> a + b))")
    return f"CAST(floor({dot} / ({qn} * {dn}) * 1000000) AS BIGINT)"


SQL_MAXSIM_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 3),
dd AS (SELECT vec_id AS doc_id, embedding AS dv FROM embeddings),
ij AS (SELECT CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j
       FROM unnest(range(8)) AS a(i), unnest(range(8)) AS b(j)),
pairs AS (
  SELECT query_id, doc_id, ij.i,
         MAX({_sql_subcos('ij.i', 'ij.j')}) AS best
  FROM q, dd, ij
  GROUP BY query_id, doc_id, ij.i),
sc AS (
  SELECT query_id, doc_id, CAST(SUM(best) AS BIGINT) AS score_ppm
  FROM pairs GROUP BY query_id, doc_id)
SELECT query_id, doc_id, score_ppm,
       CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY score_ppm DESC, doc_id) AS rn FROM sc)
WHERE rn <= 10
"""


LEX_TERMS = {"zebra": 1, "quagga": 2, "okapi": 3}


def q_lexicon_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-lexicon safety gate (operators/text.lexicon_hits):
    clean docs, single mild hit, leet-folded hit (z3br@ -> zebra)
    plus a weight-2 term, a severe drop-on-sight term, and a
    high-density repetition lane; word-boundary matching with edge
    punctuation stripped. Oracle replays fold + verdict ladder."""
    from biothings_crawler_spark.operators.text import lexicon_hits

    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    extra = (
        F.when(m == 1, F.lit(" zebra."))
        .when(m == 2, F.lit(" z3br@ quagga"))
        .when(m == 3, F.lit(" okapi"))
        .when(m == 4, F.lit(" zebra" * 12))
        .when(m == 5, F.lit(" zebrafish"))  # substring must NOT hit
        .otherwise(F.lit(""))
    )
    pages = d.select(
        F.col("doc_id").alias("id"),
        F.concat(F.col("text"), extra).alias("text"),
    )
    return lexicon_hits(pages, "id", "text", LEX_TERMS)


SQL_LEXICON_FILTER = """
WITH p AS (
  SELECT doc_id AS id,
         text || CASE doc_id % 6
           WHEN 1 THEN ' zebra.'
           WHEN 2 THEN ' z3br@ quagga'
           WHEN 3 THEN ' okapi'
           WHEN 4 THEN repeat(' zebra', 12)
           WHEN 5 THEN ' zebrafish'
           ELSE '' END AS text
  FROM documents),
w AS (
  SELECT id,
         list_transform(
           list_filter(string_split_regex(
             translate(lower(text), '013@$', 'oieas'), '\\s+'),
             x -> len(x) > 0),
           x -> regexp_replace(regexp_replace(x, '^[^a-z0-9_]+', ''),
                               '[^a-z0-9_]+$', '')) AS ws
  FROM p),
s AS (
  SELECT id,
         CAST(len(ws) AS BIGINT) AS n_words,
         list_transform(ws, x -> CASE x
           WHEN 'zebra' THEN 1
           WHEN 'quagga' THEN 2
           WHEN 'okapi' THEN 3
           ELSE 0 END) AS wt
  FROM w),
agg AS (
  SELECT id, n_words,
         CAST(coalesce(list_sum(wt), 0) AS BIGINT) AS score,
         CAST(len(list_filter(wt, x -> x > 0)) AS BIGINT) AS n_hits,
         CAST(len(list_filter(wt, x -> x >= 3)) AS BIGINT) AS sev
  FROM s)
SELECT id, n_words, n_hits, score,
       CAST(n_hits * 1000000 // greatest(n_words, 1) AS BIGINT)
         AS density_ppm,
       CASE WHEN sev > 0
              OR n_hits * 1000000 // greatest(n_words, 1) > 50000
            THEN 'drop'
            WHEN n_hits > 0 THEN 'flag'
            ELSE 'clean' END AS verdict
FROM agg
"""


def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload schema census (operators/profile.
    schema_signatures): base {"k"} payloads, an added-key variant, a
    nested-object variant (top-level keys only), a REORDERED-key lane
    that must collapse into the added-key signature, and a truncated
    malformed lane landing in '<invalid>'. Oracle replays with
    DuckDB's json_keys guarded by json_valid."""
    from biothings_crawler_spark.operators.profile import (
        schema_signatures,
    )

    e = _t(spark, sf_dir, "events")
    i = (F.col("event_id") % 50).cast("string")
    m = F.col("event_id") % 7
    payload = (
        F.when(m == 2, F.concat(F.lit('[1,'), i, F.lit(']')))
        .when(m == 3, F.concat(F.lit('{"k":'), i, F.lit(',"ts":"t"}')))
        .when(m == 4, F.concat(F.lit('{"k":'), i,
                               F.lit(',"user":{"id":1}}')))
        .when(m == 5, F.concat(F.lit('{"ts":"t","k":'), i, F.lit("}")))
        .when(m == 6, F.concat(F.lit('{"k":'), i))
        .otherwise(F.col("props"))
    )
    ev = e.select(F.col("event_type").alias("grp"),
                  payload.alias("payload"))
    return schema_signatures(ev)


SQL_SCHEMA_DRIFT = """
WITH p AS (
  SELECT event_type AS grp,
         CASE event_id % 7
           WHEN 2 THEN '[1,' || (event_id % 50) || ']'
           WHEN 3 THEN '{"k":' || (event_id % 50) || ',"ts":"t"}'
           WHEN 4 THEN '{"k":' || (event_id % 50) || ',"user":{"id":1}}'
           WHEN 5 THEN '{"ts":"t","k":' || (event_id % 50) || '}'
           WHEN 6 THEN '{"k":' || (event_id % 50)
           ELSE props END AS payload
  FROM events),
sig AS (
  SELECT grp,
         CASE WHEN json_valid(payload) AND json_type(payload) = 'OBJECT'
              THEN array_to_string(list_sort(json_keys(payload)), ',')
              WHEN json_valid(payload) THEN '<non-object>'
              ELSE '<invalid>' END AS signature
  FROM p),
cells AS (
  SELECT grp, signature, CAST(COUNT(*) AS BIGINT) AS n
  FROM sig GROUP BY grp, signature),
tot AS (SELECT grp, SUM(n) AS t FROM cells GROUP BY grp)
SELECT c.grp AS "group", c.signature, c.n,
       CAST(c.n * 1000000 // t.t AS BIGINT) AS share_ppm,
       CAST(row_number() OVER (PARTITION BY c.grp
              ORDER BY c.n DESC, c.signature) AS BIGINT) AS rank
FROM cells c JOIN tot t ON t.grp = c.grp
"""


def q_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-impact census (operators/maintenance.erasure_impact):
    planted duplicate clusters (doc_id%9==4 copies its neighbor's
    text) with an erased set (doc_id%13==6) that hits winners,
    non-winners, and whole clusters; re-election picks the surviving
    min id, NULL when the content genuinely leaves. Oracle replays
    election + bucket math."""
    from biothings_crawler_spark.operators.maintenance import (
        erasure_impact,
    )

    d = _t(spark, sf_dir, "documents")
    planted = d.alias("a").join(
        d.select(F.col("doc_id").alias("nid"),
                 F.col("text").alias("ntext")).alias("b"),
        F.col("a.doc_id") - (F.col("a.doc_id") % 9 == 4).cast("long")
        == F.col("nid"),
    ).select(
        "a.doc_id",
        F.when(F.col("a.doc_id") % 9 == 4, F.col("ntext"))
        .otherwise(F.col("a.text")).alias("text"),
    )
    erased = d.filter(F.col("doc_id") % 13 == 6).select("doc_id")
    return erasure_impact(planted, erased)


SQL_ERASURE_IMPACT = f"""
WITH planted AS (
  SELECT a.doc_id,
         CASE WHEN a.doc_id % 9 = 4 THEN b.text ELSE a.text END AS text
  FROM documents a
  JOIN documents b
    ON b.doc_id = a.doc_id - CASE WHEN a.doc_id % 9 = 4
                                  THEN 1 ELSE 0 END),
base AS (
  SELECT doc_id AS id, text,
         CAST(len(list_distinct({_SQL_WORDS})) AS BIGINT)
           AS n_index_rows,
         CASE WHEN doc_id % 13 = 6 THEN 1 ELSE 0 END AS er
  FROM planted),
groups AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS group_size,
         MIN(id) AS w,
         MIN(CASE WHEN er = 0 THEN id END) AS sw
  FROM base GROUP BY text)
SELECT b.id, b.n_index_rows, g.group_size,
       CAST(CASE WHEN b.id = g.w THEN 1 ELSE 0 END AS BIGINT)
         AS was_winner,
       CASE WHEN b.id = g.w THEN g.sw END AS new_winner,
       CAST(CAST(('0x' || substr(md5(CAST(b.id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 64 AS BIGINT) AS bucket
FROM base b JOIN groups g ON g.text = b.text
WHERE b.er = 1
"""


def q_identifier_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed identifier extraction (operators/extract.
    extract_identifiers): DOI with suffix punctuation, repeated GEO
    series mentions (count = landing-page signal), SRA/PDB/PMID
    lanes, and a near-miss lane (GSE12x) that word boundaries must
    reject. Oracle replays the RE2 chain."""
    from biothings_crawler_spark.operators.extract import (
        extract_identifiers,
    )

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    g = (F.col("doc_id") % 9000 + 100).cast("string")
    m = F.col("doc_id") % 6
    extra = (
        F.when(m == 0, F.concat(
            F.lit(" see doi 10.1093/nar/gkx"), i, F.lit(" for details")))
        .when(m == 1, F.concat(
            F.lit(" GSE"), g, F.lit(" and again GSE"), g,
            F.lit(" plus sample GSM"), g))
        .when(m == 2, F.concat(F.lit(" runs SRR10203"), i.substr(1, 1),
                               F.lit(" and ERR20304"), i.substr(1, 1)))
        .when(m == 3, F.concat(F.lit(" structure PDB 1ab"),
                               (F.col("doc_id") % 10).cast("string"),
                               F.lit(" cited")))
        .when(m == 4, F.concat(F.lit(" PMID: 123"), i))
        .otherwise(F.lit(" almost GSE12x not an accession"))
    )
    pages = d.select(
        "doc_id", F.concat(F.col("text"), extra).alias("text"))
    return extract_identifiers(pages)


SQL_IDENTIFIER_EXTRACT = """
WITH p AS (
  SELECT doc_id AS id,
         text || CASE doc_id % 6
           WHEN 0 THEN ' see doi 10.1093/nar/gkx' || doc_id
                       || ' for details'
           WHEN 1 THEN ' GSE' || (doc_id % 9000 + 100) || ' and again GSE'
                       || (doc_id % 9000 + 100) || ' plus sample GSM'
                       || (doc_id % 9000 + 100)
           WHEN 2 THEN ' runs SRR10203' || substr(CAST(doc_id AS VARCHAR), 1, 1)
                       || ' and ERR20304' || substr(CAST(doc_id AS VARCHAR), 1, 1)
           WHEN 3 THEN ' structure PDB 1ab' || (doc_id % 10) || ' cited'
           WHEN 4 THEN ' PMID: 123' || doc_id
           ELSE ' almost GSE12x not an accession' END AS text
  FROM documents),
pats AS (
  SELECT * FROM (VALUES
    ('doi', '\\b(10\\.[0-9]{4,9}/[-._;()/:A-Za-z0-9]+)'),
    ('geo_series', '\\b(GSE[0-9]{3,8})\\b'),
    ('geo_sample', '\\b(GSM[0-9]{3,8})\\b'),
    ('sra_run', '\\b([SED]RR[0-9]{5,9})\\b'),
    ('pdb', '\\bPDB[ :]([0-9][A-Za-z0-9]{3})\\b'),
    ('pmid', '\\bPMID[: ]{0,2}([0-9]{1,8})\\b')
  ) AS v(kind, rx)),
hits AS (
  SELECT p.id, pats.kind,
         regexp_extract_all(p.text, pats.rx, 1) AS hs
  FROM p, pats)
SELECT id, kind, unnest(hs) AS ident,
       CAST(len(hs) AS BIGINT) AS n_in_doc
FROM hits WHERE len(hs) > 0
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier census (operators/profile.mad_outliers) over
    fixed-point event values with planted contamination: every
    event_id%17==3 value is inflated 20x, which classic mean/sigma
    profiling partially masks but the 3-MAD fence flags. Oracle
    replays lower-median selection and the fence."""
    from biothings_crawler_spark.operators.profile import mad_outliers

    e = _t(spark, sf_dir, "events")
    vals = e.select(
        F.col("event_type").alias("grp"),
        (F.floor(
            F.col("value") * F.when(F.col("event_id") % 17 == 3,
                                    F.lit(20.0)).otherwise(F.lit(1.0))
            * 1000
        )).cast("long").alias("x"),
    )
    return mad_outliers(vals)


SQL_MAD_OUTLIERS = """
WITH v AS (
  SELECT event_type AS grp,
         CAST(floor(value * CASE WHEN event_id % 17 = 3
                                 THEN 20.0 ELSE 1.0 END * 1000)
              AS BIGINT) AS x
  FROM events),
r AS (
  SELECT grp, x,
         row_number() OVER (PARTITION BY grp ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM v),
med AS (
  SELECT grp, x AS med_fx, CAST(n AS BIGINT) AS n
  FROM r WHERE rn = (n + 1) // 2),
dev AS (
  SELECT v.grp, v.x, m.med_fx, m.n, abs(v.x - m.med_fx) AS d
  FROM v JOIN med m ON m.grp = v.grp),
rd AS (
  SELECT grp, d, row_number() OVER (PARTITION BY grp ORDER BY d) AS rn,
         n
  FROM dev),
mad AS (SELECT grp, d AS mad_fx FROM rd WHERE rn = (n + 1) // 2)
SELECT dev.grp AS "group", dev.n, dev.med_fx, mad.mad_fx,
       CAST(SUM(CASE WHEN dev.d > 3 * mad.mad_fx THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN dev.d > 3 * mad.mad_fx THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS outlier_ppm
FROM dev JOIN mad ON mad.grp = dev.grp
GROUP BY dev.grp, dev.n, dev.med_fx, mad.mad_fx
"""


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL path-template census (operators/dust.url_path_templates):
    two id-bearing lanes that must COLLAPSE to one template, a static
    asset, a hex session token, and a UUID lane built from md5 (both
    engines derive the identical uuid text). Oracle replays the
    ordered generalization chain."""
    from biothings_crawler_spark.operators.dust import url_path_templates

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    h = F.md5(i)
    uuid = F.concat_ws(
        "-", F.substring(h, 1, 8), F.substring(h, 9, 4),
        F.substring(h, 13, 4), F.substring(h, 17, 4),
        F.substring(h, 21, 12))
    m = F.col("doc_id") % 5
    path = (
        F.when(m == 0, F.concat(F.lit("/article/"), i, F.lit("/view")))
        .when(m == 1, F.concat(F.lit("/article/"),
                               ((F.col("doc_id") + 7000) % 100000)
                               .cast("string"), F.lit("/view")))
        .when(m == 2, F.lit("/static/css/main.css"))
        .when(m == 3, F.concat(F.lit("/session/"), F.substring(h, 1, 16),
                               F.lit("/cart")))
        .otherwise(F.concat(F.lit("/u/"), uuid))
    )
    urls = d.select(F.concat(
        F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com"), path).alias("url"))
    return url_path_templates(urls)


SQL_URL_TEMPLATES = """
WITH u AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.com' ||
         CASE doc_id % 5
           WHEN 0 THEN '/article/' || doc_id || '/view'
           WHEN 1 THEN '/article/' || ((doc_id + 7000) % 100000)
                       || '/view'
           WHEN 2 THEN '/static/css/main.css'
           WHEN 3 THEN '/session/' || substr(md5(CAST(doc_id AS VARCHAR)),
                                             1, 16) || '/cart'
           ELSE '/u/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) || '-'
                || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4) || '-'
                || substr(md5(CAST(doc_id AS VARCHAR)), 13, 4) || '-'
                || substr(md5(CAST(doc_id AS VARCHAR)), 17, 4) || '-'
                || substr(md5(CAST(doc_id AS VARCHAR)), 21, 12)
         END AS url
  FROM documents),
s AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_replace(regexp_replace(regexp_replace(
           CASE WHEN regexp_extract(url, '^https?://[^/]+([^?#]*)', 1) = ''
                THEN '/' ELSE regexp_extract(url,
                  '^https?://[^/]+([^?#]*)', 1) END,
           '[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}',
           '<uuid>', 'g'),
           '[0-9a-f]{8,}', '<hex>', 'g'),
           '[0-9]+', '<d>', 'g') AS signature
  FROM u),
cells AS (
  SELECT host, signature, CAST(COUNT(*) AS BIGINT) AS n_urls
  FROM s GROUP BY host, signature),
tot AS (SELECT host, SUM(n_urls) AS t FROM cells GROUP BY host)
SELECT c.host, c.signature, c.n_urls,
       CAST(c.n_urls * 1000000 // t.t AS BIGINT) AS share_ppm,
       CAST(row_number() OVER (PARTITION BY c.host
              ORDER BY c.n_urls DESC, c.signature) AS BIGINT) AS rank
FROM cells c JOIN tot t ON t.host = c.host
"""


PROX_TERMS = ["hash", "join", "scan"]


def q_proximity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-proximity retrieval (operators/serving.proximity_topk,
    Büttcher & Clarke min-dist^2 accumulation): adjacent query-term
    pairs contribute 10^6 div d^2 with d the minimum token gap between
    any two occurrences, summed exactly in integers.  The Spark side
    computes the min-gap ROW-LOCAL from the words array (nested
    integer folds, no positional self-join shuffle); the oracle derives
    the same minima from an exploded positional index and a pair join
    — two independent plans, one answer."""
    from biothings_crawler_spark.operators.serving import proximity_topk

    d = _t(spark, sf_dir, "documents")
    return proximity_topk(d, "doc_id", "text", PROX_TERMS, k=25)


SQL_PROXIMITY_TOPK = f"""
WITH w AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
p AS (SELECT id, CAST(r.i AS BIGINT) AS i, words[i] AS term
      FROM w, unnest(range(1, len(words) + 1)) AS r(i)),
pair0 AS (SELECT a.id, MIN(ABS(a.i - b.i)) AS d
          FROM p a JOIN p b ON a.id = b.id
          WHERE a.term = '{{t0}}' AND b.term = '{{t1}}'
          GROUP BY a.id),
pair1 AS (SELECT a.id, MIN(ABS(a.i - b.i)) AS d
          FROM p a JOIN p b ON a.id = b.id
          WHERE a.term = '{{t1}}' AND b.term = '{{t2}}'
          GROUP BY a.id),
s AS (SELECT COALESCE(p0.id, p1.id) AS id,
             COALESCE(1000000 // (p0.d * p0.d), 0)
             + COALESCE(1000000 // (p1.d * p1.d), 0) AS prox
      FROM pair0 p0 FULL OUTER JOIN pair1 p1 ON p0.id = p1.id)
SELECT id, CAST(prox AS BIGINT) AS prox
FROM s WHERE prox > 0
ORDER BY prox DESC, id
LIMIT 25
""".format(t0=PROX_TERMS[0], t1=PROX_TERMS[1], t2=PROX_TERMS[2])


MAXSCORE_QUERY = ["merge", "vector", "window", "stream", "batch"]
MAXSCORE_K = 15


def q_maxscore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxScore-pruned disjunctive top-k (operators/bm25.maxscore_topk,
    Turtle & Flood 1995): per-term upper bounds, a safe threshold from
    the highest-UB term's postings, essential-term candidate pruning,
    exhaustive rescoring of candidates only.  The oracle is the plain
    EXHAUSTIVE ranking — pruning must be output-invisible, so the gate
    proves the safety argument on real data."""
    from biothings_crawler_spark.operators.bm25 import maxscore_topk

    d = _t(spark, sf_dir, "documents")
    return maxscore_topk(d, "doc_id", "text", MAXSCORE_QUERY, k=MAXSCORE_K)


SQL_MAXSCORE_TOPK = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in MAXSCORE_QUERY)})
  GROUP BY id, term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.id,
         ((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tf.tf * t.w_total
           // (20 * tf.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)
           AS term_score
  FROM tf JOIN dfq d USING (term) JOIN lens l ON l.id = tf.id CROSS JOIN tot t)
SELECT id, CAST(SUM(term_score) AS BIGINT) AS score
FROM sc GROUP BY id
ORDER BY score DESC, id LIMIT {MAXSCORE_K}
"""


_SUBSTR_P1 = ("SHARED-PARAGRAPH: the quick brown fox jumps over the lazy "
              "dog while the crawler politely waits for robots to allow "
              "another fetch from this host.")
_SUBSTR_P2 = "COMMON-BANNER accept cookies to continue reading this page"
_SUBSTR_L = 25


def _substr_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus with three planted duplication lanes over the documents
    text: a shared banner prefix (doc_id%5==2), a shared trailing
    paragraph (doc_id%7==1), and an intra-document repeat of the doc's
    own first 40 chars (doc_id%11==3) — cross-doc, cross-doc, and
    within-doc duplicated regions respectively, all longer than the
    L=25 window so each yields a merged span."""
    d = _t(spark, sf_dir, "documents")
    t = F.concat(
        F.when(F.col("doc_id") % 5 == 2,
               F.lit(_SUBSTR_P2 + " ")).otherwise(F.lit("")),
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 1,
               F.lit(" " + _SUBSTR_P1)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 3,
               F.concat(F.lit(" "), F.substring("text", 1, 40)))
        .otherwise(F.lit("")),
    )
    return d.select("doc_id", t.alias("text"))


_SQL_SUBSTR_FIXTURE = f"""
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 2 THEN '{_SUBSTR_P2} ' ELSE '' END
         || text
         || CASE WHEN doc_id % 7 = 1 THEN ' {_SUBSTR_P1}' ELSE '' END
         || CASE WHEN doc_id % 11 = 3 THEN ' ' || substr(text, 1, 40)
                 ELSE '' END AS text
  FROM documents
"""


def q_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplicated-span detection (operators/substr.
    duplicated_spans, Lee et al. ACL 2022 semantics): maximal spans
    covered by corpus-duplicated L=25 windows, found via the xxhash64
    window key + single-exchange aggregate-explode + per-doc island
    merge.  The oracle re-derives spans by grouping on the LITERAL
    window string, so the gate also proves the production hash path
    collision-free on this corpus."""
    from biothings_crawler_spark.operators.substr import duplicated_spans

    return duplicated_spans(
        _substr_fixture(spark, sf_dir), "doc_id", "text", _SUBSTR_L)


SQL_SUBSTR_SPANS = f"""
WITH u AS ({_SQL_SUBSTR_FIXTURE}),
g AS (
  SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
         substr(text, CAST(r.i + 1 AS INT), {_SUBSTR_L}) AS gram
  FROM u, unnest(range(0, length(text) - {_SUBSTR_L} + 1)) AS r(i)
  WHERE length(text) >= {_SUBSTR_L}),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
b AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w > {_SUBSTR_L}
              THEN 1 ELSE 0 END AS brk
  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM b)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SUBSTR_L} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {_SUBSTR_L} - MIN(pos) AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island
"""


def q_substr_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span removal composed on detection (operators/substr.
    strip_spans): every duplicated span cut from every doc by a
    descending-start substring fold.  The oracle rebuilds the cleaned
    text as the concatenation of the KEPT inter-span segments (an
    independent formulation: segment gaps, not iterated cuts)."""
    from biothings_crawler_spark.operators.substr import (
        duplicated_spans,
        strip_spans,
    )

    docs = _substr_fixture(spark, sf_dir)
    spans = duplicated_spans(docs, "doc_id", "text", _SUBSTR_L)
    return strip_spans(docs, spans, "doc_id", "text")


SQL_SUBSTR_STRIP = f"""
WITH u AS ({_SQL_SUBSTR_FIXTURE}),
spans AS ({SQL_SUBSTR_SPANS}),
bounds AS (
  SELECT doc_id,
         COALESCE(lag(span_end) OVER
                  (PARTITION BY doc_id ORDER BY span_start), 0)
           AS keep_from,
         span_start AS keep_to
  FROM spans
  UNION ALL
  SELECT s.doc_id, MAX(s.span_end) AS keep_from,
         ANY_VALUE(length(u.text)) AS keep_to
  FROM spans s JOIN u USING (doc_id) GROUP BY s.doc_id),
cleaned AS (
  SELECT b.doc_id,
         string_agg(substr(u.text, CAST(b.keep_from + 1 AS INT),
                           CAST(b.keep_to - b.keep_from AS INT)),
                    '' ORDER BY b.keep_from) AS text_clean
  FROM bounds b JOIN u USING (doc_id) GROUP BY b.doc_id),
nsp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id)
SELECT u.doc_id, COALESCE(c.text_clean, u.text) AS text_clean,
       COALESCE(n.n_spans, 0) AS n_spans
FROM u LEFT JOIN cleaned c USING (doc_id) LEFT JOIN nsp n USING (doc_id)
"""


def _soft404_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic host/page table from documents: 23 hosts; hosts with
    id % 3 == 0 serve soft 404s (dead pages answer 200 with the host's
    error template), the rest answer honest 404s on dead pages
    (doc_id % 5 == 0). Live pages carry the document text."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    hid = did % 23
    host = F.concat(F.lit("h"), hid.cast("string"))
    dead = did % 5 == 0
    soft_host = hid % 3 == 0
    return d.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 did.cast("string")).alias("url"),
        F.when(dead & ~soft_host, F.lit(404)).otherwise(F.lit(200))
        .alias("status"),
        F.when(dead & soft_host,
               F.concat(F.lit("Not Found - template "), host))
        .when(dead, F.lit("hard 404"))
        .otherwise(F.col("text")).alias("text"),
    )


def _soft404_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One probe per host for a URL that cannot exist: soft-404 hosts
    answer it 200 with their template (deliberately different case and
    whitespace than the page copy — the signature normalizes both);
    honest hosts answer 404."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 23)
    k = F.col("doc_id")
    host = F.concat(F.lit("h"), k.cast("string"))
    return d.select(
        host.alias("host"),
        F.when(k % 3 == 0, F.lit(200)).otherwise(F.lit(404)).alias("status"),
        F.concat(F.lit("  not   FOUND - Template "), host, F.lit(" "))
        .alias("text"),
    )


def q_soft404_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE-side soft-404 detection (operators/soft404, Bar-Yossef et al. WWW
    2004): per-host probe signatures -> broadcast join -> row-local
    flag. The reference trusts raw status codes (its spiders index any
    200 body); this is the plane that keeps host error templates out
    of a 10^10-page corpus. Flags exactly the dead pages of the
    template-serving hosts; honest hosts and live pages pass."""
    from biothings_crawler_spark.operators.soft404 import detect_soft404

    out = detect_soft404(
        _soft404_pages(spark, sf_dir), _soft404_probes(spark, sf_dir)
    )
    return out.select("host", "url", "status", "is_soft404")


_SQL_BODY_FP = "md5(trim(regexp_replace(lower({t}), '\\s+', ' ', 'g')))"

SQL_SOFT404_PROBE = f"""
WITH pages AS (
  SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS host,
         'https://h' || CAST(doc_id % 23 AS VARCHAR) || '/p/'
             || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 5 = 0 AND (doc_id % 23) % 3 <> 0
              THEN 404 ELSE 200 END AS status,
         CASE WHEN doc_id % 5 = 0 AND (doc_id % 23) % 3 = 0
              THEN 'Not Found - template h' || CAST(doc_id % 23 AS VARCHAR)
              WHEN doc_id % 5 = 0 THEN 'hard 404'
              ELSE text END AS text
  FROM documents),
probes AS (
  SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
         CASE WHEN doc_id % 3 = 0 THEN 200 ELSE 404 END AS status,
         '  not   FOUND - Template h' || CAST(doc_id AS VARCHAR) || ' ' AS text
  FROM documents WHERE doc_id < 23),
sig AS (
  SELECT host, min({_SQL_BODY_FP.format(t='text')}) AS soft404_fp
  FROM probes WHERE status = 200 GROUP BY host)
SELECT p.host, p.url, p.status,
       (p.status = 200 AND s.soft404_fp IS NOT NULL
        AND {_SQL_BODY_FP.format(t='p.text')} = s.soft404_fp) AS is_soft404
FROM pages p LEFT JOIN sig s USING (host)
"""


def q_ip_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP-group politeness (operators/politeness.select_politely_by_ip,
    Heritrix queue-assignment-policy=ip): 200 vhosts resolve onto 31
    shared IPs, and the per-IP budget is enforced by the same exact
    two-phase salted selection as the per-host plane — the oracle is
    the naive global per-IP window the salted plan must equal. Hosts
    missing from the resolver cache fail open to per-host politeness
    (exercised: hosts h190..h199 have no resolver row)."""
    from biothings_crawler_spark.operators.politeness import (
        select_politely_by_ip,
    )

    ev = _t(spark, sf_dir, "events")
    hid = F.col("user_id") % 200
    cand = ev.select(
        F.concat(F.lit("h"), hid.cast("string")).alias("host"),
        F.lpad(F.col("event_id").cast("string"), 12, "0").alias("url_canon"),
        F.col("event_id").alias("url_hash"),
        F.lit(0).alias("priority"),
        F.col("event_id"),
    )
    host_ip = spark.range(190).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.concat(F.lit("ip"), (F.col("id") % 31).cast("string")).alias("ip"),
    )
    budgets = spark.createDataFrame([], "ip string, budget int")
    sel = select_politely_by_ip(cand, host_ip, budgets, POLITENESS_BUDGET,
                                salt_target=2000)
    return sel.select(
        "host", "ip", "event_id",
        F.col("sched_rank").cast("long").alias("sched_rank"),
    )


SQL_IP_POLITENESS = f"""
SELECT host, ip, event_id, CAST(rn AS BIGINT) AS sched_rank
FROM (SELECT 'h' || CAST(user_id % 200 AS VARCHAR) AS host,
             CASE WHEN user_id % 200 < 190
                  THEN 'ip' || CAST((user_id % 200) % 31 AS VARCHAR)
                  ELSE 'h' || CAST(user_id % 200 AS VARCHAR) END AS ip,
             event_id,
             row_number() OVER (
               PARTITION BY CASE WHEN user_id % 200 < 190
                    THEN 'ip' || CAST((user_id % 200) % 31 AS VARCHAR)
                    ELSE 'h' || CAST(user_id % 200 AS VARCHAR) END
               ORDER BY event_id) AS rn
      FROM events)
WHERE rn <= {POLITENESS_BUDGET}
"""


def q_lm_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language LM tercile bucketing (operators/lm.tercile_cutoffs
    + bucket_by_terciles) — CCNet's actual bucketing rule (per-language
    perplexity terciles, Wenzek et al. §3.3) replacing q_lm_score's
    fixed thresholds: cutoffs come from a bounded (lang, bin) histogram
    window (<= 1001 rows per language), never a per-language sort of
    the corpus, then return by broadcast join. Same planted-casualty
    scoring fixture as q_lm_score."""
    from biothings_crawler_spark.operators.lm import (
        bucket_by_terciles,
        lm_score,
        tercile_cutoffs,
        train_bigram_lm,
    )

    d = _t(spark, sf_dir, "documents")
    mutated = d.selectExpr("doc_id", _LM_TEXT + " AS text")
    train = mutated.filter(_LM_TRAIN.replace("id", "doc_id"))
    model = train_bigram_lm(train, "doc_id", "text", min_count=2)
    scored = lm_score(mutated, model, "doc_id", "text").drop("bucket")
    scored = scored.join(
        d.select(F.col("doc_id").alias("id"), "lang"), "id"
    ).localCheckpoint(eager=True)
    # ^ the standard mid-pipeline materialization: the cutoff pass and
    # the bucketing join both read `scored` — without it the whole
    # train+score chain re-executes per consumer (measured 14.9 s ->
    # ~2 s at sf0.1; at 100 TB this is a persisted table between the
    # scoring job and the bucketing job)
    cuts = tercile_cutoffs(scored, "lang")
    return bucket_by_terciles(scored, cuts, "lang").select(
        "id", "lang", "score_ppm", "bucket"
    )


# reuse q_lm_score's entire scoring chain verbatim (everything up to its
# final fixed-threshold SELECT), then bucket by per-language terciles
_SQL_LM_CHAIN = SQL_LM_SCORE.rsplit("\nSELECT id, n_bigrams", 1)[0]

SQL_LM_TERCILES = _SQL_LM_CHAIN + """,
sb AS (
  SELECT f.id, d.lang, f.score_ppm, f.score_ppm // 1000 AS bin
  FROM f JOIN (SELECT doc_id AS id, lang FROM documents) d USING (id)),
hist AS (SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM sb GROUP BY 1, 2),
cum AS (SELECT lang, bin,
               CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bin DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM hist),
tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
cut AS (SELECT lang,
               MAX(CASE WHEN cum >= greatest(n // 3, 1) THEN bin END)
                 AS head_bin,
               MAX(CASE WHEN cum >= greatest((2 * n) // 3, 1) THEN bin END)
                 AS mid_bin
        FROM cum JOIN tot USING (lang) GROUP BY lang)
SELECT sb.id, sb.lang, sb.score_ppm,
       CASE WHEN sb.bin >= cut.head_bin THEN 'head'
            WHEN sb.bin >= cut.mid_bin THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sb JOIN cut USING (lang)
"""


HYPERBALL_ROUNDS = 3


def q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood function (operators/sketch.hyperball,
    Boldi & Vigna): per-(node, t) ball-cardinality estimates over the
    shared hub graph, t = 0..3. The HLL registers and the integer
    estimate arithmetic are cross-engine exact, so the driver verifies
    the approximation itself bit-for-bit, not a tolerance band."""
    from biothings_crawler_spark.operators.sketch import hyperball

    return hyperball(_hub_edges(spark, sf_dir), rounds=HYPERBALL_ROUNDS)


def _sql_hyperball() -> str:
    from biothings_crawler_spark.operators.sketch import (
        ALPHA_PPM,
        HLL_M,
        LC_CUTOFF,
        LC_LUT,
        RHO_CAP,
    )

    lut = ", ".join(str(x) for x in LC_LUT)
    ctes = [
        _SQL_HUBGRAPH,
        f"""
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
br AS (SELECT node,
              ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 2))::BIGINT
                AS bucket,
              ('0x' || substr(md5(CAST(node AS VARCHAR)), 3, 13))::BIGINT
                AS suffix
       FROM nodes),
s0 AS MATERIALIZED (
  SELECT node,
         list_transform(range({HLL_M}), j -> CAST(
           CASE WHEN j = bucket
                THEN LEAST(CASE WHEN suffix > 0
                                THEN 53 - length(bin(suffix))
                                ELSE {RHO_CAP} END, {RHO_CAP})
                ELSE 0 END AS INT)) AS regs
  FROM br)""",
    ]
    for i in range(HYPERBALL_ROUNDS):
        ctes.append(f"""
u{i} AS (SELECT node, regs FROM s{i}
         UNION ALL
         SELECT e.src AS node, s.regs FROM e JOIN s{i} s ON s.node = e.dst),
p{i} AS (SELECT node, generate_subscripts(regs, 1) AS pos, unnest(regs) AS r
         FROM u{i}),
s{i + 1} AS MATERIALIZED (
  SELECT node, list(r ORDER BY pos) AS regs FROM (
    SELECT node, pos, CAST(MAX(r) AS INT) AS r FROM p{i} GROUP BY 1, 2)
  GROUP BY node)""")
    snaps = " UNION ALL ".join(
        f"SELECT node, CAST({t} AS BIGINT) AS t, regs FROM s{t}"
        for t in range(HYPERBALL_ROUNDS + 1)
    )
    return ("WITH " + ",".join(ctes) + f""",
snaps AS ({snaps}),
zz AS (SELECT node, t,
              list_reduce(list_transform(regs,
                  r -> (1::BIGINT << ({RHO_CAP} - r))), (a, b) -> a + b) AS z,
              CAST(len(list_filter(regs, r -> r = 0)) AS BIGINT) AS v
       FROM snaps),
rr AS (SELECT node, t,
              CAST({ALPHA_PPM} * ({HLL_M * HLL_M} * (1::BIGINT << {RHO_CAP})
                   // z) // 1000000 AS BIGINT) AS raw, v
       FROM zz)
SELECT node, t,
       CAST(CASE WHEN raw <= {LC_CUTOFF} AND v > 0
            THEN list_extract([{lut}], CAST(v AS INT))
            ELSE raw END AS BIGINT) AS ball_est
FROM rr""")


SQL_HYPERBALL = _sql_hyperball()


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality via HyperBall (operators/sketch.
    harmonic_centrality, Boldi & Vigna "Axioms for centrality"):
    Σ_t Δball(v,t) * ppm div t over the same sketches as q_hyperball —
    the seed-quality score, robust on the disconnected graphs closeness
    degenerates on. Integer ppm-units, oracle-exact."""
    from biothings_crawler_spark.operators.sketch import harmonic_centrality

    return harmonic_centrality(_hub_edges(spark, sf_dir),
                               rounds=HYPERBALL_ROUNDS)


SQL_HARMONIC_CENTRALITY = f"""
WITH hb AS (SELECT * FROM ({SQL_HYPERBALL}) t),
d AS (SELECT node, t, ball_est,
             lag(ball_est) OVER (PARTITION BY node ORDER BY t) AS prev
      FROM hb)
SELECT node,
       CAST(SUM(greatest(ball_est - prev, 0) * (1000000 // t)) AS BIGINT)
         AS harmonic_ppm
FROM d WHERE t > 0 GROUP BY node
"""


PPR_ITERS, PPR_ALPHA, PPR_EPS = 3, 15, 1000


def q_ppr_push(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank by synchronous forward push (operators/
    pagerank.ppr_push, Andersen-Chung-Lang batched): 3 rounds from the
    trustrank seed family (node % 13 == 0), alpha 15%, eps 1000
    micro-units — the topic-focused crawl prioritizer.  Oracle unrolls
    the identical push rounds as chained CTEs."""
    from biothings_crawler_spark.operators.pagerank import ppr_push

    e = _hub_edges(spark, sf_dir)
    seeds = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 13 == 0)
    )
    return ppr_push(e, seeds, iters=PPR_ITERS, alpha_pct=PPR_ALPHA,
                    eps=PPR_EPS)


def _sql_ppr() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    ctes = [
        _SQL_HUBGRAPH,
        f"""
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
s0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS p,
         CAST(CASE WHEN node % 13 = 0 THEN {PR_SCALE} ELSE 0 END
              AS BIGINT) AS r
  FROM nodes)""",
    ]
    for i in range(PPR_ITERS):
        ctes.append(f"""
c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(({100 - PPR_ALPHA} * s.r) // (100 * d.deg)) AS BIGINT)
           AS add_r
  FROM s{i} s JOIN e ON e.src = s.node JOIN deg d ON d.src = s.node
  WHERE s.r >= {PPR_EPS} GROUP BY e.dst),
s{i + 1} AS MATERIALIZED (
  SELECT s.node,
         CAST(CASE WHEN s.r >= {PPR_EPS}
              THEN s.p + ({PPR_ALPHA} * s.r) // 100
              ELSE s.p END AS BIGINT) AS p,
         CAST((CASE WHEN s.r >= {PPR_EPS} THEN 0 ELSE s.r END)
              + COALESCE(c.add_r, 0) AS BIGINT) AS r
  FROM s{i} s LEFT JOIN c{i} c ON c.node = s.node)""")
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT node, p, r FROM s{PPR_ITERS}")


SQL_PPR_PUSH = _sql_ppr()


def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative spam mass (operators/pagerank.spam_mass, Gyöngyi et al.
    VLDB 2006): fraction of each hub-graph node's PageRank that lacks
    trust lineage, trust seeds = node %% 13 == 0 rescaled by n/|S|.
    Oracle = the q_pagerank and q_trustrank CTE chains side by side
    plus the identical shift-guarded ppm formula."""
    from biothings_crawler_spark.operators.pagerank import spam_mass

    e = _hub_edges(spark, sf_dir)
    seeds = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 13 == 0)
    )
    return spam_mass(e, seeds, iters=PR_ITERS)


def _sql_spam_mass() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    base = 15 * PR_SCALE // 100
    ctes = [
        _SQL_HUBGRAPH,
        f"""
nodes AS (SELECT DISTINCT node,
                 CASE WHEN node % 13 = 0 THEN 1 ELSE 0 END AS is_seed
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes),
t0 AS (SELECT node, is_seed, CAST(is_seed * {PR_SCALE} AS BIGINT) AS rank
       FROM nodes)""",
    ]
    for i in range(PR_ITERS):
        ctes.append(f"""
r{i + 1} AS (
  SELECT n.node, CAST({base} + coalesce(s.in_sum, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * r.rank) // (100 * d.deg)) AS in_sum
    FROM e JOIN deg d USING (src) JOIN r{i} r ON r.node = e.src
    GROUP BY e.dst) s USING (node)),
t{i + 1} AS (
  SELECT n.node, n.is_seed,
         CAST(n.is_seed * {base} + coalesce(s.in_sum, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * t.rank) // (100 * d.deg)) AS in_sum
    FROM e JOIN deg d USING (src) JOIN t{i} t ON t.node = e.src
    GROUP BY e.dst) s USING (node))""")
    ctes.append(f"""
cnt AS (SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
               (SELECT COUNT(*) FROM nodes WHERE is_seed = 1) AS n_seeds),
j AS (
  SELECT r.node, r.rank AS pr,
         CAST(coalesce(t.rank, 0) * c.n_nodes // c.n_seeds AS BIGINT)
           AS tr_adj
  FROM r{PR_ITERS} r
  JOIN t{PR_ITERS} t ON t.node = r.node CROSS JOIN cnt c)""")
    return ("WITH " + ",".join(ctes) + """
SELECT node, pr, tr_adj,
       CAST((((pr - LEAST(pr, tr_adj)) // 1000) * 1000000)
            // (pr // 1000) AS BIGINT) AS spam_ppm
FROM j""")


SQL_SPAM_MASS = _sql_spam_mass()


CUSUM_K, CUSUM_H = 650_000, 5_000_000


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host latency drift detection (operators/temporal.cusum_drift,
    Page 1954 one-sided CUSUM): hosts = user bucket %% 40, latency_us =
    floor(value*12345) as in q_latency_quantiles, slack k=650k/obs,
    alarm threshold h=5M.  The sequential max(0, s+d) recurrence runs
    as ONE window via the prefix-sum-minus-running-min closed form.
    Oracle = the same two window functions in DuckDB."""
    from biothings_crawler_spark.operators.temporal import cusum_drift

    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias("host"),
        F.col("ts"),
        F.col("event_id"),
        F.floor(F.col("value") * 12345).cast("long").alias("latency_us"),
    )
    out = cusum_drift(fetches, "host", "ts", "event_id", "latency_us",
                      k=CUSUM_K, h=CUSUM_H)
    return out.select("host", "event_id", "stat", "alarm")


SQL_CUSUM_DRIFT = f"""
WITH f AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host, ts, event_id,
         CAST(floor(value * 12345) AS BIGINT) - {CUSUM_K} AS d
  FROM events),
r AS (
  SELECT host, ts, event_id,
         SUM(d) OVER (PARTITION BY host ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM f),
s AS (
  SELECT host, event_id, run,
         LEAST(CAST(0 AS BIGINT),
               MIN(run) OVER (PARTITION BY host ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)) AS low
  FROM r)
SELECT host, event_id, CAST(run - low AS BIGINT) AS stat,
       (run - low) >= {CUSUM_H} AS alarm
FROM s
"""


PRIORITY_K = 50


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling without replacement (operators/
    sampling.priority_sample, Duffield-Lund-Thorup priority sampling):
    top-50 by integer priority w_ppm * 2^30 div u30, tau = the 51st
    priority, est = max(w, tau) — sum(est) estimates total weight.
    Weights are a deterministic skew (1 + (id%997) * (id%13)) so the
    sample is weight-tilted, not uniform.  Oracle replays hash,
    priority, tau, and estimate in SQL."""
    from biothings_crawler_spark.operators.sampling import priority_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (1 + (F.col("doc_id") % 997) * (F.col("doc_id") % 13))
        .cast("long").alias("w_ppm"))
    return priority_sample(d, "doc_id", "w_ppm", k=PRIORITY_K, seed="pri")


SQL_PRIORITY_SAMPLE = f"""
WITH w AS (
  SELECT doc_id AS id,
         CAST(1 + (doc_id % 997) * (doc_id % 13) AS BIGINT) AS w_ppm
  FROM documents),
pri AS (
  SELECT id, w_ppm,
         (w_ppm * {1 << 30}) //
           ((CAST(('0x' || substr(md5('pri:' || CAST(id AS VARCHAR)), 1, 15))
                  AS BIGINT) // {1 << 30}) + 1) AS priority
  FROM w),
top AS (SELECT * FROM pri ORDER BY priority DESC, id LIMIT {PRIORITY_K + 1}),
tau AS (SELECT CASE WHEN COUNT(*) > {PRIORITY_K} THEN MIN(priority)
                    ELSE 0 END AS tau FROM top),
s AS (SELECT * FROM top ORDER BY priority DESC, id LIMIT {PRIORITY_K})
SELECT s.id, s.w_ppm, CAST(s.priority AS BIGINT) AS priority,
       CAST(GREATEST(s.w_ppm, t.tau) AS BIGINT) AS est_w_ppm
FROM s, tau t
"""


def q_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective diameter via the HyperBall neighborhood function
    (operators/sketch.effective_diameter, Palmer et al. ANF / Boldi &
    Vigna): smallest t where N(t) reaches 90% of the horizon value —
    integer-exact over the same oracle-verifiable sketches as
    q_hyperball."""
    from biothings_crawler_spark.operators.sketch import effective_diameter

    return effective_diameter(_hub_edges(spark, sf_dir),
                              rounds=HYPERBALL_ROUNDS)


SQL_EFFECTIVE_DIAMETER = f"""
WITH hb AS (SELECT * FROM ({SQL_HYPERBALL}) x),
nt AS (SELECT t, CAST(SUM(ball_est) AS BIGINT) AS n_t FROM hb GROUP BY t),
lastn AS (SELECT n_t AS n_last FROM nt WHERE t = {HYPERBALL_ROUNDS}),
frac AS (SELECT t, n_t,
                CAST(CAST(n_t AS HUGEINT) * 1000000 // n_last AS BIGINT)
                  AS frac_ppm
         FROM nt, lastn),
eff AS (SELECT MIN(t) AS t_eff FROM frac WHERE frac_ppm >= 900000)
SELECT t, n_t, frac_ppm,
       CAST(CASE WHEN t = t_eff THEN 1 ELSE 0 END AS BIGINT) AS is_eff
FROM frac, eff
"""


BOWTIE_CYCLE = [(3, 97), (97, 83), (83, 3)]


def q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie decomposition (operators/pagerank.bowtie_decomposition,
    Broder et al. WWW 2000) of the hub graph with a planted 3-cycle
    (the division edges only descend, so the plain graph is a DAG with
    singleton SCCs): pivot = max-degree node, CORE = its SCC via
    forward ∩ backward fixpoint reachability, IN/OUT/other around it.
    Oracle = two recursive-CTE reachability closures from the same
    degree-argmax pivot."""
    from biothings_crawler_spark.operators.pagerank import (
        bowtie_decomposition,
    )

    cyc = spark.createDataFrame(BOWTIE_CYCLE, "src long, dst long")
    e = _hub_edges(spark, sf_dir).unionByName(cyc)
    return bowtie_decomposition(e)


def _sql_bowtie() -> str:
    cyc = " UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS src, CAST({b} AS BIGINT) AS dst"
        for a, b in BOWTIE_CYCLE
    )
    return f"""
WITH RECURSIVE {_SQL_HUBGRAPH},
e2 AS (SELECT src, dst FROM e UNION ALL {cyc}),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)),
deg AS (SELECT node, COUNT(*) AS deg FROM
        (SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)
        GROUP BY 1),
piv AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT 1),
fwd AS (SELECT node FROM piv
        UNION
        SELECT e2.dst AS node FROM e2, fwd WHERE fwd.node = e2.src),
bwd AS (SELECT node FROM piv
        UNION
        SELECT e2.src AS node FROM e2, bwd WHERE bwd.node = e2.dst)
SELECT n.node,
       CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'core'
            WHEN b.node IS NOT NULL THEN 'in'
            WHEN f.node IS NOT NULL THEN 'out'
            ELSE 'other' END AS component
FROM nodes n
LEFT JOIN fwd f ON f.node = n.node
LEFT JOIN bwd b ON b.node = n.node
"""


SQL_BOWTIE = _sql_bowtie()


WALK_LEN = 4
WALKS_PER_NODE = 2


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DeepWalk corpus (operators/walks.random_walks,
    Perozzi et al. KDD 2014) over the hub graph: 2 walks x 4 steps per
    node, each step's neighbor chosen by a shared md5 coin mod
    out-degree — the walk corpus is a pure function of the graph, so
    the oracle replays every step exactly (and resume/N-vs-4N runs
    emit identical corpora, the north rule applied to sampling)."""
    from biothings_crawler_spark.operators.walks import random_walks

    return random_walks(_hub_edges(spark, sf_dir),
                        walk_len=WALK_LEN, walks_per_node=WALKS_PER_NODE)


def _sql_random_walks() -> str:
    walks = ", ".join(f"({w})" for w in range(WALKS_PER_NODE))
    ctes = [
        _SQL_HUBGRAPH,
        f"""
nb AS MATERIALIZED (SELECT src, dst,
        ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk FROM e),
dg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM e GROUP BY 1),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
s0 AS MATERIALIZED (
  SELECT node AS start, CAST(w AS BIGINT) AS walk,
         CAST(0 AS BIGINT) AS step, node AS cur
  FROM nodes CROSS JOIN (VALUES {walks}) AS t(w))""",
    ]
    for i in range(WALK_LEN):
        coin = (
            "('0x' || substr(md5(CAST(s.cur AS VARCHAR) || '_' || "
            f"CAST(s.walk AS VARCHAR) || '_' || '{i}'), 1, 15))::BIGINT"
        )
        ctes.append(f"""
s{i + 1} AS MATERIALIZED (
  SELECT s.start, s.walk, CAST({i + 1} AS BIGINT) AS step, nb.dst AS cur
  FROM s{i} s
  JOIN dg ON dg.src = s.cur
  JOIN nb ON nb.src = s.cur AND nb.rk = 1 + ({coin} % dg.deg))""")
    union = " UNION ALL ".join(
        f"SELECT start, walk, step, cur FROM s{i}"
        for i in range(WALK_LEN + 1)
    )
    return "WITH " + ",".join(ctes) + f"\n{union}"


SQL_RANDOM_WALKS = _sql_random_walks()


ANN_TRUNC_DIMS = 16


def q_ann_truncated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncated ANN (operators/similarity.
    truncated_brute_topk, Matryoshka-style): top-10 by cosine over the
    first 16 of 64 components — 4x less scan/compute, recall vs the
    full ranking pytest-measured. Oracle = the same cosine fold over
    the sliced lists."""
    from biothings_crawler_spark.operators.similarity import (
        truncated_brute_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    out = truncated_brute_topk(e, q, "vec_id", "embedding", k=10,
                               dims=ANN_TRUNC_DIMS)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


SQL_ANN_TRUNCATED_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id,
                  embedding[1:{ANN_TRUNC_DIMS}] AS qv FROM embeddings
           WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id, embedding[1:{ANN_TRUNC_DIMS}] AS v FROM embeddings),
sc AS (SELECT query_id, vec_id,
              {_sql_cosine('qv', 'v', dim=ANN_TRUNC_DIMS)} AS cosine
       FROM c, q)
SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM sc)
WHERE rn <= 10
"""


def q_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta sketch set intersection (operators/sketch.
    theta_overlap, Bar-Yossef et al. / DataSketches theta family):
    estimated distinct |A|, |B|, |A∩B| and Jaccard for two overlapping
    URL snapshots, from two 256-value k-min sketches — the cross-crawl
    overlap report HLL cannot produce (HLL unions only). Estimator is
    integer floor arithmetic on the shared u60 hash: oracle-exact, and
    pytest checks it lands near the true overlap."""
    from biothings_crawler_spark.operators.sketch import theta_overlap

    o = _t(spark, sf_dir, "orders")
    a = o.select(F.concat(F.lit("u"), (F.col("o_orderkey") % 3000)
                          .cast("string")).alias("url"))
    b = o.select(F.concat(F.lit("u"), (F.col("o_orderkey") % 3000 + 1000)
                          .cast("string")).alias("url"))
    return theta_overlap(a, b, "url")


def _sql_theta_overlap() -> str:
    from biothings_crawler_spark.operators.sketch import KMV_K, U60

    def sk(expr: str) -> str:
        return (f"SELECT DISTINCT ('0x' || substr(md5('kmv:' || ({expr})),"
                f" 1, 15))::BIGINT AS h FROM orders ORDER BY h LIMIT {KMV_K}")

    return f"""
WITH ska AS MATERIALIZED ({sk("'u' || CAST(o_orderkey % 3000 AS VARCHAR)")}),
skb AS MATERIALIZED ({sk("'u' || CAST(o_orderkey % 3000 + 1000 AS VARCHAR)")}),
tt AS (SELECT
  (SELECT CASE WHEN COUNT(*) < {KMV_K} THEN CAST({U60} AS BIGINT)
          ELSE MAX(h) END FROM ska) AS ta,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ska) AS na,
  (SELECT CASE WHEN COUNT(*) < {KMV_K} THEN CAST({U60} AS BIGINT)
          ELSE MAX(h) END FROM skb) AS tb,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM skb) AS nb),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common
       FROM ska JOIN skb USING (h), tt WHERE h < least(ta, tb)),
est AS (
  SELECT CASE WHEN ta = {U60} THEN na
         ELSE CAST({KMV_K - 1}::HUGEINT * {U60} // ta AS BIGINT) END AS a_est,
         CASE WHEN tb = {U60} THEN nb
         ELSE CAST({KMV_K - 1}::HUGEINT * {U60} // tb AS BIGINT) END AS b_est,
         CAST(n_common::HUGEINT * {U60} // least(ta, tb) AS BIGINT)
           AS inter_est
  FROM tt, nc)
SELECT a_est, b_est, inter_est,
       CASE WHEN a_est + b_est - inter_est > 0
            THEN CAST(inter_est::HUGEINT * 1000000
                      // (a_est + b_est - inter_est) AS BIGINT)
            ELSE 0 END AS jaccard_ppm
FROM est
"""


SQL_THETA_OVERLAP = _sql_theta_overlap()


def q_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode (operators/multimodal.decode_jpeg_features +
    operators/jpegcodec): worker-side synthesis of actual baseline
    grayscale JPEGs (real DQT/SOF0/DHT/SOS segments, canonical-Huffman
    entropy data with 0xFF stuffing), decoded back through the full
    marker-parse -> Huffman -> dequant -> IDCT path. The fixture rides
    the codec's exactness lane (block-constant even values are pure-DC
    and round-trip bit-exactly), so the oracle recomputes every feature
    from the generator's closed form, never touching the bytes; pytest
    separately bounds non-flat roundtrip error and pins Huffman/marker
    edges.  Ids divisible by 7 emit a PROGRESSIVE (SOF2) stub — the
    out-of-scope marker class — and must land in ``decode_err`` with
    NULL features while the stage completes (one malformed image never
    fails the batch)."""
    from biothings_crawler_spark.operators.multimodal import (
        decode_jpeg_features,
        gen_jpeg_media,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("media_id"))
    return decode_jpeg_features(gen_jpeg_media(ids, progressive_every=7))


SQL_JPEG_DECODE = """
WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 10 = 7),
b AS (SELECT media_id, media_id % 7 = 0 AS prog,
             list_transform(range(4),
               k -> 2 * ((media_id * 37 + (k // 2) * 2 + (k % 2)) % 128))
               AS blocks
      FROM m)
SELECT media_id,
       CASE WHEN prog THEN NULL ELSE CAST(16 AS INT) END AS width,
       CASE WHEN prog THEN NULL ELSE CAST(16 AS INT) END AS height,
       CASE WHEN prog THEN NULL ELSE CAST(256 AS BIGINT) END AS n_pixels,
       CASE WHEN prog THEN NULL
            ELSE CAST(64 * list_sum(blocks) AS BIGINT) END AS sum_gray,
       CASE WHEN prog THEN NULL
            ELSE CAST(list_min(blocks) AS INT) END AS min_gray,
       CASE WHEN prog THEN NULL
            ELSE CAST(list_max(blocks) AS INT) END AS max_gray,
       CASE WHEN prog THEN 'baseline SOF0 only' ELSE NULL END AS decode_err
FROM b
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling (operators/multimodal.
    decode_video_frames): worker-synthesized MJPEG AVI containers
    (RIFF hdrl/movi lists, WORD-aligned 00dc chunks), every 2nd frame
    decoded through the full RIFF walk + baseline-JPEG path. Frames
    ride the codec's block-constant exactness lane, so the oracle
    recomputes per-frame features from the generator's closed form —
    including WHICH frame numbers survive the sampling stride.  Ids
    divisible by 3 get a corrupted RIFF magic — the whole container
    lands as ONE ``decode_err`` row (frame_no NULL), stage
    completing."""
    from biothings_crawler_spark.operators.multimodal import (
        decode_video_frames,
        gen_mjpeg_media,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("media_id"))
    return decode_video_frames(
        gen_mjpeg_media(ids, malformed_every=3), every_n=2)


SQL_VIDEO_FRAMES = """
WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 10 = 3),
f AS (SELECT media_id, unnest(range(3 + media_id % 3)) AS frame_no
      FROM m WHERE media_id % 3 <> 0),
s AS (SELECT media_id, frame_no,
             list_transform(range(4),
               k -> 2 * ((media_id * 37 + frame_no * 11
                          + (k // 2) * 2 + (k % 2)) % 128)) AS blocks
      FROM f WHERE frame_no % 2 = 0)
SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(64 * list_sum(blocks) AS BIGINT) AS sum_gray,
       CAST(list_min(blocks) AS INT) AS min_gray,
       CAST(list_max(blocks) AS INT) AS max_gray,
       CAST(NULL AS VARCHAR) AS decode_err
FROM s
UNION ALL
SELECT media_id, CAST(NULL AS BIGINT) AS frame_no,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       CAST(NULL AS BIGINT) AS sum_gray,
       CAST(NULL AS INT) AS min_gray, CAST(NULL AS INT) AS max_gray,
       'not a RIFF/AVI container' AS decode_err
FROM m WHERE media_id % 3 = 0
"""


PR_INC_REFINE = 2


def q_pagerank_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PageRank maintenance (operators/pagerank.pagerank
    with init_ranks): converge on the snapshot graph (4 iters), add
    the planted cycle edges (a crawl round's discoveries), then run
    only 2 WARM-STARTED refinement iterations seeded from the old
    ranks — the 10^10-graph path where a cold power iteration per
    crawl round is the cost you must not pay. pytest proves warm-2
    lands closer to the new fixpoint than cold-2; the oracle replays
    base rounds + seeded refinement rounds exactly."""
    from biothings_crawler_spark.operators.pagerank import pagerank

    base = _hub_edges(spark, sf_dir)
    old = pagerank(base, iters=PR_ITERS)
    cyc = base.sparkSession.createDataFrame(BOWTIE_CYCLE,
                                            "src long, dst long")
    return pagerank(base.unionByName(cyc), iters=PR_INC_REFINE,
                    init_ranks=old)


def _sql_pagerank_incremental() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    base = 15 * PR_SCALE // 100
    cyc = " UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS src, CAST({b} AS BIGINT) AS dst"
        for a, b in BOWTIE_CYCLE
    )
    ctes = [
        _SQL_HUBGRAPH,
        f"""
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes)""",
    ]
    for i in range(PR_ITERS):
        ctes.append(f"""
r{i + 1} AS (
  SELECT n.node, CAST({base} + coalesce(s.in_sum, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((85 * r.rank) // (100 * d.deg)) AS in_sum
    FROM e JOIN deg d USING (src) JOIN r{i} r ON r.node = e.src
    GROUP BY e.dst) s USING (node))""")
    ctes.append(f"""
e2 AS (SELECT src, dst FROM e UNION ALL {cyc}),
nodes2 AS (SELECT DISTINCT node FROM
           (SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)),
deg2 AS (SELECT src, COUNT(*) AS deg FROM e2 GROUP BY src),
w0 AS (SELECT n.node,
              CAST(coalesce(r.rank, {PR_SCALE}) AS BIGINT) AS rank
       FROM nodes2 n LEFT JOIN r{PR_ITERS} r USING (node))""")
    for i in range(PR_INC_REFINE):
        ctes.append(f"""
w{i + 1} AS (
  SELECT n.node, CAST({base} + coalesce(s.in_sum, 0) AS BIGINT) AS rank
  FROM nodes2 n LEFT JOIN (
    SELECT e2.dst AS node, SUM((85 * r.rank) // (100 * d.deg)) AS in_sum
    FROM e2 JOIN deg2 d USING (src) JOIN w{i} r ON r.node = e2.src
    GROUP BY e2.dst) s USING (node))""")
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT node, rank FROM w{PR_INC_REFINE}")


SQL_PAGERANK_INCREMENTAL = _sql_pagerank_incremental()


def q_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode (operators/multimodal.decode_gif_features +
    operators/gifcodec): worker-synthesized GIF87a bytes decoded back
    through the block walk and a from-scratch variable-width LZW
    (CLEAR/EOI, width bumps, KwKwK, 12-bit resets). Lossless, so the
    oracle recomputes the features from the generator's closed-form
    pixel formula without seeing the bytes.  Ids divisible by 3 get a
    corrupted magic — must land in ``decode_err``, stage completing."""
    from biothings_crawler_spark.operators.multimodal import (
        decode_gif_features,
        gen_gif_media,
    )

    d = _t(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 9).select(
        F.col("doc_id").alias("media_id"))
    return decode_gif_features(gen_gif_media(ids, malformed_every=3))


SQL_GIF_DECODE = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 3 = 0 AS bad,
         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents WHERE doc_id % 10 = 9),
p AS (SELECT media_id, bad, w, h,
             list_transform(range(w * h),
               j -> (media_id * 29 + (j // w) * 11 + (j % w) * 5) % 256)
               AS pix
      FROM m)
SELECT media_id,
       CASE WHEN bad THEN NULL ELSE CAST(w AS INT) END AS width,
       CASE WHEN bad THEN NULL ELSE CAST(h AS INT) END AS height,
       CASE WHEN bad THEN NULL ELSE CAST(w * h AS BIGINT) END AS n_pixels,
       CASE WHEN bad THEN NULL
            ELSE CAST(list_sum(pix) AS BIGINT) END AS sum_gray,
       CASE WHEN bad THEN NULL ELSE CAST(list_min(pix) AS INT) END
         AS min_gray,
       CASE WHEN bad THEN NULL ELSE CAST(list_max(pix) AS INT) END
         AS max_gray,
       CASE WHEN bad THEN 'not a GIF header' ELSE NULL END AS decode_err
FROM p
"""


def q_host_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-space host-content overlap (operators/sketch.
    host_content_sketches + host_overlap_pairs): per-host bottom-64
    KMV sketches over synthetic page sets with engineered neighbor
    overlap, candidate pairs from the sketch-member join (no host x
    host product), theta intersection per pair. The content-based
    near-mirror detector at k rows per host. Fixture sets are below k
    so the estimator runs in exact mode here; the saturated regime is
    exercised by q_theta_overlap and pytest."""
    from biothings_crawler_spark.operators.sketch import (
        host_content_sketches,
        host_overlap_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    v = d.select(
        F.concat(F.lit("h"), (F.expr("doc_id div 40") % 12).cast("string"))
        .alias("host"),
        F.concat(F.lit("p"), (F.col("doc_id") % 70).cast("string"))
        .alias("page"),
    )
    sk = host_content_sketches(v, "host", "page", k=64)
    return host_overlap_pairs(sk, k=64, min_jaccard_ppm=100_000)


def _sql_host_overlap() -> str:
    from biothings_crawler_spark.operators.sketch import U60

    k = 64
    return f"""
WITH v AS (
  SELECT DISTINCT 'h' || CAST((doc_id // 40) % 12 AS VARCHAR) AS host,
         ('0x' || substr(md5('kmv:' ||
              ('p' || CAST(doc_id % 70 AS VARCHAR))), 1, 15))::BIGINT AS h
  FROM documents),
sk AS MATERIALIZED (
  SELECT host, h FROM (
    SELECT host, h, ROW_NUMBER() OVER (PARTITION BY host ORDER BY h) AS rn
    FROM v) WHERE rn <= {k}),
th AS (SELECT host,
              CASE WHEN COUNT(*) < {k} THEN CAST({U60} AS BIGINT)
                   ELSE MAX(h) END AS theta,
              CAST(COUNT(*) AS BIGINT) AS n_kept
       FROM sk GROUP BY host),
c AS (
  SELECT a.host AS host_a, b.host AS host_b, ta.theta AS ta,
         ta.n_kept AS na, tb.theta AS tb, tb.n_kept AS nb,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sk a JOIN sk b ON a.h = b.h AND a.host < b.host
  JOIN th ta ON ta.host = a.host
  JOIN th tb ON tb.host = b.host
  WHERE a.h < least(ta.theta, tb.theta)
  GROUP BY 1, 2, 3, 4, 5, 6),
est AS (
  SELECT host_a, host_b,
         CASE WHEN ta = {U60} THEN na
              ELSE CAST({k - 1}::HUGEINT * {U60} // ta AS BIGINT) END AS a_est,
         CASE WHEN tb = {U60} THEN nb
              ELSE CAST({k - 1}::HUGEINT * {U60} // tb AS BIGINT) END AS b_est,
         CAST(n_common::HUGEINT * {U60} // least(ta, tb) AS BIGINT)
           AS inter_est
  FROM c)
SELECT host_a, host_b, a_est, b_est, inter_est,
       CAST(inter_est::HUGEINT * 1000000
            // (a_est + b_est - inter_est) AS BIGINT) AS jaccard_ppm
FROM est
WHERE a_est + b_est - inter_est > 0
  AND inter_est::HUGEINT * 1000000 // (a_est + b_est - inter_est) >= 100000
"""


SQL_HOST_OVERLAP = _sql_host_overlap()


def q_lang_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-prior language smoothing (operators/text.
    smooth_lang_by_host): docs whose classifier says 'und' (planted:
    doc_id%6==0 gets marker-free digit soup) inherit their host's
    majority language from the confident docs' votes — the
    CommonCrawl-style site-level prior. One bounded argmax per host +
    a broadcast join; confident labels never overridden."""
    from biothings_crawler_spark.operators.text import (
        lang_id_col,
        smooth_lang_by_host,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.when(F.col("doc_id") % 6 == 0, F.lit("0 9 1 8 2 7 zz")) \
        .otherwise(F.col("text"))
    base = d.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 17).cast("string"))
        .alias("host"),
        lang_id_col(t).alias("lang"),
    )
    return smooth_lang_by_host(base, "id", "host", "lang")


SQL_LANG_SMOOTH = f"""
WITH m AS (
  SELECT doc_id AS id, 'h' || CAST(doc_id % 17 AS VARCHAR) AS host,
         CASE WHEN doc_id % 6 = 0 THEN '0 9 1 8 2 7 zz' ELSE text END AS text
  FROM documents),
l AS (
  SELECT id, host,
         len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_EN})) AS en,
         len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_DE})) AS de,
         len(list_intersect(list_distinct({_SQL_WORDS}), {_SQL_ES})) AS es
  FROM m),
langs AS (
  SELECT id, host,
         CASE WHEN en >= de AND en >= es AND en > 0 THEN 'en'
              WHEN de >= es AND de > 0 THEN 'de'
              WHEN es > 0 THEN 'es'
              ELSE 'und' END AS lang
  FROM l),
votes AS (
  SELECT host, lang AS hl, COUNT(*) AS n
  FROM langs WHERE lang <> 'und' GROUP BY 1, 2),
major AS (
  SELECT host, hl AS host_lang FROM votes
  QUALIFY ROW_NUMBER() OVER (PARTITION BY host ORDER BY n DESC, hl) = 1)
SELECT g.id, g.host, g.lang,
       CASE WHEN g.lang = 'und' AND m2.host_lang IS NOT NULL
            THEN m2.host_lang ELSE g.lang END AS lang_smoothed,
       (g.lang = 'und' AND m2.host_lang IS NOT NULL) AS from_host_prior
FROM langs g LEFT JOIN major m2 USING (host)
"""


def q_fetch_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain fairness index over per-host fetch counts (operators/
    politeness.fetch_fairness): exact-ppm J = (Σx)^2*10^6 div (n*Σx^2)
    via DECIMAL/HUGEINT intermediates — the politeness plane's
    one-number observability row. Hosts from events with a skewed
    long-tail (user_id % 60, plus a hot host taking every 5th event)."""
    from biothings_crawler_spark.operators.politeness import fetch_fairness

    ev = _t(spark, sf_dir, "events")
    host = F.when(F.col("event_id") % 5 == 0, F.lit("hot.example")) \
        .otherwise(F.concat(F.lit("h"), (F.col("user_id") % 60)
                            .cast("string")))
    return fetch_fairness(ev.select(host.alias("host")))


SQL_FETCH_FAIRNESS = """
WITH f AS (
  SELECT CASE WHEN event_id % 5 = 0 THEN 'hot.example'
              ELSE 'h' || CAST(user_id % 60 AS VARCHAR) END AS host
  FROM events),
per AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS x FROM f GROUP BY host)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(x) AS BIGINT) AS n_fetches,
       CAST(SUM(x)::HUGEINT * SUM(x) * 1000000
            // (COUNT(*) * SUM(x * x)::HUGEINT) AS BIGINT) AS jain_ppm
FROM per
"""


_DRIFT_PATHS = ["/pub/a", "/priv/x", "/priv2/y", "/docs/z", "/other"]


def q_robots_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots policy-drift triage (operators/politeness.robots_drift):
    19 hosts x 5 paths re-evaluated under old vs new rule sets — even
    hosts newly disallow /priv2 (-> revoke), h%3==0 hosts drop their
    /docs disallow (-> admit), everything else unchanged. The
    reconciliation pass a robots refetch must trigger; revoke rows
    feed seen.revoke_seen, admit rows re-enter the frontier."""
    from biothings_crawler_spark.operators.politeness import robots_drift

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 19)
    hid = F.col("doc_id")
    host = F.concat(F.lit("h"), hid.cast("string"))
    old = d.select(
        host.alias("host"),
        F.array(F.lit("/pub")).alias("allow"),
        F.when(hid % 3 == 0, F.array(F.lit("/priv"), F.lit("/docs")))
        .otherwise(F.array(F.lit("/priv"))).alias("disallow"),
    )
    new = d.select(
        host.alias("host"),
        F.array(F.lit("/pub")).alias("allow"),
        F.when(hid % 2 == 0, F.array(F.lit("/priv"), F.lit("/priv2")))
        .otherwise(F.array(F.lit("/priv"))).alias("disallow"),
    )
    paths = ", ".join(f"'{p}'" for p in _DRIFT_PATHS)
    cand = d.select(
        host.alias("host"), F.explode(F.expr(f"array({paths})")).alias("p")
    ).select("host", F.concat(F.lit("https://"), F.col("host"),
                              F.col("p")).alias("url_canon"))
    return robots_drift(cand, old, new).select(
        "host", "url_canon", "blocked_old", "blocked_new", "action"
    )


def _sql_robots_drift() -> str:
    paths = ", ".join(f"'{p}'" for p in _DRIFT_PATHS)

    def dec(rules_cte: str, flag: str) -> str:
        alen = ("coalesce(list_max(list_transform(list_filter(r.al, "
                "x -> starts_with(c.p, x)), x -> len(x))), 0)")
        dlen = ("coalesce(list_max(list_transform(list_filter(r.dl, "
                "x -> starts_with(c.p, x)), x -> len(x))), 0)")
        return f"""
  SELECT c.host, c.url_canon,
         (r.dl IS NOT NULL AND {dlen} > {alen} AND {dlen} > 0) AS {flag}
  FROM cand c LEFT JOIN {rules_cte} r ON c.host = r.host"""

    return f"""
WITH h AS (SELECT doc_id AS hid, 'h' || CAST(doc_id AS VARCHAR) AS host
           FROM documents WHERE doc_id < 19),
old_r AS (SELECT host, ['/pub'] AS al,
                 CASE WHEN hid % 3 = 0 THEN ['/priv', '/docs']
                      ELSE ['/priv'] END AS dl FROM h),
new_r AS (SELECT host, ['/pub'] AS al,
                 CASE WHEN hid % 2 = 0 THEN ['/priv', '/priv2']
                      ELSE ['/priv'] END AS dl FROM h),
cand AS (SELECT host, p, 'https://' || host || p AS url_canon
         FROM h, unnest([{paths}]) AS t(p)),
d_old AS ({dec("old_r", "blocked_old")}),
d_new AS ({dec("new_r", "blocked_new")})
SELECT c.host, c.url_canon, o.blocked_old, n.blocked_new,
       CASE WHEN NOT o.blocked_old AND n.blocked_new THEN 'revoke'
            WHEN o.blocked_old AND NOT n.blocked_new THEN 'admit'
            ELSE 'unchanged' END AS action
FROM cand c
JOIN d_old o ON o.host = c.host AND o.url_canon = c.url_canon
JOIN d_new n ON n.host = c.host AND n.url_canon = c.url_canon
"""


SQL_ROBOTS_DRIFT = _sql_robots_drift()


def q_hll_by_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host HLL distinct-URL estimates (operators/sketch.
    hll_distinct_by): the host-size census at sketch cost — state is
    <= 256 registers per host, never the host's page count. Fixture
    hosts land in the linear-counting regime (the raw regime is
    covered by q_hll_distinct); estimates are integer-exact cross-
    engine like the global sketch."""
    from biothings_crawler_spark.operators.sketch import hll_distinct_by

    o = _t(spark, sf_dir, "orders")
    v = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 40).cast("string"))
        .alias("host"),
        F.concat(F.lit("u"), (F.col("o_orderkey") % 500).cast("string"))
        .alias("url"),
    )
    return hll_distinct_by(v, "host", "url")


def _sql_hll_by_host() -> str:
    from biothings_crawler_spark.operators.sketch import (
        ALPHA_PPM,
        HLL_M,
        LC_CUTOFF,
        LC_LUT,
        RHO_CAP,
    )

    lut = ", ".join(str(x) for x in LC_LUT)
    return f"""
WITH vals AS (
  SELECT 'h' || CAST(o_custkey % 40 AS VARCHAR) AS grp,
         'u' || CAST(o_orderkey % 500 AS VARCHAR) AS v
  FROM orders),
hh AS (SELECT grp, md5(v) AS h FROM vals),
rr AS (SELECT grp,
              ('0x' || substr(h, 1, 2))::BIGINT AS bucket,
              LEAST(CASE WHEN ('0x' || substr(h, 3, 13))::BIGINT > 0
                         THEN 53 - length(bin(('0x' || substr(h, 3, 13))::BIGINT))
                         ELSE {RHO_CAP} END, {RHO_CAP}) AS rho
       FROM hh),
regs AS (SELECT grp, bucket, MAX(rho) AS r FROM rr GROUP BY 1, 2),
z AS (SELECT grp,
             CAST(SUM(1::BIGINT << ({RHO_CAP} - r))
                  + ({HLL_M} - COUNT(*)) * (1::BIGINT << {RHO_CAP})
                  AS BIGINT) AS z,
             CAST({HLL_M} - COUNT(*) AS BIGINT) AS v_empty
      FROM regs GROUP BY grp),
raw AS (SELECT grp,
               CAST({ALPHA_PPM} * ({HLL_M * HLL_M} * (1::BIGINT << {RHO_CAP})
                    // z) // 1000000 AS BIGINT) AS raw_est, v_empty
        FROM z)
SELECT grp AS host,
       CAST(CASE WHEN raw_est <= {LC_CUTOFF} AND v_empty > 0
            THEN list_extract([{lut}], CAST(v_empty AS INT))
            ELSE raw_est END AS BIGINT) AS estimate
FROM raw
"""


SQL_HLL_BY_HOST = _sql_hll_by_host()


def q_priority_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier priority fusion (operators/frontier.fuse_priority):
    authority (real pagerank over the hub graph) + staleness +
    relevance planes normalized to exact ppm and weight-fused into the
    single integer priority the politeness window orders by. URLs
    present in only some planes contribute 0 elsewhere (exercised:
    staleness/relevance cover only id%2==0 / id%3==0 slices)."""
    from biothings_crawler_spark.operators.frontier import fuse_priority
    from biothings_crawler_spark.operators.pagerank import pagerank

    url = lambda c: F.concat(F.lit("https://x/p/"), c.cast("string"))  # noqa: E731
    auth = pagerank(_hub_edges(spark, sf_dir), iters=PR_ITERS).select(
        url(F.col("node")).alias("url_canon"), "rank")
    d = _t(spark, sf_dir, "documents")
    stale = d.filter(F.col("doc_id") % 2 == 0).select(
        url(F.col("doc_id")).alias("url_canon"),
        ((F.col("doc_id") * 37) % 100000).cast("long").alias("stale_s"))
    rel = d.filter(F.col("doc_id") % 3 == 0).select(
        url(F.col("doc_id")).alias("url_canon"),
        ((F.col("doc_id") * 11) % 1000000).cast("long").alias("rel_ppm"))
    return fuse_priority(auth, stale, rel)


def _sql_priority_fusion() -> str:
    # reuse the unrolled pagerank chain verbatim as a derived table
    return f"""
WITH pr AS (SELECT * FROM ({SQL_PAGERANK}) t),
a AS (SELECT 'https://x/p/' || CAST(node AS VARCHAR) AS url_canon,
             rank AS a FROM pr),
s AS (SELECT 'https://x/p/' || CAST(doc_id AS VARCHAR) AS url_canon,
             CAST((doc_id * 37) % 100000 AS BIGINT) AS s
      FROM documents WHERE doc_id % 2 = 0),
r AS (SELECT 'https://x/p/' || CAST(doc_id AS VARCHAR) AS url_canon,
             CAST((doc_id * 11) % 1000000 AS BIGINT) AS r
      FROM documents WHERE doc_id % 3 = 0),
j AS (SELECT COALESCE(a.url_canon, s.url_canon, r.url_canon) AS url_canon,
             COALESCE(a.a, 0) AS a, COALESCE(s.s, 0) AS s,
             COALESCE(r.r, 0) AS r
      FROM a FULL OUTER JOIN s ON a.url_canon = s.url_canon
      FULL OUTER JOIN r ON COALESCE(a.url_canon, s.url_canon) = r.url_canon),
mx AS (SELECT greatest(MAX(a), 1) AS ma, greatest(MAX(s), 1) AS ms,
              greatest(MAX(r), 1) AS mr FROM j),
f AS (SELECT url_canon,
             CAST((40 * (a::HUGEINT * 1000000 // ma)
                   + 30 * (s::HUGEINT * 1000000 // ms)
                   + 30 * (r::HUGEINT * 1000000 // mr)) // 100
                  AS BIGINT) AS fused_ppm
      FROM j, mx)
SELECT url_canon, fused_ppm,
       CAST(1000000 - fused_ppm AS BIGINT) AS priority
FROM f
"""


SQL_PRIORITY_FUSION = _sql_priority_fusion()


def q_graph_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-graph structural census (operators/pagerank.graph_census)
    over the hub graph plus planted reciprocal pairs (the bow-tie
    cycle and its reverses): node/edge/self-loop counts, reciprocity
    ppm, degree maxima, density ppb — Broder-table-1 numbers, exact
    integers."""
    from biothings_crawler_spark.operators.pagerank import graph_census

    cyc = spark.createDataFrame(
        BOWTIE_CYCLE + [(b, a) for a, b in BOWTIE_CYCLE],
        "src long, dst long")
    return graph_census(_hub_edges(spark, sf_dir).unionByName(cyc))


def _sql_graph_census() -> str:
    cyc = " UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS src, CAST({b} AS BIGINT) AS dst"
        for a, b in BOWTIE_CYCLE + [(b, a) for a, b in BOWTIE_CYCLE]
    )
    return f"""
WITH {_SQL_HUBGRAPH},
e2 AS (SELECT DISTINCT src, dst FROM
       (SELECT src, dst FROM e UNION ALL {cyc})),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)),
rc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_recip FROM e2 a
       WHERE EXISTS (SELECT 1 FROM e2 b
                     WHERE b.src = a.dst AND b.dst = a.src)),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_self_loops
        FROM e2),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
mo AS (SELECT CAST(MAX(d) AS BIGINT) AS max_out FROM
       (SELECT COUNT(*) AS d FROM e2 GROUP BY src)),
mi AS (SELECT CAST(MAX(d) AS BIGINT) AS max_in FROM
       (SELECT COUNT(*) AS d FROM e2 GROUP BY dst))
SELECT n_nodes, n_edges, n_self_loops,
       CAST(n_recip * 1000000 // n_edges AS BIGINT) AS reciprocity_ppm,
       max_out, max_in,
       CAST(n_edges::HUGEINT * 1000000000
            // (n_nodes::HUGEINT * n_nodes) AS BIGINT) AS density_ppb
FROM nn, agg, rc, mo, mi
"""


SQL_GRAPH_CENSUS = _sql_graph_census()


CURRICULUM_BUDGETS = {"head": 30000, "middle": 20000, "tail": 10000}


def q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum corpus staging — the composition a staged pretraining
    run needs: per-language quality TERCILES (operators/lm.
    tercile_cutoffs + bucket_by_terciles) assign each doc a stage, then
    each stage takes its own TOKEN budget quality-first (operators/
    sampling.select_token_budget, the banded no-global-sort plan).
    Output: (id, lang, score_ppm, n_tok, stage, cum_tokens) for the
    selected docs. One DuckDB statement verifies the whole composition
    (the naive per-stage running-sum twin)."""
    from biothings_crawler_spark.operators.lm import (
        bucket_by_terciles,
        tercile_cutoffs,
    )
    from biothings_crawler_spark.operators.sampling import (
        select_token_budget,
    )

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        F.col("doc_id").alias("id"),
        "lang",
        ((F.col("doc_id") * 7919) % 1000001).cast("long").alias("score_ppm"),
        F.expr("n_chars div 4").cast("long").alias("n_tok"),
    )
    cuts = tercile_cutoffs(scored, "lang")
    staged = bucket_by_terciles(scored, cuts, "lang") \
        .withColumnRenamed("bucket", "stage").localCheckpoint(eager=True)
    parts = []
    for stage, budget in CURRICULUM_BUDGETS.items():
        sel = select_token_budget(
            staged.filter(F.col("stage") == stage)
            .select("id", "lang", "score_ppm", "n_tok"),
            "id", "n_tok", "score_ppm", budget,
        )
        parts.append(sel.withColumn("stage", F.lit(stage)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("id", "lang", "score_ppm", "n_tok", "stage",
                      F.col("cum_tokens").cast("long").alias("cum_tokens"))


def _sql_curriculum() -> str:
    budgets = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in CURRICULUM_BUDGETS.items())
    return f"""
WITH sc AS (
  SELECT doc_id AS id, lang,
         CAST((doc_id * 7919) % 1000001 AS BIGINT) AS score_ppm,
         CAST(n_chars // 4 AS BIGINT) AS n_tok
  FROM documents),
sb AS (SELECT *, score_ppm // 1000 AS bin FROM sc),
hist AS (SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM sb GROUP BY 1, 2),
cum AS (SELECT lang, bin,
               CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bin DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM hist),
tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
cut AS (SELECT lang,
               MAX(CASE WHEN cum >= greatest(n // 3, 1) THEN bin END)
                 AS head_bin,
               MAX(CASE WHEN cum >= greatest((2 * n) // 3, 1) THEN bin END)
                 AS mid_bin
        FROM cum JOIN tot USING (lang) GROUP BY lang),
staged AS (
  SELECT sb.id, sb.lang, sb.score_ppm, sb.n_tok,
         CASE WHEN sb.bin >= c.head_bin THEN 'head'
              WHEN sb.bin >= c.mid_bin THEN 'middle'
              ELSE 'tail' END AS stage
  FROM sb JOIN cut c USING (lang)),
run AS (
  SELECT *,
         CAST(SUM(n_tok) OVER (PARTITION BY stage
              ORDER BY score_ppm DESC, id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM staged)
SELECT id, lang, score_ppm, n_tok, stage, cum_tokens
FROM run
WHERE cum_tokens <= CASE stage {budgets} END
"""


SQL_CURRICULUM = _sql_curriculum()


def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (operators/serving.
    rrf_fuse, Cormack et al. SIGIR 2009): the integer-BM25 lexical
    top-20 fused with the ANN cosine top-20 for query vector 0 —
    documents and embeddings share the id domain, so this is the
    standard two-tower hybrid merge, rank-based and exact."""
    from pyspark.sql import Window as W

    from biothings_crawler_spark.operators.bm25 import bm25_topk
    from biothings_crawler_spark.operators.serving import rrf_fuse
    from biothings_crawler_spark.operators.similarity import brute_force_topk

    lex = bm25_topk(_t(spark, sf_dir, "documents"), "doc_id", "text",
                    BM25_QUERY, k=20)
    lex = lex.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score"), "id"))
    ).select("id", "rank")
    e = _t(spark, sf_dir, "embeddings")
    sem = brute_force_topk(e, e.filter(F.col("vec_id") == 0),
                           "vec_id", "embedding", k=20) \
        .select(F.col("vec_id").alias("id"), "rank")
    return rrf_fuse([lex, sem])


SQL_RRF_HYBRID = f"""
WITH lex AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT)
           AS rank
  FROM ({SQL_BM25_TOPK}) t),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sc AS (SELECT vec_id AS id, {_sql_cosine('qv', 'embedding')} AS cosine
       FROM embeddings, q),
sem AS (
  SELECT id, CAST(rn AS BIGINT) AS rank
  FROM (SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rn
        FROM sc)
  WHERE rn <= 20),
u AS (SELECT id, rank FROM lex UNION ALL SELECT id, rank FROM sem)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_lists,
       CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm
FROM u GROUP BY id
"""


def q_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between the lexical (integer BM25) and semantic
    (ANN cosine) top-20 rankings (operators/serving.rank_correlation)
    — the ranker-agreement diagnostic behind hybrid-search tuning.
    Exact ppm over the common ids; bounded k^2 pair enumeration."""
    from pyspark.sql import Window as W

    from biothings_crawler_spark.operators.bm25 import bm25_topk
    from biothings_crawler_spark.operators.serving import rank_correlation
    from biothings_crawler_spark.operators.similarity import brute_force_topk

    lex = bm25_topk(_t(spark, sf_dir, "documents"), "doc_id", "text",
                    BM25_QUERY, k=20)
    lex = lex.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score"), "id"))
    ).select("id", "rank")
    e = _t(spark, sf_dir, "embeddings")
    sem = brute_force_topk(e, e.filter(F.col("vec_id") == 0),
                           "vec_id", "embedding", k=20) \
        .select(F.col("vec_id").alias("id"), "rank")
    return rank_correlation(lex, sem)


SQL_RANK_CORRELATION = f"""
WITH lex AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT)
           AS ra
  FROM ({SQL_BM25_TOPK}) t),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sc AS (SELECT vec_id AS id, {_sql_cosine('qv', 'embedding')} AS cosine
       FROM embeddings, q),
sem AS (
  SELECT id, CAST(rn AS BIGINT) AS rb
  FROM (SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rn
        FROM sc)
  WHERE rn <= 20),
j AS (SELECT lex.id, ra, rb FROM lex JOIN sem USING (id)),
pairs AS (
  SELECT CASE WHEN (l.ra < r.ra AND l.rb < r.rb)
                OR (l.ra > r.ra AND l.rb > r.rb) THEN 1 ELSE -1 END AS sgn
  FROM j l JOIN j r ON l.id < r.id),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(sgn), 0) AS BIGINT) AS s FROM pairs),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM j)
SELECT n_common, n_pairs,
       CAST(CASE WHEN n_pairs = 0 THEN 0
                 WHEN s < 0 THEN -(((-s) * 1000000) // n_pairs)
                 ELSE (s * 1000000) // n_pairs END AS BIGINT) AS tau_ppm
FROM m, agg
"""


SPELL_TERMS = ["scann", "colum", "joln", "spark", "zzzzqq"]


def q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did-you-mean suggestions (operators/serving.spell_suggest,
    FastSS deletion-neighborhood index — Bocek et al. 2007) for five
    query terms against the corpus vocabulary: one exact term, three
    edit-distance-1 misspellings (insertion / deletion /
    substitution), one no-match control.  The oracle re-derives the
    suggestions INDEPENDENTLY by brute force: DuckDB cross-joins the
    query terms with the full vocabulary and keeps levenshtein <= 1 —
    exhaustive truth, so the banded index's recall is checked too."""
    from biothings_crawler_spark.operators.serving import spell_suggest

    return spell_suggest(
        _t(spark, sf_dir, "documents"), "doc_id", "text", SPELL_TERMS, k=5)


SQL_SPELL_SUGGEST = f"""
WITH w AS (
  SELECT DISTINCT id, term
  FROM (SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents)),
v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS term_df FROM w GROUP BY term),
q AS (SELECT unnest(['scann', 'colum', 'joln', 'spark', 'zzzzqq']) AS q),
cand AS (
  SELECT q, term AS suggestion,
         CAST(levenshtein(q, term) AS BIGINT) AS dist, term_df
  FROM q, v WHERE levenshtein(q, term) <= 1),
r AS (SELECT *, row_number()
        OVER (PARTITION BY q ORDER BY dist, term_df DESC, suggestion) AS rn
      FROM cand)
SELECT q, suggestion, dist, term_df, CAST(rn AS BIGINT) AS rank
FROM r WHERE rn <= 5
"""


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (operators/pagerank.degree_assortativity,
    Newman PRL 2002) of the hub graph — exact ppm: undirected
    symmetry collapses Pearson to a rational, no sqrt, decimal(38,0)
    products, DuckDB-matched negative flooring.  Hub graphs are
    disassortative (r < 0): big hubs collect small pages."""
    from biothings_crawler_spark.operators.pagerank import (
        degree_assortativity)

    return degree_assortativity(_hub_edges(spark, sf_dir))


SQL_ASSORTATIVITY = f"""
WITH {_SQL_HUBGRAPH},
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node),
keyed AS (
  SELECT da.deg AS da, db.deg AS db
  FROM und JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b),
tot AS (
  SELECT CAST(2 * COUNT(*) AS BIGINT) AS m2,
         CAST(2 * SUM(CAST(da AS HUGEINT) * db) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(da AS HUGEINT) + db) AS HUGEINT) AS sx,
         CAST(SUM(CAST(da AS HUGEINT) * da + CAST(db AS HUGEINT) * db)
              AS HUGEINT) AS sxx
  FROM keyed)
SELECT m2, CAST(sxy AS BIGINT) AS sxy, CAST(sx AS BIGINT) AS sx,
       CAST(sxx AS BIGINT) AS sxx,
       CAST(CASE WHEN m2 * sxx - sx * sx = 0 THEN 0
                 WHEN m2 * sxy - sx * sx < 0
                 THEN -((-(m2 * sxy - sx * sx)) * 1000000
                        // (m2 * sxx - sx * sx))
                 ELSE (m2 * sxy - sx * sx) * 1000000
                      // (m2 * sxx - sx * sx) END AS BIGINT) AS r_ppm
FROM tot
"""


BLOCKMAX_K, BLOCKMAX_CHUNK = 10, 64


def q_blockmax_skips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-Max WAND pruning evidence (operators/bm25.blockmax_report,
    Ding & Suel SIGIR 2011): per (query term, 64-doc posting chunk)
    the block-max term score and a proof-exact skippable flag at the
    top-10 exhaustive threshold — block_max + sum of OTHER terms'
    global maxima < theta.  The fixture plants a saturation region
    (chunk 5 repeats the query terms 25x) so the top-k heap fills with
    near-maximal docs and REMOTE chunks become provably skippable (21
    of 24 at sf0.01) while the region's own chunks stay hot — both
    branches of the flag exercised.  Oracle re-derives block maxima,
    theta, and the flag from the shared integer kernel."""
    from biothings_crawler_spark.operators.bm25 import blockmax_report

    d = _t(spark, sf_dir, "documents")
    boosted = d.select(
        "doc_id",
        F.when(F.expr(f"doc_id div {BLOCKMAX_CHUNK}") == 5,
               F.concat(F.col("text"),
                        F.expr("repeat(' data table spark', 25)")))
        .otherwise(F.col("text")).alias("text"))
    return blockmax_report(
        boosted, "doc_id", "text", BM25_QUERY,
        k=BLOCKMAX_K, chunk_range=BLOCKMAX_CHUNK)


SQL_BLOCKMAX_SKIPS = f"""
WITH raw AS (
  SELECT doc_id, CASE WHEN doc_id // {BLOCKMAX_CHUNK} = 5
    THEN text || repeat(' data table spark', 25) ELSE text END AS text
  FROM documents),
docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM raw),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY id, term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.id, tf.term,
         ((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tf.tf * t.w_total
           // (20 * tf.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)
           AS term_score
  FROM tf JOIN dfq d USING (term) JOIN lens l ON l.id = tf.id CROSS JOIN tot t),
blocks AS (
  SELECT term, id // {BLOCKMAX_CHUNK} AS chunk_no,
         CAST(COUNT(*) AS BIGINT) AS df_chunk,
         CAST(MAX(term_score) AS BIGINT) AS block_max
  FROM sc GROUP BY term, id // {BLOCKMAX_CHUNK}),
gmax AS (SELECT term, CAST(MAX(term_score) AS BIGINT) AS g_max
         FROM sc GROUP BY term),
gsum AS (SELECT CAST(SUM(g_max) AS BIGINT) AS g_sum FROM gmax),
theta AS (
  SELECT CAST(MIN(s) AS BIGINT) AS theta FROM (
    SELECT SUM(term_score) AS s FROM sc GROUP BY id
    ORDER BY s DESC, id LIMIT {BLOCKMAX_K}))
SELECT b.term, CAST(b.chunk_no AS BIGINT) AS chunk_no, b.df_chunk,
       b.block_max,
       CAST(b.block_max + g.g_sum - m.g_max AS BIGINT) AS upper_bound,
       CAST(CASE WHEN b.block_max + g.g_sum - m.g_max < t.theta
                 THEN 1 ELSE 0 END AS BIGINT) AS skippable
FROM blocks b JOIN gmax m USING (term), gsum g, theta t
"""


QUANTILE_PPMS = [500000, 900000, 990000, 1000000]


def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99/p100 of a synthetic per-event latency
    (operators/quantiles.exact_quantiles): distributed selection by
    iterative <=1024-bin histogram narrowing — O(log_B range) passes
    of bounded hash aggs, no sort, no sketch error.  Oracle = the same
    integer rank contract against a full ORDER BY."""
    from biothings_crawler_spark.operators.quantiles import exact_quantiles

    lat = _t(spark, sf_dir, "events").select(
        ((F.col("event_id") * 2654435761) % 1000003).alias("lat_us"))
    return exact_quantiles(lat, "lat_us", QUANTILE_PPMS)


SQL_EXACT_QUANTILES = """
WITH v AS (SELECT (event_id * 2654435761) % 1000003 AS x FROM events),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
q AS (SELECT unnest([500000, 900000, 990000, 1000000]) AS q_ppm),
k AS (SELECT CAST(q_ppm AS BIGINT) AS q_ppm, n,
             CAST(GREATEST(1, LEAST(n, (q_ppm * n + 999999) // 1000000))
                  AS BIGINT) AS rank
      FROM q, n),
s AS (SELECT x, row_number() OVER (ORDER BY x) AS r FROM v)
SELECT k.q_ppm, k.n, k.rank, CAST(s.x AS BIGINT) AS value
FROM k JOIN s ON s.r = k.rank
"""


AUTOCOMPLETE_PREFIXES = ["s", "ta", "w", "zzz"]


def q_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-box prefix completion (operators/serving.autocomplete,
    most-popular-completion): top-5 vocabulary completions per prefix
    by document frequency.  Prefix list broadcasts into a startswith
    theta-join against the vocab hash agg; per-prefix top-k is a
    WindowGroupLimit.  Oracle = LIKE prefix match + QUALIFY in SQL."""
    from biothings_crawler_spark.operators.serving import autocomplete

    return autocomplete(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        AUTOCOMPLETE_PREFIXES, k=5)


SQL_AUTOCOMPLETE = f"""
WITH w AS (
  SELECT DISTINCT id, term
  FROM (SELECT doc_id AS id, unnest({_SQL_WORDS}) AS term FROM documents)),
v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS term_df FROM w GROUP BY term),
p AS (SELECT unnest(['s', 'ta', 'w', 'zzz']) AS prefix),
cand AS (
  SELECT prefix, term AS completion, term_df
  FROM v JOIN p ON v.term LIKE p.prefix || '%'),
r AS (SELECT *, row_number() OVER (
        PARTITION BY prefix ORDER BY term_df DESC, completion) AS rn
      FROM cand)
SELECT prefix, completion, term_df, CAST(rn AS BIGINT) AS rank
FROM r WHERE rn <= 5
"""


SALSA_ITERS = 3


def q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA authorities (operators/pagerank.salsa_authorities, Lempel
    & Moran WWW 2000) over the hub graph: 3 alternating back/forward
    degree-normalized rounds — the TKC-resistant hub/authority
    variant. Integer micro-units; oracle replays both half-steps per
    round."""
    from biothings_crawler_spark.operators.pagerank import salsa_authorities

    return salsa_authorities(_hub_edges(spark, sf_dir), iters=SALSA_ITERS)


def _sql_salsa() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    ctes = [
        _SQL_HUBGRAPH,
        f"""
ind AS MATERIALIZED (SELECT dst, COUNT(*) AS indeg FROM e GROUP BY dst),
outd AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
a0 AS MATERIALIZED (SELECT dst AS node,
                    CAST(indeg * {PR_SCALE} AS BIGINT) AS a FROM ind)""",
    ]
    for i in range(SALSA_ITERS):
        ctes.append(f"""
h{i} AS MATERIALIZED (
  SELECT e.src, CAST(SUM(a.a // i2.indeg) AS BIGINT) AS m
  FROM e JOIN a{i} a ON a.node = e.dst JOIN ind i2 ON i2.dst = e.dst
  GROUP BY e.src),
a{i + 1} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(h.m // o.outdeg) AS BIGINT) AS a
  FROM e JOIN h{i} h ON h.src = e.src JOIN outd o ON o.src = e.src
  GROUP BY e.dst)""")
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT node, a AS authority FROM a{SALSA_ITERS}")


SQL_SALSA = _sql_salsa()


OPIC_GREEDY_ROUNDS = 3
OPIC_GREEDY_B = 64


def q_opic_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC's adaptive greedy schedule (operators/pagerank.opic_greedy):
    3 rounds of fetch-the-top-64-by-cash over the hub graph — the
    fetch set IS the crawl schedule, history banks only where the
    crawler went. Deterministic ties (cash desc, node asc), so the
    oracle replays every round's selection and cash flow exactly."""
    from biothings_crawler_spark.operators.pagerank import opic_greedy

    return opic_greedy(_hub_edges(spark, sf_dir),
                       rounds=OPIC_GREEDY_ROUNDS,
                       fetch_per_round=OPIC_GREEDY_B)


def _sql_opic_greedy() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    B = OPIC_GREEDY_B
    ctes = [
        _SQL_HUBGRAPH,
        f"""
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
s0 AS MATERIALIZED (SELECT node, CAST({PR_SCALE} AS BIGINT) AS cash,
                    CAST(0 AS BIGINT) AS hist,
                    CAST(0 AS BIGINT) AS n_fetched FROM nodes)""",
    ]
    for i in range(OPIC_GREEDY_ROUNDS):
        ctes.append(f"""
f{i} AS MATERIALIZED (
  SELECT node AS fnode, cash AS fcash FROM s{i}
  QUALIFY ROW_NUMBER() OVER (ORDER BY cash DESC, node) <= {B}),
c{i} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(f.fcash // d.deg) AS BIGINT) AS in_sum
  FROM e JOIN deg d USING (src) JOIN f{i} f ON f.fnode = e.src
  GROUP BY e.dst),
dg{i} AS (
  SELECT CAST(COALESCE(SUM(fcash), 0) AS BIGINT) AS dang
  FROM f{i} WHERE fnode NOT IN (SELECT src FROM deg)),
s{i + 1} AS MATERIALIZED (
  SELECT s.node,
         CAST(CASE WHEN f.fnode IS NOT NULL THEN 0 ELSE s.cash END
              + COALESCE(c.in_sum, 0)
              + (SELECT dang FROM dg{i}) // (SELECT n_nodes FROM nn)
              AS BIGINT) AS cash,
         CAST(s.hist + CASE WHEN f.fnode IS NOT NULL
                            THEN s.cash ELSE 0 END AS BIGINT) AS hist,
         CAST(s.n_fetched + CASE WHEN f.fnode IS NOT NULL
                                 THEN 1 ELSE 0 END AS BIGINT) AS n_fetched
  FROM s{i} s
  LEFT JOIN f{i} f ON f.fnode = s.node
  LEFT JOIN c{i} c ON c.node = s.node)""")
    last = f"s{OPIC_GREEDY_ROUNDS}"
    return ("WITH " + ",".join(ctes) + f"""
SELECT node, hist, cash, n_fetched,
       CAST(hist + cash AS BIGINT) AS importance
FROM {last}""")


SQL_OPIC_GREEDY = _sql_opic_greedy()


OPIC_ITERS = 4


def q_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC on-line page importance (operators/pagerank.opic, Abiteboul
    et al. WWW 2003) over the shared hub graph: 4 synchronous cash
    rounds with virtual-root dangling redistribution (node 0 is
    dangling by construction — both its self-edges drop — so the
    uniform return path is exercised). Integer micro-units, exact."""
    from biothings_crawler_spark.operators.pagerank import opic

    return opic(_hub_edges(spark, sf_dir), iters=OPIC_ITERS)


def _sql_opic() -> str:
    from biothings_crawler_spark.operators.pagerank import PR_SCALE

    ctes = [
        _SQL_HUBGRAPH,
        """
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)""",
        f"""
s0 AS MATERIALIZED (SELECT node, CAST({PR_SCALE} AS BIGINT) AS cash,
                    CAST(0 AS BIGINT) AS hist FROM nodes)""",
    ]
    for i in range(OPIC_ITERS):
        ctes.append(f"""
c{i} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(s.cash // d.deg) AS BIGINT) AS in_sum
  FROM e JOIN deg d USING (src) JOIN s{i} s ON s.node = e.src
  GROUP BY e.dst),
dg{i} AS (
  SELECT CAST(COALESCE(SUM(cash), 0) AS BIGINT) AS dang
  FROM s{i} WHERE node NOT IN (SELECT src FROM deg)),
s{i + 1} AS MATERIALIZED (
  SELECT n.node,
         CAST(COALESCE(c.in_sum, 0)
              + (SELECT dang FROM dg{i}) // (SELECT n_nodes FROM nn)
              AS BIGINT) AS cash,
         CAST(s.hist + s.cash AS BIGINT) AS hist
  FROM nodes n
  LEFT JOIN c{i} c USING (node)
  JOIN s{i} s USING (node))""")
    last = f"s{OPIC_ITERS}"
    return ("WITH " + ",".join(ctes) + f"""
SELECT node, hist, cash, CAST(hist + cash AS BIGINT) AS importance
FROM {last}""")


SQL_OPIC = _sql_opic()


KMEANS_K = 10
KMEANS_ROUNDS = 4


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the 8-bit quantized embeddings (operators/
    clustering.kmeans_lloyd): md5-sample init, 4 full Lloyd rounds
    (broadcast-fold assignment, integer floor-mean update, empty-cell
    carryover), exact BIGINT distances — the iterative algorithm
    itself is oracle-verified round for round, not just one step.
    k = 10 matches the fixture's label count; the labels are only
    weakly separable by construction (nearest-true-centroid accuracy
    ~0.37 on raw floats), so pytest asserts the algorithmic invariants
    instead: monotone Lloyd objective, exact convergence on a planted
    two-blob input, zero-shuffle assignment plan."""
    from biothings_crawler_spark.operators.clustering import kmeans_lloyd
    from biothings_crawler_spark.operators.quantize import quantize_embeddings

    qt = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return kmeans_lloyd(qt, KMEANS_K, KMEANS_ROUNDS)


def _sql_kmeans() -> str:
    d2 = ("list_reduce(list_transform(range(64), "
          "j -> (q.v[j+1] - c.cv[j+1]) * (q.v[j+1] - c.cv[j+1])), "
          "(x, y) -> x + y)")
    ctes = [f"""
mm AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS vmin,
         CAST(list_max(embedding) AS DOUBLE) AS vmax
  FROM embeddings),
qv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(CAST(CASE WHEN vmax - vmin > 0
                     THEN floor((CAST(x AS DOUBLE) - vmin) * 255
                                / (vmax - vmin) + 0.5)
                     ELSE 0 END AS INT) AS BIGINT)) AS v
  FROM mm),
c0 AS MATERIALIZED (
  SELECT vec_id AS cell, v AS cv FROM qv
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {KMEANS_K})"""]
    # each round: assignment (argmin via QUALIFY), per-(cell,pos) sums,
    # integer floor-mean reassembly, empty-cell carryover — MATERIALIZED
    # so DuckDB cannot inline the round chain into an exponential scan
    # tree (the q_kcore lesson).
    for i in range(KMEANS_ROUNDS):
        ctes.append(f"""
a{i} AS MATERIALIZED (
  SELECT q.vec_id, q.v, c.cell, {d2} AS d2
  FROM qv q CROSS JOIN c{i} c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY d2, c.cell) = 1),
g{i} AS MATERIALIZED (
  SELECT cell, pos, CAST(SUM(val) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        FROM a{i})
  GROUP BY 1, 2),
n{i} AS MATERIALIZED (
  SELECT cell, list(m ORDER BY pos) AS cv
  FROM (SELECT cell, pos,
               CAST((s - ((s % cnt) + cnt) % cnt) // cnt AS BIGINT) AS m
        FROM g{i})
  GROUP BY cell),
c{i + 1} AS MATERIALIZED (
  SELECT cell, cv FROM n{i}
  UNION ALL
  SELECT cell, cv FROM c{i} WHERE cell NOT IN (SELECT cell FROM n{i}))""")
    last = f"c{KMEANS_ROUNDS}"
    return ("WITH " + ",".join(ctes) + f"""
SELECT q.vec_id, c.cell, CAST({d2} AS BIGINT) AS dist2
FROM qv q CROSS JOIN {last} c
QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY dist2, c.cell) = 1
""")


SQL_KMEANS = _sql_kmeans()


TREND_MIN_COUNT = 8


def q_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot term drift (operators/text.trending_terms):
    snapshots synthesized as doc_id %% 2 (0 = old crawl, 1 = new),
    add-one-smoothed integer frequency-ratio score in ppm, min_count
    band = 8.  Oracle replays the explode + conditional agg + totals
    join and the identical div-chain in DuckDB."""
    from biothings_crawler_spark.operators.text import trending_terms

    d = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).cast("long").alias("snap"), "text"
    )
    return trending_terms(d, "snap", "text", min_count=TREND_MIN_COUNT)


SQL_TRENDING_TERMS = f"""
WITH toks AS (
  SELECT doc_id % 2 AS snap, unnest({_SQL_WORDS}) AS term FROM documents),
per AS (
  SELECT term,
         CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_old,
         CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_new
  FROM toks GROUP BY term),
tot AS (
  SELECT CAST(SUM(c_old) AS BIGINT) AS tot_old,
         CAST(SUM(c_new) AS BIGINT) AS tot_new,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM per)
SELECT term, c_old, c_new,
       CAST((((c_new + 1) * 1000000 // (c_old + 1))
             * ((tot_old + vocab) * 1000000 // (tot_new + vocab)))
            // 1000000 AS BIGINT) AS score_ppm
FROM per CROSS JOIN tot
WHERE c_old + c_new >= {TREND_MIN_COUNT}
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch / Flesch-Kincaid readability in integer thousandths
    (operators/text.readability_scores): vowel-run syllable heuristic,
    ``[.!?]+``-run sentence counting, exact div-chain scoring.  Oracle
    replays the identical word split, regex counts, and floor-division
    chain in DuckDB."""
    from biothings_crawler_spark.operators.text import readability_scores

    return readability_scores(_t(spark, sf_dir, "documents"), "doc_id", "text")


SQL_READABILITY = f"""
WITH base AS (
  SELECT doc_id AS id,
         {_SQL_WORDS} AS words,
         GREATEST(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
           AS n_sentences
  FROM documents),
agg AS (
  SELECT id,
         CAST(len(words) AS BIGINT) AS n_words,
         n_sentences,
         CAST(COALESCE(list_sum(list_transform(words,
                w -> GREATEST(CAST(1 AS BIGINT),
                              CAST(len(regexp_extract_all(w, '[aeiouy]+'))
                                   AS BIGINT)))), 0) AS BIGINT) AS n_syllables
  FROM base)
SELECT id, n_words, n_sentences, n_syllables,
       CAST(206835 - (1015 * n_words) // n_sentences
            - (84600 * n_syllables) // GREATEST(CAST(1 AS BIGINT), n_words)
            AS BIGINT) AS flesch_milli,
       CAST((390 * n_words) // n_sentences
            + (11800 * n_syllables) // GREATEST(CAST(1 AS BIGINT), n_words)
            - 15590 AS BIGINT) AS fk_grade_milli
FROM agg
"""


GROWTH_BUCKETS = 10
ZIPF_MAX_LOG2 = 12


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth (operators/corpusstats.vocab_growth):
    cumulative tokens vs cumulative distinct vocabulary at 10 id-range
    checkpoints; a term counts at the FIRST bucket it appears in, so
    one min-agg replaces b nested distinct counts.  Oracle replays the
    bucket arithmetic, first-bucket agg, and cumulative sums."""
    from biothings_crawler_spark.operators.corpusstats import vocab_growth

    return vocab_growth(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        buckets=GROWTH_BUCKETS,
    )


SQL_VOCAB_GROWTH = f"""
WITH bounds AS (
  SELECT CAST(MIN(doc_id) AS BIGINT) AS lo, CAST(MAX(doc_id) AS BIGINT) AS hi
  FROM documents),
d AS (
  SELECT LEAST(CAST({GROWTH_BUCKETS} - 1 AS BIGINT),
               ((CAST(doc_id AS BIGINT) - lo) * {GROWTH_BUCKETS})
                 // (hi - lo + 1)) AS bucket,
         {_SQL_WORDS} AS words
  FROM documents CROSS JOIN bounds),
toks AS (
  SELECT bucket, CAST(SUM(len(words)) AS BIGINT) AS tokens
  FROM d GROUP BY 1),
fb AS (
  SELECT term, MIN(bucket) AS bucket
  FROM (SELECT bucket, unnest(words) AS term FROM d) GROUP BY 1),
nt AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_terms FROM fb GROUP BY 1),
j AS (
  SELECT COALESCE(t.bucket, n.bucket) AS bucket,
         CAST(COALESCE(t.tokens, 0) AS BIGINT) AS tokens,
         CAST(COALESCE(n.new_terms, 0) AS BIGINT) AS new_terms
  FROM toks t FULL OUTER JOIN nt n ON t.bucket = n.bucket)
SELECT bucket, tokens,
       CAST(SUM(tokens) OVER (ORDER BY bucket) AS BIGINT) AS tokens_cum,
       new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
FROM j
"""


def q_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile (operators/corpusstats.zipf_profile):
    exact term frequency at ranks 1,2,4,...,2^12 via competition-rank
    spans over the sqrt(2N)-bounded frequency histogram.  Oracle
    replays histogram + cumulative spans + power-of-two rank join."""
    from biothings_crawler_spark.operators.corpusstats import zipf_profile

    return zipf_profile(
        _t(spark, sf_dir, "documents"), "text",
        max_log2_rank=ZIPF_MAX_LOG2,
    )


SQL_ZIPF_PROFILE = f"""
WITH freq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_SQL_WORDS}) AS term FROM documents) GROUP BY 1),
hist AS (
  SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_terms FROM freq GROUP BY 1),
spans AS (
  SELECT freq, n_terms,
         CAST(SUM(n_terms) OVER (ORDER BY freq DESC) AS BIGINT) AS rank_end
  FROM hist),
s2 AS (
  SELECT freq, n_terms, rank_end - n_terms + 1 AS rank_start, rank_end
  FROM spans),
ranks AS (
  SELECT CAST(1 << CAST(x AS INTEGER) AS BIGINT) AS "rank"
  FROM (SELECT unnest(range(0, {ZIPF_MAX_LOG2} + 1)) AS x))
SELECT "rank", freq, n_terms
FROM s2 JOIN ranks ON "rank" BETWEEN rank_start AND rank_end
"""


PQ_DIM = 64
PQ_ORACLE_M = 16
PQ_ORACLE_K = 16
PQ_ORACLE_ROUNDS = 2
PQ_N_QUERIES = 5


def _sql_pq_prefix() -> str:
    """Shared CTE chain: 8-bit quantization, subvector split, md5
    seeds, PQ_ORACLE_ROUNDS Lloyd rounds with integer floor-means —
    the exact replay of operators/pq.pq_codebooks."""
    m, k, dsub = PQ_ORACLE_M, PQ_ORACLE_K, PQ_DIM // PQ_ORACLE_M

    def d2(a: str, b: str) -> str:
        return (f"list_reduce(list_transform(range({dsub}), "
                f"j -> ({a}[j+1] - {b}[j+1]) * ({a}[j+1] - {b}[j+1])), "
                f"(x, y) -> x + y)")

    ctes = [f"""
mm AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS vmin,
         CAST(list_max(embedding) AS DOUBLE) AS vmax
  FROM embeddings),
qv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(CAST(CASE WHEN vmax - vmin > 0
                     THEN floor((CAST(x AS DOUBLE) - vmin) * 255
                                / (vmax - vmin) + 0.5)
                     ELSE 0 END AS INT) AS BIGINT)) AS v
  FROM mm),
svs AS MATERIALIZED (
  SELECT vec_id, sub,
         list_transform(range({dsub}),
                        j -> v[sub * {dsub} + j + 1]) AS sv
  FROM qv CROSS JOIN (SELECT unnest(range({m})) AS sub)),
smp AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                            vec_id) - 1 AS cid, v
  FROM qv ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}),
c0 AS MATERIALIZED (
  SELECT sub, cid,
         list_transform(range({dsub}),
                        j -> v[sub * {dsub} + j + 1]) AS cv
  FROM smp CROSS JOIN (SELECT unnest(range({m})) AS sub))"""]
    for i in range(PQ_ORACLE_ROUNDS):
        ctes.append(f"""
a{i} AS MATERIALIZED (
  SELECT s.vec_id, s.sub, s.sv, c.cid
  FROM svs s JOIN c{i} c ON c.sub = s.sub
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                             ORDER BY {d2('s.sv', 'c.cv')}, c.cid) = 1),
g{i} AS MATERIALIZED (
  SELECT sub, cid, pos, CAST(SUM(val) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT sub, cid, generate_subscripts(sv, 1) AS pos,
               unnest(sv) AS val FROM a{i})
  GROUP BY 1, 2, 3),
n{i} AS MATERIALIZED (
  SELECT sub, cid, list(mv ORDER BY pos) AS cv
  FROM (SELECT sub, cid, pos,
               CAST((s - ((s % cnt) + cnt) % cnt) // cnt AS BIGINT) AS mv
        FROM g{i})
  GROUP BY sub, cid),
c{i + 1} AS MATERIALIZED (
  SELECT sub, cid, cv FROM n{i}
  UNION ALL
  SELECT c.sub, c.cid, c.cv FROM c{i} c
  WHERE NOT EXISTS (SELECT 1 FROM n{i} n
                    WHERE n.sub = c.sub AND n.cid = c.cid))""")
    last = f"c{PQ_ORACLE_ROUNDS}"
    ctes.append(f"""
enc AS MATERIALIZED (
  SELECT s.vec_id, s.sub, c.cid AS code
  FROM svs s JOIN {last} c ON c.sub = s.sub
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                             ORDER BY {d2('s.sv', 'c.cv')}, c.cid) = 1)""")
    return "WITH " + ",".join(ctes)


def _sql_pq_d2(a: str, b: str) -> str:
    dsub = PQ_DIM // PQ_ORACLE_M
    return (f"list_reduce(list_transform(range({dsub}), "
            f"j -> ({a}[j+1] - {b}[j+1]) * ({a}[j+1] - {b}[j+1])), "
            f"(x, y) -> x + y)")


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (operators/pq): 16 subspaces x 16
    centroids over the 8-bit quantized embeddings, md5 seeds + 2 Lloyd
    rounds with integer floor-means — 8 bytes per 64-dim vector.
    Codes emitted as a canonical comma string.  Oracle replays seeding,
    both Lloyd rounds, and the argmin encode bit-for-bit."""
    from biothings_crawler_spark.operators.pq import (
        pq_codebooks, pq_encode)
    from biothings_crawler_spark.operators.quantize import quantize_embeddings

    qt = quantize_embeddings(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", "qvec")
    books = pq_codebooks(qt, m=PQ_ORACLE_M, k=PQ_ORACLE_K,
                         rounds=PQ_ORACLE_ROUNDS)
    return pq_encode(qt, books, m=PQ_ORACLE_M).select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",")
        .alias("codes"),
    )


SQL_PQ_ENCODE = _sql_pq_prefix() + """
SELECT vec_id,
       array_to_string(list(CAST(code AS VARCHAR) ORDER BY sub), ',')
         AS codes
FROM enc GROUP BY vec_id
"""


def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-10 over the PQ codes (operators/pq):
    queries keep full quantized vectors, candidates cost 16 lookups in
    the broadcast partial-distance table.  Oracle replays the LUT and
    the (adc_d2, vec_id) ranking exactly."""
    from biothings_crawler_spark.operators.pq import (
        pq_codebooks, pq_encode, pq_topk_adc)
    from biothings_crawler_spark.operators.quantize import quantize_embeddings

    qt = quantize_embeddings(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", "qvec")
    books = pq_codebooks(qt, m=PQ_ORACLE_M, k=PQ_ORACLE_K,
                         rounds=PQ_ORACLE_ROUNDS)
    codes = pq_encode(qt, books, m=PQ_ORACLE_M)
    return pq_topk_adc(qt.filter(F.col("vec_id") < PQ_N_QUERIES),
                       books, codes, k=10, m=PQ_ORACLE_M)


SQL_PQ_ADC = _sql_pq_prefix() + f""",
lut AS MATERIALIZED (
  SELECT s.vec_id AS query_id, s.sub, c.cid,
         CAST({_sql_pq_d2('s.sv', 'c.cv')} AS BIGINT) AS pd2
  FROM svs s JOIN c{PQ_ORACLE_ROUNDS} c ON c.sub = s.sub
  WHERE s.vec_id < {PQ_N_QUERIES}),
sc AS (
  SELECT l.query_id, e.vec_id, CAST(SUM(l.pd2) AS BIGINT) AS adc_d2
  FROM enc e JOIN lut l ON l.sub = e.sub AND l.cid = e.code
  GROUP BY 1, 2)
SELECT query_id, vec_id, adc_d2, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2, vec_id) AS rn FROM sc)
WHERE rn <= 10
"""


KTRUSS_K = 5
KTRUSS_ORACLE_ROUNDS = 8


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal 5-truss of the hub graph with the planted K6 (operators/
    pagerank.k_truss, Cohen 2008): support peeling to the fixpoint —
    degree-oriented wedge enumeration per round, so fan-out stays
    arboricity-bounded.  Every K6 edge closes 4 triangles (>= k-2 = 3);
    the tree-like hub mass carries none and peels in round one.  The
    oracle replays 8 peeling rounds as chained MATERIALIZED CTEs
    (peeling past the fixpoint is a no-op)."""
    from itertools import combinations

    from biothings_crawler_spark.operators.pagerank import k_truss

    cliq = _hub_edges(spark, sf_dir).sparkSession.createDataFrame(
        list(combinations(KCORE_CLIQUE, 2)), "src long, dst long")
    return k_truss(_hub_edges(spark, sf_dir).unionByName(cliq), KTRUSS_K)


def _sql_ktruss() -> str:
    from itertools import combinations

    cliq = " UNION ALL ".join(
        f"SELECT {a} AS src, {b} AS dst"
        for a, b in combinations(KCORE_CLIQUE, 2))
    ctes = [
        _SQL_HUBGRAPH,
        f"e2 AS (SELECT src, dst FROM e UNION ALL {cliq})",
        """
c0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
                           GREATEST(src, dst) AS b FROM e2)""",
    ]
    # support via common-neighbor counting over the undirected
    # adjacency; MATERIALIZED per round (the q_kcore inlining lesson)
    for i in range(KTRUSS_ORACLE_ROUNDS):
        ctes.append(f"""
u{i} AS MATERIALIZED (SELECT a, b FROM c{i} UNION ALL
                      SELECT b AS a, a AS b FROM c{i}),
t{i} AS MATERIALIZED (
  SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
  FROM c{i} e
  JOIN u{i} x ON x.a = e.a
  JOIN u{i} y ON y.a = e.b AND y.b = x.b
  GROUP BY e.a, e.b),
c{i + 1} AS MATERIALIZED (
  SELECT a, b FROM t{i} WHERE support >= {KTRUSS_K - 2})""")
    last = KTRUSS_ORACLE_ROUNDS
    return ("WITH " + ",".join(ctes) + f"""
SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
FROM c{last} e
JOIN (SELECT a, b FROM c{last} UNION ALL
      SELECT b AS a, a AS b FROM c{last}) x ON x.a = e.a
JOIN (SELECT a, b FROM c{last} UNION ALL
      SELECT b AS a, a AS b FROM c{last}) y ON y.a = e.b AND y.b = x.b
GROUP BY e.a, e.b
HAVING COUNT(*) >= {KTRUSS_K - 2}
""")


SQL_KTRUSS = _sql_ktruss()


PRF_QUERY = ["data", "table"]
PRF_FB_DOCS = 10
PRF_N_EXP = 3
PRF_K = 20


def q_prf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass pseudo-relevance-feedback retrieval (operators/prf):
    BM25 top-10 feedback set, tf-idf expansion (top-3 terms), second
    BM25 pass over the expanded set via a broadcast terms-DataFrame —
    one Spark plan, no driver collect.  Oracle replays both passes and
    the expansion selection as one DuckDB statement."""
    from biothings_crawler_spark.operators.prf import prf_search

    return prf_search(
        _t(spark, sf_dir, "documents"), "doc_id", "text", PRF_QUERY,
        fb_docs=PRF_FB_DOCS, n_exp=PRF_N_EXP, k=PRF_K,
    )


def _sql_prf_oracle() -> str:
    qlit = ", ".join(f"'{t}'" for t in PRF_QUERY)
    qrows = " UNION ALL ".join(f"SELECT '{t}' AS term" for t in PRF_QUERY)
    score = (
        "((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))"
        " * 44 * tf.tf * t.w_total"
        " // (20 * tf.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)"
    )
    return f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
wds AS (SELECT id, unnest(words) AS term FROM docs),
tf1 AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM wds
  WHERE term IN ({qlit}) GROUP BY id, term),
df1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf1 GROUP BY term),
fb AS (
  SELECT tf.id FROM tf1 tf
  JOIN df1 d USING (term) JOIN lens l ON l.id = tf.id CROSS JOIN tot t
  GROUP BY tf.id
  ORDER BY SUM({score.replace('tf.tf', 'tf.tf')}) DESC, tf.id
  LIMIT {PRF_FB_DOCS}),
dfc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df_corpus
  FROM (SELECT DISTINCT id, term FROM wds) GROUP BY term),
tffb AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS tf_fb FROM wds
  WHERE id IN (SELECT id FROM fb) AND term NOT IN ({qlit})
  GROUP BY term),
expd AS (
  SELECT term FROM (
    SELECT tf.term, tf.tf_fb * 1000000 // (dc.df_corpus + 1) AS score_ppm
    FROM tffb tf JOIN dfc dc ON dc.term = tf.term)
  ORDER BY score_ppm DESC, term LIMIT {PRF_N_EXP}),
allt AS (SELECT DISTINCT term FROM ({qrows} UNION ALL SELECT term FROM expd)),
tf2 AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM wds
  WHERE term IN (SELECT term FROM allt) GROUP BY id, term),
df2 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf2 GROUP BY term),
sc2 AS (
  SELECT tf.id, {score} AS term_score
  FROM tf2 tf JOIN df2 d USING (term) JOIN lens l ON l.id = tf.id
  CROSS JOIN tot t)
SELECT id, CAST(SUM(term_score) AS BIGINT) AS score
FROM sc2 GROUP BY id ORDER BY score DESC, id LIMIT {PRF_K}
"""


SQL_PRF_SEARCH = _sql_prf_oracle()


def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert locality key (layout.hilbert_key_col): 16-bit xy2d walk
    over (n_chars, doc_id) as one runtime aggregate fold.  Oracle
    replays the identical (x, y, d) accumulator walk with a DuckDB
    list_reduce struct fold over the descending bit levels."""
    from biothings_crawler_spark.layout import hilbert_key_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("a"),
        hilbert_key_col(F.col("n_chars"), F.col("doc_id")).alias("hkey"),
    )


def _sql_hilbert_oracle(bits: int = 15) -> str:
    # single packed-BIGINT accumulator (d << 32 | x << 16 | y): DuckDB
    # 1.0's list_reduce reuses accumulator-struct storage across steps,
    # so a struct fold reads already-overwritten fields — a scalar
    # accumulator is aliasing-proof by construction
    n1 = (1 << bits) - 1
    levels = ", ".join(str(1 << i) for i in reversed(range(bits)))
    x = f"((acc >> 16) & {n1})"
    y = f"(acc & {n1})"
    d = "(acc >> 32)"
    rx = f"(CASE WHEN ({x} & e) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & e) > 0 THEN 1 ELSE 0 END)"
    nx = (f"(CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
          f"THEN {n1} - {y} ELSE {y} END ELSE {x} END)")
    ny = (f"(CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
          f"THEN {n1} - {x} ELSE {x} END ELSE {y} END)")
    nd = f"({d} + e * e * xor(3 * {rx}, {ry}))"
    return f"""
WITH base AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
         (CAST(n_chars AS BIGINT) & {n1}) << 16
           | (CAST(doc_id AS BIGINT) & {n1}) AS p0
  FROM documents)
SELECT doc_id, a,
  list_reduce(
    list_prepend(p0, [{levels}]),
    (acc, e) -> ({nd} << 32) | ({nx} << 16) | {ny}) >> 32 AS hkey
FROM base
"""


SQL_HILBERT_KEY = _sql_hilbert_oracle()


UCB_BUDGET = 20


def q_ucb_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1-log2 recrawl allocation (operators/bandit.ucb_recrawl):
    arms = users, reward = click, top-20 budget.  Oracle replays the
    hash agg, bin()-length log2, corrected integer sqrt, and the
    (score desc, arm) tiebreak."""
    from biothings_crawler_spark.operators.bandit import ucb_recrawl

    ev = _t(spark, sf_dir, "events").select(
        "user_id", (F.col("event_type") == "click").alias("won"))
    return ucb_recrawl(ev, "user_id", "won", budget=UCB_BUDGET)


SQL_UCB_RECRAWL = f"""
WITH per AS (
  SELECT CAST(user_id AS BIGINT) AS arm,
         CAST(COUNT(*) AS BIGINT) AS pulls,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS wins
  FROM events GROUP BY 1),
g AS (SELECT CAST(SUM(pulls) AS BIGINT) AS n_total FROM per),
s AS (
  SELECT arm, pulls, wins,
         (wins * 1000000) // pulls AS mean_ppm,
         (2 * (length(bin(n_total)) - 1) * 1000000000000) // pulls AS x
  FROM per CROSS JOIN g),
s2 AS (
  SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS s0 FROM s),
s3 AS (
  SELECT arm, pulls, wins, CAST(mean_ppm AS BIGINT) AS mean_ppm,
         CAST(CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
                   WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS BIGINT)
           AS bonus_ppm
  FROM s2)
SELECT arm, pulls, wins, mean_ppm, bonus_ppm,
       CAST(mean_ppm + bonus_ppm AS BIGINT) AS score_ppm
FROM s3 ORDER BY score_ppm DESC, arm LIMIT {UCB_BUDGET}
"""


SLO_SHORT_SECS = 21600
SLO_LONG_BUCKETS = 4
SLO_TARGET_PPM = 800_000
SLO_THR_MILLI = 900


def q_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error-budget burn alerts (operators/slo): events
    keyed by service = user_id % 4, error = event_type 'error',
    6-hour short buckets, 24-hour trailing long window (RANGE frame),
    80% SLO, alert at burn >= 0.9 on BOTH windows.  Oracle replays the
    bucket arithmetic, the trailing RANGE window, and the exact
    floor-division burn chain."""
    from biothings_crawler_spark.operators.slo import slo_burn_alerts

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("svc"), "ts",
        (F.col("event_type") == "error").alias("is_err"),
    )
    return slo_burn_alerts(
        ev, "ts", "is_err", "svc",
        short_secs=SLO_SHORT_SECS, long_buckets=SLO_LONG_BUCKETS,
        slo_ppm=SLO_TARGET_PPM, thr_milli=SLO_THR_MILLI,
    )


SQL_SLO_BURN = f"""
WITH per AS (
  SELECT CAST(user_id % 4 AS BIGINT) AS key,
         CAST(epoch_us(ts) // 1000000 // {SLO_SHORT_SECS} AS BIGINT) AS bucket,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS errors,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM events GROUP BY 1, 2),
roll AS (
  SELECT key, bucket, errors, total,
         CAST(SUM(errors) OVER w AS BIGINT) AS errors_long,
         CAST(SUM(total) OVER w AS BIGINT) AS total_long
  FROM per
  WINDOW w AS (PARTITION BY key ORDER BY bucket
               RANGE BETWEEN {SLO_LONG_BUCKETS - 1} PRECEDING
                         AND CURRENT ROW)),
burn AS (
  SELECT key, bucket, errors, total,
         CAST(((errors * 1000000) // total) * 1000
              // {1_000_000 - SLO_TARGET_PPM} AS BIGINT)
           AS burn_short_milli,
         errors_long, total_long,
         CAST(((errors_long * 1000000) // total_long) * 1000
              // {1_000_000 - SLO_TARGET_PPM} AS BIGINT)
           AS burn_long_milli
  FROM roll)
SELECT *, (burn_short_milli >= {SLO_THR_MILLI}
           AND burn_long_milli >= {SLO_THR_MILLI}) AS alert
FROM burn
"""


NB_V = 256
# planted class signal: every doc carries three 'm<lang>' marker tokens,
# so a correct classifier must recover lang from text alone
_NB_TEXT = "text || ' m' || lang || ' m' || lang || ' m' || lang"


def q_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes TRAINING (operators/nbayes.nb_train):
    hashed bag-of-words (md5-u32 mod 256), Laplace +1, exact
    fixed-point log2 weights — the dense (label, bucket, w_fxp) model
    table plus bucket=-1 prior rows.  The oracle re-derives every
    weight with its own integer squaring-recurrence log2."""
    from biothings_crawler_spark.operators.nbayes import nb_train

    d = _t(spark, sf_dir, "documents")
    mut = d.selectExpr("doc_id", "lang", _NB_TEXT + " AS text")
    train = mut.filter("doc_id % 2 = 0")
    return nb_train(train, "doc_id", "text", "lang", n_buckets=NB_V)


def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NB scoring (operators/nbayes.nb_classify): train on even
    doc_ids, classify the whole corpus; min-struct argmax with
    (score desc, label asc) tie-break.  The planted 'm<lang>' markers
    make the task learnable — a pytest asserts high accuracy — while
    the oracle checks every score bit-for-bit."""
    from biothings_crawler_spark.operators.nbayes import nb_classify, nb_train

    d = _t(spark, sf_dir, "documents")
    mut = d.selectExpr("doc_id", "lang", _NB_TEXT + " AS text")
    train = mut.filter("doc_id % 2 = 0")
    model = nb_train(train, "doc_id", "text", "lang", n_buckets=NB_V)
    return nb_classify(mut, model, "doc_id", "text", n_buckets=NB_V)


def _sql_nb_model() -> str:
    """Shared CTE chain: mutated corpus -> hashed features -> dense NB
    model (cond + pri), replayed with ilog2_fxp_duck."""
    from biothings_crawler_spark.operators.nbayes import ilog2_fxp_duck

    return f"""
m AS (SELECT doc_id, lang, {_NB_TEXT} AS text FROM documents),
wd AS (SELECT doc_id AS id, unnest({_SQL_WORDS}) AS w FROM m),
ft AS (SELECT id,
              ('0x' || substr(md5(w), 1, 8))::BIGINT % {NB_V} AS bucket,
              CAST(COUNT(*) AS BIGINT) AS tf
       FROM wd GROUP BY 1, 2),
tr AS (SELECT doc_id AS id, lang AS label FROM m WHERE doc_id % 2 = 0),
cnt AS (SELECT tr.label, ft.bucket, CAST(SUM(ft.tf) AS BIGINT) AS cnt
        FROM ft JOIN tr USING (id) GROUP BY 1, 2),
grid AS (SELECT l.label, r.range::BIGINT AS bucket
         FROM (SELECT DISTINCT label FROM tr) l CROSS JOIN range({NB_V}) r),
dense AS (SELECT g.label, g.bucket, coalesce(c.cnt, 0) AS cnt
          FROM grid g LEFT JOIN cnt c USING (label, bucket)),
tot AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS tot FROM dense GROUP BY 1),
cond AS (SELECT d.label, d.bucket,
                CAST({ilog2_fxp_duck('cnt + 1')}
                     - {ilog2_fxp_duck(f'tot + {NB_V}')} AS BIGINT) AS w_fxp
         FROM dense d JOIN tot USING (label)),
docs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nd FROM tr GROUP BY 1),
ndt AS (SELECT CAST(SUM(nd) AS BIGINT) AS ndt FROM docs),
pri AS (SELECT label, CAST(-1 AS BIGINT) AS bucket,
               CAST({ilog2_fxp_duck('nd')}
                    - {ilog2_fxp_duck('ndt')} AS BIGINT) AS w_fxp
        FROM docs CROSS JOIN ndt)"""


SQL_NB_TRAIN = f"""
WITH {_sql_nb_model()}
SELECT label, bucket, w_fxp FROM cond
UNION ALL SELECT label, bucket, w_fxp FROM pri
"""

SQL_NB_CLASSIFY = f"""
WITH {_sql_nb_model()},
per AS (SELECT ft.id, c.label, CAST(SUM(ft.tf * c.w_fxp) AS BIGINT) AS s
        FROM ft JOIN cond c USING (bucket) GROUP BY 1, 2),
sc AS (SELECT per.id, per.label, per.s + p.w_fxp AS score_fxp
       FROM per JOIN pri p ON p.label = per.label),
emp AS (SELECT m.doc_id AS id, p.label, p.w_fxp AS score_fxp
        FROM m CROSS JOIN pri p
        WHERE m.doc_id NOT IN (SELECT DISTINCT id FROM ft)),
allsc AS (SELECT * FROM sc UNION ALL SELECT * FROM emp)
SELECT id, label AS pred, CAST(score_fxp AS BIGINT) AS score_fxp
FROM allsc
QUALIFY row_number() OVER (PARTITION BY id
                           ORDER BY score_fxp DESC, label) = 1
"""


def q_active_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling for the labeling loop (operators/nbayes.
    active_select, Lewis-Gale margin sampling): train on even ids,
    rank the whole corpus by top-two fixed-point score margin within
    each predicted class, keep the 10 most ambiguous per class.
    Oracle replays the shared NB model chain + margin windows."""
    from biothings_crawler_spark.operators.nbayes import (
        active_select,
        nb_train,
    )

    d = _t(spark, sf_dir, "documents")
    mut = d.selectExpr("doc_id", "lang", _NB_TEXT + " AS text")
    train = mut.filter("doc_id % 2 = 0")
    model = nb_train(train, "doc_id", "text", "lang", n_buckets=NB_V)
    return active_select(mut, model, "doc_id", "text",
                         n_buckets=NB_V, k=10)


SQL_ACTIVE_SELECT = f"""
WITH {_sql_nb_model()},
per AS (SELECT ft.id, c.label, CAST(SUM(ft.tf * c.w_fxp) AS BIGINT) AS s
        FROM ft JOIN cond c USING (bucket) GROUP BY 1, 2),
sc AS (SELECT per.id, per.label, per.s + p.w_fxp AS score_fxp
       FROM per JOIN pri p ON p.label = per.label),
emp AS (SELECT m.doc_id AS id, p.label, p.w_fxp AS score_fxp
        FROM m CROSS JOIN pri p
        WHERE m.doc_id NOT IN (SELECT DISTINCT id FROM ft)),
allsc AS (SELECT * FROM sc UNION ALL SELECT * FROM emp),
rnk AS (SELECT id, label, score_fxp,
               row_number() OVER (PARTITION BY id
                 ORDER BY score_fxp DESC, label) AS rn
        FROM allsc),
marg AS (
  SELECT a.id, a.label AS pred,
         CAST(a.score_fxp - b.score_fxp AS BIGINT) AS margin_fxp
  FROM rnk a JOIN rnk b ON b.id = a.id AND b.rn = 2
  WHERE a.rn = 1)
SELECT pred, id, margin_fxp,
       CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY pred
        ORDER BY margin_fxp, id) AS rn FROM marg)
WHERE rn <= 10
"""



def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/dsir.dsir_weights): target =
    the 'en' slice of the marker-mutated corpus, raw = all of it; each
    doc scored Σ tf·(lg p_target − lg p_raw) in exact lg-fxp units over
    256 hashed buckets.  The oracle rebuilds both smoothed bucket
    distributions and every weight with its own integer log2."""
    from biothings_crawler_spark.operators.dsir import dsir_weights

    d = _t(spark, sf_dir, "documents")
    mut = d.selectExpr("doc_id", "lang", _NB_TEXT + " AS text")
    target = mut.filter("lang = 'en'")
    return dsir_weights(mut, target, "doc_id", "text", n_buckets=NB_V)


from biothings_crawler_spark.operators.nbayes import ilog2_fxp_duck

SQL_DSIR_WEIGHTS = f"""
WITH m AS (SELECT doc_id, lang, {_NB_TEXT} AS text FROM documents),
wd AS (SELECT doc_id AS id, lang, unnest({_SQL_WORDS}) AS w FROM m),
ft AS (SELECT id, lang,
              ('0x' || substr(md5(w), 1, 8))::BIGINT % {NB_V} AS bucket,
              CAST(COUNT(*) AS BIGINT) AS tf
       FROM wd GROUP BY 1, 2, 3),
grid AS (SELECT range::BIGINT AS bucket FROM range({NB_V})),
tc AS (SELECT g.bucket, coalesce(SUM(ft.tf) FILTER (ft.lang = 'en'), 0) AS cnt
       FROM grid g LEFT JOIN ft USING (bucket) GROUP BY 1),
rc AS (SELECT g.bucket, coalesce(SUM(ft.tf), 0) AS cnt
       FROM grid g LEFT JOIN ft USING (bucket) GROUP BY 1),
tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM tc),
rt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM rc),
lr AS (SELECT tc.bucket,
              ({ilog2_fxp_duck('tc.cnt + 1')}
               - {ilog2_fxp_duck(f'tt.tot + {NB_V}')})
              - ({ilog2_fxp_duck('rc.cnt + 1')}
                 - {ilog2_fxp_duck(f'rt.tot + {NB_V}')}) AS lr_fxp
       FROM tc JOIN rc USING (bucket) CROSS JOIN tt CROSS JOIN rt),
sc AS (SELECT ft.id, CAST(SUM(ft.tf) AS BIGINT) AS n_tokens,
              CAST(SUM(ft.tf * lr.lr_fxp) AS BIGINT) AS w_fxp
       FROM ft JOIN lr USING (bucket) GROUP BY 1)
SELECT m.doc_id AS id,
       coalesce(sc.n_tokens, 0) AS n_tokens,
       coalesce(sc.w_fxp, 0) AS w_fxp,
       coalesce(sc.w_fxp, 0) > 0 AS selected
FROM m LEFT JOIN sc ON sc.id = m.doc_id
"""


QL_MU = 2000


def q_ql_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet query-likelihood ranking (operators/bm25.
    ql_dirichlet_topk) for the same 3-term query as q_bm25_topk — the
    LM-based ranker next to the BM25 one over the identical index
    plane, exact lg-fxp scores.  The oracle replays the identical
    floored-lg decomposition with its own integer log2."""
    from biothings_crawler_spark.operators.bm25 import ql_dirichlet_topk

    return ql_dirichlet_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "text", BM25_QUERY,
        mu=QL_MU, k=20,
    )


SQL_QL_DIRICHLET = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
coll AS (SELECT CAST(SUM(len(words)) AS BIGINT) AS c_total FROM docs),
occ AS (SELECT id, unnest(words) AS term FROM docs),
tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM occ
       WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
       GROUP BY 1, 2),
cfreq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
qconst AS (SELECT CAST(SUM({ilog2_fxp_duck(f'{QL_MU} * cf')}) AS BIGINT)
                    AS k_fxp,
                  CAST(COUNT(*) AS BIGINT) AS n_terms
           FROM cfreq),
matched AS (
  SELECT tf.id,
         CAST(SUM({ilog2_fxp_duck(f'tf.tf * coll.c_total + {QL_MU} * cf')}
                  - {ilog2_fxp_duck(f'{QL_MU} * cf')}) AS BIGINT) AS match_fxp
  FROM tf JOIN cfreq USING (term) CROSS JOIN coll
  GROUP BY tf.id)
SELECT m.id,
       CAST(m.match_fxp + q.k_fxp
            - q.n_terms * ({ilog2_fxp_duck('coll.c_total')}
                           + {ilog2_fxp_duck(f'lens.dl + {QL_MU}')})
            AS BIGINT) AS score_fxp
FROM matched m JOIN lens ON lens.id = m.id
CROSS JOIN qconst q CROSS JOIN coll
ORDER BY score_fxp DESC, m.id LIMIT 20
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-level Shannon self-information per document
    (operators/text.char_entropy) — the gibberish/binary-spill
    detector; integer lg-fxp units, one row-local expression chain
    (zero exchanges).  The oracle rebuilds every histogram with a
    lateral char unnest and replays the identical floored lgs."""
    from biothings_crawler_spark.operators.text import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"), "doc_id", "text")


SQL_CHAR_ENTROPY = f"""
WITH ch AS (
  SELECT doc_id AS id, unnest(string_split(text, '')) AS c FROM documents),
hist AS (SELECT id, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM ch GROUP BY 1, 2),
per AS (SELECT id, CAST(SUM(cnt) AS BIGINT) AS n_chars,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(cnt * ({ilog2_fxp_duck('cnt')})) AS BIGINT) AS sum_clg
        FROM hist GROUP BY 1)
SELECT d.doc_id AS id,
       coalesce(p.n_chars, 0) AS n_chars,
       coalesce(p.n_distinct, 0) AS n_distinct,
       CASE WHEN p.id IS NULL THEN 0
            ELSE p.n_chars * ({ilog2_fxp_duck('p.n_chars')}) - p.sum_clg
            END::BIGINT AS ent_tot_fxp,
       CASE WHEN p.id IS NULL THEN 0
            ELSE (p.n_chars * ({ilog2_fxp_duck('p.n_chars')}) - p.sum_clg)
                 // p.n_chars END::BIGINT AS ent_char_fxp
FROM documents d LEFT JOIN per p ON p.id = d.doc_id
"""


BURST_ENTER, BURST_EXIT, BURST_ALPHA = 200, 100, 30
# deterministic spike plant: term t7 gets +40 every 50th hour, so the
# fixture provably contains bursts for the detector to find
_BURST_PLANT = ("n + CASE WHEN term = 't7' AND hour_no % 50 = 3 "
                "THEN 40 ELSE 0 END")


def q_burst_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis-EWMA burst intervals (operators/bursts.
    burst_intervals) over per-term hourly counts from events, with a
    planted periodic spike on one term.  The oracle replays the exact
    integer fold as a single-string-state list_reduce (the one DuckDB
    fold shape that is row-count-sound) and re-derives every
    interval."""
    from biothings_crawler_spark.operators.bursts import burst_intervals

    e = _t(spark, sf_dir, "events")
    counts = (
        e.select(
            F.concat(F.lit("t"), (F.col("user_id") % 25).cast("string"))
            .alias("term"),
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
                   "00:00:00', ts) div 3600000000").alias("hour_no"),
        )
        .groupBy("term", "hour_no")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .selectExpr("term", "hour_no", f"CAST({_BURST_PLANT} AS BIGINT) AS n")
    )
    return burst_intervals(counts, BURST_ENTER, BURST_EXIT, BURST_ALPHA)


def _sql_burst() -> str:
    sp = "string_split(acc, '|')"
    a_e, a_i = f"CAST({sp}[1] AS BIGINT)", f"CAST({sp}[2] AS BIGINT)"
    a_s, a_l, a_v = f"{sp}[3]", f"{sp}[4]", f"{sp}[5]"
    e_h = "string_split(e, ':')[1]"
    e_n = "CAST(string_split(e, ':')[2] AS BIGINT)"
    first = f"({a_e} < 0)"
    enter = (f"(NOT {first} AND {a_i} = 0 "
             f"AND {e_n} * 10000 >= {BURST_ENTER} * {a_e})")
    exit_ = f"({a_i} = 1 AND {e_n} * 10000 < {BURST_EXIT} * {a_e})"
    upd = (f"({BURST_ALPHA} * {e_n} * 100 "
           f"+ {100 - BURST_ALPHA} * {a_e}) // 100")
    closed = (f"(CASE WHEN {a_v} = '' THEN '' ELSE {a_v} || ',' END "
              f"|| {a_s} || '-' || {a_l})")
    step = (
        f"CAST(CASE WHEN {first} THEN {e_n} * 100 "
        f"     WHEN {enter} OR ({a_i} = 1 AND NOT {exit_}) THEN {a_e} "
        f"     ELSE {upd} END AS VARCHAR) || '|' || "
        f"CASE WHEN {enter} THEN '1' WHEN {exit_} THEN '0' "
        f"     ELSE {sp}[2] END || '|' || "
        f"CASE WHEN {enter} THEN {e_h} ELSE {a_s} END || '|' || "
        f"{e_h} || '|' || "
        f"CASE WHEN {exit_} THEN {closed} ELSE {a_v} END"
    )
    fin_v = a_v.replace("acc", "fin")
    fin_i = a_i.replace("acc", "fin")
    fin_s = a_s.replace("acc", "fin")
    fin_l = a_l.replace("acc", "fin")
    fin_closed = (f"(CASE WHEN {fin_v} = '' THEN '' ELSE {fin_v} || ',' END "
                  f"|| {fin_s} || '-' || {fin_l})")
    return f"""
WITH base AS (
  SELECT 't' || CAST(user_id % 25 AS VARCHAR) AS term,
         epoch_us(ts) // 3600000000 AS hour_no,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
c AS (SELECT term, hour_no, CAST({_BURST_PLANT} AS BIGINT) AS n FROM base),
ser AS (SELECT term,
               list(CAST(hour_no AS VARCHAR) || ':' || CAST(n AS VARCHAR)
                    ORDER BY hour_no) AS hs
        FROM c GROUP BY term),
folded AS (SELECT term,
                  list_reduce(list_prepend('-1|0|0|0|', hs),
                              (acc, e) -> {step}) AS fin
           FROM ser),
iv AS (SELECT term,
              CASE WHEN {fin_i} = 1 THEN {fin_closed} ELSE {fin_v} END AS iv
       FROM folded),
spans AS (SELECT term, unnest(string_split(iv, ',')) AS span
          FROM iv WHERE iv <> '')
SELECT term,
       CAST(row_number() OVER (PARTITION BY term
                               ORDER BY CAST(string_split(span, '-')[1]
                                             AS BIGINT)) AS BIGINT)
         AS burst_no,
       CAST(string_split(span, '-')[1] AS BIGINT) AS start_hour,
       CAST(string_split(span, '-')[2] AS BIGINT) AS end_hour
FROM spans
"""


SQL_BURST_INTERVALS = _sql_burst()


# mojibake fixture lanes: UTF-8 read as cp1252 (repairable), genuine
# Latin-1-range text (must be kept — its inverse bytes are invalid
# UTF-8), plain ASCII (identity)
_MOJI_DAMAGED = "café — déjà vu".encode("utf-8").decode("cp1252")
_MOJI_CLEAN = "café naïve"


def q_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-core mojibake repair (operators/mojibake.fix_mojibake):
    documents with planted damage lanes — doc_id%7==0 gets a UTF-8-
    read-as-cp1252 suffix (must repair), %7==1 gets genuine accented
    text (must NOT change: its inverse bytes are invalid UTF-8), the
    rest stay ASCII.  The oracle re-derives every repaired code point
    with a from-scratch UTF-8 validator fold + chr()."""
    from biothings_crawler_spark.operators.mojibake import fix_mojibake

    d = _t(spark, sf_dir, "documents")
    mut = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat("text", F.lit(" " + _MOJI_DAMAGED)))
        .when(F.col("doc_id") % 7 == 1,
              F.concat("text", F.lit(" " + _MOJI_CLEAN)))
        .otherwise(F.col("text")).alias("text"),
    )
    return fix_mojibake(mut, "doc_id", "text")


def _sql_mojibake() -> str:
    from biothings_crawler_spark.operators.mojibake import mojibake_oracle_sql

    return f"""
WITH m AS (
  SELECT doc_id AS id,
         text || CASE WHEN doc_id % 7 = 0 THEN ' {_MOJI_DAMAGED}'
                      WHEN doc_id % 7 = 1 THEN ' {_MOJI_CLEAN}'
                      ELSE '' END AS text
  FROM documents),
{mojibake_oracle_sql("m", "id", "text")}
"""


SQL_MOJIBAKE = _sql_mojibake()


PRUNE_KEEP = 50


def q_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval over the statically PRUNED index (operators/bm25.
    pruned_topk, Carmel-style impact-ordered pruning): per query term
    only the top-50 highest-impact postings survive the index build;
    ranking sums surviving scores only.  The two-phase salted prune is
    exact, so the oracle is ONE QUALIFY per term — salt choices can
    never change the output."""
    from biothings_crawler_spark.operators.bm25 import pruned_topk

    return pruned_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "text", BM25_QUERY,
        keep_n=PRUNE_KEEP, k=20,
    )


SQL_PRUNED_TOPK = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY id, term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.id, tf.term,
         ((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tf.tf * t.w_total
           // (20 * tf.tf * t.w_total + 6 * t.w_total + 18 * l.dl * t.n_docs)
           AS term_score
  FROM tf JOIN dfq d USING (term) JOIN lens l ON l.id = tf.id CROSS JOIN tot t),
pruned AS (
  SELECT id, term, term_score FROM sc
  QUALIFY row_number() OVER (PARTITION BY term
                             ORDER BY term_score DESC, id) <= {PRUNE_KEEP})
SELECT id, CAST(SUM(term_score) AS BIGINT) AS score
FROM pruned GROUP BY id
ORDER BY score DESC, id LIMIT 20
"""


def q_ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning-to-rank feature table (operators/bm25.ltr_features):
    one row per candidate doc of the shared 3-term query with integer
    BM25, Dirichlet-QL lg-fxp score, dl, summed tf and matched-term
    count — the MSLR-style training input, every feature replayed by
    the oracle from the shared CTE planes in one statement."""
    from biothings_crawler_spark.operators.bm25 import ltr_features

    return ltr_features(
        _t(spark, sf_dir, "documents"), "doc_id", "text", BM25_QUERY,
        mu=QL_MU,
    )


SQL_LTR_FEATURES = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS w_total FROM lens),
coll AS (SELECT CAST(SUM(dl) AS BIGINT) AS c_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY id, term),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
bm AS (
  SELECT tf.id, CAST(COUNT(*) AS BIGINT) AS n_matched,
         CAST(SUM(((2 * t.n_docs - 2 * d.df + 1) * 1000000 // (2 * d.df + 1))
           * 44 * tf.tf * t.w_total
           // (20 * tf.tf * t.w_total + 6 * t.w_total
               + 18 * l.dl * t.n_docs)) AS BIGINT) AS bm25_score
  FROM tf JOIN dfq d USING (term) JOIN lens l ON l.id = tf.id CROSS JOIN tot t
  GROUP BY tf.id),
tft AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS tf_total FROM tf GROUP BY id),
cfreq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
qconst AS (SELECT CAST(SUM({ilog2_fxp_duck(f'{QL_MU} * cf')}) AS BIGINT)
                    AS k_fxp,
                  CAST(COUNT(*) AS BIGINT) AS n_terms
           FROM cfreq),
matched AS (
  SELECT tf.id,
         CAST(SUM({ilog2_fxp_duck(f'tf.tf * coll.c_total + {QL_MU} * cf')}
                  - {ilog2_fxp_duck(f'{QL_MU} * cf')}) AS BIGINT) AS match_fxp
  FROM tf JOIN cfreq USING (term) CROSS JOIN coll
  GROUP BY tf.id),
ql AS (
  SELECT m.id,
         CAST(m.match_fxp + q.k_fxp
              - q.n_terms * ({ilog2_fxp_duck('coll.c_total')}
                             + {ilog2_fxp_duck(f'lens.dl + {QL_MU}')})
              AS BIGINT) AS ql_fxp
  FROM matched m JOIN lens ON lens.id = m.id
  CROSS JOIN qconst q CROSS JOIN coll)
SELECT bm.id, bm.n_matched, tft.tf_total, lens.dl, bm.bm25_score, ql.ql_fxp
FROM bm JOIN tft USING (id) JOIN lens USING (id) JOIN ql USING (id)
"""


def q_cori_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORI federated resource selection (operators/sharding.
    cori_shard_scores): rank the per-source sub-collections for the
    shared 3-term query by exact ppm df.icf beliefs — the broker step
    that routes a query to the few shards worth probing.  The oracle
    replays T, I, and every floor bit-for-bit."""
    from biothings_crawler_spark.operators.sharding import cori_shard_scores

    return cori_shard_scores(
        _t(spark, sf_dir, "documents"), "source", "doc_id", "text",
        BM25_QUERY,
    )


SQL_CORI_SHARDS = f"""
WITH docs AS (SELECT source AS shard, doc_id AS id, {_SQL_WORDS} AS words
              FROM documents),
cw AS (SELECT shard, CAST(SUM(len(words)) AS BIGINT) AS cw
       FROM docs GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_cnt,
               CAST(SUM(cw) AS BIGINT) AS cw_total FROM cw),
dfreq AS (
  SELECT shard, term, CAST(COUNT(*) AS BIGINT) AS df FROM (
    SELECT DISTINCT shard, id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY 1, 2),
cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf FROM dfreq GROUP BY 1),
grid AS (SELECT cw.shard, cf.term, cf.cf FROM cw CROSS JOIN cf),
bel AS (
  SELECT g.shard,
         400000 + 600000
           * (coalesce(d.df, 0) * 1000000
              // (coalesce(d.df, 0) + 50
                  + (150 * cw.cw * t.s_cnt) // t.cw_total))
           * (({ilog2_fxp_duck('2 * t.s_cnt + 1')}
               - {ilog2_fxp_duck('2 * g.cf')}) * 1000000
              // ({ilog2_fxp_duck('t.s_cnt + 1')}))
           // 1000000000000 AS belief_ppm
  FROM grid g
  LEFT JOIN dfreq d ON d.shard = g.shard AND d.term = g.term
  JOIN cw ON cw.shard = g.shard CROSS JOIN tot t)
SELECT shard, CAST(SUM(belief_ppm) AS BIGINT) AS score_ppm
FROM bel GROUP BY shard
ORDER BY score_ppm DESC, shard
"""


CLARITY_FB_K = 10


def q_query_clarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query clarity / performance prediction (operators/bm25.
    query_clarity): KL of the top-10 QL feedback docs' language model
    vs the collection model, exact lg-fxp (one diagnostic row).  The
    oracle re-ranks, rebuilds both models and replays every floor."""
    from biothings_crawler_spark.operators.bm25 import query_clarity

    return query_clarity(
        _t(spark, sf_dir, "documents"), "doc_id", "text", BM25_QUERY,
        mu=QL_MU, fb_k=CLARITY_FB_K,
    )


SQL_QUERY_CLARITY = f"""
WITH docs AS (SELECT doc_id AS id, {_SQL_WORDS} AS words FROM documents),
lens AS (SELECT id, CAST(len(words) AS BIGINT) AS dl FROM docs),
coll AS (SELECT CAST(SUM(dl) AS BIGINT) AS c_total FROM lens),
tf AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT id, unnest(words) AS term FROM docs)
  WHERE term IN ({', '.join("'" + t + "'" for t in BM25_QUERY)})
  GROUP BY 1, 2),
cfreq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
qconst AS (SELECT CAST(SUM({ilog2_fxp_duck(f'{QL_MU} * cf')}) AS BIGINT)
                    AS k_fxp,
                  CAST(COUNT(*) AS BIGINT) AS n_terms
           FROM cfreq),
matched AS (
  SELECT tf.id,
         CAST(SUM({ilog2_fxp_duck(f'tf.tf * coll.c_total + {QL_MU} * cf')}
                  - {ilog2_fxp_duck(f'{QL_MU} * cf')}) AS BIGINT) AS match_fxp
  FROM tf JOIN cfreq USING (term) CROSS JOIN coll
  GROUP BY tf.id),
fb AS (
  SELECT m.id
  FROM matched m JOIN lens ON lens.id = m.id
  CROSS JOIN qconst q CROSS JOIN coll
  ORDER BY m.match_fxp + q.k_fxp
           - q.n_terms * ({ilog2_fxp_duck('coll.c_total')}
                          + {ilog2_fxp_duck(f'lens.dl + {QL_MU}')}) DESC,
           m.id
  LIMIT {CLARITY_FB_K}),
collw AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM (
    SELECT unnest(words) AS w FROM docs) GROUP BY 1),
fbtf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS tf_fb FROM (
    SELECT unnest(words) AS w FROM docs JOIN fb USING (id)) GROUP BY 1),
fblen AS (SELECT CAST(SUM(tf_fb) AS BIGINT) AS fb_len FROM fbtf),
kl AS (
  SELECT CAST(GREATEST(
           SUM(tf_fb * (({ilog2_fxp_duck('tf_fb * coll.c_total')})
                        - ({ilog2_fxp_duck('fblen.fb_len * cf')}))), 0)
              AS BIGINT) AS clarity_fxp,
         CAST(MAX(fblen.fb_len) AS BIGINT) AS fb_len
  FROM fbtf JOIN collw USING (w) CROSS JOIN coll CROSS JOIN fblen)
SELECT CAST((SELECT COUNT(*) FROM fb) AS BIGINT) AS n_fb_docs,
       fb_len AS fb_tokens,
       clarity_fxp,
       clarity_fxp // fb_len AS clarity_tok_fxp
FROM kl
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (operators/text.
    tokenizer_fertility): tokens-per-word and chars-per-token in exact
    ppm — the multilingual token-budget planning table.  Oracle
    recomputes both counts with the shared regex twins."""
    from biothings_crawler_spark.operators.text import tokenizer_fertility

    return tokenizer_fertility(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "lang"
    )


SQL_TOKENIZER_FERTILITY = f"""
WITH per AS (
  SELECT lang,
         CAST(len({_SQL_WORDS}) AS BIGINT) AS w,
         CAST({_SQL_TOKENS} AS BIGINT) AS t,
         CAST(length(text) AS BIGINT) AS c
  FROM documents),
agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS words,
         CAST(SUM(t) AS BIGINT) AS tokens,
         CAST(SUM(c) AS BIGINT) AS chars
  FROM per GROUP BY lang)
SELECT lang, n_docs, words, tokens, chars,
       CASE WHEN words = 0 THEN 0
            ELSE tokens * 1000000 // words END::BIGINT AS fertility_ppm,
       CASE WHEN tokens = 0 THEN 0
            ELSE chars * 1000000 // tokens END::BIGINT AS chars_per_token_ppm
FROM agg
"""


# standing-subscription fixture: conjunctions over the corpus vocab,
# including one unsatisfiable query (ghost term) and one single-term
PERC_QUERIES = [
    ("alert1", ["data", "table"]),
    ("alert2", ["data", "spark", "key"]),
    ("alert3", ["spark"]),
    ("alert4", ["data", "zzghost"]),
]


def q_prospective_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation / prospective search (operators/percolate.
    prospective_match): four standing conjunction subscriptions
    matched against every document; the watched-term broadcast filter
    prunes the doc stream before the only shuffle.  Oracle replays the
    distinct-term conjunction in plain SQL."""
    from biothings_crawler_spark.operators.percolate import prospective_match

    d = _t(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        PERC_QUERIES, "query_id string, terms array<string>"
    )
    return prospective_match(d, qs, "doc_id", "text")


_SQL_PERC_QUERIES = " UNION ALL ".join(
    f"SELECT '{qid}' AS query_id, '{t}' AS term"
    for qid, terms in PERC_QUERIES
    for t in sorted(set(terms))
)

SQL_PROSPECTIVE_MATCH = f"""
WITH q AS ({_SQL_PERC_QUERIES}),
qs AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms
       FROM q GROUP BY 1),
dt AS (SELECT DISTINCT doc_id AS id, unnest({_SQL_WORDS}) AS term
       FROM documents),
m AS (SELECT dt.id, q.query_id, CAST(COUNT(*) AS BIGINT) AS n_matched
      FROM dt JOIN q USING (term) GROUP BY 1, 2)
SELECT m.id, m.query_id, m.n_matched, qs.n_terms
FROM m JOIN qs USING (query_id)
WHERE m.n_matched >= qs.n_terms
"""


PROFILE_COLS = ["event_id", "user_id", "event_type", "value"]
# planted round-2 damage: a null-spiking extractor and an exploding id
_PROF_NEW_TYPE = ("CASE WHEN event_id % 37 = 0 THEN NULL "
                  "ELSE event_type END")
_PROF_NEW_USER = "user_id + (event_id % 7) * 100"


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract drift gate (operators/profile.column_profile +
    profile_drift): round 1 = even event_ids, round 2 = odd event_ids
    with a planted null-spiking extractor bug on event_type and a
    cardinality explosion on user_id — the gate must flag exactly
    those two columns.  Oracle replays both profiles and every ppm."""
    from biothings_crawler_spark.operators.profile import (
        column_profile,
        profile_drift,
    )

    e = _t(spark, sf_dir, "events")
    old = e.filter("event_id % 2 = 0")
    new = e.filter("event_id % 2 = 1").selectExpr(
        "event_id", f"CAST({_PROF_NEW_USER} AS BIGINT) AS user_id",
        f"{_PROF_NEW_TYPE} AS event_type", "value",
    )
    return profile_drift(
        column_profile(old, PROFILE_COLS),
        column_profile(new, PROFILE_COLS),
    )


def _sql_profile(src: str) -> str:
    parts = []
    for c in PROFILE_COLS:
        parts.append(
            f'SELECT \'{c}\' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows, '
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM {src}"
        )
    return " UNION ALL ".join(parts)


SQL_PROFILE_DRIFT = f"""
WITH oldt AS (SELECT event_id, user_id, event_type, value FROM events
              WHERE event_id % 2 = 0),
newt AS (SELECT event_id,
                CAST({_PROF_NEW_USER} AS BIGINT) AS user_id,
                {_PROF_NEW_TYPE} AS event_type, value
         FROM events WHERE event_id % 2 = 1),
po AS (SELECT *, CASE WHEN n_rows = 0 THEN 0
                      ELSE n_null * 1000000 // n_rows END AS null_ppm
       FROM ({_sql_profile('oldt')})),
pn AS (SELECT *, CASE WHEN n_rows = 0 THEN 0
                      ELSE n_null * 1000000 // n_rows END AS null_ppm
       FROM ({_sql_profile('newt')}))
SELECT po."column",
       po.n_rows AS rows_old, pn.n_rows AS rows_new,
       CAST(po.null_ppm AS BIGINT) AS null_ppm_old,
       CAST(pn.null_ppm AS BIGINT) AS null_ppm_new,
       po.n_distinct AS distinct_old, pn.n_distinct AS distinct_new,
       CAST(CASE WHEN po.n_distinct = 0 THEN 1000000
            ELSE abs(pn.n_distinct - po.n_distinct) * 1000000
                 // po.n_distinct END AS BIGINT) AS distinct_delta_ppm,
       CASE WHEN pn.null_ppm - po.null_ppm > 10000 THEN 'null_spike'
            WHEN (CASE WHEN po.n_distinct = 0 THEN 1000000
                  ELSE abs(pn.n_distinct - po.n_distinct) * 1000000
                       // po.n_distinct END) > 200000 THEN 'cardinality'
            ELSE 'ok' END AS flag
FROM po JOIN pn USING ("column")
"""


MIX_T, MIX_BUDGET = 2, 1_000_000_000


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (operators/sampling.
    temperature_mix, T=2 — the XLM/mT5 sampling rule): per-language
    token counts reweighted by sqrt, exact integer root with the
    corrected-seed trick, shares in ppm and a 10^9-token budget split.
    The oracle replays the same seed-and-correct root, so a one-ulp
    libm difference between engines cannot change a weight."""
    from biothings_crawler_spark.operators.sampling import temperature_mix
    from biothings_crawler_spark.operators.text import token_count_col

    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy(F.col("lang").alias("stratum")).agg(
        F.sum(token_count_col(F.col("text"))).cast("long").alias("tokens")
    )
    return temperature_mix(counts, temperature=MIX_T, budget=MIX_BUDGET)


SQL_TEMPERATURE_MIX = f"""
WITH c AS (
  SELECT lang AS stratum, CAST(SUM({_SQL_TOKENS}) AS BIGINT) AS tokens
  FROM documents GROUP BY 1),
seed AS (
  SELECT stratum, tokens, tokens * 100000000 AS x,
         CAST(floor(pow(CAST(tokens * 100000000 AS DOUBLE),
                        1.0 / {MIX_T})) AS BIGINT) AS r
  FROM c),
w AS (
  SELECT stratum, tokens,
         CAST(CASE WHEN (r + 1) * (r + 1) <= x THEN r + 1
                   WHEN r * r > x THEN
                     CASE WHEN r >= 1 AND (r - 1) * (r - 1) <= x THEN r - 1
                          ELSE r END
                   ELSE r END AS BIGINT) AS weight
  FROM seed),
tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS w_total FROM w)
SELECT stratum, tokens, weight,
       CAST(weight * 1000000 // w_total AS BIGINT) AS share_ppm,
       CAST({MIX_BUDGET} * weight // w_total AS BIGINT) AS quota
FROM w CROSS JOIN tot
"""


def q_wilson_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson lower-bound host quarantine (operators/confidence.
    wilson_flags, z=2): per-host error rates from events judged by
    their exact lower confidence bound, so sparse hosts can't alert on
    noise.  Oracle replays the corrected isqrt and every ppm floor."""
    from biothings_crawler_spark.operators.confidence import wilson_flags

    e = _t(spark, sf_dir, "events")
    outcomes = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
        .alias("host"),
        (F.col("event_type") == "error").alias("bad"),
    )
    return wilson_flags(outcomes, "host", "bad", alert_ppm=150_000)


SQL_WILSON_ERRORS = """
WITH per AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS key,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS bad
  FROM events GROUP BY 1),
pp AS (
  SELECT *, bad * (n - bad) AS p FROM per),
t1s AS (
  SELECT *, (p // n) * 1000000 + ((p % n) * 1000000) // n AS t1,
         ((p % n) * 1000000) % n AS r2
  FROM pp),
st AS (
  SELECT key, n, bad,
         t1 * 1000000 + (r2 * 1000000) // n + 1000000000000 AS x
  FROM t1s),
sd AS (SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS s0
       FROM st),
sc AS (
  SELECT key, n, bad,
         CAST(CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
                   WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS BIGINT) AS s
  FROM sd)
SELECT key, n, bad,
       CAST(bad * 1000000 // n AS BIGINT) AS rate_ppm,
       CAST(GREATEST((bad + 2) * 1000000 - 2 * s, 0) // (n + 4) AS BIGINT)
         AS lb_ppm,
       CAST(LEAST(((bad + 2) * 1000000 + 2 * s) // (n + 4), 1000000)
            AS BIGINT) AS ub_ppm,
       CAST(GREATEST((bad + 2) * 1000000 - 2 * s, 0) // (n + 4) AS BIGINT)
         > 150000 AS flag
FROM sc
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseen-vocabulary estimation (operators/corpusstats.
    vocab_coverage): Chao1 bias-corrected richness + Good-Turing OOV
    mass + observed-coverage share, all rational in the frequency-of-
    frequencies table — the stop-crawling signal.  One diagnostic
    row; oracle replays every division."""
    from biothings_crawler_spark.operators.corpusstats import vocab_coverage

    return vocab_coverage(_t(spark, sf_dir, "documents"), "text")


SQL_VOCAB_COVERAGE = f"""
WITH tf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest({_SQL_WORDS}) AS w FROM documents) GROUP BY 1),
fof AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM tf GROUP BY 1),
agg AS (
  SELECT CAST(SUM(f) AS BIGINT) AS v_obs,
         CAST(SUM(f * c) AS BIGINT) AS n_tokens,
         CAST(coalesce(SUM(f) FILTER (c = 1), 0) AS BIGINT) AS f1,
         CAST(coalesce(SUM(f) FILTER (c = 2), 0) AS BIGINT) AS f2
  FROM fof)
SELECT v_obs, n_tokens, f1, f2,
       CAST(v_obs + f1 * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT) AS chao1,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE f1 * 1000000 // n_tokens END AS BIGINT) AS gt_oov_ppm,
       CAST(CASE WHEN v_obs + f1 * (f1 - 1) // (2 * (f2 + 1)) = 0 THEN 0
            ELSE v_obs * 1000000 //
                 (v_obs + f1 * (f1 - 1) // (2 * (f2 + 1))) END AS BIGINT)
         AS coverage_ppm
FROM agg
"""


def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning-G² keyness (operators/corpusstats.distinctive_terms):
    top-20 terms distinguishing the marker-mutated 'en' slice from the
    rest — the drift-attribution tool.  Planted m<lang> markers must
    dominate the ranking.  Oracle replays the two-cell G² with its own
    integer lgs."""
    from biothings_crawler_spark.operators.corpusstats import (
        distinctive_terms,
    )

    d = _t(spark, sf_dir, "documents")
    mut = d.selectExpr("doc_id", "lang", _NB_TEXT + " AS text")
    return distinctive_terms(mut, "text", F.col("lang") == "en", k=20)


SQL_DISTINCTIVE_TERMS = f"""
WITH m AS (SELECT doc_id, lang, {_NB_TEXT} AS text FROM documents),
occ AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS side,
               unnest({_SQL_WORDS}) AS term
        FROM m),
tf AS (SELECT term, CAST(SUM(side) AS BIGINT) AS a,
              CAST(SUM(1 - side) AS BIGINT) AS b
       FROM occ GROUP BY 1),
tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
               CAST(SUM(b) AS BIGINT) AS nb FROM tf)
SELECT term, a AS tf_focus, b AS tf_rest,
       CAST(2 * ((CASE WHEN a = 0 THEN 0 ELSE a *
                  (({ilog2_fxp_duck('a * (na + nb)')})
                   - ({ilog2_fxp_duck('(a + b) * na')})) END)
                 + (CASE WHEN b = 0 THEN 0 ELSE b *
                    (({ilog2_fxp_duck('b * (na + nb)')})
                     - ({ilog2_fxp_duck('(a + b) * nb')})) END))
            AS BIGINT) AS g2_fxp,
       a * nb > b * na AS overused
FROM tf CROSS JOIN tot
ORDER BY g2_fxp DESC, term LIMIT 20
"""


_KS_OLD_LAT = "CAST(floor(value * 12345) AS BIGINT)"
_KS_NEW_LAT = ("CAST(floor(value * 12345) AS BIGINT) * "
               "(CASE WHEN event_id % 3 = 0 THEN 4 ELSE 1 END)")


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS drift (operators/confidence.
    ks_drift_binned) between the even-id round's latencies and an
    odd-id round where a third of fetches got 4x slower (a planted
    2-bin shift).  Exact ppm over the 64-bin log2 histogram; oracle
    replays the CDF gap bin-for-bin."""
    from biothings_crawler_spark.operators.confidence import ks_drift_binned

    e = _t(spark, sf_dir, "events")
    old = e.filter("event_id % 2 = 0").selectExpr(f"{_KS_OLD_LAT} AS lat")
    new = e.filter("event_id % 2 = 1").selectExpr(f"{_KS_NEW_LAT} AS lat")
    return ks_drift_binned(old, new, "lat", drift_ppm=100_000)


SQL_KS_DRIFT = f"""
WITH oldh AS (
  SELECT length(bin(GREATEST({_KS_OLD_LAT}, 0) + 1)) - 1 AS bin,
         CAST(COUNT(*) AS BIGINT) AS c_old
  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
newh AS (
  SELECT length(bin(GREATEST({_KS_NEW_LAT}, 0) + 1)) - 1 AS bin,
         CAST(COUNT(*) AS BIGINT) AS c_new
  FROM events WHERE event_id % 2 = 1 GROUP BY 1),
m AS (SELECT coalesce(oldh.bin, newh.bin) AS bin,
             coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
      FROM oldh FULL JOIN newh ON oldh.bin = newh.bin),
cum AS (SELECT bin,
               SUM(c_old) OVER (ORDER BY bin) AS cum_old,
               SUM(c_new) OVER (ORDER BY bin) AS cum_new
        FROM m),
tot AS (SELECT CAST(SUM(c_old) AS BIGINT) AS n_old,
               CAST(SUM(c_new) AS BIGINT) AS n_new FROM m),
gaps AS (SELECT bin, n_old, n_new,
                abs(cum_old * 1000000 // n_old
                    - cum_new * 1000000 // n_new) AS gap_ppm
         FROM cum CROSS JOIN tot)
SELECT n_old, n_new,
       CAST(MAX(gap_ppm) AS BIGINT) AS d_ppm,
       CAST(MIN(CASE WHEN gap_ppm = (SELECT MAX(gap_ppm) FROM gaps)
                     THEN bin END) AS BIGINT) AS at_bin,
       MAX(gap_ppm) > 100000 AS drifted
FROM gaps GROUP BY n_old, n_new
"""


TEXTRANK_ROUNDS = 4


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (operators/textrank.textrank_keywords): 4
    weighted micro-unit rounds over the window-2 co-occurrence graph,
    top-20.  The oracle replays the identical per-edge floors through
    4 materialized CTE rounds."""
    from biothings_crawler_spark.operators.textrank import textrank_keywords

    return textrank_keywords(
        _t(spark, sf_dir, "documents"), "text", rounds=TEXTRANK_ROUNDS, k=20
    )


def _sql_textrank() -> str:
    rounds = []
    prev = "r0"
    for t in range(1, TEXTRANK_ROUNDS + 1):
        rounds.append(
            f"r{t} AS MATERIALIZED ("
            f"SELECT e.dst AS term, "
            f"CAST(150000 + SUM(r.s * 85 * e.w // (100 * e.w_out)) "
            f"AS BIGINT) AS s "
            f"FROM e JOIN {prev} r ON r.term = e.src GROUP BY 1)"
        )
        prev = f"r{t}"
    return f"""
WITH w AS (SELECT {_SQL_WORDS} AS ws FROM documents),
g AS (
  SELECT CASE WHEN len(ws) >= 2
         THEN list_transform(range(1, len(ws)),
                             i -> ws[i] || ' ' || ws[i + 1])
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
p AS (
  SELECT string_split(gram, ' ')[1] AS a, string_split(gram, ' ')[2] AS b,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM (SELECT unnest(grams) AS gram FROM g)
  WHERE string_split(gram, ' ')[1] <> string_split(gram, ' ')[2]
  GROUP BY 1, 2),
sym AS (SELECT a AS src, b AS dst, w FROM p
        UNION ALL SELECT b, a, w FROM p),
e0 AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w
       FROM sym GROUP BY 1, 2),
wout AS (SELECT src, CAST(SUM(w) AS BIGINT) AS w_out FROM e0 GROUP BY 1),
e AS MATERIALIZED (SELECT e0.src, e0.dst, e0.w, wout.w_out
                   FROM e0 JOIN wout USING (src)),
r0 AS (SELECT DISTINCT src AS term, CAST(1000000 AS BIGINT) AS s FROM e),
{", ".join(rounds)}
SELECT term, s AS score_micro FROM {prev}
ORDER BY score_micro DESC, term LIMIT 20
"""


SQL_TEXTRANK_KEYWORDS = _sql_textrank()


def q_search_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed lexical-hybrid serving pipeline: BM25 top-20 and
    Dirichlet-QL top-20 over the SAME index plane fused by RRF, final
    top-10 — probability-ranking and vector-space lexical evidence
    merged rank-wise (the all-text sibling of q_rrf_hybrid's
    BM25+ANN fusion).  Verified as ONE DuckDB statement across the
    whole composition."""
    from pyspark.sql import Window as W

    from biothings_crawler_spark.operators.bm25 import (
        bm25_topk,
        ql_dirichlet_topk,
    )
    from biothings_crawler_spark.operators.serving import rrf_fuse

    d = _t(spark, sf_dir, "documents")
    lex = bm25_topk(d, "doc_id", "text", BM25_QUERY, k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score"), "id"))
    ).select("id", "rank")
    lm = ql_dirichlet_topk(d, "doc_id", "text", BM25_QUERY, mu=QL_MU,
                           k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score_fxp"), "id"))
    ).select("id", "rank")
    fused = rrf_fuse([lex, lm])
    return fused.orderBy(F.desc("rrf_ppm"), "id").limit(10)


SQL_SEARCH_PIPELINE = f"""
WITH lex AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT)
           AS rank
  FROM ({SQL_BM25_TOPK}) t),
lm AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score_fxp DESC, id)
                  AS BIGINT) AS rank
  FROM ({SQL_QL_DIRICHLET}) t),
u AS (SELECT * FROM lex UNION ALL SELECT * FROM lm)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_lists,
       CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm
FROM u GROUP BY id
ORDER BY rrf_ppm DESC, id LIMIT 10
"""


FC_BLOCK = 16


def q_dict_frontcoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Front-coded term-dictionary accounting (operators/bm25.
    dictionary_frontcoding_report): per 16-term block of the sorted
    vocabulary, exact raw vs front-coded byte costs — the dictionary
    leg of the index-storage trio.  Oracle replays the prefix-
    partitioned ordering and every LCP fold."""
    from biothings_crawler_spark.operators.bm25 import (
        dictionary_frontcoding_report,
        inverted_postings,
    )

    d = _t(spark, sf_dir, "documents")
    return dictionary_frontcoding_report(
        inverted_postings(d, "doc_id", "text"), block=FC_BLOCK
    )


SQL_DICT_FRONTCODING = f"""
WITH vocab AS (
  SELECT DISTINCT term, substr(term, 1, 2) AS pfx FROM (
    SELECT unnest({_SQL_WORDS}) AS term FROM documents)),
seq AS (
  SELECT pfx, term,
         row_number() OVER (PARTITION BY pfx ORDER BY term) AS rn,
         lag(term) OVER (PARTITION BY pfx ORDER BY term) AS prev
  FROM vocab),
st AS (
  SELECT pfx,
         CAST((rn - 1) // {FC_BLOCK} AS BIGINT) AS block_no,
         (rn - 1) % {FC_BLOCK} = 0 AS is_head,
         CAST(length(term) AS BIGINT) AS tlen,
         CASE WHEN prev IS NULL THEN 0
              ELSE list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  list_transform(
                    range(1, least(length(term), length(prev)) + 1),
                    x -> CAST(x AS BIGINT))),
                (acc, i) -> CASE WHEN acc = i - 1
                  AND substr(term, CAST(i AS INTEGER), 1)
                      = substr(prev, CAST(i AS INTEGER), 1)
                  THEN i ELSE acc END) END AS lcp
  FROM seq)
SELECT pfx, block_no,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(1 + tlen) AS BIGINT) AS raw_bytes,
       CAST(SUM(CASE WHEN is_head THEN 1 + tlen
                     ELSE 2 + tlen - lcp END) AS BIGINT) AS packed_bytes,
       CAST((SUM(1 + tlen) - SUM(CASE WHEN is_head THEN 1 + tlen
                                      ELSE 2 + tlen - lcp END)) * 1000000
            // SUM(1 + tlen) AS BIGINT) AS savings_ppm
FROM st GROUP BY 1, 2
"""


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded nDCG@10 (operators/bm25.ndcg_at_k) for the BM25 and QL
    runs of the shared query against deterministic planted judgments
    (doc_id%7==0 relevant, grade 1 + doc_id%3) — the exact fixed-point
    discount makes the one transcendental eval metric oracle-exact."""
    from pyspark.sql import Window as W

    from biothings_crawler_spark.operators.bm25 import (
        bm25_topk,
        ndcg_at_k,
        ql_dirichlet_topk,
    )

    d = _t(spark, sf_dir, "documents")
    lex = bm25_topk(d, "doc_id", "text", BM25_QUERY, k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score"), "id"))
    ).select(F.lit("bm25").alias("query_id"), "id", "rank")
    lm = ql_dirichlet_topk(d, "doc_id", "text", BM25_QUERY, mu=QL_MU,
                           k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score_fxp"), "id"))
    ).select(F.lit("ql").alias("query_id"), "id", "rank")
    qrels = (
        d.filter("doc_id % 7 = 0")
        .selectExpr("doc_id AS id", "CAST(1 + doc_id % 3 AS BIGINT) AS rel")
    )
    qrels2 = qrels.selectExpr("'bm25' AS query_id", "id", "rel").unionByName(
        qrels.selectExpr("'ql' AS query_id", "id", "rel")
    )
    return ndcg_at_k(lex.unionByName(lm), qrels2, k=10)


SQL_NDCG = f"""
WITH lex AS (
  SELECT 'bm25' AS query_id, id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT) AS rank
  FROM ({SQL_BM25_TOPK}) t),
lm AS (
  SELECT 'ql' AS query_id, id,
         CAST(ROW_NUMBER() OVER (ORDER BY score_fxp DESC, id) AS BIGINT)
           AS rank
  FROM ({SQL_QL_DIRICHLET}) t),
run AS (SELECT * FROM lex UNION ALL SELECT * FROM lm),
qr AS (SELECT doc_id AS id, CAST(1 + doc_id % 3 AS BIGINT) AS rel
       FROM documents WHERE doc_id % 7 = 0),
qr2 AS (SELECT 'bm25' AS query_id, id, rel FROM qr
        UNION ALL SELECT 'ql', id, rel FROM qr),
dcg AS (
  SELECT r.query_id,
         CAST(SUM(q.rel * 1000000000000
                  // ({ilog2_fxp_duck('r.rank + 1')})) AS BIGINT) AS dcg_fxp
  FROM run r JOIN qr2 q ON q.query_id = r.query_id AND q.id = r.id
  WHERE r.rank <= 10 GROUP BY 1),
ideal AS (
  SELECT query_id,
         CAST(SUM(rel * 1000000000000
                  // ({ilog2_fxp_duck('rank + 1')})) AS BIGINT) AS idcg_fxp
  FROM (SELECT query_id, rel,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rel DESC, id) AS BIGINT)
                 AS rank
        FROM qr2) WHERE rank <= 10 GROUP BY 1)
SELECT i.query_id, coalesce(d.dcg_fxp, 0) AS dcg_fxp, i.idcg_fxp,
       CAST(coalesce(d.dcg_fxp, 0) * 1000000 // i.idcg_fxp AS BIGINT)
         AS ndcg_ppm
FROM ideal i LEFT JOIN dcg d USING (query_id)
"""


def q_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-average-precision@10 (operators/bm25.map_at_k) for the
    same two runs and planted judgments as q_ndcg — AP is purely
    rational, so the whole metric is plain integer floors."""
    from pyspark.sql import Window as W

    from biothings_crawler_spark.operators.bm25 import (
        bm25_topk,
        map_at_k,
        ql_dirichlet_topk,
    )

    d = _t(spark, sf_dir, "documents")
    lex = bm25_topk(d, "doc_id", "text", BM25_QUERY, k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score"), "id"))
    ).select(F.lit("bm25").alias("query_id"), "id", "rank")
    lm = ql_dirichlet_topk(d, "doc_id", "text", BM25_QUERY, mu=QL_MU,
                           k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score_fxp"), "id"))
    ).select(F.lit("ql").alias("query_id"), "id", "rank")
    qrels = (
        d.filter("doc_id % 7 = 0")
        .selectExpr("doc_id AS id", "CAST(1 + doc_id % 3 AS BIGINT) AS rel")
    )
    qrels2 = qrels.selectExpr("'bm25' AS query_id", "id", "rel").unionByName(
        qrels.selectExpr("'ql' AS query_id", "id", "rel")
    )
    return map_at_k(lex.unionByName(lm), qrels2, k=10)


SQL_MAP_EVAL = f"""
WITH lex AS (
  SELECT 'bm25' AS query_id, id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT) AS rank
  FROM ({SQL_BM25_TOPK}) t),
lm AS (
  SELECT 'ql' AS query_id, id,
         CAST(ROW_NUMBER() OVER (ORDER BY score_fxp DESC, id) AS BIGINT)
           AS rank
  FROM ({SQL_QL_DIRICHLET}) t),
run AS (SELECT * FROM lex UNION ALL SELECT * FROM lm),
qr AS (SELECT doc_id AS id FROM documents WHERE doc_id % 7 = 0),
qr2 AS (SELECT 'bm25' AS query_id, id FROM qr
        UNION ALL SELECT 'ql', id FROM qr),
tot AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM qr2 GROUP BY 1),
hits AS (SELECT r.query_id, r.rank FROM run r
         JOIN qr2 q ON q.query_id = r.query_id AND q.id = r.id
         WHERE r.rank <= 10),
per AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(SUM(cum * 1000000 // rank) AS BIGINT) AS sum_p
  FROM (SELECT query_id, rank,
               COUNT(*) OVER (PARTITION BY query_id ORDER BY rank
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
        FROM hits) GROUP BY 1)
SELECT t.query_id, t.n_rel,
       coalesce(p.n_hits, 0) AS n_hits,
       CAST(coalesce(p.sum_p, 0) // t.n_rel AS BIGINT) AS ap_ppm
FROM tot t LEFT JOIN per p USING (query_id)
"""


def q_err_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Reciprocal Rank@10 (operators/bm25.err_at_k, cascade
    model) for the same runs and graded judgments as q_ndcg — the
    survival-probability fold replayed by the oracle with a packed
    single-BIGINT list_reduce."""
    from pyspark.sql import Window as W

    from biothings_crawler_spark.operators.bm25 import (
        bm25_topk,
        err_at_k,
        ql_dirichlet_topk,
    )

    d = _t(spark, sf_dir, "documents")
    lex = bm25_topk(d, "doc_id", "text", BM25_QUERY, k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score"), "id"))
    ).select(F.lit("bm25").alias("query_id"), "id", "rank")
    lm = ql_dirichlet_topk(d, "doc_id", "text", BM25_QUERY, mu=QL_MU,
                           k=20).withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("score_fxp"), "id"))
    ).select(F.lit("ql").alias("query_id"), "id", "rank")
    qrels = (
        d.filter("doc_id % 7 = 0")
        .selectExpr("doc_id AS id", "CAST(1 + doc_id % 3 AS BIGINT) AS rel")
    )
    qrels2 = qrels.selectExpr("'bm25' AS query_id", "id", "rel").unionByName(
        qrels.selectExpr("'ql' AS query_id", "id", "rel")
    )
    return err_at_k(lex.unionByName(lm), qrels2, k=10, g_max=3)


def _sql_err() -> str:
    g = "CAST(string_split(e, ':')[2] AS BIGINT)"
    r = "CAST(string_split(e, ':')[1] AS BIGINT)"
    step = (
        f"((acc // 10000000000) * (8 - ((1::BIGINT << {g}) - 1)) // 8)"
        f" * 10000000000"
        f" + acc % 10000000000"
        f" + ((acc // 10000000000) * ((1::BIGINT << {g}) - 1)"
        f" * 1000 // (8 * {r}))"
    )
    return f"""
WITH lex AS (
  SELECT 'bm25' AS query_id, id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT) AS rank
  FROM ({SQL_BM25_TOPK}) t),
lm AS (
  SELECT 'ql' AS query_id, id,
         CAST(ROW_NUMBER() OVER (ORDER BY score_fxp DESC, id) AS BIGINT)
           AS rank
  FROM ({SQL_QL_DIRICHLET}) t),
run AS (SELECT * FROM lex UNION ALL SELECT * FROM lm),
qr AS (SELECT doc_id AS id, CAST(1 + doc_id % 3 AS BIGINT) AS rel
       FROM documents WHERE doc_id % 7 = 0),
qr2 AS (SELECT 'bm25' AS query_id, id, rel FROM qr
        UNION ALL SELECT 'ql', id, rel FROM qr),
graded AS (
  SELECT r.query_id, r.rank, coalesce(q.rel, 0) AS g
  FROM run r LEFT JOIN qr2 q ON q.query_id = r.query_id AND q.id = r.id
  WHERE r.rank <= 10),
ser AS (
  SELECT query_id,
         CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_graded,
         list(CAST(rank AS VARCHAR) || ':' || CAST(g AS VARCHAR)
              ORDER BY rank) AS rs
  FROM graded GROUP BY 1)
SELECT query_id, n_graded,
       CAST(list_reduce(list_prepend('{10**10 * 10**6}', rs),
                        (acc, e) -> CAST(({step.replace("acc", "CAST(acc AS BIGINT)")}) AS VARCHAR))
            AS BIGINT) % 10000000000 AS err_ppb
FROM ser
"""


SQL_ERR_EVAL = _sql_err()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_err_eval": q_err_eval,
    "q_map_eval": q_map_eval,
    "q_ndcg": q_ndcg,
    "q_dict_frontcoding": q_dict_frontcoding,
    "q_search_pipeline": q_search_pipeline,
    "q_textrank_keywords": q_textrank_keywords,
    "q_ks_drift": q_ks_drift,
    "q_distinctive_terms": q_distinctive_terms,
    "q_wilson_errors": q_wilson_errors,
    "q_vocab_coverage": q_vocab_coverage,
    "q_temperature_mix": q_temperature_mix,
    "q_profile_drift": q_profile_drift,
    "q_prospective_match": q_prospective_match,
    "q_tokenizer_fertility": q_tokenizer_fertility,
    "q_query_clarity": q_query_clarity,
    "q_cori_shards": q_cori_shards,
    "q_ltr_features": q_ltr_features,
    "q_pruned_topk": q_pruned_topk,
    "q_mojibake": q_mojibake,
    "q_burst_intervals": q_burst_intervals,
    "q_char_entropy": q_char_entropy,
    "q_ql_dirichlet": q_ql_dirichlet,
    "q_dsir_weights": q_dsir_weights,
    "q_nb_train": q_nb_train,
    "q_nb_classify": q_nb_classify,
    # --- Gate-rotation rule: the driver's correctness gate samples the FIRST
    # 50 entries, so queries whose operators changed since their last green
    # driver row are seated here, newest first.  Round 4 added more queries
    # than the window holds; the window carries the LEAST-SOAKED ones (late-
    # round additions: textnorm/HTTP-payload/CDC/z-order planes, the archive +
    # HTTP layers, then the most recent analysis operators).  Earlier round-4
    # additions follow immediately after the window — the full-registry oracle
    # run (scripts/compare_oracle.py, exit 0) covers them each session.
    "q_pq_encode": q_pq_encode,
    "q_pq_adc": q_pq_adc,
    "q_ktruss": q_ktruss,
    "q_prf_search": q_prf_search,
    "q_hilbert_key": q_hilbert_key,
    "q_ucb_recrawl": q_ucb_recrawl,
    "q_slo_burn": q_slo_burn,
    "q_vocab_growth": q_vocab_growth,
    "q_zipf_profile": q_zipf_profile,
    "q_readability": q_readability,
    "q_trending_terms": q_trending_terms,
    "q_anchor_summary": q_anchor_summary,
    "q_anchor_field": q_anchor_field,
    "q_anchor_bm25f": q_anchor_bm25f,
    "q_autocomplete": q_autocomplete,
    "q_exact_quantiles": q_exact_quantiles,
    "q_blockmax_skips": q_blockmax_skips,
    "q_assortativity": q_assortativity,
    "q_effective_diameter": q_effective_diameter,
    "q_priority_sample": q_priority_sample,
    "q_ppr_push": q_ppr_push,
    "q_cusum_drift": q_cusum_drift,
    "q_spam_mass": q_spam_mass,
    "q_clustering_coeff": q_clustering_coeff,
    "q_spell_suggest": q_spell_suggest,
    "q_modularity": q_modularity,
    "q_kmeans": q_kmeans,
    "q_soft404_probe": q_soft404_probe,
    "q_ip_politeness": q_ip_politeness,
    "q_opic": q_opic,
    "q_lm_terciles": q_lm_terciles,
    "q_hyperball": q_hyperball,
    "q_harmonic_centrality": q_harmonic_centrality,
    "q_bowtie": q_bowtie,
    "q_random_walks": q_random_walks,
    "q_ann_truncated_topk": q_ann_truncated_topk,
    "q_theta_overlap": q_theta_overlap,
    "q_jpeg_decode": q_jpeg_decode,
    "q_video_frames": q_video_frames,
    "q_pagerank_incremental": q_pagerank_incremental,
    "q_gif_decode": q_gif_decode,
    "q_host_overlap": q_host_overlap,
    "q_opic_greedy": q_opic_greedy,
    "q_lang_smooth": q_lang_smooth,
    "q_salsa": q_salsa,
    "q_fetch_fairness": q_fetch_fairness,
    "q_robots_drift": q_robots_drift,
    "q_hll_by_host": q_hll_by_host,
    "q_priority_fusion": q_priority_fusion,
    "q_graph_census": q_graph_census,
    "q_curriculum": q_curriculum,
    "q_rrf_hybrid": q_rrf_hybrid,
    "q_rank_correlation": q_rank_correlation,
    "q_indegree_dist": q_indegree_dist,
    "q_fetch_schedule": q_fetch_schedule,
    "q_url_identity": q_url_identity,
    "q_seed_cover": q_seed_cover,
    "q_crawl_cube": q_crawl_cube,
    "q_collocations": q_collocations,
    "q_leakage_splits": q_leakage_splits,
    "q_retry_backoff": q_retry_backoff,
    "q_discovery_forecast": q_discovery_forecast,
    "q_kcore": q_kcore,
    "q_jaccard_join": q_jaccard_join,
    "q_related_hosts": q_related_hosts,
    "q_host_triangles": q_host_triangles,
    "q_microdata_extract": q_microdata_extract,
    "q_compaction_plan": q_compaction_plan,
    "q_audio_fingerprint": q_audio_fingerprint,
    "q_image_phash": q_image_phash,
    "q_image_neardup": q_image_neardup,
    "q_pdf_text": q_pdf_text,
    "q_license_detect": q_license_detect,
    "q_epoch_alloc": q_epoch_alloc,
    "q_proximity_topk": q_proximity_topk,
    "q_exif_extract": q_exif_extract,
    "q_sitemap_render": q_sitemap_render,
    "q_ngram_novelty": q_ngram_novelty,
    "q_release_manifest": q_release_manifest,
    "q_scc_census": q_scc_census,
    "q_robots_render": q_robots_render,
    "q_calibration": q_calibration,
    "q_audio_match": q_audio_match,
    "q_hard_negatives": q_hard_negatives,
    "q_manifest_diff": q_manifest_diff,
    "q_host_boilerplate": q_host_boilerplate,
    "q_homograph_hosts": q_homograph_hosts,
    "q_nofollow_links": q_nofollow_links,
    "q_html_tables": q_html_tables,
    "q_pagination_chains": q_pagination_chains,
    "q_js_required": q_js_required,
    "q_query_parse": q_query_parse,
    "q_shard_skip": q_shard_skip,
    "q_word_segment": q_word_segment,
    "q_feed_render": q_feed_render,
    "q_embedding_drift": q_embedding_drift,
    "q_refs_strip": q_refs_strip,
    "q_depth_yield": q_depth_yield,
    "q_rendezvous_assign": q_rendezvous_assign,
    "q_meta_refresh": q_meta_refresh,
    "q_cloaking_hosts": q_cloaking_hosts,
    "q_idn_decode": q_idn_decode,
    "q_pairwise_auc": q_pairwise_auc,
    "q_label_agreement": q_label_agreement,
    "q_margin_mining": q_margin_mining,
    "q_rdfa_extract": q_rdfa_extract,
    "q_span_corruption": q_span_corruption,
    "q_sitemap_scope": q_sitemap_scope,
    "q_suffix_array": q_suffix_array,
    "q_survival_ledger": q_survival_ledger,
    "q_event_transitions": q_event_transitions,
    "q_heading_chunks": q_heading_chunks,
    "q_maxsim_topk": q_maxsim_topk,
    "q_lexicon_filter": q_lexicon_filter,
    "q_schema_drift": q_schema_drift,
    "q_erasure_impact": q_erasure_impact,
    "q_active_select": q_active_select,
    "q_pack_fragmentation": q_pack_fragmentation,
    "q_identifier_extract": q_identifier_extract,
    "q_mad_outliers": q_mad_outliers,
    "q_url_templates": q_url_templates,
    "q_maxscore_topk": q_maxscore_topk,
    "q_substr_spans": q_substr_spans,
    "q_substr_strip": q_substr_strip,
    "q_tfidf_neighbors": q_tfidf_neighbors,
    "q_seed_distance": q_seed_distance,
    "q_host_communities": q_host_communities,
    "q_phrase_topk": q_phrase_topk,
    "q_snippets": q_snippets,
    "q_diverse_topk": q_diverse_topk,
    "q_postings_ef": q_postings_ef,
    "q_bm25f_topk": q_bm25f_topk,
    "q_waterfill_budget": q_waterfill_budget,
    "q_payload_pipeline": q_payload_pipeline,
    "q_bpe_merges": q_bpe_merges,
    "q_bpe_segment": q_bpe_segment,
    "q_typosquat_pairs": q_typosquat_pairs,
    "q_delta_storage": q_delta_storage,
    "q_zorder_key": q_zorder_key,
    "q_cdc_chunks": q_cdc_chunks,
    "q_gzip_decode": q_gzip_decode,
    "q_chunked_decode": q_chunked_decode,
    "q_nfc_normalize": q_nfc_normalize,
    "q_html_entities": q_html_entities,
    "q_png_decode": q_png_decode,
    "q_line_trim": q_line_trim,
    "q_pct_normalize": q_pct_normalize,
    "q_wet_render": q_wet_render,
    "q_archive_roundtrip": q_archive_roundtrip,
    "q_fetch_quality": q_fetch_quality,
    "q_opengraph": q_opengraph,
    "q_feed_parse": q_feed_parse,
    "q_meta_robots": q_meta_robots,
    "q_sitemap_refetch": q_sitemap_refetch,
    "q_recrawl_clamped": q_recrawl_clamped,
    "q_cache_ttl": q_cache_ttl,
    "q_charset_sniff": q_charset_sniff,
    "q_warc_render": q_warc_render,
    "q_cdx_revisits": q_cdx_revisits,
    "q_etld1": q_etld1,
    "q_cdx_index": q_cdx_index,
    "q_politeness_audit": q_politeness_audit,
    "q_surt_keys": q_surt_keys,
    "q_compact_index": q_compact_index,
    "q_sharded_postings": q_sharded_postings,
    "q_postings_varint": q_postings_varint,
    "q_trustrank": q_trustrank,
    "q_shard_rebalance": q_shard_rebalance,
    "q_wav_decode": q_wav_decode,
    "q_hist_merge": q_hist_merge,
    "q_incremental_neardup": q_incremental_neardup,
    "q_token_budget": q_token_budget,
    "q_quality_sample": q_quality_sample,
    "q_conditional_fetch": q_conditional_fetch,
    "q_hreflang_map": q_hreflang_map,
    "q_site_families": q_site_families,
    "q_latest_snapshot": q_latest_snapshot,
    "q_adaptive_budgets": q_adaptive_budgets,
    "q_relevance_scores": q_relevance_scores,
    "q_containment_pairs": q_containment_pairs,
    "q_robots_wildcards": q_robots_wildcards,
    "q_frontier_aging": q_frontier_aging,
    "q_latency_quantiles": q_latency_quantiles,
    "q_template_fps": q_template_fps,
    "q_script_mix": q_script_mix,
    "q_canonical_clusters": q_canonical_clusters,
    "q_mirror_hosts": q_mirror_hosts,
    "q_c4_filter": q_c4_filter,
    "q_hits": q_hits,
    "q_domain_scorecard": q_domain_scorecard,
    "q_robots_parse": q_robots_parse,
    "q_robots_enforce": q_robots_enforce,
    "q_blocklist_filter": q_blocklist_filter,
    "q_lm_score": q_lm_score,
    "q_seq_packing": q_seq_packing,
    "q_pack_stats": q_pack_stats,
    "q_dust_params": q_dust_params,
    "q_dust_strip": q_dust_strip,
    "q_sitemap_parse": q_sitemap_parse,
    "q_countmin_hosts": q_countmin_hosts,
    "q_crawl_admission": q_crawl_admission,
    "q_training_prep": q_training_prep,
    "q_main_content": q_main_content,
    "q_url_history": q_url_history,
    "q_link_farm": q_link_farm,
    "q_corpus_datasheet": q_corpus_datasheet,
    "q_crawl_traps": q_crawl_traps,
    "q_host_skew": q_host_skew,
    "q_anchor_text": q_anchor_text,
    "q_warc_ingest": q_warc_ingest,
    "q_index_merge": q_index_merge,
    "q_retrieval_metrics": q_retrieval_metrics,
    "q_heavy_bigrams": q_heavy_bigrams,
    "q_crawl_budget": q_crawl_budget,
    "q_ann_ivf_topk": q_ann_ivf_topk,
    "q_neardup_clusters": q_neardup_clusters,
    "q_tokenizer_model": q_tokenizer_model,
    "q_semantic_dedup": q_semantic_dedup,
    "q_ann_ivf_quantized": q_ann_ivf_quantized,
    "q_crawl_refetch_round": q_crawl_refetch_round,
    "q_ann_rerank": q_ann_rerank,
    "q_pii_scrub": q_pii_scrub,
    "q_web_refine": q_web_refine,
    "q_sessionize": q_sessionize,
    "q_aimd_rates": q_aimd_rates,
    "q_soft404": q_soft404,
    "q_postings_chunks": q_postings_chunks,
    "q_hll_small": q_hll_small,
    "q_lang_id_model": q_lang_id_model,
    "q_passage_dedup": q_passage_dedup,
    "q_recrawl_schedule": q_recrawl_schedule,
    "q_quantize_embeddings": q_quantize_embeddings,
    "q_ann_quantized_topk": q_ann_quantized_topk,
    "q_bigram_coverage": q_bigram_coverage,
    "q_snapshot_diff": q_snapshot_diff,
    "q_refetch_round": q_refetch_round,
    "q_clean_corpus": q_clean_corpus,
    "q_redirect_trace": q_redirect_trace,
    "q_reindex_conflicts": q_reindex_conflicts,
    "q_existence_sample": q_existence_sample,
    "q_sitemap_from_robots": q_sitemap_from_robots,
    "q_discovery_dump": q_discovery_dump,
    "q_mainentity_unwrap": q_mainentity_unwrap,
    "q_repetition_stats": q_repetition_stats,
    "q_decontamination": q_decontamination,
    "q_html_to_text": q_html_to_text,
    "q_mixture_sample": q_mixture_sample,
    "q_doc_chunks": q_doc_chunks,
    "q_pagerank": q_pagerank,
    "q_domain_blocklist": q_domain_blocklist,
    "q_dedup_weights": q_dedup_weights,
    "q_inverted_index": q_inverted_index,
    "q_bm25_topk": q_bm25_topk,
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
    "q_hypertable_rollup": q_hypertable_rollup,
    "q_hll_distinct": q_hll_distinct,
    "q_pricing_summary": q_pricing_summary,
    "q_top_revenue_orders": q_top_revenue_orders,
    "q_region_revenue": q_region_revenue,
    "q_politeness_quota": q_politeness_quota,
    "q_seen_antijoin": q_seen_antijoin,
    "q_frontier_dedup": q_frontier_dedup,
    "q_field_coverage": q_field_coverage,
    "q_coverage_pivot": q_coverage_pivot,
    "q_funder_top": q_funder_top,
    "q_search_view": q_search_view,
    "q_exact_dedup": q_exact_dedup,
    "q_minhash_lsh": q_minhash_lsh,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_simhash_pairs": q_simhash_pairs,
    "q_embedding_near_dup": q_embedding_near_dup,
    "q_ann_brute_topk": q_ann_brute_topk,
    "q_lang_id": q_lang_id,
    "q_token_stats": q_token_stats,
    "q_quality_stats": q_quality_stats,
    "q_incremental_cursor": q_incremental_cursor,
    "q_event_windows": q_event_windows,
    "q_union_sources": q_union_sources,
    "q_multimodal_features": q_multimodal_features,
    "q_id_range_scan": q_id_range_scan,
    "q_sitemap_expand": q_sitemap_expand,
    "q_robots_filter": q_robots_filter,
    "q_host_budgets": q_host_budgets,
    "q_domain_key": q_domain_key,
    "q_incremental_round": q_incremental_round,
    "q_upload_geo_transform": q_upload_geo_transform,
    "q_upload_dataset_envelope": q_upload_dataset_envelope,
    "q_geo_table_scrape": q_geo_table_scrape,
    "q_upload_zenodo_transform": q_upload_zenodo_transform,
    "q_upload_immport_transform": q_upload_immport_transform,
    "q_pmid_citation": q_pmid_citation,
    "q_link_extract": q_link_extract,
    "q_crawl_bfs_e2e": q_crawl_bfs_e2e,
    "q_crawl_docs": q_crawl_docs,
    "q_jsonld_extract": q_jsonld_extract,
    "q_api_seed_expansion": q_api_seed_expansion,
    "q_api_error_docs": q_api_error_docs,
    "q_api_stop_short": q_api_stop_short,
    "q_hit_transform": q_hit_transform,
    "q_random_sample": q_random_sample,
    "q_id_list_scan": q_id_list_scan,
    "q_clic_hub_links": q_clic_hub_links,
    "q_line_dedup": q_line_dedup,
    "q_winnow_fingerprints": q_winnow_fingerprints,
    "q_sessionize_fold": q_sessionize_fold,
    "q_wat_render": q_wat_render,
    "q_kneser_ney": q_kneser_ney,
    "q_stupid_backoff": q_stupid_backoff,
    "q_hreflang_clusters": q_hreflang_clusters,
    "q_url_parallel_pairs": q_url_parallel_pairs,
    "q_bitext_verify": q_bitext_verify,
    "q_sent_align": q_sent_align,
    "q_rag_chunks": q_rag_chunks,
    "q_ai_optout": q_ai_optout,
    "q_texttiling": q_texttiling,
    "q_topic_chunks": q_topic_chunks,
    "q_sitemap_audit": q_sitemap_audit,
    "q_textrank_summary": q_textrank_summary,
}

# Gate-rotation (round 6, optimization round): the driver's correctness gate
# samples the FIRST 50 registry entries.  This round rewrote the internals of
# the kmeans/PQ training loops, the HyperBall register state, the
# seed-distance/bowtie BFS, the pagerank-family lineage batching, the MinHash
# signature kernel, the politeness phase fusion and the pipeline
# materialization cuts — every query over a touched operator is seated FIRST
# so its CURRENT implementation gets a hard driver row (the rotation
# discipline from rounds 4-5), followed by the never-gated queries VERDICT r5
# named, then further never-gated entries.  Registry size unchanged (the
# growth freeze r4/r5 asked for).  The full-registry oracle run
# (scripts/compare_oracle.py) still covers all 344 every session.
_GATE_FIRST: list[str] = [
    # queries over operators rewritten this round (stale green rows)
    "q_kmeans", "q_pq_encode", "q_pq_adc", "q_hyperball",
    "q_harmonic_centrality", "q_effective_diameter", "q_seed_distance",
    "q_bowtie", "q_scc_census", "q_pagerank", "q_trustrank", "q_hits",
    "q_salsa", "q_host_communities", "q_ppr_push", "q_spam_mass",
    "q_pagerank_incremental", "q_random_walks", "q_minhash_lsh",
    "q_incremental_neardup", "q_neardup_clusters", "q_clean_corpus",
    "q_ngram_novelty", "q_politeness_quota", "q_ip_politeness",
    "q_textrank_keywords", "q_textrank_summary", "q_site_families",
    "q_modularity", "q_priority_fusion", "q_frontier_aging",
    "q_crawl_budget", "q_depth_yield", "q_leakage_splits",
    # VERDICT r5's named never-gated queries
    "q_substr_spans", "q_bm25f_topk", "q_semantic_dedup", "q_rag_chunks",
    "q_ai_optout", "q_texttiling", "q_erasure_impact", "q_topic_chunks",
    # further never-gated entries (toward the 229/344 union target)
    "q_containment_pairs", "q_active_select", "q_cdc_chunks", "q_c4_filter",
    "q_bpe_merges", "q_audio_fingerprint", "q_archive_roundtrip",
    "q_crawl_admission",
]
QUERIES = {
    **{k: QUERIES[k] for k in _GATE_FIRST},
    **{k: v for k, v in QUERIES.items() if k not in set(_GATE_FIRST)},
}

ORACLES: dict[str, str] = {
    "q_err_eval": SQL_ERR_EVAL,
    "q_map_eval": SQL_MAP_EVAL,
    "q_ndcg": SQL_NDCG,
    "q_dict_frontcoding": SQL_DICT_FRONTCODING,
    "q_search_pipeline": SQL_SEARCH_PIPELINE,
    "q_textrank_keywords": SQL_TEXTRANK_KEYWORDS,
    "q_ks_drift": SQL_KS_DRIFT,
    "q_distinctive_terms": SQL_DISTINCTIVE_TERMS,
    "q_wilson_errors": SQL_WILSON_ERRORS,
    "q_vocab_coverage": SQL_VOCAB_COVERAGE,
    "q_temperature_mix": SQL_TEMPERATURE_MIX,
    "q_profile_drift": SQL_PROFILE_DRIFT,
    "q_prospective_match": SQL_PROSPECTIVE_MATCH,
    "q_tokenizer_fertility": SQL_TOKENIZER_FERTILITY,
    "q_query_clarity": SQL_QUERY_CLARITY,
    "q_cori_shards": SQL_CORI_SHARDS,
    "q_ltr_features": SQL_LTR_FEATURES,
    "q_pruned_topk": SQL_PRUNED_TOPK,
    "q_mojibake": SQL_MOJIBAKE,
    "q_burst_intervals": SQL_BURST_INTERVALS,
    "q_char_entropy": SQL_CHAR_ENTROPY,
    "q_ql_dirichlet": SQL_QL_DIRICHLET,
    "q_dsir_weights": SQL_DSIR_WEIGHTS,
    "q_nb_train": SQL_NB_TRAIN,
    "q_nb_classify": SQL_NB_CLASSIFY,
    "q_modularity": SQL_MODULARITY,
    "q_kmeans": SQL_KMEANS,
    "q_soft404_probe": SQL_SOFT404_PROBE,
    "q_ip_politeness": SQL_IP_POLITENESS,
    "q_opic": SQL_OPIC,
    "q_lm_terciles": SQL_LM_TERCILES,
    "q_hyperball": SQL_HYPERBALL,
    "q_harmonic_centrality": SQL_HARMONIC_CENTRALITY,
    "q_bowtie": SQL_BOWTIE,
    "q_random_walks": SQL_RANDOM_WALKS,
    "q_ann_truncated_topk": SQL_ANN_TRUNCATED_TOPK,
    "q_theta_overlap": SQL_THETA_OVERLAP,
    "q_jpeg_decode": SQL_JPEG_DECODE,
    "q_video_frames": SQL_VIDEO_FRAMES,
    "q_pagerank_incremental": SQL_PAGERANK_INCREMENTAL,
    "q_gif_decode": SQL_GIF_DECODE,
    "q_host_overlap": SQL_HOST_OVERLAP,
    "q_opic_greedy": SQL_OPIC_GREEDY,
    "q_lang_smooth": SQL_LANG_SMOOTH,
    "q_salsa": SQL_SALSA,
    "q_fetch_fairness": SQL_FETCH_FAIRNESS,
    "q_robots_drift": SQL_ROBOTS_DRIFT,
    "q_hll_by_host": SQL_HLL_BY_HOST,
    "q_priority_fusion": SQL_PRIORITY_FUSION,
    "q_graph_census": SQL_GRAPH_CENSUS,
    "q_curriculum": SQL_CURRICULUM,
    "q_rrf_hybrid": SQL_RRF_HYBRID,
    "q_rank_correlation": SQL_RANK_CORRELATION,
    "q_spell_suggest": SQL_SPELL_SUGGEST,
    "q_clustering_coeff": SQL_CLUSTERING_COEFF,
    "q_pq_encode": SQL_PQ_ENCODE,
    "q_pq_adc": SQL_PQ_ADC,
    "q_ktruss": SQL_KTRUSS,
    "q_prf_search": SQL_PRF_SEARCH,
    "q_hilbert_key": SQL_HILBERT_KEY,
    "q_ucb_recrawl": SQL_UCB_RECRAWL,
    "q_slo_burn": SQL_SLO_BURN,
    "q_vocab_growth": SQL_VOCAB_GROWTH,
    "q_zipf_profile": SQL_ZIPF_PROFILE,
    "q_readability": SQL_READABILITY,
    "q_trending_terms": SQL_TRENDING_TERMS,
    "q_anchor_summary": SQL_ANCHOR_SUMMARY,
    "q_anchor_field": SQL_ANCHOR_FIELD,
    "q_anchor_bm25f": SQL_ANCHOR_BM25F,
    "q_autocomplete": SQL_AUTOCOMPLETE,
    "q_exact_quantiles": SQL_EXACT_QUANTILES,
    "q_blockmax_skips": SQL_BLOCKMAX_SKIPS,
    "q_assortativity": SQL_ASSORTATIVITY,
    "q_effective_diameter": SQL_EFFECTIVE_DIAMETER,
    "q_priority_sample": SQL_PRIORITY_SAMPLE,
    "q_ppr_push": SQL_PPR_PUSH,
    "q_cusum_drift": SQL_CUSUM_DRIFT,
    "q_spam_mass": SQL_SPAM_MASS,
    "q_indegree_dist": SQL_INDEGREE_DIST,
    "q_fetch_schedule": SQL_FETCH_SCHEDULE,
    "q_url_identity": SQL_URL_IDENTITY,
    "q_seed_cover": SQL_SEED_COVER,
    "q_crawl_cube": SQL_CRAWL_CUBE,
    "q_collocations": SQL_COLLOCATIONS,
    "q_leakage_splits": SQL_LEAKAGE_SPLITS,
    "q_retry_backoff": SQL_RETRY_BACKOFF,
    "q_discovery_forecast": SQL_DISCOVERY_FORECAST,
    "q_kcore": SQL_KCORE,
    "q_jaccard_join": SQL_JACCARD_JOIN,
    "q_related_hosts": SQL_RELATED_HOSTS,
    "q_host_triangles": SQL_HOST_TRIANGLES,
    "q_microdata_extract": SQL_MICRODATA_EXTRACT,
    "q_compaction_plan": SQL_COMPACTION_PLAN,
    "q_audio_fingerprint": SQL_AUDIO_FINGERPRINT,
    "q_image_phash": SQL_IMAGE_PHASH,
    "q_image_neardup": SQL_IMAGE_NEARDUP,
    "q_pdf_text": SQL_PDF_TEXT,
    "q_license_detect": SQL_LICENSE_DETECT,
    "q_epoch_alloc": SQL_EPOCH_ALLOC,
    "q_proximity_topk": SQL_PROXIMITY_TOPK,
    "q_exif_extract": SQL_EXIF_EXTRACT,
    "q_sitemap_render": SQL_SITEMAP_RENDER,
    "q_ngram_novelty": SQL_NGRAM_NOVELTY,
    "q_release_manifest": SQL_RELEASE_MANIFEST,
    "q_scc_census": SQL_SCC_CENSUS,
    "q_robots_render": SQL_ROBOTS_RENDER,
    "q_calibration": SQL_CALIBRATION,
    "q_audio_match": SQL_AUDIO_MATCH,
    "q_hard_negatives": SQL_HARD_NEGATIVES,
    "q_manifest_diff": SQL_MANIFEST_DIFF,
    "q_host_boilerplate": SQL_HOST_BOILERPLATE,
    "q_homograph_hosts": SQL_HOMOGRAPH_HOSTS,
    "q_nofollow_links": SQL_NOFOLLOW_LINKS,
    "q_html_tables": SQL_HTML_TABLES,
    "q_pagination_chains": SQL_PAGINATION_CHAINS,
    "q_js_required": SQL_JS_REQUIRED,
    "q_query_parse": SQL_QUERY_PARSE,
    "q_shard_skip": SQL_SHARD_SKIP,
    "q_word_segment": SQL_WORD_SEGMENT,
    "q_feed_render": SQL_FEED_RENDER,
    "q_embedding_drift": SQL_EMBEDDING_DRIFT,
    "q_refs_strip": SQL_REFS_STRIP,
    "q_depth_yield": SQL_DEPTH_YIELD,
    "q_rendezvous_assign": SQL_RENDEZVOUS_ASSIGN,
    "q_meta_refresh": SQL_META_REFRESH,
    "q_cloaking_hosts": SQL_CLOAKING_HOSTS,
    "q_idn_decode": SQL_IDN_DECODE,
    "q_pairwise_auc": SQL_PAIRWISE_AUC,
    "q_label_agreement": SQL_LABEL_AGREEMENT,
    "q_margin_mining": SQL_MARGIN_MINING,
    "q_rdfa_extract": SQL_RDFA_EXTRACT,
    "q_span_corruption": SQL_SPAN_CORRUPTION,
    "q_sitemap_scope": SQL_SITEMAP_SCOPE,
    "q_suffix_array": SQL_SUFFIX_ARRAY,
    "q_survival_ledger": SQL_SURVIVAL_LEDGER,
    "q_event_transitions": SQL_EVENT_TRANSITIONS,
    "q_heading_chunks": SQL_HEADING_CHUNKS,
    "q_maxsim_topk": SQL_MAXSIM_TOPK,
    "q_lexicon_filter": SQL_LEXICON_FILTER,
    "q_schema_drift": SQL_SCHEMA_DRIFT,
    "q_erasure_impact": SQL_ERASURE_IMPACT,
    "q_active_select": SQL_ACTIVE_SELECT,
    "q_pack_fragmentation": SQL_PACK_FRAGMENTATION,
    "q_identifier_extract": SQL_IDENTIFIER_EXTRACT,
    "q_mad_outliers": SQL_MAD_OUTLIERS,
    "q_url_templates": SQL_URL_TEMPLATES,
    "q_maxscore_topk": SQL_MAXSCORE_TOPK,
    "q_substr_spans": SQL_SUBSTR_SPANS,
    "q_substr_strip": SQL_SUBSTR_STRIP,
    "q_tfidf_neighbors": SQL_TFIDF_NEIGHBORS,
    "q_seed_distance": SQL_SEED_DISTANCE,
    "q_host_communities": SQL_HOST_COMMUNITIES,
    "q_phrase_topk": SQL_PHRASE_TOPK,
    "q_snippets": SQL_SNIPPETS,
    "q_diverse_topk": SQL_DIVERSE_TOPK,
    "q_postings_ef": SQL_POSTINGS_EF,
    "q_crawl_traps": SQL_CRAWL_TRAPS,
    "q_c4_filter": SQL_C4_FILTER,
    "q_hits": SQL_HITS,
    "q_domain_scorecard": SQL_DOMAIN_SCORECARD,
    "q_robots_parse": SQL_ROBOTS_PARSE,
    "q_robots_enforce": SQL_ROBOTS_ENFORCE,
    "q_blocklist_filter": SQL_BLOCKLIST_FILTER,
    "q_lm_score": SQL_LM_SCORE,
    "q_seq_packing": SQL_SEQ_PACKING,
    "q_pack_stats": SQL_PACK_STATS,
    "q_dust_params": SQL_DUST_PARAMS,
    "q_dust_strip": SQL_DUST_STRIP,
    "q_sitemap_parse": SQL_SITEMAP_PARSE,
    "q_countmin_hosts": SQL_COUNTMIN_HOSTS,
    "q_crawl_admission": SQL_CRAWL_ADMISSION,
    "q_training_prep": SQL_TRAINING_PREP,
    "q_main_content": SQL_MAIN_CONTENT,
    "q_url_history": SQL_URL_HISTORY,
    "q_link_farm": SQL_LINK_FARM,
    "q_corpus_datasheet": SQL_CORPUS_DATASHEET,
    "q_host_skew": SQL_HOST_SKEW,
    "q_anchor_text": SQL_ANCHOR_TEXT,
    "q_warc_ingest": SQL_WARC_INGEST,
    "q_index_merge": SQL_INDEX_MERGE,
    "q_retrieval_metrics": SQL_RETRIEVAL_METRICS,
    "q_heavy_bigrams": SQL_HEAVY_BIGRAMS,
    "q_crawl_budget": SQL_CRAWL_BUDGET,
    "q_postings_chunks": SQL_POSTINGS_CHUNKS,
    "q_hll_small": SQL_HLL_SMALL,
    "q_lang_id_model": SQL_LANG_ID,
    "q_passage_dedup": SQL_PASSAGE_DEDUP,
    "q_recrawl_schedule": SQL_RECRAWL_SCHEDULE,
    "q_aimd_rates": SQL_AIMD_RATES,
    "q_soft404": SQL_SOFT404,
    "q_mirror_hosts": SQL_MIRROR_HOSTS,
    "q_canonical_clusters": SQL_CANONICAL_CLUSTERS,
    "q_script_mix": SQL_SCRIPT_MIX,
    "q_template_fps": SQL_TEMPLATE_FPS,
    "q_latency_quantiles": SQL_LATENCY_QUANTILES,
    "q_frontier_aging": SQL_FRONTIER_AGING,
    "q_robots_wildcards": SQL_ROBOTS_WILDCARDS,
    "q_containment_pairs": SQL_CONTAINMENT_PAIRS,
    "q_relevance_scores": SQL_RELEVANCE_SCORES,
    "q_adaptive_budgets": SQL_ADAPTIVE_BUDGETS,
    "q_quantize_embeddings": SQL_QUANTIZE_EMBEDDINGS,
    "q_ann_quantized_topk": SQL_ANN_QUANTIZED_TOPK,
    "q_bigram_coverage": SQL_BIGRAM_COVERAGE,
    "q_snapshot_diff": SQL_SNAPSHOT_DIFF,
    "q_latest_snapshot": SQL_LATEST_SNAPSHOT,
    "q_refetch_round": SQL_REFETCH_ROUND,
    "q_pricing_summary": SQL_PRICING_SUMMARY,
    "q_top_revenue_orders": SQL_TOP_REVENUE_ORDERS,
    "q_region_revenue": SQL_REGION_REVENUE,
    "q_politeness_quota": SQL_POLITENESS_QUOTA,
    "q_seen_antijoin": SQL_SEEN_ANTIJOIN,
    "q_frontier_dedup": SQL_FRONTIER_DEDUP,
    "q_field_coverage": SQL_FIELD_COVERAGE,
    "q_coverage_pivot": SQL_COVERAGE_PIVOT,
    "q_funder_top": SQL_FUNDER_TOP,
    "q_search_view": SQL_SEARCH_VIEW,
    "q_exact_dedup": SQL_EXACT_DEDUP,
    "q_minhash_lsh": SQL_MINHASH_LSH,
    "q_ngram_jaccard": SQL_NGRAM_JACCARD,
    "q_simhash_pairs": SQL_SIMHASH_PAIRS,
    "q_embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "q_ann_brute_topk": SQL_ANN_BRUTE_TOPK,
    "q_ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "q_ann_ivf_quantized": SQL_ANN_IVF_QUANTIZED,
    "q_ann_rerank": SQL_ANN_RERANK,
    "q_lang_id": SQL_LANG_ID,
    "q_token_stats": SQL_TOKEN_STATS,
    "q_tokenizer_model": SQL_TOKEN_STATS,
    "q_quality_stats": SQL_QUALITY_STATS,
    "q_incremental_cursor": SQL_INCREMENTAL_CURSOR,
    "q_event_windows": SQL_EVENT_WINDOWS,
    "q_union_sources": SQL_UNION_SOURCES,
    "q_multimodal_features": SQL_MULTIMODAL_FEATURES,
    "q_id_range_scan": SQL_ID_RANGE_SCAN,
    "q_sitemap_expand": SQL_SITEMAP_EXPAND,
    "q_robots_filter": SQL_ROBOTS_FILTER,
    "q_host_budgets": SQL_HOST_BUDGETS,
    "q_domain_key": SQL_DOMAIN_KEY,
    "q_incremental_round": SQL_INCREMENTAL_ROUND,
    "q_upload_geo_transform": SQL_UPLOAD_GEO_TRANSFORM,
    "q_upload_dataset_envelope": SQL_UPLOAD_DATASET_ENVELOPE,
    "q_geo_table_scrape": SQL_GEO_TABLE_SCRAPE,
    "q_upload_zenodo_transform": SQL_UPLOAD_ZENODO_TRANSFORM,
    "q_upload_immport_transform": SQL_UPLOAD_IMMPORT_TRANSFORM,
    "q_pmid_citation": SQL_PMID_CITATION,
    "q_link_extract": SQL_LINK_EXTRACT,
    "q_crawl_bfs_e2e": SQL_CRAWL_BFS_E2E,
    "q_crawl_docs": SQL_CRAWL_DOCS,
    "q_crawl_refetch_round": SQL_CRAWL_REFETCH_ROUND,
    "q_jsonld_extract": SQL_JSONLD_EXTRACT,
    "q_api_seed_expansion": SQL_API_SEED_EXPANSION,
    "q_api_error_docs": SQL_API_ERROR_DOCS,
    "q_api_stop_short": SQL_API_STOP_SHORT,
    "q_hit_transform": SQL_HIT_TRANSFORM,
    "q_random_sample": SQL_RANDOM_SAMPLE,
    "q_id_list_scan": SQL_ID_LIST_SCAN,
    "q_clic_hub_links": SQL_CLIC_HUB_LINKS,
    "q_line_dedup": SQL_LINE_DEDUP,
    "q_neardup_clusters": SQL_NEARDUP_CLUSTERS,
    "q_semantic_dedup": SQL_SEMANTIC_DEDUP,
    "q_winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "q_clean_corpus": SQL_CLEAN_CORPUS,
    "q_redirect_trace": SQL_REDIRECT_TRACE,
    "q_reindex_conflicts": SQL_REINDEX_CONFLICTS,
    "q_existence_sample": SQL_EXISTENCE_SAMPLE,
    "q_sitemap_from_robots": SQL_SITEMAP_FROM_ROBOTS,
    "q_discovery_dump": SQL_DISCOVERY_DUMP,
    "q_mainentity_unwrap": SQL_MAINENTITY_UNWRAP,
    "q_pii_scrub": SQL_PII_SCRUB,
    "q_repetition_stats": SQL_REPETITION_STATS,
    "q_decontamination": SQL_DECONTAMINATION,
    "q_html_to_text": SQL_HTML_TO_TEXT,
    "q_mixture_sample": SQL_MIXTURE_SAMPLE,
    "q_web_refine": SQL_WEB_REFINE,
    "q_doc_chunks": SQL_DOC_CHUNKS,
    "q_pagerank": SQL_PAGERANK,
    "q_domain_blocklist": SQL_DOMAIN_BLOCKLIST,
    "q_dedup_weights": SQL_DEDUP_WEIGHTS,
    "q_inverted_index": SQL_INVERTED_INDEX,
    "q_bm25_topk": SQL_BM25_TOPK,
    "q_sessionize": SQL_SESSIONIZE,
    "q_sessionize_fold": SQL_SESSIONIZE,
    "q_asof_join": SQL_ASOF_JOIN,
    "q_range_join": SQL_RANGE_JOIN,
    "q_hypertable_rollup": SQL_HYPERTABLE_ROLLUP,
    "q_hll_distinct": SQL_HLL_DISTINCT,
    "q_site_families": SQL_SITE_FAMILIES,
    "q_hreflang_map": SQL_HREFLANG_MAP,
    "q_conditional_fetch": SQL_CONDITIONAL_FETCH,
    "q_quality_sample": SQL_QUALITY_SAMPLE,
    "q_token_budget": SQL_TOKEN_BUDGET,
    "q_incremental_neardup": SQL_INCREMENTAL_NEARDUP,
    "q_hist_merge": SQL_HIST_MERGE,
    "q_wav_decode": SQL_WAV_DECODE,
    "q_shard_rebalance": SQL_SHARD_REBALANCE,
    "q_trustrank": SQL_TRUSTRANK,
    "q_postings_varint": SQL_POSTINGS_VARINT,
    "q_sharded_postings": SQL_SHARDED_POSTINGS,
    "q_compact_index": SQL_COMPACT_INDEX,
    "q_surt_keys": SQL_SURT_KEYS,
    "q_politeness_audit": SQL_POLITENESS_AUDIT,
    "q_cdx_index": SQL_CDX_INDEX,
    "q_etld1": SQL_ETLD1,
    "q_cdx_revisits": SQL_CDX_REVISITS,
    "q_warc_render": SQL_WARC_RENDER,
    "q_charset_sniff": SQL_CHARSET_SNIFF,
    "q_cache_ttl": SQL_CACHE_TTL,
    "q_recrawl_clamped": SQL_RECRAWL_CLAMPED,
    "q_sitemap_refetch": SQL_SITEMAP_REFETCH,
    "q_meta_robots": SQL_META_ROBOTS,
    "q_feed_parse": SQL_FEED_PARSE,
    "q_opengraph": SQL_OPENGRAPH,
    "q_fetch_quality": SQL_FETCH_QUALITY,
    "q_archive_roundtrip": SQL_ARCHIVE_ROUNDTRIP,
    "q_wet_render": SQL_WET_RENDER,
    "q_wat_render": SQL_WAT_RENDER,
    "q_pct_normalize": SQL_PCT_NORMALIZE,
    "q_line_trim": SQL_LINE_TRIM,
    "q_png_decode": SQL_PNG_DECODE,
    "q_html_entities": SQL_HTML_ENTITIES,
    "q_nfc_normalize": SQL_NFC_NORMALIZE,
    "q_chunked_decode": SQL_CHUNKED_DECODE,
    "q_gzip_decode": SQL_GZIP_DECODE,
    "q_cdc_chunks": SQL_CDC_CHUNKS,
    "q_zorder_key": SQL_ZORDER_KEY,
    "q_delta_storage": SQL_DELTA_STORAGE,
    "q_typosquat_pairs": SQL_TYPOSQUAT_PAIRS,
    "q_bpe_merges": SQL_BPE_MERGES,
    "q_bpe_segment": SQL_BPE_SEGMENT,
    "q_payload_pipeline": SQL_PAYLOAD_PIPELINE,
    "q_waterfill_budget": SQL_WATERFILL_BUDGET,
    "q_bm25f_topk": SQL_BM25F_TOPK,
    "q_kneser_ney": SQL_KNESER_NEY,
    "q_stupid_backoff": SQL_STUPID_BACKOFF,
    "q_hreflang_clusters": SQL_HREFLANG_CLUSTERS,
    "q_url_parallel_pairs": SQL_URL_PARALLEL_PAIRS,
    "q_bitext_verify": SQL_BITEXT_VERIFY,
    "q_sent_align": SQL_SENT_ALIGN,
    "q_rag_chunks": SQL_RAG_CHUNKS,
    "q_ai_optout": SQL_AI_OPTOUT,
    "q_texttiling": SQL_TEXTTILING,
    "q_topic_chunks": SQL_TOPIC_CHUNKS,
    "q_sitemap_audit": SQL_SITEMAP_AUDIT,
    "q_textrank_summary": SQL_TEXTRANK_SUMMARY,
}
