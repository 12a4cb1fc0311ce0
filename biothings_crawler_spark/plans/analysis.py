"""Analysis queries (reference crawler/analysis/*.py) + the read API view.

These are the reference's ad-hoc notebook scans re-expressed as real
aggregation plans (SURVEY.md §2.5-2.6):

  * field_coverage — per (source, field): count docs by the JSON type of
    the value (str/list/dict), fields outside the schema.org property
    set binned as '__EE__' (field_aggs.py:37-51); ratio vs the source's
    doc count (:54-58); pivot fields × sources (:75-83).
  * funder_counts — explode funder, count by name, top-k
    (funder.py:34-49); irregular-funder counter (len != 2, empty name,
    non-Organization @type — funder.py:121-126).
  * funder_doc_ids — all doc ids funded by X (funder.py:53-63).
  * search_view — the web query layer (web/pipeline.py:12-30) as a SQL
    view + relevance-proxy score (name^6, description^3).

The doc-type melt uses a tiny JSON-probe on the doc_json column: the
reference inspects `type(value).__name__` of each top-level field. We
derive (field, valtype) pairs with a vectorized pandas UDF (the JSON is
schema-free, so a fixed StructType is impossible by design —
crawler/upload/__init__.py:1-9).

Scale: the melt is one Arrow-batched pass; aggregation is a standard
partial+final hash agg on (source, field, valtype) — fine at any row
count; the pivot's field set is small and bounded.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# schema.org Dataset property subset (field_aggs.py uses biothings_schema;
# frozen here — the exact list only affects the __EE__ binning)
SCHEMA_ORG_DATASET_PROPS = frozenset({
    "@context", "@type", "_id", "identifier", "name", "description", "url",
    "keywords", "creator", "publisher", "funder", "funding", "license",
    "citation", "distribution", "includedInDataCatalog", "datePublished",
    "dateModified", "measurementTechnique", "organism", "sameAs",
    "curatedBy", "variableMeasured", "spatialCoverage", "temporalCoverage",
})

_PY_TYPE = {dict: "dict", list: "list", str: "str", int: "int",
            float: "float", bool: "bool", type(None): "NoneType"}


@F.pandas_udf(T.ArrayType(T.StructType([
    T.StructField("field", T.StringType()),
    T.StructField("valtype", T.StringType()),
])))
def _melt_fields_udf(doc_json: pd.Series) -> pd.Series:
    out = []
    for dj in doc_json:
        pairs = []
        try:
            doc = json.loads(dj)
        except (ValueError, TypeError):
            out.append(pairs)
            continue
        if isinstance(doc, dict):
            for k, v in doc.items():
                field = k if k in SCHEMA_ORG_DATASET_PROPS else "__EE__"
                pairs.append((field, _PY_TYPE.get(type(v), type(v).__name__)))
        out.append(pairs)
    return pd.Series(out)


def field_coverage(docs: DataFrame) -> DataFrame:
    """(source, field, valtype, n, ratio) — field_aggs.py:37-58."""
    melted = docs.select(
        "source", F.explode(_melt_fields_udf(F.col("doc_json"))).alias("fv")
    ).select("source", "fv.field", "fv.valtype")
    counts = melted.groupBy("source", "field", "valtype").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("total"))
    per_field = counts.groupBy("source", "field").agg(F.sum("n").alias("n_field"))
    return (
        counts.join(per_field, ["source", "field"])
        .join(F.broadcast(totals), "source")
        .select(
            "source", "field", "valtype", "n",
            (F.col("n_field") / F.col("total")).alias("ratio"),
        )
    )


def coverage_pivot(coverage: DataFrame, sources: list[str]) -> DataFrame:
    """fields × sources ratio matrix (field_aggs.py:75-83)."""
    return (
        coverage.groupBy("field")
        .pivot("source", sources)
        .agg(F.first("ratio"))
        .orderBy("field")
    )


def _funders(docs: DataFrame) -> DataFrame:
    arr = F.from_json(
        F.get_json_object("doc_json", "$.funder"),
        "array<struct<`@type`:string,name:string,url:string>>",
    )
    return docs.select(F.explode(arr).alias("funder"))


def funder_counts(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """Top-k funder names (funder.py:131-137). Deterministic tie-break
    by name (the reference's Counter.most_common is insertion-ordered —
    unstable across scans; ours is total-ordered)."""
    return (
        _funders(docs)
        .filter(F.col("funder.name").isNotNull() & (F.col("funder.name") != ""))
        .groupBy(F.col("funder.name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("name"))
        .limit(top_k)
    )


def irregular_funders(docs: DataFrame) -> DataFrame:
    """funder.py:121-126: len(funder)!=2 or empty name or wrong @type.
    len() of the dict == number of present keys (url counts, nulls
    don't)."""
    f = F.col("funder")
    n_keys = (
        f["@type"].isNotNull().cast("int")
        + f["name"].isNotNull().cast("int")
        + f["url"].isNotNull().cast("int")
    )
    irregular = (
        (n_keys != 2)
        | F.col("funder.name").isNull() | (F.col("funder.name") == "")
        | (F.col("funder.@type") != "Organization")
        | F.col("funder.@type").isNull()
    )
    return (
        _funders(docs)
        .filter(irregular)
        .groupBy(F.to_json("funder").alias("funder_json"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("funder_json"))
    )


def funder_doc_ids(docs: DataFrame, funder_name: str) -> DataFrame:
    """All _ids funded by X (funder.py:140-150) — semi-join shape."""
    arr = F.from_json(
        F.get_json_object("doc_json", "$.funder"),
        "array<struct<`@type`:string,name:string,url:string>>",
    )
    return (
        docs.withColumn("funder", F.explode(arr))
        .filter(F.col("funder.name") == funder_name)
        .select("_id")
        .distinct()
        .orderBy("_id")
    )


def search_view(docs: DataFrame, q: str) -> DataFrame:
    """Relevance-proxy for the dis_max query (web/pipeline.py:12-30):
    name matches weighted 6, description 3, any-field 1; hits ordered by
    score desc. Documented as a proxy — ES query_string scoring (BM25)
    is a non-goal for a batch engine (SURVEY.md §2.10)."""
    name = F.coalesce(F.get_json_object("doc_json", "$.name"), F.lit(""))
    desc = F.coalesce(F.get_json_object("doc_json", "$.description"), F.lit(""))
    ql = q.lower()
    score = (
        F.when(F.lower(name).contains(ql), F.lit(6.0)).otherwise(F.lit(0.0))
        + F.when(F.lower(desc).contains(ql), F.lit(3.0)).otherwise(F.lit(0.0))
        + F.when(F.lower("doc_json").contains(ql), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return (
        docs.withColumn("_score", score)
        .filter(F.col("_score") > 0)
        .select("source", "_id", "_score", "doc_json")
        .orderBy(F.desc("_score"), F.asc("_id"))
    )


def sample_docs(docs: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Seeded random sampling (ALLOW_RANDOM_QUERY, config.py:35) by
    hash ordering: ``ORDER BY md5(seed:_id) LIMIT k``.

    md5 of the id is a uniform deterministic ranking that is identical
    in every engine AND at every parallelism (rand(seed) is partition-
    layout-dependent; this is not). Physical plan stays
    TakeOrderedAndProject — per-partition top-k then merge, no full
    sort, safe at any corpus size."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("_id")))
    return docs.orderBy(key, F.asc("_id")).limit(k)


def existence_sample(
    docs: DataFrame, field: str, missing: bool = False, k: int = 10,
    json_col: str = "doc_json", id_col: str = "_id",
) -> DataFrame:
    """First-k docs having (or missing) a field — the reference's
    interactive spot-check (crawler/analysis/field_aggs_funder.py:20-36,
    scan-until-10). ES scan order isn't reproducible, so 'first' is
    defined by id order here; plan is a pushed filter +
    TakeOrderedAndProject (per-partition top-k, no full sort)."""
    present = F.get_json_object(F.col(json_col), f"$['{field}']").isNotNull()
    cond = ~present if missing else present
    return docs.filter(cond).orderBy(F.asc(id_col)).limit(k)


def transform_hits(hits: DataFrame) -> DataFrame:
    """Hit post-transform (web/pipeline.py:43-53): drop transport fields,
    rewrite the index name to the source label by substring match."""
    drop = [c for c in ("_type", "sort", "_node", "_shard") if c in hits.columns]
    out = hits.drop(*drop)
    if "_index" in out.columns:
        out = out.withColumn(
            "source",
            F.regexp_extract(F.col("_index"), r"^indexed_([a-z0-9_]+)", 1),
        ).drop("_index")
    return out


def url_identity(
    pages, redirects, url_col: str = "url", html_col: str = "html"
):
    """Unified URL identity: one alias graph from the three signals a
    crawler already extracts separately — ``<link rel="canonical">``
    hints (operators/extract.canonical_map), redirect edges from the
    fetch log, and exact body-hash mirrors — closed transitively with
    connected components, so a tracking-parameter alias that redirects
    to a print view whose canonical points at a mirrored page all
    collapse to ONE identity.  The frontier, seen-set and index all key
    on the representative; every alias fetched is budget recovered.

    Returns ``(url, identity, group_size)`` with identity = the
    smallest URL string reachable.  Shape: the canonical map is a
    row-local projection; mirror edges are one body-hash agg + an
    equi-join; the closure is the bounded CC loop (diameter of alias
    chains, a handful)."""
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.dedup import connected_components
    from biothings_crawler_spark.operators.extract import canonical_map

    canon_e = (
        canonical_map(pages, url_col, html_col)
        .filter(~F.col("is_canonical"))
        .select(F.col("url").alias("id_a"),
                F.col("canonical_url").alias("id_b"))
    )
    redir_e = redirects.select(
        F.col("src_url").alias("id_a"), F.col("dst_url").alias("id_b"))

    hashed = pages.select(
        F.col(url_col).alias("url"), F.md5(html_col).alias("bh"))
    reps = hashed.groupBy("bh").agg(F.min("url").alias("rep"))
    mirror_e = (
        hashed.join(reps, "bh")
        .filter(F.col("url") != F.col("rep"))
        .select(F.col("url").alias("id_a"), F.col("rep").alias("id_b"))
    )

    edges = canon_e.unionByName(redir_e).unionByName(mirror_e)
    nodes = (
        pages.select(F.col(url_col).alias("id"))
        .unionByName(redirects.select(F.col("src_url").alias("id")))
        .unionByName(redirects.select(F.col("dst_url").alias("id")))
        .unionByName(edges.select(F.col("id_b").alias("id")))
        .distinct()
    )
    comp = connected_components(edges, nodes)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("url"),
        F.col("component").alias("identity"),
        "group_size",
    )
