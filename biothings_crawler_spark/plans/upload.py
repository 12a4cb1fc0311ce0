"""Upload/reindex analog: per-source typed transforms over raw docs.

Reference lifecycle (SURVEY.md §3.2): scroll the raw (mapping-disabled)
index -> ``extract_id(doc)`` -> ``transform_doc(TransformDoc(doc))`` ->
index into the typed destination, with mid-transform eutils calls for
PMID enrichment. Spark rebuild:

  raw docs (source, doc_json)
    -> native pmid-array extraction per source (get_json_object/split)
    -> posexplode + broadcast join vs pmid_info fixture (replaces the
       live eutils call + its rate-limit sleeps)
    -> groupBy doc_key: ordered citation list + flattened grants
    -> ONE Arrow-batched mapInPandas applying the registered per-source
       transform (dict surgery via functions.docmap.DocTransform)
    -> (source, _id, doc_json) typed rows, canonical JSON

Uploaders registered here mirror crawler/upload/*.py; ``run_ts``
replaces the reference's ``datetime.now()`` (zenodo_covid.py:61,
immport.py:64) for determinism — a documented deviation that leaves
the `text` invariant untouched.

Scale: pmid_info is a small dimension (broadcast); the groupBy is on
doc_key (unique, no skew); the transform is one Python stage over
Arrow batches. Everything else is JVM-side.
"""

from __future__ import annotations

import json
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.functions.docmap import DocTransform
from biothings_crawler_spark.functions.json_canon import canonical_json

GEO_URL_PREFIX = "https://www.ncbi.nlm.nih.gov/geo/query/acc.cgi?acc="

# transform signature: (DocTransform, enrich, run_ts) -> (id | None, dict)
# enrich = {"citations": [str, ...] ordered, "funding": [dict, ...] flattened}
Transform = Callable[[DocTransform, dict, str], tuple]


def _default_transform(doc: DocTransform, enrich: dict, run_ts: str):
    """CrawlerESUploader base (upload/__init__.py:78-102): _id popped,
    doc unchanged. A doc without _id keeps id None (the reference makes
    ES mint a random id — replaced by content hashing at write time)."""
    _id = doc.pop("_id", None)
    return _id, doc.data


def _dataset_transform(doc: DocTransform, enrich: dict, run_ts: str):
    """CrawlerDatasetESUploader (upload/__init__.py:105-117): schema.org
    envelope UNDER the doc (doc keys win)."""
    _id = doc.pop("_id", None)
    base = {"@context": "http://schema.org/", "@type": "Dataset"}
    base.update(doc.data)
    return _id, base


def _geo_transform(doc: DocTransform, enrich: dict, run_ts: str):
    """NCBIGeoUploader (upload/ncbi_geo.py:27-99)."""
    new_id = GEO_URL_PREFIX + doc["_id"]  # extract_id reads, doesn't pop (:27-29)

    def _contributors(value):
        names = value.split(", ") if isinstance(value, str) else list(value)
        return {"creator": [{"@type": "Person", "name": n} for n in names]}

    doc.apply_kv({
        "Contributor(s)": _contributors,
        "Organization": lambda v: {"publisher": {"@type": "Organization", "name": v}},
    }, missing_ok=True).rename({
        "Title": "name",
        "Organism": "organism",
        "Experiment type": "measurementTechnique",
        "Summary": "description",
        "Submission date": "datePublished",
        "Last update date": "dateModified",
    }, missing_ok=True)

    _id = doc.pop("_id")
    doc.merge({
        "@context": "http://schema.org/",
        "@type": "Dataset",
        "identifier": _id,
        "distribution": {"@type": "dataDownload", "contentUrl": GEO_URL_PREFIX + _id},
        "includedInDataCatalog": {
            "@type": "DataCatalog",
            "name": "NCBI GEO from Metadataplus",
            "url": "https://www.ncbi.nlm.nih.gov/geo/",
        },
    })
    if "Citation(s)" in doc:
        if enrich.get("funding"):
            doc["funding"] = enrich["funding"]
        if enrich.get("citations"):
            doc["citation"] = enrich["citations"]
    doc.prune_untouched()
    return new_id, doc.data


def _zenodo_covid_transform(doc: DocTransform, enrich: dict, run_ts: str):
    """ZenodoCovidUploader (upload/zenodo_covid.py:54-95)."""
    doc["curatedBy"] = {
        "@type": "Organization",
        "name": "Zenodo",
        "url": "https://zenodo.org/communities/covid-19/",
        "versionDate": run_ts,  # reference: datetime.now() (:61)
    }
    if doc.get("@type") == "ScholarlyArticle":
        doc["@type"] = "Publication"
    creators = doc.get("creator")
    if isinstance(creators, list):
        for c in creators:
            if isinstance(c, dict) and isinstance(c.get("affiliation"), str):
                c["affiliation"] = {"name": c["affiliation"]}
    if "keywords" in doc and len(doc["keywords"]) == 1:
        import re as _re

        doc["keywords"] = _re.split(r", |,|; |;", doc["keywords"][0])
    lic = doc.get("license")
    if isinstance(lic, dict):
        if isinstance(lic.get("license"), str):
            doc["license"] = lic["license"]
        else:
            doc.pop("license")
    doc.delete(["citation"])
    # extract_id (:90-95)
    if "conceptrecid" in doc:
        _id = "zenodo." + doc["conceptrecid"]
    else:
        _id = "zenodo." + doc.pop("_id").split(".")[-1]
    return _id, doc.data


def _immport_transform(doc: DocTransform, enrich: dict, run_ts: str):
    """ImmPortUploader (upload/immport.py:37-133)."""
    doc["curatedBy"] = {
        "@type": "Organization",
        "curationDate": run_ts,  # reference: datetime.now().strftime (:64)
        "name": "ImmPort",
        "url": f"https://www.immport.org/shared/study/{doc['Accession']}",
    }

    def _pi(value):
        creators = []
        for person in value.split("; "):
            seg = person.split(" - ")
            if len(seg) == 2:  # others warned + skipped (:42-44)
                creators.append({"@type": "Person", "name": seg[0], "affiliation": seg[1]})
        return {"creator": creators}

    doc.apply_kv({
        "PI": _pi,
        "Condition Studied": lambda v: {"keywords": v.split(", ")},
        "DOI": lambda v: {"sameAs": f"https://www.doi.org/{v}"},
        "Download Packages": lambda v: {
            "distribution": [{"@type": "DataDownload", "contentUrl": v}]
        },
        "Contract/Grant": lambda v: {
            "funder": [{"@type": "Organization", "name": v}]
        },
    }, missing_ok=True).rename({
        "Accession": "identifier",
        "Title": "name",
        "Start Date": "datePublished",
        "Detailed Description": "description",
        "_id": "url",
    }, missing_ok=True).merge({
        "@context": "http://schema.org/",
        "@type": "Dataset",
        "includedInDataCatalog": {
            "@type": "DataCatalog",
            "name": "ImmPort",
            "url": "http://immport.org/",
        },
    })
    if enrich.get("funding"):
        doc["funding"] = enrich["funding"]
    if enrich.get("citations"):
        doc["citation"] = enrich["citations"]
    doc.prune_untouched()
    return None, doc.sorted_dict()


def _immport_covid_transform(doc: DocTransform, enrich: dict, run_ts: str):
    """ImmPortCovidUploader (upload/immport_covid.py:21-35): immport +
    zenodo-style affiliation objectify + citation delete."""
    _id, data = _immport_transform(doc, enrich, run_ts)
    d = DocTransform(data)
    creators = d.get("creator")
    if isinstance(creators, list):
        for c in creators:
            if isinstance(c, dict) and isinstance(c.get("affiliation"), str):
                c["affiliation"] = {"name": c["affiliation"]}
    d.delete(["citation"])
    return _id, d.data


UPLOADERS: dict[str, Transform] = {
    "default": _default_transform,
    "dataset": _dataset_transform,
    "ncbi_geo": _geo_transform,
    "zenodo_covid": _zenodo_covid_transform,
    "immport": _immport_transform,
    "immport_covid": _immport_covid_transform,
}


def json_type_col(json_col, field: str):
    """Observed JSON type of a field: 'array' | 'object' | 'number' |
    'string' | NULL (absent). get_json_object returns raw JSON for
    containers and the unquoted scalar otherwise — first-char + numeric
    shape classify it natively (no Python)."""
    raw = F.get_json_object(json_col, f"$['{field}']")
    return (
        F.when(raw.isNull(), F.lit(None).cast("string"))
        .when(raw.startswith("["), F.lit("array"))
        .when(raw.startswith("{"), F.lit("object"))
        .when(raw.rlike(r"^-?[0-9]+(\.[0-9]+)?([eE][-+]?[0-9]+)?$"), F.lit("number"))
        .otherwise(F.lit("string"))
    )


def reindex_conflicts(
    docs: DataFrame, mapping: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Typed reindex with a conflicts quarantine (SURVEY §2.2 row 3).

    The reference retries mapping-conflict docs into suffixed indices
    dest_0..dest_9 and swallows every exception while doing so
    (crawler/upload/__init__.py:195-211). Under an enforced schema that
    dance is unnecessary AND lossy; instead docs whose observed JSON
    field type contradicts the declared ``mapping`` ({field: expected
    type}) are diverted to an explicit quarantine table carrying the
    offending field and the observed type, and the clean remainder is
    the typed write. One pass, no Python: the per-field type check is a
    native expression array; a doc with zero violations is typed.

    Returns (typed, conflicts): typed keeps the input schema; conflicts
    is (source, _id, field, expected, actual)."""
    checks = F.array(*[
        F.when(
            json_type_col(F.col("doc_json"), field).isNotNull()
            & (json_type_col(F.col("doc_json"), field) != expected),
            F.struct(
                F.lit(field).alias("field"),
                F.lit(expected).alias("expected"),
                json_type_col(F.col("doc_json"), field).alias("actual"),
            ),
        )
        for field, expected in sorted(mapping.items())
    ])
    flagged = docs.withColumn(
        "_violations", F.filter(checks, lambda c: c.isNotNull())
    )
    typed = flagged.filter(F.size("_violations") == 0).drop("_violations")
    conflicts = (
        flagged.filter(F.size("_violations") > 0)
        .select("source", "_id", F.explode("_violations").alias("v"))
        .select("source", "_id", "v.field", "v.expected", "v.actual")
    )
    return typed, conflicts


def _pmids_col():
    """Per-source PMID list, extracted natively (no Python)."""
    geo = F.transform(
        F.split(F.get_json_object("doc_json", "$['Citation(s)']"), ","),
        lambda x: F.trim(x),
    )
    imm = F.transform(
        F.from_json(F.get_json_object("doc_json", "$['Pubmed Id']"), "array<string>"),
        lambda x: F.trim(x),
    )
    return (
        F.when(F.col("source") == "ncbi_geo", geo)
        .when(F.col("source").isin("immport", "immport_covid"), imm)
        .otherwise(F.lit(None).cast("array<string>"))
    )


def transform_docs(
    docs: DataFrame, pmid_info: DataFrame | None, run_ts: str = "2026-01-01"
) -> DataFrame:
    """raw (source, doc_json) -> typed (source, _id, doc_json).

    Unknown sources fall back to the 'default' uploader, mirroring the
    registry lookup (upload/__main__.py:5-19).
    """
    keyed = docs.withColumn(
        "doc_key", F.xxhash64(F.col("source"), F.col("doc_json"))
    ).withColumn("pmids", _pmids_col())

    if pmid_info is not None:
        exploded = keyed.select(
            "doc_key", F.posexplode("pmids").alias("pos", "pmid")
        )
        hits = exploded.join(
            F.broadcast(pmid_info.select("pmid", "citation", "grants_json")),
            "pmid",
            "inner",  # malformed ids silently skipped (immport.py:119-121)
        )
        enrich = hits.groupBy("doc_key").agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "citation", "grants_json"))
            ).alias("enrich")
        )
        joined = keyed.join(enrich, "doc_key", "left")
    else:
        joined = keyed.withColumn(
            "enrich",
            F.lit(None).cast(
                "array<struct<pos:int,citation:string,grants_json:string>>"
            ),
        )
    joined = joined.select("source", "doc_json", "enrich")

    def run(batches):
        for pdf in batches:
            out_src, out_id, out_doc = [], [], []
            for src, doc_json, enrich in zip(
                pdf["source"], pdf["doc_json"], pdf["enrich"]
            ):
                fn = UPLOADERS.get(src, UPLOADERS["default"])
                citations, funding = [], []
                if enrich is not None and len(enrich) > 0:
                    for e in enrich:
                        citations.append(e["citation"])
                        funding.extend(json.loads(e["grants_json"]))
                doc = DocTransform(json.loads(doc_json))
                _id, data = fn(
                    doc, {"citations": citations, "funding": funding}, run_ts
                )
                out_src.append(src)
                out_id.append(_id)
                out_doc.append(canonical_json(data))
            yield pd.DataFrame(
                {"source": out_src, "_id": out_id, "doc_json": out_doc}
            )

    return joined.mapInPandas(run, "source string, _id string, doc_json string")
