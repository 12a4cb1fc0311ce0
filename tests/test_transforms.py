"""Uploader transforms + citation formatting: hand-pinned goldens
(SURVEY.md §5.5) and the Spark enrichment pipeline."""

import json

from biothings_crawler_spark.fixtures.pubmed import (
    efetch_response_xml,
    pmid_info_df,
)
from biothings_crawler_spark.functions.citation import eutils_batch_info
from biothings_crawler_spark.functions.docmap import DocTransform
from biothings_crawler_spark.plans.upload import (
    UPLOADERS,
    transform_docs,
)

RUN_TS = "2026-02-03"
NO_ENRICH = {"citations": [], "funding": []}


# --- citation formatting: every documented edge case, hand-pinned -----------

def test_citation_standard_two_authors():
    info = eutils_batch_info(efetch_response_xml(["20000000"]))["20000000"]
    assert info["citation"] == (
        "Name00 N0, Name01 N1. Study 20000000 of synthetic data. "
        "J Synth Data 2019 Mar 5;12(4):101-9. PMID: 20000000"
    )
    assert info["grants"] == [
        {"funder": {"@type": "Organization", "name": "NCI"}, "identifier": "P30-0"}
    ]


def test_citation_et_al_and_agency_only_grant():
    info = eutils_batch_info(efetch_response_xml(["20000001"]))["20000001"]
    assert info["citation"].startswith(
        "Name10 N0, Name11 N1, Name12 N2, Name13 N3 et al. "
    )
    assert " 2018 Nov;12(4):101-9. PMID: 20000001" in info["citation"]
    assert info["grants"] == [{"funder": {"@type": "Organization", "name": "NIAID"}}]


def test_citation_invalid_author_skipped_season_date():
    info = eutils_batch_info(efetch_response_xml(["20000002"]))["20000002"]
    assert "Bad" not in info["citation"]  # ValidYN=N (PMID 16155929 class)
    assert " 2017 Spring;12:101-9." in info["citation"]  # no Issue


def test_citation_collective_name_double_dot_medline_date():
    info = eutils_batch_info(efetch_response_xml(["20000003"]))["20000003"]
    # trailing dot on CollectiveName + '. ' join (PMID 17571346 class)
    assert info["citation"].startswith("Consortium 3.. ")
    assert " 1998 Dec-1999 Jan;." in info["citation"]  # no vol/issue/pages
    assert info["grants"] == []


def test_citation_no_authors_identifier_only_grant():
    info = eutils_batch_info(efetch_response_xml(["20000004"]))["20000004"]
    assert info["citation"].startswith("[No authors listed] ")  # PMID 20703210 class
    assert info["grants"] == [{"identifier": "G-NOAG"}]


def test_citation_suffix_and_day_dezeroing():
    info = eutils_batch_info(efetch_response_xml(["20000005"]))["20000005"]
    assert info["citation"].startswith("Sr5 S Jr. ")
    assert " 2021 Dec 9;" in info["citation"]  # Day '09' -> '9', Month '12' -> Dec


# --- uploader transforms -----------------------------------------------------

def test_default_and_dataset_uploaders():
    _id, out = UPLOADERS["default"](DocTransform({"_id": "x", "a": 1}), NO_ENRICH, RUN_TS)
    assert _id == "x" and out == {"a": 1}
    _id, out = UPLOADERS["dataset"](DocTransform({"_id": "y", "@type": "Thing", "a": 1}),
                                    NO_ENRICH, RUN_TS)
    assert _id == "y"
    assert out == {"@context": "http://schema.org/", "@type": "Thing", "a": 1}


def test_geo_uploader_golden():
    doc = DocTransform({
        "_id": "GSE9",
        "Title": "Expr data",
        "Organism": "Homo sapiens",
        "Summary": "A study.",
        "Contributor(s)": "Ann A, Bob B, Cy C",
        "Organization": "NCBI",
        "Citation(s)": "20000000",
        "Leftover field": "dropped by delete_unused_keys",
    })
    enrich = {"citations": ["CITE0"], "funding": [{"identifier": "P30-0"}]}
    _id, out = UPLOADERS["ncbi_geo"](doc, enrich, RUN_TS)
    assert _id == "https://www.ncbi.nlm.nih.gov/geo/query/acc.cgi?acc=GSE9"
    assert out["identifier"] == "GSE9"
    assert out["name"] == "Expr data"
    assert out["creator"] == [
        {"@type": "Person", "name": "Ann A"},
        {"@type": "Person", "name": "Bob B"},
        {"@type": "Person", "name": "Cy C"},
    ]
    assert out["publisher"] == {"@type": "Organization", "name": "NCBI"}
    assert out["citation"] == ["CITE0"]
    assert out["funding"] == [{"identifier": "P30-0"}]
    assert out["distribution"]["contentUrl"].endswith("acc=GSE9")
    # untouched keys pruned (tdoc delete_unused_keys); Citation(s) was
    # only read, never written -> gone
    assert "Leftover field" not in out and "Citation(s)" not in out


def test_zenodo_covid_uploader_golden():
    doc = DocTransform({
        "_id": "https://zenodo.example.org/record/10.5281.999",
        "@type": "ScholarlyArticle",
        "creator": [{"@type": "Person", "name": "A", "affiliation": "Inst X"}],
        "keywords": ["covid, rna; spark"],
        "license": {"license": "CC-BY-4.0"},
        "citation": "dropme",
        "name": "Z",
    })
    _id, out = UPLOADERS["zenodo_covid"](doc, NO_ENRICH, RUN_TS)
    assert _id == "zenodo.999"  # _id split('.')[-1] (zenodo_covid.py:95)
    assert out["@type"] == "Publication"
    assert out["creator"][0]["affiliation"] == {"name": "Inst X"}
    assert out["keywords"] == ["covid", "rna", "spark"]  # fake-list re-split
    assert out["license"] == "CC-BY-4.0"
    assert "citation" not in out
    assert out["curatedBy"]["versionDate"] == RUN_TS

    # conceptrecid wins (zenodo_covid.py:90-93)
    doc2 = DocTransform({"_id": "z.1", "conceptrecid": "777", "keywords": ["a b"]})
    _id2, out2 = UPLOADERS["zenodo_covid"](doc2, NO_ENRICH, RUN_TS)
    assert _id2 == "zenodo.777"
    assert out2["keywords"] == ["a b"]  # single keyword, no split chars

    # unsupported license object dropped (zenodo_covid.py:84-85)
    doc3 = DocTransform({"_id": "z.2", "license": {"url": "x"}})
    _, out3 = UPLOADERS["zenodo_covid"](doc3, NO_ENRICH, RUN_TS)
    assert "license" not in out3


def test_immport_uploader_golden():
    doc = DocTransform({
        "_id": "https://immport.example.org/shared/study/SDY1",
        "Accession": "SDY1",
        "Title": "T",
        "PI": "Ann A - Inst X; BadSegment; Bob B - Inst Y",
        "Condition Studied": "flu, covid",
        "DOI": "10.1/abc",
        "Download Packages": "https://dl.example.org/p1",
        "Contract/Grant": "NIH",
        "Pubmed Id": ["20000000"],
        "Gender Included": "ignored -> pruned",
    })
    enrich = {"citations": ["C1"], "funding": [{"identifier": "G1"}]}
    _id, out = UPLOADERS["immport"](doc, enrich, RUN_TS)
    assert _id is None  # _id renamed to url, not used as new id
    assert out["url"].endswith("SDY1")
    # malformed PI segment skipped (immport.py:42-44)
    assert out["creator"] == [
        {"@type": "Person", "name": "Ann A", "affiliation": "Inst X"},
        {"@type": "Person", "name": "Bob B", "affiliation": "Inst Y"},
    ]
    assert out["keywords"] == ["flu", "covid"]
    assert out["sameAs"] == "https://www.doi.org/10.1/abc"
    assert out["funder"] == [{"@type": "Organization", "name": "NIH"}]
    assert out["identifier"] == "SDY1"
    assert out["citation"] == ["C1"] and out["funding"] == [{"identifier": "G1"}]
    assert "Gender Included" not in out  # pruned (immport.py:132)
    assert list(out.keys()) == sorted(out.keys())  # sorted emit (:133)
    assert out["curatedBy"]["curationDate"] == RUN_TS


def test_immport_covid_uploader():
    doc = DocTransform({
        "_id": "u", "Accession": "SDY2", "PI": "Ann A - Inst X",
        "Pubmed Id": ["20000000"],
    })
    _, out = UPLOADERS["immport_covid"](
        doc, {"citations": ["C1"], "funding": []}, RUN_TS
    )
    assert out["creator"][0]["affiliation"] == {"name": "Inst X"}  # objectified
    assert "citation" not in out  # deleted (immport_covid.py:33-35)


# --- the Spark pipeline ------------------------------------------------------

def test_transform_docs_pipeline_with_enrichment(spark):
    pmids = ["20000000", "20000001"]
    raw = spark.createDataFrame(
        [
            ("ncbi_geo", json.dumps({
                "_id": "GSE7", "Title": "t7",
                "Citation(s)": "20000000, 20000001",
            })),
            ("zenodo_covid", json.dumps({
                "_id": "z.5", "conceptrecid": "5", "name": "n5",
            })),
            ("unknown_source", json.dumps({"_id": "u1", "k": "v"})),
        ],
        "source string, doc_json string",
    )
    out = transform_docs(raw, pmid_info_df(spark, pmids), RUN_TS)
    rows = {r["source"]: r for r in out.collect()}
    geo = json.loads(rows["ncbi_geo"]["doc_json"])
    # ordered citations from the broadcast-joined fixture
    infos = eutils_batch_info(efetch_response_xml(pmids))
    assert geo["citation"] == [infos[p]["citation"] for p in pmids]
    assert geo["funding"] == infos[pmids[0]]["grants"] + infos[pmids[1]]["grants"]
    assert rows["zenodo_covid"]["_id"] == "zenodo.5"
    assert json.loads(rows["unknown_source"]["doc_json"]) == {"k": "v"}


def test_transform_docs_without_pmid_info(spark):
    raw = spark.createDataFrame(
        [("dataset", json.dumps({"_id": "d1", "a": 1}))], "source string, doc_json string"
    )
    out = transform_docs(raw, None, RUN_TS).collect()
    assert json.loads(out[0]["doc_json"])["@type"] == "Dataset"


def test_reindex_conflicts_quarantine(spark):
    """SURVEY §2.2: mapping violations -> conflicts table; clean docs
    pass through typed unchanged (replaces upload/__init__.py:195-211
    suffixed-index retry)."""
    from biothings_crawler_spark.plans.upload import reindex_conflicts

    docs = spark.createDataFrame(
        [
            ("s", "ok", '{"name":"a","keywords":["k"]}'),
            ("s", "bad_kw", '{"name":"b","keywords":"k"}'),
            ("s", "bad_name", '{"name":["b"],"keywords":["k"]}'),
            ("s", "both", '{"name":[1],"keywords":{"x":1}}'),
            ("s", "absent", '{"name":"c"}'),  # missing field: no conflict
        ],
        "source string, _id string, doc_json string",
    )
    typed, conflicts = reindex_conflicts(
        docs, {"name": "string", "keywords": "array"})
    assert {r["_id"] for r in typed.collect()} == {"ok", "absent"}
    got = {(r["_id"], r["field"], r["expected"], r["actual"])
           for r in conflicts.collect()}
    assert got == {
        ("bad_kw", "keywords", "array", "string"),
        ("bad_name", "name", "string", "array"),
        ("both", "keywords", "array", "object"),
        ("both", "name", "string", "array"),
    }
