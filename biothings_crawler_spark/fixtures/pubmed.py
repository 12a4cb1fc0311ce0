"""pmid_info fixture — deterministic PubmedArticle XML covering every
citation-formatting edge case the reference's comments call out
(crawler/upload/helper.py:92-123: ValidYN=N / PMID 16155929 class,
CollectiveName / PMID 17571346, no authors / PMID 20703210,
MedlineDate & Season dates, numeric months, zero-padded days, missing
Volume/Issue/Pagination, grants with/without Agency/GrantID).

Replaces the live eutils call: the upload job broadcast-joins this
table instead of calling NCBI mid-transform (SURVEY.md §3.2).
"""

from __future__ import annotations

import json

from biothings_crawler_spark.functions.citation import eutils_batch_info

_AUTHOR = "<Author><LastName>{ln}</LastName><Initials>{ini}</Initials></Author>"


def _authors(case: int, i: int) -> str:
    mk = lambda n: "".join(  # noqa: E731
        _AUTHOR.format(ln=f"Name{i}{j}", ini=f"N{j}") for j in range(n)
    )
    if case == 0:
        return "<AuthorList>" + mk(2) + "</AuthorList>"
    if case == 1:  # > 4 -> et al.
        return "<AuthorList>" + mk(6) + "</AuthorList>"
    if case == 2:  # errata author skipped
        return ("<AuthorList>" + mk(2)
                + f'<Author ValidYN="N"><LastName>Bad{i}</LastName>'
                  "<Initials>B</Initials></Author></AuthorList>")
    if case == 3:  # collective name gets trailing dot
        return ("<AuthorList><Author><CollectiveName>Consortium "
                f"{i}</CollectiveName></Author></AuthorList>")
    if case == 4:  # no authors listed
        return ""
    if case == 5:  # suffix
        return (f"<AuthorList><Author><LastName>Sr{i}</LastName>"
                "<Initials>S</Initials><Suffix>Jr</Suffix></Author></AuthorList>")
    return "<AuthorList>" + mk(case - 2) + "</AuthorList>"  # 6->4, 7->5... deterministic


def _pubdate(case: int) -> str:
    return [
        "<PubDate><Year>2019</Year><Month>03</Month><Day>05</Day></PubDate>",
        "<PubDate><Year>2018</Year><Month>Nov</Month></PubDate>",
        "<PubDate><Year>2017</Year><Season>Spring</Season></PubDate>",
        "<PubDate><MedlineDate>1998 Dec-1999 Jan</MedlineDate></PubDate>",
        "<PubDate><Year>2020</Year></PubDate>",
        "<PubDate><Year>2021</Year><Month>12</Month><Day>09</Day></PubDate>",
        "<PubDate><Year>2016</Year><Month>Jul</Month><Day>1</Day></PubDate>",
        "<PubDate></PubDate>",
    ][case]


def _journal_issue(case: int) -> str:
    vol = "" if case == 3 else "<Volume>12</Volume>"
    issue = "" if case in (2, 3) else "<Issue>4</Issue>"
    return f"<JournalIssue>{vol}{issue}{_pubdate(case)}</JournalIssue>"


def _pagination(case: int) -> str:
    if case in (3, 6):
        return ""
    return "<Pagination><MedlinePgn>101-9</MedlinePgn></Pagination>"


def _grants(case: int, i: int) -> str:
    if case == 3:
        return ""
    if case == 4:  # grant without Agency
        return "<GrantList><Grant><GrantID>G-NOAG</GrantID></Grant></GrantList>"
    if case == 1:  # grant without GrantID
        return "<GrantList><Grant><Agency>NIAID</Agency></Grant></GrantList>"
    if case == 7:
        return ("<GrantList><Grant><Agency>NIH</Agency><GrantID>R01-"
                f"{i}</GrantID></Grant><Grant><Agency>NSF</Agency>"
                f"<GrantID>NSF-{i}</GrantID></Grant></GrantList>")
    return (f"<GrantList><Grant><Agency>NCI</Agency><GrantID>P30-{i}"
            "</GrantID></Grant></GrantList>")


def pubmed_article_xml(pmid: str) -> str:
    i = int(pmid) % 100
    case = int(pmid) % 8
    return (
        "<PubmedArticle><MedlineCitation>"
        f"<PMID>{pmid}</PMID>"
        "<Article>"
        f"<Journal>{_journal_issue(case)}</Journal>"
        f"<ArticleTitle>Study {pmid} of synthetic data.</ArticleTitle>"
        f"{_pagination(case)}{_authors(case, i)}{_grants(case, i)}"
        "</Article>"
        "<MedlineJournalInfo><MedlineTA>J Synth Data</MedlineTA>"
        "</MedlineJournalInfo>"
        "</MedlineCitation></PubmedArticle>"
    )


def efetch_response_xml(pmids: list[str]) -> str:
    return ("<PubmedArticleSet>"
            + "".join(pubmed_article_xml(p) for p in pmids)
            + "</PubmedArticleSet>")


PMID_INFO_SCHEMA = "pmid string, xml string, citation string, grants_json string"


def gen_pmid_info(pmids: list[str]) -> list[dict]:
    rows = []
    for p in pmids:
        xml = f"<PubmedArticleSet>{pubmed_article_xml(p)}</PubmedArticleSet>"
        info = eutils_batch_info(xml)[p]
        rows.append({
            "pmid": p,
            "xml": xml,
            "citation": info["citation"],
            "grants_json": json.dumps(info["grants"]),
        })
    return rows


def pmid_info_df(spark, pmids: list[str]):
    return spark.createDataFrame(gen_pmid_info(pmids), schema=PMID_INFO_SCHEMA)
