"""PubMed eutils XML -> citation string + grants list.

Byte-compatible re-implementation of the reference's ad-hoc
ANSI/NISO-Z39.29-ish formatter (crawler/upload/helper.py:38-171),
written fresh against its observable rules:

  authors   <=4 joined ', ' + '. '; >4 first four + ' et al. ';
            none -> '[No authors listed] '; ValidYN='N' skipped
            (PMID 16155929 class); CollectiveName + trailing '.'
            (PMID 17571346 class); name = 'LastName Initials[ Suffix]'
  title     'ArticleTitle ' then 'MedlineTA'
  date      ' ' + PubDate children joined ' ' in document order;
            Day de-zeroed (str(int(x))); numeric Month -> abbr;
            Year/Season/MedlineDate verbatim
  tail      ';' + Volume + '(Issue)' + ':Pages' + '.' + ' PMID: n'
  grants    [{funder: {@type: Organization, name: Agency},
              identifier: GrantID}] — keys present only when the XML
            element is; empty grant dicts dropped

The live eutils HTTP call + rate-limit sleeps (ncbi_geo.py:83-87) are
replaced by the pmid_info fixture table joined at transform time — no
mid-job network, no sleeps (SURVEY.md §3.2).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

MONTH_ABBR = ["", "Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _author_names(article: ET.Element) -> list[str]:
    names = []
    for a in article.findall(".//Author"):
        if a.attrib.get("ValidYN", "Y") == "N":
            continue
        last = a.find("LastName")
        if last is not None:
            parts = [last.text, a.find("Initials").text]
            suffix = a.find("Suffix")
            if suffix is not None:
                parts.append(suffix.text)
            names.append(" ".join(parts))
        else:
            coll = a.find("CollectiveName")
            if coll is not None:
                names.append(coll.text + ".")
    return names


def _segment(article: ET.Element, specs: list[tuple[str, str]]) -> str:
    out = ""
    for xpath, template in specs:
        node = article.find(xpath)
        if node is not None:
            out += template.format(node.text)
    return out


def _pubdate_text(article: ET.Element) -> str:
    pubdate = article.find(".//MedlineCitation/Article/Journal/JournalIssue/PubDate")
    if pubdate is None:
        return ""
    parts = []
    for el in pubdate:
        if el.tag == "Day":
            parts.append(str(int(el.text)))
        elif el.tag == "Month" and el.text.isdigit():
            parts.append(MONTH_ABBR[int(el.text)])
        else:
            parts.append(el.text)
    return " " + " ".join(parts) if parts else ""


def format_citation(article: ET.Element) -> str:
    authors = _author_names(article)
    if len(authors) > 4:
        cite = ", ".join(authors[:4]) + " et al. "
    elif len(authors) >= 1:
        cite = ", ".join(authors) + ". "
    else:
        cite = "[No authors listed] "
    cite += _segment(article, [
        (".//MedlineCitation/Article/ArticleTitle", "{} "),
        (".//MedlineCitation/MedlineJournalInfo/MedlineTA", "{}"),
    ])
    cite += _pubdate_text(article)
    cite += ";"
    cite += _segment(article, [
        (".//MedlineCitation/Article/Journal/JournalIssue/Volume", "{}"),
        (".//MedlineCitation/Article/Journal/JournalIssue/Issue", "({})"),
        (".//MedlineCitation/Article/Pagination/MedlinePgn", ":{}"),
    ])
    cite += "."
    cite += _segment(article, [(".//MedlineCitation/PMID", " PMID: {}")])
    return cite


def extract_grants(article: ET.Element) -> list[dict]:
    grants = []
    for g in article.findall(".//Grant"):
        entry: dict = {}
        agency = g.find("Agency")
        if agency is not None:
            entry["funder"] = {"@type": "Organization", "name": agency.text}
        gid = g.find("GrantID")
        if gid is not None:
            entry["identifier"] = gid.text
        if entry:
            grants.append(entry)
    return grants


def eutils_batch_info(xml_text: str) -> dict[str, dict]:
    """Parse an efetch response: pmid -> {citation, grants}
    (helper.py:38-171 output contract)."""
    root = ET.fromstring(xml_text)
    out = {}
    for article in root.findall(".//PubmedArticle"):
        pmid = article.find(".//MedlineCitation/PMID").text
        out[pmid] = {
            "citation": format_citation(article),
            "grants": extract_grants(article),
        }
    return out
