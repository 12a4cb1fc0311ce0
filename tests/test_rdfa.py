"""RDFa Lite extraction: value sources, vocab scoping, nesting,
document-level triples, malformed-input degradation."""

from biothings_crawler_spark.operators.rdfa import _parse_rdfa, rdfa_extract


def test_value_sources_and_nesting():
    html = (
        '<html><body vocab="https://schema.org/">'
        '<div typeof="Dataset">'
        '<h1 property="name">DS 7 &amp; co</h1>'
        '<meta property="identifier" content="id-7">'
        '<a property="url" href="https://ex.org/d/7">link</a>'
        '<time property="dateModified" datetime="2024-01-02">Jan 2</time>'
        '<span property="about" resource="#topic">topic text</span>'
        '<div property="creator" typeof="Person">'
        '<span property="name">P 3</span></div>'
        "</div>"
        '<p property="description">doc-level triple</p>'
        '<div typeof="foaf:Agent"><span property="nick">abs</span></div>'
        "</body></html>"
    )
    rows = _parse_rdfa(html)
    assert (0, "https://schema.org/Dataset", None, None, "name",
            "DS 7 & co") in rows
    assert (0, "https://schema.org/Dataset", None, None, "identifier",
            "id-7") in rows
    assert (0, "https://schema.org/Dataset", None, None, "url",
            "https://ex.org/d/7") in rows
    assert (0, "https://schema.org/Dataset", None, None, "dateModified",
            "2024-01-02") in rows
    assert (0, "https://schema.org/Dataset", None, None, "about",
            "#topic") in rows
    # subject-as-value nesting
    assert (1, "https://schema.org/Person", 0, "creator", "name",
            "P 3") in rows
    # document-level triple, no open subject
    assert (None, None, None, None, "description",
            "doc-level triple") in rows
    # absolute CURIE typeof does not get the vocab prefix
    assert (2, "foaf:Agent", None, None, "nick", "abs") in rows
    assert len(rows) == 8


def test_vocab_override_and_multitoken_property():
    html = (
        '<div vocab="https://a.org/"><div typeof="T">'
        '<span property="x y">v</span></div>'
        '<div vocab="https://b.org/" typeof="U">'
        '<span property="z">w</span></div></div>'
    )
    rows = _parse_rdfa(html)
    assert (0, "https://a.org/T", None, None, "x", "v") in rows
    assert (0, "https://a.org/T", None, None, "y", "v") in rows
    assert (1, "https://b.org/U", None, None, "z", "w") in rows


def test_malformed_html_degrades_not_raises():
    # unclosed tags, stray close, nested text property overlap
    rows = _parse_rdfa('<div typeof="T"><span property="a">x</div></b>')
    assert rows == [(0, "T", None, None, "a", "x")]
    assert _parse_rdfa("") == []
    assert _parse_rdfa("<<<>>>") == []


def test_dataframe_shape(spark):
    df = spark.createDataFrame(
        [(1, '<div typeof="T"><b property="p">v</b></div>'), (2, None)],
        "id long, html string",
    )
    rows = rdfa_extract(df).collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 1 and rows[0]["prop"] == "p"
    assert rows[0]["value"] == "v" and rows[0]["type_iri"] == "T"
