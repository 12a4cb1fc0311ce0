"""Text-density main-content extraction
(operators/extract.extract_main_content)."""

from biothings_crawler_spark.operators.extract import extract_main_content

HTML = (
    '<div id="nav"><a href="/">Home</a> <a href="/a">About</a>'
    ' <a href="/c">Contact</a></div>'
    "<p>one two three four five six seven eight nine ten eleven twelve.</p>"
    "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa see"
    ' <a href="/d">details page</a> now.</p>'
    "<div>tiny junk</div>"
    '<div class="footer"><a href="/1">link one</a> <a href="/2">link two</a>'
    ' <a href="/3">link three</a></div>'
)


def test_keeps_dense_blocks_drops_chrome(spark):
    df = spark.createDataFrame([(1, HTML)], "id long, html string")
    r = extract_main_content(df, "id", "html").collect()[0]
    lines = r.main_text.split("\n")
    assert len(lines) == 2 and r.n_kept == 2
    assert lines[0].startswith("one two three")
    # inline anchor's text survives inside the dense paragraph
    assert "details page" in lines[1]
    assert "Home" not in r.main_text and "link one" not in r.main_text
    assert "tiny junk" not in r.main_text


def test_link_saturated_long_block_is_dropped(spark):
    # 12 words, but all inside anchors -> link density 10^6 ppm
    farm = "<div>" + " ".join(
        f'<a href="/{i}">word{i} plus{i}</a>' for i in range(6)
    ) + "</div>"
    df = spark.createDataFrame([(1, farm)], "id long, html string")
    r = extract_main_content(df, "id", "html").collect()[0]
    assert r.n_kept == 0 and r.main_text == ""


def test_short_page_and_plan(spark):
    df = spark.createDataFrame([(1, "<p>too short.</p>")], "id long, html string")
    out = extract_main_content(df, "id", "html")
    r = out.collect()[0]
    assert r.n_kept == 0 and r.main_text == ""
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
