"""Generic HTML table extraction (operators/extract.html_tables)."""

from biothings_crawler_spark.operators.extract import html_tables


def _run(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return sorted(
        ((r.table_idx, r.row, r.col, r.cell, r.is_header)
         for r in html_tables(df, "doc_id", "html").collect()))


def test_header_data_and_indexes(spark):
    got = _run(spark, "<table><tr><th>A</th><th>B</th></tr>"
                      "<tr><td>1</td><td>2</td></tr></table>")
    assert got == [(0, 0, 0, "A", 1), (0, 0, 1, "B", 1),
                   (0, 1, 0, "1", 0), (0, 1, 1, "2", 0)]


def test_multiple_tables_and_markup_strip(spark):
    got = _run(spark,
               "x<table><tr><td><b>bold</b> text</td></tr></table>"
               "y<table><tr><td>t2</td></tr></table>")
    # inner markup replaced by a space (then edge-trimmed): the <b>
    # open/close tags become two spaces around 'bold'
    assert got == [(0, 0, 0, "bold  text", 0), (1, 0, 0, "t2", 0)]


def test_mixed_th_td_in_one_row(spark):
    got = _run(spark, "<table><tr><th>k</th><td>v</td></tr></table>")
    assert got == [(0, 0, 0, "k", 1), (0, 0, 1, "v", 0)]


def test_multiline_cells_and_attrs(spark):
    got = _run(spark, '<table border="1">\n<tr class="r">\n'
                      '<td align="l">a\nb</td>\n</tr>\n</table>')
    assert len(got) == 1
    assert got[0][3] == "a\nb" and got[0][4] == 0


def test_no_tables_no_rows(spark):
    assert _run(spark, "<p>nothing tabular</p>") == []


def test_js_required_lanes(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.extract import js_required_col

    rows = [
        (1, "<html><body><p>" + "real text " * 30 + "</p></body></html>"),
        (2, '<html><body><div id="root"></div><script>'
            + "var x=1;" * 40 + "</script></body></html>"),
        (3, "<html><body><p>" + "words " * 40 + "</p><script>"
            + "f();" * 400 + "</script></body></html>"),
        (4, "<html><body><p>hi</p><script>go()</script></body></html>"),
        (5, "<html><body><noscript><p>" + "fallback " * 30
            + "</p></noscript></body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    m = js_required_col(F.col("html"))
    got = {r.doc_id: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in m.items()]).collect()}
    assert got[1].js_required == 0 and got[1].script_ratio_ppm == 0
    assert got[2].js_required == 1 and got[2].spa_mount == 1
    assert got[3].js_required == 1                 # ratio > 60%
    assert got[3].script_ratio_ppm > 600_000
    assert got[4].js_required == 1                 # thin + scripted
    assert got[5].js_required == 0 and got[5].has_noscript == 1


def test_js_required_plan_pure_projection(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.extract import js_required_col

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    m = js_required_col(F.col("html"))
    plan = df.select("doc_id", *[v.alias(k) for k, v in m.items()]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
