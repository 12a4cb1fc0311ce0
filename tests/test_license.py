"""License detection (operators/license): SPDX > phrase > unknown,
bounded header-window scan, The Stack permissive rule."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.license import detect_licenses


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: (r.license, r.detector, r.permissive)
            for r in detect_licenses(df).collect()}


def test_spdx_beats_phrase_and_permissive_rule(spark):
    got = _run(spark, [
        (1, "// SPDX-License-Identifier: MIT\ncode"),
        (2, "// SPDX-License-Identifier: GPL-3.0-only\ncode"),
        (3, "/* Permission is hereby granted, free of charge */ x"),
        (4, "/* GNU General Public License */ x"),
        # conflict: SPDX wins over the GPL phrase below it
        (5, "// SPDX-License-Identifier: Apache-2.0\n"
            "/* GNU General Public License */"),
        (6, "no license at all"),
        (7, None),
    ])
    assert got[1] == ("MIT", "spdx", 1)
    assert got[2] == ("GPL-3.0-only", "spdx", 0)
    assert got[3] == ("MIT", "phrase", 1)
    assert got[4] == ("GPL-3.0-only", "phrase", 0)
    assert got[5] == ("Apache-2.0", "spdx", 1)
    assert got[6] == ("unknown", "none", 0)
    assert got[7] == ("unknown", "none", 0)


def test_phrase_priority_order(spark):
    """When several phrases appear, the PHRASES order wins (MIT first)."""
    both = ("/* Permission is hereby granted, free of charge */\n"
            "/* GNU General Public License */")
    got = _run(spark, [(1, both)])
    assert got[1] == ("MIT", "phrase", 1)


def test_header_window_bounds_the_scan(spark):
    """A license phrase buried past header_chars is invisible — the
    scan cost stays O(window) per row."""
    deep = "x" * 700 + " Permission is hereby granted, free of charge"
    got = _run(spark, [(1, deep)])
    assert got[1] == ("unknown", "none", 0)
    df = spark.createDataFrame([(1, deep)], "doc_id long, text string")
    wide = {r.doc_id: r.license
            for r in detect_licenses(df, header_chars=10_000).collect()}
    assert wide[1] == "MIT"


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = detect_licenses(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    # a filter on the result column still reaches the scan side
    filt = detect_licenses(df).filter(F.col("permissive") == 1)
    fplan = filt._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in fplan
