"""AI/TDM opt-out signals (operators/compliance)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.compliance import (
    ai_optout_flags,
    optout_accounting,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode(), x) for u, h, x in rows],
        "url string, html binary, x_robots_tag string",
    )


def _flags(spark, rows):
    out = ai_optout_flags(_pages(spark, rows)).collect()
    return {
        r["url"]: (r["noai"], r["noimageai"], r["tdm_reserved"],
                   r["ai_opt_out"])
        for r in out
    }


def test_signal_lanes(spark):
    got = _flags(spark, [
        ("meta", '<meta name="robots" content="noai">', ""),
        ("rev", '<META CONTENT="nofollow, noai" NAME=ROBOTS>', ""),
        ("hdr", "<p>x</p>", "X-Robots-Tag: noai"),
        ("tdm1", '<meta name="tdm-reservation" content="1">', ""),
        ("tdm0", '<meta name="tdm-reservation" content="0">', ""),
        ("tdmh", "<p>x</p>", "tdm-reservation: 1"),
        ("img", "<p>x</p>", "noimageai"),
        ("clean", "<p>noai mentioned in body text only</p>", ""),
    ])
    assert got["meta"] == (True, False, False, True)
    assert got["rev"] == (True, False, False, True)
    assert got["hdr"] == (True, False, False, True)
    assert got["tdm1"] == (False, False, True, True)
    # content="0" explicitly waives the reservation
    assert got["tdm0"] == (False, False, False, False)
    assert got["tdmh"] == (False, False, True, True)
    # noimageai excludes images, not the page text
    assert got["img"] == (False, True, False, False)
    # body prose never triggers — only meta content / header do
    assert got["clean"] == (False, False, False, False)


def test_tdm_any_reservation_wins_and_noai_token_bounded(spark):
    got = _flags(spark, [
        # two tags, one reserving: the conservative reading reserves
        ("both", '<meta name="tdm-reservation" content="0">'
                 '<meta name="tdm-reservation" content="1">', ""),
        # "noai" must be a whole token: "kenoai"/"noaif" don't count
        ("sub", '<meta name="robots" content="kenoai, noaif">', ""),
    ])
    assert got["both"][2] is True
    assert got["sub"] == (False, False, False, False)


def test_accounting_exact(spark):
    rows = [("a", '<meta name="robots" content="noai">', ""),
            ("b", "<p>x</p>", ""),
            ("c", "<p>x</p>", "tdm-reservation: 1"),
            ("d", "<p>x</p>", "noimageai")]
    flagged = ai_optout_flags(_pages(spark, rows)).withColumn(
        "host", F.lit("h")).withColumn("n_tokens", F.length("url"))
    out = optout_accounting(flagged, "host", "n_tokens").collect()[0]
    assert (out["n_pages"], out["n_noai"], out["n_noimageai"],
            out["n_tdm"], out["n_opt_out"]) == (4, 1, 1, 1, 2)
    assert out["optout_ppm"] == 500000
    assert out["tokens_kept"] == 2 and out["tokens_lost"] == 2


def test_flags_plan_row_local(spark):
    df = ai_optout_flags(_pages(spark, [("u", "<p>x</p>", "")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
