"""Retry backoff scheduling + EWMA discovery forecasting."""

from biothings_crawler_spark.operators.frontier import discovery_forecast
from biothings_crawler_spark.operators.recrawl import retry_backoff


def test_retry_backoff_streaks(spark):
    f = spark.createDataFrame(
        [
            ("a", 100, True),                     # healthy
            ("b", 100, True), ("b", 200, False),  # 1 trailing fail
            ("c", 100, False), ("c", 200, False), ("c", 300, False),  # 3
            ("d", 100, False), ("d", 200, False), ("d", 300, False),
            ("d", 400, False), ("d", 500, False),  # 5 -> give_up
            ("e", 100, False), ("e", 200, True), ("e", 300, False),  # 1
        ],
        "url string, ts_us long, ok boolean",
    )
    out = {r.url: r for r in
           retry_backoff(f, base_s=60, cap_s=3600, max_attempts=5).collect()}
    assert out["a"].action == "ok" and out["a"].next_due_us is None
    assert out["b"].action == "retry"
    assert out["b"].next_due_us == 200 + 60 * 1_000_000  # base * 2^0
    assert out["c"].action == "retry"
    assert out["c"].next_due_us == 300 + 240 * 1_000_000  # base * 2^2
    assert out["d"].action == "give_up" and out["d"].next_due_us is None
    assert out["e"].n_fails == 1  # success resets the streak


def test_retry_backoff_cap(spark):
    f = spark.createDataFrame(
        [("x", 100 + i, False) for i in range(4)],
        "url string, ts_us long, ok boolean")
    r = retry_backoff(f, base_s=600, cap_s=1800, max_attempts=9).collect()[0]
    assert r.next_due_us == 103 + 1800 * 1_000_000  # 600*2^3=4800 capped


def test_discovery_forecast_recurrence(spark):
    c = spark.createDataFrame(
        [("h", 0, 10), ("h", 1, 20), ("h", 2, 0), ("g", 5, 7)],
        "host string, hour_no long, n long")
    out = {r.host: r for r in discovery_forecast(c, 30).collect()}
    # s0=1000, s1=(30*2000+70*1000)//100=1300, s2=(0+70*1300)//100=910
    assert out["h"].ewma_centi == 910 and out["h"].forecast == 9
    assert out["h"].n_hours == 3
    assert out["g"].ewma_centi == 700 and out["g"].n_hours == 1


def test_leakage_safe_splits_cluster_integrity(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.sampling import leakage_safe_splits

    docs = spark.createDataFrame([(i,) for i in range(300)], "id long")
    # components: docs 0-9 in one cluster, 10-14 in another, rest singleton
    clusters = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(i, 10) for i in range(10, 15)]
        + [(i, i) for i in range(15, 300)], "id long, component long")
    out = leakage_safe_splits(docs, clusters)
    # every cluster lands in exactly one split
    per = out.groupBy("component").agg(
        F.countDistinct("split").alias("k")).collect()
    assert all(r.k == 1 for r in per)
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert "train" in splits and len(splits) >= 2
    # deterministic across invocations
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, leakage_safe_splits(docs, clusters).collect()))
    assert a == b


def test_greedy_seed_cover_hand_case(spark):
    from biothings_crawler_spark.operators.frontier import greedy_seed_cover

    cov = spark.createDataFrame(
        [("a", h) for h in "12345"]        # a covers 5
        + [("b", h) for h in "456789"]     # b covers 6
        + [("c", h) for h in "120x"],      # c covers 1,2,0,x
        "seed string, host string")
    got = [(r.round, r.seed, r.gain)
           for r in greedy_seed_cover(cov, 4).orderBy("round").collect()]
    # b first (6 new), then c ({1,2,0,x} -> 4 new, beats a's 3), then a
    # ({3} -> 1 new), then nothing remains: early stop before round 4
    assert got == [(1, "b", 6), (2, "c", 4), (3, "a", 1)]


def test_greedy_seed_cover_tie_breaks_to_smaller_seed(spark):
    from biothings_crawler_spark.operators.frontier import greedy_seed_cover

    cov = spark.createDataFrame(
        [("z", "1"), ("z", "2"), ("m", "3"), ("m", "4")],
        "seed string, host string")
    got = [(r.round, r.seed) for r in
           greedy_seed_cover(cov, 2).orderBy("round").collect()]
    assert got == [(1, "m"), (2, "z")]


def test_url_identity_transitive_collapse(spark):
    from biothings_crawler_spark.plans.analysis import url_identity

    pages = spark.createDataFrame([
        ("https://s/base", "<html><body>B1</body></html>"),
        ("https://s/base?utm=1",
         '<html><head><link rel="canonical" href="https://s/base">'
         "</head><body>B1 utm</body></html>"),
        ("https://mirror/base", "<html><body>B1</body></html>"),  # mirror
        ("https://s/other", "<html><body>B2</body></html>"),
    ], "url string, html string")
    redirects = spark.createDataFrame(
        [("https://s/older", "https://s/old"),
         ("https://s/old", "https://s/base")],
        "src_url string, dst_url string")
    got = {r.url: (r.identity, r.group_size)
           for r in url_identity(pages, redirects).collect()}
    fam = "https://mirror/base"  # smallest string in the family
    assert got["https://s/base"] == (fam, 5)
    assert got["https://s/base?utm=1"][0] == fam
    assert got["https://s/older"][0] == fam  # 2-hop redirect chain
    assert got["https://s/other"] == ("https://s/other", 1)


def test_fetch_schedule_closed_form_equals_recurrence(spark):
    from biothings_crawler_spark.operators.politeness import fetch_schedule

    arr = [0, 100, 150, 1000, 1020]  # bursty then sparse, delay 200
    df = spark.createDataFrame(
        [("h", i, a) for i, a in enumerate(arr)],
        "host string, seq long, arrival_us long")
    got = {r.seq: (r.start_us, r.wait_us)
           for r in fetch_schedule(df, delay_us=200).collect()}
    # sequential reference: start_i = max(arr_i, start_{i-1} + 200)
    start, want = -10**18, {}
    for i, a in enumerate(arr):
        start = max(a, start + 200)
        want[i] = (start, start - a)
    assert got == want
