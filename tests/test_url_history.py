"""SCD2 URL content-version history (operators/snapshot.url_history)."""

import datetime

from biothings_crawler_spark.operators.snapshot import url_history


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_runs_collapse_into_versions(spark):
    rows = [
        ("u1", _ts(0), "a"), ("u1", _ts(1), "a"), ("u1", _ts(2), "b"),
        ("u1", _ts(3), "b"), ("u1", _ts(4), "b"), ("u1", _ts(5), "a"),
        ("u2", _ts(0), "x"),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts timestamp, content_hash string"
    )
    out = sorted(
        url_history(df).collect(), key=lambda r: (r.url, r.version_no)
    )
    u1 = [r for r in out if r.url == "u1"]
    assert [(r.content_hash, r.n_fetches) for r in u1] == [
        ("a", 2), ("b", 3), ("a", 1)]
    assert u1[0].valid_from == _ts(0) and u1[0].valid_to == _ts(2)
    assert u1[1].valid_to == _ts(5)
    assert u1[2].valid_to is None          # live version
    u2 = [r for r in out if r.url == "u2"]
    assert len(u2) == 1 and u2[0].version_no == 1 and u2[0].valid_to is None


def test_deterministic_under_partitioning_and_no_window(spark):
    rows = [
        (f"u{i % 7}", _ts(i % 60), f"h{(i // 11) % 3}") for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts timestamp, content_hash string"
    )
    a = sorted(map(tuple, url_history(df).collect()))
    b = sorted(map(tuple, url_history(df.repartition(13)).collect()))
    assert a == b
    plan = url_history(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "BatchEvalPython" not in plan


def test_conditional_fetch_report_accounting(spark):
    """Unchanged refetches count as recoverable bytes; first fetches
    never do; waste_ppm is exact over refetch bytes."""
    import datetime as dt

    from biothings_crawler_spark.operators.snapshot import (
        conditional_fetch_report,
    )

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        # u1: fetched 3x, unchanged twice -> 2 wasted bodies of 100
        ("h", "u1", t(0), "a", 100, 1),
        ("h", "u1", t(1), "a", 100, 2),
        ("h", "u1", t(2), "a", 100, 3),
        # u2: refetch with CHANGED content -> not wasted
        ("h", "u2", t(0), "x", 50, 4),
        ("h", "u2", t(1), "y", 50, 5),
        # u3: single fetch
        ("g", "u3", t(0), "z", 70, 6),
    ]
    df = spark.createDataFrame(
        rows, "host string, url string, ts timestamp_ntz, h string, "
              "size long, eid long")
    out = {r["host"]: r for r in conditional_fetch_report(
        df, "host", "url", "ts", "h", "size", "eid").collect()}
    hh = out["h"]
    assert hh["n_fetches"] == 5 and hh["n_refetches"] == 3
    assert hh["n_unchanged"] == 2 and hh["bytes_unchanged"] == 200
    assert hh["waste_ppm"] == 200 * 1_000_000 // 250
    g = out["g"]
    assert g["n_refetches"] == 0 and g["waste_ppm"] == 0


def test_fold_operators_partitioning_invariance(spark):
    """The AIMD and quantile folds are order-canonicalized
    (array_sort over unique keys), so 1-partition and 32-partition
    runs produce identical rows — determinism under parallelism."""
    import datetime as dt

    from biothings_crawler_spark.operators.recrawl import aimd_host_rates
    from biothings_crawler_spark.operators.sketch import host_latency_quantiles

    t = lambda h, s: dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, seconds=s)
    rows = [("h%d" % (i % 7), t(i % 50, i % 60), 429 if i % 13 == 0 else 200,
             (i * 37) % 100000 + 1) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "host string, ts timestamp_ntz, status int, v long")
    for op, args in ((aimd_host_rates, ("host", "ts", "status")),
                     (host_latency_quantiles, ("host", "v"))):
        one = sorted(map(tuple, op(df.coalesce(1), *args).collect()))
        many = sorted(map(tuple, op(df.repartition(32), *args).collect()))
        assert one == many, op.__name__
