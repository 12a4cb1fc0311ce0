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
