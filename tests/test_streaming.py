"""Structured Streaming variant of the incremental cursor: file-stream
the hits, watermark on the cursor column, drop duplicate ids within the
watermark, Trigger.AvailableNow (one incremental round, then stop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biothings_crawler_spark.streaming.incremental import incremental_stream

SCHEMA = "id long, published_date timestamp, payload string"


def test_incremental_stream_available_now(spark, tmp_path):
    hits = spark.createDataFrame(
        [(i % 8, f"2024-01-{(i % 20) + 1:02d}", f"p{i}") for i in range(40)],
        "id long, d string, payload string",
    ).select("id", F.col("d").cast("timestamp").alias("published_date"), "payload")
    src = str(tmp_path / "hits")
    hits.coalesce(1).write.parquet(src)

    dest = str(tmp_path / "out")

    def run_round():
        q = (
            incremental_stream(spark, src, SCHEMA)
            .writeStream.format("parquet")
            .option("path", dest)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_round()
    out = spark.read.parquet(dest)
    # dropDuplicatesWithinWatermark on id: one row per id survives
    assert out.count() == 8
    assert out.select("id").distinct().count() == 8

    # second round over the same backlog with the same checkpoint is a
    # no-op (idempotent re-run, the reference's exists()-skip analog)
    run_round()
    assert spark.read.parquet(dest).count() == 8


def test_stateful_cursor_survives_restart(spark, tmp_path):
    """applyInPandasWithState per-source cursor: run 1 emits everything
    and stores cursors in the state store; a RESTARTED query on the same
    checkpoint suppresses replayed/old rows and emits only newer ones
    (SURVEY §2.11 custom stateful operator)."""
    import pandas as pd

    from biothings_crawler_spark.streaming.stateful import (
        RECORD_SCHEMA,
        incremental_cursor_stream,
    )

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def run_once():
        stream = spark.readStream.schema(RECORD_SCHEMA).parquet(str(src))
        q = (
            incremental_cursor_stream(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["source"], r["rec_id"], r["ts"])
            for r in spark.read.schema(RECORD_SCHEMA).parquet(str(out)).collect()
        }

    batch1 = [("figshare", f"r{i}", i) for i in range(1, 6)] + [("zenodo", "z1", 10)]
    spark.createDataFrame(batch1, RECORD_SCHEMA).coalesce(1).write.mode(
        "append").parquet(str(src))
    got1 = run_once()
    assert got1 == set(batch1)  # first run: no cursor yet, all emitted

    # replay ts 3..5 (stale) plus genuinely new 6..8; zenodo replays only
    batch2 = [("figshare", f"r{i}b", i) for i in range(3, 9)] + [("zenodo", "z1", 10)]
    spark.createDataFrame(batch2, RECORD_SCHEMA).coalesce(1).write.mode(
        "append").parquet(str(src))
    got2 = run_once()
    assert got2 - got1 == {("figshare", f"r{i}b", i) for i in range(6, 9)}


def test_session_stream_watermark_finalizes_and_resumes(spark, tmp_path):
    """Streaming session windows: append mode emits a session exactly
    once its window can no longer grow (watermark passed), un-final
    sessions wait in the state store, and a restarted query on the
    same checkpoint flushes them when later data advances the
    watermark — no duplicates, no losses."""
    import datetime as dt

    from biothings_crawler_spark.streaming.sessions import session_stream

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    schema = "key long, ts timestamp_ntz"
    src = tmp_path / "events"
    src.mkdir()
    # file 1: session A (key 1: t0,t1,t2) and session B (key 2: t1000,t1001)
    spark.createDataFrame(
        [(1, t(0)), (1, t(1)), (1, t(2)), (2, t(1000)), (2, t(1001))], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    # file 2: session C (key 1: t5000) + a far-future watermark driver
    spark.createDataFrame([(1, t(5000)), (9, t(100000))], schema).coalesce(
        1
    ).write.parquet(str(src / "f2"))

    dest = str(tmp_path / "sessions_out")

    def run_round():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            session_stream(stream, "key", "ts", gap_seconds=60,
                           watermark="10 seconds")
            .writeStream.format("parquet")
            .option("path", dest)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_round()
    got = {(r["key"], r["n_events"]) for r in spark.read.parquet(dest).collect()}
    # watermark reached 100000-10s: sessions A, B, C are all final;
    # the driver event's own session (t100000) is not
    assert got == {(1, 3), (2, 2), (1, 1)}

    # round 2 on the same checkpoint: another watermark driver flushes
    # the previously-open session for key 9; nothing re-emits
    spark.createDataFrame([(9, t(200000))], schema).coalesce(1).write.parquet(
        str(src / "f3")
    )
    run_round()
    got2 = [(r["key"], r["n_events"]) for r in spark.read.parquet(dest).collect()]
    assert sorted(got2) == sorted([(1, 3), (2, 2), (1, 1), (9, 1)])
    # session rows carry the batch operator's epoch-us convention
    row = {r["key"]: r for r in spark.read.parquet(dest).collect()}[2]
    base = int(dt.datetime(2024, 1, 1).timestamp())  # UTC session tz
    assert row["duration_us"] == 1_000_000 and row["n_events"] == 2


def test_dedup_fetch_stream_watermark_and_resume(spark, tmp_path):
    """Streaming URL admission: first record per key wins, duplicates
    within the watermark are dropped, and a second AvailableNow round
    on the same checkpoint neither re-admits nor loses keys."""
    import datetime as dt

    from biothings_crawler_spark.streaming.sessions import dedup_fetch_stream

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    schema = "url_canon string, ts timestamp_ntz, body string"
    src = tmp_path / "fetches"
    src.mkdir()
    spark.createDataFrame(
        [("u1", t(0), "first"), ("u1", t(5), "dup-in-window"),
         ("u2", t(1), "first"), ("u1", t(8), "dup2")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))

    dest = str(tmp_path / "admitted")

    def run_round():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            dedup_fetch_stream(stream, "url_canon", "ts", watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", dest)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_round()
    got = {(r["url_canon"], r["body"]) for r in spark.read.parquet(dest).collect()}
    assert got == {("u1", "first"), ("u2", "first")}

    # round 2: a re-fetch of u1 within the horizon plus a new key;
    # restart on the same checkpoint — u1 stays admitted exactly once
    spark.createDataFrame(
        [("u1", t(20), "late-dup"), ("u3", t(30), "first")], schema
    ).coalesce(1).write.parquet(str(src / "f2"))
    run_round()
    got2 = sorted((r["url_canon"], r["body"])
                  for r in spark.read.parquet(dest).collect())
    assert got2 == [("u1", "first"), ("u2", "first"), ("u3", "first")]


def test_token_bucket_stream_budget_carries_across_batches(spark, tmp_path):
    """Per-host token bucket in the state store: batch 1 spends the
    initial burst; batch 2 only gets the refill; an idle batch lets
    tokens re-accumulate (capped); restart on the same checkpoint
    resumes bucket levels, and admission order is (priority desc, url)
    with batch_rank recording it."""
    from biothings_crawler_spark.streaming.stateful import (
        REQUEST_SCHEMA,
        token_bucket_stream,
    )

    src = tmp_path / "req"
    out = tmp_path / "adm"
    ckpt = tmp_path / "ck"
    src.mkdir()

    def run_once():
        stream = spark.readStream.schema(REQUEST_SCHEMA).parquet(str(src))
        q = (
            token_bucket_stream(stream, refill_per_batch=2, burst=5)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(out)).collect()

    # batch 1: 7 requests for hostA -> initial burst admits 5, in
    # (priority desc, url) order
    b1 = [("hostA", f"u{i}", i % 3) for i in range(7)] + [("hostB", "x0", 9)]
    spark.createDataFrame(b1, REQUEST_SCHEMA).coalesce(1).write.mode(
        "append").parquet(str(src))
    got1 = run_once()
    a1 = sorted([r for r in got1 if r["host"] == "hostA"],
                key=lambda r: r["batch_rank"])
    assert len(a1) == 5 and len([r for r in got1 if r["host"] == "hostB"]) == 1
    expected = sorted([("u" + str(i), i % 3) for i in range(7)],
                      key=lambda t: (-t[1], t[0]))[:5]
    assert [(r["url"], r["priority"]) for r in a1] == expected

    # batch 2 (restarted query, same checkpoint): hostA exhausted its
    # burst -> only the refill (2) admits
    b2 = [("hostA", f"v{i}", 5) for i in range(6)]
    spark.createDataFrame(b2, REQUEST_SCHEMA).coalesce(1).write.mode(
        "append").parquet(str(src))
    got2 = run_once()
    new_a = [r for r in got2 if r["url"].startswith("v")]
    assert len(new_a) == 2
    assert sorted(r["url"] for r in new_a) == ["v0", "v1"]


def test_spacesaving_bounds_hold():
    """Metwally guarantees on a skewed synthetic stream: every host
    with true frequency > n/m is in the table, and each reported count
    brackets the truth: cnt - err <= true <= cnt."""
    import random
    from collections import Counter

    from biothings_crawler_spark.streaming.trending import (
        spacesaving_update)

    rng = random.Random(11)
    stream = (["hot-a"] * 300 + ["hot-b"] * 200 + ["hot-c"] * 120
              + [f"tail{rng.randrange(400)}" for _ in range(600)])
    rng.shuffle(stream)
    m = 16
    hosts, cnts, errs = spacesaving_update([], [], [], stream, m)
    assert len(hosts) <= m
    true = Counter(stream)
    table = {h: (c, e) for h, c, e in zip(hosts, cnts, errs)}
    threshold = len(stream) / m
    for h, t in true.items():
        if t > threshold:
            assert h in table, (h, t)
    for h, (c, e) in table.items():
        assert c - e <= true[h] <= c, (h, c, e, true[h])


def test_trending_hosts_stream_resumes_and_merges(spark, tmp_path):
    """Two AvailableNow rounds on one checkpoint: the per-shard
    SpaceSaving state must survive the restart (counts keep growing,
    never reset), and the merged top-k must surface the planted heavy
    hitters with bound-respecting counts vs the exact batch truth."""
    from collections import Counter

    from biothings_crawler_spark.streaming.trending import (
        merge_summaries,
        trending_hosts_stream,
    )

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def batch(tag, rows):
        spark.createDataFrame(
            [(h,) for h in rows], "host string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(src / tag))

    b1 = ["big.example"] * 60 + ["mid.example"] * 25 + [
        f"t{i}.example" for i in range(40)]
    b2 = ["big.example"] * 40 + ["mid.example"] * 35 + [
        f"u{i}.example" for i in range(40)]
    batch("b1", b1)

    out = str(tmp_path / "out")

    def run_round():
        stream = spark.readStream.schema("host string").parquet(
            str(src / "*"))
        q = (trending_hosts_stream(stream, m=8)
             .writeStream.foreachBatch(
                 lambda df, _eid: df.write.mode("append").parquet(out))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_round()
    batch("b2", b2)
    run_round()

    spark.read.parquet(out).createOrReplaceTempView("trend")
    tables = spark.sql("""
        SELECT shard, host, cnt, err FROM (
          SELECT *, row_number() OVER (
            PARTITION BY shard, host ORDER BY cnt DESC) AS rn
          FROM trend) WHERE rn = 1""")
    top = {r["host"]: (r["cnt"], r["err"])
           for r in merge_summaries(tables, k=4).collect()}
    true = Counter(b1 + b2)
    assert "big.example" in top and "mid.example" in top
    for h in ("big.example", "mid.example"):
        c, e = top[h]
        assert c - e <= true[h] <= c, (h, c, e, true[h])
    # state survived the restart: counts reflect BOTH batches
    assert top["big.example"][0] >= 100


def test_cusum_stream_matches_batch_and_resumes(spark, tmp_path):
    """Streaming CUSUM fed in two micro-batches with a restart between
    must land on the batch operator's final stat per host, and raise
    the alarm exactly when the planted drift crosses h."""
    from biothings_crawler_spark.operators.temporal import cusum_drift
    from biothings_crawler_spark.streaming.drift import cusum_drift_stream

    schema = "host string, ts long, seq long, latency_us long"
    src = tmp_path / "f"
    out = tmp_path / "o"
    ckpt = tmp_path / "c"
    src.mkdir()

    # hostA drifts upward late; hostB stays flat
    rows1 = [("hostA", t, t, 100) for t in range(10)]
    rows1 += [("hostB", t, t, 100) for t in range(10)]
    rows2 = [("hostA", 10 + t, 10 + t, 400) for t in range(10)]
    rows2 += [("hostB", 10 + t, 10 + t, 100) for t in range(10)]

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            cusum_drift_stream(stream, k=150, h=1000)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(str(out)))
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(out)).collect()

    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append").parquet(str(src))
    got1 = {r.host: r for r in run_once()}
    assert got1["hostA"].stat == 0 and not got1["hostA"].alarm

    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append").parquet(str(src))
    latest = {}
    for r in run_once():
        if r.host not in latest or r.n_obs > latest[r.host].n_obs:
            latest[r.host] = r
    # 10 x (400-150) = 2500 >= h -> alarm; flat host stays at 0
    assert latest["hostA"].stat == 2500 and latest["hostA"].alarm
    assert latest["hostB"].stat == 0 and not latest["hostB"].alarm

    # pin stream-final stats to the batch operator on the same rows
    all_rows = spark.createDataFrame(rows1 + rows2, schema).select(
        "host", F.col("ts").cast("timestamp").alias("ts"),
        F.col("seq").alias("event_id"), "latency_us")
    batch = cusum_drift(all_rows, "host", "ts", "event_id",
                        "latency_us", k=150, h=1000)
    last = {r.host: r for r in batch.collect() if r.event_id == 19}
    assert latest["hostA"].stat == last["hostA"].stat
    assert latest["hostB"].stat == last["hostB"].stat


def test_percolate_stream_alerts_once_and_resumes(spark, tmp_path):
    """Streaming percolation: conjunction alerts fire on match, a
    re-fetch of the same page within the watermark is suppressed
    (exactly-once per horizon) across a checkpoint restart, and the
    unsatisfiable subscription never fires."""
    from biothings_crawler_spark.streaming.percolate import (
        percolate_alerts_stream,
    )

    schema = "id long, ts timestamp, text string"
    src = tmp_path / "docs"
    out = tmp_path / "alerts"
    ckpt = tmp_path / "ck"
    src.mkdir()
    queries = spark.createDataFrame(
        [("leak", ["data", "leak"]), ("ghost", ["data", "zzghost"])],
        "query_id string, terms array<string>",
    )

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            percolate_alerts_stream(stream, queries, "id", "text", "ts",
                                    watermark="1 hour")
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(str(out)))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(out)).collect()

    t0 = "2024-01-01 10:00:00"
    b1 = [(1, t0, "big data leak today"), (2, t0, "nothing to see")]
    spark.createDataFrame(b1, "id long, ts string, text string").selectExpr(
        "id", "CAST(ts AS TIMESTAMP) AS ts", "text"
    ).coalesce(1).write.mode("append").parquet(str(src))
    got1 = [(r.id, r.query_id) for r in run_once()]
    assert got1 == [(1, "leak")]

    # batch 2 (restart, same checkpoint): doc 1 re-fetched 5 min later
    # inside the horizon -> suppressed; doc 3 is a fresh alert
    t1 = "2024-01-01 10:05:00"
    b2 = [(1, t1, "big data leak today"), (3, t1, "data leak again")]
    spark.createDataFrame(b2, "id long, ts string, text string").selectExpr(
        "id", "CAST(ts AS TIMESTAMP) AS ts", "text"
    ).coalesce(1).write.mode("append").parquet(str(src))
    got2 = sorted((r.id, r.query_id) for r in run_once())
    assert got2 == [(1, "leak"), (3, "leak")]  # no duplicate for id 1
