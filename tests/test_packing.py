"""Greedy sequence packing (operators/packing)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, tok long, shard long")


def test_pack_pandas_matches_fold(spark):
    """The grouped-map packer must equal the SQL-fold twin row for row
    — including oversized clipping, bin resets, and multi-shard
    independence."""
    import hashlib

    rows = [
        (i, int(hashlib.md5(f"t{i}".encode()).hexdigest()[:4], 16) % 140,
         i % 5)
        for i in range(400)
    ]
    df = _df(spark, rows)
    for cap in (100, 17):
        a = sorted(map(tuple, pack_sequences(
            df, "id", "tok", cap, "shard").collect()))
        b = sorted(map(tuple, pack_sequences(
            df, "id", "tok", cap, "shard", impl="expr").collect()))
        assert a == b, cap


def test_greedy_hand_case(spark):
    # shard 0, capacity 10, ids in order: 4,3,2 -> bin0 (fill 9);
    # 5 overflows -> bin1; 6 overflows -> bin2; 4 fits bin2 (fill 10)
    df = _df(spark, [(1, 4, 0), (2, 3, 0), (3, 2, 0), (4, 5, 0),
                     (5, 6, 0), (6, 4, 0)])
    out = {r.id: r for r in pack_sequences(df, "id", "tok", 10, "shard").collect()}
    assert [(out[i].bin, out[i].fill_after) for i in range(1, 7)] == [
        (0, 4), (0, 7), (0, 9), (1, 5), (2, 6), (2, 10)]
    assert not any(out[i].oversized for i in range(1, 7))


def test_oversized_doc_is_clipped_and_alone(spark):
    df = _df(spark, [(1, 25, 0), (2, 3, 0)])
    out = {r.id: r for r in pack_sequences(df, "id", "tok", 10, "shard").collect()}
    assert out[1].tok == 10 and out[1].oversized and out[1].bin == 0
    assert out[2].bin == 1  # the full bin can't take more


def test_shards_pack_independently_and_deterministically(spark):
    rows = [(i, (i * 7) % 13 + 1, i % 4) for i in range(200)]
    df = _df(spark, rows)
    a = sorted(map(tuple, pack_sequences(df, "id", "tok", 32, "shard").collect()))
    b = sorted(map(tuple,
                   pack_sequences(df.repartition(17), "id", "tok", 32, "shard")
                   .collect()))
    assert a == b
    # no bin exceeds capacity
    for _, _, _, tok, fill, _ in a:
        assert fill <= 32 and tok <= 32


def test_packing_stats_utilization(spark):
    df = _df(spark, [(1, 6, 0), (2, 6, 0), (3, 6, 0)])
    packed = pack_sequences(df, "id", "tok", 10, "shard")
    s = packing_stats(packed, 10).collect()[0]
    # bins: [6],[6],[6] -> 3 bins, 18/30 tokens used
    assert (s.n_docs, s.n_bins, s.util_ppm) == (3, 3, 600_000)


def test_plan_one_shard_agg_no_window(spark):
    df = _df(spark, [(1, 4, 0), (2, 3, 1)])
    plan = (
        pack_sequences(df, "id", "tok", 10, "shard")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "BatchEvalPython" not in plan


def test_span_corruption_matches_python_walk(spark):
    import hashlib

    from biothings_crawler_spark.operators.packing import (
        span_corruption_stats,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "a b"),          # shorter than a max span
        (3, ""),             # empty
        (4, None),           # NULL text
        (5, "single"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {r["id"]: r for r in span_corruption_stats(df).collect()}

    def ref(did, text):
        ws = [w for w in (text or "").lower().split() if w]
        n = len(ws)
        nf = ns = nn = 0
        for i in range(1, n + 1):
            coin = int(hashlib.md5(
                f"7:{did}:{i}".encode()).hexdigest()[:8], 16) % 100
            if i >= nf and coin < 15:
                ln = 2 + int(hashlib.md5(
                    f"7:{did}:{i}:L".encode()).hexdigest()[:8], 16) % 3
                nf = i + ln
                ns += 1
                nn += min(ln, n - i + 1)
        return n, ns, nn

    for did, text in docs:
        n, ns, nn = ref(did, text)
        r = got[did]
        assert (r["n_tokens"], r["n_spans"], r["n_noise"]) == (n, ns, nn)
        assert r["enc_len"] == n - nn + ns
        assert r["dec_len"] == nn + ns + 1
        if n:
            assert r["corrupted_ppm"] == nn * 1_000_000 // n
        else:
            assert r["corrupted_ppm"] is None
    # the corruption rate lands near the configured 15% on a long doc
    r1 = got[1]
    assert 50_000 < r1["corrupted_ppm"] < 500_000


def test_packing_fragmentation_accounting(spark):
    from biothings_crawler_spark.operators.packing import (
        pack_sequences,
        packing_fragmentation,
    )

    docs = [(1, 4, 0), (2, 4, 0), (3, 8, 0),   # bin0: 4+4, bin1: 8
            (10, 3, 1), (11, 3, 1), (12, 2, 1)]  # shard1 bin0: 3+3+2
    df = spark.createDataFrame(docs, "id long, tok long, shard long")
    packed = pack_sequences(df, "id", "tok", 8, "shard")
    got = {(r["shard"], r["bin"]): r
           for r in packing_fragmentation(packed).collect()}
    b00 = got[(0, 0)]
    # two 4-token docs: T=8, intra=32, cross=(64-32)/64
    assert (b00["n_docs"], b00["tokens"], b00["intra_pairs"]) == (2, 8, 32)
    assert b00["cross_ppm"] == 500_000
    # single-doc bin: zero cross-document leakage
    b01 = got[(0, 1)]
    assert b01["n_docs"] == 1 and b01["cross_ppm"] == 0
    # 3+3+2: T=8, intra=9+9+4=22, cross=(64-22)*1e6//64
    b10 = got[(1, 0)]
    assert b10["intra_pairs"] == 22
    assert b10["cross_ppm"] == (64 - 22) * 1_000_000 // 64
