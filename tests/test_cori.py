"""CORI shard resource selection (operators/sharding.cori_shard_scores)."""

from biothings_crawler_spark.operators.sharding import cori_shard_scores


def _lg(v: int) -> int:
    n = v.bit_length() - 1
    m, bits = (v * 65536) >> n, 0
    for _ in range(16):
        m = (m * m) >> 16
        bit = 1 if m >= 131072 else 0
        bits = bits * 2 + bit
        m >>= bit
    return n * 65536 + bits


def _corpus(spark):
    rows = [
        ("rich", 1, "data data table"),
        ("rich", 2, "data table x"),
        ("poor", 3, "x y z"),
        ("poor", 4, "data y z"),
    ]
    return spark.createDataFrame(rows, "src string, id long, text string")


def test_hand_computed_beliefs(spark):
    out = {r.shard: r.score_ppm for r in cori_shard_scores(
        _corpus(spark), "src", "id", "text", ["data", "table"]
    ).collect()}
    # S=2, cw: rich 6, poor 6, cw_total 12; (150*6*2)//12 = 150
    # df: rich(data)=2, rich(table)=2, poor(data)=1; cf(data)=2, cf(table)=1
    def t_ppm(df):
        return df * 1_000_000 // (df + 50 + 150)

    def i_ppm(cf):
        return (_lg(2 * 2 + 1) - _lg(2 * cf)) * 1_000_000 // _lg(3)

    def belief(df, cf):
        return 400_000 + 600_000 * t_ppm(df) * i_ppm(cf) // 10**12

    assert out["rich"] == belief(2, 2) + belief(2, 1)
    assert out["poor"] == belief(1, 2) + belief(0, 1)
    assert out["rich"] > out["poor"]


def test_term_absent_everywhere_is_dropped(spark):
    base = {r.shard: r.score_ppm for r in cori_shard_scores(
        _corpus(spark), "src", "id", "text", ["data", "table"]
    ).collect()}
    ghost = {r.shard: r.score_ppm for r in cori_shard_scores(
        _corpus(spark), "src", "id", "text", ["data", "table", "zzghost"]
    ).collect()}
    assert ghost == base


def test_df_counts_docs_not_occurrences(spark):
    # 'data' twice in one doc must count df=1 for that doc
    out = {r.shard: r.score_ppm for r in cori_shard_scores(
        _corpus(spark), "src", "id", "text", ["table"]
    ).collect()}
    # only rich contains 'table' (df=2, cf=1); poor gets pure default
    assert out["rich"] > out["poor"] == 400_000


def test_plan_broadcast_no_python(spark):
    plan = (
        cori_shard_scores(_corpus(spark), "src", "id", "text", ["data"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
