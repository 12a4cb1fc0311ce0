"""Column profiling + contract drift (operators/profile)."""

from biothings_crawler_spark.operators.profile import (
    column_profile,
    profile_drift,
)


def _old(spark):
    return spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", None if i >= 8 else i * 10)
         for i in range(10)],
        "id long, kind string, score long",
    )


def test_profile_counts(spark):
    prof = {r.column: r for r in
            column_profile(_old(spark), ["id", "kind", "score"]).collect()}
    assert (prof["id"].n_rows, prof["id"].n_null,
            prof["id"].n_distinct) == (10, 0, 10)
    assert (prof["kind"].n_null, prof["kind"].n_distinct) == (0, 2)
    assert (prof["score"].n_null, prof["score"].n_distinct) == (2, 8)
    assert prof["score"].null_ppm == 200_000


def test_drift_flags_null_spike_and_cardinality(spark):
    old = _old(spark)
    # new round: score nulls spike to 60%; kind explodes to 10 values
    new = spark.createDataFrame(
        [(i, f"k{i}", None if i >= 4 else i * 10) for i in range(10)],
        "id long, kind string, score long",
    )
    cols = ["id", "kind", "score"]
    out = {r.column: r for r in profile_drift(
        column_profile(old, cols), column_profile(new, cols)
    ).collect()}
    assert out["id"].flag == "ok"
    assert out["kind"].flag == "cardinality"
    assert out["kind"].distinct_delta_ppm == (10 - 2) * 1_000_000 // 2
    assert out["score"].flag == "null_spike"
    assert out["score"].null_ppm_new == 600_000


def test_zero_distinct_old_maxes_delta(spark):
    allnull = _old(spark).selectExpr("id", "kind",
                                     "CAST(NULL AS BIGINT) AS score")
    out = {r.column: r for r in profile_drift(
        column_profile(allnull, ["score"]),
        column_profile(_old(spark), ["score"]),
    ).collect()}
    assert out["score"].distinct_delta_ppm == 1_000_000


def test_plan_no_expand_no_python(spark):
    plan = (
        column_profile(_old(spark), ["id", "kind", "score"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union of single-column aggs, not one multi-countDistinct Expand
    assert "BatchEvalPython" not in plan
    assert plan.count("Expand") <= 3  # one per column, never multiplied


def test_temperature_mix_exact_roots_and_flattening(spark):
    import math

    from biothings_crawler_spark.operators.sampling import temperature_mix

    counts = spark.createDataFrame(
        [("en", 1_000_000), ("sw", 10_000), ("yo", 100)],
        "stratum string, tokens long",
    )
    t1 = {r.stratum: r for r in
          temperature_mix(counts, temperature=1).collect()}
    t2 = {r.stratum: r for r in
          temperature_mix(counts, temperature=2,
                          budget=10**9).collect()}
    # T=1 proportional; T=2 sqrt-flattened
    for lang, tok in (("en", 10**6), ("sw", 10**4), ("yo", 100)):
        assert t1[lang].weight == tok * 10**6
        assert t2[lang].weight == math.isqrt(tok * 10**8)
    assert t1["en"].share_ppm == 990_000  # 1e6/1.0101e6
    # sqrt flattening: tail share grows, head share shrinks
    assert t2["yo"].share_ppm > t1["yo"].share_ppm
    assert t2["en"].share_ppm < t1["en"].share_ppm
    # budget split sums to <= budget and matches exact division
    tot_w = sum(r.weight for r in t2.values())
    for lang in t2:
        assert t2[lang].quota == 10**9 * t2[lang].weight // tot_w


def test_temperature_mix_t3_exact_cube_root(spark):
    from biothings_crawler_spark.operators.sampling import temperature_mix

    counts = spark.createDataFrame(
        [("a", 8), ("b", 27), ("c", 0)], "stratum string, tokens long"
    )
    out = {r.stratum: r.weight for r in
           temperature_mix(counts, temperature=3).collect()}
    # scale 10^9: (8e9)^(1/3) = 2000, (27e9)^(1/3) = 3000
    assert out == {"a": 2000, "b": 3000, "c": 0}


def test_temperature_mix_t2_large_stratum_no_overflow(spark):
    # Regression: the old 10^12 pre-scale for T=2 overflowed int64 past
    # ~9.2e6 tokens per stratum — trivially reached by any real
    # language.  The 10^8 scale stays exact to ~9.2e10 tokens.
    import math

    from biothings_crawler_spark.operators.sampling import temperature_mix

    counts = spark.createDataFrame(
        [("en", 50_000_000_000), ("yo", 1_000_000)],
        "stratum string, tokens long",
    )
    out = {r.stratum: r for r in
           temperature_mix(counts, temperature=2).collect()}
    assert out["en"].weight == math.isqrt(50_000_000_000 * 10**8)
    assert out["yo"].weight == math.isqrt(1_000_000 * 10**8)
    tot = out["en"].weight + out["yo"].weight
    assert out["en"].share_ppm == out["en"].weight * 10**6 // tot


def test_schema_signatures_census(spark):
    from biothings_crawler_spark.operators.profile import (
        schema_signatures,
    )

    rows = [
        ("click", '{"k":1}'), ("click", '{"k":2}'),
        ("click", '{"k":3,"ts":"t"}'),
        ("click", '{"ts":"u","k":4}'),       # reorder -> same signature
        ("click", '{"k":5,"user":{"id":1}}'),  # nested: top-level only
        ("click", '{"k":'),                   # malformed
        ("view", '{"a":1,"b":2}'),
    ]
    df = spark.createDataFrame(rows, "grp string, payload string")
    got = {(r["group"], r["signature"]): r
           for r in schema_signatures(df).collect()}
    assert got[("click", "k")]["n"] == 2
    assert got[("click", "k,ts")]["n"] == 2          # order collapsed
    assert got[("click", "k,user")]["n"] == 1
    assert got[("click", "<invalid>")]["n"] == 1
    assert got[("click", "k")]["rank"] == 1
    assert got[("click", "k")]["share_ppm"] == 333_333
    assert got[("view", "a,b")]["rank"] == 1


def test_schema_signatures_non_object_lane(spark):
    from biothings_crawler_spark.operators.profile import (
        schema_signatures,
    )

    rows = [("e", "[1,2]"), ("e", "42"), ("e", '"s"'),
            ("e", "{}"), ("e", "{bad"), ("e", None)]
    df = spark.createDataFrame(rows, "grp string, payload string")
    got = {r["signature"]: r["n"] for r in schema_signatures(df).collect()}
    assert got["<non-object>"] == 3      # array, number, string
    assert got[""] == 1                  # empty object keeps its own lane
    assert got["<invalid>"] == 2         # malformed + NULL


def test_mad_outliers_resists_masking(spark):
    from biothings_crawler_spark.operators.profile import mad_outliers

    # 88 inliers around 1000 plus 12 huge outliers: with >n/10
    # contamination the outliers' own sigma inflation masks them
    # (z ~ sqrt(88/12) < 3, so 3-sigma flags ZERO), while the MAD
    # fence flags exactly the twelve
    import statistics

    inliers = [1000 + (i * 7) % 25 for i in range(88)]
    outliers = [1_000_000 + i for i in range(12)]
    xs = inliers + outliers
    mu = statistics.mean(xs)
    sd = statistics.pstdev(xs)
    assert sum(1 for x in xs if abs(x - mu) > 3 * sd) == 0  # masked!
    df = spark.createDataFrame([(0, x) for x in xs], "grp long, x long")
    got = mad_outliers(df).collect()[0]
    assert got["n_outliers"] == 12
    assert got["outlier_ppm"] == 120_000
    # lower-median semantics: rank (n+1) div 2 of ascending values
    assert got["med_fx"] == sorted(xs)[(100 + 1) // 2 - 1]
    # degenerate MAD == 0: over half identical -> every off-median
    # value flagged (documented caveat)
    df2 = spark.createDataFrame(
        [(0, 5)] * 6 + [(0, 7)] * 2, "grp long, x long")
    got2 = mad_outliers(df2).collect()[0]
    assert got2["mad_fx"] == 0 and got2["n_outliers"] == 2
