"""Composed training-data tail (plans/pipeline.training_prep)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.plans.pipeline import training_prep


def test_casualties_die_at_the_right_stage(spark):
    good = "alpha beta gamma delta epsilon.\n" * 6
    short = "alpha beta gamma delta epsilon.\n" * 3          # < 5 sentences
    gibberish = "epsilon delta gamma beta alpha.\n" * 6      # OOV bigrams
    rows = [(i, good) for i in range(0, 20, 2)]              # evens: train
    rows += [(1, good), (3, short), (5, gibberish)]
    df = spark.createDataFrame(rows, "id long, ptext string")
    out = {r.id: r for r in
           training_prep(df, "id", "ptext", capacity=64, n_shards=2).collect()}
    assert 1 in out            # clean odd doc survives to packing
    assert 3 not in out        # C4 sentence gate
    assert 5 not in out        # LM tail bucket
    assert all(r.fill_after <= 64 for r in out.values())


def test_deterministic_under_partitioning(spark):
    rows = [(i, "alpha beta gamma delta epsilon.\n" * (5 + i % 3))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, ptext string")
    a = sorted(map(tuple, training_prep(df, "id", "ptext").collect()))
    b = sorted(map(tuple,
                   training_prep(df.repartition(11), "id", "ptext").collect()))
    assert a == b and len(a) > 0
