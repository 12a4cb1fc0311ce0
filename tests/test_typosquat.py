"""FastSS edit-distance-1 banding: recall vs brute force on a
randomized host set, and the no-crossJoin plan guarantee."""

import itertools
import random

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.typosquat import (
    deletion_neighborhood_col,
    typosquat_pairs,
)


def _lev1(a, b):
    if a == b:
        return False
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b = b, a
        la, lb = lb, la
    for i in range(lb):
        if a == b[:i] + b[i + 1:]:
            return True
    return False


def test_typosquat_recall_matches_bruteforce(spark):
    rng = random.Random(5)
    hosts = {f"site{i}.org" for i in range(30)}
    for _ in range(25):
        h = rng.choice(sorted(hosts))
        op = rng.randrange(3)
        pos = rng.randrange(len(h))
        if op == 0:
            hosts.add(h[:pos] + "x" + h[pos:])          # insert
        elif op == 1 and len(h) > 2:
            hosts.add(h[:pos] + h[pos + 1:])            # delete
        else:
            hosts.add(h[:pos] + "z" + h[pos + 1:])      # substitute
    expected = {(a, b) for a, b in itertools.combinations(sorted(hosts), 2)
                if _lev1(a, b)}
    assert expected, "fixture must contain true pairs"

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {(r["host_a"], r["host_b"])
           for r in typosquat_pairs(df, "host").collect()}
    assert got == expected

    plan = typosquat_pairs(df, "host")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_deletion_neighborhood_shape(spark):
    df = spark.createDataFrame([("abc",)], "h string")
    arr = df.select(
        deletion_neighborhood_col(F.col("h")).alias("n")).first()["n"]
    assert arr == ["abc", "bc", "ac", "ab"]
