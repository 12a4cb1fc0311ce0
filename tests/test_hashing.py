"""Pure-Python XXH64 must equal Spark's xxhash64 (seed 42) exactly."""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from biothings_crawler_spark.hashing import xxhash64_long, xxhash64_str

SAMPLES = [
    "",
    "a",
    "abc",
    "https://zenodo.example.org/record/42",
    "https://geo.example.org/geo/query/acc.cgi?acc=GSE137890",
    "x" * 31,
    "x" * 32,
    "y" * 33,
    "z" * 100,
    "üñïçødé-ŧæxŧ",
    string.printable,
]


def test_xxhash64_str_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in SAMPLES:
        assert got[s] == xxhash64_str(s), s


def test_xxhash64_long_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**62), 7777777777]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxhash64_long(v), v


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_xxhash64_str_is_deterministic(s):
    assert xxhash64_str(s) == xxhash64_str(s)
    assert -(2**63) <= xxhash64_str(s) < 2**63
