"""Z-order layout: key correctness vs a bit-twiddling reference, the
monotone range-bound property the rectangle reader relies on, and
actual file pruning through parquet min/max stats on a written
z-ordered table."""

import itertools
import random

from pyspark.sql import functions as F

from biothings_crawler_spark.layout import (
    read_zorder_rectangle,
    write_zorder_layout,
    zorder_key_col,
    zorder_key_py,
)


def _ref(a, b):
    out = 0
    for i in range(31):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


EDGES = [0, 1, 2, 3, 0x7FFFFFFF, 0x55555555, 0x2AAAAAAA, 12345, 999999]


def test_zorder_key_matches_bit_reference(spark):
    rng = random.Random(3)
    pairs = list(itertools.product(EDGES, EDGES[:4])) + [
        (rng.randrange(1 << 31), rng.randrange(1 << 31)) for _ in range(50)]
    for a, b in pairs:
        assert zorder_key_py(a, b) == _ref(a, b), (a, b)
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", zorder_key_col(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _ref(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_range_bound_is_monotone():
    rng = random.Random(9)
    for _ in range(200):
        a0, a1 = sorted(rng.randrange(1 << 20) for _ in range(2))
        b0, b1 = sorted(rng.randrange(1 << 20) for _ in range(2))
        zlo, zhi = zorder_key_py(a0, b0), zorder_key_py(a1, b1)
        a = rng.randrange(a0, a1 + 1)
        b = rng.randrange(b0, b1 + 1)
        assert zlo <= zorder_key_py(a, b) <= zhi


def test_zorder_layout_prunes_files(spark, tmp_path):
    path = str(tmp_path / "zorder")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"))
    write_zorder_layout(df, path, "a", "b", n_files=16)

    got = read_zorder_rectangle(spark, path, 3, 6, 3, 6, "a", "b")
    rows = got.collect()
    assert len(rows) == 16  # 4x4 rectangle
    assert all(3 <= r["a"] <= 6 and 3 <= r["b"] <= 6 for r in rows)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zkey" in plan, plan
    # the z-range must actually skip files: a tight corner rectangle
    # touches far fewer than all 16 range-partitioned files
    touched = (read_zorder_rectangle(spark, path, 3, 6, 3, 6, "a", "b")
               .select(F.input_file_name().alias("f")).distinct().count())
    total = (spark.read.parquet(path)
             .select(F.input_file_name().alias("f")).distinct().count())
    assert touched < total / 2, (touched, total)
