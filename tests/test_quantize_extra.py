"""Embedding drift in code space (operators/quantize.embedding_drift)."""

from biothings_crawler_spark.operators.quantize import embedding_drift

_SCHEMA = "vec_id long, embedding array<float>, label int"


def _snap(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_identical_snapshots_are_exactly_one(spark):
    rows = [(i, [float(i % 7), float(i % 3), 2.0, 0.5], i % 2)
            for i in range(20)]
    a = _snap(spark, rows)
    got = {r.label: r for r in embedding_drift(a, a).collect()}
    for r in got.values():
        assert r.cos2_ppm == 1_000_000 and r.drifted == 0
        assert r.n_vecs_a == r.n_vecs_b == 10


def test_reversed_label_drifts_others_do_not(spark):
    rows = [(i, [float(1 + i % 5), 9.0, 0.0, float(i % 2)], i % 2)
            for i in range(24)]
    b_rows = [(i, list(reversed(v)) if lab == 0 else v, lab)
              for i, v, lab in rows]
    got = {r.label: r for r in embedding_drift(
        _snap(spark, rows), _snap(spark, b_rows)).collect()}
    assert got[1].cos2_ppm == 1_000_000 and got[1].drifted == 0
    assert got[0].cos2_ppm < 900_000 and got[0].drifted == 1


def test_partitioning_invariance(spark):
    rows = [(i, [float((i * 3) % 11), float(i % 4), 1.0, 0.25], i % 3)
            for i in range(30)]
    a = _snap(spark, rows)
    b = _snap(spark, [(i, v[::-1], lab) for i, v, lab in rows])
    one = {r.label: r.cos2_ppm
           for r in embedding_drift(a.repartition(1),
                                    b.repartition(1)).collect()}
    many = {r.label: r.cos2_ppm
            for r in embedding_drift(a.repartition(16),
                                     b.repartition(16)).collect()}
    assert one == many
