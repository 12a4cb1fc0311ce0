"""Lloyd k-means over integer codes (operators/clustering)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.clustering import (
    assign_nearest,
    init_centroids,
    kmeans_lloyd,
    update_centroids,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, qvec array<long>")


def test_two_blob_exact_convergence(spark):
    # two planted blobs; whatever two rows the md5 init samples, one
    # Lloyd round snaps the centroids onto the blob means and the
    # final assignment separates the blobs exactly.
    blob_a = [(i, [0 + i, 2 * i]) for i in range(4)]          # near origin
    blob_b = [(10 + i, [1000 + i, 1000 - i]) for i in range(4)]
    out = kmeans_lloyd(_vecs(spark, blob_a + blob_b), k=2, rounds=3)
    got = {r["vec_id"]: r["cell"] for r in out.collect()}
    cells_a = {got[i] for i, _ in blob_a}
    cells_b = {got[i] for i, _ in blob_b}
    assert len(cells_a) == 1 and len(cells_b) == 1 and cells_a != cells_b


def test_floor_mean_is_exact_on_negatives(spark):
    # components straddle zero; the pmod floor-mean must floor (not
    # truncate toward zero) so Spark and the DuckDB twin agree:
    # mean of (-3, -4) = -3.5 -> floor -4.
    assigned = _vecs(spark, [(1, [-3]), (2, [-4])]).select(
        "vec_id", F.col("qvec").alias("v"), F.lit(7).cast("bigint").alias("cell")
    ).select("vec_id", "v", "cell")
    prev = spark.createDataFrame([(7, [0])], "cell long, cv array<long>")
    got = update_centroids(assigned, prev).collect()
    assert {tuple(r["cv"]) for r in got} == {(-4,)}


def test_empty_cell_keeps_previous_centroid(spark):
    assigned = _vecs(spark, [(1, [10]), (2, [12])]).select(
        "vec_id", F.col("qvec").alias("v"), F.lit(1).cast("bigint").alias("cell")
    )
    prev = spark.createDataFrame(
        [(1, [0]), (2, [99])], "cell long, cv array<long>"
    )
    got = {r["cell"]: tuple(r["cv"]) for r in update_centroids(assigned, prev).collect()}
    assert got == {1: (11,), 2: (99,)}  # cell 2 attracted nothing


def test_assignment_tie_breaks_to_smallest_cell(spark):
    vectors = _vecs(spark, [(5, [10])]).select(
        F.col("vec_id"), F.col("qvec").alias("v")
    )
    cents = spark.createDataFrame(
        [(3, [12]), (1, [8])], "cell long, cv array<long>"
    )
    got = assign_nearest(vectors, cents).collect()[0]
    assert got["cell"] == 1 and got["dist2"] == 4


def test_assignment_plan_has_no_shuffle(spark):
    vectors = _vecs(spark, [(i, [i, i]) for i in range(20)]).select(
        "vec_id", F.col("qvec").alias("v")
    )
    cents = init_centroids(vectors, 3).localCheckpoint(eager=True)
    plan = assign_nearest(vectors, cents)._jdf.queryExecution().executedPlan().toString()
    # broadcast of the single folded centroid row is the only exchange
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_lloyd_objective_monotone_on_fixture(spark):
    # the within-cluster SSE after each additional round never rises
    # (Lloyd invariant, exact integers so no float wobble)
    from biothings_crawler_spark.operators.quantize import quantize_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qt = quantize_embeddings(emb)
    sse = [
        kmeans_lloyd(qt, k=10, rounds=r).agg(F.sum("dist2")).collect()[0][0]
        for r in (0, 1, 2, 4)
    ]
    assert sse == sorted(sse, reverse=True)
    assert sse[-1] < sse[0]  # it actually improved, not just held
